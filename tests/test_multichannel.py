"""Multichannel contract: stacked-channel results == per-channel results.

The reference enforces this for essentially every function
(tests/test_multichannel.py, 1269 LoC); here the same property justifies
vmap/batch-sharding in the TPU design.  Fixtures are a two-channel stack
of distinct deterministic signals.
"""

import numpy as np
import pytest

import librosa_tpu as lt

SR = 22050


@pytest.fixture(scope="module")
def y_stereo():
    t = np.arange(SR * 2) / SR
    ch0 = 0.5 * np.sin(2 * np.pi * 220 * t)
    ch1 = 0.4 * np.sin(2 * np.pi * 440 * t * (1 + 0.1 * t / 2))
    rng = np.random.RandomState(440)
    noise = 0.01 * rng.randn(2, len(t))
    return (np.stack([ch0, ch1]) + noise).astype(np.float32)


def _stacked_equals_per_channel(fn, y, atol=1e-5, rtol=1e-4):
    full = np.asarray(fn(y))
    for ch in range(y.shape[0]):
        single = np.asarray(fn(y[ch]))
        assert full[ch].shape == single.shape, (full.shape, single.shape)
        np.testing.assert_allclose(full[ch], single, atol=atol, rtol=rtol)


BASIC_FNS = [
        ("stft", lambda y: lt.stft(y)),
        ("melspectrogram", lambda y: lt.feature.melspectrogram(y=y, sr=SR)),

        ("chroma_stft", lambda y: lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0)),
        ("spectral_centroid", lambda y: lt.feature.spectral_centroid(y=y, sr=SR)),
        ("spectral_bandwidth", lambda y: lt.feature.spectral_bandwidth(y=y, sr=SR)),
        ("spectral_rolloff", lambda y: lt.feature.spectral_rolloff(y=y, sr=SR)),
        ("spectral_flatness", lambda y: lt.feature.spectral_flatness(y=y)),
        ("spectral_contrast", lambda y: lt.feature.spectral_contrast(y=y, sr=SR)),
        ("rms", lambda y: lt.feature.rms(y=y)),
        ("zcr", lambda y: lt.feature.zero_crossing_rate(y)),
        ("poly_features", lambda y: lt.feature.poly_features(y=y, sr=SR)),
        ("tempogram", lambda y: lt.feature.tempogram(y=y, sr=SR)),
        ("fourier_tempogram", lambda y: np.abs(np.asarray(lt.feature.fourier_tempogram(y=y, sr=SR)))),
        ("onset_strength", lambda y: lt.onset.onset_strength(y=y, sr=SR)),
        ("pcen", lambda y: lt.pcen(np.abs(np.asarray(lt.stft(y))) * (2**31))),
        ("preemphasis", lambda y: lt.effects.preemphasis(y)),
        ("autocorrelate", lambda y: lt.autocorrelate(y)),
        ("zero_crossings", lambda y: lt.zero_crossings(y)),
        ("yin", lambda y: lt.yin(y, fmin=65, fmax=800, sr=SR)),
]


@pytest.mark.parametrize("name,fn", BASIC_FNS)
def test_multichannel_matches_per_channel(y_stereo, name, fn):
    _stacked_equals_per_channel(fn, y_stereo)


EXTENDED_FNS = [
        ("vqt", lambda y: np.abs(np.asarray(
            lt.vqt(y, sr=SR, n_bins=48, res_type="polyphase")))),
        ("chroma_cqt", lambda y: lt.feature.chroma_cqt(
            C=np.abs(np.asarray(lt.cqt(y, sr=SR, res_type="polyphase"))),
            sr=SR)),
        ("chroma_cens", lambda y: lt.feature.chroma_cens(
            C=np.abs(np.asarray(lt.cqt(y, sr=SR, res_type="polyphase"))),
            sr=SR)),
        ("chroma_vqt", lambda y: lt.feature.chroma_vqt(
            V=np.abs(np.asarray(lt.vqt(y, sr=SR, intervals="equal",
                                       res_type="polyphase"))),
            sr=SR, intervals="equal")),
        ("tonnetz", lambda y: lt.feature.tonnetz(
            y=y, sr=SR, chroma=np.abs(np.asarray(
                lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0))))),
        ("delta", lambda y: lt.feature.delta(
            np.asarray(lt.feature.mfcc(y=y, sr=SR)))),
        ("stack_memory", lambda y: lt.feature.stack_memory(
            np.asarray(lt.feature.mfcc(y=y, sr=SR)), n_steps=3)),
        ("mfcc_to_mel", lambda y: lt.feature.inverse.mfcc_to_mel(
            np.asarray(lt.feature.mfcc(y=y, sr=SR)))),
        ("phase_vocoder_mag", lambda y: np.abs(np.asarray(
            lt.phase_vocoder(lt.stft(y), rate=1.3)))),
        ("griffinlim_zero", lambda y: lt.griffinlim(
            np.abs(np.asarray(lt.stft(y))), n_iter=3, init=None)),
        ("piptrack_mags", lambda y: lt.piptrack(y=y, sr=SR)[1]),
        ("lpc", lambda y: lt.lpc(y, order=8)),
        ("mu_roundtrip", lambda y: lt.mu_expand(
            lt.mu_compress(y, quantize=True), quantize=True)),
        ("interp_harmonics", lambda y: lt.interp_harmonics(
            np.abs(np.asarray(lt.stft(y))),
            freqs=lt.fft_frequencies(sr=SR), harmonics=[1, 2])),
        ("onset_strength_multi", lambda y: lt.onset.onset_strength_multi(
            y=y, sr=SR, channels=[0, 64, 128])),
        ("tempo", lambda y: np.atleast_1d(np.asarray(
            lt.feature.tempo(y=y, sr=SR)))),
        ("tempogram_ratio", lambda y: np.nan_to_num(np.asarray(
            lt.feature.tempogram_ratio(y=y, sr=SR)))),
        ("iirt", lambda y: lt.iirt(y, sr=SR, res_type="polyphase")),
        ("fmt", lambda y: np.abs(np.asarray(lt.fmt(y[..., :8192])))),
        ("deemphasis", lambda y: lt.effects.deemphasis(y)),
        ("pitch_shift", lambda y: lt.effects.pitch_shift(
            y, sr=SR, n_steps=2, res_type="fft")),
        ("time_stretch", lambda y: lt.effects.time_stretch(y, rate=1.2)),
        ("salience", lambda y: np.nan_to_num(np.asarray(lt.salience(
            np.abs(np.asarray(lt.stft(y))),
            freqs=lt.fft_frequencies(sr=SR), harmonics=[1, 2],
            fill_value=0.0)))),
]


@pytest.mark.parametrize("name,fn", EXTENDED_FNS)
def test_multichannel_extended(y_stereo, name, fn):
    _stacked_equals_per_channel(fn, y_stereo, atol=1e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def y_batch():
    # (batch=2, ch=2, t): stereo pairs stacked over a batch dim — the
    # reference exercises 2-D leading shapes the same way
    # (tests/test_multichannel.py:27-47)
    t = np.arange(SR) / SR
    rng = np.random.RandomState(441)
    sigs = np.stack([
        np.sin(2 * np.pi * f * t * (1 + c * t))
        for f, c in ((220, 0.0), (330, 0.05), (440, 0.0), (550, 0.08))
    ]).reshape(2, 2, -1)
    return (0.4 * sigs + 0.01 * rng.randn(2, 2, len(t))).astype(np.float32)


@pytest.mark.parametrize("name,fn", BASIC_FNS + EXTENDED_FNS)
def test_batch_2d_leading_dims(y_batch, name, fn):
    # (2, 2, t) stacks: results equal the per-(i, j) single computation
    full = np.asarray(fn(y_batch))
    for i in range(2):
        for j in range(2):
            single = np.asarray(fn(y_batch[i, j]))
            assert full[i, j].shape == single.shape, (full.shape, single.shape)
            np.testing.assert_allclose(
                full[i, j], single, atol=2e-4, rtol=2e-3
            )


def test_multichannel_mel_to_stft(y_stereo):
    # NNLS is iterative: batched vs single solves agree in aggregate, not
    # elementwise — compare per-channel relative Frobenius error.
    M = np.asarray(lt.feature.melspectrogram(y=y_stereo, sr=SR))
    full = np.asarray(lt.feature.inverse.mel_to_stft(M, sr=SR))
    for ch in range(2):
        single = np.asarray(lt.feature.inverse.mel_to_stft(M[ch], sr=SR))
        rel = np.linalg.norm(full[ch] - single) / np.linalg.norm(single)
        assert rel < 1e-3, rel


def test_multichannel_pyin(y_stereo):
    f0, vflag, vprob = lt.pyin(y_stereo[..., :SR], fmin=150, fmax=600, sr=SR)
    f0 = np.nan_to_num(np.asarray(f0))
    for ch in range(2):
        f1, v1, p1 = lt.pyin(y_stereo[ch, :SR], fmin=150, fmax=600, sr=SR)
        np.testing.assert_allclose(
            f0[ch], np.nan_to_num(np.asarray(f1)), rtol=1e-4)
        assert np.array_equal(np.asarray(vflag)[ch], np.asarray(v1))


def test_multichannel_beat_track(y_stereo):
    tempo, beats = lt.beat.beat_track(y=y_stereo, sr=SR, sparse=False)
    beats = np.asarray(beats)
    assert beats.shape[0] == 2
    for ch in range(2):
        t1, b1 = lt.beat.beat_track(y=y_stereo[ch], sr=SR, sparse=False)
        assert np.array_equal(beats[ch], np.asarray(b1))


def test_multichannel_icqt(y_stereo):
    C = lt.cqt(y_stereo, sr=SR, n_bins=48, res_type="polyphase")
    y_back = np.asarray(lt.icqt(C, sr=SR, length=y_stereo.shape[-1],
                                res_type="polyphase"))
    assert y_back.shape == y_stereo.shape
    for ch in range(2):
        single = np.asarray(lt.icqt(
            lt.cqt(y_stereo[ch], sr=SR, n_bins=48, res_type="polyphase"),
            sr=SR, length=y_stereo.shape[-1], res_type="polyphase"))
        np.testing.assert_allclose(y_back[ch], single, atol=1e-4)


def test_multichannel_mfcc(y_stereo):
    # dB + DCT amplify f32 reduction-order noise; compare with dB-scale atol
    _stacked_equals_per_channel(
        lambda y: lt.feature.mfcc(y=y, sr=SR), y_stereo, atol=5e-3, rtol=1e-3
    )


def test_multichannel_istft_roundtrip(y_stereo):
    D = lt.stft(y_stereo)
    back = np.asarray(lt.istft(D, length=y_stereo.shape[-1]))
    assert back.shape == y_stereo.shape
    for ch in range(2):
        single = np.asarray(
            lt.istft(lt.stft(y_stereo[ch]), length=y_stereo.shape[-1])
        )
        np.testing.assert_allclose(back[ch], single, atol=1e-6)


def test_multichannel_hpss(y_stereo):
    h, p = lt.effects.hpss(y_stereo)
    h = np.asarray(h)
    p = np.asarray(p)
    assert h.shape == y_stereo.shape
    for ch in range(2):
        h1, p1 = lt.effects.hpss(y_stereo[ch])
        np.testing.assert_allclose(h[ch], np.asarray(h1), atol=1e-5)
        np.testing.assert_allclose(p[ch], np.asarray(p1), atol=1e-5)


def test_multichannel_resample(y_stereo):
    out = np.asarray(
        lt.resample(y_stereo, orig_sr=SR, target_sr=16000,
                    res_type="polyphase")
    )
    for ch in range(2):
        single = np.asarray(
            lt.resample(y_stereo[ch], orig_sr=SR, target_sr=16000,
                        res_type="polyphase")
        )
        np.testing.assert_allclose(out[ch], single, atol=1e-6)


def test_multichannel_cqt(y_stereo):
    C = np.abs(np.asarray(lt.cqt(y_stereo, sr=SR)))
    for ch in range(2):
        single = np.abs(np.asarray(lt.cqt(y_stereo[ch], sr=SR)))
        np.testing.assert_allclose(C[ch], single, atol=1e-4, rtol=1e-3)


def test_to_mono_to_stereo(y_stereo):
    mono = np.asarray(lt.to_mono(y_stereo))
    assert mono.shape == (y_stereo.shape[-1],)
    np.testing.assert_allclose(mono, y_stereo.mean(axis=0), atol=1e-6)
    stereo = np.asarray(
        lt.to_stereo(left=y_stereo[0], right=y_stereo[1], norm=False)
    )
    assert stereo.shape == (2, y_stereo.shape[-1])
