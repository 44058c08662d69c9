"""Parameter-validation failures raise ParameterError.

Mirror of the reference's tests/test_failures.py style: every public entry
point validates its configuration before touching the device.
"""

import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu import ParameterError


@pytest.fixture
def y(rng):
    return (rng.randn(4096) * 0.1).astype(np.float32)


def test_stft_bad_hop(y):
    with pytest.raises(ParameterError):
        lt.stft(y, hop_length=0)


def test_stft_int_input():
    with pytest.raises(ParameterError):
        lt.stft(np.zeros(1024, dtype=np.int16))


def test_stft_uncentered_short(y):
    with pytest.raises(ParameterError):
        lt.stft(y[:128], n_fft=2048, center=False)


def test_griffinlim_bad_momentum(y):
    S = np.abs(np.asarray(lt.stft(y)))
    with pytest.raises(ParameterError):
        lt.griffinlim(S, momentum=-1)


def test_griffinlim_bad_init(y):
    S = np.abs(np.asarray(lt.stft(y)))
    with pytest.raises(ParameterError):
        lt.griffinlim(S, init="bogus")


def test_power_to_db_bad_amin(y):
    with pytest.raises(ParameterError):
        lt.power_to_db(np.ones(4), amin=0)


def test_power_to_db_bad_topdb(y):
    with pytest.raises(ParameterError):
        lt.power_to_db(np.ones(4), top_db=-3)


def test_yin_bad_ranges(y):
    for fmin, fmax in [(440, 220), (-1, 440)]:
        with pytest.raises(ParameterError):
            lt.yin(y, fmin=fmin, fmax=fmax)


def test_pyin_bad_ranges(y):
    with pytest.raises(ParameterError):
        lt.pyin(y, fmin=880, fmax=110)


def test_time_stretch_bad_rate(y):
    with pytest.raises(ParameterError):
        lt.effects.time_stretch(y, rate=0)


def test_pitch_shift_bad_bpo(y):
    with pytest.raises(ParameterError):
        lt.effects.pitch_shift(y, sr=22050, n_steps=1, bins_per_octave=-12)


def test_softmask_shape_mismatch():
    with pytest.raises(ParameterError):
        lt.util.softmask(np.ones((3, 3)), np.ones((3, 4)))


def test_softmask_negative():
    with pytest.raises(ParameterError):
        lt.util.softmask(-np.ones(3), np.ones(3))


def test_softmask_bad_power():
    with pytest.raises(ParameterError):
        lt.util.softmask(np.ones(3), np.ones(3), power=0)


def test_normalize_bad_threshold(rng):
    with pytest.raises(ParameterError):
        lt.util.normalize(rng.randn(4, 4), threshold=-1)


def test_frame_too_short():
    with pytest.raises(ParameterError):
        lt.util.frame(np.zeros(10), frame_length=100, hop_length=1)


def test_resample_bad_rates(y):
    with pytest.raises(ParameterError):
        lt.resample(y, orig_sr=0, target_sr=22050)


def test_resample_polyphase_nonint(y):
    with pytest.raises(ParameterError):
        lt.resample(y, orig_sr=22050.5, target_sr=16000, res_type="polyphase")


def test_tone_requires_length():
    with pytest.raises(ParameterError):
        lt.tone(440)


def test_chirp_requires_duration():
    with pytest.raises(ParameterError):
        lt.chirp(fmin=110, fmax=880)


def test_note_to_midi_invalid():
    with pytest.raises(ParameterError):
        lt.note_to_midi("not-a-note")


def test_hz_to_svara_requires_valid_mela():
    with pytest.raises(ParameterError):
        lt.mela_to_degrees(0)


def test_viterbi_bad_probabilities():
    with pytest.raises(ParameterError):
        lt.sequence.viterbi(np.full((3, 5), 2.0), np.full((3, 3), 1 / 3))


def test_viterbi_bad_transition():
    with pytest.raises(ParameterError):
        lt.sequence.viterbi(np.full((3, 5), 0.5), np.full((3, 3), 0.9))


def test_dtw_needs_input():
    with pytest.raises(ParameterError):
        lt.sequence.dtw()


def test_beat_track_silent_signal_returns_empty():
    # reference beat.py:280 — an all-zero onset envelope yields (0, [])
    tempo, beats = lt.beat.beat_track(
        onset_envelope=np.zeros(128, dtype=np.float32), sr=22050
    )
    assert float(np.asarray(tempo)) == 0.0
    assert np.asarray(beats).size == 0


def test_beat_track_requires_input():
    with pytest.raises(ParameterError):
        lt.beat.beat_track()


def test_cqt_exceeds_nyquist(y):
    with pytest.raises(ParameterError):
        lt.cqt(y, sr=22050, fmin=8000, n_bins=48)


def test_interval_frequencies_unknown():
    with pytest.raises(ParameterError):
        lt.interval_frequencies(12, fmin=55, intervals="bogus")


def test_specshow_bad_vscale(y):
    import matplotlib

    matplotlib.use("Agg")
    from librosa_tpu import display

    S = np.abs(np.asarray(lt.stft(y)))
    with pytest.raises(ParameterError):
        display.specshow(S, vscale="decibels")


def test_example_unknown_key():
    with pytest.raises(ParameterError):
        lt.example("not-a-real-example")
