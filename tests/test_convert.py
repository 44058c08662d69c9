"""Tests for librosa_tpu.core.convert — unit conversions (reference parity)."""

import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu.util.exceptions import ParameterError


def test_frames_samples_time():
    frames = np.array([0, 1, 2, 10])
    samples = lt.frames_to_samples(frames, hop_length=512)
    assert np.array_equal(samples, frames * 512)
    assert np.array_equal(lt.samples_to_frames(samples, hop_length=512), frames)
    t = lt.frames_to_time(frames, sr=22050, hop_length=512)
    assert np.allclose(t, frames * 512 / 22050)
    assert np.array_equal(lt.time_to_frames(t, sr=22050, hop_length=512), frames)
    # n_fft offset
    s2 = lt.frames_to_samples(frames, hop_length=512, n_fft=2048)
    assert np.array_equal(s2, frames * 512 + 1024)


def test_blocks():
    blocks = np.array([0, 1, 2])
    assert np.array_equal(lt.blocks_to_frames(blocks, block_length=16), blocks * 16)
    assert np.array_equal(
        lt.blocks_to_samples(blocks, block_length=16, hop_length=512),
        blocks * 16 * 512,
    )
    assert np.allclose(
        lt.blocks_to_time(blocks, block_length=16, hop_length=512, sr=22050),
        blocks * 16 * 512 / 22050,
    )


def test_note_to_midi():
    assert lt.note_to_midi("C4") == 60
    assert lt.note_to_midi("A4") == 69
    assert lt.note_to_midi("C#4") == 61
    assert lt.note_to_midi("Bb3") == 58
    assert lt.note_to_midi("C") == 12  # octave defaults to 0
    assert np.array_equal(lt.note_to_midi(["C4", "A4"]), [60, 69])
    with pytest.raises(ParameterError):
        lt.note_to_midi("H9")


def test_midi_hz():
    assert np.allclose(lt.midi_to_hz(69), 440.0)
    assert np.allclose(lt.hz_to_midi(440.0), 69.0)
    assert np.allclose(lt.midi_to_hz(lt.hz_to_midi(123.0)), 123.0)
    assert np.allclose(lt.note_to_hz("A4"), 440.0)


def test_mel_scale():
    # Slaney: linear below 1kHz (200/3 Hz per mel)
    assert np.allclose(lt.hz_to_mel(0.0), 0.0)
    assert np.allclose(lt.hz_to_mel(200.0 / 3), 1.0)
    assert np.allclose(lt.mel_to_hz(lt.hz_to_mel(4567.0)), 4567.0)
    # HTK formula
    assert np.allclose(lt.hz_to_mel(1000.0, htk=True), 2595 * np.log10(1 + 1000 / 700))
    assert np.allclose(lt.mel_to_hz(lt.hz_to_mel(3210.0, htk=True), htk=True), 3210.0)
    # array in/out with mixed linear/log regions
    f = np.array([100.0, 900.0, 1000.0, 8000.0])
    assert np.allclose(lt.mel_to_hz(lt.hz_to_mel(f)), f)


def test_octs():
    # A4 = 440 Hz is exactly octave number log2(440/27.5) = 4 (A0=27.5*... )
    assert np.allclose(lt.hz_to_octs(440.0), np.log2(440.0 / 27.5))
    assert np.allclose(lt.octs_to_hz(lt.hz_to_octs(440.0)), 440.0)


def test_tuning():
    assert np.allclose(lt.A4_to_tuning(440.0), 0.0)
    assert np.allclose(lt.tuning_to_A4(0.0), 440.0)
    assert np.allclose(lt.A4_to_tuning(lt.tuning_to_A4(0.25)), 0.25)


def test_fft_frequencies():
    f = lt.fft_frequencies(sr=22050, n_fft=16)
    assert len(f) == 9
    assert f[0] == 0
    assert np.allclose(f[-1], 22050 / 2)
    assert np.allclose(np.diff(f), 22050 / 16)


def test_cqt_frequencies():
    f = lt.cqt_frequencies(24, fmin=55.0)
    assert np.allclose(f[0], 55.0)
    assert np.allclose(f[12], 110.0)
    assert np.allclose(f[23] / f[11], 2.0)


def test_mel_frequencies():
    f = lt.mel_frequencies(40, fmin=0, fmax=11025)
    assert len(f) == 40
    assert f[0] == 0 and np.allclose(f[-1], 11025)
    assert np.all(np.diff(f) > 0)


def test_tempo_frequencies():
    t = lt.tempo_frequencies(8, hop_length=512, sr=22050)
    assert np.isinf(t[0])
    assert np.allclose(t[1], 60.0 * 22050 / 512)


def test_weightings():
    # A-weighting at 1 kHz is ~0 dB by construction
    assert abs(float(lt.A_weighting(1000.0))) < 0.2
    assert abs(float(lt.C_weighting(1000.0))) < 0.1
    assert float(lt.Z_weighting(123.0)) == 0.0
    multi = lt.multi_frequency_weighting(np.array([440.0, 1000.0]), kinds="ZAC")
    assert multi.shape == (3, 2)


def test_times_like():
    X = np.zeros((12, 10))
    t = lt.times_like(X, sr=22050, hop_length=512)
    assert len(t) == 10
    assert np.allclose(t, np.arange(10) * 512 / 22050)
    s = lt.samples_like(X, hop_length=512)
    assert np.array_equal(s, np.arange(10) * 512)
