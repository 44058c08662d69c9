"""Tests for pitch tracking — including the reference's committed goldens."""

import os

import numpy as np
import pytest

import librosa_tpu as lt

GOLDEN_DIR = "/root/reference/tests"


@pytest.mark.parametrize("freq", [110, 220, 440, 880])
def test_yin_tone(freq):
    y = lt.tone(freq, duration=1.0).astype(np.float32)
    f0 = np.asarray(lt.yin(y, fmin=110, fmax=880, center=False))
    assert np.allclose(np.log2(f0), np.log2(freq), rtol=0, atol=1e-2)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN_DIR, "pitch-yin.npy")),
    reason="reference golden unavailable",
)
def test_yin_chirp_golden():
    """Reference golden-value regression (tests/test_core.py:1448)."""
    y = lt.chirp(fmin=220, fmax=640, duration=1.0).astype(np.float32)
    f0 = np.asarray(
        lt.yin(y, fmin=110, fmax=880, center=False, frame_length=1024, hop_length=512)
    )
    f0 = f0[:-2]
    target = np.load(os.path.join(GOLDEN_DIR, "pitch-yin.npy"))
    assert f0.shape == target.shape
    assert np.allclose(np.log2(f0), np.log2(target), rtol=0, atol=1e-2)


def test_yin_chirp_instant():
    """Frame-wise instantaneous frequency ground truth (test_core.py variant)."""
    sr = 22050
    t = np.arange(sr) / sr
    f = 220 * (640 / 220) ** t
    fl, hl = 2048, 512
    y = lt.chirp(fmin=220, fmax=640, sr=sr, duration=1.0).astype(np.float32)
    target = np.asarray(
        lt.util.frame(f, frame_length=fl, hop_length=hl)
    ).mean(axis=0)
    f0 = np.asarray(
        lt.yin(y, fmin=110, fmax=880, sr=sr, frame_length=fl, hop_length=hl,
               center=False)
    )
    assert np.allclose(np.log2(f0), np.log2(target), rtol=0, atol=1e-2)


def test_yin_multichannel():
    y1 = lt.tone(220, duration=0.5).astype(np.float32)
    y2 = lt.tone(440, duration=0.5).astype(np.float32)
    y = np.stack([y1, y2])
    f0 = np.asarray(lt.yin(y, fmin=110, fmax=880, center=False))
    assert f0.shape[0] == 2
    assert np.allclose(np.median(f0[0]), 220, rtol=1e-2)
    assert np.allclose(np.median(f0[1]), 440, rtol=1e-2)


@pytest.mark.parametrize(
    "fmin,fmax",
    [(None, None), (110, None), (None, 880), (-1, 440), (440, 220)],
)
def test_yin_bad_params(fmin, fmax):
    y = np.zeros(4096, dtype=np.float32)
    with pytest.raises(lt.ParameterError):
        lt.yin(y, fmin=fmin, fmax=fmax)


def test_piptrack_shapes(tone_440):
    pitches, mags = lt.piptrack(y=tone_440)
    assert pitches.shape == mags.shape
    assert pitches.shape[0] == 1025
