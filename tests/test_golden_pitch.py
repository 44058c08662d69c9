"""Golden-value regression: yin/pyin against the reference's checked-in
vamp-plugin oracles (reference tests/test_core.py:1448,1576).

The oracle .npy files are data fixtures from the reference repository;
matching them within one cent demonstrates numerical parity of the whole
pitch stack (framing → CMND → parabolic interpolation → thresholding →
Viterbi decoding).
"""

import os

import numpy as np
import pytest

import librosa_tpu as lt

ORACLES = "/root/reference/tests"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ORACLES, "pitch-yin.npy")),
    reason="reference oracle fixtures unavailable",
)
def test_yin_chirp_golden():
    y = np.asarray(lt.chirp(fmin=220, fmax=640, duration=1.0))
    f0 = np.asarray(
        lt.yin(y, fmin=110, fmax=880, center=False, frame_length=1024,
               hop_length=512)
    )
    f0 = f0[:-2]
    target = np.load(os.path.join(ORACLES, "pitch-yin.npy"))
    assert f0.shape == target.shape
    assert np.allclose(np.log2(f0), np.log2(target), rtol=0, atol=1e-2)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ORACLES, "pitch-pyin.npy")),
    reason="reference oracle fixtures unavailable",
)
def test_pyin_chirp_golden():
    y = np.asarray(lt.chirp(fmin=220, fmax=640, duration=1.0))
    y = np.pad(y, (22050,))
    f0, voiced_flag, _ = lt.pyin(
        y, fmin=60, fmax=900, center=False, frame_length=1024,
        hop_length=512, resolution=0.2,
    )
    f0 = np.asarray(f0)[:-2]
    voiced_flag = np.asarray(voiced_flag)[:-2]
    target = np.load(os.path.join(ORACLES, "pitch-pyin.npy"))
    assert f0.shape == target.shape
    # voicing decisions match the oracle
    assert np.array_equal(voiced_flag, target > 0)
    # voiced frames within one cent
    assert np.allclose(
        np.log2(f0[voiced_flag]), np.log2(target[target > 0]),
        rtol=0, atol=1e-2,
    )


@pytest.mark.parametrize("freq", [110, 220, 440, 880])
def test_yin_tone_golden(freq):
    y = np.asarray(lt.tone(freq, duration=1.0))
    f0 = np.asarray(lt.yin(y, fmin=110, fmax=880, center=False))
    assert np.allclose(np.log2(f0), np.log2(freq), rtol=0, atol=1e-2)


def test_yin_chirp_instantaneous():
    sr = 22050
    t = np.arange(sr) / sr
    f = 220 * (640 / 220) ** t
    fl, hl = 2048, 512
    y = np.asarray(lt.chirp(fmin=220, fmax=640, sr=sr, duration=1.0,
                            linear=False))
    target = np.asarray(
        lt.util.frame(f, frame_length=fl, hop_length=hl)
    ).mean(axis=0)
    f0 = np.asarray(
        lt.yin(y, fmin=110, fmax=880, sr=sr, frame_length=fl, hop_length=hl,
               center=False)
    )
    assert np.allclose(np.log2(f0), np.log2(target), rtol=0, atol=1e-2)
