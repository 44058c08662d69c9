"""Seam-free sharding tests: sharded == unsharded, bit-exact.

This is the TPU analogue of the reference's multichannel congruence suite
(tests/test_multichannel.py) — the key contract that justifies time-sharding.
Runs on the 8-device virtual CPU mesh from conftest.
"""

import jax
import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu.parallel import make_mesh, stft_sharded, melspectrogram_sharded


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((8,), ("time",))


@pytest.mark.parametrize("pad_mode", ["constant", "reflect"])
def test_stft_sharded_bitexact(mesh8, pad_mode, rng):
    n = 8 * 512 * 16  # divisible by D * hop
    y = rng.randn(n).astype(np.float32)
    S_ref = np.asarray(lt.stft(y, pad_mode=pad_mode))
    S_sh = np.asarray(
        stft_sharded(y, mesh=mesh8, n_fft=2048, hop_length=512, pad_mode=pad_mode)
    )
    assert S_sh.shape == S_ref.shape
    # bit-exact: same samples, same window, same FFT
    assert np.array_equal(S_sh, S_ref)


def test_stft_sharded_multichannel(mesh8, rng):
    n = 8 * 512 * 8
    y = rng.randn(2, n).astype(np.float32)
    S_ref = np.asarray(lt.stft(y))
    S_sh = np.asarray(stft_sharded(y, mesh=mesh8))
    assert np.array_equal(S_sh, S_ref)


def test_melspectrogram_sharded_close(mesh8, rng):
    n = 8 * 512 * 16
    y = rng.randn(n).astype(np.float32)
    M_ref = np.asarray(lt.feature.melspectrogram(y=y))
    M_sh = np.asarray(melspectrogram_sharded(y, mesh=mesh8))
    assert M_sh.shape == M_ref.shape
    # mel matmul happens pre- vs post-gather; identical math, so exact
    assert np.allclose(M_sh, M_ref, rtol=1e-6, atol=1e-6)


def test_stft_sharded_rejects_bad_length(mesh8):
    y = np.zeros(1000, dtype=np.float32)
    with pytest.raises(lt.ParameterError):
        stft_sharded(y, mesh=mesh8)


def test_scaling_report_runs(mesh8):
    from librosa_tpu.parallel.scaling import scaling_report

    pts = scaling_report(
        device_counts=[1, 2, 4], seconds_per_device=1.0, iters=1
    )
    assert [p.n_devices for p in pts] == [1, 2, 4]
    assert pts[0].efficiency == 1.0
    for p in pts:
        assert p.samples_per_s > 0
