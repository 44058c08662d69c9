"""Unit tests for the device cubic-spline resampler (ops/spline.py).

The not-a-knot interpolant is unique, so scipy's B-spline construction
(``interp1d(kind='cubic')``) is an exact oracle up to float error.
"""

import numpy as np
import pytest
import scipy.interpolate

import jax.numpy as jnp

from librosa_tpu.ops import spline


@pytest.mark.parametrize("n", [4, 5, 6, 7, 33, 256, 4096])
def test_cubic_matches_scipy(n):
    rng = np.random.default_rng(n)
    y = rng.standard_normal(n)
    x = np.linspace(0, 1, n, endpoint=False)
    targets = np.sort(rng.uniform(x[0], x[-1], size=97))

    want = scipy.interpolate.interp1d(x, y, kind="cubic")(targets)
    got = np.asarray(spline.uniform_cubic_resample(
        jnp.asarray(y, jnp.float32), targets, x0=0.0, dx=x[1] - x[0]
    ))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 5e-6


def test_cubic_batched_and_knot_exact():
    rng = np.random.default_rng(7)
    y = rng.standard_normal((3, 2, 64)).astype(np.float32)
    x = np.linspace(0, 1, 64, endpoint=False)

    # evaluating exactly at the knots must return the knot values
    got = np.asarray(spline.uniform_cubic_resample(
        jnp.asarray(y), x, x0=0.0, dx=x[1] - x[0]
    ))
    assert np.abs(got - y).max() < 1e-5

    # batched off-knot evaluation matches scipy along the last axis
    targets = np.sort(rng.uniform(0, x[-1], size=41))
    want = scipy.interpolate.interp1d(x, y, kind="cubic", axis=-1)(targets)
    got = np.asarray(spline.uniform_cubic_resample(
        jnp.asarray(y), targets, x0=0.0, dx=x[1] - x[0]
    ))
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-6


def test_linear_matches_scipy():
    rng = np.random.default_rng(3)
    y = rng.standard_normal(100)
    x = np.linspace(0, 1, 100, endpoint=False)
    targets = np.sort(rng.uniform(0, x[-1], size=55))
    want = scipy.interpolate.interp1d(x, y, kind="linear")(targets)
    got = np.asarray(spline.uniform_linear_resample(
        jnp.asarray(y, jnp.float32), targets, x0=0.0, dx=x[1] - x[0]
    ))
    assert np.abs(got - want).max() < 1e-6


def test_cubic_rejects_tiny_inputs():
    with pytest.raises(ValueError, match="4 samples"):
        spline.notaknot_second_derivatives(jnp.zeros(3))


def test_fmt_uses_device_spline(monkeypatch):
    """fmt's default (cubic) path must route through ops/spline — no
    scipy.interpolate import on the default path."""
    import librosa_tpu as lt
    from librosa_tpu.core import spectrum_ext

    calls = {}
    real = spectrum_ext.ops_spline.uniform_cubic_resample

    def spy(*args, **kwargs):
        calls["hit"] = True
        return real(*args, **kwargs)

    monkeypatch.setattr(
        spectrum_ext.ops_spline, "uniform_cubic_resample", spy
    )
    y = np.sin(np.arange(2048) / 16).astype(np.float32)
    out = np.asarray(lt.fmt(y))
    assert calls.get("hit"), "fmt(kind='cubic') did not use the device spline"
    assert np.iscomplexobj(out)


def test_fmt_matches_float64_reference_math():
    """End-to-end fmt vs the reference formula computed in float64."""
    import librosa_tpu as lt

    y = np.sin(2 * np.pi * np.arange(4096) / 64).astype(np.float32)
    ours = np.asarray(lt.fmt(y))

    n = len(y)
    t_min, over_sample = 0.5, 1
    log_base = np.log(n - 1) - np.log(n - 2)
    n_fmt = int(np.ceil(over_sample * (np.log(n - 1) - np.log(t_min))
                        / log_base))
    x = np.linspace(0, 1, num=n, endpoint=False)
    fit = scipy.interpolate.interp1d(x, y.astype(np.float64), kind="cubic")
    n_over = int(np.ceil(over_sample))
    x_exp = np.logspace(
        (np.log(t_min) - np.log(n)) / log_base, 0, num=n_fmt + n_over,
        endpoint=False, base=np.exp(log_base),
    )[:-n_over]
    x_exp = np.clip(x_exp, t_min / n, x[-1])
    ref = np.fft.rfft(fit(x_exp) * (x_exp**0.5 * np.sqrt(n) / n_fmt))

    err = np.abs(ours - ref)
    snr = 10 * np.log10((np.abs(ref) ** 2).sum() / (err**2).sum())
    assert snr > 110, f"fmt SNR vs float64 reference: {snr:.1f} dB"
