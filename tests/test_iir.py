"""ops.iir device scans vs scipy.signal.lfilter ground truth."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from librosa_tpu.ops.iir import first_order_filter


@pytest.mark.parametrize(
    "b,a",
    [
        ([1.0, -0.97], [1.0]),      # preemphasis FIR
        ([1.0], [1.0, -0.97]),      # deemphasis IIR
        ([1.0, -1.0], [1.0, -0.99]),  # onset detrend
        ([0.3, 0.2], [1.0, 0.5]),
    ],
)
@pytest.mark.parametrize("shape", [(4000,), (3, 2000)])
def test_first_order_matches_scipy(rng, b, a, shape):
    x = rng.randn(*shape).astype(np.float32)
    zi = rng.randn(*shape[:-1], 1).astype(np.float32)
    ref, ref_zf = scipy.signal.lfilter(b, a, x.astype(np.float64),
                                       zi=zi.astype(np.float64))
    y, zf = first_order_filter(
        jnp.asarray(x),
        b0=b[0], b1=b[1] if len(b) > 1 else 0.0,
        a1=a[1] if len(a) > 1 else 0.0,
        zi=jnp.asarray(zi),
    )
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(zf)[..., None], ref_zf, rtol=1e-4, atol=1e-5
    )


def test_streaming_continuation(rng):
    """Block-wise zf->zi chaining equals one-shot filtering."""
    x = rng.randn(5000).astype(np.float32)
    full, _ = first_order_filter(
        jnp.asarray(x), b0=1.0, b1=-1.0, a1=-0.99, zi=jnp.zeros(1)
    )
    y1, zf = first_order_filter(
        jnp.asarray(x[:2000]), b0=1.0, b1=-1.0, a1=-0.99, zi=jnp.zeros(1)
    )
    y2, _ = first_order_filter(
        jnp.asarray(x[2000:]), b0=1.0, b1=-1.0, a1=-0.99, zi=zf[..., None]
    )
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)]),
        np.asarray(full), rtol=1e-5, atol=1e-6,
    )


def test_axis_argument(rng):
    x = rng.randn(100, 4).astype(np.float32)
    y_ax0, _ = first_order_filter(
        jnp.asarray(x), b0=1.0, b1=0.0, a1=-0.5, zi=jnp.zeros((4, 1)), axis=0
    )
    y_t, _ = first_order_filter(
        jnp.asarray(x.T), b0=1.0, b1=0.0, a1=-0.5, zi=jnp.zeros((4, 1))
    )
    np.testing.assert_allclose(np.asarray(y_ax0), np.asarray(y_t).T, rtol=1e-6)


class TestSecondOrderSections:
    def _sos(self):
        import scipy.signal

        return scipy.signal.butter(4, 0.2, output="sos")

    def test_sosfilt_matches_scipy(self, rng):
        import scipy.signal

        from librosa_tpu.ops.iir import sosfilt

        x = rng.randn(3, 4000).astype(np.float32)
        sos = self._sos()
        y, zf = sosfilt(x, sos)
        ref = scipy.signal.sosfilt(sos, x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(np.asarray(y), ref, atol=2e-6)
        assert np.asarray(zf).shape == (3, sos.shape[0], 2)

    def test_sosfilt_zi_streaming(self, rng):
        from librosa_tpu.ops.iir import sosfilt

        x = rng.randn(4000).astype(np.float32)
        sos = self._sos()
        y_full, _ = sosfilt(x, sos)
        zi = np.zeros((sos.shape[0], 2), dtype=np.float32)
        y1, zf = sosfilt(x[:1500], sos, zi=zi)
        y2, _ = sosfilt(x[1500:], sos, zi=zf)
        glued = np.concatenate([np.asarray(y1), np.asarray(y2)])
        np.testing.assert_allclose(glued, np.asarray(y_full), atol=1e-6)

    def test_sosfiltfilt_matches_scipy(self, rng):
        import scipy.signal

        from librosa_tpu.ops.iir import sosfiltfilt

        x = rng.randn(2, 3000).astype(np.float32)
        sos = self._sos()
        y = np.asarray(sosfiltfilt(x, sos))
        ref = scipy.signal.sosfiltfilt(sos, x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(y, ref, atol=3e-6)

    def test_sosfiltfilt_high_q(self, rng):
        # the iirt-style elliptic band-pass: poles near the unit circle
        # are the numerically hard case for f32 scans
        import scipy.signal

        from librosa_tpu.ops.iir import sosfiltfilt

        x = rng.randn(4000).astype(np.float32)
        sos = scipy.signal.ellip(
            4, 7, 100, [0.4, 0.41], btype="bandpass", output="sos"
        )
        y = np.asarray(sosfiltfilt(x, sos))
        ref = scipy.signal.sosfiltfilt(sos, x.astype(np.float64))
        snr = 10 * np.log10((ref**2).sum() / ((y - ref) ** 2).sum())
        assert snr > 90, snr

    def test_sosfiltfilt_short_input_raises(self):
        from librosa_tpu.ops.iir import sosfiltfilt

        with pytest.raises(ValueError):
            sosfiltfilt(np.zeros(10, dtype=np.float32), self._sos())

    def test_sosfiltfilt_jit_safe(self, rng):
        import jax

        from librosa_tpu.ops.iir import sosfiltfilt

        x = rng.randn(2000).astype(np.float32)
        sos = self._sos()
        eager = np.asarray(sosfiltfilt(x, sos))
        jitted = np.asarray(
            jax.jit(lambda v: sosfiltfilt(v, sos))(x)
        )
        np.testing.assert_allclose(jitted, eager, atol=1e-6)
