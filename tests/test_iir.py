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
        # are the numerically hard case for f32 scans.  The exact-residual
        # refinement (+ f64-coefficient tails) must hold ~f64 accuracy.
        import scipy.signal

        from librosa_tpu.ops.iir import sosfiltfilt

        x = rng.randn(4000).astype(np.float32)
        sos = scipy.signal.ellip(
            4, 7, 100, [0.4, 0.41], btype="bandpass", output="sos"
        )
        y = np.asarray(sosfiltfilt(x, sos))
        ref = scipy.signal.sosfiltfilt(sos, x.astype(np.float64))
        snr = 10 * np.log10((ref**2).sum() / ((y - ref) ** 2).sum())
        assert snr > 130, snr

    def test_eft_exactness_under_jit(self, rng):
        # the refinement relies on two_sum/two_prod being error-free in
        # f32; XLA must not reassociate or FMA-contract them away
        import jax

        from librosa_tpu.ops.iir import _two_prod, _two_sum

        a = rng.randn(2048).astype(np.float32)
        b = rng.randn(2048).astype(np.float32)
        p, e = jax.jit(_two_prod)(a, b)
        exact = a.astype(np.float64) * b.astype(np.float64)
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        assert np.abs(got - exact).max() == 0.0
        s, e2 = jax.jit(_two_sum)(a, b)
        got = np.asarray(s, np.float64) + np.asarray(e2, np.float64)
        assert np.abs(got - (a.astype(np.float64) + b.astype(np.float64))).max() == 0.0

    def test_bank_filtfilt_semitone_worst_case(self, rng):
        # the full 882 Hz semitone group (Q ~ 1000) through ONE banked
        # program must match f64 scipy per band
        import scipy.signal

        import librosa_tpu.filters as ltf
        from librosa_tpu.ops.iir import sos_bank_filtfilt

        bank, rates = ltf.semitone_filterbank(flayout="sos")
        group = np.stack(
            [np.asarray(b) for b, r in zip(bank, rates) if r == 882.0]
        )[:8]
        x = rng.randn(4410).astype(np.float32)
        yb = np.asarray(sos_bank_filtfilt(x, group))
        assert yb.shape == (8, 4410)
        for i in range(group.shape[0]):
            ref = scipy.signal.sosfiltfilt(group[i], x.astype(np.float64))
            snr = 10 * np.log10((ref**2).sum() / ((yb[i] - ref) ** 2).sum())
            assert snr > 130, (i, snr)

    def test_bank_filtfilt_batched_input(self, rng):
        import scipy.signal

        from librosa_tpu.ops.iir import sos_bank_filtfilt

        bank = np.stack(
            [scipy.signal.butter(2, w, output="sos") for w in (0.1, 0.3)]
        )
        x = rng.randn(2, 3, 500).astype(np.float32)
        y = np.asarray(sos_bank_filtfilt(x, bank))
        assert y.shape == (2, 3, 2, 500)
        ref = scipy.signal.sosfiltfilt(bank[1], x[1, 2].astype(np.float64))
        np.testing.assert_allclose(y[1, 2, 1], ref, atol=1e-5)

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
