"""Tests for librosa_tpu.core.audio — synthesis, resampling, mixdown."""

import numpy as np
import pytest
import scipy.signal

import librosa_tpu as lt
from librosa_tpu.util.exceptions import ParameterError


def test_tone():
    y = lt.tone(440, sr=22050, duration=1.0)
    assert y.shape == (22050,)
    f = np.abs(np.fft.rfft(y))
    assert np.argmax(f) == 440  # 1-second signal → 1 Hz bins


def test_chirp():
    y = lt.chirp(fmin=220, fmax=640, sr=22050, duration=1.0)
    assert y.shape == (22050,)


def test_clicks():
    y = lt.clicks(times=np.array([0.1, 0.5]), sr=22050, length=22050)
    assert y.shape == (22050,)
    assert np.abs(y[2205:2305]).max() > 0
    assert np.abs(y[:2200]).max() == 0


@pytest.mark.parametrize("target", [16000, 44100, 11025])
def test_resample_poly_matches_scipy(tone_440, target):
    ours = np.asarray(
        lt.resample(tone_440, orig_sr=22050, target_sr=target, res_type="polyphase")
    )
    g = np.gcd(22050, target)
    ref = scipy.signal.resample_poly(
        tone_440.astype(np.float64), target // g, 22050 // g
    )
    n = int(np.ceil(len(tone_440) * target / 22050))
    ref = ref[:n]
    assert ours.shape == (n,)
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_resample_fft_matches_scipy(tone_440):
    ours = np.asarray(
        lt.resample(tone_440, orig_sr=22050, target_sr=16000, res_type="fft")
    )
    n = int(np.ceil(len(tone_440) * 16000 / 22050))
    ref = scipy.signal.resample(tone_440.astype(np.float64), n)
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_resample_soxr_preserves_tone(tone_440):
    out = np.asarray(
        lt.resample(tone_440, orig_sr=22050, target_sr=16000, res_type="soxr_hq")
    )
    assert out.shape == (int(np.ceil(len(tone_440) * 16000 / 22050)),)
    f = np.abs(np.fft.rfft(out))
    peak = np.argmax(f) * 16000 / len(out)
    assert abs(peak - 440) < 2


@pytest.mark.parametrize(
    "res_type,min_snr",
    [
        ("linear", 40),
        ("zero_order_hold", 15),
        ("sinc_fastest", 70),
        ("sinc_medium", 90),
        ("sinc_best", 110),
    ],
)
@pytest.mark.parametrize("target", [16000, 44100, 11025.5])
def test_resample_interp_modes(tone_440, res_type, min_snr, target):
    # Interpolation modes accept arbitrary (even non-integer) target rates.
    out = np.asarray(
        lt.resample(tone_440, orig_sr=22050, target_sr=target, res_type=res_type)
    )
    n = int(np.ceil(len(tone_440) * target / 22050))
    assert out.shape == (n,)
    tt = np.arange(n) / target
    ideal = np.sin(2 * np.pi * 440 * tt)
    m = slice(256, -256)
    snr = 10 * np.log10(
        np.mean(ideal[m] ** 2) / np.mean((out[m] - ideal[m]) ** 2)
    )
    assert snr > min_snr, (res_type, snr)


def test_resample_sinc_multichannel(noise):
    y = np.stack([noise, -noise])
    out = np.asarray(
        lt.resample(y, orig_sr=22050, target_sr=16000, res_type="sinc_best")
    )
    one = np.asarray(
        lt.resample(noise, orig_sr=22050, target_sr=16000, res_type="sinc_best")
    )
    assert out.shape[0] == 2
    assert np.allclose(out[0], one, atol=1e-6)
    assert np.allclose(out[0], -out[1], atol=1e-6)


def test_resample_zoh_exact_downsample(noise):
    # Exact 2:1 zero-order hold picks every other sample.
    out = np.asarray(
        lt.resample(noise, orig_sr=22050, target_sr=11025,
                    res_type="zero_order_hold")
    )
    assert np.array_equal(out, noise[::2][: len(out)])


def test_resample_identity(tone_440):
    out = lt.resample(tone_440, orig_sr=22050, target_sr=22050)
    assert np.asarray(out) is not None
    assert out.shape == tone_440.shape


def test_resample_multichannel(noise):
    y = np.stack([noise, -noise])
    out = np.asarray(
        lt.resample(y, orig_sr=22050, target_sr=11025, res_type="polyphase")
    )
    assert out.shape == (2, int(np.ceil(len(noise) / 2)))
    assert np.allclose(out[0], -out[1], atol=1e-6)


def test_to_mono(noise):
    y = np.stack([noise, -noise])
    m = np.asarray(lt.to_mono(y))
    assert m.shape == noise.shape
    assert np.allclose(m, 0, atol=1e-7)


def test_to_stereo(noise):
    s = np.asarray(lt.to_stereo(left=noise, right=-noise))
    assert s.shape == (2, len(noise))
    assert np.allclose(s[0], noise)


def test_to_multi(noise):
    m = np.asarray(lt.to_multi(noise, -noise, 2 * noise))
    assert m.shape == (3, len(noise))


def test_autocorrelate(rng):
    x = rng.randn(256).astype(np.float32)
    ours = np.asarray(lt.autocorrelate(x))
    ref = np.correlate(x.astype(np.float64), x.astype(np.float64), mode="full")[
        len(x) - 1 :
    ]
    assert np.allclose(ours, ref, rtol=1e-3, atol=1e-3)
    # bounded lag
    ours_b = np.asarray(lt.autocorrelate(x, max_size=10))
    assert ours_b.shape == (10,)
    assert np.allclose(ours_b, ref[:10], rtol=1e-3, atol=1e-3)


def test_zero_crossings():
    y = np.array([1.0, -1.0, 1.0, 1.0, -1.0], dtype=np.float32)
    z = np.asarray(lt.zero_crossings(y))
    assert z[0]  # pad=True
    assert np.array_equal(z[1:], [True, True, False, True])


def test_zero_crossings_tone(tone_440):
    z = np.asarray(lt.zero_crossings(tone_440, pad=False))
    assert abs(z.sum() - 880) <= 2


def test_lpc_recovers_ar_process(rng):
    # AR(2): y[n] = 0.9 y[n-1] - 0.5 y[n-2] + e
    n = 8192
    e = rng.randn(n)
    y = np.zeros(n)
    for i in range(2, n):
        y[i] = 0.9 * y[i - 1] - 0.5 * y[i - 2] + 0.1 * e[i]
    a = np.asarray(lt.lpc(y.astype(np.float32), order=2))
    assert a.shape == (3,)
    assert np.allclose(a[0], 1.0)
    assert np.allclose(a[1:], [-0.9, 0.5], atol=0.05)


def test_lpc_multichannel(rng):
    y = rng.randn(2, 2048).astype(np.float32)
    a = np.asarray(lt.lpc(y, order=4))
    assert a.shape == (2, 5)
    a0 = np.asarray(lt.lpc(y[0], order=4))
    assert np.allclose(a[0], a0, rtol=1e-3, atol=1e-5)


def test_mu_law_roundtrip(rng):
    x = np.clip(rng.randn(1000) * 0.3, -1, 1).astype(np.float32)
    c = lt.mu_compress(x, quantize=False)
    e = np.asarray(lt.mu_expand(c, quantize=False))
    assert np.allclose(e, x, atol=1e-5)
    # quantized round trip is lossy but bounded
    cq = lt.mu_compress(x, quantize=True)
    eq = np.asarray(lt.mu_expand(cq, quantize=True))
    assert np.max(np.abs(eq - x)) < 0.05


def test_get_duration(tone_440):
    assert lt.get_duration(y=tone_440, sr=22050) == 1.0
    S = lt.stft(tone_440)
    d = lt.get_duration(S=S, sr=22050)
    assert abs(d - 1.0) < 0.05


def test_ctfft_matches_numpy(rng):
    from librosa_tpu.ops.ctfft import fft_arbitrary, ifft_arbitrary

    for n in (360, 1000, 55125):
        x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
        ours = np.asarray(fft_arbitrary(x, n))
        ref = np.fft.fft(x)
        assert np.abs(ours - ref).max() / np.abs(ref).max() < 1e-5
        back = np.asarray(ifft_arbitrary(ours, n))
        assert np.abs(back - x).max() < 1e-4


def test_resample_fft_matmul_backend(rng):
    # force the TPU code path (CT matmul FFT) on CPU and compare to scipy
    import scipy.signal

    from librosa_tpu.ops import fft as F

    old = F.get_stft_backend()
    F.set_stft_backend("matmul")
    try:
        x = rng.randn(22050).astype(np.float32)
        ours = np.asarray(
            lt.resample(x, orig_sr=22050, target_sr=16000, res_type="fft")
        )
        ref = scipy.signal.resample(x, 16000)
        m = min(len(ours), len(ref))
        assert np.abs(ours[:m] - ref[:m]).max() / np.abs(ref).max() < 1e-5
    finally:
        F.set_stft_backend(old)


def test_device_res_type_substitution(tone_440):
    """Host-soxr qualities substitute device resamplers for traced inputs
    (host code cannot run under jit) and accelerator-resident arrays;
    host/CPU arrays keep exact soxr semantics (audio._device_res_type)."""
    import jax
    import jax.numpy as jnp

    from librosa_tpu.core.audio import _device_res_type

    y = np.asarray(tone_440, dtype=np.float32)
    # host numpy / CPU-backend arrays: unchanged
    assert _device_res_type(y, "soxr_hq") == "soxr_hq"
    assert _device_res_type(jnp.asarray(y), "soxr_hq") == "soxr_hq"
    # non-soxr modes always pass through
    assert _device_res_type(y, "polyphase") == "polyphase"

    # under jit the input is a tracer: integer ratios -> polyphase
    seen = {}

    def body(yy):
        seen["rt"] = _device_res_type(yy, "soxr_hq")
        seen["rt_frac"] = _device_res_type(yy, "soxr_hq", 22050, 16000.5)
        return yy

    jax.jit(body)(jnp.asarray(y))
    assert seen["rt"] == "polyphase"
    assert seen["rt_frac"] == "kaiser_best"

    # end to end: default-res_type cqt now traces (previously the host
    # soxr ladder made the default config un-jittable)
    C = jax.jit(
        lambda yy: jnp.abs(lt.cqt(yy, sr=22050, n_bins=48, tuning=0.0))
    )(jnp.asarray(y))
    ref = np.abs(
        np.asarray(
            lt.cqt(np.asarray(y), sr=22050, n_bins=48, tuning=0.0,
                   res_type="polyphase")
        )
    )
    assert np.allclose(np.asarray(C), ref, rtol=1e-4, atol=1e-5)
