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


@pytest.mark.parametrize(
    "name,fn",
    [
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
    ],
)
def test_multichannel_matches_per_channel(y_stereo, name, fn):
    _stacked_equals_per_channel(fn, y_stereo)


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
