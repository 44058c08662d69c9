"""Tests for librosa_tpu.feature — spectral descriptors and filterbank features."""

import numpy as np
import pytest
import scipy.fft
import scipy.signal

import librosa_tpu as lt


def test_melspectrogram_matches_manual(tone_440):
    M = np.asarray(lt.feature.melspectrogram(y=tone_440))
    S = np.abs(np.asarray(lt.stft(tone_440))) ** 2
    basis = lt.filters.mel(sr=22050, n_fft=2048)
    ref = basis @ S
    assert M.shape == (128, S.shape[-1])
    assert np.allclose(M, ref, rtol=1e-4, atol=1e-6)


def test_melspectrogram_peak_bin(tone_440):
    M = np.asarray(lt.feature.melspectrogram(y=tone_440))
    # energy should be concentrated near the 440 Hz mel bin
    mel_f = lt.mel_frequencies(128, fmin=0, fmax=11025)
    peak_bin = M.mean(axis=1).argmax()
    assert abs(mel_f[peak_bin] - 440) < 100


def test_mfcc_matches_scipy_dct(tone_440):
    Sdb = np.asarray(lt.power_to_db(lt.feature.melspectrogram(y=tone_440)))
    ours = np.asarray(lt.feature.mfcc(S=Sdb, n_mfcc=20))
    ref = scipy.fft.dct(Sdb.astype(np.float64), axis=-2, type=2, norm="ortho")[:20]
    assert np.allclose(ours, ref, rtol=1e-4, atol=2e-3)


def test_mfcc_lifter(tone_440):
    M0 = np.asarray(lt.feature.mfcc(y=tone_440, n_mfcc=13))
    M1 = np.asarray(lt.feature.mfcc(y=tone_440, n_mfcc=13, lifter=22))
    LI = np.sin(np.pi * np.arange(1, 14) / 22)
    assert np.allclose(M1, M0 * (1 + 11 * LI[:, None]), rtol=1e-4, atol=1e-4)


def test_spectral_centroid_tone(tone_440):
    c = np.asarray(lt.feature.spectral_centroid(y=tone_440))
    assert c.shape[0] == 1
    # interior frames should be near 440
    assert abs(np.median(c) - 440) < 20


def test_spectral_bandwidth_tone_vs_noise(tone_440, noise):
    bw_tone = np.median(np.asarray(lt.feature.spectral_bandwidth(y=tone_440)))
    bw_noise = np.median(np.asarray(lt.feature.spectral_bandwidth(y=noise)))
    assert bw_tone < bw_noise


def test_spectral_rolloff(noise):
    r = np.asarray(lt.feature.spectral_rolloff(y=noise, roll_percent=0.85))
    assert np.all(r > 0) and np.all(r <= 11025)
    r99 = np.asarray(lt.feature.spectral_rolloff(y=noise, roll_percent=0.99))
    assert np.median(r99) > np.median(r)


def test_spectral_flatness(tone_440, noise):
    f_tone = np.median(np.asarray(lt.feature.spectral_flatness(y=tone_440)))
    f_noise = np.median(np.asarray(lt.feature.spectral_flatness(y=noise)))
    assert f_tone < 0.01
    assert f_noise > 0.1


def test_spectral_contrast_shape(noise):
    c = np.asarray(lt.feature.spectral_contrast(y=noise))
    assert c.shape[0] == 7  # n_bands + 1


def test_rms_y_vs_S(noise):
    r_y = np.asarray(lt.feature.rms(y=noise))
    S = np.abs(np.asarray(lt.stft(noise)))
    r_S = np.asarray(lt.feature.rms(S=S))
    # Parseval: windowed spectral energy approximates frame energy
    assert r_y.shape == r_S.shape
    # S-path frames are hann-windowed while y-path frames are not, so the
    # two only agree up to windowing; check strong correlation
    c = np.corrcoef(r_y[0], r_S[0])[0, 1]
    assert c > 0.9


def test_rms_value():
    y = np.ones(2048, dtype=np.float32) * 0.5
    r = np.asarray(lt.feature.rms(y=y, center=False))
    assert np.allclose(r, 0.5, atol=1e-6)


def test_zero_crossing_rate(tone_440):
    z = np.asarray(lt.feature.zero_crossing_rate(tone_440))
    # 440 Hz tone has 880 crossings/sec → rate ≈ 880/22050
    assert abs(np.median(z) - 880 / 22050) < 0.005


def test_poly_features(noise):
    p = np.asarray(lt.feature.poly_features(y=noise, order=1))
    assert p.shape[0] == 2
    # compare against np.polyfit on one frame
    S = np.abs(np.asarray(lt.stft(noise)))
    freq = lt.fft_frequencies(sr=22050, n_fft=2048)
    ref = np.polyfit(freq, S[:, 5].astype(np.float64), 1)
    assert np.allclose(p[:, 5], ref, rtol=1e-2, atol=1e-6)


def test_chroma_stft_tone(tone_440):
    c = np.asarray(lt.feature.chroma_stft(y=tone_440, tuning=0.0))
    assert c.shape[0] == 12
    # A (440 Hz) is chroma bin 9 (base C)
    assert c.mean(axis=1).argmax() == 9


def test_tonnetz_shape(tone_440):
    chroma = np.asarray(lt.feature.chroma_stft(y=tone_440, tuning=0.0))
    t = np.asarray(lt.feature.tonnetz(chroma=chroma))
    assert t.shape[0] == 6


def test_delta_matches_savgol(rng):
    x = rng.randn(12, 30).astype(np.float32)
    ours = np.asarray(lt.feature.delta(x, width=9, order=1))
    ref = scipy.signal.savgol_filter(
        x.astype(np.float64), 9, deriv=1, axis=-1, polyorder=1, mode="interp"
    )
    assert np.allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_delta_order2(rng):
    x = rng.randn(5, 40).astype(np.float32)
    ours = np.asarray(lt.feature.delta(x, width=9, order=2))
    ref = scipy.signal.savgol_filter(
        x.astype(np.float64), 9, deriv=2, axis=-1, polyorder=2, mode="interp"
    )
    assert np.allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_stack_memory(rng):
    x = rng.randn(3, 10).astype(np.float32)
    s = np.asarray(lt.feature.stack_memory(x, n_steps=3, delay=1))
    assert s.shape == (9, 10)
    assert np.allclose(s[:3], x)
    assert np.allclose(s[3:6, 1:], x[:, :-1])
    assert np.allclose(s[3:6, 0], 0)
    assert np.allclose(s[6:9, 2:], x[:, :-2])


def test_stack_memory_negative_delay(rng):
    x = rng.randn(2, 8).astype(np.float32)
    s = np.asarray(lt.feature.stack_memory(x, n_steps=2, delay=-1))
    assert s.shape == (4, 8)
    assert np.allclose(s[2:4, :-1], x[:, 1:])
    assert np.allclose(s[2:4, -1], 0)


def test_estimate_tuning_detuned():
    # quarter-tone sharp A: 440 * 2^(0.25/12)
    f = 440 * 2 ** (0.25 / 12)
    y = lt.tone(f, duration=2.0).astype(np.float32)
    t = lt.estimate_tuning(y=y)
    assert abs(t - 0.25) < 0.05


def test_piptrack_tone(tone_440):
    pitches, mags = lt.piptrack(y=tone_440)
    pitches, mags = np.asarray(pitches), np.asarray(mags)
    active = pitches[mags > 0.5 * mags.max()]
    assert len(active)
    assert abs(np.median(active) - 440) < 5


def test_chroma_vqt_default_gamma_is_zero():
    # reference feature/spectral.py:1588 declares gamma=0 (constant-Q
    # bandwidths); the default must NOT fall through to vqt's auto-gamma
    import librosa_tpu as lt

    y = np.asarray(lt.tone(220, duration=0.5)).astype(np.float32)
    default = np.asarray(lt.feature.chroma_vqt(
        y=y, sr=22050, intervals="equal", n_octaves=6,
    ))
    explicit = np.asarray(lt.feature.chroma_vqt(
        y=y, sr=22050, intervals="equal", n_octaves=6, gamma=0,
    ))
    auto = np.asarray(lt.feature.chroma_vqt(
        y=y, sr=22050, intervals="equal", n_octaves=6, gamma=None,
    ))
    np.testing.assert_array_equal(default, explicit)
    assert not np.allclose(default, auto)
