"""Tests for librosa_tpu.core.spectrum — STFT engine and transforms."""

import numpy as np
import pytest
import scipy.signal

import librosa_tpu as lt


def test_stft_shape(tone_440):
    S = np.asarray(lt.stft(tone_440))
    n_frames = 1 + len(tone_440) // 512
    assert S.shape == (1025, n_frames)
    assert S.dtype == np.complex64


def test_stft_matches_direct_dft(tone_440):
    """Centered stft frame t covers y_padded[t*hop : t*hop+n_fft]."""
    n_fft, hop = 512, 128
    S = np.asarray(lt.stft(tone_440, n_fft=n_fft, hop_length=hop))
    w = scipy.signal.get_window("hann", n_fft, fftbins=True)
    ypad = np.pad(tone_440.astype(np.float64), n_fft // 2)
    for t in [0, 3, 17]:
        frame = ypad[t * hop : t * hop + n_fft]
        ref = np.fft.rfft(w * frame)
        assert np.allclose(S[:, t], ref, atol=2e-4)


def test_stft_uncentered(tone_440):
    S = np.asarray(lt.stft(tone_440, center=False))
    n_frames = 1 + (len(tone_440) - 2048) // 512
    assert S.shape == (1025, n_frames)


def test_stft_istft_roundtrip(tone_440):
    S = lt.stft(tone_440)
    y = np.asarray(lt.istft(S, length=len(tone_440)))
    assert y.shape == tone_440.shape
    assert np.max(np.abs(y - tone_440)) < 1e-5


def test_stft_istft_roundtrip_multichannel(noise):
    y = np.stack([noise, noise[::-1]])
    S = lt.stft(y, n_fft=1024, hop_length=256)
    yr = np.asarray(lt.istft(S, n_fft=1024, hop_length=256, length=y.shape[-1]))
    assert yr.shape == y.shape
    assert np.max(np.abs(yr - y)) < 1e-5


def test_istft_no_length(tone_440):
    S = lt.stft(tone_440)
    y = np.asarray(lt.istft(S))
    # expected length: n_fft + hop*(T-1) - 2*(n_fft//2)
    T = S.shape[-1]
    assert y.shape[-1] == 2048 + 512 * (T - 1) - 2048


def test_magphase(tone_440):
    D = lt.stft(tone_440)
    mag, phase = lt.magphase(D)
    assert np.allclose(np.asarray(mag) * np.asarray(phase), np.asarray(D), atol=1e-4)
    assert np.allclose(np.abs(np.asarray(phase)), 1.0, atol=1e-5)


def test_power_to_db():
    S = np.array([[1e-12, 1.0, 100.0]], dtype=np.float32)
    db = np.asarray(lt.power_to_db(S, top_db=None))
    assert np.allclose(db, [[-100.0, 0.0, 20.0]], atol=1e-4)
    # top_db clamp
    db2 = np.asarray(lt.power_to_db(S, top_db=80.0))
    assert db2.min() >= db2.max() - 80.0
    # ref callable
    db3 = np.asarray(lt.power_to_db(S, ref=np.max, top_db=None))
    assert np.allclose(db3.max(), 0.0, atol=1e-5)


def test_db_roundtrips():
    S = np.abs(np.random.RandomState(0).randn(8, 4)).astype(np.float32) + 0.01
    db = lt.power_to_db(S, top_db=None)
    assert np.allclose(np.asarray(lt.db_to_power(db)), S, rtol=1e-4)
    adb = lt.amplitude_to_db(S, top_db=None)
    assert np.allclose(np.asarray(lt.db_to_amplitude(adb)), S, rtol=1e-3)


def test_pcen_matches_scipy_lfilter(rng):
    S = np.abs(rng.randn(5, 40)).astype(np.float32)
    b = 0.2
    out = np.asarray(lt.pcen(S, b=b, eps=1e-6, gain=0.98, bias=2, power=0.5))

    zi = scipy.signal.lfilter_zi([b], [1, b - 1])
    M, _ = scipy.signal.lfilter(
        [b], [1, b - 1], S.astype(np.float64), axis=-1,
        zi=np.ones((5, 1)) * zi,
    )
    smooth = np.exp(-0.98 * (np.log(1e-6) + np.log1p(M / 1e-6)))
    ref = (2**0.5) * np.expm1(0.5 * np.log1p(S * smooth / 2))
    assert np.allclose(out, ref, rtol=1e-3, atol=1e-5)


def test_pcen_streaming_state(rng):
    """pcen(zi=..., return_zf=True) tiles across blocks seamlessly."""
    S = np.abs(rng.randn(3, 60)).astype(np.float32)
    full = np.asarray(lt.pcen(S, b=0.3))
    p1, zf = lt.pcen(S[..., :30], b=0.3, return_zf=True)
    p2 = lt.pcen(S[..., 30:], b=0.3, zi=np.asarray(zf))
    joined = np.concatenate([np.asarray(p1), np.asarray(p2)], axis=-1)
    assert np.allclose(full, joined, rtol=1e-4, atol=1e-6)


def test_phase_vocoder_shape(tone_440):
    D = lt.stft(tone_440)
    D2 = np.asarray(lt.phase_vocoder(D, rate=2.0))
    assert D2.shape[-1] == int(np.ceil(D.shape[-1] / 2.0))
    assert D2.shape[:-1] == D.shape[:-1]
    # identity rate keeps magnitudes
    D1 = np.asarray(lt.phase_vocoder(D, rate=1.0))
    assert np.allclose(np.abs(D1), np.abs(np.asarray(D)), atol=1e-4)


def test_griffinlim_reconstructs(tone_440):
    S = np.abs(np.asarray(lt.stft(tone_440, n_fft=1024, hop_length=256)))
    y = np.asarray(
        lt.griffinlim(
            S, n_iter=16, n_fft=1024, hop_length=256, length=len(tone_440),
            random_state=0,
        )
    )
    assert y.shape == tone_440.shape
    # reconstruction should preserve the dominant frequency
    f = np.abs(np.fft.rfft(y))
    peak = np.argmax(f) * 22050 / len(y)
    assert abs(peak - 440) < 5


def test_spectrogram_helper(tone_440):
    S, n_fft = lt.core.spectrum._spectrogram(y=tone_440, n_fft=1024, power=2)
    assert n_fft == 1024
    assert S.shape[0] == 513
    S2, n2 = lt.core.spectrum._spectrogram(S=S, power=2)
    assert n2 == 1024
    assert S2 is S


def test_power_to_db_axes_per_channel(rng):
    # multichannel: with axes='auto', callable ref and top_db peak are
    # computed per channel (trailing 2 axes), matching the reference.
    S = np.abs(rng.randn(2, 16, 20)).astype(np.float32)
    S[1] *= 1000.0
    out = np.asarray(lt.power_to_db(S, ref=np.max, top_db=80.0))
    per = np.stack(
        [np.asarray(lt.power_to_db(S[i], ref=np.max, top_db=80.0)) for i in range(2)]
    )
    assert np.allclose(out, per, atol=1e-5)
    # axes=None reverts to a global reduction
    glob = np.asarray(lt.power_to_db(S, ref=np.max, top_db=80.0, axes=None))
    assert not np.allclose(out, glob)


def test_amplitude_to_db_axes(rng):
    S = np.abs(rng.randn(2, 16, 20)).astype(np.float32)
    S[0] *= 100.0
    out = np.asarray(lt.amplitude_to_db(S, ref=np.max))
    per = np.stack(
        [np.asarray(lt.amplitude_to_db(S[i], ref=np.max)) for i in range(2)]
    )
    assert np.allclose(out, per, atol=1e-4)


def test_griffinlim_rng_and_deprecated_random_state(rng):
    S = np.abs(rng.randn(33, 12)).astype(np.float32)
    y1 = np.asarray(lt.griffinlim(S, n_iter=2, rng=7, n_fft=64))
    y2 = np.asarray(lt.griffinlim(S, n_iter=2, rng=7, n_fft=64))
    assert np.allclose(y1, y2)
    with pytest.warns(FutureWarning):
        lt.griffinlim(S, n_iter=1, random_state=1, n_fft=64)
    with pytest.raises(lt.ParameterError):
        lt.griffinlim(S, n_iter=1, rng=1, random_state=1, n_fft=64)


def test_pcen_streaming_state_seamless(rng):
    # pcen(zi/return_zf) carries IIR state so blockwise == full
    S = np.abs(rng.randn(40, 100)).astype(np.float32) * (2.0**31)
    full = np.asarray(lt.pcen(S))
    a, zf = lt.pcen(S[:, :60], return_zf=True)
    b = lt.pcen(S[:, 60:], zi=zf)
    joined = np.concatenate([np.asarray(a), np.asarray(b)], axis=-1)
    np.testing.assert_allclose(joined, full, atol=1e-4)


def test_stream_blockwise_stft_tiles(tmp_path, tone_440):
    # stft(center=False) over stream blocks tiles exactly into the full stft
    import wave

    y = np.asarray(tone_440)
    pcm = (np.clip(y, -1, 1) * 32767).astype("<i2")
    path = str(tmp_path / "t.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(pcm.tobytes())

    frame_length, hop = 512, 128
    blocks = [
        np.abs(np.asarray(lt.stft(
            np.asarray(b, dtype=np.float32),
            n_fft=frame_length, hop_length=hop, center=False,
        )))
        for b in lt.stream(
            path, block_length=16, frame_length=frame_length,
            hop_length=hop, sr=None,
        )
        if len(b) >= frame_length
    ]
    tiled = np.concatenate(blocks, axis=-1)
    yq = pcm.astype(np.float32) / 32768.0
    full = np.abs(np.asarray(lt.stft(
        yq, n_fft=frame_length, hop_length=hop, center=False
    )))
    T = min(tiled.shape[-1], full.shape[-1])
    np.testing.assert_allclose(tiled[:, :T], full[:, :T], atol=1e-4)
