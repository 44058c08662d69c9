"""Tests for reassigned spectrogram, Mellin transform, IIRT, and streaming."""

import numpy as np
import pytest

import librosa_tpu as lt


def test_reassigned_spectrogram_tone(tone_440):
    freqs, times, mags = lt.reassigned_spectrogram(tone_440, sr=22050)
    freqs, times, mags = map(np.asarray, (freqs, times, mags))
    assert freqs.shape == times.shape == mags.shape
    # High-energy bins should reassign very close to 440 Hz
    strong = mags > 0.25 * mags.max()
    assert np.nanmedian(np.abs(freqs[strong] - 440)) < 2.0


def test_reassigned_times(tone_440):
    freqs, times, mags = lt.reassigned_spectrogram(tone_440, sr=22050)
    times = np.asarray(times)
    # times within signal duration
    finite = np.isfinite(times)
    assert times[finite].min() >= 0
    assert times[finite].max() <= 1.0 + 1e-3


def test_reassigned_validation(tone_440):
    with pytest.raises(lt.ParameterError):
        lt.reassigned_spectrogram(
            tone_440, reassign_frequencies=False, reassign_times=False
        )


def test_fmt_scale_invariance():
    """The Mellin transform magnitude is invariant to time scaling."""
    n = 4096
    t = np.linspace(0, 1, n, endpoint=False)
    y1 = np.sin(2 * np.pi * 16 * t) * np.exp(-3 * t)
    # time-scaled version (stretched by 1.25)
    y2 = np.sin(2 * np.pi * 16 * 1.25 * t) * np.exp(-3 * 1.25 * t)
    f1 = np.abs(np.asarray(lt.fmt(y1, n_fmt=256)))
    f2 = np.abs(np.asarray(lt.fmt(y2, n_fmt=256)))
    # normalize and compare shape of the scale transform
    c = np.corrcoef(f1, f2)[0, 1]
    assert c > 0.9


def test_fmt_validation():
    with pytest.raises(lt.ParameterError):
        lt.fmt(np.zeros(2))
    with pytest.raises(lt.ParameterError):
        lt.fmt(np.ones(100), t_min=-1)


def test_iirt_shape(tone_440):
    D = np.asarray(lt.iirt(tone_440, sr=22050, res_type="polyphase"))
    assert D.shape[0] == 85  # semitone filterbank size
    assert np.all(D >= 0)
    # A4 band (MIDI 69 → index 69-24=45) carries the most energy
    peak_band = D.mean(axis=1).argmax()
    assert abs(peak_band - 45) <= 1


def test_stream_blocks(tmp_path, tone_440):
    import wave

    path = str(tmp_path / "t.wav")
    pcm = (tone_440 * 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(pcm.tobytes())

    blocks = list(
        lt.stream(
            path, block_length=16, frame_length=2048, hop_length=512, sr=None
        )
    )
    assert len(blocks) >= 2
    # first blocks have the full size: (block_length-1)*hop + frame
    assert blocks[0].shape[-1] == 15 * 512 + 2048
    # stream with fill_value pads the last block
    blocks_f = list(
        lt.stream(
            path, block_length=16, frame_length=2048, hop_length=512,
            sr=None, fill_value=0.0,
        )
    )
    assert all(b.shape[-1] == blocks_f[0].shape[-1] for b in blocks_f)
    # block seams: consecutive blocks overlap by frame_length - hop
    adv = 16 * 512
    assert np.allclose(blocks[1][:100], np.asarray(tone_440[adv : adv + 100]),
                       atol=1e-4)


def test_cache_manager(tmp_path):
    from librosa_tpu._cache import CacheManager

    cm = CacheManager(str(tmp_path), verbose=0, level=10)
    calls = []

    @cm(level=5)
    def f(x):
        calls.append(x)
        return x * 2

    assert f(3) == 6
    assert f(3) == 6
    assert len(calls) == 1  # second call served from cache

    cm_off = CacheManager(None, level=10)

    @cm_off(level=5)
    def g(x):
        return x + 1

    assert g(1) == 2
