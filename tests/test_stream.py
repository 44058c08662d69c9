"""Blockwise streaming: O(block) memory, decoder seek/read, soxr state carry.

Reference contract: ``librosa/core/audio.py:223`` (stream), ``:1289``
(get_samplerate).  The key property — the full signal is never
materialized — is asserted directly by instrumenting the reader.
"""

import os
import wave

import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu import io as lt_io
from flac_writer import write_flac

SR = 22050


def _write_wav(path, y, sr=SR):
    y = np.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    pcm = (np.clip(y, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(y.shape[1])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def long_wav(tmp_path_factory):
    rng = np.random.RandomState(77)
    y = 0.3 * np.sin(2 * np.pi * 440 * np.arange(10 * SR) / SR)
    y += 0.05 * rng.randn(10 * SR)
    path = tmp_path_factory.mktemp("stream") / "long.wav"
    _write_wav(path, y)
    return str(path), y.astype(np.float32)


@pytest.fixture(scope="module")
def stereo_wav(tmp_path_factory):
    rng = np.random.RandomState(78)
    y = 0.2 * rng.randn(4 * SR, 2)
    path = tmp_path_factory.mktemp("stream") / "stereo.wav"
    _write_wav(path, y)
    return str(path)


def test_stream_blocks_match_full_load(long_wav):
    path, _ = long_wav
    y_full, _ = lt.load(path, sr=None)
    y_full = np.asarray(y_full)
    frame, hop, bl = 2048, 512, 16
    yield_size = (bl - 1) * hop + frame
    advance = bl * hop
    start = 0
    n_blocks = 0
    for block in lt.stream(
        path, block_length=bl, frame_length=frame, hop_length=hop, sr=None
    ):
        ref = y_full[start : start + yield_size]
        np.testing.assert_array_equal(np.asarray(block), ref)
        start += advance
        n_blocks += 1
    assert n_blocks == int(np.ceil(len(y_full) / advance))


def test_stream_never_materializes_signal(long_wav, monkeypatch):
    """The decoder is only ever asked for advance-sized reads — never the file."""
    path, y = long_wav
    read_sizes = []
    orig_read = lt_io.AudioReader.read

    def spy(self, n):
        read_sizes.append(int(n))
        return orig_read(self, n)

    monkeypatch.setattr(lt_io.AudioReader, "read", spy)
    frame, hop, bl = 2048, 512, 8
    advance = bl * hop
    blocks = list(
        lt.stream(path, block_length=bl, frame_length=frame, hop_length=hop,
                  sr=None)
    )
    assert len(blocks) > 10
    assert len(read_sizes) > 10          # many small reads, not one big one
    assert max(read_sizes) <= advance    # never more than one advance at once


def test_stream_resampled_matches_oneshot_load(long_wav):
    """soxr filter state carries across chunks: streamed == one-shot resample."""
    path, _ = long_wav
    target = SR // 2
    y_ref, _ = lt.load(path, sr=target, res_type="soxr_hq")
    y_ref = np.asarray(y_ref)
    advance = 13 * 256
    got = np.concatenate(
        [
            np.asarray(b)[:advance]  # blocks overlap; advances tile the signal
            for b in lt.stream(
                path, block_length=13, frame_length=1024, hop_length=256,
                sr=target,
            )
        ]
    )
    n = min(len(got), len(y_ref))
    assert abs(len(got) - len(y_ref)) <= 2  # flush-tail rounding only
    np.testing.assert_allclose(got[:n], y_ref[:n], atol=1e-6)


def test_stream_flac_blocks(tmp_path):
    rng = np.random.RandomState(9)
    pcm = (rng.randn(5 * SR) * 6000).astype(np.int16)
    path = str(tmp_path / "s.flac")
    write_flac(path, pcm, SR, blocksize=4096)
    y_full, file_sr = lt.load(path, sr=None)
    assert file_sr == SR
    y_full = np.asarray(y_full)
    np.testing.assert_allclose(y_full, pcm.astype(np.float32) / 32768.0)

    frame, hop, bl = 1024, 512, 9
    yield_size = (bl - 1) * hop + frame
    start = 0
    for block in lt.stream(
        path, block_length=bl, frame_length=frame, hop_length=hop, sr=None
    ):
        np.testing.assert_array_equal(
            np.asarray(block), y_full[start : start + yield_size]
        )
        start += bl * hop


def test_stream_offset_duration(long_wav):
    path, _ = long_wav
    y_full, _ = lt.load(path, sr=None)
    y_full = np.asarray(y_full)
    blocks = list(
        lt.stream(
            path, block_length=4, frame_length=512, hop_length=512, sr=None,
            offset=1.0, duration=2.0,
        )
    )
    got = np.concatenate([np.asarray(b)[: 4 * 512] for b in blocks])
    # overlapping tails double-count; reconstruct from advances only
    region = y_full[SR : SR + 2 * SR]
    np.testing.assert_array_equal(got[: len(region)], region)


def test_stream_fill_value_and_short_final_block(long_wav):
    path, _ = long_wav
    kw = dict(block_length=16, frame_length=2048, hop_length=512, sr=None)
    plain = list(lt.stream(path, **kw))
    filled = list(lt.stream(path, fill_value=0.0, **kw))
    assert len(plain) == len(filled)
    yield_size = 15 * 512 + 2048
    assert all(b.shape[-1] == yield_size for b in filled)
    short = plain[-1]
    np.testing.assert_array_equal(
        np.asarray(filled[-1][: short.shape[-1]]), np.asarray(short)
    )
    assert np.all(np.asarray(filled[-1][short.shape[-1]:]) == 0)


def test_stream_multichannel_and_mono(stereo_wav):
    y_st, _ = lt.load(stereo_wav, sr=None, mono=False)
    y_st = np.asarray(y_st)
    blocks = list(
        lt.stream(stereo_wav, block_length=8, frame_length=1024,
                  hop_length=512, sr=None, mono=False)
    )
    assert blocks[0].ndim == 2 and blocks[0].shape[0] == 2
    np.testing.assert_array_equal(blocks[0], y_st[:, : blocks[0].shape[-1]])

    y_mono, _ = lt.load(stereo_wav, sr=None, mono=True)
    mono_blocks = list(
        lt.stream(stereo_wav, block_length=8, frame_length=1024,
                  hop_length=512, sr=None, mono=True)
    )
    np.testing.assert_allclose(
        np.asarray(mono_blocks[0]),
        np.asarray(y_mono)[: mono_blocks[0].shape[-1]],
        atol=1e-7,
    )


def test_stream_validation(long_wav):
    path, _ = long_wav
    with pytest.raises(lt.ParameterError):
        next(lt.stream(path, block_length=0, frame_length=10, hop_length=5))
    with pytest.raises(lt.ParameterError):
        next(lt.stream(path, block_length=4, frame_length=10, hop_length=5,
                       res_type="polyphase"))
    with pytest.raises(lt.ParameterError):
        # 3 × 7 output samples at 1/3 native rate: fractional native advance
        next(lt.stream(path, block_length=3, frame_length=7, hop_length=7,
                       sr=SR / 3.0001))


# ---------------------------------------------------------------------------
# io submodule surface (reader/seek/decode dispatch and the soxr fallback)
# ---------------------------------------------------------------------------


class TestIOSurface:
    def test_read_audio_offset_duration_seeks(self, long_wav):
        path, y = long_wav
        got, sr = lt_io.read_audio(path, offset=2.0, duration=1.0)
        assert sr == SR and got.shape == (SR,)
        full, _ = lt_io.read_audio(path)
        np.testing.assert_array_equal(got, full[2 * SR : 3 * SR])

    def test_reader_seek_read(self, long_wav):
        path, _ = long_wav
        full, _ = lt_io.read_audio(path)
        with lt_io.AudioReader(path) as r:
            assert (r.sr, r.channels, r.frames) == (SR, 1, 10 * SR)
            r.seek(12345)
            np.testing.assert_array_equal(r.read(100)[:, 0],
                                          full[12345:12445])
            r.seek(0)
            np.testing.assert_array_equal(r.read(10)[:, 0], full[:10])

    def test_get_info_and_samplerate(self, long_wav):
        path, _ = long_wav
        assert lt_io.get_info(path) == (SR, 1, 10 * SR)
        assert lt_io.get_samplerate(path) == SR
        assert lt.get_samplerate(path) == SR

    def test_flac_reader_deep_seek(self, tmp_path):
        rng = np.random.RandomState(4)
        pcm = (rng.randn(40000, 2) * 5000).astype(np.int16)
        path = str(tmp_path / "d.flac")
        write_flac(path, pcm, 16000, blocksize=1024)
        ref = pcm.astype(np.float32) / 32768.0
        with lt_io.AudioReader(path) as r:
            assert (r.sr, r.channels, r.frames) == (16000, 2, 40000)
            r.seek(30000)
            np.testing.assert_array_equal(r.read(64), ref[30000:30064])
            r.seek(5)  # backwards: decoder rewinds and re-skips
            np.testing.assert_array_equal(r.read(3), ref[5:8])

    def test_soxr_unavailable_branch(self, monkeypatch):
        from librosa_tpu.io import _soxr

        monkeypatch.setattr(_soxr, "_lib", None)
        monkeypatch.setattr(_soxr, "_load_failed", True)
        assert _soxr.available() is False
        with pytest.raises(RuntimeError):
            _soxr.resample(np.zeros(10, np.float32), 2, 1)
        with pytest.raises(RuntimeError):
            _soxr.StreamResampler(2, 1)

    def test_soxr_stream_matches_oneshot(self):
        from librosa_tpu.io import _soxr

        if not _soxr.available():
            pytest.skip("libsoxr not present")
        x = np.random.RandomState(0).randn(44100).astype(np.float32)
        rs = _soxr.StreamResampler(44100, 22050, channels=1)
        parts = [rs.process(x[i : i + 4000]) for i in range(0, len(x), 4000)]
        parts.append(rs.process(np.empty(0, np.float32), last=True))
        y = np.concatenate(parts)
        ref = _soxr.resample(x, 44100, 22050)
        n = min(len(y), len(ref))
        np.testing.assert_allclose(y[:n], ref[:n], atol=1e-7)
        rs.close()

    def test_soxr_stream_empty_chunk_is_noop(self):
        # an empty mid-stream chunk must not flush the filter (soxr treats
        # a NULL input pointer as end-of-stream; regression for the ctypes
        # binding passing NULL for zero-length blocks)
        from librosa_tpu.io import _soxr

        if not _soxr.available():
            pytest.skip("libsoxr not present")
        x = np.random.RandomState(1).randn(20000).astype(np.float32)
        rs = _soxr.StreamResampler(44100, 22050, channels=1)
        parts = [rs.process(x[:10000])]
        mid = rs.process(np.empty(0, np.float32))  # must be a no-op
        assert mid.shape[0] == 0
        parts.append(rs.process(x[10000:]))
        parts.append(rs.process(np.empty(0, np.float32), last=True))
        y = np.concatenate(parts)
        rs2 = _soxr.StreamResampler(44100, 22050, channels=1)
        ref = np.concatenate(
            [rs2.process(x), rs2.process(np.empty(0, np.float32), last=True)]
        )
        np.testing.assert_array_equal(y, ref)
        rs.close(), rs2.close()

    def test_read_audio_negative_offset_reads_tail(self, long_wav):
        # negative offset counts back from the end of the file, matching
        # the reference's SEEK_END semantics (core/audio.py:188)
        path, _ = long_wav
        full, _ = lt_io.read_audio(path)
        tail, sr = lt_io.read_audio(path, offset=-1.0, duration=1.0)
        assert sr == SR and tail.shape == (SR,)
        np.testing.assert_array_equal(tail, full[-SR:])
        y_load, _ = lt.load(path, sr=None, offset=-1.0, duration=1.0)
        np.testing.assert_array_equal(np.asarray(y_load), tail)


def test_stream_accepts_open_reader(long_wav):
    """An already-open AudioReader streams and stays open (caller owns it).

    Mirrors the reference's contract for user-provided SoundFile handles
    (librosa/core/audio.py:530): stream() must not close what it did not
    open, so one handle can feed several passes.
    """
    path, _ = long_wav
    y_full, _ = lt.load(path, sr=None)
    with lt_io.AudioReader(path) as reader:
        blocks = list(
            lt.stream(reader, block_length=8, frame_length=1024,
                      hop_length=512, sr=None)
        )
        np.testing.assert_array_equal(
            np.asarray(blocks[0]), np.asarray(y_full)[: blocks[0].shape[-1]]
        )
        # still open: a second pass from the top works on the same handle
        reader.seek(0)
        again = next(
            lt.stream(reader, block_length=8, frame_length=1024,
                      hop_length=512, sr=None)
        )
        np.testing.assert_array_equal(np.asarray(again), np.asarray(blocks[0]))
