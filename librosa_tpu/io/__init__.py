"""Host-side audio decode.

Decoding is host work feeding device buffers (the reference delegates to
libsndfile via ``soundfile`` — ``librosa/core/audio.py:171``).  Here the
decode path is a native C++ module (``librosa_tpu/_native``): WAV and FLAC
decoders implemented from scratch, Ogg Vorbis via the system libvorbisfile,
MP3 via libmpg123.  A pure-Python WAV fallback covers environments where the
native module cannot build.
"""

from __future__ import annotations

import os
import wave
from typing import Optional, Tuple

import numpy as np

from ..util.exceptions import ParameterError
from . import _soxr

__all__ = ["read_audio", "get_samplerate", "get_info", "AudioReader"]


def _wav_bytes_to_float(raw: bytes, width: int) -> np.ndarray:
    """Interleaved PCM bytes → float32 samples in [-1, 1)."""
    if width == 2:
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if width == 4:
        return np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    if width == 1:
        return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        vals = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        return vals.astype(np.float32) / float(1 << 23)
    raise ParameterError(f"Unsupported WAV sample width: {width}")


def _native():
    try:
        from .._native import audioio

        return audioio
    except Exception:
        return None


class AudioReader:
    """Streaming decode handle: open once, seek to a frame, read N frames.

    The O(block)-memory primitive under :func:`read_audio` and
    ``librosa_tpu.stream`` (the reference holds a ``soundfile.SoundFile``
    the same way, ``librosa/core/audio.py:223``): the native C++ streams
    (wav/flac/ogg/mp3, ``_native/audioio.cpp``) decode incrementally, and
    a stdlib ``wave`` handle covers WAV when the native module is absent.

    Attributes
    ----------
    sr : int — native sampling rate
    channels : int — channel count
    frames : int or None — total frames if the container declares them

    Examples
    --------
    >>> import numpy as np, wave, tempfile, os
    >>> from librosa_tpu.io import AudioReader
    >>> path = os.path.join(tempfile.mkdtemp(), "t.wav")
    >>> with wave.open(path, "wb") as w:
    ...     w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
    ...     w.writeframes((np.arange(100) % 7 * 1000).astype("<i2").tobytes())
    >>> with AudioReader(path) as r:
    ...     r.sr, r.channels, r.frames, r.read(10).shape
    (8000, 1, 100, (10, 1))
    """

    def __init__(self, path):
        path = os.fspath(path)
        nat = _native()
        self._nat = None
        self._wave = None
        if nat is not None:
            self._nat = nat.open(path)
            self.sr = self._nat.sr
            self.channels = self._nat.channels
            self.frames = self._nat.frames
        else:
            ext = os.path.splitext(path)[1].lower()
            if ext not in (".wav", ".wave"):
                raise ParameterError(
                    f"Cannot stream {path!r}: native audio module unavailable "
                    "and the pure-Python fallback only supports WAV"
                )
            self._wave = wave.open(path, "rb")
            self.sr = self._wave.getframerate()
            self.channels = self._wave.getnchannels()
            self.frames = self._wave.getnframes()
            self._width = self._wave.getsampwidth()

    def read(self, n_frames: int) -> np.ndarray:
        """Decode the next ``n_frames`` frames from the current position.

        Returns an ``(n, channels)`` float32 array with samples in
        [-1, 1); ``n`` may be smaller than requested at end-of-stream,
        and a zero-row array signals EOF.  Memory cost is O(n_frames)
        regardless of file size — this is the read primitive
        ``librosa_tpu.stream`` loops over.
        """
        if self._nat is not None:
            return self._nat.read(int(n_frames))
        raw = self._wave.readframes(int(n_frames))
        return _wav_bytes_to_float(raw, self._width).reshape(-1, self.channels)

    def seek(self, frame: int) -> None:
        """Position the stream at an absolute frame index.

        The next :meth:`read` starts at ``frame`` (clamped to the valid
        range); this is how ``read_audio(offset=...)`` and negative
        stream offsets avoid decoding what they skip.  Positional for
        WAV, library-native for ogg/mp3, and decode-skip for FLAC — so
        a backwards FLAC seek costs a re-decode from the start, while
        all forward seeks are cheap.
        """
        frame = max(0, int(frame))
        if self._nat is not None:
            self._nat.seek(frame)
        else:
            self._wave.setpos(min(frame, self.frames))

    def close(self) -> None:
        """Release the underlying decoder handle.

        Frees the native stream (or stdlib ``wave`` reader) and its
        buffers — for FLAC that includes the multi-megabyte sliding
        decode window, so long-lived processes holding many readers
        should close them promptly.  Further reads raise.  Idempotent,
        and called automatically when the reader is used as a context
        manager.
        """
        if self._nat is not None:
            self._nat.close()
            self._nat = None
        if self._wave is not None:
            self._wave.close()
            self._wave = None

    def __enter__(self) -> "AudioReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def get_info(path: str) -> Tuple[int, int, int]:
    """Read an audio file's header: ``(sr, n_channels, n_frames)``.

    Uses the native C++ probe when available (wav/flac/ogg/mp3 — the
    same streaming open as :class:`AudioReader`, so only headers and
    metadata blocks are parsed), falling back to the stdlib ``wave``
    parser.  No sample data is decoded, making this the cheap way to
    size buffers or pick analysis parameters before a full
    :func:`read_audio`.

    Parameters
    ----------
    path : str or Path
        audio file

    Returns
    -------
    sr, n_channels, n_frames : int
        header sampling rate, channel count, and total frames
    """
    nat = _native()
    if nat is not None:
        return nat.info(os.fspath(path))
    with wave.open(os.fspath(path), "rb") as w:
        return w.getframerate(), w.getnchannels(), w.getnframes()


def get_samplerate(path: str) -> int:
    """Native sample rate of an audio file, without decoding it.

    Header-only probe (see :func:`get_info`); the usual companion of
    ``librosa_tpu.stream``, whose frame/hop geometry is expressed at the
    native rate — query the rate first, then choose block parameters.

    Parameters
    ----------
    path : str or Path
        audio file

    Returns
    -------
    sr : int
        sampling rate declared in the file header

    Examples
    --------
    >>> import librosa_tpu as lt  # doctest: +SKIP
    >>> sr = lt.get_samplerate('recording.flac')  # doctest: +SKIP

    Parity: reference ``librosa/core/audio.py:1289`` (get_samplerate).
    """
    return get_info(os.fspath(path))[0]


def read_audio(
    path: str,
    *,
    offset: float = 0.0,
    duration: Optional[float] = None,
    dtype: np.dtype = np.float32,
) -> Tuple[np.ndarray, int]:
    """Decode an audio file to ``(y, sr)``.

    ``y`` is float32 shaped ``(ch, n)`` (squeezed to ``(n,)`` for mono),
    matching the reference's soundfile load conventions
    (``librosa/core/audio.py:171`` __soundfile_load).  The native C++
    decoder (wav/flac/ogg) is preferred; stdlib ``wave`` is the fallback.

    Parameters
    ----------
    path : str or Path
        audio file
    offset : float
        start reading at this time (seconds, native rate)
    duration : float or None
        maximum amount to decode (seconds)
    dtype : numeric dtype
        output sample dtype

    Returns
    -------
    y : np.ndarray
    sr : int

    Notes
    -----
    Decodes through the streaming :class:`AudioReader`, so ``offset`` seeks
    instead of decoding-then-discarding and ``duration`` stops the decoder
    early — loading a minute from the middle of an hour-long file costs a
    minute's decode work, not an hour's.
    """
    with AudioReader(path) as reader:
        sr = reader.sr
        start = int(np.round(sr * offset)) if offset else 0
        if start < 0:
            # negative offset counts back from the end of the file
            # (reference __soundfile_load seeks with whence=SEEK_END,
            # core/audio.py:188)
            if reader.frames is None:
                raise ParameterError(
                    "negative offset requires a container that declares "
                    "its length"
                )
            start = max(0, reader.frames + start)
        if start:
            reader.seek(start)
        if duration is not None:
            data = reader.read(int(np.round(sr * duration)))
        elif reader.frames is not None:
            data = reader.read(max(0, reader.frames - start))
        else:
            chunks = []
            while True:
                c = reader.read(1 << 16)
                if c.shape[0] == 0:
                    break
                chunks.append(c)
            data = (
                np.concatenate(chunks)
                if chunks
                else np.empty((0, reader.channels), dtype=np.float32)
            )

    y = data.astype(dtype, copy=False).T  # (ch, n)
    if y.shape[0] == 1:
        y = y[0]
    return np.ascontiguousarray(y), int(sr)
