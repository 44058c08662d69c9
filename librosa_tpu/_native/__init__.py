"""Native (C++) host runtime for librosa_tpu.

Builds ``audioio.cpp`` into a shared library on first import (cached next to
the source, invalidated by source mtime) and exposes it via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "audioio.cpp"), os.path.join(_DIR, "hostdp.cpp")]
_SO = os.path.join(_DIR, "_audioio.so")


def _build() -> None:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        *_SRCS, "-o", _SO, "-ldl",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _ensure_built() -> None:
    if not os.path.exists(_SO) or any(
        os.path.getmtime(_SO) < os.path.getmtime(s) for s in _SRCS
    ):
        _build()


_ensure_built()
_lib = ctypes.CDLL(_SO)
_lib.lt_decode.restype = ctypes.c_int
_lib.lt_decode.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ctypes.POINTER(ctypes.c_long),
    ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.c_int),
]
_lib.lt_info.restype = ctypes.c_int
_lib.lt_info.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.c_long),
]
_lib.lt_free.restype = None
_lib.lt_free.argtypes = [ctypes.c_void_p]
_lib.lt_last_error.restype = ctypes.c_char_p
_lib.lt_open.restype = ctypes.c_void_p
_lib.lt_open.argtypes = [ctypes.c_char_p]
_lib.lt_stream_sr.restype = ctypes.c_int
_lib.lt_stream_sr.argtypes = [ctypes.c_void_p]
_lib.lt_stream_channels.restype = ctypes.c_int
_lib.lt_stream_channels.argtypes = [ctypes.c_void_p]
_lib.lt_stream_frames.restype = ctypes.c_long
_lib.lt_stream_frames.argtypes = [ctypes.c_void_p]
_lib.lt_stream_read.restype = ctypes.c_long
_lib.lt_stream_read.argtypes = [
    ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
]
_lib.lt_stream_seek.restype = ctypes.c_int
_lib.lt_stream_seek.argtypes = [ctypes.c_void_p, ctypes.c_long]
_lib.lt_stream_close.restype = None
_lib.lt_stream_close.argtypes = [ctypes.c_void_p]
_lib.lt_beat_dp.restype = None
_lib.lt_beat_dp.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.c_long,
    ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
]


def beat_dp(localscore: np.ndarray, fpb: np.ndarray,
            tightness: float) -> Tuple[np.ndarray, np.ndarray]:
    """Native beat-tracking DP (see ``hostdp.cpp``).

    Bit-identical recurrence to ``beat._beat_dp_host`` — the reference's
    numba-jitted ``__beat_track_dp`` (beat.py:619) — at C speed: the
    Python loop costs ~25 µs/frame of interpreter overhead, this ~40 ns.
    Inputs must be float64 and C-contiguous; returns (backlink int64,
    cumscore float64).
    """
    localscore = np.ascontiguousarray(localscore, dtype=np.float64)
    fpb = np.ascontiguousarray(fpb, dtype=np.float64)
    T = localscore.shape[0]
    if fpb.shape[0] not in (1, T):
        # Time-varying mode indexes fpb[i] for every frame; anything
        # between scalar and per-frame would read out of bounds natively.
        raise ValueError(
            f"frames_per_beat must have length 1 or {T} (= len(localscore)); "
            f"got {fpb.shape[0]}"
        )
    backlink = np.empty(T, dtype=np.int64)
    cumscore = np.empty(T, dtype=np.float64)
    _lib.lt_beat_dp(
        localscore.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_long(T),
        fpb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(1 if fpb.shape[0] > 1 else 0),
        ctypes.c_double(float(tightness)),
        backlink.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cumscore.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return backlink, cumscore


class audioio:
    """ctypes namespace over the native C++ audio decoder.

    Thin static-method wrappers (``decode``, ``info``) over
    ``libaudioio.so`` (``_native/audioio.cpp``): a from-scratch WAV
    parser and FLAC decoder plus ogg/vorbis via a dlopen'd system
    libvorbisfile.  Falls back to None at import when the shared
    library hasn't been built — callers then use stdlib/wave paths.
    """

    @staticmethod
    def decode(path: str) -> Tuple[np.ndarray, int]:
        """Decode an audio file → ((n_frames, n_channels) float32, sr).

        One-shot decode of the whole file via ``lt_decode`` — which is
        itself implemented on the streaming core (open, read to EOF,
        close), so every decode exercises the same code path as
        :class:`NativeStream`.  Raises RuntimeError with the C++ error
        string on unrecognized or malformed containers.
        """
        data = ctypes.POINTER(ctypes.c_float)()
        frames = ctypes.c_long(0)
        channels = ctypes.c_int(0)
        sr = ctypes.c_int(0)
        rc = _lib.lt_decode(
            path.encode(), ctypes.byref(data), ctypes.byref(frames),
            ctypes.byref(channels), ctypes.byref(sr),
        )
        if rc != 0:
            err = _lib.lt_last_error().decode()
            raise RuntimeError(f"audio decode failed ({rc}): {err}")
        try:
            n = frames.value * channels.value
            arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
        finally:
            _lib.lt_free(data)
        return arr.reshape(frames.value, channels.value), sr.value

    @staticmethod
    def info(path: str) -> Tuple[int, int, int]:
        """Return (sr, n_channels, n_frames) from the container headers.

        Header-only probe via ``lt_info``: WAV/FLAC read their header
        chunks, ogg/mp3 query their libraries' metadata.  Only when a
        container does not declare its length does this fall back to a
        counting decode.  Raises RuntimeError on unreadable files.
        """
        sr = ctypes.c_int(0)
        channels = ctypes.c_int(0)
        frames = ctypes.c_long(0)
        rc = _lib.lt_info(
            path.encode(), ctypes.byref(sr), ctypes.byref(channels),
            ctypes.byref(frames),
        )
        if rc != 0:
            err = _lib.lt_last_error().decode()
            raise RuntimeError(f"audio info failed ({rc}): {err}")
        return sr.value, channels.value, frames.value

    @staticmethod
    def open(path: str) -> "NativeStream":
        """Open a streaming decode handle (O(block) memory reads).

        Returns a :class:`NativeStream` positioned at frame 0 with the
        container's ``sr``/``channels``/``frames`` already probed; use
        its ``read``/``seek``/``close`` to pull samples incrementally.
        The higher-level entry point is
        :class:`librosa_tpu.io.AudioReader`, which adds the pure-Python
        WAV fallback.
        """
        return NativeStream(path)


class NativeStream:
    """Streaming decoder handle over ``lt_open``/``lt_stream_read``.

    Reads interleaved float32 frames incrementally — the file is never
    decoded whole (WAV reads straight off the file; FLAC decodes through
    a fixed sliding window; ogg/mp3 pull through their libraries' own
    streaming APIs).  Seeking is sample-accurate: positional for WAV,
    library-native for ogg/mp3, decode-skip for FLAC.
    """

    def __init__(self, path: str):
        handle = _lib.lt_open(os.fspath(path).encode())
        if not handle:
            err = _lib.lt_last_error().decode()
            raise RuntimeError(f"audio open failed: {err}")
        self._h = handle
        self.sr = int(_lib.lt_stream_sr(handle))
        self.channels = int(_lib.lt_stream_channels(handle))
        n = int(_lib.lt_stream_frames(handle))
        self.frames = n if n >= 0 else None

    def read(self, n_frames: int) -> np.ndarray:
        """Decode the next ``n_frames`` frames from the current position.

        Fills a preallocated ``(n_frames, channels)`` float32 buffer via
        ``lt_stream_read`` and returns the filled prefix — shorter at
        end-of-stream, zero rows at EOF.  WAV converts straight off the
        file; FLAC decodes through the C++ sliding window; ogg/mp3 pull
        from their libraries.  Raises RuntimeError on bitstream errors.
        """
        if self._h is None:
            raise ValueError("stream is closed")
        out = np.empty((int(n_frames), self.channels), dtype=np.float32)
        got = _lib.lt_stream_read(
            self._h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(n_frames),
        )
        if got < 0:
            err = _lib.lt_last_error().decode()
            raise RuntimeError(f"audio stream read failed: {err}")
        return out[: int(got)]

    def seek(self, frame: int) -> None:
        """Position the stream at an absolute frame index.

        The next :meth:`read` returns samples starting at ``frame``.
        WAV seeks are positional (block-align arithmetic), ogg uses
        ``ov_pcm_seek``, mp3 uses ``mpg123_seek``; FLAC decodes forward
        from the nearest known point, so backwards seeks restart from
        the first audio frame.  Raises RuntimeError if the container
        cannot seek.
        """
        if self._h is None:
            raise ValueError("stream is closed")
        if _lib.lt_stream_seek(self._h, int(frame)) != 0:
            err = _lib.lt_last_error().decode()
            raise RuntimeError(f"audio stream seek failed: {err}")

    def close(self) -> None:
        """Free the native handle (file descriptor, window, codec state).

        Releases whatever the open acquired: the FILE* and (for FLAC)
        the sliding decode window, or the libvorbisfile / libmpg123
        decoder state.  Idempotent; also called by ``__exit__`` and the
        finalizer, so explicit closes are only required when holding
        many streams open at once.  Reads or seeks after close raise
        ``ValueError``.
        """
        if self._h is not None:
            _lib.lt_stream_close(self._h)
            self._h = None

    def __enter__(self) -> "NativeStream":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
