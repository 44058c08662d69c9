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
_SRC = os.path.join(_DIR, "audioio.cpp")
_SO = os.path.join(_DIR, "_audioio.so")


def _build() -> None:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-ldl",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _ensure_built() -> None:
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
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
        """Decode an audio file → ((n_frames, n_channels) float32, sr)."""
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
        """Return (sr, n_channels, n_frames)."""
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
