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

__all__ = ["read_audio", "get_samplerate", "get_info"]


def _read_wav_python(path: str) -> Tuple[np.ndarray, int]:
    """Stdlib WAV fallback: returns (samples (n, ch) float32 in [-1,1], sr)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        vals = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        data = vals.astype(np.float32) / float(1 << 23)
    else:
        raise ParameterError(f"Unsupported WAV sample width: {width}")
    return data.reshape(-1, n_ch), sr


def _native():
    try:
        from .._native import audioio

        return audioio
    except Exception:
        return None


def get_info(path: str) -> Tuple[int, int, int]:
    """Read an audio file's header: ``(sr, n_channels, n_frames)``.

    Uses the native C++ probe when available (wav/flac/ogg), falling
    back to the stdlib ``wave`` parser — no sample data is decoded.

    Parameters
    ----------
    path : str or Path
        audio file

    Returns
    -------
    sr, n_channels, n_frames : int
    """
    nat = _native()
    if nat is not None:
        return nat.info(os.fspath(path))
    with wave.open(os.fspath(path), "rb") as w:
        return w.getframerate(), w.getnchannels(), w.getnframes()


def get_samplerate(path: str) -> int:
    """Native sample rate of an audio file, without decoding it.

    Parameters
    ----------
    path : str or Path
        audio file

    Returns
    -------
    sr : int
        sampling rate declared in the file header

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
    """
    path = os.fspath(path)
    nat = _native()
    if nat is not None:
        data, sr = nat.decode(path)  # (n, ch) float32
    else:
        ext = os.path.splitext(path)[1].lower()
        if ext in (".wav", ".wave"):
            data, sr = _read_wav_python(path)
        else:
            raise ParameterError(
                f"Cannot decode {path!r}: native audio module unavailable and "
                "pure-Python fallback only supports WAV"
            )

    if offset:
        start = int(np.round(sr * offset))
    else:
        start = 0
    if duration is not None:
        stop = start + int(np.round(sr * duration))
    else:
        stop = data.shape[0]
    data = data[start:stop]

    y = data.astype(dtype, copy=False).T  # (ch, n)
    if y.shape[0] == 1:
        y = y[0]
    return np.ascontiguousarray(y), int(sr)
