"""Host-side binding to the system ``libsoxr`` for soxr_* resampling parity.

The reference uses the ``soxr`` Python package (C library) as its default
resampler (``librosa/core/audio.py:67,1007``).  That package is not available
here, but the shared library is — we bind ``soxr_oneshot`` directly via
ctypes (API declared from the public soxr.h interface).  This is a *host*
path used only for res_type='soxr_*' compatibility; the TPU-native resampler
is the polyphase FIR conv in ``core.audio.resample``.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional

import numpy as np

__all__ = ["available", "resample"]

# soxr quality recipe constants (public API values)
_RECIPES = {
    "soxr_qq": 0,   # SOXR_QQ  — quick cubic
    "soxr_lq": 1,   # SOXR_LQ
    "soxr_mq": 2,   # SOXR_MQ
    "soxr_hq": 4,   # SOXR_HQ  == SOXR_20_BITQ
    "soxr_vhq": 6,  # SOXR_VHQ == SOXR_28_BITQ
}

_SOXR_FLOAT32_I = 0


class _QualitySpec(ctypes.Structure):
    _fields_ = [
        ("precision", ctypes.c_double),
        ("phase_response", ctypes.c_double),
        ("passband_end", ctypes.c_double),
        ("stopband_begin", ctypes.c_double),
        ("e", ctypes.c_void_p),
        ("flags", ctypes.c_ulong),
    ]


class _IOSpec(ctypes.Structure):
    _fields_ = [
        ("itype", ctypes.c_int),
        ("otype", ctypes.c_int),
        ("scale", ctypes.c_double),
        ("e", ctypes.c_void_p),
        ("flags", ctypes.c_ulong),
    ]


_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    for name in ("libsoxr.so.0", "libsoxr.so", ctypes.util.find_library("soxr")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.soxr_quality_spec.restype = _QualitySpec
            lib.soxr_quality_spec.argtypes = [ctypes.c_ulong, ctypes.c_ulong]
            lib.soxr_io_spec.restype = _IOSpec
            lib.soxr_io_spec.argtypes = [ctypes.c_int, ctypes.c_int]
            lib.soxr_oneshot.restype = ctypes.c_char_p
            lib.soxr_oneshot.argtypes = [
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_uint,
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(_IOSpec),
                ctypes.POINTER(_QualitySpec),
                ctypes.c_void_p,
            ]
            # streaming API (soxr_create / soxr_process / soxr_delete)
            lib.soxr_create.restype = ctypes.c_void_p
            lib.soxr_create.argtypes = [
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_uint,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(_IOSpec),
                ctypes.POINTER(_QualitySpec),
                ctypes.c_void_p,
            ]
            lib.soxr_process.restype = ctypes.c_char_p
            lib.soxr_process.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
            ]
            lib.soxr_delete.restype = None
            lib.soxr_delete.argtypes = [ctypes.c_void_p]
            _lib = lib
            return _lib
        except OSError:
            continue
    _load_failed = True
    return None


def available() -> bool:
    """Whether the system libsoxr shared library could be loaded.

    Probes (and caches) the dlopen of ``libsoxr.so`` on first call.
    When False, ``soxr_*`` res_types in :func:`librosa_tpu.resample`
    substitute the device polyphase resampler with a warning (integer
    rate pairs only), and streaming rate conversion in
    ``librosa_tpu.stream`` is unavailable.  The probe never raises — a
    missing library is an expected configuration, not an error.

    Returns
    -------
    ok : bool — True iff the soxr one-shot and streaming APIs are bound
    """
    return _get_lib() is not None


def resample(
    x: np.ndarray, in_rate: float, out_rate: float, quality: str = "soxr_hq"
) -> np.ndarray:
    """Resample a 1-D float32 array with libsoxr (one-shot API).

    Host-side binding of the reference's default resampler so the
    ``soxr_hq/vhq/mq/lq/qq`` modes match bit-for-bit.

    Parameters
    ----------
    x : np.ndarray [1-D]
        input samples
    in_rate, out_rate : float > 0
        source and target rates
    quality : str
        one of the ``soxr_*`` recipe names

    Returns
    -------
    y : np.ndarray [1-D, float32]
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("libsoxr is not available on this system")
    if quality not in _RECIPES:
        raise ValueError(f"Unknown soxr quality: {quality}")

    x32 = np.ascontiguousarray(x, dtype=np.float32)
    n_in = x32.shape[0]
    n_out = int(np.ceil(n_in * out_rate / in_rate)) + 1
    out = np.zeros(n_out, dtype=np.float32)

    idone = ctypes.c_size_t(0)
    odone = ctypes.c_size_t(0)
    qspec = lib.soxr_quality_spec(_RECIPES[quality], 0)
    iospec = lib.soxr_io_spec(_SOXR_FLOAT32_I, _SOXR_FLOAT32_I)

    err = lib.soxr_oneshot(
        float(in_rate),
        float(out_rate),
        1,
        x32.ctypes.data_as(ctypes.c_void_p),
        n_in,
        ctypes.byref(idone),
        out.ctypes.data_as(ctypes.c_void_p),
        n_out,
        ctypes.byref(odone),
        ctypes.byref(iospec),
        ctypes.byref(qspec),
        None,
    )
    if err:
        raise RuntimeError(f"soxr error: {err.decode()}")
    return out[: odone.value]


class StreamResampler:
    """Incremental libsoxr resampler holding filter state across chunks.

    The streaming twin of :func:`resample` (reference stream() uses
    ``soxr.ResampleStream`` the same way, ``librosa/core/audio.py:425``):
    feed the signal block by block and the band-limited filter history
    carries over, so the concatenated output matches a one-shot resample
    of the whole signal — the piece that makes O(block)-memory streaming
    with sample-rate conversion possible.

    Parameters
    ----------
    in_rate, out_rate : float > 0
        source and target sampling rates
    channels : int > 0
        interleaved channel count of the chunks
    quality : str
        one of the ``soxr_*`` recipe names

    Examples
    --------
    >>> from librosa_tpu.io import _soxr
    >>> import numpy as np
    >>> if _soxr.available():
    ...     rs = _soxr.StreamResampler(4, 1, channels=1)
    ...     x = np.random.RandomState(0).randn(4000).astype(np.float32)
    ...     parts = [rs.process(x[:2000]), rs.process(x[2000:]),
    ...              rs.process(np.empty(0, np.float32), last=True)]
    ...     y = np.concatenate(parts)
    ...     ref = _soxr.resample(x, 4, 1)
    ...     assert abs(len(y) - len(ref)) <= 2
    """

    def __init__(
        self,
        in_rate: float,
        out_rate: float,
        *,
        channels: int = 1,
        quality: str = "soxr_hq",
    ):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("libsoxr is not available on this system")
        if quality not in _RECIPES:
            raise ValueError(f"Unknown soxr quality: {quality}")
        self._lib = lib
        self._channels = int(channels)
        self._ratio = float(out_rate) / float(in_rate)
        err = ctypes.c_char_p(None)
        qspec = lib.soxr_quality_spec(_RECIPES[quality], 0)
        iospec = lib.soxr_io_spec(_SOXR_FLOAT32_I, _SOXR_FLOAT32_I)
        self._h = lib.soxr_create(
            float(in_rate), float(out_rate), self._channels,
            ctypes.byref(err), ctypes.byref(iospec), ctypes.byref(qspec), None,
        )
        if not self._h:
            raise RuntimeError(
                f"soxr_create failed: {(err.value or b'?').decode()}"
            )

    def process(self, block: np.ndarray, last: bool = False) -> np.ndarray:
        """Resample one chunk; ``last=True`` flushes the filter tail.

        Output length varies per call — soxr buffers enough input to
        keep its sinc filter centered, so early chunks return slightly
        fewer samples and the flush returns the held-back tail.  The
        concatenation over all calls equals a one-shot
        :func:`resample` of the concatenated input (pinned by
        ``test_stream.py::test_soxr_stream_matches_oneshot``).

        Parameters
        ----------
        block : np.ndarray [shape=(n,) or (n, channels)]
            next chunk of input samples (may be empty, e.g. for a flush)
        last : bool
            signal end-of-stream and drain the filter state

        Returns
        -------
        out : np.ndarray — resampled samples, same layout as the input
        """
        if self._h is None:
            raise ValueError("resampler is closed")
        block = np.ascontiguousarray(block, dtype=np.float32)
        squeeze = block.ndim == 1
        if squeeze:
            block = block[:, None]
        n_in = block.shape[0]
        if n_in == 0 and not last:
            # soxr interprets a NULL input pointer as end-of-stream; an
            # empty mid-stream chunk must be a no-op, not a filter flush
            return block[:, 0] if squeeze else block

        pieces = []
        fed = 0
        while True:
            cap = int(np.ceil((n_in - fed) * self._ratio)) + 256
            out = np.empty((cap, self._channels), dtype=np.float32)
            idone = ctypes.c_size_t(0)
            odone = ctypes.c_size_t(0)
            in_ptr = (
                block[fed:].ctypes.data_as(ctypes.c_void_p)
                if fed < n_in
                else None
            )
            e = self._lib.soxr_process(
                self._h,
                in_ptr,
                n_in - fed,
                ctypes.byref(idone),
                out.ctypes.data_as(ctypes.c_void_p),
                cap,
                ctypes.byref(odone),
            )
            if e:
                raise RuntimeError(f"soxr error: {e.decode()}")
            fed += idone.value
            if odone.value:
                pieces.append(out[: odone.value])
            if fed >= n_in and (odone.value == 0 or not last):
                if not last or odone.value == 0:
                    break

        if last:
            # flush: NULL input signals end-of-stream; drain until dry
            while True:
                cap = 8192
                out = np.empty((cap, self._channels), dtype=np.float32)
                idone = ctypes.c_size_t(0)
                odone = ctypes.c_size_t(0)
                e = self._lib.soxr_process(
                    self._h, None, 0, ctypes.byref(idone),
                    out.ctypes.data_as(ctypes.c_void_p), cap,
                    ctypes.byref(odone),
                )
                if e:
                    raise RuntimeError(f"soxr error: {e.decode()}")
                if odone.value == 0:
                    break
                pieces.append(out[: odone.value])

        if pieces:
            res = np.concatenate(pieces, axis=0)
        else:
            res = np.empty((0, self._channels), dtype=np.float32)
        return res[:, 0] if squeeze else res

    def close(self) -> None:
        """Release the native resampler state.

        Calls ``soxr_delete`` on the underlying handle — freeing the
        band-limited filter history soxr keeps between chunks — and
        marks the object closed (further :meth:`process` calls raise).
        Idempotent and invoked by the finalizer, so explicit calls are
        only needed when many resamplers are created in a tight loop.
        """
        if self._h is not None:
            self._lib.soxr_delete(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
