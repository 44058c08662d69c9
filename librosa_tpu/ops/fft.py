"""STFT compute backends.

Two device paths for the framed transform:

- **fft**: ``jnp.fft.rfft`` — exact, but XLA's TPU FFT is scalar-unit bound
  (~GFLOP/s).  Right choice on CPU (pocketfft) and when complex output of
  very long transforms is needed.
- **matmul**: the real DFT as two MXU matmuls against host-precomputed
  cos/sin matrices — ~100× faster on TPU for n_fft ≤ 4096.  The power
  spectrum needs no complex arithmetic at all:
  ``|X|² = (F·Cᵀ)² + (F·Sᵀ)²``.

Backend selection is automatic: matmul on TPU, fft elsewhere; override via
``set_stft_backend``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .transforms import dft_matrices

__all__ = [
    "set_stft_backend",
    "get_stft_backend",
    "dft_mats_device",
    "frames_power_spectrum",
    "frames_rdft",
]

_BACKEND = "auto"  # 'auto' | 'fft' | 'matmul'
# MXU precision for the DFT matmuls.  HIGHEST ≈ float32-exact (bf16x6
# decomposition); 'high' (bf16x3) is ~2x faster at ≈f32 accuracy.
_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_stft_backend(backend: str, *, precision=None) -> None:
    """Select the framed-DFT backend for the STFT engine.

    Parameters
    ----------
    backend : str
        - ``'auto'`` (default) — matmul (MXU) on TPU, XLA FFT elsewhere
        - ``'matmul'`` — force DFT-as-matmul (cos/-sin products)
        - ``'fft'`` — force the XLA FFT lowering
    precision : jax.lax.Precision or None
        matmul precision for the DFT products (default HIGHEST)

    See Also
    --------
    get_stft_backend
    """
    global _BACKEND, _MATMUL_PRECISION
    if backend not in ("auto", "fft", "matmul"):
        raise ValueError(f"Unknown stft backend: {backend}")
    _BACKEND = backend
    if precision is not None:
        _MATMUL_PRECISION = precision


def get_stft_backend() -> str:
    """Return the configured framed-DFT backend name.

    One of ``'auto'``, ``'fft'``, or ``'matmul'`` — the *requested*
    setting as last passed to :func:`set_stft_backend` (or the
    ``LIBROSA_TPU_STFT_BACKEND`` default).  ``'auto'`` is resolved
    per call against the device the computation actually places on:
    ``'matmul'`` (DFT as an MXU matrix product) on TPU, ``'fft'``
    (native XLA FFT) on CPU — including under a ``jax.default_device``
    override inside a TPU process.

    Returns
    -------
    backend : str — the requested backend name, unresolved

    Examples
    --------
    >>> from librosa_tpu.ops.fft import get_stft_backend
    >>> get_stft_backend() in ('auto', 'fft', 'matmul')
    True
    """
    return _BACKEND


def _resolved_backend() -> str:
    if _BACKEND != "auto":
        return _BACKEND
    # honor an active jax.default_device(...) override (e.g. CPU-baseline
    # runs inside a TPU process) — computations place there, so backend
    # selection must follow it, not the process-level default platform
    platform = None
    try:
        dev = jax.config.jax_default_device
        if dev is not None:
            platform = dev.platform
    except Exception:
        pass
    if platform is None:
        platform = jax.default_backend()
    return "matmul" if platform in ("tpu", "axon") else "fft"


_DEV_MATS: dict = {}


def dft_mats_device(n_fft: int, dtype) -> tuple:
    """Device-resident (Cᵀ, Sᵀ) DFT matrices, cached per (n_fft, dtype).

    Passed as jit *arguments* (not traced constants) so large matrices are
    uploaded once and shared across every compiled program — embedding a
    2048-point matrix pair as constants would re-ship ~16 MB through the
    remote compiler per program.  The cache is tracer-guarded: values
    created under a trace are never stored (see the axon notes in
    CLAUDE.md).

    Parameters
    ----------
    n_fft : int
        transform size
    dtype : dtype
        real dtype of the matrices

    Returns
    -------
    (Ct, St) : tuple of jax.Array [shape=(n_fft, 1 + n_fft//2)]
        cosine and sine analysis matrices, transposed for rhs matmul
    """
    key = (n_fft, jnp.dtype(dtype).name)
    if key in _DEV_MATS:
        return _DEV_MATS[key]
    C, S = dft_matrices(n_fft)
    mats = (jnp.asarray(C.T, dtype=dtype), jnp.asarray(S.T, dtype=dtype))
    # Under an outer jit these are traced constants — do NOT cache them
    # (they would leak tracers); they embed into that program instead.
    if not isinstance(mats[0], jax.core.Tracer):
        _DEV_MATS[key] = mats
    return mats


def frames_power_spectrum(
    frames: jax.Array, *, n_fft: int, dft_mats=None
) -> jax.Array:
    """|rfft(frames)|² over the last axis → (..., T, 1 + n_fft//2).

    ``frames`` are already windowed.  On TPU this is two MXU matmuls and a
    fused square-add; no complex intermediates touch HBM.  ``dft_mats``
    should be traced arguments from :func:`dft_mats_device` when calling
    under jit; if None they become compile-time constants.
    """
    if dft_mats is not None or _resolved_backend() == "matmul":
        if dft_mats is None:
            dft_mats = dft_mats_device(n_fft, frames.dtype)
        Ct, St = dft_mats
        re = jnp.matmul(frames, Ct, precision=_MATMUL_PRECISION)
        im = jnp.matmul(frames, St, precision=_MATMUL_PRECISION)
        return re * re + im * im
    spec = jnp.fft.rfft(frames, axis=-1)
    return spec.real**2 + spec.imag**2


def frames_rdft(frames: jax.Array, *, n_fft: int, dft_mats=None) -> jax.Array:
    """Real-input DFT over the last axis → complex ``(..., T, 1+n_fft//2)``.

    On the matmul backend the transform is two MXU products against the
    cached cos/-sin matrices combined with ``lax.complex`` (no complex
    intermediates until the very end); otherwise it defers to the XLA
    FFT.  ``dft_mats`` may be passed explicitly so outer jits receive the
    matrices as arguments instead of embedded constants.
    """
    if dft_mats is not None or _resolved_backend() == "matmul":
        if dft_mats is None:
            dft_mats = dft_mats_device(n_fft, frames.dtype)
        Ct, St = dft_mats
        re = jnp.matmul(frames, Ct, precision=_MATMUL_PRECISION)
        im = jnp.matmul(frames, St, precision=_MATMUL_PRECISION)
        return jax.lax.complex(re, -im)
    return jnp.fft.rfft(frames, axis=-1)
