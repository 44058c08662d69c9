"""Arbitrary-length FFTs as two-stage Cooley-Tukey matmuls.

XLA's TPU FFT handles power-of-two sizes natively but lowers other
lengths to a dense (n, n) DFT matrix — for a 110250-sample Fourier
resample that is a 48 GB allocation.  For composite n = n1·n2 the
two-stage factorization

    X[n2·k1 + k2] = Σ_{t1} W_{n1}^{t1 k1} · W_n^{t1 k2}
                    · Σ_{t2} x[t1 + n1·t2] · W_{n2}^{t2 k2}

costs n·(n1+n2) MACs with only (n1, n1) and (n2, n2) factor matrices —
MXU-friendly and linear-memory.  Used by ``resample(..., res_type='fft')``
and anywhere else a non-pow2 transform is needed on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fft_arbitrary", "ifft_arbitrary", "good_fft_factor"]


def good_fft_factor(n: int) -> Tuple[int, int]:
    """Split ``n = n1 * n2`` as near-square as possible (``n1 <= n2``).

    The Cooley-Tukey stage sizes: a near-square factorization minimizes
    the total matmul FLOPs ``n * (n1 + n2)`` of the two dense stages.
    Prime ``n`` returns ``(1, n)`` — the caller falls back to a direct
    DFT in that case.

    Parameters
    ----------
    n : int > 0

    Returns
    -------
    (n1, n2) : tuple of int
    """
    best = (1, n)
    for d in range(int(np.sqrt(n)), 0, -1):
        if n % d == 0:
            best = (d, n // d)
            break
    return best


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@functools.lru_cache(maxsize=32)
def _ct_tables(n: int):
    n1, n2 = good_fft_factor(n)
    t2k2 = np.outer(np.arange(n2), np.arange(n2)) * (2 * np.pi / n2)
    t1k2 = np.outer(np.arange(n1), np.arange(n2)) * (2 * np.pi / n)
    t1k1 = np.outer(np.arange(n1), np.arange(n1)) * (2 * np.pi / n1)
    c = np.complex64
    return (
        n1, n2,
        np.exp(-1j * t2k2).astype(c),      # W2 [t2, k2]
        np.exp(-1j * t1k2).astype(c),      # twiddle [t1, k2]
        np.exp(-1j * t1k1).astype(c),      # W1 [t1, k1]
    )


@functools.partial(jax.jit, static_argnames=("n", "inverse"))
def _ct_fft_core(x, *, n: int, inverse: bool):
    """Complex DFT of composite length n (last axis)."""
    n1, n2, W2, TW, W1 = _ct_tables(n)
    if inverse:
        W2, TW, W1 = np.conj(W2), np.conj(TW), np.conj(W1)
    W2 = jnp.asarray(W2)
    TW = jnp.asarray(TW)
    W1 = jnp.asarray(W1)

    lead = x.shape[:-1]
    # x[t1 + n1*t2] → xr[..., t2, t1]
    xr = x.reshape(*lead, n2, n1)
    # stage A over t2: A[..., k2, t1]
    A = jnp.einsum("...ji,jk->...ki", xr, W2)
    # twiddle over (t1, k2) — A is [k2, t1], so transpose TW
    A = A * TW.T[..., :, :]
    # stage B over t1: X[..., k2, k1]
    X = jnp.einsum("...ki,il->...kl", A, W1)
    # linear bin index: k = n2*k1 + k2 → transpose [k1, k2] then flatten
    X = jnp.swapaxes(X, -2, -1).reshape(*lead, n)
    if inverse:
        X = X / n
    return X


def fft_arbitrary(x: jax.Array, n: int) -> jax.Array:
    """Complex FFT over the last axis, composite-length safe on TPU.

    Power-of-two lengths defer to the XLA FFT; other lengths factor as
    ``n = n1 * n2`` and run a two-stage Cooley-Tukey decomposition whose
    stages are dense matmuls — XLA would otherwise lower a non-pow2 FFT
    to a single O(n²) DFT matrix (48 GB for seconds of audio).

    Parameters
    ----------
    x : jax.Array [shape=(..., n)]
        complex (or real, promoted) input
    n : int
        transform length; must equal ``x.shape[-1]``

    Returns
    -------
    X : jax.Array [shape=(..., n), complex]
    """
    x = jnp.asarray(x)
    if x.shape[-1] != n:
        raise ValueError("length mismatch")
    if _is_pow2(n):
        return jnp.fft.fft(x, axis=-1)
    x = x.astype(
        jnp.complex64 if x.dtype != jnp.complex128 else jnp.complex128
    )
    return _ct_fft_core(x, n=n, inverse=False)


def ifft_arbitrary(x: jax.Array, n: int) -> jax.Array:
    """Inverse complex FFT over the last axis (composite-length safe).

    The inverse twin of :func:`fft_arbitrary`: power-of-two lengths use
    the XLA IFFT; other lengths run the two-stage Cooley-Tukey matmul
    decomposition with conjugated twiddles and the 1/n scale.

    Parameters
    ----------
    x : jax.Array [shape=(..., n), complex]
    n : int
        transform length; must equal ``x.shape[-1]``

    Returns
    -------
    y : jax.Array [shape=(..., n), complex]
    """
    x = jnp.asarray(x)
    if x.shape[-1] != n:
        raise ValueError("length mismatch")
    if _is_pow2(n):
        return jnp.fft.ifft(x, axis=-1)
    x = x.astype(
        jnp.complex64 if x.dtype != jnp.complex128 else jnp.complex128
    )
    return _ct_fft_core(x, n=n, inverse=True)
