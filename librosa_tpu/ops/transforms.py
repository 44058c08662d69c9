"""Dense transform matrices applied on the MXU.

On TPU, small fixed transforms (DCT for MFCC, DFT stages) are most efficient
as matmuls against host-precomputed constant matrices — the MXU executes them
at full throughput and XLA fuses the surrounding elementwise work.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["dct_matrix", "dft_matrices"]


@functools.lru_cache(maxsize=64)
def dct_matrix(n: int, *, dct_type: int = 2, norm: str | None = "ortho") -> np.ndarray:
    """DCT matrix ``C`` such that ``C @ x == scipy.fft.dct(x, type, norm)``.

    The MFCC projection runs as this matrix applied on the MXU rather
    than a host DCT call.  Covers types 2 and 3 (the ones the reference
    uses, ``feature/spectral.py:2005``); built in float64 for accurate
    trigonometry, returned float32 for the device matmul.

    Parameters
    ----------
    n : int > 0
        transform size
    dct_type : int in {2, 3}
    norm : 'ortho' or None

    Returns
    -------
    C : np.ndarray [shape=(n, n), float32]
    """
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    if norm not in (None, "ortho"):
        raise ValueError(f"Unsupported DCT norm: {norm}")
    if dct_type == 2:
        C = 2.0 * np.cos(np.pi * k * (2 * m + 1) / (2 * n))
        if norm == "ortho":
            C *= np.sqrt(1.0 / (2 * n))
            C[0] *= np.sqrt(0.5)
    elif dct_type == 3:
        if norm == "ortho":
            C = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k + 1) * m / (2 * n))
            C[:, 0] = np.sqrt(1.0 / n)
        else:
            C = 2.0 * np.cos(np.pi * (2 * k + 1) * m / (2 * n))
            C[:, 0] = 1.0
    elif dct_type == 1:
        if n < 2:
            raise ValueError("DCT-I requires n >= 2")
        C = 2.0 * np.cos(np.pi * k * m / (n - 1))
        C[:, 0] = 1.0
        C[:, -1] = (-1.0) ** k[:, 0]
        if norm == "ortho":
            s = np.ones(n)
            s[0] = s[-1] = np.sqrt(0.5)
            C = C * s[None, :] * s[:, None] * np.sqrt(0.5 / (n - 1))
    else:
        raise ValueError(f"Unsupported DCT type: {dct_type}")
    return C.astype(np.float32)


@functools.lru_cache(maxsize=16)
def dft_matrices(n_fft: int, *, dtype: str = "float32"):
    """Real/imag DFT analysis matrices for the rfft bins.

    Returns ``(C, S)`` — host numpy arrays of shape
    ``(1 + n_fft//2, n_fft)`` — such that ``rfft(x) = C @ x − 1j·(S @ x)``.
    This is the dense-matmul formulation of the framed DFT: on TPU a
    (bins × n_fft) × (n_fft × frames) matrix product runs on the MXU and
    fuses with windowing, |·|², and filterbank projection into one
    program, which beats the XLA FFT for every framed-analysis pipeline
    in this package (ops/fft.py chooses per backend).  Cached per
    ``n_fft`` as NUMPY so the cache can never capture a tracer; callers
    upload or close over the constants as fits their jit.

    Parameters
    ----------
    n_fft : int — transform length
    dtype : str — element dtype of the returned matrices
    """
    n_bins = 1 + n_fft // 2
    k = np.arange(n_bins)[:, None]
    t = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * t / n_fft
    C = np.cos(ang).astype(dtype)
    S = np.sin(ang).astype(dtype)
    return C, S
