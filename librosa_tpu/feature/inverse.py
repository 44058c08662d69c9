"""Feature inversion: mel / MFCC → STFT / audio (L4).

NNLS runs as a jit-compiled FISTA (``util._nnls``); Griffin-Lim phase
recovery on device.  Parity citations refer to ``librosa/feature/inverse.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import filters
from ..core.spectrum import db_to_power, griffinlim
from ..ops.transforms import dct_matrix
from ..util import utils as util
from ..util._nnls import nnls
from ..util.exceptions import ParameterError

__all__ = ["mel_to_stft", "mel_to_audio", "mfcc_to_mel", "mfcc_to_audio"]


def mel_to_stft(
    M: Any,
    *,
    sr: float = 22050,
    n_fft: int = 2048,
    power: float = 2.0,
    **kwargs: Any,
) -> jax.Array:
    """Approximate STFT magnitudes from a mel spectrogram.

    Non-negative least squares against the mel filterbank (behavior parity
    with the reference ``feature/inverse.py:28``; the NNLS is a batched
    projected-gradient solve).

    Parameters
    ----------
    M : mel spectrogram [shape=(..., n_mels, t)]
    sr, n_fft, power
        mel construction parameters (must match the forward transform)
    **kwargs : forwarded to ``filters.mel``

    Returns
    -------
    S : jax.Array [shape=(..., 1 + n_fft//2, t)]
    """
    M = jnp.asarray(M)
    mel_basis = filters.mel(
        sr=sr, n_fft=n_fft, dtype=np.float32, **kwargs
    )
    return _mel_to_stft_core(np.asarray(mel_basis), M, power=float(power))


@functools.partial(jax.jit, static_argnames=("power",))
def _mel_to_stft_core(mel_basis, M, *, power):
    """NNLS solve + power unfolding as one program.

    Keeps ``mel_to_audio`` at two launches (this + the Griffin-Lim scan)
    and ``mfcc_to_audio`` at three — eagerly the ``x ** (1/p)`` unfolding
    was its own dispatch.
    """
    inverse = nnls(mel_basis, M)
    return jnp.power(inverse, 1.0 / power).astype(M.dtype)


def mel_to_audio(
    M: Any,
    *,
    sr: float = 22050,
    n_fft: int = 2048,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Any = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    power: float = 2.0,
    n_iter: int = 32,
    length: Optional[int] = None,
    dtype: Any = np.float32,
    **kwargs: Any,
) -> jax.Array:
    """Invert a mel spectrogram to audio (NNLS + Griffin-Lim).

    Parity: feature/inverse.py:117.

    Parameters
    ----------
    M : mel spectrogram
    sr, n_fft, hop_length, win_length, window, center, pad_mode, power,
    n_iter, length, dtype
        inversion controls
    **kwargs : forwarded to ``filters.mel``

    Returns
    -------
    y : jax.Array
    """
    # invert the mel projection to |STFT|, then phase-retrieve
    resynthesis = dict(
        n_iter=n_iter, hop_length=hop_length, win_length=win_length,
        n_fft=n_fft, window=window, center=center, dtype=dtype,
        length=length, pad_mode=pad_mode,
    )
    magnitude = mel_to_stft(M, sr=sr, n_fft=n_fft, power=power, **kwargs)
    return griffinlim(magnitude, **resynthesis)


def mfcc_to_mel(
    mfcc: Any,
    *,
    n_mels: int = 128,
    dct_type: int = 2,
    norm: Optional[str] = "ortho",
    ref: float = 1.0,
    lifter: float = 0,
) -> jax.Array:
    """Invert MFCCs to a (dB-scaled) mel power spectrogram.

    Inverse DCT then ``db_to_power`` (behavior parity with the reference
    ``feature/inverse.py:214``).  NOTE: lossy unless n_mfcc == n_mels.

    Parameters
    ----------
    mfcc : [shape=(..., n_mfcc, t)]
    n_mels : int > 0
    dct_type, norm, ref, lifter
        must match the forward transform

    Returns
    -------
    M : jax.Array [shape=(..., n_mels, t)]
    """
    mfcc = jnp.asarray(mfcc)
    if lifter < 0:
        raise ParameterError(f"MFCC to mel lifter={lifter} must be a positive number")

    # C2 is (n_mels, n_mels) DCT-II (ortho); its transpose inverts (ortho)
    C = dct_matrix(n_mels, dct_type=dct_type, norm=norm)[: mfcc.shape[-2]]
    return _mfcc_to_mel_core(
        mfcc, jnp.asarray(np.asarray(C, dtype=np.dtype(mfcc.dtype))),
        ref=float(ref), lifter=float(lifter),
    )


@functools.partial(jax.jit, static_argnames=("ref", "lifter"))
def _mfcc_to_mel_core(mfcc, C, *, ref, lifter):
    """De-lifter → inverse DCT → dB-to-power as one program."""
    if lifter > 0:
        n_mfcc = mfcc.shape[-2]
        idx = jnp.arange(1, 1 + n_mfcc, dtype=mfcc.dtype)
        idx = util.expand_to(idx, ndim=mfcc.ndim, axes=-2)
        lifter_sine = 1 + lifter * 0.5 * jnp.sin(jnp.pi * idx / lifter)
        mfcc = mfcc / (lifter_sine + util.tiny(mfcc) * 2)

    # least-norm inverse: logmel ≈ C.T @ mfcc (orthonormal rows)
    logmel = jnp.einsum(
        "km,...kt->...mt", C, mfcc, precision=jax.lax.Precision.HIGHEST,
    )
    return db_to_power(logmel, ref=ref)


def mfcc_to_audio(
    mfcc: Any,
    *,
    n_mels: int = 128,
    dct_type: int = 2,
    norm: Optional[str] = "ortho",
    ref: float = 1.0,
    lifter: float = 0,
    **kwargs: Any,
) -> jax.Array:
    """Invert MFCCs all the way back to a time-domain signal.

    Chains the inverse DCT (``mfcc_to_mel``), mel-to-linear NNLS
    inversion, and Griffin-Lim phase recovery (``mel_to_audio``).
    Lossy: only as much structure as ``n_mfcc`` coefficients carry can
    be recovered.

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> t = np.arange(11025) / 22050
    >>> y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    >>> m = np.asarray(lt.feature.mfcc(y=y, sr=22050))
    >>> out = np.asarray(lt.feature.inverse.mfcc_to_audio(
    ...     m, sr=22050, n_iter=2, length=len(y)))
    >>> out.shape == y.shape
    True

    Parity: reference feature/inverse.py:290.

    Parameters
    ----------
    mfcc : input coefficients
    n_mels, dct_type, norm, ref, lifter
        inversion controls
    **kwargs : forwarded to ``mel_to_audio``

    Returns
    -------
    y : jax.Array
    """
    # undo the cepstral stage, then reuse the mel inverter end-to-end
    spectrogram = mfcc_to_mel(
        mfcc, n_mels=n_mels, dct_type=dct_type, norm=norm, ref=ref,
        lifter=lifter,
    )
    return mel_to_audio(spectrogram, **kwargs)
