"""Spectrogram decompositions (L5): HPSS, NMF, nearest-neighbor filtering.

HPSS median filters run on device (``ops.median``) followed by
``util.softmask`` Wiener masks — one fused XLA program.  NMF delegates to
sklearn by default (host; reference parity, ``librosa/decompose.py:186``)
with a TPU multiplicative-update path available via ``transformer="mu"``.

Parity citations refer to ``librosa/decompose.py``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse

from . import core
from .ops.median import median_filter_1d
from .util import utils as util
from .util.exceptions import ParameterError

__all__ = ["decompose", "hpss", "nn_filter"]


def decompose(
    S: Any,
    *,
    n_components: Optional[int] = None,
    transformer: Optional[Any] = None,
    sort: bool = False,
    fit: bool = True,
    **kwargs: Any,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decompose a spectrogram into components × activations.

    Non-negative matrix factorization (sklearn ``NMF``) or any object with a
    ``fit_transform``/``components_`` interface; optional component sorting
    by peak frequency.  Parity: decompose.py:32.

    Parameters
    ----------
    S : np.ndarray [shape=(..., n_features, n_samples)]
        input spectrogram (non-negative for NMF)
    n_components : int or None
        number of components
    transformer : sklearn-like or None
        decomposition object (default NMF)
    sort : bool
        sort components by ascending peak frequency
    fit : bool
        fit the transformer (False = use a pre-fit one)
    **kwargs : forwarded to the transformer constructor

    Returns
    -------
    components : np.ndarray [shape=(n_features, n_components)]
    activations : np.ndarray [shape=(n_components, n_samples)]
    """
    S = np.asarray(S)
    lead_shape = list(S.shape[:-1])
    if sort and S.ndim > 2:
        raise ParameterError(
            "sorted components are only defined for 2-D inputs; "
            "got a stack with more than two dimensions"
        )

    # flatten to (time, features) for the factorizer
    flat = S.T.reshape((S.shape[-1], -1), order="F")
    if n_components is None:
        n_components = flat.shape[-1]

    def _unflatten(comp: np.ndarray) -> np.ndarray:
        # (k, features) back to the caller's leading layout
        return comp.reshape([*lead_shape, -1][::-1], order="F").T

    if transformer == "mu":
        # device multiplicative-update NMF
        W, H = _nmf_mu(jnp.asarray(flat.T), n_components, **kwargs)
        components = np.asarray(W)
        activations = np.asarray(H)
        if S.ndim > 2:
            components = _unflatten(components)
    else:
        if transformer is None:
            if fit is False:
                raise ParameterError(
                    "a fresh NMF transformer must be fitted: fit=False "
                    "requires passing a pre-fit transformer"
                )
            import sklearn.decomposition

            transformer = sklearn.decomposition.NMF(
                n_components=n_components, **kwargs
            )
        fitted = (
            transformer.fit_transform(flat) if fit
            else transformer.transform(flat)
        )
        activations = fitted.T
        components = _unflatten(transformer.components_)

    if sort:
        components, order = util.axis_sort(components, index=True)
        components = np.asarray(components)
        activations = np.asarray(activations)[np.asarray(order)]
    return np.asarray(components), np.asarray(activations)


def _nmf_mu(
    V: jax.Array, k: int, *, n_iter: int = 200, seed: int = 0, **_: Any
) -> Tuple[jax.Array, jax.Array]:
    """Multiplicative-update NMF (Frobenius): every step is MXU matmuls.

    Random init + the update scan run as ONE program; the seed is a
    traced scalar so reseeding reuses the compiled program.
    """
    return _nmf_mu_run(V, np.uint32(seed), k=int(k), n_iter=int(n_iter))


@functools.partial(jax.jit, static_argnames=("k", "n_iter"))
def _nmf_mu_run(V, seed, *, k, n_iter):
    m, n = V.shape
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    W = jax.random.uniform(k1, (m, k), minval=0.1, maxval=1.0)
    H = jax.random.uniform(k2, (k, n), minval=0.1, maxval=1.0)
    eps = 1e-10

    def body(carry, _):
        W, H = carry
        H = H * (W.T @ V) / (W.T @ W @ H + eps)
        W = W * (V @ H.T) / (W @ (H @ H.T) + eps)
        return (W, H), None

    (W, H), _ = jax.lax.scan(body, (W, H), None, length=n_iter)
    return W, H


def hpss(
    S: Any,
    *,
    kernel_size: Union[int, Tuple[int, int]] = 31,
    power: float = 2.0,
    mask: bool = False,
    margin: Union[float, Tuple[float, float]] = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Harmonic-percussive source separation (HPSS) via median filtering.

    Median-filters the spectrogram along time (enhancing harmonics) and
    along frequency (enhancing percussives), then separates with
    margin-scaled soft-mask Wiener filtering [Fitzgerald 2010; Driedger
    2014].  Behavior parity with the reference ``decompose.py:211``;
    median filters run on device (``ops.median.median_filter_1d``).

    Parameters
    ----------
    S : np.ndarray or jax.Array [shape=(..., d, n)]
        input spectrogram; complex input separates magnitude and
        passes phase through
    kernel_size : int or tuple
        median filter lengths (harmonic, percussive)
    power : float
        soft-mask exponent (``np.inf`` = hard mask)
    mask : bool
        return masks instead of components
    margin : float or tuple >= 1
        separation margins; margins > 1 leave residual energy

    Returns
    -------
    harmonic, percussive : jax.Array
        component spectrograms (or masks)

    See Also
    --------
    effects.hpss : waveform-level separation
    util.softmask

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=0.5))
    >>> S = np.abs(np.asarray(lt.stft(y)))
    >>> H, P = lt.decompose.hpss(S)
    >>> bool(np.sum(np.asarray(H)) > np.sum(np.asarray(P)))  # pure tone is harmonic
    True
    """
    S = jnp.asarray(S)

    if isinstance(kernel_size, (tuple, list)):
        win_harm, win_perc = kernel_size[0], kernel_size[1]
    else:
        win_harm = win_perc = kernel_size

    if isinstance(margin, (tuple, list)):
        margin_harm, margin_perc = margin[0], margin[1]
    else:
        margin_harm = margin_perc = margin

    if margin_harm < 1 or margin_perc < 1:
        raise ParameterError(
            "Margins must be >= 1.0. A typical range is between 1 and 10."
        )

    # median filters + soft masks (+ phase reapplication) as ONE program
    # (eagerly the softmask chain costs ~40 dispatches per call)
    return _hpss_core(
        S, win_harm=int(win_harm), win_perc=int(win_perc),
        power=float(power), margin_harm=float(margin_harm),
        margin_perc=float(margin_perc), mask=bool(mask),
    )


@functools.partial(
    jax.jit,
    static_argnames=("win_harm", "win_perc", "power", "margin_harm",
                     "margin_perc", "mask"),
)
def _hpss_core(S, *, win_harm, win_perc, power, margin_harm, margin_perc,
               mask):
    if jnp.issubdtype(S.dtype, jnp.complexfloating):
        S, phase = core.magphase(S)
    else:
        phase = 1

    harm = median_filter_1d(S, size=win_harm, axis=-1)
    perc = median_filter_1d(S, size=win_perc, axis=-2)

    split_zeros = margin_harm == 1 and margin_perc == 1

    mask_harm = util.softmask(
        harm, perc * margin_harm, power=power, split_zeros=split_zeros
    )
    mask_perc = util.softmask(
        perc, harm * margin_perc, power=power, split_zeros=split_zeros
    )

    if mask:
        return mask_harm, mask_perc
    return ((S * mask_harm) * phase, (S * mask_perc) * phase)


def nn_filter(
    S: Any,
    *,
    rec: Optional[Any] = None,
    aggregate: Optional[Callable] = None,
    axis: int = -1,
    **kwargs: Any,
) -> np.ndarray:
    """Nearest-neighbor filtering: average each frame with its graph
    neighbors.

    With the default recurrence graph this is a non-local means filter over
    self-similar frames [Buades et al.; suppressing transient noise].
    Behavior parity with the reference ``decompose.py:409``; mean/weighted
    aggregation runs as one normalized sparse matmul.

    Parameters
    ----------
    S : np.ndarray
        feature matrix
    rec : sparse or dense matrix or None
        neighbor graph (default: ``segment.recurrence_matrix`` of ``S``)
    aggregate : callable
        neighbor aggregation (mean, average, median, ...)
    axis : int
        frame axis
    **kwargs : forwarded to ``recurrence_matrix``

    Returns
    -------
    S_filtered : np.ndarray, same shape as ``S``
    """
    if aggregate is None:
        aggregate = np.mean

    S = np.asarray(S)

    if rec is None:
        from . import segment

        kwargs = dict(kwargs)
        kwargs["sparse"] = True
        rec_s = segment.recurrence_matrix(S, axis=axis, **kwargs)
        rec_s = scipy.sparse.csc_matrix(rec_s)
    elif not scipy.sparse.issparse(rec):
        rec_s = scipy.sparse.csc_matrix(np.asarray(rec))
    else:
        rec_s = scipy.sparse.csc_matrix(rec)

    if rec_s.shape[0] != S.shape[axis] or rec_s.shape[0] != rec_s.shape[1]:
        raise ParameterError(
            "Invalid self-similarity matrix shape "
            f"rec.shape={rec_s.shape} for S.shape={S.shape}"
        )

    Sw = S.swapaxes(0, axis)

    if aggregate in (np.mean, np.average):
        # Mean/weighted-mean aggregation IS a normalized sparse matmul
        # (reference blocks the same product, decompose.py:550): one
        # CSR×dense product instead of a per-column Python loop.
        W = rec_s.T.tocsr().astype(np.float64)
        if aggregate is np.mean:
            W = W.copy()
            W.data[:] = 1.0
        row_sums = np.asarray(W.sum(axis=1)).ravel()
        flat = Sw.reshape(Sw.shape[0], -1)
        out = W @ flat
        nonempty = row_sums > 0
        out[nonempty] /= row_sums[nonempty, None]
        out[~nonempty] = flat[~nonempty]
        return out.reshape(Sw.shape).astype(S.dtype).swapaxes(0, axis)

    s_out = np.empty_like(Sw)
    data, indices, indptr = rec_s.data, rec_s.indices, rec_s.indptr
    for i in range(len(indptr) - 1):
        targets = indices[indptr[i] : indptr[i + 1]]
        if not len(targets):
            s_out[i] = Sw[i]
            continue
        neighbors = np.take(Sw, targets, axis=0)
        s_out[i] = aggregate(neighbors, axis=0)
    return s_out.swapaxes(0, axis)
