"""Self-similarity, recurrence, and temporal segmentation (L5).

Recurrence/cross-similarity kNN graphs are computed on device for
matmul-shaped metrics (euclidean/sqeuclidean/l2/cosine): a tiled pairwise
distance matmul + ``lax.top_k`` in ``ops.knn``, followed by vectorized
band-exclusion and top-k pruning on the candidate arrays.  Exotic metrics
fall back to host sklearn, as in the reference.  Dense affinity math and
path enhancement run on device.  Parity citations refer to
``librosa/segment.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse

from .filters import diagonal_filter
from .ops import knn as _knn_ops
from .util import utils as util
from .util.exceptions import ParameterError

__all__ = [
    "cross_similarity",
    "recurrence_matrix",
    "recurrence_to_lag",
    "lag_to_recurrence",
    "timelag_filter",
    "subsegment",
    "agglomerative",
    "path_enhance",
]


_BANDWIDTH_MODES = (
    "med_k_scalar",
    "mean_k",
    "gmean_k",
    "mean_k_avg",
    "gmean_k_avg",
    "mean_k_avg_and_pair",
)


def _affinity_bandwidth(rec, bw_mode, k: int):
    """Affinity bandwidth estimators over a kNN distance graph.

    Behavior parity with ``librosa/segment.py:1332``, but computed with
    segmented-array operations (one lexsort + reduceat over the CSR data)
    rather than per-row Python loops.
    """
    if isinstance(bw_mode, np.ndarray):
        if bw_mode.shape != rec.shape:
            raise ParameterError(
                f"Invalid matrix bandwidth shape: {bw_mode.shape}."
                f"Should be {rec.shape}."
            )
        if (bw_mode <= 0).any():
            raise ParameterError(
                "Invalid bandwidth. All entries must be strictly positive."
            )
        return np.array(bw_mode[rec.nonzero()])

    if isinstance(bw_mode, (int, float)):
        if float(bw_mode) <= 0:
            raise ParameterError(
                f"Invalid scalar bandwidth={float(bw_mode)}. "
                "Must be strictly positive."
            )
        return float(bw_mode)

    mode = "med_k_scalar" if bw_mode is None else bw_mode
    if mode not in _BANDWIDTH_MODES:
        raise ParameterError(
            f"Invalid bandwidth='{mode}'. Must be either a positive scalar "
            f"or one of {list(_BANDWIDTH_MODES)}"
        )

    n = rec.shape[0]
    counts = np.diff(rec.indptr)
    empty_rows = np.flatnonzero(counts == 0)
    if empty_rows.size and mode != "med_k_scalar":
        # Disconnected vertices only break point-wise estimators.
        raise ParameterError(
            f"The sample at time point {empty_rows[0]} has no neighbors"
        )

    # Sort distances within each row, then keep each row's k smallest.
    row_of = np.repeat(np.arange(n), counts)
    by_row_asc = rec.data[np.lexsort((rec.data, row_of))]
    within_row_rank = np.arange(len(row_of)) - np.repeat(rec.indptr[:-1], counts)
    kept = by_row_asc[within_row_rank < k]
    kept_counts = np.minimum(counts, k)
    kept_ends = np.cumsum(kept_counts)

    # Per-row distance to the k-th neighbor (NaN where the row is empty).
    dist_to_k = np.full(n, np.nan)
    nonempty = counts > 0
    dist_to_k[nonempty] = kept[kept_ends[nonempty] - 1]

    if mode == "med_k_scalar":
        if not np.any(np.isfinite(dist_to_k)):
            raise ParameterError("Cannot estimate bandwidth from an empty graph")
        return float(np.nanmedian(dist_to_k))

    if mode in ("mean_k", "gmean_k"):
        per_row = dist_to_k
    else:
        # Mean distance over each row's k nearest neighbors.
        per_row = np.add.reduceat(
            kept, kept_ends - kept_counts
        ) / kept_counts

    sigma_out = per_row[row_of]
    sigma_in = per_row[rec.indices]
    if mode in ("gmean_k", "gmean_k_avg"):
        return np.array((sigma_out * sigma_in) ** 0.5)
    if mode == "mean_k_avg_and_pair":
        return np.array((sigma_out + sigma_in + rec.data) / 3)
    return np.array((sigma_out + sigma_in) / 2)


def _knn_graph(data_fit, k_neighbors: int, metric: str, mode: str, X=None):
    import sklearn.neighbors

    try:
        knn = sklearn.neighbors.NearestNeighbors(
            n_neighbors=k_neighbors, metric=metric, algorithm="auto"
        )
    except ValueError:
        knn = sklearn.neighbors.NearestNeighbors(
            n_neighbors=k_neighbors, metric=metric, algorithm="brute"
        )
    knn.fit(data_fit)
    if X is None:
        return knn.kneighbors_graph(mode=mode).tolil()
    return knn.kneighbors_graph(X=X, mode=mode).tolil()


def _topk_prune(g, n_rows: int, k: int) -> None:
    """Retain only the top-k (closest) links per row of a LIL graph.

    Host fallback for exotic metrics; the device path prunes candidate
    arrays directly (``_graph_from_candidates``).
    """
    for i in range(n_rows):
        links = g.rows[i]
        if len(links) <= k:
            continue
        vals = np.array(g.data[i])
        order = np.argsort(vals)
        for j in np.array(links)[order[k:]]:
            g[i, j] = 0


def _graph_from_candidates(
    dist: np.ndarray,
    idx: np.ndarray,
    n_cols: int,
    *,
    mode: str,
    k: Optional[int] = None,
    width: int = 0,
):
    """Build the pruned kNN LIL graph from (n, m) nearest-candidate arrays.

    Candidates arrive sorted ascending by distance (``ops.knn.topm``).
    Pruning reproduces the reference's post-hoc order (segment.py:652-668):
    drop candidates inside the |i-j| < width band, then keep k per row — by
    ascending distance in distance/affinity mode, or by lowest column index
    in connectivity mode (where the reference sorts all-equal 1.0 weights).
    Fully vectorized; no per-element sparse writes.
    """
    n, m = idx.shape
    if k is None:
        # no pruning: keep every candidate
        rows = np.repeat(np.arange(n), m)
        cols = idx.ravel()
        vals = (
            np.ones(cols.size) if mode == "connectivity"
            else dist.ravel().astype(np.float64)
        )
    else:
        valid = np.abs(idx - np.arange(n)[:, None]) >= width
        if mode == "connectivity":
            cand = np.where(valid, idx, n_cols)  # sentinel past the last col
            cand = np.sort(cand, axis=1)[:, :k]
            keep = cand < n_cols
            rows = np.repeat(np.arange(n), cand.shape[1])[keep.ravel()]
            cols = cand[keep]
            vals = np.ones(cols.size)
        else:
            keep = valid & (np.cumsum(valid, axis=1) <= k)
            rows = np.nonzero(keep)[0]
            cols = idx[keep]
            vals = dist[keep].astype(np.float64)
    g = scipy.sparse.coo_matrix(
        (vals, (rows, cols)), shape=(n, n_cols)
    )
    return g.tolil()


def cross_similarity(
    data: Any,
    data_ref: Any,
    *,
    k: Optional[int] = None,
    metric: str = "euclidean",
    sparse: bool = False,
    mode: str = "connectivity",
    bandwidth: Any = None,
    full: bool = False,
):
    """Cross-similarity matrix between two feature sequences.

    Parity: segment.py:91 — the two-sequence analogue of
    ``recurrence_matrix``.

    Parameters
    ----------
    data : np.ndarray [shape=(..., d, n)]
        comparison sequence
    data_ref : np.ndarray [shape=(..., d, n_ref)]
        reference sequence
    k, metric, sparse, mode, bandwidth, full
        as in ``recurrence_matrix``

    Returns
    -------
    xsim : np.ndarray or scipy.sparse matrix [shape=(n_ref, n)]
    """
    data_ref = np.atleast_2d(np.asarray(data_ref))
    data = np.atleast_2d(np.asarray(data))
    if data_ref.shape[:-1] != data.shape[:-1]:
        raise ParameterError(
            f"the two sequences must agree on every non-time axis: "
            f"data_ref is {data_ref.shape}, data is {data.shape}"
        )
    _check_rec_mode(mode)

    data_ref, n_ref = _flatten_time_major(data_ref, -1)
    data, n = _flatten_time_major(data, -1)

    if k is None:
        k = min(n_ref, 2 * np.ceil(np.sqrt(n_ref)))
    k = int(k)

    bandwidth_k = k
    if full and (mode != "connectivity"):
        k = n

    kng_mode = "distance" if mode == "affinity" else mode
    if metric in _knn_ops.DEVICE_METRICS:
        dist_c, idx_c = _knn_ops.topm(
            data, data_ref, min(n_ref, k), metric=metric, exclude_self=False
        )
        # m <= k, so the reference's post-hoc top-k prune never fires here.
        xsim = _graph_from_candidates(dist_c, idx_c, n_ref, mode=kng_mode)
    else:
        xsim = _knn_graph(data_ref, min(n_ref, k), metric, kng_mode, X=data)
        if not full:
            _topk_prune(xsim, n, k)

    return _finalize_graph(xsim, mode, bandwidth, bandwidth_k, sparse)


def _flatten_time_major(x: np.ndarray, axis: int):
    """Collapse to a (time, features) matrix with time on the first axis."""
    x = np.swapaxes(x, axis, 0)
    steps = x.shape[0]
    return x.reshape((steps, -1), order="F"), steps


def _check_rec_mode(mode: str) -> None:
    if mode not in ("connectivity", "distance", "affinity"):
        raise ParameterError(
            f"unknown similarity mode {mode!r}; choose connectivity, "
            "distance, or affinity"
        )


def _finalize_graph(g, mode: str, bandwidth, bandwidth_k: int, sparse: bool,
                    *, clamp_negative: bool = False):
    """Shared tail of recurrence_matrix / cross_similarity: compact the
    graph, apply the mode transform, and orient time along columns."""
    g = g.tocsr()
    g.eliminate_zeros()
    if mode == "connectivity":
        g = g.astype(bool)
    elif mode == "affinity":
        if clamp_negative:
            g.data[g.data < 0] = 0.0
        scale = _affinity_bandwidth(g, bandwidth, bandwidth_k)
        g.data[:] = np.exp(g.data / (-1 * scale))
    g = scipy.sparse.csc_matrix(g.T)
    return g if sparse else g.toarray()


def recurrence_matrix(
    data: Any,
    *,
    k: Optional[int] = None,
    width: int = 1,
    metric: str = "euclidean",
    sym: bool = False,
    sparse: bool = False,
    mode: str = "connectivity",
    bandwidth: Any = None,
    self: bool = False,
    axis: int = -1,
    full: bool = False,
):
    """Recurrence (self-similarity) matrix of a feature sequence.

    kNN graph over frame feature vectors, with optional diagonal band
    exclusion, symmetrization, and affinity weighting
    ``exp(-d / bandwidth)`` (behavior parity with the reference
    ``segment.py:391``).

    Parameters
    ----------
    data : np.ndarray [shape=(..., d, n)]
        feature sequence
    k : int or None
        neighbors per frame (default auto)
    width : int >= 1
        minimum |i-j| distance (band exclusion)
    metric : str
        distance metric
    sym : bool
        keep only mutual neighbors
    sparse : bool
        return a scipy sparse matrix
    mode : 'connectivity', 'distance', or 'affinity'
        edge weighting
    bandwidth : scalar, ndarray, str, or None
        affinity bandwidth (see the reference's estimator modes)
    self : bool
        include self-links
    axis : int
        frame axis
    full : bool
        skip the kNN pruning (dense distances)

    Returns
    -------
    rec : np.ndarray or scipy.sparse matrix [shape=(n, n)]
    """
    data, t = _flatten_time_major(np.atleast_2d(np.asarray(data)), axis)

    if not 1 <= width < (t - 1) // 2:
        raise ParameterError(
            f"the excluded diagonal band must satisfy "
            f"1 <= width < {(t - 1) // 2} for {t} frames; got width={width}"
        )
    _check_rec_mode(mode)
    if k is None:
        k = 2 * np.ceil(np.sqrt(t - 2 * width + 1))
    k = int(k)

    bandwidth_k = k
    if full and (mode != "connectivity"):
        k = t

    kng_mode = "distance" if mode == "affinity" else mode
    if metric in _knn_ops.DEVICE_METRICS:
        dist_c, idx_c = _knn_ops.topm(
            data, data, min(t - 1, k + 2 * width),
            metric=metric, exclude_self=True,
        )
        rec = _graph_from_candidates(
            dist_c, idx_c, t, mode=kng_mode,
            k=None if full else k, width=width,
        )
    else:
        rec = _knn_graph(data, min(t - 1, k + 2 * width), metric, kng_mode)
        if not full:
            for diag in range(-width + 1, width):
                rec.setdiag(0, diag)
            _topk_prune(rec, t, k)

    if self:
        if mode == "connectivity":
            rec.setdiag(1)
        elif mode == "affinity":
            # negative placeholder keeps the structure without corrupting
            # the bandwidth statistics
            rec.setdiag(-1)
    else:
        rec.setdiag(0)

    if sym:
        rec = rec.minimum(rec.T)

    # clamp_negative: the affinity self-loop placeholders (-1) become
    # distance 0 -> affinity 1, after zero-elimination so they survive it
    return _finalize_graph(rec, mode, bandwidth, bandwidth_k, sparse,
                           clamp_negative=True)


def _shear_dense_np(X: np.ndarray, factor: int, axis: int) -> np.ndarray:
    """Dense shear with the reference's axis convention
    (util/utils.py:2136): axis=0 rolls rows along axis 1; any other axis
    rolls columns along axis 0.  One vectorized modular gather instead of
    n one-row np.roll calls."""
    X = np.asarray(X)
    n0, n1 = X.shape
    if axis == 0:
        src = (np.arange(n1)[None, :] - factor * np.arange(n0)[:, None]) % n1
        return np.take_along_axis(X, src, axis=1)
    src = (np.arange(n0)[:, None] - factor * np.arange(n1)[None, :]) % n0
    return np.take_along_axis(X, src, axis=0)


def _shear_sparse(X, factor: int, axis: int):
    """Sparse shear by coordinate remapping. Parity: util/utils.py:2158
    (same axis convention as ``_shear_dense_np``)."""
    fmt = X.format
    coo = X.tocoo()
    if axis == 0:
        rows = coo.row
        cols = np.mod(coo.col + factor * coo.row, X.shape[1])
    else:
        rows = np.mod(coo.row + factor * coo.col, X.shape[0])
        cols = coo.col
    out = scipy.sparse.coo_matrix((coo.data, (rows, cols)), shape=X.shape)
    return out.asformat(fmt)


def recurrence_to_lag(rec: Any, *, pad: bool = True, axis: int = -1):
    """Convert a recurrence matrix to a time-lag representation.

    Column ``t`` of the lag matrix holds the recurrence values of frame
    ``t`` against frames at each lag offset, so diagonal structure in
    recurrence space becomes horizontal structure in lag space.

    Parameters
    ----------
    rec : np.ndarray or sparse matrix [shape=(n, n)]
        (square) recurrence matrix
    pad : bool
        double the lag axis to hold negative lags
    axis : int
        which axis indexes time

    Returns
    -------
    lag : same type as ``rec`` [shape=(2n, n) or (n, n)]
        lag-domain matrix

    Raises
    ------
    ParameterError
        for non-square input

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> R = np.eye(4)
    >>> lt.segment.recurrence_to_lag(R, pad=False)[0].tolist()
    [1.0, 1.0, 1.0, 1.0]

    Parity: reference segment.py:709.
    """
    axis = int(np.abs(axis))

    if rec.ndim != 2 or rec.shape[0] != rec.shape[1]:
        raise ParameterError(
            f"recurrence matrices are square; got shape {rec.shape}"
        )

    if scipy.sparse.issparse(rec):
        fmt_in = rec.format
        if pad:
            # double the lag extent with an empty block so negative lags
            # land in their own half instead of wrapping onto positives
            t = rec.shape[axis]
            blank = scipy.sparse.coo_matrix((t, t), dtype=rec.dtype)
            if axis == 0:
                rec = scipy.sparse.hstack([rec, blank], format="csr")
            else:
                rec = scipy.sparse.vstack([rec, blank], format="csc")
        return _shear_sparse(rec, -1, axis).asformat(fmt_in)

    rec = np.asarray(rec)
    if pad:
        blank = np.zeros_like(rec)
        rec = np.concatenate([rec, blank], axis=1 - axis)
    return _shear_dense_np(rec, -1, axis)


def lag_to_recurrence(lag: Any, *, axis: int = -1):
    """Convert a time-lag matrix back to a recurrence representation.

    Inverse of :func:`recurrence_to_lag` (both padded and unpadded
    layouts are accepted).

    Parameters
    ----------
    lag : np.ndarray or sparse matrix [shape=(2n, n) or (n, n)]
        lag-domain matrix
    axis : int
        which axis indexes time

    Returns
    -------
    rec : same type as ``lag`` [shape=(n, n)]
        recurrence matrix

    Raises
    ------
    ParameterError
        for an invalid axis or inconsistent shape

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> R = np.eye(4)
    >>> L = lt.segment.recurrence_to_lag(R)
    >>> bool(np.allclose(lt.segment.lag_to_recurrence(L), R))
    True

    Parity: reference segment.py:816.
    """
    if axis not in (0, 1, -1):
        raise ParameterError(f"a 2-D lag matrix has no axis {axis}")
    axis = int(np.abs(axis))

    t = lag.shape[axis] if lag.ndim == 2 else -1
    lag_extent = lag.shape[1 - axis] if lag.ndim == 2 else -1
    # accepted layouts: unpadded (t, t) or padded (lag extent 2t)
    if lag.ndim != 2 or lag_extent not in (t, 2 * t):
        raise ParameterError(
            f"lag matrices are (n, n) or zero-padded to (2n, n); "
            f"got shape {getattr(lag, 'shape', None)}"
        )

    # undo the shear, then drop the padded half (a no-op when unpadded)
    keep = [slice(None), slice(None)]
    keep[1 - axis] = slice(t)
    if scipy.sparse.issparse(lag):
        unsheared = _shear_sparse(lag, 1, axis)
        return unsheared.tocsr()[tuple(keep)].asformat(lag.format)
    return _shear_dense_np(np.asarray(lag), 1, axis)[tuple(keep)]


def timelag_filter(function: Callable, pad: bool = True, index: int = 0) -> Callable:
    """Lift a matrix filter to operate in the time-lag domain.

    Returns a wrapped version of ``function`` that converts its
    ``index``-th argument to lag space, applies the filter there (where
    repeated structure is horizontal and easier to smooth), and
    converts the result back to recurrence space.

    Parameters
    ----------
    function : callable
        matrix filter, e.g. ``scipy.ndimage.median_filter``
    pad : bool
        forwarded to :func:`recurrence_to_lag`
    index : int
        position of the matrix argument in ``function``'s signature

    Returns
    -------
    wrapped : callable
        the lag-domain version of ``function``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> import scipy.ndimage
    >>> smooth = lt.segment.timelag_filter(scipy.ndimage.median_filter)
    >>> R = np.eye(6)
    >>> smooth(R, size=(1, 3)).shape
    (6, 6)

    Parity: reference segment.py:895.
    """

    @functools.wraps(function)
    def _wrapped(*args: Any, **kwargs: Any):
        args = list(args)
        args[index] = recurrence_to_lag(args[index], pad=pad)
        result = function(*args, **kwargs)
        return lag_to_recurrence(result)

    return _wrapped


def subsegment(
    data: Any, frames: np.ndarray, *, n_segments: int = 4, axis: int = -1
) -> np.ndarray:
    """Sub-divide a segmentation by feature clustering.

    Within each segment, constrained agglomerative clustering splits frames
    into up to ``n_segments`` sub-segments (behavior parity with the
    reference ``segment.py:976``).

    Parameters
    ----------
    data : feature matrix
    frames : np.ndarray [int]
        segment boundary frames
    n_segments : int > 0
        maximum sub-segments per segment
    axis : int
        frame axis

    Returns
    -------
    boundaries : np.ndarray [int]
        combined boundary frames
    """
    if n_segments < 1:
        raise ParameterError(
            f"cannot split a segment into n_segments={n_segments} pieces"
        )
    data = np.asarray(data)
    fences = util.fix_frames(frames, x_min=0, x_max=data.shape[axis], pad=True)

    def _split_one(lo: int, hi: int) -> np.ndarray:
        window = [slice(None)] * data.ndim
        window[axis] = slice(lo, hi)
        pieces = min(hi - lo, n_segments)
        return lo + agglomerative(data[tuple(window)], pieces, axis=axis)

    pieces = [_split_one(lo, hi) for lo, hi in zip(fences[:-1], fences[1:])]
    if not pieces:
        return np.array([], dtype=int)
    return np.concatenate(pieces)


def agglomerative(
    data: Any,
    k: int,
    *,
    clusterer: Optional[Any] = None,
    axis: int = -1,
) -> np.ndarray:
    """Bottom-up temporal segmentation by constrained agglomerative
    clustering.

    Ward clustering with a time-adjacency connectivity constraint
    (behavior parity with the reference ``segment.py:1073``).

    Parameters
    ----------
    data : feature matrix
    k : int > 0
        number of segments
    clusterer : sklearn clusterer or None
        custom clustering object
    axis : int
        frame axis

    Returns
    -------
    boundaries : np.ndarray [shape=(k,)]
        left-boundary frame of each segment (first is 0)
    """
    feats = np.atleast_2d(np.asarray(data))
    feats = np.swapaxes(feats, axis, 0)
    n = feats.shape[0]
    feats = feats.reshape((n, -1), order="F")

    if clusterer is None:
        import scipy.sparse
        import sklearn.cluster

        # temporal contiguity: each frame may only merge with its chain
        # neighbors (a tridiagonal adjacency, incl. self-loops)
        chain = scipy.sparse.diags(
            [np.ones(n - 1), np.ones(n), np.ones(n - 1)],
            offsets=(-1, 0, 1), format="coo",
        )
        clusterer = sklearn.cluster.AgglomerativeClustering(
            n_clusters=int(k), connectivity=chain
        )

    clusterer.fit(feats)
    # a boundary wherever the segment label changes, plus the origin
    flips = np.flatnonzero(np.diff(clusterer.labels_)) + 1
    return np.concatenate(([0], flips.astype(int)))


def path_enhance(
    R: Any,
    n: int,
    *,
    window: Any = "hann",
    max_ratio: float = 2.0,
    min_ratio: Optional[float] = None,
    n_filters: int = 7,
    zero_mean: bool = False,
    clip: bool = True,
    **kwargs: Any,
) -> jnp.ndarray:
    """Multi-angle smoothing filter for recurrence/path structure.

    Convolves with a bank of rotated diagonal filters and takes the
    elementwise maximum, enhancing diagonal paths of varying slopes
    [Mueller & Kurth 2006] (behavior parity with the reference
    ``segment.py:1167``).

    Parameters
    ----------
    R : recurrence / similarity matrix
    n : int > 0
        filter length
    window : window spec
        smoothing window
    max_ratio, min_ratio : float
        slope range
    n_filters : int > 0
        filters per direction
    symmetric : bool
        also filter the reversed slopes
    zero_mean, clip : bool
        filter normalization / output clipping
    **kwargs : forwarded to ``scipy.ndimage.convolve``

    Returns
    -------
    R_smooth : jax.Array, same shape as ``R``
    """
    import jax

    if min_ratio is None:
        min_ratio = 1.0 / max_ratio
    elif min_ratio > max_ratio:
        raise ParameterError(
            f"min_ratio={min_ratio} cannot exceed max_ratio={max_ratio}"
        )

    # host-constructed filter bank; the pad→conv→max cascade runs as ONE
    # program (eagerly ~5 dispatches per filter)
    kernels = tuple(
        jnp.asarray(
            diagonal_filter(window, n, slope=ratio, zero_mean=zero_mean)[
                ::-1, ::-1
            ].astype(np.float32)
        )
        for ratio in np.logspace(
            np.log2(min_ratio), np.log2(max_ratio), num=n_filters, base=2
        )
    )
    return _path_enhance_core(
        jnp.asarray(R, dtype=jnp.float32), kernels, clip=bool(clip)
    )


@functools.partial(jax.jit, static_argnames=("clip",))
def _path_enhance_core(R, kernels, *, clip):

    lead = R.shape[:-2]
    Rb = R.reshape((-1, 1) + R.shape[-2:])  # NCHW

    R_smooth = None
    for kflip2d in kernels:
        kh, kw = kflip2d.shape
        # scipy.ndimage.convolve: true convolution with 'reflect' boundary
        kflip = kflip2d[None, None]
        pad_h = ((kh - 1) // 2, kh // 2)
        pad_w = ((kw - 1) // 2, kw // 2)
        Rp = jnp.pad(
            Rb, ((0, 0), (0, 0), pad_h, pad_w), mode="symmetric"
        )
        conv = jax.lax.conv_general_dilated(
            Rp, kflip, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        R_smooth = conv if R_smooth is None else jnp.maximum(R_smooth, conv)

    out = R_smooth.reshape(lead + R.shape[-2:]) if lead else R_smooth[0, 0]
    if clip:
        out = jnp.clip(out, 0, None)
    return out
