"""Device k-nearest-neighbor candidate search via distance matmuls.

The O(n·t) pairwise-distance computation is the most MXU-shaped operation in
the library (SURVEY §2.2, scikit-learn row): for euclidean metrics it is a
single ``X @ Y.T`` plus rank-1 norm corrections, and for cosine it is a
matmul of normalized rows.  ``topm`` computes, for each query row, the ``m``
nearest corpus rows (indices + distances) entirely on device, tiling the
query axis so the dense distance block never exceeds ``block × t``.

Replaces the host ``sklearn.neighbors.NearestNeighbors`` path used by
``librosa_tpu.segment.recurrence_matrix`` / ``cross_similarity`` for the
metrics above (reference behavior: ``librosa/segment.py:629-648``); exotic
metrics still fall back to sklearn.

Tie-breaking: ``lax.top_k`` prefers the lowest index among equal distances,
matching the stable ascending order the reference obtains from sklearn's
sorted neighbor lists.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Metrics with a matmul-shaped pairwise distance.
DEVICE_METRICS = frozenset({"euclidean", "l2", "sqeuclidean", "cosine"})

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.partial(
    jax.jit, static_argnames=("m", "metric", "exclude_self", "take_sqrt")
)
def _topm_block(
    Xb: jnp.ndarray,
    Y: jnp.ndarray,
    y_sq: jnp.ndarray,
    row_offset: jnp.ndarray,
    n_valid: jnp.ndarray,
    *,
    m: int,
    metric: str,
    exclude_self: bool,
    take_sqrt: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-m search for one block of query rows.

    Xb: (b, d) query block (rows past ``n_valid`` are padding).
    Y: (t, d) corpus; y_sq: (t,) squared norms (euclidean) or zeros (cosine).
    row_offset: global index of Xb's first row, for self-exclusion.
    """
    t = Y.shape[0]
    if metric == "cosine":
        # Rows were pre-normalized on the host; distance = 1 - x.y
        sim = jax.lax.dot_general(
            Xb, Y, (((1,), (1,)), ((), ())), precision=_HIGHEST
        )
        dist = 1.0 - sim
    else:
        cross = jax.lax.dot_general(
            Xb, Y, (((1,), (1,)), ((), ())), precision=_HIGHEST
        )
        x_sq = jnp.sum(Xb * Xb, axis=1, keepdims=True)
        dist = jnp.maximum(x_sq + y_sq[None, :] - 2.0 * cross, 0.0)
        if take_sqrt:
            dist = jnp.sqrt(dist)

    if exclude_self:
        rows = row_offset + jnp.arange(Xb.shape[0])
        dist = jnp.where(rows[:, None] == jnp.arange(t)[None, :], jnp.inf, dist)
    del n_valid  # only shapes the host-side slice; padding rows are discarded

    # Stable sort + slice instead of lax.top_k: identical result with
    # lowest-index-first ties, and XLA compiles it orders of magnitude
    # faster for the large m (~k + 2*width) this op uses.
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    d_sorted, i_sorted = jax.lax.sort(
        (dist, iota), dimension=1, is_stable=True, num_keys=1
    )
    return d_sorted[:, :m], i_sorted[:, :m]


def topm(
    queries: np.ndarray,
    corpus: np.ndarray,
    m: int,
    *,
    metric: str = "euclidean",
    exclude_self: bool = False,
    block: int = 4096,
    device: Optional[jax.Device] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """For each query row, the ``m`` nearest corpus rows.

    Returns ``(dist, idx)`` as host float32/int32 arrays of shape
    ``(n_queries, m)``, sorted ascending by distance.  Queries are processed
    in fixed-size blocks (padded, so every block reuses one compiled
    program) to bound the dense distance tile at ``block × t``.
    """
    if metric not in DEVICE_METRICS:
        raise ValueError(f"metric={metric!r} has no device kernel")

    X = np.ascontiguousarray(queries, dtype=np.float32)
    Y = np.ascontiguousarray(corpus, dtype=np.float32)
    n, t = X.shape[0], Y.shape[0]
    m = int(min(m, t))
    # Round the device-side slice up to a multiple of 32 so nearby k/width
    # requests share one compiled program; the exact m is cut on the host.
    m_pad = int(min(-(-m // 32) * 32, t))

    take_sqrt = metric in ("euclidean", "l2")
    if metric == "cosine":
        # sklearn semantics: zero rows normalize to zero -> distance 1.
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        Y = Y / np.maximum(np.linalg.norm(Y, axis=1, keepdims=True), 1e-30)
        y_sq = np.zeros(t, dtype=np.float32)
    else:
        # Centering on the corpus mean is distance-invariant but tames the
        # |x|^2 + |y|^2 - 2xy cancellation in float32.
        mu = Y.mean(axis=0, keepdims=True)
        X = X - mu
        Y = Y - mu
        y_sq = np.sum(Y * Y, axis=1).astype(np.float32)

    b = int(min(block, max(n, 1)))
    Yd = jnp.asarray(Y)
    ysqd = jnp.asarray(y_sq)

    dists = np.empty((n, m), dtype=np.float32)
    idxs = np.empty((n, m), dtype=np.int32)
    for start in range(0, n, b):
        stop = min(start + b, n)
        Xb = X[start:stop]
        if Xb.shape[0] < b:  # pad the ragged tail to reuse the compile
            Xb = np.pad(Xb, ((0, b - Xb.shape[0]), (0, 0)))
        d_blk, i_blk = _topm_block(
            jnp.asarray(Xb),
            Yd,
            ysqd,
            jnp.int32(start),
            jnp.int32(stop - start),
            m=m_pad,
            metric="cosine" if metric == "cosine" else "euclidean",
            exclude_self=exclude_self,
            take_sqrt=take_sqrt,
        )
        dists[start:stop] = np.asarray(d_blk)[: stop - start, :m]
        idxs[start:stop] = np.asarray(i_blk)[: stop - start, :m]
    return dists, idxs
