"""Device peak-picking kernels (jit-able, batched).

The reference implements peak picking as sequential numba kernels
(``librosa/util/utils.py:1188`` greedy, ``:1225`` DP).  Both are
wait-constrained scans over an envelope:

- *greedy*: a frame is a peak if it equals the max over
  ``[n-pre_max, n+post_max)``, exceeds the mean over
  ``[n-pre_avg, n+post_avg)`` by ``delta``, and at least ``wait+1`` frames
  have passed since the previous accepted peak.
- *dp*: choose the peak set maximizing total count (``dp_count``) or summed
  height (``dp_value``) subject to the same candidacy + spacing constraints,
  by a backward DP whose transition depends only on the next ``wait+1``
  values.

TPU-native strategy: the windowed max/mean candidacy tests are
embarrassingly parallel (``lax.reduce_window``), leaving only a tiny
carry through the sequential part — a wait countdown for greedy, a
``wait+1``-slot value ring for the DP — which runs as a ``lax.scan`` and
``vmap``s over batch rows.  Host paths in ``util.utils`` remain for tiny
single envelopes where device dispatch latency dominates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["candidate_mask", "greedy_mask", "dp_mask"]


def _windowed_stats(
    x: jax.Array, pre_max: int, post_max: int, pre_avg: int, post_avg: int
) -> Tuple[jax.Array, jax.Array]:
    """Edge-clamped sliding max and mean along the last axis.

    ``wmax[n] = max x[n-pre_max : n+post_max]``,
    ``wmean[n] = mean x[n-pre_avg : n+post_avg]`` with windows clipped to
    the array bounds (matching the reference's explicit min/max clamping).
    """
    ndim = x.ndim
    dims = (1,) * (ndim - 1)

    def reduce_last(arr, init, op, window, padding):
        return lax.reduce_window(
            arr,
            init,
            op,
            window_dimensions=dims + (window,),
            window_strides=dims + (1,),
            padding=((0, 0),) * (ndim - 1) + (padding,),
        )

    wmax = reduce_last(
        x, -jnp.inf, lax.max, pre_max + post_max, (pre_max, post_max - 1)
    )
    wsum = reduce_last(
        x, 0.0, lax.add, pre_avg + post_avg, (pre_avg, post_avg - 1)
    )
    wcount = reduce_last(
        jnp.ones_like(x), 0.0, lax.add, pre_avg + post_avg,
        (pre_avg, post_avg - 1),
    )
    return wmax, wsum / wcount


def candidate_mask(
    x: jax.Array,
    *,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
) -> jax.Array:
    """Peak candidates: frames passing both windowed tests.

    A frame qualifies when it equals the max over its
    ``[n-pre_max, n+post_max)`` window AND exceeds the mean over
    ``[n-pre_avg, n+post_avg)`` by ``delta`` — the reference
    ``peak_pick`` conditions before the sequential ``wait`` constraint
    is applied (``util/utils.py:1225``).  Pure shift-compare device ops;
    batched over leading axes.
    """
    wmax, wmean = _windowed_stats(x, pre_max, post_max, pre_avg, post_avg)
    return (x == wmax) & (x >= wmean + delta)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pre_max", "post_max", "pre_avg", "post_avg", "wait",
    ),
)
def greedy_mask(
    x: jax.Array,
    *,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
) -> jax.Array:
    """Greedy peak mask over the last axis; leading axes are batched.

    A ``lax.scan`` with a wait-countdown carry reproduces the reference
    numba kernel's sequential semantics: a candidate frame becomes a
    peak only if at least ``wait`` frames have passed since the last
    accepted peak.  Bit-identical to the host ``_peak_pick_greedy_1d``
    up to float precision of the windowed mean.

    Parameters
    ----------
    x : jax.Array [shape=(..., n)]
        envelope(s)
    pre_max, post_max, pre_avg, post_avg : int
        windowed max/mean extents (see ``util.peak_pick``)
    delta : float
        mean-exceedance threshold
    wait : int
        minimum frames between accepted peaks

    Returns
    -------
    mask : jax.Array [bool, shape of x]
    """
    cand = candidate_mask(
        x, pre_max=pre_max, post_max=post_max, pre_avg=pre_avg,
        post_avg=post_avg, delta=delta,
    )

    flat = cand.reshape(-1, cand.shape[-1])

    def row_scan(row):
        def step(countdown, is_cand):
            accept = is_cand & (countdown == 0)
            countdown = jnp.where(accept, wait, jnp.maximum(countdown - 1, 0))
            return countdown, accept

        _, accepts = lax.scan(step, jnp.int32(0), row)
        return accepts

    out = jax.vmap(row_scan)(flat)
    return out.reshape(cand.shape)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pre_max", "post_max", "pre_avg", "post_avg", "wait", "count",
    ),
)
def dp_values(
    x: jax.Array,
    *,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
    count: bool,
) -> jax.Array:
    """Backward-DP ``taken`` flags over the last axis (batched).

    ``values[n] = max(values[n+1], values[min(T, n+wait+1)] + v_n)`` when
    frame n is a candidate, else ``values[n+1]``; this needs only the next
    ``wait+1`` values, carried as a ring through a reverse scan.  The final
    pointer-following backtrack is O(T) host work on the emitted flags.

    Note: with ``count=False`` the accumulated values are sums of envelope
    heights; when two candidate paths tie to within float32 resolution the
    taken set can differ from a float64 evaluation (exact for ``count=True``,
    whose values are small integers).
    """
    cand = candidate_mask(
        x, pre_max=pre_max, post_max=post_max, pre_avg=pre_avg,
        post_avg=post_avg, delta=delta,
    )
    gain = jnp.ones_like(x) if count else x
    W = wait + 1

    flat_c = cand.reshape(-1, cand.shape[-1])
    flat_g = gain.reshape(-1, gain.shape[-1])

    def row_scan(c_row, g_row):
        def step(buf, inp):
            is_cand, v = inp
            # buf[0] = values[n+1], buf[W-1] = values[min(T, n+W)]
            take = is_cand & (buf[W - 1] + v > buf[0])
            val_n = jnp.where(take, buf[W - 1] + v, buf[0])
            buf = jnp.concatenate([val_n[None], buf[:-1]])
            return buf, take

        buf0 = jnp.zeros((W,), dtype=g_row.dtype)
        _, takes = lax.scan(step, buf0, (c_row, g_row), reverse=True)
        return takes

    out = jax.vmap(row_scan)(flat_c, flat_g)
    return out.reshape(cand.shape)


def dp_mask(taken_row, wait: int):
    """Host backtrack: walk the taken flags with the wait spacing.

    Final step of sparse peak-picking (``peak_pick(sparse=True)``): the
    device DP scan emits per-frame "taken" flags, and this converts them
    into the actual peak mask by replaying the reference's
    pointer-following rule (util/utils.py:1225) — from a taken frame the
    next decision point is ``n + wait + 1`` (enforcing the minimum
    spacing), otherwise ``n + 1``.  Sequential pointer chasing over a
    boolean vector is exactly the workload SURVEY §2.1 maps to host
    numpy; the arrays here are tiny (one flag per onset candidate).

    Parameters
    ----------
    taken_row : array of bool [shape=(..., T)] — DP "taken" flags
    wait : int — minimum inter-peak spacing in frames

    Returns
    -------
    peaks : np.ndarray of bool, same shape — the selected peaks
    """
    import numpy as np

    taken_row = np.asarray(taken_row)
    T = taken_row.shape[-1]
    peaks = np.zeros_like(taken_row, dtype=bool)
    flat_t = taken_row.reshape(-1, T)
    flat_p = peaks.reshape(-1, T)
    for r in range(flat_t.shape[0]):
        n = 0
        while n < T:
            if flat_t[r, n]:
                flat_p[r, n] = True
                n += wait + 1
            else:
                n += 1
    return flat_p.reshape(taken_row.shape)
