"""Sequential modeling: alignment (DTW), recurrence quantification (RQA),
and Viterbi decoding (L5).

TPU-first designs:

- ``viterbi*``: the T×S DP runs as a ``lax.scan`` over time with a dense
  max-plus "tropical" product per step — an (S_prev → S_next) reduction the
  VPU/MXU handles in one fused kernel, batched over channels.  The
  reference's transition pruning (``sequence.py:1215-1237``) is reproduced
  exactly by masking infeasible transitions to -inf.
- ``dtw``: row-vectorized DP.  The within-row (0,1) step is a running-min
  recurrence which linearizes exactly via a prefix-sum change of variables
  (min-plus analogue of an exponential filter), so each row is one
  vectorized sweep instead of an M-step scalar loop.
- ``rqa``: anti-diagonal wavefront DP (cells depend only on earlier
  anti-diagonals).

Parity citations refer to ``librosa/sequence.py``.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .filters import get_window
from .util.exceptions import ParameterError
from .util.utils import expand_to, fill_off_diagonal, is_positive_int, tiny

__all__ = [
    "dtw",
    "dtw_backtracking",
    "rqa",
    "viterbi",
    "viterbi_discriminative",
    "viterbi_binary",
    "transition_uniform",
    "transition_loop",
    "transition_cycle",
    "transition_local",
    "path_to_steps",
]


# ---------------------------------------------------------------------------
# DTW (reference sequence.py:185)
# ---------------------------------------------------------------------------


def _dtw_accumulate(
    C: np.ndarray,
    steps_sigma: np.ndarray,
    w_mul: np.ndarray,
    w_add: np.ndarray,
    subseq: bool,
) -> Tuple[np.ndarray, np.ndarray]:
    """Accumulated-cost DP with arbitrary step sets, row-vectorized.

    Equivalent to the reference numba kernel ``__dtw_calc_accu_cost``
    (sequence.py:502): ``D[i,j] = min_s D[i-s0, j-s1] + wm_s*C[i,j] + wa_s``,
    with the first row/column defaulting to left/up moves.
    """
    N, M = C.shape
    n_steps = len(steps_sigma)

    # Work with a large finite sentinel instead of inf so the prefix-sum
    # min-plus trick stays NaN-free under band constraints (inf cost cells).
    BIG = 1e30
    C = np.minimum(C, BIG)

    D = np.full((N, M), BIG)
    steps = np.zeros((N, M), dtype=np.int32)
    steps[0, :] = 1
    steps[:, 0] = 2

    # Steps with infinite weights are disabled (the reference fills the
    # default steps' weights with inf when custom steps are provided).
    def _enabled(s: int) -> bool:
        return bool(np.isfinite(w_mul[s]) and np.isfinite(w_add[s]))

    # row-step (s0 == 0) bookkeeping
    row_steps = [
        (s, int(steps_sigma[s, 1]))
        for s in range(n_steps)
        if steps_sigma[s, 0] == 0 and _enabled(s)
    ]
    col_steps = [
        s for s in range(n_steps) if steps_sigma[s, 0] > 0 and _enabled(s)
    ]

    init_row0 = np.full(M, BIG)
    init_row0[0] = C[0, 0]
    if subseq:
        init_row0[:] = C[0, :]

    for i in range(N):
        # 1) initial values for this row
        if i == 0:
            value = init_row0.copy()
        else:
            value = np.full(M, BIG)

        # 2) candidates from steps that consume at least one row
        for s in col_steps:
            s0, s1 = int(steps_sigma[s, 0]), int(steps_sigma[s, 1])
            if i - s0 < 0:
                continue
            cand = np.full(M, BIG)
            prev = D[i - s0]
            if s1 == 0:
                cand = prev + w_mul[s] * C[i] + w_add[s]
            else:
                cand[s1:] = prev[:-s1] + w_mul[s] * C[i, s1:] + w_add[s]
            better = cand < value
            value[better] = cand[better]
            steps[i][better] = s

        # 3) within-row steps (s0 == 0).  For s1 == 1 this is the running-min
        # recurrence value[j] = min(value[j], value[j-1] + c[j]); solved in
        # closed form via prefix sums.  Larger s1 fall back to a scalar pass.
        for s, s1 in row_steps:
            c = w_mul[s] * C[i] + w_add[s]
            if s1 == 1:
                # The prefix-sum trick loses precision across huge sentinel
                # costs (band-blocked cells), so segment the row at blocked
                # positions: a chain cannot pass through them anyway.
                blocked = c >= 1e20
                new_value = np.full(M, BIG)
                a = 0
                while a < M:
                    if blocked[a]:
                        a += 1
                        continue
                    b = a
                    while b < M and not blocked[b]:
                        b += 1
                    cc = c[a:b]
                    P = np.cumsum(cc)
                    base = value[a:b] - P
                    E = np.minimum.accumulate(base)
                    # Chains must take ≥1 left step: cell j draws on sources
                    # k ≤ j−1 only.  Including k=j would re-derive value[j]
                    # through P[j]−P[j] float rearrangement, and a 1-ulp
                    # "improvement" would mislabel the cell as a row step —
                    # breaking backtrack/D consistency.
                    new_value[a + 1 : b] = E[:-1] + P[1:]
                    a = b
                # tie-break: strict improvement only (matches reference order)
                changed = new_value < value
                value = np.minimum(value, new_value)
                steps[i][changed] = s
            else:
                for j in range(s1, M):
                    cand_j = value[j - s1] + c[j]
                    if cand_j < value[j]:
                        value[j] = cand_j
                        steps[i, j] = s
        D[i] = value

    # Restore inf semantics for unreachable cells
    D[D >= BIG * 1e-6] = np.inf
    return D, steps


def dtw_backtracking(
    steps: np.ndarray,
    step_sizes_sigma: Optional[np.ndarray] = None,
    subseq: bool = False,
    start: Optional[int] = None,
) -> List[Tuple[int, int]]:
    """Backtrack an optimal warping path from a DTW step matrix.

    Follows the recorded step indices from the end (or ``start``) back
    to the origin, yielding the alignment in reverse order.

    Parameters
    ----------
    steps : np.ndarray [shape=(n, m)]
        per-cell index of the chosen step (as produced by ``dtw`` with
        ``return_steps=True``)
    step_sizes_sigma : np.ndarray or None
        step-size alphabet (defaults to the standard diagonal set)
    subseq : bool
        subsequence mode: stop at the top row rather than the corner
    start : int or None
        ending column for subsequence alignments

    Returns
    -------
    path : list of (int, int)
        warping path in reverse order

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> X = np.array([[0.0, 1.0, 2.0]])
    >>> D, wp = lt.sequence.dtw(X, X)
    >>> wp[::-1].tolist()
    [[0, 0], [1, 1], [2, 2]]

    Parity: reference sequence.py:575 (__dtw_backtracking).
    """
    if step_sizes_sigma is None:
        step_sizes_sigma = np.array([[1, 1], [0, 1], [1, 0]], dtype=np.uint32)
    if start is None:
        cur_idx = (steps.shape[0] - 1, steps.shape[1] - 1)
    else:
        cur_idx = (steps.shape[0] - 1, start)

    wp = [(cur_idx[0], cur_idx[1])]
    while (subseq and cur_idx[0] > 0) or (not subseq and cur_idx != (0, 0)):
        cur_step_idx = steps[(cur_idx[0], cur_idx[1])]
        cur_idx = (
            cur_idx[0] - int(step_sizes_sigma[cur_step_idx][0]),
            cur_idx[1] - int(step_sizes_sigma[cur_step_idx][1]),
        )
        if min(cur_idx) < 0:
            break
        wp.append((cur_idx[0], cur_idx[1]))
    return wp


def dtw(
    X: Any = None,
    Y: Any = None,
    *,
    C: Any = None,
    metric: str = "euclidean",
    step_sizes_sigma: Optional[np.ndarray] = None,
    weights_add: Optional[np.ndarray] = None,
    weights_mul: Optional[np.ndarray] = None,
    subseq: bool = False,
    backtrack: bool = True,
    global_constraints: bool = False,
    band_rad: float = 0.25,
    return_steps: bool = False,
):
    """Dynamic time warping (DTW) between two feature sequences.

    Accumulates a cost matrix over admissible steps and backtracks the
    optimal alignment path.  Behavior parity with the reference
    ``sequence.py:185``: arbitrary step sets with multiplicative/additive
    weights, Sakoe-Chiba global constraints, and subsequence mode.

    Parameters
    ----------
    X, Y : np.ndarray [shape=(..., d, N)] / [shape=(..., d, M)]
        feature sequences (mutually exclusive with ``C``)
    C : np.ndarray [shape=(N, M)] or None
        precomputed local cost matrix
    metric : str
        distance metric for ``C`` construction (scipy ``cdist``)
    step_sizes_sigma : np.ndarray [shape=(n, 2)] or None
        admissible steps; default ``[[1,1],[0,1],[1,0]]``
    weights_add, weights_mul : np.ndarray or None
        per-step additive/multiplicative penalties
    subseq : bool
        subsequence alignment (X may match anywhere inside Y)
    backtrack : bool
        also return the warping path
    global_constraints : bool
        apply a Sakoe-Chiba band of width ``band_rad * min(N, M)``
    band_rad : float
        relative band radius
    return_steps : bool
        also return the step matrix

    Returns
    -------
    D : np.ndarray [shape=(N, M)]
        accumulated cost matrix
    wp : np.ndarray [shape=(L, 2)]
        warping path in reverse order (only when ``backtrack``)

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> X = np.random.RandomState(0).randn(4, 20)
    >>> D, wp = lt.sequence.dtw(X=X, Y=X)
    >>> bool(np.all(wp[:, 0] == wp[:, 1]))   # self-alignment is diagonal
    True
    """
    steps, add_w, mul_w = _resolve_step_set(
        step_sizes_sigma, weights_add, weights_mul
    )

    if C is None and (X is None or Y is None):
        raise ParameterError(
            "without a precomputed cost matrix C, both feature sequences "
            "X and Y are required"
        )
    if C is not None and (X is not None or Y is not None):
        raise ParameterError(
            "pass either a precomputed cost matrix C, or the feature "
            "sequences X and Y — not both"
        )

    own_cost = C is None
    flipped = False
    if own_cost:
        X = _time_major(X)
        Y = _time_major(Y)
        try:
            from scipy.spatial.distance import cdist

            C = cdist(X, Y, metric=metric)
        except ValueError as exc:
            raise ParameterError(
                "could not build a pairwise cost matrix from X/Y; shape "
                "them (d, N) and (d, M) (1-D sequences as (1, N))"
            ) from exc
        if subseq and (X.shape[0] > Y.shape[0]):
            C = C.T
            flipped = True

    C = np.atleast_2d(np.asarray(C, dtype=np.float64))

    if C.shape[0] > C.shape[1] and np.array_equal(steps, np.array([[1, 1]])):
        raise ParameterError(
            "pure diagonal matching needs the query no longer than the "
            "target (C.shape[0] <= C.shape[1])"
        )
    if np.isnan(C).any():
        raise ParameterError("the DTW cost matrix contains NaN entries")

    if global_constraints:
        if not own_cost:
            C = np.copy(C)
        fill_off_diagonal(C, radius=band_rad, value=np.inf)

    D, traceback_steps = _dtw_accumulate(C, steps, mul_w, add_w, subseq)

    outputs: List[np.ndarray] = [D]
    if backtrack:
        outputs.append(
            _dtw_best_path(D, traceback_steps, steps, subseq,
                           flipped=flipped, own_cost=own_cost,
                           X=X, Y=Y, C=C)
        )
    if return_steps:
        outputs.append(traceback_steps)
    if len(outputs) == 1:
        return outputs[0]
    if backtrack:
        # (D, wp) or (D, wp, steps) ordering: path right after D
        return tuple(outputs)
    return tuple(outputs)


def _resolve_step_set(user_steps, weights_add, weights_mul):
    """Merge the caller's step set with the canonical {diag, right, down}
    moves.  Custom steps keep their weights; the canonical prefix is
    disabled (infinite weight) unless it IS the step set."""
    canonical = np.array([[1, 1], [0, 1], [1, 0]], dtype=np.uint32)
    if user_steps is None:
        steps = canonical
        add_w = np.zeros(3) if weights_add is None else weights_add
        mul_w = np.ones(3) if weights_mul is None else weights_mul
    else:
        n_user = len(user_steps)
        steps = np.concatenate((canonical, user_steps))
        barred = np.full(3, np.inf)
        add_w = np.concatenate(
            (barred, np.zeros(n_user) if weights_add is None else weights_add)
        )
        mul_w = np.concatenate(
            (barred, np.ones(n_user) if weights_mul is None else weights_mul)
        )
    if np.any(steps < 0):
        raise ParameterError("DTW steps must move forward (no negatives)")
    if not len(steps) == len(add_w) == len(mul_w):
        raise ParameterError(
            f"every step needs one additive and one multiplicative weight: "
            f"{len(steps)} steps, {len(add_w)} additive, "
            f"{len(mul_w)} multiplicative"
        )
    return (
        steps,
        np.asarray(add_w, dtype=np.float64),
        np.asarray(mul_w, dtype=np.float64),
    )


def _time_major(x) -> np.ndarray:
    """(..., d, n) feature array -> (n, d_flat) sample matrix."""
    x = np.atleast_2d(np.asarray(x))
    x = np.swapaxes(x, -1, 0)
    return x.reshape((x.shape[0], -1), order="F")


def _dtw_best_path(D, traceback_steps, steps, subseq, *, flipped,
                   own_cost, X, Y, C):
    """Backtrack the optimal warping path from the accumulated matrix."""
    if subseq:
        if np.isinf(D[-1]).all():
            raise ParameterError(
                "the step set admits no subsequence alignment at all"
            )
        tail = int(np.argmin(D[-1, :]))
        path = dtw_backtracking(traceback_steps, steps, subseq, tail)
    else:
        if np.isinf(D[-1, -1]):
            raise ParameterError(
                "the step set admits no complete alignment"
            )
        path = dtw_backtracking(traceback_steps, steps, subseq)
        if path[-1] != (0, 0):
            raise ParameterError(
                "no full-sequence warping path exists; subseq=True may "
                "recover a partial alignment"
            )
    wp = np.asarray(path, dtype=int)
    undo_flip = flipped or C.shape[0] > C.shape[1] or (
        own_cost and X is not None and Y is not None
        and X.shape[0] > Y.shape[0]
    )
    if subseq and undo_flip:
        wp = np.fliplr(wp)
    return wp


def path_to_steps(path: np.ndarray, *, inverse: bool = False) -> np.ndarray:
    """Convert a DTW warping path into per-frame fractional positions.

    Interpolates the path so each target frame maps to a (fractional)
    source position — the form consumed by time-stretch resynthesis.

    Parameters
    ----------
    path : np.ndarray [shape=(k, 2)]
        warping path pairs (source, target)
    inverse : bool
        swap source and target roles

    Returns
    -------
    steps : np.ndarray
        fractional source position per target frame

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> path = np.array([[0, 0], [1, 2], [2, 4]])
    >>> lt.sequence.path_to_steps(path).tolist()
    [0.0, 0.5, 1.0, 1.5, 2.0]

    Parity: reference sequence.py (path_to_steps).
    """
    path = np.asarray(path)
    if inverse:
        src, dst = path[:, 1], path[:, 0]
    else:
        src, dst = path[:, 0], path[:, 1]
    order = np.argsort(dst)
    dst_s, src_s = dst[order], src[order]
    grid = np.arange(dst_s[0], dst_s[-1] + 1)
    return np.interp(grid, dst_s, src_s)


# ---------------------------------------------------------------------------
# RQA (reference sequence.py:715)
# ---------------------------------------------------------------------------


def rqa(
    sim: Any,
    *,
    gap_onset: float = 1,
    gap_extend: float = 1,
    knight_moves: bool = True,
    backtrack: bool = True,
):
    """Recurrence quantification analysis (longest-path DP).

    Scores diagonal path structure in a recurrence matrix with knight-move
    continuations and gap penalties [Serra et al. 2009] (behavior parity
    with the reference ``sequence.py:715``).

    Parameters
    ----------
    sim : np.ndarray [shape=(N, M)]
        similarity/recurrence matrix (non-negative)
    gap_onset, gap_extend : float >= 0
        gap penalties
    knight_moves : bool
        allow (1,2)/(2,1) steps
    backtrack : bool
        also return the optimal path

    Returns
    -------
    score : np.ndarray [shape=(N, M)]
        accumulated score matrix
    path : np.ndarray [shape=(L, 2)]
        optimal path (when ``backtrack``)
    """
    if gap_onset < 0:
        raise ParameterError("gap_onset={} must be strictly positive")
    if gap_extend < 0:
        raise ParameterError("gap_extend={} must be strictly positive")

    sim = np.asarray(sim, dtype=np.float64)
    N, M = sim.shape
    score = np.zeros_like(sim)
    bt = np.zeros(sim.shape, dtype=np.int8)

    # moves: 0 diag (-1,-1), 1 knight-left (-1,-2), 2 knight-up (-2,-1)
    limit = 3 if knight_moves else 1

    def _cell_block(ii: np.ndarray, jj: np.ndarray) -> None:
        """Vectorized update for a set of independent cells."""
        svals = np.full((limit, len(ii)), -np.inf)
        tvals = np.zeros((limit, len(ii)), dtype=bool)
        ok0 = (ii >= 1) & (jj >= 1)
        svals[0, ok0] = score[ii[ok0] - 1, jj[ok0] - 1]
        tvals[0, ok0] = sim[ii[ok0] - 1, jj[ok0] - 1] > 0
        if knight_moves:
            ok1 = (ii >= 1) & (jj >= 2)
            svals[1, ok1] = score[ii[ok1] - 1, jj[ok1] - 2]
            tvals[1, ok1] = sim[ii[ok1] - 1, jj[ok1] - 2] > 0
            ok2 = (ii >= 2) & (jj >= 1)
            svals[2, ok2] = score[ii[ok2] - 2, jj[ok2] - 1]
            tvals[2, ok2] = sim[ii[ok2] - 2, jj[ok2] - 1] > 0
        # invalid moves behave as score 0 in the reference (arrays are
        # preinitialized to 0 there); replicate by clamping -inf to 0 only
        # for moves that exist in the reference's limited scan
        svals = np.where(np.isneginf(svals), 0.0, svals)

        is_link = sim[ii, jj] > 0
        best = np.argmax(svals, axis=0)
        best_score = svals[best, np.arange(len(ii))]

        # linked cells: extend best predecessor
        score[ii[is_link], jj[is_link]] = (
            best_score[is_link] + sim[ii[is_link], jj[is_link]]
        )
        bt[ii[is_link], jj[is_link]] = best[is_link]

        # unlinked cells: gap-penalized skip or reset
        vec = svals - np.where(tvals, gap_onset, gap_extend)
        bbest = np.argmax(vec, axis=0)
        bval = vec[bbest, np.arange(len(ii))]
        nl = ~is_link
        score[ii[nl], jj[nl]] = np.maximum(0, bval[nl])
        bt_nl = np.where(np.maximum(0, bval) == 0, -1, bbest)
        bt[ii[nl], jj[nl]] = bt_nl[nl]

    # first row/column: pure data, reset markers
    score[0, :] = sim[0, :]
    score[:, 0] = sim[:, 0]
    bt[0, :] = np.where(sim[0, :] > 0, -2, -1)
    bt[:, 0] = np.where(sim[:, 0] > 0, -2, -1)

    if N > 1 and M > 1:
        # remaining cells by anti-diagonal; the reference restricts the
        # candidate set near the borders (init_limit), which the ok-masks
        # reproduce via the 0-clamp
        for d in range(2, N + M - 1):
            i_lo = max(1, d - (M - 1))
            i_hi = min(N - 1, d - 1)
            if i_lo > i_hi:
                continue
            ii = np.arange(i_lo, i_hi + 1)
            jj = d - ii
            _cell_block(ii, jj)

    if backtrack:
        path = _rqa_backtrack(score, bt)
        return score, path
    return score


def _rqa_backtrack(score: np.ndarray, pointers: np.ndarray) -> np.ndarray:
    """Parity: sequence.py (__rqa_backtrack)."""
    offsets = [(-1, -1), (-1, -2), (-2, -1)]
    idx = list(np.unravel_index(np.argmax(score), score.shape))
    path: List[List[int]] = []
    while True:
        bt_index = pointers[tuple(idx)]
        if bt_index == -1:
            break
        path.insert(0, list(idx))
        if bt_index == -2:
            break
        idx = [idx[k] + offsets[bt_index][k] for k in range(2)]
    if not path:
        return np.empty((0, 2), dtype=np.uint)
    return np.asarray(path, dtype=np.uint)


# ---------------------------------------------------------------------------
# Viterbi (reference sequence.py:1174-1874) — max-plus scan on device
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("epsilon",))
def _viterbi_entry(prob, log_trans, log_p_init, *, epsilon):
    """log + transpose + scan as one program (prob is (..., S, T))."""
    log_prob = jnp.swapaxes(jnp.log(prob + epsilon), -2, -1)
    return _viterbi_scan(
        log_prob.astype(jnp.float32), log_trans, log_p_init
    )


@jax.jit
def _viterbi_scan(
    log_prob: jax.Array, log_trans: jax.Array, log_p_init: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Core Viterbi: scan over time with dense max-plus transition product.

    ``log_prob``: (..., T, S); returns (states (..., T) int32, logp (...,)).
    """
    v0 = log_prob[..., 0, :] + log_p_init

    lps = jnp.moveaxis(log_prob, -2, 0)  # (T, ..., S)

    def step(v, lp_t):
        scores = v[..., :, None] + log_trans  # (..., S_prev, S_next)
        best = jnp.max(scores, axis=-2)
        ptr = jnp.argmax(scores, axis=-2).astype(jnp.int32)
        return lp_t + best, ptr

    vT, ptrs = jax.lax.scan(step, v0, lps[1:])

    last = jnp.argmax(vT, axis=-1).astype(jnp.int32)
    logp = jnp.max(vT, axis=-1)

    def back(s, ptr_t):
        s_new = jnp.take_along_axis(ptr_t, s[..., None], axis=-1)[..., 0]
        return s_new, s

    s0, states_tail = jax.lax.scan(back, last, ptrs, reverse=True)
    states = jnp.concatenate([s0[None], states_tail], axis=0)  # (T, ...)
    return jnp.moveaxis(states, 0, -1), logp


def _validate_transition(transition: np.ndarray, n_states: int) -> None:
    if transition.shape != (n_states, n_states):
        raise ParameterError(
            f"transition.shape={transition.shape}, must be "
            f"(n_states, n_states)={n_states, n_states}"
        )
    if np.any(transition < 0) or not np.allclose(transition.sum(axis=1), 1):
        raise ParameterError(
            "Invalid transition matrix: must be non-negative "
            "and sum to 1 on each row."
        )


def viterbi(
    prob: Any,
    transition: Any,
    *,
    p_init: Optional[Any] = None,
    return_logp: bool = False,
    transition_min_prob: Optional[float] = None,
):
    """Viterbi decoding: the most likely state sequence of a hidden Markov
    model given per-frame observation likelihoods.

    Behavior parity with the reference ``sequence.py:1280``; on TPU the DP
    runs as a ``lax.scan`` of max-plus matrix products (MXU-friendly
    "tropical" algebra), and transition pruning (``transition_min_prob``)
    is reproduced exactly by masking infeasible transitions to -inf.

    Parameters
    ----------
    prob : np.ndarray [shape=(..., n_states, n_steps)]
        observation likelihoods P(obs_t | state_s), non-negative
    transition : np.ndarray [shape=(n_states, n_states)]
        row-stochastic transition matrix
    p_init : np.ndarray [shape=(n_states,)] or None
        initial state distribution (uniform by default)
    return_logp : bool
        also return the log-probability of the decoded path
    transition_min_prob : float or None
        prune transitions below this probability

    Returns
    -------
    states : np.ndarray [shape=(..., n_steps)]
        decoded state indices (and ``logp`` if requested)

    See Also
    --------
    viterbi_discriminative, viterbi_binary, transition_loop

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> prob = np.array([[0.9, 0.9, 0.1], [0.1, 0.1, 0.9]])
    >>> lt.sequence.viterbi(prob, lt.sequence.transition_uniform(2)).tolist()
    [0, 0, 1]
    """
    prob_np = np.asarray(prob)
    n_states, _ = prob_np.shape[-2:]
    transition = np.asarray(transition, dtype=np.float64)
    _validate_transition(transition, n_states)

    if np.any(prob_np < 0) or np.any(prob_np > 1):
        raise ParameterError("Invalid probability values: must be between 0 and 1.")

    epsilon = tiny(prob_np)

    if p_init is None:
        p_init = np.full(n_states, 1.0 / n_states)
    else:
        p_init = np.asarray(p_init, dtype=np.float64)
        if (
            np.any(p_init < 0)
            or not np.allclose(p_init.sum(), 1)
            or p_init.shape != (n_states,)
        ):
            raise ParameterError(
                f"Invalid initial state distribution: p_init={p_init}"
            )

    log_trans = np.log(transition + epsilon)
    log_p_init = np.log(p_init + epsilon)

    if transition_min_prob is not None and transition_min_prob > 0:
        thr = np.log(transition_min_prob + epsilon)
        feasible = log_trans >= thr
        if not np.all(feasible.any(axis=0)):
            bad = int(np.flatnonzero(~feasible.any(axis=0))[0])
            raise ParameterError(
                f"Empty transition matrix detected for state {bad} in Viterbi. "
                f"Try reducing your minimum transition probability threshold."
            )
        log_trans = np.where(feasible, log_trans, -np.inf)
    elif transition_min_prob is not None and transition_min_prob < 0:
        raise ParameterError(
            f"Invalid transition_min_prob={transition_min_prob}, "
            "must be None or non-negative."
        )

    states, logp = _viterbi_entry(
        jnp.asarray(prob_np.astype(np.float32)),
        jnp.asarray(log_trans.astype(np.float32)),
        jnp.asarray(log_p_init.astype(np.float32)),
        epsilon=float(epsilon),
    )
    states = states.astype(jnp.uint16)
    if return_logp:
        return states, logp
    return states


def viterbi_discriminative(
    prob: Any,
    transition: Any,
    *,
    p_state: Optional[Any] = None,
    p_init: Optional[Any] = None,
    return_logp: bool = False,
    transition_min_prob: Optional[float] = None,
):
    """Viterbi decoding from *discriminative* state probabilities.

    Uses P(state | observation) (e.g. classifier outputs) in place of
    likelihoods, dividing out the marginal state distribution (behavior
    parity with the reference ``sequence.py:1455``).

    Parameters
    ----------
    prob : np.ndarray [shape=(..., n_states, n_steps)]
        per-frame state probabilities (columns sum to 1)
    transition : np.ndarray [shape=(n_states, n_states)]
        row-stochastic transition matrix
    p_state : np.ndarray or None
        marginal state distribution
    p_init : np.ndarray or None
        initial distribution
    return_logp : bool
        also return path log-probability

    Returns
    -------
    states : np.ndarray [shape=(..., n_steps)]
    """
    prob_np = np.asarray(prob)
    n_states, _ = prob_np.shape[-2:]
    transition = np.asarray(transition, dtype=np.float64)
    _validate_transition(transition, n_states)

    if prob_np.min(initial=0) < 0 or not np.allclose(prob_np.sum(axis=-2), 1):
        raise ParameterError(
            "the frame-wise observation matrix must hold a distribution "
            "per column (non-negative, summing to 1)"
        )

    epsilon = tiny(prob_np)

    p_state = _state_distribution("p_state", p_state, n_states)
    p_init = _state_distribution("p_init", p_init, n_states)

    log_p_init = np.log(p_init + epsilon)
    log_trans = np.log(transition + epsilon)
    log_marginal = np.log(p_state + epsilon)

    if transition_min_prob is not None and transition_min_prob > 0:
        thr = np.log(transition_min_prob + epsilon)
        feasible = log_trans >= thr
        if not np.all(feasible.any(axis=0)):
            bad = int(np.flatnonzero(~feasible.any(axis=0))[0])
            raise ParameterError(
                f"Empty transition matrix detected for state {bad} in Viterbi. "
                f"Try reducing your minimum transition probability threshold."
            )
        log_trans = np.where(feasible, log_trans, -np.inf)

    # Bayes: log P[X|y] ∝ log P[y|X] - log P[y]
    lm = expand_to(jnp.asarray(log_marginal), ndim=prob_np.ndim, axes=-2)
    log_prob = jnp.log(jnp.asarray(prob_np) + epsilon) - lm
    log_prob = jnp.swapaxes(log_prob, -2, -1)

    states, logp = _viterbi_scan(
        log_prob.astype(jnp.float32),
        jnp.asarray(log_trans, dtype=jnp.float32),
        jnp.asarray(log_p_init, dtype=jnp.float32),
    )
    states = states.astype(jnp.uint16)
    if return_logp:
        return states, logp
    return states




def _state_distribution(name: str, dist, n_states: int) -> np.ndarray:
    """Validate an (n_states,) probability vector, defaulting to uniform."""
    if dist is None:
        return np.full(n_states, 1.0 / n_states)
    dist = np.asarray(dist, dtype=np.float64)
    if dist.shape != (n_states,):
        raise ParameterError(
            f"{name} must be one probability per state "
            f"(shape ({n_states},)); got shape {dist.shape}"
        )
    if dist.min() < 0 or not np.allclose(dist.sum(), 1):
        raise ParameterError(
            f"{name} is not a probability distribution: {dist}"
        )
    return dist


def viterbi_binary(
    prob: Any,
    transition: Any,
    *,
    p_state: Optional[Any] = None,
    p_init: Optional[Any] = None,
    return_logp: bool = False,
    transition_min_prob: Optional[float] = None,
):
    """Independent binary Viterbi decoding per label.

    Decodes each of ``n_labels`` as its own 2-state (off/on) HMM (behavior
    parity with the reference ``sequence.py:1702``).

    Parameters
    ----------
    prob : np.ndarray [shape=(..., n_labels, n_steps)]
        per-frame label probabilities
    transition : np.ndarray [shape=(2, 2) or (n_labels, 2, 2)]
        per-label transition matrices
    p_state, p_init : np.ndarray or None
        per-label marginal / initial probabilities
    return_logp : bool
        also return log-probabilities

    Returns
    -------
    states : np.ndarray [shape=(..., n_labels, n_steps)]
    """
    prob_np = np.atleast_2d(np.asarray(prob))
    n_labels = prob_np.shape[-2]

    transition = np.asarray(transition, dtype=np.float64)
    if transition.shape == (2, 2):
        transition = np.broadcast_to(transition, (n_labels, 2, 2))
    elif transition.shape != (n_labels, 2, 2):
        raise ParameterError(
            f"binary decoding takes one 2x2 transition matrix (shared) or "
            f"{n_labels} of them; got shape {transition.shape}"
        )
    if transition.min() < 0 or not np.allclose(transition.sum(axis=-1), 1):
        raise ParameterError(
            "each 2x2 transition row must be a probability distribution"
        )
    if prob_np.min() < 0 or prob_np.max() > 1:
        raise ParameterError(
            "per-label activation probabilities must lie in [0, 1]"
        )

    on_state = _per_label_prob("p_state", p_state, n_labels, default=0.5)
    on_init = _per_label_prob("p_init", p_init, n_labels, default=0.5)

    # one independent off/on HMM per label
    decoded = []
    scores = []
    for lab in range(n_labels):
        on = prob_np[..., lab, :]
        two_state = np.stack([1 - on, on], axis=-2)
        lab_states, lab_logp = viterbi_discriminative(
            two_state,
            transition[lab],
            p_state=np.array([1 - on_state[lab], on_state[lab]]),
            p_init=np.array([1 - on_init[lab], on_init[lab]]),
            return_logp=True,
            transition_min_prob=transition_min_prob,
        )
        decoded.append(np.asarray(lab_states))
        scores.append(np.asarray(lab_logp))

    states = np.stack(decoded, axis=-2).astype(np.uint16)
    if return_logp:
        return states, np.stack(scores, axis=-1)
    return states


def _per_label_prob(name: str, values, n_labels: int, *,
                    default: float) -> np.ndarray:
    """Validate an (n_labels,) vector of independent probabilities."""
    if values is None:
        return np.full(n_labels, default)
    vec = np.atleast_1d(np.asarray(values, dtype=np.float64))
    if vec.shape != (n_labels,) or vec.min() < 0 or vec.max() > 1:
        raise ParameterError(
            f"{name} needs one [0, 1] probability per label "
            f"({n_labels} labels); got {values!r}"
        )
    return vec


# ---------------------------------------------------------------------------
# Transition matrix constructors (reference sequence.py:1877-2146)
# ---------------------------------------------------------------------------


def transition_uniform(n_states: int) -> np.ndarray:
    """Uniform transition matrix: every state move equally likely.

    Each row is the constant distribution ``1 / n_states`` — the
    maximum-entropy prior for Viterbi decoding.

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.sequence.transition_uniform(2).tolist()
    [[0.5, 0.5], [0.5, 0.5]]

    Parity: reference sequence.py:1877.

    Parameters
    ----------
    n_states : int > 0

    Returns
    -------
    transition : np.ndarray [shape=(n_states, n_states)]
    """
    if not is_positive_int(n_states):
        raise ParameterError(f"n_states={n_states} must be a positive integer")
    return np.full((n_states, n_states), 1.0 / n_states)


def transition_loop(n_states: int, prob: Any) -> np.ndarray:
    """Self-loop transition matrix: stay with probability ``prob``, move
    uniformly otherwise.

    Parity: sequence.py:1905.

    Parameters
    ----------
    n_states : int > 1
    prob : float or array of float in [0, 1]
        per-state self-loop probability

    Returns
    -------
    transition : np.ndarray [shape=(n_states, n_states)]
    """
    stay = _per_state_param(prob, n_states, kind="probability")
    # leaving mass spreads uniformly over the other n-1 states
    spread = np.repeat((1.0 - stay)[:, None] / (n_states - 1), n_states, 1)
    return np.where(np.eye(n_states, dtype=bool), stay[:, None], spread)


def _per_state_param(value, n_states: int, *, kind: str) -> np.ndarray:
    """Validate and broadcast a per-state parameter vector.

    ``kind='probability'`` enforces float values in [0, 1];
    ``kind='width'`` enforces integer values >= 1.  A scalar is repeated
    for every state; anything else must already have length n_states.
    """
    if not (is_positive_int(n_states) and n_states > 1):
        raise ParameterError(
            f"a transition matrix needs at least 2 states; "
            f"got n_states={n_states}"
        )
    vec = np.asarray(value, dtype=np.float64 if kind == "probability" else int)
    if vec.ndim == 0:
        vec = np.full(n_states, vec.item())
    if vec.shape != (n_states,):
        raise ParameterError(
            f"per-state {kind} must be scalar or length-{n_states}; "
            f"got shape {vec.shape}"
        )
    if kind == "probability":
        if vec.min() < 0 or vec.max() > 1:
            raise ParameterError(
                f"state probabilities must lie in [0, 1]; got {vec}"
            )
    elif vec.min() < 1:
        raise ParameterError(f"window widths must be >= 1; got {vec}")
    return vec


def transition_cycle(n_states: int, prob: Any) -> np.ndarray:
    """Cyclic transition matrix: stay in place or advance to the next state.

    State ``i`` keeps probability ``prob[i]`` and passes the remainder
    to ``(i + 1) mod n_states`` — the standard left-to-right-with-wrap
    topology for beat phase or looping structure models.

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.sequence.transition_cycle(3, 0.8).round(2)[0].tolist()
    [0.8, 0.2, 0.0]

    Parity: reference sequence.py:1970.

    Parameters
    ----------
    n_states : int > 1
    prob : float or array in [0, 1]
        per-state self-loop probability

    Returns
    -------
    transition : np.ndarray [shape=(n_states, n_states)]
    """
    stay = _per_state_param(prob, n_states, kind="probability")
    here = np.arange(n_states)
    transition = np.zeros((n_states, n_states), dtype=np.float64)
    transition[here, here] = stay
    transition[here, (here + 1) % n_states] = 1.0 - stay
    return transition


def transition_local(
    n_states: int, width: Any, *, window: str = "triangle", wrap: bool = False
) -> np.ndarray:
    """Banded local transition matrix over a sliding window.

    Parity: sequence.py:2034 — each state moves within ``width`` neighbors,
    weighted by ``window``.

    Parameters
    ----------
    n_states : int > 1
    width : int or array of int
        neighborhood width per state
    window : window spec
        weighting within the neighborhood
    wrap : bool
        cyclic boundary

    Returns
    -------
    transition : np.ndarray [shape=(n_states, n_states)]
    """
    widths = _per_state_param(width, n_states, kind="width")

    transition = np.zeros((n_states, n_states), dtype=np.float64)
    for state, w in enumerate(widths):
        w = int(w)
        if w > n_states:
            raise ParameterError(
                f"state {state} has window width {w} wider than the "
                f"{n_states}-state space"
            )
        taps = get_window(window, w, fftbins=False)
        # scatter the window so its pad-centered placement, advanced by
        # n//2 + state + 1, lands symmetrically around `state`
        offset = (n_states - w) // 2 + n_states // 2 + state + 1
        cols = (np.arange(w) + offset) % n_states
        transition[state, cols] = taps
        if not wrap:
            # censor any tap that wrapped past the hard edges
            reach = w // 2
            transition[state, state + reach + 1:] = 0
            transition[state, :max(0, state - reach)] = 0

    # each row is a conditional distribution
    return transition / transition.sum(axis=1, keepdims=True)
