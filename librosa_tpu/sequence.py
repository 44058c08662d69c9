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
    default_steps = np.array([[1, 1], [0, 1], [1, 0]], dtype=np.uint32)
    default_weights_add = np.zeros(3, dtype=np.float64)
    default_weights_mul = np.ones(3, dtype=np.float64)

    if step_sizes_sigma is None:
        step_sizes_sigma = default_steps
        if weights_add is None:
            weights_add = default_weights_add
        if weights_mul is None:
            weights_mul = default_weights_mul
    else:
        if weights_add is None:
            weights_add = np.zeros(len(step_sizes_sigma), dtype=np.float64)
        if weights_mul is None:
            weights_mul = np.ones(len(step_sizes_sigma), dtype=np.float64)
        default_weights_add.fill(np.inf)
        default_weights_mul.fill(np.inf)
        step_sizes_sigma = np.concatenate((default_steps, step_sizes_sigma))
        weights_add = np.concatenate((default_weights_add, weights_add))
        weights_mul = np.concatenate((default_weights_mul, weights_mul))

    if np.any(step_sizes_sigma < 0):
        raise ParameterError("step_sizes_sigma cannot contain negative values")
    if len(step_sizes_sigma) != len(weights_add):
        raise ParameterError(
            "len(weights_add) must be equal to len(step_sizes_sigma)"
        )
    if len(step_sizes_sigma) != len(weights_mul):
        raise ParameterError(
            "len(weights_mul) must be equal to len(step_sizes_sigma)"
        )
    if C is None and (X is None or Y is None):
        raise ParameterError("If C is not supplied, both X and Y must be supplied")
    if C is not None and (X is not None or Y is not None):
        raise ParameterError("If C is supplied, both X and Y must not be supplied")

    c_is_transposed = False
    C_local = False
    if C is None:
        C_local = True
        X = np.atleast_2d(np.asarray(X))
        Y = np.atleast_2d(np.asarray(Y))
        X = np.swapaxes(X, -1, 0)
        Y = np.swapaxes(Y, -1, 0)
        X = X.reshape((X.shape[0], -1), order="F")
        Y = Y.reshape((Y.shape[0], -1), order="F")
        try:
            from scipy.spatial.distance import cdist

            C = cdist(X, Y, metric=metric)
        except ValueError as exc:
            raise ParameterError(
                "scipy.spatial.distance.cdist returned an error.\n"
                "Please provide your input in the form X.shape=(K, N) "
                "and Y.shape=(K, M).\n 1-dimensional sequences should "
                "be reshaped to X.shape=(1, N) and Y.shape=(1, M)."
            ) from exc
        if subseq and (X.shape[0] > Y.shape[0]):
            C = C.T
            c_is_transposed = True

    C = np.atleast_2d(np.asarray(C, dtype=np.float64))

    if np.array_equal(step_sizes_sigma, np.array([[1, 1]])) and (
        C.shape[0] > C.shape[1]
    ):
        raise ParameterError(
            "For diagonal matching: Y.shape[-1] >= X.shape[-1] "
            "(C.shape[1] >= C.shape[0])"
        )

    if np.any(np.isnan(C)):
        raise ParameterError("DTW cost matrix C has NaN values. ")

    if global_constraints:
        if not C_local:
            C = np.copy(C)
        fill_off_diagonal(C, radius=band_rad, value=np.inf)

    D, steps = _dtw_accumulate(
        C, np.asarray(step_sizes_sigma), np.asarray(weights_mul),
        np.asarray(weights_add), subseq,
    )

    return_values: List[np.ndarray]
    if backtrack:
        if subseq:
            if np.all(np.isinf(D[-1])):
                raise ParameterError(
                    "No valid sub-sequence warping path could "
                    "be constructed with the given step sizes."
                )
            start = int(np.argmin(D[-1, :]))
            _wp = dtw_backtracking(steps, step_sizes_sigma, subseq, start)
        else:
            if np.isinf(D[-1, -1]):
                raise ParameterError(
                    "No valid sub-sequence warping path could "
                    "be constructed with the given step sizes."
                )
            _wp = dtw_backtracking(steps, step_sizes_sigma, subseq)
            if _wp[-1] != (0, 0):
                raise ParameterError(
                    "Unable to compute a full DTW warping path. "
                    "You may want to try again with subseq=True."
                )
        wp = np.asarray(_wp, dtype=int)
        if subseq and (
            (X is not None and Y is not None and X.shape[0] > Y.shape[0])
            or c_is_transposed
            or C.shape[0] > C.shape[1]
        ):
            wp = np.fliplr(wp)
        return_values = [D, wp]
    else:
        return_values = [D]

    if return_steps:
        return_values.append(steps)
    if len(return_values) > 1:
        return tuple(return_values)
    return return_values[0]


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

    if np.any(prob_np < 0) or not np.allclose(prob_np.sum(axis=-2), 1):
        raise ParameterError(
            "Invalid probability values: each column must "
            "sum to 1 and be non-negative"
        )

    epsilon = tiny(prob_np)

    if p_state is None:
        p_state = np.full(n_states, 1.0 / n_states)
    else:
        p_state = np.asarray(p_state, dtype=np.float64)
        if p_state.shape != (n_states,):
            raise ParameterError(
                "Marginal distribution p_state must have shape (n_states,). "
                f"Got p_state.shape={p_state.shape}"
            )
        if np.any(p_state < 0) or not np.allclose(p_state.sum(axis=-1), 1):
            raise ParameterError(
                f"Invalid marginal state distribution: p_state={p_state}"
            )

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
    prob = jnp.atleast_2d(jnp.asarray(prob))
    prob_np = np.asarray(prob)
    n_states, n_steps = prob_np.shape[-2:]

    transition = np.asarray(transition, dtype=np.float64)
    if transition.shape == (2, 2):
        transition = np.tile(transition, (n_states, 1, 1))
    elif transition.shape != (n_states, 2, 2):
        raise ParameterError(
            f"transition.shape={transition.shape}, must be (2, 2) or "
            f"(n_states, 2, 2)={n_states}"
        )
    if np.any(transition < 0) or not np.allclose(transition.sum(axis=-1), 1):
        raise ParameterError(
            "Invalid transition matrix: must be non-negative "
            "and sum to 1 on each row."
        )
    if np.any(prob_np < 0) or np.any(prob_np > 1):
        raise ParameterError(
            "Invalid probability values: prob must be between [0, 1]"
        )

    if p_state is None:
        p_state = np.full(n_states, 0.5)
    else:
        p_state = np.atleast_1d(np.asarray(p_state, dtype=np.float64))
    if p_state.shape != (n_states,) or np.any(p_state < 0) or np.any(p_state > 1):
        raise ParameterError(
            f"Invalid marginal state distributions: p_state={p_state}"
        )

    if p_init is None:
        p_init = np.full(n_states, 0.5)
    else:
        p_init = np.atleast_1d(np.asarray(p_init, dtype=np.float64))
    if p_init.shape != (n_states,) or np.any(p_init < 0) or np.any(p_init > 1):
        raise ParameterError(
            f"Invalid initial state distributions: p_init={p_init}"
        )

    shape_prefix = list(prob_np.shape[:-2])
    states = np.empty([*shape_prefix, n_states, n_steps], dtype=np.uint16)
    logp = np.empty([*shape_prefix, n_states])

    for state in range(n_states):
        prob_binary = np.stack(
            [1 - prob_np[..., state, :], prob_np[..., state, :]], axis=-2
        )
        out = viterbi_discriminative(
            prob_binary,
            transition[state],
            p_state=np.array([1 - p_state[state], p_state[state]]),
            p_init=np.array([1 - p_init[state], p_init[state]]),
            return_logp=True,
            transition_min_prob=transition_min_prob,
        )
        states[..., state, :] = np.asarray(out[0])
        logp[..., state] = np.asarray(out[1])

    if return_logp:
        return states, logp
    return states


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
    if not (is_positive_int(n_states) and (n_states > 1)):
        raise ParameterError(f"n_states={n_states} must be a positive integer > 1")

    prob = np.asarray(prob, dtype=np.float64)
    if prob.ndim == 0:
        prob = np.tile(prob, n_states)
    if prob.shape != (n_states,):
        raise ParameterError(
            f"prob={prob} must have length equal to n_states={n_states}"
        )
    if np.any(prob < 0) or np.any(prob > 1):
        raise ParameterError(f"prob={prob} must have values in the range [0, 1]")

    transition = np.empty((n_states, n_states), dtype=np.float64)
    for i, prob_i in enumerate(prob):
        transition[i] = (1.0 - prob_i) / (n_states - 1)
        transition[i, i] = prob_i
    return transition


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
    if not (is_positive_int(n_states) and n_states > 1):
        raise ParameterError(f"n_states={n_states} must be a positive integer > 1")

    prob = np.asarray(prob, dtype=np.float64)
    if prob.ndim == 0:
        prob = np.tile(prob, n_states)
    if prob.shape != (n_states,):
        raise ParameterError(
            f"prob={prob} must have length equal to n_states={n_states}"
        )
    if np.any(prob < 0) or np.any(prob > 1):
        raise ParameterError(f"prob={prob} must have values in the range [0, 1]")

    transition = np.zeros((n_states, n_states), dtype=np.float64)
    for i, prob_i in enumerate(prob):
        transition[i, np.mod(i + 1, n_states)] = 1.0 - prob_i
        transition[i, i] = prob_i
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
    if not (is_positive_int(n_states) and n_states > 1):
        raise ParameterError(f"n_states={n_states} must be a positive integer > 1")

    width = np.asarray(width, dtype=int)
    if width.ndim == 0:
        width = np.tile(width, n_states)
    if width.shape != (n_states,):
        raise ParameterError(
            f"width={width} must have length equal to n_states={n_states}"
        )
    if np.any(width < 1):
        raise ParameterError(f"width={width} must be at least 1")

    transition = np.zeros((n_states, n_states), dtype=np.float64)
    for i, width_i in enumerate(width):
        win = get_window(window, int(width_i), fftbins=False)
        trans_row = np.zeros(n_states)
        lpad = (n_states - len(win)) // 2
        trans_row[lpad : lpad + len(win)] = win
        trans_row = np.roll(trans_row, n_states // 2 + i + 1)
        if not wrap:
            trans_row[min(n_states, i + width_i // 2 + 1) :] = 0
            trans_row[: max(0, i - width_i // 2)] = 0
        transition[i] = trans_row

    transition /= transition.sum(axis=1, keepdims=True)
    return transition
