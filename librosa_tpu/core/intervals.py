"""Just-intonation interval systems (L2, host math).

The reference caches precomputed interval tables in a packaged msgpack file
(``librosa/core/intervals.py:22-24``); here the construction runs directly
(it is fast at the sizes used) with an lru cache.

Implementation note: the reference computes Tenney harmonic distance through a
rational num/den decomposition (``librosa/core/intervals.py:248-286``).  For
exponent vectors that formula collapses to ``log2 ratio of a/b in lowest
terms`` = ``logs . |a - b|``, which is what we use — it lets the crystal-growth
candidate scoring be a vectorized distance matrix instead of a nested loop.

Parity citations refer to ``librosa/core/intervals.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Collection, List, Union

import numpy as np

from .._cache import cache
from ..util.exceptions import ParameterError

__all__ = ["interval_frequencies", "pythagorean_intervals", "plimit_intervals"]


def _fold_to_octave(log_ratio: np.ndarray) -> tuple:
    """Fold log2-ratios into [0, 1), returning (folded, octaves_removed).

    ``x - floor(x)`` is exactly the reference's modf-plus-correction dance
    (core/intervals.py:437-446) for every sign of ``x``.
    """
    shift = np.floor(log_ratio)
    return log_ratio - shift, shift.astype(int)


@cache(level=10)
def interval_frequencies(
    n_bins: int,
    *,
    fmin: float,
    intervals: Union[str, Collection[float]],
    bins_per_octave: int = 12,
    tuning: float = 0.0,
    sort: bool = True,
) -> np.ndarray:
    """Construct a set of frequencies from a musical interval system.

    Tiles the chosen interval ratios across octaves starting at ``fmin``
    — the frequency grid used by variable-Q transforms over non-equal
    temperaments (behavior parity with the reference
    ``core/intervals.py:28``).

    Parameters
    ----------
    n_bins : int > 0
        number of frequencies to generate
    fmin : float > 0
        base frequency of the first bin
    intervals : str or array of float
        - ``'equal'`` — equal temperament
        - ``'pythagorean'`` — 3-limit stacked fifths
        - ``'ji3'``/``'ji5'``/``'ji7'`` — 3-, 5-, or 7-limit just
          intonation
        - an explicit array of ratios in [1, 2)
    bins_per_octave : int > 0
        bins per octave for the named systems
    tuning : float
        deviation in fractional bins (equal-spaced offset)
    sort : bool
        sort the ratios ascending within the octave

    Returns
    -------
    frequencies : np.ndarray [shape=(n_bins,)]

    See Also
    --------
    pythagorean_intervals, plimit_intervals

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> f = lt.interval_frequencies(4, fmin=55, intervals='equal')
    >>> np.round(f, 2)
    array([55.  , 58.27, 61.74, 65.41])
    """
    # Resolve the within-octave ratio set from the named system (or use
    # the caller's explicit ratio list as one octave).
    JI_PRIMES = {"ji3": [3], "ji5": [3, 5], "ji7": [3, 5, 7]}
    if not isinstance(intervals, str):
        ratios = np.array(intervals)
        bins_per_octave = len(ratios)
    elif intervals == "equal":
        cents = tuning + np.arange(bins_per_octave, dtype=float)
        ratios = np.exp2(cents / bins_per_octave)
    elif intervals == "pythagorean":
        ratios = pythagorean_intervals(
            bins_per_octave=bins_per_octave, sort=sort
        )
    elif intervals in JI_PRIMES:
        ratios = plimit_intervals(
            primes=JI_PRIMES[intervals],
            bins_per_octave=bins_per_octave, sort=sort,
        )
    else:
        raise ParameterError(
            f"interval system {intervals!r} is not one of: equal, "
            "pythagorean, ji3, ji5, ji7 (or an explicit ratio array)"
        )

    # replicate the octave pattern up the register until n_bins are filled
    octaves_needed = np.ceil(n_bins / bins_per_octave)
    ladder = np.multiply.outer(np.exp2(np.arange(octaves_needed)), ratios)
    picked = ladder.ravel()[:n_bins]
    if sort:
        picked = np.sort(picked)
    return picked * fmin


@cache(level=10)
def pythagorean_intervals(
    *, bins_per_octave: int = 12, sort: bool = True, return_factors: bool = False
):
    """Pythagorean (3-limit) intervals: stacked fifths folded into one octave.

    The k-th interval (circle-of-fifths order) is ``3**k / 2**m`` with ``m``
    chosen so the ratio lands in [1, 2).

    Parameters
    ----------
    bins_per_octave : int > 0
        number of intervals to generate
    sort : bool
        sort ratios ascending (False = circle-of-fifths order)
    return_factors : bool
        also return each interval's prime factorization as a list of
        ``{prime: exponent}`` dicts

    Returns
    -------
    intervals : np.ndarray [shape=(bins_per_octave,)]
        frequency ratios in [1, 2)
    factors : list of dict
        only when ``return_factors=True``

    See Also
    --------
    plimit_intervals, interval_frequencies

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> np.round(lt.pythagorean_intervals(bins_per_octave=5), 4)
    array([1.    , 1.125 , 1.2656, 1.5   , 1.6875])

    Parity: reference core/intervals.py:146.
    """
    fifths = np.arange(bins_per_octave)
    folded_log, octs = _fold_to_octave(fifths * np.log2(3.0))

    if sort:
        order = np.argsort(folded_log)
    else:
        order = np.arange(bins_per_octave)

    if return_factors:
        return [{2: -int(octs[k]), 3: int(fifths[k])} for k in order]
    return 2.0 ** folded_log[order]


def _tenney_hd(points: np.ndarray, others: np.ndarray, logs: np.ndarray):
    """Pairwise Tenney harmonic distance, rounded like the reference.

    ``points``: (m, P) exponent rows; ``others``: (n, P).  Returns (m, n).
    Equivalent to core/intervals.py:248 (see module docstring); the 6-decimal
    rounding before summation matters for tie behavior and is kept.
    """
    diffs = np.abs(points[:, None, :] - others[None, :, :])
    return np.around(diffs @ logs, 6)


@functools.lru_cache(maxsize=64)
def _crystal_growth(primes: tuple, n_intervals: int) -> tuple:
    """Grow an interval crystal of ``n_intervals`` points.

    Greedy selection by minimum total harmonic distance to the chosen set,
    ties (np.isclose) going to the candidate with smaller ``logs . |point|``
    when scanning the frontier in insertion order.  Behavior matches
    core/intervals.py:302, restructured around array scoring.
    """
    p = len(primes)
    logs = np.log2(np.asarray(primes, dtype=np.float64))

    # Expansion moves: +/- one step along each prime axis, in axis order.
    moves = []
    for axis in range(p):
        step = np.zeros(p, dtype=int)
        step[axis] = 1
        moves.append(tuple(step))
        moves.append(tuple(-step))

    chosen: List[tuple] = [tuple(np.zeros(p, dtype=int))]
    frontier: List[tuple] = list(moves)
    frontier_set = set(frontier)
    chosen_set = set(chosen)
    # Running sum over `chosen` of HD(candidate, s), kept in frontier order.
    hd_totals: List[float] = [
        float(t)
        for t in _tenney_hd(
            np.asarray(frontier), np.asarray(chosen), logs
        ).sum(axis=1)
    ]

    while len(chosen) < n_intervals:
        # Sequential min scan with the reference's tie rule.
        best = 0
        for cand in range(1, len(frontier)):
            total = hd_totals[cand]
            takes = total < hd_totals[best]
            if not takes and np.isclose(total, hd_totals[best]):
                # Tie: prefer the simpler interval (smaller logs . |exponents|).
                takes = bool(
                    logs @ np.abs(np.asarray(frontier[cand]))
                    < logs @ np.abs(np.asarray(frontier[best]))
                )
            if takes:
                best = cand

        winner = frontier.pop(best)
        hd_totals.pop(best)
        frontier_set.discard(winner)
        chosen.append(winner)
        chosen_set.add(winner)

        # Every remaining candidate's running total grows by HD(., winner).
        if frontier:
            delta = _tenney_hd(
                np.asarray(frontier), np.asarray([winner]), logs
            )[:, 0]
            hd_totals = [t + float(d) for t, d in zip(hd_totals, delta)]

        fresh = []
        for step in moves:
            neighbor = tuple(w + s for w, s in zip(winner, step))
            if neighbor not in chosen_set and neighbor not in frontier_set:
                fresh.append(neighbor)
                frontier.append(neighbor)
                frontier_set.add(neighbor)
        if fresh:
            fresh_totals = _tenney_hd(
                np.asarray(fresh), np.asarray(chosen), logs
            ).sum(axis=1)
            hd_totals.extend(float(t) for t in fresh_totals)

    return tuple(chosen)


@cache(level=10)
def plimit_intervals(
    *,
    primes: Any,
    bins_per_octave: int = 12,
    sort: bool = True,
    return_factors: bool = False,
):
    """p-limit just-intonation intervals by harmonic-distance crystal growth.

    Greedily grows a set of intervals from the given prime limits,
    adding at each step the candidate with the smallest total Tenney
    harmonic distance to the intervals already chosen [Sabat & Schweinitz
    2004] — the reference's "crystal growth" procedure.

    Parameters
    ----------
    primes : array of int
        odd prime limits (e.g. ``[3, 5]`` for 5-limit just intonation)
    bins_per_octave : int > 0
        number of intervals to generate
    sort : bool
        sort ratios ascending (False = growth order)
    return_factors : bool
        also return prime factorizations as ``{prime: exponent}`` dicts

    Returns
    -------
    intervals : np.ndarray [shape=(bins_per_octave,)]
        frequency ratios in [1, 2)
    factors : list of dict
        only when ``return_factors=True``

    See Also
    --------
    pythagorean_intervals, interval_frequencies

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> np.round(lt.plimit_intervals(primes=[3, 5], bins_per_octave=5), 4)
    array([1.    , 1.125 , 1.25  , 1.3333, 1.5   ])

    Parity: reference core/intervals.py:302.
    """
    primes = np.atleast_1d(primes)
    logs = np.log2(primes, dtype=np.float64)

    exponents = np.asarray(
        _crystal_growth(tuple(int(q) for q in primes), int(bins_per_octave)),
        dtype=float,
    )
    folded_log, octs = _fold_to_octave(exponents @ logs)

    if sort:
        order = np.argsort(folded_log)
    else:
        order = np.arange(bins_per_octave)

    if return_factors:
        out = []
        for k in order:
            fac: dict = {}
            if octs[k]:
                fac[2] = -int(octs[k])
            for q, e in zip(primes, exponents[k]):
                if e:
                    fac[int(q)] = int(e)
            out.append(fac)
        return out

    return 2.0 ** folded_log[order]
