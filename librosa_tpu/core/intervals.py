"""Just-intonation interval systems (L2, host math).

The reference caches precomputed interval tables in a packaged msgpack file
(``librosa/core/intervals.py:22-24``); here the crystal-growth construction
runs directly (it is fast at the sizes used) with an lru cache.

Parity citations refer to ``librosa/core/intervals.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Collection, List, Union

import numpy as np

from ..util.exceptions import ParameterError

__all__ = ["interval_frequencies", "pythagorean_intervals", "plimit_intervals"]


def interval_frequencies(
    n_bins: int,
    *,
    fmin: float,
    intervals: Union[str, Collection[float]],
    bins_per_octave: int = 12,
    tuning: float = 0.0,
    sort: bool = True,
) -> np.ndarray:
    """Construct a set of frequencies from an interval set.

    Parity: core/intervals.py:28 — 'equal', 'pythagorean', 'ji3', 'ji5',
    'ji7', or an explicit ratio array.
    """
    if isinstance(intervals, str):
        if intervals == "equal":
            ratios = 2.0 ** (
                (tuning + np.arange(0, bins_per_octave, dtype=float))
                / bins_per_octave
            )
        elif intervals == "pythagorean":
            ratios = pythagorean_intervals(
                bins_per_octave=bins_per_octave, sort=sort
            )
        elif intervals == "ji3":
            ratios = plimit_intervals(
                primes=[3], bins_per_octave=bins_per_octave, sort=sort
            )
        elif intervals == "ji5":
            ratios = plimit_intervals(
                primes=[3, 5], bins_per_octave=bins_per_octave, sort=sort
            )
        elif intervals == "ji7":
            ratios = plimit_intervals(
                primes=[3, 5, 7], bins_per_octave=bins_per_octave, sort=sort
            )
        else:
            raise ParameterError(f"Unknown interval specification: {intervals}")
    else:
        ratios = np.array(intervals)
        bins_per_octave = len(ratios)

    n_octaves = np.ceil(n_bins / bins_per_octave)
    all_ratios = np.multiply.outer(
        2.0 ** np.arange(n_octaves), ratios
    ).flatten()[:n_bins]

    if sort:
        all_ratios = np.sort(all_ratios)
    return all_ratios * fmin


def pythagorean_intervals(
    *, bins_per_octave: int = 12, sort: bool = True, return_factors: bool = False
):
    """Pythagorean (3-limit) intervals. Parity: core/intervals.py:146."""
    pow3 = np.arange(bins_per_octave)
    log_ratios, pow2 = np.modf(pow3 * np.log2(3))
    too_small = log_ratios < 0
    log_ratios[too_small] += 1
    pow2[too_small] += 1
    pow2 = pow2.astype(int)

    if sort:
        idx = np.argsort(log_ratios)
        log_ratios = log_ratios[idx]
    else:
        idx = range(bins_per_octave)

    if return_factors:
        return [{2: -pow2[i], 3: int(pow3[i])} for i in idx]
    return np.power(2, log_ratios)


def _harmonic_distance(logs: np.ndarray, a, b) -> float:
    """Tenney harmonic distance between two factored intervals.

    Parity: core/intervals.py:248.
    """
    a = np.array(a)
    b = np.array(b)
    a_num = np.maximum(a, 0)
    a_den = a_num - a
    b_num = np.maximum(b, 0)
    b_den = b_num - b
    gcd = np.minimum(a_num, b_num) - np.maximum(a_den, b_den)
    return float(np.around(logs.dot(a + b - 2 * gcd), 6))


def _crystal_tie_break(a, b, logs: np.ndarray) -> bool:
    """Parity: core/intervals.py:280 — prefer simpler intervals on ties."""
    return bool(logs.dot(np.abs(np.array(a))) < logs.dot(np.abs(np.array(b))))


@functools.lru_cache(maxsize=64)
def _plimit_cached(primes: tuple, bins_per_octave: int) -> tuple:
    logs = np.log2(np.array(primes), dtype=np.float64)

    seeds = []
    for i in range(len(primes)):
        seed = [0] * len(primes)
        seed[i] = 1
        seeds.append(tuple(seed))
        seed = [0] * len(primes)
        seed[i] = -1
        seeds.append(tuple(seed))

    frontier = seeds.copy()
    distances: dict = {}
    intervals: List[tuple] = [tuple([0] * len(primes))]

    while len(intervals) < bins_per_octave:
        score = np.inf
        best_f = 0
        for f, point in enumerate(frontier):
            HD = 0.0
            for s in intervals:
                if (s, point) not in distances:
                    d = _harmonic_distance(logs, point, s)
                    distances[s, point] = d
                    distances[point, s] = d
                HD += distances[s, point]
            if HD < score or (
                np.isclose(HD, score)
                and _crystal_tie_break(point, frontier[best_f], logs)
            ):
                score = HD
                best_f = f

        new_point = frontier.pop(best_f)
        intervals.append(new_point)
        for s in seeds:
            new_seed = tuple(np.array(new_point) + np.array(s))
            if new_seed not in intervals and new_seed not in frontier:
                frontier.append(new_seed)

    return tuple(intervals)


def plimit_intervals(
    *,
    primes: Any,
    bins_per_octave: int = 12,
    sort: bool = True,
    return_factors: bool = False,
):
    """p-limit just intervals by harmonic-distance crystal growth.

    Parity: core/intervals.py:302.
    """
    primes = np.atleast_1d(primes)
    logs = np.log2(primes, dtype=np.float64)

    intervals = _plimit_cached(tuple(int(p) for p in primes), int(bins_per_octave))
    pows = np.array(list(intervals), dtype=float)

    log_ratios, pow2 = np.modf(pows.dot(logs))
    too_small = log_ratios < 0
    log_ratios[too_small] += 1
    pow2[too_small] -= 1
    pow2 = pow2.astype(int)

    if sort:
        idx = np.argsort(log_ratios)
        log_ratios = log_ratios[idx]
    else:
        idx = range(bins_per_octave)

    if return_factors:
        factors = []
        for i in idx:
            v: dict = {}
            if pow2[i] != 0:
                v[2] = -pow2[i]
            v.update(
                {
                    int(p): int(power)
                    for p, power in zip(primes, pows[i])
                    if power != 0
                }
            )
            factors.append(v)
        return factors

    return np.power(2, log_ratios)
