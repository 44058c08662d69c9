"""Interval/event alignment.

Vectorized formulations (argmin over interval metrics) of the reference's
numba two-pointer kernels (``librosa/util/matching.py:21,66,315``).  These
operate on small host-side event lists; NumPy is the right tool.
"""

from __future__ import annotations

import numpy as np

from .exceptions import ParameterError

__all__ = ["match_intervals", "match_events"]


def _jaccard(int_a: np.ndarray, int_b: np.ndarray) -> np.ndarray:
    """Pairwise Jaccard similarity between interval sets.

    Parity: util/matching.py:21 (__jaccard), vectorized to a (n, m) matrix.
    """
    lo = np.maximum(int_a[:, None, 0], int_b[None, :, 0])
    hi = np.minimum(int_a[:, None, 1], int_b[None, :, 1])
    intersection = np.maximum(0.0, hi - lo)
    lo_u = np.minimum(int_a[:, None, 0], int_b[None, :, 0])
    hi_u = np.maximum(int_a[:, None, 1], int_b[None, :, 1])
    union = hi_u - lo_u
    with np.errstate(invalid="ignore", divide="ignore"):
        jac = np.where(union > 0, intersection / union, 0.0)
    return jac


def match_intervals(
    intervals_from: np.ndarray, intervals_to: np.ndarray, *, strict: bool = True
) -> np.ndarray:
    """Match one set of time intervals to another.

    Each source interval maps to the candidate maximizing Jaccard overlap
    (ties to the earlier candidate); with ``strict=False``, non-overlapping
    intervals fall back to minimum boundary distance.  Parity:
    util/matching.py:119.

    Parameters
    ----------
    intervals_from : np.ndarray [shape=(n, 2)]
    intervals_to : np.ndarray [shape=(m, 2)]
    strict : bool
        require a positive overlap

    Returns
    -------
    interval_mapping : np.ndarray [shape=(n,), dtype=int]
    """
    intervals_from = np.asarray(intervals_from, dtype=float)
    intervals_to = np.asarray(intervals_to, dtype=float)
    if len(intervals_from) == 0 or len(intervals_to) == 0:
        raise ParameterError("Attempting to match empty interval list")

    jac = _jaccard(intervals_from, intervals_to)  # (n_from, n_to)
    best = jac.argmax(axis=1)
    has_overlap = jac.max(axis=1) > 0

    if strict:
        if not np.all(has_overlap):
            raise ParameterError("Unable to match intervals with strict=True")
        return best.astype(int)

    # Non-strict: fall back to closest endpoints (max of start/end distances)
    dist = np.maximum(
        np.abs(intervals_from[:, None, 0] - intervals_to[None, :, 0]),
        np.abs(intervals_from[:, None, 1] - intervals_to[None, :, 1]),
    )
    fallback = dist.argmin(axis=1)
    return np.where(has_overlap, best, fallback).astype(int)


def match_events(
    events_from: np.ndarray,
    events_to: np.ndarray,
    *,
    left: bool = True,
    right: bool = True,
) -> np.ndarray:
    """Match one set of event times to another.

    Each source event maps to its closest target, optionally constrained to
    be left/right of the source.  Parity: util/matching.py:215.

    Parameters
    ----------
    events_from, events_to : 1-D arrays
    left, right : bool
        allow targets before / after the source

    Returns
    -------
    event_mapping : np.ndarray [shape=(n,), dtype=int]
    """
    if len(events_from) == 0 or len(events_to) == 0:
        raise ParameterError("Attempting to match empty event list")
    if not (left or right):
        raise ParameterError("Cannot match with left=right=False")

    events_from = np.asarray(events_from)
    events_to = np.asarray(events_to)

    if not left and np.max(events_to) < np.max(events_from):
        raise ParameterError(
            "Cannot match events with left=False "
            "where max(events_to) < max(events_from)"
        )
    if not right and np.min(events_to) > np.min(events_from):
        raise ParameterError(
            "Cannot match events with right=False "
            "where min(events_to) > min(events_from)"
        )

    diff = events_to[None, :].astype(float) - events_from[:, None].astype(float)
    dist = np.abs(diff)
    if not left:
        dist[diff < 0] = np.inf
    if not right:
        dist[diff > 0] = np.inf
    return dist.argmin(axis=1).astype(int)
