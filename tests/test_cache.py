"""On-disk cache layer semantics (reference tests/test_cache.py:26-45 analogue).

The module-level ``librosa_tpu.cache`` is inert unless LIBROSA_CACHE_DIR is
set at import time; these tests build throwaway CacheManagers against
tmpdirs, mirroring the reference's strategy.
"""

import numpy as np
import pytest

from librosa_tpu._cache import CacheManager


def _calls_counter():
    state = {"n": 0}

    def f(x):
        state["n"] += 1
        return np.arange(x)

    return f, state


def test_cache_disabled_is_identity():
    cache = CacheManager(None, verbose=0, level=10)
    f, state = _calls_counter()
    g = cache(level=10)(f)
    assert g is f  # no wrapping at all without a cache dir


def test_cache_active_memoizes(tmp_path):
    cache = CacheManager(str(tmp_path), verbose=0, level=10)
    f, state = _calls_counter()
    g = cache(level=10)(f)
    assert g is not f
    r1 = g(5)
    r2 = g(5)
    assert state["n"] == 1  # second call served from disk
    assert np.array_equal(r1, r2)
    r3 = g(7)
    assert state["n"] == 2
    assert len(r3) == 7


def test_cache_level_filter(tmp_path):
    # Functions above the configured level are not cached.
    cache = CacheManager(str(tmp_path), verbose=0, level=10)
    f, state = _calls_counter()
    g = cache(level=20)(f)
    assert g is f
    g(3)
    g(3)
    assert state["n"] == 2


def test_cache_clear(tmp_path):
    cache = CacheManager(str(tmp_path), verbose=0, level=10)
    f, state = _calls_counter()
    g = cache(level=10)(f)
    g(4)
    cache.clear(warn=False)
    g(4)
    assert state["n"] == 2


def test_library_constructors_are_wrapped(tmp_path):
    # The decorator is applied at import; with no cache dir the public
    # constructors must be the bare functions (zero overhead).
    import librosa_tpu as lt

    M1 = lt.filters.mel(sr=22050, n_fft=1024)
    M2 = lt.filters.mel(sr=22050, n_fft=1024)
    assert np.array_equal(np.asarray(M1), np.asarray(M2))

    # A fresh manager pointed at a tmpdir caches a constructor round-trip.
    cache = CacheManager(str(tmp_path), verbose=0, level=10)
    from librosa_tpu.core.intervals import plimit_intervals

    wrapped = cache(level=10)(
        plimit_intervals.func
        if hasattr(plimit_intervals, "func")
        else plimit_intervals
    )
    a = wrapped(primes=[3, 5], bins_per_octave=12)
    b = wrapped(primes=[3, 5], bins_per_octave=12)
    assert np.array_equal(a, b)
