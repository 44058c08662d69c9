"""Opt-in on-disk caching, joblib-backed.

Parity: reference ``librosa/_cache.py`` — the decorator only applies when
``LIBROSA_CACHE_DIR`` is set and the function's level is at or below
``LIBROSA_CACHE_LEVEL``.  In this framework most hot results are already
cached by jit compilation and the host-side lru caches; this layer exists
for expensive host computations (filterbanks, interval tables) and API
compatibility.
"""

from __future__ import annotations

import os
from typing import Any, Callable

__all__ = ["cache", "CacheManager"]


class CacheManager:
    """``joblib.Memory`` wrapper with a cache-level filter.

    Decorating a function with ``cache(level=L)`` memoizes it to disk
    only when ``L`` is at or below the manager's configured level —
    the reference's opt-in caching contract (``librosa/_cache.py:24``).
    Controlled entirely by environment variables: ``LIBROSA_CACHE_DIR``
    activates the cache, ``LIBROSA_CACHE_LEVEL``/``..._COMPRESS``/
    ``..._VERBOSE`` tune it.  With no cache dir, decorated functions
    run unwrapped (zero overhead).
    """

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        level = kwargs.pop("level", 10)
        from joblib import Memory

        self.memory = Memory(*args, **kwargs)
        self.level = level

    def __call__(self, level: int) -> Callable:
        """Decorator factory: cache a function if ``level`` is enabled.

        Functions decorated with ``@cache(level=N)`` are memoized to
        disk only when a cache directory is configured AND the
        manager's level is at least ``N`` — otherwise the function is
        returned untouched, so caching is zero-cost when disabled.
        """
        def wrapper(function: Callable) -> Callable:
            if self.memory.location is not None and self.level >= level:
                return self.memory.cache(function)
            return function

        return wrapper

    def clear(self, *args: Any, **kwargs: Any) -> None:
        """Delete the on-disk cache directory contents.

        Delegates to ``joblib.Memory.clear``; every memoized filterbank
        and window is recomputed on next use.  Safe to call at any time
        (the cache is purely an acceleration), and a no-op when no cache
        directory is configured via ``LIBROSA_CACHE_DIR``.
        """
        self.memory.clear(*args, **kwargs)

    def eval(self, *args: Any, **kwargs: Any):
        """Evaluate ``func(*args, **kwargs)`` through the cache.

        Delegates to ``joblib.Memory.eval``: returns the memoized result
        when the call signature has been seen before, otherwise computes
        and stores it.  Useful for caching a one-off computation without
        decorating its function; behaves like a plain call when caching
        is disabled.
        """
        return self.memory.eval(*args, **kwargs)

    def format(self, *args: Any, **kwargs: Any):
        """Render an object for cache diagnostics.

        Delegates to ``joblib.Memory.format`` — the pretty-printer
        joblib uses in its own tracebacks and verbose logs.  Exposed for
        parity with the reference's cache wrapper, which forwards the
        full joblib Memory surface (reference _cache.py).
        """
        return self.memory.format(*args, **kwargs)

    def reduce_size(self, *args: Any, **kwargs: Any) -> None:
        """Shrink the on-disk cache toward its configured limits.

        Delegates to ``joblib.Memory.reduce_size``: evicts least-recently
        used entries until the store fits ``bytes_limit`` /
        ``items_limit`` / ``age_limit``.  Call periodically from
        long-running services if a cache directory is configured; no-op
        otherwise.
        """
        self.memory.reduce_size(*args, **kwargs)

    def warn(self, *args: Any, **kwargs: Any) -> None:
        """Emit a warning through joblib's cache logging machinery.

        Delegates to ``joblib.Memory.warn`` so messages carry the same
        formatting and verbosity gating as joblib's own cache
        diagnostics.  Exposed for parity with the reference's cache
        wrapper, which forwards the full joblib Memory surface.
        """
        self.memory.warn(*args, **kwargs)


# Environment-configured instance (parity: _cache.py:85-91)
cache = CacheManager(
    os.environ.get("LIBROSA_CACHE_DIR", None),
    mmap_mode=os.environ.get("LIBROSA_CACHE_MMAP", None),
    compress=os.environ.get("LIBROSA_CACHE_COMPRESS", False),
    verbose=int(os.environ.get("LIBROSA_CACHE_VERBOSE", 0)),
    level=int(os.environ.get("LIBROSA_CACHE_LEVEL", 10)),
)
