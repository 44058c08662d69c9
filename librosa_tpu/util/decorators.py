"""API lifecycle decorators. Parity: reference ``librosa/util/decorators.py``."""

from __future__ import annotations

import functools
import warnings
from typing import Any, Callable, TypeVar

import numpy as np

__all__ = ["moved", "deprecated", "vectorize"]

F = TypeVar("F", bound=Callable[..., Any])


def moved(*, moved_from: str, version: str, version_removed: str) -> Callable[[F], F]:
    """Mark a function as moved/renamed. Parity: util/decorators.py:28."""

    def __wrapper(func: F) -> F:
        @functools.wraps(func)
        def _inner(*args: Any, **kwargs: Any) -> Any:
            warnings.warn(
                f"{moved_from}\n\tThis function was moved to '{func.__module__}."
                f"{func.__name__}' in version {version}.\n\tThis alias will be "
                f"removed in version {version_removed}.",
                FutureWarning,
                stacklevel=2,
            )
            return func(*args, **kwargs)

        return _inner  # type: ignore[return-value]

    return __wrapper


def deprecated(*, version: str, version_removed: str) -> Callable[[F], F]:
    """Mark a function as deprecated. Parity: util/decorators.py:65."""

    def __wrapper(func: F) -> F:
        @functools.wraps(func)
        def _inner(*args: Any, **kwargs: Any) -> Any:
            warnings.warn(
                f"{func.__module__}.{func.__name__}\n\tDeprecated as of version "
                f"{version}.\n\tIt will be removed in version {version_removed}.",
                FutureWarning,
                stacklevel=2,
            )
            return func(*args, **kwargs)

        return _inner  # type: ignore[return-value]

    return __wrapper


def vectorize(*, otypes: Any = None, excluded: Any = None, signature: Any = None):
    """np.vectorize preserving docstrings. Parity: util/decorators.py:98."""

    def __wrapper(function: F) -> F:
        vecfunc = np.vectorize(
            function, otypes=otypes, excluded=excluded, signature=signature
        )
        return functools.wraps(function)(vecfunc)  # type: ignore[return-value]

    return __wrapper


def future_default(
    *, param_name: str, old_default: Any, new_default: Any, version: str
):
    """Warn when a caller relies on a default value scheduled to change.

    Parity: util/decorators.py:160 (future_default).
    """
    import inspect

    def decorator(func):
        sig = inspect.signature(func)

        @functools.wraps(func)
        def __wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            if param_name not in bound.arguments:
                warnings.warn(
                    f"The default value of '{param_name}' will change from "
                    f"{old_default!r} to {new_default!r} in version {version}. "
                    f"To suppress this warning, explicitly pass "
                    f"'{param_name}={old_default!r}'.",
                    FutureWarning,
                    stacklevel=2,
                )
            return func(*args, **kwargs)

        return __wrapper

    return decorator
