"""API lifecycle decorators. Parity: reference ``librosa/util/decorators.py``."""

from __future__ import annotations

import functools
import warnings
from typing import Any, Callable, TypeVar

import numpy as np

__all__ = ["moved", "deprecated", "vectorize"]

F = TypeVar("F", bound=Callable[..., Any])


def moved(*, moved_from: str, version: str, version_removed: str) -> Callable[[F], F]:
    """Decorator: mark a function as moved or renamed.

    Calls through the old name keep working but emit a ``FutureWarning``
    naming the new location and the removal version — the reference's
    alias-deprecation machinery (``util/decorators.py:28``).

    Parameters
    ----------
    moved_from : str
        fully qualified old name, shown in the warning
    version : str
        version in which the function moved
    version_removed : str
        version in which the alias will stop working

    Returns
    -------
    decorator : callable
        wraps the relocated function

    See Also
    --------
    deprecated
    """

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
    """Decorator: mark a function as deprecated.

    The wrapped function still runs, but every call emits a
    ``FutureWarning`` announcing the removal version (reference
    ``util/decorators.py:65``).

    Parameters
    ----------
    version : str
        version in which the function was deprecated
    version_removed : str
        version in which it will be removed

    Returns
    -------
    decorator : callable

    See Also
    --------
    moved
    """

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


def vectorize(
    *, otypes: Any = None, doc: Any = None, excluded: Any = None,
    cache: bool = False, signature: Any = None,
):
    """Decorator: ``np.vectorize`` that preserves the wrapped docstring.

    Plain ``np.vectorize`` replaces ``__doc__`` with its own; this
    variant keeps the original function's documentation while gaining
    element-wise broadcasting over array arguments (reference
    ``util/decorators.py:98``).

    Parameters
    ----------
    otypes, excluded, signature
        forwarded to ``np.vectorize``

    Returns
    -------
    decorator : callable
    """

    def __wrapper(function: F) -> F:
        vecfunc = np.vectorize(
            function, otypes=otypes, doc=doc, excluded=excluded,
            cache=cache, signature=signature,
        )
        return functools.wraps(function)(vecfunc)  # type: ignore[return-value]

    return __wrapper


def future_default(
    *, param_name: str, old_default: Any, new_default: Any, version: str
):
    """Decorator: warn when a caller relies on a default scheduled to change.

    If the decorated function is called WITHOUT the named parameter, a
    ``FutureWarning`` announces the upcoming default change; explicit
    callers are untouched (reference ``util/decorators.py:160``).

    Parameters
    ----------
    param_name : str
        the parameter whose default will change
    old_default, new_default
        current and future default values (shown in the warning)
    version : str
        version in which the new default takes effect

    Returns
    -------
    decorator : callable
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
