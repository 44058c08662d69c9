"""API lifecycle decorators. Parity: reference ``librosa/util/decorators.py``."""

from __future__ import annotations

import functools
import inspect
import warnings
from typing import Any, Callable, TypeVar

import numpy as np

__all__ = ["moved", "deprecated", "vectorize"]

F = TypeVar("F", bound=Callable[..., Any])


def _lifecycle_notice(text: str) -> None:
    """Emit one API-lifecycle FutureWarning, attributed to the caller of
    the wrapped function (two frames up: user code -> wrapper -> here)."""
    warnings.warn(text, FutureWarning, stacklevel=3)


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
        new_home = f"{func.__module__}.{func.__name__}"

        @functools.wraps(func)
        def _inner(*args: Any, **kwargs: Any) -> Any:
            _lifecycle_notice(
                f"{moved_from} is a backward-compatibility alias: the "
                f"function now lives at '{new_home}' (since {version}), "
                f"and the old name goes away in {version_removed}."
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
        qualified = f"{func.__module__}.{func.__name__}"

        @functools.wraps(func)
        def _inner(*args: Any, **kwargs: Any) -> Any:
            _lifecycle_notice(
                f"{qualified} has been deprecated since {version} and is "
                f"scheduled for removal in {version_removed}."
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

    def decorator(func):
        # Resolve, once, which positional slot (if any) can carry the
        # parameter — then each call is a cheap length/membership check
        # instead of a full signature bind.
        params = list(inspect.signature(func).parameters.values())
        slot = None
        for i, p in enumerate(params):
            if p.name == param_name and p.kind in (
                p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD
            ):
                slot = i
                break

        notice = (
            f"{func.__name__}() will switch its default "
            f"{param_name} from {old_default!r} to {new_default!r} in "
            f"version {version}; pass {param_name}={old_default!r} "
            "explicitly to keep today's behavior and silence this warning."
        )

        @functools.wraps(func)
        def __wrapper(*args, **kwargs):
            supplied = param_name in kwargs or (
                slot is not None and len(args) > slot
            )
            if not supplied:
                _lifecycle_notice(notice)
            return func(*args, **kwargs)

        return __wrapper

    return decorator
