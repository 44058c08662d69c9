"""Deprecation helpers. Parity: reference ``librosa/util/deprecation.py``."""

from __future__ import annotations

import warnings
from typing import Any

__all__ = ["Deprecated", "rename_kw"]


class Deprecated:
    """Sentinel default for parameters pending removal.

    A parameter whose default is a ``Deprecated`` instance can be
    distinguished from every real value the caller might pass, letting
    :func:`rename_kw` decide whether the old spelling was actually
    supplied.

    Examples
    --------
    >>> from librosa_tpu.util.deprecation import Deprecated
    >>> repr(Deprecated())
    '<DEPRECATED parameter>'

    Parity: reference util/deprecation.py:10.
    """

    def __repr__(self) -> str:
        return "<DEPRECATED parameter>"


def rename_kw(
    *,
    old_name: str,
    old_value: Any,
    new_name: str,
    new_value: Any,
    version_deprecated: str,
    version_removed: str,
) -> Any:
    """Resolve a renamed keyword argument, warning when the old name is used.

    Returns ``new_value`` when the old parameter was left at its
    ``Deprecated`` default; otherwise emits a ``FutureWarning`` naming
    the deprecation/removal versions and returns ``old_value``.

    Parameters
    ----------
    old_name, new_name : str
        parameter names for the warning text
    old_value : Any
        value of the deprecated parameter (``Deprecated()`` if unused)
    new_value : Any
        value of the replacement parameter
    version_deprecated, version_removed : str
        versions for the warning text

    Returns
    -------
    value : Any
        whichever value should take effect

    Parity: reference util/deprecation.py:18.
    """
    if isinstance(old_value, Deprecated):
        return new_value
    warnings.warn(
        f"{old_name} parameter is deprecated in version {version_deprecated}."
        f"\n\tIt will be removed in version {version_removed}."
        f"\n\tUse {new_name} instead.",
        FutureWarning,
        stacklevel=3,
    )
    return old_value
