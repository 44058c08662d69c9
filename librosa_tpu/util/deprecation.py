"""Deprecation helpers. Parity: reference ``librosa/util/deprecation.py``."""

from __future__ import annotations

import warnings
from typing import Any

__all__ = ["Deprecated", "rename_kw"]


class Deprecated:
    """A sentinel class for deprecated parameter defaults. Parity: :10."""

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
    """Handle renamed arguments. Parity: :18."""
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
