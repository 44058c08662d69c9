"""Exception classes for librosa_tpu.

Parity with reference ``librosa/util/exceptions.py``.
"""

from __future__ import annotations

__all__ = ["LibrosaError", "ParameterError"]


class LibrosaError(Exception):
    """The root exception class for librosa_tpu."""


class ParameterError(LibrosaError):
    """Exception class for malformed input parameters."""
