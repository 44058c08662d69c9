"""Exception classes for librosa_tpu.

Parity with reference ``librosa/util/exceptions.py``.
"""

from __future__ import annotations

__all__ = ["LibrosaError", "ParameterError"]


class LibrosaError(Exception):
    """Root exception for all errors raised by librosa_tpu.

    Catching ``LibrosaError`` is the supported way to handle any
    library-originated failure without also swallowing unrelated
    exceptions.  Parity: reference util/exceptions.py.
    """


class ParameterError(LibrosaError):
    """Raised when an input parameter is malformed or out of range.

    Every public entry point validates its arguments and reports
    misuse through this type (mirroring the reference's error
    contract), so tests can assert on it precisely.
    Parity: reference util/exceptions.py.
    """
