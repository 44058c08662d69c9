"""Exception classes for librosa_tpu.

Parity with reference ``librosa/util/exceptions.py``.
"""

from __future__ import annotations

__all__ = ["LibrosaError", "ParameterError"]


class LibrosaError(Exception):
    """Root exception for all errors raised by librosa_tpu.

    Catching ``LibrosaError`` is the supported way to handle any
    library-originated failure without also swallowing unrelated
    exceptions (IO errors, JAX tracer errors, keyboard interrupts).
    The class carries no behavior of its own — it exists purely as the
    top of the library's exception hierarchy, with
    :class:`ParameterError` as its concrete subclass.
    Parity: reference util/exceptions.py.
    """


class ParameterError(LibrosaError):
    """Raised when an input parameter is malformed or out of range.

    Every public entry point validates its arguments and reports misuse
    through this type — a non-positive ``hop_length``, an ``fmin`` past
    Nyquist, audio that is not floating-point, an unknown mode string —
    mirroring the reference's error contract, so user code and the test
    suite can assert on it precisely with
    ``pytest.raises(lt.ParameterError)`` rather than a bare Exception.
    Parity: reference util/exceptions.py.
    """
