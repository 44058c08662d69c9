"""Shared type aliases for the public API (reference ``librosa/_typing.py``).

These are behavioral documentation as much as typing: the alias names match
the reference's so downstream annotations translate directly.  JAX arrays
satisfy ``ArrayLike`` via the buffer protocol, so the aliases admit both
``np.ndarray`` and ``jax.Array`` values.
"""

from __future__ import annotations

from typing import Any, Callable, Generator, Literal, Sequence, Union

import numpy as np

# window specifications: name, (name, param), scalar beta, callable, or array
_WindowSpec = Union[
    str,
    "tuple[Any, ...]",
    float,
    Callable[[int], np.ndarray],
    np.ndarray,
    Sequence[float],
]

_IterableLike = Union[list, tuple, Generator]
_SequenceLike = Union[Sequence, np.ndarray]

_BoolLike_co = Union[bool, np.bool_]
_IntLike_co = Union[bool, int, np.integer, np.bool_]
_FloatLike_co = Union[float, np.floating, np.integer, np.bool_]
_ComplexLike_co = Union[complex, np.number, np.bool_]
_ScalarLike_co = Union[complex, str, bytes, np.generic]

# general ndarray padding modes
_ModeKind = Literal[
    "constant",
    "edge",
    "linear_ramp",
    "maximum",
    "mean",
    "median",
    "minimum",
    "reflect",
    "symmetric",
    "wrap",
    "empty",
]

# head/tail padding modes legal for STFT centering (modes that only need
# local context; reference ``_typing.py:60``)
_STFTPad = Literal[
    "constant",
    "edge",
    "linear_ramp",
    "reflect",
    "symmetric",
    "empty",
]

_PadMode = Union[_ModeKind, Callable[..., Any]]
_PadModeSTFT = Union[_STFTPad, Callable[..., Any]]
