"""Utility layer (L0/L1)."""

from .utils import *  # noqa: F401,F403
from .exceptions import LibrosaError, ParameterError  # noqa: F401
from .files import example, ex, list_examples, example_info, find_files, cite  # noqa: F401
from .matching import match_intervals, match_events  # noqa: F401
from ._nnls import nnls  # noqa: F401
from .deprecation import Deprecated, rename_kw  # noqa: F401
from . import decorators, deprecation, exceptions, files  # noqa: F401
from . import profiling  # noqa: F401
