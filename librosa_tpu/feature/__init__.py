"""Feature extraction layer (L4)."""

from .spectral import *  # noqa: F401,F403
from .utils import delta, stack_memory  # noqa: F401
