"""Core DSP layer (L2)."""

from .convert import *  # noqa: F401,F403
from .audio import *  # noqa: F401,F403
from .spectrum import *  # noqa: F401,F403
from .pitch import estimate_tuning, pitch_tuning, piptrack, yin, pyin  # noqa: F401
