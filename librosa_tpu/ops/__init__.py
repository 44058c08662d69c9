"""TPU-native compute kernels (Pallas / lax) underlying the public API."""

from . import framing, transforms  # noqa: F401
