"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

__all__ = ["make_mesh", "time_mesh"]


def make_mesh(
    shape: Sequence[int], axis_names: Sequence[str], *, devices=None
) -> Mesh:
    """Create a device mesh with the given logical shape and axis names."""
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"Mesh of shape {tuple(shape)} needs {n} devices; "
            f"only {len(devices)} available"
        )
    dev_array = mesh_utils.create_device_mesh(tuple(shape), devices=devices[:n])
    return Mesh(dev_array, tuple(axis_names))


def time_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the time axis (overlap-save sharding of long signals)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return make_mesh((n_devices,), ("time",), devices=devices)
