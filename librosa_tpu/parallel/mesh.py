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
    """Create a ``jax.sharding.Mesh`` with a logical shape and axis names.

    Parameters
    ----------
    shape : sequence of int
        logical mesh extents, e.g. ``(2, 4)`` for 2-way data x 4-way time
    axis_names : sequence of str
        one name per mesh axis (used in ``PartitionSpec``s)
    devices : sequence of jax.Device or None
        devices to lay out (default: all available, in order)

    Returns
    -------
    mesh : jax.sharding.Mesh

    See Also
    --------
    time_mesh, pod_mesh
    """
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
    """1-D device mesh named ``time`` for overlap-save signal sharding.

    The axis every ``*_sharded`` analysis in this package shards over:
    each device owns a contiguous signal span and exchanges halo samples
    with its neighbors via ``ppermute`` (see ``parallel/sharded.py``).

    Parameters
    ----------
    n_devices : int or None
        mesh size (default: every visible device)

    Returns
    -------
    mesh : jax.sharding.Mesh

    See Also
    --------
    make_mesh, pod_mesh
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return make_mesh((n_devices,), ("time",), devices=devices)


def init_distributed(
    coordinator_address: Optional[str] = None,
    *,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Initialize multi-host JAX (SURVEY §2.3 "Target distributed components").

    Thin wrapper over ``jax.distributed.initialize``: on TPU pods the
    arguments are auto-detected from the environment, so a bare
    ``init_distributed()`` works on Cloud TPU; explicit
    coordinator/process arguments cover CPU/GPU clusters and tests.
    Safe to call at most once per process, before any backend use.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def pod_mesh(
    *,
    time_axis: Optional[int] = None,
    track_axis: int = 1,
) -> Mesh:
    """2-D (time, track) mesh over every device of a (multi-host) pod slice.

    The standard deployment layout for batch audio analysis: the
    ``track`` axis distributes independent recordings (embarrassingly
    parallel, no communication) and the ``time`` axis shards each
    recording for the seam-free halo-exchange chains in this package.
    ``time_axis`` defaults to ``n_devices // track_axis``.  The axis
    ORDER puts time innermost, so the neighbor-to-neighbor halo
    ``ppermute``s land between physically adjacent devices and ride ICI;
    only the (communication-free) track axis ever spans slice/DCN
    boundaries.

    Parameters
    ----------
    time_axis : int or None
        devices along the time axis (None = ``n_devices // track_axis``)
    track_axis : int
        devices along the track axis

    Returns
    -------
    mesh : jax.sharding.Mesh with axes ``("track", "time")``
    """
    devices = jax.devices()
    n = len(devices)
    if time_axis is None:
        if n % track_axis:
            raise ValueError(
                f"{n} devices not divisible by track_axis={track_axis}"
            )
        time_axis = n // track_axis
    return make_mesh((track_axis, time_axis), ("track", "time"))
