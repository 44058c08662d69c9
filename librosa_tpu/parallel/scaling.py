"""Scaling-efficiency harness.

Measures sharded-melspectrogram throughput across device counts and
reports efficiency relative to linear scaling from the 1-device run —
the BASELINE target is ≥85% from 1 chip → 1 host → N hosts.  On real
pods the mesh axes ride ICI; in CI the same harness runs on an
8-virtual-device CPU mesh to validate the sharding path end to end
(absolute numbers there are meaningless; the seam-free property is
checked separately in tests/test_parallel.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import make_mesh
from .sharded import melspectrogram_sharded

__all__ = ["ScalingPoint", "scaling_report"]


@dataclass
class ScalingPoint:
    """One measured point on the weak-scaling curve.

    Produced by :func:`scaling_report`: throughput of a time-sharded
    chain at a given mesh size, with efficiency relative to linear
    scaling from the smallest measured mesh.  Efficiency 1.0 means the
    mesh processes D× the audio in the same wall time as one device;
    the expected deviation is the halo-exchange communication derived in
    SCALING.md (negligible on ICI for every chain in this package, so a
    sub-0.85 value on real hardware indicates a layout problem, not an
    algorithmic cost).

    Attributes
    ----------
    n_devices : int — mesh size measured
    samples_per_s : float — audio throughput at this size
    efficiency : float — ratio to linear scaling from the smallest mesh
    """

    n_devices: int
    samples_per_s: float
    efficiency: float  # vs linear scaling from the smallest mesh


def scaling_report(
    *,
    device_counts: Optional[Sequence[int]] = None,
    seconds_per_device: float = 60.0,
    sr: int = 22050,
    n_fft: int = 2048,
    hop_length: int = 512,
    iters: int = 3,
) -> List[ScalingPoint]:
    """Measure weak scaling of the time-sharded melspectrogram.

    Work per device is held constant: each device gets
    ``seconds_per_device`` of audio, so perfect scaling keeps per-run
    wall time flat and samples/s grows linearly with the mesh.  Run on
    real multi-chip hardware this produces the measured companion to
    SCALING.md's analytic efficiency model; on the CPU test mesh it
    validates the harness (virtual devices share one socket, so absolute
    efficiencies there are not meaningful).

    Parameters
    ----------
    device_counts : sequence of int or None
        mesh sizes to measure (default: powers of two up to available)
    seconds_per_device : float
        audio seconds per device (weak-scaling grain)
    sr, n_fft, hop_length : analysis parameters
    iters : int
        timing repetitions per point (best is kept)

    Returns
    -------
    points : list of :class:`ScalingPoint`, one per mesh size
    """
    avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8) if d <= avail]

    rng = np.random.RandomState(0)
    points: List[ScalingPoint] = []
    base_rate = None

    for d in device_counts:
        # shard length must divide evenly: round to d * hop
        n = int(seconds_per_device * sr) * d
        n -= n % (d * hop_length)
        y = jnp.asarray(rng.randn(n).astype(np.float32))
        mesh = make_mesh((d,), ("time",))

        def run():
            out = melspectrogram_sharded(
                y, mesh=mesh, n_fft=n_fft, hop_length=hop_length
            )
            return float(jnp.sum(out))

        run()  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            s = run()
        dt = (time.perf_counter() - t0) / iters
        rate = n / dt
        if base_rate is None:
            base_rate = rate / d
        points.append(
            ScalingPoint(
                n_devices=d,
                samples_per_s=rate,
                efficiency=rate / (base_rate * d),
            )
        )
    return points


if __name__ == "__main__":
    for p in scaling_report(seconds_per_device=30.0):
        print(
            f"{p.n_devices:2d} devices: {p.samples_per_s / 1e6:9.1f} "
            f"Msamples/s  efficiency {100 * p.efficiency:5.1f}%"
        )
