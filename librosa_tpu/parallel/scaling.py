"""Scaling-efficiency harness.

Measures time-sharded chain throughput across device counts and reports
efficiency relative to linear scaling from the 1-device run — the
BASELINE target is ≥85% from 1 chip → 1 host → N hosts.  Every sharded
entry point in :mod:`librosa_tpu.parallel` has a row (SCALING.md carries
the matching analytic communication model per chain).  On real pods the
mesh axes ride ICI; in CI the same harness runs on an 8-virtual-device
CPU mesh to validate the sharding path end to end (absolute numbers
there are meaningless; the seam-free property is checked separately in
tests/test_parallel.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import make_mesh
from .sharded import melspectrogram_sharded, stft_sharded

__all__ = ["ScalingPoint", "scaling_report", "scaling_report_all", "CHAINS"]


def _sync(out) -> float:
    """Force completion of a chain output (array, tuple, or host value)."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(out):
        arr = np.asarray(leaf)
        if np.iscomplexobj(arr):
            arr = np.abs(arr)
        total += float(np.nansum(arr.astype(np.float64)))
    return total


def _make_chains():
    """Runner per sharded entry point: (y, mesh, sr, n_fft, hop) → output."""
    from .analysis import (
        beat_track_sharded,
        chroma_cqt_sharded,
        mfcc_sharded,
        onset_strength_sharded,
        pcen_sharded,
        pyin_sharded,
        tempo_sharded,
    )
    from .constantq import cqt_sharded
    from .effects import hpss_sharded

    return {
        "stft": lambda y, mesh, sr, n_fft, hop: stft_sharded(
            y, mesh=mesh, n_fft=n_fft, hop_length=hop
        ),
        "melspectrogram": lambda y, mesh, sr, n_fft, hop: melspectrogram_sharded(
            y, mesh=mesh, n_fft=n_fft, hop_length=hop
        ),
        "onset_strength": lambda y, mesh, sr, n_fft, hop: onset_strength_sharded(
            y, mesh=mesh, sr=sr, hop_length=hop
        ),
        "tempo": lambda y, mesh, sr, n_fft, hop: tempo_sharded(
            y, mesh=mesh, sr=sr, hop_length=hop
        ),
        "pcen": lambda y, mesh, sr, n_fft, hop: pcen_sharded(
            melspectrogram_sharded(y, mesh=mesh, n_fft=n_fft, hop_length=hop),
            mesh=mesh, sr=sr, hop_length=hop,
        ),
        "cqt": lambda y, mesh, sr, n_fft, hop: cqt_sharded(
            y, mesh=mesh, sr=sr, hop_length=hop
        ),
        "hpss": lambda y, mesh, sr, n_fft, hop: hpss_sharded(y, mesh=mesh),
        "pyin": lambda y, mesh, sr, n_fft, hop: pyin_sharded(
            y, mesh=mesh, sr=sr, fmin=65, fmax=2093
        ),
        "beat_track": lambda y, mesh, sr, n_fft, hop: beat_track_sharded(
            y, mesh=mesh, sr=sr, hop_length=hop
        ),
        "mfcc": lambda y, mesh, sr, n_fft, hop: mfcc_sharded(
            y, mesh=mesh, sr=sr, n_fft=n_fft, hop_length=hop
        ),
        "chroma_cqt": lambda y, mesh, sr, n_fft, hop: chroma_cqt_sharded(
            y, mesh=mesh, sr=sr, hop_length=hop
        ),
    }


CHAINS: dict = {}
"""Name → runner for every sharded entry point (populated lazily)."""


def _chains():
    if not CHAINS:
        CHAINS.update(_make_chains())
    return CHAINS


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
    chain: str = "melspectrogram"


def scaling_report(
    *,
    chain: str = "melspectrogram",
    device_counts: Optional[Sequence[int]] = None,
    seconds_per_device: float = 60.0,
    sr: int = 22050,
    n_fft: int = 2048,
    hop_length: int = 512,
    iters: int = 3,
) -> List[ScalingPoint]:
    """Measure weak scaling of one time-sharded analysis chain.

    Work per device is held constant: each device gets
    ``seconds_per_device`` of audio, so perfect scaling keeps per-run
    wall time flat and samples/s grows linearly with the mesh.  Run on
    real multi-chip hardware this produces the measured companion to
    SCALING.md's analytic efficiency model; on the CPU test mesh it
    validates the harness (virtual devices share one socket, so absolute
    efficiencies there are not meaningful).

    Parameters
    ----------
    chain : str
        which sharded entry point to measure — any key of ``CHAINS``
        (stft, melspectrogram, onset_strength, tempo, pcen, cqt, hpss,
        pyin, beat_track, mfcc, chroma_cqt)
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
    runners = _chains()
    if chain not in runners:
        raise ValueError(
            f"Unknown chain {chain!r}; choose one of {sorted(runners)}"
        )
    runner = runners[chain]

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
            return _sync(runner(y, mesh, sr, n_fft, hop_length))

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
                chain=chain,
            )
        )
    return points


def scaling_report_all(
    *,
    chains: Optional[Sequence[str]] = None,
    **kwargs,
) -> List[ScalingPoint]:
    """Run :func:`scaling_report` for every sharded entry point.

    One weak-scaling sweep per chain (all of ``CHAINS`` by default),
    concatenated — the measured companion to SCALING.md's per-chain
    communication table.  Heavy chains (pyin, hpss) dominate the wall
    time; pass ``chains=[...]`` and/or a smaller ``seconds_per_device``
    for a quick look.

    Parameters
    ----------
    chains : sequence of str or None
        chain names to measure (default: all)
    **kwargs
        forwarded to :func:`scaling_report`

    Returns
    -------
    points : list of :class:`ScalingPoint` across all measured chains
    """
    points: List[ScalingPoint] = []
    for name in chains if chains is not None else sorted(_chains()):
        points.extend(scaling_report(chain=name, **kwargs))
    return points


if __name__ == "__main__":
    import sys

    names = sys.argv[1:] or ["melspectrogram"]
    if names == ["all"]:
        names = sorted(_chains())
    for name in names:
        for p in scaling_report(chain=name, seconds_per_device=30.0):
            print(
                f"{p.chain:>15s} {p.n_devices:2d} devices: "
                f"{p.samples_per_s / 1e6:9.1f} Msamples/s  "
                f"efficiency {100 * p.efficiency:5.1f}%"
            )
