"""Tracing and roofline accounting.

The reference library has no instrumentation (SURVEY §5); this subsystem is
new.  Three pieces:

- :func:`trace` / :func:`annotate` — thin wrappers over ``jax.profiler``
  so pipelines can emit TensorBoard-compatible traces.
- :func:`calibrate` — measures THIS device's achievable matmul FLOP/s and
  HBM bandwidth (the tunnel-attached TPU in this environment runs well
  below datasheet numbers, so rooflines must be measured, not assumed).
- :func:`roofline` — times a jitted function, pulls FLOP/byte counts from
  XLA's cost analysis, and reports utilization against the calibrated
  (or supplied) ceilings.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import numpy as np

__all__ = [
    "trace",
    "annotate",
    "calibrate",
    "roofline",
    "dispatch_profile",
    "DeviceCeilings",
    "RooflineReport",
]


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager: profile the enclosed block into ``log_dir``.

    Wraps ``jax.profiler.start_trace``/``stop_trace`` so a pipeline can
    emit a TensorBoard/XProf-compatible device trace around any region.

    Parameters
    ----------
    log_dir : str
        directory to write the trace into

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> with lt.util.profiling.trace('/tmp/trace'):   # doctest: +SKIP
    ...     _ = lt.stft(y)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Context manager: a named region on the device trace timeline.

    Wrap a stage of a longer pipeline so its spans group under ``name``
    in the trace viewer when running inside :func:`trace` — e.g.
    ``with annotate("cqt ladder"): C = lt.cqt(...)`` makes the ladder's
    launches attributable at a glance.  Annotations nest, cost nothing
    when no trace is active, and work on every backend.

    Parameters
    ----------
    name : str
        label shown in the trace viewer for the enclosed work

    Returns
    -------
    ctx : context manager
        a ``jax.profiler.TraceAnnotation``

    Examples
    --------
    >>> from librosa_tpu.util import profiling
    >>> with profiling.annotate("warmup"):
    ...     pass
    """
    import jax

    return jax.profiler.TraceAnnotation(name)


def dispatch_profile(fn: Callable[[], Any], *, warmup: int = 1) -> dict:
    """Count device program launches in one call of ``fn``.

    Over the tunnel-attached TPU every program launch costs ~20 ms of
    dispatch latency regardless of its compute, so the *number* of
    launches — not their FLOPs — dominates small-input analysis chains
    (beat tracking, pyin on seconds of audio).  The count is a property
    of the program structure, identical on every backend, so chains can
    be dispatch-profiled on the local CPU while the TPU is busy.

    Runs ``fn`` ``warmup`` times (compiles drop out), then once more
    under ``jax.profiler.trace`` and parses the trace-viewer JSON:

    - an ``…Executable::Execute`` event inside a ``PjitFunction(name)``
      span is a launch of the jitted program ``name``;
    - a bare ``…Executable::Execute`` is an *eager* op dispatch — one
      full tunnel round trip for a single primitive;
    - ``TransferToDevice`` / ``CopyToHost``-style events are
      host↔device crossings.

    Returns ``{"launches": int, "eager": int, "transfers": int,
    "by_function": {name: count}}``.
    """
    import glob
    import gzip
    import json
    import shutil
    import tempfile

    import jax

    for _ in range(warmup):
        fn()
    tmpdir = tempfile.mkdtemp(prefix="dispatch_profile_")
    try:
        with jax.profiler.trace(tmpdir):
            fn()
        paths = glob.glob(f"{tmpdir}/**/*.trace.json.gz", recursive=True)
        if not paths:
            return {"error": "no trace produced"}
        events = json.load(gzip.open(paths[0]))["traceEvents"]
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)

    spans = []      # (tid, t0, t1, jit name)
    execs = []      # (tid, t0)
    transfers = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        name = str(e.get("name", ""))
        if name.startswith("PjitFunction(") or name.startswith(
            "PmapFunction("
        ):
            spans.append(
                (e.get("tid"), e["ts"], e["ts"] + e.get("dur", 0),
                 name.split("(", 1)[1].rstrip(")"))
            )
        elif "Executable::Execute" in name and "Helper" not in name:
            execs.append((e.get("tid"), e["ts"]))
        elif ("TransferToDevice" in name or "CopyToHost" in name
              or "BufferFromHost" in name or "TransferFromDevice" in name):
            transfers += 1

    by_function: dict = {}
    eager = 0
    for tid, ts in execs:
        owners = [s for s in spans if s[0] == tid and s[1] <= ts <= s[2]]
        if owners:
            # innermost enclosing jit span
            owner = min(owners, key=lambda s: s[2] - s[1])[3]
            by_function[owner] = by_function.get(owner, 0) + 1
        else:
            eager += 1
            by_function["<eager>"] = by_function.get("<eager>", 0) + 1
    return {
        "launches": len(execs),
        "eager": eager,
        "transfers": transfers,
        "by_function": dict(
            sorted(by_function.items(), key=lambda kv: -kv[1])
        ),
    }


@dataclass
class DeviceCeilings:
    """Measured achievable performance ceilings for one device.

    Produced by :func:`calibrate` and consumed by :func:`roofline` as
    the denominator of every utilization figure.  The fields are
    *measured* sustained rates — each probe chains many dependent ops
    inside ONE jitted program, so per-launch dispatch latency (which
    dominates single-op timings over a remote link) cancels out of the
    estimate.  They are deliberately not datasheet numbers: on the
    tunnel-attached TPU in this environment the achievable and
    advertised rates differ by 5–10×, and a roofline computed against
    the datasheet would call every kernel "slow" regardless of quality.

    Attributes
    ----------
    matmul_f32_flops : float
        sustained ``Precision.HIGHEST`` float32 matmul FLOP/s
    matmul_bf16_flops : float
        sustained default-precision (bf16-multiply) matmul FLOP/s
    hbm_bytes_per_s : float
        sustained elementwise read+write HBM bandwidth
    """

    matmul_f32_flops: float      # HIGHEST-precision f32 matmul FLOP/s
    matmul_bf16_flops: float     # default-precision matmul FLOP/s
    hbm_bytes_per_s: float       # elementwise read+write bandwidth


def calibrate(
    device: Any = None, *, size: int = 4096, chain: int = 16,
    include_bf16: bool = True,
) -> DeviceCeilings:
    """Measure matmul throughput and HBM bandwidth on ``device``.

    Each probe chains ``chain`` dependent operations inside ONE jitted
    program: over the axon tunnel a single dispatch costs ~20 ms, so a
    lone matmul (sub-ms of compute) measures the tunnel, not the chip.

    Parameters
    ----------
    device : jax.Device or None
        device to probe (default: first available)
    size : int
        square matmul operand size for the FLOP probes
    chain : int
        dependent ops per program (amortizes dispatch)
    include_bf16 : bool
        also probe default-precision (bf16 MXU) matmul

    Returns
    -------
    ceilings : DeviceCeilings
        measured f32/bf16 matmul FLOP/s and HBM bytes/s

    See Also
    --------
    roofline, DeviceCeilings
    """
    import jax
    import jax.numpy as jnp

    if device is None:
        device = jax.devices()[0]

    rng = np.random.RandomState(0)
    a = jax.device_put(rng.randn(size, size).astype(np.float32), device)
    # unit-spectral-radius-ish rhs keeps the chained product bounded
    b = jax.device_put(
        (rng.randn(size, size) / np.sqrt(size)).astype(np.float32), device
    )

    def _chain_mm(precision):
        @jax.jit
        def run(x):
            def body(_, acc):
                return jnp.matmul(acc, b, precision=precision)

            return jax.lax.fori_loop(0, chain, body, x)

        return run

    def _time(f, arg, iters=3):
        r = f(arg)
        _ = float(jnp.sum(r))
        t0 = time.perf_counter()
        for _i in range(iters):
            r = f(arg)
        _ = float(jnp.sum(r))
        return (time.perf_counter() - t0) / iters

    flops = chain * 2 * size**3
    t_hi = _time(_chain_mm(jax.lax.Precision.HIGHEST), a)
    t_lo = _time(_chain_mm(jax.lax.Precision.DEFAULT), a) if include_bf16 else None

    # Bandwidth probe: roll + scale cannot fuse across iterations, so each
    # step is one full read + write of the buffer.
    x = jax.device_put(rng.randn(1 << 25).astype(np.float32), device)

    @jax.jit
    def ew(v):
        def body(_, y):
            return jnp.roll(y, 12345) * 1.0000001

        return jax.lax.fori_loop(0, chain, body, v)

    t_ew = _time(ew, x, iters=3)

    return DeviceCeilings(
        matmul_f32_flops=flops / t_hi,
        matmul_bf16_flops=flops / t_lo if t_lo else float("nan"),
        hbm_bytes_per_s=chain * 2 * x.nbytes / t_ew,
    )


@dataclass
class RooflineReport:
    """Timing + utilization report for one jitted function.

    Produced by :func:`roofline`: wall time, achieved FLOP/s and HBM
    bandwidth (from the XLA cost analysis of the compiled program), and
    each as a fraction of the *measured* :class:`DeviceCeilings` — so
    "83% compute utilization" means 83% of what this device has actually
    been measured to sustain, not of a datasheet number.  ``bound``
    names the limiting resource under those ceilings, telling you
    whether further fusion (memory-bound) or better MXU shaping
    (compute-bound) is the profitable next step.  ``str()`` renders a
    one-line summary.
    """

    seconds: float
    flops: Optional[float]
    bytes_accessed: Optional[float]
    achieved_flops: Optional[float]
    achieved_bandwidth: Optional[float]
    compute_utilization: Optional[float]   # vs matmul_f32 ceiling
    bandwidth_utilization: Optional[float]
    bound: str                             # 'compute' | 'memory' | 'unknown'

    def __str__(self) -> str:
        def fmt(v, unit, scale):
            return "n/a" if v is None else f"{v / scale:.2f} {unit}"

        return (
            f"time {self.seconds * 1e3:.2f} ms | "
            f"{fmt(self.achieved_flops, 'TF/s', 1e12)} "
            f"({'' if self.compute_utilization is None else f'{100 * self.compute_utilization:.0f}%'} of ceiling) | "
            f"{fmt(self.achieved_bandwidth, 'GB/s', 1e9)} "
            f"({'' if self.bandwidth_utilization is None else f'{100 * self.bandwidth_utilization:.0f}%'}) | "
            f"{self.bound}-bound"
        )


def roofline(
    fn: Callable,
    *args: Any,
    ceilings: Optional[DeviceCeilings] = None,
    iters: int = 3,
    **kwargs: Any,
) -> RooflineReport:
    """Time ``jit(fn)(*args)`` and relate it to the device rooflines.

    FLOP/byte counts come from XLA's compiled cost analysis; ``ceilings``
    defaults to a fresh :func:`calibrate` run.

    Parameters
    ----------
    fn : callable
        function to profile (jitted here)
    *args
        example inputs
    ceilings : DeviceCeilings or None
        measured ceilings to compare against
    iters : int
        timing repetitions (best is kept)

    Returns
    -------
    report : RooflineReport
        achieved FLOP/s, bandwidth, utilizations, and the binding limit
    """
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(fn)
    lowered = jfn.lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = cost.get("flops")
    bytes_accessed = cost.get("bytes accessed")

    out = jfn(*args, **kwargs)
    _ = jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _i in range(iters):
        out = jfn(*args, **kwargs)
    _ = jax.block_until_ready(out)
    seconds = (time.perf_counter() - t0) / iters

    if ceilings is None:
        ceilings = calibrate()

    achieved_flops = None if flops is None else flops / seconds
    achieved_bw = None if bytes_accessed is None else bytes_accessed / seconds
    cu = (
        None
        if achieved_flops is None
        else achieved_flops / ceilings.matmul_f32_flops
    )
    bu = (
        None
        if achieved_bw is None
        else achieved_bw / ceilings.hbm_bytes_per_s
    )
    if cu is None and bu is None:
        bound = "unknown"
    elif (cu or 0) >= (bu or 0):
        bound = "compute"
    else:
        bound = "memory"

    return RooflineReport(
        seconds=seconds,
        flops=flops,
        bytes_accessed=bytes_accessed,
        achieved_flops=achieved_flops,
        achieved_bandwidth=achieved_bw,
        compute_utilization=cu,
        bandwidth_utilization=bu,
        bound=bound,
    )
