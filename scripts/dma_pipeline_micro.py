"""Standalone double-buffered HBM->VMEM DMA pipeline micro-benchmark.

Reproduces the production kernel's input-copy pattern in isolation: the
same (144, 512) f32 per-tile copy, the same two-slot double buffer, the
same any-source wait descriptor, an in-jit reshape of a flat operand
(like the production wrapper), and a sublane-offset read probe.

Round-5 finding (ROOFLINE.md): this pipeline sustains 2.3-2.8 us/tile
(104-117 GB/s effective, working-set independent up to 384 MB — fully
cold-streamed), while the production kernel's measured DMA-wait line is
~8 us/tile (~36 GB/s effective).  The gap is therefore NOT the DMA
engine, descriptor form, conditional sources, VMEM table operands,
operand layout, or HBM cold-read rate (each tested; see ROOFLINE.md) —
it lives in the full kernel's structure, and this file is the A/B
baseline for finding it in round 6.

Usage: python scripts/dma_pipeline_micro.py [WRAP]
(WRAP = distinct tile starts; buffer is ~(WRAP*128+144)*2KB.)
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("device:", jax.devices()[0], flush=True)
ROWS, HOP = 144, 512          # the production per-tile copy: 0.295 MB
N_TILES = 4096
WRAP = int(sys.argv[1]) if len(sys.argv) > 1 else 128
TT = 128

def kernel(rows_hbm, out_ref, ybufs, sems):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def start(tile, slot):
        base = pl.multiple_of(jax.lax.rem(tile, WRAP) * TT, 8)
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(base, ROWS), :], ybufs.at[slot], sems.at[slot]
        ).start()

    slot = jax.lax.rem(i, 2)
    @pl.when(i == 0)
    def _():
        start(0, 0)
    @pl.when(i + 1 < n)
    def _():
        start(i + 1, jax.lax.rem(i + 1, 2))
    pltpu.make_async_copy(
        rows_hbm.at[pl.ds(0, ROWS), :], ybufs.at[slot], sems.at[slot]
    ).wait()
    # touch the landed data (sum) so nothing is elided
    out_ref[:] = jnp.sum(ybufs[slot].reshape(ROWS, HOP), axis=0,
                         keepdims=True)

@functools.partial(jax.jit)
def run(rows_flat):
    rows = rows_flat.reshape(-1, HOP)
    return pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, HOP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, HOP), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, HOP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
    )(rows)

rows = jnp.asarray(
    np.random.RandomState(0).randn((WRAP * TT + ROWS) * HOP).astype(np.float32))
_ = float(jnp.sum(run(rows)))
best = float("inf")
for _ in range(4):
    t0 = time.perf_counter()
    for _ in range(3):
        r = run(rows)
    _ = float(jnp.sum(r))
    best = min(best, (time.perf_counter() - t0) / 3)
per_tile = best / N_TILES
mb = ROWS * HOP * 4 / 1e6
print(f"pure DMA pipeline: {per_tile*1e6:.2f} us/tile "
      f"({mb/per_tile/1e3:.0f} GB/s effective)", flush=True)
