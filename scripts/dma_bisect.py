"""Bisect the DMA-wait gap: grow the pipeline micro toward the real kernel.

Round-5 state (ROOFLINE.md): the production kernel's frame-staging line
costs ~8 us/tile while `scripts/dma_pipeline_micro.py` — the same input
copy pattern in isolation — sustains 2.3-2.8 us/tile.  Seven hypotheses
were measured and ruled out; the remaining suspects are structures of
the FULL program's skeleton.  This script adds them one at a time:

  m0       the checked-in micro (fixed tiny output block)      ~2.6 us
  m_out    + the real OUTPUT grid: (128, 128) f32 block at revolving
           index (0, i) into a (128, n_tiles*128) buffer — each 64 KB
           copy-out is 128 strided chunks of 512 B
  m_outg4  output block widened to (128, 512), revisited 4 steps —
           copy-out every 4th step, 2 KB chunks
  m_outg8  (128, 1024), revisited 8 steps — 4 KB chunks
  m_outc   contiguous block layout (n_tiles, 128, 128), index (i,0,0) —
           one 64 KB contiguous chunk per tile
  m_edge   m_out + the dual-source edge/interior `_start` with the
           production eslot/track arithmetic and the edges-sourced wait

The leading hypothesis is the strided small-chunk output DMA: if m_out
jumps to ~8 us while m_outg8/m_outc stay near the micro, the fix is to
widen the output block (Mosaic only copies a block out when its index
CHANGES, so a (128, 128*G) block revisited G steps cuts the per-chunk
overhead by G) — no consumer-visible layout change.

Usage: python scripts/dma_bisect.py [variants...]
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, HOP = 144, 512          # production per-tile input copy: 0.295 MB
N_TILES = 4096
WRAP = 128
TT = 128
N_OUT = 128


def _input_dma(rows_hbm, ybufs, sems, i, n):
    """The checked-in micro's double-buffered input pipeline (unchanged)."""
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
    return slot


def make_m0():
    def kernel(rows_hbm, out_ref, ybufs, sems):
        i, n = pl.program_id(0), pl.num_programs(0)
        slot = _input_dma(rows_hbm, ybufs, sems, i, n)
        out_ref[:] = jnp.sum(ybufs[slot].reshape(ROWS, HOP), axis=0,
                             keepdims=True)

    def build(rows_flat):
        rows = rows_flat.reshape(-1, HOP)
        return pl.pallas_call(
            kernel, grid=(N_TILES,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, HOP), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, HOP), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, ROWS, HOP), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
        )(rows)
    return build


def make_m_out(group=1, contiguous=False):
    """Micro + the real output grid (the untested structure).

    group=1, contiguous=False reproduces the production out_specs exactly:
    (N_OUT, TT) block at (0, i).  group=G widens the block to (N_OUT, TT*G)
    revisited G consecutive steps.  contiguous=True switches to
    (n_tiles, N_OUT, TT) blocks — one contiguous chunk per copy-out.
    """
    def kernel(rows_hbm, out_ref, ybufs, sems):
        i, n = pl.program_id(0), pl.num_programs(0)
        slot = _input_dma(rows_hbm, ybufs, sems, i, n)
        # the production dma-ablate probe: reduce the landed rows to a
        # (TT,) vector, broadcast over the output rows
        probe = jnp.sum(ybufs[slot][:TT].reshape(TT, -1), axis=1)
        if contiguous:
            out_ref[0] = jnp.broadcast_to(probe[None, :], (N_OUT, TT))
        elif group == 1:
            out_ref[:] = jnp.broadcast_to(probe[None, :], (N_OUT, TT))
        else:
            sub = jax.lax.rem(i, group)
            out_ref[:, pl.ds(sub * TT, TT)] = jnp.broadcast_to(
                probe[None, :], (N_OUT, TT))

    if contiguous:
        out_specs = pl.BlockSpec((1, N_OUT, TT), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((N_TILES, N_OUT, TT), jnp.float32)
    else:
        out_specs = pl.BlockSpec(
            (N_OUT, TT * group), lambda i: (0, i // group),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((N_OUT, N_TILES * TT), jnp.float32)

    def build(rows_flat):
        rows = rows_flat.reshape(-1, HOP)
        return pl.pallas_call(
            kernel, grid=(N_TILES,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((2, ROWS, HOP), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
        )(rows)
    return build


def make_m_edge():
    """m_out + the production dual-source `_start` and edges-sourced wait."""
    N_EDGE = 2
    E_START = N_TILES - 1

    def kernel(rows_hbm, edges_hbm, out_ref, ybufs, sems):
        i, n = pl.program_id(0), pl.num_programs(0)

        def start(tile, slot):
            within = jax.lax.rem(tile, N_TILES)
            track = tile // N_TILES
            is_edge = jnp.logical_or(within == 0, within >= E_START)

            @pl.when(is_edge)
            def _():
                eslot = jnp.where(within == 0, 0, within - (E_START - 1))
                pltpu.make_async_copy(
                    edges_hbm.at[track * N_EDGE + eslot],
                    ybufs.at[slot], sems.at[slot]).start()

            @pl.when(jnp.logical_not(is_edge))
            def _():
                base = pl.multiple_of(
                    jax.lax.rem(within, WRAP) * TT, 8)
                pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(base, ROWS), :],
                    ybufs.at[slot], sems.at[slot]).start()

        slot = jax.lax.rem(i, 2)
        @pl.when(i == 0)
        def _():
            start(0, 0)
        @pl.when(i + 1 < n)
        def _():
            start(i + 1, jax.lax.rem(i + 1, 2))
        pltpu.make_async_copy(
            edges_hbm.at[0], ybufs.at[slot], sems.at[slot]).wait()

        probe = jnp.sum(ybufs[slot][:TT].reshape(TT, -1), axis=1)
        out_ref[:] = jnp.broadcast_to(probe[None, :], (N_OUT, TT))

    def build(rows_flat):
        rows = rows_flat.reshape(-1, HOP)
        edges = jnp.zeros((N_EDGE, ROWS, HOP), jnp.float32)
        return pl.pallas_call(
            kernel, grid=(N_TILES,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((N_OUT, TT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_OUT, N_TILES * TT),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, ROWS, HOP), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
        )(rows, edges)
    return build


def make_m_kitchen(tables=True, xstack_scratch=True, offset_probe=True,
                   real_start=True, grid=N_TILES):
    """Everything at once: the real kernel's skeleton minus the compute.

    Reproduces the production program structure around the DMA — the
    8-operand signature with the real table shapes (n_fft=2048, n2=16),
    the xstack scratch, the dual-source `_start` with track/within
    div/rem arithmetic, the edges-sourced wait descriptor, the sublane-
    offset probe read, and the revolving (128, 128) output — so that a
    ~8 us/tile reproduction here lets the cause be REMOVED one structure
    at a time (each was already measured innocent in isolation).
    """
    N2, N1, KH, A, LOFF = 16, 128, 9, 8, 2
    N_EDGE, E_START = 2, grid - 1

    def kernel(rows_hbm, edges_hbm, win_ref, c2_ref, ctw_ref, stw_ref,
               c1_ref, basis_ref, out_ref, ybufs, xstack, sems):
        i, n = pl.program_id(0), pl.num_programs(0)

        def start(tile, slot):
            if real_start:
                track = tile // grid
                within = jax.lax.rem(tile, grid)
            else:
                track, within = 0, tile
            is_edge = jnp.logical_or(within == 0, within >= E_START)

            @pl.when(is_edge)
            def _():
                eslot = jnp.where(within == 0, 0, within - (E_START - 1))
                pltpu.make_async_copy(
                    edges_hbm.at[track * N_EDGE + eslot],
                    ybufs.at[slot], sems.at[slot]).start()

            @pl.when(jnp.logical_not(is_edge))
            def _():
                base = pl.multiple_of(
                    jax.lax.rem(within, WRAP) * TT, 8)
                pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(base, ROWS), :],
                    ybufs.at[slot], sems.at[slot]).start()

        slot = jax.lax.rem(i, 2)
        @pl.when(i == 0)
        def _():
            start(0, 0)
        @pl.when(i + 1 < n)
        def _():
            start(i + 1, jax.lax.rem(i + 1, 2))
        pltpu.make_async_copy(
            edges_hbm.at[0], ybufs.at[slot], sems.at[slot]).wait()

        off = A - LOFF if offset_probe else 0
        rows = ybufs.at[slot][pl.ds(off, TT), :]
        probe = jnp.sum(rows.reshape(TT, -1), axis=1)
        acc = probe
        if tables:
            # touch every table operand so none is elided
            acc = acc + (jnp.sum(win_ref[:]) + jnp.sum(c2_ref[:])
                         + jnp.sum(ctw_ref[:]) + jnp.sum(stw_ref[:])
                         + jnp.sum(c1_ref[:]) + jnp.sum(basis_ref[:]))
        if xstack_scratch:
            @pl.when(i == 0)
            def _():
                xstack[0, 0, 0, 0, :] = jnp.ones((N1,), jnp.float32)
            acc = acc + jnp.sum(xstack[0, 0, 0, 0, :])
        out_ref[:] = jnp.broadcast_to(acc[None, :], (N_OUT, TT))

    def build(rows_flat):
        rows = rows_flat.reshape(-1, HOP)
        edges = jnp.zeros((N_EDGE, ROWS, HOP), jnp.float32)
        win = jnp.ones((N2, N1), jnp.float32)
        cs2 = jnp.ones((2 * KH, N2), jnp.float32)
        ctw = jnp.ones((KH, N1), jnp.float32)
        stw = jnp.ones((KH, N1), jnp.float32)
        c1s1 = jnp.ones((N1, 2 * N1), jnp.float32)
        basis = jnp.ones((KH, N1, N_OUT), jnp.float32)
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec((N_OUT, TT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_OUT, grid * TT), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, ROWS, HOP), jnp.float32),
                pltpu.VMEM((1, TT, 1, N2, N1), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
        )(rows, edges, win, cs2, ctw, stw, c1s1, basis)
    return build


def make_m_scale(mode):
    """Production-scale input (256 MB, 1023 tiles): the reshape-cost test.

    The WRAP-sweep micro kept N_TILES=4096 over buffers ≤384 MB, so a
    once-per-call relayout copy of the operand would cost ≤0.7 us/tile —
    invisible.  At the production geometry (256 MB / 1024 tiles) the same
    copy costs ~4.5 us/tile.  Three operand forms:

      pre2d    (phys, 512) built OUTSIDE jit — no in-jit reshape at all
      flat512  (N,) reshaped in-jit to (phys, 512) — the PRODUCTION form;
               (8,128) tiling makes this a real HBM relayout copy
      flat128  (N,) reshaped in-jit to (4*phys, 128) — linear ≡ linear,
               a true bitcast; DMA reads 4x rows of width 128

    If flat512 ≈ 8 us while pre2d/flat128 ≈ 2.6, the production fix is to
    hand the kernel a 128-wide row view (n1 = 128 is the kernel's native
    lane width; the staging reshape (4·sub,128)→(sub,q,n1) is the same
    linear order, so the kernel math is untouched).
    """
    PHYS = 131072               # 512-wide rows; 256 MB
    GRID = 1023

    wide = mode != "flat128"
    rows_w = ROWS if wide else ROWS * 4
    width = HOP if wide else 128

    def kernel(rows_hbm, out_ref, ybufs, sems):
        i, n = pl.program_id(0), pl.num_programs(0)

        def start(tile, slot):
            scale = 1 if wide else 4
            base = pl.multiple_of(tile * TT * scale, 8)
            pltpu.make_async_copy(
                rows_hbm.at[pl.ds(base, rows_w), :],
                ybufs.at[slot], sems.at[slot]).start()

        slot = jax.lax.rem(i, 2)
        @pl.when(i == 0)
        def _():
            start(0, 0)
        @pl.when(i + 1 < n)
        def _():
            start(i + 1, jax.lax.rem(i + 1, 2))
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(0, rows_w), :], ybufs.at[slot], sems.at[slot]
        ).wait()
        probe = jnp.sum(ybufs[slot][: TT * (1 if wide else 4)]
                        .reshape(TT, -1), axis=1)
        out_ref[:] = jnp.broadcast_to(probe[None, :], (N_OUT, TT))

    def call(rows):
        return pl.pallas_call(
            kernel, grid=(GRID,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((N_OUT, TT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_OUT, GRID * TT), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, rows_w, width), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
        )(rows)

    if mode == "pre2d":
        arg = jnp.ones((PHYS, HOP), jnp.float32)
        build = call
    else:
        arg = jnp.ones((PHYS * HOP,), jnp.float32)
        def build(flat):
            return call(flat.reshape(-1, width))
    return build, arg, GRID


VARIANTS = {
    "m0": make_m0,
    "m_out": lambda: make_m_out(group=1),
    "m_outg4": lambda: make_m_out(group=4),
    "m_outg8": lambda: make_m_out(group=8),
    "m_outc": lambda: make_m_out(contiguous=True),
    "m_edge": make_m_edge,
    "m_kitchen": make_m_kitchen,
    "m_kitchen_notab": lambda: make_m_kitchen(tables=False),
    "m_kitchen_nox": lambda: make_m_kitchen(xstack_scratch=False),
    "m_kitchen_nooff": lambda: make_m_kitchen(offset_probe=False),
    "m_kitchen_nostart": lambda: make_m_kitchen(real_start=False),
    "m_kitchen_g1024": lambda: make_m_kitchen(grid=1024),
}


def _time_pipelined(run, arg, K=16, groups=4):
    """best-of seconds/call with K dispatches in flight per sync.

    The tunnel's per-dispatch round trip varies by session (3-26 ms);
    a per-call sync at ~1000 tiles injects up to ~8 us/tile of pure
    weather.  Pipelining K calls and blocking once amortizes it to
    round_trip/K; the residual floor is measured and reported.
    """
    r = run(arg)
    r.block_until_ready()          # warmup/compile
    best = float("inf")
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(K):
            r = run(arg)
        r.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def _dispatch_floor(K=16):
    """Per-call cost of a trivial jitted program, timed the same way."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    return _time_pipelined(f, x, K=K, groups=3)


def main():
    scale_modes = [a[6:] for a in sys.argv[1:] if a.startswith("scale_")]
    names = [a for a in sys.argv[1:] if a in VARIANTS]
    if not names and not scale_modes:
        names = list(VARIANTS)
    print("device:", jax.devices()[0], flush=True)
    floor = _dispatch_floor()
    print(f"dispatch floor: {floor*1e3:.2f} ms/call", flush=True)
    for mode in scale_modes:
        build, arg, grid = make_m_scale(mode)
        run = jax.jit(build)
        best = _time_pipelined(run, arg)
        per_tile = max(best - floor, 1e-9) / grid
        mbt = ROWS * HOP * 4 / 1e6
        print(f"scale_{mode:8s}: {per_tile*1e6:6.2f} us/tile "
              f"({mbt/per_tile/1e3:5.0f} GB/s input-effective; "
              f"raw {best/grid*1e6:6.2f})", flush=True)
    if scale_modes and not names:
        return
    rows = jnp.asarray(np.random.RandomState(0)
                       .randn((WRAP * TT + ROWS) * HOP).astype(np.float32))
    mb = ROWS * HOP * 4 / 1e6
    for name in names:
        build = VARIANTS[name]()
        run = jax.jit(build)
        try:
            best = _time_pipelined(run, rows)
        except Exception as e:
            print(f"{name:8s}: FAILED TO COMPILE/RUN\n----\n{e}\n----",
                  flush=True)
            continue
        per_tile = max(best - floor, 1e-9) / N_TILES
        print(f"{name:8s}: {per_tile*1e6:6.2f} us/tile "
              f"({mb/per_tile/1e3:5.0f} GB/s input-effective; "
              f"raw {best/N_TILES*1e6:6.2f})", flush=True)


if __name__ == "__main__":
    main()
