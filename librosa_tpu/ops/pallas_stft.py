"""Fused STFT-power→mel Pallas kernel (TPU).

The feature-extraction hot path (BASELINE configs 1/2) as ONE kernel:

    y --DMA--> VMEM: frame → window → 2-stage Cooley-Tukey real DFT
               (matmuls on the MXU) → |·|² → mel projection → out

Why this beats the XLA-fused pipeline (ops/fft.py matmul backend):

- **No HBM intermediates.**  XLA materializes the windowed frame matrix
  (n_fft/hop × input bytes) and the power spectrum in HBM; on a
  bandwidth-limited part that alone caps throughput.  Here frames, DFT
  stages, and the power spectrum live only in VMEM; HBM traffic is the
  input samples (once) plus the tiny mel output.
- **O(n·(√n)) DFT instead of O(n²).**  The direct DFT-as-matmul costs
  2·n_fft·(1+n_fft/2) MACs per frame (~4.2M at n_fft=2048).  Factoring
  n_fft = N1·N2 (Cooley-Tukey, decimation-in-frequency) costs
  N2·n_fft + 2·N1·n_fft + n_fft·n_mels MACs (~1.4M) — all still MXU
  matmuls, sized (·,128) for full lane utilization.

Math (DIF factorization, real input).  With t = t1 + N1·t2 and
k = N2·k1 + k2:

    X[k] = Σ_{t1} W_N^{t1 k2} · W_{N1}^{t1 k1} · A[t1, k2]
    A[t1, k2] = Σ_{t2} x[t1 + N1 t2] · W_{N2}^{t2 k2}

so stage A contracts the frame tensor (T, N2, N1) over t2 (axis −2),
the twiddle is an elementwise complex rotation over (t1, k2), and stage
B contracts over t1 (axis −2) — both contractions leave a 128-wide axis
in the lanes.  Real input makes stage A two real matmuls and stage B
four; both pairs ride ONE dot each by concatenating the cos/−sin rows
into the lhs (stage A) and the [c1 | s1] columns into the rhs (stage B)
— merged because on the MXU a dot's cost scales with its streamed
N-tiles, not its K, so separate small-K dots waste full passes.  The
basis projection contracts with the basis on the LHS so the result
lands directly in the public (n_out, T) layout with no per-tile
transpose.  The full 2048-bin power grid comes out indexed [k2, k1];
instead of reordering, the mel basis is pre-permuted host-side (bins
above Nyquist zeroed — they mirror bins below and must not double
count).

Measured roofline decomposition (TPU v5e over the axon tunnel, see
ROOFLINE.md): ~4.1 G samples/s at HIGHEST (exact f32; bit-level parity
budget 140 dB SNR), ~7.1 G at DEFAULT (bf16 single-pass, ~52 dB).  The
HIGHEST path spends ≈2/3 of its time in 3-pass bf16x3 MXU emulation —
the fundamental price of exact f32 on this hardware.

``precision`` may be a single jax.lax.Precision or a 3-tuple
(stage_a, stage_b, basis) for mixed-precision operation.

Reference parity: this computes exactly |stft(y)|**power · mel
(librosa core/spectrum.py:58 + feature/spectral.py:2160 semantics) for
hann-family windows with center padding done by the caller.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "stft_mel_pallas", "pallas_supported", "set_kernel_variant",
    "get_kernel_variant",
]

# Production kernel variant: 'default' (single tile), 'pair' (two
# interleaved sub-tiles), or 'pack' (lane-packed stage A).  The two
# alternates are numerically exact restructurings whose payoff is
# hardware-scheduler dependent; bench.py measures all three and adopts
# the winner (ROOFLINE.md documents both experiments).
import os as _os

_VARIANT = _os.environ.get("LIBROSA_TPU_KERNEL_VARIANT", "default")


def set_kernel_variant(name: str) -> None:
    """Select the fused-kernel structure used by the production path.

    Parameters
    ----------
    name : {'default', 'pair', 'pack', 'pair_pack', 'pack_out'}
        'default' — one 128-frame tile per grid step;
        'pair' — two interleaved sub-tiles (VPU/MXU overlap experiment);
        'pack' — lane-packed stage A (7 frames per MXU pass);
        'pair_pack' — both combined (packed dots, interleaved halves);
        'pack_out' — pack with the post-power frame relayout replaced by
        a leading-axis relabel in VMEM plus a column un-permute of the
        small output grid in the wrapper.

    All three compute the same transform (exactly for 'pair'; to f32
    reassociation for 'pack').  Explicit ``pair_tiles``/``pack_a``
    arguments to :func:`stft_mel_pallas` override this setting.  The
    initial value comes from ``LIBROSA_TPU_KERNEL_VARIANT``.
    """
    global _VARIANT
    if name not in ("default", "pair", "pack", "pair_pack", "pack_out"):
        raise ValueError(f"unknown kernel variant: {name!r}")
    _VARIANT = name


def get_kernel_variant() -> str:
    """Return the configured production kernel variant name.

    One of ``'default'``, ``'pair'``, or ``'pack'`` — see
    :func:`set_kernel_variant` for what each selects.  bench.py records
    the winning variant in its JSON line so the recorded throughput is
    reproducible from configuration alone.
    """
    return _VARIANT


def _factor(n_fft: int) -> tuple[int, int]:
    """Split n_fft = N1·N2 with N1 = 128 (lane-width stages)."""
    if n_fft % 128 == 0 and n_fft >= 256:
        return 128, n_fft // 128
    if n_fft == 128:
        return 64, 2
    raise ValueError(f"n_fft={n_fft} not supported by the pallas kernel")


def kernel_macs_per_frame(n_fft: int, n_out: int) -> int:
    """Useful multiply-accumulates per frame (roofline accounting).

    The denominator of the kernel's honest utilization number: only the
    MACs an ideal two-stage Cooley-Tukey DFT + basis projection *needs*,
    not whatever the implementation happens to execute.  Stage A costs
    2·kh·n2·n1 (real+imag, half-spectrum k2 rows), stage B 4·kh·n1·n1
    (complex × complex as 4 real dots), the basis projection
    kh·n1·n_out.  Twiddle and |·|² elementwise FLOPs are excluded — they
    are VPU work, not MXU work, and counting them would inflate the
    apparent utilization (ROOFLINE.md uses this convention throughout).

    Parameters
    ----------
    n_fft : int — transform size (power of two ≥ 256)
    n_out : int — basis rows (e.g. 128 mel bands)

    Returns
    -------
    macs : int — multiply-accumulates per frame
    """
    n1, n2 = _factor(n_fft)
    kh = n2 // 2 + 1
    return 2 * kh * n2 * n1 + 4 * kh * n1 * n1 + kh * n1 * n_out


def pallas_supported(n_fft: int, hop_length: int) -> bool:
    """Whether the fused Pallas kernel supports an (n_fft, hop) geometry.

    The kernel requires power-of-two ``n_fft >= 256`` and a hop that
    divides ``n_fft`` and is a multiple of 128 (the Mosaic lane width —
    frame starts must be lane-aligned for the zero-copy row DMA).
    Unsupported geometries fall back to the XLA matmul pipeline.

    Parameters
    ----------
    n_fft, hop_length : int
        proposed STFT geometry

    Returns
    -------
    supported : bool
    """
    if n_fft < 256 or n_fft & (n_fft - 1):
        return False
    if hop_length <= 0 or n_fft % hop_length:
        return False
    if hop_length % 128:
        return False
    return True


@functools.lru_cache(maxsize=32)
def _host_tables(n_fft: int, n2: int):
    """Stage/twiddle DFT factor tables (float32, host-cached)."""
    n1 = n_fft // n2
    t2k2 = np.outer(np.arange(n2), np.arange(n2)) * (2 * np.pi / n2)
    t1k2 = np.outer(np.arange(n1), np.arange(n2)) * (2 * np.pi / n_fft)
    t1k1 = np.outer(np.arange(n1), np.arange(n1)) * (2 * np.pi / n1)
    return (
        np.cos(t2k2).astype(np.float32), np.sin(t2k2).astype(np.float32),
        np.cos(t1k2).astype(np.float32), np.sin(t1k2).astype(np.float32),
        np.cos(t1k1).astype(np.float32), np.sin(t1k1).astype(np.float32),
    )


def _remap_basis(basis: np.ndarray, n_fft: int, n1: int, n2: int) -> np.ndarray:
    """Fold a (n_bins_out, 1+n_fft/2) basis into the kernel's bin grid.

    The kernel computes power only for k2 ∈ [0, n2/2] (real input ⇒
    |X[k]| = |X[n_fft−k]|, and n_fft−k lands at (n2−k2, n1−1−k1)), so
    bins whose k2 exceeds n2/2 are folded onto their computed mirror
    slot.  Output layout: [k2, k1, m] with k = n2·k1 + k2.
    """
    n_out = basis.shape[0]
    kh = n2 // 2 + 1
    out = np.zeros((kh, n1, n_out), dtype=np.float32)
    for k in range(n_fft // 2 + 1):
        k1, k2 = divmod(k, n2)
        if k2 < kh:
            out[k2, k1] += basis[:, k]
        else:
            out[n2 - k2, n1 - 1 - k1] += basis[:, k]
    return out


@functools.lru_cache(maxsize=64)
def _host_consts(n_fft: int, n2: int, basis_key: bytes, n_out: int):
    """Host-side (numpy) kernel table constants, cached per configuration."""
    n1 = n_fft // n2
    kh = n2 // 2 + 1
    c2, s2, ctw, stw, c1, s1 = _host_tables(n_fft, n2)
    basis_np = np.frombuffer(basis_key, dtype=np.float32).reshape(n_out, -1)
    remapped = _remap_basis(basis_np, n_fft, n1, n2)
    return (
        np.concatenate([c2.T[:kh], -s2.T[:kh]], axis=0),
        np.ascontiguousarray(ctw.T[:kh]),
        np.ascontiguousarray(stw.T[:kh]),
        np.concatenate([c1, s1], axis=1),
        remapped,
    )


@functools.lru_cache(maxsize=16)
def _host_packed_c2(n_fft: int, n2: int, group: int):
    """Block-diagonal stage-A matrix for the lane-packed variant.

    Stage A's natural contraction depth is K = n2 (16 for n_fft=2048) —
    1/8 of the MXU's 128-deep systolic array, so each pass wastes 7/8 of
    its K occupancy (ROOFLINE.md's stage-A residual).  Packing ``group``
    consecutive frames per pass fixes it: lhs = diag([c2; −s2] × group)
    of shape (group·2kh, group·n2) contracts K = group·n2 ≈ 128 against
    the frame tensor viewed as (tt/group, group·n2, n1) — a pure
    reshape, since consecutive frames' t2-rows are already adjacent.
    """
    c2, s2, *_ = _host_tables(n_fft, n2)
    kh = n2 // 2 + 1
    cs2 = np.concatenate([c2.T[:kh], -s2.T[:kh]], axis=0)  # (2kh, n2)
    bd = np.zeros((group * 2 * kh, group * n2), dtype=np.float32)
    for b in range(group):
        bd[b * 2 * kh: (b + 1) * 2 * kh, b * n2: (b + 1) * n2] = cs2
    return bd


def _pack_group(n2: int) -> int:
    """Frames per stage-A pass: fill K (group·n2) up to 128.

    The group must divide 128 so the frame tile can stay 128 wide — the
    output BlockSpec's last dimension must be 128-divisible (Mosaic
    rejects e.g. the 112-frame tile a group of 7 would force; that
    variant failed to lower on hardware).  Letting M = group·2kh exceed
    128 costs one extra M-tile per pass but keeps the ~8× stage-A pass
    reduction from full K occupancy.
    """
    g = max(1, min(128 // n2, 128))
    while g > 1 and 128 % g:
        g -= 1
    return g


_DEV_CONSTS: dict = {}

# (n_fft, hop) configs where the zero-copy layout failed to lower and the
# padded legacy layout is used instead (see stft_mel_pallas fallback).
_LEGACY_CONFIGS: set = set()

# (n_fft, hop) configs where a pair/pack kernel variant failed to lower;
# subsequent calls skip the variant and use the protected default path
# (a failed op poisons the axon device ~1-2 min, so latch after one try).
_FAILED_VARIANTS: set = set()


def _device_bd_c2(n_fft: int, n2: int, group: int):
    """Device-resident packed stage-A matrix (tracer-safe cache)."""
    key = ("bd", n_fft, n2, group)
    cached = _DEV_CONSTS.get(key)
    if cached is not None:
        return cached
    dev = jnp.asarray(_host_packed_c2(n_fft, n2, group))
    if not isinstance(dev, jax.core.Tracer):
        _DEV_CONSTS[key] = dev
    return dev


def _device_consts(n_fft: int, n2: int, basis_key: bytes, n_out: int):
    """Device-resident kernel table constants, cached per configuration.

    Re-uploading ~0.7 MB of trig tables + basis per eager call costs
    10-20 ms over a remote device link.  Under an outer jit trace,
    jnp.asarray yields TRACERS — those must never be cached (a cached
    tracer poisons every later call), so tracing calls return fresh
    values that embed as compile-time constants of that program.  The
    window is NOT handled here: it may itself be a traced value and is
    tiny, so callers pass it through directly.
    """
    key = (n_fft, n2, basis_key, n_out)
    cached = _DEV_CONSTS.get(key)
    if cached is not None:
        return cached
    host = _host_consts(n_fft, n2, basis_key, n_out)
    dev = tuple(jnp.asarray(a) for a in host)
    if not isinstance(dev[0], jax.core.Tracer):
        _DEV_CONSTS[key] = dev
    return dev


@functools.lru_cache(maxsize=128)
def _cached_call(n_fft, hop_length, n1, n2, tt, n_tiles, n_out, power,
                 precision, interpret, n_tracks, sig_len, lpad, reflect,
                 legacy=False, pair=False, pack_a=False, perm_out=False,
                 ablate=""):
    """Build (and cache) the jitted kernel wrapper for one configuration.

    The wrapper owns ALL input staging: the bulk of the signal is handed
    to the kernel as a zero-copy (rows, hop) bitcast view of the caller's
    buffer, and only the statically-known boundary tiles read from small
    pre-assembled edge buffers that carry the center/tail padding.  This
    keeps HBM traffic at exactly one read of the input — a `jnp.pad` of
    the whole signal (the previous approach) costs a full extra HBM
    read+write, which at 64M samples is ~25% of the kernel's runtime.

    pallas_call returns a fresh callable each time; without this cache an
    eager caller would re-lower and re-compile the kernel per invocation.
    Everything (edge assembly + kernel) is one jitted program, so the
    eager API path stays a single dispatch.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = n_fft // hop_length
    rpad = ((r - 1 + 7) // 8) * 8
    if legacy:
        # Proven fallback layout (round-2 kernel): the wrapper pads the
        # whole signal and every tile issues one plain 8-aligned DMA —
        # no conditional copies, no dynamic edge indexing.  Used only if
        # Mosaic rejects the zero-copy structure on a given toolchain.
        loff = 0
        A = 0
        rows_buf = tt + rpad
        phys_rows = 0
        e_start = n_tiles + 1
        edge_tiles = []
        n_edge = 0
        aligned = True
    else:
        # Row-shift geometry: with lpad % hop == 0 the padded row matrix
        # is a pure row-shift of the unpadded one by loff rows.  Interior
        # tiles DMA from the A-row-earlier 8-aligned start and the
        # assembly loop reads at a constant sublane offset A - loff.
        loff = lpad // hop_length
        A = max(8, -(-loff // 8) * 8)
        rows_buf = tt + rpad + A
        phys_rows = sig_len // hop_length
        # Tile w (within-track) is interior iff its aligned read
        # [w·tt − A, w·tt − A + rows_buf) lies inside [0, phys_rows).
        e_start = max(1, (phys_rows - rpad) // tt) if phys_rows > rpad else 1
        edge_tiles = [0] + list(range(min(e_start, n_tiles), n_tiles))
        n_edge = len(edge_tiles)
        aligned = n_tracks == 1 or phys_rows % 8 == 0

    prec3 = precision if isinstance(precision, tuple) else (precision,) * 3
    sub = tt // 2 if pair else tt
    group = _pack_group(n2) if pack_a else 1
    kern = functools.partial(
        _kernel, tt=tt, hop=hop_length, n_fft=n_fft, n1=n1, n2=n2,
        power=power, precision=prec3, tiles_per_track=n_tiles,
        phys_rows=phys_rows, e_start=e_start, n_edge=n_edge, A=A,
        loff=loff, aligned=aligned, sub=sub, group=group,
        perm_out=perm_out, ablate=ablate,
    )
    call = pl.pallas_call(
        kern,
        grid=(n_tracks * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # rows (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),             # edge buffers
            pl.BlockSpec(memory_space=pltpu.VMEM),         # window
            pl.BlockSpec(memory_space=pltpu.VMEM),         # [c2; -s2]
            pl.BlockSpec(memory_space=pltpu.VMEM),         # ctw
            pl.BlockSpec(memory_space=pltpu.VMEM),         # stw
            pl.BlockSpec(memory_space=pltpu.VMEM),         # [c1 | s1]
            pl.BlockSpec(memory_space=pltpu.VMEM),         # basis
        ],
        out_specs=pl.BlockSpec(
            (n_out, tt), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_out, n_tracks * n_tiles * tt), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows_buf, hop_length), jnp.float32),
            pltpu.VMEM(
                (2 if pair else 1, sub // group, group, n2, n1), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # Wide tiles overflow Mosaic's default 16 MiB scoped-vmem budget
        # (measured r5: pair/tt=256 needs 16.61M, default/tt=256 18.72M);
        # v5e VMEM is larger than the default scope, so lift the budget —
        # this is what first let the pair/pack variants compile at all.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )

    hop = hop_length
    L = sig_len

    def _edge_buf(y2d, w):
        """Rows-buffer contents for boundary tile ``w``, in padded coords.

        The virtually padded signal is [left pad (lpad) | y | right pad
        (lpad, reflect only) | zeros).  Tile ``w``'s buffer covers padded
        samples [(w·tt − A + loff)·hop, +rows_buf·hop); segments outside
        the physical signal are synthesized here so the kernel never
        needs a padded copy of the bulk.
        """
        pstart = (w * tt - A + loff) * hop
        pend = pstart + rows_buf * hop
        parts = []

        def _left(a, b):      # padded coords ⊂ [0, lpad): pad[p] = y[lpad−p]
            if not reflect:
                return jnp.zeros((n_tracks, b - a), jnp.float32)
            return y2d[:, lpad - b + 1: lpad - a + 1][:, ::-1]

        def _core(a, b):
            return y2d[:, a - lpad: b - lpad]

        def _right(a, b):     # ⊂ [lpad+L, lpad+L+lpad): pad[p] = y[2L−2−(p−lpad)]
            if not reflect:
                return jnp.zeros((n_tracks, b - a), jnp.float32)
            i0 = 2 * L - 2 - (a - lpad)
            i1 = 2 * L - 2 - (b - 1 - lpad)
            return y2d[:, i1: i0 + 1][:, ::-1]

        def _zeros(a, b):
            return jnp.zeros((n_tracks, b - a), jnp.float32)

        regions = [
            (pstart, 0, _zeros),                # alignment garbage rows
            (0, lpad, _left),
            (lpad, lpad + L, _core),
            (lpad + L, lpad + L + lpad, _right),
            (lpad + L + lpad, pend, _zeros),
        ]
        for lo, hi, fn in regions:
            a, b = max(lo, pstart), min(hi, pend)
            if a < b:
                parts.append(fn(a, b))
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)
        return out.reshape(n_tracks, 1, rows_buf, hop)

    def fn(y2d, win, cs2, ctw, stw, c1s1, basis):
        if legacy:
            # one combined pad (center + tile rounding) — the r02 path
            n = sig_len + 2 * lpad
            rows_needed = n_tiles * tt + rpad
            tail = max(0, rows_needed * hop - n) + lpad
            if reflect and lpad > 0:
                yp = jnp.pad(y2d, [(0, 0), (lpad, lpad)], mode="reflect")
                yp = jnp.pad(yp, [(0, 0), (0, tail - lpad)])
            else:
                yp = jnp.pad(y2d, [(0, 0), (lpad, tail)])
            rows = yp[:, : rows_needed * hop].reshape(-1, hop)
            edges = jnp.zeros((1, rows_buf, hop), jnp.float32)
        else:
            if phys_rows > 0:
                rows = y2d[:, : phys_rows * hop].reshape(
                    n_tracks * phys_rows, hop
                )
            else:  # shorter than one hop row — everything is edge tiles
                rows = jnp.zeros((8, hop), jnp.float32)
            edges = jnp.concatenate(
                [_edge_buf(y2d, w) for w in edge_tiles], axis=1
            ).reshape(n_tracks * n_edge, rows_buf, hop)
        return call(rows, edges, win, cs2, ctw, stw, c1s1, basis)

    return jax.jit(fn)


def _kernel(rows_hbm, edges_hbm, win_ref, c2_ref, ctw_ref, stw_ref,
            c1_ref, basis_ref, out_ref, ybufs, xstack, sems,
            *, tt: int, hop: int, n_fft: int, n1: int, n2: int,
            power: float, precision, tiles_per_track: int,
            phys_rows: int, e_start: int, n_edge: int, A: int, loff: int,
            aligned: bool, sub: int, group: int = 1,
            perm_out: bool = False, ablate: str = ""):
    """One grid step = one tile of ``tt`` frames.

    Frames are never assembled: frame t spans r = n_fft/hop consecutive
    hop-rows (rows t..t+r-1 of the (·, hop) row matrix), and each hop-row
    block j covers the t2 range [j·q, (j+1)·q) of the (n2, n1) frame
    tensor.  Stage A is therefore a sum of r partial contractions, one per
    DMA'd block — no cross-offset concatenation (which Mosaic rejects) and
    r overlapped DMAs per tile.

    Interior tiles DMA straight from the caller's unpadded signal (viewed
    as hop-rows): the padded row grid is a pure loff-row shift of the
    physical one, so tile w reads physical rows [w·tt − A, +rows_buf)
    (A ≥ loff keeps the start 8-aligned) and the assembly loop compensates
    with a constant A − loff sublane offset.  Boundary tiles — a
    statically known set — read identical-shape buffers pre-assembled
    with the center/tail padding from ``edges_hbm``.

    When ``sub < tt`` (paired mode) the tile is computed as two
    interleaved ``sub``-frame halves: the op stream staggers one half's
    VPU stages (frame staging/window, twiddle, |·|²) against the other
    half's MXU dots, giving the hardware scheduler independent work to
    overlap the ~36% serial VPU slice with MXU passes (ROOFLINE.md's
    named residual).  Identical math; only the emission order changes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    n_total = pl.num_programs(0)
    r = n_fft // hop
    q = hop // n1
    rpad = ((r - 1 + 7) // 8) * 8
    rows_buf = tt + rpad + A

    # Double-buffered input DMA: tile i computes from slot i%2 while the
    # DMA for tile i+1 streams into the other slot.
    def _start(tile, slot):
        track = tile // tiles_per_track
        within = jax.lax.rem(tile, tiles_per_track)

        if n_edge == 0:
            # legacy layout: one plain DMA from the fully padded rows
            rows_per_track = tiles_per_track * tt + rpad
            start = pl.multiple_of(
                track * rows_per_track + within * tt, 8
            )
            pltpu.make_async_copy(
                rows_hbm.at[pl.ds(start, rows_buf), :],
                ybufs.at[slot], sems.at[slot],
            ).start()
            return

        is_edge = jnp.logical_or(within == 0, within >= e_start)

        @pl.when(is_edge)
        def _():
            eslot = jnp.where(within == 0, 0, within - (e_start - 1))
            pltpu.make_async_copy(
                edges_hbm.at[track * n_edge + eslot],
                ybufs.at[slot], sems.at[slot],
            ).start()

        # Interior tiles exist only when the signal spans ≥ 2 tiles of
        # physical rows; otherwise every tile is an edge tile and this
        # branch must not even be traced (its slice would exceed the
        # rows operand's static shape).
        if min(e_start, tiles_per_track) > 1:
            @pl.when(jnp.logical_not(is_edge))
            def _():
                start = track * phys_rows + within * tt - A
                if aligned:
                    start = pl.multiple_of(start, 8)
                pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(start, rows_buf), :],
                    ybufs.at[slot], sems.at[slot],
                ).start()

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        _start(0, 0)

    @pl.when(i + 1 < n_total)
    def _():
        _start(i + 1, jax.lax.rem(i + 1, 2))

    # Wait via an any-source descriptor of the same shape/byte count
    # (which DMA filled the slot doesn't matter to the semaphore).
    wait_src = (
        rows_hbm.at[pl.ds(0, rows_buf), :] if n_edge == 0
        else edges_hbm.at[0]
    )
    pltpu.make_async_copy(
        wait_src, ybufs.at[slot], sems.at[slot],
    ).wait()
    ybuf = ybufs.at[slot]

    # Keep n1 = 128 in the LANES of every intermediate: tensors are laid
    # out (n2, tt, n1) so nothing pads a 16-wide axis up to 128 lanes.
    kh = n2 // 2 + 1

    G = sub // group

    def _assemble(s):
        # xstack[s][g, b, t2, t1] = win[t2, t1] · y[t·hop + n1·t2 + t1]
        # with t = g·group + b: hop-row block j of frame t is ybuf row
        # (A − loff) + s·sub + t + j (buffer row holds logical padded row
        # w·tt − (A − loff) + b) and covers t2 ∈ [j·q, (j+1)·q).  Staging
        # through VMEM keeps stage A as ONE dot pair — per-j partial dots
        # each cost a full MXU pass regardless of their tiny K.  The
        # (g, b) split is layout-free: consecutive frames' t2-rows are
        # already adjacent in memory.
        for j in range(r):
            xstack[s, :, :, pl.ds(j * q, q), :] = (
                ybuf[pl.ds(j + A - loff + s * sub, sub), :]
                .reshape(G, group, q, n1)
                * win_ref[pl.ds(j * q, q), :]
            )

    def _stage_a(s):
        # contract t2: A[k2, t, t1] = Σ_{t2} W2[t2,k2]·x[t,t2,t1].  Real
        # input ⇒ conjugate symmetry in k2; only k2 ∈ [0, n2/2] is
        # computed (kh rows) — mirror bins are folded into the basis.
        # cos and −sin rows ride ONE dot (c2_ref holds [c2; −s2]): each
        # MXU pass is N-tile-bound here (K = n2 is tiny), so halving the
        # dot count halves stage-A passes.
        dn_a = (((1,), (1,)), ((), ()))    # lhs (2kh, n2) × (sub, n2, n1)
        return jax.lax.dot_general(
            c2_ref[:], xstack[s].reshape(sub, n2, n1), dn_a,
            preferred_element_type=jnp.float32, precision=precision[0],
        )                                  # (2kh, sub, n1) = [k2|k2', t, t1]

    def _stage_a_packed(s):
        # lane-packed stage A (ROOFLINE.md residual experiment): contract
        # K = group·n2 ≈ 128 with the block-diagonal [c2; −s2] stack, so
        # each MXU pass carries `group` frames at full K occupancy
        # instead of one frame at n2/128.  c2_ref holds the
        # (group·2kh, group·n2) block-diagonal matrix in this mode.
        dn_a = (((1,), (1,)), ((), ()))
        a2 = jax.lax.dot_general(
            c2_ref[:], xstack[s].reshape(G, group * n2, n1), dn_a,
            preferred_element_type=jnp.float32, precision=precision[0],
        )                                  # (group·2kh, G, n1)
        return a2.reshape(group, 2 * kh, G, n1)

    def _twiddle(a_both):
        # × W_N^{t1 k2} = cos − i·sin, elementwise over (k2, 1, t1)
        ar, ai = a_both[:kh], a_both[kh:]
        ctw = ctw_ref[:].reshape(kh, 1, n1)
        stw = stw_ref[:].reshape(kh, 1, n1)
        br = ar * ctw + ai * stw
        bi = ai * ctw - ar * stw
        return jnp.concatenate([br, bi], axis=0)

    def _twiddle_packed(a4):
        # twiddle in the packed (group, 2kh, G, n1) layout — elementwise,
        # so the frame packing is transparent to it
        ar, ai = a4[:, :kh], a4[:, kh:]
        ctw = ctw_ref[:].reshape(1, kh, 1, n1)
        stw = stw_ref[:].reshape(1, kh, 1, n1)
        br = ar * ctw + ai * stw
        bi = ai * ctw - ar * stw
        return jnp.concatenate([br, bi], axis=1)   # (group, 2kh, G, n1)

    def _stage_b_power_packed(b4):
        # stage B contracts t1 (the lane axis), insensitive to the frame
        # grouping; |·|^p then ONE relayout back to (kh, sub, n1) for the
        # basis — the transpose is the pack experiment's measured cost
        # (ROOFLINE.md judged it against the stage-A pass saving).
        dn_b = (((3,), (0,)), ((), ()))
        prod = jax.lax.dot_general(
            b4, c1_ref[:], dn_b, preferred_element_type=jnp.float32,
            precision=precision[1],
        )                                          # (group, 2kh, G, 2n1)
        xrr = prod[:, :kh, :, :n1] + prod[:, kh:, :, n1:]
        xii = prod[:, kh:, :, :n1] - prod[:, :kh, :, n1:]
        pw = xrr * xrr + xii * xii                 # (group, kh, G, n1)
        if power == 1:
            pw = jnp.sqrt(pw)
        elif power != 2:
            pw = pw ** (power / 2)
        if perm_out:
            # leave frames in packed (b, g) order: this transpose only
            # relabels the two leading (untiled) axes — whole contiguous
            # (G, n1) blocks move, no sublane interleave — and the
            # wrapper restores frame order on the small output grid
            return jnp.transpose(pw, (1, 0, 2, 3)).reshape(kh, sub, n1)
        # t = g·group + b: bring (G, group) adjacent and merge to sub
        return jnp.transpose(pw, (1, 2, 0, 3)).reshape(kh, sub, n1)

    def _packed_tail(a4):
        return _stage_b_power_packed(_twiddle_packed(a4))

    def _stage_b_power(b_both):
        # contract t1 (last axis): X[k2, t, k1].  All four real products
        # in one dot: lhs [br; bi] (2kh, sub, n1), rhs [c1 | s1] (n1, 2n1);
        # recombine by 128-aligned lane slices, then |·|^power.
        dn_b = (((2,), (0,)), ((), ()))
        prod = jax.lax.dot_general(
            b_both, c1_ref[:], dn_b, preferred_element_type=jnp.float32,
            precision=precision[1],
        )                                  # (2kh, sub, 2n1)
        xrr = prod[:kh, :, :n1] + prod[kh:, :, n1:]    # br·c1 + bi·s1
        xii = prod[kh:, :, :n1] - prod[:kh, :, n1:]    # bi·c1 − br·s1
        pw = xrr * xrr + xii * xii         # (kh, sub, n1)
        if power == 1:
            pw = jnp.sqrt(pw)
        elif power != 2:
            pw = pw ** (power / 2)
        return pw

    def _basis(pw):
        # out[m, t] = Σ_{k2,k1} basis[k2, k1, m] · pw[k2, t, k1]:
        # contracting basis axis 0 against pw axis 1 yields (m, sub)
        # directly — the public (..., n_out, T) layout, no transpose.
        dn_p = (((0,), (1,)), ((), ()))
        acc = jax.lax.dot_general(
            basis_ref[0], pw[0], dn_p,
            preferred_element_type=jnp.float32, precision=precision[2],
        )
        for k2 in range(1, kh):
            acc = acc + jax.lax.dot_general(
                basis_ref[k2], pw[k2], dn_p,
                preferred_element_type=jnp.float32, precision=precision[2],
            )
        return acc

    if group > 1 and sub == tt:
        # lane-packed stage A, single tile per grid step
        _assemble(0)
        out_ref[:] = _basis(_packed_tail(_stage_a_packed(0)))
    elif group > 1:
        # packed + paired: lane-packed dots, interleaved across halves
        _assemble(0)                      # VPU: stage half 0
        a0 = _stage_a_packed(0)           # MXU (K≈112)
        _assemble(1)                      # VPU (independent of a0)
        t0 = _twiddle_packed(a0)          # VPU
        a1 = _stage_a_packed(1)           # MXU
        p0 = _stage_b_power_packed(t0)    # MXU + VPU tail + relayout
        t1 = _twiddle_packed(a1)          # VPU
        o0 = _basis(p0)                   # MXU
        p1 = _stage_b_power_packed(t1)    # MXU + VPU tail + relayout
        out_ref[:, pl.ds(0, sub)] = o0
        out_ref[:, pl.ds(sub, sub)] = _basis(p1)
    elif sub == tt:
        if ablate != "dma":
            _assemble(0)
        if ablate:
            # Ablation instrumentation (scripts/kernel_experiments.py
            # 'ablate' mode): stop the pipeline after the named stage and
            # emit a fixed-form reduction of its tensor, so successive
            # timing deltas attribute wall-clock to individual stages.
            # Never used on the production path (ablate == "" there).
            def _emit(x):
                frames_axis = x.reshape(-1, tt, n1) if x.ndim == 3 else (
                    x.reshape(1, tt, -1)
                )
                probe = jnp.sum(frames_axis, axis=(0, 2))      # (tt,)
                out_ref[:] = jnp.broadcast_to(
                    probe[None, :], (out_ref.shape[0], tt)
                )

            if ablate == "dma":
                # DMA wait only: touch the landed rows, skip the staging
                # copies — the assemble-minus-dma delta isolates the
                # windowed VMEM copy cost from the transfer wait.
                rows = ybuf[pl.ds(A - loff, tt), :]
                probe = jnp.sum(rows.reshape(tt, -1), axis=1)
                out_ref[:] = jnp.broadcast_to(
                    probe[None, :], (out_ref.shape[0], tt)
                )
                return
            if ablate == "assemble":
                _emit(xstack[0].reshape(tt, n2, n1).swapaxes(0, 1))
            elif ablate == "stage_a":
                _emit(_stage_a(0))
            elif ablate == "twiddle":
                _emit(_twiddle(_stage_a(0)))
            elif ablate == "stage_b":
                _emit(_stage_b_power(_twiddle(_stage_a(0))))
            else:
                raise ValueError(f"unknown ablation stop: {ablate!r}")
        else:
            out_ref[:] = _basis(_stage_b_power(_twiddle(_stage_a(0))))
    else:
        # Paired halves, staggered: each half's VPU stage is emitted
        # between the other half's MXU dots so the scheduler can overlap
        # them.  The math is identical to two sequential sub-tiles.
        _assemble(0)                      # VPU: stage half 0
        a0 = _stage_a(0)                  # MXU
        _assemble(1)                      # VPU (independent of a0)
        t0 = _twiddle(a0)                 # VPU
        a1 = _stage_a(1)                  # MXU
        p0 = _stage_b_power(t0)           # MXU + VPU tail
        t1 = _twiddle(a1)                 # VPU
        o0 = _basis(p0)                   # MXU
        p1 = _stage_b_power(t1)           # MXU + VPU tail
        out_ref[:, pl.ds(0, sub)] = o0
        out_ref[:, pl.ds(sub, sub)] = _basis(p1)


def stft_mel_pallas(
    y: jax.Array,
    window: Any,
    basis: Any,
    *,
    n_fft: int,
    hop_length: int,
    power: float = 2.0,
    center: bool = True,
    pad_mode: str = "constant",
    tile_frames: int = 128,
    precision: Any = None,
    interpret: bool = False,
    pair_tiles: Any = None,
    pack_a: Any = None,
    pack_perm_out: Any = None,
    _ablate: str = "",
) -> jax.Array:
    """Fused |STFT|^power → basis projection.  Returns (..., n_out, T).

    The flagship kernel: framing, windowing, the two-stage Cooley-Tukey
    DFT, the |·|^power magnitude, and the filterbank projection execute
    in one Pallas program per tile of frames, with interior tiles DMA'd
    zero-copy from the caller's buffer (see the module docstring for the
    math and ROOFLINE.md for the measured decomposition).  This is the
    hot path behind ``melspectrogram``/``mfcc`` on TPU.

    ``basis`` is (n_out, 1 + n_fft//2) — a mel filterbank, chroma map, or
    identity-like selector.  ``window`` is the length-n_fft analysis
    window.  Leading dims of ``y`` are vmapped.

    ``pair_tiles`` processes two ``tile_frames`` halves per grid step
    with their VPU and MXU stages interleaved — the ROOFLINE.md
    serial-slice overlap experiment.  ``pack_a`` contracts stage A with
    a block-diagonal matrix carrying ~7 frames per MXU pass (K: 16→112)
    at the cost of one in-VMEM relayout after the power stage — the
    ROOFLINE.md stage-A occupancy experiment (requires ``tile_frames``
    divisible by the pack group, e.g. 112; mutually exclusive with
    ``pair_tiles``).  Both are numerically exact variants; enable for
    measurement via ``scripts/kernel_experiments.py``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not pallas_supported(n_fft, hop_length):
        raise ValueError(
            f"pallas stft kernel does not support n_fft={n_fft}, "
            f"hop={hop_length}"
        )

    # resolve the configured variant unless the caller chose explicitly
    if pair_tiles is None and pack_a is None:
        pair_tiles = _VARIANT in ("pair", "pair_pack")
        pack_a = _VARIANT in ("pack", "pair_pack", "pack_out")
        if pack_perm_out is None:
            pack_perm_out = _VARIANT == "pack_out"
        if pack_a and tile_frames == 128:
            g = _pack_group(_factor(n_fft)[1])
            tile_frames = max(8, (128 // (8 * g)) * 8 * g) if g > 1 else 128
    pair_tiles = bool(pair_tiles)
    pack_a = bool(pack_a)

    y = jnp.asarray(y, dtype=jnp.float32)
    lead_shape = y.shape[:-1]
    # fold leading (track/channel) dims into the kernel grid — Mosaic
    # cannot lower a vmapped ANY-memory-space operand under jit
    y = y.reshape(-1, y.shape[-1])
    n_tracks = int(np.prod(lead_shape)) if lead_shape else 1

    n1, n2 = _factor(n_fft)

    if hop_length % n1:
        raise ValueError(
            f"pallas stft kernel needs hop_length divisible by {n1}"
        )

    basis_np = np.ascontiguousarray(np.asarray(basis, dtype=np.float32))
    n_out = basis_np.shape[0]
    # window may be a traced value (caller under jit): keep it in jnp-land
    win = jnp.asarray(window, dtype=jnp.float32).reshape(n2, n1)
    # device-resident table constants, uploaded once per configuration
    cs2_d, ctw_d, stw_d, c1s1_d, remapped_d = _device_consts(
        n_fft, n2, basis_np.tobytes(), n_out
    )

    lpad = n_fft // 2 if center else 0
    if lpad % hop_length:
        # lpad isn't a whole number of hop rows (hop > n_fft/2): the
        # row-shift trick doesn't apply, so center-pad up front (rare —
        # standard configs have hop ≤ n_fft/2) and run with lpad = 0.
        mode = "reflect" if pad_mode == "reflect" else "constant"
        y = jnp.pad(y, [(0, 0), (lpad, lpad)], mode=mode)
        lpad = 0

    n = y.shape[-1] + 2 * lpad
    n_frames = 1 + (n - n_fft) // hop_length
    if n_frames <= 0:
        raise ValueError("input shorter than one frame")

    # paired mode: the DMA/edge geometry works on double-width tiles; the
    # kernel computes the two halves interleaved
    tt = 2 * tile_frames if pair_tiles else tile_frames
    n_tiles = -(-n_frames // tt)

    if precision is None:
        precision = jax.lax.Precision.HIGHEST

    cfg = (
        n_fft, hop_length, n1, n2, tt, n_tiles, n_out, float(power),
        precision, interpret, n_tracks, y.shape[-1], lpad,
        pad_mode == "reflect",
    )
    out = None
    if (pack_a or pair_tiles) and cfg[:2] not in _FAILED_VARIANTS:
        if pack_a:
            g = _pack_group(n2)
            sub_check = tt // 2 if pair_tiles else tt
            if sub_check % g or tt % 8:
                raise ValueError(
                    f"pack_a needs (sub-)tile frames divisible by {g} and "
                    f"the tile by 8 (e.g. tile_frames={8 * g}); got {tt}"
                )
        perm_out = bool(pack_perm_out) and pack_a and not pair_tiles
        try:
            if pack_a:
                out = _cached_call(*cfg, pack_a=True, pair=pair_tiles,
                                   perm_out=perm_out)(
                    y, win, _device_bd_c2(n_fft, n2, g), ctw_d, stw_d,
                    c1s1_d, remapped_d,
                )
                if perm_out and out is not None:
                    # The kernel skipped its in-VMEM frame relayout and
                    # wrote tile columns in packed (b, g) order; undo it
                    # here with one cheap XLA transpose of the (small)
                    # output grid: t_packed = b·G + g  ->  t = g·group + b.
                    G = tt // g
                    out = (
                        out.reshape(n_out, -1, g, G)
                        .swapaxes(-1, -2)
                        .reshape(n_out, -1)
                    )
            else:
                out = _cached_call(*cfg, pair=True)(
                    y, win, cs2_d, ctw_d, stw_d, c1s1_d, remapped_d
                )
        except Exception as e:
            # A variant the toolchain rejects (e.g. tt=256 scratch or the
            # packed reshape) must not take melspectrogram/mfcc down with
            # it: latch the failure and drop to the protected default path.
            import warnings

            warnings.warn(
                f"pallas stft kernel variant "
                f"{'pack' if pack_a else 'pair'} failed ({e!r}); "
                "falling back to the default kernel layout",
                stacklevel=2,
            )
            _FAILED_VARIANTS.add(cfg[:2])
            out = None
    if out is None:
        if pair_tiles or pack_a:
            # recompute the single-tile geometry the default path expects
            tt = tile_frames
            n_tiles = -(-n_frames // tt)
            cfg = (
                n_fft, hop_length, n1, n2, tt, n_tiles, n_out, float(power),
                precision, interpret, n_tracks, y.shape[-1], lpad,
                pad_mode == "reflect",
            )
        if cfg[:2] in _LEGACY_CONFIGS:
            out = _cached_call(*cfg, legacy=True)(
                y, win, cs2_d, ctw_d, stw_d, c1s1_d, remapped_d
            )
        else:
            try:
                out = _cached_call(*cfg, ablate=_ablate)(
                    y, win, cs2_d, ctw_d, stw_d, c1s1_d, remapped_d
                )
            except Exception as e:
                # Insurance against a Mosaic toolchain rejecting the
                # zero-copy DMA structure: retry with the proven padded
                # layout (slower by one full HBM round trip) rather than
                # losing the kernel entirely to the XLA fallback.
                import warnings

                warnings.warn(
                    f"zero-copy pallas stft layout failed ({e!r}); "
                    "falling back to the padded-input kernel layout",
                    stacklevel=2,
                )
                _LEGACY_CONFIGS.add(cfg[:2])
                out = _cached_call(*cfg, legacy=True)(
                    y, win, cs2_d, ctw_d, stw_d, c1s1_d, remapped_d
                )
    if not lead_shape:
        return out[:, :n_frames]
    # (n_out, n_tracks·n_tiles·tt) → (..., n_out, n_frames)
    out = out.reshape(n_out, n_tracks, n_tiles * tt)
    out = jnp.moveaxis(out, 0, 1)[..., :n_frames]
    return out.reshape(lead_shape + (n_out, n_frames))
