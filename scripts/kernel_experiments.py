"""Measurement battery for the fused STFT+mel kernel's ROOFLINE residuals.

One command gathers every number VERDICT r2 item 1 asks for, the moment
a TPU is available (the device grant was wedged for all of round 3's
measurement window — see ROOFLINE.md).  Run on the real device:

    python scripts/kernel_experiments.py            # full battery
    python scripts/kernel_experiments.py quick      # headline only

Experiments:

1. **zero-copy vs legacy layout** — the round-3 kernel DMAs interior
   tiles straight from the caller's buffer; the padded legacy layout is
   the proven round-2 structure.  If Mosaic rejected the new layout the
   fallback fires automatically (``_LEGACY_CONFIGS`` reports it).
2. **end-to-end vs pre-padded** — confirms the jnp.pad reconciliation
   (BENCH_r02 3.63 G vs kernel-alone 4.05-4.13 G, ROOFLINE.md).
3. **mixed-precision dial** — (stage_a, stage_b, basis) sweep over
   HIGHEST/DEFAULT triples: the speed/SNR frontier.
4. **tile-size sweep** — tt ∈ {64, 128, 256}: serial-slice amortization.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SR = 22050
N_FFT = 2048
HOP = 512
N_MELS = 128
BIG_N = 1 << 26


def _sync(x):
    return float(jnp.sum(x))


def _bench(fn, y, iters=32, groups=3):
    """Best sustained group (tunnel stalls poison means).

    iters must be LARGE: each group pays one sync round trip (3-26 ms
    by session), so a K-in-flight group measures T + RT/K.  The r5
    iters=5 runs embedded ~5 us/tile of tunnel weather into every
    absolute stage number and manufactured the 'DMA wait' mystery
    (ROOFLINE.md, scripts/probe_floor.py)."""
    _sync(fn(y))
    best = float("inf")
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(y)
        _sync(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def lowering_smoke() -> int:
    """Compile-only check of every kernel variant at both tile sizes.

    VERDICT r4 #7: the pack variant lowered in one process and not in
    another an hour apart; each environment must record which variants
    its toolchain accepts, with the FULL diagnostic when one is refused.
    Exit status = number of variants that failed to lower.
    """
    import librosa_tpu as lt  # noqa: F401
    from librosa_tpu import filters
    from librosa_tpu.core.spectrum import _win_device
    from librosa_tpu.ops import pallas_stft as ps

    dev = jax.devices()[0]
    print(f"lowering smoke on: {dev} (jax {jax.__version__})", flush=True)

    window = _win_device("hann", N_FFT, N_FFT, jnp.float32)
    basis = filters.mel(sr=SR, n_fft=N_FFT, n_mels=N_MELS).astype(np.float32)
    y_small = jnp.zeros(1 << 21, jnp.float32)

    failures = 0
    for variant in ("default", "pair", "pack", "pair_pack", "pack_out"):
        for tile in (112, 128):
            pair = variant in ("pair", "pair_pack")
            pack = variant in ("pack", "pair_pack", "pack_out")
            perm = variant == "pack_out"
            label = f"{variant:9s} tile={tile}"
            try:
                fn = jax.jit(lambda yb, t=tile, pr=pair, pk=pack, po=perm:
                             ps.stft_mel_pallas(
                                 yb, window, basis, n_fft=N_FFT,
                                 hop_length=HOP, power=2.0, tile_frames=t,
                                 pair_tiles=pr, pack_a=pk,
                                 pack_perm_out=po))
                fn.lower(y_small).compile()
                print(f"  {label}: compiles", flush=True)
            except Exception as e:
                failures += 1
                print(f"  {label}: REJECTED\n----\n{e}\n----", flush=True)
    return failures


def ablation() -> None:
    """Observed per-stage breakdown by successive pipeline truncation.

    Compiles the default kernel stopped after each stage (the truncated
    tensor leaves through a fixed-form reduction probe so nothing is
    DCE'd) and reports timing deltas.  Round-5 finding (ROOFLINE.md):
    the stages are EXACTLY additive — no VPU/MXU overlap — and frame
    staging dominates at ~7.5 us/tile.
    """
    import librosa_tpu  # noqa: F401
    from librosa_tpu import filters
    from librosa_tpu.core.spectrum import _win_device
    from librosa_tpu.ops import pallas_stft as ps

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(BIG_N).astype(np.float32))
    window = _win_device("hann", N_FFT, N_FFT, jnp.float32)
    basis = filters.mel(sr=SR, n_fft=N_FFT, n_mels=N_MELS).astype(np.float32)
    n_tiles = BIG_N // HOP / 128

    res = {}
    for stop in ("assemble", "stage_a", "twiddle", "stage_b", ""):
        fn = jax.jit(lambda yb, a=stop: ps.stft_mel_pallas(
            yb, window, basis, n_fft=N_FFT, hop_length=HOP, power=2.0,
            pair_tiles=False, pack_a=False, _ablate=a))
        res[stop] = _bench(fn, y)
        print(f"  stop={stop or 'full':9s}: {res[stop]*1e3:7.2f} ms "
              f"({res[stop]/n_tiles*1e6:6.2f} us/tile)", flush=True)

    order = ["assemble", "stage_a", "twiddle", "stage_b", ""]
    names = ["stage_a dot", "twiddle", "stage_b+power", "basis"]
    print(f"staging+DMA+window: {res['assemble']/n_tiles*1e6:6.2f} us/tile",
          flush=True)
    for a, b, nm in zip(order[:-1], order[1:], names):
        print(f"{nm:18s}: {(res[b]-res[a])/n_tiles*1e6:6.2f} us/tile",
              flush=True)


def main() -> None:
    if "lowering" in sys.argv[1:]:
        sys.exit(lowering_smoke())
    if "ablate" in sys.argv[1:]:
        ablation()
        return
    quick = "quick" in sys.argv[1:]

    import librosa_tpu as lt
    from librosa_tpu import filters
    from librosa_tpu.core.spectrum import _win_device
    from librosa_tpu.ops import pallas_stft as ps

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(BIG_N).astype(np.float32))
    window = _win_device("hann", N_FFT, N_FFT, jnp.float32)
    basis = filters.mel(sr=SR, n_fft=N_FFT, n_mels=N_MELS).astype(np.float32)

    def gsps(dt):
        return BIG_N / dt / 1e9

    # ---- 1. zero-copy (production path) ------------------------------
    def prod(yb):
        return ps.stft_mel_pallas(
            yb, window, basis, n_fft=N_FFT, hop_length=HOP, power=2.0,
        )

    dt = _bench(prod, y)
    print(f"[1] zero-copy end-to-end: {gsps(dt):.2f} G samples/s "
          f"({dt*1e3:.1f} ms)  legacy-fallbacks={ps._LEGACY_CONFIGS}",
          flush=True)

    # ---- 2. pre-padded comparison (kernel-alone measurement) ---------
    lpad = N_FFT // 2
    y_pad = jnp.pad(y, (lpad, lpad + HOP))

    def padded(yb):
        # time only the kernel over an already-materialized padded buffer
        return ps.stft_mel_pallas(
            yb[lpad:-lpad - HOP], window, basis, n_fft=N_FFT,
            hop_length=HOP, power=2.0,
        )

    dt2 = _bench(padded, y_pad)
    print(f"[2] over pre-padded buffer: {gsps(dt2):.2f} G samples/s",
          flush=True)

    if quick:
        return

    # ---- 3. mixed-precision dial --------------------------------------
    H = jax.lax.Precision.HIGHEST
    D = jax.lax.Precision.DEFAULT
    ref = None
    m = SR * 4
    import scipy.fft

    ys = np.asarray(y[:m])
    ypad = np.pad(ys.astype(np.float64), N_FFT // 2)
    nf = 1 + m // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(nf)[:, None]
    win64 = np.asarray(window).astype(np.float64)
    sp = scipy.fft.rfft(ypad[idx] * win64, axis=-1)
    ref = ((sp.real**2 + sp.imag**2) @ basis.astype(np.float64).T).T

    for name, prec in [("HHH", (H, H, H)), ("HHD", (H, H, D)),
                       ("HDD", (H, D, D)), ("DDD", (D, D, D))]:
        def fn(yb, p=prec):
            return ps.stft_mel_pallas(
                yb, window, basis, n_fft=N_FFT, hop_length=HOP, power=2.0,
                precision=p,
            )

        dt3 = _bench(fn, y)
        ours = np.asarray(fn(y[:m]))[:, : ref.shape[1]].astype(np.float64)
        err = ours - ref
        snr = 10 * np.log10((ref**2).sum() / max((err**2).sum(), 1e-300))
        print(f"[3] precision {name}: {gsps(dt3):.2f} G samples/s, "
              f"SNR {snr:.1f} dB", flush=True)

    # ---- 4. tile-size sweep -------------------------------------------
    for tt in (64, 128, 256):
        try:
            def fn(yb, t=tt):
                return ps.stft_mel_pallas(
                    yb, window, basis, n_fft=N_FFT, hop_length=HOP,
                    power=2.0, tile_frames=t,
                )

            dt4 = _bench(fn, y)
            print(f"[4] tile_frames={tt}: {gsps(dt4):.2f} G samples/s",
                  flush=True)
        except Exception as e:
            print(f"[4] tile_frames={tt}: failed ({str(e)[:80]})",
                  flush=True)

    # ---- 5. paired-tile VPU/MXU interleave -----------------------------
    # ROOFLINE.md's named residual: ~5.7 µs/tile of serial VPU work
    # (staging/window, twiddle, |·|²).  The paired kernel staggers two
    # sub-tiles so the scheduler can hide one's VPU under the other's
    # MXU passes.  Bit-identical output (pinned in test_pallas_stft.py).
    for sub in (64, 128):
        try:
            def fn(yb, t=sub):
                return ps.stft_mel_pallas(
                    yb, window, basis, n_fft=N_FFT, hop_length=HOP,
                    power=2.0, tile_frames=t, pair_tiles=True,
                )

            dt5 = _bench(fn, y)
            print(f"[5] pair_tiles sub={sub}: {gsps(dt5):.2f} G samples/s",
                  flush=True)
        except Exception as e:
            print(f"[5] pair_tiles sub={sub}: failed ({str(e)[:90]})",
                  flush=True)

    # ---- 6. lane-packed stage A ----------------------------------------
    # ROOFLINE.md's other named residual: stage A contracts K=16 of the
    # MXU's 128, wasting 7/8 of each pass.  pack_a contracts a
    # block-diagonal [c2; −s2] stack carrying 7 frames per pass (K=112)
    # at the cost of one in-VMEM relayout after |·|² — this measures
    # which effect wins (the round-2 judgment call, now with data).
    for tf in (56, 112):
        try:
            def fn(yb, t=tf):
                return ps.stft_mel_pallas(
                    yb, window, basis, n_fft=N_FFT, hop_length=HOP,
                    power=2.0, tile_frames=t, pack_a=True,
                )

            dt6 = _bench(fn, y)
            print(f"[6] pack_a tile={tf}: {gsps(dt6):.2f} G samples/s",
                  flush=True)
        except Exception as e:
            print(f"[6] pack_a tile={tf}: failed ({str(e)[:90]})",
                  flush=True)

    # ---- 7. combined pair + pack ----------------------------------------
    try:
        def fn(yb):
            return ps.stft_mel_pallas(
                yb, window, basis, n_fft=N_FFT, hop_length=HOP, power=2.0,
                tile_frames=112, pack_a=True, pair_tiles=True,
            )

        dt7 = _bench(fn, y)
        print(f"[7] pair+pack: {gsps(dt7):.2f} G samples/s", flush=True)
    except Exception as e:
        print(f"[7] pair+pack: failed ({str(e)[:90]})", flush=True)


if __name__ == "__main__":
    main()
