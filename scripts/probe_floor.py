"""Quantify how much of the recorded headline is tunnel round trip.

The headline (bench.py `steady`) pipelines 5 dispatches per scalar
fetch; the per-dispatch round trip varies by session (3 ms r2, 6.5 ms
r4, 26 ms r5).  If the true per-call device time is T and the sync
round trip is R, a K-in-flight group measures T + R/K + send_overhead.
Sweeping K separates T from R without any tracing: the K→inf intercept
is the real device time.  Also times the dma/assemble ablation stops at
high K to check how much of the "8 us/tile staging" line was floor.

Usage: python scripts/probe_floor.py [ablate]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

SR, N_FFT, HOP, N_MELS = 22050, 2048, 512, 128
BIG_N = 1 << 26


def group_time(fn, arg, K, groups=4):
    _ = float(fn(arg))
    best = float("inf")
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(K):
            r = fn(arg)
        _ = float(r)
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def main():
    import librosa_tpu as lt

    print("device:", jax.devices()[0], flush=True)

    triv = jax.jit(lambda x: jnp.sum(x) * 1.0001)
    tx = jnp.zeros((8, 128), jnp.float32)
    for K in (1, 8, 32):
        t = group_time(triv, tx, K)
        print(f"trivial  K={K:3d}: {t*1e3:7.2f} ms/call", flush=True)

    y_big = jnp.asarray(
        np.resize(np.random.RandomState(0).randn(SR * 8), BIG_N)
        .astype(np.float32))

    @jax.jit
    def steady(yb):
        return jnp.sum(lt.feature.melspectrogram(
            y=yb, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS))

    n_tiles = (BIG_N // HOP) // 128
    for K in (5, 16, 32):
        t = group_time(steady, y_big, K, groups=3)
        print(f"steady   K={K:3d}: {t*1e3:7.2f} ms/call "
              f"= {t/n_tiles*1e6:6.2f} us/tile "
              f"-> {BIG_N/t/1e9:5.2f} G samples/s", flush=True)

    if "ablate" in sys.argv[1:]:
        from librosa_tpu import filters
        from librosa_tpu.core.spectrum import _win_device
        from librosa_tpu.ops import pallas_stft as ps
        window = _win_device("hann", N_FFT, N_FFT, jnp.float32)
        basis = filters.mel(sr=SR, n_fft=N_FFT, n_mels=N_MELS).astype(
            np.float32)
        for stop in ("dma", "assemble", "stage_a", "stage_b", ""):
            fn = jax.jit(lambda yb, a=stop: jnp.sum(ps.stft_mel_pallas(
                yb, window, basis, n_fft=N_FFT, hop_length=HOP, power=2.0,
                pair_tiles=False, pack_a=False, _ablate=a)))
            try:
                t = group_time(fn, y_big, 32, groups=3)
            except Exception as e:
                print(f"ablate stop={stop or 'full'}: FAILED {e}",
                      flush=True)
                continue
            print(f"ablate stop={stop or 'full':9s} K=32: {t*1e3:7.2f} ms "
                  f"= {t/n_tiles*1e6:6.2f} us/tile", flush=True)


if __name__ == "__main__":
    main()
