"""Clean decomposition of the cfg2 per-program fixed cost.

probe_cfg2.py's timeit fetched via an EAGER ``jnp.sum(out)`` per
iteration — a ~20 ms tunnel dispatch that swamps every small-N number.
Here every measured program returns a scalar computed INSIDE the jit and
synchronization is a bare ``float(out)`` fetch, so a measurement is
exactly: dispatch + device-execute + scalar fetch.

Measurements:
  1. trivial scalar program at several N        -> pure dispatch floor
  2. jit(sum(melspectrogram)) over an N ladder  -> intercept = program
     fixed cost, slope = steady throughput
  3. same under _LEGACY_CONFIGS
  4. jit(cfg2) exactly as bench.py measures it (block_until_ready sync
     AND float() sync, to expose any sync-method gap)
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

import librosa_tpu as lt
from librosa_tpu.ops import pallas_stft as ps

SR = 22050
N_FFT = 2048
HOP = 512

print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)


def bestof(fn, arg, iters=7):
    _ = float(fn(arg))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(arg)
        f = float(r)
        best = min(best, time.perf_counter() - t0)
    return best


# --- 1. dispatch floor -----------------------------------------------------
tri = jax.jit(lambda y: jnp.sum(y * 2.0))
for nbits in (20, 23, 26):
    y = jnp.asarray(rng.standard_normal(1 << nbits).astype(np.float32))
    ms = bestof(tri, y) * 1e3
    print(f"trivial scalar  N=2^{nbits}: {ms:8.2f} ms", flush=True)

# --- 2. melspectrogram ladder ----------------------------------------------
mel_sum = jax.jit(lambda y: jnp.sum(lt.feature.melspectrogram(
    y=y, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=128)))

sizes = [1 << 20, 1 << 21, 1 << 22, 8 * SR * 8, 1 << 23, 1 << 24, 1 << 26]
times = []
for n in sizes:
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ms = bestof(mel_sum, y) * 1e3
    times.append(ms)
    print(f"mel+sum flat N={n:>9d}: {ms:8.2f} ms  "
          f"({n/ms/1e3:7.0f} Msps)", flush=True)
A = np.vstack([np.array(sizes, float), np.ones(len(sizes))]).T
slope, intercept = np.linalg.lstsq(A, np.array(times), rcond=None)[0]
print(f"  -> fixed cost ~{intercept:.2f} ms, "
      f"marginal {1/slope/1e3:.0f} Msps", flush=True)

# batch shape (what cfg2 actually uses)
batch = jnp.asarray(rng.standard_normal((8, SR * 8)).astype(np.float32))
print(f"mel+sum batch 8x176400: {bestof(mel_sum, batch)*1e3:8.2f} ms",
      flush=True)

# --- 3. legacy layout ladder -----------------------------------------------
ps._LEGACY_CONFIGS.add((N_FFT, HOP))
mel_leg = jax.jit(lambda y: jnp.sum(lt.feature.melspectrogram(
    y=y, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=128)) + 0.0)
for n in (1 << 20, 8 * SR * 8, 1 << 23):
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    print(f"LEGACY mel+sum N={n:>9d}: {bestof(mel_leg, y)*1e3:8.2f} ms",
          flush=True)
ps._LEGACY_CONFIGS.discard((N_FFT, HOP))

# --- 4. cfg2 as bench measures it -------------------------------------------
def cfg2(b):
    m = lt.feature.mfcc(y=b, sr=SR)
    c = lt.feature.chroma_stft(y=b, sr=SR, tuning=0.0)
    s = lt.feature.spectral_centroid(y=b, sr=SR)
    return jnp.sum(m) + jnp.sum(c) + jnp.sum(s)

cfg2_jit = jax.jit(cfg2)
ms = bestof(cfg2_jit, batch) * 1e3
print(f"cfg2 float-sync:        {ms:8.2f} ms  "
      f"({batch.size/ms/1e3:6.0f} Msps)", flush=True)

# block_until_ready sync, like bench._sync
_ = cfg2_jit(batch).block_until_ready()
best = float("inf")
for _ in range(7):
    t0 = time.perf_counter()
    cfg2_jit(batch).block_until_ready()
    best = min(best, time.perf_counter() - t0)
print(f"cfg2 block_until_ready: {best*1e3:8.2f} ms  "
      f"({batch.size/best/1e9:6.0f} Msps)", flush=True)

# --- 5. cfg2 component programs (scalar-in-jit) ------------------------------
for name, fn in (
    ("mfcc", lambda b: jnp.sum(lt.feature.mfcc(y=b, sr=SR))),
    ("chroma", lambda b: jnp.sum(lt.feature.chroma_stft(y=b, sr=SR, tuning=0.0))),
    ("centroid", lambda b: jnp.sum(lt.feature.spectral_centroid(y=b, sr=SR))),
):
    ms = bestof(jax.jit(fn), batch) * 1e3
    print(f"cfg2 part {name:9s}: {ms:8.2f} ms", flush=True)
print("done", flush=True)
