"""Decompose the cfg2 (batched feature stack) per-program fixed cost.

CAUTION - superseded by scripts/probe_cfg2b.py: this probe's timing loop
fetches via an EAGER ``jnp.sum(out)`` per iteration (~20 ms of tunnel
dispatch), which swamps every small-N number.  probe_cfg2b uses
scalar-in-jit + ``float()`` fetch and is the instrument of record (its
finding: the per-call floor is the tunnel round trip — a trivial
program, mel at any size to 16M, and the whole cfg2 stack all cost the
same ~26 ms synced).

Round-5 investigation: cfg2 regressed 157 -> 60 Msps between r02 and r04
while the headline (64M-sample) number improved.  The judge measured a
~6.5 ms per-program floor at small N (same program: 3962 Msps @64M,
215 @1.4M).  This probe times, on the real TPU:

  0. dispatch+fetch baseline (trivial program)
  1. jitted melspectrogram at 64M / 8M / 1.4M (flat) / 8x176400 (batch)
  2. pure pallas program (stft_mel_pallas only) at the batch shape
  3. the same with the legacy (padded) layout forced
  4. cfg2 and its three components (mfcc / chroma_stft / centroid)

Prints one line per measurement: name, best ms, derived Msps.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

import librosa_tpu as lt
from librosa_tpu.ops import pallas_stft as ps
from librosa_tpu import filters
from librosa_tpu.core.spectrum import _win_device

SR = 22050
N_FFT = 2048
HOP = 512

dev = jax.devices()[0]
print("device:", dev, flush=True)

rng = np.random.default_rng(0)


def timeit(name, fn, arg, iters=5):
    out = fn(arg)
    _ = float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(arg)
        _ = float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
        best = min(best, time.perf_counter() - t0)
    n = arg.size
    print(f"{name:40s} {best*1e3:9.2f} ms   {n/best/1e6:9.0f} Msps", flush=True)
    return best


# --- 0. dispatch + fetch floor -------------------------------------------
y_small = jnp.asarray(rng.standard_normal(1 << 20).astype(np.float32))
timeit("trivial sum (dispatch+fetch floor)", jax.jit(lambda y: y * 2.0), y_small)

# --- 1. melspectrogram size ladder ---------------------------------------
mel = jax.jit(lambda y: lt.feature.melspectrogram(
    y=y, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=128))

for nbits, label in ((26, "64M"), (23, "8M"), (21, "2M"), (20, "1M")):
    y = jnp.asarray(rng.standard_normal(1 << nbits).astype(np.float32))
    timeit(f"melspectrogram flat {label}", mel, y)

batch = jnp.asarray(
    rng.standard_normal((8, SR * 8)).astype(np.float32))
timeit("melspectrogram batch 8x176400", mel, batch)

# --- 2. pure pallas program at the batch shape ----------------------------
melfb = filters.mel(sr=SR, n_fft=N_FFT, n_mels=128).astype(np.float32)
win = _win_device("hann", N_FFT, N_FFT, np.float32)

pal = jax.jit(lambda y: ps.stft_mel_pallas(
    y, win, melfb, n_fft=N_FFT, hop_length=HOP, power=2.0))
timeit("pallas-only batch 8x176400", pal, batch)
flat14 = jnp.asarray(rng.standard_normal(8 * SR * 8).astype(np.float32))
timeit("pallas-only flat 1.4M", pal, flat14)

# identity basis (what spectral_centroid uses): n_out = 1025
eye = np.eye(N_FFT // 2 + 1, dtype=np.float32)
pal_eye = jax.jit(lambda y: ps.stft_mel_pallas(
    y, win, eye, n_fft=N_FFT, hop_length=HOP, power=1.0))
timeit("pallas-eye(1025) batch 8x176400", pal_eye, batch)

# chroma basis: n_out = 12
chromafb = np.asarray(filters.chroma(sr=SR, n_fft=N_FFT, tuning=0.0),
                      dtype=np.float32)
pal_ch = jax.jit(lambda y: ps.stft_mel_pallas(
    y, win, chromafb, n_fft=N_FFT, hop_length=HOP, power=2.0))
timeit("pallas-chroma(12) batch 8x176400", pal_ch, batch)

# --- 3. legacy layout ------------------------------------------------------
ps._LEGACY_CONFIGS.add((N_FFT, HOP))
pal_leg = jax.jit(lambda y: ps.stft_mel_pallas(
    y, win, melfb, n_fft=N_FFT, hop_length=HOP, power=2.0) + 1.0)
timeit("pallas LEGACY batch 8x176400", pal_leg, batch)
timeit("pallas LEGACY flat 1.4M", pal_leg, flat14)
y8m = jnp.asarray(rng.standard_normal(1 << 23).astype(np.float32))
timeit("pallas LEGACY flat 8M", pal_leg, y8m)
ps._LEGACY_CONFIGS.discard((N_FFT, HOP))

# --- 4. cfg2 and its parts -------------------------------------------------
def cfg2(b):
    m = lt.feature.mfcc(y=b, sr=SR)
    c = lt.feature.chroma_stft(y=b, sr=SR, tuning=0.0)
    s = lt.feature.spectral_centroid(y=b, sr=SR)
    return jnp.sum(m) + jnp.sum(c) + jnp.sum(s)

timeit("cfg2 full (jit)", jax.jit(cfg2), batch)
timeit("mfcc alone (jit)", jax.jit(
    lambda b: lt.feature.mfcc(y=b, sr=SR)), batch)
timeit("chroma_stft alone (jit)", jax.jit(
    lambda b: lt.feature.chroma_stft(y=b, sr=SR, tuning=0.0)), batch)
timeit("centroid alone (jit)", jax.jit(
    lambda b: lt.feature.spectral_centroid(y=b, sr=SR)), batch)
print("done", flush=True)
