"""Measured per-stage TPU latency for the bench configs (VERDICT r4 #4)
plus the 1-device-mesh TPU smoke of the sharded chains (VERDICT r4 #8).

Every stage is timed as the library dispatches it (warm cache), synced
by a scalar fetch where the result is a scalar or by fetching a summary
value otherwise, best-of-N.  A trivial program is timed the same way as
the per-dispatch floor control (over the axon tunnel the floor is the
round trip, not compute — subtract it mentally when reading the table).

Usage: PYTHONPATH=/root/repo python scripts/tpu_stage_latency.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

import librosa_tpu as lt

SR = 22050
print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(0)
y30 = jnp.asarray(rng.standard_normal(SR * 30).astype(np.float32))
y5 = y30[: SR * 5]


def timeit(name, fn, iters=5):
    out = fn()
    jax.tree_util.tree_map(
        lambda a: np.asarray(a), out
    )  # full sync incl. host DP outputs
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:38s} {best * 1e3:9.2f} ms", flush=True)
    return best


# --- floor control ----------------------------------------------------------
trivial = jax.jit(lambda v: jnp.sum(v * 2.0))
timeit("dispatch floor (trivial program)", lambda: trivial(y30))

# --- cfg3 stages -------------------------------------------------------------
S30 = jnp.abs(lt.stft(y30))
_ = np.asarray(S30)
timeit("cfg3a resample 22k->16k polyphase", lambda: lt.resample(
    y30, orig_sr=SR, target_sr=16000, res_type="polyphase"))
timeit("cfg3b griffinlim n_iter=8", lambda: lt.griffinlim(S30, n_iter=8))

# --- cfg4 stages -------------------------------------------------------------
timeit("cfg4a cqt (84 bins)", lambda: lt.cqt(y30, sr=SR))
timeit("cfg4b hpss", lambda: lt.effects.hpss(y30)[0])

# --- cfg5 stages -------------------------------------------------------------
timeit("cfg5a onset_strength (median)", lambda: lt.onset.onset_strength(
    y=y30, sr=SR))
env = lt.onset.onset_strength(y=y30, sr=SR)
timeit("cfg5b tempo (from envelope)", lambda: lt.feature.tempo(
    onset_envelope=env, sr=SR))
timeit("cfg5c beat_track end-to-end", lambda: lt.beat.beat_track(
    y=y30, sr=SR)[1])
timeit("cfg5d pyin 5s", lambda: lt.pyin(y5, fmin=65, fmax=800, sr=SR)[0])

# --- cfg2 component programs (jit'd whole) -----------------------------------
batch = jnp.asarray(rng.standard_normal((8, SR * 8)).astype(np.float32))
timeit("cfg2 mfcc (batch 8x8s)", lambda: jax.jit(
    lambda b: jnp.sum(lt.feature.mfcc(y=b, sr=SR)))(batch))

# --- sharded chains on a 1-device TPU mesh (VERDICT #8) ----------------------
# The 8-device CPU mesh proves seam correctness; this proves the
# shard_map + ppermute halo path COMPILES AND RUNS under the axon/Mosaic
# toolchain (the same class of environment-specific rejection that hit
# the pair kernel variant).
from librosa_tpu import parallel

mesh = parallel.time_mesh(1)
yn = y30[: (y30.shape[-1] // 512) * 512]

S_sh = parallel.stft_sharded(yn, mesh=mesh)
ref = lt.stft(yn)
err = float(jnp.max(jnp.abs(S_sh - ref)))
print(f"stft_sharded 1-dev TPU mesh: max|diff| vs unsharded = {err:.3g}",
      flush=True)

h_sh, p_sh = parallel.hpss_sharded(yn, mesh=mesh)
h_ref, p_ref = lt.effects.hpss(yn)
errh = float(jnp.max(jnp.abs(h_sh - h_ref)))
print(f"hpss_sharded 1-dev TPU mesh: max|diff| vs unsharded = {errh:.3g}",
      flush=True)
print("done", flush=True)
