"""Per-stage latency breakdown for the analysis-chain bench configs.

Produces the measurement table behind LATENCY.md: which stage of
cfg4 (cqt + hpss) and cfg5 (beat_track + pyin) the milliseconds go to,
so regressions can be attributed to a stage instead of guessed at.

Run on the real TPU (default platform); pass ``cpu`` to force CPU.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

if "cpu" in sys.argv[1:]:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import librosa_tpu as lt  # noqa: E402

SR = 22050


def timeit(label, fn, iters=5, warmup=2):
    for _ in range(warmup):
        r = fn()
    _sync(r)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn()
        _sync(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best * 1000:8.1f} ms")
    return best


def _sync(r):
    try:
        if isinstance(r, tuple):
            r = r[0]
        jnp.asarray(r).block_until_ready()
    except Exception:
        # host outputs (ndarray/scalars) are already synchronized
        pass


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(440)
    y30 = (0.1 * rng.randn(SR * 30)).astype(np.float32)
    t = np.arange(SR * 30) / SR
    y30 += (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    y30_d = jnp.asarray(y30)
    y5_d = y30_d[: SR * 5]

    print("--- cfg4: cqt + hpss (30 s) ---")
    timeit("cqt (default res_type)", lambda: lt.cqt(y30_d, sr=SR))
    timeit("cqt (res_type=polyphase)",
           lambda: lt.cqt(y30_d, sr=SR, res_type="polyphase"))
    timeit("hpss", lambda: lt.effects.hpss(y30_d)[0])
    timeit("cfg4 combined",
           lambda: (lt.cqt(y30_d, sr=SR), lt.effects.hpss(y30_d)[0]))

    print("--- cfg5: beat_track + pyin ---")
    timeit("onset_strength (median agg, 30 s)",
           lambda: lt.onset.onset_strength(y=y30_d, sr=SR,
                                           aggregate=jnp.median))
    env = np.asarray(
        lt.onset.onset_strength(y=y30_d, sr=SR, aggregate=jnp.median)
    )
    timeit("tempo estimate (from envelope)",
           lambda: lt.feature.tempo(onset_envelope=env, sr=SR))
    timeit("beat DP (from envelope)",
           lambda: lt.beat.beat_track(onset_envelope=env, sr=SR))
    timeit("beat_track end-to-end (30 s)",
           lambda: lt.beat.beat_track(y=y30_d, sr=SR))
    timeit("pyin (5 s)",
           lambda: lt.pyin(y5_d, fmin=65, fmax=800, sr=SR)[0], iters=3)

    def cfg5():
        t_, b_ = lt.beat.beat_track(y=y30_d, sr=SR)
        f0 = lt.pyin(y5_d, fmin=65, fmax=800, sr=SR)[0]
        return jnp.sum(f0)

    timeit("cfg5 combined", cfg5, iters=3)

    print("--- cfg3 components (30 s) ---")
    S30 = jnp.abs(lt.stft(y30_d))
    _sync(S30)
    timeit("resample -> 16 kHz (polyphase)",
           lambda: lt.resample(y30_d, orig_sr=SR, target_sr=16000,
                               res_type="polyphase"))
    timeit("griffinlim (8 iter)", lambda: lt.griffinlim(S30, n_iter=8))


def dispatches():
    """Per-stage device-launch counts (backend-independent; see
    profiling.dispatch_profile).  Each launch ≈ one ~20 ms tunnel round
    trip on the real device, so count × 20 ms bounds the dispatch floor
    of every stage."""
    from librosa_tpu.util.profiling import dispatch_profile

    print("device:", jax.devices()[0])
    rng = np.random.RandomState(440)
    y30 = (0.1 * rng.randn(SR * 30)).astype(np.float32)
    t = np.arange(SR * 30) / SR
    y30 += (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    y30_d = jnp.asarray(y30)
    y5_d = y30_d[: SR * 5]
    env = np.asarray(
        lt.onset.onset_strength(y=y30_d, sr=SR, aggregate=jnp.median)
    )
    S30 = jnp.abs(lt.stft(y30_d))
    _sync(S30)

    def show(label, fn):
        r = dispatch_profile(fn)
        per = ", ".join(f"{k}×{v}" for k, v in
                        list(r.get("by_function", {}).items())[:6])
        print(f"{label:40s} launches={r['launches']:3d} "
              f"eager={r['eager']:3d} transfers={r['transfers']:3d}  {per}")

    show("cqt (default)", lambda: lt.cqt(y30_d, sr=SR))
    show("hpss", lambda: lt.effects.hpss(y30_d)[0])
    show("onset_strength (median agg)",
         lambda: lt.onset.onset_strength(y=y30_d, sr=SR,
                                         aggregate=jnp.median))
    show("tempo (from env)",
         lambda: lt.feature.tempo(onset_envelope=env, sr=SR))
    show("beat_track (from env)",
         lambda: lt.beat.beat_track(onset_envelope=env, sr=SR))
    show("beat_track end-to-end",
         lambda: lt.beat.beat_track(y=y30_d, sr=SR))
    show("pyin (5 s)", lambda: lt.pyin(y5_d, fmin=65, fmax=800, sr=SR)[0])
    show("resample polyphase",
         lambda: lt.resample(y30_d, orig_sr=SR, target_sr=16000,
                             res_type="polyphase"))
    show("griffinlim (8 iter)", lambda: lt.griffinlim(S30, n_iter=8))


if __name__ == "__main__":
    if "dispatches" in sys.argv[1:]:
        dispatches()
    else:
        main()
