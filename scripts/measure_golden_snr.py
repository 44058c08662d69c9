"""Measure the actual SNR of every golden case against its fixture.

Used to set and document per-case tolerances in tests/golden_cases.py:
run, then set each SNR threshold comfortably below the measured value so
the assert catches regressions without flaking on platform noise.
"""

import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).parent.parent))

import golden_cases  # noqa: E402
import librosa_tpu  # noqa: E402

GOLDEN_DIR = Path(__file__).parent.parent / "tests" / "goldens"

only = set(sys.argv[1:])
signals = golden_cases.make_signals()

for name, case in sorted(golden_cases.CASES.items()):
    if only and name not in only:
        continue
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        print(f"{name:28s} NO FIXTURE")
        continue
    want = np.load(path)
    try:
        got = case.fn(librosa_tpu, signals)
    except Exception as e:
        print(f"{name:28s} ERROR {type(e).__name__}: {e}")
        continue
    worst = np.inf
    worst_key = ""
    for key in want.files:
        w = want[key]
        if w.dtype.kind in ("U", "S", "b", "i", "u"):
            continue
        g = np.asarray(
            got[key],
            dtype=np.complex128 if np.iscomplexobj(w) else np.float64,
        )
        w = w.astype(g.dtype)
        if g.shape != w.shape:
            print(f"{name:28s} SHAPE {key} {g.shape} vs {w.shape}")
            continue
        num = np.sum(np.abs(w) ** 2)
        den = np.sum(np.abs(g - w) ** 2)
        snr = 10 * np.log10(num / max(den, 1e-300)) if num > 0 else np.inf
        if snr < worst:
            worst, worst_key = snr, key
    print(f"{name:28s} {worst:8.1f} dB  (worst: {worst_key})")
