"""Harvest golden fixtures by running the REFERENCE librosa (via ref_shims)
over the shared case table.  Writes tests/goldens/<case>.npz.

Usage: python scripts/harvest_goldens.py [case ...]
"""

from __future__ import annotations

import sys
import time
import warnings
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import ref_shims  # noqa: E402

ref_shims.install_all()

import librosa  # noqa: E402  (the reference, through the shims)

import golden_cases  # noqa: E402

OUT = Path(__file__).parent.parent / "tests" / "goldens"
OUT.mkdir(exist_ok=True)


def main():
    only = set(sys.argv[1:])
    sigs = golden_cases.make_signals()
    ok, fail = 0, 0
    for name, case in golden_cases.CASES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                outputs = case.fn(librosa, sigs)
            np.savez_compressed(OUT / f"{name}.npz", **outputs)
            shapes = {k: v.shape for k, v in outputs.items()}
            print(f"OK   {name:24s} {time.time()-t0:6.1f}s {shapes}")
            ok += 1
        except Exception as e:
            print(f"FAIL {name:24s} {type(e).__name__}: {e}")
            fail += 1
    print(f"\n{ok} harvested, {fail} failed")


if __name__ == "__main__":
    main()
