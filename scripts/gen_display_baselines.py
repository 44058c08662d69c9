"""Generate display image-regression baselines (tests/display_baselines/*.npz).

Re-run after an INTENTIONAL rendering change; commit the updated fixtures.
"""

import sys
from pathlib import Path

import jax

# Rendering needs no accelerator; keep baselines reproducible on CPU even
# when the axon sitecustomize forces jax_platforms='axon,cpu'.
jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).parent.parent))

import display_baseline_cases as dbc  # noqa: E402

OUT = Path(__file__).parent.parent / "tests" / "display_baselines"
OUT.mkdir(exist_ok=True)

only = set(sys.argv[1:])
for name in dbc.CASES:
    if only and name not in only:
        continue
    try:
        img = dbc.render_case(name)
        np.savez_compressed(OUT / f"{name}.npz", img=img)
        print(f"OK   {name:24s} {img.shape}")
    except Exception as e:
        print(f"FAIL {name:24s} {type(e).__name__}: {e}")
