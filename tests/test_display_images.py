"""Display image-regression tests (reference analogue: pytest-mpl with 75
baseline PNGs, setup.cfg:3).  Baselines live in tests/display_baselines/
and regenerate via scripts/gen_display_baselines.py."""

from pathlib import Path

import numpy as np
import pytest

import display_baseline_cases as dbc

BASE = Path(__file__).parent / "display_baselines"

_available = [n for n in dbc.CASES if (BASE / f"{n}.npz").exists()]


@pytest.mark.parametrize("name", _available)
def test_display_baseline(name):
    want = np.load(BASE / f"{name}.npz")["img"]
    got = dbc.render_case(name)
    assert got.shape == want.shape, (got.shape, want.shape)
    diff = np.abs(got.astype(int) - want.astype(int))
    # tolerate antialiasing jitter: tiny intensity changes or a handful of
    # moved edge pixels, but fail on any real layout/content change
    frac_changed = (diff > 8).mean()
    assert frac_changed < 0.005, (
        f"{name}: {frac_changed:.2%} of pixels changed (max {diff.max()})"
    )


def test_all_cases_have_baselines():
    missing = [n for n in dbc.CASES if n not in _available]
    assert not missing, f"cases without baselines: {missing}"
