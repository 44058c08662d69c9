"""Golden parity vs the REFERENCE librosa.

Fixtures under tests/goldens/ were produced by running the reference
(`/root/reference`, via scripts/harvest_goldens.py + scripts/ref_shims.py)
over the shared case table in golden_cases.py on bit-identical synthesized
inputs.  Each case re-runs through librosa_tpu and must match within the
case's tolerance (elementwise allclose or aggregate SNR).
"""

from pathlib import Path

import numpy as np
import pytest

import librosa_tpu

import golden_cases

GOLDEN_DIR = Path(__file__).parent / "goldens"

_available = sorted(
    name for name in golden_cases.CASES if (GOLDEN_DIR / f"{name}.npz").exists()
)


@pytest.fixture(scope="module")
def signals():
    return golden_cases.make_signals()


@pytest.mark.parametrize("name", _available)
def test_golden(name, signals):
    case = golden_cases.CASES[name]
    want = np.load(GOLDEN_DIR / f"{name}.npz")
    got = case.fn(librosa_tpu, signals)

    assert set(got) == set(want.files), (
        f"{name}: outputs {sorted(got)} != fixture {sorted(want.files)}"
    )
    for key in want.files:
        w = want[key]
        g = np.asarray(got[key])
        label = f"{name}/{key}"
        if case.compare is not None:
            case.compare(g, w, label)
        elif w.dtype.kind in ("U", "S"):
            assert np.array_equal(g.astype(w.dtype), w), label
        else:
            assert g.shape == w.shape, (label, g.shape, w.shape)
            np.testing.assert_allclose(
                g.astype(np.float64) if not np.iscomplexobj(w)
                else g.astype(np.complex128),
                w.astype(np.float64) if not np.iscomplexobj(w)
                else w.astype(np.complex128),
                rtol=case.rtol, atol=case.atol, err_msg=label,
            )


def test_fixture_coverage():
    # every registered case must have a committed fixture
    missing = [n for n in golden_cases.CASES if n not in _available]
    assert not missing, f"cases without fixtures: {missing}"
