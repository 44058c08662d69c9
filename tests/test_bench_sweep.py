"""Fault-isolation tests for bench.py's kernel-variant sweep.

A failed remote compile poisons the process AND the device for ~1-2 min
(CLAUDE.md), so the sweep must (a) never run before the cfg2-5 secondary
measurements, (b) record the FULL compiler diagnostic, not a truncated
prefix, and (c) always restore the kernel variant afterwards.
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


LONG_DIAG = (
    "INTERNAL: Mosaic failed to compile TPU kernel: HTTP 500: tpu_compile_"
    "failed: The Pallas TPU lowering currently requires that the last two "
    "dimensions of block shapes are divisible by (8, 128) or equal to the "
    "corresponding dimension of the overall array; got block (16, 144) for "
    "array of shape (4096, 144) in operand 2 of tpu.matmul"
)


class _Recorder:
    def __init__(self, fail=(), sps=None):
        self.fail = set(fail)
        self.sps = sps or {}
        self.calls = []
        self.current = "default"
        self.probes = 0

    def set_variant(self, name):
        self.calls.append(("set", name))
        self.current = name

    def measure(self, name):
        self.calls.append(("measure", name))
        if name in self.fail:
            raise RuntimeError(LONG_DIAG)
        return self.sps.get(name, 1.0e9)

    def probe(self):
        self.probes += 1


def test_failed_variant_records_full_diagnostic():
    rec = _Recorder(fail={"pair"}, sps={"pack": 3.0e9, "pair_pack": 3.1e9})
    results, errors, chosen, chosen_sps = bench.run_variant_sweep(
        rec.measure, rec.set_variant, baseline_sps=4.1e9,
        health_probe=rec.probe,
    )
    # full text, nothing cut off — the tail holds the actionable part
    assert "pair" in errors
    assert errors["pair"].endswith("operand 2 of tpu.matmul")
    assert len(errors["pair"]) > 200
    # losing variants measured, default kept
    assert results["pack"] == round(3.0e9)
    assert chosen == "default"
    assert rec.current == "default"
    # device health re-checked after the failure before the next variant
    assert rec.probes == 1


def test_variant_always_restored_even_on_failure():
    rec = _Recorder(fail={"pair", "pack", "pair_pack"})
    _, errors, chosen, _ = bench.run_variant_sweep(
        rec.measure, rec.set_variant, baseline_sps=4.0e9,
        health_probe=rec.probe,
    )
    assert len(errors) == 3
    assert chosen == "default"
    assert rec.current == "default"
    # every failure was followed by a restore before the next set
    sets = [c for c in rec.calls if c[0] == "set"]
    assert sets[-1] == ("set", "default")


def test_winner_adopted_only_beyond_two_percent():
    rec = _Recorder(sps={"pair": 4.15e9, "pack": 3.0e9, "pair_pack": 2.9e9})
    _, _, chosen, chosen_sps = bench.run_variant_sweep(
        rec.measure, rec.set_variant, baseline_sps=4.10e9,
    )
    assert chosen == "default"  # 4.15 < 4.10 * 1.02

    rec2 = _Recorder(sps={"pair": 4.5e9, "pack": 3.0e9, "pair_pack": 2.9e9})
    _, _, chosen2, sps2 = bench.run_variant_sweep(
        rec2.measure, rec2.set_variant, baseline_sps=4.10e9,
    )
    assert chosen2 == "pair"
    assert sps2 == float(round(4.5e9))
    assert rec2.current == "pair"  # winner left active for the re-measure


def test_sweep_runs_after_secondary_configs_in_main():
    """Structural pin: the sweep's blast radius must not contain cfg2-5.

    The cfg secondaries are measured on the device; a variant-compile
    failure poisons the device for minutes, so main() must measure every
    cfgN before the first set_kernel_variant call.
    """
    src = Path(bench.__file__).read_text()
    body = src[src.index("def main"):]
    sweep_at = body.index("run_variant_sweep(")
    for marker in ("cfg2_feature_stack_Msps", "cfg3_resample_griffinlim_ms",
                   "cfg4_cqt_hpss_ms", "cfg5_beat_pyin_ms"):
        assert body.index(marker) < sweep_at, (
            f"{marker} is measured after the variant sweep — inside the "
            "failed-compile blast radius"
        )
    # the recorded JSON must carry untruncated sweep errors
    assert re.search(r"sweep_errors", body)
