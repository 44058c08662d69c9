"""CI gate against reference-code transcription (VERDICT r4 ask #2).

Runs the normalized function-level similarity sweep
(``scripts/similarity_check.py``: comments/docstrings/whitespace
stripped, difflib ratio against the same-named reference function) and
enforces two ceilings:

1. **No function anywhere may reach 0.85** — at that level the body is
   reference code with the comments deleted, regardless of category.
2. **No function may reach 0.60** unless it is in one of two documented
   lists:
   - the checker's ALLOWLIST (definitional 3-6 line closed forms whose
     shape is fixed by a published spec), or
   - ``API_PLUMBING`` below: functions that were genuinely rewritten in
     round 5 (different decomposition, own errors/comments/naming) but
     whose bodies are dominated by API-pinned keyword forwarding and
     canonical library-call sequences (the kwarg names ARE the public
     API, so a floor remains).  Each entry pins the measured ratio at
     review time plus a small margin — if someone re-pastes reference
     code the ratio jumps and this test fails.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# name -> ceiling (measured at round-5 review + 0.04 margin)
API_PLUMBING = {
    "trim": 0.75,
    "pseudo_cqt": 0.73,
    "pitch_shift": 0.73,
    "beat_track": 0.72,
    "window_sumsquare": 0.71,
    "tempogram_ratio": 0.70,
    "estimate_tuning": 0.70,
    "highlight": 0.69,
    "agglomerative": 0.69,
    "wavef0": 0.68,
    "wavelet_lengths": 0.67,
    "onset_detect": 0.65,
    "diagonal_filter": 0.65,
    "spectral_contrast": 0.64,
    "metrogram": 0.64,
    "specshow": 0.63,
    "chroma_cens": 0.63,
    "legend_for_axes": 0.63,
    "transform_non_affine": 0.62,
    "pitch_tuning": 0.61,
    "onset_strength": 0.64,
    "onset_strength_multi": 0.66,
    "reassigned_spectrogram": 0.66,
    "_cumulative_mean_normalized_difference": 0.66,
    "hybrid_tempogram": 0.64,
    "fourier_tempogram": 0.64,
    "pcen": 0.64,
    "load": 0.64,
    "infer_cmap": 0.62,
    "inverted": 0.70,
    "cqt": 0.64,
    "mel_to_audio": 0.85,   # two-call chain; body IS the kwarg forwarding
    "mfcc_to_audio": 0.85,  # ditto
}

HARD_CEILING = 0.85


def _sweep():
    sys.path.insert(0, str(REPO / "scripts"))
    from similarity_check import ALLOWLIST, _collect, REF, REPO as PKG
    import difflib

    ours = _collect(PKG)
    ref = _collect(REF)
    rows = []
    for name, (rel, body) in ours.items():
        if name not in ref:
            continue
        ratio = difflib.SequenceMatcher(
            None, body, ref[name][1], autojunk=False
        ).ratio()
        rows.append((name, rel, ratio, name in ALLOWLIST
                     or name.lstrip("_") in ALLOWLIST))
    return rows


def test_no_function_resembles_the_reference():
    rows = _sweep()
    assert rows, "similarity sweep found no comparable functions"

    hard = [r for r in rows if r[2] >= HARD_CEILING and not r[3]]
    assert not hard, (
        "function bodies at transcription-level similarity to the "
        f"reference: {[(n, f, round(x, 2)) for n, f, x, _ in hard]}"
    )

    flagged = []
    for name, rel, ratio, allowlisted in rows:
        if allowlisted or ratio < 0.60:
            continue
        ceiling = API_PLUMBING.get(name)
        if ceiling is None:
            flagged.append((name, rel, round(ratio, 2), "not in any list"))
        elif ratio > ceiling:
            flagged.append(
                (name, rel, round(ratio, 2), f"above its {ceiling} ceiling")
            )
    assert not flagged, f"similarity regressions: {flagged}"
