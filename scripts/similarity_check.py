"""Normalized function-level similarity sweep vs the read-only reference.

The file-level copy detector is blind to transcribed *functions* inside
docstring-heavy files (rewritten docstrings dilute file similarity below
threshold).  This tool compares every function/method body in
``librosa_tpu/`` against the same-named definition in ``/root/reference/
librosa/`` after stripping comments, docstrings, and whitespace, and
flags pairs whose normalized ``difflib`` ratio crosses a threshold.

Usage::

    python scripts/similarity_check.py            # report >= 0.60
    python scripts/similarity_check.py --min 0.5  # custom threshold

Exit status is 1 when any non-allowlisted pair crosses the threshold.
The CI gating policy lives in tests/test_similarity.py, which layers a
documented per-name ceiling table (API-keyword-forwarding floors) on
top of this sweep plus a hard 0.85 transcription ceiling; run this
script directly for the raw census.

The allowlist covers definitional arithmetic whose shape is fixed by the
published spec (Slaney mel formulas, unit conversions, ENBW tables):
3-6 line closed forms where any correct implementation coincides.
"""
from __future__ import annotations

import argparse
import ast
import difflib
import io
import sys
import tokenize
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent / "librosa_tpu"
REF = Path("/root/reference/librosa")

# Definitional arithmetic / spec-pinned closed forms: bodies this short
# coincide for any correct implementation (see VERDICT r4 category (b)).
ALLOWLIST = {
    "hz_to_mel", "mel_to_hz", "mel_frequencies", "hz_to_octs", "octs_to_hz",
    "A4_to_tuning", "tuning_to_A4", "fft_frequencies", "cqt_frequencies",
    "tempo_frequencies", "fourier_tempo_frequencies", "midi_to_hz",
    "hz_to_midi", "frames_to_samples", "frames_to_time", "samples_to_frames",
    "samples_to_time", "time_to_samples", "time_to_frames", "blocks_to_frames",
    "blocks_to_samples", "blocks_to_time", "db_to_amplitude", "db_to_power",
    "window_bandwidth", "_num_two_factors", "tiny", "A_weighting",
    "B_weighting", "C_weighting", "D_weighting", "Z_weighting",
    "frequency_weighting", "multi_frequency_weighting", "samples_like",
    "times_like", "midi_to_note", "note_to_hz", "hz_to_note",
    # decorator/functools boilerplate — the closure shape is idiomatic
    "decorator", "wrapper", "inner", "__wrapper", "_decorator",
    # trivial property/dunder shells
    "__init__", "__call__", "__repr__", "__enter__", "__exit__",
}


def _strip(src: str) -> str:
    """Remove comments + docstrings, collapse whitespace."""
    # drop comments/NL via tokenize
    out = []
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    except (tokenize.TokenError, IndentationError):
        return src
    for tok in toks:
        if tok.type in (tokenize.COMMENT, tokenize.NL):
            continue
        out.append(tok)
    try:
        src = tokenize.untokenize(out)
    except ValueError:
        pass
    lines = [ln.strip() for ln in src.splitlines()]
    return "\n".join(ln for ln in lines if ln)


def _functions(path: Path) -> dict[str, str]:
    """name -> normalized body text for every def/async def in a file."""
    try:
        tree = ast.parse(path.read_text())
    except SyntaxError:
        return {}
    src_lines = path.read_text().splitlines()
    fns: dict[str, str] = {}
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        body = node.body
        # skip the docstring statement
        if (body and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)):
            body = body[1:]
        if not body:
            continue
        start = body[0].lineno - 1
        end = max(getattr(b, "end_lineno", b.lineno) for b in body)
        text = "\n".join(src_lines[start:end])
        norm = _strip(text)
        if norm.count("\n") + 1 >= 8:          # only bodies >= 8 lines
            # keep the LONGEST same-named body (overloads/nested defs)
            prev = fns.get(node.name)
            if prev is None or len(norm) > len(prev):
                fns[node.name] = norm
    return fns


def _collect(root: Path) -> dict[str, tuple[str, str]]:
    """name -> (relpath, normalized body); longest wins on collisions."""
    table: dict[str, tuple[str, str]] = {}
    for path in sorted(root.rglob("*.py")):
        if "test" in path.name:
            continue
        for name, body in _functions(path).items():
            prev = table.get(name)
            if prev is None or len(body) > len(prev[1]):
                table[name] = (str(path.relative_to(root)), body)
    return table


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min", type=float, default=0.60)
    ap.add_argument("--all", action="store_true",
                    help="include allowlisted names in the report")
    args = ap.parse_args(argv)

    ours = _collect(REPO)
    ref = _collect(REF)

    hits = []
    for name, (rel, body) in sorted(ours.items()):
        if name not in ref:
            continue
        if not args.all and name.lstrip("_") in ALLOWLIST or name in ALLOWLIST:
            continue
        ratio = difflib.SequenceMatcher(
            None, body, ref[name][1], autojunk=False
        ).ratio()
        if ratio >= args.min:
            hits.append((ratio, name, rel, ref[name][0]))

    hits.sort(reverse=True)
    for ratio, name, rel, refrel in hits:
        print(f"{ratio:.2f}  {name:32s} {rel}  <->  {refrel}")
    if hits:
        print(f"\n{len(hits)} function(s) >= {args.min:.2f} "
              "normalized similarity vs the reference", file=sys.stderr)
        return 1
    print(f"clean: no non-allowlisted function >= {args.min:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
