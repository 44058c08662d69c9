"""Generate .pyi re-export stubs for the flat public namespaces.

Mirrors the reference's lazy_loader stub layout (librosa/__init__.pyi and
the core/feature/util subpackage stubs): one `from .mod import name as name`
line per public symbol, resolved from the LIVE package so the stubs cannot
drift silently (tests/test_api_surface can re-run this check).
"""

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import librosa_tpu  # noqa: E402

SUBMODULES = {
    "librosa_tpu": [
        "core", "feature", "filters", "util", "onset", "beat", "effects",
        "decompose", "segment", "sequence", "display", "ops", "parallel",
    ],
    "librosa_tpu.core": [],
    "librosa_tpu.feature": ["inverse"],
    "librosa_tpu.util": [],
}


def stub_for(modname: str) -> str:
    mod = importlib.import_module(modname)
    pkg_prefix = modname + "."
    lines = []
    subs = SUBMODULES.get(modname, [])
    for s in subs:
        lines.append(f"from . import {s} as {s}")
    names = set(
        n for n in dir(mod) if not n.startswith("_") and n not in subs
    )
    if modname == "librosa_tpu":
        # include lazily-resolved flat names: the reference's stub is the
        # canonical surface (every name must resolve here)
        import re as _re

        ref_stub = Path("/root/reference/librosa/__init__.pyi").read_text()
        for m in _re.finditer(r"import (\w+) as", ref_stub):
            name = m.group(1)
            if name.startswith("_"):
                continue
            try:
                getattr(mod, name)
                names.add(name)
            except AttributeError:
                pass
    names = sorted(names)
    for n in names:
        obj = getattr(mod, n)
        owner = getattr(obj, "__module__", None)
        if owner and owner.startswith("librosa_tpu"):
            rel = "." + owner[len("librosa_tpu."):] if owner != "librosa_tpu" else "."
            if owner.startswith(pkg_prefix):
                rel = "." + owner[len(pkg_prefix):]
            elif owner == modname:
                rel = "."
            else:
                # absolute within the package
                rel = owner.replace("librosa_tpu", "librosa_tpu")
                lines.append(f"from {rel} import {n} as {n}")
                continue
            lines.append(f"from {rel} import {n} as {n}")
        elif callable(obj) or isinstance(obj, (int, float, str, dict, list, tuple)):
            # foreign re-export (e.g. numpy helpers) — annotate loosely
            lines.append(f"{n}: object")
    return "\n".join(lines) + "\n"


for modname in SUBMODULES:
    mod = importlib.import_module(modname)
    out = Path(mod.__file__).with_name("__init__.pyi")
    out.write_text(stub_for(modname))
    print("wrote", out, len(out.read_text().splitlines()), "lines")
