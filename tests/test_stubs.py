"""Typing-stub ↔ live-namespace consistency (reference: lazy_loader
attach_stub over __init__.pyi files)."""

import re
from pathlib import Path

import pytest

import librosa_tpu

PKG = Path(librosa_tpu.__file__).parent

STUBS = sorted(PKG.rglob("__init__.pyi"))


@pytest.mark.parametrize("stub", STUBS, ids=lambda p: str(p.relative_to(PKG)) or ".")
def test_stub_names_resolve(stub):
    import importlib

    rel = stub.parent.relative_to(PKG)
    modname = "librosa_tpu" + ("." + ".".join(rel.parts) if rel.parts else "")
    mod = importlib.import_module(modname)
    names = re.findall(r"import (\w+) as \1", stub.read_text())
    assert names, stub
    missing = [n for n in names if not hasattr(mod, n)]
    assert not missing, f"{modname}: stub names missing at runtime: {missing}"


def test_reference_flat_surface_covered():
    # every public name in the reference's top-level stub must exist here
    ref = Path("/root/reference/librosa/__init__.pyi")
    if not ref.exists():
        pytest.skip("reference unavailable")
    names = set(re.findall(r"import (\w+) as \1", ref.read_text()))
    missing = [
        n for n in sorted(names)
        if not n.startswith("_") and not hasattr(librosa_tpu, n)
    ]
    assert not missing, f"flat API gaps vs reference: {missing}"


def test_typing_module():
    from librosa_tpu import _typing

    assert _typing._WindowSpec is not None
    assert "constant" in _typing._STFTPad.__args__
