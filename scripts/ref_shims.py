"""Import shims that let the read-only reference librosa run WITHOUT its
compiled/IO dependencies, purely to harvest numerical golden fixtures.

Provides pure-Python stand-ins for:

- ``numba`` — ``jit``/``njit`` as identity decorators (the nopython bodies
  are valid Python), ``vectorize`` → ``np.vectorize``, ``guvectorize`` → a
  small gufunc interpreter (broadcasts leading dims, allocates outputs by
  probing the kernel's first slice through an object array),
  ``stencil`` → a relative-index interpreter (neighborhood found by probing,
  out-of-range rows produce 0 — numba's default boundary).
- ``lazy_loader`` — ``attach_stub`` parses the package's ``.pyi`` stubs;
  ``load`` is a lazy import proxy.
- ``soundfile``/``soxr``/``samplerate``/``pooch`` — import-time placeholders
  whose entry points raise if actually touched (harvesting only ever feeds
  in-memory arrays).

This module must only ever be used by scripts/harvest_goldens.py; the test
suite consumes the committed .npz fixtures and never imports the reference.
"""

from __future__ import annotations

import re
import sys
import types
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# mini-numba
# ---------------------------------------------------------------------------


def _identity_jit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(f):
        return f

    return deco


class _StencilNeighborhood:
    """Records the relative indices a stencil kernel touches."""

    def __init__(self, arr):
        self.arr = np.asarray(arr, dtype=float)
        self.rels = set()

    def __getitem__(self, rel):
        self.rels.add(int(rel))
        return self.arr[len(self.arr) // 2 + int(rel)]


class _ShiftView:
    """x[rel] → arr[i + rel] for the stencil interpreter."""

    __slots__ = ("arr", "i")

    def __init__(self, arr, i):
        self.arr = arr
        self.i = i

    def __getitem__(self, rel):
        return self.arr[self.i + rel]


def _stencil(func=None, **kwargs):
    if func is None:
        return lambda f: _stencil(f, **kwargs)

    def wrapper(x, *extra):
        x = np.asarray(x)
        probe = _StencilNeighborhood(np.zeros(8))
        func(probe, *extra)
        lo = min(probe.rels)
        hi = max(probe.rels)
        n = x.shape[0]
        # Evaluate the interior first and infer the output dtype from ALL
        # values — kernels with data-dependent branches can return python
        # ints (e.g. `return 0`) on some inputs, and probing a single
        # element would lock in an integer dtype and truncate the rest.
        interior = [
            func(_ShiftView(x, i), *extra)
            for i in range(max(0, -lo), n - max(0, hi))
        ]
        vals = np.asarray(interior) if interior else np.zeros(0)
        out = np.zeros(n, dtype=vals.dtype)
        out[max(0, -lo) : n - max(0, hi)] = vals
        return out

    return wrapper


_SIG_RE = re.compile(r"\(([^)]*)\)")


def _parse_gu_signature(sig: str):
    ins, outs = sig.split("->")
    parse = lambda side: [
        tuple(d.strip() for d in m.group(1).split(",") if d.strip())
        for m in _SIG_RE.finditer(side)
    ]
    return parse(ins), parse(outs)


def _guvectorize(*dargs, **dkwargs):
    # layouts: guvectorize("(n)->(n)") or guvectorize([types...], "(n),()->(n)")
    sig = None
    for a in dargs:
        if isinstance(a, str) and "->" in a:
            sig = a
    if sig is None:
        raise ValueError(f"no gufunc layout in {dargs!r}")
    in_cores, out_cores = _parse_gu_signature(sig)

    def deco(func):
        def wrapper(*args):
            n_in = len(in_cores)
            n_out = len(out_cores)
            given_outs = None
            if len(args) == n_in + n_out:
                given_outs = list(args[n_in:])
                args = args[:n_in]
            args = [np.asarray(a) for a in args]
            ins = args[:n_in]

            # bind dimension names to concrete sizes
            dims: dict = {}
            loops = []
            for a, core in zip(ins, in_cores):
                k = len(core)
                loops.append(a.shape[: a.ndim - k] if k else a.shape)
                for name, size in zip(core, a.shape[a.ndim - k:]):
                    dims.setdefault(name, size)
            loop_shape = np.broadcast_shapes(*loops)

            bcast = [
                np.broadcast_to(
                    a,
                    loop_shape + a.shape[a.ndim - len(core):],
                )
                for a, core in zip(ins, in_cores)
            ]

            def core_slices(idx):
                return [
                    b[idx] if core else b[idx]
                    for b, core in zip(bcast, in_cores)
                ]

            out_shapes = [
                loop_shape + tuple(dims[d] for d in core)
                for core in out_cores
            ]
            core_shapes = [tuple(dims[d] for d in core) for core in out_cores]

            if given_outs is not None:
                outs = given_outs
            else:
                # dtype probe: run the first slice into object arrays
                first_idx = tuple(0 for _ in loop_shape)
                probe_outs = [
                    np.zeros(cs if cs else (1,), dtype=object)
                    for cs in core_shapes
                ]
                func(*core_slices(first_idx), *probe_outs)
                out_dtypes = [
                    np.asarray(p.tolist()).dtype if p.size else np.float64
                    for p in probe_outs
                ]
                outs = [
                    np.zeros(s, dtype=dt)
                    for s, dt in zip(out_shapes, out_dtypes)
                ]

            # numba passes empty-core ("scalar") outputs as 1-element views
            # (kernels write ``out[0]``); expand those with a trailing axis so
            # partial indexing always yields a writable view.
            out_views = [
                o if core else o.reshape(o.shape + (1,))
                for o, core in zip(outs, out_cores)
            ]

            for idx in np.ndindex(*loop_shape) if loop_shape else [()]:
                slots = [ov[idx] if loop_shape else ov for ov in out_views]
                func(*core_slices(idx) if loop_shape else list(ins), *slots)
            if given_outs is not None:
                return None
            if len(outs) == 1:
                return outs[0]
            return tuple(outs)

        return wrapper

    return deco


def _np_vectorize(*dargs, **dkwargs):
    # numba.vectorize(["b1(f4)", ...], ...) → elementwise ufunc-alike.
    # Real numba ufuncs accept a positional ``out`` array; emulate it.
    def make(func):
        import inspect

        n_params = len(inspect.signature(func).parameters)
        vf = np.vectorize(func)

        def wrapper(*args):
            if len(args) == n_params + 1:
                out = args[-1]
                out[...] = vf(*args[:-1])
                return out
            return vf(*args)

        return wrapper

    if len(dargs) == 1 and callable(dargs[0]):
        return make(dargs[0])
    return make


def _install_numba():
    numba = types.ModuleType("numba")
    numba.jit = _identity_jit
    numba.njit = _identity_jit
    numba.stencil = _stencil
    numba.guvectorize = _guvectorize
    numba.vectorize = _np_vectorize
    numba.prange = range
    for t in ("uint8", "uint16", "uint32", "uint64", "int8", "int16",
              "int32", "int64", "float32", "float64", "boolean"):
        setattr(numba, t, getattr(np, t if t != "boolean" else "bool_"))
    sys.modules["numba"] = numba
    return numba


# ---------------------------------------------------------------------------
# lazy_loader
# ---------------------------------------------------------------------------


def _install_lazy_loader():
    import importlib

    lazy = types.ModuleType("lazy_loader")

    def attach_stub(package_name, init_file):
        stub = Path(init_file).with_suffix(".pyi")
        attr_to_mod = {}
        submods = set()
        for line in stub.read_text().splitlines():
            m = re.match(r"\s*from\s+(\.[\w.]*)\s+import\s+(.*)", line)
            if not m:
                continue
            mod, names = m.groups()
            for item in names.split(","):
                item = item.strip().rstrip("\\").strip()
                if not item or item.startswith("("):
                    continue
                name = item.split(" as ")[0].strip()
                if not name:
                    continue
                if mod == ".":
                    # `from . import sub as sub` → subpackage re-export
                    submods.add(name)
                else:
                    attr_to_mod[name] = mod

        def __getattr__(name):
            if name in submods:
                return importlib.import_module(f"{package_name}.{name}")
            if name in attr_to_mod:
                mod = importlib.import_module(
                    attr_to_mod[name], package=package_name
                )
                return getattr(mod, name)
            raise AttributeError(name)

        def __dir__():
            return sorted(set(attr_to_mod) | submods)

        return __getattr__, __dir__, sorted(set(attr_to_mod) | submods)

    def load(name):
        class _Lazy:
            def __getattr__(self, attr):
                raise ImportError(f"{name} is stubbed for golden harvesting")

        return _Lazy()

    lazy.attach_stub = attach_stub
    lazy.load = load
    sys.modules["lazy_loader"] = lazy
    return lazy


# ---------------------------------------------------------------------------
# IO stubs
# ---------------------------------------------------------------------------


def _install_io_stubs():
    def _banned(name):
        def f(*a, **k):
            raise RuntimeError(f"{name} is stubbed for golden harvesting")

        return f

    sf = types.ModuleType("soundfile")
    sf.SoundFile = _banned("soundfile.SoundFile")
    sf.read = _banned("soundfile.read")
    sf.info = _banned("soundfile.info")
    sys.modules["soundfile"] = sf

    soxr = types.ModuleType("soxr")
    soxr.resample = _banned("soxr.resample")
    sys.modules["soxr"] = soxr

    sr_mod = types.ModuleType("samplerate")
    sr_mod.resample = _banned("samplerate.resample")
    sys.modules["samplerate"] = sr_mod

    pooch = types.ModuleType("pooch")
    pooch.os_cache = lambda name: f"/tmp/{name}-pooch-stub"

    class _Goodboy:
        def fetch(self, *a, **k):
            raise RuntimeError("pooch fetch is stubbed")

        def load_registry(self, *a, **k):
            pass

        registry = {}

    pooch.create = lambda *a, **k: _Goodboy()
    pooch.retrieve = _banned("pooch.retrieve")
    sys.modules["pooch"] = pooch


def install_all():
    """Install every shim and put the reference on sys.path."""
    _install_numba()
    _install_lazy_loader()
    _install_io_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
