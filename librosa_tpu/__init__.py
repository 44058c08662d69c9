"""librosa_tpu — a TPU-native audio and music analysis framework.

A from-scratch JAX/XLA + Pallas re-design with the capabilities of librosa:
the full signal chain (framing, STFT/ISTFT, mel/MFCC, resampling, CQT/VQT,
HPSS, PCEN, pitch tracking, onsets/beats, sequence decoders) expressed as
fused, jit-compiled device programs, sharded across TPU meshes with
overlap-save halo exchange for long recordings.

The public namespace is flat and librosa-compatible:
``librosa_tpu.stft``, ``librosa_tpu.feature.mfcc``, etc.
"""

from __future__ import annotations

# Core (flat re-exports, matching librosa/__init__.py:12-197)
from .core.convert import *  # noqa: F401,F403
from .core.audio import *  # noqa: F401,F403
from .core.spectrum import *  # noqa: F401,F403
from .core.pitch import (  # noqa: F401
    estimate_tuning,
    pitch_tuning,
    piptrack,
    yin,
    pyin,
)

from .util.exceptions import LibrosaError, ParameterError  # noqa: F401
from ._cache import cache  # noqa: F401

# The axon TPU tunnel cannot host-transfer complex buffers (and a failed
# attempt poisons the runtime); fetch complex results as real/imag pairs.
from . import _axon_compat as _axc


def _maybe_install_axon_compat() -> None:
    try:
        import jax

        platforms = str(getattr(jax.config, "jax_platforms", "") or "")
        if "axon" in platforms:
            _axc.install()
    except Exception:
        pass


_maybe_install_axon_compat()
from .version import version as __version__, show_versions  # noqa: F401

# Subpackage namespaces
from . import core  # noqa: F401
from . import feature  # noqa: F401
from . import filters  # noqa: F401
from . import util  # noqa: F401
from . import ops  # noqa: F401

# Convenience aliases matching librosa's flat surface
from .util.files import example, ex, cite  # noqa: F401


def __getattr__(name):
    # Lazily-loaded heavy or later-phase modules
    import importlib

    lazy = {
        "onset",
        "beat",
        "effects",
        "decompose",
        "segment",
        "sequence",
        "display",
        "parallel",
    }
    if name in lazy:
        return importlib.import_module(f".{name}", __name__)

    lazy_funcs = {
        # constant-Q family
        "cqt": ".core.constantq",
        "vqt": ".core.constantq",
        "hybrid_cqt": ".core.constantq",
        "pseudo_cqt": ".core.constantq",
        "icqt": ".core.constantq",
        "griffinlim_cqt": ".core.constantq",
        # harmonics
        "salience": ".core.harmonic",
        "interp_harmonics": ".core.harmonic",
        "f0_harmonics": ".core.harmonic",
        # intervals & notation
        "interval_frequencies": ".core.intervals",
        "pythagorean_intervals": ".core.intervals",
        "plimit_intervals": ".core.intervals",
        "key_to_notes": ".core.notation",
        "key_to_degrees": ".core.notation",
        "mela_to_degrees": ".core.notation",
        "mela_to_svara": ".core.notation",
        "thaat_to_degrees": ".core.notation",
        "list_mela": ".core.notation",
        "list_thaat": ".core.notation",
        "fifths_to_note": ".core.notation",
        "interval_to_fjs": ".core.notation",
        "hz_to_fjs": ".core.notation",
        # spectrum extras
        "reassigned_spectrogram": ".core.spectrum_ext",
        "fmt": ".core.spectrum_ext",
        "iirt": ".core.spectrum_ext",
    }
    if name in lazy_funcs:
        mod = importlib.import_module(lazy_funcs[name], __name__)
        return getattr(mod, name)

    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
