"""Version info for librosa_tpu."""

from __future__ import annotations

version = "0.1.0"
short_version = "0.1"


def show_versions() -> None:
    """Print version information for librosa_tpu and its dependencies.

    Parity with reference ``librosa/version.py:27`` (show_versions).
    """
    import sys

    print(f"librosa_tpu: {version}")
    print(f"python: {sys.version}")
    for mod in ("jax", "jaxlib", "numpy", "scipy", "sklearn"):
        try:
            m = __import__(mod)
            print(f"{mod}: {getattr(m, '__version__', 'unknown')}")
        except ImportError:
            print(f"{mod}: not installed")
