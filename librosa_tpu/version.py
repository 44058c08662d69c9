"""Version info for librosa_tpu."""

from __future__ import annotations

version = "0.1.0"
short_version = "0.1"


def show_versions() -> None:
    """Print version information for librosa_tpu and its dependencies.

    Reports the library version, the Python interpreter, and the
    installed versions of every core and optional dependency (jax,
    numpy, scipy, matplotlib, ...) — the diagnostic header requested in
    bug reports.  Behavior parity with the reference
    ``librosa/version.py:27``.

    Returns
    -------
    None
        the report prints to stdout

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.show_versions()               # doctest: +ELLIPSIS
    librosa_tpu: ...
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
