"""Visualization (L6): spectrogram and waveform display via matplotlib.

Functional parity with the reference ``librosa/display.py`` surface:
``specshow`` with axis-type coordinate construction and tick formatting,
adaptive ``waveshow``, ``wavebars``, ``wavef0``, dB/phase colorbars,
``multiplot``, ``highlight``, and the tick-formatter classes.  Rendering is
host-side matplotlib (as in the reference); data is pulled off device once.
"""

from __future__ import annotations

from typing import Any, Callable, Collection, List, Optional, Sequence, Union

import numpy as np

from . import core
from .core import convert
from .util.exceptions import ParameterError

__all__ = [
    "specshow",
    "waveshow",
    "wavebars",
    "wavef0",
    "colorbar_db",
    "colorbar_phase",
    "multiplot",
    "legend_for_axes",
    "highlight",
    "cmap",
    "TimeFormatter",
    "NoteFormatter",
    "LogHzFormatter",
    "ChromaFormatter",
    "ChromaSvaraFormatter",
    "SvaraFormatter",
    "TonnetzFormatter",
    "FJSFormatter",
    "ChromaFJSFormatter",
    "AdaptiveWaveplot",
    "Transformf0",
    "infer_cmap",
]


def _mpl():
    import matplotlib

    if matplotlib.get_backend().lower() not in ("agg",):
        try:
            import matplotlib.pyplot  # noqa: F401
        except Exception:
            matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


# ---------------------------------------------------------------------------
# Tick formatters (reference display.py:182-860)
# ---------------------------------------------------------------------------

from matplotlib.ticker import Formatter


class TimeFormatter(Formatter):
    """Adaptive time tick formatting (s/ms/h:m:s). Parity: display.py:182."""

    def __init__(self, lag: bool = False, unit: Optional[str] = None):
        if unit not in ["s", "ms", None]:
            raise ParameterError(f"Unknown time unit: {unit}")
        self.unit = unit
        self.lag = lag

    def __call__(self, x: float, pos: Optional[int] = None) -> str:
        _, dmax = self.axis.get_data_interval()
        vmin, vmax = self.axis.get_view_interval()

        if self.lag and x >= dmax * 0.5:
            value = x - dmax
            sign = "-"
        else:
            value = x
            sign = ""

        if self.unit == "s":
            s = f"{value:.3g}"
        elif self.unit == "ms":
            s = f"{value * 1000:.3g}"
        else:
            if vmax - vmin > 3600:
                s = "{:d}:{:02d}:{:02d}".format(
                    int(value / 3600.0),
                    int(np.mod(value / 60.0, 60)),
                    int(np.mod(value, 60)),
                )
            elif vmax - vmin > 60:
                s = "{:d}:{:02d}".format(
                    int(value / 60.0), int(np.mod(value, 60))
                )
            elif vmax - vmin >= 1:
                s = f"{value:0.2f}"
            else:
                s = f"{value:g}"
        return f"{sign:s}{s:s}"


class NoteFormatter(Formatter):
    """Frequency → note name ticks. Parity: display.py:336."""

    def __init__(
        self, octave: bool = True, major: bool = True, key: str = "C:maj",
        unicode: bool = True,
    ):
        self.octave = octave
        self.major = major
        self.key = key
        self.unicode = unicode

    def __call__(self, x: float, pos: Optional[int] = None) -> str:
        if x <= 0:
            return ""
        vmin, vmax = self.axis.get_view_interval()
        if self.major and vmax > 4 * max(1, vmin):
            if np.mod(np.round(convert.hz_to_midi(x)), 12) != 0:
                return ""
        return str(
            convert.hz_to_note(
                x, octave=self.octave, cents=False, key=self.key,
                unicode=self.unicode,
            )
        )


class SvaraFormatter(Formatter):
    """Frequency → svara ticks. Parity: display.py:405."""

    def __init__(
        self, Sa: float, mela: Optional[Union[str, int]] = None,
        abbr: bool = True, octave: bool = True, major: bool = True,
        unicode: bool = True,
    ):
        if Sa is None:
            raise ParameterError("Sa frequency is required for svara display")
        self.Sa = Sa
        self.mela = mela
        self.abbr = abbr
        self.octave = octave
        self.major = major
        self.unicode = unicode

    def __call__(self, x: float, pos: Optional[int] = None) -> str:
        if x <= 0:
            return ""
        if self.mela is None:
            return str(
                convert.hz_to_svara_h(
                    x, Sa=self.Sa, abbr=self.abbr, octave=self.octave,
                    unicode=self.unicode,
                )
            )
        return str(
            convert.hz_to_svara_c(
                x, Sa=self.Sa, mela=self.mela, abbr=self.abbr,
                octave=self.octave, unicode=self.unicode,
            )
        )


class FJSFormatter(Formatter):
    """Frequency → FJS note ticks. Parity: display.py:494."""

    def __init__(
        self, *, fmin: float, unison: Optional[str] = None,
        unicode: bool = True, intervals: Optional[Any] = None,
        bins_per_octave: int = 12,
    ):
        self.fmin = fmin
        self.unison = unison
        self.unicode = unicode
        self.intervals = intervals
        self.bins_per_octave = bins_per_octave

    def __call__(self, x: float, pos: Optional[int] = None) -> str:
        if x <= 0:
            return ""
        try:
            return str(
                convert.hz_to_fjs(
                    x, fmin=self.fmin, unison=self.unison,
                    unicode=self.unicode,
                )
            )
        except ParameterError:
            return ""


class LogHzFormatter(Formatter):
    """Log-frequency ticks. Parity: display.py:588."""

    def __init__(self, major: bool = True):
        self.major = major

    def __call__(self, x: float, pos: Optional[int] = None) -> str:
        if x <= 0:
            return ""
        vmin, vmax = self.axis.get_view_interval()
        if self.major and vmax > 4 * max(1, vmin):
            if np.mod(np.round(convert.hz_to_midi(x)), 12) != 0:
                return ""
        return f"{x:g}"


class ChromaFormatter(Formatter):
    """Pitch-class ticks. Parity: display.py:647."""

    def __init__(self, key: str = "C:maj", unicode: bool = True):
        from .core.notation import key_to_notes

        self.notes = key_to_notes(key, unicode=unicode)

    def __call__(self, x: float, pos: Optional[int] = None) -> str:
        return self.notes[int(x) % 12]


class ChromaSvaraFormatter(Formatter):
    """Chroma → svara ticks. Parity: display.py:690."""

    def __init__(
        self, Sa: Optional[float] = None, mela: Optional[Any] = None,
        abbr: bool = True, unicode: bool = True,
    ):
        from .core.notation import mela_to_svara

        if Sa is None:
            Sa = 0
        self.Sa_idx = int(np.round(Sa)) % 12
        if mela is not None:
            self.names = mela_to_svara(mela, abbr=abbr, unicode=unicode)
        else:
            self.names = [
                "S", "r", "R", "g", "G", "m", "M", "P", "d", "D", "n", "N",
            ]

    def __call__(self, x: float, pos: Optional[int] = None) -> str:
        return self.names[int(x - self.Sa_idx) % 12]


class ChromaFJSFormatter(Formatter):
    """Chroma ticks in functional-just-system notation. Parity: display.py:758."""

    def __init__(
        self, *, intervals: Any, unison: str = "C", unicode: bool = True,
        bins_per_octave: Optional[int] = None,
    ):
        from .core.intervals import interval_frequencies

        self.unison = unison
        self.unicode = unicode
        self.intervals = intervals
        try:
            if not isinstance(intervals, str):
                bins_per_octave = len(intervals)
            if not isinstance(bins_per_octave, int):
                raise ParameterError(
                    f"bins_per_octave={bins_per_octave} must be integer-valued"
                )
            self.bins_per_octave = bins_per_octave
            self.intervals_ = interval_frequencies(
                self.bins_per_octave, fmin=1, intervals=intervals,
                bins_per_octave=self.bins_per_octave,
            )
        except TypeError as exc:
            raise ParameterError(
                f"intervals={intervals} must be of type str or a collection "
                "of numbers between 1 and 2"
            ) from exc

    def __call__(self, x: float, pos: Optional[int] = None) -> str:
        from .core.notation import interval_to_fjs

        return str(
            interval_to_fjs(
                self.intervals_[int(x) % self.bins_per_octave],
                unison=self.unison, unicode=self.unicode,
            )
        )


class TonnetzFormatter(Formatter):
    """Tonnetz dimension ticks. Parity: display.py:840."""

    def __call__(self, x: float, pos: Optional[int] = None) -> str:
        return [r"5$_x$", r"5$_y$", r"m3$_x$", r"m3$_y$", r"M3$_x$", r"M3$_y$"][
            int(x) % 6
        ]


# ---------------------------------------------------------------------------
# Adaptive waveform artist (reference display.py:862)
# ---------------------------------------------------------------------------


class AdaptiveWaveplot:
    """Switch between sample-level and envelope rendering on zoom.

    Parity: display.py:862 — a simplified adaptive artist: the connected
    callback swaps envelope and sample renderings based on the view width.
    """

    def __init__(self, times, y, steps, envelope, sr=22050, max_points=11025,
                 transpose=False):
        self.times = times
        self.y = y
        self.steps = steps
        self.envelope = envelope
        self.sr = sr
        self.max_points = max_points
        self.transpose = transpose
        self.cid = None

    def update(self, ax) -> None:
        """Re-render according to the current view limits."""
        if self.transpose:
            lims = ax.get_ylim()
        else:
            lims = ax.get_xlim()
        n_view = int((lims[1] - lims[0]) * self.sr)
        if n_view <= self.max_points:
            self.steps.set_visible(True)
            self.envelope.set_visible(False)
        else:
            self.steps.set_visible(False)
            self.envelope.set_visible(True)

    def connect(self, ax) -> None:
        self.cid = ax.figure.canvas.mpl_connect(
            "draw_event", lambda event: self.update(ax)
        )


def _make_transformf0():
    """Build the Transformf0 class lazily (needs matplotlib.transforms)."""
    import matplotlib.transforms as mtransforms

    class Transformf0(mtransforms.Transform):
        """f0-displacement transform for pitch-relative waveform display.

        Maps (time, value) pairs so that waveform samples ride the f0
        contour: forward maps a pitch-relative offset to absolute Hz via
        ``2**(v / norm / bins_per_octave) * f0(t)``; inverse maps back to
        pitch-relative log2 offsets.  Unvoiced (NaN) frames pass NaN
        through, hiding those samples.

        Parity: display.py:1145 (Transformf0).
        """

        input_dims = 2
        output_dims = 2
        is_separable = False

        def __init__(
            self, f0, *, sr: float = 22050, hop_length: int = 512,
            bins_per_octave: int = 12, norm: float = 1, offset: float = 0,
            transpose: bool = False, is_inverted: bool = False,
        ):
            super().__init__(shorthand_name="Transformf0")
            f0 = np.asarray(f0, dtype=float)
            if not np.any(np.isfinite(f0)) or np.nanmin(f0) <= 0:
                raise ParameterError(
                    "f0 must be strictly positive (or NaN) and contain at "
                    "least one finite value"
                )

            import scipy.interpolate

            times = offset + convert.times_like(
                f0, sr=sr, hop_length=hop_length
            )
            self.f0_interp = scipy.interpolate.interp1d(
                np.asarray(times), f0, kind="previous", copy=False,
                bounds_error=False, assume_sorted=True,
            )
            self.norm = norm
            self.bins_per_octave = bins_per_octave
            self.f0 = f0
            self.sr = sr
            self.hop_length = hop_length
            self.offset = offset
            self.transpose = transpose
            self.is_inverted = is_inverted

        def transform_non_affine(self, values):
            values = np.asarray(values)
            idx = (1, 0) if self.transpose else (0, 1)
            times = values[:, idx[0]]
            samples = values[:, idx[1]]
            output = np.empty_like(values)
            output[:, idx[0]] = times
            if self.is_inverted:
                output[:, idx[1]] = (
                    (np.log2(samples) - np.log2(self.f0_interp(times)))
                    * self.norm * self.bins_per_octave
                )
            else:
                output[:, idx[1]] = 2.0 ** (
                    samples / self.norm / self.bins_per_octave
                ) * self.f0_interp(times)
            return output

        def inverted(self):
            return Transformf0(
                f0=self.f0, sr=self.sr, hop_length=self.hop_length,
                bins_per_octave=self.bins_per_octave, norm=self.norm,
                offset=self.offset, transpose=self.transpose,
                is_inverted=not self.is_inverted,
            )

    return Transformf0


Transformf0 = _make_transformf0()


# ---------------------------------------------------------------------------
# Colormap inference (reference display.py:1291)
# ---------------------------------------------------------------------------


def infer_cmap(
    data: Any,
    *,
    robust: bool = True,
    cmap_seq: Any = "magma",
    cmap_bool: Any = "gray_r",
    cmap_div: Any = "coolwarm",
    div_thresh: float = 0.0,
) -> Any:
    """Data-driven colormap choice (sequential/diverging/boolean).

    Boolean data gets ``cmap_bool``; data straddling ``div_thresh`` gets
    ``cmap_div``; everything else gets ``cmap_seq``.  With ``robust``, the
    top and bottom 2% of values are discarded before the straddle test.

    Parity: display.py:1291 (infer_cmap).
    """
    import matplotlib as mpl
    from matplotlib import colors

    data = np.atleast_1d(np.asarray(data))

    def _resolve(c):
        return c if isinstance(c, colors.Colormap) else mpl.colormaps[c]

    if data.dtype.kind == "b":
        return _resolve(cmap_bool)

    data = data[np.isfinite(data)]
    if robust:
        min_p, max_p = 2, 98
    else:
        min_p, max_p = 0, 100

    if data.size > 0:
        min_val, max_val = np.percentile(data, [min_p, max_p])
    else:
        min_val = max_val = 0.0

    if min_val >= div_thresh or max_val <= div_thresh:
        return _resolve(cmap_seq)
    return _resolve(cmap_div)


# Deprecation rename (reference display.py:1366): cmap -> infer_cmap.
cmap = infer_cmap


# ---------------------------------------------------------------------------
# Coordinate grids (reference display.py:1947 __mesh_coords)
# ---------------------------------------------------------------------------


def _coords(
    axis_type: Optional[str],
    n: int,
    *,
    sr: float,
    hop_length: int,
    n_fft: Optional[int],
    fmin: Optional[float],
    fmax: Optional[float],
    bins_per_octave: int,
    win_length: Optional[int] = None,
    tempo_min: float = 16,
) -> np.ndarray:
    if axis_type is None or axis_type in ("off", "none"):
        return np.arange(n + 1)
    if axis_type in ("time", "s"):
        return convert.frames_to_time(
            np.arange(n + 1), sr=sr, hop_length=hop_length
        )
    if axis_type == "ms":
        return 1000 * convert.frames_to_time(
            np.arange(n + 1), sr=sr, hop_length=hop_length
        )
    if axis_type in ("lag", "lag_s", "lag_ms"):
        scale = 1000 if axis_type == "lag_ms" else 1
        return scale * convert.frames_to_time(
            np.arange(n + 1), sr=sr, hop_length=hop_length
        )
    if axis_type == "frames":
        return np.arange(n + 1)
    if axis_type in ("linear", "hz", "fft", "fft_note", "fft_svara", "log"):
        return np.linspace(0, sr / 2, num=n + 1)
    if axis_type == "mel":
        f_max = fmax if fmax is not None else sr / 2
        f_min = fmin if fmin is not None else 0
        return convert.mel_frequencies(n + 1, fmin=f_min, fmax=f_max)
    if axis_type in ("cqt", "cqt_hz", "cqt_note", "cqt_svara", "vqt_fjs"):
        f_min = fmin if fmin is not None else float(convert.note_to_hz("C1"))
        return convert.cqt_frequencies(
            n + 1, fmin=f_min / 2.0 ** (0.5 / bins_per_octave),
            bins_per_octave=bins_per_octave,
        )
    if axis_type in ("chroma", "chroma_h", "chroma_c", "chroma_fjs"):
        return np.linspace(0, 12, num=n + 1)
    if axis_type == "tempo":
        basis = convert.tempo_frequencies(n + 2, sr=sr, hop_length=hop_length)[1:]
        edges = np.arange(1, n + 2)
        return basis[edges - 1]
    if axis_type == "fourier_tempo":
        wl = win_length if win_length is not None else 2 * (n - 1)
        return convert.fourier_tempo_frequencies(
            sr=sr, win_length=wl + 2, hop_length=hop_length
        )[: n + 1]
    if axis_type == "tonnetz":
        return np.arange(n + 1)
    raise ParameterError(f"Unknown axis type: {axis_type}")


def _decorate_axis(
    axis, ax_type: Optional[str], *, key: str = "C:maj",
    Sa: Optional[float] = None, mela: Optional[Any] = None,
    thaat: Optional[str] = None, unicode: bool = True,
    fmin: Optional[float] = None,
) -> None:
    from matplotlib.ticker import (
        LogLocator, MaxNLocator, NullFormatter, ScalarFormatter,
        SymmetricalLogLocator, FixedLocator,
    )

    if ax_type in ("time", "lag"):
        axis.set_major_formatter(TimeFormatter(lag=(ax_type == "lag")))
        axis.set_label_text("Lag" if ax_type == "lag" else "Time")
    elif ax_type in ("s", "ms", "lag_s", "lag_ms"):
        unit = "s" if ax_type.endswith("s") and not ax_type.endswith("ms") else "ms"
        lag = ax_type.startswith("lag")
        axis.set_major_formatter(TimeFormatter(lag=lag, unit=unit))
        axis.set_label_text(
            ("Lag" if lag else "Time") + f" ({unit})"
        )
    elif ax_type == "frames":
        axis.set_label_text("Frames")
    elif ax_type in ("linear", "hz", "fft"):
        axis.set_major_formatter(ScalarFormatter())
        axis.set_label_text("Hz")
    elif ax_type == "log":
        axis.set_major_formatter(LogHzFormatter())
        axis.set_label_text("Hz")
    elif ax_type == "mel":
        axis.set_major_formatter(ScalarFormatter())
        axis.set_label_text("Hz")
    elif ax_type in ("cqt_hz",):
        axis.set_major_formatter(LogHzFormatter())
        axis.set_label_text("Hz")
    elif ax_type in ("cqt", "cqt_note", "fft_note"):
        axis.set_major_formatter(NoteFormatter(key=key, unicode=unicode))
        axis.set_label_text("Note")
    elif ax_type in ("cqt_svara", "fft_svara"):
        axis.set_major_formatter(SvaraFormatter(Sa, mela=mela, unicode=unicode))
        axis.set_label_text("Svara")
    elif ax_type == "vqt_fjs":
        axis.set_major_formatter(
            FJSFormatter(fmin=fmin if fmin else 32.7, unicode=unicode)
        )
        axis.set_label_text("Note (FJS)")
    elif ax_type == "chroma":
        axis.set_major_formatter(ChromaFormatter(key=key, unicode=unicode))
        axis.set_major_locator(FixedLocator(0.5 + np.arange(12)))
        axis.set_label_text("Pitch class")
    elif ax_type in ("chroma_h", "chroma_c"):
        axis.set_major_formatter(
            ChromaSvaraFormatter(Sa=Sa, mela=mela, unicode=unicode)
        )
        axis.set_major_locator(FixedLocator(0.5 + np.arange(12)))
        axis.set_label_text("Svara")
    elif ax_type == "tempo":
        axis.set_major_formatter(ScalarFormatter())
        axis.set_label_text("BPM")
    elif ax_type == "fourier_tempo":
        axis.set_major_formatter(ScalarFormatter())
        axis.set_label_text("BPM")
    elif ax_type == "tonnetz":
        axis.set_major_formatter(TonnetzFormatter())
        axis.set_major_locator(FixedLocator(0.5 + np.arange(6)))
        axis.set_label_text("Tonnetz")
    elif ax_type in (None, "off", "none"):
        axis.set_label_text("")
        axis.set_ticks([])


_LOG_SCALED = {"log", "cqt", "cqt_hz", "cqt_note", "cqt_svara", "vqt_fjs",
               "tempo", "fourier_tempo"}


def specshow(
    data: Any,
    *,
    x_coords: Optional[np.ndarray] = None,
    y_coords: Optional[np.ndarray] = None,
    x_axis: Optional[str] = None,
    y_axis: Optional[str] = None,
    sr: float = 22050,
    hop_length: int = 512,
    n_fft: Optional[int] = None,
    win_length: Optional[int] = None,
    fmin: Optional[float] = None,
    fmax: Optional[float] = None,
    tuning: float = 0.0,
    bins_per_octave: int = 12,
    key: str = "C:maj",
    Sa: Optional[float] = None,
    mela: Optional[Any] = None,
    thaat: Optional[str] = None,
    auto_aspect: bool = True,
    htk: bool = False,
    unicode: bool = True,
    intervals: Optional[Any] = None,
    unison: Optional[str] = None,
    ax: Optional[Any] = None,
    **kwargs: Any,
):
    """Display a spectrogram/chromagram/cqt/etc. Parity: display.py:1441.

    Returns the QuadMesh artist.
    """
    plt = _mpl()

    data = np.atleast_2d(np.asarray(data))

    kwargs.setdefault("cmap", cmap(data))
    kwargs.setdefault("rasterized", True)
    kwargs.setdefault("edgecolors", "None")
    kwargs.setdefault("shading", "auto")

    all_params = dict(
        sr=sr, hop_length=hop_length, n_fft=n_fft, fmin=fmin, fmax=fmax,
        bins_per_octave=bins_per_octave, win_length=win_length,
    )

    if y_coords is None:
        y_coords = _coords(y_axis, data.shape[0], **all_params)[: data.shape[0] + 1]
    if x_coords is None:
        x_coords = _coords(x_axis, data.shape[1], **all_params)[: data.shape[1] + 1]

    if ax is None:
        ax = plt.gca()

    out = ax.pcolormesh(x_coords[: data.shape[1]], y_coords[: data.shape[0]],
                        data, **kwargs)

    # set limits
    ax.set_xlim(x_coords.min(), x_coords.max())
    ax.set_ylim(y_coords.min(), y_coords.max())

    # scaling
    if y_axis in _LOG_SCALED:
        pos = y_coords[y_coords > 0]
        if len(pos):
            ax.set_yscale("symlog", linthresh=float(pos.min()), base=2)
    if x_axis in _LOG_SCALED:
        pos = x_coords[x_coords > 0]
        if len(pos):
            ax.set_xscale("symlog", linthresh=float(pos.min()), base=2)

    _decorate_axis(
        ax.yaxis, y_axis, key=key, Sa=Sa, mela=mela, thaat=thaat,
        unicode=unicode, fmin=fmin,
    )
    _decorate_axis(
        ax.xaxis, x_axis, key=key, Sa=Sa, mela=mela, thaat=thaat,
        unicode=unicode, fmin=fmin,
    )

    return out


def waveshow(
    y: Any,
    *,
    sr: float = 22050,
    max_points: int = 11025,
    axis: str = "time",
    offset: float = 0.0,
    marker: str = "",
    where: str = "post",
    label: Optional[str] = None,
    transpose: bool = False,
    ax: Optional[Any] = None,
    x_axis: Optional[str] = None,
    **kwargs: Any,
) -> AdaptiveWaveplot:
    """Adaptive waveform display (envelope ↔ samples). Parity: display.py:2673."""
    plt = _mpl()

    y = np.asarray(y)
    if y.ndim > 1:
        y = np.asarray(core.to_mono(y))
    if not np.issubdtype(y.dtype, np.floating):
        raise ParameterError("Waveform data must be floating-point")

    if max_points <= 0:
        raise ParameterError("max_points must be strictly positive")

    if ax is None:
        ax = plt.gca()

    times = offset + np.arange(len(y)) / sr

    # envelope via max-pooling into ~max_points bins
    hop = max(1, len(y) // max_points)
    n_env = len(y) // hop
    env = np.abs(y[: n_env * hop]).reshape(n_env, hop).max(axis=1)
    env_times = offset + np.arange(n_env) * hop / sr

    if transpose:
        (steps,) = ax.step(y, times, where=where, marker=marker, **kwargs)
        envelope = ax.fill_betweenx(
            env_times, -env, env, label=label, **kwargs
        )
    else:
        (steps,) = ax.step(times, y, where=where, marker=marker, **kwargs)
        envelope = ax.fill_between(
            env_times, -env, env, label=label, **kwargs
        )

    awp = AdaptiveWaveplot(
        times, y, steps, envelope, sr=sr, max_points=max_points,
        transpose=transpose,
    )
    awp.update(ax)
    awp.connect(ax)

    taxis = ax.yaxis if transpose else ax.xaxis
    _decorate_axis(taxis, x_axis or axis)
    return awp


def wavebars(
    y: Any,
    *,
    sr: float = 22050,
    n_bars: int = 100,
    ax: Optional[Any] = None,
    color: Any = None,
    **kwargs: Any,
):
    """Bar-style waveform summary. Parity: display.py:2992."""
    plt = _mpl()
    y = np.asarray(y)
    if y.ndim > 1:
        y = np.asarray(core.to_mono(y))
    if ax is None:
        ax = plt.gca()

    hop = max(1, len(y) // n_bars)
    n = len(y) // hop
    env = np.abs(y[: n * hop]).reshape(n, hop).max(axis=1)
    times = (np.arange(n) + 0.5) * hop / sr
    width = 0.8 * hop / sr
    bars = ax.bar(times, 2 * env, width=width, bottom=-env, color=color,
                  **kwargs)
    ax.set_xlabel("Time")
    return bars


def wavef0(
    y: Any,
    f0: Any,
    *,
    sr: float = 22050,
    ax: Optional[Any] = None,
    hop_length: int = 512,
    **kwargs: Any,
):
    """Waveform with overlaid f0 contour. Parity: display.py:3176."""
    plt = _mpl()
    if ax is None:
        _, ax = plt.subplots()
    waveshow(y, sr=sr, ax=ax)
    ax2 = ax.twinx()
    f0 = np.asarray(f0)
    times = convert.frames_to_time(
        np.arange(len(f0)), sr=sr, hop_length=hop_length
    )
    (line,) = ax2.plot(times, f0, color="r", **kwargs)
    ax2.set_ylabel("f0 (Hz)")
    return line


def colorbar_db(mappable, *, ax: Optional[Any] = None, **kwargs: Any):
    """dB-formatted colorbar. Parity: display.py:3544."""
    plt = _mpl()
    kwargs.setdefault("format", "%+2.0f dB")
    return plt.colorbar(mappable, ax=ax, **kwargs)


def colorbar_phase(mappable, *, ax: Optional[Any] = None, **kwargs: Any):
    """Phase-formatted colorbar (−π..π). Parity: display.py:3461."""
    plt = _mpl()
    from matplotlib.ticker import FixedLocator, FixedFormatter

    cbar = plt.colorbar(mappable, ax=ax, **kwargs)
    cbar.set_ticks(
        FixedLocator([-np.pi, -np.pi / 2, 0, np.pi / 2, np.pi])
    )
    cbar.ax.yaxis.set_major_formatter(
        FixedFormatter([r"$-\pi$", r"$-\pi/2$", "$0$", r"$\pi/2$", r"$\pi$"])
    )
    return cbar


def multiplot(
    data: Sequence[Any],
    *,
    n_cols: int = 2,
    figsize: Optional[Any] = None,
    specshow_kw: Optional[Sequence[dict]] = None,
    **kwargs: Any,
):
    """Grid of spectrogram displays. Parity: display.py:3939."""
    plt = _mpl()
    n = len(data)
    n_rows = int(np.ceil(n / n_cols))
    fig, axes = plt.subplots(
        nrows=n_rows, ncols=n_cols, figsize=figsize, squeeze=False
    )
    arts = []
    for i, d in enumerate(data):
        ax = axes[i // n_cols][i % n_cols]
        kws = dict(kwargs)
        if specshow_kw is not None:
            kws.update(specshow_kw[i])
        arts.append(specshow(d, ax=ax, **kws))
    for j in range(n, n_rows * n_cols):
        axes[j // n_cols][j % n_cols].set_axis_off()
    return fig, axes, arts


def legend_for_axes(ax, **kwargs: Any):
    """Build a legend for all labeled artists on an axes. Parity: display.py:4122."""
    handles, labels = ax.get_legend_handles_labels()
    return ax.legend(handles, labels, **kwargs)


def highlight(
    intervals: Any,
    *,
    ax: Optional[Any] = None,
    axis: str = "x",
    color: Any = "C1",
    alpha: float = 0.3,
    **kwargs: Any,
) -> List[Any]:
    """Highlight time intervals on an axes. Parity: display.py:4251."""
    plt = _mpl()
    if ax is None:
        ax = plt.gca()
    spans = []
    for lo, hi in np.atleast_2d(np.asarray(intervals, dtype=float)):
        if axis == "x":
            spans.append(ax.axvspan(lo, hi, color=color, alpha=alpha, **kwargs))
        else:
            spans.append(ax.axhspan(lo, hi, color=color, alpha=alpha, **kwargs))
    return spans
