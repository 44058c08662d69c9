"""Harmonic energy interpolation (L2).

Interpolation along the frequency axis is a vectorized gather + lerp on
device (replacing scipy ``interp1d`` objects, reference
``librosa/core/harmonic.py:256-308``); exotic interpolation kinds fall back
to scipy on host.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..util import utils as util
from ..util.exceptions import ParameterError

__all__ = ["salience", "interp_harmonics", "f0_harmonics"]


def _lerp_1d(
    xq: jax.Array, xp: jax.Array, fp: jax.Array, fill_value: float
) -> jax.Array:
    """Linear interpolation of ``fp`` (F,) sampled at ``xp`` (F, ascending)
    evaluated at ``xq`` (Q,), out-of-range → fill_value."""
    F = xp.shape[0]
    i = jnp.clip(jnp.searchsorted(xp, xq, side="right") - 1, 0, F - 2)
    x0 = xp[i]
    x1 = xp[i + 1]
    w = (xq - x0) / jnp.where(x1 == x0, 1.0, x1 - x0)
    out = fp[i] * (1 - w) + fp[i + 1] * w
    in_range = (xq >= xp[0]) & (xq <= xp[-1])
    return jnp.where(in_range, out, fill_value)


def _nearest_1d(
    xq: jax.Array, xp: jax.Array, fp: jax.Array, fill_value: float
) -> jax.Array:
    F = xp.shape[0]
    i = jnp.clip(jnp.searchsorted(xp, xq, side="right") - 1, 0, F - 2)
    w = (xq - xp[i]) / jnp.where(xp[i + 1] == xp[i], 1.0, xp[i + 1] - xp[i])
    idx = jnp.where(w < 0.5, i, i + 1)
    out = fp[idx]
    in_range = (xq >= xp[0]) & (xq <= xp[-1])
    return jnp.where(in_range, out, fill_value)


def interp_harmonics(
    x: Any,
    *,
    freqs: np.ndarray,
    harmonics: Any,
    kind: str = "linear",
    fill_value: float = 0,
    axis: int = -2,
) -> jax.Array:
    """Resample a spectrum at integer-multiple (harmonic) frequencies.

    ``out[h, f, t] = S(harmonics[h] * freqs[f], t)`` by interpolation along
    the frequency axis (behavior parity with the reference
    ``core/harmonic.py:146``; supports 2-D time-varying ``freqs``).

    Parameters
    ----------
    x : spectrogram
    freqs : 1-D or 2-D bin frequencies
    harmonics : iterable of float
    kind : str
        interpolation kind
    fill_value : float
    axis : int
        frequency axis

    Returns
    -------
    x_harm : jax.Array [shape=(..., len(harmonics), f, t)]
    """
    x = jnp.asarray(x)
    freqs = np.asarray(freqs)
    harmonics = np.asarray(harmonics, dtype=float)

    if kind not in ("linear", "nearest"):
        return _interp_harmonics_scipy(
            np.asarray(x), freqs=freqs, harmonics=harmonics, kind=kind,
            fill_value=fill_value, axis=axis,
        )

    if freqs.ndim == 1 and len(freqs) == x.shape[axis]:
        if not bool(np.all(np.diff(freqs) != 0)):
            warnings.warn(
                "Frequencies are not unique. This may produce incorrect "
                "harmonic interpolations.",
                stacklevel=2,
            )
    elif freqs.shape != x.shape:
        raise ParameterError(
            f"freqs.shape={freqs.shape} is incompatible with input shape={x.shape}"
        )

    # the gather+lerp stacks run as ONE jitted program (eagerly ~15 ops
    # per harmonic)
    return _interp_harmonics_core(
        x, jnp.asarray(freqs),
        harmonics=tuple(float(h) for h in harmonics), kind=kind,
        fill_value=float(fill_value), axis=int(axis),
    )


@functools.partial(
    jax.jit,
    static_argnames=("harmonics", "kind", "fill_value", "axis"),
)
def _interp_harmonics_core(x, freqs, *, harmonics, kind, fill_value, axis):
    interp = _lerp_1d if kind == "linear" else _nearest_1d

    if freqs.ndim == 1:
        xp = freqs
        # move target axis last: (..., T, F)
        xm = jnp.swapaxes(x, axis, -1)
        lead = xm.shape[:-1]
        flat = xm.reshape(-1, xm.shape[-1])

        outs = []
        for h in harmonics:
            xq = h * freqs
            row = jax.vmap(lambda fp: interp(xq, xp, fp, fill_value))(flat)
            outs.append(row.reshape(*lead, -1))
        out = jnp.stack(outs, axis=0)  # (H, ..., T_on_last)
        out = jnp.swapaxes(out, axis, -1)  # put F back at axis
        # move harmonic axis from 0 to axis-1 position
        target = axis - 1 if axis < 0 else axis
        return jnp.moveaxis(out, 0, target if axis < 0 else axis)

    # time-varying frequencies: vectorize per frame
    xm = jnp.swapaxes(x, axis, -1)
    fm = jnp.swapaxes(freqs, axis, -1)
    lead = xm.shape[:-1]
    flat_x = xm.reshape(-1, xm.shape[-1])
    flat_f = fm.reshape(-1, fm.shape[-1])
    hj = jnp.asarray(np.asarray(harmonics))

    def per_frame(fr: jax.Array, fx: jax.Array) -> jax.Array:
        # targets: (F, H)
        tq = fr[:, None] * hj[None, :]
        return jax.vmap(
            lambda q: interp(q, fr, fx, fill_value), in_axes=1, out_axes=1
        )(tq)  # (F, H)

    out = jax.vmap(per_frame)(flat_f, flat_x)  # (B, F, H)
    out = out.reshape(*lead, out.shape[-2], out.shape[-1])
    out = jnp.swapaxes(out, -2, axis)
    return jnp.swapaxes(out, -1, axis - 1)


def _interp_harmonics_scipy(x, *, freqs, harmonics, kind, fill_value, axis):
    import scipy.interpolate

    f_interp = scipy.interpolate.interp1d(
        freqs, x, axis=axis, bounds_error=False, copy=False, kind=kind,
        fill_value=fill_value,
    )
    f_out = np.multiply.outer(harmonics, freqs)
    return jnp.asarray(f_interp(f_out))


def salience(
    S: Any,
    *,
    freqs: np.ndarray,
    harmonics: Sequence[float],
    weights: Optional[Any] = None,
    aggregate: Optional[Callable] = None,
    filter_peaks: bool = True,
    fill_value: float = np.nan,
    kind: str = "linear",
    axis: int = -2,
) -> jax.Array:
    """Harmonic salience: weighted sum of a spectrogram over harmonics.

    ``sum_h weights[h] * S(h * freq)`` via harmonic interpolation (behavior
    parity with the reference ``core/harmonic.py:25``).

    Parameters
    ----------
    S : spectrogram
    freqs : bin frequencies (1-D, or 2-D time-varying)
    harmonics : iterable of float
        harmonic ratios
    weights : iterable or None
        per-harmonic weights
    aggregate : callable or None
        harmonic aggregation (default weighted average)
    filter_peaks : bool
        zero non-peak bins first
    fill_value : float
        value for out-of-range/filtered bins
    kind : str
        interpolation kind
    axis : int
        frequency axis

    Returns
    -------
    salience : jax.Array, same shape as ``S``
    """
    if aggregate is None:
        aggregate = np.average

    if weights is None:
        weights = np.ones((len(harmonics),))
    else:
        weights = np.array(weights, dtype=float)

    S = jnp.asarray(S)

    if aggregate is np.average and kind in ("linear", "nearest"):
        freqs_np = np.asarray(freqs)
        if freqs_np.ndim == 1 and len(freqs_np) == S.shape[axis]:
            if not bool(np.all(np.diff(freqs_np) != 0)):
                warnings.warn(
                    "Frequencies are not unique. This may produce incorrect "
                    "harmonic interpolations.",
                    stacklevel=2,
                )
        elif freqs_np.shape != S.shape:
            raise ParameterError(
                f"freqs.shape={freqs_np.shape} is incompatible with input "
                f"shape={S.shape}"
            )
        # interpolation + weighted aggregate + peak filter as ONE program
        # (eagerly ~190 dispatches for a handful of harmonics)
        return _salience_core(
            S, jnp.asarray(np.asarray(freqs)),
            jnp.asarray(np.asarray(weights, dtype=np.float32)),
            harmonics=tuple(float(h) for h in harmonics), kind=kind,
            fill_value=float(fill_value), filter_peaks=bool(filter_peaks),
            axis=int(axis),
        )

    S_harm = interp_harmonics(
        S, freqs=freqs, harmonics=harmonics, kind=kind, axis=axis
    )

    if aggregate is np.average:
        w = util.expand_to(
            jnp.asarray(weights), ndim=S_harm.ndim,
            axes=(axis - 1) % S_harm.ndim,
        )
        S_sal = jnp.sum(S_harm * w, axis=axis - 1) / jnp.sum(weights)
    else:
        S_sal = jnp.asarray(aggregate(np.asarray(S_harm), axis=axis - 1))

    if filter_peaks:
        S_sal = _salience_peak_filter(S, S_sal, fill_value=float(fill_value),
                                      axis=int(axis))

    return S_sal


def _strict_peaks(S, axis):
    """argrelmax parity: strict local maxima on both sides."""
    peaks = util.localmax(S, axis=axis)
    # localmax uses >= on the right — refine to strict
    Sm = jnp.swapaxes(S, axis, -1)
    strict = jnp.concatenate(
        [
            Sm[..., :-1] > Sm[..., 1:],
            jnp.zeros_like(Sm[..., :1], dtype=bool),
        ],
        axis=-1,
    )
    return peaks & jnp.swapaxes(strict, axis, -1)


@functools.partial(jax.jit, static_argnames=("fill_value", "axis"))
def _salience_peak_filter(S, S_sal, *, fill_value, axis):
    return jnp.where(_strict_peaks(S, axis), S_sal, fill_value)


@functools.partial(
    jax.jit,
    static_argnames=("harmonics", "kind", "fill_value", "filter_peaks",
                     "axis"),
)
def _salience_core(S, freqs, weights, *, harmonics, kind, fill_value,
                   filter_peaks, axis):
    S_harm = _interp_harmonics_core(
        S, freqs, harmonics=harmonics, kind=kind, fill_value=0.0, axis=axis
    )
    w = util.expand_to(
        weights, ndim=S_harm.ndim, axes=(axis - 1) % S_harm.ndim
    )
    S_sal = jnp.sum(S_harm * w, axis=axis - 1) / jnp.sum(weights)
    if filter_peaks:
        S_sal = jnp.where(_strict_peaks(S, axis), S_sal, fill_value)
    return S_sal


def f0_harmonics(
    x: Any,
    *,
    f0: Any,
    freqs: np.ndarray,
    harmonics: Any,
    kind: str = "linear",
    fill_value: float = 0,
    axis: int = -2,
) -> jax.Array:
    """Sample a spectrogram at harmonics of a time-varying f0 track.

    Parity: core/harmonic.py:315.

    Parameters
    ----------
    x : spectrogram
    f0 : per-frame fundamental frequencies
    freqs : bin frequencies
    harmonics : iterable of float
    kind, fill_value, axis
        interpolation controls

    Returns
    -------
    f0_harm : jax.Array [shape=(..., len(harmonics), t)]
    """
    x = jnp.asarray(x)
    freqs_np = np.asarray(freqs, dtype=float)
    harmonics = np.asarray(harmonics, dtype=float)
    f0 = jnp.asarray(f0)

    if kind not in ("linear", "nearest"):
        raise ParameterError(
            f"kind={kind} interpolation is not supported on device; "
            "use 'linear' or 'nearest'"
        )

    if freqs_np.ndim == 1 and len(freqs_np) == x.shape[axis]:
        idx = np.isfinite(freqs_np)
        fsel = freqs_np[idx]
        order = np.argsort(fsel)
        fsel = fsel[order]
        sel = np.flatnonzero(idx)[order]
        # gather + per-frame interp as ONE program (host precomputes the
        # finite-frequency selection)
        return _f0_harmonics_static_core(
            x, jnp.asarray(sel.astype(np.int32)), jnp.asarray(fsel), f0,
            harmonics=tuple(float(h) for h in harmonics), kind=kind,
            fill_value=float(fill_value), axis=int(axis),
        )
    elif freqs_np.shape == x.shape:
        return _f0_harmonics_dynamic_core(
            x, jnp.asarray(freqs_np), f0,
            harmonics=tuple(float(h) for h in harmonics), kind=kind,
            fill_value=float(fill_value), axis=int(axis),
        )
    raise ParameterError(
        f"freqs.shape={freqs_np.shape} is incompatible with input shape={x.shape}"
    )


@functools.partial(
    jax.jit,
    static_argnames=("harmonics", "kind", "fill_value", "axis"),
)
def _f0_harmonics_static_core(x, sel, fsel, f0, *, harmonics, kind,
                              fill_value, axis):
    interp = _lerp_1d if kind == "linear" else _nearest_1d

    xm = jnp.swapaxes(x, axis, -1)  # (..., T, F)
    xm = xm[..., sel]
    lead = xm.shape[:-1]
    flat_x = xm.reshape(-1, xm.shape[-1])

    # per-frame targets: f0 broadcastable to lead dims
    f0b = jnp.broadcast_to(f0, lead)
    flat_f0 = f0b.reshape(-1)
    hj = jnp.asarray(np.asarray(harmonics))

    def per_frame(fx: jax.Array, f0_t: jax.Array) -> jax.Array:
        return interp(f0_t * hj, fsel, fx, fill_value)

    out = jax.vmap(per_frame)(flat_x, flat_f0)  # (B, H)
    out = out.reshape(*lead, len(harmonics))
    out = jnp.swapaxes(out, -1, axis)  # harmonics land on the target axis
    return jnp.nan_to_num(out, nan=fill_value)


@functools.partial(
    jax.jit,
    static_argnames=("harmonics", "kind", "fill_value", "axis"),
)
def _f0_harmonics_dynamic_core(x, freqs, f0, *, harmonics, kind,
                               fill_value, axis):
    interp = _lerp_1d if kind == "linear" else _nearest_1d

    xm = jnp.swapaxes(x, axis, -1)
    fm = jnp.swapaxes(freqs, axis, -1)
    lead = xm.shape[:-1]
    flat_x = xm.reshape(-1, xm.shape[-1])
    flat_f = fm.reshape(-1, fm.shape[-1])
    f0b = jnp.broadcast_to(f0, lead).reshape(-1)
    hj = jnp.asarray(np.asarray(harmonics))

    def per_frame_d(fx, fr, f0_t):
        # sort by frequency; non-finite pushed to the end with +inf
        key = jnp.where(jnp.isfinite(fr), fr, jnp.inf)
        order = jnp.argsort(key)
        return interp(f0_t * hj, key[order], fx[order], fill_value)

    out = jax.vmap(per_frame_d)(flat_x, flat_f, f0b)
    out = out.reshape(*lead, len(harmonics))
    out = jnp.swapaxes(out, -1, axis)
    return jnp.nan_to_num(out, nan=fill_value)
