"""Onset detection: spectral-flux novelty + event picking (L5).

Parity citations refer to ``librosa/onset.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .feature.spectral import melspectrogram
from .ops import iir as _iir_ops
from .util import utils as util
from .util.exceptions import ParameterError
from .util.matching import match_events

__all__ = ["onset_detect", "onset_strength", "onset_strength_multi", "onset_backtrack"]


def onset_strength(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    lag: int = 1,
    max_size: int = 1,
    ref: Optional[Any] = None,
    detrend: bool = False,
    center: bool = True,
    feature: Optional[Callable] = None,
    aggregate: Optional[Union[Callable, bool]] = None,
    **kwargs: Any,
) -> jax.Array:
    """Spectral-flux onset strength envelope.

    The lagged positive first difference of a log-power mel spectrogram,
    aggregated across bands (behavior parity with the reference
    ``onset.py:217``).  Default configurations (mean or median aggregation)
    run as ONE fused device program.

    Parameters
    ----------
    y, sr, S, n_fft, hop_length
        signal or precomputed log-power spectrogram
    lag : int > 0
        difference lag in frames
    max_size : int > 0
        SuperFlux frequency max-filter width (1 = plain flux)
    ref : np.ndarray or None
        explicit reference spectrum
    detrend : bool
        high-pass the envelope
    center : bool
        pad so the envelope aligns with centered frames
    feature : callable
        spectrogram feature (default mel)
    aggregate : callable
        band aggregation (default mean)
    **kwargs
        forwarded to the feature

    Returns
    -------
    onset_envelope : jax.Array [shape=(..., t)]
    """
    if aggregate is False:
        raise ParameterError(
            "onset_strength always aggregates over frequency; use "
            "onset_strength_multi for unaggregated envelopes"
        )
    # _squeeze_channel folds the trailing [..., 0, :] into the fused
    # default program (otherwise it costs two extra eager device
    # dispatches — dynamic_slice + squeeze — per call over the tunnel)
    return onset_strength_multi(
        _squeeze_channel=True,
        aggregate=aggregate,
        center=center,
        channels=None,
        detrend=detrend,
        feature=feature,
        lag=lag,
        max_size=max_size,
        ref=ref,
        S=S,
        sr=sr,
        y=y,
        **kwargs,
    )


def onset_strength_multi(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    lag: int = 1,
    max_size: int = 1,
    ref: Optional[Any] = None,
    detrend: bool = False,
    center: bool = True,
    feature: Optional[Callable] = None,
    aggregate: Optional[Union[Callable, bool]] = None,
    channels: Optional[Sequence] = None,
    **kwargs: Any,
) -> jax.Array:
    """Multi-band spectral-flux onset envelopes.

    Parity: onset.py:445 — like ``onset_strength`` but aggregating over the
    frequency slices in ``channels``.

    Parameters
    ----------
    channels : sequence of slices/indices or None
        band definitions (None = one global band)
    (remaining parameters as in ``onset_strength``)

    Returns
    -------
    onset_envelope : jax.Array [shape=(..., n_channels, t)]
    """
    # private flag from onset_strength(): drop the channel axis inside the
    # fused program instead of with eager post-ops
    _squeeze_channel = bool(kwargs.pop("_squeeze_channel", False))

    if feature is None:
        feature = melspectrogram
        kwargs.setdefault("fmax", 0.5 * sr)
    if aggregate is None:
        aggregate = jnp.mean

    for knob, value in (("lag", lag), ("max_size", max_size)):
        if not util.is_positive_int(value):
            raise ParameterError(
                f"{knob} must be a whole number of frames >= 1; got {value}"
            )

    # Fully-fused default path: mel → dB → flux → aggregate → pad in one
    # program (the per-op dispatch chain dominates on remote TPU links).
    _agg_name = (
        "mean" if aggregate is jnp.mean or aggregate is np.mean
        else "median" if aggregate is jnp.median or aggregate is np.median
        else None
    )
    if (
        S is None
        and y is not None
        and feature is melspectrogram
        and _agg_name is not None
        and ref is None
        and channels is None
        and not detrend
        and tuple(sorted(kwargs)) == ("fmax",)
    ):
        return _onset_strength_default(
            jnp.asarray(y), sr=float(sr), n_fft=n_fft,
            hop_length=hop_length, lag=lag, max_size=max_size,
            center=bool(center), fmax=float(kwargs["fmax"]),
            aggregate=_agg_name, squeeze_channel=_squeeze_channel,
        )

    if S is None:
        S = jnp.abs(
            feature(y=y, sr=sr, n_fft=n_fft, hop_length=hop_length, **kwargs)
        )
        S = core.power_to_db(S)
    else:
        S = jnp.asarray(S)

    S = jnp.atleast_2d(S)

    if ref is not None:
        ref_arr = jnp.asarray(ref)
        if ref_arr.shape != S.shape:
            raise ParameterError(
                f"the flux reference must match the spectrum shape "
                f"{S.shape}; got {ref_arr.shape}"
            )
    elif max_size == 1:
        ref_arr = S
    else:
        # centered 1-D max filter along frequency (SuperFlux)
        lpad = max_size // 2
        rpad = max_size - 1 - lpad
        pads = [(0, 0)] * S.ndim
        pads[-2] = (lpad, rpad)
        window_dims = [1] * S.ndim
        window_dims[-2] = max_size
        ref_arr = jax.lax.reduce_window(
            jnp.pad(S, pads, mode="edge"),
            -jnp.inf,
            jax.lax.max,
            tuple(window_dims),
            (1,) * S.ndim,
            "valid",
        )

    # lagged positive first difference (spectral flux)
    onset_env = jnp.maximum(0.0, S[..., lag:] - ref_arr[..., :-lag])

    # collapse frequency into the requested channel groups; with no
    # explicit channels everything folds into one band (padded output)
    groups = [slice(None)] if channels is None else channels
    if callable(aggregate):
        onset_env = util.sync(
            onset_env, groups, aggregate=aggregate,
            pad=channels is None, axis=-2,
        )

    # compensate for lag (and framing when centered)
    pad_width = lag
    if center:
        pad_width += n_fft // (2 * hop_length)

    padding = [(0, 0)] * onset_env.ndim
    padding[-1] = (int(pad_width), 0)
    onset_env = jnp.pad(onset_env, padding, mode="constant")

    if detrend:
        # DC-removal filter (1 - z^-1)/(1 - 0.99 z^-1) (reference onset.py:638),
        # run as a device associative scan instead of a host lfilter bounce.
        onset_env, _ = _iir_ops.first_order_filter(
            jnp.asarray(onset_env), b0=1.0, b1=-1.0, a1=-0.99,
            zi=jnp.zeros(np.shape(onset_env)[:-1] + (1,),
                         dtype=jnp.asarray(onset_env).dtype),
        )

    if center:
        onset_env = onset_env[..., : S.shape[-1]]
    if _squeeze_channel:
        onset_env = onset_env[..., 0, :]
    return onset_env


@functools.partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "hop_length", "lag", "max_size",
                     "center", "fmax", "aggregate", "squeeze_channel"),
)
def _onset_strength_default(
    y, *, sr, n_fft, hop_length, lag, max_size, center, fmax,
    aggregate="mean", squeeze_channel=False,
):
    """Default-config onset_strength as ONE program."""
    S = jnp.abs(
        melspectrogram(
            y=y, sr=sr, n_fft=n_fft, hop_length=hop_length, fmax=fmax
        )
    )
    S = core.power_to_db(S)
    S = jnp.atleast_2d(S)

    if max_size == 1:
        ref_arr = S
    else:
        lpad = max_size // 2
        rpad = max_size - 1 - lpad
        pads = [(0, 0)] * S.ndim
        pads[-2] = (lpad, rpad)
        window_dims = [1] * S.ndim
        window_dims[-2] = max_size
        ref_arr = jax.lax.reduce_window(
            jnp.pad(S, pads, mode="edge"), -jnp.inf, jax.lax.max,
            tuple(window_dims), (1,) * S.ndim, "valid",
        )

    onset_env = jnp.maximum(0.0, S[..., lag:] - ref_arr[..., :-lag])
    if aggregate == "median":
        onset_env = jnp.median(onset_env, axis=-2, keepdims=True)
    else:
        onset_env = jnp.mean(onset_env, axis=-2, keepdims=True)

    pad_width = lag
    if center:
        pad_width += n_fft // (2 * hop_length)
    padding = [(0, 0)] * onset_env.ndim
    padding[-1] = (int(pad_width), 0)
    onset_env = jnp.pad(onset_env, padding, mode="constant")
    if center:
        onset_env = onset_env[..., : S.shape[-1]]
    if squeeze_channel:
        onset_env = onset_env[..., 0, :]
    return onset_env


def onset_backtrack(events: np.ndarray, energy: Any) -> np.ndarray:
    """Roll onset detections back to the preceding local energy minimum.

    Useful for slicing audio at low-energy points before each attack
    (behavior parity with the reference ``onset.py:370``).

    Parameters
    ----------
    events : np.ndarray [int]
        detected onset frames
    energy : np.ndarray
        energy curve (e.g. onset envelope or RMS)

    Returns
    -------
    events_backtracked : np.ndarray [int]
    """
    level = np.asarray(energy)
    interior = level[1:-1]
    # local energy dips (flat-left allowed, strictly below to the right)
    dips = 1 + np.flatnonzero((interior <= level[:-2]) & (interior < level[2:]))
    dips = util.fix_frames(dips, x_min=0)
    # snap each onset to the nearest dip at or before it
    return dips[match_events(np.asarray(events), dips, right=False)]


def onset_detect(
    *,
    y: Any = None,
    sr: float = 22050,
    onset_envelope: Optional[Any] = None,
    hop_length: int = 512,
    backtrack: bool = False,
    energy: Optional[Any] = None,
    units: str = "frames",
    normalize: bool = True,
    sparse: bool = True,
    **kwargs: Any,
) -> np.ndarray:
    """Locate note onset events by peak-picking the onset envelope.

    Behavior parity with the reference ``onset.py:31``, including the
    millisecond-tuned peak-pick defaults and optional energy backtracking.

    Parameters
    ----------
    y, sr, onset_envelope, hop_length
        signal (or precomputed envelope from ``onset_strength``) and hop
    backtrack : bool
        roll each detection back to the preceding energy minimum
    energy : np.ndarray or None
        energy curve for backtracking (defaults to the onset envelope)
    units : 'frames', 'samples', or 'time'
        output units
    normalize : bool
        max-normalize the envelope before picking
    sparse : bool
        sparse event indices (True) or a dense boolean mask (False)
    **kwargs
        overrides for ``util.peak_pick`` parameters

    Returns
    -------
    onsets : np.ndarray
        onset event locations in the requested units

    See Also
    --------
    onset_strength, onset_backtrack, util.peak_pick

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.clicks(times=[0.2, 0.5, 0.9], sr=22050, length=22050))
    >>> frames = lt.onset.onset_detect(y=y, sr=22050)
    >>> len(frames)
    3
    """
    if onset_envelope is None:
        if y is None:
            raise ParameterError(
                "onset detection needs a signal (y) or an onset envelope"
            )
        onset_envelope = onset_strength(y=y, sr=sr, hop_length=hop_length)
    envelope = np.asarray(onset_envelope)
    if normalize:
        envelope = _rescale_unit_range(envelope)

    if not envelope.any() or not np.isfinite(envelope).all():
        # silent or non-finite envelope: nothing to detect
        picks = (
            np.array([], dtype=int) if sparse
            else np.zeros_like(envelope, dtype=bool)
        )
    else:
        params = _default_pick_params(sr, hop_length)
        params.update(kwargs)
        picks = util.peak_pick(envelope, sparse=sparse, axis=-1, **params)
        if backtrack:
            if not sparse:
                raise ParameterError(
                    "backtracking needs sparse=True (frame indices)"
                )
            picks = onset_backtrack(
                picks, envelope if energy is None else energy
            )

    if not sparse or units == "frames":
        return picks
    if units == "samples":
        return core.frames_to_samples(picks, hop_length=hop_length)
    if units == "time":
        return core.frames_to_time(picks, hop_length=hop_length, sr=sr)
    raise ParameterError(
        f"units must be frames, samples, or time; got {units!r}"
    )


def _rescale_unit_range(envelope: np.ndarray) -> np.ndarray:
    """Shift/scale an envelope to [0, 1] along its last axis."""
    floor = np.min(envelope, keepdims=True, axis=-1)
    span = np.max(envelope, keepdims=True, axis=-1) - floor
    return (envelope - floor) / (span + util.tiny(envelope))


def _default_pick_params(sr: float, hop_length: int) -> dict:
    """librosa's standard peak-picking geometry, in frames: 30 ms max
    windows and wait, 100 ms mean windows, threshold delta 0.07
    (reference onset.py:184-189)."""
    return {
        "pre_max": 0.03 * sr // hop_length,
        "post_max": 0.00 * sr // hop_length + 1,
        "pre_avg": 0.10 * sr // hop_length,
        "post_avg": 0.10 * sr // hop_length + 1,
        "wait": 0.03 * sr // hop_length,
        "delta": 0.07,
    }
