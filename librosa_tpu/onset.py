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
            "aggregate parameter cannot be False when computing full-spectrum "
            "onset strength."
        )
    # _squeeze_channel folds the trailing [..., 0, :] into the fused
    # default program (otherwise it costs two extra eager device
    # dispatches — dynamic_slice + squeeze — per call over the tunnel)
    return onset_strength_multi(
        y=y, sr=sr, S=S, lag=lag, max_size=max_size, ref=ref, detrend=detrend,
        center=center, feature=feature, aggregate=aggregate, channels=None,
        _squeeze_channel=True, **kwargs,
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

    if not util.is_positive_int(lag):
        raise ParameterError(f"lag={lag} must be a positive integer")
    if not util.is_positive_int(max_size):
        raise ParameterError(f"max_size={max_size} must be a positive integer")

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

    if ref is None:
        if max_size == 1:
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
    else:
        ref_arr = jnp.asarray(ref)
        if ref_arr.shape != S.shape:
            raise ParameterError(
                f"Reference spectrum shape {ref_arr.shape} must match input "
                f"spectrum {S.shape}"
            )

    # lagged positive first difference
    onset_env = S[..., lag:] - ref_arr[..., :-lag]
    onset_env = jnp.maximum(0.0, onset_env)

    pad = True
    if channels is None:
        channels = [slice(None)]
    else:
        pad = False

    if callable(aggregate):
        onset_env = util.sync(
            onset_env, channels, aggregate=aggregate, pad=pad, axis=-2
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
    energy = np.asarray(energy)
    minima = np.flatnonzero(
        (energy[1:-1] <= energy[:-2]) & (energy[1:-1] < energy[2:])
    )
    minima = util.fix_frames(1 + minima, x_min=0)
    return minima[match_events(np.asarray(events), minima, right=False)]


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
            raise ParameterError("y or onset_envelope must be provided")
        onset_envelope = onset_strength(y=y, sr=sr, hop_length=hop_length)

    onset_envelope = np.asarray(onset_envelope)

    if normalize:
        onset_envelope = onset_envelope - np.min(
            onset_envelope, keepdims=True, axis=-1
        )
        onset_envelope = onset_envelope / (
            np.max(onset_envelope, keepdims=True, axis=-1)
            + util.tiny(onset_envelope)
        )

    if not onset_envelope.any() or not np.all(np.isfinite(onset_envelope)):
        onsets = (
            np.array([], dtype=int)
            if sparse
            else np.zeros_like(onset_envelope, dtype=bool)
        )
    else:
        # ms-tuned defaults (onset.py:184-189)
        kwargs.setdefault("pre_max", 0.03 * sr // hop_length)
        kwargs.setdefault("post_max", 0.00 * sr // hop_length + 1)
        kwargs.setdefault("pre_avg", 0.10 * sr // hop_length)
        kwargs.setdefault("post_avg", 0.10 * sr // hop_length + 1)
        kwargs.setdefault("wait", 0.03 * sr // hop_length)
        kwargs.setdefault("delta", 0.07)

        onsets = util.peak_pick(onset_envelope, sparse=sparse, axis=-1, **kwargs)

        if backtrack:
            if not sparse:
                raise ParameterError(
                    "onset backtracking is only supported if sparse=True"
                )
            if energy is None:
                energy = onset_envelope
            onsets = onset_backtrack(onsets, energy)

    if sparse:
        if units == "frames":
            pass
        elif units == "samples":
            onsets = core.frames_to_samples(onsets, hop_length=hop_length)
        elif units == "time":
            onsets = core.frames_to_time(onsets, hop_length=hop_length, sr=sr)
        else:
            raise ParameterError(f"Invalid unit type: {units}")
    return onsets
