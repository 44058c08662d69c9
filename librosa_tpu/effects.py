"""Time-domain audio effects (L5).

Harmonic/percussive separation, time stretching, pitch shifting, silence
trimming — thin compositions over the device STFT/ISTFT/HPSS/resample
kernels.  Parity citations refer to ``librosa/effects.py``.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import core, decompose, feature
from .ops import iir as _iir_ops
from .util import utils as util
from .util.exceptions import ParameterError

__all__ = [
    "hpss",
    "harmonic",
    "percussive",
    "time_stretch",
    "pitch_shift",
    "remix",
    "trim",
    "split",
    "preemphasis",
    "deemphasis",
]


import functools


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "power", "mask", "margin", "n_fft", "hop_length",
        "win_length", "window", "center", "pad_mode",
    ),
)
def _hpss_stft_jit(
    y, *, kernel_size, power, mask, margin, n_fft, hop_length, win_length,
    window, center, pad_mode,
):
    """One program for stft → median-mask separation → 2× istft.

    A single jit both removes per-op dispatch latency and keeps the
    complex STFT inside one program (the axon backend rejects complex
    operands crossing eager program boundaries with non-default layouts).
    """
    D = core.stft(
        y, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )
    stft_harm, stft_perc = decompose.hpss(
        D, kernel_size=kernel_size, power=power, mask=mask, margin=margin
    )
    istft_kw = dict(
        dtype=y.dtype, n_fft=n_fft, hop_length=hop_length,
        win_length=win_length, window=window, center=center,
        length=y.shape[-1],
    )
    y_harm = core.istft(stft_harm, **istft_kw)
    y_perc = core.istft(stft_perc, **istft_kw)
    return y_harm, y_perc


def _hpss_stft_pipeline(
    y: Any,
    *,
    kernel_size: Any = 31,
    power: float = 2.0,
    mask: bool = False,
    margin: Any = 1.0,
    n_fft: int = 2048,
    hop_length: Any = None,
    win_length: Any = None,
    window: Any = "hann",
    center: bool = True,
    pad_mode: str = "constant",
) -> Tuple[jax.Array, jax.Array]:
    """stft → decompose.hpss → istft with length matched to ``y``."""
    y = jnp.asarray(y)

    def _h(v):
        """Hashable static form, preserving int-ness (kernel sizes)."""
        def _scalar(x):
            x = x.item() if hasattr(x, "item") else x
            return int(x) if float(x).is_integer() else float(x)

        if isinstance(v, (list, tuple, np.ndarray)):
            return tuple(_scalar(x) for x in np.asarray(v).ravel())
        return _scalar(v)

    if isinstance(window, (str, tuple)):
        return _hpss_stft_jit(
            y, kernel_size=_h(kernel_size), power=float(power),
            mask=bool(mask), margin=_h(margin), n_fft=n_fft,
            hop_length=hop_length, win_length=win_length, window=window,
            center=bool(center), pad_mode=pad_mode,
        )

    # non-hashable window spec (array/callable): eager chain
    D = core.stft(
        y, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )
    stft_harm, stft_perc = decompose.hpss(
        D, kernel_size=kernel_size, power=power, mask=mask, margin=margin
    )
    istft_kw = dict(
        dtype=y.dtype, n_fft=n_fft, hop_length=hop_length,
        win_length=win_length, window=window, center=center,
        length=y.shape[-1],
    )
    return (
        core.istft(stft_harm, **istft_kw),
        core.istft(stft_perc, **istft_kw),
    )


def hpss(
    y: Any,
    *,
    kernel_size: Any = 31,
    power: float = 2.0,
    mask: bool = False,
    margin: Any = 1.0,
    n_fft: int = 2048,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Any = "hann",
    center: bool = True,
    pad_mode: str = "constant",
) -> Tuple[jax.Array, jax.Array]:
    """Decompose audio into harmonic and percussive components.

    Accepts the median-filter/mask parameters of :func:`decompose.hpss`
    (``kernel_size, power, mask, margin``) plus the STFT analysis
    parameters (``n_fft, hop_length, win_length, window, center,
    pad_mode``) that are threaded through the round trip.

    Parity: effects.py:70 — stft → decompose.hpss → istft.
    """
    return _hpss_stft_pipeline(
        y, kernel_size=kernel_size, power=power, mask=mask, margin=margin,
        n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )


def harmonic(
    y: Any,
    *,
    kernel_size: Any = 31,
    power: float = 2.0,
    mask: bool = False,
    margin: Any = 1.0,
    n_fft: int = 2048,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Any = "hann",
    center: bool = True,
    pad_mode: str = "constant",
) -> jax.Array:
    """Extract the harmonic (tonal) component of an audio signal.

    Runs ``istft(harmonic_mask · stft(y))`` as one fused device
    program; the mask comes from median-filter HPSS (see
    ``decompose.hpss``).

    Parameters
    ----------
    y : array-like
        input signal (multichannel supported on leading axes)
    kernel_size, power, mask, margin
        median-filter separation controls (see ``decompose.hpss``)
    n_fft, hop_length, win_length, window, center, pad_mode
        STFT analysis parameters threaded through the round trip

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> t = np.arange(22050) / 22050
    >>> y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    >>> yh = np.asarray(lt.effects.harmonic(y))
    >>> yh.shape == y.shape
    True

    Returns
    -------
    y_harmonic : jax.Array, same shape as ``y``
    """
    return _hpss_stft_pipeline(
        y, kernel_size=kernel_size, power=power, mask=mask, margin=margin,
        n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )[0]


def percussive(
    y: Any,
    *,
    kernel_size: Any = 31,
    power: float = 2.0,
    mask: bool = False,
    margin: Any = 1.0,
    n_fft: int = 2048,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Any = "hann",
    center: bool = True,
    pad_mode: str = "constant",
) -> jax.Array:
    """Extract the percussive component of an audio signal.

    ``istft(percussive_mask * stft(y))`` in one fused program; see
    ``effects.hpss`` (parity: effects.py:312).

    Parameters
    ----------
    y : input signal
    kernel_size, power, mask, margin
        separation controls (see ``decompose.hpss``)
    n_fft, hop_length, win_length, window, center, pad_mode
        STFT analysis parameters

    Returns
    -------
    y_percussive : jax.Array, same shape as ``y``
    """
    return _hpss_stft_pipeline(
        y, kernel_size=kernel_size, power=power, mask=mask, margin=margin,
        n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )[1]


@functools.partial(jax.jit, static_argnames=("rate", "len_stretch"))
def _time_stretch_jit(y, *, rate: float, len_stretch: int):
    D = core.stft(y)
    D_stretch = core.phase_vocoder(D, rate=rate)
    return core.istft(D_stretch, dtype=y.dtype, length=len_stretch)


def time_stretch(y: Any, *, rate: float, **kwargs: Any) -> jax.Array:
    """Time-stretch audio by ``rate`` (pitch-preserving).

    STFT → phase vocoder → ISTFT, length-targeted (behavior parity with the
    reference ``effects.py:426``); on TPU the whole chain is one program.

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)]
        input audio
    rate : float > 0
        stretch factor: ``rate > 1`` speeds up, ``rate < 1`` slows down
    **kwargs
        forwarded to the phase vocoder / STFT

    Returns
    -------
    y_stretch : jax.Array [shape=(..., round(n / rate))]
        stretched audio

    See Also
    --------
    pitch_shift, phase_vocoder

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=1.0))
    >>> fast = lt.effects.time_stretch(y, rate=2.0)
    >>> fast.shape[-1] == len(y) // 2
    True
    """
    if rate <= 0:
        raise ParameterError("rate must be a positive number")
    y = jnp.asarray(y)
    len_stretch = round(y.shape[-1] / rate)
    if not kwargs:
        # default configuration: one fused program
        return _time_stretch_jit(y, rate=float(rate), len_stretch=len_stretch)
    stft = core.stft(y, **kwargs)
    stft_stretch = core.phase_vocoder(stft, rate=rate)
    return core.istft(stft_stretch, dtype=y.dtype, length=len_stretch, **kwargs)


def pitch_shift(
    y: Any,
    *,
    sr: float,
    n_steps: float,
    bins_per_octave: int = 12,
    res_type: str = "soxr_hq",
    scale: bool = False,
    **kwargs: Any,
) -> jax.Array:
    """Shift the pitch of audio by ``n_steps`` bins (duration-preserving).

    Time-stretch by ``2**(-n_steps/bins_per_octave)`` then resample back to
    ``sr`` (behavior parity with the reference ``effects.py:487``).

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)]
        input audio
    sr : number > 0
        sampling rate
    n_steps : float
        pitch shift in ``bins_per_octave`` fractions of an octave
        (positive = up)
    bins_per_octave : int > 0
        bins per octave (12 = semitones)
    res_type : str
        resampling mode for the rate correction
    scale : bool
        rescale to preserve total energy
    **kwargs
        forwarded to ``time_stretch``

    Returns
    -------
    y_shift : jax.Array [shape=(..., n)]
        pitch-shifted audio

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=1.0))
    >>> up = lt.effects.pitch_shift(y, sr=22050, n_steps=12, res_type='fft')
    >>> up.shape == y.shape
    True
    """
    if not util.is_positive_int(bins_per_octave):
        raise ParameterError(
            f"the octave must divide into a positive integer number of "
            f"bins; got bins_per_octave={bins_per_octave}"
        )
    y = jnp.asarray(y)
    # Raising pitch by k bins == playing the signal 2^(k/bpo) times faster.
    # Phase-vocode to the reciprocal rate (preserving duration), then
    # resample the slowed signal back to sr as if it had been recorded at
    # sr/rate — the speed-up supplies the pitch shift.
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    slowed = time_stretch(y, rate=rate, **kwargs)
    shifted = core.resample(
        slowed, res_type=res_type, scale=scale,
        orig_sr=float(sr) / rate, target_sr=sr,
    )
    # stretch+resample rounding can add/drop a few samples
    return util.fix_length(shifted, size=y.shape[-1])


def remix(
    y: Any, intervals: Iterable[Tuple[int, int]], *, align_zeros: bool = True
) -> jax.Array:
    """Re-order time intervals of a signal.

    Parity: effects.py:577 — concatenates ``y[start:end]`` for each interval,
    optionally aligning boundaries to zero crossings to avoid clicks.

    Parameters
    ----------
    y : input signal
    intervals : iterable of (start, end) sample pairs
    align_zeros : bool
        snap interval boundaries to the nearest zero crossing

    Returns
    -------
    y_remix : jax.Array
    """
    y = jnp.asarray(y)

    if align_zeros:
        # host twin of zero_crossings (the boundary snap is index math on
        # a fetched mono copy; device ops here would cost ~3 round trips
        # per interval)
        y_np = np.asarray(y)
        y_mono = y_np if y_np.ndim == 1 else np.mean(
            y_np, axis=tuple(range(y_np.ndim - 1))
        )
        # zero_crossings defaults: threshold=1e-10, zero_pos=True, pad=True
        yt = np.where(np.abs(y_mono) <= 1e-10, 0.0, y_mono)
        signs = np.signbit(yt)
        crossings = np.concatenate([[True], signs[1:] != signs[:-1]])
        zeros = np.append(np.nonzero(crossings)[-1], [len(y_mono)])

    from .util.matching import match_events

    bounds = []
    for interval in intervals:
        if align_zeros:
            interval = zeros[match_events(np.asarray(interval), zeros)]
        bounds.append((int(interval[0]), int(interval[1])))

    # slice + concat as ONE program per interval layout
    return _remix_core(y, bounds=tuple(bounds))


@functools.partial(jax.jit, static_argnames=("bounds",))
def _remix_core(y, *, bounds):
    return jnp.concatenate(
        [y[..., start:end] for start, end in bounds], axis=-1
    )


def _signal_to_frame_nonsilent(
    y: Any,
    frame_length: int = 2048,
    hop_length: int = 512,
    top_db: float = 60,
    ref: Union[Callable, float] = np.max,
    aggregate: Callable = np.max,
) -> np.ndarray:
    """Frame-wise non-silence indicator. Parity: effects.py:641."""
    if aggregate in (np.max, jnp.max):
        # rms → dB → aggregate → threshold as ONE program; only the tiny
        # boolean mask is fetched (eagerly this chain cost ~15 dispatches)
        return np.asarray(_nonsilent_core(
            jnp.asarray(y),
            None if callable(ref) else jnp.asarray(ref),
            frame_length=int(frame_length), hop_length=int(hop_length),
            top_db=float(top_db), ref_fn=ref if callable(ref) else None,
        ))
    mse = feature.rms(y=y, frame_length=frame_length, hop_length=hop_length)
    level = np.asarray(
        core.amplitude_to_db(np.asarray(mse)[..., 0, :], ref=ref, top_db=None)
    )
    # collapse channel axes one at a time (successive reduction matters
    # for order-dependent aggregates like median)
    while level.ndim > 1:
        level = np.asarray(aggregate(level, axis=0))
    return level > -top_db


@functools.partial(
    jax.jit,
    static_argnames=("frame_length", "hop_length", "top_db", "ref_fn"),
)
def _nonsilent_core(y, ref_val, *, frame_length, hop_length, top_db, ref_fn):
    mse = feature.rms(
        y=y, frame_length=frame_length, hop_length=hop_length
    )[..., 0, :]
    db = core.amplitude_to_db(
        mse, ref=(ref_fn if ref_fn is not None else ref_val), top_db=None
    )
    if db.ndim > 1:
        db = jnp.max(db, axis=tuple(range(db.ndim - 1)))
    return db > -top_db


def trim(
    y: Any,
    *,
    top_db: float = 60,
    ref: Union[float, Callable] = np.max,
    frame_length: int = 2048,
    hop_length: int = 512,
    aggregate: Callable = np.max,
) -> Tuple[jax.Array, np.ndarray]:
    """Trim leading and trailing silence.

    Frames quieter than ``top_db`` below the peak (on a framewise RMS dB
    scale) are cut from both ends (behavior parity with the reference
    ``effects.py:700``).

    Parameters
    ----------
    y : input signal
    top_db : float > 0
        silence threshold below peak
    ref : scalar or callable
        dB reference
    frame_length, hop_length : int > 0
        analysis geometry
    aggregate : callable
        channel aggregation

    Returns
    -------
    y_trimmed : jax.Array
    index : np.ndarray [shape=(2,)]
        start/end sample indices of the kept region
    """
    y = jnp.asarray(y)
    active = _signal_to_frame_nonsilent(
        y, frame_length=frame_length, hop_length=hop_length, ref=ref,
        top_db=top_db, aggregate=aggregate,
    )
    lo = hi = 0
    if active.any():
        # first active frame, and one past the last active frame
        first = int(np.argmax(active))
        last = active.size - int(np.argmax(active[::-1]))
        lo = int(core.frames_to_samples(first, hop_length=hop_length))
        hi = min(
            y.shape[-1],
            int(core.frames_to_samples(last, hop_length=hop_length)),
        )
    return y[..., lo:hi], np.asarray([lo, hi])


def split(
    y: Any,
    *,
    top_db: float = 60,
    ref: Union[float, Callable] = np.max,
    frame_length: int = 2048,
    hop_length: int = 512,
    aggregate: Callable = np.max,
) -> np.ndarray:
    """Split audio into non-silent intervals.

    Parity: effects.py:786 — complements ``trim`` by returning every
    non-silent region.

    Parameters
    ----------
    y, top_db, ref, frame_length, hop_length, aggregate
        as in ``trim``

    Returns
    -------
    intervals : np.ndarray [shape=(m, 2)]
        start/end sample indices of non-silent regions
    """
    y = jnp.asarray(y)
    active = _signal_to_frame_nonsilent(
        y, frame_length=frame_length, hop_length=hop_length, ref=ref,
        top_db=top_db, aggregate=aggregate,
    )
    # Sentinel-pad the activity mask so every run has both a rising and a
    # falling edge, then pair them up.
    fenced = np.concatenate(([False], np.asarray(active, bool), [False]))
    steps = np.diff(fenced.astype(np.int8))
    run_starts = np.flatnonzero(steps > 0)
    run_ends = np.flatnonzero(steps < 0)
    bounds = core.frames_to_samples(
        np.stack([run_starts, run_ends], axis=1), hop_length=hop_length
    )
    return np.minimum(bounds, y.shape[-1])


def preemphasis(
    y: Any,
    *,
    coef: float = 0.97,
    zi: Optional[Any] = None,
    return_zf: bool = False,
):
    """First-order pre-emphasis filter ``y[n] - coef * y[n-1]``.

    Parity: effects.py:872, including the streaming ``zi`` initial state and
    ``return_zf`` final state for blockwise processing.

    Parameters
    ----------
    y : input signal
    coef : float
        filter coefficient (typically 0.97)
    zi : array or None
        initial filter delay state
    return_zf : bool
        also return the final state

    Returns
    -------
    y_out : jax.Array (and ``zf`` if requested)
    """
    return _preemph_core(
        jnp.asarray(y), None if zi is None else jnp.asarray(zi),
        coef=float(coef), return_zf=bool(return_zf),
    )


@functools.partial(jax.jit, static_argnames=("coef", "return_zf"))
def _preemph_core(y, zi, *, coef, return_zf):
    if zi is None:
        # linear extrapolation for the pre-signal sample
        zi = 2 * y[..., 0:1] - y[..., 1:2]
    zi = jnp.atleast_1d(zi.astype(y.dtype))

    y_out, z_f = _iir_ops.first_order_filter(
        y, b0=1.0, b1=-coef, a1=0.0, zi=zi
    )
    if return_zf:
        return y_out, z_f[..., None]
    return y_out


def deemphasis(
    y: Any,
    *,
    coef: float = 0.97,
    zi: Optional[Any] = None,
    return_zf: bool = False,
):
    """Invert a pre-emphasis filter (IIR ``1 / (1 - coef z^-1)``).

    Parity: effects.py:985; runs as a parallel associative scan with
    streaming ``zi`` support.

    Parameters
    ----------
    y : pre-emphasized signal
    coef : float
        filter coefficient
    zi : array or None
        initial state
    return_zf : bool
        also return the final state

    Returns
    -------
    y_out : jax.Array (and ``zf`` if requested)
    """
    return _deemph_core(
        jnp.asarray(y), None if zi is None else jnp.asarray(zi),
        coef=float(coef), return_zf=bool(return_zf),
    )


@functools.partial(jax.jit, static_argnames=("coef", "return_zf"))
def _deemph_core(y, zi, *, coef, return_zf):
    if zi is None:
        y_out, zf = _iir_ops.first_order_filter(
            y, b0=1.0, b1=0.0, a1=-coef,
            zi=jnp.zeros(y.shape[:-1] + (1,), dtype=y.dtype),
        )
        # The zi=None branch estimates the pre-signal state from linear
        # extrapolation and removes its decaying transient (effects.py:985).
        y_out = y_out - (
            ((2 - coef) * y[..., 0:1] - y[..., 1:2])
            / (3 - coef)
            * (coef ** jnp.arange(y.shape[-1], dtype=y.dtype))
        )
    else:
        zi_a = jnp.atleast_1d(zi.astype(y.dtype))
        y_out, zf = _iir_ops.first_order_filter(
            y, b0=1.0, b1=0.0, a1=-coef, zi=zi_a
        )

    if return_zf:
        return y_out, zf[..., None]
    return y_out
