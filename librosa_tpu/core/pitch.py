"""Pitch estimation and tuning (L2).

Fully batched TPU implementations: YIN's cumulative mean normalized
difference runs as FFT autocorrelation + cumulative sums over frames (one
fused program, no per-frame Python), parabolic interpolation is a
shift-compare stencil.  Parity citations: ``librosa/core/pitch.py``.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..util import utils as util
from ..util.exceptions import ParameterError
from . import audio, convert
from .spectrum import _spectrogram

__all__ = [
    "estimate_tuning",
    "pitch_tuning",
    "piptrack",
    "yin",
    "pyin",
]


def _parabolic_interpolation(x: jax.Array, *, axis: int = -2) -> jax.Array:
    """Parabolic-optimum shift per bin; 0 where the shift would exceed ±1 bin.

    Parity: core/pitch.py:421 (_pi_stencil) — boundaries are 0.
    """
    xi = jnp.swapaxes(x, -1, axis)
    a = xi[..., 2:] + xi[..., :-2] - 2 * xi[..., 1:-1]
    b = (xi[..., 2:] - xi[..., :-2]) / 2
    shift = jnp.where(jnp.abs(b) >= jnp.abs(a), 0.0, -b / jnp.where(a == 0, 1.0, a))
    zero = jnp.zeros_like(xi[..., :1])
    out = jnp.concatenate([zero, shift, zero], axis=-1)
    return jnp.swapaxes(out, -1, axis)


def piptrack(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    n_fft: Optional[int] = 2048,
    hop_length: Optional[int] = None,
    fmin: float = 150.0,
    fmax: float = 4000.0,
    threshold: float = 0.1,
    win_length: Optional[int] = None,
    window: Any = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    ref: Optional[Union[float, Callable]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Pitch tracking on thresholded parabolically-interpolated STFT peaks.

    For every frame, spectral local maxima above ``threshold`` times the
    reference level (``ref``, per-frame max by default) are refined with
    parabolic interpolation; all other time-frequency cells are zero.

    Parameters
    ----------
    y : array-like or None
        audio signal
    sr : number > 0
        sampling rate
    S : array-like or None
        precomputed magnitude spectrogram (overrides ``y``)
    n_fft, hop_length, win_length, window, center, pad_mode
        framing controls, as in ``stft``
    fmin, fmax : float
        pitch search range in Hz
    threshold : float in (0, 1)
        fraction of the reference magnitude a peak must exceed
    ref : scalar, callable, or None
        reference magnitude (default per-frame max)

    Returns
    -------
    pitches : jax.Array [shape=(..., 1 + n_fft/2, t)]
        interpolated peak frequencies (Hz), 0 off-peak
    magnitudes : jax.Array [shape=(..., 1 + n_fft/2, t)]
        corrected peak magnitudes, 0 off-peak

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> t = np.arange(22050) / 22050
    >>> y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    >>> pitches, mags = lt.piptrack(y=y, sr=22050)
    >>> sel = np.asarray(pitches)[np.asarray(mags) > 0]
    >>> bool(abs(np.median(sel) - 440) < 2)
    True

    Parity: reference core/pitch.py:182.
    """
    S, n_fft = _spectrogram(
        y=y, S=S, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )

    fmin = max(fmin, 0)
    fmax = min(fmax, float(sr) / 2)

    if ref is None:
        ref = jnp.max
    # gradient → parabolic refine → peak mask → threshold as ONE program
    # (eagerly ~60 dispatches); a callable ref traces statically, a
    # scalar/array ref rides in as a traced argument
    return _piptrack_core(
        S, None if callable(ref) else jnp.asarray(ref),
        sr=float(sr), n_fft=int(n_fft), fmin=float(fmin), fmax=float(fmax),
        threshold=float(threshold), ref_fn=ref if callable(ref) else None,
    )


@functools.partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "fmin", "fmax", "threshold", "ref_fn"),
)
def _piptrack_core(S, ref_arr, *, sr, n_fft, fmin, fmax, threshold, ref_fn):
    """Pitch/magnitude peak interpolation as one jitted program."""
    if jnp.issubdtype(S.dtype, jnp.complexfloating):
        S = jnp.abs(S)
    else:
        S = jnp.where(S < 0, jnp.abs(S), S)

    fft_freqs = convert.fft_frequencies(sr=sr, n_fft=n_fft)

    avg = jnp.gradient(S, axis=-2)
    shift = _parabolic_interpolation(S, axis=-2)
    dskew = 0.5 * avg * shift

    freq_mask = (fmin <= fft_freqs) & (fft_freqs < fmax)
    freq_mask = util.expand_to(jnp.asarray(freq_mask), ndim=S.ndim, axes=-2)

    if ref_fn is not None:
        ref_value = threshold * ref_fn(S, axis=-2)
        ref_value = jnp.expand_dims(ref_value, -2)
    else:
        ref_value = jnp.abs(ref_arr)

    peaks = freq_mask & util.localmax(S * (S > ref_value), axis=-2)

    bin_idx = util.expand_to(
        jnp.arange(S.shape[-2], dtype=S.dtype), ndim=S.ndim, axes=-2
    )
    pitches = jnp.where(peaks, (bin_idx + shift) * float(sr) / n_fft, 0.0)
    mags = jnp.where(peaks, S + dskew, 0.0)
    return pitches, mags


def pitch_tuning(
    frequencies: Any, *, resolution: float = 0.01, bins_per_octave: int = 12
) -> float:
    """Estimate a tuning deviation from a bag of detected frequencies.

    Folds each frequency's fractional distance to the nearest bin into
    a histogram over [-0.5, 0.5) and returns the most populated bin —
    robust to octave errors.  Histogramming is host-side (tiny data).

    Parameters
    ----------
    frequencies : array-like
        detected frequencies in Hz (non-positive values are ignored)
    resolution : float in (0, 1)
        histogram resolution in fractions of a bin
    bins_per_octave : int > 0
        bins per octave

    Returns
    -------
    tuning : float in [-0.5, 0.5)
        estimated deviation in fractional bins

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> detuned = 440.0 * 2 ** (0.25 / 12 + np.arange(3))
    >>> float(np.round(lt.pitch_tuning(detuned), 2))
    0.25

    Parity: reference core/pitch.py:112.
    """
    audible = np.atleast_1d(np.asarray(frequencies))
    audible = audible[audible > 0]
    if audible.size == 0:
        warnings.warn(
            "no positive frequencies to estimate tuning from; "
            "returning 0 cents", stacklevel=2,
        )
        return 0.0

    # fractional distance of each pitch from its nearest chromatic bin,
    # wrapped to [-0.5, 0.5)
    frac = np.mod(bins_per_octave * convert.hz_to_octs(audible), 1.0)
    frac = np.where(frac >= 0.5, frac - 1.0, frac)

    # mode of the deviations on a `resolution`-cell grid
    cells = np.linspace(-0.5, 0.5, int(np.ceil(1.0 / resolution)) + 1)
    slots = np.clip(
        np.searchsorted(cells, frac, side="right") - 1, 0, len(cells) - 2
    )
    votes = np.bincount(slots, minlength=len(cells) - 1)
    return float(cells[int(np.argmax(votes))])


def estimate_tuning(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    n_fft: Optional[int] = 2048,
    resolution: float = 0.01,
    bins_per_octave: int = 12,
    **kwargs: Any,
) -> float:
    """Estimate the tuning deviation of a recording.

    Runs :func:`piptrack` to collect instantaneous-frequency peaks,
    then hands the magnitude-thresholded frequencies to
    :func:`pitch_tuning`.

    Parameters
    ----------
    y : array-like or None
        audio signal
    sr : number > 0
        sampling rate
    S : array-like or None
        precomputed magnitude spectrogram (overrides ``y``)
    n_fft : int > 0
        FFT size
    resolution : float in (0, 1)
        histogram resolution in fractional bins
    bins_per_octave : int > 0
        bins per octave
    **kwargs
        forwarded to :func:`piptrack`

    Returns
    -------
    tuning : float in [-0.5, 0.5)
        estimated deviation in fractional bins

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> t = np.arange(22050) / 22050
    >>> y = np.sin(2 * np.pi * 443 * t).astype(np.float32)
    >>> tu = lt.estimate_tuning(y=y, sr=22050)
    >>> bool(0.0 < tu < 0.25)
    True

    Parity: reference core/pitch.py:28.
    """
    pitch, mag = piptrack(n_fft=n_fft, S=S, sr=sr, y=y, **kwargs)
    pitch = np.asarray(pitch)
    mag = np.asarray(mag)

    # keep voiced bins at or above the median voiced magnitude
    keep = pitch > 0
    if keep.any():
        keep &= mag >= np.median(mag[keep])
    return pitch_tuning(
        pitch[keep], resolution=resolution, bins_per_octave=bins_per_octave
    )


def _cumulative_mean_normalized_difference(
    y_frames: jax.Array, min_period: int, max_period: int
) -> jax.Array:
    """CMND function (YIN eq. 8). Parity: core/pitch.py:369.

    Frames arrive as (..., frame_length, n_frames); all math batches over
    frames — FFT autocorrelation + cumsums, one fused device program.
    """
    autocorr = audio.autocorrelate(y_frames, max_size=max_period + 1, axis=-2)
    zero_lag = autocorr[..., :1, :]

    # The reference zeroes the k=0 energy slot before it subtracts
    # (core/pitch.py:403-407), so its k=1 difference term omits y(0)² —
    # matched here or every cumulative mean downstream shifts by a constant.
    edge_power = jnp.cumsum(jnp.square(y_frames), axis=-2)
    edge_power = edge_power.at[..., 0, :].set(0.0)

    # d(k) = 2*(ACF(0) - ACF(k)) - sum_{m<k} y(m)^2   for k in 1..max_period
    difference = (
        2.0 * (zero_lag - autocorr[..., 1 : max_period + 1, :])
        - edge_power[..., :max_period, :]
    )

    # CMND: each lag normalized by the running mean of d over lags <= k
    lag_index = util.expand_to(
        jnp.arange(1, max_period + 1, dtype=difference.dtype),
        ndim=difference.ndim, axes=-2,
    )
    running_mean = jnp.cumsum(difference, axis=-2) / lag_index

    band = slice(min_period - 1, max_period)
    floor = util.tiny(running_mean)
    return difference[..., band, :] / (running_mean[..., band, :] + floor)


def _check_yin_params(
    *, sr: float, fmax: float, fmin: float, frame_length: int, win_length: Optional[int] = None
) -> None:
    """Validate yin/pyin parameters. Parity: core/pitch.py (__check_yin_params)."""
    if fmin is None or fmax is None:
        raise ParameterError('both "fmin" and "fmax" must be provided')
    if fmin <= 0:
        raise ParameterError(f"fmin={fmin} must be strictly positive")
    if fmax <= fmin:
        raise ParameterError(f"fmax={fmax} must be greater than fmin={fmin}")
    if fmax > sr / 2:
        raise ParameterError(f"fmax={fmax} cannot exceed Nyquist frequency {sr/2}")
    if frame_length < 1:
        raise ParameterError(f"frame_length={frame_length} must be a positive integer")
    if win_length is not None and win_length >= frame_length:
        raise ParameterError(
            f"win_length={win_length} must be less than frame_length={frame_length}"
        )
    # frames must be long enough to cover at least one full period of fmin
    if sr / fmin >= frame_length:
        raise ParameterError(
            f"frame_length={frame_length} is too small for fmin={fmin} at sr={sr}"
        )


def yin(
    y: Any,
    *,
    fmin: float,
    fmax: float,
    sr: float = 22050,
    frame_length: int = 2048,
    win_length: Optional[int] = None,
    hop_length: Optional[int] = None,
    trough_threshold: float = 0.1,
    center: bool = True,
    pad_mode: str = "constant",
) -> jax.Array:
    """Fundamental frequency (F0) estimation via YIN.

    The YIN algorithm [de Cheveigné & Kawahara 2002]: cumulative
    mean-normalized difference over lag, thresholded trough selection, and
    parabolic refinement.  Behavior parity with the reference
    ``core/pitch.py:480``; all frames batch through FFT autocorrelation +
    cumulative sums in one device program.

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)]
        input signal(s)
    fmin, fmax : float > 0
        pitch search range in Hz (``fmax <= sr/2``)
    sr : number > 0
        sampling rate
    frame_length : int > 0
        analysis frame length in samples
    win_length : int or None
        energy-window length; defaults to ``frame_length // 2``
    hop_length : int or None
        hop; defaults to ``frame_length // 4``
    trough_threshold : float > 0
        absolute CMND threshold for trough acceptance
    center : bool
        center frames on ``y[t * hop_length]``
    pad_mode : str
        padding mode when centered

    Returns
    -------
    f0 : jax.Array [shape=(..., n_frames)]
        estimated fundamental frequency in Hz, per frame

    See Also
    --------
    pyin : probabilistic YIN with voicing decisions
    piptrack : sinusoidal peak interpolation

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=1.0))
    >>> f0 = lt.yin(y, fmin=200, fmax=800, sr=22050)
    >>> float(abs(np.median(np.asarray(f0)) - 440)) < 5
    True
    """
    _check_yin_params(
        sr=sr, fmax=fmax, fmin=fmin, frame_length=frame_length, win_length=win_length
    )

    if hop_length is None:
        hop_length = frame_length // 4

    # frame → CMND → trough pick → parabolic refine as ONE program
    # (eagerly this chain issues ~100 device dispatches per call)
    return _yin_core(
        jnp.asarray(y), sr=float(sr), fmin=float(fmin), fmax=float(fmax),
        frame_length=int(frame_length), hop_length=int(hop_length),
        trough_threshold=float(trough_threshold), center=bool(center),
        pad_mode=pad_mode,
    )


@functools.partial(
    jax.jit,
    static_argnames=("sr", "fmin", "fmax", "frame_length", "hop_length",
                     "trough_threshold", "center", "pad_mode"),
)
def _yin_core(
    y, *, sr, fmin, fmax, frame_length, hop_length, trough_threshold,
    center, pad_mode,
):
    """The full YIN device pipeline as one jitted program."""
    if center:
        padding = [(0, 0)] * y.ndim
        padding[-1] = (frame_length // 2, frame_length // 2)
        y = jnp.pad(y, padding, mode=pad_mode)

    y_frames = util.frame(y, frame_length=frame_length, hop_length=hop_length)

    min_period = int(np.floor(sr / fmax))
    max_period = min(int(np.ceil(sr / fmin)), frame_length - 1)

    yin_frames = _cumulative_mean_normalized_difference(
        y_frames, min_period, max_period
    )
    parabolic_shifts = _parabolic_interpolation(yin_frames)

    is_trough = util.localmin(yin_frames, axis=-2)
    is_trough = is_trough.at[..., 0, :].set(
        yin_frames[..., 0, :] < yin_frames[..., 1, :]
    )
    is_threshold_trough = jnp.logical_and(is_trough, yin_frames < trough_threshold)

    global_min = jnp.argmin(yin_frames, axis=-2, keepdims=True)
    yin_period = jnp.argmax(is_threshold_trough, axis=-2, keepdims=True)
    no_trough = jnp.all(~is_threshold_trough, axis=-2, keepdims=True)
    yin_period = jnp.where(no_trough, global_min, yin_period)

    shifts = jnp.take_along_axis(parabolic_shifts, yin_period, axis=-2)
    period = (min_period + yin_period + shifts)[..., 0, :]
    return sr / period


@functools.lru_cache(maxsize=16)
def _pyin_constants_host(
    sr, fmin, fmax, hop_length, n_thresholds, beta_parameters, resolution,
    max_transition_rate, switch_prob, transition_min_prob,
):
    """Host-side pYIN priors + HMM matrices, cached per config."""
    import scipy.stats

    from ..sequence import transition_local, transition_loop

    thresholds = np.linspace(0, 1, n_thresholds + 1)
    beta_cdf = scipy.stats.beta.cdf(
        thresholds, beta_parameters[0], beta_parameters[1]
    )
    beta_probs = np.diff(beta_cdf)

    n_bins_per_semitone = int(np.ceil(1.0 / resolution))
    n_pitch_bins = (
        int(np.floor(12 * n_bins_per_semitone * np.log2(fmax / fmin))) + 1
    )

    max_semitones_per_frame = round(max_transition_rate * 12 * hop_length / sr)
    transition_width = max_semitones_per_frame * n_bins_per_semitone + 1
    transition = transition_local(
        n_pitch_bins, transition_width, window="triangle", wrap=False
    )
    t_switch = transition_loop(2, 1 - switch_prob)
    transition = np.kron(t_switch, np.asarray(transition))

    # Uniform over ALL states (reference core/pitch.py:840) — older librosa
    # started in the unvoiced half, 1.0dev does not.
    p_init = np.full(2 * n_pitch_bins, 1 / (2 * n_pitch_bins))

    eps = np.finfo(np.float64).tiny
    log_trans = np.log(transition + eps)
    if transition_min_prob is not None and transition_min_prob > 0:
        feasible = log_trans >= np.log(transition_min_prob + eps)
        log_trans = np.where(feasible, log_trans, -np.inf)
    log_p_init = np.log(p_init + eps)

    return (
        thresholds,
        beta_probs,
        log_trans.astype(np.float32),
        log_p_init.astype(np.float32),
    )


_PYIN_DEV: dict = {}


def _pyin_constants(*key):
    """Device-resident pYIN constants, cached per config.

    The (2·n_bins)² log-transition matrix is ~3 MB; re-uploading it per
    call costs tens of milliseconds over a remote device link.  Tracer
    values (calls under an outer jit) are never cached.
    """
    cached = _PYIN_DEV.get(key)
    if cached is not None:
        return cached
    dev = tuple(jnp.asarray(a) for a in _pyin_constants_host(*key))
    if not isinstance(dev[0], jax.core.Tracer):
        _PYIN_DEV[key] = dev
    return dev


def pyin(
    y: Any,
    *,
    fmin: float,
    fmax: float,
    sr: float = 22050,
    frame_length: int = 2048,
    win_length: Optional[int] = None,
    hop_length: Optional[int] = None,
    n_thresholds: int = 100,
    beta_parameters: Tuple[float, float] = (2, 18),
    boltzmann_parameter: float = 2,
    resolution: float = 0.1,
    max_transition_rate: float = 35.92,
    switch_prob: float = 0.01,
    no_trough_prob: float = 0.01,
    fill_na: Optional[float] = np.nan,
    center: bool = True,
    pad_mode: str = "constant",
    transition_min_prob: Optional[float] = 1e-4,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Probabilistic YIN (pYIN) fundamental frequency estimation.

    Extends YIN with per-threshold trough probabilities and an HMM over
    pitch bins × voicing, decoded by Viterbi [Mauch & Dixon 2014].
    Behavior parity with the reference ``core/pitch.py:631``; the
    reference's per-frame Python loop (``core/pitch.py:870``) is replaced
    with fully batched masked tensor ops, and decoding is a max-plus
    Viterbi scan — the entire pipeline is ONE device program.

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)]
        input signal(s)
    fmin, fmax : float > 0
        pitch search range in Hz
    sr : number > 0
        sampling rate
    frame_length, win_length, hop_length, center, pad_mode
        framing controls, as in ``yin``
    n_thresholds : int > 0
        number of CMND thresholds
    beta_parameters : tuple of float
        shape of the beta prior over thresholds
    boltzmann_parameter : number > 0
        trough-position prior shape
    resolution : float in (0, 1)
        pitch bin resolution in fractions of a semitone
    max_transition_rate : float > 0
        max pitch slew in octaves/second
    switch_prob : float in (0, 1)
        voiced/unvoiced switch probability
    no_trough_prob : float in (0, 1)
        probability mass for the global minimum when no trough qualifies
    fill_na : float, np.nan, or None
        value for unvoiced frames in ``f0``

    Returns
    -------
    f0 : jax.Array [shape=(..., n_frames)]
        fundamental frequency (``fill_na`` where unvoiced)
    voiced_flag : jax.Array [bool]
        per-frame voicing decision
    voiced_prob : jax.Array
        per-frame voicing probability
    """
    from ..sequence import transition_local, transition_loop, viterbi

    _check_yin_params(
        sr=sr, fmax=fmax, fmin=fmin, frame_length=frame_length, win_length=win_length
    )
    if hop_length is None:
        hop_length = frame_length // 4

    y = jnp.asarray(y)

    min_period = int(np.floor(sr / fmax))
    max_period = min(int(np.ceil(sr / fmin)), frame_length - 1)

    n_bins_per_semitone = int(np.ceil(1.0 / resolution))
    n_pitch_bins = int(np.floor(12 * n_bins_per_semitone * np.log2(fmax / fmin))) + 1

    thresholds_d, beta_probs_d, log_trans_d, log_p_init_d = _pyin_constants(
        float(sr), float(fmin), float(fmax), hop_length, int(n_thresholds),
        (float(beta_parameters[0]), float(beta_parameters[1])),
        float(resolution), float(max_transition_rate), float(switch_prob),
        None if transition_min_prob is None else float(transition_min_prob),
    )

    f0, voiced_flag, voiced_prob = _pyin_core(
        y,
        thresholds_d,
        beta_probs_d,
        log_trans_d,
        log_p_init_d,
        sr=float(sr), fmin=float(fmin),
        frame_length=frame_length, hop_length=hop_length,
        min_period=min_period, max_period=max_period,
        n_pitch_bins=n_pitch_bins, n_bins_per_semitone=n_bins_per_semitone,
        boltzmann_parameter=float(boltzmann_parameter),
        no_trough_prob=float(no_trough_prob),
        center=bool(center), pad_mode=pad_mode,
        # fill inside the fused program: an eager jnp.where after the core
        # costs one extra tunnel dispatch per call
        fill_value=(None if fill_na is None else np.float32(fill_na)),
    )

    return f0, voiced_flag, voiced_prob


@functools.partial(
    jax.jit,
    static_argnames=(
        "sr", "fmin", "frame_length", "hop_length", "min_period",
        "max_period", "n_pitch_bins", "n_bins_per_semitone",
        "boltzmann_parameter", "no_trough_prob", "center", "pad_mode",
    ),
)
def _pyin_core(
    y, thresholds, beta_probs, log_trans, log_p_init, *, sr, fmin,
    frame_length, hop_length, min_period, max_period, n_pitch_bins,
    n_bins_per_semitone, boltzmann_parameter, no_trough_prob, center,
    pad_mode, fill_value=None,
):
    """The full pYIN device pipeline as ONE program.

    frame → CMND → parabolic interpolation → batched trough priors →
    observation scatter → max-plus Viterbi scan → decode.  Fusing removes
    ~30 per-op dispatches (22 ms each over the axon tunnel) per call.
    """
    if center:
        padding = [(0, 0)] * y.ndim
        padding[-1] = (frame_length // 2, frame_length // 2)
        y = jnp.pad(y, padding, mode=pad_mode)

    y_frames = util.frame(y, frame_length=frame_length, hop_length=hop_length)

    obs_full, voiced_prob = _pyin_observe(
        y_frames, thresholds, beta_probs, sr=sr, fmin=fmin,
        min_period=min_period, max_period=max_period,
        n_pitch_bins=n_pitch_bins, n_bins_per_semitone=n_bins_per_semitone,
        boltzmann_parameter=boltzmann_parameter,
        no_trough_prob=no_trough_prob,
    )
    f0, voiced_flag = _pyin_decode(
        obs_full, log_trans, log_p_init, fmin=fmin,
        n_pitch_bins=n_pitch_bins, n_bins_per_semitone=n_bins_per_semitone,
    )
    if fill_value is not None:
        f0 = jnp.where(voiced_flag, f0, fill_value)
    return f0, voiced_flag, voiced_prob


def _pyin_observe(
    y_frames, thresholds, beta_probs, *, sr, fmin, min_period, max_period,
    n_pitch_bins, n_bins_per_semitone, boltzmann_parameter, no_trough_prob,
):
    """Per-frame half of pYIN: frames → HMM observation probabilities.

    Every step here is independent across frames, so the time-sharded
    path (``parallel.analysis.pyin_sharded``) runs this inside a
    shard_map and gathers only the tiny (2·n_bins, T) output for the
    sequential decode.  Returns ``(obs_full, voiced_prob)``.
    """
    yin_frames = _cumulative_mean_normalized_difference(
        y_frames, min_period, max_period
    )
    parabolic_shifts = _parabolic_interpolation(yin_frames)

    is_trough = util.localmin(yin_frames, axis=-2)
    is_trough = is_trough.at[..., 0, :].set(
        yin_frames[..., 0, :] < yin_frames[..., 1, :]
    )

    # trough_index grid: (..., n_periods, n_frames)
    yin_probs = _pyin_trough_probs(
        yin_frames,
        is_trough,
        jnp.asarray(thresholds),
        jnp.asarray(beta_probs),
        boltzmann_parameter,
        no_trough_prob,
    )

    yin_period = jnp.arange(min_period, max_period + 1)
    # Refined periods per bin (only where yin_probs > 0 matters)
    period_cands = (
        yin_period.reshape((-1, 1)).astype(yin_frames.dtype) + parabolic_shifts
    )
    f0_cands = sr / period_cands  # (..., n_periods, n_frames)

    # Map candidate frequencies to pitch bins.  Clip to n_pitch_bins
    # INCLUSIVE (reference core/pitch.py:921): candidates above fmax land
    # in an overflow bin whose mass is discarded below, exactly as the
    # reference's uniform unvoiced fill overwrites it.
    bin_index = 12 * n_bins_per_semitone * jnp.log2(f0_cands / fmin)
    bin_index = jnp.clip(jnp.round(bin_index), 0, n_pitch_bins).astype(jnp.int32)

    # Scatter-add probabilities into pitch-bin observation matrix
    # (..., n_pitch_bins + 1, n_frames); last row = overflow, dropped.
    def scatter_obs(probs, bins):
        # probs, bins: (n_periods, n_frames)
        out = jnp.zeros((n_pitch_bins + 1, probs.shape[-1]), dtype=probs.dtype)
        out = out.at[bins, jnp.arange(probs.shape[-1])[None, :]].add(probs)
        return out[:n_pitch_bins]

    lead_shape = yin_probs.shape[:-2]
    flatp = yin_probs.reshape((-1,) + yin_probs.shape[-2:])
    flatb = jnp.broadcast_to(bin_index, yin_probs.shape).reshape(
        (-1,) + yin_probs.shape[-2:]
    )
    observation_probs = jax.vmap(scatter_obs)(flatp, flatb)
    observation_probs = observation_probs.reshape(
        lead_shape + (n_pitch_bins, flatp.shape[-1])
    )

    voiced_prob = jnp.clip(
        jnp.sum(observation_probs, axis=-2, keepdims=True), 0, 1
    )
    # Unvoiced states share the remaining mass uniformly
    unvoiced = (1 - voiced_prob) / n_pitch_bins
    obs_full = jnp.concatenate(
        [observation_probs, jnp.broadcast_to(unvoiced, observation_probs.shape)],
        axis=-2,
    )
    return obs_full, voiced_prob[..., 0, :]


def _pyin_decode(
    obs_full, log_trans, log_p_init, *, fmin, n_pitch_bins,
    n_bins_per_semitone,
):
    """Sequential half of pYIN: Viterbi over the gathered observations."""
    from ..sequence import _viterbi_scan

    # Max-plus Viterbi over the (precomputed, possibly pruned) transition
    log_prob = jnp.log(obs_full + np.finfo(np.float64).tiny)
    log_prob = jnp.swapaxes(log_prob, -2, -1)  # (..., T, S)
    states, _ = _viterbi_scan(
        log_prob.astype(jnp.float32), log_trans, log_p_init
    )

    # Decode: state < n_pitch_bins → voiced at that bin
    freqs = fmin * 2 ** (jnp.arange(n_pitch_bins) / (12 * n_bins_per_semitone))
    f0 = freqs[states % n_pitch_bins]
    voiced_flag = states < n_pitch_bins

    return f0, voiced_flag


def _pyin_trough_probs(
    yin_frames: jax.Array,
    is_trough: jax.Array,
    thresholds: jax.Array,
    beta_probs: jax.Array,
    boltzmann_parameter: float,
    no_trough_prob: float,
) -> jax.Array:
    """Batched pYIN trough probabilities (replaces the per-frame loop at
    core/pitch.py:870).

    For each threshold t: troughs below t get Boltzmann-weighted prior mass
    (by trough order), scaled by beta prior; if no trough is below t, the
    global-minimum trough receives ``no_trough_prob`` of the mass.
    """
    # (..., P, T) — P period candidates, T frames
    P = yin_frames.shape[-2]
    n_thresh = thresholds.shape[0] - 1

    # trough order index among troughs (cumulative count along period axis)
    trough_rank = jnp.cumsum(is_trough, axis=-2) - 1  # rank of each trough

    # For each threshold k (1..n_thresh), mask of troughs below thresholds[k]
    # shapes: thresholds (n_thresh+1,), broadcast to (n_thresh, ..., P, T)
    yin_e = yin_frames[None, ...]
    trough_e = is_trough[None, ...]
    thr = thresholds[1:].reshape((n_thresh,) + (1,) * yin_frames.ndim)

    below = trough_e & (yin_e < thr)  # (n_thresh, ..., P, T)

    # Boltzmann pmf over the *rank among troughs below threshold*
    rank_below = jnp.cumsum(below, axis=-2) - 1
    n_below = jnp.sum(below, axis=-2, keepdims=True)  # (n_thresh, ..., 1, T)

    a = boltzmann_parameter
    # boltzmann.pmf(k, a, N) = exp(-a k) (1 - exp(-a)) / (1 - exp(-a N))
    pmf = (
        jnp.exp(-a * rank_below)
        * (1 - np.exp(-a))
        / (1 - jnp.exp(-a * jnp.maximum(n_below, 1)))
    )
    probs_k = jnp.where(below, pmf, 0.0)

    beta_w = beta_probs.reshape((n_thresh,) + (1,) * yin_frames.ndim)
    weighted = probs_k * beta_w

    yin_probs = jnp.sum(weighted, axis=0)  # (..., P, T)

    # Thresholds with no troughs below: add no_trough_prob * beta mass to
    # the global minimum TROUGH (reference core/pitch.py:901-907).  Frames
    # with no troughs at all (e.g. silence → flat CMND) receive nothing —
    # the reference skips them entirely, leaving voiced probability zero.
    masked = jnp.where(is_trough, yin_frames, jnp.inf)
    global_min = jnp.argmin(masked, axis=-2, keepdims=True)  # (..., 1, T)
    has_trough = jnp.any(is_trough, axis=-2, keepdims=True)  # (..., 1, T)
    empty = (n_below[..., 0:1, :] == 0)  # (n_thresh, ..., 1, T)
    empty_mass = jnp.sum(
        jnp.where(empty, beta_w, 0.0), axis=0
    )  # (..., 1, T)
    empty_mass = jnp.where(has_trough, empty_mass, 0.0)
    onehot = jax.nn.one_hot(
        global_min[..., 0, :], P, axis=-2, dtype=yin_frames.dtype
    )
    yin_probs = yin_probs + no_trough_prob * empty_mass * onehot
    return yin_probs
