"""Rhythm features: tempograms and tempo estimation (L4).

The autocorrelation tempogram batches the per-frame FFT autocorrelation
(``librosa/feature/rhythm.py:38``) into one device program.  Parity
citations refer to ``librosa/feature/rhythm.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.audio import autocorrelate
from ..core.convert import fourier_tempo_frequencies, tempo_frequencies, time_to_frames
from ..core.spectrum import stft
from ..filters import get_window
from ..util import utils as util
from ..util.exceptions import ParameterError

__all__ = [
    "tempogram",
    "fourier_tempogram",
    "tempo",
    "tempogram_ratio",
    "hybrid_tempogram",
    "metrogram",
]


def tempogram(
    *,
    y: Any = None,
    sr: float = 22050,
    onset_envelope: Optional[Any] = None,
    hop_length: int = 512,
    win_length: int = 384,
    center: bool = True,
    window: Any = "hann",
    norm: Optional[float] = np.inf,
) -> jax.Array:
    """Local autocorrelation tempogram.

    Windows the onset envelope at every frame (hop 1) and autocorrelates,
    yielding per-frame periodicity strength by lag (behavior parity with the
    reference ``feature/rhythm.py:38``); the pad → hop-1 framing → windowed
    FFT autocorrelation → normalize chain is one fused program.

    Parameters
    ----------
    y, sr, onset_envelope, hop_length
        signal (or precomputed envelope) and hop
    win_length : int > 0
        autocorrelation window length in frames
    center : bool
        center the windows
    window : window spec
    norm : float or None
        per-frame normalization order

    Returns
    -------
    tempogram : jax.Array [shape=(..., win_length, t)]
    """
    if win_length < 1:
        raise ParameterError(
            f"the tempogram window must span >= 1 frame; got {win_length}"
        )
    ac_window = get_window(window, win_length, fftbins=True)
    envelope = jnp.asarray(_resolve_envelope(onset_envelope, y, sr, hop_length))
    norm_key = None if norm is None else float(norm)
    return _tempogram_core(
        envelope, jnp.asarray(ac_window, dtype=envelope.dtype),
        win_length=win_length, center=bool(center), norm=norm_key,
    )


def _resolve_envelope(onset_envelope, y, sr, hop_length):
    """Use the given onset envelope, or derive one from the signal."""
    if onset_envelope is not None:
        return onset_envelope
    if y is None:
        raise ParameterError(
            "tempogram features need an input: pass y= or onset_envelope="
        )
    from ..onset import onset_strength

    return onset_strength(y=y, sr=sr, hop_length=hop_length)


@functools.partial(
    jax.jit, static_argnames=("win_length", "center", "norm")
)
def _tempogram_core(onset_envelope, ac_window, *, win_length, center, norm):
    """Pad → hop-1 framing → windowed FFT autocorrelation → normalize, fused."""
    n = onset_envelope.shape[-1]
    if center:
        padding = [(0, 0)] * onset_envelope.ndim
        padding[-1] = (int(win_length // 2),) * 2
        onset_envelope = jnp.pad(
            onset_envelope, padding, mode="linear_ramp", end_values=0
        )

    # frame with hop 1 → (..., win_length, T)
    odf_frame = util.frame(
        onset_envelope, frame_length=win_length, hop_length=1
    )
    if center:
        odf_frame = odf_frame[..., :n]

    ac_win = util.expand_to(
        ac_window.astype(odf_frame.dtype), ndim=odf_frame.ndim, axes=-2
    )
    return util.normalize(
        autocorrelate(odf_frame * ac_win, axis=-2), norm=norm, axis=-2
    )


def fourier_tempogram(
    *,
    y: Any = None,
    sr: float = 22050,
    onset_envelope: Optional[Any] = None,
    hop_length: int = 512,
    win_length: int = 384,
    center: bool = True,
    window: Any = "hann",
) -> jax.Array:
    """Fourier tempogram: the short-time Fourier transform of the onset
    envelope.

    Each column is the complex spectrum of a ``win_length``-frame slice
    of the onset strength signal; bin frequencies convert to BPM via
    ``fourier_tempo_frequencies``.

    Parameters
    ----------
    y, sr, onset_envelope, hop_length, win_length, center, window
        as in ``tempogram``

    Returns
    -------
    tempogram : jax.Array [shape=(..., 1 + win_length//2, t), complex]
        complex Fourier tempogram

    See Also
    --------
    tempogram, hybrid_tempogram
    librosa_tpu.fourier_tempo_frequencies

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> env = np.zeros(512, dtype=np.float32)
    >>> env[::22] = 1.0
    >>> F = lt.feature.fourier_tempogram(onset_envelope=env, sr=22050)
    >>> F.shape, bool(np.iscomplexobj(np.asarray(F)))
    ((193, 513), True)

    Parity: reference feature/rhythm.py:194.
    """
    if win_length < 1:
        raise ParameterError(
            f"the tempogram window must span >= 1 frame; got {win_length}"
        )
    envelope = _resolve_envelope(onset_envelope, y, sr, hop_length)
    # the Fourier tempogram IS a hop-1 STFT of the onset envelope
    return stft(
        jnp.asarray(envelope), n_fft=win_length, hop_length=1,
        center=center, window=window,
    )


def tempo(
    *,
    y: Any = None,
    sr: float = 22050,
    onset_envelope: Optional[Any] = None,
    tg: Optional[Any] = None,
    hop_length: int = 512,
    start_bpm: float = 120,
    std_bpm: float = 1.0,
    ac_size: float = 8.0,
    max_tempo: Optional[float] = 320.0,
    aggregate: Optional[Callable] = np.mean,
    prior: Optional[Any] = None,
) -> np.ndarray:
    """Estimate the global tempo (beats per minute).

    Aggregates a (local autocorrelation) tempogram, weights it by a
    log-normal tempo prior centered at ``start_bpm``, and picks the
    argmax over ``tempo_frequencies``.  Behavior parity with the reference
    ``feature/rhythm.py:295``.

    Parameters
    ----------
    y, sr, onset_envelope, hop_length
        signal (or precomputed onset envelope) and hop
    start_bpm : float > 0
        center of the log-normal tempo prior
    std_bpm : float > 0
        prior width (octaves)
    ac_size : float > 0
        autocorrelation window length in seconds
    max_tempo : float > 0 or None
        hard ceiling on the estimate
    aggregate : callable or None
        tempogram aggregation across frames (None = per-frame tempo)
    prior : distribution or None
        explicit tempo prior (overrides the log-normal)

    Returns
    -------
    tempo : np.ndarray
        estimated tempo in BPM (per channel, or per frame when
        ``aggregate=None``)

    See Also
    --------
    tempogram, beat.beat_track

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> env = np.zeros(400, dtype=np.float32)
    >>> env[::22] = 1.0
    >>> t = lt.feature.tempo(onset_envelope=env, sr=22050)
    >>> bool(abs(float(np.atleast_1d(t)[0]) - 120) < 10)
    True
    """
    if start_bpm <= 0:
        raise ParameterError("start_bpm must be strictly positive")

    # Onset envelopes are one value per hop (~43/s) — microseconds of
    # compute.  When the caller hands a small HOST envelope (the
    # beat_track path: envelope already fetched for the sequential DP),
    # run the tempogram + prior argmax on the local CPU backend: a
    # remote accelerator costs several dispatch round trips (~22 ms
    # each over the axon tunnel) for ~1 ms of work.  Device-resident
    # inputs stay wherever the user put them.
    import contextlib

    small_host = (
        tg is None
        and onset_envelope is not None
        and not isinstance(onset_envelope, jax.Array)
        and np.size(onset_envelope) <= (1 << 16)
    )
    ctx = (
        jax.default_device(jax.devices("cpu")[0])
        if small_host
        else contextlib.nullcontext()
    )
    with ctx:
        if tg is None:
            win_length = int(
                time_to_frames(ac_size, sr=sr, hop_length=hop_length)
            )
        else:
            tg = jnp.asarray(tg)
            win_length = tg.shape[-2]

        bpms = tempo_frequencies(win_length, hop_length=hop_length, sr=sr)

        if prior is None:
            with np.errstate(divide="ignore"):
                logprior = (
                    -0.5
                    * ((np.log2(bpms) - np.log2(start_bpm)) / std_bpm) ** 2
                )
        else:
            logprior = np.asarray(prior.logpdf(bpms))

        if max_tempo is not None:
            max_idx = int(np.argmax(bpms < max_tempo))
            logprior[:max_idx] = -np.inf

        agg_is_mean = aggregate is np.mean or aggregate is jnp.mean
        if tg is None and agg_is_mean:
            # default aggregate over a raw envelope/signal: run
            # tempogram → mean → prior argmax as ONE program instead of
            # three separate device dispatches
            if onset_envelope is None:
                from ..onset import onset_strength

                onset_envelope = onset_strength(
                    y=y, sr=sr, hop_length=hop_length
                )
            env = jnp.asarray(onset_envelope)
            ac_window = np.asarray(
                get_window("hann", win_length, fftbins=True),
                dtype=env.dtype,
            )
            best_period = np.asarray(
                _tempo_core(
                    env, jnp.asarray(ac_window),
                    jnp.asarray(logprior.astype(env.dtype)),
                    win_length=win_length,
                )
            )
        else:
            if tg is None:
                tg = tempogram(
                    y=y, sr=sr, onset_envelope=onset_envelope,
                    hop_length=hop_length, win_length=win_length,
                )
            tg = jnp.asarray(tg)
            if aggregate is not None:
                if agg_is_mean:
                    tg = _mean_last(tg)
                else:
                    tg = jnp.asarray(
                        aggregate(np.asarray(tg), axis=-1, keepdims=True)
                    )
            best_period = np.asarray(
                _tempo_pick(tg, jnp.asarray(logprior))
            )
    return np.take(bpms, best_period)


@jax.jit
def _mean_last(tg):
    return jnp.mean(tg, axis=-1, keepdims=True)


@jax.jit
def _tempo_pick(tg, logprior):
    lp = util.expand_to(logprior, ndim=tg.ndim, axes=-2)
    return jnp.argmax(jnp.log1p(1e6 * tg) + lp, axis=-2)


@functools.partial(jax.jit, static_argnames=("win_length",))
def _tempo_core(onset_envelope, ac_window, logprior, *, win_length):
    """Fused default tempo(): tempogram → time mean → prior argmax."""
    tg = _tempogram_core(
        onset_envelope, ac_window, win_length=win_length, center=True,
        norm=float(np.inf),
    )
    tg = jnp.mean(tg, axis=-1, keepdims=True)
    lp = util.expand_to(logprior, ndim=tg.ndim, axes=-2)
    return jnp.argmax(jnp.log1p(1e6 * tg) + lp, axis=-2)


def tempogram_ratio(
    *,
    y: Any = None,
    sr: float = 22050,
    onset_envelope: Optional[Any] = None,
    tg: Optional[Any] = None,
    bpm: Optional[Any] = None,
    hop_length: int = 512,
    win_length: int = 384,
    start_bpm: float = 120,
    std_bpm: float = 1.0,
    max_tempo: Optional[float] = 320.0,
    freqs: Optional[np.ndarray] = None,
    factors: Optional[np.ndarray] = None,
    aggregate: Optional[Callable] = None,
    prior: Optional[Any] = None,
    center: bool = True,
    window: Any = "hann",
    kind: str = "linear",
    fill_value: float = 0,
    norm: Optional[float] = np.inf,
) -> jax.Array:
    """Harmonic sampling of a tempogram at metrical ratios.

    Samples each frame's tempogram at fixed rational multiples of the
    estimated tempo, summarizing meter structure (behavior parity with the
    reference ``feature/rhythm.py:474``).

    Parameters
    ----------
    y, sr, onset_envelope, tg, bpm, hop_length, win_length
        tempogram sources / geometry
    factors : np.ndarray or None
        metrical ratios (default 13 standard factors)
    aggregate, prior, center, window, norm, kind, fill_value
        estimation and interpolation controls

    Returns
    -------
    tgr : jax.Array [shape=(..., len(factors), t)]
    """
    from ..core.harmonic import f0_harmonics

    if tg is None:
        tg = tempogram(
            center=center, hop_length=hop_length, norm=norm,
            onset_envelope=onset_envelope, sr=sr, win_length=win_length,
            window=window, y=y,
        )
    tg = jnp.asarray(tg)

    # Fill in whatever the caller left implicit: the lag->BPM axis, the
    # per-frame tempo track, and the metrical-level ratio set.
    if freqs is None:
        freqs = tempo_frequencies(tg.shape[-2], hop_length=hop_length, sr=sr)
    if bpm is None:
        bpm = tempo(
            aggregate=None, hop_length=hop_length, max_tempo=max_tempo,
            prior=prior, sr=sr, start_bpm=start_bpm, std_bpm=std_bpm, tg=tg,
        )
    if factors is None:
        # metric multiples from Prockup'15
        factors = np.array([
            4, 8 / 3, 3, 2, 4 / 3, 3 / 2, 1,
            2 / 3, 3 / 4, 1 / 2, 1 / 3, 3 / 8, 1 / 4,
        ])

    # sample the tempogram at each ratio of the running tempo
    ratio_track = f0_harmonics(
        tg, f0=jnp.asarray(np.asarray(bpm)), fill_value=fill_value,
        freqs=freqs, harmonics=factors, kind=kind,
    )
    if aggregate is None:
        return ratio_track
    return jnp.asarray(aggregate(np.asarray(ratio_track), axis=-1))


def hybrid_tempogram(
    *,
    y: Any = None,
    sr: float = 22050,
    onset_envelope: Optional[Any] = None,
    hop_length: int = 512,
    win_length: int = 384,
    center: bool = True,
    window: Any = "hann",
    **kwargs: Any,
) -> jax.Array:
    """Hybrid tempogram: geometric mean of the Fourier and
    autocorrelation tempograms.

    The autocorrelation tempogram is interpolated onto the Fourier
    tempogram's BPM grid, and the two magnitude surfaces are combined
    multiplicatively — suppressing peaks that only one representation
    supports (harmonic vs subharmonic tempo confusions).

    Parameters
    ----------
    y, sr, onset_envelope, hop_length, win_length, center, window
        as in ``tempogram``
    **kwargs
        forwarded to the interpolator

    Returns
    -------
    tempogram : jax.Array [shape=(..., 1 + win_length//2, t)]
        hybrid tempo salience

    See Also
    --------
    tempogram, fourier_tempogram

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> env = np.zeros(512, dtype=np.float32)
    >>> env[::22] = 1.0
    >>> H = np.asarray(lt.feature.hybrid_tempogram(onset_envelope=env))
    >>> H.shape, bool((H >= 0).all())
    ((193, 512), True)

    Parity: reference feature/rhythm.py:675.
    """
    envelope = np.asarray(_resolve_envelope(onset_envelope, y, sr, hop_length))
    shared = dict(
        sr=sr, hop_length=hop_length, win_length=win_length,
        center=center, window=window,
    )

    # The two tempogram flavors live on different tempo axes: the Fourier
    # tempogram on a linear BPM grid, the autocorrelation tempogram on a
    # reciprocal (lag) grid.  Bring the latter onto the former's grid and
    # take the per-cell geometric mean.
    spectral = np.asarray(fourier_tempogram(onset_envelope=envelope, **shared))
    lagged = np.asarray(tempogram(onset_envelope=envelope, **shared))

    bpm_grid = fourier_tempo_frequencies(
        sr=sr, hop_length=hop_length, win_length=win_length
    )
    lag_bpm = tempo_frequencies(lagged.shape[-2], sr=sr, hop_length=hop_length)

    # regrid, dropping the infinite-BPM lag-0 bin (descending -> ascending)
    import scipy.interpolate

    resample_opts: dict = dict(kwargs) if kwargs else {}
    for key, val in (("bounds_error", False), ("fill_value", 0.0),
                     ("copy", False), ("axis", -2)):
        resample_opts.setdefault(key, val)
    regrid = scipy.interpolate.interp1d(
        lag_bpm[:0:-1], lagged[..., :0:-1, :], **resample_opts
    )
    lagged_on_bpm = regrid(bpm_grid)

    frames = min(spectral.shape[-1], lagged_on_bpm.shape[-1])
    agreement = np.abs(spectral[..., :frames]) * np.abs(
        lagged_on_bpm[..., :frames]
    )
    return jnp.asarray(np.sqrt(np.maximum(0, agreement)))


def metrogram(
    *,
    tg: Any,
    freqs: np.ndarray,
    factors: Optional[np.ndarray] = None,
    aggregate: Optional[Callable] = np.sum,
    kind: str = "linear",
    fill_value: float = 0,
) -> jax.Array:
    """Metrical-structure enhancement of a tempogram.

    For each metric factor (1/3, 1/4, 1/5, 1/7 by default — i.e. 3/4,
    4/4, 5/4, 7/4 time), multiplies the tempogram with itself sampled
    at that tempo ratio and collapses the tempo axis, yielding one
    ratio-salience row per factor over time (Cozens & Godsill 2023).

    Parameters
    ----------
    tg : np.ndarray or jax.Array [shape=(..., n_bpm, t)]
        input tempogram
    freqs : np.ndarray
        BPM value of each tempogram row
    factors : np.ndarray or None
        sub-harmonic factors to aggregate over
    aggregate : callable or None
        reduction over factors (default sum); None stacks instead
    kind : str
        interpolation mode for the factor sampling
    fill_value : float
        value for out-of-range samples

    Returns
    -------
    metrogram : jax.Array [shape=(..., n_factors, t)]
        ratio salience per factor and frame (per tempo bin when
        ``aggregate=None``)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> env = np.zeros(256, dtype=np.float32); env[::22] = 1.0
    >>> tg = np.abs(np.asarray(lt.feature.tempogram(onset_envelope=env)))
    >>> freqs = lt.tempo_frequencies(tg.shape[-2])
    >>> M = lt.feature.metrogram(tg=tg, freqs=freqs)
    >>> M.shape
    (4, 256)

    Parity: reference feature/rhythm.py:826.
    """
    from ..core.harmonic import interp_harmonics

    tg = jnp.asarray(tg)
    if factors is None:
        # candidate subdivision ratios (triple/duple/quintuple/septuple)
        factors = np.array([1 / 3, 1 / 4, 1 / 5, 1 / 7])

    # correlate the tempogram with itself resampled at each subdivision:
    # an active metrical level lights up at both scales
    rescaled = interp_harmonics(
        tg, axis=-2, fill_value=fill_value, freqs=freqs, harmonics=factors,
        kind=kind,
    )
    coincidence = rescaled * jnp.expand_dims(tg, axis=-3)

    if aggregate is None:
        return coincidence
    if aggregate is np.sum:  # keep the common case on device
        return jnp.sum(coincidence, axis=-2)
    return jnp.asarray(aggregate(np.asarray(coincidence), axis=-2))
