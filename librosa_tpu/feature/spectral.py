"""Frame-level spectral descriptors (L4).

All functions follow the reference's y-or-S polymorphism via
``core.spectrum._spectrogram`` and the multichannel contract (leading axes
broadcast).  Filterbank applications are MXU matmuls (einsum); reductions are
XLA-fused.  Parity citations refer to ``librosa/feature/spectral.py``.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import filters
from ..core.convert import fft_frequencies
from ..core.spectrum import (
    _mats_arg,
    _spectrogram,
    _stft_mel_core,
    _win_device,
    power_to_db,
)
from ..ops.transforms import dct_matrix
from ..util import utils as util
from ..util.exceptions import ParameterError

__all__ = [
    "spectral_centroid",
    "spectral_bandwidth",
    "spectral_contrast",
    "spectral_rolloff",
    "spectral_flatness",
    "poly_features",
    "rms",
    "zero_crossing_rate",
    "chroma_stft",
    "chroma_cqt",
    "chroma_cens",
    "chroma_vqt",
    "melspectrogram",
    "mfcc",
    "tonnetz",
]

_WindowSpec = Any


def _check_nonneg_real(S: jax.Array, name: str, *, computed: bool = False) -> None:
    """Reject complex/negative spectra.

    The negativity check is data-dependent — on a remote device it costs a
    full fetch round trip — so it only runs for *user-provided* S
    (``computed=False``); magnitude spectrograms we computed ourselves are
    non-negative by construction.
    """
    if jnp.issubdtype(S.dtype, jnp.complexfloating):
        raise ParameterError(f"{name} is only defined with real-valued input")
    # data-dependent validation only outside jit tracing
    if (
        not computed
        and not isinstance(S, jax.core.Tracer)
        and bool(jnp.any(S < 0))
    ):
        raise ParameterError(f"{name} is only defined with non-negative energies")


def spectral_centroid(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    freq: Optional[np.ndarray] = None,
    win_length: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    pad_mode: str = "constant",
) -> jax.Array:
    """Spectral centroid: the magnitude-weighted mean frequency per frame.

    ``centroid[t] = sum_k freq[k] * S[k, t] / sum_k S[k, t]`` (behavior
    parity with the reference ``feature/spectral.py:46``).

    Parameters
    ----------
    y, sr, S, n_fft, hop_length, win_length, window, center, pad_mode
        signal or precomputed magnitude spectrogram, and STFT controls
    freq : np.ndarray or None
        frequency values per bin (defaults to ``fft_frequencies``);
        may be 2-D for time-varying bin frequencies

    Returns
    -------
    centroid : jax.Array [shape=(..., 1, t)]
        centroid frequencies in Hz

    See Also
    --------
    spectral_bandwidth, spectral_rolloff

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=0.5))
    >>> c = np.asarray(lt.feature.spectral_centroid(y=y, sr=22050))
    >>> bool(abs(np.median(c) - 440) < 40)
    True
    """
    S_given = S
    S, n_fft = _spectrogram(
        y=y, S=S, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )
    _check_nonneg_real(S, "Spectral centroid", computed=S_given is None)

    if freq is None:
        freq = fft_frequencies(sr=sr, n_fft=n_fft)

    return _centroid_core(S, jnp.asarray(freq))


@jax.jit
def _centroid_core(S, freq):
    if freq.ndim == 1:
        freq = util.expand_to(freq, ndim=S.ndim, axes=-2)
    return jnp.sum(
        freq * util.normalize(S, norm=1, axis=-2), axis=-2, keepdims=True
    )


def spectral_bandwidth(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    freq: Optional[np.ndarray] = None,
    centroid: Optional[Any] = None,
    norm: bool = True,
    p: float = 2,
) -> jax.Array:
    """Spectral bandwidth: the p-th-order moment about the centroid.

    ``(sum_k S[k] * (freq[k] - centroid)**p)**(1/p)`` (behavior parity with
    the reference ``feature/spectral.py:194``).

    Parameters
    ----------
    y, sr, S, n_fft, hop_length, win_length, window, center, pad_mode, freq
        signal or spectrogram, and STFT controls
    centroid : np.ndarray or None
        precomputed centroid frequencies
    norm : bool
        normalize the spectral distribution per frame
    p : float > 0
        moment order (2 = standard deviation)

    Returns
    -------
    bandwidth : jax.Array [shape=(..., 1, t)]
    """
    S_given = S
    S, n_fft = _spectrogram(
        y=y, S=S, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )
    _check_nonneg_real(S, "Spectral bandwidth", computed=S_given is None)

    if freq is None:
        freq = fft_frequencies(sr=sr, n_fft=n_fft)
    freq = jnp.asarray(freq)

    if centroid is None:
        # S is already validated above — reuse the jitted centroid core
        # directly (spectral_centroid would re-run the data-dependent
        # non-negativity fetch on the S we just computed)
        centroid = _centroid_core(S, freq)
    centroid = jnp.asarray(centroid)

    return _bandwidth_core(S, freq, centroid, norm=bool(norm), p=float(p))


@functools.partial(jax.jit, static_argnames=("norm", "p"))
def _bandwidth_core(S, freq, centroid, *, norm, p):
    if freq.ndim == 1:
        deviation = jnp.abs(freq[:, None] - centroid[..., 0:1, :])
    else:
        deviation = jnp.abs(freq - centroid)

    if norm:
        S = util.normalize(S, norm=1, axis=-2)

    return jnp.sum(S * deviation**p, axis=-2, keepdims=True) ** (1.0 / p)


def spectral_contrast(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    freq: Optional[np.ndarray] = None,
    fmin: float = 200.0,
    n_bands: int = 6,
    quantile: float = 0.02,
    linear: bool = False,
) -> jax.Array:
    """Octave-band spectral contrast (peak minus valley energy per band).

    Each frame's spectrum splits into octave bands; the contrast is the dB
    difference between the mean of the top and bottom ``quantile`` of bins
    (behavior parity with the reference ``feature/spectral.py:355``).
    Band membership is static, so the per-band sort + quantile means compile
    to fixed-shape device ops.

    Parameters
    ----------
    y, sr, S, n_fft, hop_length, win_length, window, center, pad_mode, freq
        signal or spectrogram, and STFT controls
    fmin : float > 0
        lowest band edge
    n_bands : int > 0
        number of octave bands
    quantile : float in (0, 1)
        fraction of bins in the peak/valley means
    linear : bool
        return linear (not dB) differences

    Returns
    -------
    contrast : jax.Array [shape=(..., n_bands + 1, t)]
    """
    S, n_fft = _spectrogram(
        y=y, S=S, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )

    if freq is None:
        freq = fft_frequencies(sr=sr, n_fft=n_fft)
    freq = np.atleast_1d(np.asarray(freq))
    if freq.ndim != 1 or len(freq) != S.shape[-2]:
        raise ParameterError(
            f"freq must be one center frequency per spectrogram row "
            f"(({S.shape[-2]},)); got shape {freq.shape}"
        )
    if not isinstance(n_bands, (int, np.integer)) or n_bands < 1:
        raise ParameterError(f"n_bands={n_bands!r} is not a positive integer")
    if not 0.0 < quantile < 1.0:
        raise ParameterError(
            f"the contrast quantile must be strictly inside (0, 1); "
            f"got {quantile}"
        )
    if fmin <= 0:
        raise ParameterError(f"fmin={fmin} must be above 0 Hz")

    # octave band edges: [0, fmin, 2 fmin, ..., 2^n_bands * fmin]
    edges = np.concatenate(([0.0], fmin * np.exp2(np.arange(n_bands + 1))))
    if (edges[:-1] >= 0.5 * sr).any():
        raise ParameterError(
            f"octave bands starting at fmin={fmin} with n_bands={n_bands} "
            f"pass Nyquist ({sr / 2} Hz); lower one of them"
        )

    # Band membership is static (host freq grid) → hashable per-band index
    # tuples parameterize ONE jitted program for the sort/quantile/diff
    # chain (eagerly ~130 dispatches across the 7 bands).
    bands = []
    for k in range(n_bands + 1):
        inside = (freq >= edges[k]) & (freq <= edges[k + 1])
        hits = np.flatnonzero(inside)
        # each band annexes one bin below; the top band runs to Nyquist
        if k > 0:
            inside[hits[0] - 1] = True
        if k == n_bands:
            inside[hits[-1] + 1:] = True
        members = np.flatnonzero(inside)
        if k < n_bands:
            members = members[:-1]
        n_take = max(int(np.rint(quantile * int(inside.sum()))), 1)
        bands.append((tuple(int(i) for i in members), n_take))

    return _contrast_core(S, bands=tuple(bands), linear=bool(linear))


@functools.partial(jax.jit, static_argnames=("bands", "linear"))
def _contrast_core(S, *, bands, linear):
    """Per-band sorted-quantile contrast as one program."""
    valleys = []
    peaks = []
    for band_idx, n_take in bands:
        sub_band = S[..., jnp.asarray(np.asarray(band_idx)), :]
        sortedr = jnp.sort(sub_band, axis=-2)
        valleys.append(jnp.mean(sortedr[..., :n_take, :], axis=-2))
        peaks.append(jnp.mean(sortedr[..., -n_take:, :], axis=-2))

    valley = jnp.stack(valleys, axis=-2)
    peak = jnp.stack(peaks, axis=-2)

    if linear:
        return peak - valley
    return power_to_db(peak) - power_to_db(valley)


def spectral_rolloff(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    freq: Optional[np.ndarray] = None,
    roll_percent: float = 0.85,
) -> jax.Array:
    """Roll-off frequency: where cumulative energy crosses ``roll_percent``.

    Parity: feature/spectral.py:535.

    Parameters
    ----------
    y, sr, S, n_fft, hop_length, win_length, window, center, pad_mode, freq
        signal or spectrogram, and STFT controls
    roll_percent : float in (0, 1)
        cumulative-energy threshold

    Returns
    -------
    rolloff : jax.Array [shape=(..., 1, t)]
        roll-off frequency per frame, in Hz
    """
    if not 0.0 < roll_percent < 1.0:
        raise ParameterError("roll_percent must lie in the range (0, 1)")

    S_given = S
    S, n_fft = _spectrogram(
        y=y, S=S, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )
    _check_nonneg_real(S, "Spectral rolloff", computed=S_given is None)

    if freq is None:
        freq = fft_frequencies(sr=sr, n_fft=n_fft)

    return _rolloff_core(
        S, jnp.asarray(freq), roll_percent=float(roll_percent)
    )


@functools.partial(jax.jit, static_argnames=("roll_percent",))
def _rolloff_core(S, freq, *, roll_percent):
    if freq.ndim == 1:
        freq = util.expand_to(freq, ndim=S.ndim, axes=-2)
    total_energy = jnp.cumsum(S, axis=-2)
    threshold = roll_percent * total_energy[..., -1, :]
    threshold = jnp.expand_dims(threshold, axis=-2)
    ind = jnp.where(total_energy < threshold, jnp.nan, 1.0)
    return jnp.nanmin(ind * freq, axis=-2, keepdims=True)


def spectral_flatness(
    *,
    y: Any = None,
    S: Any = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    amin: float = 1e-10,
    power: float = 2.0,
) -> jax.Array:
    """Spectral flatness (Wiener entropy): geometric over arithmetic mean.

    Values near 1 indicate noise-like spectra, near 0 tone-like (behavior
    parity with the reference ``feature/spectral.py:687``).

    Parameters
    ----------
    y, S, n_fft, hop_length, win_length, window, center, pad_mode
        signal or spectrogram, and STFT controls
    amin : float > 0
        power floor
    power : float
        spectrum exponent

    Returns
    -------
    flatness : jax.Array [shape=(..., 1, t)]
    """
    if amin <= 0:
        raise ParameterError("amin must be strictly positive")

    S_given = S
    S, n_fft = _spectrogram(
        y=y, S=S, n_fft=n_fft, hop_length=hop_length, power=1.0,
        win_length=win_length, window=window, center=center, pad_mode=pad_mode,
    )
    _check_nonneg_real(S, "Spectral flatness", computed=S_given is None)

    return _flatness_core(S, amin=float(amin), power=float(power))


@functools.partial(jax.jit, static_argnames=("amin", "power"))
def _flatness_core(S, *, amin, power):
    S_thresh = jnp.maximum(amin, S**power)
    gmean = jnp.exp(jnp.mean(jnp.log(S_thresh), axis=-2, keepdims=True))
    amean = jnp.mean(S_thresh, axis=-2, keepdims=True)
    return gmean / amean


def poly_features(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    order: int = 1,
    freq: Optional[np.ndarray] = None,
) -> jax.Array:
    """Per-frame polynomial fit coefficients over frequency.

    Least-squares fits an ``order``-degree polynomial to each spectral frame
    (behavior parity with the reference ``feature/spectral.py:919``); the fit
    is a batched normal-equation solve on device.

    Parameters
    ----------
    y, sr, S, n_fft, hop_length, win_length, window, center, pad_mode, freq
        signal or spectrogram, and STFT controls
    order : int >= 0
        polynomial degree

    Returns
    -------
    coefficients : jax.Array [shape=(..., order + 1, t)]
        highest degree first
    """
    S, n_fft = _spectrogram(
        y=y, S=S, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )

    if freq is None:
        freq = fft_frequencies(sr=sr, n_fft=n_fft)

    freq_np = np.asarray(freq)
    if freq_np.ndim == 1:
        # Vandermonde in np.polyfit's order (highest degree first)
        V = np.vander(freq_np, order + 1)
        pinv = np.linalg.pinv(V)  # (order+1, n_freq)
        return jnp.einsum(
            "df,...ft->...dt", jnp.asarray(pinv, dtype=S.dtype), S,
            precision=jax.lax.Precision.HIGHEST,
        )

    # Variable frequencies: batched lstsq over channels/frames
    freq_j = jnp.asarray(freq_np)

    def fit(fr: jax.Array, col: jax.Array) -> jax.Array:
        V = jnp.vander(fr, order + 1)
        sol, *_ = jnp.linalg.lstsq(V, col)
        return sol

    flatS = jnp.swapaxes(S, -2, -1)  # (..., t, f)
    flatF = jnp.swapaxes(freq_j, -2, -1)
    bshape = jnp.broadcast_shapes(flatS.shape[:-1], flatF.shape[:-1])
    flatS = jnp.broadcast_to(flatS, bshape + flatS.shape[-1:]).reshape(
        -1, flatS.shape[-1]
    )
    flatF = jnp.broadcast_to(flatF, bshape + flatF.shape[-1:]).reshape(
        -1, flatF.shape[-1]
    )
    out = jax.vmap(fit)(flatF, flatS)
    out = out.reshape(*bshape, order + 1)
    return jnp.swapaxes(out, -2, -1)


def rms(
    *,
    y: Any = None,
    S: Any = None,
    frame_length: int = 2048,
    hop_length: int = 512,
    center: bool = True,
    pad_mode: str = "constant",
    dtype: Any = np.float32,
) -> jax.Array:
    """Root-mean-square (RMS) energy per frame.

    Computed from the waveform, or from a spectrogram via Parseval's
    theorem (behavior parity with the reference ``feature/spectral.py:806``).

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)] or None
        audio input
    S : spectrogram or None
        magnitude spectrogram input (alternative to ``y``)
    frame_length : int > 0
        analysis frame length
    hop_length : int > 0
        hop between frames
    center : bool
        pad ``y`` so frames are centered
    pad_mode : str
        padding mode when centered
    dtype : dtype
        output dtype for the spectrogram path

    Returns
    -------
    rms : jax.Array [shape=(..., 1, t)]
        RMS value per frame

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=0.5))
    >>> r = np.asarray(lt.feature.rms(y=y))
    >>> bool(abs(np.median(r) - 1/np.sqrt(2)) < 0.05)   # unit sine RMS
    True
    """
    if y is not None:
        return _rms_y_core(
            jnp.asarray(y), frame_length=int(frame_length),
            hop_length=int(hop_length), center=bool(center),
            pad_mode=pad_mode, dtype=np.dtype(dtype).name,
        )
    elif S is not None:
        S = jnp.asarray(S)
        if S.shape[-2] != frame_length // 2 + 1:
            raise ParameterError(
                f"Since S.shape[-2] is {S.shape[-2]}, "
                f"frame_length is expected to be {S.shape[-2] * 2 - 2} or "
                f"{S.shape[-2] * 2 - 1}; found {frame_length}"
            )
        return _rms_s_core(
            S, frame_length=int(frame_length), dtype=np.dtype(dtype).name
        )
    raise ParameterError("Either `y` or `S` must be input.")


@functools.partial(
    jax.jit,
    static_argnames=("frame_length", "hop_length", "center", "pad_mode",
                     "dtype"),
)
def _rms_y_core(y, *, frame_length, hop_length, center, pad_mode, dtype):
    if center:
        padding = [(0, 0)] * y.ndim
        padding[-1] = (int(frame_length // 2), int(frame_length // 2))
        y = jnp.pad(y, padding, mode=pad_mode)
    x = util.frame(y, frame_length=frame_length, hop_length=hop_length)
    power = jnp.mean(util.abs2(x, dtype=dtype), axis=-2, keepdims=True)
    return jnp.sqrt(power)


@functools.partial(jax.jit, static_argnames=("frame_length", "dtype"))
def _rms_s_core(S, *, frame_length, dtype):
    x = util.abs2(S, dtype=dtype)
    # Parseval correction for one-sided spectrum: halve DC and Nyquist
    scale = np.ones(x.shape[-2], dtype=np.float32)
    scale[0] = 0.5
    if frame_length % 2 == 0:
        scale[-1] = 0.5
    x = x * util.expand_to(jnp.asarray(scale), ndim=x.ndim, axes=-2)
    power = 2 * jnp.sum(x, axis=-2, keepdims=True) / frame_length**2
    return jnp.sqrt(power)


def zero_crossing_rate(
    y: Any,
    *,
    frame_length: int = 2048,
    hop_length: int = 512,
    center: bool = True,
    **kwargs: Any,
) -> jax.Array:
    """Fraction of sign changes per analysis frame.

    High rates indicate noisy/unvoiced content; low rates indicate
    tonal content.  Matches the reference's convention of counting a
    crossing at position ``i`` when ``sign(y[i]) != sign(y[i-1])``
    (with ``sign(0)`` treated as positive by default).

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> t = np.arange(22050) / 22050
    >>> y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    >>> z = np.asarray(lt.feature.zero_crossing_rate(y))
    >>> z.shape
    (1, 44)
    >>> bool(abs(float(z.mean()) - 2 * 440 / 22050) < 5e-3)
    True

    Parity: reference feature/spectral.py:1062.

    Parameters
    ----------
    y : input signal
    frame_length, hop_length, center
        framing controls
    **kwargs
        forwarded to ``zero_crossings``

    Returns
    -------
    zcr : jax.Array [shape=(..., 1, t)]
    """
    kwargs["axis"] = -2
    kwargs.setdefault("pad", False)
    return _zcr_core(
        jnp.asarray(y), frame_length=int(frame_length),
        hop_length=int(hop_length), center=bool(center),
        zc_kwargs=tuple(sorted(kwargs.items())),
    )


@functools.partial(
    jax.jit,
    static_argnames=("frame_length", "hop_length", "center", "zc_kwargs"),
)
def _zcr_core(y, *, frame_length, hop_length, center, zc_kwargs):
    from ..core.audio import zero_crossings

    if center:
        padding = [(0, 0)] * y.ndim
        padding[-1] = (int(frame_length // 2), int(frame_length // 2))
        y = jnp.pad(y, padding, mode="edge")

    y_framed = util.frame(y, frame_length=frame_length, hop_length=hop_length)
    crossings = zero_crossings(y_framed, **dict(zc_kwargs))
    return jnp.mean(crossings, axis=-2, keepdims=True)


def chroma_stft(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    norm: Optional[float] = np.inf,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    tuning: Optional[float] = None,
    n_chroma: int = 12,
    **kwargs: Any,
) -> jax.Array:
    """Chromagram from a power STFT: energy folded onto 12 pitch classes.

    Projects ``|STFT|**2`` onto a chroma filterbank (behavior parity with
    the reference ``feature/spectral.py:1137``).  With audio input and an
    explicit ``tuning``, the whole chain — frame, window, DFT, power,
    chroma projection — dispatches as one fused Pallas kernel on TPU.

    Parameters
    ----------
    y, sr, S, n_fft, hop_length, win_length, window, center, pad_mode
        signal or precomputed power spectrogram, and STFT controls
    norm : float or None
        column-wise normalization order (inf = max)
    tuning : float or None
        tuning deviation in fractions of a chroma bin; None estimates it
    n_chroma : int > 0
        number of chroma bins (12 = semitones)

    Returns
    -------
    chromagram : jax.Array [shape=(..., n_chroma, t)]
        normalized per-frame pitch-class energy

    See Also
    --------
    chroma_cqt, chroma_cens, filters.chroma

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(261.63, duration=0.5))   # C4
    >>> ch = np.asarray(lt.feature.chroma_stft(y=y, sr=22050, tuning=0.0))
    >>> int(ch.mean(axis=1).argmax())                   # strongest class: C
    0
    """
    # Fused Pallas path when the full spectrogram isn't otherwise needed
    # (explicit tuning, audio input): |STFT|² · chroma in one kernel.
    if S is None and y is not None and tuning is not None:
        from ..ops import pallas_stft as _pstft
        from ..ops.fft import _resolved_backend

        y_arr = jnp.asarray(y)
        wl = n_fft if win_length is None else win_length
        if (
            _resolved_backend() == "matmul"
            and y_arr.dtype == jnp.float32
            and pad_mode in ("constant", "reflect")
            and _pstft.pallas_supported(n_fft, hop_length)
        ):
            chromafb = filters.chroma(
                sr=sr, n_fft=n_fft, tuning=tuning, n_chroma=n_chroma,
                **kwargs,
            )
            window_dev = _win_device(window, wl, n_fft, jnp.float32)
            try:
                raw = _pstft.stft_mel_pallas(
                    y_arr, window_dev, chromafb, n_fft=n_fft,
                    hop_length=hop_length, power=2.0, center=center,
                    pad_mode=pad_mode,
                )
                return util.normalize(raw, norm=norm, axis=-2)
            except Exception:
                pass

    S, n_fft = _spectrogram(
        y=y, S=S, n_fft=n_fft, hop_length=hop_length, power=2,
        win_length=win_length, window=window, center=center, pad_mode=pad_mode,
    )

    if tuning is None:
        from ..core.pitch import estimate_tuning

        tuning = float(estimate_tuning(S=S, sr=sr, bins_per_octave=n_chroma))

    chromafb = filters.chroma(
        sr=sr, n_fft=n_fft, tuning=tuning, n_chroma=n_chroma, **kwargs
    )
    return _project_norm_core(
        S, jnp.asarray(np.asarray(chromafb, dtype=np.dtype(S.dtype))),
        threshold=None, norm=None if norm is None else float(norm),
    )


@functools.partial(jax.jit, static_argnames=("threshold", "norm", "take_abs"))
def _project_norm_core(X, basis, *, threshold, norm, take_abs=False):
    """basis projection → threshold → per-column normalize, one program.

    Shared tail of the chroma features (eagerly the einsum + where +
    normalize chain costs ~6 device dispatches per call).  ``take_abs``
    folds the |CQT/VQT| magnitude into the same program, saving the
    chroma callers a standalone ``abs`` dispatch.
    """
    if take_abs:
        X = jnp.abs(X)
    out = jnp.einsum(
        "cf,...ft->...ct", basis, X, precision=jax.lax.Precision.HIGHEST
    )
    if threshold is not None:
        out = jnp.where(out < threshold, 0.0, out)
    if norm is not None:
        out = util.normalize(out, norm=norm, axis=-2)
    return out


def chroma_cqt(
    *,
    y: Any = None,
    sr: float = 22050,
    C: Any = None,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    norm: Optional[float] = np.inf,
    threshold: float = 0.0,
    tuning: Optional[float] = None,
    n_chroma: int = 12,
    n_octaves: int = 7,
    window: Optional[np.ndarray] = None,
    bins_per_octave: int = 36,
    cqt_mode: str = "full",
) -> jax.Array:
    """Constant-Q chromagram: CQT magnitudes folded onto pitch classes.

    Parity: feature/spectral.py:1296.

    Parameters
    ----------
    y, sr, C, hop_length, fmin
        signal or precomputed CQT magnitude
    norm, threshold, tuning, n_chroma, n_octaves, window, bins_per_octave, cqt_mode
        chroma construction controls

    Returns
    -------
    chromagram : jax.Array [shape=(..., n_chroma, t)]
    """
    from ..core import constantq
    from ..core.convert import note_to_hz

    cqt_func = {"full": constantq.cqt, "hybrid": constantq.hybrid_cqt}

    if bins_per_octave is None:
        bins_per_octave = n_chroma
    elif np.remainder(bins_per_octave, n_chroma) != 0:
        raise ParameterError(
            f"bins_per_octave={bins_per_octave} must be an integer "
            f"multiple of n_chroma={n_chroma}"
        )

    if fmin is None:
        fmin = note_to_hz("C1")

    take_abs = False
    if C is None:
        if cqt_mode == "full":
            # |·| folds into the CQT ladder program itself: the array
            # crossing into the projection matmul program must be real on
            # the axon backend (complex inter-program operands are rejected)
            C = constantq._vqt_dispatch(
                y,
                magnitude=True,
                sr=sr,
                hop_length=hop_length,
                fmin=fmin,
                n_bins=n_octaves * bins_per_octave,
                intervals="equal",
                gamma=0,
                bins_per_octave=bins_per_octave,
                tuning=tuning,
                filter_scale=1,
                norm=1,
                sparsity=0.01,
                window="hann",
                scale=True,
                pad_mode="constant",
                res_type="soxr_hq",
                dtype=None,
            )
        elif cqt_mode == "hybrid":
            # hybrid_cqt is already magnitude-valued (real)
            take_abs = True
            C = cqt_func[cqt_mode](
                y,
                sr=sr,
                hop_length=hop_length,
                fmin=fmin,
                n_bins=n_octaves * bins_per_octave,
                bins_per_octave=bins_per_octave,
                tuning=tuning,
            )
        else:
            raise ParameterError(f"Invalid cqt_mode: {cqt_mode}")
    else:
        C = jnp.asarray(C)

    cq_to_chr = filters.cq_to_chroma(
        C.shape[-2],
        bins_per_octave=bins_per_octave,
        n_chroma=n_chroma,
        fmin=fmin,
        window=window,
    )
    real_dtype = np.zeros((), dtype=np.dtype(C.dtype)).real.dtype
    return _project_norm_core(
        C, jnp.asarray(np.asarray(cq_to_chr, dtype=real_dtype)),
        threshold=None if threshold is None else float(threshold),
        norm=None if norm is None else float(norm),
        take_abs=take_abs,
    )


def chroma_cens(
    *,
    y: Any = None,
    sr: float = 22050,
    C: Any = None,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    tuning: Optional[float] = None,
    n_chroma: int = 12,
    n_octaves: int = 7,
    bins_per_octave: int = 36,
    cqt_mode: str = "full",
    window: Optional[np.ndarray] = None,
    norm: Optional[float] = 2,
    win_len_smooth: Optional[int] = 41,
    smoothing_window: _WindowSpec = "hann",
) -> jax.Array:
    """Chroma Energy Normalized Statistics (CENS).

    L1-normalized chroma, amplitude-quantized, smoothed, then L2-normalized —
    robust to dynamics and timbre (behavior parity with the reference
    ``feature/spectral.py:1426``).

    Parameters
    ----------
    y, sr, C, hop_length, fmin
        signal or precomputed CQT magnitude
    win_len_smooth : int or None
        smoothing window length
    smoothing_window : window spec
        smoothing window shape
    norm, tuning, n_chroma, n_octaves, window, bins_per_octave, cqt_mode
        chroma construction controls

    Returns
    -------
    cens : jax.Array [shape=(..., n_chroma, t)]
    """
    if win_len_smooth is not None and (
        not isinstance(win_len_smooth, (int, np.integer)) or win_len_smooth <= 0
    ):
        raise ParameterError(
            f"the CENS smoothing length must be a positive frame count or "
            f"None; got {win_len_smooth!r}"
        )

    chroma = chroma_cqt(
        y=y, C=C, sr=sr, hop_length=hop_length, fmin=fmin,
        bins_per_octave=bins_per_octave, tuning=tuning, norm=None,
        n_chroma=n_chroma, n_octaves=n_octaves, cqt_mode=cqt_mode, window=window,
    )

    if win_len_smooth:
        win = filters.get_window(smoothing_window, win_len_smooth + 2,
                                 fftbins=False)
        win = np.asarray(win, dtype=np.float32) / np.sum(win)
        kernel = jnp.asarray(win)
    else:
        kernel = None

    # L1-normalize → quantize → smooth → re-normalize as ONE program
    # (eagerly ~35 dispatches after the chroma)
    return _cens_core(chroma, kernel,
                      norm=None if norm is None else float(norm))


@functools.partial(jax.jit, static_argnames=("norm",))
def _cens_core(chroma, kernel, *, norm):
    chroma = util.normalize(chroma, norm=1, axis=-2)

    # Quantize amplitudes
    QUANT_STEPS = [0.4, 0.2, 0.1, 0.05]
    QUANT_WEIGHTS = [0.25, 0.25, 0.25, 0.25]

    chroma_quant = jnp.zeros_like(chroma)
    for cur_quant_step_idx, cur_quant_step in enumerate(QUANT_STEPS):
        chroma_quant = chroma_quant + (chroma > cur_quant_step) * QUANT_WEIGHTS[
            cur_quant_step_idx
        ]

    if kernel is not None:
        # Temporal smoothing by convolution with a window ('same' mode)
        k = kernel.astype(chroma_quant.dtype)
        n_win = k.shape[0]
        pad = (n_win - 1) // 2
        pads = [(0, 0)] * chroma_quant.ndim
        pads[-1] = (pad, n_win - 1 - pad)
        padded = jnp.pad(chroma_quant, pads)
        cens = jax.vmap(
            lambda row: jnp.convolve(row, k, mode="valid"),
        )(padded.reshape(-1, padded.shape[-1])).reshape(
            *chroma_quant.shape[:-1], -1
        )
    else:
        cens = chroma_quant

    return util.normalize(cens, norm=norm, axis=-2)


def chroma_vqt(
    *,
    y: Any = None,
    sr: float = 22050,
    V: Any = None,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    intervals: Any = None,
    norm: Optional[float] = np.inf,
    threshold: float = 0.0,
    n_octaves: int = 7,
    gamma: Optional[float] = 0,
    bins_per_octave: int = 12,
) -> jax.Array:
    """Variable-Q chromagram.

    Parity: feature/spectral.py:1576 — like ``chroma_cqt`` but over a VQT
    with arbitrary interval systems.

    Parameters
    ----------
    y, sr, V, hop_length, fmin
        signal or precomputed VQT magnitude
    intervals : str or array
        interval system (see ``vqt``)
    norm, threshold, n_octaves, gamma, bins_per_octave
        construction controls

    Returns
    -------
    chromagram : jax.Array [shape=(..., bins_per_octave, t)]
    """
    from ..core import constantq
    from ..core.convert import note_to_hz

    if fmin is None:
        fmin = note_to_hz("C1")

    if V is None:
        if intervals is None:
            raise ParameterError("intervals must be provided to compute VQT chroma")
        # |·| folds into the VQT program itself: the array crossing into
        # the projection matmul program must be real on the axon backend
        V = constantq._vqt_dispatch(
            y,
            magnitude=True,
            sr=sr,
            hop_length=hop_length,
            fmin=fmin,
            intervals=intervals,
            gamma=gamma,
            n_bins=n_octaves * bins_per_octave,
            bins_per_octave=bins_per_octave,
            tuning=0.0,
            filter_scale=1,
            norm=1,
            sparsity=0.01,
            window="hann",
            scale=True,
            pad_mode="constant",
            res_type="soxr_hq",
            dtype=None,
        )
    else:
        V = jnp.asarray(V)

    cq_to_chr = filters.cq_to_chroma(
        V.shape[-2],
        bins_per_octave=bins_per_octave,
        n_chroma=bins_per_octave,
        fmin=fmin,
    )
    real_dtype = np.zeros((), dtype=np.dtype(V.dtype)).real.dtype
    return _project_norm_core(
        V, jnp.asarray(np.asarray(cq_to_chr, dtype=real_dtype)),
        threshold=None if threshold is None else float(threshold),
        norm=None if norm is None else float(norm),
        take_abs=False,
    )


def tonnetz(
    *,
    y: Any = None,
    sr: float = 22050,
    chroma: Any = None,
    **kwargs: Any,
) -> jax.Array:
    """Tonal centroid features (tonnetz).

    Projects chroma onto a 6-D basis of perfect-fifth, minor-third, and
    major-third circles [Harte et al. 2006] (behavior parity with the
    reference ``feature/spectral.py:1709``).

    Parameters
    ----------
    y, sr : signal input (used if ``chroma`` is None)
    chroma : np.ndarray or None
        precomputed (normalized) chromagram
    **kwargs
        forwarded to ``chroma_cqt``

    Returns
    -------
    tonnetz : jax.Array [shape=(..., 6, t)]
    """
    if y is None and chroma is None:
        raise ParameterError(
            "tonnetz needs either a signal (y=) or a chromagram (chroma=)"
        )
    if chroma is None:
        chroma = chroma_cqt(y=y, sr=sr, **kwargs)
    chroma = jnp.asarray(chroma)

    # Harmonic-network basis: each interval circle (fifths, minor thirds,
    # major thirds) contributes a sine/cosine coordinate pair; the major
    # thirds circle is drawn at half radius.
    angle = np.pi * np.linspace(0, 12, num=chroma.shape[-2], endpoint=False)
    rows = []
    for circle_ratio, radius in ((7.0 / 6, 1.0), (3.0 / 2, 1.0),
                                 (2.0 / 3, 0.5)):
        rows.append(radius * np.sin(circle_ratio * angle))
        rows.append(radius * np.cos(circle_ratio * angle))
    basis = np.stack(rows)

    return _tonnetz_core(
        chroma, jnp.asarray(basis.astype(np.dtype(chroma.dtype)))
    )


@jax.jit
def _tonnetz_core(chroma, phi):
    return jnp.einsum(
        "pc,...ci->...pi", phi, util.normalize(chroma, norm=1, axis=-2),
        precision=jax.lax.Precision.HIGHEST,
    )


def melspectrogram(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    power: float = 2.0,
    **kwargs: Any,
) -> jax.Array:
    """Mel-scaled spectrogram.

    ``|STFT|**power`` projected onto a mel filterbank (behavior parity with
    the reference ``feature/spectral.py:2022``).  On TPU this dispatches one
    fused Pallas program (frame → window → Cooley-Tukey DFT → |·|² → mel,
    all in VMEM); elsewhere an XLA-fused matmul pipeline.  Leading
    dimensions batch into the kernel grid.

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)] or None
        audio input
    sr : number > 0
        sampling rate
    S : spectrogram or None
        precomputed power spectrogram (alternative to ``y``)
    n_fft, hop_length, win_length, window, center, pad_mode
        STFT controls, as in ``stft``
    power : float > 0
        magnitude exponent (2 = power, 1 = magnitude)
    **kwargs
        mel filterbank controls (``n_mels``, ``fmin``, ``fmax``, ``htk``,
        ``norm`` — see ``filters.mel``)

    Returns
    -------
    M : jax.Array [shape=(..., n_mels, t)]
        mel spectrogram

    See Also
    --------
    mfcc, filters.mel, librosa_tpu.stft

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=1.0))
    >>> M = lt.feature.melspectrogram(y=y, sr=22050)
    >>> M.shape
    (128, 44)
    >>> stereo = np.stack([y, y])
    >>> lt.feature.melspectrogram(y=stereo, sr=22050).shape
    (2, 128, 44)
    """
    if S is None and y is not None:
        # Fused single-program hot path: frame → window → DFT power → mel
        y = jnp.asarray(y)
        if not jnp.issubdtype(y.dtype, jnp.floating):
            raise ParameterError("Audio data must be floating-point")
        if win_length is None:
            win_length = n_fft
        if hop_length is None:
            hop_length = int(win_length // 4)
        real_dtype = (
            y.dtype if y.dtype in (jnp.float32, jnp.float64) else jnp.float32
        )
        window_dev = _win_device(window, win_length, n_fft, real_dtype)
        mel_basis = filters.mel(sr=sr, n_fft=n_fft, **kwargs)

        # On TPU with standard pow2 configurations, the fused Pallas
        # kernel (frame→window→CT-DFT→|·|²→mel entirely in VMEM) is the
        # fastest path; otherwise the XLA-fused matmul pipeline.
        from ..ops import pallas_stft as _pstft
        from ..ops.fft import _resolved_backend

        if (
            _resolved_backend() == "matmul"
            and real_dtype == jnp.float32
            and pad_mode in ("constant", "reflect")
            and _pstft.pallas_supported(n_fft, hop_length)
        ):
            try:
                return _pstft.stft_mel_pallas(
                    y, window_dev, mel_basis,
                    n_fft=n_fft, hop_length=hop_length, power=float(power),
                    center=center, pad_mode=pad_mode,
                )
            except Exception as _e:
                # fall back to the XLA path on any kernel-support gap —
                # but never silently: a swallowed error here once hid a
                # 3x throughput regression
                warnings.warn(
                    f"fused mel kernel unavailable ({_e!r}); "
                    "falling back to the XLA pipeline",
                    stacklevel=2,
                )

        return _stft_mel_core(
            y,
            window_dev,
            _mats_arg(n_fft, real_dtype),
            jnp.asarray(np.asarray(mel_basis, dtype=np.dtype(real_dtype))),
            n_fft=n_fft,
            hop_length=hop_length,
            center=center,
            pad_mode=pad_mode,
            power=float(power),
        )

    S, n_fft = _spectrogram(
        y=y, S=S, n_fft=n_fft, hop_length=hop_length, power=power,
        win_length=win_length, window=window, center=center, pad_mode=pad_mode,
    )
    mel_basis = filters.mel(sr=sr, n_fft=n_fft, **kwargs)
    return jnp.einsum(
        "...ft,mf->...mt", S, jnp.asarray(np.asarray(mel_basis, dtype=np.dtype(S.dtype))),
        precision=jax.lax.Precision.HIGHEST,
    )


def mfcc(
    *,
    y: Any = None,
    sr: float = 22050,
    S: Any = None,
    n_mfcc: int = 20,
    dct_type: int = 2,
    norm: Optional[str] = "ortho",
    lifter: float = 0,
    mel_norm: Union[str, float, None] = "slaney",
    **kwargs: Any,
) -> jax.Array:
    """Mel-frequency cepstral coefficients (MFCCs).

    DCT-II (orthonormal) over a log-power mel spectrogram, with optional
    cepstral liftering.  Behavior parity with the reference
    ``feature/spectral.py:1843``; the DCT is a matmul against a
    host-precomputed DCT matrix (``ops.transforms.dct_matrix``) —
    MXU-native, bit-matching ``scipy.fft.dct``.

    Parameters
    ----------
    y : np.ndarray or jax.Array or None
        audio input
    sr : number > 0
        sampling rate
    S : np.ndarray or None
        precomputed log-power mel spectrogram (alternative to ``y``)
    n_mfcc : int > 0
        number of coefficients to return
    dct_type : {1, 2, 3}
        DCT type
    norm : 'ortho' or None
        DCT normalization
    lifter : float >= 0
        cepstral liftering coefficient (0 = none)
    mel_norm, **kwargs
        forwarded to ``melspectrogram``

    Returns
    -------
    M : jax.Array [shape=(..., n_mfcc, t)]
        MFCC sequence

    See Also
    --------
    melspectrogram, feature.inverse.mfcc_to_mel

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=1.0))
    >>> m = lt.feature.mfcc(y=y, sr=22050, n_mfcc=13)
    >>> m.shape
    (13, 44)
    """
    if lifter < 0:
        raise ParameterError(f"MFCC lifter={lifter} must be a non-negative number")

    # dB conversion (for computed mels) + DCT + liftering fuse into one
    # program after the (single-program) mel spectrogram
    if S is None:
        S = melspectrogram(y=y, sr=sr, norm=mel_norm, **kwargs)
        db = True
    else:
        S = jnp.asarray(S)
        db = False

    n_mels = S.shape[-2]
    C = dct_matrix(n_mels, dct_type=dct_type, norm=norm)[:n_mfcc]
    rdt = S.dtype if not jnp.issubdtype(S.dtype, jnp.complexfloating) else np.float32
    return _mfcc_tail(
        S, jnp.asarray(np.asarray(C, dtype=np.dtype(rdt))),
        lifter=float(lifter), db=db,
    )


@functools.partial(jax.jit, static_argnames=("lifter", "db"))
def _mfcc_tail(S, C, *, lifter, db):
    if db:
        S = power_to_db(S)
    M = jnp.einsum(
        "km,...mt->...kt", C, S, precision=jax.lax.Precision.HIGHEST,
    )
    if lifter > 0:
        n_mfcc = C.shape[0]
        LI = jnp.sin(jnp.pi * jnp.arange(1, 1 + n_mfcc, dtype=M.dtype) / lifter)
        LI = util.expand_to(LI, ndim=S.ndim, axes=-2)
        return M * (1 + (lifter / 2) * LI)
    return M
