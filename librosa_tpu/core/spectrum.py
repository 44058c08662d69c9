"""STFT engine and spectral transforms (L2).

TPU-first design: framing is a static gather fused by XLA into the
window-multiply and FFT; the inverse uses a shift-accumulate overlap-add
(no scatter).  All shape arithmetic (frame counts, padding) happens at trace
time; everything here jit-compiles cleanly with static configuration.

Behavioral parity with reference ``librosa/core/spectrum.py`` (cited inline).
Output layout matches the reference: frequency at axis -2, time at axis -1.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import filters
from ..ops.fft import dft_mats_device, frames_power_spectrum, frames_rdft
from ..ops import fft as _fft_ops
from ..ops.framing import frame_signal, overlap_add
from ..util import utils as util
from ..util.exceptions import ParameterError

__all__ = [
    "stft",
    "istft",
    "magphase",
    "phase_vocoder",
    "power_to_db",
    "db_to_power",
    "amplitude_to_db",
    "db_to_amplitude",
    "perceptual_weighting",
    "pcen",
    "griffinlim",
    "_spectrogram",
]

_WindowSpec = Any


def _mats_arg(n_fft: int, dtype: Any):
    """DFT matrices as jit arguments when the matmul backend is active."""
    if _fft_ops._resolved_backend() == "matmul":
        return dft_mats_device(n_fft, dtype)
    return None


def _win_device(
    window: _WindowSpec, win_length: int, n_fft: int, dtype: Any
) -> jax.Array:
    """Host-construct a window, center-pad to n_fft, move to device."""
    fft_window = filters.get_window(window, win_length, fftbins=True)
    if len(fft_window) < n_fft:
        lpad = (n_fft - len(fft_window)) // 2
        fft_window = np.pad(
            fft_window, (lpad, n_fft - len(fft_window) - lpad), mode="constant"
        )
    # cast on host: a dtype-converting device_put dispatches a separate
    # convert_element_type program per call (tracer-safe: only for np input)
    if isinstance(fft_window, np.ndarray):
        fft_window = fft_window.astype(np.dtype(dtype), copy=False)
    return jnp.asarray(fft_window, dtype=dtype)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "center", "pad_mode")
)
def _stft_core(
    y: jax.Array,
    window: jax.Array,
    dft_mats,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
) -> jax.Array:
    """Framed windowed rFFT.  Returns (..., 1 + n_fft//2, n_frames).

    Equivalent to reference core/spectrum.py:58 (stft): centered pad,
    stride-trick framing, blocked rFFT — expressed as pad + gather + batched
    rfft that XLA fuses and tiles.
    """
    if center:
        pad = [(0, 0)] * y.ndim
        pad[-1] = (n_fft // 2, n_fft // 2)
        y = jnp.pad(y, pad, mode=pad_mode)
    frames = frame_signal(y, frame_length=n_fft, hop_length=hop_length)
    spec = frames_rdft(frames * window, n_fft=n_fft, dft_mats=dft_mats)
    # (..., n_frames, n_bins) → (..., n_bins, n_frames)
    return jnp.swapaxes(spec, -2, -1)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "center", "pad_mode", "power"),
)
def _stft_mel_core(
    y: jax.Array,
    window: jax.Array,
    dft_mats,
    mel_basis: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    power: float,
) -> jax.Array:
    """One fused program: pad → frame → window → DFT-power → mel matmul.

    The full BASELINE config-1 hot path with zero intermediate dispatches:
    frames never round-trip to HBM between the DFT matmuls and the mel
    projection; XLA tiles the whole chain onto the MXU.
    """
    if center:
        pad = [(0, 0)] * y.ndim
        pad[-1] = (n_fft // 2, n_fft // 2)
        y = jnp.pad(y, pad, mode=pad_mode)
    frames = frame_signal(y, frame_length=n_fft, hop_length=hop_length)
    pw = frames_power_spectrum(frames * window, n_fft=n_fft, dft_mats=dft_mats)
    if power == 1:
        pw = jnp.sqrt(pw)
    elif power != 2:
        pw = pw ** (power / 2)
    return jnp.einsum(
        "...tf,mf->...mt", pw, mel_basis, precision=jax.lax.Precision.HIGHEST
    )


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "center", "pad_mode", "power")
)
def _stft_power_core(
    y: jax.Array,
    window: jax.Array,
    dft_mats,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    power: float,
) -> jax.Array:
    """Fused |STFT|**power without complex intermediates.

    The hot path for every magnitude/power feature (mel, mfcc, chroma,
    spectral descriptors): frame gather → window multiply → real-DFT power
    via MXU matmuls (``ops.fft.frames_power_spectrum``) → optional
    power/2 exponent, all in one XLA program.
    """
    if center:
        pad = [(0, 0)] * y.ndim
        pad[-1] = (n_fft // 2, n_fft // 2)
        y = jnp.pad(y, pad, mode=pad_mode)
    frames = frame_signal(y, frame_length=n_fft, hop_length=hop_length)
    pw = frames_power_spectrum(frames * window, n_fft=n_fft, dft_mats=dft_mats)
    if power == 2:
        out = pw
    elif power == 1:
        out = jnp.sqrt(pw)
    else:
        out = pw ** (power / 2)
    return jnp.swapaxes(out, -2, -1)


def stft(
    y: Any,
    *,
    n_fft: int = 2048,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    dtype: Any = None,
    pad_mode: str = "constant",
    out: Any = None,
) -> jax.Array:
    """Short-time Fourier transform (STFT).

    Represents a signal in the time-frequency domain by computing discrete
    Fourier transforms over short overlapping windows.  Behavior parity with
    the reference ``core/spectrum.py:58``; on TPU the framing, windowing,
    DFT (as MXU matmuls), and any downstream basis projection fuse into one
    device program.

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)]
        input signal(s); leading dimensions are broadcast (multichannel)
    n_fft : int > 0
        length of the windowed signal after padding to ``n_fft``
    hop_length : int > 0 or None
        number of samples between adjacent frames; defaults to
        ``win_length // 4``
    win_length : int or None
        window length; defaults to ``n_fft``.  The window is zero-padded
        (centered) up to ``n_fft``
    window : str, tuple, number, callable, or np.ndarray
        window specification, as in ``filters.get_window``
    center : bool
        if True, pad ``y`` by ``n_fft // 2`` on both sides so frame ``t``
        is centered at ``y[t * hop_length]``
    dtype : complex dtype or None
        output dtype; inferred from the input by default
    pad_mode : str
        padding mode for ``center=True`` (default ``'constant'``)
    out : ignored
        accepted for reference API compatibility (JAX is functional)

    Returns
    -------
    D : jax.Array [shape=(..., 1 + n_fft//2, t), dtype=complex]
        complex spectrogram: ``np.abs(D)`` is the magnitude,
        ``np.angle(D)`` the phase

    See Also
    --------
    istft : inverse STFT
    reassigned_spectrogram : time-frequency reassignment

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=1.0))
    >>> D = lt.stft(y)
    >>> D.shape
    (1025, 44)
    >>> y_hat = lt.istft(D, length=len(y))      # round trip
    >>> float(np.max(np.abs(np.asarray(y_hat) - y))) < 1e-5
    True
    """
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = int(win_length // 4)
    if hop_length <= 0:
        raise ParameterError(f"hop_length={hop_length} must be a positive integer")

    y = jnp.asarray(y)
    if not jnp.issubdtype(y.dtype, jnp.floating):
        raise ParameterError("Audio data must be floating-point")
    if y.ndim == 0:
        raise ParameterError("Audio data must be at least one-dimensional")

    if center:
        if n_fft > y.shape[-1]:
            warnings.warn(
                f"n_fft={n_fft} is too large for input signal of length={y.shape[-1]}",
                stacklevel=2,
            )
    elif n_fft > y.shape[-1]:
        raise ParameterError(
            f"n_fft={n_fft} is too large for uncentered analysis of input "
            f"signal of length={y.shape[-1]}"
        )

    real_dtype = y.dtype if y.dtype in (jnp.float32, jnp.float64) else jnp.float32
    window_dev = _win_device(window, win_length, n_fft, real_dtype)

    S = _stft_core(
        y,
        window_dev,
        _mats_arg(n_fft, window_dev.dtype),
        n_fft=n_fft,
        hop_length=hop_length,
        center=center,
        pad_mode=pad_mode,
    )
    if dtype is not None:
        S = S.astype(dtype)
    return S


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "n_frames", "start", "out_len"),
)
def _istft_core(
    S: jax.Array,
    window: jax.Array,
    wss: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    n_frames: int,
    start: int,
    out_len: int,
) -> jax.Array:
    """Windowed irfft + overlap-add + window-sumsquare normalization.

    Equivalent to reference core/spectrum.py:395 (istft), with the head-block
    special case folded into a single full overlap-add followed by slicing.
    """
    S = S[..., :n_frames]
    # (..., n_bins, T) → (..., T, n_bins) → irfft → (..., T, n_fft)
    frames = jnp.fft.irfft(jnp.swapaxes(S, -2, -1), n=n_fft, axis=-1)
    frames = frames * window
    y_full = overlap_add(frames, hop_length=hop_length)

    avail = y_full.shape[-1] - start
    take = min(avail, out_len)
    y = y_full[..., start : start + take]
    if take < out_len:
        pad = [(0, 0)] * y.ndim
        pad[-1] = (0, out_len - take)
        y = jnp.pad(y, pad)

    # Normalize where the window envelope is non-degenerate
    denom = wss
    good = denom > util.tiny(denom)
    return jnp.where(good, y / jnp.where(good, denom, 1.0), y)


def istft(
    stft_matrix: Any,
    *,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    n_fft: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    dtype: Any = None,
    length: Optional[int] = None,
    out: Any = None,
) -> jax.Array:
    """Inverse STFT via windowed overlap-add.

    Reconstructs the least-squares-optimal signal for a (possibly modified)
    STFT matrix [Griffin & Lim 1984].  Behavior parity with the reference
    ``core/spectrum.py:395``; the overlap-add scatter and window-sumsquare
    normalization run as one fused device program.

    Parameters
    ----------
    stft_matrix : np.ndarray or jax.Array [shape=(..., 1 + n_fft//2, t)]
        complex STFT matrix (from ``stft``)
    hop_length : int > 0 or None
        hop length; defaults to ``win_length // 4``
    win_length : int or None
        synthesis window length; defaults to ``n_fft``
    n_fft : int or None
        FFT size; inferred as ``2 * (stft_matrix.shape[-2] - 1)`` by default
    window : window specification
        synthesis window (must match the analysis window for perfect
        reconstruction)
    center : bool
        if True, trim the ``n_fft // 2`` centering pad from the output
    dtype : real dtype or None
        output dtype
    length : int or None
        exact output length; pads/trims as needed
    out : ignored
        reference API compatibility

    Returns
    -------
    y : jax.Array [shape=(..., n)]
        reconstructed time-domain signal

    See Also
    --------
    stft : forward transform
    griffinlim : phase recovery from magnitudes only

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.chirp(fmin=110, fmax=880, duration=1.0))
    >>> y_hat = lt.istft(lt.stft(y), length=len(y))
    >>> float(np.max(np.abs(np.asarray(y_hat) - y))) < 1e-5
    True
    """
    S = jnp.asarray(stft_matrix)
    if n_fft is None:
        n_fft = 2 * (S.shape[-2] - 1)
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = int(win_length // 4)

    if length:
        padded_length = length + 2 * (n_fft // 2) if center else length
        n_frames = min(S.shape[-1], int(np.ceil(padded_length / hop_length)))
    else:
        n_frames = S.shape[-1]

    if dtype is None:
        dtype = util.dtype_c2r(S.dtype)

    expected_signal_len = n_fft + hop_length * (n_frames - 1)
    if length:
        expected_signal_len = int(length)
    elif center:
        expected_signal_len -= 2 * (n_fft // 2)

    start = n_fft // 2 if center else 0

    window_dev = _win_device(window, win_length, n_fft, np.dtype(dtype))

    # Host-computed normalization envelope (pure function of config)
    wss = filters.window_sumsquare(
        window=window,
        n_frames=n_frames,
        win_length=win_length,
        n_fft=n_fft,
        hop_length=hop_length,
        dtype=np.dtype(dtype),
    )
    wss = wss[start:]
    if wss.shape[-1] > expected_signal_len:
        wss = wss[:expected_signal_len]
    elif wss.shape[-1] < expected_signal_len:
        wss = np.pad(wss, (0, expected_signal_len - wss.shape[-1]))

    y = _istft_core(
        S,
        window_dev,
        jnp.asarray(wss),
        n_fft=n_fft,
        hop_length=hop_length,
        n_frames=n_frames,
        start=start,
        out_len=expected_signal_len,
    )
    return y.astype(dtype)


def magphase(D: Any, *, power: float = 1) -> Tuple[jax.Array, jax.Array]:
    """Separate a complex spectrogram into magnitude**power and phase.

    Parity: core/spectrum.py:1296 — ``D = S * P`` with ``S = |D|**power`` and
    ``P = exp(1j * angle(D))``.

    Parameters
    ----------
    D : complex spectrogram
    power : float
        magnitude exponent

    Returns
    -------
    S : jax.Array
        magnitude (to ``power``)
    P : jax.Array [complex]
        unit-magnitude phasor
    """
    return _magphase_core(jnp.asarray(D), power=float(power))


@functools.partial(jax.jit, static_argnames=("power",))
def _magphase_core(D, *, power):
    mag = jnp.abs(D)
    # Prevent NaNs from zero-division; zero bins get unit phase (matches
    # np.exp(1j*angle(0)) == 1+0j).
    denom = jnp.where(mag == 0, 1.0, mag)
    phase = jnp.where(mag == 0, jnp.ones_like(D), D / denom)
    return mag**power, phase


_PV_DEPRECATED = object()


def phase_vocoder(
    D: Any,
    *,
    rate: Optional[float] = None,
    t_out: Optional[np.ndarray] = None,
    kind: str = "linear",
    hop_length: Any = _PV_DEPRECATED,
    n_fft: Any = _PV_DEPRECATED,
) -> jax.Array:
    """Interpolation-based phase vocoder: time-stretch an STFT by ``rate``.

    Phase advances accumulate from frame-pair differences while magnitudes
    interpolate at the fractional output positions — the reference's
    algorithm (``core/spectrum.py:1364``), supporting an arbitrary output
    time grid ``t_out``.  ``hop_length``/``n_fft`` are deprecated and
    unused, as in the reference.

    Parameters
    ----------
    D : np.ndarray or jax.Array [shape=(..., d, n), dtype=complex]
        STFT matrix
    rate : float > 0
        speed-up factor: ``rate > 1`` is faster, ``rate < 1`` slower.
        Mutually exclusive with ``t_out``
    t_out : np.ndarray or None
        explicit (fractional) output frame positions in ``[0, n)``
    kind : str
        magnitude interpolation kind (``'linear'``, ``'nearest'``, or any
        scipy ``interp1d`` kind)

    Returns
    -------
    D_stretched : jax.Array [shape=(..., d, ceil(n / rate))]
        time-stretched STFT

    See Also
    --------
    effects.time_stretch : waveform-level stretching
    effects.pitch_shift : pitch shifting via stretch + resample

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> D = lt.stft(np.asarray(lt.tone(440, duration=1.0)))
    >>> lt.phase_vocoder(D, rate=2.0).shape[-1] == -(-D.shape[-1] // 2)
    True
    """
    for _name, _val in (("hop_length", hop_length), ("n_fft", n_fft)):
        if _val is not _PV_DEPRECATED:
            warnings.warn(
                f"The `{_name}` parameter is deprecated and unused in the "
                "current implementation.",
                FutureWarning,
                stacklevel=2,
            )
    D = jnp.asarray(D)
    n_frames = D.shape[-1]

    if (rate is None) == (t_out is None):
        raise ParameterError("Must specify exactly one of `rate` or `t_out`")
    if (rate is not None) and (rate <= 0):
        raise ParameterError(f"rate={rate} must be a positive number")
    if t_out is None:
        t_out = np.arange(0.0, n_frames, rate)
    t_out = np.asarray(t_out, dtype=float)
    if np.any(t_out < 0) or np.any(t_out >= n_frames):
        raise ParameterError("t_out values must be in the range [0, D.shape[-1])")
    if np.any(np.diff(t_out) < 0):
        warnings.warn(
            "t_out is not monotonic; phase estimation may be unstable",
            stacklevel=2,
        )

    # tracer-safe real dtype (phase_vocoder is also traced inside
    # _time_stretch_jit)
    rdt = np.dtype(np.result_type(
        np.zeros((), dtype=np.dtype(D.dtype)).real.dtype, np.float32
    ))
    i0 = np.floor(t_out).astype(np.int32)
    i1 = np.minimum(i0 + 1, n_frames - 1).astype(np.int32)

    if kind == "linear":
        # The reference interpolates magnitudes with
        # fill_value="extrapolate" (core/spectrum.py:1507): for t_out in
        # (n_frames-1, n_frames) the last segment's slope extends past the
        # final frame, so anchor on the second-to-last frame there.
        i0e = np.clip(i0, 0, max(n_frames - 2, 0)).astype(np.int32)
        mag_idx = (i0e, np.minimum(i0e + 1, n_frames - 1).astype(np.int32))
        frace = jnp.asarray((t_out - i0e).astype(rdt))
    elif kind == "nearest":
        # scipy interp1d 'nearest' rounds half-ties DOWN (toward i0)
        mag_idx = (np.where(t_out - i0 <= 0.5, i0, i1).astype(np.int32), None)
        frace = None
    else:
        mag_idx = (None, None)
        frace = None

    if kind in ("linear", "nearest"):
        # phase accumulation + magnitude gather/lerp + phasor as ONE
        # program (eagerly ~50 dispatches per call)
        return _phase_vocoder_core(
            D, jnp.asarray(i0), jnp.asarray(i1),
            None if mag_idx[0] is None else jnp.asarray(mag_idx[0]),
            None if mag_idx[1] is None else jnp.asarray(mag_idx[1]),
            frace, kind=kind,
        )

    # Exotic interpolation kinds are delegated to scipy on host
    import scipy.interpolate

    ph = jnp.angle(D)
    diff = ph[..., jnp.asarray(i1)] - ph[..., jnp.asarray(i0)]
    first = ph[..., int(i0[0])][..., None]
    phase = jnp.cumsum(jnp.concatenate([first, diff[..., :-1]], axis=-1),
                       axis=-1)
    interp = scipy.interpolate.interp1d(
        np.arange(n_frames),
        np.abs(np.asarray(D)),
        kind=kind,
        axis=-1,
        fill_value="extrapolate",
        assume_sorted=True,
        copy=False,
    )
    mag_out = jnp.asarray(interp(t_out))
    return util.phasor(phase, mag=mag_out)


@functools.partial(jax.jit, static_argnames=("kind",))
def _phase_vocoder_core(D, i0, i1, m0_idx, m1_idx, frace, *, kind):
    ph = jnp.angle(D)
    diff = ph[..., i1] - ph[..., i0]

    # phase[..., 0] = angle(D[..., i0[0]]); phase[..., k>0] = diff[..., k-1]
    first = ph[..., i0[0]][..., None]
    phase = jnp.cumsum(jnp.concatenate([first, diff[..., :-1]], axis=-1),
                       axis=-1)

    mag = jnp.abs(D)
    if kind == "linear":
        m0 = mag[..., m0_idx]
        m1 = mag[..., m1_idx]
        mag_out = m0 * (1 - frace) + m1 * frace
    else:  # nearest
        mag_out = mag[..., m0_idx]

    return util.phasor(phase, mag=mag_out)


# ---------------------------------------------------------------------------
# dB scaling (reference core/spectrum.py:1735-2150)
# ---------------------------------------------------------------------------


def _db_axes(ndim: int, axes: Any) -> Any:
    """Resolve the ``axes='auto'`` convention for dB reference/peak reduction.

    Reference semantics (core/spectrum.py:1855-1861): scalar → None,
    1-D → (-1,), ≥2-D → (-2, -1) so multichannel peaks are per-channel.
    """
    if axes == "auto":
        if ndim >= 2:
            return (-2, -1)
        if ndim == 1:
            return (-1,)
        return None
    return axes


def power_to_db(
    S: Any,
    *,
    ref: Union[float, Callable] = 1.0,
    amin: float = 1e-10,
    top_db: Optional[float] = 80.0,
    axes: Any = "auto",
) -> jax.Array:
    """Convert a power spectrogram (amplitude²) to decibel units.

    Computes ``10 * log10(S / ref)`` with an ``amin`` floor and an optional
    ``top_db`` dynamic-range clamp relative to the peak.  Behavior parity
    with the reference ``core/spectrum.py:1735``.

    Parameters
    ----------
    S : np.ndarray or jax.Array
        input power spectrogram (non-negative)
    ref : scalar or callable
        reference power.  A callable (e.g. ``np.max``) is applied to ``S``
        over ``axes``
    amin : float > 0
        minimum threshold for ``S`` and ``ref``
    top_db : float >= 0 or None
        clamp the output at ``(peak dB) - top_db``
    axes : 'auto', None, or tuple of int
        which trailing axes the callable ``ref`` and the ``top_db`` peak
        reduce over; ``'auto'`` reduces each channel's trailing 2 axes

    Returns
    -------
    S_db : jax.Array
        ``S`` in dB, same shape

    See Also
    --------
    amplitude_to_db, db_to_power, perceptual_weighting

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> S = np.abs(np.asarray(lt.stft(np.asarray(lt.tone(440, duration=0.5)))))**2
    >>> S_db = np.asarray(lt.power_to_db(S, ref=np.max))
    >>> float(S_db.max())
    0.0
    """
    S = jnp.asarray(S)
    if amin <= 0:
        raise ParameterError("amin must be strictly positive")
    if jnp.issubdtype(S.dtype, jnp.complexfloating):
        warnings.warn(
            "power_to_db was called on complex input so phase "
            "information will be discarded. To suppress this warning, "
            "call power_to_db(np.abs(D)**2) instead.",
            stacklevel=2,
        )
        magnitude = jnp.abs(S)
    else:
        magnitude = S

    axes = _db_axes(magnitude.ndim, axes)
    if top_db is not None and top_db < 0:
        raise ParameterError("top_db must be non-negative")

    axes_key = axes if axes is None else tuple(np.atleast_1d(axes).tolist())
    top_key = None if top_db is None else float(top_db)

    if not callable(ref):
        # scalar/array reference: everything in one program (|ref| on host
        # for plain scalars — an eager abs costs a dispatch)
        if np.isscalar(ref) or isinstance(ref, np.ndarray):
            # np value passed straight into the jit call: an eager
            # jnp.asarray of a 0-d scalar dispatches a convert program
            ref_arr = np.abs(np.asarray(ref, dtype=np.dtype(magnitude.dtype)))
        else:
            ref_arr = jnp.abs(jnp.asarray(ref, dtype=magnitude.dtype))
        return _power_to_db_core(
            magnitude, ref_arr, amin=float(amin), top_db=top_key,
            axes=axes_key,
        )

    if ref in (np.max, jnp.max, np.amax, jnp.amax):
        # max reference: materialize the dB array first, then reduce and
        # subtract it FROM THE SAME BUFFER in a second program.  A single
        # fused program lets XLA recompute the log for the reduction with
        # different (vectorized vs scalar) codegen, leaving the peak at
        # ±ulp instead of exactly 0 dB — and 0 dB at the peak is
        # contractual (reference semantics, docstring examples).
        log_mag = _db_log_core(magnitude, amin=float(amin))
        return _db_maxref_core(log_mag, top_db=top_key, axes=axes_key)

    # general callable reference: reduce eagerly (one launch), convert in
    # the fused program
    try:
        ref_value = jnp.asarray(
            ref(magnitude, axis=axes, keepdims=True)
        )
    except TypeError as e:
        raise ParameterError(
            "The provided reference function must support 'axis' and "
            "'keepdims' arguments for proper multichannel processing."
        ) from e
    return _power_to_db_core(
        magnitude, ref_value, amin=float(amin), top_db=top_key,
        axes=axes_key,
    )


@functools.partial(jax.jit, static_argnames=("amin",))
def _db_log_core(magnitude, *, amin):
    return 10.0 * jnp.log10(jnp.maximum(amin, magnitude))


@functools.partial(jax.jit, static_argnames=("top_db", "axes"))
def _db_maxref_core(log_mag, *, top_db, axes):
    log_spec = log_mag - jnp.max(log_mag, axis=axes, keepdims=True)
    if top_db is not None:
        peak = jnp.max(log_spec, axis=axes, keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


@functools.partial(jax.jit, static_argnames=("amin", "top_db", "axes"))
def _power_to_db_core(magnitude, ref_value, *, amin, top_db, axes):
    """dB conversion as one program (non-max references)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, magnitude))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref_value))

    if top_db is not None:
        peak = jnp.max(log_spec, axis=axes, keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


def db_to_power(S_db: Any, *, ref: float = 1.0) -> jax.Array:
    """Invert decibel scaling back to a power spectrogram.

    Inverse of ``power_to_db``: ``ref · 10^(S_db / 10)``.

    Parameters
    ----------
    S_db : array-like
        dB-scaled values
    ref : float > 0
        reference power used in the forward scaling

    Returns
    -------
    S : jax.Array
        power values

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> np.asarray(lt.db_to_power(np.array([0.0, 10.0, 20.0]))).round(6).tolist()
    [1.0, 10.0, 100.0]

    Parity: reference core/spectrum.py:1887.
    """
    return ref * jnp.power(10.0, 0.1 * jnp.asarray(S_db))


def amplitude_to_db(
    S: Any,
    *,
    ref: Union[float, Callable] = 1.0,
    amin: float = 1e-5,
    top_db: Optional[float] = 80.0,
    axes: Any = "auto",
) -> jax.Array:
    """Convert an amplitude (magnitude) spectrogram to dB.

    ``20 * log10(S / ref)``, equivalent to ``power_to_db(S**2)`` (behavior
    parity with the reference ``core/spectrum.py:1946``).

    Parameters
    ----------
    S : non-negative spectrogram
    ref : scalar or callable
        amplitude reference
    amin : float > 0
        magnitude floor
    top_db : float or None
        dynamic-range clamp below the peak
    axes : 'auto', None, or tuple
        reduction axes for callable ``ref``/peak

    Returns
    -------
    S_db : jax.Array
    """
    S = jnp.asarray(S)
    if jnp.issubdtype(S.dtype, jnp.complexfloating):
        warnings.warn(
            "amplitude_to_db was called on complex input so phase "
            "information will be discarded. To suppress this warning, "
            "call amplitude_to_db(np.abs(S)) instead.",
            stacklevel=2,
        )
    axes = _db_axes(S.ndim, axes)
    if top_db is not None and top_db < 0:
        raise ParameterError("top_db must be non-negative")
    if amin <= 0:
        raise ParameterError("amin must be strictly positive")

    axes_key = axes if axes is None else tuple(np.atleast_1d(axes).tolist())
    top_key = None if top_db is None else float(top_db)

    if not callable(ref):
        if np.isscalar(ref) or isinstance(ref, np.ndarray):
            ref_arr = np.abs(np.asarray(ref))
        else:
            ref_arr = jnp.abs(jnp.asarray(ref))
        return _amplitude_to_db_core(
            S, ref_arr, amin=float(amin), top_db=top_key, axes=axes_key,
        )

    if ref in (np.max, jnp.max, np.amax, jnp.amax):
        # see power_to_db: the dB array must be materialized before the
        # max reduction so the peak lands at exactly 0 dB
        log_mag = _db_log_core(
            _abs2_f_core(S), amin=float(amin) ** 2
        )
        return _db_maxref_core(log_mag, top_db=top_key, axes=axes_key)

    magnitude = jnp.abs(S)
    try:
        ref_value = jnp.asarray(ref(magnitude, axis=axes, keepdims=True))
    except TypeError as e:
        raise ParameterError(
            "The provided reference function must support 'axis' and "
            "'keepdims' arguments for proper multichannel processing."
        ) from e
    return _amplitude_to_db_core(
        magnitude, ref_value, amin=float(amin), top_db=top_key,
        axes=axes_key,
    )


@jax.jit
def _abs2_f_core(S):
    return jnp.square(jnp.abs(S))


@functools.partial(jax.jit, static_argnames=("amin", "top_db", "axes"))
def _amplitude_to_db_core(S, ref_value, *, amin, top_db, axes):
    magnitude = jnp.abs(S)
    return _power_to_db_core(
        jnp.square(magnitude), jnp.square(ref_value), amin=amin**2,
        top_db=top_db, axes=axes,
    )


def db_to_amplitude(S_db: Any, *, ref: float = 1.0) -> jax.Array:
    """Invert decibel scaling back to an amplitude (magnitude) spectrogram.

    Inverse of ``amplitude_to_db``: ``ref · 10^(S_db / 20)``.

    Parameters
    ----------
    S_db : array-like
        dB-scaled values
    ref : float > 0
        reference amplitude used in the forward scaling

    Returns
    -------
    S : jax.Array
        amplitude values

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> np.asarray(lt.db_to_amplitude(np.array([0.0, 20.0]))).round(6).tolist()
    [1.0, 10.0]

    Parity: reference core/spectrum.py:2054.
    """
    return db_to_power(S_db, ref=ref**2) ** 0.5


def perceptual_weighting(
    S: Any, frequencies: np.ndarray, *, kind: str = "A", **kwargs: Any
) -> jax.Array:
    """Perceptually weight a power spectrogram.

    Converts power to dB and offsets each frequency row by the chosen
    loudness curve (``A_weighting`` by default), approximating how loud
    each component sounds.

    Parameters
    ----------
    S : array-like [shape=(..., f, t)]
        power spectrogram
    frequencies : np.ndarray [shape=(f,)]
        center frequency of each row
    kind : str
        weighting curve (see ``frequency_weighting``)
    **kwargs
        forwarded to ``power_to_db`` (``ref``, ``amin``, ``top_db``)

    Returns
    -------
    S_weighted : jax.Array
        weighted dB spectrogram

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> S = np.ones((3, 4))
    >>> freqs = np.array([100.0, 1000.0, 10000.0])
    >>> W = np.asarray(lt.perceptual_weighting(S, freqs, ref=1.0))
    >>> bool(W[1, 0] > W[0, 0])   # 1 kHz louder than 100 Hz under A-curve
    True

    Parity: reference core/spectrum.py:2083.
    """
    from .convert import frequency_weighting

    offset = frequency_weighting(frequencies, kind=kind).reshape((-1, 1))
    result: jax.Array = jnp.asarray(offset) + power_to_db(S, **kwargs)
    return result


# ---------------------------------------------------------------------------
# PCEN (reference core/spectrum.py:2396) — IIR smoother as associative scan
# ---------------------------------------------------------------------------


def _exp_filter_scan(x: jax.Array, b: float, zi: jax.Array, axis: int):
    """First-order IIR  y[n] = b*x[n] + (1-b)*y[n-1]  along ``axis``.

    Linear first-order recurrences compose associatively, so this runs as a
    parallel (log-depth) ``lax.associative_scan`` on TPU instead of the
    reference's sequential ``scipy.signal.lfilter`` (core/spectrum.py:2648).
    ``zi`` is the scipy-convention initial delay state: y[0] = b*x[0] + zi.
    """
    x = jnp.moveaxis(x, axis, -1)
    # incorporate zi into the first element
    x0 = x[..., 0] + zi / b if b != 0 else x[..., 0]
    xs = jnp.concatenate([b * x0[..., None], b * x[..., 1:]], axis=-1)

    a = jnp.full(x.shape, 1.0 - b, dtype=x.dtype)

    def combine(l, r):
        a_l, b_l = l
        a_r, b_r = r
        return a_l * a_r, b_r + a_r * b_l

    _, y = jax.lax.associative_scan(combine, (a, xs), axis=-1)
    return jnp.moveaxis(y, -1, axis)


def pcen(
    S: Any,
    *,
    sr: float = 22050,
    hop_length: int = 512,
    gain: float = 0.98,
    bias: float = 2,
    power: float = 0.5,
    time_constant: float = 0.400,
    eps: float = 1e-6,
    b: Optional[float] = None,
    max_size: int = 1,
    ref: Optional[Any] = None,
    axis: int = -1,
    max_axis: Optional[int] = None,
    zi: Optional[Any] = None,
    return_zf: bool = False,
):
    """Per-channel energy normalization (PCEN).

    An adaptive gain control alternative to log scaling
    [Wang et al. 2017]: ``P = (S / (eps + M)**gain + bias)**power -
    bias**power``, where ``M`` is a temporal IIR smoothing of ``S``.
    Behavior parity with the reference ``core/spectrum.py:2396``; the
    smoother runs as a parallel (log-depth) associative scan on TPU, the
    optional frequency max-filter as an XLA ``reduce_window``.

    Parameters
    ----------
    S : np.ndarray or jax.Array [shape=(..., n, t)]
        input (magnitude) spectrogram, non-negative
    sr, hop_length : number
        used with ``time_constant`` to derive the smoothing coefficient
    gain : float >= 0
        gain-normalization exponent
    bias : float >= 0
        bias point of the nonlinear compression
    power : float >= 0
        compression exponent; 0 selects log compression
    time_constant : float > 0
        smoothing time constant in seconds
    eps : float > 0
        numerical floor for the smoother
    b : float in [0, 1] or None
        explicit smoothing coefficient; overrides ``time_constant``
    max_size : int > 0
        frequency-axis max-filter width for the smoother input
    ref : np.ndarray or None
        explicit smoother input (bypasses the max filter)
    axis : int
        time axis (default -1)
    max_axis : int or None
        frequency axis for the max filter (required if ``S.ndim > 2``)
    zi : np.ndarray or None
        initial filter delay state (for streaming/blockwise processing)
    return_zf : bool
        also return the final filter state for the next block

    Returns
    -------
    P : jax.Array
        the PCEN-normalized spectrogram (and ``zf`` if ``return_zf``)

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> S = np.abs(np.asarray(lt.stft(np.asarray(lt.tone(440, duration=0.5)))))**2
    >>> P1, zf = lt.pcen(S[..., :10], sr=22050, return_zf=True, max_size=1)
    >>> P2 = lt.pcen(S[..., 10:], sr=22050, zi=zf, max_size=1)   # streamed
    >>> full = np.asarray(lt.pcen(S, sr=22050))
    >>> bool(np.allclose(np.concatenate([P1, P2], axis=-1), full, atol=1e-5))
    True
    """
    # every compander coefficient has a hard domain; check them together
    for name, value, lo, strict in (
        ("power", power, 0, False), ("gain", gain, 0, False),
        ("bias", bias, 0, False), ("eps", eps, 0, True),
        ("time_constant", time_constant, 0, True),
    ):
        if value < lo or (strict and value == lo):
            raise ParameterError(
                f"PCEN coefficient {name}={value} must be "
                f"{'>' if strict else '>='} {lo}"
            )
    if not util.is_positive_int(max_size):
        raise ParameterError(
            f"the max-filter width must be a positive integer; "
            f"got max_size={max_size}"
        )

    if b is None:
        # one-pole smoother coefficient matched to the time constant
        # (the positive root of b^2 t^2 + b t - ... , reference eq.)
        t_frames = time_constant * sr / float(hop_length)
        b = (np.sqrt(1 + 4 * t_frames**2) - 1) / (2 * t_frames**2)
    if not 0 <= b <= 1:
        raise ParameterError(
            f"the smoothing coefficient b={b} is outside [0, 1]"
        )

    S = jnp.asarray(S)
    if jnp.issubdtype(S.dtype, jnp.complexfloating):
        warnings.warn(
            "pcen discards phase: the complex input is reduced to its "
            "magnitude. Pass pcen(np.abs(D)) to silence this warning.",
            stacklevel=2,
        )
        S = jnp.abs(S)

    if ref is None and max_size > 1:
        if S.ndim == 1:
            raise ParameterError(
                "a 1-D envelope has no frequency axis to max-filter over"
            )
        if max_axis is None:
            if S.ndim != 2:
                raise ParameterError(
                    f"max-filtering a {S.ndim}-D stack is ambiguous: "
                    "specify max_axis"
                )
            max_axis = int(np.mod(1 - axis, 2))

    # the whole array pipeline (max filter → scan → gain → compression) is
    # ONE jitted program: eagerly it issues ~190 device dispatches (the
    # log-depth associative scan alone emits dozens of slice/pad ops)
    return _pcen_core(
        S,
        None if ref is None else jnp.asarray(ref),
        None if zi is None else jnp.asarray(zi),
        b=float(b), gain=float(gain), bias=float(bias), power=float(power),
        eps=float(eps), max_size=int(max_size), axis=int(axis),
        max_axis=None if max_axis is None else int(max_axis),
        return_zf=bool(return_zf),
    )


@functools.partial(
    jax.jit,
    static_argnames=("b", "gain", "bias", "power", "eps", "max_size",
                     "axis", "max_axis", "return_zf"),
)
def _pcen_core(
    S, ref, zi, *, b, gain, bias, power, eps, max_size, axis, max_axis,
    return_zf,
):
    """PCEN array pipeline as one program (config is static)."""
    if ref is None:
        if max_size == 1:
            ref_arr = S
        else:
            # centered 1-D max filter (scipy.ndimage.maximum_filter1d parity)
            lpad = max_size // 2
            rpad = max_size - 1 - lpad
            pads = [(0, 0)] * S.ndim
            pads[max_axis] = (lpad, rpad)
            window_dims = [1] * S.ndim
            window_dims[max_axis] = max_size
            ref_arr = jax.lax.reduce_window(
                jnp.pad(S, pads, mode="edge"),
                -jnp.inf,
                jax.lax.max,
                tuple(window_dims),
                (1,) * S.ndim,
                "valid",
            )
    else:
        ref_arr = ref

    if zi is None:
        # scipy.signal.lfilter_zi([b], [1, b-1]) == 1 - b (steady state)
        zi_val = jnp.asarray(1.0 - b, dtype=ref_arr.dtype)
    else:
        zi_val = jnp.moveaxis(zi.astype(ref_arr.dtype), axis, -1)[..., 0]

    S_smooth = _exp_filter_scan(ref_arr, float(b), zi_val, axis)

    # Adaptive gain control, stabilized in log space
    smooth = jnp.exp(-gain * (np.log(eps) + jnp.log1p(S_smooth / eps)))

    if power == 0:
        S_out = jnp.log1p(S * smooth)
    elif bias == 0:
        S_out = jnp.exp(power * (jnp.log(S) + jnp.log(smooth)))
    else:
        S_out = (bias**power) * jnp.expm1(power * jnp.log1p(S * smooth / bias))

    if return_zf:
        # scipy zf convention for this filter: zf = (1-b) * y[-1]
        y_last = jnp.moveaxis(S_smooth, axis, -1)[..., -1:]
        zf = jnp.moveaxis((1.0 - b) * y_last, -1, axis)
        return S_out, zf
    return S_out


# ---------------------------------------------------------------------------
# Griffin-Lim (reference core/spectrum.py:2669) — jitted momentum iteration
# ---------------------------------------------------------------------------


def griffinlim(
    S: Any,
    *,
    n_iter: int = 32,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    n_fft: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    dtype: Any = None,
    length: Optional[int] = None,
    pad_mode: str = "constant",
    momentum: float = 0.99,
    init: Optional[str] = "random",
    rng: Optional[Any] = None,
    random_state: Optional[Any] = None,
) -> jax.Array:
    """Griffin-Lim phase recovery with momentum (fast Griffin-Lim).

    Iteratively estimates a signal whose STFT magnitude matches ``S``
    [Griffin & Lim 1984; Perraudin et al. 2013].  Behavior parity with the
    reference ``core/spectrum.py:2669``; the whole iteration runs as one
    scanned, jit-compiled device program.

    Parameters
    ----------
    S : np.ndarray or jax.Array [shape=(..., n_fft//2 + 1, t)]
        magnitude spectrogram (non-negative)
    n_iter : int > 0
        number of projection iterations
    hop_length, win_length, n_fft, window, center, pad_mode
        STFT/ISTFT parameters, as in ``stft``
    dtype : real dtype or None
        output dtype
    length : int or None
        exact output length
    momentum : float >= 0
        acceleration parameter (0 recovers classic Griffin-Lim)
    init : 'random' or None
        phase initialization: random phases, or zero phase for None
    rng : int seed, numpy Generator/RandomState, or None
        randomness source for ``init='random'``; ``random_state`` is the
        deprecated alias

    Returns
    -------
    y : jax.Array [shape=(..., n)]
        signal whose STFT magnitude approximates ``S``

    See Also
    --------
    istft, feature.inverse.mel_to_audio

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=0.5))
    >>> S = np.abs(np.asarray(lt.stft(y)))
    >>> y_rec = lt.griffinlim(S, n_iter=16, rng=0, length=len(y))
    >>> y_rec.shape == y.shape
    True
    """
    if random_state is not None:
        if rng is not None:
            raise ParameterError(
                f"Both random_state={random_state!r} and rng={rng!r} were "
                "provided. Please use only the rng parameter."
            )
        warnings.warn(
            "random_state is deprecated; use rng instead",
            FutureWarning, stacklevel=2,
        )
        rng = random_state

    if momentum > 1:
        warnings.warn(
            f"Griffin-Lim with momentum={momentum} > 1 can be unstable. "
            "Proceed with caution!",
            stacklevel=2,
        )
    elif momentum < 0:
        raise ParameterError(f"griffinlim() called with momentum={momentum} < 0")

    S = jnp.asarray(S)
    if n_fft is None:
        n_fft = 2 * (S.shape[-2] - 1)
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = int(win_length // 4)

    if rng is None:
        seed = 0
    elif isinstance(rng, (int, np.integer)):
        seed = int(rng)
    elif isinstance(rng, np.random.RandomState):
        seed = int(rng.randint(2**31))
    else:
        seed = int(np.random.default_rng(rng).integers(2**31))

    if init not in ("random", None):
        raise ParameterError(f"init={init} must either None or 'random'")

    if isinstance(window, (str, tuple)):
        # entire program — phase init INCLUDED — as ONE dispatch (scan over
        # n_iter): removes 4·n_iter per-op dispatches plus the ~5 eager
        # PRNG/phasor init ops, and keeps the complex spectra inside a
        # single XLA program (axon layout constraint).  The seed rides in
        # as a traced scalar so reseeding does not recompile.
        return _griffinlim_scan(
            S, np.uint32(seed), n_iter=n_iter, hop_length=hop_length,
            win_length=win_length, n_fft=n_fft, window=window,
            center=center, pad_mode=pad_mode, momentum=float(momentum),
            length=length, init=init,
        )

    angles = _griffinlim_init(S, np.uint32(seed), init)

    ang_dtype = util.dtype_r2c(S.dtype)
    eps = util.tiny(np.zeros((), dtype=np.dtype(ang_dtype)))
    rdt_r = np.zeros((), dtype=np.dtype(ang_dtype)).real.dtype
    rebuilt = jax.lax.complex(
        jnp.zeros(S.shape, dtype=rdt_r), jnp.zeros(S.shape, dtype=rdt_r)
    )

    for _ in range(n_iter):
        tprev = rebuilt
        inverse = istft(
            S * angles,
            hop_length=hop_length,
            win_length=win_length,
            n_fft=n_fft,
            window=window,
            center=center,
            dtype=dtype,
            length=length,
        )
        rebuilt = stft(
            inverse,
            n_fft=n_fft,
            hop_length=hop_length,
            win_length=win_length,
            window=window,
            center=center,
            pad_mode=pad_mode,
        )
        angles = rebuilt - (momentum / (1 + momentum)) * tprev
        angles = angles / (jnp.abs(angles) + eps)

    return istft(
        S * angles,
        hop_length=hop_length,
        win_length=win_length,
        n_fft=n_fft,
        window=window,
        center=center,
        dtype=dtype,
        length=length,
    )


@functools.partial(
    jax.jit,
    static_argnames=("init",),
)
def _griffinlim_init(S, seed, init):
    """Initial phases (jit-safe; also called inside the scanned program)."""
    ang_dtype = util.dtype_r2c(S.dtype)
    rdt = np.zeros((), dtype=np.dtype(ang_dtype)).real.dtype
    if init == "random":
        key = jax.random.PRNGKey(seed)
        return util.phasor(
            2 * np.pi * jax.random.uniform(key, S.shape, dtype=jnp.float32)
        ).astype(ang_dtype)
    # zero phase: build complex constants via lax.complex of real
    # zeros/ones (the axon backend cannot upload complex host constants;
    # see _axon_compat)
    return jax.lax.complex(
        jnp.ones(S.shape, dtype=rdt), jnp.zeros(S.shape, dtype=rdt)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iter", "hop_length", "win_length", "n_fft", "window", "center",
        "pad_mode", "momentum", "length", "init",
    ),
)
def _griffinlim_scan(
    S, seed, *, n_iter, hop_length, win_length, n_fft, window, center,
    pad_mode, momentum, length, init,
):
    """Momentum Griffin-Lim as a single scanned program."""
    angles = _griffinlim_init(S, seed, init)
    eps = util.tiny(np.zeros((), dtype=np.dtype(np.float32)))
    rdt = jnp.zeros((), dtype=angles.dtype).real.dtype
    rebuilt0 = jax.lax.complex(
        jnp.zeros(S.shape, dtype=rdt), jnp.zeros(S.shape, dtype=rdt)
    )

    def body(carry, _):
        angles, tprev = carry
        inverse = istft(
            S * angles, hop_length=hop_length, win_length=win_length,
            n_fft=n_fft, window=window, center=center, length=length,
        )
        rebuilt = stft(
            inverse, n_fft=n_fft, hop_length=hop_length,
            win_length=win_length, window=window, center=center,
            pad_mode=pad_mode,
        )
        new_angles = rebuilt - (momentum / (1 + momentum)) * tprev
        new_angles = new_angles / (jnp.abs(new_angles) + eps)
        return (new_angles, rebuilt), None

    (angles, _), _ = jax.lax.scan(
        body, (angles, rebuilt0), None, length=n_iter
    )
    return istft(
        S * angles, hop_length=hop_length, win_length=win_length,
        n_fft=n_fft, window=window, center=center, length=length,
    )


# ---------------------------------------------------------------------------
# The y-or-S polymorphic helper (reference core/spectrum.py:2920)
# ---------------------------------------------------------------------------


def _spectrogram(
    *,
    y: Any = None,
    S: Any = None,
    n_fft: Optional[int] = 2048,
    hop_length: Optional[int] = 512,
    power: float = 1,
    win_length: Optional[int] = None,
    window: _WindowSpec = "hann",
    center: bool = True,
    pad_mode: str = "constant",
) -> Tuple[jax.Array, int]:
    """Retrieve a magnitude spectrogram: pass-through S or compute from y."""
    if S is not None:
        S = jnp.asarray(S)
        if n_fft is None or n_fft // 2 + 1 != S.shape[-2]:
            n_fft = 2 * (S.shape[-2] - 1)
    else:
        if n_fft is None:
            raise ParameterError(f"Unable to compute spectrogram with n_fft={n_fft}")
        if y is None:
            raise ParameterError(
                "Input signal must be provided to compute a spectrogram"
            )
        if win_length is None:
            win_length = n_fft
        if hop_length is None:
            hop_length = int(win_length // 4)
        y = jnp.asarray(y)
        if not jnp.issubdtype(y.dtype, jnp.floating):
            raise ParameterError("Audio data must be floating-point")
        real_dtype = y.dtype if y.dtype in (jnp.float32, jnp.float64) else jnp.float32
        window_dev = _win_device(window, win_length, n_fft, real_dtype)

        # On TPU, the fused Pallas kernel with an identity basis computes
        # the full |STFT|^power ~1.5× faster than the XLA pipeline (no
        # frame matrix in HBM).
        from ..ops import pallas_stft as _pstft
        from ..ops.fft import _resolved_backend

        if (
            _resolved_backend() == "matmul"
            and real_dtype == jnp.float32
            and pad_mode in ("constant", "reflect")
            and _pstft.pallas_supported(n_fft, hop_length)
        ):
            try:
                S = _pstft.stft_mel_pallas(
                    y, window_dev, _eye_basis(n_fft), n_fft=n_fft,
                    hop_length=hop_length, power=float(power),
                    center=center, pad_mode=pad_mode,
                )
                return S, n_fft
            except Exception:
                pass

        S = _stft_power_core(
            y,
            window_dev,
            _mats_arg(n_fft, window_dev.dtype),
            n_fft=n_fft,
            hop_length=hop_length,
            center=center,
            pad_mode=pad_mode,
            power=float(power),
        )
    return S, n_fft


@functools.lru_cache(maxsize=8)
def _eye_basis(n_fft: int) -> np.ndarray:
    return np.eye(n_fft // 2 + 1, dtype=np.float32)
