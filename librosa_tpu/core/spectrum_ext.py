"""Extended spectral transforms: reassignment, Mellin transform, IIRT (L2).

Parity citations refer to ``librosa/core/spectrum.py``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import filters
from ..ops import iir
from ..ops import spline as ops_spline
from ..util import utils as util
from ..util.exceptions import ParameterError
from . import convert
from .audio import resample
from .spectrum import stft

__all__ = ["reassigned_spectrogram", "fmt", "iirt"]


def _win_center_np(window, win_length, n_fft):
    """Host-side centered window (jnp pad_center would cost device ops)."""
    win = np.asarray(filters.get_window(window, win_length, fftbins=True))
    lpad = (n_fft - len(win)) // 2
    return np.pad(win, (lpad, n_fft - len(win) - lpad))


def _cyclic_gradient_np(win):
    """Host twin of util.cyclic_gradient (edge_order=1) for 1-D windows."""
    go = min(len(win) - 1, 1)
    padded = np.pad(win, (go, go), mode="wrap")
    return np.gradient(padded, axis=-1)[go:-go]


def _reassign_frequencies(
    y, sr, S, n_fft, hop_length, win_length, window, center, dtype, pad_mode
):
    """Instantaneous frequencies via S_dh/S_h. Parity: spectrum.py:646."""
    if win_length is None:
        win_length = n_fft

    win = _win_center_np(window, win_length, n_fft)

    if S is None:
        S_h = stft(
            y, n_fft=n_fft, hop_length=hop_length, window=win, center=center,
            dtype=dtype, pad_mode=pad_mode,
        )
    else:
        S_h = jnp.asarray(S)

    window_derivative = _cyclic_gradient_np(win)
    S_dh = stft(
        y, n_fft=n_fft, hop_length=hop_length, window=window_derivative,
        center=center, dtype=dtype, pad_mode=pad_mode,
    )

    return S_dh, S_h


def _reassign_times(
    y, sr, S, n_fft, hop_length, win_length, window, center, dtype, pad_mode
):
    """Reassigned times via S_th/S_h. Parity: spectrum.py:809."""
    if win_length is None:
        win_length = n_fft

    win = _win_center_np(window, win_length, n_fft)

    if hop_length is None:
        hop_length = int(win_length // 4)

    if S is None:
        S_h = stft(
            y, n_fft=n_fft, hop_length=hop_length, window=win, center=center,
            dtype=dtype, pad_mode=pad_mode,
        )
    else:
        S_h = jnp.asarray(S)

    half_width = n_fft // 2
    if n_fft % 2:
        window_times = np.arange(-half_width, half_width + 1)
    else:
        window_times = np.arange(0.5 - half_width, half_width)
    window_time_weighted = win * window_times

    S_th = stft(
        y, n_fft=n_fft, hop_length=hop_length, window=window_time_weighted,
        center=center, dtype=dtype, pad_mode=pad_mode,
    )

    return S_th, S_h


def reassigned_spectrogram(
    y: Any,
    *,
    sr: float = 22050,
    S: Optional[Any] = None,
    n_fft: int = 2048,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Any = "hann",
    center: bool = True,
    reassign_frequencies: bool = True,
    reassign_times: bool = True,
    ref_power: Union[float, Callable] = 1e-6,
    fill_nan: bool = False,
    clip: bool = True,
    dtype: Any = None,
    pad_mode: str = "constant",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Time-frequency reassigned spectrogram.

    Sharpens the STFT by relocating each bin's energy to its instantaneous
    frequency and group delay, computed from auxiliary window transforms
    (behavior parity with the reference ``core/spectrum.py:990``).

    Parameters
    ----------
    y : input signal
    sr, S, n_fft, hop_length, win_length, window, center, pad_mode, dtype
        STFT controls
    reassign_frequencies, reassign_times : bool
        which coordinates to reassign
    ref_power : float >= 0 or callable
        bins below this power get NaN coordinates
    fill_nan : bool
        replace NaNs with the un-reassigned coordinates
    clip : bool
        clamp reassigned coordinates into the spectrogram range

    Returns
    -------
    freqs, times, mags : jax.Array
        reassigned frequencies (Hz), times (s), and magnitudes
    """
    if not callable(ref_power) and ref_power < 0:
        raise ParameterError(
            f"the masking reference must be a non-negative power or a "
            f"callable; got {ref_power}"
        )
    if not (reassign_frequencies or reassign_times):
        raise ParameterError(
            "nothing to reassign: enable the frequency axis, the time "
            "axis, or both"
        )

    y = jnp.asarray(y)
    # default framing: full-length window, 75% overlap
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = int(win_length // 4)

    # The 2-3 auxiliary STFTs stay separate jitted launches (fusing them
    # would embed the DFT matrices as program constants — slow over the
    # compile tunnel); everything after fuses into ONE correction/masking
    # program (eagerly ~25 dispatches).
    S_dh = S_th = None
    if reassign_frequencies:
        S_dh, S = _reassign_frequencies(
            y, sr, S, n_fft, hop_length, win_length, window, center, dtype,
            pad_mode,
        )
    if reassign_times:
        S_th, S = _reassign_times(
            y, sr, S, n_fft, hop_length, win_length, window, center, dtype,
            pad_mode,
        )

    S = jnp.asarray(S)

    # nominal grid the corrections displace from
    bin_freqs = convert.fft_frequencies(sr=sr, n_fft=n_fft)
    frame_times = convert.frames_to_time(
        frames=np.arange(S.shape[-1]), sr=sr, hop_length=hop_length,
        n_fft=None if center else n_fft,
    )

    ref_p = (
        float(ref_power(np.abs(np.asarray(S)) ** 2))
        if callable(ref_power) else ref_power
    )

    return _reassign_finish(
        S, S_dh, S_th, jnp.asarray(bin_freqs), jnp.asarray(frame_times),
        sr=float(sr), ref_p=float(ref_p), fill_nan=bool(fill_nan),
        clip=bool(clip), t_max=float(y.shape[-1] / float(sr)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("sr", "ref_p", "fill_nan", "clip", "t_max"),
)
def _reassign_finish(S, S_dh, S_th, bin_freqs, frame_times, *, sr, ref_p,
                     fill_nan, clip, t_max):
    mags = jnp.abs(S)
    mags_low = (mags < ref_p**0.5) & ~jnp.isnan(mags)

    if S_dh is not None:
        correction = -jnp.imag(S_dh / S)
        freqs = util.expand_to(
            bin_freqs, ndim=correction.ndim, axes=-2
        ) + correction * (0.5 * sr / np.pi)
        if ref_p > 0:
            freqs = jnp.where(mags_low, jnp.nan, freqs)
        if fill_nan:
            freqs = jnp.where(
                jnp.isnan(freqs),
                util.expand_to(bin_freqs, ndim=freqs.ndim, axes=-2),
                freqs,
            )
        if clip:
            freqs = jnp.clip(freqs, 0, sr / 2.0)
    else:
        freqs = jnp.broadcast_to(
            util.expand_to(bin_freqs, ndim=S.ndim, axes=-2), S.shape
        )

    if S_th is not None:
        correction = jnp.real(S_th / S)
        times = util.expand_to(
            frame_times, ndim=correction.ndim, axes=-1
        ) + correction / sr
        if ref_p > 0:
            times = jnp.where(mags_low, jnp.nan, times)
        if fill_nan:
            times = jnp.where(
                jnp.isnan(times),
                util.expand_to(frame_times, ndim=times.ndim, axes=-1),
                times,
            )
        if clip:
            times = jnp.clip(times, 0, t_max)
    else:
        times = jnp.broadcast_to(
            util.expand_to(frame_times, ndim=S.ndim, axes=-1), S.shape
        )

    return freqs, times, mags


def fmt(
    y: Any,
    *,
    t_min: float = 0.5,
    n_fmt: Optional[int] = None,
    kind: str = "cubic",
    beta: float = 0.5,
    over_sample: float = 1,
    axis: int = -1,
) -> jax.Array:
    """Fast Mellin transform (scale-invariant magnitude transform).

    Parity: core/spectrum.py:2156 — exponential time resampling, windowing,
    then an FFT; the magnitude is invariant to time-scale changes of the
    input [De Sena & Rocchesso 2007].

    Parameters
    ----------
    y : input signal
    t_min : float > 0
        lower time bound of the exponential grid
    n_fmt : int or None
        transform length
    kind : str
        interpolation kind for the exponential resample
    beta : float
        Mellin parameter (0.5 = scale transform)
    over_sample : float
        oversampling factor
    axis : int
        analysis axis

    Returns
    -------
    x_fmt : jax.Array [complex]
        the Mellin spectrum
    """
    y = jnp.asarray(y)
    n = y.shape[axis]
    if n < 3:
        raise ParameterError(
            f"the Mellin transform needs at least 3 samples along "
            f"axis {axis}; got {n}"
        )
    if t_min <= 0:
        raise ParameterError(
            f"the exponential grid starts at t_min={t_min}, which must "
            "be positive"
        )

    # --- exponential sampling grid (static: data-independent) ----------
    # Grid density: by default the finest step of the exponential grid
    # matches the input spacing at the right edge (log(n-1) - log(n-2)),
    # times the oversampling factor.
    if n_fmt is None:
        if over_sample < 1:
            raise ParameterError(
                f"over_sample={over_sample} would UNDERsample; use >= 1"
            )
        log_step = np.log(n - 1) - np.log(n - 2)
        n_fmt = int(np.ceil(
            over_sample * (np.log(n - 1) - np.log(t_min)) / log_step
        ))
    elif n_fmt < 3:
        raise ParameterError(
            f"a {n_fmt}-point Mellin spectrum is degenerate; use n_fmt >= 3"
        )
    else:
        log_step = (np.log(n_fmt - 1) - np.log(n_fmt - 2)) / over_sample

    # data-dependent validation: skip under jit (tracers), sync otherwise
    if not isinstance(y, jax.core.Tracer) and not bool(
        jnp.all(jnp.isfinite(y))
    ):
        raise ParameterError("y must be finite everywhere")

    pad = int(np.ceil(over_sample))
    grid_base = np.exp(log_step)
    targets = np.logspace(
        (np.log(t_min) - np.log(n)) / log_step, 0,
        num=n_fmt + pad, endpoint=False, base=grid_base,
    )[:-pad]
    # numerical guard: the grid must stay inside the sampled support
    if targets[0] < t_min or targets[-1] > (n - 1.0) / n:
        targets = np.clip(targets, float(t_min) / n, (n - 1.0) / n)
    if np.unique(targets).size != targets.size:
        raise ParameterError(
            "the exponential grid collapsed onto duplicate positions; "
            "reduce over_sample or raise t_min"
        )

    # --- device resample -> Mellin weighting -> rFFT -------------------
    # The input lives on x = linspace(0, 1, n, endpoint=False); the
    # resample weights and the spline solve's elimination constants are
    # static, so the whole transform is ONE fused device program
    # (ops/spline.py).  Exotic interpolation kinds fall back to host
    # scipy (same operator the reference uses for every kind).
    moved = jnp.moveaxis(y, axis, -1)
    if kind == "cubic" and n >= 4:
        resampled = ops_spline.uniform_cubic_resample(
            moved, targets, x0=0.0, dx=1.0 / n
        )
    elif kind == "linear":
        resampled = ops_spline.uniform_linear_resample(
            moved, targets, x0=0.0, dx=1.0 / n
        )
    else:
        import scipy.interpolate

        host_fit = scipy.interpolate.interp1d(
            np.linspace(0, 1, num=n, endpoint=False), np.asarray(moved),
            kind=kind, axis=-1,
        )
        resampled = jnp.asarray(host_fit(targets))

    mellin_weight = targets.astype(np.float64) ** beta * np.sqrt(n) / n_fmt
    weighted = resampled * jnp.asarray(mellin_weight, dtype=resampled.dtype)
    return jnp.moveaxis(jnp.fft.rfft(weighted, axis=-1), -1, axis)


def iirt(
    y: Any,
    *,
    sr: float = 22050,
    win_length: int = 2048,
    hop_length: Optional[int] = None,
    center: bool = True,
    tuning: float = 0.0,
    pad_mode: str = "constant",
    flayout: str = "sos",
    res_type: str = "soxr_hq",
    **kwargs: Any,
) -> jax.Array:
    """Multirate IIR semitone filterbank spectrogram.

    Parity: core/spectrum.py:1522 — an elliptic semitone filterbank applied
    with forward-backward (``filtfilt``) filtering at three sample rates,
    per-band energies framed with fractional hop accumulation [Mueller 2015].

    Parameters
    ----------
    y : input signal
    sr, win_length, hop_length, center, pad_mode
        analysis controls
    tuning : float
        filterbank tuning offset
    res_type : str
        resampling mode for the multirate ladder
    flayout : 'sos' or 'ba'
        filter layout

    Returns
    -------
    bands_power : jax.Array [shape=(..., 85, t)]
        short-time mean-square power per semitone band

    Notes
    -----
    The reference filters each of the 85 bands through a separate host
    ``scipy.signal.filtfilt``/``sosfiltfilt`` call.  Here each sample-rate
    group (36 + 34 + 15 bands) runs as ONE fused device program —
    zero-phase bank filtering via residual-refined prefix-doubling scans
    (:func:`librosa_tpu.ops.iir.sos_bank_filtfilt`) chained straight into
    the fractional-hop frame-energy gather, so no per-band host traffic
    remains.  ``flayout='ba'`` is realized with the same biquad cascades
    (the order-8 transfer function factored into sections is the
    numerically superior representation; zero-phase output agrees with
    the reference's ``filtfilt(b, a)`` to float64 design precision).
    """
    if flayout not in ("ba", "sos"):
        raise ParameterError(f"Unsupported flayout={flayout}")

    y = np.asarray(y)
    if not np.issubdtype(y.dtype, np.floating):
        raise ParameterError("Audio data must be floating-point")

    if hop_length is None:
        hop_length = win_length // 4

    if center:
        padding = [(0, 0) for _ in y.shape]
        padding[-1] = (win_length // 2, win_length // 2)
        y = np.pad(y, padding, mode=pad_mode)

    # Filtering always runs on the SOS factorization (see Notes); the
    # flayout argument is validated above for API parity.
    filterbank_ct, sample_rates = filters.semitone_filterbank(
        tuning=tuning, flayout="sos", **kwargs
    )

    n_frames = int(1 + (y.shape[-1] - win_length) // hop_length)
    batch = y.shape[:-1]

    outs = []
    band_order: list = []
    for cur_sr in np.unique(sample_rates):
        sel = np.flatnonzero(sample_rates == cur_sr)
        band_order.extend(sel.tolist())
        group_sos = np.stack([np.asarray(filterbank_ct[i]) for i in sel])

        y_rs = resample(y, orig_sr=sr, target_sr=cur_sr, res_type=res_type)
        n_rs = y_rs.shape[-1]

        factor = sr / cur_sr
        hop_stmsp = hop_length / factor
        win_stmsp = round(win_length / factor)

        start = np.arange(0, n_rs - win_stmsp, hop_stmsp)
        pad_to = n_rs
        if len(start) < n_frames:
            pad_to = int(np.ceil(n_frames * hop_stmsp)) + win_stmsp
            start = np.arange(0, pad_to - win_stmsp, hop_stmsp)
        start_idx = np.round(start).astype(np.int32)[:n_frames]
        idx = start_idx[:, None] + np.arange(win_stmsp, dtype=np.int32)

        padlen = iir._bank_padlen(group_sos)
        if n_rs <= padlen:
            raise ParameterError(
                f"Input too short for the {cur_sr} Hz filter group: "
                f"{n_rs} resampled samples <= pad length {padlen}"
            )
        M, v, b0, Mpows, M_lo, v_lo = iir._bank_params(
            group_sos, n_rs + 2 * padlen
        )
        zi_unit = np.stack(
            [iir.sosfilt_zi(s) for s in group_sos]
        ).astype(np.float32)

        out = _iirt_group_core(
            jnp.reshape(y_rs, (-1, n_rs)),
            M, v, b0, Mpows, zi_unit, M_lo, v_lo, idx,
            padlen=padlen, pad_to=pad_to, factor=float(factor),
        )
        outs.append(out)

    inv = np.argsort(np.asarray(band_order))
    bands_power = jnp.concatenate(outs, axis=1)[:, inv]
    return bands_power.reshape(batch + bands_power.shape[1:])


@functools.partial(
    jax.jit, static_argnames=("padlen", "pad_to", "factor")
)
def _iirt_group_core(
    y2, M, v, b0, Mpows, zi_unit, M_lo, v_lo, idx, *, padlen, pad_to, factor
):
    """One iirt sample-rate group: bank filtfilt → frame-energy, fused.

    ``y2``: (L, n_rs) resampled signals; returns (L, n_bands, n_frames)
    short-time mean-square powers scaled by the rate ``factor``.
    """
    filtered = iir._bank_filtfilt_core(
        y2, M, v, b0, Mpows, zi_unit, M_lo, v_lo, padlen=padlen
    )
    n = filtered.shape[-1]
    if pad_to > n:
        filtered = jnp.pad(filtered, ((0, 0), (0, 0), (0, pad_to - n)))
    frames = filtered[:, :, idx]                        # (L, B, F, W)
    return factor * jnp.sum(frames * frames, axis=-1)
