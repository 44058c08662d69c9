"""Constant-Q / Variable-Q transforms via recursive downsampling (L2).

TPU-first design notes:

- The octave ladder (hops/rates) is a **static plan** — fully determined by
  the configuration — so every per-octave stage jit-compiles with fixed
  shapes (SURVEY §7 hard-part #2).
- Frequency-domain wavelet bases are **dense** matmuls on the MXU.  The
  reference sparsifies bases into CSR (``constantq.py:1164``); here the same
  quantile threshold zeroes entries but the matmul stays dense — block-sparse
  gains nothing at these sizes on TPU and dense preserves numerics exactly.
- The per-octave response is the framed-ones STFT × basis product, one fused
  device program per octave.

Parity citations refer to ``librosa/core/constantq.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Collection, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import filters
from ..util import utils as util
from ..util.exceptions import ParameterError
from . import audio
from .convert import cqt_frequencies, note_to_hz
from .intervals import interval_frequencies
from .pitch import estimate_tuning
from .spectrum import _griffinlim_init, istft

__all__ = ["cqt", "vqt", "hybrid_cqt", "pseudo_cqt", "icqt", "griffinlim_cqt"]


def _et_relative_bw(bins_per_octave: int) -> np.ndarray:
    """Relative bandwidth for equal spacing. Parity: constantq.py:1577."""
    r = 2 ** (1 / bins_per_octave)
    return np.atleast_1d((r**2 - 1) / (r**2 + 1))


def _clip_freqs(
    freqs: np.ndarray,
    window: Any,
    filter_scale: float,
    gamma: Optional[float],
    sr: float,
) -> np.ndarray:
    """Clip a frequency set below Nyquist. Parity: constantq.py:1599."""
    # octave spacing of neighboring bins (the first bin reuses the
    # second's spacing: it has no left neighbor)
    octs = np.log2(freqs)
    step = np.empty_like(octs)
    step[1:] = np.diff(octs)
    step[0] = octs[1] - octs[0]

    # relative bandwidth for that spacing, plus the ERB-style softness
    spread = np.exp2(2 * step)
    alpha = (spread - 1) / (spread + 1)
    softness = alpha * (24.7 / 0.108) if gamma is None else gamma

    # running max of each filter's upper band edge; keep the prefix of
    # bins whose edges stay below Nyquist
    q_factor = float(filter_scale) / alpha
    upper_edge = (
        freqs * (1 + 0.5 * filters.window_bandwidth(window) / q_factor)
        + 0.5 * softness
    )
    keep = int(np.searchsorted(
        np.maximum.accumulate(upper_edge), sr / 2.0, side="left"
    ))
    if keep == 0:
        raise ParameterError(
            f"no wavelet fits under Nyquist: even the lowest bin "
            f"({freqs[0]:.2f} Hz) has support beyond sr/2 = {sr / 2:.2f} Hz"
        )
    return freqs[:keep]


def _num_two_factors(x: int) -> int:
    """Number of times x divides evenly by 2. Parity: constantq.py:1270."""
    if x <= 0:
        return 0
    num_twos = 0
    while x % 2 == 0:
        num_twos += 1
        x //= 2
    return num_twos


@functools.lru_cache(maxsize=64)
def _vqt_filter_fft_cached(
    sr: float,
    freqs_key: tuple,
    filter_scale: float,
    norm: Optional[float],
    sparsity: float,
    hop_length: Optional[int],
    window: Any,
    gamma: float,
    alpha_key: Optional[tuple],
) -> tuple:
    """Frequency-domain VQT basis (host float64 → dense complex64 array).

    Parity: constantq.py:1124 (__vqt_filter_fft) — wavelet → FFT →
    quantile sparsification, kept dense for MXU matmuls.
    """
    freqs = np.array(freqs_key)
    alpha = np.array(alpha_key) if alpha_key is not None else None
    basis, lengths = filters.wavelet(
        freqs=freqs, sr=sr, filter_scale=filter_scale, norm=norm, pad_fft=True,
        window=window, gamma=gamma, alpha=alpha,
    )
    n_fft = basis.shape[1]
    if hop_length is not None and n_fft < 2.0 ** (1 + np.ceil(np.log2(hop_length))):
        n_fft = int(2.0 ** (1 + np.ceil(np.log2(hop_length))))

    basis = basis * (lengths[:, np.newaxis] / float(n_fft))
    fft_basis = np.fft.fft(basis, n=n_fft, axis=1)[:, : (n_fft // 2) + 1]

    if sparsity > 0:
        fft_basis = util.sparsify_rows(
            fft_basis, quantile=sparsity
        ).toarray()

    return fft_basis.astype(np.complex64), n_fft, lengths


def _vqt_filter_fft(
    sr, freqs, filter_scale, norm, sparsity, hop_length=None, window="hann",
    gamma=0.0, dtype=np.complex64, alpha=None,
):
    fb, n_fft, lengths = _vqt_filter_fft_cached(
        float(sr),
        tuple(np.asarray(freqs).tolist()),
        float(filter_scale),
        norm,
        float(sparsity),
        hop_length,
        window if isinstance(window, (str, tuple, float, int)) else str(window),
        float(gamma) if gamma is not None else None,
        tuple(np.asarray(alpha).tolist()) if alpha is not None else None,
    )
    return fb.astype(dtype), n_fft, lengths


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "mode", "phase")
)
def _cqt_response_core(
    y, fft_basis, window_dev, dft_mats, *, n_fft, hop_length, mode, phase
) -> jax.Array:
    """stft × basis as ONE program.

    Fusing matters beyond speed: across eager program boundaries the axon
    backend rejects complex operands whose producing program chose a
    transposed layout; inside one program XLA picks compatible layouts.
    """
    from .spectrum import _stft_core

    D = _stft_core(
        y, window_dev, dft_mats, n_fft=n_fft, hop_length=hop_length,
        center=True, pad_mode=mode,
    )
    if not phase:
        D = jnp.abs(D)
    return jnp.einsum(
        "cf,...ft->...ct", fft_basis.astype(D.dtype), D,
        precision=jax.lax.Precision.HIGHEST,
    )


def _cqt_response(
    y, n_fft, hop_length, fft_basis, mode, window="ones", phase=True,
    dtype=None, post_div=None, post_mul=None,
) -> jax.Array:
    """Framed-ones STFT × basis matmul. Parity: constantq.py:1197.

    ``post_div``/``post_mul`` apply a final scaling inside the fused
    program (an eager scale after the core costs an extra dispatch).
    """
    from .spectrum import _mats_arg, _win_device

    window_dev = _win_device(window, n_fft, n_fft, jnp.float32)
    if isinstance(fft_basis, np.ndarray):
        # cast on host (f64/c128 → f32/c64): a dtype-converting device_put
        # dispatches its own convert program
        tgt = np.complex64 if np.iscomplexobj(fft_basis) else np.float32
        fft_basis = fft_basis.astype(tgt, copy=False)
    out = _cqt_response_scaled(
        jnp.asarray(y), jnp.asarray(fft_basis), window_dev,
        _mats_arg(n_fft, window_dev.dtype), post_div, post_mul,
        n_fft=n_fft, hop_length=hop_length, mode=mode, phase=phase,
    )
    if dtype is not None:
        out = out.astype(dtype)
    return out


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "mode", "phase")
)
def _cqt_response_scaled(
    y, fft_basis, window_dev, dft_mats, post_div, post_mul, *,
    n_fft, hop_length, mode, phase,
):
    out = _cqt_response_core(
        y, fft_basis, window_dev, dft_mats,
        n_fft=n_fft, hop_length=hop_length, mode=mode, phase=phase,
    )
    if post_div is not None:
        out = out / post_div
    if post_mul is not None:
        out = out * post_mul
    return out


def _trim_stack(
    cqt_resp: List[jax.Array], n_bins: int, dtype: Any
) -> jax.Array:
    """Trim and stack per-octave responses. Parity: constantq.py:1169."""
    max_col = min(c_i.shape[-1] for c_i in cqt_resp)
    pieces: List[jax.Array] = []
    end = n_bins
    for c_i in cqt_resp:
        n_oct = c_i.shape[-2]
        if end < n_oct:
            pieces.append(c_i[..., -end:, :max_col])
        else:
            pieces.append(c_i[..., :max_col])
        end -= n_oct
    # pieces are ordered top octave first → concatenate bottom-up
    out = jnp.concatenate(pieces[::-1], axis=-2)
    return out.astype(dtype)


def _early_downsample_count(nyquist, filter_cutoff, hop_length, n_octaves) -> int:
    """Octaves of early decimation the ladder plan can absorb.

    Two independent budgets cap the decimation (matching the reference
    planner at constantq.py:1223): the spectral headroom between the top
    filter's cutoff and Nyquist (keeping one guard octave), and the
    power-of-two content of the hop — each decimation consumes one factor
    of two, and the recursive ladder itself still needs ``n_octaves - 1``
    halvings.
    """
    spectral = int(np.ceil(np.log2(nyquist / filter_cutoff))) - 2
    hop_budget = _num_two_factors(hop_length) - (n_octaves - 1)
    return max(0, min(spectral, hop_budget))


def _early_downsample(
    y, sr, hop_length, res_type, n_octaves, nyquist, filter_cutoff, scale
):
    """Pre-decimate the input by the plan's headroom before the ladder.

    Reference behavior: constantq.py:1235 (__early_downsample) — one
    up-front ``2^k : 1`` resample replaces the first ``k`` rungs of the
    recursive ladder when the analysis band leaves room for it.
    """
    octs_down = _early_downsample_count(
        nyquist, filter_cutoff, hop_length, n_octaves
    )
    if octs_down == 0:
        return y, sr, hop_length

    decim = 1 << octs_down
    if y.shape[-1] < decim:
        raise ParameterError(
            f"A {n_octaves:d}-octave analysis wants a {decim:d}:1 early "
            f"decimation, but the signal has only {y.shape[-1]:d} samples"
        )
    y = audio.resample(
        y, orig_sr=decim, target_sr=1, res_type=res_type, scale=True
    )
    if not scale:
        y = y * np.sqrt(decim)
    return y, sr / decim, hop_length // decim


def vqt(
    y: Any,
    *,
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    n_bins: Optional[int] = 84,
    intervals: Union[str, Collection[float]] = "equal",
    gamma: Optional[float] = None,
    bins_per_octave: int = 12,
    tuning: Optional[float] = 0.0,
    filter_scale: float = 1,
    norm: Optional[float] = 1,
    sparsity: float = 0.01,
    window: Any = "hann",
    scale: bool = True,
    pad_mode: str = "constant",
    res_type: str = "soxr_hq",
    dtype: Any = None,
) -> jax.Array:
    """Variable-Q transform via recursive sub-sampling.

    Generalizes the CQT with a bandwidth offset ``gamma`` and arbitrary
    interval systems (equal temperament, Pythagorean, p-limit just
    intonation).  Behavior parity with the reference ``constantq.py:820``;
    the per-octave hop/rate plan is static, so the whole ladder runs as one
    jit-compiled program.

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)]
        input signal(s)
    sr, hop_length, fmin, n_bins, bins_per_octave, tuning
        grid controls, as in ``cqt``.  ``n_bins=None`` extends to Nyquist
    intervals : str or array of float
        'equal', 'pythagorean', 'ji3', 'ji5', 'ji7', or explicit ratios
    gamma : float >= 0 or None
        bandwidth offset in Hz; ``None`` selects ERB-proportional bandwidth
    filter_scale, norm, sparsity, window, scale, pad_mode, res_type, dtype
        basis construction and resampling controls

    Returns
    -------
    V : jax.Array [shape=(..., n_bins, t), dtype=complex]
        variable-Q spectrogram

    See Also
    --------
    cqt, interval_frequencies

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=1.0))
    >>> V = lt.vqt(y, sr=22050, n_bins=60, intervals='ji5', res_type='polyphase')
    >>> V.shape
    (60, 44)
    """
    return _vqt_dispatch(
        y, magnitude=False, sr=sr, hop_length=hop_length, fmin=fmin,
        n_bins=n_bins, intervals=intervals, gamma=gamma,
        bins_per_octave=bins_per_octave, tuning=tuning,
        filter_scale=filter_scale, norm=norm, sparsity=sparsity,
        window=window, scale=scale, pad_mode=pad_mode, res_type=res_type,
        dtype=dtype,
    )


def _vqt_dispatch(y, *, magnitude, intervals, bins_per_octave, tuning,
                  sr, res_type, **params):
    """Shared VQT entry: tuning estimation, config hashing, jit routing.

    ``magnitude=True`` folds ``|·|`` into the producing program so the
    array that crosses the program boundary is real — the axon runtime
    rejects complex operands entering a matmul-containing program from
    another program's output (see ``_axon_compat``), and chroma callers
    only consume the modulus anyway.
    """
    y = jnp.asarray(y)
    # On accelerator-resident input the host-soxr ladder pays ~0.5 s of
    # tunnel transfers per call (see audio._device_res_type); substitute
    # the device ladder so the whole transform stays one fused program.
    res_type = audio._device_res_type(y, res_type)

    if not isinstance(intervals, str):
        # hashable form, so the config can key the jit cache below
        intervals = tuple(float(v) for v in np.asarray(intervals))
        # array intervals define the bin grid, so they also set the
        # tuning-estimation resolution (reference constantq.py:978-986)
        bins_per_octave = len(intervals)
    if tuning is None:
        tuning = estimate_tuning(bins_per_octave=bins_per_octave, sr=sr, y=y)

    cfg = dict(
        sr=sr, hop_length=params["hop_length"], fmin=params["fmin"],
        n_bins=params["n_bins"], intervals=intervals, gamma=params["gamma"],
        bins_per_octave=bins_per_octave, tuning=float(tuning),
        filter_scale=params["filter_scale"], norm=params["norm"],
        sparsity=params["sparsity"], window=params["window"],
        scale=params["scale"], pad_mode=params["pad_mode"],
        res_type=res_type, dtype=params["dtype"], magnitude=magnitude,
    )
    if _cfg_jittable(res_type, cfg.values()):
        # device res_type + hashable config: the ENTIRE transform — early
        # decimation, the per-octave resample ladder, every octave's
        # STFT/basis product, trim/stack, scaling — compiles into ONE
        # program (the eager path costs ~2 launches per decimated octave)
        return _vqt_jit(y, **cfg)
    return _vqt_body(y, **cfg)


def _cfg_jittable(res_type: str, values) -> bool:
    """Whether a transform config can be a static jit key.

    Host-soxr resampling cannot trace; array-valued windows/params are
    unhashable.  Everything else (the common case) goes through the fused
    jitted entry.
    """
    if str(res_type).startswith("soxr"):
        return False
    return all(
        isinstance(v, (str, int, float, bool, complex, tuple, type(None),
                       np.dtype, type))
        or np.isscalar(v)
        for v in values
    )


def _vqt_body(
    y,
    *,
    sr,
    hop_length,
    fmin,
    n_bins,
    intervals,
    gamma,
    bins_per_octave,
    tuning,
    filter_scale,
    norm,
    sparsity,
    window,
    scale,
    pad_mode,
    res_type,
    dtype,
    magnitude=False,
):
    """Traceable VQT body (host planning at trace time, device compute)."""
    if not isinstance(intervals, str):
        bins_per_octave = len(intervals)
    if fmin is None:
        fmin = note_to_hz("C1")
    if dtype is None:
        dtype = util.dtype_r2c(y.dtype)

    fmin = fmin * 2.0 ** (tuning / bins_per_octave)
    if fmin >= sr / 2:
        raise ParameterError(f"fmin={fmin} must be less than sr/2={sr/2}")

    if n_bins is None:
        n_bins = int(np.ceil(bins_per_octave * (np.log2(sr) - np.log2(fmin))))
        auto_n_bins = True
    else:
        auto_n_bins = False

    freqs = interval_frequencies(
        n_bins=n_bins, fmin=fmin, intervals=intervals,
        bins_per_octave=bins_per_octave, sort=True,
    )
    if auto_n_bins:
        freqs = _clip_freqs(freqs, window, filter_scale, gamma, sr)
        n_bins = len(freqs)

    if n_bins == 1:
        alpha = _et_relative_bw(bins_per_octave)
    else:
        alpha = filters._relative_bandwidth(freqs=freqs)

    lengths, filter_cutoff = filters.wavelet_lengths(
        freqs=freqs, sr=sr, window=window, filter_scale=filter_scale,
        gamma=gamma, alpha=alpha,
    )

    nyquist = sr / 2.0
    if filter_cutoff > nyquist:
        fmax_t = float(np.max(freqs[-bins_per_octave:]))
        raise ParameterError(
            f"Wavelet basis with max frequency={fmax_t} would exceed the "
            f"Nyquist frequency={nyquist}. "
            "Try reducing the number of frequency bins."
        )

    n_octaves = int(np.ceil(float(n_bins) / bins_per_octave))
    n_filters = min(bins_per_octave, n_bins)

    y, sr, hop_length = _early_downsample(
        y, sr, hop_length, res_type, n_octaves, nyquist, filter_cutoff, scale
    )

    vqt_resp = []
    my_y, my_sr, my_hop = y, sr, hop_length

    # For host-side resamplers (soxr), precompute the whole downsample
    # ladder in one host pass: per-octave device→host round trips cost
    # ~40 ms each over remote links, while soxr itself is sub-millisecond.
    host_ladder = None
    if str(res_type).startswith("soxr"):
        try:
            from ..io import _soxr

            if _soxr.available():
                host_ladder = {}
                cur = np.asarray(my_y)
                cur_hop, cur_sr = my_hop, my_sr
                for i in range(n_octaves - 1):
                    if cur_hop % 2 == 0 and (
                        freqs[
                            (slice(-n_filters * (i + 1), -n_filters * i)
                             if i else slice(-n_filters, None)).start - 1
                        ] <= cur_sr / 5
                    ):
                        nxt = np.apply_along_axis(
                            _soxr.resample, -1, cur, in_rate=2, out_rate=1,
                            quality=res_type,
                        )
                        # fix_length + scale semantics, pure host numpy
                        size = int(np.ceil(cur.shape[-1] / 2))
                        if nxt.shape[-1] > size:
                            nxt = nxt[..., :size]
                        elif nxt.shape[-1] < size:
                            padw = [(0, 0)] * (nxt.ndim - 1) + [
                                (0, size - nxt.shape[-1])
                            ]
                            nxt = np.pad(nxt, padw)
                        cur = (nxt * np.sqrt(2)).astype(np.float32)
                        cur_hop //= 2
                        cur_sr /= 2.0
                        host_ladder[i + 1] = cur
        except Exception:
            host_ladder = None

    for i in range(n_octaves):
        if i == 0:
            sl = slice(-n_filters, None)
        else:
            sl = slice(-n_filters * (i + 1), -n_filters * i)

        freqs_oct = freqs[sl]
        alpha_oct = alpha[sl]

        fft_basis, n_fft, _ = _vqt_filter_fft(
            my_sr, freqs_oct, filter_scale, norm, sparsity, window=window,
            gamma=gamma, dtype=dtype, alpha=alpha_oct,
        )
        # compensate for downsampling
        fft_basis = fft_basis * np.sqrt(sr / my_sr)

        vqt_resp.append((my_y, n_fft, my_hop, fft_basis))

        if i < n_octaves - 1:
            f_max_next = freqs[sl.start - 1]
            if my_hop % 2 == 0 and f_max_next <= my_sr / 5:
                my_hop //= 2
                my_sr /= 2.0
                if host_ladder is not None and (i + 1) in host_ladder:
                    my_y = jnp.asarray(host_ladder[i + 1])
                else:
                    my_y = audio.resample(
                        my_y, orig_sr=2, target_sr=1, res_type=res_type,
                        scale=True,
                    )

    if scale:
        lengths, _ = filters.wavelet_lengths(
            freqs=freqs, sr=sr, window=window, filter_scale=filter_scale,
            gamma=gamma, alpha=alpha,
        )
        scales = (1.0 / np.sqrt(lengths)).astype(np.float32)
    else:
        scales = np.ones(n_bins, dtype=np.float32)

    # One program for the whole ladder: all octave responses, the
    # trim/stack, and the length scaling — ~15 eager dispatches become 1.
    ys = tuple(jnp.asarray(t[0]) for t in vqt_resp)
    bases = tuple(
        jnp.asarray(
            t[3].astype(
                np.complex64 if np.iscomplexobj(t[3]) else np.float32,
                copy=False,
            ) if isinstance(t[3], np.ndarray) else t[3]
        )
        for t in vqt_resp
    )
    plan = tuple((t[1], t[2]) for t in vqt_resp)
    return _vqt_ladder_core(
        ys, bases, jnp.asarray(scales), plan=plan, n_bins=n_bins,
        pad_mode=pad_mode, dtype=jnp.dtype(dtype).name, magnitude=magnitude,
    )


_vqt_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "sr", "hop_length", "fmin", "n_bins", "intervals", "gamma",
        "bins_per_octave", "tuning", "filter_scale", "norm", "sparsity",
        "window", "scale", "pad_mode", "res_type", "dtype", "magnitude",
    ),
)(_vqt_body)


@functools.partial(
    jax.jit,
    static_argnames=("plan", "n_bins", "pad_mode", "dtype", "magnitude"),
)
def _vqt_ladder_core(ys, bases, scales, *, plan, n_bins, pad_mode, dtype,
                     magnitude=False):
    """All octave responses + trim/stack + scaling as ONE program."""
    from .spectrum import _mats_arg, _stft_core, _win_device

    resps = []
    for (n_fft, hop), y_i, basis_i in zip(plan, ys, bases):
        window_dev = _win_device("ones", n_fft, n_fft, jnp.float32)
        D = _stft_core(
            y_i, window_dev, _mats_arg(n_fft, window_dev.dtype),
            n_fft=n_fft, hop_length=hop, center=True, pad_mode=pad_mode,
        )
        resps.append(
            jnp.einsum(
                "cf,...ft->...ct", basis_i.astype(D.dtype), D,
                precision=jax.lax.Precision.HIGHEST,
            )
        )

    V = _trim_stack(resps, n_bins, jnp.dtype(dtype))
    sc = util.expand_to(scales.astype(V.real.dtype), ndim=V.ndim, axes=-2)
    V = V * sc
    # |·| folded here keeps the program's OUTPUT real for magnitude-only
    # consumers (chroma) — complex outputs may not re-enter matmul programs
    # across an eager boundary on the axon backend
    return jnp.abs(V) if magnitude else V


def cqt(
    y: Any,
    *,
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    n_bins: Optional[int] = 84,
    bins_per_octave: int = 12,
    tuning: Optional[float] = 0.0,
    filter_scale: float = 1,
    norm: Optional[float] = 1,
    sparsity: float = 0.01,
    window: Any = "hann",
    scale: bool = True,
    pad_mode: str = "constant",
    res_type: str = "soxr_hq",
    dtype: Any = None,
) -> jax.Array:
    """Constant-Q transform: log-frequency spectrogram on a musical grid.

    A VQT with ``gamma=0`` (reference ``constantq.py:42``): geometrically
    spaced center frequencies with constant Q, computed by the recursive
    downsampling ladder.  On TPU the whole ladder — every octave's STFT,
    basis matmul, trim/stack, and scaling — compiles into ONE program.

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)]
        input signal(s)
    sr : number > 0
        sampling rate
    hop_length : int > 0
        hop length (must be divisible by ``2**(n_octaves-1)``)
    fmin : float > 0 or None
        lowest center frequency; defaults to C1 (~32.70 Hz)
    n_bins : int > 0
        number of frequency bins
    bins_per_octave : int > 0
        resolution of the log-frequency grid
    tuning : float or None
        tuning offset in fractions of a bin; None estimates from the signal
    filter_scale, norm, sparsity, window, scale, pad_mode, res_type, dtype
        basis construction and resampling controls, as in the reference

    Returns
    -------
    C : jax.Array [shape=(..., n_bins, t), dtype=complex]
        constant-Q spectrogram

    See Also
    --------
    vqt, hybrid_cqt, pseudo_cqt, icqt

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(220, duration=1.0))
    >>> C = lt.cqt(y, sr=22050, n_bins=84, res_type='polyphase')
    >>> C.shape
    (84, 44)
    >>> freqs = lt.cqt_frequencies(n_bins=84, fmin=lt.note_to_hz('C1'))
    >>> float(abs(freqs[int(np.abs(np.asarray(C)).mean(axis=1).argmax())] - 220)) < 10
    True
    """
    # CQT == VQT restricted to equal temperament with gamma pinned to 0
    # (forwarded settings listed alphabetically)
    vqt_params = dict(
        bins_per_octave=bins_per_octave,
        dtype=dtype,
        filter_scale=filter_scale,
        fmin=fmin,
        hop_length=hop_length,
        n_bins=n_bins,
        norm=norm,
        pad_mode=pad_mode,
        res_type=res_type,
        scale=scale,
        sparsity=sparsity,
        sr=sr,
        tuning=tuning,
        window=window,
    )
    return vqt(y=y, intervals="equal", gamma=0, **vqt_params)


def pseudo_cqt(
    y: Any,
    *,
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    n_bins: Optional[int] = 84,
    bins_per_octave: int = 12,
    tuning: Optional[float] = 0.0,
    filter_scale: float = 1,
    norm: Optional[float] = 1,
    sparsity: float = 0.01,
    window: Any = "hann",
    scale: bool = True,
    pad_mode: str = "constant",
    dtype: Any = None,
) -> jax.Array:
    """Pseudo constant-Q transform: |STFT| projected through |basis|.

    Computes a single magnitude STFT at the largest required window and
    projects it through the absolute values of the CQT filterbank —
    discarding phase, but avoiding the multirate octave ladder entirely.
    On TPU the STFT, the basis matmul, and the length scaling run as ONE
    fused program (behavior parity with the reference
    ``constantq.py:415``).

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)]
        audio signal(s)
    sr : number > 0
        sampling rate
    hop_length : int > 0
        hop between frames
    fmin : float or None
        lowest transform frequency (default: C1)
    n_bins : int or None
        number of frequency bins (None = up to Nyquist)
    bins_per_octave : int > 0
        bin density
    tuning : float or None
        tuning deviation in fractional bins (None = estimate from ``y``)
    filter_scale, norm, sparsity, window
        wavelet basis construction controls, as in :func:`cqt`
    scale : bool
        scale the response by ``1/sqrt(n_fft)``
    pad_mode : str
        signal padding mode
    dtype : dtype or None
        output dtype

    Returns
    -------
    C : jax.Array [shape=(..., n_bins, t)]
        magnitude-only pseudo-CQT

    See Also
    --------
    cqt, hybrid_cqt

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(220, duration=1.0))
    >>> P = lt.pseudo_cqt(y, sr=22050)
    >>> P.shape
    (84, 44)
    """
    y = jnp.asarray(y)
    if dtype is None:
        dtype = util.dtype_r2c(y.dtype)

    # anchor frequency: C1 by default, nudged by the (possibly
    # estimated) tuning deviation
    if fmin is None:
        fmin = note_to_hz("C1")
    if tuning is None:
        tuning = estimate_tuning(bins_per_octave=bins_per_octave, sr=sr, y=y)
    fmin = fmin * 2.0 ** (tuning / bins_per_octave)
    if fmin >= sr / 2:
        raise ParameterError(
            f"the lowest bin ({fmin} Hz) must sit below Nyquist ({sr / 2} Hz)"
        )

    # bin grid: explicit count, or fill the spectrum and clip at Nyquist
    fill_spectrum = n_bins is None
    if fill_spectrum:
        n_bins = int(np.ceil(bins_per_octave * np.log2(sr / fmin)))
    freqs = cqt_frequencies(
        fmin=fmin, n_bins=n_bins, bins_per_octave=bins_per_octave
    )
    if fill_spectrum:
        freqs = _clip_freqs(freqs, window, filter_scale, 0, sr)
        n_bins = len(freqs)

    alpha = (
        _et_relative_bw(bins_per_octave) if n_bins == 1
        else filters._relative_bandwidth(freqs=freqs)
    )
    lengths, filter_cutoff = filters.wavelet_lengths(
        alpha=alpha, filter_scale=filter_scale, freqs=freqs, sr=sr,
        window=window,
    )
    if filter_cutoff > sr / 2:
        raise ParameterError(
            f"the highest filter reaches {filter_cutoff} Hz, past Nyquist "
            f"({sr / 2} Hz) — use fewer bins"
        )

    # pseudo-CQT: magnitude-only STFT projection through the |wavelet|
    # responses at a single (un-decimated) sample rate
    fft_basis, n_fft, _ = _vqt_filter_fft(
        sr, freqs, filter_scale, norm, sparsity, hop_length=hop_length,
        window=window, dtype=dtype, alpha=alpha,
    )
    fft_basis = np.abs(fft_basis)

    if scale:
        post_div, post_mul = np.float32(np.sqrt(n_fft)), None
    else:
        post_div = None
        post_mul = np.sqrt(lengths / n_fft).astype(np.float32).reshape(-1, 1)
    return _cqt_response(
        y, n_fft, hop_length, fft_basis, pad_mode, window="hann",
        dtype=dtype, phase=False, post_div=post_div, post_mul=post_mul,
    )


def hybrid_cqt(
    y: Any,
    *,
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    n_bins: Optional[int] = 84,
    bins_per_octave: int = 12,
    tuning: Optional[float] = 0.0,
    filter_scale: float = 1,
    norm: Optional[float] = 1,
    sparsity: float = 0.01,
    window: Any = "hann",
    scale: bool = True,
    pad_mode: str = "constant",
    res_type: str = "soxr_hq",
    dtype: Any = None,
) -> jax.Array:
    """Hybrid constant-Q transform.

    Splits the frequency range at the hop length: bins whose wavelets are
    shorter than ``2 * hop_length`` use the (cheap, phase-free)
    pseudo-CQT; lower bins use the full multirate CQT ladder.  The two
    responses are trimmed and stacked in one fused program (behavior
    parity with the reference ``constantq.py:209``).

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)]
        audio signal(s)
    sr, hop_length, fmin, n_bins, bins_per_octave, tuning
        transform geometry, as in :func:`cqt`
    filter_scale, norm, sparsity, window
        wavelet basis construction controls
    scale : bool
        energy normalization, as in :func:`cqt`
    pad_mode : str
        signal padding mode
    res_type : str
        resampling mode for the full-CQT octave ladder
    dtype : dtype or None
        output dtype

    Returns
    -------
    C : jax.Array [shape=(..., n_bins, t)]
        hybrid CQT magnitudes

    See Also
    --------
    cqt, pseudo_cqt

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(220, duration=1.0))
    >>> H = lt.hybrid_cqt(y, sr=22050, res_type='polyphase')
    >>> H.shape
    (84, 44)
    """
    y = jnp.asarray(y)
    res_type = audio._device_res_type(y, res_type)
    if fmin is None:
        fmin = note_to_hz("C1")
    if tuning is None:
        tuning = estimate_tuning(bins_per_octave=bins_per_octave, sr=sr, y=y)

    cfg = dict(
        sr=sr, hop_length=hop_length, fmin=fmin, n_bins=n_bins,
        bins_per_octave=bins_per_octave, tuning=float(tuning),
        filter_scale=filter_scale, norm=norm, sparsity=sparsity,
        window=window, scale=scale, pad_mode=pad_mode, res_type=res_type,
        dtype=dtype,
    )
    if _cfg_jittable(res_type, cfg.values()):
        # pseudo response, full ladder, |·| and trim/stack in ONE program
        return _hybrid_jit(y, **cfg)
    return _hybrid_body(y, **cfg)


def _hybrid_body(
    y,
    *,
    sr,
    hop_length,
    fmin,
    n_bins,
    bins_per_octave,
    tuning,
    filter_scale,
    norm,
    sparsity,
    window,
    scale,
    pad_mode,
    res_type,
    dtype,
):
    """Traceable hybrid-CQT body (split planning happens at trace time)."""
    fmin = fmin * 2.0 ** (tuning / bins_per_octave)
    if fmin >= sr / 2:
        raise ParameterError(f"fmin={fmin} must be less than sr/2={sr/2}")

    if n_bins is None:
        n_bins = int(np.ceil(bins_per_octave * (np.log2(sr) - np.log2(fmin))))
        auto_n_bins = True
    else:
        auto_n_bins = False

    freqs = cqt_frequencies(n_bins, fmin=fmin, bins_per_octave=bins_per_octave)
    if auto_n_bins:
        freqs = _clip_freqs(freqs, window, filter_scale, 0, sr)
        n_bins = len(freqs)

    if n_bins == 1:
        alpha = _et_relative_bw(bins_per_octave)
    else:
        alpha = filters._relative_bandwidth(freqs=freqs)

    lengths, filter_cutoff = filters.wavelet_lengths(
        freqs=freqs, sr=sr, filter_scale=filter_scale, window=window, alpha=alpha
    )
    if filter_cutoff > sr / 2:
        raise ParameterError(
            f"Filter cutoff frequency {filter_cutoff} exceeds Nyquist "
            f"frequency {sr/2}. Try reducing the number of frequency bins."
        )

    pseudo_filters = 2.0 ** np.ceil(np.log2(lengths)) < 2 * hop_length
    n_bins_pseudo = int(np.sum(pseudo_filters))
    n_bins_full = n_bins - n_bins_pseudo

    cqt_resp = []
    if n_bins_pseudo > 0:
        fmin_pseudo = float(np.min(freqs[pseudo_filters]))
        cqt_resp.append(
            pseudo_cqt(
                y, sr=sr, hop_length=hop_length, fmin=fmin_pseudo,
                n_bins=n_bins_pseudo, bins_per_octave=bins_per_octave,
                filter_scale=filter_scale, norm=norm, sparsity=sparsity,
                window=window, scale=scale, pad_mode=pad_mode, dtype=dtype,
                tuning=0.0,
            )
        )
    if n_bins_full > 0:
        cqt_resp.append(
            jnp.abs(
                cqt(
                    y, sr=sr, hop_length=hop_length, fmin=fmin,
                    n_bins=n_bins_full, bins_per_octave=bins_per_octave,
                    filter_scale=filter_scale, norm=norm, sparsity=sparsity,
                    window=window, scale=scale, pad_mode=pad_mode,
                    res_type=res_type, dtype=dtype, tuning=0.0,
                )
            )
        )

    # cqt_resp is [pseudo (top bins), full (bottom bins)] — already in the
    # top-first order _trim_stack expects; the trim/stack slices fuse into
    # one program (eagerly ~1 dispatch per response + the concat)
    return _trim_stack_jit(
        tuple(cqt_resp), n_bins=int(n_bins),
        dtype_name=jnp.dtype(cqt_resp[-1].dtype).name,
    )


_hybrid_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "sr", "hop_length", "fmin", "n_bins", "bins_per_octave", "tuning",
        "filter_scale", "norm", "sparsity", "window", "scale", "pad_mode",
        "res_type", "dtype",
    ),
)(_hybrid_body)


@functools.partial(jax.jit, static_argnames=("n_bins", "dtype_name"))
def _trim_stack_jit(cqt_resp, *, n_bins, dtype_name):
    return _trim_stack(list(cqt_resp), n_bins, jnp.dtype(dtype_name))


@functools.partial(jax.jit, static_argnames=("plan_key",))
def _icqt_ladder_core(C, bases, coefs, *, plan_key):
    """All inverse-octave products + istfts in one program.

    ``plan_key[i] = (bin_start, n_filters, n_fft, hop)``; the per-octave
    bin slices happen inside the jit (eagerly they cost one
    dynamic_slice dispatch per octave).
    """
    outs = []
    for basis, coef, (start, n_filters, n_fft, hop) in zip(
        bases, coefs, plan_key
    ):
        C_oct = C[..., start: start + n_filters, :]
        D_oct = jnp.einsum(
            "fc,c,...ct->...ft", basis, coef, C_oct,
            precision=jax.lax.Precision.HIGHEST,
        )
        outs.append(istft(D_oct, window="ones", hop_length=hop))
    return tuple(outs)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def _icqt_octave_core(C_oct, inv_basis, coef, *, n_fft, hop_length):
    """One octave of the inverse ladder (basis product + istft), fused."""
    D_oct = jnp.einsum(
        "fc,c,...ct->...ft", inv_basis, coef, C_oct,
        precision=jax.lax.Precision.HIGHEST,
    )
    return istft(D_oct, window="ones", hop_length=hop_length)


def icqt(
    C: Any,
    *,
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    bins_per_octave: int = 12,
    tuning: float = 0.0,
    filter_scale: float = 1,
    norm: Optional[float] = 1,
    sparsity: float = 0.01,
    window: Any = "hann",
    scale: bool = True,
    length: Optional[int] = None,
    res_type: str = "soxr_hq",
    dtype: Any = None,
) -> jax.Array:
    """Inverse constant-Q transform.

    Approximately reconstructs a signal from its CQT by running the ladder
    in transpose: per-octave inverse responses are upsampled and summed
    (reference ``constantq.py:594``).  On TPU the inverse ladder is one
    fused program with a single bulk host transfer.

    Parameters
    ----------
    C : np.ndarray or jax.Array [shape=(..., n_bins, t), dtype=complex]
        CQT matrix (from ``cqt``)
    sr, hop_length, fmin, bins_per_octave, tuning
        must match the forward transform
    filter_scale, norm, sparsity, window, scale, res_type, dtype
        basis construction and resampling controls
    length : int or None
        exact output length

    Returns
    -------
    y : jax.Array [shape=(..., n)]
        reconstructed signal (band-limited to the CQT's frequency range)

    See Also
    --------
    cqt, griffinlim_cqt

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(220, duration=1.0))
    >>> C = lt.cqt(y, sr=22050, n_bins=48, res_type='polyphase')
    >>> y_rec = lt.icqt(C, sr=22050, length=len(y), res_type='polyphase')
    >>> y_rec.shape == y.shape
    True
    """
    C = jnp.asarray(C)
    res_type = audio._device_res_type(C, res_type)
    cfg = dict(
        sr=sr, hop_length=hop_length, fmin=fmin,
        bins_per_octave=bins_per_octave, tuning=tuning,
        filter_scale=filter_scale, norm=norm, sparsity=sparsity,
        window=window, scale=scale,
        length=None if length is None else int(length),
        res_type=res_type, dtype=dtype,
    )
    if _cfg_jittable(res_type, cfg.values()):
        # inverse ladder + per-octave upsample + accumulate + trim in ONE
        # program (eagerly: ~3 launches per upsampled octave)
        return _icqt_jit(C, **cfg)
    return _icqt_body(C, **cfg)


def _icqt_body(
    C,
    *,
    sr,
    hop_length,
    fmin,
    bins_per_octave,
    tuning,
    filter_scale,
    norm,
    sparsity,
    window,
    scale,
    length,
    res_type,
    dtype,
):
    """Traceable inverse-CQT body (octave plan built at trace time)."""
    if fmin is None:
        fmin = note_to_hz("C1")
    fmin = fmin * 2.0 ** (tuning / bins_per_octave)

    n_bins = C.shape[-2]
    n_octaves = int(np.ceil(float(n_bins) / bins_per_octave))
    freqs = cqt_frequencies(
        fmin=fmin, n_bins=n_bins, bins_per_octave=bins_per_octave
    )
    if n_bins == 1:
        alpha = _et_relative_bw(bins_per_octave)
    else:
        alpha = filters._relative_bandwidth(freqs=freqs)

    lengths, _ = filters.wavelet_lengths(
        freqs=freqs, sr=sr, window=window, filter_scale=filter_scale, alpha=alpha
    )

    if length is not None:
        n_frames = int(np.ceil((length + max(lengths)) / hop_length))
        C = C[..., :n_frames]

    C_scale = np.sqrt(lengths)

    y: Optional[jax.Array] = None
    host_acc = None
    _soxr_mod = None
    if str(res_type).startswith("soxr"):
        try:
            from ..io import _soxr as _soxr_mod

            if _soxr_mod.available():
                host_acc = []
            else:
                _soxr_mod = None
        except Exception:
            _soxr_mod = None
    srs = [sr]
    hops = [hop_length]
    for _ in range(n_octaves - 1):
        if hops[0] % 2 == 0:
            srs.insert(0, srs[0] * 0.5)
            hops.insert(0, hops[0] // 2)
        else:
            srs.insert(0, srs[0])
            hops.insert(0, hops[0])

    # Build the static per-octave plan, run ALL octave inversions in one
    # program, and fetch the results with one bulk transfer — the eager
    # ladder otherwise pays per-octave dispatch + fetch latency.
    plan = []
    for i, (my_sr, my_hop) in enumerate(zip(srs, hops)):
        n_filters = min(bins_per_octave, n_bins - bins_per_octave * i)
        sl = slice(bins_per_octave * i, bins_per_octave * i + n_filters)

        fft_basis, n_fft, _ = _vqt_filter_fft(
            my_sr, freqs[sl], filter_scale, norm, sparsity, window=window,
            alpha=alpha[sl],
        )
        inv_basis = fft_basis.conjugate().T  # (n_freq, n_filters)
        freq_power = 1 / np.sum(np.abs(inv_basis) ** 2, axis=0)
        freq_power *= n_fft / lengths[sl]

        if scale:
            coef = (C_scale[sl] * freq_power).astype(np.complex64)
        else:
            coef = freq_power.astype(np.complex64)
        plan.append((sl, inv_basis, coef, n_fft, my_hop, my_sr))

    y_octs = _icqt_ladder_core(
        jnp.asarray(C),
        tuple(jnp.asarray(t[1].astype(np.complex64)) for t in plan),
        tuple(jnp.asarray(t[2]) for t in plan),
        plan_key=tuple(
            (t[0].start, t[0].stop - t[0].start, t[3], t[4]) for t in plan
        ),
    )
    if host_acc is not None:
        # one bulk device→host transfer for the whole ladder
        y_octs = jax.device_get(y_octs)

    for (sl, inv_basis, coef, n_fft, my_hop, my_sr), y_oct in zip(
        plan, y_octs
    ):
        if dtype is not None:
            y_oct = y_oct.astype(dtype)

        factor = int(sr // my_sr)
        if host_acc is not None and factor > 1:
            # host soxr upsample + host accumulation: one device fetch per
            # octave instead of fetch + upload + device add
            y_host = np.apply_along_axis(
                _soxr_mod.resample, -1, np.asarray(y_oct),
                in_rate=1, out_rate=factor, quality=res_type,
            ).astype(np.float32)
            host_acc.append(y_host)
            continue
        if factor > 1:
            y_oct = audio.resample(
                y_oct, orig_sr=1, target_sr=factor, res_type=res_type,
                scale=False, fix=False,
            )
        if y is None:
            y = y_oct
        else:
            n_min = min(y.shape[-1], y_oct.shape[-1])
            y = y.at[..., :n_min].add(y_oct[..., :n_min])

    if host_acc is not None and host_acc:
        acc = None
        parts = host_acc + ([np.asarray(y)] if y is not None else [])
        for part in parts:
            if acc is None:
                acc = part.astype(np.float64)
            else:
                n_min = min(acc.shape[-1], part.shape[-1])
                acc = acc[..., :n_min] + part[..., :n_min]
        y = jnp.asarray(acc.astype(np.float32 if dtype is None else dtype))

    assert y is not None
    if length:
        y = util.fix_length(y, size=length)
    return y


_icqt_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "sr", "hop_length", "fmin", "bins_per_octave", "tuning",
        "filter_scale", "norm", "sparsity", "window", "scale", "length",
        "res_type", "dtype",
    ),
)(_icqt_body)


@jax.jit
def _gl_cqt_proj(C, angles):
    """Magnitude × phase product for the Griffin-Lim CQT iteration."""
    return C * angles


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iter", "momentum", "eps", "sr", "hop_length", "fmin",
        "bins_per_octave", "tuning", "filter_scale", "norm", "sparsity",
        "window", "scale", "pad_mode", "res_type", "length",
    ),
)
def _gl_cqt_loop_core(
    C,
    angles,
    *,
    n_iter,
    momentum,
    eps,
    sr,
    hop_length,
    fmin,
    bins_per_octave,
    tuning,
    filter_scale,
    norm,
    sparsity,
    window,
    scale,
    pad_mode,
    res_type,
    length,
):
    """Whole Griffin-Lim CQT loop in one program.

    Each ``lax.fori_loop`` step runs the inverse ladder
    (:func:`_icqt_body`), the forward ladder (:func:`_vqt_body`), and the
    momentum phase update — the loop body compiles once, so launch count
    and program size are independent of ``n_iter``.  Returns the final
    phase-projected coefficients ``C · angles`` for the closing synthesis.
    """
    t_len = C.shape[-1]
    n_bins = C.shape[-2]
    rebuilt0 = jnp.zeros(C.shape, dtype=angles.dtype)

    def body(_, carry):
        angles_i, tprev = carry
        inverse = _icqt_body(
            C * angles_i, sr=sr, hop_length=hop_length, fmin=fmin,
            bins_per_octave=bins_per_octave, tuning=tuning,
            filter_scale=filter_scale, norm=norm, sparsity=sparsity,
            window=window, scale=scale, length=length, res_type=res_type,
            dtype=None,
        )
        rebuilt = _vqt_body(
            inverse, sr=sr, hop_length=hop_length, fmin=fmin,
            n_bins=n_bins, intervals="equal", gamma=0,
            bins_per_octave=bins_per_octave, tuning=tuning,
            filter_scale=filter_scale, norm=norm, sparsity=sparsity,
            window=window, scale=scale, pad_mode=pad_mode,
            res_type=res_type, dtype=None,
        )[..., :t_len]
        ang = rebuilt - (momentum / (1 + momentum)) * tprev
        ang = ang / (jnp.abs(ang) + eps)
        return ang, rebuilt

    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles, rebuilt0))
    return C * angles


@functools.partial(jax.jit, static_argnames=("momentum", "eps", "t_len"))
def _gl_cqt_update(rebuilt, tprev, *, momentum, eps, t_len):
    rebuilt = rebuilt[..., :t_len]
    angles = rebuilt - (momentum / (1 + momentum)) * tprev
    angles = angles / (jnp.abs(angles) + eps)
    return angles, rebuilt


def griffinlim_cqt(
    C: Any,
    *,
    n_iter: int = 32,
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    bins_per_octave: int = 12,
    tuning: float = 0.0,
    filter_scale: float = 1,
    norm: Optional[float] = 1,
    sparsity: float = 0.01,
    window: Any = "hann",
    scale: bool = True,
    pad_mode: str = "constant",
    res_type: str = "soxr_hq",
    dtype: Any = None,
    length: Optional[int] = None,
    momentum: float = 0.99,
    init: Optional[str] = "random",
    rng: Optional[Any] = None,
    random_state: Optional[Any] = None,
) -> jax.Array:
    """Invert CQT magnitudes to audio via Griffin-Lim phase recovery.

    Alternates :func:`icqt` synthesis and :func:`cqt` re-analysis with
    momentum acceleration [Perraudin et al. 2013] until the phases are
    self-consistent (behavior parity with the reference
    ``constantq.py:1285``).  The random phase initialization runs as one
    jitted program with the seed as a traced scalar.

    Parameters
    ----------
    C : np.ndarray or jax.Array [shape=(..., n_bins, t)]
        CQT magnitudes to invert
    n_iter : int > 0
        number of Griffin-Lim iterations
    sr, hop_length, fmin, bins_per_octave, tuning
        CQT geometry (must match the forward transform)
    filter_scale, norm, sparsity, window, scale, pad_mode, res_type
        basis construction / resampling controls, as in :func:`cqt`
    dtype : dtype or None
        output dtype
    length : int or None
        exact output length in samples
    momentum : float in [0, 1)
        acceleration parameter (0 = plain Griffin-Lim)
    init : 'random' or None
        phase initialization (None = zero phase)
    rng, random_state
        randomness source (``random_state`` is deprecated)

    Returns
    -------
    y : jax.Array [shape=(..., n)]
        reconstructed time-domain signal

    See Also
    --------
    griffinlim, icqt

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(220, duration=0.5))
    >>> C = np.abs(np.asarray(lt.cqt(y, sr=22050, res_type='polyphase')))
    >>> y_hat = lt.griffinlim_cqt(C, sr=22050, n_iter=1,
    ...                           res_type='polyphase', length=len(y))
    >>> y_hat.shape == y.shape
    True
    """
    import warnings

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
            f"Griffin-Lim with momentum={momentum} > 1 can be unstable.",
            stacklevel=2,
        )
    elif momentum < 0:
        raise ParameterError(f"griffinlim_cqt() called with momentum={momentum} < 0")

    C = jnp.asarray(C)

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
    ang_dtype = util.dtype_r2c(C.dtype)
    # one jitted program for the phase init (PRNG + phasor eagerly would
    # cost ~5 tunnel dispatches; see core/spectrum.py:_griffinlim_init)
    angles = _griffinlim_init(C, np.uint32(seed), init)

    eps = util.tiny(np.zeros((), dtype=np.dtype(ang_dtype)))

    gl_cfg = dict(
        sr=sr, hop_length=hop_length, fmin=fmin,
        bins_per_octave=bins_per_octave, tuning=float(tuning),
        filter_scale=filter_scale, norm=norm, sparsity=sparsity,
        window=window, scale=scale, pad_mode=pad_mode, res_type=res_type,
        length=None if length is None else int(length),
    )
    if _cfg_jittable(res_type, gl_cfg.values()):
        # the ENTIRE phase-recovery loop — every iteration's inverse
        # ladder, forward ladder, trim, momentum update, and phase
        # normalization — is ONE lax.fori_loop program (the body compiles
        # once regardless of n_iter).  Total: init + loop + final
        # synthesis = 3 launches, vs ~4 per iteration eagerly.
        S_final = _gl_cqt_loop_core(
            C, angles, n_iter=int(n_iter), momentum=float(momentum),
            eps=float(eps), **gl_cfg,
        )
        return icqt(
            S_final, sr=sr, hop_length=hop_length,
            bins_per_octave=bins_per_octave, fmin=fmin, tuning=tuning,
            filter_scale=filter_scale, window=window, length=length,
            dtype=dtype, res_type=res_type, norm=norm, scale=scale,
            sparsity=sparsity,
        )

    rdt_r = np.zeros((), dtype=np.dtype(ang_dtype)).real.dtype
    rebuilt = jax.lax.complex(
        jnp.zeros(C.shape, dtype=rdt_r), jnp.zeros(C.shape, dtype=rdt_r)
    )

    for _ in range(n_iter):
        tprev = rebuilt
        inverse = icqt(
            _gl_cqt_proj(C, angles), sr=sr, hop_length=hop_length,
            bins_per_octave=bins_per_octave, fmin=fmin, tuning=tuning,
            filter_scale=filter_scale, window=window, length=length,
            res_type=res_type, norm=norm, scale=scale, sparsity=sparsity,
        )
        rebuilt = cqt(
            inverse, sr=sr, bins_per_octave=bins_per_octave,
            n_bins=C.shape[-2], hop_length=hop_length, fmin=fmin,
            tuning=tuning, filter_scale=filter_scale, window=window,
            res_type=res_type, norm=norm, scale=scale, sparsity=sparsity,
            pad_mode=pad_mode,
        )
        # trim + momentum update + phase normalization as ONE program
        # (eagerly ~4 dispatches per iteration)
        angles, rebuilt = _gl_cqt_update(
            rebuilt, tprev, momentum=float(momentum), eps=float(eps),
            t_len=int(C.shape[-1]),
        )

    return icqt(
        _gl_cqt_proj(C, angles), sr=sr, hop_length=hop_length,
        bins_per_octave=bins_per_octave, fmin=fmin, tuning=tuning,
        filter_scale=filter_scale, window=window, length=length, dtype=dtype,
        res_type=res_type, norm=norm, scale=scale, sparsity=sparsity,
    )
