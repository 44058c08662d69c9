"""Filterbank construction (L3).

Basis matrices (mel, chroma, wavelet, cq→chroma, multirate IIR) are built
host-side in float64 NumPy at plan time and baked into jitted device programs
as constants — on TPU the filterbank *application* is an MXU matmul, so
construction cost is irrelevant and full float64 parity with the reference
(``librosa/filters.py``) is free.

Constructors are memoized in-process with ``functools.lru_cache`` and carry
the reference's opt-in on-disk joblib layer (``@cache(level=10)``, active
when ``LIBROSA_CACHE_DIR`` is set — see ``librosa_tpu/_cache.py``).
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import numpy as np
import scipy.signal

from .core.convert import (
    fft_frequencies,
    hz_to_midi,
    hz_to_octs,
    mel_frequencies,
    midi_to_hz,
    note_to_hz,
)
from ._cache import cache
from .util.exceptions import ParameterError

__all__ = [
    "mel",
    "chroma",
    "wavelet",
    "wavelet_lengths",
    "cq_to_chroma",
    "get_window",
    "window_bandwidth",
    "window_sumsquare",
    "semitone_filterbank",
    "mr_frequencies",
    "diagonal_filter",
]

_WindowSpec = Any


# ---------------------------------------------------------------------------
# Host-side normalize (float64; same semantics as util.normalize /
# reference util/utils.py:797)
# ---------------------------------------------------------------------------


def _np_normalize(
    S: np.ndarray,
    *,
    norm: Optional[float] = np.inf,
    axis: Optional[int] = 0,
    threshold: Optional[float] = None,
    fill: Optional[bool] = None,
) -> np.ndarray:
    if threshold is None:
        if np.issubdtype(S.dtype, np.floating) or np.issubdtype(
            S.dtype, np.complexfloating
        ):
            threshold = float(np.finfo(S.dtype).tiny)
        else:
            threshold = float(np.finfo(np.float32).tiny)
    mag = np.abs(S).astype(float)
    fill_norm = 1.0
    if norm is None:
        return S
    elif norm == np.inf:
        length = np.max(mag, axis=axis, keepdims=True)
    elif norm == -np.inf:
        length = np.min(mag, axis=axis, keepdims=True)
    elif norm == 0:
        if fill is True:
            raise ParameterError("Cannot normalize with norm=0 and fill=True")
        length = np.sum(mag > 0, axis=axis, keepdims=True, dtype=mag.dtype)
    elif np.issubdtype(type(norm), np.number) and norm > 0:
        length = np.sum(mag**norm, axis=axis, keepdims=True) ** (1.0 / norm)
        if axis is None:
            fill_norm = mag.size ** (-1.0 / norm)
        else:
            fill_norm = mag.shape[axis] ** (-1.0 / norm)
    else:
        raise ParameterError(f"Unsupported norm: {repr(norm)}")

    small_idx = length < threshold
    Snorm = np.empty_like(S, dtype=np.result_type(S.dtype, np.float64)
                          if not np.issubdtype(S.dtype, np.complexfloating)
                          else S.dtype)
    if fill is None:
        length[small_idx] = 1.0
        Snorm[:] = S / length
    elif fill:
        length[small_idx] = np.nan
        Snorm[:] = S / length
        Snorm[np.isnan(Snorm)] = fill_norm
    else:
        length[small_idx] = np.inf
        Snorm[:] = S / length
    return Snorm


def _np_pad_center(data: np.ndarray, *, size: int, axis: int = -1, **kwargs: Any) -> np.ndarray:
    kwargs.setdefault("mode", "constant")
    n = data.shape[axis]
    lpad = int((size - n) // 2)
    lengths = [(0, 0)] * data.ndim
    lengths[axis] = (lpad, int(size - n - lpad))
    if lpad < 0:
        raise ParameterError(f"Target size ({size:d}) must be at least input size ({n:d})")
    return np.pad(data, lengths, **kwargs)


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


def get_window(window: _WindowSpec, Nx: int, *, fftbins: bool = True) -> np.ndarray:
    """Compute a window function as a float64 host array.

    Accepts the full window grammar: a name (``'hann'``), a
    parameterized tuple (``('kaiser', 4.0)``), a scalar beta, a
    callable window factory, or a precomputed vector (validated for
    length and passed through).

    Parameters
    ----------
    window : str, tuple, number, callable, or np.ndarray
        window specification
    Nx : int > 0
        window length
    fftbins : bool
        periodic window (for spectral analysis) rather than symmetric

    Returns
    -------
    win : np.ndarray [shape=(Nx,)]
        the window samples

    Raises
    ------
    ParameterError
        for an unusable spec or a vector of the wrong length

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> w = lt.filters.get_window('hann', 8)
    >>> float(w[0]), len(w)
    (0.0, 8)

    Parity: reference filters.py:915.
    """
    # Precomputed vectors pass through after a length check; factories are
    # invoked; named/parameterized specs delegate to scipy's window table.
    if isinstance(window, (list, np.ndarray)):
        win = np.asarray(window)
        if win.shape[0] != Nx:
            raise ParameterError(f"Window size mismatch: {win.shape[0]:d} != {Nx:d}")
        return win
    if callable(window):
        return window(Nx)
    if not (isinstance(window, (str, tuple)) or np.isscalar(window)):
        raise ParameterError(f"Invalid window specification: {window!r}")
    return np.asarray(scipy.signal.get_window(window, Nx, fftbins=fftbins))


# Equivalent-noise-bandwidth lookup (standard ENBW constants; reference
# filters.py WINDOW_BANDWIDTHS table — values are mathematical properties of
# the named windows at n=1000).
WINDOW_BANDWIDTHS: dict = {
    "bart": 1.3334961334912805,
    "barthann": 1.4560255965133932,
    "bartlett": 1.3334961334912805,
    "bkh": 2.0045975283585014,
    "black": 1.7269681554262326,
    "blackharr": 2.0045975283585014,
    "blackman": 1.7269681554262326,
    "blackmanharris": 2.0045975283585014,
    "blk": 1.7269681554262326,
    "bman": 1.7859588613860062,
    "bmn": 1.7859588613860062,
    "bohman": 1.7859588613860062,
    "box": 1.0,
    "boxcar": 1.0,
    "brt": 1.3334961334912805,
    "brthan": 1.4560255965133932,
    "bth": 1.4560255965133932,
    "cosine": 1.2337005350199792,
    "flat": 2.7762255046484143,
    "flattop": 2.7762255046484143,
    "flt": 2.7762255046484143,
    "halfcosine": 1.2337005350199792,
    "ham": 1.3629455320350348,
    "hamm": 1.3629455320350348,
    "hamming": 1.3629455320350348,
    "han": 1.50018310546875,
    "hann": 1.50018310546875,
    "nut": 1.9763500280946082,
    "nutl": 1.9763500280946082,
    "nuttall": 1.9763500280946082,
    "ones": 1.0,
    "par": 1.9174603174603191,
    "parz": 1.9174603174603191,
    "parzen": 1.9174603174603191,
    "rect": 1.0,
    "rectangular": 1.0,
    "tri": 1.3331706523555851,
    "triang": 1.3331706523555851,
    "triangle": 1.3331706523555851,
}


def window_bandwidth(window: _WindowSpec, n: int = 1000) -> float:
    """Equivalent noise bandwidth (in FFT bins) of a window function.

    Known window names resolve from a precomputed table; anything else
    is measured directly as ``n · Σw² / (Σw)²`` on an ``n``-point
    realization.

    Parameters
    ----------
    window : str or callable
        window specification
    n : int > 0
        sample count for the direct measurement

    Returns
    -------
    bandwidth : float
        equivalent noise bandwidth in bins

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> float(np.round(lt.filters.window_bandwidth('hann'), 6))
    1.500183

    Parity: reference filters.py:865.
    """
    if hasattr(window, "__name__"):
        key = window.__name__
    else:
        key = window
    if key not in WINDOW_BANDWIDTHS:
        win = get_window(window, n)
        WINDOW_BANDWIDTHS[key] = n * np.sum(win**2) / (
            np.sum(win) ** 2 + np.finfo(win.dtype).tiny
        )
    return WINDOW_BANDWIDTHS[key]


def _float_window(window_spec: _WindowSpec) -> Callable[..., np.ndarray]:
    """Window function supporting fractional lengths.

    Guarantees length ``ceil(x)`` with values from ``floor(x)`` zeroed.
    Parity: filters.py (__float_window).
    """

    def _wrap(n: float, *args: Any, **kwargs: Any) -> np.ndarray:
        n_min, n_max = int(np.floor(n)), int(np.ceil(n))
        window = get_window(window_spec, n_min)
        if len(window) < n_max:
            window = np.pad(window, [(0, n_max - len(window))], mode="constant")
        window[n_min:] = 0.0
        return window

    return _wrap


# ---------------------------------------------------------------------------
# Mel filterbank
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=128)
def _mel_cached(
    sr: float,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    htk: bool,
    norm: Any,
    dtype_str: str,
) -> np.ndarray:
    n_mels = int(n_mels)
    weights = np.zeros((n_mels, int(1 + n_fft // 2)), dtype=np.float64)

    fftfreqs = fft_frequencies(sr=sr, n_fft=n_fft)
    mel_f = mel_frequencies(n_mels + 2, fmin=fmin, fmax=fmax, htk=htk)

    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)

    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))

    if isinstance(norm, str):
        if norm == "slaney":
            # Slaney-style mel: approximately constant energy per channel
            enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
            weights *= enorm[:, np.newaxis]
        else:
            raise ParameterError(f"Unsupported norm={norm}")
    else:
        weights = _np_normalize(weights, norm=norm, axis=-1)

    if not np.all((mel_f[:-2] == 0) | (weights.max(axis=1) > 0)):
        warnings.warn(
            "Empty filters detected in mel frequency basis. "
            "Some channels will produce empty responses. "
            "Try increasing your sampling rate (and fmax) or "
            "reducing n_mels.",
            stacklevel=2,
        )
    return weights.astype(np.dtype(dtype_str))


@cache(level=10)
def mel(
    *,
    sr: float,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Union[str, float, None] = "slaney",
    dtype: Any = np.float32,
) -> np.ndarray:
    """Create a mel filterbank projecting FFT bins onto mel bands.

    Each row is a triangular response centered on one mel frequency,
    overlapping its neighbors; ``norm='slaney'`` area-normalizes each
    triangle so bands integrate to equal energy.

    Parameters
    ----------
    sr : number > 0
        sampling rate
    n_fft : int > 0
        FFT size the filterbank will be applied to
    n_mels : int > 0
        number of mel bands
    fmin : float >= 0
        lowest band edge (Hz)
    fmax : float or None
        highest band edge (defaults to ``sr / 2``)
    htk : bool
        use the HTK mel formula instead of Slaney
    norm : {'slaney', number, None}
        triangle normalization mode
    dtype : dtype
        output dtype

    Returns
    -------
    M : np.ndarray [shape=(n_mels, 1 + n_fft//2)]
        mel transformation matrix

    See Also
    --------
    librosa_tpu.feature.melspectrogram

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> M = lt.filters.mel(sr=22050, n_fft=2048, n_mels=40)
    >>> M.shape
    (40, 1025)

    Parity: reference filters.py:117.
    """
    if fmax is None:
        fmax = float(sr) / 2
    return _mel_cached(
        float(sr), int(n_fft), int(n_mels), float(fmin), float(fmax), bool(htk),
        norm, np.dtype(dtype).str,
    )


# ---------------------------------------------------------------------------
# Chroma filterbank
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=128)
def _chroma_cached(
    sr: float,
    n_fft: int,
    n_chroma: int,
    tuning: float,
    ctroct: float,
    octwidth: Optional[float],
    norm: Optional[float],
    base_c: bool,
    dtype_str: str,
) -> np.ndarray:
    wts = np.zeros((n_chroma, n_fft))
    frequencies = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    frqbins = n_chroma * hz_to_octs(
        frequencies, tuning=tuning, bins_per_octave=n_chroma
    )
    # 0 Hz bin placed 1.5 octaves below bin 1 (broad, 50%-rotated chroma)
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidthbins = np.concatenate(
        (np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1])
    )
    D = np.subtract.outer(frqbins, np.arange(0, n_chroma, dtype="d")).T
    n_chroma2 = np.round(float(n_chroma) / 2)
    D = np.remainder(D + n_chroma2 + 10 * n_chroma, n_chroma) - n_chroma2
    wts = np.exp(-0.5 * (2 * D / np.tile(binwidthbins, (n_chroma, 1))) ** 2)
    wts = _np_normalize(wts, norm=norm, axis=0)
    if octwidth is not None:
        wts *= np.exp(
            -0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)
        )[np.newaxis, :]
    if base_c:
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return np.ascontiguousarray(
        wts[:, : int(1 + n_fft / 2)], dtype=np.dtype(dtype_str)
    )


@cache(level=10)
def chroma(
    *,
    sr: float,
    n_fft: int,
    n_chroma: int = 12,
    tuning: float = 0.0,
    ctroct: float = 5.0,
    octwidth: Optional[float] = 2,
    norm: Optional[float] = 2,
    base_c: bool = True,
    dtype: Any = np.float32,
) -> np.ndarray:
    """Create a chroma filterbank projecting FFT bins onto pitch classes.

    Each FFT bin contributes Gaussian mass to its nearest pitch class;
    an octave-dominance Gaussian (``ctroct``/``octwidth``) de-weights
    extreme registers.

    Parameters
    ----------
    sr : number > 0
        sampling rate
    n_fft : int > 0
        FFT size
    n_chroma : int > 0
        number of pitch classes
    tuning : float
        tuning deviation in fractions of a chroma bin
    ctroct, octwidth : float
        center (in octaves) and width of the dominance window;
        ``octwidth=None`` disables weighting
    norm : number or None
        column normalization order
    base_c : bool
        start the rotation at C (else A)
    dtype : dtype
        output dtype

    Returns
    -------
    C : np.ndarray [shape=(n_chroma, 1 + n_fft//2)]
        chroma transformation matrix

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.filters.chroma(sr=22050, n_fft=2048).shape
    (12, 1025)

    Parity: reference filters.py:255.
    """
    return _chroma_cached(
        float(sr), int(n_fft), int(n_chroma), float(tuning), float(ctroct),
        None if octwidth is None else float(octwidth), norm, bool(base_c),
        np.dtype(dtype).str,
    )


# ---------------------------------------------------------------------------
# Wavelet (CQT/VQT) basis
# ---------------------------------------------------------------------------


def _relative_bandwidth(*, freqs: np.ndarray) -> np.ndarray:
    """Relative bandwidth alpha[k] per frequency. Parity: filters.py:555.

    alpha[k] = (r-1)/(r+1) where ``r`` is the frequency ratio spanned by the
    two neighbors of bin k (one-sided spans doubled at the edges).  Centered
    log-spans come from ``np.gradient`` rather than the reference's explicit
    bins-per-octave slicing.
    """
    if len(freqs) <= 1:
        raise ParameterError(
            f"2 or more frequencies are required to compute bandwidths. Given freqs={freqs}"
        )
    span = 2.0 * np.gradient(np.log2(freqs))
    ratio = np.exp2(span)
    return (ratio - 1) / (ratio + 1)


@cache(level=10)
def wavelet_lengths(
    *,
    freqs: Any,
    sr: float = 22050,
    window: _WindowSpec = "hann",
    filter_scale: float = 1,
    gamma: Optional[float] = 0,
    alpha: Optional[Any] = None,
) -> Tuple[np.ndarray, float]:
    """Length of each filter in a wavelet basis, and the global f_cutoff.

    Parity: reference ``filters.py:424``.  Each filter's bandwidth is
    ``B[k] = alpha[k]*freqs[k] + gamma`` Hz, so its length in samples is
    ``filter_scale * sr / B[k]`` (equivalently the reference's
    ``Q*sr/(f + gamma/alpha)`` with ``Q = filter_scale/alpha``).  The cutoff
    is the top of the highest filter's -3 dB main lobe.
    """
    freqs = np.asarray(freqs)
    scale = float(filter_scale)
    if scale <= 0:
        raise ParameterError(
            f"filter_scale must be a positive number; got {filter_scale}"
        )
    if gamma is not None and gamma < 0:
        raise ParameterError(f"a negative gamma ({gamma}) is not meaningful")
    if freqs.min(initial=np.inf) <= 0:
        raise ParameterError("wavelet center frequencies must be > 0")
    if np.any(np.diff(freqs) < 0):
        raise ParameterError(
            f"wavelet center frequencies must be sorted ascending; "
            f"got {freqs}"
        )

    alpha = _relative_bandwidth(freqs=freqs) if alpha is None else np.asarray(alpha)
    # gamma=None selects ERB-proportional bandwidth offsets (Glasberg & Moore).
    gamma_ = gamma if gamma is not None else alpha * (24.7 / 0.108)

    # Main-lobe half-width of each filter, in Hz: the window's equivalent
    # noise bandwidth spans bw/Q = bw*alpha/scale relative to center.
    halfwidth = 0.5 * (
        freqs * (window_bandwidth(window) * alpha / scale) + gamma_
    )
    f_cutoff = float(np.max(freqs + halfwidth))

    lengths = scale * sr / (alpha * freqs + gamma_)
    return lengths, f_cutoff


@cache(level=10)
def wavelet(
    *,
    freqs: np.ndarray,
    sr: float = 22050,
    window: _WindowSpec = "hann",
    filter_scale: float = 1,
    pad_fft: bool = True,
    norm: Optional[float] = 1,
    dtype: Any = np.complex64,
    gamma: float = 0,
    alpha: Optional[float] = None,
    **kwargs: Any,
) -> Tuple[np.ndarray, np.ndarray]:
    """Construct a wavelet basis of windowed complex sinusoids.

    Each basis row is a windowed complex exponential at one requested
    frequency, with length set by the frequency's Q factor; rows are
    centered and zero-padded to a common (optionally pow2) length.

    Parameters
    ----------
    freqs : np.ndarray
        center frequencies in Hz
    sr : number > 0
        sampling rate
    window : window spec
        envelope window
    filter_scale : float > 0
        Q-factor scale
    pad_fft : bool
        pad to the next power of two
    norm : number or None
        per-filter normalization order
    dtype : dtype
        output (complex) dtype
    gamma : float >= 0
        bandwidth offset (variable-Q)
    alpha : float or None
        precomputed relative bandwidth(s)

    Returns
    -------
    filters : np.ndarray [shape=(len(freqs), length)]
        wavelet basis
    lengths : np.ndarray
        effective length of each filter

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> basis, lengths = lt.filters.wavelet(
    ...     freqs=lt.cqt_frequencies(12, fmin=220.0), sr=22050)
    >>> basis.shape[0], int(lengths.size)
    (12, 12)

    Parity: reference ``filters.py:589``.  Returns ``(filters, lengths)``;
    filters are center-padded to a power of 2 when ``pad_fft``.
    """
    lengths, _ = wavelet_lengths(
        freqs=freqs, sr=sr, window=window, filter_scale=filter_scale,
        gamma=gamma, alpha=alpha,
    )

    # common output length first, so atoms can be assembled directly
    span = max(lengths)
    span = (
        int(2.0 ** np.ceil(np.log2(span))) if pad_fft else int(np.ceil(span))
    )

    taper = _float_window(window)

    def _atom(length: float, freq: float) -> np.ndarray:
        # complex exponential at `freq`, sampled on a centered support
        support = np.arange(-length // 2, length // 2, dtype=float)
        osc = np.exp(1j * (2 * np.pi * freq / sr) * support)
        return _np_normalize(osc * taper(len(support)), norm=norm)

    bank = np.asarray(
        [
            _np_pad_center(_atom(ln, fq), size=span, **kwargs)
            for ln, fq in zip(lengths, freqs)
        ],
        dtype=dtype,
    )
    return bank, lengths


# ---------------------------------------------------------------------------
# CQ → chroma map
# ---------------------------------------------------------------------------


@cache(level=10)
def cq_to_chroma(
    n_input: int,
    *,
    bins_per_octave: int = 12,
    n_chroma: int = 12,
    fmin: Optional[float] = None,
    window: Optional[np.ndarray] = None,
    base_c: bool = True,
    dtype: Any = np.float32,
) -> np.ndarray:
    """Build a map from constant-Q bins onto chroma (pitch-class) bins.

    Merges every ``bins_per_octave / n_chroma`` CQ bins into one pitch
    class, rolls so the first class matches ``fmin``'s pitch, and
    optionally smooths with a window across merged bins.

    Parameters
    ----------
    n_input : int > 0
        number of constant-Q bins
    bins_per_octave : int > 0
        CQ bins per octave
    n_chroma : int > 0
        output pitch classes (must divide ``bins_per_octave``)
    fmin : float or None
        frequency of the first CQ bin (default C1)
    window : np.ndarray or None
        smoothing window across merged bins
    base_c : bool
        rotate so class 0 is C
    dtype : dtype
        output dtype

    Returns
    -------
    cq_to_ch : np.ndarray [shape=(n_chroma, n_input)]
        transformation matrix

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.filters.cq_to_chroma(84).shape
    (12, 84)

    Parity: reference filters.py:737.
    """
    if bins_per_octave % n_chroma:
        raise ParameterError(
            f"cannot merge {bins_per_octave} CQ bins/octave into "
            f"{n_chroma} chroma classes: not an integer ratio"
        )
    merge = bins_per_octave // n_chroma
    anchor = note_to_hz("C1") if fmin is None else fmin

    # Closed-form assignment: CQ bin j belongs to the chroma class whose
    # merge window (centered, hence the merge//2 shift) contains j,
    # rotated so row 0 is C (or A when base_c=False).
    tonic_class = np.mod(hz_to_midi(anchor), 12)
    if not base_c:
        tonic_class -= 9
    rotation = int(np.round(tonic_class * n_chroma / 12.0))

    cols = np.arange(n_input)
    in_octave = (cols % bins_per_octave + merge // 2) % bins_per_octave
    rows = (in_octave // merge + rotation) % n_chroma

    proj = np.zeros((n_chroma, n_input), dtype=dtype)
    proj[rows, cols] = 1

    if window is not None:
        # per-class smoothing across adjacent CQ bins
        proj = np.stack(
            [np.convolve(row, window, mode="same") for row in proj]
        ).astype(dtype)
    return proj


# ---------------------------------------------------------------------------
# Multirate IIR filterbank (for iirt)
# ---------------------------------------------------------------------------


def _multirate_fb(
    center_freqs: Optional[np.ndarray] = None,
    sample_rates: Optional[np.ndarray] = None,
    Q: float = 25.0,
    passband_ripple: float = 1,
    stopband_attenuation: float = 50,
    ftype: str = "ellip",
    flayout: str = "sos",
) -> Tuple[List[Any], np.ndarray]:
    """Multirate band-pass IIR bank via iirdesign. Parity: filters.py:981."""
    if center_freqs is None or sample_rates is None:
        raise ParameterError(
            "the multirate bank needs both center_freqs and sample_rates"
        )
    if center_freqs.shape != sample_rates.shape:
        raise ParameterError(
            f"one sample rate per center frequency: got "
            f"{center_freqs.shape} centers vs {sample_rates.shape} rates"
        )

    # band geometry in Nyquist-relative frequency: the passband spans
    # fc +/- fc/(2Q); the stopband is twice as wide
    half_bw = center_freqs / (2.0 * float(Q))

    def _design_band(fc, ny, hb):
        edges_pass = np.array([fc - hb, fc + hb]) / ny
        edges_stop = np.array([fc - 2 * hb, fc + 2 * hb]) / ny
        return scipy.signal.iirdesign(
            edges_pass, edges_stop, passband_ripple, stopband_attenuation,
            analog=False, ftype=ftype, output=flayout,
        )

    bank = [
        _design_band(fc, ny, hb)
        for fc, ny, hb in zip(center_freqs, 0.5 * sample_rates, half_bw)
    ]
    return bank, sample_rates


def mr_frequencies(tuning: float) -> Tuple[np.ndarray, np.ndarray]:
    """Center frequency / sample-rate pairs for the semitone filterbank.

    The multi-rate layout follows Müller's pitch filterbank: MIDI 24-59
    at 882 Hz, 60-93 at 4410 Hz, 94-108 at 22050 Hz.

    Parameters
    ----------
    tuning : float
        tuning deviation in fractions of a semitone

    Returns
    -------
    center_freqs : np.ndarray [shape=(85,)]
        filter center frequencies in Hz
    sample_rates : np.ndarray [shape=(85,)]
        sampling rate for each filter

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> freqs, rates = lt.filters.mr_frequencies(0.0)
    >>> int(freqs.size), float(rates[0]), float(rates[-1])
    (85, 882.0, 22050.0)

    Parity: reference filters.py:1103.
    """
    center_freqs = midi_to_hz(np.arange(24 + tuning, 109 + tuning))
    sample_rates = np.asarray(36 * [882.0] + 34 * [4410.0] + 15 * [22050.0])
    return center_freqs, sample_rates


@cache(level=10)
def semitone_filterbank(
    *,
    center_freqs: Optional[np.ndarray] = None,
    tuning: float = 0.0,
    sample_rates: Optional[np.ndarray] = None,
    flayout: str = "ba",
    **kwargs: Any,
) -> Tuple[List[Any], np.ndarray]:
    """Construct a multi-rate bank of IIR band-pass filters at semitones.

    Each filter is an order-4 elliptic band-pass (via
    ``scipy.signal.ellip``) a quarter-tone wide around its center, at
    the center's native sampling rate.

    Parameters
    ----------
    center_freqs : np.ndarray or None
        filter centers in Hz (default :func:`mr_frequencies` layout)
    tuning : float
        tuning deviation passed to :func:`mr_frequencies`
    sample_rates : np.ndarray or None
        per-filter sampling rates
    flayout : {'ba', 'sos'}
        filter coefficient layout
    **kwargs
        forwarded to the elliptic designer

    Returns
    -------
    filterbank : list
        filter coefficients, one entry per semitone
    sample_rates : np.ndarray
        sampling rate per filter

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> bank, rates = lt.filters.semitone_filterbank()
    >>> len(bank) == rates.size == 85
    True

    Parity: reference filters.py:1156.
    """
    if (center_freqs is None) and (sample_rates is None):
        center_freqs, sample_rates = mr_frequencies(tuning)
    return _multirate_fb(
        center_freqs=center_freqs, sample_rates=sample_rates, flayout=flayout,
        **kwargs,
    )


# ---------------------------------------------------------------------------
# Window sum-square envelope (host; device variant in ops.overlap_add)
# ---------------------------------------------------------------------------


@cache(level=10)
def window_sumsquare(
    *,
    window: _WindowSpec,
    n_frames: int,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    n_fft: int = 2048,
    dtype: Any = np.float32,
    norm: Optional[float] = None,
) -> np.ndarray:
    """Sum-square envelope of an overlapped window sequence.

    Computes ``Σ_t w²[n - t·hop]`` — the denominator of inverse-STFT
    normalization.  Vectorized overlap-add (``np.add.at``) replaces the
    reference's numba fill loop.

    Parameters
    ----------
    window : window spec
        analysis window
    n_frames : int > 0
        number of overlapping frames
    hop_length : int > 0
        samples between frames
    win_length : int or None
        window length (default ``n_fft``)
    n_fft : int > 0
        frame length
    dtype : dtype
        output dtype
    norm : number or None
        optional window normalization order

    Returns
    -------
    wss : np.ndarray [shape=(n_fft + hop_length * (n_frames - 1),)]
        sum-square envelope

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> env = lt.filters.window_sumsquare(window='hann', n_frames=10,
    ...                                   hop_length=512, n_fft=2048)
    >>> env.shape
    (6656,)

    Parity: reference filters.py:1268.
    """
    if win_length is None:
        win_length = n_fft

    n = n_fft + hop_length * (n_frames - 1)
    x = np.zeros(n, dtype=np.float64)

    win_sq = get_window(window, win_length).astype(np.float64)
    win_sq = _np_normalize(win_sq, norm=norm) ** 2
    win_sq = _np_pad_center(win_sq, size=n_fft)

    # Scatter-add each frame's squared window at its hop offset
    starts = hop_length * np.arange(n_frames)
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    valid = idx < n
    np.add.at(x, idx[valid], np.broadcast_to(win_sq, idx.shape)[valid])
    return x.astype(dtype)


# ---------------------------------------------------------------------------
# Diagonal smoothing filter (for segment.path_enhance)
# ---------------------------------------------------------------------------


@cache(level=10)
def diagonal_filter(
    window: _WindowSpec,
    n: int,
    *,
    slope: float = 1.0,
    angle: Optional[float] = None,
    zero_mean: bool = False,
) -> np.ndarray:
    """Build a two-dimensional diagonal smoothing kernel.

    Lays a 1-D window along the main diagonal and spline-rotates the
    plane to the requested angle; used to enhance diagonal structure in
    recurrence/self-similarity matrices.

    Parameters
    ----------
    window : window spec
        1-D window to lay along the diagonal
    n : int > 0
        kernel size
    slope : float > 0
        rise/run of the diagonal (ignored when ``angle`` given)
    angle : float or None
        rotation angle in radians
    zero_mean : bool
        subtract the kernel mean (high-pass form)

    Returns
    -------
    kernel : np.ndarray [shape=(n, n)]
        normalized 2-D filter

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> k = lt.filters.diagonal_filter('hann', 5)
    >>> k.shape, bool(np.isclose(k.sum(), 1.0))
    ((5, 5), True)

    Parity: reference filters.py:1343.
    """
    theta = np.arctan(slope) if angle is None else angle

    # Lay the 1-D window along the main diagonal (a 45-degree line in image
    # coordinates), then spline-rotate the plane to the requested angle.
    stencil = np.diag(get_window(window, n, fftbins=False))
    off_diagonal = not np.isclose(theta, np.pi / 4)
    if off_diagonal:
        from scipy.ndimage import rotate as _nd_rotate

        stencil = _nd_rotate(
            stencil, 45.0 - np.degrees(theta), order=5, prefilter=False
        )
        # spline interpolation can ring negative; clamp before normalizing
        stencil = np.where(stencil > 0, stencil, 0.0)

    stencil /= stencil.sum()
    if zero_mean:
        stencil -= stencil.mean()
    return stencil
