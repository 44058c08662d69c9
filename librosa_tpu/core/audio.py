"""Audio I/O, resampling, and signal synthesis (L2).

Decode happens on host (``librosa_tpu.io``, native C++ decoders); everything
numerical is JAX.  The TPU-native resampler expresses polyphase FIR
resampling as a single dilated/strided convolution (exact
``scipy.signal.resample_poly`` semantics), which XLA maps onto the MXU.
soxr_* modes bind the system libsoxr on host for reference parity
(``librosa/core/audio.py:1158-1168``).

Parity citations refer to ``librosa/core/audio.py``.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Callable, Generator, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import io as audio_io
from ..util import utils as util
from ..util.exceptions import ParameterError
from .convert import frames_to_samples, time_to_samples

__all__ = [
    "load",
    "loadx",
    "stream",
    "to_mono",
    "to_stereo",
    "to_multi",
    "resample",
    "get_duration",
    "get_samplerate",
    "autocorrelate",
    "lpc",
    "zero_crossings",
    "clicks",
    "tone",
    "chirp",
    "mu_compress",
    "mu_expand",
]


# ---------------------------------------------------------------------------
# Loading (reference core/audio.py:59)
# ---------------------------------------------------------------------------


def load(
    path: Any,
    *,
    sr: Optional[float] = 22050,
    mono: bool = True,
    offset: float = 0.0,
    duration: Optional[float] = None,
    dtype: Any = np.float32,
    res_type: str = "soxr_hq",
) -> Tuple[np.ndarray, Union[int, float]]:
    """Load an audio file as a floating-point time series.

    Decodes on the host (native WAV/FLAC/OGG decoder or system libsndfile),
    optionally mixes down to mono, and resamples to ``sr`` on the device.
    Behavior parity with the reference ``core/audio.py:59``.

    Parameters
    ----------
    path : str, Path, or file-like
        audio file to load
    sr : number > 0 or None
        target sampling rate (default 22050); ``None`` keeps the native rate
    mono : bool
        mix multi-channel audio down to mono
    offset : float
        start reading at this time (seconds)
    duration : float or None
        only load this much audio (seconds)
    dtype : numeric dtype
        output dtype (default float32)
    res_type : str
        resampling mode (see ``resample``)

    Returns
    -------
    y : np.ndarray [shape=(n,) or (channels, n)]
        audio time series
    sr : number
        the sampling rate of ``y``

    See Also
    --------
    stream : blockwise loading for long files
    resample

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> y, sr = lt.load('/root/reference/tests/test_audio.ogg')
    >>> sr
    22050
    """
    y, native_rate = audio_io.read_audio(
        path, offset=offset, duration=duration, dtype=dtype
    )
    out_rate = native_rate if sr is None else sr
    stages = []
    if mono:
        stages.append(lambda x: to_mono(x))
    if out_rate != native_rate:
        stages.append(
            lambda x: resample(x, orig_sr=native_rate, target_sr=out_rate,
                               res_type=res_type)
        )
    for stage in stages:
        y = np.asarray(stage(y))
    return np.asarray(y, dtype=dtype), out_rate


def loadx(
    key: str,
    *,
    hq: Optional[bool] = None,
    **kwargs: Any,
) -> Tuple[np.ndarray, Union[int, float]]:
    """Load a named example recording (``load`` over the example registry).

    Resolves ``key`` through the offline example registry
    (``LIBROSA_DATA_DIR``) and loads it like :func:`load`.

    Parameters
    ----------
    key : str
        example track key (see ``util.list_examples``)
    hq : bool or None
        prefer the high-quality variant when available
    **kwargs
        forwarded to :func:`load` (``sr``, ``mono``, ``offset``, ...)

    Returns
    -------
    y : np.ndarray
        audio samples
    sr : number > 0
        sampling rate

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> y, sr = lt.loadx('trumpet')         # doctest: +SKIP

    Parity: reference core/audio.py:535 (loadx).
    """
    from ..util.files import example

    return load(example(key, hq=bool(hq)), **kwargs)


def stream(
    path: Any,
    *,
    block_length: int,
    frame_length: int,
    hop_length: int,
    sr: Optional[float] = None,
    mono: bool = True,
    offset: float = 0.0,
    duration: Optional[float] = None,
    fill_value: Optional[float] = None,
    res_type: str = "soxr_hq",
    dtype: Any = np.float32,
) -> Generator[np.ndarray, None, None]:
    """Stream audio in fixed-length overlapping blocks.

    Behavior parity with the reference ``core/audio.py:223``: yields blocks
    of ``(block_length-1)*hop_length + frame_length`` samples advancing by
    ``block_length*hop_length``; the ``frame_length - hop_length`` overlap is
    carried between blocks so framewise analyses (``center=False``) tile
    seamlessly.  This is also the legality model for the time-sharded device
    path (``librosa_tpu.parallel``).

    Parameters
    ----------
    path : str, Path, or file-like
        audio file
    block_length : int > 0
        number of frames per block
    frame_length, hop_length : int > 0
        frame geometry of the downstream analysis
    sr : number > 0 or None
        target rate (soxr modes only); None keeps native
    mono : bool
        downmix to mono
    offset, duration : float
        region to stream (seconds)
    fill_value : float or None
        pad the final block to full size with this value
    dtype : numeric dtype
        block dtype

    Yields
    ------
    block : np.ndarray
        overlapping signal blocks

    Notes
    -----
    Memory is O(block): the decoder is a streaming handle
    (:class:`librosa_tpu.io.AudioReader` — incremental WAV reads, a
    sliding-window FLAC decoder, library-native ogg/mp3 pulls), rate
    conversion holds libsoxr filter state across chunks
    (:class:`librosa_tpu.io._soxr.StreamResampler`), and blocks are carved
    from a small ring buffer sized ``yield + 2·advance`` samples.  The
    full signal is never materialized — see
    ``tests/test_stream.py::test_stream_never_materializes_signal``.
    """
    if not util.is_positive_int(block_length):
        raise ParameterError(f"block_length={block_length} must be a positive integer")
    if not util.is_positive_int(frame_length):
        raise ParameterError(f"frame_length={frame_length} must be a positive integer")
    if not util.is_positive_int(hop_length):
        raise ParameterError(f"hop_length={hop_length} must be a positive integer")
    if sr is not None and not (np.isfinite(sr) and sr > 0):
        raise ParameterError(f"sr={sr} must be a positive number")
    if res_type not in ("soxr_vhq", "soxr_hq", "soxr_mq", "soxr_lq", "soxr_qq"):
        raise ParameterError(
            f"res_type={res_type} is not a valid soxr resampling mode for streaming"
        )

    yield_size = (block_length - 1) * hop_length + frame_length
    advance = block_length * hop_length

    # an already-open AudioReader may be passed in place of a path (the
    # reference accepts an open soundfile.SoundFile the same way); the
    # caller keeps ownership and the handle is left open on exit
    caller_owns_reader = isinstance(path, audio_io.AudioReader)
    reader = path if caller_owns_reader else audio_io.AudioReader(path)
    try:
        sr_native = reader.sr
        needs_resampling = sr is not None and sr != sr_native
        if sr is None:
            sr = sr_native

        # one output advance must map to a whole number of native samples,
        # or block boundaries would drift against the decoder
        exact_step = advance * sr_native / sr
        native_step = int(round(exact_step))
        if abs(exact_step - native_step) > 1e-5 + 1e-7 * abs(exact_step):
            raise ParameterError(
                f"A block advance of {advance} samples at sr={sr} is a "
                f"fractional number of samples at the native rate "
                f"{sr_native}; choose block/hop lengths that divide evenly"
            )

        n_channels = 1 if mono else reader.channels
        resampler = (
            audio_io._soxr.StreamResampler(
                sr_native, sr, channels=n_channels, quality=res_type
            )
            if needs_resampling
            else None
        )

        if offset >= 0:
            reader.seek(int(offset * sr_native))
        else:
            if reader.frames is None:
                raise ParameterError(
                    "negative offset requires a container that declares "
                    "its length"
                )
            reader.seek(reader.frames + int(offset * sr_native))
        budget = int(duration * sr_native) if duration is not None else None

        # ring buffer of decoded-and-resampled samples, (n, ch) layout
        capacity = yield_size + 2 * advance
        ring = np.zeros((capacity, n_channels), dtype=dtype)
        w_idx = 0
        r_idx = 0

        def _emit(block2d):
            # (n, ch) → caller-facing (n,) mono or (ch, n) multichannel.
            # Must COPY: the source is a view into the ring buffer, which
            # later reads overwrite after the consumer holds the block.
            if mono or block2d.shape[1] == 1:
                return block2d[:, 0].copy()
            return block2d.T.copy()

        while budget is None or budget > 0:
            want = native_step if budget is None else min(native_step, budget)
            chunk = reader.read(want)
            if budget is not None:
                budget -= chunk.shape[0]
            if chunk.shape[0] == 0:
                break
            if mono and reader.channels > 1:
                chunk = chunk.mean(axis=1, keepdims=True)
            if resampler is not None:
                chunk = resampler.process(chunk)
            chunk = chunk.astype(dtype, copy=False)

            n_in = chunk.shape[0]
            if w_idx + n_in > capacity:
                held = w_idx - r_idx
                ring[:held] = ring[r_idx:w_idx]
                r_idx, w_idx = 0, held
            ring[w_idx : w_idx + n_in] = chunk
            w_idx += n_in

            while w_idx - r_idx >= yield_size:
                yield _emit(ring[r_idx : r_idx + yield_size])
                r_idx += advance

        # flush the resampler's filter tail and drain the remainder
        tail = [ring[r_idx:w_idx]]
        if resampler is not None:
            flushed = resampler.process(
                np.empty((0, n_channels), dtype=np.float32), last=True
            ).astype(dtype, copy=False)
            if flushed.shape[0]:
                tail.append(flushed)
        remainder = np.concatenate(tail) if len(tail) > 1 else tail[0]

        pos = 0
        while pos < remainder.shape[0]:
            block = remainder[pos : pos + yield_size]
            if fill_value is not None and block.shape[0] < yield_size:
                block = np.pad(
                    block,
                    ((0, yield_size - block.shape[0]), (0, 0)),
                    constant_values=fill_value,
                )
            yield _emit(block)
            pos += advance
    finally:
        if not caller_owns_reader:
            reader.close()


def get_samplerate(path: Any) -> int:
    """Read the native sampling rate of an audio file without decoding it.

    Parameters
    ----------
    path : str
        path to a wav/flac/ogg file

    Returns
    -------
    sr : int > 0
        sampling rate declared by the container

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> sr = lt.get_samplerate('audio.wav')   # doctest: +SKIP

    Parity: reference core/audio.py:1289.
    """
    return audio_io.get_samplerate(path)


def get_duration(
    *,
    y: Optional[Any] = None,
    sr: float = 22050,
    S: Optional[Any] = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    center: bool = True,
    path: Optional[str] = None,
) -> float:
    """Compute the duration in seconds of audio, a spectrogram, or a file.

    Exactly one of ``y``, ``S``, or ``path`` is consulted (in that
    priority order, with ``path`` first).  Spectrogram durations invert
    the framing arithmetic, including the centering pad.

    Parameters
    ----------
    y : array-like or None
        audio samples
    sr : number > 0
        sampling rate of ``y``
    S : array-like or None
        spectrogram whose frame count determines duration
    n_fft, hop_length, center
        framing parameters used to produce ``S``
    path : str or None
        audio file to measure (header only, no decode)

    Returns
    -------
    d : float
        duration in seconds

    Raises
    ------
    ParameterError
        if none of ``y``, ``S``, ``path`` is given

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> float(lt.get_duration(y=np.zeros(22050), sr=22050))
    1.0

    Parity: reference core/audio.py:1182.
    """
    if path is not None:
        native_sr, _, n_frames = audio_io.get_info(path)
        return float(n_frames) / native_sr
    if y is not None:
        return np.shape(y)[-1] / float(sr)
    if S is None:
        raise ParameterError(
            "get_duration needs a signal (y), a spectrogram (S), or a path"
        )
    # invert the framing arithmetic: n frames cover n_fft + hop*(n-1)
    # samples, minus the reflection padding when frames were centered
    span = n_fft + hop_length * (np.shape(S)[-1] - 1)
    if center:
        span -= (n_fft // 2) * 2
    return span / float(sr)


# ---------------------------------------------------------------------------
# Channel mixing (reference core/audio.py:628-1000)
# ---------------------------------------------------------------------------


def to_mono(
    *signals: Any, pad: bool = True, norm: bool = True, out: Any = None
) -> jax.Array:
    """Mix one or more (possibly multichannel) signals down to mono.

    Channels are averaged over every leading axis; multiple input
    signals are then summed (padded to the longest when ``pad``) and
    optionally normalized by the number of signals.

    Parameters
    ----------
    *signals : array-like
        one or more audio buffers
    pad : bool
        pad shorter signals before summing
    norm : bool
        divide the mix by the number of signals
    out : unsupported
        accepted for signature parity; must be None

    Returns
    -------
    y_mono : jax.Array [shape=(n,)]
        the mono mixdown

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> y = np.array([[1.0, 2.0], [3.0, 4.0]])
    >>> np.asarray(lt.to_mono(y)).tolist()
    [2.0, 3.0]

    Parity: reference core/audio.py:628.
    """
    if not signals:
        raise ParameterError("At least one signal must be provided to `to_mono`.")
    arrs = [jnp.asarray(y) for y in signals]
    n_min = min(a.shape[-1] for a in arrs)
    n_max = max(a.shape[-1] for a in arrs)
    size = n_max if pad else n_min

    combine = jnp.mean if norm else jnp.sum
    total = None
    for a in arrs:
        mixed = combine(a, axis=tuple(range(a.ndim - 1))) if a.ndim > 1 else a
        mixed = util.fix_length(mixed, size=size, axis=-1)
        total = mixed if total is None else total + mixed
    if norm:
        total = total / len(arrs)
    return total


def to_stereo(
    *,
    left: Optional[Any] = None,
    right: Optional[Any] = None,
    downmix: bool = True,
    pad: bool = True,
    norm: bool = True,
    out: Any = None,
) -> jax.Array:
    """Combine left/right signals into a (2, n) stereo array.

    Missing channels are filled with silence; multichannel inputs are
    downmixed to one channel each (or, with ``downmix=False``, must
    already be mono or stereo-shaped).

    Parameters
    ----------
    left, right : array-like or None
        per-channel signals (at least one required)
    downmix : bool
        mix multichannel inputs to mono before placement
    pad : bool
        pad the shorter channel (else truncate the longer)
    norm : bool
        normalize downmixes by channel count

    Returns
    -------
    y_stereo : jax.Array [shape=(2, n)]
        stereo signal

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> y = lt.to_stereo(left=np.ones(4), right=np.zeros(4))
    >>> np.asarray(y).shape
    (2, 4)

    Parity: reference core/audio.py:743.
    """
    if left is None and right is None:
        raise ParameterError(
            "to_stereo() needs at least one channel (left= or right=)"
        )
    both_given = left is not None and right is not None
    # a missing side contributes silence shaped like its partner
    sides = [
        jnp.zeros_like(jnp.asarray(right)) if left is None else jnp.asarray(left),
        jnp.zeros_like(jnp.asarray(left)) if right is None else jnp.asarray(right),
    ]
    lengths = [s.shape[-1] for s in sides]
    size = max(lengths) if pad else min(lengths)
    sides = [util.fix_length(s, size=size, axis=-1) for s in sides]

    if downmix:
        return jnp.stack([to_mono(s, norm=norm) for s in sides])

    def _as_channel(x: jax.Array, slot: int) -> jax.Array:
        if x.ndim == 2 and x.shape[0] == 2:
            return x  # already stereo: contributes to both rows
        if x.ndim == 1:
            rows = [x, jnp.zeros_like(x)]
            return jnp.stack(rows if slot == 0 else rows[::-1])
        raise ParameterError(
            f"downmix=False accepts mono or (2, n) inputs; got shape {x.shape}"
        )

    mixed = _as_channel(sides[0], 0) + _as_channel(sides[1], 1)
    if norm and both_given:
        mixed = mixed / 2
    return mixed


def to_multi(
    *signals: Any,
    downmix: bool = True,
    pad: bool = True,
    norm: bool = True,
    out: Any = None,
) -> jax.Array:
    """Stack signals into one multichannel (k, n) array.

    Each input becomes one output channel (downmixed to mono first when
    ``downmix``), padded or truncated to a common length.

    Parameters
    ----------
    *signals : array-like
        one signal per output channel
    downmix : bool
        mix multichannel inputs to mono before stacking
    pad : bool
        pad to the longest signal (else truncate to the shortest)
    norm : bool
        normalize downmixes by channel count

    Returns
    -------
    y_multi : jax.Array [shape=(len(signals), n)]
        multichannel signal

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> y = lt.to_multi(np.ones(4), np.zeros(4), np.ones(4))
    >>> np.asarray(y).shape
    (3, 4)

    Parity: reference core/audio.py:885.
    """
    if not signals:
        raise ParameterError("At least one signal must be provided.")
    arrs = [jnp.asarray(y) for y in signals]
    n_min = min(a.shape[-1] for a in arrs)
    n_max = max(a.shape[-1] for a in arrs)
    size = n_max if pad else n_min

    if downmix:
        rows = [
            util.fix_length(to_mono(a, norm=norm), size=size, axis=-1) for a in arrs
        ]
        return jnp.stack(rows, axis=0)

    layout = arrs[0].shape[:-1]
    for a in arrs:
        if a.shape[:-1] != layout:
            raise ParameterError(
                f"Cannot combine signals with different channel layouts "
                f"{a.shape[:-1]} when downmix=False"
            )
    total = None
    for a in arrs:
        fixed = util.fix_length(a, size=size, axis=-1)
        total = fixed if total is None else total + fixed
    if norm:
        total = total / len(arrs)
    return total


# ---------------------------------------------------------------------------
# Resampling (reference core/audio.py:1002) — MXU polyphase FIR
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _poly_filter(up: int, down: int, window_beta: float = 5.0) -> np.ndarray:
    """Kaiser-windowed sinc lowpass for polyphase resampling.

    Matches scipy.signal.resample_poly's default filter design:
    ``firwin(2*10*max(up,down)+1, 1/max(up,down), window=('kaiser', 5.0))``.
    """
    import scipy.signal

    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = scipy.signal.firwin(
        2 * half_len + 1, f_c, window=("kaiser", window_beta)
    )
    return (h * up).astype(np.float64)


def _upfirdn_len(len_h: int, n_in: int, up: int, down: int) -> int:
    return ((n_in - 1) * up + len_h - 1) // down + 1


@functools.lru_cache(maxsize=64)
def _upfirdn_matrix(h_key: tuple, up: int, down: int):
    """Host-cached polyphase filter matrix F (W, up).

    With t = m·down, m = q·up + p:
        upfirdn(h, x)[m] = Σ_j x[⌊t/up⌋ − j] · h[(t mod up) + j·up]
                         = Σ_j x[q·down + c_p − j] · Hp[p, j]
    where c_p = (p·down) // up and Hp[p, j] = h[((p·down) mod up) + j·up].
    Writing xs[q, k] = x_zpad[q·down + k] with L−1 left zeros and
    W = down + L − 1, the whole transform is ONE matmul  xs @ F.
    """
    h_host = np.asarray(h_key, dtype=np.float64)
    len_h = len(h_host)
    L = -(-len_h // up)
    h_np = np.zeros(L * up)
    h_np[:len_h] = h_host

    W = down + L - 1
    F = np.zeros((W, up), dtype=np.float32)
    for p in range(up):
        t_mod = (p * down) % up
        c_p = (p * down) // up
        for j in range(L):
            F[(L - 1) + c_p - j, p] = h_np[t_mod + j * up]
    # cache NUMPY, not a device array: a jnp constant created under an
    # outer jit trace is a tracer, and caching it poisons later calls
    return F, L, W


_UPFIRDN_DEV: dict = {}


def _upfirdn_device_F(h_key: tuple, up: int, down: int, F_np: np.ndarray):
    """Device-resident polyphase matrix (tracer-guarded cache).

    Without this, every eager ``resample_poly`` call re-uploads F
    (hundreds of KB for common rate pairs) over the ~22 ms/dispatch
    device tunnel; with it, the constant is transferred once per
    filter configuration.  Same pattern as ``pallas_stft._DEV_CONSTS``.
    """
    key = (hash(h_key), up, down)
    cached = _UPFIRDN_DEV.get(key)
    if cached is not None:
        return cached
    dev = jnp.asarray(F_np)
    if not isinstance(dev, jax.core.Tracer):
        _UPFIRDN_DEV[key] = dev
    return dev


@functools.partial(
    jax.jit,
    static_argnames=("down", "W", "q_blocks", "lpad", "rpad", "lo", "hi"),
)
def _upfirdn_matmul(
    x, F, *, down: int, W: int, q_blocks: int, lpad: int, rpad: int,
    lo: int, hi: int,
):
    """Pad → xs[q, k] = x_pad[q·down + k] (slice-concat) → xs @ F → slice."""
    pad = [(0, 0)] * x.ndim
    pad[-1] = (lpad, rpad)
    x_pad = jnp.pad(x, pad)
    rows = x_pad[..., : (q_blocks + (W - 1) // down + 1) * down]
    lead = rows.shape[:-1]
    rows = rows.reshape(*lead, -1, down)
    parts = [rows[..., s : s + q_blocks, :] for s in range((W - 1) // down + 1)]
    xs = jnp.concatenate(parts, axis=-1)[..., :W]     # (..., Q, W)
    if F.shape[-1] >= 8:
        y = jnp.matmul(xs, F, precision=jax.lax.Precision.HIGHEST)
    else:
        # tiny `up` makes a pathological N<8 matmul on the MXU; a VPU
        # broadcast-reduce is far faster for pure downsampling
        y = jnp.einsum(
            "...qk,kp->...qp", xs, F, precision=jax.lax.Precision.HIGHEST
        ) if F.shape[-1] > 1 else jnp.sum(
            xs * F[:, 0], axis=-1, keepdims=True
        )
    return y.reshape(*lead, -1)[..., lo:hi]           # (..., n_out)


def _upfirdn_conv(
    x: jax.Array, h: jax.Array, *, up: int, down: int, n_pre_remove: int, n_out: int
) -> jax.Array:
    """Polyphase resampling as one MXU matmul (no gathers, no dilated conv).

    ``lax.conv_general_dilated`` with large ``lhs_dilation`` (e.g. 320/441)
    takes minutes to compile on TPU and XLA gathers run scalar-slow; the
    blocked polyphase matrix form compiles in seconds and is a single
    (Q, down+L−1) × (down+L−1, up) matmul.
    """
    h_key = tuple(np.asarray(h, dtype=np.float32).tolist())
    F, L, W = _upfirdn_matrix(h_key, up, down)
    F = _upfirdn_device_F(h_key, up, down, F)

    M = _upfirdn_len(h.shape[0], x.shape[-1], up, down)
    q_blocks = -(-M // up)

    # zero-pad: L−1 on the left (j lookback), right to cover the last block
    need = (q_blocks + (W - 1) // down + 1) * down
    return _upfirdn_matmul(
        x, F, down=down, W=W, q_blocks=q_blocks, lpad=L - 1,
        rpad=max(0, need - (L - 1) - x.shape[-1]),
        lo=n_pre_remove, hi=n_pre_remove + n_out,
    )


def resample_poly(
    x: Any, up: int, down: int, *, axis: int = -1, dtype: Any = None
) -> jax.Array:
    """Polyphase resampling by a rational factor ``up / down``.

    TPU-native equivalent of ``scipy.signal.resample_poly`` with the
    default Kaiser(5.0) anti-aliasing filter and exact output-alignment
    semantics (zero-padded filter centering, output length
    ``ceil(n * up / down)``).  The upfirdn runs as one blocked MXU
    matmul program (``_upfirdn_conv``).

    Parameters
    ----------
    x : np.ndarray or jax.Array
        input signal(s)
    up, down : int > 0
        integer resampling ratio
    axis : int
        resampling axis
    dtype : dtype or None
        optional output cast

    Returns
    -------
    x_hat : jax.Array
        resampled signal

    See Also
    --------
    resample

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> from librosa_tpu.core.audio import resample_poly
    >>> y = np.asarray(lt.tone(440, duration=1.0))
    >>> resample_poly(y, 2, 1).shape[-1] == 2 * len(y)
    True
    """
    x = jnp.asarray(x)
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    n_in = x.shape[-1]
    g = int(np.gcd(up, down))
    up, down = up // g, down // g
    if up == down == 1:
        out = x
    else:
        h = _poly_filter(up, down)
        n_out = n_in * up // down + (1 if (n_in * up) % down else 0)
        half_len = (len(h) - 1) // 2
        n_pre_pad = down - half_len % down
        n_post_pad = 0
        n_pre_remove = (half_len + n_pre_pad) // down
        while (
            _upfirdn_len(len(h) + n_pre_pad + n_post_pad, n_in, up, down)
            < n_out + n_pre_remove
        ):
            n_post_pad += 1
        h_padded = np.concatenate(
            [np.zeros(n_pre_pad), h, np.zeros(n_post_pad)]
        )
        out = _upfirdn_conv(
            x,
            # stays host-side numpy: _upfirdn_conv only reads h for the
            # filter-matrix cache key (and uploading it would both cost a
            # convert program and break tracing under an outer jit)
            np.asarray(h_padded, dtype=np.float32),
            up=up,
            down=down,
            n_pre_remove=n_pre_remove,
            n_out=n_out,
        )
    if axis != -1:
        out = jnp.moveaxis(out, -1, axis)
    if dtype is not None:
        out = out.astype(dtype)
    return out


@functools.partial(jax.jit, static_argnames=("num",))
def _resample_fft(x: jax.Array, *, num: int) -> jax.Array:
    """Fourier resampling along the last axis (scipy.signal.resample parity).

    On TPU, non-power-of-two FFTs lower to dense O(n²) DFT matrices (a
    48 GB allocation for 5 s of audio), so composite lengths route through
    the two-stage Cooley-Tukey matmul FFT (``ops.ctfft``).
    """
    from ..ops.ctfft import _is_pow2, fft_arbitrary, ifft_arbitrary
    from ..ops.fft import _resolved_backend

    n = x.shape[-1]
    if _resolved_backend() == "matmul" and not (_is_pow2(n) and _is_pow2(num)):
        X_full = fft_arbitrary(x.astype(jnp.complex64), n)
        n_bins_out = num // 2 + 1
        n_min = min(num, n)
        nyq = n_min // 2 + 1
        Y = jnp.zeros(x.shape[:-1] + (n_bins_out,), dtype=X_full.dtype)
        Y = Y.at[..., :nyq].set(X_full[..., :nyq])
        if n_min % 2 == 0:
            if num < n:
                Y = Y.at[..., n_min // 2].multiply(2.0)
            elif num > n:
                Y = Y.at[..., n // 2].multiply(0.5)
        # rebuild the conjugate-symmetric full spectrum of length num
        if num % 2 == 0:
            mid = jnp.conj(Y[..., 1:-1][..., ::-1])
        else:
            mid = jnp.conj(Y[..., 1:][..., ::-1])
        Y_full = jnp.concatenate([Y, mid], axis=-1)
        y = jnp.real(ifft_arbitrary(Y_full, num))
        return y * (float(num) / float(n))

    X = jnp.fft.rfft(x, axis=-1)
    n_bins_out = num // 2 + 1
    n_min = min(num, n)
    nyq = n_min // 2 + 1

    Y = jnp.zeros(x.shape[:-1] + (n_bins_out,), dtype=X.dtype)
    Y = Y.at[..., :nyq].set(X[..., :nyq])
    if n_min % 2 == 0:
        if num < n:  # downsampling: fold the Nyquist bin
            Y = Y.at[..., n_min // 2].multiply(2.0)
        elif num > n:  # upsampling: split the Nyquist bin
            Y = Y.at[..., n // 2].multiply(0.5)
    y = jnp.fft.irfft(Y, n=num, axis=-1)
    return y * (float(num) / float(n))


def _interp_grid(n_samples: int, ratio: float):
    """Output positions ``n / ratio`` split into (int32 base, f32 frac).

    Computed host-side in float64 so position precision does not degrade
    along long signals (f32 arange/divide drifts ~0.06 samples at n=1e6).
    """
    pos = np.arange(n_samples, dtype=np.float64) / ratio
    base = np.floor(pos)
    return (
        jnp.asarray(base.astype(np.int32)),
        jnp.asarray((pos - base).astype(np.float32)),
    )


@functools.partial(jax.jit, static_argnames=("hold",))
def _resample_interp(
    x: jax.Array, base: jax.Array, frac: jax.Array, *, hold: bool
) -> jax.Array:
    """Linear / zero-order-hold resampling along the last axis.

    Parity target: the reference's `samplerate` ``linear`` and
    ``zero_order_hold`` converters (core/audio.py:1046-1052) — non-bandlimited
    interpolation at output positions ``n / ratio``.  Pure gather (+ lerp), so
    it fuses into one tiny XLA program and supports arbitrary ratios.
    """
    n_in = x.shape[-1]
    left = jnp.take(x, jnp.clip(base, 0, n_in - 1), axis=-1)
    if hold:
        return left
    right = jnp.take(x, jnp.clip(base + 1, 0, n_in - 1), axis=-1)
    return left + frac.astype(x.dtype) * (right - left)


# Half-width (taps per side) of the continuous windowed-sinc interpolator.
_SINC_HALF_WIDTH = {"sinc_best": 64, "sinc_medium": 32, "sinc_fastest": 16}


@functools.partial(jax.jit, static_argnames=("half_width",))
def _resample_sinc(
    x: jax.Array,
    base: jax.Array,
    frac: jax.Array,
    cutoff: jax.Array,
    *,
    half_width: int,
) -> jax.Array:
    """Bandlimited sinc resampling at arbitrary (non-rational) ratios.

    Parity target: the reference's `samplerate` ``sinc_best/medium/fastest``
    converters (core/audio.py:1050-1052).  Each output sample evaluates a
    Blackman-windowed sinc kernel (cutoff ``min(1, ratio)``) exactly at its
    fractional input position — an (n_out, 2·half_width) gather-and-reduce,
    which XLA fuses into one pass; no filter table or phase quantization.
    """
    n_in = x.shape[-1]
    offsets = jnp.arange(-half_width + 1, half_width + 1)
    src = base[:, None] + offsets[None, :]            # (num, 2W)
    t = frac[:, None] - offsets[None, :]              # fractional distances
    # Blackman window over the kernel support, zero outside.
    u = t / half_width
    win = 0.42 + 0.5 * jnp.cos(jnp.pi * u) + 0.08 * jnp.cos(2 * jnp.pi * u)
    kern = cutoff * jnp.sinc(cutoff * t) * win
    valid = (src >= 0) & (src < n_in) & (jnp.abs(u) <= 1.0)
    kern = jnp.where(valid, kern, 0.0).astype(x.dtype)
    gathered = jnp.take(x, jnp.clip(src, 0, n_in - 1), axis=-1)
    return jnp.einsum(
        "...nk,nk->...n", gathered, kern,
        precision=jax.lax.Precision.HIGHEST,
    )


def _device_res_type(y: Any, res_type: str, orig_sr: float = 2,
                     target_sr: float = 1) -> str:
    """Substitute a device resampler for host-soxr qualities when ``y``
    cannot (tracer) or should not (accelerator-resident) round-trip to
    the host.

    libsoxr runs on the host, so a ``soxr_*`` quality forces a
    device→host pull and a host→device push of the full signal.  Over a
    remote-device link those transfers dwarf everything else: measured on
    the axon tunnel, pulling a 30 s signal costs ~145 ms and pushing the
    CQT downsample ladder back ~410 ms, while the all-device polyphase
    CQT runs in ~58 ms total.  Host arrays on a local CPU backend keep
    exact soxr semantics (reference parity — the goldens are harvested
    there); accelerator-resident arrays and tracers (host code cannot run
    under ``jit`` at all) take the device polyphase path for integer
    rates and windowed-sinc otherwise.
    """
    if not str(res_type).startswith("soxr"):
        return res_type
    on_device = isinstance(y, jax.core.Tracer)
    if not on_device and isinstance(y, jax.Array):
        try:
            on_device = any(d.platform != "cpu" for d in y.devices())
        except Exception:
            on_device = False
    if not on_device:
        return res_type
    sub = (
        "polyphase"
        if int(orig_sr) == orig_sr and int(target_sr) == target_sr
        else "kaiser_best"
    )
    _warn_soxr_substitution(res_type, sub)
    return sub


@functools.lru_cache(maxsize=None)
def _warn_soxr_substitution(requested: str, substituted: str) -> None:
    """One-time (per requested/substituted pair) notice that a host-soxr
    quality was replaced by a device resampler for an accelerator-resident
    input.  lru_cache makes repeat calls free; tracers never reach here
    twice with new pairs, so this cannot grow unbounded."""
    warnings.warn(
        f"res_type={requested!r} runs on the host (libsoxr); the input is "
        f"accelerator-resident, so the device {substituted!r} resampler is "
        "used instead (numerically different filter). Move the array to "
        "host memory (np.asarray) to force exact soxr semantics.",
        stacklevel=3,
    )


def resample(
    y: Any,
    *,
    orig_sr: float,
    target_sr: float,
    res_type: str = "soxr_hq",
    fix: bool = True,
    scale: bool = False,
    axis: int = -1,
    **kwargs: Any,
) -> jax.Array:
    """Resample a time series from ``orig_sr`` to ``target_sr``.

    Behavior parity with the reference ``core/audio.py:1002``; every mode of
    the reference dispatch is supported, most as device kernels.

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)]
        input signal(s)
    orig_sr, target_sr : number > 0
        source and target sampling rates
    res_type : str
        - ``'polyphase'`` — TPU-native strided FIR conv on the MXU
          (``scipy.signal.resample_poly`` parity; integer rates only)
        - ``'fft'``/``'scipy'`` — Fourier resampling (composite-length
          Cooley-Tukey matmul FFT on TPU)
        - ``'soxr_hq/vhq/mq/lq/qq'`` — host libsoxr (reference default).
          Applies to host arrays only: when ``y`` is accelerator-resident
          or traced (under ``jit``), a device resampler (``polyphase`` for
          integer rates, else ``kaiser_best``) is substituted — the
          round-trip would dominate — and a one-time warning is emitted.
        - ``'kaiser_best'``/``'kaiser_fast'`` — windowed-sinc polyphase
        - ``'linear'``/``'zero_order_hold'`` — device gather interpolation
          (non-bandlimited), arbitrary ratios
        - ``'sinc_best/medium/fastest'`` — continuous windowed-sinc
          interpolation at arbitrary ratios
    fix : bool
        trim/pad the output to exactly ``ceil(n * target_sr / orig_sr)``
    scale : bool
        rescale so input and output have approximately equal energy
    axis : int
        axis to resample along
    **kwargs
        forwarded to ``util.fix_length`` when ``fix``

    Returns
    -------
    y_hat : jax.Array
        the resampled signal

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> y = np.asarray(lt.tone(440, duration=1.0))
    >>> lt.resample(y, orig_sr=22050, target_sr=11025,
    ...             res_type='polyphase').shape[-1]
    11025
    """
    if orig_sr <= 0 or target_sr <= 0:
        raise ParameterError(
            f"Invalid sample rates: orig_sr={orig_sr}, target_sr={target_sr} "
            "(must be strictly positive)"
        )
    y = jnp.asarray(y)
    if not jnp.issubdtype(y.dtype, jnp.floating):
        raise ParameterError("Audio data must be floating-point")

    if orig_sr == target_sr:
        return y

    # accelerator-resident / traced inputs: host soxr would force a
    # device round trip (or cannot run at all) — use the device kernels
    res_type = _device_res_type(y, res_type, orig_sr, target_sr)

    ratio = float(target_sr) / orig_sr
    n_samples = int(np.ceil(y.shape[axis] * ratio))

    if res_type in ("scipy", "fft"):
        if axis != -1:
            y_hat = jnp.moveaxis(
                _resample_fft(jnp.moveaxis(y, axis, -1), num=n_samples), -1, axis
            )
        else:
            y_hat = _resample_fft(y, num=n_samples)
    elif res_type in ("polyphase", "kaiser_best", "kaiser_fast"):
        if int(orig_sr) != orig_sr or int(target_sr) != target_sr:
            raise ParameterError(
                "polyphase resampling is only supported for integer-valued "
                "sampling rates."
            )
        gcd = int(np.gcd(int(orig_sr), int(target_sr)))
        y_hat = resample_poly(
            y, int(target_sr) // gcd, int(orig_sr) // gcd, axis=axis
        )
    elif res_type in ("linear", "zero_order_hold") or res_type in _SINC_HALF_WIDTH:
        base, frac = _interp_grid(n_samples, ratio)
        ylast = jnp.moveaxis(y, axis, -1) if axis != -1 else y
        if res_type in _SINC_HALF_WIDTH:
            y_hat = _resample_sinc(
                ylast, base, frac, jnp.float32(min(1.0, ratio)),
                half_width=_SINC_HALF_WIDTH[res_type],
            )
        else:
            y_hat = _resample_interp(
                ylast, base, frac, hold=(res_type == "zero_order_hold")
            )
        if axis != -1:
            y_hat = jnp.moveaxis(y_hat, -1, axis)
    elif res_type.startswith("soxr"):
        from ..io import _soxr

        if _soxr.available():
            y_np = np.asarray(y)
            y_hat = jnp.asarray(
                np.apply_along_axis(
                    _soxr.resample,
                    axis,
                    y_np,
                    in_rate=orig_sr,
                    out_rate=target_sr,
                    quality=res_type,
                )
            )
        else:
            if int(orig_sr) != orig_sr or int(target_sr) != target_sr:
                raise ParameterError(
                    f"res_type={res_type} requires libsoxr for non-integer rates"
                )
            warnings.warn(
                f"libsoxr unavailable; substituting device polyphase for {res_type}",
                stacklevel=2,
            )
            gcd = int(np.gcd(int(orig_sr), int(target_sr)))
            y_hat = resample_poly(
                y, int(target_sr) // gcd, int(orig_sr) // gcd, axis=axis
            )
    else:
        raise ParameterError(f"Unsupported resampling mode: {res_type}")

    if fix:
        y_hat = util.fix_length(y_hat, size=n_samples, axis=axis, **kwargs)
    if scale:
        y_hat = y_hat / np.sqrt(ratio)
    return y_hat.astype(y.dtype)


# ---------------------------------------------------------------------------
# Autocorrelation / LPC (reference core/audio.py:1320,1397)
# ---------------------------------------------------------------------------


def _next_fast_len(n: int) -> int:
    import scipy.fft

    return scipy.fft.next_fast_len(n, real=True)


def autocorrelate(
    y: Any, *, max_size: Optional[int] = None, axis: int = -1
) -> jax.Array:
    """Bounded-lag autocorrelation via the Wiener-Khinchin theorem.

    ``irfft(|rfft(y)|**2)`` truncated to ``max_size`` lags (behavior parity
    with the reference ``core/audio.py:1320``).  On TPU the transform pads to
    a power of two (linear autocorrelation is padding-size-agnostic and
    non-pow2 FFTs lower poorly); CPU keeps the reference's 5-smooth padding.

    Parameters
    ----------
    y : np.ndarray or jax.Array
        input (real or complex)
    max_size : int or None
        number of lags to keep (default: full)
    axis : int
        correlation axis

    Returns
    -------
    ac : jax.Array
        autocorrelation, ``ac[..., 0]`` is the total energy
    """
    y = jnp.asarray(y)
    if max_size is None:
        max_size = y.shape[axis]
    max_size = int(min(max_size, y.shape[axis]))

    # Linear autocorrelation is padding-size-agnostic for any n_pad ≥ 2n−1.
    # On TPU (matmul FFT backend) non-power-of-two FFTs lower to enormous
    # dense-DFT programs — a tempogram-sized fused graph took minutes of
    # remote compile — so pad to a power of two there; the CPU path keeps
    # the reference's 5-smooth next_fast_len rounding.
    from ..ops.fft import _resolved_backend

    n_min = 2 * y.shape[axis] - 1
    if _resolved_backend() == "matmul":
        n_pad = 1 << (n_min - 1).bit_length()
    else:
        n_pad = _next_fast_len(n_min)

    # fft → |·|² → ifft → truncate as ONE program
    return _autocorrelate_core(
        y, n_pad=int(n_pad), max_size=max_size, axis=int(axis)
    )


@functools.partial(jax.jit, static_argnames=("n_pad", "max_size", "axis"))
def _autocorrelate_core(y, *, n_pad, max_size, axis):
    if jnp.issubdtype(y.dtype, jnp.complexfloating):
        powspec = util.abs2(jnp.fft.fft(y, n=n_pad, axis=axis))
        autocorr = jnp.fft.ifft(powspec, n=n_pad, axis=axis)
    else:
        powspec = util.abs2(jnp.fft.rfft(y, n=n_pad, axis=axis))
        autocorr = jnp.fft.irfft(powspec, n=n_pad, axis=axis)

    subslice = [slice(None)] * autocorr.ndim
    subslice[axis] = slice(max_size)
    return autocorr[tuple(subslice)]


@functools.partial(jax.jit, static_argnames=("order",))
def _lpc_burg(y: jax.Array, *, order: int) -> jax.Array:
    """Burg-method LPC over the leading axis, batched on trailing dims.

    Sequential over ``order`` (small), vectorized over everything else —
    ``lax.fori_loop`` replaces the reference numba kernel
    (core/audio.py:1494 __lpc).  Error-buffer shrinking is emulated with
    masks to keep shapes static under jit.
    """
    n = y.shape[0]
    dtype = y.dtype
    epsilon = util.tiny(y)

    fwd = y[1:]  # f_{M-1, k+1}
    bwd = y[:-1]  # b_{M-1, k}
    m = n - 1  # active window length

    batch_shape = y.shape[1:]
    ar = jnp.zeros((order + 1,) + batch_shape, dtype=dtype).at[0].set(1.0)
    den = jnp.sum(fwd**2 + bwd**2, axis=0)

    # index grid for masking the shrinking valid window
    idx = jnp.arange(m).reshape((m,) + (1,) * len(batch_shape))

    def body(i, state):
        ar, fwd, bwd, den, valid = state
        mask = idx < valid
        reflect = -2.0 * jnp.sum(jnp.where(mask, bwd * fwd, 0.0), axis=0) / (
            den + epsilon
        )

        # Levinson-Durbin update: a_j += k * a_{i-j+1}
        ar_rev = jnp.flip(ar, axis=0)
        # shift so that ar_rev aligns a_{i - j + 1} with position j:
        # a_new[j] = a[j] + k * a[i + 1 - j], for j in 1..i+1
        rolled = jnp.roll(ar_rev, shift=i + 2, axis=0)
        j_idx = jnp.arange(order + 1).reshape((order + 1,) + (1,) * len(batch_shape))
        upd = jnp.where(
            (j_idx >= 1) & (j_idx <= i + 1), reflect[None] * rolled, 0.0
        )
        ar = ar + upd

        fwd_new = fwd + reflect[None] * bwd
        bwd_new = bwd + reflect[None] * fwd
        fwd_new = jnp.where(mask, fwd_new, 0.0)
        bwd_new = jnp.where(mask, bwd_new, 0.0)

        q = 1.0 - reflect**2
        # b_{M}[last valid] and f_{M}[first]
        last_b = jnp.take_along_axis(
            bwd_new, jnp.maximum(valid - 1, 0)[None].astype(int), axis=0
        )[0]
        den = q * den - last_b**2 - fwd_new[0] ** 2

        # Shift forward error up by one; shrink window
        fwd_shift = jnp.roll(fwd_new, shift=-1, axis=0)
        valid_new = valid - 1
        mask_new = idx < valid_new
        fwd_shift = jnp.where(mask_new, fwd_shift, 0.0)
        bwd_new = jnp.where(mask_new, bwd_new, 0.0)
        return ar, fwd_shift, bwd_new, den, valid_new

    valid0 = jnp.full(batch_shape, m, dtype=jnp.int32)
    ar, *_ = jax.lax.fori_loop(0, order, body, (ar, fwd, bwd, den, valid0))
    return ar


def lpc(y: Any, *, order: int, axis: int = -1) -> jax.Array:
    """Linear prediction coefficients via Burg's method.

    Behavior parity with the reference ``core/audio.py:1397``; the
    order-sequential recursion runs as a ``lax`` loop, batched over all
    leading dimensions.

    Parameters
    ----------
    y : np.ndarray or jax.Array [shape=(..., n)]
        input signal(s)
    order : int > 0
        LPC order
    axis : int
        time axis

    Returns
    -------
    a : jax.Array [shape=(..., order + 1)]
        prediction filter coefficients, ``a[..., 0] == 1``
    """
    if not util.is_positive_int(order):
        raise ParameterError(f"order={order} must be an integer > 0")
    y = jnp.asarray(y)
    if not jnp.issubdtype(y.dtype, jnp.floating):
        raise ParameterError("Audio data must be floating-point")
    y = jnp.swapaxes(y, axis, 0)
    out = _lpc_burg(y, order=order)
    return jnp.swapaxes(out, 0, axis)


# ---------------------------------------------------------------------------
# Zero crossings (reference core/audio.py:1589-1728)
# ---------------------------------------------------------------------------


def zero_crossings(
    y: Any,
    *,
    threshold: float = 1e-10,
    ref_magnitude: Optional[Union[float, Callable]] = None,
    pad: bool = True,
    zero_pos: bool = True,
    axis: int = -1,
) -> jax.Array:
    """Find sign-change positions in a signal.

    Behavior parity with the reference ``core/audio.py:1621`` (threshold
    clamping, ``zero_pos`` sign convention, optional axis) as a shift-compare
    instead of the reference's numba stencil.

    Parameters
    ----------
    y : np.ndarray or jax.Array
        input signal
    threshold : float >= 0 or None
        magnitudes below this count as zero
    ref_magnitude : float or callable
        scale for ``threshold``
    pad : bool
        mark position 0 as a crossing
    zero_pos : bool
        treat 0 as positive-signed
    axis : int
        analysis axis

    Returns
    -------
    crossings : jax.Array [bool]
        crossing indicator per sample
    """
    y = jnp.asarray(y)
    if threshold is None:
        threshold = 0.0
    if callable(ref_magnitude):
        threshold = threshold * float(ref_magnitude(jnp.abs(y)))
    elif ref_magnitude is not None:
        threshold = threshold * ref_magnitude

    yi = jnp.swapaxes(y, -1, axis)
    if threshold > 0:
        yi = jnp.where(jnp.abs(yi) <= threshold, 0.0, yi)

    if zero_pos:
        sign = jnp.signbit(yi)
    else:
        sign = jnp.sign(yi)

    cross = sign[..., 1:] != sign[..., :-1]
    first = jnp.full_like(cross[..., :1], pad)
    out = jnp.concatenate([first, cross], axis=-1)
    return jnp.swapaxes(out, -1, axis)


# ---------------------------------------------------------------------------
# Signal synthesis (reference core/audio.py:1731-2052)
# ---------------------------------------------------------------------------


def clicks(
    *,
    times: Optional[Any] = None,
    frames: Optional[Any] = None,
    sr: float = 22050,
    hop_length: int = 512,
    click_freq: float = 1000.0,
    click_duration: float = 0.1,
    click: Optional[np.ndarray] = None,
    length: Optional[int] = None,
) -> np.ndarray:
    """Synthesize a click track at given times or frames.

    Parity: core/audio.py:1731 (default 1 kHz, 100 ms exponentially-decaying
    clicks; custom click waveforms supported).

    Parameters
    ----------
    times, frames : array or None
        click positions (seconds, or frames with ``hop_length``)
    sr, hop_length
        timing parameters
    click_freq, click_duration, click : click shape controls
    length : int or None
        total output length

    Returns
    -------
    y : jax.Array
        the click signal
    """
    if times is not None:
        marks = time_to_samples(times, sr=sr)
    elif frames is not None:
        marks = frames_to_samples(frames, hop_length=hop_length)
    else:
        raise ParameterError(
            "clicks() needs event locations: pass times= or frames="
        )

    if click is None:
        click = _exp_decay_blip(sr, click_freq, click_duration)
    else:
        click = np.asarray(click)
        if not np.issubdtype(click.dtype, np.floating):
            raise ParameterError("a custom click waveform must be float")

    blip_len = click.shape[-1]
    if length is None:
        length = int(np.max(marks)) + blip_len
    elif length < 1:
        raise ParameterError(
            f"output length must be at least 1 sample; got {length}"
        )
    else:
        marks = marks[marks < length]

    # Render onto a canvas with blip_len slack so every placement is a
    # full-width slice add (no per-event boundary branch), then trim.
    canvas = np.zeros(click.shape[:-1] + (length + blip_len,),
                      dtype=np.float32)
    for at in np.atleast_1d(marks):
        canvas[..., at : at + blip_len] += click
    return canvas[..., :length]


def _exp_decay_blip(sr: float, freq: float, seconds: float) -> np.ndarray:
    """Default metronome blip: a sinusoid under a 60 dB exponential decay."""
    if seconds <= 0:
        raise ParameterError(f"click_duration={seconds} must be > 0 seconds")
    if freq <= 0:
        raise ParameterError(f"click_freq={freq} must be > 0 Hz")
    n = int(sr * seconds)
    fade = np.exp2(np.linspace(0.0, -10.0, num=n))
    return fade * np.sin((2 * np.pi * freq / sr) * np.arange(n))


def tone(
    frequency: float,
    *,
    sr: float = 22050,
    length: Optional[int] = None,
    duration: Optional[float] = None,
    phi: Optional[float] = None,
) -> np.ndarray:
    """Synthesize a pure sinusoid.

    Parity: core/audio.py:1868.

    Parameters
    ----------
    frequency : float > 0
        tone frequency in Hz
    sr : number > 0
        sampling rate
    length : int or None
        output length in samples (alternative to ``duration``)
    duration : float or None
        output length in seconds
    phi : float or None
        initial phase (default ``-pi/2`` so the tone starts at 0)

    Returns
    -------
    y : jax.Array [shape=(length,)]
        the synthesized tone
    """
    if frequency is None:
        raise ParameterError("tone() needs a frequency in Hz")
    n = _resolve_sample_count(length, duration, sr, who="tone")
    # default phase -pi/2 starts the waveform at zero, rising
    start_phase = -0.5 * np.pi if phi is None else phi
    omega = 2.0 * np.pi * frequency / sr
    return np.cos(omega * np.arange(n) + start_phase)


def _resolve_sample_count(length, duration, sr: float, *, who: str) -> int:
    """Turn a (length | duration) pair into a sample count."""
    if length is not None:
        return int(length)
    if duration is None:
        raise ParameterError(
            f"{who}() needs a size: pass length= (samples) or "
            "duration= (seconds)"
        )
    return int(duration * sr)


def chirp(
    *,
    fmin: float,
    fmax: float,
    sr: float = 22050,
    length: Optional[int] = None,
    duration: Optional[float] = None,
    linear: bool = False,
    phi: Optional[float] = None,
) -> np.ndarray:
    """Synthesize a frequency sweep (chirp).

    Parity: core/audio.py:1940 (linear or logarithmic sweep).

    Parameters
    ----------
    fmin, fmax : float > 0
        start and end frequencies in Hz
    sr : number > 0
        sampling rate
    length : int or None / duration : float or None
        output length (samples or seconds)
    linear : bool
        linear sweep instead of the default logarithmic
    phi : float or None
        initial phase

    Returns
    -------
    y : jax.Array
        the synthesized chirp
    """
    if fmin is None or fmax is None:
        raise ParameterError("chirp() needs both endpoint frequencies "
                             "(fmin and fmax)")
    if length is not None:
        duration = length / sr
    elif duration is None:
        raise ParameterError(
            "chirp() needs a size: pass length= (samples) or "
            "duration= (seconds)"
        )
    start_phase = -0.5 * np.pi if phi is None else phi

    # Phase = 2π ∫ f(t) dt, integrated in closed form for each sweep law
    # (same math as scipy.signal.chirp's linear/logarithmic methods, which
    # the reference delegates to — implemented here so synthesis has no
    # scipy dependency).
    t = np.arange(int(duration * sr)) / sr
    if linear:
        # f(t) = fmin + (fmax - fmin) * t / T
        ramp_rate = (fmax - fmin) / duration
        angle = 2 * np.pi * (fmin * t + 0.5 * ramp_rate * t * t)
    elif fmin == fmax:
        angle = 2 * np.pi * fmin * t
    else:
        # f(t) = fmin * (fmax/fmin)^(t/T)
        growth = fmax / fmin
        angle = (2 * np.pi * fmin * duration / np.log(growth)) * (
            np.power(growth, t / duration) - 1.0
        )
    return np.cos(angle + start_phase)


# ---------------------------------------------------------------------------
# Mu-law (reference core/audio.py:2055-2238)
# ---------------------------------------------------------------------------


def mu_compress(x: Any, *, mu: float = 255, quantize: bool = True) -> jax.Array:
    """mu-law compress a signal in [-1, 1].

    Parity: core/audio.py:2055; with ``quantize`` the output is integer
    codes in ``[-2**(b-1), 2**(b-1))``.

    Parameters
    ----------
    x : array
        input in [-1, 1]
    mu : number > 0
        compander parameter (255 = 8-bit standard)
    quantize : bool
        discretize the output

    Returns
    -------
    x_comp : jax.Array
        compressed (possibly quantized) signal
    """
    if mu <= 0:
        raise ParameterError(
            f"mu-law compression parameter mu={mu} must be strictly positive."
        )
    x = jnp.asarray(x)
    if isinstance(x, jax.core.Tracer):
        return _mu_compress_core(x, mu=float(mu), quantize=bool(quantize))[1]
    # range check + compression in ONE program; only the flag is fetched
    bad, out = _mu_compress_core(x, mu=float(mu), quantize=bool(quantize))
    if bool(bad):
        raise ParameterError("mu-law input x must be in the range [-1, +1].")
    return out


@functools.partial(jax.jit, static_argnames=("mu", "quantize"))
def _mu_compress_core(x, *, mu, quantize):
    bad = jnp.any((x < -1) | (x > 1))
    x_comp = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / np.log1p(mu)

    if quantize:
        bins = jnp.linspace(-1, 1, num=int(1 + mu), endpoint=True)
        return bad, (
            jnp.digitize(x_comp, bins, right=True) - int(mu + 1) // 2
        )
    return bad, x_comp


def mu_expand(x: Any, *, mu: float = 255, quantize: bool = True) -> jax.Array:
    """Invert mu-law compression.

    Parity: core/audio.py:2151; ``quantize=True`` expects integer codes from
    ``mu_compress(..., quantize=True)``.

    Parameters
    ----------
    x : array
        compressed signal
    mu : number > 0
        compander parameter
    quantize : bool
        input is quantized codes

    Returns
    -------
    x_exp : jax.Array
        expanded signal in [-1, 1]
    """
    if mu <= 0:
        raise ParameterError(
            f"Inverse mu-law compression parameter mu={mu} must be strictly positive."
        )
    x = jnp.asarray(x)
    if isinstance(x, jax.core.Tracer):
        return _mu_expand_core(x, mu=float(mu), quantize=bool(quantize))[1]
    bad, out = _mu_expand_core(x, mu=float(mu), quantize=bool(quantize))
    if bool(bad):
        raise ParameterError("Inverse mu-law input x must be in the range [-1, +1].")
    return out


@functools.partial(jax.jit, static_argnames=("mu", "quantize"))
def _mu_expand_core(x, *, mu, quantize):
    if quantize:
        x = x * 2.0 / (1 + mu)
    bad = jnp.any((x < -1) | (x > 1))
    return bad, jnp.sign(x) / mu * (jnp.power(1 + mu, jnp.abs(x)) - 1)
