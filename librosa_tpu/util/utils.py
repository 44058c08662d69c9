"""Array utilities — the substrate layer (L0).

TPU-first re-design of the reference utility layer (``librosa/util/utils.py``).
Array math is implemented with JAX (``jnp``) so every utility is jit-able and
TPU-resident; inherently-sparse / event-style helpers (peak picking output,
frame fixing) run on host NumPy where the reference used numba.

Reference parity notes cite ``/root/reference/librosa/util/utils.py`` lines.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse

from .exceptions import ParameterError

__all__ = [
    "MAX_MEM_BLOCK",
    "frame",
    "valid_audio",
    "valid_int",
    "valid_intervals",
    "is_positive_int",
    "pad_center",
    "expand_to",
    "fix_length",
    "fix_frames",
    "axis_sort",
    "normalize",
    "localmax",
    "localmin",
    "peak_pick",
    "sparsify_rows",
    "buf_to_float",
    "index_to_slice",
    "sync",
    "softmask",
    "tiny",
    "fill_off_diagonal",
    "cyclic_gradient",
    "shear",
    "stack",
    "dtype_r2c",
    "dtype_c2r",
    "count_unique",
    "is_unique",
    "abs2",
    "phasor",
    "interp_broadcast",
]

# Kept for API parity with the reference (util/utils.py:41); XLA/Pallas tiling
# replaces explicit column blocking in this framework.
MAX_MEM_BLOCK = 2**8 * 2**10

_ArrayLike = Union[np.ndarray, jax.Array]


def _asjax(x: Any, dtype: Any = None) -> jax.Array:
    return jnp.asarray(x, dtype=dtype)


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------


def frame(
    x: _ArrayLike,
    *,
    frame_length: int,
    hop_length: int,
    axis: int = -1,
    writeable: bool = False,
    subok: bool = False,
) -> jax.Array:
    """Slice an array into overlapping frames (no copy semantics).

    ``frame(x)[..., j, k]`` is ``x[..., k * hop_length + j]`` for the default
    trailing axis (behavior parity with the reference ``util/utils.py:79``).
    On device this is a static gather XLA folds into downstream ops.

    Parameters
    ----------
    x : input array
    frame_length : int > 0
    hop_length : int > 0
    axis : int
        axis to frame
    writeable : ignored (JAX arrays are immutable)

    Returns
    -------
    frames : jax.Array [shape=(..., frame_length, n_frames) for axis=-1]
    """
    x = jnp.asarray(x)
    if x.shape[axis] < frame_length:
        raise ParameterError(
            f"Input is too short (n={x.shape[axis]:d}) for frame_length={frame_length:d}"
        )
    if hop_length < 1:
        raise ParameterError(f"Invalid hop_length: {hop_length:d}")

    n_frames = 1 + (x.shape[axis] - frame_length) // hop_length

    # Index matrix idx[f, t] = t * hop + f  (shape (frame_length, n_frames)).
    # Layout convention matches the reference (util/utils.py:207-242): for
    # negative axis the frame axis precedes the (new) frame-index axis,
    # (..., frame_length, n_frames); for non-negative axis it's
    # (n_frames, frame_length, ...) — discriminated on the sign of the
    # user-provided axis, exactly as the reference's moveaxis target.
    idx = (
        np.arange(frame_length)[:, None] + hop_length * np.arange(n_frames)[None, :]
    )
    if axis < 0:
        out = jnp.take(x, jnp.asarray(idx), axis=axis)
        if axis != -1:
            # take inserted (frame_length, n_frames) at position axis;
            # result is already in the right place
            pass
        return out
    else:
        out = jnp.take(x, jnp.asarray(idx.T), axis=axis)
        # (..., n_frames, frame_length, ...) with the pair at position axis
        return out


# ---------------------------------------------------------------------------
# Validation
# ---------------------------------------------------------------------------


def valid_audio(y: _ArrayLike, *, mono: bool = False) -> bool:
    """Validate an audio buffer: floating dtype, finite values.

    Parameters
    ----------
    y : np.ndarray or jax.Array
        audio buffer to check
    mono : bool
        additionally require a 1-D (single-channel) signal

    Returns
    -------
    valid : bool
        True if ``y`` passes every check

    Raises
    ------
    ParameterError
        if ``y`` is not an array, not floating-point, contains
        non-finite values, or is multichannel when ``mono=True``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.util.valid_audio(np.zeros(1000, dtype=np.float32))
    True

    Parity: reference util/utils.py:246.
    """
    if isinstance(y, jax.Array):
        if not jnp.issubdtype(y.dtype, jnp.floating):
            raise ParameterError("Audio data must be floating-point")
        if y.ndim == 0:
            raise ParameterError(
                f"Audio data must be at least one-dimensional, given y.shape={y.shape}"
            )
        # Finite-ness check forces a sync; data-dependent, so skip under jit
        if not isinstance(y, jax.core.Tracer) and not bool(
            jnp.all(jnp.isfinite(y))
        ):
            raise ParameterError("Audio buffer is not finite everywhere")
        return True

    y = np.asarray(y)
    if not isinstance(y, np.ndarray):
        raise ParameterError("Audio data must be of type numpy.ndarray")
    if not np.issubdtype(y.dtype, np.floating):
        raise ParameterError("Audio data must be floating-point")
    if y.ndim == 0:
        raise ParameterError(
            f"Audio data must be at least one-dimensional, given y.shape={y.shape}"
        )
    if mono and y.ndim != 1:
        raise ParameterError(f"Invalid shape for monophonic audio: ndim={y.ndim}")
    if not np.isfinite(y).all():
        raise ParameterError("Audio buffer is not finite everywhere")
    return True


def valid_int(x: float, *, cast: Optional[Callable[[float], float]] = None) -> int:
    """Cast a value to an integer via a rounding function.

    Parameters
    ----------
    x : number
        value to convert
    cast : callable or None
        rounding function (default ``np.floor``)

    Returns
    -------
    x_int : int
        ``int(cast(x))``

    Raises
    ------
    ParameterError
        if ``cast`` is not callable

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.util.valid_int(3.7)
    3
    >>> lt.util.valid_int(3.2, cast=np.ceil)
    4

    Parity: reference util/utils.py (valid_int).
    """
    if cast is None:
        cast = np.floor
    if not callable(cast):
        raise ParameterError("cast parameter must be callable")
    return int(cast(x))


def is_positive_int(x: float) -> bool:
    """Check whether a value is a strictly positive integer.

    Parameters
    ----------
    x : number
        value to check

    Returns
    -------
    positive : bool
        True only for integer-typed values greater than zero

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.util.is_positive_int(5)
    True
    >>> lt.util.is_positive_int(2.5)
    False

    Parity: reference util/utils.py (is_positive_int).
    """
    return isinstance(x, (int, np.integer)) and (x > 0)


def valid_intervals(intervals: np.ndarray) -> bool:
    """Validate an array of time intervals.

    Intervals are rows ``[start, end]`` with ``end >= start``.

    Parameters
    ----------
    intervals : np.ndarray [shape=(n, 2)]
        candidate interval array

    Returns
    -------
    valid : bool
        True if the array is well-formed

    Raises
    ------
    ParameterError
        if the shape is not (n, 2) or any interval runs backwards

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.util.valid_intervals(np.array([[0.0, 1.0], [0.5, 2.0]]))
    True

    Parity: reference util/utils.py (valid_intervals).
    """
    intervals = np.asarray(intervals)
    if intervals.ndim != 2 or intervals.shape[-1] != 2:
        raise ParameterError("intervals must have shape (n, 2)")
    if np.any(intervals[:, 0] > intervals[:, 1]):
        raise ParameterError("intervals cannot have negative duration")
    return True


# ---------------------------------------------------------------------------
# Padding / reshaping
# ---------------------------------------------------------------------------


def pad_center(
    data: _ArrayLike, *, size: int, axis: int = -1, **kwargs: Any
) -> jax.Array:
    """Pad an array to a target size, centering the data.

    Used to center windows inside FFT frames: ``n_fft - size`` padding
    is split evenly (left-heavy remainder goes right).

    Parameters
    ----------
    data : array-like
        array to pad
    size : int >= data.shape[axis]
        target length
    axis : int
        axis to pad
    **kwargs
        forwarded to ``jnp.pad`` (e.g. ``mode``)

    Returns
    -------
    padded : jax.Array
        ``data`` centered in a length-``size`` axis

    Raises
    ------
    ParameterError
        if ``size`` is smaller than the input length

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> np.asarray(lt.util.pad_center(np.ones(3), size=7)).tolist()
    [0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0]

    Parity: reference util/utils.py:387.
    """
    data = jnp.asarray(data)
    kwargs.setdefault("mode", "constant")
    n = data.shape[axis]
    lpad = int((size - n) // 2)
    lengths = [(0, 0)] * data.ndim
    lengths[axis] = (lpad, int(size - n - lpad))
    if lpad < 0:
        raise ParameterError(
            f"Target size ({size:d}) must be at least input size ({n:d})"
        )
    return jnp.pad(data, lengths, **kwargs)


def expand_to(
    x: _ArrayLike, *, ndim: int, axes: Union[int, Sequence[int]]
) -> jax.Array:
    """Expand an array to a target rank, placing its axes explicitly.

    Inserts singleton dimensions so that input axis ``i`` lands at
    position ``axes[i]`` of an ``ndim``-dimensional result — the
    broadcasting workhorse behind multichannel feature code.

    Parameters
    ----------
    x : array-like
        input array
    ndim : int >= x.ndim
        target number of dimensions
    axes : int or sequence of int
        output position of each input axis

    Returns
    -------
    expanded : jax.Array
        view of ``x`` with singleton axes inserted

    Raises
    ------
    ParameterError
        if ``axes`` doesn't match ``x.ndim`` or exceeds ``ndim``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.util.expand_to(np.ones(3), ndim=3, axes=1).shape
    (1, 3, 1)

    Parity: reference util/utils.py:461.
    """
    x = jnp.asarray(x)
    try:
        axes_t = tuple(axes)  # type: ignore[arg-type]
    except TypeError:
        axes_t = (axes,)  # type: ignore[assignment]
    if len(axes_t) != x.ndim:
        raise ParameterError(
            f"Shape mismatch between axes={axes_t} and input x.shape={x.shape}"
        )
    if ndim < x.ndim:
        raise ParameterError(
            f"Cannot expand x.shape={x.shape} to fewer dimensions ndim={ndim}"
        )
    shape = [1] * ndim
    for i, axi in enumerate(axes_t):
        shape[axi] = x.shape[i]
    return x.reshape(shape)


def fix_length(data: _ArrayLike, *, size: int, axis: int = -1, **kwargs: Any) -> jax.Array:
    """Force an array to exactly ``size`` elements along ``axis``.

    Longer inputs are truncated; shorter inputs are right-padded
    (zeros by default).

    Parameters
    ----------
    data : array-like
        array to adjust
    size : int > 0
        target length
    axis : int
        axis to adjust
    **kwargs
        forwarded to ``jnp.pad`` when lengthening

    Returns
    -------
    fixed : jax.Array
        array with ``shape[axis] == size``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> np.asarray(lt.util.fix_length(np.arange(5.0), size=3)).tolist()
    [0.0, 1.0, 2.0]
    >>> np.asarray(lt.util.fix_length(np.arange(3.0), size=5)).tolist()
    [0.0, 1.0, 2.0, 0.0, 0.0]

    Parity: reference util/utils.py:532.
    """
    data = jnp.asarray(data)
    kwargs.setdefault("mode", "constant")
    n = data.shape[axis]
    if n > size:
        slices = [slice(None)] * data.ndim
        slices[axis] = slice(0, size)
        return data[tuple(slices)]
    elif n < size:
        lengths = [(0, 0)] * data.ndim
        lengths[axis] = (0, size - n)
        return jnp.pad(data, lengths, **kwargs)
    return data


def fix_frames(
    frames: _ArrayLike,
    *,
    x_min: Optional[int] = 0,
    x_max: Optional[int] = None,
    pad: bool = True,
) -> np.ndarray:
    """Clip, deduplicate, and optionally pad a frame-index list.

    Out-of-range frames are removed; with ``pad=True`` the endpoints
    ``x_min`` / ``x_max`` are added so the list covers the full span.
    Host-side index math.

    Parameters
    ----------
    frames : array-like of int
        frame indices
    x_min : int or None
        minimum allowed value (and left pad endpoint)
    x_max : int or None
        maximum allowed value (and right pad endpoint)
    pad : bool
        include the endpoints in the result

    Returns
    -------
    fixed : np.ndarray [dtype=int]
        sorted, unique, clipped frame indices

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.util.fix_frames([1, 2, 5, 99], x_min=0, x_max=10).tolist()
    [0, 1, 2, 5, 10]

    Parity: util/utils.py:591.
    """
    frames = np.asarray(frames)
    if np.any(frames < 0):
        raise ParameterError("Negative frame index detected")
    if pad and (x_min is not None or x_max is not None):
        frames = np.clip(frames, x_min, x_max)
    if pad:
        pad_data = []
        if x_min is not None:
            pad_data.append(x_min)
        if x_max is not None:
            pad_data.append(x_max)
        frames = np.concatenate((np.asarray(pad_data), frames))
    if x_min is not None:
        frames = frames[frames >= x_min]
    if x_max is not None:
        frames = frames[frames <= x_max]
    unique: np.ndarray = np.unique(frames).astype(int)
    return unique


def axis_sort(
    S: _ArrayLike,
    *,
    axis: int = -1,
    index: bool = False,
    value: Optional[Callable] = None,
):
    """Sort the rows or columns of a matrix by peak position.

    With the default ``axis=-1`` the *columns* are reordered so their
    argmax positions ascend; ``axis=0`` reorders rows the same way.
    Useful for visualizing learned bases (e.g. NMF components).

    Parameters
    ----------
    S : np.ndarray [ndim=2]
        matrix to sort
    axis : int
        which axis to reorder
    index : bool
        also return the permutation
    value : callable or None
        peak statistic (default ``argmax``)

    Returns
    -------
    S_sorted : jax.Array
        reordered matrix
    idx : np.ndarray [optional]
        permutation applied, when ``index=True``

    Raises
    ------
    ParameterError
        for non-2D input

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> S = np.array([[0.0, 1.0], [1.0, 0.0]])
    >>> np.asarray(lt.util.axis_sort(S)).tolist()
    [[1.0, 0.0], [0.0, 1.0]]

    Parity: reference util/utils.py:696.
    """
    if value is None:
        value = jnp.argmax
    S = jnp.asarray(S)
    if S.ndim != 2:
        raise ParameterError("axis_sort is only defined for 2D arrays")
    bin_idx = value(S, axis=np.mod(1 - axis, S.ndim))
    idx = jnp.argsort(bin_idx)
    sort_slice = [slice(None)] * S.ndim
    sort_slice[axis] = idx  # type: ignore[call-overload]
    if index:
        return S[tuple(sort_slice)], idx
    return S[tuple(sort_slice)]


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def _dtype_of(x: Any) -> np.dtype:
    if hasattr(x, "dtype"):
        return np.dtype(x.dtype)
    return np.asarray(x).dtype


def tiny(x: Any) -> float:
    """Smallest positive usable number for the dtype of ``x``.

    Used as a safe denominator / log floor: returns the ``tiny``
    attribute of the dtype's finfo (float dtypes keep their own
    precision; integer inputs promote to float32).

    Parameters
    ----------
    x : number or np.ndarray or jax.Array
        value whose dtype determines the result

    Returns
    -------
    tiny_value : float
        smallest positive normal number of the corresponding dtype

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> bool(lt.util.tiny(np.zeros(3, dtype=np.float64))
    ...      == np.finfo(np.float64).tiny)
    True

    Parity: reference util/utils.py:1935.
    """
    dtype = _dtype_of(x)
    if np.issubdtype(dtype, np.floating) or np.issubdtype(dtype, np.complexfloating):
        return float(np.finfo(dtype).tiny)
    return float(np.finfo(np.float32).tiny)


def normalize(
    S: _ArrayLike,
    *,
    norm: Optional[float] = np.inf,
    axis: Optional[int] = 0,
    threshold: Optional[float] = None,
    fill: Optional[bool] = None,
) -> jax.Array:
    """Normalize an array along an axis (lp / infinity / peak norms).

    Parity: util/utils.py:797, including the ``threshold`` (leave small
    columns unnormalized) and ``fill`` semantics.

    Parameters
    ----------
    S : input array
    norm : float, np.inf, -np.inf, 0, or None
        norm order (inf = peak); None is a no-op
    axis : int or None
        normalization axis
    threshold : float > 0 or None
        norms below this are not normalized
    fill : bool or None
        None leaves sub-threshold columns as-is; False zeroes them; True
        fills with the uniform unit vector

    Returns
    -------
    S_norm : jax.Array
    """
    if threshold is None:
        threshold = tiny(S)
    elif threshold <= 0:
        raise ParameterError(f"threshold={threshold} must be strictly positive")
    if fill not in [None, False, True]:
        raise ParameterError(f"fill={fill} must be None or boolean")

    S = jnp.asarray(S)
    if not (
        jnp.issubdtype(S.dtype, jnp.floating)
        or jnp.issubdtype(S.dtype, jnp.complexfloating)
    ):
        raise ParameterError("Input must be floating point")

    mag = jnp.abs(S).astype(jnp.result_type(S.real.dtype, jnp.float32))

    fill_norm = 1.0
    if norm is None:
        return S
    elif norm == np.inf:
        length = jnp.max(mag, axis=axis, keepdims=True)
    elif norm == -np.inf:
        length = jnp.min(mag, axis=axis, keepdims=True)
    elif norm == 0:
        if fill is True:
            raise ParameterError("Cannot normalize with norm=0 and fill=True")
        length = jnp.sum(mag > 0, axis=axis, keepdims=True).astype(mag.dtype)
    elif np.issubdtype(type(norm), np.number) and norm > 0:
        length = jnp.sum(mag**norm, axis=axis, keepdims=True) ** (1.0 / norm)
        if axis is None:
            fill_norm = mag.size ** (-1.0 / norm)
        else:
            fill_norm = mag.shape[axis] ** (-1.0 / norm)
    else:
        raise ParameterError(f"Unsupported norm: {repr(norm)}")

    small_idx = length < threshold
    if fill is None:
        length = jnp.where(small_idx, 1.0, length)
        return S / length
    elif fill:
        length = jnp.where(small_idx, jnp.nan, length)
        Snorm = S / length
        return jnp.where(jnp.isnan(Snorm), fill_norm, Snorm)
    else:
        length = jnp.where(small_idx, jnp.inf, length)
        return S / length


# ---------------------------------------------------------------------------
# Local extrema (shift-compare; reference numba stencils util/utils.py:1028-1056)
# ---------------------------------------------------------------------------


def localmax(x: _ArrayLike, *, axis: int = 0) -> jax.Array:
    """Boolean mask of local maxima (``x[i] > x[i-1]`` and ``x[i] >= x[i+1]``).

    First elements are never maxima; last elements are maxima when they
    exceed their left neighbor.  Computed as a shift-compare (the
    reference uses a numba stencil, ``util/utils.py:1060``).

    Parameters
    ----------
    x : np.ndarray or jax.Array
        input array
    axis : int
        axis along which to detect maxima

    Returns
    -------
    mask : jax.Array [bool, same shape as x]

    See Also
    --------
    localmin, peak_pick

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> np.asarray(lt.util.localmax(np.array([1, 3, 2, 4, 4, 0]), axis=-1))
    array([False,  True, False,  True, False, False])
    """
    x = jnp.asarray(x)
    xi = jnp.swapaxes(x, -1, axis)
    prev = xi[..., :-1]
    nxt = xi[..., 1:]
    gt_prev = jnp.concatenate(
        [jnp.zeros_like(xi[..., :1], dtype=bool), xi[..., 1:] > prev], axis=-1
    )
    ge_next = jnp.concatenate(
        [xi[..., :-1] >= nxt, jnp.ones_like(xi[..., :1], dtype=bool)], axis=-1
    )
    out = gt_prev & ge_next
    return jnp.swapaxes(out, -1, axis)


def localmin(x: _ArrayLike, *, axis: int = 0) -> jax.Array:
    """Boolean mask of local minima (``x[i] < x[i-1]`` and ``x[i] <= x[i+1]``).

    The mirror of :func:`localmax` (reference ``util/utils.py:1121``),
    used e.g. for trough selection in YIN.

    Parameters
    ----------
    x : np.ndarray or jax.Array
        input array
    axis : int
        axis along which to detect minima

    Returns
    -------
    mask : jax.Array [bool, same shape as x]

    See Also
    --------
    localmax

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> np.asarray(lt.util.localmin(np.array([3, 1, 2, 0, 0, 5]), axis=-1))
    array([False,  True, False,  True, False, False])
    """
    x = jnp.asarray(x)
    xi = jnp.swapaxes(x, -1, axis)
    prev = xi[..., :-1]
    nxt = xi[..., 1:]
    lt_prev = jnp.concatenate(
        [jnp.zeros_like(xi[..., :1], dtype=bool), xi[..., 1:] < prev], axis=-1
    )
    le_next = jnp.concatenate(
        [xi[..., :-1] <= nxt, jnp.ones_like(xi[..., :1], dtype=bool)], axis=-1
    )
    out = lt_prev & le_next
    return jnp.swapaxes(out, -1, axis)


# ---------------------------------------------------------------------------
# Peak picking
# ---------------------------------------------------------------------------


def _peak_pick_greedy_1d(
    x: np.ndarray,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
) -> np.ndarray:
    """Greedy peak picker over one envelope (host NumPy).

    Behavioral parity with the reference numba kernel util/utils.py:1188.
    Single onset envelopes are tiny, so host execution avoids device
    dispatch latency; batched inputs route to the ``lax.scan`` kernels in
    ``librosa_tpu.ops.peaks`` (see ``peak_pick``).
    """
    n_frames = x.shape[0]
    peaks = np.zeros(n_frames, dtype=bool)
    if n_frames == 0:
        return peaks
    p0 = x[0] >= np.max(x[: min(post_max, n_frames)])
    p0 &= x[0] >= np.mean(x[: min(post_avg, n_frames)]) + delta
    peaks[0] = p0
    n = wait + 1 if p0 else 1
    while n < n_frames:
        maxn = np.max(x[max(0, n - pre_max) : min(n + post_max, n_frames)])
        if x[n] != maxn:
            n += 1
            continue
        avgn = np.mean(x[max(0, n - pre_avg) : min(n + post_avg, n_frames)])
        if x[n] < avgn + delta:
            n += 1
            continue
        peaks[n] = True
        n += wait + 1
    return peaks


def _peak_pick_dp_1d(
    x: np.ndarray,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
    count: bool,
) -> np.ndarray:
    """Optimal peak picker by DP. Parity: util/utils.py:1225 (__peak_pick_dp)."""
    n_frames = len(x)
    values = np.zeros(n_frames + 1)
    pointers = np.zeros(n_frames + 1, dtype=np.int64)
    taken = np.zeros(n_frames + 1, dtype=bool)
    cumulate = np.cumsum(x)
    values[-1] = 0
    pointers[-1] = -1
    for n in range(n_frames - 1, -1, -1):
        values[n] = values[n + 1]
        pointers[n] = n + 1
        maxn = np.max(x[max(0, n - pre_max) : min(n + post_max, n_frames)])
        if x[n] < maxn:
            continue
        idx_prev = max(0, n - pre_avg)
        idx_post = min(n + post_avg, n_frames)
        if idx_prev == 0:
            avgn = cumulate[idx_post - 1] / idx_post
        else:
            avgn = (cumulate[idx_post - 1] - cumulate[idx_prev - 1]) / (
                idx_post - idx_prev
            )
        v = 1.0 if count else x[n]
        next_ptr = min(n_frames, n + wait + 1)
        if x[n] >= avgn + delta and values[next_ptr] + v > values[n + 1]:
            values[n] = values[next_ptr] + v
            pointers[n] = next_ptr
            taken[n] = True
    peaks = np.zeros(n_frames, dtype=bool)
    n = 0
    while pointers[n] >= 0:
        peaks[n] = taken[n]
        n = pointers[n]
    return peaks


def peak_pick(
    x: _ArrayLike,
    *,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
    sparse: bool = True,
    method: str = "greedy",
    axis: int = -1,
) -> np.ndarray:
    """Pick peaks in an onset-strength-like envelope.

    A sample is a peak if it is the maximum over a local window, exceeds the
    local mean by ``delta``, and is at least ``wait`` samples after the
    previous peak (behavior parity with the reference ``util/utils.py:1326``,
    including the ``dp_count``/``dp_value`` optimal variants).  Batched
    inputs run as wait-countdown ``lax.scan`` kernels (``ops/peaks``).

    Parameters
    ----------
    x : np.ndarray
        envelope(s); the last axis is scanned
    pre_max, post_max : int
        max-window extent (before / after)
    pre_avg, post_avg : int
        mean-window extent
    delta : float >= 0
        required margin over the local mean
    wait : int >= 0
        minimum spacing between peaks
    sparse : bool
        return indices (1-D input only) or a boolean mask
    method : 'greedy', 'dp_count', or 'dp_value'
        greedy scan, or DP maximizing count / total height
    axis : int
        scan axis

    Returns
    -------
    peaks : np.ndarray
        peak indices (sparse) or boolean mask
    """
    x = np.asarray(x)
    if sparse and x.ndim != 1:
        raise ParameterError("sparse=True (default) does not support "
                             f"input with ndim={x.ndim}. Set sparse=False.")
    if pre_max < 0:
        raise ParameterError("pre_max must be non-negative")
    if pre_avg < 0:
        raise ParameterError("pre_avg must be non-negative")
    if delta < 0:
        raise ParameterError("delta must be non-negative")
    if wait < 0:
        raise ParameterError("wait must be non-negative")
    if post_max <= 0:
        raise ParameterError("post_max must be positive")
    if post_avg <= 0:
        raise ParameterError("post_avg must be positive")

    pre_max = valid_int(pre_max, cast=np.ceil)
    post_max = valid_int(post_max, cast=np.ceil)
    pre_avg = valid_int(pre_avg, cast=np.ceil)
    post_avg = valid_int(post_avg, cast=np.ceil)
    wait = valid_int(wait, cast=np.ceil)

    if method not in ("greedy", "dp_count", "dp_value"):
        raise ParameterError(f"Unsupported method: {method}")

    xm = np.moveaxis(x, axis, -1)
    flat = xm.reshape(-1, xm.shape[-1])
    if flat.shape[0] > 1:
        # Batched envelopes: scan kernels on device, no per-frame Python.
        from ..ops import peaks as _peaks

        if method == "greedy":
            out = np.asarray(
                _peaks.greedy_mask(
                    jnp.asarray(flat, dtype=jnp.float32),
                    pre_max=pre_max, post_max=post_max, pre_avg=pre_avg,
                    post_avg=post_avg, delta=float(delta), wait=wait,
                )
            )
        else:
            taken = _peaks.dp_values(
                jnp.asarray(flat, dtype=jnp.float32),
                pre_max=pre_max, post_max=post_max, pre_avg=pre_avg,
                post_avg=post_avg, delta=float(delta), wait=wait,
                count=(method == "dp_count"),
            )
            out = _peaks.dp_mask(taken, wait)
    else:
        out = np.zeros_like(flat, dtype=bool)
        for i in range(flat.shape[0]):
            if method == "greedy":
                out[i] = _peak_pick_greedy_1d(
                    flat[i].astype(np.float64), pre_max, post_max, pre_avg,
                    post_avg, delta, wait,
                )
            else:
                out[i] = _peak_pick_dp_1d(
                    flat[i].astype(np.float64), pre_max, post_max, pre_avg,
                    post_avg, delta, wait, method == "dp_count",
                )
    mask = np.moveaxis(out.reshape(xm.shape), -1, axis)
    if sparse:
        return np.flatnonzero(mask)
    return mask


# ---------------------------------------------------------------------------
# Sparsification / aggregation
# ---------------------------------------------------------------------------


def sparsify_rows(
    x: _ArrayLike, *, quantile: float = 0.01, dtype: Any = None
) -> scipy.sparse.csr_matrix:
    """Zero out small entries per row, keeping the top (1 - quantile)
    energy mass, as a CSR matrix.

    Parity: util/utils.py:1500 (used for CQT basis sparsification; the TPU
    CQT keeps bases dense and uses this only for thresholding parity).

    Parameters
    ----------
    x : 1-D or 2-D array
    quantile : float in [0, 1)
        fraction of per-row magnitude mass to discard
    dtype : output dtype

    Returns
    -------
    x_sparse : scipy.sparse.csr_matrix
    """
    x = np.asarray(x)
    if x.ndim == 1:
        x = x.reshape((1, -1))
    elif x.ndim > 2:
        raise ParameterError(
            f"Input must have 2 or fewer dimensions. Provided x.shape={x.shape}."
        )
    if not 0.0 <= quantile < 1:
        raise ParameterError(f"Invalid quantile {quantile:.2f}")
    if dtype is None:
        dtype = x.dtype

    x_sparse = scipy.sparse.lil_matrix(x.shape, dtype=dtype)
    mags = np.abs(x)
    norms = np.sum(mags, axis=1, keepdims=True)
    mag_sort = np.sort(mags, axis=1)
    cumulative_mag = np.cumsum(mag_sort / norms, axis=1)
    threshold_idx = np.argmin(cumulative_mag < quantile, axis=1)
    for i, j in enumerate(threshold_idx):
        idx = np.where(mags[i] >= mag_sort[i, j])
        x_sparse[i, idx] = x[i, idx]
    return x_sparse.tocsr()


def index_to_slice(
    idx: _ArrayLike,
    *,
    idx_min: Optional[int] = None,
    idx_max: Optional[int] = None,
    step: Optional[int] = None,
    pad: bool = True,
) -> list:
    """Convert an index array into a list of contiguous slices.

    Consecutive index values become ``slice(start, end)`` pairs, after
    :func:`fix_frames`-style clipping/padding of the boundaries.

    Parameters
    ----------
    idx : array-like of int
        boundary indices
    idx_min, idx_max : int or None
        clip range (and pad endpoints when ``pad=True``)
    step : int or None
        slice step
    pad : bool
        include the clip endpoints as boundaries

    Returns
    -------
    slices : list of slice
        one slice per adjacent boundary pair

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> [(int(s.start), int(s.stop)) for s in
    ...  lt.util.index_to_slice(np.array([2, 5, 8]))]
    [(2, 5), (5, 8)]

    Parity: reference util/utils.py:1632.
    """
    idx_fixed = fix_frames(idx, x_min=idx_min, x_max=idx_max, pad=pad)
    return [slice(start, end, step) for (start, end) in zip(idx_fixed, idx_fixed[1:])]


def sync(
    data: _ArrayLike,
    idx: Union[Sequence, np.ndarray],
    *,
    aggregate: Optional[Callable] = None,
    pad: bool = True,
    axis: int = -1,
) -> jax.Array:
    """Aggregate an array between boundary indices or slices.

    Parity: util/utils.py:1691 — e.g. beat-synchronous feature aggregation.

    Parameters
    ----------
    data : input array
    idx : iterable of int or slice
        segment boundaries
    aggregate : callable
        segment reduction (default mean)
    pad : bool
        include the implicit leading/trailing boundaries
    axis : int
        aggregation axis

    Returns
    -------
    data_sync : np.ndarray
        one aggregated column per segment
    """
    if aggregate is None:
        aggregate = jnp.mean
    data = jnp.asarray(data)
    shape = list(data.shape)

    idx_arr = np.asarray(idx, dtype=object) if isinstance(idx, list) else idx
    if isinstance(idx, (list, np.ndarray)) and len(idx) > 0 and isinstance(
        (idx[0] if len(idx) else None), slice
    ):
        slices = list(idx)
    else:
        idx_np = np.asarray(idx)
        if idx_np.ndim != 1 or not np.issubdtype(idx_np.dtype, np.integer):
            raise ParameterError(f"Invalid index set: {idx}")
        slices = index_to_slice(idx_np, idx_min=0, idx_max=shape[axis], pad=pad)

    # one jitted program per (boundaries, aggregate) config: the per-slice
    # aggregate + concat loop otherwise costs ~3 dispatches per segment.
    # numpy reducers map to their jnp twins (np.median would materialize
    # tracers); exotic aggregates keep the eager path.
    _jnp_twin = {
        np.mean: jnp.mean, np.max: jnp.max, np.min: jnp.min,
        np.median: jnp.median, np.sum: jnp.sum, np.average: jnp.mean,
    }
    agg_fn = _jnp_twin.get(aggregate, aggregate)
    simple = all(s.step in (None, 1) for s in slices)
    if simple and (agg_fn is not aggregate or getattr(
            agg_fn, "__module__", "").startswith("jax")):
        n = shape[axis]
        bounds = tuple(
            (0 if s.start is None else max(0, min(int(s.start), n)),
             n if s.stop is None else max(0, min(int(s.stop), n)))
            for s in slices
        )
        return _sync_core(data, bounds=bounds, axis=int(axis), agg_fn=agg_fn)

    agg_slices = []
    full_slice = [slice(None)] * data.ndim
    for segment in slices:
        full_slice[axis] = segment
        agg_slices.append(
            aggregate(data[tuple(full_slice)], axis=axis, keepdims=True)
        )
    return jnp.concatenate(agg_slices, axis=axis)


@functools.partial(jax.jit, static_argnames=("bounds", "axis", "agg_fn"))
def _sync_core(data, *, bounds, axis, agg_fn):
    agg_slices = []
    full_slice = [slice(None)] * data.ndim
    for start, stop in bounds:
        full_slice[axis] = slice(start, stop)
        agg_slices.append(
            agg_fn(data[tuple(full_slice)], axis=axis, keepdims=True)
        )
    return jnp.concatenate(agg_slices, axis=axis)


def softmask(
    X: _ArrayLike, X_ref: _ArrayLike, *, power: float = 1, split_zeros: bool = False
) -> jax.Array:
    """Ratio soft mask ``X**power / (X**power + X_ref**power)``.

    Computed in log space for numerical stability; ``power=np.inf`` gives a
    hard mask, and ``split_zeros`` splits all-zero positions evenly
    (behavior parity with the reference ``util/utils.py:1817``).

    Parameters
    ----------
    X : non-negative array
        target energies
    X_ref : non-negative array
        reference energies (broadcastable to ``X``)
    power : float > 0 or np.inf
        mask exponent
    split_zeros : bool
        assign 0.5 where both inputs are zero

    Returns
    -------
    mask : jax.Array in [0, 1]
    """
    X = jnp.asarray(X)
    X_ref = jnp.asarray(X_ref)
    if X.shape != X_ref.shape:
        raise ParameterError(f"Shape mismatch: {X.shape}!={X_ref.shape}")
    # value validation only outside jit tracing (data-dependent)
    if not isinstance(X, jax.core.Tracer) and not isinstance(
        X_ref, jax.core.Tracer
    ):
        if bool(jnp.any(X < 0)) or bool(jnp.any(X_ref < 0)):
            raise ParameterError("X and X_ref must be non-negative")
    if power <= 0:
        raise ParameterError("power must be strictly positive")

    dtype = X.dtype
    if dtype not in (jnp.float16, jnp.float32, jnp.float64, jnp.bfloat16):
        raise ParameterError("data type error")

    Z = jnp.maximum(X, X_ref).astype(dtype)
    bad_idx = Z < np.finfo(np.dtype(dtype) if dtype != jnp.bfloat16 else np.float32).tiny
    Z = jnp.where(bad_idx, 1.0, Z)

    if np.isfinite(power):
        ref_mask = (X_ref / Z) ** power
        good_mask = ~bad_idx
        mask = (X / Z) ** power
        mask = mask / (mask + ref_mask)
        fill_value = 0.5 if split_zeros else 0.0
        mask = jnp.where(good_mask, mask, fill_value)
    else:
        mask = (X > X_ref).astype(dtype)
        if split_zeros:
            mask = jnp.where(bad_idx, 0.5, mask)
        else:
            mask = jnp.where(bad_idx, 0.0, mask)
    return mask


def fill_off_diagonal(
    x: np.ndarray, *, radius: float, value: float = 0
) -> None:
    """Zero (or set) every cell outside a band around the main diagonal.

    Operates in place on a host NumPy array; ``radius`` is a fraction
    of the shorter matrix side.  Used to constrain DTW-style cost
    matrices (Sakoe-Chiba band).

    Parameters
    ----------
    x : np.ndarray [ndim>=2]
        matrix to modify in place
    radius : float in (0, 1]
        half-width of the preserved band, relative to min(n, m)
    value : float
        fill value outside the band

    Returns
    -------
    None
        ``x`` is modified in place

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> x = np.ones((4, 4))
    >>> lt.util.fill_off_diagonal(x, radius=0.25)
    >>> x[0].tolist()
    [1.0, 0.0, 0.0, 0.0]

    Parity: reference util/utils.py:2003.
    """
    nx, ny = x.shape[-2:]
    minval = min(nx, ny)
    if isinstance(radius, float) and radius < 1:
        radius = int(radius * minval)
    radius = int(radius)
    idx_u = np.triu_indices_from(x[..., :, :].reshape(-1, nx, ny)[0], k=radius)
    idx_l = np.tril_indices_from(x.reshape(-1, nx, ny)[0], k=-radius)
    flat = x.reshape(-1, nx, ny)
    for mat in flat:
        mat[idx_u] = value
        mat[idx_l] = value
    if nx < ny:
        for mat in flat:
            mat[:, minval - radius :] = value
    elif ny < nx:
        for mat in flat:
            mat[minval - radius :, :] = value


def band_mask(nx: int, ny: int, *, radius: float) -> np.ndarray:
    """Boolean mask of a Sakoe-Chiba band (True = inside the band).

    The diagonal constraint region used by banded DTW: cell ``(i, j)``
    is inside when the scaled distance from the main diagonal is below
    ``radius``.  TPU-native companion to :func:`fill_off_diagonal` —
    masks stay dense on device instead of mutating matrices in place.

    Parameters
    ----------
    nx, ny : int > 0
        mask shape
    radius : float
        band half-width; values < 1 are interpreted as a fraction of
        ``min(nx, ny)``

    Returns
    -------
    mask : np.ndarray [shape=(nx, ny), dtype=bool]

    See Also
    --------
    fill_off_diagonal, librosa_tpu.sequence.dtw
    """
    minval = min(nx, ny)
    if isinstance(radius, float) and radius < 1:
        radius = int(radius * minval)
    radius = int(radius)
    i = np.arange(nx)[:, None]
    j = np.arange(ny)[None, :]
    mask = (j - i < radius) & (i - j < radius)
    if nx < ny:
        mask[:, minval - radius :] = False
    elif ny < nx:
        mask[minval - radius :, :] = False
    return mask


def cyclic_gradient(
    data: _ArrayLike, *, edge_order: int = 1, axis: int = -1
) -> jax.Array:
    """Gradient of a cyclic signal (wrap-around boundary).

    Equivalent to ``np.gradient`` on the array extended periodically,
    so edge derivatives use neighbors across the wrap point.

    Parameters
    ----------
    data : array-like
        samples of a periodic signal
    edge_order : {1, 2}
        accepted for signature parity with ``np.gradient``
    axis : int
        axis along which to differentiate

    Returns
    -------
    grad : jax.Array
        cyclic gradient of ``data``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> x = np.sin(2 * np.pi * np.arange(8) / 8)
    >>> g = np.asarray(lt.util.cyclic_gradient(x))
    >>> bool(np.allclose(g[0], (x[1] - x[-1]) / 2))   # wraps at the edge
    True

    Parity: reference util/utils.py:2070.
    """
    data = jnp.asarray(data)
    gradient_order = min(data.shape[axis] - 1, edge_order)
    padding = [(0, 0)] * data.ndim
    padding[axis] = (gradient_order, gradient_order)
    data_pad = jnp.pad(data, padding, mode="wrap")
    # edge_order only affects the padded boundary cells, which are sliced
    # away below; interior cells are centered differences either way
    grad = jnp.gradient(data_pad, axis=axis)
    slices = [slice(None)] * data.ndim
    slices[axis] = slice(gradient_order, -gradient_order)
    return grad[tuple(slices)]


def shear(X: _ArrayLike, *, factor: int = 1, axis: int = -1) -> jax.Array:
    """Shear a 2-D matrix by circularly rolling rows or columns.

    With the default ``axis=-1`` each column ``X[:, n]`` rolls down by
    ``factor * n``; with ``axis=0`` each row rolls instead — the
    operation that converts between recurrence and lag coordinates.
    Implemented as one modular gather (the reference uses a dense
    column-roll loop, ``util/utils.py:2136``).

    Parameters
    ----------
    X : np.ndarray or jax.Array [shape=(d, n)]
        input matrix
    factor : int
        roll step per row/column (may be negative)
    axis : int
        which axis indexes the progressive roll

    Returns
    -------
    X_shear : jax.Array, same shape as ``X``

    See Also
    --------
    librosa_tpu.segment.recurrence_to_lag

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> E = np.eye(3)
    >>> np.asarray(lt.util.shear(E, factor=1, axis=-1))
    array([[1., 0., 0.],
           [0., 0., 1.],
           [0., 1., 0.]], dtype=float32)
    """
    if not np.issubdtype(type(factor), np.integer):
        raise ParameterError(f"factor={factor} must be integer-valued")
    X = jnp.asarray(X)
    if X.ndim != 2:
        raise ParameterError("shear is defined only for 2D arrays")
    n0, n1 = X.shape
    if axis == 0:
        # roll row i by factor*i along axis 1
        i = np.arange(n0)[:, None]
        j = np.arange(n1)
        src = np.mod(j[None, :] - factor * i, n1)
        return X[jnp.asarray(np.broadcast_to(i, (n0, n1))), jnp.asarray(src)]
    else:
        # roll column j by factor*j along axis 0
        j = np.arange(n1)
        i = np.arange(n0)[:, None]
        src = np.mod(i - factor * j[None, :], n0)
        return X[jnp.asarray(src), jnp.asarray(np.broadcast_to(j, (n0, n1)))]


def stack(arrays: Sequence[_ArrayLike], *, axis: int = 0) -> jax.Array:
    """Stack arrays along a new axis, preserving contiguity semantics.

    Parameters
    ----------
    arrays : sequence of array-like
        arrays of identical shape and dtype
    axis : int
        position of the new axis

    Returns
    -------
    stacked : jax.Array
        stacked array with one more dimension than the inputs

    Raises
    ------
    ParameterError
        if no arrays are given or shapes/dtypes disagree

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> np.asarray(lt.util.stack([np.zeros(2), np.ones(2)], axis=0)).tolist()
    [[0.0, 0.0], [1.0, 1.0]]

    Parity: reference util/utils.py:2260.
    """
    if not arrays:
        raise ParameterError("no input arrays provided to stack")
    shapes = {jnp.asarray(a).shape for a in arrays}
    if len(shapes) > 1:
        raise ParameterError("all input arrays must have the same shape")
    return jnp.stack([jnp.asarray(a) for a in arrays], axis=axis)


# ---------------------------------------------------------------------------
# Dtype mapping
# ---------------------------------------------------------------------------


def dtype_r2c(d: Any, *, default: Optional[Any] = np.complex64) -> np.dtype:
    """Map a real dtype to its complex analogue of matching precision.

    Parameters
    ----------
    d : dtype-like
        real (or already complex) dtype
    default : dtype or None
        result for unrecognized inputs

    Returns
    -------
    d_c : np.dtype
        complex dtype (e.g. float32 → complex64)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.util.dtype_r2c(np.float64) == np.dtype(np.complex128)
    True

    Parity: reference util/utils.py:2362.
    """
    mapping = {
        np.dtype(np.float32): np.complex64,
        np.dtype(np.float64): np.complex128,
        np.dtype(float): np.dtype(complex).type,
    }
    dt = np.dtype(d)
    if dt.kind == "c":
        return dt
    return np.dtype(mapping.get(dt, default))


def dtype_c2r(d: Any, *, default: Optional[Any] = np.float32) -> np.dtype:
    """Map a complex dtype to its real analogue of matching precision.

    Parameters
    ----------
    d : dtype-like
        complex (or already real) dtype
    default : dtype or None
        result for unrecognized inputs

    Returns
    -------
    d_r : np.dtype
        real dtype (e.g. complex128 → float64)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.util.dtype_c2r(np.complex64) == np.dtype(np.float32)
    True

    Parity: reference util/utils.py:2419.
    """
    mapping = {
        np.dtype(np.complex64): np.float32,
        np.dtype(np.complex128): np.float64,
        np.dtype(complex): np.dtype(float).type,
    }
    dt = np.dtype(d)
    if dt.kind == "f":
        return dt
    return np.dtype(mapping.get(dt, default))


# ---------------------------------------------------------------------------
# Unique counting (sort + diff; reference numba util/utils.py:2480-2540)
# ---------------------------------------------------------------------------


def count_unique(data: _ArrayLike, *, axis: int = -1) -> jax.Array:
    """Count distinct values in each slice along an axis.

    Runs as sort + change-point count, so it stays on device with
    static shapes (no data-dependent ``np.unique``).

    Parameters
    ----------
    data : array-like
        input array
    axis : int
        axis to reduce

    Returns
    -------
    counts : jax.Array [dtype=int]
        number of distinct values per slice

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> np.asarray(lt.util.count_unique(np.array([[1, 1, 2], [3, 4, 5]]))).tolist()
    [2, 3]

    Parity: reference util/utils.py (count_unique).
    """
    data = jnp.asarray(data)
    s = jnp.sort(data, axis=axis)
    d = jnp.diff(s, axis=axis) != 0
    return jnp.sum(d, axis=axis) + 1


def is_unique(data: _ArrayLike, *, axis: int = -1) -> jax.Array:
    """Check whether each slice along an axis contains only distinct values.

    Parameters
    ----------
    data : array-like
        input array
    axis : int
        axis to reduce

    Returns
    -------
    unique : jax.Array [dtype=bool]
        True per slice with no repeated values

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> np.asarray(lt.util.is_unique(np.array([[1, 2, 3], [1, 1, 2]]))).tolist()
    [True, False]

    Parity: reference util/utils.py (is_unique).
    """
    data = jnp.asarray(data)
    return count_unique(data, axis=axis) == data.shape[axis]


# ---------------------------------------------------------------------------
# Elementwise kernels (reference numba vectorize util/utils.py:2583-2646)
# ---------------------------------------------------------------------------


def abs2(x: _ArrayLike, dtype: Any = None) -> jax.Array:
    """Squared magnitude without an explicit abs + square round trip.

    For complex input computes ``re² + im²`` directly (XLA fuses the
    two products into adjacent ops); real input is simply squared.

    Parameters
    ----------
    x : array-like (real or complex)
        input values
    dtype : dtype or None
        optional output dtype cast

    Returns
    -------
    p : jax.Array (real)
        ``|x|²`` elementwise

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> np.asarray(lt.util.abs2(np.array([3.0 + 4.0j]))).tolist()
    [25.0]

    Parity: reference util/utils.py:2592 (numba vectorize ``_abs2``).
    """
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        y = jnp.real(x) ** 2 + jnp.imag(x) ** 2
        if dtype is not None:
            y = y.astype(dtype)
        return y
    y = x**2
    if dtype is not None:
        y = y.astype(dtype)
    return y


def phasor(
    angles: _ArrayLike, *, mag: Optional[_ArrayLike] = None
) -> jax.Array:
    """Construct complex phasors ``exp(i·angles)``, optionally scaled.

    Computes cos + i·sin directly rather than exponentiating a complex
    argument, which keeps the computation in real arithmetic on device.

    Parameters
    ----------
    angles : array-like (real)
        phase angles in radians
    mag : array-like or None
        optional magnitudes to scale each phasor

    Returns
    -------
    z : jax.Array (complex)
        ``mag · exp(i·angles)``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> z = np.asarray(lt.util.phasor(np.array([0.0, np.pi])))
    >>> z.round(6).tolist()
    [(1+0j), (-1-0j)]

    Parity: reference util/utils.py:2646 (numba vectorize ``_phasor``).
    """
    angles = jnp.asarray(angles)
    z = jax.lax.complex(jnp.cos(angles), jnp.sin(angles))
    if mag is not None:
        z = z * jnp.asarray(mag)
    return z


def buf_to_float(
    x: np.ndarray, *, n_bytes: int = 2, dtype: Any = np.float32
) -> np.ndarray:
    """Convert an integer PCM byte buffer to floating point.

    Parameters
    ----------
    x : bytes or np.ndarray
        little-endian integer PCM data
    n_bytes : int in {1, 2, 4}
        bytes per sample
    dtype : dtype
        output floating dtype

    Returns
    -------
    y : np.ndarray
        samples scaled to [-1, 1)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> pcm = np.array([0, 16384], dtype='<i2').tobytes()
    >>> lt.util.buf_to_float(pcm, n_bytes=2).tolist()
    [0.0, 0.5]

    Parity: reference util/utils.py:1600.
    """
    scale = 1.0 / float(1 << ((8 * n_bytes) - 1))
    fmt = f"<i{n_bytes:d}"
    return scale * np.frombuffer(x, fmt).astype(dtype)


def interp_broadcast(
    *,
    x1: np.ndarray,
    x1_pos: np.ndarray,
    x2: np.ndarray,
    x2_pos: np.ndarray,
    interp_pos: Optional[np.ndarray] = None,
    op: Optional[Any] = np.multiply,
    kind: str = "linear",
    fill_value: float = 0,
    axis: int = -2,
):
    """Interpolate two arrays onto a common grid and combine them.

    Resamples ``x1`` (sampled at ``x1_pos``) and ``x2`` (sampled at
    ``x2_pos``) along ``axis`` onto ``interp_pos`` (default: ``x1_pos``)
    and applies ``op`` (default multiply); with ``op=None`` the two
    interpolated arrays are returned separately.  Used by the metrogram /
    hybrid tempogram to align autocorrelation and Fourier tempograms.

    Parity: util/utils.py:2739 (interp_broadcast).
    """
    from .exceptions import ParameterError

    x1 = np.asarray(x1)
    x2 = np.asarray(x2)
    if interp_pos is None:
        interp_pos = x1_pos

    min_ndim = min(x1.ndim, x2.ndim)
    if axis < -min_ndim or axis >= min_ndim:
        raise ParameterError(
            f"axis={axis} is out of range for minimum ndim={min_ndim}"
        )

    import scipy.interpolate

    def _resample(x, pos):
        f = scipy.interpolate.interp1d(
            pos, x, axis=axis, kind=kind, copy=False,
            bounds_error=False, fill_value=fill_value,
        )
        return f(interp_pos)

    y1 = _resample(x1, x1_pos)
    y2 = _resample(x2, x2_pos)

    if op is None:
        return y1, y2

    try:
        np.broadcast_shapes(y1.shape, y2.shape)
    except ValueError as exc:
        raise ParameterError(
            f"Interpolating x1.shape={x1.shape} and x2.shape={x2.shape} along "
            f"axis={axis} gives y1.shape={y1.shape} and y2.shape={y2.shape}, "
            "which are not broadcast compatible."
        ) from exc

    return op(y1, y2)
