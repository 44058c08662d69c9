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
    on_device = isinstance(y, jax.Array)
    if not on_device:
        y = np.asarray(y)
        if not isinstance(y, np.ndarray):
            raise ParameterError("Audio data must be of type numpy.ndarray")

    problems = []
    xp = jnp if on_device else np
    if not xp.issubdtype(y.dtype, xp.floating):
        problems.append("Audio data must be floating-point")
    if y.ndim == 0:
        problems.append(
            f"Audio data must be at least one-dimensional, given y.shape={y.shape}"
        )
    if mono and not on_device and y.ndim != 1:
        problems.append(f"Invalid shape for monophonic audio: ndim={y.ndim}")
    # The finiteness scan is data-dependent: it cannot run on tracers
    # (under jit), and on device arrays it forces a host sync.
    if not problems and not isinstance(y, jax.core.Tracer):
        finite = jnp.all(jnp.isfinite(y)) if on_device else np.isfinite(y).all()
        if not bool(finite):
            problems.append("Audio buffer is not finite everywhere")
    if problems:
        raise ParameterError(problems[0])
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
    rounder = np.floor if cast is None else cast
    if not callable(rounder):
        raise ParameterError(f"cast={cast!r} is not a callable rounding function")
    return int(rounder(x))


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
    if not isinstance(x, (int, np.integer)):
        return False
    return x > 0


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
    ivals = np.asarray(intervals)
    if ivals.shape[-1:] != (2,) or ivals.ndim != 2:
        raise ParameterError(
            f"interval arrays are (n, 2)-shaped; got {ivals.shape}"
        )
    durations = ivals[:, 1] - ivals[:, 0]
    if (durations < 0).any():
        raise ParameterError("every interval needs end >= start")
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
    slack = size - data.shape[axis]
    if slack < 0:
        raise ParameterError(
            f"cannot center data of length {data.shape[axis]} in size={size}"
        )
    before = slack // 2
    widths = [
        (before, slack - before) if d == axis % data.ndim else (0, 0)
        for d in range(data.ndim)
    ]
    return jnp.pad(data, widths, **{"mode": "constant", **kwargs})


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
    if np.ndim(axes) == 0:
        axes = (int(axes),)  # type: ignore[arg-type]
    placement = dict(zip(axes, x.shape))  # type: ignore[arg-type]
    if len(placement) != x.ndim:
        raise ParameterError(
            f"expand_to needs one output position per input axis; "
            f"got axes={axes} for a {x.ndim}-d input"
        )
    if x.ndim > ndim:
        raise ParameterError(
            f"target rank ndim={ndim} is below the input rank {x.ndim}"
        )
    new_shape = [1] * ndim
    for pos, extent in placement.items():
        new_shape[pos] = extent
    return x.reshape(tuple(new_shape))


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
    shortfall = size - data.shape[axis]
    if shortfall == 0:
        return data
    if shortfall < 0:
        return jax.lax.slice_in_dim(data, 0, size, axis=axis)
    widths = [(0, 0)] * data.ndim
    widths[axis] = (0, shortfall)
    return jnp.pad(data, widths, **{"mode": "constant", **kwargs})


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
    candidates = np.asarray(frames)
    if (candidates < 0).any():
        raise ParameterError("frame indices must be non-negative")
    endpoints = [e for e in (x_min, x_max) if e is not None]
    if pad:
        # clip everything into range, then make sure both endpoints appear
        if endpoints:
            candidates = np.clip(candidates, x_min, x_max)
        candidates = np.append(candidates, endpoints)
    else:
        # drop out-of-range values instead of clipping
        keep = np.ones(candidates.shape, dtype=bool)
        if x_min is not None:
            keep &= candidates >= x_min
        if x_max is not None:
            keep &= candidates <= x_max
        candidates = candidates[keep]
    return np.unique(candidates).astype(int)


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
    S = jnp.asarray(S)
    if S.ndim != 2:
        raise ParameterError(f"axis_sort needs a matrix; got ndim={S.ndim}")
    peak_of = jnp.argmax if value is None else value
    # the sort key lives on the *other* axis of the matrix
    key_axis = (axis + 1) % 2
    order = jnp.argsort(peak_of(S, axis=key_axis))
    permuted = jnp.take(S, order, axis=axis % 2)
    return (permuted, order) if index else permuted


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
    if fill not in (None, False, True):
        raise ParameterError(f"fill={fill} must be None or boolean")
    if threshold is not None and threshold <= 0:
        raise ParameterError(f"threshold={threshold} must be strictly positive")

    S = jnp.asarray(S)
    if S.dtype.kind not in "fc":
        raise ParameterError("Input must be floating point")
    if norm is None:
        return S

    floor = tiny(S) if threshold is None else threshold
    mag = jnp.abs(S).astype(jnp.result_type(S.real.dtype, jnp.float32))

    # per-slice scale + the unit-vector value used when fill=True
    unit_fill = 1.0
    if norm == np.inf:
        scale = jnp.max(mag, axis=axis, keepdims=True)
    elif norm == -np.inf:
        scale = jnp.min(mag, axis=axis, keepdims=True)
    elif norm == 0:
        if fill is True:
            raise ParameterError("norm=0 is incompatible with fill=True")
        scale = jnp.count_nonzero(mag, axis=axis, keepdims=True).astype(mag.dtype)
    elif np.issubdtype(type(norm), np.number) and norm > 0:
        scale = jnp.sum(mag**norm, axis=axis, keepdims=True) ** (1.0 / norm)
        extent = mag.size if axis is None else mag.shape[axis]
        unit_fill = extent ** (-1.0 / norm)
    else:
        raise ParameterError(f"Unsupported norm: {repr(norm)}")

    below = scale < floor
    if fill is None:
        # sub-threshold slices pass through unscaled
        return S / jnp.where(below, 1.0, scale)
    if fill is False:
        # sub-threshold slices are zeroed
        return S / jnp.where(below, jnp.inf, scale)
    # fill=True: sub-threshold slices become the uniform unit vector
    out = S / jnp.where(below, jnp.nan, scale)
    return jnp.where(jnp.isnan(out), unit_fill, out)


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
    x = np.atleast_2d(np.asarray(x))
    if x.ndim != 2:
        raise ParameterError(
            f"sparsify_rows handles vectors and matrices only; got shape {x.shape}"
        )
    if quantile < 0 or quantile >= 1:
        raise ParameterError(f"quantile must lie in [0, 1); got {quantile}")

    out_dtype = x.dtype if dtype is None else dtype
    mags = np.abs(x)
    # Per row: find the smallest magnitude that survives, i.e. the value
    # at the first sorted position where the cumulative mass fraction
    # reaches `quantile`; everything >= that magnitude is kept.
    ascending = np.sort(mags, axis=1)
    frac = np.cumsum(ascending, axis=1)
    frac /= frac[:, -1:]
    cut_pos = (frac < quantile).sum(axis=1)
    cutoffs = np.take_along_axis(ascending, cut_pos[:, None], axis=1)
    keep = mags >= cutoffs
    return scipy.sparse.csr_matrix(
        np.where(keep, x, 0).astype(out_dtype), shape=x.shape
    )


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
        raise ParameterError(
            f"softmask inputs must match: {X.shape} vs {X_ref.shape}"
        )
    if power <= 0:
        raise ParameterError(f"power={power} must be positive")
    if X.dtype.kind != "f":
        raise ParameterError(f"softmask needs float inputs, got {X.dtype}")
    # negativity is data-dependent: check only when values are concrete
    concrete = not (isinstance(X, jax.core.Tracer)
                    or isinstance(X_ref, jax.core.Tracer))
    if concrete and bool(jnp.minimum(X.min(), X_ref.min()) < 0):
        raise ParameterError("softmask inputs must be non-negative")

    # scale both inputs by their elementwise max so the ratios live in
    # [0, 1] and powers can't overflow; positions where even the max
    # underflows are decided by split_zeros alone.
    finfo_dtype = np.float32 if X.dtype == jnp.bfloat16 else np.dtype(X.dtype)
    denom = jnp.maximum(X, X_ref)
    degenerate = denom < np.finfo(finfo_dtype).tiny
    zeros_val = 0.5 if split_zeros else 0.0

    if not np.isfinite(power):
        # hard (binary) mask
        return jnp.where(degenerate, zeros_val, (X > X_ref).astype(X.dtype))

    safe = jnp.where(degenerate, 1.0, denom)
    num = (X / safe) ** power
    den = num + (X_ref / safe) ** power
    return jnp.where(degenerate, zeros_val, num / den)


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
    # On a periodic domain every sample is an interior point: its
    # second-order centered difference uses the neighbors across the wrap.
    # That is exactly one pair of circular shifts — no pad/slice needed,
    # and ``edge_order`` (which only changes boundary extrapolation in
    # np.gradient) cannot affect the result.
    ahead = jnp.roll(data, -1, axis=axis)
    behind = jnp.roll(data, 1, axis=axis)
    return (ahead - behind) / 2.0


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
    dt = np.dtype(d)
    if dt.kind == "c":
        # already complex: precision is whatever the caller chose
        return dt
    if dt == np.dtype(np.float32):
        return np.dtype(np.complex64)
    if dt == np.dtype(np.float64):
        return np.dtype(np.complex128)
    # half/extended precision and non-float kinds have no paired complex
    return np.dtype(default)


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
    dt = np.dtype(d)
    if dt.kind == "f":
        # already real floating: nothing to strip
        return dt
    if dt == np.dtype(np.complex64):
        return np.dtype(np.float32)
    if dt == np.dtype(np.complex128):
        return np.dtype(np.float64)
    # extended-precision complex and non-complex kinds fall back
    return np.dtype(default)


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
    # little-endian signed ints, normalized by the type's magnitude range
    ints = np.frombuffer(x, dtype=f"<i{n_bytes}")
    full_scale = float(2 ** (8 * n_bytes - 1))
    return ints.astype(dtype) / full_scale


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
    targets = np.asarray(x1_pos if interp_pos is None else interp_pos)

    shallow = min(x1.ndim, x2.ndim)
    if not -shallow <= axis < shallow:
        raise ParameterError(
            f"axis={axis} does not exist in both inputs "
            f"(ndim {x1.ndim} and {x2.ndim})"
        )

    y1 = _regrid_1d(x1, np.asarray(x1_pos), targets, axis=axis,
                    kind=kind, fill_value=fill_value)
    y2 = _regrid_1d(x2, np.asarray(x2_pos), targets, axis=axis,
                    kind=kind, fill_value=fill_value)

    if op is None:
        return y1, y2
    try:
        np.broadcast_shapes(y1.shape, y2.shape)
    except ValueError as exc:
        raise ParameterError(
            f"Resampled shapes {y1.shape} and {y2.shape} (from inputs "
            f"{x1.shape} / {x2.shape} along axis={axis}) do not broadcast"
        ) from exc
    return op(y1, y2)


def _regrid_1d(values: np.ndarray, grid: np.ndarray, targets: np.ndarray,
               *, axis: int, kind: str, fill_value: float) -> np.ndarray:
    """Resample ``values`` (sampled at ``grid`` along ``axis``) at
    ``targets``, filling out-of-range queries with ``fill_value``.

    The default linear kind is a pure-numpy gather-and-lerp (one
    searchsorted + fancy index per call); exotic spline kinds delegate to
    scipy at host trace time.
    """
    if kind != "linear":
        import scipy.interpolate

        fit = scipy.interpolate.interp1d(
            grid, values, axis=axis, kind=kind, copy=False,
            bounds_error=False, fill_value=fill_value,
        )
        return fit(targets)

    order = np.argsort(grid)
    grid = grid[order]
    values = np.take(values, order, axis=axis)

    # Bracket each target: grid[hi-1] <= t < grid[hi] for interior points.
    hi = np.clip(np.searchsorted(grid, targets, side="right"),
                 1, len(grid) - 1)
    span = grid[hi] - grid[hi - 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        w = np.where(span > 0, (targets - grid[hi - 1]) / span, 0.0)

    lo_vals = np.take(values, hi - 1, axis=axis)
    hi_vals = np.take(values, hi, axis=axis)
    # move the interpolation axis shape into broadcast position
    bshape = [1] * values.ndim
    bshape[axis] = len(targets)
    wb = w.reshape(bshape)
    out = lo_vals + wb * (hi_vals - lo_vals)

    inside = (targets >= grid[0]) & (targets <= grid[-1])
    return np.where(inside.reshape(bshape), out, fill_value)
