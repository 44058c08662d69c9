"""Sliding-window median on device.

The one op with no good XLA primitive (SURVEY §7 hard-part #3): HPSS needs
1-D median filters of size ~31 along time and frequency
(``librosa/decompose.py:382-390``).  Formulation: stack ``size`` shifted
slices along a new trailing axis and take ``jnp.median`` — XLA lowers the
inner sort to a vectorized sorting network over the (small) window axis.
Boundary handling matches ``scipy.ndimage.median_filter(mode='reflect')``
(== NumPy 'symmetric' padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["median_filter_1d"]


@functools.partial(jax.jit, static_argnames=("size", "axis"))
def median_filter_1d(x: jax.Array, *, size: int, axis: int = -1) -> jax.Array:
    """Centered sliding median along one axis (scipy ``reflect`` boundary).

    Device equivalent of ``scipy.ndimage.median_filter`` restricted to a
    1-D window: the window gather is static, the median is a sort over
    the window axis, and the whole thing fuses into the calling program
    (the HPSS hot path, reference ``decompose.py:211``).

    Parameters
    ----------
    x : jax.Array
        input array
    size : int >= 1
        window length (odd sizes are centered exactly like scipy)
    axis : int
        filtering axis

    Returns
    -------
    filtered : jax.Array, same shape as ``x``
    """
    if size < 1:
        raise ValueError("size must be >= 1")
    if size == 1:
        return x

    x = jnp.moveaxis(x, axis, -1)
    lpad = size // 2
    rpad = size - 1 - lpad
    pads = [(0, 0)] * (x.ndim - 1) + [(lpad, rpad)]
    xp = jnp.pad(x, pads, mode="symmetric")

    n = x.shape[-1]
    windows = jnp.stack([xp[..., k : k + n] for k in range(size)], axis=-1)
    if size % 2:
        out = jnp.median(windows, axis=-1)
    else:
        # scipy.ndimage.median_filter uses the upper-middle order statistic
        # for even sizes (rank = size // 2), not the midpoint average
        out = jnp.sort(windows, axis=-1)[..., size // 2]
    return jnp.moveaxis(out, -1, axis)
