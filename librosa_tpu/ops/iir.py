"""Device IIR filtering via parallel (log-depth) associative scans.

A linear recurrence ``y[n] = a·y[n-1] + c[n]`` is a composition of affine
maps, and affine maps compose associatively — so any first-order IIR runs
as a ``lax.associative_scan`` on TPU instead of a sequential host loop
(SURVEY §2.2, scipy.signal row).  This module generalizes the pcen smoother
template (``core/spectrum.py:_exp_filter_scan``) to the full scipy
``lfilter`` contract for first-order sections:

    y[n] = b0·x[n] + b1·x[n-1] − a1·y[n-1]

with scipy's transposed-direct-form-II delay state ``z``:

    y[n] = b0·x[n] + z[n-1]          z[n] = b1·x[n] − a1·y[n]

Consumers: ``effects.preemphasis`` / ``effects.deemphasis`` (reference
``librosa/effects.py:872,985``) and the onset-strength detrend filter
(reference ``librosa/onset.py:638``), all previously host
``scipy.signal.lfilter`` bounces mid-chain.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _affine_combine(left, right):
    """Compose y ↦ a·y + c maps: right ∘ left."""
    a_l, c_l = left
    a_r, c_r = right
    return a_l * a_r, c_r + a_r * c_l


def first_order_filter(
    x: jax.Array,
    *,
    b0: float,
    b1: float,
    a1: float,
    zi: jax.Array,
    axis: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """Apply ``y[n] = b0·x[n] + b1·x[n-1] − a1·y[n-1]`` along ``axis``.

    ``zi`` is the scipy delay state (shape = x with ``axis`` removed, or
    broadcastable to it): ``y[0] = b0·x[0] + zi``.  Returns ``(y, zf)``
    where ``zf = b1·x[-1] − a1·y[-1]`` continues the stream.

    Jit-safe and differentiable; coefficients are Python floats so each
    (b0, b1, a1) triple compiles once per shape.
    """
    x = jnp.moveaxis(x, axis, -1)
    zi = jnp.asarray(zi, dtype=x.dtype)

    if zi.ndim < x.ndim:  # (...,) state -> (..., 1) so it lines up with x[..., :1]
        zi = zi[..., None]

    # Forcing term: c[0] folds the initial state; c[n>=1] is the FIR part.
    c0 = b0 * x[..., :1] + zi
    c_rest = b0 * x[..., 1:] + b1 * x[..., :-1]
    c = jnp.concatenate([c0, c_rest], axis=-1)

    if a1 == 0.0:
        y = c  # pure FIR — no recurrence to scan
    else:
        a = jnp.full(x.shape, -a1, dtype=x.dtype)
        _, y = jax.lax.associative_scan(_affine_combine, (a, c), axis=-1)

    zf = b1 * x[..., -1] - a1 * y[..., -1]
    return jnp.moveaxis(y, -1, axis), zf
