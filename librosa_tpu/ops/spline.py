"""Device-native cubic-spline resampling on a uniform grid.

Built for :func:`librosa_tpu.core.spectrum_ext.fmt` (the fast Mellin
transform), whose exponential-grid resample the reference runs through
host ``scipy.interpolate.interp1d(kind='cubic')``
(``/root/reference/librosa/core/spectrum.py:2156-2356``).  Here the whole
resample is one jitted device program:

* the input grid is uniform (``x = linspace(0, 1, n, endpoint=False)``)
  and the output grid is static, so every interpolation weight and every
  Thomas-elimination coefficient of the spline system is data-INdependent
  — precomputed on host in float64 and baked into the program;
* the only data-dependent work is two first-order linear recurrences
  (forward elimination + back-substitution of the not-a-knot tridiagonal
  system), each running as an ``associative_scan`` (log-depth on TPU, no
  sequential host loop), plus gathers and fused elementwise math.

The not-a-knot cubic interpolant is unique, so this matches scipy's
B-spline construction to floating-point error.

Spline background: with uniform spacing ``h`` and second derivatives
``M_i``, continuity gives the tridiagonal system

    M_{i-1} + 4 M_i + M_{i+1} = (6/h^2) * (y_{i-1} - 2 y_i + y_{i+1})

for interior ``i``; the not-a-knot conditions (third-derivative
continuity at the second and second-to-last knots) reduce on a uniform
grid to ``M_0 = 2 M_1 - M_2`` and ``M_{n-1} = 2 M_{n-2} - M_{n-3}``.
Substituting them into their neighboring rows decouples ``M_1`` and
``M_{n-2}`` (each equals its right-hand side over 6), leaving a
constant-(1, 4, 1) system for the rest.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _affine_chain(left, right):
    """Compose y ↦ a·y + c maps (right after left)."""
    a_l, c_l = left
    a_r, c_r = right
    return a_l * a_r, c_r + a_r * c_l


@functools.lru_cache(maxsize=64)
def _thomas_coefficients(m: int) -> Tuple[np.ndarray, np.ndarray]:
    """Elimination constants for the m-unknown (1, 4, 1) tridiagonal.

    Returns ``(upper, inv_pivot)`` where ``upper[k]`` is the eliminated
    super-diagonal and ``inv_pivot[k] = 1 / (4 - upper[k-1])`` — all
    data-independent, so they are host float64 constants.
    """
    upper = np.empty(m, dtype=np.float64)
    inv_pivot = np.empty(m, dtype=np.float64)
    running = 0.0
    for k in range(m):
        inv_pivot[k] = 1.0 / (4.0 - running)
        running = inv_pivot[k]  # = c'_k since the super-diagonal is 1
        upper[k] = running
    return upper, inv_pivot


def notaknot_second_derivatives(y: jax.Array) -> jax.Array:
    """Second derivatives M of the not-a-knot cubic spline through
    ``y`` sampled on a UNIT-SPACED uniform grid, along the last axis.

    ``y`` must have ``n >= 4`` samples.  Returns M with the same shape.
    (For spacing ``h``, scale the result by ``1/h**2`` at the call site —
    equivalently fold it into the evaluation weights.)
    """
    n = y.shape[-1]
    if n < 4:
        raise ValueError("a not-a-knot cubic spline needs >= 4 samples")

    # curvature right-hand side: 6 * second difference (unit spacing)
    rhs = 6.0 * (y[..., :-2] - 2.0 * y[..., 1:-1] + y[..., 2:])

    # decoupled edge unknowns
    m_first = rhs[..., :1] / 6.0          # M_1
    m_last = rhs[..., -1:] / 6.0          # M_{n-2}

    m_inner_count = n - 4
    if m_inner_count > 0:
        upper, inv_pivot = _thomas_coefficients(m_inner_count)
        upper_j = jnp.asarray(upper, dtype=y.dtype)
        inv_pivot_j = jnp.asarray(inv_pivot, dtype=y.dtype)

        # interior rows, with the known edge unknowns folded in
        r = rhs[..., 1:-1]
        r = jnp.concatenate(
            [r[..., :1] - m_first, r[..., 1:-1], r[..., -1:] - m_last],
            axis=-1,
        ) if m_inner_count > 1 else (r - m_first - m_last)

        # forward elimination: d_k = inv_pivot_k * r_k - inv_pivot_k * d_{k-1}
        a_fwd = jnp.broadcast_to(-inv_pivot_j, r.shape)
        c_fwd = r * inv_pivot_j
        _, d = jax.lax.associative_scan(_affine_chain, (a_fwd, c_fwd),
                                        axis=-1)

        # back-substitution: X_k = d_k - upper_k * X_{k+1} (reverse scan)
        a_bwd = jnp.broadcast_to(-upper_j, d.shape)
        _, x_rev = jax.lax.associative_scan(
            _affine_chain,
            (jnp.flip(a_bwd, axis=-1), jnp.flip(d, axis=-1)),
            axis=-1,
        )
        m_inner = jnp.flip(x_rev, axis=-1)
        body = jnp.concatenate([m_first, m_inner, m_last], axis=-1)
    else:
        body = jnp.concatenate([m_first, m_last], axis=-1)

    # not-a-knot edges: linear extrapolation of the curvature
    m_head = 2.0 * body[..., :1] - body[..., 1:2]
    m_tail = 2.0 * body[..., -1:] - body[..., -2:-1]
    return jnp.concatenate([m_head, body, m_tail], axis=-1)


def uniform_cubic_resample(
    y: jax.Array, positions: np.ndarray, *, x0: float, dx: float
) -> jax.Array:
    """Evaluate the not-a-knot cubic spline through ``y`` (uniform grid
    ``x0 + dx * arange(n)``, last axis) at static ``positions``.

    All weights are host float64 constants; the device program is the
    spline solve (two associative scans) plus four gathers and a fused
    weighted sum.  Matches ``scipy.interpolate.interp1d(kind='cubic')``
    to floating-point error.
    """
    n = y.shape[-1]
    # cell index and barycentric offset of each target, in exact f64
    t = (np.asarray(positions, dtype=np.float64) - x0) / dx
    cell = np.clip(np.floor(t).astype(np.int64), 0, n - 2)
    s = t - cell

    # Hermite-like weights of (y_lo, y_hi, M_lo, M_hi); M is computed on
    # the unit grid so the usual h^2/6 factor becomes 1/6.
    w_ylo = 1.0 - s
    w_yhi = s
    w_mlo = ((1.0 - s) ** 3 - (1.0 - s)) / 6.0
    w_mhi = (s**3 - s) / 6.0

    curvature = notaknot_second_derivatives(y)
    lo = cell
    hi = cell + 1
    dt = y.dtype
    return (
        jnp.take(y, lo, axis=-1) * jnp.asarray(w_ylo, dt)
        + jnp.take(y, hi, axis=-1) * jnp.asarray(w_yhi, dt)
        + jnp.take(curvature, lo, axis=-1) * jnp.asarray(w_mlo, dt)
        + jnp.take(curvature, hi, axis=-1) * jnp.asarray(w_mhi, dt)
    )


def uniform_linear_resample(
    y: jax.Array, positions: np.ndarray, *, x0: float, dx: float
) -> jax.Array:
    """Gather-and-lerp of ``y`` (uniform grid, last axis) at static
    ``positions`` — the ``kind='linear'`` path, no spline solve."""
    n = y.shape[-1]
    t = (np.asarray(positions, dtype=np.float64) - x0) / dx
    cell = np.clip(np.floor(t).astype(np.int64), 0, n - 2)
    s = t - cell
    dt = y.dtype
    return (
        jnp.take(y, cell, axis=-1) * jnp.asarray(1.0 - s, dt)
        + jnp.take(y, cell + 1, axis=-1) * jnp.asarray(s, dt)
    )
