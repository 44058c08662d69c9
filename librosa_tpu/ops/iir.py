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

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _affine_combine(left, right):
    """Compose y ↦ a·y + c maps: right ∘ left."""
    a_l, c_l = left
    a_r, c_r = right
    return a_l * a_r, c_r + a_r * c_l


@functools.partial(jax.jit, static_argnames=("b0", "b1", "a1", "axis"))
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


def _affine2_combine(left, right):
    """Compose s ↦ A·s + c maps on 2-vectors: right ∘ left."""
    A_l, c_l = left
    A_r, c_r = right
    # batched 2x2 matmul: (..., 2, 2) @ (..., 2, 2)
    A = jnp.einsum("...ij,...jk->...ik", A_r, A_l)
    c = c_r + jnp.einsum("...ij,...j->...i", A_r, c_l)
    return A, c


def biquad_filter(
    x: jax.Array,
    sos_row,
    *,
    zi: jax.Array | None = None,
    axis: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """One second-order section ``[b0 b1 b2 1 a1 a2]`` along ``axis``.

    scipy transposed direct-form-II state (z1, z2):

        y[n]  = b0·x[n] + z1[n-1]
        z1[n] = b1·x[n] − a1·y[n] + z2[n-1]
        z2[n] = b2·x[n] − a2·y[n]

    Eliminating y gives a linear recurrence on the 2-state s = (z1, z2):

        s[n] = M·s[n-1] + v·x[n],   M = [[−a1, 1], [−a2, 0]],
                                    v = [b1 − a1·b0, b2 − a2·b0]

    which runs as one log-depth ``lax.associative_scan`` of 2×2 affine
    maps — the second-order generalization of ``first_order_filter``.
    Returns ``(y, zf)`` with ``zf`` shaped like scipy's ``(..., 2)``.
    """
    b0, b1, b2, a0, a1, a2 = (float(c) for c in np.asarray(sos_row))
    if a0 != 1.0:
        b0, b1, b2, a1, a2 = (c / a0 for c in (b0, b1, b2, a1, a2))

    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    if zi is None:
        zi = jnp.zeros(x.shape[:-1] + (2,), dtype=x.dtype)
    else:
        zi = jnp.asarray(zi, dtype=x.dtype)
        zi = jnp.broadcast_to(zi, x.shape[:-1] + (2,))

    M = jnp.asarray([[-a1, 1.0], [-a2, 0.0]], dtype=x.dtype)
    v = jnp.asarray([b1 - a1 * b0, b2 - a2 * b0], dtype=x.dtype)

    # forcing: c[n] = v·x[n]; fold the initial state into c[0]
    c = x[..., None] * v                                  # (..., n, 2)
    c = c.at[..., 0, :].add(jnp.einsum("ij,...j->...i", M, zi))
    A = jnp.broadcast_to(M, x.shape + (2, 2))             # (..., n, 2, 2)

    _, s = jax.lax.associative_scan(_affine2_combine, (A, c), axis=-3)
    z1_prev = jnp.concatenate([zi[..., :1], s[..., :-1, 0]], axis=-1)
    y = b0 * x + z1_prev
    return jnp.moveaxis(y, -1, axis), s[..., -1, :]


def sosfilt(
    x: jax.Array,
    sos,
    *,
    zi: jax.Array | None = None,
    axis: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """Cascade of second-order sections (device ``scipy.signal.sosfilt``).

    Sections run in series, each as a parallel associative scan; state
    ``zi``/``zf`` is ``(..., n_sections, 2)`` matching scipy's layout
    (section-major).  float32 on device — for the very-high-Q elliptic
    banks (e.g. the iirt semitone filterbank) the f64 host path remains
    the parity reference.
    """
    sos = np.asarray(sos, dtype=np.float64)
    if sos.ndim == 1:
        sos = sos[None]
    n_sections = sos.shape[0]
    zf = []
    for k in range(n_sections):
        zi_k = None if zi is None else jnp.asarray(zi)[..., k, :]
        x, zf_k = biquad_filter(x, sos[k], zi=zi_k, axis=axis)
        zf.append(zf_k)
    return x, jnp.stack(zf, axis=-2)


def sosfiltfilt(x: jax.Array, sos, *, axis: int = -1) -> jax.Array:
    """Zero-phase forward-backward SOS filtering (device ``sosfiltfilt``).

    Mirrors scipy's default edge handling: odd-extend both ends by
    ``padlen``, seed each pass with the section steady states scaled by
    the first extended sample (``sosfilt_zi``), filter forward, then
    filter the reversal and un-reverse.
    """
    import scipy.signal

    sos = np.asarray(sos, dtype=np.float64)
    if sos.ndim == 1:
        sos = sos[None]
    n_sections = sos.shape[0]
    ntaps = 2 * n_sections + 1
    ntaps -= min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum())
    padlen = 3 * ntaps

    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    n = x.shape[-1]
    if n <= padlen:
        raise ValueError(
            f"The length of the input vector x must be greater than "
            f"padlen, which is {padlen}."
        )

    # odd extension: 2·edge − mirrored interior
    left = 2 * x[..., :1] - x[..., 1: padlen + 1][..., ::-1]
    right = 2 * x[..., -1:] - x[..., -padlen - 1: -1][..., ::-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    zi_unit = scipy.signal.sosfilt_zi(sos)            # (n_sections, 2)
    zi_unit = jnp.asarray(zi_unit, dtype=ext.dtype)

    fwd, _ = sosfilt(ext, sos, zi=zi_unit * ext[..., :1, None])
    rev = fwd[..., ::-1]
    bwd, _ = sosfilt(rev, sos, zi=zi_unit * rev[..., :1, None])
    out = bwd[..., ::-1][..., padlen: padlen + n]
    return jnp.moveaxis(out, -1, axis)
