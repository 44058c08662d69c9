"""Temporal feature utilities: delta features and memory stacking.

Parity: reference ``librosa/feature/utils.py``.
"""

from __future__ import annotations

from typing import Any

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..util.exceptions import ParameterError

__all__ = ["delta", "stack_memory"]


def delta(
    data: Any,
    *,
    width: int = 9,
    order: int = 1,
    axis: int = -1,
    mode: str = "interp",
    **kwargs: Any,
) -> jax.Array:
    """Delta (derivative) features via Savitzky-Golay filtering.

    Parity: feature/utils.py:21 — ``savgol_filter(deriv=order)``.  The SG
    filter is a fixed FIR for interior samples; ``mode='interp'`` boundary
    polynomial fits are reproduced exactly by evaluating the fitted
    polynomial derivatives at the edges (host-precomputed projection
    matrices, applied as device matmuls).
    """
    data = jnp.asarray(data)

    if mode == "interp" and width > data.shape[axis]:
        raise ParameterError(
            f"when mode='interp', width={width} "
            f"cannot exceed data.shape[axis]={data.shape[axis]}"
        )
    if width < 3 or np.mod(width, 2) != 1:
        raise ParameterError("width must be an odd integer >= 3")
    if order <= 0 or not isinstance(order, (int, np.integer)):
        raise ParameterError("order must be a positive integer")

    kwargs.pop("deriv", None)
    kwargs.setdefault("polyorder", order)
    polyorder = kwargs["polyorder"]
    delta_t = kwargs.get("delta", 1.0)

    import scipy.signal

    # Interior FIR coefficients (host): savgol row for the centered window
    coeffs = scipy.signal.savgol_coeffs(
        width, polyorder, deriv=order, delta=delta_t
    ).astype(np.float64)

    if mode == "interp":
        # Edge handling: fit a polynomial to the first/last `width` samples
        # and evaluate its derivative — precompute the projection matrices.
        half = width // 2
        t_edge = np.arange(width, dtype=np.float64)
        V = np.vander(t_edge, polyorder + 1, increasing=True)
        pinv = np.linalg.pinv(V)  # (polyorder+1, width)
        # derivative evaluation matrix at positions 0..half-1 / n-half..n-1
        from math import factorial

        def deval(ts: np.ndarray) -> np.ndarray:
            # rows: positions; columns: polynomial coefficient index
            D = np.zeros((len(ts), polyorder + 1))
            for ci in range(order, polyorder + 1):
                D[:, ci] = (
                    factorial(ci)
                    / factorial(ci - order)
                    * ts ** (ci - order)
                    / (delta_t**order)
                )
            return D

        head_M = deval(t_edge[:half]) @ pinv  # (half, width)
        tail_M = deval(t_edge[-half:]) @ pinv  # (half, width)
        edge_mats = (jnp.asarray(head_M.T), jnp.asarray(tail_M.T))
    else:
        edge_mats = None

    # host-computed coefficients; the conv + edge matmuls run as ONE program
    return _delta_core(
        data, jnp.asarray(coeffs[::-1]), edge_mats,
        width=int(width), axis=int(axis), mode=mode,
    )


@functools.partial(jax.jit, static_argnames=("width", "axis", "mode"))
def _delta_core(data, kernel_rev, edge_mats, *, width, axis, mode):
    x = jnp.moveaxis(data, axis, -1)
    n = x.shape[-1]
    half = width // 2

    # Interior: correlate with coeffs (savgol uses convolve with coeffs[::-1])
    kernel = kernel_rev.astype(x.dtype)
    flat = x.reshape(-1, n)

    if mode == "interp":
        interior = jax.vmap(
            lambda row: jnp.convolve(row, kernel[::-1], mode="valid")
        )(flat)  # length n - width + 1, starting at index half
        head = flat[:, :width] @ edge_mats[0].astype(x.dtype)
        tail = flat[:, -width:] @ edge_mats[1].astype(x.dtype)
        out = jnp.concatenate([head, interior, tail], axis=-1)
    else:
        # Pad-based modes: extend the signal, then valid-correlate
        pad_mode = {"nearest": "edge", "mirror": "reflect", "wrap": "wrap"}.get(
            mode, "constant"
        )
        padded = jnp.pad(flat, [(0, 0), (half, half)], mode=pad_mode)
        out = jax.vmap(lambda row: jnp.convolve(row, kernel[::-1], mode="valid"))(
            padded
        )

    out = out.reshape(x.shape[:-1] + (out.shape[-1],))
    return jnp.moveaxis(out, -1, axis)


def stack_memory(
    data: Any, *, n_steps: int = 2, delay: int = 1, **kwargs: Any
) -> jax.Array:
    """Stack delayed copies of a feature sequence (context embedding).

    ``output[..., k*d:(k+1)*d, t] = data[..., t - k*delay]`` for
    ``k < n_steps`` (behavior parity with the reference
    ``feature/utils.py:134``).

    Parameters
    ----------
    data : feature matrix [shape=(..., d, t)]
    n_steps : int > 0
        history length
    delay : int != 0
        frames between copies (negative looks ahead)
    **kwargs : forwarded to ``np.pad``

    Returns
    -------
    data_history : jax.Array [shape=(..., d * n_steps, t)]
    """
    if n_steps < 1:
        raise ParameterError("n_steps must be a positive integer")
    if delay == 0:
        raise ParameterError("delay must be a non-zero integer")

    kwargs.setdefault("mode", "constant")
    if kwargs["mode"] == "constant":
        kwargs.setdefault("constant_values", [0])

    # hashable pad config so the shift/pad/concat stack is ONE program
    pad_cfg = tuple(
        (k, tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        for k, v in sorted(kwargs.items())
    )
    return _stack_memory_core(
        jnp.asarray(data), n_steps=int(n_steps),
        delay=int(delay), pad_cfg=pad_cfg,
    )


@functools.partial(
    jax.jit, static_argnames=("n_steps", "delay", "pad_cfg")
)
def _stack_memory_core(data, *, n_steps, delay, pad_cfg):
    data = jnp.atleast_2d(data)
    kwargs = dict(pad_cfg)
    t = data.shape[-1]

    blocks = []
    for step in range(n_steps):
        shift = step * delay
        pad = [(0, 0)] * data.ndim
        if shift >= 0:
            pad[-1] = (shift, 0)
            shifted = jnp.pad(data, pad, **kwargs)[..., :t]
        else:
            pad[-1] = (0, -shift)
            shifted = jnp.pad(data, pad, **kwargs)[..., -t:]
        blocks.append(shifted)
    return jnp.concatenate(blocks, axis=-2)
