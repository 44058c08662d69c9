"""Batched non-negative least squares on TPU.

The reference solves NNLS with pinv initialization + blocked L-BFGS-B
(``librosa/util/_nnls.py:46-169``), which is host-sequential.  Here NNLS is a
jit-compiled FISTA (accelerated projected gradient): every step is two MXU
matmuls, batched over all output columns at once — the natural TPU
formulation with equivalent solution quality.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from .exceptions import ParameterError

__all__ = ["nnls"]


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _nnls_fista(A: jax.Array, B: jax.Array, *, n_iter: int = 300) -> jax.Array:
    """Solve min_{x>=0} ||Ax - B||_F^2 by FISTA with a power-iteration step size."""
    AtA = A.T @ A
    AtB = A.T @ B

    # Lipschitz constant of the gradient: top eigenvalue of AtA (power iter)
    v = jnp.ones((AtA.shape[0],), dtype=A.dtype) / jnp.sqrt(AtA.shape[0])

    def power_step(v, _):
        w = AtA @ v
        return w / (jnp.linalg.norm(w) + 1e-30), None

    v, _ = jax.lax.scan(power_step, v, None, length=30)
    L = jnp.dot(v, AtA @ v) + 1e-12
    step = 1.0 / L

    x0 = jnp.maximum(0.0, jnp.linalg.pinv(A) @ B)

    def body(carry, _):
        x, y, t = carry
        grad = AtA @ y - AtB
        x_new = jnp.maximum(0.0, y - step * grad)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return (x_new, y_new, t_new), None

    (x, _, _), _ = jax.lax.scan(
        body, (x0, x0, jnp.asarray(1.0, dtype=A.dtype)), None, length=n_iter
    )
    return x


def nnls(A: Any, B: Any, **kwargs: Any) -> jax.Array:
    """Non-negative least squares: minimize ``||A x - b||`` with ``x >= 0``.

    A jit-compiled projected-gradient solver with Nesterov-style momentum,
    batched over columns of ``b`` — the TPU replacement for the reference's
    blocked scipy L-BFGS-B (util/_nnls.py:92); solutions agree in objective
    value, not elementwise.

    Parameters
    ----------
    A : np.ndarray [shape=(m, n)]
    B : np.ndarray [shape=(m,) or (m, k)]
    **kwargs : solver controls (iterations, tolerance)

    Returns
    -------
    x : jax.Array [shape=(n,) or (n, k)], non-negative
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    if A.ndim != 2:
        raise ParameterError("A must be a 2D matrix")

    n_iter = int(kwargs.pop("n_iter", 300))

    squeeze = False
    if B.ndim == 1:
        B = B[:, None]
        squeeze = True

    # Collapse any leading batch dims of B beyond 2: (..., m, N) → (m, ...·N)
    if B.ndim > 2:
        lead = B.shape[:-2]
        B2 = jnp.moveaxis(B, -2, 0).reshape(B.shape[-2], -1)
        x = _nnls_fista(A, B2, n_iter=n_iter)
        x = x.reshape((A.shape[1],) + lead + B.shape[-1:])
        x = jnp.moveaxis(x, 0, -2)
    else:
        x = _nnls_fista(A, B, n_iter=n_iter)

    if squeeze:
        x = x[..., 0]
    return x
