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


# ---------------------------------------------------------------------------
# Error-free transforms (EFT) — exact f32 rounding-error extraction
# ---------------------------------------------------------------------------

_SPLIT32 = 4097.0  # Veltkamp split constant for float32: 2**12 + 1


def _two_sum(a, b):
    """Knuth two-sum: fl(a+b) plus its exact rounding error.

    Requires IEEE adds with no reassociation — XLA preserves float op
    order by default (no fast-math), which `test_iir.py` pins with an
    exactness check against float64.
    """
    s = a + b
    bp = s - a
    return s, (a - (s - bp)) + (b - bp)


def _two_prod(a, b):
    """Dekker two-product: fl(a·b) plus its exact rounding error (f32)."""
    p = a * b
    aa = a * _SPLIT32
    ah = aa - (aa - a)
    al = a - ah
    bb = b * _SPLIT32
    bh = bb - (bb - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


# ---------------------------------------------------------------------------
# Second-order sections as banked, residual-refined prefix-doubling scans
# ---------------------------------------------------------------------------
#
# A TDF-II biquad is the 2-state affine recurrence
#
#     s[n] = M·s[n-1] + v·x[n],   M = [[−a1, 1], [−a2, 0]],
#                                 v = [b1 − a1·b0, b2 − a2·b0]
#     y[n] = b0·x[n] + z1[n-1]            (z1 = first state component)
#
# Instead of materializing per-sample transition matrices for
# ``lax.associative_scan`` (O(n·4) extra HBM), we run Hillis–Steele prefix
# doubling: round k adds ``M^(2^k) @ s[n − 2^k]`` to ``s[n]``.  The matrix
# powers are data-independent, so they are computed ONCE on the host in
# float64 (exact to f32 rounding) and shipped as a (K, B, 2, 2) constant —
# the scan itself never multiplies transition matrices together, removing
# the dominant f32 error source of the associative-scan formulation.
#
# The remaining error (forcing-term accumulation, ~eps·memory-length — the
# killer for the Q≈1000 semitone bank whose poles sit at |z|≈0.998) is
# cancelled by ONE round of exact-residual refinement: compute
# r[n] = M·s[n-1] + v·x[n] − s[n] with error-free transforms (the terms
# cancel to ~eps·‖s‖, which EFT extracts exactly), then run the SAME scan
# on r and add the correction.  Errors drop from O(eps·amp) to
# O(eps²·amp²) — measured ≥135 dB on the worst semitone band vs float64
# scipy, against ~100 dB unrefined.


def _bank_params(sos_bank: np.ndarray, n_ext: int):
    """Host-side constants for a banked SOS cascade.

    Parameters
    ----------
    sos_bank : np.ndarray [shape=(B, S, 6)]
        one scipy-layout SOS cascade per bank entry (float64)
    n_ext : int
        scan length (number of doubling rounds is ``ceil(log2(n_ext))``)

    Returns
    -------
    M : (S, B, 2, 2) f32, v : (S, B, 2) f32, b0 : (S, B) f32,
    Mpows : (S, K, B, 2, 2) f32 — ``Mpows[s, k] = M_s**(2**k)`` rounded
    from exact float64 repeated squaring,
    M_lo, v_lo : f32 tails of the float64 coefficients (``c64 − f32(c64)``).
        High-Q poles are exquisitely sensitive to coefficient rounding
        (Δresponse ≈ eps·Q — the 84 dB floor measured before this fix);
        the refinement pass folds these tails into its residual so the
        corrected scan tracks the FULL float64 coefficients.
    """
    sos = np.asarray(sos_bank, dtype=np.float64)
    B, S, _ = sos.shape
    a0 = sos[..., 3:4]
    sos = sos / a0  # normalize a0 := 1 (scipy does the same)
    b0, b1, b2, _, a1, a2 = (sos[..., i] for i in range(6))

    M = np.zeros((S, B, 2, 2))
    M[..., 0, 0] = -a1.T
    M[..., 0, 1] = 1.0
    M[..., 1, 0] = -a2.T
    v = np.stack([(b1 - a1 * b0).T, (b2 - a2 * b0).T], axis=-1)

    K = max(1, int(np.ceil(np.log2(max(n_ext, 2)))))
    Mpows = np.empty((S, K, B, 2, 2))
    P = M.copy()
    for k in range(K):
        Mpows[:, k] = P
        P = P @ P
    M32 = M.astype(np.float32)
    v32 = v.astype(np.float32)
    return (
        M32,
        v32,
        b0.T.astype(np.float32),
        Mpows.astype(np.float32),
        (M - M32).astype(np.float32),
        (v - v32).astype(np.float32),
    )


def sosfilt_zi(sos) -> np.ndarray:
    """Steady-state TDF-II state per section for a unit step input.

    Closed-form equivalent of ``scipy.signal.sosfilt_zi`` (reference
    behavior at ``scipy/signal/_signaltools.py``): per section, the step
    response steady state is ``g = Σb/Σa`` with state
    ``z1 = g − b0, z2 = b2 − a2·g``; section k is scaled by the cumulative
    DC gain of the sections before it.  Pure NumPy — keeps scipy.signal
    off the runtime path (VERDICT r3 ask #4).
    """
    sos = np.asarray(sos, dtype=np.float64)
    if sos.ndim == 1:
        sos = sos[None]
    sos = sos / sos[:, 3:4]
    zi = np.empty((sos.shape[0], 2))
    scale = 1.0
    for k, (b0, b1, b2, _, a1, a2) in enumerate(sos):
        g = (b0 + b1 + b2) / (1.0 + a1 + a2)
        zi[k] = scale * np.array([g - b0, b2 - a2 * g])
        scale *= g
    return zi


def _prefix_affine_scan(Mpows: jax.Array, c: jax.Array) -> jax.Array:
    """Solve ``s[n] = M·s[n-1] + c[n]`` (s[-1]=0) by prefix doubling.

    ``c``: (L, B, N, 2) forcing; ``Mpows``: (K, B, 2, 2) with
    ``Mpows[k] = M**(2**k)``.  Log-depth, O(N) memory.
    """
    n = c.shape[2]
    s = c
    shift, k = 1, 0
    while shift < n:
        prev = jnp.pad(s, ((0, 0), (0, 0), (shift, 0), (0, 0)))[:, :, :n]
        s = s + jnp.einsum("bij,lbnj->lbni", Mpows[k], prev)
        shift *= 2
        k += 1
    return s


def _bank_biquad_core(x, M, Mpows, v, b0, s0, M_lo, v_lo, *, refine=True):
    """One banked biquad: x (L, B, N) → (y (L, B, N), zf (L, B, 2)).

    ``s0`` is the initial TDF-II state (L, B, 2).  With ``refine``, one
    exact-residual correction pass (see module notes above) lifts the
    f32 scan to ~f64 accuracy: the residual is computed against the FULL
    float64 coefficients (f32 heads via error-free transforms + f32 tails
    ``M_lo``/``v_lo`` as plain products), so both the scan's rounding and
    the coefficient quantization cancel to second order.
    """
    c = x[..., None] * v[None, :, None, :]                 # (L,B,N,2)
    c = c.at[..., 0, :].add(jnp.einsum("bij,lbj->lbi", M, s0))
    s = _prefix_affine_scan(Mpows, c)

    if refine:
        sp = jnp.concatenate([s0[:, :, None, :], s[:, :, :-1, :]], axis=2)
        m = M[None, :, None]                               # (1,B,1,2,2)
        m_lo = M_lo[None, :, None]
        r = []
        for i in (0, 1):
            p1, e1 = _two_prod(m[..., i, 0], sp[..., 0])
            p2, e2 = _two_prod(m[..., i, 1], sp[..., 1])
            p3, e3 = _two_prod(v[None, :, None, i], x)
            acc, e4 = _two_sum(p1, p2)
            acc, e5 = _two_sum(acc, p3)
            acc, e6 = _two_sum(acc, -s[..., i])
            tail = (
                m_lo[..., i, 0] * sp[..., 0]
                + m_lo[..., i, 1] * sp[..., 1]
                + v_lo[None, :, None, i] * x
            )
            r.append(acc + (e1 + e2 + e3 + e4 + e5 + e6 + tail))
        s = s + _prefix_affine_scan(Mpows, jnp.stack(r, axis=-1))

    z1_prev = jnp.concatenate([s0[:, :, None, 0], s[:, :, :-1, 0]], axis=2)
    y = b0[None, :, None] * x + z1_prev
    return y, s[:, :, -1, :]


def _bank_cascade(x, M, v, b0, Mpows, zi, M_lo, v_lo, *, refine=True):
    """Run S sections in series over a bank.  x: (L, B, N); zi: (L, B, S, 2)."""
    zf = []
    for k in range(M.shape[0]):
        x, zf_k = _bank_biquad_core(
            x, M[k], Mpows[k], v[k], b0[k], zi[:, :, k], M_lo[k], v_lo[k],
            refine=refine,
        )
        zf.append(zf_k)
    return x, jnp.stack(zf, axis=2)


def _bank_padlen(sos_bank: np.ndarray) -> int:
    """scipy's default filtfilt pad length for each cascade (max over bank)."""
    n_sections = sos_bank.shape[1]
    ntaps = 2 * n_sections + 1
    drop = min(
        int((sos_bank[..., 2] == 0).all(axis=0).sum()),
        int((sos_bank[..., 5] == 0).all(axis=0).sum()),
    )
    return 3 * (ntaps - drop)


def _bank_filtfilt_core(
    x2, M, v, b0, Mpows, zi_unit, M_lo, v_lo, *, padlen, refine=True
):
    """Zero-phase filter a (L, N) signal batch through a (B,)-bank.

    Traced helper shared by :func:`sosfiltfilt` and ``core.spectrum_ext.iirt``:
    scipy-default odd extension by ``padlen``, steady-state seeding from the
    first extended sample on each pass, forward + time-reversed backward
    cascades, interior slice.  Returns (L, B, N).
    """
    n = x2.shape[-1]
    left = 2 * x2[:, :1] - x2[:, 1: padlen + 1][:, ::-1]
    right = 2 * x2[:, -1:] - x2[:, -padlen - 1: -1][:, ::-1]
    ext = jnp.concatenate([left, x2, right], axis=-1)      # (L, n_ext)

    B = M.shape[1]
    ext = jnp.broadcast_to(ext[:, None, :], (ext.shape[0], B, ext.shape[1]))

    s0 = zi_unit[None] * ext[:, :, :1, None]               # (L,B,S,2)
    fwd, _ = _bank_cascade(ext, M, v, b0, Mpows, s0, M_lo, v_lo,
                           refine=refine)
    rev = fwd[..., ::-1]
    s0 = zi_unit[None] * rev[:, :, :1, None]
    bwd, _ = _bank_cascade(rev, M, v, b0, Mpows, s0, M_lo, v_lo,
                           refine=refine)
    return bwd[..., ::-1][:, :, padlen: padlen + n]


def biquad_filter(
    x: jax.Array,
    sos_row,
    *,
    zi: jax.Array | None = None,
    axis: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """One second-order section ``[b0 b1 b2 1 a1 a2]`` along ``axis``.

    scipy transposed direct-form-II semantics (see the module notes for
    the affine-recurrence formulation and the residual refinement that
    holds ~float64 accuracy in float32); a single-section, single-bank
    view of :func:`sosfilt`.

    Parameters
    ----------
    x : jax.Array — input signal(s)
    sos_row : array-like [shape=(6,)] — one scipy-layout section
    zi : jax.Array [shape=(..., 2)] or None — initial TDF-II state
    axis : int — time axis of ``x``

    Returns
    -------
    y, zf : filtered output and the final ``(..., 2)`` delay state
    """
    y, zf = sosfilt(x, np.asarray(sos_row)[None], zi=None if zi is None
                    else jnp.asarray(zi)[..., None, :], axis=axis)
    return y, zf[..., 0, :]


def sosfilt(
    x: jax.Array,
    sos,
    *,
    zi: jax.Array | None = None,
    axis: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """Cascade of second-order sections (device ``scipy.signal.sosfilt``).

    Sections run in series, each as a residual-refined prefix-doubling
    scan (module notes above); state ``zi``/``zf`` is ``(..., n_sections,
    2)`` matching scipy's section-major layout.  float32 on device with
    ~f64-grade accuracy: the exact-residual pass holds ≥135 dB SNR even
    on the Q≈1000 elliptic semitone bands (``test_iir.py``).
    """
    sos = np.asarray(sos, dtype=np.float64)
    if sos.ndim == 1:
        sos = sos[None]
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    batch = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(-1, 1, n)                               # (L, B=1, N)

    M, v, b0, Mpows, M_lo, v_lo = _bank_params(sos[None], n)
    if zi is None:
        s0 = jnp.zeros((x2.shape[0], 1, sos.shape[0], 2), dtype=x.dtype)
    else:
        zi = jnp.asarray(zi, dtype=x.dtype)
        s0 = jnp.broadcast_to(
            zi, batch + (sos.shape[0], 2)
        ).reshape(x2.shape[0], 1, sos.shape[0], 2)

    y, zf = _bank_cascade(x2, M, v, b0, Mpows, s0, M_lo, v_lo)
    y = jnp.moveaxis(y.reshape(batch + (n,)), -1, axis)
    return y, zf.reshape(batch + (sos.shape[0], 2))


def sosfiltfilt(x: jax.Array, sos, *, axis: int = -1) -> jax.Array:
    """Zero-phase forward-backward SOS filtering (device ``sosfiltfilt``).

    Mirrors scipy's default edge handling: odd-extend both ends by
    ``padlen``, seed each pass with the section steady states scaled by
    the first extended sample (:func:`sosfilt_zi`), filter forward, then
    filter the reversal and un-reverse.  Runs as residual-refined scans —
    ≥135 dB vs float64 scipy on the high-Q elliptic bands.
    """
    sos = np.asarray(sos, dtype=np.float64)
    if sos.ndim == 1:
        sos = sos[None]
    padlen = _bank_padlen(sos[None])

    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    n = x.shape[-1]
    if n <= padlen:
        raise ValueError(
            f"The length of the input vector x must be greater than "
            f"padlen, which is {padlen}."
        )

    batch = x.shape[:-1]
    x2 = x.reshape(-1, n)
    n_ext = n + 2 * padlen
    M, v, b0, Mpows, M_lo, v_lo = _bank_params(sos[None], n_ext)
    zi_unit = jnp.asarray(sosfilt_zi(sos), dtype=x.dtype)  # (S, 2)
    out = _bank_filtfilt_core(
        x2, M, v, b0, Mpows, zi_unit[None], M_lo, v_lo, padlen=padlen
    )
    out = out[:, 0].reshape(batch + (n,))
    return jnp.moveaxis(out, -1, axis)


def sos_bank_filtfilt(x: jax.Array, sos_bank, *, axis: int = -1) -> jax.Array:
    """Zero-phase filter one signal through a whole bank of SOS cascades.

    The multirate-filterbank primitive behind :func:`core.spectrum_ext.iirt`
    (reference applies ``scipy.signal.sosfiltfilt`` per band in a host loop,
    ``librosa/core/spectrum.py:1643``): all ``B`` cascades run as ONE batched
    program — the band axis is just a vectorized leading dimension of the
    prefix-doubling scans, so 36 semitone filters cost one scan, not 36.

    Parameters
    ----------
    x : jax.Array [shape=(..., n)]
        input signal(s); ``axis`` selects the time axis
    sos_bank : array-like [shape=(B, S, 6)]
        ``B`` scipy-layout cascades of ``S`` sections each
    axis : int
        time axis of ``x``

    Returns
    -------
    y : jax.Array [shape=(..., B, n)]
        zero-phase-filtered output per band, band axis inserted before time

    Examples
    --------
    >>> import numpy as np, scipy.signal
    >>> from librosa_tpu.ops.iir import sos_bank_filtfilt
    >>> x = np.random.RandomState(0).randn(400).astype(np.float32)
    >>> bank = np.stack([scipy.signal.butter(2, w, output="sos")
    ...                  for w in (0.1, 0.4)])
    >>> y = np.asarray(sos_bank_filtfilt(x, bank))
    >>> ref = scipy.signal.sosfiltfilt(bank[1], x.astype(np.float64))
    >>> bool(np.allclose(y[1], ref, atol=1e-5))
    True
    """
    sos_bank = np.asarray(sos_bank, dtype=np.float64)
    if sos_bank.ndim == 2:
        sos_bank = sos_bank[None]
    padlen = _bank_padlen(sos_bank)

    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    n = x.shape[-1]
    if n <= padlen:
        raise ValueError(
            f"The length of the input vector x must be greater than "
            f"padlen, which is {padlen}."
        )
    batch = x.shape[:-1]
    x2 = x.reshape(-1, n)

    M, v, b0, Mpows, M_lo, v_lo = _bank_params(sos_bank, n + 2 * padlen)
    zi_unit = np.stack([sosfilt_zi(s) for s in sos_bank])  # (B, S, 2)
    zi_unit = jnp.asarray(zi_unit, dtype=x.dtype)
    out = _bank_filtfilt_core(x2, M, v, b0, Mpows, zi_unit, M_lo, v_lo,
                              padlen=padlen)
    return out.reshape(batch + out.shape[1:])
