"""Seam-free sharded spectrograms via overlap-save halo exchange.

A centered STFT frame ``t`` depends only on samples
``[t*hop - n_fft//2, t*hop + n_fft - n_fft//2)`` — the same legality window
the reference's blockwise streaming uses (``librosa/core/audio.py:223``,
overlap ``frame_length - hop_length``).  Sharding a signal by contiguous
time-blocks therefore needs:

- a left halo of ``n_fft//2`` samples from the left neighbor,
- a right halo of ``n_fft - hop - n_fft//2`` samples from the right neighbor,
- the global centered pad applied only at edge shards.

Halos move with ``lax.ppermute`` neighbor sends (ICI within a slice, DCN
across).  Outputs are **bit-identical** to the unsharded computation: every
frame sees exactly the same samples and the same window, and the per-frame
rFFT/matmul is deterministic.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import filters
from ..core.spectrum import _win_device
from ..ops.framing import frame_signal
from ..util.exceptions import ParameterError

__all__ = ["stft_sharded", "melspectrogram_sharded"]


def _halo_sizes(n_fft: int, hop_length: int):
    lh = n_fft // 2
    rh = max(0, n_fft - hop_length - n_fft // 2)
    return lh, rh


def _local_frames(
    y_loc: jax.Array,
    window: jax.Array,
    *,
    axis_name: str,
    n_devices: int,
    n_fft: int,
    hop_length: int,
    pad_mode: str,
) -> jax.Array:
    """Per-shard framing with halo exchange.  Returns (..., T_loc, n_fft)·win."""
    per = y_loc.shape[-1]
    lh, rh = _halo_sizes(n_fft, hop_length)
    d = jax.lax.axis_index(axis_name)

    parts = []
    if lh > 0:
        # receive the left neighbor's tail (shift right along the ring)
        left = jax.lax.ppermute(
            y_loc[..., per - lh :],
            axis_name,
            [(i, i + 1) for i in range(n_devices - 1)],
        )
        if pad_mode == "reflect":
            # global left edge: reflect the head of shard 0's own samples
            refl = y_loc[..., 1 : lh + 1][..., ::-1]
            left = jnp.where(d == 0, refl, left)
        # constant pad: ppermute already yields zeros on shard 0
        parts.append(left)
    parts.append(y_loc)
    if rh > 0:
        right = jax.lax.ppermute(
            y_loc[..., :rh],
            axis_name,
            [(i + 1, i) for i in range(n_devices - 1)],
        )
        if pad_mode == "reflect":
            refl = y_loc[..., per - rh - 1 : per - 1][..., ::-1]
            right = jnp.where(d == n_devices - 1, refl, right)
        parts.append(right)

    y_ext = jnp.concatenate(parts, axis=-1)
    frames = frame_signal(y_ext, frame_length=n_fft, hop_length=hop_length)
    return frames * window


def _final_frame(
    y: jax.Array, window: jax.Array, *, n_fft: int, pad_mode: str
) -> jax.Array:
    """The one trailing centered frame (t = n//hop) that spans the right pad."""
    # Frame covers y[n - n_fft//2 : n + (n_fft - n_fft//2)); the reflect pad
    # sources up to n_fft//2 + 1 samples of lookback, so take a full n_fft
    # tail and slice the last n_fft of the padded result.
    L = min(y.shape[-1], n_fft)
    tail = y[..., -L:]
    pad = [(0, 0)] * y.ndim
    pad[-1] = (0, n_fft // 2)
    tail_ext = jnp.pad(tail, pad, mode=pad_mode)
    return tail_ext[..., -n_fft:] * window


def stft_sharded(
    y: Any,
    *,
    mesh: Mesh,
    axis_name: str = "time",
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: Any = "hann",
    pad_mode: str = "constant",
) -> jax.Array:
    """Centered STFT of a time-sharded signal; bit-identical to ``stft``.

    Each device frames its own contiguous signal span; the ``n_fft - hop``
    halo samples a shard needs from its neighbors arrive via one
    ``ppermute`` exchange inside the shard_map, so no frame straddles a
    seam and the concatenated result equals the unsharded transform
    exactly (tested bit-identical on an 8-device mesh).

    Parameters
    ----------
    y : array [shape=(..., n)]
        input signal; ``n % (D * hop_length) == 0`` where D is the mesh
        size along ``axis_name``, and each shard must span >= ``n_fft``
        samples
    mesh : jax.sharding.Mesh
        device mesh (see ``parallel.time_mesh``)
    axis_name : str
        mesh axis to shard time over
    n_fft, hop_length, win_length, window, pad_mode
        STFT controls, as in :func:`librosa_tpu.stft`

    Returns
    -------
    D_sharded : jax.Array [shape=(..., 1 + n_fft//2, n // hop_length)]
        complex spectrogram, sharded over frames

    See Also
    --------
    melspectrogram_sharded, librosa_tpu.stft
    """
    if pad_mode not in ("constant", "reflect"):
        raise ParameterError(f"Unsupported sharded pad_mode: {pad_mode}")
    if win_length is None:
        win_length = n_fft

    y = jnp.asarray(y)
    n = y.shape[-1]
    D = mesh.shape[axis_name]
    if n % (D * hop_length) != 0:
        raise ParameterError(
            f"Signal length {n} must be divisible by D*hop = {D * hop_length} "
            "for seam-free time sharding"
        )
    per = n // D
    lh, rh = _halo_sizes(n_fft, hop_length)
    if per < max(n_fft, lh + 1, rh + 1):
        raise ParameterError(
            f"Shard size {per} too small for n_fft={n_fft} halos"
        )

    window_dev = _win_device(window, win_length, n_fft, y.dtype)

    in_spec = P(*((None,) * (y.ndim - 1) + (axis_name,)))
    out_spec = P(*((None,) * y.ndim + (axis_name,)))  # (..., n_fft, T) sharded on T

    def local(y_loc: jax.Array, w: jax.Array) -> jax.Array:
        fr = _local_frames(
            y_loc,
            w,
            axis_name=axis_name,
            n_devices=D,
            n_fft=n_fft,
            hop_length=hop_length,
            pad_mode=pad_mode,
        )
        spec = jnp.fft.rfft(fr, axis=-1)
        return jnp.swapaxes(spec, -2, -1)  # (..., F, T_loc)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(in_spec, P()),
        out_specs=out_spec,
        check_vma=False,
    )
    S_main = fn(y, window_dev)

    # trailing frame (t = n // hop) — spans the global right pad
    last = jnp.fft.rfft(
        _final_frame(y, window_dev, n_fft=n_fft, pad_mode=pad_mode), axis=-1
    )[..., None]
    return jnp.concatenate([S_main, last], axis=-1)


def melspectrogram_sharded(
    y: Any,
    *,
    mesh: Mesh,
    axis_name: str = "time",
    sr: float = 22050,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: Any = "hann",
    pad_mode: str = "constant",
    power: float = 2.0,
    n_mels: int = 128,
    **mel_kwargs: Any,
) -> jax.Array:
    """Time-sharded fused STFT→|·|²→mel pipeline.

    The halo exchange of :func:`stft_sharded` feeds the per-shard fused
    power-mel program; the mel basis is replicated, so only the small
    ``(n_mels, T_local)`` outputs live on each device and nothing but
    the halos ever crosses shard boundaries (SCALING.md derives the
    resulting near-linear weak-scaling curve).

    Parameters
    ----------
    y : array [shape=(..., n)]
        input signal, same divisibility requirements as ``stft_sharded``
    mesh : jax.sharding.Mesh
        device mesh
    axis_name : str
        mesh axis to shard time over
    sr, n_fft, hop_length, win_length, window, pad_mode
        STFT/mel controls
    **mel_kwargs
        mel filterbank controls (``n_mels``, ``fmax``, ...)

    Returns
    -------
    M : jax.Array [shape=(..., n_mels, n // hop_length)]
        mel spectrogram, sharded over frames

    See Also
    --------
    stft_sharded, librosa_tpu.feature.melspectrogram
    """
    if win_length is None:
        win_length = n_fft

    y = jnp.asarray(y)
    n = y.shape[-1]
    D = mesh.shape[axis_name]
    if n % (D * hop_length) != 0:
        raise ParameterError(
            f"Signal length {n} must be divisible by D*hop = {D * hop_length}"
        )

    window_dev = _win_device(window, win_length, n_fft, y.dtype)
    basis = jnp.asarray(
        filters.mel(sr=sr, n_fft=n_fft, n_mels=n_mels, **mel_kwargs),
        dtype=y.dtype,
    )

    in_spec = P(*((None,) * (y.ndim - 1) + (axis_name,)))
    out_spec = P(*((None,) * y.ndim + (axis_name,)))

    def local(y_loc: jax.Array, w: jax.Array, mb: jax.Array) -> jax.Array:
        fr = _local_frames(
            y_loc,
            w,
            axis_name=axis_name,
            n_devices=D,
            n_fft=n_fft,
            hop_length=hop_length,
            pad_mode=pad_mode,
        )
        spec = jnp.fft.rfft(fr, axis=-1)
        pw = (spec.real**2 + spec.imag**2) ** (power / 2)
        mel_loc = jnp.einsum(
            "...tf,mf->...mt", pw, mb, precision=jax.lax.Precision.HIGHEST
        )
        return mel_loc

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(in_spec, P(), P()),
        out_specs=out_spec,
        check_vma=False,
    )
    M_main = fn(y, window_dev, basis)

    lastf = jnp.fft.rfft(
        _final_frame(y, window_dev, n_fft=n_fft, pad_mode=pad_mode), axis=-1
    )
    last_pw = (lastf.real**2 + lastf.imag**2) ** (power / 2)
    last_mel = jnp.einsum(
        "...f,mf->...m", last_pw, basis, precision=jax.lax.Precision.HIGHEST
    )[..., None]
    return jnp.concatenate([M_main, last_mel], axis=-1)
