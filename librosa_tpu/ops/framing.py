"""Device-side framing and overlap-add kernels.

These are the TPU-native replacements for the reference's stride-trick
framing (``librosa/util/utils.py:79``) and numba overlap-add
(``librosa/core/spectrum.py:629``).  Framing is a static gather that XLA
fuses into downstream windowing/FFT/matmul; overlap-add uses a
reshape-and-shift formulation (no scatter) when ``n_fft % hop == 0`` and a
scatter-add fallback otherwise.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["frame_signal", "overlap_add"]


def frame_signal(y: jax.Array, *, frame_length: int, hop_length: int) -> jax.Array:
    """Frame a signal along its last axis → ``(..., n_frames, frame_length)``.

    Time-major frame layout (contiguous frames) so the following
    window-multiply + DFT matmul/rfft reads unit-stride rows.

    Fast path (``hop_length | frame_length``, the standard configuration):
    reshape the signal into hop-sized rows and concatenate ``r`` shifted row
    slices — pure slicing, no gather, no index constants.  TPU gathers of
    (T, n_fft) indices are both slow and embed a huge index literal in the
    program; this path avoids both.  Irregular hops fall back to a gather.
    """
    n = y.shape[-1]
    if n < frame_length:
        # reference behavior (util/utils.py:214): a clean error instead of
        # the shape mismatch the slice arithmetic below would produce
        from ..util.exceptions import ParameterError

        raise ParameterError(
            f"Input is too short (n={n:d}) for frame_length={frame_length:d}"
        )
    n_frames = 1 + (n - frame_length) // hop_length

    if frame_length % hop_length == 0:
        r = frame_length // hop_length
        rows = n // hop_length
        lead = y.shape[:-1]
        rows_arr = y[..., : rows * hop_length].reshape(*lead, rows, hop_length)
        parts = [rows_arr[..., k : k + n_frames, :] for k in range(r)]
        return jnp.concatenate(parts, axis=-1)

    idx = (
        np.arange(frame_length)[None, :]
        + hop_length * np.arange(n_frames)[:, None]
    )
    return jnp.take(y, jnp.asarray(idx), axis=-1)


def overlap_add(frames: jax.Array, *, hop_length: int) -> jax.Array:
    """Overlap-add frames ``(..., n_frames, frame_length)`` → ``(..., L)``.

    ``L = frame_length + hop_length * (n_frames - 1)``.

    Fast path (``frame_length % hop_length == 0``): split each frame into
    ``r = frame_length // hop_length`` hop-sized chunks and accumulate ``r``
    shifted block adds — pure slice arithmetic, no scatter, so XLA lowers it
    to ``r`` fused vector adds.  Irregular hops fall back to scatter-add.
    """
    *lead, n_frames, frame_length = frames.shape
    out_len = frame_length + hop_length * (n_frames - 1)

    if frame_length % hop_length == 0:
        r = frame_length // hop_length
        # (..., T, r, hop)
        fr = frames.reshape(*lead, n_frames, r, hop_length)
        nd = fr.ndim - 1  # ndim after dropping the r axis
        buf = None
        for k in range(r):
            pad = [(0, 0)] * nd
            pad[-2] = (k, r - 1 - k)
            shifted = jnp.pad(fr[..., :, k, :], pad)
            buf = shifted if buf is None else buf + shifted
        return buf.reshape(*lead, (n_frames + r - 1) * hop_length)[..., :out_len]

    # General path: scatter-add with a static index map
    idx = (
        np.arange(frame_length)[None, :]
        + hop_length * np.arange(n_frames)[:, None]
    ).reshape(-1)
    flat = frames.reshape(*lead, n_frames * frame_length)
    out = jnp.zeros((*lead, out_len), dtype=frames.dtype)
    return out.at[..., jnp.asarray(idx)].add(flat)
