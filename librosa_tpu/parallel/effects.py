"""Time-sharded harmonic/percussive separation (overlap-save HPSS).

The full ``effects.hpss`` chain — centered STFT, median-filter masks,
2× inverse STFT — runs seam-free on a time mesh.  Unlike the pure
spectrogram shards (``parallel.sharded``), HPSS couples shards in TWO
places:

- the harmonic median filter looks ``kernel_size//2`` frames along time
  past the shard boundary;
- the inverse overlap-add draws on frames up to ``n_fft//hop`` outside
  the owned sample span.

Rather than exchanging outputs, each shard overlap-SAVES: it receives a
signal halo wide enough to rebuild every frame its owned samples depend
on (plus the median's reach), runs the whole chain locally on the
extended frame set, and slices out exactly its owned samples.  A frame
validity mask reproduces the global frame grid (invalid halo frames
contribute neither signal nor window energy), and out-of-range frames
feeding the time median are gathered by the same symmetric reflection
``scipy.ndimage`` applies at the global edges — so the result matches
the unsharded ``effects.hpss`` to float precision.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.spectrum import _win_device
from ..ops.framing import frame_signal, overlap_add
from ..ops.median import median_filter_1d
from ..util import utils as util
from ..util.exceptions import ParameterError

__all__ = ["hpss_sharded"]


def hpss_sharded(
    y: Any,
    *,
    mesh: Mesh,
    axis_name: str = "time",
    kernel_size: int = 31,
    power: float = 2.0,
    margin: float = 1.0,
    n_fft: int = 2048,
    hop_length: int = 512,
    window: str = "hann",
    pad_mode: str = "constant",
) -> Tuple[jax.Array, jax.Array]:
    """``effects.hpss`` over a time-sharded signal, seam-free.

    Parameters
    ----------
    y : array [shape=(..., n)]
        input signal; ``n`` must divide evenly into ``D * hop_length``
        blocks and every shard must be wide enough to source its halos
        (``n/D >= (n_fft//hop + 2*(kernel//2)) * hop + n_fft``)
    mesh : jax.sharding.Mesh
        device mesh (see ``parallel.time_mesh``)
    axis_name : str
        mesh axis carrying time
    kernel_size : int or (int, int)
        median filter lengths (harmonic=time, percussive=frequency)
    power, margin
        soft-mask separation controls, as in ``decompose.hpss``
        (scalar margins only on the sharded path)
    n_fft, hop_length, window, pad_mode
        STFT round-trip controls

    Returns
    -------
    y_harm, y_perc : jax.Array [shape=(..., n)]
        separated components, sharded over time

    See Also
    --------
    librosa_tpu.effects.hpss, stft_sharded
    """
    if pad_mode not in ("constant", "reflect"):
        raise ParameterError(f"Unsupported sharded pad_mode: {pad_mode}")
    if isinstance(kernel_size, (tuple, list)):
        win_harm, win_perc = int(kernel_size[0]), int(kernel_size[1])
    else:
        win_harm = win_perc = int(kernel_size)
    if isinstance(margin, (tuple, list)):
        margin_harm, margin_perc = float(margin[0]), float(margin[1])
    else:
        margin_harm = margin_perc = float(margin)
    if margin_harm < 1 or margin_perc < 1:
        raise ParameterError("Margins must be >= 1.0.")

    y = jnp.asarray(y)
    n = y.shape[-1]
    D = mesh.shape[axis_name]
    if n % (D * hop_length) != 0:
        raise ParameterError(
            f"Signal length {n} must divide into D*hop = {D * hop_length} "
            "blocks for seam-free sharding"
        )
    per = n // D
    t_loc = per // hop_length
    t_total = n // hop_length          # last global frame index (inclusive)
    lh = n_fft // 2
    kh_t = win_harm // 2

    # frame halo: istft reach (n_fft/hop) + median reach with margin
    F = n_fft // hop_length + 2 * max(kh_t, 1)
    hl = F * hop_length + lh                     # left signal halo
    l_ext = (t_loc + 2 * F - 1) * hop_length + n_fft
    hr = l_ext - hl - per                        # right signal halo
    if per < max(hl, hr):
        raise ParameterError(
            f"Shard size {per} too small for halo {max(hl, hr)} "
            f"(n_fft={n_fft}, kernel={win_harm})"
        )

    window_dev = _win_device(window, n_fft, n_fft, y.dtype)
    split_zeros = margin_harm == 1 and margin_perc == 1

    in_spec = P(*((None,) * (y.ndim - 1) + (axis_name,)))
    out_spec = in_spec

    def local(y_loc: jax.Array, w: jax.Array):
        d = jax.lax.axis_index(axis_name)

        # ---- build the extended signal (overlap-save input) ----------
        left = jax.lax.ppermute(
            y_loc[..., per - hl:], axis_name,
            [(i, i + 1) for i in range(D - 1)],
        )
        if pad_mode == "reflect":
            # global left edge: [zeros for masked frames | reflect pad]
            refl = y_loc[..., 1: lh + 1][..., ::-1]
            zpad = jnp.zeros(y_loc.shape[:-1] + (hl - lh,), y_loc.dtype)
            left = jnp.where(
                d == 0, jnp.concatenate([zpad, refl], axis=-1), left
            )
        else:
            left = jnp.where(d == 0, jnp.zeros_like(left), left)

        right = jax.lax.ppermute(
            y_loc[..., :hr], axis_name,
            [(i + 1, i) for i in range(D - 1)],
        )
        if pad_mode == "reflect":
            refl = y_loc[..., per - lh - 1: per - 1][..., ::-1]
            zpad = jnp.zeros(y_loc.shape[:-1] + (hr - lh,), y_loc.dtype)
            right = jnp.where(
                d == D - 1, jnp.concatenate([refl, zpad], axis=-1), right
            )
        else:
            right = jnp.where(d == D - 1, jnp.zeros_like(right), right)

        y_ext = jnp.concatenate([left, y_loc, right], axis=-1)

        # ---- frame grid & validity ----------------------------------
        frames = frame_signal(
            y_ext, frame_length=n_fft, hop_length=hop_length
        )                                          # (..., T_ext, n_fft)
        t_ext = frames.shape[-2]
        local_i = jnp.arange(t_ext)
        g = d * t_loc - F + local_i                # global frame indices
        valid = (g >= 0) & (g <= t_total)

        spec = jnp.fft.rfft(frames * w, axis=-1)   # (..., T_ext, bins)

        # gather by the global symmetric reflection so the time median at
        # the global edges sees the same neighborhood as the unsharded
        # scipy-'symmetric' padding
        g_ref = jnp.where(g < 0, -g - 1, g)
        g_ref = jnp.where(g_ref > t_total, 2 * t_total + 1 - g_ref, g_ref)
        j = jnp.clip(g_ref - (d * t_loc - F), 0, t_ext - 1)
        spec = jnp.take(spec, j, axis=-2)

        mags = jnp.abs(spec)                       # (..., T_ext, bins)
        harm = median_filter_1d(mags, size=win_harm, axis=-2)   # time
        perc = median_filter_1d(mags, size=win_perc, axis=-1)   # freq

        mask_harm = util.softmask(
            harm, perc * margin_harm, power=power, split_zeros=split_zeros
        )
        mask_perc = util.softmask(
            perc, harm * margin_perc, power=power, split_zeros=split_zeros
        )

        # ---- local inverse overlap-add (masked frame grid) -----------
        m = jnp.where(valid, 1.0, 0.0).astype(w.dtype)

        def ola(mask):
            fr = jnp.fft.irfft(spec * mask, n=n_fft, axis=-1)
            fr = fr * w * m[..., None]
            return overlap_add(fr, hop_length=hop_length)

        wss_frames = jnp.broadcast_to(
            (w * w)[None, :], (t_ext, n_fft)
        ) * m[:, None]
        wss = overlap_add(wss_frames, hop_length=hop_length)
        good = wss > util.tiny(wss)
        denom = jnp.where(good, wss, 1.0)

        # owned samples start at padded coord lh + d*per; the extended
        # buffer starts at padded coord (d*t_loc - F)*hop
        off = lh + F * hop_length

        def finish(mask):
            out = ola(mask)
            out = jnp.where(good, out / denom, out)
            return out[..., off: off + per]

        return finish(mask_harm), finish(mask_perc)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(in_spec, P()),
        out_specs=(out_spec, out_spec),
        check_vma=False,
    )
    return fn(y, window_dev)
