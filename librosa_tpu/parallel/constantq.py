"""Time-sharded constant-Q transform: the recursive ladder with halos.

The VQT ladder (reference ``constantq.py:1056-1100``) is a sequential chain
— each octave's signal is the previous octave's half-rate resample — but
every stage is locally supported: STFT frames need an ``n_fft_i`` window
halo, and the polyphase half-band downsampler needs ``~20`` filter taps of
halo.  Both move with ``lax.ppermute`` neighbor sends, so the WHOLE ladder
runs inside one ``shard_map``: each shard holds a contiguous time block at
every rate of the ladder, exchanging only halos (SURVEY §2.3, "recursive
ladder halos").

Output matches the unsharded ``cqt(..., res_type='polyphase')`` to f32
reduction-order error: every frame at every octave sees exactly the same
samples, windows, and bases.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import filters
from ..core import audio
from ..core.constantq import (
    _early_downsample_count,
    _et_relative_bw,
    _trim_stack,
    _vqt_filter_fft,
)
from ..core.convert import cqt_frequencies, note_to_hz
from ..core.spectrum import _win_device
from ..util import utils as util
from ..util.exceptions import ParameterError
from .sharded import _final_frame, _local_frames

__all__ = ["cqt_sharded"]


def _decimate_local(cur, h, factor, *, axis_name, n_devices, halo):
    """Halo-exchanged polyphase ``factor``:1 decimation, matching
    ``resample(..., orig_sr=factor, target_sr=1, res_type='polyphase',
    scale=True)`` on the unsharded signal.

    ``halo`` must be a multiple of ``factor`` so the decimation phase is
    preserved across the shard boundary.  Edge shards see zeros —
    identical to the global zero-padded convolution boundary.
    """
    per = cur.shape[-1]
    left = jax.lax.ppermute(
        cur[..., per - halo:], axis_name,
        [(i, i + 1) for i in range(n_devices - 1)],
    )
    right = jax.lax.ppermute(
        cur[..., :halo], axis_name,
        [(i + 1, i) for i in range(n_devices - 1)],
    )
    ext = jnp.concatenate([left, cur, right], axis=-1)
    # centered FIR then stride-`factor` sampling of the valid interior
    pads = [(0, 0)] * ext.ndim
    taps = h.shape[0]
    half = (taps - 1) // 2
    pads[-1] = (half, half)
    ext_p = jnp.pad(ext, pads)
    lead = ext_p.shape[:-1]
    win = ext_p.reshape(-1, 1, ext_p.shape[-1])
    ker = h[None, None, ::-1]
    conv = jax.lax.conv_general_dilated(
        win, ker.astype(win.dtype), window_strides=(factor,),
        padding="VALID", dimension_numbers=("NCH", "IOH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    conv = conv.reshape(lead + (conv.shape[-1],))
    # ext position of global output sample factor·k is halo + factor·k_loc,
    # so local outputs start at stride index halo // factor.
    out = conv[..., halo // factor: halo // factor + per // factor]
    return out * np.sqrt(float(factor))


def cqt_sharded(
    y: Any,
    *,
    mesh: Mesh,
    axis_name: str = "time",
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    filter_scale: float = 1,
    norm: Optional[float] = 1,
    sparsity: float = 0.01,
    window: Any = "hann",
    scale: bool = True,
    pad_mode: str = "constant",
    dtype: Any = None,
) -> jax.Array:
    """Time-sharded CQT; equals ``cqt(y, ..., res_type='polyphase')``.

    The full recursive ladder runs on a device mesh with the signal
    split along time: each octave's 2:1 polyphase decimation and
    windowed response are computed per-shard, with filter-reach halos
    exchanged between neighbors over ICI (``ppermute``) at every rung so
    octave boundaries are seam-free — numerically ~5e-7 of the unsharded
    transform (``test_parallel.py``).  SCALING.md derives the
    communication model (halo bytes are 5–6 orders below ICI capacity).

    Requirements: no early downsampling for this configuration, ``n``
    divisible by ``D * hop_length``, ``hop_length`` divisible by
    ``2**(n_octaves-1)``, and every shard at least ``n_fft`` samples at
    every rate of the ladder.

    Parameters
    ----------
    y : array [shape=(n,)] — audio to transform
    mesh, axis_name : the device mesh and its time-axis name
    (remaining parameters as in :func:`librosa_tpu.cqt`)

    Returns
    -------
    C : jax.Array [shape=(n_bins, t)] — constant-Q spectrogram
    """
    y = jnp.asarray(y)
    if fmin is None:
        fmin = note_to_hz("C1")
    if dtype is None:
        dtype = util.dtype_r2c(y.dtype)

    freqs = cqt_frequencies(
        n_bins=n_bins, fmin=fmin, bins_per_octave=bins_per_octave
    )
    if n_bins == 1:
        alpha = _et_relative_bw(bins_per_octave)
    else:
        alpha = filters._relative_bandwidth(freqs=freqs)
    lengths, filter_cutoff = filters.wavelet_lengths(
        freqs=freqs, sr=sr, window=window, filter_scale=filter_scale,
        gamma=0, alpha=alpha,
    )
    nyquist = sr / 2.0
    if filter_cutoff > nyquist:
        raise ParameterError("Wavelet basis exceeds Nyquist")

    n_octaves = int(np.ceil(float(n_bins) / bins_per_octave))
    n_filters = min(bins_per_octave, n_bins)
    early = 2 ** _early_downsample_count(
        nyquist, filter_cutoff, hop_length, n_octaves
    )

    n = y.shape[-1]
    D = mesh.shape[axis_name]
    if n % (D * hop_length) != 0:
        raise ParameterError(
            f"Signal length {n} must be divisible by D*hop = {D * hop_length}"
        )
    if early > 1:
        hop_length //= early
        sr = sr / float(early)
        # the final 1/sqrt(lengths) scaling uses the working (post-early)
        # rate, exactly like the unsharded vqt's closing wavelet_lengths call
        lengths, _ = filters.wavelet_lengths(
            freqs=freqs, sr=sr, window=window, filter_scale=filter_scale,
            gamma=0, alpha=alpha,
        )

    # ---- static ladder plan (mirrors core.constantq.vqt) ------------------
    plan = []           # (n_fft, hop, resample_after, basis)
    my_sr, my_hop = float(sr), hop_length
    for i in range(n_octaves):
        sl = (
            slice(-n_filters, None) if i == 0
            else slice(-n_filters * (i + 1), -n_filters * i)
        )
        fft_basis, n_fft_i, _ = _vqt_filter_fft(
            my_sr, freqs[sl], filter_scale, norm, sparsity, window=window,
            gamma=0, dtype=dtype, alpha=alpha[sl],
        )
        fft_basis = fft_basis * np.sqrt(sr / my_sr)
        resample_after = False
        if i < n_octaves - 1:
            f_max_next = freqs[sl.start - 1]
            if my_hop % 2 == 0 and f_max_next <= my_sr / 5:
                resample_after = True
                my_hop //= 2
                my_sr /= 2.0
        plan.append((n_fft_i, my_hop * (2 if resample_after else 1),
                     resample_after, jnp.asarray(fft_basis)))
        per_at_i = (n // D) // (early * 2 ** i)
        if per_at_i < n_fft_i:
            raise ParameterError(
                f"Shard length {per_at_i} at octave {i} below n_fft={n_fft_i}"
            )

    h_half = jnp.asarray(audio._poly_filter(1, 2), dtype=jnp.float32)
    taps = int(h_half.shape[0])
    halo = -(-taps // 2) * 2                     # even halo preserves phase
    if early > 1:
        h_early = jnp.asarray(
            audio._poly_filter(1, early), dtype=jnp.float32
        )
        halo_early = -(-int(h_early.shape[0]) // early) * early
    else:
        h_early = h_half                         # unused placeholder
        halo_early = 0

    windows = [
        _win_device("ones", nf, nf, jnp.float32) for nf, _, _, _ in plan
    ]

    in_spec = P(*((None,) * (y.ndim - 1) + (axis_name,)))
    resp_spec = P(*((None,) * y.ndim + (axis_name,)))
    tail_spec = P(*((None,) * (y.ndim - 1) + (axis_name,)))

    def local(y_loc, *consts):
        ws = consts[: n_octaves]
        bases = consts[n_octaves: 2 * n_octaves]
        hh = consts[2 * n_octaves]
        he = consts[2 * n_octaves + 1]
        resps = []
        tails = []
        cur = y_loc
        if early > 1:
            cur = _decimate_local(
                cur, he, early, axis_name=axis_name, n_devices=D,
                halo=halo_early,
            )
            if not scale:
                cur = cur * np.sqrt(float(early))
        for i, (n_fft_i, hop_i, resample_after, _) in enumerate(plan):
            fr = _local_frames(
                cur, ws[i], axis_name=axis_name, n_devices=D,
                n_fft=n_fft_i, hop_length=hop_i, pad_mode=pad_mode,
            )
            spec = jnp.fft.rfft(fr, axis=-1)
            resp = jnp.einsum(
                "cf,...tf->...ct", bases[i].astype(spec.dtype), spec,
                precision=jax.lax.Precision.HIGHEST,
            )
            resps.append(resp)
            # each shard exports its signal tail so the host can build the
            # one trailing centered frame of this octave
            tails.append(cur[..., -n_fft_i:])
            if resample_after:
                cur = _decimate_local(
                    cur, hh, 2, axis_name=axis_name, n_devices=D, halo=halo
                )
        return tuple(resps) + tuple(tails)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(in_spec,) + (P(),) * (2 * n_octaves + 2),
        out_specs=tuple(resp_spec for _ in plan)
        + tuple(tail_spec for _ in plan),
        check_vma=False,
    )
    outs = fn(y, *windows, *[p[3] for p in plan], h_half, h_early)
    resps_main = list(outs[:n_octaves])
    tails = outs[n_octaves:]

    # trailing centered frame per octave (host side, tiny)
    resps = []
    for i, (n_fft_i, hop_i, _, basis_i) in enumerate(plan):
        tail_sig = tails[i][..., -n_fft_i:]  # last shard's tail
        fr_last = _final_frame(
            tail_sig, windows[i], n_fft=n_fft_i, pad_mode=pad_mode
        )
        spec_last = jnp.fft.rfft(fr_last, axis=-1)
        resp_last = jnp.einsum(
            "cf,...f->...c", basis_i.astype(spec_last.dtype), spec_last,
            precision=jax.lax.Precision.HIGHEST,
        )[..., None]
        resps.append(
            jnp.concatenate([resps_main[i], resp_last], axis=-1)
        )

    if scale:
        scales = (1.0 / np.sqrt(lengths)).astype(np.float32)
    else:
        scales = np.ones(n_bins, dtype=np.float32)

    V = _trim_stack(resps, n_bins, jnp.dtype(dtype))
    sc = util.expand_to(
        jnp.asarray(scales).astype(V.real.dtype), ndim=V.ndim, axes=-2
    )
    return V * sc
