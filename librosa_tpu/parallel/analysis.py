"""Sharded analysis chains: onset → tempo, and cross-shard PCEN.

These widen the time-sharded surface beyond spectrograms (SURVEY §2.3):

- ``onset_strength_sharded`` — the spectral-flux novelty chain with its
  *global* reductions done as collectives: the ``top_db`` clamp inside
  ``power_to_db`` depends on the max over ALL frames (reference
  ``core/spectrum.py:1735``), computed here with ``lax.pmax`` across
  shards; the lagged first difference needs a ``lag``-frame halo from the
  left neighbor (``lax.ppermute``).  Output equals the unsharded
  ``onset.onset_strength`` bit-for-bit up to f32 reduction order.
- ``tempo_sharded`` — sharded envelope, then the tiny (T,) envelope is
  gathered and the tempogram/prior argmax runs replicated: the reference
  itself calls the DP-style analyses "not streamable"
  (``core/audio.py:261``), so decomposed-data-then-gather is the design.
- ``pcen_sharded`` — the per-channel energy normalization IIR smoother
  across time shards.  A first-order filter composes affinely, so each
  shard computes its local scan plus its (decay, offset) boundary
  composition; an ``all_gather`` of the D tiny boundary terms lets every
  shard reconstruct its true carry-in (cross-shard prefix state, the
  distributed analogue of ``pcen(zi=...)`` streaming).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import filters
from ..core.spectrum import _win_device
from ..util.exceptions import ParameterError
from .sharded import _final_frame, _halo_sizes, _local_frames

__all__ = [
    "onset_strength_sharded",
    "tempo_sharded",
    "pcen_sharded",
    "pyin_sharded",
    "beat_track_sharded",
]

_AMIN = 1e-10
_TOP_DB = 80.0


def onset_strength_sharded(
    y: Any,
    *,
    mesh: Mesh,
    axis_name: str = "time",
    sr: float = 22050,
    n_fft: int = 2048,
    hop_length: int = 512,
    lag: int = 1,
    n_mels: int = 128,
    center: bool = True,
    pad_mode: str = "constant",
    aggregate: Any = jnp.mean,
) -> jax.Array:
    """Spectral-flux onset envelope of a time-sharded signal.

    Matches ``onset.onset_strength(y=y, sr=sr, aggregate=aggregate)`` on
    the same signal; ``aggregate`` reduces the mel-channel axis per frame
    (pointwise in time, so it shards freely).  Same legality constraints
    as ``stft_sharded``: n divisible by D·hop, shards ≥ n_fft samples.
    """
    y = jnp.asarray(y)
    n = y.shape[-1]
    D = mesh.shape[axis_name]
    if n % (D * hop_length) != 0:
        raise ParameterError(
            f"Signal length {n} must be divisible by D*hop = {D * hop_length}"
        )
    t_loc = (n // D) // hop_length
    if lag >= t_loc:
        raise ParameterError(f"lag={lag} must be < frames per shard {t_loc}")

    window_dev = _win_device("hann", n_fft, n_fft, y.dtype)
    basis = jnp.asarray(
        filters.mel(sr=sr, n_fft=n_fft, n_mels=n_mels, fmax=0.5 * sr),
        dtype=y.dtype,
    )

    # Trailing centered frame (t = n // hop): its mel power participates in
    # the global dB clamp, so its max is fed into the shard_map.
    tail_fr = _final_frame(y, window_dev, n_fft=n_fft, pad_mode=pad_mode)
    tail_spec = jnp.fft.rfft(tail_fr, axis=-1)
    tail_pw = tail_spec.real**2 + tail_spec.imag**2
    tail_mel = jnp.einsum(
        "...f,mf->...m", tail_pw, basis, precision=jax.lax.Precision.HIGHEST
    )[..., None]                                       # (..., n_mels, 1)
    tail_log = 10.0 * jnp.log10(jnp.maximum(_AMIN, tail_mel))
    tail_max = jnp.max(tail_log)

    in_spec = P(*((None,) * (y.ndim - 1) + (axis_name,)))
    env_spec = P(*((None,) * (y.ndim - 1) + (axis_name,)))
    col_spec = P(*((None,) * y.ndim + (axis_name,)))

    def local(y_loc, w, mb, tmax):
        fr = _local_frames(
            y_loc, w, axis_name=axis_name, n_devices=D, n_fft=n_fft,
            hop_length=hop_length, pad_mode=pad_mode,
        )
        spec = jnp.fft.rfft(fr, axis=-1)
        pw = spec.real**2 + spec.imag**2
        mel = jnp.einsum(
            "...tf,mf->...mt", pw, mb, precision=jax.lax.Precision.HIGHEST
        )                                               # (..., n_mels, T_loc)
        log_s = 10.0 * jnp.log10(jnp.maximum(_AMIN, mel))
        gmax = jnp.maximum(jax.lax.pmax(jnp.max(log_s), axis_name), tmax[0])
        s_db = jnp.maximum(log_s, gmax - _TOP_DB)

        # left halo: the previous shard's last `lag` dB frames
        halo = jax.lax.ppermute(
            s_db[..., -lag:], axis_name,
            [(i, i + 1) for i in range(D - 1)],
        )
        prev = jnp.concatenate([halo, s_db[..., :-lag]], axis=-1)
        flux = jnp.maximum(0.0, s_db - prev)

        # global frames g < lag have no predecessor: mask them on shard 0
        d = jax.lax.axis_index(axis_name)
        g = d * t_loc + jnp.arange(t_loc)
        flux = jnp.where(g >= lag, flux, 0.0)

        env_loc = aggregate(flux, axis=-2)              # aggregate channels
        return env_loc, s_db[..., -lag:]                # + boundary columns

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(in_spec, P(), P(), P()),
        out_specs=(env_spec, col_spec),
        check_vma=False,
    )
    env_main, boundary_cols = fn(
        y, window_dev, basis, tail_max[None]
    )                                                   # (..., T-1), (..., n_mels, D*lag)

    # Tail flux: clamp the tail against the same global max, then diff
    # against the last shard's final dB frames.
    gmax_all = jnp.maximum(jnp.max(boundary_cols), tail_max)
    tail_db = jnp.maximum(tail_log, gmax_all - _TOP_DB)
    prev_cols = boundary_cols[..., -lag:]
    flux_tail = aggregate(
        jnp.maximum(0.0, tail_db[..., -1:] - prev_cols[..., :1]), axis=-2
    )

    flux_full = jnp.concatenate([env_main, flux_tail], axis=-1)  # (..., T)
    c = n_fft // (2 * hop_length) if center else 0
    if c:
        pads = [(0, 0)] * flux_full.ndim
        pads[-1] = (c, 0)
        flux_full = jnp.pad(flux_full, pads)[..., : n // hop_length + 1]
    return flux_full


def tempo_sharded(
    y: Any,
    *,
    mesh: Mesh,
    axis_name: str = "time",
    sr: float = 22050,
    hop_length: int = 512,
    **tempo_kwargs: Any,
) -> jax.Array:
    """Global tempo estimate of a time-sharded signal.

    The onset envelope — the part whose cost scales with signal length —
    is computed seam-free across the mesh by
    :func:`onset_strength_sharded` (STFT halos exchanged over ICI with
    ``ppermute``).  The envelope itself is tiny (one value per hop), so
    the tempogram autocorrelation and log-normal prior argmax run
    replicated after the implicit gather, exactly matching the
    single-device :func:`librosa_tpu.feature.tempo` result.

    Parameters
    ----------
    y : array [shape=(n,)]
        audio, length divisible by the mesh's time-axis size × hop
    mesh : jax.sharding.Mesh
        device mesh with a time axis named ``axis_name``
    sr, hop_length
        analysis parameters (as in ``feature.tempo``)
    **tempo_kwargs
        forwarded to :func:`librosa_tpu.feature.tempo`

    Returns
    -------
    tempo : jax.Array — estimated global tempo in BPM
    """
    from ..feature.rhythm import tempo as tempo_fn

    env = onset_strength_sharded(
        y, mesh=mesh, axis_name=axis_name, sr=sr, hop_length=hop_length
    )
    return tempo_fn(
        onset_envelope=np.asarray(env), sr=sr, hop_length=hop_length,
        **tempo_kwargs,
    )


def pcen_sharded(
    S: Any,
    *,
    mesh: Mesh,
    axis_name: str = "time",
    sr: float = 22050,
    hop_length: int = 512,
    gain: float = 0.98,
    bias: float = 2.0,
    power: float = 0.5,
    time_constant: float = 0.400,
    eps: float = 1e-6,
    b: Optional[float] = None,
) -> jax.Array:
    """PCEN over a time-sharded spectrogram (frames on the last axis).

    The exponential smoother M[t] = b·S[t] + (1−b)·M[t−1] is affine in its
    carry, so shard d's true input state is reconstructed from the gathered
    per-shard boundary compositions:

        M_in(d) = Σ_{k<d} (1−b)^{L·(d−1−k)} · p_k  (+ zi term),

    where ``p_k`` is shard k's zero-state response at its last frame.
    Matches unsharded ``pcen`` to f32 reassociation error (~1e-6 relative).
    """
    S = jnp.asarray(S)
    T = S.shape[-1]
    D = mesh.shape[axis_name]
    if T % D != 0:
        raise ParameterError(f"frame count {T} must be divisible by D={D}")
    L = T // D

    if b is None:
        t_frames = time_constant * sr / float(hop_length)
        b = (np.sqrt(1 + 4 * t_frames**2) - 1) / (2 * t_frames**2)
    b = float(b)
    decay = (1.0 - b) ** L

    in_spec = P(*((None,) * (S.ndim - 1) + (axis_name,)))
    out_spec = in_spec

    def local(s_loc):
        d = jax.lax.axis_index(axis_name)

        # Zero-state local smoother: m0[t] = b * Σ_{u≤t} (1-b)^(t-u) s[u]
        a = jnp.full(s_loc.shape, 1.0 - b, dtype=s_loc.dtype)
        xs = b * s_loc

        def combine(l, r):
            a_l, b_l = l
            a_r, b_r = r
            return a_l * a_r, b_r + a_r * b_l

        _, m0 = jax.lax.associative_scan(combine, (a, xs), axis=-1)

        # boundary zero-state response of this shard (tiny: one frame)
        p = m0[..., -1]
        p_all = jax.lax.all_gather(p, axis_name)        # (D, ...)

        # carry-in for shard d: geometric combination of earlier boundaries
        ks = jnp.arange(D)
        w = jnp.where(ks < d, decay ** (d - 1 - ks), 0.0)
        m_in = jnp.tensordot(w, p_all, axes=(0, 0))

        # steady-state init (zi = 1-b ⇒ M[-1] = 1): shard 0's carry is 1,
        # propagated through d·L decay steps into every later shard
        zi_carry = (1.0 - b) ** (jnp.asarray(d, s_loc.dtype) * L) * 1.0

        t = jnp.arange(L, dtype=s_loc.dtype)
        carry = m_in[..., None] + zi_carry
        m = m0 + (1.0 - b) ** (t + 1) * carry

        smooth = jnp.exp(-gain * (np.log(eps) + jnp.log1p(m / eps)))
        if power == 0:
            return jnp.log1p(s_loc * smooth)
        if bias == 0:
            return jnp.exp(power * (jnp.log(s_loc) + jnp.log(smooth)))
        return (bias**power) * jnp.expm1(
            power * jnp.log1p(s_loc * smooth / bias)
        )

    fn = shard_map(
        local, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec,
        check_vma=False,
    )
    return fn(S)


def pyin_sharded(
    y: Any,
    *,
    mesh: Mesh,
    axis_name: str = "time",
    fmin: float,
    fmax: float,
    sr: float = 22050,
    frame_length: int = 2048,
    hop_length: Optional[int] = None,
    n_thresholds: int = 100,
    beta_parameters: tuple = (2, 18),
    boltzmann_parameter: float = 2,
    resolution: float = 0.1,
    max_transition_rate: float = 35.92,
    switch_prob: float = 0.01,
    no_trough_prob: float = 0.01,
    fill_na: Optional[float] = np.nan,
    pad_mode: str = "constant",
    transition_min_prob: Optional[float] = 1e-4,
):
    """pYIN f0 of a time-sharded signal; matches ``pyin`` (center=True).

    The per-frame work — CMND, parabolic interpolation, trough priors,
    observation scatter (``core.pitch._pyin_observe``) — runs inside a
    shard_map with ppermute frame halos, exactly like the sharded STFT.
    Only the tiny (2·n_bins, T) observation matrix is gathered for the
    sequential Viterbi decode, per the SURVEY §5 rule that DPs run
    post-gather.  Same legality constraints as ``stft_sharded``:
    ``n % (D·hop) == 0`` and each shard ≥ ``frame_length`` samples.

    Returns ``(f0, voiced_flag, voiced_prob)``.
    """
    from ..core import pitch as _pitch

    _pitch._check_yin_params(
        sr=sr, fmax=fmax, fmin=fmin, frame_length=frame_length,
        win_length=None,
    )
    if hop_length is None:
        hop_length = frame_length // 4
    if pad_mode not in ("constant", "reflect"):
        raise ParameterError(f"Unsupported sharded pad_mode: {pad_mode}")

    y = jnp.asarray(y)
    n = y.shape[-1]
    D = mesh.shape[axis_name]
    if n % (D * hop_length) != 0:
        raise ParameterError(
            f"Signal length {n} must be divisible by D*hop = {D * hop_length}"
        )
    per = n // D
    lh, rh = _halo_sizes(frame_length, hop_length)
    if per < max(frame_length, lh + 1, rh + 1):
        raise ParameterError(
            f"Shard size {per} too small for frame_length={frame_length}"
        )

    min_period = int(np.floor(sr / fmax))
    max_period = min(int(np.ceil(sr / fmin)), frame_length - 1)
    n_bins_per_semitone = int(np.ceil(1.0 / resolution))
    n_pitch_bins = (
        int(np.floor(12 * n_bins_per_semitone * np.log2(fmax / fmin))) + 1
    )

    thresholds_d, beta_probs_d, log_trans_d, log_p_init_d = (
        _pitch._pyin_constants(
            float(sr), float(fmin), float(fmax), hop_length,
            int(n_thresholds),
            (float(beta_parameters[0]), float(beta_parameters[1])),
            float(resolution), float(max_transition_rate),
            float(switch_prob),
            None if transition_min_prob is None
            else float(transition_min_prob),
        )
    )

    def observe(frames):
        # frames: (..., T_loc, frame_length) → observe wants (..., fl, T)
        return _pitch._pyin_observe(
            jnp.swapaxes(frames, -2, -1), thresholds_d, beta_probs_d,
            sr=float(sr), fmin=float(fmin), min_period=min_period,
            max_period=max_period, n_pitch_bins=n_pitch_bins,
            n_bins_per_semitone=n_bins_per_semitone,
            boltzmann_parameter=float(boltzmann_parameter),
            no_trough_prob=float(no_trough_prob),
        )

    in_spec = P(*((None,) * (y.ndim - 1) + (axis_name,)))
    obs_spec = P(*((None,) * y.ndim + (axis_name,)))
    vp_spec = P(*((None,) * (y.ndim - 1) + (axis_name,)))

    def local(y_loc):
        fr = _local_frames(
            y_loc, jnp.ones((), y_loc.dtype), axis_name=axis_name,
            n_devices=D, n_fft=frame_length, hop_length=hop_length,
            pad_mode=pad_mode,
        )
        return observe(fr)

    fn = shard_map(
        local, mesh=mesh, in_specs=(in_spec,), out_specs=(obs_spec, vp_spec),
        check_vma=False,
    )
    obs_main, vp_main = fn(y)                     # (..., 2S, T), (..., T)

    # trailing centered frame (t = n // hop), replicated — one frame
    tail = _final_frame(
        y, jnp.ones((), y.dtype), n_fft=frame_length, pad_mode=pad_mode
    )[..., None, :]
    obs_tail, vp_tail = observe(tail)

    obs = jnp.concatenate([obs_main, obs_tail], axis=-1)
    voiced_prob = jnp.concatenate([vp_main, vp_tail], axis=-1)

    f0, voiced_flag = _pitch._pyin_decode(
        obs, log_trans_d, log_p_init_d, fmin=float(fmin),
        n_pitch_bins=n_pitch_bins, n_bins_per_semitone=n_bins_per_semitone,
    )
    if fill_na is not None:
        f0 = jnp.where(voiced_flag, f0, fill_na)
    return f0, voiced_flag, voiced_prob


def beat_track_sharded(
    y: Any,
    *,
    mesh: Mesh,
    axis_name: str = "time",
    sr: float = 22050,
    hop_length: int = 512,
    **beat_kwargs: Any,
):
    """Beat tracking of a time-sharded signal.

    The onset envelope — the heavy spectral part — is computed sharded
    (``onset_strength_sharded``); the envelope itself is one value per
    hop, so the tempo estimate and the sequential beat DP run on the
    gathered envelope (SURVEY §5: DPs run post-gather).  Matches
    ``beat.beat_track(y=y)`` on the same signal.

    Returns ``(tempo, beats)`` as ``beat.beat_track`` does.
    """
    from .. import beat as _beat

    env = onset_strength_sharded(
        y, mesh=mesh, axis_name=axis_name, sr=sr, hop_length=hop_length,
        aggregate=jnp.median,
    )
    return _beat.beat_track(
        onset_envelope=np.asarray(env), sr=sr, hop_length=hop_length,
        **beat_kwargs,
    )


def mfcc_sharded(
    y: Any,
    *,
    mesh: Mesh,
    axis_name: str = "time",
    sr: float = 22050,
    n_mfcc: int = 20,
    dct_type: int = 2,
    norm: Optional[str] = "ortho",
    lifter: float = 0,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    **mel_kwargs: Any,
) -> jax.Array:
    """Time-sharded MFCC: sharded mel spectrogram + frame-local DCT.

    The mel spectrogram comes from :func:`parallel.melspectrogram_sharded`
    (seam-free halo framing); the dB conversion and DCT are frame-local,
    so they apply shard-wise with the replicated DCT matrix — no extra
    communication beyond the mel halos.

    Parameters
    ----------
    y : array [shape=(..., n)]
        input signal (same divisibility rules as ``stft_sharded``)
    mesh, axis_name
        device mesh and its time axis
    sr, n_mfcc, dct_type, norm, lifter, n_fft, hop_length, n_mels
        as in :func:`librosa_tpu.feature.mfcc`
    **mel_kwargs
        forwarded mel filterbank controls

    Returns
    -------
    M : jax.Array [shape=(..., n_mfcc, t)]
        MFCCs, sharded over frames

    See Also
    --------
    librosa_tpu.feature.mfcc, melspectrogram_sharded
    """
    from ..feature.spectral import _mfcc_tail
    from ..ops.transforms import dct_matrix
    from .sharded import melspectrogram_sharded

    M = melspectrogram_sharded(
        y, mesh=mesh, axis_name=axis_name, sr=sr, n_fft=n_fft,
        hop_length=hop_length, n_mels=n_mels, **mel_kwargs,
    )
    C = dct_matrix(n_mels, dct_type=dct_type, norm=norm)[:n_mfcc]
    return _mfcc_tail(
        M, jnp.asarray(np.asarray(C, dtype=np.dtype(M.dtype))),
        lifter=float(lifter), db=True,
    )


def chroma_cqt_sharded(
    y: Any,
    *,
    mesh: Mesh,
    axis_name: str = "time",
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    norm: Optional[float] = np.inf,
    threshold: float = 0.0,
    n_chroma: int = 12,
    n_octaves: int = 7,
    bins_per_octave: int = 36,
) -> jax.Array:
    """Time-sharded constant-Q chromagram.

    The CQT magnitudes come from the sharded octave ladder
    (:func:`parallel.cqt_sharded`); the pitch-class fold, threshold, and
    normalization are frame-local (replicated ``cq_to_chroma`` basis),
    so the only communication is the ladder's decimation halos.

    Parameters
    ----------
    y : array [shape=(..., n)]
        input signal (the ladder's divisibility rules apply)
    mesh, axis_name
        device mesh and its time axis
    sr, hop_length, fmin, norm, threshold, n_chroma, n_octaves,
    bins_per_octave
        as in :func:`librosa_tpu.feature.chroma_cqt`

    Returns
    -------
    chromagram : jax.Array [shape=(..., n_chroma, t)]
        sharded over frames

    See Also
    --------
    librosa_tpu.feature.chroma_cqt, cqt_sharded
    """
    from .. import filters
    from ..core.convert import note_to_hz as _n2hz
    from ..feature.spectral import _project_norm_core
    from .constantq import cqt_sharded

    if fmin is None:
        fmin = _n2hz("C1")

    C = jnp.abs(cqt_sharded(
        y, mesh=mesh, axis_name=axis_name, sr=sr, hop_length=hop_length,
        fmin=fmin, n_bins=n_octaves * bins_per_octave,
        bins_per_octave=bins_per_octave,
    ))
    cq_to_chr = filters.cq_to_chroma(
        C.shape[-2], bins_per_octave=bins_per_octave, n_chroma=n_chroma,
        fmin=fmin,
    )
    return _project_norm_core(
        C, jnp.asarray(np.asarray(cq_to_chr, dtype=np.dtype(C.dtype))),
        threshold=None if threshold is None else float(threshold),
        norm=None if norm is None else float(norm),
    )
