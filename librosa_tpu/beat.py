"""Beat tracking and predominant local pulse (L5).

The beat tracker's core DP (reference numba kernel ``__beat_track_dp``,
``librosa/beat.py:619``) runs as a ``lax.scan`` over frames with a
fixed-size predecessor window: each step gathers the last ``W`` cumulative
scores from a rolling carry buffer and reduces the log-spacing penalty over
the data-dependent search range via masking — static shapes, device-resident,
batched over channels.  Backtracking and trimming (tiny, sequential) run on
host.

Parity citations refer to ``librosa/beat.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import core, onset
from .feature.rhythm import tempo as _tempo
from .util import utils as util
from .util.exceptions import ParameterError

__all__ = ["beat_track", "plp"]

# Maximum predecessor search distance (frames).  2*frames_per_beat at the
# default 43 fps reaches back to ~10 BPM before truncating.
_MAX_WINDOW = 1024


@functools.partial(jax.jit, static_argnames=("tv",))
def _beat_dp_scan(
    localscore: jax.Array,
    frames_per_beat: jax.Array,
    tightness: float,
    *,
    tv: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Beat-tracking DP over one envelope (vmapped for batches).

    ``localscore``: (T,);  ``frames_per_beat``: (T,) if tv else (1,).
    Returns (backlink (T,) int32, cumscore (T,)).
    """
    T = localscore.shape[0]
    W = _MAX_WINDOW
    score_thresh = 0.01 * jnp.max(localscore)

    d = jnp.arange(1, W + 1, dtype=jnp.float32)  # distance to predecessor

    def step(carry, inp):
        buf, first_beat = carry  # buf[k] = cumscore[i - (W - k)], k=0..W-1
        i, score_i, fpb = inp

        # search range: round(fpb/2) <= d <= 2*fpb, loc = i - d >= 0
        d_min = jnp.round(fpb / 2)
        d_max = 2 * fpb
        valid = (d >= d_min) & (d <= d_max) & (d <= i.astype(jnp.float32))

        prev = buf[::-1]  # prev[k] = cumscore[i - (k+1)] = cumscore at d=k+1
        penalty = tightness * (jnp.log(d) - jnp.log(fpb)) ** 2
        scores = jnp.where(valid, prev - penalty, -jnp.inf)
        best_score = jnp.max(scores)
        best_d = jnp.argmax(scores) + 1
        has_pred = jnp.isfinite(best_score)

        cum_i = jnp.where(has_pred, score_i + best_score, score_i)
        beat_loc = jnp.where(has_pred, i - best_d, -1)

        suppress = first_beat & (score_i < score_thresh)
        backlink_i = jnp.where(suppress, -1, beat_loc)
        first_beat = first_beat & (score_i < score_thresh)

        buf = jnp.concatenate([buf[1:], cum_i[None]])
        return (buf, first_beat), (backlink_i.astype(jnp.int32), cum_i)

    buf0 = jnp.full((W,), -jnp.inf, dtype=localscore.dtype)
    fpb_seq = (
        frames_per_beat
        if tv
        else jnp.broadcast_to(frames_per_beat[0], (T,))
    ).astype(jnp.float32)
    idx = jnp.arange(T, dtype=jnp.int32)

    (_, _), (backlink, cumscore) = jax.lax.scan(
        step, (buf0, jnp.asarray(True)), (idx, localscore, fpb_seq)
    )
    return backlink, cumscore


def _normalize_onsets(onsets: np.ndarray) -> np.ndarray:
    """Parity: beat.py (__normalize_onsets) — scale by std (ddof=1)."""
    norm = onsets.std(ddof=1, axis=-1, keepdims=True)
    return onsets / (norm + util.tiny(onsets))


def _local_score(onset_envelope: np.ndarray, frames_per_beat: np.ndarray) -> np.ndarray:
    """Gaussian-smoothed AGC'd onset envelope.

    Parity: beat.py:576 (__beat_local_score) — same-mode convolution with a
    tempo-dependent Gaussian (time-varying filter when fpb is per-frame).
    """
    oe = _normalize_onsets(onset_envelope)
    N = oe.shape[-1]
    if frames_per_beat.shape[-1] == 1:
        fpb = float(frames_per_beat.reshape(-1)[0])
        window = np.exp(-0.5 * (np.arange(-fpb, fpb + 1) * 32.0 / fpb) ** 2)
        out = np.empty_like(oe)
        flat = oe.reshape(-1, N)
        res = np.empty_like(flat)
        for r in range(flat.shape[0]):
            res[r] = np.convolve(flat[r], window, mode="same")
        return res.reshape(oe.shape)
    # Time-varying tempo: frame i is smoothed by its own Gaussian of
    # half-width h_i = int(fpb_i), tap k weighted exp(-((k-fpb_i)*16/fpb_i)²/2)
    # for k in [max(0, i+h_i-N+1), min(i+h_i, 2h_i+1)) — the reference
    # guvec's (exclusive) bounds, beat.py:600-608.  Vectorized as one masked
    # gather over a (..., N, Kmax) tap grid instead of a per-frame loop.
    flat = oe.reshape(-1, N)
    fpb_flat = np.broadcast_to(frames_per_beat, oe.shape).reshape(-1, N)
    half = fpb_flat.astype(np.int64)  # h_i = K_i // 2
    k_max = int(2 * half.max() + 1)

    taps = np.arange(k_max)  # (K,)
    idx = np.arange(N)
    # source sample for (i, k): i + h_i - k, valid while in [0, N) and k < K_i
    src = idx[None, :, None] + half[:, :, None] - taps[None, None, :]
    k_lo = np.maximum(0, idx[None, :, None] + half[:, :, None] - N + 1)
    k_hi = np.minimum(idx[None, :, None] + half[:, :, None],
                      2 * half[:, :, None] + 1)
    mask = (taps >= k_lo) & (taps < k_hi)
    weights = np.exp(
        -0.5 * ((taps - fpb_flat[:, :, None]) * 32.0 / fpb_flat[:, :, None]) ** 2
    )
    gathered = np.take_along_axis(
        flat[:, None, :], np.clip(src, 0, N - 1).reshape(flat.shape[0], 1, -1),
        axis=-1,
    ).reshape(src.shape)
    res = np.sum(np.where(mask, weights * gathered, 0.0), axis=-1)
    return res.reshape(oe.shape).astype(oe.dtype)


def _localmax_np(x: np.ndarray) -> np.ndarray:
    """numpy twin of util.localmax along -1.

    The DP post-processing is host-side on a ~40 frame/s envelope;
    calling the jnp localmax here would issue ~10 eager device ops
    (each a full tunnel round trip) for microseconds of work.
    """
    out = np.zeros(x.shape, dtype=bool)
    out[..., 1:-1] = (x[..., 1:-1] > x[..., :-2]) & (x[..., 1:-1] >= x[..., 2:])
    if x.shape[-1] > 1:
        out[..., -1] = x[..., -1] > x[..., -2]
    return out


def _last_beat(cumscore: np.ndarray) -> np.ndarray:
    """Parity: beat.py:697 (__last_beat): last local max above half-median."""
    lmax = _localmax_np(cumscore)
    masked = np.ma.masked_array(data=cumscore, mask=~lmax)
    medians = np.ma.median(masked, axis=-1)
    thresholds = 0.5 * np.ma.getdata(medians)

    flat_c = cumscore.reshape(-1, cumscore.shape[-1])
    flat_m = lmax.reshape(-1, lmax.shape[-1])
    flat_t = np.broadcast_to(
        np.atleast_1d(thresholds).reshape(-1), (flat_c.shape[0],)
    )
    tails = np.empty(flat_c.shape[0], dtype=int)
    for r in range(flat_c.shape[0]):
        n = flat_c.shape[1] - 1
        tails[r] = n
        while n >= 0:
            if flat_m[r, n] and flat_c[r, n] >= flat_t[r]:
                tails[r] = n
                break
            n -= 1
    return tails.reshape(cumscore.shape[:-1])


def _trim_beats(
    localscore: np.ndarray, beats: np.ndarray, trim: bool
) -> np.ndarray:
    """Parity: beat.py:667 (__trim_beats)."""
    out = beats.copy()
    w = np.hanning(5)
    flat_l = localscore.reshape(-1, localscore.shape[-1])
    flat_b = out.reshape(-1, out.shape[-1])
    for r in range(flat_l.shape[0]):
        ls, bt = flat_l[r], flat_b[r]
        smooth_boe = np.convolve(ls[bt], w)[
            len(w) // 2 : len(ls) + len(w) // 2
        ]
        if trim and len(smooth_boe):
            threshold = 0.5 * ((smooth_boe**2).mean() ** 0.5)
        else:
            threshold = 0.0
        n = 0
        while n < len(ls) and ls[n] <= threshold:
            bt[n] = False
            n += 1
        n = len(ls) - 1
        while n >= 0 and ls[n] <= threshold:
            bt[n] = False
            n -= 1
    return out


def _beat_dp_host(
    localscore: np.ndarray, frames_per_beat: np.ndarray, tightness: float
):
    """Host-side beat DP (exactly the _beat_dp_scan recurrence).

    Parity: beat.py:619 (__beat_track_dp).
    """
    T = localscore.shape[0]
    backlink = np.full(T, -1, dtype=np.int64)
    cumscore = np.zeros(T, dtype=np.float64)
    score_thresh = 0.01 * localscore.max() if T else 0.0
    first_beat = True
    tv = frames_per_beat.shape[0] > 1
    for i in range(T):
        fpb = frames_per_beat[i if tv else 0]
        lo = int(max(0, i - 2 * fpb))
        hi = int(i - np.round(fpb / 2) + 1)
        best_score = -np.inf
        best_loc = -1
        if hi > lo:
            locs = np.arange(lo, hi)
            d = i - locs
            if len(locs):
                scores = cumscore[locs] - tightness * (
                    np.log(d) - np.log(fpb)
                ) ** 2
                k = int(np.argmax(scores))
                if np.isfinite(scores[k]) and d[k] >= 1:
                    best_score = scores[k]
                    best_loc = locs[k]
        if best_loc >= 0 and np.isfinite(best_score):
            cumscore[i] = localscore[i] + best_score
            beat_loc = best_loc
        else:
            cumscore[i] = localscore[i]
            beat_loc = -1
        if first_beat and localscore[i] < score_thresh:
            backlink[i] = -1
        else:
            backlink[i] = beat_loc
            first_beat = False
    return backlink, cumscore


def _fill_beats_from_backlink(beats, backlink, tail):
    """Follow backlinks from the selected tail. Parity: beat.py:736."""
    n = tail
    while n >= 0:
        beats[n] = True
        n = backlink[n]


def _beat_tracker(
    onset_envelope: np.ndarray,
    bpm: np.ndarray,
    frame_rate: float,
    tightness: float,
    trim: bool,
) -> np.ndarray:
    """Parity: beat.py:510 (__beat_tracker)."""
    if np.any(bpm <= 0):
        raise ParameterError(f"bpm={bpm} must be strictly positive")
    if tightness <= 0:
        raise ParameterError("tightness must be strictly positive")
    if bpm.shape[-1] not in (1, onset_envelope.shape[-1]):
        raise ParameterError(
            f"Invalid bpm shape={bpm.shape} does not match "
            f"onset envelope shape={onset_envelope.shape}"
        )

    frames_per_beat = np.round(frame_rate * 60.0 / bpm)
    localscore = _local_score(onset_envelope, frames_per_beat)

    tv = frames_per_beat.shape[-1] > 1

    # The DP is a strictly sequential scalar recurrence on a ~40 frame/s
    # envelope: it runs on the host (native C++ when built — ~40 ns/frame
    # vs ~25 µs/frame for the Python loop), the vmapped device scan only
    # for batches where one program amortizes across rows.
    if localscore.ndim == 1:
        fpb_host = np.asarray(
            np.broadcast_to(
                frames_per_beat,
                localscore.shape if tv else (1,),
            ),
            dtype=np.float64,
        )
        ls_host = np.asarray(localscore, dtype=np.float64)
        try:
            from ._native import beat_dp as _native_dp
        except Exception:  # pragma: no cover - native build unavailable
            _native_dp = None
        if _native_dp is not None:
            backlink, cumscore = _native_dp(ls_host, fpb_host, float(tightness))
        else:
            backlink, cumscore = _beat_dp_host(
                ls_host, fpb_host, float(tightness)
            )
        tail = int(np.atleast_1d(_last_beat(cumscore)).reshape(-1)[0])
        beats = np.zeros_like(localscore, dtype=bool)
        _fill_beats_from_backlink(beats, backlink, tail)
        return _trim_beats(localscore, beats, trim)

    # run the DP on device, vmapped over leading dims
    ls = jnp.asarray(localscore, dtype=jnp.float32)
    fpb = jnp.asarray(
        np.broadcast_to(
            frames_per_beat,
            onset_envelope.shape if tv else (*onset_envelope.shape[:-1], 1),
        ),
        dtype=jnp.float32,
    )
    if ls.ndim == 1:
        backlink, cumscore = _beat_dp_scan(ls, fpb, float(tightness), tv=tv)
    else:
        flat_ls = ls.reshape(-1, ls.shape[-1])
        flat_fpb = fpb.reshape(-1, fpb.shape[-1])
        backlink, cumscore = jax.vmap(
            lambda a, b: _beat_dp_scan(a, b, float(tightness), tv=tv)
        )(flat_ls, flat_fpb)
        backlink = backlink.reshape(ls.shape)
        cumscore = cumscore.reshape(ls.shape)

    backlink = np.asarray(backlink)
    cumscore = np.asarray(cumscore, dtype=np.float64)

    tails = np.atleast_1d(_last_beat(cumscore))
    beats = np.zeros_like(onset_envelope, dtype=bool)
    flat_bl = backlink.reshape(-1, backlink.shape[-1])
    flat_beats = beats.reshape(-1, beats.shape[-1])
    for r in range(flat_bl.shape[0]):
        n = int(tails.reshape(-1)[r])
        while n >= 0:
            flat_beats[r, n] = True
            n = int(flat_bl[r, n])

    return _trim_beats(localscore, beats, trim)


def beat_track(
    *,
    y: Any = None,
    sr: float = 22050,
    onset_envelope: Optional[Any] = None,
    hop_length: int = 512,
    start_bpm: float = 120.0,
    tightness: float = 100,
    trim: bool = True,
    bpm: Optional[Any] = None,
    prior: Optional[Any] = None,
    units: str = "frames",
    sparse: bool = True,
) -> Tuple[Any, np.ndarray]:
    """Dynamic-programming beat tracker [Ellis 2007].

    Estimates a global (or per-frame) tempo, builds a tempo-matched
    Gaussian local score from the onset envelope, and decodes beat
    positions with a DP that penalizes deviations from the beat period.
    Behavior parity with the reference ``beat.py:89``; batched inputs run
    the DP as a vmapped ``lax.scan`` on device, single envelopes on host
    (scan launch latency dominates tiny sequential DPs).

    Parameters
    ----------
    y, sr, onset_envelope, hop_length
        signal (or precomputed onset envelope) and hop
    start_bpm : float > 0
        initial tempo guess for the estimator prior
    tightness : float > 0
        penalty weight for deviating from the estimated period
    trim : bool
        discard weak leading/trailing beats
    bpm : scalar or np.ndarray or None
        externally supplied tempo (scalar, per-channel, or per-frame for
        time-varying tracking)
    prior : distribution or None
        tempo prior for the estimator
    units : 'frames', 'samples', or 'time'
        beat position units
    sparse : bool
        sparse event indices (True, 1-D input only) or dense boolean mask

    Returns
    -------
    tempo : float or np.ndarray
        estimated global tempo in BPM
    beats : np.ndarray
        beat event positions

    See Also
    --------
    plp : predominant local pulse
    feature.tempo

    Examples
    --------
    >>> import numpy as np, librosa_tpu as lt
    >>> env = np.zeros(400, dtype=np.float32)
    >>> env[::22] = 1.0                       # ~120 bpm pulse train
    >>> tempo, beats = lt.beat.beat_track(onset_envelope=env, sr=22050)
    >>> bool(abs(float(np.atleast_1d(tempo)[0]) - 120) < 10)
    True
    """
    if onset_envelope is None:
        if y is None:
            raise ParameterError(
                "beat tracking needs a signal (y) or an onset envelope"
            )
        onset_envelope = onset.onset_strength(
            aggregate=jnp.median, hop_length=hop_length, sr=sr, y=y
        )
    envelope = np.asarray(onset_envelope)

    if sparse and envelope.ndim != 1:
        raise ParameterError(
            f"frame-index (sparse) output is single-channel only; this "
            f"envelope has {envelope.ndim} dimensions — set sparse=False "
            "or downmix first"
        )

    # a flat envelope has no beats (and would send the DP degenerate)
    if not envelope.any():
        silent_tempo = (
            0.0 if sparse
            else np.zeros(shape=envelope.shape[:-1], dtype=float)
        )
        silent_beats = (
            np.array([], dtype=int) if sparse
            else np.zeros_like(envelope, dtype=bool)
        )
        return (silent_tempo, silent_beats)

    if bpm is None:
        bpm = np.asarray(_tempo(
            onset_envelope=envelope, sr=sr, hop_length=hop_length,
            start_bpm=start_bpm, prior=prior,
        ))
    tempi = np.atleast_1d(np.asarray(bpm))
    tempi_full = np.asarray(
        util.expand_to(tempi, ndim=envelope.ndim, axes=range(tempi.ndim))
    )

    beat_mask = _beat_tracker(
        envelope, tempi_full, float(sr) / hop_length, tightness, trim
    )
    if not sparse:
        return (bpm, beat_mask)

    frames = np.flatnonzero(beat_mask)
    to_units = {
        "frames": lambda f: f,
        "samples": lambda f: core.frames_to_samples(
            f, hop_length=hop_length
        ),
        "time": lambda f: core.frames_to_time(
            f, hop_length=hop_length, sr=sr
        ),
    }
    if units not in to_units:
        raise ParameterError(
            f"units must be frames, samples, or time; got {units!r}"
        )
    return (bpm, to_units[units](frames))


def plp(
    *,
    y: Any = None,
    sr: float = 22050,
    onset_envelope: Optional[Any] = None,
    hop_length: int = 512,
    win_length: int = 384,
    tempo_min: Optional[float] = 30,
    tempo_max: Optional[float] = 300,
    prior: Optional[Any] = None,
) -> jax.Array:
    """Predominant local pulse (PLP) estimation.

    Fourier tempogram → per-frame dominant-tempo phase → windowed sinusoid
    overlap-add, half-wave rectified [Grosche & Mueller 2011] (behavior
    parity with the reference ``beat.py:320``).

    Parameters
    ----------
    y, sr, onset_envelope, hop_length, win_length
        signal (or precomputed envelope) and tempogram geometry
    tempo_min, tempo_max : float or None
        restrict the tempo search band
    prior : distribution or None
        tempo prior

    Returns
    -------
    pulse : jax.Array [shape=(..., t)]
        the pulse curve (local maxima are beat candidates)
    """
    if onset_envelope is None:
        onset_envelope = onset.onset_strength(
            y=y, sr=sr, hop_length=hop_length, aggregate=jnp.median
        )
    onset_envelope = jnp.asarray(onset_envelope)

    if tempo_min is not None and tempo_max is not None and tempo_max <= tempo_min:
        raise ParameterError(
            f"tempo_max={tempo_max} must be larger than tempo_min={tempo_min}"
        )

    tempo_freqs = core.fourier_tempo_frequencies(
        sr=sr, hop_length=hop_length, win_length=win_length
    )

    mask = np.ones_like(tempo_freqs, dtype=bool)
    if tempo_min is not None:
        mask &= tempo_freqs >= tempo_min
    if tempo_max is not None:
        mask &= tempo_freqs <= tempo_max

    # Fourier tempogram → dominant-tempo masking → istft pulse as ONE
    # program: the complex tempogram never crosses an eager program
    # boundary (axon layout constraint) and the ~20 per-op dispatches of
    # the masking chain collapse into the jit.
    return _plp_core(
        jnp.asarray(onset_envelope), jnp.asarray(mask),
        None if prior is None else
        jnp.asarray(np.asarray(prior.logpdf(tempo_freqs), dtype=np.float32)),
        win_length=int(win_length),
    )


@functools.partial(jax.jit, static_argnames=("win_length",))
def _plp_core(onset_envelope, mask, logprior, *, win_length):
    from .core.spectrum import stft as _stft

    ftgram = _stft(
        onset_envelope, n_fft=win_length, hop_length=1, center=True,
        window="hann",
    )

    mask_j = util.expand_to(mask, ndim=ftgram.ndim, axes=-2)
    ftgram = jnp.where(mask_j, ftgram, 0.0)

    ftmag = jnp.log1p(1e6 * jnp.abs(ftgram))
    if logprior is not None:
        ftmag = ftmag + util.expand_to(
            logprior, ndim=ftgram.ndim, axes=-2
        )

    peak_values = jnp.max(ftmag, axis=-2, keepdims=True)
    ftgram = jnp.where(ftmag < peak_values, 0.0, ftgram)

    ftgram = ftgram / (
        util.tiny(ftgram) ** 0.5
        + jnp.abs(jnp.max(ftgram, axis=-2, keepdims=True))
    )

    pulse = core.istft(
        ftgram, hop_length=1, n_fft=win_length,
        length=onset_envelope.shape[-1],
    )
    pulse = jnp.clip(pulse, 0, None)
    return util.normalize(pulse, axis=-1)
