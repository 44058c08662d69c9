"""Tests for analysis layers: onset, beat, rhythm, decompose, effects, harmonic."""

import numpy as np
import pytest
import scipy.ndimage

import librosa_tpu as lt
from librosa_tpu import decompose, effects, onset
from librosa_tpu import beat as beat_mod


@pytest.fixture(scope="module")
def click_track():
    """120 BPM click track, 5 seconds."""
    times = np.arange(0, 5.0, 0.5)
    return lt.clicks(times=times, sr=22050, length=5 * 22050).astype(np.float32)


def test_onset_strength_shape(click_track):
    env = np.asarray(onset.onset_strength(y=click_track))
    n_frames = 1 + len(click_track) // 512
    assert env.shape == (n_frames,)
    assert env.min() >= 0


def test_onset_detect_clicks(click_track):
    onsets = onset.onset_detect(y=click_track, units="time")
    # should find most of the 10 clicks at 0.5s spacing
    assert len(onsets) >= 8
    # each detected onset near a multiple of 0.5
    residual = np.abs(onsets - np.round(onsets / 0.5) * 0.5)
    assert np.median(residual) < 0.06


def test_onset_detect_silence():
    y = np.zeros(22050, dtype=np.float32)
    onsets = onset.onset_detect(y=y)
    assert len(onsets) == 0


def test_onset_backtrack(click_track):
    env = np.asarray(onset.onset_strength(y=click_track))
    onsets = onset.onset_detect(onset_envelope=env)
    back = onset.onset_backtrack(onsets, env)
    assert len(back) == len(onsets)
    assert np.all(back <= onsets)


def test_onset_strength_superflux(click_track):
    env = np.asarray(onset.onset_strength(y=click_track, max_size=3))
    assert env.shape[-1] == 1 + len(click_track) // 512


def test_beat_track_clicks(click_track):
    bpm, beats = beat_mod.beat_track(y=click_track, units="time")
    assert 100 < float(np.asarray(bpm)) < 140
    assert len(beats) >= 7
    # inter-beat intervals ≈ 0.5 s
    ibi = np.diff(beats)
    assert abs(np.median(ibi) - 0.5) < 0.05


def test_beat_local_score_time_varying():
    # The vectorized tap-grid gather must equal the reference guvec's
    # per-frame loop semantics (window k in [max(0, i+h-N+1), min(i+h, 2h+1))).
    from librosa_tpu.beat import _local_score, _normalize_onsets

    rng = np.random.default_rng(440)
    oe = rng.random((2, 300))
    fpb = 15 + 8 * np.sin(np.linspace(0, 5, 300))

    got = _local_score(oe, np.broadcast_to(fpb, oe.shape))

    oe_n = np.asarray(_normalize_onsets(oe))
    want = np.zeros_like(oe_n)
    N = oe.shape[-1]
    for r in range(oe.shape[0]):
        for i in range(N):
            f = fpb[i]
            K = 2 * int(f) + 1
            window = np.exp(-0.5 * (np.arange(-f, f + 1) * 32.0 / f) ** 2)
            ks = np.arange(max(0, i + K // 2 - N + 1), min(i + K // 2, K))
            want[r, i] = np.sum(window[ks] * oe_n[r, i + K // 2 - ks])
    assert np.allclose(got, want, atol=1e-10)


def test_beat_track_time_varying_bpm():
    # Per-frame bpm trajectory drives the time-varying local score + DP.
    sr, hop = 22050, 512
    T = 400
    env = np.zeros(T, dtype=np.float32)
    env[::22] = 1.0  # ~120 bpm pulse train
    bpm_traj = np.full(T, 120.0, dtype=np.float32)
    beats = beat_mod.beat_track(
        onset_envelope=env, sr=sr, hop_length=hop, bpm=bpm_traj,
    )[1]
    assert len(beats) >= 10
    assert abs(np.median(np.diff(beats)) - 22) <= 2


def test_beat_track_empty():
    bpm, beats = beat_mod.beat_track(
        onset_envelope=np.zeros(100, dtype=np.float32)
    )
    assert bpm == 0.0
    assert len(beats) == 0


def test_tempo_clicks(click_track):
    t = lt.feature.tempo(y=click_track)
    assert abs(float(np.asarray(t).reshape(-1)[0]) - 120) < 5


def test_tempogram_shape(click_track):
    env = np.asarray(onset.onset_strength(y=click_track))
    tg = np.asarray(lt.feature.tempogram(onset_envelope=env, win_length=128))
    assert tg.shape == (128, len(env))
    # zero-lag bin of a normalized autocorr tempogram is maximal
    assert np.all(tg[0] >= tg[1:] - 1e-6)


def test_fourier_tempogram_shape(click_track):
    env = np.asarray(onset.onset_strength(y=click_track))
    ftg = np.asarray(lt.feature.fourier_tempogram(onset_envelope=env))
    # centered hop-1 stft yields 1 + n frames
    assert ftg.shape == (193, len(env) + 1)
    assert np.iscomplexobj(ftg)


def test_tempogram_ratio(click_track):
    tgr = np.asarray(lt.feature.tempogram_ratio(y=click_track))
    assert tgr.shape[0] == 13


def test_plp(click_track):
    pulse = np.asarray(beat_mod.plp(y=click_track))
    n_frames = 1 + len(click_track) // 512
    assert pulse.shape == (n_frames,)
    assert pulse.min() >= 0
    assert pulse.max() <= 1 + 1e-6


def test_median_filter_matches_scipy(rng):
    x = rng.randn(64, 100).astype(np.float32)
    from librosa_tpu.ops.median import median_filter_1d

    for size, axis in [(5, -1), (17, -1), (31, -2), (4, -1)]:
        ours = np.asarray(median_filter_1d(x, size=size, axis=axis))
        shape = [1, 1]
        shape[axis] = size
        ref = scipy.ndimage.median_filter(x, size=tuple(shape), mode="reflect")
        assert np.allclose(ours, ref, atol=1e-6), (size, axis)


def test_hpss_magnitude(rng, tone_440):
    # harmonic content (tone) + percussive content (clicks)
    perc = lt.clicks(times=[0.25, 0.5, 0.75], sr=22050, length=22050).astype(
        np.float32
    )
    y = tone_440 + perc
    S = np.abs(np.asarray(lt.stft(y)))
    H, P = decompose.hpss(S)
    H, P = np.asarray(H), np.asarray(P)
    assert H.shape == S.shape and P.shape == S.shape
    # masks sum to ≈ S
    assert np.allclose(H + P, S, atol=1e-3)
    # tone bin should be mostly harmonic
    tone_bin = round(440 / (22050 / 2048))
    assert H[tone_bin].sum() > P[tone_bin].sum()


def test_hpss_mask_mode(rng):
    S = np.abs(rng.randn(129, 50)).astype(np.float32)
    mh, mp = decompose.hpss(S, mask=True)
    mh, mp = np.asarray(mh), np.asarray(mp)
    assert np.all(mh >= 0) and np.all(mh <= 1)
    assert np.allclose(mh + mp, 1, atol=1e-5)


def test_hpss_complex_passthrough(tone_440):
    D = np.asarray(lt.stft(tone_440))
    H, P = decompose.hpss(D)
    assert np.iscomplexobj(np.asarray(H))


def test_effects_hpss_roundtrip(tone_440):
    yh, yp = effects.hpss(tone_440)
    yh, yp = np.asarray(yh), np.asarray(yp)
    assert yh.shape == tone_440.shape
    # harmonic part keeps most tone energy
    assert np.sum(yh**2) > 5 * np.sum(yp**2)


def test_time_stretch(tone_440):
    y2 = np.asarray(effects.time_stretch(tone_440, rate=2.0))
    assert abs(len(y2) - len(tone_440) // 2) <= 1
    # pitch unchanged
    f = np.abs(np.fft.rfft(y2))
    peak = np.argmax(f) * 22050 / len(y2)
    assert abs(peak - 440) < 10


def test_pitch_shift(tone_440):
    y2 = np.asarray(effects.pitch_shift(tone_440, sr=22050, n_steps=12))
    assert y2.shape == tone_440.shape
    f = np.abs(np.fft.rfft(y2))
    peak = np.argmax(f) * 22050 / len(y2)
    assert abs(peak - 880) < 20


def test_trim():
    pad = np.zeros(5000, dtype=np.float32)
    sig = lt.tone(440, duration=0.5).astype(np.float32)
    y = np.concatenate([pad, sig, pad])
    yt, idx = lt.effects.trim(y)
    assert idx[0] > 3000 and idx[1] < len(y) - 3000
    assert np.asarray(yt).shape[-1] == idx[1] - idx[0]


def test_split():
    sig = lt.tone(440, duration=0.3).astype(np.float32)
    gap = np.zeros(11025, dtype=np.float32)
    y = np.concatenate([sig, gap, sig])
    intervals = lt.effects.split(y)
    assert intervals.shape[1] == 2
    assert len(intervals) == 2


def test_preemphasis_roundtrip(rng):
    y = rng.randn(1000).astype(np.float32)
    ye = np.asarray(effects.preemphasis(y, coef=0.97))
    yd = np.asarray(effects.deemphasis(ye, coef=0.97))
    assert np.allclose(yd, y, atol=1e-4)


def test_remix(tone_440):
    intervals = [(11025, 22050), (0, 11025)]
    y2 = np.asarray(effects.remix(tone_440, intervals, align_zeros=True))
    assert abs(y2.shape[-1] - len(tone_440)) < 100


def test_nmf_decompose(rng):
    S = np.abs(rng.randn(64, 100)).astype(np.float32)
    comps, acts = decompose.decompose(S, n_components=4)
    assert comps.shape == (64, 4)
    assert acts.shape == (4, 100)
    recon = comps @ acts
    assert np.linalg.norm(recon - S) / np.linalg.norm(S) < 1.0


def test_nmf_mu(rng):
    W0 = np.abs(rng.randn(32, 3))
    H0 = np.abs(rng.randn(3, 40))
    S = (W0 @ H0).astype(np.float32)
    comps, acts = decompose.decompose(S, n_components=3, transformer="mu")
    recon = comps @ acts
    assert np.linalg.norm(recon - S) / np.linalg.norm(S) < 0.05


def test_interp_harmonics(tone_440):
    S = np.abs(np.asarray(lt.stft(tone_440)))
    freqs = lt.fft_frequencies(sr=22050, n_fft=2048)
    Sh = np.asarray(lt.interp_harmonics(S, freqs=freqs, harmonics=[1, 2]))
    assert Sh.shape == (2, *S.shape)
    # h=1 is identity (linear interp at the sample points)
    assert np.allclose(Sh[0], S, atol=1e-4)


def test_f0_harmonics(tone_440):
    S = np.abs(np.asarray(lt.stft(tone_440)))
    freqs = lt.fft_frequencies(sr=22050, n_fft=2048)
    f0 = np.full(S.shape[-1], 440.0)
    out = np.asarray(
        lt.f0_harmonics(S, f0=f0, freqs=freqs, harmonics=[0.5, 1, 2])
    )
    assert out.shape == (3, S.shape[-1])
    # energy at h=1 (440 Hz) dominates h=0.5/2 for a pure tone
    assert np.median(out[1]) > np.median(out[0])
    assert np.median(out[1]) > np.median(out[2])


def test_salience(tone_440):
    S = np.abs(np.asarray(lt.stft(tone_440)))
    freqs = lt.fft_frequencies(sr=22050, n_fft=2048)
    sal = np.asarray(
        lt.salience(S, freqs=freqs, harmonics=[1, 2], filter_peaks=False)
    )
    assert sal.shape == S.shape


def test_mel_to_stft_roundtrip(tone_440):
    S = np.abs(np.asarray(lt.stft(tone_440, n_fft=1024))) ** 2
    M = np.asarray(lt.feature.melspectrogram(S=S, sr=22050, n_fft=1024))
    S_rec = np.asarray(lt.feature.mel_to_stft(M, sr=22050, n_fft=1024, power=2))
    # peak bin should survive the round trip
    assert abs(int(S_rec.mean(axis=1).argmax()) - int(S.mean(axis=1).argmax())) <= 2


def test_mfcc_to_mel_shape(tone_440):
    mf = np.asarray(lt.feature.mfcc(y=tone_440, n_mfcc=20))
    M = np.asarray(lt.feature.mfcc_to_mel(mf, n_mels=128))
    assert M.shape == (128, mf.shape[-1])
    assert np.all(M >= 0)


def test_effects_hpss_stft_params(tone_440):
    # STFT parameters thread through the round trip (reference effects.py:70)
    yh, yp = lt.effects.hpss(tone_440, n_fft=512, hop_length=128)
    assert np.asarray(yh).shape == np.asarray(tone_440).shape
    rec = np.asarray(yh) + np.asarray(yp)
    # harmonic+percussive approximately reconstructs the input
    err = np.max(np.abs(rec - np.asarray(tone_440)))
    assert err < 0.15
    # harmonic/percussive shortcuts accept the same params
    h = lt.effects.harmonic(tone_440, n_fft=512, hop_length=128, margin=2.0)
    assert np.asarray(h).shape == np.asarray(tone_440).shape


def test_native_beat_dp_matches_python():
    """The C++ beat DP (``_native/hostdp.cpp``) is the production path for
    single envelopes; it must reproduce the Python recurrence exactly
    (backlinks bit-identical; cumscore to vectorized-vs-scalar-log ulp)."""
    from librosa_tpu._native import beat_dp
    from librosa_tpu.beat import _beat_dp_host

    rng = np.random.RandomState(17)
    for T, tv in [(1, False), (5, False), (700, False), (300, True)]:
        ls = np.abs(rng.randn(T))
        fpb = (
            np.round(43.0 + 4.0 * rng.rand(T))
            if tv
            else np.array([43.0])
        )
        b_py, c_py = _beat_dp_host(ls, fpb.astype(np.float64), 100.0)
        b_c, c_c = beat_dp(ls, fpb, 100.0)
        assert np.array_equal(b_py, b_c)
        assert np.allclose(c_py, c_c, rtol=1e-12, atol=1e-12)


def test_native_beat_dp_negative_envelope_and_validation():
    """All-negative onset envelopes make 0.01*max(localscore) negative; the
    native path must compute the true max (not clamp at 0) or the
    first-beat threshold gate diverges from the Python recurrence.  Also:
    a frames_per_beat length that is neither 1 nor T must be rejected
    before it reaches native code (out-of-bounds read otherwise)."""
    import pytest

    from librosa_tpu._native import beat_dp
    from librosa_tpu.beat import _beat_dp_host

    rng = np.random.RandomState(3)
    # strictly negative localscore
    ls = -1.0 - np.abs(rng.randn(400))
    fpb = np.array([43.0])
    b_py, c_py = _beat_dp_host(ls, fpb, 100.0)
    b_c, c_c = beat_dp(ls, fpb, 100.0)
    assert np.array_equal(b_py, b_c)
    assert np.allclose(c_py, c_c, rtol=1e-12, atol=1e-12)
    # mixed-sign envelope too
    ls2 = rng.randn(400)
    b_py2, c_py2 = _beat_dp_host(ls2, fpb, 100.0)
    b_c2, c_c2 = beat_dp(ls2, fpb, 100.0)
    assert np.array_equal(b_py2, b_c2)
    assert np.allclose(c_py2, c_c2, rtol=1e-12, atol=1e-12)
    # very high bpm: round(fpb/2) == 0 must not read cumscore[i]
    fpb_hi = np.array([0.9])
    b3_py, c3_py = _beat_dp_host(ls2, fpb_hi, 100.0)
    b3_c, c3_c = beat_dp(ls2, fpb_hi, 100.0)
    assert np.array_equal(b3_py, b3_c)
    assert np.allclose(c3_py, c3_c, rtol=1e-12, atol=1e-12)
    # bad frames_per_beat length
    with pytest.raises(ValueError, match="frames_per_beat"):
        beat_dp(ls2, np.full(7, 43.0), 100.0)
