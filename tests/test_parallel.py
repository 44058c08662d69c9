"""Seam-free sharding tests: sharded == unsharded, bit-exact.

This is the TPU analogue of the reference's multichannel congruence suite
(tests/test_multichannel.py) — the key contract that justifies time-sharding.
Runs on the 8-device virtual CPU mesh from conftest.
"""

import jax
import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu.parallel import make_mesh, stft_sharded, melspectrogram_sharded


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((8,), ("time",))


@pytest.mark.parametrize("pad_mode", ["constant", "reflect"])
def test_stft_sharded_bitexact(mesh8, pad_mode, rng):
    n = 8 * 512 * 16  # divisible by D * hop
    y = rng.randn(n).astype(np.float32)
    S_ref = np.asarray(lt.stft(y, pad_mode=pad_mode))
    S_sh = np.asarray(
        stft_sharded(y, mesh=mesh8, n_fft=2048, hop_length=512, pad_mode=pad_mode)
    )
    assert S_sh.shape == S_ref.shape
    # bit-exact: same samples, same window, same FFT
    assert np.array_equal(S_sh, S_ref)


def test_stft_sharded_multichannel(mesh8, rng):
    n = 8 * 512 * 8
    y = rng.randn(2, n).astype(np.float32)
    S_ref = np.asarray(lt.stft(y))
    S_sh = np.asarray(stft_sharded(y, mesh=mesh8))
    assert np.array_equal(S_sh, S_ref)


def test_melspectrogram_sharded_close(mesh8, rng):
    n = 8 * 512 * 16
    y = rng.randn(n).astype(np.float32)
    M_ref = np.asarray(lt.feature.melspectrogram(y=y))
    M_sh = np.asarray(melspectrogram_sharded(y, mesh=mesh8))
    assert M_sh.shape == M_ref.shape
    # mel matmul happens pre- vs post-gather; identical math, so exact
    assert np.allclose(M_sh, M_ref, rtol=1e-6, atol=1e-6)


def test_stft_sharded_rejects_bad_length(mesh8):
    y = np.zeros(1000, dtype=np.float32)
    with pytest.raises(lt.ParameterError):
        stft_sharded(y, mesh=mesh8)


def test_scaling_report_runs(mesh8):
    from librosa_tpu.parallel.scaling import scaling_report

    pts = scaling_report(
        device_counts=[1, 2, 4], seconds_per_device=1.0, iters=1
    )
    assert [p.n_devices for p in pts] == [1, 2, 4]
    assert pts[0].efficiency == 1.0
    for p in pts:
        assert p.samples_per_s > 0


def test_onset_strength_sharded(mesh8, rng):
    import jax.numpy as jnp
    from librosa_tpu.parallel import onset_strength_sharded

    n = 8 * 512 * 16
    t = np.arange(n) / 22050
    y = (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.05 * rng.randn(n)).astype(np.float32)
    env_sh = np.asarray(onset_strength_sharded(y, mesh=mesh8))
    env = np.asarray(lt.onset.onset_strength(y=y, sr=22050, aggregate=jnp.mean))
    assert env_sh.shape == env.shape
    np.testing.assert_allclose(env_sh, env, atol=2e-5)


def test_tempo_sharded(mesh8):
    from librosa_tpu.parallel import tempo_sharded

    n = 8 * 512 * 16
    pulse = np.zeros(n, dtype=np.float32)
    pulse[:: 22050 // 2] = 1.0  # 120 bpm
    tp_sh = np.asarray(tempo_sharded(pulse, mesh=mesh8))
    env = lt.onset.onset_strength(y=pulse, sr=22050)
    tp = np.asarray(lt.feature.tempo(
        onset_envelope=np.asarray(env), sr=22050))
    # both see the same envelope math; the estimates must agree exactly
    assert np.allclose(tp_sh, tp)


def test_pcen_sharded_cross_shard_state(mesh8, rng):
    from librosa_tpu.parallel import pcen_sharded

    S = np.abs(rng.randn(64, 256)).astype(np.float32) * 100
    p_sh = np.asarray(pcen_sharded(S, mesh=mesh8))
    p = np.asarray(lt.pcen(S, sr=22050))
    np.testing.assert_allclose(p_sh, p, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("n_bins", [48, 84])
def test_cqt_sharded_seamfree(mesh8, rng, n_bins):
    from librosa_tpu.parallel import cqt_sharded

    n = 8 * 512 * 64  # deep octaves need long shards
    t = np.arange(n) / 22050
    y = (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * np.sin(2 * np.pi * 1760 * t)
         + 0.02 * rng.randn(n)).astype(np.float32)
    C_sh = np.asarray(cqt_sharded(y, mesh=mesh8, sr=22050, n_bins=n_bins,
                                  hop_length=512))
    C = np.asarray(lt.cqt(y, sr=22050, n_bins=n_bins, hop_length=512,
                          res_type="polyphase"))
    assert C_sh.shape == C.shape
    rel = np.abs(C_sh - C).max() / np.abs(C).max()
    assert rel < 1e-5, rel


def test_pod_mesh_shape():
    from librosa_tpu.parallel import pod_mesh

    mesh = pod_mesh(track_axis=2)
    assert mesh.shape["track"] == 2
    assert mesh.shape["time"] == len(jax.devices()) // 2


def test_pod_mesh_2d_mel(rng):
    # (track, time) 2-D mesh: batch shards over 'track', signals over 'time'
    from librosa_tpu.parallel import melspectrogram_sharded, pod_mesh

    mesh = pod_mesh(track_axis=2)
    n = 4 * 512 * 8  # divisible by time-axis (4) * hop
    y = rng.randn(2, n).astype(np.float32)
    M_ref = np.asarray(lt.feature.melspectrogram(y=y))
    M_sh = np.asarray(
        melspectrogram_sharded(y, mesh=mesh, axis_name="time")
    )
    assert M_sh.shape == M_ref.shape
    # 2-D layouts reassociate the mel reduction; fp-level tolerance
    np.testing.assert_allclose(M_sh, M_ref, rtol=1e-5, atol=1e-5)


def test_onset_sharded_multichannel(mesh8, rng):
    import jax.numpy as jnp
    from librosa_tpu.parallel import onset_strength_sharded

    n = 8 * 512 * 16
    y = rng.randn(2, n).astype(np.float32) * 0.1
    env_sh = np.asarray(onset_strength_sharded(y, mesh=mesh8))
    env = np.asarray(lt.onset.onset_strength(y=y, sr=22050, aggregate=jnp.mean))
    assert env_sh.shape == env.shape
    np.testing.assert_allclose(env_sh, env, atol=2e-5)


def test_pyin_sharded_matches_unsharded(mesh8):
    import librosa_tpu as lt
    from librosa_tpu.parallel import pyin_sharded

    sr, hop = 22050, 512
    n = 8 * hop * 24
    t = np.arange(n) / sr
    f_true = 220 * 2 ** (0.5 * np.sin(2 * np.pi * 0.7 * t))
    y = (0.4 * np.sin(2 * np.pi * np.cumsum(f_true) / sr)).astype(np.float32)

    f0_sh, vf_sh, vp_sh = pyin_sharded(y, mesh=mesh8, fmin=65, fmax=800, sr=sr)
    f0, vf, vp = lt.pyin(y, fmin=65, fmax=800, sr=sr)
    f0_sh, f0 = np.asarray(f0_sh), np.asarray(f0)
    assert f0_sh.shape == f0.shape
    # voicing decisions identical; f0 to f32 rounding; probs bit-exact
    assert np.array_equal(np.asarray(vf_sh), np.asarray(vf))
    both = np.isfinite(f0) & np.isfinite(f0_sh)
    np.testing.assert_allclose(f0_sh[both], f0[both], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vp_sh), np.asarray(vp), atol=1e-6)


def test_beat_track_sharded_matches_unsharded(mesh8, rng):
    import librosa_tpu as lt
    from librosa_tpu.parallel import beat_track_sharded

    sr, hop = 22050, 512
    n = 8 * hop * 32
    # click track at 120 bpm + noise floor
    y = 0.01 * rng.randn(n).astype(np.float32)
    period = int(0.5 * sr)
    for s in range(0, n - 256, period):
        y[s: s + 256] += np.hanning(256).astype(np.float32)

    tempo_sh, beats_sh = beat_track_sharded(y, mesh=mesh8, sr=sr,
                                            hop_length=hop)
    tempo, beats = lt.beat.beat_track(y=y, sr=sr, hop_length=hop)
    np.testing.assert_allclose(
        np.asarray(tempo_sh, dtype=float), np.asarray(tempo, dtype=float),
        rtol=1e-6,
    )
    assert np.array_equal(np.asarray(beats_sh), np.asarray(beats))


@pytest.mark.parametrize("pad_mode", ["constant", "reflect"])
def test_hpss_sharded_seamfree(mesh8, rng, pad_mode):
    from librosa_tpu.parallel import hpss_sharded

    n = 8 * 512 * 48
    t = np.arange(n) / 22050
    y = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * rng.randn(n)).astype(np.float32)

    h_s, p_s = hpss_sharded(y, mesh=mesh8, pad_mode=pad_mode)
    h_r, p_r = lt.effects.hpss(y, pad_mode=pad_mode)

    for a, b in ((h_s, h_r), (p_s, p_r)):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b)
        snr = 10 * np.log10((b**2).sum() / max((err**2).sum(), 1e-300))
        assert snr > 120, snr


def test_hpss_sharded_margins_multichannel(mesh8, rng):
    from librosa_tpu.parallel import hpss_sharded

    n = 8 * 512 * 48
    y = (0.1 * rng.randn(2, n)).astype(np.float32)

    h_s, p_s = hpss_sharded(y, mesh=mesh8, margin=2.0, kernel_size=17)
    h_r, p_r = lt.effects.hpss(y, margin=2.0, kernel_size=17)

    for a, b in ((h_s, h_r), (p_s, p_r)):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b)
        den = (b**2).sum()
        snr = 10 * np.log10(den / max((err**2).sum(), 1e-300))
        assert snr > 110, snr


def test_mfcc_sharded_matches_unsharded(mesh8, rng):
    from librosa_tpu.parallel import mfcc_sharded

    n = 8 * 512 * 32
    t = np.arange(n) / 22050
    y = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * rng.randn(n)).astype(np.float32)

    m_s = np.asarray(mfcc_sharded(y, mesh=mesh8, sr=22050))
    m_r = np.asarray(lt.feature.mfcc(y=y, sr=22050))
    nt = min(m_s.shape[-1], m_r.shape[-1])
    err = np.abs(m_s[..., :nt] - m_r[..., :nt])
    snr = 10 * np.log10(
        (m_r[..., :nt] ** 2).sum() / max((err**2).sum(), 1e-300)
    )
    assert snr > 120, snr


def test_chroma_cqt_sharded_matches_polyphase(mesh8, rng):
    # cqt_sharded's ladder is the polyphase resampler, so the oracle is
    # the unsharded chroma over cqt(res_type='polyphase')
    import jax.numpy as jnp

    from librosa_tpu import filters
    from librosa_tpu.feature.spectral import _project_norm_core
    from librosa_tpu.parallel import chroma_cqt_sharded

    n = 8 * 512 * 64
    t = np.arange(n) / 22050
    y = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * rng.randn(n)).astype(np.float32)

    c_s = np.asarray(chroma_cqt_sharded(
        y, mesh=mesh8, sr=22050, hop_length=512, n_octaves=4,
        bins_per_octave=12,
    ))
    fmin = float(lt.note_to_hz("C1"))
    C = np.abs(np.asarray(lt.cqt(
        y, sr=22050, hop_length=512, fmin=fmin, n_bins=48,
        bins_per_octave=12, res_type="polyphase", tuning=0.0,
    )))
    fb = filters.cq_to_chroma(48, bins_per_octave=12, n_chroma=12, fmin=fmin)
    c_r = np.asarray(_project_norm_core(
        jnp.asarray(C), jnp.asarray(fb.astype(np.float32)),
        threshold=0.0, norm=float(np.inf),
    ))
    nt = min(c_s.shape[-1], c_r.shape[-1])
    err = np.abs(c_s[..., :nt] - c_r[..., :nt])
    snr = 10 * np.log10(
        (c_r[..., :nt] ** 2).sum() / max((err**2).sum(), 1e-300)
    )
    assert snr > 120, snr


def test_scaling_harness_covers_every_sharded_entry_point():
    """Every *_sharded public entry point must have a scaling_report chain.

    SCALING.md's comm/compute table and the measurement harness are kept
    in lockstep: adding a sharded chain without a harness row fails here.
    """
    import librosa_tpu.parallel as par
    from librosa_tpu.parallel.scaling import _chains

    sharded = {
        name[: -len("_sharded")]
        for name in dir(par)
        if name.endswith("_sharded") and not name.startswith("_")
    }
    chains = set(_chains())
    # naming: melspectrogram_sharded -> melspectrogram, etc.
    missing = {s for s in sharded if s not in chains}
    assert not missing, f"sharded entry points without a scaling chain: {missing}"


def test_scaling_report_runs_on_virtual_mesh():
    from librosa_tpu.parallel.scaling import scaling_report

    pts = scaling_report(
        chain="melspectrogram", device_counts=[1, 2],
        seconds_per_device=2.0, iters=1,
    )
    assert [p.n_devices for p in pts] == [1, 2]
    assert pts[0].efficiency == 1.0
    assert all(p.samples_per_s > 0 for p in pts)
    assert all(p.chain == "melspectrogram" for p in pts)
