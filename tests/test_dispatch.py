"""Launch-count regression tests for the analysis chains.

Over the axon tunnel every separate device program launch costs ~1-22 ms
of dispatch latency, so the bench configs' latency floor is the number
of programs they issue (LATENCY.md).  ``dispatch_profile`` counts XLA
executable launches from a profiler trace — a backend-independent
property of the program structure — so these tests pin the fused chains
at their intended launch budgets on the CPU backend.

A failure here means an eager op crept back between the jitted cores
(e.g. an indexing slice, a dtype cast, or a PRNG init outside the jit).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu.util.profiling import dispatch_profile

SR = 22050


@pytest.fixture(scope="module")
def y10():
    rng = np.random.RandomState(440)
    t = np.arange(SR * 10) / SR
    y = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.randn(len(t)))
    return jnp.asarray(y.astype(np.float32))


def test_dispatch_profile_counts_jit_and_eager():
    import jax

    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((64, 64))
    r = dispatch_profile(lambda: f(x).block_until_ready())
    assert r["launches"] == 1
    # one eager primitive = one more launch, attributed to the primitive
    # (eager ops route through a jit-of-primitive span on this JAX)
    r = dispatch_profile(lambda: (f(x) + 1).block_until_ready())
    assert r["launches"] == 2
    assert r["by_function"].get("add") == 1


def test_onset_strength_single_launch(y10):
    r = dispatch_profile(
        lambda: lt.onset.onset_strength(y=y10, sr=SR, aggregate=jnp.median)
    )
    assert r["launches"] == 1, r


def test_tempo_from_envelope_single_launch(y10):
    env = np.asarray(lt.onset.onset_strength(y=y10, sr=SR))
    r = dispatch_profile(lambda: lt.feature.tempo(onset_envelope=env, sr=SR))
    assert r["launches"] == 1, r


def test_beat_track_two_launches(y10):
    # one device program (fused onset strength) + the local tempo program;
    # the sequential DP itself is host-side numpy
    r = dispatch_profile(lambda: lt.beat.beat_track(y=y10, sr=SR))
    assert r["launches"] <= 2, r


def test_pyin_single_launch(y10):
    y2 = y10[: SR * 2]
    r = dispatch_profile(lambda: lt.pyin(y2, fmin=65, fmax=800, sr=SR)[0])
    assert r["launches"] == 1, r


def test_griffinlim_single_launch(y10):
    S = jnp.abs(lt.stft(y10[: SR * 2]))
    S.block_until_ready()
    r = dispatch_profile(lambda: lt.griffinlim(S, n_iter=4))
    assert r["launches"] == 1, r


def test_resample_polyphase_single_launch(y10):
    r = dispatch_profile(
        lambda: lt.resample(y10, orig_sr=SR, target_sr=16000,
                            res_type="polyphase")
    )
    assert r["launches"] == 1, r


def test_eager_heavy_chains_fused(y10):
    # second-wave fusions: each body is one jitted core after its inputs
    y2 = y10[: SR * 2]
    S = jnp.abs(lt.stft(y2))
    S.block_until_ready()
    D = lt.stft(y2)
    D.block_until_ready()
    cases = {
        "pcen": (lambda: lt.pcen(S**2), 2),        # pow + core
        "yin": (lambda: lt.yin(y2, fmin=65, fmax=800, sr=SR), 1),
        "piptrack": (lambda: lt.piptrack(S=S, sr=SR), 1),
        "contrast": (lambda: lt.feature.spectral_contrast(S=S, sr=SR), 1),
        "phase_vocoder": (lambda: lt.phase_vocoder(D, rate=1.3), 1),
        "magphase": (lambda: lt.magphase(D), 1),
        "hpss_margin": (lambda: lt.decompose.hpss(S, margin=2.0)[0], 1),
        "salience": (lambda: lt.salience(
            S, freqs=np.linspace(50, 8000, S.shape[-2]),
            harmonics=[1, 2, 3]), 1),
        "delta": (lambda: lt.feature.delta(S), 1),
        "stack_memory": (lambda: lt.feature.stack_memory(S), 1),
        "trim": (lambda: lt.effects.trim(y2)[0], 1),
        "preemphasis": (lambda: lt.effects.preemphasis(y2), 1),
        "deemphasis": (lambda: lt.effects.deemphasis(y2), 1),
    }
    for name, (fn, budget) in cases.items():
        r = dispatch_profile(fn)
        assert r["launches"] <= budget, (name, r)


def test_third_wave_chains_fused(y10):
    y2 = y10[: SR * 2]
    S = jnp.abs(lt.stft(y2))
    S.block_until_ready()
    R = jnp.asarray(np.random.RandomState(0).rand(50, 50).astype(np.float32))
    R.block_until_ready()
    cases = {
        "salience": (lambda: lt.salience(
            S, freqs=np.linspace(50, 8000, S.shape[-2]),
            harmonics=[1, 2, 3]), 1),
        "interp_harmonics": (lambda: lt.interp_harmonics(
            S, freqs=np.linspace(0, SR / 2, S.shape[-2]),
            harmonics=[1, 2]), 1),
        "path_enhance": (lambda: lt.segment.path_enhance(R, 15), 1),
        "autocorrelate": (lambda: lt.autocorrelate(y2), 1),
        "reassigned": (lambda: lt.reassigned_spectrogram(y2, sr=SR), 4),
        "nmf_mu": (lambda: lt.decompose.decompose(
            S, n_components=3, transformer="mu")[0], 1),
    }
    for name, (fn, budget) in cases.items():
        r = dispatch_profile(fn)
        assert r["launches"] <= budget, (name, r)


def test_fourth_wave_chains_fused(y10):
    y2 = y10[: SR * 2]
    S = jnp.abs(lt.stft(y2)) ** 2
    S.block_until_ready()
    Smag = jnp.sqrt(S)
    Smag.block_until_ready()
    cases = {
        "power_to_db": (lambda: lt.power_to_db(S), 1),
        "power_to_db_max": (lambda: lt.power_to_db(S, ref=np.max), 2),
        "amplitude_to_db": (lambda: lt.amplitude_to_db(Smag), 1),
        "mu_compress": (lambda: lt.mu_compress(y2), 1),
        "remix": (lambda: lt.effects.remix(y2, [(0, 500), (900, 1400)]), 1),
        "sync": (lambda: lt.util.sync(S, [0, 10, 20]), 1),
        "viterbi": (lambda: lt.sequence.viterbi(
            np.abs(np.random.RandomState(0).rand(4, 30)),
            np.full((4, 4), 0.25)), 2),
    }
    for name, (fn, budget) in cases.items():
        r = dispatch_profile(fn)
        assert r["launches"] <= budget, (name, r)


def test_power_to_db_max_peak_exact(y10):
    # 0 dB at the peak is contractual (reference semantics + docstring)
    S = jnp.abs(lt.stft(y10[: SR * 2])) ** 2
    out = np.asarray(lt.power_to_db(S, ref=np.max))
    assert out.max() == 0.0
    out = np.asarray(lt.amplitude_to_db(jnp.sqrt(S), ref=np.max))
    assert out.max() == 0.0


def test_griffinlim_reseed_does_not_recompile():
    # the seed is a traced scalar: different rng values must reuse the
    # compiled program (compiles would show as huge extra latency on TPU)
    S = jnp.abs(lt.stft(jnp.asarray(
        np.random.RandomState(0).randn(SR).astype(np.float32))))
    a = lt.griffinlim(S, n_iter=2, rng=1)
    r = dispatch_profile(lambda: lt.griffinlim(S, n_iter=2, rng=2))
    assert r["launches"] == 1, r
    b = lt.griffinlim(S, n_iter=2, rng=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCqtFamilyBudgets:
    """Fourth-wave fusions: the whole CQT family as single programs.

    With a device res_type the full transform (early decimation, octave
    resample ladder, STFTs, basis products, trim/stack) traces into ONE
    jitted entry; the Griffin-Lim CQT loop is one fori_loop program
    regardless of n_iter.
    """

    @pytest.fixture(scope="class")
    def y1(self):
        return np.asarray(lt.tone(220, duration=1.0))

    def test_cqt_single_launch(self, y1):
        r = dispatch_profile(
            lambda: lt.cqt(y1, sr=SR, n_bins=48, res_type="polyphase")
        )
        assert r["launches"] == 1, r

    def test_icqt_single_launch(self, y1):
        C = np.asarray(lt.cqt(y1, sr=SR, n_bins=48, res_type="polyphase"))
        r = dispatch_profile(
            lambda: lt.icqt(C, sr=SR, res_type="polyphase", length=len(y1))
        )
        assert r["launches"] == 1, r

    def test_hybrid_cqt_single_launch(self, y1):
        r = dispatch_profile(
            lambda: lt.hybrid_cqt(y1, sr=SR, n_bins=48, res_type="polyphase")
        )
        assert r["launches"] == 1, r

    def test_griffinlim_cqt_three_launches(self, y1):
        C = np.abs(np.asarray(lt.cqt(y1, sr=SR, n_bins=48, res_type="polyphase")))
        r = dispatch_profile(
            lambda: lt.griffinlim_cqt(
                C, sr=SR, n_iter=3, res_type="polyphase", length=len(y1)
            )
        )
        assert r["launches"] <= 3, r

    def test_mfcc_to_audio_three_launches(self, y1):
        M = np.asarray(lt.feature.mfcc(y=y1, sr=SR))
        r = dispatch_profile(
            lambda: lt.feature.inverse.mfcc_to_audio(M, sr=SR, length=len(y1))
        )
        assert r["launches"] <= 3, r

    def test_chroma_vqt_two_launches(self, y1):
        r = dispatch_profile(
            lambda: lt.feature.chroma_vqt(y=y1, sr=SR, intervals="equal")
        )
        assert r["launches"] <= 2, r
