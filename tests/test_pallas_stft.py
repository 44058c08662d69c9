"""Fused Pallas STFT→mel kernel: numerics vs direct rfft reference.

Runs in interpret mode on CPU (the driver's real-TPU bench exercises the
compiled path); asserts the kernel's Cooley-Tukey factorization, window
handling, conjugate-symmetry basis fold, and tiling edges are exact.
"""

import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu import filters
from librosa_tpu.ops.pallas_stft import pallas_supported, stft_mel_pallas

SR = 22050


def _ref_mel(y, win, mb, n_fft, hop, power=2.0, center=True,
             pad_mode="constant"):
    pad = n_fft // 2 if center else 0
    fr = np.lib.stride_tricks.sliding_window_view(
        np.pad(y, pad, mode=pad_mode), n_fft
    )[::hop].astype(np.float64)
    spec = np.abs(np.fft.rfft(fr * win.astype(np.float64), axis=-1))
    return ((spec**power) @ mb.astype(np.float64).T).T


def _snr(a, b):
    err = a.astype(np.float64) - b
    return 10 * np.log10((b**2).sum() / max((err**2).sum(), 1e-300))


@pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256), (512, 128),
                                       (2048, 2048)])
def test_kernel_matches_rfft(rng, n_fft, hop):
    y = (rng.randn(SR) * 0.1).astype(np.float32)
    win = np.hanning(n_fft).astype(np.float32)
    mb = filters.mel(sr=SR, n_fft=n_fft, n_mels=64).astype(np.float32)
    out = np.asarray(
        stft_mel_pallas(y, win, mb, n_fft=n_fft, hop_length=hop,
                        interpret=True)
    )
    ref = _ref_mel(y, win, mb, n_fft, hop)
    assert out.shape == ref.shape
    assert _snr(out, ref) > 120


def test_kernel_power_one(rng):
    y = (rng.randn(SR // 2) * 0.1).astype(np.float32)
    win = np.hanning(512).astype(np.float32)
    mb = filters.mel(sr=SR, n_fft=512, n_mels=32).astype(np.float32)
    out = np.asarray(
        stft_mel_pallas(y, win, mb, n_fft=512, hop_length=128, power=1.0,
                        interpret=True)
    )
    ref = _ref_mel(y, win, mb, 512, 128, power=1.0)
    assert _snr(out, ref) > 110


def test_kernel_multichannel_vmap(rng):
    y = (rng.randn(2, SR // 2) * 0.1).astype(np.float32)
    win = np.hanning(512).astype(np.float32)
    mb = filters.mel(sr=SR, n_fft=512, n_mels=32).astype(np.float32)
    out = np.asarray(
        stft_mel_pallas(y, win, mb, n_fft=512, hop_length=128,
                        interpret=True)
    )
    for ch in range(2):
        ref = _ref_mel(y[ch], win, mb, 512, 128)
        assert _snr(out[ch], ref) > 120


@pytest.mark.parametrize(
    "n_fft,hop,length,center,pad_mode",
    [
        # long input → interior tiles DMA straight from the unpadded
        # signal (the zero-copy fast path); edges carry the padding
        (512, 128, 40000, True, "constant"),
        (512, 128, 40000, True, "reflect"),
        (512, 128, 40000, False, "constant"),
        # n_frames ≡ 1 (mod tile): the tail reaches back past the last
        # tile, so two consecutive right-edge tiles are pre-assembled
        (512, 128, 2 * 128 * 128, True, "constant"),
        # input shorter than one hop row: no physical rows at all
        (512, 128, 400, True, "constant"),
        (512, 128, 400, True, "reflect"),
    ],
)
def test_kernel_edge_tiles(rng, n_fft, hop, length, center, pad_mode):
    y = (rng.randn(length) * 0.1).astype(np.float32)
    win = np.hanning(n_fft).astype(np.float32)
    mb = filters.mel(sr=SR, n_fft=n_fft, n_mels=64).astype(np.float32)
    out = np.asarray(
        stft_mel_pallas(y, win, mb, n_fft=n_fft, hop_length=hop,
                        center=center, pad_mode=pad_mode, interpret=True)
    )
    ref = _ref_mel(y, win, mb, n_fft, hop, center=center, pad_mode=pad_mode)
    assert out.shape == ref.shape
    assert _snr(out, ref) > 115


def test_kernel_multitrack_unaligned_rows(rng):
    # 3 tracks whose per-track row count is not a multiple of 8: interior
    # DMA starts lose their 8-alignment guarantee across track boundaries
    n_fft, hop = 512, 128
    length = 129 * hop + 57          # phys_rows = 129 ≢ 0 (mod 8)
    y = (rng.randn(3, length) * 0.1).astype(np.float32)
    win = np.hanning(n_fft).astype(np.float32)
    mb = filters.mel(sr=SR, n_fft=n_fft, n_mels=64).astype(np.float32)
    out = np.asarray(
        stft_mel_pallas(y, win, mb, n_fft=n_fft, hop_length=hop,
                        interpret=True)
    )
    for ch in range(3):
        ref = _ref_mel(y[ch], win, mb, n_fft, hop)
        assert _snr(out[ch], ref) > 115


def test_kernel_support_matrix():
    assert pallas_supported(2048, 512)
    assert pallas_supported(4096, 1024)
    assert not pallas_supported(2048, 500)   # hop doesn't divide n_fft
    assert not pallas_supported(2000, 512)   # not a power of two
    assert not pallas_supported(2048, 64)    # hop not lane-aligned
    assert not pallas_supported(128, 128)    # too small


def test_melspectrogram_agrees_with_kernel(rng, tone_440):
    # public API on CPU uses the XLA path; it must match the kernel's math
    y = np.asarray(tone_440)
    M_api = np.asarray(lt.feature.melspectrogram(y=y, sr=SR))
    win = np.asarray(
        lt.filters.get_window("hann", 2048, fftbins=True), dtype=np.float32
    )
    mb = filters.mel(sr=SR, n_fft=2048, n_mels=128).astype(np.float32)
    M_kern = np.asarray(
        stft_mel_pallas(y, win, mb, n_fft=2048, hop_length=512,
                        interpret=True)
    )
    assert M_api.shape == M_kern.shape
    assert _snr(M_kern, M_api.astype(np.float64)) > 110


def test_chroma_stft_kernel_path_matches_xla(rng, tone_440):
    # with explicit tuning, chroma_stft may use the fused kernel on TPU;
    # on CPU both take the XLA path — assert the two entry forms agree.
    y = np.asarray(tone_440)
    c1 = np.asarray(lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0))
    S = np.asarray(np.abs(np.asarray(lt.stft(y))) ** 2)
    c2 = np.asarray(lt.feature.chroma_stft(S=S, sr=SR, tuning=0.0))
    assert np.allclose(c1[:, : c2.shape[1]], c2, atol=1e-5)


def test_kernel_accepts_traced_window():
    # Regression: converting the window via np.asarray blew up when the
    # caller was under an outer jit (window is a tracer), silently falling
    # back to the XLA pipeline — a 3x throughput loss on TPU.
    import jax
    import jax.numpy as jnp

    from librosa_tpu import filters
    from librosa_tpu.ops.pallas_stft import stft_mel_pallas

    y = np.random.RandomState(0).randn(8192).astype(np.float32)
    mel = filters.mel(sr=22050, n_fft=256, n_mels=32)
    win = filters.get_window("hann", 256).astype(np.float32)

    @jax.jit
    def run(yy, w):
        return stft_mel_pallas(
            yy, w, mel, n_fft=256, hop_length=128, interpret=True
        )

    out = np.asarray(run(jnp.asarray(y), jnp.asarray(win)))
    ref = np.asarray(
        stft_mel_pallas(y, win, mel, n_fft=256, hop_length=128,
                        interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_device_const_cache_never_holds_tracers():
    import jax
    import jax.numpy as jnp

    from librosa_tpu.ops import pallas_stft as P

    for v in P._DEV_CONSTS.values():
        assert not any(isinstance(a, jax.core.Tracer) for a in v)
    from librosa_tpu.core import pitch as pitch_mod

    for v in pitch_mod._PYIN_DEV.values():
        assert not any(isinstance(a, jax.core.Tracer) for a in v)


def test_legacy_layout_bitexact(rng):
    # the padded fallback layout (used if Mosaic rejects the zero-copy
    # DMA structure) must stay bit-identical to the primary path
    from librosa_tpu.ops import pallas_stft as P

    y = (rng.randn(40000) * 0.1).astype(np.float32)
    win = np.hanning(512).astype(np.float32)
    mb = filters.mel(sr=SR, n_fft=512, n_mels=64).astype(np.float32)
    fast = np.asarray(
        stft_mel_pallas(y, win, mb, n_fft=512, hop_length=128,
                        interpret=True)
    )
    P._LEGACY_CONFIGS.add((512, 128))
    try:
        legacy = np.asarray(
            stft_mel_pallas(y, win, mb, n_fft=512, hop_length=128,
                            interpret=True)
        )
    finally:
        P._LEGACY_CONFIGS.discard((512, 128))
    assert np.array_equal(fast, legacy)


@pytest.mark.parametrize("shape", [(22050 * 6,), (2, 22050 * 3)])
def test_pair_tiles_bit_identical(rng, shape):
    """The interleaved paired-tile variant must be bit-identical.

    pair_tiles only changes op emission ORDER (two sub-tiles staggered so
    VPU stages can overlap the other half's MXU passes); any numerical
    difference means the halves got mixed up.
    """
    import numpy as np

    import librosa_tpu.filters as ltf
    from librosa_tpu.ops.pallas_stft import stft_mel_pallas

    mel = np.asarray(ltf.mel(sr=22050, n_fft=2048, n_mels=128))
    win = np.hanning(2049)[:-1].astype(np.float32)
    y = rng.randn(*shape).astype(np.float32)
    single = np.asarray(
        stft_mel_pallas(y, win, mel, n_fft=2048, hop_length=512,
                        interpret=True)
    )
    paired = np.asarray(
        stft_mel_pallas(y, win, mel, n_fft=2048, hop_length=512,
                        interpret=True, pair_tiles=True)
    )
    np.testing.assert_array_equal(single, paired)


def test_pack_a_matches_standard_kernel(rng):
    """Lane-packed stage A must match at f32-reassociation level.

    The block-diagonal dot accumulates in a different order, so exact
    bit-identity is not expected — but anything beyond ~1e-6 relative
    means the frame packing or the post-power relayout is misindexed.
    """
    import numpy as np

    import librosa_tpu.filters as ltf
    from librosa_tpu.ops.pallas_stft import stft_mel_pallas

    mel = np.asarray(ltf.mel(sr=22050, n_fft=2048, n_mels=128))
    win = np.hanning(2049)[:-1].astype(np.float32)
    y = rng.randn(22050 * 4).astype(np.float32)
    std = np.asarray(
        stft_mel_pallas(y, win, mel, n_fft=2048, hop_length=512,
                        interpret=True)
    )
    packed = np.asarray(
        stft_mel_pallas(y, win, mel, n_fft=2048, hop_length=512,
                        interpret=True, pack_a=True, tile_frames=112)
    )
    assert std.shape == packed.shape
    rel = np.abs(std - packed).max() / np.abs(std).max()
    assert rel < 1e-6, rel
    # combined pair+pack variant (interleaved packed halves)
    both = np.asarray(
        stft_mel_pallas(y, win, mel, n_fft=2048, hop_length=512,
                        interpret=True, pack_a=True, pair_tiles=True,
                        tile_frames=112)
    )
    np.testing.assert_array_equal(both, packed)
    with pytest.raises(ValueError):
        # sub-tile not divisible by the pack group
        stft_mel_pallas(y, win, mel, n_fft=2048, hop_length=512,
                        interpret=True, pack_a=True, tile_frames=100)
    # pack_out: relayout deferred to a wrapper-side column un-permute
    perm = np.asarray(
        stft_mel_pallas(y, win, mel, n_fft=2048, hop_length=512,
                        interpret=True, pack_a=True, tile_frames=112,
                        pack_perm_out=True)
    )
    rel_perm = np.abs(std - perm).max() / np.abs(std).max()
    assert rel_perm < 1e-6, rel_perm
    # batched inputs un-permute per tile block too
    yb = rng.randn(2, 22050 * 2).astype(np.float32)
    std_b = np.asarray(
        stft_mel_pallas(yb, win, mel, n_fft=2048, hop_length=512,
                        interpret=True)
    )
    perm_b = np.asarray(
        stft_mel_pallas(yb, win, mel, n_fft=2048, hop_length=512,
                        interpret=True, pack_a=True, tile_frames=112,
                        pack_perm_out=True)
    )
    rel_b = np.abs(std_b - perm_b).max() / np.abs(std_b).max()
    assert rel_b < 1e-6, rel_b


def test_variant_failure_falls_back_and_latches(rng, monkeypatch):
    """A variant the toolchain rejects must not take the kernel down.

    If Mosaic rejects a pair/pack layout, the call retries with the
    protected default path (recomputing the single-tile geometry) and
    latches the config in ``_FAILED_VARIANTS`` so later calls skip the
    variant without re-poisoning the device.
    """
    import warnings

    import librosa_tpu.filters as ltf
    from librosa_tpu.ops import pallas_stft as P

    mel = np.asarray(ltf.mel(sr=22050, n_fft=2048, n_mels=128))
    win = np.hanning(2049)[:-1].astype(np.float32)
    y = rng.randn(22050 * 2).astype(np.float32)
    default = np.asarray(
        P.stft_mel_pallas(y, win, mel, n_fft=2048, hop_length=512,
                          interpret=True)
    )

    real = P._cached_call

    def reject_variants(*cfg, **kw):
        if kw.get("pair") or kw.get("pack_a"):
            raise RuntimeError("synthetic Mosaic rejection")
        return real(*cfg, **kw)

    monkeypatch.setattr(P, "_cached_call", reject_variants)
    P._FAILED_VARIANTS.discard((2048, 512))
    try:
        with pytest.warns(UserWarning, match="variant"):
            out = np.asarray(
                P.stft_mel_pallas(y, win, mel, n_fft=2048, hop_length=512,
                                  interpret=True, pair_tiles=True)
            )
        np.testing.assert_array_equal(out, default)
        assert (2048, 512) in P._FAILED_VARIANTS
        # latched: the second call goes straight to the default path
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out2 = np.asarray(
                P.stft_mel_pallas(y, win, mel, n_fft=2048, hop_length=512,
                                  interpret=True, pair_tiles=True)
            )
        np.testing.assert_array_equal(out2, default)
    finally:
        P._FAILED_VARIANTS.discard((2048, 512))
