"""Tests for librosa_tpu.util — the substrate layer."""

import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu.util import utils as util
from librosa_tpu.util.exceptions import ParameterError


def test_frame_shape():
    x = np.arange(32, dtype=np.float32)
    f = np.asarray(util.frame(x, frame_length=8, hop_length=4))
    assert f.shape == (8, 7)
    # frame t contains x[t*hop : t*hop + frame_length]
    for t in range(7):
        assert np.all(f[:, t] == x[t * 4 : t * 4 + 8])


def test_frame_axis0():
    x = np.arange(32, dtype=np.float32)
    f = np.asarray(util.frame(x, frame_length=8, hop_length=4, axis=0))
    assert f.shape == (7, 8)
    for t in range(7):
        assert np.all(f[t] == x[t * 4 : t * 4 + 8])


def test_frame_too_short():
    with pytest.raises(ParameterError):
        util.frame(np.zeros(4), frame_length=8, hop_length=2)


def test_pad_center():
    x = np.ones(5)
    y = np.asarray(util.pad_center(x, size=9))
    assert y.shape == (9,)
    assert np.all(y[2:7] == 1) and y[0] == 0 and y[-1] == 0
    with pytest.raises(ParameterError):
        util.pad_center(x, size=3)


def test_fix_length():
    x = np.arange(10.0)
    assert util.fix_length(x, size=5).shape == (5,)
    y = np.asarray(util.fix_length(x, size=15))
    assert y.shape == (15,) and np.all(y[10:] == 0)


def test_expand_to():
    x = np.arange(3.0)
    y = util.expand_to(x, ndim=3, axes=-2)
    assert y.shape == (1, 3, 1)


@pytest.mark.parametrize("norm", [np.inf, -np.inf, 0, 1, 2, 0.5, None])
@pytest.mark.parametrize("axis", [0, -1])
def test_normalize_matches_reference_semantics(norm, axis, rng):
    X = np.abs(rng.randn(6, 8)).astype(np.float32) + 0.1
    out = np.asarray(util.normalize(X, norm=norm, axis=axis))
    # independent reference computation
    if norm is None:
        expected = X
    elif norm == np.inf:
        expected = X / np.max(np.abs(X), axis=axis, keepdims=True)
    elif norm == -np.inf:
        expected = X / np.min(np.abs(X), axis=axis, keepdims=True)
    elif norm == 0:
        expected = X / np.sum(np.abs(X) > 0, axis=axis, keepdims=True)
    else:
        expected = X / np.sum(np.abs(X) ** norm, axis=axis, keepdims=True) ** (
            1.0 / norm
        )
    assert np.allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_normalize_fill():
    X = np.zeros((3, 4), dtype=np.float32)
    # fill=False → zeros
    out = np.asarray(util.normalize(X, norm=2, axis=0, fill=False))
    assert np.all(out == 0)
    # fill=True → uniform fill_norm = n**(-1/p)
    out = np.asarray(util.normalize(X, norm=2, axis=0, fill=True))
    assert np.allclose(out, 3 ** (-0.5))


def test_localmax_docstring():
    x = np.array([1, 0, 1, 2, -1, 0, -2, 1])
    m = np.asarray(util.localmax(x))
    assert np.array_equal(
        m, [False, False, False, True, False, True, False, True]
    )


def test_localmin_docstring():
    x = np.array([1, 0, 1, 2, -1, 0, -2, 1])
    m = np.asarray(util.localmin(x))
    assert np.array_equal(
        m, [False, True, False, False, True, False, True, False]
    )


def test_localmax_2d_axes():
    x = np.array([[1, 0, 1], [2, -1, 0], [2, 1, 3]])
    m0 = np.asarray(util.localmax(x, axis=0))
    assert np.array_equal(
        m0,
        [[False, False, False], [True, False, False], [False, True, True]],
    )
    m1 = np.asarray(util.localmax(x, axis=1))
    assert np.array_equal(
        m1,
        [[False, False, True], [False, False, True], [False, False, True]],
    )


def test_peak_pick_greedy():
    x = np.zeros(100)
    x[10] = 1.0
    x[12] = 0.9  # within wait window of 10 → suppressed
    x[50] = 2.0
    peaks = util.peak_pick(
        x, pre_max=3, post_max=3, pre_avg=3, post_avg=5, delta=0.5, wait=10
    )
    assert list(peaks) == [10, 50]


def test_peak_pick_dp():
    x = np.zeros(60)
    x[5] = 1.0
    x[30] = 1.0
    peaks = util.peak_pick(
        x, pre_max=3, post_max=3, pre_avg=3, post_avg=5, delta=0.1, wait=2,
        method="dp_value",
    )
    assert 5 in peaks and 30 in peaks


def test_peak_pick_batch_matches_single():
    # Batched inputs route through the ops.peaks scan kernels; every row
    # must agree with the host single-envelope path.
    x = np.random.default_rng(440).random((6, 300)).astype(np.float32)
    for method in ("greedy", "dp_count", "dp_value"):
        batch = util.peak_pick(
            x, pre_max=3, post_max=3, pre_avg=5, post_avg=5, delta=0.05,
            wait=8, sparse=False, method=method,
        )
        assert batch.sum() > 0
        for r in range(x.shape[0]):
            single = util.peak_pick(
                x[r], pre_max=3, post_max=3, pre_avg=5, post_avg=5,
                delta=0.05, wait=8, sparse=False, method=method,
            )
            assert np.array_equal(batch[r], single), (method, r)


def test_peak_pick_batch_edge_configs():
    x = np.random.default_rng(7).random((4, 120)).astype(np.float32)
    for pm, qm, pa, qa, d, w in [(1, 1, 1, 1, 0.0, 0), (0, 5, 0, 7, 0.02, 2)]:
        for method in ("greedy", "dp_count"):
            batch = util.peak_pick(
                x, pre_max=pm, post_max=qm, pre_avg=pa, post_avg=qa,
                delta=d, wait=w, sparse=False, method=method,
            )
            singles = np.stack([
                util.peak_pick(
                    x[r], pre_max=pm, post_max=qm, pre_avg=pa, post_avg=qa,
                    delta=d, wait=w, sparse=False, method=method,
                )
                for r in range(x.shape[0])
            ])
            assert np.array_equal(batch, singles), (pm, qm, pa, qa, d, w, method)


def test_softmask():
    X = np.abs(np.random.RandomState(0).randn(4, 5)).astype(np.float32)
    R = np.abs(np.random.RandomState(1).randn(4, 5)).astype(np.float32)
    M = np.asarray(util.softmask(X, R, power=2))
    assert np.allclose(M, X**2 / (X**2 + R**2), rtol=1e-4, atol=1e-5)
    # hard mask
    Mh = np.asarray(util.softmask(X, R, power=np.inf))
    assert np.array_equal(Mh, (X > R).astype(np.float32))


def test_sync():
    data = np.arange(12.0).reshape(1, 12)
    out = np.asarray(util.sync(data, [0, 4, 8, 12], aggregate=None))
    assert out.shape == (1, 3)
    assert np.allclose(out[0], [1.5, 5.5, 9.5])


def test_tiny():
    assert util.tiny(np.zeros(1, dtype=np.float32)) == np.finfo(np.float32).tiny
    assert util.tiny(np.zeros(1, dtype=np.float64)) == np.finfo(np.float64).tiny
    assert util.tiny(np.zeros(1, dtype=np.complex64)) == np.finfo(np.float32).tiny


def test_abs2_phasor():
    z = np.array([3 + 4j], dtype=np.complex64)
    assert np.allclose(util.abs2(z), 25.0)
    ang = np.array([0.0, np.pi / 2])
    p = np.asarray(util.phasor(ang))
    assert np.allclose(p, [1 + 0j, 1j], atol=1e-7)
    p2 = np.asarray(util.phasor(ang, mag=np.array([2.0, 3.0])))
    assert np.allclose(p2, [2 + 0j, 3j], atol=1e-6)


def test_dtype_conversions():
    assert util.dtype_r2c(np.float32) == np.complex64
    assert util.dtype_r2c(np.float64) == np.complex128
    assert util.dtype_c2r(np.complex64) == np.float32
    assert util.dtype_c2r(np.complex128) == np.float64


def test_count_unique():
    x = np.array([[1, 2, 2, 3], [5, 5, 5, 5]])
    assert np.array_equal(np.asarray(util.count_unique(x, axis=-1)), [3, 1])
    assert np.array_equal(
        np.asarray(util.is_unique(x, axis=-1)), [False, False]
    )


def test_shear():
    E = np.eye(3)
    out = np.asarray(util.shear(E, factor=-1, axis=-1))
    # shearing the identity concentrates mass in one column/row pattern
    assert out.shape == (3, 3)
    assert np.allclose(out.sum(), 3)
    # factor=0 is identity
    assert np.allclose(np.asarray(util.shear(E, factor=0, axis=-1)), E)


def test_stack():
    a, b = np.ones(4), np.zeros(4)
    out = np.asarray(util.stack([a, b], axis=0))
    assert out.shape == (2, 4)
    with pytest.raises(ParameterError):
        util.stack([np.ones(3), np.ones(4)])


def test_sparsify_rows():
    X = np.array([[0.0, 0.01, 1.0, 0.0, 2.0]])
    S = util.sparsify_rows(X, quantile=0.01)
    assert S.shape == (1, 5)
    dense = S.toarray()
    assert dense[0, 2] == 1.0 and dense[0, 4] == 2.0


def test_match_events():
    from librosa_tpu.util.matching import match_events

    f = np.array([1.0, 5.0, 10.0])
    t = np.array([0.0, 6.0, 11.0])
    m = match_events(f, t)
    assert np.array_equal(m, [0, 1, 2])


def test_match_intervals():
    from librosa_tpu.util.matching import match_intervals

    a = np.array([[0.0, 1.0], [2.0, 3.0]])
    b = np.array([[0.1, 0.9], [1.9, 3.1], [5, 6]])
    m = match_intervals(a, b)
    assert np.array_equal(m, [0, 1])


def test_nnls():
    rng = np.random.RandomState(0)
    A = np.abs(rng.randn(20, 10)).astype(np.float32)
    x_true = np.abs(rng.randn(10, 4)).astype(np.float32)
    B = A @ x_true
    x = np.asarray(lt.util.nnls(A, B))
    assert x.min() >= 0
    assert np.linalg.norm(A @ x - B) / np.linalg.norm(B) < 1e-3


def test_interp_broadcast():
    x1 = np.array([1.0, 1.0, 1.0])
    x1_pos = np.array([0.0, 0.5, 1.0])
    x2 = np.array([5.0, 10.0])
    x2_pos = np.array([0.0, 1.0])
    out = lt.util.interp_broadcast(
        x1=x1, x1_pos=x1_pos, x2=x2, x2_pos=x2_pos, axis=0
    )
    assert np.allclose(out, [5.0, 7.5, 10.0])
    y1, y2 = lt.util.interp_broadcast(
        x1=x1, x1_pos=x1_pos, x2=x2, x2_pos=x2_pos, axis=0, op=None
    )
    assert np.allclose(y1, 1.0) and np.allclose(y2, [5.0, 7.5, 10.0])
    with pytest.raises(lt.ParameterError):
        lt.util.interp_broadcast(
            x1=x1, x1_pos=x1_pos, x2=x2, x2_pos=x2_pos, axis=3
        )


def test_future_default_warns():
    from librosa_tpu.util.decorators import future_default

    @future_default(param_name="x", old_default=1, new_default=2, version="9.9")
    def g(x=1):
        return x

    with pytest.warns(FutureWarning):
        assert g() == 1
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert g(x=5) == 5


def test_roofline_report():
    from librosa_tpu.util import profiling
    import jax.numpy as jnp

    x = np.random.RandomState(0).randn(256, 256).astype(np.float32)
    ceil = profiling.DeviceCeilings(
        matmul_f32_flops=1e12, matmul_bf16_flops=2e12, hbm_bytes_per_s=1e11
    )
    rep = profiling.roofline(
        lambda a: jnp.matmul(a, a), jnp.asarray(x), ceilings=ceil, iters=1
    )
    assert rep.seconds > 0
    assert rep.bound in ("compute", "memory", "unknown")
    assert "ms" in str(rep)


def test_calibrate_runs_on_cpu():
    from librosa_tpu.util import profiling

    c = profiling.calibrate(size=256)
    assert c.matmul_f32_flops > 0
    assert c.hbm_bytes_per_s > 0
