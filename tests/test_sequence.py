"""Tests for sequence models: viterbi, DTW, RQA, transitions."""

import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu import sequence as seq
from librosa_tpu.util.exceptions import ParameterError


def _viterbi_numpy(prob, transition, p_init):
    """Reference NumPy Viterbi for cross-checking (log-space, float64)."""
    eps = np.finfo(prob.dtype).tiny
    lp = np.log(prob + eps).T  # (T, S)
    lt_ = np.log(transition + eps)
    lpi = np.log(p_init + eps)
    T, S = lp.shape
    value = np.zeros((T, S))
    ptr = np.zeros((T, S), dtype=int)
    value[0] = lp[0] + lpi
    for t in range(1, T):
        scores = value[t - 1][:, None] + lt_
        ptr[t] = np.argmax(scores, axis=0)
        value[t] = lp[t] + np.max(scores, axis=0)
    states = np.zeros(T, dtype=int)
    states[-1] = np.argmax(value[-1])
    for t in range(T - 2, -1, -1):
        states[t] = ptr[t + 1, states[t + 1]]
    return states, value[-1].max()


def test_viterbi_matches_numpy(rng):
    S, T = 5, 40
    prob = rng.rand(S, T)
    prob /= prob.sum(axis=0, keepdims=True)
    trans = rng.rand(S, S)
    trans /= trans.sum(axis=1, keepdims=True)
    p_init = np.full(S, 1 / S)

    states, logp = seq.viterbi(prob, trans, p_init=p_init, return_logp=True)
    ref_states, ref_logp = _viterbi_numpy(prob, trans, p_init)
    assert np.array_equal(np.asarray(states), ref_states)
    assert np.allclose(float(logp), ref_logp, rtol=1e-4)


def test_viterbi_batched(rng):
    S, T = 4, 25
    prob = rng.rand(3, S, T)
    prob /= prob.sum(axis=-2, keepdims=True)
    trans = seq.transition_loop(S, 0.8)

    states = np.asarray(seq.viterbi(prob, trans))
    assert states.shape == (3, T)
    for c in range(3):
        s_c = np.asarray(seq.viterbi(prob[c], trans))
        assert np.array_equal(states[c], s_c)


def test_viterbi_pruning_equivalence(rng):
    S, T = 6, 30
    prob = rng.rand(S, T)
    prob /= prob.sum(axis=0, keepdims=True)
    trans = seq.transition_local(S, 3)
    full = np.asarray(seq.viterbi(prob, trans))
    pruned = np.asarray(seq.viterbi(prob, trans, transition_min_prob=1e-12))
    assert np.array_equal(full, pruned)


def test_viterbi_validation(rng):
    prob = rng.rand(3, 10)
    prob /= prob.sum(axis=0, keepdims=True)
    with pytest.raises(ParameterError):
        seq.viterbi(prob, np.eye(4))
    bad_trans = np.ones((3, 3))  # rows don't sum to 1
    with pytest.raises(ParameterError):
        seq.viterbi(prob, bad_trans)
    with pytest.raises(ParameterError):
        seq.viterbi(prob * 10, seq.transition_uniform(3))


def test_viterbi_discriminative(rng):
    S, T = 4, 30
    prob = rng.rand(S, T)
    prob /= prob.sum(axis=0, keepdims=True)
    trans = seq.transition_loop(S, 0.7)
    states = np.asarray(seq.viterbi_discriminative(prob, trans))
    assert states.shape == (T,)
    assert states.max() < S


def test_viterbi_binary(rng):
    T = 20
    prob = rng.rand(2, T)
    trans = seq.transition_loop(2, 0.7)
    states = np.asarray(seq.viterbi_binary(prob, trans))
    assert states.shape == (2, T)
    assert set(np.unique(states)) <= {0, 1}


def test_transition_constructors():
    tu = seq.transition_uniform(4)
    assert np.allclose(tu, 0.25)
    tl = seq.transition_loop(3, 0.5)
    assert np.allclose(np.diag(tl), 0.5)
    assert np.allclose(tl.sum(axis=1), 1)
    tc = seq.transition_cycle(4, 0.8)
    assert np.allclose(np.diag(tc), 0.8)
    assert np.allclose(tc[0, 1], 0.2)
    assert np.allclose(tc.sum(axis=1), 1)
    tloc = seq.transition_local(8, 3)
    assert np.allclose(tloc.sum(axis=1), 1)
    # locality: transitions beyond width are zero
    assert tloc[0, 4] == 0


def _dtw_numpy_ref(C):
    """Textbook DTW with default steps for cross-check."""
    N, M = C.shape
    D = np.full((N + 1, M + 1), np.inf)
    D[0, 0] = 0
    for i in range(1, N + 1):
        for j in range(1, M + 1):
            D[i, j] = C[i - 1, j - 1] + min(
                D[i - 1, j - 1], D[i, j - 1], D[i - 1, j]
            )
    return D[1:, 1:]


def test_dtw_matches_textbook(rng):
    C = np.abs(rng.randn(20, 25))
    D, wp = seq.dtw(C=C)
    ref = _dtw_numpy_ref(C)
    assert np.allclose(D, ref, rtol=1e-10)
    assert tuple(wp[-1]) == (0, 0)
    assert tuple(wp[0]) == (19, 24)
    # path is monotone
    dif = np.diff(wp[::-1], axis=0)
    assert np.all(dif >= 0) and np.all(dif <= 1)


def test_dtw_from_features(rng):
    X = rng.randn(3, 30)
    Y = np.concatenate([X[:, :10], X[:, 9:]], axis=1)  # slight stretch
    D, wp = seq.dtw(X, Y)
    assert D.shape == (30, 31)
    assert tuple(wp[-1]) == (0, 0)


def test_dtw_identical_sequences(rng):
    X = rng.randn(4, 20)
    D, wp = seq.dtw(X, X)
    # optimal path is the main diagonal with ~zero cost
    assert np.allclose(D[-1, -1], 0, atol=1e-8)
    assert np.all(wp[:, 0] == wp[:, 1])


def test_dtw_subseq(rng):
    Y = rng.randn(2, 50)
    X = Y[:, 15:30]
    D, wp = seq.dtw(X, Y, subseq=True)
    # match region should start near 15
    assert abs(int(wp[-1][1]) - 15) <= 1


def test_dtw_band(rng):
    C = np.abs(rng.randn(30, 30))
    D_full = seq.dtw(C=C, backtrack=False)
    D_band = seq.dtw(C=C, backtrack=False, global_constraints=True, band_rad=0.5)
    # banded cost >= unconstrained cost
    assert D_band[-1, -1] >= D_full[-1, -1] - 1e-10


def test_rqa_diagonal():
    sim = np.eye(8)
    score, path = seq.rqa(sim, knight_moves=False)
    assert score.max() == 8
    assert len(path) == 8
    assert np.all(path[:, 0] == path[:, 1])


def test_rqa_knight():
    sim = np.zeros((6, 6))
    for k in range(5):
        sim[k, k] = 1
    sim[5, 5] = 0
    score, path = seq.rqa(sim)
    assert score.max() >= 5 - 1e-8


def test_path_to_steps():
    path = np.array([[0, 0], [1, 1], [2, 2], [3, 4]])
    steps = seq.path_to_steps(path)
    assert len(steps) == 5
    assert steps[0] == 0 and steps[-1] == 3


def test_pyin_tone():
    y = lt.tone(440, duration=0.5).astype(np.float32)
    f0, voiced, vprob = lt.pyin(y, fmin=110, fmax=880)
    f0 = np.asarray(f0)
    voiced = np.asarray(voiced)
    # majority of frames voiced at ~440
    assert voiced.mean() > 0.5
    vf = f0[voiced]
    assert np.allclose(np.median(vf), 440, rtol=0.03)


def test_pyin_silence():
    y = np.zeros(8192, dtype=np.float32)
    f0, voiced, vprob = lt.pyin(y, fmin=110, fmax=880)
    # silence carries almost no voicing evidence (only the no-trough prior)
    assert np.median(np.asarray(vprob)) < 0.05


def test_viterbi_transition_pruning(rng):
    # with a low threshold, pruning must not change the decoded path
    n_states, T = 8, 60
    prob = rng.dirichlet(np.ones(n_states), size=T).T
    trans = rng.dirichlet(np.ones(n_states) * 5, size=n_states)
    dense = np.asarray(lt.sequence.viterbi(prob, trans))
    pruned = np.asarray(
        lt.sequence.viterbi(prob, trans, transition_min_prob=1e-8)
    )
    assert np.array_equal(dense, pruned)
    # an impossible threshold raises
    with pytest.raises(lt.ParameterError):
        lt.sequence.viterbi(prob, trans, transition_min_prob=0.99)
