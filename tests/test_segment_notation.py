"""Tests for segment (recurrence/clustering) and notation modules."""

import numpy as np
import pytest
import scipy.sparse

import librosa_tpu as lt
from librosa_tpu import segment
from librosa_tpu.core import notation


@pytest.fixture(scope="module")
def features(rng):
    # repeating structure: A A B B A A
    block_a = rng.randn(6, 10)
    block_b = rng.randn(6, 10) + 3
    return np.concatenate(
        [block_a, block_a, block_b, block_b, block_a, block_a], axis=1
    ).astype(np.float32)


def test_recurrence_matrix_connectivity(features):
    R = segment.recurrence_matrix(features)
    n = features.shape[1]
    assert R.shape == (n, n)
    assert R.dtype == bool
    # no self-loops by default
    assert not R.diagonal().any()


def test_recurrence_matrix_sym(features):
    R = segment.recurrence_matrix(features, sym=True)
    assert np.array_equal(R, R.T)


def test_recurrence_matrix_affinity(features):
    R = segment.recurrence_matrix(features, mode="affinity")
    assert R.dtype != bool
    assert R.min() >= 0 and R.max() <= 1


def test_recurrence_matrix_sparse(features):
    R = segment.recurrence_matrix(features, sparse=True)
    assert scipy.sparse.issparse(R)


def test_recurrence_structure(features):
    # frames in repeated A-blocks should link to each other
    R = segment.recurrence_matrix(features, k=10, sym=True)
    # block structure: columns 0-19 (A A) similar to 40-59 (A A)
    cross = R[0:20, 40:60]
    assert cross.sum() > 0


def test_cross_similarity(features):
    X = segment.cross_similarity(features, features)
    n = features.shape[1]
    assert X.shape == (n, n)


def test_lag_roundtrip(features):
    R = segment.recurrence_matrix(features, sym=True).astype(float)
    L = segment.recurrence_to_lag(R, pad=True)
    assert L.shape == (2 * R.shape[0], R.shape[1])
    R2 = segment.lag_to_recurrence(L)
    assert np.allclose(R2, R)


def test_lag_roundtrip_sparse(features):
    R = scipy.sparse.csr_matrix(
        segment.recurrence_matrix(features, sym=True).astype(float)
    )
    L = segment.recurrence_to_lag(R, pad=True)
    R2 = segment.lag_to_recurrence(L)
    assert np.allclose(R2.toarray(), R.toarray())


def test_agglomerative(features):
    bounds = segment.agglomerative(features, 3)
    assert bounds[0] == 0
    assert len(bounds) == 3
    assert np.all(np.diff(bounds) > 0)


def test_subsegment(features):
    frames = np.array([0, 20, 40, 60])
    sub = segment.subsegment(features, frames, n_segments=2)
    assert len(sub) >= 3
    assert np.all(np.diff(sub) >= 0)


def test_path_enhance(features):
    R = segment.recurrence_matrix(features, mode="affinity", sym=True)
    Rs = np.asarray(segment.path_enhance(R, 7))
    assert Rs.shape == R.shape
    assert Rs.min() >= 0


def test_timelag_filter(features):
    R = segment.recurrence_matrix(features, sym=True).astype(float)

    def identity(x):
        return x

    out = segment.timelag_filter(identity)(R)
    assert np.allclose(out, R)


# ---------------------------------------------------------------------------
# Notation
# ---------------------------------------------------------------------------


def test_key_to_notes_basic():
    assert notation.key_to_notes("C:maj") == [
        "C", "C♯", "D", "D♯", "E", "F", "F♯", "G", "G♯", "A", "A♯", "B"
    ]
    # flat key uses flats
    notes = notation.key_to_notes("Ab:maj", unicode=False)
    assert "Db" in notes and "Eb" in notes


def test_key_to_notes_modes():
    # D dorian has the same notes as C major
    assert notation.key_to_notes("D:dor") == notation.key_to_notes("C:maj")


def test_key_to_degrees():
    assert np.array_equal(
        notation.key_to_degrees("C:maj"), [0, 2, 4, 5, 7, 9, 11]
    )
    assert np.array_equal(
        notation.key_to_degrees("A:min"), [9, 11, 0, 2, 4, 5, 7]
    )


def test_key_bad_format():
    with pytest.raises(lt.ParameterError):
        notation.key_to_notes("H:maj")
    with pytest.raises(lt.ParameterError):
        notation.key_to_degrees("C-major")


def test_mela():
    # mela 29 (shankarabharanam) is the major scale
    assert np.array_equal(
        notation.mela_to_degrees(29), [0, 2, 4, 5, 7, 9, 11]
    )
    assert np.array_equal(
        notation.mela_to_degrees("dheerasankarabharanam"),
        [0, 2, 4, 5, 7, 9, 11],
    )
    assert notation.list_mela()["kanakangi"] == 1
    assert len(notation.list_mela()) == 72
    sv = notation.mela_to_svara(29)
    assert sv[0] == "S" and sv[7] == "P"


def test_thaat():
    assert np.array_equal(
        notation.thaat_to_degrees("bilaval"), [0, 2, 4, 5, 7, 9, 11]
    )
    assert "bhairav" in notation.list_thaat()


def test_fifths_to_note():
    assert notation.fifths_to_note(unison="C", fifths=1) == "G"
    assert notation.fifths_to_note(unison="C", fifths=6) == "F♯"
    assert notation.fifths_to_note(unison="C", fifths=-1) == "F"
    assert notation.fifths_to_note(unison="G", fifths=-2, unicode=False) == "F"


def test_interval_to_fjs():
    # perfect fifth 3/2 is pythagorean: plain G above C
    assert notation.interval_to_fjs(1.5, unison="C") == "G"
    # just major third 5/4 gets an otonal 5
    out = notation.interval_to_fjs(5 / 4, unison="C", unicode=False)
    assert out == "E^5"


def test_hz_to_fjs_docstring():
    assert lt.hz_to_fjs(66, fmin=55, unicode=True) == "C₅"
    freqs = lt.interval_frequencies(6, intervals="ji5", fmin=55)
    out = lt.hz_to_fjs(freqs, unicode=True)
    assert list(out) == ["A", "B♭₅", "B", "C₅", "C♯⁵", "D"]


def test_svara():
    assert lt.hz_to_svara_h(220, Sa=220) == "S"
    assert lt.hz_to_svara_h(247.5, Sa=220, abbr=False).startswith("Re")
    assert lt.note_to_svara_h("C5", Sa="C5") == "S"
    assert lt.hz_to_svara_c(261.63, Sa=261.63, mela=29) == "S"
    out = lt.midi_to_svara_h(np.array([60.0, 62.0]), Sa=60)
    assert list(out) == ["S", "R"]


def test_nn_filter(features):
    from librosa_tpu import decompose

    out = decompose.nn_filter(features)
    assert out.shape == features.shape


# --- device kNN path: equivalence with the host sklearn fallback ------------
#
# Tie-free random features: the structured `features` fixture contains exact
# duplicate frames, and when distances tie the k-th-neighbor cutoff is
# implementation-defined in sklearn too — both graphs are valid but differ.


@pytest.fixture(scope="module")
def knn_features(rng):
    return rng.randn(6, 60).astype(np.float32)


@pytest.mark.parametrize("metric", ["euclidean", "cosine", "sqeuclidean"])
@pytest.mark.parametrize("mode", ["connectivity", "distance", "affinity"])
@pytest.mark.parametrize("k,width", [(None, 1), (5, 1), (5, 3), (1, 3)])
def test_recurrence_device_matches_sklearn(knn_features, metric, mode, k, width):
    """ops.knn distance-matmul path must reproduce the sklearn graph exactly
    (same neighbor sets, same weights) across the pruning parameter space."""
    from librosa_tpu.ops import knn as knn_ops

    features = knn_features
    kw = dict(metric=metric, mode=mode, k=k, width=width)
    R_dev = np.asarray(segment.recurrence_matrix(features, **kw), dtype=float)
    saved = knn_ops.DEVICE_METRICS
    knn_ops.DEVICE_METRICS = frozenset()
    try:
        R_host = np.asarray(segment.recurrence_matrix(features, **kw), dtype=float)
    finally:
        knn_ops.DEVICE_METRICS = saved
    np.testing.assert_allclose(R_dev, R_host, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
@pytest.mark.parametrize("mode", ["connectivity", "distance", "affinity"])
@pytest.mark.parametrize("k", [None, 5])
def test_cross_similarity_device_matches_sklearn(knn_features, rng, metric, mode, k):
    from librosa_tpu.ops import knn as knn_ops

    features = knn_features
    other = rng.randn(6, 45).astype(np.float32)
    kw = dict(metric=metric, mode=mode, k=k)
    C_dev = np.asarray(segment.cross_similarity(features, other, **kw), dtype=float)
    saved = knn_ops.DEVICE_METRICS
    knn_ops.DEVICE_METRICS = frozenset()
    try:
        C_host = np.asarray(segment.cross_similarity(features, other, **kw), dtype=float)
    finally:
        knn_ops.DEVICE_METRICS = saved
    np.testing.assert_allclose(C_dev, C_host, rtol=1e-4, atol=1e-5)
