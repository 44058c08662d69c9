"""Smoke + behavior tests for the public names no other suite references.

The reference exercises these in tests/test_core.py:31-103 and
tests/test_util.py; this file closes the remaining coverage gap so that
every public API name is referenced by at least one test.
"""

import os
import wave

import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu import util

SR = 22050


@pytest.fixture()
def wav_file(tmp_path):
    path = tmp_path / "tone.wav"
    t = np.arange(SR) / SR
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())
    return str(path)


def test_get_samplerate(wav_file):
    assert lt.get_samplerate(wav_file) == SR


def test_find_files(tmp_path, wav_file):
    sub = tmp_path / "nested"
    sub.mkdir()
    (sub / "b.ogg").write_bytes(b"")
    found = lt.util.find_files(str(tmp_path))
    assert wav_file in found and str(sub / "b.ogg") in found
    # non-recursive, extension filter, limit/offset
    flat = lt.util.find_files(str(tmp_path), recurse=False)
    assert str(sub / "b.ogg") not in flat
    only_wav = lt.util.find_files(str(tmp_path), ext=["wav"])
    assert only_wav == [wav_file]
    assert lt.util.find_files(str(tmp_path), limit=1, offset=1) != \
        lt.util.find_files(str(tmp_path), limit=1)


def test_example_registry(tmp_path, monkeypatch, wav_file, capsys):
    monkeypatch.setenv("LIBROSA_DATA_DIR", str(tmp_path))
    dst = tmp_path / "trumpet.wav"
    dst.write_bytes(open(wav_file, "rb").read())
    path = lt.ex("trumpet")
    assert path == str(dst)
    y, sr = lt.loadx("trumpet", sr=None)
    assert sr == SR and np.asarray(y).shape[-1] == SR
    lt.util.list_examples()
    lt.util.example_info("trumpet")
    out = capsys.readouterr().out
    assert "trumpet" in out
    with pytest.raises(lt.ParameterError):
        lt.ex("not-a-track")
    with pytest.raises(lt.ParameterError):
        lt.ex("brahms")  # registered but not present locally


def test_cite_and_versions(capsys):
    c = lt.cite()
    assert "doi" in c.lower() or "10." in c
    with pytest.raises(lt.ParameterError):
        lt.cite(version="0.0.0-nonexistent")
    lt.show_versions()
    assert "librosa_tpu" in capsys.readouterr().out


def test_axis_sort():
    rng = np.random.RandomState(0)
    S = np.abs(rng.randn(16, 32)).astype(np.float32)
    sorted_s = np.asarray(util.axis_sort(S))
    assert sorted_s.shape == S.shape
    # default axis=-1 reorders COLUMNS by their peak row position
    peaks = np.argmax(sorted_s, axis=0)
    assert np.all(np.diff(peaks) >= 0)
    out, idx = util.axis_sort(S, index=True)
    np.testing.assert_array_equal(np.asarray(out), S[:, np.asarray(idx)])
    # axis=0 reorders rows by their peak column position
    rows = np.asarray(util.axis_sort(S, axis=0))
    assert np.all(np.diff(np.argmax(rows, axis=1)) >= 0)
    with pytest.raises(lt.ParameterError):
        util.axis_sort(S[None])  # non-2D input


def test_valid_audio():
    assert util.valid_audio(np.zeros(100, dtype=np.float32))
    with pytest.raises(lt.ParameterError):
        util.valid_audio(np.zeros((2, 100), dtype=np.float32), mono=True)
    with pytest.raises(lt.ParameterError):
        util.valid_audio(np.array([0.0, np.inf], dtype=np.float32))
    with pytest.raises(lt.ParameterError):
        util.valid_audio("not audio")


def test_valid_int_and_positive():
    assert util.valid_int(3.7) == 3
    assert util.valid_int(3.7, cast=np.ceil) == 4
    with pytest.raises(lt.ParameterError):
        util.valid_int(3.5, cast="not callable")
    assert util.is_positive_int(7)
    assert not util.is_positive_int(0)
    assert not util.is_positive_int(2.5)


def test_valid_intervals():
    good = np.array([[0.0, 1.0], [1.0, 2.0]])
    assert util.valid_intervals(good)
    with pytest.raises(lt.ParameterError):
        util.valid_intervals(np.array([1.0, 2.0]))  # not 2-D
    with pytest.raises(lt.ParameterError):
        util.valid_intervals(np.array([[2.0, 1.0]]))  # end < start


def test_buf_to_float():
    pcm = np.array([0, 16384, -16384, 32767], dtype="<i2")
    f = util.buf_to_float(pcm.tobytes(), n_bytes=2)
    assert f.dtype == np.float32
    np.testing.assert_allclose(f[:3], [0.0, 0.5, -0.5], atol=1e-4)


def test_fill_off_diagonal():
    x = np.ones((6, 6))
    util.fill_off_diagonal(x, radius=0.25, value=0.0)
    assert x[0, 0] == 1.0 and x[0, 5] == 0.0
    # band survives, corners cleared, and the operation is in-place
    assert x.sum() < 36


def test_samples_time_roundtrip():
    s = np.array([0, 11025, 22050])
    t = lt.samples_to_time(s, sr=SR)
    np.testing.assert_allclose(t, [0.0, 0.5, 1.0])
    np.testing.assert_array_equal(lt.time_to_samples(t, sr=SR), s)


def test_svara_converters():
    # C:1 midi=60 as Sa=60 → 'S'; a fifth above → Pa family
    s = lt.midi_to_svara_c(60, Sa=60, mela=29, octave=False)
    assert "S" in str(s)
    s2 = lt.note_to_svara_c("G4", Sa="C4", mela=29, octave=False)
    assert "P" in str(s2)


def test_mel_and_mfcc_to_audio(tone_440):
    y = np.asarray(tone_440)[: SR // 2]
    M = np.asarray(lt.feature.melspectrogram(y=y, sr=SR))
    back = np.asarray(lt.feature.inverse.mel_to_audio(
        M, sr=SR, n_iter=4, length=len(y)))
    assert back.shape == y.shape and np.isfinite(back).all()
    mf = np.asarray(lt.feature.mfcc(y=y, sr=SR))
    back2 = np.asarray(lt.feature.inverse.mfcc_to_audio(
        mf, sr=SR, n_iter=4, length=len(y)))
    assert back2.shape == y.shape and np.isfinite(back2).all()


def test_deprecation_helpers():
    from librosa_tpu.util.deprecation import Deprecated, rename_kw

    sentinel = Deprecated()
    # value resolution: keep new unless the old kwarg was supplied
    with pytest.warns(FutureWarning):
        v = rename_kw(
            old_name="old", old_value=5, new_name="new",
            new_value=sentinel, version_deprecated="1.0",
            version_removed="2.0",
        )
    assert v == 5
    v2 = rename_kw(
        old_name="old", old_value=sentinel, new_name="new", new_value=7,
        version_deprecated="1.0", version_removed="2.0",
    )
    assert v2 == 7


def test_errors_and_constants():
    assert issubclass(lt.ParameterError, lt.LibrosaError)
    from librosa_tpu.util.utils import MAX_MEM_BLOCK

    assert MAX_MEM_BLOCK > 0
