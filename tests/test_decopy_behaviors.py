"""Behavior pins for paths touched by the round-5 de-copy rewrites.

These cover semantics that the golden suites did not previously reach:
reference-parity behaviors that were added or made exact during the
rewrites (each cites the reference location it matches).
"""

import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu.util.exceptions import ParameterError
from librosa_tpu.util.matching import match_events


def test_match_events_exact_only_mode():
    """left=right=False permits exact coincidences (reference
    util/matching.py: containment check + identity matching)."""
    src = np.array([2, 5, 9])
    dst = np.array([0, 2, 5, 9, 12])
    got = match_events(src, dst, left=False, right=False)
    assert dst[got].tolist() == [2, 5, 9]

    with pytest.raises(ParameterError):
        match_events(np.array([3]), dst, left=False, right=False)


def test_note_to_midi_empty_string_is_nan():
    """Reference core/convert.py:687: '' maps to NaN, not an error."""
    assert np.isnan(lt.note_to_midi(""))


def test_midi_to_note_array_round_trip():
    notes = lt.midi_to_note([60, 61, 62], unicode=False)
    assert isinstance(notes, np.ndarray)
    back = lt.note_to_midi(notes)
    assert back.tolist() == [60, 61, 62]


def test_fifths_to_note_multiple_accidentals():
    """Walks far enough around the circle to need double+single marks
    (doubles lead: +3 sharps spells as double-sharp then sharp)."""
    # 14 fifths up from C = C double-sharp
    assert lt.fifths_to_note(unison="C", fifths=14, unicode=False) == "C##"
    # 21 fifths: triple sharp, doubles first
    name = lt.fifths_to_note(unison="C", fifths=21, unicode=False)
    assert name == "C###" or name == "C##{}".format("#")
    # flatward from a flat unison
    assert lt.fifths_to_note(unison="Bb", fifths=-7, unicode=False) == "Bbb"


def test_transition_local_width_exceeding_states():
    with pytest.raises(ParameterError):
        lt.sequence.transition_local(5, 9)


def test_transition_matrices_are_stochastic():
    for T in (
        lt.sequence.transition_loop(4, [0.5, 0.6, 0.7, 0.8]),
        lt.sequence.transition_cycle(4, [0.5, 0.6, 0.7, 0.8]),
        lt.sequence.transition_local(7, 3, wrap=False),
        lt.sequence.transition_local(7, 3, wrap=True),
    ):
        assert np.allclose(T.sum(axis=1), 1.0)
        assert T.min() >= 0


def test_clicks_custom_waveform_and_length():
    blip = np.ones(100, dtype=np.float32)
    out = np.asarray(lt.clicks(times=[0.0, 0.002], sr=22050, click=blip,
                               length=300))
    assert out.shape == (300,)
    # overlapping placements accumulate (second click starts at sample 44)
    assert out.max() == 2.0
    with pytest.raises(ParameterError):
        lt.clicks(times=[0.0], sr=22050, length=0)
    with pytest.raises(ParameterError):
        lt.clicks(times=[0.0], sr=22050,
                  click=np.ones(4, dtype=np.int32))


def test_chirp_matches_scipy_formula():
    import scipy.signal

    for linear in (False, True):
        ours = np.asarray(lt.chirp(fmin=110, fmax=8000, sr=22050,
                                   duration=1.0, linear=linear))
        ref = scipy.signal.chirp(
            np.arange(22050) / 22050, 110, 1.0, 8000,
            method="linear" if linear else "logarithmic",
            phi=(-np.pi / 2) / np.pi * 180,
        )
        assert np.abs(ours - ref).max() < 1e-10


def test_to_stereo_paths():
    left = np.ones(4, dtype=np.float32)
    right = np.zeros(6, dtype=np.float32)
    # pad=True extends to the longer side
    st = np.asarray(lt.to_stereo(left=left, right=right, downmix=False,
                                 norm=False))
    assert st.shape == (2, 6)
    assert st[0, :4].tolist() == [1, 1, 1, 1]
    # one-sided input: the other channel is silence, no halving
    solo = np.asarray(lt.to_stereo(left=left, downmix=False, norm=True))
    assert solo.shape == (2, 4)
    assert solo[0].tolist() == [1, 1, 1, 1]
    assert solo[1].tolist() == [0, 0, 0, 0]
    with pytest.raises(ParameterError):
        lt.to_stereo()


def test_interval_frequencies_unknown_system():
    with pytest.raises(ParameterError):
        lt.interval_frequencies(n_bins=12, fmin=55, intervals="ji11")


def test_waveshow_legend_proxy(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    y = np.asarray(lt.tone(220, sr=22050, duration=0.25), np.float32)
    fig, ax = plt.subplots()
    adaptor = lt.display.waveshow(y, sr=22050, ax=ax, label="tone")
    legend = ax.legend()
    fig.canvas.draw()
    # exactly one entry, carried by the proxy (not the envelope fill)
    assert [t.get_text() for t in legend.get_texts()] == ["tone"]
    assert adaptor.label_proxy_.get_label() == "tone"
    assert adaptor.label_proxy_.axes is ax
    plt.close(fig)
