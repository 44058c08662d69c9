"""Docstring examples are executable goldens (reference:
scripts/audit_docstring_examples.py).  Every upgraded numpydoc example
must keep passing as a doctest."""

import doctest

import numpy as np
import pytest

import librosa_tpu as lt


def _top_functions():
    return [
        lt.stft, lt.istft, lt.phase_vocoder, lt.power_to_db, lt.pcen,
        lt.griffinlim, lt.cqt, lt.vqt, lt.icqt, lt.yin,
        lt.feature.chroma_stft, lt.feature.spectral_centroid,
        lt.feature.rms, lt.onset.onset_detect, lt.effects.time_stretch,
        lt.effects.pitch_shift, lt.sequence.dtw, lt.sequence.viterbi,
        lt.load, lt.beat.beat_track, lt.decompose.hpss, lt.feature.tempo,
        lt.feature.melspectrogram, lt.feature.mfcc,
    ]


@pytest.mark.parametrize("fn", _top_functions(), ids=lambda f: f.__name__)
def test_docstring_example(fn):
    assert fn.__doc__ and "Examples" in fn.__doc__, fn.__name__
    parser = doctest.DocTestParser()
    runner = doctest.DocTestRunner(
        optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE
    )
    test = parser.get_doctest(
        fn.__doc__, {"np": np, "lt": lt}, fn.__name__, None, 0
    )
    runner.run(test)
    assert runner.failures == 0, fn.__name__


@pytest.mark.parametrize("fn", _top_functions(), ids=lambda f: f.__name__)
def test_docstring_numpydoc_sections(fn):
    doc = fn.__doc__
    assert "Parameters" in doc and "Returns" in doc, fn.__name__
