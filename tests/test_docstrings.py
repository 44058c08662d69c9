"""Docstring examples are executable goldens (reference:
scripts/audit_docstring_examples.py).  Every ``Examples`` block in a
public docstring must keep passing as a doctest — examples are discovered
automatically, so upgrading a docstring enrolls it here with no edit."""

import doctest
import inspect

import numpy as np
import pytest

import librosa_tpu as lt


def _modules():
    return {
        "": lt,
        "feature": lt.feature,
        "feature.inverse": lt.feature.inverse,
        "effects": lt.effects,
        "segment": lt.segment,
        "sequence": lt.sequence,
        "onset": lt.onset,
        "beat": lt.beat,
        "decompose": lt.decompose,
        "util": lt.util,
        "filters": lt.filters,
        "display": lt.display,
    }


def _documented_callables():
    """Every public callable whose docstring carries a doctest example."""
    seen = {}
    for mname, mod in _modules().items():
        names = getattr(mod, "__all__", None) or [
            x for x in dir(mod) if not x.startswith("_")
        ]
        for n in sorted(set(names)):
            obj = getattr(mod, n, None)
            if not (callable(obj) or inspect.isclass(obj)):
                continue
            doc = inspect.getdoc(obj) or ""
            if ">>>" in doc:
                seen.setdefault(id(obj), (f"{mname}.{n}".lstrip("."), obj))
    return sorted(seen.values())


_WITH_EXAMPLES = _documented_callables()

# Functions whose examples need I/O, a display backend, or too much
# runtime for the unit suite; their examples are skipped, not run.
_SKIP_EXEC = {
    "load", "loadx", "stream", "ex", "example", "util.ex", "util.example",
    "get_samplerate", "get_duration",
}


@pytest.mark.parametrize(
    "name,fn", _WITH_EXAMPLES, ids=[n for n, _ in _WITH_EXAMPLES]
)
def test_docstring_example(name, fn):
    if name in _SKIP_EXEC or name.split(".")[-1] in _SKIP_EXEC:
        pytest.skip("example requires I/O or a display backend")
    parser = doctest.DocTestParser()
    runner = doctest.DocTestRunner(
        optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE
    )
    doc = inspect.getdoc(fn)
    test = parser.get_doctest(
        doc, {"np": np, "lt": lt, "librosa_tpu": lt}, name, None, 0
    )
    runner.run(test)
    assert runner.failures == 0, name


def test_example_coverage_floor():
    # the documented-example surface must only grow (VERDICT r2 item 6)
    assert len(_WITH_EXAMPLES) >= 60, len(_WITH_EXAMPLES)


def _core_functions():
    return [
        lt.stft, lt.istft, lt.phase_vocoder, lt.power_to_db, lt.pcen,
        lt.griffinlim, lt.cqt, lt.vqt, lt.icqt, lt.yin,
        lt.feature.chroma_stft, lt.feature.spectral_centroid,
        lt.feature.rms, lt.onset.onset_detect, lt.effects.time_stretch,
        lt.effects.pitch_shift, lt.sequence.dtw, lt.sequence.viterbi,
        lt.load, lt.beat.beat_track, lt.decompose.hpss, lt.feature.tempo,
        lt.feature.melspectrogram, lt.feature.mfcc,
    ]


@pytest.mark.parametrize("fn", _core_functions(), ids=lambda f: f.__name__)
def test_docstring_numpydoc_sections(fn):
    doc = fn.__doc__
    assert "Parameters" in doc and "Returns" in doc, fn.__name__
