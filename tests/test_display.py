"""Smoke tests for the display module (Agg backend, artist-level checks)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

import librosa_tpu as lt
from librosa_tpu import display


@pytest.fixture(autouse=True)
def close_figs():
    yield
    plt.close("all")


def test_specshow_db(tone_440):
    S = np.asarray(lt.power_to_db(lt.feature.melspectrogram(y=tone_440)))
    fig, ax = plt.subplots()
    img = display.specshow(S, x_axis="time", y_axis="mel", ax=ax)
    assert img is not None
    assert ax.get_xlabel() == "Time"
    fig.canvas.draw()


def test_specshow_cqt_note(tone_440):
    C = np.abs(np.asarray(lt.cqt(tone_440, n_bins=48, res_type="polyphase")))
    fig, ax = plt.subplots()
    display.specshow(
        lt.power_to_db(C**2), x_axis="s", y_axis="cqt_note", ax=ax
    )
    assert ax.get_yscale() == "symlog"
    fig.canvas.draw()


def test_specshow_chroma(tone_440):
    ch = np.asarray(lt.feature.chroma_stft(y=tone_440, tuning=0.0))
    fig, ax = plt.subplots()
    display.specshow(ch, y_axis="chroma", x_axis="frames", ax=ax)
    fig.canvas.draw()
    labels = [t.get_text() for t in ax.get_yticklabels()]
    assert "C" in labels and "A" in labels


def test_specshow_tonnetz(tone_440):
    ch = np.asarray(lt.feature.chroma_stft(y=tone_440, tuning=0.0))
    tn = np.asarray(lt.feature.tonnetz(chroma=ch))
    fig, ax = plt.subplots()
    display.specshow(tn, y_axis="tonnetz", ax=ax)
    fig.canvas.draw()


def test_waveshow(tone_440):
    fig, ax = plt.subplots()
    awp = display.waveshow(tone_440, sr=22050, ax=ax)
    assert isinstance(awp, display.AdaptiveWaveplot)
    fig.canvas.draw()
    # long signal → envelope visible, steps hidden
    assert awp.envelope.get_visible()


def test_waveshow_short():
    y = lt.tone(440, duration=0.1).astype(np.float32)
    fig, ax = plt.subplots()
    awp = display.waveshow(y, sr=22050, ax=ax)
    fig.canvas.draw()
    assert awp.steps.get_visible()


def test_wavebars(tone_440):
    fig, ax = plt.subplots()
    bars = display.wavebars(tone_440, ax=ax)
    assert len(bars) > 0


def test_colorbars(tone_440):
    S = np.asarray(lt.power_to_db(lt.feature.melspectrogram(y=tone_440)))
    fig, ax = plt.subplots()
    img = display.specshow(S, ax=ax)
    cb = display.colorbar_db(img, ax=ax)
    assert cb is not None

    phase = np.angle(np.asarray(lt.stft(tone_440)))[:64, :64]
    fig2, ax2 = plt.subplots()
    img2 = display.specshow(phase, ax=ax2, cmap="twilight")
    cb2 = display.colorbar_phase(img2, ax=ax2)
    assert cb2 is not None


def test_multiplot(tone_440):
    S = np.asarray(lt.power_to_db(lt.feature.melspectrogram(y=tone_440)))
    fig, axes, arts = display.multiplot([S, S, S], n_cols=2)
    assert len(arts) == 3


def test_highlight():
    fig, ax = plt.subplots()
    spans = display.highlight([[0.5, 1.0], [2.0, 2.5]], ax=ax)
    assert len(spans) == 2


def test_time_formatter():
    f = display.TimeFormatter()

    class FakeAxis:
        def get_data_interval(self):
            return (0, 10)

        def get_view_interval(self):
            return (0, 10)

    f.axis = FakeAxis()
    assert f(1.5) == "1.50"


def test_chroma_formatter():
    f = display.ChromaFormatter()
    assert f(0) == "C"
    assert f(9) == "A"


def test_cmap_inference(rng):
    seq = display.cmap(np.abs(rng.randn(100)))
    div = display.cmap(rng.randn(1000))
    b = display.cmap(np.array([True, False]))
    assert seq.name == "magma"
    assert div.name == "coolwarm"
    assert b.name == "gray_r"


def test_infer_cmap_div_thresh(rng):
    data = np.abs(rng.randn(500)) + 1.0
    assert display.infer_cmap(data).name == "magma"
    # raising the threshold into the data range flips to diverging
    assert display.infer_cmap(data, div_thresh=float(np.median(data))).name == "coolwarm"


def test_chroma_fjs_formatter():
    f = display.ChromaFJSFormatter(intervals="ji5", bins_per_octave=12)
    assert f(0) == "C"
    assert f(12) == f(0)
    with pytest.raises(lt.ParameterError):
        display.ChromaFJSFormatter(intervals="ji5", bins_per_octave=None)


def test_transformf0_roundtrip():
    f0 = np.array([110.0, 220.0, np.nan, 110.0])
    t = display.Transformf0(f0)
    vals = np.array([[0.0, 0.0], [0.023, 12.0]])
    fwd = t.transform_non_affine(vals)
    assert np.allclose(fwd[:, 1], [110.0, 220.0])
    back = t.inverted().transform_non_affine(fwd)
    assert np.allclose(back, vals)
    with pytest.raises(lt.ParameterError):
        display.Transformf0(np.array([np.nan, np.nan]))
