"""Shared render table for display image-regression baselines.

The reference pins 75 baseline PNGs via pytest-mpl
(``/root/reference/setup.cfg:3``, ``tests/baseline_images/test_display``).
Here each case renders a figure to an RGBA buffer at a fixed size/DPI,
downsamples 4×, and the uint8 image is committed as a fixture
(``tests/display_baselines/<name>.npz``, built by
``scripts/gen_display_baselines.py``).  A rendering change — coordinate
meshes, axis decoration, formatter output — shifts pixels and fails the
comparison; small antialiasing jitter is tolerated.
"""

from __future__ import annotations

import numpy as np

SR = 22050


def _signals():
    rng = np.random.RandomState(440)
    t = np.arange(SR * 2) / SR
    y = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.25 * np.sin(2 * np.pi * 660 * t * (1 + 0.05 * t))
        + 0.02 * rng.randn(len(t))
    ).astype(np.float32)
    return y


def render_case(name: str):
    """Render one named case; returns the downsampled uint8 RGB image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import librosa_tpu as lt

    y = _signals()
    fig, ax = plt.subplots(figsize=(5, 3), dpi=72)
    try:
        if name == "specshow_linear":
            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )
            lt.display.specshow(
                np.asarray(S), sr=SR, x_axis="time", y_axis="linear", ax=ax
            )
        elif name == "specshow_log":
            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )
            lt.display.specshow(
                np.asarray(S), sr=SR, x_axis="s", y_axis="log", ax=ax
            )
        elif name == "specshow_mel":
            M = lt.power_to_db(
                np.asarray(lt.feature.melspectrogram(y=y, sr=SR)), ref=np.max
            )
            lt.display.specshow(
                np.asarray(M), sr=SR, x_axis="time", y_axis="mel", ax=ax
            )
        elif name == "specshow_cqt_note":
            C = lt.amplitude_to_db(
                np.abs(np.asarray(lt.cqt(y, sr=SR, res_type="polyphase"))),
                ref=np.max,
            )
            lt.display.specshow(
                np.asarray(C), sr=SR, x_axis="time", y_axis="cqt_note", ax=ax
            )
        elif name == "specshow_cqt_hz":
            C = lt.amplitude_to_db(
                np.abs(np.asarray(lt.cqt(y, sr=SR, res_type="polyphase"))),
                ref=np.max,
            )
            lt.display.specshow(
                np.asarray(C), sr=SR, x_axis="time", y_axis="cqt_hz", ax=ax
            )
        elif name == "specshow_chroma":
            ch = np.asarray(lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0))
            lt.display.specshow(ch, sr=SR, x_axis="time", y_axis="chroma", ax=ax)
        elif name == "specshow_tempo":
            tg = np.asarray(lt.feature.tempogram(y=y, sr=SR))
            lt.display.specshow(tg, sr=SR, x_axis="time", y_axis="tempo", ax=ax)
        elif name == "specshow_fourier_tempo":
            ftg = np.abs(np.asarray(lt.feature.fourier_tempogram(y=y, sr=SR)))
            lt.display.specshow(
                ftg, sr=SR, x_axis="time", y_axis="fourier_tempo", ax=ax
            )
        elif name == "specshow_lag":
            X = np.asarray(lt.feature.mfcc(y=y, sr=SR)).astype(float)
            R = np.asarray(
                lt.segment.recurrence_matrix(X, sparse=False), dtype=float
            )
            lag = np.asarray(lt.segment.recurrence_to_lag(R))
            lt.display.specshow(lag, sr=SR, x_axis="time", y_axis="lag", ax=ax)
        elif name == "specshow_tonnetz":
            tn = np.asarray(lt.feature.tonnetz(
                y=y, sr=SR,
                chroma=np.abs(np.asarray(
                    lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0)))))
            lt.display.specshow(tn, y_axis="tonnetz", x_axis="time", ax=ax)
        elif name == "specshow_vscale_dbfs":
            S = np.abs(np.asarray(lt.stft(y)))
            lt.display.specshow(
                S, sr=SR, x_axis="time", y_axis="linear", vscale="dBFS", ax=ax
            )
        elif name == "waveshow_envelope":
            lt.display.waveshow(y, sr=SR, ax=ax)
        elif name == "waveshow_samples":
            lt.display.waveshow(y[:400], sr=SR, ax=ax)
        elif name == "wavebars":
            lt.display.wavebars(y, sr=SR, ax=ax)
        elif name == "wavef0":
            f0 = np.asarray(
                lt.yin(y, fmin=100, fmax=800, sr=SR), dtype=float
            )
            lt.display.wavef0(y, f0=f0, sr=SR, ax=ax)
        elif name == "colorbar_db":
            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )
            img = lt.display.specshow(
                np.asarray(S), sr=SR, x_axis="time", y_axis="log", ax=ax
            )
            lt.display.colorbar_db(img, ax=ax)
        elif name == "specshow_svara":
            ch = np.asarray(lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0))
            lt.display.specshow(
                ch, sr=SR, x_axis="time", y_axis="chroma_h", Sa=0, ax=ax
            )
        elif name == "highlight":
            env = np.asarray(lt.onset.onset_strength(y=y, sr=SR))
            times = np.asarray(lt.times_like(env, sr=SR))
            lines = ax.plot(times, env)
            lt.display.highlight(artist=lines[0], ax=ax)
        elif name == "specshow_ms_time":
            M = lt.power_to_db(
                np.asarray(lt.feature.melspectrogram(y=y[:SR//4], sr=SR)),
                ref=np.max,
            )
            lt.display.specshow(
                np.asarray(M), sr=SR, x_axis="ms", y_axis="mel", ax=ax
            )
        elif name == "specshow_frames":
            M = lt.power_to_db(
                np.asarray(lt.feature.melspectrogram(y=y, sr=SR)), ref=np.max
            )
            lt.display.specshow(
                np.asarray(M), sr=SR, x_axis="frames", y_axis="frames", ax=ax
            )
        else:
            raise KeyError(name)

        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        return buf[::4, ::4].copy()
    finally:
        plt.close(fig)


CASES = [
    "specshow_linear",
    "specshow_log",
    "specshow_mel",
    "specshow_cqt_note",
    "specshow_cqt_hz",
    "specshow_chroma",
    "specshow_tempo",
    "specshow_fourier_tempo",
    "specshow_lag",
    "specshow_tonnetz",
    "specshow_vscale_dbfs",
    "specshow_svara",
    "specshow_ms_time",
    "specshow_frames",
    "waveshow_envelope",
    "waveshow_samples",
    "wavebars",
    "wavef0",
    "colorbar_db",
    "highlight",
]
