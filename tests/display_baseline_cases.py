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
        elif name == "specshow_cqt_svara":
            C = lt.amplitude_to_db(
                np.abs(np.asarray(lt.cqt(y, sr=SR, res_type="polyphase"))),
                ref=np.max,
            )
            lt.display.specshow(
                np.asarray(C), sr=SR, x_axis="time", y_axis="cqt_svara",
                Sa=220.0, ax=ax,
            )
        elif name == "specshow_vqt_note":
            V = lt.amplitude_to_db(
                np.abs(np.asarray(
                    lt.vqt(y, sr=SR, res_type="polyphase"))),
                ref=np.max,
            )
            lt.display.specshow(
                np.asarray(V), sr=SR, x_axis="time", y_axis="vqt_note", ax=ax
            )
        elif name == "specshow_vqt_hz":
            V = lt.amplitude_to_db(
                np.abs(np.asarray(
                    lt.vqt(y, sr=SR, res_type="polyphase"))),
                ref=np.max,
            )
            lt.display.specshow(
                np.asarray(V), sr=SR, x_axis="time", y_axis="vqt_hz", ax=ax
            )
        elif name == "specshow_vqt_fjs":
            V = lt.amplitude_to_db(
                np.abs(np.asarray(lt.vqt(
                    y, sr=SR, intervals="ji5", res_type="polyphase"))),
                ref=np.max,
            )
            lt.display.specshow(
                np.asarray(V), sr=SR, x_axis="time", y_axis="vqt_fjs",
                intervals="ji5", ax=ax,
            )
        elif name == "specshow_fft_note":
            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )
            lt.display.specshow(
                np.asarray(S), sr=SR, x_axis="time", y_axis="fft_note", ax=ax
            )
        elif name == "specshow_fft_svara":
            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )
            lt.display.specshow(
                np.asarray(S), sr=SR, x_axis="time", y_axis="fft_svara",
                Sa=220.0, ax=ax,
            )
        elif name == "specshow_chroma_fjs":
            ch = np.asarray(lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0))
            lt.display.specshow(
                ch, sr=SR, x_axis="time", y_axis="chroma_fjs",
                intervals="ji5", ax=ax,
            )
        elif name == "specshow_log_oct3":
            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )
            lt.display.specshow(
                np.asarray(S), sr=SR, x_axis="time", y_axis="log_oct3", ax=ax
            )
        elif name == "specshow_mel_oct3":
            M = lt.power_to_db(
                np.asarray(lt.feature.melspectrogram(y=y, sr=SR)), ref=np.max
            )
            lt.display.specshow(
                np.asarray(M), sr=SR, x_axis="time", y_axis="mel_oct3", ax=ax
            )
        elif name == "specshow_cqt_note_zoom":
            # zoomed inside 2 octaves: adaptive minor labels become visible
            C = lt.amplitude_to_db(
                np.abs(np.asarray(lt.cqt(y, sr=SR, res_type="polyphase"))),
                ref=np.max,
            )
            lt.display.specshow(
                np.asarray(C), sr=SR, x_axis="time", y_axis="cqt_note", ax=ax
            )
            ax.set_ylim(180, 700)
        elif name == "specshow_oct3_zoom":
            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )
            lt.display.specshow(
                np.asarray(S), sr=SR, x_axis="time", y_axis="log_oct3", ax=ax
            )
            ax.set_ylim(150, 500)
        elif name == "specshow_keyed_note":
            C = lt.amplitude_to_db(
                np.abs(np.asarray(lt.cqt(y, sr=SR, res_type="polyphase"))),
                ref=np.max,
            )
            lt.display.specshow(
                np.asarray(C), sr=SR, x_axis="time", y_axis="cqt_note",
                key="Eb:maj", ax=ax,
            )
        elif name == "specshow_lag_s":
            X = np.asarray(lt.feature.mfcc(y=y, sr=SR)).astype(float)
            R = np.asarray(
                lt.segment.recurrence_matrix(X, sparse=False), dtype=float
            )
            lag = np.asarray(lt.segment.recurrence_to_lag(R))
            lt.display.specshow(lag, sr=SR, x_axis="s", y_axis="lag_s", ax=ax)
        elif name == "specshow_chroma_c":
            ch = np.asarray(lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0))
            lt.display.specshow(
                ch, sr=SR, x_axis="time", y_axis="chroma_c", Sa=0,
                mela="mayamalavagaula", ax=ax,
            )
        elif name == "specshow_x_chroma":
            ch = np.asarray(lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0))
            lt.display.specshow(ch.T, sr=SR, x_axis="chroma", y_axis="time",
                                ax=ax)
        elif name == "waveshow_stereo":
            ys = np.stack([y, -0.6 * y])
            lt.display.waveshow(ys, sr=SR, ax=ax)
        elif name == "wavebars_colored":
            lt.display.wavebars(y, sr=SR, color="#2a6f97", ax=ax)
        elif name == "wavef0_transpose":
            f0 = np.asarray(
                lt.yin(y, fmin=100, fmax=800, sr=SR), dtype=float
            )
            lt.display.wavef0(y, f0=f0, sr=SR, transpose=True, ax=ax)
        elif name == "colorbar_phase":
            D = np.asarray(lt.stft(y))
            img = lt.display.specshow(
                np.angle(D), sr=SR, x_axis="time", y_axis="linear",
                cmap="twilight_shifted", ax=ax,
            )
            lt.display.colorbar_phase(img, ax=ax)
        elif name == "multiplot_waveshow":
            ys = np.stack([y[: SR // 2], -0.5 * y[: SR // 2]])
            plt.close(fig)
            fig = plt.figure(figsize=(5, 3), dpi=72)
            lt.display.multiplot("waveshow", ys, sr=SR, fig=fig)
        elif name == "multiplot_specshow":
            M = lt.power_to_db(
                np.asarray(lt.feature.melspectrogram(
                    y=np.stack([y, 0.5 * y]), sr=SR)),
                ref=np.max,
            )
            plt.close(fig)
            fig = plt.figure(figsize=(5, 3), dpi=72)
            lt.display.multiplot(
                "specshow", np.asarray(M), sr=SR, fig=fig,
                x_axis="time", y_axis="mel",
            )
        elif name == "highlight_colored":
            M = lt.power_to_db(
                np.asarray(lt.feature.melspectrogram(y=y, sr=SR)), ref=np.max
            )
            lt.display.specshow(
                np.asarray(M), sr=SR, x_axis="time", y_axis="mel", ax=ax
            )
            env = np.asarray(lt.onset.onset_strength(y=y, sr=SR))
            times = np.asarray(lt.times_like(env, sr=SR))
            lines = ax.plot(times, 200 + 3000 * env / env.max(), color="w")
            lt.display.highlight(artist=lines[0], color="black", ax=ax)
        elif name == "legend_for_axes":
            env = np.asarray(lt.onset.onset_strength(y=y, sr=SR))
            times = np.asarray(lt.times_like(env, sr=SR))
            ax.plot(times, env, label="onset strength")
            ax.plot(times, env[::-1], label="reversed")
            lt.display.legend_for_axes(ax)
        elif name == "waveshow_zoom":
            # reference test_waveshow_mono_zoom: xlim change after draw
            # exercises the adaptive envelope/sample switching
            lt.display.waveshow(y, sr=SR, ax=ax)
            fig.canvas.draw()
            ax.set_xlim(0.5, 0.52)
        elif name == "waveshow_zoom_out":
            adp = lt.display.waveshow(y[:4000], sr=SR, ax=ax)
            fig.canvas.draw()
            ax.set_xlim(-0.2, 0.4)
        elif name == "waveshow_transpose":
            lt.display.waveshow(y, sr=SR, ax=ax, transpose=True)
        elif name == "waveshow_inverted":
            lt.display.waveshow(y, sr=SR, ax=ax)
            ax.invert_xaxis()
        elif name == "waveshow_offset":
            lt.display.waveshow(y, sr=SR, ax=ax, offset=5.0, marker=".")
        elif name == "wavebars_transpose":
            lt.display.wavebars(y, sr=SR, ax=ax, transpose=True)
        elif name == "specshow_abs_input":
            # reference test_abs_input: magnitudes without dB conversion
            S = np.abs(np.asarray(lt.stft(y)))
            lt.display.specshow(S, sr=SR, x_axis="time", y_axis="linear",
                                ax=ax)
        elif name == "specshow_boolean":
            # reference test_specshow_boolean_norm
            X = np.asarray(lt.feature.mfcc(y=y, sr=SR)).astype(float)
            R = np.asarray(
                lt.segment.recurrence_matrix(X, sparse=False), dtype=bool
            )
            lt.display.specshow(R, x_axis="frames", y_axis="frames", ax=ax)
        elif name == "specshow_diverging":
            # reference test_diverging_scales: symmetric colormap around 0
            tn = np.asarray(lt.feature.tonnetz(
                y=y, sr=SR,
                chroma=np.abs(np.asarray(
                    lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0)))))
            lt.display.specshow(tn, x_axis="time", ax=ax, cmap="coolwarm")
        elif name == "specshow_double_chroma":
            ch = np.asarray(lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0))
            ch2 = np.vstack([ch, ch])
            lt.display.specshow(ch2, sr=SR, x_axis="time", y_axis="chroma",
                                ax=ax)
        elif name == "specshow_x_mel":
            M = lt.power_to_db(
                np.asarray(lt.feature.melspectrogram(y=y, sr=SR)), ref=np.max
            )
            lt.display.specshow(np.asarray(M).T, sr=SR, x_axis="mel", ax=ax)
        elif name == "specshow_y_mel_bounded":
            M = lt.power_to_db(
                np.asarray(lt.feature.melspectrogram(
                    y=y, sr=SR, fmin=100, fmax=6000)), ref=np.max
            )
            lt.display.specshow(
                np.asarray(M), sr=SR, y_axis="mel", fmin=100, fmax=6000,
                ax=ax,
            )
        elif name == "specshow_unicode_false":
            C = lt.amplitude_to_db(
                np.abs(np.asarray(lt.cqt(y, sr=SR, res_type="polyphase"))),
                ref=np.max,
            )
            lt.display.specshow(
                np.asarray(C), sr=SR, y_axis="cqt_note", unicode=False, ax=ax
            )
        elif name == "specshow_time_unit_lag":
            # reference test_time_unit_lag: ms ticks on a lag axis
            X = np.asarray(lt.feature.mfcc(y=y, sr=SR)).astype(float)
            R = np.asarray(
                lt.segment.recurrence_matrix(X, sparse=False), dtype=float
            )
            lag = np.asarray(lt.segment.recurrence_to_lag(R))
            lt.display.specshow(lag, sr=SR, x_axis="time", y_axis="lag_ms",
                                ax=ax)
        elif name == "specshow_xy_none":
            # reference xaxis_none_yaxis_* family: one decorated axis only
            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )
            lt.display.specshow(np.asarray(S), sr=SR, y_axis="log", ax=ax)
        elif name == "sharex_specshow_ms":
            # reference test_sharex_specshow_ms: linked time axes
            import matplotlib.pyplot as _plt

            _plt.close(fig)
            fig, (ax0, ax1) = _plt.subplots(
                2, 1, sharex=True, figsize=(5, 3), dpi=72
            )
            ax = ax0
            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )
            lt.display.specshow(
                np.asarray(S), sr=SR, x_axis="ms", y_axis="log", ax=ax0
            )
            lt.display.waveshow(y, sr=SR, ax=ax1)
        elif name == "legend_for_axes_left":
            env = np.asarray(lt.onset.onset_strength(y=y, sr=SR))
            times = np.asarray(lt.times_like(env, sr=SR))
            ax.plot(times, env, label="onset strength")
            lt.display.legend_for_axes(ax, loc="center left")
        elif name == "specshow_coords":
            # reference test_coords: explicit coordinate arrays
            ch = np.asarray(lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0))
            lt.display.specshow(
                ch, x_coords=np.linspace(0, 2, ch.shape[1] + 1),
                x_axis="time", ax=ax,
            )
        elif name == "specshow_fft_odd":
            # odd n_fft exercises bin-frequency edge handling
            S = lt.amplitude_to_db(
                np.abs(np.asarray(lt.stft(y, n_fft=1023))), ref=np.max
            )
            lt.display.specshow(
                np.asarray(S), sr=SR, n_fft=1023, y_axis="fft_note", ax=ax
            )
        elif name == "wavef0_voicing":
            f0 = np.asarray(
                lt.yin(y, fmin=100, fmax=800, sr=SR), dtype=float
            )
            voiced = f0 < 500
            lt.display.wavef0(y, f0=np.where(voiced, f0, np.nan), sr=SR,
                              ax=ax)
        elif name == "specshow_complex_input":
            # reference test_complex_input: magnitude of complex data
            D = np.asarray(lt.stft(y))
            lt.display.specshow(D, sr=SR, x_axis="time", y_axis="linear",
                                ax=ax)
        elif name == "waveshow_ext_axes":
            # reference test_waveshow_ext_axes: draw on a provided axis
            import matplotlib.pyplot as _plt

            _plt.close(fig)
            fig, (axl, axr) = _plt.subplots(
                1, 2, figsize=(5, 3), dpi=72
            )
            ax = axl
            lt.display.waveshow(y[:8000], sr=SR, ax=axl, color="blue")
            lt.display.waveshow(y[:8000], sr=SR, ax=axr, color="red")
        elif name == "specshow_ext_axes":
            import matplotlib.pyplot as _plt

            _plt.close(fig)
            fig, (axl, axr) = _plt.subplots(
                1, 2, figsize=(5, 3), dpi=72
            )
            ax = axl
            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )
            lt.display.specshow(np.asarray(S), ax=axl, y_axis="log")
            lt.display.specshow(np.asarray(S), ax=axr, y_axis="linear")
        elif name == "legend_grid":
            # reference legend_for_axes_default_grid
            import matplotlib.pyplot as _plt

            _plt.close(fig)
            fig, axes = _plt.subplots(2, 2, figsize=(5, 3), dpi=72)
            ax = axes[0, 0]
            env = np.asarray(lt.onset.onset_strength(y=y, sr=SR))
            times = np.asarray(lt.times_like(env, sr=SR))
            for k, a in enumerate(axes.ravel()):
                a.plot(times, env * (k + 1), label=f"x{k+1}")
            lt.display.legend_for_axes(list(axes.ravel()))
        elif name == "specshow_oct3_minor":
            # reference test_oct3_minor: third-octave bands, minor ticks
            import librosa_tpu.core.convert as _conv

            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )[:128]
            lt.display.specshow(
                np.asarray(S), sr=SR, x_axis="time", y_axis="log", ax=ax
            )
            ax.minorticks_on()
        elif name == "specshow_chroma_zoom":
            ch = np.asarray(lt.feature.chroma_stft(y=y, sr=SR, tuning=0.0))
            lt.display.specshow(ch, sr=SR, x_axis="time", y_axis="chroma",
                                ax=ax)
            fig.canvas.draw()
            ax.set_ylim(2, 6)
        elif name == "waveshow_where_pre":
            lt.display.waveshow(y[:400], sr=SR, ax=ax, where="pre")
        elif name == "specshow_cqt_hz_zoom":
            C = lt.amplitude_to_db(
                np.abs(np.asarray(lt.cqt(y, sr=SR, res_type="polyphase"))),
                ref=np.max,
            )
            lt.display.specshow(
                np.asarray(C), sr=SR, x_axis="time", y_axis="cqt_hz", ax=ax
            )
            fig.canvas.draw()
            ax.set_ylim(100, 400)
        elif name == "specshow_tempo_zoom":
            tg = np.asarray(lt.feature.tempogram(y=y, sr=SR))
            lt.display.specshow(tg, sr=SR, x_axis="time", y_axis="tempo",
                                ax=ax)
            fig.canvas.draw()
            ax.set_ylim(60, 240)
        elif name == "wavebars_invert":
            lt.display.wavebars(y, sr=SR, ax=ax, invert=True)
        elif name == "specshow_no_axes":
            S = lt.power_to_db(
                np.abs(np.asarray(lt.stft(y))) ** 2, ref=np.max
            )
            lt.display.specshow(np.asarray(S), sr=SR, ax=ax)
        elif name == "specshow_vscale_phase":
            D = np.asarray(lt.stft(y))
            lt.display.specshow(
                np.angle(D), sr=SR, x_axis="time", y_axis="linear",
                vscale="phase", ax=ax,
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
    "specshow_cqt_svara",
    "specshow_vqt_note",
    "specshow_vqt_hz",
    "specshow_vqt_fjs",
    "specshow_fft_note",
    "specshow_fft_svara",
    "specshow_chroma_fjs",
    "specshow_log_oct3",
    "specshow_mel_oct3",
    "specshow_cqt_note_zoom",
    "specshow_oct3_zoom",
    "specshow_keyed_note",
    "specshow_lag_s",
    "specshow_chroma_c",
    "specshow_x_chroma",
    "waveshow_stereo",
    "wavebars_colored",
    "wavef0_transpose",
    "colorbar_phase",
    "multiplot_waveshow",
    "multiplot_specshow",
    "highlight_colored",
    "legend_for_axes",
    "waveshow_zoom",
    "waveshow_zoom_out",
    "waveshow_transpose",
    "waveshow_inverted",
    "waveshow_offset",
    "wavebars_transpose",
    "specshow_abs_input",
    "specshow_boolean",
    "specshow_diverging",
    "specshow_double_chroma",
    "specshow_x_mel",
    "specshow_y_mel_bounded",
    "specshow_unicode_false",
    "specshow_time_unit_lag",
    "specshow_xy_none",
    "sharex_specshow_ms",
    "legend_for_axes_left",
    "specshow_coords",
    "specshow_fft_odd",
    "wavef0_voicing",
    "specshow_complex_input",
    "waveshow_ext_axes",
    "specshow_ext_axes",
    "legend_grid",
    "specshow_oct3_minor",
    "specshow_chroma_zoom",
    "waveshow_where_pre",
    "specshow_cqt_hz_zoom",
    "specshow_tempo_zoom",
    "wavebars_invert",
    "specshow_no_axes",
    "specshow_vscale_phase",
]
