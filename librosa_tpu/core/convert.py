"""Unit conversion utilities (L2, pure math).

Behavioral parity with reference ``librosa/core/convert.py``.  These run on
host in float64 (they are plan-time helpers: frequency grids, frame/sample
arithmetic); device pipelines bake their outputs in as constants.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterable, Optional, Sequence, Union

import numpy as np

from ..util.exceptions import ParameterError

__all__ = [
    "frames_to_samples",
    "frames_to_time",
    "samples_to_frames",
    "samples_to_time",
    "time_to_samples",
    "time_to_frames",
    "blocks_to_frames",
    "blocks_to_samples",
    "blocks_to_time",
    "note_to_hz",
    "note_to_midi",
    "midi_to_hz",
    "midi_to_note",
    "hz_to_note",
    "hz_to_midi",
    "hz_to_mel",
    "hz_to_octs",
    "mel_to_hz",
    "octs_to_hz",
    "A4_to_tuning",
    "tuning_to_A4",
    "fft_frequencies",
    "cqt_frequencies",
    "mel_frequencies",
    "tempo_frequencies",
    "fourier_tempo_frequencies",
    "A_weighting",
    "B_weighting",
    "C_weighting",
    "D_weighting",
    "Z_weighting",
    "frequency_weighting",
    "multi_frequency_weighting",
    "times_like",
    "samples_like",
    "midi_to_svara_h",
    "midi_to_svara_c",
    "hz_to_svara_h",
    "hz_to_svara_c",
    "note_to_svara_h",
    "note_to_svara_c",
    "hz_to_fjs",
]


# ---------------------------------------------------------------------------
# Frame/sample/time arithmetic (reference core/convert.py:78-405)
# ---------------------------------------------------------------------------


def frames_to_samples(
    frames: Any, *, hop_length: int = 512, n_fft: Optional[int] = None
) -> np.ndarray:
    """Convert frame indices to audio sample indices. Parity: core/convert.py:78."""
    offset = 0
    if n_fft is not None:
        offset = int(n_fft // 2)
    return (np.asanyarray(frames) * hop_length + offset).astype(int)


def samples_to_frames(
    samples: Any, *, hop_length: int = 512, n_fft: Optional[int] = None
) -> np.ndarray:
    """Convert sample indices into STFT frames. Parity: core/convert.py:133."""
    offset = 0
    if n_fft is not None:
        offset = int(n_fft // 2)
    samples = np.asanyarray(samples)
    return np.asarray(np.floor((samples - offset) // hop_length), dtype=int)


def frames_to_time(
    frames: Any,
    *,
    sr: float = 22050,
    hop_length: int = 512,
    n_fft: Optional[int] = None,
) -> np.ndarray:
    """Convert frame counts to time (seconds). Parity: core/convert.py:185."""
    samples = frames_to_samples(frames, hop_length=hop_length, n_fft=n_fft)
    return samples_to_time(samples, sr=sr)


def time_to_frames(
    times: Any,
    *,
    sr: float = 22050,
    hop_length: int = 512,
    n_fft: Optional[int] = None,
) -> np.ndarray:
    """Convert time stamps into STFT frames. Parity: core/convert.py:235."""
    samples = time_to_samples(times, sr=sr)
    return samples_to_frames(samples, hop_length=hop_length, n_fft=n_fft)


def time_to_samples(times: Any, *, sr: float = 22050) -> np.ndarray:
    """Convert timestamps (in seconds) to sample indices. Parity: core/convert.py:297."""
    return (np.asanyarray(times) * sr).astype(int)


def samples_to_time(samples: Any, *, sr: float = 22050) -> np.ndarray:
    """Convert sample indices to time (in seconds). Parity: core/convert.py:343."""
    return np.asanyarray(samples) / float(sr)


def blocks_to_frames(blocks: Any, *, block_length: int) -> np.ndarray:
    """Convert block indices to frame indices. Parity: core/convert.py:409."""
    return block_length * np.asanyarray(blocks)


def blocks_to_samples(
    blocks: Any, *, block_length: int, hop_length: int
) -> np.ndarray:
    """Convert block indices to sample indices. Parity: core/convert.py:457."""
    frames = blocks_to_frames(blocks, block_length=block_length)
    return frames_to_samples(frames, hop_length=hop_length)


def blocks_to_time(
    blocks: Any, *, block_length: int, hop_length: int, sr: float
) -> np.ndarray:
    """Convert block indices to time stamps. Parity: core/convert.py:510."""
    samples = blocks_to_samples(
        blocks, block_length=block_length, hop_length=hop_length
    )
    return samples_to_time(samples, sr=sr)


# ---------------------------------------------------------------------------
# Notes and MIDI (reference core/convert.py:625-1000)
# ---------------------------------------------------------------------------

_NOTE_RE = re.compile(
    r"^(?P<note>[A-Ga-g])"
    r"(?P<accidental>[#♯𝄪b!♭𝄫♮]*)"
    r"(?P<octave>[+-]?\d+)?"
    r"(?P<cents>[+-]\d+)?$"
)

_PITCH_MAP = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}
_ACC_MAP = {
    "#": 1,
    "": 0,
    "b": -1,
    "!": -1,
    "♯": 1,
    "𝄪": 2,
    "♭": -1,
    "𝄫": -2,
    "♮": 0,
}


def note_to_midi(note: Any, *, round_midi: bool = True):
    """Convert one or more spelled notes to MIDI number(s). Parity: core/convert.py:625."""
    if not isinstance(note, str):
        return np.array([note_to_midi(n, round_midi=round_midi) for n in note])

    match = _NOTE_RE.match(note)
    if not match:
        raise ParameterError(f"Improper note format: {note:s}")

    pitch = match.group("note").upper()
    offset = np.sum([_ACC_MAP[o] for o in match.group("accidental")])
    octave = match.group("octave")
    cents = match.group("cents")

    octave = int(octave) if octave else 0
    cents = int(cents) * 1e-2 if cents else 0

    note_value = 12 * (octave + 1) + _PITCH_MAP[pitch] + offset + cents
    if round_midi:
        note_value = int(np.round(note_value))
    return note_value


def note_to_hz(note: Any, **kwargs: Any):
    """Convert one or more note names to frequency (Hz). Parity: core/convert.py:569."""
    return midi_to_hz(note_to_midi(note, **kwargs))


def midi_to_note(
    midi: Any,
    *,
    octave: bool = True,
    cents: bool = False,
    key: str = "C:maj",
    unicode: bool = True,
):
    """Convert one or more MIDI numbers to note strings. Parity: core/convert.py:761."""
    if cents and not octave:
        raise ParameterError("Cannot encode cents without octave information.")

    if not np.isscalar(midi):
        return [
            midi_to_note(x, octave=octave, cents=cents, key=key, unicode=unicode)
            for x in midi
        ]

    from .notation import key_to_notes

    note_map = key_to_notes(key=key, unicode=unicode)

    note_num = int(np.round(midi))
    note_cents = int(100 * np.around(midi - note_num, 2))

    note = note_map[note_num % 12]
    if octave:
        note = f"{note:s}{note_num // 12 - 1:0d}"
    if cents:
        note = f"{note:s}{note_cents:+02d}"
    return note


def midi_to_hz(notes: Any) -> np.ndarray:
    """Get the frequency (Hz) of MIDI note(s). Parity: core/convert.py:874."""
    return 440.0 * (2.0 ** ((np.asanyarray(notes) - 69.0) / 12.0))


def hz_to_midi(frequencies: Any) -> np.ndarray:
    """Get MIDI note number(s) for given frequencies. Parity: core/convert.py:913."""
    return 12 * (
        np.log2(np.asanyarray(frequencies)) - np.log2(440.0)
    ) + 69


def hz_to_note(frequencies: Any, **kwargs: Any):
    """Convert frequencies to the closest note name. Parity: core/convert.py:949."""
    return midi_to_note(hz_to_midi(frequencies), **kwargs)


# ---------------------------------------------------------------------------
# Mel scale (reference core/convert.py:1004-1146)
# ---------------------------------------------------------------------------


def hz_to_mel(frequencies: Any, *, htk: bool = False) -> np.ndarray:
    """Convert Hz to Mels. Parity: core/convert.py:1004 (Slaney default, HTK opt)."""
    frequencies = np.asanyarray(frequencies)
    if htk:
        mels: np.ndarray = 2595.0 * np.log10(1.0 + frequencies / 700.0)
        return mels

    # Slaney formula: linear below 1 kHz, logarithmic above
    f_min = 0.0
    f_sp = 200.0 / 3
    mels = (frequencies - f_min) / f_sp

    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0

    if frequencies.ndim:
        log_t = frequencies >= min_log_hz
        mels[log_t] = min_log_mel + np.log(frequencies[log_t] / min_log_hz) / logstep
    elif frequencies >= min_log_hz:
        mels = min_log_mel + np.log(frequencies / min_log_hz) / logstep
    return mels


def mel_to_hz(mels: Any, *, htk: bool = False) -> np.ndarray:
    """Convert mel bins to frequencies. Parity: core/convert.py:1069."""
    mels = np.asanyarray(mels)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)

    f_min = 0.0
    f_sp = 200.0 / 3
    freqs = f_min + f_sp * mels

    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0

    if mels.ndim:
        log_t = mels >= min_log_mel
        freqs[log_t] = min_log_hz * np.exp(logstep * (mels[log_t] - min_log_mel))
    elif mels >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return freqs


def hz_to_octs(
    frequencies: Any, *, tuning: float = 0.0, bins_per_octave: int = 12
) -> np.ndarray:
    """Convert frequencies (Hz) to octave numbers. Parity: core/convert.py:1146."""
    A440 = 440.0 * 2.0 ** (tuning / bins_per_octave)
    return np.log2(np.asanyarray(frequencies) / (float(A440) / 16))


def octs_to_hz(
    octs: Any, *, tuning: float = 0.0, bins_per_octave: int = 12
) -> np.ndarray:
    """Convert octave numbers to frequencies. Parity: core/convert.py:1204."""
    A440 = 440.0 * 2.0 ** (tuning / bins_per_octave)
    return (float(A440) / 16) * (2.0 ** np.asanyarray(octs))


def A4_to_tuning(A4: Any, *, bins_per_octave: int = 12) -> np.ndarray:
    """Convert A4 reference frequency to tuning deviation (fractional bins).

    Parity: core/convert.py:1256.
    """
    return bins_per_octave * (np.log2(np.asanyarray(A4)) - np.log2(440.0))


def tuning_to_A4(tuning: Any, *, bins_per_octave: int = 12) -> np.ndarray:
    """Convert tuning deviation to reference pitch frequency. Parity: core/convert.py:1319."""
    return 440.0 * 2.0 ** (np.asanyarray(tuning) / bins_per_octave)


# ---------------------------------------------------------------------------
# Frequency grids (reference core/convert.py:1369-1590)
# ---------------------------------------------------------------------------


def fft_frequencies(*, sr: float = 22050, n_fft: int = 2048) -> np.ndarray:
    """Center frequencies of FFT bins. Parity: core/convert.py:1369."""
    return np.fft.rfftfreq(n=n_fft, d=1.0 / sr)


def cqt_frequencies(
    n_bins: int, *, fmin: float, bins_per_octave: int = 12, tuning: float = 0.0
) -> np.ndarray:
    """Center frequencies of Constant-Q bins. Parity: core/convert.py:1394."""
    correction = 2.0 ** (float(tuning) / bins_per_octave)
    frequencies = 2.0 ** (np.arange(0, n_bins, dtype=float) / bins_per_octave)
    return correction * fmin * frequencies


def mel_frequencies(
    n_mels: int = 128,
    *,
    fmin: float = 0.0,
    fmax: float = 11025.0,
    htk: bool = False,
) -> np.ndarray:
    """Center frequencies of mel bands, uniformly spaced in mel scale.

    Parity: core/convert.py:1432.
    """
    min_mel = hz_to_mel(fmin, htk=htk)
    max_mel = hz_to_mel(fmax, htk=htk)
    mels = np.linspace(min_mel, max_mel, n_mels)
    return mel_to_hz(mels, htk=htk)


def tempo_frequencies(
    n_bins: int, *, hop_length: int = 512, sr: float = 22050
) -> np.ndarray:
    """Frequencies (in BPM) of tempogram lag bins. Parity: core/convert.py:1514."""
    bin_frequencies = np.zeros(int(n_bins), dtype=np.float64)
    bin_frequencies[0] = np.inf
    bin_frequencies[1:] = 60.0 * sr / (hop_length * np.arange(1.0, n_bins))
    return bin_frequencies


def fourier_tempo_frequencies(
    *, sr: float = 22050, win_length: int = 384, hop_length: int = 512
) -> np.ndarray:
    """Frequencies (in BPM) of Fourier tempogram bins. Parity: core/convert.py:1551."""
    return fft_frequencies(sr=sr * 60 / float(hop_length), n_fft=win_length)


# ---------------------------------------------------------------------------
# Perceptual weighting curves (reference core/convert.py:1594-2060)
# ---------------------------------------------------------------------------


def A_weighting(frequencies: Any, *, min_db: Optional[float] = -80.0) -> np.ndarray:
    """A-weighting of a set of frequencies (dB). Parity: core/convert.py:1594."""
    f_sq = np.asanyarray(frequencies) ** 2.0
    const = np.array([12194.217, 20.598997, 107.65265, 737.86223]) ** 2.0
    weights: np.ndarray = 2.0 + 20.0 * (
        np.log10(const[0])
        + 2 * np.log10(f_sq)
        - np.log10(f_sq + const[0])
        - np.log10(f_sq + const[1])
        - 0.5 * np.log10(f_sq + const[2])
        - 0.5 * np.log10(f_sq + const[3])
    )
    return weights if min_db is None else np.maximum(min_db, weights)


def B_weighting(frequencies: Any, *, min_db: Optional[float] = -80.0) -> np.ndarray:
    """B-weighting of a set of frequencies (dB). Parity: core/convert.py:1671."""
    f_sq = np.asanyarray(frequencies) ** 2.0
    const = np.array([12194.217, 20.598997, 158.48932]) ** 2.0
    weights: np.ndarray = 0.17 + 20.0 * (
        np.log10(const[0])
        + 1.5 * np.log10(f_sq)
        - np.log10(f_sq + const[0])
        - np.log10(f_sq + const[1])
        - 0.5 * np.log10(f_sq + const[2])
    )
    return weights if min_db is None else np.maximum(min_db, weights)


def C_weighting(frequencies: Any, *, min_db: Optional[float] = -80.0) -> np.ndarray:
    """C-weighting of a set of frequencies (dB). Parity: core/convert.py:1746."""
    f_sq = np.asanyarray(frequencies) ** 2.0
    const = np.array([12194.217, 20.598997]) ** 2.0
    weights: np.ndarray = 0.062 + 20.0 * (
        np.log10(const[0])
        + np.log10(f_sq)
        - np.log10(f_sq + const[0])
        - np.log10(f_sq + const[1])
    )
    return weights if min_db is None else np.maximum(min_db, weights)


def D_weighting(frequencies: Any, *, min_db: Optional[float] = -80.0) -> np.ndarray:
    """D-weighting of a set of frequencies (dB). Parity: core/convert.py:1819."""
    frequencies = np.asanyarray(frequencies)
    f_sq = frequencies**2.0
    # NB: every constant is squared, including the leading gain term
    # (reference squares the whole const vector, core/convert.py:1878).
    const = (
        np.array([8.3046305e-3, 1018.7, 1039.6, 3136.5, 3424.0, 282.7, 1160.0])
        ** 2.0
    )

    with np.errstate(divide="ignore"):
        weights: np.ndarray = 20.0 * (
            0.5 * np.log10(f_sq)
            - np.log10(const[0])
            + 0.5
            * (
                +np.log10((const[1] - f_sq) ** 2 + const[2] * f_sq)
                - np.log10((const[3] - f_sq) ** 2 + const[4] * f_sq)
                - np.log10(f_sq + const[5])
                - np.log10(f_sq + const[6])
            )
        )
    return weights if min_db is None else np.maximum(min_db, weights)


def Z_weighting(frequencies: Any, *, min_db: Optional[float] = None) -> np.ndarray:
    """Z-weighting (flat). Parity: core/convert.py:1940."""
    return np.zeros_like(np.asanyarray(frequencies), dtype=float)


WEIGHTING_FUNCTIONS: dict = {
    "A": A_weighting,
    "B": B_weighting,
    "C": C_weighting,
    "D": D_weighting,
    "Z": Z_weighting,
    None: Z_weighting,
}


def frequency_weighting(
    frequencies: Any, *, kind: str = "A", **kwargs: Any
) -> np.ndarray:
    """Compute a perceptual weighting of a set of frequencies.

    Parity: core/convert.py:1976.
    """
    if isinstance(kind, str):
        kind = kind.upper()
    if kind not in WEIGHTING_FUNCTIONS:
        raise ParameterError(f"Unknown weighting kind: {kind}")
    return WEIGHTING_FUNCTIONS[kind](frequencies, **kwargs)


def multi_frequency_weighting(
    frequencies: Any, *, kinds: Iterable[str] = "ZAC", **kwargs: Any
) -> np.ndarray:
    """Compute multiple weightings, stacked. Parity: core/convert.py:2021."""
    return np.stack(
        [frequency_weighting(frequencies, kind=k, **kwargs) for k in kinds],
        axis=0,
    )


# ---------------------------------------------------------------------------
# Grid constructors (reference core/convert.py:2073-2200)
# ---------------------------------------------------------------------------


def times_like(
    X: Any,
    *,
    sr: float = 22050,
    hop_length: int = 512,
    n_fft: Optional[int] = None,
    axis: int = -1,
) -> np.ndarray:
    """Time array matching the frame axis of X. Parity: core/convert.py:2073."""
    samples = samples_like(X, hop_length=hop_length, n_fft=n_fft, axis=axis)
    return samples_to_time(samples, sr=sr)


def samples_like(
    X: Any,
    *,
    hop_length: int = 512,
    n_fft: Optional[int] = None,
    axis: int = -1,
) -> np.ndarray:
    """Sample-index array matching the frame axis of X. Parity: core/convert.py:2133."""
    if np.isscalar(X):
        frames = np.arange(X)
    else:
        frames = np.arange(np.shape(X)[axis])
    return frames_to_samples(frames, hop_length=hop_length, n_fft=n_fft)


# ---------------------------------------------------------------------------
# Indian-classical svara naming (reference core/convert.py:2211-2776)
# ---------------------------------------------------------------------------

_SVARA_MAP_H = [
    "Sa", "re", "Re", "ga", "Ga", "ma", "Ma", "Pa", "dha", "Dha", "ni", "Ni",
]


def midi_to_svara_h(
    midi: Any,
    *,
    Sa: float,
    abbr: bool = True,
    octave: bool = True,
    unicode: bool = True,
):
    """Convert MIDI numbers to Hindustani svara. Parity: core/convert.py:2211."""
    if not np.isscalar(midi):
        return np.array(
            [
                midi_to_svara_h(
                    m, Sa=Sa, abbr=abbr, octave=octave, unicode=unicode
                )
                for m in np.asarray(midi)
            ]
        )
    if not np.isfinite(midi):
        return ""

    svara_num = int(np.round(midi - Sa))
    if abbr:
        svara = _SVARA_MAP_H[svara_num % 12][0]
    else:
        svara = _SVARA_MAP_H[svara_num % 12]

    if octave:
        if 24 > svara_num >= 12:
            svara = (svara[0] + "̇" + svara[1:]) if unicode else svara + "'"
        elif -12 <= svara_num < 0:
            svara = (svara[0] + "̣" + svara[1:]) if unicode else svara + ","
    return svara


def hz_to_svara_h(
    frequencies: Any,
    *,
    Sa: float,
    abbr: bool = True,
    octave: bool = True,
    unicode: bool = True,
):
    """Convert frequencies to Hindustani svara. Parity: core/convert.py:2348."""
    midis = hz_to_midi(frequencies)
    return midi_to_svara_h(
        midis, Sa=float(hz_to_midi(Sa)), abbr=abbr, octave=octave,
        unicode=unicode,
    )


def note_to_svara_h(
    notes: Any,
    *,
    Sa: str,
    abbr: bool = True,
    octave: bool = True,
    unicode: bool = True,
):
    """Convert note names to Hindustani svara. Parity: core/convert.py:2429."""
    midis = note_to_midi(notes, round_midi=False)
    return midi_to_svara_h(
        midis, Sa=note_to_midi(Sa), abbr=abbr, octave=octave, unicode=unicode
    )


def midi_to_svara_c(
    midi: Any,
    *,
    Sa: float,
    mela: Any,
    abbr: bool = True,
    octave: bool = True,
    unicode: bool = True,
):
    """Convert MIDI numbers to Carnatic svara. Parity: core/convert.py:2515."""
    from .notation import mela_to_svara

    if not np.isscalar(midi):
        return np.array(
            [
                midi_to_svara_c(
                    m, Sa=Sa, mela=mela, abbr=abbr, octave=octave,
                    unicode=unicode,
                )
                for m in np.asarray(midi)
            ]
        )
    if not np.isfinite(midi):
        return ""

    svara_num = int(np.round(midi - Sa))
    svara_map = mela_to_svara(mela, abbr=abbr, unicode=unicode)
    svara = svara_map[svara_num % 12]

    if octave:
        if 24 > svara_num >= 12:
            svara = (svara[0] + "̇" + svara[1:]) if unicode else svara + "'"
        elif -12 <= svara_num < 0:
            svara = (svara[0] + "̣" + svara[1:]) if unicode else svara + ","
    return svara


def hz_to_svara_c(
    frequencies: Any,
    *,
    Sa: float,
    mela: Any,
    abbr: bool = True,
    octave: bool = True,
    unicode: bool = True,
):
    """Convert frequencies to Carnatic svara. Parity: core/convert.py:2614."""
    midis = hz_to_midi(frequencies)
    return midi_to_svara_c(
        midis, Sa=float(hz_to_midi(Sa)), mela=mela, abbr=abbr, octave=octave,
        unicode=unicode,
    )


def note_to_svara_c(
    notes: Any,
    *,
    Sa: str,
    mela: Any,
    abbr: bool = True,
    octave: bool = True,
    unicode: bool = True,
):
    """Convert note names to Carnatic svara. Parity: core/convert.py:2707."""
    midis = note_to_midi(notes, round_midi=False)
    return midi_to_svara_c(
        midis, Sa=note_to_midi(Sa), mela=mela, abbr=abbr, octave=octave,
        unicode=unicode,
    )


def hz_to_fjs(
    frequencies: Any,
    *,
    fmin: Optional[float] = None,
    unison: Optional[str] = None,
    unicode: bool = False,
):
    """Convert just-intonation frequencies to FJS notation.

    Parity: core/convert.py:2793.
    """
    from .notation import interval_to_fjs

    if fmin is None:
        fmin = np.min(frequencies)
    if unison is None:
        unison = hz_to_note(fmin, octave=False, unicode=False)

    if np.isscalar(frequencies):
        intervals = frequencies / fmin
    else:
        intervals = np.asarray(frequencies) / fmin
    return interval_to_fjs(intervals, unison=unison, unicode=unicode)
