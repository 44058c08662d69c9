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
    """Convert frame indices to audio sample indices.

    Parameters
    ----------
    frames : number or np.ndarray
        frame index or array of frame indices
    hop_length : int > 0
        number of samples between successive frames
    n_fft : int or None
        if given, sample indices are offset by ``n_fft // 2`` to
        align with *centered* frames

    Returns
    -------
    times : np.ndarray [dtype=int]
        sample index (or array) of each frame's leading edge

    See Also
    --------
    frames_to_time, samples_to_frames

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.frames_to_samples([0, 1, 2], hop_length=512).tolist()
    [0, 512, 1024]
    >>> int(lt.frames_to_samples(1, hop_length=512, n_fft=2048))
    1536

    Parity: reference core/convert.py:78.
    """
    offset = 0
    if n_fft is not None:
        offset = int(n_fft // 2)
    return (np.asanyarray(frames) * hop_length + offset).astype(int)


def samples_to_frames(
    samples: Any, *, hop_length: int = 512, n_fft: Optional[int] = None
) -> np.ndarray:
    """Convert sample indices into STFT frame indices.

    Inverse of :func:`frames_to_samples`; samples inside a hop map to the
    frame whose leading edge most recently passed them.

    Parameters
    ----------
    samples : number or np.ndarray
        sample index or array of sample indices
    hop_length : int > 0
        number of samples between successive frames
    n_fft : int or None
        if given, offsets by ``n_fft // 2`` for centered frames

    Returns
    -------
    frames : np.ndarray [dtype=int]
        frame index for each sample

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.samples_to_frames([0, 511, 512, 1024], hop_length=512).tolist()
    [0, 0, 1, 2]

    Parity: reference core/convert.py:133.
    """
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
    """Convert frame indices to timestamps in seconds.

    Parameters
    ----------
    frames : number or np.ndarray
        frame index or array of frame indices
    sr : number > 0
        sampling rate
    hop_length : int > 0
        number of samples between successive frames
    n_fft : int or None
        if given, offsets by ``n_fft // 2`` for centered frames

    Returns
    -------
    times : np.ndarray
        time (in seconds) of each frame

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.frames_to_time([0, 43], sr=22050, hop_length=512).round(3).tolist()
    [0.0, 0.998]

    Parity: reference core/convert.py:185.
    """
    samples = frames_to_samples(frames, hop_length=hop_length, n_fft=n_fft)
    return samples_to_time(samples, sr=sr)


def time_to_frames(
    times: Any,
    *,
    sr: float = 22050,
    hop_length: int = 512,
    n_fft: Optional[int] = None,
) -> np.ndarray:
    """Convert timestamps (seconds) into STFT frame indices.

    Parameters
    ----------
    times : number or np.ndarray
        timestamp (seconds) or array of timestamps
    sr : number > 0
        sampling rate
    hop_length : int > 0
        number of samples between successive frames
    n_fft : int or None
        if given, offsets by ``n_fft // 2`` for centered frames

    Returns
    -------
    frames : np.ndarray [dtype=int]
        frame index for each time

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.time_to_frames([0.0, 1.0], sr=22050, hop_length=512).tolist()
    [0, 43]

    Parity: reference core/convert.py:235.
    """
    samples = time_to_samples(times, sr=sr)
    return samples_to_frames(samples, hop_length=hop_length, n_fft=n_fft)


def time_to_samples(times: Any, *, sr: float = 22050) -> np.ndarray:
    """Convert timestamps (seconds) to sample indices.

    Parameters
    ----------
    times : number or np.ndarray
        timestamp (seconds) or array of timestamps
    sr : number > 0
        sampling rate

    Returns
    -------
    samples : np.ndarray [dtype=int]
        sample index for each time

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.time_to_samples([0.0, 0.5, 1.0], sr=22050).tolist()
    [0, 11025, 22050]

    Parity: reference core/convert.py:297.
    """
    return (np.asanyarray(times) * sr).astype(int)


def samples_to_time(samples: Any, *, sr: float = 22050) -> np.ndarray:
    """Convert sample indices to timestamps in seconds.

    Parameters
    ----------
    samples : number or np.ndarray
        sample index or array of sample indices
    sr : number > 0
        sampling rate

    Returns
    -------
    times : np.ndarray
        time (in seconds) of each sample

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.samples_to_time([0, 11025, 22050], sr=22050).tolist()
    [0.0, 0.5, 1.0]

    Parity: reference core/convert.py:343.
    """
    return np.asanyarray(samples) / float(sr)


def blocks_to_frames(blocks: Any, *, block_length: int) -> np.ndarray:
    """Convert stream block indices to frame indices.

    For audio processed in blocks of ``block_length`` frames
    (see ``stream``), block ``b`` starts at frame ``b * block_length``.

    Parameters
    ----------
    blocks : number or np.ndarray
        block index or array of block indices
    block_length : int > 0
        frames per block

    Returns
    -------
    frames : np.ndarray [dtype=int]
        frame index of each block's first frame

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.blocks_to_frames([0, 1, 2], block_length=16).tolist()
    [0, 16, 32]

    Parity: reference core/convert.py:409.
    """
    return block_length * np.asanyarray(blocks)


def blocks_to_samples(
    blocks: Any, *, block_length: int, hop_length: int
) -> np.ndarray:
    """Convert stream block indices to sample indices.

    Parameters
    ----------
    blocks : number or np.ndarray
        block index or array of block indices
    block_length : int > 0
        frames per block
    hop_length : int > 0
        samples between successive frames

    Returns
    -------
    samples : np.ndarray [dtype=int]
        sample index of each block's first sample

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.blocks_to_samples([0, 1], block_length=16, hop_length=512).tolist()
    [0, 8192]

    Parity: reference core/convert.py:457.
    """
    frames = blocks_to_frames(blocks, block_length=block_length)
    return frames_to_samples(frames, hop_length=hop_length)


def blocks_to_time(
    blocks: Any, *, block_length: int, hop_length: int, sr: float
) -> np.ndarray:
    """Convert stream block indices to timestamps in seconds.

    Parameters
    ----------
    blocks : number or np.ndarray
        block index or array of block indices
    block_length : int > 0
        frames per block
    hop_length : int > 0
        samples between successive frames
    sr : number > 0
        sampling rate

    Returns
    -------
    times : np.ndarray
        time (in seconds) of each block's first sample

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.blocks_to_time([0, 1], block_length=43, hop_length=512,
    ...                   sr=22050).round(3).tolist()
    [0.0, 0.998]

    Parity: reference core/convert.py:510.
    """
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
    """Convert one or more spelled notes to MIDI number(s).

    Accepts note names with accidentals (``#``, ``b``, ``!``, unicode
    ``♯``/``♭``/``𝄪``/``𝄫``/``♮``), an optional octave number, and an
    optional cent offset (e.g. ``'A4+25'``).

    Parameters
    ----------
    note : str or iterable of str
        spelled note(s), e.g. ``'C#3'``, ``'Bb-1'``, ``'A4+25'``
    round_midi : bool
        round to the nearest integer MIDI number (cents otherwise
        contribute fractionally)

    Returns
    -------
    midi : number or np.ndarray
        MIDI number(s) of the input note(s)

    Raises
    ------
    ParameterError
        if the note string cannot be parsed

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> int(lt.note_to_midi('C4'))
    60
    >>> int(lt.note_to_midi('C#3'))
    49
    >>> float(lt.note_to_midi('A4+50', round_midi=False))
    69.5

    Parity: reference core/convert.py:625.
    """
    if not isinstance(note, str):
        return np.array([note_to_midi(n, round_midi=round_midi) for n in note])
    if note == "":
        return np.nan

    parsed = _NOTE_RE.match(note)
    if parsed is None:
        raise ParameterError(f"Cannot parse note name: {note!r}")

    # assemble: octave register + natural pitch class + accidentals + cents
    semitone = _PITCH_MAP[parsed.group("note").upper()]
    shift = sum(_ACC_MAP[c] for c in parsed.group("accidental"))
    oct_digits = parsed.group("octave")
    register = (int(oct_digits) if oct_digits else 0) + 1
    cent_digits = parsed.group("cents")
    detune = int(cent_digits) / 100.0 if cent_digits else 0.0

    midi_value = 12 * register + semitone + shift + detune
    return int(np.round(midi_value)) if round_midi else midi_value


def note_to_hz(note: Any, *, round_midi: bool = False):
    """Convert one or more note names to frequencies in Hz.

    Parameters
    ----------
    note : str or iterable of str
        spelled note(s), e.g. ``'A4'``, ``'C#3'``
    round_midi : bool
        round cent deviations to the nearest semitone before converting

    Returns
    -------
    frequencies : number or np.ndarray
        frequency in Hz of each note

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> float(lt.note_to_hz('A4'))
    440.0
    >>> float(lt.note_to_hz('A5'))
    880.0

    Parity: reference core/convert.py:569.
    """
    return midi_to_hz(note_to_midi(note, round_midi=round_midi))


def midi_to_note(
    midi: Any,
    *,
    octave: bool = True,
    cents: bool = False,
    key: str = "C:maj",
    unicode: bool = True,
):
    """Convert one or more MIDI numbers to spelled note strings.

    Parameters
    ----------
    midi : number or iterable of numbers
        MIDI number(s)
    octave : bool
        include the octave number in the name
    cents : bool
        append the cent deviation (requires ``octave=True``)
    key : str
        key signature used to choose sharp vs flat spellings
    unicode : bool
        use unicode accidental symbols

    Returns
    -------
    notes : str or list of str
        spelled note name(s)

    Raises
    ------
    ParameterError
        if ``cents`` is requested without ``octave``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.midi_to_note(60, unicode=False)
    'C4'
    >>> lt.midi_to_note(61, key='Eb:maj', unicode=False)
    'Db4'

    Parity: reference core/convert.py:761.
    """
    if cents and not octave:
        raise ParameterError("Cannot encode cents without octave information.")

    if not np.isscalar(midi):
        # array-in, array-out (the reference vectorizes via np.vectorize)
        return np.array([
            midi_to_note(x, octave=octave, cents=cents, key=key, unicode=unicode)
            for x in midi
        ])

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
    """Get the frequency (Hz) of MIDI note(s).

    MIDI 69 is A440; each step is one equal-tempered semitone.

    Parameters
    ----------
    notes : number or np.ndarray
        MIDI number(s)

    Returns
    -------
    frequencies : np.ndarray
        frequency in Hz of each note

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> float(lt.midi_to_hz(69))
    440.0
    >>> float(lt.midi_to_hz(57))
    220.0

    Parity: reference core/convert.py:874.
    """
    return 440.0 * (2.0 ** ((np.asanyarray(notes) - 69.0) / 12.0))


def hz_to_midi(frequencies: Any) -> np.ndarray:
    """Get the MIDI number(s) of given frequencies.

    Parameters
    ----------
    frequencies : number > 0 or np.ndarray
        frequency value(s) in Hz

    Returns
    -------
    midi : np.ndarray
        (fractional) MIDI number for each frequency

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> float(lt.hz_to_midi(440.0))
    69.0
    >>> float(np.round(lt.hz_to_midi(27.5), 6))
    21.0

    Parity: reference core/convert.py:913.
    """
    return 12 * (
        np.log2(np.asanyarray(frequencies)) - np.log2(440.0)
    ) + 69


def hz_to_note(frequencies: Any, **kwargs: Any):
    """Convert one or more frequencies to the nearest note name(s).

    Parameters
    ----------
    frequencies : number > 0 or np.ndarray
        frequency value(s) in Hz
    **kwargs
        forwarded to :func:`midi_to_note` (``octave``, ``cents``,
        ``key``, ``unicode``)

    Returns
    -------
    notes : str or list of str
        spelled note name(s)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.hz_to_note(440.0, unicode=False)
    'A4'
    >>> lt.hz_to_note(255, cents=True, unicode=False)
    'C4-44'

    Parity: reference core/convert.py:949.
    """
    return midi_to_note(hz_to_midi(frequencies), **kwargs)


# ---------------------------------------------------------------------------
# Mel scale (reference core/convert.py:1004-1146)
# ---------------------------------------------------------------------------


def hz_to_mel(frequencies: Any, *, htk: bool = False) -> np.ndarray:
    """Convert frequencies (Hz) to the mel scale.

    Parameters
    ----------
    frequencies : number or np.ndarray
        frequency value(s) in Hz
    htk : bool
        use the HTK formula ``2595·log10(1 + f/700)`` instead of the
        default Slaney/Auditory-Toolbox mapping (linear below 1 kHz,
        logarithmic above)

    Returns
    -------
    mels : np.ndarray
        mel value(s) of the input frequencies

    See Also
    --------
    mel_to_hz, mel_frequencies

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> float(np.round(lt.hz_to_mel(60), 6))
    0.9
    >>> lt.hz_to_mel([110, 220, 440]).round(3).tolist()
    [1.65, 3.3, 6.6]

    Parity: reference core/convert.py:1004.
    """
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
    """Convert mel-scale values to frequencies in Hz.

    Inverse of :func:`hz_to_mel`; the same ``htk`` flag selects the
    formula.

    Parameters
    ----------
    mels : number or np.ndarray
        mel value(s)
    htk : bool
        use the HTK formula instead of Slaney

    Returns
    -------
    frequencies : np.ndarray
        frequency (Hz) of each mel value

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> float(np.round(lt.mel_to_hz(3), 6))
    200.0
    >>> lt.mel_to_hz([1, 2, 3, 4, 5]).round(3).tolist()
    [66.667, 133.333, 200.0, 266.667, 333.333]

    Parity: reference core/convert.py:1069.
    """
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
    """Convert frequencies (Hz) to octave numbers.

    Octave 0 starts at ``A440 / 16`` (i.e. C1 in the default tuning);
    non-zero ``tuning`` shifts the reference pitch by fractions of a
    bin.

    Parameters
    ----------
    frequencies : number > 0 or np.ndarray
        frequency value(s) in Hz
    tuning : float
        tuning deviation from A440 in (fractional) bins
    bins_per_octave : int > 0
        number of bins per octave for the tuning deviation

    Returns
    -------
    octs : np.ndarray
        octave number of each frequency

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.hz_to_octs([27.5, 55, 110, 220]).round(3).tolist()
    [0.0, 1.0, 2.0, 3.0]

    Parity: reference core/convert.py:1146.
    """
    A440 = 440.0 * 2.0 ** (tuning / bins_per_octave)
    return np.log2(np.asanyarray(frequencies) / (float(A440) / 16))


def octs_to_hz(
    octs: Any, *, tuning: float = 0.0, bins_per_octave: int = 12
) -> np.ndarray:
    """Convert octave numbers to frequencies in Hz.

    Inverse of :func:`hz_to_octs`.

    Parameters
    ----------
    octs : number or np.ndarray
        octave number(s)
    tuning : float
        tuning deviation from A440 in (fractional) bins
    bins_per_octave : int > 0
        number of bins per octave for the tuning deviation

    Returns
    -------
    frequencies : np.ndarray
        frequency (Hz) at each octave

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.octs_to_hz([0, 1, 2, 3]).round(2).tolist()
    [27.5, 55.0, 110.0, 220.0]

    Parity: reference core/convert.py:1204.
    """
    A440 = 440.0 * 2.0 ** (tuning / bins_per_octave)
    return (float(A440) / 16) * (2.0 ** np.asanyarray(octs))


def A4_to_tuning(A4: Any, *, bins_per_octave: int = 12) -> np.ndarray:
    """Convert a reference pitch frequency into a tuning deviation.

    Parameters
    ----------
    A4 : number > 0 or np.ndarray
        reference frequency of A4 in Hz
    bins_per_octave : int > 0
        number of bins per octave

    Returns
    -------
    tuning : np.ndarray
        deviation from A440 in (fractional) bins

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> float(lt.A4_to_tuning(440.0))
    0.0
    >>> float(np.round(lt.A4_to_tuning(432.0), 3))
    -0.318

    Parity: reference core/convert.py:1256.
    """
    return bins_per_octave * (np.log2(np.asanyarray(A4)) - np.log2(440.0))


def tuning_to_A4(tuning: Any, *, bins_per_octave: int = 12) -> np.ndarray:
    """Convert a tuning deviation into a reference pitch frequency.

    Inverse of :func:`A4_to_tuning`.

    Parameters
    ----------
    tuning : number or np.ndarray
        deviation from A440 in (fractional) bins
    bins_per_octave : int > 0
        number of bins per octave

    Returns
    -------
    A4 : np.ndarray
        reference frequency of A4 in Hz

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> float(lt.tuning_to_A4(0.0))
    440.0
    >>> float(np.round(lt.tuning_to_A4(-0.318), 1))
    432.0

    Parity: reference core/convert.py:1319.
    """
    return 440.0 * 2.0 ** (np.asanyarray(tuning) / bins_per_octave)


# ---------------------------------------------------------------------------
# Frequency grids (reference core/convert.py:1369-1590)
# ---------------------------------------------------------------------------


def fft_frequencies(*, sr: float = 22050, n_fft: int = 2048) -> np.ndarray:
    """Center frequencies (Hz) of the non-negative FFT bins.

    Parameters
    ----------
    sr : number > 0
        sampling rate
    n_fft : int > 0
        FFT window size

    Returns
    -------
    freqs : np.ndarray [shape=(1 + n_fft/2,)]
        frequency of each rFFT bin: ``k · sr / n_fft``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.fft_frequencies(sr=22050, n_fft=16).round(2).tolist()
    [0.0, 1378.12, 2756.25, 4134.38, 5512.5, 6890.62, 8268.75, 9646.88, 11025.0]

    Parity: reference core/convert.py:1369.
    """
    return np.fft.rfftfreq(n=n_fft, d=1.0 / sr)


def cqt_frequencies(
    n_bins: int, *, fmin: float, bins_per_octave: int = 12, tuning: float = 0.0
) -> np.ndarray:
    """Center frequencies (Hz) of constant-Q / geometric bins.

    Parameters
    ----------
    n_bins : int > 0
        number of bins
    fmin : float > 0
        frequency of the first bin
    bins_per_octave : int > 0
        bins per octave
    tuning : float
        tuning deviation in fractions of a bin

    Returns
    -------
    frequencies : np.ndarray [shape=(n_bins,)]
        geometric grid ``fmin · 2^(k / bins_per_octave)``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.cqt_frequencies(4, fmin=110, bins_per_octave=1).tolist()
    [110.0, 220.0, 440.0, 880.0]

    Parity: reference core/convert.py:1394.
    """
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
    """Center frequencies of mel bands, uniformly spaced on the mel scale.

    Parameters
    ----------
    n_mels : int > 0
        number of mel bands
    fmin : float >= 0
        lowest frequency (Hz)
    fmax : float > fmin
        highest frequency (Hz)
    htk : bool
        use the HTK mel formula instead of Slaney

    Returns
    -------
    frequencies : np.ndarray [shape=(n_mels,)]
        band center frequencies in Hz

    See Also
    --------
    hz_to_mel, mel_to_hz, librosa_tpu.filters.mel

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.mel_frequencies(n_mels=4, fmax=8000).round(2).tolist()
    [0.0, 1005.65, 2836.4, 8000.0]

    Parity: reference core/convert.py:1432.
    """
    min_mel = hz_to_mel(fmin, htk=htk)
    max_mel = hz_to_mel(fmax, htk=htk)
    mels = np.linspace(min_mel, max_mel, n_mels)
    return mel_to_hz(mels, htk=htk)


def tempo_frequencies(
    n_bins: int, *, hop_length: int = 512, sr: float = 22050
) -> np.ndarray:
    """Tempo values (BPM) of autocorrelation tempogram lag bins.

    Lag bin ``k`` corresponds to ``60 · sr / (hop_length · k)`` BPM;
    bin 0 (zero lag) maps to ``+inf``.

    Parameters
    ----------
    n_bins : int > 0
        number of lag bins
    hop_length : int > 0
        samples between onset-envelope frames
    sr : number > 0
        sampling rate

    Returns
    -------
    bin_frequencies : np.ndarray [shape=(n_bins,)]
        tempo (BPM) of each lag bin

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.tempo_frequencies(4)[1:].round(2).tolist()
    [2583.98, 1291.99, 861.33]

    Parity: reference core/convert.py:1514.
    """
    bin_frequencies = np.zeros(int(n_bins), dtype=np.float64)
    bin_frequencies[0] = np.inf
    bin_frequencies[1:] = 60.0 * sr / (hop_length * np.arange(1.0, n_bins))
    return bin_frequencies


def fourier_tempo_frequencies(
    *, sr: float = 22050, win_length: int = 384, hop_length: int = 512
) -> np.ndarray:
    """Tempo values (BPM) of Fourier tempogram frequency bins.

    The Fourier tempogram is an STFT of the onset envelope, whose frame
    rate is ``sr / hop_length``; its rFFT bins convert to BPM by scaling
    with 60.

    Parameters
    ----------
    sr : number > 0
        sampling rate of the underlying audio
    win_length : int > 0
        tempogram window length (in onset frames)
    hop_length : int > 0
        samples between onset-envelope frames

    Returns
    -------
    freqs : np.ndarray [shape=(1 + win_length/2,)]
        tempo (BPM) of each Fourier bin

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.fourier_tempo_frequencies(win_length=8).round(2).tolist()
    [0.0, 323.0, 646.0, 968.99, 1291.99]

    Parity: reference core/convert.py:1551.
    """
    return fft_frequencies(sr=sr * 60 / float(hop_length), n_fft=win_length)


# ---------------------------------------------------------------------------
# Perceptual weighting curves (reference core/convert.py:1594-2060)
# ---------------------------------------------------------------------------


def A_weighting(frequencies: Any, *, min_db: Optional[float] = -80.0) -> np.ndarray:
    """A-weighting gain (dB) of a set of frequencies.

    Implements the standard A-curve from pole/zero constants 12194.217, 20.599, 107.653, 737.862 Hz (IEC 61672).

    Parameters
    ----------
    frequencies : number or np.ndarray
        frequency value(s) in Hz
    min_db : float or None
        clip the output below this level (None disables clipping)

    Returns
    -------
    weights : np.ndarray
        weighting of each frequency in dB

    See Also
    --------
    frequency_weighting, perceptual_weighting

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.A_weighting([110, 220, 440, 880]).round(2).tolist()
    [-17.84, -9.89, -4.09, -0.43]

    Parity: reference core/convert.py:1594.
    """
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
    """B-weighting gain (dB) of a set of frequencies.

    Implements the standard B-curve from pole/zero constants 12194.217, 20.599, 158.489 Hz.

    Parameters
    ----------
    frequencies : number or np.ndarray
        frequency value(s) in Hz
    min_db : float or None
        clip the output below this level (None disables clipping)

    Returns
    -------
    weights : np.ndarray
        weighting of each frequency in dB

    See Also
    --------
    frequency_weighting, perceptual_weighting

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.B_weighting([110, 220, 440, 880]).round(2).tolist()
    [-5.01, -1.72, -0.39, -0.02]

    Parity: reference core/convert.py:1671.
    """
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
    """C-weighting gain (dB) of a set of frequencies.

    Implements the standard C-curve from pole/zero constants 12194.217, 20.599 Hz.

    Parameters
    ----------
    frequencies : number or np.ndarray
        frequency value(s) in Hz
    min_db : float or None
        clip the output below this level (None disables clipping)

    Returns
    -------
    weights : np.ndarray
        weighting of each frequency in dB

    See Also
    --------
    frequency_weighting, perceptual_weighting

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.C_weighting([110, 220, 440, 880]).round(2).tolist()
    [-0.24, -0.02, 0.03, 0.01]

    Parity: reference core/convert.py:1746.
    """
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
    """D-weighting gain (dB) of a set of frequencies.

    Implements the standard D-curve from the full complex-pole response around 1-10 kHz emphasis.

    Parameters
    ----------
    frequencies : number or np.ndarray
        frequency value(s) in Hz
    min_db : float or None
        clip the output below this level (None disables clipping)

    Returns
    -------
    weights : np.ndarray
        weighting of each frequency in dB

    See Also
    --------
    frequency_weighting, perceptual_weighting

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.D_weighting([110, 220, 440, 880]).round(2).tolist()
    [-6.49, -2.16, -0.29, -0.49]

    Parity: reference core/convert.py:1819.
    """
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
    """Z-weighting: the flat (zero) frequency weighting.

    Parameters
    ----------
    frequencies : number or np.ndarray
        frequency value(s) in Hz
    min_db : float or None
        accepted for signature compatibility; unused

    Returns
    -------
    weights : np.ndarray
        zeros with the shape of ``frequencies``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.Z_weighting([110, 220]).tolist()
    [0.0, 0.0]

    Parity: reference core/convert.py:1940.
    """
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

    Parameters
    ----------
    frequencies : number or np.ndarray
        frequency value(s) in Hz
    kind : str in {'A', 'B', 'C', 'D', 'Z'}
        which standard weighting curve to apply
    **kwargs
        forwarded to the chosen curve (e.g. ``min_db``)

    Returns
    -------
    weights : np.ndarray
        weighting of each frequency in dB

    Raises
    ------
    ParameterError
        for an unknown ``kind``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.frequency_weighting([440], kind='A').round(2).tolist()
    [-4.09]

    Parity: reference core/convert.py:1976.
    """
    if isinstance(kind, str):
        kind = kind.upper()
    if kind not in WEIGHTING_FUNCTIONS:
        raise ParameterError(f"Unknown weighting kind: {kind}")
    return WEIGHTING_FUNCTIONS[kind](frequencies, **kwargs)


def multi_frequency_weighting(
    frequencies: Any, *, kinds: Iterable[str] = "ZAC", **kwargs: Any
) -> np.ndarray:
    """Stack several frequency weightings into one array.

    Parameters
    ----------
    frequencies : number or np.ndarray
        frequency value(s) in Hz
    kinds : iterable of str
        weighting curves to apply, one output row each
    **kwargs
        forwarded to each curve

    Returns
    -------
    weights : np.ndarray [shape=(len(kinds), ...)]
        one row of dB weights per requested curve

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.multi_frequency_weighting([440], kinds='ZA').round(2).tolist()
    [[0.0], [-4.09]]

    Parity: reference core/convert.py:2021.
    """
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
    """Timestamps matching the frame axis of a feature matrix.

    Parameters
    ----------
    X : np.ndarray or scalar
        feature array, or a frame count
    sr : number > 0
        sampling rate
    hop_length : int > 0
        samples between successive frames
    n_fft : int or None
        offset for centered frames
    axis : int
        which axis of ``X`` indexes frames

    Returns
    -------
    times : np.ndarray
        time (seconds) of each frame along ``axis``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> X = np.zeros((12, 3))
    >>> lt.times_like(X, sr=22050, hop_length=512).round(3).tolist()
    [0.0, 0.023, 0.046]

    Parity: reference core/convert.py:2073.
    """
    samples = samples_like(X, hop_length=hop_length, n_fft=n_fft, axis=axis)
    return samples_to_time(samples, sr=sr)


def samples_like(
    X: Any,
    *,
    hop_length: int = 512,
    n_fft: Optional[int] = None,
    axis: int = -1,
) -> np.ndarray:
    """Sample indices matching the frame axis of a feature matrix.

    Parameters
    ----------
    X : np.ndarray or scalar
        feature array, or a frame count
    hop_length : int > 0
        samples between successive frames
    n_fft : int or None
        offset for centered frames
    axis : int
        which axis of ``X`` indexes frames

    Returns
    -------
    samples : np.ndarray [dtype=int]
        sample index of each frame along ``axis``

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.samples_like(np.zeros((5, 3)), hop_length=512).tolist()
    [0, 512, 1024]

    Parity: reference core/convert.py:2133.
    """
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
    """Convert MIDI numbers to Hindustani svara names.

    Svara are positions relative to the tonic ``Sa``; the middle octave
    is unmarked, the upper octave takes an over-dot (unicode) or
    apostrophe (ASCII), the lower an under-dot or comma.

    Parameters
    ----------
    midi : number or iterable of numbers
        MIDI number(s)
    Sa : number
        MIDI number of the tonic Sa
    abbr : bool
        single-letter abbreviations (``'S'``, ``'r'``, ...)
    octave : bool
        mark upper/lower octaves
    unicode : bool
        use combining dots instead of ASCII markers

    Returns
    -------
    svara : str or np.ndarray of str
        svara name(s)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> str(lt.midi_to_svara_h(60, Sa=60, octave=False))
    'S'
    >>> str(lt.midi_to_svara_h(67, Sa=60, octave=False))
    'P'

    Parity: reference core/convert.py:2211.
    """
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

    steps = int(np.round(midi - Sa))
    name = _SVARA_MAP_H[steps % 12]
    if abbr:
        name = name[0]
    return _mark_svara_octave(name, steps, octave, unicode)


def hz_to_svara_h(
    frequencies: Any,
    *,
    Sa: float,
    abbr: bool = True,
    octave: bool = True,
    unicode: bool = True,
):
    """Convert frequencies (Hz) to Hindustani svara names.

    Parameters
    ----------
    frequencies : number > 0 or np.ndarray
        frequency value(s) in Hz
    Sa : number > 0
        frequency of the tonic Sa in Hz
    abbr, octave, unicode : bool
        formatting controls, as in :func:`midi_to_svara_h`

    Returns
    -------
    svara : str or np.ndarray of str
        svara name(s)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> str(lt.hz_to_svara_h(330, Sa=220, octave=False))
    'P'

    Parity: reference core/convert.py:2348.
    """
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
    """Convert spelled note names to Hindustani svara names.

    Parameters
    ----------
    notes : str or iterable of str
        spelled note(s), e.g. ``'G4'``
    Sa : str
        spelled note of the tonic Sa, e.g. ``'C4'``
    abbr, octave, unicode : bool
        formatting controls, as in :func:`midi_to_svara_h`

    Returns
    -------
    svara : str or np.ndarray of str
        svara name(s)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> str(lt.note_to_svara_h('G4', Sa='C4', octave=False))
    'P'

    Parity: reference core/convert.py:2429.
    """
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
    """Convert MIDI numbers to Carnatic svara names.

    Svara are positions relative to the tonic ``Sa``; the middle octave
    is unmarked, the upper octave takes an over-dot (unicode) or
    apostrophe (ASCII), the lower an under-dot or comma.

    The spelling of each scale degree depends on the melakarta raga.

    Parameters
    ----------
    midi : number or iterable of numbers
        MIDI number(s)
    Sa : number
        MIDI number of the tonic Sa
    mela : str or int
        melakarta raga name or index (1-72)
    abbr, octave, unicode : bool
        formatting controls, as in :func:`midi_to_svara_h`

    Returns
    -------
    svara : str or np.ndarray of str
        svara name(s)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> str(lt.midi_to_svara_c(60, Sa=60, mela=29, octave=False))
    'S'

    Parity: reference core/convert.py:2515.
    """
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

    steps = int(np.round(midi - Sa))
    name = mela_to_svara(mela, abbr=abbr, unicode=unicode)[steps % 12]
    return _mark_svara_octave(name, steps, octave, unicode)


def _mark_svara_octave(name: str, steps: int, octave: bool,
                       unicode: bool) -> str:
    """Decorate a svara name with its octave register: an overdot
    (or trailing apostrophe) one octave above Sa, an underdot (or
    trailing comma) in the octave below."""
    if not octave:
        return name
    if 12 <= steps < 24:
        mark, suffix = "\u0307", "'"
    elif -12 <= steps < 0:
        mark, suffix = "\u0323", ","
    else:
        return name
    return (name[0] + mark + name[1:]) if unicode else name + suffix


def hz_to_svara_c(
    frequencies: Any,
    *,
    Sa: float,
    mela: Any,
    abbr: bool = True,
    octave: bool = True,
    unicode: bool = True,
):
    """Convert frequencies (Hz) to Carnatic svara names.

    Parameters
    ----------
    frequencies : number > 0 or np.ndarray
        frequency value(s) in Hz
    Sa : number > 0
        frequency of the tonic Sa in Hz
    mela : str or int
        melakarta raga name or index (1-72)
    abbr, octave, unicode : bool
        formatting controls, as in :func:`midi_to_svara_h`

    Returns
    -------
    svara : str or np.ndarray of str
        svara name(s)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> str(lt.hz_to_svara_c(330, Sa=220, mela=29, octave=False))
    'P'

    Parity: reference core/convert.py:2614.
    """
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
    """Convert spelled note names to Carnatic svara names.

    Parameters
    ----------
    notes : str or iterable of str
        spelled note(s)
    Sa : str
        spelled note of the tonic Sa
    mela : str or int
        melakarta raga name or index (1-72)
    abbr, octave, unicode : bool
        formatting controls, as in :func:`midi_to_svara_h`

    Returns
    -------
    svara : str or np.ndarray of str
        svara name(s)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> str(lt.note_to_svara_c('G4', Sa='C4', mela=29, octave=False))
    'P'

    Parity: reference core/convert.py:2707.
    """
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

    The Functional Just System names a frequency by its interval ratio
    to a unison pitch, annotating prime factors above 3 as superscript
    (otonal) or subscript (utonal) commas.

    Parameters
    ----------
    frequencies : number > 0 or np.ndarray
        frequency value(s) in Hz
    fmin : float or None
        unison frequency; defaults to the minimum of ``frequencies``
    unison : str or None
        unison note name; inferred from ``fmin`` when None
    unicode : bool
        use superscript/subscript digits in the annotations

    Returns
    -------
    notes : str or np.ndarray of str
        FJS name(s)

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> str(lt.hz_to_fjs(440 * 3 / 2, fmin=440, unicode=False))
    'E'

    Parity: reference core/convert.py:2793.
    """
    from .notation import interval_to_fjs

    base = np.min(frequencies) if fmin is None else fmin
    ratios = (
        frequencies / base if np.isscalar(frequencies)
        else np.asarray(frequencies) / base
    )
    root = (
        hz_to_note(base, octave=False, unicode=False)
        if unison is None else unison
    )
    return interval_to_fjs(ratios, unison=root, unicode=unicode)
