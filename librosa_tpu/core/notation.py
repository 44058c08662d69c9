"""Music notation: keys, modes, svara systems, FJS (L2, host Python).

Parity citations refer to ``librosa/core/notation.py``.  The FJS interval
table (prime factorizations of just intervals) is reconstructed on demand
from the interval generators in ``core.intervals`` rather than loaded from a
packaged msgpack cache (reference ``core/intervals.py:22-24``).
"""

from __future__ import annotations

import functools
import re
from collections import Counter
from typing import Any, Dict, Iterable, List, Union

import numpy as np

from ..util.exceptions import ParameterError
from .intervals import plimit_intervals, pythagorean_intervals

__all__ = [
    "key_to_degrees",
    "key_to_notes",
    "mela_to_degrees",
    "mela_to_svara",
    "thaat_to_degrees",
    "list_mela",
    "list_thaat",
    "fifths_to_note",
    "interval_to_fjs",
]

THAAT_MAP = dict(
    bilaval=[0, 2, 4, 5, 7, 9, 11],
    khamaj=[0, 2, 4, 5, 7, 9, 10],
    kafi=[0, 2, 3, 5, 7, 9, 10],
    asavari=[0, 2, 3, 5, 7, 8, 10],
    bhairavi=[0, 1, 3, 5, 7, 8, 10],
    kalyan=[0, 2, 4, 6, 7, 9, 11],
    marva=[0, 1, 4, 6, 7, 9, 11],
    poorvi=[0, 1, 4, 6, 7, 8, 11],
    todi=[0, 1, 3, 6, 7, 8, 11],
    bhairav=[0, 1, 4, 5, 7, 8, 11],
)

# The 72 melakarta ragas, in standard order
_MELA_NAMES = [
    "kanakangi", "ratnangi", "ganamurthi", "vanaspathi", "manavathi",
    "tanarupi", "senavathi", "hanumathodi", "dhenuka", "natakapriya",
    "kokilapriya", "rupavathi", "gayakapriya", "vakulabharanam",
    "mayamalavagaula", "chakravakom", "suryakantham", "hatakambari",
    "jhankaradhwani", "natabhairavi", "keeravani", "kharaharapriya",
    "gaurimanohari", "varunapriya", "mararanjini", "charukesi", "sarasangi",
    "harikambhoji", "dheerasankarabharanam", "naganandini", "yagapriya",
    "ragavardhini", "gangeyabhushani", "vagadheeswari", "sulini",
    "chalanatta", "salagam", "jalarnavam", "jhalavarali", "navaneetham",
    "pavani", "raghupriya", "gavambodhi", "bhavapriya", "subhapanthuvarali",
    "shadvidhamargini", "suvarnangi", "divyamani", "dhavalambari",
    "namanarayani", "kamavardhini", "ramapriya", "gamanasrama",
    "viswambhari", "syamalangi", "shanmukhapriya", "simhendramadhyamam",
    "hemavathi", "dharmavathi", "neethimathi", "kanthamani", "rishabhapriya",
    "latangi", "vachaspathi", "mechakalyani", "chitrambari", "sucharitra",
    "jyotisvarupini", "dhatuvardhini", "nasikabhushani", "kosalam",
    "rasikapriya",
]
MELAKARTA_MAP = {k: i for i, k in enumerate(_MELA_NAMES, 1)}

KEY_RE = re.compile(
    r"^(?P<tonic>[A-Ga-g])"
    r"(?P<accidental>[#♯𝄪b!♭𝄫♮n]*)"
    r":((?P<scale>(maj|min)(or)?)|(?P<mode>(((ion|dor|phryg|lyd|mixolyd|aeol|locr)(ian)?)|phr|mix|aeo|loc)))$"
)

NOTE_RE = re.compile(
    r"^(?P<note>[A-Ga-g])"
    r"(?P<accidental>[#♯𝄪b!♭𝄫♮n]*)"
    r"(?P<octave>[+-]?\d+)?"
    r"(?P<cents>[+-]\d+)?$"
)

MAJOR_DICT = {
    "ion": {"C": "C", "D": "D", "E": "E", "F": "F", "G": "G", "A": "A", "B": "B"},
    "dor": {"C": "B♭", "D": "C", "E": "D", "F": "E♭", "G": "F", "A": "G", "B": "A"},
    "phr": {"C": "A♭", "D": "B♭", "E": "C", "F": "D♭", "G": "E♭", "A": "F", "B": "G"},
    "lyd": {"C": "G", "D": "A", "E": "B", "F": "C", "G": "D", "A": "E", "B": "F♯"},
    "mix": {"C": "F", "D": "G", "E": "A", "F": "B♭", "G": "C", "A": "D", "B": "E"},
    "aeo": {"C": "E♭", "D": "F", "E": "G", "F": "A♭", "G": "B♭", "A": "C", "B": "D"},
    "loc": {"C": "D♭", "D": "E♭", "E": "F", "F": "G♭", "G": "A♭", "A": "B♭", "B": "C"},
}

OFFSET_DICT = {"ion": 0, "dor": 1, "phr": 2, "lyd": 3, "mix": 4, "aeo": 5, "loc": 6}

ACC_MAP = {
    "#": 1, "♮": 0, "": 0, "n": 0, "b": -1, "!": -1, "♯": 1, "♭": -1,
    "𝄪": 2, "𝄫": -2,
}

SUPER_TRANS = str.maketrans("0123456789", "⁰¹²³⁴⁵⁶⁷⁸⁹")
SUB_TRANS = str.maketrans("0123456789", "₀₁₂₃₄₅₆₇₈₉")

_UNICODE_DOWN = str.maketrans(
    {"♯": "#", "𝄪": "##", "♭": "b", "𝄫": "bb", "♮": "n"}
)


def thaat_to_degrees(thaat: str) -> np.ndarray:
    """Pitch classes (scale degrees) for a Hindustani thaat.

    Parameters
    ----------
    thaat : str
        thaat name (case-insensitive), e.g. ``'bilaval'``, ``'kafi'``,
        ``'bhairavi'`` — see :func:`list_thaat` for the full set

    Returns
    -------
    degrees : np.ndarray [shape=(7,), dtype=int]
        the seven pitch classes (semitones above Sa) of the thaat

    See Also
    --------
    list_thaat, mela_to_degrees

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.thaat_to_degrees('bilaval')
    array([ 0,  2,  4,  5,  7,  9, 11])

    Parity: reference core/notation.py:169.
    """
    degrees = THAAT_MAP[thaat.lower()]
    return np.array(degrees)


# The melakarta system enumerates its Ri/Ga (and Dha/Ni) choices as the six
# 2-element subsets of four consecutive semitone slots, in lexicographic
# order.  Index arithmetic below decodes a mela number into those subsets.
_MELA_PAIRS = [(a, b) for a in range(4) for b in range(a + 1, 4)]


def mela_to_degrees(mela: Union[str, int]) -> np.ndarray:
    """Pitch classes (scale degrees) for a Carnatic melakarta raga.

    The 72 melakarta ragas factor into a chakra structure: Ma is perfect
    for melas 1-36 and augmented for 37-72, while the Ri/Ga and Dha/Ni
    pairs each cycle through the six 2-element subsets of four
    consecutive semitone slots.

    Parameters
    ----------
    mela : str or int in [1, 72]
        melakarta name (case-insensitive) or index —
        see :func:`list_mela`

    Returns
    -------
    degrees : np.ndarray [shape=(7,), dtype=int]
        the seven pitch classes (semitones above Sa)

    See Also
    --------
    list_mela, mela_to_svara, thaat_to_degrees

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.mela_to_degrees(1)          # kanakangi
    array([0, 1, 2, 5, 7, 8, 9])
    >>> lt.mela_to_degrees('harikambhoji')
    array([ 0,  2,  4,  5,  7,  9, 10])

    Parity: reference core/notation.py:200.
    """
    if isinstance(mela, str):
        index = MELAKARTA_MAP[mela.lower()] - 1
    elif 0 < mela <= 72:
        index = int(mela) - 1
    else:
        raise ParameterError(
            f"melakarta index {mela} is outside the system (1..72)"
        )

    # mela = 36 * chakra_half + 6 * lower_pair + upper_pair
    ri, ga = _MELA_PAIRS[index % 36 // 6]
    dha, ni = _MELA_PAIRS[index % 6]
    ma = 5 + index // 36  # suddha (melas 1-36) vs prati (37-72) madhyama
    return np.array([0, 1 + ri, 1 + ga, ma, 7, 8 + dha, 8 + ni])


def mela_to_svara(
    mela: Union[str, int], *, abbr: bool = True, unicode: bool = True
) -> List[str]:
    """Svara names for all 12 chromatic degrees under a given mela.

    Each chromatic pitch class gets its svara spelling in the chosen
    melakarta raga: degrees in the raga use their functional name
    (Ri/Ga/Dha/Ni variants follow the mela's structure), the rest take
    the nearest enharmonic spelling.

    Parameters
    ----------
    mela : str or int in [1, 72]
        melakarta name or index
    abbr : bool
        abbreviate names (``'R₁'`` instead of ``'ri₁'``)
    unicode : bool
        use unicode subscripts in the names

    Returns
    -------
    svara : list of str, length 12
        svara names for pitch classes 0-11 above Sa

    See Also
    --------
    mela_to_degrees, key_to_notes

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.mela_to_svara(1, unicode=False)[:4]
    ['S', 'R1', 'G1', 'G2']

    Parity: reference core/notation.py:299.
    """
    if isinstance(mela, str):
        index = MELAKARTA_MAP[mela.lower()] - 1
    elif 0 < mela <= 72:
        index = int(mela) - 1
    else:
        raise ParameterError(
            f"melakarta index {mela} is outside the system (1..72)"
        )

    # The four ambiguous chromatic slots are decided by which subset of
    # {Ri, Ga} x {Dha, Ni} slots the mela's pair structure occupies
    # (see mela_to_degrees for the pair decoding).
    ri, ga = _MELA_PAIRS[index % 36 // 6]
    dha, ni = _MELA_PAIRS[index % 6]
    names = {
        0: "Sa", 1: "Ri₁", 4: "Ga₃", 5: "Ma₁", 6: "Ma₂", 7: "Pa",
        8: "Dha₁", 11: "Ni₃",
        # slot 2 is Ga₁ only in the (Ri₁, Ga₁) chakras; otherwise Ri₂
        2: "Ga₁" if (ri, ga) == (0, 1) else "Ri₂",
        # slot 3 is Ri₃ only in the (Ri₃, Ga₃) chakras; otherwise Ga₂
        3: "Ri₃" if (ri, ga) == (2, 3) else "Ga₂",
        9: "Ni₁" if (dha, ni) == (0, 1) else "Dha₂",
        10: "Dha₃" if (dha, ni) == (2, 3) else "Ni₂",
    }

    def _style(name: str) -> str:
        if abbr:
            # initial letter, keeping any subscript variant digit
            name = name[0] + (name[-1] if name[-1] in "₁₂₃" else "")
        if not unicode:
            # subscript digits map linearly onto ASCII digits
            name = "".join(
                chr(ord(c) - ord("₀") + ord("0")) if "₀" <= c <= "₉" else c
                for c in name
            )
        return name

    return [_style(names[pc]) for pc in range(12)]


def list_mela() -> Dict[str, int]:
    """Map every Carnatic melakarta raga name to its index.

    Returns
    -------
    mela_map : dict [str → int in [1, 72]]
        raga name (lowercase) → melakarta number

    See Also
    --------
    mela_to_degrees, mela_to_svara

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.list_mela()['kanakangi']
    1

    Parity: reference core/notation.py:444.
    """
    return dict(MELAKARTA_MAP)


def list_thaat() -> List[str]:
    """List the Hindustani thaats understood by :func:`thaat_to_degrees`.

    A thaat is one of the ten parent scales of Hindustani classical
    music (bilaval, khamaj, kafi, asavari, bhairavi, kalyan, marva,
    poorvi, todi, bhairav); any of these names is a valid ``thaat``
    argument to :func:`thaat_to_degrees` and to the svara display
    formatters.

    Returns
    -------
    thaats : list of str
        the ten thaat names

    See Also
    --------
    thaat_to_degrees

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> 'bhairavi' in lt.list_thaat()
    True

    Parity: reference core/notation.py:477.
    """
    return [*THAAT_MAP]


# Naturals laid out on a 12-semitone ruler: the string index of each
# letter IS its pitch class (dots mark the black keys).
_SEMITONE_RULER = "C.D.EF.G.A.B"


def _note_to_degree(key: Any) -> Any:
    """Pitch class of a spelled note (letter + accidental string)."""
    if not isinstance(key, str):
        return np.array([_note_to_degree(n) for n in key])
    parsed = NOTE_RE.match(key)
    if parsed is None:
        raise ParameterError(f"Cannot parse note name: {key!r}")
    natural = _SEMITONE_RULER.index(parsed.group("note").upper())
    chroma = natural + sum(ACC_MAP[c] for c in parsed.group("accidental"))
    return chroma % 12


def _simplify_note(key: Any, additional_acc: str = "", unicode: bool = True):
    if not isinstance(key, str):
        return np.array(
            [_simplify_note(n + additional_acc, unicode=unicode) for n in key]
        )
    match = NOTE_RE.match(key + additional_acc)
    if not match:
        raise ParameterError(f"Improper key format: {key:s}")
    letter = match.group("note").upper()
    accidental = match.group("accidental")
    counter = Counter(accidental)
    offset = sum(ACC_MAP[acc] * counter[acc] for acc in ACC_MAP)

    simplified = letter
    if offset >= 0:
        simplified += "♯" * (offset % 2) + "𝄪" * (offset // 2)
    else:
        simplified += "♭" * (offset % 2) + "𝄫" * (abs(offset) // 2)
    if not unicode:
        simplified = simplified.translate(_UNICODE_DOWN)
    return simplified


def _mode_to_key(signature: str, unicode: bool = True) -> str:
    match = KEY_RE.match(signature)
    if not match:
        raise ParameterError(f"Improper format: {signature:s}")

    if match.group("scale") or not match.group("mode"):
        return _simplify_note(
            match.group("tonic").upper() + match.group("accidental"),
            unicode=unicode,
        ) + (":" + match.group("scale") if match.group("scale") else "")

    mode = match.group("mode").lower()[:3]
    tonic = MAJOR_DICT[mode][match.group("tonic").upper()]
    return (
        _simplify_note(tonic + match.group("accidental"), unicode=unicode)
        + ":maj"
    )


# Letters in line-of-fifths order; LETTER k sits at fifths-position k-1
# (F=-1, C=0, G=1, D=2, A=3, E=4, B=5), and adding a sharp moves a
# spelling +7 positions (a flat, -7).
_FIFTHS_LETTERS = "FCGDAEB"
_FIFTHS_POS = {note: k - 1 for k, note in enumerate(_FIFTHS_LETTERS)}


def _spell_fifths(pos: int) -> str:
    """Note name at a line-of-fifths position (…♭♭, ♭, natural, ♯, 𝄪…)."""
    letter = _FIFTHS_LETTERS[(pos + 1) % 7]
    n_acc = (pos + 1) // 7
    if n_acc >= 0:
        return letter + "♯" * (n_acc % 2) + "𝄪" * (n_acc // 2)
    return letter + "♭" * (-n_acc % 2) + "𝄫" * (-n_acc // 2)


def key_to_notes(
    key: str, *, unicode: bool = True, natural: bool = False
) -> List[str]:
    """Spelling of the 12 pitch classes under a given key.

    Behavior parity with ``librosa/core/notation.py:626``, derived from a
    line-of-fifths model instead of the reference's correction tables and
    multi-accidental recursion: each spelling is a position on the line of
    fifths, the pitch class at position p is ``7p mod 12``, and a key selects
    a contiguous window of 12 positions.  The window is anchored by the key
    signature (tonic position for major, 3 fifths down for minor), clamped to
    the plain chromatic range for signatures under 6 accidentals, and shifted
    a full cycle (±7) for every tonic accidental beyond the first — which is
    exactly what the reference's recursive note-simplification produces.
    """
    match = KEY_RE.match(key)
    if not match:
        raise ParameterError(f"Improper key format: {key:s}")

    if match.group("mode") or not match.group("scale"):
        return key_to_notes(_mode_to_key(key), unicode=unicode, natural=natural)

    tonic = match.group("tonic").upper()
    offset = sum(ACC_MAP[acc] for acc in match.group("accidental"))
    minor = match.group("scale")[:3].lower() != "maj"

    # Signature of the key with a single tonic accidental (or none); extra
    # tonic accidentals displace the whole window by 7 fifths each.
    direction = (offset > 0) - (offset < 0)
    signature = _FIFTHS_POS[tonic] + 7 * direction - 3 * minor

    # A sharpened (flattened) tonic forces sharps (flats); a natural tonic
    # picks whichever side needs fewer accidentals, sharps winning ties.
    if direction != 0:
        use_sharps = direction > 0
    else:
        use_sharps = signature % 12 < 6

    if use_sharps:
        window_lo = max(signature - 6, -1)
    else:
        window_lo = min(signature, -5) - 1
    window_lo += 7 * direction * (abs(offset) - 1 if offset else 0)

    notes = [""] * 12
    for pos in range(window_lo, window_lo + 12):
        notes[7 * pos % 12] = _spell_fifths(pos)

    if natural:
        in_scale = set(key_to_degrees(key))
        notes = [
            n + "♮" if len(n) == 1 and _note_to_degree(n) not in in_scale else n
            for n in notes
        ]

    if not unicode:
        notes = [n.translate(_UNICODE_DOWN) for n in notes]
    return notes


def key_to_degrees(key: str) -> np.ndarray:
    """Pitch classes belonging to a major or minor key.

    Parameters
    ----------
    key : str
        key specification ``'<tonic>:<maj|min>'``, e.g. ``'C:maj'``,
        ``'F#:min'``, with unicode accidentals accepted

    Returns
    -------
    degrees : np.ndarray [shape=(7,), dtype=int]
        the seven diatonic pitch classes of the key

    See Also
    --------
    key_to_notes

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.key_to_degrees('C:maj')
    array([ 0,  2,  4,  5,  7,  9, 11])
    >>> lt.key_to_degrees('A:min')
    array([ 9, 11,  0,  2,  4,  5,  7])

    Parity: reference core/notation.py:872.
    """
    parsed = KEY_RE.match(key)
    if parsed is None:
        raise ParameterError(f"Cannot parse key specification: {key!r}")

    if parsed.group("mode") or not parsed.group("scale"):
        # a church mode is its parent major scale rotated to a new tonic
        rotation = OFFSET_DICT[parsed.group("mode")[:3]]
        return np.roll(key_to_degrees(_mode_to_key(key)), -rotation)

    # Whole/half-step walk from the tonic (W-W-H-W-W-W for major,
    # W-H-W-W-H-W for natural minor); the 7th degree closes the octave.
    if parsed.group("scale")[:3].lower() == "maj":
        walk = (2, 2, 1, 2, 2, 2)
    else:
        walk = (2, 1, 2, 2, 1, 2)
    start = _note_to_degree(
        parsed.group("tonic").upper() + parsed.group("accidental")
    )
    degrees = start + np.concatenate(([0], np.cumsum(walk)))
    return degrees % 12


def fifths_to_note(*, unison: str, fifths: int, unicode: bool = True) -> str:
    """Spell the note that lies a number of perfect fifths from a unison.

    Walks the circle of fifths from ``unison``, accumulating sharps or
    flats as the walk wraps (used by the FJS notation system to spell
    Pythagorean intervals).

    Parameters
    ----------
    unison : str
        starting note name (letter + optional accidentals)
    fifths : int
        number of perfect fifths to move (negative = flatward)
    unicode : bool
        spell accidentals with unicode (``'♯'``) or ASCII (``'#'``)

    Returns
    -------
    note : str
        the transposed note name

    See Also
    --------
    interval_to_fjs

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.fifths_to_note(unison='C', fifths=2, unicode=False)
    'D'
    >>> lt.fifths_to_note(unison='C', fifths=7, unicode=False)
    'C#'

    Parity: reference core/notation.py:942.
    """
    parsed = NOTE_RE.match(unison)
    if parsed is None:
        raise ParameterError(f"Cannot parse note name: {unison!r}")

    # Everything is a single line-of-fifths position: the unison letter,
    # plus 7 positions per accidental on it, plus the requested walk.
    pos = (
        _FIFTHS_POS[parsed.group("note").upper()]
        + 7 * sum(ACC_MAP[c] for c in parsed.group("accidental"))
        + fifths
    )
    letter = _FIFTHS_LETTERS[(pos + 1) % 7]
    return letter + _accidental_run((pos + 1) // 7, unicode=unicode)


def _accidental_run(count: int, *, unicode: bool = True) -> str:
    """Render ``count`` sharps (positive) or flats (negative), doubles
    leading: +3 → ``𝄪♯``, -2 → ``𝄫``."""
    if count == 0:
        return ""
    doubles, singles = divmod(abs(count), 2)
    mark = ("𝄪" * doubles + "♯" * singles) if count > 0 else (
        "𝄫" * doubles + "♭" * singles
    )
    return mark if unicode else mark.translate(_UNICODE_DOWN)


# ---------------------------------------------------------------------------
# FJS notation (reference notation.py:1032-1225)
# ---------------------------------------------------------------------------


def _o_fold(d):
    """Fold an interval into [1, 2). Parity: notation.py:1033 (__o_fold)."""
    return d * (2.0 ** -np.floor(np.log2(d)))


def _bo_fold(d):
    """Balanced fold into [√2/2, √2). Parity: notation.py:1046 (__bo_fold)."""
    return d * (2.0 ** -np.round(np.log2(d)))


def _fifth_search(interval, tolerance) -> int:
    """Number of fifths to approximate an interval. Parity: notation.py:1059."""
    radius = abs(np.log2(tolerance))

    def _close(k: int) -> bool:
        # residue of the interval after removing k untempered fifths,
        # balanced-folded so "close to a power of two" means small
        residue = _bo_fold(interval * 3.0 ** (-k))
        return abs(np.log2(residue)) <= radius

    # spiral outward: 0, +1, -1, +2, -2, ... (positive side first)
    hit = next(
        (k for step in range(32) for k in (step, -step) if _close(k)),
        None,
    )
    return 31 if hit is None else hit


@functools.lru_cache(maxsize=4)
def _interval_table(level: int) -> Dict[float, Dict[int, int]]:
    """Interval → prime-factorization lookup, reconstructed on demand.

    Mirrors the reference's packaged table built by
    ``scripts/create_intervals.py``: pythagorean + p-limit systems at 72
    bins/octave, plus a 23-limit system at 190 bins for ``level >= 1``.
    """
    table: Dict[float, Dict[int, int]] = {}

    def add(factor_list, primes):
        for factors in factor_list:
            ratio = 1.0
            for p, k in factors.items():
                ratio *= float(p) ** k
            key = float(np.around(_o_fold(ratio), decimals=6))
            table.setdefault(key, factors)

    add(pythagorean_intervals(bins_per_octave=72, sort=False, return_factors=True), [3])
    add(plimit_intervals(primes=[3], bins_per_octave=72, sort=False, return_factors=True), [3])
    add(plimit_intervals(primes=[3, 5], bins_per_octave=72, sort=False, return_factors=True), [3, 5])
    add(plimit_intervals(primes=[3, 5, 7], bins_per_octave=72, sort=False, return_factors=True), [3, 5, 7])
    if level >= 1:
        add(
            plimit_intervals(
                primes=[3, 5, 7, 11, 13, 17, 19, 23], bins_per_octave=190,
                sort=False, return_factors=True,
            ),
            [3, 5, 7, 11, 13, 17, 19, 23],
        )
    return table


def interval_to_fjs(
    interval: Any,
    *,
    unison: str = "C",
    tolerance: float = 65.0 / 63,
    unicode: bool = True,
):
    """Convert a just-intonation interval to FJS notation.

    The Functional Just System spells a frequency ratio as a Pythagorean
    note name (a walk on the circle of fifths from ``unison``) decorated
    with otonal/utonal prime commas, e.g. ``5/4`` above C is ``E⁵``.

    Parameters
    ----------
    interval : float or array of float
        frequency ratio(s) to spell
    unison : str
        note name of the 1/1 reference
    tolerance : float
        radius of tolerance for snapping to a Pythagorean spine note
    unicode : bool
        use superscript/subscript commas (ASCII otherwise)

    Returns
    -------
    name : str or np.ndarray of str
        FJS name(s) of the interval(s)

    See Also
    --------
    fifths_to_note, interval_frequencies

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.interval_to_fjs(5/4, unison='C', unicode=False)
    'E^5'

    Parity: reference core/notation.py:1099.
    """
    if not np.isscalar(interval):
        return np.array(
            [
                interval_to_fjs(
                    i, unison=unison, tolerance=tolerance, unicode=unicode
                )
                for i in np.asarray(interval)
            ]
        )

    if interval <= 0:
        raise ParameterError(
            f"FJS names exist only for positive ratios; got {interval}"
        )

    # Pythagorean spine: the nearest note reachable by untempered fifths.
    spine = fifths_to_note(
        unison=unison,
        fifths=_fifth_search(interval, tolerance),
        unicode=unicode,
    )

    # Prime commas above 3: split the factorization into an over-bar
    # (numerator primes, superscript) and under-bar (denominator primes,
    # subscript) product.
    folded = float(np.around(_o_fold(interval), decimals=6))
    factors = _interval_table(0).get(folded) or _interval_table(1).get(folded)
    if factors is None:
        raise ParameterError(
            f"interval {interval} is not in the just-intonation tables"
        )

    over = under = 1
    for prime, exponent in factors.items():
        if prime <= 3:
            continue
        if exponent > 0:
            over *= prime ** exponent
        else:
            under *= prime ** (-exponent)

    def _comma(value: int, trans, ascii_mark: str) -> str:
        if value <= 1:
            return ""
        text = str(value)
        return text.translate(trans) if unicode else ascii_mark + text

    return (
        spine
        + _comma(over, SUPER_TRANS, "^")
        + _comma(under, SUB_TRANS, "_")
    )
