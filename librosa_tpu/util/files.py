"""File and example-data utilities.

The reference fetches example recordings from a remote registry via pooch
(``librosa/util/files.py:46-109``) with a local cache under
``LIBROSA_DATA_DIR``.  This environment has no network egress, so ``example``
resolves only against a local data directory; the registry of track names is
reproduced so ``list_examples`` works offline.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

from .exceptions import ParameterError

__all__ = ["example", "ex", "list_examples", "example_info", "find_files", "cite"]


# Track-name → description registry (mirrors the reference index.json keys,
# util/example_data/index.json)
_EXAMPLES = {
    "brahms": "Brahms - Hungarian Dance #5",
    "choice": "Admiral Bob - Choice (drum+bass)",
    "fishin": "Karissa Hobbs - Let's Go Fishin'",
    "humpback": "Knuckles the humpback whale",
    "libri1": "LibriSpeech sample 1",
    "libri2": "LibriSpeech sample 2",
    "libri3": "LibriSpeech sample 3",
    "nutcracker": "Tchaikovsky - Dance of the Sugar Plum Fairy",
    "pibble": "Pibble the dog",
    "robin": "Robin bird song",
    "sweetwaltz": "Setuniman - Sweet Waltz",
    "trumpet": "Mihai Sorohan - Trumpet loop",
    "vibeace": "Kevin MacLeod - Vibe Ace",
    "pistachio": "The Piano Lady - Pistachio Ice Cream Ragtime",
}


def _data_dir() -> str:
    return os.environ.get(
        "LIBROSA_DATA_DIR", os.path.join(os.path.expanduser("~"), "librosa_tpu_data")
    )


def example(key: str, *, hq: bool = False) -> str:
    """Retrieve the path to a local copy of a named example recording.

    This build runs offline: instead of fetching from the remote data
    registry (the reference uses pooch, ``util/files.py:55``), the file
    is looked up under ``LIBROSA_DATA_DIR``; a missing file raises with
    guidance on where to place it.

    Parameters
    ----------
    key : str
        example identifier (see :func:`list_examples`)
    hq : bool
        prefer the high-quality variant when available

    Returns
    -------
    path : str
        local filesystem path to the recording

    Raises
    ------
    ParameterError
        for unknown keys, or when the file is not present locally

    See Also
    --------
    list_examples, librosa_tpu.loadx
    """
    if key not in _EXAMPLES:
        raise ParameterError(f"Unknown example key: {key}")
    ext = ".hq.ogg" if hq else ".ogg"
    candidates = glob.glob(os.path.join(_data_dir(), f"*{key}*"))
    for c in candidates:
        if c.endswith(ext) or c.endswith(".ogg") or c.endswith(".wav"):
            return c
    raise ParameterError(
        f"Example '{key}' not found locally. This build has no network access; "
        f"place the file under LIBROSA_DATA_DIR ({_data_dir()})."
    )


#: Alias for example
ex = example


def list_examples() -> None:
    """Print the registry of built-in example recording keys.

    Each printed key (e.g. ``trumpet``, ``brahms``) can be passed to
    :func:`librosa_tpu.example` / :func:`librosa_tpu.ex` to obtain a
    local path, or to :func:`librosa_tpu.loadx` to load the audio
    directly.  This environment is offline, so the registry maps keys to
    locally synthesized fixtures rather than downloads; the key set and
    the print format match the reference's remote registry.

    Returns
    -------
    None
        keys and descriptions print to stdout

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.util.list_examples()          # doctest: +ELLIPSIS
    AVAILABLE EXAMPLES
    ...

    Parity: reference util/files.py:116.
    """
    print("AVAILABLE EXAMPLES")
    print("-" * 68)
    for key in sorted(_EXAMPLES):
        print(f"{key:10}\t{_EXAMPLES[key]}")


def example_info(key: str) -> None:
    """Print the description/licensing line for one example recording.

    Parameters
    ----------
    key : str
        example track key

    Returns
    -------
    None
        the metadata prints to stdout

    Raises
    ------
    ParameterError
        for an unknown key

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.util.example_info('trumpet')  # doctest: +ELLIPSIS
    trumpet...

    Parity: reference util/files.py:138.
    """
    if key not in _EXAMPLES:
        raise ParameterError(f"Unknown example key: {key}")
    print(f"{key:10}\t{_EXAMPLES[key]}")


def find_files(
    directory: str,
    *,
    ext: Optional[List[str]] = None,
    recurse: bool = True,
    case_sensitive: bool = False,
    limit: Optional[int] = None,
    offset: int = 0,
) -> List[str]:
    """Collect the sorted audio files under a directory.

    Parameters
    ----------
    directory : str
        root path to search
    ext : list of str or None
        extensions to accept (default: aac, au, flac, m4a, mp3, ogg, wav)
    recurse : bool
        descend into subdirectories
    case_sensitive : bool
        match extensions case-sensitively
    limit : int or None
        return at most this many paths
    offset : int
        skip this many paths from the start (negative counts from end)

    Returns
    -------
    files : list of str
        sorted absolute paths

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> wavs = lt.util.find_files('.', ext=['wav'])   # doctest: +SKIP

    Parity: reference util/files.py:174.
    """
    if ext is None:
        wanted = {"aac", "au", "flac", "m4a", "mp3", "ogg", "wav"}
    elif isinstance(ext, str):
        wanted = {ext}
    else:
        wanted = set(ext)
    if not case_sensitive:
        wanted = {e.lower() for e in wanted}

    def _accept(name: str) -> bool:
        _, dot, tail = name.rpartition(os.path.extsep)
        if not dot:
            return False
        return (tail if case_sensitive else tail.lower()) in wanted

    root = os.path.abspath(os.path.expanduser(directory))
    hits = []
    if recurse:
        for dirpath, _dirnames, filenames in os.walk(root):
            hits.extend(
                os.path.join(dirpath, f) for f in filenames if _accept(f)
            )
    else:
        with os.scandir(root) as entries:
            hits.extend(
                e.path for e in entries if e.is_file() and _accept(e.name)
            )

    hits.sort()
    window = hits[offset:]
    return window[:limit] if limit is not None else window


# Known release DOIs (the reference fetches version_index.msgpack over the
# network; this offline build embeds the subset it can vouch for and falls
# back to the all-versions concept DOI).
_CITE_INDEX = {
    "0.10.0": "10.5281/zenodo.7746972",
    "0.10.1": "10.5281/zenodo.8252662",
    "0.10.2": "10.5281/zenodo.11192913",
}
_CONCEPT_DOI = "10.5281/zenodo.591533"


def cite(version: Optional[str] = None) -> str:
    """Retrieve the citation DOI for a release of this library.

    Parameters
    ----------
    version : str or None
        release version to cite.  ``None`` returns the concept DOI
        covering all releases (this offline build cannot fetch the full
        per-release index the reference downloads, ``util/files.py:290``)

    Returns
    -------
    doi : str
        a ``https://doi.org/...`` citation URL

    Raises
    ------
    ParameterError
        for development ("dev") or unknown release versions — matching
        the reference's failure semantics

    Examples
    --------
    >>> import librosa_tpu as lt
    >>> lt.cite().startswith('https://doi.org/')
    True
    """
    if version is None:
        doi = _CONCEPT_DOI
    else:
        doi = _CITE_INDEX.get(version)
        if doi is None:
            hint = (
                "development builds have no DOI until they are released"
                if "dev" in version
                else "no release with that number is in the embedded index"
            )
            raise ParameterError(
                f"No citation DOI for version {version!r}: {hint}"
            )
    return f"https://doi.org/{doi}"
