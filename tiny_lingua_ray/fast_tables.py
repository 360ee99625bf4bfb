"""Vectorized per-codepoint tables for batch processing.

Numpy lookup tables over the full codepoint range (built lazily once per
process, ~1 MB each) enabling fully-vectorized script / letter / char-class
classification of whole Arrow batches:

    cps = np.frombuffer(text.encode('utf-32-le'), dtype=np.uint32)
    scripts = SCRIPT_ID_TABLE[cps]            # one uint8 per char

Script ids index into ``SCRIPT_NAMES`` (0 = not one of the 18 scripts).
"""

from __future__ import annotations

import sys
import unicodedata

import numpy as np

from tiny_lingua_ray.languages import (
    CHARS_TO_LANGUAGES_MAPPING,
    LANGUAGES,
)
from tiny_lingua_ray.unicode_tables import _SCRIPT_RANGES

_MAX_CP = sys.maxunicode + 1

SCRIPT_NAMES: tuple[str, ...] = ("NONE",) + tuple(
    sorted({r[2] for r in _SCRIPT_RANGES})
)
SCRIPT_ID: dict[str, int] = {s: i for i, s in enumerate(SCRIPT_NAMES)}

_script_table: np.ndarray | None = None
_letter_table: np.ndarray | None = None
_special_table: np.ndarray | None = None

# Disk cache: building letter_table scans 1.1M codepoints through
# unicodedata (seconds); every Ray actor pays it. Cache once per machine.
_CACHE_FILE = "/tmp/tlr_models/unicode_tables_v1.npz"


def _load_cache() -> dict | None:
    import os

    if os.path.exists(_CACHE_FILE):
        try:
            return dict(np.load(_CACHE_FILE, allow_pickle=False))
        except (OSError, ValueError):
            return None
    return None


def _save_cache(**arrays) -> None:
    import os

    os.makedirs(os.path.dirname(_CACHE_FILE), exist_ok=True)
    tmp = f"{_CACHE_FILE}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, _CACHE_FILE)


def script_id_table() -> np.ndarray:
    """uint8[0x110000]: codepoint -> script id (0 = none)."""
    global _script_table
    if _script_table is None:
        t = np.zeros(_MAX_CP, dtype=np.uint8)
        for start, end, name in _SCRIPT_RANGES:
            t[start : end + 1] = SCRIPT_ID[name]
        _script_table = t
    return _script_table


def letter_table() -> np.ndarray:
    """bool[0x110000]: codepoint -> Unicode category L*."""
    global _letter_table
    if _letter_table is None:
        cached = _load_cache()
        if cached is not None and "letter" in cached:
            _letter_table = cached["letter"]
            return _letter_table
        t = np.zeros(_MAX_CP, dtype=bool)
        cat = unicodedata.category
        for cp in range(_MAX_CP):
            if cat(chr(cp)).startswith("L"):
                t[cp] = True
        _letter_table = t
        _save_cache(letter=t)
    return _letter_table


def rule_special_table() -> np.ndarray:
    """bool[0x110000]: chars that force the exact per-row rule engine.

    True for: any char in CHARS_TO_LANGUAGES_MAPPING, any language's
    uniqueCharacters, and any letter whose script is not LATIN/NONE.
    A row with NO special chars takes the vectorized all-Latin fast path:
    rule detection yields 'unknown' and rule filtering yields all
    Latin-script languages (see stages/langid.py fast path proof).
    """
    global _special_table
    if _special_table is None:
        t = np.zeros(_MAX_CP, dtype=bool)
        st = script_id_table()
        lt = letter_table()
        latin = SCRIPT_ID["LATIN"]
        nonlatin_scripted = (st != 0) & (st != latin)
        t |= nonlatin_scripted
        for ch in CHARS_TO_LANGUAGES_MAPPING:
            t[ord(ch)] = True
        for li in LANGUAGES:
            if li.unique_chars:
                for ch in li.unique_chars:
                    t[ord(ch)] = True
        # letters outside every known script (rare) also need exact rules:
        # they make words vote differently from plain Latin words? No —
        # script None letters behave like non-matching chars in both rule
        # functions, same as the fast path assumes. Keep them fast-path.
        _ = lt
        _special_table = t
    return _special_table


def codepoints(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def batch_codepoints(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate texts -> (codepoint array, offsets[len+1])."""
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    joined = "".join(texts)
    return codepoints(joined), offsets
