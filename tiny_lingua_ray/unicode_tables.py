"""Pinned Unicode tables: script ranges, letter test, N/P deletion.

The reference relies on the JVM's Unicode tables
(``Character.UnicodeScript.of`` — api/LanguageDetector.kt:378,474;
``Character.isLetter`` — internal/TestDataLanguageModel.kt:52;
``\\p{N}|\\p{P}`` deletion — internal/Constant.kt:164-166).  We pin our own:

* ``script_of(codepoint)`` over a vendored script-range table covering the
  18 scripts any of the 75 languages uses (ranges from the public Unicode
  Scripts.txt; codepoints outside these ranges return ``None`` which is the
  analogue of "some other script" — the reference only ever *compares*
  scripts against its own language-script sets, so unknown scripts never
  match and behave identically).
* ``is_letter(ch)`` = Unicode general category L* (same definition as
  ``Character.isLetter``), via ``unicodedata.category``.
* ``delete_numbers_and_punct(text)`` = remove category N* and P*
  (Java ``\\p{N}|\\p{P}``), via a lazily-built ``str.translate`` table.
* ``collapse_whitespace`` matches Java's default (ASCII) ``\\s``.
"""

from __future__ import annotations

import re
import sys
import unicodedata
from bisect import bisect_right
from functools import lru_cache

# ---------------------------------------------------------------------------
# Script ranges (start, end inclusive, script name). Vendored from the public
# Unicode Scripts.txt, restricted to the scripts used by the 75 languages.
# Unassigned codepoints inside a block are harmless: they never occur in text.
# ---------------------------------------------------------------------------
_SCRIPT_RANGES: list[tuple[int, int, str]] = [
    # LATIN
    (0x0041, 0x005A, "LATIN"), (0x0061, 0x007A, "LATIN"),
    (0x00AA, 0x00AA, "LATIN"), (0x00BA, 0x00BA, "LATIN"),
    (0x00C0, 0x00D6, "LATIN"), (0x00D8, 0x00F6, "LATIN"),
    (0x00F8, 0x02B8, "LATIN"), (0x02E0, 0x02E4, "LATIN"),
    (0x1D00, 0x1D25, "LATIN"), (0x1D2C, 0x1D5C, "LATIN"),
    (0x1D62, 0x1D65, "LATIN"), (0x1D6B, 0x1D77, "LATIN"),
    (0x1D79, 0x1DBE, "LATIN"), (0x1E00, 0x1EFF, "LATIN"),
    (0x2071, 0x2071, "LATIN"), (0x207F, 0x207F, "LATIN"),
    (0x2090, 0x209C, "LATIN"), (0x212A, 0x212B, "LATIN"),
    (0x2132, 0x2132, "LATIN"), (0x214E, 0x214E, "LATIN"),
    (0x2160, 0x2188, "LATIN"), (0x2C60, 0x2C7F, "LATIN"),
    (0xA722, 0xA787, "LATIN"), (0xA78B, 0xA7FF, "LATIN"),
    (0xAB30, 0xAB5A, "LATIN"), (0xAB5C, 0xAB69, "LATIN"),
    (0xFB00, 0xFB06, "LATIN"), (0xFF21, 0xFF3A, "LATIN"),
    (0xFF41, 0xFF5A, "LATIN"),
    # GREEK
    (0x0370, 0x0373, "GREEK"), (0x0375, 0x0377, "GREEK"),
    (0x037A, 0x037D, "GREEK"), (0x037F, 0x037F, "GREEK"),
    (0x0384, 0x0384, "GREEK"), (0x0386, 0x0386, "GREEK"),
    (0x0388, 0x038A, "GREEK"), (0x038C, 0x038C, "GREEK"),
    (0x038E, 0x03A1, "GREEK"), (0x03A3, 0x03E1, "GREEK"),
    (0x03F0, 0x03FF, "GREEK"), (0x1D26, 0x1D2A, "GREEK"),
    (0x1D5D, 0x1D61, "GREEK"), (0x1D66, 0x1D6A, "GREEK"),
    (0x1DBF, 0x1DBF, "GREEK"), (0x1F00, 0x1F15, "GREEK"),
    (0x1F18, 0x1F1D, "GREEK"), (0x1F20, 0x1F45, "GREEK"),
    (0x1F48, 0x1F4D, "GREEK"), (0x1F50, 0x1F57, "GREEK"),
    (0x1F59, 0x1F59, "GREEK"), (0x1F5B, 0x1F5B, "GREEK"),
    (0x1F5D, 0x1F5D, "GREEK"), (0x1F5F, 0x1F7D, "GREEK"),
    (0x1F80, 0x1FB4, "GREEK"), (0x1FB6, 0x1FC4, "GREEK"),
    (0x1FC6, 0x1FD3, "GREEK"), (0x1FD6, 0x1FDB, "GREEK"),
    (0x1FDD, 0x1FEF, "GREEK"), (0x1FF2, 0x1FF4, "GREEK"),
    (0x1FF6, 0x1FFE, "GREEK"), (0x2126, 0x2126, "GREEK"),
    (0xAB65, 0xAB65, "GREEK"),
    # CYRILLIC
    (0x0400, 0x0484, "CYRILLIC"), (0x0487, 0x052F, "CYRILLIC"),
    (0x1C80, 0x1C88, "CYRILLIC"), (0x1D2B, 0x1D2B, "CYRILLIC"),
    (0x1D78, 0x1D78, "CYRILLIC"), (0x2DE0, 0x2DFF, "CYRILLIC"),
    (0xA640, 0xA69F, "CYRILLIC"), (0xFE2E, 0xFE2F, "CYRILLIC"),
    # ARMENIAN
    (0x0531, 0x0556, "ARMENIAN"), (0x0559, 0x058A, "ARMENIAN"),
    (0x058D, 0x058F, "ARMENIAN"), (0xFB13, 0xFB17, "ARMENIAN"),
    # HEBREW
    (0x0591, 0x05C7, "HEBREW"), (0x05D0, 0x05EA, "HEBREW"),
    (0x05EF, 0x05F4, "HEBREW"), (0xFB1D, 0xFB36, "HEBREW"),
    (0xFB38, 0xFB3C, "HEBREW"), (0xFB3E, 0xFB3E, "HEBREW"),
    (0xFB40, 0xFB41, "HEBREW"), (0xFB43, 0xFB44, "HEBREW"),
    (0xFB46, 0xFB4F, "HEBREW"),
    # ARABIC
    (0x0600, 0x0604, "ARABIC"), (0x0606, 0x060B, "ARABIC"),
    (0x060D, 0x061A, "ARABIC"), (0x061C, 0x061E, "ARABIC"),
    (0x0620, 0x063F, "ARABIC"), (0x0641, 0x064A, "ARABIC"),
    (0x0656, 0x066F, "ARABIC"), (0x0671, 0x06DC, "ARABIC"),
    (0x06DE, 0x06FF, "ARABIC"), (0x0750, 0x077F, "ARABIC"),
    (0x08A0, 0x08FF, "ARABIC"), (0xFB50, 0xFBC1, "ARABIC"),
    (0xFBD3, 0xFD3D, "ARABIC"), (0xFD50, 0xFDFD, "ARABIC"),
    (0xFE70, 0xFEFC, "ARABIC"),
    # DEVANAGARI
    (0x0900, 0x0950, "DEVANAGARI"), (0x0953, 0x0963, "DEVANAGARI"),
    (0x0966, 0x097F, "DEVANAGARI"), (0xA8E0, 0xA8FF, "DEVANAGARI"),
    # BENGALI / GURMUKHI / GUJARATI / TAMIL / TELUGU (whole blocks)
    (0x0980, 0x09FF, "BENGALI"),
    (0x0A00, 0x0A7F, "GURMUKHI"),
    (0x0A80, 0x0AFF, "GUJARATI"),
    (0x0B80, 0x0BFF, "TAMIL"),
    (0x0C00, 0x0C7F, "TELUGU"),
    # THAI (0x0E3F baht sign is Common)
    (0x0E01, 0x0E3A, "THAI"), (0x0E40, 0x0E5B, "THAI"),
    # GEORGIAN
    (0x10A0, 0x10C5, "GEORGIAN"), (0x10C7, 0x10C7, "GEORGIAN"),
    (0x10CD, 0x10CD, "GEORGIAN"), (0x10D0, 0x10FA, "GEORGIAN"),
    (0x10FC, 0x10FF, "GEORGIAN"), (0x1C90, 0x1CBF, "GEORGIAN"),
    (0x2D00, 0x2D2F, "GEORGIAN"),
    # HANGUL
    (0x1100, 0x11FF, "HANGUL"), (0x302E, 0x302F, "HANGUL"),
    (0x3131, 0x318E, "HANGUL"), (0x3200, 0x321E, "HANGUL"),
    (0x3260, 0x327E, "HANGUL"), (0xA960, 0xA97C, "HANGUL"),
    (0xAC00, 0xD7A3, "HANGUL"), (0xD7B0, 0xD7C6, "HANGUL"),
    (0xD7CB, 0xD7FB, "HANGUL"), (0xFFA0, 0xFFBE, "HANGUL"),
    (0xFFC2, 0xFFC7, "HANGUL"), (0xFFCA, 0xFFCF, "HANGUL"),
    (0xFFD2, 0xFFD7, "HANGUL"), (0xFFDA, 0xFFDC, "HANGUL"),
    # HIRAGANA / KATAKANA (0x30FB/0x30FC are Common)
    (0x3041, 0x3096, "HIRAGANA"), (0x309D, 0x309F, "HIRAGANA"),
    (0x30A1, 0x30FA, "KATAKANA"), (0x30FD, 0x30FF, "KATAKANA"),
    (0x31F0, 0x31FF, "KATAKANA"), (0xFF66, 0xFF6F, "KATAKANA"),
    (0xFF71, 0xFF9D, "KATAKANA"),
    # HAN
    (0x2E80, 0x2E99, "HAN"), (0x2E9B, 0x2EF3, "HAN"),
    (0x2F00, 0x2FD5, "HAN"), (0x3005, 0x3005, "HAN"),
    (0x3007, 0x3007, "HAN"), (0x3021, 0x3029, "HAN"),
    (0x3038, 0x303B, "HAN"), (0x3400, 0x4DBF, "HAN"),
    (0x4E00, 0x9FFF, "HAN"), (0xF900, 0xFA6D, "HAN"),
    (0xFA70, 0xFAD9, "HAN"), (0x20000, 0x2A6DF, "HAN"),
    (0x2A700, 0x2EBEF, "HAN"), (0x2F800, 0x2FA1D, "HAN"),
    (0x30000, 0x3134A, "HAN"),
]

_SCRIPT_RANGES.sort()
_RANGE_STARTS = [r[0] for r in _SCRIPT_RANGES]
_RANGE_ENDS = [r[1] for r in _SCRIPT_RANGES]
_RANGE_SCRIPTS = [r[2] for r in _SCRIPT_RANGES]


@lru_cache(maxsize=65536)
def script_of(cp: int) -> str | None:
    """Unicode script of a codepoint, or None if not one of our 18 scripts."""
    i = bisect_right(_RANGE_STARTS, cp) - 1
    if i >= 0 and cp <= _RANGE_ENDS[i]:
        return _RANGE_SCRIPTS[i]
    return None


def is_letter(ch: str) -> bool:
    """Java Character.isLetter: Unicode general category L*."""
    return unicodedata.category(ch).startswith("L")


# ---------------------------------------------------------------------------
# \p{N}|\p{P} deletion (cleanUpInputText — api/LanguageDetector.kt:310-318)
# ---------------------------------------------------------------------------
_DELETE_TABLE: dict[int, None] | None = None


def _build_delete_table() -> dict[int, None]:
    # cache the N*/P* codepoint list on disk (full-range unicodedata scans
    # cost seconds and every Ray worker process would pay them)
    import os

    import numpy as np

    cache = "/tmp/tlr_models/np_codepoints_v1.npy"
    if os.path.exists(cache):
        try:
            cps = np.load(cache)
            return dict.fromkeys(cps.tolist())
        except (OSError, ValueError):
            pass
    cps_list = [
        cp
        for cp in range(sys.maxunicode + 1)
        if unicodedata.category(chr(cp))[0] in ("N", "P")
    ]
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = f"{cache}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            np.save(f, np.asarray(cps_list, dtype=np.int64))
        os.replace(tmp, cache)
    except OSError:
        pass
    return dict.fromkeys(cps_list)


def delete_numbers_and_punct(text: str) -> str:
    """Remove every codepoint with Unicode category N* or P*."""
    global _DELETE_TABLE
    if _DELETE_TABLE is None:
        _DELETE_TABLE = _build_delete_table()
    return text.translate(_DELETE_TABLE)


# Java's default \s is ASCII-only: [ \t\n\x0B\f\r]
_JAVA_WS = re.compile(r"[ \t\n\x0B\f\r]+")


def collapse_whitespace(text: str) -> str:
    return _JAVA_WS.sub(" ", text)


def java_trim(text: str) -> str:
    """Java String.trim(): strip leading/trailing chars with code <= U+0020."""
    start, end = 0, len(text)
    while start < end and text[start] <= "\x20":
        start += 1
    while end > start and text[end - 1] <= "\x20":
        end -= 1
    return text[start:end]


def is_logogram(ch: str) -> bool:
    """CharExtensions.kt:31-38: non-whitespace char in a CJK script."""
    if ch.isspace():
        return False
    return script_of(ord(ch)) in _SCRIPTS_WITH_LOGOGRAMS_SET


# Filled from languages.py lazily to avoid a circular import at module load.
from tiny_lingua_ray.languages import SCRIPTS_WITH_LOGOGRAMS as _SWL  # noqa: E402

_SCRIPTS_WITH_LOGOGRAMS_SET = frozenset(_SWL)
