"""Multi-language sectioning (M9 — experimental in the reference too).

Faithful reimplementation of ``detectMultiLanguageOf``:

1. split the text into potential sections at script changes and boundary
   characters (internal/MultiLanguageDetection.kt:169-225; boundary chars
   :40-87), reproducing the reference state machine exactly — including
   its quirks (section ``end`` only advances on the non-split letter
   branch; a script-split seeds the new section's letter count at 1
   before the shared increment, so those sections count one extra — the
   reference's own golden fixtures pin this arithmetic, e.g. the
   "Error Code" section reporting 30 letters for 29);
2. per section: rule-based language detection / filtering, merging
   runs whose single rule language repeats (:254-299);
3. short sections (< 15 reliable letters) merge into the following
   section when the rule-language sets overlap, with a confidence
   cross-check against the previous/next sections (:446-494);
4. final pass merges adjacent sections whose confident languages
   overlap (:499-539), recomputing confidence values over merged text
   (:311-326).

Known divergences (documented): Kotlin indexes UTF-16 units, we index
codepoints (differs only for non-BMP text); letters whose script is
outside the 18 scripts used by the 75 languages map to a common None
script (no split between two such scripts).

Returns ``[{start, end, letters, lang, confidences}]`` where
``confidences`` is the per-section sorted confidence list — the
reference's ``LanguageSection`` shape (api/LanguageDetector.kt:147-170).
"""

from __future__ import annotations

import unicodedata

from tiny_lingua_ray.detector import (
    LinguaDetector,
    detect_language_with_rules,
    filter_languages_by_rules,
    split_words,
)
from tiny_lingua_ray.languages import UNKNOWN
from tiny_lingua_ray.unicode_tables import is_letter, is_logogram, script_of

_MIN_SECTION_LENGTH = 3        # MultiLanguageDetection.kt:171
_MIN_RELIABLE_LETTERS = 15     # :453
_JAPANESE_SCRIPTS = frozenset({"HIRAGANA", "KATAKANA", "HAN"})

# explicit boundary characters (MultiLanguageDetection.kt:40-66); the
# supplementary quote marks U+1F676..78 are excluded — the reference's
# Char-based check cannot see them either (:65)
_BOUNDARY_CHARS = frozenset(
    ":\n\r\x0b\x0c\x85\""
    "«»‘‛“”„‟‹›⹂"
    "⌜⌝❛❜❝❞「」『』"
    "〝〞〟﹁﹂﹃﹄＂＇｢｣"
)
_BOUNDARY_CATEGORIES = frozenset({"Pi", "Pf", "Zl", "Zp"})


def is_potential_language_boundary(ch: str, prev: str, nxt: str) -> bool:
    """MultiLanguageDetection.kt:40-87."""
    if ch in _BOUNDARY_CHARS:
        return True
    if ch == "'" or ch == "’":
        # apostrophe between two letters is not a boundary (:68-73)
        return not (is_letter(prev) and is_letter(nxt))
    return unicodedata.category(ch) in _BOUNDARY_CATEGORIES


def _same_language_script(a: str | None, b: str | None) -> bool:
    """UnicodeScript.belongsToSameLanguageAs (:165-167)."""
    return a == b or (a in _JAPANESE_SCRIPTS and b in _JAPANESE_SCRIPTS)


class _Section:
    """PotentialSection with rule languages + cached confidence values
    (MultiLanguageDetection.kt:89-163, :227-252, :301-361)."""

    __slots__ = ("start", "end", "letters", "full_text", "rule_langs", "_conf")

    def __init__(self, start: int, end: int, letters: int, full_text: str):
        self.start = start
        self.end = end
        self.letters = letters
        self.full_text = full_text
        self.rule_langs: set[str] = set()
        self._conf: list[tuple[str, float]] | None = None

    def text(self) -> str:
        return self.full_text[self.start : self.end]

    def contains_non_letter(self) -> bool:
        return self.letters != self.end - self.start

    def min_confidence(self) -> float:
        """:126-133 — 0.6..0.98 ramp over the first 40 letters."""
        return 0.6 + min(1.0, self.letters / 40.0) * 0.38

    def merge_with(self, other: "_Section") -> None:
        """:114-124 — extend end, add letters, drop cached confidences
        (merged text must be re-scored: section lengths differ and longer
        sections score more reliably, :317-326)."""
        self.end = other.end
        self.letters += other.letters
        self.rule_langs |= other.rule_langs
        self._conf = None

    def set_conf(self, conf: list[tuple[str, float]]) -> None:
        self._conf = conf

    def conf_list(self, detector: LinguaDetector) -> list[tuple[str, float]]:
        if self._conf is None:
            self._conf = detector.confidence_values(self.text())
        return self._conf

    def relevant_langs(self, detector: LinguaDetector) -> set[str]:
        """Languages with confidence >= min_confidence (:328-341; the
        sorted map makes this a prefix scan)."""
        mc = self.min_confidence()
        out: set[str] = set()
        for lang, conf in self.conf_list(detector):
            if conf >= mc:
                out.add(lang)
            else:
                break
        return out


def split_potential_sections(text: str) -> list[_Section]:
    """The reference split state machine, quirk-for-quirk (:169-225)."""
    sections: list[_Section] = []
    start = -1
    end = -1
    last_script: str | None = None
    letters = 0
    has_logograms = False

    for index, ch in enumerate(text):
        if is_letter(ch):
            script = script_of(ord(ch))
            if (
                start != -1
                and (has_logograms or letters >= _MIN_SECTION_LENGTH)
                and last_script is not None
                and not _same_language_script(last_script, script)
            ):
                sections.append(_Section(start, index, letters, text))
                # current letter starts the new section (letters seeded at
                # 1 then incremented below — the reference's arithmetic)
                start = index
                letters = 1
                has_logograms = False
            else:
                if start == -1:
                    start = index
                end = index + 1
            last_script = script
            letters += 1
            has_logograms = has_logograms or is_logogram(ch)
        elif (
            letters >= _MIN_SECTION_LENGTH
            and start != -1
            and is_potential_language_boundary(
                ch,
                text[index - 1] if index > 0 else "\x00",
                text[index + 1] if index + 1 < len(text) else "\x00",
            )
        ):
            sections.append(_Section(start, end, letters, text))
            start = -1
            letters = 0
            has_logograms = False

    if start != -1:
        sections.append(_Section(start, end, letters, text))
    return sections


def _sections_with_rule_languages(
    detector: LinguaDetector, text: str
) -> list[_Section]:
    """createSectionsWithRuleBasedLanguage (:254-299)."""
    out: list[_Section] = []
    prev: _Section | None = None
    for s in split_potential_sections(text):
        words = split_words(s.text())
        lang = detect_language_with_rules(words, detector.languages)
        if lang != UNKNOWN:
            if prev is not None and prev.rule_langs == {lang}:
                prev.merge_with(s)
            else:
                s.rule_langs = {lang}
                out.append(s)
                prev = s
        else:
            langs = filter_languages_by_rules(words, detector.languages)
            if (
                len(langs) == 1
                and prev is not None
                and prev.rule_langs == set(langs)
            ):
                prev.merge_with(s)
            else:
                s.rule_langs = set(langs)
                out.append(s)
                prev = s
    return out


def _should_merge_short(
    detector: LinguaDetector,
    cur: _Section,
    nxt: _Section,
    prev_conf_sec: _Section | None,
) -> bool:
    """shouldMergeShortRuleBasedSection (:446-494)."""
    if cur.letters >= _MIN_RELIABLE_LETTERS:
        return False
    # canBeMergedWith (:236-241): next not rule-determined + overlap
    if len(nxt.rule_langs) == 1 or not (nxt.rule_langs & cur.rule_langs):
        return False

    if (
        nxt.letters >= _MIN_RELIABLE_LETTERS
        and cur.letters >= 5
        and cur.contains_non_letter()
    ):
        conf = detector.confidence_values(cur.text())
        min_conf = cur.min_confidence()
        next_conf = detector.confidence_values(nxt.text())
        min_next = nxt.min_confidence()
        next_map = dict(next_conf)
        # most-common languages of cur must also be confident in next
        common = [l for l, v in conf if v > min_conf]
        if all(next_map.get(l, 0.0) < min_next for l in common):
            return False
        if prev_conf_sec is not None:
            # does cur belong more closely to prev than to next? (:481-490)
            cur_map = dict(conf)
            prev_conf = prev_conf_sec.conf_list(detector)
            next_c = cur_map.get(next_conf[0][0], 0.0) if next_conf else 0.0
            prev_c = cur_map.get(prev_conf[0][0], 0.0) if prev_conf else 0.0
            return next_c >= prev_c
    return True


def _sections_with_confidences(
    detector: LinguaDetector, text: str
) -> list[_Section]:
    """createSectionsWithConfidenceValues (:363-415)."""
    secs = _sections_with_rule_languages(detector, text)
    conf_secs: list[_Section] = []
    i = 0
    while i < len(secs):
        s = secs[i]
        if len(s.rule_langs) == 1:
            # rules already determined the language (:376-381)
            s.set_conf([(next(iter(s.rule_langs)), 1.0)])
            conf_secs.append(s)
        else:
            while i < len(secs) - 1:
                if _should_merge_short(
                    detector, s, secs[i + 1],
                    conf_secs[-1] if conf_secs else None,
                ):
                    s.merge_with(secs[i + 1])
                    i += 1
                else:
                    break
            s.conf_list(detector)  # compute + cache
            conf_secs.append(s)
        i += 1
    return conf_secs


def _can_merge_confidence(
    detector: LinguaDetector,
    cur: _Section,
    prev: _Section,
    nxt: _Section | None,
) -> bool:
    """canMergeConfidenceSection (:499-539)."""
    cur_rel = cur.relevant_langs(detector)
    prev_rel = prev.relevant_langs(detector)
    prev_cur = cur_rel & prev_rel
    if not prev_cur:
        return False
    if nxt is None:
        return True
    nxt_rel = nxt.relevant_langs(detector)
    cur_next = cur_rel & nxt_rel
    if not cur_next:
        return True
    if prev_rel & nxt_rel:
        # prev+next probably merge anyway -> transitively safe (:527-532)
        return True
    cur_map = dict(cur.conf_list(detector))
    pc = sum(cur_map.get(l, 0.0) for l in prev_cur) / len(prev_cur)
    nc = sum(cur_map.get(l, 0.0) for l in cur_next) / len(cur_next)
    return pc > nc


def detect_multi_language(detector: LinguaDetector, text: str) -> list[dict]:
    """internalDetectMultiLanguageOf (:417-444)."""
    sections = _sections_with_confidences(detector, text)
    if not sections:
        return []

    i = 1
    while i < len(sections):
        cur = sections[i]
        nxt = sections[i + 1] if i + 1 < len(sections) else None
        if _can_merge_confidence(detector, cur, sections[i - 1], nxt):
            sections[i - 1].merge_with(cur)
            del sections[i]
        else:
            i += 1

    out = []
    for s in sections:
        conf = s.conf_list(detector)
        out.append(
            {
                "start": s.start,
                "end": s.end,
                "letters": s.letters,
                "lang": detector._language_from_confidences(conf),
                "confidences": [
                    {"lang": l, "conf": float(v)} for l, v in conf
                ],
            }
        )
    return out


class MultiLangSections:
    """map_batches actor stage: text -> list<struct> sections column
    (start/end/letters/lang + per-section confidence values)."""

    def __init__(self, models_dir: str | None = None,
                 text_column: str = "text"):
        from tiny_lingua_ray.models.loader import load_dict_models
        from tiny_lingua_ray.models.train import default_models_dir, ensure_models

        from pathlib import Path

        mdir = Path(models_dir or default_models_dir())
        ensure_models(mdir, use_ray=False)
        self.detector = LinguaDetector(load_dict_models(mdir))
        self.text_column = text_column

    def __call__(self, batch):
        import pyarrow as pa

        texts = batch.column(self.text_column).to_pylist()
        secs = [
            detect_multi_language(self.detector, t or "") for t in texts
        ]
        typ = pa.list_(
            pa.struct(
                [
                    ("start", pa.int32()),
                    ("end", pa.int32()),
                    ("letters", pa.int32()),
                    ("lang", pa.string()),
                    (
                        "confidences",
                        pa.list_(
                            pa.struct(
                                [("lang", pa.string()), ("conf", pa.float64())]
                            )
                        ),
                    ),
                ]
            )
        )
        return batch.append_column("sections", pa.array(secs, typ))
