"""Table-driven rule engine for batch scoring (semantics-identical to
detector.detect_language_with_rules / filter_languages_by_rules).

The pure functions in detector.py pay per-char Python overhead
(script_of lru probes, ord, dict ops).  This variant precomputes, per
scorer instance:

* script id per codepoint (shared numpy table)
* alphabet votes: script id -> language (only scripts used by exactly one
  language GLOBALLY, filtered to the detector's language set —
  LanguageDetector.kt:83-87)
* unique-char votes: codepoint -> tuple of language iso1 codes (filtered)
* diacritic mapping: codepoint -> tuple of languages (CHARS_TO_LANGUAGES)

and then walks words over the row's precomputed codepoint/script arrays.
Parity with the pure functions is enforced by tests/test_fast_rules.py.
"""

from __future__ import annotations

import numpy as np

from tiny_lingua_ray.detector import (
    FULL_WORD_VALUE,
    LOGOGRAM_WORD_VALUE,
)
from tiny_lingua_ray.fast_tables import SCRIPT_ID, SCRIPT_NAMES, script_id_table
from tiny_lingua_ray.languages import (
    CHARS_TO_LANGUAGES_MAPPING,
    LANGUAGES,
    RANK,
    SCRIPTS_SUPPORTING_EXACTLY_ONE_LANGUAGE,
    SCRIPTS_WITH_LOGOGRAMS,
    UNKNOWN,
    BY_ISO1,
)

_MAX_CP = 0x110000


class FastRules:
    def __init__(self, languages: frozenset[str]):
        self.languages = languages
        self.script_table = script_id_table()

        # script id -> alphabet language (or None)
        self.alphabet_lang: list[str | None] = [None] * len(SCRIPT_NAMES)
        for script, lang in SCRIPTS_SUPPORTING_EXACTLY_ONE_LANGUAGE.items():
            if lang in languages:
                self.alphabet_lang[SCRIPT_ID[script]] = lang

        self.han_id = SCRIPT_ID["HAN"]
        self.hira_id = SCRIPT_ID["HIRAGANA"]
        self.kata_id = SCRIPT_ID["KATAKANA"]
        self.latin_id = SCRIPT_ID["LATIN"]
        self.cyr_id = SCRIPT_ID["CYRILLIC"]
        self.dev_id = SCRIPT_ID["DEVANAGARI"]
        self.logogram_ids = frozenset(
            SCRIPT_ID[s] for s in SCRIPTS_WITH_LOGOGRAMS
        )
        self.logo_script_table = np.zeros(len(SCRIPT_NAMES), dtype=bool)
        for sid in self.logogram_ids:
            self.logo_script_table[sid] = True

        # codepoint -> index into unique-char language tuples (0 = none)
        uniq_lists: list[tuple[str, ...]] = [()]
        self.uniq_table = np.zeros(_MAX_CP, dtype=np.uint16)
        per_char: dict[int, list[str]] = {}
        for li in LANGUAGES:
            if li.unique_chars and li.iso1 in languages:
                for ch in li.unique_chars:
                    per_char.setdefault(ord(ch), []).append(li.iso1)
        for cp, langs in per_char.items():
            # preserve declaration order (languagesWithUniqueCharacters is
            # built in enum order — LanguageDetector.kt:81-82)
            langs.sort(key=lambda l: RANK[l])
            self.uniq_table[cp] = len(uniq_lists)
            uniq_lists.append(tuple(langs))
        self.uniq_lists = uniq_lists

        # codepoint -> diacritic language tuple index (0 = none)
        dia_lists: list[tuple[str, ...]] = [()]
        self.dia_table = np.zeros(_MAX_CP, dtype=np.uint16)
        for ch, langs in CHARS_TO_LANGUAGES_MAPPING.items():
            self.dia_table[ord(ch)] = len(dia_lists)
            dia_lists.append(langs)
        self.dia_lists = dia_lists

        # language -> scripts (ids) for the filter step
        self.lang_script_ids = {
            li.iso1: frozenset(SCRIPT_ID[s] for s in li.scripts)
            for li in LANGUAGES
            if li.iso1 in languages
        }


    # ------------------------------------------------------------------ #

    def word_spans(
        self, cps: np.ndarray, scripts: np.ndarray
    ) -> list[tuple[int, int, bool]]:
        """(start, end, is_logogram_word) — WordList.kt semantics: split at
        U+0020; every logogram char is its own word.  Fully vectorized:
        CJK-script chars are never whitespace, so logogram-ness is a pure
        script-table lookup."""
        logo = self.logo_script_table[scripts]
        sep = (cps == 0x20) | logo
        nonsep = ~sep
        starts = np.flatnonzero(
            nonsep & np.concatenate(([True], sep[:-1]))
        )
        ends = np.flatnonzero(
            nonsep & np.concatenate((sep[1:], [True]))
        ) + 1
        spans = [
            (int(s), int(e), False) for s, e in zip(starts, ends)
        ] + [(int(i), int(i) + 1, True) for i in np.flatnonzero(logo)]
        spans.sort()
        return spans

    def detect_with_rules(
        self, cps: np.ndarray, scripts: np.ndarray,
        spans: list[tuple[int, int, bool]],
    ) -> str:
        """M7 — LanguageDetector.kt:367-464."""
        adjusted = 0.0
        totals: dict[str, float] = {}
        alphabet_lang = self.alphabet_lang
        uniq_table = self.uniq_table
        uniq_lists = self.uniq_lists
        languages = self.languages

        for a, b, is_logo in spans:
            counts: dict[str, int] = {}
            for i in range(a, b):
                sid = int(scripts[i])
                lang = alphabet_lang[sid]
                if lang is not None:
                    counts[lang] = counts.get(lang, 0) + 1
                elif sid == self.han_id:
                    counts["zh"] = counts.get("zh", 0) + 1
                elif sid == self.hira_id or sid == self.kata_id:
                    counts["ja"] = counts.get("ja", 0) + 1
                elif sid == self.latin_id or sid == self.cyr_id or sid == self.dev_id:
                    ui = uniq_table[cps[i]]
                    if ui:
                        for l in uniq_lists[ui]:
                            counts[l] = counts.get(l, 0) + 1

            word_value = FULL_WORD_VALUE
            if not counts:
                totals[UNKNOWN] = totals.get(UNKNOWN, 0.0) + word_value
            elif len(counts) == 1:
                (lang, _), = counts.items()
                if lang in languages:
                    if is_logo:
                        word_value = LOGOGRAM_WORD_VALUE
                    totals[lang] = totals.get(lang, 0.0) + word_value
                else:
                    totals[UNKNOWN] = totals.get(UNKNOWN, 0.0) + word_value
            else:
                ordered = sorted(
                    counts.items(), key=lambda lc: (-lc[1], RANK[lc[0]])
                )
                (best_lang, best_c), (_, second_c) = ordered[0], ordered[1]
                if best_c > second_c and best_lang in languages:
                    totals[best_lang] = totals.get(best_lang, 0.0) + word_value
                else:
                    totals[UNKNOWN] = totals.get(UNKNOWN, 0.0) + word_value
            adjusted += word_value

        if totals.get(UNKNOWN, 0.0) < 0.4 * adjusted:
            totals.pop(UNKNOWN, None)
        nonzero = [(l, v) for l, v in totals.items() if v != 0.0]
        if not nonzero:
            return UNKNOWN
        if len(nonzero) == 1:
            return nonzero[0][0]
        if len(nonzero) == 2 and {l for l, _ in nonzero} == {"zh", "ja"}:
            return "ja"
        ordered = sorted(nonzero, key=lambda lv: (-lv[1], RANK[lv[0]]))
        (best_lang, best_v), (_, second_v) = ordered[0], ordered[1]
        if second_v / best_v > 0.8:
            return UNKNOWN
        return best_lang

    def filter_by_rules(
        self, cps: np.ndarray, scripts: np.ndarray,
        spans: list[tuple[int, int, bool]],
    ) -> frozenset[str]:
        """M8 — LanguageDetector.kt:466-533."""
        adjusted = 0.0
        script_counts: dict[int, float] = {}
        for a, b, is_logo in spans:
            word_value = FULL_WORD_VALUE
            seg = scripts[a:b]
            first = int(seg[0])
            if first != 0 and (seg == first).all():
                if is_logo:
                    word_value = LOGOGRAM_WORD_VALUE
                script_counts[first] = script_counts.get(first, 0.0) + word_value
            adjusted += word_value

        if not script_counts:
            return self.languages

        ordered = sorted(script_counts.items(), key=lambda sv: -sv[1])
        top_value = ordered[0][1]
        top_scripts = {s for s, v in ordered if v / top_value >= 0.8}

        filtered = frozenset(
            l
            for l, sids in self.lang_script_ids.items()
            if sids & top_scripts
        )

        lang_counts: dict[str, int] = {}
        dia_table = self.dia_table
        dia_lists = self.dia_lists
        for a, b, _ in spans:
            remaining = None
            for i in range(a, b):
                di = dia_table[cps[i]]
                if di:
                    if remaining is None:
                        remaining = set(filtered)
                    for lang in dia_lists[di]:
                        if lang in remaining:
                            remaining.discard(lang)
                            lang_counts[lang] = lang_counts.get(lang, 0) + 1

        subset = frozenset(
            l for l, c in lang_counts.items() if c >= adjusted / 2.0
        )
        if subset:
            return filtered & subset
        return filtered
