"""Pure-Python language detector — the semantic core (no Ray imports).

Reimplements the reference decision function exactly (behavior, not code):

* text cleaning            api/LanguageDetector.kt:310-318  (M1)
* letterless short-circuit api/LanguageDetector.kt:226-228  (M2)
* word split               internal/util/WordList.kt:18-80  (M3)
* rule-based detection     api/LanguageDetector.kt:367-464  (M7)
* rule-based filtering     api/LanguageDetector.kt:466-533  (M8)
* n-gram extraction        internal/TestDataLanguageModel.kt:34-67 (M5)
* n-gram range policy      api/LanguageDetector.kt:244-253, 691 (M6)
* frequency probe+backoff  api/LanguageDetector.kt:581-642  (J1)
* unigram counting         api/LanguageDetector.kt:325-342  (J2)
* probability summation    api/LanguageDetector.kt:344-362, 535-579 (A1/A2)
* confidence + argmax      api/LanguageDetector.kt:119-133, 276-285 (A3)

This module is deliberately row-oriented and simple; the vectorized batch
scorer in ``stages/langid.py`` must agree with it (tested).
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Mapping

from tiny_lingua_ray.languages import (
    ALL_ISO1,
    CHARS_TO_LANGUAGES_MAPPING,
    LANGUAGES_BY_SCRIPT,
    LANGUAGES_SUPPORTING_LOGOGRAMS,
    RANK,
    SCRIPTS_SUPPORTING_EXACTLY_ONE_LANGUAGE,
    UNKNOWN,
    BY_ISO1,
)
from tiny_lingua_ray.unicode_tables import (
    collapse_whitespace,
    delete_numbers_and_punct,
    is_letter,
    is_logogram,
    java_trim,
    script_of,
)

FULL_WORD_VALUE = 1.0
LOGOGRAM_WORD_VALUE = 0.7      # LanguageDetector.kt:66
HIGH_ACCURACY_MODE_MAX_TEXT_LENGTH = 120  # LanguageDetector.kt:691
CJK_PROBABILITY_FACTOR = 0.85  # LanguageDetector.kt:569-572

# Languages with non-blank uniqueCharacters (LanguageDetector.kt:81-82),
# in declaration order.
_LANGS_WITH_UNIQUE_CHARS: tuple[tuple[str, str], ...] = tuple(
    (li.iso1, li.unique_chars)
    for li in (BY_ISO1[c] for c in ALL_ISO1)
    if li.unique_chars
)

_JAPANESE_SCRIPTS = frozenset({"HIRAGANA", "KATAKANA", "HAN"})  # Constant.kt:154-159


def clean_up_input_text(text: str) -> str:
    """trim → lowercase → delete \\p{N}|\\p{P} → collapse \\s+ → ' '."""
    return collapse_whitespace(
        delete_numbers_and_punct(java_trim(text).lower())
    )


def has_letter(text: str) -> bool:
    return any(is_letter(c) for c in text)


def split_words(text: str) -> list[str]:
    """WordList.build: split at ' '; every logogram char is its own word.

    Runs on the RAW text (LanguageDetector.kt:230). Only U+0020 is a word
    separator; logograms split the surrounding word.
    """
    words: list[str] = []
    start = None
    for i, ch in enumerate(text):
        if ch == " ":
            if start is not None:
                words.append(text[start:i])
                start = None
        elif is_logogram(ch):
            if start is not None:
                words.append(text[start:i])
            words.append(ch)
            start = None
        else:
            if start is None:
                start = i
    if start is not None:
        words.append(text[start:])
    return words


def _word_is_logogram(word: str) -> bool:
    # WordList emits logograms as 1-char words; word.isLogogram() checks the
    # first char (CharSequence extension applied to the whole word in the
    # reference only ever sees 1-char logogram words).
    return len(word) > 0 and is_logogram(word[0])


def detect_language_with_rules(
    words: list[str], languages: frozenset[str]
) -> str:
    """M7 — api/LanguageDetector.kt:367-464. Returns iso1 or 'unknown'."""
    adjusted_word_count = 0.0
    totals: dict[str, float] = {}

    alphabet_lang = {
        s: l
        for s, l in SCRIPTS_SUPPORTING_EXACTLY_ONE_LANGUAGE.items()
        if l in languages
    }

    for word in words:
        counts: dict[str, int] = {}
        for ch in word:
            script = script_of(ord(ch))
            lang = alphabet_lang.get(script)
            if lang is not None:
                counts[lang] = counts.get(lang, 0) + 1
            elif script == "HAN":
                counts["zh"] = counts.get("zh", 0) + 1
            elif script in _JAPANESE_SCRIPTS:
                counts["ja"] = counts.get("ja", 0) + 1
            elif script in ("LATIN", "CYRILLIC", "DEVANAGARI"):
                for iso1, uniq in _LANGS_WITH_UNIQUE_CHARS:
                    if iso1 in languages and ch in uniq:
                        counts[iso1] = counts.get(iso1, 0) + 1

        word_value = FULL_WORD_VALUE
        nonzero = [(l, c) for l, c in counts.items() if c > 0]
        if not nonzero:
            totals[UNKNOWN] = totals.get(UNKNOWN, 0.0) + word_value
        elif len(nonzero) == 1:
            lang = nonzero[0][0]
            if lang in languages:
                if _word_is_logogram(word):
                    word_value = LOGOGRAM_WORD_VALUE
                totals[lang] = totals.get(lang, 0.0) + word_value
            else:
                totals[UNKNOWN] = totals.get(UNKNOWN, 0.0) + word_value
        else:
            # Top-2 by count, ties by declaration order (EnumDoubleMap.kt:136-201)
            ordered = sorted(nonzero, key=lambda lc: (-lc[1], RANK[lc[0]]))
            (best_lang, best_c), (_, second_c) = ordered[0], ordered[1]
            if best_c > second_c and best_lang in languages:
                totals[best_lang] = totals.get(best_lang, 0.0) + word_value
            else:
                totals[UNKNOWN] = totals.get(UNKNOWN, 0.0) + word_value

        adjusted_word_count += word_value

    if totals.get(UNKNOWN, 0.0) < 0.4 * adjusted_word_count:
        totals.pop(UNKNOWN, None)

    nonzero_totals = [(l, v) for l, v in totals.items() if v != 0.0]
    if not nonzero_totals:
        return UNKNOWN
    if len(nonzero_totals) == 1:
        return nonzero_totals[0][0]
    langs_present = {l for l, _ in nonzero_totals}
    if len(nonzero_totals) == 2 and langs_present == {"zh", "ja"}:
        return "ja"
    ordered = sorted(nonzero_totals, key=lambda lv: (-lv[1], RANK[lv[0]]))
    (best_lang, best_v), (_, second_v) = ordered[0], ordered[1]
    if second_v / best_v > 0.8:
        return UNKNOWN
    return best_lang


def filter_languages_by_rules(
    words: list[str], languages: frozenset[str]
) -> frozenset[str]:
    """M8 — api/LanguageDetector.kt:466-533."""
    adjusted_word_count = 0.0
    script_counts: dict[str, float] = {}

    for word in words:
        word_value = FULL_WORD_VALUE
        scripts = {script_of(ord(c)) for c in word}
        if len(scripts) == 1:
            (script,) = scripts
            if script is not None:
                if _word_is_logogram(word):
                    word_value = LOGOGRAM_WORD_VALUE
                script_counts[script] = script_counts.get(script, 0.0) + word_value
        adjusted_word_count += word_value

    if not script_counts:
        return languages

    # Most frequent script(s): all within 0.8 ratio of the max, descending.
    ordered = sorted(script_counts.items(), key=lambda sv: -sv[1])
    top_value = ordered[0][1]
    top_scripts = {s for s, v in ordered if v / top_value >= 0.8}

    filtered = frozenset(
        l
        for l in languages
        if any(s in top_scripts for s in BY_ISO1[l].scripts)
    )

    # Diacritic votes: a language counted at most once per word.
    lang_counts: dict[str, int] = {}
    for word in words:
        remaining = set(filtered)
        for ch in word:
            for lang in CHARS_TO_LANGUAGES_MAPPING.get(ch, ()):
                if lang in remaining:
                    remaining.discard(lang)
                    lang_counts[lang] = lang_counts.get(lang, 0) + 1

    subset = frozenset(
        l for l, c in lang_counts.items() if c >= adjusted_word_count / 2.0
    )
    if subset:
        return filtered & subset
    return filtered


def extract_ngrams(cleaned: str, n: int) -> list[str]:
    """M5 — TestDataLanguageModel.kt:34-67: unique n-grams, windows with a
    non-letter skipped, insertion order preserved."""
    out: dict[str, None] = {}
    length = len(cleaned)
    i = 0
    next_letter_check = 0
    while i <= length - n:
        ok = True
        while next_letter_check < i + n:
            if not is_letter(cleaned[next_letter_check]):
                next_letter_check += 1
                i = next_letter_check
                ok = False
                break
            next_letter_check += 1
        if not ok:
            continue
        out[cleaned[i : i + n]] = None
        i += 1
    return list(out)


def probe_with_backoff(model: Mapping[str, float], ngram: str) -> float:
    """J1 — back off by truncating the SUFFIX (keep prefix) until a hit;
    returns ln(freq) of the first hit or 0.0 (no contribution)."""
    g = ngram
    while g:
        freq = model.get(g)
        if freq is not None and freq > 0:
            return math.log(freq)
        g = g[:-1]
    return 0.0


class LinguaDetector:
    """Reference-parity detector over ``{lang: {ngram: float32-freq}}`` models.

    Mirrors LanguageDetectorBuilder options: ``languages`` subset,
    ``minimum_relative_distance`` (api/LanguageDetectorBuilder.kt:71-75) and
    ``low_accuracy`` (trigram-only, :140-143).
    """

    def __init__(
        self,
        models: Mapping[str, Mapping[str, float]],
        languages: Iterable[str] | None = None,
        minimum_relative_distance: float = 0.0,
        low_accuracy: bool = False,
    ):
        self.models = models
        self.languages = frozenset(languages) if languages else frozenset(models)
        # builder validations (api/LanguageDetectorBuilder.kt:39-75)
        if len(self.languages) < 2:
            raise ValueError(
                "LanguageDetector needs at least 2 languages to choose from"
            )
        if not 0.0 <= minimum_relative_distance <= 0.99:
            raise ValueError(
                "minimum relative distance must lie in between 0.0 and 0.99"
            )
        self.minimum_relative_distance = minimum_relative_distance
        self.low_accuracy = low_accuracy

    # -- public API ---------------------------------------------------------

    def detect(self, text: str) -> str:
        conf = self.confidence_values(text)
        return self._language_from_confidences(conf)

    def confidence_values(self, text: str) -> list[tuple[str, float]]:
        """Sorted (lang, confidence) desc; best always 1.0; may be empty."""
        cleaned = clean_up_input_text(text)
        if not cleaned or not has_letter(cleaned):
            return []

        words = split_words(text)
        rule_lang = detect_language_with_rules(words, self.languages)
        if rule_lang != UNKNOWN:
            return [(rule_lang, 1.0)]

        filtered = filter_languages_by_rules(words, self.languages)
        if len(filtered) == 1:
            return [(next(iter(filtered)), 1.0)]

        if self.low_accuracy and len(cleaned) < 3:
            return []

        is_long = len(cleaned) >= HIGH_ACCURACY_MODE_MAX_TEXT_LENGTH
        ngram_range = (
            range(3, 4) if (is_long or self.low_accuracy) else range(1, 6)
        )

        totals: dict[str, float] = {l: 0.0 for l in filtered}
        unigram_counts: dict[str, int] = {}

        for n in ngram_range:
            if len(cleaned) < n:
                continue
            ngrams = extract_ngrams(cleaned, n)
            sums: dict[str, float] = {}
            for lang in filtered:
                model = self.models.get(lang)
                if model is None:
                    continue
                s = 0.0
                for g in ngrams:
                    s += probe_with_backoff(model, g)
                if s < 0.0:
                    if lang in LANGUAGES_SUPPORTING_LOGOGRAMS:
                        s *= CJK_PROBABILITY_FACTOR
                    sums[lang] = s
            for lang, s in sums.items():
                totals[lang] += s

            if n == 1:
                # LanguageDetector.kt:259-270
                langs_nonzero = set(sums)
                count_langs = (
                    frozenset(l for l in filtered if l in langs_nonzero)
                    if langs_nonzero
                    else filtered
                )
                for lang in count_langs:
                    model = self.models.get(lang)
                    if model is None:
                        continue
                    c = 0
                    for g in ngrams:
                        freq = model.get(g)
                        if freq is not None and freq > 0:
                            c += 1
                    if c:
                        unigram_counts[lang] = c

        # A2: unigram normalization of the cross-n totals
        for lang, c in unigram_counts.items():
            if totals.get(lang, 0.0) != 0.0:
                totals[lang] = totals[lang] / c

        nonzero = {l: v for l, v in totals.items() if v != 0.0}
        if not nonzero:
            return []
        highest = max(nonzero.values())  # least negative = best
        conf = [(l, highest / v) for l, v in nonzero.items()]
        conf.sort(key=lambda lv: (-lv[1], RANK[lv[0]]))
        return conf

    # -- internals ----------------------------------------------------------

    def _language_from_confidences(
        self, conf: list[tuple[str, float]]
    ) -> str:
        if not conf:
            return UNKNOWN
        if len(conf) == 1:
            return conf[0][0]
        best, second = conf[0][1], conf[1][1]
        if best == second:
            return UNKNOWN
        if (best - second) < self.minimum_relative_distance:
            return UNKNOWN
        return conf[0][0]
