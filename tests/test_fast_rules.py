"""FastRules must agree exactly with the pure rule functions."""

from __future__ import annotations

import numpy as np
import pytest

from tiny_lingua_ray.detector import (
    detect_language_with_rules,
    filter_languages_by_rules,
    split_words,
)
from tiny_lingua_ray.fast_tables import codepoints, script_id_table
from tiny_lingua_ray.languages import ALL_ISO1
from tiny_lingua_ray.stages.fast_rules import FastRules

CASES = [
    "hello plain world",
    "Ñandú corre rápido por la pampa",
    "日本語のテキストです",
    "你好世界欢迎光临",
    "こんにちは世界",
    "Привет мир как дела",
    "γειά σου κόσμε",
    "mixed 语言 text here",
    "ß ß ß",
    "Üben von Xylophon und Querflöte ist ja zweckmäßig",
    "ñoño ñaña",
    "Это русское предложение Error Code Deep Ocean",
    "وقالت مصادر أمنية إن الهجوم وقع",
    "हिन्दी एक भाषा है",
    "ab你好cd mixed scripts",
    "    ",
    "a",
    "İstanbul'da güzel bir gün",
    "Dziękuję bardzo za pomoc",
    "Příliš žluťoučký kůň úpěl ďábelské ódy",
]


@pytest.mark.parametrize("subset", [None, ("en", "de", "es", "fr", "zh")])
def test_fast_rules_parity(subset):
    langs = frozenset(subset) if subset else frozenset(ALL_ISO1)
    fr = FastRules(langs)
    st = script_id_table()

    corpus_cases = list(CASES)
    from tiny_lingua_ray.models.train import CORPUS_DIR

    for lang in ("en", "de", "ru", "zh", "ja", "ar", "th", "el", "vi", "tr"):
        f = CORPUS_DIR / "sentences" / f"{lang}.txt"
        corpus_cases.extend(f.read_text(encoding="utf-8").splitlines()[:30])

    for text in corpus_cases:
        if not text:
            continue
        cps = codepoints(text)
        scr = st[cps]
        spans = fr.word_spans(cps, scr)

        # word spans == split_words
        words = split_words(text)
        span_words = [text[a:b] for a, b, _ in spans]
        assert span_words == words, f"spans differ for {text!r}"

        want_detect = detect_language_with_rules(words, langs)
        got_detect = fr.detect_with_rules(cps, scr, spans)
        assert got_detect == want_detect, f"detect differs for {text!r}"

        want_filter = filter_languages_by_rules(words, langs)
        got_filter = fr.filter_by_rules(cps, scr, spans)
        assert got_filter == want_filter, f"filter differs for {text!r}"
