"""Accuracy-report pipeline + multi-language sectioning tests."""

from __future__ import annotations

import pytest


def test_accuracy_report_limited(ray_session, models_dir, tmp_path):
    from tiny_lingua_ray.pipelines.accuracy_report import (
        run_accuracy_report,
        write_reports,
    )

    langs = ("en", "de", "es", "fr", "ru", "zh")
    agg = run_accuracy_report(
        languages=langs, limit_per_file=50, concurrency=2
    )
    assert set(agg["true_lang"]) == set(langs)
    assert set(agg["split"]) == {"single-words", "word-pairs", "sentences"}
    # sentences (held-in) must be near-perfect; single-words decent
    sent = agg[agg["split"] == "sentences"]
    assert sent["accuracy_pct"].mean() > 90

    out = write_reports(agg, tmp_path / "reports")
    assert (out / "aggregated-accuracy-values.csv").exists()
    assert (out / "English.txt").read_text().startswith("##### English")


def test_multilang_sections(models_dir):
    from pathlib import Path

    from tiny_lingua_ray.detector import LinguaDetector
    from tiny_lingua_ray.models.loader import load_dict_models
    from tiny_lingua_ray.multilang import detect_multi_language

    det = LinguaDetector(load_dict_models(Path(models_dir)))
    text = (
        "This is an English sentence about nothing. "
        "Это русское предложение о погоде сегодня."
    )
    secs = detect_multi_language(det, text)
    assert [s["lang"] for s in secs] == ["en", "ru"]
    assert secs[0]["start"] == 0
    # section end = last LETTER (exclusive) — trailing '.' excluded
    # (PotentialSection end semantics, MultiLanguageDetection.kt:92-93)
    assert secs[-1]["end"] == len(text) - 1

    assert detect_multi_language(det, "") == []
    assert detect_multi_language(det, "12345 !!!") == []

    single = detect_multi_language(det, "just plain english text here")
    assert len(single) == 1 and single[0]["lang"] == "en"
