"""The vectorized batch scorer must agree with the pure-Python detector."""

from __future__ import annotations

import pyarrow as pa
import pytest

from tiny_lingua_ray.detector import LinguaDetector
from tiny_lingua_ray.models.loader import load_dict_models
from tiny_lingua_ray.stages.langid import LangIdScorer

ADVERSARIAL = [
    "",
    "   ",
    "1234567890",
    "!!! ??? ...",
    "a",
    "ab",
    "Ñandú corre rápido por la pampa",
    "日本語のテキストです",
    "你好世界欢迎光临",
    "Привет мир как дела",
    "γειά σου κόσμε τι κάνεις",
    "mixed 语言 text here",
    "ß ß ß",
    "the quick brown fox jumps over the lazy dog " * 5,  # >=120 chars
    "short text",
    "Üben von Xylophon und Querflöte ist ja zweckmäßig",
]


@pytest.fixture(scope="module")
def pair(small_models_dir):
    langs = ("en", "de", "es", "fr", "zh")
    det = LinguaDetector(load_dict_models(small_models_dir, langs))
    scorer = LangIdScorer(
        models_dir=str(small_models_dir), languages=langs, build_if_missing=False
    )
    return det, scorer


def _corpus_sample(n_per_lang=40):
    from tiny_lingua_ray.models.train import CORPUS_DIR

    texts = []
    for split in ("sentences", "single-words", "word-pairs"):
        for lang in ("en", "de", "es", "fr", "zh"):
            f = CORPUS_DIR / split / f"{lang}.txt"
            texts.extend(
                [
                    ln
                    for ln in f.read_text(encoding="utf-8").splitlines()[:n_per_lang]
                    if ln
                ]
            )
    return texts


def test_scorer_matches_pure_detector(pair):
    det, scorer = pair
    texts = _corpus_sample() + ADVERSARIAL
    batch = pa.table({"text": texts})
    out = scorer(batch)
    preds = out.column("pred_lang").to_pylist()
    for t, p in zip(texts, preds):
        assert p == det.detect(t), f"mismatch for {t!r}: vec={p} pure={det.detect(t)}"


def test_scorer_cache_stable_across_batches(pair):
    _, scorer = pair
    texts = _corpus_sample(10)
    b = pa.table({"text": texts})
    first = scorer(b).column("pred_lang").to_pylist()
    second = scorer(b).column("pred_lang").to_pylist()
    assert first == second


def test_scorer_appends_expected_columns(pair):
    _, scorer = pair
    out = scorer(pa.table({"text": ["hello world"], "doc_id": [1]}))
    assert out.column_names == [
        "text",
        "doc_id",
        "pred_lang",
        "lang_margin",
        "lang_path",
    ]
