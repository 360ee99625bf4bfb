"""Golden fixtures from the reference test suite.

Texts ported verbatim from
/root/reference/src/test/kotlin/.../api/LanguageDetector_Test.kt:52-140.
The reference pins exact confidence strings against upstream Lingua's
models; those model artifacts are unavailable offline (models/__init__.py
gap), so we pin what is model-robust: the DETECTED top-1 language per
fixture, and the per-section language sequence for the multi-language
fixtures.
"""

from __future__ import annotations

import pytest

GOLDEN_SINGLE = [
    ("", "unknown"),
    ("...", "unknown"),
    ("this is a short test", "en"),
    ("Ein kurzer Satz", "de"),
    (
        "Lederen underretter løbende bestyrelsen om personaleforholdene i "
        "institutionen.",
        "da",
    ),
    ("Actualmente esta alquilado con buena renta.", "es"),
    (
        "A dirlo è Jamil Sadegholvaad, assessore alla Sicurezza, in relazione "
        "agli atti vandalici e l’occupazione della palazzina ex Sert tra "
        "lanci di sedie e biciclette nella notte tra sabato e domenica.",
        "it",
    ),
    (
        "口コミサイトには、審査に関しての細かい内容を口コミと一緒に記載している"
        "ことがよくありますので、消費者金融の審査の詳細に興味をひかれている人は、"
        "ぜひ見ておいてください。",
        "ja",
    ),
    (
        "Alijipangia kulinganisha uaminifu kwa kanuni na mabadiliko ya "
        "shirika, akionyesha hayo hayaendi kinyume cha nia ya mwanzilishi.",
        "sw",
    ),
]

GOLDEN_MULTI = [
    (
        "Hallo das ist ein Test mit ein paar Wörtern: But what if the text "
        "also contained English as part of the sentence?",
        ["de", "en"],
    ),
    (
        'He turned around and asked: "Entschuldigen Sie, sprechen Sie '
        'Deutsch?"',
        ["en", "de"],
    ),
    (
        "выдает такую ошибку Error Code: UNKNOWN code: Deep Ocean",
        ["ru", "en"],
    ),
    (
        "First sentence\nsecond sentence\nthird sentence\n"
        "Aber der letzte Satz ist in Deutsch",
        ["en", "de"],
    ),
]


@pytest.fixture(scope="module")
def full_detector(models_dir):
    from tiny_lingua_ray.detector import LinguaDetector
    from tiny_lingua_ray.models.loader import load_dict_models

    return LinguaDetector(load_dict_models(models_dir))


@pytest.mark.parametrize("text,expected", GOLDEN_SINGLE)
def test_golden_top1(full_detector, text, expected):
    assert full_detector.detect(text) == expected


def test_golden_best_confidence_is_one(full_detector):
    conf = full_detector.confidence_values("this is a short test")
    assert conf[0] == ("en", 1.0)


@pytest.mark.parametrize("text,expected_langs", GOLDEN_MULTI)
def test_golden_multilang_sequence(full_detector, text, expected_langs):
    from tiny_lingua_ray.multilang import detect_multi_language

    secs = detect_multi_language(full_detector, text)
    langs = [s["lang"] for s in secs]
    # collapse adjacent repeats (our splitter may produce more sections)
    collapsed = [l for i, l in enumerate(langs) if i == 0 or l != langs[i - 1]]
    assert collapsed == expected_langs, f"{langs} for {text!r}"
