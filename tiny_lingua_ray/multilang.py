"""Multi-language sectioning (M9 — experimental in the reference too).

Reference: ``detectMultiLanguageOf`` —
internal/MultiLanguageDetection.kt:169-225 (split), :254-299 /
:363-415 (merge), :417-444 (entry); surfaced at
api/LanguageDetector.kt:185-189 with an explicit "experimental, may be
slow" warning.

Simplified faithful shape (documented divergence: the reference's
confidence-overlap merge heuristics at MultiLanguageDetection.kt:446-539
are approximated by same-language merging + short-section absorption):

1. split the text into candidate sections at hard boundaries (newlines,
   quotes, colons — :40-87) and at script changes between words;
2. detect each section with the full single-language decision function;
3. merge adjacent sections that detected the same language; absorb
   letter-poor sections (< MIN_SECTION_LETTERS) into their neighbor.

Returns ``[{start, end, letters, lang}]`` over codepoint offsets.
"""

from __future__ import annotations

from dataclasses import dataclass

from tiny_lingua_ray.detector import LinguaDetector
from tiny_lingua_ray.languages import UNKNOWN
from tiny_lingua_ray.unicode_tables import is_letter, script_of

HARD_BOUNDARY = set('\n\r"“”«»:')
MIN_SECTION_LETTERS = 5


@dataclass
class Section:
    start: int
    end: int
    letters: int
    lang: str


def _dominant_script(word: str) -> str | None:
    for ch in word:
        s = script_of(ord(ch))
        if s is not None:
            return s
    return None


def split_sections(text: str) -> list[tuple[int, int]]:
    """(start, end) candidate sections split at hard boundaries and script
    changes between consecutive words."""
    bounds: list[int] = [0]
    prev_script: str | None = None
    word_start: int | None = None
    for i, ch in enumerate(text):
        if ch in HARD_BOUNDARY:
            bounds.append(i + 1)
            prev_script = None
            word_start = None
            continue
        if ch == " ":
            word_start = None
            continue
        if word_start is None:
            word_start = i
            s = script_of(ord(ch))
            if s is not None:
                if prev_script is not None and s != prev_script:
                    bounds.append(word_start)
                prev_script = s
        else:
            s = script_of(ord(ch))
            if s is not None:
                if prev_script is not None and s != prev_script:
                    bounds.append(i)
                prev_script = s
    bounds.append(len(text))
    bounds = sorted(set(bounds))
    return [
        (a, b) for a, b in zip(bounds[:-1], bounds[1:]) if b > a
    ]


MERGE_CONFIDENCE = 0.85
# only short sections (the reference flags < ~25 letters as unreliable —
# api/LanguageDetector.kt:141-146) may be absorbed by confidence overlap
SHORT_SECTION_LETTERS = 25


def detect_multi_language(
    detector: LinguaDetector, text: str
) -> list[dict]:
    raw: list[tuple[Section, dict[str, float]]] = []
    for a, b in split_sections(text):
        seg = text[a:b]
        letters = sum(1 for c in seg if is_letter(c))
        if letters == 0:
            continue
        conf = dict(detector.confidence_values(seg))
        lang = detector._language_from_confidences(
            sorted(conf.items(), key=lambda lv: -lv[1])
        ) if conf else UNKNOWN
        raw.append((Section(a, b, letters, lang), conf))

    if not raw:
        return []

    # Confidence-overlap merging (approximates the reference's merge
    # heuristics, MultiLanguageDetection.kt:446-539): a section is absorbed
    # by a neighbor whose language it also considers likely.
    def absorbable(conf: dict[str, float], lang: str) -> bool:
        return conf.get(lang, 0.0) >= MERGE_CONFIDENCE

    # forward pass: merge into the previous section
    fwd: list[tuple[Section, dict[str, float]]] = []
    for s, conf in raw:
        if fwd:
            prev, prev_conf = fwd[-1]
            if (
                s.lang == prev.lang
                or (s.letters < MIN_SECTION_LETTERS and s.lang == UNKNOWN)
                or (
                    s.letters < SHORT_SECTION_LETTERS
                    and absorbable(conf, prev.lang)
                )
            ):
                fwd[-1] = (
                    Section(
                        prev.start, s.end, prev.letters + s.letters, prev.lang
                    ),
                    prev_conf,
                )
                continue
        fwd.append((s, conf))

    # backward pass: absorb into the following section
    bwd: list[tuple[Section, dict[str, float]]] = []
    for s, conf in reversed(fwd):
        if bwd:
            nxt, nxt_conf = bwd[-1]
            if s.lang == nxt.lang or (
                s.letters < SHORT_SECTION_LETTERS
                and absorbable(conf, nxt.lang)
            ):
                bwd[-1] = (
                    Section(
                        s.start, nxt.end, s.letters + nxt.letters, nxt.lang
                    ),
                    nxt_conf,
                )
                continue
        bwd.append((s, conf))
    merged = [s for s, _ in reversed(bwd)]

    return [
        {"start": s.start, "end": s.end, "letters": s.letters, "lang": s.lang}
        for s in merged
    ]


class MultiLangSections:
    """map_batches actor stage: text -> list<struct> sections column."""

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
                ]
            )
        )
        return batch.append_column("sections", pa.array(secs, typ))
