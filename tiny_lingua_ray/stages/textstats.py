"""Text analysis operators: token counting, quality scoring, language
heuristics, document fingerprinting (rolling hash).

All stateless map_batches functions over a text column.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# ASCII-only \s to match the DuckDB oracle's RE2 semantics (RE2 \s is
# ASCII-only; Unicode whitespace like NBSP must NOT split tokens)
_WS_SPLIT = re.compile(r"\s+", re.ASCII)
# BPE-ish subword token estimate: letter runs, digit runs, single punct
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def token_count_batch(
    batch: pa.Table, text_column: str = "text", id_column: str = "doc_id"
) -> pa.Table:
    texts = batch.column(text_column).to_pylist()
    ws = np.zeros(len(texts), dtype=np.int64)
    bpe = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        # strip spaces only — the oracle's trim() strips ' ' while Python
        # .strip() would strip all Unicode whitespace
        t = (t or "").strip(" ")
        ws[i] = len(_WS_SPLIT.split(t)) if t else 0
        bpe[i] = len(_BPE_RE.findall(t))
    return pa.table(
        {
            id_column: batch.column(id_column),
            "n_tokens_ws": pa.array(ws),
            "n_tokens_bpe": pa.array(bpe),
        }
    )


def fingerprint_batch(
    batch: pa.Table,
    text_column: str = "text",
    id_column: str = "doc_id",
    window: int = 8,
) -> pa.Table:
    """Winnowing-style fingerprint: min rolling-hash over char windows.

    A deterministic 64-bit document fingerprint robust to local edits
    (public winnowing / Rabin-Karp scheme).
    """
    from tiny_lingua_ray.models.train import fnv1a_64

    texts = batch.column(text_column).to_pylist()
    fps = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        t = (t or "").lower()
        if len(t) < window:
            fps[i] = np.uint64(fnv1a_64(t))
            continue
        best = None
        for j in range(len(t) - window + 1):
            h = fnv1a_64(t[j : j + window])
            if best is None or h < best:
                best = h
        fps[i] = np.uint64(best)
    return pa.table(
        {
            id_column: batch.column(id_column),
            "fingerprint": pa.array(fps),
        }
    )


# crude n-gram language-family heuristic (no models): most common script +
# top trigram hit against tiny per-family profiles. This is intentionally a
# lightweight alternative to LangIdScorer for pre-filtering.
_FAMILY_TRIGRAMS = {
    "en": (" th", "the", "he ", "ing", "and"),
    "de": ("en ", "er ", "ch ", "der", "sch"),
    "fr": ("es ", "de ", "le ", "ent", "ion"),
    "es": ("de ", "os ", "la ", "ión", "ent"),
}


def lang_heuristic_batch(
    batch: pa.Table, text_column: str = "text", id_column: str = "doc_id"
) -> pa.Table:
    texts = batch.column(text_column).to_pylist()
    out = []
    for t in texts:
        t = (t or "").lower()
        best, best_hits = "unknown", 0
        for lang, grams in _FAMILY_TRIGRAMS.items():
            hits = sum(t.count(g) for g in grams)
            if hits > best_hits:
                best, best_hits = lang, hits
        out.append(best)
    return pa.table(
        {
            id_column: batch.column(id_column),
            "lang_heuristic": pa.array(out, pa.string()),
        }
    )
