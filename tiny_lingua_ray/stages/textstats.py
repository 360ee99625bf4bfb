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
    scheme: str = "md5",
) -> pa.Table:
    """Winnowing-style fingerprint: min hash over sliding char windows of
    the lowercased text (public winnowing / Rabin-Karp scheme) — a
    deterministic document fingerprint robust to local edits.

    ``scheme="md5"`` (default) emits the lexicographic min of the hex md5
    of each window — oracle-verifiable in DuckDB (min(md5(substring)));
    ``scheme="fnv"`` emits the numeric min of 64-bit FNV-1a hashes — the
    cheaper scale path (~6x faster per window, 8-byte outputs).
    """
    import hashlib

    from tiny_lingua_ray.models.train import fnv1a_64

    texts = batch.column(text_column).to_pylist()
    if scheme == "fnv":
        fps_u = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            t = (t or "").lower()
            if len(t) < window:
                fps_u[i] = np.uint64(fnv1a_64(t))
                continue
            best = min(
                fnv1a_64(t[j : j + window])
                for j in range(len(t) - window + 1)
            )
            fps_u[i] = np.uint64(best)
        fp_arr = pa.array(fps_u)
    else:
        fps: list[str] = []
        for t in texts:
            t = (t or "").lower()
            enc = t.encode("utf-8")
            if len(t) < window:
                fps.append(hashlib.md5(enc).hexdigest())
                continue
            if enc.isascii():  # byte windows == char windows
                fps.append(
                    min(
                        hashlib.md5(enc[j : j + window]).hexdigest()
                        for j in range(len(enc) - window + 1)
                    )
                )
            else:
                fps.append(
                    min(
                        hashlib.md5(t[j : j + window].encode("utf-8")).hexdigest()
                        for j in range(len(t) - window + 1)
                    )
                )
        fp_arr = pa.array(fps, pa.string())
    return pa.table(
        {
            id_column: batch.column(id_column),
            "fingerprint": fp_arr,
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


def compression_ratio_batch(
    batch: pa.Table, text_column: str = "text", id_column: str = "doc_id"
) -> pa.Table:
    """Per-doc zlib compression ratio — the redundancy signal RefinedWeb
    / MassiveText-style pipelines use to catch machine-generated or
    boilerplate text that n-gram fractions miss (highly compressible =>
    repetitive).  zlib level 6 over UTF-8 bytes; ratio =
    compressed/raw (1.0 for empty docs so they are not flagged as
    repetitive).  The per-row zlib call is a C entry point (same
    pattern as the forced-per-row clean_text); no SQL analogue exists,
    so the query is rows-only with property tests."""
    import zlib

    texts = batch.column(text_column).to_pylist()
    raw = np.zeros(len(texts), dtype=np.int64)
    comp = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        raw[i] = len(b)
        comp[i] = len(zlib.compress(b, 6))
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 1.0)
    return pa.table(
        {
            id_column: batch.column(id_column),
            "raw_bytes": pa.array(raw),
            "compressed_bytes": pa.array(comp),
            "compression_ratio": pa.array(np.round(ratio, 6)),
        }
    )
