"""Gopher-style repetition signals (stateless map_batches stage).

Rae et al., "Scaling Language Models: ... Gopher" (arXiv:2112.11446,
table A1) drop documents dominated by repeated n-grams.  This stage
emits the per-document measurements a quality gate consumes:

    n_words             int64   words (single-space split, '' dropped)
    distinct_word_ratio float64 distinct words / n_words (type-token)
    top_bigram_frac     float64 occurrences of the most frequent word
                                bigram / total bigrams (0.0 if <2 words)
    top_trigram_frac    float64 same for trigrams (0.0 if <3 words)

Everything is vectorized over the WHOLE batch: one Arrow split_pattern,
one global word factorization (np.unique), then per-doc distinct/top-k
counts fall out of a single lexsort + run-length pass over composite
(doc, word...) keys — no Python loop over rows, no per-doc Counter, no
packed-integer keys that could overflow on huge batch vocabularies.
Complements stages/quality.py (which covers single-word dominance as
flag bit 8); the multi-gram fractions here are the signals that catch
the boilerplate repetition single-word dominance misses.

Reference scope note: tiny-lingua itself has no quality rules — this is
part of the LLM-training-data operator family the graft adds (like
stages/quality.py and stages/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _run_stats(doc: np.ndarray, keys: tuple[np.ndarray, ...], R: int):
    """Per-doc (n_distinct_keys, top_run_count, n_rows) where a "key" is
    the composite tuple ``keys`` and rows are grouped into (doc, *keys)
    runs by one lexsort — no integer packing, so arbitrary-width keys
    can't overflow."""
    n_rows = np.bincount(doc, minlength=R)
    if len(doc) == 0:
        z = np.zeros(R, dtype=np.int64)
        return z, z.copy(), n_rows
    order = np.lexsort((*reversed(keys), doc))
    d = doc[order]
    ks = [k[order] for k in keys]
    new_run = np.empty(len(d), dtype=bool)
    new_run[0] = True
    new_run[1:] = d[1:] != d[:-1]
    for k in ks:
        new_run[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(new_run)
    run_doc = d[starts]
    run_len = np.diff(np.append(starts, len(d)))
    n_distinct = np.bincount(run_doc, minlength=R)
    top = np.zeros(R, dtype=np.int64)
    np.maximum.at(top, run_doc, run_len)
    return n_distinct, top, n_rows


def repetition_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    col = batch.column(text_column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    R = len(col)

    la = pc.split_pattern(col, " ")
    counts = np.diff(la.offsets.to_numpy(zero_copy_only=False))
    words = np.asarray(la.values.to_pylist(), dtype=object)
    doc_idx = np.repeat(np.arange(R, dtype=np.int64), counts)
    keep = words != ""
    words = words[keep]
    doc_idx = doc_idx[keep]

    if len(words):
        _, codes = np.unique(words, return_inverse=True)
        codes = codes.astype(np.int64)
    else:
        codes = np.zeros(0, dtype=np.int64)

    n_dist, _, n_words = _run_stats(doc_idx, (codes,), R)

    # adjacent pairs/triples within the same doc
    if len(doc_idx) > 1:
        adj2 = doc_idx[1:] == doc_idx[:-1]
        bi_doc = doc_idx[:-1][adj2]
        bi_keys = (codes[:-1][adj2], codes[1:][adj2])
    else:
        adj2 = np.zeros(0, dtype=bool)
        bi_doc, bi_keys = doc_idx[:0], (codes[:0], codes[:0])
    _, bi_top, bi_n = _run_stats(bi_doc, bi_keys, R)

    if len(doc_idx) > 2:
        adj3 = adj2[:-1] & adj2[1:]
        tri_doc = doc_idx[:-2][adj3]
        tri_keys = (codes[:-2][adj3], codes[1:-1][adj3], codes[2:][adj3])
    else:
        tri_doc, tri_keys = doc_idx[:0], (codes[:0], codes[:0], codes[:0])
    _, tri_top, tri_n = _run_stats(tri_doc, tri_keys, R)

    with np.errstate(divide="ignore", invalid="ignore"):
        dratio = np.where(n_words > 0, n_dist / n_words, 0.0)
        bfrac = np.where(bi_n > 0, bi_top / bi_n, 0.0)
        tfrac = np.where(tri_n > 0, tri_top / tri_n, 0.0)

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words.astype(np.int64)),
            "distinct_word_ratio": pa.array(np.round(dratio, 6)),
            "top_bigram_frac": pa.array(np.round(bfrac, 6)),
            "top_trigram_frac": pa.array(np.round(tfrac, 6)),
        }
    )
