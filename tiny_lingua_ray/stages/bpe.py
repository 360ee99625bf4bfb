"""Byte-pair-encoding tokenizer training and application (Sennrich,
Haddow & Birch 2016, arXiv:1508.07909 — the public BPE algorithm every
modern LLM tokenizer descends from).

Two pieces, both Ray-Data-shaped:

- ``bpe_fit``: learn a merge table from a (word, cnt) frequency table.
  The frequency table comes from the repo's exact distributed word
  count (one word-hash-sharded shuffle; a word's global count lives in
  one shard) capped at the top-V words — the classic trainer operates
  on the word-frequency DICT, never the corpus, so the driver holds
  <= V rows regardless of corpus size.  Pair counting per iteration is
  vectorized: words are int32 symbol-id arrays, adjacent pairs pack
  into int64 keys, ``np.unique`` + ``np.bincount`` (freq-weighted)
  count every pair in one shot.  Ties break (count DESC, (left, right)
  lexicographic ASC) so the table is deterministic.
- ``BpeEncoder``: a stateful map_batches actor — ``__init__`` builds
  the rank dict from the broadcast merge table ONCE, ``__call__``
  encodes each batch with a per-word memo cache (Zipf makes the cache
  hit rate ~word-frequency-weighted, so the per-doc cost is near the
  cache-lookup floor).

No counterpart in the reference (tiny-lingua stops at n-gram models);
the operator belongs to the LLM-pipeline extension surface, next to
build_vocab / tokenize_docs (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EOW = "</w>"  # end-of-word marker (Sennrich's scheme)


def bpe_fit(
    words: list[str],
    counts: np.ndarray,
    num_merges: int = 200,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a word-frequency table.

    Returns the ordered merge list [(left, right), ...]; stops early
    when no pair occurs at least twice (weighted)."""
    counts = np.asarray(counts, dtype=np.int64)
    vocab: dict[str, int] = {}

    def sym_id(s: str) -> int:
        if s not in vocab:
            vocab[s] = len(vocab)
        return vocab[s]

    seqs = [
        np.fromiter(
            (sym_id(c) for c in list(w) + [EOW]),
            dtype=np.int64,
            count=len(w) + 1,
        )
        for w in words
    ]
    merges: list[tuple[str, str]] = []
    names: list[str] = [None] * 0  # id -> symbol string, rebuilt lazily

    for _ in range(num_merges):
        # vectorized weighted pair count over all words
        pair_chunks = []
        w_chunks = []
        for seq, c in zip(seqs, counts):
            if len(seq) < 2:
                continue
            pair_chunks.append(seq[:-1] << np.int64(32) | seq[1:])
            w_chunks.append(np.full(len(seq) - 1, c, dtype=np.int64))
        if not pair_chunks:
            break
        pairs = np.concatenate(pair_chunks)
        wts = np.concatenate(w_chunks)
        uniq, inv = np.unique(pairs, return_inverse=True)
        tot = np.bincount(inv, weights=wts).astype(np.int64)
        best = int(tot.max())
        if best < 2:
            break
        # deterministic tie-break: among max-count pairs, smallest
        # (left, right) symbol-string tuple
        names = [None] * len(vocab)
        for s, i in vocab.items():
            names[i] = s
        cand = uniq[tot == best]
        key = min(
            (names[int(p) >> 32], names[int(p) & 0xFFFFFFFF])
            for p in cand
        )
        merges.append(key)
        new_sym = key[0] + key[1]
        nid = sym_id(new_sym)
        li, ri = vocab[key[0]], vocab[key[1]]
        target = np.int64(li) << np.int64(32) | np.int64(ri)
        for j, seq in enumerate(seqs):
            if len(seq) < 2:
                continue
            hits = np.flatnonzero(
                (seq[:-1] << np.int64(32) | seq[1:]) == target
            )
            if not len(hits):
                continue
            # collapse left-to-right, skipping overlaps (aab: one merge)
            keep = []
            last = -2
            for h in hits:
                if h > last + 1:
                    keep.append(h)
                    last = h
            out = []
            i = 0
            kset = set(keep)
            while i < len(seq):
                if i in kset:
                    out.append(nid)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[j] = np.asarray(out, dtype=np.int64)
    return merges


def encode_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges greedily by rank order — the standard BPE encoder."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """Actor-pool encode stage: merge table resolved once per actor in
    ``__init__`` (broadcast ref or plain list), per-word memo cache in
    ``__call__``; appends int64 ``n_tokens_bpe_trained``."""

    CACHE_CAP = 500_000  # Zipf: frequent words enter early; rare words
    # past the cap re-encode (bounded actor heap on web-scale vocab)

    def __init__(self, merges_ref, text_column: str = "text"):
        from tiny_lingua_ray.tableutil import deref

        merges = deref(merges_ref)
        self.rank = {tuple(m): i for i, m in enumerate(merges)}
        self.text_column = text_column
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = np.zeros(batch.num_rows, dtype=np.int64)
        cache, rank, cap = self.cache, self.rank, self.CACHE_CAP
        for i, t in enumerate(batch.column(self.text_column).to_pylist()):
            tot = 0
            for w in (t or "").lower().split(" "):
                if not w:
                    continue
                c = cache.get(w)
                if c is None:
                    c = len(encode_word(w, rank))
                    if len(cache) < cap:
                        cache[w] = c
                tot += c
            n[i] = tot
        return batch.append_column(
            "n_tokens_bpe_trained", pa.array(n)
        )
