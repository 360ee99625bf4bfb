"""BPE trainer/encoder (stages/bpe.py): exact parity with an
independent dict-based reference implementation, encoder properties,
and the corpus-level queries."""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def ref_bpe(words, counts, k):
    """Textbook BPE trainer (Sennrich et al. 2016, Algorithm 1):
    dict-based pair counting, left-to-right overlap-skipping merges,
    (count DESC, pair ASC) tie-break.  Deliberately a different code
    path from stages/bpe.bpe_fit's vectorized counting."""
    seqs = [list(w) + ["</w>"] for w in words]
    merges = []
    for _ in range(k):
        pc: Counter = Counter()
        for syms, c in zip(seqs, counts):
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = max(pc.values())
        if best < 2:
            break
        pair = min(p for p, c in pc.items() if c == best)
        merges.append(pair)
        ns = pair[0] + pair[1]
        for j, syms in enumerate(seqs):
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(ns)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[j] = out
    return merges


def test_bpe_fit_matches_reference_classic():
    """The Sennrich paper's own example corpus."""
    from tiny_lingua_ray.stages.bpe import bpe_fit

    words = ["low", "lower", "newest", "widest"]
    counts = np.array([5, 2, 6, 3])
    assert bpe_fit(words, counts, 10) == ref_bpe(words, counts, 10)


def test_bpe_fit_matches_reference_random():
    """Parity on 300 random words incl. repeats/overlap cases (aaa)."""
    from tiny_lingua_ray.stages.bpe import bpe_fit

    rng = np.random.RandomState(3)
    words = list(
        {
            "".join(chr(97 + c) for c in rng.randint(0, 5, rng.randint(1, 9)))
            for _ in range(300)
        }
    )
    words.sort()
    counts = rng.randint(1, 50, len(words))
    got = bpe_fit(words, counts, 40)
    want = ref_bpe(words, counts, 40)
    assert got == want


def test_encode_word_applies_merges_by_rank():
    from tiny_lingua_ray.stages.bpe import bpe_fit, encode_word

    words = ["low", "lower", "newest", "widest"]
    counts = np.array([5, 2, 6, 3])
    merges = bpe_fit(words, counts, 10)
    rank = {tuple(m): i for i, m in enumerate(merges)}
    # zero merges: every char + the EOW marker
    assert len(encode_word("low", {})) == 4
    # trained words compress below the char ceiling
    assert len(encode_word("lowest", rank)) < 7
    # unseen chars survive as single symbols (no merge applies)
    assert encode_word("zzz", rank) == ["z", "z", "z", "</w>"]


def test_bpe_queries_on_corpus(ray_session):
    """q_bpe_merges is deterministic and non-trivial; q_bpe_encode's
    trained token counts sit between the word count (>=1 token/word)
    and the character ceiling, and strictly beat the no-merge baseline
    somewhere."""
    from tiny_lingua_ray.pipelines.corpus_ext import (
        q_bpe_encode,
        q_bpe_merges,
    )

    m1 = q_bpe_merges(SF_DIR)
    m2 = q_bpe_merges(SF_DIR)
    assert m1.equals(m2)
    assert len(m1) > 10
    assert (m1["merged"] == m1["left"] + m1["right"]).all()

    enc = q_bpe_encode(SF_DIR).to_pandas()
    assert len(enc) == 500
    import pyarrow.parquet as pq

    texts = {
        d: t
        for d, t in zip(
            *[
                pq.read_table(
                    f"{SF_DIR}/documents.parquet",
                    columns=["doc_id", "text"],
                )
                .column(c)
                .to_pylist()
                for c in ("doc_id", "text")
            ]
        )
    }
    beat_baseline = 0
    for did, n in zip(enc["doc_id"], enc["n_tokens_bpe_trained"]):
        ws = [w for w in (texts[did] or "").lower().split(" ") if w]
        ceiling = sum(len(w) + 1 for w in ws)  # no-merge symbol count
        assert len(ws) <= n <= ceiling, (did, len(ws), n, ceiling)
        if n < ceiling:
            beat_baseline += 1
    assert beat_baseline > 400  # merges actually compress the corpus
