"""Corpus-analysis extensions (round 3).

Three operators a 100-TB training-data pipeline needs beyond pairwise
dedup and frequency counts, each in the repo's standard scale shapes:

- per-language TF-IDF top terms: word-sharded cogroup so a word's
  cross-language document frequency is computed where its counts live
  (one exchange; driver merge is <= shards x langs x K rows),
- duplicate CLUSTER assignment: Jaccard-verified near-dup pairs
  (q_jaccard_pairs, fully streaming) -> distributed connected components
  (stages/cluster.py min-label propagation) -> cluster sizes.  The
  DuckDB oracle replays the whole chain with a recursive-CTE transitive
  closure — the iterative Ray algorithm is verified end to end,
- HyperLogLog approximate distinct (stages/sketch.py): constant-size
  mergeable register partials instead of the exact distinct shuffle;
  rows-only vs the driver (approximate by construction), error-bound
  asserted against the exact count in tests/test_corpus_ext.py.
"""

from __future__ import annotations

import numpy as np
from tiny_lingua_ray.tableutil import round_half_away as _rha
from tiny_lingua_ray.stages.partitioning import shards_for_table as _shards_for_table
import pandas as pd
import pyarrow as pa

from tiny_lingua_ray.tableutil import from_df as _from_df


def _str_keys(series) -> list:
    """Group-key series -> list for pa.array(..., pa.string()): a NULL
    group key (groupby dropna=False) surfaces as NaN, which pa.string()
    rejects — map it back to None."""
    return [None if pd.isna(v) else v for v in series]


def _read(sf_dir: str, table: str, columns=None, **kw):
    from tiny_lingua_ray.pipelines.queries import _read as r

    return r(sf_dir, table, columns=columns, **kw)


# ---------------------------------------------------------------------------
# Per-language TF-IDF top terms
# ---------------------------------------------------------------------------

_TFIDF_K = 5


def q_tfidf_top_terms(sf_dir: str):
    """Top-5 characteristic terms per language by TF-IDF
    (tf = term count within the language, idf = ln(#langs / #langs
    containing the term)).

    Shape: per-batch (lang, word, cnt) Counter partials ->
    groupby(hash(word) % P) — a word's rows all land in ONE shard, so
    both its per-language tf and its cross-language document frequency
    are exact shard-locally -> per-shard per-language top-5 -> driver
    merges <= P x L x 5 rows.  The language count (a scalar) is the only
    pre-pass, a distinct-partial aggregate."""
    from tiny_lingua_ray.models.train import fnv1a_64

    P = _shards_for_table(sf_dir, "documents")

    docs = _read(sf_dir, "documents", columns=["lang", "text"])

    # scalar pre-pass: number of distinct languages (per-batch distinct
    # partials; the driver sees a handful of rows)
    def distinct_langs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"lang": pc.unique(b.column("lang"))})

    langs = docs.map_batches(distinct_langs, batch_format="pyarrow").to_pandas()
    # empty corpus yields zero batches -> column-less frame from Ray
    n_langs = 0 if langs.empty else int(langs["lang"].nunique())

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: dict[str, Counter] = {}
        for lang, t in zip(
            batch.column("lang").to_pylist(), batch.column("text").to_pylist()
        ):
            c = counts.setdefault(lang, Counter())
            c.update((t or "").lower().split(" "))
        lang_col, word_col, cnt_col = [], [], []
        for lang, c in counts.items():
            c.pop("", None)
            lang_col.extend([lang] * len(c))
            word_col.extend(c.keys())
            cnt_col.extend(c.values())
        shard = np.fromiter(
            (fnv1a_64(w) % P for w in word_col),
            dtype=np.int64,
            count=len(word_col),
        )
        return pa.table(
            {
                "shard": pa.array(shard),
                "lang": pa.array(lang_col, pa.string()),
                "word": pa.array(word_col, pa.string()),
                "cnt": pa.array(cnt_col, pa.int64()),
            }
        )

    # typed ARROW output both branches: empty pandas object columns trip
    # Ray's block-size estimator on empty shards
    empty = pa.table(
        {"lang": pa.array([], pa.string()),
         "word": pa.array([], pa.string()),
         "score": pa.array([], pa.float64())}
    )

    def topk_in_shard(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return empty
        tf = df.groupby(["lang", "word"], as_index=False)["cnt"].sum()
        dfreq = tf.groupby("word")["lang"].size().rename("df")
        tf = tf.join(dfreq, on="word")
        tf["score"] = _rha(
            tf["cnt"] * np.log(n_langs / tf["df"].to_numpy()), 6
        )
        tf = tf.sort_values(
            ["lang", "score", "word"], ascending=[True, False, True]
        )
        top = tf.groupby("lang").head(_TFIDF_K)
        return pa.table(
            {
                "lang": pa.array(top["lang"].tolist(), pa.string()),
                "word": pa.array(top["word"].tolist(), pa.string()),
                "score": pa.array(top["score"].to_numpy(dtype=np.float64)),
            }
        )

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(topk_in_shard, batch_format="pandas")
        .to_pandas()  # <= P x L x K rows
    )
    if out.empty:  # empty corpus: column-less frame from Ray
        out = pd.DataFrame({"lang": [], "word": [], "score": []})
    out = out.sort_values(
        ["lang", "score", "word"], ascending=[True, False, True]
    )
    return out.groupby("lang").head(_TFIDF_K).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Duplicate clusters (connected components over verified near-dup pairs)
# ---------------------------------------------------------------------------

def q_dedup_clusters(sf_dir: str):
    """Near-duplicate clusters: Jaccard>=0.8 verified LSH pairs ->
    distributed connected components -> (cluster_id = min doc_id in the
    component, n_docs).  Only multi-doc clusters appear (an isolated doc
    is trivially its own cluster).  The oracle replays the exact pair
    set with a recursive-CTE transitive closure."""
    from tiny_lingua_ray.pipelines.queries import jaccard_pairs_dataset
    from tiny_lingua_ray.stages.cluster import connected_components

    pairs = jaccard_pairs_dataset(sf_dir)
    labels = connected_components(
        pairs, num_shards=_shards_for_table(sf_dir, "documents")
    )

    # cluster sizes: label-sharded pandas-C size (cluster count can be
    # huge at scale — never one Ray group per cluster)
    P = _shards_for_table(sf_dir, "documents")

    def tag(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy(zero_copy_only=False)
        return b.append_column("shard", pa.array(lab % P))

    empty = pd.DataFrame(
        {"cluster_id": pd.Series(dtype="int64"),
         "n_docs": pd.Series(dtype="int64")}
    )

    def sizes(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty
        g = df.groupby("label", as_index=False).size()
        return g.rename(columns={"label": "cluster_id", "size": "n_docs"})

    return (
        labels.map_batches(tag, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(sizes, batch_format="pandas")
    )


def _corpus_minus_victims(sf_dir: str, victims, P: int):
    """Anti-join a (``victim`` int64) Dataset against the corpus in ONE
    tagged-union cogroup on ``doc_id % P`` (the anti-join idiom,
    relational_ext.q_anti_join_inactive_customers) — the shared final
    stage of q_dedup_keep_first and q_dedup_keep_best.  No broadcast:
    on boilerplate-heavy web text victims can be half the corpus.  Kept
    rows carry (doc_id, lang) only; a real pipeline would semi-join
    text back where it lives rather than shipping it through the
    anti-join."""

    def prep_victims(b: pa.Table) -> pa.Table:
        v = b.column("victim").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "shard": pa.array(v % P),
                "key": pa.array(v),
                "lang": pa.nulls(len(v), pa.string()),
                "side": pa.array(np.ones(len(v), dtype=np.int8)),
            }
        )

    def prep_docs(b: pa.Table) -> pa.Table:
        key = b.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "shard": pa.array(key % P),
                "key": pa.array(key),
                "lang": b.column("lang"),
                "side": pa.array(np.zeros(len(key), dtype=np.int8)),
            }
        )

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "lang": pa.array([], pa.string())}
    )

    def anti_in_shard(df: pd.DataFrame) -> pa.Table:
        docs = df[df["side"] == 0]
        victims_k = df.loc[df["side"] == 1, "key"]
        keep = docs[~docs["key"].isin(victims_k)]
        if len(keep) == 0:
            return empty
        return pa.table(
            {
                "doc_id": pa.array(keep["key"].to_numpy(dtype=np.int64)),
                "lang": pa.array(keep["lang"].tolist(), pa.string()),
            }
        )

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"]).map_batches(
        prep_docs, batch_format="pyarrow"
    )
    return (
        docs.union(victims.map_batches(prep_victims, batch_format="pyarrow"))
        .groupby("shard")
        .map_groups(anti_in_shard, batch_format="pandas")
    )


def q_dedup_keep_first(sf_dir: str):
    """The ACTIONABLE dedup composite: materialize the deduped corpus.
    Jaccard>=0.8 verified pairs -> connected components -> drop every
    clustered doc except its representative (min doc_id in the
    component); isolated docs survive untouched.  This is the operator a
    training-data pipeline actually runs — pair/cluster queries are its
    diagnostics.

    Scale shape: only the VICTIM set (clustered non-representatives,
    label < node) leaves the component stage — 8 B/row — into the
    shared _corpus_minus_victims anti-join cogroup."""
    from tiny_lingua_ray.pipelines.queries import jaccard_pairs_dataset
    from tiny_lingua_ray.stages.cluster import connected_components

    P = _shards_for_table(sf_dir, "documents", lo=32)
    labels = connected_components(
        jaccard_pairs_dataset(sf_dir), num_shards=P
    )

    def prep_victims(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False)
        lab = b.column("label").to_numpy(zero_copy_only=False)
        return pa.table(
            {"victim": pa.array(node[lab < node].astype(np.int64))}
        )

    return _corpus_minus_victims(
        sf_dir,
        labels.map_batches(prep_victims, batch_format="pyarrow"),
        P,
    )


def q_dedup_keep_best(sf_dir: str):
    """Keep-BEST near-dup dedup (the RefinedWeb/FineWeb representative
    policy): same Jaccard>=0.8 clusters as q_dedup_keep_first, but the
    survivor of each cluster is its highest-QUALITY member — here
    max ``n_chars`` with a min-doc_id tie-break — instead of the
    smallest doc_id.  On real web text the first-crawled copy is often
    the truncated one; keep-best retains the fullest.

    Scale shape: three linear exchanges, NONE carrying text.
    (1) the component labels (node, label; 16 B/row) cogroup the
    corpus's (doc_id, n_chars; 16 B/row) on ``doc_id % P`` to attach
    each clustered member's quality score; (2) the (label, node,
    n_chars) rows regroup on ``label % P`` where each cluster drops its
    argmax(n_chars, -doc_id) and emits the rest as victims (8 B/row);
    (3) the keep_first anti-join cogroup of victims against the corpus.
    """
    from tiny_lingua_ray.pipelines.queries import jaccard_pairs_dataset
    from tiny_lingua_ray.stages.cluster import connected_components

    P = _shards_for_table(sf_dir, "documents", lo=32)
    labels = connected_components(
        jaccard_pairs_dataset(sf_dir), num_shards=P
    )

    def prep_members(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lab = b.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "shard": pa.array(node % P),
                "key": pa.array(node),
                "label": pa.array(lab),
                "n_chars": pa.array(np.zeros(len(node), dtype=np.int64)),
                "side": pa.array(np.ones(len(node), dtype=np.int8)),
            }
        )

    def prep_quality(b: pa.Table) -> pa.Table:
        key = b.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "shard": pa.array(key % P),
                "key": pa.array(key),
                "label": pa.array(np.zeros(len(key), dtype=np.int64)),
                "n_chars": b.column("n_chars"),
                "side": pa.array(np.zeros(len(key), dtype=np.int8)),
            }
        )

    empty_members = pa.table(
        {
            "shard2": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
            "node": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
        }
    )

    def attach_quality(df: pd.DataFrame) -> pa.Table:
        mem = df[df["side"] == 1]
        if len(mem) == 0:
            return empty_members
        qual = df[df["side"] == 0].set_index("key")["n_chars"]
        nc = qual.reindex(mem["key"]).to_numpy()
        lab = mem["label"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "shard2": pa.array(lab % P),
                "label": pa.array(lab),
                "node": pa.array(mem["key"].to_numpy(dtype=np.int64)),
                "n_chars": pa.array(nc.astype(np.int64)),
            }
        )

    empty_victims = pa.table({"victim": pa.array([], pa.int64())})

    def pick_victims(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return empty_victims
        d = df.sort_values(
            ["label", "n_chars", "node"],
            ascending=[True, False, True],
            ignore_index=True,
        )
        lab = d["label"].to_numpy()
        first = np.empty(len(lab), dtype=bool)
        first[0] = True
        first[1:] = lab[1:] != lab[:-1]
        return pa.table(
            {"victim": pa.array(d["node"].to_numpy(dtype=np.int64)[~first])}
        )

    members = labels.map_batches(prep_members, batch_format="pyarrow")
    quality = _read(
        sf_dir, "documents", columns=["doc_id", "n_chars"]
    ).map_batches(prep_quality, batch_format="pyarrow")
    victims = (
        members.union(quality)
        .groupby("shard")
        .map_groups(attach_quality, batch_format="pandas")
        .groupby("shard2")
        .map_groups(pick_victims, batch_format="pandas")
    )
    return _corpus_minus_victims(sf_dir, victims, P)


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct users per event type
# ---------------------------------------------------------------------------

def q_approx_distinct_users(sf_dir: str):
    """Approximate distinct users per event type (HLL p=12, ~1.6%).
    The sketch replaces distinct_users_per_event's exact distinct
    shuffle with constant-size register partials; deterministic (FNV
    hash, order-free max-merge), but approximate by construction — no
    SQL oracle, error bound pinned in tests/test_corpus_ext.py."""
    from tiny_lingua_ray.stages.sketch import approx_distinct_by_group

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return approx_distinct_by_group(ev, "event_type", "user_id", p=12)


def q_approx_heavy_hitters(sf_dir: str):
    """Count-Min-sketch approximate top-20 words — the constant-state
    twin of word_freq_top20 (see stages/sketch.approx_heavy_hitters).
    Deterministic (fixed seeds, order-free cellwise merge) but
    approximate by construction — rows-only; over-count + error-bound +
    exact-top-agreement pinned in tests/test_corpus_ext.py."""
    from tiny_lingua_ray.stages.sketch import approx_heavy_hitters

    docs = _read(sf_dir, "documents", columns=["text"])
    return approx_heavy_hitters(docs, k=20)


def q_repetition_signals(sf_dir: str):
    """Gopher repetition measurements per doc (stages/repetition.py):
    distinct-word ratio + top bigram/trigram occurrence fractions.
    Stateless vectorized Arrow-batch map — embarrassingly parallel, no
    shuffle; the quality gate consumes these next to quality_flags."""
    from tiny_lingua_ray.stages.repetition import repetition_batch

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        repetition_batch, batch_format="pyarrow"
    )


def q_compression_ratio(sf_dir: str):
    """zlib redundancy signal per doc (stages/textstats.py) — stateless
    parallel map, no shuffle; rows-only (no SQL zlib), properties pinned
    in tests/test_corpus_ext.py."""
    from tiny_lingua_ray.stages.textstats import compression_ratio_batch

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        compression_ratio_batch, batch_format="pyarrow"
    )


def q_source_stats(sf_dir: str):
    """Per-source corpus profile: doc count, mean length, language
    spread.  Per-batch (source, lang, n, sum_chars) partials -> one
    groupby(source) -> per-group pandas-C merge; the shuffle carries
    one row per (source, lang, block), never documents."""

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "source": b.column("source"),
                "lang": b.column("lang"),
                "n_chars": b.column("n_chars"),
            }
        ).to_pandas()
        # dropna=False: SQL GROUP BY keeps NULL-keyed rows
        g = df.groupby(["source", "lang"], as_index=False, dropna=False).agg(
            n=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )
        return pa.table(
            {
                "source": pa.array(_str_keys(g["source"]), pa.string()),
                "lang": pa.array(_str_keys(g["lang"]), pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "sum_chars": pa.array(g["sum_chars"].to_numpy(np.int64)),
            }
        )

    empty = pa.table(
        {"source": pa.array([], pa.string()),
         "n_docs": pa.array([], pa.int64()),
         "avg_chars": pa.array([], pa.float64()),
         "n_langs": pa.array([], pa.int64())}
    )

    def merge(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return empty
        n = int(df["n"].sum())
        src = df["source"].iloc[0]
        return pa.table(
            {
                "source": pa.array(
                    [None if pd.isna(src) else src], pa.string()
                ),
                "n_docs": pa.array([n], pa.int64()),
                "avg_chars": pa.array(
                    [float(_rha(float(df["sum_chars"].sum()) / n, 6))]
                ),
                "n_langs": pa.array([df["lang"].nunique()], pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", columns=["source", "lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(merge, batch_format="pandas")
    )


_BALANCE_TARGET = 100  # docs per language
_BALANCE_MOD = 1_000_000


def q_lang_balanced_sample(sf_dir: str):
    """Corpus balancing: deterministic per-language downsampling toward
    ``_BALANCE_TARGET`` docs/language.  Two passes: a tiny per-language
    count aggregate, then a broadcast integer threshold per language and
    a hash filter — rate = target*MOD // n_lang compared against
    md5(doc_id) % MOD, all-integer so DuckDB replays it bit-exactly
    (the md5-vs-FNV verifiability trade is the q_hash_split one;
    relational_ext._rank_hash documents the vectorized production
    scheme).  No shuffle of the corpus — the only exchange is the
    per-language count."""
    from tiny_lingua_ray.stages.dedup import _md5_lower64_batch

    counts = (
        _read(sf_dir, "documents", columns=["lang"])
        .groupby("lang")
        .count()
        .to_pandas()
    )
    thresh = {
        r["lang"]: min(
            _BALANCE_MOD,
            (_BALANCE_TARGET * _BALANCE_MOD) // int(r["count()"]),
        )
        for _, r in counts.iterrows()
    }

    def pick(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        h = _md5_lower64_batch([str(int(i)) for i in ids])
        t = np.fromiter(
            (thresh.get(lang, 0) for lang in b.column("lang").to_pylist()),
            dtype=np.uint64,
            count=len(ids),
        )
        return b.filter(pa.array(h % np.uint64(_BALANCE_MOD) < t))

    return _read(sf_dir, "documents", columns=["doc_id", "lang"]).map_batches(
        pick, batch_format="pyarrow"
    )


_PACK_BUDGET = 512  # tokens per training shard/bin


def q_pack_sequences(sf_dir: str):
    """Token-budget sequence packing (the LLM pre-training sharding
    step): within each language, in doc_id order, assign each doc the
    bin ``floor(cumulative_tokens_before / budget)`` — greedy contiguous
    packing into ~512-token training shards.

    DISTRIBUTED PREFIX SUM, no global sort and no per-language
    materialization: (1) strip text to 24 B/row (doc_id, lang,
    n_tokens) partials; (2) RANGE-shard on doc_id (shard = id*P//(max+1),
    order-preserving across shards); (3) per-shard sorted cumsum plus a
    per-(shard, lang) total — the totals (P x L rows) come to the
    driver, which computes exclusive prefix offsets; (4) a broadcast
    offset map finishes each row's global running count batch-locally.
    The corpus text is read once; only the tiny triple rides the one
    exchange.  The oracle is the SQL window
    SUM() OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)."""
    P = _shards_for_table(sf_dir, "documents")

    # pass 0: max doc_id (order-free aggregate) for range sharding —
    # over a doc_id-ONLY read so the text column is decompressed exactly
    # once (in the tokens pass below)
    from ray.data.aggregate import Max

    max_agg = _read(sf_dir, "documents", columns=["doc_id"]).aggregate(
        Max("doc_id", alias_name="m")
    )["m"]
    if max_agg is None:  # empty corpus: Max aggregate is None
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "lang": pa.array([], pa.string()),
                 "n_tokens": pa.array([], pa.int64()),
                 "bin_id": pa.array([], pa.int64())}
            )
        )
    max_id = int(max_agg)
    span = max_id + 1
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def tokens_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        la = pc.split_pattern(pc.fill_null(col, ""), " ")
        cnt = np.diff(la.offsets.to_numpy(zero_copy_only=False))
        # non-empty word count: total items minus zero-LENGTH items per
        # doc — lengths come from the Arrow utf8_length kernel, no
        # Python string materialization
        lens = pc.utf8_length(la.values).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
        n_empty = np.bincount(doc_idx[lens == 0], minlength=len(cnt))
        n_tok = (cnt - n_empty).astype(np.int64)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "shard": pa.array(ids * P // span),
                "doc_id": pa.array(ids),
                "lang": b.column("lang"),
                "n_tokens": pa.array(n_tok),
            }
        )

    triples = docs.map_batches(
        tokens_partial, batch_format="pyarrow"
    ).materialize()

    # per-(shard, lang) totals -> exclusive prefix offsets on the driver
    def shard_totals(b: pa.Table) -> pa.Table:
        df = pa.table(
            {"shard": b.column("shard"), "lang": b.column("lang"),
             "n_tokens": b.column("n_tokens")}
        ).to_pandas()
        g = df.groupby(
            ["shard", "lang"], as_index=False, dropna=False
        )["n_tokens"].sum()
        return pa.table(
            {
                "shard": pa.array(g["shard"].to_numpy(np.int64)),
                "lang": pa.array(_str_keys(g["lang"]), pa.string()),
                "tot": pa.array(g["n_tokens"].to_numpy(np.int64)),
            }
        )

    totals = (
        triples.map_batches(shard_totals, batch_format="pyarrow")
        .to_pandas()
        .groupby(["shard", "lang"], as_index=False)["tot"]
        .sum()
        .sort_values(["lang", "shard"])
    )
    totals["offset"] = (
        totals.groupby("lang", dropna=False)["tot"].cumsum()
        - totals["tot"]
    )
    offsets = {
        (int(r["shard"]), r["lang"]): int(r["offset"])
        for _, r in totals.iterrows()
    }

    import ray

    off_ref = ray.put(offsets)

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "lang": pa.array([], pa.string()),
         "n_tokens": pa.array([], pa.int64()),
         "bin_id": pa.array([], pa.int64())}
    )

    def pack_in_shard(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return empty
        offs = ray.get(off_ref)
        shard = int(df["shard"].iloc[0])
        df = df.sort_values("doc_id", ignore_index=True)
        cum_before = (
            df.groupby("lang", dropna=False)["n_tokens"].cumsum()
            - df["n_tokens"]
        ).to_numpy(np.int64)
        base = np.fromiter(
            (offs.get((shard, lang), 0) for lang in df["lang"]),
            dtype=np.int64,
            count=len(df),
        )
        bins = (cum_before + base) // _PACK_BUDGET
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "lang": pa.array(df["lang"].tolist(), pa.string()),
                "n_tokens": pa.array(df["n_tokens"].to_numpy(np.int64)),
                "bin_id": pa.array(bins),
            }
        )

    return (
        triples.groupby("shard")
        .map_groups(pack_in_shard, batch_format="pandas")
    )


_N_PROBES = 5
_PROBE_LEN = 40


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag corpus documents containing any
    eval-set probe string (the n-gram-overlap check every serious
    training-data pipeline runs before training).  Probes here are
    derived deterministically from the corpus itself (first 40 chars of
    doc_id < 5) so the oracle can replay them; a real run would load
    them from the benchmark files.

    Shape: the probe set is tiny -> broadcast once (ray.put); matching
    is ``pc.match_substring`` per probe — an Arrow C++ kernel per
    (probe, batch), no Python row loop; the corpus never shuffles."""
    import pyarrow.compute as pc
    import ray

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    probe_rows = docs.map_batches(
        lambda b: b.filter(
            pc.less(b.column("doc_id"), _N_PROBES)
        ),
        batch_format="pyarrow",
    ).to_pandas()
    if probe_rows.empty:  # empty corpus: column-less frame from Ray
        probe_rows = pd.DataFrame({"doc_id": [], "text": []})
    probe_rows = probe_rows.sort_values("doc_id")
    probes = [
        (int(r["doc_id"]), (r["text"] or "")[:_PROBE_LEN])
        for _, r in probe_rows.iterrows()
    ]
    p_ref = ray.put(probes)

    def scan(b: pa.Table) -> pa.Table:
        ps = ray.get(p_ref)
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        hits = np.zeros(len(ids), dtype=np.int64)
        for pid, probe in ps:
            m = pc.match_substring(col, probe).to_numpy(
                zero_copy_only=False
            )
            hits += m & (ids != pid)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_probe_hits": pa.array(hits),
                "contaminated": pa.array(hits > 0),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow")


def q_approx_quantiles_chars(sf_dir: str):
    """Histogram-sketch approximate quantiles of n_chars (p50/p90/p99)
    — the constant-state twin of the exact distributed percentiles
    (relational_ext.q_percentiles_chars): one (min, max) aggregate fixes
    2048 bins, per-batch bincounts ride the shuffle as (bin, n) rows,
    the driver cumsums <=2048 rows and interpolates.  The guarantee is
    on RANK: the estimate's empirical CDF reaches q while one bin width
    lower does not (value error is unbounded on gappy integer data —
    asserted as the rank-bracket property in tests/test_corpus_ext.py);
    rows-only by construction."""
    from ray.data.aggregate import Max, Min, Sum

    B = 2048
    docs = _read(sf_dir, "documents", columns=["n_chars"])
    mm = docs.aggregate(
        Min("n_chars", alias_name="lo"), Max("n_chars", alias_name="hi")
    )
    if mm["lo"] is None:  # empty corpus: no quantiles
        return pd.DataFrame({"quantile": [], "estimate": []})
    lo, hi = int(mm["lo"]), int(mm["hi"])
    width = max((hi - lo) / B, 1e-9)

    def hist_partial(b: pa.Table) -> pa.Table:
        v = b.column("n_chars").to_numpy(zero_copy_only=False)
        bins = np.minimum(((v - lo) / width).astype(np.int64), B - 1)
        cnt = np.bincount(bins, minlength=B)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"bin": pa.array(nz.astype(np.int64)),
             "n": pa.array(cnt[nz].astype(np.int64))}
        )

    hist = (
        docs.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bin")
    )
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1])
    out = []
    for q in (0.5, 0.9, 0.99):
        target = q * total
        i = int(np.searchsorted(cum, target))
        est = lo + (int(hist["bin"].iloc[min(i, len(hist) - 1)]) + 1) * width
        out.append((q, round(float(est), 6)))
    return pd.DataFrame(out, columns=["quantile", "estimate"])


def q_incremental_dedup(sf_dir: str):
    """Single-run view of the persistent-index incremental dedup
    (state/dedup_index.py): with a FRESH index the semantics reduce to
    exact keep-first, which the SQL window oracle verifies; the
    cross-run index semantics (the operator's real purpose) are pinned
    in tests/test_dedup_index.py."""
    import shutil
    import tempfile

    import ray.data as rd

    from tiny_lingua_ray.state.dedup_index import incremental_exact_dedup

    state = tempfile.mkdtemp(prefix="tlr_dedup_index_")
    try:
        out = incremental_exact_dedup(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text"],
            ),
            state,
            num_shards=_shards_for_table(sf_dir, "documents"),
        ).to_pandas()
    finally:
        shutil.rmtree(state, ignore_errors=True)
    if out.empty:  # empty corpus: column-less frame from Ray
        return pd.DataFrame({"doc_id": [], "is_new": []}).astype(
            {"doc_id": np.int64, "is_new": bool}
        )
    return out.sort_values("doc_id", ignore_index=True)[
        ["doc_id", "is_new"]
    ]


def _dedup_clusters_oracle(jaccard_pairs_sql: str) -> str:
    """Composed by queries.py from its own jaccard_pairs oracle so the
    pair set being closed over is literally the verified one."""
    return f"""
        WITH RECURSIVE pairs AS ({jaccard_pairs_sql}),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION
          SELECT id_b AS u, id_a AS v FROM pairs),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        lab AS (SELECT u AS node, MIN(v) AS mn FROM reach GROUP BY u)
        SELECT CAST(LEAST(node, mn) AS BIGINT) AS cluster_id,
               COUNT(*) AS n_docs
        FROM lab GROUP BY 1
    """


def _dedup_keep_first_oracle(jaccard_pairs_sql: str) -> str:
    """Composed from the verified jaccard_pairs oracle: close over the
    pair set, victims are nodes with a smaller reachable id, keep the
    complement of the victim set."""
    return f"""
        WITH RECURSIVE pairs AS ({jaccard_pairs_sql}),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION
          SELECT id_b AS u, id_a AS v FROM pairs),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        victims AS (
          SELECT u AS node FROM reach GROUP BY u HAVING MIN(v) < u)
        SELECT d.doc_id, d.lang
        FROM documents d
        WHERE d.doc_id NOT IN (SELECT node FROM victims)
    """


def _dedup_keep_best_oracle(jaccard_pairs_sql: str) -> str:
    """Composed from the verified jaccard_pairs oracle: transitive
    closure -> per-cluster rank by (n_chars DESC, doc_id ASC) -> the
    complement of every rank>1 member survives."""
    return f"""
        WITH RECURSIVE pairs AS ({jaccard_pairs_sql}),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION
          SELECT id_b AS u, id_a AS v FROM pairs),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        lab AS (SELECT u AS node, LEAST(u, MIN(v)) AS cid
                FROM reach GROUP BY u),
        ranked AS (
          SELECT l.node, ROW_NUMBER() OVER (
            PARTITION BY l.cid ORDER BY d.n_chars DESC, l.node ASC) AS rn
          FROM lab l JOIN documents d ON d.doc_id = l.node),
        victims AS (SELECT node FROM ranked WHERE rn > 1)
        SELECT d.doc_id, d.lang FROM documents d
        WHERE d.doc_id NOT IN (SELECT node FROM victims)
    """


# ---------------------------------------------------------------------------
# Skew-aware salted map_groups (explicit hot-key handling)
# ---------------------------------------------------------------------------

_TOPW_K = 5


def q_lang_word_top5(sf_dir: str):
    """Top-5 words per language via EXPLICIT hot-key salting
    (stages/partitioning.salted_map_groups): ``lang`` is genuinely
    Zipf-skewed in the corpus (en ~ 44% of rows), so a naive
    ``groupby("lang").map_groups(count words)`` ships almost half the
    text to ONE reducer.  Instead: detect hot keys with a counting
    pre-pass, spread each hot key over n_salt (lang, salt) groups whose
    per-group word counts are the mergeable partials, then merge the
    (word-cardinality, text-free) partials per lang and take top-5.

    Demonstrates level-3 skew handling (true map_groups semantics);
    for a plain top-k the level-1 batch-partial idiom
    (q_word_freq_top20) needs no grouping on the skewed key at all."""
    from tiny_lingua_ray.stages.partitioning import salted_map_groups

    def count_words(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in df["text"]:
            c.update((t or "").lower().split(" "))
        c.pop("", None)
        return pd.DataFrame(
            {
                "lang": df["lang"].iloc[0],
                "word": list(c.keys()),
                "cnt": np.fromiter(c.values(), dtype=np.int64, count=len(c)),
            }
        )

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", as_index=False)["cnt"].sum()
        g["lang"] = df["lang"].iloc[0]
        g = g.sort_values(
            ["cnt", "word"], ascending=[False, True], ignore_index=True
        ).head(_TOPW_K)
        return g[["lang", "word", "cnt"]]

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    return salted_map_groups(
        ds,
        "lang",
        count_words,
        merge_topk,
        n_salt=8,
        hot_threshold=0.25,
    )


_WIN_W, _WIN_S = 15, 5          # window width / stride (words)


def q_window_dedup(sf_dir: str, payload: str = "hash128"):
    """Exact overlapping-WINDOW substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 — the ExactSubstr family, word-granular): every
    ``_WIN_W``-word window at stride ``_WIN_S`` is hash-routed to ONE
    shard; a window is a duplicate iff an earlier (doc_id, wno)
    key holds the same window (global first-occurrence, the
    repo's standard keep-first rule — catches cross-doc boilerplate AND
    in-doc self-repetition).  The stride grid is the documented
    approximation of suffix-array ExactSubstr: a shared run is caught
    when its offsets in the two docs agree mod ``_WIN_S`` (always true
    for whole-doc copies, shared prefixes, and stride-aligned
    boilerplate; ``_WIN_S=1`` degenerates to full W-gram matching at
    W-gram cost).  Per doc: window count,
    duplicate-window count, and is_dup = (2 * n_dup >= n_windows) — an
    integer comparison, no float crosses the hash.  Docs shorter than
    one window are excluded (matched by the oracle's len filter).

    Payload modes (VERDICT r4 item 3): the default ``hash128`` routes
    and first-occurrence-compares a 128-bit md5 of each window — 16 B
    per window through the exchange instead of the ~90 B window string
    (W=15 words), i.e. the all-to-all carries ~0.35× the corpus text
    volume rather than ~3×; equality-of-md5 == equality-of-string up to
    a 2^-128-per-pair collision (≈1.5e-15 aggregate at 10^12 windows —
    the same trust contract as CCNet's SHA1 paragraph dedup).
    ``payload="strings"`` ships and compares the window strings
    themselves — the exact-semantics oracle mode, byte-faithful to the
    SQL oracle's ``PARTITION BY win``.

    Scale shape: stateless chunker -> ONE window-hash exchange
    (size-derived fan-out; groups hold 16 B hash + packed key rows)
    -> per-doc count merge on a doc-hash exchange.  Two exchanges total,
    no driver materialization."""
    import hashlib

    W, S = _WIN_W, _WIN_S
    P = _shards_for_table(sf_dir, "documents")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    hashed = payload == "hash128"

    def windows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        did, wno, win = [], [], []
        for i, t in zip(ids, texts):
            ws = (t or "").split(" ")
            if len(ws) < W:
                continue
            for k, j in enumerate(range(0, len(ws) - W + 1, S)):
                did.append(i)
                wno.append(k)
                win.append(" ".join(ws[j:j + W]))
        if hashed:
            dig = b"".join(
                hashlib.md5(w.encode("utf-8", "surrogatepass")).digest()
                for w in win
            )
            h128 = np.frombuffer(dig, dtype=np.uint64).reshape(-1, 2)
            cols = {
                "h_hi": pa.array(h128[:, 0].view(np.int64)),
                "h_lo": pa.array(h128[:, 1].view(np.int64)),
            }
            shard = (h128[:, 1] % np.uint64(P)).astype(np.int64)
        else:
            from tiny_lingua_ray.models.train import fnv1a_64_batch

            cols = {"win": pa.array(win, pa.string())}
            shard = (fnv1a_64_batch(win) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "shard": pa.array(shard),
                "doc_id": pa.array(did, pa.int64()),
                "wno": pa.array(wno, pa.int64()),
                **cols,
            }
        )

    empty_flags = pa.table(
        {
            "shard2": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "dup": pa.array([], pa.int64()),
        }
    )
    key_cols = ["h_hi", "h_lo"] if hashed else ["win"]

    def flag_in_shard(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return empty_flags
        # first occurrence by (key, doc_id, wno) TUPLE order — no
        # packed integer key, so no window-count ceiling per doc
        # (the shard hash only routes; the key columns decide equality)
        d = df.sort_values(key_cols + ["doc_id", "wno"])
        dup = d.duplicated(key_cols).to_numpy().astype(np.int64)
        doc = d["doc_id"].to_numpy()
        return pa.table(
            {
                "shard2": pa.array((doc % P).astype(np.int64)),
                "doc_id": pa.array(doc, pa.int64()),
                "dup": pa.array(dup),
            }
        )

    empty_out = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_windows": pa.array([], pa.int64()),
            "n_dup": pa.array([], pa.int64()),
            "is_dup": pa.array([], pa.bool_()),
        }
    )

    def count_per_doc(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return empty_out
        g = df.groupby("doc_id", as_index=False).agg(
            n_windows=("dup", "size"), n_dup=("dup", "sum")
        )
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "n_windows": pa.array(
                    g["n_windows"].to_numpy(), pa.int64()
                ),
                "n_dup": pa.array(g["n_dup"].to_numpy(), pa.int64()),
                "is_dup": pa.array(
                    2 * g["n_dup"].to_numpy() >= g["n_windows"].to_numpy()
                ),
            }
        )

    return (
        ds.map_batches(windows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(flag_in_shard, batch_format="pandas")
        .groupby("shard2")
        .map_groups(count_per_doc, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed n-gram importance resampling)
# ---------------------------------------------------------------------------

_DSIR_B = 4096  # hashed feature buckets (DSIR uses 10k; 4096 keeps the
# broadcast table one 32 KiB int64 array and the oracle CTE small)
_DSIR_TARGET_LANG = "en"


def _dsir_doc_grams(texts: list) -> list[list[str]]:
    """Per-doc word unigram + bigram feature list — lowercased,
    single-space split, empty tokens dropped, duplicates KEPT (DSIR
    featurizes occurrence counts).  Identical to the oracle's
    ``string_split(lower(text), ' ')`` + ``list_transform`` CTE."""
    out = []
    for t in texts:
        ws = [w for w in (t or "").lower().split(" ") if w]
        out.append(ws + [ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)])
    return out


def _gram_segments(grams: list[list[str]]):
    """Flatten per-doc gram lists -> (flat list, per-doc offsets)."""
    lens = np.array([len(g) for g in grams], dtype=np.int64)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    return [g for gs in grams for g in gs], lens, offs


def _segment_sums(per_gram: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Exact int64 per-segment sums (cumsum-difference: safe for empty
    segments, unlike ``np.add.reduceat``)."""
    cs = np.zeros(len(per_gram) + 1, dtype=np.int64)
    np.cumsum(per_gram, out=cs[1:])
    return cs[offs[1:]] - cs[offs[:-1]]


def q_dsir_weights(sf_dir: str):
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every document by how much more likely its
    hashed n-gram features are under a TARGET distribution than under
    the raw-corpus distribution.  Target here is the ``lang = 'en'``
    slice (a real run plugs in the downstream-task sample); features
    are word unigrams+bigrams hashed into 4096 buckets with the md5
    scheme so the ENTIRE method — featurization, both distributions,
    the per-bucket log-ratios and the per-doc sums — replays in the
    DuckDB oracle.  Log-ratios are quantized to integer micro-nats
    (round-half-away(1e6 * ln)) so per-doc sums are order-free exact
    int64 arithmetic: no float-summation hash risk.

    Scale shape: pass 1 is a map emitting sparse (bucket, cq, cp)
    partial bincounts -> groupby(bucket).sum() -> <=4096 rows on the
    driver; pass 2 broadcasts the 32 KiB int64 log-ratio table once
    (ray.put) and scores each batch with unique-gram md5 hashing +
    vectorized gathers.  The corpus never shuffles; network cost is
    O(blocks * nonzero-buckets) + one broadcast.  md5 is the
    oracle-verifiability trade (stages/dedup.py:20) — production would
    pass fnv via the same batch hasher."""
    import ray

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    lw_ref = ray.put(_dsir_log_ratios(docs))
    # scoring pass never uses lang: fresh 2-column read
    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _DsirScore(lw_ref), batch_format="pyarrow"
    )


class _DsirScore:
    """Stateless scoring callable for the DSIR passes (plain function
    semantics; a class only to carry the broadcast log-ratio ref)."""

    def __init__(self, lw_ref):
        self.lw_ref = lw_ref

    def __call__(self, b: pa.Table) -> pa.Table:
        from tiny_lingua_ray.stages.dedup import _md5_lower64_batch
        from tiny_lingua_ray.tableutil import deref

        B = _DSIR_B
        lwarr = deref(self.lw_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        grams = _dsir_doc_grams(b.column("text").to_pylist())
        flat, lens, offs = _gram_segments(grams)
        if flat:
            uniq, inv = np.unique(
                np.asarray(flat, dtype=object), return_inverse=True
            )
            bk = (
                _md5_lower64_batch(list(uniq)) % np.uint64(B)
            ).astype(np.int64)
            per_gram = lwarr[bk][inv]
            w = _segment_sums(per_gram, offs)
        else:
            w = np.zeros(len(ids), dtype=np.int64)
        keep = lens > 0  # oracle groups by doc over grams: 0-gram docs absent
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "n_grams": pa.array(lens[keep]),
                "weight_micro": pa.array(w[keep]),
            }
        )


def _dsir_log_ratios(docs) -> np.ndarray:
    """Pass 1 of DSIR: fit both hashed-feature distributions and return
    the quantized per-bucket log-ratio table (int64 micro-nats, len
    ``_DSIR_B``).  Sparse (bucket, cq, cp) bincount partials ->
    groupby(bucket).sum() -> <= _DSIR_B rows on the driver."""
    from ray.data.aggregate import Sum

    from tiny_lingua_ray.stages.dedup import _md5_lower64_batch

    B = _DSIR_B

    def count_batch(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        langs = b.column("lang").to_pylist()
        grams = _dsir_doc_grams(texts)
        cq = np.zeros(B, dtype=np.int64)
        cp = np.zeros(B, dtype=np.int64)
        for sel, acc in (
            (None, cq),
            (_DSIR_TARGET_LANG, cp),
        ):
            pool = [
                g
                for gs, lang in zip(grams, langs)
                if sel is None or lang == sel
                for g in gs
            ]
            if not pool:
                continue
            uniq, counts = np.unique(
                np.asarray(pool, dtype=object), return_counts=True
            )
            bk = (
                _md5_lower64_batch(list(uniq)) % np.uint64(B)
            ).astype(np.int64)
            np.add.at(acc, bk, counts)
        nz = np.flatnonzero(cq)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "cq": pa.array(cq[nz]),
                "cp": pa.array(cp[nz]),
            }
        )

    cnt = (
        docs.map_batches(count_batch, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("cq", alias_name="cq"), Sum("cp", alias_name="cp"))
        .to_pandas()  # <= 4096 rows by construction
    )
    if cnt.empty:  # empty corpus: column-less frame from Ray
        cnt = pd.DataFrame({"bucket": [], "cq": [], "cp": []})
    cq = np.zeros(B, dtype=np.int64)
    cp = np.zeros(B, dtype=np.int64)
    cq[cnt["bucket"].to_numpy(dtype=np.int64)] = cnt["cq"].to_numpy(
        dtype=np.int64
    )
    cp[cnt["bucket"].to_numpy(dtype=np.int64)] = cnt["cp"].to_numpy(
        dtype=np.int64
    )
    tq, tp = int(cq.sum()), int(cp.sum())
    # add-1 smoothing; EXACT float expression of the SQL oracle
    ratio = ((cp + 1.0) * (tq + float(B))) / ((cq + 1.0) * (tp + float(B)))
    lw = _rha(1_000_000 * np.log(ratio), 0).astype(np.int64)
    lw[cq == 0] = 0  # unseen buckets are never gathered; keep table clean
    return lw


def q_dsir_select(sf_dir: str):
    """DSIR end-to-end: featurize -> importance weights -> GUMBEL-TOP-K
    resample (the paper's actual selection step, arXiv:2302.03169 §3 —
    sampling without replacement proportional to exp(weight) is exactly
    taking the K largest weight + Gumbel(0,1) keys).  The Gumbel noise
    is derived from the md5 of the doc_id (the repo's replayable-
    randomness convention, q_weighted_sample) so the selection is
    rerun-stable and the WHOLE method — features, distributions,
    weights, noise, ranking — replays in the DuckDB oracle.

    Scale shape: pass 1 as q_dsir_weights; pass 2 adds the Gumbel key
    and keeps a per-block partial top-K, so the driver merges
    <= blocks x K rows and the corpus never shuffles."""
    import ray

    from tiny_lingua_ray.stages.dedup import _md5_lower64_batch

    K = 100
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    score = _DsirScore(ray.put(_dsir_log_ratios(docs)))

    def partial_topk(b: pa.Table) -> pa.Table:
        s = score(b)
        ids = s.column("doc_id").to_numpy(zero_copy_only=False)
        w = s.column("weight_micro").to_numpy(zero_copy_only=False)
        m = _md5_lower64_batch([str(int(i)) for i in ids])
        u = (
            (m % np.uint64(1_000_000)).astype(np.float64) + 0.5
        ) / 1_000_000.0
        skey = _rha(w / 1_000_000.0 - np.log(-np.log(u)), 6)
        d = (
            pd.DataFrame(
                {
                    "doc_id": ids.astype(np.int64),
                    "weight_micro": w,
                    "skey": skey,
                }
            )
            .sort_values(["skey", "doc_id"], ascending=[False, True])
            .head(K)
        )
        return pa.table(
            {
                "doc_id": pa.array(d["doc_id"].to_numpy(), pa.int64()),
                "weight_micro": pa.array(
                    d["weight_micro"].to_numpy(), pa.int64()
                ),
                "skey": pa.array(d["skey"].to_numpy(), pa.float64()),
            }
        )

    out = (
        # scoring pass never uses lang: fresh 2-column read
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()  # <= blocks x K rows
    )
    if out.empty:  # empty corpus: column-less frame from Ray
        return pd.DataFrame(
            {"doc_id": [], "weight_micro": [], "skey": []}
        ).astype({"doc_id": np.int64, "weight_micro": np.int64})
    return out.sort_values(
        ["skey", "doc_id"], ascending=[False, True], ignore_index=True
    ).head(K)


# ---------------------------------------------------------------------------
# n-gram-hash decontamination (GPT-3 / PaLM style)
# ---------------------------------------------------------------------------

_DECON_N = 8  # PaLM used 8-gram overlap; GPT-3 13-gram


def _word_ngrams(text, n: int = _DECON_N) -> list[str]:
    ws = [w for w in (text or "").lower().split(" ") if w]
    if len(ws) < n:
        return []
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def q_decontaminate_ngram(sf_dir: str):
    """Eval-set decontamination by overlapping word-8-gram HASH overlap
    (the GPT-3/PaLM recipe, vs q_decontaminate's substring probes): a
    training doc is contaminated if ANY of its 8-grams appears in the
    eval set's 8-gram set.  Probes are the doc_id < 5 documents (same
    deterministic convention as q_decontaminate) so the DuckDB oracle
    replays everything, hashes included (md5 scheme).

    Scale shape: the probe gram-hash set is built from the tiny probe
    slice on the driver, sorted, and broadcast ONCE (ray.put);  each
    batch hashes its unique grams, membership is a vectorized
    searchsorted — integer-exact, no shuffle, text read once.  At real
    scale the probe set is the benchmark suite (~1e6 grams = 8 MB),
    still broadcast-sized."""
    import pyarrow.compute as pc
    import ray

    from tiny_lingua_ray.stages.dedup import _md5_lower64_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    probe_rows = docs.map_batches(
        lambda b: b.filter(pc.less(b.column("doc_id"), _N_PROBES)),
        batch_format="pyarrow",
    ).to_pandas()
    if probe_rows.empty:  # empty corpus: column-less frame from Ray
        probe_rows = pd.DataFrame({"doc_id": [], "text": []})
    pg = [g for t in probe_rows["text"] for g in _word_ngrams(t)]
    probe = (
        np.unique(_md5_lower64_batch(pg))  # unique() output is sorted
        if pg
        else np.array([], dtype=np.uint64)
    )
    p_ref = ray.put(probe)

    def scan(b: pa.Table) -> pa.Table:
        pr = ray.get(p_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        grams = [_word_ngrams(t) for t in b.column("text").to_pylist()]
        flat, lens, offs = _gram_segments(grams)
        if flat and pr.size:
            uniq, inv = np.unique(
                np.asarray(flat, dtype=object), return_inverse=True
            )
            h = _md5_lower64_batch(list(uniq))
            idx = np.minimum(np.searchsorted(pr, h), pr.size - 1)
            hit = (pr[idx] == h).astype(np.int64)
            n_hits = _segment_sums(hit[inv], offs)
        else:
            n_hits = np.zeros(len(ids), dtype=np.int64)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_grams": pa.array(lens),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BPE tokenizer training + application (stages/bpe.py)
# ---------------------------------------------------------------------------

_BPE_TOP_V = 3000  # fit on the top-V words (exact counts; classic trainers
# operate on the word-frequency dict, never the corpus)
_BPE_MERGES = 100


def _bpe_fit_from_corpus(sf_dir: str) -> list[tuple[str, str]]:
    """Exact distributed word count (word-hash shard: a word's global
    count lives in ONE shard), per-shard top-V partial -> driver merge
    is exact because shards partition words; then the driver fits on
    <= V (word, cnt) rows — corpus-size-independent."""
    from tiny_lingua_ray.models.train import fnv1a_64
    from tiny_lingua_ray.stages.bpe import bpe_fit

    P = _shards_for_table(sf_dir, "documents")
    docs = _read(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update((t or "").lower().split(" "))
        c.pop("", None)
        words = list(c.keys())
        shard = np.fromiter(
            (fnv1a_64(w) % P for w in words),
            dtype=np.int64,
            count=len(words),
        )
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
                "shard": pa.array(shard),
            }
        )

    def shard_topv(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", as_index=False)["cnt"].sum()
        return g.sort_values(
            ["cnt", "word"], ascending=[False, True]
        ).head(_BPE_TOP_V)

    top = docs.map_batches(partial, batch_format="pyarrow").groupby(
        "shard"
    ).map_groups(shard_topv, batch_format="pandas").to_pandas()
    if top.empty:  # empty corpus: column-less frame from Ray
        return []
    top = top.sort_values(
        ["cnt", "word"], ascending=[False, True]
    ).head(_BPE_TOP_V)
    return bpe_fit(
        list(top["word"]), top["cnt"].to_numpy(), num_merges=_BPE_MERGES
    )


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer TRAINING (Sennrich et al. 2016): the ordered merge
    table learned from the corpus's exact top-V word frequencies.
    Rows-only by design (iterative algorithm, not SQL-expressible);
    exact parity with an independent dict-based reference trainer plus
    determinism are pinned in tests/test_bpe.py."""
    merges = _bpe_fit_from_corpus(sf_dir)
    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "merged": [m[0] + m[1] for m in merges],
        }
    )


def q_bpe_encode(sf_dir: str):
    """Train-then-apply BPE: the merge table from q_bpe_merges is
    broadcast once (ray.put) and a stateful actor pool encodes every
    document (rank dict + per-word memo cache built per actor in
    __init__, stages/bpe.BpeEncoder).  Output is the trained-tokenizer
    token count per doc — the number that drives pack_sequences /
    training-cost estimates once a real tokenizer is fit."""
    import ray

    from tiny_lingua_ray.pool import cpu_pool
    from tiny_lingua_ray.stages.bpe import BpeEncoder

    merges_ref = ray.put(_bpe_fit_from_corpus(sf_dir))

    def project(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "n_tokens_bpe_trained"])

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(
            BpeEncoder,
            fn_constructor_kwargs={"merges_ref": merges_ref},
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=cpu_pool(),
            num_cpus=1,
        )
        .map_batches(project, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Temperature-based mixture sampling
# ---------------------------------------------------------------------------


def q_temperature_mixture(sf_dir: str):
    """Temperature-based data-mixture sampling (Conneau & Lample 2019,
    arXiv:1901.07291 §3.1; the alpha=0.5 source-rebalancing every
    multilingual/multi-source pretraining corpus uses): target share of
    source s is n_s^alpha / sum_t n_t^alpha, so high-resource sources
    are downsampled and low-resource ones kept.  Total budget K is half
    the corpus.  All randomness is the md5 of doc_id (the repo's
    replayable convention) and the per-source rates are quantized to
    integer millionths with sqrt pre-quantized too, so the inclusion
    test is INTEGER-exact and the whole operator replays in SQL.

    Scale shape: one tiny groupby(source).count() (sources are bounded:
    domains/datasets, not documents), driver computes the <=|sources|
    threshold table, broadcast once; selection is a stateless hash
    filter — no corpus shuffle."""
    import ray

    from tiny_lingua_ray.stages.dedup import _md5_lower64_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    cnt = docs.groupby("source").count().to_pandas()
    if cnt.empty:  # empty corpus: nothing to sample
        return pd.DataFrame({"doc_id": [], "source": []}).astype(
            {"doc_id": np.int64, "source": str}
        )
    n = dict(zip(cnt["source"], cnt["count()"].astype(int)))
    # alpha = 0.5 share, quantized exactly as the oracle does
    s = {k: int(_rha(1_000_000 * np.sqrt(v), 0)) for k, v in n.items()}
    st = sum(s.values())
    nt = sum(n.values())
    K = nt // 2
    thresh = {
        k: int(np.floor(1_000_000 * min(1.0, (K * ((s[k] * 1.0) / st)) / n[k])))
        for k in s
    }
    t_ref = ray.put(thresh)

    def pick(b: pa.Table) -> pa.Table:
        th = ray.get(t_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        src = b.column("source").to_pylist()
        m = _md5_lower64_batch([str(int(i)) for i in ids])
        u = (m % np.uint64(1_000_000)).astype(np.int64)
        lim = np.fromiter((th[x] for x in src), dtype=np.int64, count=len(src))
        return b.filter(pa.array(u < lim))

    return docs.map_batches(pick, batch_format="pyarrow")


QUERIES_CORPUS = {
    "tfidf_top_terms": q_tfidf_top_terms,
    "lang_word_top5": q_lang_word_top5,
    "dedup_clusters": q_dedup_clusters,
    "dedup_keep_first": q_dedup_keep_first,
    "dedup_keep_best": q_dedup_keep_best,
    "approx_distinct_users": q_approx_distinct_users,
    "approx_heavy_hitters": q_approx_heavy_hitters,
    "repetition_signals": q_repetition_signals,
    "compression_ratio": q_compression_ratio,
    "source_stats": q_source_stats,
    "lang_balanced_sample": q_lang_balanced_sample,
    "pack_sequences": q_pack_sequences,
    "decontaminate": q_decontaminate,
    "approx_quantiles_chars": q_approx_quantiles_chars,
    "incremental_dedup": q_incremental_dedup,
    "window_dedup": q_window_dedup,
    "dsir_weights": q_dsir_weights,
    "dsir_select": q_dsir_select,
    "decontaminate_ngram": q_decontaminate_ngram,
    "bpe_merges": q_bpe_merges,
    "bpe_encode": q_bpe_encode,
    "temperature_mixture": q_temperature_mixture,
}

# shared DSIR CTE chain: features -> hashed buckets -> both distributions
# -> quantized log-ratios -> per-doc exact int64 weights
_DSIR_CTE = """
        w AS (
          SELECT doc_id, lang,
                 list_filter(string_split(lower(COALESCE(text, '')), ' '),
                             x -> x <> '') AS ws
          FROM documents),
        g AS (
          SELECT doc_id, lang, unnest(ws) AS gram FROM w
          UNION ALL
          SELECT doc_id, lang, unnest(CASE WHEN len(ws) >= 2 THEN
              list_transform(range(1, len(ws)),
                             i -> ws[i] || ' ' || ws[i + 1])
              ELSE [] END) AS gram FROM w),
        b AS (SELECT doc_id, lang,
                     CAST(md5_number_lower(gram) % 4096 AS BIGINT) AS bucket
              FROM g),
        cnt AS (SELECT bucket,
                       COUNT(*) AS cq,
                       COUNT(*) FILTER (WHERE lang = 'en') AS cp
                FROM b GROUP BY bucket),
        tot AS (SELECT SUM(cq) AS tq, SUM(cp) AS tp FROM cnt),
        lr AS (SELECT bucket,
                      CAST(ROUND(1000000 * ln(((cp + 1.0) * (tq + 4096.0))
                           / ((cq + 1.0) * (tp + 4096.0))), 0) AS BIGINT)
                        AS lw
               FROM cnt CROSS JOIN tot),
        wt AS (SELECT b.doc_id,
                      COUNT(*) AS n_grams,
                      CAST(SUM(lr.lw) AS BIGINT) AS weight_micro
               FROM b JOIN lr USING (bucket)
               GROUP BY b.doc_id)
"""

ORACLE_CORPUS = {
    "lang_word_top5": """
        WITH counts AS (
          SELECT lang, word, COUNT(*) AS cnt FROM (
            SELECT lang, unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
          WHERE word <> '' GROUP BY lang, word)
        SELECT lang, word, cnt FROM (
          SELECT lang, word, cnt,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY cnt DESC, word) AS rk
          FROM counts)
        WHERE rk <= 5
    """,
    "tfidf_top_terms": """
        WITH w AS (
          SELECT lang, word, COUNT(*) AS tf FROM (
            SELECT lang, unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
          WHERE word <> '' GROUP BY lang, word),
        dfreq AS (SELECT word, COUNT(*) AS df FROM w GROUP BY word),
        nl AS (SELECT COUNT(DISTINCT lang) AS n FROM documents),
        scored AS (
          SELECT w.lang, w.word,
                 ROUND(w.tf * ln(nl.n * 1.0 / dfreq.df), 6) AS score
          FROM w JOIN dfreq USING (word) CROSS JOIN nl)
        SELECT lang, word, score FROM (
          SELECT lang, word, score,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY score DESC, word) AS rk
          FROM scored)
        WHERE rk <= 5
    """,
    "repetition_signals": """
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS ws
          FROM documents),
        grams AS (
          SELECT doc_id, ws, len(ws) AS n_words,
                 CASE WHEN len(ws) >= 2 THEN list_transform(
                     range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
                 ELSE [] END AS bi,
                 CASE WHEN len(ws) >= 3 THEN list_transform(
                     range(1, len(ws) - 1),
                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                 ELSE [] END AS tri
          FROM w),
        bstat AS (
          SELECT doc_id, MAX(c) AS top, SUM(c) AS tot FROM (
            SELECT doc_id, g, COUNT(*) AS c FROM (
              SELECT doc_id, unnest(bi) AS g FROM grams) GROUP BY 1, 2)
          GROUP BY doc_id),
        tstat AS (
          SELECT doc_id, MAX(c) AS top, SUM(c) AS tot FROM (
            SELECT doc_id, g, COUNT(*) AS c FROM (
              SELECT doc_id, unnest(tri) AS g FROM grams) GROUP BY 1, 2)
          GROUP BY doc_id)
        SELECT g.doc_id, g.n_words,
               ROUND(CASE WHEN g.n_words > 0 THEN
                 len(list_distinct(g.ws)) * 1.0 / g.n_words ELSE 0 END, 6)
                 AS distinct_word_ratio,
               ROUND(COALESCE(b.top * 1.0 / b.tot, 0), 6) AS top_bigram_frac,
               ROUND(COALESCE(t.top * 1.0 / t.tot, 0), 6) AS top_trigram_frac
        FROM grams g
        LEFT JOIN bstat b ON g.doc_id = b.doc_id
        LEFT JOIN tstat t ON g.doc_id = t.doc_id
    """,
    "source_stats": """
        SELECT source, COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), 6) AS avg_chars,
               COUNT(DISTINCT lang) AS n_langs
        FROM documents GROUP BY source
    """,
    "lang_balanced_sample": """
        WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
        SELECT d.doc_id, d.lang
        FROM documents d JOIN c USING (lang)
        WHERE md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 1000000
              < LEAST(1000000, (100 * 1000000) // c.n)
    """,
    "incremental_dedup": """
        SELECT doc_id,
               doc_id = MIN(doc_id) OVER (PARTITION BY text) AS is_new
        FROM documents
    """,
    "decontaminate": """
        WITH probes AS (
          SELECT doc_id AS pid, substr(text, 1, 40) AS probe
          FROM documents WHERE doc_id < 5)
        SELECT d.doc_id,
               CAST(SUM(CASE WHEN d.doc_id <> p.pid
                             AND position(p.probe IN d.text) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_probe_hits,
               SUM(CASE WHEN d.doc_id <> p.pid
                        AND position(p.probe IN d.text) > 0
                   THEN 1 ELSE 0 END) > 0 AS contaminated
        FROM documents d CROSS JOIN probes p
        GROUP BY d.doc_id
    """,
    "pack_sequences": """
        WITH t AS (
          SELECT doc_id, lang,
                 len(list_filter(string_split(text, ' '), w -> w <> ''))
                   AS n_tokens
          FROM documents)
        SELECT doc_id, lang, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // 512 AS BIGINT) AS bin_id
        FROM t
    """,
    "window_dedup": """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        wins AS (
          SELECT doc_id, i AS wno,
                 array_to_string(ws[(i*5+1):(i*5+15)], ' ') AS win
          FROM w, LATERAL (
            SELECT UNNEST(generate_series(0,
              CAST(FLOOR((len(ws) - 15) / 5.0) AS INT))) AS i) t
          WHERE len(ws) >= 15),
        flags AS (
          SELECT doc_id,
                 CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY win ORDER BY doc_id, wno) > 1
                      THEN 1 ELSE 0 END AS dup
          FROM wins),
        agg AS (
          SELECT doc_id, COUNT(*) AS n_windows,
                 CAST(SUM(dup) AS BIGINT) AS n_dup
          FROM flags GROUP BY doc_id)
        SELECT doc_id, n_windows, n_dup,
               2 * n_dup >= n_windows AS is_dup
        FROM agg
    """,
    "dsir_weights": f"""
        WITH {_DSIR_CTE}
        SELECT doc_id, n_grams, weight_micro FROM wt
    """,
    "dsir_select": f"""
        WITH {_DSIR_CTE},
        keyed AS (
          SELECT doc_id, weight_micro,
                 ROUND(weight_micro / 1000000.0
                       - ln(-ln((md5_number_lower(CAST(doc_id AS VARCHAR))
                                 % 1000000 + 0.5) / 1000000.0)), 6) AS skey
          FROM wt)
        SELECT doc_id, weight_micro, skey FROM keyed
        ORDER BY skey DESC, doc_id
        LIMIT 100
    """,
    "decontaminate_ngram": """
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split(lower(COALESCE(text, '')), ' '),
                             x -> x <> '') AS ws
          FROM documents),
        g AS (
          SELECT doc_id, unnest(CASE WHEN len(ws) >= 8 THEN
              list_transform(range(1, len(ws) - 6),
                             i -> array_to_string(ws[i:i+7], ' '))
              ELSE [] END) AS gram FROM w),
        gh AS (SELECT doc_id, md5_number_lower(gram) AS h FROM g),
        probes AS (SELECT DISTINCT h FROM gh WHERE doc_id < 5),
        hits AS (
          SELECT gh.doc_id,
                 COUNT(*) AS n_grams,
                 COUNT(*) FILTER (WHERE probes.h IS NOT NULL) AS n_hits
          FROM gh LEFT JOIN probes ON gh.h = probes.h
          GROUP BY gh.doc_id)
        SELECT d.doc_id,
               COALESCE(hits.n_grams, 0) AS n_grams,
               COALESCE(hits.n_hits, 0) AS n_hits,
               COALESCE(hits.n_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
    """,
    "temperature_mixture": """
        WITH cnt AS (SELECT source, COUNT(*) AS n
                     FROM documents GROUP BY source),
        q AS (SELECT source, n,
                     CAST(ROUND(1000000 * sqrt(n), 0) AS BIGINT) AS s
              FROM cnt),
        tot AS (SELECT SUM(s) AS st, SUM(n) AS nt FROM q),
        rate AS (SELECT source, n,
                        CAST(FLOOR(1000000 * LEAST(1.0,
                             ((nt // 2) * ((s * 1.0) / st)) / n))
                          AS BIGINT) AS thresh
                 FROM q CROSS JOIN tot)
        SELECT d.doc_id, d.source
        FROM documents d JOIN rate USING (source)
        WHERE md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 1000000
              < rate.thresh
    """,
    # dedup_clusters / dedup_keep_first filled lazily to avoid a
    # circular import at module load
}
