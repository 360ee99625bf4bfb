"""Corpus-analysis extensions (round 3): TF-IDF, duplicate clusters
(distributed connected components vs a recursive-CTE closure), and the
HyperLogLog sketch."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_oracles import TABLES, canonical_hash, to_pandas  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize(
    "key",
    ["tfidf_top_terms", "dedup_clusters", "dedup_keep_first", "simhash_pairs",
     "repetition_signals", "source_stats", "lang_balanced_sample",
     "pack_sequences", "decontaminate", "incremental_dedup",
     "edit_distance_pairs", "event_sequences", "zscore_outliers",
     "paragraph_dedup", "bigram_top20", "event_cooccurrence",
     "latest_event_per_user", "except_users", "rolling_dau_7d",
     "union_users", "cap_per_source", "build_vocab",
     "percent_rank_docs", "cube_event_stats", "retention_cohorts",
     "conversion_funnel", "pretraining_prep", "winsorize_chars",
     "mode_event_type", "above_avg_events", "event_transitions",
     "tokenize_docs", "generic_right_join", "search_docs",
     "pmi_top20", "window_dedup", "search_bm25", "weighted_sample",
     "inverted_index", "chunk_overlap", "dsir_weights",
     "dsir_select", "decontaminate_ngram", "temperature_mixture",
     "pii_audit", "boilerplate_purge", "deterministic_shuffle",
     "dedup_keep_best", "containment_pairs"],
)
def test_corpus_query_matches_oracle(ray_session, ddb, key):
    from tiny_lingua_ray.pipelines.queries import ORACLE, QUERIES

    got = to_pandas(QUERIES[key](SF_DIR))
    want = ddb.sql(ORACLE[key]).df()
    assert len(got) == len(want), (key, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns)
    assert canonical_hash(got) == canonical_hash(want), key


@pytest.mark.parametrize("driver_max_edges", [2_000_000, 0])
def test_connected_components_matches_union_find(ray_session, driver_max_edges):
    """Min-label propagation vs a driver union-find on a graph with a
    long chain (worst case for propagation rounds), a clique, a separate
    2-cycle pair, and self-contained singletons via self-loops.
    Parameterized over BOTH code paths: the size-gated driver numpy
    fast path (default gate) and the distributed loop (gate=0)."""
    import ray.data as rd

    from tiny_lingua_ray.stages.cluster import connected_components

    edges = (
        [(i, i + 1) for i in range(0, 9)]          # chain 0..9
        + [(a, b) for a in (20, 21, 22, 23) for b in (20, 21, 22, 23) if a < b]
        + [(40, 41)]
        + [(50, 50)]                                # self-loop singleton
    )
    ds = rd.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    got = (
        connected_components(
            ds, num_shards=4, driver_max_edges=driver_max_edges
        )
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert dict(zip(got["node"], got["label"])) == want


def test_hll_estimate_error_bound():
    """Pure-numpy register/estimator check: 1.04/sqrt(m) relative error
    at p=12 is ~1.6%; assert within 5% across magnitudes."""
    from tiny_lingua_ray.models.train import fnv1a_64_batch
    from tiny_lingua_ray.stages.sketch import _registers, hll_estimate

    for n in (100, 5_000, 200_000):
        h = fnv1a_64_batch([f"user-{i}" for i in range(n)])
        est = hll_estimate(_registers(h, 12))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_partials_merge_like_one_pass():
    """Max-merging per-batch registers must equal the single-pass
    registers (the property that lets sketches ride any shuffle)."""
    from tiny_lingua_ray.models.train import fnv1a_64_batch
    from tiny_lingua_ray.stages.sketch import _registers

    vals = [f"v{i}" for i in range(10_000)]
    h = fnv1a_64_batch(vals)
    whole = _registers(h, 12)
    merged = np.zeros_like(whole)
    for lo in range(0, len(vals), 1337):
        merged = np.maximum(merged, _registers(h[lo : lo + 1337], 12))
    assert np.array_equal(whole, merged)


def test_approx_distinct_users_close_to_exact(ray_session, ddb):
    from tiny_lingua_ray.pipelines.corpus_ext import q_approx_distinct_users

    got = q_approx_distinct_users(SF_DIR)
    exact = ddb.sql(
        """SELECT event_type, COUNT(DISTINCT user_id) AS n
           FROM events GROUP BY event_type ORDER BY event_type"""
    ).df()
    assert list(got["event_type"]) == list(exact["event_type"])
    for e, a in zip(exact["n"], got["n_approx"]):
        assert abs(int(a) - int(e)) / max(int(e), 1) < 0.05, (e, a)


def test_cms_heavy_hitters_bounds_and_agreement(ray_session):
    """CMS guarantees: est >= true for every reported word, est - true
    <= 2N/width (the Cormode-Muthukrishnan bound, deterministic here
    because seeds are fixed), and the exact top-10 words all appear in
    the sketch's top-20."""
    from collections import Counter

    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.queries import QUERIES

    got = QUERIES["approx_heavy_hitters"](SF_DIR)
    exact: Counter = Counter()
    for t in pq.read_table(f"{SF_DIR}/documents.parquet",
                           columns=["text"]).column("text").to_pylist():
        exact.update((t or "").lower().split(" "))
    exact.pop("", None)
    n_total = sum(exact.values())
    bound = 2.0 * n_total / 16384
    for w, est in zip(got["word"], got["est_count"]):
        assert est >= exact[w], (w, est, exact[w])
        assert est - exact[w] <= max(bound, 1), (w, est, exact[w], bound)
    top10 = [w for w, _ in sorted(exact.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:10]]
    assert set(top10) <= set(got["word"])
    # determinism: fixed seeds + order-free merge -> identical rerun
    again = QUERIES["approx_heavy_hitters"](SF_DIR)
    assert got.equals(again)


def test_repetition_batch_edge_cases():
    """Hand-checked repetition signals: empty text, one word, total
    bigram repetition, and a null."""
    import pyarrow as pa

    from tiny_lingua_ray.stages.repetition import repetition_batch

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["", "word", "a b a b a b", None], pa.string()
            ),
        }
    )
    out = repetition_batch(batch).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_words"] == 0
    assert out.loc[0, "top_bigram_frac"] == 0.0
    assert out.loc[1, "n_words"] == 1
    assert out.loc[1, "distinct_word_ratio"] == 1.0
    assert out.loc[1, "top_bigram_frac"] == 0.0
    # "a b a b a b": bigrams = [ab, ba, ab, ba, ab] -> top 3/5
    assert out.loc[2, "n_words"] == 6
    assert out.loc[2, "top_bigram_frac"] == 0.6
    # trigrams = [aba, bab, aba, bab] -> top 2/4
    assert out.loc[2, "top_trigram_frac"] == 0.5
    assert out.loc[2, "distinct_word_ratio"] == round(2 / 6, 6)
    assert out.loc[3, "n_words"] == 0


def test_compression_ratio_properties(ray_session):
    """Repetitive text compresses far better than varied text; empty
    docs get ratio 1.0; values are deterministic and the query covers
    every row exactly once."""
    import pyarrow as pa

    from tiny_lingua_ray.stages.textstats import compression_ratio_batch

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["spam " * 400,
                 " ".join(f"w{i}x{i * 7 % 13}" for i in range(400)),
                 ""],
                pa.string(),
            ),
        }
    )
    out = compression_ratio_batch(batch).to_pandas().set_index("doc_id")
    assert out.loc[0, "compression_ratio"] < 0.05       # pure repetition
    assert out.loc[1, "compression_ratio"] > 2 * out.loc[0, "compression_ratio"]
    assert out.loc[2, "compression_ratio"] == 1.0
    assert out.loc[2, "raw_bytes"] == 0

    from tiny_lingua_ray.pipelines.corpus_ext import q_compression_ratio

    got = q_compression_ratio(SF_DIR).to_pandas()
    import pyarrow.parquet as pq

    assert len(got) == pq.read_metadata(
        f"{SF_DIR}/documents.parquet"
    ).num_rows
    assert got["doc_id"].is_unique
    assert got["compression_ratio"].between(0, 1.5).all()


def test_approx_quantiles_rank_guarantee(ray_session, ddb):
    """The histogram sketch's real guarantee is on RANK, not value
    (integer data with gaps can put adjacent order statistics many bin
    widths apart): the estimate's empirical CDF must reach q, and one
    bin width lower must not — i.e. the estimate brackets the exact
    q-quantile rank to within one bin."""
    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.corpus_ext import q_approx_quantiles_chars

    got = q_approx_quantiles_chars(SF_DIR).set_index("quantile")
    vals = np.sort(
        pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["n_chars"]
        ).column("n_chars").to_numpy()
    )
    n = len(vals)
    width = (vals[-1] - vals[0]) / 2048
    for q in (0.5, 0.9, 0.99):
        est = got.loc[q, "estimate"]
        cdf_at = np.searchsorted(vals, est, side="right") / n
        cdf_below = np.searchsorted(
            vals, est - width - 1e-6, side="right"
        ) / n
        assert cdf_at >= q - 1e-9, (q, est, cdf_at)
        assert cdf_below < q, (q, est, cdf_below)


def test_image_near_dup_finds_seeded_twins(ray_session):
    """Every synthetic image must pair with its re-ID'd twin at
    hamming 0 (exact payload copy), and no non-twin pair may appear
    below the banding threshold on these all-distinct payloads."""
    from tiny_lingua_ray.pipelines.queries import QUERIES

    out = QUERIES["image_near_dup"](SF_DIR)
    twins = {
        (min(a, b), max(a, b))
        for a, b in zip(out["id_a"], out["id_b"])
        if out.loc[(out["id_a"] == a) & (out["id_b"] == b),
                   "hamming"].iloc[0] == 0
    }
    expected = {(i, i + 10_000) for i in sorted({
        min(a, b) for a, b in zip(out["id_a"], out["id_b"])})
        if i < 10_000}
    assert expected <= twins
    assert (out["hamming"] == 0).all()  # random payloads: only twins


def test_window_dedup_planted_copies(ray_session, tmp_path):
    """Behavioral check with planted duplicates: a verbatim copy of an
    earlier doc is fully duplicate (is_dup), a half-copy is partially
    duplicate, fresh text and the FIRST occurrence stay clean, and a
    short doc (< one window) is excluded."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.corpus_ext import q_window_dedup

    rng = np.random.RandomState(11)

    def words(n):
        return [
            "".join(chr(97 + c) for c in rng.randint(0, 26, 7))
            for _ in range(n)
        ]

    base = words(60)
    fresh = words(60)
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                " ".join(base),                       # first occurrence
                " ".join(base),                       # verbatim copy
                " ".join(base[:30] + words(30)),      # half copy
                " ".join(fresh),                      # all fresh
                " ".join(words(5)),                   # < one window
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))

    out = q_window_dedup(str(tmp_path)).to_pandas()
    out = out.set_index("doc_id")
    assert 4 not in out.index  # too short for a single window
    assert not out.loc[0, "is_dup"] and out.loc[0, "n_dup"] == 0
    assert out.loc[1, "is_dup"]  # verbatim copy: every window duplicate
    assert out.loc[1, "n_dup"] == out.loc[1, "n_windows"]
    assert 0 < out.loc[2, "n_dup"] < out.loc[2, "n_windows"]  # half copy
    assert not out.loc[3, "is_dup"] and out.loc[3, "n_dup"] == 0


def test_window_dedup_payload_modes_agree(ray_session):
    """The default hash128 payload (16 B/window through the exchange)
    must produce byte-identical per-doc flags to the exact string mode
    — equality-of-md5 == equality-of-string at any testable scale."""
    from tiny_lingua_ray.pipelines.corpus_ext import q_window_dedup

    hashed = to_pandas(q_window_dedup(SF_DIR)).sort_values("doc_id")
    exact = to_pandas(
        q_window_dedup(SF_DIR, payload="strings")
    ).sort_values("doc_id")
    assert canonical_hash(hashed) == canonical_hash(exact)


def test_stable_round_sql_matches_round_half_away(ddb):
    """The oracle ROUND rewrite (queries._stable_round_sql) must agree
    with tableutil.round_half_away on boundary values in BOTH signs and
    leave non-literal digit args untouched."""
    from tiny_lingua_ray.pipelines.queries import _stable_round_sql
    from tiny_lingua_ray.tableutil import round_half_away

    sql = _stable_round_sql("SELECT ROUND(x, 2) AS r FROM vals")
    assert "ROUND" not in sql.upper().replace("FLOOR", "")
    vals = [0.125, -0.125, 2.675, -2.675, 0.0, 1.005, -1.005, 12.345]
    got = duckdb.sql(
        sql.replace("FROM vals", "FROM (SELECT UNNEST(?) AS x)"),
        params=[vals],
    ).df()["r"].to_numpy()
    want = round_half_away(np.array(vals), 2)
    assert np.array_equal(got, want), (got, want)
    # non-literal digit count stays as written
    keep = "SELECT ROUND(x, n) FROM t"
    assert _stable_round_sql(keep) == keep


def test_dsir_weights_prefer_target_language(ray_session, ddb):
    """DSIR's defining property: documents drawn from the TARGET
    distribution (lang='en' here) must score higher on average than the
    rest of the corpus — the importance weight is exactly the log-ratio
    of target vs raw feature likelihoods.  Also pins the feature count
    (unigrams + bigrams = 2*words - 1)."""
    from tiny_lingua_ray.pipelines.corpus_ext import q_dsir_weights

    out = q_dsir_weights(SF_DIR).to_pandas()
    langs = ddb.sql("SELECT doc_id, lang, text FROM documents").df()
    m = out.merge(langs, on="doc_id")
    en = m[m["lang"] == "en"]["weight_micro"].mean()
    rest = m[m["lang"] != "en"]["weight_micro"].mean()
    assert en > rest, (en, rest)

    words = [
        len([w for w in (t or "").lower().split(" ") if w])
        for t in m.sort_values("doc_id")["text"]
    ]
    got = m.sort_values("doc_id")["n_grams"].to_numpy()
    want = np.array([2 * w - 1 for w in words])  # m only has emitted docs
    assert (got == want).all()


def test_decontaminate_ngram_planted(ray_session, tmp_path):
    """Planted-contamination check: a doc sharing one verbatim 8-gram
    with a probe doc (doc_id < 5) is flagged with exactly the expected
    hit count; fresh text is not; short docs have zero grams."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.corpus_ext import q_decontaminate_ngram

    rng = np.random.RandomState(7)

    def words(n):
        return [
            "".join(chr(97 + c) for c in rng.randint(0, 26, 6))
            for _ in range(n)
        ]

    probe = words(20)
    fresh = words(20)
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5, 6, 7],
            "text": [
                " ".join(probe),
                " ".join(words(12)),
                " ".join(words(12)),
                " ".join(words(12)),
                " ".join(words(12)),
                # shares exactly one 8-gram window (probe words 0..7)
                " ".join(probe[:8] + fresh[:12]),
                " ".join(fresh),          # clean
                " ".join(words(4)),       # < 8 words: no grams
            ],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet")
    )

    out = (
        q_decontaminate_ngram(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "contaminated"]          # probe doc matches itself
    assert out.loc[5, "contaminated"] and out.loc[5, "n_hits"] == 1
    assert not out.loc[6, "contaminated"] and out.loc[6, "n_hits"] == 0
    assert out.loc[7, "n_grams"] == 0 and not out.loc[7, "contaminated"]


def test_dsir_select_prefers_high_weight_docs(ray_session, ddb):
    """Gumbel-top-K selection must be (a) deterministic across reruns
    (md5-derived noise) and (b) biased toward high-importance docs: the
    mean DSIR weight of the 100 selected docs exceeds the corpus mean."""
    from tiny_lingua_ray.pipelines.corpus_ext import (
        q_dsir_select,
        q_dsir_weights,
    )

    sel = q_dsir_select(SF_DIR)
    again = q_dsir_select(SF_DIR)
    assert sel.equals(again)

    all_w = q_dsir_weights(SF_DIR).to_pandas()
    assert (
        sel["weight_micro"].mean() > all_w["weight_micro"].mean()
    ), (sel["weight_micro"].mean(), all_w["weight_micro"].mean())


def test_ccnet_buckets_terciles_and_ordering(ray_session):
    """CCNet bucketing properties: within each detected language the
    head/middle/tail split is ~terciles (histogram-approximate cutoffs;
    checked only where the language has enough docs for the law of
    large numbers to apply), mean perplexity is ordered head < tail,
    and the partition is exhaustive."""
    from tiny_lingua_ray.pipelines.queries import QUERIES

    out = QUERIES["ccnet_buckets"](SF_DIR).to_pandas()
    assert set(out["bucket"]) <= {"head", "middle", "tail"}
    assert len(out) == 500  # every doc assigned exactly once

    for lang, sub in out.groupby("pred_lang"):
        h = sub[sub["bucket"] == "head"]["perplexity"]
        t = sub[sub["bucket"] == "tail"]["perplexity"]
        if len(h) and len(t):
            assert h.mean() < t.mean(), lang
        if len(sub) >= 100:
            for b in ("head", "middle", "tail"):
                frac = (sub["bucket"] == b).mean()
                assert 0.2 < frac < 0.47, (lang, b, frac)


def test_ccnet_buckets_unknown_language_docs(ray_session, tmp_path):
    """Regression (round-4 review): a doc with no scorable text (digits
    only -> pred_lang 'unknown', NaN perplexity) must land in the
    'unknown' bucket instead of poisoning the histogram (np.bincount
    used to raise on the negative bin of a NaN cast)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.queries import QUERIES

    base = pq.read_table(
        f"{SF_DIR}/documents.parquet"
    ).to_pandas().head(40)
    weird = pd.DataFrame(
        {
            "doc_id": [9001, 9002],
            "text": ["1234 5678 90", ""],
            "lang": ["en", "en"],
            "source": ["x", "x"],
            "n_chars": [12, 0],
        }
    )
    docs = pd.concat([base, weird], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet")
    )

    out = (
        QUERIES["ccnet_buckets"](str(tmp_path)).to_pandas()
        .set_index("doc_id")
    )
    assert len(out) == 42
    assert out.loc[9001, "bucket"] == "unknown"
    assert out.loc[9002, "bucket"] == "unknown"
    real = out.drop([9001, 9002])
    assert set(real["bucket"]) <= {"head", "middle", "tail", "unknown"}


def test_temperature_mixture_rebalances_skew(ray_session, tmp_path):
    """alpha=0.5 temperature sampling on a planted 90/5/5 corpus: the
    dominant source's share of the SAMPLE must shrink vs its corpus
    share, the tail sources' shares must grow (toward the sqrt
    shares), and a rerun is identical (md5-derived inclusion)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.corpus_ext import q_temperature_mixture

    rows = (
        [("big", i) for i in range(900)]
        + [("small_a", 900 + i) for i in range(50)]
        + [("small_b", 950 + i) for i in range(50)]
    )
    docs = pd.DataFrame(
        {
            "doc_id": [r[1] for r in rows],
            "source": [r[0] for r in rows],
            "text": ["x"] * len(rows),
            "lang": ["en"] * len(rows),
            "n_chars": [1] * len(rows),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet")
    )

    out = q_temperature_mixture(str(tmp_path)).to_pandas()
    again = q_temperature_mixture(str(tmp_path)).to_pandas()
    assert out.sort_values("doc_id", ignore_index=True).equals(
        again.sort_values("doc_id", ignore_index=True)
    )
    n_sel = out.groupby("source").size()
    # small sources saturate (target 500*0.16=80 > available 50 ->
    # rate capped at 1.0): ALL 50 docs of each tail source selected
    assert n_sel["small_a"] == 50 and n_sel["small_b"] == 50
    # big is sampled at ~K * p_big / n_big = 500*0.6796/900 ~ 37.8%
    assert abs(n_sel["big"] / 900 - 0.378) < 0.05, n_sel.to_dict()
    # net effect: big's SAMPLE share (~0.77) sits below its corpus
    # share (0.90) — the rebalancing the operator exists for
    share = n_sel / len(out)
    assert share["big"] < 0.85


def test_pii_audit_planted(ray_session, tmp_path):
    """Planted PII of every audited type is counted independently over
    the ORIGINAL text (unlike pii_scrub's sequential replacement)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.queries import QUERIES

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail a@b.com and c@d.org ip 10.0.0.1 ssn 123-45-6789 "
                "card 1234-5678-9012-3456 phone 555-123-4567 you idiot",
                "clean text only",
                None,
            ],
            "lang": ["en"] * 3,
            "source": ["x"] * 3,
            "n_chars": [100, 15, 0],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet")
    )
    out = (
        QUERIES["pii_audit"](str(tmp_path)).to_pandas().set_index("doc_id")
    )
    r = out.loc[0]
    assert (
        r["n_email"], r["n_ip"], r["n_ssn"], r["n_card"], r["n_phone"],
        r["n_tox"],
    ) == (2, 1, 1, 1, 1, 1)
    assert bool(r["has_pii"])
    assert not bool(out.loc[1, "has_pii"]) and out.loc[1, "n_tox"] == 0
    assert not bool(out.loc[2, "has_pii"])


def test_word_shingles_fallbacks():
    from tiny_lingua_ray.models.train import fnv1a_64
    from tiny_lingua_ray.stages.dedup import word_shingles

    assert word_shingles("").size == 0
    assert word_shingles("  ").size == 0
    assert word_shingles("one two").tolist() == [fnv1a_64("one two")]
    sh = word_shingles("A b c d")  # lowercased trigrams
    assert sorted(sh.tolist()) == sorted(
        [fnv1a_64("a b c"), fnv1a_64("b c d")]
    )


def test_dedup_keep_best_picks_longest(ray_session, tmp_path):
    """keep_best retains the cluster's LONGEST member (keep_first would
    retain doc 1); isolated docs survive in both."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.queries import QUERIES

    base = "the quick brown fox jumps over the lazy dog " * 5
    texts = [base, base + "tail", "unrelated words entirely different"]
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en", "en", "de"], pa.string()),
            "source": pa.array(["s", "s", "s"], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    first = QUERIES["dedup_keep_first"](str(tmp_path)).to_pandas()
    best = QUERIES["dedup_keep_best"](str(tmp_path)).to_pandas()
    assert set(first["doc_id"]) == {1, 3}
    assert set(best["doc_id"]) == {2, 3}


def test_containment_pairs_planted(ray_session, tmp_path):
    """A short doc pasted inside a long page: containment ~1.0 in one
    direction only, while symmetric Jaccard is far below any dedup
    threshold — the case this operator exists for."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.queries import QUERIES

    sub = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    texts = [sub, filler + " " + sub, "totally distinct other content here"]
    docs = pa.table(
        {
            "doc_id": pa.array([10, 20, 30], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    out = QUERIES["containment_pairs"](str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r["id_sub"]), int(r["id_sup"])) == (10, 20)
    assert r["containment"] == 1.0


def test_containment_pairs_exact_boundary(ray_session, ddb, tmp_path):
    """Containment EXACTLY 0.9 with |sh(sub)| = 10: the float-naive
    prefix size floor((1.0-0.9)*10)+1 = 1 probes only sub's single
    rarest shingle — which is engineered to be the one shingle sup does
    NOT share (df=1 vs df=2 for the shared nine) — so a
    one-short prefix loses the pair.  The predicate-derived prefix
    (p = n - min{i : i/n >= t} + 1 = 2) must find it, and the full
    result must hash-match the oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.queries import ORACLE, QUERIES

    a_words = [f"a{i}" for i in range(12)]  # 10 distinct trigrams
    texts = [
        " ".join(a_words),
        " ".join(a_words[:11] + [f"b{i}" for i in range(30)]),
        "totally unrelated third document content words",
    ]
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    out = QUERIES["containment_pairs"](str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r["id_sub"]), int(r["id_sup"])) == (1, 2)
    assert r["containment"] == 0.9

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    want = con.sql(ORACLE["containment_pairs"]).df()
    assert canonical_hash(to_pandas(out)) == canonical_hash(want)
