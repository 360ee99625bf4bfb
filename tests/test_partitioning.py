"""Skew-aware partitioning (stages/partitioning.py): hot-key detection
and salted two-phase map_groups equivalence."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _toy_ds():
    """60 rows, key 'hot' holds 2/3 of them."""
    import ray

    keys = ["hot"] * 40 + ["a"] * 10 + ["b"] * 10
    vals = list(range(60))
    return ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    )


def test_detect_hot_keys_toy(ray_session):
    from tiny_lingua_ray.stages.partitioning import detect_hot_keys, key_shares

    ds = _toy_ds()
    shares = key_shares(ds, "k")
    assert shares.iloc[0]["k"] == "hot"
    assert abs(shares.iloc[0]["share"] - 40 / 60) < 1e-9
    assert detect_hot_keys(ds, "k", threshold=0.5) == frozenset({"hot"})
    assert detect_hot_keys(ds, "k", threshold=0.05) == frozenset({"hot", "a", "b"})


def test_detect_hot_keys_lang_skew(ray_session):
    """The documents corpus is Zipf-skewed on lang: en alone is hot."""
    import ray

    from tiny_lingua_ray.stages.partitioning import detect_hot_keys

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["lang"])
    hot = detect_hot_keys(ds, "lang", threshold=0.25)
    assert hot == frozenset({"en"})


@pytest.mark.parametrize("n_salt", [1, 8])
def test_salted_map_groups_matches_unsalted(ray_session, n_salt):
    """merge(partials) == direct per-key computation, for any salt
    fan-out (n_salt=1 degenerates to the unsalted two-phase)."""
    from tiny_lingua_ray.stages.partitioning import salted_map_groups

    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": [df["k"].iloc[0]],
                "n": [len(df)],
                "s": [int(df["v"].sum())],
            }
        )

    def merge_fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": [df["k"].iloc[0]],
                "n": [int(df["n"].sum())],
                "s": [int(df["s"].sum())],
            }
        )

    out = (
        salted_map_groups(
            _toy_ds(), "k", group_fn, merge_fn, n_salt=n_salt, hot_threshold=0.5
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    exp = pd.DataFrame(
        {"k": ["a", "b", "hot"], "n": [10, 10, 40], "s": [445, 545, 780]}
    )
    pd.testing.assert_frame_equal(out[["k", "n", "s"]], exp)


def test_salt_column_bounds_hot_groups(ray_session):
    """Hot-key rows are spread over n_salt salt values; cold keys keep
    salt 0 (single group, no extra shuffle width)."""
    from tiny_lingua_ray.stages.partitioning import SALT_COL, add_salt

    df = add_salt(_toy_ds(), "k", frozenset({"hot"}), n_salt=4).to_pandas()
    hot = df[df["k"] == "hot"]
    cold = df[df["k"] != "hot"]
    assert set(cold[SALT_COL]) == {0}
    assert set(hot[SALT_COL]) == {0, 1, 2, 3}
    # bounded: no salted sub-group larger than ~|hot|/n_salt
    assert hot.groupby(SALT_COL).size().max() <= 40 / 4 + 1


def test_lang_word_top5_oracle(ray_session):
    """End-to-end parity of the salted query vs DuckDB at sf0.001."""
    import duckdb

    from tiny_lingua_ray.pipelines.corpus_ext import ORACLE_CORPUS, q_lang_word_top5

    out = q_lang_word_top5(SF)
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    df = df.sort_values(
        ["lang", "cnt", "word"], ascending=[True, False, True], ignore_index=True
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = (
        con.execute(ORACLE_CORPUS["lang_word_top5"])
        .df()
        .sort_values(
            ["lang", "cnt", "word"], ascending=[True, False, True], ignore_index=True
        )
    )
    df["cnt"] = df["cnt"].astype("int64")
    exp["cnt"] = exp["cnt"].astype("int64")
    pd.testing.assert_frame_equal(df[["lang", "word", "cnt"]], exp[["lang", "word", "cnt"]])


def test_queries_survive_empty_input(ray_session, tmp_path):
    """Schema-identical but EMPTY tables: a representative set of
    shuffle-heavy queries must return zero rows without crashing —
    the typed-empty-frame guard that keeps sparse partitions from
    poisoning schema unification at scale."""
    import duckdb
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_empty"
    d.mkdir()
    for t in ("documents", "events", "orders", "customer", "lineitem",
              "part", "embeddings", "region", "nation", "supplier"):
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), str(d / f"{t}.parquet"))

    from tiny_lingua_ray.pipelines.queries import QUERIES

    KEYS = (
        "exact_dedup", "minhash_dedup", "simhash_pairs", "word_freq_top20",
        "paragraph_dedup", "event_sequences", "zscore_outliers",
        "latest_event_per_user", "except_users", "union_users",
        "cap_per_source", "event_cooccurrence", "user_sessions",
        "pretraining_prep", "edit_distance_pairs", "bigram_top20",
        "rolling_dau_7d", "conversion_funnel", "build_vocab",
        "winsorize_chars", "mode_event_type", "above_avg_events",
        "percent_rank_docs", "retention_cohorts", "cube_event_stats",
        "semantic_dedup", "quality_classifier", "search_docs",
        "tokenize_docs", "generic_right_join", "event_transitions",
        "pmi_top20", "window_dedup", "dsir_weights", "dsir_select",
        "decontaminate_ngram", "temperature_mixture", "bpe_merges",
        "bpe_encode", "weighted_sample", "search_bm25", "inverted_index",
        "chunk_overlap", "fingerprint", "jaccard_pairs",
        "dedup_keep_first", "decontaminate", "stratified_sample",
        "hash_split", "group_topk_docs", "global_rank_docs",
        "running_total", "event_gaps", "rollup_pricing",
        "anti_join_inactive_customers", "bloom_semi_join",
        "star_join_region_stats", "tfidf_top_terms", "lang_word_top5",
        "incremental_dedup", "repetition_signals", "source_stats",
        "lang_balanced_sample", "pack_sequences",
        # the remaining non-model, non-media surface
        "knn_cosine", "embedding_label_stats", "cosine_near_dup",
        "range_join_size_buckets", "substring_filter",
        "json_extract_stats", "pivot_event_counts", "group_percentiles",
        "order_lineitem_band_join", "asof_event_order",
        "semi_join_big_spenders", "rolling_7d_value",
        "percentiles_chars", "full_outer_user_days", "corr_qty_price",
        "ntile_quartiles", "intersect_users", "unpivot_event_counts",
        "left_join_customer_orders", "value_stats", "dedup_clusters",
        "lineitem_pricing", "filter_project_part",
        "join_orders_customers", "topk_orders",
        "distinct_users_per_event", "events_daily", "doc_stats",
        "clean_text", "token_counts", "mean_word_len", "pii_scrub",
        "quality_flags", "corpus_prep", "simhash", "knn_cosine_ivf",
        "kmeans_clusters", "knn_cosine_pq", "approx_distinct_users",
        "approx_heavy_hitters", "compression_ratio",
        "approx_quantiles_chars", "pii_audit", "boilerplate_purge",
        "deterministic_shuffle", "dedup_keep_best", "containment_pairs",
    )
    import pandas as pd

    for k in KEYS:
        r = QUERIES[k](str(d))
        n = len(r) if isinstance(r, pd.DataFrame) else r.count()
        if k == "conversion_funnel":
            # single-row aggregate: the SQL oracle also returns one
            # (0, 0, 0.0) row on empty input (scalar subqueries)
            assert n == 1 and int(r["n_signup"].iloc[0]) == 0, (k, n)
        else:
            assert n == 0, (k, n)


@pytest.mark.parametrize(
    "key,empty_tables",
    [
        ("star_join_region_stats", ("customer",)),      # fact empty
        ("star_join_region_stats", ("nation", "region")),  # dims empty
        ("join_orders_customers", ("orders",)),
        ("join_orders_customers", ("customer",)),
        ("semi_join_big_spenders", ("orders",)),
        ("semi_join_big_spenders", ("events",)),
        ("bloom_semi_join", ("orders",)),
        ("anti_join_inactive_customers", ("orders",)),
        ("left_join_customer_orders", ("orders",)),
        ("full_outer_user_days", ("events",)),
        ("order_lineitem_band_join", ("lineitem",)),
        ("decontaminate", ("documents",)),
    ],
)
def test_queries_survive_mixed_empty(ray_session, tmp_path, key, empty_tables):
    """MIXED-empty inputs (one side of a join empty, the other real):
    the all-empty gate above cannot catch a guard that only checks one
    side — found on star_join_region_stats in the round-4 review."""
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_mixed"
    d.mkdir()
    for t in ("documents", "events", "orders", "customer", "lineitem",
              "part", "embeddings", "region", "nation", "supplier"):
        tbl = pq.read_table(f"{src}/{t}.parquet")
        if t in empty_tables:
            tbl = tbl.slice(0, 0)
        pq.write_table(tbl, str(d / f"{t}.parquet"))

    import pandas as pd

    from tiny_lingua_ray.pipelines.queries import QUERIES

    r = QUERIES[key](str(d))
    n = len(r) if isinstance(r, pd.DataFrame) else r.count()
    assert n >= 0  # completing without crashing is the contract here
