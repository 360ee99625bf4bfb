"""Extended relational operators (relational_ext.py) vs DuckDB oracles.

Each of the round-2 operators — shuffle hash/band join, as-of join,
broadcast semi-join, grouped top-k, deterministic hash split, rolling
window, distributed percentiles — is compared row-for-row (count +
sorted-schema + order-insensitive value hash) against its SQL oracle at
sf0.001, mirroring the driver's correctness gate.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_oracles import TABLES, canonical_hash, to_pandas  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

EXT_KEYS = (
    "anti_join_inactive_customers",
    "rollup_pricing",
    "running_total",
    "event_gaps",
    "stratified_sample",
    "range_join_size_buckets",
    "substring_filter",
    "json_extract_stats",
    "pivot_event_counts",
    "group_percentiles",
    "order_lineitem_band_join",
    "asof_event_order",
    "semi_join_big_spenders",
    "group_topk_docs",
    "hash_split",
    "rolling_7d_value",
    "percentiles_chars",
    "bloom_semi_join",
    "ntile_quartiles",
    "intersect_users",
    "unpivot_event_counts",
    "left_join_customer_orders",
    "value_stats",
    "full_outer_user_days",
    "corr_qty_price",
    "global_rank_docs",
    "star_join_region_stats",
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("key", EXT_KEYS)
def test_ext_query_matches_oracle(ray_session, ddb, key):
    from tiny_lingua_ray.pipelines.relational_ext import ORACLE_EXT, QUERIES_EXT

    got = to_pandas(QUERIES_EXT[key](SF_DIR))
    want = ddb.sql(ORACLE_EXT[key]).df()
    assert len(got) == len(want), (key, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns)
    assert canonical_hash(got) == canonical_hash(want), key


def test_asof_join_no_match_rows_dropped(ray_session):
    """Events earlier than every order of their user are dropped (inner
    as-of semantics) — at sf0.001 all events are later than all orders,
    so the join is total; assert that invariant explicitly."""
    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.relational_ext import q_asof_event_order

    n_events = pq.read_metadata(f"{SF_DIR}/events.parquet").num_rows
    out = to_pandas(q_asof_event_order(SF_DIR))
    assert len(out) == n_events
    assert out["o_orderkey"].notna().all()


def test_hash_split_deterministic(ray_session):
    """Same input -> identical split assignment across runs (no RNG)."""
    from tiny_lingua_ray.pipelines.relational_ext import q_hash_split

    a = to_pandas(q_hash_split(SF_DIR)).sort_values("split").reset_index(drop=True)
    b = to_pandas(q_hash_split(SF_DIR)).sort_values("split").reset_index(drop=True)
    assert a.equals(b)
    assert set(a["split"]) == {"train", "val", "test"}
    # ~80/10/10 by construction
    total = a["n_docs"].sum()
    train = int(a.loc[a["split"] == "train", "n_docs"].iloc[0])
    assert 0.6 < train / total < 0.95


def test_corpus_prep_matches_composite_oracle(ray_session, ddb):
    """The end-to-end corpus-prep pipeline (one-pass stats -> content-hash
    dedup -> quality gate) hash-matches the SQL composition of its stage
    oracles."""
    from tiny_lingua_ray.pipelines.queries import ORACLE, QUERIES

    got = to_pandas(QUERIES["corpus_prep"](SF_DIR))
    want = ddb.sql(ORACLE["corpus_prep"]).df()
    assert len(got) == len(want)
    assert canonical_hash(got) == canonical_hash(want)


def test_task_failure_recovery(ray_session, tmp_path):
    """A worker that dies mid-task (simulated os._exit) is retried by Ray
    and the pipeline still completes with every row accounted for — the
    fault-tolerance story the resumable sink builds on."""
    import ray.data as rd

    flag = str(tmp_path / "died_once")

    def maybe_die(batch):
        import os

        if not os.path.exists(flag):
            open(flag, "w").close()
            os._exit(1)  # hard worker crash, not a UDF exception
        return batch

    ds = rd.range(1000, override_num_blocks=8).map_batches(
        maybe_die, batch_format="pyarrow"
    )
    assert ds.count() == 1000


def test_bloom_filter_no_false_negatives():
    """Every inserted key must test positive (bloom guarantees no false
    negatives); the FP rate on disjoint probes stays near the design
    point (~0.2% at 50k keys / 1M bits / k=4)."""
    import numpy as np

    from tiny_lingua_ray.pipelines.relational_ext import (
        _BLOOM_BITS,
        _bloom_positions,
    )

    rng = np.random.default_rng(7)
    keys = rng.choice(10_000_000, size=50_000, replace=False).astype(np.int64)
    bits = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
    pos = _bloom_positions(keys).ravel()
    np.bitwise_or.at(
        bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
    )

    def member(k):
        p = _bloom_positions(k)
        hit = np.ones(len(k), dtype=bool)
        for j in range(p.shape[1]):
            pj = p[:, j]
            hit &= (
                bits[pj >> 6] >> (pj & 63).astype(np.uint64)
            ) & np.uint64(1) > 0
        return hit

    assert member(keys).all()  # no false negatives, ever
    probes = (
        rng.choice(10_000_000, size=100_000, replace=False) + 10_000_000
    ).astype(np.int64)
    fp = member(probes).mean()
    assert fp < 0.01, fp
