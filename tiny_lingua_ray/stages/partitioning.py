"""Explicit skew-aware partitioning (north rule: "partitioning / shuffle /
skew handled explicitly").

The repo defends against key skew at three levels, in preference order:

1. **Algebraic partial aggregation** inside ``map_batches`` — no per-key
   co-location at all; only (key, partial) rows ride the shuffle
   (``pipelines/queries.py`` partial-agg idiom, used by every SUM/COUNT/
   AVG/top-k query).
2. **(key, value)-count histograms** for holistic stats — percentiles,
   mode, medians reduce to a small exact histogram before any grouping
   (``pipelines/relational_ext.q_group_percentiles``).
3. **This module** — for true ``map_groups`` semantics on a skewed key,
   where a per-group function must see whole groups and the hot key would
   otherwise concentrate on one reducer: detect hot keys from a cheap
   counting pre-pass, then run a salted TWO-PHASE combine that bounds any
   single Ray group to ~|hot key| / n_salt rows.

Related per-operator guards: LSH hot-bucket caps
(``stages/dedup.MAX_BUCKET``, ``stages/similarity.MAX_COS_BUCKET``) and
value-offset bucketing in ``relational_ext`` (global rank).

At cluster scale the same functions apply unchanged: ``detect_hot_keys``
is one partial-count pass (tiny result), and the salt column simply
widens the shuffle key space — no driver materialization anywhere.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from tiny_lingua_ray.tableutil import from_df as _from_df

SALT_COL = "__salt"


def shards_for(ds, target_bytes: int = 64 << 20, lo: int = 16,
               hi: int = 1 << 20, pow2: bool = False) -> int:
    """Coarse shard-group count for the one-exchange ``map_groups``
    idiom, derived from the input size.

    Each coarse group materializes as ONE pandas frame on one worker, so
    the group count must scale with the data: ``ceil(bytes /
    target_bytes)``, floored at ``lo`` (16 keeps every CPU busy at test
    scale) and capped at ``hi``.  Call it on the SOURCE read —
    ``size_bytes()`` there is a metadata-only estimate, while on a
    derived dataset it would execute the pipeline.  The shard id is a
    pure routing key (each in-shard function still groups by the true
    key), so any shard count yields identical results.
    """
    try:
        nbytes = int(ds.size_bytes() or 0)
    except Exception:  # noqa: BLE001 — size unknown: fall back to floor
        # At production scale a silent floor would quietly collapse the
        # fan-out this size derivation exists to provide — make the
        # degradation visible (ADVICE r4).
        import logging

        # NOTE: log the type name only — Dataset.__repr__ touches
        # plan/schema state and can itself be slow or raise in exactly
        # this broken-metadata case
        logging.getLogger(__name__).warning(
            "shards_for: size_bytes() failed on a %s — falling back to "
            "the %d-shard floor; pass a SOURCE read (metadata-only size) "
            "or use shards_for_table()", type(ds).__name__, lo,
        )
        nbytes = 0
    n = int(max(lo, min(hi, -(-nbytes // target_bytes))))
    # pow2: for callers sharding with a bit_wise_and(key, P - 1) mask
    # (same rule as shards_for_table)
    return 1 << (n - 1).bit_length() if pow2 else n


def shards_for_table(sf_dir: str, table: str,
                     target_bytes: int = 16 << 20, lo: int = 16,
                     hi: int = 1 << 20, pow2: bool = False) -> int:
    """``shards_for`` from the parquet ON-DISK size — no Dataset needed,
    so it drops into any query as a one-line replacement for a fixed
    shard constant.  The per-shard target is 16 MB on disk (~64 MB
    in-memory at typical 2-5x parquet compression, matching
    ``shards_for``'s in-memory target).  For multi-table queries pass
    the LARGER table.  ``pow2`` rounds UP to the next power of two for
    callers that shard with a ``bit_wise_and(key, P - 1)`` mask — a
    non-power-of-two mask would silently collapse most mask bits and
    concentrate the exchange on a handful of shards."""
    import os

    path = f"{sf_dir}/{table}.parquet"
    nbytes = 0
    if os.path.isfile(path):
        nbytes = os.path.getsize(path)
    elif os.path.isdir(path):
        nbytes = sum(
            e.stat().st_size for e in os.scandir(path) if e.is_file()
        )
    n = int(max(lo, min(hi, -(-nbytes // target_bytes))))
    return 1 << (n - 1).bit_length() if pow2 else n


def key_shares(ds, key: str) -> pd.DataFrame:
    """Per-key row share via per-batch count partials -> one tiny
    groupby.  Returns columns (key, n, share) sorted by share desc;
    size = key cardinality (callers use it for LOW-cardinality group
    keys; for high-cardinality keys sample first)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = (
            pa.table({key: b.column(key)})
            .to_pandas()
            .groupby(key, as_index=False, dropna=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return _from_df(df)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if counts.empty:  # empty input: column-less frame from Ray
        import pandas as pd

        counts = pd.DataFrame({key: [], "n": []})
    total = int(counts["n"].sum())
    counts["share"] = counts["n"] / max(total, 1)
    return counts.sort_values("share", ascending=False, ignore_index=True)


def detect_hot_keys(ds, key: str, threshold: float = 0.05) -> frozenset:
    """Keys holding more than ``threshold`` of all rows.  One cheap
    counting pass (partial counts, no text columns — select upstream);
    the result is driver-small (bounded by 1/threshold entries)."""
    shares = key_shares(ds, key)
    hot = shares.loc[shares["share"] > threshold, key]
    return frozenset(hot.tolist())


def add_salt(ds, key: str, hot_keys: frozenset, n_salt: int):
    """Append ``__salt``: 0 for cold keys, a row-cycling 0..n_salt-1 for
    hot keys, so ``groupby([key, __salt])`` bounds every Ray group to
    ~|hot key| / n_salt rows.  Salt assignment is arbitrary by design —
    any partition of a hot key's rows merges to the same final answer,
    so no stable row id is required."""
    hot = hot_keys  # closure copy; frozenset is ray.put-friendly and tiny

    def salt_batch(b: pa.Table) -> pa.Table:
        col = b.column(key)
        if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
            k = col.to_numpy(zero_copy_only=False)
            is_hot = np.isin(k, np.asarray(sorted(hot)))
            n = len(k)
        else:
            k = col.to_pylist()
            n = len(k)
            is_hot = np.fromiter((v in hot for v in k), dtype=bool, count=n)
        salt = np.where(is_hot, np.arange(n) % n_salt, 0).astype(np.int64)
        # metadata-free: pandas schema blobs are unhashable in pyarrow 16
        # and defeat Ray's shuffle schema dedup (see tableutil.from_df)
        return b.append_column(
            SALT_COL, pa.array(salt)
        ).replace_schema_metadata(None)

    return ds.map_batches(salt_batch, batch_format="pyarrow")


def salted_map_groups(
    ds,
    key: str,
    group_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    n_salt: int = 16,
    hot_keys: frozenset | None = None,
    hot_threshold: float = 0.05,
):
    """Two-phase skew-safe ``groupby(key).map_groups``.

    Phase 1 groups by (key, salt) — a hot key's rows are spread across
    ``n_salt`` groups — and applies ``group_fn`` (raw rows -> partial
    rows, must include ``key``).  Phase 2 groups the (much smaller)
    partials by ``key`` alone and applies ``merge_fn`` (partials ->
    final rows).  ``group_fn``'s output must be mergeable: merge_fn(
    concat(partials)) == merge_fn(group_fn(all rows)).

    When ``hot_keys`` is None they are detected with an extra counting
    pass; pass a precomputed frozenset to skip it."""
    if hot_keys is None:
        hot_keys = detect_hot_keys(ds, key, hot_threshold)

    def phase1(df: pd.DataFrame) -> pd.DataFrame:
        return group_fn(df.drop(columns=[SALT_COL]))

    salted = add_salt(ds, key, hot_keys, n_salt)
    partials = salted.groupby([key, SALT_COL]).map_groups(
        phase1, batch_format="pandas"
    )
    return partials.groupby(key).map_groups(merge_fn, batch_format="pandas")


def exclusive_bucket_offsets(tagged, bucket_col: str = "bucket"):
    """Exact exclusive row offsets per bucket of an already-bucketed
    Dataset — the shared scaffold of every distributed exact-rank
    operator (relational_ext.q_global_rank_docs,
    queries.q_deterministic_shuffle): tiny groupby-count -> cumsum,
    broadcast once.  Returns a ray ObjectRef to a {bucket: offset}
    dict, or None when the Dataset is empty (Ray's empty aggregate is a
    column-less frame, so the caller must emit its typed empty)."""
    import ray

    counts = tagged.groupby(bucket_col).count().to_pandas()
    if len(counts) == 0:
        return None
    counts = counts.sort_values(bucket_col)
    counts["offset"] = counts["count()"].cumsum() - counts["count()"]
    return ray.put(
        dict(
            zip(counts[bucket_col].astype(int), counts["offset"].astype(int))
        )
    )
