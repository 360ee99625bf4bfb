"""Extended relational / training-data operators (round 2).

Distributed join & window shapes the core queries module does not cover,
each with a DuckDB SQL oracle (ORACLE_EXT):

- shuffle hash join for LARGE x LARGE sides (cogrouped by key shard; the
  broadcast join in queries.py only handles a small side) with a band
  (date-range) predicate,
- distributed as-of join (hash-cogroup + per-shard pandas ``merge_asof``),
- broadcast semi-join (small distinct key set via ``ray.put``),
- grouped top-k (per-block partial top-k, tiny merge — never a
  full-cardinality shuffle),
- deterministic hash split (train/val/test by md5 of the id — the
  Ray side is bit-identical to DuckDB ``md5_number_lower``),
- rolling 7-day window over a distributed daily pre-aggregate,
- exact distributed percentiles via value-domain histogram partials.

Scale notes per operator are in the docstrings.  The cogroup idiom used
by the two joins: tag each side, ``union`` into one Dataset with a
common schema, ``groupby(shard)`` once, and run one pandas-C join per
shard — one all-to-all exchange total, never one Ray group per key
(see stages/dedup.py for the shard-merge rationale).
"""

from __future__ import annotations

import numpy as np
from tiny_lingua_ray.tableutil import round_half_away as _rha
from tiny_lingua_ray.stages.partitioning import shards_for_table as _shards_for_table
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tiny_lingua_ray.tableutil import from_df as _from_df


def _str_keys(series) -> list:
    """Group-key series -> list for pa.array(..., pa.string()): pandas
    represents a NULL group key (groupby dropna=False) as NaN, which
    pa.string() rejects — map it back to None."""
    return [None if pd.isna(v) else v for v in series]

from tiny_lingua_ray.stages.dedup import _md5_lower64_batch


def _id_rank_hash(ids: np.ndarray, scheme: str) -> np.ndarray:
    """uint64 rank hash per id.  ``scheme="md5"`` (default in the
    queries) is bit-identical to DuckDB ``md5_number_lower`` so the whole
    split/sample assignment is SQL-oracle-verifiable; ``scheme="fnv"`` is
    the vectorized production path (stages/dedup.fnv1a_64 semantics,
    ~10x cheaper, not SQL-expressible)."""
    strs = [str(i) for i in ids]
    if scheme == "md5":
        return _md5_lower64_batch(strs)
    if scheme == "fnv":
        from tiny_lingua_ray.models.train import fnv1a_64_batch

        return fnv1a_64_batch(strs)
    raise ValueError(f"unknown hash scheme {scheme!r} (want 'md5' or 'fnv')")


def _read(sf_dir: str, table: str, columns=None):
    from tiny_lingua_ray.pipelines.queries import _read as r

    return r(sf_dir, table, columns=columns)


_US_PER_DAY = 86_400_000_000


def _ts_us(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Timestamp column -> int64 microseconds (explicit unit: ns-backed
    pandas materialization off-by-1000x is a documented footgun,
    see q_user_sessions)."""
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


# ---------------------------------------------------------------------------
# Shuffle hash join (large x large) with band predicate
# ---------------------------------------------------------------------------

def q_order_lineitem_band_join(sf_dir: str):
    """Per-order count/sum of lineitems shipped within 90 days of the
    order date: equality on orderkey + date-band predicate.

    Both sides are large, so no broadcast: shard = orderkey % P on BOTH
    sides, union, ONE groupby(shard) exchange, then a pandas-C hash join
    + band filter + aggregate inside each shard.  At 100 TB this moves
    each row exactly once and the per-shard join is C-speed; P scales
    with cluster size (keys are uniform, no salt needed — a skewed key
    would get the MAX_BUCKET-style cap treatment from stages/dedup.py).
    """
    P = _shards_for_table(sf_dir, "lineitem", lo=32, pow2=True)

    def prep_orders(b: pa.Table) -> pa.Table:
        key = b.column("o_orderkey")
        return pa.table(
            {
                "shard": pc.cast(pc.bit_wise_and(key, P - 1), pa.int64()),
                "key": pc.cast(key, pa.int64()),
                "ts_us": _ts_us(b.column("o_orderdate")),
                "price": pa.nulls(b.num_rows, pa.float64()),
                "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            }
        )

    def prep_lineitem(b: pa.Table) -> pa.Table:
        key = b.column("l_orderkey")
        return pa.table(
            {
                "shard": pc.cast(pc.bit_wise_and(key, P - 1), pa.int64()),
                "key": pc.cast(key, pa.int64()),
                "ts_us": _ts_us(b.column("l_shipdate")),
                "price": pc.cast(b.column("l_extendedprice"), pa.float64()),
                "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            }
        )

    def join_in_shard(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 0][["key", "ts_us"]].rename(columns={"ts_us": "o_ts"})
        l = df[df["side"] == 1][["key", "ts_us", "price"]]
        m = l.merge(o, on="key", how="inner")
        d = m["ts_us"] - m["o_ts"]
        m = m[(d >= 0) & (d <= 90 * _US_PER_DAY)]
        if len(m) == 0:
            # typed empty: groupby on an empty frame yields dtypes the
            # downstream schema-unify can't hash (RefBundle warnings)
            return pd.DataFrame(
                {"o_orderkey": pd.Series(dtype="int64"),
                 "n_items": pd.Series(dtype="int64"),
                 "sum_price": pd.Series(dtype="float64")}
            )
        g = m.groupby("key", as_index=False).agg(
            n_items=("price", "size"), sum_price=("price", "sum")
        )
        g["sum_price"] = _rha(g["sum_price"], 2)
        return g.rename(columns={"key": "o_orderkey"})

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        prep_orders, batch_format="pyarrow"
    )
    items = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate", "l_extendedprice"]
    ).map_batches(prep_lineitem, batch_format="pyarrow")
    return (
        orders.union(items)
        .groupby("shard")
        .map_groups(join_in_shard, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Distributed as-of join
# ---------------------------------------------------------------------------

def q_asof_event_order(sf_dir: str):
    """For every event, the most recent order (by the same customer) at
    or before the event timestamp — the classic as-of join.

    Ray Data has no asof-join; composition: pre-reduce the right side to
    one row per (custkey, orderdate) [max orderkey — makes the match
    deterministic], hash-cogroup both sides on user shard, and run
    pandas ``merge_asof`` (sorted C merge) once per shard.  One
    exchange; per-shard memory is events+orders of 1/P of the users.
    """
    P = _shards_for_table(sf_dir, "events", pow2=True)

    def prep_events(b: pa.Table) -> pa.Table:
        uid = b.column("user_id")
        return pa.table(
            {
                "shard": pc.cast(pc.bit_wise_and(uid, P - 1), pa.int64()),
                "key": pc.cast(uid, pa.int64()),
                "ts_us": _ts_us(b.column("ts")),
                "id": pc.cast(b.column("event_id"), pa.int64()),
                "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            }
        )

    def prep_orders(b: pa.Table) -> pa.Table:
        # block-local pre-reduce: one row per (custkey, orderdate)
        df = pa.table(
            {
                "key": pc.cast(b.column("o_custkey"), pa.int64()),
                "ts_us": _ts_us(b.column("o_orderdate")),
                "id": pc.cast(b.column("o_orderkey"), pa.int64()),
            }
        ).to_pandas()
        g = df.groupby(["key", "ts_us"], as_index=False)["id"].max()
        g["shard"] = g["key"] % P
        g["side"] = np.int8(1)
        return _from_df(
            g[["shard", "key", "ts_us", "id", "side"]], preserve_index=False
        )

    empty_asof = pd.DataFrame(
        {"event_id": pd.Series(dtype="int64"),
         "user_id": pd.Series(dtype="int64"),
         "o_orderkey": pd.Series(dtype="int64")}
    )

    def asof_in_shard(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df["side"] == 0][["key", "ts_us", "id"]].sort_values("ts_us")
        od = df[df["side"] == 1][["key", "ts_us", "id"]]
        if len(ev) == 0 or len(od) == 0:
            return empty_asof  # typed empty (RefBundle schema warnings)
        # cross-block duplicates of (key, ts_us) can survive the
        # block-local pre-reduce; finish it here (tiny per shard)
        od = (
            od.groupby(["key", "ts_us"], as_index=False)["id"]
            .max()
            .sort_values("ts_us")
        )
        m = pd.merge_asof(
            ev.rename(columns={"id": "event_id"}),
            od.rename(columns={"id": "o_orderkey"}),
            on="ts_us",
            by="key",
            direction="backward",
        )
        m = m.dropna(subset=["o_orderkey"])
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype(np.int64),
                "user_id": m["key"].astype(np.int64),
                "o_orderkey": m["o_orderkey"].astype(np.int64),
            }
        )

    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"]).map_batches(
        prep_events, batch_format="pyarrow"
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    return (
        events.union(orders)
        .groupby("shard")
        .map_groups(asof_in_shard, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Broadcast semi-join
# ---------------------------------------------------------------------------

def q_semi_join_big_spenders(sf_dir: str):
    """Events by users who placed at least one order over 300: semi-join
    with a SMALL distinct key set -> broadcast it (``ray.put`` once, read
    zero-copy in every filter task) instead of shuffling the events.

    The distinct-key reduction itself is distributed (per-block unique
    partials -> tiny driver union); only the deduplicated key set — not
    the orders table — crosses to the driver.
    """
    import ray

    def key_partial(b: pa.Table) -> pa.Table:
        keep = pc.greater(b.column("o_totalprice"), 300.0)
        keys = pc.unique(b.filter(keep).column("o_custkey"))
        return pa.table({"k": pc.cast(keys, pa.int64())})

    keys_ds = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(key_partial, batch_format="pyarrow")
        .to_pandas()
    )
    key_arr = (
        np.unique(keys_ds["k"].to_numpy())
        if not keys_ds.empty  # empty input: column-less frame from Ray
        else np.array([], dtype=np.int64)
    )
    keys_ref = ray.put(key_arr)

    empty = pa.table(
        {"event_type": pa.array([], pa.string()),
         "n_events": pa.array([], pa.int64())}
    )

    def count_partial(b: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)  # zero-copy plasma read per task
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        mask = np.isin(uid, keys, assume_unique=False)
        t = b.filter(pa.array(mask))
        if t.num_rows == 0:
            # typed: from_pandas on an empty groupby infers a null-typed
            # event_type column and breaks downstream schema unification
            return empty
        df = (
            pa.table({"event_type": t.column("event_type")})
            .to_pandas()
            .groupby("event_type", as_index=False)
            .size()
            .rename(columns={"size": "n_events"})
        )
        return _from_df(df, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "events", columns=["user_id", "event_type"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"))
    )


# ---------------------------------------------------------------------------
# Grouped top-k
# ---------------------------------------------------------------------------

def q_group_topk_docs(sf_dir: str):
    """Top-3 longest documents per language (rank = n_chars desc, doc_id
    asc).  Per-block partial top-3 per group, then one tiny merge of
    nlangs x 3 x nblocks rows — the full table is never shuffled and the
    merge input is O(groups x k x blocks), independent of row count."""
    K = 3

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "lang": b.column("lang"),
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "n_chars": pc.cast(b.column("n_chars"), pa.int64()),
            }
        ).to_pandas()
        top = (
            df.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
            .groupby("lang", as_index=False)
            .head(K)
        )
        return _from_df(top, preserve_index=False)

    parts = (
        _read(sf_dir, "documents", columns=["lang", "doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:  # empty corpus: column-less frame from Ray
        parts = pd.DataFrame({"lang": [], "doc_id": [], "n_chars": []})
    top = parts.sort_values(
        ["lang", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    top = top.groupby("lang", as_index=False).head(K).reset_index(drop=True)
    top["rk"] = top.groupby("lang").cumcount() + 1
    return top[["lang", "doc_id", "n_chars", "rk"]]


# ---------------------------------------------------------------------------
# Deterministic hash split
# ---------------------------------------------------------------------------

def q_hash_split(sf_dir: str, scheme: str = "md5"):
    """Deterministic train/val/test split: bucket = hash(doc_id) % 10
    (<8 train, 8 val, 9 test) — reproducible across runs/engines, no RNG.
    ``scheme="md5"`` (default) is bit-identical to DuckDB
    ``md5_number_lower`` so the whole split is oracle-verified;
    ``scheme="fnv"`` is the vectorized production path (~10x cheaper
    per row, same distribution, not SQL-expressible).  Per-block partial
    counts -> 3-row groupby."""

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        buckets = (_id_rank_hash(ids, scheme) % np.uint64(10)).astype(np.int64)
        split = np.where(buckets < 8, "train", np.where(buckets == 8, "val", "test"))
        df = pd.DataFrame(
            {"split": split, "n_chars": b.column("n_chars").to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("split", as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )
        return _from_df(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("split")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling 7-day window
# ---------------------------------------------------------------------------

def q_rolling_7d_value(sf_dir: str):
    """7-day rolling sum of daily event value per event_type.

    The heavy reduction (rows -> one value per (type, day)) is the
    distributed part: block partials -> groupby.  The window runs on the
    pre-reduced frame, bounded by days x types (tens of KB for years of
    data), per type — never on raw rows.  Daily sums are rounded to 6
    decimals on BOTH sides before the window so the rolling accumulation
    is order-insensitive at the 4-decimal output precision."""

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b["ts"], unit="day")
        df = pa.table(
            {"event_type": b["event_type"], "day": day, "value": b["value"]}
        ).to_pandas()
        g = df.groupby(["event_type", "day"], as_index=False).agg(v=("value", "sum"))
        return _from_df(g, preserve_index=False)

    from ray.data.aggregate import Sum

    daily = (
        _read(sf_dir, "events", columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "day"])
        .aggregate(Sum("v", alias_name="v"))
        .to_pandas()
    )
    if daily.empty:  # empty input: column-less frame from Ray
        return pd.DataFrame({"event_type": [], "day": [], "v7": []})
    daily["v"] = _rha(daily["v"], 6)
    daily = daily.sort_values(["event_type", "day"])

    def roll(g: pd.DataFrame) -> pd.Series:
        return g.rolling("7D", on="day")["v"].sum()

    daily["v7"] = (
        _rha(daily.groupby("event_type", group_keys=False)[["day", "v"]].apply(roll), 4)
    )
    return daily[["event_type", "day", "v7"]]


# ---------------------------------------------------------------------------
# Exact distributed percentiles
# ---------------------------------------------------------------------------

def q_percentiles_chars(sf_dir: str):
    """Exact p50/p90/p99 of document length without a global sort:
    per-block value-count partials over the (naturally bounded) discrete
    length domain -> one tiny groupby -> CDF inversion on the driver.
    quantile index matches DuckDB quantile_disc: sorted[ceil(q*n) - 1].

    Scale note: cost is O(distinct values), not O(rows) — for char
    lengths distinct <= max doc length; for unbounded domains swap in a
    fixed-width histogram or t-digest (approximate) partial."""

    def partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b.column("n_chars"))
        return pa.table(
            {
                "n_chars": pc.cast(vc.field("values"), pa.int64()),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    hist = (
        _read(sf_dir, "documents", columns=["n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("n_chars")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    if hist.empty:  # empty input: column-less frame from Ray
        return pd.DataFrame({"p50": [], "p90": [], "p99": []})
    hist = hist.sort_values("n_chars")
    vals = hist["n_chars"].to_numpy()
    cum = hist["cnt"].to_numpy().cumsum()
    n = int(cum[-1])

    def pick(q: float) -> int:
        rank = int(np.ceil(q * n))  # 1-based rank, = ceil(q*n)-1 0-based
        return int(vals[np.searchsorted(cum, rank)])

    return pd.DataFrame(
        {"p50": [pick(0.5)], "p90": [pick(0.9)], "p99": [pick(0.99)]}
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sample
# ---------------------------------------------------------------------------

def q_stratified_sample(sf_dir: str, scheme: str = "md5"):
    """Deterministic stratified sample: the 5 docs per language with the
    smallest hash(doc_id) — rank-by-hash gives an unbiased, reproducible,
    engine-independent sample with no RNG state to ship.  ``scheme="md5"``
    (default) matches DuckDB ``md5_number_lower`` for the SQL oracle;
    ``scheme="fnv"`` is the vectorized production path.  Same partial
    top-k shape as q_group_topk_docs: per-block smallest-5 per group,
    tiny merge, never a full-cardinality shuffle."""
    K = 5

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        rank = _id_rank_hash(ids, scheme)
        df = pd.DataFrame(
            {
                "lang": b.column("lang").to_pandas(),
                "doc_id": ids.astype(np.int64),
                "rank_key": rank,
            }
        )
        top = (
            df.sort_values(["lang", "rank_key", "doc_id"])
            .groupby("lang", as_index=False)
            .head(K)
        )
        return _from_df(top, preserve_index=False)

    parts = (
        _read(sf_dir, "documents", columns=["lang", "doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:  # empty corpus: column-less frame from Ray
        parts = pd.DataFrame({"lang": [], "doc_id": [], "rank_key": []})
    top = (
        parts.sort_values(["lang", "rank_key", "doc_id"])
        .groupby("lang", as_index=False)
        .head(K)
        .reset_index(drop=True)
    )
    top["rk"] = top.groupby("lang").cumcount() + 1
    return top[["lang", "doc_id", "rk"]]


# ---------------------------------------------------------------------------
# Semi-structured (JSON) extraction
# ---------------------------------------------------------------------------

def q_json_extract_stats(sf_dir: str):
    """Extract a field from a JSON string column (semi-structured data
    path) and aggregate it: stdlib json.loads per row inside map_batches
    partials (the parse runs where the data lives; only (type, sum, n)
    partials shuffle), then a tiny groupby merge."""
    import json

    def partial(b: pa.Table) -> pa.Table:
        props = b.column("props").to_pylist()
        loads = json.loads
        k = np.fromiter(
            (loads(p).get("k", 0) if p else 0 for p in props),
            dtype=np.int64,
            count=len(props),
        )
        df = pd.DataFrame(
            {"event_type": b.column("event_type").to_pandas(), "k": k}
        )
        g = df.groupby("event_type", as_index=False).agg(
            sum_k=("k", "sum"), n=("k", "size")
        )
        return _from_df(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "events", columns=["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("sum_k", alias_name="sum_k"), Sum("n", alias_name="n"))
    )


# ---------------------------------------------------------------------------
# Pivot (long -> wide)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_event_counts(sf_dir: str):
    """Long->wide pivot: one row per user with a count column per event
    type.  Block-local crosstab partials -> groupby-sum over the five
    fixed columns; the shuffle carries one row per (user x block), never
    the raw events."""

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table(
            {"user_id": b.column("user_id"), "event_type": b.column("event_type")}
        ).to_pandas()
        g = df.groupby("user_id", as_index=False)
        out = g.size().rename(columns={"size": "_n"})[["user_id"]]
        for t in _EVENT_TYPES:
            c = (
                df[df["event_type"] == t]
                .groupby("user_id")
                .size()
                .rename(f"n_{t}")
            )
            out = out.join(c, on="user_id")
        out = out.fillna(0)
        for t in _EVENT_TYPES:
            out[f"n_{t}"] = out[f"n_{t}"].astype(np.int64)
        return _from_df(out, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "events", columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            *[Sum(f"n_{t}", alias_name=f"n_{t}") for t in _EVENT_TYPES]
        )
    )


# ---------------------------------------------------------------------------
# Grouped exact percentiles
# ---------------------------------------------------------------------------

def q_group_percentiles(sf_dir: str):
    """p50/p90 of document length PER LANGUAGE — grouped variant of
    q_percentiles_chars: (lang, value)-count partials -> one tiny
    groupby -> per-group CDF inversion (quantile index = DuckDB
    quantile_disc: sorted[ceil(q*n) - 1])."""

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table(
            {"lang": b.column("lang"), "n_chars": b.column("n_chars")}
        ).to_pandas()
        g = df.groupby(["lang", "n_chars"], as_index=False).size()
        g = g.rename(columns={"size": "cnt"})
        return _from_df(g, preserve_index=False)

    from ray.data.aggregate import Sum

    hist = (
        _read(sf_dir, "documents", columns=["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    if hist.empty:  # empty input: column-less frame from Ray
        hist = pd.DataFrame({"lang": [], "n_chars": [], "cnt": []})
    hist = hist.sort_values(["lang", "n_chars"])
    rows = []
    for lang, g in hist.groupby("lang"):
        vals = g["n_chars"].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        pick = lambda q: int(vals[np.searchsorted(cum, int(np.ceil(q * n)))])
        rows.append((lang, pick(0.5), pick(0.9)))
    return pd.DataFrame(rows, columns=["lang", "p50", "p90"])


# ---------------------------------------------------------------------------
# Broadcast range join (small side = interval table)
# ---------------------------------------------------------------------------

_SIZE_BUCKETS = (0, 100, 200, 300, 400)  # [lo, next) ; last is open-ended


def q_range_join_size_buckets(sf_dir: str):
    """Range join against a SMALL interval table (size buckets): the
    classic broadcast-range-join shape — the interval bounds live in
    every task (they're module constants; for a dynamic small side,
    ``ray.put`` them) and each batch resolves its bucket with ONE
    vectorized np.searchsorted instead of a non-equi join shuffle."""

    bounds = np.asarray(_SIZE_BUCKETS[1:], dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("n_chars").to_numpy(zero_copy_only=False)
        bucket_lo = np.asarray(_SIZE_BUCKETS, dtype=np.int64)[
            np.searchsorted(bounds, v, side="right")
        ]
        df = pd.DataFrame({"bucket_lo": bucket_lo, "n_chars": v})
        g = df.groupby("bucket_lo", as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )
        return _from_df(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "documents", columns=["n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket_lo")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Vectorized substring filter (Arrow compute kernel)
# ---------------------------------------------------------------------------

def q_substring_filter(sf_dir: str):
    """Docs containing a substring, counted per language — pure
    pyarrow.compute kernels (match_substring + filter) on zero-copy
    batches; only (lang, n) partials leave the tasks."""

    empty = pa.table(
        {"lang": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())}
    )

    def partial(b: pa.Table) -> pa.Table:
        hit = pc.match_substring(b.column("text"), "data")
        kept = b.filter(hit)
        if kept.num_rows == 0:
            return empty  # typed: an object-dtype empty block breaks union
        df = (
            pa.table({"lang": kept.column("lang")})
            .to_pandas()
            .groupby("lang", as_index=False)
            .size()
            .rename(columns={"size": "n_docs"})
        )
        return _from_df(df, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


# ---------------------------------------------------------------------------
# Shuffle anti-join (large x large)
# ---------------------------------------------------------------------------

def q_anti_join_inactive_customers(sf_dir: str):
    """Customers with NO high-value order (totalprice > 400k), counted
    per market segment — the anti-join shape (complement of
    q_semi_join_big_spenders' semi-join).  The price predicate exists so
    the anti-join is non-degenerate on the synthetic tables (every
    customer has SOME order at every sf); it is pushed into the orders
    read as a plain row filter.

    Both sides are large at scale, so no broadcast: the orders side is
    pre-reduced to per-batch DISTINCT custkeys (16 B/row rides the
    shuffle, never order rows), cogrouped with customers on
    ``custkey % P``, and each shard drops customers whose key appears on
    the order side with one pandas-C isin.  Only (segment, n) partials
    leave the shards."""
    P = _shards_for_table(sf_dir, "orders", lo=32, pow2=True)
    _PRICE = 400_000.0

    def prep_cust(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("c_custkey"), pa.int64())
        return pa.table(
            {
                "shard": pc.cast(pc.bit_wise_and(key, P - 1), pa.int64()),
                "key": key,
                "seg": b.column("c_mktsegment"),
                "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            }
        )

    def prep_orders(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("o_totalprice"), _PRICE))
        key = np.unique(
            b.column("o_custkey").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "shard": pa.array(key & (P - 1)),
                "key": pa.array(key),
                "seg": pa.nulls(len(key), pa.string()),
                "side": pa.array(np.ones(len(key), dtype=np.int8)),
            }
        )

    # typed ARROW empties/outputs: an empty pandas object column trips
    # Ray's block-size estimator ("cannot call `vectorize` on size 0
    # inputs") on every empty shard — arrow string columns don't
    empty = pa.table(
        {"c_mktsegment": pa.array([], pa.string()),
         "n_customers": pa.array([], pa.int64())}
    )

    def anti_in_shard(df: pd.DataFrame) -> pa.Table:
        cust = df[df["side"] == 0]
        active = df.loc[df["side"] == 1, "key"]
        miss = cust[~cust["key"].isin(active)]
        if len(miss) == 0:
            return empty
        g = miss.groupby("seg", as_index=False).size()
        return pa.table(
            {
                "c_mktsegment": pa.array(g["seg"].tolist(), pa.string()),
                "n_customers": pa.array(
                    g["size"].to_numpy(dtype=np.int64)
                ),
            }
        )

    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        prep_cust, batch_format="pyarrow"
    )
    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    return (
        cust.union(orders)
        .groupby("shard")
        .map_groups(anti_in_shard, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )


# ---------------------------------------------------------------------------
# Window lag: per-user inter-event gaps
# ---------------------------------------------------------------------------

def q_event_gaps(sf_dir: str):
    """Per-user inter-event-gap stats (the LAG window shape): events are
    cogrouped on ``user_id % P`` (ONE exchange, a shard holds every event
    of its users), each shard does one pandas-C sort + per-user diff, and
    only (user, n, sum, max) rows leave.  All-integer microsecond output —
    no float accumulation, so the oracle compare is exact at any scale."""
    P = _shards_for_table(sf_dir, "events", pow2=True)

    def prep(b: pa.Table) -> pa.Table:
        uid = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": pc.cast(pc.bit_wise_and(uid, P - 1), pa.int64()),
                "user_id": uid,
                "ts_us": _ts_us(b.column("ts")),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
            }
        )

    empty = pd.DataFrame(
        {"user_id": pd.Series(dtype="int64"),
         "n_events": pd.Series(dtype="int64"),
         "sum_gap_us": pd.Series(dtype="int64"),
         "max_gap_us": pd.Series(dtype="int64")}
    )

    def gaps_in_shard(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "ts_us", "event_id"])
        gap = df.groupby("user_id")["ts_us"].diff()
        ok = gap.notna()
        g = pd.DataFrame(
            {"user_id": df["user_id"], "gap": gap}
        )[ok]
        if len(g) == 0:
            return empty
        agg = (
            g.groupby("user_id")["gap"].agg(["sum", "max", "size"]).reset_index()
        )
        n = df.groupby("user_id", as_index=False).size().rename(
            columns={"size": "n_events"}
        )
        out = n.merge(agg, on="user_id", how="inner")  # >=2 events only
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "n_events": out["n_events"].astype("int64"),
                "sum_gap_us": out["sum"].astype("int64"),
                "max_gap_us": out["max"].astype("int64"),
            }
        )

    return (
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(gaps_in_shard, batch_format="pandas")
    )


def q_running_total(sf_dir: str):
    """Per-user running total of event value (the cumulative-SUM window
    shape, complementing q_event_gaps' LAG): ONE cogroup exchange on
    ``user_id % P`` so a shard holds every event of its users, then one
    pandas-C sort + groupby-cumsum per shard.  Per-row output (as the
    window function emits) — at scale this streams back out block by
    block, never through the driver."""
    from tiny_lingua_ray.stages.partitioning import shards_for

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    # next power of two >= the size-derived count (bit_wise_and mask)
    P = shards_for(ds, pow2=True)

    def prep(b: pa.Table) -> pa.Table:
        uid = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": pc.cast(pc.bit_wise_and(uid, P - 1), pa.int64()),
                "user_id": uid,
                "ts_us": _ts_us(b.column("ts")),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "value": pc.cast(b.column("value"), pa.float64()),
            }
        )

    empty = pa.table(
        {"event_id": pa.array([], pa.int64()),
         "user_id": pa.array([], pa.int64()),
         "ts_us": pa.array([], pa.int64()),
         "cum_value": pa.array([], pa.float64())}
    )

    def cumsum_in_shard(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "ts_us", "event_id"])
        cum = df.groupby("user_id")["value"].cumsum()
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(dtype=np.int64)),
                "user_id": pa.array(df["user_id"].to_numpy(dtype=np.int64)),
                "ts_us": pa.array(df["ts_us"].to_numpy(dtype=np.int64)),
                "cum_value": pa.array(_rha(cum.to_numpy(), 6)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(cumsum_in_shard, batch_format="pandas")
    )


def q_rollup_pricing(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) in ONE corpus pass:
    each batch emits partials for all three grouping sets ('ALL'
    sentinels for the rolled-up levels), so the rollup costs one small
    groupby over <= 3x|groups| partial rows per block — never three
    scans of the fact table."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            revenue=("l_extendedprice", "sum"),
            n_rows=("l_extendedprice", "size"),
        )
        g1 = g.groupby("l_returnflag", as_index=False)[
            ["revenue", "n_rows"]
        ].sum()
        g1["l_linestatus"] = "ALL"
        g0 = pd.DataFrame(
            {
                "l_returnflag": ["ALL"],
                "l_linestatus": ["ALL"],
                "revenue": [g["revenue"].sum()],
                "n_rows": [g["n_rows"].sum()],
            }
        )
        cols = ["l_returnflag", "l_linestatus", "revenue", "n_rows"]
        out = pd.concat([g[cols], g1[cols], g0[cols]], ignore_index=True)
        return _from_df(out, preserve_index=False)

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )
    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("revenue", alias_name="revenue"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .to_pandas()
    )
    if out.empty:  # empty input: column-less frame from Ray
        out = pd.DataFrame(
            {"l_returnflag": [], "l_linestatus": [], "revenue": [],
             "n_rows": []}
        )
    out["revenue"] = _rha(out["revenue"], 2)
    return out[["l_returnflag", "l_linestatus", "revenue", "n_rows"]]


# ---------------------------------------------------------------------------
# Left outer join
# ---------------------------------------------------------------------------


def q_left_join_customer_orders(sf_dir: str):
    """Per-customer order rollup that KEEPS customers with no matching
    order (LEFT OUTER): (c_custkey, c_mktsegment, n_orders,
    sum_spent) with 0/0.0 for the unmatched side.  Large x large -> the
    cogroup idiom: the orders side pre-reduces to per-batch
    (custkey, n, sum) partials (24 B/row rides the exchange, never order
    rows), one tagged-union groupby(custkey % P), per-shard pandas-C
    left merge with fillna.  The price predicate keeps the unmatched
    side non-empty on the synthetic tables."""
    P = _shards_for_table(sf_dir, "orders", lo=32, pow2=True)
    _PRICE = 400_000.0

    def prep_cust(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("c_custkey"), pa.int64())
        return pa.table(
            {
                "shard": pc.cast(pc.bit_wise_and(key, P - 1), pa.int64()),
                "key": key,
                "seg": b.column("c_mktsegment"),
                "n": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "s": pa.array(np.zeros(b.num_rows, dtype=np.float64)),
                "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            }
        )

    def prep_orders(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("o_totalprice"), _PRICE))
        df = pa.table(
            {"key": b.column("o_custkey"), "p": b.column("o_totalprice")}
        ).to_pandas()
        g = df.groupby("key", as_index=False).agg(
            n=("p", "size"), s=("p", "sum")
        )
        key = g["key"].to_numpy(np.int64)
        return pa.table(
            {
                "shard": pa.array(key & (P - 1)),
                "key": pa.array(key),
                "seg": pa.nulls(len(key), pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "s": pa.array(g["s"].to_numpy(np.float64)),
                "side": pa.array(np.ones(len(key), dtype=np.int8)),
            }
        )

    empty = pa.table(
        {"c_custkey": pa.array([], pa.int64()),
         "c_mktsegment": pa.array([], pa.string()),
         "n_orders": pa.array([], pa.int64()),
         "sum_spent": pa.array([], pa.float64())}
    )

    def join_in_shard(df: pd.DataFrame) -> pa.Table:
        cust = df[df["side"] == 0]
        if len(cust) == 0:
            return empty
        right = (
            df[df["side"] == 1]
            .groupby("key", as_index=False)[["n", "s"]]
            .sum()
        )
        m = cust[["key", "seg"]].merge(right, on="key", how="left")
        n = m["n"].fillna(0).to_numpy(np.int64)
        s = m["s"].fillna(0.0).to_numpy(np.float64)
        return pa.table(
            {
                "c_custkey": pa.array(m["key"].to_numpy(np.int64)),
                "c_mktsegment": pa.array(m["seg"].tolist(), pa.string()),
                "n_orders": pa.array(n),
                "sum_spent": pa.array(_rha(s, 2)),
            }
        )

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(prep_cust, batch_format="pyarrow")
    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    return (
        cust.union(orders)
        .groupby("shard")
        .map_groups(join_in_shard, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Star join (two-hop broadcast over dimension tables)
# ---------------------------------------------------------------------------


def q_star_join_region_stats(sf_dir: str):
    """TPC-H-style star join: customers x nation x region, aggregated to
    (r_name, n_customers, avg_acctbal).  Both dimension tables are tiny
    at ANY scale factor (25 nations / 5 regions in TPC-H), so they
    compose into ONE nationkey -> region-name lookup on the driver,
    broadcast once (ray.put); the fact table streams through a single
    map with a vectorized gather — zero shuffles before the 5-row
    aggregate."""
    import ray

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    if nat.empty or reg.empty:  # empty dims: column-less frames from Ray
        return pd.DataFrame(
            {"r_name": [], "n_customers": [], "avg_acctbal": []}
        ).astype({"n_customers": np.int64})
    lut = nat.merge(
        reg, left_on="n_regionkey", right_on="r_regionkey"
    ).set_index("n_nationkey")["r_name"]
    # dense positional lookup: nationkeys are small ints
    max_nk = int(lut.index.max())
    names = np.array(
        [lut.get(i, "") for i in range(max_nk + 1)], dtype=object
    )
    lut_ref = ray.put(names)

    def partial(b: pa.Table) -> pa.Table:
        nm = ray.get(lut_ref)
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        rname = nm[np.minimum(nk, len(nm) - 1)]
        df = pd.DataFrame({"r_name": rname, "bal": bal})
        g = df.groupby("r_name", as_index=False).agg(
            n=("bal", "size"), s=("bal", "sum")
        )
        return pa.table(
            {
                "r_name": pa.array(g["r_name"].tolist(), pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "s": pa.array(g["s"].to_numpy(np.float64)),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .to_pandas()
    )
    if out.empty:  # empty FACT side: column-less frame from Ray
        out = pd.DataFrame({"r_name": [], "n": [], "s": []})
    return pd.DataFrame(
        {
            "r_name": out["r_name"],
            "n_customers": out["n"].astype(np.int64),
            "avg_acctbal": _rha(out["s"] / out["n"], 6),
        }
    )


# ---------------------------------------------------------------------------
# Full outer join
# ---------------------------------------------------------------------------


def q_full_outer_user_days(sf_dir: str):
    """FULL OUTER join of each user's click-day set with their
    purchase-day set: (user_id, day, n_clicks, n_purchases) where either
    count may be 0 — days with only clicks, only purchases, or both all
    appear.  Completes the join family (inner/left/semi/anti/as-of/band/
    range/bloom).  ONE pass over events emits both tagged sides as
    (user, day, side, n) partials (no second scan of the table); ONE
    cogroup exchange on ``user % P``; per-shard pandas outer merge with
    fillna."""
    P = _shards_for_table(sf_dir, "events", lo=32, pow2=True)

    def prep(b: pa.Table) -> pa.Table:
        m = pc.is_in(
            b.column("event_type"),
            value_set=pa.array(["click", "purchase"]),
        )
        t = b.filter(m)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "user_id": t.column("user_id").to_numpy(
                    zero_copy_only=False
                ),
                "day": ts // 86_400_000_000,  # µs -> days since epoch
                "side": pc.equal(t.column("event_type"), "purchase")
                .to_numpy(zero_copy_only=False)
                .astype(np.int8),
            }
        )
        g = df.groupby(["user_id", "day", "side"], as_index=False).size()
        uid = g["user_id"].to_numpy(np.int64)
        return pa.table(
            {
                "shard": pa.array(uid % P),
                "user_id": pa.array(uid),
                "day": pa.array(g["day"].to_numpy(np.int64)),
                "n": pa.array(g["size"].to_numpy(np.int64)),
                "side": pa.array(g["side"].to_numpy(np.int8)),
            }
        )

    empty = pa.table(
        {"user_id": pa.array([], pa.int64()),
         "day": pa.array([], pa.int64()),
         "n_clicks": pa.array([], pa.int64()),
         "n_purchases": pa.array([], pa.int64())}
    )

    def outer_in_shard(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return empty
        c = (
            df[df["side"] == 0]
            .groupby(["user_id", "day"], as_index=False)["n"]
            .sum()
            .rename(columns={"n": "n_clicks"})
        )
        p = (
            df[df["side"] == 1]
            .groupby(["user_id", "day"], as_index=False)["n"]
            .sum()
            .rename(columns={"n": "n_purchases"})
        )
        m = c.merge(p, on=["user_id", "day"], how="outer")
        return pa.table(
            {
                "user_id": pa.array(m["user_id"].to_numpy(np.int64)),
                "day": pa.array(m["day"].to_numpy(np.int64)),
                "n_clicks": pa.array(
                    m["n_clicks"].fillna(0).to_numpy(np.int64)
                ),
                "n_purchases": pa.array(
                    m["n_purchases"].fillna(0).to_numpy(np.int64)
                ),
            }
        )

    return (
        _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(outer_in_shard, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Pearson correlation (sufficient statistics)
# ---------------------------------------------------------------------------


def q_corr_qty_price(sf_dir: str):
    """Per-returnflag Pearson correlation of quantity vs extended price
    from associative (n, sx, sy, sxx, syy, sxy) partials — the same
    sufficient-statistic shape as q_value_stats, two variables."""

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "f": b.column("l_returnflag"),
                "x": b.column("l_quantity"),
                "y": b.column("l_extendedprice"),
            }
        ).to_pandas()
        df["xx"] = df["x"] * df["x"]
        df["yy"] = df["y"] * df["y"]
        df["xy"] = df["x"] * df["y"]
        # dropna=False: keep a NULL group like SQL GROUP BY
        g = df.groupby("f", as_index=False, dropna=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), syy=("yy", "sum"), sxy=("xy", "sum"),
        )
        return pa.table(
            {
                "l_returnflag": pa.array(_str_keys(g["f"]), pa.string()),
                **{
                    c: pa.array(g[c].to_numpy(np.float64))
                    for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
                },
            }
        )

    from ray.data.aggregate import Sum

    out = (
        _read(
            sf_dir, "lineitem",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            *[Sum(c, alias_name=c)
              for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
        )
        .to_pandas()
    )
    if out.empty:  # empty input: column-less frame from Ray
        return pd.DataFrame(
            {"l_returnflag": [], "n": [], "corr_qty_price": []}
        ).astype({"n": np.int64})
    n = out["n"].to_numpy(np.float64)
    cov = out["sxy"] - out["sx"] * out["sy"] / n
    vx = out["sxx"] - out["sx"] ** 2 / n
    vy = out["syy"] - out["sy"] ** 2 / n
    with np.errstate(divide="ignore", invalid="ignore"):
        # zero variance (or n == 1) -> NaN, matching SQL CORR NULL
        denom = np.sqrt(vx * vy)
        corr = np.where(denom > 0, cov / denom, np.nan)
    return pd.DataFrame(
        {
            "l_returnflag": out["l_returnflag"],
            "n": out["n"].astype(np.int64),
            "corr_qty_price": _rha(corr, 6),
        }
    )


# ---------------------------------------------------------------------------
# Global rank (distributed ORDER BY + ROW_NUMBER, no single-node sort)
# ---------------------------------------------------------------------------


def q_global_rank_docs(sf_dir: str):
    """Every document's global rank by (n_chars DESC, doc_id ASC) —
    ROW_NUMBER over the whole table WITHOUT materializing a single-node
    sort: (1) a bounded driver sample estimates value splitters;
    (2) rows bucket by n_chars (searchsorted; equal values always share
    a bucket, so bucket boundaries can never split a tie group across
    workers); (3) per-bucket counts (tiny aggregate) give exact
    exclusive offsets on the driver; (4) each bucket sorts locally and
    adds its offset.  Skewed single values concentrate in one bucket —
    the documented trade; production would split ties by a secondary
    range on doc_id.  TWIN: queries.q_deterministic_shuffle shares the
    count->offset scaffold (partitioning.exclusive_bucket_offsets; it
    skips the splitter sample since md5 keys are uniform by
    construction)."""
    import ray

    P = _shards_for_table(sf_dir, "documents")

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    # splitter sample: hash-strided over doc_id, NOT limit() — the first
    # N rows reflect file order (corpora are often written grouped by
    # source/length), which would collapse the buckets onto one worker.
    # Correctness never depends on the sample, only balance does.
    n_total = docs.count()
    if n_total == 0:  # empty corpus: typed empty result
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_chars": pa.array([], pa.int64()),
                 "rk": pa.array([], pa.int64())}
            )
        )
    stride = max(1, n_total // 4096)

    def strided(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        keep = ((ids * np.uint64(2654435761)) >> np.uint64(16)) % np.uint64(
            stride
        ) == 0
        return b.filter(pa.array(keep))

    sample = docs.map_batches(strided, batch_format="pyarrow").to_pandas()
    qs = np.quantile(
        sample["n_chars"].to_numpy(np.float64),
        np.linspace(0, 1, P + 1)[1:-1],
    )
    splitters = np.unique(qs.astype(np.int64))  # ascending value cuts
    s_ref = ray.put(splitters)

    def bucketize(b: pa.Table) -> pa.Table:
        sp = ray.get(s_ref)
        v = b.column("n_chars").to_numpy(zero_copy_only=False)
        # DESC rank: bucket 0 holds the largest values
        bucket = len(sp) - np.searchsorted(sp, v, side="left")
        return pa.table(
            {
                "bucket": pa.array(bucket.astype(np.int64)),
                "doc_id": b.column("doc_id"),
                "n_chars": b.column("n_chars"),
            }
        )

    from tiny_lingua_ray.stages.partitioning import exclusive_bucket_offsets

    tagged = docs.map_batches(bucketize, batch_format="pyarrow").materialize()
    off_ref = exclusive_bucket_offsets(tagged)
    assert off_ref is not None  # n_total > 0 checked above

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "n_chars": pa.array([], pa.int64()),
         "rk": pa.array([], pa.int64())}
    )

    def rank_in_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return empty
        offs = ray.get(off_ref)
        base = int(offs[int(df["bucket"].iloc[0])])
        df = df.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True],
            ignore_index=True,
        )
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "n_chars": pa.array(df["n_chars"].to_numpy(np.int64)),
                "rk": pa.array(
                    base + 1 + np.arange(len(df), dtype=np.int64)
                ),
            }
        )

    return (
        tagged.groupby("bucket")
        .map_groups(rank_in_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Distributed variance / stddev (Welford-free sufficient statistics)
# ---------------------------------------------------------------------------


def q_value_stats(sf_dir: str):
    """Per-event-type mean / sample stddev / sample variance from
    (n, sum, sum-of-squares) sufficient-statistic partials — the
    textbook distributed second-moment aggregate: each batch emits one
    triple per group, the tiny partials sum associatively, the final
    formula runs on <=#groups rows on the driver."""

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table(
            {"event_type": b.column("event_type"), "v": b.column("value")}
        ).to_pandas()
        df["v2"] = df["v"] * df["v"]
        # dropna=False: SQL GROUP BY keeps a NULL group; pandas would
        # silently drop those rows from the partial
        g = df.groupby("event_type", as_index=False, dropna=False).agg(
            n=("v", "size"), s=("v", "sum"), s2=("v2", "sum")
        )
        return pa.table(
            {
                "event_type": pa.array(
                    _str_keys(g["event_type"]), pa.string()
                ),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "s": pa.array(g["s"].to_numpy(np.float64)),
                "s2": pa.array(g["s2"].to_numpy(np.float64)),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "events", columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("s2", alias_name="s2"),
        )
        .to_pandas()
    )
    if out.empty:  # empty input: column-less frame from Ray
        return pd.DataFrame(
            {"event_type": [], "n": [], "mean_value": [],
             "stddev_value": [], "var_value": []}
        ).astype({"n": np.int64})
    n = out["n"].to_numpy(np.float64)
    s = out["s"].to_numpy(np.float64)
    s2 = out["s2"].to_numpy(np.float64)
    mean = s / n
    with np.errstate(divide="ignore", invalid="ignore"):
        # n == 1 -> NaN, matching SQL VAR_SAMP/STDDEV_SAMP NULL
        var = np.where(n > 1, (s2 - n * mean * mean) / (n - 1), np.nan)
    return pd.DataFrame(
        {
            "event_type": out["event_type"],
            "n": out["n"].astype(np.int64),
            "mean_value": _rha(mean, 6),
            "stddev_value": _rha(np.sqrt(var), 6),
            "var_value": _rha(var, 6),
        }
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join (the shuffle-pruning scale path)
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 20  # 128 KB bitmap; ~0.2% FP at 50k keys with k=4
_BLOOM_K = 4


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(len(keys), k) bit positions from a splitmix64-style mix per
    hash seed — vectorized, deterministic."""
    x = keys.astype(np.uint64).reshape(-1, 1)
    seeds = np.array(
        [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
         0xD6E8FEB86659FD93],
        dtype=np.uint64,
    )[: _BLOOM_K]
    with np.errstate(over="ignore"):
        h = (x + seeds) * np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(29)
    return (h % np.uint64(_BLOOM_BITS)).astype(np.int64)


def q_bloom_semi_join(sf_dir: str):
    """Same answer as ``semi_join_big_spenders`` via the LARGE-key-set
    scale path: when the distinct build side is too big to broadcast
    exactly, broadcast a constant-size BLOOM FILTER instead and let the
    exact cogroup semi-join run only on the pre-filtered survivors.

    Shape: per-block key partials emit 128 KB OR-mergeable bitmaps (like
    the HLL registers — constant per block, independent of key count);
    the driver ORs them and ``ray.put``s one bitmap.  The probe side
    drops non-members batch-locally (false-positive rate ~0.2%, never
    false negatives), and only survivors ride the ONE tagged-union
    cogroup exchange with the distinct keys for exact verification —
    bloom pruning cuts shuffle volume by the non-member fraction, the
    cogroup removes the false positives, so the result is exact (same
    oracle as the broadcast path)."""
    import ray

    P = _shards_for_table(sf_dir, "orders")

    def bitmap_partial(b: pa.Table) -> pa.Table:
        keep = pc.greater(b.column("o_totalprice"), 300.0)
        keys = pc.unique(b.filter(keep).column("o_custkey"))
        k = keys.to_numpy(zero_copy_only=False).astype(np.int64)
        bits = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
        if len(k):
            pos = _bloom_positions(k).ravel()
            np.bitwise_or.at(
                bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
            )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    merged = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
    parts_df = orders.map_batches(
        bitmap_partial, batch_format="pyarrow"
    ).to_pandas()
    # empty input yields ZERO batches -> column-less frame from Ray
    for part in (parts_df["bits"] if not parts_df.empty else ()):
        merged |= np.frombuffer(part, dtype=np.uint64)
    bloom_ref = ray.put(merged)

    def _member(bits: np.ndarray, k: np.ndarray) -> np.ndarray:
        pos = _bloom_positions(k)
        hit = np.ones(len(k), dtype=bool)
        for j in range(pos.shape[1]):
            p = pos[:, j]
            hit &= (
                bits[p >> 6] >> (p & 63).astype(np.uint64)
            ).astype(np.uint64) & np.uint64(1) > 0
        return hit

    # tagged union: side 0 = bloom-surviving event rows, side 1 = keys
    def tag_events(b: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        m = _member(bits, uid)
        t = b.filter(pa.array(m))
        uid = uid[m]
        return pa.table(
            {
                "shard": pa.array(uid % P),
                "key": pa.array(uid),
                "event_type": t.column("event_type"),
                "side": pa.array(np.zeros(len(uid), dtype=np.int8)),
            }
        )

    def tag_keys(b: pa.Table) -> pa.Table:
        keep = pc.greater(b.column("o_totalprice"), 300.0)
        keys = pc.unique(b.filter(keep).column("o_custkey"))
        k = keys.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "shard": pa.array(k % P),
                "key": pa.array(k),
                "event_type": pa.nulls(len(k), pa.string()),
                "side": pa.array(np.ones(len(k), dtype=np.int8)),
            }
        )

    empty = pa.table(
        {"event_type": pa.array([], pa.string()),
         "n_events": pa.array([], pa.int64())}
    )

    def verify_in_shard(df: pd.DataFrame) -> pa.Table:
        ev = df[df["side"] == 0]
        keys = df.loc[df["side"] == 1, "key"].unique()
        hit = ev[ev["key"].isin(keys)]
        if len(hit) == 0:
            return empty
        g = (
            hit.groupby("event_type", as_index=False, dropna=False)
            .size()
            .rename(columns={"size": "n_events"})
        )
        return pa.table(
            {
                "event_type": pa.array(
                    _str_keys(g["event_type"]), pa.string()
                ),
                "n_events": pa.array(g["n_events"].to_numpy(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"]).map_batches(
        tag_events, batch_format="pyarrow"
    )
    keys = orders.map_batches(tag_keys, batch_format="pyarrow")
    return (
        ev.union(keys)
        .groupby("shard")
        .map_groups(verify_in_shard, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"))
    )


# ---------------------------------------------------------------------------
# NTILE quartiles
# ---------------------------------------------------------------------------


def q_ntile_quartiles(sf_dir: str):
    """NTILE(4) by value within each event type, aggregated to
    (event_type, quartile, n_rows, sum_value).

    ntile ranks by a TOTAL order (value, event_id tiebreak), so each
    group must be ordered end to end; with a handful of event types the
    per-group sort runs in one map_groups worker (documented
    partitioning assumption: one group's rows fit a worker — the same
    assumption the reference-style grouped sorts make).  High-cardinality
    groupings would instead ride the running_total shard machinery."""

    empty = pa.table(
        {"event_type": pa.array([], pa.string()),
         "quartile": pa.array([], pa.int64()),
         "n_rows": pa.array([], pa.int64()),
         "sum_value": pa.array([], pa.float64())}
    )

    def ntile_in_group(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return empty
        df = df.sort_values(["value", "event_id"], ignore_index=True)
        n = len(df)
        base, rem = divmod(n, 4)
        sizes = np.full(4, base, dtype=np.int64)
        sizes[:rem] += 1  # SQL ntile: first tiles get the extra row
        q = np.repeat(np.arange(1, 5, dtype=np.int64), sizes)
        g = (
            pd.DataFrame({"quartile": q, "value": df["value"].to_numpy()})
            .groupby("quartile", as_index=False)
            .agg(n_rows=("value", "size"), sum_value=("value", "sum"))
        )
        return pa.table(
            {
                "event_type": pa.array(
                    [df["event_type"].iloc[0]] * len(g), pa.string()
                ),
                "quartile": pa.array(g["quartile"].to_numpy(np.int64)),
                "n_rows": pa.array(g["n_rows"].to_numpy(np.int64)),
                "sum_value": pa.array(_rha(g["sum_value"].to_numpy(), 6)),
            }
        )

    return (
        _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
        .groupby("event_type")
        .map_groups(ntile_in_group, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Set intersection (distinct users present in BOTH event types)
# ---------------------------------------------------------------------------


def q_intersect_users(sf_dir: str):
    """INTERSECT of the distinct click / purchase user sets.  Per-batch
    distinct (user, type) partials -> one groupby(user % P) exchange ->
    per-shard "seen both types" test; only (user, flag) pairs ride the
    shuffle, never event rows."""
    P = _shards_for_table(sf_dir, "events")

    def partial(b: pa.Table) -> pa.Table:
        m = pc.is_in(
            b.column("event_type"),
            value_set=pa.array(["click", "purchase"]),
        )
        t = b.filter(m)
        df = pa.table(
            {"user_id": t.column("user_id"), "event_type": t.column("event_type")}
        ).to_pandas().drop_duplicates()
        uid = df["user_id"].to_numpy(np.int64)
        return pa.table(
            {
                "shard": pa.array(uid % P),
                "user_id": pa.array(uid),
                "is_click": pa.array(
                    (df["event_type"] == "click").to_numpy(np.bool_)
                ),
            }
        )

    empty = pa.table({"user_id": pa.array([], pa.int64())})

    def both_in_shard(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return empty
        g = df.groupby("user_id")["is_click"].agg(["min", "max"])
        both = g[(g["min"] == False) & (g["max"] == True)]  # noqa: E712
        return pa.table(
            {"user_id": pa.array(both.index.to_numpy(np.int64))}
        )

    return (
        _read(sf_dir, "events", columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(both_in_shard, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Unpivot (wide -> long melt, the inverse of pivot_event_counts)
# ---------------------------------------------------------------------------


def q_unpivot_event_counts(sf_dir: str):
    """Melt the pivot_event_counts wide table back to long
    (user_id, event_type, n_events), keeping zero cells — a stateless
    per-batch explode (np.repeat/tile), no extra shuffle beyond the
    pivot's own aggregate."""

    wide = q_pivot_event_counts(sf_dir)

    def melt(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        R = len(uid)
        T = len(_EVENT_TYPES)
        counts = np.stack(
            [
                b.column(f"n_{t}").to_numpy(zero_copy_only=False)
                for t in _EVENT_TYPES
            ],
            axis=1,
        )
        return pa.table(
            {
                "user_id": pa.array(np.repeat(uid, T)),
                "event_type": pa.array(
                    list(_EVENT_TYPES) * R, pa.string()
                ),
                "n_events": pa.array(counts.ravel().astype(np.int64)),
            }
        )

    return wide.map_batches(melt, batch_format="pyarrow")


QUERIES_EXT = {
    "anti_join_inactive_customers": q_anti_join_inactive_customers,
    "rollup_pricing": q_rollup_pricing,
    "running_total": q_running_total,
    "event_gaps": q_event_gaps,
    "range_join_size_buckets": q_range_join_size_buckets,
    "substring_filter": q_substring_filter,
    "stratified_sample": q_stratified_sample,
    "json_extract_stats": q_json_extract_stats,
    "pivot_event_counts": q_pivot_event_counts,
    "group_percentiles": q_group_percentiles,
    "order_lineitem_band_join": q_order_lineitem_band_join,
    "asof_event_order": q_asof_event_order,
    "semi_join_big_spenders": q_semi_join_big_spenders,
    "group_topk_docs": q_group_topk_docs,
    "hash_split": q_hash_split,
    "rolling_7d_value": q_rolling_7d_value,
    "percentiles_chars": q_percentiles_chars,
    "bloom_semi_join": q_bloom_semi_join,
    "full_outer_user_days": q_full_outer_user_days,
    "corr_qty_price": q_corr_qty_price,
    "global_rank_docs": q_global_rank_docs,
    "ntile_quartiles": q_ntile_quartiles,
    "intersect_users": q_intersect_users,
    "unpivot_event_counts": q_unpivot_event_counts,
    "left_join_customer_orders": q_left_join_customer_orders,
    "value_stats": q_value_stats,
    "star_join_region_stats": q_star_join_region_stats,
}


_PIVOT_COLS = ",\n               ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_{t}"
    for t in _EVENT_TYPES
)

_BUCKET_CASE = (
    "CASE "
    + " ".join(
        f"WHEN n_chars >= {lo} AND n_chars < {hi} THEN {lo}"
        for lo, hi in zip(_SIZE_BUCKETS[:-1], _SIZE_BUCKETS[1:])
    )
    + f" ELSE {_SIZE_BUCKETS[-1]} END"
)

ORACLE_EXT = {
    "running_total": """
        SELECT event_id, user_id,
               epoch_us(ts) AS ts_us,
               ROUND(SUM(value) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING), 6) AS cum_value
        FROM events
    """,
    "rollup_pricing": """
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               ROUND(SUM(l_extendedprice), 2) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "anti_join_inactive_customers": """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        GROUP BY c_mktsegment
    """,
    "event_gaps": """
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events)
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
        FROM g GROUP BY user_id HAVING COUNT(*) >= 2
    """,
    "range_join_size_buckets": f"""
        SELECT {_BUCKET_CASE} AS bucket_lo,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1
    """,
    "substring_filter": """
        SELECT lang, COUNT(*) AS n_docs
        FROM documents WHERE contains(text, 'data')
        GROUP BY lang
    """,
    "json_extract_stats": """
        SELECT event_type,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    """,
    "pivot_event_counts": f"""
        SELECT user_id,
               {_PIVOT_COLS}
        FROM events GROUP BY user_id
    """,
    "group_percentiles": """
        SELECT lang,
               quantile_disc(n_chars, 0.50) AS p50,
               quantile_disc(n_chars, 0.90) AS p90
        FROM documents GROUP BY lang
    """,
    "stratified_sample": """
        SELECT lang, doc_id, rk FROM (
          SELECT lang, doc_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)),
                            doc_id) AS rk
          FROM documents) WHERE rk <= 5
    """,
    "order_lineitem_band_join": """
        SELECT o_orderkey,
               COUNT(*) AS n_items,
               ROUND(SUM(l_extendedprice), 2) AS sum_price
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        GROUP BY o_orderkey
    """,
    "asof_event_order": """
        WITH o AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
          FROM orders GROUP BY o_custkey, o_orderdate)
        SELECT e.event_id, e.user_id, o.o_orderkey
        FROM events e
        ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    "semi_join_big_spenders": """
        SELECT event_type, COUNT(*) AS n_events
        FROM events
        WHERE user_id IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300)
        GROUP BY event_type
    """,
    # exact by construction (bloom prunes, the cogroup verifies) — the
    # oracle is the same semi-join
    "bloom_semi_join": """
        SELECT event_type, COUNT(*) AS n_events
        FROM events
        WHERE user_id IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300)
        GROUP BY event_type
    """,
    "ntile_quartiles": """
        SELECT event_type, quartile, COUNT(*) AS n_rows,
               ROUND(SUM(value), 6) AS sum_value
        FROM (
          SELECT event_type, value,
                 NTILE(4) OVER (
                   PARTITION BY event_type ORDER BY value, event_id
                 ) AS quartile
          FROM events)
        GROUP BY event_type, quartile
    """,
    "intersect_users": """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "left_join_customer_orders": """
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(COUNT(o.o_custkey) AS BIGINT) AS n_orders,
               ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS sum_spent
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        GROUP BY c.c_custkey, c.c_mktsegment
    """,
    "star_join_region_stats": """
        SELECT r.r_name,
               COUNT(*) AS n_customers,
               ROUND(AVG(c.c_acctbal), 6) AS avg_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "full_outer_user_days": """
        WITH c AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                 COUNT(*) AS n_clicks
          FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        p AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                 COUNT(*) AS n_purchases
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT COALESCE(c.user_id, p.user_id) AS user_id,
               COALESCE(c.day, p.day) AS day,
               COALESCE(c.n_clicks, 0) AS n_clicks,
               COALESCE(p.n_purchases, 0) AS n_purchases
        FROM c FULL OUTER JOIN p
          ON c.user_id = p.user_id AND c.day = p.day
    """,
    "corr_qty_price": """
        SELECT l_returnflag, COUNT(*) AS n,
               ROUND(CORR(l_quantity, l_extendedprice), 6)
                 AS corr_qty_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "global_rank_docs": """
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    """,
    "value_stats": """
        SELECT event_type, COUNT(*) AS n,
               ROUND(AVG(value), 6) AS mean_value,
               ROUND(STDDEV_SAMP(value), 6) AS stddev_value,
               ROUND(VAR_SAMP(value), 6) AS var_value
        FROM events GROUP BY event_type
    """,
    "unpivot_event_counts": """
        WITH u AS (SELECT DISTINCT user_id FROM events),
        c AS (SELECT user_id, event_type, COUNT(*) AS n
              FROM events GROUP BY 1, 2),
        t AS (SELECT unnest(
                ['click', 'error', 'purchase', 'signup', 'view']
              ) AS event_type)
        SELECT u.user_id, t.event_type, COALESCE(c.n, 0) AS n_events
        FROM u CROSS JOIN t
        LEFT JOIN c ON c.user_id = u.user_id
                   AND c.event_type = t.event_type
    """,
    "group_topk_docs": """
        SELECT lang, doc_id, n_chars, rk FROM (
          SELECT lang, doc_id, n_chars,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rk
          FROM documents) WHERE rk <= 3
    """,
    "hash_split": """
        WITH s AS (
          SELECT n_chars,
                 md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 AS b
          FROM documents)
        SELECT CASE WHEN b < 8 THEN 'train'
                    WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM s GROUP BY 1
    """,
    "rolling_7d_value": """
        WITH d AS (
          SELECT event_type, date_trunc('day', ts) AS day,
                 ROUND(SUM(value), 6) AS v
          FROM events GROUP BY 1, 2)
        SELECT event_type, day,
               ROUND(SUM(v) OVER (
                 PARTITION BY event_type ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 4)
               AS v7
        FROM d
    """,
    "percentiles_chars": """
        SELECT quantile_disc(n_chars, 0.50) AS p50,
               quantile_disc(n_chars, 0.90) AS p90,
               quantile_disc(n_chars, 0.99) AS p99
        FROM documents
    """,
}
