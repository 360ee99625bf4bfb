"""Mergeable cardinality sketches (HyperLogLog).

Reference scope analogue: the reference engine's accuracy machinery is
exact-count only; at 100 TB a distinct-count over a high-cardinality key
(unique URLs, unique n-grams, unique users) cannot afford the exact
shuffle that `distinct_users_per_event` pays, so the engine needs a
mergeable sketch: per-batch register partials (2^p bytes each, constant
regardless of input size) that max-merge associatively — the canonical
pre-aggregate-inside-map_batches shape where ONLY sketches ride the
shuffle.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm" (AofA 2007), with the standard small-range
(linear-counting) correction.  Hash = FNV-1a 64 (deterministic across
workers/runs; no seed state).  Relative error ~= 1.04/sqrt(2^p): p=12 ->
~1.6% on 4 KB of state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants, Steele et al.).

    FNV-1a's HIGH bits avalanche poorly on short similar keys ("user-0"
    .. "user-99" set only ~4 of 4096 registers), so the register index /
    rho extraction needs a real mixer on top.  Deterministic, seed-free.
    """
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Dense max-register array (uint8[2^p]) for a batch of uint64 hashes."""
    m = 1 << p
    hashes = _mix64(hashes)
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rho = leading-zero count of the remaining bits + 1 (capped)
    rho = np.full(len(hashes), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        r = rest[nz]
        lz = np.zeros(r.shape, dtype=np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            r[mask] = r[mask] << np.uint64(shift)
        rho[nz] = lz + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def approx_distinct_by_group(
    ds,
    group_column: str,
    value_column: str,
    p: int = 12,
    num_shards: int = 16,
):
    """Per-group approximate distinct count -> pandas DataFrame
    (group_column, n_approx int64), sorted by group.

    Shape: per-batch dense registers per group, emitted SPARSE (only
    non-zero registers, pre-maxed within the batch) -> one
    groupby(register-shard) exchange, pandas-C max-merge per shard ->
    <= groups x 2^p tiny rows to the driver for the final estimate.
    The estimate itself is deterministic: max is order-free.
    """
    from tiny_lingua_ray.models.train import fnv1a_64_batch

    P = num_shards

    def partial(b: pa.Table) -> pa.Table:
        # arrow out: crosses the register-shard shuffle (tableutil.from_df
        # rationale — pandas blocks reattach unhashable metadata there)
        df = pd.DataFrame(
            {
                "g": b.column(group_column).to_pandas(),
                "v": b.column(value_column).to_pandas().astype(str),
            }
        )
        g_col, idx_col, reg_col = [], [], []
        for g, sub in df.groupby("g", sort=False):
            h = fnv1a_64_batch(sub["v"].tolist())
            regs = _registers(h, p)
            nz = np.nonzero(regs)[0]
            g_col.extend([g] * len(nz))
            idx_col.append(nz.astype(np.int64))
            reg_col.append(regs[nz].astype(np.int64))
        gtype = b.schema.field(group_column).type
        if not g_col:
            return pa.table(
                {
                    "g": pa.array([], gtype),
                    "idx": pa.array([], pa.int64()),
                    "reg": pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int64()),
                }
            )
        idx = np.concatenate(idx_col)
        return pa.table(
            {
                "g": pa.array(g_col, gtype),
                "idx": pa.array(idx),
                "reg": pa.array(np.concatenate(reg_col)),
                "shard": pa.array(idx % P),
            }
        )

    def max_in_shard(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["g", "idx"], as_index=False)["reg"].max()

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("shard")
        .map_groups(max_in_shard, batch_format="pandas")
        .to_pandas()  # <= groups x 2^p rows, pre-reduced
    )
    if merged.empty:  # empty input: column-less frame from Ray
        merged = pd.DataFrame({"g": [], "idx": [], "reg": []})
    rows = []
    for g, sub in merged.groupby("g"):
        regs = np.zeros(1 << p, dtype=np.uint8)
        regs[sub["idx"].to_numpy()] = sub["reg"].to_numpy().astype(np.uint8)
        rows.append((g, int(round(hll_estimate(regs)))))
    return pd.DataFrame(rows, columns=[group_column, "n_approx"]).sort_values(
        group_column, ignore_index=True
    )


# ---------------------------------------------------------------------------
# Count-Min heavy hitters (approximate top-k words)
# ---------------------------------------------------------------------------

# fixed depth seeds (splitmix64 of 1..4) — deterministic, no runtime state
_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
     0x94D049BB133111EB, 0x2545F4914F6CDD1D],
    dtype=np.uint64,
)


def _cms_cell(base: np.ndarray, d: int, width: int) -> np.ndarray:
    """Row-d cell index for a batch of base word hashes (uint64 in)."""
    return (_mix64(base ^ _CMS_SEEDS[d]) % np.uint64(width)).astype(np.int64)


def approx_heavy_hitters(
    ds,
    text_column: str = "text",
    k: int = 20,
    depth: int = 4,
    width: int = 16384,
    cand_per_block: int = 64,
    num_shards: int = 16,
):
    """Approximate corpus-wide top-k words: Count-Min sketch + local
    candidates — the constant-state alternative to ``word_freq_top20``'s
    exact word shuffle.

    Per block: exact local counts, then (a) sparse CMS increments —
    <= depth x min(distinct, width) (cell, count) rows — and (b) the
    local top ``cand_per_block`` words as candidate rows.  ONE
    groupby(shard) merges both: CMS cells sum cellwise (order-free, so
    the merged sketch is deterministic) and candidates dedup.  The
    driver then holds only the dense sketch (depth x width int64,
    ~512 KB) plus <= blocks x cand_per_block candidate words, estimates
    each candidate with the CMS min-over-rows, and keeps the top k by
    (est, word).

    Guarantees: est >= true count (CMS never undercounts), and
    est - true <= 2N/width with prob >= 1 - 2^-depth per word (Cormode &
    Muthukrishnan, J.Alg 2005).  A true global heavy hitter is a local
    heavy hitter in at least one block (count >= N/blocks pigeonhole),
    so the candidate union contains every word with global share >
    blocks x cand-th local share; ``cand_per_block`` trades that recall
    bound against driver memory — both caps logged, never silent.

    Tokenization matches word_freq_top20 (lower + single-space split)
    so the two are directly comparable."""
    import logging

    from tiny_lingua_ray.models.train import fnv1a_64

    P = num_shards
    D, W = depth, width

    empty_partial = pa.table(
        {"shard": pa.array([], pa.int64()),
         "kind": pa.array([], pa.int8()),
         "cell": pa.array([], pa.int64()),
         "count": pa.array([], pa.int64()),
         "word": pa.array([], pa.string())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column(text_column).to_pylist():
            c.update((t or "").lower().split(" "))
        c.pop("", None)
        if not c:
            return empty_partial
        words = list(c.keys())
        cnt = np.fromiter(c.values(), dtype=np.int64, count=len(words))
        base = np.fromiter(
            (fnv1a_64(w) for w in words), dtype=np.uint64, count=len(words)
        )
        # (a) sparse CMS increments, pre-summed per cell with bincount
        cells_parts, count_parts = [], []
        for d in range(D):
            dense = np.bincount(
                _cms_cell(base, d, W), weights=cnt, minlength=W
            ).astype(np.int64)
            nz = np.flatnonzero(dense)
            cells_parts.append(d * W + nz)
            count_parts.append(dense[nz])
        cells = np.concatenate(cells_parts)
        ccnt = np.concatenate(count_parts)
        # (b) local top candidates (deterministic (count desc, word) order)
        order = sorted(range(len(words)), key=lambda i: (-cnt[i], words[i]))
        top = order[:cand_per_block]
        n_cand = len(top)
        return pa.table(
            {
                "shard": pa.array(
                    np.concatenate(
                        [cells % P,
                         np.fromiter(
                             (P + fnv1a_64(words[i]) % P for i in top),
                             dtype=np.int64, count=n_cand,
                         )]
                    )
                ),
                "kind": pa.array(
                    np.repeat(np.array([0, 1], dtype=np.int8),
                              [len(cells), n_cand])
                ),
                "cell": pa.array(
                    np.concatenate([cells, np.zeros(n_cand, dtype=np.int64)])
                ),
                "count": pa.array(
                    np.concatenate([ccnt, cnt[top]])
                ),
                "word": pa.array(
                    [None] * len(cells) + [words[i] for i in top],
                    pa.string(),
                ),
            }
        )

    empty_merged = pd.DataFrame(
        {"kind": pd.Series(dtype="int8"),
         "cell": pd.Series(dtype="int64"),
         "count": pd.Series(dtype="int64"),
         "word": pd.Series(dtype="object")}
    )

    def merge_shard(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty_merged
        if int(df["kind"].iloc[0]) == 0:  # CMS cells: cellwise sum
            g = df.groupby("cell", as_index=False)["count"].sum()
            g["kind"] = np.int8(0)
            g["word"] = None
            return g[["kind", "cell", "count", "word"]]
        u = df.drop_duplicates("word")  # candidates: dedup
        return pd.DataFrame(
            {"kind": np.int8(1), "cell": np.int64(0), "count": np.int64(0),
             "word": u["word"].to_numpy()}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(merge_shard, batch_format="pandas")
        .to_pandas()  # <= depth*width cells + blocks*cand_per_block words
    )
    if merged.empty:  # empty input: column-less frame from Ray
        merged = pd.DataFrame(
            {"kind": [], "cell": [], "count": [], "word": []}
        ).astype({"kind": np.int8, "cell": np.int64, "count": np.int64})
    cms = np.zeros(D * W, dtype=np.int64)
    cms_rows = merged[merged["kind"] == 0]
    cms[cms_rows["cell"].to_numpy()] = cms_rows["count"].to_numpy()
    cand = merged.loc[merged["kind"] == 1, "word"].tolist()
    logging.getLogger(__name__).info(
        "cms-heavy-hitters: %d candidate words, %d nonzero cells",
        len(cand), len(cms_rows),
    )
    base = np.fromiter(
        (fnv1a_64(w) for w in cand), dtype=np.uint64, count=len(cand)
    )
    est = np.min(
        np.stack([cms[d * W + _cms_cell(base, d, W)] for d in range(D)]),
        axis=0,
    )
    order = sorted(range(len(cand)), key=lambda i: (-est[i], cand[i]))[:k]
    return pd.DataFrame(
        {"word": [cand[i] for i in order],
         "est_count": est[order].astype(np.int64)}
    )
