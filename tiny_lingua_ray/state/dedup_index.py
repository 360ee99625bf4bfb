"""Incremental exact dedup against a persistent hash index.

The daily-ingest primitive: crawl batch N must dedup not only within
itself but against everything ingested in runs 1..N-1.  Holding the
seen-set in one process is impossible at 10^12 docs, and re-shuffling
the historical corpus per run is absurd — so the state is a
HASH-PARTITIONED ON-DISK INDEX (one directory per ``hash % P`` shard of
16-byte rows), and each run does ONE cogroup of the new batch's hashes
against only the matching shards:

  1. new docs -> (shard, content_hash, doc_id) partials (fnv1a-64 over
     text — the same hash-equals-text assumption as stages/dedup
     exact_dedup / J3);
  2. tagged-union cogroup with the persisted shard rows on ``shard``;
     per shard, a doc is a duplicate if its hash is in the index OR a
     smaller doc_id in THIS run shares it (keep-first within the run);
  3. each shard APPENDS its newly-seen hashes to its own index
     directory (atomic tmp+rename per file, one file per shard per run
     — the same append-only resumable layout as the flagship sink's
     manifests).  A crashed run leaves at worst already-written shard
     files; re-running marks those docs as dups instead of new, which
     is idempotent for every downstream consumer that filters on
     ``is_new``.

State grows 8 bytes/unique doc spread over P directories; at 10^12 docs
that is ~8 TB of index across the cluster — per-shard files stay
individually small and each run touches only its own P files.  No SQL
oracle (the semantics span RUNS); invariants are pinned in
tests/test_dedup_index.py.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def incremental_exact_dedup(
    ds,
    state_dir: str,
    text_column: str = "text",
    id_column: str = "doc_id",
    num_shards: int = 16,
):
    """(doc_id, content_hash, is_new) for every input row; appends the
    newly-seen hashes to ``state_dir`` so the next call dedups against
    them.  ``is_new`` is False for any row whose text hash was seen in a
    previous run OR earlier (smaller doc_id) in this run."""
    import ray.data as rd

    from tiny_lingua_ray.models.train import fnv1a_64_batch

    P = num_shards
    root = Path(state_dir)
    run_id = uuid.uuid4().hex[:12]

    def hash_partial(b: pa.Table) -> pa.Table:
        texts = b.column(text_column).to_pylist()
        h = fnv1a_64_batch([t or "" for t in texts]).astype(np.int64)
        ids = b.column(id_column).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "shard": pa.array(h % P),
                "key": pa.array(h),
                "doc_id": pa.array(ids),
                "side": pa.array(np.zeros(len(h), dtype=np.int8)),
            }
        )

    new_rows = ds.map_batches(hash_partial, batch_format="pyarrow")

    shard_files = sorted(str(p) for p in root.glob("shard=*/*.parquet"))
    if shard_files:
        def tag_seen(b: pa.Table) -> pa.Table:
            k = b.column("key")
            n = len(k)
            return pa.table(
                {
                    "shard": pa.array(
                        k.to_numpy(zero_copy_only=False) % P
                    ),
                    "key": k,
                    "doc_id": pa.array(np.zeros(n, dtype=np.int64)),
                    "side": pa.array(np.ones(n, dtype=np.int8)),
                }
            )

        seen = rd.read_parquet(shard_files, columns=["key"]).map_batches(
            tag_seen, batch_format="pyarrow"
        )
        union = new_rows.union(seen)
    else:
        union = new_rows

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "content_hash": pa.array([], pa.int64()),
         "is_new": pa.array([], pa.bool_())}
    )

    def dedup_in_shard(df: pd.DataFrame) -> pa.Table:
        new = df[df["side"] == 0]
        if len(new) == 0:
            return empty
        shard = int(new["shard"].iloc[0])
        seen_keys = df.loc[df["side"] == 1, "key"].unique()
        new = new.sort_values("doc_id", ignore_index=True)
        first_in_run = ~new["key"].duplicated(keep="first")
        unseen = ~new["key"].isin(seen_keys)
        is_new = (first_in_run & unseen).to_numpy()

        fresh = np.unique(new.loc[is_new, "key"].to_numpy(np.int64))
        if len(fresh):
            out_dir = root / f"shard={shard}"
            out_dir.mkdir(parents=True, exist_ok=True)
            tmp = out_dir / f".tmp-{run_id}.parquet"
            pq.write_table(pa.table({"key": pa.array(fresh)}), tmp)
            os.replace(tmp, out_dir / f"run-{run_id}.parquet")

        return pa.table(
            {
                "doc_id": pa.array(new["doc_id"].to_numpy(np.int64)),
                "content_hash": pa.array(new["key"].to_numpy(np.int64)),
                "is_new": pa.array(is_new),
            }
        )

    return (
        union.groupby("shard")
        .map_groups(dedup_in_shard, batch_format="pandas")
    )
