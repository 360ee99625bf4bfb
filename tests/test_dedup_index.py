"""Incremental exact dedup against the persistent hash index
(state/dedup_index.py): cross-run semantics that no single-run SQL
oracle can express."""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def _run(state_dir):
    import ray.data as rd

    from tiny_lingua_ray.state.dedup_index import incremental_exact_dedup

    ds = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    return (
        incremental_exact_dedup(ds, str(state_dir))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def test_incremental_dedup_across_runs(ray_session, tmp_path):
    state = tmp_path / "dedup_state"

    # run 1 on an empty index: new == keep-first within the run,
    # i.e. exactly one True per distinct content hash
    r1 = _run(state)
    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    assert len(r1) == n_docs
    n_distinct = r1["content_hash"].nunique()
    assert int(r1["is_new"].sum()) == n_distinct
    # the True per hash is the SMALLEST doc_id (keep-first)
    firsts = r1[r1["is_new"]].groupby("content_hash")["doc_id"].min()
    mins = r1.groupby("content_hash")["doc_id"].min()
    assert firsts.sort_index().equals(mins.sort_index())

    # run 2 on the same corpus: the index knows every hash -> zero new
    r2 = _run(state)
    assert len(r2) == n_docs
    assert int(r2["is_new"].sum()) == 0

    # run 3 with a fresh doc alongside repeats: only the fresh one is new
    import pandas as pd
    import ray.data as rd

    from tiny_lingua_ray.state.dedup_index import incremental_exact_dedup

    first_text = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["text"]
    ).column("text")[0].as_py()
    batch = pd.DataFrame(
        {
            "doc_id": [900000, 900001],
            # second row duplicates doc 0's text from run 1
            "text": ["a genuinely never seen document zzz", first_text],
        }
    )
    r3 = (
        incremental_exact_dedup(rd.from_pandas(batch), str(state))
        .to_pandas()
        .set_index("doc_id")
    )
    assert bool(r3.loc[900000, "is_new"]) is True
    assert bool(r3.loc[900001, "is_new"]) is False
