"""Similarity search over an embedding column (list<float>).

* ``knn_brute_force`` — baseline: per-batch numpy matmul against a
  broadcast query matrix (``ray.put`` once, read per actor), then a global
  top-k merge of tiny per-batch partials.  No shuffle of the corpus.
* ``knn_lsh`` — scale path: random-hyperplane LSH bucketing; queries only
  compare against corpus rows sharing a bucket (groupby on bucket id).
* embedding-cosine near-dup: pairs with cosine >= threshold via the same
  LSH bucketing.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

_HP_SEED = 7


def _as_matrix(col) -> np.ndarray:
    """list<float> column -> [R, D] float64 matrix."""
    arr = col.to_pylist()
    return np.asarray(arr, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """map_batches fn: per-batch top-k partials vs broadcast queries.

    Emits (query_id, neighbor_id, cosine) rows — k per query per batch;
    the driver/groupby reduces them to a global top-k (tiny data).
    """

    def __init__(self, queries_ref=None, queries=None, k: int = 5,
                 id_column: str = "vec_id", vec_column: str = "embedding"):
        if queries_ref is not None:
            import ray

            queries = ray.get(queries_ref)
        self.qids = np.asarray(queries["ids"])
        self.Q = _normalize(np.asarray(queries["vectors"], dtype=np.float64))
        self.k = k
        self.id_column = id_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_column).to_pylist())
        M = _normalize(_as_matrix(batch.column(self.vec_column)))
        sims = self.Q @ M.T  # [q, rows]
        qcol, ncol, scol = [], [], []
        for qi in range(len(self.qids)):
            row = sims[qi]
            mask = ids != self.qids[qi]  # exclude self
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            take = min(self.k, len(cand))
            top = cand[np.argpartition(-row[cand], take - 1)[:take]]
            for j in top:
                qcol.append(int(self.qids[qi]))
                ncol.append(int(ids[j]))
                scol.append(float(row[j]))
        return pa.table(
            {
                "query_id": pa.array(qcol, pa.int64()),
                "neighbor_id": pa.array(ncol, pa.int64()),
                "cosine": pa.array(scol, pa.float64()),
            }
        )


def knn_brute_force(ds, query_ids, k: int = 5, id_column: str = "vec_id",
                    vec_column: str = "embedding"):
    """Global top-k cosine neighbors for each query id; returns a
    (query_id, neighbor_id, cosine, rank) pandas DataFrame (small)."""
    import pandas as pd

    # fetch the query vectors (tiny: filter pushdown on the id column)
    qset = set(int(q) for q in query_ids)

    def pick(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_column).to_pylist())
        mask = np.isin(ids, list(qset))
        return batch.filter(pa.array(mask))

    qtab = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    queries = {
        "ids": qtab[id_column].to_numpy(),
        "vectors": np.asarray(qtab[vec_column].tolist(), dtype=np.float64),
    }

    try:
        import ray

        qref = ray.put(queries) if ray.is_initialized() else None
    except ImportError:
        qref = None

    kwargs = (
        {"queries_ref": qref} if qref is not None else {"queries": queries}
    )
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={
            **kwargs,
            "k": k,
            "id_column": id_column,
            "vec_column": vec_column,
        },
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()

    # global reduce: top-k per query (partials are k * n_batches rows)
    out = []
    for qid, g in partials.groupby("query_id"):
        top = heapq.nlargest(k, g.itertuples(index=False),
                             key=lambda r: (r.cosine, -r.neighbor_id))
        for rank, r in enumerate(top, 1):
            out.append((qid, r.neighbor_id, r.cosine, rank))
    return pd.DataFrame(
        out, columns=["query_id", "neighbor_id", "cosine", "rank"]
    ).sort_values(["query_id", "rank"], ignore_index=True)


def hyperplane_codes(M: np.ndarray, n_planes: int = 16, dim: int | None = None,
                     seed: int = _HP_SEED) -> np.ndarray:
    """Random-hyperplane LSH bucket code per row (uint64)."""
    rng = np.random.RandomState(seed)
    H = rng.standard_normal((M.shape[1] if dim is None else dim, n_planes))
    bits = (M @ H) > 0
    weights = (1 << np.arange(n_planes, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)


def add_lsh_bucket(batch: pa.Table, n_planes: int = 16,
                   vec_column: str = "embedding") -> pa.Table:
    M = _as_matrix(batch.column(vec_column))
    codes = hyperplane_codes(_normalize(M), n_planes)
    return batch.append_column("lsh_bucket", pa.array(codes.astype(np.int64)))


def cosine_near_dup_pairs(ds, threshold: float = 0.95, n_planes: int = 8,
                          id_column: str = "vec_id",
                          vec_column: str = "embedding"):
    """(id_a, id_b, cosine) pairs with cosine >= threshold, found within
    LSH buckets (near-identical vectors share all hyperplane signs with
    high probability)."""
    import pandas as pd

    with_bucket = ds.map_batches(
        add_lsh_bucket,
        fn_kwargs={"n_planes": n_planes, "vec_column": vec_column},
        batch_format="pyarrow",
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_column].to_numpy()
        M = _normalize(np.asarray(g[vec_column].tolist(), dtype=np.float64))
        sims = M @ M.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        return pd.DataFrame(
            {"id_a": a, "id_b": b, "cosine": sims[ii, jj]}
        )

    return with_bucket.groupby("lsh_bucket").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
