"""K-means corpus clustering (stages/similarity.kmeans_assign).

No SQL oracle by design (iterative model fit); the gate is exact parity
with a driver-side pure-numpy reference over the same bounded sample,
plus structural properties.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _reference_assign(vecs: np.ndarray, n_clusters: int, sample: np.ndarray):
    from tiny_lingua_ray.stages.similarity import _normalize, _spherical_kmeans

    C = _spherical_kmeans(sample, n_clusters)
    M = _normalize(vecs)
    sims = M @ C.T
    a = sims.argmax(axis=1)
    return a, sims[np.arange(len(a)), a]


def test_kmeans_assign_matches_driver_reference(ray_session):
    import ray.data as rd

    from tiny_lingua_ray.stages.similarity import kmeans_assign

    tab = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    got = (
        kmeans_assign(
            rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                            columns=["vec_id", "embedding"]),
            n_clusters=8, sample_size=4096,
        )
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    vecs = np.asarray(tab.column("embedding").to_pylist(), dtype=np.float64)
    # sample_size=4096 >= corpus, so the fit sample is the whole corpus —
    # in the library's canonical (hash, id) order (the _hash_sample
    # contract: rerun-identical regardless of block arrival order)
    from tiny_lingua_ray.stages.similarity import _mix64

    ids = tab.column("vec_id").to_numpy().astype(np.int64)
    fit_order = np.lexsort((ids, _mix64(ids)))
    want_a, want_s = _reference_assign(vecs, 8, vecs[fit_order])
    order = np.argsort(tab.column("vec_id").to_numpy())
    assert (got["cluster"].to_numpy() == want_a[order]).all()
    assert np.allclose(got["cosine_to_centroid"].to_numpy(), want_s[order])


def test_kmeans_assign_properties(ray_session):
    import ray.data as rd

    from tiny_lingua_ray.stages.similarity import kmeans_assign

    n = pq.read_metadata(f"{SF_DIR}/embeddings.parquet").num_rows
    got = kmeans_assign(
        rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"]),
        n_clusters=4, sample_size=256,
    ).to_pandas()
    assert len(got) == n  # every row assigned exactly once
    assert got["cluster"].between(0, 3).all()
    assert got["cosine_to_centroid"].between(-1.0, 1.0 + 1e-9).all()
    # determinism: a second run is identical
    again = kmeans_assign(
        rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"]),
        n_clusters=4, sample_size=256,
    ).to_pandas()
    a = got.sort_values("vec_id", ignore_index=True)
    b = again.sort_values("vec_id", ignore_index=True)
    assert a.equals(b)


def test_knn_pq_recall_and_exact_cosines(ray_session):
    """PQ guarantees: returned cosines are EXACT (re-ranked with true
    vectors — every (query, neighbor) pair's cosine must equal the
    brute-force value), recall@5 vs exact brute force stays high at
    these parameters, and reruns are bit-identical (deterministic
    codebooks)."""
    import ray.data as rd

    from tiny_lingua_ray.stages.similarity import knn_brute_force, knn_pq

    def read():
        return rd.read_parquet(
            f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
        )

    qids = [0, 1, 2, 3, 4]
    exact = knn_brute_force(read(), query_ids=qids, k=5)
    approx = knn_pq(read(), query_ids=qids, k=5)
    assert len(approx) == len(exact)

    e = {(r.query_id, r.neighbor_id): r.cosine
         for r in exact.itertuples(index=False)}
    hits = 0
    for r in approx.itertuples(index=False):
        key = (r.query_id, r.neighbor_id)
        if key in e:
            hits += 1
            assert abs(r.cosine - e[key]) < 1e-9, key  # exact re-rank
    recall = hits / len(exact)
    assert recall >= 0.8, recall

    again = knn_pq(read(), query_ids=qids, k=5)
    assert approx.equals(again)


def test_semantic_dedup_prune_rule_and_determinism(ray_session):
    """Every dropped vector must have a strictly-earlier same-cluster
    neighbor with cosine >= tau; every kept vector must have none —
    verified by a full driver recompute over the returned cluster
    assignment.  Result is rerun-identical."""
    import pandas as pd
    import ray.data as rd

    from tiny_lingua_ray.stages.similarity import _normalize, semantic_dedup

    TAU = 0.95

    base = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    # plant near-identical twins (tiny deterministic perturbation) —
    # the corpus itself has no cosine >= 0.95 pairs
    rng = np.random.RandomState(3)
    twins = base.head(20).copy()
    twins["vec_id"] = twins["vec_id"].to_numpy() + 100_000
    twins["embedding"] = [
        (np.asarray(v) + rng.normal(0, 1e-3, len(v))).tolist()
        for v in twins["embedding"]
    ]
    emb = pd.concat([base, twins], ignore_index=True)

    def read():
        return rd.from_pandas(emb)

    out = semantic_dedup(read(), n_clusters=8, tau=TAU).to_pandas()
    assert len(out) == len(emb)
    dropped_ids = set(out.loc[~out["kept"], "vec_id"])
    assert set(twins["vec_id"]) <= dropped_ids  # every twin pruned

    vecs = {
        int(i): v
        for i, v in zip(
            emb["vec_id"], _normalize(np.asarray(emb["embedding"].tolist()))
        )
    }
    for _, grp in out.groupby("cluster"):
        g = grp.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        V = np.stack([vecs[int(i)] for i in ids])
        S = V @ V.T
        for r in range(len(ids)):
            has_earlier_dup = bool(r > 0 and S[r, :r].max() >= TAU)
            assert has_earlier_dup == (not bool(g["kept"].iloc[r])), ids[r]

    again = semantic_dedup(read(), n_clusters=8, tau=TAU).to_pandas()
    key = ["vec_id"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_semantic_dedup_auto_clusters_bound_groups(ray_session):
    """auto_clusters derives n_clusters from the corpus size so no
    single Ray group (cluster) materializes more than ~max_cluster rows
    even on a skewed corpus — the 100-TB guard: a fixed default of 8
    would land 70% of this corpus in one pandas group."""
    import pandas as pd
    import ray.data as rd

    from tiny_lingua_ray.stages.similarity import semantic_dedup

    rng = np.random.RandomState(17)
    D, N = 16, 2000
    hot = rng.normal(0, 1, D)
    # 70% of rows in one loose blob (splittable by k-means), 30% spread
    n_hot = int(N * 0.7)
    V = np.concatenate(
        [
            hot[None, :] + rng.normal(0, 0.4, (n_hot, D)),
            rng.normal(0, 1, (N - n_hot, D)),
        ]
    )
    emb = pd.DataFrame(
        {"vec_id": np.arange(N, dtype=np.int64), "embedding": list(V)}
    )

    MAX_CLUSTER = 100
    out = semantic_dedup(
        rd.from_pandas(emb), n_clusters=8, tau=0.99, max_cluster=MAX_CLUSTER
    ).to_pandas()
    assert len(out) == N
    sizes = out.groupby("cluster").size()
    # derived k = ceil(N / (MAX_CLUSTER // 4)) = 80 -> expected 25/cluster
    assert len(sizes) >= N // MAX_CLUSTER
    assert sizes.max() <= MAX_CLUSTER, sizes.max()
