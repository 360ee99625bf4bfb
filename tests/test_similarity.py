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
    # sample_size=4096 >= corpus, so the fit sample is the whole corpus
    want_a, want_s = _reference_assign(vecs, 8, vecs)
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
