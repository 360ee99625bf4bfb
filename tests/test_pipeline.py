"""End-to-end pipeline tests (Ray session from conftest)."""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow.dataset as pds
import pytest


@pytest.fixture(scope="module")
def cc_dir(tmp_path_factory):
    from tiny_lingua_ray.sources.cc_pages import build_cc_pages

    d = tmp_path_factory.mktemp("cc")
    return build_cc_pages(d, total_rows=600, rows_per_shard=300, use_ray=False)


def test_quality_filter_end_to_end(ray_session, models_dir, cc_dir, tmp_path):
    from tiny_lingua_ray.pipelines.quality_filter import (
        QualityFilterConfig,
        run_quality_filter,
    )

    out = tmp_path / "qf"
    cfg = QualityFilterConfig(
        num_partitions=8, langid_concurrency=2, batch_size=256
    )
    summary = run_quality_filter(cc_dir, out, cfg)
    assert summary["rows"] == 600
    assert 0 < summary["kept"] < 600

    # manifests: every partition, rows sum to total
    manifests = sorted((out / "manifest").glob("part-*.json"))
    assert len(manifests) == 8
    total = sum(json.loads(m.read_text())["metrics"]["rows"] for m in manifests)
    assert total == 600

    # output schema contains the decision + scrubbed text
    t = pds.dataset(str(out / "data"), partitioning="hive").to_table()
    assert {"url", "pred_lang", "perplexity", "keep", "drop_reason",
            "text_scrubbed"} <= set(t.column_names)
    assert t.num_rows == 600

    # resume: identical re-run skips every partition
    summary2 = run_quality_filter(cc_dir, out, cfg)
    assert summary2["skipped_partitions"] == 8


def test_resume_after_partial_failure(ray_session, models_dir, cc_dir, tmp_path):
    """Deleting one manifest (simulated crash) reprocesses only that
    partition and reproduces identical data."""
    from tiny_lingua_ray.pipelines.quality_filter import (
        QualityFilterConfig,
        run_quality_filter,
    )

    out = tmp_path / "qf2"
    cfg = QualityFilterConfig(
        num_partitions=4, langid_concurrency=2, batch_size=256
    )
    run_quality_filter(cc_dir, out, cfg)
    before = (
        pds.dataset(str(out / "data"), partitioning="hive")
        .to_table()
        .sort_by("url")
    )

    (out / "manifest" / "part-00002.json").unlink()
    summary = run_quality_filter(cc_dir, out, cfg)
    assert summary["skipped_partitions"] == 3

    after = (
        pds.dataset(str(out / "data"), partitioning="hive")
        .to_table()
        .sort_by("url")
    )
    assert before.num_rows == after.num_rows
    assert before.column("url").equals(after.column("url"))
    assert before.column("keep").equals(after.column("keep"))


def test_exact_dedup_dataset(ray_session):
    import ray.data as rd

    from tiny_lingua_ray.stages.dedup import exact_dedup

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "aaa"},
            {"doc_id": 2, "text": "bbb"},
            {"doc_id": 3, "text": "aaa"},
            {"doc_id": 4, "text": "ccc"},
            {"doc_id": 5, "text": "aaa"},
        ]
    )
    out = exact_dedup(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    assert out["doc_id"].tolist() == [1, 2, 4]
    assert out["dup_count"].tolist() == [3, 1, 1]


def test_minhash_finds_near_dups(ray_session):
    import ray.data as rd

    from tiny_lingua_ray.stages.dedup import minhash_lsh_candidates

    base = "the quick brown fox jumps over the lazy dog again and again"
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("dog", "cat")},
            {"doc_id": 3, "text": "completely unrelated content about parquet files"},
        ]
    )
    pairs = minhash_lsh_candidates(ds).to_pandas()
    pairset = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (1, 2) in pairset
    assert (1, 3) not in pairset and (2, 3) not in pairset


def test_knn_brute_force(ray_session):
    import numpy as np
    import ray.data as rd

    from tiny_lingua_ray.stages.similarity import knn_brute_force

    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    vecs[7] = vecs[0] * 2.0  # same direction as 0 -> cosine 1.0
    ds = rd.from_items(
        [
            {"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(len(vecs))
        ]
    )
    out = knn_brute_force(ds, query_ids=[0], k=3)
    assert out.iloc[0]["neighbor_id"] == 7
    assert out.iloc[0]["cosine"] == pytest.approx(1.0)
    assert out["rank"].tolist() == [1, 2, 3]


def test_fast_langid_fallback_stage(ray_session):
    import pyarrow as pa

    from tiny_lingua_ray.stages.fast_langid import FastLangId

    stage = FastLangId(min_prob=0.0)
    batch = pa.table(
        {
            "text": ["bonjour le monde entier", "hello world out there"],
            "pred_lang": ["unknown", "en"],
            "lang_margin": [float("nan"), 0.5],
        }
    )
    out = stage(batch)
    final = out.column("lang_final").to_pylist()
    # resolved row untouched; unknown row re-scored by the classifier
    assert final[1] == "en"
    assert final[0] != "unknown"


def test_resume_rejects_stale_lineage(ray_session, models_dir, cc_dir, tmp_path):
    """A manifest written under a DIFFERENT config must not count as
    complete: rerunning with changed settings recomputes every partition
    instead of keeping stale output (checkpoint.py lineage matching)."""
    from tiny_lingua_ray.pipelines.quality_filter import (
        QualityFilterConfig,
        run_quality_filter,
    )

    out = tmp_path / "qf3"
    cfg = QualityFilterConfig(
        num_partitions=4, langid_concurrency=2, batch_size=256
    )
    run_quality_filter(cc_dir, out, cfg)

    # different quality mask -> different config hash -> full recompute
    cfg2 = QualityFilterConfig(
        num_partitions=4, langid_concurrency=2, batch_size=256,
        quality_drop_mask=1,
    )
    summary = run_quality_filter(cc_dir, out, cfg2)
    assert summary["skipped_partitions"] == 0
    assert summary["rows"] == 600

    # identical rerun of the NEW config skips everything again
    summary2 = run_quality_filter(cc_dir, out, cfg2)
    assert summary2["skipped_partitions"] == 4


def test_perplexity_scorer_unwraps_object_store_payload(
    ray_session, models_dir
):
    """Regression: PerplexityScorer shipped a {'packed','cache'} payload
    via models_ref must unwrap it (previously every row scored NaN and
    the max_perplexity rule was silently disabled)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from tiny_lingua_ray.models.loader import (
        load_packed_models,
        load_resolved_cache,
    )
    from tiny_lingua_ray.stages.perplexity import PerplexityScorer

    ref = ray.put(
        {
            "packed": load_packed_models(models_dir, ("en", "de")),
            "cache": load_resolved_cache(models_dir),
        }
    )
    scorer = PerplexityScorer(models_ref=ref, languages=("en", "de"))
    out = scorer(
        pa.table(
            {
                "text": ["the quick brown fox jumps over the lazy dog"],
                "pred_lang": ["en"],
            }
        )
    )
    pp = out.column("perplexity").to_pylist()
    assert pp[0] is not None and not np.isnan(pp[0]) and pp[0] > 0


def test_knn_ivf_scale_path(ray_session):
    """IVF ANN (coarse quantizer + probed cells) vs exact brute force:
    exhaustive probing returns the exact neighbor set; partial probing
    keeps high recall on the synthetic embeddings."""
    import numpy as np
    import ray.data as rd

    from tiny_lingua_ray.stages.similarity import knn_brute_force, knn_ivf

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((400, 16))
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(400)]
    )
    bf = knn_brute_force(ds, query_ids=[0, 1, 2], k=5)
    # exhaustive probe == exact neighbor sets (float path may differ in
    # last-bit cosine, so compare (query, neighbor) pairs)
    iv_full = knn_ivf(ds, query_ids=[0, 1, 2], k=5, n_cells=8, n_probe=8)
    assert set(map(tuple, iv_full[["query_id", "neighbor_id"]].values)) == set(
        map(tuple, bf[["query_id", "neighbor_id"]].values)
    )
    # partial probe: bounded recall loss
    iv = knn_ivf(ds, query_ids=[0, 1, 2], k=5, n_cells=8, n_probe=5)
    hits = set(map(tuple, iv[["query_id", "neighbor_id"]].values)) & set(
        map(tuple, bf[["query_id", "neighbor_id"]].values)
    )
    assert len(hits) / len(bf) >= 0.6
    # exact bounded-probe mode: recall == 1.0 GUARANTEED even with a
    # tiny probe set on adversarially uniform vectors — the spherical
    # triangle-inequality phase-2 bound must recover every escaped cell
    ive = knn_ivf(
        ds, query_ids=[0, 1, 2], k=5, n_cells=8, n_probe=2, exact=True
    )
    assert set(map(tuple, ive[["query_id", "neighbor_id"]].values)) == set(
        map(tuple, bf[["query_id", "neighbor_id"]].values)
    )


def test_knn_ivf_rejects_sentinel_query_id(ray_session):
    """query_id -1 is the in-band radius-sentinel row id; accepting it
    would silently drop that query's results and pollute exact-mode cell
    radii (review r5) — it must be a hard error."""
    import numpy as np
    import pytest
    import ray.data as rd

    from tiny_lingua_ray.stages.similarity import knn_ivf

    rng = np.random.RandomState(7)
    ds = rd.from_items(
        [
            {"vec_id": i - 1, "embedding": rng.standard_normal(8).tolist()}
            for i in range(20)
        ]
    )
    with pytest.raises(ValueError, match="reserved"):
        knn_ivf(ds, query_ids=[-1], k=3, n_cells=4, n_probe=2)


def test_cli_query_subcommand(tmp_path):
    """`cli query` runs a registered pipeline end to end in its own
    process (owns its Ray session) and writes parquet."""
    import subprocess
    import sys

    import pyarrow.parquet as pq

    r = subprocess.run(
        [sys.executable, "-m", "tiny_lingua_ray.cli", "query", "--list"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    names = r.stdout.split()
    assert "exact_dedup" in names and "minhash_dedup" in names

    out = str(tmp_path / "q_out")
    r = subprocess.run(
        [sys.executable, "-m", "tiny_lingua_ray.cli", "query",
         "--name", "doc_stats", "--sf-dir", "/root/testdata/sf0.001",
         "--out", out, "--num-cpus", "4"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    assert "doc_stats" in r.stdout
    got = pq.read_table(out)
    assert got.num_rows == 5  # one row per language
