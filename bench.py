"""Benchmark harness (driver contract).

    python bench.py               one JSON line with headline + per-query secs
    python bench.py --scaling     run the headline pipeline at 8 and 32 CPUs
                                  in fresh processes; report throughputs +
                                  scaling efficiency

Input: $GRAFT_SF_DIR (default /root/testdata/sf0.1);
CPUs: $RAY_GRAFT_CPUS (default 32).

Headline: the flagship quality-filter pipeline (extract -> langid ->
perplexity -> quality+scrub -> keep/drop) over a cc_pages corpus
synthesized deterministically from the sf dir's documents table, plus a
set of representative operator pipelines from __ray_entry__.queries().
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = (
    "lineitem_pricing",
    "join_orders_customers",
    "topk_orders",
    "events_daily",
    "word_freq_top20",
    "exact_dedup",
    "minhash_dedup",
    "simhash",
    "simhash_pairs",
    "dedup_keep_first",
    "token_counts",
    "knn_cosine",
    "order_lineitem_band_join",
    "asof_event_order",
    "repetition_signals",
    "pack_sequences",
    "left_join_customer_orders",
    "global_rank_docs",
    "paragraph_dedup",
    "event_sequences",
    "bigram_top20",
    "pretraining_prep",
    "winsorize_chars",
    "window_dedup",
    "dsir_weights",
    "temperature_mixture",
    "bpe_encode",
    "containment_pairs",
    "dedup_keep_best",
    "boilerplate_purge",
    "deterministic_shuffle",
)


def _consume(result) -> int:
    """Execute a lazy result fully, streaming (no driver materialization)."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, (pd.DataFrame, pa.Table)):
        return len(result)
    n = 0
    for b in result.iter_batches(batch_size=4096, batch_format="pyarrow"):
        n += b.num_rows
    return n


def _warm_page_cache(*dirs: str) -> None:
    """Read every parquet file in the given dirs once, untimed.

    On a fresh VM the first process to touch the SF tables pays cold
    disk reads that inflate EVERY timed pipeline 2-7x (measured round
    5: paragraph_dedup 7.5 s cold-cache vs 1.0 s warm on identical
    code).  The bench measures compute + shuffle, not first-touch disk,
    so warm the OS page cache explicitly before the timed region."""
    for d in dirs:
        p = Path(d)
        if not p.is_dir():
            continue
        for f in sorted(p.rglob("*.parquet")):
            with open(f, "rb") as fh:
                while fh.read(1 << 24):
                    pass


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from tiny_lingua_ray.models.train import ensure_models

    ensure_models()  # exclude one-time model build from timings

    import __ray_entry__ as entrymod

    qs = entrymod.queries()

    # headline: full flagship pipeline (incl. partitioned sink + manifests)
    # over a multilingual cc_pages corpus sized to the SF (cached build)
    import shutil
    import pyarrow.parquet as pq

    from tiny_lingua_ray.pipelines.quality_filter import (
        QualityFilterConfig,
        run_quality_filter,
    )
    from tiny_lingua_ray.sources.cc_pages import build_cc_pages, default_cc_dir

    lineitem_rows = pq.read_metadata(f"{SF_DIR}/lineitem.parquet").num_rows
    cc_rows = int(
        os.environ.get("GRAFT_CC_ROWS", max(2000, lineitem_rows // 12))
    )
    cc_dir = build_cc_pages(default_cc_dir(cc_rows), total_rows=cc_rows)

    out_dir = Path(f"/tmp/tlr_bench_out/{os.getpid()}")
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = QualityFilterConfig(
        num_partitions=64,
        # fixed-size pool (pre-started) — autoscaling ramp serializes the
        # head of the run
        langid_concurrency=max(2, int(NUM_CPUS * 0.75)),
        batch_size=512,
    )
    import statistics

    # median-of-N headline (VERDICT r4 item 6): this host's wall clock
    # swings 2-3x on identical work, so the driver's single-shot number
    # regressed two rounds' worth of optics while controlled re-runs
    # were the best ever.  Replicates run in ONE process (models and
    # page cache warm after rep 1); median is the reported value.
    reps = int(os.environ.get("GRAFT_HEADLINE_REPS", "3"))
    if os.environ.get("RAY_GRAFT_HEADLINE_ONLY"):
        reps = 1  # scaling legs time a single run; the pairing +
        # median-of-pairs logic in run_scaling() owns noise control
    _warm_page_cache(SF_DIR, str(cc_dir))
    headline_samples = []
    n_rows = 0
    if not os.environ.get("RAY_GRAFT_HEADLINE_ONLY"):
        # one untimed warmup rep: absorbs actor-pool cold start, module
        # imports and any residual cold reads so the timed median
        # reflects steady-state throughput (round-5: cold first rep
        # measured 16.4 s vs 7.9 s warm and dragged the median of 3 up
        # a full second).  Scaling legs (HEADLINE_ONLY) skip it — at
        # 3.2M rows it would double each leg and run_scaling() already
        # warms via a small untimed subprocess run.
        shutil.rmtree(out_dir, ignore_errors=True)
        run_quality_filter(cc_dir, out_dir, cfg, resume=False)
    for _ in range(reps):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        summary = run_quality_filter(cc_dir, out_dir, cfg, resume=False)
        headline_samples.append(round(time.time() - t0, 3))
        n_rows = summary["rows"]
    headline = statistics.median(headline_samples)
    shutil.rmtree(out_dir, ignore_errors=True)

    per_query: dict[str, float] = {}
    if not os.environ.get("RAY_GRAFT_HEADLINE_ONLY"):
        # median-of-3 per query, in-process (first sample absorbs
        # worker/module warmup and is discarded by the median)
        for name in BENCH_QUERIES:
            samples = []
            for _ in range(3):
                t0 = time.time()
                _consume(qs[name](SF_DIR))
                samples.append(time.time() - t0)
            per_query[name] = round(statistics.median(samples), 3)

    ray.shutdown()
    return {
        "metric": "flagship_quality_filter_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "rows": n_rows,
        "docs_per_sec": round(n_rows / headline, 1),
        "headline_samples": headline_samples,
        "queries": per_query,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> dict:
    """Same headline job at 8 and 32 CPUs in fresh processes."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            RAY_GRAFT_HEADLINE_ONLY="1",
            # larger corpus for the scaling runs so per-run fixed costs
            # (session + pool startup) don't masquerade as poor scaling:
            # a fixed cost c gives (T8+c)/(4*(T32+c)) < T8/(4*T32), i.e.
            # it always biases efficiency DOWN.  At 800k rows the 32-CPU
            # leg's ~5s fixed costs were ~17% of wall vs ~5% on the 8-CPU
            # leg; 3.2M rows (round 3) pushes the 32-CPU leg to ~80-90s
            # wall so fixed costs are <6% and the measurement approaches
            # the steady-state regime the N->4N criterion models
            GRAFT_CC_ROWS=os.environ.get("GRAFT_SCALING_ROWS", "3200000"),
        )
        out = subprocess.run(
            [sys.executable, __file__],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # warm page cache + model/table caches with a small untimed run
    warm_env = dict(
        os.environ,
        RAY_GRAFT_CPUS="32",
        RAY_GRAFT_HEADLINE_ONLY="1",
        GRAFT_CC_ROWS="20000",
    )
    subprocess.run(
        [sys.executable, __file__], env=warm_env, capture_output=True,
        text=True, check=True,
    )
    # >=3 paired replicates, MEDIAN efficiency: this sandbox's wall clock
    # swings 2-3x on identical work, so a single pair is not evidence;
    # pairing 8- and 32-CPU legs back-to-back keeps host noise correlated
    # within a sample
    import statistics

    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    runs8, runs32, effs = [], [], []
    for _ in range(reps):
        r8 = run(8)
        r32 = run(32)
        runs8.append(r8)
        runs32.append(r32)
        effs.append(round((r8["value"] / r32["value"]) / (32 / 8), 3))
    med = statistics.median(effs)
    best8 = min(runs8, key=lambda d: d["value"])
    best32 = min(runs32, key=lambda d: d["value"])
    return {
        "metric": "scaling_efficiency",
        "value": round(med, 3),
        "unit": "ratio",
        "samples": effs,
        "sec_8": [d["value"] for d in runs8],
        "sec_32": [d["value"] for d in runs32],
        "docs_per_sec_8": best8["docs_per_sec"],
        "docs_per_sec_32": best32["docs_per_sec"],
        "best_pair_efficiency": round(
            (best8["value"] / best32["value"]) / (32 / 8), 3
        ),
        "sf": SF_DIR,
    }


def _dedup_corpus(rows: int) -> str:
    """Deterministic large corpus for the shuffle-scaling run: random
    60-word docs over a 1000-token vocab (near-zero cross-doc
    similarity, so pair output stays bounded and the measurement times
    the SHUFFLE, not pair materialization), with near-dup twins planted
    for 2% of docs (3 words swapped -> Jaccard ~0.9, so the LSH bands
    genuinely fire).  Built once, cached in /tmp."""
    path = f"/tmp/tlr_dedup_corpus_{rows}.parquet"
    if os.path.exists(path):
        return path
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(42)
    # random LETTER strings: a structured surface form (tok0042) shares
    # char-5-gram prefixes across the whole vocab and made every doc
    # pair a candidate (measured); diverse spellings keep cross-doc
    # Jaccard near zero
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = np.array(
        [
            "".join(letters[rng.randint(0, 26, size=rng.randint(5, 9))])
            for _ in range(1000)
        ]
    )
    n_base = rows - rows // 50
    W = 60
    words = vocab[rng.randint(0, len(vocab), size=(n_base, W))]
    texts = [" ".join(r) for r in words]
    # plant twins: the first rows-n_base base docs get a copy with 3
    # words replaced (exactly rows total; arange(0,n_base,50) yielded
    # fewer sources than requested)
    twin_src = np.arange(rows - n_base)
    for s in twin_src:
        ws = words[s].copy()
        ws[rng.randint(0, W, size=3)] = vocab[rng.randint(0, len(vocab), 3)]
        texts.append(" ".join(ws))
    ids = np.arange(len(texts), dtype=np.int64)
    tmp = path + ".tmp"
    pq.write_table(
        pa.table({"doc_id": pa.array(ids),
                  "text": pa.array(texts, pa.string())}),
        tmp,
    )
    os.replace(tmp, path)
    return path


def run_dedup_once(rows: int) -> dict:
    """Time ONE minhash-LSH candidate pass (the all-to-all shuffle
    pipeline) at NUM_CPUS over the cached corpus; prints one JSON line."""
    import ray

    path = _dedup_corpus(rows)
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from tiny_lingua_ray.stages.dedup import minhash_lsh_candidates

    t0 = time.perf_counter()
    ds = rd.read_parquet(path, override_num_blocks=max(64, NUM_CPUS * 4))
    n_pairs = _consume(minhash_lsh_candidates(ds, scheme="fnv"))
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {
        "metric": "minhash_dedup_sec",
        "value": round(dt, 3),
        "unit": "sec",
        "rows": rows,
        "pairs": n_pairs,
        "docs_per_sec": round(rows / dt, 1),
        "num_cpus": NUM_CPUS,
    }


def run_scaling_dedup() -> dict:
    """The --scaling evidence for the SHUFFLE-heavy path: same
    minhash-LSH job at 8 and 32 CPUs in fresh processes, >=3 paired
    replicates, median efficiency (flagship --scaling covers the
    map-heavy path)."""
    import statistics

    rows = int(os.environ.get("GRAFT_DEDUP_SCALING_ROWS", "100000"))
    _dedup_corpus(rows)  # build once outside the timed legs

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            RAY_GRAFT_DEDUP_ROWS=str(rows),
        )
        out = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True,
            text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    run(32)  # warm page cache, untimed
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    runs8, runs32, effs = [], [], []
    for _ in range(reps):
        r8 = run(8)
        r32 = run(32)
        runs8.append(r8)
        runs32.append(r32)
        effs.append(round((r8["value"] / r32["value"]) / (32 / 8), 3))
    best8 = min(runs8, key=lambda d: d["value"])
    best32 = min(runs32, key=lambda d: d["value"])
    return {
        "metric": "minhash_scaling_efficiency",
        "value": round(statistics.median(effs), 3),
        "unit": "ratio",
        "samples": effs,
        "sec_8": [d["value"] for d in runs8],
        "sec_32": [d["value"] for d in runs32],
        "docs_per_sec_8": best8["docs_per_sec"],
        "docs_per_sec_32": best32["docs_per_sec"],
        "best_pair_efficiency": round(
            (best8["value"] / best32["value"]) / (32 / 8), 3
        ),
        "rows": rows,
    }


def _containment_dir(rows: int) -> str:
    """The dedup-scaling corpus exposed as an sf-dir-style documents
    table (the containment join reads ``{dir}/documents.parquet``)."""
    import shutil

    src = _dedup_corpus(rows)
    d = f"/tmp/tlr_containment_{rows}"
    dst = f"{d}/documents.parquet"
    if not os.path.exists(dst):
        os.makedirs(d, exist_ok=True)
        tmp = dst + f".tmp{os.getpid()}"
        shutil.copy(src, tmp)
        os.replace(tmp, dst)
    return d


def run_containment_once(rows: int) -> dict:
    """Time ONE prefix-filter containment join (six chained linear
    exchanges) at NUM_CPUS over the cached corpus; one JSON line."""
    import ray

    d = _containment_dir(rows)
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from tiny_lingua_ray.pipelines.queries import q_containment_pairs

    t0 = time.perf_counter()
    n_pairs = _consume(q_containment_pairs(d))
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {
        "metric": "containment_pairs_sec",
        "value": round(dt, 3),
        "unit": "sec",
        "rows": rows,
        "pairs": n_pairs,
        "docs_per_sec": round(rows / dt, 1),
        "num_cpus": NUM_CPUS,
    }


def run_scaling_containment() -> dict:
    """The --scaling evidence for the MULTI-EXCHANGE JOIN path: the same
    containment join at 8 and 32 CPUs in fresh processes, >=3 paired
    replicates, median efficiency (flagship --scaling covers map-heavy,
    --scaling-dedup covers the minhash shuffle).  400k docs by default —
    at 100k the six sequential exchange barriers dominate and the
    measurement times latency, not scaling."""
    import statistics

    rows = int(os.environ.get("GRAFT_CONTAINMENT_SCALING_ROWS", "400000"))
    _containment_dir(rows)  # build once outside the timed legs

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            RAY_GRAFT_CONTAINMENT_ROWS=str(rows),
        )
        out = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True,
            text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    run(32)  # warm page cache, untimed
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    runs8, runs32, effs = [], [], []
    for _ in range(reps):
        r8 = run(8)
        r32 = run(32)
        runs8.append(r8)
        runs32.append(r32)
        effs.append(round((r8["value"] / r32["value"]) / (32 / 8), 3))
    best8 = min(runs8, key=lambda d: d["value"])
    best32 = min(runs32, key=lambda d: d["value"])
    return {
        "metric": "containment_scaling_efficiency",
        "value": round(statistics.median(effs), 3),
        "unit": "ratio",
        "samples": effs,
        "sec_8": [d["value"] for d in runs8],
        "sec_32": [d["value"] for d in runs32],
        "docs_per_sec_8": best8["docs_per_sec"],
        "docs_per_sec_32": best32["docs_per_sec"],
        "best_pair_efficiency": round(
            (best8["value"] / best32["value"]) / (32 / 8), 3
        ),
        "rows": rows,
    }


if __name__ == "__main__":
    if os.environ.get("RAY_GRAFT_DEDUP_ROWS"):
        print(json.dumps(run_dedup_once(
            int(os.environ["RAY_GRAFT_DEDUP_ROWS"]))))
    elif os.environ.get("RAY_GRAFT_CONTAINMENT_ROWS"):
        print(json.dumps(run_containment_once(
            int(os.environ["RAY_GRAFT_CONTAINMENT_ROWS"]))))
    elif "--scaling-dedup" in sys.argv:
        print(json.dumps(run_scaling_dedup()))
    elif "--scaling-containment" in sys.argv:
        print(json.dumps(run_scaling_containment()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
