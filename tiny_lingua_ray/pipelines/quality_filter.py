"""Flagship pipeline: the north-rule web-text quality filter.

    read_parquet(cc_pages)                                   [stream]
      -> fused stateless map_batches: extract html->text, verify
         byte-identity per url, assign part_id=hash(url)%K,
         filter already-completed partitions (resume)
      -> map_batches(LangIdScorer, actor pool)               [stateful,
         fused perplexity scoring by default]
      -> map_batches(FastLangId, light actor pool)           [fallback]
      -> fused stateless map_batches: quality rules + PII/toxicity scrub
         + keep/drop decision
      -> custom sink: hive-partitioned parquet write that RETURNS
         per-(partition, drop_reason) count partials          [resumable]
      -> tiny groupby -> per-partition metrics + lineage manifests

Reference lifecycle parity: SURVEY.md §3.4.  The per-record semantics of
the langid stage reproduce api/LanguageDetector.kt:221-286.

Scale notes: stateless stages are task pools (elastic); model state is
shipped per NODE — mmap'd from a shared filesystem by default
(``ship_models="disk"``) or via one ``ray.put`` ObjectRef
(``"object_store"``) for clusters without shared storage; the only wide
operation is the metrics groupby over count partials (<= K x reasons
rows).  Pool sizes are capped against cluster CPUs so actor pools can
never starve the task operators.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa

from tiny_lingua_ray.languages import ALL_ISO1
from tiny_lingua_ray.stages.extract import extract_batch
from tiny_lingua_ray.stages.langid import LangIdScorer
from tiny_lingua_ray.stages.perplexity import PerplexityScorer
from tiny_lingua_ray.stages.quality import quality_batch
from tiny_lingua_ray.stages.scrub import scrub_batch
from tiny_lingua_ray.state.checkpoint import (
    clear_incomplete_partition_data,
    completed_partitions,
    partition_ids,
    write_manifest,
)

DROP_NONE = ""
DROP_EXTRACT = "extract_mismatch"
DROP_LANG = "lang_unknown"
DROP_LANG_NOT_ALLOWED = "lang_not_allowed"
DROP_QUALITY = "quality"
DROP_PERPLEXITY = "perplexity"

# Value precision this pipeline's LangIdScorer actors run at.  The
# object-store model shipment keys off this: only when the scorers are
# float32 may the float64 matrix be replaced by its float32 twin.
_SCORER_VALUE_DTYPE = "float32"


@dataclass
class QualityFilterConfig:
    languages: tuple[str, ...] = ALL_ISO1
    allowed_langs: tuple[str, ...] | None = None  # None = any detected lang
    minimum_relative_distance: float = 0.0
    low_accuracy: bool = False
    max_perplexity: float = 1000.0
    quality_drop_mask: int = (1 << 10) - 1  # all quality flags drop
    num_partitions: int = 64
    batch_size: int = 512
    langid_concurrency: int | tuple[int, int] = (2, 8)
    perplexity_concurrency: int | tuple[int, int] = 2
    # one actor pool does langid + perplexity (one model copy, one pass)
    fuse_perplexity: bool = True
    # fastText-style fallback for rows langid left unknown/low-margin
    use_fasttext_fallback: bool = True
    fasttext_concurrency: int | tuple[int, int] = 2
    # "disk": actors load models from the shared filesystem (mmap, one
    # page-cache copy per node; no serial driver-side ray.put) — right for
    # single-node and shared-fs clusters. "object_store": driver ray.puts
    # the packed models once — right for multi-node without shared fs.
    ship_models: str = "disk"

    def config_hash(self) -> str:
        payload = json.dumps(
            {
                "languages": self.languages,
                "allowed": self.allowed_langs,
                "mrd": self.minimum_relative_distance,
                "low": self.low_accuracy,
                "maxpp": self.max_perplexity,
                "qmask": self.quality_drop_mask,
                "K": self.num_partitions,
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _prepare_batch(
    batch: pa.Table, num_partitions: int, skip: frozenset[int]
) -> pa.Table:
    """Fused: extract + byte-identity check + part_id + resume filter."""
    import pyarrow.compute as pc

    batch = extract_batch(batch, drop_html=True)
    urls = batch.column("url").to_pylist()
    pids = partition_ids(urls, num_partitions)
    ok = pc.equal(batch.column("extracted_text"), batch.column("text"))
    batch = batch.append_column("part_id", pa.array(pids)).append_column(
        "extract_ok", pc.fill_null(ok, False)
    )
    batch = batch.drop_columns(["text"])
    if skip:
        mask = ~np.isin(pids, np.fromiter(skip, dtype=np.int64))
        batch = batch.filter(pa.array(mask))
    return batch


def _finalize_batch(batch: pa.Table, cfg: QualityFilterConfig) -> pa.Table:
    """Fused: quality rules + scrub + keep/drop decision + projection."""
    batch = quality_batch(batch, text_column="extracted_text")
    batch = scrub_batch(batch, text_column="extracted_text")

    R = batch.num_rows
    lang_col = (
        "lang_final" if "lang_final" in batch.column_names else "pred_lang"
    )
    pred = batch.column(lang_col).to_pylist()
    extract_ok = np.asarray(batch.column("extract_ok").to_pylist(), dtype=bool)
    qflags = batch.column("quality_flags").to_numpy()
    pp = batch.column("perplexity").to_numpy()

    pred_arr = np.asarray(pred, dtype=object)
    bad_extract = ~extract_ok
    bad_lang = pred_arr == "unknown"
    if cfg.allowed_langs:
        bad_allowed = ~np.isin(
            pred_arr.astype(str), np.asarray(cfg.allowed_langs)
        ) & ~bad_lang
    else:
        bad_allowed = np.zeros(R, dtype=bool)
    bad_quality = (qflags & cfg.quality_drop_mask) != 0
    bad_pp = ~np.isnan(pp) & (pp > cfg.max_perplexity)
    # precedence: extract > lang > allowed > quality > perplexity
    reason_arr = np.select(
        [bad_extract, bad_lang, bad_allowed, bad_quality, bad_pp],
        [DROP_EXTRACT, DROP_LANG, DROP_LANG_NOT_ALLOWED, DROP_QUALITY,
         DROP_PERPLEXITY],
        default=DROP_NONE,
    )
    keep = reason_arr == DROP_NONE
    reason = reason_arr

    batch = batch.append_column("keep", pa.array(keep)).append_column(
        "drop_reason", pa.array(reason.tolist(), pa.string())
    )
    cols = [
        "url",
        "warc_ts",
        "part_id",
        "lang",
        "pred_lang",
        "lang_margin",
        "lang_path",
        "perplexity",
        "quality_flags",
        "pii_count",
        "tox_count",
        "keep",
        "drop_reason",
        "text_scrubbed",
    ]
    if "lang_final" in batch.column_names:
        cols.insert(5, "lang_final")
        cols.insert(6, "ft_prob")
    return batch.select(cols)


def _cap_pool(
    conc: int | tuple[int, int], cpus: int, reserve: int = 2
) -> int | tuple[int, int]:
    """Cap an actor-pool size so 1-CPU actors can never starve the task
    operators (pool + ``reserve`` task CPUs must fit the cluster)."""
    avail = max(1, cpus - reserve)
    if isinstance(conc, tuple):
        lo, hi = conc
        lo = max(1, min(lo, avail))
        hi = max(lo, min(hi, avail))
        return lo if lo == hi else (lo, hi)
    return max(1, min(conc, avail))


def quality_filter_dataset(
    ds,
    cfg: QualityFilterConfig | None = None,
    models_ref=None,
    skip_partitions: frozenset[int] = frozenset(),
):
    """Compose the full pipeline onto ``ds`` (lazy; no sinks, no ray.init)."""
    cfg = cfg or QualityFilterConfig()

    cluster_cpus = 8
    try:
        import ray

        if ray.is_initialized():
            cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
    except ImportError:
        pass
    # fastText actors are light (40 MB matrix): half a CPU each, and they
    # must not push the 1-CPU langid pool into starving the task operators
    ft_conc = _cap_pool(cfg.fasttext_concurrency, cluster_cpus * 2, reserve=2)
    langid_conc = _cap_pool(
        cfg.langid_concurrency,
        cluster_cpus
        - (
            (ft_conc[1] if isinstance(ft_conc, tuple) else ft_conc) // 2
            if cfg.use_fasttext_fallback
            else 0
        ),
        reserve=2,
    )

    from tiny_lingua_ray.models.train import ensure_models

    # low-accuracy configs score with the low-mode model artifacts
    # (per-mode training mixtures — models/train.py rationale)
    mdir = ensure_models(languages=cfg.languages, low_mode=cfg.low_accuracy)

    if models_ref is None and cfg.ship_models == "object_store":
        try:
            import ray

            if ray.is_initialized():
                from tiny_lingua_ray.models.loader import (
                    load_packed_models,
                    load_resolved_cache,
                )

                cache = load_resolved_cache(mdir)
                if (
                    cache is not None
                    and cache.get("matrix32") is not None
                    and _SCORER_VALUE_DTYPE == "float32"
                ):
                    # this pipeline's scorers run the float32 path (see
                    # scorer_kwargs below), which only reads the float32
                    # twin — don't double the plasma footprint by shipping
                    # the float64 matrix alongside it.  Guarded on the
                    # dtype actually passed to the scorers: a float64
                    # pipeline must ship the real float64 matrix or the
                    # documented bit-parity escape hatch is a no-op.
                    cache = dict(cache, matrix=cache["matrix32"])
                models_ref = ray.put(
                    {
                        "packed": load_packed_models(mdir, cfg.languages),
                        "cache": cache,
                    }
                )
        except ImportError:
            pass

    scorer_kwargs: dict = {
        "languages": cfg.languages,
        "minimum_relative_distance": cfg.minimum_relative_distance,
        "low_accuracy": cfg.low_accuracy,
        "text_column": "extracted_text",
        "value_dtype": _SCORER_VALUE_DTYPE,
    }
    pp_kwargs: dict = {
        "languages": cfg.languages,
        "text_column": "extracted_text",
        "lang_column": "pred_lang",
    }
    if models_ref is not None:
        scorer_kwargs["models_ref"] = models_ref
        pp_kwargs["models_ref"] = models_ref
    else:
        scorer_kwargs["models_dir"] = str(mdir)
        scorer_kwargs["build_if_missing"] = False
        pp_kwargs["models_dir"] = str(mdir)
        pp_kwargs["build_if_missing"] = False

    ds = ds.map_batches(
        _prepare_batch,
        fn_kwargs={
            "num_partitions": cfg.num_partitions,
            "skip": skip_partitions,
        },
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    if cfg.fuse_perplexity:
        scorer_kwargs["compute_perplexity"] = True
        ds = ds.map_batches(
            LangIdScorer,
            fn_constructor_kwargs=scorer_kwargs,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=langid_conc,
            num_cpus=1,
        )
    else:
        ds = ds.map_batches(
            LangIdScorer,
            fn_constructor_kwargs=scorer_kwargs,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=langid_conc,
            num_cpus=1,
        )
        ds = ds.map_batches(
            PerplexityScorer,
            fn_constructor_kwargs=pp_kwargs,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=_cap_pool(cfg.perplexity_concurrency, cluster_cpus),
            num_cpus=1,
        )
    if cfg.use_fasttext_fallback:
        from tiny_lingua_ray.stages.fast_langid import FastLangId

        ft_kwargs: dict = {"text_column": "extracted_text"}
        from tiny_lingua_ray.models.fast_text import ensure_fasttext_model

        if cfg.ship_models == "object_store":
            try:
                import ray

                if ray.is_initialized():
                    ft_kwargs["model_ref"] = ray.put(ensure_fasttext_model())
            except ImportError:
                pass
        else:
            ensure_fasttext_model()  # build once; actors mmap from disk
        ds = ds.map_batches(
            FastLangId,
            fn_constructor_kwargs=ft_kwargs,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=ft_conc,
            num_cpus=0.5,
        )

    ds = ds.map_batches(
        _finalize_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    return ds


def _write_partitioned_and_count(batch: pa.Table, out_data: str) -> pa.Table:
    """Custom sink stage: write the batch's rows into hive-style
    ``part_id=<k>/`` dirs and RETURN tiny per-(part_id, drop_reason) count
    partials — per-partition metrics in the same pass, no output read-back.

    Sizing at real (multi-GB-per-partition) scale: each call writes one
    parquet file per part_id PRESENT IN THE BATCH, so file count scales
    with batches x partitions-touched-per-batch.  Upstream part_id is
    hash(url) % num_partitions — a batch touches ~all K partitions, so at
    100 TB keep cfg.batch_size large (>= 64k rows) and num_partitions
    sized so batch_size/num_partitions stays >= a few thousand rows per
    file (or pre-bucket by part_id with a repartition when tiny-file
    pressure on the object store matters more than the extra exchange)."""
    import os
    import uuid

    import pyarrow.parquet as pq

    pids = batch.column("part_id").to_numpy(zero_copy_only=False)
    parts: dict[int, np.ndarray] = {}
    for k in np.unique(pids):
        parts[int(k)] = pids == k
    out_pid, out_reason, out_n = [], [], []
    for k, mask in parts.items():
        sub = batch.filter(pa.array(mask))
        d = os.path.join(out_data, f"part_id={k}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            sub.drop_columns(["part_id"]),
            os.path.join(d, f"{uuid.uuid4().hex}.parquet"),
        )
        reasons: dict[str, int] = {}
        for r in sub.column("drop_reason").to_pylist():
            reasons[r] = reasons.get(r, 0) + 1
        for r, n in reasons.items():
            out_pid.append(k)
            out_reason.append(r)
            out_n.append(n)
    return pa.table(
        {
            "part_id": pa.array(out_pid, pa.int64()),
            "drop_reason": pa.array(out_reason, pa.string()),
            "n": pa.array(out_n, pa.int64()),
        }
    )


def run_quality_filter(
    input_path: str | Path,
    out_dir: str | Path,
    cfg: QualityFilterConfig | None = None,
    resume: bool = True,
) -> dict:
    """Execute with the resumable partitioned sink; returns summary metrics."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    cfg = cfg or QualityFilterConfig()
    out = Path(out_dir)
    t0 = time.time()

    # lineage identifies this run; manifests from a different input/config
    # (written_at excluded from matching) never count as complete
    lineage = {
        "input": str(input_path),
        "config": cfg.config_hash(),
        "num_partitions": cfg.num_partitions,
        "written_at": time.time(),
    }
    done = (
        completed_partitions(out, cfg.num_partitions, lineage)
        if resume
        else set()
    )
    if not resume:
        import shutil

        shutil.rmtree(out, ignore_errors=True)
    clear_incomplete_partition_data(out, cfg.num_partitions, lineage)

    read_kwargs = {}
    if os.path.isfile(str(input_path)):
        # strip pandas-written schema metadata AT THE READ: pyarrow 16
        # can't hash it, which defeats Ray's schema dedup downstream and
        # spams warnings from inside the read task (see queries._read)
        import pyarrow.parquet as _pq

        read_kwargs["schema"] = _pq.read_schema(str(input_path)).remove_metadata()
    ds = rd.read_parquet(str(input_path), **read_kwargs).map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cols = set(ds.schema().names)
    if "html" not in cols:
        if {"doc_id", "text"} <= cols:
            # documents-shaped input: adapt instead of failing deep in a
            # worker with a KeyError on the missing html column
            from tiny_lingua_ray.sources.cc_pages import documents_to_cc_pages

            ds = documents_to_cc_pages(ds)
        else:
            raise ValueError(
                "input must be cc_pages-shaped (url, warc_ts, html, text, "
                "lang) or documents-shaped (doc_id, text); got columns "
                f"{sorted(cols)}"
            )
    result = quality_filter_dataset(
        ds, cfg, skip_partitions=frozenset(done)
    )
    # sink + metrics in ONE pass (the grouped result is <= K x reasons rows)
    agg = (
        result.map_batches(
            _write_partitioned_and_count,
            fn_kwargs={"out_data": str(out / "data")},
            batch_format="pyarrow",
            # large sink batches -> fewer files per partition dir
            batch_size=max(cfg.batch_size, 4096),
        )
        .groupby(["part_id", "drop_reason"])
        .aggregate(Sum("n", alias_name="count()"))
        .to_pandas()
    )
    if "count()" not in agg.columns:  # nothing processed (all skipped)
        import pandas as pd

        agg = pd.DataFrame(
            {
                "part_id": pd.Series(dtype="int64"),
                "drop_reason": pd.Series(dtype="object"),
                "count()": pd.Series(dtype="int64"),
            }
        )

    new_parts = sorted(set(range(cfg.num_partitions)) - done)
    lineage["written_at"] = time.time()
    summary = {"rows": 0, "kept": 0, "partitions": cfg.num_partitions}
    for k in new_parts:
        g = agg[agg["part_id"] == k]
        rows = int(g["count()"].sum())
        kept = int(g.loc[g["drop_reason"] == DROP_NONE, "count()"].sum())
        m = {
            "rows": rows,
            "kept": kept,
            "drop_reasons": {
                str(r): int(c)
                for r, c in zip(g["drop_reason"], g["count()"])
                if r != DROP_NONE
            },
        }
        write_manifest(out, k, m, lineage)
    summary["rows"] = int(agg["count()"].sum())
    summary["kept"] = int(
        agg.loc[agg["drop_reason"] == DROP_NONE, "count()"].sum()
    )
    summary["elapsed_sec"] = time.time() - t0
    summary["skipped_partitions"] = len(done)
    return summary
