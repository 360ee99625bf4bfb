"""Checkpoint manifests + resume (north rule: "resumable from checkpoint
with per-partition lineage + metrics").

Layout under the pipeline output directory::

    <out>/data/part_id=<k>/*.parquet     Ray-written partitioned output
    <out>/manifest/part-<k>.json         written AFTER the partition's data
                                         is fully on disk (atomic rename)

Partitioning key: ``part_id = hash(url) % num_partitions`` — stable and
independent of input file layout, so a rerun computes identical partition
membership.  On resume, partitions with a valid manifest are filtered out
right after the read (cheap vectorized mask); their stale data dirs are
kept, all other part dirs are rewritten.

The manifest records lineage (input fingerprint, config hash) and metrics
(row counts, keep/drop histogram) per partition.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np


def stable_url_hash(urls: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash per url (FNV-1a, process-independent)."""
    from tiny_lingua_ray.models.train import fnv1a_64

    return np.fromiter(
        (fnv1a_64(u or "") for u in urls), dtype=np.uint64, count=len(urls)
    )


def partition_ids(urls: list[str], num_partitions: int) -> np.ndarray:
    return (stable_url_hash(urls) % np.uint64(num_partitions)).astype(np.int64)


def manifest_path(out_dir: str | Path, part_id: int) -> Path:
    return Path(out_dir) / "manifest" / f"part-{part_id:05d}.json"


def completed_partitions(
    out_dir: str | Path,
    num_partitions: int,
    lineage: dict | None = None,
) -> set[int]:
    """Partition ids with a valid manifest.

    When ``lineage`` is given, a manifest only counts as complete if its
    recorded lineage matches the current run on every key except
    ``written_at`` — resuming with a changed input path, config hash or
    partition count must NOT silently keep stale output computed under
    the old settings.
    """
    done: set[int] = set()
    mdir = Path(out_dir) / "manifest"
    if not mdir.is_dir():
        return done
    for k in range(num_partitions):
        f = mdir / f"part-{k:05d}.json"
        if f.exists():
            try:
                m = json.loads(f.read_text())
            except (json.JSONDecodeError, OSError):
                continue
            if not m.get("complete"):
                continue
            if lineage is not None:
                recorded = m.get("lineage", {})
                if any(
                    recorded.get(key) != val
                    for key, val in lineage.items()
                    if key != "written_at"
                ):
                    continue
            done.add(k)
    return done


def write_manifest(
    out_dir: str | Path,
    part_id: int,
    metrics: dict,
    lineage: dict,
) -> None:
    f = manifest_path(out_dir, part_id)
    f.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "part_id": part_id,
        "complete": True,
        "metrics": metrics,
        "lineage": lineage,
    }
    tmp = f.with_suffix(".tmp")
    tmp.write_text(json.dumps(payload, indent=1, sort_keys=True))
    os.replace(tmp, f)


def clear_incomplete_partition_data(
    out_dir: str | Path, num_partitions: int, lineage: dict | None = None
) -> None:
    """Delete data dirs for partitions without a valid manifest (stale
    output from a crashed run — or from a run with different lineage —
    must not survive into the rewrite)."""
    import shutil

    done = completed_partitions(out_dir, num_partitions, lineage)
    data = Path(out_dir) / "data"
    if not data.is_dir():
        return
    for d in data.glob("part_id=*"):
        try:
            k = int(d.name.split("=", 1)[1])
        except ValueError:
            continue
        if k not in done:
            shutil.rmtree(d, ignore_errors=True)
