"""Multi-format corpus ingestion (Parquet / CSV / JSONL) and sinks.

The reference engine's I/O surface is file-format-bound (JSON model
files, TXT accuracy corpora, CSV reports — `GenerateLanguageModelsTask`,
`accuracy-reports/` writers); a Ray-Data engine instead exposes ONE
Dataset-returning reader per storage format and lets every downstream
operator stay format-agnostic.  Web-scale corpora arrive as whatever the
crawler wrote — Parquet from warehouse exports, JSONL from CC-style
dumps, CSV from legacy feeds — so ingestion must normalize all three to
the same Arrow schema at the read, not with per-row fixups later.

Scale notes: all three readers stream (Ray Data's file readers split by
file/block and prune columns where the format supports it).  Column
pruning is free only for Parquet; CSV/JSONL must parse whole records —
the reader drops extra columns immediately after parse so nothing
un-requested crosses an exchange.  Schema drift (missing column, wrong
type) fails loudly at the first batch via an explicit cast, not miles
downstream.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa

_DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def _normalize(ds, columns: list[str] | None, schema: pa.Schema):
    """Project + cast every batch to the canonical column set/types."""
    want = [f.name for f in schema] if columns is None else columns
    target = pa.schema([schema.field(c) for c in want])

    def project(b: pa.Table) -> pa.Table:
        missing = [c for c in want if c not in b.column_names]
        if missing:
            raise ValueError(
                f"source missing required column(s) {missing}; "
                f"got {b.column_names}"
            )
        return b.select(want).cast(target)

    return ds.map_batches(project, batch_format="pyarrow")


def read_documents(path: str, fmt: str | None = None,
                   columns: list[str] | None = None,
                   schema: pa.Schema = _DOC_SCHEMA):
    """documents-shaped Dataset from ``path`` in any supported format.

    ``fmt`` is inferred from the extension when omitted ("parquet",
    "csv", "jsonl"/"json").  Output batches are canonical Arrow
    (identical schema across formats — tested by the format round-trip
    test), so pipelines composed on this reader never care where the
    bytes came from.
    """
    import ray.data as rd

    if fmt is None:
        name = Path(path).name.lower()
        if name.endswith((".jsonl.gz", ".json.gz")):
            fmt = "jsonl.gz"
        elif name.endswith(".gz"):
            # a bare .gz (csv.gz, txt.gz) fed to the JSON reader would
            # fail with an opaque Arrow parse error — reject clearly
            raise ValueError(
                f"cannot infer format of gzipped non-JSONL file {path!r};"
                " pass fmt= explicitly"
            )
        else:
            suffix = Path(path).suffix.lstrip(".").lower() or "parquet"
            fmt = {"json": "jsonl", "jsonl": "jsonl", "csv": "csv",
                   "parquet": "parquet"}.get(suffix, "parquet")
    if fmt == "parquet":
        want = ([f.name for f in schema] if columns is None else columns)
        # parquet prunes at the read; others prune right after parse
        return _normalize(
            rd.read_parquet(path, columns=want), columns, schema
        )
    if fmt == "csv":
        return _normalize(rd.read_csv(path), columns, schema)
    if fmt == "jsonl":
        return _normalize(rd.read_json(path), columns, schema)
    if fmt == "jsonl.gz":
        # the web-corpus interchange format (CommonCrawl-derived dumps
        # ship as gzipped JSONL); Arrow decompresses in the read stream
        return _normalize(
            rd.read_json(
                path,
                arrow_open_stream_args={"compression": "gzip"},
                file_extensions=None,
            ),
            columns,
            schema,
        )
    raise ValueError(f"unsupported format {fmt!r}")


def write_documents(ds, out_dir: str, fmt: str = "parquet"):
    """Write a documents-shaped Dataset as ``fmt`` under ``out_dir``
    (one file per block — resumable/partitioned layout, never one giant
    file)."""
    if fmt == "parquet":
        ds.write_parquet(out_dir)
    elif fmt == "csv":
        ds.write_csv(out_dir)
    elif fmt == "jsonl":
        ds.write_json(out_dir)
    elif fmt == "jsonl.gz":
        from ray.data.datasource import FilenameProvider

        class _GzNames(FilenameProvider):
            # Ray's default names end in .json; the bytes are gzip, so
            # name them .jsonl.gz or the format inference above would
            # misread the sink's own output on round-trip
            def get_filename_for_block(
                self, block, write_uuid, task_index, block_index
            ):
                return (
                    f"{write_uuid}_{task_index:06}_{block_index:06}"
                    ".jsonl.gz"
                )

        ds.write_json(
            out_dir,
            arrow_open_stream_args={"compression": "gzip"},
            filename_provider=_GzNames(),
        )
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    return out_dir
