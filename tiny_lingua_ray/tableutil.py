"""Small Arrow-table helpers shared across stages and pipelines."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def from_df(df: pd.DataFrame, preserve_index: bool = False) -> pa.Table:
    """``pa.Table.from_pandas`` with the pandas schema metadata stripped.

    pyarrow 16 schemas carrying the ``b'pandas'`` metadata blob are
    UNHASHABLE (``hash(schema)`` raises "unhashable type: 'dict'"), which
    defeats Ray Data's schema deduplication in every sort-shuffle reduce
    ("Failed to hash the schemas (for deduplication)" warning spam) and
    makes schema unification do a full unify instead of the early-exit.
    Every map_batches/map_groups callable that builds its output from a
    pandas frame must return through this helper.
    """
    return pa.Table.from_pandas(
        df, preserve_index=preserve_index
    ).replace_schema_metadata(None)


def deref(ref):
    """Resolve a broadcast value that may arrive as a Ray ObjectRef
    (fn_kwargs ship refs un-resolved; task-side ray.get is zero-copy)
    or as the plain value (driver-side / no-Ray paths)."""
    if hasattr(ref, "hex"):
        import ray

        return ray.get(ref)
    return ref
