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


def round_half_away(x, ndigits: int):
    """Round-half-away-from-zero, matching SQL ``ROUND`` semantics.

    ``np.round`` rounds half-to-EVEN, DuckDB/ANSI ``ROUND`` half-AWAY;
    the two diverge in the last ulp whenever ``x * 10^ndigits`` lands
    exactly on an .5 boundary in float64 (e.g. means over power-of-two
    group sizes — found by the driver's value hash on above_avg_events).
    Off the boundary the scale-multiply paths agree, so this helper
    strictly increases oracle agreement.  Every query that emits a
    column the SQL oracle wraps in ``ROUND(...)`` must round through
    here.
    """
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    s = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def deref(ref):
    """Resolve a broadcast value that may arrive as a Ray ObjectRef
    (fn_kwargs ship refs un-resolved; task-side ray.get is zero-copy)
    or as the plain value (driver-side / no-Ray paths)."""
    if hasattr(ref, "hex"):
        import ray

        return ray.get(ref)
    return ref
