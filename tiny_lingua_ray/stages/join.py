"""Generic distributed hash join over Ray Datasets.

``hash_join(left, right, on, how)`` is the reusable engine operator the
query layer's ad-hoc joins (relational_ext) specialize; it picks the
physical plan by measured size:

* **broadcast** — if the right side is small (``size_bytes()`` under
  ``broadcast_threshold``), collect it once, ``ray.put`` it, and join
  map-side in every left block: zero shuffles, the plan for
  dimension-table joins at any corpus scale.
* **shuffle cogroup** — otherwise the tagged-union idiom used across
  this repo (relational_ext.py): both sides padded to ONE unified
  arrow schema (typed nulls, so no cross-block schema drift), keyed by
  ``hash(on) % P``, ONE exchange, per-shard pandas-C merge.  Skewed
  keys concentrate in a shard — pair with
  stages/partitioning.salted_map_groups when a key holds a data-sized
  share.

Join types: inner, left, right, full, semi, anti (semi/anti return
left columns only, SQL semantics).  Right-side columns that collide
with left names get the ``r_`` prefix.  Output dtypes are
deterministic regardless of the physical plan or per-shard match
pattern: integer value columns on a side that ``how`` makes nullable
come back float64 (the pandas NaN convention); everything else keeps
its type.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_DEFAULT_BROADCAST = 64 * 1024 * 1024  # 64 MiB


def _promote_key(lt: pa.DataType, rt: pa.DataType) -> pa.DataType:
    """One key type for BOTH sides — sharding and matching must see the
    same values, so both sides cast to this before anything else."""
    if lt.equals(rt):
        return lt
    if pa.types.is_integer(lt) and pa.types.is_integer(rt):
        return pa.int64()
    num = (
        (pa.types.is_integer(lt) or pa.types.is_floating(lt))
        and (pa.types.is_integer(rt) or pa.types.is_floating(rt))
    )
    if num:
        return pa.float64()
    if pa.types.is_string(lt) and pa.types.is_string(rt):
        return pa.string()
    raise TypeError(f"cannot join key types {lt} and {rt}")


def _key_shard(key: pa.ChunkedArray | pa.Array, P: int) -> np.ndarray:
    """Shard from the CAST key column (null -> shard 0; null keys never
    match anyway, they just need a deterministic home)."""
    import pyarrow.compute as pc

    t = key.type
    if pa.types.is_integer(t):
        vals = pc.fill_null(key, 0).to_numpy(zero_copy_only=False)
        return (vals.astype(np.int64) % P).astype(np.int64)
    from tiny_lingua_ray.models.train import fnv1a_64_batch

    vals = key.to_pylist()
    return (
        fnv1a_64_batch(["" if v is None else repr(v) for v in vals])
        % np.uint64(P)
    ).astype(np.int64)


def _out_dtypes(lschema: pa.Schema, rschema: pa.Schema, on: str,
                how: str, rre: dict) -> dict:
    """Deterministic output pandas dtypes (see module docstring)."""
    tgt = {}

    def base(t: pa.DataType):
        if pa.types.is_integer(t):
            return "int64"
        if pa.types.is_floating(t):
            return "float64"
        if pa.types.is_boolean(t):
            return "bool"
        return None  # leave as-is (strings, timestamps, lists)

    def resolve(b: str, nullable: bool):
        if not nullable:
            return b
        if b == "int64":
            return "float64"
        if b == "bool":
            return None  # NaN-able bools stay object
        return b

    l_nullable = how in ("right", "full")
    r_nullable = how in ("left", "full")
    for f in lschema:
        b = base(f.type)
        if b is None:
            continue
        t = resolve(b, l_nullable and f.name != on)
        if t is not None:
            tgt[f.name] = t
    if how not in ("semi", "anti"):
        for f in rschema:
            if f.name == on:
                continue
            b = base(f.type)
            if b is None:
                continue
            t = resolve(b, r_nullable)
            if t is not None:
                tgt[rre.get(f.name, f.name)] = t
    return tgt


def _apply_dtypes(df: pd.DataFrame, tgt: dict) -> pd.DataFrame:
    for c, t in tgt.items():
        if c in df.columns and str(df[c].dtype) != t:
            df[c] = df[c].astype(t)
    return df


def _merged_frame(ldf: pd.DataFrame, rdf: pd.DataFrame, on: str,
                  how: str, rre: dict) -> pd.DataFrame:
    # SQL semantics: a NULL key matches NOTHING (pandas would match
    # NaN to NaN) — null-key rows survive only as the unmatched side
    # of an outer join
    lnull = ldf[on].isna()
    rnull = rdf[on].isna()
    if how in ("semi", "anti"):
        keys = set(rdf.loc[~rnull, on].tolist())
        mask = ldf[on].isin(keys) & ~lnull
        return (ldf[mask] if how == "semi" else ldf[~mask]).copy()
    rdf = rdf.rename(columns=rre)
    out = ldf[~lnull].merge(
        rdf[~rnull], on=on, how="outer" if how == "full" else how
    )
    parts = [out]
    if how in ("left", "full") and lnull.any():
        parts.append(ldf[lnull])
    if how in ("right", "full") and rnull.any():
        parts.append(rdf[rnull])
    return pd.concat(parts, ignore_index=True) if len(parts) > 1 else out


def hash_join(left, right, on: str | None = None, how: str = "inner",
              broadcast_threshold: int = _DEFAULT_BROADCAST,
              num_shards: int = 32, left_on: str | None = None,
              right_on: str | None = None):
    """Join two Ray Datasets on one key column (``on``, or
    ``left_on``/``right_on`` when the sides name it differently — the
    output key keeps the LEFT name).  Returns a Dataset."""
    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError(f"unsupported join type: {how}")
    if on is None and (left_on is None or right_on is None):
        raise ValueError("pass on= or both left_on= and right_on=")
    lkey = left_on or on
    rkey = right_on or on
    on = lkey
    import ray

    def _to_pa(t):
        if isinstance(t, pa.DataType):
            return t
        if t is object or t is str:  # pandas-block string columns
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    ls, rs = left.schema(), right.schema()
    lschema = pa.schema(
        [(n, _to_pa(t)) for n, t in zip(ls.names, ls.types)]
    )
    # the right key is exposed under the LEFT key's name downstream
    rschema = pa.schema(
        [
            (on if n == rkey else n, _to_pa(t))
            for n, t in zip(rs.names, rs.types)
        ]
    )
    key_type = _promote_key(
        lschema.field(on).type, rschema.field(on).type
    )
    lschema = pa.schema(
        [(f.name, key_type if f.name == on else f.type) for f in lschema]
    )
    rschema = pa.schema(
        [(f.name, key_type if f.name == on else f.type) for f in rschema]
    )
    lcols = [f.name for f in lschema]
    rre = {
        f.name: f"r_{f.name}"
        for f in rschema
        if f.name != on and f.name in lcols
    }
    tgt = _out_dtypes(lschema, rschema, on, how, rre)

    try:
        rsize = right.size_bytes()
    except Exception:
        rsize = None
    can_broadcast = (
        rsize is not None
        and rsize <= broadcast_threshold
        and how in ("inner", "left", "semi", "anti")
    )

    if can_broadcast:

        def _prep_r(b: pa.Table) -> pa.Table:
            if rkey != on:
                b = b.rename_columns(
                    [on if c == rkey else c for c in b.column_names]
                )
            return b.set_column(
                b.column_names.index(on), on, b.column(on).cast(key_type)
            )

        rdf = right.map_batches(
            _prep_r, batch_format="pyarrow"
        ).to_pandas()  # bounded by broadcast_threshold
        r_ref = ray.put(rdf)

        from tiny_lingua_ray.tableutil import deref

        def bjoin(batch: pa.Table, *, r_ref) -> pa.Table:
            r = deref(r_ref)
            batch = batch.set_column(
                batch.column_names.index(on), on,
                batch.column(on).cast(key_type),
            )
            out = _merged_frame(batch.to_pandas(), r, on, how, rre)
            out = _apply_dtypes(out, tgt)
            return pa.Table.from_pandas(out, preserve_index=False)

        return left.map_batches(
            bjoin, fn_kwargs={"r_ref": r_ref}, batch_format="pyarrow"
        )

    # ---- shuffle cogroup ----
    P = num_shards
    rcols_out = [rre.get(f.name, f.name) for f in rschema]
    # ONE unified arrow schema: both sides pad the other's columns with
    # typed nulls, so union blocks never disagree on a field's type
    unified = pa.schema(
        [(f.name, f.type) for f in lschema]
        + [
            (rre.get(f.name, f.name), f.type)
            for f in rschema
            if rre.get(f.name, f.name) not in lcols
        ]
        + [("__side", pa.int8()), ("__shard", pa.int64())]
    )

    def tag(side: int, rename: dict):
        def f(batch: pa.Table) -> pa.Table:
            if side == 1 and rkey != on:
                batch = batch.rename_columns(
                    [on if c == rkey else c for c in batch.column_names]
                )
            if rename:
                batch = batch.rename_columns(
                    [rename.get(c, c) for c in batch.column_names]
                )
            n = batch.num_rows
            key = batch.column(on).cast(key_type)  # shard AFTER cast:
            # equal keys must co-locate regardless of source dtype
            cols = []
            for fld in unified:
                if fld.name == "__side":
                    cols.append(pa.array(np.full(n, side, np.int8)))
                elif fld.name == "__shard":
                    cols.append(pa.array(_key_shard(key, P)))
                elif fld.name in batch.column_names:
                    cols.append(batch.column(fld.name).cast(fld.type))
                else:
                    cols.append(pa.nulls(n, fld.type))
            return pa.table(dict(zip([f2.name for f2 in unified], cols)))

        return f

    empty = pa.Table.from_pandas(
        _apply_dtypes(
            pd.DataFrame(
                {
                    c: pd.Series([], dtype=object)
                    for c in (
                        lcols
                        if how in ("semi", "anti")
                        else lcols
                        + [c for c in rcols_out if c not in lcols]
                    )
                }
            ),
            tgt,
        ),
        preserve_index=False,
    )

    def merge_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        import pyarrow.compute as pc

        side = t.column("__side")
        # split at the ARROW level: each side's own columns carry no
        # padding nulls in its own rows, so ints convert to pandas as
        # int64 (no lossy float64 transit for values >= 2^53)
        ldf = t.filter(pc.equal(side, 0)).select(lcols).to_pandas()
        rdf = (
            t.filter(pc.equal(side, 1))
            .select(rcols_out)
            .rename_columns(
                [
                    {v: k for k, v in rre.items()}.get(c, c)
                    for c in rcols_out
                ]
            )
            .to_pandas()
        )
        out = _merged_frame(ldf, rdf, on, how, rre)
        out = _apply_dtypes(out, tgt)
        return pa.Table.from_pandas(out, preserve_index=False)

    tagged = left.map_batches(
        tag(0, {}), batch_format="pyarrow"
    ).union(right.map_batches(tag(1, rre), batch_format="pyarrow"))
    return tagged.groupby("__shard").map_groups(
        merge_shard, batch_format="pyarrow"
    )
