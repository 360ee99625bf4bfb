"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry and its DuckDB oracle on the same sf dir and
compares row count, schema (sorted column names) and an order-insensitive
value hash.  Usage::

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canonical_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif str(col.dtype).startswith("float"):
            # 17 significant digits round-trips float64 exactly, so this
            # local gate is at least as strict as the driver's hash (the
            # old %.9g masked last-ulp divergences the driver catches).
            df[c] = col.map(lambda v: f"{v:.17g}")
        else:
            df[c] = col.astype(str)
    rows = sorted("\x01".join(r) for r in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "surrogatepass"))
        h.update(b"\x00")
    return h.hexdigest()[:16]


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: ray error {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows={len(ours)} (rows-only) [{dt:.1f}s]")
            continue
        try:
            theirs = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {e}")
            failures += 1
            continue
        problems = []
        if len(ours) != len(theirs):
            problems.append(f"rows {len(ours)} != {len(theirs)}")
        if sorted(ours.columns) != sorted(theirs.columns):
            problems.append(
                f"schema {sorted(ours.columns)} != {sorted(theirs.columns)}"
            )
        else:
            h1, h2 = canonical_hash(ours), canonical_hash(theirs)
            if h1 != h2:
                problems.append(f"hash {h1} != {h2}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{dt:.1f}s]")
            mine = ours[sorted(ours.columns)]
            if sorted(ours.columns) == sorted(theirs.columns):
                orc = theirs[sorted(theirs.columns)]
                key = sorted(ours.columns)[0]
                mine = mine.sort_values(key).reset_index(drop=True)
                orc = orc.sort_values(key).reset_index(drop=True)
                print("  ours:  ", mine.head(3).to_dict("records"))
                print("  oracle:", orc.head(3).to_dict("records"))
            failures += 1
        else:
            print(f"OK    {name}: rows={len(ours)} hash match [{dt:.1f}s]")

    ray.shutdown()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
