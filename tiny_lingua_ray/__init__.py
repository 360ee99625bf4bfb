"""tiny_lingua_ray — a Ray-Data-native web-text quality-filter engine.

A brand-new engine (not a port) with the query/data-processing
capabilities of the reference (umaircha3/tiny-lingua): character
n-gram (1..5) log-probability language identification with rule-based
script/charset pre-filters, embedded in a web-scale quality-filter
pipeline (language ID + fastText-style fallback + perplexity scoring +
Gopher/C4 heuristic rules + regex PII/toxicity scrubbing) over Parquet
tables of Common-Crawl-style web pages.

Layout:
    languages.py        language table (scripts, unique chars) — reference
                        parity: api/Language.kt:178-273
    unicode_tables.py   pinned Unicode script ranges + char classes
    detector.py         pure-Python detector (no Ray) — the semantic core
    models/             n-gram model training / loading (Parquet tables)
    stages/             Ray Data map_batches stages (stateless + actor pools)
    sources/            corpus readers + deterministic synthetic cc_pages
    pipelines/          end-to-end Dataset pipelines (quality filter, reports)
    state/              checkpoint manifests / resume
"""

__version__ = "0.1.0"


def _install_empty_bundle_warning_filter() -> None:
    """Silence Ray's schema-divergence warning ONLY for untyped empty
    bundles (``new schema: .``).

    Ray's range-partitioning sort emits zero-row, zero-column blocks
    whenever the group-key cardinality is below the partition count
    (e.g. ``PARTITION BY lang`` with 5 languages over 32 sort ranges —
    inherent at test scale, vanishing at production scale), and
    ``map_groups`` forwards them because the UDF is never invoked for
    an empty block (ray/data/grouped_data.py ``_apply_udf_to_groups``
    iterates group boundaries, of which an empty block has none).  The
    noise is not reachable from user code; a genuine mismatch between
    two NAMED schemas still warns.

    Message text taken from Ray 2.49.2
    (streaming_executor_state.py) — a Ray upgrade that rewords it makes
    the filter a no-op (warnings reappear, nothing is hidden).  Set
    ``TLR_KEEP_RAY_SCHEMA_WARNINGS=1`` to skip installing it (ADVICE
    r4: the install is a global logging side effect of import).
    """
    import logging
    import os

    if os.environ.get("TLR_KEEP_RAY_SCHEMA_WARNINGS"):
        return

    class _DropEmptySchemaDivergence(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
            msg = record.getMessage()
            return not (
                "RefBundle with a different schema" in msg
                and "new schema: ." in msg
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_DropEmptySchemaDivergence())


_install_empty_bundle_warning_filter()
