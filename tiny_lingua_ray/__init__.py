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
