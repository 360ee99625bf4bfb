"""Regex PII / toxicity scrubbing (stateless map_batches stage).

North-rule component ("regex-based PII/toxicity scrubbing").  Patterns are
compiled once at module import (cheap module-level state — the stage stays
a stateless task).  Patterns deliberately use the syntax subset common to
Python ``re`` and RE2 so the DuckDB oracle can reproduce them exactly
(``__ray_entry__.oracle_sql``).

Output columns:
    text_scrubbed  string — text with PII replaced by typed tokens
    pii_count      int64  — number of replacements
    tox_count      int64  — toxicity-lexicon hits (word-boundary matches)
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# (token, pattern) — order matters: more specific first. RE2-compatible.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<IP>", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("<SSN>", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("<CARD>", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b"),
    ("<PHONE>", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
)

# tiny illustrative toxicity lexicon (word-boundary, case-insensitive)
TOXICITY_WORDS: tuple[str, ...] = ("idiot", "stupid", "moron", "hate you")

# re.ASCII: \d and \b must mean what RE2/DuckDB mean (ASCII digits/word
# chars), or the oracle SQL in pipelines/queries.py diverges on rows with
# non-ASCII digits
_COMPILED_PII = [(tok, re.compile(pat, re.ASCII)) for tok, pat in PII_PATTERNS]
_TOX_RE = re.compile(
    r"\b(?:" + "|".join(re.escape(w) for w in TOXICITY_WORDS) + r")\b",
    re.IGNORECASE | re.ASCII,
)


def scrub_text(text: str) -> tuple[str, int, int]:
    n_pii = 0
    for tok, pat in _COMPILED_PII:
        text, k = pat.subn(tok, text)
        n_pii += k
    n_tox = len(_TOX_RE.findall(text))
    return text, n_pii, n_tox


def scrub_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    texts = batch.column(text_column).to_pylist()
    out, pii, tox = [], np.zeros(len(texts), np.int64), np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        s, p, x = scrub_text(t or "")
        out.append(s)
        pii[i] = p
        tox[i] = x
    return (
        batch.append_column("text_scrubbed", pa.array(out, pa.string()))
        .append_column("pii_count", pa.array(pii))
        .append_column("tox_count", pa.array(tox))
    )
