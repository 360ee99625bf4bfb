"""Gopher/C4-style heuristic quality rules (stateless map_batches stage).

North-rule component (BASELINE.json north_star: "Gopher/C4-style heuristic
quality rules").  Produces per-document quality metrics and a bitmask of
violated rules; the keep/drop decision consumes the mask.

Rules (public Gopher / C4 heuristics):
    bit 0  too few words            (< MIN_WORDS)
    bit 1  too many words           (> MAX_WORDS)
    bit 2  mean word length outside [MIN_MWL, MAX_MWL]
    bit 3  symbol ratio too high    (#, ..., !, $ etc. > MAX_SYMBOL_RATIO)
    bit 4  too few stopword hits    (< MIN_STOPWORD_HITS, Latin text only)
    bit 5  contains curly brace     (C4: code/JS leakage)
    bit 6  contains "lorem ipsum"   (C4)
    bit 7  contains "javascript"    (C4)
    bit 8  max single-word dominance (most frequent word > MAX_WORD_DOMINANCE)
    bit 9  alpha ratio too low      (letters/chars < MIN_ALPHA_RATIO)

All metrics are vectorized with numpy over the batch's codepoints.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from tiny_lingua_ray.fast_tables import batch_codepoints, letter_table

MIN_WORDS = 3
MAX_WORDS = 100_000
MIN_MWL = 1.5
MAX_MWL = 12.0
MAX_SYMBOL_RATIO = 0.12
MIN_STOPWORD_HITS = 1
MAX_WORD_DOMINANCE = 0.30
MIN_ALPHA_RATIO = 0.55

# small multilingual-ish stopword set (Gopher uses English function words)
STOPWORDS = frozenset(
    "the and of to a in is it that for on with as was at be this have "
    "de la le et les der die und el en un une du da el los las y o e "
    "il che di un en et je ne pas het een van"
    .split()
)

_SYMBOLS = frozenset("#$%&*+<=>@^|~!")
# ASCII \S+ (splits at ASCII whitespace only) — matches the RE2 semantics
# of the DuckDB oracle; Unicode whitespace does not split words
_WORD_RE = re.compile(r"\S+", re.ASCII)

FLAG_NAMES = (
    "too_few_words",
    "too_many_words",
    "mean_word_len",
    "symbol_ratio",
    "stopwords",
    "curly_brace",
    "lorem_ipsum",
    "javascript",
    "word_dominance",
    "alpha_ratio",
)


def quality_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    texts = batch.column(text_column).to_pylist()
    R = len(texts)
    n_chars = np.zeros(R, dtype=np.int64)
    n_words = np.zeros(R, dtype=np.int64)
    mean_wl = np.zeros(R, dtype=np.float64)
    sym_ratio = np.zeros(R, dtype=np.float64)
    alpha_ratio = np.zeros(R, dtype=np.float64)
    stop_hits = np.zeros(R, dtype=np.int64)
    dominance = np.zeros(R, dtype=np.float64)
    flags = np.zeros(R, dtype=np.int64)

    lt = letter_table()
    cps, offs = batch_codepoints([t or "" for t in texts])
    if len(cps):
        is_alpha = lt[cps]
        cum_a = np.concatenate(([0], np.cumsum(is_alpha)))
        sym_mask = np.isin(cps, np.fromiter((ord(c) for c in _SYMBOLS), dtype=np.uint32))
        cum_s = np.concatenate(([0], np.cumsum(sym_mask)))

    for r, t in enumerate(texts):
        t = t or ""
        L = len(t)
        n_chars[r] = L
        if L:
            a, b = offs[r], offs[r + 1]
            alpha = cum_a[b] - cum_a[a]
            alpha_ratio[r] = alpha / L
            sym_ratio[r] = (cum_s[b] - cum_s[a]) / L
        words = _WORD_RE.findall(t.lower())
        n_words[r] = len(words)
        if words:
            mean_wl[r] = sum(map(len, words)) / len(words)
            stop_hits[r] = sum(1 for w in words if w in STOPWORDS)
            counts: dict[str, int] = {}
            for w in words:
                counts[w] = counts.get(w, 0) + 1
            dominance[r] = max(counts.values()) / len(words)
        tl = t.lower()
        f = 0
        if n_words[r] < MIN_WORDS:
            f |= 1 << 0
        if n_words[r] > MAX_WORDS:
            f |= 1 << 1
        if words and not (MIN_MWL <= mean_wl[r] <= MAX_MWL):
            f |= 1 << 2
        if sym_ratio[r] > MAX_SYMBOL_RATIO:
            f |= 1 << 3
        if words and stop_hits[r] < MIN_STOPWORD_HITS and alpha_ratio[r] > 0.5:
            f |= 1 << 4
        if "{" in t or "}" in t:
            f |= 1 << 5
        if "lorem ipsum" in tl:
            f |= 1 << 6
        if "javascript" in tl:
            f |= 1 << 7
        if dominance[r] > MAX_WORD_DOMINANCE and n_words[r] >= 10:
            f |= 1 << 8
        if L and alpha_ratio[r] < MIN_ALPHA_RATIO:
            f |= 1 << 9
        flags[r] = f

    return (
        batch.append_column("n_words", pa.array(n_words))
        .append_column("mean_word_len", pa.array(mean_wl))
        .append_column("symbol_ratio", pa.array(sym_ratio))
        .append_column("alpha_ratio", pa.array(alpha_ratio))
        .append_column("stopword_hits", pa.array(stop_hits))
        .append_column("max_word_dominance", pa.array(dominance))
        .append_column("quality_flags", pa.array(flags))
    )
