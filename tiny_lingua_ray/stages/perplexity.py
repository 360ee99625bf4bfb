"""Character-trigram perplexity scorer (stateful actor-pool stage).

North-rule component ("KenLM-style perplexity scorer").  Our n-gram model
tables already store P(c3 | c1 c2) for trigrams (relative frequency =
count(abc)/count(ab) — models/train.py), so the same packed per-language
tables double as the perplexity LM.  Scoring uses stupid backoff
(trigram -> bigram*ALPHA -> unigram*ALPHA^2 -> FLOOR) over every trigram
*occurrence* of the cleaned text (unlike language-ID, which dedups):

    PP(doc) = exp( -(1/N) * sum_i ln p(c_i | c_{i-2} c_{i-1}) )

Rows are grouped by ``pred_lang`` so each language's table is probed once
per batch (vectorized hash search).  Rows with pred_lang="unknown" (or a
language without a model) get perplexity NaN.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tiny_lingua_ray.detector import clean_up_input_text
from tiny_lingua_ray.languages import ALL_ISO1
from tiny_lingua_ray.models.loader import load_packed_models
from tiny_lingua_ray.models.train import default_models_dir, ensure_models, fnv1a_64

ALPHA = 0.4
LOG_ALPHA = float(np.log(ALPHA))
FLOOR_LOGP = float(np.log(1e-7))


class PerplexityScorer:
    """map_batches callable; appends float64 column ``perplexity``."""

    def __init__(
        self,
        models_dir: str | None = None,
        models_ref=None,
        languages: tuple[str, ...] = ALL_ISO1,
        text_column: str = "text",
        lang_column: str = "pred_lang",
        build_if_missing: bool = True,
    ):
        self.text_column = text_column
        self.lang_column = lang_column
        if models_ref is not None:
            import ray

            packed = ray.get(models_ref)
        else:
            from pathlib import Path

            mdir = Path(models_dir or default_models_dir())
            if build_if_missing:
                ensure_models(mdir, languages, use_ray=False)
            packed = load_packed_models(mdir, languages, orders="low")
        self.models = packed
        from tiny_lingua_ray.models.train import letter_run_pattern

        self.run_pat = letter_run_pattern()
        # per-language cache: ngram hash -> resolved backoff logp
        self._cache: dict[str, dict[str, float]] = {}

    def _trigram_occurrences(self, text: str) -> list[str]:
        cleaned = clean_up_input_text(text)
        out: list[str] = []
        for run in self.run_pat.findall(cleaned):
            for i in range(len(run) - 2):
                out.append(run[i : i + 3])
        return out

    def _resolve(self, lang: str, grams: list[str]) -> np.ndarray:
        """Backoff logp for each unique trigram of ``grams``'s vocabulary."""
        pm = self.models[lang]
        cache = self._cache.setdefault(lang, {})
        vals = np.empty(len(grams))
        missing_i = [i for i, g in enumerate(grams) if g not in cache]
        if missing_i:
            miss = [grams[i] for i in missing_i]
            V = len(miss)
            out = np.full(V, np.nan)
            penalty = 0.0
            for level in (3, 2, 1):
                unresolved = np.isnan(out)
                if not unresolved.any():
                    break
                idxs = np.nonzero(unresolved)[0]
                hashes = np.fromiter(
                    (fnv1a_64(miss[i][:level]) for i in idxs),
                    dtype=np.uint64,
                    count=len(idxs),
                )
                got = pm.lookup(hashes, level)
                hit = ~np.isnan(got)
                out[idxs[hit]] = got[hit] + penalty
                penalty += LOG_ALPHA
            out[np.isnan(out)] = FLOOR_LOGP
            for k, i in enumerate(missing_i):
                cache[grams[i]] = float(out[k])
        for i, g in enumerate(grams):
            vals[i] = cache[g]
        return vals

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        langs = batch.column(self.lang_column).to_pylist()
        R = len(texts)
        pp = np.full(R, np.nan)

        by_lang: dict[str, list[int]] = {}
        for r, l in enumerate(langs):
            if l in self.models:
                by_lang.setdefault(l, []).append(r)

        for lang, rows in by_lang.items():
            # build vocabulary + per-row occurrence ids
            vocab: dict[str, int] = {}
            order: list[str] = []
            concat: list[int] = []
            lens = np.zeros(len(rows), dtype=np.int64)
            for k, r in enumerate(rows):
                grams = self._trigram_occurrences(texts[r] or "")
                lens[k] = len(grams)
                for g in grams:
                    j = vocab.get(g)
                    if j is None:
                        j = len(vocab)
                        vocab[g] = j
                        order.append(g)
                    concat.append(j)
            if not order:
                continue
            logp = self._resolve(lang, order)
            G = logp[np.asarray(concat, dtype=np.int64)]
            row_ids = np.repeat(np.arange(len(rows)), lens)
            sums = np.bincount(row_ids, weights=G, minlength=len(rows))
            nz = lens > 0
            ppl = np.full(len(rows), np.nan)
            ppl[nz] = np.exp(-sums[nz] / lens[nz])
            for k, r in enumerate(rows):
                pp[r] = ppl[k]

        return batch.append_column("perplexity", pa.array(pp))
