"""Character-trigram perplexity scoring (KenLM-style stupid backoff).

North-rule component ("KenLM-style perplexity scorer").  Our n-gram model
tables already store P(c3 | c1 c2) for trigrams (relative frequency =
count(abc)/count(ab) — models/train.py), so the same packed per-language
tables double as the perplexity LM.  Scoring uses stupid backoff
(trigram -> bigram*ALPHA -> unigram*ALPHA^2 -> FLOOR) over every trigram
*occurrence* of the cleaned text (unlike language-ID, which dedups):

    PP(doc) = exp( -(1/N) * sum_i ln p(c_i | c_{i-2} c_{i-1}) )

Two entry points:
* ``TrigramBackoffResolver`` — reusable vectorized resolver (shared with
  the fused LangIdScorer path, stages/langid.py).
* ``PerplexityScorer`` — standalone map_batches actor stage reading
  ``pred_lang`` (rows grouped by language so each table is probed once
  per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tiny_lingua_ray.detector import clean_up_input_text
from tiny_lingua_ray.languages import ALL_ISO1
from tiny_lingua_ray.models.loader import PackedModel, load_packed_models
from tiny_lingua_ray.models.train import default_models_dir, ensure_models, fnv1a_64

ALPHA = 0.4
LOG_ALPHA = float(np.log(ALPHA))
FLOOR_LOGP = float(np.log(1e-7))


class TrigramBackoffResolver:
    """(lang, trigram) -> stupid-backoff log-prob, cached across batches."""

    def __init__(self, models: dict[str, PackedModel]):
        self.models = models
        self._cache: dict[str, dict[str, float]] = {}

    def resolve(self, lang: str, grams: list[str]) -> np.ndarray:
        pm = self.models[lang]
        cache = self._cache.setdefault(lang, {})
        vals = np.empty(len(grams))
        missing_i = [i for i, g in enumerate(grams) if g not in cache]
        if missing_i:
            miss = [grams[i] for i in missing_i]
            out = np.full(len(miss), np.nan)
            penalty = 0.0
            # chain-rule backoff keeps the SUFFIX context: P(c3|c1c2) ->
            # P(c3|c2) -> P(c3); our tables store exactly those
            # conditionals (count(abc)/count(ab), count(bc)/count(b),
            # count(c)/total).  (The langid backoff truncates the suffix
            # instead — that is a different, reference-mandated rule.)
            for level in (3, 2, 1):
                unresolved = np.isnan(out)
                if not unresolved.any():
                    break
                idxs = np.nonzero(unresolved)[0]
                hashes = np.fromiter(
                    (fnv1a_64(miss[i][3 - level :]) for i in idxs),
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

    def perplexities(
        self,
        rows_by_lang: dict[str, list[int]],
        trigrams_per_row: list[list[str]] | dict[int, list[str]],
        n_rows: int,
    ) -> np.ndarray:
        """Per-row perplexity; NaN for rows absent from rows_by_lang."""
        pp = np.full(n_rows, np.nan)
        for lang, rows in rows_by_lang.items():
            if lang not in self.models:
                continue
            vocab: dict[str, int] = {}
            order: list[str] = []
            concat: list[int] = []
            lens = np.zeros(len(rows), dtype=np.int64)
            for k, r in enumerate(rows):
                grams = trigrams_per_row[r]
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
            logp = self.resolve(lang, order)
            G = logp[np.asarray(concat, dtype=np.int64)]
            row_ids = np.repeat(np.arange(len(rows)), lens)
            sums = np.bincount(row_ids, weights=G, minlength=len(rows))
            nz = lens > 0
            ppl = np.full(len(rows), np.nan)
            ppl[nz] = np.exp(-sums[nz] / lens[nz])
            for k, r in enumerate(rows):
                pp[r] = ppl[k]
        return pp


def trigram_occurrences(cleaned: str, run_pat) -> list[str]:
    out: list[str] = []
    for run in run_pat.findall(cleaned):
        for i in range(len(run) - 2):
            out.append(run[i : i + 3])
    return out


class PerplexityScorer:
    """Standalone map_batches actor; appends float64 ``perplexity``."""

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

            payload = ray.get(models_ref)
            # quality_filter ships {'packed': models, 'cache': ...} when
            # ship_models='object_store' — unwrap like LangIdScorer does
            if isinstance(payload, dict) and "packed" in payload:
                packed = payload["packed"]
            else:
                packed = payload
        else:
            from pathlib import Path

            mdir = Path(models_dir or default_models_dir())
            if build_if_missing:
                ensure_models(mdir, languages, use_ray=False)
            packed = load_packed_models(mdir, languages, orders="low")
        self.resolver = TrigramBackoffResolver(packed)
        from tiny_lingua_ray.models.train import letter_run_pattern

        self.run_pat = letter_run_pattern()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        langs = batch.column(self.lang_column).to_pylist()
        R = len(texts)
        rows_by_lang: dict[str, list[int]] = {}
        grams_per_row: list[list[str]] = []
        for r, (t, l) in enumerate(zip(texts, langs)):
            if l in self.resolver.models:
                grams_per_row.append(
                    trigram_occurrences(
                        clean_up_input_text(t or ""), self.run_pat
                    )
                )
                rows_by_lang.setdefault(l, []).append(r)
            else:
                grams_per_row.append([])
        pp = self.resolver.perplexities(rows_by_lang, grams_per_row, R)
        return batch.append_column("perplexity", pa.array(pp))
