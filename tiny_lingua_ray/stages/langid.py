"""LangIdScorer — vectorized, stateful language-ID stage (actor pool).

The whole reference call chain (api/LanguageDetector.kt:221-286) becomes one
``map_batches`` stage: rules prefilter + n-gram log-probability scoring over
zero-copy Arrow batches.  Usage::

    ds.map_batches(LangIdScorer, fn_constructor_kwargs={...},
                   batch_format="pyarrow", batch_size=1024,
                   concurrency=N, num_cpus=1)

Scale design:
* models are loaded once per actor in ``__init__`` (reference: global
  JVM-wide model cache, LanguageDetector.kt:690-712); pass
  ``models_ref`` (a ``ray.put`` ObjectRef of packed models) to share ONE
  numpy copy per node across all actors (zero-copy object store reads).
* per-(ngram, language) backoff-resolved log-probabilities are cached
  across batches in the actor (the n-gram universe is small and heavy-tailed,
  so steady-state batches only fancy-index a cache matrix + reduceat).
* rows whose chars are plain Latin take a fully-vectorized fast path for the
  rule engine; rows with CJK/diacritic/non-Latin chars use the table-driven
  exact rule engine (``stages/fast_rules.py``, parity-tested against
  ``detector.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tiny_lingua_ray.detector import (
    CJK_PROBABILITY_FACTOR,
    HIGH_ACCURACY_MODE_MAX_TEXT_LENGTH,
    clean_up_input_text,
)
from tiny_lingua_ray.fast_tables import (
    SCRIPT_ID,
    batch_codepoints,
    letter_table,
    rule_special_table,
    script_id_table,
)
from tiny_lingua_ray.languages import (
    ALL_ISO1,
    LANGUAGES_BY_SCRIPT,
    LANGUAGES_SUPPORTING_LOGOGRAMS,
    RANK,
    UNKNOWN,
)
from tiny_lingua_ray.models.loader import PackedModel, load_packed_models
from tiny_lingua_ray.models.train import (
    default_models_dir,
    ensure_models,
    fnv1a_64_batch,
)

# lang_path codes (emitted per row for metrics / debugging)
PATH_EMPTY = 0      # cleaned text empty or letterless
PATH_RULE = 1       # resolved by detectLanguageWithRules
PATH_SINGLE = 2     # rule filtering left exactly one candidate
PATH_MODEL = 3      # n-gram model scoring
PATH_NOHIT = 4      # model scoring found no n-gram hits -> unknown

_LETTER_RUN_RE = None


def _letter_runs(cleaned: str):
    global _LETTER_RUN_RE
    if _LETTER_RUN_RE is None:
        from tiny_lingua_ray.models.train import letter_run_pattern

        _LETTER_RUN_RE = letter_run_pattern()
    return _LETTER_RUN_RE.findall(cleaned)


def extract_unique_ngrams(cleaned: str, n: int) -> list[str]:
    """Unique n-grams of the cleaned text (letter-only windows)."""
    seen: dict[str, None] = {}
    for run in _letter_runs(cleaned):
        for i in range(len(run) - n + 1):
            seen[run[i : i + n]] = None
    return list(seen)


class _ValueCache:
    """ngram -> float64[L] of backoff-resolved log-probs (0.0 = no hit).

    Two tiers: an optional read-only BASE (the precomputed resolved table
    shipped via ray.put / loaded from disk — covers every ngram any model
    knows) plus a small local overflow for ngrams first seen at query time.
    Base ids are [0, base_n); local ids continue from base_n.

    The base is indexed by a hash-sorted uint64 array (searchsorted on
    the mmap) — building a ~1M-entry Python dict per actor was a fixed
    init cost that depressed scaling efficiency at high concurrency.
    """

    def __init__(
        self,
        num_langs: int,
        base_hashes: np.ndarray | None = None,
        base_matrix: np.ndarray | None = None,
        base_col_map: np.ndarray | None = None,
    ):
        # base_col_map: when the scorer's language subset differs from the
        # base table's full language list, maps scorer column i -> base
        # column base_col_map[i] (per-language values are independent, so
        # a column slice of the full base is exactly the subset's table)
        if base_matrix is not None and base_hashes is not None:
            self.base_hashes = base_hashes  # sorted uint64, possibly mmap
            self.base_matrix = base_matrix
            self.base_n = len(base_hashes)
            self.dtype = base_matrix.dtype
        else:
            self.base_hashes = None
            self.dtype = np.dtype(np.float64)
            self.base_matrix = np.empty((0, num_langs), dtype=self.dtype)
            self.base_n = 0
        self.base_col_map = base_col_map
        self.index: dict[str, int] = {}
        self.matrix = np.empty((4096, num_langs), dtype=self.dtype)

    def rows_for(self, ngrams: list[str]) -> tuple[np.ndarray, list[str]]:
        """Indices for known ngrams (-1 for unknown) + the unknown list."""
        idx = np.full(len(ngrams), -1, dtype=np.int64)
        if self.base_n:
            hs = fnv1a_64_batch(ngrams)
            pos = np.searchsorted(self.base_hashes, hs)
            np.minimum(pos, self.base_n - 1, out=pos)
            found = np.asarray(self.base_hashes[pos]) == hs
            idx[found] = pos[found]
        missing: list[str] = []
        lget = self.index.get
        for i in np.nonzero(idx < 0)[0]:
            g = ngrams[i]
            j = lget(g)
            if j is None:
                missing.append(g)
            else:
                idx[i] = self.base_n + j
        return idx, missing

    def insert(self, ngrams: list[str], values: np.ndarray) -> np.ndarray:
        n0 = len(self.index)
        needed = n0 + len(ngrams)
        if needed > len(self.matrix):
            grow = max(needed, 2 * len(self.matrix))
            nm = np.empty((grow, self.matrix.shape[1]), dtype=self.dtype)
            nm[:n0] = self.matrix[:n0]
            self.matrix = nm
        self.matrix[n0:needed] = values
        for k, g in enumerate(ngrams):
            self.index[g] = n0 + k
        return np.arange(self.base_n + n0, self.base_n + needed, dtype=np.int64)

    def gather(
        self, ids: np.ndarray, col_idx: np.ndarray | None = None
    ) -> np.ndarray:
        """[len(ids), L] (or [len(ids), len(col_idx)]) values for mixed
        base/local ids.  Passing ``col_idx`` copies ONLY the candidate
        columns (np.ix_) — the gather+bincount loop is memory-bandwidth
        bound, so not materializing the non-candidate columns directly
        cuts the dominant traffic (e.g. 75 -> ~41 cols for Latin rows)."""
        ncols = self.matrix.shape[1] if col_idx is None else len(col_idx)
        out = np.empty((len(ids), ncols), dtype=self.dtype)
        mb = ids < self.base_n
        if mb.any():
            if self.base_col_map is None:
                bcols = col_idx
            else:
                bcols = (
                    self.base_col_map
                    if col_idx is None
                    else self.base_col_map[col_idx]
                )
            out[mb] = (
                self.base_matrix[ids[mb]]
                if bcols is None
                else self.base_matrix[np.ix_(ids[mb], bcols)]
            )
        ml = ~mb
        if ml.any():
            lid = ids[ml] - self.base_n
            out[ml] = (
                self.matrix[lid]
                if col_idx is None
                else self.matrix[np.ix_(lid, col_idx)]
            )
        return out


class LangIdScorer:
    """Callable class for ``map_batches`` (actor pool). Appends columns:

    * ``pred_lang``    string — iso-639-1 or "unknown" (min-relative-distance
                        and tie rules already applied, LanguageDetector.kt:119-133)
    * ``lang_margin``  float64 — top1-top2 confidence gap (NaN when <2 candidates)
    * ``lang_path``    uint8 — PATH_* code
    """

    def __init__(
        self,
        models_dir: str | None = None,
        models_ref=None,
        languages: tuple[str, ...] = ALL_ISO1,
        minimum_relative_distance: float = 0.0,
        low_accuracy: bool = False,
        text_column: str = "text",
        build_if_missing: bool = True,
        compute_perplexity: bool = False,
        emit_confidences: bool = False,
        emit_iso3: bool = False,
        value_dtype: str = "float32",
    ):
        # value_dtype: precision of the resolved-value gather/reduce hot
        # loop.  float32 (default) halves the dominant memory traffic.
        # Precision shape: within each n-gram level the per-row reduceat
        # sums accumulate in float32 (P.dtype); only the cross-level
        # `totals += S` accumulator is float64.  Float32 rounding thus
        # grows with document length; the parity suite pins 0 prediction
        # mismatches vs the pure float64 detector on short AND long
        # (multi-KB) documents.  Pass "float64" for bit-level value parity.
        self.value_dtype = (
            np.float32 if str(value_dtype) == "float32" else np.float64
        )
        # emit_confidences: opt-in full sorted confidence map per row
        # (list<struct<lang,conf>>), matching the reference's flagship
        # SortedMap<Language, Double> return (LanguageDetector.kt:191-215,
        # EnumDoubleMap.kt:91-121); off by default to keep the hot path lean.
        # emit_iso3: append pred_lang_iso3 (ISO-639-3, api/IsoCode639_3.kt).
        self.emit_confidences = emit_confidences
        self.emit_iso3 = emit_iso3
        self.languages = tuple(languages)
        self.lang_set = frozenset(languages)
        self.lang_idx = {l: i for i, l in enumerate(self.languages)}
        self.L = len(self.languages)
        self.mrd = minimum_relative_distance
        self.low_accuracy = low_accuracy
        self.text_column = text_column

        resolved_cache = None
        if models_ref is not None:
            import ray

            payload = ray.get(models_ref)
            if isinstance(payload, dict) and "packed" in payload:
                packed = payload["packed"]
                resolved_cache = payload.get("cache")
            else:
                packed = payload
        else:
            from pathlib import Path

            from tiny_lingua_ray.models.loader import load_resolved_cache

            # low-accuracy mode reads its own model artifacts (per-mode
            # training mixtures — models/train.py rationale)
            mdir = Path(
                models_dir or default_models_dir(low_mode=low_accuracy)
            )
            if build_if_missing:
                ensure_models(
                    mdir, self.languages, use_ray=False,
                    low_mode=low_accuracy,
                )
            packed = load_packed_models(mdir, self.languages)
            resolved_cache = load_resolved_cache(mdir)
        self.models: list[PackedModel] = [packed[l] for l in self.languages]
        self.compute_perplexity = compute_perplexity
        if compute_perplexity:
            from tiny_lingua_ray.stages.perplexity import TrigramBackoffResolver

            self.pp_resolver = TrigramBackoffResolver(
                {l: packed[l] for l in self.languages}
            )

        # rank array for declaration-order tie-breaks (EnumDoubleMap.kt:91-121)
        self.rank = np.array([RANK[l] for l in self.languages], dtype=np.int64)
        self.cjk_mask = np.array(
            [l in LANGUAGES_SUPPORTING_LOGOGRAMS for l in self.languages]
        )
        latin_langs = LANGUAGES_BY_SCRIPT.get("LATIN", frozenset())
        self.latin_mask = np.array(
            [l in latin_langs for l in self.languages]
        )
        self.all_mask = np.ones(self.L, dtype=bool)
        # filtered-set-of-one short-circuit (LanguageDetector.kt:239-241)
        # applies on the vectorized fast path too
        self.latin_single: str | None = (
            self.languages[int(np.nonzero(self.latin_mask)[0][0])]
            if self.latin_mask.sum() == 1
            else None
        )
        self.all_single: str | None = (
            self.languages[0] if self.L == 1 else None
        )

        self.script_table = script_id_table()
        self.letter_table = letter_table()
        self.special_table = rule_special_table()
        self.latin_id = SCRIPT_ID["LATIN"]

        # Warm caches from the precomputed resolved table when it covers
        # this scorer's languages (base tier is read-only, possibly
        # object-store-shared).  A SUBSET of the base languages attaches
        # via a column map — per-language values are independent, so a
        # column slice of the full base is exactly the subset's table;
        # without this, every subset-configured actor re-resolved from
        # scratch (cold-init cost the full-set path had already removed).
        cache_langs = (
            list(resolved_cache["languages"]) if resolved_cache else []
        )
        if (
            resolved_cache is not None
            and "hash" in resolved_cache
            and set(self.languages) <= set(cache_langs)
        ):
            if cache_langs == list(self.languages):
                col_map = None
            else:
                pos_of = {l: i for i, l in enumerate(cache_langs)}
                col_map = np.array(
                    [pos_of[l] for l in self.languages], dtype=np.int64
                )
            # NOTE: matrix may be an mmap — do NOT copy it (page-cache
            # sharing across every worker process on the node)
            base_matrix = (
                resolved_cache["matrix32"]
                if self.value_dtype == np.float32
                and resolved_cache.get("matrix32") is not None
                else resolved_cache["matrix"]
            )
            # prefault the (possibly mmap'd) table sequentially once —
            # random first-touch during scoring is far slower
            float(np.asarray(base_matrix[:: max(1, len(base_matrix) // 65536)]).sum())
            self.value_cache = _ValueCache(
                self.L,
                base_hashes=resolved_cache["hash"],
                base_matrix=base_matrix,
                base_col_map=col_map,
            )
            # unigram union table: searchsorted index; a miss means the
            # unigram is absent from EVERY model (all-False), no probing
            self.uni_hashes = resolved_cache["uni_hash"]
            self.uni_base = (
                resolved_cache["uni_matrix"]
                if col_map is None
                # tiny (unigrams x langs) — materialize the column slice
                else np.ascontiguousarray(
                    np.asarray(resolved_cache["uni_matrix"])[:, col_map]
                )
            )
            self.uni_hit_cache: dict[str, np.ndarray] = {}
        else:
            self.value_cache = _ValueCache(self.L)
            self.uni_hashes = None
            self.uni_base = None
            self.uni_hit_cache = {}

        from tiny_lingua_ray.stages.fast_rules import FastRules

        self.fast_rules = FastRules(self.lang_set)

    # ------------------------------------------------------------------ #

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        R = len(texts)
        pred = np.full(R, "", dtype=object)
        margin = np.full(R, np.nan)
        path = np.zeros(R, dtype=np.uint8)

        cleaned_list: list[str] = [
            clean_up_input_text(t) if t is not None else "" for t in texts
        ]

        # --- vectorized letterless check over the cleaned concat ---------
        cps, offs = batch_codepoints(cleaned_list)
        if len(cps):
            is_letter = self.letter_table[cps]
            cum = np.concatenate(([0], np.cumsum(is_letter)))
            letters_per_row = cum[offs[1:]] - cum[offs[:-1]]
        else:
            letters_per_row = np.zeros(R)
        has_letter = letters_per_row > 0
        empty_rows = ~has_letter

        # --- rules: fast path (plain Latin) vs exact per-row -------------
        raw_cps, raw_offs = batch_codepoints(
            [t if t is not None else "" for t in texts]
        )
        special = self.special_table[raw_cps] if len(raw_cps) else np.zeros(0, bool)
        if len(raw_cps):
            cums = np.concatenate(([0], np.cumsum(special)))
            special_per_row = cums[raw_offs[1:]] - cums[raw_offs[:-1]]
        else:
            special_per_row = np.zeros(R)

        # cand_mask[r] = boolean over self.languages (candidates after rules)
        cand_mask = np.zeros((R, self.L), dtype=bool)
        resolved_by_rules = np.zeros(R, dtype=bool)

        if len(raw_cps):
            scripts_all = self.script_table[raw_cps]
            is_lat = scripts_all == self.latin_id
            is_space = raw_cps == 0x20
            bad = ~is_lat & ~is_space
            cumb = np.concatenate(([0], np.cumsum(bad)))
            cuml = np.concatenate(([0], np.cumsum(is_lat)))

        for r in range(R):
            if empty_rows[r]:
                pred[r] = UNKNOWN
                path[r] = PATH_EMPTY
                continue
            raw = texts[r]
            if special_per_row[r] == 0:
                # fast path: rule detection = unknown (all words vote
                # UNKNOWN); filtering = Latin langs if any all-Latin word
                # else all langs (see rule_special_table docstring).
                a, b = raw_offs[r], raw_offs[r + 1]
                if self._has_all_latin_word(raw, a, b, cumb, cuml):
                    if self.latin_single is not None:
                        pred[r] = self.latin_single
                        path[r] = PATH_SINGLE
                        resolved_by_rules[r] = True
                        continue
                    cand_mask[r] = self.latin_mask
                else:
                    if self.all_single is not None:
                        pred[r] = self.all_single
                        path[r] = PATH_SINGLE
                        resolved_by_rules[r] = True
                        continue
                    cand_mask[r] = self.all_mask
            else:
                a, b = raw_offs[r], raw_offs[r + 1]
                cps_row = raw_cps[a:b]
                scr_row = scripts_all[a:b]
                spans = self.fast_rules.word_spans(cps_row, scr_row)
                rule_lang = self.fast_rules.detect_with_rules(
                    cps_row, scr_row, spans
                )
                if rule_lang != UNKNOWN:
                    pred[r] = rule_lang
                    path[r] = PATH_RULE
                    resolved_by_rules[r] = True
                    continue
                filtered = self.fast_rules.filter_by_rules(
                    cps_row, scr_row, spans
                )
                if len(filtered) == 1:
                    pred[r] = next(iter(filtered))
                    path[r] = PATH_SINGLE
                    resolved_by_rules[r] = True
                    continue
                for l in filtered:
                    cand_mask[r, self.lang_idx[l]] = True

        # --- model scoring ------------------------------------------------
        todo = ~empty_rows & ~resolved_by_rules
        if self.low_accuracy:
            short_bad = np.array(
                [len(c) < 3 for c in cleaned_list], dtype=bool
            )
            drop = todo & short_bad
            pred[drop] = UNKNOWN
            path[drop] = PATH_NOHIT
            todo &= ~short_bad

        conf_rows: list | None = (
            [[] for _ in range(R)] if self.emit_confidences else None
        )
        idx_todo = np.nonzero(todo)[0]
        if len(idx_todo):
            self._score_rows(
                idx_todo, cleaned_list, cand_mask, pred, margin, path,
                conf_rows,
            )

        out = (
            batch.append_column("pred_lang", pa.array(pred.tolist(), pa.string()))
            .append_column("lang_margin", pa.array(margin))
            .append_column("lang_path", pa.array(path, pa.uint8()))
        )
        if conf_rows is not None:
            # rule-resolved rows return the single language at 1.0
            # (LanguageDetector.kt:231-242 short-circuits)
            for r in range(R):
                if path[r] in (PATH_RULE, PATH_SINGLE):
                    conf_rows[r] = [{"lang": pred[r], "conf": 1.0}]
            out = out.append_column(
                "confidence_values",
                pa.array(
                    conf_rows,
                    pa.list_(
                        pa.struct(
                            [("lang", pa.string()), ("conf", pa.float64())]
                        )
                    ),
                ),
            )
        if self.emit_iso3:
            from tiny_lingua_ray.languages import ISO3_BY_ISO1

            out = out.append_column(
                "pred_lang_iso3",
                pa.array(
                    [ISO3_BY_ISO1.get(l, "none") for l in pred.tolist()],
                    pa.string(),
                ),
            )
        if self.compute_perplexity:
            # fused perplexity pass reusing the cleaned texts (one actor
            # pool holds both roles -> one model copy, one batch pass)
            from tiny_lingua_ray.stages.perplexity import trigram_occurrences

            from tiny_lingua_ray.models.train import letter_run_pattern

            pat = letter_run_pattern()
            rows_by_lang: dict[str, list[int]] = {}
            grams_per_row: list[list[str]] = []
            for r in range(R):
                l = pred[r]
                if l in self.pp_resolver.models:
                    grams_per_row.append(
                        trigram_occurrences(cleaned_list[r], pat)
                    )
                    rows_by_lang.setdefault(l, []).append(r)
                else:
                    grams_per_row.append([])
            pp = self.pp_resolver.perplexities(rows_by_lang, grams_per_row, R)
            out = out.append_column("perplexity", pa.array(pp))
        return out

    # ------------------------------------------------------------------ #

    @staticmethod
    def _has_all_latin_word(raw, a, b, cumb, cuml) -> bool:
        # any space-delimited token in raw[a:b] with >=1 Latin char and no
        # non-Latin non-space char
        start = a
        s = raw
        for i in range(a, b):
            if s[i - a] == " ":
                if start < i and cumb[i] - cumb[start] == 0 and cuml[i] - cuml[start] > 0:
                    return True
                start = i + 1
        return start < b and cumb[b] - cumb[start] == 0 and cuml[b] - cuml[start] > 0

    def _resolve_low(self, ngrams: list[str], n: int) -> np.ndarray:
        """Cache row ids for 1-3-gram backoff-resolved logp vectors."""
        ids, missing = self.value_cache.rows_for(ngrams)
        if missing:
            V = len(missing)
            vals = np.full((V, self.L), np.nan)
            # probe level n down to 1; first hit wins (Ngram.kt:44-52 —
            # truncate the suffix, keep the prefix)
            for level in range(n, 0, -1):
                hashes = fnv1a_64_batch([g[:level] for g in missing])
                for li, pm in enumerate(self.models):
                    col = vals[:, li]
                    unresolved = np.isnan(col)
                    if not unresolved.any():
                        continue
                    got = pm.lookup(hashes[unresolved], level)
                    col[unresolved] = got
            np.nan_to_num(vals, copy=False)  # no hit at any level -> 0.0
            new_ids = self.value_cache.insert(missing, vals)
            ids[ids < 0] = new_ids
        return ids

    def _values_for(
        self, ngrams: list[str], n: int, col_idx: np.ndarray | None = None
    ) -> np.ndarray:
        """Backoff-resolved values for this batch's n-gram vocab:
        [V, L] when ``col_idx`` is None, else [V, len(col_idx)] holding
        ONLY the candidate columns (in col_idx order) — the cache rows
        are never materialized for non-candidate languages.

        n<=3: via the (base + local) cache.  n>=4: resolved directly per
        batch — start from the cached 3-gram-prefix values (which already
        encode the 3->2->1 backoff) and override where the 5/4-gram tables
        hit; 4/5-grams are NOT cached (their vocabulary never saturates,
        so caching them was pure overhead)."""
        if n <= 3:
            return self.value_cache.gather(
                self._resolve_low(ngrams, n), col_idx
            )
        prefix3 = [g[:3] for g in ngrams]
        ids3 = self._resolve_low(prefix3, 3)
        vals = self.value_cache.gather(ids3, col_idx)  # copy -> writable
        langs = (
            range(self.L) if col_idx is None else [int(c) for c in col_idx]
        )
        decided = np.zeros(vals.shape, dtype=bool)
        for level in range(n, 3, -1):
            hashes = fnv1a_64_batch([g[:level] for g in ngrams])
            for pos, li in enumerate(langs):
                pm = self.models[li]
                got = pm.lookup(hashes, level)
                hit = ~np.isnan(got) & ~decided[:, pos]
                vals[hit, pos] = got[hit]
                decided[hit, pos] = True
        return vals

    def _unigram_hits(self, ngrams: list[str]) -> np.ndarray:
        """bool[V, L]: exact unigram presence (J2, no backoff)."""
        if self.uni_hashes is not None and len(self.uni_hashes):
            hs = fnv1a_64_batch(ngrams)
            pos = np.searchsorted(self.uni_hashes, hs)
            np.minimum(pos, len(self.uni_hashes) - 1, out=pos)
            found = np.asarray(self.uni_hashes[pos]) == hs
            out = np.zeros((len(ngrams), self.L), dtype=bool)
            if found.any():
                out[found] = self.uni_base[pos[found]]
            return out
        out = np.empty((len(ngrams), self.L), dtype=bool)
        missing_idx = [
            i for i, g in enumerate(ngrams) if g not in self.uni_hit_cache
        ]
        if missing_idx:
            miss = [ngrams[i] for i in missing_idx]
            hashes = fnv1a_64_batch(miss)
            vals = np.empty((len(miss), self.L), dtype=bool)
            for li, pm in enumerate(self.models):
                vals[:, li] = ~np.isnan(pm.lookup(hashes, 1))
            for g, row in zip(miss, vals):
                self.uni_hit_cache[g] = row
        for i, g in enumerate(ngrams):
            out[i] = self.uni_hit_cache[g]
        return out

    def _score_group(
        self, ks, idx_todo, cleaned_list, col_idx,
        totals, uni_counts, s1_nonzero,
    ):
        """Score one candidate-mask group over its language columns only."""
        long_rows = []
        short_rows = []
        for k in ks:
            cl = cleaned_list[idx_todo[k]]
            if len(cl) >= HIGH_ACCURACY_MODE_MAX_TEXT_LENGTH or self.low_accuracy:
                long_rows.append(k)
            else:
                short_rows.append(k)
        cjk_sub = self.cjk_mask[col_idx]

        for n in range(1, 6):
            rows_n = (
                long_rows if n == 3 else []
            ) + (
                [k for k in short_rows if len(cleaned_list[idx_todo[k]]) >= n]
            )
            if not rows_n:
                continue
            vocab: dict[str, int] = {}
            concat_ids: list[int] = []
            offsets = [0]
            order: list[str] = []
            for k in rows_n:
                ngs = extract_unique_ngrams(cleaned_list[idx_todo[k]], n)
                for g in ngs:
                    j = vocab.get(g)
                    if j is None:
                        j = len(vocab)
                        vocab[g] = j
                        order.append(g)
                    concat_ids.append(j)
                offsets.append(len(concat_ids))

            if not order:
                continue
            concat = np.asarray(concat_ids, dtype=np.int64)
            lens = np.diff(offsets)
            keep = np.nonzero(lens > 0)[0]
            if len(keep) == 0:
                continue
            nkeep = len(keep)
            ncols = len(col_idx)
            # concat_ids were appended row by row, so kept-row segments
            # tile `concat` contiguously: add.reduceat over the segment
            # starts sums each row WITHOUT the float64 weight conversion
            # np.bincount forces (keeps the float32 hot path narrow)
            starts = np.asarray(offsets[:-1], dtype=np.int64)[keep]
            # batch-vocab values (candidate columns only), then COLUMN-wise
            # expand+reduceat: avoids materializing a [C, L] matrix (large
            # fresh allocations are pathologically slow on this host)
            P = np.asfortranarray(self._values_for(order, n, col_idx))
            S = np.empty((nkeep, ncols), dtype=P.dtype)
            for ci in range(ncols):
                S[:, ci] = np.add.reduceat(P[:, ci][concat], starts)

            # CJK factor per (lang, n) partial sum (LanguageDetector.kt:565-574)
            neg = S < 0
            S = np.where(neg & cjk_sub[None, :], S * CJK_PROBABILITY_FACTOR, S)
            S = np.where(neg, S, 0.0)  # only negative sums contribute

            krows = np.asarray(rows_n, dtype=np.int64)[keep]
            totals[np.ix_(krows, col_idx)] += S

            if n == 1:
                Hm = np.asfortranarray(
                    self._unigram_hits(order)[:, col_idx].astype(np.int32)
                )
                C = np.empty((nkeep, ncols), dtype=np.int64)
                for ci in range(ncols):
                    C[:, ci] = np.add.reduceat(Hm[:, ci][concat], starts)
                uni_counts[np.ix_(krows, col_idx)] = C
                s1_nonzero[np.ix_(krows, col_idx)] = neg

    def _score_rows(
        self, idx_todo, cleaned_list, cand_mask, pred, margin, path,
        conf_rows=None,
    ):
        R = len(idx_todo)
        totals = np.zeros((R, self.L), dtype=np.float64)
        uni_counts = np.zeros((R, self.L), dtype=np.int64)
        s1_nonzero = np.zeros((R, self.L), dtype=bool)

        # Group rows by candidate-language mask: the expand+bincount cost is
        # O(occurrences x languages), and rule filtering typically leaves
        # few candidates for non-Latin scripts (Cyrillic 8, Arabic 3, ...),
        # so scoring each group over only its candidate columns cuts the
        # dominant memory traffic substantially.
        mask_groups: dict[bytes, list[int]] = {}
        for k, r in enumerate(idx_todo):
            mask_groups.setdefault(
                np.asarray(cand_mask[r]).tobytes(), []
            ).append(k)
        for mask_key, ks in mask_groups.items():
            col_idx = np.nonzero(np.frombuffer(mask_key, dtype=bool))[0]
            if len(col_idx) == 0:
                continue
            self._score_group(
                ks, idx_todo, cleaned_list, col_idx,
                totals, uni_counts, s1_nonzero,
            )

        # unigram normalization (LanguageDetector.kt:344-362):
        # count only languages with nonzero n=1 probability sum (or all
        # candidates when none is nonzero); then totals /= count.
        any_s1 = s1_nonzero.any(axis=1)
        count_mask = np.where(any_s1[:, None], s1_nonzero, cand_mask[idx_todo])
        eff_counts = np.where(count_mask, uni_counts, 0)
        divisor = np.where(eff_counts > 0, eff_counts, 1)
        totals = totals / divisor

        # candidate masking + confidence (A3)
        totals = np.where(cand_mask[idx_todo], totals, 0.0)
        nonzero = totals != 0.0
        has_any = nonzero.any(axis=1)

        masked = np.where(nonzero, totals, -np.inf)
        highest = masked.max(axis=1)  # least negative
        with np.errstate(divide="ignore", invalid="ignore"):
            conf = np.where(nonzero, highest[:, None] / totals, -np.inf)

        # top-2 with declaration-order tie-break (lexsort on -conf, rank)
        for k in range(R):
            r = idx_todo[k]
            if not has_any[k]:
                pred[r] = UNKNOWN
                path[r] = PATH_NOHIT
                continue
            row_conf = conf[k]
            cand = np.nonzero(nonzero[k])[0]
            if conf_rows is not None:
                # full sorted map (desc, declaration-rank tie-break) —
                # EnumDoubleMap.kt:91-121
                order = cand[np.lexsort((self.rank[cand], -row_conf[cand]))]
                conf_rows[r] = [
                    {"lang": self.languages[int(c)], "conf": float(row_conf[c])}
                    for c in order
                ]
            if len(cand) == 1:
                pred[r] = self.languages[cand[0]]
                path[r] = PATH_MODEL
                continue
            sub = cand[np.lexsort((self.rank[cand], -row_conf[cand]))]
            best, second = sub[0], sub[1]
            m = row_conf[best] - row_conf[second]
            margin[r] = m
            path[r] = PATH_MODEL
            if row_conf[best] == row_conf[second] or m < self.mrd:
                pred[r] = UNKNOWN
            else:
                pred[r] = self.languages[best]
