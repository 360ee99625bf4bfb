"""Load model tables into the two runtime forms.

* ``load_dict_models``  — {lang: {ngram: float32 freq}} for the pure-Python
  detector (reference: hash-map re-materialization path,
  api/LanguageDetectorBuilder.kt:140-143).
* ``load_packed_models`` — per-language sorted uint64-hash arrays +
  float64 log-frequencies for the vectorized batch scorer
  (reference: binary-search lookups, lookup/UniBiTrigramLookup.kt:18-55).
  Numpy arrays are zero-copy shareable through the Ray object store, so a
  node holds ONE copy regardless of actor count.

Mirrors the reference's lazy quadri/fivegram split
(api/LanguageDetector.kt:683-712): ``orders="low"`` loads only the 1–3-gram
tables (the only ones the ≥120-char web-text fast path touches).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

from tiny_lingua_ray.languages import ALL_ISO1


@dataclass
class PackedModel:
    """One language's lookup: hashes sorted ascending, parallel logfreqs."""

    low_hash: np.ndarray    # uint64, sorted — ngrams n<=3
    low_logp: np.ndarray    # float64
    high_hash: np.ndarray   # uint64, sorted — ngrams n>=4 (may be empty)
    high_logp: np.ndarray   # float64

    def lookup(self, hashes: np.ndarray, n: int) -> np.ndarray:
        """Vectorized exact probe: logfreq per hash, NaN when absent."""
        h_arr = self.low_hash if n <= 3 else self.high_hash
        p_arr = self.low_logp if n <= 3 else self.high_logp
        out = np.full(len(hashes), np.nan)
        if len(h_arr) == 0:
            return out
        idx = np.searchsorted(h_arr, hashes)
        idx_c = np.minimum(idx, len(h_arr) - 1)
        hit = h_arr[idx_c] == hashes
        out[hit] = p_arr[idx_c[hit]]
        return out


def _read(path: Path, columns):
    return pq.read_table(path, columns=columns)


def load_dict_models(
    models_dir: Path,
    languages=ALL_ISO1,
    orders: str = "all",
) -> dict[str, dict[str, float]]:
    models: dict[str, dict[str, float]] = {}
    for lang in languages:
        d: dict[str, float] = {}
        files = ["low.parquet"] + (["high.parquet"] if orders == "all" else [])
        for f in files:
            t = _read(models_dir / lang / f, ["ngram", "freq"])
            ngrams = t.column("ngram").to_pylist()
            freqs = t.column("freq").to_numpy()
            for g, fr in zip(ngrams, freqs):
                d[g] = float(fr)
        models[lang] = d
    return models


def resolve_backoff_values(
    models: list[PackedModel], ngrams: list[str]
) -> np.ndarray:
    """[V, L] backoff-resolved log-freqs (0.0 = no hit at any order) for a
    mixed-length ngram list (J1 semantics: truncate suffix, keep prefix)."""
    from tiny_lingua_ray.models.train import fnv1a_64

    L = len(models)
    out = np.zeros((len(ngrams), L))
    by_len: dict[int, list[int]] = {}
    for i, g in enumerate(ngrams):
        by_len.setdefault(len(g), []).append(i)
    for n, idxs in by_len.items():
        sub = [ngrams[i] for i in idxs]
        vals = np.full((len(sub), L), np.nan)
        for level in range(n, 0, -1):
            hashes = np.fromiter(
                (fnv1a_64(g[:level]) for g in sub),
                dtype=np.uint64,
                count=len(sub),
            )
            for li, pm in enumerate(models):
                col = vals[:, li]
                unresolved = np.isnan(col)
                if not unresolved.any():
                    continue
                col[unresolved] = pm.lookup(hashes[unresolved], level)
        np.nan_to_num(vals, copy=False)
        out[np.asarray(idxs)] = vals
    return out


def unigram_hit_matrix(
    models: list[PackedModel], unigrams: list[str]
) -> np.ndarray:
    """bool [V, L]: exact unigram presence (J2, no backoff)."""
    from tiny_lingua_ray.models.train import fnv1a_64

    hashes = np.fromiter(
        (fnv1a_64(g) for g in unigrams), dtype=np.uint64, count=len(unigrams)
    )
    out = np.empty((len(unigrams), len(models)), dtype=bool)
    for li, pm in enumerate(models):
        out[:, li] = ~np.isnan(pm.lookup(hashes, 1))
    return out


# v2: packed high tier was empty in v1
# v3: rows sorted by ngram FNV hash + hash index arrays — actors look up
#     via vectorized searchsorted on the mmap instead of each building a
#     ~1M-entry Python dict at init (per-actor fixed cost hurt scaling)
RESOLVED_CACHE_DIR = "resolved_cache_v3"


def _save_npy(path: Path, arr: np.ndarray) -> None:
    import os

    tmp = Path(f"{path}.{os.getpid()}.tmp")
    with open(tmp, "wb") as f:
        np.save(f, arr)
    os.replace(tmp, path)


def build_resolved_cache(models_dir: Path, languages=ALL_ISO1) -> Path:
    """Precompute the backoff-resolved (ngram x language) value table for
    every 1-3-gram in any language's model — the warmed scorer cache that
    actors share via ray.put instead of each re-resolving from scratch
    (this cold work was the scaling bottleneck at high concurrency)."""
    import pyarrow.parquet as pq

    out_dir = Path(models_dir) / RESOLVED_CACHE_DIR
    if (out_dir / "languages.npy").exists() and (
        out_dir / "packed_low_hash.npy"
    ).exists():
        try:
            langs = np.load(out_dir / "languages.npy", allow_pickle=False)
            if list(langs) == list(languages):
                if not (out_dir / "matrix32.npy").exists():
                    # upgrade a pre-float32-twin cache ONCE, driver-side
                    # (ensure_models runs here before any actor pool
                    # spawns).  Deriving lazily in load_resolved_cache
                    # made every cold worker materialize the full float64
                    # matrix in RAM and write its own copy concurrently.
                    _save_npy(
                        out_dir / "matrix32.npy",
                        np.load(
                            out_dir / "matrix.npy", allow_pickle=False
                        ).astype(np.float32),
                    )
                return out_dir
        except (OSError, ValueError):
            pass
    out_dir.mkdir(parents=True, exist_ok=True)

    union: dict[str, None] = {}
    for lang in languages:
        t = pq.read_table(
            Path(models_dir) / lang / "low.parquet", columns=["ngram"]
        )
        for g in t.column("ngram").to_pylist():
            union[g] = None
    ngrams = list(union)
    # orders="all": the concatenated packed tables below must include the
    # 4/5-gram tier (loading "low" here once silently produced empty high
    # tables for every fast-path consumer)
    packed = load_packed_models(Path(models_dir), languages, orders="all")
    models = [packed[l] for l in languages]
    matrix = resolve_backoff_values(models, ngrams)
    unigrams = [g for g in ngrams if len(g) == 1]
    uni_matrix = unigram_hit_matrix(models, unigrams)

    from tiny_lingua_ray.models.train import fnv1a_64_batch

    # sort rows by ngram hash: consumers index with searchsorted on the
    # mmap'd hash array (no per-actor dict build; collisions share the
    # 64-bit-FNV assumption the packed tables already make)
    hashes = fnv1a_64_batch(ngrams)
    order = np.argsort(hashes, kind="stable")
    uni_hashes = fnv1a_64_batch(unigrams)
    uni_order = np.argsort(uni_hashes, kind="stable")

    _save_npy(out_dir / "hash.npy", hashes[order])
    _save_npy(out_dir / "matrix.npy", matrix[order])
    # float32 twin of the resolved table: the scorer's gather+reduceat hot
    # loop is memory-bandwidth bound, so halving bytes/row lifts aggregate
    # throughput at high concurrency (parity-checked in tests)
    _save_npy(out_dir / "matrix32.npy", matrix[order].astype(np.float32))
    _save_npy(out_dir / "ngrams.npy", np.array(ngrams)[order])
    _save_npy(out_dir / "uni_hash.npy", uni_hashes[uni_order])
    _save_npy(out_dir / "uni_matrix.npy", uni_matrix[uni_order])
    _save_npy(out_dir / "uni_ngrams.npy", np.array(unigrams)[uni_order])
    _save_npy(out_dir / "languages.npy", np.array(languages))

    # Concatenated packed tables: one mmap per array instead of 150
    # per-language parquet reads at every actor init.
    for tier in ("low", "high"):
        hashes = [getattr(packed[l], f"{tier}_hash") for l in languages]
        logps = [getattr(packed[l], f"{tier}_logp") for l in languages]
        offs = np.zeros(len(languages) + 1, dtype=np.int64)
        np.cumsum([len(h) for h in hashes], out=offs[1:])
        _save_npy(out_dir / f"packed_{tier}_hash.npy", np.concatenate(hashes))
        _save_npy(out_dir / f"packed_{tier}_logp.npy", np.concatenate(logps))
        _save_npy(out_dir / f"packed_{tier}_offsets.npy", offs)
    return out_dir


def load_resolved_cache(models_dir: Path) -> dict | None:
    """Raw .npy layout; the big matrix is memory-mapped read-only so every
    worker process on a node shares one physical copy via the page cache."""
    d = Path(models_dir) / RESOLVED_CACHE_DIR
    if not (d / "languages.npy").exists() or not (d / "hash.npy").exists():
        return None
    # NOTE: no lazy matrix32 derivation here — build_resolved_cache
    # (driver-side, via ensure_models) upgrades old caches once; a worker
    # that still finds no float32 twin falls back to the float64 matrix
    # (correct, just slower) instead of N workers each materializing and
    # writing the full matrix concurrently on first cold run.
    try:
        return {
            "languages": [
                str(x)
                for x in np.load(d / "languages.npy", allow_pickle=False)
            ],
            # hash-sorted row index: lookups are searchsorted on the mmap
            "hash": np.load(d / "hash.npy", allow_pickle=False, mmap_mode="r"),
            "matrix": np.load(
                d / "matrix.npy", allow_pickle=False, mmap_mode="r"
            ),
            "matrix32": (
                np.load(d / "matrix32.npy", allow_pickle=False, mmap_mode="r")
                if (d / "matrix32.npy").exists()
                else None
            ),
            "uni_hash": np.load(
                d / "uni_hash.npy", allow_pickle=False, mmap_mode="r"
            ),
            "uni_matrix": np.load(
                d / "uni_matrix.npy", allow_pickle=False, mmap_mode="r"
            ),
        }
    except (OSError, ValueError):
        return None


def load_packed_models_fast(
    models_dir: Path, languages=ALL_ISO1, orders: str = "all"
) -> dict[str, PackedModel] | None:
    """Zero-copy per-language views over the concatenated mmap'd tables
    written by build_resolved_cache; None if absent/mismatched."""
    d = Path(models_dir) / RESOLVED_CACHE_DIR
    if not (d / "packed_low_hash.npy").exists():
        return None
    try:
        langs = [str(x) for x in np.load(d / "languages.npy", allow_pickle=False)]
        if langs != list(languages):
            return None
        out: dict[str, PackedModel] = {}
        tiers = {}
        for tier in ("low", "high"):
            tiers[tier] = (
                np.load(d / f"packed_{tier}_hash.npy", allow_pickle=False,
                        mmap_mode="r"),
                np.load(d / f"packed_{tier}_logp.npy", allow_pickle=False,
                        mmap_mode="r"),
                np.load(d / f"packed_{tier}_offsets.npy", allow_pickle=False),
            )
        empty_u = np.empty(0, dtype=np.uint64)
        empty_f = np.empty(0, dtype=np.float64)
        for i, lang in enumerate(langs):
            lo_h, lo_p, lo_o = tiers["low"]
            hi_h, hi_p, hi_o = tiers["high"]
            out[lang] = PackedModel(
                lo_h[lo_o[i] : lo_o[i + 1]],
                lo_p[lo_o[i] : lo_o[i + 1]],
                hi_h[hi_o[i] : hi_o[i + 1]] if orders == "all" else empty_u,
                hi_p[hi_o[i] : hi_o[i + 1]] if orders == "all" else empty_f,
            )
        return out
    except (OSError, ValueError):
        return None


def load_packed_models(
    models_dir: Path,
    languages=ALL_ISO1,
    orders: str = "all",
) -> dict[str, PackedModel]:
    fast = load_packed_models_fast(models_dir, languages, orders)
    if fast is not None:
        return fast
    packed: dict[str, PackedModel] = {}
    empty_u = np.empty(0, dtype=np.uint64)
    empty_f = np.empty(0, dtype=np.float64)
    for lang in languages:
        lo = _read(models_dir / lang / "low.parquet", ["hash", "logfreq"])
        lo_h = lo.column("hash").to_numpy()
        lo_p = lo.column("logfreq").to_numpy()
        if orders == "all":
            hi = _read(models_dir / lang / "high.parquet", ["hash", "logfreq"])
            hi_h = hi.column("hash").to_numpy()
            hi_p = hi.column("logfreq").to_numpy()
        else:
            hi_h, hi_p = empty_u, empty_f
        packed[lang] = PackedModel(lo_h, lo_p, hi_h, hi_p)
    return packed
