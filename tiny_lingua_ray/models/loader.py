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


def load_packed_models(
    models_dir: Path,
    languages=ALL_ISO1,
    orders: str = "all",
) -> dict[str, PackedModel]:
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
