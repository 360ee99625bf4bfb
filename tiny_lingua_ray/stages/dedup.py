"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All operate over a text column and are built from Ray Data primitives:

* exact_dedup        hash-partitioned groupby(text-hash) -> first per group
* minhash_signatures stateless map_batches (shingle -> 64 minhashes)
* lsh_candidate_pairs explode signatures into (band, bucket) rows ->
                     groupby -> within-bucket pairs (the only shuffle)
* simhash_batch      stateless map_batches -> 64-bit simhash
* jaccard            exact n-gram Jaccard; the distributed candidate
                     verification lives in pipelines/queries.q_jaccard_pairs
                     (broadcast pair list + one shingle shuffle)

Scale notes: MinHash-LSH at 1e12 docs = the canonical shingle->minhash->
band->bucket-groupby pipeline; bucket groupby is the shuffle, bands are
processed independently.  Hot buckets (boilerplate) are capped at
MAX_BUCKET to bound the pair explosion — capped buckets and dropped id
counts are emitted through the logging module, never silent.

Hash schemes: "fnv" (default, cheap) or "md5" (bit-identical to DuckDB
md5_number_lower -> the whole sketch is SQL-oracle-verifiable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tiny_lingua_ray.models.train import fnv1a_64, fnv1a_64_batch

NUM_PERM = 64
NUM_BANDS = 16
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
SHINGLE_K = 5
MAX_BUCKET = 64  # cap pairs per LSH bucket (skew guard)

_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(42)
_A = _rng.randint(1, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)


def _md5_lower64(s: str) -> int:
    """Little-endian uint64 of md5-digest bytes 8..16 — bit-identical to
    DuckDB's ``md5_number_lower`` (verified), which makes every sketch
    built on these hashes oracle-verifiable in SQL."""
    import hashlib
    import struct

    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[8:])[0]


def _md5_lower64_batch(strs: list[str]) -> np.ndarray:
    import hashlib
    import struct

    unpack, md5 = struct.unpack, hashlib.md5
    return np.fromiter(
        (unpack("<Q", md5(s.encode("utf-8")).digest()[8:])[0] for s in strs),
        dtype=np.uint64,
        count=len(strs),
    )


def char_shingles(
    text: str, k: int = SHINGLE_K, scheme: str = "fnv"
) -> np.ndarray:
    """Hashes of the k-char shingles of the lowercased text (unique).

    ``scheme="fnv"`` (default) is the cheap scale path;  ``scheme="md5"``
    matches DuckDB md5_number_lower so MinHash/SimHash sketches can be
    verified against a SQL oracle.
    """
    hasher = _md5_lower64 if scheme == "md5" else fnv1a_64
    t = (text or "").lower()
    if len(t) < k:
        return (
            np.array([hasher(t)], dtype=np.uint64)
            if t
            else np.empty(0, dtype=np.uint64)
        )
    seen = {t[i : i + k] for i in range(len(t) - k + 1)}
    return np.fromiter(
        (hasher(s) for s in seen), dtype=np.uint64, count=len(seen)
    )


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """FNV hashes of the unique k-WORD shingles of the lowercased text
    (Broder's document shingling granularity).  Texts with 1..k-1 words
    fall back to one shingle over the whole word sequence — the same
    short-text convention as :func:`char_shingles` — and empty texts
    yield no shingles.  Word shingles are far more corpus-distinctive
    than char 5-grams on small-vocabulary text (measured on the sf0.01
    synthetic corpus: char-5-gram median doc-frequency 31/500 docs vs
    word-3-gram median 1), which is what keeps prefix-filter candidate
    generation near-linear."""
    ws = [w for w in (text or "").lower().split(" ") if w]
    if not ws:
        return np.empty(0, dtype=np.uint64)
    if len(ws) < k:
        seen = {" ".join(ws)}
    else:
        seen = {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}
    return fnv1a_64_batch(list(seen))


# Adaptive chunking bound for the vectorized sketch kernels: the 64 x U
# permutation-value matrix for U unique shingles is 8 B each -> ~100 MB
# transient per worker at this cap.
_MAX_CHUNK_SHINGLES = 200_000


def _shingle_chunks(texts: list[str], k: int, scheme: str):
    """Yield (uniq_hashes, per-doc index arrays, doc offset) chunks.

    Shingles are deduplicated ACROSS docs in the chunk, so each distinct
    shingle string is hashed exactly once per chunk (the md5 scheme's
    per-string Python hashing made per-doc hashing the old hot spot —
    boilerplate-heavy web text repeats most shingles across docs)."""
    memo: dict[str, int] = {}
    uniq: list[str] = []
    idxs: list[np.ndarray] = []
    start = 0
    for d, raw in enumerate(texts):
        t = (raw or "").lower()
        if not t:
            ss: set[str] = set()
        elif len(t) < k:
            ss = {t}
        else:
            ss = {t[i : i + k] for i in range(len(t) - k + 1)}
        idx = np.empty(len(ss), dtype=np.int64)
        for j, s in enumerate(ss):
            v = memo.get(s)
            if v is None:
                v = memo[s] = len(uniq)
                uniq.append(s)
            idx[j] = v
        idxs.append(idx)
        if len(uniq) >= _MAX_CHUNK_SHINGLES:
            hashes = (
                _md5_lower64_batch(uniq)
                if scheme == "md5"
                else fnv1a_64_batch(uniq)
            )
            yield hashes, idxs, start
            memo, uniq, idxs, start = {}, [], [], d + 1
    if idxs:
        hashes = (
            _md5_lower64_batch(uniq) if scheme == "md5" else fnv1a_64_batch(uniq)
        )
        yield hashes, idxs, start


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """uint64[NUM_PERM] min over universal-hash permutations."""
    if len(shingles) == 0:
        return np.full(NUM_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    # h_i(x) = (a_i * x + b_i) mod p  (vectorized [perm, shingle])
    x = shingles[None, :]
    vals = (_A[:, None] * x + _B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def minhash_batch(
    batch: pa.Table, text_column: str = "text", id_column: str = "doc_id",
    scheme: str = "fnv",
) -> pa.Table:
    texts = batch.column(text_column).to_pylist()
    n = len(texts)
    sigs = np.full((n, NUM_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
    for hashes, idxs, start in _shingle_chunks(texts, SHINGLE_K, scheme):
        # one permutation-value table per chunk's UNIQUE shingles, then a
        # C-speed gather + min per doc (vs. a full modmul per doc before)
        with np.errstate(over="ignore"):
            vals = (_A[:, None] * hashes[None, :] + _B[:, None]) % np.uint64(
                _MERSENNE
            )
        for d, idx in enumerate(idxs):
            if len(idx):
                sigs[start + d] = vals[:, idx].min(axis=1)
    sig_arr = pa.FixedSizeListArray.from_arrays(
        pa.array(sigs.reshape(-1), pa.uint64()), NUM_PERM
    )
    return pa.table({id_column: batch.column(id_column), "minhash": sig_arr})


def explode_bands(batch: pa.Table, id_column: str = "doc_id") -> pa.Table:
    """(doc_id, band, bucket) rows: bucket = FNV of the band's signature
    slice, folded with uint64 vector ops over the whole batch at once.
    groupby(["band","bucket"]) then yields LSH candidates."""
    ids = batch.column(id_column)
    sig_col = batch.column("minhash")
    n = len(sig_col)
    if n == 0:
        return pa.table(
            {
                id_column: ids,
                "band": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.uint64()),
            }
        )
    flat = (
        sig_col.combine_chunks()
        .flatten()
        .to_numpy(zero_copy_only=False)
        .astype(np.uint64, copy=False)
        .reshape(n, NUM_BANDS, ROWS_PER_BAND)
    )
    with np.errstate(over="ignore"):
        h = np.full((n, NUM_BANDS), 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for j in range(ROWS_PER_BAND):
            h ^= flat[:, :, j]
            h *= prime
    id_np = np.repeat(
        np.asarray(ids.to_numpy(zero_copy_only=False)), NUM_BANDS
    )
    band_np = np.tile(np.arange(NUM_BANDS, dtype=np.int32), n)
    return pa.table(
        {
            id_column: pa.array(id_np),
            "band": pa.array(band_np, pa.int32()),
            "bucket": pa.array(h.reshape(-1), pa.uint64()),
        }
    )


NUM_BUCKET_GROUPS = 32


def _pairs_in_partition(df, id_column: str = "doc_id"):
    """Pairing over MANY buckets at once (pandas-C groupby inside one Ray
    group) — amortizes Ray's per-group overhead over thousands of tiny LSH
    buckets ("bucket the buckets").  Emits pre-deduped (pair_key, n)
    partials: a single packed int64 key keeps the downstream shuffle cheap
    (Ray's multi-column groupby aggregate is far slower).  Hot buckets are
    capped at MAX_BUCKET members; the dropped excess is logged (never
    silent)."""
    import logging

    import pandas as pd

    # pair key packs two ids into a uint64 — enforced, not assumed
    if len(df) and int(df[id_column].max()) >= (1 << 32):
        raise ValueError(
            f"{id_column} >= 2^32 cannot be packed into a 64-bit pair key; "
            "switch pair_key to fnv1a_64(f'{a}:{b}')"
        )
    # vectorized pairing: sort (band, bucket, id), dedupe, cap each bucket
    # at MAX_BUCKET via cumcount, then emit all triangular pairs segment
    # by segment using precomputed (i, j) index templates per bucket size
    u = df[["band", "bucket", id_column]].drop_duplicates()
    u = u.sort_values(["band", "bucket", id_column], kind="stable")
    pos = u.groupby(["band", "bucket"], sort=False).cumcount().to_numpy()
    over = pos >= MAX_BUCKET
    if over.any():
        capped = u[over].groupby(["band", "bucket"], sort=False).size()
        logging.getLogger(__name__).warning(
            "minhash-lsh: capped %d hot bucket(s) at %d members "
            "(%d doc ids dropped from pairing in this partition)",
            len(capped), MAX_BUCKET, int(capped.sum()),
        )
        u, pos = u[~over], pos[~over]
    ids = u[id_column].to_numpy().astype(np.uint64)
    # segment boundaries: positions where cumcount resets to 0
    starts = np.flatnonzero(pos == 0)
    sizes = np.diff(np.append(starts, len(ids)))
    key_parts = []
    for s0, m in zip(starts, sizes):
        if m < 2:
            continue
        ii, jj = _tri_template(int(m))
        key_parts.append((ids[s0 + ii] << np.uint64(32)) | ids[s0 + jj])
    # arrow out: this output crosses the pair-merge shuffle, and Ray's
    # pandas->arrow conversion there reattaches unhashable b'pandas'
    # schema metadata (tableutil.from_df rationale)
    if not key_parts:
        return pa.table(
            {"pair_key": pa.array([], pa.uint64()),
             "n": pa.array([], pa.int64())}
        )
    s = pd.Series(np.concatenate(key_parts), dtype="uint64").value_counts()
    return pa.table(
        {"pair_key": pa.array(s.index.to_numpy(), pa.uint64()),
         "n": pa.array(s.to_numpy().astype(np.int64))}
    )


_TRI_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _tri_template(m: int) -> tuple[np.ndarray, np.ndarray]:
    """Upper-triangle (i, j) index pairs for a segment of size m (i < j),
    cached — m is capped at MAX_BUCKET so the cache is tiny."""
    t = _TRI_CACHE.get(m)
    if t is None:
        ii, jj = np.triu_indices(m, k=1)
        t = _TRI_CACHE[m] = (ii, jj)
    return t


def jaccard(text_a: str, text_b: str, k: int = SHINGLE_K) -> float:
    sa = set(np.asarray(char_shingles(text_a, k)).tolist())
    sb = set(np.asarray(char_shingles(text_b, k)).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def simhash64(text: str, k: int = SHINGLE_K, scheme: str = "fnv") -> int:
    """64-bit SimHash over char-k-shingle hashes (unweighted)."""
    sh = char_shingles(text, k, scheme=scheme)
    if len(sh) == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for j in range(64):
        if votes[j] > 0:
            out |= np.uint64(1) << np.uint64(j)
    return int(out)


_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)


def simhash_batch(
    batch: pa.Table, text_column: str = "text", id_column: str = "doc_id",
    scheme: str = "fnv",
) -> pa.Table:
    """Batch SimHash: shingles deduped + hashed once per chunk, bit votes
    accumulated with one int16 matmul-free gather per doc (bit-identical
    to simhash64)."""
    texts = batch.column(text_column).to_pylist()
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    for hashes, idxs, start in _shingle_chunks(texts, SHINGLE_K, scheme):
        # bits[u, j] = bit j of unique-shingle hash u  (U x 64 int16)
        bits = (
            (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int16)
        for d, idx in enumerate(idxs):
            if len(idx) == 0:
                continue
            votes = 2 * bits[idx].sum(axis=0, dtype=np.int64) - len(idx)
            out[start + d] = _POW2[votes > 0].sum()
    return pa.table(
        {
            id_column: batch.column(id_column),
            "simhash": pa.array(out, pa.uint64()),
        }
    )


# ---------------------------------------------------------------------------
# Dataset-level pipelines
# ---------------------------------------------------------------------------

def exact_dedup(ds, text_column: str = "text", id_column: str = "doc_id"):
    """Keep min-id row per distinct text; returns (id, dup_count) Dataset.

    Scale path: groupby on a 64-bit content hash (not the full text) so the
    shuffle moves 16 bytes per row; J3 in SURVEY.md §2.4.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        h = np.fromiter(
            (fnv1a_64(t or "") for t in texts),
            dtype=np.uint64,
            count=len(texts),
        )
        return pa.table(
            {
                id_column: batch.column(id_column),
                "content_hash": pa.array(h.astype(np.int64)),
                "shard": pa.array((h % np.uint64(32)).astype(np.int64)),
            }
        )

    # groupby(shard).map_groups + pandas-C per-shard dedup: ray's
    # aggregate pays per-group Python overhead at high key cardinality
    def dedup_shard(df):
        g = df.groupby("content_hash", as_index=False).agg(
            **{id_column: (id_column, "min"), "dup_count": (id_column, "size")}
        )
        return g[[id_column, "dup_count"]]

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(dedup_shard, batch_format="pandas")
    )


def minhash_lsh_candidates(ds, text_column: str = "text", id_column: str = "doc_id",
                           scheme: str = "fnv"):
    """Candidate near-duplicate pairs via MinHash-LSH; (id_a, id_b) Dataset.

    ``scheme="md5"`` makes the whole sketch SQL-oracle-verifiable (see
    char_shingles); "fnv" is the cheaper scale default."""
    from tiny_lingua_ray.stages.partitioning import shards_for

    # size-derived fan-outs: each coarse bucket-group / pair-merge shard
    # is ONE pandas materialization, so both scale with the input (the
    # floors reproduce the former fixed constants at test scale)
    num_groups = shards_for(ds, lo=NUM_BUCKET_GROUPS)
    merge_shards = shards_for(ds, lo=16)
    sig = ds.map_batches(
        minhash_batch,
        fn_kwargs={"text_column": text_column, "id_column": id_column,
                   "scheme": scheme},
        batch_format="pyarrow",
    )
    def add_group_key(batch: pa.Table) -> pa.Table:
        band = batch.column("band").to_numpy(zero_copy_only=False)
        bucket = batch.column("bucket").to_numpy(zero_copy_only=False)
        gkey = (
            (bucket ^ (band.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
            % np.uint64(num_groups)
        ).astype(np.int64)
        return batch.append_column("gkey", pa.array(gkey))

    bands = sig.map_batches(
        explode_bands,
        fn_kwargs={"id_column": id_column},
        batch_format="pyarrow",
    ).map_batches(add_group_key, batch_format="pyarrow")
    # ONE shuffle into NUM_BUCKET_GROUPS coarse groups; exact (band, bucket)
    # pairing happens in pandas inside each group
    pairs = bands.groupby("gkey").map_groups(
        _pairs_in_partition,
        batch_format="pandas",
        fn_kwargs={"id_column": id_column},
    )
    # The same pair can emerge from several bands -> merge the partials.
    # NOT ray groupby().aggregate(): with high key cardinality it pays
    # per-GROUP Python overhead (~150 s for 110k pairs).  Instead shuffle
    # into a few coarse shards and merge each shard with a pandas-C groupby.
    def add_shard(batch: pa.Table) -> pa.Table:
        k = batch.column("pair_key").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        return batch.append_column(
            "shard", pa.array((k % np.uint64(merge_shards)).astype(np.int64))
        )

    def merge_shard(df):
        g = df.groupby("pair_key", as_index=False)["n"].sum()
        return g.rename(columns={"n": "n_bands"})

    merged = (
        pairs.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(merge_shard, batch_format="pandas")
    )

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch.column("pair_key").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        return pa.table(
            {
                "id_a": pa.array(
                    (k >> np.uint64(32)).astype(np.int64), pa.int64()
                ),
                "id_b": pa.array(
                    (k & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()
                ),
                "n_bands": batch.column("n_bands"),
            }
        )

    return merged.map_batches(unpack, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash near-duplicate pairs (Hamming-ball LSH)
# ---------------------------------------------------------------------------

_SIMHASH_BANDS = 4  # 16 bits each


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR), uint64 in -> int64 out."""
    v = v.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        v -= (v >> np.uint64(1)) & np.uint64(0x5555555555555555)
        v = (v & np.uint64(0x3333333333333333)) + (
            (v >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v *= np.uint64(0x0101010101010101)
    return (v >> np.uint64(56)).astype(np.int64)


def simhash_near_dup_pairs(
    ds,
    max_hamming: int = 3,
    text_column: str = "text",
    id_column: str = "doc_id",
    scheme: str = "fnv",
):
    """(id_a, id_b, hamming) pairs with SimHash Hamming distance <=
    ``max_hamming`` — the constant-space near-dup family (one uint64 per
    doc rides the shuffle, vs MinHash's 64 values).

    Pigeonhole banding: the 64-bit simhash splits into 4 x 16-bit bands;
    hamming <= 3 guarantees at least one band is IDENTICAL, so grouping
    on (band, band_value) catches every qualifying pair.  Requires
    ``max_hamming < _SIMHASH_BANDS`` (asserted).

    Shape (same skeleton as minhash_lsh_candidates): per-doc simhash ->
    explode 4 band rows carrying the full hash -> ONE coarse-group
    shuffle ("bucket the buckets", NUM_BUCKET_GROUPS groups) -> in-group
    triangular pairing per exact (band, bucket) segment with the
    MAX_BUCKET hot-bucket cap (logged drops) and an IMMEDIATE vectorized
    popcount verify (both hashes are in the group — no second lookup
    exchange) -> pair-key-sharded dedup (a pair can collide in several
    bands).  ``scheme="md5"`` makes the whole operator SQL-verifiable via
    the simhash oracle + bit_count(xor) self-join.
    """
    from tiny_lingua_ray.stages.partitioning import shards_for

    sigs = ds.map_batches(
        simhash_batch,
        fn_kwargs={"text_column": text_column, "id_column": id_column,
                   "scheme": scheme},
        batch_format="pyarrow",
    )
    return hamming_near_dup_pairs(
        sigs, max_hamming=max_hamming, id_column=id_column,
        hash_column="simhash",
        # size-derived fan-outs, computed on the RAW read (size_bytes on
        # the derived sigs dataset would execute it)
        num_groups=shards_for(ds, lo=NUM_BUCKET_GROUPS),
        merge_shards=shards_for(ds, lo=16),
    )


def hamming_near_dup_pairs(
    sigs,
    max_hamming: int = 3,
    id_column: str = "doc_id",
    hash_column: str = "simhash",
    num_groups: int = NUM_BUCKET_GROUPS,
    merge_shards: int = 16,
):
    """(id_a, id_b, hamming) pairs over ANY precomputed uint64 sketch
    column — the pigeonhole-banding core shared by text SimHash
    (simhash_near_dup_pairs) and perceptual image dHash
    (pipelines.queries.q_image_near_dup).  Same guarantee: 4 x 16-bit
    bands catch every pair with hamming <= 3."""
    assert max_hamming < 16 * (_SIMHASH_BANDS - 1) and max_hamming < _SIMHASH_BANDS, (
        "banding guarantee requires max_hamming < number of bands"
    )
    import pandas as pd

    def explode(b: pa.Table) -> pa.Table:
        ids = b.column(id_column).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(ids) and int(ids.max()) >= (1 << 32):
            raise ValueError(
                f"{id_column} >= 2^32 cannot be packed into a 64-bit pair key"
            )
        sh = b.column(hash_column).to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        n = len(ids)
        band = np.tile(np.arange(_SIMHASH_BANDS, dtype=np.int64), n)
        rid = np.repeat(ids, _SIMHASH_BANDS)
        rsh = np.repeat(sh, _SIMHASH_BANDS)
        bucket = (rsh >> (band.astype(np.uint64) * np.uint64(16))) & np.uint64(
            0xFFFF
        )
        gkey = (
            (bucket ^ (band.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
            % np.uint64(num_groups)
        ).astype(np.int64)
        return pa.table(
            {
                "gkey": pa.array(gkey),
                "band": pa.array(band),
                "bucket": pa.array(bucket.astype(np.int64)),
                id_column: pa.array(rid),
                hash_column: pa.array(rsh, pa.uint64()),
            }
        )

    empty_pairs = pa.table(
        {"pair_key": pa.array([], pa.uint64()),
         "hamming": pa.array([], pa.int64()),
         "shard": pa.array([], pa.int64())}
    )

    def pairs_in_group(df: pd.DataFrame) -> pa.Table:
        import logging

        u = df[["band", "bucket", id_column, hash_column]].drop_duplicates(
            ["band", "bucket", id_column]
        )
        u = u.sort_values(["band", "bucket", id_column], kind="stable")
        pos = u.groupby(["band", "bucket"], sort=False).cumcount().to_numpy()
        over = pos >= MAX_BUCKET
        if over.any():
            capped = u[over].groupby(["band", "bucket"], sort=False).size()
            logging.getLogger(__name__).warning(
                "simhash-lsh: capped %d hot bucket(s) at %d members "
                "(%d doc ids dropped from pairing in this group)",
                len(capped), MAX_BUCKET, int(capped.sum()),
            )
            u, pos = u[~over], pos[~over]
        ids = u[id_column].to_numpy().astype(np.uint64)
        hashes = u[hash_column].to_numpy().astype(np.uint64)
        starts = np.flatnonzero(pos == 0)
        sizes = np.diff(np.append(starts, len(ids)))
        key_parts, hd_parts = [], []
        for s0, m in zip(starts, sizes):
            if m < 2:
                continue
            ii, jj = _tri_template(int(m))
            hd = _popcount64(hashes[s0 + ii] ^ hashes[s0 + jj])
            ok = hd <= max_hamming
            if not ok.any():
                continue
            key_parts.append(
                (ids[s0 + ii[ok]] << np.uint64(32)) | ids[s0 + jj[ok]]
            )
            hd_parts.append(hd[ok])
        if not key_parts:
            return empty_pairs
        pk = np.concatenate(key_parts)
        return pa.table(
            {
                "pair_key": pa.array(pk, pa.uint64()),
                "hamming": pa.array(np.concatenate(hd_parts)),
                "shard": pa.array(
                    (pk % np.uint64(merge_shards)).astype(np.int64)
                ),
            }
        )

    def dedup_shard(df: pd.DataFrame) -> pa.Table:
        g = df.drop_duplicates("pair_key")
        k = g["pair_key"].to_numpy().astype(np.uint64)
        return pa.table(
            {
                "id_a": pa.array((k >> np.uint64(32)).astype(np.int64)),
                "id_b": pa.array(
                    (k & np.uint64(0xFFFFFFFF)).astype(np.int64)
                ),
                "hamming": pa.array(g["hamming"].to_numpy(dtype=np.int64)),
            }
        )

    return (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby("gkey")
        .map_groups(pairs_in_group, batch_format="pandas")
        .groupby("shard")
        .map_groups(dedup_shard, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Pairwise text delivery + edit-distance verification
# ---------------------------------------------------------------------------


def attach_pair_texts(docs, pairs, num_shards: int = 16,
                      text_column: str = "text", id_column: str = "doc_id"):
    """Deliver both texts to every candidate pair WITHOUT a driver-side
    pair map: the tagged-union cogroup idiom (same skeleton as
    jaccard_pairs_dataset / relational_ext joins), reusable by any
    pairwise verifier (edit distance, diff, embedding compare).

    1. cogroup on ``doc_id % P``: pair "requests" (two rows per pair,
       tagged with which side the doc fills) union the corpus; per
       shard each request picks up its doc's text — text crosses
       exactly ONE exchange and non-candidate docs are dropped
       in-shard.
    2. cogroup on ``pair_key % P``: the two sides of a pair meet; emit
       (id_a, id_b, text_a, text_b).

    Ids must fit in 32 bits (asserted) — pair_key packs (a << 32) | b
    like the jaccard path.  Size ``num_shards`` with
    ``partitioning.shards_for(raw_docs_read)`` at scale (each cogroup
    shard is one pandas materialization); the default matches the old
    fixed constant at test scale."""
    P = num_shards

    def emit_requests(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and (a.max() >= 2**32 or b.max() >= 2**32):
            raise ValueError("attach_pair_texts packs ids into 32 bits")
        pk = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        doc = np.concatenate([a, b])
        pk2 = np.concatenate([pk, pk]).astype(np.int64)  # int64 view
        ab = np.concatenate(
            [np.zeros(len(a), np.int8), np.ones(len(b), np.int8)]
        )
        return pa.table(
            {
                "shard": pa.array(doc % P),
                "doc_id": pa.array(doc),
                "pair_key": pa.array(pk2),
                "ab": pa.array(ab),
                "txt": pa.nulls(len(doc), pa.string()),
                "role": pa.array(np.zeros(len(doc), np.int8)),
            }
        )

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n = len(ids)
        return pa.table(
            {
                "shard": pa.array(ids % P),
                "doc_id": pa.array(ids),
                "pair_key": pa.array(np.zeros(n, np.int64)),
                "ab": pa.array(np.zeros(n, np.int8)),
                "txt": batch.column(text_column),
                "role": pa.array(np.ones(n, np.int8)),
            }
        )

    empty_sides = pa.table(
        {
            "shard2": pa.array([], pa.int64()),
            "pair_key": pa.array([], pa.int64()),
            "ab": pa.array([], pa.int8()),
            "txt": pa.array([], pa.string()),
        }
    )

    def deliver(df: pd.DataFrame) -> pa.Table:
        req = df[df["role"] == 0]
        if len(req) == 0:
            return empty_sides
        txt = df[df["role"] == 1]
        lookup = pd.Series(
            txt["txt"].to_numpy(), index=txt["doc_id"].to_numpy()
        )
        got = lookup.reindex(req["doc_id"].to_numpy())
        present = got.notna().to_numpy() | got.index.isin(txt["doc_id"])
        pk = req["pair_key"].to_numpy()[present]
        return pa.table(
            {
                "shard2": pa.array(
                    (pk.astype(np.uint64) % np.uint64(P)).astype(np.int64)
                ),
                "pair_key": pa.array(pk),
                "ab": pa.array(req["ab"].to_numpy()[present]),
                "txt": pa.array(got.to_numpy()[present], pa.string()),
            }
        )

    empty_pairs = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "text_a": pa.array([], pa.string()),
            "text_b": pa.array([], pa.string()),
        }
    )

    def pivot(df: pd.DataFrame) -> pa.Table:
        # a duplicated (id_a, id_b) in the pairs input delivers once
        # (duplicate pair_key index entries would fan .loc out and
        # break column alignment)
        sa = df[df["ab"] == 0].set_index("pair_key")["txt"]
        sa = sa[~sa.index.duplicated()]
        sb = df[df["ab"] == 1].set_index("pair_key")["txt"]
        sb = sb[~sb.index.duplicated()]
        pk = sa.index.intersection(sb.index).to_numpy()
        if len(pk) == 0:
            return empty_pairs
        k = pk.astype(np.uint64)
        return pa.table(
            {
                "id_a": pa.array((k >> np.uint64(32)).astype(np.int64)),
                "id_b": pa.array((k & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "text_a": pa.array(sa.loc[pk].to_numpy(), pa.string()),
                "text_b": pa.array(sb.loc[pk].to_numpy(), pa.string()),
            }
        )

    tagged = pairs.map_batches(emit_requests, batch_format="pyarrow").union(
        docs.map_batches(tag_docs, batch_format="pyarrow")
    )
    sides = tagged.groupby("shard").map_groups(deliver, batch_format="pandas")
    return sides.groupby("shard2").map_groups(pivot, batch_format="pandas")


def levenshtein_capped(a: str, b: str, cap: int) -> int:
    """min(levenshtein(a, b), cap + 1) — banded early-exit DP, numpy row
    kernel (the insertion recurrence folds into one
    np.minimum.accumulate: min over k<=j of cur[k] + (j-k))."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    ar = np.arange(lb + 1, dtype=np.int32)
    prev = ar.copy()
    cur = np.empty(lb + 1, np.int32)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        cur[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (bb != ord(ca)))
        cur = np.minimum.accumulate(cur - ar) + ar
        if cur.min() > cap:
            return cap + 1
        prev, cur = cur, prev
    return min(int(prev[-1]), cap + 1)
