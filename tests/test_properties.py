"""Hypothesis property tests for the pure (no-Ray) kernels.

These complement the fixed-seed fuzz tests with shrinking
counterexamples and unicode/edge inputs.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_TEXT = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FF), max_size=40
)


def _ref_levenshtein(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


@settings(max_examples=200, deadline=None)
@given(_TEXT, _TEXT, st.integers(min_value=0, max_value=15))
def test_levenshtein_capped_property(a, b, cap):
    from tiny_lingua_ray.stages.dedup import levenshtein_capped

    assert levenshtein_capped(a, b, cap) == min(_ref_levenshtein(a, b),
                                                cap + 1)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(
    min_codepoint=0x20, max_codepoint=0x24F), max_size=24), max_size=32))
def test_fnv_batch_matches_scalar(strs):
    from tiny_lingua_ray.models.train import fnv1a_64, fnv1a_64_batch

    batch = fnv1a_64_batch(strs)
    assert len(batch) == len(strs)
    for s, h in zip(strs, batch):
        assert int(h) == fnv1a_64(s)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e3, max_value=1e3,
                       allow_nan=False), min_size=65, max_size=400),
    st.integers(min_value=-8, max_value=8),
)
def test_afp64_amplitude_invariant(samples, k):
    """Fingerprint bits depend only on RELATIVE segment energies.  The
    bit-exact guarantee is for power-of-two scaling (exact in IEEE754)
    of samples whose SQUARES stay in the normal float range — squaring
    into the subnormals rounds on a coarser grid and breaks exactness
    (hypothesis found |x| ~ 2.7e-162, whose square is one subnormal
    step).  Arbitrary scaling is only NEAR-invariant anyway — float
    rounding can flip a bit whose segment energies tie to the last ulp
    — which is why audio_near_dup pairs at Hamming<=3 rather than 0."""
    from tiny_lingua_ray.stages.multimodal import afp64

    x = np.asarray(samples, dtype=np.float64)
    # flush magnitudes whose squares would leave the normal range
    # (transform, not assume: hypothesis floats are dense near zero and
    # filtering them trips the filter_too_much health check)
    x[np.abs(x) < 1e-100] = 0.0
    assert afp64(x) == afp64(x * 2.0 ** k)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 32) - 1),
                min_size=2, max_size=2, unique=True))
def test_pair_key_pack_roundtrip(ids):
    """(a << 32) | b packing (dedup pair keys) is loss-free for any
    32-bit id pair with a < b."""
    a, b = sorted(ids)
    pk = (np.uint64(a) << np.uint64(32)) | np.uint64(b)
    assert int(pk >> np.uint64(32)) == a
    assert int(pk & np.uint64(0xFFFFFFFF)) == b


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=6),
)
def test_round_half_away_matches_duckdb_round(x, nd):
    """tableutil.round_half_away must agree with SQL ROUND for every
    float and digit count — including the .5-boundary values where
    np.round (half-even) diverges.  This is the cross-engine rounding
    contract every oracle-paired emit site relies on."""
    import duckdb

    from tiny_lingua_ray.tableutil import round_half_away

    got = float(round_half_away(x, nd))
    want = duckdb.sql(
        f"SELECT ROUND(CAST({x!r} AS DOUBLE), {nd})"
    ).fetchone()[0]
    assert got == want or (np.isnan(got) and np.isnan(want)), (x, nd, got, want)


def test_round_half_away_boundary_cases():
    """Pinned .5-boundary values where np.round half-even disagrees."""
    from tiny_lingua_ray.tableutil import round_half_away

    # 44.7590625 * 1e6 is exactly 44759062.5 in float64: half-even gives
    # ...62, half-away must give ...63 (the above_avg_events class)
    assert float(round_half_away(44.7590625, 6)) == 44.759063
    assert float(np.round(44.7590625, 6)) == 44.759062  # the divergence
    assert float(round_half_away(-44.7590625, 6)) == -44.759063
    assert float(round_half_away(2.5, 0)) == 3.0
    assert float(round_half_away(-2.5, 0)) == -3.0
    assert float(round_half_away(0.0, 3)) == 0.0


def test_shards_for_table_scales_with_size(tmp_path):
    """shards_for_table: floor at tiny sizes, ceil(bytes/target) at
    scale, hard cap; identical for file and directory layouts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiny_lingua_ray.stages.partitioning import shards_for_table

    pq.write_table(
        pa.table({"x": pa.array(range(1000), pa.int64())}),
        str(tmp_path / "t.parquet"),
    )
    assert shards_for_table(str(tmp_path), "t") == 16  # tiny -> floor
    assert shards_for_table(str(tmp_path), "missing") == 16  # absent -> floor
    # synthetic large sizes via target_bytes
    n = (tmp_path / "t.parquet").stat().st_size
    assert shards_for_table(str(tmp_path), "t", target_bytes=max(1, n // 100)) >= 100
    assert shards_for_table(str(tmp_path), "t", target_bytes=1, hi=64) == 64
