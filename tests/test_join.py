"""Generic hash_join (stages/join.py) vs pandas merge, both physical
plans (broadcast forced via a huge threshold, shuffle via threshold=0),
all six join types, including unmatched keys on both sides and a
colliding non-key column name."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _frames():
    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 40, size=200),
            "lv": rng.randint(0, 1000, size=200),
            "name": [f"l{i % 7}" for i in range(200)],
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(20, 60, size=80),  # partial key overlap
            "rv": rng.uniform(0, 1, size=80).round(6),
            "name": [f"r{i % 5}" for i in range(80)],  # collides
        }
    )
    return left, right


def _expected(left, right, how):
    if how == "semi":
        return left[left["k"].isin(set(right["k"]))].copy()
    if how == "anti":
        return left[~left["k"].isin(set(right["k"]))].copy()
    r = right.rename(columns={"name": "r_name"})
    return left.merge(r, on="k", how="outer" if how == "full" else how)


def _canon(df):
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype) in ("float64", "float32"):
            df[c] = df[c].round(6)
    # None (arrow null) and NaN (pandas merge) are the same missing value
    df = df.astype(object).where(pd.notna(df), "nan")
    cols = sorted(df.columns)
    return (
        df[cols]
        .astype(str)
        .sort_values(cols, ignore_index=True)
    )


@pytest.mark.parametrize("how", ["inner", "left", "right", "full",
                                 "semi", "anti"])
@pytest.mark.parametrize("plan", ["broadcast", "shuffle"])
def test_hash_join_matches_pandas(ray_session, how, plan):
    import ray.data as rd

    from tiny_lingua_ray.stages.join import hash_join

    if plan == "broadcast" and how in ("right", "full"):
        pytest.skip("broadcast plan only serves lookup-style joins")

    left, right = _frames()
    threshold = (1 << 40) if plan == "broadcast" else 0
    got = hash_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(3),
        on="k",
        how=how,
        broadcast_threshold=threshold,
        num_shards=8,
    ).to_pandas()
    want = _expected(left, right, how)
    assert len(got) == len(want), (how, plan, len(got), len(want))
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_hash_join_string_key(ray_session):
    import ray.data as rd

    from tiny_lingua_ray.stages.join import hash_join

    left = pd.DataFrame({"s": ["a", "b", "c", "a"], "x": [1, 2, 3, 4]})
    right = pd.DataFrame({"s": ["a", "c", "d"], "y": [10, 30, 40]})
    got = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="s",
        how="inner", broadcast_threshold=0, num_shards=4,
    ).to_pandas()
    want = left.merge(right, on="s")
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


@pytest.mark.parametrize("plan", ["broadcast", "shuffle"])
def test_hash_join_null_keys_sql_semantics(ray_session, plan):
    """NULL keys match NOTHING (SQL), even though pandas would match
    NaN to NaN; null-key left rows survive a LEFT join unmatched."""
    import ray.data as rd

    left = pd.DataFrame(
        {"k": pd.array([1, None, 2, None], dtype="Int64"),
         "lv": [10, 20, 30, 40]}
    )
    right = pd.DataFrame(
        {"k": pd.array([1, None], dtype="Int64"), "rv": [100, 200]}
    )
    from tiny_lingua_ray.stages.join import hash_join

    threshold = (1 << 40) if plan == "broadcast" else 0
    got = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k",
        how="left", broadcast_threshold=threshold, num_shards=4,
    ).to_pandas()
    assert len(got) == 4
    matched = got[got["rv"].notna()]
    assert list(matched["k"]) == [1] and list(matched["rv"]) == [100.0]

    inner = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k",
        how="inner", broadcast_threshold=threshold, num_shards=4,
    ).to_pandas()
    assert len(inner) == 1 and int(inner["lv"].iloc[0]) == 10


def test_hash_join_mixed_key_dtypes_colocate(ray_session):
    """int64 keys on one side, float64 on the other: equal values must
    still co-locate and match (shard computed AFTER the promoted
    cast)."""
    import ray.data as rd

    left = pd.DataFrame({"k": np.array([1, 2, 3], np.int64),
                         "lv": [1, 2, 3]})
    right = pd.DataFrame({"k": np.array([1.0, 3.0, 4.0], np.float64),
                          "rv": [10, 30, 40]})
    from tiny_lingua_ray.stages.join import hash_join

    got = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k",
        how="inner", broadcast_threshold=0, num_shards=4,
    ).to_pandas()
    assert sorted(got["lv"]) == [1, 3]
    assert sorted(got["rv"]) == [10, 30]


def test_hash_join_big_int_values_survive_shuffle(ray_session):
    """int64 VALUE columns above 2^53 must round-trip the shuffle plan
    exactly (no float64 transit)."""
    import ray.data as rd

    big = (1 << 53) + 1
    left = pd.DataFrame({"k": [1, 2], "lv": [big, big + 2]})
    right = pd.DataFrame({"k": [1, 2], "rv": [big + 4, big + 6]})
    from tiny_lingua_ray.stages.join import hash_join

    got = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k",
        how="inner", broadcast_threshold=0, num_shards=4,
    ).to_pandas().sort_values("k", ignore_index=True)
    assert list(got["lv"]) == [big, big + 2]
    assert list(got["rv"]) == [big + 4, big + 6]
