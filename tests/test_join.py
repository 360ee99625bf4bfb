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
