"""Randomized differential tests: the bucket-shuffle primitives
(``util.bucket_aggregate/bucket_distinct/bucket_join/bucket_anti_join``)
vs plain pandas on the same random frames. These primitives back every
groupby/join/dedup in the engine; skewed keys, empty buckets and
duplicate-heavy inputs are generated on purpose."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from tabular_data_semantics_py_ray.util import (
    bucket_aggregate,
    bucket_anti_join,
    bucket_distinct,
    bucket_join,
)

SEEDS = [0, 7, 1234]


def _frame(seed: int, n: int = 2000) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    # zipf-ish skew: a handful of hot keys plus a long tail
    hot = rng.randint(0, 5, size=n // 2)
    tail = rng.randint(0, 400, size=n - n // 2)
    return pd.DataFrame(
        {
            "k": np.concatenate([hot, tail]).astype(np.int64),
            "v": rng.randint(-100, 100, size=n).astype(np.int64),
            "g": rng.randint(0, 3, size=n).astype(np.int64),
        }
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_bucket_aggregate_matches_pandas(seed):
    df = _frame(seed)
    ds = rd.from_pandas(df).repartition(7)
    got = bucket_aggregate(
        ds,
        ["k", "g"],
        {
            "s": ("v", "sum"),
            "mn": ("v", "min"),
            "mx": ("v", "max"),
            "n": ("v", "count"),
        },
        num_buckets=8,
    ).to_pandas()
    want = (
        df.groupby(["k", "g"])
        .agg(s=("v", "sum"), mn=("v", "min"), mx=("v", "max"), n=("v", "size"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(
        _canon(got).astype("int64"), _canon(want).astype("int64")
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_bucket_distinct_matches_pandas(seed):
    df = _frame(seed)
    ds = rd.from_pandas(df).repartition(7)
    got = bucket_distinct(ds, ["k", "g"], num_buckets=8).to_pandas()
    want = df[["k", "g"]].drop_duplicates()
    pd.testing.assert_frame_equal(
        _canon(got).astype("int64"), _canon(want).astype("int64")
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_bucket_join_matches_pandas(seed):
    left = _frame(seed)[["k", "v"]]
    right = _frame(seed + 1000).rename(columns={"v": "w"})[["k", "w"]]
    # thin the right side so some keys have no match (and some many)
    right = right[right["k"] % 3 != 0].head(800)
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(3)
    got = bucket_join(
        lds,
        rds,
        key="k",
        left_cols={"v": pa.int64()},
        right_cols={"w": pa.int64()},
        num_buckets=8,
    ).to_pandas()
    want = left.merge(right, on="k", how="inner")
    pd.testing.assert_frame_equal(
        _canon(got).astype("int64"), _canon(want).astype("int64")
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_bucket_left_join_matches_pandas(seed):
    left = _frame(seed)[["k", "v"]]
    right = _frame(seed + 1000).rename(columns={"v": "w"})[["k", "w"]]
    # thin the right side so some left keys have NO match (the outer rows)
    right = right[right["k"] % 3 != 0].head(800)
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(3)
    got = bucket_join(
        lds,
        rds,
        key="k",
        left_cols={"v": pa.int64()},
        right_cols={"w": pa.int64()},
        num_buckets=8,
        how="left",
    ).to_pandas()
    want = left.merge(right, on="k", how="left")
    assert len(got) == len(want)
    # unmatched right payload must surface as nulls, matched as values
    pd.testing.assert_frame_equal(
        _canon(got).astype({"k": "int64", "v": "int64", "w": "float64"}),
        _canon(want).astype({"k": "int64", "v": "int64", "w": "float64"}),
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_bucket_full_join_matches_pandas(seed):
    left = _frame(seed)[["k", "v"]].head(900)
    right = _frame(seed + 1000).rename(columns={"v": "w"})[["k", "w"]]
    # thin BOTH sides differently so each has keys the other lacks
    left = left[left["k"] % 5 != 0]
    right = right[right["k"] % 3 != 0].head(800)
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(3)
    got = bucket_join(
        lds,
        rds,
        key="k",
        left_cols={"v": pa.int64()},
        right_cols={"w": pa.int64()},
        num_buckets=8,
        how="full",
    ).to_pandas()
    want = left.merge(right, on="k", how="outer")
    assert len(got) == len(want)
    types = {"k": "int64", "v": "float64", "w": "float64"}
    pd.testing.assert_frame_equal(
        _canon(got).astype(types), _canon(want).astype(types)
    )


def test_bucket_join_rejects_unknown_how():
    df = pd.DataFrame({"k": [1], "v": [2]})
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError):
        bucket_join(ds, ds, key="k", left_cols={"v": pa.int64()},
                    right_cols={}, how="outer")


@pytest.mark.parametrize("seed", SEEDS)
def test_bucket_anti_join_matches_pandas(seed):
    left = _frame(seed)[["k", "v"]]
    right = _frame(seed + 2000)[["k"]].head(700)
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(3)
    got = bucket_anti_join(
        lds, rds, key="k", left_cols={"v": pa.int64()}, num_buckets=8
    ).to_pandas()
    want = left[~left["k"].isin(set(right["k"]))]
    pd.testing.assert_frame_equal(
        _canon(got).astype("int64"), _canon(want).astype("int64")
    )


def test_bucket_anti_join_empty_right():
    left = _frame(3)[["k", "v"]]
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64")}))
    got = bucket_anti_join(
        lds, rds, key="k", left_cols={"v": pa.int64()}, num_buckets=8
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(got).astype("int64"), _canon(left).astype("int64")
    )


def test_adaptive_widths_track_cluster(ray_session):
    from tabular_data_semantics_py_ray.util import adaptive_buckets, fanout_blocks

    # session fixture runs at num_cpus=4 -> floor values
    assert adaptive_buckets() == 8
    assert fanout_blocks() == 4
    assert fanout_blocks(0.25, lo=4) == 4
    # bounds hold for any multiplier
    assert adaptive_buckets(multiplier=100000) == 65536
    assert fanout_blocks(frac=100000.0) == 4096
