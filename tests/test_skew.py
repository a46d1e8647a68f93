"""Hot-key / skew handling (north rule: explicit skew splitting).

A synthetic stream where ONE key covers 60% of all rows must (a) aggregate
correctly and (b) never ship more than one partial row per (batch, key) into
the shuffle — the combiner bound that makes a hot key harmless.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from tabular_data_semantics_py_ray.util import bucket_aggregate, bucket_distinct


def _skewed_ds(n=200_000, hot_share=0.6, n_cold=5_000, seed=7):
    rng = np.random.RandomState(seed)
    hot = int(n * hot_share)
    keys = np.concatenate(
        [np.full(hot, "HOT"), rng.choice([f"k{i}" for i in range(n_cold)], n - hot)]
    )
    rng.shuffle(keys)
    return rd.from_arrow(
        pa.table({"key": keys, "v": np.arange(n, dtype=np.int64) % 97})
    ).repartition(16), keys


def test_skewed_count_correct_and_bounded():
    ds, keys = _skewed_ds()
    out = bucket_aggregate(
        ds, ["key"], {"n": ("v", "count"), "s": ("v", "sum")}, num_buckets=32
    ).to_pandas()
    truth = pd.DataFrame({"key": keys}).groupby("key").size()
    got = out.set_index("key")["n"]
    assert got["HOT"] == truth["HOT"]
    assert len(out) == truth.shape[0]
    assert (got.sort_index() == truth.sort_index()).all()


def test_partials_bounded_per_batch():
    """The shuffle input contains at most one row per (batch, key): measure
    by intercepting the partial stage output size for a 120k-row hot key."""
    ds, _ = _skewed_ds(n=120_000, hot_share=0.9, n_cold=10)
    # partial stage = what bucket_aggregate ships: re-create it directly
    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["key"], sort=False).size().reset_index(name="n")

    partial_rows = ds.map_batches(_partial, batch_format="pandas").count()
    # 120k input rows collapse to <= (n_batches * n_keys) partial rows
    assert partial_rows < 1000


def test_skewed_distinct():
    ds, keys = _skewed_ds(n=100_000)
    out = bucket_distinct(ds, ["key"]).to_pandas()
    assert sorted(out["key"]) == sorted(set(keys))


def test_salted_join_equals_plain_on_hot_key():
    """bucket_join_salted output equals both the unsalted bucket_join and
    a pandas merge on a corpus where ONE dim key owns 60% of fact rows —
    the skew regime the salt exists for. Also verifies the many-to-one
    replication never duplicates or drops a fact row."""
    from tabular_data_semantics_py_ray.util import (bucket_join,
                                                    bucket_join_salted)

    rng = np.random.RandomState(3)
    n = 60_000
    keys = np.where(rng.rand(n) < 0.6, 7,
                    rng.randint(0, 500, n)).astype(np.int64)
    fact = pd.DataFrame({"k": keys, "fid": np.arange(n, dtype=np.int64)})
    dim = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                        "attr": [f"a{i}" for i in range(500)]})

    fact_ds = rd.from_pandas(fact).repartition(16)
    dim_ds = rd.from_pandas(dim).repartition(4)

    salted = bucket_join_salted(
        fact_ds, dim_ds, key="k",
        fact_cols={"fid": pa.int64()}, dim_cols={"attr": pa.string()},
        salts=8, num_buckets=32).to_pandas()
    plain = bucket_join(
        fact_ds, dim_ds, key="k",
        left_cols={"fid": pa.int64()}, right_cols={"attr": pa.string()},
        num_buckets=32).to_pandas()
    want = fact.merge(dim, on="k")

    for df in (salted, plain):
        assert len(df) == n  # every fact row exactly once (dim is unique)
    a = salted.sort_values(["k", "fid"]).reset_index(drop=True)[
        ["k", "fid", "attr"]]
    b = plain.sort_values(["k", "fid"]).reset_index(drop=True)[
        ["k", "fid", "attr"]]
    c = want.sort_values(["k", "fid"]).reset_index(drop=True)[
        ["k", "fid", "attr"]]
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)
