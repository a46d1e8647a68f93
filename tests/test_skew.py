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
