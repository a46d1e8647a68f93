"""Edge-case coverage for the late-round operators: behaviors the
sf-fixture parity sweep can't force (single-member groups, empty text,
all-tied ranks), driven through a minimal synthetic sf_dir."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def edge_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["", "a b c a b c", "x y z w v u"],
        "lang": ["en", "en", "fr"],
        "source": ["s0", "s0", "s1"],
        "n_chars": [0, 11, 11],
    })
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_custkey": [10, 10, 20, 30],
        "o_orderstatus": ["F"] * 4,
        "o_totalprice": [100.0, 100.0, 50.0, 75.0],
        "o_orderdate": pd.to_datetime(
            ["2024-01-01", "2024-01-11", "2024-02-01", "2024-03-01"]),
        "o_orderpriority": ["1-URGENT"] * 4,
    })
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   os.path.join(d, "orders.parquet"))
    events = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": pd.to_datetime(
            ["2024-01-01 10:00", "2024-01-01 10:05", "2024-01-02 09:00"]),
        "user_id": [7, 7, 8],
        "event_type": ["click", "click", "view"],
        "value": [1.0, 2.0, 3.0],
        "props": ["{}"] * 3,
    })
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                   os.path.join(d, "events.parquet"))
    return str(d)


def test_topn_ties_break_by_orderkey(edge_sf):
    from tabular_data_semantics_py_ray.pipelines.relational import (
        orders_topn_per_customer)

    out = orders_topn_per_customer(edge_sf, n=1).to_pandas()
    row = out[out["o_custkey"] == 10]
    # equal totalprice: the LOWER orderkey must win rank 1
    assert list(row["o_orderkey"]) == [1] and list(row["rn"]) == [1]


def test_ngram_entropy_excludes_short_docs(edge_sf):
    from tabular_data_semantics_py_ray.pipelines.relational import (
        doc_ngram_entropy)

    out = doc_ngram_entropy(edge_sf).to_pandas().set_index("doc_id")
    assert 0 not in out.index  # '' -> 1 token -> no trigram
    # 'a b c a b c' = grams [abc,bca,cab,abc]: p(abc)=1/2, others 1/4
    assert abs(out.loc[1, "entropy"] - 1.5) < 1e-9
    # all-distinct grams -> log2(4) = 2
    assert abs(out.loc[2, "entropy"] - 2.0) < 1e-9


def test_user_entropy_single_type_is_plus_zero(edge_sf):
    from tabular_data_semantics_py_ray.pipelines.relational import (
        events_user_entropy)

    out = events_user_entropy(edge_sf).to_pandas().set_index("user_id")
    # single event type -> entropy exactly +0.0 (not -0.0)
    assert out.loc[7, "entropy"] == 0.0
    assert str(out.loc[7, "entropy"]) == "0.0"


def test_lifespan_single_day_user(edge_sf):
    from tabular_data_semantics_py_ray.pipelines.relational import (
        events_user_lifespan)

    out = events_user_lifespan(edge_sf).set_index("user_id")
    assert out.loc[8, "span_days"] == 1
    assert out.loc[8, "n_active_days"] == 1
    assert out.loc[8, "density"] == 1.0


def test_interarrival_skips_single_order_customers(edge_sf):
    from tabular_data_semantics_py_ray.pipelines.relational import (
        orders_interarrival)

    out = orders_interarrival(edge_sf).to_pandas()
    assert set(out["o_custkey"]) == {10}
    assert float(out["mean_gap_days"].iloc[0]) == 10.0


def test_rfm_tiny_population(edge_sf):
    from tabular_data_semantics_py_ray.pipelines.relational import (
        customer_rfm)

    out = customer_rfm(edge_sf).to_pandas().set_index("o_custkey")
    assert len(out) == 3
    # cust 10: two orders, monetary 200 — the max spender
    assert out.loc[10, "frequency"] == 2
    assert out.loc[10, "monetary"] == 200.0
    assert out["m_score"].idxmax() == 10


def test_topn_matches_pandas_groundtruth_random(tmp_path):
    """Randomized (seeded) block-split invariance: the combiner-first
    top-n must equal the single-frame pandas rank on skewed key
    distributions (one hot customer owning most rows)."""
    from tabular_data_semantics_py_ray.pipelines.relational import (
        orders_topn_per_customer)

    rng = np.random.default_rng(7)
    n = 5000
    cust = np.where(rng.random(n) < 0.5, 1,
                    rng.integers(2, 200, n))  # hot key 1
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": cust.astype(np.int64),
        "o_orderstatus": ["F"] * n,
        "o_totalprice": np.round(rng.random(n) * 1000, 2),
        "o_orderdate": pd.to_datetime("2024-01-01"),
        "o_orderpriority": ["1-URGENT"] * n,
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "orders.parquet"))

    got = orders_topn_per_customer(str(d), n=3).to_pandas().sort_values(
        ["o_custkey", "rn"]).reset_index(drop=True)

    ref = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                         ascending=[True, False, True], kind="mergesort")
    ref["rn"] = ref.groupby("o_custkey", sort=False).cumcount() + 1
    ref = ref[ref["rn"] <= 3][["o_custkey", "o_orderkey",
                               "o_totalprice", "rn"]]
    ref["rn"] = ref["rn"].astype("int64")
    ref = ref.sort_values(["o_custkey", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)
