"""Relational operator pipelines over the TPC-H-ish tables — exercises the
SURVEY §2.4/§2.5/§2.6 join / aggregate / top-k operator families with
oracle-checkable outputs.

Scale notes per query are inline: small sides are broadcast (ray.put +
in-actor merge, J6 semantics), large-large joins use the hash-partitioned
``Dataset.join``, aggregates pre-combine per batch before the shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def q1_pricing(sf_dir: str):
    """TPC-H Q1-shaped aggregate (G1 two-phase counting analogue):
    per (l_returnflag, l_linestatus): sum_qty, sum_base_price, sum_disc_price,
    n_rows. Pre-aggregated per batch, then a tiny groupby."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(disc_price=b["l_extendedprice"] * (1 - b["l_discount"]))
        g = (
            b.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                n_rows=("l_quantity", "size"),
            )
            .reset_index()
        )
        g["n_rows"] = g["n_rows"].astype("int64")
        return g

    agg = (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )

    def _round(b: pd.DataFrame) -> pd.DataFrame:
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            b[c] = b[c].round(2)
        return b

    return agg.map_batches(_round, batch_format="pandas")


class _CustNationJoiner:
    """Broadcast customer->nation-name map (small dims, J6 broadcast join)."""

    def __init__(self, map_ref):
        self.cust2nation = ray.get(map_ref)  # DataFrame(o_custkey, n_name)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        return b.merge(self.cust2nation, on="o_custkey", how="inner")


def revenue_by_nation(sf_dir: str, *, num_partitions: int = 8):
    """revenue per nation: lineitem JOIN orders (large-large, hash-partitioned
    Dataset.join) JOIN customer JOIN nation (broadcast small side)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    cust2nation = cust.merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )[["c_custkey", "n_name"]].rename(columns={"c_custkey": "o_custkey"})
    map_ref = ray.put(cust2nation)

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    with_nation = joined.map_batches(
        _CustNationJoiner,
        fn_constructor_kwargs={"map_ref": map_ref},
        batch_format="pandas",
        concurrency=(1, 4),
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(revenue=b["l_extendedprice"] * (1 - b["l_discount"]))
        return b.groupby("n_name", sort=False)["revenue"].sum().reset_index()

    agg = (
        with_nation.map_batches(_partial, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    return agg.map_batches(
        lambda b: b.assign(revenue=b["revenue"].round(2)), batch_format="pandas"
    )


def top_parts_by_revenue(sf_dir: str, *, k: int = 10):
    """top-k partkeys by revenue (T-family): two-phase sum -> sort desc ->
    limit k -> broadcast-join part names. Deterministic tie-break
    (revenue desc, p_partkey asc)."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(revenue=b["l_extendedprice"] * (1 - b["l_discount"]))
        return b.groupby("l_partkey", sort=False)["revenue"].sum().reset_index()

    from ..util import bucket_aggregate

    agg = bucket_aggregate(
        li.map_batches(_partial, batch_format="pandas"),
        ["l_partkey"],
        {"revenue": ("revenue", "sum")},
    )
    top = agg.sort(["revenue", "l_partkey"], descending=[True, False]).limit(k)
    top_df = top.to_pandas()  # k rows — driver-side is fine
    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    out = top_df.merge(part, left_on="l_partkey", right_on="p_partkey")
    out["revenue"] = out["revenue"].round(2)
    return out[["p_partkey", "p_name", "revenue"]]


def events_by_type(sf_dir: str):
    """events census: per event_type n_events, n_users (two-phase distinct:
    groupby pair first — no per-group nunique), sum_value."""
    ev = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("event_type", sort=False).agg(
            n_events=("user_id", "size"), sum_value=("value", "sum")
        ).reset_index()
        g["n_events"] = g["n_events"].astype("int64")
        return g

    totals = (
        ev.map_batches(_partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value"))
    ).to_pandas()

    from ..util import bucket_aggregate, bucket_distinct

    distinct_pairs = bucket_distinct(
        ev.select_columns(["event_type", "user_id"]), ["event_type", "user_id"]
    )
    pairs = bucket_aggregate(
        distinct_pairs, ["event_type"], {"n_users": ("user_id", "count")}
    ).to_pandas()

    out = totals.merge(pairs, on="event_type")
    out["sum_value"] = out["sum_value"].round(2)
    out["n_users"] = out["n_users"].astype("int64")
    return out[["event_type", "n_events", "n_users", "sum_value"]]


def token_freq_topk(sf_dir: str, *, k: int = 20):
    """global token frequency top-k: per-batch partial counts (combiner)
    before the tiny groupby — the canonical pre-aggregated wide shuffle."""
    import pyarrow.compute as pc

    docs = _read(sf_dir, "documents", ["text"])

    def _partial(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat = pc.list_flatten(pc.split_pattern(texts, " "))
        vc = flat.value_counts()
        return pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts")], names=["token", "n"]
        )

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    out = agg.sort(["n", "token"], descending=[True, False]).limit(k)
    return out
