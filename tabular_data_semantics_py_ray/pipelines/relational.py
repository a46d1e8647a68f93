"""Relational + corpus-management operator pipelines over the TPC-H-ish
tables — the SURVEY §2.4/§2.5/§2.6 join / aggregate / top-k families plus
the training-data ops a 100 TB pipeline needs (windows, as-of and interval
joins, TF-IDF, contamination, quantiles, inverted index, splits,
centroids), all with oracle-checkable outputs.

Scale notes per query are inline: small sides are broadcast (ray.put +
in-actor merge, J6 semantics), large-large joins use the hash-partitioned
bucket shuffle, aggregates pre-combine per batch before the shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..util import _to_arrow, fanout_blocks, list_column_matrix


def _read(sf_dir: str, table: str, columns=None, blocks: int | None = None):
    """Column-pruned read; ``blocks`` fans a single-row-group file out so
    task-pool stages parallelize (the test parquet has one row group, which
    Ray cannot split at read time — a shuffle-free repartition split).

    The repartition only runs when it INCREASES parallelism (file count
    below the fan-out target). Repartitioning a many-file table DOWN to
    the target is catastrophic: it coalesces into few giant multi-chunk
    blocks — measured 87 s vs 7.7 s for one map_batches pass over a
    5M-doc/50-file staged corpus (26x) — while adding nothing.
    """
    from ..util import guarded_fanout, read_parquet_clean

    path = os.path.join(sf_dir, f"{table}.parquet")
    ds = read_parquet_clean(path, columns=columns)
    return guarded_fanout(ds, path, blocks) if blocks else ds


def q1_pricing(sf_dir: str):
    """TPC-H Q1-shaped aggregate (G1 two-phase counting analogue):
    per (l_returnflag, l_linestatus): sum_qty, sum_base_price, sum_disc_price,
    n_rows. Pre-aggregated per batch, then a tiny groupby."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
        blocks=fanout_blocks(),
    )

    def _partial(t: pa.Table) -> pa.Table:
        # Arrow-native combiner: corpus-sized input batches never convert
        # to pandas; the C++ hash aggregate emits tiny per-batch partials
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        g = pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty": t.column("l_quantity"),
            "base": t.column("l_extendedprice"),
            "disc": disc,
        }).group_by(["l_returnflag", "l_linestatus"],
                    use_threads=False).aggregate(
            [("qty", "sum"), ("base", "sum"), ("disc", "sum"),
             ("qty", "count")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "sum_qty": g.column("qty_sum"),
            "sum_base_price": g.column("base_sum"),
            "sum_disc_price": g.column("disc_sum"),
            "n_rows": g.column("qty_count").cast(pa.int64()),
        })

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
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


def revenue_by_nation(sf_dir: str, *, num_buckets: int = 16):
    """revenue per nation, fully distributed:

    lineitem --(combiner by orderkey)--> JOIN orders (hash-partitioned)
    --(combiner by custkey)--> JOIN customer (hash-partitioned, with the
    25-row nation naming + per-bucket partial sum fused INTO the join
    bucket) --> shuffle-free coalesce + final sum.

    Scale shape (round-2 fix of the VERDICT's 'customer-map broadcast'
    finding): customer is O(SF) and is JOINED distributed, never broadcast
    or collected to the driver; only the 25-row nation table ships in the
    bucket-fn closure. Exactly TWO all-to-alls (the classic distributed
    TPC-H Q5 minimum); the final reduce input is <= num_buckets x 25 rows,
    so it coalesces without a shuffle instead of paying a third
    sort-barrier.
    """
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"],
               blocks=fanout_blocks())
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"], blocks=fanout_blocks(0.5))
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"], blocks=fanout_blocks(0.25))

    from ..util import bucket_aggregate, bucket_join

    def _li_partial(t: pa.Table) -> pa.Table:
        # Arrow-native combiner over the corpus-sized lineitem batches
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        g = pa.table({"l_orderkey": t.column("l_orderkey"), "revenue": rev}) \
            .group_by("l_orderkey", use_threads=False) \
            .aggregate([("revenue", "sum")])
        return g.select(["l_orderkey", "revenue_sum"]).rename_columns(
            ["l_orderkey", "revenue"])

    li_part = li.map_batches(_li_partial, batch_format="pyarrow")
    j1 = bucket_join(
        li_part, orders, key="l_orderkey", right_key="o_orderkey",
        left_cols={"revenue": pa.float64()},
        right_cols={"o_custkey": pa.int64()},
        num_buckets=num_buckets,
    )

    def _cust_partial(t: pa.Table) -> pa.Table:
        g = t.select(["o_custkey", "revenue"]) \
            .group_by("o_custkey", use_threads=False) \
            .aggregate([("revenue", "sum")])
        return g.select(["o_custkey", "revenue_sum"]).rename_columns(
            ["o_custkey", "revenue"])

    cust_part = j1.map_batches(_cust_partial, batch_format="pyarrow")

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nation = nation.rename(columns={"n_nationkey": "c_nationkey"})

    def _name_and_combine(df: pd.DataFrame) -> pd.DataFrame:
        # runs inside the join bucket: nation naming (25-row closure map)
        # + partial sum, so no third shuffle is needed downstream
        df = df.merge(nation, on="c_nationkey", how="inner")
        return df.groupby("n_name", sort=False)["revenue"].sum().reset_index()

    j2 = bucket_join(
        cust_part, customer, key="o_custkey", right_key="c_custkey",
        left_cols={"revenue": pa.float64()},
        right_cols={"c_nationkey": pa.int64()},
        num_buckets=num_buckets,
        post=_name_and_combine,
    )

    def _final(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("n_name", sort=False)["revenue"].sum().reset_index()
        return out.assign(revenue=out["revenue"].round(2))

    # <= num_buckets x 25 partial rows: coalesce (narrow, no sort barrier)
    return j2.repartition(1).map_batches(
        _final, batch_format="pandas", batch_size=None
    )


def top_parts_by_revenue(sf_dir: str, *, k: int = 10):
    """top-k partkeys by revenue (T-family): two-phase sum -> sort desc ->
    limit k -> broadcast-join part names. Deterministic tie-break
    (revenue desc, p_partkey asc)."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"],
               blocks=fanout_blocks())

    def _partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        g = pa.table({"l_partkey": t.column("l_partkey"), "revenue": rev}) \
            .group_by("l_partkey", use_threads=False) \
            .aggregate([("revenue", "sum")])
        return g.select(["l_partkey", "revenue_sum"]).rename_columns(
            ["l_partkey", "revenue"])

    from ..util import bucket_aggregate

    agg = bucket_aggregate(
        li.map_batches(_partial, batch_format="pyarrow"),
        ["l_partkey"],
        {"revenue": ("revenue", "sum")},
    )
    top = agg.sort(["revenue", "l_partkey"], descending=[True, False]).limit(k)
    top_df = top.to_pandas()  # k rows — driver-side is fine
    # name the k winners via predicate+column pushdown: only row groups
    # containing the k keys leave storage (never the whole part table)
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name"],
        filters=[("p_partkey", "in", top_df["l_partkey"].tolist())],
    ).to_pandas()
    out = top_df.merge(part, left_on="l_partkey", right_on="p_partkey")
    out["revenue"] = out["revenue"].round(2)
    return out[["p_partkey", "p_name", "revenue"]]


def events_by_type(sf_dir: str):
    """events census: per event_type n_events, n_users (two-phase distinct:
    groupby pair first — no per-group nunique), sum_value."""
    ev = _read(sf_dir, "events", ["event_type", "user_id", "value"], blocks=fanout_blocks(0.5))

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type", use_threads=False).aggregate(
            [("user_id", "count"), ("value", "sum")])
        return pa.table({
            "event_type": g.column("event_type"),
            "n_events": g.column("user_id_count").cast(pa.int64()),
            "sum_value": g.column("value_sum"),
        })

    totals = (
        ev.map_batches(_partial, batch_format="pyarrow")
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

    docs = _read(sf_dir, "documents", ["text"], blocks=fanout_blocks(0.25))

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


def events_sessionize(sf_dir: str, *, gap_minutes: int = 30):
    """Session windows (streaming-shaped op, SURVEY §2.9 note): events per
    user sorted by ts; a gap > ``gap_minutes`` starts a new session.
    -> (user_id, session_idx, n_events). Implemented as a bucket shuffle on
    user_id with vectorized per-bucket windowing — the groupby(key).
    map_groups pattern the guide prescribes for stream-shaped references."""
    import numpy as np

    from ..util import bucket_map_keyed

    ev = _read(sf_dir, "events", ["user_id", "ts"], blocks=fanout_blocks(0.5))
    gap = np.timedelta64(gap_minutes * 60, "s")

    def _sessions(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts"], kind="mergesort")
        ts = b["ts"].to_numpy()
        uid = b["user_id"].to_numpy()
        new_user = np.empty(len(b), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap_break = np.empty(len(b), dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap
        new_session = new_user | gap_break
        # session_idx restarts at 1 per user
        sess_global = np.cumsum(new_session)
        first_of_user = np.zeros(len(b), dtype=np.int64)
        idx_new_user = np.nonzero(new_user)[0]
        first_of_user[idx_new_user] = sess_global[idx_new_user]
        first_of_user = np.maximum.accumulate(first_of_user)
        b = b.assign(session_idx=(sess_global - first_of_user + 1).astype("int64"))
        out = (
            b.groupby(["user_id", "session_idx"], sort=False)
            .size()
            .reset_index(name="n_events")
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return bucket_map_keyed(ev, ["user_id"], _sessions)


def events_tumbling_1h(sf_dir: str):
    """Tumbling 1-hour windows per event_type:
    (event_type, hour_bucket, n_events, sum_value)."""
    import numpy as np

    from ..util import bucket_aggregate

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"], blocks=fanout_blocks(0.5))

    def _window(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64())  # microseconds since epoch
        hour = pa.array(
            (ts.to_numpy(zero_copy_only=False) // 3_600_000_000).astype("int64")
        )
        return pa.Table.from_arrays(
            [t.column("event_type"), hour, t.column("value")],
            names=["event_type", "hour_bucket", "value"],
        )

    keyed = ev.map_batches(_window, batch_format="pyarrow")
    agg = bucket_aggregate(
        keyed,
        ["event_type", "hour_bucket"],
        {"n_events": ("value", "count"), "sum_value": ("value", "sum")},
    )
    return agg.map_batches(
        lambda b: b.assign(sum_value=b["sum_value"].round(2)), batch_format="pandas"
    )


def embedding_label_stats(sf_dir: str):
    """per label: n vectors and mean L2 norm (rounded) —
    (label, n, avg_norm)."""
    import numpy as np

    from ..util import bucket_aggregate

    emb = _read(sf_dir, "embeddings", ["label", "embedding"], blocks=fanout_blocks(0.25))

    def _norms(t: pa.Table) -> pa.Table:
        X = list_column_matrix(t.column("embedding"))
        return pa.Table.from_arrays(
            [t.column("label").cast(pa.int64()),
             pa.array(np.sqrt((X * X).sum(axis=1)))],
            names=["label", "norm"],
        )

    agg = bucket_aggregate(
        emb.map_batches(_norms, batch_format="pyarrow"),
        ["label"],
        {"n": ("norm", "count"), "sum_norm": ("norm", "sum")},
        num_buckets=8,
    )

    def _final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(avg_norm=(b["sum_norm"] / b["n"]).round(4))
        return b[["label", "n", "avg_norm"]]

    return agg.map_batches(_final, batch_format="pandas")


def events_sliding_1h15m(sf_dir: str, *, window_us: int = 3_600_000_000,
                         slide_us: int = 900_000_000):
    """Sliding-window aggregate per event_type (1 h window sliding every
    15 min): (event_type, window_start, n_events, sum_value).

    Each event belongs to ``window_us / slide_us`` consecutive windows, so
    the expansion is a bounded vectorized flat-map (numpy repeat/tile, one
    output row per (event, window)); the aggregate is the same two-phase
    bucket shuffle as the tumbling operator — per-batch partials collapse
    the k-fold expansion before anything moves.
    """
    import numpy as np

    from ..util import bucket_aggregate

    k = window_us // slide_us
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"],
               blocks=fanout_blocks(0.5))

    def _expand(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        slot = ts // slide_us
        n = len(slot)
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        offs = np.tile(np.arange(k, dtype=np.int64), n)
        start = (np.repeat(slot, k) - offs) * slide_us
        return pa.Table.from_arrays(
            [t.column("event_type").take(rep), pa.array(start),
             t.column("value").take(rep)],
            names=["event_type", "window_start", "value"])

    keyed = ev.map_batches(_expand, batch_format="pyarrow")
    agg = bucket_aggregate(
        keyed,
        ["event_type", "window_start"],
        {"n_events": ("value", "count"), "sum_value": ("value", "sum")},
    )
    return agg.map_batches(
        lambda b: b.assign(sum_value=b["sum_value"].round(2)), batch_format="pandas"
    )


def events_last_order_asof(sf_dir: str):
    """As-of join — a join shape Ray Data has no native operator for:
    each event is joined to the SAME USER's latest order at or before the
    event timestamp (ties on order date broken by max o_orderkey, made
    deterministic on both engine and oracle side).

    Ray shape: events and orders are tagged into one superset schema and
    co-located by ``user_id`` with ONE bucket shuffle; each bucket runs a
    vectorized ``pandas.merge_asof`` (backward direction). Partitioning
    assumption: all rows of one user share a bucket (guaranteed — the
    bucket key IS the user id), and a single user's history fits a worker;
    timestamps are emitted as epoch microseconds (int64) so the oracle
    compare is exact. Inner semantics: events before the user's first
    order are dropped.
    """
    from ..util import bucket_map_keyed

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"],
               blocks=fanout_blocks(0.5))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
                   blocks=fanout_blocks(0.25))

    def _tag_ev(t: pa.Table) -> pa.Table:
        n = t.num_rows
        import numpy as np
        return pa.Table.from_arrays(
            [t.column("user_id").cast(pa.int64()),
             pa.array(np.zeros(n, dtype=np.int8)),
             t.column("event_id").cast(pa.int64()),
             t.column("ts").cast(pa.int64()),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pa.array(np.full(n, -1, dtype=np.int64))],
            names=["user_id", "_side", "event_id", "ts_us",
                   "o_orderkey", "order_date_us"])

    def _tag_od(t: pa.Table) -> pa.Table:
        n = t.num_rows
        import numpy as np
        return pa.Table.from_arrays(
            [t.column("o_custkey").cast(pa.int64()),
             pa.array(np.ones(n, dtype=np.int8)),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pa.array(np.full(n, -1, dtype=np.int64)),
             t.column("o_orderkey").cast(pa.int64()),
             t.column("o_orderdate").cast(pa.int64())],
            names=["user_id", "_side", "event_id", "ts_us",
                   "o_orderkey", "order_date_us"])

    tagged = ev.map_batches(_tag_ev, batch_format="pyarrow").union(
        orders.map_batches(_tag_od, batch_format="pyarrow"))

    def _asof(g: pd.DataFrame) -> pd.DataFrame:
        e = (g.loc[g["_side"] == 0, ["event_id", "user_id", "ts_us"]]
             .sort_values("ts_us", kind="mergesort"))
        o = (g.loc[g["_side"] == 1,
                   ["user_id", "order_date_us", "o_orderkey"]]
             .sort_values(["order_date_us", "o_orderkey"], kind="mergesort"))
        if len(e) == 0 or len(o) == 0:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ts_us": pd.Series([], dtype="int64"),
                "o_orderkey": pd.Series([], dtype="int64"),
                "order_date_us": pd.Series([], dtype="int64"),
            })
        m = pd.merge_asof(e, o, left_on="ts_us", right_on="order_date_us",
                          by="user_id", direction="backward")
        m = m[m["o_orderkey"].notna()]
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "ts_us": m["ts_us"].astype("int64"),
            "o_orderkey": m["o_orderkey"].astype("int64"),
            "order_date_us": m["order_date_us"].astype("int64"),
        })

    return bucket_map_keyed(tagged, ["user_id"], _asof)


def orders_ship_window(sf_dir: str, *, window_days: int = 3):
    """Range (interval) join WITHOUT an equi-key — a join shape Ray Data has
    no native operator for: count/sum the lineitems (of ANY order) whose
    ship date falls in each order's window
    ``[o_orderdate, o_orderdate + window_days)``.

    Ray shape (the textbook distributed interval join): pick a coarse time
    bucket (1 day); every ORDER is replicated to each day-bucket its window
    overlaps (bounded fan-out of ``window_days + 1`` rows), every LINEITEM
    goes to exactly ONE bucket (its ship day) — so each (item, order) pair
    meets in exactly one bucket and is tested exactly once, no pair dedup
    needed. Inside a bucket the join is O(n log n), not O(n*m): order starts
    are sorted and each item's matching orders are the contiguous
    searchsorted slice ``start in (ts - window, ts]``; per-order partial
    sums come from a difference array over that slice (add at lo, subtract
    at hi, cumsum) — no pair materialization at all. Partial
    (o_orderkey, n, sum) rows then collapse in a tiny second-phase groupby.
    Partitioning assumption: one day-bucket fits a worker (salt the day key
    with an item-hash suffix and replicate orders per salt if a single day
    is ever hot).
    """
    from ..util import bucket_aggregate, bucket_map_keyed

    DAY_US = 86_400_000_000
    win_us = window_days * DAY_US
    items = _read(sf_dir, "lineitem", ["l_shipdate", "l_quantity"],
                  blocks=fanout_blocks(0.5))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"],
                   blocks=fanout_blocks(0.25))

    def _tag_it(t: pa.Table) -> pa.Table:
        ts = t.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n = len(ts)
        return pa.Table.from_arrays(
            [pa.array(ts // DAY_US), pa.array(np.zeros(n, dtype=np.int8)),
             pa.array(ts), t.column("l_quantity"),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pa.array(np.full(n, -1, dtype=np.int64))],
            names=["day", "_side", "ts_us", "value", "o_orderkey", "start_us"])

    def _tag_od(t: pa.Table) -> pa.Table:
        start = t.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        okey = t.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        first_day = start // DAY_US
        last_day = (start + win_us - 1) // DAY_US
        n_days = (last_day - first_day + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(start), dtype=np.int64), n_days)
        # per-replica day offset: 0..n_days[i]-1
        offs = np.arange(len(rep), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_days)[:-1])), n_days)
        day = first_day[rep] + offs
        m = len(rep)
        return pa.Table.from_arrays(
            [pa.array(day), pa.array(np.ones(m, dtype=np.int8)),
             pa.array(np.full(m, -1, dtype=np.int64)),
             pa.array(np.zeros(m, dtype=np.float64)),
             pa.array(okey[rep]), pa.array(start[rep])],
            names=["day", "_side", "ts_us", "value", "o_orderkey", "start_us"])

    tagged = items.map_batches(_tag_it, batch_format="pyarrow").union(
        orders.map_batches(_tag_od, batch_format="pyarrow"))

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["_side"] == 0]
        # several day-buckets hash into one group; an order's replicas are
        # identical except day, and the join predicate is exact, so dedup by
        # key — each (item, order) pair still meets here exactly once (the
        # item's day is among the order's replicated days by construction)
        o = g[g["_side"] == 1].drop_duplicates(subset=["o_orderkey"])
        empty = pd.DataFrame({
            "o_orderkey": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "sum_value": pd.Series([], dtype="float64"),
        })
        if len(e) == 0 or len(o) == 0:
            return empty
        starts = o["start_us"].to_numpy()
        order_idx = np.argsort(starts, kind="stable")
        starts = starts[order_idx]
        okeys = o["o_orderkey"].to_numpy()[order_idx]
        ts = e["ts_us"].to_numpy()
        vals = e["value"].to_numpy()
        # start in (ts - win, ts]  <=>  o_orderdate <= ts < o_orderdate + win
        lo = np.searchsorted(starts, ts - win_us, side="right")
        hi = np.searchsorted(starts, ts, side="right")
        m = len(starts)
        cnt_d = np.zeros(m + 1, dtype=np.int64)
        val_d = np.zeros(m + 1, dtype=np.float64)
        np.add.at(cnt_d, lo, 1)
        np.add.at(cnt_d, hi, -1)
        np.add.at(val_d, lo, vals)
        np.add.at(val_d, hi, -vals)
        cnt = np.cumsum(cnt_d[:-1])
        sums = np.cumsum(val_d[:-1])
        keep = cnt > 0
        if not keep.any():
            return empty
        return pd.DataFrame({
            "o_orderkey": okeys[keep],
            "n": cnt[keep],
            "sum_value": sums[keep],
        })

    partials = bucket_map_keyed(tagged, ["day"], _bucket)
    agg = bucket_aggregate(
        partials, ["o_orderkey"],
        {"n_items": ("n", "sum"), "sum_qty": ("sum_value", "sum")})
    return agg.map_batches(
        lambda b: _to_arrow(b.assign(sum_qty=b["sum_qty"].round(2))),
        batch_format="pandas")


def doc_tfidf_topk(sf_dir: str, *, k: int = 5):
    """Per-document TF-IDF top-k terms — the broadcast-small-side corpus
    scorer. Document frequencies reduce with a per-batch combiner + one tiny
    token groupby; the (token -> df) map is put in the object store ONCE
    (``ray.put``, zero-copy read per task) and the corpus is then scored in
    a SINGLE shuffle-free pass: a document's tokens are batch-local by
    construction, so tf, the tf*idf score and the per-doc top-k never leave
    the batch.

    At 100 TB the df map is vocabulary-sized: prune it (min_df / top-V)
    before the broadcast, or swap the broadcast for ``util.bucket_join`` on
    token (one corpus shuffle instead of a driver-held vocab). idf values
    are computed once per distinct df with scalar ``math.log`` so the oracle
    (libm ln) sees bit-identical doubles.
    """
    import math

    import pyarrow.compute as pc

    from ..util import bucket_aggregate

    # metadata-only count (works for single-file and directory tables)
    from ..util import read_parquet_clean

    n_docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]).count()
    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))

    def _pairs(t: pa.Table):
        """Per-batch (doc_idx, token_code, tf) via dictionary codes."""
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(texts, " ")
        flat = pc.list_flatten(toks)
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = denc.dictionary
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pair = doc_idx * len(vocab) + codes
        upair, tf = np.unique(pair, return_counts=True)
        return upair // len(vocab), (upair % len(vocab)), tf, vocab

    def _df_partial(t: pa.Table) -> pa.Table:
        doc_of, code_of, _, vocab = _pairs(t)
        dfp = np.bincount(code_of, minlength=len(vocab))
        return pa.Table.from_arrays(
            [vocab, pa.array(dfp.astype(np.int64))], names=["token", "df"])

    df_tbl = bucket_aggregate(
        docs.map_batches(_df_partial, batch_format="pyarrow", batch_size=None),
        ["token"], {"df": ("df", "sum")},
    ).to_pandas()
    toks_sorted = np.sort(df_tbl["token"].to_numpy())
    order = np.argsort(df_tbl["token"].to_numpy(), kind="stable")
    dfs_sorted = df_tbl["df"].to_numpy()[order]
    # idf per distinct df with scalar libm log (bit-parity with DuckDB ln)
    idf_of_df = {int(d): math.log(n_docs / int(d))
                 for d in np.unique(dfs_sorted)}
    idf_sorted = np.array([idf_of_df[int(d)] for d in dfs_sorted])
    df_ref = ray.put((toks_sorted, idf_sorted))

    def _score(t: pa.Table) -> pa.Table:
        toks_g, idf_g = ray.get(df_ref)
        doc_of, code_of, tf, vocab = _pairs(t)
        vtok = vocab.to_numpy(zero_copy_only=False)
        gidx = np.searchsorted(toks_g, vtok)
        score = tf * idf_g[gidx][code_of]
        tok_strs = vtok[code_of]
        order = np.lexsort((tok_strs, -score, doc_of))
        d = doc_of[order]
        starts = np.concatenate(([0], np.flatnonzero(d[1:] != d[:-1]) + 1))
        sizes = np.diff(np.concatenate((starts, [len(d)])))
        rank = np.arange(len(d)) - np.repeat(starts, sizes)
        keep = order[rank < k]
        doc_ids = t.column("doc_id").cast(pa.int64())
        return pa.Table.from_arrays(
            [doc_ids.take(pa.array(doc_of[keep])),
             # explicit type: an empty object array would infer null and
             # produce a block-schema mismatch on empty batches
             pa.array(tok_strs[keep], type=pa.string()),
             pa.array(tf[keep].astype(np.int64)),
             pa.array(np.round(score[keep], 6), type=pa.float64())],
            names=["doc_id", "token", "tf", "score"])

    return docs.map_batches(_score, batch_format="pyarrow", batch_size=None)


def doc_len_quantiles(sf_dir: str):
    """Exact distributed order statistics WITHOUT a global sort: p50/p90/p99
    of ``n_chars`` per language, DuckDB ``quantile_disc`` semantics (the
    sorted element at 0-based index ``ceil(q*n) - 1``).

    Ray shape: the counting-sort quantile — per-batch (lang, n_chars)
    histogram partials collapse in one tiny bucket shuffle (output is
    |langs| x |distinct lengths|, corpus-size-independent), then each lang's
    order statistic is read off the cumulative counts. Scales to any corpus
    whose VALUE DOMAIN is bounded (here: document lengths); for unbounded /
    continuous domains swap the exact histogram for fixed-width bins + a
    second targeted pass, same shuffle shape.
    """
    from ..util import bucket_aggregate, bucket_map_keyed

    docs = _read(sf_dir, "documents", ["lang", "n_chars"],
                 blocks=fanout_blocks(0.25))
    hist = bucket_aggregate(docs, ["lang", "n_chars"],
                            {"cnt": ("n_chars", "count")})

    def _stats(g: pd.DataFrame) -> pd.DataFrame:
        import math

        out = []
        for lang, grp in g.groupby("lang", sort=False):
            grp = grp.sort_values("n_chars", kind="mergesort")
            vals = grp["n_chars"].to_numpy()
            cnts = grp["cnt"].to_numpy()
            cum = np.cumsum(cnts)
            n = int(cum[-1])
            row = {"lang": lang, "n_docs": n}
            for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
                kth = max(0, math.ceil(q * n) - 1)  # 0-based order stat
                row[name] = int(vals[np.searchsorted(cum, kth + 1)])
            out.append(row)
        return pd.DataFrame(out, columns=["lang", "n_docs", "p50", "p90", "p99"])

    return bucket_map_keyed(hist, ["lang"], _stats)


def contamination_ngram(sf_dir: str, *, n: int = 8, bench_mod: int = 10,
                        bench_mask=None, corpus_mask=None):
    """Benchmark-contamination check (the GPT-3-style decontamination op):
    flag corpus documents that share any verbatim token n-gram with a
    held-out benchmark set (here: ``doc_id % bench_mod == 0``), reporting
    the number of contaminated window positions per document.

    Ray shape: the benchmark side is corpus-scale-INDEPENDENT (a fixed
    eval suite), so its distinct n-grams reduce through one tiny bucket
    shuffle and are broadcast once (``ray.put``, zero-copy per task); the
    corpus is then scanned in a SINGLE shuffle-free map_batches pass —
    tokens flatten once per batch, sliding windows come from zero-copy
    Arrow slices joined element-wise (``binary_join_element_wise``, no
    Python loop), and membership tests only each batch's DISTINCT grams
    (dictionary-encode first). At 100 TB, hash grams to u64 on both sides
    before the membership test to shrink the broadcast ~10x.
    """
    import pyarrow.compute as pc

    from ..util import bucket_distinct

    if bench_mask is None:
        bench_mask = lambda ids: ids % bench_mod == 0  # noqa: E731
    if corpus_mask is None:
        corpus_mask = lambda ids: ids % bench_mod != 0  # noqa: E731

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))

    def _grams(t: pa.Table):
        """(doc_idx, gram) for every n-token window fully inside a doc."""
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(texts, " ")
        flat = pc.list_flatten(toks)
        L = len(flat)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if L < n:
            return np.empty(0, dtype=np.int64), pa.array([], type=pa.string())
        w = L - n + 1
        grams = pc.binary_join_element_wise(
            *[flat.slice(j, w) for j in range(n)], " ")
        valid = doc_idx[:w] == doc_idx[n - 1:]
        return doc_idx[:w][valid], grams.filter(pa.array(valid))

    def _bench_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(bench_mask(ids)))
        _, grams = _grams(t)
        return pa.Table.from_arrays([grams.unique()], names=["g"])

    bench = bucket_distinct(
        docs.map_batches(_bench_grams, batch_format="pyarrow", batch_size=None), ["g"]
    ).to_pandas()
    bench_sorted = np.sort(bench["g"].to_numpy())
    bench_ref = ray.put(bench_sorted)

    def _scan(t: pa.Table) -> pa.Table:
        bg = ray.get(bench_ref)
        ids = t.column("doc_id").cast(pa.int64())
        keep = corpus_mask(ids.to_numpy(zero_copy_only=False))
        t = t.filter(pa.array(keep))
        doc_of, grams = _grams(t)
        denc = grams.dictionary_encode()
        vocab = denc.dictionary.to_numpy(zero_copy_only=False)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        if len(bg) == 0 or len(vocab) == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.int64())],
                names=["doc_id", "n_contaminated"])
        pos = np.searchsorted(bg, vocab).clip(max=len(bg) - 1)
        vocab_hit = bg[pos] == vocab
        hit = vocab_hit[codes]
        cnt = np.bincount(doc_of[hit], minlength=t.num_rows)
        nz = np.flatnonzero(cnt)
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64()).take(pa.array(nz)),
             pa.array(cnt[nz].astype(np.int64))],
            names=["doc_id", "n_contaminated"])

    return docs.map_batches(_scan, batch_format="pyarrow", batch_size=None)


def inverted_index(sf_dir: str, *, cap: int = 8):
    """Build a capped inverted index (token -> document frequency + first
    ``cap`` posting doc_ids) with a BOUNDED-STATE top-k combiner — the
    hot-key-proof index-construction shape: each batch reduces to at most
    (df_partial + ``cap`` smallest doc_ids) PER TOKEN, so the shuffle
    carries O(|vocab| x batches) tiny rows no matter how hot a token is
    (a stopword appearing in every document of a 100 TB corpus still ships
    ~9 values per batch, not a corpus-sized posting list); the per-token
    reduce sums df and merge-takes the global smallest ``cap``. Postings
    travel as a comma-joined string (robust through the pandas bucket
    machinery, exact for the oracle compare); ``df`` keeps the uncapped
    truth because it is summed from partials, never materialized as a
    list. Measured: the unbounded pair-shuffle variant took 115.7 s on a
    5M-doc corpus with a 31-token vocab (155M pair rows into <=31 groups);
    this combiner ships ~0.03% of that.
    """
    import pyarrow.compute as pc

    from ..util import bucket_map_keyed

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))

    def _partial(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(texts, " ")
        flat = pc.list_flatten(toks)
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = denc.dictionary
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if len(vocab) == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.string()),
                 pa.array([], type=pa.int64()),
                 pa.array([], type=pa.string())],
                names=["token", "df", "post"])
        # distinct (doc, token) pairs, sorted by (code, doc): doc_ids is
        # not assumed sorted in the batch, so map positions -> ids first
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        upair = np.unique(codes * len(ids) + doc_idx) if len(ids) else \
            np.empty(0, dtype=np.int64)
        pair_code = upair // len(ids)
        pair_id = ids[upair % len(ids)]
        order = np.lexsort((pair_id, pair_code))
        pair_code, pair_id = pair_code[order], pair_id[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(pair_code[1:] != pair_code[:-1]) + 1))
        sizes = np.diff(np.concatenate((starts, [len(pair_code)])))
        rank = np.arange(len(pair_code)) - np.repeat(starts, sizes)
        keep = rank < cap
        # comma-join the capped ids per token group (<= cap ints each)
        kept_id = pair_id[keep]
        kept_code = pair_code[keep]
        kstarts = np.concatenate(
            ([0], np.flatnonzero(kept_code[1:] != kept_code[:-1]) + 1))
        posts = [",".join(map(str, kept_id[a:b])) for a, b in
                 zip(kstarts, np.concatenate((kstarts[1:], [len(kept_id)])))]
        return pa.Table.from_arrays(
            [vocab.take(pa.array(kept_code[kstarts])),
             pa.array(sizes.astype(np.int64)),
             pa.array(posts, type=pa.string())],
            names=["token", "df", "post"])

    partials = docs.map_batches(_partial, batch_format="pyarrow",
                                batch_size=None)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        def _topk(posts: pd.Series) -> str:
            ids = np.sort(np.concatenate([
                np.array(p.split(","), dtype=np.int64) for p in posts]))
            return ",".join(map(str, ids[:cap]))

        out = g.groupby("token", sort=False).agg(
            df=("df", "sum"), postings=("post", _topk)).reset_index()
        out["df"] = out["df"].astype("int64")
        return out

    return bucket_map_keyed(partials, ["token"], _merge)


# the 90/5/5 md5-threshold split rule — the ONE place the thresholds
# live; split_assign, split_contamination and the oracles' literals all
# mirror these ('e6'/'f3' = 230/243 of 256 first-byte values)
SPLIT_TRAIN_LT = "e6"
SPLIT_VAL_LT = "f3"


def split_b1(ids: np.ndarray) -> np.ndarray:
    """First md5 byte (two hex chars) of each doc_id's decimal string —
    the content-independent split key shared by every split op."""
    import hashlib

    return np.array([hashlib.md5(str(i).encode()).hexdigest()[:2]
                     for i in ids])


def split_assign(sf_dir: str):
    """Deterministic train/val/test split assignment by content-independent
    hash — the reproducible-split op every training pipeline needs: split =
    first byte of md5(doc_id) against 90/5/5 thresholds, so assignment is
    stable under any repartitioning, resumable across runs, and exactly
    reproducible by the oracle (DuckDB md5 of the same string). Pure
    shuffle-free map_batches; the md5 is per ROW (not per token), so the
    scalar hash loop is cheap relative to I/O — swap in a vectorized
    crc32c/xxhash for the 100 TB path if profiling ever shows it hot.
    """
    docs = _read(sf_dir, "documents", ["doc_id"], blocks=fanout_blocks(0.25))

    def _assign(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b1 = split_b1(ids)
        split = np.where(b1 < SPLIT_TRAIN_LT, "train",
                         np.where(b1 < SPLIT_VAL_LT, "val", "test"))
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(split)], names=["doc_id", "split"])

    return docs.map_batches(_assign, batch_format="pyarrow", batch_size=None)


def events_lag_features(sf_dir: str):
    """Per-user lag feature engineering — the sequence-feature op every
    behavioral/training-feature pipeline needs: for each event, the
    previous event's value and the gap in seconds since it, ordered by
    (ts, event_id) within the user (deterministic tie-break). First event
    per user gets nulls. -> (event_id, user_id, prev_value, gap_sec).

    All outputs are exact (a shift and an integer timestamp difference —
    no float accumulation), so oracle parity is bitwise. Scale shape: ONE
    user-keyed bucket shuffle, per-bucket vectorized sort+shift; identical
    partitioning key as the other event ops (sessionize, as-of), so a
    multi-op pipeline reuses the same exchange.
    """
    from ..util import bucket_map_keyed

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"],
               blocks=fanout_blocks(0.5))

    def _lags(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts", "event_id"],
                               kind="mergesort")
        uid = b["user_id"].to_numpy()
        same_user = np.empty(len(b), dtype=bool)
        same_user[0] = False
        same_user[1:] = uid[1:] == uid[:-1]
        # plain float64 + NaN (not nullable extension dtypes): DuckDB's
        # pandas bridge returns nullable BIGINT/DOUBLE as float64+NaN, and
        # the driver compares stringified values — '<NA>' would mismatch
        prev_value = b["value"].shift(1).to_numpy(dtype="float64")
        ts_us = b["ts"].astype("int64").to_numpy()
        gap_sec = np.empty(len(b), dtype="float64")
        gap_sec[0] = np.nan
        gap_sec[1:] = (ts_us[1:] - ts_us[:-1]) // 1_000_000
        prev_value[~same_user] = np.nan
        gap_sec[~same_user] = np.nan
        return pd.DataFrame({
            "event_id": b["event_id"].astype("int64").to_numpy(),
            "user_id": uid.astype("int64"),
            "prev_value": prev_value,
            "gap_sec": gap_sec,
        }).reset_index(drop=True)

    return bucket_map_keyed(ev, ["user_id"], _lags)


FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(sf_dir: str, steps: tuple[str, ...] = FUNNEL_STEPS):
    """Strict sequential funnel — the conversion census every behavioral
    pipeline runs: a user reaches step k iff they have a step-k event
    STRICTLY AFTER the timestamp at which they reached step k-1 (first
    qualifying occurrence, not first overall). -> (step_idx, step,
    n_users).

    Scale shape: one user-keyed bucket shuffle; within a bucket each
    step is a vectorized filter -> groupby-min -> merge chain (no per-user
    Python loop); per-bucket partial counts collapse in a |steps|-row
    final groupby.
    """
    from ..util import bucket_aggregate, bucket_map_keyed

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"],
               blocks=fanout_blocks(0.5))

    def _funnel(bucket: pd.DataFrame) -> pd.DataFrame:
        reached = None  # user_id -> ts at which the previous step was hit
        rows = []
        for i, step in enumerate(steps):
            e = bucket[bucket["event_type"] == step]
            if reached is not None:
                e = e.merge(reached, on="user_id")
                e = e[e["ts"] > e["reached_ts"]]
            t = (e.groupby("user_id", sort=False)["ts"].min()
                 .reset_index(name="reached_ts"))
            rows.append((i + 1, step, len(t)))
            reached = t
        return pd.DataFrame(rows, columns=["step_idx", "step", "n"])

    partials = bucket_map_keyed(ev, ["user_id"], _funnel)
    return bucket_aggregate(partials, ["step_idx", "step"],
                            {"n_users": ("n", "sum")})


def profile_table(sf_dir: str, table: str = "orders"):
    """Per-column table profile + primitive-type inference — the tabular-
    semantics first step (which columns are entity mentions vs data values)
    that the reference performs implicitly via its target-column selection
    and property-kind voting (test/mergeFiles.py min-column convention,
    oaei/dbpedia_fragment.py:469-499 majority vote); here it is an explicit
    profiling operator over any table.

    Output: (col_name, n_rows, n_null, n_distinct, inferred_type) where
    inferred_type is schema-driven for native types (int/float/timestamp)
    and data-driven for strings ('numeric_text' iff every non-null value
    parses as a number, else 'text' — TRY_CAST semantics, vectorized).

    Scale shape: counts are per-batch partials collapsing in a |cols|-row
    groupby (zero data shuffles); exact distinct is batch-local dedup ->
    one hash-partitioned distinct -> per-column count, the same two-phase
    pattern as D1 (COUNT(DISTINCT) is irreducibly a shuffle; swap in an
    HLL sketch when approximate counts suffice at 100 TB). Stringified
    values are the distinct key: Python repr of float64/int64/timestamp is
    round-trip-injective, so string distinct == native distinct.
    """
    from ..stages.canonicalize import partial_count
    from ..util import bucket_aggregate, bucket_distinct, rename_cols

    ds = _read(sf_dir, table, None, blocks=fanout_blocks(0.25))

    def _kind(t: pa.DataType) -> str:
        if pa.types.is_integer(t):
            return "int"
        if pa.types.is_floating(t):
            return "float"
        if pa.types.is_timestamp(t) or pa.types.is_date(t):
            return "timestamp"
        return "string"

    def _stat_partials(t: pa.Table) -> pd.DataFrame:
        rows = []
        for name in t.column_names:
            col = t.column(name)
            n, n_null = len(col), col.null_count
            n_num = 0
            if _kind(col.type) == "string":
                s = col.to_pandas()
                n_num = int(pd.to_numeric(s, errors="coerce").notna().sum())
            rows.append((name, n, n_null, n_num))
        return pd.DataFrame(rows, columns=["col_name", "n", "n_null", "n_num"])

    stats = bucket_aggregate(
        ds.map_batches(_stat_partials, batch_format="pyarrow",
                       batch_size=None),
        ["col_name"],
        {"n_rows": ("n", "sum"), "n_null": ("n_null", "sum"),
         "n_num": ("n_num", "sum")},
    ).to_pandas()  # |cols| rows — result-sized collect

    def _val_pairs(t: pa.Table) -> pd.DataFrame:
        frames = []
        for name in t.column_names:
            vals = t.column(name).drop_null().to_pandas().astype(str).unique()
            frames.append(pd.DataFrame({"col_name": name, "val": vals}))
        out = pd.concat(frames, ignore_index=True)
        out["val"] = out["val"].astype("string")
        return out

    pairs = ds.map_batches(_val_pairs, batch_format="pyarrow",
                           batch_size=None)
    nd = rename_cols(
        partial_count(bucket_distinct(pairs, ["col_name", "val"]),
                      ["col_name"]),
        {"n": "n_distinct"}).to_pandas()  # |cols| rows

    kinds = {f.name: _kind(f.type)
             for f in ds.schema().base_schema}  # metadata-only
    out = stats.merge(nd, on="col_name")
    is_str = out["col_name"].map(kinds) == "string"
    non_null = out["n_rows"] - out["n_null"]
    numeric_text = is_str & (non_null > 0) & (out["n_num"] == non_null)
    out["inferred_type"] = out["col_name"].map(kinds)
    out.loc[is_str, "inferred_type"] = np.where(
        numeric_text[is_str], "numeric_text", "text")
    out = out.drop(columns=["n_num"]).sort_values("col_name")
    return out[["col_name", "n_rows", "n_null", "n_distinct",
                "inferred_type"]].reset_index(drop=True)


# per-language keep rates for stratified_sample; 1.0 for langs not listed.
# en is the dominant stratum (down-sampled hardest), fr exercises a second
# distinct rate, everything else passes through — three code paths covered.
STRATIFIED_RATES: dict[str, float] = {"en": 0.25, "fr": 0.5}


def stratified_sample(sf_dir: str, rates: dict[str, float] | None = None):
    """Deterministic stratified (per-language) downsampling — the corpus
    rebalancing op every multilingual training mix needs (per-stratum keep
    rates a la data-mixture rebalancing). Membership = first 16 bits of
    md5(doc_id) compared against the stratum's rate threshold, so the
    sample is content-independent, stable under repartitioning, resumable,
    and exactly reproducible by the oracle (DuckDB md5 of the same string).

    Scale shape: ZERO shuffles — the rate map is O(|langs|) and ships in
    the scan closure; one streaming pass filters each batch locally.
    Output: (doc_id, lang) of kept docs.
    """
    import hashlib

    rates = STRATIFIED_RATES if rates is None else rates
    thresholds = {k: int(v * 65536) for k, v in rates.items()}

    docs = _read(sf_dir, "documents", ["doc_id", "lang"],
                 blocks=fanout_blocks(0.25))

    def _sample(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        h16 = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
                        for i in ids], dtype=np.int64)
        thr = np.array([thresholds.get(l, 65536) for l in langs],
                       dtype=np.int64)
        keep = h16 < thr
        return pa.Table.from_arrays(
            [pa.array(ids[keep]), pa.array(langs[keep], type=pa.string())],
            names=["doc_id", "lang"])

    return docs.map_batches(_sample, batch_format="pyarrow", batch_size=None)


def quality_filter_census(sf_dir: str, *, q: float = 0.1):
    """Two-pass percentile quality filter — the composition every corpus
    cleaner runs: pass 1 computes a per-language length threshold (the
    exact q-quantile, same counting-sort order statistic as
    ``doc_len_quantiles``: corpus-size-independent histogram + one tiny
    shuffle), the |langs|-row threshold map ships in the scan closure, and
    pass 2 is a SINGLE shuffle-free scan emitting per-batch kept/dropped
    partials that collapse in a final tiny groupby. Nothing corpus-sized is
    ever collected or broadcast; swapping the census for an actual filtered
    write is the same pass with ``t.filter(mask)`` -> ``write_parquet``.
    """
    import math

    from ..util import bucket_aggregate, bucket_map_keyed

    docs = _read(sf_dir, "documents", ["lang", "n_chars"],
                 blocks=fanout_blocks(0.25))
    hist = bucket_aggregate(docs, ["lang", "n_chars"],
                            {"cnt": ("n_chars", "count")})

    def _thresholds(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, grp in g.groupby("lang", sort=False):
            grp = grp.sort_values("n_chars", kind="mergesort")
            cum = grp["cnt"].cumsum().to_numpy()
            kth = max(0, math.ceil(q * int(cum[-1])) - 1)
            out.append((lang, int(grp["n_chars"].to_numpy()[
                np.searchsorted(cum, kth + 1)])))
        return pd.DataFrame(out, columns=["lang", "thr"])

    thr = dict(bucket_map_keyed(hist, ["lang"], _thresholds)
               .to_pandas().itertuples(index=False, name=None))

    # Arrow-native pass 2: the |langs|-row threshold map becomes a pinned
    # value_set + integer gather (every lang is present in the histogram
    # by construction), so corpus-sized batches never convert to pandas
    thr_langs = pa.array(list(thr.keys()), type=pa.string())
    thr_vals = np.array(list(thr.values()), dtype=np.int64)

    def _census(t: pa.Table) -> pa.Table:
        idx_a = pc.index_in(t.column("lang"), value_set=thr_langs)
        assert idx_a.null_count == 0  # pass 1 saw every lang
        idx = idx_a.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (t.column("n_chars").cast(pa.int64())
                .to_numpy(zero_copy_only=False) >= thr_vals[idx])
        g = pa.table({
            "lang": t.column("lang"),
            "n_kept": pa.array(keep.astype(np.int64)),
            "n_dropped": pa.array((~keep).astype(np.int64)),
        }).group_by("lang", use_threads=False).aggregate(
            [("n_kept", "sum"), ("n_dropped", "sum")])
        return g.select(["lang", "n_kept_sum", "n_dropped_sum"]) \
            .rename_columns(["lang", "n_kept", "n_dropped"])

    return bucket_aggregate(
        docs.map_batches(_census, batch_format="pyarrow"), ["lang"],
        {"n_kept": ("n_kept", "sum"), "n_dropped": ("n_dropped", "sum")})


def emb_label_centroids(sf_dir: str):
    """Per-label embedding centroids (the class-centroid / k-means-M-step
    shape): each batch reduces its (n, d) embedding matrix to per-label
    partial sums with ONE ``np.add.at`` over integer label codes — the
    shuffle then carries |labels| x d partial rows per batch, never vectors
    — and a tiny (label, dim)-keyed groupby finishes the mean. Output:
    (label, dim, c) with c rounded to 4 (cross-engine float-sum-order
    tolerance, same convention as emb_label_stats).
    """
    from ..util import bucket_aggregate, list_column_matrix

    emb = _read(sf_dir, "embeddings", ["embedding", "label"],
                blocks=fanout_blocks(0.25))

    def _partial(t: pa.Table) -> pa.Table:
        m = list_column_matrix(t.column("embedding"))
        labels = t.column("label").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ulab, codes = np.unique(labels, return_inverse=True)
        k, d = len(ulab), m.shape[1]
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, codes, m)
        cnts = np.bincount(codes, minlength=k).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(np.repeat(ulab, d)),
             pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
             pa.array(sums.ravel()),
             pa.array(np.repeat(cnts, d))],
            names=["label", "dim", "s", "n"])

    agg = bucket_aggregate(
        emb.map_batches(_partial, batch_format="pyarrow"),
        ["label", "dim"], {"s": ("s", "sum"), "n": ("n", "sum")})

    def _final(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"label": b["label"], "dim": b["dim"],
                             "c": (b["s"] / b["n"]).round(4)})

    return agg.map_batches(_final, batch_format="pandas")


def repeated_ngram_census(sf_dir: str, *, n: int = 8, k: int = 20):
    """Cross-document repeated n-gram census — the measurement behind
    substring-level dedup (which verbatim 8-grams appear in more than one
    document, and how widely): per-batch DISTINCT (doc, gram) pairs via the
    shared sliding-window kernel + dictionary codes (the combiner: a gram
    repeated within one doc ships once), one gram-keyed two-phase count,
    filter df > 1, global top-k. The shuffle carries per-batch-distinct
    grams only; at 100 TB hash grams to u64 before the shuffle (16 bytes vs
    ~50) and keep the string only for the final top-k rehydration pass.
    """
    import pyarrow.compute as pc

    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))

    def _gram_df_partial(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(texts, " ")
        flat = pc.list_flatten(toks)
        L = len(flat)
        empty = pa.Table.from_arrays(
            [pa.array([], type=pa.string()), pa.array([], type=pa.int64())],
            names=["g", "df"])
        if L < n:
            return empty
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        w = L - n + 1
        grams = pc.binary_join_element_wise(
            *[flat.slice(j, w) for j in range(n)], " ")
        valid = doc_idx[:w] == doc_idx[n - 1:]
        grams = grams.filter(pa.array(valid))
        denc = grams.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = denc.dictionary
        if len(vocab) == 0:
            return empty
        upair = np.unique(doc_idx[:w][valid] * len(vocab) + codes)
        dfp = np.bincount(upair % len(vocab), minlength=len(vocab))
        return pa.Table.from_arrays(
            [vocab, pa.array(dfp.astype(np.int64))], names=["g", "df"])

    agg = bucket_aggregate(
        docs.map_batches(_gram_df_partial, batch_format="pyarrow",
                         batch_size=None),
        ["g"], {"df": ("df", "sum")})
    def _df_gt1(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.filter(_pc.greater(t.column("df"), 1))

    rep = agg.map_batches(_df_gt1, batch_format="pyarrow")
    return rep.sort(["df", "g"], descending=[True, False]).limit(k)


def user_cohorts(sf_dir: str, *, week_us: int = 7 * 86_400_000_000):
    """Cohort retention matrix — (cohort_week, active_week, n_users) where a
    user's cohort is their first active week: per-batch DISTINCT
    (user, week) pairs (the combiner), ONE user-keyed bucket shuffle whose
    per-user reduce computes min-week and emits one (cohort, week) row per
    active week, then a tiny census groupby. The corpus moves once; the
    second shuffle input is |users| x |weeks-active| pairs, already
    distinct. Partitioning assumption: one user's history fits a worker
    (same as the as-of join).
    """
    from ..util import bucket_aggregate, bucket_map_keyed

    ev = _read(sf_dir, "events", ["user_id", "ts"], blocks=fanout_blocks(0.5))

    def _pairs(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        wk = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False) // week_us
        if len(uid) == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.int64())],
                names=["user_id", "wk"])
        # 1D-encoded unique (native int64 sort) instead of unique(axis=0)'s
        # void-dtype comparator — same idiom as the distinct-pair combiners
        lo = wk.min()
        span = wk.max() - lo + 1
        enc = np.unique(uid * span + (wk - lo))
        return pa.Table.from_arrays(
            [pa.array(enc // span), pa.array(enc % span + lo)],
            names=["user_id", "wk"])

    pairs = ev.map_batches(_pairs, batch_format="pyarrow")

    def _per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["user_id", "wk"])
        cohort = g.groupby("user_id", sort=False)["wk"].transform("min")
        return pd.DataFrame({"cohort_week": cohort.astype("int64"),
                             "active_week": g["wk"].astype("int64")})

    keyed = bucket_map_keyed(pairs, ["user_id"], _per_user)
    return bucket_aggregate(keyed, ["cohort_week", "active_week"],
                            {"n_users": ("active_week", "count")})


def doc_unigram_logprob(sf_dir: str):
    """Per-document unigram-LM score: mean negative log-probability of the
    doc's tokens under the corpus-wide unigram distribution — the classic
    perplexity-style quality filter (CCNet/Gopher lineage: documents far
    from the corpus distribution are boilerplate or noise; the reference's
    closest analogue is its frequency-weighted lookup scoring).

    Ray shape mirrors ``doc_tfidf_topk``: per-batch token-count partials
    collapse in ONE tiny token groupby (vocabulary-sized, never
    corpus-sized); the (token -> -ln p) map is put in the object store once
    (``ray.put``) and the corpus is scored in a single shuffle-free pass —
    a doc's tokens are batch-local by construction, so the per-doc mean
    never leaves the batch. -ln values are computed once per DISTINCT count
    with scalar ``math.log`` so the oracle's libm ``ln`` sees bit-identical
    doubles; the mean is rounded to 6 decimals on both sides (summation
    order differs from SQL ``avg`` only at ~1e-16 relative).

    At 100 TB the broadcast is vocabulary-sized: prune to top-V / min-count
    or swap for ``util.bucket_join`` on token, exactly as doc_tfidf_topk
    documents.
    """
    import math

    import pyarrow.compute as pc

    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))

    def _tokens(t: pa.Table):
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        return pc.split_pattern(texts, " ")

    def _cnt_partial(t: pa.Table) -> pa.Table:
        denc = pc.list_flatten(_tokens(t)).dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False)
        n = np.bincount(codes, minlength=len(denc.dictionary))
        return pa.Table.from_arrays(
            [denc.dictionary, pa.array(n.astype(np.int64))],
            names=["token", "c"])

    cnt = bucket_aggregate(
        docs.map_batches(_cnt_partial, batch_format="pyarrow",
                         batch_size=None),
        ["token"], {"c": ("c", "sum")}).to_pandas()
    total = int(cnt["c"].sum())
    toks_np = cnt["token"].to_numpy()
    order = np.argsort(toks_np, kind="stable")
    toks_sorted, c_sorted = toks_np[order], cnt["c"].to_numpy()[order]
    neglp_of_c = {int(c): -math.log(c / total) for c in np.unique(c_sorted)}
    neglp_sorted = np.array([neglp_of_c[int(c)] for c in c_sorted])
    ref = ray.put((toks_sorted, neglp_sorted))

    def _score(t: pa.Table) -> pa.Table:
        toks_g, neglp_g = ray.get(ref)
        toks = _tokens(t)
        denc = pc.list_flatten(toks).dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vtok = denc.dictionary.to_numpy(zero_copy_only=False)
        inst = neglp_g[np.searchsorted(toks_g, vtok)][codes]
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # split of ANY string yields >= 1 token, so every reduceat segment
        # is non-empty (a zero-length segment would misread its neighbour)
        if len(inst):
            sums = np.add.reduceat(
                inst, np.concatenate(([0], np.cumsum(lens)[:-1])))
        else:
            sums = np.zeros(0)
        avg = np.round(sums / np.maximum(lens, 1), 6)
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64()), pa.array(lens),
             pa.array(avg, type=pa.float64())],
            names=["doc_id", "n_tokens", "avg_neg_logprob"])

    return docs.map_batches(_score, batch_format="pyarrow", batch_size=None)


def doc_top_bigram_frac(sf_dir: str):
    """Per-document top-bigram repetition fraction — the Gopher-style
    repetition rule (a doc dominated by one repeated 2-gram is boilerplate).
    Output: (doc_id, n_tokens, top_bigram, bigram_n, top_bigram_frac =
    2*bigram_n/n_tokens rounded to 6); ties break to the lexicographically
    smallest bigram; docs with < 2 tokens have no bigram and are excluded
    (the SQL oracle's join semantics).

    Fully batch-local, zero shuffles: dictionary-encode tokens once per
    batch, form bigram keys as code[i]*V + code[i+1] masked at doc
    boundaries, count via 1D np.unique, pick each doc's winner with one
    lexsort — the same argmax idiom as doc_tfidf_topk.
    """
    import pyarrow.compute as pc

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))

    def _top(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
             pa.array([], type=pa.string()), pa.array([], type=pa.int64()),
             pa.array([], type=pa.float64())],
            names=["doc_id", "n_tokens", "top_bigram", "bigram_n",
                   "top_bigram_frac"])
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(texts, " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        denc = pc.list_flatten(toks).dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(codes) < 2:
            return empty
        V = len(denc.dictionary)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        same = doc_idx[1:] == doc_idx[:-1]
        if not same.any():
            return empty
        big = (codes[:-1] * V + codes[1:])[same]
        doc_of = doc_idx[:-1][same]
        # batch-local docs x V^2 keyspace: fits int64 for any real vocab
        # (docs-per-batch ~1e5, V ~1e6 -> 1e17 < 2^63)
        ukey, n = np.unique(doc_of * (V * V) + big, return_counts=True)
        udoc, ubig = ukey // (V * V), ukey % (V * V)
        vocab = denc.dictionary.to_numpy(zero_copy_only=False)
        bg_str = np.char.add(np.char.add(
            vocab[ubig // V].astype(str), " "), vocab[ubig % V].astype(str))
        order = np.lexsort((bg_str, -n, udoc))
        d = udoc[order]
        starts = np.concatenate(([0], np.flatnonzero(d[1:] != d[:-1]) + 1))
        win = order[starts]
        doc_ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        frac = np.round(2.0 * n[win] / lens[udoc[win]], 6)
        return pa.Table.from_arrays(
            [pa.array(doc_ids[udoc[win]]), pa.array(lens[udoc[win]]),
             pa.array(bg_str[win], type=pa.string()),
             pa.array(n[win].astype(np.int64)),
             pa.array(frac, type=pa.float64())],
            names=["doc_id", "n_tokens", "top_bigram", "bigram_n",
                   "top_bigram_frac"])

    return docs.map_batches(_top, batch_format="pyarrow", batch_size=None)


def pack_assign(sf_dir: str, *, seq_len: int = 2048):
    """Fixed-length sequence packing via a distributed prefix sum — the
    token-offset assignment every LLM pretraining pipeline runs before
    writing training shards: docs in doc_id order are laid end-to-end on
    one global token axis; each doc gets its exclusive starting offset,
    the training sequence it lands in (pack_id = offset // seq_len) and
    its position within that sequence.

    Ray Data has no ordered-scan primitive, so this composes the textbook
    two-pass distributed prefix sum from existing shapes:

      pass 1: map_batches computes n_tokens per doc (Arrow split kernel)
        and reduces to per-RANGE partials (range = doc_id // width, width
        sized from parquet row-count METADATA — no extra data pass — so
        the totals table stays ~16 rows per cluster CPU at any corpus
        size); the tiny (range, total) table is exclusive-scanned on the
        driver and shipped in the pass-2 closure (KB-scale broadcast).
      pass 2: bucket shuffle on range; within each range, sort by doc_id,
        vectorized exclusive cumsum, plus the range's base offset.

    Scale note: at 1e12 docs one level of ranges would make per-range
    groups too large for a single bucket task; the fix is recursion —
    scan the (range, total) table with this same operator — and each
    level multiplies capacity by the fan-out (~3e4). One level is exact
    and fast at every scale this sandbox can hold.
    """
    import pyarrow.compute as pc

    from ..util import (adaptive_buckets, bucket_aggregate, bucket_map_keyed,
                        parquet_num_rows)

    path = os.path.join(sf_dir, "documents.parquet")
    n_rows = max(1, parquet_num_rows(path))
    n_ranges = max(1, min(adaptive_buckets(16), n_rows))
    # ceil; width sized as if doc_ids were dense 0..N-1 — sparse ids only
    # skew range SIZES (correctness is id-order, not density)
    width = -(-n_rows // n_ranges)

    def _ntok(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64())
        n = pc.list_value_length(
            pc.split_pattern(t.column("text"), " ")).cast(pa.int64())
        rng = pc.divide(ids, width)
        return pa.Table.from_arrays([ids, n, rng],
                                    names=["doc_id", "n_tokens", "rng"])

    ntok = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5)).map_batches(
        _ntok, batch_format="pyarrow", batch_size=None)

    return _pack_from_ntok(ntok, seq_len)


def _pack_from_ntok(ntok, seq_len: int):
    """Shared packer core: (doc_id, n_tokens, rng) dataset -> per-doc
    (tok_offset, pack_id, pack_pos) via the two-pass distributed prefix
    sum (per-range totals -> driver exclusive scan -> per-range cumsum).
    Used by both the text packer (``pack_assign``) and the multimodal
    packer (``media_pack_assign``)."""
    from ..util import bucket_aggregate, bucket_map_keyed

    # pass 1: per-range totals -> driver exclusive scan. A MAPPING, not a
    # dense array: sparse doc_ids (e.g. replicated corpora with strided id
    # ranges) would make a max_rng-sized array driver-resident
    totals = bucket_aggregate(
        ntok, ["rng"], {"total": ("n_tokens", "sum")}).to_pandas()
    totals = totals.sort_values("rng")
    tot = totals["total"].to_numpy()
    base_map = pd.Series(np.cumsum(tot) - tot,
                         index=totals["rng"].to_numpy(), dtype="int64")
    base_ref = ray.put(base_map)

    # pass 2: co-locate each range, exclusive cumsum within it
    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values(["rng", "doc_id"], kind="mergesort")
        nt = b["n_tokens"].to_numpy()
        rng = b["rng"].to_numpy()
        cs = np.cumsum(nt) - nt  # exclusive over the sorted frame
        new_rng = np.empty(len(b), dtype=bool)
        new_rng[0] = True
        new_rng[1:] = rng[1:] != rng[:-1]
        # subtract the frame-cumsum at each range start (cs is nondecreasing)
        base_cs = np.where(new_rng, cs, 0)
        base_cs = np.maximum.accumulate(base_cs)
        bases = ray.get(base_ref)
        off = bases.loc[rng].to_numpy() + (cs - base_cs)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "n_tokens": nt,
            "tok_offset": off,
            "pack_id": off // seq_len,
            "pack_pos": off % seq_len,
        })

    return bucket_map_keyed(ntok, ["rng"], _pack)


def media_pack_assign(sf_dir: str, *, seq_len: int = 2048,
                      media_tokens: int = 16):
    """Multimodal sequence packing over the INTERLEAVED corpus: a doc's
    packed length is its text tokens plus a fixed ``media_tokens`` budget
    per media span (the vision-token placeholder convention of
    interleaved image-text training). Consumes the actual spans table —
    text token counts and media counts both come from the flattened
    span column, exercising the span-sequence invariant end-to-end —
    then reuses the same two-pass distributed prefix sum as the text
    packer (``_pack_from_ntok``)."""
    import pyarrow.compute as pc

    from ..stages.interleave import interleave_batch
    from ..util import adaptive_buckets, parquet_num_rows

    path = os.path.join(sf_dir, "documents.parquet")
    n_rows = max(1, parquet_num_rows(path))
    n_ranges = max(1, min(adaptive_buckets(16), n_rows))
    width = -(-n_rows // n_ranges)

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))

    def _ntok(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        spans = interleave_batch(t).column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        per_doc = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        flat = spans.flatten()
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), per_doc)
        is_text = pc.equal(flat.field("kind"), "text").to_numpy(
            zero_copy_only=False)
        span_toks = pc.list_value_length(
            pc.split_pattern(flat.field("text"), " ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        text_toks = np.zeros(len(ids), dtype=np.int64)
        np.add.at(text_toks, doc_idx[is_text], span_toks[is_text])
        n_media = np.zeros(len(ids), dtype=np.int64)
        np.add.at(n_media, doc_idx[~is_text], 1)
        n = text_toks + media_tokens * n_media
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(n), pa.array(ids // width)],
            names=["doc_id", "n_tokens", "rng"])

    ntok = docs.map_batches(_ntok, batch_format="pyarrow", batch_size=None)
    return _pack_from_ntok(ntok, seq_len)


def emb_kmeans_assign(sf_dir: str):
    """Nearest-centroid assignment (the k-means E-step, pairing with
    emb_label_centroids' M-step): centroids = per-label means computed by
    the same |labels| x d partial-sum reduce, collected to the driver
    (tiny: labels x dims doubles), then each batch computes distances +
    argmin locally — the broadcast-small-side ANN shape, zero shuffles
    over the vectors. The distance kernel deliberately materializes the
    (n, k, d) broadcast difference instead of the |x|^2-2xC+|C|^2 matmul
    identity: per-dim squared-difference summation matches the oracle's
    float64 arithmetic to the ulp, where the matmul identity would not —
    so size batches to n*k*d*8 bytes (e.g. k=10, d=32 here: ~2.6 KB/row).
    Ties broken toward the smaller label, same as the oracle's ORDER BY
    dist, label."""
    from ..util import bucket_aggregate, list_column_matrix

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"],
                blocks=fanout_blocks(0.25))

    def _partial(t: pa.Table) -> pa.Table:
        m = list_column_matrix(t.column("embedding"))
        labels = t.column("label").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ulab, codes = np.unique(labels, return_inverse=True)
        k, d = len(ulab), m.shape[1]
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, codes, m)
        cnts = np.bincount(codes, minlength=k).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(np.repeat(ulab, d)),
             pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
             pa.array(sums.ravel()),
             pa.array(np.repeat(cnts, d))],
            names=["label", "dim", "s", "n"])

    cent = bucket_aggregate(
        emb.map_batches(_partial, batch_format="pyarrow"),
        ["label", "dim"], {"s": ("s", "sum"), "n": ("n", "sum")}).to_pandas()
    cent = cent.sort_values(["label", "dim"])
    labs = np.sort(cent["label"].unique())
    k, d = len(labs), cent["dim"].nunique()
    C = (cent["s"].to_numpy() / cent["n"].to_numpy()).reshape(k, d)
    C_ref = ray.put(C)
    labs_ref = ray.put(labs)

    def _assign(t: pa.Table) -> pa.Table:
        Cm = ray.get(C_ref)
        lab_ids = ray.get(labs_ref)
        X = list_column_matrix(t.column("embedding"))
        # full squared distance, summed along dims in index order (matches
        # the oracle's per-dim sum to float64 ulp)
        d2 = ((X[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d2, axis=1)  # first minimum = smallest label
        return pa.Table.from_arrays(
            [t.column("vec_id").cast(pa.int64()),
             t.column("label").cast(pa.int64()),
             pa.array(lab_ids[best])],
            names=["vec_id", "label", "assigned"])

    return emb.map_batches(_assign, batch_format="pyarrow")


def bloom_positions(keys: np.ndarray, bloom_bits: int):
    """(byte_idx, bit_mask) for each of the two probe positions of every
    key — the ONE definition shared by bloom BUILD and PROBE (and the
    tests): the semijoin's exactness proof requires the two stages to
    hash bit-identically, and any drift means silent false negatives."""
    out = []
    for salt in (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F):
        h = (keys * np.uint64(salt)) >> np.uint64(44)
        h = h % np.uint64(bloom_bits)
        out.append(((h // 8).astype(np.int64),
                    (1 << (h % 8)).astype(np.uint8)))
    return out


def orders_segment_semijoin(sf_dir: str, *, segment: str = "AUTOMOBILE",
                            bloom_bits: int = 1 << 20):
    """Semi-join with a runtime bloom filter (the Spark/Trino
    runtime-filter-pushdown pattern): orders placed by customers in a
    market segment.

    Stage 1 builds a bloom filter of qualifying c_custkey per batch (a
    fixed-size uint8 bit array; batch partials are OR-reduced on the
    driver — KB-scale regardless of row count) and broadcasts it once.
    Stage 2 prefilters orders with two vectorized hash probes — at 100 TB
    this is where ~all non-matching rows die WITHOUT being shuffled.
    Stage 3 removes bloom false positives with an exact hash-partitioned
    semi-join over the (already thinned) survivors. Output is exact; the
    bloom only reduces shuffle volume."""
    from ..util import bucket_join, select_cols

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"],
                 blocks=fanout_blocks(0.25)).filter(
        expr=f"c_mktsegment == '{segment}'")

    def _bloom_partial(t: pa.Table) -> pa.Table:
        keys = t.column("c_custkey").cast(pa.uint64()).to_numpy(
            zero_copy_only=False)
        bits = np.zeros(bloom_bits // 8, dtype=np.uint8)
        for byte_idx, bit_mask in bloom_positions(keys, bloom_bits):
            np.bitwise_or.at(bits, byte_idx, bit_mask)
        return pa.Table.from_arrays([pa.array([bits.tobytes()])],
                                    names=["bloom"])

    parts = cust.map_batches(_bloom_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    bloom = np.zeros(bloom_bits // 8, dtype=np.uint8)
    for blob in parts["bloom"]:
        bloom |= np.frombuffer(blob, dtype=np.uint8)
    bloom_ref = ray.put(bloom)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"],
                   blocks=fanout_blocks(0.5))

    def _prefilter(t: pa.Table) -> pa.Table:
        b = ray.get(bloom_ref)
        keys = t.column("o_custkey").cast(pa.uint64()).to_numpy(
            zero_copy_only=False)
        keep = np.ones(len(keys), dtype=bool)
        for byte_idx, bit_mask in bloom_positions(keys, bloom_bits):
            keep &= (b[byte_idx] & bit_mask) != 0
        return t.filter(pa.array(keep))

    survivors = orders.map_batches(_prefilter, batch_format="pyarrow",
                                   batch_size=None)
    joined = bucket_join(
        survivors, select_cols(cust, ["c_custkey"]),
        key="o_custkey", right_key="c_custkey",
        left_cols={"o_orderkey": pa.int64()}, right_cols={},
        post=lambda df: df[["o_orderkey"]])
    return joined


def bigram_pmi(sf_dir: str):
    """Pointwise mutual information of adjacent token pairs (collocation
    mining — the phrase-detection pass of word2vec-style preprocessing).
    Two combiner-shaped counts (bigram and unigram, each pre-reduced per
    batch before a vocabulary-sized shuffle) plus a broadcast unigram
    frequency map for the final scoring pass. The broadcast is the right
    call up to ~1e6-entry vocabularies (same trade as doc_tfidf_topk /
    doc_unigram_logprob); for a 1e8-distinct-token corpus swap the final
    map for two bucket_joins of the bigram table against the unigram
    table on w1 then w2 — both sides are already aggregate-sized. Output:
    every bigram with its count and pmi = ln((c_ab/N_b)/(p_a*p_b)),
    rounded to 4 (cross-engine double-log tolerance)."""
    import pyarrow.compute as pc

    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["text"], blocks=fanout_blocks(0.5))

    def _bigram_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary.to_numpy(zero_copy_only=False)
        V = len(vocab)
        if V == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.string()),
                 pa.array([], type=pa.string()),
                 pa.array([], type=pa.int64())],
                names=["w1", "w2", "n_pair"])
        # mask the last token of each doc (no bigram starts there)
        ends = np.cumsum(lens) - 1
        valid = np.ones(len(codes), dtype=bool)
        valid[ends[lens > 0]] = False
        a = codes[:-1][valid[:-1]]
        b = codes[1:][valid[:-1]]
        pair, n = np.unique(a * V + b, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(vocab[pair // V], type=pa.string()),
             pa.array(vocab[pair % V], type=pa.string()),
             pa.array(n.astype(np.int64))],
            names=["w1", "w2", "n_pair"])

    def _unigram_partial(t: pa.Table) -> pa.Table:
        flat = pc.split_pattern(t.column("text"), " ")
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = flat.flatten()
        vc = pc.value_counts(flat)
        return pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts").cast(pa.int64())],
            names=["w", "n"])

    big = bucket_aggregate(
        docs.map_batches(_bigram_partial, batch_format="pyarrow",
                         batch_size=None),
        ["w1", "w2"], {"n_pair": ("n_pair", "sum")})
    uni = bucket_aggregate(
        docs.map_batches(_unigram_partial, batch_format="pyarrow",
                         batch_size=None),
        ["w"], {"n": ("n", "sum")}).to_pandas()
    n_u = float(uni["n"].sum())
    freq = dict(zip(uni["w"], uni["n"].astype(float)))
    freq_ref = ray.put(freq)

    # every doc contributes len-1 bigrams and split('') is [''] (len 1), so
    # total bigrams = total tokens - n_docs; n_docs from parquet metadata
    from ..util import parquet_num_rows

    n_docs = parquet_num_rows(os.path.join(sf_dir, "documents.parquet"))
    n_b = n_u - float(n_docs)

    def _pmi(b: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(freq_ref)
        p_ab = b["n_pair"].to_numpy(dtype=np.float64) / n_b
        p_a = b["w1"].map(f).to_numpy(dtype=np.float64) / n_u
        p_b = b["w2"].map(f).to_numpy(dtype=np.float64) / n_u
        b = b.copy()
        b["pmi"] = np.round(np.log(p_ab / (p_a * p_b)), 4)
        return b

    return big.map_batches(_pmi, batch_format="pandas")


def events_daily_active(sf_dir: str):
    """Exact daily active users — the COUNT(DISTINCT user) shape: per-batch
    distinct (day, user) partials thin the stream BEFORE the one shuffle, a
    hash-partitioned distinct removes cross-batch dups, then a tiny per-day
    count. Day is epoch-days int64 (timezone-free, hash-stable)."""
    from ..util import bucket_aggregate, bucket_distinct

    ev = _read(sf_dir, "events", ["ts", "user_id"], blocks=fanout_blocks(0.5))

    def _partial(t: pa.Table) -> pa.Table:
        day = pa.array((t.column("ts").cast(pa.int64())
                        .to_numpy(zero_copy_only=False)
                        // 86_400_000_000).astype(np.int64))
        uid = t.column("user_id").cast(pa.int64())
        out = pa.Table.from_arrays([day, uid], names=["day", "user_id"])
        return out.group_by(["day", "user_id"]).aggregate([])

    pairs = bucket_distinct(
        ev.map_batches(_partial, batch_format="pyarrow"), ["day", "user_id"])
    return bucket_aggregate(pairs, ["day"], {"n_users": ("user_id", "count")})


MIXTURE_WEIGHTS: dict[str, float] = {"en": 0.5, "fr": 2.5}


def source_temperature_mix(sf_dir: str, *, alpha: float = 0.5):
    """Temperature-scaled source-mixing weights (the multilingual /
    multi-domain sampling rule, e.g. mC4/XLM-R: p_s proportional to
    n_s^alpha): per source, its corpus share, its temperature-scaled
    sampling probability, and the implied per-document oversampling
    factor (p_s / share_s — how many epochs of source s one balanced
    epoch consumes). alpha < 1 upweights low-resource sources.

    Scale shape: ONE source-sized combiner aggregate; the arithmetic
    happens on the result rows. Shares and probabilities are rounded to 9
    places for cross-engine float equality (pow/log are libm on both
    sides)."""
    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["source"], blocks=fanout_blocks(0.25))

    def _one(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("source"),
             pa.array(np.ones(t.num_rows, dtype=np.int64))],
            names=["source", "one"])

    counts = bucket_aggregate(
        docs.map_batches(_one, batch_format="pyarrow"),
        ["source"], {"n_docs": ("one", "sum")}).to_pandas()
    n = counts["n_docs"].to_numpy().astype(np.float64)
    total = n.sum()
    scaled = np.power(n, alpha)
    p = scaled / scaled.sum()
    share = n / total
    out = pd.DataFrame({
        "source": counts["source"],
        "n_docs": counts["n_docs"].astype(np.int64),
        "share": np.round(share, 9),
        "p_temp": np.round(p, 9),
        "boost": np.round(p / share, 9),
    })
    return out.sort_values("source").reset_index(drop=True)


def mixture_oversample(sf_dir: str, weights: dict[str, float] | None = None):
    """Deterministic sampling WITH replacement to a per-language target
    weight — the epoch-mixture op of multilingual pretraining (upsample
    low-resource strata, downsample dominant ones): a doc with weight w
    gets floor(w) copies plus one more iff its md5 16-bit hash falls under
    frac(w), so expectation is exactly w and the realized multiset is
    content-independent, repartition-stable, and oracle-reproducible.

    Scale shape: ZERO shuffles — a data-EXPANSION map (np.repeat over
    batch rows); output (doc_id, copy_idx) is the training-shard
    replication manifest, not copied text (the downstream join fetches
    text per shard). Weights use exact binary fractions so the
    frac(w)*65536 threshold compares identically in both engines."""
    import hashlib

    weights = MIXTURE_WEIGHTS if weights is None else weights

    docs = _read(sf_dir, "documents", ["doc_id", "lang"],
                 blocks=fanout_blocks(0.25))

    def _expand(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        w = np.array([weights.get(l, 1.0) for l in langs], dtype=np.float64)
        base = np.floor(w)
        h16 = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
                        for i in ids], dtype=np.int64)
        n = (base + (h16 < (w - base) * 65536.0)).astype(np.int64)
        rep_ids = np.repeat(ids, n)
        # copy_idx = 0..n_i-1 within each doc
        ends = np.cumsum(n)
        idx = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64)
        idx -= np.repeat(ends - n, n)
        return pa.Table.from_arrays([pa.array(rep_ids), pa.array(idx)],
                                    names=["doc_id", "copy_idx"])

    return docs.map_batches(_expand, batch_format="pyarrow", batch_size=None)


def events_decay(sf_dir: str, *, tau_days: float = 1.0):
    """Per-user exponentially time-decayed running value — the
    recency-weighted engagement feature (decayed_i = sum_{j<=i} value_j *
    exp(-(t_i - t_j)/tau)): one user-keyed bucket shuffle, then a
    vectorized prefix trick per user (normalize t to the user's first
    event so exp(t/tau) cannot overflow at any corpus timespan below
    ~700*tau; decayed = exp(-dt_i) * cumsum(value_j * exp(dt_j))) — no
    per-event Python, no recurrence loop."""
    from ..util import bucket_map_keyed

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"],
               blocks=fanout_blocks(0.5))
    tau_us = tau_days * 86_400_000_000.0

    def _decay(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = b["user_id"].to_numpy()
        t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = b["value"].to_numpy(dtype=np.float64)
        new_u = np.empty(len(b), dtype=bool)
        new_u[0] = True
        new_u[1:] = uid[1:] != uid[:-1]
        # broadcast each user's first timestamp by repeat (NOT the
        # maximum.accumulate trick: ts restarts per user, so first-ts is
        # not globally monotone across users)
        starts = np.flatnonzero(new_u)
        counts = np.diff(np.append(starts, len(b)))
        # dt = days since the user's FIRST event (frame is user-sorted)
        dt = (t - np.repeat(t[starts], counts)) / tau_us
        a = v * np.exp(dt)
        # per-user cumsum MUST restart, not subtract: exp(dt) spans ~13
        # orders of magnitude, so a global cumsum minus the segment offset
        # cancels catastrophically for small-total users that follow
        # large-total ones. Loop is per USER (numpy inside), not per event.
        decayed = np.empty(len(b), dtype=np.float64)
        for s, c in zip(starts, counts):
            sl = slice(s, s + c)
            decayed[sl] = np.exp(-dt[sl]) * np.cumsum(a[sl])
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(),
            "user_id": uid,
            "decayed": np.round(decayed, 4),
        })

    return bucket_map_keyed(ev, ["user_id"], _decay)


def events_hourly_zscore(sf_dir: str):
    """Per-type hourly volume anomaly scores — the monitoring op over an
    event stream: count events per (event_type, hour), then z-score each
    hour against ITS type's mean/std across hours. One combiner-shaped
    shuffle produces the counts table (types x hours — tiny at any corpus
    size: its cardinality is bounded by the time axis, not the row count),
    so the per-type stats + z pass runs as a final small map. Sample
    stddev (ddof=1) to match SQL stddev_samp; z rounded to 4."""
    from ..util import bucket_aggregate, bucket_map_keyed

    ev = _read(sf_dir, "events", ["event_type", "ts"],
               blocks=fanout_blocks(0.5))

    def _hour(t: pa.Table) -> pa.Table:
        hour = pa.array((t.column("ts").cast(pa.int64())
                         .to_numpy(zero_copy_only=False)
                         // 3_600_000_000).astype(np.int64))
        return pa.Table.from_arrays([t.column("event_type"), hour],
                                    names=["event_type", "hour"])

    counts = bucket_aggregate(
        ev.map_batches(_hour, batch_format="pyarrow"),
        ["event_type", "hour"], {"n": ("hour", "count")})

    def _z(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            n = grp["n"].to_numpy(dtype=np.float64)
            mu = n.mean()
            sd = n.std(ddof=1) if len(n) > 1 else 0.0
            z = np.round((n - mu) / sd, 4) if sd > 0 else np.zeros(len(n))
            out.append(pd.DataFrame({
                "event_type": et, "hour": grp["hour"].to_numpy(),
                "n": grp["n"].to_numpy(), "z": z}))
        return pd.concat(out, ignore_index=True)

    # co-locate each type's full hour series (the counts table is tiny;
    # this shuffle moves types x hours rows, not events)
    return bucket_map_keyed(counts, ["event_type"], _z)


def media_captions(sf_dir: str):
    """Caption mining for image/text pairing — for every media span in the
    interleaved corpus, emit the text span that precedes it (its context
    caption) — the alt-text-from-context op of multimodal training-data
    prep. Consumes the ACTUAL interleaved spans table (not a text-side
    shortcut), so it exercises the span-sequence invariant: flatten the
    list<struct> span column, vectorized take() of the element before each
    media span (by construction a media span never starts a document and
    two media spans are never adjacent). Zero shuffles."""
    import pyarrow.compute as pc

    from ..stages.interleave import interleave_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))
    inter = docs.map_batches(interleave_batch, batch_format="pyarrow",
                             batch_size=None)

    empty = pa.Table.from_arrays(
        [pa.array([], type=pa.int64()), pa.array([], type=pa.string()),
         pa.array([], type=pa.string()), pa.array([], type=pa.string()),
         pa.array([], type=pa.int64())],
        names=["doc_id", "media_ref", "media_kind", "caption",
               "n_caption_tokens"])

    def _cap(t: pa.Table) -> pa.Table:
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        if len(flat) == 0:
            return empty
        kind = flat.field("kind")
        text = flat.field("text")
        ref = flat.field("media_ref")
        pos = np.flatnonzero(
            pc.not_equal(kind, "text").to_numpy(zero_copy_only=False))
        if len(pos) == 0:
            return empty
        cap = text.take(pa.array(pos - 1))
        refs = ref.take(pa.array(pos))
        kinds = kind.take(pa.array(pos))
        # media_ref = 'media://{doc}/{chunk}' -> doc number
        parts = pc.split_pattern(pc.utf8_slice_codeunits(refs, 8), "/")
        dnum = pc.list_element(parts, 0).cast(pa.int64())
        ntok = pc.list_value_length(pc.split_pattern(cap, " ")).cast(pa.int64())
        return pa.Table.from_arrays(
            [dnum, refs, kinds, cap, ntok],
            names=["doc_id", "media_ref", "media_kind", "caption",
                   "n_caption_tokens"])

    return inter.map_batches(_cap, batch_format="pyarrow", batch_size=None)


def lang_confusion(sf_dir: str):
    """Language-ID confusion matrix — the model-eval op run after any
    classifier stage: heuristic lang predictions (the lang_id kernel)
    joined batch-locally against the labeled lang column, pre-counted per
    batch, one tiny (true, pred)-keyed shuffle. Output (lang, lang_pred,
    n) — |langs|^2 rows at any corpus size."""
    from ..functions.textstats import lang_id_batch
    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"],
                 blocks=fanout_blocks(0.5))

    def _partial(t: pa.Table) -> pa.Table:
        pred = lang_id_batch(t).column("lang_pred")
        pairs = pa.Table.from_arrays([t.column("lang"), pred],
                                     names=["lang", "lang_pred"])
        g = pairs.group_by(["lang", "lang_pred"]).aggregate(
            [("lang_pred", "count")])
        return pa.Table.from_arrays(
            [g.column("lang"), g.column("lang_pred"),
             g.column("lang_pred_count").cast(pa.int64())],
            names=["lang", "lang_pred", "n"])

    return bucket_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["lang", "lang_pred"], {"n": ("n", "sum")})


def bit_length_i64(v: np.ndarray) -> np.ndarray:
    """Exact vectorized int bit-length (== int.bit_length per element) via
    a branchless binary search over shifts — float log2 would misround
    above 2^53, exactly where HLL's rho lives. Module-level so tests
    exercise THIS kernel, not a copy."""
    bl = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (np.int64(1) << np.int64(shift))
        bl[big] += shift
        x[big] >>= np.int64(shift)
    return bl + (x == 1)


def events_hll_users(sf_dir: str, *, m_log2: int = 10):
    """Approximate distinct users per event_type via HyperLogLog — the
    mergeable-sketch family every 100 TB census uses where exact distinct
    would shuffle the full key stream: per-batch register partials (<= m
    rows each) merge with MAX, so the one shuffle carries m x batches
    tiny rows and re-merging partials is associative/idempotent (safe
    under retries and tree reduction).

    Fully deterministic and oracle-reproducible: 60-bit md5-derived
    hashes, bucket = top m_log2 bits, rho = leading-zero rank of the
    remainder (exact integer bit-length — no float log2, whose rounding
    at >2^53 would diverge from the oracle's length(bin(x))), standard
    bias-corrected estimate with the linear-counting small-range branch,
    rounded to 4. The per-row md5 is the same scalar-loop trade as
    split_assign (swap in a vectorized 64-bit hash at 100 TB; the oracle
    exists to pin SEMANTICS at test scale)."""
    import hashlib

    from ..util import bucket_aggregate

    m = 1 << m_log2
    suffix_bits = 60 - m_log2
    mask = (1 << suffix_bits) - 1
    ev = _read(sf_dir, "events", ["event_type", "user_id"],
               blocks=fanout_blocks(0.5))

    def _regs(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        uid = t.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        x = np.array([int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
                      for u in uid], dtype=np.int64)
        bucket = x >> np.int64(suffix_bits)
        rho = suffix_bits + 1 - bit_length_i64(x & np.int64(mask))
        df = pd.DataFrame({"event_type": et, "bucket": bucket, "rho": rho})
        g = df.groupby(["event_type", "bucket"], sort=False)["rho"].max(
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    regs = bucket_aggregate(
        ev.map_batches(_regs, batch_format="pyarrow"),
        ["event_type", "bucket"], {"rho": ("rho", "max")}).to_pandas()

    # estimate per type from the <= |types| x m register table (tiny)
    out = []
    alpha = 0.7213 / (1 + 1.079 / m)
    for et, g in regs.groupby("event_type", sort=False):
        s = float(np.power(2.0, -g["rho"].to_numpy(dtype=np.float64)).sum())
        present = len(g)
        e_raw = alpha * m * m / (s + (m - present))
        if e_raw <= 2.5 * m and present < m:
            e = m * np.log(m / float(m - present))
        else:
            e = e_raw
        out.append((et, round(e, 4)))
    return pd.DataFrame(out, columns=["event_type", "est_users"])


def orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP (priority, year) in one shuffle — the OLAP
    multi-level aggregate: the finest level is a combiner-shaped two-phase
    sum; the (priority) and () levels are DERIVED from the finest
    aggregate (exactly summable, so no second corpus pass and no
    grouping-sets shuffle). Rollup rows use the sentinel 'ALL' instead of
    SQL NULL so the oracle comparison is type-stable."""
    from ..util import bucket_aggregate

    orders = _read(sf_dir, "orders",
                   ["o_orderpriority", "o_orderdate", "o_totalprice"],
                   blocks=fanout_blocks(0.5))

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        yr = pc.year(t.column("o_orderdate")).cast(pa.int64())
        tt = pa.Table.from_arrays(
            [t.column("o_orderpriority"), yr, t.column("o_totalprice")],
            names=["priority", "yr", "price"])
        g = tt.group_by(["priority", "yr"]).aggregate(
            [("price", "sum"), ("price", "count")])
        return pa.Table.from_arrays(
            [g.column("priority"), g.column("yr"),
             g.column("price_sum"), g.column("price_count").cast(pa.int64())],
            names=["priority", "yr", "s", "n"])

    fine = bucket_aggregate(
        orders.map_batches(_partial, batch_format="pyarrow"),
        ["priority", "yr"], {"s": ("s", "sum"), "n": ("n", "sum")}
    ).to_pandas()  # |priorities| x |years| rows — result-sized collect

    lvl1 = fine.groupby("priority", as_index=False)[["s", "n"]].sum()
    lvl1["yr"] = "ALL"
    lvl0 = pd.DataFrame({"priority": ["ALL"], "yr": ["ALL"],
                         "s": [fine["s"].sum()], "n": [fine["n"].sum()]})
    fine = fine.copy()
    fine["yr"] = fine["yr"].astype("int64").astype(str)
    out = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    return pd.DataFrame({
        "priority": out["priority"], "yr": out["yr"],
        "sum_price": out["s"].astype(float).round(2),
        "n_orders": out["n"].astype("int64"),
    })


def token_cms_counts(sf_dir: str, *, rows: int = 4, width: int = 8192):
    """Count-min sketch of token frequencies — the second canonical
    mergeable sketch (counters merge with +, so per-batch partials tree-
    reduce and replays of idempotent stages stay safe): each batch builds
    a local rows x width counter array from its token counts (np.add.at
    over md5-derived positions of the batch's DISTINCT tokens — the md5
    cost is per distinct token per batch, not per occurrence); partials
    OR^H sum-reduce driver-side (256 KB each — the bloom-filter collect
    pattern; tree-reduce them on a real cluster). Output: every distinct
    token with its CM estimate (min over rows) — deterministic, so the
    oracle replicates the sketch bit-for-bit in SQL."""
    import hashlib

    docs = _read(sf_dir, "documents", ["text"], blocks=fanout_blocks(0.5))

    def _positions(token: str) -> list[int]:
        return [int(hashlib.md5(f"{r}:{token}".encode()).hexdigest()[:8], 16)
                % width for r in range(rows)]

    def _sketch_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat = pc.split_pattern(t.column("text"), " ")
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        vc = pc.value_counts(flat.flatten())
        sk = np.zeros((rows, width), dtype=np.int64)
        toks = vc.field("values").to_numpy(zero_copy_only=False)
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        for tok, c in zip(toks, cnts):
            for r, p in enumerate(_positions(str(tok))):
                sk[r, p] += int(c)
        return pa.Table.from_arrays([pa.array([sk.tobytes()])],
                                    names=["sk"])

    parts = docs.map_batches(_sketch_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    sk = np.zeros((rows, width), dtype=np.int64)
    for blob in parts["sk"]:
        sk += np.frombuffer(blob, dtype=np.int64).reshape(rows, width)

    # distinct tokens (vocab-sized) — batch-distinct partials + one
    # distinct shuffle; no count column rides along (it was never read)
    from ..util import bucket_distinct

    def _uni(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat = pc.split_pattern(t.column("text"), " ")
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        return pa.Table.from_arrays([flat.flatten().unique()],
                                    names=["token"])

    vocab = bucket_distinct(
        docs.map_batches(_uni, batch_format="pyarrow", batch_size=None),
        ["token"]).to_pandas()

    est = [int(min(sk[r, p] for r, p in enumerate(_positions(str(tok)))))
           for tok in vocab["token"]]
    return pd.DataFrame({"token": vocab["token"],
                         "est_count": pd.array(est, dtype="int64")})


def orders_upsert(sf_dir: str):
    """UPSERT / merge-on-key (the lakehouse CDC apply: delta rows replace
    base rows with the same key, new keys insert): one hash-partitioned
    anti-join (base minus delta keys) unioned with the delta — both sides
    shuffled by key, nothing broadcast, nothing materialized. The delta
    here is derived deterministically from the base (every 7th order gets
    a flat +1000.00 price adjustment — exact in double, deliberately not
    a x1.1 multiply whose half-cent rounding differs between pyarrow's
    half-even and DuckDB's half-away — and 1-URGENT priority) so the
    oracle can rebuild the
    identical delta in SQL. Output: the merged (o_orderkey, o_totalprice,
    o_orderpriority) table."""
    from ..util import bucket_anti_join

    base = _read(sf_dir, "orders",
                 ["o_orderkey", "o_totalprice", "o_orderpriority"],
                 blocks=fanout_blocks(0.5))

    def _mk_delta(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = t.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = t.filter(pa.array(k % 7 == 0))
        # np.round, not pc.round: clears the add's binary dust AND lands
        # on the same nearest-double as DuckDB's round (pc.round's
        # scale-multiply trick measured 1 ulp off on some values)
        price = pa.array(np.round(
            t.column("o_totalprice").cast(pa.float64()).to_numpy(
                zero_copy_only=False) + 1000.0, 2))
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("o_orderkey").cast(pa.int64()), price,
             pa.array(["1-URGENT"] * n, type=pa.string())],
            names=["o_orderkey", "o_totalprice", "o_orderpriority"])

    delta = base.map_batches(_mk_delta, batch_format="pyarrow",
                             batch_size=None)
    survivors = bucket_anti_join(
        base, delta, key="o_orderkey",
        left_cols={"o_totalprice": pa.float64(),
                   "o_orderpriority": pa.string()})

    def _project(t: pa.Table) -> pa.Table:
        # NO re-rounding: base prices are already canonical 2-decimal
        # doubles (DuckDB's round() is identity on them; pc.round is
        # measurably 1 ulp off on some values — see _mk_delta)
        return pa.Table.from_arrays(
            [t.column("o_orderkey").cast(pa.int64()),
             t.column("o_totalprice").cast(pa.float64()),
             t.column("o_orderpriority")],
            names=["o_orderkey", "o_totalprice", "o_orderpriority"])

    return survivors.map_batches(
        _project, batch_format="pyarrow").union(delta)


def doc_len_percentile(sf_dir: str):
    """Global percent-rank of every doc's length within its language —
    WITHOUT a sort: a two-phase (lang, n_chars) histogram (distinct
    lengths are bounded by the value domain, not the row count) is
    exclusive-cumsummed on the driver into a rank CDF, broadcast, and a
    second shuffle-free pass assigns percent_rank = (rank-1)/(n-1) — the
    histogram-order-statistic trick doc_len_quantiles uses, extended to
    per-row ranks. Rounded to 6."""
    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"],
                 blocks=fanout_blocks(0.5))

    hist = bucket_aggregate(
        docs.map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame({
                    "lang": t.column("lang").to_numpy(zero_copy_only=False),
                    "n_chars": t.column("n_chars").cast(pa.int64())
                    .to_numpy(zero_copy_only=False),
                }).groupby(["lang", "n_chars"], sort=False).size()
                .reset_index(name="c"), preserve_index=False)
                .replace_schema_metadata(None),
            batch_format="pyarrow"),
        ["lang", "n_chars"], {"c": ("c", "sum")}).to_pandas()

    hist = hist.sort_values(["lang", "n_chars"])
    hist["below"] = hist.groupby("lang")["c"].cumsum() - hist["c"]
    n_per_lang = hist.groupby("lang")["c"].sum()

    # percent_rank per DISTINCT (lang, n_chars) — computed ONCE on the
    # driver. Rounding uses exact Decimal half-away (DuckDB's round mode)
    # applied to the float64 quotient, because np.round's half-even
    # diverges on dyadic ties like 1/128 = 0.0078125 -> .007812 vs the
    # oracle's .007813
    from decimal import ROUND_HALF_UP, Decimal

    q6 = Decimal("0.000001")
    denom = (n_per_lang - 1).clip(lower=1).astype(float)
    quot = hist["below"].to_numpy(dtype=np.float64) / \
        denom.reindex(hist["lang"]).to_numpy()
    hist["pct_rank"] = [float(Decimal(float(v)).quantize(q6, ROUND_HALF_UP))
                        for v in quot]
    pct_map = hist[["lang", "n_chars", "pct_rank"]]
    pct_ref = ray.put(pct_map)

    def _rank(t: pa.Table) -> pa.Table:
        pm = ray.get(pct_ref)
        b = pd.DataFrame({
            "doc_id": t.column("doc_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "lang": t.column("lang").to_numpy(zero_copy_only=False),
            "n_chars": t.column("n_chars").cast(pa.int64()).to_numpy(
                zero_copy_only=False),
        })
        out = b.merge(pm, on=["lang", "n_chars"], how="left")
        return pa.Table.from_arrays(
            [pa.array(out["doc_id"].to_numpy()),
             pa.array(out["lang"].to_numpy(), type=pa.string()),
             pa.array(out["pct_rank"].to_numpy(dtype=np.float64))],
            names=["doc_id", "lang", "pct_rank"])

    return docs.map_batches(_rank, batch_format="pyarrow", batch_size=None)


def q3_shipping(sf_dir: str, *, cutoff: str = "1998-07-01",
                segment: str = "BUILDING", k: int = 10):
    """TPC-H Q3 shape — the classic 3-way star join with selective
    filters on every side (unshipped-orders revenue ranking): lineitem
    (ship date > cutoff, revenue combiner per orderkey) JOIN orders
    (order date < cutoff) on orderkey, then JOIN the segment-filtered
    customer on custkey as a distributed semi-join, then global top-k.

    Scale shape: filters run in the first pass over each side so only
    survivors cross the wire; both joins are hash-partitioned
    ``bucket_join``s (nothing O(SF) is broadcast); the per-orderkey
    revenue finalize is FUSED into join 1's bucket fn and the top-k
    partial into join 2's, so the reduce input is <= buckets x k rows —
    exactly two all-to-alls, then a driver-side final k. Output:
    (l_orderkey, revenue, order_date_us, o_orderpriority).
    """
    from ..util import bucket_join

    cut = pd.Timestamp(cutoff)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
               blocks=fanout_blocks())
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"], blocks=fanout_blocks(0.5))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"],
                 blocks=fanout_blocks(0.25))

    def _li_partial(t: pa.Table) -> pa.Table:
        # Arrow-native: filter + revenue combiner on corpus-sized batches
        t = t.filter(pc.greater(t.column("l_shipdate"),
                                pa.scalar(cut.to_pydatetime())))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        g = pa.table({"l_orderkey": t.column("l_orderkey"), "revenue": rev}) \
            .group_by("l_orderkey", use_threads=False) \
            .aggregate([("revenue", "sum")])
        return g.select(["l_orderkey", "revenue_sum"]).rename_columns(
            ["l_orderkey", "revenue"])

    def _ord_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("o_orderdate"),
                             pa.scalar(cut.to_pydatetime())))
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "order_date_us": t.column("o_orderdate")
            .cast(pa.timestamp("us")).cast(pa.int64()),
            "o_orderpriority": t.column("o_orderpriority"),
        })

    def _finalize_rev(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch lineitem partials for one orderkey co-locate here
        return (df.groupby(["l_orderkey", "o_custkey", "order_date_us",
                            "o_orderpriority"], sort=False)["revenue"]
                .sum().reset_index())

    j1 = bucket_join(
        li.map_batches(_li_partial, batch_format="pyarrow"),
        orders.map_batches(_ord_filter, batch_format="pyarrow"),
        key="l_orderkey", right_key="o_orderkey",
        left_cols={"revenue": pa.float64()},
        right_cols={"o_custkey": pa.int64(), "order_date_us": pa.int64(),
                    "o_orderpriority": pa.string()},
        post=_finalize_rev)

    def _cust_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("c_mktsegment"),
                                 segment)).select(["c_custkey"])

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["revenue", "order_date_us", "l_orderkey"],
                            ascending=[False, True, True]).head(k)
        return df[["l_orderkey", "revenue", "order_date_us",
                   "o_orderpriority"]]

    j2 = bucket_join(
        j1,
        cust.map_batches(_cust_filter, batch_format="pyarrow"),
        key="o_custkey", right_key="c_custkey",
        left_cols={"l_orderkey": pa.int64(), "revenue": pa.float64(),
                   "order_date_us": pa.int64(),
                   "o_orderpriority": pa.string()},
        right_cols={},
        post=_topk)

    out = j2.to_pandas()
    out = out.sort_values(["revenue", "order_date_us", "l_orderkey"],
                          ascending=[False, True, True]).head(k)
    out["revenue"] = out["revenue"].round(2)
    return out.reset_index(drop=True)


def customer_orders_left(sf_dir: str):
    """Per-segment customer activity including INACTIVE customers — the
    left-outer-join shape (every left row kept, missing right side
    NULL): customer LEFT JOIN per-customer order counts, aggregated to
    (c_mktsegment, n_customers, n_inactive, n_orders).

    Scale shape: orders are pre-counted per custkey inside the scan
    (combiner — only |custkeys| partial rows cross the wire, never raw
    orders); one hash-partitioned ``bucket_join(how="left")`` co-locates
    each customer with its count partials; the segment rollup is FUSED
    into the join bucket fn so the final reduce sees <= buckets x
    |segments| partial rows (driver-side sum — result-sized).
    """
    from ..util import bucket_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"],
                 blocks=fanout_blocks(0.25))
    orders = _read(sf_dir, "orders", ["o_custkey"],
                   blocks=fanout_blocks(0.5))

    def _ord_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey", use_threads=False).aggregate(
            [("o_custkey", "count")])
        return g.select(["o_custkey", "o_custkey_count"]).rename_columns(
            ["o_custkey", "n"])

    def _seg_partial(df: pd.DataFrame) -> pd.DataFrame:
        # several count partials may land per customer; sum them first
        # (skipna sum turns the all-NaN unmatched case into 0 — exactly
        # the COUNT(o_orderkey)=0 left-join semantic)
        per = (df.groupby(["c_custkey", "c_mktsegment"], sort=False)["n"]
               .sum().reset_index())
        per["n"] = per["n"].fillna(0).astype("int64")
        g = per.groupby("c_mktsegment", sort=False)
        return pd.DataFrame({
            "c_mktsegment": g.size().index,
            "n_customers": g.size().to_numpy(),
            "n_inactive": g["n"].apply(lambda s: int((s == 0).sum())).to_numpy(),
            "n_orders": g["n"].sum().to_numpy(),
        })

    j = bucket_join(
        cust, orders.map_batches(_ord_counts, batch_format="pyarrow"),
        key="c_custkey", right_key="o_custkey",
        left_cols={"c_mktsegment": pa.string()},
        right_cols={"n": pa.int64()},
        how="left", post=_seg_partial)

    out = j.to_pandas()
    out = (out.groupby("c_mktsegment", sort=True)
           [["n_customers", "n_inactive", "n_orders"]].sum().reset_index())
    for c in ("n_customers", "n_inactive", "n_orders"):
        out[c] = out[c].astype("int64")
    return out


def daily_activity_full(sf_dir: str):
    """Unified per-day activity calendar from two event sources — the
    FULL-OUTER-join shape: daily order counts FULL JOIN daily event
    counts on the day, zero-filled where one source has no rows that day
    (the order and event date ranges only partially overlap, so both
    unmatched sides occur). Output: (day_us, n_orders, n_events).

    Scale shape: each source is count-combined per day inside its scan
    (only |days| partial rows leave the read), reduced to one row per
    day by a hash-partitioned two-phase aggregate, then joined with
    ``bucket_join(how="full")``. Every shuffle is DAY-domain-sized
    (thousands of rows regardless of corpus size); the raw tables never
    cross the wire. Pre-reducing each side to unique keys is load-
    bearing: joining unreduced partials would cross-product same-key
    partial rows.
    """
    from ..util import bucket_aggregate, bucket_join

    day_us = 86_400_000_000

    orders = _read(sf_dir, "orders", ["o_orderdate"],
                   blocks=fanout_blocks(0.5))
    events = _read(sf_dir, "events", ["ts"], blocks=fanout_blocks())

    def _ord_days(t: pa.Table) -> pa.Table:
        us = t.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        d, n = np.unique(us // day_us * day_us, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(d), pa.array(n.astype(np.int64))], names=["day_us", "n"])

    def _ev_days(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        d, n = np.unique(us // day_us * day_us, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(d), pa.array(n.astype(np.int64))], names=["day_us", "n"])

    oagg = bucket_aggregate(
        orders.map_batches(_ord_days, batch_format="pyarrow",
                           batch_size=None),
        ["day_us"], {"n_orders": ("n", "sum")})
    eagg = bucket_aggregate(
        events.map_batches(_ev_days, batch_format="pyarrow",
                           batch_size=None),
        ["day_us"], {"n_events": ("n", "sum")})

    j = bucket_join(oagg, eagg, key="day_us",
                    left_cols={"n_orders": pa.int64()},
                    right_cols={"n_events": pa.int64()}, how="full")

    out = j.to_pandas()
    for c in ("n_orders", "n_events"):
        out[c] = out[c].fillna(0).astype("int64")
    return out.sort_values("day_us").reset_index(drop=True)


def orders_scd2(sf_dir: str):
    """Slowly-changing-dimension TYPE 2 build — the warehouse op that
    turns a change log into validity intervals: treating each customer's
    orders (ordered by date, orderkey tie-break) as a priority change
    log, emit one row per CHANGE (first value, or value differing from
    the previous row) with its validity window
    ``[valid_from_us, valid_to_us)``; the current (open) interval gets
    the -1 sentinel. -> (o_custkey, o_orderpriority, valid_from_us,
    valid_to_us).

    Scale shape: ONE customer-keyed bucket shuffle; inside a bucket the
    change detection and the next-change lead are a vectorized
    sort+shift over each customer's contiguous run — no window
    all-to-all, no driver collection (output is a Dataset, O(changes)
    rows). Same partitioning key as the other customer/order ops, so a
    multi-op pipeline reuses the exchange.
    """
    from ..util import bucket_map_keyed

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"], blocks=fanout_blocks(0.5))

    def _scd(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                               kind="mergesort")
        cust = b["o_custkey"].to_numpy()
        prio = b["o_orderpriority"].to_numpy()
        d_us = b["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
        same_cust = np.empty(len(b), dtype=bool)
        same_cust[0] = False
        same_cust[1:] = cust[1:] == cust[:-1]
        same_prio = np.empty(len(b), dtype=bool)
        same_prio[0] = False
        same_prio[1:] = prio[1:] == prio[:-1]
        keep = ~(same_cust & same_prio)  # first row per cust, or a change
        kc, kp, kd = cust[keep], prio[keep], d_us[keep]
        ksame = np.empty(len(kc), dtype=bool)
        if len(kc):
            ksame[-1] = False
            ksame[:-1] = kc[1:] == kc[:-1]
        valid_to = np.full(len(kc), -1, dtype=np.int64)
        valid_to[ksame] = np.roll(kd, -1)[ksame]
        return pd.DataFrame({
            "o_custkey": kc.astype("int64"),
            "o_orderpriority": kp,
            "valid_from_us": kd,
            "valid_to_us": valid_to,
        })

    return bucket_map_keyed(orders, ["o_custkey"], _scd)


def contrastive_negatives(sf_dir: str, *, k: int = 4):
    """Deterministic negative-pair sampling for contrastive training —
    for every document, ``k`` pseudo-random OTHER doc_ids drawn
    uniformly from the corpus: neg_j = (d + 1 + h(d,j) mod (n-1)) mod n
    with h a 60-bit md5-derived hash, which can never return d itself.
    -> (doc_id, pair_idx, neg_id), k rows per document.

    Scale shape: ZERO shuffles and zero joins — the corpus size n comes
    from parquet footer metadata (no scan), and sampling is a flat map
    over the doc_id column alone (text never read). Deterministic and
    repartition-stable, so the pairing is reproducible across runs and
    by the SQL oracle (DuckDB md5 of the same "d:j" string). The
    per-row md5 is the same scalar-loop-for-oracle-parity trade as
    split_assign/mixture_oversample; a production variant would swap in
    a vectorized 64-bit hash.
    """
    import hashlib

    from ..util import parquet_num_rows

    n = parquet_num_rows(os.path.join(sf_dir, "documents.parquet"))
    if n < 2:
        raise ValueError("contrastive_negatives needs >= 2 documents")

    docs = _read(sf_dir, "documents", ["doc_id"], blocks=fanout_blocks())

    def _negs(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        dd = np.repeat(d, k)
        jj = np.tile(np.arange(k, dtype=np.int64), len(d))
        h = np.array(
            [int(hashlib.md5(f"{a}:{b}".encode()).hexdigest()[:15], 16)
             for a, b in zip(dd, jj)], dtype=np.uint64)
        neg = (dd + 1 + (h % np.uint64(n - 1)).astype(np.int64)) % n
        return pa.Table.from_arrays(
            [pa.array(dd), pa.array(jj), pa.array(neg)],
            names=["doc_id", "pair_idx", "neg_id"])

    return docs.map_batches(_negs, batch_format="pyarrow", batch_size=None)


def doc_chunk(sf_dir: str, *, window: int = 32, stride: int = 24):
    """Token-window document chunking — the stage that turns raw docs into
    fixed-size overlapping training chunks (context windows with overlap,
    the split every pretraining/RAG ingestion pipeline runs before
    tokenizer packing). Chunk k of a doc covers whitespace tokens
    [k*stride, min(k*stride+window, n)); starts exist while k*stride < n,
    so every doc emits >= 1 chunk and the tail may be short.

    Scale shape: ZERO shuffles — one streaming flat-map pass, fully
    Arrow/numpy vectorized (no per-doc Python): split_pattern gives the
    flat token array + offsets; chunk starts, gather indices and output
    list offsets are all computed with the repeat/arange trick; chunk text
    is rebuilt with one ``binary_join`` over the gathered-token ListArray
    (overlapping chunks duplicate token REFERENCES via take, never doc
    strings). Output: (doc_id, chunk_idx, start_tok, n_tokens,
    chunk_text); output volume is ~(1 + overlap/stride) x corpus, which
    streams straight to the sink.
    """
    import pyarrow.compute as pc

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))

    def _chunks(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        toks = pc.split_pattern(
            t.column("text").combine_chunks(), pattern=" ")
        off = toks.offsets.to_numpy().astype(np.int64)
        flat = toks.values
        ntok = np.diff(off)  # >= 1: splitting '' yields ['']
        nchunks = (ntok - 1) // stride + 1
        doc_rep = np.repeat(np.arange(len(ids)), nchunks)
        ccum = np.concatenate([[0], np.cumsum(nchunks)])
        k = np.arange(int(ccum[-1]), dtype=np.int64) - \
            np.repeat(ccum[:-1], nchunks)
        start = k * stride
        lens = np.minimum(start + window, ntok[doc_rep]) - start
        # flat-token gather indices for every chunk position
        base = off[:-1][doc_rep] + start
        lcum = np.concatenate([[0], np.cumsum(lens)])
        idx = np.repeat(base, lens) + (
            np.arange(int(lcum[-1]), dtype=np.int64) -
            np.repeat(lcum[:-1], lens))
        gathered = flat.take(pa.array(idx, type=pa.int64()))
        lst = pa.LargeListArray.from_arrays(
            pa.array(lcum, type=pa.int64()), gathered)
        return pa.Table.from_arrays(
            [pa.array(ids[doc_rep]), pa.array(k), pa.array(start),
             pa.array(lens), pc.binary_join(lst, " ")],
            names=["doc_id", "chunk_idx", "start_tok", "n_tokens",
                   "chunk_text"])

    return docs.map_batches(_chunks, batch_format="pyarrow",
                            batch_size=None)


# pivot column order is the lang domain, pinned so the output schema is
# stable (a pivot's schema is part of its contract); langs outside the
# domain would raise rather than silently drop.
PIVOT_LANGS: tuple[str, ...] = ("de", "en", "es", "fr", "zh")


def pivot_lang_source(sf_dir: str):
    """Pivot (wide reshape): doc counts per source, languages as columns —
    the corpus-composition matrix every data-mixture report prints. The
    heavy side is ONE two-phase (source, lang) counting aggregate
    (|sources| x |langs| rows cross the shuffle, never docs); the reshape
    itself runs on the driver over that tiny table, which is the correct
    place for a pivot whose output is domain-sized. Output: (source,
    n_de, n_en, n_es, n_fr, n_zh, n_total).
    """
    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["source", "lang"],
                 blocks=fanout_blocks(0.25))

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "lang"], use_threads=False).aggregate(
            [("lang", "count")])
        return g.select(["source", "lang", "lang_count"]).rename_columns(
            ["source", "lang", "c"])

    cnt = bucket_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow"),
        ["source", "lang"], {"c": ("c", "sum")}).to_pandas()
    unknown = set(cnt["lang"]) - set(PIVOT_LANGS)
    if unknown:
        raise ValueError(f"langs outside pivot domain: {sorted(unknown)}")
    wide = (cnt.pivot_table(index="source", columns="lang", values="c",
                            aggfunc="sum", fill_value=0)
            .reindex(columns=list(PIVOT_LANGS), fill_value=0))
    out = wide.reset_index()
    out.columns = ["source"] + [f"n_{l}" for l in PIVOT_LANGS]
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    out["n_total"] = out[[f"n_{l}" for l in PIVOT_LANGS]].sum(axis=1)
    return out.sort_values("source").reset_index(drop=True)


def curate_corpus(sf_dir: str, *, seq_len: int = 2048, q: float = 0.1):
    """The CAPSTONE composition — the full corpus-curation pipeline a
    100 TB pretraining run executes, as ONE dataflow:

      1. quality filter: drop docs below their language's exact p10
         length (two-pass histogram threshold, quality_filter_census);
      2. exact dedup: keep the min-doc_id copy per normalized text hash
         (hash-partitioned, dedup_exact);
      3. near-dup dedup: MinHash-LSH candidates + exact-Jaccard verify +
         connected components, keep each cluster's min doc_id
         (dedup_near_pairs + dedup_components semantics);
      4. deterministic train/val/test split (split_assign);
      5. sequence packing: global token offsets + pack ids over the
         surviving docs in doc_id order (pack_assign's two-pass scan).

    Output: (doc_id, lang, split, n_tokens, tok_offset, pack_id) — the
    training-shard manifest. Every stage is the already-oracle-verified
    operator, composed dataset-to-dataset (no intermediate hits storage);
    the one materialize pins the CURATED corpus — the pipeline's product,
    where a real run would write_parquet — so the packing passes don't
    re-execute the dedup chain. The composed DuckDB oracle chains the
    same five stages in SQL."""
    import math

    import pyarrow.compute as pc

    from ..functions.textstats import fingerprint_batch
    from ..stages.dedup import dedup_components, near_dup_pairs_minhash
    from ..util import (adaptive_buckets, bucket_aggregate, bucket_anti_join,
                        bucket_join, bucket_map_keyed, select_cols)

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"],
                 blocks=fanout_blocks(0.5))

    # -- 1. per-lang p10 thresholds (exact counting-sort quantile) --------
    hist = bucket_aggregate(select_cols(docs, ["lang", "n_chars"]),
                            ["lang", "n_chars"],
                            {"cnt": ("n_chars", "count")})

    def _thresholds(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, grp in g.groupby("lang", sort=False):
            grp = grp.sort_values("n_chars", kind="mergesort")
            cum = grp["cnt"].cumsum().to_numpy()
            kth = max(0, math.ceil(q * int(cum[-1])) - 1)
            out.append((lang, int(grp["n_chars"].to_numpy()[
                np.searchsorted(cum, kth + 1)])))
        return pd.DataFrame(out, columns=["lang", "thr"])

    thr = dict(bucket_map_keyed(hist, ["lang"], _thresholds)
               .to_pandas().itertuples(index=False, name=None))

    thr_langs = pa.array(list(thr.keys()), type=pa.string())
    thr_vals = np.array(list(thr.values()), dtype=np.int64)

    def _quality(t: pa.Table) -> pa.Table:
        # Arrow-native: the |langs|-row threshold map as value_set + gather
        idx_a = pc.index_in(t.column("lang"), value_set=thr_langs)
        assert idx_a.null_count == 0  # pass 1 saw every lang
        idx = idx_a.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (t.column("n_chars").cast(pa.int64())
                .to_numpy(zero_copy_only=False) >= thr_vals[idx])
        return t.filter(pa.array(keep)).select(["doc_id", "text", "lang"])

    quality = docs.map_batches(_quality, batch_format="pyarrow")

    # -- 2. exact dedup: semi-join on the per-hash min doc_id -------------
    keepers = bucket_aggregate(
        quality.map_batches(fingerprint_batch, batch_format="pyarrow"),
        ["fp_norm"], {"keep_doc_id": ("doc_id", "min")})
    survivors = bucket_join(
        quality, select_cols(keepers, ["keep_doc_id"]),
        key="doc_id", right_key="keep_doc_id",
        left_cols={"text": pa.string(), "lang": pa.string()}, right_cols={})

    # -- 3. near-dup keep-one over the survivors --------------------------
    # pin the exact-dedup output: near_dup_pairs_minhash scans its input
    # TWICE (band pass + shingle-verify pass) and the anti-join consumes
    # it a third time — lazy, each pass would re-execute the quality
    # filter and the exact-dedup join (measured 9.9 s -> 5.9 s at sf0.1).
    # This is the stage boundary a resumable 100-TB run checkpoints to
    # parquet anyway; in-store materialize is the single-node analogue.
    survivors = survivors.materialize()
    pairs = near_dup_pairs_minhash(survivors)
    comp = dedup_components(pairs)

    def _nonkeep(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        c = t.column("component_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays([pa.array(d[d != c])], names=["doc_id"])

    nonkeep = comp.map_batches(_nonkeep, batch_format="pyarrow")
    kept = bucket_anti_join(
        survivors, nonkeep, key="doc_id",
        left_cols={"text": pa.string(), "lang": pa.string()})

    # the curated corpus IS the product; a real run writes it to parquet
    # here — materializing it keeps the two packing passes from
    # re-executing the dedup chain
    kept = kept.materialize()
    n_rows = max(1, kept.count())
    n_ranges = max(1, min(adaptive_buckets(16), n_rows))
    # kept ids are sparse after filtering; the mapping-based bases make
    # that a size skew, not a correctness issue (same as pack_assign)
    width = -(-n_rows // n_ranges)

    # -- 4+5. split + pack over the kept docs -----------------------------
    def _ntok(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64())
        idv = ids.to_numpy(zero_copy_only=False)
        n = pc.list_value_length(
            pc.split_pattern(t.column("text"), " ")).cast(pa.int64())
        b1 = split_b1(idv)
        split = np.where(b1 < SPLIT_TRAIN_LT, "train",
                         np.where(b1 < SPLIT_VAL_LT, "val", "test"))
        rng = pa.array(idv // width)
        return pa.Table.from_arrays(
            [ids, t.column("lang"), pa.array(split, type=pa.string()),
             n, rng],
            names=["doc_id", "lang", "split", "n_tokens", "rng"])

    ntok = kept.map_batches(_ntok, batch_format="pyarrow")
    totals = bucket_aggregate(
        ntok, ["rng"], {"total": ("n_tokens", "sum")}).to_pandas()
    totals = totals.sort_values("rng")
    tot = totals["total"].to_numpy()
    base_map = pd.Series(np.cumsum(tot) - tot,
                         index=totals["rng"].to_numpy(), dtype="int64")
    base_ref = ray.put(base_map)

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values(["rng", "doc_id"], kind="mergesort")
        nt = b["n_tokens"].to_numpy()
        rng = b["rng"].to_numpy()
        cs = np.cumsum(nt) - nt
        new_rng = np.empty(len(b), dtype=bool)
        new_rng[0] = True
        new_rng[1:] = rng[1:] != rng[:-1]
        base_cs = np.maximum.accumulate(np.where(new_rng, cs, 0))
        off = ray.get(base_ref).loc[rng].to_numpy() + (cs - base_cs)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(), "lang": b["lang"].to_numpy(),
            "split": b["split"].to_numpy(), "n_tokens": nt,
            "tok_offset": off, "pack_id": off // seq_len,
        })

    return bucket_map_keyed(ntok, ["rng"], _pack)


def events_props_stats(sf_dir: str):
    """Semi-structured extraction: parse the JSON ``props`` payload column
    and aggregate the extracted field per event type — the
    log-enrichment shape (every clickstream/table-log pipeline starts by
    lifting fields out of a JSON blob; ref analogue: the lookup-response
    JSON parsers, SURVEY §2.2 M8-M10, applied to an event stream).

    Scale shape: extraction is a zero-shuffle vectorized pass
    (``pc.extract_regex`` on the Arrow string column — the props schema
    here is flat single-key JSON, so an anchored regex IS the parser; a
    nested payload would swap in a per-batch ``pa.json`` reader, same
    dataflow). Missing/unparseable keys become NULL and are excluded from
    the aggregates exactly like SQL. The per-type rollup pre-combines per
    batch, so the one shuffle carries |event_types| x batches rows.
    Integer sums keep the oracle comparison exact."""
    from ..util import bucket_aggregate

    ev = _read(sf_dir, "events", ["event_type", "props"],
               blocks=fanout_blocks(0.5))

    def _extract(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.Table.from_arrays(
            [t.column("event_type"), k,
             pc.cast(pc.is_valid(k), pa.int64())],
            names=["event_type", "k", "k_present"])

    parsed = ev.map_batches(_extract, batch_format="pyarrow")
    agg = bucket_aggregate(
        parsed, ["event_type"],
        {"n": ("event_type", "count"), "n_k": ("k_present", "sum"),
         "sum_k": ("k", "sum"), "min_k": ("k", "min"),
         "max_k": ("k", "max")})

    def _sql_nulls(df: pd.DataFrame) -> pd.DataFrame:
        # pandas sum over an all-null group returns 0.0 where SQL sum(k)
        # is NULL; restore NULL (NaN) when no k value was parseable
        # (min/max already yield NaN over all-null groups)
        empty = df["n_k"].to_numpy() == 0
        if empty.any():
            df = df.copy()
            df["sum_k"] = df["sum_k"].astype("float64")
            df.loc[empty, "sum_k"] = np.nan
        return df

    return agg.map_batches(_sql_nulls, batch_format="pandas")


def events_rolling_7d(sf_dir: str):
    """Rolling 7-row window average of daily event counts per type — the
    trailing-window trend feature (ROWS BETWEEN 6 PRECEDING AND CURRENT
    ROW over day-ordered counts). Complements the tumbling/sliding/
    session windows with the cumulative-frame shape.

    Scale shape: the corpus-sized work is ONE combiner count shuffle down
    to the |event_types| x |days| domain table (years of days x a handful
    of types — thousands of rows at any corpus size); the rolling frame
    then runs per type on that tiny table via a cumsum difference
    (roll[i] = cs[i] - cs[i-7]), vectorized, inside a keyed map so each
    type's day series is complete in one place. avg_7d = int64 window
    sum / window row count in float64 — bit-identical to the SQL window
    AVG over BIGINT."""
    from ..util import bucket_aggregate, bucket_map_keyed

    ev = _read(sf_dir, "events", ["ts", "event_type"],
               blocks=fanout_blocks(0.5))

    def _day(t: pa.Table) -> pa.Table:
        day = pa.array((t.column("ts").cast(pa.int64())
                        .to_numpy(zero_copy_only=False)
                        // 86_400_000_000).astype(np.int64))
        return pa.Table.from_arrays([t.column("event_type"), day],
                                    names=["event_type", "day"])

    daily = bucket_aggregate(
        ev.map_batches(_day, batch_format="pyarrow"),
        ["event_type", "day"], {"n": ("day", "count")})

    def _roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "day"], kind="mergesort")
        out = []
        for _, grp in g.groupby("event_type", sort=False):
            n = grp["n"].to_numpy(dtype=np.int64)
            cs = np.cumsum(n)
            lag = np.zeros(len(n), dtype=np.int64)
            if len(n) > 7:
                lag[7:] = cs[:-7]
            roll = cs - lag
            cnt = np.minimum(np.arange(len(n)) + 1, 7)
            out.append(pd.DataFrame({
                "event_type": grp["event_type"].to_numpy(),
                "day": grp["day"].to_numpy(), "n": n,
                "avg_7d": roll / cnt,
            }))
        return pd.concat(out, ignore_index=True)

    return bucket_map_keyed(daily, ["event_type"], _roll)


def doc_len_norm(sf_dir: str):
    """Per-group feature standardization: z-score each document's length
    against ITS language's mean/std — the feature-normalization pass of a
    training-data pipeline (per-stratum standardization before filtering
    or mixing). Corpus-sized OUTPUT, unlike the monitoring z-scores whose
    domain is the tiny time axis.

    Scale shape: classic two-pass broadcast standardization — pass 1 is a
    combiner shuffle of exact integer partials (count, sum, sum of
    squares) down to the |langs| table; the lang -> (mean, std) map ships
    in the scan closure (25-row broadcast, J6 semantics); pass 2 scores
    every doc SHUFFLE-FREE. Sample variance from exact integer sums,
    z rounded to 4 (same stddev_samp parity convention as
    events_hourly_zscore)."""
    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"],
                 blocks=fanout_blocks(0.25))

    def _partials(t: pa.Table) -> pa.Table:
        n = t.column("n_chars").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [t.column("lang"), pa.array(n), pa.array(n * n)],
            names=["lang", "s", "sq"])

    stats = bucket_aggregate(
        docs.map_batches(_partials, batch_format="pyarrow"),
        ["lang"],
        {"cnt": ("s", "count"), "s": ("s", "sum"), "sq": ("sq", "sum")},
    ).to_pandas()
    mu = stats["s"] / stats["cnt"]
    var = (stats["sq"] - stats["s"] ** 2 / stats["cnt"]) / (stats["cnt"] - 1)
    sd = np.sqrt(var.clip(lower=0.0))
    mu_map = dict(zip(stats["lang"], mu))
    sd_map = dict(zip(stats["lang"], sd))

    def _score(t: pa.Table) -> pa.Table:
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        n = t.column("n_chars").cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = np.array([mu_map[l] for l in langs])
        s = np.array([sd_map[l] for l in langs])
        z = np.where(s > 0, np.round((n - m) / np.where(s > 0, s, 1.0), 4), 0.0)
        return pa.Table.from_arrays(
            [t.column("doc_id"), t.column("lang"), pa.array(z)],
            names=["doc_id", "lang", "z_len"])

    return docs.map_batches(_score, batch_format="pyarrow")


_PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?\d[\d\- ]{7,}\d"


def doc_scrub_pii(sf_dir: str):
    """PII scrubbing (the C4/RefinedWeb-style redaction pass): replace
    email- and phone-shaped substrings with placeholder tokens ->
    (doc_id, clean_text, n_redactions). Zero shuffles — both Arrow and
    DuckDB run RE2, so the oracle is the same regex pair verbatim; phones
    are counted on the email-redacted text in both engines so the two
    passes compose identically."""
    import pyarrow.compute as pc

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))

    def _scrub(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        n1 = pc.count_substring_regex(txt, _PII_EMAIL)
        s1 = pc.replace_substring_regex(txt, _PII_EMAIL,
                                        replacement="<EMAIL>")
        n2 = pc.count_substring_regex(s1, _PII_PHONE)
        s2 = pc.replace_substring_regex(s1, _PII_PHONE,
                                        replacement="<PHONE>")
        return pa.Table.from_arrays(
            [t.column("doc_id"), s2,
             pc.add(n1, n2).cast(pa.int64())],
            names=["doc_id", "clean_text", "n_redactions"])

    return docs.map_batches(_scrub, batch_format="pyarrow")


def weighted_sample(sf_dir: str, *, k: int = 100):
    """Weight-proportional sampling WITHOUT replacement (Efraimidis &
    Spirakis A-ES, Inf. Process. Lett. 2006): doc i gets key
    ln(u_i)/w_i with u_i a deterministic 60-bit md5 uniform and
    w_i = n_chars; the k LARGEST keys are exactly a weighted sample
    without replacement. Deterministic uniforms make the draw
    reproducible across epochs AND oracle-checkable (DuckDB derives the
    same md5 arithmetic). Zero-weight docs are excluded — they can never
    be drawn. -> (doc_id, n_chars, rank) for the k winners.

    Scale shape: ZERO shuffles — per-block partial top-k (argpartition),
    then ONE final top-k over <= blocks x k candidate rows. Only the
    ordering of keys matters, so ln()-rounding differences between numpy
    and DuckDB cannot flip distinct md5-derived keys."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"],
                 blocks=fanout_blocks(0.25))

    def _keys(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = t.column("n_chars").cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = w > 0
        ids, w = ids[m], w[m]
        h = np.array(
            [int(hashlib.md5(f"{i}:ws".encode()).hexdigest()[:15], 16)
             for i in ids], dtype=np.float64)
        u = (h + 1.0) / 1152921504606846977.0  # (0, 1], 2^60 + 1
        key = np.log(u) / w
        if len(ids) > k:
            keep = np.argpartition(-key, k - 1)[:k]
            ids, w, key = ids[keep], w[keep], key[keep]
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(w), pa.array(key)],
            names=["doc_id", "n_chars", "key"])

    from ..util import coalesce_blocks

    partial = coalesce_blocks(
        docs.map_batches(_keys, batch_format="pyarrow").materialize(), cap=1)

    def _final(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        w = t.column("n_chars").to_numpy(zero_copy_only=False)
        key = t.column("key").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -key))[:k]
        return pa.Table.from_arrays(
            [pa.array(ids[order]), pa.array(w[order]),
             pa.array(np.arange(1, len(order) + 1, dtype=np.int64))],
            names=["doc_id", "n_chars", "rank"])

    return partial.map_batches(_final, batch_format="pyarrow",
                               batch_size=None)


def doc_shuffle_rank(sf_dir: str):
    """Deterministic global training order: every doc gets a unique dense
    rank 0..N-1 in md5-key order — the seeded-epoch-shuffle op (training
    shards read rank ranges; the order is content-independent,
    reproducible, and oracle-checkable, unlike ``random_shuffle``).

    Scale shape: ONE range-partitioned sort on the 32-char md5 key — a
    uniformly distributed key, so the range partitioner can never see
    skew — then the global dense rank is per-block offset + arange. The
    offsets need each block's ROW COUNT only (a driver-side cumsum over
    block metadata, same two-pass shape as ``pack_assign``), applied via
    tiny per-block Ray tasks on the already-materialized sorted block
    refs (the SURVEY §7.3 escape hatch; no second shuffle, no row data
    through the driver)."""
    import hashlib

    import ray
    import ray.data as rd

    docs = _read(sf_dir, "documents", ["doc_id"], blocks=fanout_blocks(0.25))

    def _key(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pa.Table.from_arrays([pa.array(ids), pa.array(keys)],
                                    names=["doc_id", "k"])

    sorted_ds = (docs.map_batches(_key, batch_format="pyarrow")
                 .sort(["k", "doc_id"]).materialize())
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _nrows(block: pa.Table) -> int:
        return block.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    @ray.remote
    def _rank(block: pa.Table, off: int) -> pa.Table:
        return pa.Table.from_arrays(
            [block.column("doc_id"),
             pa.array(off + np.arange(block.num_rows, dtype=np.int64))],
            names=["doc_id", "rank"])

    out = [_rank.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out)


def events_attribution(sf_dir: str):
    """Last-touch attribution: every purchase is attributed to the SAME
    user's latest strictly-preceding click -> (purchase_id, click_id,
    gap_us). The marketing-attribution shape — an AS-OF self-join within
    one stream, complementing ``events_last_order_asof``'s two-stream
    join.

    Scale shape: ONE user-keyed bucket shuffle (pre-thinned to the two
    event types in the scan), then per-bucket vectorized searchsorted:
    clicks sorted by (ts, event_id) so the insertion point - 1 IS the
    latest prior click with the max-event-id tie-break; gaps are exact
    int64 microseconds. No per-event Python, no cross join."""
    from ..util import bucket_map_keyed

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"],
               blocks=fanout_blocks(0.5))

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["event_type"].isin(["click", "purchase"])]

    def _attr(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        ts_us = g["ts"].astype("int64")
        g = g.assign(_ts=ts_us)
        for _, u in g.groupby("user_id", sort=False):
            c = u[u["event_type"] == "click"].sort_values(
                ["_ts", "event_id"], kind="mergesort")
            p = u[u["event_type"] == "purchase"]
            if not len(c) or not len(p):
                continue
            cts = c["_ts"].to_numpy()
            cid = c["event_id"].to_numpy()
            pts = p["_ts"].to_numpy()
            idx = np.searchsorted(cts, pts, side="left") - 1
            ok = idx >= 0
            out.append(pd.DataFrame({
                "purchase_id": p["event_id"].to_numpy()[ok],
                "click_id": cid[idx[ok]],
                "gap_us": pts[ok] - cts[idx[ok]],
            }))
        if not out:
            return pd.DataFrame({
                "purchase_id": pd.Series([], dtype="int64"),
                "click_id": pd.Series([], dtype="int64"),
                "gap_us": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    return bucket_map_keyed(ev, ["user_id"], _attr, pre=_pre)


def contamination_near_dup(sf_dir: str, *, threshold: float = 0.8,
                           bench_mod: int = 10):
    """Near-duplicate decontamination ACROSS datasets: corpus docs whose
    Jaccard similarity to any held-out benchmark doc (doc_id %
    bench_mod == 0, same split as ``contamination_ngram``) reaches the
    threshold -> (corpus_doc, bench_doc, jaccard). Catches paraphrase-free
    rewraps the verbatim 8-gram check misses when whitespace or a prefix
    shifts every window.

    Scale shape: the full MinHash-LSH core is reused UNSPLIT — band
    buckets see both sides (a cross-dataset join via the same one-shuffle
    candidate generation), and the side restriction is a post-verify
    vectorized filter. Running LSH once over the union beats two
    per-side runs plus a cross-only join: candidates are near-dup-bounded
    either way and the band shuffle is shared."""
    from ..stages.dedup import near_dup_pairs_minhash

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))
    pairs = near_dup_pairs_minhash(docs, threshold=threshold)

    def _cross(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        a_bench = a % bench_mod == 0
        b_bench = b % bench_mod == 0
        keep = a_bench != b_bench  # exactly one endpoint in the benchmark
        corpus = np.where(a_bench, b, a)[keep]
        bench = np.where(a_bench, a, b)[keep]
        j = t.column("jaccard").to_numpy(zero_copy_only=False)[keep]
        return pa.Table.from_arrays(
            [pa.array(corpus), pa.array(bench), pa.array(j)],
            names=["corpus_doc", "bench_doc", "jaccard"])

    return pairs.map_batches(_cross, batch_format="pyarrow")


def orders_snapshot_diff(sf_dir: str):
    """Lakehouse snapshot diff: row-level (key, status) deltas between two
    table versions — the change-detection op behind incremental syncs and
    CDC validation, complementing ``orders_upsert`` (which APPLIES a
    delta; this one DERIVES it). v2 simulates the next snapshot
    deterministically from v1 so both engines see identical versions:
    keys % 7 == 0 deleted, surviving keys % 5 == 0 get a changed
    priority, and keys % 11 == 0 reappear shifted by 1e9 as inserts.

    Scale shape: ONE hash-partitioned full-outer ``bucket_join`` on the
    key with the status classification FUSED into the join bucket fn
    (left-only -> removed, right-only -> added, both -> changed iff the
    payload differs; unchanged rows are dropped INSIDE the shuffle stage,
    so the reduce output is delta-sized, not table-sized)."""
    from ..util import bucket_join

    v1 = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"],
               blocks=fanout_blocks(0.5))

    def _v1(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("o_orderkey").cast(pa.int64()),
             t.column("o_orderpriority")],
            names=["o_orderkey", "pri_v1"])

    def _v2(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = t.column("o_orderkey").cast(pa.int64())
        kn = k.to_numpy(zero_copy_only=False)
        pri = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        survive = kn % 7 != 0
        changed = survive & (kn % 5 == 0)
        out_k = kn[survive]
        out_p = np.where(changed[survive], "9-CHANGED", pri[survive])
        ins = kn % 11 == 0
        out_k = np.concatenate([out_k, kn[ins] + 1_000_000_000])
        out_p = np.concatenate([out_p, pri[ins]])
        return pa.Table.from_arrays(
            [pa.array(out_k), pa.array(out_p, type=pa.string())],
            names=["o_orderkey", "pri_v2"])

    def _classify(df: pd.DataFrame) -> pd.DataFrame:
        v1n = df["pri_v1"].notna()
        v2n = df["pri_v2"].notna()
        status = np.where(~v2n, "removed",
                          np.where(~v1n, "added",
                                   np.where(df["pri_v1"] != df["pri_v2"],
                                            "changed", "same")))
        keep = status != "same"
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy()[keep].astype(np.int64),
            "status": status[keep]})

    return bucket_join(
        v1.map_batches(_v1, batch_format="pyarrow"),
        v1.map_batches(_v2, batch_format="pyarrow"),
        key="o_orderkey",
        left_cols={"pri_v1": pa.string()},
        right_cols={"pri_v2": pa.string()},
        how="full", post=_classify)


def doc_len_decile(sf_dir: str):
    """Per-group equi-depth binning: every doc gets its language's length
    DECILE (ntile(10) over (n_chars, doc_id) order) — the equi-depth
    bucketing behind curriculum schedules and balanced stratification
    (equal COUNTS per bin, unlike the fixed thresholds of
    ``quality_filter_census``).

    Scale shape: ONE range-partitioned sort on (lang, n_chars, doc_id) —
    the same sort + per-block-offset rank assignment as
    ``doc_shuffle_rank`` — then per-lang rank = global rank minus the
    lang's base offset, with the |langs|-sized (base, count) map shipped
    in the closure. The exact ntile arithmetic (first n%10 buckets one
    row larger) runs vectorized per block; no second shuffle."""
    import ray
    import ray.data as rd

    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"],
                 blocks=fanout_blocks(0.25))

    counts = bucket_aggregate(
        docs, ["lang"], {"n": ("doc_id", "count")}).to_pandas()
    counts = counts.sort_values("lang").reset_index(drop=True)
    base = dict(zip(counts["lang"],
                    np.cumsum(counts["n"]) - counts["n"]))
    size = dict(zip(counts["lang"], counts["n"]))

    sorted_ds = docs.sort(["lang", "n_chars", "doc_id"]).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _nrows(block: pa.Table) -> int:
        return block.num_rows

    nrows = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(nrows)[:-1]]).astype(np.int64)

    @ray.remote
    def _decile(block: pa.Table, off: int) -> pa.Table:
        langs = block.column("lang").to_numpy(zero_copy_only=False)
        g_rank = off + np.arange(block.num_rows, dtype=np.int64)
        r = g_rank - np.array([base[l] for l in langs])
        n = np.array([size[l] for l in langs], dtype=np.int64)
        q, rem = n // 10, n % 10
        boundary = rem * (q + 1)
        small = r < boundary
        tile = np.where(small, r // np.maximum(q + 1, 1),
                        rem + (r - boundary) // np.maximum(q, 1)) + 1
        return pa.Table.from_arrays(
            [block.column("doc_id"), block.column("lang"),
             block.column("n_chars"), pa.array(tile.astype(np.int64))],
            names=["doc_id", "lang", "n_chars", "decile"])

    out = [_decile.remote(rf, int(o)) for rf, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out)


def events_transition_census(sf_dir: str):
    """First-order Markov transition census over per-user event sequences:
    (from_type, to_type, n) counting consecutive event pairs in each
    user's ts-ordered stream — the sequence-mining complement of the
    fixed-pattern ``events_funnel`` (this one counts EVERY adjacent
    transition). Tie-break within equal timestamps by event_id, so the
    sequence is total and both engines see the same successor.

    Scale shape: ONE user-keyed bucket shuffle (events pre-thinned to 3
    columns in the scan), a vectorized shift per user segment inside the
    bucket (no per-event Python), per-bucket pre-counting, then a tiny
    |types|^2-sized final census."""
    from ..util import bucket_aggregate, bucket_map_keyed

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"],
               blocks=fanout_blocks(0.5))

    def _trans(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = b["user_id"].to_numpy()
        et = b["event_type"].to_numpy()
        same_user = uid[1:] == uid[:-1]
        frm = et[:-1][same_user]
        to = et[1:][same_user]
        if not len(frm):
            return pd.DataFrame({
                "from_type": pd.Series([], dtype="string"),
                "to_type": pd.Series([], dtype="string"),
                "n": pd.Series([], dtype="int64")})
        out = (pd.DataFrame({"from_type": frm, "to_type": to})
               .groupby(["from_type", "to_type"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    per_bucket = bucket_map_keyed(ev, ["user_id"], _trans)
    return bucket_aggregate(per_bucket, ["from_type", "to_type"],
                            {"n": ("n", "sum")})


def events_trend_slope(sf_dir: str):
    """Per-type linear trend: least-squares slope of daily event counts
    over epoch-day x — the trend-detection op behind volume monitoring
    (is this event type growing or decaying?). -> (event_type, n_days,
    slope).

    Determinism: the slope is computed from EXACT INTEGER sums
    (n, Σx, Σy, Σxy, Σx²) with one float64 division at the end —
    bit-identical across engines because both sides evaluate the same
    two integer products and one quotient (no covariance recurrences).
    Scale shape: one combiner count shuffle to the types x days table,
    then the regression runs on the tiny result."""
    from ..util import bucket_aggregate, bucket_map_keyed

    ev = _read(sf_dir, "events", ["ts", "event_type"],
               blocks=fanout_blocks(0.5))

    def _day(t: pa.Table) -> pa.Table:
        day = pa.array((t.column("ts").cast(pa.int64())
                        .to_numpy(zero_copy_only=False)
                        // 86_400_000_000).astype(np.int64))
        return pa.Table.from_arrays([t.column("event_type"), day],
                                    names=["event_type", "day"])

    daily = bucket_aggregate(
        ev.map_batches(_day, batch_format="pyarrow"),
        ["event_type", "day"], {"y": ("day", "count")})

    def _slope(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            x = grp["day"].to_numpy(dtype=np.int64)
            y = grp["y"].to_numpy(dtype=np.int64)
            n = len(x)
            sx, sy = int(x.sum()), int(y.sum())
            sxy = int((x * y).sum())
            sxx = int((x * x).sum())
            den = n * sxx - sx * sx
            slope = float(n * sxy - sx * sy) / float(den) if den else 0.0
            out.append((et, n, slope))
        return pd.DataFrame(out, columns=["event_type", "n_days", "slope"])

    return bucket_map_keyed(daily, ["event_type"], _slope)


def events_value_psi(sf_dir: str, *, bucket_width: float = 10.0):
    """Population-stability-index drift check: compare the ``value``
    distribution of the FIRST half of the event stream (by median split
    on event_id — deterministic, data-independent) against the second
    half, per fixed-width bucket -> (bucket, n_a, n_b, psi_term). The
    data-drift monitor of a production feature pipeline; sum(psi_term)
    > 0.2 is the conventional drift alarm.

    Scale shape: one combiner count shuffle to the 2 x |buckets| table
    (buckets are value-range-bounded, corpus-independent); PSI terms
    compute on the tiny result. Laplace-smoothed (+1 per cell) so empty
    buckets stay finite; ln from libm on exact count ratios, rounded to
    6 (the idf bit-parity convention)."""
    from ..util import bucket_aggregate

    ev = _read(sf_dir, "events", ["event_id", "value"],
               blocks=fanout_blocks(0.5))
    n_total = _read(sf_dir, "events", ["event_id"]).count()
    half = n_total // 2

    def _bucketize(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        val = t.column("value").cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        side = (eid >= half).astype(np.int8)
        bucket = np.floor(val / bucket_width).astype(np.int64)
        return pa.Table.from_arrays([pa.array(bucket), pa.array(side)],
                                    names=["bucket", "side"])

    counts = bucket_aggregate(
        ev.map_batches(_bucketize, batch_format="pyarrow"),
        ["bucket", "side"], {"n": ("side", "count")}).to_pandas()

    wide = counts.pivot(index="bucket", columns="side", values="n").fillna(0)
    wide = wide.reindex(columns=[0, 1], fill_value=0).sort_index()
    n_a = wide[0].to_numpy(dtype=np.int64)
    n_b = wide[1].to_numpy(dtype=np.int64)
    tot_a, tot_b = int(n_a.sum()), int(n_b.sum())
    k = len(wide)
    p = (n_a + 1.0) / (tot_a + k)
    q = (n_b + 1.0) / (tot_b + k)
    # scalar libm log (not np.log's SIMD path) for oracle bit-parity with
    # DuckDB's ln — the TF-IDF idf convention; k is tiny
    import math

    psi = np.round(np.array([(pi - qi) * math.log(pi / qi)
                             for pi, qi in zip(p, q)]), 6)
    return pd.DataFrame({
        "bucket": wide.index.to_numpy(dtype=np.int64),
        "n_a": n_a, "n_b": n_b, "psi_term": psi})


def split_leakfree(sf_dir: str):
    """Leakage-free train/val/test split: assignment is hashed on the
    NEAR-DUP CLUSTER representative, not the doc — every member of a dup
    cluster lands in the same split, closing the eval-contamination hole
    ``split_assign`` leaves open (a near-copy of a test doc in train).
    -> (doc_id, rep_id, split).

    Scale shape: the minhash -> components chain is edge-bounded (only
    docs in >= 1 dup pair reach the component table); the rep attach is
    a hash-partitioned LEFT ``bucket_join`` (both sides shuffled —
    never a corpus-sized broadcast), singletons default rep_id = doc_id,
    and the md5-threshold assignment runs shuffle-free on the joined
    stream with ``split_assign``'s exact thresholds."""
    import hashlib

    from ..stages.dedup import dedup_components, near_dup_pairs_minhash
    from ..util import bucket_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))
    comp = dedup_components(near_dup_pairs_minhash(docs))

    def _ids_only(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64())], names=["doc_id"])

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        comp_id = df["component_id"].to_numpy()
        rep = np.where(pd.isna(comp_id), ids,
                       np.nan_to_num(comp_id, nan=0)).astype(np.int64)
        b1 = split_b1(rep)
        split = np.where(b1 < SPLIT_TRAIN_LT, "train",
                         np.where(b1 < SPLIT_VAL_LT, "val", "test"))
        return pd.DataFrame({"doc_id": ids, "rep_id": rep, "split": split})

    return bucket_join(
        docs.map_batches(_ids_only, batch_format="pyarrow"),
        comp, key="doc_id",
        left_cols={}, right_cols={"component_id": pa.int64()},
        how="left", post=_assign)


def orders_checksum(sf_dir: str):
    """Order-independent table content checksum -> one row (n_rows,
    checksum): the cross-system sync-validation op (compare a table's
    content across two engines/replicas without moving rows — exactly how
    the snapshot-diff family is validated in production). checksum =
    sum of per-row 60-bit md5 of the canonical key string, mod 2^61-1 —
    commutative/associative, so it is repartition- and order-invariant
    by construction.

    Scale shape: zero shuffles — per-batch modular partial sums (one
    tiny row per batch) reduced on the driver with arbitrary-precision
    ints (the partial table is batch-count-sized, not row-count-sized)."""
    import hashlib

    M = (1 << 61) - 1

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"],
                   blocks=fanout_blocks(0.5))

    def _partial(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        p = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        s = 0
        for ki, pi in zip(k, p):
            s = (s + int(hashlib.md5(
                f"{ki}:{pi}".encode()).hexdigest()[:15], 16)) % M
        return pa.table({"n": pa.array([len(k)], type=pa.int64()),
                         "s": pa.array([s], type=pa.int64())})

    parts = orders.map_batches(_partial, batch_format="pyarrow").to_pandas()
    total = 0
    for v in parts["s"]:
        total = (total + int(v)) % M
    return pd.DataFrame({"n_rows": [int(parts["n"].sum())],
                         "checksum": [total]})


def events_item_cooccur(sf_dir: str, *, min_n: int = 2):
    """Item-item co-occurrence mining — the collaborative-filtering
    counting shape: items (the JSON props ``k`` field) that the same user
    interacted with, counted over distinct (user, item) pairs ->
    (item_a, item_b, n_users) with item_a < item_b and n_users >= min_n.

    Scale shape: per-batch regex extraction (zero-shuffle), a distinct
    (user, item) thinning shuffle, ONE user-keyed co-location where the
    pair expansion is a vectorized self-merge per bucket, then a
    combiner census over the ITEM-DOMAIN-BOUNDED pair space (items are a
    catalog, not a corpus — the pair table is |items|^2 at worst
    regardless of event count)."""
    import pyarrow.compute as pc

    from ..util import bucket_aggregate, bucket_distinct, bucket_map_keyed

    ev = _read(sf_dir, "events", ["user_id", "props"],
               blocks=fanout_blocks(0.5))

    def _extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        out = pa.Table.from_arrays(
            [t.column("user_id").cast(pa.int64()), k],
            names=["user_id", "item"])
        return out.filter(pc.is_valid(out.column("item")))

    pairs_src = bucket_distinct(
        ev.map_batches(_extract, batch_format="pyarrow"),
        ["user_id", "item"])

    def _pairs(b: pd.DataFrame) -> pd.DataFrame:
        m = b.merge(b, on="user_id", suffixes=("_a", "_b"))
        m = m[m["item_a"] < m["item_b"]]
        return m[["item_a", "item_b"]].reset_index(drop=True)

    pair_rows = bucket_map_keyed(pairs_src, ["user_id"], _pairs)
    counts = bucket_aggregate(pair_rows, ["item_a", "item_b"],
                              {"n_users": ("item_a", "count")})

    def _thresh(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n_users"), min_n))

    return counts.map_batches(_thresh, batch_format="pyarrow")


def revenue_share(sf_dir: str):
    """Share-of-group BI rollup: each nation's revenue as a fraction of
    its REGION's total -> (region, nation, revenue, share). The classic
    ratio-to-window-total report, computed without any window all-to-all:
    the corpus-sized work is exactly ``revenue_by_nation``'s
    hash-partitioned join + rollup; the share step runs on the 25-row
    result with the 25-row nation -> region map fused in. Revenue is
    rounded to cents BEFORE the ratio and the share to 6 after (pins
    float-sum-order noise on both sides — the ratio operands are then
    identical doubles)."""
    nat_rev = revenue_by_nation(sf_dir)
    if not isinstance(nat_rev, pd.DataFrame):
        nat_rev = nat_rev.to_pandas()

    nation = _read(sf_dir, "nation", ["n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    m = (nat_rev.merge(nation, on="n_name")
         .merge(region, left_on="n_regionkey", right_on="r_regionkey"))
    region_rev = m.groupby("r_name")["revenue"].transform("sum")
    return pd.DataFrame({
        "region": m["r_name"],
        "nation": m["n_name"],
        "revenue": m["revenue"],
        "share": (m["revenue"] / region_rev).round(6),
    }).reset_index(drop=True)


def events_item_sim(sf_dir: str, *, min_n: int = 2):
    """Normalized item-item similarity — co-occurrence cosine
    sim(a, b) = n_users(a, b) / sqrt(df_a * df_b) over distinct user
    interactions, the item-CF scoring step on top of
    ``events_item_cooccur``'s raw counts (frequent items stop dominating
    once normalized by their own reach). -> (item_a, item_b, n_users,
    sim).

    Scale shape: identical shuffles to the co-occurrence op; the
    per-item reach map (df) is ITEM-DOMAIN-BOUNDED and ships in a final
    small keyed map. sqrt of exact integer products, rounded to 6."""
    import pyarrow.compute as pc

    from ..util import bucket_aggregate, bucket_distinct, bucket_map_keyed

    ev = _read(sf_dir, "events", ["user_id", "props"],
               blocks=fanout_blocks(0.5))

    def _extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        out = pa.Table.from_arrays(
            [t.column("user_id").cast(pa.int64()), k],
            names=["user_id", "item"])
        return out.filter(pc.is_valid(out.column("item")))

    ui = bucket_distinct(
        ev.map_batches(_extract, batch_format="pyarrow"),
        ["user_id", "item"])

    df_tbl = bucket_aggregate(ui, ["item"],
                              {"df": ("user_id", "count")}).to_pandas()
    df_map = dict(zip(df_tbl["item"], df_tbl["df"]))

    def _pairs(b: pd.DataFrame) -> pd.DataFrame:
        m = b.merge(b, on="user_id", suffixes=("_a", "_b"))
        m = m[m["item_a"] < m["item_b"]]
        return m[["item_a", "item_b"]].reset_index(drop=True)

    counts = bucket_aggregate(
        bucket_map_keyed(ui, ["user_id"], _pairs),
        ["item_a", "item_b"], {"n_users": ("item_a", "count")})

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n_users"] >= min_n].copy()
        da = b["item_a"].map(df_map).to_numpy(dtype=np.int64)
        db = b["item_b"].map(df_map).to_numpy(dtype=np.int64)
        b["sim"] = np.round(
            b["n_users"].to_numpy() / np.sqrt((da * db).astype(np.float64)),
            6)
        return b.reset_index(drop=True)

    return counts.map_batches(_score, batch_format="pandas")


def events_weekly_active(sf_dir: str):
    """Trailing-7-day active users per day (WAU) -> (day, n_users_7d):
    the windowed COUNT DISTINCT that a rolling sum cannot express
    (distinct is not subtractable out of a sliding frame).

    Scale shape: the standard exact reduction — distinct (user, day)
    pairs first (combiner + one hash-partitioned distinct, events
    collapse to at most users x days rows), then each pair is expanded to
    the 7 window-END days it covers (a BOUNDED x7 flat map on the
    already-thinned pairs, never on raw events), a second distinct kills
    multi-day overlap within a user's window, and a tiny per-day count
    finishes. Every reported day d counts users active in (d-6 .. d]."""
    from ..util import bucket_aggregate, bucket_distinct

    ev = _read(sf_dir, "events", ["ts", "user_id"],
               blocks=fanout_blocks(0.5))

    def _day(t: pa.Table) -> pa.Table:
        day = pa.array((t.column("ts").cast(pa.int64())
                        .to_numpy(zero_copy_only=False)
                        // 86_400_000_000).astype(np.int64))
        out = pa.Table.from_arrays(
            [day, t.column("user_id").cast(pa.int64())],
            names=["day", "user_id"])
        return out.group_by(["day", "user_id"]).aggregate([])

    pairs = bucket_distinct(
        ev.map_batches(_day, batch_format="pyarrow"), ["day", "user_id"])

    def _cover(t: pa.Table) -> pa.Table:
        day = t.column("day").to_numpy(zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        off = np.tile(np.arange(7, dtype=np.int64), len(day))
        return pa.Table.from_arrays(
            [pa.array(np.repeat(day, 7) + off), pa.array(np.repeat(uid, 7))],
            names=["day", "user_id"])

    covered = bucket_distinct(
        pairs.map_batches(_cover, batch_format="pyarrow"),
        ["day", "user_id"])
    return bucket_aggregate(covered, ["day"],
                            {"n_users_7d": ("user_id", "count")})


def source_lang_entropy(sf_dir: str):
    """Per-source language diversity: Shannon entropy of the language mix
    -> (source, n_docs, entropy). The corpus-diversity report of a
    multilingual pipeline (a source whose entropy collapses got
    monolingual — crawler drift); complements the raw counts of
    ``pivot_lang_source`` with the scalar the alerting actually tracks.

    Scale shape: one combiner count shuffle to the |sources| x |langs|
    domain table; entropy computes on the tiny result from exact integer
    counts (scalar libm ln per cell, round 6 — the bit-parity
    convention)."""
    import math

    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["source", "lang"],
                 blocks=fanout_blocks(0.25))
    counts = bucket_aggregate(
        docs, ["source", "lang"], {"n": ("lang", "count")}).to_pandas()

    rows = []
    # lang-sorted term order: run-deterministic float summation
    counts = counts.sort_values(["source", "lang"])
    for src, grp in counts.groupby("source", sort=False):
        n = grp["n"].to_numpy(dtype=np.int64)
        tot = int(n.sum())
        h = -sum((int(c) / tot) * math.log(int(c) / tot) for c in n)
        rows.append((src, tot, round(h, 6)))
    return pd.DataFrame(rows, columns=["source", "n_docs", "entropy"])


def user_journey_report(sf_dir: str, *, gap_minutes: int = 30):
    """Per-user journey capstone — sessionization, purchase attribution
    and activity span FUSED into one keyed pass -> (user_id, n_events,
    n_sessions, n_purchases, n_attributed, span_us). The events-domain
    analogue of ``curate_corpus``: several already-verified operator
    semantics (30-min gap sessions, strict-precedence click attribution)
    composed so the whole report costs ONE user-keyed bucket shuffle —
    running the constituent queries separately would pay that exchange
    four times.

    All per-user work is vectorized over the user's contiguous sorted run
    (gap compare, type masks, searchsorted attribution); outputs are
    exact integers."""
    from ..util import bucket_map_keyed

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"],
               blocks=fanout_blocks(0.5))
    gap_us = gap_minutes * 60 * 1_000_000

    def _report(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = b["user_id"].to_numpy()
        ts = b["ts"].astype("int64").to_numpy()
        et = b["event_type"].to_numpy()
        rows = []
        starts = np.concatenate(
            ([0], np.flatnonzero(uid[1:] != uid[:-1]) + 1, [len(b)]))
        for i in range(len(starts) - 1):
            s, e = starts[i], starts[i + 1]
            t = ts[s:e]
            k = et[s:e]
            n_sessions = 1 + int(((t[1:] - t[:-1]) > gap_us).sum())
            is_p = k == "purchase"
            is_c = k == "click"
            cts = t[is_c]
            pts = t[is_p]
            # attributed = purchases with a strictly earlier click
            n_attr = int((np.searchsorted(cts, pts, side="left") > 0).sum())
            rows.append((int(uid[s]), e - s, n_sessions, int(is_p.sum()),
                        n_attr, int(t[-1] - t[0])))
        return pd.DataFrame(rows, columns=[
            "user_id", "n_events", "n_sessions", "n_purchases",
            "n_attributed", "span_us"])

    return bucket_map_keyed(ev, ["user_id"], _report)


def events_item_cvr(sf_dir: str):
    """Per-item conversion rate: distinct users who viewed item k vs
    distinct users who purchased it -> (item, n_view_users,
    n_purchase_users, cvr). The funnel-per-item metric of any catalog
    pipeline (items whose cvr collapses get investigated).

    Scale shape: extraction + per-batch distinct thinning, one
    hash-partitioned distinct on (event_type, user, item), then two
    item-domain-bounded counts; cvr = purchasers / viewers in float64
    from exact integer counts, round 6. Items never viewed report a
    NULL-free 0-viewer row only if they were purchased (LEFT from the
    purchase side would hide view-only items — FULL semantics via the
    count table union)."""
    import pyarrow.compute as pc

    from ..util import bucket_aggregate, bucket_distinct

    ev = _read(sf_dir, "events", ["user_id", "event_type", "props"],
               blocks=fanout_blocks(0.5))

    def _extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        out = pa.Table.from_arrays(
            [t.column("event_type"), t.column("user_id").cast(pa.int64()), k],
            names=["event_type", "user_id", "item"])
        keep = pc.and_(pc.is_valid(out.column("item")),
                       pc.is_in(out.column("event_type"),
                                value_set=pa.array(["view", "purchase"])))
        return out.filter(keep)

    trip = bucket_distinct(
        ev.map_batches(_extract, batch_format="pyarrow"),
        ["event_type", "user_id", "item"])
    counts = bucket_aggregate(
        trip, ["item", "event_type"], {"n": ("user_id", "count")}
    ).to_pandas()

    wide = counts.pivot(index="item", columns="event_type", values="n")
    wide = wide.reindex(columns=["view", "purchase"]).fillna(0).astype(int)
    nv = wide["view"].to_numpy(dtype=np.int64)
    npu = wide["purchase"].to_numpy(dtype=np.int64)
    cvr = np.where(nv > 0, np.round(npu / np.maximum(nv, 1), 6), 0.0)
    return pd.DataFrame({
        "item": wide.index.to_numpy(dtype=np.int64),
        "n_view_users": nv, "n_purchase_users": npu, "cvr": cvr,
    }).reset_index(drop=True)


def part_top_supplier(sf_dir: str):
    """TPC-H Q2-shaped correlated argmax join: for every part, the
    supplier that shipped it MOST often -> (l_partkey, l_suppkey,
    n_shipments), ties to the lowest suppkey. Unlike the tiny-domain
    argmaxes (vote winners, tfidf top-k), the group domain here is
    corpus-scale (|parts|), so the winner selection must ride the
    shuffle, not the driver.

    Scale shape: one combiner count shuffle to (part, supp) — a hot part
    contributes one row per batch per supplier — then the per-part argmax
    is ALREADY co-located (the count shuffle keys on the pair, so a
    second part-keyed pass co-locates each part's suppliers); vectorized
    sort + drop_duplicates per bucket."""
    from ..util import bucket_aggregate, bucket_map_keyed

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"],
               blocks=fanout_blocks(0.5))
    counts = bucket_aggregate(
        li, ["l_partkey", "l_suppkey"], {"n_shipments": ("l_suppkey", "count")})

    def _winner(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_partkey", "n_shipments", "l_suppkey"],
                          ascending=[True, False, True], kind="mergesort")
        return g.drop_duplicates("l_partkey")[
            ["l_partkey", "l_suppkey", "n_shipments"]]

    return bucket_map_keyed(counts, ["l_partkey"], _winner)


def orders_per_customer_census(sf_dir: str):
    """TPC-H Q13: the distribution of order counts per customer INCLUDING
    customers with zero orders -> (n_orders, n_customers). The zero bucket
    is the point — it needs the LEFT side of an outer join, which a plain
    groupby over orders can never produce.

    Scale shape: orders pre-counted per customer in a combiner shuffle,
    then ONE hash-partitioned left ``bucket_join`` customer -> counts
    (both sides shuffled), nulls -> 0 inside the join bucket fn, and a
    tiny count-of-counts census."""
    from ..util import bucket_aggregate, bucket_join

    cust = _read(sf_dir, "customer", ["c_custkey"], blocks=fanout_blocks(0.5))
    orders = _read(sf_dir, "orders", ["o_custkey"], blocks=fanout_blocks(0.5))

    per_cust = bucket_aggregate(
        orders.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("o_custkey").cast(pa.int64())], names=["c_custkey"]),
            batch_format="pyarrow"),
        ["c_custkey"], {"n_orders": ("c_custkey", "count")})

    def _fill(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_orders"].fillna(0).astype(np.int64)
        return pd.DataFrame({"c_custkey": df["c_custkey"].astype(np.int64),
                             "n_orders": n})

    joined = bucket_join(
        cust.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("c_custkey").cast(pa.int64())], names=["c_custkey"]),
            batch_format="pyarrow"),
        per_cust, key="c_custkey",
        left_cols={}, right_cols={"n_orders": pa.int64()},
        how="left", post=_fill)

    return bucket_aggregate(joined, ["n_orders"],
                            {"n_customers": ("c_custkey", "count")})


def part_type_supplier_census(sf_dir: str):
    """TPC-H Q16-shaped join-then-COUNT-DISTINCT: distinct suppliers that
    shipped each part TYPE -> (p_type, n_suppliers). The attribute lives
    on the part dimension, the supplier on the fact — so the distinct
    must run AFTER a key join, which is what separates this from the
    plain distinct censuses.

    Scale shape: lineitem thins to distinct (part, supp) pairs first
    (combiner + hash-partitioned distinct — the fact table collapses to
    its pair domain before any join), ONE hash-partitioned bucket_join
    against the part dimension attaches p_type, then a second distinct on
    (p_type, supp) and a tiny census."""
    from ..util import bucket_aggregate, bucket_distinct, bucket_join

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"],
               blocks=fanout_blocks(0.5))
    part = _read(sf_dir, "part", ["p_partkey", "p_type"],
                 blocks=fanout_blocks(0.25))

    pairs = bucket_distinct(li, ["l_partkey", "l_suppkey"])

    joined = bucket_join(
        pairs.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("l_partkey").cast(pa.int64()),
                 t.column("l_suppkey").cast(pa.int64())],
                names=["p_partkey", "l_suppkey"]),
            batch_format="pyarrow"),
        part.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("p_partkey").cast(pa.int64()),
                 t.column("p_type")], names=["p_partkey", "p_type"]),
            batch_format="pyarrow"),
        key="p_partkey",
        left_cols={"l_suppkey": pa.int64()},
        right_cols={"p_type": pa.string()})

    ts = bucket_distinct(joined, ["p_type", "l_suppkey"])
    return bucket_aggregate(ts, ["p_type"],
                            {"n_suppliers": ("l_suppkey", "count")})


def orders_segment_salted(sf_dir: str):
    """Order -> customer-segment enrichment through the SALTED
    many-to-one join (``util.bucket_join_salted``) — the hot-key join
    demonstrator: a celebrity customer's orders spread over ``salts``
    reduce buckets instead of forming one straggler, while each customer
    row replicates ``salts`` times (tiny). Output (o_custkey, o_orderkey,
    c_mktsegment) is bit-equal to the unsalted join; the skew handling is
    purely a scheduling property."""
    from ..util import bucket_join_salted

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"],
                   blocks=fanout_blocks(0.5))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"],
                 blocks=fanout_blocks(0.25))

    return bucket_join_salted(
        orders.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("o_custkey").cast(pa.int64()),
                 t.column("o_orderkey").cast(pa.int64())],
                names=["o_custkey", "o_orderkey"]),
            batch_format="pyarrow"),
        cust.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("c_custkey").cast(pa.int64()),
                 t.column("c_mktsegment")],
                names=["o_custkey", "c_mktsegment"]),
            batch_format="pyarrow"),
        key="o_custkey",
        fact_cols={"o_orderkey": pa.int64()},
        dim_cols={"c_mktsegment": pa.string()})


def orders_topn_per_customer(sf_dir: str, *, n: int = 3):
    """Per-key rank window (the ROW_NUMBER() OVER (PARTITION BY ... ORDER
    BY ...) family): for every customer, their top-``n`` orders by
    totalprice with an explicit 1-based rank; ties break to the lowest
    orderkey so the output is deterministic across partitionings.

    Scale shape: combiner-first top-n — each batch keeps at most ``n``
    rows per customer BEFORE the shuffle (a key's global top-n row can
    only be evicted from a batch's top-n by rows that also beat it
    globally, so the per-batch top-n is a superset of the global one),
    then ONE customer-keyed bucket shuffle whose per-bucket finalizer
    re-ranks vectorized (sort + cumcount). Shuffle input is bounded by
    |customers-in-batch| x n per batch regardless of order skew.
    """
    from ..util import bucket_map_keyed

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_totalprice"],
                   blocks=fanout_blocks(0.5))

    def _topn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="mergesort")
        return b.groupby("o_custkey", sort=False).head(n)

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="mergesort")
        g["rn"] = g.groupby("o_custkey", sort=False).cumcount() + 1
        g = g[g["rn"] <= n]
        g["rn"] = g["rn"].astype("int64")
        return g[["o_custkey", "o_orderkey", "o_totalprice", "rn"]]

    return bucket_map_keyed(orders, ["o_custkey"], _rank, pre=_topn)


def doc_pack_census(sf_dir: str, *, seq_len: int = 2048):
    """Packing diagnostics over the continuous packer (`pack_assign`):
    per training sequence, how many documents START in it and how many of
    those cross its right boundary (tok_offset + n_tokens > end). Crossing
    docs are the attention-contamination sites a no-split packer would pad
    away; their count per pack is the standard packing-quality report.

    Scale shape: the packer's own two-pass prefix sum, then ONE
    pack_id-keyed combiner aggregate (per-batch partial counts first, so
    the shuffle moves |packs-per-batch| rows); output is |corpus|/seq_len
    rows — result-sized."""
    from ..util import bucket_aggregate

    packed = pack_assign(sf_dir, seq_len=seq_len)

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        end = (df["pack_id"].to_numpy() + 1) * seq_len
        df["n_cross"] = (
            df["tok_offset"].to_numpy() + df["n_tokens"].to_numpy() > end
        ).astype("int64")
        g = df.groupby("pack_id", sort=False).agg(
            n_docs=("doc_id", "size"), n_cross=("n_cross", "sum")
        ).reset_index()
        g["n_docs"] = g["n_docs"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return bucket_aggregate(
        packed.map_batches(_partial, batch_format="pyarrow"),
        ["pack_id"],
        {"n_docs": ("n_docs", "sum"), "n_cross": ("n_cross", "sum")},
    )


def vocab_growth(sf_dir: str, *, n_ranges: int = 16):
    """Heaps-law vocabulary-growth census — the 'is my corpus still adding
    new tokens' curation diagnostic: docs in doc_id order are cut into
    ``n_ranges`` equal-width id ranges; for each range, how many distinct
    tokens appear there for the FIRST time anywhere in the corpus
    (min-doc_id attribution), plus the cumulative vocabulary size.

    Scale shape: per-batch (token -> min doc_id) combiner (vocab-sized,
    not corpus-sized), ONE token-keyed bucket aggregate for the global
    min, then a range-keyed count whose output is ``n_ranges`` rows; the
    cumulative sum runs on the driver over those result rows. Range width
    comes from parquet row-count metadata — no extra data pass."""
    import pyarrow.compute as pc

    from ..util import bucket_aggregate, parquet_num_rows

    path = os.path.join(sf_dir, "documents.parquet")
    n_rows = max(1, parquet_num_rows(path))
    width = -(-n_rows // n_ranges)

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.25))

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = t.column("doc_id").cast(pa.int64()).take(parent)
        df = pd.DataFrame({
            "token": flat.to_pandas(),
            "doc_id": ids.to_pandas(),
        })
        g = df.groupby("token", sort=False)["doc_id"].min().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    first = bucket_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow"),
        ["token"], {"first_doc": ("doc_id", "min")})

    def _rng(t: pa.Table) -> pa.Table:
        r = pc.divide(t.column("first_doc").cast(pa.int64()), width)
        ones = pa.array(np.ones(t.num_rows, dtype=np.int64))
        return pa.Table.from_arrays([r, ones], names=["rng", "one"])

    per_range = bucket_aggregate(
        first.map_batches(_rng, batch_format="pyarrow"),
        ["rng"], {"n_new_tokens": ("one", "sum")}).to_pandas()
    per_range = per_range.sort_values("rng").reset_index(drop=True)
    per_range["vocab_size"] = per_range["n_new_tokens"].cumsum().astype("int64")
    per_range["n_new_tokens"] = per_range["n_new_tokens"].astype("int64")
    return per_range[["rng", "n_new_tokens", "vocab_size"]]


def doc_ngram_entropy(sf_dir: str, *, ngram: int = 3):
    """Per-document n-gram Shannon entropy over the POSITIONAL trigram
    multiset — the repetition-aware quality signal (low entropy = the doc
    repeats itself; complements `doc_top_bigram_frac`'s single-mode view).
    Docs with fewer than ``ngram`` tokens emit no grams and are excluded,
    matching the SQL explode.

    Scale shape: ZERO shuffles — a doc's grams are batch-local by
    construction, so counts, probabilities and the entropy sum all happen
    inside one vectorized map (lexsort + run-length, no per-doc Python).
    Entropy is rounded to 6 decimals on both engines (summation order
    differs from SQL only at ~1e-16 relative); ``+ 0.0`` folds IEEE -0.0
    (single-gram docs) to +0.0 on both sides."""
    from ..stages.dedup import _gram_doc_rows

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))

    def _ent(t: pa.Table) -> pa.Table:
        g = _gram_doc_rows(t, ngram=ngram)
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        gram = g.column("gram").to_numpy(zero_copy_only=False)
        if len(doc) == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
                 pa.array([], type=pa.float64())],
                names=["doc_id", "n_grams", "entropy"])
        order = np.lexsort((gram, doc))
        d, h = doc[order], gram[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        gidx = np.cumsum(new) - 1
        c = np.bincount(gidx).astype(np.float64)  # count per (doc, gram)
        doc_per_group = d[new]
        new_doc = np.ones(len(doc_per_group), dtype=bool)
        new_doc[1:] = doc_per_group[1:] != doc_per_group[:-1]
        didx = np.cumsum(new_doc) - 1
        n = np.bincount(didx, weights=c)  # grams per doc
        p = c / n[didx]
        ent = np.bincount(didx, weights=-(p * np.log2(p)))
        return pa.Table.from_arrays(
            [pa.array(doc_per_group[new_doc]),
             pa.array(n.astype(np.int64)),
             pa.array(np.round(ent, 6) + 0.0)],
            names=["doc_id", "n_grams", "entropy"])

    return docs.map_batches(_ent, batch_format="pyarrow", batch_size=None)


def emb_quantize_census(sf_dir: str, *, levels: int = 255):
    """Int8-style scale-quantization error census over the embedding
    column — the storage-compression QA report (is 8-bit min/max scaling
    faithful enough per label?): each dimension is quantized to
    ``levels``+1 codes between its GLOBAL min and max, and the census
    reports per-label value counts, mean and max absolute reconstruction
    error.

    Scale shape: pass 1 reduces per-batch (dim, min, max) partials into a
    d-row table (ray.put broadcast); pass 2 quantizes + measures per batch
    and pre-aggregates per label before a label-keyed combiner — the
    corpus crosses the wire as |labels|-sized partials only. Float
    parity: float32 inputs are exact in float64, the code is
    floor(v + 0.5) on both engines (np.round's banker rounding differs
    from SQL round at .5 midpoints), mean rounded to 6, max to 9."""
    from ..util import bucket_aggregate, list_column_matrix

    emb = _read(sf_dir, "embeddings", ["embedding", "label"],
                blocks=fanout_blocks(0.25))

    def _minmax(t: pa.Table) -> pa.Table:
        m = list_column_matrix(t.column("embedding"))
        if m.size == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.float64()),
                 pa.array([], type=pa.float64())], names=["dim", "mn", "mx"])
        return pa.Table.from_arrays(
            [pa.array(np.arange(m.shape[1], dtype=np.int64)),
             pa.array(m.min(axis=0)), pa.array(m.max(axis=0))],
            names=["dim", "mn", "mx"])

    mm = bucket_aggregate(
        emb.map_batches(_minmax, batch_format="pyarrow"),
        ["dim"], {"mn": ("mn", "min"), "mx": ("mx", "max")}).to_pandas()
    mm = mm.sort_values("dim")
    mn = mm["mn"].to_numpy()
    mx = mm["mx"].to_numpy()
    ref = ray.put((mn, mx))

    def _err(t: pa.Table) -> pa.Table:
        m = list_column_matrix(t.column("embedding"))
        lab = t.column("label").cast(pa.int64()).to_numpy(zero_copy_only=False)
        if m.size == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
                 pa.array([], type=pa.float64()), pa.array([], type=pa.float64())],
                names=["label", "n_values", "sum_err", "max_err"])
        lo, hi = ray.get(ref)
        span = hi - lo
        q = np.floor((m - lo) / span * levels + 0.5)
        recon = lo + q / float(levels) * span
        err = np.abs(m - recon)
        df = pd.DataFrame({"label": lab, "sum_err": err.sum(axis=1),
                           "max_err": err.max(axis=1),
                           "n_values": np.full(len(lab), m.shape[1],
                                               dtype=np.int64)})
        g = df.groupby("label", sort=False).agg(
            n_values=("n_values", "sum"), sum_err=("sum_err", "sum"),
            max_err=("max_err", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    tot = bucket_aggregate(
        emb.map_batches(_err, batch_format="pyarrow"),
        ["label"], {"n_values": ("n_values", "sum"),
                    "sum_err": ("sum_err", "sum"),
                    "max_err": ("max_err", "max")}).to_pandas()
    tot["mean_err"] = np.round(tot["sum_err"] / tot["n_values"], 6)
    tot["max_err"] = np.round(tot["max_err"], 9)
    tot["n_values"] = tot["n_values"].astype("int64")
    return tot[["label", "n_values", "mean_err", "max_err"]].sort_values(
        "label").reset_index(drop=True)


def events_value_histogram(sf_dir: str, *, bin_width: float = 10.0):
    """Equi-width value histogram per event type — the monitoring /
    drift-detection census (complements `events_value_psi`'s two-window
    comparison with the full distribution shape): bin = floor(value /
    bin_width), count per (event_type, bin).

    Scale shape: per-batch (type, bin) partial counts (the combiner), ONE
    tiny keyed aggregate; output is |types| x |bins| — result-sized.
    floor(v / w) is a single float64 op on both engines, so bins agree
    exactly."""
    from ..util import bucket_aggregate

    ev = _read(sf_dir, "events", ["event_type", "value"],
               blocks=fanout_blocks(0.5))

    def _partial(t: pa.Table) -> pa.Table:
        bins = np.floor(t.column("value").to_numpy(zero_copy_only=False)
                        / bin_width).astype(np.int64)
        g = pa.table({"event_type": t.column("event_type"),
                      "bin": pa.array(bins)}) \
            .group_by(["event_type", "bin"], use_threads=False) \
            .aggregate([([], "count_all")])
        return g.select(["event_type", "bin", "count_all"]).rename_columns(
            ["event_type", "bin", "n_events"])

    return bucket_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow"),
        ["event_type", "bin"], {"n_events": ("n_events", "sum")})


def split_contamination(sf_dir: str, *, n: int = 8):
    """Cross-split leakage audit — the governance check run AFTER
    `split_assign`: train-split documents sharing any verbatim token
    n-gram with the TEST split, with contaminated window counts per doc.
    (`split_leakfree` prevents near-dup leakage by construction; this op
    MEASURES residual verbatim leakage of any split, e.g. when the split
    came from an upstream system.)

    Same scale shape as `contamination_ngram` (test-side grams reduce +
    broadcast once, train side scanned shuffle-free); the side filters
    call `split_b1` with `split_assign`'s own thresholds, so the two ops
    cannot drift."""
    return contamination_ngram(
        sf_dir, n=n,
        bench_mask=lambda ids: split_b1(ids) >= SPLIT_VAL_LT,   # test
        corpus_mask=lambda ids: split_b1(ids) < SPLIT_TRAIN_LT,  # train
    )


def lang_token_fertility(sf_dir: str):
    """Tokenizer fertility per language — the token-budget planning report
    (how many BPE-ish tokens one whitespace token costs in each language;
    high fertility = the tokenizer fragments that language and its docs
    eat budget): per lang, doc count, both token totals and their ratio.

    Scale shape: per-batch per-lang partial sums (both counters come from
    vectorized RE2 / Arrow kernels), ONE |langs|-sized combiner aggregate;
    the ratio is computed on result rows. Integer totals are exact, the
    division is one float64 op on both engines, rounded to 6."""
    import pyarrow.compute as pc

    from ..functions.textstats import BPE_ISH_PATTERN
    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["lang", "text"],
                 blocks=fanout_blocks(0.25))

    def _partial(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ws = pc.list_value_length(pc.split_pattern(texts, " ")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        bpe = pc.count_substring_regex(texts, BPE_ISH_PATTERN).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"lang": t.column("lang").to_numpy(
            zero_copy_only=False), "ws": ws, "bpe": bpe})
        g = df.groupby("lang", sort=False).agg(
            n_docs=("ws", "size"), n_tokens_ws=("ws", "sum"),
            n_tokens_bpe=("bpe", "sum")).reset_index()
        g["n_docs"] = g["n_docs"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = bucket_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow"),
        ["lang"], {"n_docs": ("n_docs", "sum"),
                   "n_tokens_ws": ("n_tokens_ws", "sum"),
                   "n_tokens_bpe": ("n_tokens_bpe", "sum")}).to_pandas()
    agg["fertility"] = np.round(
        agg["n_tokens_bpe"].to_numpy().astype(np.float64)
        / agg["n_tokens_ws"].to_numpy().astype(np.float64), 6)
    return agg.sort_values("lang").reset_index(drop=True)


def dedup_rate_by_source(sf_dir: str):
    """Near-dup drop rate broken down by provenance source — the curation
    diagnostic tying dedup losses back to where the data came from (a
    source with an outsized drop rate is a scraper re-crawling itself):
    (source, n_docs, n_dropped, drop_rate).

    Scale shape: components are edge-bounded; the non-keeper ids LEFT-join
    the (doc_id, source) projection in one hash-partitioned bucket join
    with the per-source census fused into the join stage via ``post``
    (partial counts), then ONE source-sized final aggregate."""
    import pyarrow.compute as pc

    from ..stages.dedup import dedup_components, near_dup_pairs_minhash
    from ..util import bucket_aggregate, bucket_join

    docs = _read(sf_dir, "documents", ["doc_id", "source"],
                 blocks=fanout_blocks(0.25))
    comp = dedup_components(near_dup_pairs_minhash(
        _read(sf_dir, "documents", ["doc_id", "text"],
              blocks=fanout_blocks(0.5))))
    def _drop_ids(t: pa.Table) -> pa.Table:
        f = t.filter(pc.not_equal(t.column("doc_id"),
                                  t.column("component_id")))
        return pa.Table.from_arrays(
            [f.column("doc_id").cast(pa.int64()),
             pa.array(np.ones(f.num_rows, dtype=np.int64))],
            names=["doc_id", "is_drop"])

    drop = comp.map_batches(_drop_ids, batch_format="pyarrow")

    def _census(m: pd.DataFrame) -> pd.DataFrame:
        m["is_drop"] = m["is_drop"].fillna(0).astype("int64")
        g = m.groupby("source", sort=False).agg(
            n_docs=("doc_id", "size"), n_dropped=("is_drop", "sum")
        ).reset_index()
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    joined = bucket_join(
        docs, drop, key="doc_id",
        left_cols={"source": pa.string()},
        right_cols={"is_drop": pa.int64()},
        how="left", post=_census)
    out = bucket_aggregate(
        joined, ["source"], {"n_docs": ("n_docs", "sum"),
                             "n_dropped": ("n_dropped", "sum")}).to_pandas()
    out["drop_rate"] = np.round(
        out["n_dropped"].to_numpy().astype(np.float64)
        / out["n_docs"].to_numpy().astype(np.float64), 6)
    return out.sort_values("source").reset_index(drop=True)


def events_stickiness(sf_dir: str):
    """DAU/WAU stickiness per day — the product-engagement ratio (what
    fraction of the trailing week's actives showed up today): joins the
    exact daily-active and trailing-7-day-active censuses on day.

    Scale shape: both inputs are the already-thinned distinct (day, user)
    shuffles; their outputs are DATE-bounded (one row per day), so the
    final join + ratio run on result rows."""
    dau = events_daily_active(sf_dir).to_pandas()
    wau = events_weekly_active(sf_dir).to_pandas()
    out = dau.merge(wau, on="day", how="inner")
    out["stickiness"] = np.round(
        out["n_users"].to_numpy().astype(np.float64)
        / out["n_users_7d"].to_numpy().astype(np.float64), 6)
    out["day"] = out["day"].astype("int64")
    return out[["day", "n_users", "n_users_7d", "stickiness"]].sort_values(
        "day").reset_index(drop=True)


def orders_key_skew(sf_dir: str):
    """Key-skew census over the orders fact table — the 'is my shuffle
    about to die' diagnostic a partitioned engine runs before keying a
    join on a column: per log2 magnitude bucket of per-customer order
    counts, how many keys and how many rows live there (a heavy tail at
    high buckets says salt the key; see util.bucket_join_salted).

    Scale shape: ONE custkey combiner count (the same shuffle the join
    would pay), then a log2-bucket map and a tiny second aggregate;
    output is ~log2(max count) rows. floor(log2(c)) is exact for integer
    counts < 2^53 on both engines."""
    from ..util import bucket_aggregate

    orders = _read(sf_dir, "orders", ["o_custkey"],
                   blocks=fanout_blocks(0.25))

    def _one(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("o_custkey").cast(pa.int64()),
             pa.array(np.ones(t.num_rows, dtype=np.int64))],
            names=["o_custkey", "one"])

    per_key = bucket_aggregate(
        orders.map_batches(_one, batch_format="pyarrow"),
        ["o_custkey"], {"c": ("one", "sum")})

    def _bucket(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(np.log2(c)).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(b), pa.array(np.ones(len(b), dtype=np.int64)),
             pa.array(c.astype(np.int64))],
            names=["count_bucket", "one", "c"])

    out = bucket_aggregate(
        per_key.map_batches(_bucket, batch_format="pyarrow"),
        ["count_bucket"],
        {"n_keys": ("one", "sum"), "n_rows": ("c", "sum")}).to_pandas()
    return out.sort_values("count_bucket").reset_index(drop=True)


def events_user_entropy(sf_dir: str):
    """Per-user event-type Shannon entropy — the behavioral-diversity
    feature (0 = the user does one thing; high = spread across all event
    types): (user_id, n_events, entropy), entropy over the user's
    event-type distribution, rounded to 6.

    Scale shape: per-batch (user, type) partial counts collapse in ONE
    keyed combiner aggregate (|users| x |types| rows — types is a tiny
    domain), then a user-keyed bucket pass computes the entropy
    vectorized per segment. ``+ 0.0`` folds IEEE -0.0 (single-type
    users)."""
    from ..util import bucket_aggregate, bucket_map_keyed

    ev = _read(sf_dir, "events", ["user_id", "event_type"],
               blocks=fanout_blocks(0.5))

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"], use_threads=False) \
            .aggregate([([], "count_all")])
        return g.select(["user_id", "event_type", "count_all"]) \
            .rename_columns(["user_id", "event_type", "c"])

    counts = bucket_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow"),
        ["user_id", "event_type"], {"c": ("c", "sum")})

    def _entropy(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        c = g["c"].to_numpy().astype(np.float64)
        new = np.ones(len(uid), dtype=bool)
        new[1:] = uid[1:] != uid[:-1]
        gi = np.cumsum(new) - 1
        n = np.bincount(gi, weights=c)
        p = c / n[gi]
        ent = np.bincount(gi, weights=-(p * np.log2(p)))
        return pd.DataFrame({
            "user_id": uid[new],
            "n_events": n.astype(np.int64),
            "entropy": np.round(ent, 6) + 0.0,
        })

    return bucket_map_keyed(counts, ["user_id"], _entropy)


def token_zipf_slope(sf_dir: str, *, k: int = 100):
    """Zipf-law slope of the corpus token-frequency distribution — the
    'does this read like natural language' diagnostic (natural text fits
    ln(count) ~ -1 * ln(rank); synthetic or templated corpora drift):
    least-squares slope of ln(count) on ln(rank) over the top-``k``
    tokens. -> one row (k, zipf_slope).

    Scale shape: the same combiner token count as `token_freq_top20`
    (vocab-sized shuffle), one sort+limit to the k head rows, then the
    regression runs on k result rows with the explicit centered-moments
    formula the oracle also writes (no library regression on either
    side)."""
    head = token_freq_topk(sf_dir, k=k).to_pandas()
    n = head["n"].to_numpy().astype(np.float64)
    x = np.log(np.arange(1, len(n) + 1, dtype=np.float64))
    y = np.log(n)
    xb, yb = x.mean(), y.mean()
    slope = float(((x - xb) * (y - yb)).sum() / ((x - xb) ** 2).sum())
    return pd.DataFrame({"k": pd.array([len(n)], dtype="int64"),
                         "zipf_slope": [round(slope, 6)]})


def events_user_lifespan(sf_dir: str):
    """Per-user lifecycle summary — first/last event time, span in days,
    distinct active days, and activity density (active days / span days):
    the churn-feature block every behavioral pipeline derives first.

    Scale shape: per-batch partials thin to distinct (user, day) plus
    min/max ts per user BEFORE the one user-keyed combiner aggregate;
    density arithmetic is a map over the user-bounded result."""
    from ..util import bucket_aggregate

    ev = _read(sf_dir, "events", ["user_id", "ts"], blocks=fanout_blocks(0.5))
    day_us = 86_400_000_000

    def _partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": uid, "ts": ts, "day": ts // day_us})
        # per-batch distinct days can overlap across batches — ship the
        # (user, day) pairs with ts extrema, not counts
        g = df.groupby(["user_id", "day"], sort=False).agg(
            first_ts=("ts", "min"), last_ts=("ts", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    pairs = ev.map_batches(_partial, batch_format="pyarrow")
    agg = bucket_aggregate(
        pairs, ["user_id", "day"],
        {"first_ts": ("first_ts", "min"), "last_ts": ("last_ts", "max")})
    per_user = bucket_aggregate(
        agg, ["user_id"],
        {"first_ts": ("first_ts", "min"), "last_ts": ("last_ts", "max"),
         "n_active_days": ("day", "count")}).to_pandas()
    span_days = (per_user["last_ts"].to_numpy()
                 - per_user["first_ts"].to_numpy()) // day_us + 1
    per_user["span_days"] = span_days.astype("int64")
    per_user["density"] = np.round(
        per_user["n_active_days"].to_numpy().astype(np.float64)
        / span_days.astype(np.float64), 6)
    per_user["n_active_days"] = per_user["n_active_days"].astype("int64")
    return per_user[["user_id", "first_ts", "last_ts", "span_days",
                     "n_active_days", "density"]].sort_values(
        "user_id").reset_index(drop=True)


def split_balance_psi(sf_dir: str, *, bucket_width: float = 100.0):
    """Split-balance audit — the governance companion to
    `split_contamination`: PSI of the document-LENGTH distribution
    between the train and test splits. A hash split should be
    distribution-neutral; sum(psi_term) > 0.2 says the split (e.g. one
    inherited from an upstream system) skewed a covariate.
    -> (bucket, n_train, n_test, psi_term), bucket = floor(n_chars /
    ``bucket_width``).

    Scale shape: one combiner count to the 2 x |buckets| table; PSI terms
    on the tiny result (same Laplace smoothing and scalar-libm ln as
    `events_value_psi`); the split rule is `split_b1` with
    `split_assign`'s thresholds."""
    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"],
                 blocks=fanout_blocks(0.25))

    def _bucketize(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        nch = t.column("n_chars").cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        b1 = split_b1(ids)
        keep = (b1 < SPLIT_TRAIN_LT) | (b1 >= SPLIT_VAL_LT)
        side = (b1[keep] >= SPLIT_VAL_LT).astype(np.int8)  # 1 = test
        bucket = np.floor(nch[keep] / bucket_width).astype(np.int64)
        return pa.Table.from_arrays([pa.array(bucket), pa.array(side)],
                                    names=["bucket", "side"])

    counts = bucket_aggregate(
        docs.map_batches(_bucketize, batch_format="pyarrow"),
        ["bucket", "side"], {"n": ("side", "count")}).to_pandas()

    wide = counts.pivot(index="bucket", columns="side", values="n").fillna(0)
    wide = wide.reindex(columns=[0, 1], fill_value=0).sort_index()
    n_tr = wide[0].to_numpy(dtype=np.int64)
    n_te = wide[1].to_numpy(dtype=np.int64)
    tot_tr, tot_te = int(n_tr.sum()), int(n_te.sum())
    k = len(wide)
    p = (n_tr + 1.0) / (tot_tr + k)
    q = (n_te + 1.0) / (tot_te + k)
    import math

    psi = np.round(np.array([(pi - qi) * math.log(pi / qi)
                             for pi, qi in zip(p, q)]), 6)
    return pd.DataFrame({
        "bucket": wide.index.to_numpy(dtype=np.int64),
        "n_train": n_tr, "n_test": n_te, "psi_term": psi})


def orders_interarrival(sf_dir: str):
    """Per-customer reorder cadence — mean gap in days between consecutive
    orders (the classic CRM repurchase feature): customers with >= 2
    orders only; order sequence by (o_orderdate, o_orderkey) for a
    deterministic tie-break. -> (o_custkey, n_orders, mean_gap_days).

    Scale shape: ONE customer-keyed bucket shuffle; gaps are a vectorized
    diff over each co-located per-customer segment (the sessionize
    shape). Gap arithmetic is integer microseconds divided once at the
    end; mean rounded to 6."""
    from ..util import bucket_map_keyed

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_orderdate"],
                   blocks=fanout_blocks(0.5))
    day_us = 86_400_000_000.0

    def _gaps(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="mergesort")
        cust = b["o_custkey"].to_numpy()
        ts = b["o_orderdate"].to_numpy().astype("datetime64[us]").astype(
            np.int64)
        new = np.ones(len(cust), dtype=bool)
        new[1:] = cust[1:] != cust[:-1]
        gi = np.cumsum(new) - 1
        n = np.bincount(gi)
        gap = np.diff(ts)
        same = ~new[1:]  # gap between consecutive rows of the SAME cust
        sums = np.bincount(gi[1:][same], weights=gap[same].astype(
            np.float64), minlength=len(n))
        keep = n >= 2
        mean_days = np.round(sums[keep] / (n[keep] - 1) / day_us, 6)
        return pd.DataFrame({
            "o_custkey": cust[new][keep],
            "n_orders": n[keep].astype(np.int64),
            "mean_gap_days": mean_days,
        })

    return bucket_map_keyed(orders, ["o_custkey"], _gaps)


def events_bounce_rate(sf_dir: str, *, gap_minutes: int = 30):
    """Per-day bounce rate — the fraction of sessions (30-minute gap
    rule, same as `events_sessionize`) holding exactly ONE event, keyed
    by the session's start day: (day, n_sessions, n_bounces, bounce_rate).
    The engagement-quality headline of a product-analytics pipeline.

    Scale shape: the sessionizer's ONE user-keyed shuffle emits per-batch
    (day, n_sessions, n_bounces) partials instead of per-session rows, so
    the second aggregate is date-bounded."""
    from ..util import bucket_aggregate, bucket_map_keyed

    ev = _read(sf_dir, "events", ["user_id", "ts"], blocks=fanout_blocks(0.5))
    gap = np.timedelta64(gap_minutes * 60, "s")
    day_us = 86_400_000_000

    def _sessions(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts"], kind="mergesort")
        ts = b["ts"].to_numpy()
        uid = b["user_id"].to_numpy()
        new = np.empty(len(b), dtype=bool)
        new[0] = True
        new[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap)
        sid = np.cumsum(new) - 1
        n = np.bincount(sid)
        start_day = ts[new].astype("datetime64[us]").astype(
            np.int64) // day_us
        g = pd.DataFrame({"day": start_day,
                          "one": np.ones(len(n), dtype=np.int64),
                          "bounce": (n == 1).astype(np.int64)})
        out = g.groupby("day", sort=False).agg(
            n_sessions=("one", "sum"), n_bounces=("bounce", "sum")
        ).reset_index()
        return out

    daily = bucket_aggregate(
        bucket_map_keyed(ev, ["user_id"], _sessions),
        ["day"], {"n_sessions": ("n_sessions", "sum"),
                  "n_bounces": ("n_bounces", "sum")}).to_pandas()
    daily["bounce_rate"] = np.round(
        daily["n_bounces"].to_numpy().astype(np.float64)
        / daily["n_sessions"].to_numpy().astype(np.float64), 6)
    return daily.sort_values("day").reset_index(drop=True)


def customer_rfm(sf_dir: str):
    """Customer RFM scoring — the classic segmentation feature block:
    per customer, recency (days since last order, anchored at the global
    max order date), frequency (order count), monetary (total spend), and
    quintile scores 1-5 per dimension. Scores use quantile_disc
    thresholds (the 'sorted element at ceil(q*n)-1' convention of
    `doc_len_quantiles`) with score = 1 + number of thresholds STRICTLY
    below the value — ties fall to the lower bucket deterministically on
    both engines. Monetary is thresholded on floor(m/100) buckets so its
    domain stays bounded (the counting-sort quantile requirement);
    recency and frequency are naturally small-domain ints. NOTE the
    recency score follows the same higher-value-higher-score rule, so
    r_score 5 = longest inactive.

    Scale shape: ONE customer-keyed combiner aggregate, three
    domain-sized histogram aggregates for the thresholds (driver reads
    |distinct values| rows, bounded), then a shuffle-free score map."""
    import math

    from ..util import bucket_aggregate

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"],
                   blocks=fanout_blocks(0.5))
    day_us = 86_400_000_000

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey", use_threads=False).aggregate(
            [("o_orderdate", "max"), ([], "count_all"),
             ("o_totalprice", "sum")])
        return g.select(["o_custkey", "o_orderdate_max", "count_all",
                         "o_totalprice_sum"]).rename_columns(
            ["o_custkey", "last_ts", "f", "m"])

    cust = bucket_aggregate(
        orders.map_batches(_partial, batch_format="pyarrow"),
        ["o_custkey"],
        {"last_ts": ("last_ts", "max"), "f": ("f", "sum"),
         "m": ("m", "sum")}).materialize()

    import pyarrow.compute as pc

    def _bmax(t: pa.Table) -> pa.Table:
        # per-batch partial max so only ONE int per block reaches the
        # driver (iter_batches here would stream the whole customer table)
        if t.num_rows == 0:
            return pa.Table.from_arrays([pa.array([], type=pa.int64())],
                                        names=["mx"])
        v = pc.max(t.column("last_ts").cast(pa.timestamp("us"))
                   .cast(pa.int64())).as_py()
        return pa.Table.from_arrays([pa.array([v], type=pa.int64())],
                                    names=["mx"])

    anchor = int(cust.map_batches(
        _bmax, batch_format="pyarrow").to_pandas()["mx"].max())

    def _dims(b: pd.DataFrame) -> pd.DataFrame:
        last = b["last_ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame({
            "o_custkey": b["o_custkey"].astype("int64"),
            "r": (anchor - last) // day_us,
            "f": b["f"].astype("int64"),
            "mb": np.floor(b["m"].to_numpy() / 100.0).astype("int64"),
            "monetary": np.round(b["m"].to_numpy(), 2),
        })

    dims = cust.map_batches(_dims, batch_format="pandas").materialize()

    def _thresholds(col: str) -> np.ndarray:
        hist = bucket_aggregate(
            dims, [col], {"n": (col, "count")}).to_pandas()
        hist = hist.sort_values(col)
        vals = hist[col].to_numpy()
        cum = np.cumsum(hist["n"].to_numpy())
        n = int(cum[-1])
        return np.array([
            vals[np.searchsorted(cum, max(0, math.ceil(q * n) - 1) + 1)]
            for q in (0.2, 0.4, 0.6, 0.8)], dtype=np.float64)

    tr, tf, tm = (_thresholds(c) for c in ("r", "f", "mb"))

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        def s(v, t):
            return (1 + (v[:, None] > t[None, :]).sum(axis=1)).astype(
                "int64")

        out = b[["o_custkey", "monetary"]].copy()
        out["recency_days"] = b["r"].astype("int64")
        out["frequency"] = b["f"].astype("int64")
        out["r_score"] = s(b["r"].to_numpy(np.float64), tr)
        out["f_score"] = s(b["f"].to_numpy(np.float64), tf)
        out["m_score"] = s(b["mb"].to_numpy(np.float64), tm)
        return out[["o_custkey", "recency_days", "frequency", "monetary",
                    "r_score", "f_score", "m_score"]]

    return dims.map_batches(_score, batch_format="pandas")


def dedup_jaccard_histogram(sf_dir: str):
    """Similarity histogram of verified near-dup pairs — the
    threshold-tuning diagnostic (where does the pair mass sit relative to
    the 0.8 dedup cutoff?): exact-Jaccard pairs at >= 0.5 from the
    DETERMINISTIC rare-shingle candidate path, bucketed at 0.05
    resolution. -> (bucket, n_pairs), bucket = floor(jaccard * 20).

    Scale shape: the ngram near-dup operator at the lower threshold (its
    PPJoin prune and candidate bounds hold at any t), then ONE tiny
    combiner count over the pair-bounded output."""
    from ..stages.dedup import near_dup_pairs_ngram
    from ..util import bucket_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))
    pairs = near_dup_pairs_ngram(docs, threshold=0.5)

    def _bucket(t: pa.Table) -> pa.Table:
        j = t.column("jaccard").to_numpy(zero_copy_only=False)
        b = np.floor(j * 20).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(b), pa.array(np.ones(len(b), dtype=np.int64))],
            names=["bucket", "one"])

    return bucket_aggregate(
        pairs.map_batches(_bucket, batch_format="pyarrow"),
        ["bucket"], {"n_pairs": ("one", "sum")})
