"""Randomized differential tests for the round-2 late additions:

- the interval-join difference-array bucket kernel (orders_ship_window)
  vs a quadratic reference, including the order-replica dedup property
  (several day buckets hash into one group);
- the counting-sort order statistic (doc_len_quantiles) vs DuckDB
  quantile_disc on the same values;
- the per-batch TF-IDF top-k kernel (doc_tfidf_topk) vs a pandas
  reference.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

DAY_US = 86_400_000_000


def _diffarray_join(starts, okeys, ts, vals, win_us):
    """The orders_ship_window per-bucket kernel, verbatim shape."""
    order_idx = np.argsort(starts, kind="stable")
    starts = starts[order_idx]
    okeys = okeys[order_idx]
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
    return pd.DataFrame({"o_orderkey": okeys[keep], "n": cnt[keep],
                         "sum_value": sums[keep]})


@given(st.integers(0, 2**31))
@settings(max_examples=25, deadline=None)
def test_interval_join_kernel_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n_it, n_od = 60, 20
    win_us = 3 * DAY_US
    ts = rng.integers(0, 10 * DAY_US, n_it).astype(np.int64)
    vals = np.round(rng.uniform(0, 50, n_it), 2)
    starts = rng.integers(0, 10 * DAY_US, n_od).astype(np.int64)
    okeys = np.arange(n_od, dtype=np.int64)

    got = (_diffarray_join(starts, okeys, ts, vals, win_us)
           .sort_values("o_orderkey").reset_index(drop=True))

    rows = []
    for k, s in zip(okeys, starts):
        hit = (ts >= s) & (ts < s + win_us)
        if hit.any():
            rows.append((k, int(hit.sum()), float(vals[hit].sum())))
    want = (pd.DataFrame(rows, columns=["o_orderkey", "n", "sum_value"])
            .sort_values("o_orderkey").reset_index(drop=True))
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert np.allclose(got["sum_value"], want["sum_value"], atol=1e-9)


@given(st.integers(0, 2**31))
@settings(max_examples=25, deadline=None)
def test_interval_join_replica_dedup_is_lossless(seed):
    """Replicating each order to every day its window overlaps, hashing
    days into ONE group, then deduping replicas by key gives the same
    result as the unreplicated kernel — the exact property the hash-bucket
    collision in orders_ship_window relies on."""
    rng = np.random.default_rng(seed)
    win_us = 3 * DAY_US
    starts = rng.integers(0, 6 * DAY_US, 12).astype(np.int64)
    okeys = np.arange(12, dtype=np.int64)
    ts = rng.integers(0, 6 * DAY_US, 40).astype(np.int64)
    vals = np.ones(40)

    first = starts // DAY_US
    last = (starts + win_us - 1) // DAY_US
    n_days = (last - first + 1).astype(np.int64)
    rep = np.repeat(np.arange(len(starts)), n_days)
    od = pd.DataFrame({"o_orderkey": okeys[rep], "start": starts[rep]})
    ded = od.drop_duplicates(subset=["o_orderkey"])

    a = _diffarray_join(ded["start"].to_numpy(), ded["o_orderkey"].to_numpy(),
                        ts, vals, win_us)
    b = _diffarray_join(starts, okeys, ts, vals, win_us)
    pd.testing.assert_frame_equal(
        a.sort_values("o_orderkey").reset_index(drop=True),
        b.sort_values("o_orderkey").reset_index(drop=True))


@given(st.lists(st.integers(1, 500), min_size=1, max_size=300))
@settings(max_examples=50, deadline=None)
def test_histogram_order_statistic_matches_duckdb(values):
    """ceil(q*n)-1 read off cumulative histogram counts == quantile_disc."""
    import duckdb

    vals, cnts = np.unique(np.array(values, dtype=np.int64),
                           return_counts=True)
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    got = {}
    for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        kth = max(0, math.ceil(q * n) - 1)
        got[name] = int(vals[np.searchsorted(cum, kth + 1)])
    want = duckdb.sql(
        "SELECT quantile_disc(x, 0.5), quantile_disc(x, 0.9),"
        f" quantile_disc(x, 0.99) FROM (SELECT unnest({list(values)}) x)"
    ).fetchone()
    assert (got["p50"], got["p90"], got["p99"]) == want


@given(st.integers(0, 2**31))
@settings(max_examples=20, deadline=None)
def test_tfidf_topk_kernel_matches_pandas(seed):
    """The lexsort top-k grouping in doc_tfidf_topk equals a pandas
    groupby-rank reference (score desc, token asc, k per doc)."""
    rng = np.random.default_rng(seed)
    k = 3
    n_docs, vocab = 8, list("abcdefghij")
    rows = []
    for d in range(n_docs):
        toks = rng.choice(vocab, size=rng.integers(1, 15))
        for t in toks:
            rows.append((d, t))
    df = pd.DataFrame(rows, columns=["doc", "token"])
    tf = df.groupby(["doc", "token"]).size().rename("tf").reset_index()
    dfreq = df.drop_duplicates().groupby("token").size().rename("df")
    tf["score"] = [
        t * math.log(n_docs / dfreq[tok])
        for t, tok in zip(tf["tf"], tf["token"])
    ]

    doc_of = tf["doc"].to_numpy()
    score = tf["score"].to_numpy()
    tok = tf["token"].to_numpy()
    order = np.lexsort((tok, -score, doc_of))
    d = doc_of[order]
    starts = np.concatenate(([0], np.flatnonzero(d[1:] != d[:-1]) + 1))
    sizes = np.diff(np.concatenate((starts, [len(d)])))
    rank = np.arange(len(d)) - np.repeat(starts, sizes)
    keep = order[rank < k]
    got = tf.iloc[keep].sort_values(["doc", "token"]).reset_index(drop=True)

    want = (tf.sort_values(["doc", "score", "token"],
                           ascending=[True, False, True])
            .groupby("doc").head(k)
            .sort_values(["doc", "token"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_contamination_gram_windows_stay_inside_docs():
    """The sliding-window gram builder must never emit a window spanning
    two documents; counts must match a per-doc python reference."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = 3
    texts = ["a b c d", "c d a", "x", "a b c"]
    toks = pc.split_pattern(pa.array(texts), " ")
    flat = pc.list_flatten(toks)
    L = len(flat)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    w = L - n + 1
    grams = pc.binary_join_element_wise(
        *[flat.slice(j, w) for j in range(n)], " ")
    valid = doc_idx[:w] == doc_idx[n - 1:]
    got = list(zip(doc_idx[:w][valid].tolist(),
                   grams.filter(pa.array(valid)).to_pylist()))

    want = []
    for d, text in enumerate(texts):
        ts = text.split(" ")
        for i in range(max(0, len(ts) - n + 1)):
            want.append((d, " ".join(ts[i:i + n])))
    assert got == want


def test_profile_table_numeric_text_inference(ray_session, tmp_path):
    """profile_table over a synthetic table: a string column whose non-null
    values all parse numerically is 'numeric_text'; mixed stays 'text';
    nulls are excluded from both distinct counts and the parse fraction."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import profile_table

    t = pa.table({
        "idcol": pa.array([1, 2, 3, 4], type=pa.int64()),
        "numtext": pa.array(["1.5", "2e3", None, "-7"]),
        "mixed": pa.array(["1", "x", "2", None]),
        "score": pa.array([0.5, 0.5, 1.0, None], type=pa.float64()),
    })
    pq.write_table(t, tmp_path / "synth.parquet")

    out = profile_table(str(tmp_path), "synth")
    got = out.set_index("col_name")
    assert got.loc["numtext", "inferred_type"] == "numeric_text"
    assert got.loc["mixed", "inferred_type"] == "text"
    assert got.loc["idcol", "inferred_type"] == "int"
    assert got.loc["score", "inferred_type"] == "float"
    assert got.loc["numtext", "n_null"] == 1
    assert got.loc["numtext", "n_distinct"] == 3
    assert got.loc["score", "n_distinct"] == 2
    assert (got["n_rows"] == 4).all()


def test_events_funnel_strict_ordering(ray_session, tmp_path):
    """A purchase BEFORE the user's first qualifying click must not count;
    drop-off at each step is reflected in the census."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import events_funnel

    us = 1_000_000
    rows = [
        # user 1: view -> click -> purchase (fully converts)
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        # user 2: purchase before click -> stops at click
        (2, 1, "view"), (2, 2, "purchase"), (2, 3, "click"),
        # user 3: click before view -> stops at view
        (3, 2, "click"), (3, 3, "view"),
        # user 4: never views -> not even step 1
        (4, 1, "click"), (4, 2, "purchase"),
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] * us for r in rows], type=pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array([""] * len(rows)),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    out = events_funnel(str(tmp_path)).to_pandas().sort_values("step_idx")
    assert out["n_users"].tolist() == [3, 2, 1]


def test_doc_chunk_kernel_edges(ray_session, tmp_path):
    """Chunk boundaries: doc shorter than the window emits one short
    chunk; an exact window-multiple doc still emits the tail-start chunk
    (starts exist while k*stride < n); empty text emits one empty chunk
    (split('') == ['']); every chunk's text round-trips to the token
    slice of the source."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import doc_chunk

    rng = np.random.default_rng(7)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    texts = ["", "one", " ".join(rng.choice(vocab, 32)),  # n == window
             " ".join(rng.choice(vocab, 33)),
             " ".join(rng.choice(vocab, 97))]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    out = doc_chunk(str(tmp_path)).to_pandas().sort_values(
        ["doc_id", "chunk_idx"]).reset_index(drop=True)

    per_doc = out.groupby("doc_id").size()
    # n tokens: 1, 1, 32, 33, 97 -> chunks: 1, 1, 2, 2, 5 (stride 24)
    assert per_doc.tolist() == [1, 1, 2, 2, 5]
    for _, r in out.iterrows():
        toks = texts[r["doc_id"]].split(" ")
        lo = r["start_tok"]
        sl = toks[lo:lo + 32]
        assert r["n_tokens"] == len(sl)
        assert r["chunk_text"] == " ".join(sl)
    # overlapping region of consecutive chunks agrees token-for-token
    d4 = out[out["doc_id"] == 4].reset_index(drop=True)
    for i in range(len(d4) - 1):
        a = d4.loc[i, "chunk_text"].split(" ")
        b = d4.loc[i + 1, "chunk_text"].split(" ")
        assert a[24:] == b[:len(a) - 24]


def test_pivot_lang_source_counts(ray_session, tmp_path):
    """Pivot row sums equal per-source doc counts and missing (source,
    lang) cells are zero-filled; a lang outside the pinned domain raises."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from tabular_data_semantics_py_ray.pipelines.relational import (
        pivot_lang_source)

    t = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "source": pa.array(["s1", "s1", "s1", "s2", "s2", "s3"]),
        "lang": pa.array(["en", "en", "fr", "de", "zh", "es"]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    out = pivot_lang_source(str(tmp_path)).set_index("source")
    assert out.loc["s1", ["n_en", "n_fr", "n_de"]].tolist() == [2, 1, 0]
    assert out["n_total"].tolist() == [3, 2, 1]
    assert (out[["n_de", "n_en", "n_es", "n_fr", "n_zh"]].sum(axis=1)
            == out["n_total"]).all()

    bad = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "source": pa.array(["s1"]),
        "lang": pa.array(["xx"]),
    })
    pq.write_table(bad, tmp_path / "documents.parquet")
    with pytest.raises(ValueError, match="pivot domain"):
        pivot_lang_source(str(tmp_path))


def test_events_rolling_7d_window_edges(ray_session, tmp_path):
    """Trailing 7-row frame: partial windows at the head average over
    fewer rows, full windows drop the 8th-oldest day, and types never
    bleed into each other's frames."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import (
        events_rolling_7d)

    # type A: days 0..9 with count = day+1 (one event on day d repeated);
    # type B: single day to prove partition isolation
    rows_ts, rows_type = [], []
    for d in range(10):
        rows_ts += [d * 86_400_000_000] * (d + 1)
        rows_type += ["A"] * (d + 1)
    rows_ts.append(3 * 86_400_000_000)
    rows_type.append("B")
    t = pa.table({
        "event_id": pa.array(range(len(rows_ts)), type=pa.int64()),
        "ts": pa.array(rows_ts, type=pa.timestamp("us")),
        "user_id": pa.array([0] * len(rows_ts), type=pa.int64()),
        "event_type": pa.array(rows_type),
        "value": pa.array([0.0] * len(rows_ts)),
        "props": pa.array(["{}"] * len(rows_ts)),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    out = events_rolling_7d(str(tmp_path)).to_pandas()
    a = out[out["event_type"] == "A"].sort_values("day").reset_index(drop=True)
    assert a["n"].tolist() == list(range(1, 11))
    # head: partial windows
    assert a.loc[0, "avg_7d"] == 1.0
    assert a.loc[2, "avg_7d"] == (1 + 2 + 3) / 3
    # day 9 window = days 3..9 -> counts 4..10
    assert a.loc[9, "avg_7d"] == sum(range(4, 11)) / 7
    b = out[out["event_type"] == "B"]
    assert b["avg_7d"].tolist() == [1.0]


def test_events_props_stats_null_and_missing_keys(ray_session, tmp_path):
    """NULL props and JSON without the key are excluded from k aggregates
    but still counted in n, matching the SQL NULL semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import (
        events_props_stats)

    props = ['{"k": 5}', '{"k": -3}', '{"other": 1}', None, '{"k": 10}']
    t = pa.table({
        "event_id": pa.array(range(5), type=pa.int64()),
        "ts": pa.array([0] * 5, type=pa.timestamp("us")),
        "user_id": pa.array([0] * 5, type=pa.int64()),
        "event_type": pa.array(["x", "x", "x", "x", "y"]),
        "value": pa.array([0.0] * 5),
        "props": pa.array(props),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    out = events_props_stats(str(tmp_path)).to_pandas().set_index("event_type")
    assert out.loc["x", "n"] == 4
    assert out.loc["x", "n_k"] == 2
    assert out.loc["x", "sum_k"] == 2
    assert out.loc["x", "min_k"] == -3
    assert out.loc["x", "max_k"] == 5
    assert out.loc["y", "n"] == 1 and out.loc["y", "sum_k"] == 10


def test_doc_shuffle_rank_is_dense_permutation(ray_session, tmp_path):
    """Ranks are exactly 0..N-1 with no gaps, content-independent, and
    stable under input repartitioning (the epoch-shuffle reproducibility
    contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import (
        doc_shuffle_rank)

    n = 400
    t = pa.table({
        "doc_id": pa.array(range(0, 2 * n, 2), type=pa.int64()),  # sparse ids
        "text": pa.array(["x"] * n),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array([1] * n, type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    out = doc_shuffle_rank(str(tmp_path)).to_pandas()
    assert sorted(out["rank"].tolist()) == list(range(n))
    again = doc_shuffle_rank(str(tmp_path)).to_pandas()
    m = out.merge(again, on="doc_id", suffixes=("", "_2"))
    assert (m["rank"] == m["rank_2"]).all()


def test_doc_len_norm_zero_variance_group(ray_session, tmp_path):
    """A language whose docs all share one length gets z = 0 (not NaN),
    and a two-doc group standardizes to +/- 1/sqrt(2)-free sample z."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import (
        doc_len_norm)

    t = pa.table({
        "doc_id": pa.array(range(5), type=pa.int64()),
        "text": pa.array(["x"] * 5),
        "lang": pa.array(["aa", "aa", "aa", "bb", "bb"]),
        "source": pa.array(["s"] * 5),
        "n_chars": pa.array([7, 7, 7, 10, 20], type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    out = doc_len_norm(str(tmp_path)).to_pandas().set_index("doc_id")
    assert (out.loc[[0, 1, 2], "z_len"] == 0.0).all()
    # bb: mean 15, sample sd = sqrt((25+25)/1) = 7.0710678...
    import numpy as np
    assert np.isclose(out.loc[3, "z_len"], round(-5 / np.sqrt(50), 4))
    assert np.isclose(out.loc[4, "z_len"], round(5 / np.sqrt(50), 4))


def test_events_attribution_tiebreak_and_exclusion(ray_session, tmp_path):
    """Latest strictly-preceding click wins; equal-timestamp clicks break
    to the max event_id; purchases with no prior click are dropped; a
    click AT the purchase timestamp does not attribute."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import (
        events_attribution)

    US = 1_000_000
    rows = [
        # user 1: clicks at t=1 (ids 10, 11 — tie), purchase at t=5
        (10, 1, 1 * US, "click"), (11, 1, 1 * US, "click"),
        (12, 1, 5 * US, "purchase"),
        # user 2: click exactly AT purchase ts -> excluded; earlier click wins
        (20, 2, 3 * US, "click"), (21, 2, 7 * US, "click"),
        (22, 2, 7 * US, "purchase"),
        # user 3: purchase with no click at all -> no row
        (30, 3, 2 * US, "purchase"),
        # noise: a view never attributes
        (40, 1, 4 * US, "view"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    out = events_attribution(str(tmp_path)).to_pandas()
    out = out.set_index("purchase_id")
    assert set(out.index) == {12, 22}
    assert out.loc[12, "click_id"] == 11          # max-id tie-break
    assert out.loc[12, "gap_us"] == 4 * US
    assert out.loc[22, "click_id"] == 20          # same-ts click excluded
    assert out.loc[22, "gap_us"] == 4 * US


def test_closure_compute_equals_pinned_fixture(ray_session):
    """The iteratively computed ancestor closure equals the fixture's
    pinned closure artifact the rest of the engine consumes."""
    from tabular_data_semantics_py_ray import fixture_kg
    from tabular_data_semantics_py_ray.pipelines.queries_kg import (
        class_closure_compute)

    got = (class_closure_compute("unused")
           .to_pandas()
           .sort_values(["cls_uri", "ancestor_uri"])
           .reset_index(drop=True))
    exp = (fixture_kg.class_closure_df()
           .sort_values(["cls_uri", "ancestor_uri"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["cls_uri", "ancestor_uri", "distance"]].astype(
            {"distance": "int64"}),
        exp[["cls_uri", "ancestor_uri", "distance"]].astype(
            {"distance": "int64"}))


def test_snapshot_diff_statuses(ray_session, tmp_path):
    """Every status class appears and matches a pandas re-derivation on a
    handcrafted key set (deletion, change, insert, and overlap cases)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import (
        orders_snapshot_diff)

    keys = [1, 5, 7, 11, 35, 55, 77, 13]
    t = pa.table({
        "o_orderkey": pa.array(keys, type=pa.int64()),
        "o_custkey": pa.array([0] * len(keys), type=pa.int64()),
        "o_orderpriority": pa.array([f"p{k}" for k in keys]),
    })
    pq.write_table(t, tmp_path / "orders.parquet")

    out = (orders_snapshot_diff(str(tmp_path)).to_pandas()
           .sort_values(["o_orderkey", "status"]).reset_index(drop=True))
    exp = {
        (5, "changed"),        # %5, survives changed
        (7, "removed"), (35, "removed"), (77, "removed"),  # %7 deleted
        (55, "changed"),       # %5 and %11: survives changed AND re-inserts
        (11 + 10**9, "added"), (55 + 10**9, "added"),
        (77 + 10**9, "added"),  # deleted from v2 but reinserted shifted
        # keys 1, 13 unchanged; key 11 survives unchanged (not %5)
    }
    got = set(map(tuple, out[["o_orderkey", "status"]].values.tolist()))
    assert got == exp


def test_doc_len_decile_equal_depth(ray_session, tmp_path):
    """Deciles are equi-DEPTH: per lang the bin sizes differ by at most
    one, larger bins come first (ntile contract), and a tiny group with
    fewer rows than bins gives one row per bin."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import (
        doc_len_decile)

    import numpy as np
    rng = np.random.default_rng(2)
    n_big = 47  # 10 bins: 7 of size 5, 3 of size 4
    rows = [(i, "big", int(rng.integers(1, 1000))) for i in range(n_big)]
    rows += [(100 + i, "tiny", i) for i in range(3)]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array(["x"] * len(rows)),
        "lang": pa.array([r[1] for r in rows]),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([r[2] for r in rows], type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    out = doc_len_decile(str(tmp_path)).to_pandas()
    big = out[out["lang"] == "big"]
    sizes = big.groupby("decile").size()
    assert sizes.index.tolist() == list(range(1, 11))
    assert sizes.tolist() == [5] * 7 + [4] * 3
    # monotone: higher decile never holds a shorter doc than a lower one
    mx = big.groupby("decile")["n_chars"].max()
    mn = big.groupby("decile")["n_chars"].min()
    assert (mn.to_numpy()[1:] >= mx.to_numpy()[:-1]).all()
    tiny = out[out["lang"] == "tiny"]
    assert sorted(tiny["decile"].tolist()) == [1, 2, 3]


def test_events_trend_slope_exact_line(ray_session, tmp_path):
    """A perfectly linear daily series recovers its slope exactly (the
    integer-sum arithmetic has no float accumulation), and a single-day
    type reports slope 0 (degenerate denominator)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import (
        events_trend_slope)

    US = 86_400_000_000
    rows_ts, rows_type = [], []
    # type A: count on day d = 3 + 2*d for d in 0..6 -> slope exactly 2
    for d in range(7):
        rows_ts += [d * US] * (3 + 2 * d)
        rows_type += ["A"] * (3 + 2 * d)
    rows_ts += [5 * US] * 4
    rows_type += ["B"] * 4
    t = pa.table({
        "event_id": pa.array(range(len(rows_ts)), type=pa.int64()),
        "ts": pa.array(rows_ts, type=pa.timestamp("us")),
        "user_id": pa.array([0] * len(rows_ts), type=pa.int64()),
        "event_type": pa.array(rows_type),
        "value": pa.array([0.0] * len(rows_ts)),
        "props": pa.array(["{}"] * len(rows_ts)),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    out = events_trend_slope(str(tmp_path)).to_pandas().set_index("event_type")
    assert out.loc["A", "slope"] == 2.0
    assert out.loc["A", "n_days"] == 7
    assert out.loc["B", "slope"] == 0.0 and out.loc["B", "n_days"] == 1


def test_events_value_psi_identical_halves_near_zero(ray_session, tmp_path):
    """When both halves draw the identical value multiset, every PSI term
    is ~0 (only Laplace smoothing noise), and the bucket counts split
    exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import (
        events_value_psi)

    vals = np.tile(np.array([5.0, 15.0, 25.0, 35.0]), 50)  # 200 events
    t = pa.table({
        "event_id": pa.array(range(200), type=pa.int64()),
        "ts": pa.array([0] * 200, type=pa.timestamp("us")),
        "user_id": pa.array([0] * 200, type=pa.int64()),
        "event_type": pa.array(["x"] * 200),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * 200),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    out = events_value_psi(str(tmp_path))
    assert (out["n_a"] == out["n_b"]).all()
    assert (out["psi_term"].abs() < 1e-9).all()
    assert out["bucket"].tolist() == [0, 1, 2, 3]


def test_split_leakfree_cluster_integrity(ray_session, tmp_path):
    """Every near-dup cluster lands in exactly ONE split (the property
    split_assign lacks), and singleton docs keep their plain-hash split."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import (
        split_leakfree)

    import numpy as np
    rng = np.random.default_rng(9)
    vocab = [f"w{i:03d}" for i in range(400)]
    rows = []
    # 30 clusters of 3 near-identical docs; each family body is its own
    # random 20-word draw so families never near-match EACH OTHER
    did = 0
    for c in range(30):
        fam = f"fam{c:02d} " + " ".join(rng.choice(vocab, size=20,
                                                   replace=False))
        for ext in ("", " dup", " dup two"):
            rows.append((did, fam + ext)); did += 1
    for i in range(40):  # singletons
        rows.append((did, f"solo{i:03d} " + " ".join(
            rng.choice(vocab, size=20, replace=False))))
        did += 1
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    out = split_leakfree(str(tmp_path)).to_pandas()
    assert len(out) == len(rows)
    # cluster integrity: one split per rep_id
    assert (out.groupby("rep_id")["split"].nunique() == 1).all()
    # the 30 planted clusters really are clusters (3 docs share a rep)
    clustered = out[out["doc_id"] < 90]
    assert (clustered.groupby("rep_id").size() == 3).all()
    # singletons: rep is the doc itself, split matches the plain hash
    solo = out[out["doc_id"] >= 90]
    assert (solo["rep_id"] == solo["doc_id"]).all()
    for _, r in solo.iterrows():
        b1 = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2]
        want = "train" if b1 < "e6" else ("val" if b1 < "f3" else "test")
        assert r["split"] == want


def test_snapshot_diff_apply_roundtrip(ray_session):
    """CDC closure property: applying orders_snapshot_diff's deltas to v1
    reconstructs exactly the v2 the diff was computed against (pandas
    apply on the engine's own diff output — removed keys dropped, changed
    keys repriorized, added keys inserted)."""
    import numpy as np

    from tabular_data_semantics_py_ray.pipelines.relational import (
        orders_snapshot_diff, _read)

    sf = "/root/testdata/sf0.001"
    diff = orders_snapshot_diff(sf).to_pandas()
    v1 = _read(sf, "orders", ["o_orderkey", "o_orderpriority"]).to_pandas()

    # independent v2 re-derivation (same deterministic simulation)
    k = v1["o_orderkey"].to_numpy()
    surv = v1[k % 7 != 0].copy()
    surv.loc[surv["o_orderkey"] % 5 == 0, "o_orderpriority"] = "9-CHANGED"
    ins = v1[k % 11 == 0].copy()
    ins["o_orderkey"] = ins["o_orderkey"] + 1_000_000_000
    v2 = pd.concat([surv, ins], ignore_index=True)

    # apply the diff to v1: delete removed, insert added; changed rows'
    # new value comes from the v2 rule (the diff carries keys + status)
    removed = set(diff[diff["status"] == "removed"]["o_orderkey"])
    added = set(diff[diff["status"] == "added"]["o_orderkey"])
    changed = set(diff[diff["status"] == "changed"]["o_orderkey"])
    applied = v1[~v1["o_orderkey"].isin(removed)].copy()
    applied.loc[applied["o_orderkey"].isin(changed),
                "o_orderpriority"] = "9-CHANGED"
    add_rows = v2[v2["o_orderkey"].isin(added)]
    applied = pd.concat([applied, add_rows], ignore_index=True)

    a = applied.sort_values(["o_orderkey"]).reset_index(drop=True)
    b = v2.sort_values(["o_orderkey"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_doc_scrub_pii_planted(ray_session, tmp_path, monkeypatch):
    """Redaction actually fires: planted emails/phones are replaced and
    counted; clean text is untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabular_data_semantics_py_ray.pipelines.relational import doc_scrub_pii

    pq.write_table(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["mail me at a.b-c@example.co.uk or +1 555-123 4567 ok",
                 "no pii here at all",
                 "two mails x@y.io z@w.ai one phone 123-456-7890"],
    }), str(tmp_path / "documents.parquet"))
    got = doc_scrub_pii(str(tmp_path)).to_pandas().set_index("doc_id")
    assert got.loc[1, "clean_text"] == "mail me at <EMAIL> or <PHONE> ok"
    assert got.loc[1, "n_redactions"] == 2
    assert got.loc[2, "clean_text"] == "no pii here at all"
    assert got.loc[2, "n_redactions"] == 0
    assert got.loc[3, "clean_text"] == "two mails <EMAIL> <EMAIL> one phone <PHONE>"
    assert got.loc[3, "n_redactions"] == 3
