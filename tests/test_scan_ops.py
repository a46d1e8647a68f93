"""Tests for the distributed-scan / runtime-filter operator family:

- pack_assign: the distributed prefix sum must equal a sequential cumsum
  in doc_id order regardless of how rows land in blocks (the whole point
  of the two-pass range decomposition);
- orders_segment_semijoin: the bloom prefilter can never drop a true
  match (no false negatives by construction), and the exact join must
  remove every bloom false positive even with a deliberately tiny filter;
- bigram partial kernel: per-batch pair counts must never cross document
  boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts, shuffle_seed=7):
    """Docs parquet with doc_ids deliberately OUT of storage order so block
    order != doc_id order (the adversarial case for an ordered scan)."""
    n = len(texts)
    ids = np.arange(n)
    rng = np.random.default_rng(shuffle_seed)
    perm = rng.permutation(n)
    df = pd.DataFrame({"doc_id": ids[perm], "text": [texts[i] for i in perm]})
    df["lang"] = "en"
    df["source"] = "t"
    df["n_chars"] = df["text"].str.len()
    path = tmp_path / "documents.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path,
                   row_group_size=max(1, n // 7))
    return str(tmp_path)


def test_pack_assign_matches_sequential_cumsum(ray_session, tmp_path):
    from tabular_data_semantics_py_ray.pipelines.relational import pack_assign

    rng = np.random.default_rng(3)
    texts = [" ".join(f"t{j}" for j in range(rng.integers(1, 40)))
             for _ in range(300)]
    sf = _write_docs(tmp_path, texts)

    got = pack_assign(sf, seq_len=64).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    nt = np.array([len(t.split(" ")) for t in texts], dtype=np.int64)
    off = np.cumsum(nt) - nt
    assert got["doc_id"].tolist() == list(range(300))
    assert got["n_tokens"].tolist() == nt.tolist()
    assert got["tok_offset"].tolist() == off.tolist()
    assert got["pack_id"].tolist() == (off // 64).tolist()
    assert got["pack_pos"].tolist() == (off % 64).tolist()


def test_pack_assign_empty_texts_count_one_token(ray_session, tmp_path):
    # split('') == [''] on both engines; the scan must agree
    from tabular_data_semantics_py_ray.pipelines.relational import pack_assign

    sf = _write_docs(tmp_path, ["", "a b", "", "c"])
    got = pack_assign(sf, seq_len=3).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got["n_tokens"].tolist() == [1, 2, 1, 1]
    assert got["tok_offset"].tolist() == [0, 1, 3, 4]


@pytest.mark.parametrize("bloom_bits", [64, 1 << 20])
def test_segment_semijoin_exact_even_with_tiny_bloom(ray_session, tmp_path,
                                                     bloom_bits):
    """bloom_bits=64 with ~hundreds of keys saturates the filter, so nearly
    every order survives the prefilter as a false positive — the exact join
    must still produce exactly the oracle set."""
    from tabular_data_semantics_py_ray.pipelines.relational import (
        orders_segment_semijoin,
    )

    rng = np.random.default_rng(11)
    n_cust, n_ord = 200, 1000
    seg = np.where(rng.random(n_cust) < 0.3, "AUTOMOBILE", "OTHER")
    cust = pd.DataFrame({
        "c_custkey": np.arange(n_cust), "c_name": "x",
        "c_nationkey": 0, "c_acctbal": 0.0, "c_mktsegment": seg})
    ck = rng.integers(0, n_cust, n_ord)
    orders = pd.DataFrame({"o_orderkey": np.arange(n_ord), "o_custkey": ck})
    pq.write_table(pa.Table.from_pandas(cust, preserve_index=False),
                   tmp_path / "customer.parquet")
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   tmp_path / "orders.parquet")

    got = orders_segment_semijoin(str(tmp_path), bloom_bits=bloom_bits)
    got = sorted(got.to_pandas()["o_orderkey"].tolist())
    want = sorted(orders.loc[
        np.isin(ck, np.flatnonzero(seg == "AUTOMOBILE")), "o_orderkey"
    ].tolist())
    assert got == want


def test_bloom_prefilter_has_no_false_negatives():
    """Property of the two-probe bloom kernel itself (via the SHARED
    bloom_positions helper — the same code path build and probe use):
    every inserted key passes membership, for any key set and width."""
    from tabular_data_semantics_py_ray.pipelines.relational import (
        bloom_positions,
    )

    bloom_bits = 1 << 12
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**40, 500).astype(np.uint64)
    bits = np.zeros(bloom_bits // 8, dtype=np.uint8)
    for byte_idx, bit_mask in bloom_positions(keys, bloom_bits):
        np.bitwise_or.at(bits, byte_idx, bit_mask)
    keep = np.ones(len(keys), dtype=bool)
    for byte_idx, bit_mask in bloom_positions(keys, bloom_bits):
        keep &= (bits[byte_idx] & bit_mask) != 0
    assert keep.all()


def test_bigram_partial_does_not_cross_doc_boundaries(ray_session, tmp_path):
    from tabular_data_semantics_py_ray.pipelines.relational import bigram_pmi

    # "a b" + "b a": bigrams are exactly {a b, b a}; a cross-doc kernel
    # would also emit (b, b) or (a, a)
    sf = _write_docs(tmp_path, ["a b", "b a"] * 10)
    got = bigram_pmi(sf).to_pandas()
    pairs = set(zip(got["w1"], got["w2"]))
    assert pairs == {("a", "b"), ("b", "a")}
    assert got["n_pair"].tolist() == [10, 10]
    # p(ab)=10/20 over bigrams, p(a)=p(b)=20/40 over tokens -> pmi=ln(2)
    assert np.allclose(got["pmi"], np.round(np.log(2), 4))


def test_kmeans_assign_prefers_true_label_on_separated_clusters(
        ray_session, tmp_path):
    from tabular_data_semantics_py_ray.pipelines.relational import (
        emb_kmeans_assign,
    )

    rng = np.random.default_rng(2)
    n, d, k = 120, 8, 3
    labels = np.arange(n) % k
    centers = rng.normal(size=(k, d)) * 10
    X = centers[labels] + rng.normal(scale=0.1, size=(n, d))
    tbl = pa.Table.from_pydict({
        "vec_id": np.arange(n),
        "embedding": [row.tolist() for row in X],
        "label": labels,
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    got = emb_kmeans_assign(str(tmp_path)).to_pandas()
    assert (got["assigned"] == got["label"]).all()


def test_mixture_oversample_counts_and_copy_idx(ray_session, tmp_path):
    """Every doc appears exactly floor(w) or ceil(w) times with dense
    copy_idx 0..n-1, and the realized rate over many docs approaches w."""
    import hashlib

    from tabular_data_semantics_py_ray.pipelines.relational import (
        mixture_oversample,
    )

    n = 400
    texts = ["x"] * n
    sf = _write_docs(tmp_path, texts)
    # _write_docs sets lang='en' (w=0.5): each doc gets 0 or 1 copies
    got = mixture_oversample(str(tmp_path)).to_pandas()
    assert (got["copy_idx"] == 0).all()
    expect = {i for i in range(n)
              if int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
              < 0.5 * 65536}
    assert set(got["doc_id"]) == expect
    # ~50% +- a loose band
    assert 0.35 < len(got) / n < 0.65


def test_mixture_oversample_upsamples_with_dense_copy_idx(ray_session,
                                                          tmp_path):
    from tabular_data_semantics_py_ray.pipelines.relational import (
        mixture_oversample,
    )

    sf = _write_docs(tmp_path, ["x"] * 100)
    got = mixture_oversample(sf, weights={"en": 2.25}).to_pandas()
    per_doc = got.groupby("doc_id")["copy_idx"].agg(["count", "min", "max"])
    assert set(per_doc["count"]).issubset({2, 3})
    assert (per_doc["min"] == 0).all()
    assert (per_doc["max"] == per_doc["count"] - 1).all()
    assert 2.0 < per_doc["count"].mean() < 2.5


def test_events_decay_matches_bruteforce(ray_session, tmp_path):
    """Differential vs the O(n^2) definition, with negative values, users
    whose totals differ by many orders of magnitude, and duplicate ts."""
    from tabular_data_semantics_py_ray.pipelines.relational import (
        events_decay,
    )

    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 12, n),
        "ts": pd.to_datetime(
            rng.integers(0, 30 * 86_400_000_000, n), unit="us"),
        "value": np.where(rng.random(n) < 0.2, -1.0, 1.0)
                 * np.round(rng.uniform(0.1, 100, n), 2),
        "event_type": "x",
        "props": "{}",
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")

    got = events_decay(str(tmp_path)).to_pandas().set_index("event_id")

    tau = 86_400_000_000.0
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g["value"].to_numpy()
        for i in range(len(g)):
            want = float(np.sum(v[: i + 1] * np.exp(-(t[i] - t[: i + 1]) / tau)))
            eid = g["event_id"].iloc[i]
            assert abs(got.loc[eid, "decayed"] - round(want, 4)) <= 1e-3, (
                uid, eid)


def test_media_captions_pair_each_media_with_preceding_chunk(ray_session,
                                                             tmp_path):
    from tabular_data_semantics_py_ray.pipelines.relational import (
        media_captions,
    )

    # doc 0: chunks 0,1,2 (26 tokens); media after chunk i iff (0+i)%4==0
    # -> exactly one media (image) after chunk 0, caption = tokens 0..11
    toks = [f"w{i}" for i in range(26)]
    sf = _write_docs(tmp_path, [" ".join(toks), ""])  # plus an empty doc
    got = media_captions(sf).to_pandas()
    got = got[got["doc_id"] == 0]
    assert len(got) == 1
    row = got.iloc[0]
    assert row["media_kind"] == "image"
    assert row["media_ref"] == "media://0/0"
    assert row["caption"] == " ".join(toks[:12])
    assert row["n_caption_tokens"] == 12


def test_shared_index_dedup_equals_shuffle_dedup(ray_session, tmp_path):
    """The sharded mutable-index registry must produce exactly the
    shuffle-based exact-dedup table, for any arrival order and shard
    count (min/+ are commutative)."""
    import ray.data as rd

    from tabular_data_semantics_py_ray.stages.dedup import exact_dedup_groups
    from tabular_data_semantics_py_ray.stages.shared_index import (
        exact_dedup_groups_indexed,
    )

    rng = np.random.default_rng(23)
    base = [f"text number {i}" for i in range(40)]
    texts = [base[rng.integers(0, 40)] for _ in range(300)]
    sf = _write_docs(tmp_path, texts)
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"]).repartition(8)

    via_shuffle = exact_dedup_groups(docs).to_pandas().sort_values(
        "text_hash").reset_index(drop=True)
    for shards in (2, 5):
        via_index = exact_dedup_groups_indexed(
            docs, num_shards=shards).to_pandas().sort_values(
            "text_hash").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            via_index[sorted(via_index.columns)],
            via_shuffle[sorted(via_shuffle.columns)])


def test_media_oracles_skip_empty_docs_like_the_engine(ray_session,
                                                       tmp_path):
    """Regression for the empty-text divergence: interleave emits zero
    spans for text='' (even when doc_id % 4 == 0 would interleave media),
    and the media oracle CTE must agree — without its WHERE text <> ''
    filter the oracle invents a media row the engine never emits."""
    import duckdb

    import __ray_entry__ as entrymod
    from tabular_data_semantics_py_ray.pipelines.relational import (
        media_captions,
    )

    # doc 4 is empty AND (4 + 0) % 4 == 0 — the exact divergence case
    texts = ["w " * 13, "x", "y", "z", "", "a b c"]
    sf = _write_docs(tmp_path, texts)

    got = media_captions(sf).to_pandas()
    assert 4 not in set(got["doc_id"])

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    for name in ("media_manifest", "media_captions"):
        odf = con.execute(entrymod.oracle_sql()[name]).fetchdf()
        assert 4 not in set(odf["doc_id"]), name
    # and the two sides agree exactly on this corpus
    odf = con.execute(entrymod.oracle_sql()["media_captions"]).fetchdf()
    cols = sorted(got.columns)
    a = got[cols].astype(str).sort_values(cols).reset_index(drop=True)
    b = odf[cols].astype(str).sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_pack_and_pmi_read_directory_corpora(ray_session, tmp_path):
    """documents.parquet as a DIRECTORY of files (the staged-corpus /
    100 TB layout): footer-metadata row counts and the ordered scan must
    both work across files, with ids scattered across them."""
    from tabular_data_semantics_py_ray.pipelines.relational import (
        bigram_pmi, pack_assign,
    )

    rng = np.random.default_rng(9)
    n = 120
    texts = [" ".join(rng.choice(["a", "b", "c"], size=rng.integers(1, 9)))
             for _ in range(n)]
    ids = rng.permutation(n)
    d = tmp_path / "documents.parquet"
    d.mkdir()
    for part in range(3):
        sel = ids[part::3]
        df = pd.DataFrame({"doc_id": sel, "text": [texts[i] for i in sel]})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       d / f"part-{part}.parquet")

    got = pack_assign(str(tmp_path), seq_len=16).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    nt = np.array([len(t.split(" ")) for t in texts], dtype=np.int64)
    off = np.cumsum(nt) - nt
    assert got["tok_offset"].tolist() == off.tolist()

    pmi = bigram_pmi(str(tmp_path)).to_pandas()
    # n_b from directory metadata must equal the true bigram count
    assert pmi["n_pair"].sum() == int(nt.sum()) - n


def test_hll_bit_length_kernel_is_exact():
    """The PRODUCTION bit-length kernel must equal int.bit_length for
    arbitrary 60-bit values — float log2 would misround near powers of
    two, which is exactly where HLL's rho lives."""
    from tabular_data_semantics_py_ray.pipelines.relational import (
        bit_length_i64,
    )

    rng = np.random.default_rng(31)
    vals = np.concatenate([
        np.array([0], dtype=np.int64),
        (np.int64(1) << np.arange(50, dtype=np.int64)),       # exact powers
        (np.int64(1) << np.arange(1, 50, dtype=np.int64)) - 1,  # all-ones
        rng.integers(0, 1 << 50, 200).astype(np.int64),
    ])
    got = bit_length_i64(vals)
    want = np.array([int(v).bit_length() for v in vals])
    assert (got == want).all()


def test_shared_index_offer_is_idempotent_under_replay(ray_session):
    """A replayed offer (same batch token) must not change the registry —
    the exactly-once guarantee under Ray task retry."""
    import ray as _ray

    from tabular_data_semantics_py_ray.stages.shared_index import HashShard

    shard = HashShard.remote()
    _ray.get(shard.offer.remote("tok-1", ["h1", "h2"], [5, 7], [2, 1]))
    _ray.get(shard.offer.remote("tok-1", ["h1", "h2"], [5, 7], [2, 1]))  # replay
    _ray.get(shard.offer.remote("tok-2", ["h1"], [3, ], [4, ]))
    t = _ray.get(shard.drain.remote()).to_pandas().set_index("text_hash")
    assert t.loc["h1", "n_docs"] == 6      # 2 + 4, NOT 2 + 2 + 4
    assert t.loc["h1", "keep_doc_id"] == 3
    assert t.loc["h2", "n_docs"] == 1
