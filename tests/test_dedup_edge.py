"""Edge cases from the round-1 ADVICE: short-doc sentinel signatures must
never reach LSH band emission, and simhash blocking must refuse a
``max_hamming`` its segment count cannot guarantee."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from tabular_data_semantics_py_ray.stages.dedup import (
    near_dup_pairs_minhash,
    near_dup_pairs_simhash,
)


def _docs(rows):
    return rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_minhash_short_docs_never_pair(ray_session):
    """Docs with fewer tokens than the shingle width share the sentinel
    signature; they must not produce candidate (or output) pairs."""
    rows = [(i, "x") for i in range(30)]  # 1 token < ngram=3 -> 0 shingles
    rows += [(100, "a b c d e f g h"), (101, "a b c d e f g h")]
    out = near_dup_pairs_minhash(_docs(rows)).to_pandas()
    # only the planted identical pair survives; no short-doc pair appears
    assert sorted(map(tuple, out[["doc_a", "doc_b"]].values.tolist())) == [
        (100, 101)
    ]


def test_simhash_max_hamming_guard(ray_session):
    ds = _docs([(1, "a b c"), (2, "a b c")])
    with pytest.raises(ValueError):
        near_dup_pairs_simhash(ds, max_hamming=4)  # 5 segments !| 64


def test_simhash_derived_segments_k7(ray_session):
    """max_hamming=7 -> 8 segments; an identical pair (hamming 0) is found."""
    ds = _docs([(1, "a b c d"), (2, "a b c d"), (3, "zz yy xx ww vv uu")])
    out = near_dup_pairs_simhash(ds, max_hamming=7).to_pandas()
    assert (1, 2) in set(map(tuple, out[["doc_a", "doc_b"]].values.tolist()))


def test_exact_embedding_pairs_multi_block(ray_session, tmp_path):
    """Force the cross-file block pairs: 300 vectors at block_rows=64 give
    5 files and 15 block-pair tasks; the result must equal a single
    driver-side numpy all-pairs computation (exact operator, so equality,
    not recall)."""
    import numpy as np

    from tabular_data_semantics_py_ray.stages.dedup import (
        near_dup_pairs_exact_embedding,
    )

    rng = np.random.default_rng(11)
    X = rng.normal(size=(300, 16))
    # plant near-dups straddling block boundaries (ids 10 & 250, 70 & 130)
    X[250] = X[10] + rng.normal(scale=1e-3, size=16)
    X[130] = X[70] + rng.normal(scale=1e-3, size=16)
    df = pd.DataFrame(
        {"vec_id": np.arange(300), "embedding": [r.tolist() for r in X]}
    )
    out = (
        near_dup_pairs_exact_embedding(
            rd.from_pandas(df), threshold=0.6, block_rows=64,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )

    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    ia, ib = np.triu_indices(300, k=1)
    keep = S[ia, ib] >= 0.6
    exp = pd.DataFrame(
        {
            "vec_a": ia[keep],
            "vec_b": ib[keep],
            "cosine": np.round(S[ia, ib][keep], 6),
        }
    ).sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

    assert {(10, 250), (70, 130)} <= set(
        zip(out["vec_a"], out["vec_b"])
    )
    pd.testing.assert_frame_equal(
        out.astype({"vec_a": "int64", "vec_b": "int64"}), exp.astype(
            {"vec_a": "int64", "vec_b": "int64"})
    )

def test_dedup_components_chain_and_clique(ray_session):
    """Label propagation must close transitive chains: a path graph
    1-2-3-4 (diameter 3) and a separate clique {10,11,12} each collapse
    to min-id components; isolated pair keeps its own min."""
    from tabular_data_semantics_py_ray.stages.dedup import dedup_components

    edges = pd.DataFrame(
        {
            "doc_a": [1, 2, 3, 10, 10, 11, 20],
            "doc_b": [2, 3, 4, 11, 12, 12, 21],
        }
    )
    out = (
        dedup_components(rd.from_pandas(edges), num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert dict(zip(out["doc_id"], out["component_id"])) == exp


def test_dedup_components_both_paths_agree(ray_session):
    """The single-task union-find fast path and the distributed
    label-propagation fallback must produce identical components on a
    random edge set (long chains force multiple propagation rounds)."""
    from tabular_data_semantics_py_ray.stages.dedup import dedup_components

    import numpy as np

    rng = np.random.default_rng(7)
    # shallow random graph (the distributed fallback is O(diameter)
    # rounds, so keep the diameter small here; deep chains are covered
    # by the fast path below)
    chain = pd.DataFrame({"doc_a": [100, 101, 102],
                          "doc_b": [101, 102, 103]})
    rand = pd.DataFrame({"doc_a": rng.integers(200, 230, 40),
                         "doc_b": rng.integers(200, 230, 40)})
    rand = rand[rand["doc_a"] != rand["doc_b"]]
    edges = pd.concat([chain, rand], ignore_index=True)

    fast = (dedup_components(rd.from_pandas(edges))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    dist = (dedup_components(rd.from_pandas(edges), num_buckets=4,
                             single_task_max_edges=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert fast.equals(dist)

    # the single-task union-find (pointer jumping) closes a DEEP chain in
    # O(log diameter) iterations
    deep = pd.DataFrame({"doc_a": np.arange(300, 339),
                         "doc_b": np.arange(301, 340)})
    out = dedup_components(rd.from_pandas(deep)).to_pandas()
    assert set(out["component_id"]) == {300}


def test_near_dup_hot_bucket_clique(ray_session):
    """A clique of identical docs (every band bucket holds the whole
    clique) must yield all C(n,2) pairs at jaccard 1.0 — the hot-bucket
    worst case stays correct and bounded."""
    from tabular_data_semantics_py_ray.stages.dedup import near_dup_pairs_minhash

    import numpy as np

    n = 20
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["alpha beta gamma delta epsilon zeta"] * n,
    })
    out = near_dup_pairs_minhash(rd.from_pandas(docs)).to_pandas()
    assert len(out) == n * (n - 1) // 2
    assert (out["jaccard"] == 1.0).all()
    assert (out["doc_a"] < out["doc_b"]).all()


def test_prefix_contain_cross_block_chains(ray_session):
    """Prefix-containment pairs survive block boundaries: many input
    blocks force the sorted runs to split, and the result must equal the
    brute-force O(n^2) containment set (strict extensions only)."""
    import numpy as np

    from tabular_data_semantics_py_ray.stages.dedup import (
        prefix_contain_pairs)

    rng = np.random.default_rng(7)
    rows = []
    did = 0
    # 40 families: base text + nested extensions + exact-dup copies, so
    # chains (a prefix of b prefix of c) and equal-text runs both occur
    for f in range(40):
        base = f"fam{f:03d} " + " ".join(
            rng.choice(list("abcdef"), size=5).tolist())
        depth = int(rng.integers(0, 5))
        text = base
        for d in range(depth + 1):
            copies = int(rng.integers(1, 3))
            for _ in range(copies):
                rows.append((did, text)); did += 1
            text = text + f" ext{d}"
    # noise docs that pair with nothing
    for _ in range(200):
        rows.append((did, "zz " + " ".join(
            rng.choice(list("mnopqr"), size=6).tolist()))); did += 1

    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    expected = set()
    texts = df["text"].to_numpy()
    ids = df["doc_id"].to_numpy()
    for i in range(len(df)):
        for j in range(len(df)):
            if len(texts[j]) > len(texts[i]) and texts[j].startswith(texts[i]):
                expected.add((int(ids[i]), int(ids[j])))
    assert len(expected) > 50  # the fixture actually plants chains

    ds = rd.from_pandas(df).repartition(16)
    out = prefix_contain_pairs(ds).to_pandas()
    got = set(map(tuple, out[["doc_a", "doc_b"]].values.tolist()))
    assert got == expected
    assert len(out) == len(out.drop_duplicates())  # each pair exactly once


def test_fuzzy_edit_dp_matches_reference(ray_session):
    """The token-axis-vectorized Wagner-Fischer kernel equals the scalar
    DP on random inputs, including length-mismatch and exact-hit cases."""
    import numpy as np

    from tabular_data_semantics_py_ray.pipelines import queries_kg

    # reach the closure-internal kernel through a tiny end-to-end run is
    # indirect; instead re-derive via the public query over a controlled
    # corpus: tokens at known distances from the fixture entity names
    import pyarrow as pa
    import pyarrow.parquet as pq

    def lev_ref(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev_diag, d[0] = d[0], i
            for j in range(1, n + 1):
                prev_diag, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev_diag + (a[i - 1] != b[j - 1]))
        return d[n]

    import tempfile, os
    tokens = ["customer", "custoner", "cstomer", "customerxx", "part",
              "pert", "paart", "zzzzz", "ordr", "order"]
    with tempfile.TemporaryDirectory() as td:
        t = pa.table({
            "doc_id": pa.array(range(len(tokens)), type=pa.int64()),
            "text": pa.array(tokens),
            "lang": pa.array(["en"] * len(tokens)),
            "source": pa.array(["s"] * len(tokens)),
            "n_chars": pa.array([len(x) for x in tokens], type=pa.int64()),
        })
        pq.write_table(t, os.path.join(td, "documents.parquet"))
        out = queries_kg.fuzzy_match_edit(td).to_pandas()

    from tabular_data_semantics_py_ray import fixture_kg
    names = sorted({(u, u.rsplit("/", 1)[-1].lower())
                    for u in set(fixture_kg.lexicon_df()["entity_uri"])})
    expected = set()
    for tok in tokens:
        if len(tok) < 3:
            continue
        for uri, nm in names:
            d = lev_ref(tok, nm)
            if d <= 2:
                expected.add((tok, uri, d))
    got = set(map(tuple, out[["token", "entity_uri", "dist"]].values.tolist()))
    assert got == expected and len(expected) >= 5


def test_md5_token_cache_bounded():
    """Open-vocabulary stress: the per-process token->md5 memo evicts on
    overflow instead of growing without bound inside long-lived workers."""
    from tabular_data_semantics_py_ray.functions.hashing import md5_hash64
    from tabular_data_semantics_py_ray.stages import dedup

    dedup._MD5_TOKEN_CACHE.clear()
    old_cap = dedup._MD5_TOKEN_CACHE_CAP
    dedup._MD5_TOKEN_CACHE_CAP = 100
    try:
        for i in range(5000):
            assert dedup._md5_cached(f"tok{i}", md5_hash64) == md5_hash64(
                f"tok{i}")
        assert len(dedup._MD5_TOKEN_CACHE) <= 100
        # re-derivation after eviction stays correct
        assert dedup._md5_cached("tok0", md5_hash64) == md5_hash64("tok0")
    finally:
        dedup._MD5_TOKEN_CACHE_CAP = old_cap
        dedup._MD5_TOKEN_CACHE.clear()


def test_remove_dup_spans_planted(ray_session):
    """Span removal drops exactly the duplicated 8-gram's tokens: two docs
    share one 8-token run mid-text; overlapping spans merge; a doc that IS
    the shared run comes back empty; unique docs are untouched."""
    import pyarrow as pa
    import ray.data as rd

    from tabular_data_semantics_py_ray.stages.dedup import remove_dup_spans

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = {
        1: f"a1 a2 {shared} a3 a4",        # shared run mid-text
        2: f"b1 {shared} b2 b3 b4 b5",     # same run elsewhere
        3: shared,                          # doc IS the run -> empty
        4: "u1 u2 u3 u4 u5 u6 u7 u8 u9",   # unique -> untouched
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": list(docs), "text": list(docs.values())}))
    got = dict(remove_dup_spans(ds).to_pandas()
               [["doc_id", "clean_text"]].itertuples(index=False, name=None))
    assert got == {1: "a1 a2 a3 a4", 2: "b1 b2 b3 b4 b5", 3: "",
                   4: docs[4]}
