"""Differential coverage for the two exact-Jaccard verify paths.

The near-dup ops route small candidate sets through
``verify_pairs_broadcast`` (ray.put sets + one map, zero barriers) and
everything else through ``verify_pairs_exact`` (two bucket shuffles).
Both must produce the SAME pair set — these tests pin that equivalence so
the shuffle path stays covered now that every test-scale corpus takes the
broadcast fast path.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _docs_df():
    # 30 docs: ten templated triples (near-dups within a triple), the rest
    # unique; every doc has >= 10 tokens so trigram sets are meaningful
    rows = []
    for i in range(10):
        base = " ".join(f"tok{i}_{j}" for j in range(12))
        rows.append({"doc_id": 3 * i, "text": base})
        rows.append({"doc_id": 3 * i + 1, "text": base + " extra"})
        rows.append({"doc_id": 3 * i + 2,
                     "text": " ".join(f"uniq{i}_{j}" for j in range(12))})
    return pd.DataFrame(rows)


def _pairs_and_sigs():
    from tabular_data_semantics_py_ray.stages.dedup import (
        shingle_signatures_batch)

    docs = _docs_df()
    ids = docs["doc_id"].tolist()
    pairs = pd.DataFrame(
        [(a, b) for a in ids for b in ids if a < b],
        columns=["doc_a", "doc_b"])
    sigs = rd.from_pandas(docs).map_batches(
        lambda t: shingle_signatures_batch(t, ngram=3, with_sig=False),
        batch_format="pyarrow")
    return rd.from_pandas(pairs), sigs


def _collect(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def test_broadcast_verify_equals_shuffle_verify():
    from tabular_data_semantics_py_ray.stages.dedup import (
        verify_pairs_broadcast, verify_pairs_exact)

    pairs, sigs = _pairs_and_sigs()
    sigs = sigs.materialize()
    got_b = _collect(verify_pairs_broadcast(pairs, sigs, threshold=0.8))
    got_e = _collect(verify_pairs_exact(pairs, sigs, threshold=0.8))
    assert len(got_b) == 10  # one near-dup pair per template triple
    pd.testing.assert_frame_equal(got_b, got_e)


def test_ngram_shuffle_fallback_matches_default():
    from tabular_data_semantics_py_ray.stages.dedup import (
        near_dup_pairs_ngram)

    docs = rd.from_pandas(_docs_df())
    default = _collect(near_dup_pairs_ngram(docs))
    # broadcast_max_pairs=0 forces the non-broadcast corpus scan and the
    # two-shuffle verify
    fallback = _collect(
        near_dup_pairs_ngram(rd.from_pandas(_docs_df()),
                             broadcast_max_pairs=0))
    assert len(default) == 10
    pd.testing.assert_frame_equal(default, fallback)


def test_ngram_pushdown_shuffle_route_matches_default():
    from tabular_data_semantics_py_ray.stages.dedup import (
        near_dup_pairs_ngram)

    default = _collect(near_dup_pairs_ngram(rd.from_pandas(_docs_df())))
    # sig_broadcast_max_bytes=0 keeps the candidate pushdown but forces
    # the materialized filtered stream into the two-shuffle verify
    routed = _collect(
        near_dup_pairs_ngram(rd.from_pandas(_docs_df()),
                             sig_broadcast_max_bytes=0))
    assert len(default) == 10
    pd.testing.assert_frame_equal(default, routed)


def test_pushdown_lazy_branch_matches_broadcast():
    """pushdown_max_docs=0 forces the lazy filtered-stream -> shuffle
    verify route (the 'too many candidate docs to pin' branch)."""
    from tabular_data_semantics_py_ray.stages.dedup import (
        _verify_with_pushdown, shingle_signatures_batch)

    docs = rd.from_pandas(_docs_df())
    ids = _docs_df()["doc_id"].tolist()
    pairs = rd.from_pandas(pd.DataFrame(
        [(a, b) for a in ids for b in ids if a < b],
        columns=["doc_a", "doc_b"]))

    def _sh(t):
        return shingle_signatures_batch(t, ngram=3, with_sig=False)

    default = _collect(_verify_with_pushdown(
        pairs, docs, _sh, threshold=0.8, broadcast_max_pairs=5_000_000))
    lazy = _collect(_verify_with_pushdown(
        rd.from_pandas(pd.DataFrame(
            [(a, b) for a in ids for b in ids if a < b],
            columns=["doc_a", "doc_b"])),
        rd.from_pandas(_docs_df()), _sh, threshold=0.8,
        broadcast_max_pairs=5_000_000, pushdown_max_docs=0))
    assert len(default) == 10
    pd.testing.assert_frame_equal(default, lazy)


def test_broadcast_verify_empty_pairs():
    from tabular_data_semantics_py_ray.stages.dedup import (
        verify_pairs_broadcast)

    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([], type=pa.int64()),
        "doc_b": pa.array([], type=pa.int64()),
    }))
    _, sigs = _pairs_and_sigs()
    out = verify_pairs_broadcast(pairs, sigs.materialize(), threshold=0.8)
    assert out.count() == 0


def test_broadcast_verify_empty_signatures_nonempty_pairs():
    """Empty signature table + non-empty pair batch: must return no
    matches, not IndexError from fancy-indexing an empty array."""
    from tabular_data_semantics_py_ray.stages.dedup import (
        verify_pairs_broadcast)

    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([1, 2], type=pa.int64()),
        "doc_b": pa.array([3, 4], type=pa.int64()),
    }))
    sigs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "shingles": pa.array([], type=pa.list_(pa.int64())),
    }))
    out = verify_pairs_broadcast(pairs, sigs.materialize(), threshold=0.8)
    assert out.count() == 0
