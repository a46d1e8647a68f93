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
