"""ANN: brute-force baseline vs IVF scale path."""

from __future__ import annotations

import pandas as pd

from tabular_data_semantics_py_ray.api import _embeddings, _query_vectors
from tabular_data_semantics_py_ray.stages.similarity import ann_topk, ann_topk_ivf


def _pairs(df: pd.DataFrame) -> set:
    return set(zip(df["query_id"], df["neighbor_id"]))


def test_ivf_full_probe_equals_brute_force(sf_small):
    emb = _embeddings(sf_small)
    q = _query_vectors(sf_small)
    bf = ann_topk(emb, q, k=10).to_pandas()
    ivf = ann_topk_ivf(emb, q, k=10, n_clusters=8, nprobe=8).to_pandas()
    a = bf.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = ivf.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ivf_partial_probe_recall(sf_small):
    emb = _embeddings(sf_small)
    q = _query_vectors(sf_small)
    bf = _pairs(ann_topk(emb, q, k=10).to_pandas())
    ivf = _pairs(ann_topk_ivf(emb, q, k=10, n_clusters=16, nprobe=8).to_pandas())
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.6, recall  # random 64-dim corpus: cells are weak, but
    # the probe path must still surface most true neighbors at nprobe=8/16
