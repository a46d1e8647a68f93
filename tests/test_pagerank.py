"""PageRank: the single-task and distributed paths must agree bit-for-bit
(after round-6) on the same graph, and match a hand-rolled dense power
iteration — the same two-path agreement contract dedup_components tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from tabular_data_semantics_py_ray.pipelines.queries_kg import (
    _pagerank_distributed,
    _pagerank_single_task,
)

# 'e' is a dangling sink (rank leaks, the documented simplified variant);
# 'd' has no in-links (keeps only the base term).
GRAPH = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
         ("b", "e")]


def _edges_ds(pairs):
    t = pa.Table.from_arrays(
        [pa.array([a for a, _ in pairs], type=pa.string()),
         pa.array([b for _, b in pairs], type=pa.string())],
        names=["u", "v"])
    return rd.from_arrow(t)


def _dense_reference(pairs, iters, damping):
    nodes = sorted({x for e in pairs for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in pairs:
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        s = np.zeros(n)
        for a, b in pairs:
            s[idx[b]] += r[idx[a]] / deg[idx[a]]
        r = (1 - damping) / n + damping * s
    return {m: round(float(r[idx[m]]), 6) for m in nodes}


def test_single_task_matches_dense_reference(ray_session):
    out = _pagerank_single_task(
        _edges_ds(GRAPH), iters=5, damping=0.85).to_pandas()
    ref = _dense_reference(GRAPH, 5, 0.85)
    got = out.set_index("node")["pagerank"]
    assert set(got.index) == set(ref)
    for m, expect in ref.items():
        assert abs(got[m] - expect) < 1e-9
    # dangling mass is dropped, so total rank stays <= 1
    assert got.sum() <= 1.0 + 1e-9


def test_paths_agree(ray_session):
    single = _pagerank_single_task(
        _edges_ds(GRAPH), iters=3, damping=0.85).to_pandas()
    dist = _pagerank_distributed(
        _edges_ds(GRAPH), iters=3, damping=0.85).to_pandas()
    s = single.sort_values("node").reset_index(drop=True)
    d = dist.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, d)


def test_personalized_paths_agree(ray_session):
    single = _pagerank_single_task(
        _edges_ds(GRAPH), iters=3, damping=0.85,
        personalized=True).to_pandas()
    dist = _pagerank_distributed(
        _edges_ds(GRAPH), iters=3, damping=0.85,
        personalized=True).to_pandas()
    s = single.sort_values("node").reset_index(drop=True)
    d = dist.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, d)
    # restart mass concentrates on the seed ('a' = min node): it must hold
    # strictly more rank than under no-restart teleportation to 'd' (no
    # in-links, not the seed -> exactly zero rank)
    got = s.set_index("node")["pagerank"]
    assert got["a"] > 0.15
    assert got["d"] == 0.0


def test_kg_components_paths_agree(ray_session):
    from tabular_data_semantics_py_ray.pipelines.queries_kg import (
        _components_str_distributed)
    from tabular_data_semantics_py_ray.stages.dedup import (
        _components_single_task)

    # two islands: {a,b,c,e} (via a->b->c->a, b->e) and {x,y}
    pairs = GRAPH + [("x", "y")]
    edges = _edges_ds(pairs)

    def _undirect(t):
        u = t.column("u").combine_chunks()
        v = t.column("v").combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([u, v]), pa.concat_arrays([v, u])],
            names=["u", "v"])

    und = edges.map_batches(_undirect, batch_format="pyarrow").materialize()
    single = _components_single_task(und).to_pandas().rename(
        columns={"doc_id": "node"})
    dist = _components_str_distributed(und).to_pandas()
    s = single.sort_values("node").reset_index(drop=True)
    d = dist.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, d)
    comp = s.set_index("node")["component_id"]
    assert set(comp[["a", "b", "c", "d", "e"]]) == {"a"}
    assert set(comp[["x", "y"]]) == {"x"}


def test_bfs_paths_agree(ray_session):
    from tabular_data_semantics_py_ray.pipelines.queries_kg import (
        _bfs_single_task)
    import tabular_data_semantics_py_ray.pipelines.queries_kg as qk

    pairs = GRAPH + [("x", "y")]  # second island is unreachable from 'a'
    edges = _edges_ds(pairs)

    def _undirect(t):
        u = t.column("u").combine_chunks()
        v = t.column("v").combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([u, v]), pa.concat_arrays([v, u])],
            names=["u", "v"])

    und = edges.map_batches(_undirect, batch_format="pyarrow").materialize()
    single = _bfs_single_task(und, max_depth=32).to_pandas()

    # drive the DISTRIBUTED frontier loop by monkeypatching the edge
    # source and forcing the fast-path guard off
    orig = qk._kg_uri_edges
    qk._kg_uri_edges = lambda sf: edges
    try:
        dist = qk.kg_bfs_distances("unused", single_task_max_edges=0
                                   ).to_pandas()
    finally:
        qk._kg_uri_edges = orig
    s = single.sort_values("node").reset_index(drop=True)
    d = dist.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, d)
    got = s.set_index("node")["distance"]
    assert got["a"] == 0 and got["b"] == 1 and got["e"] == 2
    assert "x" not in got.index  # other island unreachable
