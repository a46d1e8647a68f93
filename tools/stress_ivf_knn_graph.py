"""Scale-stress for the approximate kNN graph (`stages/similarity.knn_graph_ivf`)
— the vector family's designated 100-TB path. Reproduces the BASELINE.md
round-5 row.

Corpus: 2M x 64-dim vectors — sf0.1 embeddings (2,000 rows) replicated
1000x with distinct vec_id ranges (stride 10,000), staged to parquet under
/tmp/vec2m. n_clusters is left at the auto default (None -> max(16,
sqrt(n)) = 1414), nprobe=4, k=5, 32 CPUs.

Planted structure: every vector has exactly 999 cosine-1.0 duplicates in
the other replicas, so the TRUE top-5 neighbors of every vector are
duplicates; identical vectors land in the same IVF primary cell by
construction, so a correct cell assignment yields recall 1.0. Recall is
measured distributed (per-batch hit/total partials, summed) and asserted
>= 0.99 — the at-scale recall gate the r4 verdict asked for.

Run:  PYTHONPATH=/root/repo python tools/stress_ivf_knn_graph.py
"""
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 10_000
REPLICAS = 1000
STAGE = "/tmp/vec2m"
N_FILES = 50


def stage() -> None:
    if os.path.isdir(STAGE) and len(os.listdir(STAGE)) == N_FILES:
        return
    shutil.rmtree(STAGE, ignore_errors=True)
    os.makedirs(STAGE)
    base = pq.read_table("/root/testdata/sf0.1/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ids = base.column("vec_id").to_numpy()
    emb = base.column("embedding")
    per_file = REPLICAS // N_FILES
    for f in range(N_FILES):
        parts = [pa.table({"vec_id": pa.array(ids + r * STRIDE),
                           "embedding": emb})
                 for r in range(f * per_file, (f + 1) * per_file)]
        pq.write_table(pa.concat_tables(parts),
                       f"{STAGE}/part_{f:03d}.parquet")


def main() -> int:
    stage()
    import ray
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from tabular_data_semantics_py_ray.stages.similarity import knn_graph_ivf

    ds = ray.data.read_parquet(STAGE)
    n = ds.count()
    t0 = time.time()
    edges = knn_graph_ivf(ds, k=5, n_clusters=None, nprobe=4)

    def _recall_partial(t: pa.Table) -> pa.Table:
        v = t.column("vec_id").to_numpy() % STRIDE
        nb = t.column("neighbor_id").to_numpy() % STRIDE
        return pa.table({"hit": [int((v == nb).sum())], "tot": [len(v)]})

    partials = edges.map_batches(
        _recall_partial, batch_format="pyarrow").to_pandas()
    wall = time.time() - t0
    recall = partials["hit"].sum() / partials["tot"].sum()
    out = {"op": "knn_graph_ivf", "n_vectors": n, "dim": 64, "k": 5,
           "num_cpus": ncpu, "n_clusters": "auto(1414)", "nprobe": 4,
           "wall_sec": round(wall, 1), "vecs_per_sec": round(n / wall),
           "edges": int(partials["tot"].sum()),
           "planted_dup_recall": round(float(recall), 4)}
    print(json.dumps(out))
    assert out["edges"] == n * 5, out
    assert recall >= 0.99, out  # the at-scale recall gate
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
