#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "triples_per_sec": ...}

``--scaling``: runs the flagship triple pipeline on a replicated corpus
(same input both times) in two FRESH processes at num_cpus=8 and 32 and
prints throughputs plus scaling efficiency = (T_8 / T_32) / (32/8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "20"))

BENCH_QUERIES = [
    "kg_triples",
    "kg_cea_link",
    "kg_cta_doc_type",
    "kg_typed_repair",
    "kg_class_confirm",
    "kg_ingest_lexicon",
    "kg_cea_link_ingested",
    "kg_ingest_rdfs",
    "kg_ingest_owl_horst",
    "dedup_near_pairs",
    "dedup_ngram_jaccard",
    "dedup_span_remove",
    "weighted_sample",
    "dedup_simhash",
    "dedup_exact",
    "ann_topk",
    "knn_graph_ivf",
    "orders_ship_window",
    "doc_tfidf_top5",
    "contamination_8gram",
    "doc_pack_assign",
    "orders_segment_semijoin",
    "q3_shipping",
    "curate_corpus",
    "dedup_prefix_contain",
    "ann_topk_pq",
    "q1_pricing",
    "revenue_by_nation",
    "top_parts_by_revenue",
    "events_by_type",
    "token_freq_top20",
    "doc_text_stats",
    "media_manifest",
]


def _consume(res) -> int:
    """Stream-consume a result; returns row count."""
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return len(res)
    n = 0
    for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += b.num_rows
    return n


def _init_ray():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    ctx.use_polars_sort = True  # markedly faster block sorts on string keys


def _replicated_documents(times: int):
    """Same corpus replicated with distinct doc_id ranges — the compute-bound
    flagship input for the scaling run."""
    import pyarrow as pa
    import ray.data as rd

    from tabular_data_semantics_py_ray.util import read_parquet_clean

    base = read_parquet_clean(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )

    group = max(1, 40_000 // 5_000)

    def _rep(t: pa.Table):
        import pyarrow.compute as pc

        # generator UDF yielding ~40k-doc chunks: output blocks (and hence
        # staged parquet files) land at a useful dispatch granularity
        # without ever concentrating `times` copies into one giant block
        parts = []
        for i in range(times):
            shifted = pc.add(t.column("doc_id"), i * 10_000_000)
            parts.append(pa.Table.from_arrays([shifted, t.column("text")],
                                              names=["doc_id", "text"]))
            if len(parts) == group:
                yield pa.concat_tables(parts)
                parts = []
        if parts:
            yield pa.concat_tables(parts)

    return base.map_batches(_rep, batch_format="pyarrow")


def _steal_jiffies() -> int:
    """Hypervisor steal-time counter — this shared VM has episodes where
    ~half its CPU is stolen and identical benches run 2-2.5x slower (see
    BASELINE.md). Reported so a slow reading is attributable."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return -1


def _cpu_probe_sec() -> float:
    """Fixed single-thread workload timed before Ray starts: a per-run
    CPU-speed calibration constant (≈0.25 s on this box when unloaded)."""
    t0 = time.time()
    s = 0
    for i in range(4_000_000):
        s += i * i
    return round(time.time() - t0, 4)


def run_default():
    probe = _cpu_probe_sec()
    steal0 = _steal_jiffies()
    _init_ray()
    import ray

    from tabular_data_semantics_py_ray.api import queries as _queries

    qs = _queries()
    # warm-up (untimed): page cache for EVERY input table + worker-process
    # spin-up + actor imports, so no timed query pays first-touch I/O or
    # cluster cold-start (cold-cache runs measured 2-3x slower on the
    # lineitem/orders/embeddings-heavy queries, pure disk noise)
    import glob as _glob

    for f in _glob.glob(os.path.join(SF_DIR, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    _consume(qs["events_by_type"](SF_DIR))
    _consume(qs["kg_cea_link"](SF_DIR))

    def _timed_pass():
        times: dict[str, float] = {}
        triples_rows = 0
        total0 = time.time()
        for name in BENCH_QUERIES:
            t0 = time.time()
            n = _consume(qs[name](SF_DIR))
            times[name] = round(time.time() - t0, 3)
            if name == "kg_triples":
                triples_rows = n
        return times, round(time.time() - total0, 3), triples_rows

    # one bounded retry if hypervisor steal contaminated the timed pass
    # (>5% of box jiffies: identical code has measured 2-2.5x slower in
    # such windows — see BASELINE.md); the retried pass is reported either
    # way, labeled by its own steal telemetry below
    retried = False
    for _attempt in range(2):
        pass_steal0 = _steal_jiffies()
        pass_t0 = time.time()
        times, total, triples_rows = _timed_pass()
        pass_frac = (_steal_jiffies() - pass_steal0) / max(
            1.0, (time.time() - pass_t0) * 100 * (os.cpu_count() or 32))
        if pass_frac <= 0.05:
            break
        retried = True

    # flagship STREAM sink (the scale path measured by --scaling): timed
    # read -> link -> vote -> emit -> durable sorted parquet at this sf
    import shutil as _sh

    import ray.data as _rd

    from tabular_data_semantics_py_ray.pipelines.kg_pipeline import (
        read_stream_result,
        triples_stream_to_parquet,
    )

    sink = "/tmp/graft_bench_stream_sink"
    _sh.rmtree(sink, ignore_errors=True)
    from tabular_data_semantics_py_ray.util import read_parquet_clean

    docs = read_parquet_clean(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    ).repartition(16)
    t0 = time.time()
    triples_stream_to_parquet(docs, sink, concurrency=max(2, (3 * NCPU) // 4))
    stream_sec = round(time.time() - t0, 3)
    stream_rows = read_stream_result(sink).count()

    out = {
        "metric": "headline_pipelines_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "triples_per_sec": round(triples_rows / max(times["kg_triples"], 1e-9), 1),
        "flagship_stream": {
            "sec": stream_sec,
            "triples": stream_rows,
            "triples_per_sec": round(stream_rows / max(stream_sec, 1e-9), 1),
        },
        # interference telemetry: steal > ~10% of elapsed jiffies or a probe
        # far above ~0.25 s marks the reading as hypervisor-noise-affected
        "cpu_probe_sec": probe,
        "steal_jiffies_delta": _steal_jiffies() - steal0,
        "steal_frac_timed_pass": round(pass_frac, 4),
        "steal_retried": retried,
    }
    ray.shutdown()
    print(json.dumps(out))


def run_flagship_once():
    """Scaling-mode worker: flagship pipeline on the replicated corpus.

    Default sink mode ``stream``: the zero-all-to-all parquet sink
    (``triples_stream_to_parquet``) — doc-keyed triples are written sorted
    per partition directly by the linker actors (globally unique by
    construction), the KG-bounded entity-type stream gets a tiny distinct.
    The timed section covers the full read->link->vote->emit->durable-write
    pipeline; the verification count re-reads the sink afterwards (untimed —
    it is a check, not pipeline work). ``GRAFT_SCALE_SINK=materialize``
    keeps the round-1 global distinct+sort path for comparison.
    """
    _init_ray()
    import shutil as _sh

    import ray

    from tabular_data_semantics_py_ray.pipelines.kg_pipeline import (
        read_stream_result,
        triples_from_documents_doclocal,
        triples_stream_to_parquet,
    )

    replicate = int(os.environ.get("GRAFT_SCALE_REPLICATE", "4800"))
    global REPLICATE
    REPLICATE = replicate  # actual corpus multiplier for this mode
    sink_mode = os.environ.get("GRAFT_SCALE_SINK", "stream")
    # GRAFT_SCALE_BACKEND=ingested runs the SAME flagship with the linker
    # pinned to the dump-INGESTED backend tables (kg_ingest output) instead
    # of the in-memory fixture — the dump->backend->triples chain measured
    # end-to-end at scale. The ingest itself is content-addressed in /tmp
    # and shared by both scaling legs (untimed here; timed by --ingest).
    backend = os.environ.get("GRAFT_SCALE_BACKEND") or None
    if backend == "ingested":
        from tabular_data_semantics_py_ray.pipelines.kg_ingest import (
            ensure_ingested_backend,
        )

        ensure_ingested_backend("ingested")
    import ray.data as _rd

    from tabular_data_semantics_py_ray.util import read_parquet_clean as _rpc

    base_count = _rpc(
        os.path.join(SF_DIR, "documents.parquet")).count()  # metadata-only
    n_docs = base_count * replicate
    # ~6k docs per file -> read_parquet yields one ~0.2 s dispatch per file;
    # fine-grained for 32 actors, dispatch overhead <2% of useful work
    n_blocks = max(256, n_docs // 6144)
    if sink_mode == "stream":
        # Stage the replicated corpus to parquet ON DISK once (shared by
        # both cpu legs — identical input layout), then the TIMED pipeline
        # streams read->link->vote->emit->durable-write end-to-end, exactly
        # the 100 TB shape: input from storage, never pinned in the object
        # store.
        input_dir = f"/tmp/graft_scale_input_rep{replicate}"
        marker = os.path.join(input_dir, "_STAGED")
        if not os.path.exists(marker):
            _sh.rmtree(input_dir, ignore_errors=True)
            # ~100k docs per file: read tasks stay small enough to pipeline
            # with the actor pool (8 giant files made the single free read
            # slot the bottleneck at low cpu counts)
            _replicated_documents(replicate).write_parquet(
                input_dir, min_rows_per_file=100_000,
                max_rows_per_file=100_000)
            open(marker, "w").write(str(n_docs))
        from tabular_data_semantics_py_ray.util import read_parquet_clean

        docs = read_parquet_clean(input_dir, columns=["doc_id", "text"])
        # warm-up: tiny run through the same stages pre-starts worker
        # processes and actor imports, so the timed run is steady state
        warm_dir = "/tmp/graft_scale_warm"
        _sh.rmtree(warm_dir, ignore_errors=True)
        triples_stream_to_parquet(docs.limit(2000), warm_dir, concurrency=2,
                                  backend=backend)
        sink = f"/tmp/graft_scale_out_{NCPU}"
        _sh.rmtree(sink, ignore_errors=True)
        t0 = time.time()
        # 3/4 of the CPUs for the linker pool, 1/4 left for the parquet-read
        # tasks feeding it — SAME fraction at both cpu levels so the scaling
        # comparison stays apples-to-apples. A pool sized to ALL cpus
        # deadlocks: the long-lived actors hold every slot and the read
        # operator's tasks can never start.
        triples_stream_to_parquet(
            docs, sink, concurrency=max(2, (3 * NCPU) // 4),
            backend=backend,
        )
        dt = time.time() - t0
        n_triples = read_stream_result(sink).count()  # verification, untimed
    else:
        docs = _replicated_documents(replicate).repartition(
            n_blocks).materialize()
        n_docs = docs.count()
        warm_dir = "/tmp/graft_scale_warm"
        _sh.rmtree(warm_dir, ignore_errors=True)
        triples_stream_to_parquet(docs.limit(2000), warm_dir, concurrency=2)
        sink = f"/tmp/graft_scale_out_{NCPU}"
        _sh.rmtree(sink, ignore_errors=True)
        link_bs = int(os.environ.get(
            "GRAFT_LINK_BS", min(1024, max(256, n_docs // (128 * NCPU)))
        ))
        t0 = time.time()
        pipeline = triples_from_documents_doclocal(
            docs,
            concurrency=max(2, NCPU // 2),  # fixed pool: no autoscale lag
            num_blocks=4 * NCPU,
            link_batch_size=link_bs,
            backend=backend,
        )
        if sink_mode == "parquet":
            import ray.data as _rd

            pipeline.write_parquet(sink)
            from tabular_data_semantics_py_ray.util import \
                read_parquet_clean as _rpc

            n_triples = _rpc(sink).count()
        else:
            out = pipeline.materialize()  # fully parallel consume
            n_triples = out.count()
        dt = time.time() - t0
    ray.shutdown()
    print(json.dumps({
        "num_cpus": NCPU,
        "docs": n_docs,
        "triples": n_triples,
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
        "triples_per_sec": round(n_triples / dt, 1),
        "replicate": replicate,
        "sink": sink_mode,
        "backend": backend or "fixture",
    }))


def run_ingest_scale():
    """KG-ingestion scale stress: the ~1 MB dump replicated into N shard
    files with REWRITTEN noise namespaces (distinct entities/classes per
    shard; labels shared across shards, so lexicon rank windows run over
    N-entity hot groups), then the full parse -> four-table derivation
    timed end-to-end at this process's cpu count.

    ``GRAFT_INGEST_SHARDS`` (default 200): ~200 MB / ~1.5M triples.
    """
    shards = int(os.environ.get("GRAFT_INGEST_SHARDS", "200"))
    stage_dir = f"/tmp/graft_ingest_shards_{shards}"
    marker = os.path.join(stage_dir, "_STAGED")
    if not os.path.exists(marker):
        import shutil as _sh

        _sh.rmtree(stage_dir, ignore_errors=True)
        os.makedirs(stage_dir, exist_ok=True)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tabular_data_semantics_py_ray.kg_dump import dump_path

        with open(dump_path(), encoding="utf-8") as f:
            text = f.read()
        for s in range(shards):
            t = text.replace(
                "example.org/noise/", f"example.org/noise{s:04d}/"
            ).replace(
                "example.org/noise-ontology/", f"example.org/noise-ont{s:04d}/"
            )
            with open(os.path.join(stage_dir, f"shard_{s:04d}.nt"), "w",
                      encoding="utf-8") as f:
                f.write(t)
        open(marker, "w").write(str(shards))

    probe = _cpu_probe_sec()
    steal0 = _steal_jiffies()
    _init_ray()
    import ray

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tabular_data_semantics_py_ray.pipelines.kg_ingest import (
        ingest_backend_tables,
    )

    nt_files = [os.path.join(stage_dir, f) for f in sorted(os.listdir(stage_dir))
                if f.endswith(".nt")]
    total_bytes = sum(os.path.getsize(f) for f in nt_files)
    out_dir = f"/tmp/graft_ingest_out_{NCPU}"
    t0 = time.time()
    paths = ingest_backend_tables(nt_files, out_dir)
    dt = time.time() - t0
    from tabular_data_semantics_py_ray.util import parquet_num_rows

    rows = {k: parquet_num_rows(p) for k, p in paths.items()}
    ray.shutdown()
    print(json.dumps({
        "metric": "kg_ingest_end_to_end",
        "sec": round(dt, 3),
        "shards": shards,
        "input_mb": round(total_bytes / 1e6, 1),
        "mb_per_sec": round(total_bytes / 1e6 / dt, 1),
        "num_cpus": NCPU,
        "table_rows": rows,
        "cpu_probe_sec": probe,
        "steal_jiffies_delta": _steal_jiffies() - steal0,
    }))


def run_scaling():
    """N vs 4N parallelism in fresh processes on the same input.

    Levels default to 4 and 16 (override with GRAFT_SCALE_LO/HI): the box
    has 32 physical cores and pure-CPU multiprocessing itself only scales
    8->32 at ~0.75 efficiency (memory bandwidth), so N=4 vs 4N=16 measures
    the engine's scaling rather than the socket's saturation point.
    """
    lo_n = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi_n = int(os.environ.get("GRAFT_SCALE_HI", str(4 * lo_n)))

    def _steal_frac(window: float) -> float:
        with open("/proc/stat") as f:
            p0 = f.readline().split()
        time.sleep(window)
        with open("/proc/stat") as f:
            p1 = f.readline().split()
        d = sum(int(a) - int(b) for a, b in zip(p1[1:9], p0[1:9]))
        return (int(p1[8]) - int(p0[8])) / max(1, d)

    def run(ncpu: int) -> dict:
        """One leg, steal-gated (see BASELINE.md: this VM has hypervisor
        episodes where identical runs measure 2-5x slower — wall time
        tracks /proc/stat steal monotonically). Bounded: wait up to 120 s
        for a <2% 10 s window, retry the leg ONCE if mid-run steal
        exceeded 3%; always reports the realized steal so a contaminated
        reading is at least labeled."""
        for attempt in range(2):
            waited = 0.0
            try:
                while waited < 120 and _steal_frac(10) >= 0.02:
                    waited += 10
                with open("/proc/stat") as f:
                    pre = f.readline().split()
            except OSError:
                pre = None
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flagship-once"],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if pre is not None:
                with open("/proc/stat") as f:
                    post = f.readline().split()
                d = sum(int(a) - int(b) for a, b in zip(post[1:9], pre[1:9]))
                r["steal_frac"] = round(
                    (int(post[8]) - int(pre[8])) / max(1, d), 4)
                if r["steal_frac"] > 0.03 and attempt == 0:
                    continue  # contaminated window: one retry
            return r
        return r

    lo, hi = run(lo_n), run(hi_n)
    eff = (lo["sec"] / hi["sec"]) / (hi_n / lo_n)
    print(json.dumps({
        "metric": f"scaling_efficiency_{lo_n}_to_{hi_n}",
        "value": round(eff, 3),
        "unit": "ratio",
        f"run_{lo_n}": lo,
        f"run_{hi_n}": hi,
        "sf": SF_DIR,
        "replicate": REPLICATE,
    }))


def run_graph_scale(n_nodes: int = 4_000_000, n_edges: int = 20_000_000):
    """Graph-suite stress: PageRank (5 iters), connected components and
    BFS distances over a deterministic random digraph (seeded numpy,
    string-URI nodes — the engine's actual key type) at 20M edges, far
    past the bench corpus's edge counts but inside the documented
    single-task caps. Prints one JSON line with per-op seconds."""
    import json
    import time

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    _init_ray()
    import ray
    import ray.data as rd

    from tabular_data_semantics_py_ray.pipelines.queries_kg import (
        _bfs_single_task, _pagerank_single_task)
    from tabular_data_semantics_py_ray.stages.dedup import (
        _components_single_task)

    rng = np.random.default_rng(42)
    # preferential-ish skew: target sampling squared -> hot nodes exist
    src = rng.integers(0, n_nodes, n_edges)
    dst = (rng.random(n_edges) ** 2 * n_nodes).astype(np.int64)
    uris = ("http://example.org/resource/E" +
            pd.Series(src).astype(str)).to_numpy()
    uris_d = ("http://example.org/resource/E" +
              pd.Series(dst).astype(str)).to_numpy()
    t = pa.table({"u": uris, "v": uris_d})
    edges = rd.from_arrow(t).materialize()

    def _undirect(b: pa.Table) -> pa.Table:
        u = b.column("u").combine_chunks()
        v = b.column("v").combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([u, v]), pa.concat_arrays([v, u])],
            names=["u", "v"])

    und = edges.map_batches(_undirect, batch_format="pyarrow").materialize()

    out = {"metric": "graph_suite_20m_edges", "unit": "sec",
           "n_edges": n_edges, "n_nodes_target": n_nodes, "ops": {}}
    t0 = time.time()
    pr = _pagerank_single_task(edges, iters=5, damping=0.85)
    n_pr = pr.count()
    out["ops"]["pagerank_5it"] = round(time.time() - t0, 2)
    t0 = time.time()
    cc = _components_single_task(und)
    n_cc = cc.count()
    out["ops"]["components"] = round(time.time() - t0, 2)
    t0 = time.time()
    bfs = _bfs_single_task(und, max_depth=64)
    n_bfs = bfs.count()
    out["ops"]["bfs_distances"] = round(time.time() - t0, 2)
    out["rows"] = {"pagerank": n_pr, "components": n_cc, "bfs": n_bfs}
    print(json.dumps(out))
    ray.shutdown()


def run_reason_scale():
    """Reasoning-at-scale stress: RDFS and OWL-Horst materialization over
    the replicated multi-namespace dump (reuses --ingest-scale's staged
    shards; run that first or this stages them)."""
    shards = int(os.environ.get("GRAFT_INGEST_SHARDS", "400"))
    stage_dir = f"/tmp/graft_ingest_shards_{shards}"
    if not os.path.exists(os.path.join(stage_dir, "_STAGED")):
        run_ingest_scale()

    probe = _cpu_probe_sec()
    steal0 = _steal_jiffies()
    _init_ray()
    import ray

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tabular_data_semantics_py_ray.pipelines.kg_ingest import (
        owl_horst_materialize,
        rdfs_materialize,
        read_ntriples,
    )

    nt_files = [os.path.join(stage_dir, f) for f in sorted(os.listdir(stage_dir))
                if f.endswith(".nt")]
    total_bytes = sum(os.path.getsize(f) for f in nt_files)
    out = {}
    for name, fn in [("rdfs", rdfs_materialize),
                     ("owl_horst", owl_horst_materialize)]:
        t0 = time.time()
        n = fn(read_ntriples(nt_files)).count()
        out[name] = {"sec": round(time.time() - t0, 3), "triples_out": n}
    ray.shutdown()
    print(json.dumps({
        "metric": "reasoning_materialize",
        "shards": shards,
        "input_mb": round(total_bytes / 1e6, 1),
        "num_cpus": NCPU,
        **{f"{k}_{kk}": vv for k, v in out.items() for kk, vv in v.items()},
        "cpu_probe_sec": probe,
        "steal_jiffies_delta": _steal_jiffies() - steal0,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--flagship-once" in sys.argv:
        run_flagship_once()
    elif "--ingest-scale" in sys.argv:
        run_ingest_scale()
    elif "--reason-scale" in sys.argv:
        run_reason_scale()
    elif "--graph-scale" in sys.argv:
        run_graph_scale()
    else:
        run_default()
