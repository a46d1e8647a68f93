"""Resumable partitioned graph materialize.

The flagship pipeline runs once per macro-partition (``doc_id % P``); each
partition writes its sorted triple parquet to a temp dir, atomically renames
it into ``out_dir/part=<p>/``, then commits a manifest with lineage +
metrics. A killed run resumes by skipping committed partitions (the
reference's skip-if-output-exists resume made transactional,
oaei/dbpedia_fragment.py:712-716).

At 100 TB the same layout holds: P sized so one partition's shuffle state
fits the cluster (e.g. P=64 macro-partitions of ~1.5 TB), each internally
parallel across all nodes; the manifest directory is the only coordination
point and is tiny.
"""

from __future__ import annotations

import os
import shutil

import ray.data as rd

from ..state import manifest as mf
from .kg_pipeline import build_triples


def run_partitioned(
    sf_dir: str,
    out_dir: str,
    *,
    num_partitions: int = 4,
    max_partitions_this_run: int | None = None,
    salt_buckets: int = 0,
    sink: str = "stream",
) -> list[int]:
    """Run the flagship pipeline partition-by-partition with resume.

    Returns the list of partitions completed by THIS run (committed ones are
    skipped). ``max_partitions_this_run`` exists for the kill-resume test —
    it simulates a run dying after N partitions.

    ``sink="stream"`` (default) runs each partition through the
    zero-all-to-all streaming sink (``triples_stream_to_parquet``) — the
    scale path, with per-partition-distinct set semantics (doc-keyed
    triples globally unique; entity-type triples may repeat across
    partitions, see ``read_result``). ``sink="sorted"`` keeps the
    globally-distinct+sorted per-partition materialize.
    """
    from .kg_pipeline import read_documents, triples_stream_to_parquet

    os.makedirs(out_dir, exist_ok=True)
    done_now: list[int] = []
    for p in range(num_partitions):
        if mf.is_committed(out_dir, p):
            continue
        if max_partitions_this_run is not None and len(done_now) >= max_partitions_this_run:
            break
        pdir = mf.partition_dir(out_dir, p)
        tmp = pdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)  # stale half-write from a kill
        if sink == "stream":
            triples_stream_to_parquet(
                read_documents(sf_dir, partition=(p, num_partitions)), tmp
            )
        else:
            triples = build_triples(
                sf_dir, partition=(p, num_partitions), salt_buckets=salt_buckets
            )
            triples.write_parquet(tmp)

        # metrics from the written files (what's on disk is what's committed)
        import pyarrow.dataset as pads

        written = pads.dataset(tmp, format="parquet")
        rows = 0
        content_hash = 0
        for batch in written.to_batches(columns=["subj", "pred", "obj"]):
            rows += batch.num_rows
            keys = (
                batch.column(0).to_pylist(),
                batch.column(1).to_pylist(),
                batch.column(2).to_pylist(),
            )
            content_hash = mf.rows_hash_update(
                content_hash, ("\t".join(t) for t in zip(*keys))
            )

        shutil.rmtree(pdir, ignore_errors=True)
        os.replace(tmp, pdir)
        mf.commit(
            out_dir,
            p,
            rows=rows,
            content_hash=content_hash,
            lineage={
                "input": os.path.join(sf_dir, "documents.parquet"),
                "filter": f"doc_id % {num_partitions} == {p}",
                "pipeline": ("kg_pipeline.triples_stream_to_parquet"
                             if sink == "stream" else
                             "kg_pipeline.build_triples"),
            },
        )
        done_now.append(p)
    return done_now


def read_result(out_dir: str):
    """Union of all committed partitions as one Dataset (explicit file list:
    only committed partitions are visible, half-written ones never are).

    Set semantics are per-partition: doc-keyed triples are globally unique
    (a doc lives in exactly one partition), but entity-level rdf:type
    triples can repeat across partitions — same as the reference's
    one-rdflib-graph-per-table outputs (oaei/tabular2rdf.py:344-352).
    Apply ``distinct_triples`` on read when global set semantics are
    needed."""
    files = []
    for p in mf.committed_partitions(out_dir):
        pdir = mf.partition_dir(out_dir, p)
        for root, _dirs, names in sorted(os.walk(pdir)):
            files.extend(
                os.path.join(root, f) for f in sorted(names)
                if f.endswith(".parquet")
            )
    # explicit columns: dir names are hive-style (part=NNNNN) and pyarrow
    # would otherwise add an inferred 'part' partition column
    from ..util import read_parquet_clean

    return read_parquet_clean(
        files, columns=["subj", "pred", "obj", "obj_is_literal"])
