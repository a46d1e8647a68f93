"""CLI entry point — the ``ray job submit`` surface of the north rule.

    python -m tabular_data_semantics_py_ray run \
        --sf-dir /root/testdata/sf0.001 --out /tmp/kg_out --partitions 4

Runs the flagship pipeline partition-by-partition with manifest commit;
re-running the same command resumes, skipping committed partitions.
Owns its Ray session (guarded — never re-inits inside a driver session).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tabular_data_semantics_py_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="resumable partitioned graph materialize")
    run.add_argument("--sf-dir", required=True)
    run.add_argument("--out", required=True)
    run.add_argument("--partitions", type=int, default=4)
    run.add_argument("--ntriples", action="store_true",
                     help="also write an N-Triples text copy")

    val = sub.add_parser("validate", help="P/R gate vs sequential oracle")
    val.add_argument("--sf-dir", required=True)
    val.add_argument("--backend", default=None,
                     help="registered KGBackend for the linker; 'ingested' "
                     "ingests the deterministic dump first and validates "
                     "the dump->backend->triples chain")

    ing = sub.add_parser(
        "ingest",
        help="resumable RDF-dump ingestion: N-Triples file(s)/dir -> the "
        "four KGBackend parquet tables (re-running skips committed "
        "macro-partitions)",
    )
    ing.add_argument("--dump", required=True,
                     help="an .nt file, a directory of .nt files, or a "
                     "comma-separated list")
    ing.add_argument("--out", required=True)
    ing.add_argument("--partitions", type=int, default=None)
    ing.add_argument("--materialize", choices=["none", "rdfs", "owl"],
                     default="none",
                     help="also write the entailed graph (RDFS rules, or "
                     "RDFS + OWL-Horst property rules) as parquet")

    st = sub.add_parser(
        "stream",
        help="zero-shuffle streaming flagship over an interleaved corpus "
        "(Lance dataset or parquet; the north-rule input shape)",
    )
    st.add_argument("--corpus", required=True,
                    help="path to the interleaved docs table "
                    "(doc_id:string, spans:list<struct>) — *.lance or parquet")
    st.add_argument("--out", required=True)
    st.add_argument("--actors", type=int, default=4)

    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.use_polars_sort = True

    try:
        if args.cmd == "run":
            from .pipelines.materialize import read_result, run_partitioned
            from .state import manifest as mf

            done = run_partitioned(args.sf_dir, args.out,
                                   num_partitions=args.partitions)
            committed = mf.committed_partitions(args.out)
            total = read_result(args.out).count() if committed else 0
            if args.ntriples:
                from .sources.writers import write_ntriples

                write_ntriples(read_result(args.out), args.out + "_nt")
            print(json.dumps({
                "completed_this_run": done,
                "committed": committed,
                "rows": total,
                "out": args.out,
            }))
        elif args.cmd == "stream":
            from .pipelines.kg_pipeline import (
                read_stream_result,
                triples_stream_to_parquet,
            )
            from .sources.lance_io import read_interleaved_checked

            docs = read_interleaved_checked(args.corpus)
            main_dir, etype_dir = triples_stream_to_parquet(
                docs, args.out,
                concurrency=args.actors,
                pre_interleaved=True,
            )
            print(json.dumps({
                "doc_triples": main_dir,
                "entity_type_triples": etype_dir,
                "rows": read_stream_result(args.out).count(),
            }))
        elif args.cmd == "ingest":
            import os

            from .pipelines.kg_ingest import (
                ingest_backend_tables_resumable,
                owl_horst_materialize,
                rdfs_materialize,
                read_ntriples,
            )
            from .util import parquet_num_rows

            dump = (args.dump.split(",") if "," in args.dump else args.dump)
            paths = ingest_backend_tables_resumable(
                dump, args.out, partitions=args.partitions)
            report = {
                "tables": paths,
                "rows": {k: parquet_num_rows(p) for k, p in paths.items()},
            }
            if args.materialize != "none":
                fn = (rdfs_materialize if args.materialize == "rdfs"
                      else owl_horst_materialize)
                ent_dir = os.path.join(args.out, "entailed_triples.parquet")
                # Ray appends uniquely-named part files without clearing —
                # a re-run (the advertised resumable workflow) would keep
                # stale parts next to new ones and double-count entailed
                # rows. Clear first, exactly like kg_ingest._write.
                import shutil

                if os.path.isdir(ent_dir):
                    shutil.rmtree(ent_dir)
                elif os.path.exists(ent_dir):
                    os.remove(ent_dir)
                ent = fn(read_ntriples(dump))
                ent.write_parquet(ent_dir)
                report["entailed"] = ent_dir
                report["entailed_rows"] = parquet_num_rows(ent_dir)
            print(json.dumps(report))
        elif args.cmd == "validate":
            from .pipelines.validate import validate_flagship

            if args.backend == "ingested":
                from .pipelines.kg_ingest import ensure_ingested_backend

                ensure_ingested_backend("ingested")
            report = validate_flagship(args.sf_dir, backend=args.backend)
            print(json.dumps({k: v for k, v in report.items()
                              if not k.endswith("_sample")}))
            if report["precision"] < 0.95 or report["recall"] < 0.95:
                return 1
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
