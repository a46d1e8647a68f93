"""Flagship end-to-end pipeline: interleaved docs -> sorted triple table.

read -> interleave -> mention_detect (MB, Arrow) -> entity link (actor pool,
pinned lexicon/alias/type tables) -> type voting (two-phase groupby shuffle)
-> triple emit (flat maps) -> blocklist filter -> distinct + sort (final
shuffle) — the stage architecture of SURVEY §7.1. Never calls ray.init().
"""

from __future__ import annotations

import os

import ray
import ray.data as rd

from .. import fixture_kg
from ..stages.canonicalize import join_types_batches, vote_types_from_typed
from ..stages.interleave import interleave
from ..stages.linking import link_entities
from ..stages.mention_detect import detect_mentions
from ..stages.triple_extract import (
    doc_type_triples_batch,
    filter_blocklist,
    materialize_sorted,
    mention_triples_batch,
    type_triples_batch,
)


def read_documents(sf_dir: str, *, partition: tuple[int, int] | None = None, **kwargs):
    """Read the documents table; optionally keep only the shard with
    ``doc_id % n_partitions == partition_id`` (the resumable-materialize
    partitioning key — see pipelines/materialize.py)."""
    blocks = kwargs.pop("blocks", None)
    from ..util import read_parquet_clean

    path = os.path.join(sf_dir, "documents.parquet")
    ds = read_parquet_clean(path, columns=["doc_id", "text"], **kwargs)
    if blocks:
        from ..util import guarded_fanout

        ds = guarded_fanout(ds, path, blocks)
    if partition is not None:
        pid, nparts = partition

        def _shard(t):
            import numpy as np
            import pyarrow as pa

            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % nparts == pid))

        ds = ds.map_batches(_shard, batch_format="pyarrow")
    return ds


def docs_dataset(sf_dir: str, *, partition: tuple[int, int] | None = None):
    """Interleaved docs table per input_hint (doc_id:string, spans:list)."""
    return interleave(read_documents(sf_dir, partition=partition))


def linked_mentions(docs_ds, *, top_k: int = 3, concurrency=(1, 4), project=None,
                    batch_size: int = 4096):
    mentions = detect_mentions(docs_ds)
    return link_entities(mentions, top_k=top_k, concurrency=concurrency,
                         project=project, batch_size=batch_size)


def build_triples(sf_dir: str, *, salt_buckets: int = 0, concurrency=(1, 4),
                  partition: tuple[int, int] | None = None,
                  backend: str | None = None):
    """documents parquet -> distinct, sorted (subj,pred,obj,obj_is_literal).

    Uses the doc-local path (votes finalized inside the linker actors);
    ``triples_from_documents`` keeps the classic shuffle-based path — the
    two are asserted equal in tests/test_doclocal.py. ``backend`` names a
    registered KGBackend (e.g. the dump-ingested one) to link against."""
    return triples_from_documents_doclocal(
        read_documents(sf_dir, partition=partition),
        concurrency=concurrency,
        backend=backend,
    )


def triples_from_documents(documents_ds, *, salt_buckets: int = 0,
                           concurrency=(1, 4), num_blocks: int | None = None,
                           link_batch_size: int = 4096):
    """Core flagship pipeline over an already-read documents Dataset.

    ``num_blocks``: fan the input out to this many blocks first. A small
    parquet arrives as ONE block (128 MiB target), which serializes every
    map stage; size this ~2-4x the worker count so the actor pool and the
    shuffles actually parallelize."""
    if num_blocks:
        documents_ds = documents_ds.repartition(num_blocks)
    docs = interleave(documents_ds)
    # project to the two columns every downstream stage needs (occurrence
    # multiplicity preserved for the vote)
    # batch_size doubles as the actor-dispatch granularity AND the block
    # size of the materialized linked stream: too small floods the driver
    # with dispatches (and 1-block-per-batch downstream tasks), too large
    # starves the pool. Callers scale it with corpus size.
    linked = linked_mentions(docs, concurrency=concurrency,
                             project=("doc_id", "entity_uri"),
                             batch_size=link_batch_size)

    # Three triple streams. `linked` feeds two map lineages plus the voting
    # shuffle; Ray Data re-executes the upstream per consumer, so pin the
    # small linked stream once (it is mention-sized, far smaller than input).
    linked = linked.materialize()
    if num_blocks:
        # the actor stage emits one block per batch; re-fan-out so the three
        # downstream lineages keep the same parallelism as the head
        linked = linked.repartition(num_blocks)

    pairs = linked

    mention_triples = pairs.map_batches(mention_triples_batch, batch_format="pyarrow")

    # ONE type-join pass shared by type-triple emission and the vote
    # (stateless tasks with per-worker cached broadcast table).
    typed = join_types_batches(pairs).materialize()
    entity_type_triples = typed.map_batches(type_triples_batch, batch_format="pyarrow")

    winners = vote_types_from_typed(typed, key="doc_id", salt_buckets=salt_buckets)
    doc_type_triples = winners.map_batches(doc_type_triples_batch, batch_format="pyarrow")

    all_triples = mention_triples.union(entity_type_triples).union(doc_type_triples)
    return materialize_sorted(filter_blocklist(all_triples))


def triples_from_documents_doclocal(documents_ds, *, concurrency=(1, 4),
                                    num_blocks: int | None = None,
                                    link_batch_size: int = 512,
                                    backend: str | None = None):
    """Doc-local flagship: the whole per-document pipeline (interleave ->
    mention detect -> link -> vote finalize) runs in ONE actor stage over
    DOCUMENT batches, so every doc completes inside its batch — the voting
    all-to-all disappears. Remaining wide ops: a tiny (entity,type)
    distinct and the final fused sort+dedupe. ``link_batch_size`` counts
    DOCUMENTS per dispatch (~45 mentions each)."""
    import pyarrow as pa

    from ..stages.linking import DocPipeline, _broadcast
    from ..util import bucket_distinct
    from ..stages.triple_extract import (
        doc_type_triples_batch as _doc_type_batch,
        mention_triples_batch as _mention_batch,
        type_triples_batch as _type_batch,
        filter_blocklist as _filter,
        materialize_sorted as _sorted,
    )

    if num_blocks:
        documents_ds = documents_ds.repartition(num_blocks)

    if backend is not None:
        # named KG backend (state/backends.py) — e.g. one ingested from an
        # RDF dump; the actors pin ITS tables instead of the fixture's
        from ..state.backends import get_backend

        b = get_backend(backend)
        lex, alias, types = b.lexicon(), b.alias_edges(), b.entity_types()
    else:
        lex, alias, types = (fixture_kg.lexicon_df(),
                             fixture_kg.alias_edges_df(),
                             fixture_kg.entity_types_df())
    tagged = documents_ds.map_batches(
        DocPipeline,
        fn_constructor_kwargs={
            "lexicon_ref": _broadcast(lex),
            "alias_ref": _broadcast(alias),
            "types_ref": _broadcast(types),
        },
        batch_format="pyarrow",
        batch_size=link_batch_size,
        concurrency=concurrency,
    ).materialize()

    def _where(kind):
        import pyarrow.compute as pc

        def _f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"), kind))

        return tagged.map_batches(_f, batch_format="pyarrow")

    mention_triples = _where("mention").map_batches(
        lambda t: _mention_batch(
            pa.Table.from_arrays(
                [t.column("doc_id"), t.column("a")], names=["doc_id", "entity_uri"]
            )
        ),
        batch_format="pyarrow",
    )
    win_triples = _where("win").map_batches(
        lambda t: _doc_type_batch(
            pa.Table.from_arrays(
                [t.column("doc_id"), t.column("a")], names=["doc_id", "type_uri"]
            )
        ),
        batch_format="pyarrow",
    )
    etypes = bucket_distinct(
        _where("etype").map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("a"), t.column("b")], names=["entity_uri", "type_uri"]
            ),
            batch_format="pyarrow",
        ),
        ["entity_uri", "type_uri"],
        num_buckets=4,
    )
    etype_triples = etypes.map_batches(_type_batch, batch_format="pandas")

    all_triples = mention_triples.union(win_triples).union(etype_triples)
    return _sorted(_filter(all_triples))


def triples_stream_to_parquet(documents_ds, out_dir: str, *,
                              concurrency=(1, 4),
                              link_batch_size: int | None = None,
                              etype_shuffle: bool | None = None,
                              etype_driver_max: int = 1_000_000,
                              fast: bool = True,
                              pre_interleaved: bool = False,
                              backend: str | None = None) -> tuple[str, str]:
    """Flagship scale path: stream documents -> partitioned sorted parquet
    with ZERO all-to-alls over the doc-keyed triple stream.

    The whole per-document pipeline runs inside ``DocTriples`` actors, which
    write their (globally unique by construction — see the DocTriples
    docstring) mention + doc-type triples directly to ``out_dir/doc_triples``
    sorted per file, and emit only the KG-bounded (entity, type) pairs
    downstream. Union of the two directories equals the
    ``triples_from_documents`` output set (asserted in tests/test_doclocal.py).

    ``link_batch_size=None`` (default) makes each input BLOCK one dispatch —
    zero bundling/slicing; size blocks upstream (repartition) to a few
    thousand docs each.

    Entity-type finalize: after the per-actor memo, the pair stream holds at
    most ``n_actors * |entity_types|`` rows, so for small KGs it is collected
    on the driver (a small-result collect, not a corpus materialize) and
    written as one sorted file. ``etype_shuffle=None`` (default) AUTO-FLIPS
    on the pinned type-table size: a KG with more than ``etype_driver_max``
    (entity, type) rows takes the distributed bucket-distinct path instead —
    the caller no longer has to know their KG is huge. For small KGs the
    driver collect wins because the groupby's fixed all-to-all cost (~10 ms
    per input block plus sampling barriers) dominates the tiny data
    (measured on this box). Pass an explicit bool to override.

    Returns ``(doc_triples_dir, entity_type_triples_dir)``.
    """
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..stages.linking import DocTriples, _broadcast
    from ..stages.triple_extract import type_triples_batch
    from ..util import bucket_distinct

    main_dir = os.path.join(out_dir, "doc_triples")
    etype_dir = os.path.join(out_dir, "entity_type_triples")
    for d in (main_dir, etype_dir):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(main_dir, exist_ok=True)
    os.makedirs(etype_dir, exist_ok=True)

    if fast:
        # Arrow/numpy hot path (see stages/linking_fast.py) — same output;
        # fuses mention detection against the backend's surface set. The
        # classic DocTriples actor below now shares the same integer-key
        # vote kernel (round 5), differing only in the EntityLinker seam.
        # ``pre_interleaved=True`` accepts the input_hint table directly
        # (doc_id:string, spans) instead of deriving spans from raw docs.
        from ..stages.linking_fast import DocTriplesFast

        ctor = {"sink_dir": main_dir, "pre_interleaved": pre_interleaved}
        n_types = len(fixture_kg.entity_types_df())
        if backend is not None:
            # named KG backend (state/backends.py): the actors pin ITS
            # tables instead of the fixture's
            from ..state.backends import get_backend

            b = get_backend(backend)
            ctor.update(lexicon=b.lexicon(), entity_types=b.entity_types(),
                        alias_edges=b.alias_edges())
            n_types = len(ctor["entity_types"])
        pairs = documents_ds.map_batches(
            DocTriplesFast,
            fn_constructor_kwargs=ctor,
            batch_format="pyarrow",
            batch_size=link_batch_size,
            concurrency=concurrency,
        )
    else:
        n_types = len(fixture_kg.entity_types_df())
        pairs = documents_ds.map_batches(
            DocTriples,
            fn_constructor_kwargs={
                "lexicon_ref": _broadcast(fixture_kg.lexicon_df()),
                "alias_ref": _broadcast(fixture_kg.alias_edges_df()),
                "types_ref": _broadcast(fixture_kg.entity_types_df()),
                "sink_dir": main_dir,
            },
            batch_format="pyarrow",
            batch_size=link_batch_size,
            concurrency=concurrency,
        )
    if etype_shuffle is None:
        # auto-flip: a KG whose pinned type table exceeds the driver budget
        # takes the distributed distinct; small KGs take the cheaper collect
        etype_shuffle = n_types > etype_driver_max
    sort_keys = [("subj", "ascending"), ("pred", "ascending"),
                 ("obj", "ascending")]
    if etype_shuffle:
        et = bucket_distinct(pairs, ["entity_uri", "type_uri"], num_buckets=8)
        et.map_batches(
            lambda t: type_triples_batch(t).sort_by(sort_keys),
            batch_format="pyarrow",
        ).write_parquet(etype_dir)
    else:
        rows = pairs.take_all()  # executes the pipeline; KG-bounded result
        df = pd.DataFrame(rows, columns=["entity_uri", "type_uri"])
        df = df.drop_duplicates().reset_index(drop=True).astype("string")
        et_t = type_triples_batch(
            pa.table({"entity_uri": pa.array(df["entity_uri"], type=pa.string()),
                      "type_uri": pa.array(df["type_uri"], type=pa.string())})
        )
        pq.write_table(et_t.sort_by(sort_keys),
                       os.path.join(etype_dir, "part-00000.parquet"))
    return main_dir, etype_dir


def read_stream_result(out_dir: str):
    """Read a ``triples_stream_to_parquet`` output as one Dataset."""
    cols = ["subj", "pred", "obj", "obj_is_literal"]
    from ..util import read_parquet_clean

    main = read_parquet_clean(os.path.join(out_dir, "doc_triples"), columns=cols)
    et = read_parquet_clean(
        os.path.join(out_dir, "entity_type_triples"), columns=cols)
    return main.union(et)
