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
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"], **kwargs
    )
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
                  partition: tuple[int, int] | None = None):
    """documents parquet -> distinct, sorted (subj,pred,obj,obj_is_literal).

    Uses the doc-local path (votes finalized inside the linker actors);
    ``triples_from_documents`` keeps the classic shuffle-based path — the
    two are asserted equal in tests/test_doclocal.py."""
    return triples_from_documents_doclocal(
        read_documents(sf_dir, partition=partition),
        concurrency=concurrency,
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
                                    link_batch_size: int = 512):
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

    tagged = documents_ds.map_batches(
        DocPipeline,
        fn_constructor_kwargs={
            "lexicon_ref": _broadcast(fixture_kg.lexicon_df()),
            "alias_ref": _broadcast(fixture_kg.alias_edges_df()),
            "types_ref": _broadcast(fixture_kg.entity_types_df()),
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
