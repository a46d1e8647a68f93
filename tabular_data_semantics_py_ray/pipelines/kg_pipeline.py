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
from ..stages.canonicalize import TypeJoiner, vote_types
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


def linked_mentions(docs_ds, *, top_k: int = 3, concurrency=(1, 4)):
    mentions = detect_mentions(docs_ds)
    return link_entities(mentions, top_k=top_k, concurrency=concurrency)


def build_triples(sf_dir: str, *, salt_buckets: int = 0, concurrency=(1, 4),
                  partition: tuple[int, int] | None = None):
    """documents parquet -> distinct, sorted (subj,pred,obj,obj_is_literal)."""
    return triples_from_documents(
        read_documents(sf_dir, partition=partition),
        salt_buckets=salt_buckets,
        concurrency=concurrency,
    )


def triples_from_documents(documents_ds, *, salt_buckets: int = 0,
                           concurrency=(1, 4)):
    """Core flagship pipeline over an already-read documents Dataset."""
    docs = interleave(documents_ds)
    linked = linked_mentions(docs, concurrency=concurrency)

    # Three triple streams. `linked` feeds two map lineages plus the voting
    # shuffle; Ray Data re-executes the upstream per consumer, so pin the
    # small linked stream once (it is mention-sized, far smaller than input).
    linked = linked.materialize()

    mention_triples = linked.map_batches(mention_triples_batch, batch_format="pandas")

    types_ref = ray.put(fixture_kg.entity_types_df())
    typed = linked.map_batches(
        TypeJoiner,
        fn_constructor_kwargs={"types_ref": types_ref},
        batch_format="pandas",
        concurrency=(1, 2),
    )
    entity_type_triples = typed.map_batches(type_triples_batch, batch_format="pandas")

    winners = vote_types(linked, key="doc_id", salt_buckets=salt_buckets)
    doc_type_triples = winners.map_batches(doc_type_triples_batch, batch_format="pandas")

    all_triples = mention_triples.union(entity_type_triples).union(doc_type_triples)
    return materialize_sorted(filter_blocklist(all_triples))
