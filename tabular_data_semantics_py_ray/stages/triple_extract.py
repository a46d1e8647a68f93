"""Graph materialize: emit (subj, pred, obj) Arrow triples, distinct + sorted.

~ the reference's row->triple emitters (oaei/tabular2rdf.py:139-172, M14/M15)
and rdflib Graph set semantics (D5), plus the north rule's sorted
materialize (T8). The predicate blocklist (kg/entity.py:37-60, M6) is
applied as a vectorized filter.

All emitters are zero-Python-loop Arrow kernels: distinct via
``Table.group_by`` (C++ hash aggregation), string minting via
``binary_join_element_wise``, constant columns via broadcast ``take``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..constants import AVOID_PREDICATES, DOC, MENTIONS_PRED, RDF_TYPE
from ..schemas import TRIPLES_SCHEMA


def _const_str(value: str, n: int) -> pa.Array:
    """Broadcast one string to n rows without n Python objects."""
    return pa.array([value]).take(pa.array(np.zeros(n, dtype=np.int32)))


def _assemble(subj: pa.Array, pred: str, obj: pa.Array, literal: bool) -> pa.Table:
    n = len(subj)
    return pa.Table.from_arrays(
        [
            subj.cast(pa.string()),
            _const_str(pred, n),
            obj.cast(pa.string()),
            pa.array(np.full(n, literal, dtype=bool)),
        ],
        schema=TRIPLES_SCHEMA,
    )


def _distinct_rows(t: pa.Table, keys: list[str]) -> pa.Table:
    """Arrow C++ hash-distinct on the key columns."""
    return t.select(keys).group_by(keys, use_threads=False).aggregate([])


def _doc_uri(doc_ids: pa.Array) -> pa.Array:
    return pc.binary_join_element_wise(
        pa.scalar(DOC), doc_ids.cast(pa.string()), pa.scalar("")
    )


def mention_triples_batch(batch) -> pa.Table:
    """(doc_id, entity_uri) pairs -> (doc uri, ont:mentions, entity) triples,
    deduped per batch (global distinct happens at materialize)."""
    if isinstance(batch, pd.DataFrame):
        batch = pa.Table.from_pandas(batch, preserve_index=False).replace_schema_metadata(None)
    d = _distinct_rows(batch, ["doc_id", "entity_uri"])
    return _assemble(
        _doc_uri(d.column("doc_id").combine_chunks()),
        MENTIONS_PRED,
        d.column("entity_uri").combine_chunks(),
        False,
    )


def type_triples_batch(typed) -> pa.Table:
    """rows with (entity_uri, type_uri) -> rdf:type triples, batch-deduped."""
    if isinstance(typed, pd.DataFrame):
        typed = pa.Table.from_pandas(typed, preserve_index=False).replace_schema_metadata(None)
    d = _distinct_rows(typed, ["entity_uri", "type_uri"])
    return _assemble(
        d.column("entity_uri").combine_chunks(),
        RDF_TYPE,
        d.column("type_uri").combine_chunks(),
        False,
    )


def doc_type_triples_batch(winners, key: str = "doc_id") -> pa.Table:
    """per-doc winning type -> (doc uri, rdf:type, type) triples."""
    if isinstance(winners, pd.DataFrame):
        winners = pa.Table.from_pandas(winners, preserve_index=False).replace_schema_metadata(None)
    return _assemble(
        _doc_uri(winners.column(key).combine_chunks()),
        RDF_TYPE,
        winners.column("type_uri").combine_chunks(),
        False,
    )


def filter_blocklist(triples_ds):
    """M6: drop triples whose predicate is in the avoid list (vectorized)."""
    block = pa.array(sorted(AVOID_PREDICATES))

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t.column("pred"), value_set=block)))

    return triples_ds.map_batches(_f, batch_format="pyarrow")


def distinct_triples(triples_ds, *, num_buckets: int | None = None):
    """D5: global set semantics. Arrow-native bucket distinct: per-batch
    C++ hash-distinct (combiner), bucket key from a cheap per-row hash of
    subj (identical rows always share a bucket), then one distinct per
    bucket. No pandas round-trip, no per-key Python."""
    from ..util import adaptive_buckets

    num_buckets = num_buckets or adaptive_buckets()
    keys = ["subj", "pred", "obj", "obj_is_literal"]

    def _tag(t: pa.Table) -> pa.Table:
        d = t.group_by(keys, use_threads=False).aggregate([])
        d = d.select(keys)  # canonical column order
        # row-identity bucket: arrow has no row-hash kernel, so hash the
        # (subj, obj) strings via numpy over their utf8 bytes' crc — use
        # pandas' fast vectorized hash only on the two id columns
        h = pd.util.hash_array(
            (pc.binary_join_element_wise(
                d.column("subj").combine_chunks(),
                d.column("obj").combine_chunks(),
                pa.scalar("\x1f"),
            )).to_numpy(zero_copy_only=False)
        )
        return d.append_column("_b", pa.array((h % num_buckets).astype(np.int64)))

    def _final(g: pa.Table) -> pa.Table:
        return g.group_by(keys, use_threads=False).aggregate([]).select(keys)

    tagged = triples_ds.map_batches(_tag, batch_format="pyarrow")
    return tagged.groupby("_b").map_groups(_final, batch_format="pyarrow")


def materialize_sorted(triples_ds):
    """T8 + D5 fused: ONE all-to-all instead of two.

    Global sort on (subj, pred, obj, obj_is_literal) makes duplicate rows
    adjacent — even across block boundaries, because the range partitioner
    keeps key order across blocks. So distinct becomes: per-batch combiner
    dedupe -> global sort -> per-block consecutive dedupe -> drop each
    block's leading rows that equal the previous block's last row (the only
    place duplicates can survive). The boundary fix is the one spot the
    Dataset API can't express, so it uses block refs + one tiny Ray task
    per block (documented SURVEY §7.3 escape hatch).
    """
    import ray
    import ray.data as rd

    keys = ["subj", "pred", "obj", "obj_is_literal"]

    def _combine(t: pa.Table) -> pa.Table:
        return t.group_by(keys, use_threads=False).aggregate([]).select(keys)

    combined = triples_ds.map_batches(_combine, batch_format="pyarrow")
    sorted_ds = combined.sort(keys).materialize()

    @ray.remote
    def _dedupe_block(block: pa.Table, prev_last) -> pa.Table:
        # Ray's sort shuffle routes through pandas blocks; their Arrow
        # conversion attaches a pandas metadata dict that is unhashable,
        # so every downstream schema-unify logs "Failed to hash the
        # schemas". Strip it here — the last producer of these blocks.
        block = block.replace_schema_metadata(None)
        n = block.num_rows
        if n == 0:
            return block
        import numpy as np

        keep = np.ones(n, dtype=bool)
        if n > 1:
            dup = np.ones(n - 1, dtype=bool)
            for k in keys:
                c = block.column(k).combine_chunks()
                eq = pc.equal(c.slice(1), c.slice(0, n - 1))
                dup &= eq.to_numpy(zero_copy_only=False)
            keep[1:] = ~dup
        if prev_last is not None:
            first = [block.column(k)[0].as_py() for k in keys]
            if first == list(prev_last):
                keep[0] = False
        return block.filter(pa.array(keep))

    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _last_row(block: pa.Table):
        if block.num_rows == 0:
            return None
        return [block.column(k)[-1].as_py() for k in keys]

    lasts = ray.get([_last_row.remote(r) for r in refs])
    # previous non-empty block's last row for each block
    prev = [None] * len(refs)
    carry = None
    for i in range(len(refs)):
        prev[i] = carry
        if lasts[i] is not None:
            carry = lasts[i]
    out_refs = [_dedupe_block.remote(r, p) for r, p in zip(refs, prev)]
    return rd.from_arrow_refs(out_refs)
