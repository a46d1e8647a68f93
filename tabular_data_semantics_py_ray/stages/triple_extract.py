"""Graph materialize: emit (subj, pred, obj) Arrow triples, distinct + sorted.

~ the reference's row->triple emitters (oaei/tabular2rdf.py:139-172, M14/M15)
and rdflib Graph set semantics (D5), plus the north rule's sorted
materialize (T8). The predicate blocklist (kg/entity.py:37-60, M6) is
applied as a vectorized filter.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..constants import AVOID_PREDICATES, DOC, MENTIONS_PRED, RDF_TYPE
from ..schemas import TRIPLES_SCHEMA


def _triples_table(subj, pred, obj, literal=False) -> pa.Table:
    n = len(subj)
    return pa.Table.from_arrays(
        [
            pa.array(subj, type=pa.string()),
            pa.array(pred, type=pa.string()) if not isinstance(pred, str) else pa.array([pred] * n),
            pa.array(obj, type=pa.string()),
            pa.array([literal] * n, type=pa.bool_()),
        ],
        schema=TRIPLES_SCHEMA,
    )


def mention_triples_batch(batch: pd.DataFrame) -> pa.Table:
    """linked mentions -> (doc uri, ont:mentions, entity) + (entity, rdf:type,
    type) triples. Per-batch dedup keeps the later global distinct small."""
    b = batch.drop_duplicates(subset=["doc_id", "entity_uri"])
    doc_uris = (DOC + b["doc_id"].astype(str)).tolist()
    t = _triples_table(doc_uris, MENTIONS_PRED, b["entity_uri"].tolist())
    return t


def type_triples_batch(typed: pd.DataFrame) -> pa.Table:
    """(entity_uri, type_uri) rows -> rdf:type triples."""
    b = typed.drop_duplicates(subset=["entity_uri", "type_uri"])
    return _triples_table(b["entity_uri"].tolist(), RDF_TYPE, b["type_uri"].tolist())


def doc_type_triples_batch(winners: pd.DataFrame, key: str = "doc_id") -> pa.Table:
    """per-doc winning type -> (doc uri, rdf:type, type) triples."""
    doc_uris = (DOC + winners[key].astype(str)).tolist()
    return _triples_table(doc_uris, RDF_TYPE, winners["type_uri"].tolist())


def filter_blocklist(triples_ds):
    """M6: drop triples whose predicate is in the avoid list (vectorized)."""
    block = pa.array(sorted(AVOID_PREDICATES))

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t.column("pred"), value_set=block)))

    return triples_ds.map_batches(_f, batch_format="pyarrow")


def distinct_triples(triples_ds):
    """D5: global set semantics via bucket-hash distinct — per-batch dedupe
    combiner, then one vectorized drop_duplicates per bucket (never a
    per-key Python reduction; see util.bucket_distinct)."""
    from ..util import bucket_distinct

    return bucket_distinct(triples_ds, ["subj", "pred", "obj", "obj_is_literal"])


def materialize_sorted(triples_ds):
    """T8: final sorted graph materialize."""
    return distinct_triples(triples_ds).sort(["subj", "pred", "obj"])
