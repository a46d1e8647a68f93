"""Mention detection — stateless ``map_batches`` over zero-copy Arrow.

The reference normalizes each cell and emits lookup items per mention
(kg/dbpedia.py:19-31,59-70, operator M1 in SURVEY §2.2). Here the unit is a
token inside a kind=='text' span; a token is a mention iff it appears in the
fixture lexicon's surface-form set and is not a stopword. Fully vectorized:
list flatten + parent indices + ``pc.is_in`` — no Python loop over rows.

The docs stream itself (with its ``spans`` column) is never mutated here:
mentions are a *derived* stream keyed (doc_id, span_idx, tok_idx), so the
span-sequence invariant holds trivially for the carrier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constants import STOPWORDS
from ..fixture_kg import LEXICON
from ..schemas import MENTIONS_SCHEMA

_SURFACE_FORMS = sorted({s for s, _, _ in LEXICON} - set(STOPWORDS))


def detect_mentions_batch(batch: pa.Table,
                          surface_forms: pa.Array | None = None) -> pa.Table:
    """docs(doc_id, spans) -> mentions(doc_id, span_idx, tok_idx, mention).

    ``surface_forms`` overrides the fixture lexicon's surface set (backend
    pluggability, state/backends.py)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    doc_ids = batch.column("doc_id")

    # Explode spans: one row per span, remembering (row, position-in-list).
    span_parent = pc.list_parent_indices(spans)  # row index per span
    flat_spans = pc.list_flatten(spans)
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    # flattened index i == absolute values index i + offsets[0] (slices).
    span_idx_all = (
        np.arange(len(flat_spans), dtype=np.int64)
        + offsets[0]
        - offsets[span_parent.to_numpy(zero_copy_only=False)]
    )

    kinds = flat_spans.field("kind")
    texts = flat_spans.field("text")
    is_text = pc.equal(kinds, "text")

    # Tokenize text spans (single-space separated by construction).
    toks = pc.split_pattern(pc.if_else(is_text, texts, ""), " ")
    tok_parent = pc.list_parent_indices(toks)  # span index per token
    flat_toks = pc.list_flatten(toks)
    tok_offsets = toks.offsets.to_numpy(zero_copy_only=False)
    tok_parent_np = tok_parent.to_numpy(zero_copy_only=False)
    tok_idx_all = (
        np.arange(len(flat_toks), dtype=np.int64)
        + tok_offsets[0]
        - tok_offsets[tok_parent_np]
    )

    vs = surface_forms if surface_forms is not None else pa.array(_SURFACE_FORMS)
    keep = pc.is_in(flat_toks, value_set=vs)
    keep_np = keep.to_numpy(zero_copy_only=False)
    sel = np.nonzero(keep_np)[0]

    span_of_tok = tok_parent_np[sel]
    out = pa.Table.from_arrays(
        [
            pc.take(doc_ids, pa.array(span_parent.to_numpy(zero_copy_only=False)[span_of_tok])),
            pa.array(span_idx_all[span_of_tok].astype(np.int32)),
            pa.array(tok_idx_all[sel].astype(np.int32)),
            flat_toks.take(pa.array(sel)),
        ],
        schema=MENTIONS_SCHEMA,
    )
    return out


def detect_mentions(docs_ds):
    return docs_ds.map_batches(detect_mentions_batch, batch_format="pyarrow")


def detect_mentions_flat_batch(batch: pa.Table) -> pa.Table:
    """Flat variant over raw documents(doc_id:int64, text) — one row per
    token occurrence that is a lexicon surface form. Used by the oracle-
    checked CEA queries where DuckDB ``unnest(string_split(...))`` is the
    equivalent SQL."""
    texts = batch.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    doc_ids = batch.column("doc_id")
    toks = pc.split_pattern(texts, " ")
    parent = pc.list_parent_indices(toks)
    flat = pc.list_flatten(toks)
    keep = pc.is_in(flat, value_set=pa.array(_SURFACE_FORMS))
    sel = pa.array(np.nonzero(keep.to_numpy(zero_copy_only=False))[0])
    return pa.Table.from_arrays(
        [pc.take(doc_ids, pc.take(parent, sel)), flat.take(sel)],
        names=["doc_id", "mention"],
    )
