"""Explicit Arrow schemas per stage (replaces the reference's
by-convention positional CSV, test/challenge_utils.py:44-45)."""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# Primary input (BASELINE.json input_hint): interleaved text+media documents.
DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

MENTIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("tok_idx", pa.int32()),
        ("mention", pa.string()),
    ]
)

CANDIDATES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("tok_idx", pa.int32()),
        ("mention", pa.string()),
        ("entity_uri", pa.string()),
        ("rank", pa.int32()),
    ]
)

LINKED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("tok_idx", pa.int32()),
        ("mention", pa.string()),
        ("entity_uri", pa.string()),  # canonical, post-redirect
    ]
)

# Pipeline sink schema (SURVEY §1.1 'Triple').
TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_literal", pa.bool_()),
    ]
)
