"""Derive the interleaved text+media document table (input_hint shape) from
the flat ``documents`` parquet — deterministically, no RNG.

Rule (fixed; replicated by the ``media_manifest`` oracle SQL):
- tokens = text.split(' '); text spans = consecutive chunks of
  ``SPAN_TOKENS`` (=12) tokens, ``offset`` = running item index.
- after text chunk ``i`` of doc ``d``, iff ``(d + i) % 4 == 0`` a media span
  is interleaved: kind = 'image' if i%2==0 else 'audio',
  media_ref = 'media://{d}/{i}', consuming one item slot (offsets stay
  strictly increasing int32).

Media spans are opaque to annotation — only kind=='text' spans feed mention
detection (FIXTURES.md §1) — and per-row span-sequence equality
(kind, text, media_ref, order) is the invariant every downstream stage
must preserve.
"""

from __future__ import annotations

import pyarrow as pa

from ..constants import SPAN_TOKENS
from ..schemas import DOCS_SCHEMA


def doc_uri_id(doc_num: int) -> str:
    return f"doc-{doc_num:06d}"


def spans_for_text(doc_num: int, text: str) -> list[dict]:
    spans: list[dict] = []
    if not text:
        return spans
    tokens = text.split(" ")
    offset = 0
    for i in range(0, (len(tokens) + SPAN_TOKENS - 1) // SPAN_TOKENS):
        chunk = tokens[i * SPAN_TOKENS : (i + 1) * SPAN_TOKENS]
        spans.append(
            {"kind": "text", "text": " ".join(chunk), "media_ref": "", "offset": offset}
        )
        offset += len(chunk)
        if (doc_num + i) % 4 == 0:
            spans.append(
                {
                    "kind": "image" if i % 2 == 0 else "audio",
                    "text": "",
                    "media_ref": f"media://{doc_num}/{i}",
                    "offset": offset,
                }
            )
            offset += 1
    return spans


def interleave_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id:int64, text:string, ...) -> docs(doc_id:string, spans)."""
    doc_nums = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    doc_ids = [doc_uri_id(d) for d in doc_nums]
    spans = [spans_for_text(d, t) for d, t in zip(doc_nums, texts)]
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(spans, type=DOCS_SCHEMA.field("spans").type),
        ],
        schema=DOCS_SCHEMA,
    )


def interleave(documents_ds):
    """Ray Dataset of raw documents -> interleaved docs Dataset."""
    return documents_ds.map_batches(interleave_batch, batch_format="pyarrow")
