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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constants import SPAN_TOKENS
from ..schemas import DOCS_SCHEMA, SPAN_STRUCT


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


def interleave_batch_rows(batch: pa.Table) -> pa.Table:
    """Scalar reference implementation (kept for parity tests only)."""
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


def _doc_id_strs(doc_nums: pa.Array) -> pa.Array:
    """'doc-' || zero-padded id. ``utf8_lpad`` pads without truncating, so
    ids >= 1e6 (the bench's replication offsets) keep all their digits —
    matching the scalar f'{d:06d}'."""
    padded = pc.utf8_lpad(doc_nums.cast(pa.string()), width=6, padding="0")
    return pc.binary_join_element_wise(pa.scalar("doc-"), padded, pa.scalar(""))


def interleave_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id:int64, text:string, ...) -> docs(doc_id:string, spans).

    Fully vectorized: the span list-of-struct column is assembled from token
    offsets with Arrow kernels + numpy index arithmetic — no per-document
    Python (this runs inside the flagship actor's hot path). Equality with
    the scalar ``spans_for_text`` is asserted in tests/test_stages_unit.py.
    """
    doc_col = batch.column("doc_id").combine_chunks() if isinstance(
        batch.column("doc_id"), pa.ChunkedArray) else batch.column("doc_id")
    texts = batch.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    d = doc_col.to_numpy(zero_copy_only=False).astype(np.int64)
    ndocs = len(d)
    W = SPAN_TOKENS

    toks = pc.split_pattern(texts, " ")
    flat_toks = pc.list_flatten(toks)
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]  # normalized to flat_toks coordinates
    nt = np.diff(off)  # tokens per doc ('' splits to [''] -> nt=1)
    is_empty = pc.equal(texts, "").to_numpy(zero_copy_only=False)

    # -- text chunks (empty docs get one provisional chunk, dropped below, so
    #    chunk boundaries stay contiguous over the flat token array) --------
    nch = (nt + W - 1) // W  # >= 1 everywhere
    C = int(nch.sum())
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), nch)
    first = np.concatenate(([0], np.cumsum(nch)[:-1]))
    c_idx = np.arange(C, dtype=np.int64) - first[doc_of]

    chunk_starts = off[doc_of] + W * c_idx
    chunk_offsets = np.append(chunk_starts, off[-1]).astype(np.int32)
    chunk_text = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(chunk_offsets), flat_toks), " "
    )
    chunk_len = np.minimum(W, nt[doc_of] - W * c_idx)

    dd = d[doc_of]
    has_media = (dd + c_idx) % 4 == 0
    # medias interleaved before chunk c of doc d: count of i in [0,c) with
    # i === (-d) mod 4
    r = (-dd) % 4
    mb = np.where(c_idx > r, (c_idx - 1 - r) // 4 + 1, 0)

    offset_text = W * c_idx + mb
    offset_media = offset_text + chunk_len
    pos_text = c_idx + mb  # item index of chunk c within its doc
    pos_media = pos_text + 1

    keep = ~is_empty[doc_of]
    keep_media = keep & has_media

    # -- per-doc span counts & list offsets --------------------------------
    n_chunks = np.where(is_empty, 0, nch)
    # medias per doc = medias-before formula evaluated at c = n_chunks
    r_doc = (-d) % 4
    n_media = np.where(n_chunks > r_doc, (n_chunks - 1 - r_doc) // 4 + 1, 0)
    n_spans = n_chunks + n_media
    span_start = np.concatenate(([0], np.cumsum(n_spans)[:-1]))
    S = int(n_spans.sum())

    # -- scatter chunk + media spans into doc-major order ------------------
    tgt_text = span_start[doc_of[keep]] + pos_text[keep]
    tgt_media = span_start[doc_of[keep_media]] + pos_media[keep_media]

    ck = int(keep.sum())
    kept_sel = pa.array(np.nonzero(keep)[0])
    media_sel = pa.array(np.nonzero(keep_media)[0])
    empty_str = pa.nulls(len(tgt_media), pa.string()).fill_null("")

    c_media = c_idx[keep_media]
    media_kind = pc.if_else(
        pa.array(c_media % 2 == 0), pa.scalar("image"), pa.scalar("audio")
    )
    media_ref = pc.binary_join_element_wise(
        pa.scalar("media://"),
        pa.array(dd[keep_media].astype(str)),
        pa.scalar("/"),
        pa.array(c_media.astype(str)),
        pa.scalar(""),
    )

    kind_src = pa.concat_arrays([
        pa.array(["text"]).take(pa.array(np.zeros(ck, dtype=np.int32))),
        media_kind.cast(pa.string()),
    ])
    text_src = pa.concat_arrays([chunk_text.take(kept_sel).cast(pa.string()),
                                 empty_str])
    ref_src = pa.concat_arrays([
        pa.nulls(ck, pa.string()).fill_null(""), media_ref.cast(pa.string())
    ])
    offset_src = np.concatenate([offset_text[keep], offset_media[keep_media]])
    tgt = np.concatenate([tgt_text, tgt_media])

    perm = np.empty(S, dtype=np.int64)
    perm[tgt] = np.arange(S, dtype=np.int64)
    perm_a = pa.array(perm)

    offsets_out = np.empty(S, dtype=np.int32)
    offsets_out[tgt] = offset_src.astype(np.int32)

    struct = pa.StructArray.from_arrays(
        [
            kind_src.take(perm_a),
            text_src.take(perm_a),
            ref_src.take(perm_a),
            pa.array(offsets_out),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(n_spans))).astype(np.int32)),
        struct,
    )
    return pa.Table.from_arrays([_doc_id_strs(doc_col), spans], schema=DOCS_SCHEMA)


def interleave(documents_ds):
    """Ray Dataset of raw documents -> interleaved docs Dataset."""
    return documents_ds.map_batches(interleave_batch, batch_format="pyarrow")
