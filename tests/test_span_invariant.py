"""The north-rule invariant: per-row span-sequence equality
(kind, text, media_ref, order) must hold through every stage that carries
the docs stream (BASELINE.md 'Invariant' row)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from tabular_data_semantics_py_ray.pipelines.kg_pipeline import docs_dataset


def _span_key(df: pd.DataFrame) -> dict:
    out = {}
    for r in df.itertuples(index=False):
        out[r.doc_id] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r.spans
        ]
    return out


def test_spans_survive_annotation_stage(sf_small):
    docs = docs_dataset(sf_small)
    before = _span_key(docs.to_pandas())

    # a doc-carrying stage: annotate with a mention count, spans untouched
    def annotate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        n = pc.list_value_length(spans)
        return t.append_column("n_spans", n)

    after_ds = docs.map_batches(annotate, batch_format="pyarrow")
    after_df = after_ds.to_pandas()
    after = _span_key(after_df)

    assert before.keys() == after.keys()
    assert before == after, "span sequences changed through annotation stage"
    # spot-check: media spans are opaque and ordered by offset
    for seq in after.values():
        offsets = [s[3] for s in seq]
        assert offsets == sorted(offsets)


def test_docs_cover_all_documents(sf_small):
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_small}/documents.parquet").metadata.num_rows
    assert docs_dataset(sf_small).count() == n_docs


def test_explode_reassemble_round_trip(sf_small):
    """Explode spans to rows keyed (doc_id, span_idx) and reassemble —
    the pattern any span-rewriting stage must use — and prove bit-equality."""
    docs = docs_dataset(sf_small)
    before = _span_key(docs.to_pandas())

    def explode(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = pc.list_flatten(spans)
        offs = spans.offsets.to_numpy(zero_copy_only=False)
        idx = (
            np.arange(len(flat), dtype=np.int64)
            + offs[0]
            - offs[parent.to_numpy(zero_copy_only=False)]
        )
        return pa.Table.from_arrays(
            [
                pc.take(t.column("doc_id"), parent),
                pa.array(idx.astype("int32")),
                flat.field("kind"),
                flat.field("text"),
                flat.field("media_ref"),
                flat.field("offset"),
            ],
            names=["doc_id", "span_idx", "kind", "text", "media_ref", "offset"],
        )

    exploded = docs.map_batches(explode, batch_format="pyarrow").to_pandas()
    reassembled = {}
    for doc_id, g in exploded.groupby("doc_id"):
        g = g.sort_values("span_idx")
        reassembled[doc_id] = list(
            zip(g["kind"], g["text"], g["media_ref"], g["offset"])
        )
    # docs with zero spans vanish on explode; they must keep empty lists
    for d, seq in before.items():
        assert reassembled.get(d, []) == seq
