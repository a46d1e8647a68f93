"""Multimodal span processing: media spans as opaque refs/bytes with typed
metadata, decoded / feature-extracted on an actor pool.

The container ships no image/audio codecs, so the decode kernel is STUBBED:
``MediaFeaturizer(real_decode=True)`` raises NotImplementedError at the
exact seam where PIL/torchaudio decoding would plug in, and the default
deterministic fake derives a fixed-size feature vector from the media_ref
bytes. Everything around the stub — schema, actor signature, batch sizing,
zero-copy extraction of media spans, output layout — is real and tested.

Scale notes: media batches are kept SMALL (``batch_size`` default 256) so a
batch x concurrency of decoded frames fits a worker heap; decoded features
are fixed-size float32 lists, so blocks stay compact even when the source
bytes are large.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FEATURE_DIM = 16


def extract_media_spans_batch(t: pa.Table) -> pa.Table:
    """docs(doc_id, spans) -> one row per media span
    (doc_id, span_idx, kind, media_ref) — vectorized explode + filter."""
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
    is_media = pc.invert(pc.equal(flat.field("kind"), "text"))
    sel = pa.array(np.nonzero(is_media.to_numpy(zero_copy_only=False))[0])
    return pa.Table.from_arrays(
        [
            pc.take(t.column("doc_id"), pc.take(parent, sel)),
            pa.array(idx[sel.to_numpy(zero_copy_only=False)].astype(np.int32)),
            flat.field("kind").take(sel),
            flat.field("media_ref").take(sel),
        ],
        names=["doc_id", "span_idx", "kind", "media_ref"],
    )


class MediaFeaturizer:
    """Actor-pool decode/featurize stage.

    ``__init__`` is where a real model/codec would load once per actor;
    ``__call__`` processes an Arrow batch of media spans and appends a
    float32 feature list column.
    """

    def __init__(self, real_decode: bool = False, feature_dim: int = FEATURE_DIM):
        self.real_decode = real_decode
        self.feature_dim = feature_dim
        # real path would do: self.model = load_image_encoder(...); etc.

    def _fake_feature(self, media_ref: str, kind: str) -> np.ndarray:
        # deterministic fake: md5(kind:ref) bytes -> [0,1] floats. md5 (16
        # bytes == FEATURE_DIM) is chosen so a DuckDB oracle can derive the
        # identical values from hex substrings — the whole multimodal
        # plumbing becomes oracle-checkable (see oracles.media_features)
        digest = hashlib.md5(f"{kind}:{media_ref}".encode()).digest()
        return (np.frombuffer(digest, dtype=np.uint8)[: self.feature_dim]
                .astype(np.float32) / 255.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_decode:
            raise NotImplementedError(
                "real media decode requires image/audio codecs not present "
                "in this environment; plug PIL/torchaudio decoding in here"
            )
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats = [self._fake_feature(r, k).tolist() for r, k in zip(refs, kinds)]
        return batch.append_column(
            "feature", pa.array(feats, type=pa.list_(pa.float32()))
        )


def featurize_media(docs_ds, *, concurrency=(1, 4), batch_size: int = 256):
    """docs -> (doc_id, span_idx, kind, media_ref, feature:list<float32>)."""
    media = docs_ds.map_batches(extract_media_spans_batch, batch_format="pyarrow")
    return media.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
