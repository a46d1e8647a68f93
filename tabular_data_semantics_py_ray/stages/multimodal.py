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


class FrameSampler:
    """Actor-pool frame-sampling stage for time-based media (audio/video).

    ``__init__`` is the once-per-actor codec seam (``real_decode=True``
    raises exactly where pyav/torchaudio frame iteration would plug in).
    ``__call__`` expands each media row into its sampled frames — a 1->n
    flat expansion built with numpy repeat/arange, no per-frame Python.

    Deterministic fake decode: the media 'duration' derives from the first
    byte of md5(media_ref) (n_frames = 1 + byte % 4), frames are sampled on
    a fixed ``stride_ms`` grid, and the sampled-frame payload stand-in is
    the hex digest md5('<media_ref>#<frame_idx>') — all three DuckDB-
    derivable, so the whole plumbing is oracle-checkable.

    Scale notes: expansion is bounded (<= 4 frames/row fake; a real decoder
    would cap frames per item the same way), so output blocks stay within a
    constant factor of input blocks and the stage streams.
    """

    def __init__(self, real_decode: bool = False, stride_ms: int = 250):
        self.real_decode = real_decode
        self.stride_ms = stride_ms
        # real path would do: self.container = av.open(...) per item; etc.

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_decode:
            raise NotImplementedError(
                "real frame sampling requires video/audio codecs not "
                "present in this environment; plug pyav/torchaudio here"
            )
        refs = batch.column("media_ref").to_pylist()
        digests = [hashlib.md5(r.encode()).digest() for r in refs]
        n_frames = np.array([1 + d[0] % 4 for d in digests], dtype=np.int64)
        rep = np.repeat(np.arange(len(refs), dtype=np.int64), n_frames)
        # frame_idx = position within each row's run
        starts = np.zeros(len(refs), dtype=np.int64)
        np.cumsum(n_frames[:-1], out=starts[1:])
        frame_idx = np.arange(rep.size, dtype=np.int64) - starts[rep]
        frame_md5 = pa.array(
            [hashlib.md5(f"{refs[r]}#{f}".encode()).hexdigest()
             for r, f in zip(rep, frame_idx)],
            type=pa.string(),
        )
        cols = [batch.column(c).take(pa.array(rep)) for c in batch.column_names]
        return pa.Table.from_arrays(
            cols + [pa.array(frame_idx),
                    pa.array(frame_idx * self.stride_ms),
                    frame_md5],
            names=batch.column_names + ["frame_idx", "ts_ms", "frame_md5"],
        )


class ImageResizer:
    """Actor-pool image-resize stage.

    The decode itself is stubbed (``real_decode=True`` raises at the PIL
    seam); the deterministic fake derives source dimensions from md5 bytes
    of the ref (src_w = 32 + byte0, src_h = 32 + byte1). The resize *plan*
    — aspect-preserving integer scaling of the long side to ``max_side`` —
    is real vectorized numpy, and the resized-payload stand-in is
    md5('<ref>:<out_w>x<out_h>'), so engine and oracle agree bit-for-bit.
    """

    def __init__(self, real_decode: bool = False, max_side: int = 64):
        self.real_decode = real_decode
        self.max_side = max_side
        # real path would do: from PIL import Image  (once per actor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_decode:
            raise NotImplementedError(
                "real image resize requires PIL/opencv not present in this "
                "environment; plug Image.open(...).resize(...) in here"
            )
        refs = batch.column("media_ref").to_pylist()
        digests = [hashlib.md5(r.encode()).digest() for r in refs]
        src_w = np.array([32 + d[0] for d in digests], dtype=np.int64)
        src_h = np.array([32 + d[1] for d in digests], dtype=np.int64)
        wide = src_w >= src_h
        m = self.max_side
        out_w = np.where(wide, m, np.maximum(1, (src_w * m) // src_h))
        out_h = np.where(wide, np.maximum(1, (src_h * m) // src_w), m)
        data_md5 = pa.array(
            [hashlib.md5(f"{r}:{w}x{h}".encode()).hexdigest()
             for r, w, h in zip(refs, out_w, out_h)],
            type=pa.string(),
        )
        return pa.Table.from_arrays(
            [batch.column(c) for c in batch.column_names]
            + [pa.array(src_w), pa.array(src_h),
               pa.array(out_w), pa.array(out_h), data_md5],
            names=batch.column_names
            + ["src_w", "src_h", "out_w", "out_h", "data_md5"],
        )


def sample_frames(media_ds, *, concurrency=(1, 4), batch_size: int = 256):
    """time-based media rows -> + (frame_idx, ts_ms, frame_md5)."""
    return media_ds.map_batches(
        FrameSampler, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def resize_images(media_ds, *, concurrency=(1, 4), batch_size: int = 256):
    """image media rows -> + (src_w, src_h, out_w, out_h, data_md5)."""
    return media_ds.map_batches(
        ImageResizer, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
