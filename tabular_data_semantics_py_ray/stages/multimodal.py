"""Multimodal span processing: media spans as opaque refs/bytes with typed
metadata, decoded / feature-extracted on an actor pool.

Codec handling is IMPORT-GUARDED: ``real_decode=True`` loads PIL (images)
or pyav (frames) once per actor in ``__init__`` and runs a real decode over
a ``media_bytes`` binary column; when the library is absent (this container
ships no codecs) construction raises NotImplementedError at the exact seam,
so the operator is real wherever codecs exist and an honest stub where they
don't. ``codec="builtin"`` instead routes the same real-decode seams
through the vendored dependency-free PNG/WAV codecs in
``stages/media_codecs.py``, so one genuinely-real decode is provable in
environments without PIL/pyav. The default (``real_decode=False``) is the
deterministic md5 fake — the oracle-checkable path, with identical output
schemas to the real one.

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


def _import_codec(module: str, seam: str):
    """Import-guard for the per-actor codec load: returns the module or
    raises NotImplementedError naming the seam (the honest-stub contract)."""
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as e:
        raise NotImplementedError(
            f"real {seam} requires {module}, which is not installed in this "
            f"environment; install it or use real_decode=False (the "
            f"deterministic, oracle-checkable fake)"
        ) from e


def _media_bytes(batch: pa.Table) -> list[bytes]:
    """Real-decode input contract: the batch must carry the raw payload in
    a ``media_bytes`` binary column (media_ref stays the identifier)."""
    if "media_bytes" not in batch.column_names:
        raise ValueError(
            "real_decode=True requires a 'media_bytes' binary column "
            "holding the encoded payload (media_ref is only an identifier)"
        )
    return batch.column("media_bytes").to_pylist()


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

    def __init__(self, real_decode: bool = False,
                 feature_dim: int = FEATURE_DIM, codec: str = "pil"):
        self.real_decode = real_decode
        self.feature_dim = feature_dim
        self.codec = codec
        if real_decode:
            if codec == "builtin":
                from . import media_codecs as mc
                self._mc = mc
            else:
                # once-per-actor codec load (import-guarded seam)
                self._pil = _import_codec("PIL.Image", "media decode")

    def _fake_feature(self, media_ref: str, kind: str) -> np.ndarray:
        # deterministic fake: md5(kind:ref) bytes -> [0,1] floats. md5 (16
        # bytes == FEATURE_DIM) is chosen so a DuckDB oracle can derive the
        # identical values from hex substrings — the whole multimodal
        # plumbing becomes oracle-checkable (see oracles.media_features)
        digest = hashlib.md5(f"{kind}:{media_ref}".encode()).digest()
        return (np.frombuffer(digest, dtype=np.uint8)[: self.feature_dim]
                .astype(np.float32) / 255.0)

    def _real_feature(self, data: bytes) -> np.ndarray:
        # real decode: 4x4 grayscale thumbnail -> 16 floats in [0,1]
        # (same shape/range as the fake, so output schemas are identical)
        if self.codec == "builtin":
            return self._builtin_feature(data)
        import io

        img = self._pil.open(io.BytesIO(data)).convert("L").resize((4, 4))
        return (np.asarray(img, dtype=np.float32) / 255.0).reshape(-1)[
            : self.feature_dim
        ]

    def _builtin_feature(self, data: bytes) -> np.ndarray:
        """Vendored-codec real decode: PNG -> 4x4 box-mean gray thumbnail;
        WAV -> feature_dim windowed mean-|amplitude| values. Both land in
        [0,1] with the same shape as the PIL / fake paths."""
        kind = self._mc.sniff(data)
        if kind == "png":
            px = self._mc.decode_png(data).astype(np.float32)
            gray = px[:, :, :3].mean(axis=2) if px.shape[2] >= 3 else px[:, :, 0]
            h, w = gray.shape
            ys = np.linspace(0, h, 5).astype(np.int64)
            xs = np.linspace(0, w, 5).astype(np.int64)
            thumb = np.array([
                gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                     xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
                for i in range(4) for j in range(4)
            ], dtype=np.float32)
            return (thumb / 255.0)[: self.feature_dim]
        samples, _ = self._mc.decode_wav(data)
        mono = np.abs(samples.astype(np.float32)).mean(axis=1)
        edges = np.linspace(0, len(mono), self.feature_dim + 1).astype(np.int64)
        feat = np.array([
            mono[edges[i]:max(edges[i + 1], edges[i] + 1)].mean()
            if len(mono) else 0.0
            for i in range(self.feature_dim)
        ], dtype=np.float32)
        return feat / 32768.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_decode:
            feats = [self._real_feature(b).tolist() for b in _media_bytes(batch)]
        else:
            refs = batch.column("media_ref").to_pylist()
            kinds = batch.column("kind").to_pylist()
            feats = [
                self._fake_feature(r, k).tolist() for r, k in zip(refs, kinds)
            ]
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

    MAX_FRAMES = 4  # bounded expansion: real and fake paths both cap here

    def __init__(self, real_decode: bool = False, stride_ms: int = 250,
                 codec: str = "av"):
        self.real_decode = real_decode
        self.stride_ms = stride_ms
        self.codec = codec
        if real_decode:
            if codec == "builtin":
                from . import media_codecs as mc
                self._mc = mc
            else:
                self._av = _import_codec("av", "frame sampling")

    def _real_frames(self, data: bytes) -> list[str]:
        """Decode up to MAX_FRAMES video frames; md5 of raw frame pixels
        stands in the frame_md5 column exactly like the fake path."""
        if self.codec == "builtin":
            # vendored WAV decode: each stride_ms window of real PCM is a
            # "frame"; frame_md5 is the md5 of the window's raw samples
            samples, rate = self._mc.decode_wav(data)
            spf = max(1, rate * self.stride_ms // 1000)
            n = min(self.MAX_FRAMES,
                    max(1, -(-samples.shape[0] // spf)))
            return [
                hashlib.md5(samples[i * spf:(i + 1) * spf].tobytes()).hexdigest()
                for i in range(n)
            ]
        import io

        with self._av.open(io.BytesIO(data)) as container:
            out = []
            for frame in container.decode(video=0):
                out.append(
                    hashlib.md5(frame.to_ndarray().tobytes()).hexdigest()
                )
                if len(out) >= self.MAX_FRAMES:
                    break
            return out or [hashlib.md5(b"").hexdigest()]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        if self.real_decode:
            per_row = [self._real_frames(b) for b in _media_bytes(batch)]
            n_frames = np.array([len(f) for f in per_row], dtype=np.int64)
            rep = np.repeat(np.arange(len(refs), dtype=np.int64), n_frames)
            starts = np.zeros(len(refs), dtype=np.int64)
            np.cumsum(n_frames[:-1], out=starts[1:])
            frame_idx = np.arange(rep.size, dtype=np.int64) - starts[rep]
            frame_md5 = pa.array(
                [per_row[r][f] for r, f in zip(rep, frame_idx)],
                type=pa.string(),
            )
            cols = [batch.column(c).take(pa.array(rep))
                    for c in batch.column_names]
            return pa.Table.from_arrays(
                cols + [pa.array(frame_idx),
                        pa.array(frame_idx * self.stride_ms),
                        frame_md5],
                names=batch.column_names + ["frame_idx", "ts_ms", "frame_md5"],
            )
        digests = [hashlib.md5(r.encode()).digest() for r in refs]
        n_frames = np.array(
            [1 + d[0] % self.MAX_FRAMES for d in digests], dtype=np.int64)
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

    def __init__(self, real_decode: bool = False, max_side: int = 64,
                 codec: str = "pil"):
        self.real_decode = real_decode
        self.max_side = max_side
        self.codec = codec
        if real_decode:
            if codec == "builtin":
                from . import media_codecs as mc
                self._mc = mc
            else:
                self._pil = _import_codec("PIL.Image", "image resize")

    def _plan(self, src_w: np.ndarray, src_h: np.ndarray):
        """Aspect-preserving integer scaling of the long side to max_side —
        shared by the real and fake paths."""
        wide = src_w >= src_h
        m = self.max_side
        out_w = np.where(wide, m, np.maximum(1, (src_w * m) // src_h))
        out_h = np.where(wide, np.maximum(1, (src_h * m) // src_w), m)
        return out_w, out_h

    def _builtin_resize_md5(self, data: bytes, out_w: int, out_h: int) -> str:
        """Vendored-codec real resize: decode the PNG, nearest-neighbor
        resample to (out_w, out_h), md5 the RGB bytes (gray replicated,
        alpha dropped — same md5-of-resized-pixels contract as PIL)."""
        px = self._mc.decode_png(data)
        h, w = px.shape[:2]
        yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
        xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
        small = px[yi][:, xi]
        rgb = (np.repeat(small[:, :, :1], 3, axis=2) if small.shape[2] < 3
               else small[:, :, :3])
        return hashlib.md5(np.ascontiguousarray(rgb).tobytes()).hexdigest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_decode and self.codec == "builtin":
            blobs = _media_bytes(batch)
            sizes = [self._mc.png_size(b) for b in blobs]
            src_w = np.array([s[0] for s in sizes], dtype=np.int64)
            src_h = np.array([s[1] for s in sizes], dtype=np.int64)
            out_w, out_h = self._plan(src_w, src_h)
            data_md5 = pa.array(
                [self._builtin_resize_md5(b, int(w), int(h))
                 for b, w, h in zip(blobs, out_w, out_h)],
                type=pa.string(),
            )
            return pa.Table.from_arrays(
                [batch.column(c) for c in batch.column_names]
                + [pa.array(src_w), pa.array(src_h),
                   pa.array(out_w), pa.array(out_h), data_md5],
                names=batch.column_names
                + ["src_w", "src_h", "out_w", "out_h", "data_md5"],
            )
        if self.real_decode:
            import io

            imgs = [self._pil.open(io.BytesIO(b)) for b in _media_bytes(batch)]
            src_w = np.array([im.size[0] for im in imgs], dtype=np.int64)
            src_h = np.array([im.size[1] for im in imgs], dtype=np.int64)
            out_w, out_h = self._plan(src_w, src_h)
            data_md5 = pa.array(
                [
                    hashlib.md5(
                        im.resize((int(w), int(h))).convert("RGB").tobytes()
                    ).hexdigest()
                    for im, w, h in zip(imgs, out_w, out_h)
                ],
                type=pa.string(),
            )
            return pa.Table.from_arrays(
                [batch.column(c) for c in batch.column_names]
                + [pa.array(src_w), pa.array(src_h),
                   pa.array(out_w), pa.array(out_h), data_md5],
                names=batch.column_names
                + ["src_w", "src_h", "out_w", "out_h", "data_md5"],
            )
        refs = batch.column("media_ref").to_pylist()
        digests = [hashlib.md5(r.encode()).digest() for r in refs]
        src_w = np.array([32 + d[0] for d in digests], dtype=np.int64)
        src_h = np.array([32 + d[1] for d in digests], dtype=np.int64)
        out_w, out_h = self._plan(src_w, src_h)
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
