"""Shared mutable index via sharded Ray actors — the one pattern the
Dataset API cannot express (the brief's "shared mutable index" seam,
SURVEY §7): a streaming-ingest dedup registry that accumulates per-hash
(min doc_id, count) as batches ARRIVE, instead of waiting for a
batch-mode all-to-all.

The batch-mode equivalent (``stages/dedup.exact_dedup_groups``, one
bucket-hash shuffle) is preferred whenever a shuffle is affordable — this
exists for the arrival-order regime: continuous ingest, or an index that
must be shared across concurrently running pipelines.

Scale design:
- the registry is SHARDED by hash, so no single actor holds the whole
  index or serializes the stream; shard count scales with the cluster;
- per-batch traffic is the batch's DISTINCT (hash -> min, count)
  partials, pre-reduced with pandas before any remote call, so actor
  messages are combiner-sized no matter how many duplicate rows a batch
  holds;
- each shard holds |distinct hashes| / shards entries — the same state a
  batch-mode reduce would hold, pinned in actors instead of shuffle
  partitions. At 1e12 docs the drain step writes one parquet per shard
  (here it returns one Arrow block per shard).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.textstats import fingerprint_batch
from ..util import adaptive_buckets


@ray.remote
class HashShard:
    """One shard of the registry. ``offer`` merges combiner-sized partials
    (order-independent: min and + are commutative, so arrival order never
    changes the drained result) and is EXACTLY-ONCE under Ray task retry /
    lineage reconstruction: each offer carries a deterministic batch token
    (content hash of the batch's doc_id set — doc_ids are unique corpus-
    wide, so tokens are too) and replays of a seen token are dropped —
    min() would survive a replay but count would not. ``drain`` returns
    the shard's table."""

    def __init__(self):
        self._min: dict[str, int] = {}
        self._cnt: dict[str, int] = {}
        self._seen: set[str] = set()  # one 32-char token per batch offered

    def offer(self, token: str, hashes: list[str], mins: list[int],
              counts: list[int]) -> int:
        if token in self._seen:
            return len(self._min)
        self._seen.add(token)
        m, c = self._min, self._cnt
        for h, mn, ct in zip(hashes, mins, counts):
            prev = m.get(h)
            if prev is None or mn < prev:
                m[h] = mn
            c[h] = c.get(h, 0) + ct
        return len(m)

    def drain(self) -> pa.Table:
        keys = list(self._min)
        return pa.Table.from_arrays(
            [pa.array(keys, type=pa.string()),
             pa.array([self._min[k] for k in keys], type=pa.int64()),
             pa.array([self._cnt[k] for k in keys], type=pa.int64())],
            names=["text_hash", "keep_doc_id", "n_docs"])


def exact_dedup_groups_indexed(documents_ds, *, num_shards: int | None = None):
    """-> (text_hash, keep_doc_id, n_docs), identical to
    ``dedup.exact_dedup_groups`` but computed through the sharded mutable
    index instead of a shuffle. Phase 1 streams the corpus once, offering
    each batch's distinct partials to the owning shards (the per-batch
    ``ray.get`` is the backpressure: a batch completes only once its
    partials are registered). Phase 2 drains the shards."""
    num_shards = num_shards or max(2, adaptive_buckets(1) // 8)
    shards = [HashShard.remote() for _ in range(num_shards)]

    def _offer(t: pa.Table) -> pa.Table:
        import hashlib

        fp = fingerprint_batch(t)
        ids = fp.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "h": fp.column("fp_norm").to_numpy(zero_copy_only=False),
            "d": ids,
        })
        # replay token: batches partition the corpus and doc_ids are
        # unique, so the sorted-id digest identifies THIS batch exactly
        token = hashlib.md5(np.sort(ids).tobytes()).hexdigest()
        g = df.groupby("h")["d"].agg(["min", "count"]).reset_index()
        # fp_norm is md5 hex: the first 8 hex chars are a uniform shard key
        shard_ids = np.array([int(h[:8], 16) % num_shards for h in g["h"]])
        refs = []
        for s in np.unique(shard_ids):
            part = g[shard_ids == s]
            refs.append(shards[int(s)].offer.remote(
                token, part["h"].tolist(), part["min"].tolist(),
                part["count"].astype(int).tolist()))
        ray.get(refs)
        return pa.Table.from_arrays(
            [pa.array([t.num_rows], type=pa.int64())], names=["offered"])

    # phase 1: full pass, consumed for effect (tiny per-batch outputs)
    documents_ds.map_batches(_offer, batch_format="pyarrow").count()
    # phase 2: drain — one block per shard
    tables = ray.get([s.drain.remote() for s in shards])
    import ray.data as rd

    return rd.from_arrow([t for t in tables if t.num_rows > 0] or [tables[0]])
