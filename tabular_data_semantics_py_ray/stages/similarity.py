"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each ``map_batches`` task computes a batch x queries matmul
and emits only its LOCAL top-k rows per query, so the final shuffle reduces
k*num_batches rows, not n*q. The LSH-bucketed scale path lives in
``stages/dedup.near_dup_pairs_embedding``; an IVF variant can reuse the same
partial-top-k reduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..util import list_column_matrix


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


class BruteForceTopK:
    """Actor: pins the normalized query matrix from the object store."""

    def __init__(self, queries_ref, k: int = 10):
        q = ray.get(queries_ref)  # DataFrame(vec_id, embedding)
        self.q_ids = q["vec_id"].to_numpy()
        self.Q = _normalize(np.stack(q["embedding"].to_numpy()).astype(np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        # optional passthrough (e.g. neighbor label for the k-NN vote —
        # carrying it here deletes a whole join downstream)
        carry = ("label",) if "label" in batch.column_names else ()
        X = _normalize(list_column_matrix(batch.column("embedding")))
        S = self.Q @ X.T  # (q, n)
        out_q, out_n, out_s, out_sel = [], [], [], []
        for qi in range(len(self.q_ids)):
            sims = S[qi]
            mask = ids != self.q_ids[qi]  # exclude self-match
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            take = min(self.k, len(cand_idx))
            # local top-k by (sim desc, id asc) — deterministic
            order = np.lexsort((ids[cand_idx], -sims[cand_idx]))[:take]
            sel = cand_idx[order]
            out_q.append(np.full(len(sel), self.q_ids[qi], dtype=np.int64))
            out_n.append(ids[sel].astype(np.int64))
            out_s.append(sims[sel])
            out_sel.append(sel)
        if not out_q:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
                 pa.array([], type=pa.float64())]
                + [batch.column(c).slice(0, 0) for c in carry],
                names=["query_id", "neighbor_id", "sim", *carry],
            )
        sel_all = pa.array(np.concatenate(out_sel))
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_q)),
                pa.array(np.concatenate(out_n)),
                pa.array(np.concatenate(out_s)),
            ]
            + [batch.column(c).take(sel_all) for c in carry],
            names=["query_id", "neighbor_id", "sim", *carry],
        )


_BF_CACHE: dict = {}


def _bf_partial(batch: pa.Table, queries_ref, k: int) -> pa.Table:
    """Stateless-task wrapper around ``BruteForceTopK``: the constructed
    kernel (normalized query matrix) is cached per worker PROCESS keyed on
    the broadcast ref, so the task pool gets actor-init semantics with no
    actor startup latency — the query matrix is ray.put once and fetched
    zero-copy in each process (the canonical broadcast-small-side shape)."""
    key = (queries_ref.hex(), k)
    bf = _BF_CACHE.get(key)
    if bf is None:
        bf = _BF_CACHE[key] = BruteForceTopK(queries_ref, k=k)
    return bf(batch)


def ann_topk(embeddings_ds, queries_df: pd.DataFrame, *, k: int = 10):
    """-> (query_id, neighbor_id, rank) global top-k per query by cosine,
    rank 1..k ordered (sim desc, neighbor_id asc)."""
    queries_ref = ray.put(queries_df)
    partial = embeddings_ds.map_batches(
        _bf_partial,
        fn_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
    )

    return _topk_reduce(partial, k)


def _topk_reduce(partial, k: int):
    """(query_id, neighbor_id, sim) partials -> global (query_id,
    neighbor_id, rank), rank 1..k by (sim desc, neighbor_id asc).

    The partial stream is BOUNDED (<= input_blocks x n_queries x k rows,
    each block already thinned to per-query top-k), so the reduce is a
    two-level narrow coalesce + vectorized pandas top-k — replacing a
    groupby sort-shuffle whose sampling barrier alone cost ~2.7 s on an
    80-row result. Level 1 re-thins per coalesced block, so the final
    single-block frame stays ~queries x k x level1_blocks regardless of
    input block count."""

    def _thin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "sim", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("query_id", sort=False).head(k)

    def _final_all(df: pd.DataFrame) -> pd.DataFrame:
        df = _thin(df)
        out = df[["query_id", "neighbor_id"]].copy()
        out["rank"] = (df.groupby("query_id", sort=False).cumcount() + 1
                       ).to_numpy(dtype=np.int64)
        return out.reset_index(drop=True)

    lvl1 = partial.repartition(8).map_batches(
        _thin, batch_format="pandas", batch_size=None)
    return lvl1.repartition(1).map_batches(
        _final_all, batch_format="pandas", batch_size=None)


def ann_label_vote(embeddings_ds, queries_df: pd.DataFrame, *, k: int = 10):
    """k-NN classification: majority label among the top-k neighbors,
    ties broken by smallest label. -> (query_id, pred_label).

    The neighbor label rides through the brute-force partials (the kernel's
    passthrough), so the vote is computed straight off the global top-k in
    the final coalesced block — no neighbor_id->label join, no vote
    shuffle."""
    queries_ref = ray.put(queries_df)
    partial = embeddings_ds.select_columns(
        ["vec_id", "embedding", "label"]
    ).map_batches(
        _bf_partial,
        fn_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
    )

    def _thin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "sim", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("query_id", sort=False).head(k)

    def _vote_final(df: pd.DataFrame) -> pd.DataFrame:
        top = _thin(df)  # exact global top-k per query, labels attached
        counts = (top.groupby(["query_id", "label"]).size()
                  .reset_index(name="n")
                  .sort_values(["query_id", "n", "label"],
                               ascending=[True, False, True],
                               kind="mergesort"))
        win = counts.drop_duplicates("query_id")
        return pd.DataFrame({
            "query_id": win["query_id"].to_numpy(),
            "pred_label": win["label"].astype("int64").to_numpy(),
        })

    lvl1 = partial.repartition(8).map_batches(
        _thin, batch_format="pandas", batch_size=None)
    return lvl1.repartition(1).map_batches(
        _vote_final, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the scale path: cluster once (offline-ish),
# then each query probes only its ``nprobe`` nearest centroid cells, so a
# batch contributes candidates only for queries whose probe set intersects
# the batch's cells. With nprobe == n_clusters it degrades to brute force.
# ---------------------------------------------------------------------------
def fit_centroids(embeddings_ds, *, n_clusters: int = 16, sample_rows: int = 4096,
                  iters: int = 10, seed: int = 11) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (normalized).

    At 100 TB this is the one driver-side step, and it reads a bounded
    sample (``limit``), never the full dataset.
    """
    sample = embeddings_ds.select_columns(["embedding"]).limit(sample_rows).to_pandas()
    X = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for k in range(len(C)):
            m = assign == k
            if m.any():
                v = X[m].mean(axis=0)
                C[k] = v / max(np.linalg.norm(v), 1e-12)
    return C


class IVFTopK:
    """Actor: queries + centroids pinned; per batch, scores only the rows
    whose cell is probed by at least one query."""

    def __init__(self, queries_ref, centroids_ref, k: int = 10, nprobe: int = 4):
        q = ray.get(queries_ref)
        self.q_ids = q["vec_id"].to_numpy()
        self.Q = _normalize(np.stack(q["embedding"].to_numpy()).astype(np.float64))
        self.C = ray.get(centroids_ref)
        self.k = k
        # per-query probe cells: nprobe nearest centroids
        sims = self.Q @ self.C.T
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        self.probe = [set(row.tolist()) for row in order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        X = _normalize(list_column_matrix(batch.column("embedding")))
        cells = (X @ self.C.T).argmax(axis=1)
        S = self.Q @ X.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(self.q_ids)):
            mask = np.isin(cells, list(self.probe[qi])) & (ids != self.q_ids[qi])
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            take = min(self.k, len(cand))
            order = np.lexsort((ids[cand], -S[qi][cand]))[:take]
            sel = cand[order]
            out_q.append(np.full(len(sel), self.q_ids[qi], dtype=np.int64))
            out_n.append(ids[sel].astype(np.int64))
            out_s.append(S[qi][sel])
        if not out_q:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
                 pa.array([], type=pa.float64())],
                names=["query_id", "neighbor_id", "sim"],
            )
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(out_q)), pa.array(np.concatenate(out_n)),
             pa.array(np.concatenate(out_s))],
            names=["query_id", "neighbor_id", "sim"],
        )


def ann_topk_ivf(embeddings_ds, queries_df: pd.DataFrame, *, k: int = 10,
                 n_clusters: int = 16, nprobe: int = 4, concurrency=(1, 4)):
    """Approximate top-k via IVF probing -> (query_id, neighbor_id, rank)."""
    centroids = fit_centroids(embeddings_ds, n_clusters=n_clusters)
    queries_ref = ray.put(queries_df)
    centroids_ref = ray.put(centroids)
    partial = embeddings_ds.map_batches(
        IVFTopK,
        fn_constructor_kwargs={
            "queries_ref": queries_ref,
            "centroids_ref": centroids_ref,
            "k": k,
            "nprobe": nprobe,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    return _topk_reduce(partial, k)


# ----------------------------------------------------------------------
# Product quantization: the memory-scale ANN path (16x+ vector
# compression; 1e12 vectors fit where raw floats cannot).
# ----------------------------------------------------------------------
def _label_means(embeddings_ds) -> tuple[np.ndarray, np.ndarray]:
    """(sorted labels, per-label mean matrix rounded to 4) — the same
    distributed M-step partial reduce as ``relational.emb_label_centroids``
    (|labels| x d partial rows per batch, never vectors); rounding pins
    the codebook against float-sum-order drift so code assignment is
    bit-stable across engines and block orders."""
    from ..util import bucket_aggregate

    def _partial(t: pa.Table) -> pa.Table:
        m = list_column_matrix(t.column("embedding"))
        labels = t.column("label").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ulab, codes = np.unique(labels, return_inverse=True)
        k, d = len(ulab), m.shape[1]
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, codes, m)
        cnts = np.bincount(codes, minlength=k).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(np.repeat(ulab, d)),
             pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
             pa.array(sums.ravel()), pa.array(np.repeat(cnts, d))],
            names=["label", "dim", "s", "n"])

    agg = bucket_aggregate(
        embeddings_ds.map_batches(_partial, batch_format="pyarrow"),
        ["label", "dim"], {"s": ("s", "sum"), "n": ("n", "sum")},
    ).to_pandas()
    agg["c"] = (agg["s"] / agg["n"]).round(4)
    wide = agg.pivot(index="label", columns="dim", values="c").sort_index()
    return wide.index.to_numpy(dtype=np.int64), wide.to_numpy(dtype=np.float64)


def ann_topk_pq(embeddings_ds, queries_df: pd.DataFrame, *, k: int = 10,
                m: int = 4):
    """PQ/ADC approximate top-k: -> (query_id, neighbor_id, pq_rank).

    Scale path for ANN beyond IVF: vectors are ENCODED to m uint8
    sub-codes (d floats -> m bytes; here the sub-codebooks are the
    per-label means sliced per subspace — deterministic and
    oracle-reproducible, where classic PQ would k-means each subspace),
    and queries score reconstructed vectors via asymmetric distance
    (sum over subspaces of query-subvector . assigned-centroid) — the
    matmul touches the (ksub x d) codebook, never the raw corpus floats.

    Scale shape: one |labels| x d partial-reduce for the codebook, then a
    single shuffle-free scan: per batch encode (m argmins) + ADC scores +
    per-query top-k partials into the same bounded ``_topk_reduce`` as
    the exhaustive path. At 1e12 vectors the scan reads codes (m bytes a
    vector) instead of d floats — the 16x I/O and object-store saving is
    the point of the operator. Rank ties break by neighbor_id; self
    excluded like ``ann_topk``.
    """
    labels, C = _label_means(embeddings_ds)
    if C.shape[1] % m:
        raise ValueError(f"dim {C.shape[1]} not divisible by m={m}")
    dsub = C.shape[1] // m
    q_ids = queries_df["vec_id"].to_numpy()
    Q = np.stack(queries_df["embedding"].to_numpy()).astype(np.float64)
    csq = [  # per-subspace ||c||^2 for the argmin (x^2 term is constant)
        (C[:, j * dsub:(j + 1) * dsub] ** 2).sum(axis=1) for j in range(m)]

    def _partial(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        X = list_column_matrix(t.column("embedding"))
        recon = np.empty_like(X, dtype=np.float64)
        for j in range(m):
            sl = slice(j * dsub, (j + 1) * dsub)
            # argmin ||x - c||^2 = argmin(||c||^2 - 2 x.c); np.argmin's
            # first-hit tie-break = lowest label (rows sorted by label)
            codes = (csq[j] - 2.0 * (X[:, sl] @ C[:, sl].T)).argmin(axis=1)
            recon[:, sl] = C[codes][:, sl]
        # round-6 BEFORE ranking: per-label codebooks make equal-recon
        # score ties common, and un-rounded float sums order those ties
        # by summation noise (DuckDB's parallel aggregate is not even
        # run-deterministic there); rounding makes ties exact on both
        # sides so the neighbor-id tie-break decides
        S = np.round(Q @ recon.T, 6)  # (nq, n) ADC scores
        rows = []
        for qi in range(len(q_ids)):
            s = S[qi].copy()
            mask = ids != q_ids[qi]
            cand = np.flatnonzero(mask)
            if not len(cand):
                continue
            order = cand[np.lexsort((ids[cand], -s[cand]))][:k]
            rows.append(pa.Table.from_arrays(
                [pa.array(np.full(len(order), q_ids[qi], dtype=np.int64)),
                 pa.array(ids[order]), pa.array(s[order])],
                names=["query_id", "neighbor_id", "sim"]))
        if not rows:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        return pa.concat_tables(rows)

    partial = embeddings_ds.map_batches(_partial, batch_format="pyarrow")
    out = _topk_reduce(partial, k)
    return out.map_batches(
        lambda b: b.rename(columns={"rank": "pq_rank"}),
        batch_format="pandas")


def _side_topk(ids_q, ids_n, S, k: int):
    """Per-row top-k of S (queries = ids_q, neighbors = ids_n) by
    (cosine desc, neighbor id asc). An O(n) argpartition finds each
    row's kth value, the candidate set keeps EVERY entry >= it (so
    boundary TIES are never dropped by partition arbitrariness —
    mass-duplicate corpora make exact score ties routine), and one
    flat lexsort + group-rank pass takes the first kk per row —
    full-row sorts (measured 10x slower at 4096-row blocks) never
    happen."""
    kk = min(k, S.shape[1])
    vk = -np.partition(-S, kk - 1, axis=1)[:, kk - 1]
    r, c = np.nonzero(S >= vk[:, None])
    s = S[r, c]
    order = np.lexsort((ids_n[c], -s, r))
    rr = r[order]
    starts = np.concatenate(([0], np.flatnonzero(rr[1:] != rr[:-1]) + 1))
    sizes = np.diff(np.concatenate((starts, [len(rr)])))
    rank = np.arange(len(rr)) - np.repeat(starts, sizes)
    keep = order[rank < kk]
    sims = S[r[keep], c[keep]]
    fin = np.isfinite(sims)  # drop the -inf self marker (tiny blocks)
    return ids_q[r[keep]][fin], ids_n[c[keep]][fin], sims[fin]


def _knn_finalize(partial, k: int):
    """(vec_id, neighbor_id, sim) partials -> global per-vector top-k
    (vec_id, neighbor_id, knn_rank) via one vec_id-keyed bucket reduce.
    The partial stream is edge-bounded (<= k rows per vector per opposing
    block/cell), never the score matrix."""
    from ..util import bucket_map_keyed

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["vec_id", "sim", "neighbor_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("vec_id", sort=False).head(k)
        return pd.DataFrame({
            "vec_id": g["vec_id"].to_numpy(),
            "neighbor_id": g["neighbor_id"].to_numpy(),
            "knn_rank": (g.groupby("vec_id", sort=False).cumcount() + 1
                         ).to_numpy(dtype=np.int64)})

    return bucket_map_keyed(partial, ["vec_id"], _final)


def knn_graph(embeddings_ds, *, k: int = 5, block_rows: int = 4096,
              checkpoint_dir: str | None = None):
    """Exact k-nearest-neighbor GRAPH: every vector gets its global top-k
    cosine neighbors -> (vec_id, neighbor_id, knn_rank). The all-vectors
    self-join behind SemDeDup-style curation and graph-based sampling
    (brute-force ANN answers q queries; this answers ALL n).

    Scale shape: the same block-partitioned checkpoint as
    ``dedup.near_dup_pairs_exact_embedding`` — normalized vectors land in
    ~block_rows parquet files, each of the B(B+1)/2 file pairs is scored
    by one task holding 2 blocks — but the per-task OUTPUT is top-k
    partials for BOTH sides of the pair (rows of S for A, columns for B),
    so the reduce input is <= 2k rows per vector per opposing block,
    never the n^2 score matrix. A vec_id-keyed bucket reduce finalizes
    global rank. Work is inherently O(n^2/block_rows) block reads — the
    exact baseline; past ~1e7 vectors use ``knn_graph_ivf`` (same output
    schema, sub-quadratic) — ``knn_mutual_pairs(method='auto')`` does
    that routing for you."""
    import glob as _glob
    import shutil
    import tempfile

    import ray.data as rd

    from ..util import bucket_map_keyed

    # lifecycle: when WE create the checkpoint dir it is deleted after the
    # final reduce materializes (the O(n*d) normalized-vector copy must not
    # outlive the call); a caller-passed checkpoint_dir is caller-owned and
    # left in place (e.g. to share blocks across multiple graph builds).
    owned = checkpoint_dir is None
    if owned:
        checkpoint_dir = tempfile.mkdtemp(prefix="knng_", dir="/tmp")
    else:
        shutil.rmtree(checkpoint_dir, ignore_errors=True)

    def _norm(batch: pa.Table) -> pa.Table:
        X = list_column_matrix(batch.column("embedding"))
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pa.Table.from_arrays(
            [batch.column("vec_id").cast(pa.int64()),
             pa.array(list(Xn), type=pa.list_(pa.float64()))],
            names=["vec_id", "nvec"])

    embeddings_ds.select_columns(["vec_id", "embedding"]).map_batches(
        _norm, batch_format="pyarrow"
    ).write_parquet(checkpoint_dir, min_rows_per_file=block_rows,
                    max_rows_per_file=block_rows)

    files = sorted(_glob.glob(f"{checkpoint_dir}/*.parquet"))
    items = [{"fa": files[i], "fb": files[j]}
             for i in range(len(files)) for j in range(i, len(files))]

    def _score(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out_v, out_n, out_s = [], [], []
        for fa, fb in zip(batch.column("fa").to_pylist(),
                          batch.column("fb").to_pylist()):
            ta = pq.read_table(fa, columns=["vec_id", "nvec"])
            ids_a = ta.column("vec_id").to_numpy()
            A = list_column_matrix(ta.column("nvec"))
            if fa == fb:
                S = A @ A.T
                np.fill_diagonal(S, -np.inf)
                r, c, s = _side_topk(ids_a, ids_a, S, k)
                out_v.append(r); out_n.append(c); out_s.append(s)
            else:
                tb = pq.read_table(fb, columns=["vec_id", "nvec"])
                ids_b = tb.column("vec_id").to_numpy()
                B = list_column_matrix(tb.column("nvec"))
                S = A @ B.T
                r, c, s = _side_topk(ids_a, ids_b, S, k)
                out_v.append(r); out_n.append(c); out_s.append(s)
                r, c, s = _side_topk(ids_b, ids_a, S.T, k)
                out_v.append(r); out_n.append(c); out_s.append(s)
        if not out_v:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        return pa.table({"vec_id": pa.array(np.concatenate(out_v)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "sim": pa.array(np.concatenate(out_s))})

    partial = (rd.from_items(items)
               .repartition(len(items))
               .map_batches(_score, batch_format="pyarrow"))

    out = _knn_finalize(partial, k)
    if owned:
        # the edge list is k*n rows (output-sized); materializing it lets
        # the O(n*d) checkpoint be deleted before this call returns
        out = out.materialize()
        shutil.rmtree(checkpoint_dir, ignore_errors=True)
    return out


def knn_graph_ivf(embeddings_ds, *, k: int = 5, n_clusters: int | None = None,
                  nprobe: int = 4, query_chunk: int = 2048,
                  member_chunk: int = 8192, num_buckets: int | None = None):
    """APPROXIMATE k-nearest-neighbor graph via IVF cell probing — the
    scale path past ``knn_graph``'s exact O(n^2/block) wall. Same output
    schema (vec_id, neighbor_id, knn_rank); ``nprobe == n_clusters``
    degrades to the exact graph (oracle-checked in api.q_knn_graph_ivf).

    Scale shape: centroids from a bounded driver sample (fit_centroids),
    then ONE scan emits each vector once as a MEMBER of its primary cell
    and ``nprobe`` times as a QUERY into its probed cells (float64 blob
    payload, n*(1+nprobe) rows total), ONE cell-keyed shuffle co-locates
    them, and each cell scores queries x members in bounded
    query_chunk x member_chunk tiles emitting per-query top-k partials —
    work is sum_cells |Q_c| x |M_c| instead of n^2. A vec_id-keyed bucket
    reduce finalizes global rank (the shared ``_knn_finalize``). A (query,
    member) pair is scored in exactly ONE cell (the member's primary), so
    partials are duplicate-free. Hot cells cost |Q_c| x |M_c| inside one
    group; ``n_clusters=None`` (default) auto-sizes to max(16, sqrt(n)) —
    expected cell work n^2/sqrt(n)·nprobe, sub-quadratic — so a direct
    caller at 10^7 vectors can't accidentally keep a constant cell count;
    tiles cap the peak score-matrix memory regardless.
    """
    if n_clusters is None:
        n_clusters = max(16, int(np.sqrt(embeddings_ds.count())))
    C = fit_centroids(embeddings_ds, n_clusters=n_clusters)
    nprobe = min(nprobe, len(C))

    def _emit(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        X = _normalize(list_column_matrix(batch.column("embedding")))
        S = X @ C.T
        primary = S.argmax(axis=1).astype(np.int64)
        # stable argsort: probe-set boundary ties break by cell id, so the
        # probe sets (and hence recall) are run-deterministic
        probe = np.argsort(-S, axis=1, kind="stable")[:, :nprobe]
        blobs = pa.array([row.tobytes() for row in X], type=pa.binary())
        rep = np.repeat(np.arange(len(ids)), nprobe)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate([primary, probe.ravel()])),
             pa.array(np.concatenate(
                 [np.zeros(len(ids), dtype=np.int8),
                  np.ones(len(rep), dtype=np.int8)])),
             pa.array(np.concatenate([ids, ids[rep]])),
             pa.concat_arrays([blobs, blobs.take(pa.array(rep))])],
            names=["cell", "role", "vec_id", "nvec"])

    tagged = embeddings_ds.select_columns(["vec_id", "embedding"]).map_batches(
        _emit, batch_format="pyarrow")

    def _unpack(col) -> np.ndarray:
        return np.stack([np.frombuffer(b, dtype=np.float64)
                         for b in col.to_numpy()])

    def _score_cells(g: pd.DataFrame) -> pd.DataFrame:
        out_v, out_n, out_s = [], [], []
        for _cell, sub in g.groupby("cell", sort=False):
            qs = sub[sub["role"] == 1]
            ms = sub[sub["role"] == 0]
            if not len(qs) or not len(ms):
                continue
            ids_q = qs["vec_id"].to_numpy()
            ids_m = ms["vec_id"].to_numpy()
            Q, M = _unpack(qs["nvec"]), _unpack(ms["nvec"])
            for q0 in range(0, len(ids_q), query_chunk):
                qsl = slice(q0, q0 + query_chunk)
                for m0 in range(0, len(ids_m), member_chunk):
                    msl = slice(m0, m0 + member_chunk)
                    S = Q[qsl] @ M[msl].T
                    S[ids_q[qsl][:, None] == ids_m[msl][None, :]] = -np.inf
                    r, c, s = _side_topk(ids_q[qsl], ids_m[msl], S, k)
                    out_v.append(r); out_n.append(c); out_s.append(s)
        if not out_v:
            return pd.DataFrame({
                "vec_id": np.array([], dtype=np.int64),
                "neighbor_id": np.array([], dtype=np.int64),
                "sim": np.array([], dtype=np.float64)})
        return pd.DataFrame({"vec_id": np.concatenate(out_v),
                             "neighbor_id": np.concatenate(out_n),
                             "sim": np.concatenate(out_s)})

    from ..util import bucket_map_keyed

    partial = bucket_map_keyed(tagged, ["cell"], _score_cells,
                               num_buckets=num_buckets)
    return _knn_finalize(partial, k)


def emb_kmeans_train(embeddings_ds, *, iters: int = 3):
    """Full distributed Lloyd's k-means (not just the E-step):
    -> (vec_id, cluster) after ``iters`` assign/recompute rounds from a
    deterministic per-label-mean initialization. The iterative-ML-training
    shape: each round is ONE shuffle-free assignment scan emitting
    per-cluster (sum, count) partials (np.add.at over cluster codes — the
    shuffle carries k x d partial rows per batch, never vectors) plus one
    tiny (cluster, dim) aggregate; the k x d centroid table round-trips
    through the driver between rounds (bounded by k, corpus-independent).

    Determinism contract (what makes an ITERATIVE float pipeline
    oracle-checkable): centroids are rounded to 4 decimals after every
    M-step — float-sum-order drift (engine partials vs SQL avg) is ~1e-16
    per round and would compound across rounds unpinned; rounding
    re-quantizes it away each iteration. Ties in the argmin break to the
    lowest cluster id; empty clusters keep their previous centroid."""
    from ..util import bucket_aggregate

    labels, C = _label_means(embeddings_ds)  # init: rounded per-label means
    k, d = C.shape

    def _assign_codes(t: pa.Table, C_: np.ndarray) -> np.ndarray:
        X = list_column_matrix(t.column("embedding"))
        csq = (C_ ** 2).sum(axis=1)
        return (csq - 2.0 * (X @ C_.T)).argmin(axis=1), X

    for _ in range(iters - 1):
        C_now = C  # bind for the closure

        def _partial(t: pa.Table) -> pa.Table:
            codes, X = _assign_codes(t, C_now)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, codes, X)
            cnts = np.bincount(codes, minlength=k).astype(np.int64)
            return pa.Table.from_arrays(
                [pa.array(np.repeat(labels, d)),
                 pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                 pa.array(sums.ravel()), pa.array(np.repeat(cnts, d))],
                names=["cluster", "dim", "s", "n"])

        agg = bucket_aggregate(
            embeddings_ds.map_batches(_partial, batch_format="pyarrow"),
            ["cluster", "dim"], {"s": ("s", "sum"), "n": ("n", "sum")},
        ).to_pandas()
        agg = agg[agg["n"] > 0]
        agg["c"] = (agg["s"] / agg["n"]).round(4)
        wide = agg.pivot(index="cluster", columns="dim", values="c")
        newC = C.copy()  # empty clusters keep their previous centroid
        pos = np.searchsorted(labels, wide.index.to_numpy())
        newC[pos] = wide.to_numpy(dtype=np.float64)
        C = newC

    C_fin = C

    def _final(t: pa.Table) -> pa.Table:
        codes, _ = _assign_codes(t, C_fin)
        return pa.Table.from_arrays(
            [t.column("vec_id").cast(pa.int64()), pa.array(labels[codes])],
            names=["vec_id", "cluster"])

    return embeddings_ds.map_batches(_final, batch_format="pyarrow")


def knn_mutual_pairs(embeddings_ds, *, k: int = 5, block_rows: int = 4096,
                     method: str = "auto",
                     exact_max_rows: int = 200_000,
                     n_clusters: int | None = None, nprobe: int = 8):
    """Mutual-kNN graph symmetrization: (vec_a, vec_b) with a < b where
    EACH vector is in the other's top-k — the standard denoising step
    before graph clustering (one-directional edges from a dense region
    into an outlier drop out).

    Scale shape: a kNN-graph build, then pairs normalize to (min, max)
    and ONE pair-keyed combiner count; an edge surviving with count 2 is
    mutual. Nothing beyond the k*n edge list is ever shuffled.

    ``method``: 'exact' = the O(n^2/block) ``knn_graph`` baseline;
    'ivf' = the sub-quadratic ``knn_graph_ivf``; 'auto' (default) counts
    the corpus once and routes past ``exact_max_rows`` vectors to the IVF
    graph with ``n_clusters ~ sqrt(n)`` — the guard that keeps mutual-kNN
    usable at 100 TB instead of inheriting the exact graph's quadratic
    wall."""
    import pyarrow.compute as pc

    from ..util import bucket_aggregate

    if method == "auto":
        n = embeddings_ds.count()
        method = "exact" if n <= exact_max_rows else "ivf"
    if method == "ivf":
        # n_clusters=None auto-sizes to max(16, sqrt(n)) inside knn_graph_ivf,
        # which also clamps nprobe to the cluster count
        edges = knn_graph_ivf(embeddings_ds, k=k, n_clusters=n_clusters,
                              nprobe=nprobe)
    else:
        edges = knn_graph(embeddings_ds, k=k, block_rows=block_rows)

    def _norm(t: pa.Table) -> pa.Table:
        a = t.column("vec_id").to_numpy(zero_copy_only=False)
        b = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        return pa.table({"vec_a": pa.array(np.minimum(a, b)),
                         "vec_b": pa.array(np.maximum(a, b))})

    counts = bucket_aggregate(
        edges.map_batches(_norm, batch_format="pyarrow"),
        ["vec_a", "vec_b"], {"n_dir": ("vec_a", "count")})

    def _mutual(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("n_dir"), 2)
        return t.filter(keep).select(["vec_a", "vec_b"])

    return counts.map_batches(_mutual, batch_format="pyarrow")


def pq_distortion(embeddings_ds, *, m: int = 4):
    """PQ reconstruction-distortion census — the codec-QA companion of
    ``ann_topk_pq`` (how much geometry the m-subspace code actually
    loses, per label): each vector is encoded with the SAME per-label
    sub-codebooks and argmin tie-break as the ANN operator, and the
    census reports per-label vector counts and mean/max L2 reconstruction
    error. -> (label, n_vecs, mean_err, max_err).

    Scale shape: one |labels| x d codebook reduce (broadcast via closure),
    then a single shuffle-free scan emitting per-label error partials
    into one |labels|-sized aggregate."""
    from ..util import bucket_aggregate

    labels, C = _label_means(embeddings_ds)
    if C.shape[1] % m:
        raise ValueError(f"dim {C.shape[1]} not divisible by m={m}")
    dsub = C.shape[1] // m
    csq = [(C[:, j * dsub:(j + 1) * dsub] ** 2).sum(axis=1)
           for j in range(m)]

    def _partial(t: pa.Table) -> pa.Table:
        X = list_column_matrix(t.column("embedding"))
        lab = t.column("label").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if X.size == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
                 pa.array([], type=pa.float64()),
                 pa.array([], type=pa.float64())],
                names=["label", "n_vecs", "sum_err", "max_err"])
        recon = np.empty_like(X, dtype=np.float64)
        for j in range(m):
            sl = slice(j * dsub, (j + 1) * dsub)
            codes = (csq[j] - 2.0 * (X[:, sl] @ C[:, sl].T)).argmin(axis=1)
            recon[:, sl] = C[codes][:, sl]
        err = np.sqrt(((X - recon) ** 2).sum(axis=1))
        df = pd.DataFrame({"label": lab, "err": err})
        g = df.groupby("label", sort=False)["err"].agg(
            n_vecs="size", sum_err="sum", max_err="max").reset_index()
        g["n_vecs"] = g["n_vecs"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    tot = bucket_aggregate(
        embeddings_ds.map_batches(_partial, batch_format="pyarrow"),
        ["label"], {"n_vecs": ("n_vecs", "sum"),
                    "sum_err": ("sum_err", "sum"),
                    "max_err": ("max_err", "max")}).to_pandas()
    tot["mean_err"] = np.round(tot["sum_err"] / tot["n_vecs"], 6)
    tot["max_err"] = np.round(tot["max_err"], 6)
    return tot[["label", "n_vecs", "mean_err", "max_err"]].sort_values(
        "label").reset_index(drop=True)
