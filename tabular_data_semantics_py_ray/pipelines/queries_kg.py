"""Oracle-checkable KG queries over the raw ``documents`` table (int doc_id).

These are the CEA/CTA/CPA analogues the driver verifies against DuckDB SQL
whose fixture tables are inline VALUES generated from the SAME Python data
(``fixture_kg``) — Ray and oracle can't drift. The flagship interleaved-span
pipeline (``kg_pipeline``) shares every kernel; this path only skips the
span plumbing so the SQL stays joinable on plain ``documents``.
"""

from __future__ import annotations

import pandas as pd

import ray

from .. import fixture_kg
from ..stages.canonicalize import partial_count, vote_types
from ..util import _to_arrow, drop_cols, fanout_blocks, rename_cols
from ..stages.linking import LinkScore
from ..stages.mention_detect import detect_mentions_flat_batch
from .kg_pipeline import read_documents


def _bk(backend: str | None):
    """Resolve a named KGBackend; None = the registered fixture backend.
    Queries that pin one of the four backend-protocol tables route
    through this, so a backend ingested from an RDF dump
    (pipelines/kg_ingest.py) is usable engine-wide, not just in the
    flagship linking path."""
    from ..state.backends import get_backend

    return get_backend(backend or "fixture")


def resolution_from_tables(
    lex: pd.DataFrame, alias: pd.DataFrame, types: pd.DataFrame
) -> pd.DataFrame:
    """surface_form -> linked entity (lowest-rank, canonical, non-disambig)
    from any backend's three raw tables — the same cascade LinkScore
    applies per batch (2-hop redirect closure, disambiguation drop,
    lowest-rank winner). Backend-agnostic so ingested KGs
    (pipelines/kg_ingest.py) resolve identically to the fixture."""
    from ..fixture_kg import DISAMBIGUATION_CLASS as _DAB

    redirects = alias[alias["kind"] == "redirect"]
    one = dict(zip(redirects["uri_a"], redirects["uri_b"]))
    canonical = {s: one.get(one.get(s, s), one.get(s, s)) for s in one}
    disambig = set(types.loc[types["type_uri"] == _DAB, "entity_uri"])
    lex = lex.copy()
    lex["entity_uri"] = lex["entity_uri"].map(lambda u: canonical.get(u, u))
    lex = lex[~lex["entity_uri"].isin(disambig)]
    lex = lex.sort_values(["surface_form", "rank"], kind="mergesort")
    return lex.drop_duplicates("surface_form")[["surface_form", "entity_uri"]]


def _surface_resolution_df() -> pd.DataFrame:
    """Fixture-backend resolution table (via the shared cascade above;
    LinkScore applies the identical logic batch-wise in the actor pool)."""
    return resolution_from_tables(
        fixture_kg.lexicon_df(),
        fixture_kg.alias_edges_df(),
        fixture_kg.entity_types_df(),
    )


from functools import lru_cache


@lru_cache(maxsize=1)
def _cached_resolution() -> pd.DataFrame:
    """Per-worker-process cache of the surface-resolution table (derived
    deterministically from the fixture — no broadcast needed)."""
    return _surface_resolution_df()


@lru_cache(maxsize=1)
def _cached_resolution_arrays():
    """(surface_form array, entity_uri array) — the Arrow form of the 1:1
    resolution table, derived once per worker process."""
    import pyarrow as pa

    res = _cached_resolution()
    return (pa.array(list(res["surface_form"]), type=pa.string()),
            pa.array(list(res["entity_uri"]), type=pa.string()))


def _link_mentions_arrow(t, forms_arr, ent_arr):
    """Arrow inner join of a mentions batch against a 1:1 surface
    resolution: index_in + gather; unresolved mentions drop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    m = t.column("mention")
    if isinstance(m, pa.ChunkedArray):
        m = m.combine_chunks()
    idx = pc.index_in(m, value_set=forms_arr)
    keep = idx.is_valid()
    return t.filter(keep).append_column(
        "entity_uri", ent_arr.take(idx.filter(keep)))


def _link_surface_batch(t):
    """Stateless task version of the surface linker: the tiny resolution
    table loads once per worker process via the lru_cache. Stateless tasks
    (not an actor pool) so stacked query pipelines can't deadlock on actor
    pool reservations at small cpu counts. Arrow-native: the corpus-sized
    mentions stream never converts to pandas."""
    return _link_mentions_arrow(t, *_cached_resolution_arrays())


def _linked_flat(sf_dir: str, backend: str | None = None):
    # fan the single-row-group documents file out so the stateless task
    # stages parallelize (shuffle-free repartition split)
    docs = read_documents(sf_dir, blocks=fanout_blocks(0.5))
    mentions = docs.map_batches(detect_mentions_flat_batch, batch_format="pyarrow")
    if backend is None:
        # fixture path: tiny resolution table derived per worker process
        # (lru_cache) — no broadcast traffic at all
        return mentions.map_batches(_link_surface_batch,
                                    batch_format="pyarrow")
    # named-backend path: the registry lives on the DRIVER (worker processes
    # import a fresh module), so resolve the backend here, derive the
    # resolution table once, and broadcast it (ray.put once; plasma-local
    # reads per task thereafter)
    from ..state.backends import get_backend

    be = get_backend(backend)
    res_ref = ray.put(
        resolution_from_tables(be.lexicon(), be.alias_edges(), be.entity_types())
    )

    _cache: dict = {}

    def _link(t):
        import pyarrow as pa

        arrs = _cache.get("a")
        if arrs is None:
            res = ray.get(res_ref)
            arrs = (pa.array(list(res["surface_form"]), type=pa.string()),
                    pa.array(list(res["entity_uri"]), type=pa.string()))
            _cache["a"] = arrs
        return _link_mentions_arrow(t, *arrs)

    return mentions.map_batches(_link, batch_format="pyarrow")


def cea_link(sf_dir: str, backend: str | None = None):
    """CEA analogue: (doc_id, mention, entity_uri, n_mentions). ``backend``
    names a registered KGBackend (e.g. one ingested from an RDF dump by
    pipelines/kg_ingest.py); None = the in-module fixture fast path."""
    linked = _linked_flat(sf_dir, backend)
    return rename_cols(
        partial_count(linked, ["doc_id", "mention", "entity_uri"]), {"n": "n_mentions"}
    )


def cta_doc_type(sf_dir: str):
    """CTA analogue: most-voted direct type per doc (deterministic
    tie-break count desc, type asc) -> (doc_id, type_uri)."""
    return vote_types(_linked_flat(sf_dir), key="doc_id")


def cta_type_ancestors(sf_dir: str, backend: str | None = None):
    """winner type expanded with ontology-closure ancestors (G3):
    (doc_id, type_uri, ancestor_uri, distance)."""
    winners = cta_doc_type(sf_dir)
    from ..util import _TableMap

    cmap = _TableMap(_bk(backend).class_closure(), "cls_uri")

    def _expand(t):
        import pyarrow as pa

        par, rows = cmap.expand(t.column("type_uri"))
        pi = pa.array(par)
        return pa.table({
            "doc_id": t.column("doc_id").take(pi),
            "type_uri": t.column("type_uri").take(pi),
            "ancestor_uri": cmap.col("ancestor_uri").take(rows),
            "distance": cmap.col("distance").take(rows),
        })

    return winners.map_batches(_expand, batch_format="pyarrow")


def cpa_cooccur(sf_dir: str):
    """CPA analogue: co-occurring entity pairs per doc ->
    (uri_a, uri_b, n_docs) with uri_a < uri_b. Pair expansion is one
    vectorized self-merge per bucket (no per-doc Python loop)."""
    from ..util import bucket_distinct, bucket_map_keyed

    linked = _linked_flat(sf_dir)
    ents = bucket_distinct(linked, ["doc_id", "entity_uri"])

    def _pairs_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket[["doc_id", "entity_uri"]]
        m = b.merge(b, on="doc_id", suffixes=("_a", "_b"))
        m = m[m["entity_uri_a"] < m["entity_uri_b"]]
        return pd.DataFrame({
            "uri_a": m["entity_uri_a"].astype("string"),
            "uri_b": m["entity_uri_b"].astype("string"),
        }).reset_index(drop=True)

    pairs = bucket_map_keyed(ents, ["doc_id"], _pairs_bucket)
    return rename_cols(partial_count(pairs, ["uri_a", "uri_b"]), {"n": "n_docs"})


def cpa_relation(sf_dir: str):
    """CPA proper: winning KG predicate per co-occurring entity pair.

    The reference's CPA task (test/mergeFiles.py:40 createTargetCPA) maps a
    column pair to the property connecting its cells' entities, discovered
    via per-entity predicate queries (kg/endpoints.py:135-141
    getPredicatesForSubject/Object). Analogue here: directed entity pairs
    co-occurring in >=1 doc, joined against the local statement table; the
    winner per (subj, obj) is the predicate with the most supporting docs,
    ties broken by predicate URI asc (deterministic, like the reference's
    sorted-candidate convention).

    Output: (subj, pred, obj, n_docs). Scale shape: pair counting shuffles
    on doc_id then on the pair key (both two-phase); the statement table is
    KG-bounded and tiny, so the predicate join is a closure-shipped
    broadcast inside one shuffle-free pass — never an all-to-all.
    """
    from ..util import bucket_distinct, bucket_map_keyed

    linked = _linked_flat(sf_dir)
    ents = bucket_distinct(linked, ["doc_id", "entity_uri"])

    def _dir_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket[["doc_id", "entity_uri"]]
        m = b.merge(b, on="doc_id", suffixes=("_a", "_b"))
        m = m[m["entity_uri_a"] != m["entity_uri_b"]]
        return pd.DataFrame({
            "uri_a": m["entity_uri_a"].astype("string"),
            "uri_b": m["entity_uri_b"].astype("string"),
        }).reset_index(drop=True)

    pairs = bucket_map_keyed(ents, ["doc_id"], _dir_pairs)
    counts = rename_cols(
        partial_count(pairs, ["uri_a", "uri_b"]), {"n": "n_docs"})

    stmts = fixture_kg.statements_df()  # KG-bounded tiny table (broadcast)

    def _winner(b: pd.DataFrame) -> pd.DataFrame:
        m = b.merge(stmts, left_on=["uri_a", "uri_b"],
                    right_on=["subj", "obj"])
        if m.empty:
            return pd.DataFrame({
                "subj": pd.Series([], dtype="string"),
                "pred": pd.Series([], dtype="string"),
                "obj": pd.Series([], dtype="string"),
                "n_docs": pd.Series([], dtype="int64"),
            })
        m = m.sort_values(["subj", "obj", "n_docs", "pred"],
                          ascending=[True, True, False, True])
        m = m.drop_duplicates(["subj", "obj"], keep="first")
        return pd.DataFrame({
            "subj": m["subj"].astype("string"),
            "pred": m["pred"].astype("string"),
            "obj": m["obj"].astype("string"),
            "n_docs": m["n_docs"].astype("int64"),
        }).reset_index(drop=True)

    # counts is already distinct per (uri_a, uri_b): the winner selection is
    # batch-local once pairs are co-located, which partial_count's keyed
    # output already guarantees.
    return counts.map_batches(_winner, batch_format="pandas")


def fuzzy_entity_match(sf_dir: str, threshold: float = 0.2,
                       backend: str | None = None):
    """Fuzzy string-similarity join: corpus vocabulary x entity names by
    character-trigram Jaccard — the client-side analogue of the fuzzy
    matching the reference delegates to the lookup service
    (kg/lookup.py getKGEntities surface-form search; names minted per
    util/utilities.py:44 getEntityName). -> (token, entity_uri, sim) for
    all pairs with trigram-Jaccard >= threshold.

    Scale shape: ONE shuffle (the corpus-vocabulary distinct); the entity
    side is KG-bounded, so its trigram inverted index ships in the scan
    closure and blocking+verification are batch-local vectorized pandas
    merges (same block-then-verify shape as the near-dup family, cross-
    table). Trigram expansion of the vocabulary is one Arrow slice kernel
    per character offset — no per-token Python loop.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..util import bucket_distinct

    docs = read_documents(sf_dir, blocks=fanout_blocks(0.5))

    def _toks(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t.column("text"), " "))
        u = pc.unique(flat)
        u = u.filter(pc.greater_equal(pc.utf8_length(u), 3))
        return pa.table({"token": u})

    toks = bucket_distinct(
        docs.map_batches(_toks, batch_format="pyarrow", batch_size=None),
        ["token"])

    lex = _bk(backend).lexicon()
    uris = sorted(set(lex["entity_uri"]))

    def _grams(s: str) -> set[str]:
        return {s[i:i + 3] for i in range(len(s) - 2)}

    ent = pd.DataFrame(
        [(u, g) for u in uris for g in _grams(u.rsplit("/", 1)[-1].lower())],
        columns=["entity_uri", "g"])
    ent_n = ent.groupby("entity_uri").size()

    def _match(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "token": pd.Series([], dtype="string"),
            "entity_uri": pd.Series([], dtype="string"),
            "sim": pd.Series([], dtype="float64")})
        if not len(b):
            return empty
        tokens = b["token"].astype(str).to_numpy()
        ta = pa.array(tokens)
        parts = []
        for j in range(int(max(len(t) for t in tokens)) - 2):
            g = pc.utf8_slice_codeunits(ta, j, j + 3)
            keep = pc.equal(pc.utf8_length(g), 3).to_numpy(
                zero_copy_only=False)
            parts.append(pd.DataFrame({
                "token": tokens[keep],
                "g": g.to_pandas().to_numpy()[keep]}))
        tg = pd.concat(parts, ignore_index=True).drop_duplicates()
        tn = tg.groupby("token").size().rename("tn")
        sh = (tg.merge(ent, on="g")
              .groupby(["token", "entity_uri"]).size().reset_index(name="s"))
        if not len(sh):
            return empty
        sh = sh.join(tn, on="token")
        sh["en"] = sh["entity_uri"].map(ent_n)
        raw = sh["s"] / (sh["tn"] + sh["en"] - sh["s"])
        # threshold on the UNROUNDED similarity, round only for output
        sh = sh[raw >= threshold]
        return pd.DataFrame({
            "token": sh["token"].astype("string"),
            "entity_uri": sh["entity_uri"].astype("string"),
            "sim": np.round(raw[raw >= threshold], 6),
        }).reset_index(drop=True)

    return toks.map_batches(_match, batch_format="pandas")


def alias_canonical_map(sf_dir: str, backend: str | None = None):
    """Canonicalization map from raw alias edges (J3/D2): (uri, canonical).

    Input-independent of sf_dir (fixture edges), computed by the runtime
    closure code; the oracle recomputes the closure in SQL from raw edges.
    """
    from ..stages.canonicalize import resolve_alias_closure

    return resolve_alias_closure(_bk(backend).alias_edges())


def media_manifest(sf_dir: str):
    """Media spans of the derived interleaved docs ->
    (doc_id:int64, chunk_idx:int64, media_kind, media_ref)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.interleave import interleave

    docs = interleave(read_documents(sf_dir))

    def _extract(t: pa.Table) -> pa.Table:
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        kinds = flat.field("kind")
        keep = pc.invert(pc.equal(kinds, "text"))
        sel = pa.array(np.nonzero(keep.to_numpy(zero_copy_only=False))[0])
        refs = flat.field("media_ref").take(sel)
        # media://<doc>/<chunk>
        parts = pc.split_pattern(pc.replace_substring(refs, "media://", ""), "/")
        doc_num = pc.list_element(parts, 0).cast(pa.int64())
        chunk = pc.list_element(parts, 1).cast(pa.int64())
        return pa.Table.from_arrays(
            [doc_num, chunk, kinds.take(sel), refs],
            names=["doc_id", "chunk_idx", "media_kind", "media_ref"],
        )

    return docs.map_batches(_extract, batch_format="pyarrow")


def media_features(sf_dir: str):
    """Multimodal decode/featurize plumbing, oracle-checked end-to-end:
    media spans -> actor-pool featurizer (md5-derived deterministic fake,
    stages/multimodal.py) -> exploded (doc_id, chunk_idx, media_kind, dim,
    value) rows. ``value`` is re-derived in float64 from the recovered md5
    byte so engine and DuckDB compute the identical double."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.interleave import interleave
    from ..stages.multimodal import FEATURE_DIM, featurize_media

    docs = interleave(read_documents(sf_dir, blocks=fanout_blocks(0.25)))
    feats = featurize_media(docs)

    def _explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        refs = t.column("media_ref")
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        parts = pc.split_pattern(
            pc.replace_substring(refs, "media://", ""), "/")
        doc_num = pc.list_element(parts, 0).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        chunk = pc.list_element(parts, 1).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        kinds = t.column("kind").to_pylist()
        flat = pc.list_flatten(
            t.column("feature").combine_chunks()
            if isinstance(t.column("feature"), pa.ChunkedArray)
            else t.column("feature"))
        f32 = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        byte = np.rint(f32 * 255.0).astype(np.int64)  # exact byte recovery
        value = np.round(byte / 255.0, 6)
        dim = np.tile(np.arange(FEATURE_DIM, dtype=np.int64), n)
        return pa.Table.from_arrays(
            [
                pa.array(np.repeat(doc_num, FEATURE_DIM)),
                pa.array(np.repeat(chunk, FEATURE_DIM)),
                pa.array(np.repeat(np.asarray(kinds, dtype=object),
                                   FEATURE_DIM).tolist(), type=pa.string()),
                pa.array(dim),
                pa.array(value),
            ],
            names=["doc_id", "chunk_idx", "media_kind", "dim", "value"],
        )

    return feats.map_batches(_explode, batch_format="pyarrow")


def pred_census(sf_dir: str):
    """G5 predicate census over the flagship triples:
    (pred, n_triples, n_subj, n_obj) with exact distinct counts.

    ONE pass over the triples and ONE shuffle (the earlier version
    materialized the full triple set in the object store and scanned it
    three times — corpus-sized pinning, the round-1 anti-pattern): each
    batch emits a tagged partial stream — per-pred triple-count rows plus
    batch-distinct (pred, role, val) rows — which co-locates by
    (pred, role, val) so per-bucket reduction yields (pred, role, c)
    partials; the driver merges |buckets| x |preds| x 3 rows."""
    from ..util import bucket_map_keyed

    from .kg_pipeline import build_triples

    triples = build_triples(sf_dir)
    cols = ["pred", "role", "val", "n"]

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        cnt = b.groupby("pred", sort=False).size().reset_index(name="n")
        cnt["role"] = "triple"
        cnt["val"] = ""
        s = b[["pred", "subj"]].drop_duplicates().rename(
            columns={"subj": "val"})
        s["role"] = "subj"
        s["n"] = 1
        o = b[["pred", "obj"]].drop_duplicates().rename(
            columns={"obj": "val"})
        o["role"] = "obj"
        o["n"] = 1
        out = pd.concat([cnt[cols], s[cols], o[cols]], ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = g[g["role"] == "triple"].groupby("pred", sort=False)["n"].sum(
        ).reset_index(name="c")
        t["role"] = "triple"
        d = g[g["role"] != "triple"].drop_duplicates(
            ["pred", "role", "val"]).groupby(
            ["pred", "role"], sort=False).size().reset_index(name="c")
        out = pd.concat([t[["pred", "role", "c"]],
                         d[["pred", "role", "c"]]], ignore_index=True)
        out["c"] = out["c"].astype("int64")
        return out

    parts = bucket_map_keyed(
        triples.map_batches(_partial, batch_format="pandas"),
        ["pred", "role", "val"], _bucket).to_pandas()
    wide = parts.groupby(["pred", "role"])["c"].sum().unstack("role")
    return pd.DataFrame({
        "pred": wide.index,
        "n_triples": wide["triple"].astype("int64").to_numpy(),
        "n_subj": wide["subj"].astype("int64").to_numpy(),
        "n_obj": wide["obj"].astype("int64").to_numpy(),
    }).reset_index(drop=True)


def neighborhood_topk(sf_dir: str, k: int = 5):
    """J5/T3: per-subject triple neighborhood capped at k, deterministic
    order (pred asc, obj asc) -> (subj, pred, obj)."""
    from ..util import bucket_map_keyed
    from .kg_pipeline import build_triples

    triples = build_triples(sf_dir)

    def _head(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["subj", "pred", "obj"], kind="mergesort")
        return g.groupby("subj", sort=False).head(k)[["subj", "pred", "obj"]]

    return bucket_map_keyed(triples, ["subj"], _head)


def docs_without_customer(sf_dir: str):
    """J8 anti-join: doc_ids with no linked mention of the Customer entity
    (~ 'generated entities minus training entities', kg/dbpedia.py:89-105).
    Both sides hash-partitioned, no broadcast."""
    from ..constants import ENT
    from ..util import bucket_anti_join, select_cols

    docs = select_cols(read_documents(sf_dir), ["doc_id"])
    linked = _linked_flat(sf_dir)

    def _cust_only(t):
        import pyarrow.compute as pc

        f = t.filter(pc.equal(t.column("entity_uri"), ENT + "Customer"))
        return f.select(["doc_id"]).group_by(
            ["doc_id"], use_threads=False).aggregate([])

    cust_docs = linked.map_batches(_cust_only, batch_format="pyarrow")
    return bucket_anti_join(docs, cust_docs, key="doc_id")


def prop_kind(sf_dir: str):
    """A9 property-kind classifier: per predicate of the statement table,
    majority vote on whether DISTINCT object values look like URIs ->
    (pred, n_values, n_uris, is_object). Rule n_uris > n_values/2 mirrors
    oaei/dbpedia_fragment.py:486-489; the reference's <=100-value sample cap
    (a remote-endpoint optimization) is dropped — exact majority over all
    distinct values is its deterministic generalization."""
    import ray.data as rd

    from ..util import bucket_aggregate, bucket_distinct

    st = rd.from_arrow(_to_arrow(fixture_kg.statements_df()))
    d = bucket_distinct(st, ["pred", "obj"], num_buckets=8)

    def _flag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["is_uri"] = b["obj"].str.startswith("http").astype("int64")
        return b[["pred", "is_uri"]]

    flagged = d.map_batches(_flag, batch_format="pandas")
    agg = bucket_aggregate(
        flagged, ["pred"],
        {"n_values": ("is_uri", "count"), "n_uris": ("is_uri", "sum")},
        num_buckets=4,
    )

    def _verdict(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["is_object"] = b["n_uris"] > b["n_values"] / 2.0
        return b

    return agg.map_batches(_verdict, batch_format="pandas")


def depth_stats(sf_dir: str, backend: str | None = None):
    """G7 depth statistics (~ sem_tab/CTA_Wikidata_Statistic.py:1-27): over
    all per-doc winning types, the count / mean / max of the winner's
    taxonomy depth (max ancestor distance) -> one row."""
    from ..util import bucket_aggregate

    closure = _bk(backend).class_closure()
    depth = closure.groupby("cls_uri")["distance"].max().astype("int64")
    depth_map = dict(depth)

    winners = vote_types(_linked_flat(sf_dir), key="doc_id")

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    d_keys = pa.array(sorted(depth_map), type=pa.string())
    d_vals = np.array([depth_map[k] for k in sorted(depth_map)],
                      dtype=np.int64)

    def _with_depth(t):
        idx_a = pc.index_in(t.column("type_uri"), value_set=d_keys)
        assert idx_a.null_count == 0  # every winner type is in the closure
        idx = idx_a.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "_k": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "d": pa.array(d_vals[idx]),
        })

    agg = bucket_aggregate(
        winners.map_batches(_with_depth, batch_format="pyarrow"),
        ["_k"],
        {"n_docs": ("d", "count"), "sum_d": ("d", "sum"),
         "max_depth": ("d", "max")},
        num_buckets=1,
    )

    def _final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["avg_depth"] = (b["sum_d"] / b["n_docs"]).round(4)
        return b[["n_docs", "avg_depth", "max_depth"]]

    return agg.map_batches(_final, batch_format="pandas")


def class_sample(sf_dir: str, k: int = 3, backend: str | None = None):
    """J7/T4 per-class member sampling, made deterministic: per class up to
    k linked corpus entities ordered by md5(entity_uri) — a hash-ordered
    sample replacing the reference's ORDER BY RAND() paging
    (kg/endpoints.py:413-425), reproducible on any cluster and in SQL ->
    (type_uri, entity_uri, sample_rank)."""
    return _class_sample_from(_linked_flat(sf_dir, backend), k, backend)


def _class_sample_from(linked, k: int = 3, backend: str | None = None):
    import hashlib

    from ..util import bucket_distinct, bucket_map_keyed

    types = _bk(backend).entity_types()
    ents = bucket_distinct(linked, ["entity_uri"], num_buckets=8)

    def _join_types(b: pd.DataFrame) -> pd.DataFrame:
        return b.merge(types, on="entity_uri")[["type_uri", "entity_uri"]]

    typed = ents.map_batches(_join_types, batch_format="pandas")

    def _sample(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.copy()
        b["_h"] = b["entity_uri"].map(
            lambda u: hashlib.md5(u.encode()).hexdigest())
        b = b.sort_values(["type_uri", "_h", "entity_uri"], kind="mergesort")
        b["sample_rank"] = b.groupby("type_uri", sort=False).cumcount() + 1
        b = b[b["sample_rank"] <= k]
        return b[["type_uri", "entity_uri", "sample_rank"]]

    return bucket_map_keyed(typed, ["type_uri"], _sample, num_buckets=8)


def class_confirm(sf_dir: str, k: int = 3):
    """A7 sampling validator (matching/kg_matching.py:125-211): for each
    per-class sampled entity, re-derive its types through the full repair
    cascade and record whether the class is confirmed, plus which strategy
    resolved the entity — the per-strategy confirm counters become an
    aggregable column -> (type_uri, entity_uri, strategy, confirmed).

    The reference pages entities with ORDER BY RAND(); here the sample is
    the deterministic md5-ordered ``class_sample`` so engine and oracle
    agree row-for-row."""
    import numpy as np
    import pyarrow as pa

    from ..stages.type_repair import typed_repair
    from ..util import bucket_map_keyed, select_cols

    # ONE linking scan feeds both the sampler and the repair cascade; the
    # pinned intermediate is the DISTINCT entity set (KG-bounded — the
    # lexicon's size, not the corpus's mention count; the raw linked
    # stream grows with the corpus and must not be materialized)
    from ..util import bucket_distinct

    linked = bucket_distinct(
        select_cols(_linked_flat(sf_dir), ["entity_uri"]),
        ["entity_uri"], num_buckets=8).materialize()
    sample = _class_sample_from(linked, k=k)
    repaired = typed_repair(linked)

    def _tag(side):
        def _f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            strat = (t.column("strategy") if side == 1
                     else pa.nulls(n, pa.string()))
            rank = (t.column("sample_rank").cast(pa.int64()) if side == 0
                    else pa.nulls(n, pa.int64()))
            return pa.Table.from_arrays(
                [t.column("entity_uri").cast(pa.string()),
                 t.column("type_uri").cast(pa.string()),
                 strat if side == 1 else pa.nulls(n, pa.string()),
                 rank,
                 pa.array(np.full(n, side, dtype=np.int8))],
                names=["entity_uri", "type_uri", "strategy", "sample_rank",
                       "_side"],
            )

        return _f

    tagged = sample.map_batches(_tag(0), batch_format="pyarrow").union(
        repaired.map_batches(_tag(1), batch_format="pyarrow"))

    def _confirm(g: pd.DataFrame) -> pd.DataFrame:
        s = g.loc[g["_side"] == 0, ["entity_uri", "type_uri"]]
        r = g.loc[g["_side"] == 1, ["entity_uri", "type_uri", "strategy"]]
        strat = r.groupby("entity_uri")["strategy"].min()
        rset = set(zip(r["entity_uri"], r["type_uri"]))
        out = s.copy()
        out["strategy"] = out["entity_uri"].map(strat).fillna("none")
        out["confirmed"] = [
            (e, t) in rset for e, t in zip(out["entity_uri"], out["type_uri"])
        ]
        return out.astype({"strategy": "string", "confirmed": "bool"})

    return bucket_map_keyed(tagged, ["entity_uri"], _confirm, num_buckets=8)


def doc_most_specific_types(sf_dir: str, backend: str | None = None):
    """G2 per doc: distinct direct types of its linked entities, reduced to
    the most-specific set (Agent removed; strict ancestors of another member
    removed) -> (doc_id, type_uri) rows."""
    from ..constants import AGENT_CLASS
    from ..stages.canonicalize import join_types_batches
    from ..util import bucket_distinct, bucket_map_keyed

    closure = _bk(backend).class_closure()
    anc: dict[str, set] = {}
    for r in closure.itertuples(index=False):
        anc.setdefault(r.cls_uri, set()).add(r.ancestor_uri)

    linked = _linked_flat(sf_dir)
    typed = join_types_batches(linked)
    dtypes = bucket_distinct(typed, ["doc_id", "type_uri"])

    def _reduce(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for doc, g in bucket.groupby("doc_id", sort=False):
            members = {t for t in g["type_uri"] if t != AGENT_CLASS}
            keep = sorted(
                t for t in members
                if not any(t in anc.get(o, set()) for o in members if o != t)
            )
            outs.append(pd.DataFrame({"doc_id": doc, "type_uri": keep}))
        if not outs:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "type_uri": pd.Series([], dtype="string")})
        return pd.concat(outs, ignore_index=True)

    return bucket_map_keyed(dtypes, ["doc_id"], _reduce)


# --------------------------------------------------------------------------
# Cell normalization + KG-prefix whitelist link (M1 + M3/M4/M5 wired).
# --------------------------------------------------------------------------
@lru_cache(maxsize=1)
def _cell_norm_resolution() -> pd.DataFrame:
    """surface_form -> entity for the whitelist-filtered candidate union.

    Candidates are the primary lexicon UNIONed with KG2-aliased candidates
    at rank 0 (they would out-rank every primary candidate), so the
    KG-prefix whitelist (M3/M4, util/utilities.py:18-41; M5 result-URI
    whitelist, kg/lookup.py:422-435) is load-bearing: without it 'fast' and
    'slow' would resolve into the kg2 namespace. After the whitelist, the
    standard top-k / redirect / disambiguation / lowest-rank resolution.
    """
    import pyarrow as pa

    from ..constants import ENT
    from ..functions.text import prefix_mask_batch

    scorer = LinkScore()
    lex = fixture_kg.lexicon_df()
    kg2 = fixture_kg.kg2_sameas_df()
    kg2lex = lex.merge(kg2, on="entity_uri")[["surface_form", "kg2_uri"]]
    kg2lex = kg2lex.rename(columns={"kg2_uri": "entity_uri"})
    kg2lex["rank"] = 0
    cand = pd.concat([lex, kg2lex], ignore_index=True)
    mask = prefix_mask_batch(pa.array(cand["entity_uri"]), (ENT,))
    cand = cand[mask.to_numpy(zero_copy_only=False)]
    cand = cand[cand["rank"] <= 3].copy()  # T1 top-k
    cand["entity_uri"] = cand["entity_uri"].map(
        lambda u: scorer.canonical.get(u, u))
    cand = cand[~cand["entity_uri"].isin(scorer.disambig)]
    cand = cand.sort_values(["surface_form", "rank"], kind="mergesort")
    return cand.drop_duplicates("surface_form")[["surface_form", "entity_uri"]]


def _cells_items_batch(b: pd.DataFrame) -> pd.DataFrame:
    """documents batch -> (doc_id, item) lookup items.

    Builds a bracketed cell per doc — ``tok0 (tok1)`` when the doc has >= 2
    tokens, else the raw text — then runs the M1 bracket-normalization
    kernel (kg/dbpedia.py:19-31,59-70): the stripped main text AND each
    bracket content become separate lookup items, min length 3.
    """
    import numpy as np
    import pyarrow as pa

    from ..functions.text import normalize_mentions_batch

    toks = b["text"].str.split(" ")
    t0, t1 = toks.str[0], toks.str[1]
    cell = np.where(t1.notna(), t0 + " (" + t1 + ")", b["text"])
    items = normalize_mentions_batch(pa.array(cell, type=pa.string()))
    par = items.column("parent_idx").to_numpy()
    return pd.DataFrame({
        "doc_id": b["doc_id"].to_numpy()[par],
        "item": items.column("item").to_pylist(),
    })


def _link_items_batch(b: pd.DataFrame) -> pd.DataFrame:
    return b.merge(
        _cell_norm_resolution(), left_on="item", right_on="surface_form"
    ).drop(columns=["surface_form"])


def cell_norm_link(sf_dir: str):
    """M1+M3/M4/M5 end-to-end: (doc_id, item, entity_uri, n_items)."""
    docs = read_documents(sf_dir, blocks=fanout_blocks(0.5))
    items = docs.map_batches(_cells_items_batch, batch_format="pandas")
    linked = items.map_batches(_link_items_batch, batch_format="pandas")
    return rename_cols(
        partial_count(linked, ["doc_id", "item", "entity_uri"]),
        {"n": "n_items"},
    )


def gt_repair_customer(sf_dir: str):
    """M18 end-to-end: CEA GT with deterministically-corrupted cell
    addresses over the ``customer`` table, repaired by the co-located
    validation join (``gt_repair.repair_cea_gt``).

    Deterministic corruption (mirrored verbatim in the oracle SQL):
    - cells: col0 = custkey, col1 = name, col2 = nationkey (as strings);
    - GT points at col 1 (the name column), except custkey % 5 == 0 rows
      whose col is rewritten to 7 — an address that does not exist
      (the reference's IndexError branch, test/error_detection.py:40-66);
    - the mention table drops custkey % 10 == 0 rows, so half the broken
      addresses are unrepairable (the reference's printed 'Problem with'
      branch becomes ``repaired = False`` with the column left as-is).
    """
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..constants import ENT
    from .gt_repair import repair_cea_gt

    from ..util import read_parquet_clean

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
    ).repartition(fanout_blocks(0.25))

    def _cells(t: pa.Table) -> pa.Table:
        key = t.column("c_custkey").to_numpy()
        vals = [
            pa.array(key.astype(str)),
            t.column("c_name").cast(pa.string()).combine_chunks(),
            pa.array(t.column("c_nationkey").to_numpy().astype(str)),
        ]
        n = len(key)
        parts = []
        for col, v in enumerate(vals):
            parts.append(pa.Table.from_arrays(
                [pa.array(np.repeat("customer", n)),
                 pa.array(key, type=pa.int64()),
                 pa.array(np.full(n, col, dtype=np.int32)),
                 v],
                names=["table_id", "row", "col", "value"]))
        return pa.concat_tables(parts)

    def _gt(t: pa.Table) -> pa.Table:
        key = t.column("c_custkey").to_numpy()
        name = t.column("c_name").to_pandas()
        col = np.where(key % 5 == 0, 7, 1).astype(np.int32)
        return pa.Table.from_arrays(
            [pa.array(np.repeat("customer", len(key))),
             pa.array(col, type=pa.int32()),
             pa.array(key, type=pa.int64()),
             pa.array((ENT + name).to_numpy())],
            names=["table_id", "col", "row", "entity_uri"])

    def _mentions(t: pa.Table) -> pa.Table:
        mask = pa.array(t.column("c_custkey").to_numpy() % 10 != 0)
        kept = t.filter(mask)
        return pa.Table.from_arrays(
            [pa.array(np.repeat("customer", kept.num_rows)),
             kept.column("c_custkey").cast(pa.int64()).combine_chunks(),
             kept.column("c_name").cast(pa.string()).combine_chunks()],
            names=["table_id", "row", "mention"])

    gt = cust.map_batches(_gt, batch_format="pyarrow")
    cells = cust.map_batches(_cells, batch_format="pyarrow")
    mentions = cust.map_batches(_mentions, batch_format="pyarrow")
    return repair_cea_gt(gt, cells, mentions)


def _media_of_kind(sf_dir: str, kind: str):
    import pyarrow as pa

    def _f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t.column("media_kind"), kind))

    return media_manifest(sf_dir).map_batches(_f, batch_format="pyarrow")


def media_frames(sf_dir: str):
    """Frame-sampling plumbing, oracle-checked end-to-end: time-based
    (audio) media spans -> actor-pool FrameSampler -> one row per sampled
    frame (doc_id, chunk_idx, frame_idx, ts_ms, frame_md5)."""
    from ..stages.multimodal import sample_frames
    from ..util import select_cols

    frames = sample_frames(_media_of_kind(sf_dir, "audio"))
    return select_cols(
        frames, ["doc_id", "chunk_idx", "frame_idx", "ts_ms", "frame_md5"])


def media_resize(sf_dir: str):
    """Image-resize plumbing, oracle-checked end-to-end: image media spans
    -> actor-pool ImageResizer -> (doc_id, chunk_idx, src_w, src_h, out_w,
    out_h, data_md5)."""
    from ..stages.multimodal import resize_images
    from ..util import select_cols

    resized = resize_images(_media_of_kind(sf_dir, "image"))
    return select_cols(
        resized,
        ["doc_id", "chunk_idx", "src_w", "src_h", "out_w", "out_h",
         "data_md5"])


def _pagerank_single_task(edges, *, iters: int, damping: float,
                          personalized: bool = False):
    """Power iteration over a coalesced edge block: one numpy task (same
    fast-path rationale as ``dedup.dedup_components`` — each distributed
    round costs two all-to-all barriers that dwarf an in-memory solve for
    any edge list that fits a worker). ``personalized=True`` restarts to
    the lexicographically smallest node (r0 = indicator, base term
    (1-d) * indicator) instead of the uniform vector."""
    import numpy as np
    import pyarrow as pa

    def _pr(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        eu, ev = inv[: len(u)], inv[len(u):]
        n = len(nodes)
        deg = np.bincount(eu, minlength=n)  # dangling rows never divide
        if personalized:
            p = np.zeros(n)
            p[0] = 1.0  # np.unique sorts: index 0 IS the min node
            base = (1 - damping) * p
            r = p.copy()
        else:
            base = (1 - damping) / n
            r = np.full(n, 1.0 / n)
        for _ in range(iters):
            s = np.zeros(n)
            np.add.at(s, ev, r[eu] / deg[eu])
            r = base + damping * s
        return pa.Table.from_arrays(
            [pa.array(nodes, type=pa.string()), pa.array(np.round(r, 6))],
            names=["node", "pagerank"])

    return edges.repartition(1).map_batches(
        _pr, batch_format="pyarrow", batch_size=None)


def pagerank(sf_dir: str, *, iters: int = 5, damping: float = 0.85,
             single_task_max_edges: int = 50_000_000):
    """PageRank over the materialized KG triple graph — the graph-analytics
    consumer of the flagship's output (the reference stops at emitting
    triples; ranking the resulting entity graph is the canonical next step
    a KG-construction user runs, and the classic iterative-dataflow stress
    test for the engine).

    Semantics (simplified PageRank, dangling mass dropped): nodes = distinct
    subj ∪ obj of the URI-object triple edges; r0 = 1/N;
    r_{i+1}(v) = (1-d)/N + d * Σ_{u->v} r_i(u)/outdeg(u), `iters` fixed
    iterations, rank rounded to 6 at the end.

    Ray shape: the distinct edge list is materialized once (edge-bounded,
    never the corpus); up to ``single_task_max_edges`` the power iteration
    runs as ONE numpy task (``_pagerank_single_task`` — same fast-path
    rationale as dedup_components), beyond it the distributed loop pays
    2 bucket shuffles per iteration — ONE hash-partitioned join
    of the current ranks against the outdeg-annotated edge list (the
    contribution emit and a per-bucket partial sum are fused into the join
    via ``post``, so the second shuffle carries pre-combined (node, s)
    partials), then one bucket aggregate that also folds in a zero row per
    node (nodes without in-links keep the base term). Ranks are
    node-bounded; each iteration materializes them to truncate lineage —
    at 100 TB checkpoint ranks to parquet per iteration instead (the
    components operator documents the same trade).

    Float parity with the oracle: contributions are summed FIRST and
    multiplied by d after the final aggregate (matching SQL's
    ``d * sum(r/outdeg)``), and the base term uses ``1 - d`` exactly as the
    SQL writes it, so both sides evaluate identical double expressions;
    summation order differs only at ~1e-16 relative, hidden by the final
    round(6).
    """
    edges = _kg_uri_edges(sf_dir)
    if edges.count() <= single_task_max_edges:
        return _pagerank_single_task(edges, iters=iters, damping=damping)
    return _pagerank_distributed(edges, iters=iters, damping=damping)


def _kg_uri_edges(sf_dir: str):
    """Distinct (subj, obj) URI-object edge list of the materialized KG —
    edge-bounded and materialized once (re-scanned per power iteration)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..util import bucket_distinct
    from .kg_pipeline import build_triples

    def _edges_batch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("obj_is_literal")))
        return pa.Table.from_arrays(
            [t.column("subj"), t.column("obj")], names=["u", "v"])

    return bucket_distinct(
        build_triples(sf_dir).map_batches(_edges_batch,
                                          batch_format="pyarrow"),
        ["u", "v"]).materialize()


def pagerank_personalized(sf_dir: str, *, iters: int = 5,
                          damping: float = 0.85,
                          single_task_max_edges: int = 50_000_000):
    """Personalized PageRank (random walk with restart) over the KG triple
    graph — the 'entities related to THIS one' ranking that powers
    neighborhood exploration and related-entity suggestions. Seeded at the
    lexicographically smallest node so the query is deterministic and
    oracle-reproducible; r0 is the seed indicator and the restart mass
    (1-d) concentrates on the seed instead of spreading uniformly. Shares
    ``pagerank``'s single-task / distributed routing and per-iteration
    shuffle shape."""
    edges = _kg_uri_edges(sf_dir)
    if edges.count() <= single_task_max_edges:
        return _pagerank_single_task(edges, iters=iters, damping=damping,
                                     personalized=True)
    return _pagerank_distributed(edges, iters=iters, damping=damping,
                                 personalized=True)


def _pagerank_distributed(edges, *, iters: int, damping: float,
                          personalized: bool = False):
    """Distributed power iteration over a (u, v) string-keyed edge Dataset
    (see ``pagerank`` for the per-iteration shuffle shape).
    ``personalized=True`` restarts to the lexicographically smallest node;
    the seed is found with per-batch partial mins (KB-sized reduce)."""
    import numpy as np
    import pyarrow as pa

    from ..util import bucket_aggregate, bucket_distinct, bucket_join

    outdeg = bucket_aggregate(edges, ["u"], {"d": ("u", "count")})
    eout = bucket_join(
        edges, outdeg, key="u", left_cols={"v": pa.string()},
        right_cols={"d": pa.int64()}, key_type=pa.string()).materialize()

    def _nodes_batch(t: pa.Table) -> pa.Table:
        u, v = (t.column(c).combine_chunks() for c in ("u", "v"))
        both = pa.concat_arrays(
            (u.chunks if isinstance(u, pa.ChunkedArray) else [u])
            + (v.chunks if isinstance(v, pa.ChunkedArray) else [v]))
        return pa.Table.from_arrays([both], names=["n"])

    nodes = bucket_distinct(
        edges.map_batches(_nodes_batch, batch_format="pyarrow"), ["n"]
    ).materialize()
    n_nodes = nodes.count()
    if personalized:
        import pyarrow.compute as pc

        # seed = global min node via per-batch partial mins (KB reduce)
        seed = min(
            pc.min(b.column("n")).as_py()
            for b in nodes.iter_batches(batch_format="pyarrow")
            if b.num_rows)
        base = None
    else:
        seed = None
        base = (1 - damping) / n_nodes

    def _init(t: pa.Table) -> pa.Table:
        if personalized:
            nv = t.column("n").to_numpy(zero_copy_only=False)
            return t.append_column(
                "r", pa.array((nv == seed).astype(np.float64)))
        return t.append_column(
            "r", pa.array(np.full(t.num_rows, 1.0 / n_nodes)))

    def _zero(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("n"), pa.array(np.zeros(t.num_rows))],
            names=["n", "s"])

    def _contrib(j: pd.DataFrame) -> pd.DataFrame:
        # fused into the join bucket: emit r/outdeg per edge, pre-combined
        # by target node so the downstream shuffle moves partials only
        s = (j["r"] / j["d"]).groupby(j["v"]).sum()
        return pd.DataFrame({"n": s.index, "s": s.to_numpy()})

    def _update(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        if personalized:
            nv = t.column("n").to_numpy(zero_copy_only=False)
            b = (nv == seed) * (1 - damping)
        else:
            b = base
        return pa.Table.from_arrays(
            [t.column("n"), pa.array(b + damping * s)], names=["n", "r"])

    ranks = nodes.map_batches(_init, batch_format="pyarrow").materialize()
    for _ in range(iters):
        contribs = bucket_join(
            ranks, eout, key="n", right_key="u",
            left_cols={"r": pa.float64()},
            right_cols={"v": pa.string(), "d": pa.int64()},
            key_type=pa.string(), post=_contrib)
        summed = bucket_aggregate(
            contribs.union(nodes.map_batches(_zero, batch_format="pyarrow")),
            ["n"], {"s": ("s", "sum")})
        ranks = summed.map_batches(
            _update, batch_format="pyarrow").materialize()

    def _final(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("n"),
             pa.array(np.round(
                 t.column("r").to_numpy(zero_copy_only=False), 6))],
            names=["node", "pagerank"])

    return ranks.map_batches(_final, batch_format="pyarrow")


def triangle_census(sf_dir: str):
    """Per-node triangle counts over the undirected KG graph — the second
    graph-analytics consumer of the flagship's triples (a (doc, entity,
    type) triangle is a consistency witness: the doc links the entity, the
    entity carries the type, and the doc's CTA vote agrees).

    Skew-aware shape (the standard degree-ordered orientation): each
    undirected edge is oriented from its lower-(degree, node) endpoint to
    the higher, so every triangle is generated from exactly ONE wedge and a
    hub node's wedge fan-out is bounded by its ORIENTED out-degree
    (O(sqrt(m)) for any graph) instead of its raw degree — the all-pairs
    blowup a naive neighbor-join suffers on hot entities cannot happen.
    Three bucket shuffles: orient (join degrees onto edges), wedge
    generation per source (bucket_map_keyed, out-neighbor pairs ordered by
    the same orientation), and the wedge->closing-arrow join; the final
    per-corner count is a tiny aggregate.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..util import (bucket_aggregate, bucket_distinct, bucket_join,
                        bucket_map_keyed)
    from .kg_pipeline import build_triples

    def _und_batch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("obj_is_literal")))
        u, v = t.column("subj"), t.column("obj")
        a = pc.min_element_wise(u, v)
        b = pc.max_element_wise(u, v)
        keep = pc.not_equal(a, b)
        return pa.Table.from_arrays([a.filter(keep), b.filter(keep)],
                                    names=["a", "b"])

    und = bucket_distinct(
        build_triples(sf_dir).map_batches(_und_batch, batch_format="pyarrow"),
        ["a", "b"]).materialize()  # edge-bounded, scanned 3x below

    def _ends(t: pa.Table) -> pa.Table:
        a, b = (t.column(c).combine_chunks() for c in ("a", "b"))
        both = pa.concat_arrays(
            (a.chunks if isinstance(a, pa.ChunkedArray) else [a])
            + (b.chunks if isinstance(b, pa.ChunkedArray) else [b]))
        return pa.Table.from_arrays([both], names=["n"])

    deg = bucket_aggregate(
        und.map_batches(_ends, batch_format="pyarrow"), ["n"],
        {"deg": ("n", "count")})

    # orient: join degree onto both endpoints (two key-hash shuffles of the
    # edge list), then point each edge at its higher-(deg, node) endpoint
    e_da = bucket_join(
        und, deg, key="a", right_key="n", left_cols={"b": pa.string()},
        right_cols={"deg": pa.int64()}, key_type=pa.string())
    e_da = e_da.map_batches(
        lambda t: t.rename_columns(["a", "b", "deg_a"]),
        batch_format="pyarrow")
    e_dab = bucket_join(
        e_da, deg, key="b", right_key="n",
        left_cols={"a": pa.string(), "deg_a": pa.int64()},
        right_cols={"deg": pa.int64()}, key_type=pa.string())

    def _orient(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy(zero_copy_only=False)
        a = t.column("a").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        s = np.where(a_first, a, b)
        tt = np.where(a_first, b, a)
        dt = np.where(a_first, db, da)
        return pa.Table.from_arrays(
            [pa.array(s, type=pa.string()), pa.array(tt, type=pa.string()),
             pa.array(dt.astype(np.int64))],
            names=["s", "t", "deg_t"])

    arrows = e_dab.map_batches(_orient, batch_format="pyarrow").materialize()

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for s, grp in g.groupby("s", sort=False):
            nb = grp.sort_values(["deg_t", "t"])["t"].to_numpy()
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({
                "s": s, "t1": nb[i], "t2": nb[j]}))
        if not outs:
            return pd.DataFrame({"s": pd.Series(dtype=object),
                                 "t1": pd.Series(dtype=object),
                                 "t2": pd.Series(dtype=object)})
        return pd.concat(outs, ignore_index=True)

    wedges = bucket_map_keyed(arrows, ["s"], _wedges)

    # close each wedge against the oriented arrow (t1 -> t2): URIs contain
    # no spaces, so 'lo hi' is an unambiguous composite key
    def _wkey(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(t.column("t1"), t.column("t2"), " ")
        return t.append_column("k", k)

    def _akey(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(t.column("s"), t.column("t"), " ")
        return pa.Table.from_arrays([k, pa.array(np.ones(t.num_rows,
                                                         dtype=np.int8))],
                                    names=["k", "hit"])

    tri = bucket_join(
        wedges.map_batches(_wkey, batch_format="pyarrow"),
        arrows.map_batches(_akey, batch_format="pyarrow"),
        key="k", left_cols={"s": pa.string(), "t1": pa.string(),
                            "t2": pa.string()},
        right_cols={"hit": pa.int8()}, key_type=pa.string())

    def _corners(t: pa.Table) -> pa.Table:
        cols = [t.column(c).combine_chunks() for c in ("s", "t1", "t2")]
        allc = pa.concat_arrays(
            [c for col in cols
             for c in (col.chunks if isinstance(col, pa.ChunkedArray)
                       else [col])])
        return pa.Table.from_arrays([allc], names=["node"])

    return bucket_aggregate(
        tri.map_batches(_corners, batch_format="pyarrow"), ["node"],
        {"n_triangles": ("node", "count")})


def levenshtein_to_word(tokens, word: str):
    """Levenshtein(word, t) for every t, VECTORIZED ACROSS THE TOKEN AXIS:
    tokens become a codepoint matrix (numpy U-dtype view) and the
    Wagner-Fischer recurrence loops over character positions only — every
    min/compare is an N-vector op, never a per-token Python loop. Pure
    kernel of ``fuzzy_match_edit`` (property-tested vs the scalar DP)."""
    import numpy as np

    n = len(tokens)
    L = int(max(len(t) for t in tokens))
    mat = np.array(list(tokens), dtype=f"U{L}").view(np.uint32).reshape(n, L)
    tlen = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    w = np.frombuffer(word.encode("utf-32-le"), dtype=np.uint32)
    prev = np.broadcast_to(np.arange(L + 1), (n, L + 1)).astype(np.int64)
    for i, wc in enumerate(w, start=1):
        curr = np.empty_like(prev)
        curr[:, 0] = i
        ne = (mat != wc).astype(np.int64)
        for j in range(1, L + 1):
            curr[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, curr[:, j - 1] + 1),
                prev[:, j - 1] + ne[:, j - 1])
        prev = curr
    return prev[np.arange(n), tlen]


def fuzzy_match_edit(sf_dir: str, max_dist: int = 2,
                     backend: str | None = None):
    """Edit-distance fuzzy join: corpus vocabulary x entity names by exact
    Levenshtein distance <= max_dist — the typo-tolerant complement of the
    trigram-Jaccard matcher (ref analogue: the lookup service's fuzzy
    surface-form search, kg/lookup.py getKGEntities; Jaccard catches word
    rearrangement, edit distance catches character-level noise).
    -> (token, entity_uri, dist).

    Scale shape: ONE shuffle (the corpus-vocabulary distinct — vocabulary
    is sublinear in corpus size); the entity-name side is KG-bounded and
    ships in the scan closure. The DP is banded by the length prefilter
    (|len(t)-len(w)| <= max_dist kills most pairs for free) and runs
    VECTORIZED ACROSS THE TOKEN AXIS: tokens become a codepoint matrix
    (numpy U-dtype view), and the m x L Wagner-Fischer recurrence loops
    over character positions only — every min/compare is an N-vector op,
    never a per-token Python loop.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..util import bucket_distinct

    docs = read_documents(sf_dir, blocks=fanout_blocks(0.5))

    def _toks(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t.column("text"), " "))
        u = pc.unique(flat)
        u = u.filter(pc.greater_equal(pc.utf8_length(u), 3))
        return pa.table({"token": u})

    toks = bucket_distinct(
        docs.map_batches(_toks, batch_format="pyarrow", batch_size=None),
        ["token"])

    lex = _bk(backend).lexicon()
    names = sorted({(u, u.rsplit("/", 1)[-1].lower())
                    for u in set(lex["entity_uri"])})

    def _match(b: pd.DataFrame) -> pa.Table:
        out_t, out_u, out_d = [], [], []
        if len(b):
            tokens = b["token"].astype(str).to_numpy()
            tlen = np.fromiter((len(t) for t in tokens), dtype=np.int64,
                               count=len(tokens))
            for uri, name in names:
                cand = tokens[np.abs(tlen - len(name)) <= max_dist]
                if not len(cand):
                    continue
                d = levenshtein_to_word(cand, name)
                keep = d <= max_dist
                out_t.append(cand[keep])
                out_u.append(np.full(int(keep.sum()), uri, dtype=object))
                out_d.append(d[keep])
        if not out_t:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "entity_uri": pa.array([], type=pa.string()),
                             "dist": pa.array([], type=pa.int64())})
        return pa.table({
            "token": pa.array(np.concatenate(out_t), type=pa.string()),
            "entity_uri": pa.array(np.concatenate(out_u), type=pa.string()),
            "dist": pa.array(np.concatenate(out_d), type=pa.int64())})

    return toks.map_batches(_match, batch_format="pandas")


def class_closure_compute(sf_dir: str, *, max_depth: int = 32,
                          backend: str | None = None):
    """COMPUTE the ancestor closure with distances from the DIRECT
    subclass edges by iterative distributed joins — the ontology-
    projection step the rest of the engine consumes as a pinned artifact
    (fixture_kg.class_closure; ref onto_access.py:189-204 walks the same
    closure in-memory). Proving the engine can derive its own closure
    matters at real-ontology scale (Wikidata: ~3M classes, ~4M subclass
    edges — far past a driver dict).

    Scale shape: frontier-relaxation loop — per iteration ONE
    hash-partitioned ``bucket_join`` of the current frontier against the
    direct-edge table on the ancestor key, iterations bounded by
    hierarchy DEPTH (not size; ~20 for real ontologies). New pairs keep
    min distance via a bucket aggregate at the end (multi-parent safe).
    The loop terminates when a frontier joins to nothing. ``sf_dir`` is
    unused (the KG is corpus-independent) but kept for the uniform query
    signature."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..util import bucket_aggregate, bucket_join

    closure = _bk(backend).class_closure()
    edges = closure[closure["distance"] == 1][
        ["cls_uri", "ancestor_uri"]].reset_index(drop=True)
    edges_ds = rd.from_arrow(_to_arrow(edges))

    frontier = edges_ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("cls_uri"), t.column("ancestor_uri"),
             pa.array(np.full(t.num_rows, 1, dtype=np.int64))],
            names=["cls_uri", "ancestor_uri", "distance"]),
        batch_format="pyarrow").materialize()
    acc = [frontier]
    for _ in range(max_depth):
        # frontier(cls -> anc, d) x edges(anc -> parent) => (cls -> parent, d+1)
        joined = bucket_join(
            frontier, edges_ds.map_batches(
                lambda t: pa.Table.from_arrays(
                    [t.column("cls_uri"), t.column("ancestor_uri")],
                    names=["ancestor_uri", "parent"]),
                batch_format="pyarrow"),
            key="ancestor_uri",
            left_cols={"cls_uri": pa.string(), "distance": pa.int64()},
            right_cols={"parent": pa.string()},
            key_type=pa.string(),
            post=lambda df: pd.DataFrame({
                "cls_uri": df["cls_uri"],
                "ancestor_uri": df["parent"],
                "distance": df["distance"] + 1}),
        )
        # min-distance-distinct the frontier BEFORE the next join: in a
        # multi-parent DAG the raw join output carries one row per distinct
        # PATH (exponential on dense ontologies); the distinct keeps the
        # frontier bounded by |closure pairs|
        from ..util import coalesce_blocks

        # coalesce between iterations: the bucket groupby otherwise grows
        # the block count every round, making iteration N cost O(N) in
        # fixed per-block shuffle overhead (util.coalesce_blocks)
        nxt = coalesce_blocks(bucket_aggregate(
            joined, ["cls_uri", "ancestor_uri"],
            {"distance": ("distance", "min")}).materialize())
        if nxt.count() == 0:
            break
        acc.append(nxt)
        frontier = nxt
    else:
        import warnings

        warnings.warn(
            f"class_closure_compute: frontier non-empty after max_depth="
            f"{max_depth} iterations — hierarchy deeper than max_depth "
            "(or cyclic); closure is TRUNCATED. Raise max_depth.",
            stacklevel=2)

    all_pairs = acc[0]
    for a in acc[1:]:
        all_pairs = all_pairs.union(a)
    # min distance per (cls, ancestor): multi-parent DAGs reach the same
    # ancestor along several paths
    return bucket_aggregate(all_pairs, ["cls_uri", "ancestor_uri"],
                            {"distance": ("distance", "min")})


def entity_salience(sf_dir: str):
    """Salient-entity detection: the single most salient linked entity per
    document by mention-count x entity-IDF (an entity mentioned often in
    few documents carries the doc's identity; stopword-like entities that
    appear everywhere get discounted) -> (doc_id, entity_uri, salience).
    The KG-side analogue of TF-IDF keyword extraction — the reference's
    CEA output feeds exactly this kind of downstream ranking.

    Scale shape: mention counts are the CEA table (one combiner shuffle,
    distinct doc x entity rows); the entity document-frequency census is
    KG-BOUNDED (entities come from the lexicon), so the idf map ships in
    the closure; the per-doc argmax is one doc-keyed pass over the
    already-thinned counts. Scalar libm log + round-6 for oracle
    bit-parity (the TF-IDF convention)."""
    import math

    from ..util import bucket_aggregate, bucket_map_keyed, parquet_num_rows
    import os

    n_docs = parquet_num_rows(os.path.join(sf_dir, "documents.parquet"))
    linked = _linked_flat(sf_dir)
    me = rename_cols(
        partial_count(linked, ["doc_id", "entity_uri"]), {"n": "m"})

    df_tbl = bucket_aggregate(
        me, ["entity_uri"], {"df": ("doc_id", "count")}).to_pandas()
    idf = {e: math.log(float(n_docs) / d)
           for e, d in zip(df_tbl["entity_uri"], df_tbl["df"])}

    def _top(g: pd.DataFrame) -> pd.DataFrame:
        s = g["m"].to_numpy() * g["entity_uri"].map(idf).to_numpy()
        import numpy as np
        g = g.assign(salience=np.round(s, 6))
        g = g.sort_values(["doc_id", "salience", "entity_uri"],
                          ascending=[True, False, True], kind="mergesort")
        return g.drop_duplicates("doc_id")[
            ["doc_id", "entity_uri", "salience"]]

    return bucket_map_keyed(me, ["doc_id"], _top)


def degree_census(sf_dir: str):
    """Degree-distribution census of the doc -> entity bipartite graph:
    (degree, n_docs) where degree = distinct linked entities per doc —
    the first skew diagnostic run before any graph workload (it is how
    the hub cap in ``related_docs`` gets chosen). Two combiner-shaped
    aggregates: distinct (doc, entity) -> per-doc degree -> tiny
    histogram; every shuffle row is a count, never a payload."""
    from ..util import bucket_aggregate, bucket_distinct

    linked = _linked_flat(sf_dir)
    ents = bucket_distinct(linked, ["doc_id", "entity_uri"])
    deg = bucket_aggregate(ents, ["doc_id"],
                           {"degree": ("entity_uri", "count")})
    return bucket_aggregate(deg, ["degree"], {"n_docs": ("doc_id", "count")})


def related_docs(sf_dir: str, *, min_shared: int = 26, hub_cap: int = 10_000):
    """Related-document pairs through shared entities: (doc_a, doc_b,
    n_shared) for doc pairs sharing >= ``min_shared`` distinct linked
    entities — the KG-side nearest-neighbor structure used for
    retrieval-augmented grouping. The inverted expansion is per-ENTITY,
    so a hub entity linked by d docs costs d^2 pairs: entities with
    d > ``hub_cap`` are EXCLUDED (the standard hub cap of entity-graph
    mining; a stopword-like entity that appears everywhere carries no
    relatedness signal anyway, the same argument as the IDF discount).
    The oracle applies the identical cap, so the cap is part of the
    contract, not a silent approximation.

    Scale shape: distinct (doc, entity) -> per-entity document lists
    co-located by ONE entity-keyed shuffle (hub-capped inside the
    bucket), vectorized pair self-merge, then a combiner census keyed on
    the pair."""
    from ..util import bucket_aggregate, bucket_distinct, bucket_map_keyed

    linked = _linked_flat(sf_dir)
    ents = bucket_distinct(linked, ["doc_id", "entity_uri"])

    def _pairs(b: pd.DataFrame) -> pd.DataFrame:
        sizes = b.groupby("entity_uri")["doc_id"].transform("size")
        b = b[sizes <= hub_cap]
        m = b.merge(b, on="entity_uri", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return m[["doc_id_a", "doc_id_b"]].rename(
            columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"}
        ).reset_index(drop=True)

    pair_rows = bucket_map_keyed(ents, ["entity_uri"], _pairs)
    counts = bucket_aggregate(pair_rows, ["doc_a", "doc_b"],
                              {"n_shared": ("doc_a", "count")})

    def _thresh(t):
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("n_shared"), min_shared))

    return counts.map_batches(_thresh, batch_format="pyarrow")


def type_by_source(sf_dir: str):
    """Annotation-drift contingency: CTA winner type crossed with the
    document's SOURCE, with chi-square contributions against the
    independence expectation -> (source, type_uri, n, expected, contrib).
    The monitoring question behind it: does one crawl source produce a
    systematically different type mix (a broken extractor, a spam
    source)? Large contrib cells are where to look.

    Scale shape: winners come from the existing one-shuffle vote; the
    source attach is a broadcast-free pandas merge INSIDE the keyed vote
    output against a doc->source map read column-pruned... at corpus
    scale the attach is a doc-keyed bucket_join; here the winner table is
    the corpus-bounded (1 row/doc) CTA output, so the join reuses the
    hash-partitioned path. The contingency table itself is
    |sources| x |types| — tiny — so expectations and contributions
    compute in one final driver-side pass from exact integer margins
    (float64 division + round 6, the stddev-parity convention)."""
    import numpy as np
    import pyarrow as pa

    from ..util import bucket_aggregate, bucket_join

    import os

    import ray.data as rd

    winners = cta_doc_type(sf_dir)  # (doc_id, type_uri), 1 row per doc
    from ..util import read_parquet_clean

    src = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "source"])

    joined = bucket_join(
        winners, src, key="doc_id",
        left_cols={"type_uri": pa.string()},
        right_cols={"source": pa.string()})
    counts = bucket_aggregate(
        joined, ["source", "type_uri"], {"n": ("doc_id", "count")}
    ).to_pandas()

    total = counts["n"].sum()
    row_m = counts.groupby("source")["n"].transform("sum")
    col_tot = counts.groupby("type_uri")["n"].sum()
    col_m = counts["type_uri"].map(col_tot)
    expected = (row_m.astype(np.float64) * col_m.astype(np.float64)
                / float(total))
    contrib = (counts["n"] - expected) ** 2 / expected
    out = counts.copy()
    out["expected"] = expected.round(6)
    out["contrib"] = contrib.round(6)
    return out.reset_index(drop=True)


def kg_type_pmi(sf_dir: str):
    """Type co-occurrence PMI over linked documents — the CPA-adjacent
    relation-discovery signal: for every pair of (non-Thing) types
    assigned to the same document via entity links, pointwise mutual
    information log2(P(a,b) / (P(a)P(b))) with doc-count probabilities.
    -> (type_a, type_b, n_both, pmi), type_a < type_b.

    Scale shape: distinct (doc, type) rows feed ONE doc-keyed pair
    expansion (types-per-doc is ontology-bounded) and ONE pair-keyed
    combiner count; marginals are a type-keyed count. The PMI arithmetic
    runs on the type-pair-bounded result rows. Float parity: the ratio is
    (n_both * N) / (c_a * c_b) in float64 on both engines, rounded to 6.
    """
    import numpy as np

    from ..stages.canonicalize import join_types_batches
    from ..util import bucket_aggregate, bucket_distinct, bucket_map_keyed

    typed = join_types_batches(_linked_flat(sf_dir))
    # dt feeds three consumers (N, marginals, pair expansion) — pin the
    # two-column (doc, type) distinct rows once instead of re-running the
    # full link pipeline (read -> mention detect -> link -> type join)
    # per consumer
    dt = bucket_distinct(
        typed.map_batches(lambda b: b[["doc_id", "type_uri"]],
                          batch_format="pandas"),
        ["doc_id", "type_uri"]).materialize()

    n_docs = bucket_distinct(dt, ["doc_id"]).count()
    ct = bucket_aggregate(dt, ["type_uri"], {"c": ("doc_id", "count")}
                          ).to_pandas()  # |types| rows — ontology-bounded

    def _pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket[["doc_id", "type_uri"]]
        m = b.merge(b, on="doc_id", suffixes=("_a", "_b"))
        m = m[m["type_uri_a"] < m["type_uri_b"]]
        return m.rename(columns={"type_uri_a": "type_a",
                                 "type_uri_b": "type_b"})[
            ["type_a", "type_b"]]

    counts = bucket_aggregate(
        bucket_map_keyed(dt, ["doc_id"], _pairs),
        ["type_a", "type_b"], {"n_both": ("type_a", "count")}
    ).to_pandas()  # |type pairs| rows — ontology-bounded

    out = counts.merge(ct.rename(columns={"type_uri": "type_a", "c": "ca"}),
                       on="type_a")
    out = out.merge(ct.rename(columns={"type_uri": "type_b", "c": "cb"}),
                    on="type_b")
    nb = out["n_both"].to_numpy().astype(np.float64)
    ca = out["ca"].to_numpy().astype(np.float64)
    cb = out["cb"].to_numpy().astype(np.float64)
    out["pmi"] = np.round(np.log2((nb * float(n_docs)) / (ca * cb)), 6)
    out["n_both"] = out["n_both"].astype("int64")
    return out[["type_a", "type_b", "n_both", "pmi"]].sort_values(
        ["type_a", "type_b"]).reset_index(drop=True)


def kg_ambiguity_census(sf_dir: str):
    """Surface-form ambiguity x corpus frequency — the CEA difficulty
    report (which ambiguous names dominate the corpus and therefore drive
    disambiguation cost): for every lexicon surface form appearing in the
    corpus, its mention-occurrence count and its lexicon candidate
    fan-out. -> (surface_form, n_mentions, n_candidates).

    Scale shape: the corpus-scale side is ONE mention-keyed combiner count
    (pre-filtered to lexicon forms inside the mention kernel, so the
    shuffle carries only linkable tokens); the fan-out side is the
    KG-bounded lexicon, joined on the result rows."""
    from ..util import bucket_aggregate

    docs = read_documents(sf_dir, blocks=fanout_blocks(0.5))
    mentions = docs.map_batches(detect_mentions_flat_batch,
                                batch_format="pyarrow")
    m = bucket_aggregate(
        mentions, ["mention"], {"n_mentions": ("doc_id", "count")}
    ).to_pandas()  # <= |lexicon surface forms| rows — KG-bounded

    fan = fixture_kg.lexicon_df().groupby("surface_form")["entity_uri"]\
        .nunique().rename("n_candidates").reset_index()
    out = fan.merge(m, left_on="surface_form", right_on="mention",
                    how="inner")
    out["n_mentions"] = out["n_mentions"].astype("int64")
    out["n_candidates"] = out["n_candidates"].astype("int64")
    return out[["surface_form", "n_mentions", "n_candidates"]].sort_values(
        "surface_form").reset_index(drop=True)


def kg_mention_coverage(sf_dir: str):
    """Per-document linkable-mention coverage — the corpus-side CEA yield
    report (how much of each doc the lexicon can even attempt to link):
    (doc_id, n_tokens, n_mentions, coverage), coverage = n_mentions /
    n_tokens rounded to 6.

    Scale shape: ZERO shuffles — both counters are batch-local (token
    split + lexicon membership inside one vectorized map); output is one
    row per doc."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.mention_detect import _SURFACE_FORMS

    docs = read_documents(sf_dir, blocks=fanout_blocks(0.5))

    def _cov(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(texts, " ")
        n_tok = pc.list_value_length(toks).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        hit = pc.is_in(flat, value_set=pa.array(_SURFACE_FORMS)).to_numpy(
            zero_copy_only=False)
        n_men = np.bincount(parent[hit], minlength=t.num_rows).astype(
            np.int64)
        cov = np.round(n_men / np.maximum(n_tok, 1), 6)
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64()), pa.array(n_tok),
             pa.array(n_men), pa.array(cov)],
            names=["doc_id", "n_tokens", "n_mentions", "coverage"])

    return docs.map_batches(_cov, batch_format="pyarrow", batch_size=None)


def _components_str_distributed(und, *, max_iters: int = 50):
    """Hash-to-min label propagation over STRING-keyed undirected edges —
    the scale path of ``kg_components`` (same loop as
    dedup_components' distributed branch, with min over node URIs and a
    driver-side exact fixpoint check: per round, the node-bounded label
    table streams through the driver as per-batch hash partials summed in
    arbitrary-precision Python ints; label sets are equal iff the sums
    are — no convergence heuristics)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..util import bucket_aggregate, bucket_join

    labels = bucket_aggregate(
        und, ["u"], {"label": ("v", "min")}
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("u"),
             pc.min_element_wise(t.column("u"), t.column("label"))],
            names=["node", "label"]),
        batch_format="pyarrow").materialize()

    def _checksum(lbl) -> int:
        tot = 0
        for b in lbl.iter_batches(batch_format="pandas"):
            tot += int(pd.util.hash_pandas_object(
                b["label"], index=False).astype("uint64").sum())
        return tot

    prev = _checksum(labels)
    for _ in range(max_iters):
        joined = bucket_join(
            und, labels, key="u", right_key="node",
            left_cols={"v": pa.string()}, right_cols={"label": pa.string()},
            key_type=pa.string())
        contrib = joined.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("v"), t.column("label")], names=["node", "label"]),
            batch_format="pyarrow")
        labels = bucket_aggregate(
            contrib.union(labels), ["node"], {"label": ("label", "min")}
        ).materialize()
        cur = _checksum(labels)
        if cur == prev:
            break
        prev = cur

    from ..util import rename_cols

    return rename_cols(labels, {"node": "node", "label": "component_id"})


def kg_components(sf_dir: str, *, max_iters: int = 50,
                  single_task_max_edges: int = 50_000_000):
    """Weakly-connected components of the KG entity graph — the graph-QA
    census (is the constructed KG one connected web or many islands?):
    (node, component_id) with component_id = min reachable node URI.

    Scale shape mirrors dedup_components: the distinct URI edge list is
    edge-bounded; up to ``single_task_max_edges`` one numpy union-find
    task solves it (np.unique factorizes the strings; index 0 of the
    sorted uniques IS the min URI), beyond that the string label
    propagation loop (``_components_str_distributed``) pays two bucket
    barriers per round, O(log diameter) rounds."""
    import pyarrow as pa

    from ..stages.dedup import _components_single_task
    from ..util import rename_cols

    edges = _kg_uri_edges(sf_dir)

    def _undirect(t: pa.Table) -> pa.Table:
        u = t.column("u").combine_chunks()
        v = t.column("v").combine_chunks()
        uu = pa.concat_arrays([u, v])
        vv = pa.concat_arrays([v, u])
        return pa.Table.from_arrays([uu, vv], names=["u", "v"])

    und = edges.map_batches(_undirect, batch_format="pyarrow").materialize()
    if edges.count() <= single_task_max_edges:
        out = _components_single_task(und)
        return rename_cols(out, {"doc_id": "node",
                                 "component_id": "component_id"})
    return _components_str_distributed(und, max_iters=max_iters)


def kg_cta_confidence(sf_dir: str):
    """CTA winner WITH its vote share — the annotation-confidence report
    (a 0.95-confidence type is safe to materialize; a 0.34 winner of a
    three-way split wants review): per doc, the winning type, its vote
    count, the doc's total (non-Thing) type votes and confidence =
    n_votes / total_votes rounded to 6.

    Scale shape: same ONE doc-keyed shuffle as `cta_doc_type` — per-batch
    (doc, type) partial counts, then winner + totals computed vectorized
    per bucket (no second shuffle for the denominator: all of a doc's
    votes are co-located)."""
    from ..stages.canonicalize import join_types_batches
    from ..util import bucket_map_keyed

    typed = join_types_batches(_linked_flat(sf_dir))

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["doc_id", "type_uri"], sort=False,
                      observed=True).size().reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    def _winner(bucket: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        c = bucket.groupby(["doc_id", "type_uri"], sort=False,
                           observed=True)["n"].sum().reset_index()
        tot = c.groupby("doc_id", sort=False)["n"].sum().rename(
            "total_votes").reset_index()
        c = c.sort_values(["n", "type_uri"], ascending=[False, True],
                          kind="mergesort")
        w = c.drop_duplicates(subset=["doc_id"], keep="first").rename(
            columns={"n": "n_votes"})
        out = w.merge(tot, on="doc_id")
        out["confidence"] = np.round(
            out["n_votes"].to_numpy().astype(np.float64)
            / out["total_votes"].to_numpy().astype(np.float64), 6)
        return out[["doc_id", "type_uri", "n_votes", "total_votes",
                    "confidence"]]

    return bucket_map_keyed(typed, ["doc_id"], _winner, pre=_pre)


def kg_prop_cardinality(sf_dir: str):
    """Per-predicate cardinality profile over the materialized triples —
    the schema-QA report behind 'can I treat this property as
    functional': triples, distinct subjects, mean and max objects per
    subject. -> (pred, n_triples, n_subjects, avg_per_subj, max_per_subj).

    Scale shape: ONE (pred, subj) combiner count (per-batch partials
    thin the triple stream first), then a predicate-keyed second
    aggregate; output is |predicates| rows. The mean divides exact
    integer totals once, rounded to 6."""
    import numpy as np
    import pyarrow as pa

    from ..util import bucket_aggregate
    from .kg_pipeline import build_triples

    triples = build_triples(sf_dir)

    def _pairs(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("pred"), t.column("subj"),
             pa.array(np.ones(t.num_rows, dtype=np.int64))],
            names=["pred", "subj", "one"])

    per_subj = bucket_aggregate(
        triples.map_batches(_pairs, batch_format="pyarrow"),
        ["pred", "subj"], {"c": ("one", "sum")})

    def _one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    out = bucket_aggregate(
        per_subj.map_batches(_one, batch_format="pyarrow"),
        ["pred"], {"n_triples": ("c", "sum"), "n_subjects": ("one", "sum"),
                   "max_per_subj": ("c", "max")}).to_pandas()
    out["avg_per_subj"] = np.round(
        out["n_triples"].to_numpy().astype(np.float64)
        / out["n_subjects"].to_numpy().astype(np.float64), 6)
    return out[["pred", "n_triples", "n_subjects", "avg_per_subj",
                "max_per_subj"]].sort_values("pred").reset_index(drop=True)


def kg_symmetry_census(sf_dir: str):
    """Empirical predicate-symmetry census — the schema-QA complement to
    the DECLARED owl:SymmetricProperty axioms: per predicate over
    URI-object triples, how many edges have their reverse present, and
    the symmetry ratio. A high ratio on an undeclared predicate is a
    missing axiom; a low ratio on a declared one is dirty data.
    -> (pred, n_edges, n_symmetric, sym_ratio).

    Scale shape: ONE bucket shuffle keyed on the UNORDERED endpoint pair
    + predicate (both directions of an edge co-locate), a vectorized
    per-bucket direction count, then a predicate-sized aggregate."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..util import bucket_aggregate, bucket_distinct, bucket_map_keyed
    from .kg_pipeline import build_triples

    def _edges(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("obj_is_literal")))
        lo = pc.min_element_wise(t.column("subj"), t.column("obj"))
        hi = pc.max_element_wise(t.column("subj"), t.column("obj"))
        fwd = pc.equal(t.column("subj"), lo)  # direction flag
        return pa.Table.from_arrays(
            [t.column("pred"), lo, hi, fwd.cast(pa.int8())],
            names=["pred", "lo", "hi", "fwd"])

    edges = bucket_distinct(
        build_triples(sf_dir).map_batches(_edges, batch_format="pyarrow"),
        ["pred", "lo", "hi", "fwd"])

    def _directions(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["pred", "lo", "hi"], sort=False)["fwd"].agg(
            n_dir="size").reset_index()
        c["both"] = (c["n_dir"] == 2).astype("int64")
        # n_edges counts DIRECTED edges; self-loops (lo == hi) collapse
        # to one distinct row and are symmetric by definition
        self_loop = (c["lo"] == c["hi"]).to_numpy()
        c["n_edges"] = np.where(self_loop, 1, c["n_dir"]).astype("int64")
        c["n_symmetric"] = np.where(
            self_loop, 1, 2 * c["both"].to_numpy()).astype("int64")
        g2 = c.groupby("pred", sort=False).agg(
            n_edges=("n_edges", "sum"),
            n_symmetric=("n_symmetric", "sum")).reset_index()
        return g2

    per_pred = bucket_aggregate(
        bucket_map_keyed(edges, ["pred", "lo", "hi"], _directions),
        ["pred"], {"n_edges": ("n_edges", "sum"),
                   "n_symmetric": ("n_symmetric", "sum")}).to_pandas()
    per_pred["sym_ratio"] = np.round(
        per_pred["n_symmetric"].to_numpy().astype(np.float64)
        / per_pred["n_edges"].to_numpy().astype(np.float64), 6)
    return per_pred.sort_values("pred").reset_index(drop=True)


def kg_entity_pmi(sf_dir: str):
    """Entity co-occurrence PMI — the relation-STRENGTH score on top of
    `cpa_cooccur`'s raw counts (two entities that co-occur often relative
    to their marginals are the CPA relation candidates worth scoring):
    (uri_a, uri_b, n_both, pmi) with doc-count probabilities,
    uri_a < uri_b.

    Scale shape: unlike the type variant (type pairs are
    ontology-bounded), the ENTITY pair table is corpus-bounded, so the
    marginals attach via two hash-partitioned bucket joins — never a
    driver merge; N (docs with >= 1 link) is one distinct count."""
    import numpy as np
    import pyarrow as pa

    from ..util import bucket_aggregate, bucket_distinct, bucket_join

    linked = _linked_flat(sf_dir)
    ents = bucket_distinct(
        linked.map_batches(lambda b: b[["doc_id", "entity_uri"]],
                           batch_format="pandas"),
        ["doc_id", "entity_uri"]).materialize()
    n_docs = bucket_distinct(ents, ["doc_id"]).count()
    marg = bucket_aggregate(ents, ["entity_uri"],
                            {"c": ("doc_id", "count")})

    pairs = cpa_cooccur(sf_dir)  # (uri_a, uri_b, n_docs) distinct pairs

    from ..util import rename_cols

    pairs = rename_cols(pairs, {"n_docs": "n_both"})
    j1 = bucket_join(
        pairs, marg, key="uri_a", right_key="entity_uri",
        left_cols={"uri_b": pa.string(), "n_both": pa.int64()},
        right_cols={"c": pa.int64()}, key_type=pa.string())
    j1 = rename_cols(j1, {"c": "ca"})
    j2 = bucket_join(
        j1, marg, key="uri_b", right_key="entity_uri",
        left_cols={"uri_a": pa.string(), "n_both": pa.int64(),
                   "ca": pa.int64()},
        right_cols={"c": pa.int64()}, key_type=pa.string())

    def _pmi(t: pa.Table) -> pa.Table:
        nb = t.column("n_both").to_numpy(zero_copy_only=False).astype(
            np.float64)
        ca = t.column("ca").to_numpy(zero_copy_only=False).astype(np.float64)
        cb = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.round(np.log2((nb * float(n_docs)) / (ca * cb)), 6)
        return pa.Table.from_arrays(
            [t.column("uri_a"), t.column("uri_b"),
             t.column("n_both"), pa.array(pmi)],
            names=["uri_a", "uri_b", "n_both", "pmi"])

    return j2.map_batches(_pmi, batch_format="pyarrow")


def _bfs_single_task(und, *, max_depth: int):
    """Vectorized numpy BFS over a coalesced undirected edge block (the
    components/pagerank single-task rationale: per-level distributed
    rounds cost 3 barriers each, which dwarfs an in-memory CSR sweep for
    any edge list that fits a worker). Seed = min node = index 0 of the
    sorted np.unique factorization."""
    import numpy as np
    import pyarrow as pa

    def _bfs(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        eu, ev = inv[: len(u)], inv[len(u):]
        order = np.argsort(eu, kind="stable")
        eu_s, ev_s = eu[order], ev[order]
        indptr = np.searchsorted(eu_s, np.arange(len(nodes) + 1))
        dist = np.full(len(nodes), -1, dtype=np.int64)
        dist[0] = 0
        frontier = np.array([0], dtype=np.int64)
        for d in range(1, max_depth + 1):
            counts = indptr[frontier + 1] - indptr[frontier]
            total = int(counts.sum())
            if total == 0:
                break
            flat = np.arange(total) + np.repeat(
                indptr[frontier] - np.concatenate(
                    [[0], np.cumsum(counts)[:-1]]), counts)
            nbrs = np.unique(ev_s[flat])
            fresh = nbrs[dist[nbrs] < 0]
            if len(fresh) == 0:
                break
            dist[fresh] = d
            frontier = fresh
        keep = dist >= 0
        return pa.Table.from_arrays(
            [pa.array(nodes[keep]), pa.array(dist[keep])],
            names=["node", "distance"])

    return und.repartition(1).map_batches(
        _bfs, batch_format="pyarrow", batch_size=None)


def kg_bfs_distances(sf_dir: str, *, max_depth: int = 32,
                     single_task_max_edges: int = 50_000_000):
    """BFS shortest-path distances from the seed (lexicographically
    smallest node) over the UNDIRECTED entity graph — the distributed
    frontier algorithm behind neighborhood radius queries and
    connectivity QA. -> (node, distance) for every node reachable within
    ``max_depth`` hops (the oracle's recursive walk carries the same
    cap; a graph deeper than that truncates identically on both sides).

    Scale shape: up to ``single_task_max_edges`` one numpy CSR sweep
    (``_bfs_single_task``); beyond that the classic frontier loop — per
    level ONE hash-partitioned join of the (node-bounded) frontier
    against the edge list, one distinct, one anti-join against the
    visited set; the loop exits when a frontier joins to nothing.
    Visited and frontier are node-bounded; the edge list is materialized
    once and re-scanned per level."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from ..util import bucket_anti_join, bucket_distinct, bucket_join

    edges = _kg_uri_edges(sf_dir)

    def _undirect(t: pa.Table) -> pa.Table:
        u = t.column("u").combine_chunks()
        v = t.column("v").combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([u, v]), pa.concat_arrays([v, u])],
            names=["u", "v"])

    und = bucket_distinct(
        edges.map_batches(_undirect, batch_format="pyarrow"),
        ["u", "v"]).materialize()

    if und.count() <= single_task_max_edges:
        return _bfs_single_task(und, max_depth=max_depth)

    def _bmin(t: pa.Table) -> pa.Table:
        # per-block partial min: only one string per block reaches the
        # driver (iter_batches would stream the whole edge list)
        if t.num_rows == 0:
            return pa.Table.from_arrays([pa.array([], type=pa.string())],
                                        names=["mn"])
        v = pc.min(pc.min_element_wise(t.column("u"),
                                       t.column("v"))).as_py()
        return pa.Table.from_arrays([pa.array([v], type=pa.string())],
                                    names=["mn"])

    seed = und.map_batches(
        _bmin, batch_format="pyarrow").to_pandas()["mn"].min()

    visited = rd.from_arrow(pa.table({
        "node": pa.array([seed], type=pa.string()),
        "distance": pa.array([0], type=pa.int64()),
    })).materialize()
    frontier = visited

    for depth in range(1, max_depth + 1):
        # frontier x edges -> candidate next nodes at this depth
        nxt = bucket_join(
            frontier, und, key="node", right_key="u",
            left_cols={}, right_cols={"v": pa.string()},
            key_type=pa.string())
        # distinct over BOTH columns (bucket_distinct keeps only its key
        # columns); every row of a level shares the same distance, so
        # this equals a per-node distinct
        nxt = bucket_distinct(
            nxt.map_batches(
                lambda t, d=depth: pa.Table.from_arrays(
                    [t.column("v"),
                     pa.array([d] * t.num_rows, type=pa.int64())],
                    names=["node", "distance"]),
                batch_format="pyarrow"),
            ["node", "distance"])
        fresh = bucket_anti_join(
            nxt, visited, key="node",
            left_cols={"distance": pa.int64()},
            key_type=pa.string()).materialize()
        if fresh.count() == 0:
            break
        visited = visited.union(fresh).materialize()
        frontier = fresh

    return visited
