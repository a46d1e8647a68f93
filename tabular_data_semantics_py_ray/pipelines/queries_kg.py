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
from ..util import drop_cols, rename_cols
from ..stages.linking import LinkScore
from ..stages.mention_detect import detect_mentions_flat_batch
from .kg_pipeline import read_documents


def _surface_resolution_df() -> pd.DataFrame:
    """surface_form -> linked entity (lowest-rank, canonical, non-disambig).

    Computed at runtime from the raw fixture tables via the same LinkScore
    closure logic the actor pool uses.
    """
    scorer = LinkScore()
    lex = fixture_kg.lexicon_df().copy()
    lex["entity_uri"] = lex["entity_uri"].map(lambda u: scorer.canonical.get(u, u))
    lex = lex[~lex["entity_uri"].isin(scorer.disambig)]
    lex = lex.sort_values(["surface_form", "rank"], kind="mergesort")
    return lex.drop_duplicates("surface_form")[["surface_form", "entity_uri"]]


class SurfaceLinker:
    """mention -> linked entity via the pinned surface-resolution table."""

    def __init__(self, res_ref=None):
        self.res = (
            ray.get(res_ref) if res_ref is not None else _surface_resolution_df()
        )

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        return b.merge(self.res, left_on="mention", right_on="surface_form").drop(
            columns=["surface_form"]
        )


def _linked_flat(sf_dir: str):
    docs = read_documents(sf_dir)
    mentions = docs.map_batches(detect_mentions_flat_batch, batch_format="pyarrow")
    res_ref = ray.put(_surface_resolution_df())
    return mentions.map_batches(
        SurfaceLinker,
        fn_constructor_kwargs={"res_ref": res_ref},
        batch_format="pandas",
        concurrency=(1, 4),
    )


def cea_link(sf_dir: str):
    """CEA analogue: (doc_id, mention, entity_uri, n_mentions)."""
    linked = _linked_flat(sf_dir)
    return rename_cols(
        partial_count(linked, ["doc_id", "mention", "entity_uri"]), {"n": "n_mentions"}
    )


def cta_doc_type(sf_dir: str):
    """CTA analogue: most-voted direct type per doc (deterministic
    tie-break count desc, type asc) -> (doc_id, type_uri)."""
    return vote_types(_linked_flat(sf_dir), key="doc_id")


def cta_type_ancestors(sf_dir: str):
    """winner type expanded with ontology-closure ancestors (G3):
    (doc_id, type_uri, ancestor_uri, distance)."""
    winners = cta_doc_type(sf_dir)
    closure = fixture_kg.class_closure_df()

    def _expand(b: pd.DataFrame) -> pd.DataFrame:
        out = b.merge(closure, left_on="type_uri", right_on="cls_uri", how="inner")
        return out[["doc_id", "type_uri", "ancestor_uri", "distance"]]

    return winners.map_batches(_expand, batch_format="pandas")


def cpa_cooccur(sf_dir: str):
    """CPA analogue: co-occurring entity pairs per doc ->
    (uri_a, uri_b, n_docs) with uri_a < uri_b."""
    from itertools import combinations

    from ..util import bucket_distinct, bucket_map_keyed

    linked = _linked_flat(sf_dir)
    ents = bucket_distinct(linked, ["doc_id", "entity_uri"])

    def _pairs_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b = [], []
        for _, group in bucket.groupby("doc_id", sort=False):
            uris = sorted(group["entity_uri"].unique())
            for a, b in combinations(uris, 2):
                rows_a.append(a)
                rows_b.append(b)
        return pd.DataFrame({"uri_a": pd.Series(rows_a, dtype="string"),
                             "uri_b": pd.Series(rows_b, dtype="string")})

    pairs = bucket_map_keyed(ents, ["doc_id"], _pairs_bucket)
    return rename_cols(partial_count(pairs, ["uri_a", "uri_b"]), {"n": "n_docs"})


def alias_canonical_map(sf_dir: str):
    """Canonicalization map from raw alias edges (J3/D2): (uri, canonical).

    Input-independent of sf_dir (fixture edges), computed by the runtime
    closure code; the oracle recomputes the closure in SQL from raw edges.
    """
    from ..stages.canonicalize import resolve_alias_closure

    return resolve_alias_closure(fixture_kg.alias_edges_df())


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


def pred_census(sf_dir: str):
    """G5 predicate census over the flagship triples:
    (pred, n_triples, n_subj, n_obj) with exact distinct counts."""
    from ..util import bucket_aggregate, bucket_distinct

    from .kg_pipeline import build_triples

    triples = build_triples(sf_dir).materialize()
    counts = bucket_aggregate(
        triples, ["pred"], {"n_triples": ("subj", "count")}, num_buckets=8
    ).to_pandas()
    nsubj = bucket_aggregate(
        bucket_distinct(triples, ["pred", "subj"]),
        ["pred"], {"n_subj": ("subj", "count")}, num_buckets=8,
    ).to_pandas()
    nobj = bucket_aggregate(
        bucket_distinct(triples, ["pred", "obj"]),
        ["pred"], {"n_obj": ("obj", "count")}, num_buckets=8,
    ).to_pandas()
    return counts.merge(nsubj, on="pred").merge(nobj, on="pred")


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


def doc_most_specific_types(sf_dir: str):
    """G2 per doc: distinct direct types of its linked entities, reduced to
    the most-specific set (Agent removed; strict ancestors of another member
    removed) -> (doc_id, type_uri) rows."""
    from ..constants import AGENT_CLASS
    from ..stages.canonicalize import join_types_batches
    from ..util import bucket_distinct, bucket_map_keyed

    closure = fixture_kg.class_closure_df()
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
