"""Candidate generation + entity-link scoring — stateful actor-pool stages.

The reference's ``matching.Lookup`` loads two ontologies + endpoint handles
once per process (matching/kg_matching.py:244-250) and then resolves each
cell with lookup candidates, redirect resolution and type-compatibility
checks (kg_matching.py:476-584, A1-A6 in SURVEY §2.3). Here the same
"heavy singleton" shape becomes callable classes whose ``__init__`` pins the
fixture tables (broadcast once via ``ray.put``), passed to
``ds.map_batches(Cls, concurrency=N)`` so state loads once per actor, not
once per batch.

The per-occurrence result of the candidate-generation + scoring cascade
(top-k lexicon candidates -> redirect closure -> disambiguation drop ->
lowest-rank winner) depends ONLY on the mention's surface form, so the
cascade has a closed form: ``surface_resolution`` folds it into a
surface_form -> entity_uri table at actor init, and the per-batch body is
one zero-copy ``pc.index_in`` against the pinned form array plus an
integer gather — no pandas frame in the hot path.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import fixture_kg
from ..fixture_kg import DISAMBIGUATION_CLASS


def _broadcast(obj):
    """ray.put once on the driver; reuse the ref across all actors."""
    import ray

    return ray.put(obj)


def resolution_maps(alias_edges=None, entity_types=None):
    """(redirect-canonical map, disambiguation-page set) from raw edges.

    Semantics mirror the reference's cascade, made deterministic:
    redirects resolve with exactly two closure iterations, not a fixpoint
    (challenge_utils.py:441-453); disambiguation pages are the wikidata
    Q4167410 analogue (matching/kg_matching.py:417-420)."""
    alias = alias_edges if alias_edges is not None else fixture_kg.alias_edges_df()
    types = (entity_types if entity_types is not None
             else fixture_kg.entity_types_df())
    redirects = alias[alias["kind"] == "redirect"]
    one_hop = dict(zip(redirects["uri_a"], redirects["uri_b"]))
    canonical = {
        s: one_hop.get(one_hop.get(s, s), one_hop.get(s, s)) for s in one_hop
    }
    disambig = set(
        types.loc[types["type_uri"] == DISAMBIGUATION_CLASS, "entity_uri"]
    )
    return canonical, disambig


def surface_resolution(lexicon: pd.DataFrame, top_k: int,
                       alias_edges: pd.DataFrame | None = None,
                       entity_types: pd.DataFrame | None = None) -> pd.DataFrame:
    """surface_form -> linked entity (lowest rank, canonical, non-disambig)
    — the closed form of the A1/A6/T1 cascade over the lexicon: per-
    occurrence linking reduces to a lookup in this table because nothing in
    the cascade depends on the occurrence's position, only its surface."""
    canonical, disambig = resolution_maps(alias_edges, entity_types)
    lex = lexicon[lexicon["rank"] <= top_k].copy()
    lex["entity_uri"] = lex["entity_uri"].map(lambda u: canonical.get(u, u))
    lex = lex[~lex["entity_uri"].isin(disambig)]
    lex = lex.sort_values(["surface_form", "rank"], kind="mergesort")
    return lex.drop_duplicates("surface_form")[["surface_form", "entity_uri"]]


class LinkScore:
    """Driver-side holder of the resolution maps (redirect closure +
    disambiguation set). Kept as a named class because downstream pipelines
    (queries_kg._cell_norm_resolution) consume ``.canonical`` / ``.disambig``
    to build their own candidate unions."""

    def __init__(self, alias_ref=None, types_ref=None):
        import ray

        alias = (
            ray.get(alias_ref) if alias_ref is not None else None
        )
        types = (
            ray.get(types_ref) if types_ref is not None else None
        )
        self.canonical, self.disambig = resolution_maps(alias, types)


class EntityLinker:
    """mention occurrences -> linked entity per occurrence, Arrow-native.

    ``__init__`` folds lexicon + alias + types into the surface-resolution
    arrays once per actor (A8 memo caches become this precomputation);
    ``__call__`` is ``pc.index_in`` + ``take`` — zero-copy in, no pandas.
    Occurrences whose surface resolves to no surviving candidate are
    dropped (inner-join semantics of the reference's lookup)."""

    def __init__(self, lexicon_ref=None, alias_ref=None, types_ref=None, top_k=3,
                 project=None):
        import ray

        lex = (
            ray.get(lexicon_ref)
            if lexicon_ref is not None
            else fixture_kg.lexicon_df()
        )
        alias = ray.get(alias_ref) if alias_ref is not None else None
        types = ray.get(types_ref) if types_ref is not None else None
        res = surface_resolution(lex, top_k, alias, types)
        self.forms_arr = pa.array(list(res["surface_form"]), type=pa.string())
        self.ent_arr = pa.array(list(res["entity_uri"]), type=pa.string())
        self.project = list(project) if project else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = batch.column("mention")
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        idx = pc.index_in(m.cast(pa.string()), value_set=self.forms_arr)
        keep = idx.is_valid()
        out = batch.filter(keep).append_column(
            "entity_uri", self.ent_arr.take(idx.filter(keep)))
        if self.project:
            # project early: downstream shuffles move only what they need
            out = out.select(self.project)
        return out


def link_entities(mentions_ds, *, top_k: int = 3, concurrency=(1, 4), batch_size=4096,
                  project=None, backend: str = "fixture"):
    """mentions -> linked (doc_id, span_idx, tok_idx, mention, entity_uri);
    ``project`` optionally restricts the output columns at the source.
    ``backend`` names a registered KGBackend (state/backends.py) — e.g. one
    ingested from an RDF dump by pipelines/kg_ingest.py; resolved on the
    DRIVER (the registry is driver-local) and broadcast once via ray.put."""
    from ..state.backends import get_backend

    be = get_backend(backend)
    lex_ref = _broadcast(be.lexicon())
    alias_ref = _broadcast(be.alias_edges())
    types_ref = _broadcast(be.entity_types())
    return mentions_ds.map_batches(
        EntityLinker,
        fn_constructor_kwargs={
            "lexicon_ref": lex_ref,
            "alias_ref": alias_ref,
            "types_ref": types_ref,
            "top_k": top_k,
            "project": project,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class DocPipeline:
    """Whole per-document pipeline fused into ONE actor stage.

    Input batches are DOCUMENT rows (doc_id:int64, text), so every document
    is complete within its batch by construction — no cross-batch state, no
    boundary cases. Per batch: interleave -> mention detect -> link ->
    doc-local finalize (distinct mention pairs + vote winner per doc) +
    batch-distinct (entity, type) pairs. Output is a tagged stream:

      kind='mention'  (doc_id, a=entity_uri)
      kind='win'      (doc_id, a=type_uri)
      kind='etype'    (doc_id='', a=entity_uri, b=type_uri)

    This removes the voting all-to-all entirely: the only wide ops left in
    the flagship are a tiny etype distinct and the final sorted materialize.
    A bundle may interleave blocks from different upstream tasks, but since
    the unit is whole documents that cannot split a doc.
    """

    def __init__(self, lexicon_ref=None, alias_ref=None, types_ref=None, top_k=3):
        import ray as _ray

        from ..constants import AVOID_TOP_CONCEPTS
        from .. import fixture_kg as _fk

        self.linker = EntityLinker(lexicon_ref, alias_ref, types_ref, top_k)
        types = (
            _ray.get(types_ref) if types_ref is not None else _fk.entity_types_df()
        )
        self.types = types[~types["type_uri"].isin(AVOID_TOP_CONCEPTS)]

    def _link_batch(self, batch) -> pd.DataFrame:
        """documents batch -> linked (doc_id, entity_uri) occurrence rows.

        Mention detect + link stay Arrow end-to-end; only the two-column
        result crosses into pandas for the doc-local voting body."""
        from .interleave import interleave_batch
        from .mention_detect import detect_mentions_batch

        docs_tbl = interleave_batch(batch)
        mentions_tbl = detect_mentions_batch(docs_tbl)
        linked = self.linker(mentions_tbl)
        return linked.select(["doc_id", "entity_uri"]).to_pandas()

    def __call__(self, batch):
        import pyarrow as pa

        linked = self._link_batch(batch)

        empty = pa.table({
            "kind": pa.array([], type=pa.string()),
            "doc_id": pa.array([], type=pa.string()),
            "a": pa.array([], type=pa.string()),
            "b": pa.array([], type=pa.string()),
        })
        if len(linked) == 0:
            return empty
        pairs = linked[["doc_id", "entity_uri"]]

        mentions = pairs.drop_duplicates(["doc_id", "entity_uri"])
        typed = pairs.merge(self.types, on="entity_uri", how="inner")
        votes = (
            typed.groupby(["doc_id", "type_uri"], sort=False, observed=True)
            .size().reset_index(name="n")
        )
        votes = votes.sort_values(["n", "type_uri"], ascending=[False, True],
                                  kind="mergesort")
        winners = votes.drop_duplicates(subset=["doc_id"], keep="first")

        ents = pairs["entity_uri"].drop_duplicates()
        et = self.types[self.types["entity_uri"].isin(ents)]

        parts = []

        def tag(kind, doc_id, a, b=None):
            n = len(a)
            parts.append(pa.table({
                "kind": pa.array([kind] * n, type=pa.string()),
                "doc_id": pa.array(list(doc_id), type=pa.string()),
                "a": pa.array(list(a), type=pa.string()),
                "b": pa.array(list(b) if b is not None else [""] * n,
                              type=pa.string()),
            }))

        tag("mention", mentions["doc_id"], mentions["entity_uri"])
        tag("win", winners["doc_id"], winners["type_uri"])
        tag("etype", [""] * len(et), et["entity_uri"], et["type_uri"])
        return pa.concat_tables(parts) if parts else empty


class DocTriples(DocPipeline):
    """DocPipeline variant that FINALIZES the doc-keyed triple streams inside
    the actor and writes them straight to a partitioned parquet sink — the
    flagship's zero-all-to-all scale path.

    Rationale: mention triples (doc uri, ont:mentions, entity) and doc-type
    triples (doc uri, rdf:type, winner) are keyed by ``doc_id``, and every
    document lives in exactly one input batch — so after the in-batch dedup
    these streams are *globally duplicate-free by construction* and need no
    distinct/sort shuffle at all. Each batch is sorted (T8 semantics, within
    the output partition) and written as one parquet file by the actor that
    produced it. The only stream that can repeat across batches — entity
    rdf:type triples, bounded by |KG| and independent of corpus size — is
    returned as tiny (entity_uri, type_uri) pairs, thinned by a per-actor
    memo, for a downstream KG-sized distinct.

    This removes the round-1 scaling blocker (materialize barrier + tagged
    re-scan + global sort: F ≈ 65 s fixed cost). On a multi-node cluster
    ``sink_dir`` must be shared storage (s3:// / NFS); single-node tests use
    a local path.
    """

    def __init__(self, lexicon_ref=None, alias_ref=None, types_ref=None,
                 top_k=3, sink_dir=None):
        super().__init__(lexicon_ref, alias_ref, types_ref, top_k)
        if sink_dir is None:
            raise ValueError("DocTriples requires sink_dir")
        self.sink_dir = sink_dir
        self.emitted: set[str] = set()  # per-actor (entity, type) memo

    _EMPTY_PAIRS = None  # class-level lazy empty table

    def __call__(self, batch):
        import os

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..constants import AVOID_PREDICATES
        from .triple_extract import (
            doc_type_triples_batch,
            mention_triples_batch,
        )

        # deterministic, content-keyed file name: batches partition the
        # doc-id space, so (min,max) is unique per batch and a RETRIED task
        # overwrites its own file instead of duplicating rows (exactly-once
        # output under Ray's at-least-once task execution)
        mm = pc.min_max(batch.column("doc_id"))
        fname = (f"part-{mm['min'].as_py() or 0:012d}-"
                 f"{mm['max'].as_py() or 0:012d}.parquet")

        empty_pairs = pa.table({
            "entity_uri": pa.array([], type=pa.string()),
            "type_uri": pa.array([], type=pa.string()),
        })
        linked = self._link_batch(batch)
        if len(linked) == 0:
            return empty_pairs
        pairs = linked[["doc_id", "entity_uri"]]

        mention_t = mention_triples_batch(pairs)

        typed = pairs.merge(self.types, on="entity_uri", how="inner")
        votes = (
            typed.groupby(["doc_id", "type_uri"], sort=False, observed=True)
            .size().reset_index(name="n")
        )
        votes = votes.sort_values(["n", "type_uri"], ascending=[False, True],
                                  kind="mergesort")
        winners = votes.drop_duplicates(subset=["doc_id"], keep="first")
        win_t = doc_type_triples_batch(winners[["doc_id", "type_uri"]])

        out = pa.concat_tables([mention_t, win_t])
        # M6 blocklist (kept for semantics parity; minted preds never match)
        out = out.filter(pc.invert(pc.is_in(
            out.column("pred"), value_set=pa.array(sorted(AVOID_PREDICATES)))))
        out = out.sort_by([("subj", "ascending"), ("pred", "ascending"),
                           ("obj", "ascending")])
        # atomic publish: concurrent retry attempts each write their own tmp
        # then rename; last rename wins with identical content
        dst = os.path.join(self.sink_dir, fname)
        tmp = f"{dst}.tmp{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, dst)

        # entity-type side stream, thinned by the per-actor memo (vectorized
        # over a KG-bounded frame: at most |entity_types| rows per batch)
        et = typed[["entity_uri", "type_uri"]].drop_duplicates()
        if len(et) == 0:
            return empty_pairs
        key = et["entity_uri"] + "\x1f" + et["type_uri"]
        fresh = ~key.isin(self.emitted)
        self.emitted.update(key[fresh])
        return pa.Table.from_pandas(
            et[fresh].reset_index(drop=True), preserve_index=False
        ).replace_schema_metadata(None)
