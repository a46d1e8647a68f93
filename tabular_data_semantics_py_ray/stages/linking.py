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
        import numpy as np
        import ray as _ray

        from ..constants import AVOID_TOP_CONCEPTS
        from .. import fixture_kg as _fk

        self.linker = EntityLinker(lexicon_ref, alias_ref, types_ref, top_k)
        types = (
            _ray.get(types_ref) if types_ref is not None else _fk.entity_types_df()
        )
        types = types[~types["type_uri"].isin(AVOID_TOP_CONCEPTS)]

        # Integer-code structures (the linking_fast kernel, shared semantics
        # equality-tested in tests/test_doclocal.py): global entity codes
        # over the resolution targets + a CSR entity->type-codes table, so
        # the per-batch vote body is np.unique over int64 keys — no pandas
        # frame is allocated per batch.
        ent_uris = sorted(set(self.linker.ent_arr.to_pylist()))
        ent_code = {e: i for i, e in enumerate(ent_uris)}
        self.n_ent = max(len(ent_uris), 1)
        self.ent_uri_arr = pa.array(ent_uris, type=pa.string())
        type_uris = sorted(types["type_uri"].unique())
        t_code = {t: i for i, t in enumerate(type_uris)}
        self.n_type = max(len(type_uris), 1)
        self.type_uri_arr = pa.array(type_uris, type=pa.string())
        per_ent: list[list[int]] = [[] for _ in range(self.n_ent)]
        for r in types.itertuples(index=False):
            c = ent_code.get(r.entity_uri)
            if c is not None:
                per_ent[c].append(t_code[r.type_uri])
        self.ent_tcount = np.array([len(v) for v in per_ent], dtype=np.int64)
        self.ent_toff = np.concatenate(
            ([0], np.cumsum(self.ent_tcount)[:-1])).astype(np.int64)
        self.tcodes_flat = np.array(
            [t for v in per_ent for t in sorted(v)], dtype=np.int64)

    def _link_codes(self, batch):
        """documents batch -> (didx, ent_k, ddict): per linked occurrence,
        the batch-local doc dictionary code and the GLOBAL entity code.

        Mention detect + link stay Arrow end-to-end; the two result columns
        are dictionary/index-encoded straight to int64 — no pandas."""
        import numpy as np

        from .interleave import interleave_batch
        from .mention_detect import detect_mentions_batch

        docs_tbl = interleave_batch(batch)
        mentions_tbl = detect_mentions_batch(docs_tbl)
        linked = self.linker(mentions_tbl)
        d = linked.column("doc_id")
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        denc = d.dictionary_encode()
        didx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        e = linked.column("entity_uri")
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        ent_k = pc.index_in(e, value_set=self.ent_uri_arr).to_numpy(
            zero_copy_only=False).astype(np.int64)
        assert len(denc.dictionary) * max(self.n_ent, self.n_type) < (1 << 62)
        return didx, ent_k, denc.dictionary

    def _expand_types(self, ent_codes):
        """CSR expansion: entity codes -> (repeated parent index, flat type
        codes). Parent repeat counts come from ent_tcount."""
        import numpy as np

        tc = self.ent_tcount[ent_codes]
        tot = int(tc.sum())
        if not tot:
            z = np.empty(0, dtype=np.int64)
            return z, z
        first = np.cumsum(tc) - tc
        within = np.arange(tot, dtype=np.int64) - np.repeat(first, tc)
        tflat = self.tcodes_flat[np.repeat(self.ent_toff[ent_codes], tc) + within]
        return np.repeat(np.arange(len(ent_codes), dtype=np.int64), tc), tflat

    def _votes(self, didx, ent_k):
        """(winning doc code, winning type code) per doc: occurrence x type
        expansion, int64-key count, deterministic (n desc, type asc) pick."""
        import numpy as np

        parent, tflat = self._expand_types(ent_k)
        if not len(parent):
            z = np.empty(0, dtype=np.int64)
            return z, z
        ukey, cnt = np.unique(didx[parent] * self.n_type + tflat,
                              return_counts=True)
        wd, wt = ukey // self.n_type, ukey % self.n_type
        order = np.lexsort((wt, -cnt, wd))  # (doc asc, n desc, type asc)
        wd_o = wd[order]
        firsts = np.unique(wd_o, return_index=True)[1]
        return wd_o[firsts], wt[order][firsts]

    @staticmethod
    def _const(value: str, n: int) -> pa.Array:
        return pa.nulls(n, pa.string()).fill_null(value)

    def __call__(self, batch):
        import numpy as np

        empty = pa.table({
            "kind": pa.array([], type=pa.string()),
            "doc_id": pa.array([], type=pa.string()),
            "a": pa.array([], type=pa.string()),
            "b": pa.array([], type=pa.string()),
        })
        didx, ent_k, ddict = self._link_codes(batch)
        if len(didx) == 0:
            return empty

        # distinct (doc, entity) mention pairs
        uq = np.unique(didx * self.n_ent + ent_k)
        mdoc, ment = uq // self.n_ent, uq % self.n_ent
        # per-doc vote winners
        win_doc, win_type = self._votes(didx, ent_k)
        # all (entity, type) pairs for entities present in this batch
        ents_present = np.unique(ent_k)
        parent, e_tflat = self._expand_types(ents_present)
        pair_ent = ents_present[parent]

        n_m, n_w, n_e = len(mdoc), len(win_doc), len(pair_ent)
        return pa.table({
            "kind": pa.concat_arrays([self._const("mention", n_m),
                                      self._const("win", n_w),
                                      self._const("etype", n_e)]),
            "doc_id": pa.concat_arrays([
                ddict.take(pa.array(mdoc)).cast(pa.string()),
                ddict.take(pa.array(win_doc)).cast(pa.string()),
                self._const("", n_e)]),
            "a": pa.concat_arrays([
                self.ent_uri_arr.take(pa.array(ment)),
                self.type_uri_arr.take(pa.array(win_type)),
                self.ent_uri_arr.take(pa.array(pair_ent))]),
            "b": pa.concat_arrays([
                self._const("", n_m + n_w),
                self.type_uri_arr.take(pa.array(e_tflat))]),
        })


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
        import numpy as np

        self.sink_dir = sink_dir
        self.emitted = np.empty(0, dtype=np.int64)  # (ent, type) code memo

    def __call__(self, batch):
        import os

        import numpy as np
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
        didx, ent_k, ddict = self._link_codes(batch)
        if len(didx) == 0:
            return empty_pairs

        uq = np.unique(didx * self.n_ent + ent_k)
        mdoc, ment = uq // self.n_ent, uq % self.n_ent
        mention_t = mention_triples_batch(pa.table({
            "doc_id": ddict.take(pa.array(mdoc)).cast(pa.string()),
            "entity_uri": self.ent_uri_arr.take(pa.array(ment)),
        }))

        win_doc, win_type = self._votes(didx, ent_k)
        win_t = doc_type_triples_batch(pa.table({
            "doc_id": ddict.take(pa.array(win_doc)).cast(pa.string()),
            "type_uri": self.type_uri_arr.take(pa.array(win_type)),
        }))

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

        # entity-type side stream, thinned by the per-actor integer memo
        # (KG-bounded: at most |entity_types| codes per batch)
        ents_present = np.unique(ent_k)
        parent, tflat = self._expand_types(ents_present)
        if not len(parent):
            return empty_pairs
        pair_codes = ents_present[parent] * self.n_type + tflat
        new = np.setdiff1d(pair_codes, self.emitted, assume_unique=False)
        if len(new) == 0:
            return empty_pairs
        self.emitted = np.union1d(self.emitted, new)
        return pa.table({
            "entity_uri": self.ent_uri_arr.take(pa.array(new // self.n_type)),
            "type_uri": self.type_uri_arr.take(pa.array(new % self.n_type)),
        })
