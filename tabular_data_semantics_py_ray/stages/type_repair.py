"""A5 type-repair cascade with A2 compatibility, A3 predicate strategy and
A4 cross-KG fallback — the reference's core entity-typing semantic.

Reference (file:line in /root/reference/TabularSemantics/src/):

- ``__analyseEntityTypes`` (matching/kg_matching.py:522-584): lookup types
  seed the entity; endpoint types are added iff compatible; with no lookup
  types, the predicate domain/range strategy seeds instead; endpoint-all is
  the fallback; predicate types are appended whenever the result is
  non-empty ("last resource" block).
- ``__isCompatibleType`` / ``__checkCompatibilityTypes``
  (matching/kg_matching.py:596-624): source in reflexive ancestors
  (DBpedia variant drops Agent, onto_access.py:346-356) or reflexive
  descendants of some target.
- ``__getTypesPredicateStrategy`` (matching/kg_matching.py:357-389): top-2
  range classes of predicates with the entity as object, plus the top-1
  domain class of predicates with the entity as subject admitted only if
  compatible with the range side; counts come from the SPARQL
  ``GROUP BY ?uri HAVING (COUNT(?uri) > 3) ORDER BY DESC(COUNT(?uri))``
  shape (kg/endpoints.py:364-369) — undefined SPARQL tie order made
  deterministic here as (count desc, class asc).
- ``__getTypesWikidataStrategy`` (matching/kg_matching.py:394-440): sameAs
  -> other-KG entity -> its types (cleared if the disambiguation concept is
  present) -> equivalent classes -> REFLEXIVE superclass closure
  (``subClassOf*``, kg/endpoints.py:490-498; note the equivalent classes
  enter the result only via that reflexive closure). Placed as the final
  fallback exactly like the sampling cascade lookup -> predicate ->
  wikidata (kg_matching.py:155-171).

Determinism note (SURVEY §7.3): the reference adds endpoint types *while
iterating a Python set*, so its result depends on set iteration order. Here
the lookup branch computes the order-independent FIXPOINT of that rule (the
closure of every possible iteration order); everything else is one-pass, as
in the reference.

Scale shape: the cascade runs per DISTINCT entity (a ``bucket_distinct``
upstream, A8 dataflow-memoization), inside a stateful actor pool whose
``__init__`` pins the small KG-side tables and precomputes the
corpus-independent predicate-strategy and cross-KG type sets. Per-entity
work is O(|type sets|^2) over single-digit sets — the batch loop is bounded
by KG size, not corpus size.
"""

from __future__ import annotations

import pandas as pd

from .. import fixture_kg
from ..constants import ONT


def _predicate_strategy_types() -> dict[str, list[str]]:
    """entity -> deterministic types_domain_range list (A3), precomputed
    from the local statement table (corpus-independent)."""
    st = fixture_kg.statements_df()
    ps = fixture_kg.pred_schema_df()
    compat = fixture_kg.compat_pairs()

    rng = (
        st.merge(ps[["pred", "range_cls"]], on="pred")
        .groupby(["obj", "range_cls"], sort=False).size().reset_index(name="n")
    )
    rng = rng[rng["n"] > 3].sort_values(
        ["obj", "n", "range_cls"], ascending=[True, False, True],
        kind="mergesort",
    )
    rng_top = rng.groupby("obj", sort=False).head(2)

    dom = (
        st.merge(ps[["pred", "domain_cls"]], on="pred")
        .groupby(["subj", "domain_cls"], sort=False).size().reset_index(name="n")
    )
    dom = dom[dom["n"] > 3].sort_values(
        ["subj", "n", "domain_cls"], ascending=[True, False, True],
        kind="mergesort",
    )
    dom_top = dom.groupby("subj", sort=False).head(1)

    out: dict[str, list[str]] = {}
    for e, g in rng_top.groupby("obj", sort=False):
        out[e] = sorted(g["range_cls"])
    for e, g in dom_top.groupby("subj", sort=False):
        ranges = out.get(e)
        if not ranges:
            continue  # domain side admitted only when ranges exist (:376)
        for d in g["domain_cls"]:
            if d not in ranges and any((t, d) in compat for t in ranges):
                out[e] = sorted(set(ranges) | {d})
    return out


def _crosskg_types() -> dict[str, list[str]]:
    """entity -> A4 chain types, precomputed (corpus-independent)."""
    sameas = dict(fixture_kg.KG2_SAMEAS)
    kg2_types: dict[str, set[str]] = {}
    for u, c in fixture_kg.KG2_TYPES:
        kg2_types.setdefault(u, set()).add(c)
    equiv: dict[str, set[str]] = {}
    for c2, c1 in fixture_kg.KG2_EQUIV:
        equiv.setdefault(c2, set()).add(c1)
    # reflexive superclass closure per fixture class (subClassOf*)
    sup: dict[str, set[str]] = {}
    for cls in fixture_kg.all_classes():
        uri, cur, chain = fixture_kg._c(cls), cls, {fixture_kg._c(cls)}
        while cur in fixture_kg.CLASS_PARENT:
            cur = fixture_kg.CLASS_PARENT[cur]
            chain.add(fixture_kg._c(cur))
        sup[uri] = chain

    out: dict[str, list[str]] = {}
    for ent, kg2_ent in sameas.items():
        wk = set(kg2_types.get(kg2_ent, ()))
        if fixture_kg.KG2_DISAMBIGUATION_CONCEPT in wk:
            wk.clear()  # kg_matching.py:417-420
        dp = set()
        for c2 in wk:
            dp |= equiv.get(c2, set())
        dp_all: set[str] = set()
        for c1 in dp:
            dp_all |= sup.get(c1, set())
        final = sorted(u for u in dp_all if u.startswith(ONT))
        if final:
            out[ent] = final
    return out


class TypeRepair:
    """Actor: distinct entity batch -> (entity_uri, type_uri, strategy)."""

    def __init__(self):
        lt = fixture_kg.lookup_types_df()
        self.lookup: dict[str, list[str]] = {
            e: sorted(g["type_uri"]) for e, g in lt.groupby("entity_uri")
        }
        et = fixture_kg.entity_types_df()
        self.endpoint: dict[str, list[str]] = {
            e: sorted(g["type_uri"]) for e, g in et.groupby("entity_uri")
        }
        self.compat = fixture_kg.compat_pairs()
        self.tdr = _predicate_strategy_types()
        self.crosskg = _crosskg_types()

    def _compatible(self, src: str, targets) -> bool:
        return any((t, src) in self.compat for t in targets)

    def repair(self, e: str) -> tuple[list[str], str]:
        lk = self.lookup.get(e, ())
        ep = self.endpoint.get(e, ())
        if lk:
            acc = set(lk)
            changed = True
            while changed:  # fixpoint of kg_matching.py:536-545
                changed = False
                for t in ep:
                    if t not in acc and self._compatible(t, acc):
                        acc.add(t)
                        changed = True
            return sorted(acc), "lookup"
        tdr = self.tdr.get(e, ())
        if tdr:
            acc = {t for t in ep
                   if t not in tdr and self._compatible(t, tdr)}
            if not acc:  # kg_matching.py:572-575
                acc = set(ep)
            if acc:  # "last resource" kg_matching.py:579-581
                return sorted(acc | set(tdr)), "predicate"
        elif ep:
            return list(ep), "endpoint"
        wk = self.crosskg.get(e, ())
        if wk:
            return list(wk), "wikidata"
        return [], "none"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ents, types, strategies = [], [], []
        for e in batch["entity_uri"]:
            ts, strat = self.repair(e)
            for t in ts:
                ents.append(e)
                types.append(t)
                strategies.append(strat)
        return pd.DataFrame({
            "entity_uri": pd.Series(ents, dtype="string"),
            "type_uri": pd.Series(types, dtype="string"),
            "strategy": pd.Series(strategies, dtype="string"),
        })


from functools import lru_cache


@lru_cache(maxsize=1)
def _cached_repairer() -> "TypeRepair":
    """Per-worker-process TypeRepair instance (tables are KG-small and
    derived deterministically from the fixture — no broadcast needed)."""
    return TypeRepair()


def _repair_batch(batch: pd.DataFrame) -> pd.DataFrame:
    return _cached_repairer()(batch)


def typed_repair(linked_ds):
    """distinct linked entities -> repaired (entity_uri, type_uri, strategy).

    Stateless tasks with a per-process cached repairer rather than an actor
    pool: the state is tiny, and query pipelines that stack several stages
    must not compete for actor-pool reservations at small cpu counts."""
    from ..util import bucket_distinct

    ents = bucket_distinct(linked_ds, ["entity_uri"], num_buckets=8)
    return ents.map_batches(_repair_batch, batch_format="pandas")


def strategy_census(linked_ds):
    """G6 per-strategy counters: (strategy, n_entities), deterministic."""
    from ..util import bucket_aggregate, bucket_distinct

    repaired = typed_repair(linked_ds)
    per_ent = bucket_distinct(repaired, ["entity_uri", "strategy"],
                              num_buckets=8)
    return bucket_aggregate(
        per_ent, ["strategy"], {"n_entities": ("entity_uri", "count")},
        num_buckets=4,
    )
