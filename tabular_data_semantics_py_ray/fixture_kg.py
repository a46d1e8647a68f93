"""Deterministic fixture knowledge graph.

Replaces the reference's remote DBpedia/Wikidata lookup + SPARQL endpoint
services (``kg/lookup.py``, ``kg/endpoints.py`` in
/root/reference/TabularSemantics/src/) with small, fully deterministic local
tables over the synthetic corpus vocabulary:

- ``lexicon``        ~ lookup service + annotation index
  (kg/lookup.py:162-209; ontology/ontology_projection.py:1420-1470)
- ``entity_types``   ~ endpoint rdf:type assertions (kg/endpoints.py:435-466)
- ``alias_edges``    ~ wikiPageRedirects / owl:sameAs
  (kg/endpoints.py:400-409,530-538)
- ``class_closure``  ~ ontology ancestor closure with distance
  (ontology/onto_access.py:189-204; kg/endpoints.py:481-525)

Everything is defined ONCE here in plain Python and emitted in two forms that
are guaranteed consistent: Arrow/pandas tables for the Ray Data pipeline, and
SQL ``VALUES`` clauses for the DuckDB oracle queries the driver runs
side-by-side.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
import pyarrow as pa

from .constants import ENT, ONT


def _e(name: str) -> str:
    return ENT + name


def _c(name: str) -> str:
    return ONT + name


# --------------------------------------------------------------------------
# Class taxonomy: child -> parent (single inheritance; 'Thing' is the root).
# Mirrors the shape the reference loads from dbpedia.owl via owlready2
# (onto_access.py:42-98) but precomputed structurally — no reasoner.
# --------------------------------------------------------------------------
CLASS_PARENT: dict[str, str] = {
    "Agent": "Thing",
    "Party": "Agent",
    "Customer": "Party",
    "Supplier": "Party",
    "Artifact": "Thing",
    "Furniture": "Artifact",
    "Framework": "Artifact",
    "DataStructure": "Artifact",
    "Relation": "DataStructure",
    "IndexKey": "DataStructure",
    "ColumnStruct": "DataStructure",
    "RowStruct": "DataStructure",
    "VectorStruct": "DataStructure",
    "Process": "Thing",
    "DBOperation": "Process",
    "Commerce": "Process",
    "LineItem": "Commerce",
    "Disambiguation": "Thing",
}

# --------------------------------------------------------------------------
# Lexicon: surface form -> ranked candidate entities (rank 1 = best).
# Relevance order is part of the contract, like the lookup service's result
# order (kg/lookup.py:212-219, top-k semantics T1 in SURVEY §2.6).
# Ambiguous forms ('order', 'table', 'line') exercise the voting +
# most-specific-class path; 'line' rank-1 is a disambiguation-page analogue
# (wikidata Q4167410, matching/kg_matching.py:417-420); 'spark'/'vector'
# rank-1 entities are redirect sources (challenge_utils.py:441-453).
# --------------------------------------------------------------------------
LEXICON: list[tuple[str, str, int]] = [
    ("customer", _e("Customer"), 1),
    ("part", _e("Part"), 1),
    ("order", _e("Order_Commerce"), 1),
    ("order", _e("Order_Sort"), 2),
    ("table", _e("Table_Relation"), 1),
    ("table", _e("Table_Furniture"), 2),
    ("key", _e("Key_Index"), 1),
    ("row", _e("Row_Struct"), 1),
    ("column", _e("Column_Struct"), 1),
    ("vector", _e("Vector_Legacy"), 1),  # redirect -> Vector_Struct
    ("vector", _e("Vector_Struct"), 2),
    ("join", _e("Join_Op"), 1),
    ("sort", _e("Sort_Op"), 1),
    ("scan", _e("Scan_Op"), 1),
    ("merge", _e("Merge_Op"), 1),
    ("filter", _e("Filter_Op"), 1),
    ("hash", _e("Hash_Op"), 1),
    ("query", _e("Query_Op"), 1),
    ("group", _e("Group_Op"), 1),
    ("agg", _e("Agg_Op"), 1),
    ("window", _e("Window_Op"), 1),
    ("stream", _e("Stream_Proc"), 1),
    ("batch", _e("Batch_Proc"), 1),
    ("spark", _e("Spark_Legacy"), 1),  # redirect chain -> Spark (2 hops)
    ("spark", _e("Spark"), 2),
    ("line", _e("Line_Dab"), 1),  # disambiguation page: skipped by linker
    ("line", _e("Line_Item"), 2),
    ("data", _e("Data_Set"), 1),
    ("value", _e("Value_Lit"), 1),
    # --- type-repair cascade fixtures (round 2) ---
    ("big", _e("Big_Party"), 1),    # lookup-branch fixpoint case (A5)
    ("fast", _e("Fast_Entity"), 1),  # cross-KG-chain-only entity (A4)
    ("slow", _e("Slow_Entity"), 1),  # cross-KG disambig-cleared entity (A4)
]

# Direct rdf:type assertions (entity -> classes). Entities absent here have
# no types (redirect sources have none, like dbpedia redirect pages).
ENTITY_TYPES: dict[str, list[str]] = {
    _e("Customer"): ["Customer"],
    _e("Part"): ["Artifact"],
    _e("Order_Commerce"): ["Commerce"],
    _e("Order_Sort"): ["DBOperation"],
    _e("Table_Relation"): ["Relation"],
    _e("Table_Furniture"): ["Furniture"],
    _e("Key_Index"): ["IndexKey"],
    _e("Row_Struct"): ["RowStruct"],
    _e("Column_Struct"): ["ColumnStruct"],
    _e("Vector_Struct"): ["VectorStruct"],
    _e("Join_Op"): ["DBOperation"],
    _e("Sort_Op"): ["DBOperation"],
    _e("Scan_Op"): ["DBOperation"],
    _e("Merge_Op"): ["DBOperation"],
    _e("Filter_Op"): ["DBOperation"],
    _e("Hash_Op"): ["DBOperation"],
    _e("Query_Op"): ["DBOperation"],
    _e("Group_Op"): ["DBOperation"],
    _e("Agg_Op"): ["DBOperation"],
    _e("Window_Op"): ["DBOperation"],
    _e("Stream_Proc"): ["Process"],
    _e("Batch_Proc"): ["Process"],
    _e("Spark"): ["Framework"],
    _e("Line_Dab"): ["Disambiguation"],
    _e("Line_Item"): ["LineItem"],
    _e("Data_Set"): ["DataStructure"],
    _e("Value_Lit"): ["DataStructure"],
    # Big_Party: endpoint types exercising the A5 fixpoint — lookup seed
    # {Customer} admits Party (ancestor), then Supplier via the ALREADY
    # ADDED Party (descendant), which a single seed-only pass would miss.
    _e("Big_Party"): ["Party", "Supplier"],
    # Fast_Entity / Slow_Entity deliberately have NO endpoint types: they
    # are resolvable only via the cross-KG sameAs chain (A4).
}

# Alias edges: (src, dst, kind). Redirect chains of length 2 test the
# reference's 2-iteration (not fixpoint) closure (challenge_utils.py:441-453).
ALIAS_EDGES: list[tuple[str, str, str]] = [
    (_e("Vector_Legacy"), _e("Vector_Struct"), "redirect"),
    (_e("Spark_Legacy"), _e("Spark_Mid"), "redirect"),
    (_e("Spark_Mid"), _e("Spark"), "redirect"),
    (_e("Agg_Op"), _e("Aggregate_Op"), "sameas"),
]

DISAMBIGUATION_CLASS = _c("Disambiguation")

# --------------------------------------------------------------------------
# Type-repair cascade fixtures (A2/A3/A4/A5 — round 2).
# --------------------------------------------------------------------------

# ~ the types carried inside lookup-service responses (kg/lookup.py:162-209);
# they SEED the repair cascade (matching/kg_matching.py:522-545). May agree
# with, generalize, or conflict with the endpoint types above.
LOOKUP_TYPES: dict[str, list[str]] = {
    _e("Customer"): ["Party"],          # ancestor of endpoint type: compat
    _e("Table_Furniture"): ["Artifact"],  # ancestor of Furniture: compat
    _e("Part"): ["Furniture"],          # endpoint Artifact is its ancestor
    _e("Table_Relation"): ["Relation"],  # equal to endpoint type
    _e("Spark"): ["Process"],           # CONFLICTS with endpoint Framework
    _e("Big_Party"): ["Customer"],      # fixpoint case (see ENTITY_TYPES)
}

# Local statement table ~ the triples the predicate strategy queries via
# SPARQL (kg/endpoints.py:340-368). Subject/object are fixture entities.
_ST = [
    # Join_Op as object of usesOp x4 -> range {DBOperation}, count 4 > 3
    ("Stream_Proc", "usesOp", "Join_Op"),
    ("Batch_Proc", "usesOp", "Join_Op"),
    ("Spark", "usesOp", "Join_Op"),
    ("Big_Party", "usesOp", "Join_Op"),
    # Hash_Op as object x4 AND as subject x4 -> range {DBOperation} plus
    # compatible domain {Process} (domain admitted: Process ~ DBOperation)
    ("Stream_Proc", "usesOp", "Hash_Op"),
    ("Batch_Proc", "usesOp", "Hash_Op"),
    ("Spark", "usesOp", "Hash_Op"),
    ("Data_Set", "usesOp", "Hash_Op"),
    ("Hash_Op", "usesOp", "Scan_Op"),
    ("Hash_Op", "usesOp", "Sort_Op"),
    ("Hash_Op", "usesOp", "Merge_Op"),
    ("Hash_Op", "usesOp", "Filter_Op"),
    # Query_Op: three range classes -> top-2 truncation + (n desc, type asc)
    # tie-break: DBOperation(5), Framework(4), Process(4) -> keep first two
    ("Stream_Proc", "usesOp", "Query_Op"),
    ("Batch_Proc", "usesOp", "Query_Op"),
    ("Spark", "usesOp", "Query_Op"),
    ("Data_Set", "usesOp", "Query_Op"),
    ("Value_Lit", "usesOp", "Query_Op"),
    ("Join_Op", "runsOn", "Query_Op"),
    ("Sort_Op", "runsOn", "Query_Op"),
    ("Scan_Op", "runsOn", "Query_Op"),
    ("Merge_Op", "runsOn", "Query_Op"),
    ("Filter_Op", "loggedBy", "Query_Op"),
    ("Group_Op", "loggedBy", "Query_Op"),
    ("Agg_Op", "loggedBy", "Query_Op"),
    ("Window_Op", "loggedBy", "Query_Op"),
    # Merge_Op as object only x2 -> HAVING count > 3 drops it (no strategy)
    ("Data_Set", "usesOp", "Merge_Op"),
    ("Spark", "usesOp", "Merge_Op"),
]
STATEMENTS: list[tuple[str, str, str]] = [
    (_e(s), _c(p), _e(o)) for s, p, o in _ST
] + [
    # literal- and mixed-object predicates for the A9 property-kind
    # classifier (majority startswith('http') over distinct values,
    # oaei/dbpedia_fragment.py:469-499). Not in PRED_SCHEMA, so the
    # predicate strategy never sees them.
    (_e("Join_Op"), _c("annotatedWith"), "hash based"),
    (_e("Sort_Op"), _c("annotatedWith"), "stable sort"),
    (_e("Hash_Op"), _c("annotatedWith"), "radix build"),
    (_e("Join_Op"), _c("linkedVia"), _e("Query_Op")),
    (_e("Merge_Op"), _c("linkedVia"), _e("Sort_Op")),
    (_e("Scan_Op"), _c("linkedVia"), "scan hint"),
]

# pred -> (rdfs:domain class, rdfs:range class); one of each, like the
# reference's dbpedia property declarations the strategy queries join on.
PRED_SCHEMA: dict[str, tuple[str, str]] = {
    _c("usesOp"): (_c("Process"), _c("DBOperation")),
    _c("runsOn"): (_c("DBOperation"), _c("Framework")),
    _c("loggedBy"): (_c("DBOperation"), _c("Process")),
}

# Cross-KG fixtures ~ wikidata (kg_matching.py:394-440). Second KG has its
# own namespaces; equivalences map back into the fixture ontology.
KG2E = "http://kg2.example.org/entity/"
KG2C = "http://kg2.example.org/class/"
KG2_DISAMBIGUATION_CONCEPT = KG2C + "Disambig"  # ~ wikidata Q4167410

KG2_SAMEAS: list[tuple[str, str]] = [
    (_e("Fast_Entity"), KG2E + "Fast"),
    (_e("Slow_Entity"), KG2E + "Slow"),
]
KG2_TYPES: list[tuple[str, str]] = [
    (KG2E + "Fast", KG2C + "FastClass"),
    (KG2E + "Slow", KG2C + "SlowClass"),
    (KG2E + "Slow", KG2_DISAMBIGUATION_CONCEPT),  # clears the whole set
]
KG2_EQUIV: list[tuple[str, str]] = [
    (KG2C + "FastClass", _c("DataStructure")),
]

# --------------------------------------------------------------------------
# Ontology axioms beyond the plain taxonomy — inputs to the A10 projection
# (ontology/ontology_projection.py:301-662): class equivalences, existential
# restrictions, property inverses and property equivalences.
# --------------------------------------------------------------------------
# owl:equivalentClass — projected as TWO subsumptions (:341-347).
# 'Collection' exists only through this axiom (like an imported-ontology
# class with no local taxonomy position).
CLASS_EQUIV: list[tuple[str, str]] = [
    ("DataStructure", "Collection"),
]
# C subClassOf (p some D) — projected as the triple (C, p, D) (:483-508).
RESTRICTIONS: list[tuple[str, str, str]] = [
    ("Customer", "places", "Commerce"),
    ("Supplier", "supplies", "Artifact"),
]
# owl:inverseOf — every (s, p, o) assertion also yields (o, q, s) (:519-526).
PROP_INVERSES: list[tuple[str, str]] = [
    ("usesOp", "usedBy"),
]
# owl:equivalentProperty — (s, p, o) also yields (s, q, o) (:529-537).
PROP_EQUIV: list[tuple[str, str]] = [
    ("runsOn", "executesOn"),
]

# --------------------------------------------------------------------------
# Data-property axioms (ontology_projection.py:557-607). Data properties
# range over literals, so the projection emits no domain x range triple for
# them; it records the rdfs:domain (12a, :575-580), propagates ONLY the
# domain for data restrictions (12b, :582-587 — add_triple=False), carries
# data role assertions through (12c, :589-591) and propagates data-property
# equivalences over those assertions (12d, :593-599).
# --------------------------------------------------------------------------
DATA_PROP_DOMAIN: dict[str, str] = {
    "opLabel": "DBOperation",
    "opCost": "DBOperation",
}
# C subClassOf (dp some <datatype>): only C subClassOf domain(dp) projected.
DATA_RESTRICTIONS: list[tuple[str, str]] = [
    ("CostedOperation", "opCost"),
]
# (entity, data_prop, literal) role assertions.
DATA_STATEMENTS: list[tuple[str, str, str]] = [
    ("Join_Op", "opLabel", "hash join"),
    ("Sort_Op", "opLabel", "merge sort"),
    ("Join_Op", "opCost", "42"),
]
# owl:equivalentProperty among data properties.
DATA_PROP_EQUIV: list[tuple[str, str]] = [
    ("opLabel", "caption"),
]

# --------------------------------------------------------------------------
# Complex class-expression axioms (ontology_projection.py:797-935):
# C sub/equiv of an intersection/union whose members are atomic classes or
# existential restrictions; a restriction target is either one atomic class
# or a union/intersection of atomics. Member forms here:
#   ("cls", name)                — atomic member
#   ("some", prop, (t1, ...))    — existential restriction over targets
# --------------------------------------------------------------------------
COMPLEX_AXIOMS: list[tuple[str, tuple]] = [
    # StreamProcess subClassOf (Process and (usesOp some RowStruct))
    ("StreamProcess", (("cls", "Process"),
                       ("some", "usesOp", ("RowStruct",)))),
    # DistributedOp equivalentTo (runsOn some (Framework or Collection))
    ("DistributedOp", (("some", "runsOn", ("Framework", "Collection")),)),
]


# --------------------------------------------------------------------------
# Derived closures (computed, not hand-written).
# --------------------------------------------------------------------------
@lru_cache(maxsize=1)
def class_closure() -> list[tuple[str, str, int]]:
    """(cls_uri, ancestor_uri, distance) for every strict ancestor.

    ~ onto_access.py:189-204 ancestor closure, with SPARQL-style distance
    (kg/endpoints.py:481-525).
    """
    rows = []
    for cls in CLASS_PARENT:
        cur, dist = cls, 0
        while cur in CLASS_PARENT:
            cur = CLASS_PARENT[cur]
            dist += 1
            rows.append((_c(cls), _c(cur), dist))
    return rows


@lru_cache(maxsize=1)
def all_classes() -> tuple[str, ...]:
    return tuple(sorted(set(CLASS_PARENT) | set(CLASS_PARENT.values())))


@lru_cache(maxsize=1)
def compat_pairs() -> frozenset[tuple[str, str]]:
    """(target_cls_uri, source_cls_uri) pairs where ``source`` is compatible
    with ``target``: source in reflexive-ancestors(target) minus the Agent
    class, or in reflexive-descendants(target).

    Mirrors ``__isCompatibleType`` (matching/kg_matching.py:608-624) with
    owlready2's REFLEXIVE ``ancestors()/descendants()`` (both include the
    class itself and Thing) and the DBpedia-variant Agent removal
    (onto_access.py:346-356).
    """
    anc: dict[str, set[str]] = {}
    for cls in all_classes():
        cur, chain = cls, {cls}
        while cur in CLASS_PARENT:
            cur = CLASS_PARENT[cur]
            chain.add(cur)
        anc[cls] = chain
    pairs = set()
    for tgt in all_classes():
        for src in anc[tgt]:  # reflexive ancestors
            if src != "Agent":
                pairs.add((_c(tgt), _c(src)))
    for src in all_classes():  # reflexive descendants: invert ancestors
        for tgt in anc[src]:
            pairs.add((_c(tgt), _c(src)))
    return frozenset(pairs)


@lru_cache(maxsize=1)
def redirect_map() -> dict[str, str]:
    """src -> final target after at most 2 redirect hops.

    Reference semantics: exactly two closure iterations, NOT a fixpoint
    (challenge_utils.py:441-453).
    """
    one = {s: d for s, d, k in ALIAS_EDGES if k == "redirect"}
    return {s: one.get(one.get(s, s), one.get(s, s)) for s in one}


def resolve(uri: str) -> str:
    return redirect_map().get(uri, uri)


@lru_cache(maxsize=1)
def disambiguation_entities() -> frozenset[str]:
    return frozenset(
        e for e, ts in ENTITY_TYPES.items() if "Disambiguation" in ts
    )


# --------------------------------------------------------------------------
# pandas / Arrow emitters (Ray side pins these per actor).
# --------------------------------------------------------------------------
def lexicon_df() -> pd.DataFrame:
    return pd.DataFrame(LEXICON, columns=["surface_form", "entity_uri", "rank"]).astype(
        {"rank": "int32"}
    )


def entity_types_df() -> pd.DataFrame:
    rows = [(e, _c(t)) for e, ts in ENTITY_TYPES.items() for t in ts]
    return pd.DataFrame(rows, columns=["entity_uri", "type_uri"])


def alias_edges_df() -> pd.DataFrame:
    return pd.DataFrame(ALIAS_EDGES, columns=["uri_a", "uri_b", "kind"])


def class_closure_df() -> pd.DataFrame:
    return pd.DataFrame(
        class_closure(), columns=["cls_uri", "ancestor_uri", "distance"]
    ).astype({"distance": "int32"})


def lexicon_table() -> pa.Table:
    return pa.Table.from_pandas(lexicon_df(), preserve_index=False)


def lookup_types_df() -> pd.DataFrame:
    rows = [(e, _c(t)) for e, ts in LOOKUP_TYPES.items() for t in ts]
    return pd.DataFrame(rows, columns=["entity_uri", "type_uri"])


def statements_df() -> pd.DataFrame:
    return pd.DataFrame(STATEMENTS, columns=["subj", "pred", "obj"])


def pred_schema_df() -> pd.DataFrame:
    rows = [(p, d, r) for p, (d, r) in PRED_SCHEMA.items()]
    return pd.DataFrame(rows, columns=["pred", "domain_cls", "range_cls"])


def compat_pairs_df() -> pd.DataFrame:
    return pd.DataFrame(sorted(compat_pairs()), columns=["tgt_cls", "src_cls"])


def kg2_sameas_df() -> pd.DataFrame:
    return pd.DataFrame(KG2_SAMEAS, columns=["entity_uri", "kg2_uri"])


def kg2_types_df() -> pd.DataFrame:
    return pd.DataFrame(KG2_TYPES, columns=["kg2_uri", "kg2_cls"])


def kg2_equiv_df() -> pd.DataFrame:
    return pd.DataFrame(KG2_EQUIV, columns=["kg2_cls", "cls_uri"])


# --------------------------------------------------------------------------
# SQL VALUES emitters (oracle side). Generated from the same Python data, so
# Ray and DuckDB can never drift apart on fixture content.
# --------------------------------------------------------------------------
def _values(rows, quote_cols) -> str:
    out = []
    for r in rows:
        cells = []
        for i, v in enumerate(r):
            if i in quote_cols:
                cells.append("'" + str(v).replace("'", "''") + "'")
            else:
                cells.append(str(v))
        out.append("(" + ", ".join(cells) + ")")
    return ",\n    ".join(out)


def lexicon_values_sql() -> str:
    """``lex(surface_form, entity_uri, rank)`` VALUES body."""
    return _values(LEXICON, quote_cols={0, 1})


def entity_types_values_sql() -> str:
    rows = [(e, _c(t)) for e, ts in ENTITY_TYPES.items() for t in ts]
    return _values(rows, quote_cols={0, 1})


def alias_edges_values_sql() -> str:
    return _values(ALIAS_EDGES, quote_cols={0, 1, 2})


def class_closure_values_sql() -> str:
    return _values(class_closure(), quote_cols={0, 1})


def redirect_values_sql() -> str:
    """Raw single-hop redirect edges (closure left to the SQL query)."""
    rows = [(s, d) for s, d, k in ALIAS_EDGES if k == "redirect"]
    return _values(rows, quote_cols={0, 1})


def lookup_types_values_sql() -> str:
    rows = [(e, _c(t)) for e, ts in LOOKUP_TYPES.items() for t in ts]
    return _values(rows, quote_cols={0, 1})


def statements_values_sql() -> str:
    return _values(STATEMENTS, quote_cols={0, 1, 2})


def pred_schema_values_sql() -> str:
    rows = [(p, d, r) for p, (d, r) in PRED_SCHEMA.items()]
    return _values(rows, quote_cols={0, 1, 2})


def compat_pairs_values_sql() -> str:
    return _values(sorted(compat_pairs()), quote_cols={0, 1})


def kg2_sameas_values_sql() -> str:
    return _values(KG2_SAMEAS, quote_cols={0, 1})


def kg2_types_values_sql() -> str:
    return _values(KG2_TYPES, quote_cols={0, 1})


def kg2_equiv_values_sql() -> str:
    return _values(KG2_EQUIV, quote_cols={0, 1})


def class_parent_values_sql() -> str:
    """Direct (child, parent) subsumption edges."""
    rows = [(_c(ch), _c(p)) for ch, p in sorted(CLASS_PARENT.items())]
    return _values(rows, quote_cols={0, 1})


def class_equiv_values_sql() -> str:
    rows = [(_c(a), _c(b)) for a, b in CLASS_EQUIV]
    return _values(rows, quote_cols={0, 1})


def restrictions_values_sql() -> str:
    rows = [(_c(c), _c(p), _c(d)) for c, p, d in RESTRICTIONS]
    return _values(rows, quote_cols={0, 1, 2})


def prop_inverses_values_sql() -> str:
    rows = [(_c(p), _c(q)) for p, q in PROP_INVERSES]
    return _values(rows, quote_cols={0, 1})


def prop_equiv_values_sql() -> str:
    rows = [(_c(p), _c(q)) for p, q in PROP_EQUIV]
    return _values(rows, quote_cols={0, 1})


def data_prop_domain_values_sql() -> str:
    rows = [(_c(p), _c(d)) for p, d in sorted(DATA_PROP_DOMAIN.items())]
    return _values(rows, quote_cols={0, 1})


def data_restrictions_values_sql() -> str:
    rows = [(_c(c), _c(p)) for c, p in DATA_RESTRICTIONS]
    return _values(rows, quote_cols={0, 1})


def data_statements_values_sql() -> str:
    rows = [(_e(s), _c(p), lit) for s, p, lit in DATA_STATEMENTS]
    return _values(rows, quote_cols={0, 1, 2})


def data_prop_equiv_values_sql() -> str:
    rows = [(_c(p), _c(q)) for p, q in DATA_PROP_EQUIV]
    return _values(rows, quote_cols={0, 1})


def complex_members_values_sql() -> str:
    """Atomic-class members of complex expressions: (cls, member)."""
    rows = [(_c(c), _c(m[1])) for c, members in COMPLEX_AXIOMS
            for m in members if m[0] == "cls"]
    return _values(rows, quote_cols={0, 1})


def complex_restrictions_values_sql() -> str:
    """Restriction members flattened to (cls, prop, target, is_single):
    is_single=1 when the restriction's target was one atomic class (range
    propagation applies only then, ontology_projection.py:884-910)."""
    rows = []
    for c, members in COMPLEX_AXIOMS:
        for m in members:
            if m[0] == "some":
                single = 1 if len(m[2]) == 1 else 0
                for t in m[2]:
                    rows.append((_c(c), _c(m[1]), _c(t), single))
    return _values(rows, quote_cols={0, 1, 2})
