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
