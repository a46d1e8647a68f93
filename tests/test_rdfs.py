"""RDFS materialization (rho-df fragment) — hand-verified entailments.

The dump-level parity with the recursive-CTE oracle is covered by
test_oracle_parity (query ``kg_ingest_rdfs``); here a minimal hand graph
pins each RULE's behavior, including the ones a subtly-wrong implementation
gets wrong: inherited domains through a subPropertyOf CHAIN, range NOT
applied to literal objects, and type expansion over inferred (not just
asserted) types.
"""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from tabular_data_semantics_py_ray.constants import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
)
from tabular_data_semantics_py_ray.pipelines.kg_ingest import rdfs_materialize

SP, SC, DOM, RAN, TY = (
    RDFS_SUBPROPERTYOF,
    RDFS_SUBCLASSOF,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDF_TYPE,
)


def _graph():
    rows = [
        # property chain p1 < p2 < p3
        ("p1", SP, "p2", "iri", ""),
        ("p2", SP, "p3", "iri", ""),
        # axioms: domain on the TOP of the chain, range on the middle
        ("p3", DOM, "C1", "iri", ""),
        ("p2", RAN, "C2", "iri", ""),
        # class taxonomy
        ("C1", SC, "C0", "iri", ""),
        ("C2", SC, "C0", "iri", ""),
        # instance data: one IRI-object use of the LEAF property, one
        # literal-object use of the middle property
        ("a", "p1", "b", "iri", ""),
        ("c", "p2", "hello", "literal", "en"),
    ]
    tbl = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "kind": [r[3] for r in rows],
            "lang": [r[4] for r in rows],
            "dtype": ["" for _ in rows],
        }
    )
    return rd.from_arrow(tbl), rows


def _as_set(res) -> set:
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    return set(map(tuple, df[["subj", "pred", "obj", "kind", "lang"]].values))


EXPECTED_INFERRED = {
    # rdfs5: subPropertyOf transitivity
    ("p1", SP, "p3", "iri", ""),
    # rdfs7: inherited statements (lang rides along on the literal)
    ("a", "p2", "b", "iri", ""),
    ("a", "p3", "b", "iri", ""),
    ("c", "p3", "hello", "literal", "en"),
    # rdfs2 via the INHERITED domain of p3 (applies to p1- and p2-uses)
    ("a", TY, "C1", "iri", ""),
    ("c", TY, "C1", "iri", ""),
    # rdfs3: range of p2 applies to the IRI object b (p1 < p2)...
    ("b", TY, "C2", "iri", ""),
    # ...but NOT to the literal 'hello' — no ('hello', TY, C2) row below
    # rdfs9 over the inferred types
    ("a", TY, "C0", "iri", ""),
    ("b", TY, "C0", "iri", ""),
    ("c", TY, "C0", "iri", ""),
}


def test_rdfs_materialize_exact(ray_session):
    ds, rows = _graph()
    got = _as_set(rdfs_materialize(ds))
    original = {(s, p, o, k, lg) for s, p, o, k, lg in rows}
    assert got == original | EXPECTED_INFERRED


def test_rdfs_join_fallback_equals_broadcast(ray_session):
    """sc_broadcast_max=0 forces the distributed rdfs9 bucket_join path;
    output must be identical to the fused broadcast path."""
    ds, _ = _graph()
    a = _as_set(rdfs_materialize(ds))
    b = _as_set(rdfs_materialize(ds, sc_broadcast_max=0))
    assert a == b


def test_rdfs_no_schema_is_identity(ray_session):
    """A graph with no RDFS axioms materializes to exactly itself."""
    tbl = pa.table(
        {
            "subj": ["x", "y"],
            "pred": ["q", "q"],
            "obj": ["y", "z"],
            "kind": ["iri", "iri"],
            "lang": ["", ""],
            "dtype": ["", ""],
        }
    )
    ds = rd.from_arrow(tbl)
    got = _as_set(rdfs_materialize(ds))
    assert got == {("x", "q", "y", "iri", ""), ("y", "q", "z", "iri", "")}


def test_owl_horst_exact(ray_session):
    """OWL-Horst-lite: inverse cross-typing, symmetric-with-super,
    transitive closure over sub-uses with super propagation."""
    from tabular_data_semantics_py_ray.constants import (
        OWL_INVERSEOF,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
    )
    from tabular_data_semantics_py_ray.pipelines.kg_ingest import (
        owl_horst_materialize,
    )

    INV = OWL_INVERSEOF
    rows = [
        ("p", INV, "q", "iri", ""),
        ("p", DOM, "D", "iri", ""),
        ("p", RAN, "R", "iri", ""),
        ("s0", TY, OWL_SYMMETRIC, "iri", ""),
        ("s0", SP, "r0", "iri", ""),
        ("t", TY, OWL_TRANSITIVE, "iri", ""),
        ("t", SP, "tsup", "iri", ""),
        ("tsub", SP, "t", "iri", ""),
        ("a", "p", "b", "iri", ""),
        ("x", "q", "y", "iri", ""),
        ("m", "s0", "n", "iri", ""),
        ("c1", "tsub", "c2", "iri", ""),
        ("c2", "t", "c3", "iri", ""),
    ]
    tbl = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "kind": [r[3] for r in rows],
            "lang": [r[4] for r in rows],
            "dtype": ["" for _ in rows],
        }
    )
    got = _as_set(owl_horst_materialize(rd.from_arrow(tbl)))
    inferred = {
        # rdfp8: inverse both ways, with cross-typing from p's domain/range
        ("b", "q", "a", "iri", ""),
        ("a", TY, "D", "iri", ""),
        ("b", TY, "R", "iri", ""),
        ("y", "p", "x", "iri", ""),
        ("y", TY, "D", "iri", ""),
        ("x", TY, "R", "iri", ""),
        # rdfp3: symmetric + its superproperty (both directions)
        ("m", "r0", "n", "iri", ""),
        ("n", "s0", "m", "iri", ""),
        ("n", "r0", "m", "iri", ""),
        # rdfs7 over the transitive family
        ("c1", "t", "c2", "iri", ""),
        ("c1", "tsup", "c2", "iri", ""),
        ("c2", "tsup", "c3", "iri", ""),
        # rdfp4: closure pair, propagated to the non-transitive super
        ("c1", "t", "c3", "iri", ""),
        ("c1", "tsup", "c3", "iri", ""),
        # subPropertyOf transitivity as axiom rows
        ("tsub", SP, "tsup", "iri", ""),
    }
    assert got == {(s, p, o, k, lg) for s, p, o, k, lg in rows} | inferred
