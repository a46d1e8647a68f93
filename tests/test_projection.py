"""A10 ontology-projection rule tests (ontology_projection.py:301-662
parity properties over the fixture axioms)."""

from __future__ import annotations

from tabular_data_semantics_py_ray.constants import (
    ONT,
    OWL_SAMEAS,
    RDF_TYPE,
    RDFS_SUBCLASSOF,
)
from tabular_data_semantics_py_ray import fixture_kg
from tabular_data_semantics_py_ray.pipelines.prep import project_ontology


def _rows():
    t = project_ontology()
    return set(zip(t.column("subj").to_pylist(), t.column("pred").to_pylist(),
                   t.column("obj").to_pylist(), t.column("axiom").to_pylist()))


ROWS = _rows()
C = fixture_kg._c
E = fixture_kg._e


def test_every_taxonomy_edge_projected():
    for child, parent in fixture_kg.CLASS_PARENT.items():
        assert (C(child), RDFS_SUBCLASSOF, C(parent), "subclassof") in ROWS


def test_equivalence_projects_two_subsumptions():
    for a, b in fixture_kg.CLASS_EQUIV:
        assert (C(a), RDFS_SUBCLASSOF, C(b), "equiv") in ROWS
        assert (C(b), RDFS_SUBCLASSOF, C(a), "equiv") in ROWS


def test_sameas_both_directions():
    assert (E("Agg_Op"), OWL_SAMEAS, E("Aggregate_Op"), "sameas") in ROWS
    assert (E("Aggregate_Op"), OWL_SAMEAS, E("Agg_Op"), "sameas") in ROWS


def test_domain_range_and_restriction_triples():
    assert (C("Process"), C("usesOp"), C("DBOperation"), "domain_range") in ROWS
    assert (C("Customer"), C("places"), C("Commerce"), "restriction") in ROWS


def test_inverse_propagation_covers_assertions_and_schema():
    # schema-level: range usedBy domain
    assert (C("DBOperation"), C("usedBy"), C("Process"), "inverse") in ROWS
    # assertion-level: (Stream_Proc usesOp Join_Op) -> (Join_Op usedBy Stream_Proc)
    assert (E("Join_Op"), C("usedBy"), E("Stream_Proc"), "inverse") in ROWS


def test_property_equivalence_propagation():
    assert (C("DBOperation"), C("executesOn"), C("Framework"),
            "prop_equiv") in ROWS
    assert (E("Join_Op"), C("executesOn"), E("Query_Op"), "prop_equiv") in ROWS


def test_rdf_type_assertions_projected():
    assert (E("Customer"), RDF_TYPE, ONT + "Customer", "type") in ROWS


def test_data_property_rules():
    # 12c: data role assertions carried through with their literal objects
    assert (E("Join_Op"), C("opLabel"), "hash join", "data_assertion") in ROWS
    assert (E("Join_Op"), C("opCost"), "42", "data_assertion") in ROWS
    # 12d: data-property equivalence propagates over assertions
    assert (E("Sort_Op"), C("caption"), "merge sort", "data_prop_equiv") in ROWS
    # opCost has no equivalent property -> no propagated row
    assert not any(r for r in ROWS if r[2] == "42" and r[3] == "data_prop_equiv")
    # 12b: data restriction projects ONLY the domain subsumption, no triple
    assert (C("CostedOperation"), RDFS_SUBCLASSOF, C("DBOperation"),
            "data_restriction_domain") in ROWS
    assert not any(r for r in ROWS if r[0] == C("CostedOperation")
                   and r[1] == C("opCost"))


def test_abox_domain_range_propagation():
    """ontology_projection.py:706-719: (s, p, o) assertions type s with
    domain(p) and o with range(p); data assertions type the subject with
    domain(dp) only (the range attempt raises on a literal, :718-720)."""
    # (Stream_Proc usesOp Join_Op), usesOp: Process x DBOperation
    assert (E("Stream_Proc"), RDF_TYPE, C("Process"), "abox_domain") in ROWS
    assert (E("Join_Op"), RDF_TYPE, C("DBOperation"), "abox_range") in ROWS
    # (Join_Op opCost "42"), domain(opCost) = DBOperation — domain only
    assert (E("Join_Op"), RDF_TYPE, C("DBOperation"), "abox_domain") in ROWS
    assert not any(r for r in ROWS if r[3] == "abox_range"
                   and not r[2].startswith("http"))


def test_complex_axiom_rules():
    # atomic member of the intersection -> subsumption
    assert (C("StreamProcess"), RDFS_SUBCLASSOF, C("Process"),
            "complex_member") in ROWS
    # restriction member -> (C, R, D) triple + domain propagation
    assert (C("StreamProcess"), C("usesOp"), C("RowStruct"),
            "complex_restriction") in ROWS
    assert (C("StreamProcess"), RDFS_SUBCLASSOF, C("Process"),
            "complex_domain") in ROWS
    # single atomic target -> range propagation; inverse of usesOp reversed
    assert (C("RowStruct"), RDFS_SUBCLASSOF, C("DBOperation"),
            "complex_range") in ROWS
    assert (C("RowStruct"), C("usedBy"), C("StreamProcess"),
            "complex_inverse") in ROWS
    # union target: one triple per atomic, NO range propagation
    assert (C("DistributedOp"), C("runsOn"), C("Framework"),
            "complex_restriction") in ROWS
    assert (C("DistributedOp"), C("runsOn"), C("Collection"),
            "complex_restriction") in ROWS
    assert not any(r for r in ROWS if r[3] == "complex_range"
                   and r[0] in (C("Framework"), C("Collection")))
    # domain of runsOn propagates to the equivalent class
    assert (C("DistributedOp"), RDFS_SUBCLASSOF, C("DBOperation"),
            "complex_domain") in ROWS
    # runsOn ~ executesOn equivalence propagates over the new triples
    assert (C("DistributedOp"), C("executesOn"), C("Framework"),
            "complex_prop_equiv") in ROWS


def test_projection_distinct_and_sorted():
    t = project_ontology()
    rows = list(zip(t.column("subj").to_pylist(), t.column("pred").to_pylist(),
                    t.column("obj").to_pylist(), t.column("axiom").to_pylist()))
    assert rows == sorted(set(rows))
