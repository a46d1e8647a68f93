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


def test_projection_distinct_and_sorted():
    t = project_ontology()
    rows = list(zip(t.column("subj").to_pylist(), t.column("pred").to_pylist(),
                    t.column("obj").to_pylist(), t.column("axiom").to_pylist()))
    assert rows == sorted(set(rows))
