"""Offline prep (A10/A11, SURVEY §2.3): write the backend tables —
lexical index, entity types, alias edges, ancestor closure — as parquet
artifacts that scoring actors load at init.

In the reference this is the per-process OWL load + reasoner classification
(onto_access.py:42-98) and annotation indexing
(ontology_projection.py:1420-1470); here it is a one-shot job producing
columnar artifacts, run once per ontology release, never on the hot path.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .. import fixture_kg


def project_ontology() -> pa.Table:
    """A10 ontology projection: OWL-style axioms -> plain triple table
    (subj, pred, obj, axiom), mirroring the reference's projection rules
    (ontology/ontology_projection.py, file:line per rule):

    - direct subsumption triples (:328-336)
    - owl:equivalentClass -> TWO subsumption triples (:341-347)
    - rdf:type assertions (:379-389)
    - owl:sameAs in BOTH directions (:392-399)
    - per-object-property domain x range triples (:450-479)
    - existential restrictions C subClassOf (p some D) -> (C, p, D)
      (:483-508)
    - role assertions carried through (:511-514)
    - owl:inverseOf propagation: every projected (s, p, o) with an inverse
      q also yields (o, q, s) — applied to role assertions and
      domain-range triples (:519-526)
    - owl:equivalentProperty propagation: (s, p, o) -> (s, q, o)
      (:529-537)
    - ABox domain/range propagation (:706-719): every role assertion
      (s, p, o) also types s with domain(p) and o with range(p)
      (__propagateDomainAbox__ / __propagateRangeAbox__ under
      propagate_domain_range)
    - data-property rules (:557-607): data role assertions carried
      through (12c) with ABox DOMAIN propagation (the range attempt
      raises on the literal target and is swallowed, :718-720),
      data-property-equivalence propagation over them (12d), and
      domain-only propagation for data restrictions (12b — the
      restriction triple itself is NOT added, add_triple=False)
    - complex class expressions (:797-935): for C sub/equiv of an
      intersection/union, atomic members project as subsumptions; each
      restriction member (R some D) projects (C, R, D_i) per atomic
      target, C subClassOf domain(R) (skipping C == domain), D subClassOf
      range(R) only when the target is a single atomic class, plus the
      inverse and property-equivalence propagation of the (C, R, D_i)
      triples

    Offline one-shot job (SURVEY §2.3 A10): runs on the driver once per
    ontology release; never on the hot path. Deterministic: sorted,
    distinct output.
    """
    from ..constants import OWL_SAMEAS, RDF_TYPE, RDFS_SUBCLASSOF

    fk = fixture_kg
    c = fk._c
    rows: set[tuple[str, str, str, str]] = set()

    for child, parent in fk.CLASS_PARENT.items():
        rows.add((c(child), RDFS_SUBCLASSOF, c(parent), "subclassof"))
    for a, b in fk.CLASS_EQUIV:
        rows.add((c(a), RDFS_SUBCLASSOF, c(b), "equiv"))
        rows.add((c(b), RDFS_SUBCLASSOF, c(a), "equiv"))
    for e, ts in fk.ENTITY_TYPES.items():
        for t in ts:
            rows.add((e, RDF_TYPE, c(t), "type"))
    for a, b, kind in fk.ALIAS_EDGES:
        if kind == "sameas":
            rows.add((a, OWL_SAMEAS, b, "sameas"))
            rows.add((b, OWL_SAMEAS, a, "sameas"))
    inv = {c(p): c(q) for p, q in fk.PROP_INVERSES}
    peq = {c(p): c(q) for p, q in fk.PROP_EQUIV}
    for p, (d, r) in fk.PRED_SCHEMA.items():
        rows.add((d, p, r, "domain_range"))
        if p in inv:
            rows.add((r, inv[p], d, "inverse"))
        if p in peq:
            rows.add((d, peq[p], r, "prop_equiv"))
    for cc, p, dd in fk.RESTRICTIONS:
        rows.add((c(cc), c(p), c(dd), "restriction"))
    sch = {p: (d, r) for p, (d, r) in fk.PRED_SCHEMA.items()}
    for s, p, o in fk.STATEMENTS:
        rows.add((s, p, o, "assertion"))
        if p in inv:
            rows.add((o, inv[p], s, "inverse"))
        if p in peq:
            rows.add((s, peq[p], o, "prop_equiv"))
        # ABox domain/range propagation (ontology_projection.py:706-719 ->
        # __propagateDomainAbox__/__propagateRangeAbox__, active under
        # propagate_domain_range): the assertion types its subject with
        # domain(p) and its object with range(p)
        if p in sch:
            d_, r_ = sch[p]
            rows.add((s, RDF_TYPE, d_, "abox_domain"))
            rows.add((o, RDF_TYPE, r_, "abox_range"))

    # Data-property rules (ontology_projection.py:557-607)
    dpd = {c(p): c(d) for p, d in fk.DATA_PROP_DOMAIN.items()}
    dpeq = {c(p): c(q) for p, q in fk.DATA_PROP_EQUIV}
    for cc, p in fk.DATA_RESTRICTIONS:
        # 12b: domain-only propagation; the restriction triple is not added
        dom = dpd.get(c(p))
        if dom is not None and c(cc) != dom:
            rows.add((c(cc), RDFS_SUBCLASSOF, dom, "data_restriction_domain"))
    # 12c also propagates the ABox domain (__propagateDomainAbox__ under
    # propagate_domain_range): subject rdf:type domain(dp). The range
    # attempt raises on a literal target and is swallowed (:718-720), so
    # data assertions propagate DOMAIN ONLY.
    for s, p, lit in fk.DATA_STATEMENTS:
        rows.add((fk._e(s), c(p), lit, "data_assertion"))  # 12c
        if c(p) in dpeq:
            rows.add((fk._e(s), dpeq[c(p)], lit, "data_prop_equiv"))  # 12d
        dom = dpd.get(c(p))
        if dom is not None:
            rows.add((fk._e(s), RDF_TYPE, dom, "abox_domain"))

    # Complex class expressions (ontology_projection.py:797-935)
    schema = {p: (d, r) for p, (d, r) in fk.PRED_SCHEMA.items()}
    for cname, members in fk.COMPLEX_AXIOMS:
        cu = c(cname)
        for m in members:
            if m[0] == "cls":
                rows.add((cu, RDFS_SUBCLASSOF, c(m[1]), "complex_member"))
                continue
            _, pname, targets = m
            pu = c(pname)
            dom, rng = schema.get(pu, (None, None))
            if dom is not None and cu != dom:
                rows.add((cu, RDFS_SUBCLASSOF, dom, "complex_domain"))
            if len(targets) == 1 and rng is not None:
                tu = c(targets[0])
                if tu != rng:
                    rows.add((tu, RDFS_SUBCLASSOF, rng, "complex_range"))
            for t in targets:
                tu = c(t)
                rows.add((cu, pu, tu, "complex_restriction"))
                if pu in inv:
                    rows.add((tu, inv[pu], cu, "complex_inverse"))
                if pu in peq:
                    rows.add((cu, peq[pu], tu, "complex_prop_equiv"))

    ordered = sorted(rows)
    return pa.table({
        "subj": pa.array([r[0] for r in ordered], type=pa.string()),
        "pred": pa.array([r[1] for r in ordered], type=pa.string()),
        "obj": pa.array([r[2] for r in ordered], type=pa.string()),
        "axiom": pa.array([r[3] for r in ordered], type=pa.string()),
    })


def write_backend_artifacts(out_dir: str) -> dict[str, str]:
    """Project the (fixture) ontology + lexicon into parquet. Returns the
    artifact paths. Deterministic: same input -> byte-identical tables."""
    os.makedirs(out_dir, exist_ok=True)
    artifacts = {
        "lexical_index.parquet": fixture_kg.lexicon_df(),
        "entity_types.parquet": fixture_kg.entity_types_df(),
        "alias_edges.parquet": fixture_kg.alias_edges_df(),
        "class_closure.parquet": fixture_kg.class_closure_df(),
        "lookup_types.parquet": fixture_kg.lookup_types_df(),
        "statements.parquet": fixture_kg.statements_df(),
        "pred_schema.parquet": fixture_kg.pred_schema_df(),
    }
    out = {}
    for fname, df in artifacts.items():
        path = os.path.join(out_dir, fname)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
        out[fname] = path
    proj_path = os.path.join(out_dir, "ontology_projection.parquet")
    pq.write_table(project_ontology(), proj_path)
    out["ontology_projection.parquet"] = proj_path
    return out
