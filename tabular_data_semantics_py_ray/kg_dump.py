"""Deterministic N-Triples dump of a synthetic knowledge graph.

The reference's first mile is a real KG file: ``ontology/onto_access.py:42-98``
loads ``dbpedia.owl`` / ``schema.org.owl`` with owlready2 and the annotation
registry (``ontology/annotations.py:14-103``) names the ~40 label/synonym
predicates that feed its lexical index
(``ontology/ontology_projection.py:1420-1470``). This module produces the
equivalent ingestion INPUT for this engine, fully deterministically and from
public vocabulary only: an RDF dump in N-Triples syntax containing

- the complete fixture KG (``fixture_kg``) serialized with the standard
  predicates — labels via skos:prefLabel / skos:altLabel / rdfs:label,
  types via rdf:type, taxonomy via rdfs:subClassOf, redirects via a
  dbo:wikiPageRedirects analogue, owl:sameAs, owl:equivalentClass — so a
  parse + derive round-trip must reproduce the four backend tables the
  whole engine runs on, and
- a deterministic ~1 MB "noise" portion in separate namespaces that
  exercises real-dump conditions: shared surface forms (rank > 1),
  non-English labels (filtered), multi-parent class DAGs (closure dedup),
  redirect chains, literal escapes (\\" \\n \\t \\\\ \\uXXXX), datatyped
  literals, blank nodes, comments, blank lines and irregular whitespace.

Everything is emitted twice from the SAME Python triple list — as N-Triples
text for the Ray parser and as SQL VALUES for the DuckDB oracle — so the
two sides can only diverge on computation, never on content.
"""

from __future__ import annotations

from functools import lru_cache

from . import fixture_kg
from .constants import (
    ONT,
    OWL_INVERSEOF,
    OWL_SAMEAS,
    OWL_SYMMETRIC,
    OWL_TRANSITIVE,
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_LABEL,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
)

# --- public vocabulary (W3C standard namespaces) ---------------------------
SKOS_PREF = "http://www.w3.org/2004/02/skos/core#prefLabel"
SKOS_ALT = "http://www.w3.org/2004/02/skos/core#altLabel"
OWL_EQUIV_CLASS = "http://www.w3.org/2002/07/owl#equivalentClass"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"

# dbo:wikiPageRedirects analogue (kg/entity.py wikiPage* family); lives in
# the fixture ontology namespace like the reference's dbo predicates.
REDIRECT_PRED = ONT + "wikiPageRedirects"

# Predicates whose ENGLISH literal objects feed the lexical index —
# the local analogue of annotations.py:14-103's preferred/alternative split.
# These are what THIS dump writes; the ingest side ACCEPTS the reference's
# full annotation registry below by default.
PREF_LABEL_PREDS = (SKOS_PREF, RDFS_LABEL)
ALT_LABEL_PREDS = (SKOS_ALT,)
LABEL_PREDS = PREF_LABEL_PREDS + ALT_LABEL_PREDS

# The reference's annotation-predicate registry
# (ontology/annotations.py:29-94): ``mainLabelURIs`` = preferred terms,
# ``synonymLabelURIs`` = accepted synonyms / alternatives. All are public
# W3C / OBO / bio-ontology vocabulary IRIs used as string constants — the
# default label registry for derive_lexicon (parameterizable per KG).
ANNOTATION_PREF_PREDS = (
    RDFS_LABEL,
    SKOS_PREF,
    "http://purl.obolibrary.org/obo/IAO_0000111",   # editor preferred term
    "http://purl.obolibrary.org/obo/IAO_0000589",   # OBO foundry unique label
)
ANNOTATION_ALT_PREDS = (
    SKOS_ALT,
    "http://www.geneontology.org/formats/oboInOwl#hasRelatedSynonym",
    "http://www.geneontology.org/formats/oboInOwl#hasExactSynonym",
    "http://www.geneontology.org/formats/oboInOWL#hasExactSynonym",
    "http://purl.bioontology.org/ontology/SYN#synonym",
    "http://scai.fraunhofer.de/CSEO#Synonym",
    "http://purl.obolibrary.org/obo/synonym",
    "http://ncicb.nci.nih.gov/xml/owl/EVS/Thesaurus.owl#FULL_SYN",
    "http://www.ebi.ac.uk/efo/alternative_term",
    "http://ncicb.nci.nih.gov/xml/owl/EVS/Thesaurus.owl#Synonym",
    "http://bioontology.org/projects/ontologies/fma/"
    "fmaOwlDlComponent_2_0#Synonym",
    "http://www.geneontology.org/formats/oboInOwl#hasDefinition",
    "http://bioontology.org/projects/ontologies/birnlex#preferred_label",
    "http://bioontology.org/projects/ontologies/birnlex#synonyms",
    "https://cfpub.epa.gov/ecotox#latinName",
    "https://cfpub.epa.gov/ecotox#commonName",
    "https://www.ncbi.nlm.nih.gov/taxonomy#scientific_name",
    "https://www.ncbi.nlm.nih.gov/taxonomy#synonym",
    "https://www.ncbi.nlm.nih.gov/taxonomy#equivalent_name",
    "https://www.ncbi.nlm.nih.gov/taxonomy#genbank_synonym",
    "https://www.ncbi.nlm.nih.gov/taxonomy#common_name",
    "http://purl.obolibrary.org/obo/IAO_0000118",   # alternative term
)
ANNOTATION_LABEL_PREDS = ANNOTATION_PREF_PREDS + ANNOTATION_ALT_PREDS

# Noise namespaces — disjoint from the fixture's so tests can split the
# ingested tables back into "fixture portion" vs "noise portion" by prefix.
NENT = "http://example.org/noise/"
NONT = "http://example.org/noise-ontology/"

N_NOISE_ENTITIES = 3000
N_NOISE_CLASSES = 40
N_NOISE_PROPS = 12

# Triple tuple: (subj, pred, obj, obj_kind, lang, dtype)
#   obj_kind in {'iri', 'literal', 'bnode'}; lang/dtype are '' when absent.
Triple = tuple[str, str, str, str, str, str]


def _iri(s: str, p: str, o: str) -> Triple:
    return (s, p, o, "iri", "", "")


def _lit(s: str, p: str, o: str, lang: str = "", dtype: str = "") -> Triple:
    return (s, p, o, "literal", lang, dtype)


def fixture_triples() -> list[Triple]:
    """The fixture KG as logical triples. Rank encoding contract: rank 1 ->
    skos:prefLabel, rank >= 2 -> skos:altLabel; re-ingestion derives rank =
    row_number over (surface_form ORDER BY is_alt, entity_uri), which
    round-trips exactly because the fixture has at most one pref and one alt
    per surface form (pref-before-alt mirrors the lookup relevance order the
    reference gets from its service, kg/lookup.py:212-219)."""
    out: list[Triple] = []
    for surface, ent, rank in fixture_kg.LEXICON:
        pred = SKOS_PREF if rank == 1 else SKOS_ALT
        out.append(_lit(ent, pred, surface, "en"))
    for ent, types in fixture_kg.ENTITY_TYPES.items():
        for t in types:
            out.append(_iri(ent, RDF_TYPE, ONT + t))
    for a, b, kind in fixture_kg.ALIAS_EDGES:
        pred = REDIRECT_PRED if kind == "redirect" else OWL_SAMEAS
        out.append(_iri(a, pred, b))
    for child, parent in sorted(fixture_kg.CLASS_PARENT.items()):
        out.append(_iri(ONT + child, RDFS_SUBCLASSOF, ONT + parent))
        out.append(_iri(ONT + child, RDF_TYPE, OWL_CLASS))
    for a, b in fixture_kg.CLASS_EQUIV:
        out.append(_iri(ONT + a, OWL_EQUIV_CLASS, ONT + b))
    return out


def noise_triples() -> list[Triple]:
    """~1 MB of deterministic noise (index arithmetic, no RNG): shared
    surface forms, filtered languages, DAG taxonomy, redirect chains,
    datatyped / escaped literals, blank nodes."""
    out: list[Triple] = []

    # --- class DAG: tree of fan-out 3 plus extra multi-parent edges -------
    for i in range(N_NOISE_CLASSES):
        cls = f"{NONT}NClass_{i:02d}"
        out.append(_iri(cls, RDF_TYPE, OWL_CLASS))
        if i == 0:
            out.append(_iri(cls, RDFS_SUBCLASSOF, ONT + "Thing"))
        else:
            out.append(_iri(cls, RDFS_SUBCLASSOF, f"{NONT}NClass_{(i - 1) // 3:02d}"))
            # second parent on some classes -> multiple paths to shared
            # ancestors (the frontier must min-distance-distinct, not
            # enumerate paths)
            if i % 5 == 2 and (i - 1) // 3 != max(0, i - 7):
                out.append(
                    _iri(cls, RDFS_SUBCLASSOF, f"{NONT}NClass_{max(0, i - 7):02d}")
                )
        out.append(_lit(cls, RDFS_LABEL, f"noise class {i:02d}", "en"))

    # equivalence axioms (for the equivalence-merged closure): a 3-class
    # component where only one member holds a taxonomy position, with the
    # second axiom declared in the REVERSED direction (symmetry must not
    # matter), and a merge of two mid-taxonomy nodes (their ancestor sets
    # must union in the merged closure)
    out.append(_iri(f"{NONT}NEq_B", RDFS_SUBCLASSOF, f"{NONT}NClass_02"))
    out.append(_iri(f"{NONT}NEq_A", OWL_EQUIV_CLASS, f"{NONT}NEq_B"))
    out.append(_iri(f"{NONT}NEq_C", OWL_EQUIV_CLASS, f"{NONT}NEq_B"))
    out.append(_iri(f"{NONT}NClass_33", OWL_EQUIV_CLASS, f"{NONT}NClass_17"))

    # --- entities ----------------------------------------------------------
    for i in range(N_NOISE_ENTITIES):
        ent = f"{NENT}Noise_{i:05d}"
        out.append(_iri(ent, RDF_TYPE, f"{NONT}NClass_{i % N_NOISE_CLASSES:02d}"))
        if i % 11 == 0:
            out.append(
                _iri(ent, RDF_TYPE, f"{NONT}NClass_{(i * 7) % N_NOISE_CLASSES:02d}")
            )
        out.append(_lit(ent, SKOS_PREF, f"noiseterm{i:05d}", "en"))
        if i % 13 == 0:
            # ~97 shared surface forms, each claimed by ~2-3 entities via
            # altLabel -> ranks 1..k ordered by entity_uri
            out.append(_lit(ent, SKOS_ALT, f"sharedterm{(i // 13) % 97:03d}", "en"))
        if i % 17 == 0:  # non-English: must NOT reach the lexicon
            out.append(_lit(ent, RDFS_LABEL, f"bruit num\u00e9ro {i}", "fr"))
        if i % 23 == 0:  # duplicate pref via rdfs:label: dedup to one row
            out.append(_lit(ent, RDFS_LABEL, f"noiseterm{i:05d}", "en"))
        if i % 19 == 0 and i + 1 < N_NOISE_ENTITIES:
            out.append(_iri(ent, REDIRECT_PRED, f"{NENT}Noise_{i + 1:05d}"))
        if i % 29 == 0:
            out.append(_iri(ent, OWL_SAMEAS, f"http://kg2.example.org/entity/N{i}"))
        if i % 31 == 0:  # escaped-literal gauntlet (non-label predicate)
            out.append(
                _lit(
                    ent,
                    ONT + "comment",
                    f'entity #{i} said "hi"\n\tpath c:\\tmp caf\u00e9 \u2603',
                    "en",
                )
            )
        if i % 37 == 0:
            out.append(_lit(ent, ONT + "rank", str(i), dtype=XSD_INT))
        if i % 41 == 0:
            out.append(_lit(ent, ONT + "score", f"{i}.25", dtype=XSD_DOUBLE))

    # explicit 2-hop redirect chain (the reference's 2-iteration closure)
    out.append(_iri(f"{NENT}ChainA", REDIRECT_PRED, f"{NENT}ChainB"))
    out.append(_iri(f"{NENT}ChainB", REDIRECT_PRED, f"{NENT}ChainC"))

    # --- property schema (RDFS materialization exercise) -------------------
    # Binary subPropertyOf tree of depth 3 (NProp_k under NProp_{(k-1)//2}),
    # domain/range axioms on interior AND leaf properties, and instance
    # triples using only the DEEP properties — so rdfs7 inheritance, rdfs2/3
    # through INHERITED domains/ranges, and rdfs9 over the inferred types
    # all fire on real rows. Literal objects exercise range-not-applied.
    for k in range(N_NOISE_PROPS):
        p = f"{NONT}NProp_{k:02d}"
        if k > 0:
            out.append(_iri(p, RDFS_SUBPROPERTYOF, f"{NONT}NProp_{(k - 1) // 2:02d}"))
        if k % 3 == 0:
            out.append(_iri(p, RDFS_DOMAIN, f"{NONT}NClass_{k % N_NOISE_CLASSES:02d}"))
        if k % 4 == 1:
            out.append(
                _iri(p, RDFS_RANGE, f"{NONT}NClass_{(k * 3) % N_NOISE_CLASSES:02d}")
            )
        out.append(_lit(p, RDFS_LABEL, f"noise property {k:02d}", "en"))
    for i in range(0, N_NOISE_ENTITIES, 7):
        k = 5 + (i // 7) % (N_NOISE_PROPS - 5)
        p = f"{NONT}NProp_{k:02d}"
        subj = f"{NENT}Noise_{i:05d}"
        if i % 3 == 0:
            out.append(_lit(subj, p, f"prop value {i}", "en"))
        else:
            out.append(_iri(subj, p, f"{NENT}Noise_{(i * 13 + 1) % N_NOISE_ENTITIES:05d}"))

    # --- OWL-Horst property axioms (inverse / symmetric / transitive) ------
    # inverse pair with domain+range on ONE side (cross-typing must reach
    # the other side's endpoints through the inverse map)
    p_inv_a, p_inv_b = f"{NONT}NProp_invHas", f"{NONT}NProp_invOf"
    out.append(_iri(p_inv_a, OWL_INVERSEOF, p_inv_b))
    out.append(_iri(p_inv_a, RDFS_DOMAIN, f"{NONT}NClass_05"))
    out.append(_iri(p_inv_a, RDFS_RANGE, f"{NONT}NClass_06"))
    # symmetric property that is also a subproperty (reversed copies must
    # inherit upward too)
    p_sym = f"{NONT}NProp_sym"
    out.append(_iri(p_sym, RDF_TYPE, OWL_SYMMETRIC))
    out.append(_iri(p_sym, RDFS_SUBPROPERTYOF, f"{NONT}NProp_00"))
    # transitive property with a NON-transitive super and a feeding
    # subproperty (closure edges must include sub-uses; closure pairs must
    # propagate to the super)
    p_trn = f"{NONT}NProp_trans"
    out.append(_iri(p_trn, RDF_TYPE, OWL_TRANSITIVE))
    out.append(_iri(p_trn, RDFS_SUBPROPERTYOF, f"{NONT}NProp_transSup"))
    out.append(_iri(f"{NONT}NProp_transSub", RDFS_SUBPROPERTYOF, p_trn))
    for i in range(60):  # ten 5-edge chains, alternating direct/sub uses
        if i % 6 != 5:
            pred = p_trn if i % 2 == 0 else f"{NONT}NProp_transSub"
            out.append(_iri(f"{NENT}Noise_{i:05d}", pred, f"{NENT}Noise_{i + 1:05d}"))
    for i in range(0, N_NOISE_ENTITIES, 97):
        out.append(
            _iri(f"{NENT}Noise_{i:05d}", p_inv_a,
                 f"{NENT}Noise_{(i + 3) % N_NOISE_ENTITIES:05d}")
        )
        out.append(
            _iri(f"{NENT}Noise_{(i * 7) % N_NOISE_ENTITIES:05d}", p_sym,
                 f"{NENT}Noise_{(i * 7 + 11) % N_NOISE_ENTITIES:05d}")
        )

    # blank nodes as subject and object
    out.append(_iri("_:bn0", RDF_TYPE, f"{NONT}NClass_00"))
    out.append(_lit("_:bn0", RDFS_LABEL, "anonymous thing", "en"))
    out.append(_iri(f"{NENT}Noise_00000", ONT + "linkedVia", "_:bn0"))
    return out


@lru_cache(maxsize=1)
def all_triples() -> tuple[Triple, ...]:
    return tuple(fixture_triples() + noise_triples())


# --------------------------------------------------------------------------
# Annotation-registry gauntlet dump: a small OBO-style KG whose labels use
# the reference's WIDER annotation vocabulary (IAO preferred terms,
# oboInOwl exact synonyms, NCI FULL_SYN, NCBI scientific names) — exercising
# derive_lexicon's default registry beyond the skos/rdfs trio the main dump
# writes. IAO_0000115 definitions are in the reference's *lexical* list but
# NOT main/synonym, so they must NOT reach the lexicon (negative case).
# --------------------------------------------------------------------------
ABO = "http://example.org/obo-like/"
_IAO_PREF = "http://purl.obolibrary.org/obo/IAO_0000111"
_OBO_EXACT = "http://www.geneontology.org/formats/oboInOwl#hasExactSynonym"
_NCI_FULLSYN = "http://ncicb.nci.nih.gov/xml/owl/EVS/Thesaurus.owl#FULL_SYN"
_NCBI_SCI = "https://www.ncbi.nlm.nih.gov/taxonomy#scientific_name"
_IAO_DEF = "http://purl.obolibrary.org/obo/IAO_0000115"


@lru_cache(maxsize=1)
def annotation_triples() -> tuple[Triple, ...]:
    out: list[Triple] = []
    for i in range(40):
        e = f"{ABO}Term_{i:03d}"
        out.append(_lit(e, _IAO_PREF, f"oboterm {i:03d}", "en"))
        if i % 2 == 0:
            out.append(_lit(e, _OBO_EXACT, f"obosyn {i:03d}", "en"))
        if i % 3 == 0:  # shared surface claimed by several entities (alt)
            out.append(_lit(e, _NCI_FULLSYN, f"shared obo name {(i // 3) % 5}", "en"))
        if i % 5 == 0:
            out.append(_lit(e, SKOS_ALT, f"oboalt {i:03d}", "en"))
        if i % 7 == 0:  # non-English: filtered
            out.append(_lit(e, _IAO_PREF, f"terme obo {i}", "fr"))
        if i % 4 == 0:  # lexical-but-not-label predicate: filtered
            out.append(_lit(e, _IAO_DEF, f"definition of term {i}", "en"))
        if i % 11 == 0:  # untagged lang counts as English
            out.append(_lit(e, _NCBI_SCI, f"Sci Name {i:03d}"))
    for k in range(5):  # pref label on the shared surfaces -> rank 1
        out.append(_lit(f"{ABO}Pref_{k}", _IAO_PREF, f"shared obo name {k}", "en"))
    return tuple(out)


@lru_cache(maxsize=1)
def annotations_dump_path() -> str:
    """N-Triples file of annotation_triples(), staged content-addressed."""
    import hashlib
    import os

    text = to_ntriples(annotation_triples(), quirks=True)
    digest = hashlib.md5(text.encode("utf-8")).hexdigest()[:16]
    path = f"/tmp/tds_kg_annot_{digest}.nt"
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, path)
    return path


def annotation_triples_values_sql() -> str:
    """``atrip(subj, pred, obj, kind, lang)`` VALUES body."""
    return ",\n    ".join(
        f"({_q(s)}, {_q(p)}, {_q(o)}, {_q(k)}, {_q(lng)})"
        for s, p, o, k, lng, _ in annotation_triples()
    )


# --------------------------------------------------------------------------
# N-Triples serialization (RDF 1.1 N-Triples grammar).
# --------------------------------------------------------------------------
def _escape_literal(s: str, ascii_only: bool) -> str:
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == '"':
            out.append('\\"')
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ord(ch) > 127 and ascii_only:
            out.append(f"\\u{ord(ch):04X}")
        else:
            out.append(ch)
    return "".join(out)


def _term(value: str, kind: str, lang: str, dtype: str, ascii_only: bool) -> str:
    if kind == "iri":
        return f"<{value}>"
    if kind == "bnode":
        return value
    lit = f'"{_escape_literal(value, ascii_only)}"'
    if lang:
        lit += f"@{lang}"
    elif dtype:
        lit += f"^^<{dtype}>"
    return lit


def to_ntriples(triples, *, quirks: bool = True) -> str:
    """Serialize to N-Triples text. With ``quirks`` (default), inject the
    legal syntax variation a real dump carries: comment lines, blank lines,
    tab separators, trailing spaces, and alternating \\uXXXX vs raw UTF-8
    encodings of non-ASCII characters (deterministic by line index)."""
    lines: list[str] = []
    if quirks:
        lines.append("# synthetic KG dump (deterministic) - N-Triples")
        lines.append("")
    for i, (s, p, o, kind, lang, dtype) in enumerate(triples):
        ascii_only = quirks and i % 2 == 0
        sep = "\t" if quirks and i % 97 == 13 else " "
        skind = "bnode" if s.startswith("_:") else "iri"
        line = sep.join(
            [
                _term(s, skind, "", "", ascii_only),
                _term(p, "iri", "", "", ascii_only),
                _term(o, kind, lang, dtype, ascii_only),
            ]
        )
        line += " ." + ("  " if quirks and i % 89 == 7 else "")
        lines.append(line)
        if quirks and i % 500 == 499:
            lines.append(f"# checkpoint after {i + 1} triples")
            lines.append("")
    return "\n".join(lines) + "\n"


def write_dump(path: str, *, quirks: bool = True) -> str:
    text = to_ntriples(all_triples(), quirks=quirks)
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
    return path


@lru_cache(maxsize=1)
def dump_path() -> str:
    """Path of the dump file: the checked-in copy
    (``data/kg_dump.nt``, guarded against generator drift by
    tests/test_kg_ingest.py) when present, else staged once per process
    under /tmp, content-addressed so concurrent sessions converge."""
    import hashlib
    import os

    repo_copy = os.path.join(os.path.dirname(__file__), "data", "kg_dump.nt")
    if os.path.exists(repo_copy):
        return repo_copy
    text = to_ntriples(all_triples(), quirks=True)
    digest = hashlib.md5(text.encode("utf-8")).hexdigest()[:16]
    path = f"/tmp/tds_kg_dump_{digest}.nt"
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, path)  # atomic: concurrent writers converge
    return path


# --------------------------------------------------------------------------
# RDF/XML serialization — the SAME logical triples as the N-Triples dump,
# in the format the reference's ontologies actually ship in
# (TabularSemantics/ontologies/*.owl, loaded at ontology/onto_access.py:
# 42-98). A parse of this file and a parse of the .nt dump must yield the
# identical triple set, which is exactly what tests/test_kg_ingest.py
# asserts. The serializer deliberately alternates RDF/XML idioms (typed
# node elements vs rdf:Description, rdf:resource vs nested node elements)
# by deterministic index so the reader's breadth is exercised by the
# round-trip, not just by hand-written snippets.
# --------------------------------------------------------------------------
import re as _re

_NCNAME = _re.compile(r"[A-Za-z_][A-Za-z0-9_.\-]*$")
_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _split_uri(uri: str):
    """(namespace, local) split usable as an XML element name, or None."""
    for i in range(len(uri) - 1, -1, -1):
        if uri[i] in "#/":
            local = uri[i + 1:]
            if local and _NCNAME.match(local):
                return uri[: i + 1], local
            return None
    return None


def _xesc_text(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace("\r", "&#13;"))


def _xesc_attr(s: str) -> str:
    return (_xesc_text(s).replace('"', "&quot;")
            .replace("\n", "&#10;").replace("\t", "&#9;"))


def to_rdfxml(triples) -> str:
    """Serialize logical triples to RDF/XML. Requires every predicate (and
    every class used as a typed node element) to QName-split; all fixture
    and noise vocabulary does."""
    groups: dict[str, list] = {}
    order: list[str] = []
    for t in triples:
        if t[0] not in groups:
            groups[t[0]] = []
            order.append(t[0])
        groups[t[0]].append(t)

    namespaces: dict[str, str] = {_RDF_NS: "rdf"}

    def prefix_of(ns: str) -> str:
        if ns not in namespaces:
            namespaces[ns] = f"ns{len(namespaces)}"
        return namespaces[ns]

    body: list[str] = []
    for si, subj in enumerate(order):
        rows = groups[subj]
        # typed node element for every other subject that has an IRI type
        type_i = next(
            (i for i, r in enumerate(rows)
             if r[1] == RDF_TYPE and r[3] == "iri" and _split_uri(r[2])),
            None,
        )
        if si % 2 == 0 and type_i is not None:
            ns, local = _split_uri(rows[type_i][2])
            el = f"{prefix_of(ns)}:{local}"
            rows = rows[:type_i] + rows[type_i + 1:]
        else:
            el = "rdf:Description"
        sattr = (f'rdf:nodeID="{subj[2:]}"' if subj.startswith("_:")
                 else f'rdf:about="{_xesc_attr(subj)}"')
        body.append(f"  <{el} {sattr}>")
        for pi, (s, p, o, kind, lang, dtype) in enumerate(rows):
            pns, plocal = _split_uri(p) or (None, None)
            if pns is None:
                raise ValueError(f"predicate not QName-splittable: {p}")
            pel = f"{prefix_of(pns)}:{plocal}"
            if kind == "iri":
                if pi % 5 == 3:  # nested node element object
                    body.append(f"    <{pel}>")
                    body.append(
                        f'      <rdf:Description rdf:about="{_xesc_attr(o)}"/>')
                    body.append(f"    </{pel}>")
                else:
                    body.append(f'    <{pel} rdf:resource="{_xesc_attr(o)}"/>')
            elif kind == "bnode":
                body.append(f'    <{pel} rdf:nodeID="{o[2:]}"/>')
            else:
                attrs = ""
                if lang:
                    attrs = f' xml:lang="{lang}"'
                elif dtype:
                    attrs = f' rdf:datatype="{_xesc_attr(dtype)}"'
                body.append(f"    <{pel}{attrs}>{_xesc_text(o)}</{pel}>")
        body.append(f"  </{el}>")

    decls = "".join(
        f'\n    xmlns:{pfx}="{_xesc_attr(ns)}"'
        for ns, pfx in sorted(namespaces.items(), key=lambda kv: kv[1])
    )
    return (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        f"<rdf:RDF{decls}>\n" + "\n".join(body) + "\n</rdf:RDF>\n"
    )


@lru_cache(maxsize=1)
def rdfxml_dump_path() -> str:
    """Path of the RDF/XML dump: the checked-in copy
    (``data/kg_dump.owl``, drift-guarded by tests/test_kg_ingest.py) when
    present, else staged once per process under /tmp, content-addressed."""
    import hashlib
    import os

    repo_copy = os.path.join(os.path.dirname(__file__), "data", "kg_dump.owl")
    if os.path.exists(repo_copy):
        return repo_copy
    text = to_rdfxml(all_triples())
    digest = hashlib.md5(text.encode("utf-8")).hexdigest()[:16]
    path = f"/tmp/tds_kg_dump_{digest}.owl"
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, path)
    return path


# --------------------------------------------------------------------------
# SQL VALUES emitters (oracle side) — same logical triples.
# --------------------------------------------------------------------------
def _q(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def triples_values_sql() -> str:
    """``trip(subj, pred, obj, kind, lang)`` VALUES body for ALL dump
    triples (dtype dropped: no derivation uses it; the parser still has to
    parse it off the literals)."""
    return ",\n    ".join(
        f"({_q(s)}, {_q(p)}, {_q(o)}, {_q(k)}, {_q(lng)})"
        for s, p, o, k, lng, _ in all_triples()
    )
