"""URI namespaces and registries for the fixture knowledge graph.

Plays the role of the reference's constant registries
(``kg/entity.py:37-74`` ``URI_KG.avoid_predicates`` / ``avoid_top_concepts``
in /root/reference/TabularSemantics/src/), re-expressed for a local,
deterministic KG so no remote lookup/SPARQL service is ever needed.
"""

from __future__ import annotations

# Namespaces (example.org: purely synthetic, deterministic fixture KG).
ENT = "http://example.org/resource/"  # entities   (~ dbpedia resource ns)
ONT = "http://example.org/ontology/"  # classes / properties (~ dbo ns)
DOC = "http://example.org/doc/"  # minted per-document subjects
TAB = "http://example.org/table/"  # minted per-table-row subjects (tabular2rdf)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_SUBCLASSOF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROPERTYOF = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
OWL_INVERSEOF = "http://www.w3.org/2002/07/owl#inverseOf"
OWL_SYMMETRIC = "http://www.w3.org/2002/07/owl#SymmetricProperty"
OWL_TRANSITIVE = "http://www.w3.org/2002/07/owl#TransitiveProperty"

# Predicate minted for "document mentions entity" triples.
MENTIONS_PRED = ONT + "mentions"

# ~ URI_KG.avoid_top_concepts (kg/entity.py:63-74): uninformative top
# concepts are never allowed to win a column/document type vote.
AVOID_TOP_CONCEPTS = frozenset({ONT + "Thing"})

# ~ dbo:Agent special-case removal (onto_access.py:352-354,
# challenge_utils.py:201-203): dropped inside most-specific-class reduction.
AGENT_CLASS = ONT + "Agent"

# ~ URI_KG.avoid_predicates (kg/entity.py:37-60): noisy predicates dropped
# from any emitted or joined triple stream.
AVOID_PREDICATES = frozenset(
    {
        ONT + "wikiPageWikiLink",
        ONT + "wikiPageExternalLink",
        ONT + "abstract",
        ONT + "comment",
        ONT + "seeAlso",
        ONT + "hypernym",
    }
)

# Stopwords excluded from mention detection and used by quality scoring.
STOPWORDS = ("the", "a")

# Tokens-per-text-span when deriving the interleaved document table.
SPAN_TOKENS = 12
