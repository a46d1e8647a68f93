"""Golden-set differencing: precision/recall of emitted triples vs an
expected set (G4, pattern of test/validate_sampling.py:27-116 in
/root/reference/TabularSemantics/src/: missing = ref - tocheck,
wrong = tocheck - ref).

``expected_triples_pandas`` is an INDEPENDENT, single-process pandas
re-derivation of the flagship semantics straight from the fixture tables —
it shares no Ray code with the pipeline, so the P/R comparison actually
checks the distributed implementation.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from ..constants import AVOID_TOP_CONCEPTS, DOC, MENTIONS_PRED, RDF_TYPE, STOPWORDS
from .. import fixture_kg


def expected_triples_pandas(sf_dir: str) -> pd.DataFrame:
    """Reference-semantics triples computed sequentially in pandas."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()

    lex = fixture_kg.lexicon_df().sort_values(["surface_form", "rank"])
    redirect = fixture_kg.redirect_map()
    disamb = fixture_kg.disambiguation_entities()
    types = fixture_kg.entity_types_df()
    types = types[~types["type_uri"].isin(AVOID_TOP_CONCEPTS)]

    # surface -> linked entity (lowest rank, canonical, non-disambiguation)
    surface_link: dict[str, str] = {}
    for r in lex.itertuples(index=False):
        if r.surface_form in surface_link:
            continue
        ent = redirect.get(r.entity_uri, r.entity_uri)
        if ent in disamb:
            continue
        surface_link[r.surface_form] = ent

    type_map: dict[str, list[str]] = {}
    for r in types.itertuples(index=False):
        type_map.setdefault(r.entity_uri, []).append(r.type_uri)

    triples: set[tuple] = set()
    for row in docs.itertuples(index=False):
        doc_uri = f"{DOC}doc-{row.doc_id:06d}"
        votes: dict[str, int] = {}
        for tok in row.text.split(" "):
            if tok in STOPWORDS:
                continue
            ent = surface_link.get(tok)
            if ent is None:
                continue
            triples.add((doc_uri, MENTIONS_PRED, ent, False))
            for t in type_map.get(ent, []):
                triples.add((ent, RDF_TYPE, t, False))
                votes[t] = votes.get(t, 0) + 1
        if votes:
            winner = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            triples.add((doc_uri, RDF_TYPE, winner, False))
    return pd.DataFrame(
        sorted(triples), columns=["subj", "pred", "obj", "obj_is_literal"]
    )


def precision_recall(emitted: pd.DataFrame, expected: pd.DataFrame) -> dict:
    """missing = ref - tocheck; wrong = tocheck - ref; P/R over triple sets."""
    cols = ["subj", "pred", "obj", "obj_is_literal"]
    got = set(map(tuple, emitted[cols].itertuples(index=False)))
    ref = set(map(tuple, expected[cols].itertuples(index=False)))
    wrong = got - ref
    missing = ref - got
    precision = (len(got) - len(wrong)) / len(got) if got else 0.0
    recall = (len(ref) - len(missing)) / len(ref) if ref else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "n_emitted": len(got),
        "n_expected": len(ref),
        "n_wrong": len(wrong),
        "n_missing": len(missing),
        "wrong_sample": sorted(wrong)[:5],
        "missing_sample": sorted(missing)[:5],
    }


def validate_flagship(sf_dir: str, *, backend: str | None = None) -> dict:
    """Run the distributed flagship and diff against the pandas oracle.

    ``backend`` names a registered KGBackend for the linker (e.g. the
    dump-INGESTED one) — the oracle side always derives from the fixture
    tables, so a backend whose parse/derive round-trip is wrong shows up
    as a P/R miss here, not just in the kg_ingest_* table oracles."""
    from .kg_pipeline import build_triples

    emitted = build_triples(sf_dir, backend=backend).to_pandas()
    return precision_recall(emitted, expected_triples_pandas(sf_dir))
