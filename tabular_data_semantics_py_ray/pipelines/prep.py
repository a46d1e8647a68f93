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


def write_backend_artifacts(out_dir: str) -> dict[str, str]:
    """Project the (fixture) ontology + lexicon into parquet. Returns the
    artifact paths. Deterministic: same input -> byte-identical tables."""
    os.makedirs(out_dir, exist_ok=True)
    artifacts = {
        "lexical_index.parquet": fixture_kg.lexicon_df(),
        "entity_types.parquet": fixture_kg.entity_types_df(),
        "alias_edges.parquet": fixture_kg.alias_edges_df(),
        "class_closure.parquet": fixture_kg.class_closure_df(),
    }
    out = {}
    for fname, df in artifacts.items():
        path = os.path.join(out_dir, fname)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
        out[fname] = path
    return out
