"""The dump->backend->triples chain: the flagship linked against the
dump-INGESTED backend (pipelines/kg_ingest.ingest_backend_tables output)
emits EXACTLY the triples the fixture-backed flagship emits, and clears
the P/R gate at 1.0 against the independent pandas oracle.

The deterministic dump (kg_dump) serializes the complete fixture KG plus
noise in disjoint namespaces; noise surface forms never occur in the
document corpus, so the two backends must produce identical output — any
divergence is a parse/derive bug in the ingest, not a data difference.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tabular_data_semantics_py_ray.pipelines.kg_pipeline import (
    build_triples,
    read_documents,
    read_stream_result,
    triples_stream_to_parquet,
)

COLS = ["subj", "pred", "obj", "obj_is_literal"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df[COLS].sort_values(COLS).reset_index(drop=True)


@pytest.fixture(scope="module")
def ingested_backend(ray_session):
    from tabular_data_semantics_py_ray.pipelines.kg_ingest import (
        ensure_ingested_backend,
    )

    ensure_ingested_backend("ingested")
    return "ingested"


def test_ingested_backend_tables_match_fixture_on_shared_vocab(
        ingested_backend):
    """Every fixture-namespace row of the ingested backend equals the
    fixture table exactly (lexicon ranks included); noise rows are the
    only extras."""
    from tabular_data_semantics_py_ray import fixture_kg
    from tabular_data_semantics_py_ray.state.backends import get_backend

    b = get_backend("ingested")
    pairs = [
        (b.entity_types(), fixture_kg.entity_types_df(),
         ["entity_uri", "type_uri"]),
        (b.alias_edges(), fixture_kg.alias_edges_df(),
         ["uri_a", "uri_b", "kind"]),
    ]
    for got, want, cols in pairs:
        # noise rows may touch a fixture-side column only through their
        # OTHER end (e.g. the dump's blank node typed into a noise class),
        # so drop any row mentioning a noise namespace or a blank node
        noise = got[cols[0]].str.startswith("_:")
        for c in cols:
            if got[c].dtype == object:
                noise |= got[c].str.contains("/noise", na=False)
        got = got[~noise]
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_ingested_flagship_equals_fixture_flagship(sf_small,
                                                   ingested_backend):
    """build_triples (doc-local path) over the ingested backend ==
    fixture-backed build_triples, bit for bit."""
    fix = _canon(build_triples(sf_small).to_pandas())
    ing = _canon(build_triples(sf_small, backend="ingested").to_pandas())
    pd.testing.assert_frame_equal(fix, ing)


def test_ingested_stream_sink_equals_fixture(sf_small, tmp_path,
                                             ingested_backend):
    """The zero-all-to-all stream sink (the scale path bench.py --scaling
    measures) produces identical output under the ingested backend."""
    triples_stream_to_parquet(read_documents(sf_small),
                              str(tmp_path / "fix"), concurrency=2)
    triples_stream_to_parquet(read_documents(sf_small),
                              str(tmp_path / "ing"), concurrency=2,
                              backend="ingested")
    fix = _canon(read_stream_result(str(tmp_path / "fix")).to_pandas())
    ing = _canon(read_stream_result(str(tmp_path / "ing")).to_pandas())
    pd.testing.assert_frame_equal(fix, ing)


def test_ingested_flagship_pr_gate(sf_small, ingested_backend):
    """P/R gate vs the independent pandas oracle, linker fed by the
    ingested backend: the north rule's >=0.95 bar, expected exactly 1.0."""
    from tabular_data_semantics_py_ray.pipelines.validate import (
        validate_flagship,
    )

    report = validate_flagship(sf_small, backend="ingested")
    assert report["precision"] == 1.0, report
    assert report["recall"] == 1.0, report
