from __future__ import annotations

import pandas as pd
import pytest

from tabular_data_semantics_py_ray.pipelines.prep import write_backend_artifacts
from tabular_data_semantics_py_ray.state.backends import (
    KGBackend,
    get_backend,
    parquet_backend,
    register_backend,
)
from tabular_data_semantics_py_ray import fixture_kg


def test_fixture_backend_registered():
    b = get_backend("fixture")
    pd.testing.assert_frame_equal(b.lexicon(), fixture_kg.lexicon_df())


def test_unknown_backend_raises():
    with pytest.raises(KeyError, match="unknown KG backend"):
        get_backend("nope")


def test_parquet_backend_round_trip(tmp_path):
    write_backend_artifacts(str(tmp_path))
    b = parquet_backend("offline", str(tmp_path))
    register_backend(b)
    got = get_backend("offline")
    pd.testing.assert_frame_equal(got.class_closure(), fixture_kg.class_closure_df())
    pd.testing.assert_frame_equal(got.alias_edges(), fixture_kg.alias_edges_df())


def test_custom_backend_drives_linker(tmp_path):
    """A registered backend's tables plug straight into the linker actors."""
    import ray

    from tabular_data_semantics_py_ray.stages.linking import EntityLinker

    b = get_backend("fixture")
    linker = EntityLinker(
        lexicon_ref=ray.put(b.lexicon()),
        alias_ref=ray.put(b.alias_edges()),
        types_ref=ray.put(b.entity_types()),
    )
    import pyarrow as pa

    batch = pa.table(
        {"doc_id": ["d"], "span_idx": [0], "tok_idx": [0], "mention": ["spark"]}
    )
    out = linker(batch)
    assert out.column("entity_uri").to_pylist() == [fixture_kg._e("Spark")]
