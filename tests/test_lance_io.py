"""Interleaved-corpus source (sources/lance_io.py): format dispatch, schema
validation, parquet roundtrip, and the streaming flagship over a corpus read
back through the source — the north rule's input surface."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from tabular_data_semantics_py_ray.schemas import DOCS_SCHEMA
from tabular_data_semantics_py_ray.sources import lance_io


def test_is_lance_path(tmp_path):
    assert lance_io.is_lance_path("/data/corpus.lance")
    assert lance_io.is_lance_path("/data/corpus.lance/")
    assert not lance_io.is_lance_path(str(tmp_path))
    versions = tmp_path / "ds" / "_versions"
    versions.mkdir(parents=True)
    assert lance_io.is_lance_path(str(tmp_path / "ds"))


def test_lance_path_without_lance_package_raises(tmp_path):
    if lance_io.lance_available():
        pytest.skip("lance installed; the gated error path is unreachable")
    with pytest.raises(ImportError, match="[Ll]ance"):
        lance_io.read_interleaved(str(tmp_path / "corpus.lance"))
    with pytest.raises(ImportError, match="[Ll]ance"):
        lance_io.write_interleaved(None, str(tmp_path / "corpus.lance"))


def test_validate_schema_accepts_docs_schema():
    lance_io.validate_interleaved_schema(DOCS_SCHEMA)


@pytest.mark.parametrize(
    "schema, msg",
    [
        (pa.schema([("doc_id", pa.string())]), "missing columns"),
        (
            pa.schema([("doc_id", pa.int64()),
                       ("spans", DOCS_SCHEMA.field("spans").type)]),
            "doc_id must be string",
        ),
        (
            pa.schema([("doc_id", pa.string()), ("spans", pa.string())]),
            "spans must be list",
        ),
        (
            pa.schema([("doc_id", pa.string()),
                       ("spans", pa.list_(pa.struct([("kind", pa.string())])))]),
            "missing fields",
        ),
    ],
)
def test_validate_schema_rejects_malformed(schema, msg):
    with pytest.raises(ValueError, match=msg):
        lance_io.validate_interleaved_schema(schema)


def test_parquet_roundtrip_and_stream(ray_session, sf_small, tmp_path):
    """Write the interleaved corpus with the source, read it back checked,
    and run the streaming flagship over it — result must equal the classic
    path over the raw documents table."""
    from tabular_data_semantics_py_ray.pipelines.kg_pipeline import (
        build_triples,
        docs_dataset,
        read_stream_result,
        triples_stream_to_parquet,
    )

    corpus = str(tmp_path / "corpus_parquet")
    lance_io.write_interleaved(docs_dataset(sf_small), corpus)
    assert os.listdir(corpus)

    docs = lance_io.read_interleaved_checked(corpus)
    out = str(tmp_path / "stream_out")
    triples_stream_to_parquet(docs, out, concurrency=2, pre_interleaved=True)

    got = read_stream_result(out).to_pandas()
    want = build_triples(sf_small).to_pandas()
    cols = ["subj", "pred", "obj", "obj_is_literal"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    assert got.equals(want)


def test_column_pruning(ray_session, sf_small, tmp_path):
    from tabular_data_semantics_py_ray.pipelines.kg_pipeline import docs_dataset

    corpus = str(tmp_path / "corpus_parquet")
    lance_io.write_interleaved(docs_dataset(sf_small), corpus)
    ds = lance_io.read_interleaved(corpus, columns=["doc_id"])
    assert ds.schema().names == ["doc_id"]
