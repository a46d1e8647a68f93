"""Doc-local flagship == classic shuffle-based flagship, exactly."""

from __future__ import annotations

import pandas as pd

from tabular_data_semantics_py_ray.pipelines.kg_pipeline import (
    read_documents,
    read_stream_result,
    triples_from_documents,
    triples_from_documents_doclocal,
    triples_stream_to_parquet,
)

COLS = ["subj", "pred", "obj", "obj_is_literal"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df[COLS].sort_values(COLS).reset_index(drop=True)


def test_doclocal_equals_classic(sf_small):
    classic = _canon(triples_from_documents(read_documents(sf_small)).to_pandas())
    doclocal = _canon(
        triples_from_documents_doclocal(read_documents(sf_small)).to_pandas()
    )
    pd.testing.assert_frame_equal(classic, doclocal)


import pytest


@pytest.mark.parametrize("fast", [True, False])
def test_stream_sink_equals_classic(sf_small, tmp_path, fast):
    """The zero-shuffle parquet sink path (both the pandas actor and the
    Arrow/numpy fast actor) emits exactly the classic triple set (doc-keyed
    stream unique by construction + KG-bounded etype distinct)."""
    out = str(tmp_path / f"stream_sink_{fast}")
    triples_stream_to_parquet(read_documents(sf_small), out,
                              link_batch_size=13, fast=fast)
    streamed = _canon(read_stream_result(out).to_pandas())
    classic = _canon(triples_from_documents(read_documents(sf_small)).to_pandas())
    pd.testing.assert_frame_equal(classic, streamed)


def test_stream_sink_pre_interleaved_equals_raw(sf_small, tmp_path):
    """Streaming from the ALREADY-interleaved (doc_id:string, spans) table —
    the input_hint shape — emits the identical triple set as streaming from
    raw documents (span derivation fused in)."""
    from tabular_data_semantics_py_ray.pipelines.kg_pipeline import docs_dataset

    out = str(tmp_path / "stream_interleaved")
    triples_stream_to_parquet(docs_dataset(sf_small), out,
                              pre_interleaved=True, link_batch_size=17)
    streamed = _canon(read_stream_result(out).to_pandas())
    classic = _canon(triples_from_documents(read_documents(sf_small)).to_pandas())
    pd.testing.assert_frame_equal(classic, streamed)


def test_stream_sink_large_backend_lexicon(sf_small, tmp_path):
    """Backend pluggability + |KG| scaling: a registered backend whose
    lexicon carries 100k extra (non-occurring) surface forms produces the
    IDENTICAL triple set — the index_in/gather link path is lexicon-size
    independent in output and stays vectorized in cost."""
    import pandas as pd_

    from tabular_data_semantics_py_ray import fixture_kg
    from tabular_data_semantics_py_ray.state.backends import (
        KGBackend,
        register_backend,
    )

    base = fixture_kg.lexicon_df()
    noise = pd_.DataFrame({
        "surface_form": [f"zzznoise{i:06d}" for i in range(100_000)],
        "entity_uri": [f"http://example.org/resource/Noise{i:06d}"
                       for i in range(100_000)],
        "rank": 1,
    }).astype({"rank": "int32"})
    big_lex = pd_.concat([base, noise], ignore_index=True)
    register_backend(KGBackend(
        name="bigtest",
        lexicon=lambda: big_lex,
        entity_types=fixture_kg.entity_types_df,
        alias_edges=fixture_kg.alias_edges_df,
        class_closure=fixture_kg.class_closure_df,
    ))

    out = str(tmp_path / "stream_big_backend")
    triples_stream_to_parquet(read_documents(sf_small), out,
                              backend="bigtest", link_batch_size=97)
    streamed = _canon(read_stream_result(out).to_pandas())
    classic = _canon(triples_from_documents(read_documents(sf_small)).to_pandas())
    pd.testing.assert_frame_equal(classic, streamed)


def test_stream_sink_files_sorted(sf_small, tmp_path):
    """Each sink file is internally sorted by (subj, pred, obj) — the
    per-partition sorted-materialize layout (T8)."""
    import os

    import pyarrow.parquet as pq

    out = str(tmp_path / "stream_sink2")
    main_dir, _ = triples_stream_to_parquet(
        read_documents(sf_small), out, link_batch_size=29
    )
    files = [f for f in os.listdir(main_dir) if f.endswith(".parquet")]
    assert files
    for f in files:
        t = pq.read_table(os.path.join(main_dir, f))
        df = t.to_pandas()
        assert df[["subj", "pred", "obj"]].equals(
            df[["subj", "pred", "obj"]].sort_values(["subj", "pred", "obj"])
            .reset_index(drop=True)
        )


def test_doclocal_small_batches_still_exact(sf_small):
    """Tiny dispatch batches maximize batch-boundary pressure; results must
    not depend on batching because every doc is complete in its batch."""
    doclocal = _canon(
        triples_from_documents_doclocal(
            read_documents(sf_small), link_batch_size=7
        ).to_pandas()
    )
    classic = _canon(triples_from_documents(read_documents(sf_small)).to_pandas())
    pd.testing.assert_frame_equal(classic, doclocal)


def test_etype_auto_flip_distributed(sf_small, tmp_path):
    """etype_shuffle=None auto-flips to the distributed distinct when the
    pinned type table exceeds etype_driver_max — output identical to the
    driver-collect path."""
    out_a = str(tmp_path / "auto_small_budget")
    triples_stream_to_parquet(read_documents(sf_small), out_a,
                              link_batch_size=13, etype_driver_max=0)
    # the distributed path writes >=1 ray part files, never the single
    # driver-collected part-00000.parquet
    import os

    files = os.listdir(os.path.join(out_a, "entity_type_triples"))
    assert files and files != ["part-00000.parquet"]
    out_b = str(tmp_path / "auto_default")
    triples_stream_to_parquet(read_documents(sf_small), out_b,
                              link_batch_size=13)
    assert os.listdir(os.path.join(out_b, "entity_type_triples")) == [
        "part-00000.parquet"]
    pd.testing.assert_frame_equal(
        _canon(read_stream_result(out_a).to_pandas()),
        _canon(read_stream_result(out_b).to_pandas()))
