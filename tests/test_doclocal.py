"""Doc-local flagship == classic shuffle-based flagship, exactly."""

from __future__ import annotations

import pandas as pd

from tabular_data_semantics_py_ray.pipelines.kg_pipeline import (
    read_documents,
    triples_from_documents,
    triples_from_documents_doclocal,
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
