from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tabular_data_semantics_py_ray.pipelines.kg_pipeline import docs_dataset
from tabular_data_semantics_py_ray.stages.multimodal import (
    FEATURE_DIM,
    MediaFeaturizer,
    featurize_media,
)


def test_featurize_media_end_to_end(sf_small):
    out = featurize_media(docs_dataset(sf_small)).to_pandas()
    assert set(out.columns) == {"doc_id", "span_idx", "kind", "media_ref", "feature"}
    assert len(out) > 0
    assert set(out["kind"]) <= {"image", "audio"}
    assert all(len(f) == FEATURE_DIM for f in out["feature"])
    # deterministic across runs
    out2 = featurize_media(docs_dataset(sf_small)).to_pandas()
    a = out.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    assert (a["media_ref"] == b["media_ref"]).all()
    assert all(np.allclose(x, y) for x, y in zip(a["feature"], b["feature"]))


def test_real_decode_is_explicit_stub():
    feat = MediaFeaturizer(real_decode=True)
    batch = pa.Table.from_pydict(
        {"doc_id": ["d"], "span_idx": [0], "kind": ["image"],
         "media_ref": ["media://1/0"]}
    )
    with pytest.raises(NotImplementedError):
        feat(batch)
