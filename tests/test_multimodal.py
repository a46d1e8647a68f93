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


def test_frame_sampler_expansion():
    from tabular_data_semantics_py_ray.stages.multimodal import FrameSampler

    batch = pa.Table.from_pydict(
        {"doc_id": [1, 2, 3], "media_ref": ["media://1/1", "media://2/3",
                                            "media://3/1"]})
    out = FrameSampler()(batch)
    df = out.to_pandas()
    # bounded expansion: 1..4 frames per row, contiguous frame_idx from 0
    per = df.groupby("doc_id")["frame_idx"].agg(["min", "max", "count"])
    assert (per["min"] == 0).all()
    assert (per["max"] == per["count"] - 1).all()
    assert per["count"].between(1, 4).all()
    # ts grid + deterministic per-frame digest
    assert (df["ts_ms"] == df["frame_idx"] * 250).all()
    import hashlib
    for _, r in df.iterrows():
        want = hashlib.md5(
            f"{r['media_ref']}#{r['frame_idx']}".encode()).hexdigest()
        assert r["frame_md5"] == want
    # deterministic across calls
    assert out.to_pandas().equals(FrameSampler()(batch).to_pandas())


def test_image_resizer_aspect_invariants():
    from tabular_data_semantics_py_ray.stages.multimodal import ImageResizer

    refs = [f"media://{i}/0" for i in range(64)]
    batch = pa.Table.from_pydict(
        {"doc_id": list(range(64)), "media_ref": refs})
    df = ImageResizer()(batch).to_pandas()
    # the long side is exactly max_side, the short side is scaled down
    # preserving aspect (integer floor), never upscaled past max_side
    assert (df[["out_w", "out_h"]].max(axis=1) == 64).all()
    assert (df["out_w"] >= 1).all() and (df["out_h"] >= 1).all()
    wide = df["src_w"] >= df["src_h"]
    assert (df.loc[wide, "out_w"] == 64).all()
    assert (df.loc[wide, "out_h"]
            == (df.loc[wide, "src_h"] * 64) // df.loc[wide, "src_w"]).all()
    tall = ~wide
    assert (df.loc[tall, "out_h"] == 64).all()


def test_frame_and_resize_real_decode_stubs():
    from tabular_data_semantics_py_ray.stages.multimodal import (
        FrameSampler,
        ImageResizer,
    )

    batch = pa.Table.from_pydict({"media_ref": ["media://1/0"]})
    with pytest.raises(NotImplementedError):
        FrameSampler(real_decode=True)(batch)
    with pytest.raises(NotImplementedError):
        ImageResizer(real_decode=True)(batch)
