"""Kill-resume integration test (BASELINE.md 'Resumability' row): a run that
dies mid-way resumes without recomputing committed partitions, and the final
result equals a single-shot run."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from tabular_data_semantics_py_ray.pipelines.kg_pipeline import build_triples
from tabular_data_semantics_py_ray.pipelines.materialize import (
    read_result,
    run_partitioned,
)
from tabular_data_semantics_py_ray.state import manifest as mf


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["subj", "pred", "obj", "obj_is_literal"]
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_kill_resume_skips_committed_partitions(sf_small):
    with tempfile.TemporaryDirectory() as out:
        # "killed" run: completes only 2 of 4 partitions
        first = run_partitioned(sf_small, out, num_partitions=4,
                                max_partitions_this_run=2)
        assert first == [0, 1]
        assert mf.committed_partitions(out) == [0, 1]
        mtimes = {p: os.path.getmtime(mf.manifest_path(out, p)) for p in (0, 1)}

        # resume: finishes the rest, does NOT touch committed partitions
        second = run_partitioned(sf_small, out, num_partitions=4)
        assert second == [2, 3]
        for p in (0, 1):
            assert os.path.getmtime(mf.manifest_path(out, p)) == mtimes[p]

        # manifests carry lineage + metrics
        m = mf.load(out, 0)
        assert m["rows"] > 0
        assert m["lineage"]["filter"] == "doc_id % 4 == 0"
        assert len(m["content_hash"]) == 16

        # final content == single-shot run under set semantics (entity-level
        # type triples may repeat across partitions; doc-keyed must not)
        partitioned = _canon(read_result(out).to_pandas().drop_duplicates())
        single = _canon(build_triples(sf_small).to_pandas())
        pd.testing.assert_frame_equal(partitioned, single)

        # doc-keyed triples are globally unique without dedup
        raw = read_result(out).to_pandas()
        doc_rows = raw[raw["subj"].str.contains("/doc/")]
        assert not doc_rows.duplicated().any()


def test_idempotent_rerun_is_noop(sf_small):
    with tempfile.TemporaryDirectory() as out:
        run_partitioned(sf_small, out, num_partitions=2)
        assert run_partitioned(sf_small, out, num_partitions=2) == []
