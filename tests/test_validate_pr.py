"""The north-rule quality gate: triple P/R >= 0.95 against an independent
sequential re-derivation of the reference semantics (BASELINE.md Quality)."""

from __future__ import annotations

from tabular_data_semantics_py_ray.pipelines.validate import validate_flagship


def test_flagship_precision_recall(sf_small):
    report = validate_flagship(sf_small)
    assert report["n_expected"] > 5000
    assert report["precision"] >= 0.95, report
    assert report["recall"] >= 0.95, report
    # with a deterministic fixture KG the match should in fact be exact
    assert report["n_wrong"] == 0, report["wrong_sample"]
    assert report["n_missing"] == 0, report["missing_sample"]
