"""CSV sources (S1-S3) and N-Triples sink (S6)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

from tabular_data_semantics_py_ray.sources.readers import (
    cea_entities_per_column,
    cea_target_columns,
    drop_ragged_rows,
    read_cea_gt,
    read_table_csv,
)
from tabular_data_semantics_py_ray.sources.writers import write_ntriples


@pytest.fixture()
def table_csv(tmp_path):
    p = tmp_path / "table1.csv"
    p.write_text(
        'name,country,year\n'
        '"Chicago Bulls","United States",1966\n'
        '"Real Madrid (basketball)","Spain",1931\n'
        '"Ragged Row"\n'  # shorter than header -> dropped (M16)
    )
    return str(p)


@pytest.fixture()
def cea_csv(tmp_path):
    p = tmp_path / "cea.csv"
    p.write_text(
        '"t1","0","1","http://ex.org/r/Bulls"\n'
        '"t1","0","2","http://ex.org/r/Madrid"\n'
        '"t1","2","1","http://ex.org/r/Y1966"\n'
        '"t2","1","1","http://ex.org/r/Bulls"\n'
    )
    return str(p)


def test_read_table_csv_and_ragged(table_csv):
    df = read_table_csv(table_csv).to_pandas()
    # ragged row skipped at parse (M16)
    assert len(df) == 2
    assert list(df.columns) == ["name", "country", "year"]
    assert df["name"].tolist() == ["Chicago Bulls", "Real Madrid (basketball)"]


def test_drop_null_rows():
    import ray.data as rd

    ds = rd.from_items(
        [{"a": "x", "b": "y"}, {"a": "z", "b": None}, {"a": None, "b": None}]
    )
    clean, dropped = drop_ragged_rows(ds, expected_cols=2)
    assert dropped == 2
    assert clean.count() == 1


def test_cea_gt_reader_and_targets(cea_csv):
    gt = read_cea_gt(cea_csv).materialize()
    assert gt.count() == 4
    targets = cea_target_columns(gt).to_pandas().sort_values("table_id")
    assert dict(zip(targets["table_id"], targets["target_col"])) == {"t1": 0, "t2": 1}
    per_col = cea_entities_per_column(gt).to_pandas()
    key = per_col.set_index(["table_id", "col"])["entity_uris"].to_dict()
    assert list(key[("t1", 0)]) == [
        "http://ex.org/r/Bulls", "http://ex.org/r/Madrid",
    ]


def test_ntriples_sink(sf_small, tmp_path):
    from tabular_data_semantics_py_ray.pipelines.tabular2rdf import nation_to_rdf

    out = os.path.join(tmp_path, "nt")
    stats = write_ntriples(nation_to_rdf(sf_small), out)
    assert stats["rows"] == 100 and stats["dropped_invalid_uri"] == 0
    lines = []
    for f in sorted(os.listdir(out)):
        with open(os.path.join(out, f)) as fh:
            lines.extend(fh.read().splitlines())
    assert len(lines) == 100  # 25 nations x 4 triples
    assert all(line.endswith(" .") for line in lines)
    uri_lines = [l for l in lines if "rdf-syntax-ns#type" in l]
    assert uri_lines and all(l.split(" ")[2].startswith("<") for l in uri_lines)
    lit_lines = [l for l in lines if "nation-col-1" in l]
    assert lit_lines and all('"' in l for l in lit_lines)


def test_ntriples_sink_drops_invalid_uris(tmp_path):
    import ray

    triples = ray.data.from_items([
        {"subj": "http://ex.org/s1", "pred": "http://ex.org/p",
         "obj": "http://ex.org/o", "obj_is_literal": False},
        {"subj": "http://ex.org/bad subj", "pred": "http://ex.org/p",
         "obj": "x", "obj_is_literal": True},
        {"subj": "http://ex.org/s2", "pred": "http://ex.org/p",
         "obj": "not-a-uri", "obj_is_literal": False},  # URI obj: invalid
        {"subj": "http://ex.org/s3", "pred": "http://ex.org/p",
         "obj": "not-a-uri", "obj_is_literal": True},   # literal obj: fine
    ])
    out = os.path.join(tmp_path, "nt_invalid")
    stats = write_ntriples(triples, out)
    assert stats["rows"] == 2 and stats["dropped_invalid_uri"] == 2
    lines = []
    for f in sorted(os.listdir(out)):
        with open(os.path.join(out, f)) as fh:
            lines.extend(fh.read().splitlines())
    assert len(lines) == 2
    assert not any("bad subj" in l or "not-a-uri>" in l for l in lines)
