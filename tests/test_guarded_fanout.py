"""Regression test for the repartition-coalesce fix: a many-file parquet
directory must KEEP its natural per-file blocks (repartitioning it down to
the fan-out target coalesced into giant multi-chunk blocks — measured 26x
slower per map_batches pass at 5M docs), while a single-file table must
still fan out so task stages parallelize."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from tabular_data_semantics_py_ray.util import guarded_fanout


def _write_dir(path, n_files, rows_per_file=100):
    os.makedirs(path)
    for i in range(n_files):
        t = pa.table({"doc_id": list(range(i * rows_per_file,
                                           (i + 1) * rows_per_file))})
        pq.write_table(t, os.path.join(path, f"f{i}.parquet"))


def test_many_file_dir_keeps_natural_blocks(tmp_path):
    d = str(tmp_path / "many.parquet")
    _write_dir(d, n_files=12)
    ds = guarded_fanout(rd.read_parquet(d), d, blocks=4)
    # fewer target blocks than files -> no repartition operator added
    assert "Repartition" not in ds.__repr__()
    assert ds.count() == 1200


def test_single_file_still_fans_out(tmp_path):
    f = str(tmp_path / "one.parquet")
    pq.write_table(pa.table({"doc_id": list(range(1000))}), f)
    ds = guarded_fanout(rd.read_parquet(f), f, blocks=8)
    assert "Repartition" in ds.__repr__()
    assert ds.materialize().num_blocks() == 8


def test_sparse_dir_fans_out_to_target(tmp_path):
    d = str(tmp_path / "few.parquet")
    _write_dir(d, n_files=2)
    ds = guarded_fanout(rd.read_parquet(d), d, blocks=8)
    assert "Repartition" in ds.__repr__()
    assert ds.count() == 200
