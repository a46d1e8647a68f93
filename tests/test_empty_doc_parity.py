"""Empty-text documents: interleave emits ZERO spans for text='' (the
span-sequence contract), so span-derived operators must count 0 tokens for
them while raw-text operators count 1 (string_split('') = ['']). This
divergence corrupted every downstream pack offset when the media packer's
oracle used the raw-text convention — pinned here by running the engine and
its DuckDB oracle over a corpus that actually CONTAINS empty docs (the
shipped testdata has none, so sf parity alone cannot catch it)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def empty_doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("emptydocs")
    texts = []
    for i in range(24):
        if i in (0, 4, 8, 13):  # empties, mostly on %4==0 media slots
            texts.append("")
        elif i == 5:  # multi-chunk doc (30 tokens -> 3 chunks)
            texts.append(" ".join(f"tok{j}" for j in range(30)))
        else:
            texts.append(f"alpha beta{i} gamma")
    pd.DataFrame({"doc_id": np.arange(24, dtype=np.int64),
                  "text": texts}).to_parquet(
        os.path.join(d, "documents.parquet"))
    return str(d)


def _duck(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents')}.parquet')")
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


@pytest.mark.parametrize("name", ["media_pack_assign", "doc_pack_assign",
                                  "media_manifest"])
def test_empty_doc_parity(name, empty_doc_dir):
    eng = _canon(_to_pd(_QUERIES[name](empty_doc_dir)))
    ora = _canon(_duck(_ORACLES[name], empty_doc_dir))
    assert list(eng.columns) == list(ora.columns)
    assert len(eng) == len(ora), f"{name}: {len(eng)} != {len(ora)}"
    for c in eng.columns:
        a, b = eng[c], ora[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False,
                check_exact=True, obj=f"{name}.{c}")
        else:
            assert (a.to_numpy() == b.to_numpy()).all(), f"{name}.{c}"


def test_empty_doc_counts_zero_tokens(empty_doc_dir):
    """The span convention itself: an empty doc occupies zero token
    positions in the media packer (but one in the raw-text packer)."""
    mp = _to_pd(_QUERIES["media_pack_assign"](empty_doc_dir))
    assert (mp.loc[mp["doc_id"].isin([0, 4, 8, 13]), "n_tokens"] == 0).all()
    tp = _to_pd(_QUERIES["doc_pack_assign"](empty_doc_dir))
    assert (tp.loc[tp["doc_id"].isin([0, 4, 8, 13]), "n_tokens"] == 1).all()


def _to_pd(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()
