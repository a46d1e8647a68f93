"""Driver-style side-by-side check: every queries() entry with an
oracle_sql() entry must match DuckDB on row count, column names and values
(order-insensitive), at BOTH sf0.001 and sf0.01 (the driver runs sf0.01, so
the larger sweep catches scale-dependent divergence the tiny one can't).
This is a local replica of the driver's CORRECTNESS gate so mismatches
surface before a round ends."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def _duck(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa

        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("sf_dir", SF_DIRS,
                         ids=[os.path.basename(d) for d in SF_DIRS])
@pytest.mark.parametrize("name", sorted(_ORACLES.keys()))
def test_query_matches_oracle(name, sf_dir):
    ray_df = _canon(_to_pandas(_QUERIES[name](sf_dir)))
    duck_df = _canon(_duck(_ORACLES[name], sf_dir))
    assert list(ray_df.columns) == list(duck_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(duck_df.columns)}"
    )
    assert len(ray_df) == len(duck_df), f"{name}: rows {len(ray_df)} != {len(duck_df)}"
    for c in ray_df.columns:
        a, b = ray_df[c], duck_df[c]
        # nullable extension dtypes stringify as '<NA>' where DuckDB's
        # pandas bridge yields 'nan'/'None' — equal here (NaN==NaN below)
        # but a HASH MISMATCH in the driver's stringified compare. Return
        # plain numpy dtypes (float64+NaN) from queries instead.
        assert not (isinstance(a.dtype, pd.api.extensions.ExtensionDtype)
                    and a.dtype.kind in "if"), (
            f"{name}.{c}: nullable numeric extension dtype {a.dtype} would "
            "hash-mismatch in the driver; use plain float64 + NaN")
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False,
                check_exact=True, obj=f"{name}.{c}",
            )
        else:
            assert (a.to_numpy() == b.to_numpy()).all(), f"{name}: column {c} differs"


def test_all_queries_have_oracle_or_are_listed():
    """Every registered query carries an oracle — the matrix is complete
    (dedup_simhash gained one in round 2 via md5-derived bit hashes)."""
    no_oracle = set(_QUERIES) - set(_ORACLES)
    assert no_oracle == set(), no_oracle
