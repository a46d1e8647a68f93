"""Sources (SURVEY §2.1).

S1  CSV table reader — the reference parses every table with
    ``csv.reader(delimiter=',', quotechar='"', escapechar='\\')``
    (oaei/tabular2rdf.py:182-210). Here: ``ray.data.read_csv`` with the same
    Arrow parse options; ragged rows are dropped with a counter instead of a
    silent ``continue`` (M16, tabular2rdf.py:214-215).
S2  CEA ground-truth reader — (table,col,row,uri) rows grouped per
    (table,col) (test/challenge_utils.py:35-66).
S3  CEA targets — per table the minimum column id is the target entity
    column (oaei/dbpedia_fragment.py:216-229).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data as rd


def _skip_invalid_row(row) -> str:
    # M16: rows shorter/longer than the header are dropped
    # (oaei/tabular2rdf.py:214-215) — 'skip' instead of silent continue
    return "skip"


def read_table_csv(path: str, *, has_header: bool = True):
    """S1: read one SemTab-style table CSV into a Dataset (all columns
    string-typed, matching the reference's everything-is-a-string model;
    ragged rows skipped per M16)."""
    parse = pacsv.ParseOptions(
        delimiter=",",
        quote_char='"',
        escape_char="\\",
        invalid_row_handler=_skip_invalid_row,
    )
    read = pacsv.ReadOptions(autogenerate_column_names=not has_header)
    convert = pacsv.ConvertOptions(strings_can_be_null=False)
    return rd.read_csv(
        path,
        parse_options=parse,
        read_options=read,
        convert_options=convert,
    )


def drop_ragged_rows(ds, expected_cols: int):
    """M16: drop rows with missing (null) trailing cells; emit a counter
    column-free dataset plus the count of dropped rows via a side aggregate.

    Returns (clean_ds, count_of_dropped). Counting executes the pipeline once
    (cheap at table scale); at 100 TB you would fold the counter into a
    metrics actor instead.
    """
    import pyarrow.compute as pc

    def _valid_mask(t: pa.Table) -> pa.Array:
        mask = pa.array([True] * t.num_rows)
        for col in t.itercolumns():
            mask = pc.and_(mask, col.is_valid())
        return mask

    def _clean(t: pa.Table) -> pa.Table:
        return t.filter(_valid_mask(t))

    def _dropped(t: pa.Table) -> pa.Table:
        n = t.num_rows - pc.sum(_valid_mask(t)).as_py()
        return pa.table({"n_dropped": pa.array([n], type=pa.int64())})

    dropped = sum(
        pc.sum(b["n_dropped"]).as_py() or 0
        for b in ds.map_batches(_dropped, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    return ds.map_batches(_clean, batch_format="pyarrow"), dropped


def read_cea_gt(path: str):
    """S2: CEA ground truth CSV (table,col,row,uri) -> Dataset with typed
    columns (explicit schema instead of positional convention)."""
    parse = pacsv.ParseOptions(delimiter=",", quote_char='"', escape_char="\\")
    read = pacsv.ReadOptions(
        autogenerate_column_names=True,
    )
    ds = rd.read_csv(path, parse_options=parse, read_options=read)

    def _typed(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t.column(0).cast(pa.string()),
                t.column(1).cast(pa.int32()),
                t.column(2).cast(pa.int64()),
                t.column(3).cast(pa.string()),
            ],
            names=["table_id", "col", "row", "entity_uri"],
        )

    return ds.map_batches(_typed, batch_format="pyarrow")


def cea_target_columns(cea_gt_ds):
    """S3: per table the min column id (leftmost target entity column)."""
    from ..util import bucket_aggregate

    return bucket_aggregate(
        cea_gt_ds, ["table_id"], {"target_col": ("col", "min")}, num_buckets=8
    )


def cea_entities_per_column(cea_gt_ds):
    """S2 grouping: distinct entity set per (table_id, col) as list<string>
    (dict[key, set[uri]] in the reference, challenge_utils.py:35-66)."""
    from ..util import bucket_map_keyed

    import pandas as pd

    def _collect(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.groupby(["table_id", "col"], sort=False)["entity_uri"]
            .agg(lambda s: sorted(set(s)))
            .reset_index()
            .rename(columns={"entity_uri": "entity_uris"})
        )
        return out

    return bucket_map_keyed(cea_gt_ds, ["table_id", "col"], _collect, num_buckets=8)
