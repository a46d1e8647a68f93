"""Small dataset helpers.

Ray 2.49's ``Project`` operator (behind ``Dataset.rename_columns`` /
``drop_columns`` / ``select_columns``) assumes Arrow blocks and crashes on
the pandas blocks that grouped aggregates emit. These helpers do the same
projections inside ``map_batches(batch_format="pyarrow")``, which converts
any block type to Arrow first.
"""

from __future__ import annotations

import pyarrow as pa


def rename_cols(ds, mapping: dict[str, str]):
    def _r(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(_r, batch_format="pyarrow")


def drop_cols(ds, cols: list[str]):
    def _d(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in cols if c in t.column_names])

    return ds.map_batches(_d, batch_format="pyarrow")


def select_cols(ds, cols: list[str]):
    def _s(t: pa.Table) -> pa.Table:
        return t.select(cols)

    return ds.map_batches(_s, batch_format="pyarrow")
