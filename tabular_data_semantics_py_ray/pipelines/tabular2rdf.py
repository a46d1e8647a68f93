"""Table -> RDF triples graph materialize (~ oaei/tabular2rdf.py:120-239 in
/root/reference/TabularSemantics/src/: property-URI minting M13, row-entity
emitter M14, role assertions M15, header handling M16).

Deviation from the reference, documented: row identity is a caller-named key
column (e.g. n_nationkey), not CSV scan order — scan order is not stable
under distributed reads, and the key makes the oracle SQL well-defined.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..constants import RDF_TYPE, RDFS_LABEL, TAB, ONT
from ..schemas import TRIPLES_SCHEMA
from ..util import read_parquet_clean


def table_to_rdf(ds, *, table_name: str, key_col: str, cls_uri: str,
                 label_col: str | None = None, value_cols: list[str] | None = None):
    """Generic M13-M16 materialize for one logical table.

    Per row entity ``<TAB>{table}-row-{key}``:
    - rdf:type ``cls_uri`` (M14 type triple)
    - rdfs:label from ``label_col`` (M14 label triple), if given
    - one role assertion per non-null cell of ``value_cols`` with minted
      per-column data-property URIs ``<TAB>{table}-col-{i}`` (M13+M15);
      column order = position in ``value_cols`` (1-based, like the
      reference's positional property minting).
    """

    def _emit(t: pa.Table) -> pa.Table:
        # Arrow-native emitter: minted URIs via element-wise string join,
        # constants via fill_null broadcast — no Python list per row.
        # Integer/string cells stringify identically under Arrow cast and
        # pandas astype(str); exotic numeric types should be pre-formatted
        # by the caller.
        import numpy as np
        import pyarrow.compute as pc

        ent = pc.binary_join_element_wise(
            pa.scalar(TAB + f"{table_name}-row-"),
            t.column(key_col).cast(pa.string()).combine_chunks(),
            pa.scalar(""))

        def _const(v: str, n: int) -> pa.Array:
            return pa.nulls(n, pa.string()).fill_null(v)

        def rows(s, p: str, o, is_lit: bool) -> pa.Table:
            n = len(s)
            return pa.Table.from_arrays(
                [s, _const(p, n), o, pa.array(np.full(n, is_lit))],
                schema=TRIPLES_SCHEMA)

        n = t.num_rows
        parts = [rows(ent, RDF_TYPE, _const(cls_uri, n), False)]
        if label_col is not None:
            parts.append(rows(
                ent, RDFS_LABEL,
                t.column(label_col).cast(pa.string()).combine_chunks(),
                True))
        for i, col in enumerate(value_cols or [], start=1):
            c = t.column(col)
            mask = pc.is_valid(c)
            parts.append(rows(
                ent.filter(mask.combine_chunks()
                           if isinstance(mask, pa.ChunkedArray) else mask),
                TAB + f"{table_name}-col-{i}",
                c.filter(mask).cast(pa.string()).combine_chunks(),
                True))
        return pa.concat_tables(parts).combine_chunks()

    return ds.map_batches(_emit, batch_format="pyarrow")


def nation_to_rdf(sf_dir: str):
    """nation -> triples (the oracle-verified instantiation of
    ``table_to_rdf``; columns: 1=n_name, 2=n_regionkey)."""
    ds = read_parquet_clean(os.path.join(sf_dir, "nation.parquet"))
    return table_to_rdf(
        ds,
        table_name="nation",
        key_col="n_nationkey",
        cls_uri=ONT + "Nation",
        label_col="n_name",
        value_cols=["n_name", "n_regionkey"],
    )


def region_to_rdf(sf_dir: str):
    ds = read_parquet_clean(os.path.join(sf_dir, "region.parquet"))
    return table_to_rdf(
        ds,
        table_name="region",
        key_col="r_regionkey",
        cls_uri=ONT + "Region",
        label_col="r_name",
        value_cols=["r_name"],
    )
