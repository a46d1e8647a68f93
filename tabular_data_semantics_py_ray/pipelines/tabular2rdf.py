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

    def _emit(b: pd.DataFrame) -> pa.Table:
        ent = TAB + f"{table_name}-row-" + b[key_col].astype(str)
        subj, pred, obj, lit = [], [], [], []

        def add(s, p, o, is_lit):
            subj.extend(s)
            pred.extend([p] * len(s))
            obj.extend(o)
            lit.extend([is_lit] * len(s))

        add(ent, RDF_TYPE, [cls_uri] * len(b), False)
        if label_col is not None:
            add(ent, RDFS_LABEL, b[label_col].astype(str), True)
        for i, col in enumerate(value_cols or [], start=1):
            mask = b[col].notna()
            add(
                ent[mask],
                TAB + f"{table_name}-col-{i}",
                b.loc[mask, col].astype(str),
                True,
            )
        return pa.Table.from_arrays(
            [
                pa.array(subj, type=pa.string()),
                pa.array(pred, type=pa.string()),
                pa.array(obj, type=pa.string()),
                pa.array(lit, type=pa.bool_()),
            ],
            schema=TRIPLES_SCHEMA,
        )

    return ds.map_batches(_emit, batch_format="pandas")


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
