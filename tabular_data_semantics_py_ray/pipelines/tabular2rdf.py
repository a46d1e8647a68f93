"""Table -> RDF triples graph materialize (~ oaei/tabular2rdf.py:120-239 in
/root/reference/TabularSemantics/src/: property-URI minting M13, row-entity
emitter M14, role assertions M15).

Deviation from the reference, documented: row identity is the table's primary
key (e.g. n_nationkey), not CSV scan order — scan order is not stable under
distributed reads, and the key makes the oracle SQL well-defined.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..constants import RDF_TYPE, RDFS_LABEL, TAB, ONT
from ..schemas import TRIPLES_SCHEMA


def nation_to_rdf(sf_dir: str):
    """nation -> triples: per row entity <TAB>nation-row-<key>:
    rdf:type ont:Nation; rdfs:label n_name (literal); one role assertion per
    remaining cell with minted per-column data-property URIs
    (<TAB>nation-col-<i>)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "nation.parquet"))

    def _emit(b: pd.DataFrame) -> pa.Table:
        ent = TAB + "nation-row-" + b["n_nationkey"].astype(str)
        subj, pred, obj, lit = [], [], [], []

        def add(s, p, o, is_lit):
            subj.extend(s)
            pred.extend([p] * len(s))
            obj.extend(o)
            lit.extend([is_lit] * len(s))

        add(ent, RDF_TYPE, [ONT + "Nation"] * len(b), False)
        add(ent, RDFS_LABEL, b["n_name"].astype(str), True)  # M14 label triple
        add(ent, TAB + "nation-col-1", b["n_name"].astype(str), True)  # M15
        add(ent, TAB + "nation-col-2", b["n_regionkey"].astype(str), True)
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
