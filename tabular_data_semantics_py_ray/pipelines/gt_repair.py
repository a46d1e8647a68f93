"""M18: CEA ground-truth cell-address validation + column repair.

Reference (``test/error_detection.py:19-88``): for every GT row
``(table, col, row, uri)`` try ``data[row][col]``; on IndexError look up the
row's entity mention and rewrite ``col`` to the first column whose cell
equals that mention (``getColumnEntityMention``, challenge_utils.py:647-677
— first match scanning left-to-right = min column id).

Ray-native shape: instead of re-opening table files per GT row, the three
inputs (GT rows, exploded table cells, per-row mentions) are tagged into one
stream and co-located by ``(table_id, row)`` with a single bucket shuffle;
each bucket repairs its rows with vectorized pandas merges. GT volume is
annotation-sized (orders of magnitude below the corpus), so one shuffle over
it is cheap at any scale.

Outputs the repaired GT plus a ``repaired`` flag column (the reference's
printed counter becomes an aggregable column).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import bucket_map_keyed


def _tag(src: int, t: pa.Table, cols: dict[str, str]) -> pa.Table:
    """Project ``t`` into the superset schema (table_id, row, col,
    entity_uri, value, mention, _src); missing columns null-filled."""
    n = t.num_rows
    out = {
        "table_id": None, "row": None, "col": None,
        "entity_uri": None, "value": None, "mention": None,
    }
    types = {
        "table_id": pa.string(), "row": pa.int64(), "col": pa.int32(),
        "entity_uri": pa.string(), "value": pa.string(),
        "mention": pa.string(),
    }
    arrs, names = [], []
    for c, tp in types.items():
        src_col = cols.get(c)
        arrs.append(t.column(src_col).cast(tp) if src_col else pa.nulls(n, tp))
        names.append(c)
    arrs.append(pa.array(np.full(n, src, dtype=np.int8)))
    names.append("_src")
    return pa.Table.from_arrays(arrs, names=names)


def repair_cea_gt(gt_ds, cells_ds, mentions_ds, *, num_buckets: int = 16):
    """gt(table_id, col, row, entity_uri) x cells(table_id, col, row, value)
    x mentions(table_id, row, mention) -> repaired GT with ``repaired`` flag.

    Unrepairable rows (no matching mention cell — the reference prints
    'Problem with …') keep their original column and ``repaired`` False.
    """
    gt = gt_ds.map_batches(
        lambda t: _tag(0, t, {"table_id": "table_id", "row": "row",
                              "col": "col", "entity_uri": "entity_uri"}),
        batch_format="pyarrow")
    cells = cells_ds.map_batches(
        lambda t: _tag(1, t, {"table_id": "table_id", "row": "row",
                              "col": "col", "value": "value"}),
        batch_format="pyarrow")
    mentions = mentions_ds.map_batches(
        lambda t: _tag(2, t, {"table_id": "table_id", "row": "row",
                              "mention": "mention"}),
        batch_format="pyarrow")
    tagged = gt.union(cells).union(mentions)

    def _repair(g: pd.DataFrame) -> pd.DataFrame:
        gt_r = g.loc[g["_src"] == 0,
                     ["table_id", "row", "col", "entity_uri"]]
        cell_r = g.loc[g["_src"] == 1, ["table_id", "row", "col", "value"]]
        men_r = g.loc[g["_src"] == 2, ["table_id", "row", "mention"]]
        if len(gt_r) == 0:
            return pd.DataFrame({
                "table_id": pd.Series([], dtype="string"),
                "col": pd.Series([], dtype="int32"),
                "row": pd.Series([], dtype="int64"),
                "entity_uri": pd.Series([], dtype="string"),
                "repaired": pd.Series([], dtype="bool"),
            })
        valid = gt_r.merge(cell_r[["table_id", "row", "col"]],
                           on=["table_id", "row", "col"], how="left",
                           indicator=True)
        ok = valid["_merge"] == "both"
        good = valid.loc[ok, ["table_id", "col", "row", "entity_uri"]]
        good["repaired"] = False
        broken = valid.loc[~ok, ["table_id", "col", "row", "entity_uri"]]
        if len(broken):
            cand = broken.merge(men_r, on=["table_id", "row"], how="left")
            cand = cand.merge(
                cell_r.rename(columns={"col": "fix_col"}),
                left_on=["table_id", "row", "mention"],
                right_on=["table_id", "row", "value"], how="left")
            cand = cand.sort_values(
                ["table_id", "row", "col", "fix_col"], kind="mergesort")
            cand = cand.drop_duplicates(["table_id", "row", "col",
                                         "entity_uri"])  # min fix_col
            fixed = cand["fix_col"].notna()
            cand.loc[fixed, "col"] = cand.loc[fixed, "fix_col"].astype("int32")
            cand["repaired"] = fixed
            broken = cand[["table_id", "col", "row", "entity_uri",
                           "repaired"]]
        out = pd.concat([good, broken], ignore_index=True)
        out["col"] = out["col"].astype("int32")
        out["row"] = out["row"].astype("int64")
        out["repaired"] = out["repaired"].astype(bool)
        return out

    return bucket_map_keyed(tagged, ["table_id", "row"], _repair,
                            num_buckets=num_buckets)
