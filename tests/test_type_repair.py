"""A5/A2/A3/A4 type-repair cascade unit tests (branch-by-branch, pure
Python on the pinned tables) + the M18 GT repair golden test."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from tabular_data_semantics_py_ray.constants import ENT, ONT
from tabular_data_semantics_py_ray.stages.type_repair import TypeRepair


def _e(n):
    return ENT + n


def _c(n):
    return ONT + n


class TestCascadeBranches:
    def setup_method(self):
        self.tr = TypeRepair()

    def test_lookup_compatible_ancestor(self):
        ts, strat = self.tr.repair(_e("Customer"))
        assert strat == "lookup"
        # seed {Party} + compatible endpoint Customer (descendant of Party)
        assert ts == sorted([_c("Party"), _c("Customer")])

    def test_lookup_conflict_keeps_seed_only(self):
        ts, strat = self.tr.repair(_e("Spark"))
        assert strat == "lookup"
        # endpoint Framework (Artifact branch) incompatible with Process
        assert ts == [_c("Process")]

    def test_lookup_fixpoint_transitive_admission(self):
        ts, strat = self.tr.repair(_e("Big_Party"))
        assert strat == "lookup"
        # Customer seed -> Party (ancestor) -> Supplier via ADDED Party
        assert ts == sorted([_c("Customer"), _c("Party"), _c("Supplier")])

    def test_predicate_strategy_range_only(self):
        ts, strat = self.tr.repair(_e("Join_Op"))
        assert strat == "predicate"
        assert ts == [_c("DBOperation")]

    def test_predicate_strategy_domain_admitted(self):
        ts, strat = self.tr.repair(_e("Hash_Op"))
        assert strat == "predicate"
        # range {DBOperation} + compatible domain {Process}
        assert ts == sorted([_c("DBOperation"), _c("Process")])

    def test_predicate_top2_truncation_and_tiebreak(self):
        ts, strat = self.tr.repair(_e("Query_Op"))
        assert strat == "predicate"
        # ranges DBOperation(5), Framework(4), Process(4): top-2 keeps
        # DBOperation + Framework (tie broken type-asc); endpoint-all
        # DBOperation unioned in
        assert ts == sorted([_c("DBOperation"), _c("Framework")])

    def test_having_gt3_drops_sparse_predicates(self):
        ts, strat = self.tr.repair(_e("Merge_Op"))
        assert strat == "endpoint"  # only 2 object statements: HAVING drops
        assert ts == [_c("DBOperation")]

    def test_endpoint_fallback(self):
        ts, strat = self.tr.repair(_e("Row_Struct"))
        assert strat == "endpoint"
        assert ts == [_c("RowStruct")]

    def test_crosskg_chain(self):
        ts, strat = self.tr.repair(_e("Fast_Entity"))
        assert strat == "wikidata"
        # equiv class DataStructure enters via REFLEXIVE subClassOf* closure
        assert ts == sorted(
            [_c("DataStructure"), _c("Artifact"), _c("Thing")])

    def test_crosskg_disambiguation_clears(self):
        ts, strat = self.tr.repair(_e("Slow_Entity"))
        assert ts == []
        assert strat == "none"


def test_gt_repair_golden(ray_session):
    from tabular_data_semantics_py_ray.pipelines.gt_repair import repair_cea_gt

    # table t1: 2x2 cells; GT row addressing col 5 is broken, its mention
    # 'beta' sits in col 1 -> repaired to col=1. GT row for t1 col 0 valid.
    # t2 broken with NO matching mention -> kept, repaired=False.
    gt = rd.from_arrow(pa.table({
        "table_id": ["t1", "t1", "t2"],
        "col": pa.array([0, 5, 7], type=pa.int32()),
        "row": pa.array([0, 1, 0], type=pa.int64()),
        "entity_uri": ["u1", "u2", "u3"],
    }))
    cells = rd.from_arrow(pa.table({
        "table_id": ["t1", "t1", "t1", "t1", "t2"],
        "col": pa.array([0, 1, 0, 1, 0], type=pa.int32()),
        "row": pa.array([0, 0, 1, 1, 0], type=pa.int64()),
        "value": ["alpha", "x", "y", "beta", "zzz"],
    }))
    mentions = rd.from_arrow(pa.table({
        "table_id": ["t1", "t2"],
        "row": pa.array([1, 0], type=pa.int64()),
        "mention": ["beta", "nomatch"],
    }))
    out = repair_cea_gt(gt, cells, mentions).to_pandas()
    out = out.sort_values(["table_id", "row"]).reset_index(drop=True)
    assert len(out) == 3
    r_valid = out[(out.table_id == "t1") & (out.row == 0)].iloc[0]
    assert r_valid.col == 0 and not r_valid.repaired
    r_fixed = out[(out.table_id == "t1") & (out.row == 1)].iloc[0]
    assert r_fixed.col == 1 and r_fixed.repaired
    r_stuck = out[out.table_id == "t2"].iloc[0]
    assert r_stuck.col == 7 and not r_stuck.repaired


def test_strategy_census_counts(ray_session):
    """G6 counters over a synthetic linked stream covering every branch."""
    from tabular_data_semantics_py_ray.stages.type_repair import strategy_census

    linked = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 1, 2, 2, 3],
        "entity_uri": [_e("Customer"), _e("Join_Op"), _e("Row_Struct"),
                       _e("Fast_Entity"), _e("Customer")],
    }))
    out = strategy_census(linked).to_pandas()
    got = dict(zip(out["strategy"], out["n_entities"]))
    assert got == {"lookup": 1, "predicate": 1, "endpoint": 1, "wikidata": 1}
