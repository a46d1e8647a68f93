"""Per-operator unit tests the reference lacks (SURVEY §5): voting
tie-break, most-specific-class, redirect closure, mention detection edge
cases, hashing determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tabular_data_semantics_py_ray.constants import ENT, ONT, SPAN_TOKENS
from tabular_data_semantics_py_ray import fixture_kg
from tabular_data_semantics_py_ray.schemas import DOCS_SCHEMA
from tabular_data_semantics_py_ray.stages.canonicalize import (
    most_specific_classes,
    resolve_alias_closure,
)
from tabular_data_semantics_py_ray.stages.interleave import spans_for_text
from tabular_data_semantics_py_ray.stages.linking import EntityLinker, LinkScore
from tabular_data_semantics_py_ray.stages.mention_detect import detect_mentions_batch
from tabular_data_semantics_py_ray.functions.hashing import (
    FastMinHasher,
    hamming64,
    jaccard,
    shingle_hashes,
    simhash64,
)


def _docs_table(rows):
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], type=pa.string()),
            pa.array([r[1] for r in rows], type=DOCS_SCHEMA.field("spans").type),
        ],
        schema=DOCS_SCHEMA,
    )


class TestInterleave:
    def test_empty_text_gives_no_spans(self):
        assert spans_for_text(1, "") == []

    def test_offsets_strictly_increasing(self):
        spans = spans_for_text(0, " ".join(["join"] * 40))
        offs = [s["offset"] for s in spans]
        assert offs == sorted(set(offs))

    def test_media_interleaving_rule(self):
        # doc 0: chunks 0,4,8,... get media (doc+i)%4==0
        spans = spans_for_text(0, " ".join(["x"] * (SPAN_TOKENS * 5)))
        kinds = [s["kind"] for s in spans]
        assert kinds == ["text", "image", "text", "text", "text", "text", "image"]
        media = [s for s in spans if s["kind"] != "text"]
        assert media[0]["media_ref"] == "media://0/0"

    def test_all_tokens_preserved(self):
        text = " ".join(f"t{i}" for i in range(30))
        spans = spans_for_text(7, text)
        rebuilt = " ".join(s["text"] for s in spans if s["kind"] == "text")
        assert rebuilt == text

    def test_vectorized_matches_scalar_reference(self):
        # the hot-path Arrow kernel must agree with the scalar rule on every
        # edge: empty text, chunk-boundary lengths, media modulo phases, and
        # doc_ids past the 6-digit pad width (bench replication offsets)
        import random

        from tabular_data_semantics_py_ray.stages.interleave import (
            interleave_batch,
            interleave_batch_rows,
        )

        rng = random.Random(13)
        vocab = ["join", "sort", "the", "order", "table", "dup"]
        ids, texts = [], []
        for i in range(200):
            ids.append(rng.choice([i, i + 3, i + 999_998, i + 10_000_000]))
            n = rng.choice([0, 1, SPAN_TOKENS - 1, SPAN_TOKENS, SPAN_TOKENS + 1,
                            4 * SPAN_TOKENS, 4 * SPAN_TOKENS + 1, 97])
            texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
        batch = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
        assert interleave_batch(batch).equals(interleave_batch_rows(batch))
        empty = batch.slice(0, 0)
        assert interleave_batch(empty).equals(interleave_batch_rows(empty))


class TestMentionDetect:
    def test_span_and_token_indices(self):
        spans = [
            {"kind": "text", "text": "the join table", "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": "media://1/0", "offset": 3},
            {"kind": "text", "text": "sort what merge", "media_ref": "", "offset": 4},
        ]
        out = detect_mentions_batch(_docs_table([("d1", spans)])).to_pandas()
        got = set(zip(out["span_idx"], out["tok_idx"], out["mention"]))
        # 'the' is a stopword; 'what' not in lexicon; media span skipped
        assert got == {(0, 1, "join"), (0, 2, "table"), (2, 0, "sort"), (2, 2, "merge")}

    def test_no_spans_row(self):
        out = detect_mentions_batch(_docs_table([("d0", [])]))
        assert out.num_rows == 0

    def test_sliced_batch_indices_correct(self):
        spans_a = [{"kind": "text", "text": "join", "media_ref": "", "offset": 0}]
        spans_b = [
            {"kind": "text", "text": "x y", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "merge sort", "media_ref": "", "offset": 2},
        ]
        t = _docs_table([("a", spans_a), ("b", spans_b)])
        sliced = t.slice(1, 1)  # only doc b
        out = detect_mentions_batch(sliced).to_pandas()
        got = set(zip(out["doc_id"], out["span_idx"], out["tok_idx"], out["mention"]))
        assert got == {("b", 1, 0, "merge"), ("b", 1, 1, "sort")}


def _mention_batch(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "span_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "tok_idx": pa.array([r[2] for r in rows], type=pa.int32()),
        "mention": pa.array([r[3] for r in rows], type=pa.string()),
    })


class TestLinking:
    def test_candidate_rank_order_and_topk(self):
        linker = EntityLinker(top_k=1)
        out = linker(_mention_batch([("d", 0, 0, "order")]))
        assert out.column("entity_uri").to_pylist() == [ENT + "Order_Commerce"]
        # rank-2 candidate is out of the top-1 window for an unambiguous form
        assert linker(_mention_batch([("d", 0, 0, "line")])).num_rows == 0

    def test_redirect_chain_two_hops(self):
        score = LinkScore()
        # Spark_Legacy -> Spark_Mid -> Spark resolved in 2 iterations
        assert score.canonical[ENT + "Spark_Legacy"] == ENT + "Spark"
        # rank-1 candidate of 'spark' is the redirect head; linker lands on
        # the canonical entity
        out = EntityLinker()(_mention_batch([("d", 0, 0, "spark")]))
        assert out.column("entity_uri").to_pylist() == [ENT + "Spark"]

    def test_disambiguation_page_skipped(self):
        out = EntityLinker()(_mention_batch([("d", 0, 0, "line")]))
        # rank-1 Line_Dab is a disambiguation page -> rank-2 Line_Item wins
        assert out.column("entity_uri").to_pylist() == [ENT + "Line_Item"]

    def test_one_link_per_occurrence(self):
        out = EntityLinker()(
            _mention_batch([("d", 0, 0, "table"), ("d", 0, 1, "table")]))
        assert out.num_rows == 2
        assert set(out.column("entity_uri").to_pylist()) == {
            ENT + "Table_Relation"}

    def test_unknown_mention_dropped_and_batch_columns_kept(self):
        out = EntityLinker()(
            _mention_batch([("d", 0, 0, "zzz-nolex"), ("d", 1, 2, "order")]))
        assert out.num_rows == 1
        assert out.column_names == [
            "doc_id", "span_idx", "tok_idx", "mention", "entity_uri"]
        assert out.column("span_idx").to_pylist() == [1]

    def test_projection(self):
        linker = EntityLinker(project=["doc_id", "entity_uri"])
        out = linker(_mention_batch([("d", 0, 0, "order")]))
        assert out.column_names == ["doc_id", "entity_uri"]


class TestCanonicalize:
    def test_most_specific_removes_agent_and_ancestors(self):
        anc = {
            ONT + "Customer": {ONT + "Party", ONT + "Agent", ONT + "Thing"},
            ONT + "Party": {ONT + "Agent", ONT + "Thing"},
        }
        got = most_specific_classes(
            {ONT + "Customer", ONT + "Party", ONT + "Agent"}, anc
        )
        assert got == {ONT + "Customer"}

    def test_alias_closure_sameas_min_uri(self):
        df = resolve_alias_closure(fixture_kg.alias_edges_df())
        m = dict(zip(df["uri"], df["canonical"]))
        assert m[ENT + "Spark_Legacy"] == ENT + "Spark"
        assert m[ENT + "Spark_Mid"] == ENT + "Spark"
        # sameas pair Agg_Op ~ Aggregate_Op: canonical = min (Agg_Op)
        assert m[ENT + "Aggregate_Op"] == ENT + "Agg_Op"

    def test_class_closure_distances(self):
        df = fixture_kg.class_closure_df()
        row = df[(df["cls_uri"] == ONT + "Customer")
                 & (df["ancestor_uri"] == ONT + "Thing")]
        assert list(row["distance"]) == [3]  # Customer->Party->Agent->Thing


class TestHashing:
    def test_minhash_similar_sets_share_signature(self):
        mh = FastMinHasher()
        a = shingle_hashes(["a", "b", "c", "d", "e", "f"] * 5)
        b = shingle_hashes(["a", "b", "c", "d", "e", "f"] * 5 + ["z"])
        sa, sb = mh.signature(a), mh.signature(b)
        agree = (sa == sb).mean()
        assert agree > 0.5

    def test_signature_deterministic(self):
        mh1, mh2 = FastMinHasher(), FastMinHasher()
        h = shingle_hashes(["x", "y", "z", "w"])
        assert (mh1.signature(h) == mh2.signature(h)).all()

    def test_simhash_near_vs_far(self):
        base = ["join", "sort", "merge", "scan"] * 10
        near = base + ["dup"]
        far = ["alpha", "beta", "gamma", "delta"] * 10
        h0 = np.array([simhash64(base)], dtype=np.uint64)
        hn = np.array([simhash64(near)], dtype=np.uint64)
        hf = np.array([simhash64(far)], dtype=np.uint64)
        assert hamming64(h0, hn)[0] < hamming64(h0, hf)[0]

    def test_jaccard_exact(self):
        a = np.array([1, 2, 3, 4], dtype=np.uint64)
        b = np.array([3, 4, 5, 6], dtype=np.uint64)
        assert jaccard(a, b) == pytest.approx(2 / 6)
