"""Named query registry: one callable per implemented operator/pipeline
(SURVEY §2 coverage). Each takes ``sf_dir`` and returns a Ray Dataset /
pandas DataFrame. Ray is initialised by the caller (driver / tests / bench);
nothing here calls ray.init().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import ray.data as rd

from .util import fanout_blocks


def _documents(sf_dir: str):
    # testdata parquet carries ONE row group, which Ray cannot split at
    # read time — every downstream task stage would run at parallelism 1.
    # A shuffle-free repartition right after the read fans the corpus out;
    # guarded so a many-file corpus keeps its natural per-file blocks
    # (repartitioning DOWN coalesces into giant multi-chunk blocks).
    from .util import guarded_fanout, read_parquet_clean

    path = os.path.join(sf_dir, "documents.parquet")
    return guarded_fanout(
        read_parquet_clean(path, columns=["doc_id", "text"]),
        path, fanout_blocks())


def _embeddings(sf_dir: str):
    from .util import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))


def _query_vectors(sf_dir: str, n: int = 8):
    """The n query vectors, via predicate + column pushdown — only the
    matching row groups/columns leave storage (never the whole table)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n)],
    )
    return t.to_pandas().reset_index(drop=True)


# ---- query callables -------------------------------------------------------

def q_kg_cea_link(sf_dir: str):
    from .pipelines.queries_kg import cea_link

    return cea_link(sf_dir)


def q_kg_cell_norm_link(sf_dir: str):
    from .pipelines.queries_kg import cell_norm_link

    return cell_norm_link(sf_dir)


def q_kg_cta_doc_type(sf_dir: str):
    from .pipelines.queries_kg import cta_doc_type

    return cta_doc_type(sf_dir)


def q_kg_cta_ancestors(sf_dir: str):
    from .pipelines.queries_kg import cta_type_ancestors

    return cta_type_ancestors(sf_dir)


def q_kg_bfs_distances(sf_dir: str):
    """BFS distances from the min-node seed over the undirected entity
    graph: per-level join + distinct + anti-join frontier loop."""
    from .pipelines.queries_kg import kg_bfs_distances

    return kg_bfs_distances(sf_dir)


def q_kg_entity_pmi(sf_dir: str):
    """Entity co-occurrence PMI (CPA relation strength): marginals
    attach via two hash-partitioned joins — never a driver merge."""
    from .pipelines.queries_kg import kg_entity_pmi

    return kg_entity_pmi(sf_dir)


def q_kg_symmetry_census(sf_dir: str):
    """Empirical predicate-symmetry census (missing-axiom / dirty-data
    QA): unordered-pair shuffle + predicate-sized aggregate."""
    from .pipelines.queries_kg import kg_symmetry_census

    return kg_symmetry_census(sf_dir)


def q_kg_prop_cardinality(sf_dir: str):
    """Per-predicate cardinality profile (functional-ness QA): one
    (pred, subj) combiner count + predicate-sized second aggregate."""
    from .pipelines.queries_kg import kg_prop_cardinality

    return kg_prop_cardinality(sf_dir)


def q_kg_cta_confidence(sf_dir: str):
    """CTA winner with vote share (annotation-confidence report): one
    doc-keyed shuffle, winner + totals vectorized per bucket."""
    from .pipelines.queries_kg import kg_cta_confidence

    return kg_cta_confidence(sf_dir)


def q_kg_components(sf_dir: str):
    """Weakly-connected components of the KG entity graph (graph-QA
    census): single-task union-find up to 50M edges, string hash-to-min
    label propagation beyond."""
    from .pipelines.queries_kg import kg_components

    return kg_components(sf_dir)


def q_kg_pagerank_personalized(sf_dir: str):
    """Personalized PageRank from the min-node seed (random walk with
    restart); same routing as kg_pagerank."""
    from .pipelines.queries_kg import pagerank_personalized

    return pagerank_personalized(sf_dir)


def q_kg_mention_coverage(sf_dir: str):
    """Per-doc linkable-mention coverage (CEA yield report): zero
    shuffles, batch-local token + lexicon-membership counters."""
    from .pipelines.queries_kg import kg_mention_coverage

    return kg_mention_coverage(sf_dir)


def q_kg_ambiguity_census(sf_dir: str):
    """Surface-form ambiguity x corpus frequency (CEA difficulty report):
    one mention-keyed combiner count + lexicon fan-out on result rows."""
    from .pipelines.queries_kg import kg_ambiguity_census

    return kg_ambiguity_census(sf_dir)


def q_kg_type_pmi(sf_dir: str):
    """Type co-occurrence PMI over linked docs (relation-discovery
    signal): doc-keyed pair expansion + combiner counts; PMI arithmetic
    on type-pair-bounded result rows."""
    from .pipelines.queries_kg import kg_type_pmi

    return kg_type_pmi(sf_dir)


def q_kg_cpa_cooccur(sf_dir: str):
    from .pipelines.queries_kg import cpa_cooccur

    return cpa_cooccur(sf_dir)


def q_kg_cpa_relation(sf_dir: str):
    from .pipelines.queries_kg import cpa_relation

    return cpa_relation(sf_dir)


def q_kg_fuzzy_match(sf_dir: str):
    from .pipelines.queries_kg import fuzzy_entity_match

    return fuzzy_entity_match(sf_dir)


def q_kg_triples(sf_dir: str):
    from .pipelines.kg_pipeline import build_triples

    return build_triples(sf_dir)


def q_kg_alias_canonical(sf_dir: str):
    from .pipelines.queries_kg import alias_canonical_map

    return alias_canonical_map(sf_dir)


def q_tab2rdf_nation(sf_dir: str):
    from .pipelines.tabular2rdf import nation_to_rdf

    return nation_to_rdf(sf_dir)


def q_tab2rdf_region(sf_dir: str):
    from .pipelines.tabular2rdf import region_to_rdf

    return region_to_rdf(sf_dir)


def q_q1_pricing(sf_dir: str):
    from .pipelines.relational import q1_pricing

    return q1_pricing(sf_dir)


def q_revenue_by_nation(sf_dir: str):
    from .pipelines.relational import revenue_by_nation

    return revenue_by_nation(sf_dir)


def q_top_parts_by_revenue(sf_dir: str):
    from .pipelines.relational import top_parts_by_revenue

    return top_parts_by_revenue(sf_dir)


def q_events_sliding_1h15m(sf_dir: str):
    from .pipelines.relational import events_sliding_1h15m

    return events_sliding_1h15m(sf_dir)


def q_events_asof_order(sf_dir: str):
    from .pipelines.relational import events_last_order_asof

    return events_last_order_asof(sf_dir)


def q_events_by_type(sf_dir: str):
    from .pipelines.relational import events_by_type

    return events_by_type(sf_dir)


def q_token_freq_top20(sf_dir: str):
    from .pipelines.relational import token_freq_topk

    return token_freq_topk(sf_dir, k=20)


def q_doc_text_stats(sf_dir: str):
    from .functions.textstats import text_stats_batch

    return _documents(sf_dir).map_batches(text_stats_batch, batch_format="pyarrow")


def q_doc_token_bpe(sf_dir: str):
    from .functions.textstats import token_bpe_batch

    return _documents(sf_dir).map_batches(token_bpe_batch, batch_format="pyarrow")


def q_lang_id(sf_dir: str):
    from .functions.textstats import lang_id_batch

    return _documents(sf_dir).map_batches(lang_id_batch, batch_format="pyarrow")


def q_doc_fingerprint(sf_dir: str):
    from .functions.textstats import fingerprint_batch

    return _documents(sf_dir).map_batches(fingerprint_batch, batch_format="pyarrow")


def q_dedup_exact(sf_dir: str):
    from .stages.dedup import exact_dedup_groups

    return exact_dedup_groups(_documents(sf_dir))


def q_dedup_near_pairs(sf_dir: str):
    from .stages.dedup import near_dup_pairs_minhash

    return near_dup_pairs_minhash(_documents(sf_dir))


def q_dedup_ngram_jaccard(sf_dir: str):
    """n-gram Jaccard near-dup: rare-shingle inverted-index candidates
    (df <= 64 stop-shingle cap), exact-Jaccard verification over the full
    shingle sets. Deterministic recall (no MinHash probability bound)."""
    from .stages.dedup import near_dup_pairs_ngram

    return near_dup_pairs_ngram(_documents(sf_dir))


def q_dedup_span_frac(sf_dir: str):
    """Cross-doc duplicated-span coverage (exact-substring-dedup signal):
    per doc, the fraction of 8-gram positions whose gram occurs in >= 2
    distinct documents."""
    from .stages.dedup import dup_span_census

    return dup_span_census(_documents(sf_dir))


def q_dedup_span_remove(sf_dir: str):
    """Exact substring dedup with span removal (Lee et al. 2022): rewrite
    every document with its cross-document duplicated 8-gram spans
    dropped."""
    from .stages.dedup import remove_dup_spans

    return remove_dup_spans(_documents(sf_dir))


def q_dedup_components(sf_dir: str):
    """Dup-cluster assignment: connected components over the verified
    near-dup pair graph; component_id = min reachable doc_id."""
    from .stages.dedup import dedup_components, near_dup_pairs_minhash

    return dedup_components(near_dup_pairs_minhash(_documents(sf_dir)))


def q_dedup_keep(sf_dir: str):
    """The deduped corpus: documents minus near-dup non-keepers. Chains
    minhash near-dup pairs -> connected components -> anti-join (each dup
    cluster keeps only its min doc_id) — the end-to-end 'dedup a training
    corpus' pipeline. Both sides of the anti-join are hash-partitioned;
    the components side is edge-bounded (docs in at least one dup pair)."""
    import pyarrow.compute as pc

    from .stages.dedup import dedup_components, near_dup_pairs_minhash
    from .util import bucket_anti_join

    comp = dedup_components(near_dup_pairs_minhash(_documents(sf_dir)))
    drop = comp.map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column("doc_id"), t.column("component_id"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    docs = _documents(sf_dir).select_columns(["doc_id"])
    return bucket_anti_join(docs, drop, key="doc_id")


def q_dedup_simhash(sf_dir: str):
    from .stages.dedup import near_dup_pairs_simhash

    return near_dup_pairs_simhash(_documents(sf_dir))


def q_ann_topk(sf_dir: str):
    from .stages.similarity import ann_topk

    out = ann_topk(_embeddings(sf_dir), _query_vectors(sf_dir), k=10)
    # rename via map_batches: Ray's Project op chokes on pandas blocks
    return out.map_batches(
        lambda b: b.rename(columns={"rank": "knn_rank"}), batch_format="pandas"
    )


def q_ann_topk_ivf_full(sf_dir: str):
    """IVF probing run at nprobe == n_clusters: exhaustive probe, so the
    output is EXACT and oracle-comparable against the brute-force SQL —
    the correctness gate for the whole IVF machinery (centroid fit, cell
    assignment, probe masking, partial-top-k reduce). Partial-probe recall
    is pytest-covered (`test_similarity.py`)."""
    from .stages.similarity import ann_topk_ivf

    out = ann_topk_ivf(_embeddings(sf_dir), _query_vectors(sf_dir), k=10,
                       n_clusters=16, nprobe=16)
    return out.map_batches(
        lambda b: b.rename(columns={"rank": "knn_rank"}), batch_format="pandas"
    )


def q_emb_near_pairs(sf_dir: str):
    """Exact embedding-cosine pair join (block-partitioned all-pairs)."""
    from .stages.dedup import near_dup_pairs_exact_embedding

    return near_dup_pairs_exact_embedding(_embeddings(sf_dir), threshold=0.4)


def q_ann_label_vote(sf_dir: str):
    from .stages.similarity import ann_label_vote

    return ann_label_vote(_embeddings(sf_dir), _query_vectors(sf_dir), k=10)


def q_kg_pred_census(sf_dir: str):
    from .pipelines.queries_kg import pred_census

    return pred_census(sf_dir)


def q_kg_neighborhood_topk(sf_dir: str):
    from .pipelines.queries_kg import neighborhood_topk

    return neighborhood_topk(sf_dir, k=5)


def q_kg_doc_most_specific(sf_dir: str):
    from .pipelines.queries_kg import doc_most_specific_types

    return doc_most_specific_types(sf_dir)


def q_events_sessionize(sf_dir: str):
    from .pipelines.relational import events_sessionize

    return events_sessionize(sf_dir)


def q_events_tumbling_1h(sf_dir: str):
    from .pipelines.relational import events_tumbling_1h

    return events_tumbling_1h(sf_dir)


def q_emb_label_stats(sf_dir: str):
    from .pipelines.relational import embedding_label_stats

    return embedding_label_stats(sf_dir)


def q_orders_ship_window(sf_dir: str):
    from .pipelines.relational import orders_ship_window

    return orders_ship_window(sf_dir)


def q_doc_tfidf_top5(sf_dir: str):
    from .pipelines.relational import doc_tfidf_topk

    return doc_tfidf_topk(sf_dir)


def q_user_cohorts(sf_dir: str):
    from .pipelines.relational import user_cohorts

    return user_cohorts(sf_dir)


def q_kg_pagerank(sf_dir: str):
    from .pipelines.queries_kg import pagerank

    return pagerank(sf_dir)


def q_kg_triangles(sf_dir: str):
    from .pipelines.queries_kg import triangle_census

    return triangle_census(sf_dir)


def q_doc_unigram_logprob(sf_dir: str):
    from .pipelines.relational import doc_unigram_logprob

    return doc_unigram_logprob(sf_dir)


def q_doc_top_bigram_frac(sf_dir: str):
    from .pipelines.relational import doc_top_bigram_frac

    return doc_top_bigram_frac(sf_dir)


def q_emb_dedup_keep(sf_dir: str):
    """Semantic dedup (SemDeDup shape): embedding-cosine near-dup pairs ->
    connected components -> keep each cluster's min vec_id; output is the
    deduped embedding-id set. Pairs come from the exact block-partitioned
    join at this scale; at 100 TB swap in the hyperplane-LSH candidate path
    (``near_dup_pairs_embedding``) — the downstream components / anti-join
    machinery is identical."""
    import pyarrow.compute as pc

    from .stages.dedup import dedup_components, near_dup_pairs_exact_embedding
    from .util import bucket_anti_join

    pairs = near_dup_pairs_exact_embedding(_embeddings(sf_dir), threshold=0.4)
    pairs = pairs.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "cosine"]),
        batch_format="pyarrow")
    comp = dedup_components(pairs)
    drop = comp.map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column("doc_id"), t.column("component_id"))
        ).select(["doc_id"]),
        batch_format="pyarrow")
    vecs = _embeddings(sf_dir).select_columns(["vec_id"])
    return bucket_anti_join(vecs, drop, key="vec_id", right_key="doc_id")


def q_repeated_ngram_census(sf_dir: str):
    from .pipelines.relational import repeated_ngram_census

    return repeated_ngram_census(sf_dir)


def q_emb_label_centroids(sf_dir: str):
    from .pipelines.relational import emb_label_centroids

    return emb_label_centroids(sf_dir)


def q_quality_filter_census(sf_dir: str):
    from .pipelines.relational import quality_filter_census

    return quality_filter_census(sf_dir)


def q_inverted_index(sf_dir: str):
    from .pipelines.relational import inverted_index

    return inverted_index(sf_dir)


def q_split_assign(sf_dir: str):
    from .pipelines.relational import split_assign

    return split_assign(sf_dir)


def q_stratified_sample(sf_dir: str):
    from .pipelines.relational import stratified_sample

    return stratified_sample(sf_dir)


def q_events_lag_features(sf_dir: str):
    from .pipelines.relational import events_lag_features

    return events_lag_features(sf_dir)


def q_events_funnel(sf_dir: str):
    from .pipelines.relational import events_funnel

    return events_funnel(sf_dir)


def q_profile_orders(sf_dir: str):
    from .pipelines.relational import profile_table

    return profile_table(sf_dir, "orders")


def q_contamination_8gram(sf_dir: str):
    from .pipelines.relational import contamination_ngram

    return contamination_ngram(sf_dir)


def q_doc_len_quantiles(sf_dir: str):
    from .pipelines.relational import doc_len_quantiles

    return doc_len_quantiles(sf_dir)


def q_doc_pack_assign(sf_dir: str):
    from .pipelines.relational import pack_assign

    return pack_assign(sf_dir)


def q_emb_kmeans_assign(sf_dir: str):
    from .pipelines.relational import emb_kmeans_assign

    return emb_kmeans_assign(sf_dir)


def q_orders_segment_semijoin(sf_dir: str):
    from .pipelines.relational import orders_segment_semijoin

    return orders_segment_semijoin(sf_dir)


def q_bigram_pmi(sf_dir: str):
    from .pipelines.relational import bigram_pmi

    return bigram_pmi(sf_dir)


def q_events_daily_active(sf_dir: str):
    from .pipelines.relational import events_daily_active

    return events_daily_active(sf_dir)


def q_mixture_oversample(sf_dir: str):
    from .pipelines.relational import mixture_oversample

    return mixture_oversample(sf_dir)


def q_events_decay(sf_dir: str):
    from .pipelines.relational import events_decay

    return events_decay(sf_dir)


def q_events_hourly_zscore(sf_dir: str):
    from .pipelines.relational import events_hourly_zscore

    return events_hourly_zscore(sf_dir)


def q_media_captions(sf_dir: str):
    from .pipelines.relational import media_captions

    return media_captions(sf_dir)


def q_lang_confusion(sf_dir: str):
    from .pipelines.relational import lang_confusion

    return lang_confusion(sf_dir)


def q_curate_corpus(sf_dir: str):
    from .pipelines.relational import curate_corpus

    return curate_corpus(sf_dir)


def q_q3_shipping(sf_dir: str):
    from .pipelines.relational import q3_shipping

    return q3_shipping(sf_dir)


def q_customer_orders_left(sf_dir: str):
    from .pipelines.relational import customer_orders_left

    return customer_orders_left(sf_dir)


def q_daily_activity_full(sf_dir: str):
    from .pipelines.relational import daily_activity_full

    return daily_activity_full(sf_dir)


def q_orders_scd2(sf_dir: str):
    from .pipelines.relational import orders_scd2

    return orders_scd2(sf_dir)


def q_contrastive_negatives(sf_dir: str):
    from .pipelines.relational import contrastive_negatives

    return contrastive_negatives(sf_dir)


def q_orders_segment_salted(sf_dir: str):
    from .pipelines.relational import orders_segment_salted

    return orders_segment_salted(sf_dir)


def q_part_type_supplier_census(sf_dir: str):
    from .pipelines.relational import part_type_supplier_census

    return part_type_supplier_census(sf_dir)


def q_part_top_supplier(sf_dir: str):
    from .pipelines.relational import part_top_supplier

    return part_top_supplier(sf_dir)


def q_orders_per_customer_census(sf_dir: str):
    from .pipelines.relational import orders_per_customer_census

    return orders_per_customer_census(sf_dir)


def q_events_item_cvr(sf_dir: str):
    from .pipelines.relational import events_item_cvr

    return events_item_cvr(sf_dir)


def q_user_journey_report(sf_dir: str):
    from .pipelines.relational import user_journey_report

    return user_journey_report(sf_dir)


def q_source_lang_entropy(sf_dir: str):
    from .pipelines.relational import source_lang_entropy

    return source_lang_entropy(sf_dir)


def q_kg_type_by_source(sf_dir: str):
    from .pipelines.queries_kg import type_by_source

    return type_by_source(sf_dir)


def q_events_weekly_active(sf_dir: str):
    from .pipelines.relational import events_weekly_active

    return events_weekly_active(sf_dir)


def q_events_item_sim(sf_dir: str):
    from .pipelines.relational import events_item_sim

    return events_item_sim(sf_dir)


def q_kg_degree_census(sf_dir: str):
    from .pipelines.queries_kg import degree_census

    return degree_census(sf_dir)


def q_kg_related_docs(sf_dir: str):
    from .pipelines.queries_kg import related_docs

    return related_docs(sf_dir)


def q_revenue_share(sf_dir: str):
    from .pipelines.relational import revenue_share

    return revenue_share(sf_dir)


def q_events_item_cooccur(sf_dir: str):
    from .pipelines.relational import events_item_cooccur

    return events_item_cooccur(sf_dir)


def q_kg_entity_salience(sf_dir: str):
    from .pipelines.queries_kg import entity_salience

    return entity_salience(sf_dir)


def q_orders_checksum(sf_dir: str):
    from .pipelines.relational import orders_checksum

    return orders_checksum(sf_dir)


def q_media_pack_assign(sf_dir: str):
    from .pipelines.relational import media_pack_assign

    return media_pack_assign(sf_dir)


def q_split_leakfree(sf_dir: str):
    from .pipelines.relational import split_leakfree

    return split_leakfree(sf_dir)


def q_events_trend_slope(sf_dir: str):
    from .pipelines.relational import events_trend_slope

    return events_trend_slope(sf_dir)


def q_events_value_psi(sf_dir: str):
    from .pipelines.relational import events_value_psi

    return events_value_psi(sf_dir)


def q_knn_mutual(sf_dir: str):
    from .stages.similarity import knn_mutual_pairs

    return knn_mutual_pairs(_embeddings(sf_dir), k=5)


def q_events_transition_census(sf_dir: str):
    from .pipelines.relational import events_transition_census

    return events_transition_census(sf_dir)


def q_doc_len_decile(sf_dir: str):
    from .pipelines.relational import doc_len_decile

    return doc_len_decile(sf_dir)


def q_emb_kmeans_train(sf_dir: str):
    from .stages.similarity import emb_kmeans_train

    return emb_kmeans_train(_embeddings(sf_dir), iters=3)


def q_knn_graph(sf_dir: str):
    from .stages.similarity import knn_graph

    return knn_graph(_embeddings(sf_dir), k=5)


def q_knn_graph_ivf(sf_dir: str):
    """IVF-bucketed kNN graph run at nprobe == n_clusters: every query
    probes every cell, so the output is EXACT and oracle-comparable
    against the brute-force kNN-graph SQL — the correctness gate for the
    cell-emit / shuffle / tile-scoring machinery (the scale path
    ``knn_mutual_pairs(method='auto')`` routes big corpora through).
    Partial-probe recall is pytest-covered (test_similarity.py)."""
    from .stages.similarity import knn_graph_ivf

    return knn_graph_ivf(_embeddings(sf_dir), k=5, n_clusters=8, nprobe=8)


def q_kg_closure_compute(sf_dir: str):
    from .pipelines.queries_kg import class_closure_compute

    return class_closure_compute(sf_dir)


def q_orders_snapshot_diff(sf_dir: str):
    from .pipelines.relational import orders_snapshot_diff

    return orders_snapshot_diff(sf_dir)


def q_events_attribution(sf_dir: str):
    from .pipelines.relational import events_attribution

    return events_attribution(sf_dir)


def q_contamination_near_dup(sf_dir: str):
    from .pipelines.relational import contamination_near_dup

    return contamination_near_dup(sf_dir)


def q_ann_topk_pq(sf_dir: str):
    from .stages.similarity import ann_topk_pq

    return ann_topk_pq(_embeddings(sf_dir), _query_vectors(sf_dir), k=10)


def q_doc_len_norm(sf_dir: str):
    from .pipelines.relational import doc_len_norm

    return doc_len_norm(sf_dir)


def q_doc_shuffle_rank(sf_dir: str):
    from .pipelines.relational import doc_shuffle_rank

    return doc_shuffle_rank(sf_dir)


def q_doc_scrub_pii(sf_dir: str):
    """PII redaction pass: email/phone-shaped substrings replaced with
    placeholder tokens, per-doc redaction counts; zero shuffles."""
    from .pipelines.relational import doc_scrub_pii

    return doc_scrub_pii(sf_dir)


def q_source_temperature_mix(sf_dir: str):
    """Temperature-scaled source sampling weights (p_s ~ n_s^0.5):
    one source-sized aggregate, result-row arithmetic."""
    from .pipelines.relational import source_temperature_mix

    return source_temperature_mix(sf_dir)


def q_orders_topn_per_customer(sf_dir: str):
    """Per-key rank window (ROW_NUMBER family): top-3 orders per customer
    with explicit rank; combiner-first top-n, one key shuffle."""
    from .pipelines.relational import orders_topn_per_customer

    return orders_topn_per_customer(sf_dir)


def q_doc_pack_census(sf_dir: str):
    """Packing-quality census: per training sequence, docs starting in it
    and docs crossing its right boundary (attention-contamination sites)."""
    from .pipelines.relational import doc_pack_census

    return doc_pack_census(sf_dir)


def q_dedup_cluster_census(sf_dir: str):
    """Dup-cluster size histogram over the near-dup components — the 'how
    much of my corpus is duplicated, and in how big clumps' report."""
    from .stages.dedup import (dedup_cluster_census, dedup_components,
                               near_dup_pairs_minhash)

    return dedup_cluster_census(
        dedup_components(near_dup_pairs_minhash(_documents(sf_dir))))


def q_dedup_jaccard_histogram(sf_dir: str):
    """Near-dup similarity histogram at 0.05 resolution (threshold
    tuning): deterministic ngram path at t=0.5 + pair-bounded count."""
    from .pipelines.relational import dedup_jaccard_histogram

    return dedup_jaccard_histogram(sf_dir)


def q_customer_rfm(sf_dir: str):
    """Customer RFM segmentation block (recency/frequency/monetary +
    quintile scores): one customer combiner aggregate, three bounded
    histogram threshold reads, shuffle-free score map."""
    from .pipelines.relational import customer_rfm

    return customer_rfm(sf_dir)


def q_events_bounce_rate(sf_dir: str):
    """Per-day single-event-session share (30-min session rule): the
    sessionizer shuffle emitting date-bounded partials."""
    from .pipelines.relational import events_bounce_rate

    return events_bounce_rate(sf_dir)


def q_orders_interarrival(sf_dir: str):
    """Per-customer mean reorder gap in days: one customer-keyed shuffle,
    vectorized per-segment diffs."""
    from .pipelines.relational import orders_interarrival

    return orders_interarrival(sf_dir)


def q_split_balance_psi(sf_dir: str):
    """Split-balance PSI (train vs test doc-length distribution): one
    combiner count, PSI terms on the bucket-sized result."""
    from .pipelines.relational import split_balance_psi

    return split_balance_psi(sf_dir)


def q_events_user_lifespan(sf_dir: str):
    """Per-user lifecycle block (first/last ts, span, active days,
    density): distinct (user, day) partials + one user-keyed aggregate."""
    from .pipelines.relational import events_user_lifespan

    return events_user_lifespan(sf_dir)


def q_token_zipf_slope(sf_dir: str):
    """Zipf slope over the top-100 token frequencies: combiner count +
    sort/limit; regression on k result rows."""
    from .pipelines.relational import token_zipf_slope

    return token_zipf_slope(sf_dir)


def q_events_user_entropy(sf_dir: str):
    """Per-user event-type entropy (behavioral diversity): one keyed
    combiner count, per-user vectorized entropy."""
    from .pipelines.relational import events_user_entropy

    return events_user_entropy(sf_dir)


def q_orders_key_skew(sf_dir: str):
    """Key-skew census (log2 buckets of per-customer counts): one key
    combiner count + a bucket-sized second aggregate."""
    from .pipelines.relational import orders_key_skew

    return orders_key_skew(sf_dir)


def q_events_stickiness(sf_dir: str):
    """DAU/WAU stickiness per day: result-row join of the two distinct
    censuses."""
    from .pipelines.relational import events_stickiness

    return events_stickiness(sf_dir)


def q_dedup_rate_by_source(sf_dir: str):
    """Near-dup drop rate per provenance source: non-keeper ids left-join
    the (doc_id, source) projection, census fused into the join."""
    from .pipelines.relational import dedup_rate_by_source

    return dedup_rate_by_source(sf_dir)


def q_lang_token_fertility(sf_dir: str):
    """Tokenizer fertility per language (BPE-ish / whitespace token
    ratio): per-batch partial sums, one |langs|-sized aggregate."""
    from .pipelines.relational import lang_token_fertility

    return lang_token_fertility(sf_dir)


def q_split_contamination(sf_dir: str):
    """Cross-split verbatim-leakage audit: train docs sharing an 8-gram
    with the test split; test grams broadcast, train scanned shuffle-free."""
    from .pipelines.relational import split_contamination

    return split_contamination(sf_dir)


def q_events_value_histogram(sf_dir: str):
    """Equi-width value histogram per event type: per-batch partial
    counts, one tiny keyed aggregate."""
    from .pipelines.relational import events_value_histogram

    return events_value_histogram(sf_dir)


def q_emb_pq_distortion(sf_dir: str):
    """PQ reconstruction-error census per label (codec QA for the ADC
    ANN path): codebook reduce + one shuffle-free error scan."""
    from .stages.similarity import pq_distortion

    return pq_distortion(_embeddings(sf_dir))


def q_emb_quantize_census(sf_dir: str):
    """Int8 scale-quantization reconstruction-error census per label:
    d-row min/max reduce + broadcast, label-keyed combiner partials."""
    from .pipelines.relational import emb_quantize_census

    return emb_quantize_census(sf_dir)


def q_doc_ngram_entropy(sf_dir: str):
    """Per-doc trigram Shannon entropy (repetition-aware quality signal):
    zero shuffles, batch-local vectorized counts."""
    from .pipelines.relational import doc_ngram_entropy

    return doc_ngram_entropy(sf_dir)


def q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary-growth census: new-token count + cumulative
    vocab size per doc-id range (min-doc_id first-occurrence attribution);
    vocab-sized combiner + one token-keyed aggregate."""
    from .pipelines.relational import vocab_growth

    return vocab_growth(sf_dir)


def q_weighted_sample(sf_dir: str):
    """Weight-proportional sample without replacement (A-ES keys over
    deterministic md5 uniforms, weight = n_chars): zero-shuffle
    per-block partial top-k + one tiny final reduce."""
    from .pipelines.relational import weighted_sample

    return weighted_sample(sf_dir)


def q_dedup_prefix_contain(sf_dir: str):
    from .stages.dedup import prefix_contain_pairs

    return prefix_contain_pairs(_documents(sf_dir))


def q_kg_fuzzy_edit(sf_dir: str):
    from .pipelines.queries_kg import fuzzy_match_edit

    return fuzzy_match_edit(sf_dir)


def q_events_props_stats(sf_dir: str):
    from .pipelines.relational import events_props_stats

    return events_props_stats(sf_dir)


def q_events_rolling_7d(sf_dir: str):
    from .pipelines.relational import events_rolling_7d

    return events_rolling_7d(sf_dir)


def q_doc_chunk(sf_dir: str):
    from .pipelines.relational import doc_chunk

    return doc_chunk(sf_dir)


def q_pivot_lang_source(sf_dir: str):
    from .pipelines.relational import pivot_lang_source

    return pivot_lang_source(sf_dir)


def q_orders_upsert(sf_dir: str):
    from .pipelines.relational import orders_upsert

    return orders_upsert(sf_dir)


def q_doc_len_percentile(sf_dir: str):
    from .pipelines.relational import doc_len_percentile

    return doc_len_percentile(sf_dir)


def q_token_cms_counts(sf_dir: str):
    from .pipelines.relational import token_cms_counts

    return token_cms_counts(sf_dir)


def q_orders_rollup(sf_dir: str):
    from .pipelines.relational import orders_rollup

    return orders_rollup(sf_dir)


def q_events_hll_users(sf_dir: str):
    from .pipelines.relational import events_hll_users

    return events_hll_users(sf_dir)


def q_dedup_exact_indexed(sf_dir: str):
    from .pipelines.relational import _read
    from .stages.shared_index import exact_dedup_groups_indexed
    from .util import fanout_blocks

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=fanout_blocks(0.5))
    return exact_dedup_groups_indexed(docs)


def q_kg_typed_repair(sf_dir: str):
    from .pipelines.queries_kg import _linked_flat
    from .stages.type_repair import typed_repair

    return typed_repair(_linked_flat(sf_dir))


def q_kg_strategy_census(sf_dir: str):
    from .pipelines.queries_kg import _linked_flat
    from .stages.type_repair import strategy_census

    return strategy_census(_linked_flat(sf_dir))


def q_kg_docs_without_customer(sf_dir: str):
    from .pipelines.queries_kg import docs_without_customer

    return docs_without_customer(sf_dir)


def q_media_frames(sf_dir: str):
    from .pipelines.queries_kg import media_frames

    return media_frames(sf_dir)


def q_media_resize(sf_dir: str):
    from .pipelines.queries_kg import media_resize

    return media_resize(sf_dir)


def q_kg_gt_repair(sf_dir: str):
    from .pipelines.queries_kg import gt_repair_customer

    return gt_repair_customer(sf_dir)


def q_kg_prop_kind(sf_dir: str):
    from .pipelines.queries_kg import prop_kind

    return prop_kind(sf_dir)


def q_kg_depth_stats(sf_dir: str):
    from .pipelines.queries_kg import depth_stats

    return depth_stats(sf_dir)


def q_kg_class_sample(sf_dir: str):
    from .pipelines.queries_kg import class_sample

    return class_sample(sf_dir, k=3)


def q_kg_class_confirm(sf_dir: str):
    from .pipelines.queries_kg import class_confirm

    return class_confirm(sf_dir, k=3)


def q_kg_projection(sf_dir: str):
    """A10 ontology projection (offline prep artifact; sf-independent)."""
    from .pipelines.prep import project_ontology

    return rd.from_arrow(project_ontology())


def q_media_manifest(sf_dir: str):
    from .pipelines.queries_kg import media_manifest

    return media_manifest(sf_dir)


def q_media_features(sf_dir: str):
    from .pipelines.queries_kg import media_features

    return media_features(sf_dir)


# ---- real-KG ingestion (RDF dump -> backend tables; round 3) --------------

def q_kg_ingest_lexicon(sf_dir: str):
    """Distributed N-Triples parse of the deterministic ~1MB dump ->
    lexical index (surface_form, entity_uri, rank). The dump is the KG,
    corpus-independent; sf_dir is unused (uniform query signature)."""
    from .kg_dump import dump_path
    from .pipelines.kg_ingest import derive_lexicon, read_ntriples

    return derive_lexicon(read_ntriples(dump_path()))


def q_kg_ingest_lexicon_annotations(sf_dir: str):
    """Annotation-registry breadth: an OBO-style dump whose labels use the
    reference's WIDER annotation vocabulary (IAO preferred terms, oboInOwl
    exact synonyms, NCI FULL_SYN, NCBI names — annotations.py:29-94)
    ingested through derive_lexicon's DEFAULT registry. Definitions
    (IAO_0000115) and non-English labels must not reach the lexicon."""
    from .kg_dump import annotations_dump_path
    from .pipelines.kg_ingest import derive_lexicon, read_ntriples

    return derive_lexicon(read_ntriples(annotations_dump_path()))


def q_kg_ingest_owlxml(sf_dir: str):
    """RDF/XML first mile: the reference's ontologies ship as .owl RDF/XML
    (onto_access.py:42-98); this ingests the checked-in RDF/XML dump — the
    SAME logical triples as the .nt dump, serialized in the other format —
    and derives the lexicon. Output equals kg_ingest_lexicon, so the two
    serializations of the first mile are interchangeable end-to-end."""
    from .kg_dump import rdfxml_dump_path
    from .pipelines.kg_ingest import derive_lexicon, read_rdfxml

    return derive_lexicon(read_rdfxml(rdfxml_dump_path()))


def q_kg_ingest_gzip(sf_dir: str):
    """Compressed-dump first mile: a gzipped copy of the N-Triples dump,
    decompressed INSIDE the distributed read tasks
    (arrow_open_stream_args) — the layout real DBpedia/Wikidata dumps ship
    in (.nt.gz). Output equals kg_ingest_types."""
    import gzip
    import os
    import shutil

    from .kg_dump import dump_path
    from .pipelines.kg_ingest import derive_entity_types, read_ntriples

    src = dump_path()
    gz = "/tmp/tds_kg_dump_gz/kg_dump.nt.gz"
    if not os.path.exists(gz):
        os.makedirs(os.path.dirname(gz), exist_ok=True)
        tmp = f"{gz}.tmp.{os.getpid()}"
        with open(src, "rb") as fin, gzip.open(tmp, "wb") as fout:
            shutil.copyfileobj(fin, fout)
        os.replace(tmp, gz)
    return derive_entity_types(read_ntriples(gz))


def q_kg_ingest_types(sf_dir: str):
    from .kg_dump import dump_path
    from .pipelines.kg_ingest import derive_entity_types, read_ntriples

    return derive_entity_types(read_ntriples(dump_path()))


def q_kg_ingest_alias(sf_dir: str):
    from .kg_dump import dump_path
    from .pipelines.kg_ingest import derive_alias_edges, read_ntriples

    return derive_alias_edges(read_ntriples(dump_path()))


def q_kg_ingest_closure(sf_dir: str):
    from .kg_dump import dump_path
    from .pipelines.kg_ingest import derive_class_closure, read_ntriples

    return derive_class_closure(read_ntriples(dump_path()))


def q_kg_ingest_closure_equiv(sf_dir: str):
    """Equivalence-merged ancestor closure: owl:equivalentClass components
    canonicalized (single numpy task; ontology-bounded) before the
    distributed frontier loop, then expanded back to members."""
    from .kg_dump import dump_path
    from .pipelines.kg_ingest import derive_class_closure_equiv, read_ntriples

    return derive_class_closure_equiv(read_ntriples(dump_path()))


def q_kg_ingest_pred_census(sf_dir: str):
    """Dump profiling census: per-predicate triple counts and object-shape
    indicators — the curation input behind the reference's avoid_predicates
    registry (kg/entity.py:37-60)."""
    from .kg_dump import dump_path
    from .pipelines.kg_ingest import pred_census, read_ntriples

    return pred_census(read_ntriples(dump_path()))


def q_kg_ingest_dangling(sf_dir: str):
    """Dump QA census: object IRIs never seen as subjects, per namespace —
    the unresolved references a linker would chase into empty candidate
    sets (reference kg/lookup.py empty-result paths)."""
    from .kg_dump import dump_path
    from .pipelines.kg_ingest import dangling_census, read_ntriples

    return dangling_census(read_ntriples(dump_path()))


def q_kg_ingest_rdfs(sf_dir: str):
    """RDFS entailment materialization (rho-df rules rdfs2/3/5/7/9/11) over
    the parsed dump: schema closed driver-side and broadcast, instance data
    expanded in ONE corpus scan, one final distinct. The Ray-native stand-in
    for the reference's reasoner seam (ontology/onto_access.py:56-88)."""
    from .kg_dump import dump_path
    from .pipelines.kg_ingest import rdfs_materialize, read_ntriples

    return rdfs_materialize(read_ntriples(dump_path()))


def q_kg_ingest_owl_horst(sf_dir: str):
    """OWL-Horst-lite materialization: the RDFS rules plus owl:inverseOf /
    SymmetricProperty / TransitiveProperty — the distributed stand-in for
    the reference's complex-axiom projection (ontology_projection.py:
    797-935). Property structure closed to fixpoint driver-side; one
    corpus scan + per-transitive-property frontier closures."""
    from .kg_dump import dump_path
    from .pipelines.kg_ingest import owl_horst_materialize, read_ntriples

    return owl_horst_materialize(read_ntriples(dump_path()))


def q_kg_ingest_types_entailed(sf_dir: str):
    """Reasoner-backed classification (the reference's onto_access.py
    getClassifiedOntology seam, end-to-end): entity_types derived from the
    OWL-Horst-MATERIALIZED graph instead of asserted rdf:type rows alone —
    inverse/domain/range/subclass-inferred memberships included."""
    from .kg_dump import dump_path
    from .pipelines.kg_ingest import (
        derive_entity_types,
        owl_horst_materialize,
        read_ntriples,
    )

    return derive_entity_types(
        owl_horst_materialize(read_ntriples(dump_path())))


def q_kg_cea_link_ingested(sf_dir: str):
    """End-to-end first mile: RDF dump -> parquet backend tables ->
    registered KGBackend -> CEA linking over it. Output equals the
    fixture-backend kg_cea_link (the dump serializes the fixture KG plus
    non-colliding noise namespaces), so it shares that oracle."""
    from .pipelines.kg_ingest import ensure_ingested_backend
    from .pipelines.queries_kg import cea_link

    ensure_ingested_backend("ingested")
    return cea_link(sf_dir, backend="ingested")


def q_kg_cta_ingested(sf_dir: str):
    """CTA voting with BOTH the linker and the type table served by the
    dump-ingested backend — extends the round-3 'backend everywhere'
    routing past CEA: output equals the fixture-backend CTA (the dump
    serializes the fixture KG plus non-colliding noise), so it shares
    that oracle."""
    import ray as _ray

    from .constants import AVOID_TOP_CONCEPTS
    from .pipelines.kg_ingest import ensure_ingested_backend
    from .pipelines.queries_kg import _linked_flat
    from .stages.canonicalize import (join_types_batches,
                                      vote_types_from_typed)
    from .state.backends import get_backend

    ensure_ingested_backend("ingested")
    t = get_backend("ingested").entity_types()
    t = t[~t["type_uri"].isin(AVOID_TOP_CONCEPTS)]
    typed = join_types_batches(_linked_flat(sf_dir, backend="ingested"),
                               types_ref=_ray.put(t))
    return vote_types_from_typed(typed, "doc_id")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_cea_link": q_kg_cea_link,
        "kg_ingest_lexicon": q_kg_ingest_lexicon,
        "kg_ingest_owlxml": q_kg_ingest_owlxml,
        "kg_ingest_lexicon_annotations": q_kg_ingest_lexicon_annotations,
        "kg_ingest_gzip": q_kg_ingest_gzip,
        "kg_ingest_types": q_kg_ingest_types,
        "kg_ingest_alias": q_kg_ingest_alias,
        "kg_ingest_closure": q_kg_ingest_closure,
        "kg_ingest_pred_census": q_kg_ingest_pred_census,
        "kg_ingest_dangling": q_kg_ingest_dangling,
        "kg_ingest_closure_equiv": q_kg_ingest_closure_equiv,
        "kg_ingest_rdfs": q_kg_ingest_rdfs,
        "kg_ingest_owl_horst": q_kg_ingest_owl_horst,
        "kg_ingest_types_entailed": q_kg_ingest_types_entailed,
        "kg_cea_link_ingested": q_kg_cea_link_ingested,
        "kg_cell_norm_link": q_kg_cell_norm_link,
        "kg_cta_doc_type": q_kg_cta_doc_type,
        "kg_cta_ancestors": q_kg_cta_ancestors,
        "kg_cpa_cooccur": q_kg_cpa_cooccur,
        "kg_type_pmi": q_kg_type_pmi,
        "kg_ambiguity_census": q_kg_ambiguity_census,
        "kg_mention_coverage": q_kg_mention_coverage,
        "kg_pagerank_personalized": q_kg_pagerank_personalized,
        "kg_components": q_kg_components,
        "kg_cta_confidence": q_kg_cta_confidence,
        "kg_prop_cardinality": q_kg_prop_cardinality,
        "kg_symmetry_census": q_kg_symmetry_census,
        "kg_entity_pmi": q_kg_entity_pmi,
        "kg_bfs_distances": q_kg_bfs_distances,
        "kg_cta_ingested": q_kg_cta_ingested,
        "kg_cpa_relation": q_kg_cpa_relation,
        "kg_fuzzy_match": q_kg_fuzzy_match,
        "kg_triples": q_kg_triples,
        "kg_alias_canonical": q_kg_alias_canonical,
        "tab2rdf_nation": q_tab2rdf_nation,
        "tab2rdf_region": q_tab2rdf_region,
        "q1_pricing": q_q1_pricing,
        "revenue_by_nation": q_revenue_by_nation,
        "top_parts_by_revenue": q_top_parts_by_revenue,
        "events_by_type": q_events_by_type,
        "token_freq_top20": q_token_freq_top20,
        "doc_text_stats": q_doc_text_stats,
        "doc_token_bpe": q_doc_token_bpe,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "dedup_exact": q_dedup_exact,
        "dedup_near_pairs": q_dedup_near_pairs,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_span_frac": q_dedup_span_frac,
        "dedup_span_remove": q_dedup_span_remove,
        "dedup_simhash": q_dedup_simhash,
        "dedup_components": q_dedup_components,
        "dedup_keep": q_dedup_keep,
        "ann_topk": q_ann_topk,
        "ann_topk_ivf_full": q_ann_topk_ivf_full,
        "ann_label_vote": q_ann_label_vote,
        "emb_near_pairs": q_emb_near_pairs,
        "media_manifest": q_media_manifest,
        "media_features": q_media_features,
        "media_frames": q_media_frames,
        "media_resize": q_media_resize,
        "kg_typed_repair": q_kg_typed_repair,
        "kg_strategy_census": q_kg_strategy_census,
        "kg_projection": q_kg_projection,
        "kg_docs_without_customer": q_kg_docs_without_customer,
        "kg_gt_repair": q_kg_gt_repair,
        "kg_prop_kind": q_kg_prop_kind,
        "kg_depth_stats": q_kg_depth_stats,
        "kg_class_sample": q_kg_class_sample,
        "kg_class_confirm": q_kg_class_confirm,
        "kg_pred_census": q_kg_pred_census,
        "kg_neighborhood_topk": q_kg_neighborhood_topk,
        "kg_doc_most_specific": q_kg_doc_most_specific,
        "events_sessionize": q_events_sessionize,
        "events_tumbling_1h": q_events_tumbling_1h,
        "events_sliding_1h15m": q_events_sliding_1h15m,
        "events_asof_order": q_events_asof_order,
        "user_cohorts": q_user_cohorts,
        "orders_ship_window": q_orders_ship_window,
        "doc_tfidf_top5": q_doc_tfidf_top5,
        "contamination_8gram": q_contamination_8gram,
        "repeated_ngram_census": q_repeated_ngram_census,
        "inverted_index": q_inverted_index,
        "quality_filter_census": q_quality_filter_census,
        "split_assign": q_split_assign,
        "stratified_sample": q_stratified_sample,
        "profile_orders": q_profile_orders,
        "events_lag_features": q_events_lag_features,
        "events_funnel": q_events_funnel,
        "doc_len_quantiles": q_doc_len_quantiles,
        "emb_label_stats": q_emb_label_stats,
        "emb_label_centroids": q_emb_label_centroids,
        "doc_unigram_logprob": q_doc_unigram_logprob,
        "doc_top_bigram_frac": q_doc_top_bigram_frac,
        "emb_dedup_keep": q_emb_dedup_keep,
        "kg_pagerank": q_kg_pagerank,
        "kg_triangles": q_kg_triangles,
        "doc_pack_assign": q_doc_pack_assign,
        "emb_kmeans_assign": q_emb_kmeans_assign,
        "orders_segment_semijoin": q_orders_segment_semijoin,
        "bigram_pmi": q_bigram_pmi,
        "events_daily_active": q_events_daily_active,
        "mixture_oversample": q_mixture_oversample,
        "events_decay": q_events_decay,
        "events_hourly_zscore": q_events_hourly_zscore,
        "media_captions": q_media_captions,
        "lang_confusion": q_lang_confusion,
        "dedup_exact_indexed": q_dedup_exact_indexed,
        "events_hll_users": q_events_hll_users,
        "orders_rollup": q_orders_rollup,
        "token_cms_counts": q_token_cms_counts,
        "orders_upsert": q_orders_upsert,
        "doc_len_percentile": q_doc_len_percentile,
        "curate_corpus": q_curate_corpus,
        "doc_chunk": q_doc_chunk,
        "pivot_lang_source": q_pivot_lang_source,
        "q3_shipping": q_q3_shipping,
        "customer_orders_left": q_customer_orders_left,
        "daily_activity_full": q_daily_activity_full,
        "orders_scd2": q_orders_scd2,
        "contrastive_negatives": q_contrastive_negatives,
        "events_props_stats": q_events_props_stats,
        "events_rolling_7d": q_events_rolling_7d,
        "dedup_prefix_contain": q_dedup_prefix_contain,
        "kg_fuzzy_edit": q_kg_fuzzy_edit,
        "doc_len_norm": q_doc_len_norm,
        "doc_shuffle_rank": q_doc_shuffle_rank,
        "weighted_sample": q_weighted_sample,
        "orders_topn_per_customer": q_orders_topn_per_customer,
        "doc_pack_census": q_doc_pack_census,
        "dedup_cluster_census": q_dedup_cluster_census,
        "vocab_growth": q_vocab_growth,
        "doc_ngram_entropy": q_doc_ngram_entropy,
        "emb_quantize_census": q_emb_quantize_census,
        "emb_pq_distortion": q_emb_pq_distortion,
        "events_value_histogram": q_events_value_histogram,
        "split_contamination": q_split_contamination,
        "lang_token_fertility": q_lang_token_fertility,
        "dedup_rate_by_source": q_dedup_rate_by_source,
        "events_stickiness": q_events_stickiness,
        "orders_key_skew": q_orders_key_skew,
        "events_user_entropy": q_events_user_entropy,
        "token_zipf_slope": q_token_zipf_slope,
        "events_user_lifespan": q_events_user_lifespan,
        "split_balance_psi": q_split_balance_psi,
        "orders_interarrival": q_orders_interarrival,
        "events_bounce_rate": q_events_bounce_rate,
        "customer_rfm": q_customer_rfm,
        "dedup_jaccard_histogram": q_dedup_jaccard_histogram,
        "doc_scrub_pii": q_doc_scrub_pii,
        "source_temperature_mix": q_source_temperature_mix,
        "ann_topk_pq": q_ann_topk_pq,
        "events_attribution": q_events_attribution,
        "contamination_near_dup": q_contamination_near_dup,
        "kg_closure_compute": q_kg_closure_compute,
        "orders_snapshot_diff": q_orders_snapshot_diff,
        "knn_graph": q_knn_graph,
        "knn_graph_ivf": q_knn_graph_ivf,
        "emb_kmeans_train": q_emb_kmeans_train,
        "doc_len_decile": q_doc_len_decile,
        "events_transition_census": q_events_transition_census,
        "knn_mutual": q_knn_mutual,
        "events_trend_slope": q_events_trend_slope,
        "events_value_psi": q_events_value_psi,
        "split_leakfree": q_split_leakfree,
        "media_pack_assign": q_media_pack_assign,
        "orders_checksum": q_orders_checksum,
        "kg_entity_salience": q_kg_entity_salience,
        "events_item_cooccur": q_events_item_cooccur,
        "revenue_share": q_revenue_share,
        "kg_degree_census": q_kg_degree_census,
        "kg_related_docs": q_kg_related_docs,
        "events_item_sim": q_events_item_sim,
        "events_weekly_active": q_events_weekly_active,
        "kg_type_by_source": q_kg_type_by_source,
        "source_lang_entropy": q_source_lang_entropy,
        "user_journey_report": q_user_journey_report,
        "events_item_cvr": q_events_item_cvr,
        "part_top_supplier": q_part_top_supplier,
        "orders_per_customer_census": q_orders_per_customer_census,
        "part_type_supplier_census": q_part_type_supplier_census,
        "orders_segment_salted": q_orders_segment_salted,
    }
