"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check on sf0.001.
queries()      — every implemented operator from SURVEY.md §2 plus the
                 LLM-pipeline surface (dedup / similarity / text /
                 multimodal), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB twin for each query (ANSI SQL on the same
                 parquet views). Entries absent here get the weaker
                 rows-only check (noted per query below).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mito_spark.operators import (
    asof,
    contrastive,
    decontam,
    dedup,
    dsir,
    mmr,
    dynamic,
    events,
    funnel,
    graph,
    hygiene,
    multimodal,
    pipeline,
    quality,
    quantize,
    rangejoin,
    sampling,
    relational,
    relational2,
    scalar_showcase,
    search,
    similarity,
    sketches,
    spans,
    text,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q3-shaped join+agg+top-N on sf0.001."""
    return relational.q3_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING CONTRACT: the driver gates the FIRST 50 entries.
    # ROTATION (VERDICT r4 #1): the r5 window rotates IN every entry
    # that has never produced a driver CORRECTNESS row — the 8 r4-new
    # operators, the 11-query r1-stale TPC-H cohort, the 13 r3-green
    # shapes that rested in the r4 tail, and the first-wave r5
    # operators (semdedup, dsir_importance_weights, dsir_resample,
    # embedding_cluster_profile, knn_graph, text_winnow_fingerprints,
    # winnow_dup_pairs, jaccard_prefix_join, mmr_rerank — 9 entries)
    # and the 9 second-wave r5 operators (exact_substring_spans,
    # span_rewrite, hybrid_search_rrf, c4_quality_filters,
    # vocab_coverage, seq_length_histogram, surprisal_buckets,
    # contrastive_pairs, events_retransmit_dedup): the window is now
    # 50/50 never-driver-gated entries — every slot converts a local PASS
    # into driver evidence. The r4-green anchors (minhash, CC,
    # multimodal, sessionize) rest at the head of the tail; their
    # r5-touched code paths (band-key refactor, convergence guard,
    # PNG decode) are pytest-covered and rotate back into the r6
    # window. Everything after position 50 is tail.
    return {
        # ---- never driver-gated: the 8 r4-new operators ----
        "quantize_embeddings": quantize.quantize_embeddings,
        "text_surprisal": text.unigram_surprisal,
        "events_value_anomalies": events.events_value_anomalies,
        "embedding_dedup_clusters": graph.embedding_dedup_clusters,
        "incremental_dedup": dedup.incremental_dedup,
        "ann_cosine_topk_sq8": similarity.cosine_topk_sq8,
        # new in r5: SemDeDup — k-means cells + intra-cluster cosine
        # prune (semantic dedup tier beside the shingle/simhash tiers)
        "semdedup": similarity.semdedup,
        # new in r5: DSIR hashed-unigram importance weights (data
        # selection for LM training, arXiv:2302.03169)
        "dsir_importance_weights": dsir.dsir_importance_weights,
        # new in r5: Gumbel-top-k seeded resampling on the DSIR
        # weights; per-cell curation diagnostics over the k-means cells
        "dsir_resample": dsir.dsir_resample,
        "embedding_cluster_profile": similarity.embedding_cluster_profile,
        # new in r5: per-node top-k neighbor graph (LSH-blocked)
        "knn_graph": similarity.knn_graph,
        # new in r5: winnowing fingerprints (SIGMOD'03 MOSS scheme)
        "text_winnow_fingerprints": text.winnow_fingerprints,
        "winnow_dup_pairs": text.winnow_dup_pairs,
        # new in r5: EXACT Jaccard self-join via PPJoin-style prefix
        # filtering; its oracle is the INDEPENDENT brute-force
        # quadratic, so the hash gate proves zero lost pairs
        "jaccard_prefix_join": dedup.jaccard_prefix_join,
        # new in r5: MMR diversification over the ANN candidates
        # (greedy unrolled into k deterministic stages, fully oracled)
        "mmr_rerank": mmr.mmr_rerank,
        # new in r5 wave 2: exact-substring span dedup (Lee et al.
        # 2107.06499, sliding-window-hash form), C4 heuristic filters,
        # CCNet-style surprisal deciles, contrastive pair mining, and
        # at-least-once retransmission dedup
        "exact_substring_spans": spans.exact_substring_spans,
        "boilerplate_ngrams": spans.boilerplate_ngrams,
        "span_rewrite": spans.span_rewrite,
        "hybrid_search_rrf": search.hybrid_search_rrf,
        "c4_quality_filters": quality.c4_quality_filters,
        "vocab_coverage": quality.vocab_coverage,
        "seq_length_histogram": quality.seq_length_histogram,
        # r5 wave 3: label spreading over the kNN graph + dedup report
        "label_propagation": graph.label_propagation,
        "dedup_cluster_stats": graph.dedup_cluster_stats,
        # r5 wave 3: deterministic global corpus shuffle (hash-shard +
        # per-shard sort — no global sort)
        "corpus_shuffle": sampling.corpus_shuffle,
        # r5 wave 3: train/eval near-dup leakage audit (cross-split
        # band probe, incremental_dedup's shape)
        "split_leakage_check": dedup.split_leakage_check,
        # r5 wave 3: measured LSH recall vs exact ground truth
        "lsh_recall_report": dedup.lsh_recall_report,
        "surprisal_buckets": quality.surprisal_buckets,
        "contrastive_pairs": contrastive.contrastive_pairs,
        "events_retransmit_dedup": events.events_retransmit_dedup,
        # rewritten this round: asymmetric hash-sampled shingle
        # candidates (VERDICT r4 "What's wrong" #1)
        "dedup_containment": dedup.dedup_containment,
        "domain_mix_temperature": hygiene.domain_mix_temperature,
        # ---- r1-stale TPC-H cohort (last driver-proven in round 1) ----
        "q8_market_share": relational2.q8_market_share,
        "q9_profit_by_nation": relational2.q9_profit_by_nation,
        "q11_important_parts": relational2.q11_important_parts,
        "q14_promo_share": relational2.q14_promo_share,
        "q15_top_supplier": relational2.q15_top_supplier,
        "q16_supplier_part_variety": relational2.q16_supplier_part_variety,
        "q19_disjunctive_pred": relational2.q19_disjunctive_pred,
        "q20_heavy_shippers": relational2.q20_heavy_shippers,
        "q22_idle_rich_customers": relational2.q22_idle_rich_customers,
        "part_type_stats": relational.part_type_stats,
        "order_priority_distinct_customers": relational.order_priority_distinct_customers,
        # ---- r3-green shapes that rested in the r4 tail ----
        "q18_large_orders": relational2.q18_large_orders,
        "nation_set_ops": relational2.nation_set_ops,
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q21_sole_late_supplier": relational2.q21_sole_late_supplier,
        "revenue_rollup": relational2.revenue_rollup,
        "order_cube": relational2.order_cube,
        "sql_grouping_sets": relational2.sql_grouping_sets,
        # ---- tail (position 51+): r4-green rows resting this round
        # (driver CORRECTNESS_r04 green; rotate back in r6; q6 and
        # top_orders are r3-green shapes bumped by the wave-3 adds —
        # first in line for the r6 window) ----
        "customer_running_totals": relational2.customer_running_totals,
        "q5_local_supplier_volume": relational.q5_local_supplier_volume,
        "q7_nation_volume": relational2.q7_nation_volume,
        "q10_returned_top_customers": relational2.q10_returned_top_customers,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "top_orders_per_customer": relational.top_orders_per_customer,
        "dedup_connected_components": graph.dedup_connected_components,
        "dedup_minhash_lsh": dedup.minhash_lsh_dedup,
        "multimodal_features": multimodal.multimodal_features,
        "sessionize": events.sessionize,
        "dedup_exact": dedup.exact_dedup,
        "ann_cosine_topk_lsh": similarity.cosine_topk_lsh,
        "ann_cosine_topk_ivf": similarity.cosine_topk_ivf,
        "training_corpus_pipeline": pipeline.training_corpus,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "events_asof_join": asof.events_asof_latest_order,
        "events_range_join": rangejoin.events_purchase_window,
        "bm25_search": search.bm25_topk,
        "funnel_analysis": funnel.funnel_analysis,
        "pii_redaction": hygiene.pii_redaction,
        "stratified_sample": hygiene.stratified_sample,
        "domain_mix": hygiene.domain_mix,
        "decontaminate": decontam.decontaminate,
        "dataset_split": sampling.dataset_split,
        "dedup_simhash": dedup.simhash_dedup,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "ann_cosine_topk": similarity.cosine_topk_bruteforce,
        "ann_cosine_topk_filtered": similarity.cosine_topk_filtered,
        "embedding_near_dup": similarity.embedding_near_dup,
        "sketch_distinct_profile": sketches.sketch_distinct_profile,
        "text_token_count": text.token_count,
        "text_lang_id": text.lang_id,
        "text_quality": text.quality_score,
        "text_fingerprint": text.fingerprint,
        "text_chunking": text.chunk_documents,
        "text_tfidf_top_terms": text.tfidf_top_terms,
        "repetition_quality": decontam.repetition_quality,
        "token_pack_bins": sampling.token_pack_bins,
        "strings_showcase": scalar_showcase.strings_showcase,
        "crypto_showcase": scalar_showcase.crypto_showcase,
        "time_showcase": scalar_showcase.time_showcase,
        "regexp_showcase": scalar_showcase.regexp_showcase,
        "collections_showcase": scalar_showcase.collections_showcase,
        "collections_showcase2": scalar_showcase.collections_showcase2,
        "events_by_type": events.events_by_type,
        "events_props_extract": events.events_props_extract,
        "events_props_variant": dynamic.events_props_variant,
        "events_props_presence": dynamic.events_props_presence,
        "user_activity_windows": events.user_activity_windows,
        "events_time_rollup": events.events_time_rollup,
        "events_value_percentiles": events.events_value_percentiles,
        "q12_priority_case_agg": relational2.q12_priority_case_agg,
        "q2_cheapest_supplier": relational2.q2_cheapest_supplier,
        "q4_priority_semi": relational2.q4_priority_semi,
        "q13_order_count_distribution": relational2.q13_order_count_distribution,
        "q17_below_avg_qty_revenue": relational2.q17_below_avg_qty_revenue,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": relational.Q1_SQL,
        "q3_shipping_priority": relational.Q3_SQL,
        "q5_local_supplier_volume": relational.Q5_SQL,
        "q6_forecast_revenue": relational.Q6_SQL,
        "top_orders_per_customer": relational.TOP_ORDERS_SQL,
        "order_priority_distinct_customers": relational.ORDER_PRIORITY_SQL,
        "part_type_stats": relational.PART_TYPE_SQL,
        "q2_cheapest_supplier": relational2.Q2_SQL,
        "q4_priority_semi": relational2.Q4_SQL,
        "q7_nation_volume": relational2.Q7_SQL,
        "q8_market_share": relational2.Q8_SQL,
        "q9_profit_by_nation": relational2.Q9_SQL,
        "q10_returned_top_customers": relational2.Q10_SQL,
        "q11_important_parts": relational2.Q11_SQL,
        "q16_supplier_part_variety": relational2.Q16_SQL,
        "q20_heavy_shippers": relational2.Q20_SQL,
        "q21_sole_late_supplier": relational2.Q21_SQL,
        "q15_top_supplier": relational2.Q15_SQL,
        "q12_priority_case_agg": relational2.Q12_SQL,
        "q13_order_count_distribution": relational2.Q13_SQL,
        "q14_promo_share": relational2.Q14_SQL,
        "q17_below_avg_qty_revenue": relational2.Q17_SQL,
        "q18_large_orders": relational2.Q18_SQL,
        "q19_disjunctive_pred": relational2.Q19_SQL,
        "q22_idle_rich_customers": relational2.Q22_SQL,
        "revenue_rollup": relational2.ROLLUP_SQL,
        "order_cube": relational2.CUBE_SQL,
        "sql_grouping_sets": relational2.GROUPING_SETS_SQL,
        "customer_running_totals": relational2.RUNNING_SQL,
        "nation_set_ops": relational2.SET_OPS_SQL,
        "events_by_type": events.EVENTS_BY_TYPE_SQL,
        "events_props_extract": events.EVENTS_PROPS_SQL,
        "events_props_variant": dynamic.PROPS_VARIANT_SQL,
        "events_props_presence": dynamic.PROPS_PRESENCE_SQL,
        "sessionize": events.SESSIONIZE_SQL,
        "user_activity_windows": events.USER_ACTIVITY_SQL,
        "events_time_rollup": events.TIME_ROLLUP_SQL,
        "events_asof_join": asof.EVENTS_ASOF_SQL,
        "events_range_join": rangejoin.PURCHASE_WINDOW_SQL,
        "events_value_percentiles": events.PERCENTILES_SQL,
        "funnel_analysis": funnel.FUNNEL_SQL,
        "quantize_embeddings": quantize.QUANTIZE_SQL,
        "text_surprisal": text.SURPRISAL_SQL,
        "events_value_anomalies": events.ANOMALIES_SQL,
        "embedding_dedup_clusters": graph.EMBEDDING_CC_SQL,
        "incremental_dedup": dedup.INCREMENTAL_DEDUP_SQL,
        "ann_cosine_topk_sq8": similarity.COSINE_SQ8_SQL,
        "semdedup": similarity.SEMDEDUP_SQL,
        "dsir_importance_weights": dsir.DSIR_SQL,
        "dsir_resample": dsir.DSIR_RESAMPLE_SQL,
        "embedding_cluster_profile": similarity.CLUSTER_PROFILE_SQL,
        "knn_graph": similarity.KNN_GRAPH_SQL,
        "text_winnow_fingerprints": text.WINNOW_SQL,
        "winnow_dup_pairs": text.WINNOW_PAIRS_SQL,
        "jaccard_prefix_join": dedup.JACCARD_PREFIX_SQL,
        "mmr_rerank": mmr.MMR_SQL,
        "exact_substring_spans": spans.SPANS_SQL,
        "boilerplate_ngrams": spans.BOILERPLATE_SQL,
        "span_rewrite": spans.SPAN_REWRITE_SQL,
        "hybrid_search_rrf": search.HYBRID_RRF_SQL,
        "c4_quality_filters": quality.C4_SQL,
        "vocab_coverage": quality.VOCAB_COVERAGE_SQL,
        "seq_length_histogram": quality.SEQ_LENGTH_SQL,
        "label_propagation": graph.LABEL_PROP_SQL,
        "dedup_cluster_stats": graph.CLUSTER_STATS_SQL,
        "corpus_shuffle": sampling.CORPUS_SHUFFLE_SQL,
        "split_leakage_check": dedup.SPLIT_LEAKAGE_SQL,
        "lsh_recall_report": dedup.LSH_RECALL_SQL,
        "surprisal_buckets": quality.SURPRISAL_BUCKETS_SQL,
        "contrastive_pairs": contrastive.CONTRASTIVE_SQL,
        "events_retransmit_dedup": events.RETRANSMIT_SQL,
        "dedup_containment": dedup.CONTAINMENT_SQL,
        "domain_mix_temperature": hygiene.DOMAIN_MIX_T_SQL,
        "strings_showcase": scalar_showcase.STRINGS_SQL,
        "crypto_showcase": scalar_showcase.CRYPTO_SQL,
        "time_showcase": scalar_showcase.TIME_SQL,
        "regexp_showcase": scalar_showcase.REGEXP_SQL,
        "collections_showcase": scalar_showcase.COLLECTIONS_SQL,
        "collections_showcase2": scalar_showcase.COLLECTIONS2_SQL,
        "dedup_exact": dedup.EXACT_DEDUP_SQL,
        "dedup_minhash_lsh": dedup.MINHASH_LSH_SQL,
        "dedup_simhash": dedup.SIMHASH_SQL,
        "dedup_ngram_jaccard": dedup.NGRAM_JACCARD_SQL,
        "ann_cosine_topk": similarity.COSINE_TOPK_SQL,
        "ann_cosine_topk_filtered": similarity.COSINE_FILTERED_SQL,
        "ann_cosine_topk_lsh": similarity.COSINE_LSH_SQL,
        "embedding_near_dup": similarity.NEAR_DUP_SQL,
        "ann_cosine_topk_ivf": similarity.COSINE_IVF_SQL,
        "sketch_distinct_profile": sketches.SKETCH_PROFILE_SQL,
        "text_token_count": text.TOKEN_COUNT_SQL,
        "text_lang_id": text.LANG_ID_SQL,
        "text_quality": text.QUALITY_SQL,
        "text_fingerprint": text.FINGERPRINT_SQL,
        "text_chunking": text.CHUNK_SQL,
        "text_tfidf_top_terms": text.TFIDF_SQL,
        "decontaminate": decontam.DECONTAM_SQL,
        "repetition_quality": decontam.REPETITION_SQL,
        "dedup_connected_components": graph.CC_SQL,
        "pii_redaction": hygiene.PII_SQL,
        "stratified_sample": hygiene.STRATIFIED_SQL,
        "domain_mix": hygiene.DOMAIN_MIX_SQL,
        "bm25_search": search.BM25_SQL,
        "multimodal_features": multimodal.MULTIMODAL_SQL,
        "dataset_split": sampling.DATASET_SPLIT_SQL,
        "token_pack_bins": sampling.TOKEN_PACK_SQL,
        "training_corpus_pipeline": pipeline.PIPELINE_SQL,
    }
