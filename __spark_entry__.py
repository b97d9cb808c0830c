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
    ann_index,
    asof,
    classify,
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
    pq,
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
    snapshot,
    spans,
    text,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q3-shaped join+agg+top-N on sf0.001."""
    return relational.q3_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING CONTRACT: the driver gates the FIRST 50 entries.
    # ROTATION (r13, per VERDICT r12 next#9): precedence inside the
    # window is TOUCHED code > OLDEST evidence. The r13 window = the
    # 13 phase-1 optimization rewrites, the queries whose code the
    # r13 session-2/3 optimizations touched (directly or through the
    # shared shingle/trigram/CC/trainer/k-means helpers; every one
    # oracle re-proven in-session at sf0.01 AND sf0.001 — session 3's
    # six k-means-family entries displace six session-2 entries whose
    # helper changes are gated by in-window siblings), and the two
    # oldest-evidence anchors (sessionize, dedup_exact — last
    # driver-green r6/r7). The displaced cohort entries lead the
    # out-of-window tail; all are green in the regenerated
    # full-registry sweep (CORRECTNESS_LOCAL_r13.json).
    #
    # r12-era window rationale (kept for the audit trail): the r12
    # window held (a) the 18 r12-NEW operators — the thirteen session-2
    # additions lead: dedup_edit_distance (normalized-Levenshtein
    # character-order verify tier on the shared LSH candidates,
    # length-prefiltered per Gravano VLDB'01), ann_cosine_topk_binary
    # (1-bit sign quantization: Horner-packed 32-bit words,
    # XOR+popcount Hamming candidates, exact float rerank),
    # term_burstiness_report (Church-Gale adaptation + Fano from
    # exact integer moments), table_profile (ANALYZE-style one-pass
    # column stats, rotated late), subsample_frequent_words (the
    # word2vec keep-probability table, IEEE-exact), ann_rbo_report
    # (rank-biased overlap of the binary tier vs brute force) and
    # graph_assortativity (Newman endpoint-degree correlation of the
    # kNN graph), kmv_overlap_report (bottom-k sketch vs exact
    # cross-source overlap), ivf_balance_report (per-cell population
    # balance of the IVF quantizer), whitening_isotropy_report (All-
    # but-the-Top applied + before/after isotropy),
    # events_seasonality_report (weekday ANOVA eta² per type),
    # textrank_keywords (weighted PageRank keyword extraction),
    # events_interarrival_report (gap-CV burstiness per type) — then
    # pca_projection_report (top-k
    # principal components by unrolled power iteration on the bounded
    # d x d covariance matrix: the explained-variance ladder the
    # correlation report points at) and minhash_oph_report (the
    # one-md5-per-shingle OPH signature tier measured against the
    # K-salt estimator on the same candidate population) and
    # embedding_isotropy_report (the Ethayarajh anisotropy estimate as
    # ONE scan: mean pairwise cosine via (||Σu||²−n)/(n(n−1)), no pair
    # join) and ngram_entropy_report (the Shannon 1951 redundancy
    # ladder: H_n and H_n − H_{n−1} in bits over one staged tokenize)
    # and stupid_backoff_ppl (Brants et al. EMNLP'07 trigram scoring
    # on the md5 held-out split — the distributed count-based LM) —
    # (b) the 6 entries whose CODE r12
    # touched after their r11-green rows: cdc_chunk_dedup (the
    # boundary scan is now linear in doc length — char-array slices +
    # in-row HOF spans replace the per-position O(position) substr,
    # the window shuffle, and the re-slice join; plus the len==window
    # descending-sequence guard), quality_classifier_calibration (the
    # single-partition global ntile is now a distributed range-
    # partition rank + bounded-offsets bucket formula — same bins,
    # same oracle, same hash), quantile_sketch_calibration (the exact
    # yardstick now hash-samples BOTH legs above a bound, the
    # _hll_yard_rate discipline; new yard_rate column on both
    # engines), tokenizer_compression_curve (the oracle now stops at
    # pair exhaustion exactly like the operator), and
    # wordpiece_learn_subword / wordpiece_encode_subword (the '#'
    # ambiguity guard now scans the FULL word-type table, not the
    # wc-filtered train subset) — then (b2) the 3 entries the r12
    # OPTIMIZATION round touched after the build window was drawn:
    # heavy_hitters, hll_calibration_report,
    # embedding_correlation_report (see the inline block below; all
    # re-proven at two SFs in-session and in the regenerated
    # CORRECTNESS_LOCAL_r12.json) — and (c) the 23 oldest-evidence
    # entries: r11 positions 51-73 verbatim (lineitem_correlations /
    # bpe_encode / bpe_learn_merges / ann_index_refresh — the four
    # displaced r11 late arrivals, driver-proven r8 — then
    # label_propagation .. knn_graph, the prescribed cohort;
    # text_winnow_fingerprints / winnow_dup_pairs / unigram_lm_train /
    # unigram_lm_vocab plus the five entries ending at knn_graph are
    # displaced past position 50 by the later r12-new entries, and the
    # cohort's last three (events_time_rollup,
    # events_value_percentiles, q12_priority_case_agg) by the (b2)
    # optimization-touched trio; all are green in the committed
    # full-registry sweep).
    # The tail keeps oldest-evidence-first order: r11 positions
    # 77-194 (r8-r10 driver evidence), and LAST the remaining 44
    # r11-window entries, whose driver evidence is the freshest
    # (CORRECTNESS_r11 green); every tail entry is also green in the
    # committed full-registry sweep regenerated on shipped source
    # (CORRECTNESS_LOCAL_r12.json).
    return {
    # ---- r13 GATE WINDOW (first 50; rotation per VERDICT r12 next#9:
    # everything r13 touched, then the oldest-evidence cohort — the
    # r6/r7-last-green queries and the front of the r9 cohort) ----
    # r13-touched (optimization rewrites; oracle re-proven in-session):
        "kn_bigram_perplexity": text.kn_bigram_perplexity,
        "text_bigram_surprisal": text.bigram_surprisal,
        "stupid_backoff_ppl": text.stupid_backoff_ppl,
        "rake_keywords": text.rake_keywords,
        "bloom_decontaminate_report": decontam.bloom_decontaminate_report,
        "decontam_ngram_ladder": decontam.decontam_ngram_ladder,
        "jaccard_prefix_join": dedup.jaccard_prefix_join,
        "lsh_recall_report": dedup.lsh_recall_report,
        "lsh_curve_report": dedup.lsh_curve_report,
        "knn_graph": similarity.knn_graph,
        "mmr_rerank": mmr.mmr_rerank,
        "embedding_dim_ablation": similarity.embedding_dim_ablation_report,
        "ngram_entropy_report": quality.ngram_entropy_report,
    # r13-touched session 2 (CC star probe, char-trigram element_at,
    # n-gram element_at unroll, trainer checkpoint drop, Arrow batch,
    # curve-ladder fold — each oracle re-proven in-session at both
    # gate SFs; see OPTIMIZATION_r13.md):
        "multimodal_features": multimodal.multimodal_features,
        "training_corpus_pipeline": pipeline.training_corpus,
        "dedup_connected_components": graph.dedup_connected_components,
        "dedup_canonical_quality": graph.dedup_canonical_quality,
        "dedup_cluster_stats": graph.dedup_cluster_stats,
        "embedding_dedup_clusters": graph.embedding_dedup_clusters,
        "graph_report": graph.graph_report,
        "dataset_split_by_cluster": graph.dataset_split_by_cluster,
        "nb_langid_report": classify.nb_langid_report,
        "nb_langid_top_features": classify.nb_langid_top_features,
        "dedup_minhash_lsh": dedup.minhash_lsh_dedup,
        "dedup_weighted_jaccard": dedup.dedup_weighted_jaccard,
        "dedup_containment": dedup.dedup_containment,
        "incremental_dedup": dedup.incremental_dedup,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "dedup_threshold_sweep": dedup.dedup_threshold_sweep,
        "bbit_minhash_report": dedup.bbit_minhash_report,
        "lsh_bucket_skew_report": dedup.lsh_bucket_skew_report,
        "split_leakage_check": dedup.split_leakage_check,
        "decontaminate": decontam.decontaminate,
        "repetition_quality": decontam.repetition_quality,
        "cms_calibration_report": sketches.cms_calibration_report,
        "exact_substring_spans": spans.exact_substring_spans,
        "span_rewrite": spans.span_rewrite,
        "boilerplate_ngrams": spans.boilerplate_ngrams,
        "text_winnow_fingerprints": text.winnow_fingerprints,
        "winnow_dup_pairs": text.winnow_dup_pairs,
        "bpe_learn_merges": text.bpe_learn_merges,
        "bpe_learn_merges_bytes": text.bpe_learn_merges_bytes,
    # r13-touched session 3 (nprobe-curve rung fold + k-means
    # array-accumulator cell sums; oracle re-proven in-session at
    # both gate SFs):
        "ann_nprobe_curve": similarity.ann_nprobe_curve_report,
        "embedding_cluster_profile": similarity.embedding_cluster_profile,
        "ann_cosine_topk_ivf": similarity.cosine_topk_ivf,
        "ann_ivfadc": ann_index.ann_query_ivfadc,
        "ann_pq_topk": pq.ann_pq_topk,
        "ivf_balance_report": similarity.ivf_balance_report,
    # oldest-evidence anchors (last driver-green r6/r7; fill to 50):
        "sessionize": events.sessionize,
        "dedup_exact": dedup.exact_dedup,
    # ---- out of window (evidence per CORRECTNESS_r9..r12; relative order kept) ----
    # displaced untouched cohort (was in the 7b22cfa window; driver
    # evidence r9-r12, all green in the regenerated full sweep),
    # plus six session-2-touched entries displaced by the session-3
    # set (their code changes are gated by in-window siblings of the
    # same helpers; all green in the sweep):
        "bpe_encode": text.bpe_encode,
        "tokenizer_compression_curve": text.tokenizer_compression_curve,
        "term_burstiness_report": quality.term_burstiness_report,
        "dedup_pair_explain": dedup.dedup_pair_explain,
        "dedup_attribution_report": dedup.dedup_attribution_report,
        "minhash_estimate_report": dedup.minhash_estimate_report,
        "dataset_split": sampling.dataset_split,
        "token_pack_bins": sampling.token_pack_bins,
        "strings_showcase": scalar_showcase.strings_showcase,
        "crypto_showcase": scalar_showcase.crypto_showcase,
        "time_showcase": scalar_showcase.time_showcase,
        "regexp_showcase": scalar_showcase.regexp_showcase,
        "events_time_rollup": events.events_time_rollup,
        "events_value_percentiles": events.events_value_percentiles,
        "q12_priority_case_agg": relational2.q12_priority_case_agg,
        "q2_cheapest_supplier": relational2.q2_cheapest_supplier,
        "q4_priority_semi": relational2.q4_priority_semi,
        "q13_order_count_distribution": relational2.q13_order_count_distribution,
        "q17_below_avg_qty_revenue": relational2.q17_below_avg_qty_revenue,
        "text_lang_id": text.lang_id,
        "text_fingerprint": text.fingerprint,
        "quantize_embeddings": quantize.quantize_embeddings,
        "text_surprisal": text.unigram_surprisal,
        "events_value_anomalies": events.events_value_anomalies,
        "dsir_importance_weights": dsir.dsir_importance_weights,
        "dsir_resample": dsir.dsir_resample,
        "unigram_lm_train": text.unigram_lm_train,
        "unigram_lm_vocab": text.unigram_lm_vocab,
        "unigram_encode": text.unigram_encode,
        "tokenizer_fertility_subword": text.tokenizer_fertility_subword,
    # ---- r12-new operators (18; the thirteen session-2 additions lead) ----
        "dedup_edit_distance": dedup.dedup_edit_distance,
        "ann_cosine_topk_binary": similarity.cosine_topk_binary,
        "table_profile": relational2.table_profile,
        "subsample_frequent_words": sampling.subsample_frequent_words,
        "ann_rbo_report": similarity.ann_rbo_report,
        "graph_assortativity": graph.graph_assortativity,
        "kmv_overlap_report": sketches.kmv_overlap_report,
        "whitening_isotropy_report": similarity.whitening_isotropy_report,
        "events_seasonality_report": events.events_seasonality_report,
        "textrank_keywords": text.textrank_keywords,
        "events_interarrival_report": events.events_interarrival_report,
        "pca_projection_report": similarity.pca_projection_report,
        "minhash_oph_report": dedup.minhash_oph_report,
        "embedding_isotropy_report": similarity.embedding_isotropy_report,
    # ---- r12-touched code: re-prove on current source (6) ----
        "cdc_chunk_dedup": dedup.cdc_chunk_dedup,
        "quality_classifier_calibration": classify.quality_classifier_calibration,
        "quantile_sketch_calibration": sketches.quantile_sketch_calibration,
        "wordpiece_learn_subword": text.wordpiece_learn_subword,
        "wordpiece_encode_subword": text.wordpiece_encode_subword,
    # ---- r12 OPTIMIZATION round touched these three after the build
    # window was drawn (touched > oldest evidence): heavy_hitters (MG
    # fold now consumes int64 hashes), hll_calibration_report (one
    # distinct pass feeds both legs), embedding_correlation_report
    # (in-row pair products replace the vec_id self-join) ----
        "heavy_hitters": sketches.heavy_hitters,
        "hll_calibration_report": sketches.hll_calibration_report,
        "embedding_correlation_report": similarity.embedding_correlation_report,
    # ---- oldest driver evidence: r11 positions 51-73 (23 in-window) ----
        "lineitem_correlations": relational2.lineitem_correlations,
        "ann_index_refresh": ann_index.ann_index_refresh,
        "label_propagation": graph.label_propagation,
        "knn_pagerank": graph.knn_pagerank,
        "text_zipf_profile": quality.text_zipf_profile,
        "sketch_distinct_profile": sketches.sketch_distinct_profile,
        "pii_redaction": hygiene.pii_redaction,
        "domain_mix": hygiene.domain_mix,
        "stratified_sample": hygiene.stratified_sample,
        "bm25_search": search.bm25_topk,
        "funnel_analysis": funnel.funnel_analysis,
        "text_token_count": text.token_count,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "events_by_type": events.events_by_type,
        "events_props_extract": events.events_props_extract,
        "events_props_variant": dynamic.events_props_variant,
        "events_props_presence": dynamic.events_props_presence,
        "user_activity_windows": events.user_activity_windows,
        "ngram_novelty_report": dedup.ngram_novelty_report,
        "embedding_outlier_report": similarity.embedding_outlier_report,
        "simhash_estimate_report": dedup.simhash_estimate_report,
        "global_percentiles_exact": sketches.global_percentiles_exact,
        "ann_persisted_topk": ann_index.ann_query_persisted,
        "ann_persisted_sq8": ann_index.ann_query_persisted_sq8,
        "q16_supplier_part_variety": relational2.q16_supplier_part_variety,
        "q19_disjunctive_pred": relational2.q19_disjunctive_pred,
        "q20_heavy_shippers": relational2.q20_heavy_shippers,
        "q22_idle_rich_customers": relational2.q22_idle_rich_customers,
        "part_type_stats": relational.part_type_stats,
        "order_priority_distinct_customers": relational.order_priority_distinct_customers,
        "q18_large_orders": relational2.q18_large_orders,
        "nation_set_ops": relational2.nation_set_ops,
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q21_sole_late_supplier": relational2.q21_sole_late_supplier,
        "revenue_rollup": relational2.revenue_rollup,
        "order_cube": relational2.order_cube,
        "sql_grouping_sets": relational2.sql_grouping_sets,
        "customer_running_totals": relational2.customer_running_totals,
        "q5_local_supplier_volume": relational.q5_local_supplier_volume,
        "q7_nation_volume": relational2.q7_nation_volume,
        "q10_returned_top_customers": relational2.q10_returned_top_customers,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "top_orders_per_customer": relational.top_orders_per_customer,
        "semdedup": similarity.semdedup,
        "corpus_shuffle": sampling.corpus_shuffle,
        "dedup_simhash": dedup.simhash_dedup,
        "bootstrap_ci_report": sampling.bootstrap_ci_report,
        "quality_classifier_pr_curve": classify.quality_classifier_pr_curve,
        "events_percentile_drift": events.events_percentile_drift,
        "charset_profile": quality.charset_profile,
        "embedding_snapshot_drift": snapshot.embedding_snapshot_drift,
        "ingest_delta_pipeline": snapshot.ingest_delta_pipeline,
        "quality_classifier_report": classify.quality_classifier_report,
        "corpus_snapshot_diff": snapshot.corpus_snapshot_diff,
        "unigram_lm_prune": text.unigram_lm_prune,
        "domain_epoch_plan": hygiene.domain_epoch_plan,
        "dedup_modality_agreement": dedup.dedup_modality_agreement,
        "packing_efficiency_report": sampling.packing_efficiency_report,
        "dedup_normalization_report": dedup.dedup_normalization_report,
        "source_token_drift": quality.source_token_drift,
        "collocation_pmi_report": text.collocation_pmi_report,
        "jl_projection_report": similarity.jl_projection_report,
        "dedup_paragraphs": dedup.dedup_paragraphs,
        "hybrid_search_rrf": search.hybrid_search_rrf,
        "c4_quality_filters": quality.c4_quality_filters,
        "vocab_coverage": quality.vocab_coverage,
        "seq_length_histogram": quality.seq_length_histogram,
        "surprisal_buckets": quality.surprisal_buckets,
        "contrastive_pairs": contrastive.contrastive_pairs,
        "events_retransmit_dedup": events.events_retransmit_dedup,
        "domain_mix_temperature": hygiene.domain_mix_temperature,
        "q8_market_share": relational2.q8_market_share,
        "q9_profit_by_nation": relational2.q9_profit_by_nation,
        "q11_important_parts": relational2.q11_important_parts,
        "q14_promo_share": relational2.q14_promo_share,
        "q15_top_supplier": relational2.q15_top_supplier,
        "ann_pq_recall_report": pq.ann_pq_recall_report,
        "events_user_ewma_calendar": events.events_user_ewma_calendar,
    # ---- freshest driver evidence last: the r11-window cohort,
    # CORRECTNESS_r11-green (44) ----
        "curriculum_plan": pipeline.curriculum_plan,
        "negative_sampling_table": sampling.negative_sampling_table,
        "audio_features": multimodal.audio_features,
        "lexical_diversity_report": quality.lexical_diversity_report,
        "wordpiece_learn": text.wordpiece_learn,
        "wordpiece_encode": text.wordpiece_encode,
        "weighted_sample_es": sampling.weighted_sample_es,
        "doc_perplexity_filter": quality.doc_perplexity_filter,
        "graph_kcore": graph.graph_kcore,
        "tokenizer_fertility": text.tokenizer_fertility,
        "filter_attribution_report": quality.filter_attribution_report,
        "cluster_silhouette": similarity.cluster_silhouette,
        "source_overlap_matrix": dedup.source_overlap_matrix,
        "events_user_ewma": events.events_user_ewma,
        "graph_clustering": graph.graph_clustering,
        "ann_cosine_topk": similarity.cosine_topk_bruteforce,
        "ann_cosine_topk_filtered": similarity.cosine_topk_filtered,
        "ann_cosine_topk_lsh": similarity.cosine_topk_lsh,
        "ann_cosine_topk_sq8": similarity.cosine_topk_sq8,
        "collections_showcase": scalar_showcase.collections_showcase,
        "collections_showcase2": scalar_showcase.collections_showcase2,
        "embedding_near_dup": similarity.embedding_near_dup,
        "events_asof_join": asof.events_asof_latest_order,
        "events_range_join": rangejoin.events_purchase_window,
        "text_quality": text.quality_score,
        "text_chunking": text.chunk_documents,
        "text_tfidf_top_terms": text.tfidf_top_terms,
        "bpe_merge_candidates": text.bpe_merge_candidates,
        "events_retention_cohorts": events.retention_cohorts,
        "events_rolling_window": events.events_rolling_window,
        "orders_priority_pivot": relational2.orders_priority_pivot,
        "lineitem_metrics_unpivot": relational2.lineitem_metrics_unpivot,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_edit_distance": dedup.DEDUP_EDIT_DISTANCE_SQL,
        "ann_cosine_topk_binary": similarity.COSINE_BINARY_SQL,
        "term_burstiness_report": quality.TERM_BURSTINESS_SQL,
        "table_profile": relational2.TABLE_PROFILE_SQL,
        "subsample_frequent_words": sampling.SUBSAMPLE_SQL,
        "ann_rbo_report": similarity.ANN_RBO_SQL,
        "graph_assortativity": graph.GRAPH_ASSORTATIVITY_SQL,
        "kmv_overlap_report": sketches.KMV_OVERLAP_SQL,
        "ivf_balance_report": similarity.IVF_BALANCE_SQL,
        "whitening_isotropy_report": similarity.WHITENING_ISOTROPY_SQL,
        "events_seasonality_report": events.SEASONALITY_SQL,
        "textrank_keywords": text.TEXTRANK_SQL,
        "events_interarrival_report": events.INTERARRIVAL_SQL,
        "pca_projection_report": similarity.PCA_PROJECTION_SQL,
        "minhash_oph_report": dedup.MINHASH_OPH_SQL,
        "embedding_isotropy_report": similarity.ISOTROPY_SQL,
        "ngram_entropy_report": quality.NGRAM_ENTROPY_SQL,
        "stupid_backoff_ppl": text.STUPID_BACKOFF_SQL,
        "wordpiece_learn_subword": text.WPS_LEARN_SQL,
        "wordpiece_encode_subword": text.WPS_ENCODE_SQL,
        "audio_features": multimodal.AUDIO_FEATURES_SQL,
        "cdc_chunk_dedup": dedup.CDC_SQL,
        "quantile_sketch_calibration": sketches.QUANTILE_SKETCH_SQL,
        "quality_classifier_calibration": classify.QC_CALIBRATION_SQL,
        "negative_sampling_table": sampling.NEGATIVE_SAMPLING_SQL,
        "curriculum_plan": pipeline.CURRICULUM_SQL,
        "tokenizer_compression_curve": text.COMPRESSION_CURVE_SQL,
        "dedup_pair_explain": dedup.PAIR_EXPLAIN_SQL,
        "embedding_correlation_report": similarity.CORRELATION_REPORT_SQL,
        "lexical_diversity_report": quality.LEXICAL_DIVERSITY_SQL,
        "bootstrap_ci_report": sampling.BOOTSTRAP_CI_SQL,
        "quality_classifier_pr_curve": classify.QC_PR_CURVE_SQL,
        "events_percentile_drift": events.PERCENTILE_DRIFT_SQL,
        "charset_profile": quality.CHARSET_PROFILE_SQL,
        "embedding_snapshot_drift": snapshot.EMBEDDING_SNAPSHOT_DRIFT_SQL,
        "ingest_delta_pipeline": snapshot.INGEST_DELTA_SQL,
        "wordpiece_encode": text.WP_ENCODE_SQL,
        "nb_langid_top_features": classify.NB_TOP_FEATURES_SQL,
        "wordpiece_learn": text.WP_LEARN_SQL,
        "nb_langid_report": classify.NB_LANGID_SQL,
        "quality_classifier_report": classify.QUALITY_CLASSIFIER_SQL,
        "corpus_snapshot_diff": snapshot.CORPUS_SNAPSHOT_DIFF_SQL,
        "ann_persisted_topk": similarity.COSINE_IVF_SQL,
        "text_bigram_surprisal": text.BIGRAM_SURPRISAL_SQL,
        "bpe_merge_candidates": text.BPE_SQL,
        "bpe_learn_merges": text.BPE_LEARN_SQL,
        "bpe_encode": text.BPE_ENCODE_SQL,
        "ann_pq_topk": pq.PQ_SQL,
        "ann_pq_recall_report": pq.PQ_RECALL_SQL,
        "ann_ivfadc": ann_index.IVFADC_SQL,
        "events_user_ewma": events.EWMA_SQL,
        "events_user_ewma_calendar": events.EWMA_CALENDAR_SQL,
        "kn_bigram_perplexity": text.KN_PERPLEXITY_SQL,
        "weighted_sample_es": sampling.WEIGHTED_SAMPLE_SQL,
        "doc_perplexity_filter": quality.DOC_PERPLEXITY_FILTER_SQL,
        "heavy_hitters": sketches.HEAVY_HITTERS_SQL,
        "graph_kcore": graph.KCORE_SQL,
        "tokenizer_fertility": text.TOKENIZER_FERTILITY_SQL,
        "tokenizer_fertility_subword": text.TOKENIZER_FERTILITY_SUBWORD_SQL,
        "unigram_lm_train": text.ULM_TRAIN_SQL,
        "unigram_lm_vocab": text.ULM_VOCAB_SQL,
        "unigram_lm_prune": text.ULM_PRUNE_SQL,
        "hll_calibration_report": sketches.HLL_SQL,
        "collocation_pmi_report": text.COLLOCATION_PMI_SQL,
        "unigram_encode": text.ULM_ENCODE_SQL,
        "lsh_bucket_skew_report": dedup.LSH_BUCKET_SKEW_SQL,
        "lsh_curve_report": dedup.LSH_CURVE_SQL,
        "dedup_weighted_jaccard": dedup.DEDUP_WEIGHTED_JACCARD_SQL,
        "embedding_dim_ablation": similarity.DIM_ABLATION_SQL,
        "domain_epoch_plan": hygiene.DOMAIN_EPOCH_SQL,
        "decontam_ngram_ladder": decontam.DECONTAM_LADDER_SQL,
        "dedup_modality_agreement": dedup.DEDUP_MODALITY_SQL,
        "packing_efficiency_report": sampling.PACKING_EFFICIENCY_SQL,
        "dedup_normalization_report": dedup.DEDUP_NORMALIZATION_SQL,
        "dataset_split_by_cluster": graph.SPLIT_BY_CLUSTER_SQL,
        "source_token_drift": quality.SOURCE_DRIFT_SQL,
        "ann_nprobe_curve": similarity.NPROBE_CURVE_SQL,
        "dedup_threshold_sweep": dedup.DEDUP_SWEEP_SQL,
        "dedup_paragraphs": dedup.DEDUP_PARAGRAPHS_SQL,
        "dedup_canonical_quality": graph.CANONICAL_QUALITY_SQL,
        "ngram_novelty_report": dedup.NGRAM_NOVELTY_SQL,
        "embedding_outlier_report": similarity.OUTLIER_REPORT_SQL,
        "simhash_estimate_report": dedup.SIMHASH_ESTIMATE_SQL,
        "filter_attribution_report": quality.FILTER_ATTRIBUTION_SQL,
        "cluster_silhouette": similarity.CLUSTER_SILHOUETTE_SQL,
        "jl_projection_report": similarity.JL_REPORT_SQL,
        "rake_keywords": text.RAKE_SQL,
        "minhash_estimate_report": dedup.MINHASH_ESTIMATE_SQL,
        "bbit_minhash_report": dedup.BBIT_MINHASH_SQL,
        "cms_calibration_report": sketches.CMS_CALIBRATION_SQL,
        "bloom_decontaminate_report": decontam.BLOOM_DECONTAM_SQL,
        "dedup_attribution_report": dedup.DEDUP_ATTRIBUTION_SQL,
        "source_overlap_matrix": dedup.SOURCE_OVERLAP_SQL,
        "global_percentiles_exact": sketches.GLOBAL_PERCENTILES_SQL,
        "graph_clustering": graph.GRAPH_CLUSTERING_SQL,
        "text_zipf_profile": quality.ZIPF_SQL,
        "bpe_learn_merges_bytes": text.BPE_BYTES_SQL,
        "events_retention_cohorts": events.RETENTION_SQL,
        "ann_index_refresh": ann_index.REFRESH_SQL,
        "events_rolling_window": events.ROLLING_SQL,
        "orders_priority_pivot": relational2.PRIORITY_PIVOT_SQL,
        "lineitem_metrics_unpivot": relational2.UNPIVOT_SQL,
        "lineitem_correlations": relational2.CORRELATIONS_SQL,
        "knn_pagerank": graph.PAGERANK_SQL,
        "graph_report": graph.GRAPH_REPORT_SQL,
        "ann_persisted_sq8": ann_index.PERSISTED_SQ8_SQL,
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
