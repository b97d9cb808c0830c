"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (computes the
full plan including projections that a count() would prune). The
quadratic verification form dedup_ngram_jaccard is deliberately not a
headline (it exists as the oracle twin of the LSH path).

r3: per-query times are MEDIANS over $SPARK_GRAFT_BENCH_ITERS
round-robin passes (default 3) — r2's n<=2 runs made 0.2-0.8s of
JVM/IO noise look like per-query regressions. "value" is the sum of
medians; "spread" records per-query max-min across passes so genuine
regressions are distinguishable from noise in round-over-round diffs.

r11: the contract line carries a NOISE CANARY (VERDICT r10 next#1) —
"canary" is the median wall time of a FIXED constant workload (24M
md5+conv hashes over spark.range, CPU-bound, zero IO, zero data
dependence, one partial-agg shuffle round) run once per pass. The
canary's round-over-round ratio calibrates host speed: a uniform
drift in query times that the canary mirrors is the host, not the
engine (r10's committed artifact showed a 1.43x uniform drift nothing
in the repo could attribute without re-deriving per-query ratios).
Per-pass canary samples land in the diagnostics line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mito_spark.engine import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "top_orders_per_customer",
    "order_priority_distinct_customers",
    "part_type_stats",
    "q2_cheapest_supplier",
    "q4_priority_semi",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation",
    "q10_returned_top_customers",
    "q11_important_parts",
    "q16_supplier_part_variety",
    "q20_heavy_shippers",
    "q21_sole_late_supplier",
    "q15_top_supplier",
    "q12_priority_case_agg",
    "q13_order_count_distribution",
    "q14_promo_share",
    "q17_below_avg_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q22_idle_rich_customers",
    "revenue_rollup",
    "order_cube",
    "sql_grouping_sets",
    "customer_running_totals",
    "nation_set_ops",
    "events_asof_join",
    "events_range_join",
    "events_value_percentiles",
    "events_by_type",
    "events_props_extract",
    "events_props_variant",
    "events_props_presence",
    "sketch_distinct_profile",
    "sessionize",
    "user_activity_windows",
    "events_time_rollup",
    "strings_showcase",
    "crypto_showcase",
    "time_showcase",
    "regexp_showcase",
    "collections_showcase",
    "collections_showcase2",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_cosine_topk_filtered",
    "ann_cosine_topk_lsh",
    # ann_cosine_topk_ivf excluded: ~7 s of its cost is k-means TRAINING,
    # an index-build step amortized across queries in production (recall
    # contract tested in tests/test_operators.py)
    # ...and ann_persisted_topk is exactly that amortization, benched:
    # the first call builds the on-disk index (untimed warmup below
    # covers it via the shared warm pass ordering; the median of 3
    # takes the steady-state query-only cost — the production number)
    "ann_persisted_topk",
    "ann_persisted_sq8",
    "ann_ivfadc",
    "text_token_count",
    "text_lang_id",
    "text_quality",
    "text_fingerprint",
    "text_chunking",
    "text_tfidf_top_terms",
    "multimodal_features",
    "dataset_split",
    "token_pack_bins",
    "training_corpus_pipeline",
    "dedup_connected_components",
    "pii_redaction",
    "stratified_sample",
    "domain_mix",
    "bm25_search",
    "funnel_analysis",
    "quantize_embeddings",
    "text_surprisal",
    "events_value_anomalies",
    "embedding_dedup_clusters",
    "incremental_dedup",
    "ann_cosine_topk_sq8",
    "domain_mix_temperature",
    "dedup_containment",
    # new in r5 (semdedup excluded like IVF: its cost is dominated by
    # the same k-means training step; behavior covered by its oracle
    # row + tests/test_semdedup_dsir.py)
    "dsir_importance_weights",
    "dsir_resample",
    "knn_graph",
    "text_winnow_fingerprints",
    "winnow_dup_pairs",
    "jaccard_prefix_join",
    "mmr_rerank",
    # embedding_cluster_profile excluded like IVF/semdedup: k-means
    # training dominates; oracle row + tests cover behavior
    # new in r5 wave 2
    "exact_substring_spans",
    "boilerplate_ngrams",
    "span_rewrite",
    "hybrid_search_rrf",
    "vocab_coverage",
    "seq_length_histogram",
    "corpus_shuffle",
    "split_leakage_check",
    # lsh_recall_report excluded: its cost IS the exact t=0.5 prefix
    # join it uses as ground truth (deliberately expensive); oracle
    # row + planted-dup test cover behavior
    # label_propagation and dedup_cluster_stats excluded like
    # IVF/semdedup: their cost IS the kNN-graph / CC build they
    # compose (knn_graph and dedup_connected_components are benched);
    # behavior covered by oracle rows + tests/test_graph.py
    "c4_quality_filters",
    "surprisal_buckets",
    "contrastive_pairs",
    "events_retransmit_dedup",
    # new in r6
    "text_bigram_surprisal",
    "bpe_merge_candidates",
    "events_retention_cohorts",
    "events_rolling_window",
    "orders_priority_pivot",
    "lineitem_metrics_unpivot",
    "lineitem_correlations",
    # knn_pagerank excluded like label_propagation: its cost IS the
    # kNN-graph build it composes (knn_graph is benched); behavior
    # covered by its unrolled oracle row + tests
    "bpe_learn_merges",
    # (bpe_learn_merges joined the headline once the contains-both
    # prefilter made its fold cost proportional to matching docs;)
    # ann_index_refresh excluded like IVF/semdedup: k-means-training-
    # dominated (oracle row + totality test cover behavior)
    # new in r7
    "bpe_learn_merges_bytes",
    "events_user_ewma",
    "text_zipf_profile",
    # new in r8
    "events_user_ewma_calendar",
    "kn_bigram_perplexity",
    "weighted_sample_es",
    # bpe_encode excluded like label_propagation: its cost IS the
    # bpe_learn_merges loop it composes (benched above) plus one
    # projection; oracle row covers behavior.
    # graph_report excluded for the same composition rule: its cost is
    # knn_graph (benched) + lp + pagerank reuse; the A/B lives in
    # BENCH_NOTES.
    # ann_pq_topk excluded like IVF/semdedup: m concurrent k-means
    # TRAINING chains dominate at gate SF (oracle row + recall test
    # cover behavior; ADC scoring is the scale story, not the gate-SF
    # wall time). ann_ivfadc IS benched above with the other persisted
    # serving tiers: its build (cells + codebooks + codes) amortizes
    # in the untimed warmup, the measured number is the steady-state
    # pruned-probe + ADC + re-rank query cost.
    # new in r8: ann_pq_recall_report excluded by the composition rule
    # (its cost is the ann_pq_topk training chains + the benched brute
    # tier + a bounded join; oracle row hash-checks the measurement)
    "heavy_hitters",
    "jl_projection_report",
    "rake_keywords",
    "minhash_estimate_report",
    "global_percentiles_exact",
    # dedup_attribution_report and source_overlap_matrix excluded by
    # the composition rule: their cost IS the benched dedup tiers they
    # compose plus bounded rollups; oracle rows + tests cover behavior.
    # doc_perplexity_filter / filter_attribution_report /
    # tokenizer_fertility / graph_kcore excluded by the composition
    # rule: their cost IS the benched chains they compose
    # (kn_bigram_perplexity, the C4/Gopher passes, bpe_learn_merges,
    # knn_graph) plus bounded rollups; oracle rows cover behavior.
    # cluster_silhouette excluded like embedding_cluster_profile /
    # IVF / semdedup: k-means TRAINING dominates at gate SF; the
    # scoring pass it adds is one projection + one groupBy.
    # new in r9 — additive, no swaps (r8 verdict asked the set to stay
    # monotone): the two ops with their OWN corpus-sized shuffle.
    "dedup_paragraphs",
    "ngram_novelty_report",
    # tokenizer_fertility_subword / dedup_canonical_quality excluded by
    # the composition rule (bpe_learn_merges_bytes + lang_id + a
    # (doc,word) rollup; the benched CC chain + quality_score);
    # embedding_outlier_report excluded like cluster_silhouette
    # (k-means training dominates at gate SF).
    # simhash_estimate_report excluded by the composition rule (its
    # cost IS the benched dedup_simhash band join + a bounded rollup).
    # bbit_minhash_report excluded by the composition rule (the benched
    # minhash_estimate_report's signature/band chain + 3 masked
    # compares per pair). cms_calibration_report IS benched: its gram
    # sketch is its own corpus-sized aggregate.
    "cms_calibration_report",
    # bloom_decontaminate_report IS benched: its K-position explode +
    # membership semi-join is its own corpus-sized work (decontaminate
    # itself is not separately benched; the exact leg rides inside).
    "bloom_decontaminate_report",
    # unigram_lm_train IS benched: the substring-seed groupBy and the
    # per-round constant-step Viterbi folds over the word-TYPE table
    # are their own corpus-sized work, not a composition of benched
    # chains. unigram_lm_vocab excluded by the two-surface rule (the
    # SAME _ulm_train loop; only the final projection differs).
    "unigram_lm_train",
    # hll_calibration_report IS benched: the 5-domain item explode, the
    # register hash-agg, and the exact COUNT(DISTINCT) yardstick leg
    # are its own corpus-sized work.
    "hll_calibration_report",
    # collocation_pmi_report excluded by the composition rule: its
    # pair explode + count IS bpe_merge_candidates' benched shuffle,
    # plus vocab-bounded broadcast joins and a TakeOrdered.
    # unigram_encode excluded like bpe_encode: its cost IS the benched
    # unigram_lm_train loop plus one more type-table seg pass and a
    # doc-keyed usage rollup.
    # lsh_bucket_skew_report excluded by the composition rule: its
    # cost IS the benched dedup_minhash_lsh signature/band stages plus
    # a (band,key) count and a BANDS-row rollup.
    # dedup_threshold_sweep excluded by the composition rule: ONE
    # benched dedup_minhash_lsh pass + a 5x fan-out of the bounded
    # checkpointed pair frame.
    # new in r10 — additive, no swaps. Each of these owns corpus-sized
    # work beyond already-benched chains:
    "dedup_weighted_jaccard",  # candidate-doc tf explode + min-sum join
    "embedding_dim_ablation",  # 4 prefix-slice brute scorers, one scan
    "decontam_ngram_ladder",  # 3 shingle-width legs off one staged scan
    "packing_efficiency_report",  # shard-local running-sum window
    "dedup_normalization_report",  # 4 normalization hash-groupBys
    "source_token_drift",  # per-source KL drift: its own tokenize scan
    # lsh_curve_report excluded: an OFFLINE tuner whose cost is the
    # benched banding x5 configs + the benched prefix-join truth leg
    # (measured 20.4 s at sf0.1 — BENCH_NOTES r10); its candidate-mass
    # column is the cost model, not a serving path.
    # dedup_modality_agreement excluded by the composition rule (two
    # benched tiers + bounded joins). unigram_lm_prune excluded by the
    # two-surface rule (the benched unigram_lm_train loop + one more
    # round + a vocab-bounded cut). domain_epoch_plan excluded by the
    # composition rule (domain_mix_temperature's benched scan +
    # |sources|-row math).
    # r10 session 3 — additive. Each owns corpus-sized work of its own:
    "wordpiece_learn",  # 3 rounds x (pair-count + unigram-count) shuffles
    "nb_langid_report",  # trigram explode both splits + model join
    "quality_classifier_report",  # hashed-unigram explode + score join
    "corpus_snapshot_diff",  # two scans + full-outer hash join
    # wordpiece_encode excluded by the two-surface rule (the benched
    # wordpiece_learn loop + one size projection);
    # nb_langid_top_features excluded by the composition rule (the
    # benched nb_langid_report model build + vocab-bounded rank math);
    # ingest_delta_pipeline excluded by the composition rule (the
    # benched incremental_dedup chain on a 20% batch + a scan-level
    # word count + a |sources|-row rollup);
    # embedding_snapshot_drift owns one posexplode rollup of its own:
    "embedding_snapshot_drift",
    # charset_profile owns one regexp-arithmetic scan of its own:
    "charset_profile",
    # events_percentile_drift owns per-(type,week) exact-percentile
    # sorts — finer grouping than the benched events_value_percentiles:
    "events_percentile_drift",
    # corpus_snapshot_diff already listed above (full-outer hash join).
    # bootstrap_ci_report owns the B-fold in-task expansion:
    "bootstrap_ci_report",
    # quality_classifier_pr_curve excluded by the composition rule
    # (the benched quality_classifier_report model/score build + a
    # rung fan-out over the bounded margin frame).
    # r11 — additive, no swaps. Each owns corpus-sized work:
    "wordpiece_learn_subword",  # 6 type-table trainer rounds (own loop)
    "cdc_chunk_dedup",  # per-char boundary scan (in-row HOFs) + hash groupBy
    "quantile_sketch_calibration",  # events histogram + per-type sort yardstick
    "negative_sampling_table",  # corpus tokenize + vocab count shuffle
    "audio_features",  # Arrow chunking pass over every payload
    # wordpiece_encode_subword excluded by the two-surface rule (the
    # benched learn loop + the greedy fold over the bounded type table
    # + one corpus word join); quality_classifier_calibration excluded
    # by the composition rule (the benched QC model/score chains + a
    # distributed rank over the eval frame); curriculum_plan excluded
    # by the composition rule (the benched text_surprisal pass + a
    # <=256-row histogram + a scan-level phase tag).
    # r12 (VERDICT r11 next#7): embedding_correlation_report joins the
    # headline — its O(n*d^2/2) dimension-pair shuffle on vec_id is
    # the one genuinely new shuffle shape of r11, trend-track it:
    "embedding_correlation_report",
    # r12: OPH owns its own corpus-sized signature pass (one md5 per
    # shingle + K bin-min passes) on top of the benched k-wise chain —
    # the 100 TB signature-cost alternative, trend-track both:
    "minhash_oph_report",
    # r12: the entropy ladder owns three vocabulary-shuffle groupBys
    # (uni/bi/trigram types) off one staged scan:
    "ngram_entropy_report",
    # r12: stupid backoff owns its trigram model shuffles + the
    # 4-way gram-keyed scoring join on the held-out fifth:
    "stupid_backoff_ppl",
    # pca_projection_report excluded by the composition rule: its
    # corpus-sized work IS embedding_correlation_report's benched
    # moment pass; the d x d iteration is corpus-independent.
    # r12 session 2 — additive, no swaps:
    "ann_cosine_topk_binary",  # sign-packing pass + XOR/popcount Hamming
    # candidate join: a genuinely new integer kernel over the corpus.
    "table_profile",  # the exact multi-distinct Expand aggregate — the
    # one plan shape (|cols|+1-way input replication) nothing else benches.
    "term_burstiness_report",  # per-(doc,term) tf shuffle + vocab moment
    # rollup with the Σtf² second moment (new vs the tfidf/diversity shapes).
    # Excluded by the composition rule: dedup_edit_distance (candidate-
    # bounded DP verify on the benched LSH chain), subsample_frequent_words
    # (the benched negative_sampling vocab shape), ann_rbo_report (a
    # |Q|k join over two benched tiers), graph_assortativity (edge-
    # bounded moments on the benched kNN graph).
]


def _canary(spark) -> None:
    """Fixed constant workload — the host-speed yardstick. 24M rows of
    md5 + base-16 conv + bigint sum: the md5 kernel that dominates the
    dedup/sketch tiers, entirely whole-stage-codegen, no IO, no data
    dependence, so its time moves ONLY with host conditions (CPU
    contention, thermal state, JVM health)."""
    from pyspark.sql import functions as F

    (
        spark.range(0, 24_000_000, 1, 32)
        .select(
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h")
        )
        .agg(F.sum(F.col("h") % 1_000_000_007))  # bounded: no ANSI overflow
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # warm the JVM + parquet footers once (not timed)
    qs["q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # build the persisted ANN index once (not timed): the benched
    # number for ann_persisted_topk is the steady-state QUERY cost —
    # the build is the amortized index step a production service pays
    # once, and it is idempotent (skipped when the index exists)
    if "ann_persisted_topk" in HEADLINE:
        qs["ann_persisted_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    canary_samples: list[float] = []
    import gc

    _canary(spark)  # untimed: JIT-compile the canary's codegen once
    for _ in range(iters):
        gc.collect()
        t0 = time.time()
        _canary(spark)
        canary_samples.append(time.time() - t0)
        for name in HEADLINE:
            fn = qs[name]
            # collect BEFORE the timer: localCheckpoint blocks from
            # prior queries are only freed when their Python DataFrame
            # objects are GC'd (py4j finalizers); without this, block-
            # manager pressure from ~300 prior executions bleeds into
            # later queries' times (measured 5-10% on the heavy dedup
            # shapes). Harness hygiene, not part of the measured work.
            gc.collect()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    times = {name: round(median(xs), 3) for name, xs in samples.items()}
    total = round(sum(times.values()), 3)

    # Diagnostics (iteration spread, aux micro-shapes) go on their OWN
    # earlier line: the driver records only the last ~2000 bytes of
    # stdout and json-parses the final line, so the contract line must
    # stay compact. Rounds 1-3 overflowed this buffer by inlining
    # spread/aux — BENCH_r0{1,2,3}.json all recorded "parsed": null.
    diag = {
        "iters": iters,
        "canary_samples": [round(x, 3) for x in canary_samples],
        "medians": times,  # full 3dp even if the contract line degrades
        "spread": {name: round(max(xs) - min(xs), 3) for name, xs in samples.items()},
    }
    try:
        diag["aux"] = _aux_benches(spark, sf_dir)
    except Exception:  # aux shapes must never break the contract line
        pass
    print(json.dumps({"diagnostics": diag}, separators=(",", ":")))

    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "canary": round(median(canary_samples), 3),
        "queries": times,
        "sf": float(sf),
    }
    # stay under the driver's 2000-byte stdout tail: degrade decimal
    # places until the line fits (full 3dp figures are always in the
    # diagnostics line above); as a last resort drop the cheapest
    # queries from the contract line — they remain in diagnostics
    for dp in (3, 2, 1):
        out["queries"] = {n: round(v, dp) for n, v in times.items()}
        line = json.dumps(out, separators=(",", ":"))
        if len(line) < 1950:
            break
    # same 1950 threshold as the dp-degrade loop above: a line in
    # [1950, 1990) used to ship with only ~10 bytes of margin against
    # the driver's ~2000-byte stdout tail (ADVICE r4)
    by_cost = sorted(times, key=times.get)
    while len(line) >= 1950 and by_cost:
        out["queries"].pop(by_cost.pop(0), None)
        line = json.dumps(out, separators=(",", ":"))
    print(line)
    spark.stop()


def _aux_benches(spark, sf_dir: str) -> dict[str, float]:
    """Micro-shapes mirroring the reference's harness intent
    (BASELINE.md: static expression, nested state extraction, JSON
    round-trip, source-included net) — Spark-native equivalents."""
    from pyspark.sql import functions as F

    from mito_spark.engine import load_table

    aux: dict[str, float] = {}

    def t(name, fn):
        t0 = time.time()
        fn()
        aux[name] = round(time.time() - t0, 3)

    # ≈ hello_world_static: constant/projection-only over a range
    t("static_expr", lambda: spark.range(1_000_000)
      .select((F.col("id") * 2 + 1).alias("x"), F.lit("hello world").alias("s"))
      .write.format("noop").mode("overwrite").save())

    # ≈ nested_collate_map_state: decode JSON state, extract nested field
    ev = load_table(spark, sf_dir, "events")
    props = F.from_json(F.col("props"), "map<string,string>")
    t("nested_state_extract", lambda: ev
      .select("event_id", F.element_at(props, "source").alias("src"))
      .write.format("noop").mode("overwrite").save())

    # ≈ encode_json_state: full JSON round-trip of every event row
    t("json_roundtrip", lambda: ev
      .select(F.to_json(F.struct(*[F.col(c) for c in ev.columns])).alias("j"))
      .select(F.from_json("j", ev.schema.simpleString()).alias("s"))
      .write.format("noop").mode("overwrite").save())

    # ≈ *_net: source-included end-to-end against a local HTTP server
    import http.server
    import threading

    class _H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b'[{"id": 1, "val": "hello world"}]')

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from mito_spark.sources.http_source import parse_json_pages, register

        register(spark)
        url = f"http://127.0.0.1:{srv.server_address[1]}/d?page={{page}}"
        t("http_net", lambda: parse_json_pages(
            spark.read.format("http_paginated")
            .option("url", url).option("n_pages", 64)
            .option("pages_per_partition", 8).load(),
            "id bigint, val string",
        ).write.format("noop").mode("overwrite").save())
    finally:
        srv.shutdown()
    return aux


if __name__ == "__main__":
    main()
