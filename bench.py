#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Materialization is a noop datasource write (full execution, no driver-side
row transfer — collect latency is not engine time). One JVM-warmup pass over
a trivial job precedes timing so the first query doesn't pay session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    # CDC / flagship
    "scd2_products",
    "cdc_change_log",
    "dim_current_products",
    "streaming_ingest_exactly_once",
    # relational
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q7_nation_volume",
    "q14_promo_revenue",
    "q18_large_orders",
    "topk_orders_per_customer",
    "rollup_nation_segment",
    "q4_late_shipments",
    "q12_priority_shipmode",
    "q19_disjunctive_join",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "q2_min_cost_per_part",
    # round-2 TPC-H widening
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "percentiles_exact",
    "window_distribution_funcs",
    "grouping_sets_customer",
    "lateral_topn_per_nation",
    "stats_corr_regr",
    "events_hopping_windows",
    "embedding_quantize_int8",
    # events / windows / joins
    "window_running_total",
    "events_sessionization",
    "events_tumbling_hourly",
    "asof_join_last_order",
    "range_join_ship_window",
    # LLM-data tier
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cc_minhash",
    "embedding_cosine_neardup",
    "similarity_topk_cosine",
    "text_quality_stats",
    "multimodal_features",
    "corpus_decontamination",
    "dq_audit",
    "semantic_dedup_keeplist",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "text_tfidf_top_terms",
    "text_bigram_counts",
    # corpus hygiene / maintenance (round-2 continuation)
    "pii_redaction",
    "text_repetition_quality",
    "events_anomaly_zscore",
    "merge_scd1_customer",
    "histogram_price_buckets",
    "timeseries_gapfill_locf",
    "pagerank_customer_supplier",
    "incremental_agg_maintenance",
    "events_variant_props",
    "entity_resolution_blocked",
    "kmeans_fixed_point",
    "multimodal_video_framesample",
    # round-3 analytics widening
    "interval_union_coverage",
    "orders_pareto_abc",
    "bpe_pair_counts",
    "embedding_mean_pool",
    "attribution_last_touch",
    "triangle_count_neardup",
    "heavy_hitters_cms",
    "bloom_novelty_probe",
    "calendar_spine_monthly",
    "dedup_substring_spans",
    "dedup_containment_pairs",
    "dedup_containment_dfcap",
    "simhash_hamming_neardup",
    "streaming_dedup_minhash_incremental",
    "streaming_dedup_simhash_incremental",
    "cdc_wire_schema_introspection",
    "corpus_stratified_sample",
    "txlog_time_travel",
    "txlog_change_feed",
    "streaming_txlog_idempotent_replay",
    "txlog_compaction",
    "txlog_data_skipping",
    "txlog_merge_upsert",
    "txlog_vacuum",
    "txlog_zorder_skipping",
    "streaming_txlog_source_feed",
    "txlog_restore",
    "txlog_metadata_count",
    "txlog_constrained_write",
    # round-8 additions: predicate DELETE, retention vacuum, log-governed
    # schema evolution, and the streaming-MERGE-INTO-txlog composite
    "txlog_delete_where",
    "txlog_vacuum_retention",
    "txlog_schema_evolution_read",
    "streaming_scd2_txlog",
    # round-9 additions: predicate UPDATE (completes the DML surface), the
    # Bloom-only novelty production path, and TTL state eviction
    "txlog_update_where",
    "ngram_novelty_bloom",
    "streaming_anomaly_zscore_ttl",
    # round-10 additions: DESCRIBE HISTORY and drain→compact→drain
    "txlog_history",
    "streaming_dedup_compact_midstream",
    "corpus_decontamination_bloom",
    # round-11 additions: Change Data Feed, sharded-Bloom decontamination,
    # ORC streaming sink
    "txlog_cdf_ops",
    "corpus_decontamination_bloom_sharded",
    "streaming_sink_orc_roundtrip",
    "streaming_txlog_skip_change_commits",
    # round-12 additions: deletion-vector DELETE, the streaming CDF feed,
    # and maxFilesPerTrigger admission control
    "txlog_delete_dv",
    "streaming_txlog_cdf_feed",
    "streaming_txlog_rate_limit",
    "corpus_decontamination_sharding_sweep",
    # round-13 additions: timestamp-based time travel, column mapping,
    # byte-budget stream admission
    "txlog_time_travel_ts",
    "txlog_rename_column",
    "streaming_txlog_rate_limit_bytes",
    "corpus_split_neardup_safe",
    "scd2_schema_evolution",
    "multimodal_audio_energy_windows",
    "text_charclass_profile",
    "events_mad_robust_zscore",
    "asof_join_next_order",
    "dedup_minhash_incremental",
    "events_markov_transitions",
    "events_ohlc_bars",
    "events_time_weighted_avg",
    "embedding_random_projection",
    "text_commonness_score",
    "text_feature_hashing",
    "late_arriving_dim_inferred",
    "events_top_paths",
    "ab_test_welch",
    "dedup_threshold_sweep",
    "events_time_to_convert",
    "corpus_pipeline_end_to_end",
    "customer_rfm_scores",
    "cohort_ltv_matrix",
    "nation_balance_percentiles",
    "nation_revenue_share",
    "events_dau_wau",
    "cumulative_unique_users",
    "skew_key_diagnostics",
    "basket_affinity_lift",
    "orders_seasonality_decomposition",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from change_data_capture_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("cdc-spark-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # JVM / codegen warmup (not timed)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    queries = entry.queries()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        # two runs: first pays per-query planning + whole-stage codegen
        # compilation (one-time JVM cost); steady-state is the engine's
        # sustained rate, which is what a long-running cluster sees. Both
        # totals are reported.
        per_run = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            per_run.append(time.perf_counter() - t0)
            # clear BETWEEN runs, not just after the pair: "warm" means
            # JIT/codegen-warm, never data-cached. Several gates return a
            # MATERIALIZED (persisted) result, and Spark's cache manager
            # matches the second invocation's identical logical plan to the
            # first run's cache — measured: corpus_decontamination
            # [9.1, 0.8] s uncleaned vs [2.6, 2.3] cleared, i.e. min-of-2
            # silently reported a cache replay. Clearing here also keeps
            # cached blocks from accumulating across the 130-query run.
            spark.catalog.clearCache()
        cold[name] = round(per_run[0], 3)
        timings[name] = round(min(per_run), 3)

    total = round(sum(timings.values()), 3)
    cold_total = round(sum(cold.values()), 3)

    # Full-fidelity record (3-decimal warm + cold per query) for BENCH.md /
    # the judge; the stdout contract line below is deliberately bounded.
    # Records are CORE-COUNT-STAMPED (r14, VERDICT r13 #5): every run
    # writes BENCH_full_c{N}.json; the unstamped BENCH_full.json is only
    # (re)written at the canonical 32-core config, so the driver's
    # lower-core scaling runs stop clobbering the committed 32-core record.
    here = os.path.dirname(os.path.abspath(__file__))
    record = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "cold_total_sec": cold_total,
        "queries": timings,
        "queries_cold": cold,
    }
    targets = [os.path.join(here, f"BENCH_full_c{cpus}.json")]
    if cpus == 32:
        targets.append(os.path.join(here, "BENCH_full.json"))
    for path in targets:
        with open(path, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)

    def contract_line(qdict: dict[str, float]) -> str:
        return json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "cold_total_sec": cold_total,
                "n_queries": len(timings),
                "queries": qdict,
            },
            separators=(",", ":"),
        )

    # The driver records the tail of stdout; round 2's 63-query line blew
    # past the capture window and BENCH_r02.json got "parsed": null. Keep
    # the line comfortably under the observed ~2 KB window: 2-decimal
    # values, compact separators, and — only if still too long — trim the
    # per-query dict slowest-first (full data is always in BENCH_full.json).
    q2 = {k: round(v, 2) for k, v in timings.items()}
    line = contract_line(q2)
    max_bytes = 1400
    if len(line) > max_bytes:
        kept: dict[str, float] = {}
        for k, v in sorted(q2.items(), key=lambda kv: -kv[1]):
            trial = dict(kept)
            trial[k] = v
            if len(contract_line(trial)) > max_bytes:
                break
            kept = trial
        line = contract_line(kept)

    spark.stop()
    # printed LAST (after spark.stop()) so no later stdout can displace it
    # from the driver's tail capture
    print(line, flush=True)


if __name__ == "__main__":
    main()
