"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``change_data_capture_spark``; query modules
register themselves into the registry at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from change_data_capture_spark.registry import load_all_queries
from change_data_capture_spark.queries import ORACLES, QUERIES

load_all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SCD2 reconstruction, reference README.md:86-125) on
    /root/testdata/sf0.001 — ordered + LIMIT 200 exactly as the reference
    presents it (README.md:121-123)."""
    from pyspark.sql import functions as F

    df = QUERIES["scd2_products"](spark, "/root/testdata/sf0.001")
    return df.orderBy(F.col("id"), F.col("row_valid_start_timestamp")).limit(200)


# The driver's correctness gate walks this dict in order and caps the run at
# 50 rows per round. Order therefore encodes check priority. Cumulative
# record through round 7: 212/212 registered queries have a driver row, 0
# failures (210 hash-matched, 2 rows-only ANN). Round 7 failed to rotate
# this list (r6 ∩ r7 overlap was 50/50), so round 8 rotates hard: round-8
# additions lead (never checked), then queries whose CODE or oracle
# CONTRACT changed this round (bucketed band stores, compaction
# repartition, retention vacuum, the two ANN queries gaining oracles),
# then the backlog strictly oldest-first — 47 names last checked in
# ROUND 1 (flagship scd2_products among them) + 1 from round 2, then the
# r3 / r4 / r5 sets for rounds 9-10. The 50-row cap lands mid-way through
# the r1 section; the overflow (~8 r1/r2 names + all of r3-r5) is the
# explicit round-9 carryover. Names absent from this tuple (the 50
# re-checked green in round 7) rank last in registration order.
_CHECK_PRIORITY: tuple[str, ...] = (
    # --- round-8 additions (never driver-checked) ---
    "txlog_delete_where",
    "txlog_vacuum_retention",
    "txlog_schema_evolution_read",
    "streaming_scd2_txlog",
    # --- code / oracle-contract changed in round 8 -> must re-verify ---
    "streaming_dedup_minhash_incremental", "streaming_dedup_simhash_incremental", "txlog_compaction",
    "txlog_vacuum", "similarity_ivf_topk", "similarity_lsh_buckets",
    # --- last driver-checked in ROUND 1 (47 names, oldest backlog) ---
    "scd2_products", "scd2_products_sql", "scd2_users",
    "cdc_change_log", "dim_current_products", "cdc_dedup_op_counts",
    "q5_region_revenue", "q7_nation_volume", "q14_promo_revenue",
    "q18_large_orders", "join_left_semi", "join_left_anti",
    "q4_late_shipments", "correlated_above_avg_orders", "churned_customers",
    "topk_orders_per_customer", "rollup_nation_segment", "setops_nation_coverage",
    "window_running_total", "window_lead_lag_rank", "scalar_string_funcs",
    "scalar_datetime_funcs", "predicates_conditionals", "scalar_math_funcs",
    "q12_priority_shipmode", "q19_disjunctive_join", "q21_waiting_supplier",
    "q22_global_sales_opportunity", "q2_min_cost_per_part", "events_tumbling_hourly",
    "events_sessionization", "asof_join_last_order", "range_join_ship_window",
    "map_transform_funcs", "json_map_funcs", "array_vector_funcs",
    "events_hopping_windows", "cube_returnflag_status", "pivot_daily_event_types",
    "unpivot_segment_balances", "stats_aggregates", "string_agg_nations",
    "setops_all_variants", "join_full_outer", "window_range_frame",
    "posexplode_embedding_dims", "count_distinct_exact",
    # --- last checked r2 ---
    "streaming_scd2_incremental",
    # --- last checked r3 (round-9 carryover begins here) ---
    "streaming_stream_stream_join", "streaming_anomaly_zscore", "pagerank_customer_supplier",
    "kmeans_fixed_point", "events_variant_props", "entity_resolution_blocked",
    "incremental_agg_maintenance", "sequence_packing_bins", "contrastive_negative_pairs",
    "multimodal_video_framesample", "multimodal_image_resize", "provenance_file_metadata",
    "orders_mom_growth", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q11_important_stock",
    "q13_customer_distribution", "q15_top_supplier", "q16_parts_suppliers",
    "q17_small_quantity_revenue", "q20_potential_promotion", "scd2_point_in_time_join",
    "snapshot_diff_cdc", "ngram_novelty_score", "window_rolling_median",
    "corpus_domain_mixing", "corpus_seeded_shuffle", "percentiles_approx_sketch",
    "streaming_static_enrich", "interval_union_coverage", "orders_pareto_abc",
    "bpe_pair_counts", "embedding_mean_pool", "domain_token_budget",
    "cluster_rep_best_quality", "attribution_last_touch", "triangle_count_neardup",
    "bloom_novelty_probe", "scd3_products", "embedding_dim_stats",
    "ewma_monthly_revenue", "streaming_session_windows", "streaming_tumbling_drain",
    # --- last checked r4 ---
    "streaming_ingest_exactly_once", "dedup_minhash_lsh", "similarity_topk_cosine",
    "scd2_products_b64price", "dedup_cc_minhash", "semantic_dedup_keeplist",
    "multimodal_image_decode_png", "pagerank_dangling", "sequence_packing_sharded",
    "heavy_hitters_cms", "multimodal_image_decode_jpeg", "cohort_ltv_matrix",
    "nation_balance_percentiles", "skew_key_diagnostics", "nation_revenue_share",
    "cumulative_unique_users", "events_dau_wau", "basket_affinity_lift",
    "orders_seasonality_decomposition", "dedup_cluster_size_histogram", "events_dau_wau_approx",
    "multimodal_video_nal_index",
    # --- last checked r5 ---
    "q1_pricing_summary", "q3_shipping_priority", "count_distinct_approx",
    "dedup_connected_components", "multimodal_features", "stats_corr_regr",
    "grouping_sets_customer", "window_distribution_funcs", "lateral_topn_per_nation",
    "text_quality_stats", "token_counting", "lang_id_heuristic",
    "doc_fingerprint", "document_chunking", "corpus_lang_source_profile",
    "corpus_train_eval_split", "simhash_signatures", "embedding_cosine_neardup",
    "streaming_scd2_multibatch", "percentiles_exact", "salted_join_supplier_revenue",
    "multimodal_image_decode", "multimodal_audio_decode", "events_funnel_conversion",
    "events_retention_cohorts", "text_tfidf_top_terms", "text_bigram_counts",
    "corpus_decontamination", "calendar_spine_monthly", "pii_redaction",
    "text_repetition_quality", "url_domain_stats", "events_anomaly_zscore",
    "merge_scd1_customer", "histogram_price_buckets", "timeseries_gapfill_locf",
    "streaming_python_datasource_drain", "dedup_containment_dfcap", "dedup_containment_recall_sweep",
    "scan_csv_roundtrip", "scan_json_auto_roundtrip", "scan_text_roundtrip",
    "scan_orc_roundtrip", "corpus_split_neardup_safe", "scd2_schema_evolution",
    "multimodal_audio_energy_windows", "sink_dynamic_partition_overwrite",
)


def _ordered(names: dict) -> dict:
    rank = {n: i for i, n in enumerate(_CHECK_PRIORITY)}
    ordered = sorted(names, key=lambda n: (rank.get(n, len(rank)), 0))
    # stable sort keeps registration order within each rank bucket
    return {n: names[n] for n in ordered}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in driver-check
    priority order (see ``_CHECK_PRIORITY``)."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for the genuinely
    non-SQL-expressible ones — the driver records a rows-only check)."""
    return _ordered(dict(ORACLES))
