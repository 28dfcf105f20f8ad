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
# record through round 8: 216/216 registered queries have a driver row,
# all hash-matched, 0 failures. Round-9 rotation (the plan the r8 verdict
# encoded): the three r9 additions lead (never checked), then the queries
# whose CODE changed this round (the two streaming dedup gates gained a
# band_store_buckets parameter; txlog delete/vacuum/commit internals were
# touched by the ADVICE fixes; the anomaly gate's slice staging was
# factored into a shared helper), then the 8 r1/r2 stragglers the r8
# 50-row window could not reach, then the 44 remaining r3 names. The cap
# lands ~12 names short of the r3 tail; the leftovers + the r4 (22) +
# r5 (47) sets remain the documented round-10 rotation. Names absent from
# this tuple (latest row r8) rank last in registration order.
_CHECK_PRIORITY: tuple[str, ...] = (
    # --- round-9 additions (never driver-checked) ---
    "txlog_update_where",
    "ngram_novelty_bloom",
    "streaming_anomaly_zscore_ttl",
    # --- code changed in round 9 -> re-verify ---
    "streaming_dedup_minhash_incremental", "streaming_dedup_simhash_incremental",
    "txlog_delete_where", "txlog_vacuum_retention", "streaming_scd2_txlog",
    "streaming_anomaly_zscore",  # slice staging factored into a shared helper
    "ngram_novelty_score",  # gram relation persisted across both consumers
    "txlog_merge_upsert",  # DML scans now read log-governed (evolved) schema
    # --- the 8 r1/r2 stragglers the r8 window missed ---
    "stats_aggregates", "string_agg_nations",
    "setops_all_variants", "join_full_outer", "window_range_frame",
    "posexplode_embedding_dims", "count_distinct_exact",
    "streaming_scd2_incremental",
    # --- last checked r3 (the documented r9 backlog) ---
    "streaming_stream_stream_join", "pagerank_customer_supplier",
    "kmeans_fixed_point", "events_variant_props", "entity_resolution_blocked",
    "incremental_agg_maintenance", "sequence_packing_bins", "contrastive_negative_pairs",
    "multimodal_video_framesample", "multimodal_image_resize", "provenance_file_metadata",
    "orders_mom_growth", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q11_important_stock",
    "q13_customer_distribution", "q15_top_supplier", "q16_parts_suppliers",
    "q17_small_quantity_revenue", "q20_potential_promotion", "scd2_point_in_time_join",
    "snapshot_diff_cdc", "window_rolling_median",
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
