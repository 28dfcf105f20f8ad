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
# record through round 5: 198/198 registered queries have a driver row, 0
# failures. Round 6 keeps the registration discipline (≤15 new per round):
# the 14 round-6 additions lead (never checked), the 3 queries whose code
# changed this round follow, then the 8-query carryover whose last driver
# row is r01-r03 (they missed r05's cap window — ADVICE r5 flagged exactly
# this overflow), then the set last checked in r04. 14+3+8 = 25 + the first
# 25 of the r04 set fill the 50-row cap; the r04 set's last 23 names carry
# to round 7 (stated here so the overflow is explicit, not silent).
_CHECK_PRIORITY: tuple[str, ...] = (
    # --- round-6 additions: M1 wire-schema introspection, streaming SimHash
    # incremental dedup, transaction-log family (time travel / change feed /
    # idempotent streaming replay / compaction+checkpoint / data skipping /
    # file-pruned MERGE / vacuum / z-order multi-axis skipping / txlog as
    # a streaming SOURCE / RESTORE / metadata-only COUNT / schema
    # enforcement + CHECK constraints) ---
    "cdc_wire_schema_introspection",
    "streaming_dedup_simhash_incremental",
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
    # --- code changed in round 6 → must re-verify ---
    "streaming_dedup_minhash_incremental",  # candidate-sized verify rebuild
    "corpus_stratified_sample",             # exact-fraction, now oracle-checked
    "simhash_hamming_neardup",              # band rel factored for streaming reuse
    # --- 3-round-stale carryover (last green r01-r03; missed r05's window) ---
    "corpus_hash_weighted_sample",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "similarity_ivf_topk",
    "similarity_lsh_buckets",
    "embedding_quantize_int8",
    "profile_orders",
    "dq_audit",
    # --- last checked r04 (oldest full section; first 37 fit the cap) ---
    "null_semantics_audit",
    "dedup_substring_spans",
    "dedup_containment_pairs",
    "text_charclass_profile",
    "streaming_outer_join_unmatched",
    "events_mad_robust_zscore",
    "asof_join_next_order",
    "dedup_minhash_incremental",
    "streaming_update_mode_counts",
    "events_markov_transitions",
    "events_ohlc_bars",
    "events_time_weighted_avg",
    "embedding_random_projection",
    "text_commonness_score",
    "text_feature_hashing",
    "corpus_temperature_weights",
    "late_arriving_dim_inferred",
    "streaming_complete_mode_topk",
    "events_top_paths",
    "ab_test_welch",
    "dedup_threshold_sweep",
    "events_time_to_convert",
    "corpus_exact_k_sample",
    "corpus_pipeline_end_to_end",
    "customer_rfm_scores",
    # cap boundary ~here; the 23 below are the round-7 carryover
    "cohort_ltv_matrix",
    "nation_balance_percentiles",
    "skew_key_diagnostics",
    "nation_revenue_share",
    "cumulative_unique_users",
    "events_dau_wau",
    "basket_affinity_lift",
    "orders_seasonality_decomposition",
    "dedup_cluster_size_histogram",
    "events_dau_wau_approx",
    "multimodal_video_nal_index",
    "streaming_ingest_exactly_once",
    "scd2_products_b64price",
    "dedup_minhash_lsh",
    "dedup_cc_minhash",
    "similarity_topk_cosine",
    "semantic_dedup_keeplist",
    "heavy_hitters_cms",
    "pagerank_dangling",
    "sequence_packing_sharded",
    "multimodal_image_decode_png",
    "multimodal_image_decode_jpeg",
    "streaming_scd2_incremental",
    # --- checked green in r05's window — lowest priority this round ---
    "scan_csv_roundtrip",
    "scan_json_auto_roundtrip",
    "scan_text_roundtrip",
    "scan_orc_roundtrip",
    "corpus_split_neardup_safe",
    "scd2_schema_evolution",
    "multimodal_audio_energy_windows",
    "sink_dynamic_partition_overwrite",
    "dedup_containment_dfcap",
    "dedup_containment_recall_sweep",
    "streaming_python_datasource_drain",
    "simhash_signatures",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "events_funnel_conversion",
    "corpus_decontamination",
    "streaming_scd2_multibatch",
    "dedup_connected_components",
    "embedding_cosine_neardup",
    "multimodal_features",
    "multimodal_image_decode",
    "multimodal_audio_decode",
    "stats_corr_regr",
    "grouping_sets_customer",
    "window_distribution_funcs",
    "lateral_topn_per_nation",
    "count_distinct_approx",
    "percentiles_exact",
    "salted_join_supplier_revenue",
    "events_retention_cohorts",
    "events_anomaly_zscore",
    "merge_scd1_customer",
    "histogram_price_buckets",
    "timeseries_gapfill_locf",
    "calendar_spine_monthly",
    "text_quality_stats",
    "token_counting",
    "lang_id_heuristic",
    "doc_fingerprint",
    "document_chunking",
    "text_tfidf_top_terms",
    "text_bigram_counts",
    "text_repetition_quality",
    "pii_redaction",
    "url_domain_stats",
    "corpus_lang_source_profile",
    "corpus_train_eval_split",
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
