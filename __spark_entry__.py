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
# record through round 9: 219/219 registered queries have a driver row,
# all hash-matched, 0 failures. Round-10 rotation (the plan the r9 verdict
# encoded): the three r10 additions lead (never checked), then the queries
# whose CODE changed this round (the novelty trio was refactored into
# materialize-then-unpersist plan builders and the Bloom gate gained m/k
# parameters + a broadcast-bitmap transport; txlog update_where gained
# store-assignment type validation; the DML entry points now stamp
# operation names into commits for history(); the minhash drain gained the
# mid-stream compaction hook; the anomaly slice staging gained the
# empty-input/empty-slice guards; the two SCD2 stream gates' state-read
# asserts became explicit RuntimeErrors; corpus_decontamination moved to
# the shared persisted gram builder; the late-round txlog review pass
# changed MERGE/RESTORE/VACUUM semantics and the stats encoding, adding
# the vacuum pair + data_skipping here), then the 11 r3 leftovers the r9
# window could not reach (the 12th r3-stale name, bloom_novelty_probe,
# already sits in the code-changed group above), then the r4 set (22).
# That totals 52 — the 50-cap cuts the last 2 r4 names, which join the
# r5 block as the documented round-11 rotation. Names absent from this
# tuple (latest row r6-r9) rank last in registration order.
_CHECK_PRIORITY: tuple[str, ...] = (
    # --- round-10 additions (never driver-checked) ---
    "txlog_history",
    "streaming_dedup_compact_midstream",
    "corpus_decontamination_bloom",
    # --- code changed in round 10 -> re-verify ---
    "ngram_novelty_bloom", "ngram_novelty_score", "bloom_novelty_probe",
    "txlog_update_where", "txlog_delete_where", "txlog_merge_upsert",
    "txlog_restore", "txlog_vacuum", "txlog_vacuum_retention",
    "txlog_data_skipping",
    "streaming_dedup_minhash_incremental",
    "streaming_anomaly_zscore", "streaming_anomaly_zscore_ttl",
    "streaming_scd2_incremental", "streaming_scd2_multibatch",
    "corpus_decontamination",
    # --- last checked r3 (the documented r9 leftovers) ---
    "attribution_last_touch", "bpe_pair_counts", "cluster_rep_best_quality", "domain_token_budget",
    "embedding_dim_stats", "embedding_mean_pool", "ewma_monthly_revenue",
    "scd3_products", "streaming_session_windows", "streaming_tumbling_drain",
    "triangle_count_neardup",
    # --- last checked r4 ---
    "streaming_ingest_exactly_once", "dedup_minhash_lsh", "similarity_topk_cosine",
    "scd2_products_b64price", "dedup_cc_minhash", "semantic_dedup_keeplist",
    "multimodal_image_decode_png", "pagerank_dangling", "sequence_packing_sharded",
    "heavy_hitters_cms", "multimodal_image_decode_jpeg", "cohort_ltv_matrix",
    "nation_balance_percentiles", "skew_key_diagnostics", "nation_revenue_share",
    "cumulative_unique_users", "events_dau_wau", "basket_affinity_lift",
    "orders_seasonality_decomposition", "dedup_cluster_size_histogram", "events_dau_wau_approx",
    "multimodal_video_nal_index",
    # --- last checked r5 (the 50-cap reaches ~2 of these; rest = round 11) ---
    "q1_pricing_summary", "q3_shipping_priority", "count_distinct_approx",
    "dedup_connected_components", "multimodal_features", "stats_corr_regr",
    "grouping_sets_customer", "window_distribution_funcs", "lateral_topn_per_nation",
    "text_quality_stats", "token_counting", "lang_id_heuristic",
    "doc_fingerprint", "document_chunking", "corpus_lang_source_profile",
    "corpus_train_eval_split", "simhash_signatures", "embedding_cosine_neardup",
    "percentiles_exact", "salted_join_supplier_revenue",
    "multimodal_image_decode", "multimodal_audio_decode", "events_funnel_conversion",
    "events_retention_cohorts", "text_tfidf_top_terms", "text_bigram_counts",
    "calendar_spine_monthly", "pii_redaction",
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
