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
# record through round 10: 222/222 registered queries have a driver row,
# all hash-matched, 0 failures. Round-11 rotation: the four r11 additions
# lead (never checked), then the two gates whose r10 code change landed in
# the end-of-round snapshot AFTER the r10 list was written (the breach the
# r10 verdict flagged — their driver rows predate their code), then the
# queries whose CODE changed in round 11 (MERGE's duplicate-source check
# gained a collision-proof alias; vacuum gained the uncommitted-reclaim
# audit log; count_rows' guard became a RuntimeError; history()'s citation
# was corrected; the decontamination oracles now compose from a shared
# named CTE constant instead of string surgery; the Bloom k-probe loop was
# factored into _attach_bloom_probes shared with the new sharded
# transport; CHECK-constraint enforcement moved into a helper shared with
# the UPDATE/MERGE rewrite paths, which now refuse violating DML like
# Delta — adding update_where/constrained_write/schema_evolution_read
# here), then the 2 r4 names the r10 50-cap cut, then the r5-stale
# block. 4+2+11+2 = 19 ahead of the 45 r5 names -> the 50-cap reaches 31 of
# them; the last 14 r5 names are the documented round-12 carry. Names
# absent from this tuple (latest row r7-r10) rank last in registration
# order.
_CHECK_PRIORITY: tuple[str, ...] = (
    # --- round-11 additions (never driver-checked) ---
    "txlog_cdf_ops",
    "corpus_decontamination_bloom_sharded",
    "streaming_sink_orc_roundtrip",
    "streaming_txlog_skip_change_commits",
    # --- r10 snapshot-commit gates: code changed after the r10 list froze ---
    "streaming_txlog_source_feed", "streaming_scd2_txlog",
    # --- code changed in round 11 -> re-verify ---
    "txlog_merge_upsert", "txlog_vacuum", "txlog_vacuum_retention",
    "txlog_metadata_count", "txlog_history",
    "txlog_update_where", "txlog_constrained_write",
    "txlog_schema_evolution_read",
    "corpus_decontamination", "corpus_decontamination_bloom",
    "ngram_novelty_bloom",
    # --- last checked r4 (the documented r10 50-cap carry) ---
    "events_dau_wau_approx", "multimodal_video_nal_index",
    # --- last checked r5 (the 50-cap reaches 31; the last 14 = round 12) ---
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
