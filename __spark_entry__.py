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
# record through round 12: 230/230 registered queries have a driver row,
# all hash-matched, 0 failures; the staleness ledger entering round 13 is
# 23@r7 / 42@r8 / 39@r9 / 39@r10 / 37@r11 / 50@r12. Round-13 rotation:
# the three r13 additions lead (never checked: timestamp-based time
# travel, column-mapping RENAME/DROP, maxBytesPerTrigger admission), then
# the gates whose EXECUTED code changed in round 13 — table_changes was
# rewritten (lazy in-plan dup-key guard, column-mapping projection,
# timestamp range args), validated_write gained the persist fusion +
# logical->physical write translation (constrained write + schema
# evolution), the DML write/rewrite paths route through _to_physical
# (update/merge via _write_files_checked, delete's rewrite class),
# read_version/restore gained the timestamp axis and the mapping
# projection, snapshot_files translates predicate columns, write_files
# records add.size on every stats action (EVERY txlog gate builds its
# table through it — so txlog_compaction / vacuum / vacuum_retention /
# metadata_count / history rejoin the block this round), the sharding
# sweep gained the zero-denominator FPR guard, and txlog_stream gained
# startingTimestamp / startingVersion validation / the vacuumed-horizon
# planning check / the byte+file combined admission walk / the DV-URI
# fail-loud (all six txlog-backed streaming gates construct that reader
# or run DML). Then the whole 23-name r7 tier (the documented r12 carry
# — after this round NOTHING is older than r8). 3+24+23 = 50 exactly;
# the 42 r8 names are the documented round-14 carry. Names absent from
# this tuple (latest row r8-r12) rank last in registration order.
_CHECK_PRIORITY: tuple[str, ...] = (
    # --- round-13 additions (never driver-checked) ---
    "txlog_time_travel_ts",
    "txlog_rename_column",
    "streaming_txlog_rate_limit_bytes",
    # --- code changed in round 13 -> re-verify ---
    "txlog_cdf_ops", "txlog_constrained_write", "txlog_schema_evolution_read",
    "txlog_delete_where", "txlog_delete_dv", "txlog_update_where",
    "txlog_merge_upsert", "txlog_time_travel", "txlog_restore",
    "txlog_data_skipping", "txlog_zorder_skipping", "txlog_change_feed",
    "txlog_compaction", "txlog_vacuum", "txlog_vacuum_retention",
    "txlog_metadata_count", "txlog_history",
    "corpus_decontamination_sharding_sweep",
    "streaming_txlog_source_feed", "streaming_txlog_skip_change_commits",
    "streaming_txlog_cdf_feed", "streaming_txlog_rate_limit",
    "streaming_scd2_txlog", "streaming_txlog_idempotent_replay",
    # --- last checked r7 (the full tier burns; nothing older than r8 after) ---
    "ab_test_welch", "asof_join_next_order", "cdc_wire_schema_introspection",
    "corpus_exact_k_sample", "corpus_pipeline_end_to_end",
    "corpus_temperature_weights", "customer_rfm_scores",
    "dedup_minhash_incremental", "dedup_threshold_sweep",
    "embedding_random_projection", "events_mad_robust_zscore",
    "events_markov_transitions", "events_ohlc_bars", "events_time_to_convert",
    "events_time_weighted_avg", "events_top_paths",
    "late_arriving_dim_inferred", "simhash_hamming_neardup",
    "streaming_complete_mode_topk", "streaming_outer_join_unmatched",
    "streaming_update_mode_counts", "text_commonness_score",
    "text_feature_hashing",
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
