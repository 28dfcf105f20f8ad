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
# record through round 11: 226/226 registered queries have a driver row,
# all hash-matched, 0 failures. Round-12 rotation: the three r12 additions
# lead (never checked: deletion-vector DELETE, the streaming CDF feed, the
# maxFilesPerTrigger admission gate), then every gate whose CODE changed in
# round 12 — a wide block this round because deletion vectors touch the
# SHARED READ PATH (read_version and every DML discovery/rewrite scan now
# apply DVs via _scan_files; restore compares whole actions; vacuum
# governs sidecar dirs; count_rows nets cardinality), the CHECK-constraint
# fusion rewrote the UPDATE/MERGE write pass, table_changes gained the
# dup-key guard / empty-range feed / per-commit clash probe / DV-state
# fold, and txlog_stream.py was restructured for the three new options —
# so all 16 txlog_* gates plus the 4 txlog-backed streaming gates
# re-verify (plus the sharded Bloom gate, whose plan builder gained the
# shared-grams parameter for the sweep). Then the 14 r5 names the r11
# 50-cap cut (the documented r12 carry — after this round NOTHING is
# older than r7), then the oldest r7 names. 4+21+14 = 39 -> the 50-cap
# reaches 11 of the 34 remaining r7-stale names (4 of the original 38
# re-verify in the code-changed block); the other 23 r7 names are the
# documented round-13 carry. Names absent from this tuple (latest row
# r7-r11) rank last in registration order.
_CHECK_PRIORITY: tuple[str, ...] = (
    # --- round-12 additions (never driver-checked) ---
    "txlog_delete_dv",
    "streaming_txlog_cdf_feed",
    "streaming_txlog_rate_limit",
    "corpus_decontamination_sharding_sweep",
    # --- code changed in round 12 -> re-verify (txlog read-path family) ---
    "txlog_cdf_ops", "txlog_update_where", "txlog_merge_upsert",
    "txlog_constrained_write", "txlog_schema_evolution_read",
    "txlog_delete_where", "txlog_time_travel", "txlog_change_feed",
    "txlog_compaction", "txlog_data_skipping", "txlog_vacuum",
    "txlog_vacuum_retention", "txlog_zorder_skipping", "txlog_restore",
    "txlog_metadata_count", "txlog_history",
    "streaming_txlog_source_feed", "streaming_txlog_skip_change_commits",
    "streaming_scd2_txlog", "streaming_txlog_idempotent_replay",
    "corpus_decontamination_bloom_sharded",
    # --- last checked r5 (the documented r12 carry; burns the r5 tier) ---
    "merge_scd1_customer", "histogram_price_buckets", "timeseries_gapfill_locf",
    "streaming_python_datasource_drain", "dedup_containment_dfcap", "dedup_containment_recall_sweep",
    "scan_csv_roundtrip", "scan_json_auto_roundtrip", "scan_text_roundtrip",
    "scan_orc_roundtrip", "corpus_split_neardup_safe", "scd2_schema_evolution",
    "multimodal_audio_energy_windows", "sink_dynamic_partition_overwrite",
    # --- last checked r7 (11 of 34 fit; 23 remain = the round-13 carry) ---
    "corpus_stratified_sample", "dedup_exact", "dedup_ngram_jaccard",
    "embedding_quantize_int8", "profile_orders", "dq_audit",
    "corpus_hash_weighted_sample", "null_semantics_audit",
    "dedup_substring_spans", "dedup_containment_pairs",
    "text_charclass_profile",
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
