"""Incremental SCD2 maintenance under streaming — the genuinely hard
streaming piece (SURVEY.md §7 item 2): LEAD needs the *next* event, which a
stream hasn't seen yet, so the batch window rewrite cannot run incrementally.

Design (foreachBatch + upsert, the pattern SURVEY.md §4 flags):
- state = the full SCD2 table so far; rows with the open sentinel are the
  "current" dimension rows;
- per micro-batch: dedup/sort the new events per key, close each key's open
  row (its expiration becomes the first new event's ts), chain the new
  events' intervals, leave the last one open;
- only *affected keys* are rewritten — the per-batch cost is O(batch keys),
  not O(dimension).

State store: a parquet directory, atomically swapped per batch (write new
version → repoint). On a lakehouse this is exactly a Delta/Iceberg MERGE
(``WHEN MATCHED AND is_open THEN UPDATE … WHEN NOT MATCHED THEN INSERT``) and
inherits its transactionality; plain parquet-swap keeps this environment
dependency-free while exercising the identical dataflow.

Correctness contract (tested + oracle-checked): after any partition of the
event log into ordered micro-batches, the final state equals the batch
``operators.scd2.scd2`` output on the full log.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from change_data_capture_spark.operators.scd2 import SENTINEL_TS

_PAYLOAD = ("name", "description", "price")


class Scd2State:
    """Versioned parquet-backed SCD2 state with atomic swap."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        self._version = 0
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, v: int) -> str:
        return os.path.join(self.state_dir, f"v{v}")

    def read(self) -> DataFrame | None:
        if self._version == 0:
            return None
        return self.spark.read.parquet(self._path(self._version))

    def write(self, df: DataFrame) -> None:
        nxt = self._version + 1
        df.write.mode("overwrite").parquet(self._path(nxt))
        if self._version:
            shutil.rmtree(self._path(self._version), ignore_errors=True)
        self._version = nxt


def _intervals(decoded: DataFrame) -> DataFrame:
    """Chain a (deduped, lsn-ordered) event set into validity intervals."""
    w = Window.partitionBy("id").orderBy("lsn")
    return decoded.select(
        "id",
        *_PAYLOAD,
        "lsn",
        F.timestamp_millis(F.col("ts_ms")).alias("row_valid_start_timestamp"),
        F.coalesce(
            F.lead(F.timestamp_millis(F.col("ts_ms")), 1).over(w),
            F.lit(SENTINEL_TS).cast("timestamp"),
        ).alias("row_valid_expiration_timestamp"),
    )


def apply_batch(state: Scd2State, batch: DataFrame) -> None:
    """Merge one micro-batch of decoded CDC events into the SCD2 state.

    Touches only affected keys: unaffected state passes through untouched
    (with Delta this is the MERGE's file-skipping; here it's a left-anti
    split on the batch's key set).
    """
    new_events = (
        batch.where(F.col("lsn").isNotNull())
        .dropDuplicates(["id", "lsn"])
        .select("id", *_PAYLOAD, "lsn", "ts_ms")
    )
    prev = state.read()
    if prev is None:
        state.write(_intervals(new_events))
        return

    batch_keys = new_events.select("id").distinct()
    untouched = prev.join(batch_keys, "id", "left_anti")
    affected_state = prev.join(batch_keys, "id", "left_semi")

    # Re-chain affected keys from scratch: every state row is a pseudo-event
    # carrying its original (lsn, start-ts). This keeps history correct even
    # for late events whose LSN lands between already-closed intervals
    # (validity chaining is order-by-LSN, not arrival — SURVEY.md §7).
    pseudo_events = affected_state.select(
        "id",
        *_PAYLOAD,
        "lsn",
        F.unix_millis(F.col("row_valid_start_timestamp")).alias("ts_ms"),
    )
    # events already reflected in state must not re-chain (dedup by id+lsn,
    # state wins — replays across batch boundaries are repaired here)
    fresh = new_events.join(affected_state.select("id", "lsn"), ["id", "lsn"], "left_anti")
    rechained = _intervals(pseudo_events.unionByName(fresh))

    state.write(untouched.unionByName(rechained))


def run_incremental_scd2(
    spark: SparkSession,
    envelope_source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Stream the NDJSON change log and maintain SCD2 incrementally via
    foreachBatch; returns the final state (drained with availableNow)."""
    from change_data_capture_spark.functions.envelope import decode_envelope
    from change_data_capture_spark.sources.ndjson import read_envelope_ndjson

    state = Scd2State(spark, state_dir)
    env = read_envelope_ndjson(spark, envelope_source_dir, streaming=True)

    q = (
        decode_envelope(env)
        .writeStream.foreachBatch(lambda bdf, _bid: apply_batch(state, bdf))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = state.read()
    assert final is not None, "stream produced no batches"
    return final
