"""Driver-gate entries for the streaming pipeline. Each runs a real
Structured Streaming query (file source, availableNow trigger) against a
scratch workspace and returns the materialized result — so the DuckDB oracle
can check an *actual streaming execution*, not a batch stand-in:

- ``streaming_ingest_exactly_once``: NDJSON change log → watermark +
  (id,lsn) dedup → partitioned parquet sink; output = the landed table.
- ``streaming_scd2_incremental``: foreachBatch incremental SCD2 over
  multiple micro-batches; output = final state, which must equal the batch
  flagship — it shares the flagship's oracle SQL.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from change_data_capture_spark.operators.cdc_queries import _SCD2_ORACLE
from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.cdc_generator import (
    CDC_EVENTS_SQL,
    product_change_events,
)
_INGEST_ORACLE = f"""
WITH {CDC_EVENTS_SQL}
SELECT id, op, lsn, ts_ms, name, CAST(price AS DOUBLE) AS price,
       strftime(epoch_ms(ts_ms), '%Y-%m-%d') AS ingest_date,
       strftime(epoch_ms(ts_ms), '%H') AS ingest_hour
FROM cdc_events
QUALIFY row_number() OVER (PARTITION BY id, lsn ORDER BY ts_ms) = 1
"""


@query("streaming_ingest_exactly_once", oracle=_INGEST_ORACLE)
def streaming_ingest_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming ingest (S4-S7 parity): generate the envelope
    change log as time-partitioned NDJSON (the reference's S3 object layout),
    stream it through watermark + dedup into a checkpointed, partitioned
    parquet sink, then return the landed table. The oracle is the deduped
    event log — replayed (id,lsn) duplicates must NOT land twice."""
    from change_data_capture_spark.streaming.pipeline import ingest_stream

    ws = tempfile.mkdtemp(prefix="cdc_ingest_")
    src, sink, ckpt = f"{ws}/log", f"{ws}/landed", f"{ws}/ckpt"

    # the NDJSON log plays the Kafka topic's role: a handful of append-only
    # segment files (time-partitioned *landing* happens at the sink — S7)
    product_change_events(spark, sf_dir).repartition(8).write.mode(
        "overwrite"
    ).json(src)
    # Size the dedup state store to the topic, not to the session's batch
    # shuffle width: 8 state partitions for this event volume (each state
    # partition pays a per-batch commit). Restore the session conf after the
    # drain — it is read once at stream start.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        ingest_stream(
            spark, src, sink, ckpt, available_now=True, state_partitions=8
        ).awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    landed = spark.read.parquet(sink)
    # partition-dir values come back type-inferred (date / int); restore the
    # canonical string forms for comparison
    return landed.select(
        "id", "op", "lsn", "ts_ms", "name",
        F.col("price").cast("double").alias("price"),
        F.col("ingest_date").cast("string").alias("ingest_date"),
        F.lpad(F.col("ingest_hour").cast("string"), 2, "0").alias("ingest_hour"),
    )


@query("streaming_scd2_incremental", oracle=_SCD2_ORACLE)
def streaming_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 through real micro-batches (maxFilesPerTrigger=2 →
    several foreachBatch merges, with keys' histories split across batches in
    arbitrary file order). Final state must equal the batch flagship query —
    it is checked against the *same oracle SQL*."""
    from change_data_capture_spark.functions.envelope import decode_envelope
    from change_data_capture_spark.sources.ndjson import read_envelope_ndjson
    from change_data_capture_spark.streaming.scd2_stream import Scd2State, apply_batch

    ws = tempfile.mkdtemp(prefix="cdc_scd2_inc_")
    src = f"{ws}/log"
    # several files → several micro-batches; repartition splits each key's
    # history across files, exercising out-of-order cross-batch merging
    env = product_change_events(spark, sf_dir).repartition(8)
    env.write.mode("overwrite").json(src)

    state = Scd2State(spark, f"{ws}/state")
    stream = read_envelope_ndjson(spark, src, streaming=True)
    # cap files per trigger so availableNow yields multiple batches
    stream = (
        spark.readStream.schema(stream.schema)
        .option("maxFilesPerTrigger", 2)
        .json(src)
    )
    q = (
        decode_envelope(stream)
        .writeStream.foreachBatch(lambda bdf, _bid: apply_batch(state, bdf))
        .option("checkpointLocation", f"{ws}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = state.read()
    assert final is not None
    return _flagship_shape(final)


def _flagship_shape(final: DataFrame) -> DataFrame:
    """Project SCD2 state to the flagship output contract: only keys with
    >1 change event (HAVING > 1), price as DOUBLE."""
    w_all = Window.partitionBy("id")
    return (
        final.withColumn("_n", F.count(F.lit(1)).over(w_all))
        .where(F.col("_n") >= 2)
        .select(
            "id", "name", "description",
            F.col("price").cast("double").alias("price"),
            "row_valid_start_timestamp", "row_valid_expiration_timestamp",
        )
    )


@query("streaming_scd2_multibatch", oracle=_SCD2_ORACLE)
def streaming_scd2_multibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 under an adversarial *ordered* batch split: three
    merges where the last batch delivers genuinely LATE events — UPDATE1
    rows (lsn = pk*10+2) arrive after UPDATE2/DELETE (lsn pk*10+3 / pk*10+4)
    have already been chained, so their validity interval must be spliced
    *between closed intervals*, re-opening and re-closing neighbors by LSN
    order rather than arrival order. Generator replay duplicates land
    within batch 1 (the dropDuplicates path); the late batch is then
    re-applied wholesale, exercising the anti-join idempotency path against
    committed state. Batches are applied directly through the same
    ``apply_batch`` merge that foreachBatch drives (the checkpointed-stream
    mechanics are covered by ``streaming_scd2_incremental``; an unordered
    file stream cannot *guarantee* the late-arrival ordering this query
    exists to prove). Final state must equal the batch flagship — same
    oracle SQL."""
    from change_data_capture_spark.functions.envelope import decode_envelope
    from change_data_capture_spark.streaming.scd2_stream import Scd2State, apply_batch

    ws = tempfile.mkdtemp(prefix="cdc_scd2_mb_")
    decoded = decode_envelope(product_change_events(spark, sf_dir))
    phase = F.col("lsn") % 10
    batches = [
        decoded.where(phase == 1),                      # inserts open history
        decoded.where(phase.isin(3, 4)),                # upd2 + delete close it
        decoded.where(phase == 2),                      # LATE: upd1 splices in
    ]
    state = Scd2State(spark, f"{ws}/state")
    for b in batches:
        apply_batch(state, b)
    # replay the late batch wholesale: committed (id,lsn) rows must anti-join
    # out and the state hash-identically re-chain (idempotency under
    # at-least-once delivery)
    apply_batch(state, batches[2])

    final = state.read()
    assert final is not None
    return _flagship_shape(final)
