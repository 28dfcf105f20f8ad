"""Salted-join equivalence under a hot key; NDJSON S7 round-trip; ingest
restart (checkpoint) exactly-once."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_salted_join_equals_plain_join(spark):
    """90%-hot-key fact side: salted join must produce exactly the plain
    join's result (same multiset), with the hot key spread across salts."""
    from change_data_capture_spark.operators.skew import salted_join

    fact = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(0, 100).select(F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))

    plain = fact.join(dim, "k").groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(fact, dim, "k").groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_equals_plain(spark):
    from change_data_capture_spark.operators.skew import salted_aggregate

    df = spark.range(0, 10_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    plain = {(r.k, r.s) for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {
        (r.k, r.sum_v) for r in salted_aggregate(df, "k", "v").collect()
    }
    assert plain == salted


def test_ndjson_partitioned_roundtrip(spark, sf_dir):
    """S7 writer: envelope → date/hour-partitioned NDJSON → typed reader
    recovers the identical event multiset (partition pruning layout)."""
    from change_data_capture_spark.sources.cdc_generator import product_change_events
    from change_data_capture_spark.sources.ndjson import (
        read_envelope_ndjson,
        write_envelope_ndjson,
    )

    ws = tempfile.mkdtemp(prefix="cdc_ndj_")
    env = product_change_events(spark, sf_dir)
    write_envelope_ndjson(env, f"{ws}/log")
    back = read_envelope_ndjson(spark, f"{ws}/log")

    key = lambda df: sorted(  # noqa: E731
        (r.value.source.lsn, r.value.op, r.value.source.ts_ms)
        for r in df.collect()
        if r.value.source.lsn is not None
    )
    assert key(back) == key(env)
    # hour-partitioned layout exists on disk
    import glob

    assert glob.glob(f"{ws}/log/ingest_date=*/ingest_hour=*/*.json")


def test_ingest_restart_is_exactly_once(spark, sf_dir):
    """Re-starting the checkpointed ingest over the same source must be a
    no-op: the checkpoint replays committed offsets, never the data."""
    from change_data_capture_spark.sources.cdc_generator import product_change_events
    from change_data_capture_spark.streaming.pipeline import ingest_stream

    ws = tempfile.mkdtemp(prefix="cdc_restart_")
    product_change_events(spark, sf_dir).repartition(4).write.mode(
        "overwrite"
    ).json(f"{ws}/log")

    for _ in range(2):  # second run = restart against the same checkpoint
        ingest_stream(
            spark, f"{ws}/log", f"{ws}/landed", f"{ws}/ckpt", available_now=True
        ).awaitTermination()

    landed = spark.read.parquet(f"{ws}/landed")
    assert landed.groupBy("id", "lsn").count().where("count > 1").count() == 0


def test_salted_join_rejects_outer(spark):
    """Right/full outer would duplicate unmatched small-side rows across
    salts — the operator must refuse rather than silently multiply."""
    import pytest

    from change_data_capture_spark.operators.skew import salted_join

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "k", how="full")
