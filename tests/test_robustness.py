"""Pipeline robustness: poison-pill records and the live rate source."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_corrupt_ndjson_lines_do_not_kill_the_pipeline(spark, sf_dir):
    """A malformed line in the change log must not fail the job (at 100 TB
    a poison pill WILL occur): with an explicit schema, an unparseable line
    yields a null envelope, which the lsn-not-null gate drops — the valid
    events around it land intact."""
    from change_data_capture_spark.functions.envelope import decode_envelope
    from change_data_capture_spark.operators.scd2 import scd2
    from change_data_capture_spark.sources.cdc_generator import product_change_events
    from change_data_capture_spark.sources.ndjson import read_envelope_ndjson

    ws = tempfile.mkdtemp(prefix="cdc_poison_")
    env = product_change_events(spark, sf_dir)
    env.coalesce(1).write.mode("overwrite").json(f"{ws}/log")

    # inject a garbage segment file into the log directory
    with open(f"{ws}/log/z_corrupt.json", "w") as fh:
        fh.write('{"value": {"op": 5, "source": "not-a-struct"}}\n')
        fh.write("this is not json at all\n")
        fh.write('{"unrelated": true}\n')

    back = read_envelope_ndjson(spark, f"{ws}/log")
    clean = decode_envelope(back).where(F.col("lsn").isNotNull())
    want = decode_envelope(env).where(F.col("lsn").isNotNull())
    assert clean.count() == want.count()

    # and the flagship still computes over the poisoned log
    out = scd2(decode_envelope(back))
    ref = scd2(decode_envelope(env))
    assert out.count() == ref.count()


def test_rate_source_stream_produces_events(spark):
    """The live synthetic stream (rate source) starts, produces schema-valid
    events, and values are offset-deterministic."""
    from change_data_capture_spark.streaming.pipeline import rate_source_events

    events = rate_source_events(spark, rows_per_second=500)
    q = (
        events.writeStream.format("memory")
        .queryName("rate_events")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) n FROM rate_events").collect()[0].n
            if n >= 100:
                break
            time.sleep(0.5)
        assert n >= 100, f"rate stream produced only {n} rows"
        rows = spark.sql(
            "SELECT * FROM rate_events ORDER BY event_id LIMIT 5"
        ).collect()
        for r in rows:
            assert r.user_id == r.event_id % 150
            assert r.event_type in {"click", "error", "purchase", "signup", "view"}
    finally:
        q.stop()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Warehouse schema evolution: an append adds a column; readers with
    mergeSchema=true see the union schema with nulls for pre-evolution
    rows — no rewrite of committed files."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(p)
    spark.range(5, 8).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2")
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "v1", "v2"}
    old = merged.where(F.col("id") < 5)
    assert old.where(F.col("v2").isNull()).count() == 5
    assert merged.count() == 8


def test_shuffle_partitions_derived_not_hardcoded(spark):
    """r13: ensure_runtime_confs sizes initial shuffle parallelism from
    the session's real parallelism (stock-200 sessions only) instead of
    a hardcoded 32 — and never clobbers a session that configured its
    own value (the bench's get_spark, external deployments)."""
    from change_data_capture_spark.session import ensure_runtime_confs

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "200")  # the stock default = "unconfigured"
        ensure_runtime_confs(spark)
        assert spark.conf.get(key) == str(
            spark.sparkContext.defaultParallelism
        )
        spark.conf.set(key, "77")  # an explicitly configured session
        ensure_runtime_confs(spark)
        assert spark.conf.get(key) == "77"
    finally:
        spark.conf.set(key, prev)
