"""Streaming semantics: stream-static join and late-data watermark behavior."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_stream_static_join(spark, sf_dir):
    """Stream-static join (SURVEY.md §2.B streaming list): streaming events
    enriched with the static customer dimension — the static side is
    re-planned per micro-batch, no state required."""
    from change_data_capture_spark.sources.tables import load_table

    ws = tempfile.mkdtemp(prefix="cdc_ss_")
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").parquet(f"{ws}/events")
    customers = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    stream = spark.readStream.schema(events.schema).parquet(f"{ws}/events")
    joined = stream.join(F.broadcast(customers), "user_id", "left")
    q = (
        joined.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.c_mktsegment: r.n for r in spark.sql("SELECT * FROM ss_join").collect()}
    want = {
        r.c_mktsegment: r.n
        for r in events.join(customers, "user_id", "left")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    """The streaming tumbling-window aggregate (watermarked) over a drained
    file stream must equal the batch groupBy-window on the same data."""
    from change_data_capture_spark.sources.tables import load_table
    from change_data_capture_spark.streaming.pipeline import windowed_event_counts

    ws = tempfile.mkdtemp(prefix="cdc_tumb_")
    events = load_table(spark, sf_dir, "events").select(
        "ts", "user_id", "event_type", "value"
    )
    events.write.mode("overwrite").parquet(f"{ws}/events")
    stream = spark.readStream.schema(events.schema).parquet(f"{ws}/events")
    q = (
        windowed_event_counts(spark, stream)
        .writeStream.format("memory")
        .queryName("tumb_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.w.start, r.event_type, r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tumb_test").collect()
    }
    want = {
        (r.w.start, r.event_type, r.n_events, r.total_value)
        for r in windowed_event_counts(spark, events).collect()
    }
    assert got == want


def test_watermark_drops_late_events(spark):
    """Late-data semantics: with a 10-minute watermark, an event arriving in
    a later batch but timestamped far behind the watermark must not create
    or update a window (append mode emits only finalized windows)."""
    ws = tempfile.mkdtemp(prefix="cdc_late_")
    on_time = spark.createDataFrame(
        [(i, f"2024-01-01 0{h}:15:00") for i, h in enumerate([0, 1, 2, 3])],
        "id long, ts_s string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    on_time.coalesce(1).write.mode("overwrite").parquet(f"{ws}/in/batch0")

    # a very late event: timestamped in hour 0, arriving after hour-3 data
    late = spark.createDataFrame(
        [(99, "2024-01-01 00:20:00")], "id long, ts_s string"
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    late.coalesce(1).write.mode("overwrite").parquet(f"{ws}/in/batch1")

    stream = (
        spark.readStream.schema(on_time.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{ws}/in")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.w.start.isoformat(), r.n)
        for r in spark.sql("SELECT * FROM late_test").collect()
    }
    # every finalized window has exactly its on-time count; the late id=99
    # event must not have inflated hour 0 beyond 1
    for start, n in rows:
        assert n == 1, f"window {start} counted late data: n={n}"


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Stream-stream inner join with watermarks on both sides and a time
    bound (purchase within 1h after a view by the same user) must equal the
    batch join on the same data once the stream drains."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.sources.tables import load_table

    ws = tempfile.mkdtemp(prefix="cdc_ssj_")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    events.write.mode("overwrite").parquet(f"{ws}/events")

    def sides(df):
        views = (
            df.where(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "2 hours")
        )
        buys = (
            df.where(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("buy_id"),
                F.col("user_id").alias("b_user"),
                F.col("ts").alias("b_ts"),
            )
            .withWatermark("b_ts", "2 hours")
        )
        return views.join(
            buys,
            (F.col("v_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("v_ts"))
            & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        ).select("view_id", "buy_id")

    stream = spark.readStream.schema(events.schema).parquet(f"{ws}/events")
    q = (
        sides(stream)
        .writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.view_id, r.buy_id) for r in spark.sql("SELECT * FROM ssj_test").collect()}
    want = {(r.view_id, r.buy_id) for r in sides(events).collect()}
    assert want, "fixture must produce at least one view->purchase pair"
    assert got == want
