"""applyInPandasWithState current-row tracking + flat-file source round-trips."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_stateful_current_rows_matches_batch(spark, sf_dir):
    """The streamed current-row view (applyInPandasWithState over real
    micro-batches) must equal the batch 'latest event per key' reduction."""
    from change_data_capture_spark.functions.envelope import decode_envelope
    from change_data_capture_spark.sources.cdc_generator import product_change_events
    from change_data_capture_spark.streaming.stateful import current_rows_stream

    ws = tempfile.mkdtemp(prefix="cdc_state_")
    env = product_change_events(spark, sf_dir).repartition(6)
    env.write.mode("overwrite").json(f"{ws}/log")

    stream = (
        spark.readStream.schema(env.schema)
        .option("maxFilesPerTrigger", 2)
        .json(f"{ws}/log")
    )
    q = (
        current_rows_stream(decode_envelope(stream))
        .writeStream.format("memory")
        .queryName("current_rows")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per touched key per batch: latest per key wins
    got = {
        r.id: (r.lsn, r.name, r.price, r.deleted)
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, row_number() OVER (PARTITION BY id ORDER BY n_changes DESC) rn
                 FROM current_rows) WHERE rn = 1"""
        ).collect()
    }

    from pyspark.sql import Window

    decoded = decode_envelope(product_change_events(spark, sf_dir))
    w = Window.partitionBy("id").orderBy(F.col("lsn").desc())
    latest = (
        decoded.where(F.col("lsn").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
    )
    want = {
        r.id: (
            r.lsn,
            None if r.op == "d" else r.name,
            None if r.op == "d" else (float(r.price) if r.price is not None else None),
            r.op == "d",
        )
        for r in latest.collect()
    }
    assert got == want


def test_csv_roundtrip(spark, sf_dir):
    from change_data_capture_spark.schemas import FIXTURE_SCHEMAS
    from change_data_capture_spark.sources.flat_files import read_csv
    from change_data_capture_spark.sources.tables import load_table

    ws = tempfile.mkdtemp(prefix="cdc_csv_")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").option("header", "true").csv(f"{ws}/nation")
    back = read_csv(spark, f"{ws}/nation", FIXTURE_SCHEMAS["nation"])
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_text_scan(spark, sf_dir):
    from change_data_capture_spark.sources.flat_files import read_text
    from change_data_capture_spark.sources.tables import load_table

    ws = tempfile.mkdtemp(prefix="cdc_txt_")
    load_table(spark, sf_dir, "documents").select("text").write.mode(
        "overwrite"
    ).text(f"{ws}/docs")
    lines = read_text(spark, f"{ws}/docs")
    assert lines.columns == ["value"]
    assert lines.count() == load_table(spark, sf_dir, "documents").count()


def test_orc_roundtrip_with_pushdown(spark, sf_dir):
    from change_data_capture_spark.sources.flat_files import read_orc, write_orc
    from change_data_capture_spark.sources.tables import load_table

    ws = tempfile.mkdtemp(prefix="cdc_orc_")
    li = load_table(spark, sf_dir, "lineitem")
    write_orc(li, f"{ws}/lineitem")
    back = read_orc(spark, f"{ws}/lineitem")
    assert back.count() == li.count()
    # predicate + projection must reach the ORC scan
    q = back.where("l_quantity > 45").select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    assert q.count() == li.where("l_quantity > 45").count()


def test_register_sql_views_runs_raw_sql(spark, sf_dir):
    from change_data_capture_spark.sources.tables import register_sql_views

    register_sql_views(spark, sf_dir)
    got = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        GROUP BY o_orderpriority
        """
    ).collect()
    assert len(got) > 0 and all(r["n"] > 0 for r in got)


def test_python_datasource_matches_builtin_reader(spark, sf_dir):
    """The custom Python DataSource (Spark 4 extension API) must read the
    NDJSON envelope log identically to the built-in JSON reader."""
    import tempfile

    from pyspark.sql import functions as F

    from change_data_capture_spark.sources.cdc_generator import product_change_events
    from change_data_capture_spark.sources.ndjson import read_envelope_ndjson
    from change_data_capture_spark.sources.python_datasource import (
        CdcNdjsonDataSource,
    )

    ws = tempfile.mkdtemp(prefix="cdc_pyds_")
    product_change_events(spark, sf_dir).repartition(4).write.mode(
        "overwrite"
    ).json(ws)

    spark.dataSource.register(CdcNdjsonDataSource)
    custom = spark.read.format("cdc_ndjson").option("path", ws).load()
    builtin = read_envelope_ndjson(spark, ws)

    key = lambda df: {  # noqa: E731
        (r.id, r.lsn)
        for r in df.select(
            F.col("value.after.id").alias("id"), F.col("value.source.lsn").alias("lsn")
        ).collect()
    }
    assert custom.count() == builtin.count()
    assert key(custom) == key(builtin)


def test_python_datasource_writer_roundtrip(spark, sf_dir):
    """The write side of the custom DataSource (two-phase rename-on-commit)
    must round-trip through its own reader with nothing lost, and leave no
    uncommitted temp files behind."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from change_data_capture_spark.sources.cdc_generator import product_change_events
    from change_data_capture_spark.sources.python_datasource import (
        CdcNdjsonDataSource,
    )

    spark.dataSource.register(CdcNdjsonDataSource)
    src = product_change_events(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="cdc_pyds_w_")
    src.repartition(4).write.format("cdc_ndjson").mode("append").option(
        "path", out
    ).save()

    assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]
    back = spark.read.format("cdc_ndjson").option("path", out).load()
    key = lambda df: {  # noqa: E731
        (r.id, r.lsn)
        for r in df.select(
            F.col("value.after.id").alias("id"), F.col("value.source.lsn").alias("lsn")
        ).collect()
    }
    assert back.count() == src.count()
    assert key(back) == key(src)


def test_python_datasource_stream_reader_drains_to_batch_parity(spark, sf_dir):
    """The streaming side of the custom DataSource (file-index offsets)
    must drain the same rows the batch reader sees, through a REAL
    availableNow streaming execution."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from change_data_capture_spark.sources.cdc_generator import product_change_events
    from change_data_capture_spark.sources.python_datasource import (
        CdcNdjsonDataSource,
    )

    spark.dataSource.register(CdcNdjsonDataSource)
    ws = tempfile.mkdtemp(prefix="cdc_pyds_s_")
    product_change_events(spark, sf_dir).repartition(3).write.mode(
        "overwrite"
    ).json(ws)

    stream = spark.readStream.format("cdc_ndjson").option("path", ws).load()
    sink = f"pyds_stream_{uuid.uuid4().hex[:8]}"
    q = (
        stream.select(
            F.col("value.after.id").alias("id"),
            F.col("value.source.lsn").alias("lsn"),
        )
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    landed = spark.table(sink)
    batch = spark.read.format("cdc_ndjson").option("path", ws).load()
    assert landed.count() == batch.count()
    got = {(r.id, r.lsn) for r in landed.collect()}
    want = {
        (r.id, r.lsn)
        for r in batch.select(
            F.col("value.after.id").alias("id"),
            F.col("value.source.lsn").alias("lsn"),
        ).collect()
    }
    assert got == want


def test_python_datasource_stream_restart_resumes_from_checkpoint(spark, sf_dir):
    """Checkpoint recovery: drain, land MORE segments, restart the SAME
    checkpoint — the second run must process only the new files (offsets
    resume) and the union must be exactly-once."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from change_data_capture_spark.sources.cdc_generator import product_change_events
    from change_data_capture_spark.sources.python_datasource import (
        CdcNdjsonDataSource,
    )

    spark.dataSource.register(CdcNdjsonDataSource)
    src = product_change_events(spark, sf_dir).select(
        F.col("value.after.id").alias("id"),
        F.col("value.source.lsn").alias("lsn"),
        "value",
    ).persist()
    # snapshot ('r') rows carry NULL lsn — coalesce so the halves PARTITION
    # the log (a bare lsn % 2 silently drops them from both)
    par = F.coalesce(F.col("lsn"), F.lit(0)) % 2
    half1 = src.where(par == 0)
    half2 = src.where(par == 1)

    ws = tempfile.mkdtemp(prefix="cdc_pyds_r_")
    data, ckpt, out1, out2 = (os.path.join(ws, d) for d in ("data", "ckpt", "o1", "o2"))
    half1.select("value").coalesce(1).write.mode("append").json(data)

    def drain(out_dir):
        stream = spark.readStream.format("cdc_ndjson").option("path", data).load()
        q = (
            stream.select(
                F.col("value.after.id").alias("id"),
                F.col("value.source.lsn").alias("lsn"),
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(out1)
    n1 = spark.read.parquet(out1).count()
    assert n1 == half1.count()

    half2.select("value").coalesce(1).write.mode("append").json(data)
    drain(out1)  # same checkpoint, same sink dir
    landed = spark.read.parquet(out1)
    assert landed.count() == src.count(), "restart must add ONLY the new half"
    # the raw log legitimately contains transport replays (the generator's
    # at-least-once mix) — source-level exactly-once means the LANDED
    # multiset equals the LOG multiset, nothing doubled or dropped
    lm = {tuple(r) for r in landed.groupBy("id", "lsn").count().collect()}
    sm = {tuple(r) for r in src.groupBy("id", "lsn").count().collect()}
    assert lm == sm
    src.unpersist()


def test_python_datasource_writer_overwrite_truncates(spark, sf_dir):
    """mode("overwrite") must replace previously committed segments, not
    silently merge with them (regression: the overwrite flag was stored but
    commit never deleted old files)."""
    import os
    import tempfile

    from change_data_capture_spark.sources.cdc_generator import product_change_events
    from change_data_capture_spark.sources.python_datasource import (
        CdcNdjsonDataSource,
    )

    spark.dataSource.register(CdcNdjsonDataSource)
    src = product_change_events(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="cdc_pyds_ow_")
    w = src.repartition(2).write.format("cdc_ndjson").option("path", out)
    w.mode("append").save()
    w.mode("append").save()
    assert (
        spark.read.format("cdc_ndjson").option("path", out).load().count()
        == 2 * src.count()
    )
    src.limit(10).write.format("cdc_ndjson").mode("overwrite").option(
        "path", out
    ).save()
    back = spark.read.format("cdc_ndjson").option("path", out).load()
    assert back.count() == 10, "overwrite must truncate, not append"
    assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]


def test_python_datasource_stream_offsets_survive_mtime_disorder(spark, sf_dir):
    """Content-addressed offsets: a segment published AFTER the first drain
    but carrying an EARLIER mtime (rename-on-commit preserves the temp
    file's write time; coarse filesystems tie) must still be consumed
    exactly once on the next drain — a bare listing-index offset replays or
    skips here."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from change_data_capture_spark.sources.cdc_generator import product_change_events
    from change_data_capture_spark.sources.python_datasource import (
        CdcNdjsonDataSource,
    )

    spark.dataSource.register(CdcNdjsonDataSource)
    src = (
        product_change_events(spark, sf_dir)
        .select(
            F.col("value.after.id").alias("id"),
            F.col("value.source.lsn").alias("lsn"),
            "value",
        )
        .persist()
    )
    par = F.coalesce(F.col("lsn"), F.lit(0)) % 2
    half1, half2 = src.where(par == 0), src.where(par == 1)

    ws = tempfile.mkdtemp(prefix="cdc_pyds_mt_")
    data, ckpt, out = (os.path.join(ws, d) for d in ("data", "ckpt", "out"))
    half1.select("value").coalesce(1).write.mode("append").json(data)

    def drain():
        stream = spark.readStream.format("cdc_ndjson").option("path", data).load()
        q = (
            stream.select(
                F.col("value.after.id").alias("id"),
                F.col("value.source.lsn").alias("lsn"),
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == half1.count()

    # publish the second half with an mtime far in the PAST and a name that
    # sorts first — the hostile case for prefix-index offsets
    tmp = os.path.join(ws, "tmp2")
    half2.select("value").coalesce(1).write.mode("append").json(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".json")][0]
    dst = os.path.join(data, f"0000-early-{uuid.uuid4().hex[:6]}.json")
    os.rename(os.path.join(tmp, part), dst)
    os.utime(dst, (0, 0))

    drain()
    landed = spark.read.parquet(out)
    assert landed.count() == src.count(), "disordered segment must land exactly once"
    lm = {tuple(r) for r in landed.groupBy("id", "lsn").count().collect()}
    sm = {tuple(r) for r in src.groupBy("id", "lsn").count().collect()}
    assert lm == sm
    src.unpersist()


def test_python_datasource_from_row_leaf_coverage():
    """_from_row must JSON-encode every Spark leaf type the writer can see:
    dates, timestamps, bytes, Decimals — including nested inside
    arrays/maps/Rows (regression: only top-level Row and Decimal were
    handled, so df.write with a date column raised TypeError)."""
    import datetime
    import decimal
    import json as _json

    from pyspark.sql import Row

    from change_data_capture_spark.sources.python_datasource import _from_row

    rec = _from_row(
        Row(
            d=datetime.date(2024, 3, 1),
            ts=datetime.datetime(2024, 3, 1, 12, 30, 15),
            b=b"\x00\xff",
            arr=[decimal.Decimal("1.50"), None],
            m={"k": Row(inner=datetime.date(2020, 1, 2))},
        )
    )
    out = _json.dumps(rec, sort_keys=True)
    assert '"2024-03-01"' in out and "12:30:15" in out
    assert '"1.50"' in out and '"AP8="' in out  # base64 of 00 ff
    assert '"2020-01-02"' in out


def test_python_datasource_to_row_round_trips_writer_leaves():
    """_to_row must decode every leaf _from_row can emit — the read path is
    the writer's inverse (dates/timestamps from ISO strings, bytes from
    base64, Decimals from strings) AND map KEYS must coerce through the
    declared keyType: JSON object keys are always strings, so a
    map<bigint, x> column round-trips only if keys re-typed (ADVICE r5)."""
    import datetime
    import decimal

    from pyspark.sql.types import (
        BinaryType,
        DateType,
        DecimalType,
        LongType,
        MapType,
        StringType,
        TimestampType,
    )

    from change_data_capture_spark.sources.python_datasource import (
        _from_row,
        _to_row,
    )

    assert _to_row("2024-03-01", DateType()) == datetime.date(2024, 3, 1)
    assert _to_row("2024-03-01 12:30:15", TimestampType()) == datetime.datetime(
        2024, 3, 1, 12, 30, 15
    )
    assert bytes(_to_row("AP8=", BinaryType())) == b"\x00\xff"
    assert _to_row("1.50", DecimalType(10, 2)) == decimal.Decimal("1.50")
    # map keys: the wire is json.dumps(_from_row(...)) which stringifies
    # int keys — {"7": "x"}; a long-keyed map must come back as {7: "x"}
    import json as _json

    wire = _json.loads(_json.dumps(_from_row({7: "x", 9: "y"})))
    got = _to_row(wire, MapType(LongType(), StringType()))
    assert got == {7: "x", 9: "y"}
    assert all(isinstance(k, int) for k in got)
