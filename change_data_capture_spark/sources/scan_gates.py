"""Driver-gated round-trip queries for the non-parquet scan formats.

SURVEY.md §2.A S2 (bare JSON auto-scan) and §2.B's CSV/text/ORC scans were
implemented in round 1 (``ndjson.read_json_auto``, ``flat_files``) but only
pytest-covered — the driver's correctness gate never exercised them because a
gate query needs a DuckDB oracle over the *parquet* fixtures. These queries
close that: each writes a fixture table OUT in the target format, reads it
back through the engine's scan function, and returns rows that hash-match the
parquet-derived oracle — so a green driver row proves the format's write →
list → parse → type-restore path end-to-end, not just that the reader exists.

The only scan families left without driver rows after this module are the
genuinely environment-blocked ones (Kafka broker, S3 endpoint, JDBC server,
Delta jar — none exist in this sandbox; see COVERAGE.md).

Round-trip side effects land under ``/tmp`` keyed by the sf-dir basename, so
sf0.01 correctness runs and local sf0.001 test runs never collide. Re-runs
overwrite — the gates are idempotent.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.flat_files import (
    read_csv,
    read_orc,
    read_text,
    write_orc,
)
from change_data_capture_spark.sources.ndjson import read_json_auto
from change_data_capture_spark.sources.tables import load_table


def _gate_dir(sf_dir: str, fmt: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(
        tempfile.gettempdir(), "cdc_spark_scan_gates", sf_name, fmt
    )


NATION_CSV_SCHEMA = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)


@query(
    "scan_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan gate: nation → CSV (header, quoted as needed) → explicit-
    schema FAILFAST read back (``flat_files.read_csv`` — no inference pass,
    malformed rows fail the task). Hash-matching the parquet oracle proves
    header handling, quoting, and int/string type restoration."""
    out = _gate_dir(sf_dir, "csv")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").option(
        "header", "true"
    ).csv(out)
    return read_csv(spark, out, NATION_CSV_SCHEMA).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "scan_json_auto_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def scan_json_auto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 gate (bare JSON auto-scan, reference ``README.md:203-206``):
    region → JSON lines → ``ndjson.read_json_auto`` with full schema
    INFERENCE (the ad-hoc exploration path; the pipeline path pins schemas,
    SURVEY §1.4). Inference widens ints to bigint — the final cast restores
    the fixture's int32 so the driver's schema check stays strict."""
    out = _gate_dir(sf_dir, "json")
    load_table(spark, sf_dir, "region").write.mode("overwrite").json(out)
    return read_json_auto(spark, out).select(
        F.col("r_regionkey").cast("int").alias("r_regionkey"), "r_name"
    )


@query(
    "scan_text_roundtrip",
    oracle="SELECT n_name AS value FROM nation",
)
def scan_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text scan gate: one-column write → ``spark.read.text`` line scan
    (``flat_files.read_text``), the entry point for custom parsers over
    raw logs. Line fidelity is exactly the contract a parser needs."""
    out = _gate_dir(sf_dir, "text")
    load_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("value")
    ).write.mode("overwrite").text(out)
    return read_text(spark, out)


@query(
    "scan_orc_roundtrip",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC scan gate: orders → ORC (snappy) → ``flat_files.read_orc`` with a
    predicate that reaches the ORC scan (the pushdown pin lives in
    tests/test_scan_gates.py) and an aggregate over the result. min/max of
    DOUBLE are exact across engines (no accumulation-order hazard), so the
    gate hash-matches without the decimal-routing dance sums need."""
    out = _gate_dir(sf_dir, "orc")
    write_orc(load_table(spark, sf_dir, "orders"), out)
    return (
        read_orc(spark, out)
        .where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "sink_dynamic_partition_overwrite",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(o_totalprice + CASE WHEN o_orderpriority = '1-URGENT'
                               THEN 1.0 ELSE 0.0 END) AS min_price,
       max(o_totalprice + CASE WHEN o_orderpriority = '1-URGENT'
                               THEN 1.0 ELSE 0.0 END) AS max_price
FROM orders
GROUP BY o_orderpriority
""",
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-sink BACKFILL semantics gate: load orders partitioned by
    priority, then rewrite ONE partition's rows (prices +1.00 for
    '1-URGENT') with ``partitionOverwriteMode=dynamic`` — the incremental
    reprocessing shape every warehouse needs (re-run yesterday's partition
    without touching the rest). The oracle distinguishes the three possible
    sink semantics by value: STATIC overwrite would delete every other
    partition (row counts collapse), APPEND would double the target
    partition (counts double), only DYNAMIC yields exactly this relation.
    The companion pytest additionally pins that untouched partitions keep
    their exact files (no silent full rewrite)."""
    out = _gate_dir(sf_dir, "dynpart")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    upd = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
    )
    (
        upd.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
