"""CSV / text / JDBC source surface (SURVEY.md §2.B scans).

CSV and text are exercised by tests (round-trip through the engine); JDBC is
the snapshot-phase reader of a CDC deployment (S4's initial ``op='r'`` load
comes from the source database) — no database server exists in this
environment, so the function is provided and documented but not testable
here; it is a thin, explicitly-schema'd wrapper over ``spark.read.jdbc``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from change_data_capture_spark.session import ensure_runtime_confs


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """Explicit-schema CSV scan (no inference pass; malformed rows fail fast
    via PERMISSIVE→columnNameOfCorruptRecord is deliberately NOT enabled —
    data bugs should surface, not vanish)."""
    ensure_runtime_confs(spark)
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw line scan (one ``value: string`` column) — the entry point for
    custom parsers over 100 TB of logs; pair with from_json/regexp_extract."""
    ensure_runtime_confs(spark)
    return spark.read.text(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning contract as parquet
    (PushedFilters + ReadSchema reach the scan; verified by test). Avro is
    NOT exposed: the spark-avro module jar isn't on this environment's
    classpath (it is an external module since Spark 2.4)."""
    ensure_runtime_confs(spark)
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (snappy, Spark default)."""
    df.write.mode(mode).orc(path)


def read_jdbc_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    properties: dict | None = None,
) -> DataFrame:
    """S4 snapshot phase: parallel JDBC range scan of the source table.

    Always pass the partitioning quadruple — a bare ``spark.read.jdbc(url,
    table)`` is a single-connection scan (one task reading the whole OLTP
    table). Range-partitioned reads issue ``num_partitions`` bounded queries,
    which is the only way a multi-TB snapshot finishes. (Requires the
    matching JDBC driver jar on the classpath; none ships in this
    environment.)"""
    ensure_runtime_confs(spark)
    return spark.read.jdbc(
        url,
        table,
        column=partition_column,
        lowerBound=lower_bound,
        upperBound=upper_bound,
        numPartitions=num_partitions,
        properties=properties or {},
    )
