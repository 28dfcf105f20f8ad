"""Typed readers for the driver's parquet fixture tables.

Scale notes: ``spark.read.parquet`` gives columnar scans with predicate
pushdown and column pruning for free — downstream operators must keep their
filters/projections expressible so they reach the scan (verify via
``.explain``: ``PushedFilters`` / ``ReadSchema``). At 100 TB the same loader
works unchanged; only the path changes (``s3a://…`` with partitioned layouts,
see ``streaming.pipeline`` for the writer side).

Timestamp normalization: the fixtures mix parquet TIMESTAMP(NANOS)
(``events.ts`` — unreadable by Spark 4 without ``nanosAsLong``) and
TIMESTAMP_NTZ (``o_orderdate``, ``l_shipdate``). We normalize every temporal
column to ``TimestampType`` under a UTC session, truncating nanos → micros
exactly as DuckDB does, so Spark results and the DuckDB oracle agree bit-wise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from change_data_capture_spark.schemas import TABLES
from change_data_capture_spark.session import ensure_runtime_confs

#: temporal columns per table (fixture layout, TESTDATA.md)
_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with normalized timestamp columns."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLS.get(name, ()):
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            # parquet TIMESTAMP(NANOS) read as raw int64 via nanosAsLong:
            # integer-divide to micros — `div`, not `/`, because float
            # division rounds the low microsecond while DuckDB truncates.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, TimestampNTZType):
            # NTZ wall-time == UTC instant under a UTC session.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_sql_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register every fixture table as a temp view so users run plain
    ``spark.sql(...)`` — the migration surface for anyone coming from the
    reference's DuckDB analytics step (its queries run verbatim, modulo
    dialect). Views wrap the normalized loaders, so SQL users inherit the
    same timestamp/pushdown behavior as the DataFrame API."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
