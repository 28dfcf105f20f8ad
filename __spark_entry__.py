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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for the genuinely
    non-SQL-expressible ones — the driver records a rows-only check)."""
    return dict(ORACLES)
