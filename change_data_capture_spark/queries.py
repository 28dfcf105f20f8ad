"""Query registry — the engine's public query surface.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI-SQL oracle string (DuckDB dialect) over the same fixture
tables. The driver harness runs both sides at sf=0.01 and compares row count,
schema, and an order-insensitive value hash — so every column is explicitly
aliased identically on both sides, aggregates over DOUBLE columns are routed
through exact DECIMAL arithmetic (floating-point accumulation order is not
reproducible across engines; fixed-point is), and timestamps are UTC on both
sides.

Registration is via the ``@query(name, oracle=...)`` decorator; modules add
entries at import time. ``__spark_entry__`` re-exports ``QUERIES`` /
``ORACLES``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query implementation and (optionally) its DuckDB oracle.

    Queries without an oracle are genuinely non-SQL-expressible (e.g.
    stateful streaming); the driver records a weaker rows-only check for
    those.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
