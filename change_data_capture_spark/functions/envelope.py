"""Debezium-envelope decoding expressions.

Everything here is a built-in-function projection over the typed envelope
struct (schemas.envelope_schema) — the Spark equivalent of the reference's
ad-hoc JSON path chains ``json->'value'->'after'->…``
(reference README.md:90-102). Because the envelope is a real ``StructType``,
Catalyst prunes the nested scan down to the referenced paths
(``spark.sql.optimizer.nestedSchemaPruning.enabled``) — the whole decode is a
zero-shuffle, codegen'd projection at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def op_label(op: Column) -> Column:
    """Decode the Debezium op code (reference README.md:94-100)."""
    return (
        F.when(op == "c", "CREATE")
        .when(op == "d", "DELETE")
        .when(op == "u", "UPDATE")
        .when(op == "r", "SNAPSHOT")
        .otherwise("INVALID")
    )


def decode_user_envelope(env: DataFrame) -> DataFrame:
    """Flatten the users-topic envelope (row shape init.sql:17-21)."""
    v = F.col("value")
    return env.select(
        F.coalesce(v["after"]["id"], v["before"]["id"]).alias("id"),
        v["op"].alias("op"),
        op_label(v["op"]).alias("op_label"),
        v["source"]["lsn"].alias("lsn"),
        v["source"]["ts_ms"].alias("ts_ms"),
        F.timestamp_millis(v["source"]["ts_ms"]).alias("source_ts"),
        v["after"]["username"].alias("username"),
        v["after"]["password"].alias("password"),
    )


def decode_envelope(env: DataFrame) -> DataFrame:
    """Flatten the envelope into the columns the analytic queries consume.

    Mirrors the projection at reference README.md:90-102:
    - ``id``: COALESCE(after.id, before.id) — DELETE events have after=NULL
    - row image columns from ``after`` (NULL on DELETE, as in the reference)
    - ``lsn``: total order within a key; ``ts_ms``: event time (source.ts_ms)
    """
    v = F.col("value")
    return env.select(
        F.coalesce(v["after"]["id"], v["before"]["id"]).alias("id"),
        v["op"].alias("op"),
        op_label(v["op"]).alias("op_label"),
        v["source"]["lsn"].alias("lsn"),
        v["source"]["ts_ms"].alias("ts_ms"),
        F.timestamp_millis(v["source"]["ts_ms"]).alias("source_ts"),
        v["after"]["name"].alias("name"),
        v["after"]["description"].alias("description"),
        v["after"]["price"].alias("price"),
        v["before"]["name"].alias("before_name"),
        v["before"]["price"].alias("before_price"),
    )
