"""CDC-domain queries: the reference's two golden analytics plus the
at-least-once dedup audit. Registered in the engine query registry with
DuckDB oracles built on the shared deterministic event CTE
(sources.cdc_generator.CDC_EVENTS_SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from change_data_capture_spark.functions.envelope import (
    decode_envelope,
    decode_user_envelope,
    op_label,
)
from change_data_capture_spark.operators.scd2 import change_log, scd2
from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.cdc_generator import (
    CDC_EVENTS_SQL,
    USERS_CDC_EVENTS_SQL,
    product_change_events,
    user_change_events,
)


def _decoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_envelope(product_change_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# flagship: SCD2 reconstruction (reference README.md:86-125)
# ---------------------------------------------------------------------------

_SCD2_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
events_clean AS (
    SELECT * FROM cdc_events
    WHERE lsn IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY id, lsn ORDER BY ts_ms) = 1
)
SELECT
    e.id, e.name, e.description,
    CAST(e.price AS DOUBLE) AS price,
    epoch_ms(e.ts_ms) AS row_valid_start_timestamp,
    COALESCE(LEAD(epoch_ms(e.ts_ms)) OVER (PARTITION BY e.id ORDER BY e.lsn),
             TIMESTAMP '2260-01-01') AS row_valid_expiration_timestamp
FROM events_clean e
WHERE e.id IN (SELECT id FROM events_clean GROUP BY id HAVING count(*) > 1)
"""


@query("scd2_products", oracle=_SCD2_ORACLE)
def scd2_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension rebuilt from the product change log.

    The oracle keeps the reference's IN-subquery formulation
    (README.md:119); the Spark plan uses the single-shuffle
    count-over-window rewrite (operators.scd2 docstring). Output is
    unordered: the driver's value hash is order-insensitive and a global
    ORDER BY would only add a shuffle (the reference's ORDER BY … LIMIT 200
    is display sugar — see ``entry()``).

    ``price`` is DECIMAL(10,2) inside the engine (SURVEY.md §1.2) but is
    emitted as DOUBLE: DuckDB's pandas bridge lowers DECIMAL to float64, so
    a decimal-typed output can never hash-match through that path.
    """
    return scd2(_decoded(spark, sf_dir)).withColumn(
        "price", F.col("price").cast("double")
    )


@query("scd2_products_b64price", oracle=_SCD2_ORACLE)
def scd2_products_b64price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship over Debezium's *default* decimal wire format
    (``decimal.handling.mode=precise``): ``price`` arrives as the base64 of
    the unscaled big-endian bytes — ``"DOQ=" = 33.00`` in the reference's
    sample event (README.md:214) — and is decoded in-plan by
    ``decode_debezium_decimal`` (unbase64 → sign-extend → conv, all
    codegen'd). Identical output (and oracle) to ``scd2_products``, proving
    the decode is exact on every event in the log."""
    from change_data_capture_spark.functions.envelope import decode_debezium_decimal
    from change_data_capture_spark.sources.cdc_generator import (
        product_change_events_b64,
    )

    env = product_change_events_b64(spark, sf_dir)
    decoded = decode_envelope(env).withColumn(
        "price", decode_debezium_decimal(F.col("price"), 2)
    )
    return scd2(decoded).withColumn("price", F.col("price").cast("double"))


@query("scd2_products_sql", oracle=_SCD2_ORACLE)
def scd2_products_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship expressed through ``spark.sql`` (E3 parity — the
    reference's query is SQL text, README.md:86-125). Same envelope decode,
    then SQL with a named WINDOW clause, IN-subquery, QUALIFY-style dedup —
    Catalyst rewrites the IN-subquery to the same semi join and shares the
    window sort, landing on an equivalent physical plan to the DataFrame
    variant."""
    _decoded(spark, sf_dir).createOrReplaceTempView("product_events")
    return spark.sql(
        """
        WITH events_clean AS (
            SELECT id, name, description, CAST(price AS DOUBLE) AS price,
                   lsn, ts_ms
            FROM (
                SELECT *, row_number() OVER (PARTITION BY id, lsn ORDER BY ts_ms) AS _rn
                FROM product_events WHERE lsn IS NOT NULL
            ) WHERE _rn = 1
        )
        SELECT id, name, description, price,
               timestamp_millis(ts_ms) AS row_valid_start_timestamp,
               COALESCE(LEAD(timestamp_millis(ts_ms)) OVER w,
                        TIMESTAMP '2260-01-01') AS row_valid_expiration_timestamp
        FROM events_clean
        WHERE id IN (SELECT id FROM events_clean GROUP BY id HAVING count(*) > 1)
        WINDOW w AS (PARTITION BY id ORDER BY lsn)
        """
    )


# ---------------------------------------------------------------------------
# users-topic SCD2 (the reference streams BOTH commerce tables — s3-sink.json:11)
# ---------------------------------------------------------------------------

_SCD2_USERS_ORACLE = f"""
WITH {USERS_CDC_EVENTS_SQL},
events_clean AS (
    SELECT * FROM user_cdc_events
    WHERE lsn IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY id, lsn ORDER BY ts_ms) = 1
)
SELECT
    e.id, e.username, e.password,
    epoch_ms(e.ts_ms) AS row_valid_start_timestamp,
    COALESCE(LEAD(epoch_ms(e.ts_ms)) OVER (PARTITION BY e.id ORDER BY e.lsn),
             TIMESTAMP '2260-01-01') AS row_valid_expiration_timestamp
FROM events_clean e
WHERE e.id IN (SELECT id FROM events_clean GROUP BY id HAVING count(*) > 1)
"""


@query("scd2_users", oracle=_SCD2_USERS_ORACLE)
def scd2_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 over the users topic — same operator, different payload
    (the ``scd2`` operator is payload-generic)."""
    decoded = decode_user_envelope(user_change_events(spark, sf_dir))
    return scd2(decoded, payload=("username", "password"))


# ---------------------------------------------------------------------------
# change-log exploration (reference README.md:220-243)
# ---------------------------------------------------------------------------

_CHANGE_LOG_ORACLE = f"""
WITH {CDC_EVENTS_SQL}
SELECT
    id,
    lsn AS log_seq_num,
    CASE WHEN op = 'c' THEN 'CREATE'
         WHEN op = 'd' THEN 'DELETE'
         WHEN op = 'u' THEN 'UPDATE'
         WHEN op = 'r' THEN 'SNAPSHOT'
         ELSE 'INVALID' END AS operation_type,
    epoch_ms(ts_ms) AS row_valid_start_timestamp,
    COALESCE(LEAD(epoch_ms(ts_ms)) OVER (PARTITION BY id ORDER BY lsn),
             TIMESTAMP '2260-01-01') AS row_valid_expiration_timestamp,
    row_number() OVER (PARTITION BY id ORDER BY lsn) AS op_order
FROM cdc_events
WHERE lsn IS NOT NULL
"""


@query("cdc_change_log", oracle=_CHANGE_LOG_ORACLE)
def cdc_change_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event audit projection with validity intervals and per-key change
    ordinal (ROW_NUMBER — reference README.md:240). Replayed duplicates are
    deliberately retained, as in the reference."""
    return change_log(_decoded(spark, sf_dir))


# ---------------------------------------------------------------------------
# SCD1 current view: latest surviving row per key
# ---------------------------------------------------------------------------

_CURRENT_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
latest AS (
    SELECT * FROM cdc_events
    WHERE lsn IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY id ORDER BY lsn DESC) = 1
)
SELECT id, name, description, CAST(price AS DOUBLE) AS price,
       epoch_ms(ts_ms) AS last_changed_at
FROM latest
WHERE op <> 'd'
"""


@query("dim_current_products", oracle=_CURRENT_ORACLE)
def dim_current_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-1 companion to the flagship: the *current* dimension — the
    highest-LSN surviving (non-deleted) row per key. One window shuffle;
    the streaming twin is ``streaming/stateful.py`` (applyInPandasWithState
    keeps this view hot instead of recomputing)."""
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("lsn").desc())
    return (
        _decoded(spark, sf_dir)
        .where(F.col("lsn").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("op") != "d"))
        .select(
            "id",
            "name",
            "description",
            F.col("price").cast("double").alias("price"),
            F.timestamp_millis(F.col("ts_ms")).alias("last_changed_at"),
        )
    )


# ---------------------------------------------------------------------------
# at-least-once transport audit: op mix before/after (id, lsn) dedup
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
deduped AS (
    SELECT * FROM cdc_events
    WHERE lsn IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY id, lsn ORDER BY ts_ms) = 1
)
SELECT
    CASE WHEN op = 'c' THEN 'CREATE'
         WHEN op = 'd' THEN 'DELETE'
         WHEN op = 'u' THEN 'UPDATE'
         WHEN op = 'r' THEN 'SNAPSHOT'
         ELSE 'INVALID' END AS operation_type,
    count(*) AS n_events,
    count(DISTINCT id) AS n_keys
FROM deduped
GROUP BY 1
"""


@query("cdc_dedup_op_counts", oracle=_DEDUP_ORACLE)
def cdc_dedup_op_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-mix audit after exactly-once repair: dedup replayed (id, lsn)
    events (the reference's transport is at-least-once — SURVEY.md S6), then
    count events and distinct keys per operation type."""
    deduped = (
        _decoded(spark, sf_dir)
        .where(F.col("lsn").isNotNull())
        .dropDuplicates(["id", "lsn"])
    )
    return deduped.groupBy(op_label(F.col("op")).alias("operation_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("id").alias("n_keys"),
    )
