"""Deterministic Debezium-envelope CDC event generator.

The reference generates its change history with a randomized OLTP workload
(``/root/reference/datagen/gen_user_payment_data.py:59-98`` — per id: one
INSERT, ~11% UPDATE, ~6% DELETE, unseeded Faker). That is not reproducible, so
this engine replaces it with a *deterministic arithmetic* workload derived from
the driver's ``part`` fixture (``part`` stands in for ``products`` per
FIXTURES.md): the same history is derivable in any engine, which is what makes
the DuckDB-oracle hash check possible.

Per part row (pk = p_partkey, base epoch 2024-01-01T00:00:00Z):

====================  =========================  ==========================
event                 condition                  (lsn, ts_ms offset)
====================  =========================  ==========================
INSERT  op='c'        always ('r' if pk%50==7)   (pk*10+1, pk*60_000)
replay of the INSERT  pk%25==0                   identical event (dup!)
UPDATE1 op='u'        pk%9==0   (~11%)           (pk*10+2, +30_000)
UPDATE2 op='u'        pk%18==0                   (pk*10+3, +45_000)
DELETE  op='d'        pk%16==0  (~6%)            (pk*10+4, +50_000)
lsn-null noise        pk%101==3                  (NULL,    +55_000)
====================  =========================  ==========================

Deliberate edge cases (SURVEY.md §5 / FIXTURES.md §A1): ids with exactly one
event (dropped by the HAVING>1 filter), c→u→u→d chains, duplicate (id,lsn)
replay pairs (the at-least-once property of the reference's S3 sink,
``connectors/s3-sink.json``), snapshot 'r' rows, and NULL-lsn rows
(exercises ``log_seq_num IS NOT NULL``, reference README.md:105-106).

``product_change_events`` returns rows in the *nested envelope* shape
(schemas.PRODUCTS_ENVELOPE — the engine's canonical change-record type);
``CDC_EVENTS_SQL`` is the flat decoded equivalent for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from change_data_capture_spark.sources.tables import load_table

#: 2024-01-01T00:00:00Z in epoch millis
BASE_TS_MS = 1_704_067_200_000


def _img(id_col: Column, name: Column, desc: Column, price: Column) -> Column:
    return F.struct(
        id_col.alias("id"),
        name.alias("name"),
        desc.alias("description"),
        price.alias("price"),
    )


def _null_img() -> Column:
    return F.lit(None).cast(
        "struct<id:bigint,name:string,description:string,price:decimal(10,2)>"
    )


def _envelope(df: DataFrame, table: str = "products") -> DataFrame:
    """Wrap flat (id, op, lsn, ts_ms, before, after) rows in the Debezium
    envelope (sample event: reference README.md:214)."""
    source = F.struct(
        F.lit("2.2.0.Alpha2").alias("version"),
        F.lit("postgresql").alias("connector"),
        F.lit("debezium").alias("name"),
        F.col("ts_ms").alias("ts_ms"),
        F.when(F.col("op") == "r", F.lit("true")).otherwise(F.lit("false")).alias("snapshot"),
        F.lit("postgres").alias("db"),
        F.lit(None).cast("string").alias("sequence"),
        F.lit("commerce").alias("schema"),
        F.lit(table).alias("table"),
        (F.col("lsn") + F.lit(500)).alias("txId"),
        F.col("lsn").alias("lsn"),
        F.lit(None).cast("long").alias("xmin"),
    )
    value = F.struct(
        F.col("before").alias("before"),
        F.col("after").alias("after"),
        source.alias("source"),
        F.col("op").alias("op"),
        (F.col("ts_ms") + F.lit(5)).alias("ts_ms"),  # connector-processing time
        F.lit(None).cast("string").alias("transaction"),
    )
    return df.select(value.alias("value"))


def product_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Debezium-envelope change log for ``products`` (= part).

    Physical shape: ONE narrow scan of ``part``; each row conditionally
    fans out into its events via array-build → filter-nulls → explode (a
    per-row flatMap, still fully codegen'd). The naive alternative — one
    UNION branch per event kind — re-scans the source six times; at 100 TB
    that is five wasted passes.
    """
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"),
        F.col("p_name").alias("name0"),
        F.col("p_type").alias("desc0"),
        F.col("p_retailprice").cast("decimal(10,2)").alias("price0"),
    )

    pk = F.col("pk")
    img0 = _img(pk, F.col("name0"), F.col("desc0"), F.col("price0"))
    img1 = _img(
        pk,
        F.concat(F.col("name0"), F.lit(" v2")),
        F.col("desc0"),
        (F.col("price0") + F.lit(1.00).cast("decimal(3,2)")).cast("decimal(10,2)"),
    )
    img2 = _img(
        pk,
        F.concat(F.col("name0"), F.lit(" v3")),
        F.col("desc0"),
        (F.col("price0") + F.lit(2.00).cast("decimal(3,2)")).cast("decimal(10,2)"),
    )
    t0 = F.lit(BASE_TS_MS) + pk * F.lit(60_000)

    def ev(op, lsn, ts, before, after):
        return F.struct(
            op.alias("op"),
            lsn.cast("long").alias("lsn"),
            ts.cast("long").alias("ts_ms"),
            before.alias("before"),
            after.alias("after"),
        )

    null_ev = F.lit(None).cast(
        "struct<op:string,lsn:bigint,ts_ms:bigint,"
        "before:struct<id:bigint,name:string,description:string,price:decimal(10,2)>,"
        "after:struct<id:bigint,name:string,description:string,price:decimal(10,2)>>"
    )

    def maybe(cond, event):
        return F.when(cond, event).otherwise(null_ev)

    ins_op = F.when(pk % 50 == 7, F.lit("r")).otherwise(F.lit("c"))
    last_img = F.when(pk % 18 == 0, img2).when(pk % 9 == 0, img1).otherwise(img0)

    events = F.filter(
        F.array(
            ev(ins_op, pk * 10 + 1, t0, _null_img(), img0),
            maybe(pk % 25 == 0, ev(ins_op, pk * 10 + 1, t0, _null_img(), img0)),  # replay
            maybe(pk % 9 == 0, ev(F.lit("u"), pk * 10 + 2, t0 + 30_000, img0, img1)),
            maybe(pk % 18 == 0, ev(F.lit("u"), pk * 10 + 3, t0 + 45_000, img1, img2)),
            maybe(pk % 16 == 0, ev(F.lit("d"), pk * 10 + 4, t0 + 50_000, last_img, _null_img())),
            maybe(
                pk % 101 == 3,
                ev(F.lit("u"), F.lit(None).cast("long"), t0 + 55_000, img0, img0),
            ),
        ),
        lambda e: e.isNotNull(),
    )
    flat_events = p.select(pk.alias("id"), F.explode(events).alias("e")).select(
        "id", "e.op", "e.lsn", "e.ts_ms", "e.before", "e.after"
    )
    return _envelope(flat_events)


def product_change_events_b64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same product change log, with ``price`` in Debezium's default
    ``decimal.handling.mode=precise`` wire form: the base64 rendering of the
    unscaled big-endian two's-complement bytes (the reference's sample event
    carries ``"price": "DOQ="`` — README.md:214). A consumer of real Debezium
    JSON sees exactly this shape; :func:`functions.envelope.
    decode_debezium_decimal` recovers the DECIMAL(10,2). Pure nested-struct
    projection over the canonical generator — no second scan."""
    from change_data_capture_spark.functions.envelope import encode_debezium_decimal

    env = product_change_events(spark, sf_dir)
    v = F.col("value")

    def img_b64(img: Column) -> Column:
        return F.when(
            img.isNotNull(),
            F.struct(
                img["id"].alias("id"),
                img["name"].alias("name"),
                img["description"].alias("description"),
                encode_debezium_decimal(img["price"], 2).alias("price"),
            ),
        ).otherwise(
            F.lit(None).cast(
                "struct<id:bigint,name:string,description:string,price:string>"
            )
        )

    value = F.struct(
        img_b64(v["before"]).alias("before"),
        img_b64(v["after"]).alias("after"),
        v["source"].alias("source"),
        v["op"].alias("op"),
        v["ts_ms"].alias("ts_ms"),
        v["transaction"].alias("transaction"),
    )
    return env.select(value.alias("value"))


def user_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic change log for ``users`` (= customer; FIXTURES.md role
    map). Same workload shape as products (the reference streams both topics,
    ``connectors/s3-sink.json:11``); payload is (username, password) per
    ``postgres/init.sql:17-21``, password = md5(name) so no secrets-looking
    literals are fabricated. Same single-scan array-explode physical shape
    as ``product_change_events``."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("pk"),
        F.col("c_name").alias("uname0"),
        F.md5(F.col("c_name")).alias("pw0"),
    )
    pk = F.col("pk")

    def img(uname, pw):
        return F.struct(
            pk.alias("id"), uname.alias("username"), pw.alias("password")
        )

    null_img = F.lit(None).cast("struct<id:bigint,username:string,password:string>")
    img0 = img(F.col("uname0"), F.col("pw0"))
    img1 = img(F.concat(F.col("uname0"), F.lit(" v2")), F.md5(F.col("pw0")))
    t0 = F.lit(BASE_TS_MS) + pk * F.lit(60_000)

    def ev(op, lsn, ts, before, after):
        return F.struct(
            op.alias("op"),
            lsn.cast("long").alias("lsn"),
            ts.cast("long").alias("ts_ms"),
            before.alias("before"),
            after.alias("after"),
        )

    null_ev = F.lit(None).cast(
        "struct<op:string,lsn:bigint,ts_ms:bigint,"
        "before:struct<id:bigint,username:string,password:string>,"
        "after:struct<id:bigint,username:string,password:string>>"
    )

    def maybe(cond, event):
        return F.when(cond, event).otherwise(null_ev)

    ins_op = F.when(pk % 50 == 7, F.lit("r")).otherwise(F.lit("c"))
    events = F.filter(
        F.array(
            ev(ins_op, pk * 10 + 1, t0, null_img, img0),
            maybe(pk % 25 == 0, ev(ins_op, pk * 10 + 1, t0, null_img, img0)),  # replay
            maybe(pk % 9 == 0, ev(F.lit("u"), pk * 10 + 2, t0 + 30_000, img0, img1)),
            maybe(
                pk % 16 == 0,
                ev(
                    F.lit("d"),
                    pk * 10 + 4,
                    t0 + 50_000,
                    F.when(pk % 9 == 0, img1).otherwise(img0),
                    null_img,
                ),
            ),
        ),
        lambda e: e.isNotNull(),
    )
    flat_events = c.select(pk.alias("id"), F.explode(events).alias("e")).select(
        "id", "e.op", "e.lsn", "e.ts_ms", "e.before", "e.after"
    )
    return _envelope(flat_events, table="users")


#: users CTE — lockstep with ``user_change_events``
USERS_CDC_EVENTS_SQL = """
usrc AS (
    SELECT c_custkey AS pk, c_name AS uname0, md5(c_name) AS pw0 FROM customer
),
user_cdc_events AS (
    SELECT pk AS id, CASE WHEN pk % 50 = 7 THEN 'r' ELSE 'c' END AS op,
           CAST(pk*10+1 AS BIGINT) AS lsn, CAST(1704067200000 + pk*60000 AS BIGINT) AS ts_ms,
           uname0 AS username, pw0 AS password
    FROM usrc
    UNION ALL
    SELECT pk, CASE WHEN pk % 50 = 7 THEN 'r' ELSE 'c' END,
           CAST(pk*10+1 AS BIGINT), CAST(1704067200000 + pk*60000 AS BIGINT),
           uname0, pw0
    FROM usrc WHERE pk % 25 = 0
    UNION ALL
    SELECT pk, 'u', CAST(pk*10+2 AS BIGINT), CAST(1704067200000 + pk*60000 + 30000 AS BIGINT),
           uname0 || ' v2', md5(pw0)
    FROM usrc WHERE pk % 9 = 0
    UNION ALL
    SELECT pk, 'd', CAST(pk*10+4 AS BIGINT), CAST(1704067200000 + pk*60000 + 50000 AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM usrc WHERE pk % 16 = 0
)
"""


#: DuckDB CTE producing the *decoded* flat event log equivalent to
#: ``functions.envelope.decode_envelope(product_change_events(...))``.
#: Keep the arithmetic in lockstep with the Spark branches above.
CDC_EVENTS_SQL = """
src AS (
    SELECT p_partkey AS pk, p_name AS name0, p_type AS desc0,
           CAST(p_retailprice AS DECIMAL(10,2)) AS price0
    FROM part
),
cdc_events AS (
    SELECT pk AS id, CASE WHEN pk % 50 = 7 THEN 'r' ELSE 'c' END AS op,
           CAST(pk*10+1 AS BIGINT) AS lsn, CAST(1704067200000 + pk*60000 AS BIGINT) AS ts_ms,
           name0 AS name, desc0 AS description, price0 AS price
    FROM src
    UNION ALL
    SELECT pk, CASE WHEN pk % 50 = 7 THEN 'r' ELSE 'c' END,
           CAST(pk*10+1 AS BIGINT), CAST(1704067200000 + pk*60000 AS BIGINT),
           name0, desc0, price0
    FROM src WHERE pk % 25 = 0
    UNION ALL
    SELECT pk, 'u', CAST(pk*10+2 AS BIGINT), CAST(1704067200000 + pk*60000 + 30000 AS BIGINT),
           name0 || ' v2', desc0, CAST(price0 + 1.00 AS DECIMAL(10,2))
    FROM src WHERE pk % 9 = 0
    UNION ALL
    SELECT pk, 'u', CAST(pk*10+3 AS BIGINT), CAST(1704067200000 + pk*60000 + 45000 AS BIGINT),
           name0 || ' v3', desc0, CAST(price0 + 2.00 AS DECIMAL(10,2))
    FROM src WHERE pk % 18 = 0
    UNION ALL
    SELECT pk, 'd', CAST(pk*10+4 AS BIGINT), CAST(1704067200000 + pk*60000 + 50000 AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS DECIMAL(10,2))
    FROM src WHERE pk % 16 = 0
    UNION ALL
    SELECT pk, 'u', CAST(NULL AS BIGINT), CAST(1704067200000 + pk*60000 + 55000 AS BIGINT),
           name0, desc0, price0
    FROM src WHERE pk % 101 = 3
)
"""
