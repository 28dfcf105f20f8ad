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
from change_data_capture_spark.sources.tables import load_table


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


# ---------------------------------------------------------------------------
# point-in-time (temporal) join: fact rows against the SCD2 dimension AS OF
# each fact row's event time — the query SCD2 dimensions exist to serve
# (reference README.md:86-125 motivates the dimension with exactly this
# "what did the row look like at time T" question)
# ---------------------------------------------------------------------------

_PIT_JOIN_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
events_clean AS (
    SELECT * FROM cdc_events
    WHERE lsn IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY id, lsn ORDER BY ts_ms) = 1
),
dim AS (
    SELECT
        e.id, e.name, CAST(e.price AS DOUBLE) AS price,
        epoch_ms(e.ts_ms) AS vs,
        COALESCE(LEAD(epoch_ms(e.ts_ms))
                     OVER (PARTITION BY e.id ORDER BY e.lsn),
                 TIMESTAMP '2260-01-01') AS ve
    FROM events_clean e
    WHERE e.id IN (SELECT id FROM events_clean GROUP BY id HAVING count(*) > 1)
),
fact AS (
    SELECT l_orderkey, l_linenumber, l_partkey,
           epoch_ms(CAST(1704067200000 + l_partkey * 60000
                         + (l_orderkey % 4) * 20000 AS BIGINT)) AS probe_ts
    FROM lineitem
)
SELECT f.l_orderkey, f.l_linenumber, f.l_partkey, f.probe_ts,
       d.name AS name_asof, d.price AS price_asof
FROM fact f
JOIN dim d
  ON d.id = f.l_partkey AND f.probe_ts >= d.vs AND f.probe_ts < d.ve
"""


@query("scd2_point_in_time_join", oracle=_PIT_JOIN_ORACLE)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: every lineitem fact row joined to the product
    SCD2 dimension AS OF the fact's event time (probe_ts, derived
    deterministically so probes straddle the generator's update/delete
    boundaries at +30 s/+45 s/+50 s — see sources.cdc_generator).

    Physical shape (the 100 TB story): this is an **equi join on the
    dimension key with the validity interval as a residual predicate** —
    one hash shuffle on ``id``/``l_partkey``, identical to any fact-dim
    join; NOT a range join. Each key holds only its few versions, so the
    per-key interval scan is O(versions) and skew follows fact-key skew,
    which AQE's skew-join split handles. On a real warehouse both sides
    would be bucketed by the key, making this join shuffle-free."""
    fact = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.timestamp_millis(
            F.lit(1704067200000).cast("long")
            + F.col("l_partkey") * 60000
            + (F.col("l_orderkey") % 4) * 20000
        ).alias("probe_ts"),
    )
    dim = scd2(_decoded(spark, sf_dir)).select(
        "id",
        F.col("name").alias("name_asof"),
        F.col("price").cast("double").alias("price_asof"),
        F.col("row_valid_start_timestamp").alias("vs"),
        F.col("row_valid_expiration_timestamp").alias("ve"),
    )
    return fact.join(
        dim,
        (F.col("l_partkey") == F.col("id"))
        & (F.col("probe_ts") >= F.col("vs"))
        & (F.col("probe_ts") < F.col("ve")),
    ).select(
        "l_orderkey", "l_linenumber", "l_partkey", "probe_ts",
        "name_asof", "price_asof",
    )


# ---------------------------------------------------------------------------
# snapshot-based CDC: diff two full table snapshots into a change set —
# the log-free capture technique (what you do when there is no WAL to tail;
# the complement of the reference's Debezium log-based capture)
# ---------------------------------------------------------------------------

_SNAPSHOT_DIFF_ORACLE = """
WITH old_snap AS (
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
),
new_snap AS (
    SELECT c_custkey,
           c_name,
           c_nationkey,
           CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                ELSE c_acctbal END AS c_acctbal,
           CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    WHERE c_custkey % 10 <> 0
    UNION ALL
    SELECT c_custkey + 1000000000,
           'NEW ' || c_name, c_nationkey, c_acctbal, 'NEWSEG'
    FROM customer
    WHERE c_custkey % 13 = 0
),
diff AS (
    SELECT
        COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
        CASE
            WHEN n.c_custkey IS NULL THEN 'd'
            WHEN o.c_custkey IS NULL THEN 'i'
            WHEN o.c_name IS DISTINCT FROM n.c_name
              OR o.c_nationkey IS DISTINCT FROM n.c_nationkey
              OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
              OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'u'
        END AS op,
        o.c_name AS name_old, n.c_name AS name_new,
        o.c_acctbal AS acctbal_old, n.c_acctbal AS acctbal_new,
        o.c_mktsegment AS segment_old, n.c_mktsegment AS segment_new
    FROM old_snap o
    FULL OUTER JOIN new_snap n USING (c_custkey)
)
SELECT * FROM diff WHERE op IS NOT NULL
"""


@query("snapshot_diff_cdc", oracle=_SNAPSHOT_DIFF_ORACLE)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-based CDC: diff two consecutive full snapshots of
    ``customer`` into insert/update/delete change events. The new snapshot
    is derived deterministically (``%10`` deletes, ``%7`` balance+segment
    updates, ``%13`` inserts under shifted keys) so both engines construct
    identical inputs.

    This is the log-free capture path — the technique used when no
    transaction log is available (the reference's Debezium 'r' snapshot
    phase is the bootstrap half of it; this operator is the recurring
    diff half). Physical shape: one full-outer hash join on the primary
    key + a codegen'd comparison projection — a single co-partitioned
    shuffle at any scale, and shuffle-free if both snapshots are bucketed
    by key (how you'd lay out nightly snapshots at 100 TB). Row
    classification uses join-side marker flags, not key NULL-ness, so NULL
    merge keys cannot be misclassified (cf. operators.merge_queries)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    is_upd = F.col("c_custkey") % 7 == 0
    new_snap = (
        c.where(F.col("c_custkey") % 10 != 0)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.when(is_upd, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            F.when(is_upd, F.lit("MOVED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
        .unionByName(
            c.where(F.col("c_custkey") % 13 == 0).select(
                (F.col("c_custkey") + 1000000000).alias("c_custkey"),
                F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
                "c_nationkey",
                "c_acctbal",
                F.lit("NEWSEG").alias("c_mktsegment"),
            )
        )
    )
    o = c.toDF(*[f"{col}_o" for col in c.columns]).withColumn("_in_old", F.lit(True))
    n = new_snap.toDF(*[f"{col}_n" for col in new_snap.columns]).withColumn(
        "_in_new", F.lit(True)
    )
    j = o.join(n, o["c_custkey_o"] == n["c_custkey_n"], "full_outer")
    changed = (
        ~F.col("c_name_o").eqNullSafe(F.col("c_name_n"))
        | ~F.col("c_nationkey_o").eqNullSafe(F.col("c_nationkey_n"))
        | ~F.col("c_acctbal_o").eqNullSafe(F.col("c_acctbal_n"))
        | ~F.col("c_mktsegment_o").eqNullSafe(F.col("c_mktsegment_n"))
    )
    op = (
        F.when(F.col("_in_new").isNull(), "d")
        .when(F.col("_in_old").isNull(), "i")
        .when(changed, "u")
    )
    return (
        j.select(
            F.coalesce("c_custkey_o", "c_custkey_n").alias("c_custkey"),
            op.alias("op"),
            F.col("c_name_o").alias("name_old"),
            F.col("c_name_n").alias("name_new"),
            F.col("c_acctbal_o").alias("acctbal_old"),
            F.col("c_acctbal_n").alias("acctbal_new"),
            F.col("c_mktsegment_o").alias("segment_old"),
            F.col("c_mktsegment_n").alias("segment_new"),
        )
        .where(F.col("op").isNotNull())
    )


# ---------------------------------------------------------------------------
# SCD Type 3: current row + previous-value columns (bounded history)
# ---------------------------------------------------------------------------

_SCD3_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
events_clean AS (
    SELECT * FROM cdc_events
    WHERE lsn IS NOT NULL AND op <> 'd'
    QUALIFY row_number() OVER (PARTITION BY id, lsn ORDER BY ts_ms) = 1
),
versioned AS (
    SELECT id, name, CAST(price AS DOUBLE) AS price,
           LAG(name) OVER w AS prev_name,
           LAG(CAST(price AS DOUBLE)) OVER w AS prev_price,
           epoch_ms(ts_ms) AS changed_at,
           row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn,
           count(*) OVER (PARTITION BY id) AS n_versions
    FROM events_clean
    WINDOW w AS (PARTITION BY id ORDER BY lsn)
)
SELECT id, name, price, prev_name, prev_price, changed_at,
       CAST(n_versions AS BIGINT) AS n_versions
FROM versioned WHERE rn = 1
"""


@query("scd3_products", oracle=_SCD3_ORACLE)
def scd3_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 3 — the third classic slowly-changing-dimension shape next
    to the repo's Type 2 (``scd2_products``) and Type 1
    (``dim_current_products``): one CURRENT row per key carrying
    previous-value columns (``prev_name``/``prev_price``) for one-step
    history, plus the version count. Deletes are tombstones, not
    versions, so ``op = 'd'`` rows are excluded before versioning.

    Scale shape: identical to the flagship — everything (dedup, lag,
    version count, latest-row pick) rides ONE window shuffle on ``id``;
    the rank-1 filter compiles to WindowGroupLimit pushdown on the final
    window."""
    from pyspark.sql import Window

    e = (
        _decoded(spark, sf_dir)
        .where(F.col("lsn").isNotNull() & (F.col("op") != "d"))
    )
    w_dedup = Window.partitionBy("id", "lsn").orderBy("ts_ms")
    clean = (
        e.withColumn("_dup", F.row_number().over(w_dedup))
        .where(F.col("_dup") == 1)
        .drop("_dup")
    )
    w = Window.partitionBy("id").orderBy("lsn")
    w_all = Window.partitionBy("id")
    price_d = F.col("price").cast("double")
    versioned = clean.select(
        "id",
        "name",
        price_d.alias("price"),
        F.lag("name").over(w).alias("prev_name"),
        F.lag(price_d).over(w).alias("prev_price"),
        F.timestamp_millis(F.col("ts_ms")).alias("changed_at"),
        F.row_number().over(Window.partitionBy("id").orderBy(F.col("lsn").desc())).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_versions"),
    )
    return versioned.where(F.col("rn") == 1).drop("rn")


# ---------------------------------------------------------------------------
# CDC schema evolution: the source table gains a column mid-stream
# ---------------------------------------------------------------------------

_SCD2_EVOLVED_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
evolved AS (
    SELECT *,
           CASE WHEN lsn % 10 >= 2 AND op <> 'd'
                THEN 'cat-' || CAST(id % 5 AS VARCHAR) END AS category
    FROM cdc_events
),
events_clean AS (
    SELECT * FROM evolved
    WHERE lsn IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY id, lsn ORDER BY ts_ms) = 1
)
SELECT
    e.id, e.name, e.description,
    CAST(e.price AS DOUBLE) AS price,
    e.category,
    epoch_ms(e.ts_ms) AS row_valid_start_timestamp,
    COALESCE(LEAD(epoch_ms(e.ts_ms)) OVER (PARTITION BY e.id ORDER BY e.lsn),
             TIMESTAMP '2260-01-01') AS row_valid_expiration_timestamp
FROM events_clean e
WHERE e.id IN (SELECT id FROM events_clean GROUP BY id HAVING count(*) > 1)
"""


@query("scd2_schema_evolution", oracle=_SCD2_EVOLVED_ORACLE)
def scd2_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship under SCHEMA DRIFT — the CDC failure mode pinned
    schemas must survive: the source table gains a column mid-stream
    (``ALTER TABLE products ADD COLUMN category``, here: every event with
    ``lsn % 10 >= 2`` — the updates and deletes, which postdate the initial
    snapshot/create wave). The wire log is genuinely MIXED-VERSION: each
    envelope is re-serialized to its JSON line with ``to_json`` (null
    fields omitted, so pre-evolution lines carry NO ``category`` key —
    byte-for-byte v1), then every line is re-parsed with ONE evolved
    superset schema. ``from_json`` yields NULL for the absent field, which
    is exactly Debezium/Kafka consumer semantics for pre-migration events:
    old history keeps flowing, new rows carry the new column, and the SCD2
    output shows NULL category on pre-evolution validity intervals.

    The engine-side recipe this proves: evolve the pinned ``StructType`` to
    the superset and redeploy — no backfill, no dual-reader. The oracle
    recomputes the same mixed-version log arithmetically."""
    from change_data_capture_spark.schemas import (
        SOURCE_BLOCK,
        envelope_schema,
    )
    from pyspark.sql.types import (
        DecimalType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    env = product_change_events(spark, sf_dir)
    v = F.col("value")
    post = v["source"]["lsn"] % 10 >= 2
    cat = F.concat(F.lit("cat-"), (v["after"]["id"] % 5).cast("string"))
    after2 = F.when(
        v["after"].isNotNull(),
        F.struct(
            v["after"]["id"].alias("id"),
            v["after"]["name"].alias("name"),
            v["after"]["description"].alias("description"),
            v["after"]["price"].alias("price"),
            F.when(post, cat).alias("category"),
        ),
    )
    value2 = F.struct(
        v["before"].alias("before"),
        after2.alias("after"),
        v["source"].alias("source"),
        v["op"].alias("op"),
        v["ts_ms"].alias("ts_ms"),
    )
    # the mixed-version wire line: to_json omits null fields, so the
    # category key EXISTS only on post-evolution events
    line = F.to_json(F.struct(value2.alias("value")))

    row_v2 = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("description", StringType()),
            StructField("price", DecimalType(10, 2)),
            StructField("category", StringType()),
        ]
    )
    parsed = env.select(
        F.from_json(line, envelope_schema(row_v2)).alias("wrapped")
    ).select(F.col("wrapped.value").alias("value"))
    pv = F.col("value")
    decoded = parsed.select(
        F.coalesce(pv["after"]["id"], pv["before"]["id"]).alias("id"),
        pv["source"]["lsn"].alias("lsn"),
        pv["source"]["ts_ms"].alias("ts_ms"),
        pv["after"]["name"].alias("name"),
        pv["after"]["description"].alias("description"),
        pv["after"]["price"].alias("price"),
        pv["after"]["category"].alias("category"),
    )
    return scd2(
        decoded, payload=("name", "description", "price", "category")
    ).withColumn("price", F.col("price").cast("double"))


# ---------------------------------------------------------------------------
# M1: JSON schema introspection of the raw wire (the pre-pinning probe)
# ---------------------------------------------------------------------------

_WIRE_SCHEMA_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
agg AS (
    SELECT count(*) AS n_all,
           count(*) FILTER (WHERE op IN ('u', 'd')) AS n_before,
           count(*) FILTER (WHERE op <> 'd')        AS n_after,
           count(*) FILTER (WHERE lsn IS NOT NULL)  AS n_lsn
    FROM cdc_events
)
SELECT path, jtype, n FROM (
    SELECT '$.value' AS path, 'object' AS jtype, n_all AS n FROM agg
    UNION ALL SELECT '$.value.op',    'string', n_all FROM agg
    UNION ALL SELECT '$.value.ts_ms', 'number', n_all FROM agg
    UNION ALL SELECT '$.value.before',             'object', n_before FROM agg
    UNION ALL SELECT '$.value.before.id',          'number', n_before FROM agg
    UNION ALL SELECT '$.value.before.name',        'string', n_before FROM agg
    UNION ALL SELECT '$.value.before.description', 'string', n_before FROM agg
    UNION ALL SELECT '$.value.before.price',       'number', n_before FROM agg
    UNION ALL SELECT '$.value.after',              'object', n_after FROM agg
    UNION ALL SELECT '$.value.after.id',           'number', n_after FROM agg
    UNION ALL SELECT '$.value.after.name',         'string', n_after FROM agg
    UNION ALL SELECT '$.value.after.description',  'string', n_after FROM agg
    UNION ALL SELECT '$.value.after.price',        'number', n_after FROM agg
    UNION ALL SELECT '$.value.source',           'object', n_all FROM agg
    UNION ALL SELECT '$.value.source.version',   'string', n_all FROM agg
    UNION ALL SELECT '$.value.source.connector', 'string', n_all FROM agg
    UNION ALL SELECT '$.value.source.name',      'string', n_all FROM agg
    UNION ALL SELECT '$.value.source.ts_ms',     'number', n_all FROM agg
    UNION ALL SELECT '$.value.source.snapshot',  'string', n_all FROM agg
    UNION ALL SELECT '$.value.source.db',        'string', n_all FROM agg
    UNION ALL SELECT '$.value.source.schema',    'string', n_all FROM agg
    UNION ALL SELECT '$.value.source.table',     'string', n_all FROM agg
    UNION ALL SELECT '$.value.source.txId',      'number', n_lsn FROM agg
    UNION ALL SELECT '$.value.source.lsn',       'number', n_lsn FROM agg
) WHERE n > 0
"""


def _walk_json_value(prefix: str, val, out: list, emit_root: bool = True) -> None:
    """Recursively emit (path, normalized-json-type) for a parsed JSON
    value: object/array/string/number/boolean/null; objects recurse into
    ``prefix.key`` children (array elements are not walked — the path
    reports the array itself). ``emit_root=False`` skips the synthetic
    root path and walks only its children (the per-line entry point)."""
    if isinstance(val, bool):  # before number: bool is an int subclass
        t = "boolean"
    elif isinstance(val, (int, float)):
        t = "number"
    elif isinstance(val, str):
        t = "string"
    elif isinstance(val, dict):
        t = "object"
    elif isinstance(val, list):
        t = "array"
    else:
        t = "null"
    if emit_root:
        out.append((prefix, t))
    if isinstance(val, dict):
        for k, v in val.items():
            _walk_json_value(f"{prefix}.{k}", v, out)


@query("cdc_wire_schema_introspection", oracle=_WIRE_SCHEMA_ORACLE)
def cdc_wire_schema_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — JSON schema introspection of the RAW wire log, the probe a
    consumer runs BEFORE pinning an envelope StructType (the reference
    inspects its untyped ``json`` column with ``json_type(*)`` —
    ``README.md:216-218``): every NDJSON line is walked recursively and
    each present key path reports its normalized JSON type
    (object, array, string, number, boolean, null) with an occurrence
    count. Because the wire omits null fields (Debezium/to_json
    semantics), presence counts ARE the schema's nullability story: the
    probe shows ``$.value.before`` on exactly the update/delete events,
    ``$.value.source.lsn`` absent on the lsn-less duplicate-update events, and
    ``$.value.source.sequence``/``xmin``/``transaction`` never — which is
    how an operator discovers optional fields without any schema document.

    Spark-first shape: the walk is genuinely dynamic (paths are data, so
    no ``get_json_object`` literal-path projection can express it) —
    ONE scan, ``to_json`` serialization JVM-side, one Arrow-batched
    ``mapInPandas`` walking each line with the stdlib parser, then a
    partial-agg groupBy on (path, jtype) whose cardinality is the schema
    size (~24 rows), not the data size. Scan-rate-bound, no skew, no
    array carry — safe at any corpus size.

    The oracle does NOT re-walk JSON: it PREDICTS the schema report
    arithmetically from the generator's event mix (op determines
    before/after presence; the null-lsn replay rows lose lsn/txId), so a
    hash match proves the byte-level introspection recovers exactly the
    declared wire semantics."""
    env = product_change_events(spark, sf_dir)
    lines = env.select(
        F.to_json(F.struct(F.col("value").alias("value"))).alias("line")
    )

    def _walk(batches):
        import json

        import pandas as pd

        for pdf in batches:
            out: list = []
            for line in pdf["line"]:
                _walk_json_value("$", json.loads(line), out, emit_root=False)
            yield pd.DataFrame(out, columns=["path", "jtype"])

    walked = lines.mapInPandas(_walk, "path string, jtype string")
    return walked.groupBy("path", "jtype").agg(F.count(F.lit(1)).alias("n"))
