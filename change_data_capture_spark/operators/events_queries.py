"""Event-stream analytics over the ``events`` fixture — the batch
formulations of the streaming surface (tumbling windows, sessionization,
as-of enrichment, interval joins). The live Structured Streaming versions of
these live in ``streaming/``; these batch twins are what the DuckDB oracle
can check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.tables import load_table


def _dec(col, p: int = 18, s: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


def _d(c: F.Column) -> F.Column:
    return c.cast("double")


# ---------------------------------------------------------------------------
# tumbling window aggregation (streaming window, batch twin)
# ---------------------------------------------------------------------------

_TUMBLING_ORACLE = """
SELECT
    date_trunc('hour', ts) AS window_start,
    event_type,
    count(*) AS n_events,
    count(DISTINCT user_id) AS n_users,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
FROM events
GROUP BY 1, 2
"""


@query("events_tumbling_hourly", oracle=_TUMBLING_ORACLE)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window aggregate per event type — ``F.window`` (the
    same operator Structured Streaming uses with a watermark; epoch-aligned
    1h windows coincide with date_trunc('hour'))."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    n = F.count(F.lit(1))
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(
            n.alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _d(F.sum(_dec("value"))).alias("total_value"),
            (_d(F.sum(_dec("value"))) / n).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
            "avg_value",
        )
    )


# ---------------------------------------------------------------------------
# sessionization (gap-based) — batch twin of F.session_window
# ---------------------------------------------------------------------------

_SESSION_GAP_MS = 30 * 60 * 1000

_SESSION_ORACLE = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > {_SESSION_GAP_MS}
                  OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_id
"""


@query("events_sessionization", oracle=_SESSION_ORACLE)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min inactivity) via the classic
    lag→flag→cumsum rewrite. One shuffle on user_id; flag, cumulative sum,
    and the final per-(user, session) aggregate all reuse that partitioning.
    Streaming twin: ``F.session_window`` (see streaming/)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | (F.unix_millis(F.col("ts")) - F.unix_millis(prev_ts) > _SESSION_GAP_MS)
    ).cast("int")
    return (
        e.select(
            "user_id",
            "ts",
            "event_id",
            "value",
            F.sum(new_session).over(wcum).alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            _d(F.sum(_dec("value"))).alias("session_value"),
        )
    )


# ---------------------------------------------------------------------------
# as-of join: enrich each event with the user's latest order date
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
SELECT e.event_id, e.user_id, e.ts,
       (SELECT max(o.o_orderdate) FROM orders o
         WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS last_order_date
FROM events e
"""


@query("asof_join_last_order", oracle=_ASOF_ORACLE)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — each event picks the most recent order date of its user
    at event time.

    Spark has no native as-of join; the scalable rewrite is the
    union-and-carry pattern: tag both sides, union on (key, time), and carry
    the last seen right-side value forward with ``last(..., ignoreNulls)``
    over one (key, time)-sorted window. Cost: one shuffle on the key —
    no nested-loop, no per-row subquery, skew handled by AQE. The oracle
    states the semantics directly as a correlated scalar subquery.
    """
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")

    # pre-reduce the right side: only the max orderdate per (custkey, date)
    # matters; dedup cuts the union volume (cheap partial agg).
    o_side = (
        o.select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ts"),
            F.col("o_orderdate").alias("order_date"),
        )
        .distinct()
        .withColumn("event_id", F.lit(None).cast("long"))
        .withColumn("is_event", F.lit(0))
    )
    e_side = e.select(
        "user_id", "ts", F.lit(None).cast("timestamp").alias("order_date"),
        "event_id", F.lit(1).alias("is_event"),
    )
    # order rows sort before event rows at equal ts (is_event ASC) so an
    # order dated exactly at the event time counts as "<= ts".
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_event", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o_side.unionByName(e_side)
        .select(
            "event_id",
            "user_id",
            "ts",
            "is_event",
            F.last("order_date", ignorenulls=True).over(w).alias("last_order_date"),
        )
        .where(F.col("is_event") == 1)
        .select("event_id", "user_id", "ts", "last_order_date")
    )


# ---------------------------------------------------------------------------
# interval (range) join, bucketed for scale
# ---------------------------------------------------------------------------

_RANGE_ORACLE = """
SELECT o.o_orderpriority,
       count(*) AS n_pairs,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM orders o
JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <  o.o_orderdate + INTERVAL 3 DAY
GROUP BY o.o_orderpriority
"""


@query("range_join_ship_window", oracle=_RANGE_ORACLE)
def range_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval join (no equi key): lineitems shipped within 3 days of
    *any* order's date.

    Naive Spark execution is a BroadcastNestedLoopJoin — O(|O|·|L|), dead at
    scale. Two composed scale techniques here (SURVEY.md §7 calls the range
    join the one genuinely hard physical piece):

    1. **Aggregate pushdown through the range join.** The payload (count,
       qty-sum) depends only on the ship *day*, so lineitem collapses to one
       row per day before joining (600k rows → ~2.4k at sf0.1; same ratio at
       100 TB). The true pair count (~10⁸ at sf0.1) is never materialized —
       it is reconstructed from day-level partial aggregates.
    2. **Interval bucketing.** Quantize time into buckets at least as wide
       as the interval (7 days ≥ 3 days), so each order interval [d, d+3)
       overlaps ≤ 2 buckets; explode orders to those bucket rows, equi-join
       on the dense bucket key, post-filter the exact predicate. Each
       qualifying pair appears exactly once (its day-bucket matches exactly
       one of the order's bucket rows). No nested loop at any scale.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")

    # (1) collapse lineitem to per-day partial aggregates
    days = (
        l.groupBy(F.date_trunc("day", "l_shipdate").alias("ship_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_day"),
            F.sum(_dec("l_quantity")).alias("qty_day"),
        )
    )

    # (2) bucketed range join: orders × day-aggregates
    bucket_len = 7 * 24 * 3600  # seconds; >= interval length
    o_b = o.select(
        "o_orderpriority",
        F.col("o_orderdate").alias("start_ts"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("end_ts"),
    ).withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp("start_ts") / bucket_len).cast("long"),
                # end is exclusive: the last overlapped bucket is the one
                # containing the last included instant (end - 1s)
                ((F.unix_timestamp("end_ts") - 1) / bucket_len).cast("long"),
            )
        ),
    )
    d_b = days.withColumn(
        "bucket", (F.unix_timestamp("ship_ts") / bucket_len).cast("long")
    )
    pairs = o_b.join(d_b, "bucket").where(
        (F.col("ship_ts") >= F.col("start_ts")) & (F.col("ship_ts") < F.col("end_ts"))
    )
    return pairs.groupBy("o_orderpriority").agg(
        F.sum("n_day").alias("n_pairs"),
        _d(F.sum("qty_day")).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# JSON / map functions over the props column
# ---------------------------------------------------------------------------

_PROPS_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
       len(json_keys(props)) AS n_keys,
       json_extract_string(props, '$.missing') IS NOT NULL AS has_missing
FROM events
"""


_MAP_TRANSFORM_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
            THEN 1 ELSE 0 END AS n_large_values,
       2 AS merged_size,
       'k' AS first_key
FROM events
"""


@query("map_transform_funcs", oracle=_MAP_TRANSFORM_ORACLE)
def map_transform_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map lambda family: transform_values, map_filter, map_concat,
    map_entries — computed on a real MapType column built from the JSON
    props; outputs are scalars (map types don't survive the pandas bridge),
    and the oracle states the equivalent scalar arithmetic."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    doubled = F.transform_values(m, lambda _k, v: v * 2)
    large = F.map_filter(m, lambda _k, v: v > 50)
    merged = F.map_concat(m, F.create_map(F.lit("extra"), F.lit(1)))
    return e.select(
        "event_id",
        F.element_at(doubled, "k").alias("k_doubled"),
        F.size(large).alias("n_large_values"),
        F.size(merged).alias("merged_size"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


@query("json_map_funcs", oracle=_PROPS_ORACLE)
def json_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON document-column handling (P2/M1 generalized): typed extraction
    via ``from_json`` to MapType + ``get_json_object`` path probe. Map stays
    internal (pandas-bridge hazard); outputs are scalars."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.get_json_object("props", "$.missing").isNotNull().alias("has_missing"),
    )


# ---------------------------------------------------------------------------
# array lambda functions over embeddings
# ---------------------------------------------------------------------------

_ARRAY_ORACLE = """
SELECT vec_id, label,
       len(embedding) AS dim,
       round(list_sum(CAST(embedding AS DOUBLE[])), 6) AS sum_values,
       CAST(list_max(CAST(embedding AS DOUBLE[])) AS DOUBLE) AS max_value,
       round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 6) AS squared_norm,
       len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_positive
FROM embeddings
"""


@query("array_vector_funcs", oracle=_ARRAY_ORACLE)
def array_vector_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array lambda family (transform/filter/aggregate) over the embedding
    column — float32 values are widened to double (exact) and folded
    sequentially, matching DuckDB's list_sum order, so sums agree bit-wise;
    round(6) guards the boundary."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(fold(vec), 6).alias("sum_values"),
        F.array_max(vec).alias("max_value"),
        F.round(fold(F.transform(vec, lambda x: x * x)), 6).alias("squared_norm"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
    )


# ---------------------------------------------------------------------------
# hopping (sliding) window aggregation — overlapping windows
# ---------------------------------------------------------------------------

_HOPPING_ORACLE = """
WITH bucketed AS (
    SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS b, ts, event_type, value
    FROM events
),
assigned AS (
    SELECT b AS window_start, event_type, value FROM bucketed
    UNION ALL
    SELECT b - INTERVAL 30 MINUTE, event_type, value FROM bucketed
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM assigned
GROUP BY 1, 2
"""


@query("events_hopping_windows", oracle=_HOPPING_ORACLE)
def events_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows hopping every 30 minutes — each event lands in exactly
    two overlapping windows (``F.window`` with a slide, the operator
    Structured Streaming pairs with a watermark for sliding aggregates; the
    oracle materializes the same two epoch-aligned window starts per event).
    The window assignment is a flat-map (Expand), so the only shuffle is the
    aggregate itself."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _d(F.sum(_dec("value"))).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# conversion funnel: ordered stage progression in ONE window shuffle
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH w1 AS (
    SELECT user_id, event_type, ts,
           min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
    FROM events
),
w2 AS (
    SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
    FROM w1
),
w3 AS (
    SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS t3
    FROM w2
)
SELECT count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_view,
       count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_click_after,
       count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_purchase_after,
       CAST(count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS DOUBLE)
       / count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS conversion
FROM w3
"""


@query("events_funnel_conversion", oracle=_FUNNEL_ORACLE)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): a user counts
    for stage k only with an event AFTER their stage-k-1 time. The three
    correlated "first event after X" lookups chain as min-CASE windows over
    the SAME user partitioning — Catalyst plans ONE exchange for all three
    (sequenced selects can't collapse windows that reference each other,
    but they share the partitioning), versus the naive three
    aggregate+self-join rounds (3 shuffles of the full event log). Final
    stage counts are conditional distinct counts in a single global agg."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    s1 = e.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    n1 = F.countDistinct(F.when(F.col("t1").isNotNull(), F.col("user_id")))
    n2 = F.countDistinct(F.when(F.col("t2").isNotNull(), F.col("user_id")))
    n3 = F.countDistinct(F.when(F.col("t3").isNotNull(), F.col("user_id")))
    return s3.agg(
        n1.alias("n_view"),
        n2.alias("n_click_after"),
        n3.alias("n_purchase_after"),
        (n3.cast("double") / n1).alias("conversion"),
    )


# ---------------------------------------------------------------------------
# retention cohorts: epoch-week buckets, convention-free integer arithmetic
# ---------------------------------------------------------------------------

_WEEK_US = 604_800_000_000  # 7 days in microseconds

_RETENTION_ORACLE = f"""
WITH act AS (
    SELECT user_id,
           epoch_us(ts) // {_WEEK_US} AS wk,
           min(epoch_us(ts) // {_WEEK_US}) OVER (PARTITION BY user_id) AS cohort_wk
    FROM events
),
cells AS (
    SELECT cohort_wk, wk - cohort_wk AS week_offset,
           count(DISTINCT user_id) AS n_users
    FROM act GROUP BY 1, 2
)
SELECT cohort_wk, week_offset, n_users,
       CAST(n_users AS DOUBLE)
       / max(CASE WHEN week_offset = 0 THEN n_users END)
             OVER (PARTITION BY cohort_wk) AS retention
FROM cells
"""


@query("events_retention_cohorts", oracle=_RETENTION_ORACLE)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users bucketed by first-activity week
    (epoch-aligned integer week index — no calendar-week-start convention
    to disagree on), counted distinct in each later week offset, with the
    retention ratio against the cohort's own week-0 size. Physical shape:
    one window exchange on user_id (cohort assignment), one aggregate
    exchange on the (cohort, offset) cell, one tiny window over cells."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        # integer `div`, matching DuckDB's `//` exactly — float division
        # plus cast could disagree at a week boundary
        F.expr(f"unix_micros(ts) div {_WEEK_US}").alias("wk"),
    )
    wu = Window.partitionBy("user_id")
    act = e.withColumn("cohort_wk", F.min("wk").over(wu))
    cells = act.groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset")).agg(
        F.countDistinct("user_id").alias("n_users")
    )
    wc = Window.partitionBy("cohort_wk")
    base = F.max(F.when(F.col("week_offset") == 0, F.col("n_users"))).over(wc)
    return cells.select(
        "cohort_wk", "week_offset", "n_users",
        (F.col("n_users").cast("double") / base).alias("retention"),
    )


# ---------------------------------------------------------------------------
# Time-series gap filling with last-observation-carried-forward
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH bounds AS (
    SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
),
days AS (
    SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                       CAST(d1 AS TIMESTAMP),
                                       INTERVAL 1 DAY)) AS DATE) AS day
    FROM bounds
),
spine AS (
    SELECT u.user_id, days.day
    FROM (SELECT DISTINCT user_id FROM events) u
    CROSS JOIN days
),
daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
               AS day_total
    FROM events
    GROUP BY 1, 2
)
SELECT s.user_id, s.day,
       coalesce(d.n_events, 0) AS n_events,
       d.day_total,
       last_value(d.day_total IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS day_total_locf,
       (d.user_id IS NULL) AS is_gap
FROM spine s
LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
"""


@query("timeseries_gapfill_locf", oracle=_GAPFILL_ORACLE)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user activity densified over a generated calendar spine,
    with gaps zero-filled (counts) and last-observation-carried-forward
    (totals) — the standard telemetry/feature-store shape ("as of day D,
    the user's latest known total").

    Physical shape: the day spine is `sequence()` over a 2-row broadcast
    of global min/max — users × days stays tiny relative to the fact table;
    the daily aggregate is the only fact-sized shuffle; LOCF is one
    cumulative window (`last(..., ignoreNulls=True)`) per user partition.
    Day totals accumulate in integer cents (exact in any order) before one
    double division — bit-identical cross-engine."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    users = e.select("user_id").distinct()
    spine = users.join(F.broadcast(bounds)).select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    daily = (
        e.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100
            ).alias("day_total"),
        )
    )
    d = daily.alias("d")
    joined = spine.alias("s").join(
        d,
        (F.col("s.user_id") == F.col("d.user_id")) & (F.col("s.day") == F.col("d.day")),
        "left",
    )
    w = (
        Window.partitionBy("s.user_id")
        .orderBy("s.day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col("s.user_id").alias("user_id"),
        F.col("s.day").alias("day"),
        F.coalesce(F.col("d.n_events"), F.lit(0)).alias("n_events"),
        F.col("d.day_total").alias("day_total"),
        F.last("d.day_total", ignorenulls=True).over(w).alias("day_total_locf"),
        F.col("d.user_id").isNull().alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# Spark 4 VariantType over open-ended JSON (driver-gated)
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
WITH k AS (
    SELECT event_type,
           CASE WHEN props IS NOT NULL AND json_valid(props)
                THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
    FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS k_sum,
       min(k) AS k_min,
       max(k) AS k_max
FROM k
GROUP BY event_type
"""


@query("events_variant_props", oracle=_VARIANT_ORACLE)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type: ``props``
    is parsed ONCE into a binary variant (`parse_json`), fields extract
    lazily and typed (`try_variant_get`) — the modern path for open-ended
    JSON where the envelope's pinned StructType doesn't apply (reference
    counterpart: the ad-hoc exploration queries in README.md:138-248 that
    probe event payloads without a declared schema). At 100 TB, variant
    binary beats per-query JSON string re-parsing (~one decode per field
    access instead of a full text parse), and shredded-variant parquet
    pushes typed subfield scans down to the reader. The oracle reads the
    same fields with DuckDB's JSON functions.

    Dirty-input totality: ``try_parse_json`` (not ``parse_json``, which
    THROWS and would kill the job on one malformed payload — found by the
    degenerate-events suite) yields NULL for unparseable props, mirrored
    by the oracle's ``json_valid`` guard; NULL flows through the typed
    extraction and the null-skipping aggregates identically."""
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


# ---------------------------------------------------------------------------
# forward as-of join with tolerance: next purchase within 1 hour of a view
# ---------------------------------------------------------------------------

_ASOF_FWD_ORACLE = """
SELECT v.event_id AS view_id, v.user_id, v.ts,
       (SELECT b.event_id FROM events b
         WHERE b.event_type = 'purchase'
           AND b.user_id = v.user_id
           AND b.ts >= v.ts
           AND b.ts <= v.ts + INTERVAL 1 HOUR
         ORDER BY b.ts, b.event_id LIMIT 1) AS next_purchase_id
FROM events v
WHERE v.event_type = 'view'
"""


@query("asof_join_next_order", oracle=_ASOF_FWD_ORACLE)
def asof_join_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a tolerance bound: each view event picks the
    SAME USER\'s nearest following purchase, but only within 1 hour (past
    the tolerance the match is NULL). The single-nearest-match twin of
    ``streaming_stream_stream_join`` (which emits ALL purchases in the
    window) and the direction-mirror of ``asof_join_last_order``.

    Same union-and-carry rewrite, reversed: one (user, time)-DESCENDING
    window scan carries the nearest following purchase backward onto each
    view; purchases at the exact view timestamp sort ahead of the view in
    the scan so ">= ts" is inclusive, and among simultaneous purchases
    event_id DESC makes the carried row the (ts, event_id)-minimum — the
    same deterministic tie the oracle\'s ORDER BY ts, event_id LIMIT 1
    states. The tolerance is a post-carry filter. One shuffle on user_id,
    no nested loop, no per-row subquery — at 100 TB this is a single
    sort-within-partition pass."""
    e = load_table(spark, sf_dir, "events")
    b_side = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.struct(F.col("ts").alias("b_ts"), F.col("event_id").alias("buy_id")).alias(
            "purch"
        ),
        F.col("event_id"),
        F.lit(0).alias("is_view"),
    )
    v_side = e.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(None)
        .cast("struct<b_ts:timestamp,buy_id:bigint>")
        .alias("purch"),
        F.col("event_id"),
        F.lit(1).alias("is_view"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), "is_view", F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        b_side.unionByName(v_side)
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            "ts",
            "is_view",
            F.last("purch", ignorenulls=True).over(w).alias("nxt"),
        )
        .where(F.col("is_view") == 1)
    )
    within = F.col("nxt.b_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")
    return carried.select(
        "view_id",
        "user_id",
        "ts",
        F.when(within, F.col("nxt.buy_id")).alias("next_purchase_id"),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event-type sequences
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
),
trans AS (
    SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
           / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT)
           AS prob
FROM trans
"""


@query("events_markov_transitions", oracle=_MARKOV_ORACLE)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: P(next event
    type | current event type), estimated over every consecutive pair in
    each user's time-ordered event sequence — the user-behavior model
    behind next-action prediction and funnel-drop diagnosis.

    One user_id window pass builds the pairs (lag — no self-join of the
    event log), one hash agg counts them; the row-probability denominator
    is a window over the TINY transition matrix (|types|² rows), not the
    events. Exact: integer counts, one int÷int division."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    wp = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wp)
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# OHLC bars: open/high/low/close aggregation per (user, hour)
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
WITH cents AS (
    SELECT user_id, date_trunc('hour', ts) AS bar_hour, ts, event_id,
           CAST(round(value * 100) AS BIGINT) AS v
    FROM events
),
r AS (
    SELECT *,
           row_number() OVER (PARTITION BY user_id, bar_hour
                              ORDER BY ts, event_id) AS rn_open,
           row_number() OVER (PARTITION BY user_id, bar_hour
                              ORDER BY ts DESC, event_id DESC) AS rn_close
    FROM cents
)
SELECT user_id, bar_hour,
       CAST(CAST(SUM(CASE WHEN rn_open  = 1 THEN v END) AS BIGINT) AS DOUBLE) / 100 AS open,
       CAST(max(v) AS DOUBLE) / 100 AS high,
       CAST(min(v) AS DOUBLE) / 100 AS low,
       CAST(CAST(SUM(CASE WHEN rn_close = 1 THEN v END) AS BIGINT) AS DOUBLE) / 100 AS close,
       count(*) AS n_events
FROM r
GROUP BY user_id, bar_hour
"""


@query("events_ohlc_bars", oracle=_OHLC_ORACLE)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle bars — the classic financial downsample — per (user,
    hour): first/last value by event time (deterministic (ts, event_id)
    tie), plus min/max and the bar's event count.

    Open/close come from two row_number windows over the SAME (user, hour)
    partitioning the final agg uses, so the whole query is one shuffle; no
    per-group arrays, no self-joins. Integer cents end-to-end."""
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("bar_hour"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    wa = Window.partitionBy("user_id", "bar_hour").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "bar_hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = cents.select(
        "user_id",
        "bar_hour",
        "v",
        F.row_number().over(wa).alias("rn_open"),
        F.row_number().over(wd).alias("rn_close"),
    )
    return r.groupBy("user_id", "bar_hour").agg(
        (
            F.sum(F.when(F.col("rn_open") == 1, F.col("v"))).cast("double") / 100
        ).alias("open"),
        (F.max("v").cast("double") / 100).alias("high"),
        (F.min("v").cast("double") / 100).alias("low"),
        (
            F.sum(F.when(F.col("rn_close") == 1, F.col("v"))).cast("double") / 100
        ).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average value (TWAP) per user-day
# ---------------------------------------------------------------------------

_TWAP_ORACLE = """
WITH cents AS (
    SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id,
           CAST(round(value * 100) AS BIGINT) AS v
    FROM events
),
spans AS (
    SELECT user_id, d, v,
           epoch_ms(lead(ts) OVER (PARTITION BY user_id, d ORDER BY ts, event_id))
               - epoch_ms(ts) AS dt_ms
    FROM cents
)
SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
       count(*) AS n_spans,
       CAST(CAST(SUM(v * dt_ms) AS BIGINT) AS DOUBLE)
           / CAST(SUM(dt_ms) AS BIGINT) / 100 AS twap
FROM spans
WHERE dt_ms IS NOT NULL AND dt_ms > 0
GROUP BY user_id, d
"""


@query("events_time_weighted_avg", oracle=_TWAP_ORACLE)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation is weighted by how
    long it was the latest value (time to the next event in the same
    user-day) — the correct average for irregularly sampled series, where
    the arithmetic mean over-weights bursts.

    One (user, day) window pass computes span lengths (LEAD), one agg
    divides exact integer Σ(v·dt) by Σ(dt) — cents × milliseconds stay
    far inside int64. Zero-length spans (same-timestamp events) carry no
    weight and are dropped on both engines."""
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    w = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    spans = cents.select(
        "user_id",
        "d",
        "v",
        (F.unix_millis(F.lead("ts").over(w)) - F.unix_millis("ts")).alias("dt_ms"),
    ).where(F.col("dt_ms").isNotNull() & (F.col("dt_ms") > 0))
    return spans.groupBy(
        "user_id", F.date_format("d", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_spans"),
        (
            F.sum(F.col("v") * F.col("dt_ms")).cast("double")
            / F.sum("dt_ms")
            / 100
        ).alias("twap"),
    )


# ---------------------------------------------------------------------------
# top 3-step user journeys (sequential pattern counting)
# ---------------------------------------------------------------------------

_TOP_PATHS = 20

_PATHS_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_type AS t1,
           lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
           lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
    FROM events
)
SELECT t1, t2, t3, count(*) AS n_paths
FROM seq WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY n_paths DESC, t1, t2, t3
LIMIT {_TOP_PATHS}
"""


@query("events_top_paths", oracle=_PATHS_ORACLE)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step user journeys: every consecutive (t, t+1, t+2)
    event-type triple per user, counted corpus-wide — the sequential
    pattern behind "what do users do right before churning/buying". The
    higher-order companion of ``events_markov_transitions``.

    One user_id window pass materializes the triples with two LEADs (the
    event log is never self-joined), one hash agg counts them, and the
    top-k compiles to TakeOrderedAndProject with full deterministic
    tiebreak."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t3").isNotNull())
    return (
        seq.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "t1", "t2", "t3")
        .limit(_TOP_PATHS)
    )


# ---------------------------------------------------------------------------
# A/B test: Welch's t statistic per event type from exact partial sums
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH cents AS (
    SELECT event_type, user_id % 2 AS grp,
           CAST(round(value * 100) AS BIGINT) AS v
    FROM events
),
sums AS (
    SELECT event_type, grp, count(*) AS n,
           CAST(SUM(v) AS BIGINT) AS s1,
           CAST(SUM(v * v) AS BIGINT) AS s2
    FROM cents GROUP BY event_type, grp
),
stats AS (
    SELECT event_type, grp, n,
           CAST(s1 AS DOUBLE) / n AS mean_v,
           (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) AS var_v
    FROM sums WHERE n >= 2
)
SELECT a.event_type,
       a.n AS n_a, b.n AS n_b,
       a.mean_v / 100 AS mean_a, b.mean_v / 100 AS mean_b,
       (a.mean_v - b.mean_v) / sqrt(a.var_v / a.n + b.var_v / b.n) AS t_stat,
       ((a.var_v / a.n + b.var_v / b.n) * (a.var_v / a.n + b.var_v / b.n))
           / ((a.var_v / a.n) * (a.var_v / a.n) / (a.n - 1)
              + (b.var_v / b.n) * (b.var_v / b.n) / (b.n - 1)) AS welch_df
FROM stats a JOIN stats b USING (event_type)
WHERE a.grp = 0 AND b.grp = 1
"""


@query("ab_test_welch", oracle=_WELCH_ORACLE)
def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: Welch's unequal-variance t statistic and
    Welch–Satterthwaite degrees of freedom per event type, with users split
    into arms by id parity (the deterministic stand-in for an assignment
    table). This is the analysis a growth team runs on every experiment —
    and the classic case where pooled-variance t silently lies when arms
    differ in spread.

    Exactness: each arm reduces to integer (n, Σv, Σv²) partial sums —
    exact in any aggregation order — then one fixed IEEE sequence produces
    mean/var/t/df, so the oracle matches bit-for-bit. One shuffle
    (event_type × 2 arms), a self-join over a |types|-sized relation."""
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "event_type",
        (F.col("user_id") % 2).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    sums = cents.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    mean_v = F.col("s1").cast("double") / F.col("n")
    var_v = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / (F.col("n") - 1)
    stats = sums.where(F.col("n") >= 2).select(
        "event_type", "grp", "n", mean_v.alias("mean_v"), var_v.alias("var_v")
    )
    a = stats.where(F.col("grp") == 0).alias("a")
    b = stats.where(F.col("grp") == 1).alias("b")
    va_n = F.col("a.var_v") / F.col("a.n")
    vb_n = F.col("b.var_v") / F.col("b.n")
    t_stat = (F.col("a.mean_v") - F.col("b.mean_v")) / F.sqrt(va_n + vb_n)
    welch_df = ((va_n + vb_n) * (va_n + vb_n)) / (
        va_n * va_n / (F.col("a.n") - 1) + vb_n * vb_n / (F.col("b.n") - 1)
    )
    return a.join(b, F.col("a.event_type") == F.col("b.event_type")).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        (F.col("a.mean_v") / 100).alias("mean_a"),
        (F.col("b.mean_v") / 100).alias("mean_b"),
        t_stat.alias("t_stat"),
        welch_df.alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# conversion-latency distribution: view -> nearest purchase time deltas
# ---------------------------------------------------------------------------

_TTC_ORACLE = """
WITH conv AS (
    SELECT v.event_id,
           (SELECT epoch_ms(min(b.ts)) FROM events b
             WHERE b.event_type = 'purchase'
               AND b.user_id = v.user_id
               AND b.ts >= v.ts
               AND b.ts <= v.ts + INTERVAL 1 HOUR) - epoch_ms(v.ts) AS delta_ms
    FROM events v WHERE v.event_type = 'view'
),
ranked AS (
    SELECT delta_ms,
           row_number() OVER (ORDER BY delta_ms) AS rn,
           count(*) OVER () AS n
    FROM conv WHERE delta_ms IS NOT NULL
),
q AS (
    SELECT n,
           CAST(SUM(CASE WHEN rn = CAST(floor((n-1) * CAST(0.50 AS DOUBLE)) AS BIGINT) + 1 THEN delta_ms END) AS BIGINT) AS lo50,
           CAST(SUM(CASE WHEN rn = least(CAST(floor((n-1) * CAST(0.50 AS DOUBLE)) AS BIGINT) + 2, n) THEN delta_ms END) AS BIGINT) AS hi50,
           CAST(SUM(CASE WHEN rn = CAST(floor((n-1) * CAST(0.90 AS DOUBLE)) AS BIGINT) + 1 THEN delta_ms END) AS BIGINT) AS lo90,
           CAST(SUM(CASE WHEN rn = least(CAST(floor((n-1) * CAST(0.90 AS DOUBLE)) AS BIGINT) + 2, n) THEN delta_ms END) AS BIGINT) AS hi90,
           CAST(SUM(CASE WHEN rn = CAST(floor((n-1) * CAST(0.99 AS DOUBLE)) AS BIGINT) + 1 THEN delta_ms END) AS BIGINT) AS lo99,
           CAST(SUM(CASE WHEN rn = least(CAST(floor((n-1) * CAST(0.99 AS DOUBLE)) AS BIGINT) + 2, n) THEN delta_ms END) AS BIGINT) AS hi99,
           CAST(SUM(delta_ms) AS BIGINT) AS s1
    FROM ranked GROUP BY n
)
SELECT n AS n_conversions,
       CAST(s1 AS DOUBLE) / n / 60000 AS mean_minutes,
       (lo50 + (hi50 - lo50) * ((n-1) * CAST(0.50 AS DOUBLE) - floor((n-1) * CAST(0.50 AS DOUBLE)))) / 60000 AS p50_minutes,
       (lo90 + (hi90 - lo90) * ((n-1) * CAST(0.90 AS DOUBLE) - floor((n-1) * CAST(0.90 AS DOUBLE)))) / 60000 AS p90_minutes,
       (lo99 + (hi99 - lo99) * ((n-1) * CAST(0.99 AS DOUBLE) - floor((n-1) * CAST(0.99 AS DOUBLE)))) / 60000 AS p99_minutes
FROM q
"""


@query("events_time_to_convert", oracle=_TTC_ORACLE)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: for every view that converts (same
    user purchases within the hour), the exact view->purchase delay,
    reduced to count / exact mean / interpolated p50-p90-p99 — the latency
    SLO readout of the funnel.

    The nearest-following-purchase per view is the same reversed
    union-and-carry as ``asof_join_next_order`` (one user_id window pass,
    no event-log self-join). Percentile interpolation is spelled out with
    ONE explicit formula (dual row_number positions, lo + (hi-lo)*frac over
    integer milliseconds) instead of each engine's built-in — Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` disagree in the last ulp
    on real-valued data (found by this gate). The ranking window is global
    but runs over the CONVERSIONS relation only; an exact global order
    statistic needs a global order by definition — the distributed form at
    100 TB is the value-bucketed prefix-sum machinery of
    ``orders_pareto_abc``, documented not duplicated."""
    e = load_table(spark, sf_dir, "events")
    b_side = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("b_ts"),
        F.col("event_id"), F.lit(0).alias("is_view"),
    )
    v_side = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(None).cast("timestamp").alias("b_ts"),
        F.col("event_id"), F.lit(1).alias("is_view"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), "is_view", F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        b_side.unionByName(v_side)
        .select(
            "user_id", "ts", "is_view",
            F.last("b_ts", ignorenulls=True).over(w).alias("nxt_ts"),
        )
        .where(F.col("is_view") == 1)
    )
    delta = F.unix_millis("nxt_ts") - F.unix_millis("ts")
    conv = carried.select(delta.alias("delta_ms")).where(
        F.col("delta_ms").isNotNull() & (F.col("delta_ms") <= 3600 * 1000)
    )
    ranked = conv.select(
        "delta_ms",
        F.row_number().over(Window.orderBy("delta_ms")).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )

    def _pick(qv: float, which: str):
        pos = (F.col("n") - 1) * qv
        lo = F.floor(pos).cast("long") + 1
        hi = F.least(lo + 1, F.col("n"))
        at = lo if which == "lo" else hi
        return F.sum(F.when(F.col("rn") == at, F.col("delta_ms")))

    agg = ranked.groupBy("n").agg(
        _pick(0.50, "lo").alias("lo50"), _pick(0.50, "hi").alias("hi50"),
        _pick(0.90, "lo").alias("lo90"), _pick(0.90, "hi").alias("hi90"),
        _pick(0.99, "lo").alias("lo99"), _pick(0.99, "hi").alias("hi99"),
        F.sum("delta_ms").alias("s1"),
    )

    def _interp(qv: float, lo: str, hi: str):
        pos = (F.col("n") - 1) * qv
        frac = pos - F.floor(pos)
        return (F.col(lo) + (F.col(hi) - F.col(lo)) * frac) / 60000

    return agg.select(
        F.col("n").alias("n_conversions"),
        (F.col("s1").cast("double") / F.col("n") / 60000).alias("mean_minutes"),
        _interp(0.50, "lo50", "hi50").alias("p50_minutes"),
        _interp(0.90, "lo90", "hi90").alias("p90_minutes"),
        _interp(0.99, "lo99", "hi99").alias("p99_minutes"),
    )
