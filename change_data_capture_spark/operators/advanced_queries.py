"""Remaining operator-closure coverage (SURVEY.md §2.B): cube, pivot,
statistical aggregates, ordered string aggregation, set-op ALL variants,
outer joins, range window frames, posexplode, approximate distinct counting.
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
# CUBE over (returnflag, linestatus)
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_items,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS lvl
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


@query("cube_returnflag_status", oracle=_CUBE_ORACLE)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all 2^k grouping sets in one Expand+agg pass)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            _d(F.sum(_dec("l_quantity"))).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("lvl"),
        )
        .select("l_returnflag", "l_linestatus", "sum_qty", "n_items", "lvl")
    )


# ---------------------------------------------------------------------------
# pivot: event_type columns × daily rows
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_ORACLE = f"""
SELECT date_trunc('day', ts) AS day,
       {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in _EVENT_TYPES)},
       {", ".join(f"CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = '{t}'), 0) AS DOUBLE) AS value_{t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY 1
"""


@query("pivot_daily_event_types", oracle=_PIVOT_ORACLE)
def pivot_daily_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation). The explicit value list keeps it
    a single-pass agg — Spark's ``pivot(col)`` without values would scan once
    extra to discover them (never do that at 100 TB)."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    aggs = []
    for t in _EVENT_TYPES:
        is_t = F.col("event_type") == t
        aggs.append(F.count(F.when(is_t, 1)).alias(f"n_{t}"))
    for t in _EVENT_TYPES:
        is_t = F.col("event_type") == t
        aggs.append(
            _d(F.coalesce(F.sum(F.when(is_t, _dec("value"))), F.lit(0).cast("decimal(18,2)"))).alias(f"value_{t}")
        )
    return e.groupBy(day).agg(*aggs)


# ---------------------------------------------------------------------------
# unpivot (melt) — the inverse of pivot
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH wide AS (
    SELECT c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) FILTER (WHERE c_acctbal >= 0) AS DOUBLE) AS pos_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) FILTER (WHERE c_acctbal < 0) AS DOUBLE) AS neg_bal
    FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, kind, amount
FROM wide UNPIVOT (amount FOR kind IN (pos_bal, neg_bal))
"""


@query("unpivot_segment_balances", oracle=_UNPIVOT_ORACLE)
def unpivot_segment_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide conditional aggregates back to long form —
    a zero-shuffle Expand over the aggregated (already tiny) relation."""
    c = load_table(spark, sf_dir, "customer")
    bal = _dec("c_acctbal")
    wide = c.groupBy("c_mktsegment").agg(
        _d(F.sum(F.when(F.col("c_acctbal") >= 0, bal))).alias("pos_bal"),
        _d(F.sum(F.when(F.col("c_acctbal") < 0, bal))).alias("neg_bal"),
    )
    return wide.unpivot(
        ids=["c_mktsegment"],
        values=["pos_bal", "neg_bal"],
        variableColumnName="kind",
        valueColumnName="amount",
    )


# ---------------------------------------------------------------------------
# statistical aggregates
# ---------------------------------------------------------------------------

_STATS_ORACLE = """
SELECT c_mktsegment,
       count(*) AS n,
       CAST(min(c_acctbal) AS DOUBLE) AS min_bal,
       CAST(max(c_acctbal) AS DOUBLE) AS max_bal,
       round(stddev_samp(c_acctbal), 4) AS stddev_bal,
       round(var_samp(c_acctbal), 4) AS var_bal,
       CAST(quantile_cont(c_acctbal, 0.5) AS DOUBLE) AS median_bal,
       CAST(quantile_cont(c_acctbal, 0.9) AS DOUBLE) AS p90_bal,
       count(*) FILTER (WHERE c_acctbal < 0) AS n_negative,
       bool_or(c_acctbal > 9000) AS any_rich,
       bool_and(c_acctbal > -10000) AS all_above_floor
FROM customer
GROUP BY c_mktsegment
"""


@query("stats_aggregates", oracle=_STATS_ORACLE)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family. stddev/variance accumulate in different
    partial orders across engines → rounded to 4 decimals; exact percentiles
    (interpolating selection) are order-free and compare exactly."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        _d(F.min(bal)).alias("min_bal"),
        _d(F.max(bal)).alias("max_bal"),
        F.round(F.stddev_samp(bal), 4).alias("stddev_bal"),
        F.round(F.var_samp(bal), 4).alias("var_bal"),
        F.percentile(bal, F.lit(0.5)).alias("median_bal"),
        F.percentile(bal, F.lit(0.9)).alias("p90_bal"),
        F.count(F.when(bal < 0, 1)).alias("n_negative"),
        F.bool_or(bal > 9000).alias("any_rich"),
        F.bool_and(bal > -10000).alias("all_above_floor"),
    )


# ---------------------------------------------------------------------------
# ordered string aggregation (collect_list with deterministic order)
# ---------------------------------------------------------------------------

_STRAGG_ORACLE = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation
GROUP BY n_regionkey
"""


@query("string_agg_nations", oracle=_STRAGG_ORACLE)
def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered set aggregation. Raw collect_list order is partition-dependent
    (nondeterministic at any scale) — sort the collected array, then join.
    List-typed outputs don't survive the pandas bridge, so emit the joined
    string."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


# ---------------------------------------------------------------------------
# set-op ALL variants (multiset semantics)
# ---------------------------------------------------------------------------

_SETALL_ORACLE = """
WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
     b AS (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 5000)
SELECT 'intersect_all' AS set_op, k, count(*) AS n FROM (
    SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY 2
UNION ALL
SELECT 'except_all', k, count(*) FROM (
    SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY 2
"""


@query("setops_all_variants", oracle=_SETALL_ORACLE)
def setops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — multiset semantics (duplicate
    multiplicities matter), counted per key for a stable output."""
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select(F.col("c_nationkey").alias("k"))
    b = c.where(F.col("c_acctbal") > 5000).select(F.col("c_nationkey").alias("k"))
    tag = lambda df, t: (  # noqa: E731
        df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).select(F.lit(t).alias("set_op"), "k", "n")
    )
    return tag(a.intersectAll(b), "intersect_all").unionAll(tag(a.exceptAll(b), "except_all"))


# ---------------------------------------------------------------------------
# full outer join with COALESCE'd key
# ---------------------------------------------------------------------------

_OUTER_ORACLE = """
WITH cust AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1),
     supp AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT COALESCE(cust.k, supp.k) AS nationkey,
       COALESCE(n_cust, 0) AS n_customers,
       COALESCE(n_supp, 0) AS n_suppliers
FROM cust FULL OUTER JOIN supp ON cust.k = supp.k
"""


@query("join_full_outer", oracle=_OUTER_ORACLE)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of pre-aggregated sides (aggregate-before-join keeps
    the outer join small), COALESCE'd keys and counts."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    j = cust.join(supp, cust.k == supp.k, "full_outer")
    return j.select(
        F.coalesce(cust.k, supp.k).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_customers"),
        F.coalesce("n_supp", F.lit(0)).alias("n_suppliers"),
    )


# ---------------------------------------------------------------------------
# RANGE window frame (time-based sliding aggregate)
# ---------------------------------------------------------------------------

_RANGE_FRAME_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS value_last_hour,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                      RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
           AS n_last_hour
FROM events
"""


@query("window_range_frame", oracle=_RANGE_FRAME_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on event-time millis: per event, the trailing-hour
    sum/count for that user — the batch twin of a sliding streaming window."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3_600_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        _d(F.sum(_dec("value")).over(w)).alias("value_last_hour"),
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


# ---------------------------------------------------------------------------
# posexplode / unnest WITH ORDINALITY
# ---------------------------------------------------------------------------

_POSEXPLODE_ORACLE = """
SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos, CAST(embedding[i] AS DOUBLE) AS val
FROM embeddings, UNNEST(range(1, 9)) AS t(i)
WHERE vec_id < 50
"""


@query("posexplode_embedding_dims", oracle=_POSEXPLODE_ORACLE)
def posexplode_embedding_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (UNNEST WITH ORDINALITY): first 8 dims of the first 50
    vectors as (vec_id, pos, val) rows."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    return (
        e.select("vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "v"))
        .select("vec_id", "pos", F.col("v").cast("double").alias("val"))
    )


# ---------------------------------------------------------------------------
# approximate distinct counting (HLL) — rows-only + exact companion
# ---------------------------------------------------------------------------

_EXACT_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       count(DISTINCT l_suppkey) AS exact_supps
FROM lineitem
GROUP BY l_returnflag
"""


@query("count_distinct_exact", oracle=_EXACT_DISTINCT_ORACLE)
def count_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts (expand + two-phase agg)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
    )


_PCTL_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS qty_p25,
       quantile_cont(l_quantity, 0.50) AS qty_p50,
       quantile_cont(l_quantity, 0.75) AS qty_p75,
       quantile_cont(l_quantity, 0.90) AS qty_p90,
       median(l_extendedprice) AS price_median,
       CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS qty_p50_disc
FROM lineitem
GROUP BY l_returnflag
"""


@query("percentiles_exact", oracle=_PCTL_ORACLE)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles + discrete median per return flag.

    Both engines implement continuous quantiles as the same linear
    interpolation ((1-f)·lo + f·hi over the sorted run), so the doubles are
    bit-identical — verified, no rounding needed. Exact percentile is a
    full-sort-per-group operation: the right tool at moderate group
    cardinality; at 100 TB per-key tails, switch to approx_percentile
    (t-digest, mergeable sketches — one pass, bounded memory), the same
    exact/sketch trade documented on count_distinct_approx."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("qty_p25"),
        F.expr("percentile(l_quantity, 0.50)").alias("qty_p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("qty_p75"),
        F.expr("percentile(l_quantity, 0.90)").alias("qty_p90"),
        F.expr("median(l_extendedprice)").alias("price_median"),
        F.expr("percentile_approx(l_quantity, 0.5, 2147483647)")
        .cast("double")
        .alias("qty_p50_disc"),
    )


_SALTED_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1
"""


@query("salted_join_supplier_revenue", oracle=_SALTED_ORACLE)
def salted_join_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join as a first-class query: the fact side is salted
    (deterministic row-hash % 8) and the dimension replicated 8×, so a hot
    supplier key spreads over 8 tasks instead of one straggler. The result
    is exactly the plain join's aggregate (oracle is the unsalted SQL) —
    salting is an execution strategy, not a semantic change. On real skew,
    AQE's skew-join split handles *sort-merge* joins; explicit salting is
    the tool when the hot key is known and the join must stay hash-based."""
    from change_data_capture_spark.operators.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("s_suppkey").alias("l_suppkey"), "n_name")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,2)")
    return (
        salted_join(l, dim, "l_suppkey", n_salts=8)
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_APPROX_CD_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       TRUE AS approx_within_tol
FROM lineitem
GROUP BY l_returnflag
"""


@query("count_distinct_approx", oracle=_APPROX_CD_ORACLE)
def count_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path where exact
    distinct is a full shuffle of the key universe. The raw sketch estimate
    is engine-specific, so the oracle contract checks the *property* instead:
    the exact count (hash-matched) plus a boolean asserting the HLL estimate
    landed within 3×rsd of it. HLL register-max merging is commutative, so
    the estimate — and hence the boolean — is deterministic under any
    partitioning. The pytest property additionally bounds the error at
    multiple scale factors."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    ).select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.06 * F.col("exact_parts")
        ).alias("approx_within_tol"),
    )

# ---------------------------------------------------------------------------
# window distribution functions (percent_rank / cume_dist / nth_value)
# ---------------------------------------------------------------------------

_WDIST_ORACLE = """
SELECT o_orderkey, o_custkey,
       percent_rank() OVER w AS pr,
       cume_dist()    OVER w AS cd,
       nth_value(o_orderkey, 2) OVER (
           PARTITION BY o_custkey ORDER BY o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
"""


@query("window_distribution_funcs", oracle=_WDIST_ORACLE)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-style window functions: percent_rank and cume_dist over
    the per-customer order sequence, plus nth_value over the full-partition
    frame. The ordering key (o_orderkey) is unique per partition, so the
    DOUBLE ratios are the same exact divisions on both engines. One shuffle
    on o_custkey serves all three functions (same window spec)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_orderkey"),
    )


# ---------------------------------------------------------------------------
# explicit GROUPING SETS (beyond rollup/cube) + correlated LATERAL join
# ---------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT c_nationkey, c_mktsegment,
       CAST(GROUPING(c_nationkey) AS INT) AS g_nation,
       CAST(GROUPING(c_mktsegment) AS INT) AS g_segment,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY GROUPING SETS ((c_nationkey), (c_mktsegment), ())
"""


@query("grouping_sets_customer", oracle=_GSETS_ORACLE)
def grouping_sets_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two disjoint single-column groupings plus
    the grand total in ONE pass (Catalyst expands to a single Expand +
    hash-aggregate, not three scans), with GROUPING() flags disambiguating
    aggregation nulls from data nulls. The DataFrame API only exposes
    rollup/cube, so this is the SQL surface."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    return spark.sql(
        """
        SELECT c_nationkey, c_mktsegment,
               CAST(GROUPING(c_nationkey) AS INT) AS g_nation,
               CAST(GROUPING(c_mktsegment) AS INT) AS g_segment,
               COUNT(*) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM gs_customer
        GROUP BY GROUPING SETS ((c_nationkey), (c_mktsegment), ())
        """
    )


_LATERAL_ORACLE = """
SELECT n_name, o.o_orderkey, o.o_totalprice
FROM nation n, LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders, customer
    WHERE o_custkey = c_custkey AND c_nationkey = n.n_nationkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 3
) o
"""


@query("lateral_topn_per_nation", oracle=_LATERAL_ORACLE)
def lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-3 orders by value for each nation.
    Catalyst decorrelates the LATERAL + LIMIT into a window rank over the
    orders⋈customer join partitioned by nationkey — the same shuffle-once
    WindowGroupLimit plan a hand-written top-k uses, so the lateral form
    costs nothing extra. Tiebreak on o_orderkey keeps the LIMIT
    deterministic across engines."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT n_name, o.o_orderkey, o.o_totalprice
        FROM lat_nation n, LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM lat_orders, lat_customer
            WHERE o_custkey = c_custkey AND c_nationkey = n.n_nationkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) o
        """
    )


# ---------------------------------------------------------------------------
# correlation / regression aggregates from exact partial sums
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH s AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 10) AS corr_qty_price,
       round((n * sxy - sx * sy) / n / n, 6) AS covar_pop,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 10) AS regr_slope,
       round(sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx / n, 6) AS regr_intercept
FROM s
"""


@query("stats_corr_regr", oracle=_CORR_ORACLE)
def stats_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation, population covariance, and OLS slope/intercept
    per return flag — computed from EXACT decimal partial sums (n, Σx, Σy,
    Σx², Σy², Σxy) combined with closed-form double arithmetic, instead of
    the built-in corr()/covar_pop() whose float accumulation order differs
    per engine and partitioning. This is also the scale-correct shape: the
    five sums are one map-side-combined pass, associative and
    repartition-invariant; round() guards the final libm boundary."""
    l = load_table(spark, sf_dir, "lineitem")
    qty, price = _dec("l_quantity"), _dec("l_extendedprice")
    agg = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _d(F.sum(qty)).alias("sx"),
        _d(F.sum(price)).alias("sy"),
        _d(F.sum(qty * qty)).alias("sxx"),
        _d(F.sum(price * price)).alias("syy"),
        _d(F.sum(qty * price)).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n2 = n * sxy - sx * sy
    slope = cov_n2 / (n * sxx - sx * sx)
    return agg.select(
        "l_returnflag",
        "n",
        F.round(cov_n2 / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 10).alias("corr_qty_price"),
        F.round(cov_n2 / n / n, 6).alias("covar_pop"),
        F.round(slope, 10).alias("regr_slope"),
        F.round(sy / n - slope * sx / n, 6).alias("regr_intercept"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE: monthly calendar spine (date densification / zero-fill)
# ---------------------------------------------------------------------------

_SPINE_SQL = """
WITH RECURSIVE bounds AS (
    SELECT date_trunc('month', min(o_orderdate)) AS lo,
           date_trunc('month', max(o_orderdate)) AS hi
    FROM orders
),
-- hi rides along IN the recursion state: a recursive step that re-joins
-- `bounds` re-evaluates the min/max scan of orders on EVERY iteration
-- (~80 full fact scans — measured 70 s at the 100x smoke vs 3.8 s for
-- this form; DuckDB doesn't de-correlate it either)
months(month_start, hi) AS (
    SELECT lo, hi FROM bounds
    UNION ALL
    SELECT month_start + INTERVAL 1 MONTH, hi FROM months
    WHERE month_start < hi
),
-- pre-aggregate the fact per month BEFORE joining the spine: the join
-- input drops from |orders| rows to ~80
monthly AS (
    SELECT date_trunc('month', o_orderdate) AS month_start,
           count(o_orderkey) AS n_orders,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders GROUP BY 1
)
SELECT m.month_start,
       COALESCE(a.n_orders, 0) AS n_orders,
       CAST(COALESCE(a.rev, 0) AS DOUBLE) AS revenue
FROM (SELECT month_start FROM months) m
LEFT JOIN monthly a ON a.month_start = m.month_start
"""


@query("calendar_spine_monthly", oracle=_SPINE_SQL)
def calendar_spine_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order activity densified over a recursively generated
    calendar spine (Spark 4.1 ``WITH RECURSIVE``, identical SQL on both
    engines) — the warehouse pattern for zero-filled time series where a
    month with no orders must still appear. Bounded recursion (~80 levels
    here) stays under Spark's default 100-level limit; note Spark 4.1
    restricts recursive CTEs to UNION ALL (cyclic graph walks need the
    iterative DataFrame form — see ``_connected_components``)."""
    from change_data_capture_spark.sources.tables import register_sql_views

    register_sql_views(spark, sf_dir, names=("orders",))
    return spark.sql(_SPINE_SQL)


# ---------------------------------------------------------------------------
# Numeric histogram (fixed-width binning)
# ---------------------------------------------------------------------------

_HISTOGRAM_ORACLE = """
WITH binned AS (
    SELECT CAST(least(greatest(floor((l_extendedprice - 900.0) / 5205.0), 0), 19)
               AS INTEGER) AS bucket,
           l_extendedprice
    FROM lineitem
)
SELECT bucket,
       count(*) AS n_rows,
       CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
       CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
       CAST(900.0 + bucket * 5205.0 AS DOUBLE) AS bucket_lo
FROM binned
GROUP BY bucket
"""


@query("histogram_price_buckets", oracle=_HISTOGRAM_ORACLE)
def histogram_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 20-bucket histogram of line prices — the profiling/
    binning primitive behind every data dashboard and quantile-sketch
    sanity check. The bucket id is explicit clamped-floor arithmetic
    (``floor((x-lo)/width)``, the ``width_bucket`` definition) written
    identically on both engines — DuckDB 1.0 has no width_bucket builtin,
    and an identical expression tree is bit-reproducible where two builtin
    implementations need not be. One codegen'd projection + one agg
    exchange; map-side partial agg reduces each partition to ≤20 rows
    before the shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    b = (
        F.least(
            F.greatest(F.floor((F.col("l_extendedprice") - 900.0) / 5205.0), F.lit(0)),
            F.lit(19),
        )
        .cast("int")
    )
    return (
        l.select(b.alias("bucket"), "l_extendedprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_extendedprice").cast("double").alias("min_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
        )
        .withColumn("bucket_lo", (F.lit(900.0) + F.col("bucket") * 5205.0).cast("double"))
    )


# ---------------------------------------------------------------------------
# Month-over-month growth (time-series analytics over the agg layer)
# ---------------------------------------------------------------------------

_MOM_ORACLE = """
WITH monthly AS (
    SELECT date_trunc('month', o_orderdate) AS month_start,
           count(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM orders
    GROUP BY 1
)
SELECT month_start,
       n_orders,
       CAST(rev_cents AS DOUBLE) / 100 AS revenue,
       CAST(rev_cents - lag(rev_cents) OVER w AS BIGINT) AS rev_delta_cents,
       CAST(rev_cents AS DOUBLE) / lag(rev_cents) OVER w - 1 AS mom_growth
FROM monthly
WINDOW w AS (ORDER BY month_start)
"""


@query("orders_mom_growth", oracle=_MOM_ORACLE)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the reporting-layer time series
    every warehouse serves: monthly aggregate (exact integer cents), then
    lag-based delta and growth ratio over the months axis. The window runs
    over the AGGREGATED relation (≤ a few hundred rows at any corpus
    size), so the unpartitioned ORDER BY is free; the fact-sized work is
    one agg exchange. Growth = one exact division of exact operands —
    bit-identical cross-engine; first month yields NULLs."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents"),
    )
    w = Window.orderBy("month_start")
    prev = F.lag("rev_cents").over(w)
    return monthly.select(
        "month_start",
        "n_orders",
        (F.col("rev_cents").cast("double") / 100).alias("revenue"),
        (F.col("rev_cents") - prev).cast("long").alias("rev_delta_cents"),
        (F.col("rev_cents").cast("double") / prev - 1).alias("mom_growth"),
    )


# ---------------------------------------------------------------------------
# exact rolling median over a sliding row frame — Spark has no windowed
# percentile, so this is the composed-operator form (SURVEY.md custom-op
# rule (a)): collect_list over the frame + array_sort + interpolation
# ---------------------------------------------------------------------------

_ROLLING_MEDIAN_ORACLE = """
WITH cents AS (
    SELECT event_id, user_id, ts,
           CAST(round(value * 100) AS BIGINT) AS v
    FROM events
)
SELECT event_id, user_id, ts,
       CAST(v AS DOUBLE) / 100 AS value,
       median(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) / 100
           AS roll_median
FROM cents
"""


@query("window_rolling_median", oracle=_ROLLING_MEDIAN_ORACLE)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of each user's last 10 event values — the
    robust-statistics twin of a rolling mean (outlier-insensitive baseline
    for monitoring). Spark exposes no percentile window aggregate, so the
    operator is composed from built-ins: ``collect_list`` over the sliding
    row frame, ``array_sort``, middle-element interpolation — all JVM
    codegen, no UDF.

    Cross-engine exactness: values are reduced to integer cents first, so
    the sort is on exact ints and the even-count interpolation
    ``(a + b) / 2`` is an exact IEEE op on integers < 2^52 — bit-identical
    to DuckDB's ``quantile_cont(0.5)`` interpolation ``a + (b-a)*0.5``.
    Scale shape: one shuffle (partition by user), frame bounded at 10 rows
    so per-row work is O(frame log frame) with no O(n²) blowup; the frame
    array never leaves the JVM."""
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("v").over(w))
    n = F.size(arr)
    mid_lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    mid_hi = F.element_at(arr, F.floor(n / 2 + 1).cast("int"))
    median_cents = (mid_lo.cast("double") + mid_hi.cast("double")) / 2.0
    return cents.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("v").cast("double") / 100).alias("value"),
        (median_cents / 100).alias("roll_median"),
    )


# ---------------------------------------------------------------------------
# approximate percentile sketch (Greenwald-Khanna summaries) with the same
# property-oracle contract as the HLL query: exact value hash-matched, the
# sketch asserted in-tolerance as a boolean
# ---------------------------------------------------------------------------

_APPROX_PCT_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS exact_p50,
       TRUE AS approx_within_tol
FROM lineitem
GROUP BY l_returnflag
"""


@query("percentiles_approx_sketch", oracle=_APPROX_PCT_ORACLE)
def percentiles_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile_approx`` at working accuracy (100) — the one-pass
    mergeable-sketch path for per-key percentiles at 100 TB, where the
    exact form's sort-per-group is the bottleneck. The sketch estimate is
    engine- and merge-order-specific, so the oracle uses the HLL query's
    property contract: the exact median (hash-matched, bit-identical
    interpolation both engines) plus a boolean asserting the sketch landed
    within its guaranteed rank-error bound (ε = 1/accuracy, cashed out
    against the exact quantile values at ±ε rank — a theorem, so the
    boolean holds under ANY partition merge order)."""
    l = load_table(spark, sf_dir, "lineitem")
    eps = 0.01  # rank error = 1/accuracy
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("exact_p50"),
            F.expr(f"percentile(l_quantity, {0.5 - 2 * eps})").alias("_lo"),
            F.expr(f"percentile(l_quantity, {0.5 + 2 * eps})").alias("_hi"),
            F.expr("percentile_approx(l_quantity, 0.5, 100)")
            .cast("double")
            .alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_p50",
            (
                (F.col("_approx") >= F.col("_lo"))
                & (F.col("_approx") <= F.col("_hi"))
            ).alias("approx_within_tol"),
        )
    )
