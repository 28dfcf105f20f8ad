"""Round-2 relational widening: the remaining classic TPC-H query shapes
over the driver fixtures (`region nation customer supplier part orders
lineitem`). The fixture has no ``partsupp``, ``l_commitdate``, or comment
columns, so Q11/Q16/Q20 are adapted: the distinct ``(l_partkey, l_suppkey)``
pairs of ``lineitem`` play the part-supplier relation, and textual
correlation predicates move to columns that exist. Shapes and physical
intent per query are documented on each function.

Determinism discipline (memory: spark-duckdb-oracle-determinism): every sum
routes through DECIMAL(18,2), averages are a single decimal division cast to
DOUBLE at the end, outputs never carry DECIMAL/DATE, and every column is
identically aliased on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from change_data_capture_spark.operators.relational_queries import _d, _dec
from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Q6: forecasting revenue change — pure scan + pushed filter + single agg
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical pushdown probe — all three predicates must
    reach the parquet scan (pinned in test_plans), no join, one partial+final
    agg. At 100 TB this is a pure scan-rate benchmark; row-group min/max on
    l_shipdate skips ~6/7 of the table if sorted by ship date."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        _d(F.sum(_dec("l_extendedprice") * _dec("l_discount", 8, 2))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q8: national market share — two-level conditional aggregation
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT year(o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'BRAZIL'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l_discount AS DECIMAL(8,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
       AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA'
GROUP BY 1
"""


@query("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the supplier nation's share of AMERICA-customer
    volume per year. The same ``nation`` dimension joins in two roles;
    both roles, plus region and supplier, broadcast — the only shuffles are
    the two fact joins and the final year agg. The share is ONE division of
    two exactly-aggregated decimals (conditional numerator via CASE inside
    the same grouped pass — no second join or self-union)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")

    vol = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
    )
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "BRAZIL", vol).otherwise(zero)).alias("num"),
        F.sum(vol).alias("den"),
    )
    return agg.select("o_year", (_d(F.col("num")) / _d(F.col("den"))).alias("mkt_share"))


# ---------------------------------------------------------------------------
# Q9: product type profit (adapted: retailprice-based cost, no partsupp)
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(8,2))
              - CAST(p_retailprice AS DECIMAL(18,2))
                * CAST(l_quantity AS DECIMAL(8,2))
                * CAST(0.10 AS DECIMAL(4,2))) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%green%'
GROUP BY 1, 2
"""


@query("q9_product_profit", oracle=_Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for parts
    matching a name pattern. Adapted cost model (10% of retail price ×
    quantity — the fixture has no partsupp.ps_supplycost). The selective
    part filter broadcasts, pruning lineitem EARLY (join order puts it
    first); supplier/nation broadcast; orders is the only other shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%green%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")

    profit = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(8,2)"
    ) - _dec("p_retailprice") * _dec("l_quantity", 8, 2) * F.lit(0.10).cast(
        "decimal(4,2)"
    )
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(_d(F.sum(profit)).alias("profit"))


# ---------------------------------------------------------------------------
# Q10: returned-item reporting — top 20 by revenue
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
GROUP BY 1, 2, 3, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a quarter.
    Global ORDER BY + LIMIT compiles to TakeOrderedAndProject (top-k per
    partition, k-merge on the driver — no full sort); c_custkey tiebreak
    keeps the result deterministic."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_d(F.sum(rev)).alias("revenue"))
        .select(
            "c_custkey", "c_name", "n_name", "revenue",
            _d(F.col("c_acctbal")).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11: important stock (adapted: lineitem value as the stock relation)
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH value_by_part AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(8,2))) AS val
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'GERMANY'
    GROUP BY 1
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM value_by_part
WHERE val > (SELECT SUM(val) * CAST(0.001 AS DECIMAL(6,3)) FROM value_by_part)
"""


@query("q11_important_stock", oracle=_Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp → lineitem): parts whose GERMANY-supplied
    value exceeds 0.1% of the national total. The per-part aggregate is
    computed ONCE and persisted; the global threshold is a 1-row broadcast
    cross join against it — the decimal comparison is exact on both
    engines, so even the boundary rows agree."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "GERMANY")
    val = _dec("l_extendedprice") * _dec("l_quantity", 8, 2)
    by_part = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("val"))
        .persist()  # consumed twice: threshold scalar + filtered output
    )
    threshold = by_part.agg(
        (F.sum("val") * F.lit(0.001).cast("decimal(6,3)")).alias("cut")
    )
    return (
        by_part.join(F.broadcast(threshold))
        .where(F.col("val") > F.col("cut"))
        .select("l_partkey", _d(F.col("val")).alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution — outer join + double aggregation
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY 1
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY 1
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer, keeping zero-order
    customers via the left outer join (count(o_orderkey) skips NULLs —
    the adapted exclusion predicate lives in the join condition, not a
    WHERE, exactly like the spec's comment filter). Two aggregations:
    per-customer (shuffle on custkey — shared with the join exchange) then
    the tiny histogram agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q15: top supplier — aggregate + scalar-max semi join
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue0 AS (
    SELECT l_suppkey AS supplier_no,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(8,2))) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue0)
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the quarter's max revenue. The revenue
    CTE is persisted (two consumers: max scalar + the equality filter);
    the max is a 1-row broadcast. Equality is tested on the exact DECIMAL —
    ties (possible on real data) surface every max supplier, as the spec
    requires."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    revenue0 = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).alias("total_rev"))
        .persist()
    )
    mx = revenue0.agg(F.max("total_rev").alias("mx"))
    return (
        F.broadcast(s)
        .join(revenue0, s.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name", _d(F.col("total_rev")).alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# Q16: supplier-relationship count (adapted: lineitem pairs, acctbal filter)
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_type NOT LIKE 'MEDIUM POLISHED%'
  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


@query("q16_parts_suppliers", oracle=_Q16_ORACLE)
def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can supply each qualifying part
    class. The distinct (part, supplier) pairs of lineitem stand in for
    partsupp; the NOT IN excluded-supplier list (negative balance, standing
    in for the spec's complaint filter) is a broadcast anti join — NULL-safe
    here because s_suppkey is a key (never NULL)."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").where(
        (~F.col("p_type").like("MEDIUM POLISHED%"))
        & (F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — correlated avg via window, not re-join
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
WITH with_avg AS (
    SELECT l_extendedprice, l_quantity, p_brand,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_partkey)
                AS DOUBLE)
           / CAST(COUNT(*) OVER (PARTITION BY l_partkey) AS DOUBLE) AS avg_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#23'
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
       AS avg_yearly,
       COUNT(*) AS n_small
FROM with_avg
WHERE l_quantity < 0.2 * avg_qty
"""


@query("q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost if small-quantity orders went unserved. The
    spec's correlated scalar subquery (per-part avg quantity) is computed
    with a window over the SAME partitioning the filter consumes — one
    shuffle on l_partkey instead of the naive agg + re-join (two). The
    0.2×avg comparison uses the identical decimal-sum / count division on
    both engines, so boundary rows agree bit-for-bit."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    w = Window.partitionBy("l_partkey")
    with_avg = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select(
            "l_extendedprice",
            "l_quantity",
            (
                _d(F.sum(_dec("l_quantity")).over(w))
                / _d(F.count(F.lit(1)).over(w))
            ).alias("avg_qty"),
        )
    )
    return with_avg.where(F.col("l_quantity") < 0.2 * F.col("avg_qty")).agg(
        (_d(F.sum(_dec("l_extendedprice"))) / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


# ---------------------------------------------------------------------------
# Q20: potential promotion (adapted: lineitem as stock, nested semi chain)
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
WITH shipped AS (
    SELECT l_suppkey, l_partkey,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'CANADA'
  AND s_suppkey IN (
      SELECT l_suppkey FROM shipped
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'forest%')
        AND qty > 30
  )
"""


@query("q20_potential_promotion", oracle=_Q20_ORACLE)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: CANADA suppliers who shipped >30 units of any
    'forest%' part this year — the spec's doubly-nested IN chain, expressed
    as two broadcast semi joins feeding a grouped filter. No correlated
    re-execution: the inner part list broadcasts into the shipped agg, and
    the qualifying supplier set semi-joins supplier."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("forest%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "CANADA")
    qualifying = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .where(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )
