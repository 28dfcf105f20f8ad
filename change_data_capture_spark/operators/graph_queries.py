"""Iterative graph + incremental-maintenance operators.

``pagerank_customer_supplier`` extends the iterative-algorithm family beyond
connected components (``dedup_queries._connected_components``): a fixed
5-round PageRank over the customer→supplier purchase graph, in INTEGER
micro-units so every step is order-free exact arithmetic — the DuckDB oracle
unrolls the same five rounds and matches bit-for-bit (floating-point PageRank
is not cross-engine reproducible; fixed-point is).

``incremental_agg_maintenance`` is the materialized-view maintenance pattern:
merge a delta batch's partial aggregate into a committed base aggregate
without touching base facts — the only affordable shape at 100 TB, checked
against the full-recompute oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.tables import load_table

_ITERS = 5
_UNIT = 1_000_000  # rank fixed-point scale
_BASE = 150_000  # (1 - d) * UNIT with d = 0.85
# Supplier node-id namespace offset. Must exceed any customer key at any SF:
# TPC-H custkey reaches 150k x SF, so a small offset (e.g. 100000) aliases a
# customer onto a supplier node at SF >= 0.7, silently merging two entities.
# 10^12 is collision-proof for any realistic SF and fits a BIGINT alongside
# suppkey (10k x SF).
_SUPP_OFFSET = 1_000_000_000_000


def _pagerank_round_sql(i: int) -> str:
    """One unrolled PageRank round (DuckDB): r{i} <- r{i-1}."""
    return f"""
r{i} AS (
    SELECT n.node,
           {_BASE} + (85 * COALESCE(s.contrib, 0)) // 100 AS rank
    FROM nodes n
    LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank // o.outdeg) AS contrib
        FROM edges e
        JOIN r{i - 1} r ON r.node = e.src
        JOIN outdeg o ON o.node = e.src
        GROUP BY e.dst
    ) s ON s.node = n.node
)"""


_PAGERANK_ORACLE = (
    f"""
WITH edges AS (
    SELECT DISTINCT o_custkey AS src, {_SUPP_OFFSET} + l_suppkey AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nodes AS (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
outdeg AS (
    SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src
),
r0 AS (SELECT node, {_UNIT} AS rank FROM nodes),
"""
    + ",".join(_pagerank_round_sql(i) for i in range(1, _ITERS + 1))
    + f"""
SELECT node, CAST(rank AS BIGINT) AS rank_micro
FROM r{_ITERS}
"""
)


def _purchase_graph(spark: SparkSession, sf_dir: str):
    """(nodes, outdeg, e_deg) for the customer→supplier purchase graph, with
    the per-iteration static relations persisted DISK_ONLY and materialized.

    Dedup happens BEFORE the join: (order, supplier) repeats once per line
    item — pre-aggregating cuts the join input ~4× and keeps the post-join
    distinct's hash table per-order-group small (the join-then-distinct form
    hit AGGREGATE_OUT_OF_MEMORY at the 100× scale smoke; this form passes).
    DISK_ONLY keeps fact-sized cached relations out of the unified memory
    pool so execution memory stays available for each round's join+agg."""
    from pyspark import StorageLevel

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    li_pairs = li.distinct()
    edges = (
        orders.join(li_pairs, orders.o_orderkey == li_pairs.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(_SUPP_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edges.persist(StorageLevel.DISK_ONLY)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes.persist(StorageLevel.DISK_ONLY)
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # pre-join each edge with its source outdegree once — constant per round
    e_deg = edges.join(outdeg, edges.src == outdeg.node).select("src", "dst", "outdeg")
    e_deg.persist(StorageLevel.DISK_ONLY)
    e_deg.count()  # materialize once, before the rounds
    return nodes, outdeg, e_deg


@query("pagerank_customer_supplier", oracle=_PAGERANK_ORACLE)
def pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (5 rounds, d=0.85) over the bipartite
    customer→supplier purchase graph (edge = customer bought from supplier;
    supplier ids offset by ``_SUPP_OFFSET`` = 10^12 into a disjoint shared
    node space — collision-proof for any SF, since custkey is 150k x SF).

    Determinism: ranks live in integer micro-units; each round is
    ``base + (85 * Σ floor(rank/outdeg)) // 100`` — integer sums are
    associative-commutative-exact, so any partitioning and both engines
    produce identical bits (the oracle unrolls the same 5 rounds as CTEs).
    The simplified variant drops dangling-node redistribution (suppliers
    have no outlinks), same on both sides.

    Scale shape: the iteration state is (node, rank) longs; each round is
    one edge-keyed shuffle join + one dst aggregate — the standard
    message-passing shape. Fixed round count (not convergence-probed) keeps
    the plan finite; ``localCheckpoint`` truncates lineage each round so
    round N's plan doesn't re-derive rounds 1..N-1."""
    nodes, outdeg, e_deg = _purchase_graph(spark, sf_dir)
    ranks = nodes.select("node", F.lit(_UNIT).cast("long").alias("rank"))
    for _ in range(_ITERS):
        contrib = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).cast("long").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(_BASE)
                    + (
                        (F.lit(85) * F.coalesce(F.col("contrib"), F.lit(0))) / 100
                    ).cast("long")
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        # round N-1's checkpoint blocks are released by the ContextCleaner
        # once unreferenced — (node, rank) longs, small either way
    return ranks.select("node", F.col("rank").cast("long").alias("rank_micro"))


def _pagerank_dangling_round_sql(i: int) -> str:
    """One unrolled round WITH dangling-mass redistribution: the rank mass
    sitting on out-link-free nodes (suppliers) is split evenly across all
    nodes before damping — integer floor division on both engines."""
    return f"""
r{i} AS (
    SELECT n.node,
           {_BASE} + (85 * (COALESCE(s.contrib, 0) + dg.per_node)) // 100 AS rank
    FROM nodes n
    CROSS JOIN (
        SELECT COALESCE(SUM(r.rank), 0) // (SELECT count(*) FROM nodes)
            AS per_node
        FROM r{i - 1} r
        WHERE r.node NOT IN (SELECT node FROM outdeg)
    ) dg
    LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank // o.outdeg) AS contrib
        FROM edges e
        JOIN r{i - 1} r ON r.node = e.src
        JOIN outdeg o ON o.node = e.src
        GROUP BY e.dst
    ) s ON s.node = n.node
)"""


_PAGERANK_DANGLING_ORACLE = (
    f"""
WITH edges AS (
    SELECT DISTINCT o_custkey AS src, {_SUPP_OFFSET} + l_suppkey AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nodes AS (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
outdeg AS (
    SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src
),
r0 AS (SELECT node, {_UNIT} AS rank FROM nodes),
"""
    + ",".join(_pagerank_dangling_round_sql(i) for i in range(1, _ITERS + 1))
    + f"""
SELECT node, CAST(rank AS BIGINT) AS rank_micro
FROM r{_ITERS}
"""
)


@query("pagerank_dangling", oracle=_PAGERANK_DANGLING_ORACLE)
def pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STANDARD-formulation PageRank: like ``pagerank_customer_supplier``
    but with dangling-node mass redistribution — each round, the rank mass
    held by out-link-free nodes (every supplier, in this bipartite graph)
    is divided evenly across all nodes and added to the link contribution
    before damping. This is the formulation users expect (the simplified
    variant leaks dangling mass, biasing totals low).

    Determinism: the dangling share is ``floor(Σ dangling rank / N)`` in
    integer micro-units — floor division and integer sums are exact on both
    engines, so the 5-round unrolled oracle matches bit-for-bit.

    Scale shape: identical message-passing rounds plus, per round, one
    broadcast-sized extra term — the dangling sum is a LEFT ANTI join
    (ranks ⋉̸ outdeg) reduced to ONE row and cross-joined back (Spark
    broadcasts the 1-row side automatically). N is a constant computed once.
    No new shuffle classes; the anti join keys on the same node id as the
    round's main join."""
    nodes, outdeg, e_deg = _purchase_graph(spark, sf_dir)
    n_nodes = nodes.count()  # scalar graph dimension, computed once
    ranks = nodes.select("node", F.lit(_UNIT).cast("long").alias("rank"))
    for _ in range(_ITERS):
        dang = (
            ranks.join(outdeg.select("node"), "node", "left_anti")
            .agg(
                (F.coalesce(F.sum("rank"), F.lit(0)) / n_nodes)
                .cast("long")
                .alias("per_node")
            )
        )
        contrib = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).cast("long").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(_BASE)
                    + (
                        (
                            F.lit(85)
                            * (F.coalesce(F.col("contrib"), F.lit(0)) + F.col("per_node"))
                        )
                        / 100
                    ).cast("long")
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("rank").cast("long").alias("rank_micro"))


_INCR_AGG_ORACLE = """
SELECT date_trunc('month', o_orderdate) AS month_start,
       count(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
           AS revenue
FROM orders
GROUP BY 1
"""


@query("incremental_agg_maintenance", oracle=_INCR_AGG_ORACLE)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: a committed monthly-revenue aggregate
    (90% of orders, the "base" snapshot) is brought current by merging the
    partial aggregate of a delta batch (the remaining 10%) — COUNT and SUM
    merge by addition, never touching base facts. The oracle is the full
    recompute over all orders: the maintained view must be indistinguishable
    from it.

    This is THE affordable update shape at 100 TB (re-aggregating the world
    per batch is not); it works for any commutative-monoid aggregate
    (count/sum/min/max, HLL sketch merge — see ``count_distinct_approx``).
    Revenue accumulates in integer cents, so base+delta addition is exact
    regardless of split point or order."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    month = F.date_trunc("month", F.col("o_orderdate")).alias("month_start")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("cents"),
        )

    base = partial(orders.where(F.col("o_orderkey") % 10 != 0))
    delta = partial(orders.where(F.col("o_orderkey") % 10 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("month_start")
        .agg(F.sum("n_orders").alias("n_orders"), F.sum("cents").alias("cents"))
    )
    return merged.select(
        "month_start",
        "n_orders",
        (F.col("cents").cast("double") / 100).alias("revenue"),
    )
