"""Batch MERGE INTO / upsert (SCD1 maintenance) — the write-side complement
of the SCD2 flagship (reference: the DuckDB SCD2 query at
``/root/reference/example/duckdb_minio_product_scd2.sql`` reconstructs history;
a real warehouse ALSO needs the in-place 'current state' merge).

Spark has no engine-level MERGE over raw parquet (that's a table-format
feature — Delta/Iceberg), so the engine exposes merge as what it physically
is on any engine: ONE full-outer shuffle join between target and source on
the merge key, then a projection deciding per row: matched+update / matched+
delete / not-matched+insert / not-matched-source-only-drop. At 100 TB both
sides shuffle-partition on the key (or co-locate for free if both are
bucketed by the key via ``maintenance.write_bucketed``); there is no
broadcast assumption — source can be as large as target.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.tables import load_table


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str,
    *,
    matched_update: Mapping[str, Column],
    matched_delete: Column | None = None,
    not_matched_insert: Mapping[str, Column] | None = None,
    not_matched_condition: Column | None = None,
) -> DataFrame:
    """ANSI-MERGE semantics as a single full-outer join.

    ``matched_update`` maps target column name -> new value expression
    (evaluated over the joined row; unlisted target columns carry over).
    ``matched_delete`` is a boolean over the joined row: matched rows where
    it is true are dropped. ``not_matched_insert`` maps target column name ->
    value expression for source rows with no target match (source rows with
    no insert clause are ignored, per the standard). ``not_matched_condition``
    is the optional ``WHEN NOT MATCHED AND <cond> THEN INSERT`` guard —
    source-only rows failing it are dropped, not inserted.

    Row classification uses join-produced presence markers (a ``lit(True)``
    selected from each side, null after the full-outer join exactly when that
    side is absent), NOT key null-ness — so NULL merge keys behave: a
    NULL-key target row nullsafe-matched to a NULL-key source row is
    ``matched``, not misclassified as both-only.

    Source must be unique on the key (standard MERGE cardinality rule —
    enforced upstream; duplicates would make the result nondeterministic).
    """
    t = target.withColumn("__t_present", F.lit(True)).alias("t")
    s = source.withColumn("__s_present", F.lit(True)).alias("s")
    joined = t.join(s, F.col(f"t.{on}").eqNullSafe(F.col(f"s.{on}")), "full_outer")
    t_present = F.col("t.__t_present").isNotNull()
    s_present = F.col("s.__s_present").isNotNull()
    matched = t_present & s_present
    t_only = t_present & ~s_present
    s_only = s_present & ~t_present
    insertable = s_only
    if not_matched_condition is not None:
        insertable = s_only & F.coalesce(not_matched_condition, F.lit(False))

    keep = t_only | matched
    if matched_delete is not None:
        keep = t_only | (matched & ~matched_delete)
    if not_matched_insert is not None:
        keep = keep | insertable

    cols = []
    for c in target.columns:
        upd = matched_update.get(c)
        tc = F.col(f"t.{c}")
        expr = F.when(matched, upd).otherwise(tc) if upd is not None else tc
        if not_matched_insert is not None:
            ins = not_matched_insert.get(c, F.lit(None))
            expr = F.when(insertable, ins).otherwise(expr)
        cols.append(expr.alias(c))
    return joined.where(keep).select(*cols)


# Deterministic staged-changes relation, built identically in the oracle:
#   update: per-customer order revenue (exact cents) -> new acctbal
#   delete: custkey % 97 == 0
#   insert: 100 synthetic customers keyed custkey+1_000_000
_MERGE_ORACLE = """
WITH src AS (
    SELECT o_custkey AS k,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) % 1000000 AS DOUBLE)
               / 100 AS new_bal,
           CASE WHEN o_custkey % 97 = 0 THEN 'd' ELSE 'u' END AS op
    FROM orders GROUP BY o_custkey
    UNION ALL
    SELECT c_custkey + 1000000, round(c_acctbal, 2),'i'
    FROM customer WHERE c_custkey < 100
),
merged AS (
    SELECT
        coalesce(t.c_custkey, s.k) AS c_custkey,
        CASE WHEN t.c_custkey IS NULL
             THEN 'Customer#new' || CAST(s.k AS VARCHAR)
             ELSE t.c_name END AS c_name,
        CASE WHEN t.c_custkey IS NULL THEN -1 ELSE t.c_nationkey END AS c_nationkey,
        CASE WHEN t.c_custkey IS NULL THEN s.new_bal
             WHEN s.k IS NOT NULL AND s.op = 'u' THEN s.new_bal
             ELSE t.c_acctbal END AS c_acctbal,
        CASE WHEN t.c_custkey IS NULL THEN 'UNKNOWN' ELSE t.c_mktsegment END
            AS c_mktsegment,
        t.c_custkey AS t_key, s.k AS s_key, s.op AS op
    FROM customer t FULL JOIN src s ON t.c_custkey = s.k
)
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM merged
WHERE NOT (t_key IS NOT NULL AND s_key IS NOT NULL AND op = 'd')
  AND NOT (t_key IS NULL AND op <> 'i')
"""


@query("merge_scd1_customer", oracle=_MERGE_ORACLE)
def merge_scd1_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO customer USING staged-changes: update balances from order
    revenue, delete every 97th key, insert 100 new customers — the standard
    SCD1 warehouse maintenance cycle, expressed as the engine's generic
    ``merge_into`` (one full-outer hash join on the key, no broadcast
    assumption).

    Revenue is accumulated in exact integer cents (``round(price*100)`` per
    row, BIGINT sum) so the staged balance is bit-identical cross-engine —
    double summation order is not reproducible, fixed-point is."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    updates = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        (
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) % 1000000)
            .cast("double")
            / 100
        ).alias("new_bal")
    ).select(
        "k",
        "new_bal",
        F.when(F.col("k") % 97 == 0, "d").otherwise("u").alias("op"),
    )
    inserts = customer.where(F.col("c_custkey") < 100).select(
        (F.col("c_custkey") + 1000000).alias("k"),
        F.round("c_acctbal", 2).alias("new_bal"),
        F.lit("i").alias("op"),
    )
    src = updates.unionByName(inserts)
    return merge_into(
        customer,
        src.withColumnRenamed("k", "c_custkey"),
        "c_custkey",
        matched_update={
            "c_acctbal": F.when(F.col("s.op") == "u", F.col("s.new_bal")).otherwise(
                F.col("t.c_acctbal")
            )
        },
        matched_delete=F.col("s.op") == "d",
        # WHEN NOT MATCHED AND op = 'i' THEN INSERT — the oracle drops
        # source-only rows with op <> 'i'; without this guard the Spark side
        # only agreed because TPC-H referential integrity makes every
        # o_custkey exist in customer.
        not_matched_condition=F.col("s.op") == "i",
        not_matched_insert={
            "c_custkey": F.col("s.c_custkey"),
            "c_name": F.concat(
                F.lit("Customer#new"), F.col("s.c_custkey").cast("string")
            ),
            "c_nationkey": F.lit(-1),
            "c_acctbal": F.col("s.new_bal"),
            "c_mktsegment": F.lit("UNKNOWN"),
        },
    )


# ---------------------------------------------------------------------------
# late-arriving dimension handling: inferred members
# ---------------------------------------------------------------------------

_INFERRED_ORACLE = """
WITH known AS (
    SELECT * FROM customer WHERE c_custkey % 20 <> 0
),
fact_keys AS (
    SELECT o_custkey AS c_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT f.c_custkey,
       coalesce(k.c_name, 'INFERRED#' || CAST(f.c_custkey AS VARCHAR)) AS c_name,
       coalesce(k.c_nationkey, -1) AS c_nationkey,
       (k.c_custkey IS NULL) AS is_inferred,
       f.n_orders
FROM fact_keys f LEFT JOIN known k USING (c_custkey)
"""


@query("late_arriving_dim_inferred", oracle=_INFERRED_ORACLE)
def late_arriving_dim_inferred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension handling (Kimball "inferred members"): facts
    referencing a dimension key that has not arrived yet get a placeholder
    dimension row (sentinel attributes, ``is_inferred`` flag) instead of
    being dropped or failing the FK contract; the real row later overwrites
    the placeholder via the same MERGE upsert (``merge_into`` above). Every
    5% of customers (custkey % 20 == 0) stands in for the not-yet-arrived
    slice — TPC-H is referentially intact, so the gap is constructed.

    One fact-side key agg + one left join against the dimension; at scale
    the unmatched-key relation is the (tiny) inferred-member delta that
    feeds the dimension MERGE."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    known = c.where(F.col("c_custkey") % 20 != 0).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    fact_keys = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return fact_keys.join(known, "c_custkey", "left").select(
        "c_custkey",
        F.coalesce(
            "c_name",
            F.concat(F.lit("INFERRED#"), F.col("c_custkey").cast("string")),
        ).alias("c_name"),
        F.coalesce("c_nationkey", F.lit(-1)).alias("c_nationkey"),
        F.col("c_name").isNull().alias("is_inferred"),
        "n_orders",
    )
