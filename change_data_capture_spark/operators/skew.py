"""Skew mitigation utilities (SURVEY.md §4 — hot CDC keys).

AQE's skew-join splitting handles sort-merge joins automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py). Salting is the
manual fallback for the cases AQE can't fix: broadcast-ineligible joins
where one *build-side key* is hot, and first-stage aggregations over
pathological keys. Provided as composable helpers; the test constructs a
hot-key workload and proves result equality with the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed fact side to a smaller side under key skew.

    The skewed side gets a random salt in [0, n_salts); the small side is
    replicated n_salts× with an exploded salt column; the join key becomes
    (key, salt) — a hot key's rows now spread over n_salts partitions
    instead of one straggler task. Replication multiplies the small side's
    shuffle volume by n_salts, which is why the small side must be the
    *smaller* one (for genuinely tiny sides just broadcast instead).

    ``rand``-free: the salt derives from a hash of the whole row via
    ``spark_partition_id`` + monotonic id, keeping the operator
    deterministic per execution plan.

    Only inner and left joins are supported: the small side is replicated
    n_salts×, so right/full outer would emit each unmatched small-side row
    once per salt (silent duplication).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: the "
            "replicated small side would duplicate unmatched rows under "
            "right/full outer"
        )
    salted_left = skewed.withColumn(
        "_salt", (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts)
    )
    salt_values = F.array(*[F.lit(i) for i in range(n_salts)])
    salted_right = small.withColumn("_salt", F.explode(salt_values))
    out = salted_left.join(salted_right, [key, "_salt"], how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage sum under aggregation skew: partial sums per (key, salt),
    then final per key. Note Spark's hash aggregate already does map-side
    partial combine — this explicit form only wins when partial aggregation
    is defeated (e.g. high-cardinality grouping expressions around the hot
    key, or distinct-like pipelines)."""
    stage1 = (
        df.withColumn("_salt", (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts))
        .groupBy(key, "_salt")
        .agg(F.sum(agg_col).alias("_partial"))
    )
    return stage1.groupBy(key).agg(F.sum("_partial").alias(f"sum_{agg_col}"))


# ---------------------------------------------------------------------------
# skew diagnostics: measure key-distribution health before choosing a plan
# ---------------------------------------------------------------------------

_SKEW_DIAG_ORACLE = """
WITH counts AS (
    SELECT l_suppkey AS k, count(*) AS c FROM lineitem GROUP BY l_suppkey
)
SELECT count(*) AS n_keys,
       CAST(SUM(c) AS BIGINT) AS total_rows,
       CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / count(*) AS avg_rows_per_key,
       max(c) AS max_rows,
       min(c) AS min_rows,
       CAST(max(c) AS DOUBLE) / (CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / count(*))
           AS skew_factor,
       (max(struct_pack(c := c, k := k))).k AS hottest_key
FROM counts
"""


def _query_registration():
    from pyspark.sql import SparkSession

    from change_data_capture_spark.queries import query
    from change_data_capture_spark.sources.tables import load_table

    @query("skew_key_diagnostics", oracle=_SKEW_DIAG_ORACLE)
    def skew_key_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Key-distribution diagnostics for join planning: per-key row
        counts reduced to the numbers that pick a strategy — average vs max
        rows per key (the skew factor AQE's splitter reasons about) and the
        hottest key itself (the salting candidate). Run this BEFORE a big
        join at a new scale; the repo's ``salted_join`` and AQE skew-join
        are the two mitigations it feeds.

        One map-side-combined count agg, then a constant-size reduction;
        the deterministic hottest-key argmax rides the same pass as a
        lexicographic ``max(struct(c, k))`` — no second shuffle, no window,
        exact in both engines at any count/key magnitude (an earlier
        ``count·10¹² + key`` integer packing overflowed int64 for keys with
        more than ~9.2M rows — exactly the hot-key regime this diagnostic
        exists for)."""
        l = load_table(spark, sf_dir, "lineitem")
        counts = l.groupBy(F.col("l_suppkey").alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        avg = F.sum("c").cast("double") / F.count(F.lit(1))
        return counts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("total_rows"),
            avg.alias("avg_rows_per_key"),
            F.max("c").alias("max_rows"),
            F.min("c").alias("min_rows"),
            (F.max("c").cast("double") / avg).alias("skew_factor"),
            F.max(F.struct("c", "k"))["k"].alias("hottest_key"),
        )

    return skew_key_diagnostics


skew_key_diagnostics = _query_registration()
