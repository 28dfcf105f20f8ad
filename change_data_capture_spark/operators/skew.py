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
