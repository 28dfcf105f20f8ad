"""Transaction-log table queries: time travel, change feed, idempotent
streaming ingest — the Delta-table behaviors of the reference's
production sink ("Structured Streaming + Kafka + Delta"), rebuilt over
:mod:`change_data_capture_spark.sources.txlog` (plain parquet + a JSON
commit log) because no delta-spark jar ships in this environment.

The table under test is the products dimension maintained from the CDC
event log (the reference's pipeline: change events -> current table,
README.md:86-125), committed in three log versions that mirror the
generator's lsn phases:

- v0: the snapshot/create events (lsn % 10 == 1) -> initial state
- v1: the update events (lsn % 10 in (2, 3)) merged copy-on-write
- v2: the delete events applied (anti-join rewrite)

Each later version is built INCREMENTALLY by reading the previous
snapshot *through the log* and merging only the delta — the affordable
update shape at 100 TB (the log-mediated sibling of
``incremental_agg_maintenance``). Copy-on-write rewrites keep every
historical file on disk, which is what makes time travel and the
change feed free to compute afterward.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from change_data_capture_spark.operators.cdc_queries import _decoded
from change_data_capture_spark.queries import query
from change_data_capture_spark.sources import txlog
from change_data_capture_spark.sources.cdc_generator import CDC_EVENTS_SQL

#: per-id latest image among non-replay events up to lsn phase ``m``
#: (1 = creates, 3 = creates+updates, 4 = + deletes)
_STATE_CTE = """
upto{m} AS (
    SELECT id, op, name, description, CAST(price AS DOUBLE) AS price,
           row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
    FROM cdc_events WHERE lsn IS NOT NULL AND lsn % 10 <= {m}
),
state{m} AS (
    SELECT id, name, description, price FROM upto{m}
    WHERE rn = 1 AND op <> 'd'
)
"""

_TIME_TRAVEL_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=3)}
SELECT id, name, description, price FROM state3
"""

_CHANGE_FEED_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=1)},
{_STATE_CTE.format(m=4)}
SELECT COALESCE(b.id, a.id) AS id,
       CASE WHEN a.id IS NULL THEN 'd'
            WHEN b.id IS NULL THEN 'c'
            ELSE 'u' END AS change_op,
       b.name  AS name_before,  a.name  AS name_after,
       b.price AS price_before, a.price AS price_after
FROM state1 b
FULL OUTER JOIN state4 a ON b.id = a.id
WHERE a.id IS NULL OR b.id IS NULL
   OR b.name IS DISTINCT FROM a.name
   OR b.description IS DISTINCT FROM a.description
   OR b.price IS DISTINCT FROM a.price
"""


def _latest_image(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("id").orderBy(F.col("lsn").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "name", "description", F.col("price").cast("double").alias("price"))
    )


def build_products_txlog(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the products dimension as a 3-version txlog table and
    return its directory. v1/v2 are computed incrementally: the previous
    snapshot is read back THROUGH the log and merged with only the delta
    events — base data files are never re-read from the source, and each
    rewrite commits with ``expected_version`` so a concurrent writer
    would surface :class:`txlog.ConcurrentCommitError`, not corruption."""
    tdir = tempfile.mkdtemp(prefix="cdc_txlog_")
    ev = _decoded(spark, sf_dir).where(F.col("lsn").isNotNull())
    phase = F.col("lsn") % 10

    # v0: creates/snapshot reads
    state0 = _latest_image(ev.where(phase == 1))
    f0 = txlog.write_files(state0, tdir)
    txlog.commit(tdir, add=f0, expected_version=0)

    # v1: merge the update delta into the v0 snapshot (copy-on-write)
    upd = _latest_image(ev.where(phase.isin(2, 3)))
    base = txlog.read_version(spark, tdir, 0).alias("b")
    u = upd.alias("u")
    state1 = base.join(u, F.col("b.id") == F.col("u.id"), "full_outer").select(
        F.coalesce(F.col("u.id"), F.col("b.id")).alias("id"),
        F.coalesce(F.col("u.name"), F.col("b.name")).alias("name"),
        F.coalesce(F.col("u.description"), F.col("b.description")).alias(
            "description"
        ),
        F.coalesce(F.col("u.price"), F.col("b.price")).alias("price"),
    )
    f1 = txlog.write_files(state1, tdir)
    txlog.commit(tdir, add=f1, remove=f0, expected_version=1)

    # v2: apply deletes (anti-join rewrite of the v1 snapshot)
    dels = ev.where(F.col("op") == "d").select("id").distinct()
    state2 = txlog.read_version(spark, tdir, 1).join(
        F.broadcast(dels), "id", "left_anti"
    )
    f2 = txlog.write_files(state2, tdir)
    txlog.commit(tdir, add=f2, remove=f1, expected_version=2)
    return tdir


@query("txlog_time_travel", oracle=_TIME_TRAVEL_ORACLE)
def txlog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the transaction log — ``VERSION AS OF 1`` of the
    products dimension: the pre-delete snapshot (creates + updates
    applied), read back AFTER version 2 has rewritten the table. Because
    rewrites are copy-on-write (``remove`` drops files from the snapshot
    fold, never from disk), the historical read is the same one-scan
    distributed parquet read as the current version — no log replay over
    data, no undo. This is the audit/debug/reproducibility read the
    reference's Delta sink provides via ``VERSION AS OF``; the oracle
    recomputes the same state relationally from the raw change events."""
    tdir = build_products_txlog(spark, sf_dir)
    return txlog.read_version(spark, tdir, 1)


@query("txlog_change_feed", oracle=_CHANGE_FEED_ORACLE)
def txlog_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between table versions (Delta's ``table_changes``):
    diff the v0 snapshot against the log tip and emit one row per
    changed key with before/after images and the change op — 'u' for
    rewritten images, 'd' for keys the v2 rewrite removed ('c' would
    mark keys born after v0; this table creates every key at v0, and the
    oracle's CASE still proves the branch). Both sides are snapshot
    reads through the log, so the diff is two scans + one full-outer
    join on the key — the consumers-of-CDC shape (cache invalidation,
    downstream sync) without re-reading the wire log."""
    tdir = build_products_txlog(spark, sf_dir)
    b = txlog.read_version(spark, tdir, 0).alias("b")
    a = txlog.read_version(spark, tdir, None).alias("a")
    joined = b.join(a, F.col("b.id") == F.col("a.id"), "full_outer")
    changed = joined.where(
        F.col("a.id").isNull()
        | F.col("b.id").isNull()
        | ~F.col("b.name").eqNullSafe(F.col("a.name"))
        | ~F.col("b.description").eqNullSafe(F.col("a.description"))
        | ~F.col("b.price").eqNullSafe(F.col("a.price"))
    )
    return changed.select(
        F.coalesce(F.col("b.id"), F.col("a.id")).alias("id"),
        F.when(F.col("a.id").isNull(), F.lit("d"))
        .when(F.col("b.id").isNull(), F.lit("c"))
        .otherwise(F.lit("u"))
        .alias("change_op"),
        F.col("b.name").alias("name_before"),
        F.col("a.name").alias("name_after"),
        F.col("b.price").alias("price_before"),
        F.col("a.price").alias("price_after"),
    )
