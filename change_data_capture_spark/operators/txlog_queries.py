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

import os
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

_TIP_STATE_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=4)}
SELECT id, name, description, price FROM state4
"""

_SKIP_LO, _SKIP_HI = 100, 299

_DATA_SKIPPING_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=4)}
SELECT id, name, description, price FROM state4
WHERE id BETWEEN {_SKIP_LO} AND {_SKIP_HI}
"""

_MERGE_LO, _MERGE_HI = 100, 299

# MERGE result = (target anti-join source keys) ∪ source — exact because
# the engine's WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *
# replaces the whole row image either way. The source is deterministic
# from the same tip state on both engines.
_MERGE_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=4)},
merge_src AS (
    SELECT id, 'upd-' || name AS name, description,
           price + CAST(100 AS DOUBLE) AS price
    FROM state4 WHERE id BETWEEN {_MERGE_LO} AND {_MERGE_HI}
    UNION ALL
    SELECT id, 'new-' || CAST(id AS VARCHAR) AS name,
           'merged insert' AS description,
           CAST(id AS DOUBLE) / 1000 AS price
    FROM range(900001, 900041) t(id)
)
SELECT id, name, description, price FROM state4
WHERE id NOT IN (SELECT id FROM merge_src)
UNION ALL
SELECT id, name, description, price FROM merge_src
"""

_ZORDER_LO, _ZORDER_HI = 930.0, 960.0

_ZORDER_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=4)}
SELECT id, name, description, price FROM state4
WHERE price BETWEEN {_ZORDER_LO} AND {_ZORDER_HI}
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


def build_products_txlog(
    spark: SparkSession,
    sf_dir: str,
    timestamps: tuple = (None, None, None),
) -> str:
    """Materialize the products dimension as a 3-version txlog table and
    return its directory. v1/v2 are computed incrementally: the previous
    snapshot is read back THROUGH the log and merged with only the delta
    events — base data files are never re-read from the source, and each
    rewrite commits with ``expected_version`` so a concurrent writer
    would surface :class:`txlog.ConcurrentCommitError`, not corruption.
    ``timestamps`` optionally stamps the three commits with IN-COMMIT
    timestamps (unix seconds) for deterministic ``TIMESTAMP AS OF``
    gates; the default ``None``s keep the commit payloads byte-identical
    to the pre-timestamp format (mtime-governed)."""
    tdir = tempfile.mkdtemp(prefix="cdc_txlog_")
    ev = _decoded(spark, sf_dir).where(F.col("lsn").isNotNull())
    phase = F.col("lsn") % 10

    # v0: creates/snapshot reads
    state0 = _latest_image(ev.where(phase == 1))
    f0 = txlog.write_files(state0, tdir)
    txlog.commit(tdir, add=f0, expected_version=0, timestamp=timestamps[0])

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
    txlog.commit(
        tdir, add=f1, remove=f0, expected_version=1, timestamp=timestamps[1]
    )

    # v2: apply deletes (anti-join rewrite of the v1 snapshot)
    dels = ev.where(F.col("op") == "d").select("id").distinct()
    state2 = txlog.read_version(spark, tdir, 1).join(
        F.broadcast(dels), "id", "left_anti"
    )
    f2 = txlog.write_files(state2, tdir)
    txlog.commit(
        tdir, add=f2, remove=f1, expected_version=2, timestamp=timestamps[2]
    )
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


#: deterministic in-commit timestamps for the TIMESTAMP AS OF gate:
#: 2024-01-01 / 2024-01-02 / 2024-01-03 00:00 UTC (unix seconds)
_TT_TS = (1704067200.0, 1704153600.0, 1704240000.0)


@query("txlog_time_travel_ts", oracle=_TIME_TRAVEL_ORACLE)
def txlog_time_travel_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-based time travel — ``TIMESTAMP AS OF '2024-01-02
    12:00'`` over the products txlog: Delta pairs every version-travel
    surface with a timestamp form, because "the table as of yesterday
    09:00" is what users actually reach for. The three commits carry
    deterministic IN-COMMIT timestamps (Delta's in-commit-timestamps
    feature — :func:`txlog.commit`'s ``timestamp=``, immune to
    file-copy/mtime drift); the read resolves a mid-day timestamp
    between v1 and v2 DOWN to v1 (:func:`txlog.version_at_timestamp`:
    the LAST version committed at or before the instant) and is then
    the identical one-scan distributed snapshot read as
    ``txlog_time_travel`` — same oracle, reached through the timestamp
    axis. Boundary semantics are pinned in ``tests/test_txlog.py``: a
    timestamp before the first commit raises (no table existed), one at
    or past the tip's resolves to the tip, ties resolve to the stamped
    version, and non-monotone raw timestamps are served through the
    running-max fold (Delta's monotonicity rule).

    Scale: resolution is an O(commits) driver-side fold of KB-sized
    JSON (one ``stat`` per mtime-governed commit) — the data path is
    untouched; at 100 TB the timestamp read plans the same pruned file
    list as the version read."""
    tdir = build_products_txlog(spark, sf_dir, timestamps=_TT_TS)
    return txlog.read_version(
        spark, tdir, timestamp="2024-01-02T12:00:00+00:00"
    )


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


@query("txlog_compaction", oracle=_TIP_STATE_ORACLE)
def txlog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction (Delta ``OPTIMIZE``) + log checkpoint over the
    3-version products txlog: bin-pack the tip snapshot's many small
    files into one commit's worth of right-sized files (a rewrite commit
    — add compacted, remove fragments, ``expected_version`` guarded like
    any rewrite), then :func:`txlog.write_checkpoint` so later readers
    fold from the materialized snapshot instead of replaying the whole
    log. Data is bit-identical before/after BY CONSTRUCTION (compaction
    moves bytes, never rows — the oracle recomputes the same state
    relationally), time travel to pre-compaction versions still works
    (copy-on-write keeps the fragments on disk; pinned in
    ``tests/test_txlog.py``), and the read path after compaction is the
    same one-scan distributed read over fewer, larger files.

    Scale: small-file proliferation is THE operational failure mode of
    streaming ingest into a lake (every micro-batch commits a few files;
    a week of 1-minute batches is ~10k files whose per-file open/seek
    overhead dominates the scan). Compaction is an O(partition) rewrite
    of data, O(1) metadata; the checkpoint keeps the driver-side fold
    O(tail) on long-lived tables."""
    tdir = build_products_txlog(spark, sf_dir)
    tip = txlog.latest_version(tdir)
    # reproduce streaming ingest's failure mode: rewrite the tip as many
    # small files (what a day of micro-batch commits leaves behind)
    small = txlog.write_files(
        txlog.read_version(spark, tdir, tip).repartition(8), tdir
    )
    txlog.commit(
        tdir,
        add=small,
        remove=txlog.snapshot_files(tdir, tip),
        expected_version=tip + 1,
    )
    tip += 1
    frag = txlog.snapshot_files(tdir, tip)
    # bin count from snapshot BYTES (Delta OPTIMIZE's maxFileSize knob) —
    # and repartition, NOT coalesce: coalesce(1) collapses the whole
    # upstream snapshot scan into one task (the repo's measured
    # anti-pattern — see streaming_queries.py's slice writer), while the
    # shuffle keeps the read wide and funnels only the write into the
    # right-sized bins. sf0.01's snapshot packs into 1 bin; a 100 TB
    # partition packs into bytes/128MB bins, each written in parallel.
    target_bytes = 128 * 1024 * 1024
    n_bins = max(1, -(-sum(os.path.getsize(f) for f in frag) // target_bytes))
    compacted = txlog.write_files(
        txlog.read_version(spark, tdir, tip).repartition(n_bins), tdir
    )
    txlog.commit(tdir, add=compacted, remove=frag, expected_version=tip + 1)
    txlog.write_checkpoint(tdir)
    return txlog.read_version(spark, tdir)


@query("txlog_data_skipping", oracle=_DATA_SKIPPING_ORACLE)
def txlog_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level data skipping (Delta per-file ``stats``): the products
    tip state is written range-clustered on ``id``
    (``repartitionByRange`` — disjoint per-file key ranges, the layout
    OPTIMIZE ZORDER maintains in production) with per-file min/max
    committed alongside each add action; a ranged read then prunes
    non-overlapping files DRIVER-SIDE from log metadata alone before
    Spark lists a single file, and applies the row-level predicate to
    the survivors (skipping is an optimization, never the filter — files
    without stats are conservatively kept). ``tests/test_txlog.py`` pins
    that the pruned resolution actually drops files and that a
    stats-less table degrades to reading everything, correctly.

    Scale: this is the metadata pruning that makes point/range lookups
    affordable on a 100 TB range-clustered table — the scan cost becomes
    O(files overlapping the predicate), not O(table), and the pruning
    itself is a driver-side fold over KB-sized JSON."""
    tdir = tempfile.mkdtemp(prefix="cdc_txskip_")
    base = build_products_txlog(spark, sf_dir)
    state = txlog.read_version(spark, base).repartitionByRange(8, "id")
    actions = txlog.write_files(state, tdir, stats_cols=["id"])
    txlog.commit(tdir, add=actions, expected_version=0)
    lo, hi = _SKIP_LO, _SKIP_HI
    return txlog.read_version(
        spark, tdir, predicate_range=("id", lo, hi)
    ).where(F.col("id").between(lo, hi))


@query("txlog_merge_upsert", oracle=_MERGE_ORACLE)
def txlog_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style ``MERGE INTO`` with file-pruned copy-on-write
    (:func:`txlog.merge_into`): the products tip state, range-clustered
    on ``id`` with per-file stats, takes an upsert whose source is a
    deterministic delta — a price/name update for keys in
    [{lo}, {hi}] plus 40 brand-new keys. Touched-file discovery prunes
    by the source's key envelope from log stats, then one semi join
    collects the files actually containing a match; the rewrite is a
    single full-outer join of touched rows ∪ source (both delta-sized),
    committed as add+remove under an ``expected_version`` guard.
    ``tests/test_txlog.py`` pins that untouched files keep their exact
    add actions (paths unchanged in the snapshot) and that a
    disjoint-key merge touches ZERO files (pure append).

    Scale: this is the upsert shape that keeps a 100 TB dimension
    maintainable — cost O(touched files + delta), never O(table); the
    oracle proves the semantics relationally (anti-join ∪ source, which
    is exactly what UPDATE SET * / INSERT * reduce to)."""
    tdir = tempfile.mkdtemp(prefix="cdc_txmerge_")
    base = build_products_txlog(spark, sf_dir)
    state = txlog.read_version(spark, base).repartitionByRange(8, "id")
    txlog.commit(
        tdir,
        add=txlog.write_files(state, tdir, stats_cols=["id"]),
        expected_version=0,
    )
    tgt = txlog.read_version(spark, tdir)
    upd = tgt.where(F.col("id").between(_MERGE_LO, _MERGE_HI)).select(
        "id",
        F.concat(F.lit("upd-"), F.col("name")).alias("name"),
        "description",
        (F.col("price") + F.lit(100.0)).alias("price"),
    )
    ins = spark.range(900001, 900041).select(
        F.col("id"),
        F.concat(F.lit("new-"), F.col("id").cast("string")).alias("name"),
        F.lit("merged insert").alias("description"),
        (F.col("id").cast("double") / F.lit(1000)).alias("price"),
    )
    txlog.merge_into(
        spark, tdir, upd.unionByName(ins), key="id", stats_cols=["id"]
    )
    return txlog.read_version(spark, tdir)


txlog_merge_upsert.__doc__ = txlog_merge_upsert.__doc__.format(
    lo=_MERGE_LO, hi=_MERGE_HI
)


@query("txlog_vacuum", oracle=_TIP_STATE_ORACLE)
def txlog_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``VACUUM`` (retention-0 form): reclaim the data files that
    copy-on-write rewrites stranded on disk — the 3-version products
    build leaves v0's and v1's files unreferenced by the tip — then
    prove the tip read is bit-identical (the oracle recomputes the tip
    state relationally; vacuum never touches a live file). The
    destructive edge is pinned in ``tests/test_txlog.py``: after
    vacuum, time travel to the reclaimed versions fails loudly at read
    time, ``dry_run`` lists without deleting, and the reclaim set is
    exactly the non-tip files.

    Scale: time travel's cost is storage — every rewrite doubles the
    touched bytes until something reclaims them. Vacuum is the
    metadata-only fold (O(files on disk), zero data read) that closes
    the loop; production retention (N hours, not 0) is a parameter of
    the same walk."""
    tdir = build_products_txlog(spark, sf_dir)
    txlog.vacuum(tdir)
    return txlog.read_version(spark, tdir)


@query("txlog_zorder_skipping", oracle=_ZORDER_ORACLE)
def txlog_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering (Delta ``OPTIMIZE ZORDER BY (id, price)``):
    interleave the bits of both columns' min-max bucket ranks into one
    Morton key, range-partition the tip state on that key, and commit
    with per-file stats on BOTH columns. Because the Morton curve keeps
    each file a small rectangle in (id, price) space, a range predicate
    on EITHER column prunes files from log metadata — unlike single-key
    clustering, where files are tight on the leading column and span
    the full range of every other (``tests/test_txlog.py`` pins exactly
    that contrast on a controlled table: z-order prunes on both axes,
    id-clustering prunes only on id). The returned query is a price
    range over the z-ordered table — the NON-leading axis, the one
    plain clustering can't serve.

    Scale: multi-dimensional skipping is how a 100 TB table answers
    range lookups on more than one column without duplicate layouts;
    the bucket ranks come from one broadcast 1-row min/max join and the
    interleave is pure codegen bit math, so the clustering write costs
    one extra range shuffle."""
    tdir = tempfile.mkdtemp(prefix="cdc_txz_")
    base = build_products_txlog(spark, sf_dir)
    state = txlog.read_version(spark, base)
    zed = _zorder_key(state, "id", "price").repartitionByRange(
        8, "__z"
    ).select(*state.columns)
    actions = txlog.write_files(zed, tdir, stats_cols=["id", "price"])
    txlog.commit(tdir, add=actions, expected_version=0)
    lo, hi = _ZORDER_LO, _ZORDER_HI
    return txlog.read_version(
        spark, tdir, predicate_range=("price", lo, hi)
    ).where(F.col("price").between(lo, hi))


def _zorder_key(df: DataFrame, c1: str, c2: str, bits: int = 8) -> DataFrame:
    """Append a ``__z`` Morton key: each column min-max-normalized to a
    ``bits``-bit bucket (one broadcast 1-row min/max join — the only
    non-local step), buckets bit-interleaved with pure codegen
    shift/or arithmetic. Constant columns degrade to bucket 0, which is
    correct (no information to cluster on)."""
    mm = df.agg(
        F.min(c1).alias("__mn1"),
        F.max(c1).alias("__mx1"),
        F.min(c2).alias("__mn2"),
        F.max(c2).alias("__mx2"),
    )
    j = df.crossJoin(F.broadcast(mm))

    def bucket(c: str, mn: str, mx: str):
        span = F.col(mx).cast("double") - F.col(mn).cast("double")
        frac = F.when(
            span > 0, (F.col(c).cast("double") - F.col(mn).cast("double")) / span
        ).otherwise(F.lit(0.0))
        return F.least(
            F.floor(frac * (1 << bits)).cast("int"), F.lit((1 << bits) - 1)
        )

    b1, b2 = bucket(c1, "__mn1", "__mx1"), bucket(c2, "__mn2", "__mx2")
    z = F.lit(0)
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return j.withColumn("__z", z).drop("__mn1", "__mx1", "__mn2", "__mx2")


_METADATA_COUNT_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=4)}
SELECT COUNT(*) AS n_rows FROM state4
"""


@query("txlog_restore", oracle=_TIME_TRAVEL_ORACLE)
def txlog_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``RESTORE TABLE ... VERSION AS OF`` (:func:`txlog.restore`):
    rewind the products table's TIP to version 1 (pre-delete) after
    version 2 has rewritten it — where ``txlog_time_travel`` READS the
    past, restore makes it the present for every future reader, and the
    read here is deliberately the plain TIP read (no ``version=``) to
    prove it. The restore itself is one metadata-only commit that
    re-adds v1's file actions and removes v2's: no data file is read,
    written, or copied — "undo the bad backfill" costs O(KB) on a
    100 TB table. History survives: the restore is a NEW version and
    the pre-restore tip stays time-travelable (both pinned in
    ``tests/test_txlog.py``). The oracle recomputes v1's state
    relationally — the same oracle as time travel, reached through the
    opposite mechanism (rewound tip vs pinned historical read)."""
    tdir = build_products_txlog(spark, sf_dir)
    txlog.restore(tdir, 1)
    return txlog.read_version(spark, tdir)


@query("txlog_metadata_count", oracle=_METADATA_COUNT_ORACLE)
def txlog_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only ``COUNT(*)`` (Delta answers unfiltered counts from
    per-file ``numRecords``): the tip state is written by a
    stats-collecting writer, so every add action carries its file's row
    count, and :func:`txlog.count_rows` answers the count by folding
    KB-sized log JSON — zero data files opened. The oracle recomputes
    the count relationally from the raw change events, so the gate
    proves the metadata path agrees with the data. The honesty edge is
    pinned in ``tests/test_txlog.py``: one stats-less file in the
    snapshot and ``count_rows`` returns None (refuses) rather than
    guessing — callers fall back to a scan.

    Scale: this is why ``SELECT COUNT(*)`` on a 100 TB lake table
    returns in milliseconds — the answer was priced at write time, once
    per file, and the read is a driver-side metadata fold."""
    tdir = tempfile.mkdtemp(prefix="cdc_txcount_")
    base = build_products_txlog(spark, sf_dir)
    state = txlog.read_version(spark, base).repartitionByRange(8, "id")
    txlog.commit(
        tdir,
        add=txlog.write_files(state, tdir, stats_cols=["id"]),
        expected_version=0,
    )
    n = txlog.count_rows(tdir)
    if n is None:  # every action came from the stats writer
        raise RuntimeError(
            "count_rows returned None for a table written entirely with "
            "stats_cols — a commit is missing its numRecords stat"
        )
    return spark.createDataFrame([(n,)], "n_rows bigint")


@query("txlog_constrained_write", oracle=_TIP_STATE_ORACLE)
def txlog_constrained_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema enforcement + CHECK constraints (the Delta write-path
    features, via the log's ``metaData`` action — the action that
    completes this module's Delta protocol set alongside add/remove/
    txn/checkpoint): the table declares its schema DDL and two CHECK
    constraints (``price >= 0``, ``id IS NOT NULL``) in a version-0
    metadata commit, and every subsequent write goes through
    :func:`txlog.validated_write` — exact schema equality (no surprise
    columns from any of a lake table's thousand writers) and ONE
    distributed aggregate per batch summing violation flags for all
    constraints together. The gate writes the products tip state, which
    satisfies both, and returns the tip read; the REFUSAL edges are
    pinned in ``tests/test_txlog.py`` (a negative price raises naming
    the constraint and the violating row count with NO files written; a
    schema drift raises unless ``evolve=True``; NULL predicate results
    pass, matching SQL CHECK semantics).

    Scale: validation costs one map-side-combined aggregate over the
    batch being written — never a table scan — and the declaration
    itself is KB-sized log metadata, folded with the same checkpointed
    read every other query uses."""
    tdir = tempfile.mkdtemp(prefix="cdc_txcheck_")
    txlog.commit(
        tdir,
        add=[],
        expected_version=0,
        metadata={
            "schema": "id BIGINT, name STRING, description STRING, price DOUBLE",
            "constraints": {
                "price_non_negative": "price >= 0",
                "id_present": "id IS NOT NULL",
            },
        },
    )
    base = build_products_txlog(spark, sf_dir)
    state = txlog.read_version(spark, base).select(
        F.col("id").cast("bigint"),
        "name",
        "description",
        F.col("price").cast("double"),
    )
    actions = txlog.validated_write(state, tdir, stats_cols=["id"])
    txlog.commit(tdir, add=actions, expected_version=1)
    return txlog.read_version(spark, tdir)


_DELETE_LO, _DELETE_HI = 100, 299

_DELETE_WHERE_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=4)}
SELECT id, name, description, price FROM state4
WHERE id NOT BETWEEN {_DELETE_LO} AND {_DELETE_HI}
"""


@query("txlog_delete_where", oracle=_DELETE_WHERE_ORACLE)
def txlog_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate ``DELETE FROM table WHERE id BETWEEN {lo} AND {hi}``
    (:func:`txlog.delete_where`) — the GDPR/backfill-repair primitive the
    Delta surface provides and round 6's MERGE skeleton was missing. The
    products tip state is committed range-clustered with per-file id
    stats; the delete then (a) prunes non-overlapping files DRIVER-SIDE
    from log metadata, (b) finds the files actually CONTAINING a
    matching row with one file-bounded distinct-``input_file_name``
    scan, and (c) rewrites only those files without the matching rows,
    committing add+remove under an ``expected_version`` guard. Files
    outside the predicate envelope keep their add actions (and stats)
    byte-untouched — pinned in ``tests/test_txlog.py`` along with SQL
    NULL semantics (a NULL predicate KEEPS the row) and the no-match
    no-op (no commit at all).

    Scale: O(touched files), never O(table) — deleting one key range
    from a range-clustered 100 TB table rewrites the handful of files
    whose stats admit the range; everything else is metadata. The
    pre-images stay time-travelable until vacuum."""
    tdir = tempfile.mkdtemp(prefix="cdc_txdel_")
    base = build_products_txlog(spark, sf_dir)
    state = txlog.read_version(spark, base).repartitionByRange(8, "id")
    txlog.commit(
        tdir,
        add=txlog.write_files(state, tdir, stats_cols=["id"]),
        expected_version=0,
    )
    txlog.delete_where(
        spark,
        tdir,
        f"id BETWEEN {_DELETE_LO} AND {_DELETE_HI}",
        stats_cols=["id"],
        prune_range=("id", _DELETE_LO, _DELETE_HI),
    )
    return txlog.read_version(spark, tdir)


txlog_delete_where.__doc__ = txlog_delete_where.__doc__.format(
    lo=_DELETE_LO, hi=_DELETE_HI
)


_UPDATE_LO, _UPDATE_HI = 100, 299

_UPDATE_WHERE_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=4)}
SELECT id,
       CASE WHEN id BETWEEN {_UPDATE_LO} AND {_UPDATE_HI}
            THEN upper(name) ELSE name END AS name,
       description,
       CASE WHEN id BETWEEN {_UPDATE_LO} AND {_UPDATE_HI}
            THEN price * CAST(1.10 AS DOUBLE) ELSE price END AS price
FROM state4
"""


@query("txlog_update_where", oracle=_UPDATE_WHERE_ORACLE)
def txlog_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate ``UPDATE table SET price = price * 1.10, name =
    upper(name) WHERE id BETWEEN {lo} AND {hi}``
    (:func:`txlog.update_where`) — the repricing/repair primitive that
    completes the Delta DML surface (MERGE r6, DELETE r8, UPDATE r9).
    The products tip state is committed range-clustered with per-file
    id stats; the update then (a) prunes non-overlapping files
    DRIVER-SIDE from log metadata, (b) finds the files actually
    CONTAINING a matching row with one file-bounded
    distinct-``input_file_name`` scan, and (c) rewrites only those
    files with the SET expressions applied to matching rows — every SET
    sees the PRE-update row image (``SET a=b, b=a`` swaps), a NULL
    predicate leaves the row unchanged, a no-match update makes no
    commit — committing add+remove under an ``expected_version`` guard.
    Files outside the predicate envelope keep their add actions (and
    stats) byte-untouched; all pinned in ``tests/test_txlog.py``.

    Scale: O(touched files), never O(table) — repricing one key range
    of a range-clustered 100 TB table rewrites the handful of files
    whose stats admit the range; everything else is metadata. The
    pre-images stay time-travelable until vacuum."""
    tdir = tempfile.mkdtemp(prefix="cdc_txupd_")
    base = build_products_txlog(spark, sf_dir)
    state = txlog.read_version(spark, base).repartitionByRange(8, "id")
    txlog.commit(
        tdir,
        add=txlog.write_files(state, tdir, stats_cols=["id"]),
        expected_version=0,
    )
    txlog.update_where(
        spark,
        tdir,
        f"id BETWEEN {_UPDATE_LO} AND {_UPDATE_HI}",
        {
            "price": "price * CAST(1.10 AS DOUBLE)",
            "name": "upper(name)",
        },
        stats_cols=["id"],
        prune_range=("id", _UPDATE_LO, _UPDATE_HI),
    )
    return txlog.read_version(spark, tdir)


txlog_update_where.__doc__ = txlog_update_where.__doc__.format(
    lo=_UPDATE_LO, hi=_UPDATE_HI
)


@query("txlog_vacuum_retention", oracle=_TIME_TRAVEL_ORACLE)
def txlog_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``VACUUM`` with a RETENTION HORIZON (the production form of
    ``txlog_vacuum``'s retention-0 edge): ``retention_versions=1`` keeps
    every file live in the newest TWO snapshots, so a concurrent reader
    pinned to version 1 (yesterday's reproducibility run, an in-flight
    long scan) finishes correctly while vacuum reclaims v0's files under
    it. The gate vacuums the 3-version products table at retention 1 and
    then returns the VERSION 1 read — the retained historical snapshot,
    proven bit-identical to its relational recomputation AFTER the
    destructive pass. The horizon edges are pinned in
    ``tests/test_txlog.py``: v0's unreferenced pre-images are reclaimed,
    v1's survive, time travel past the horizon fails loudly, and
    retention-0 remains the subset case.

    Scale: same O(files on disk) metadata walk as retention-0 plus an
    O(retained actions) fold per kept version — the live set is a union
    of ``N+1`` snapshot folds, never a data read; Delta's ``RETAIN n
    HOURS`` is this walk keyed by commit timestamp instead of version
    count."""
    tdir = build_products_txlog(spark, sf_dir)
    txlog.vacuum(tdir, retention_versions=1)
    return txlog.read_version(spark, tdir, 1)


_EVOLVED_SCHEMA = (
    "id BIGINT, name STRING, description STRING, price DOUBLE, "
    "category STRING"
)

_SCHEMA_EVOLUTION_READ_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=4)}
SELECT id, name, description, price, CAST(NULL AS VARCHAR) AS category
FROM state4
UNION ALL
SELECT id, 'evo-' || CAST(id AS VARCHAR) AS name,
       'evolved append' AS description,
       CAST(id AS DOUBLE) / 1000 AS price,
       'accessories' AS category
FROM range(900001, 900041) t(id)
"""


@query("txlog_schema_evolution_read", oracle=_SCHEMA_EVOLUTION_READ_ORACLE)
def txlog_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution END-TO-END (Delta ``mergeSchema`` handshake +
    log-governed read): version 0 declares the 4-column products schema
    and commits the tip state under it; version 1 widens the table with
    a ``category`` column — the batch goes through
    :func:`txlog.validated_write(evolve=True)` (the explicit
    acknowledgment; the same write WITHOUT it raises
    :class:`txlog.SchemaMismatch`, pinned in ``tests/test_txlog.py``)
    and commits its files TOGETHER with the new schema as metadata, so
    evolution is atomic with the data that exercises it. The tip read
    then spans MIXED-SCHEMA history: files written under the old schema
    are planned with the evolved shape and null-filled ``category``
    per file — driven by the log's declared schema, NOT a
    ``mergeSchema`` footer sweep (at 100 TB that sweep opens every
    file's footer before planning; the log already knows the answer).
    Time travel to version 0 still reads with the ORIGINAL 4-column
    shape — each snapshot is self-consistent (also pinned).

    Scale: the evolution itself is one KB-sized metadata commit; no
    existing file is rewritten (old rows materialize NULLs at scan
    time), which is what makes widening a 100 TB table free."""
    tdir = tempfile.mkdtemp(prefix="cdc_txevo_")
    txlog.commit(
        tdir,
        add=[],
        expected_version=0,
        metadata={
            "schema": "id BIGINT, name STRING, description STRING, price DOUBLE"
        },
    )
    base = build_products_txlog(spark, sf_dir)
    state = txlog.read_version(spark, base).select(
        F.col("id").cast("bigint"),
        "name",
        "description",
        F.col("price").cast("double"),
    )
    txlog.commit(
        tdir,
        add=txlog.validated_write(state, tdir, stats_cols=["id"]),
        expected_version=1,
    )
    widened = spark.range(900001, 900041).select(
        F.col("id"),
        F.concat(F.lit("evo-"), F.col("id").cast("string")).alias("name"),
        F.lit("evolved append").alias("description"),
        (F.col("id").cast("double") / F.lit(1000)).alias("price"),
        F.lit("accessories").alias("category"),
    )
    txlog.commit(
        tdir,
        add=txlog.validated_write(widened, tdir, stats_cols=["id"], evolve=True),
        expected_version=2,
        metadata={"schema": _EVOLVED_SCHEMA},
    )
    return txlog.read_version(spark, tdir)


# ---------------------------------------------------------------------------
# DESCRIBE HISTORY — the log as the audit surface
# ---------------------------------------------------------------------------

_HISTORY_ORACLE = """
WITH a AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 4 = 0),
     b AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 4 = 1),
     bdel AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 8 = 1)
SELECT CAST(version AS BIGINT) AS version, operation,
       CAST(n_add AS BIGINT) AS n_add, CAST(n_remove AS BIGINT) AS n_remove,
       CAST(rows_added AS BIGINT) AS rows_added, metadata_changed
FROM (
    SELECT 0 AS version, 'WRITE' AS operation, 1 AS n_add, 0 AS n_remove,
           (SELECT n FROM a) AS rows_added, FALSE AS metadata_changed
    UNION ALL SELECT 1, 'WRITE', 1, 0, (SELECT n FROM b), FALSE
    UNION ALL SELECT 2, 'UPDATE', 1, 1, (SELECT n FROM a), FALSE
    UNION ALL SELECT 3, 'DELETE', 1, 1,
              (SELECT n FROM b) - (SELECT n FROM bdel), FALSE
    UNION ALL SELECT 4, 'SET METADATA', 0, 0, NULL, TRUE
)
"""


@query("txlog_history", oracle=_HISTORY_ORACLE)
def txlog_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DESCRIBE HISTORY`` over the commit log (:func:`txlog.history`):
    a deterministic DML script — two appends, a predicate UPDATE, a
    predicate DELETE, a metadata-only schema commit — then the audit
    rows the log records for it: the operation NAME each DML entry point
    stamped into its commit (Delta's ``commitInfo.operation``), add/
    remove file counts, rows added from the per-file ``num_rows`` the
    stats-collecting writer recorded (None when a commit adds nothing),
    and whether table metadata changed. The oracle recomputes the
    data-dependent row counts from ``orders`` and pins the rest as the
    literal audit trail the script must produce — every file count is
    deterministic because each append lands exactly one file and each
    rewrite rescans exactly one file. (GATE-SCALE pin: "one rewrite
    output file" additionally assumes the touched file reads back as ONE
    partition, which holds while an append stays under
    ``spark.sql.files.maxPartitionBytes`` — far above any driver fixture.
    Past that, the rewrite legitimately emits one file per read split and
    ``n_add`` reports the real count; the ENGINE is right and this
    oracle's literal would need re-deriving, same class of fixture-scale
    pin as the sequence-packing global form.)

    Completes the Delta read surface (time travel r6, CDF r6, restore
    r7, vacuum r8, DML r6/r8/r9): the log is the audit trail — history
    is a driver-side O(commits) fold of KB-sized JSON, zero data read,
    at any table size."""
    from change_data_capture_spark.sources.tables import load_table

    tdir = tempfile.mkdtemp(prefix="cdc_txhist_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )
    a = o.where(F.col("o_orderkey") % 4 == 0).repartition(1)
    b = o.where(F.col("o_orderkey") % 4 == 1).repartition(1)
    txlog.commit(
        tdir,
        add=txlog.write_files(a, tdir, stats_cols=["o_orderkey"]),
        expected_version=0,
        operation="WRITE",
    )
    txlog.commit(
        tdir,
        add=txlog.write_files(b, tdir, stats_cols=["o_orderkey"]),
        expected_version=1,
        operation="WRITE",
    )
    # %8==0 rows all live in file a; %8==1 rows all in file b — each DML
    # touches exactly one file, so the audit counts are deterministic
    txlog.update_where(
        spark,
        tdir,
        "o_orderkey % 8 = 0",
        {"o_totalprice": "o_totalprice * CAST(2 AS DOUBLE)"},
        stats_cols=["o_orderkey"],
    )
    txlog.delete_where(
        spark, tdir, "o_orderkey % 8 = 1", stats_cols=["o_orderkey"]
    )
    txlog.commit(
        tdir,
        add=[],
        expected_version=4,
        metadata={
            "schema": "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE"
        },
    )
    hist = txlog.history(tdir)
    return spark.createDataFrame(
        [
            (
                h["version"],
                h["operation"],
                h["n_add"],
                h["n_remove"],
                h["rows_added"],
                h["metadata_changed"],
            )
            for h in hist
        ],
        "version BIGINT, operation STRING, n_add BIGINT, n_remove BIGINT, "
        "rows_added BIGINT, metadata_changed BOOLEAN",
    )


_CDF_UPD_LO, _CDF_UPD_HI = 100, 299
_CDF_DEL_LO, _CDF_DEL_HI = 400, 499

# The feed the gate must produce: v1 = UPDATE pre/post image pairs for
# every row the SET actually changed (a no-op image — price*1.10 == price
# AND upper(name) == name — is an unchanged copy, not a change), v2 =
# DELETE pre-images. Both recomputed relationally from the raw change
# events; the literal 1.10 routes through CAST(... AS DOUBLE) so both
# engines compute the identical binary product (DuckDB literals are
# DECIMAL otherwise).
_CDF_OPS_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=4)},
upd AS (
    SELECT id, name, description, price FROM state4
    WHERE id BETWEEN {_CDF_UPD_LO} AND {_CDF_UPD_HI}
      AND (upper(name) IS DISTINCT FROM name
           OR price * CAST(1.10 AS DOUBLE) IS DISTINCT FROM price)
)
SELECT id, name, description, price,
       'update_preimage' AS _change_type,
       1 AS _commit_version, 'UPDATE' AS _operation
FROM upd
UNION ALL
SELECT id, upper(name) AS name, description,
       price * CAST(1.10 AS DOUBLE) AS price,
       'update_postimage' AS _change_type,
       1 AS _commit_version, 'UPDATE' AS _operation
FROM upd
UNION ALL
SELECT id, name, description, price,
       'delete' AS _change_type,
       2 AS _commit_version, 'DELETE' AS _operation
FROM state4
WHERE id BETWEEN {_CDF_DEL_LO} AND {_CDF_DEL_HI}
"""


@query("txlog_cdf_ops", oracle=_CDF_OPS_ORACLE)
def txlog_cdf_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed over the DML surface (Delta ``table_changes``):
    run a predicate UPDATE (price × 1.10, name uppercased on id
    {ulo}–{uhi}) then a predicate DELETE (id {dlo}–{dhi}) against the
    products table, and read back the PER-OPERATION change rows —
    ``update_preimage``/``update_postimage`` pairs for every row the
    UPDATE changed and ``delete`` pre-images for every row the DELETE
    removed, each stamped with its ``_commit_version`` and the
    ``_operation`` name the DML entry point recorded
    (:func:`txlog.table_changes`).

    Where ``txlog_change_feed`` diffs two SNAPSHOT endpoints (what is
    different between then and now), this reads the feed PER COMMIT —
    which operation produced each change, with both row images for
    updates — the shape downstream incremental consumers (SCD2
    maintenance, cache invalidation, reverse ETL) actually subscribe
    to. No wire log involved: the copy-on-write commits' remove/add
    metadata carries enough structure to rebuild the images after the
    fact, because every rewrite is file-bounded.

    Scale: O(churned files) per version — the v1 diff scans only the
    files the UPDATE rewrote, v2 only the DELETE's; at 100 TB a day of
    feed reads the day's rewritten files, never the table. Unchanged
    copies carried along in rewritten files (both DMLs rewrite whole
    touched files) are dropped by image equality inside the per-version
    join; the no-op-SET edge (new image == old image emits nothing) and
    the insert branch (an append commit feeds pure inserts) are pinned
    in ``tests/test_txlog.py``."""
    tdir = tempfile.mkdtemp(prefix="cdc_txcdf_")
    base = build_products_txlog(spark, sf_dir)
    state = txlog.read_version(spark, base).repartitionByRange(8, "id")
    txlog.commit(
        tdir,
        add=txlog.write_files(state, tdir, stats_cols=["id"]),
        expected_version=0,
        operation="WRITE",
    )
    txlog.update_where(
        spark,
        tdir,
        f"id BETWEEN {_CDF_UPD_LO} AND {_CDF_UPD_HI}",
        {
            "price": "price * CAST(1.10 AS DOUBLE)",
            "name": "upper(name)",
        },
        stats_cols=["id"],
        prune_range=("id", _CDF_UPD_LO, _CDF_UPD_HI),
    )
    txlog.delete_where(
        spark,
        tdir,
        f"id BETWEEN {_CDF_DEL_LO} AND {_CDF_DEL_HI}",
        stats_cols=["id"],
        prune_range=("id", _CDF_DEL_LO, _CDF_DEL_HI),
    )
    return txlog.table_changes(spark, tdir, 1, 2, key="id")


txlog_cdf_ops.__doc__ = txlog_cdf_ops.__doc__.format(
    ulo=_CDF_UPD_LO, uhi=_CDF_UPD_HI, dlo=_CDF_DEL_LO, dhi=_CDF_DEL_HI
)


_RENAME_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=4)}
SELECT id, name AS product_name, price FROM state4
UNION ALL
SELECT id, 'ren-' || CAST(id AS VARCHAR) AS product_name,
       CAST(id AS DOUBLE) / 1000 AS price
FROM range(900001, 900041) t(id)
"""


@query("txlog_rename_column", oracle=_RENAME_ORACLE)
def txlog_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN MAPPING (Delta's name mode — ``ALTER TABLE ... RENAME /
    DROP COLUMN`` without rewriting a byte of data): the products tip
    state commits under a declared 4-column schema, then ``name`` is
    RENAMED to ``product_name`` and ``description`` is DROPPED — both
    METADATA-ONLY commits (:func:`txlog.rename_column` /
    :func:`txlog.drop_column`; ``history`` records them with zero
    add/remove actions, pinned in ``tests/test_txlog.py``). Physical
    (on-disk) names freeze at mapping-enable time, so the PRE-rename
    files keep reading correctly: every reader plans the scan with the
    physical schema and projects to the snapshot's logical names
    through the one shared scan primitive. A post-rename append then
    goes through :func:`txlog.validated_write` under the NEW logical
    schema (the write translates logical→physical, so old and new files
    stay uniform on disk), and the tip read returns
    ``(id, product_name, price)`` spanning both vintages — the oracle
    recomputes it relationally with the rename applied in SQL. Time
    travel to pre-rename versions reads under THAT version's own names,
    DML/CDF/data-skipping all operate on logical names across the
    rename, and a dropped column's physical name is TOMBSTONED so a
    re-add can never silently resurrect its bytes (all pinned).

    Why this matters at 100 TB: without mapping, renaming a column
    means rewriting every file (or refusing forever) — the
    second-most-hit ALTER TABLE after ADD COLUMN becomes an O(KB)
    metadata commit instead of an O(table) rewrite.

    Cite: Delta Lake PROTOCOL.md "Column Mapping" (public docs: "Rename
    and drop columns with Delta Lake column mapping"); the reference's
    production sink names Delta as its table format
    (repo:BASELINE.json)."""
    tdir = tempfile.mkdtemp(prefix="cdc_txmap_")
    txlog.commit(
        tdir,
        add=[],
        expected_version=0,
        metadata={
            "schema": "id BIGINT, name STRING, description STRING, price DOUBLE"
        },
    )
    base = build_products_txlog(spark, sf_dir)
    state = txlog.read_version(spark, base).select(
        F.col("id").cast("bigint"),
        "name",
        "description",
        F.col("price").cast("double"),
    )
    txlog.commit(
        tdir,
        add=txlog.validated_write(state, tdir, stats_cols=["id"]),
        expected_version=1,
    )
    txlog.rename_column(tdir, "name", "product_name")
    txlog.drop_column(tdir, "description")
    extra = spark.range(900001, 900041).select(
        F.col("id"),
        F.concat(F.lit("ren-"), F.col("id").cast("string")).alias(
            "product_name"
        ),
        (F.col("id").cast("double") / F.lit(1000)).alias("price"),
    )
    txlog.commit(
        tdir,
        add=txlog.validated_write(extra, tdir, stats_cols=["id"]),
        expected_version=4,
    )
    return txlog.read_version(spark, tdir)


_DV_BULK_LO, _DV_BULK_HI = 100, 299

_DELETE_DV_ORACLE = f"""
WITH {CDC_EVENTS_SQL},
{_STATE_CTE.format(m=4)}
SELECT id, name, description, price FROM state4
WHERE NOT (id % 40 = 7) AND id NOT BETWEEN {_DV_BULK_LO} AND {_DV_BULK_HI}
"""


@query("txlog_delete_dv", oracle=_DELETE_DV_ORACLE)
def txlog_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE via DELETION VECTORS (merge-on-read — Delta's
    ``deletionVectors`` table feature) against the products table: a
    TRICKLE delete (``id % 40 = 7`` — a few rows in every file, the
    GDPR-erasure shape) runs with ``dv_fraction_threshold=0.25`` and
    lands as parquet ``(file, row position)`` sidecars attached to the
    touched files' re-committed add actions — NO data file is
    rewritten; a BULK delete (id {lo}–{hi}) then runs with the default
    threshold 0 and rewrites its touched files copy-on-write. The tip
    read nets both transports through the same scan: files with vectors
    drop their dead rows via one broadcast anti-join on
    ``(_metadata.file_path, _metadata.row_index)``
    (:func:`txlog._scan_files_with_dvs`); rewritten and untouched files
    scan plain. The gate verifies a vector actually landed (RuntimeError
    otherwise) and returns the tip state; the oracle recomputes it
    relationally from the raw change events.

    Why this matters at 100 TB: copy-on-write makes a 3-row DELETE cost
    O(touched files) of DATA rewrite — with daily trickle deletes over a
    range-clustered lake table, GB of churn per commit for KB of intent.
    A deletion vector is O(deleted rows) of sidecar: the 3-row DELETE
    commits KB, readers pay one tiny broadcast anti-join, and
    compaction/OPTIMIZE later reconciles vectors into plain files (any
    rewrite through :func:`txlog.read_version` materializes the net
    rows — pinned in ``tests/test_txlog.py`` along with transport
    parity: threshold 0 / 1 / mixed produce bit-identical states,
    time-travel/CDF/restore/vacuum interactions included).

    Reference parity: the reference deletes flow through Debezium 'd'
    events into its sink (``/root/reference/README.md:86-125``); this is
    the table-format half — how a lake table absorbs those deletes
    without rewriting itself."""
    tdir = tempfile.mkdtemp(prefix="cdc_txdv_")
    base = build_products_txlog(spark, sf_dir)
    state = txlog.read_version(spark, base).repartitionByRange(8, "id")
    txlog.commit(
        tdir,
        add=txlog.write_files(state, tdir, stats_cols=["id"]),
        expected_version=0,
        operation="WRITE",
    )
    txlog.delete_where(
        spark,
        tdir,
        "id % 40 = 7",
        stats_cols=["id"],
        dv_fraction_threshold=0.25,
    )
    acts, _, _, _ = txlog._resolve(tdir, None)
    if not txlog._dv_map(acts):
        raise RuntimeError(
            "trickle delete did not produce a deletion vector — the "
            "merge-on-read path was not exercised"
        )
    txlog.delete_where(
        spark,
        tdir,
        f"id BETWEEN {_DV_BULK_LO} AND {_DV_BULK_HI}",
        stats_cols=["id"],
        prune_range=("id", _DV_BULK_LO, _DV_BULK_HI),
    )
    return txlog.read_version(spark, tdir)


txlog_delete_dv.__doc__ = txlog_delete_dv.__doc__.format(
    lo=_DV_BULK_LO, hi=_DV_BULK_HI
)
