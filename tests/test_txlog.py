"""Protocol invariants of the transaction log (sources/txlog.py):
atomic commits with conflict detection, snapshot isolation / time
travel, and that the foreachBatch txn-marker guard is load-bearing
(a replay WITHOUT it genuinely doubles rows)."""

from __future__ import annotations

import os

import pytest

from change_data_capture_spark.sources import txlog


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_commit_conflict_detection(spark, tmp_path):
    """A rewrite based on a stale read-set must surface
    ConcurrentCommitError, never silently clobber the other writer."""
    t = str(tmp_path / "t")
    f0 = txlog.write_files(_df(spark, [(1, "a")]), t)
    assert txlog.commit(t, add=f0, expected_version=0) == 0
    # two writers both computed their rewrite against version 0
    fa = txlog.write_files(_df(spark, [(1, "writer_a")]), t)
    fb = txlog.write_files(_df(spark, [(1, "writer_b")]), t)
    assert txlog.commit(t, add=fa, remove=f0, expected_version=1) == 1
    with pytest.raises(txlog.ConcurrentCommitError):
        txlog.commit(t, add=fb, remove=f0, expected_version=1)
    # the loser's data files never entered any snapshot
    assert set(txlog.snapshot_files(t)) == set(fa)


def test_blind_append_retries_past_race(spark, tmp_path):
    """Add-only commits (no expected_version) rebase on the new tip
    instead of failing — safe because they remove nothing."""
    t = str(tmp_path / "t")
    txlog.commit(t, add=txlog.write_files(_df(spark, [(1, "a")]), t))
    txlog.commit(t, add=txlog.write_files(_df(spark, [(2, "b")]), t))
    v = txlog.commit(t, add=txlog.write_files(_df(spark, [(3, "c")]), t))
    assert v == 2
    assert txlog.read_version(spark, t).count() == 3


def test_snapshot_isolation_and_time_travel(spark, tmp_path):
    """A resolved file list keeps reading its version while later
    rewrites commit (copy-on-write never deletes data files), and
    version= pins any historical snapshot."""
    t = str(tmp_path / "t")
    f0 = txlog.write_files(_df(spark, [(1, "v0")]), t)
    txlog.commit(t, add=f0, expected_version=0)
    resolved_before_rewrite = txlog.snapshot_files(t)

    f1 = txlog.write_files(_df(spark, [(1, "v1")]), t)
    txlog.commit(t, add=f1, remove=f0, expected_version=1)

    # the old reader's resolution is immune to the rewrite
    old = spark.read.parquet(*resolved_before_rewrite).collect()
    assert [r.v for r in old] == ["v0"]
    for f in f0:
        assert os.path.exists(f)  # copy-on-write: file left on disk
    # time travel re-resolves the same snapshot from the log
    assert [r.v for r in txlog.read_version(spark, t, 0).collect()] == ["v0"]
    assert [r.v for r in txlog.read_version(spark, t, 1).collect()] == ["v1"]
    with pytest.raises(ValueError):
        txlog.snapshot_files(t, 2)


def test_txn_marker_guard_is_load_bearing(spark, tmp_path):
    """Replaying a batch WITHOUT the last_txn guard doubles its rows;
    with the guard the replay is a no-op. This is the exact failure mode
    (at-least-once foreachBatch redelivery) the marker exists for."""
    t_unguarded = str(tmp_path / "unguarded")
    t_guarded = str(tmp_path / "guarded")
    app = "ingest"
    batch = _df(spark, [(1, "x"), (2, "y")])

    def apply(table, batch_df, batch_id, guard):
        if guard:
            last = txlog.last_txn(table, app)
            if last is not None and batch_id <= last:
                return
        files = txlog.write_files(batch_df, table)
        txlog.commit(table, add=files, txn={"app_id": app, "batch_id": batch_id})

    for table, guard in ((t_unguarded, False), (t_guarded, True)):
        apply(table, batch, 0, guard)
        apply(table, batch, 0, guard)  # redelivery
    assert txlog.read_version(spark, t_unguarded).count() == 4  # doubled
    assert txlog.read_version(spark, t_guarded).count() == 2  # exactly once
    assert txlog.last_txn(t_guarded, app) == 0
    assert txlog.last_txn(t_guarded, "other_app") is None


def test_products_txlog_versions_are_distinct_states(spark, sf_dir):
    """The 3-version products table: v0 (creates) < v1 (updates applied)
    have equal key sets, v2 (deletes applied) is a strict subset, and
    the tip read equals the v2 read."""
    from change_data_capture_spark.operators.txlog_queries import (
        build_products_txlog,
    )

    t = build_products_txlog(spark, sf_dir)
    v0 = txlog.read_version(spark, t, 0)
    v1 = txlog.read_version(spark, t, 1)
    v2 = txlog.read_version(spark, t, 2)
    assert v0.count() == v1.count()  # updates rewrite, never add/remove keys
    assert v1.join(v0, "id", "left_anti").count() == 0
    n_deleted = v1.count() - v2.count()
    assert n_deleted > 0  # the generator emits deletes (pk % 16)
    # v1 differs from v0 exactly on the updated images
    changed = (
        v1.alias("a")
        .join(v0.alias("b"), "id")
        .where("a.name <> b.name OR a.price <> b.price")
    )
    assert changed.count() > 0
    tip = txlog.read_version(spark, t)
    assert tip.exceptAll(v2).count() == 0 and v2.exceptAll(tip).count() == 0
