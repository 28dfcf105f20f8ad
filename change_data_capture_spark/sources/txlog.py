"""Transactional commit log over plain parquet (Delta-protocol-style).

The reference's production stack names Delta as its sink table format
("Structured Streaming + Kafka + Delta"); no delta-spark jar ships in
this environment, so this module implements the three protocol pieces
the engine actually relies on directly over parquet + a JSON commit
log — the same public design as Delta Lake's PROTOCOL.md (an ordered
log of add/remove file actions, folded into a snapshot):

- **Atomic commits.** Version ``N`` commits by ``O_CREAT|O_EXCL``
  creation of ``_txlog/<N>.json`` — the filesystem arbitrates
  concurrent writers, the loser sees ``FileExistsError`` and either
  retries on top of the new log tip (blind appends) or surfaces
  :class:`ConcurrentCommitError` (rewrites, whose read-set is stale the
  moment another commit lands). Data files are fully written *before*
  the commit and invisible until it lands, so readers never observe a
  partial write.
- **Snapshot isolation + time travel.** A snapshot is the fold of
  add/remove actions over commits ``0..N``. Rewrites are copy-on-write:
  a ``remove`` action drops a file from the *snapshot*, never from
  disk, so a resolved file list keeps reading version ``N``
  consistently while later versions commit (and ``version=`` pins any
  historical snapshot).
- **Idempotent streaming appends.** A commit may carry an
  ``(app_id, batch_id)`` txn marker; ``foreachBatch`` sinks check
  :func:`last_txn` before applying, so the at-least-once replay Spark
  gives after a failure (or a checkpoint reset) becomes a no-op — the
  Delta ``txn`` action that upgrades foreachBatch to exactly-once.

Scale: the log is metadata — KB-sized JSON per commit, folded
driver-side in O(#commits) (a production log checkpoints the fold every
K commits so the tail stays short; same as Delta's `_last_checkpoint`).
The data path stays fully distributed: a snapshot read is one parquet
scan of the resolved file list, with normal pushdown/pruning.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_SUBDIR = "_txlog"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the version this commit was based on."""


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _LOG_SUBDIR)


def latest_version(table_dir: str) -> int:
    """Highest committed version, or -1 for an empty/absent log."""
    ldir = _log_dir(table_dir)
    if not os.path.isdir(ldir):
        return -1
    versions = [
        int(f[: -len(".json")])
        for f in os.listdir(ldir)
        if f.endswith(".json")
    ]
    return max(versions, default=-1)


def _commit_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"{version:020d}.json")


def commit(
    table_dir: str,
    add: list[str],
    remove: list[str] | None = None,
    txn: dict | None = None,
    expected_version: int | None = None,
) -> int:
    """Atomically commit the next log version.

    ``add``/``remove`` are data-file paths entering/leaving the snapshot;
    ``txn`` is an optional ``{"app_id": ..., "batch_id": ...}`` marker.
    With ``expected_version`` set (rewrites: the caller's remove-set was
    computed against ``expected_version - 1``), a lost race raises
    :class:`ConcurrentCommitError` instead of silently clobbering the
    other writer's effect; blind appends (no ``expected_version``)
    retry on top of the new tip, which is always safe for add-only
    commits.
    """
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    while True:
        version = latest_version(table_dir) + 1
        if expected_version is not None and version != expected_version:
            raise ConcurrentCommitError(
                f"expected to commit version {expected_version}, log tip "
                f"is already {version - 1}"
            )
        payload = {
            "version": version,
            "add": list(add),
            "remove": list(remove or ()),
            "txn": txn,
        }
        path = _commit_path(table_dir, version)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            if expected_version is not None:
                raise ConcurrentCommitError(
                    f"lost the commit race for version {version}"
                ) from None
            continue  # append: rebase on the new tip and retry
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        return version


def _commits_upto(table_dir: str, version: int | None) -> list[dict]:
    tip = latest_version(table_dir)
    if version is None:
        version = tip
    if version > tip or version < 0:
        raise ValueError(f"version {version} not in log (tip {tip})")
    out = []
    for v in range(version + 1):
        with open(_commit_path(table_dir, v)) as f:
            out.append(json.load(f))
    return out


def snapshot_files(table_dir: str, version: int | None = None) -> list[str]:
    """Data files of the snapshot as of ``version`` (default: log tip) —
    the fold of add/remove actions over commits ``0..version``."""
    files: list[str] = []
    for c in _commits_upto(table_dir, version):
        removed = set(c["remove"])
        files = [f for f in files if f not in removed]
        files.extend(c["add"])
    return files


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: one distributed parquet scan of the resolved file
    list (time travel via ``version=``). The resolution is immune to
    commits that land after it — copy-on-write never deletes data files."""
    return spark.read.parquet(*snapshot_files(table_dir, version))


def write_files(df: DataFrame, table_dir: str) -> list[str]:
    """Write ``df`` as immutable parquet data files under ``table_dir``
    (a uniquely-named subdir, so concurrent writers never collide) and
    return their paths — NOT yet part of any snapshot until a
    :func:`commit` references them."""
    out = os.path.join(table_dir, "data", uuid.uuid4().hex)
    df.write.parquet(out)
    return sorted(
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )


def last_txn(table_dir: str, app_id: str) -> int | None:
    """Highest ``batch_id`` committed under ``app_id``, or None — the
    foreachBatch idempotence check (skip when ``batch_id <= last_txn``)."""
    best: int | None = None
    for c in _commits_upto(table_dir, None) if latest_version(table_dir) >= 0 else []:
        t = c.get("txn")
        if t and t.get("app_id") == app_id:
            b = int(t["batch_id"])
            best = b if best is None or b > best else best
    return best
