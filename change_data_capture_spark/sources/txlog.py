"""Transactional commit log over plain parquet (Delta-protocol-style).

The reference's production stack names Delta as its sink table format
("Structured Streaming + Kafka + Delta"); no delta-spark jar ships in
this environment, so this module implements the three protocol pieces
the engine actually relies on directly over parquet + a JSON commit
log — the same public design as Delta Lake's PROTOCOL.md (an ordered
log of add/remove file actions, folded into a snapshot):

- **Atomic commits.** Version ``N`` commits by writing the FULL
  payload to a private temp file and publishing it via
  ``os.link(tmp, _txlog/<N>.json)`` — ``link`` is both atomic and
  exclusive on POSIX, so the filesystem arbitrates concurrent writers
  (the loser sees ``FileExistsError`` and either retries on top of the
  new log tip — blind appends — or surfaces
  :class:`ConcurrentCommitError` for rewrites, whose read-set is stale
  the moment another commit lands) AND a commit file is only ever
  observable with its complete serialized content — a reader can never
  see a created-but-empty or half-written entry. Data files are fully
  written *before* the commit and invisible until it lands, so readers
  never observe a partial write.

  **Object-store caveat (production deployments).** This arbitration
  is FILESYSTEM-only: POSIX ``link``/``O_EXCL`` have no equivalent on
  eventually-listed object stores — S3 offers no atomic
  create-if-absent across writers (S3 conditional writes / If-None-
  Match narrow but do not close this on all stores), which is exactly
  why Delta Lake's public design routes object-store commits through a
  LogStore / commit-coordinator service (DynamoDB-arbitrated S3
  LogStore, or a single-writer coordination process) that serializes
  "who owns version N". A production deployment of this module on
  s3a:// MUST substitute such a coordinator for the ``os.link`` step;
  everything else (immutable data files, snapshot fold, checkpoints)
  carries over unchanged.
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
- **Log checkpoints.** :func:`write_checkpoint` materializes the fold
  at version ``N`` (Delta's ``_last_checkpoint``); later snapshot
  resolutions start from the newest checkpoint at or below the target
  version and replay only the tail, so the driver-side fold stays
  O(commits since last checkpoint) no matter how long the table lives.
- **File-level data skipping.** An ``add`` action may carry per-file
  min/max column stats (Delta's ``stats`` field, which production
  writers lift from parquet footers); :func:`snapshot_files` with a
  ``predicate_range`` prunes non-overlapping files DRIVER-SIDE, before
  Spark ever lists them — the metadata-only pruning that turns a
  100 TB scan into a few-file read when the data is range-clustered.
- **Deletion vectors (merge-on-read DML).** An ``add`` action may carry
  a ``dv`` descriptor — a parquet sidecar of ``(file, row position)``
  rows plus its cardinality (Delta's ``deletionVector`` field).
  :func:`delete_where` writes one instead of rewriting when a touched
  file's deleted fraction is small (``dv_fraction_threshold``), making
  trickle deletes O(deleted rows) of sidecar instead of O(touched
  files) of rewrite; every reader applies the vectors with one
  broadcast anti-join at scan time (:func:`_scan_files_with_dvs`), any
  rewrite (DML, compaction/OPTIMIZE) reconciles them into plain files,
  and :func:`vacuum` reclaims unreferenced sidecars like data files.

Scale: the log is metadata — KB-sized JSON per commit, folded
driver-side in O(tail since checkpoint). The data path stays fully
distributed: a snapshot read is one parquet scan of the resolved file
list, with normal pushdown/pruning below the file-level skip.
"""

from __future__ import annotations

import contextlib
import functools
import json
import logging
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
        if f.endswith(".json") and not f.endswith(".checkpoint.json")
    ]
    return max(versions, default=-1)


def _commit_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"{version:020d}.json")


def _action_path(action) -> str:
    """An ``add`` action is a bare path string or a
    ``{"path": ..., "stats": {col: [min, max]}}`` dict."""
    return action if isinstance(action, str) else action["path"]


def commit(
    table_dir: str,
    add: list,
    remove: list[str] | None = None,
    txn: dict | None = None,
    expected_version: int | None = None,
    metadata: dict | None = None,
    operation: str | None = None,
    timestamp: float | None = None,
) -> int:
    """Atomically commit the next log version.

    ``add`` entries are data files entering the snapshot — bare paths,
    or ``{"path", "stats"}`` dicts when the writer collected per-file
    min/max column stats (see :func:`write_files`); ``remove`` entries
    are paths leaving it; ``txn`` is an optional
    ``{"app_id": ..., "batch_id": ...}`` marker; ``operation`` is the
    Delta ``commitInfo.operation`` twin — the DML entry points record
    their names (``WRITE``/``UPDATE``/``DELETE``/``MERGE``) so
    :func:`history` can report WHAT each version did, not just its
    add/remove shape; ``metadata`` is an
    optional Delta-style ``metaData`` action — the table's declared
    schema (``{"schema": <DDL string>}``) and/or CHECK constraints
    (``{"constraints": {name: sql_predicate}}``); the LATEST metadata
    in the log governs (schema evolution = commit new metadata).
    With ``expected_version`` set (rewrites: the caller's remove-set was
    computed against ``expected_version - 1``), a lost race raises
    :class:`ConcurrentCommitError` instead of silently clobbering the
    other writer's effect; blind appends (no ``expected_version``)
    retry on top of the new tip, which is always safe for add-only
    commits.

    ``timestamp`` (unix seconds) is the optional IN-COMMIT timestamp —
    Delta's in-commit-timestamps table feature: when provided it is
    recorded in the payload and governs timestamp-based time travel
    (:func:`version_at_timestamp`) for this version, making
    ``TIMESTAMP AS OF`` deterministic and immune to file-copy/mtime
    drift; without it the commit FILE's modification time serves
    (Delta's classic behavior), and the payload stays byte-identical to
    the pre-timestamp format.
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
            "metadata": metadata,
            "operation": operation,
        }
        if timestamp is not None:
            payload["timestamp"] = float(timestamp)
        # Serialize BEFORE touching the log: a json TypeError here leaves
        # no trace on disk, and the published entry always carries its
        # full content (readers can never observe an empty/partial file).
        body = json.dumps(payload)
        path = _commit_path(table_dir, version)
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        try:
            with open(tmp, "w") as f:
                f.write(body)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, path)  # atomic + exclusive, full content
                won = True
            except OSError as e:
                # NFS caveat: a retransmitted LINK request can report
                # failure (EEXIST among others) for a link that actually
                # succeeded. st_nlink == 2 on the private temp file is the
                # classic lockfile probe — only OUR link target can be the
                # second name, so 2 means we won regardless of the errno.
                # A vanished tmp (a concurrent vacuum swept it after a stall
                # past _tmp_grace_seconds) leaves the race UNDECIDABLE by
                # nlink — and guessing either way is wrong: "won" when we
                # lost publishes nothing; "lost" when we actually won makes
                # the append path re-commit the same payload at the next
                # version (duplicated add actions → duplicated rows). The
                # content of the published entry decides it exactly: only
                # OUR link carries OUR body (identical bodies from two
                # writers commute — then it genuinely doesn't matter who
                # won).
                try:
                    won = os.stat(tmp).st_nlink == 2
                except FileNotFoundError:
                    try:
                        with open(path) as pf:
                            won = pf.read() == body
                    except FileNotFoundError:
                        won = False
                if not won:
                    if isinstance(e, FileExistsError):
                        if expected_version is not None:
                            raise ConcurrentCommitError(
                                f"lost the commit race for version {version}"
                            ) from None
                        continue  # append: rebase on the new tip and retry
                    raise  # EPERM/EXDEV/...: surface, finally sweeps tmp
            # Durability: fsync the LOG DIRECTORY so the new entry (not
            # just its content) survives power loss — without this a
            # crash can silently lose the newest commit after commit()
            # already returned.
            dfd = os.open(_log_dir(table_dir), os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
            return version
        finally:
            # every exit path (publish, lost race retry, serialization or
            # link error) removes the private temp file; a hard crash can
            # still strand one, which vacuum() sweeps from _txlog/
            with contextlib.suppress(FileNotFoundError):
                os.unlink(tmp)


def _checkpoint_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"{version:020d}.checkpoint.json")


def _newest_checkpoint(table_dir: str, version: int) -> dict | None:
    """Newest checkpoint at or below ``version``, or None. Checkpoints
    never replace commits (time travel to pre-checkpoint versions replays
    from an older checkpoint, or from 0) — they only shorten the fold."""
    ldir = _log_dir(table_dir)
    if not os.path.isdir(ldir):
        return None
    best = max(
        (
            int(f[: -len(".checkpoint.json")])
            for f in os.listdir(ldir)
            if f.endswith(".checkpoint.json")
            and int(f[: -len(".checkpoint.json")]) <= version
        ),
        default=None,
    )
    if best is None:
        return None
    with open(_checkpoint_path(table_dir, best)) as f:
        return json.load(f)


def _resolve(
    table_dir: str, version: int | None
) -> tuple[list, dict, dict | None, int]:
    """(actions, txn_app_versions, metadata, version) as of ``version`` —
    fold from the newest checkpoint ≤ version, replaying only the tail
    commits. ``metadata`` is the LATEST metaData action at or below the
    version (None if the table never declared one)."""
    tip = latest_version(table_dir)
    if version is None:
        version = tip
    if version > tip or version < 0:
        raise ValueError(f"version {version} not in log (tip {tip})")
    ckpt = _newest_checkpoint(table_dir, version)
    actions: list = list(ckpt["actions"]) if ckpt else []
    txns: dict = dict(ckpt["txn_app_versions"]) if ckpt else {}
    meta: dict | None = ckpt.get("metadata") if ckpt else None
    start = ckpt["version"] + 1 if ckpt else 0
    for v in range(start, version + 1):
        with open(_commit_path(table_dir, v)) as f:
            c = json.load(f)
        removed = set(c["remove"])
        actions = [a for a in actions if _action_path(a) not in removed]
        actions.extend(c["add"])
        t = c.get("txn")
        if t:
            prev = txns.get(t["app_id"])
            b = int(t["batch_id"])
            if prev is None or b > int(prev):
                txns[t["app_id"]] = b
        if c.get("metadata") is not None:
            meta = c["metadata"]
    return actions, txns, meta, version


def write_checkpoint(table_dir: str, version: int | None = None) -> int:
    """Materialize the fold at ``version`` (default: tip) as
    ``<version>.checkpoint.json`` — Delta's ``_last_checkpoint``. Later
    resolutions for any target ≥ this version replay only the commits
    after it, keeping the driver-side fold O(tail) for long-lived tables.
    Also carries the per-app txn high-water marks and the table
    metadata so :func:`last_txn` / :func:`table_metadata` stay
    checkpoint-compatible."""
    actions, txns, meta, version = _resolve(table_dir, version)
    path = _checkpoint_path(table_dir, version)
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": version,
                "actions": actions,
                "txn_app_versions": txns,
                "metadata": meta,
            },
            f,
        )
    os.rename(tmp, path)  # atomic publish; idempotent (same fold content)
    return version


def _ts_seconds(ts) -> float:
    """Normalize a caller-supplied timestamp to unix SECONDS (float).
    Accepts a number, a ``datetime`` (naive = UTC — the repo-wide
    timestamp discipline; an aware one converts exactly), or a string
    (ISO-8601, same naive-is-UTC rule; plain numeric strings pass
    through — the form stream options arrive in)."""
    import datetime

    import math

    if isinstance(ts, (int, float)) and not isinstance(ts, bool):
        if not math.isfinite(ts):
            raise ValueError(f"timestamp must be finite, got {ts!r}")
        return float(ts)
    if isinstance(ts, str):
        try:
            v = float(ts)
        except ValueError:
            ts = datetime.datetime.fromisoformat(ts)
        else:
            # 'nan'/'inf' parse as floats but are not instants — silently
            # accepting them would turn a typo'd option into a stream that
            # skips the whole log (nan compares False everywhere)
            if not math.isfinite(v):
                raise ValueError(f"timestamp must be finite, got {ts!r}")
            return v
    if isinstance(ts, datetime.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=datetime.timezone.utc)
        return ts.timestamp()
    if isinstance(ts, datetime.date):
        return datetime.datetime(
            ts.year, ts.month, ts.day, tzinfo=datetime.timezone.utc
        ).timestamp()
    raise TypeError(f"unsupported timestamp value {ts!r}")


def commit_timestamps(table_dir: str) -> list[float]:
    """Effective commit timestamp (unix seconds) per version ``0..tip``,
    made MONOTONE NON-DECREASING by a running max — Delta's rule: a
    commit whose raw timestamp regresses (mtime drift after a file copy,
    writer clock skew) is served AT its predecessor's timestamp, so
    timestamp travel always resolves a contiguous history. The raw value
    per version is the in-commit ``timestamp`` when the writer recorded
    one (:func:`commit`), else the commit FILE's modification time —
    Delta's classic source. O(commits) driver-side, KB JSON + one stat
    each."""
    out: list[float] = []
    running = float("-inf")
    for v in range(latest_version(table_dir) + 1):
        path = _commit_path(table_dir, v)
        with open(path) as f:
            raw = json.load(f).get("timestamp")
        eff = float(raw) if raw is not None else os.stat(path).st_mtime
        running = max(running, eff)
        out.append(running)
    return out


def version_at_timestamp(
    table_dir: str, ts, mode: str = "at_or_before", stamps: list | None = None
) -> int:
    """Resolve a timestamp to a log version — the fold behind every
    timestamp-based travel surface (``TIMESTAMP AS OF`` reads,
    timestamp RESTORE, CDF ``startingTimestamp``/``endingTimestamp``,
    the streaming source's ``startingTimestamp``).

    - ``mode="at_or_before"`` (snapshot semantics — ``TIMESTAMP AS
      OF``): the LAST version whose effective commit timestamp is
      ``<= ts``. A ``ts`` before the first commit raises (there was no
      table then); a ``ts`` at or past the tip's timestamp resolves to
      the tip (the table as of tomorrow IS today's tip — note Delta
      refuses future timestamps instead, guarding cross-host clock
      skew; this engine's in-commit timestamps make the resolution
      deterministic, so the friendlier clamp is safe).
    - ``mode="at_or_after"`` (change-feed START semantics — Delta's
      ``startingTimestamp``): the FIRST version whose effective
      timestamp is ``>= ts``. A ``ts`` before the first commit resolves
      to version 0; a ``ts`` past the tip's timestamp raises (there are
      no changes at or after it — Delta's own refusal).

    Effective timestamps come from :func:`commit_timestamps` (in-commit
    value when recorded, else commit-file mtime, monotone-folded);
    callers that already hold that list pass it via ``stamps`` so a
    two-ended range (or the streaming start) walks the log once, not
    per resolution."""
    ts = _ts_seconds(ts)
    if stamps is None:
        stamps = commit_timestamps(table_dir)
    if not stamps:
        raise ValueError(f"{table_dir} has no commits to resolve {ts} against")
    if mode == "at_or_before":
        if ts < stamps[0]:
            raise ValueError(
                f"timestamp {ts} is before {table_dir}'s first commit "
                f"({stamps[0]}); the table did not exist yet"
            )
        # last version with eff <= ts (ties: later version wins — the
        # state AT that instant includes every commit stamped with it)
        v = max(i for i, s in enumerate(stamps) if s <= ts)
        return v
    if mode == "at_or_after":
        for i, s in enumerate(stamps):
            if s >= ts:
                return i
        raise ValueError(
            f"timestamp {ts} is after {table_dir}'s latest commit "
            f"({stamps[-1]}); no changes exist at or after it"
        )
    raise ValueError(f"unknown resolution mode {mode!r}")


def _resolve_travel(
    table_dir: str, version: int | None, timestamp, what: str
) -> int | None:
    """Shared version/timestamp argument arbitration for the travel
    surfaces: exactly one axis may be given; a timestamp resolves
    through :func:`version_at_timestamp` snapshot semantics."""
    if timestamp is None:
        return version
    if version is not None:
        raise ValueError(
            f"{what}: pass version= or timestamp=, not both — they are "
            "two spellings of the same travel axis"
        )
    return version_at_timestamp(table_dir, timestamp)


def snapshot_files(
    table_dir: str,
    version: int | None = None,
    predicate_range: tuple[str, object, object] | None = None,
) -> list[str]:
    """Data files of the snapshot as of ``version`` (default: log tip) —
    the fold of add/remove actions over commits ``0..version``.

    ``predicate_range=(col, lo, hi)`` applies file-level data skipping:
    files whose committed ``stats[col]`` range does not overlap
    ``[lo, hi]`` are pruned HERE, driver-side, from metadata alone —
    Spark never lists or opens them. Files committed without stats for
    ``col`` are conservatively kept (skipping is an optimization, never
    a filter — callers still apply the row-level predicate). ``col`` is
    a LOGICAL name; under column mapping it is translated to the
    physical name the per-file stats are keyed by (stats are collected
    over the written, physical-named frame), so skipping keeps working
    across renames."""
    actions, _, meta, _ = _resolve(table_dir, version)
    if predicate_range is None:
        return [_action_path(a) for a in actions]
    col, lo, hi = predicate_range
    if _mapping_of(meta):
        col = _physical_name(meta, col)
    # normalize the caller's bounds the same way the stats were encoded
    # (dates→ISO strings, decimals→outward-widened floats) so the
    # comparison is type-consistent and conservatively widened
    lo, hi = _prune_bound(lo, "lo"), _prune_bound(hi, "hi")
    keep = []
    for a in actions:
        stats = a.get("stats", {}) if isinstance(a, dict) else {}
        if col in stats:
            mn, mx = stats[col]
            if mn is not None and mx is not None and (mx < lo or mn > hi):
                continue
        keep.append(_action_path(a))
    return keep


def read_version(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    predicate_range: tuple[str, object, object] | None = None,
    timestamp=None,
) -> DataFrame:
    """Snapshot read: one distributed parquet scan of the resolved file
    list (time travel via ``version=`` — Delta ``VERSION AS OF`` — or
    ``timestamp=`` — Delta ``TIMESTAMP AS OF``, resolved to the last
    version committed at or before it by :func:`version_at_timestamp`;
    the two are mutually exclusive — and file-level data skipping via
    ``predicate_range`` — see :func:`snapshot_files`). The resolution is
    immune to commits that land after it — copy-on-write never deletes
    data files. A predicate that prunes EVERY file returns a typed empty
    DataFrame (schema lifted from one live file, zero rows read), not a
    schema-inference error.

    **The log's declared schema governs the read** (Delta semantics: the
    metaData action, not the parquet footers, is the table's schema).
    When the snapshot's metadata declares one, the scan is planned with
    it explicitly — after a schema evolution
    (``validated_write(evolve=True)`` + a metadata commit) files written
    under the OLD schema are read with the evolved shape, missing
    columns null-filled per file, with no ``mergeSchema`` footer sweep
    (which at 100 TB would read every footer; the log already knows the
    answer). Time travel to a pre-evolution version reads with THAT
    version's schema — each snapshot is self-consistent. Deletion
    vectors are applied per snapshot too: a version reads under its OWN
    DV state, so time travel before a merge-on-read DELETE still sees
    the rows and a restore across one resurrects them."""
    version = _resolve_travel(table_dir, version, timestamp, "read_version")
    actions, _, meta, v = _resolve(table_dir, version)
    files = snapshot_files(table_dir, v, predicate_range)
    reader = spark.read
    declared = (meta or {}).get("schema")
    mapping = _mapping_of(meta)
    if declared is not None:
        # under column mapping (RENAME/DROP COLUMN without rewrite) the
        # files carry PHYSICAL names: plan the scan physical, project to
        # the snapshot's logical names after; unmapped tables keep the
        # byte-identical pre-mapping plan
        reader = reader.schema(
            _physical_ddl(declared, meta) if mapping else declared
        )
    if not files:
        if declared is not None:
            return spark.createDataFrame([], declared)
        all_files = snapshot_files(table_dir, v)
        if all_files:
            return spark.read.parquet(all_files[0]).limit(0)
        # zero files AND no declared schema: there is nothing to lift a
        # schema from — raise the real reason instead of letting the
        # zero-path reader fail with an unrelated inference error
        raise ValueError(
            f"snapshot v{v} of {table_dir} has no data files and no "
            "declared schema; commit table metadata to make empty "
            "snapshots readable"
        )
    # deletion vectors (merge-on-read): files whose action carries a dv
    # descriptor drop their deleted rows via one broadcast anti-join at
    # scan time; dv-less snapshots take the identical pre-DV plan
    scan = _scan_files_with_dvs(spark, files, _dv_map(actions), reader)
    return _project_logical(scan, meta) if mapping else scan


def _local_path(p: str) -> str:
    """Normalize an ``input_file_name()`` value to a comparable local
    path (strip the ``file:`` scheme, absolutize) — the ONE place this
    logic lives; touched-file discovery in MERGE/DELETE/UPDATE and the
    stats keying in :func:`write_files` must agree on it exactly."""
    if p.startswith("file:"):
        p = p[len("file:"):]
    return os.path.abspath(p)


def _stat_bound(v, side: str):
    """JSON-safe, ORDER-PRESERVING encoding of a per-file stat bound
    (actions are serialized with ``json.dumps``; ``datetime.date`` /
    ``Decimal`` would TypeError at commit time otherwise):

    - date/datetime → ISO-8601 string (lexicographic order == temporal
      order, so pruning comparisons stay exact);
    - Decimal → float, WIDENED one ulp outward (min down, max up) so the
      lossy conversion can never tighten a bound — skipping must stay
      conservative (prune only what provably cannot match);
    - everything else (int/float/str/bool/None) passes through.

    :func:`_prune_bound` applies the matching normalization to
    caller-supplied predicate ranges at compare time."""
    import datetime
    import decimal
    import math

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return math.nextafter(f, -math.inf) if side == "min" else math.nextafter(f, math.inf)
    return v


def _prune_bound(v, side: str):
    """Normalize a caller-supplied predicate bound the same way
    :func:`_stat_bound` normalized the stored stats, widened OUTWARD
    (lo down, hi up) where conversion is lossy — so data skipping
    against encoded stats can only keep extra files, never drop a
    matching one."""
    return _stat_bound(v, "min" if side == "lo" else "max")


def write_files(
    df: DataFrame, table_dir: str, stats_cols: list[str] | None = None
) -> list:
    """Write ``df`` as immutable parquet data files under ``table_dir``
    (a uniquely-named subdir, so concurrent writers never collide) and
    return their add actions — NOT yet part of any snapshot until a
    :func:`commit` references them.

    With ``stats_cols``, each action is a ``{"path", "size", "stats",
    "num_rows"}`` dict carrying the file's byte size (Delta's required
    ``add.size`` field — what byte-budget stream admission reads from
    the LOG instead of re-statting the filesystem every trigger),
    per-file min/max for those columns (enables ``predicate_range``
    skipping) and the file's row count (enables metadata-only
    :func:`count_rows` — Delta's ``numRecords``). Stats are lifted from
    the PARQUET FOOTERS of the files just written — exactly what a
    production Delta writer does — a driver-side metadata read bounded
    by file count, never row count (the pre-r13 form re-read the whole
    write output through a distributed ``groupBy(input_file_name())``
    aggregation: one full extra pass of every committed byte, per
    commit). Footer min/max is exact for the int/float columns the
    engine stats (parquet stores typed values, not truncated prefixes,
    for physical INT/DOUBLE); any column whose footer stats are absent
    or non-exact (strings truncate, NaN suppresses float stats,
    decimals re-encode) falls back to the distributed read-back for
    that write, keeping behavior identical."""
    out = os.path.join(table_dir, "data", uuid.uuid4().hex)
    df.write.parquet(out)
    paths = sorted(
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    if not stats_cols:
        return paths
    return stats_actions_for(df.sparkSession, paths, stats_cols)


def stats_actions_for(
    spark: SparkSession, paths: list[str], stats_cols: list[str]
) -> list:
    """Add actions (``path``/``size``/``stats``/``num_rows``) for
    ALREADY-WRITTEN parquet files — footer-lifted stats with the same
    distributed read-back fallback as :func:`write_files` (shared by
    writers that land several commits' files in one pass and split the
    actions per commit afterwards)."""
    footer = _footer_stats(paths, stats_cols)
    if footer is not None:
        by_file, nrows = footer
    else:
        by_file, nrows = _readback_stats(spark, paths, stats_cols)
    return [
        {
            "path": p,
            "size": os.path.getsize(p),
            "stats": by_file.get(os.path.abspath(p), {}),
            "num_rows": nrows.get(os.path.abspath(p), 0),
        }
        for p in paths
    ]


#: parquet physical types whose footer min/max is the exact column
#: min/max (typed values — no prefix truncation, no re-encoding)
_FOOTER_EXACT_PHYSICAL = {"INT32", "INT64", "FLOAT", "DOUBLE"}


def _footer_stats(paths: list[str], stats_cols: list[str]):
    """Per-file ``(min/max stats, row counts)`` lifted from parquet
    footers, or ``None`` when any requested column's footer stats are
    not provably exact (missing, logical-typed beyond plain ints/floats,
    NaN-suppressed) — the caller then falls back to the distributed
    read-back so stored stats stay bit-identical either way."""
    try:
        import pyarrow.parquet as pq
    except Exception:  # pragma: no cover - pyarrow ships with pyspark
        return None
    by_file: dict[str, dict] = {}
    nrows: dict[str, int] = {}
    for p in paths:
        try:
            md = pq.ParquetFile(p).metadata
        except Exception:
            return None
        ap = os.path.abspath(p)
        nrows[ap] = md.num_rows
        # key leaves by their FULL dotted path, not the bare leaf name: a
        # nested leaf like payload.id reports name 'id' and would shadow
        # (or stand in for) the top-level column — footer stats of the
        # wrong leaf drive predicate_range pruning, i.e. silently wrong
        # results. Only a leaf whose path IS the stats column name is the
        # top-level column; a name that matches some nested leaf only
        # routes to the exact distributed read-back instead.
        idx = {}
        names = set()
        for j in range(len(md.schema)):
            col = md.schema.column(j)
            idx[col.path] = (j, col.physical_type, col.logical_type.type)
            names.add(col.name)
        stats: dict[str, list] = {}
        for c in stats_cols:
            if c not in idx:
                if c in names:
                    # exists only as a nested leaf (struct field) — the
                    # footer cannot represent the top-level column; fall
                    # back to the read-back for this write
                    return None
                # column absent from this file (pre-evolution vintage):
                # the read-back aggregation would yield NULL bounds too
                stats[c] = [None, None]
                continue
            j, phys, logical = idx[c]
            if phys not in _FOOTER_EXACT_PHYSICAL or logical not in (
                "NONE",
                "INT",
            ):
                return None
            mn = mx = None
            n_vals = 0
            for g in range(md.num_row_groups):
                cc = md.row_group(g).column(j)
                n_vals += cc.num_values
                st = cc.statistics
                if cc.num_values == 0:
                    continue
                if st is None or not st.has_min_max:
                    return None  # NaN-suppressed or writer omitted
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            if n_vals == 0:
                stats[c] = [None, None]  # all-null column in this file
            else:
                stats[c] = [_stat_bound(mn, "min"), _stat_bound(mx, "max")]
        by_file[ap] = stats
    return by_file, nrows


def _readback_stats(spark: SparkSession, paths: list[str], stats_cols: list[str]):
    """The distributed stats fallback: one read-back aggregation grouped
    by ``input_file_name()`` — exact for every type, at the cost of a
    full extra pass over the written bytes."""
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("__num_rows")]
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    rows = (
        spark.read.parquet(*paths)
        .groupBy(F.input_file_name().alias("f"))
        .agg(*aggs)
        .collect()
    )
    by_file = {}
    nrows = {}
    for r in rows:
        p = _local_path(r["f"])
        by_file[p] = {
            c: [
                _stat_bound(r[f"min_{c}"], "min"),
                _stat_bound(r[f"max_{c}"], "max"),
            ]
            for c in stats_cols
        }
        nrows[p] = r["__num_rows"]
    return by_file, nrows




def _dv_map(actions) -> dict[str, dict]:
    """``{abs data-file path: dv descriptor}`` for every action carrying
    a deletion vector. A descriptor is ``{"path": <sidecar parquet dir>,
    "cardinality": <deleted row count>}`` — Delta's ``deletionVector``
    add-action field, expressed as a parquet sidecar of
    ``(file, pos)`` rows (``file`` = the verbatim ``_metadata.file_path``
    URI of the data file, ``pos`` = its 0-based parquet row index)."""
    return {
        os.path.abspath(a["path"]): a["dv"]
        for a in actions
        if isinstance(a, dict) and a.get("dv")
    }


def _scan_files_with_dvs(
    spark: SparkSession,
    files: list[str],
    dv_by_path: dict[str, dict],
    reader,
    with_meta: bool = False,
):
    """DV-aware distributed scan of specific data files: rows listed in
    a file's deletion vector are removed by ONE broadcast anti-join on
    ``(_metadata.file_path, _metadata.row_index)`` against the union of
    the referenced sidecars — merge-on-read, no data file rewritten.
    Files without a DV and ``with_meta=False`` take the exact pre-DV
    fast path (one plain parquet scan, plan unchanged). ``with_meta``
    keeps ``__txlog_file``/``__txlog_pos`` provenance columns (reserved
    scratch names — a table using them fails analysis loudly).

    Scale: the DV relation is bounded by the deleted-row count of the
    files being read — trickle-delete-sized by construction
    (:func:`delete_where` only routes small per-file fractions to a DV;
    OPTIMIZE/compaction reconciles accumulated DVs into rewrites, the
    same escape Delta documents when DVs grow)."""
    from pyspark.sql import functions as F

    dv_files = [p for p in files if os.path.abspath(p) in dv_by_path]
    if not dv_files and not with_meta:
        return reader.parquet(*files)
    base = reader.parquet(*files).select(
        "*",
        F.col("_metadata.file_path").alias("__txlog_file"),
        F.col("_metadata.row_index").alias("__txlog_pos"),
    )
    if dv_files:
        dirs = sorted(
            {dv_by_path[os.path.abspath(p)]["path"] for p in dv_files}
        )
        dv_rel = spark.read.parquet(*dirs).select(
            F.col("file").alias("__dv_file"), F.col("pos").alias("__dv_pos")
        )
        base = base.join(
            F.broadcast(dv_rel),
            (F.col("__txlog_file") == F.col("__dv_file"))
            & (F.col("__txlog_pos") == F.col("__dv_pos")),
            "left_anti",
        )
    return base if with_meta else base.drop("__txlog_file", "__txlog_pos")


def _scan_files(
    spark: SparkSession,
    table_dir: str,
    version: int,
    files: list[str],
    with_meta: bool = False,
):
    """Scan specific snapshot data files under the log-governed schema
    with the snapshot's deletion vectors applied — the read primitive
    every DML path (touched-file discovery, rewrite reads) shares with
    :func:`read_version`, so no path can resurrect merge-on-read-deleted
    rows by reading a data file raw. Under column mapping the scan is
    planned physical and projected to logical names (scan-meta scratch
    columns pass through), so DML predicates — written over logical
    names — resolve against any file vintage."""
    actions, _, meta, _ = _resolve(table_dir, version)
    declared = (meta or {}).get("schema")
    mapping = _mapping_of(meta)
    if declared is not None:
        reader = spark.read.schema(
            _physical_ddl(declared, meta) if mapping else declared
        )
    else:
        reader = spark.read
    scan = _scan_files_with_dvs(
        spark, files, _dv_map(actions), reader, with_meta=with_meta
    )
    if mapping:
        scan = _project_logical(
            scan, meta, keep=("__txlog_file", "__txlog_pos") if with_meta else ()
        )
    return scan


def merge_into(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    key: str,
    stats_cols: list[str] | None = None,
) -> tuple[int, list[str]]:
    """Delta-style ``MERGE INTO`` (``WHEN MATCHED THEN UPDATE SET * /
    WHEN NOT MATCHED THEN INSERT *``) as a file-pruned copy-on-write
    rewrite. Returns ``(committed_version, touched_file_paths)``.

    The two-pass shape is Delta's own (PROTOCOL.md merge semantics over
    add/remove actions):

    1. **Touched-file discovery.** The source's key range prunes the
       snapshot via per-file stats (files that cannot contain a source
       key are never listed), then one inner join of the surviving
       files against the broadcast source keys collects the DISTINCT
       ``input_file_name()`` set — per-FILE metadata, bounded by file
       count. Files without a match are never rewritten.
    2. **Rewrite.** One full-outer join of the touched files' rows with
       the source on ``key``: matched rows take the source image
       (``UPDATE SET *`` — including nulls, which is why this is a
       side-indicator select, not a COALESCE), unmatched target rows
       pass through, source-only rows are the inserts (a source key
       that matches anywhere matches in a touched file BY DEFINITION,
       so anti-join-against-touched is exact, not approximate). The
       result commits as add(new files) + remove(touched files) under
       an ``expected_version`` guard.

    Scale: the rewrite cost is O(touched files + source), never
    O(table) — on a range-clustered 100 TB table a delta-sized upsert
    rewrites a handful of files. The full-outer join shuffles only
    touched-rows ∪ source (both delta-sized); untouched files keep
    their add actions (and stats) unchanged in the snapshot.
    """
    from pyspark.sql import functions as F

    tip = latest_version(table_dir)
    cols = read_version(spark, table_dir, tip).columns
    src = source.select(*cols)

    # pass 1: prune by the source's key envelope, then find touched files
    # (row count, duplicate-key detection and the envelope share ONE
    # aggregation job: non-null count == distinct count iff no non-null
    # key repeats, so the common no-duplicates MERGE never launches the
    # separate dup-key probe job the pre-r13 form ran per call)
    n_src, n_key, n_key_distinct, lo, hi = src.agg(
        F.count(F.lit(1)),
        F.count(F.col(key)),
        F.count_distinct(F.col(key)),
        F.min(key),
        F.max(key),
    ).collect()[0]
    if n_src == 0:
        # empty source (a common CDC micro-batch): metadata-only no-op,
        # NO commit — same contract as delete_where/update_where, so
        # empty batches never grow the snapshot's action list
        return tip, []
    cand = (
        snapshot_files(table_dir, tip, predicate_range=(key, lo, hi))
        if lo is not None
        else []  # only-NULL-key source: no file can be touched
    )
    touched: list[str] = []
    if cand:
        keys = src.select(key).distinct()
        hit = (
            # DV-aware scan: a key whose only occurrence is a
            # merge-on-read-deleted row must NOT touch the file (the key
            # is absent from the table — it is a plain insert)
            _scan_files(spark, table_dir, tip, cand, with_meta=True)
            .select(F.col(key), F.col("__txlog_file").alias("f"))
            .join(F.broadcast(keys), key, "left_semi")
            .select("f")
            .distinct()
            .collect()
        )
        hit_paths = {_local_path(r["f"]) for r in hit}
        touched = [p for p in cand if os.path.abspath(p) in hit_paths]

    # Delta MERGE semantics for duplicate source keys: duplicates that
    # match NO target row are plain multi-row inserts (allowed — the
    # full-outer join below emits each), but a TARGET row matched by
    # more than one source row is ambiguous (which image wins?) and
    # Delta fails the command — so do we, before any file is written.
    # Cost: rides the envelope aggregation above + (only when duplicates
    # exist at all) one semi probe of the touched files.
    if touched and n_key != n_key_distinct:
        # explicit alias: .count() would collide with a merge key that
        # is itself named "count" (ambiguous-reference AnalysisException)
        dup_keys = (
            src.where(F.col(key).isNotNull())
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("__merge_key_n"))
            .where(F.col("__merge_key_n") > 1)
            .select(key)
        )
        clash = (
            _scan_files(spark, table_dir, tip, touched)
            .join(F.broadcast(dup_keys), key, "left_semi")
            .select(key)
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"MERGE source has multiple rows for key "
                f"{clash[0][key]!r}, which matches an existing target "
                "row — ambiguous UPDATE (Delta: 'multiple source rows "
                "matched'); de-duplicate the source first"
            )

    # pass 2: rewrite touched rows ∪ source in ONE full-outer join; the
    # __txlog_modified flag marks rows the MERGE actually changed
    # (source-image rows: matched updates + inserts) so constraint
    # enforcement can scope to them — a carried-along target row the
    # MERGE did not touch cannot INTRODUCE a violation, and refusing DML
    # over a legacy violation it didn't create would brick repair writes
    # (:func:`add_constraints` is the Delta ADD-CONSTRAINT-shaped guard
    # that keeps legacy violations out in the first place)
    marked = src.select(
        F.col(key),
        *[F.col(c).alias(f"__s_{c}") for c in cols if c != key],
        F.lit(True).alias("__src"),
    )
    if touched:
        # DV-aware rewrite read: raw file rows that a deletion vector
        # already removed must not be carried along (resurrection)
        tgt = _scan_files(spark, table_dir, tip, touched)
        joined = tgt.join(marked, key, "full_outer")
        merged = joined.select(
            F.col(key),
            *[
                F.when(F.col("__src").isNotNull(), F.col(f"__s_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in cols
                if c != key
            ],
            F.col("__src").isNotNull().alias("__txlog_modified"),
        ).select(*cols, "__txlog_modified")
    else:
        # nothing matched anywhere: pure insert, every row is new
        merged = src.withColumn("__txlog_modified", F.lit(True))
    new_actions = _write_files_checked(
        merged, table_dir, table_metadata(table_dir, tip), stats_cols
    )
    version = commit(
        table_dir, add=new_actions, remove=touched, expected_version=tip + 1,
        operation="MERGE",
    )
    return version, touched


def delete_where(
    spark: SparkSession,
    table_dir: str,
    predicate: str,
    stats_cols: list[str] | None = None,
    prune_range: tuple[str, object, object] | None = None,
    dv_fraction_threshold: float = 0.0,
) -> tuple[int, list[str]]:
    """Delta-style ``DELETE FROM table WHERE predicate`` as a file-pruned
    rewrite — copy-on-write by default, MERGE-ON-READ (deletion vectors)
    per touched file when the deleted fraction is small. Returns
    ``(committed_version, touched_files)`` — ``touched_files`` empty
    (and NO commit made) when nothing matched.

    Same two-pass shape as :func:`merge_into`:

    1. **Touched-file discovery.** ``prune_range=(col, lo, hi)`` first
       skips files whose committed stats cannot contain a matching row
       (driver-side, metadata only); one distributed DV-AWARE scan of
       the survivors then aggregates the per-file count of rows where
       the predicate is TRUE (rows an earlier DV already deleted can
       neither match nor keep a file touched) — per-FILE metadata,
       bounded by file count. Files with no match keep their add
       actions (and stats) untouched.
    2. **Per-file routing + rewrite.** With ``dv_fraction_threshold=f``
       (Delta's deletion-vector DML): a touched file whose matching
       fraction of LIVE rows is ≤ ``f`` gets a DELETION VECTOR instead
       of a rewrite — a parquet sidecar of ``(file, row position)``
       rows, merged with the file's existing DV and attached to its
       re-committed add action as ``{"dv": {"path", "cardinality"}}``;
       the data file is NOT rewritten, and every reader anti-joins the
       DV at scan time (:func:`_scan_files_with_dvs`). Files above the
       threshold (or without a recorded ``num_rows`` to judge by, or
       with ``f=0.0`` — the default, pure copy-on-write) are rewritten
       WITHOUT the matching rows (SQL DELETE semantics: a row is
       removed only when the predicate is TRUE — NULL keeps it, hence
       the ``coalesce`` guard). Both classes commit together as
       add(new/re-referenced) + remove(touched) under an
       ``expected_version`` guard.

    Scale: copy-on-write is O(touched files) DATA per commit; a
    deletion vector is O(deleted rows) — at 100 TB with trickle deletes
    (the GDPR erasure pattern: a few rows per file, daily) that is the
    difference between KB of sidecar and GB of rewrite per commit.
    Accumulated DVs are reconciled by compaction/OPTIMIZE (any rewrite
    through :func:`read_version` materializes the net rows and drops
    the DV with the replaced action) and their pre-images by
    :func:`vacuum`, which reclaims unreferenced sidecars like data
    files. Time travel and :func:`table_changes` see DV commits
    exactly: each version reads under its own DV state."""
    from pyspark.sql import functions as F

    tip = latest_version(table_dir)
    cand = snapshot_files(table_dir, tip, predicate_range=prune_range)
    if not cand:
        return tip, []
    actions, _, meta, _ = _resolve(table_dir, tip)
    by_path = {os.path.abspath(_action_path(a)): a for a in actions}
    # file name projected AT THE SCAN — post-filter provenance IS the
    # scan row's provenance, same discipline as merge_into; the per-file
    # match COUNT feeds the DV-vs-rewrite routing below
    hit = (
        _scan_files(spark, table_dir, tip, cand, with_meta=True)
        .select(
            F.col("__txlog_file").alias("f"),
            F.coalesce(F.expr(predicate), F.lit(False)).alias("__del"),
        )
        .where(F.col("__del"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    matches = {_local_path(r["f"]): r["n"] for r in hit}
    uri_by_path = {_local_path(r["f"]): r["f"] for r in hit}
    touched = [p for p in cand if os.path.abspath(p) in matches]
    if not touched:
        return tip, []  # no matching row anywhere: metadata-only no-op
    dv_class: list[str] = []
    rw_class: list[str] = []
    for p in touched:
        ap = os.path.abspath(p)
        a = by_path[ap]
        num_rows = a.get("num_rows") if isinstance(a, dict) else None
        if dv_fraction_threshold > 0 and num_rows:
            old_card = ((a.get("dv") or {}).get("cardinality")) or 0
            live = int(num_rows) - int(old_card)
            if live > 0 and matches[ap] / live <= dv_fraction_threshold:
                dv_class.append(p)
                continue
        rw_class.append(p)
    new_actions: list = []
    if rw_class:
        kept = _scan_files(spark, table_dir, tip, rw_class).where(
            ~F.coalesce(F.expr(predicate), F.lit(False))
        )
        new_actions.extend(
            write_files(
                _to_physical(kept, meta),
                table_dir,
                stats_cols=_physical_stats_cols(stats_cols, meta),
            )
        )
    if dv_class:
        new_actions.extend(
            _write_deletion_vectors(
                spark, table_dir, tip, dv_class, predicate, by_path, uri_by_path
            )
        )
    version = commit(
        table_dir, add=new_actions, remove=touched, expected_version=tip + 1,
        operation="DELETE",
    )
    return version, touched


def _write_deletion_vectors(
    spark: SparkSession,
    table_dir: str,
    version: int,
    files: list[str],
    predicate: str,
    by_path: dict,
    uri_by_path: dict[str, str],
) -> list[dict]:
    """Materialize ONE deletion-vector sidecar (parquet dir of
    ``(file, pos)`` rows) for a DELETE's dv-routed files and return
    their re-referenced add actions. The newly matching positions come
    from a DV-aware scan (so they are disjoint from the files' existing
    DVs by construction) and are UNIONED with the existing DV rows OF
    THESE FILES — Delta semantics: a file's new DV wholly replaces its
    old one, carrying all deletions to date. Rows the old sidecars hold
    for OTHER files are not copied (a shared sidecar stays referenced by
    those files' own actions; copying would leak stale positions across
    a later RESTORE). Per-file cardinality is read back from the written
    sidecar — bounded by deleted rows, the same read-back pattern as
    :func:`write_files`' stats."""
    from pyspark.sql import functions as F

    scan = _scan_files(spark, table_dir, version, files, with_meta=True)
    newly = scan.where(
        F.coalesce(F.expr(predicate), F.lit(False))
    ).select(
        F.col("__txlog_file").alias("file"),
        F.col("__txlog_pos").alias("pos"),
    )
    uris = [uri_by_path[os.path.abspath(p)] for p in files]
    old_dirs = sorted(
        {
            dv["path"]
            for p in files
            for dv in ((by_path[os.path.abspath(p)].get("dv"),) if isinstance(by_path[os.path.abspath(p)], dict) else ())
            if dv
        }
    )
    if old_dirs:
        newly = newly.unionByName(
            spark.read.parquet(*old_dirs).where(F.col("file").isin(uris))
        )
    out = os.path.join(table_dir, "dv", uuid.uuid4().hex)
    newly.write.parquet(out)
    counts = {
        r["file"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    acts = []
    for p in files:
        a = by_path[os.path.abspath(p)]
        new_a = dict(a) if isinstance(a, dict) else {"path": a}
        card = int(counts.get(uri_by_path[os.path.abspath(p)], 0))
        new_a["dv"] = {"path": out, "cardinality": card}
        acts.append(new_a)
    return acts


def _nullability_norm(dt):
    """Recursively normalize every nullability flag in a type to True —
    Spark's expression analysis often resolves a literal-built array/
    struct as non-null-elements while the stored column (parquet default)
    is nullable-elements; store assignment must treat those as the SAME
    type (Spark's own ANSI policy ignores nullability for compatibility)."""
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    if isinstance(dt, ArrayType):
        return ArrayType(_nullability_norm(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(
            _nullability_norm(dt.keyType), _nullability_norm(dt.valueType), True
        )
    if isinstance(dt, StructType):
        return StructType(
            [
                StructField(f.name, _nullability_norm(f.dataType), True)
                for f in dt.fields
            ]
        )
    return dt


def _check_update_types(snap, set_exprs: dict[str, str]) -> None:
    """Reject an UPDATE whose SET expression cannot sensibly store into its
    target column — Delta's UPDATE fails analysis on a non-coercible type;
    a silent ``cast`` would turn ``SET price = name`` into NULLs instead.
    Resolution is analysis-only (no job): the expression's type comes from
    the snapshot's analyzed schema. Store-assignment policy (ANSI-shaped):
    exact type match (ignoring nullability at any nesting depth — an
    ``array('x')`` literal stores into an ARRAY<STRING> column), NULL
    literals, numeric→numeric, string→string, and date↔timestamp are
    coercible; everything else raises (including nested ELEMENT-type
    coercions like array<int>→array<long>, deliberately stricter than a
    silent deep cast)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DateType,
        NullType,
        NumericType,
        StringType,
        TimestampType,
    )

    resolved = snap.select(
        *[F.expr(e).alias(c) for c, e in set_exprs.items()]
    ).schema
    for f in resolved:
        src, dst = f.dataType, snap.schema[f.name].dataType
        ok = (
            _nullability_norm(src) == _nullability_norm(dst)
            or isinstance(src, NullType)
            or (isinstance(src, NumericType) and isinstance(dst, NumericType))
            or (isinstance(src, StringType) and isinstance(dst, StringType))
            or (
                isinstance(src, (DateType, TimestampType))
                and isinstance(dst, (DateType, TimestampType))
            )
        )
        if not ok:
            raise ValueError(
                f"UPDATE SET {f.name} = {set_exprs[f.name]!r}: expression "
                f"type {src.simpleString()} cannot store into column type "
                f"{dst.simpleString()}"
            )


def update_where(
    spark: SparkSession,
    table_dir: str,
    predicate: str,
    set_exprs: dict[str, str],
    stats_cols: list[str] | None = None,
    prune_range: tuple[str, object, object] | None = None,
) -> tuple[int, list[str]]:
    """Delta-style ``UPDATE table SET col = expr, ... WHERE predicate``
    as a file-pruned copy-on-write rewrite. Returns
    ``(committed_version, touched_files)`` — ``touched_files`` empty
    (and NO commit made) when nothing matched.

    Same two-pass shape as :func:`delete_where`:

    1. **Touched-file discovery.** ``prune_range`` skips files whose
       committed stats cannot contain a matching row (driver-side,
       metadata only); one distributed scan of the survivors collects
       the DISTINCT ``input_file_name()`` set of files holding at least
       one row where the predicate is TRUE — per-FILE metadata, bounded
       by file count.
    2. **Rewrite.** Touched files are rewritten with the SET
       expressions applied to matching rows ONLY (SQL UPDATE
       semantics: a NULL predicate leaves the row unchanged, hence the
       ``coalesce`` guard; every SET expression is evaluated against
       the PRE-update row image, so ``SET a = b, b = a`` swaps — one
       side-indicator select, not sequential assignment) and committed
       as add(new) + remove(touched) under an ``expected_version``
       guard. Untouched files keep their add actions (and stats)
       byte-unchanged.

    ``set_exprs`` maps existing column names to SQL expressions over
    the table's columns; an unknown column raises (UPDATE never adds
    columns — that is schema evolution's job), and a SET expression
    whose resolved type cannot store into the target column raises at
    analysis time (:func:`_check_update_types`) instead of silently
    NULLing data through a cast.

    Scale: O(touched files), never O(table) — repricing one key range
    of a range-clustered 100 TB table rewrites only the files whose
    stats envelope admits the predicate AND that actually contain a
    matching row. Pre-images stay time-travelable until
    :func:`vacuum`."""
    from pyspark.sql import functions as F

    tip = latest_version(table_dir)
    cand = snapshot_files(table_dir, tip, predicate_range=prune_range)
    snap = read_version(spark, table_dir, tip)
    cols = snap.columns
    unknown = set(set_exprs) - set(cols)
    if unknown:
        raise ValueError(
            f"UPDATE SET references non-existent column(s) {sorted(unknown)}; "
            f"table columns are {cols}"
        )
    _check_update_types(snap, set_exprs)
    touched: list[str] = []
    if cand:
        hit = (
            # DV-aware scan: a predicate matching only merge-on-read-
            # deleted rows must not touch (or resurrect through) a file
            _scan_files(spark, table_dir, tip, cand, with_meta=True)
            # file name projected AT THE SCAN — post-filter provenance
            # IS the scan row's provenance, same discipline as merge_into
            .select(
                F.col("__txlog_file").alias("f"),
                F.coalesce(F.expr(predicate), F.lit(False)).alias("__upd"),
            )
            .where(F.col("__upd"))
            .select("f")
            .distinct()
            .collect()
        )
        hit_paths = {_local_path(r["f"]) for r in hit}
        touched = [p for p in cand if os.path.abspath(p) in hit_paths]
    if not touched:
        return tip, []  # no matching row anywhere: metadata-only no-op
    cond = F.coalesce(F.expr(predicate), F.lit(False))
    tgt = _scan_files(spark, table_dir, tip, touched)
    # one select over the old row image: all SET expressions (and the
    # predicate) see pre-update values, and each output keeps the
    # column's original type (UPDATE never changes the schema). The
    # __txlog_modified flag marks the rows the predicate matched so
    # constraint enforcement scopes to rows this UPDATE actually changed
    # (a carried-along row cannot introduce a violation; see merge_into)
    updated = tgt.select(
        *[
            F.when(cond, F.expr(set_exprs[c]).cast(tgt.schema[c].dataType))
            .otherwise(F.col(c))
            .alias(c)
            if c in set_exprs
            else F.col(c)
            for c in cols
        ],
        cond.alias("__txlog_modified"),
    )
    new_actions = _write_files_checked(
        updated, table_dir, table_metadata(table_dir, tip), stats_cols
    )
    version = commit(
        table_dir, add=new_actions, remove=touched, expected_version=tip + 1,
        operation="UPDATE",
    )
    return version, touched


def rewrite_with_retry(
    table_dir: str,
    rewrite,
    max_attempts: int = 5,
    backoff_seconds: float = 0.05,
) -> int:
    """Run a guarded copy-on-write rewrite under optimistic concurrency
    (Delta's commit loop): ``rewrite(tip)`` computes the rewrite AGAINST
    the given tip and returns ``(add, remove)`` (optionally
    ``(add, remove, txn)``); this helper commits it as ``tip + 1``. When
    a concurrent writer lands first, the attempt's remove-set was
    computed against a stale snapshot, so the helper backs off
    (exponential, bounded, jittered — two crash-looping writers must not
    stay phase-locked) and RE-RUNS ``rewrite`` against the new tip —
    re-deriving touched files from current state is the only generally
    safe response to a lost rewrite race (the competing commit may have
    rewritten the very files this attempt planned to remove). After
    ``max_attempts`` lost races the last :class:`ConcurrentCommitError`
    propagates: under that much contention the caller's scheduling — one
    writer per table partition, a queue — is the fix, not more retries.

    Blind appends don't need this: :func:`commit` without
    ``expected_version`` already rebases add-only commits internally.
    Completes the concurrency story pinned by
    ``test_concurrent_writers_arbitrate_through_the_log`` (arbitration)
    with liveness (every writer eventually lands).
    """
    import random
    import time as _time

    if max_attempts < 1:
        raise ValueError(f"max_attempts must be >= 1, got {max_attempts}")
    last: ConcurrentCommitError | None = None
    for attempt in range(max_attempts):
        tip = latest_version(table_dir)
        out = rewrite(tip)
        add, remove, txn = (*out, None) if len(out) == 2 else out
        try:
            return commit(
                table_dir,
                add=add,
                remove=list(remove or ()),
                txn=txn,
                expected_version=tip + 1,
            )
        except ConcurrentCommitError as e:
            last = e
            _time.sleep(
                backoff_seconds * (2**attempt) * (0.5 + random.random())
            )
    if last is None:  # max_attempts >= 1 guarantees a bound error
        raise RuntimeError(
            "rewrite_with_retry exhausted attempts without binding an error "
            f"(max_attempts={max_attempts})"
        )
    raise last


def restore(table_dir: str, version: int | None = None, timestamp=None) -> int:
    """Delta ``RESTORE TABLE ... VERSION AS OF`` (or ``TIMESTAMP AS
    OF`` via ``timestamp=`` — resolved to the last version committed at
    or before it, mutually exclusive with ``version=``): rewind the TIP
    to an earlier version's snapshot — where time travel READS the past,
    restore makes it the present for every future reader. Implemented as
    one ordinary guarded commit that re-adds the old version's file
    actions (stats included) and removes the current ones; METADATA-ONLY
    — no data file is read, written, or copied, which is what makes
    "undo the bad backfill on the 100 TB table" an O(KB) operation.
    History is preserved: the restore is itself a new version, and the
    pre-restore tip remains time-travelable (pinned in
    ``tests/test_txlog.py``).

    Two Delta-RESTORE safety properties:

    - **Existence check.** Re-added files must still exist — restoring
      past a :func:`vacuum` horizon would otherwise commit a tip whose
      every read throws; Delta's RESTORE fails the command up front and
      so does this (FileNotFoundError naming the missing files; nothing
      is committed).
    - **Metadata travels with the files.** The restore commit carries
      the TARGET version's metadata when it differs from the current
      one, so a restore across a schema evolution reads under the
      restored version's own schema, not the later one. (Metadata can
      only move FORWARD to the target's — a table that declared
      metadata after ``version`` and restores to a version that never
      had any keeps the current metadata: the log's fold cannot unset
      a metaData action, same as Delta where metadata always exists.)"""
    version = _resolve_travel(table_dir, version, timestamp, "restore")
    if version is None:
        raise ValueError("restore: pass version= or timestamp=")
    tip = latest_version(table_dir)
    cur_actions, _, cur_meta, _ = _resolve(table_dir, tip)
    old_actions, _, old_meta, _ = _resolve(table_dir, version)
    # compare whole ACTIONS, not just paths: a path present in both
    # versions under a DIFFERENT action (a deletion vector attached, a
    # stats change) must be removed and re-added with the target
    # version's action, or the restore silently keeps the current
    # descriptor (e.g. rows a later DV DELETE removed stay dead)
    cur = {_action_path(a): a for a in cur_actions}
    old = {_action_path(a): a for a in old_actions}
    # existence must cover deletion-vector sidecars too: restoring a
    # version whose actions reference a vacuumed DV would commit a tip
    # whose every read throws at the anti-join load
    cur_dvs = {d["path"] for d in _dv_map(cur_actions).values()}
    old_dvs = {d["path"] for d in _dv_map(old_actions).values()}
    missing = sorted(
        p for p in old if p not in cur and not os.path.exists(p)
    ) + sorted(
        p for p in old_dvs if p not in cur_dvs and not os.path.exists(p)
    )
    if missing:
        raise FileNotFoundError(
            f"cannot restore {table_dir} to v{version}: {len(missing)} "
            f"data file(s) no longer exist (vacuumed past the restore "
            f"target), e.g. {missing[0]}"
        )
    return commit(
        table_dir,
        add=[a for p, a in old.items() if cur.get(p) != a],
        remove=[p for p, a in cur.items() if old.get(p) != a],
        expected_version=tip + 1,
        metadata=old_meta if old_meta is not None and old_meta != cur_meta else None,
        operation="RESTORE",
    )


def table_metadata(table_dir: str, version: int | None = None) -> dict | None:
    """The table's governing metaData action as of ``version`` (default
    tip): ``{"schema": <DDL string>, "constraints": {name: predicate}}``
    — the LATEST metadata commit wins (schema evolution is just a new
    metadata commit). None if the table never declared metadata — which
    includes a FRESH table with no commits at all (``version=None``
    only; asking for an explicit version of an empty log still raises),
    so :func:`validated_write` works as a table's first-ever write."""
    if version is None and latest_version(table_dir) < 0:
        return None
    _, _, meta, _ = _resolve(table_dir, version)
    return meta


def _ddl_fields(ddl: str) -> list[tuple[str, str]]:
    """Top-level ``(name, type_rest)`` pairs of a ``name TYPE, ...`` DDL
    string, parsed without a Spark session (``<>``/``()`` nesting
    tracked so struct element commas don't split fields; backtick quotes
    stripped from names)."""
    fields: list[tuple[str, str]] = []
    depth, start = 0, 0
    for i, ch in enumerate(ddl + ","):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            part = ddl[start:i].strip()
            if part:
                name, _, rest = part.partition(" ")
                fields.append((name.strip("`"), rest.strip()))
            start = i + 1
    return fields


def _mapping_of(meta: dict | None) -> dict[str, str] | None:
    """The table's logical→physical column mapping, or None when the
    table never enabled one (the byte-identical pre-mapping path)."""
    return (meta or {}).get("column_mapping")


def _physical_name(meta: dict, logical: str) -> str:
    """Physical (on-disk parquet) name of a logical column under the
    metadata's mapping. A field absent from the mapping (added by a
    post-mapping schema evolution that didn't extend it) defaults to
    identity — UNLESS its identity name is tombstoned in
    ``dropped_physical``, where reading it would silently resurrect a
    DROPPED column's bytes: that raises instead (re-adding a dropped
    name needs a fresh physical name in the mapping)."""
    mapping = meta.get("column_mapping") or {}
    if logical in mapping:
        return mapping[logical]
    if logical in (meta.get("dropped_physical") or ()):
        raise ValueError(
            f"column {logical!r} was previously DROPPED and its physical "
            f"name is tombstoned; re-adding it requires a fresh physical "
            "name in column_mapping (old files still hold the dropped "
            "bytes under that name)"
        )
    if logical in set(mapping.values()):
        # the identity default would collide with a RENAMED column's
        # frozen physical name (rename 'a'->'x' freezes physical 'a';
        # re-adding logical 'a' by identity would alias x's bytes and
        # duplicate the physical schema) — fail loud at plan build, the
        # re-add needs a fresh physical name in the mapping (Delta
        # avoids the class entirely with unique col-<id> physicals)
        raise ValueError(
            f"column {logical!r}'s identity physical name is already in "
            "use by a renamed column; map the re-added column to a fresh "
            "physical name in column_mapping"
        )
    return logical


def _physical_ddl(declared: str, meta: dict) -> str:
    """The declared (logical) schema DDL re-keyed to physical names —
    what the parquet scan is planned with under column mapping; the
    logical projection happens after the scan."""
    return ", ".join(
        f"{_physical_name(meta, n)} {t}" for n, t in _ddl_fields(declared)
    )


def _project_logical(df, meta: dict, keep: tuple[str, ...] = ()):
    """Rename a physical-named frame to its logical column names
    (``keep`` names pass through untouched — scan-meta scratch
    columns). The inverse of :func:`_to_physical`."""
    from pyspark.sql import functions as F

    declared = meta["schema"]
    sel = [
        F.col(_physical_name(meta, n)).alias(n)
        for n, _ in _ddl_fields(declared)
    ]
    sel += [F.col(k) for k in keep]
    return df.select(*sel)


def _to_physical(df, meta: dict | None):
    """Rename a logical-named frame to physical column names for the
    parquet write — identity (the frame itself, no projection node)
    when the table has no mapping."""
    if not _mapping_of(meta):
        return df
    from pyspark.sql import functions as F

    return df.select(
        *[F.col(c).alias(_physical_name(meta, c)) for c in df.columns]
    )


def _physical_stats_cols(
    stats_cols: list[str] | None, meta: dict | None
) -> list[str] | None:
    """Translate logical stats column names to the physical names the
    written files (and so the committed per-file stats) carry."""
    if not stats_cols or not _mapping_of(meta):
        return stats_cols
    return [_physical_name(meta, c) for c in stats_cols]


def rename_column(table_dir: str, old: str, new: str) -> int:
    """Delta ``ALTER TABLE ... RENAME COLUMN`` under column mapping
    (name mode): a METADATA-ONLY commit — no data file is read, written,
    or copied, which is what makes renaming a column of a 100 TB table
    an O(KB) operation. The first rename/drop on a table initializes the
    mapping as identity over the declared schema (existing files'
    physical names ARE their logical names at that instant — Delta's
    upgrade rule); physical names are frozen forever after, so every
    file ever written stays readable through the mapping, and time
    travel to pre-rename versions reads under THAT version's own names
    (each snapshot's metadata is self-consistent).

    Refuses: tables without a declared schema (the mapping is keyed by
    it), unknown/colliding names, and columns referenced by a CHECK
    constraint (the predicate text would silently stop matching —
    Delta's own DEPENDENT_COLUMN refusal).

    Cite: Delta Lake column mapping (PROTOCOL.md "Column Mapping",
    public docs "Rename and drop columns with Delta Lake column
    mapping"); the reference's production sink names Delta as its table
    format (repo:BASELINE.json)."""
    tip = latest_version(table_dir)
    meta = dict(table_metadata(table_dir) or {})
    declared = meta.get("schema")
    if declared is None:
        raise ValueError(
            "rename_column requires a declared table schema (commit "
            "metadata first) — the column mapping is keyed by it"
        )
    fields = _ddl_fields(declared)
    names = [n for n, _ in fields]
    if old not in names:
        raise ValueError(f"cannot rename {old!r}: not a table column ({names})")
    if new in names:
        raise ValueError(f"cannot rename {old!r} to {new!r}: name already exists")
    _check_constraint_dependency(meta, old, "rename")
    mapping = dict(
        meta.get("column_mapping") or {n: n for n in names}
    )
    # a column added by post-mapping schema evolution may be absent from
    # the mapping (identity-default on the read/write path) — its frozen
    # physical name IS its logical name
    mapping[new] = mapping.pop(old, old)
    meta["column_mapping"] = mapping
    meta["schema"] = ", ".join(
        f"{new if n == old else n} {t}" for n, t in fields
    )
    return commit(
        table_dir,
        add=[],
        metadata=meta,
        expected_version=tip + 1,
        operation="RENAME COLUMN",
    )


def drop_column(table_dir: str, col: str) -> int:
    """Delta ``ALTER TABLE ... DROP COLUMN`` under column mapping: a
    METADATA-ONLY commit that removes the column from the declared
    schema and TOMBSTONES its physical name (``dropped_physical``) — no
    file is rewritten; the bytes stay on disk, invisible to every
    reader, and time travel before the drop still sees them. The
    tombstone is what keeps a later re-add of the same logical name
    from silently resurrecting the dropped bytes
    (:func:`_physical_name` raises unless the re-add maps to a fresh
    physical name). Same refusals as :func:`rename_column`, plus the
    last remaining column (a table must keep a schema)."""
    tip = latest_version(table_dir)
    meta = dict(table_metadata(table_dir) or {})
    declared = meta.get("schema")
    if declared is None:
        raise ValueError(
            "drop_column requires a declared table schema (commit "
            "metadata first) — the column mapping is keyed by it"
        )
    fields = _ddl_fields(declared)
    names = [n for n, _ in fields]
    if col not in names:
        raise ValueError(f"cannot drop {col!r}: not a table column ({names})")
    if len(names) == 1:
        raise ValueError("cannot drop the table's only column")
    _check_constraint_dependency(meta, col, "drop")
    mapping = dict(
        meta.get("column_mapping") or {n: n for n in names}
    )
    # identity-default for evolution-added columns, as in rename_column
    phys = mapping.pop(col, col)
    meta["column_mapping"] = mapping
    meta["dropped_physical"] = sorted(
        set(meta.get("dropped_physical") or ()) | {phys}
    )
    meta["schema"] = ", ".join(f"{n} {t}" for n, t in fields if n != col)
    return commit(
        table_dir,
        add=[],
        metadata=meta,
        expected_version=tip + 1,
        operation="DROP COLUMN",
    )


def _check_constraint_dependency(meta: dict, col: str, verb: str) -> None:
    """Refuse renaming/dropping a column a CHECK constraint references —
    the predicate text would silently stop matching rows (Delta fails
    the ALTER the same way). Word-boundary textual match: conservative
    (a same-named identifier inside a string literal also refuses),
    which errs loud, never silent."""
    import re

    pat = re.compile(rf"\b{re.escape(col)}\b")
    for name, pred in (meta.get("constraints") or {}).items():
        if pat.search(pred):
            raise ValueError(
                f"cannot {verb} column {col!r}: CHECK constraint "
                f"{name!r} ({pred}) references it — drop the constraint "
                "first"
            )


class ConstraintViolation(ValueError):
    """A validated write found rows violating a table CHECK constraint."""


class SchemaMismatch(ValueError):
    """A validated write's DataFrame schema differs from the table's."""


def validated_write(
    df: DataFrame,
    table_dir: str,
    stats_cols: list[str] | None = None,
    evolve: bool = False,
) -> list:
    """Schema-enforcing, constraint-checking :func:`write_files` — the
    Delta write path (schema enforcement + CHECK constraints, both
    public table features). Against the table's governing metadata:

    - **Schema enforcement**: the DataFrame's schema DDL must equal the
      declared schema exactly (names, order, types, containing no
      surprise columns — the guard that keeps a 1000-writer lake table
      from silently diverging). ``evolve=True`` widens instead: the
      caller acknowledges the change, and the NEW schema should be
      committed as metadata alongside the files (Delta's
      ``mergeSchema`` handshake).
    - **CHECK constraints**: every declared predicate is evaluated in
      ONE distributed aggregate over the batch (sum of violation
      flags, zero data re-read); any violation raises
      :class:`ConstraintViolation` naming the constraint and the
      violating row count — the files are never written, so nothing
      needs cleanup.

    Returns the add actions exactly like :func:`write_files`; the
    caller still commits them (validation is write-side, atomicity is
    the commit's).

    With declared constraints the frame is PERSISTED across the check
    and the write (the same fusion as the DML path's
    :func:`_write_files_checked`), so a constrained append evaluates its
    source plan once and the rows checked are the rows written — a
    non-deterministic or expensive source is not computed twice. Same
    caveat as the DML fusion: ``persist`` is a cache, not a barrier (see
    :func:`_write_files_checked`). Without constraints the write is
    exactly :func:`write_files` — no persist, no extra job."""
    meta = table_metadata(table_dir) or {}
    declared = meta.get("schema")
    if declared is not None and not evolve:
        got = df.schema.simpleString()
        want = df.sparkSession.createDataFrame([], declared).schema.simpleString()
        if got != want:
            raise SchemaMismatch(
                f"write schema {got} does not match the table's declared "
                f"schema {want}; pass evolve=True (and commit new "
                "metadata) to change the table's schema deliberately"
            )
    if not (meta.get("constraints") or {}):
        return write_files(
            _to_physical(df, meta),
            table_dir,
            stats_cols=_physical_stats_cols(stats_cols, meta),
        )
    df = df.persist()
    try:
        _enforce_constraints(df, meta)
        # under column mapping the write renames logical→physical ON TOP
        # of the cache — the written plan still reads the persisted frame
        return write_files(
            _to_physical(df, meta),
            table_dir,
            stats_cols=_physical_stats_cols(stats_cols, meta),
        )
    finally:
        df.unpersist()


def _enforce_constraints(df: DataFrame, meta: dict | None) -> None:
    """Evaluate every declared CHECK constraint against ``df`` in ONE
    distributed aggregate (sum of violation flags); raise
    :class:`ConstraintViolation` naming the constraint and the violating
    row count. Shared by :func:`validated_write`, the fused DML write
    path (:func:`_write_files_checked` — UPDATE/MERGE, scoped to
    modified rows over a persisted frame), and
    :func:`add_constraints`'s existing-data validation — Delta enforces
    CHECK constraints on every write path, so a declared ``price > 0``
    must refuse an UPDATE that drives prices negative exactly as it
    refuses a fresh write. A NULL predicate result counts as satisfied
    (SQL CHECK semantics)."""
    from pyspark.sql import functions as F

    constraints = (meta or {}).get("constraints") or {}
    if not constraints:
        return
    aggs = [
        F.sum(F.when(~F.expr(pred), 1).otherwise(0)).alias(name)
        for name, pred in constraints.items()
    ]
    row = df.agg(*aggs).collect()[0]
    for name in constraints:
        bad = row[name] or 0
        if bad > 0:
            raise ConstraintViolation(
                f"CHECK constraint '{name}' "
                f"({constraints[name]}) violated by {bad} row(s); "
                "write refused"
            )


def _write_files_checked(
    flagged: DataFrame,
    table_dir: str,
    meta: dict | None,
    stats_cols: list[str] | None,
) -> list:
    """Write a DML rewrite frame with fused CHECK-constraint enforcement
    (Delta enforces constraints on every write path — a violating DML is
    refused whole, nothing committed). ``flagged`` is the rewrite frame
    plus a boolean ``__txlog_modified`` column marking the rows the DML
    actually changed; the constraint aggregate scopes to those rows (a
    carried-along row cannot INTRODUCE a violation — legacy violations
    are :func:`add_constraints`'s job to keep out, Delta's own split).

    The frame is persisted across the check and the write, so the
    touched∪source input is SCANNED ONCE per DML instead of twice (the
    round-11 shape re-ran the full-outer join / rewrite scan for the
    check, and with a non-deterministic MERGE source the rows checked
    were not necessarily the rows written — the persisted frame is both
    the checked and the written data). Without declared constraints the
    write is exactly :func:`write_files` of the unflagged frame: no
    persist, no extra job, the r11 plan unchanged.

    CAVEAT — ``persist`` is a cache, not a barrier: a lost or evicted
    cached partition is RECOMPUTED from the source plan, so under
    executor loss a non-deterministic MERGE source could still produce
    written rows that differ from the rows the aggregate validated.
    Spark's reliable barriers (``localCheckpoint(eager=True)`` /
    ``checkpoint``) close that window at the cost of always
    materializing; callers with genuinely non-deterministic sources
    should checkpoint the source themselves before the DML — the common
    case (sources that are reads of immutable data) is exact under
    plain persist, which is why the default stays the cheap one."""
    constraints = (meta or {}).get("constraints") or {}
    if not constraints:
        return write_files(
            _to_physical(flagged.drop("__txlog_modified"), meta),
            table_dir,
            stats_cols=_physical_stats_cols(stats_cols, meta),
        )
    from pyspark.sql import functions as F

    flagged = flagged.persist()
    try:
        _enforce_constraints(
            flagged.where(F.col("__txlog_modified")), meta
        )
        return write_files(
            _to_physical(flagged.drop("__txlog_modified"), meta),
            table_dir,
            stats_cols=_physical_stats_cols(stats_cols, meta),
        )
    finally:
        flagged.unpersist()


def add_constraints(
    spark: SparkSession, table_dir: str, constraints: dict[str, str]
) -> int:
    """Delta ``ALTER TABLE ... ADD CONSTRAINT``: validate the EXISTING
    tip data against the new predicates (one distributed aggregate over
    the current snapshot — Delta's ADD CONSTRAINT does exactly this full
    validation scan), then commit the merged constraint set as table
    metadata under an ``expected_version`` guard (a writer landing
    between the validation and the commit could introduce a violation
    the scan never saw — the lost race re-raises as
    :class:`ConcurrentCommitError` and the caller re-runs).

    This is the declared-time half of the enforcement split: DML
    enforcement scopes to the rows a command actually modified, which is
    only sound because this entry point refuses to DECLARE a constraint
    over data that already violates it. A raw ``commit(metadata=...)``
    can still declare unvalidated constraints (the protocol layer stays
    policy-free), accepting that legacy violations then live outside any
    DML's responsibility."""
    tip = latest_version(table_dir)
    meta = dict(table_metadata(table_dir) or {})
    if tip >= 0 and snapshot_files(table_dir, tip):
        _enforce_constraints(
            read_version(spark, table_dir, tip), {"constraints": constraints}
        )
    merged = dict(meta.get("constraints") or {})
    merged.update(constraints)
    meta["constraints"] = merged
    return commit(
        table_dir,
        add=[],
        metadata=meta,
        expected_version=tip + 1,
        operation="ADD CONSTRAINT",
    )


def count_rows(table_dir: str, version: int | None = None) -> int | None:
    """Metadata-only ``COUNT(*)`` (Delta answers unfiltered counts from
    per-file ``numRecords`` in the log): sum the ``num_rows`` every
    stats-collecting writer recorded per file. Returns None — refusing,
    not guessing — if ANY live file lacks a recorded count (e.g. it was
    added by a stats-less writer); callers then fall back to a scan. A
    fresh table with no commits has no snapshot to count: also None
    (``version=None`` only; an explicit version still raises).
    O(actions) driver-side fold, zero data read."""
    if version is None and latest_version(table_dir) < 0:
        return None
    actions, _, _, _ = _resolve(table_dir, version)
    total = 0
    for a in actions:
        if not isinstance(a, dict) or "num_rows" not in a:
            return None
        dv = a.get("dv") or {}
        if dv and dv.get("cardinality") is None:
            return None  # a DV of unknown size makes the count unknowable
        # merge-on-read: the file's live count is rows minus its
        # deletion vector's cardinality (Delta nets numRecords the same)
        total += int(a["num_rows"]) - int(dv.get("cardinality") or 0)
    return total


def history(table_dir: str) -> list[dict]:
    """Delta ``DESCRIBE HISTORY`` twin: one audit row per committed
    version, oldest first — the recorded ``operation`` (falling back to
    an add/remove-shape classification for commits that predate the
    field), file counts, rows added (when every add action carries
    ``num_rows``; None otherwise — refusing, not guessing, same contract
    as :func:`count_rows`), the txn app id, and whether the commit
    changed table metadata. Pure driver-side log fold, O(commits),
    KB-sized JSON each — the log IS the audit trail, no data read.

    Reference parity: the reference's own sink is the Aiven S3
    connector writing JSONL (``/root/reference/connectors/s3-sink.json:10``);
    the Delta-parity justification is ``repo:BASELINE.json``'s approach
    line ("Structured Streaming + Kafka + Delta"), whose Delta sink
    exposes DESCRIBE HISTORY for exactly this "what changed the table,
    when" audit."""
    rows: list[dict] = []
    for v in range(latest_version(table_dir) + 1):
        with open(_commit_path(table_dir, v)) as f:
            payload = json.load(f)
        add = payload.get("add") or []
        remove = payload.get("remove") or []
        meta = payload.get("metadata")
        op = payload.get("operation")
        if op is None:  # legacy commits: classify by action shape
            if add and remove:
                op = "REWRITE"
            elif add:
                op = "WRITE"
            elif remove:
                op = "DELETE"
            elif meta is not None:
                op = "SET METADATA"
            else:
                op = "EMPTY"
        rows_added = None
        if add and all(isinstance(a, dict) and "num_rows" in a for a in add):
            rows_added = sum(int(a["num_rows"]) for a in add)
        rows.append(
            {
                "version": v,
                "operation": op,
                "n_add": len(add),
                "n_remove": len(remove),
                "rows_added": rows_added,
                "txn_app_id": (payload.get("txn") or {}).get("app_id"),
                "metadata_changed": meta is not None,
            }
        )
    return rows


def vacuum(
    table_dir: str,
    dry_run: bool = False,
    retention_versions: int = 0,
    _tmp_grace_seconds: float = 600.0,
    data_grace_seconds: float = 600.0,
) -> list[str]:
    """Delete data files referenced by NO retained snapshot and return
    their paths (Delta ``VACUUM``). ``retention_versions=N`` keeps every
    file live in ANY of the newest ``N+1`` snapshots
    (``tip-N .. tip``) — the version-granular twin of Delta's
    ``RETAIN n HOURS``, so concurrent readers of recent versions finish
    even while vacuum runs (pinned in ``tests/test_txlog.py``); the
    default ``0`` reclaims everything outside the tip.

    Copy-on-write rewrites (compaction, MERGE, deletes) strand their
    pre-images on disk for time travel; vacuum is the explicit,
    destructive end of that window. After it runs, reads of any RETAINED
    version are bit-identical (vacuum never touches their files) and
    time travel past the horizon fails loudly at read time — pinned in
    ``tests/test_txlog.py``. ``dry_run=True`` lists without deleting.
    The walk is metadata-only: O(files on disk) + O(retained actions),
    no data read.

    **Uncommitted-writer safety**: a concurrent writer's
    :func:`write_files` output sits on disk referenced by NO commit
    until its :func:`commit` lands. Files the log has NEVER referenced
    are therefore reclaimed only when older than ``data_grace_seconds``
    (default 10 min — ample for the write→commit gap): without the
    grace, vacuuming during a live write deletes files the writer is
    about to commit and the new tip is permanently unreadable — the same
    in-flight-transaction hazard behind Delta VACUUM's refusal of
    short retention windows. **The grace is a deadline, not a proof**:
    ``data_grace_seconds`` must exceed the longest expected write→commit
    gap on the cluster (a large distributed write, a stalled executor,
    writer/vacuum-host clock skew) — a writer slower than the grace can
    still lose its pending files and its upcoming tip with them. Delta
    defaults the equivalent window to 7 DAYS for exactly this reason;
    the 10-min default here suits the single-host test profile, so
    raise it for production fleets. To make breaches auditable, every
    reclaimed never-referenced file (old-but-uncommitted — the only
    class the hazard applies to) is logged at WARNING with its age,
    separately from stranded pre-images, which are the normal,
    log-governed case. Files that SOME commit did reference
    (stranded pre-images of rewrites) are governed purely by
    ``retention_versions`` — age-irrelevant, reclaimed immediately when
    outside the retained window, exactly as before.

    Also sweeps ``*.tmp`` files stranded in ``_txlog/`` by a writer that
    crashed between publishing and unlinking its private temp file
    (harmless to readers — the log listing only folds ``*.json`` — but
    they accumulate). Temp files younger than ``_tmp_grace_seconds``
    are kept: an IN-FLIGHT committer holds its tmp only for the
    instants between fsync and ``os.link``, so the grace window makes
    sweeping safe against live writers. Swept tmp files are NOT part of
    the return value — the returned list means reclaimed DATA files
    only, so reclaim accounting stays byte-meaningful.

    Deletion-vector sidecars are governed identically (they are row
    data: deleted positions): a sidecar DIR referenced by a retained
    action stays, one referenced only by reclaimed versions is swept
    with them (its part files appear in the returned list), and a
    never-referenced young sidecar gets the same in-flight grace —
    :func:`delete_where` writes the sidecar before its commit lands.
    """
    import time as _time

    now = _time.time()
    tip = latest_version(table_dir)
    live: set[str] = set()
    live_dv: set[str] = set()
    for v in range(max(0, tip - max(0, retention_versions)), tip + 1):
        acts = _resolve(table_dir, v)[0]
        live.update(os.path.abspath(_action_path(a)) for a in acts)
        live_dv.update(
            os.path.abspath(d["path"]) for d in _dv_map(acts).values()
        )
    # every path ANY commit ever added: a data file absent from this set
    # was never committed — either garbage from a crashed writer (old)
    # or an IN-FLIGHT writer's pending output (young, protected below).
    # Deletion-vector sidecar DIRS are tracked the same way: a sidecar is
    # row data (deleted positions) whose lifecycle follows its actions.
    ever_referenced: set[str] = set()
    ever_dv: set[str] = set()
    for v in range(tip + 1):
        with open(_commit_path(table_dir, v)) as f:
            adds = json.load(f).get("add") or ()
        ever_referenced.update(
            os.path.abspath(_action_path(a)) for a in adds
        )
        ever_dv.update(
            os.path.abspath(d["path"]) for d in _dv_map(adds).values()
        )
    victims = []
    for dirpath, _, files in os.walk(os.path.join(table_dir, "data")):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            p = os.path.abspath(os.path.join(dirpath, f))
            if p in live:
                continue
            if p not in ever_referenced:
                try:
                    age = now - os.stat(p).st_mtime
                except FileNotFoundError:
                    continue  # vanished concurrently: nothing to reclaim
                if age <= data_grace_seconds:
                    continue  # likely an in-flight writer's pending file
                # old-but-uncommitted: the one class the in-flight-writer
                # hazard applies to — flag it so operators can audit
                # whether data_grace_seconds is shorter than real writes
                logging.getLogger(__name__).warning(
                    "vacuum %s never-committed file %s (age %.0fs > "
                    "data_grace_seconds=%.0fs); if a live writer is "
                    "slower than the grace, raise data_grace_seconds",
                    "would reclaim (dry run)" if dry_run else "reclaiming",
                    p,
                    age,
                    data_grace_seconds,
                )
            victims.append(p)
    # deletion-vector sidecars: the retention unit is the sidecar DIR
    # (one descriptor path = one spark write: part files + _SUCCESS
    # markers), removed WHOLE so a later restore's existence probe sees
    # the truth — its parquet part files join the returned victims
    dv_rm_dirs: list[str] = []
    dv_root = os.path.join(table_dir, "dv")
    if os.path.isdir(dv_root):
        for entry in sorted(os.listdir(dv_root)):
            d = os.path.abspath(os.path.join(dv_root, entry))
            if not os.path.isdir(d) or d in live_dv:
                continue
            if d not in ever_dv:
                try:
                    age = now - os.stat(d).st_mtime
                except FileNotFoundError:
                    continue
                if age <= data_grace_seconds:
                    continue  # an in-flight DELETE's pending sidecar
                logging.getLogger(__name__).warning(
                    "vacuum %s never-committed deletion-vector sidecar %s "
                    "(age %.0fs > data_grace_seconds=%.0fs)",
                    "would reclaim (dry run)" if dry_run else "reclaiming",
                    d,
                    age,
                    data_grace_seconds,
                )
            dv_rm_dirs.append(d)
            for dp, _, fs in os.walk(d):
                victims.extend(
                    os.path.abspath(os.path.join(dp, f))
                    for f in fs
                    if f.endswith(".parquet")
                )
    ldir = _log_dir(table_dir)
    tmp_sweeps: list[str] = []
    if os.path.isdir(ldir):
        for f in os.listdir(ldir):
            if not f.endswith(".tmp"):
                continue
            p = os.path.abspath(os.path.join(ldir, f))
            with contextlib.suppress(FileNotFoundError):
                if now - os.stat(p).st_mtime > _tmp_grace_seconds:
                    tmp_sweeps.append(p)
    if not dry_run:
        import shutil

        for p in victims + tmp_sweeps:
            with contextlib.suppress(FileNotFoundError, IsADirectoryError):
                os.remove(p)
        for d in dv_rm_dirs:
            shutil.rmtree(d, ignore_errors=True)
    return sorted(victims)


def last_txn(table_dir: str, app_id: str) -> int | None:
    """Highest ``batch_id`` committed under ``app_id``, or None — the
    foreachBatch idempotence check (skip when ``batch_id <= last_txn``)."""
    if latest_version(table_dir) < 0:
        return None
    _, txns, _, _ = _resolve(table_dir, None)
    b = txns.get(app_id)
    return int(b) if b is not None else None


def table_changes(
    spark: SparkSession,
    table_dir: str,
    start_version: int | None = None,
    end_version: int | None = None,
    key: str = "id",
    starting_timestamp=None,
    ending_timestamp=None,
) -> DataFrame:
    """Per-commit change-data rows for versions ``start..end`` — the
    Delta ``table_changes`` (Change Data Feed) read, reconstructed from
    the commit metadata the DML entry points already leave behind:
    every copy-on-write commit names exactly WHICH files entered
    (``add``) and left (``remove``) the snapshot, and its stamped
    ``operation`` says what the writer meant. Emits one row per changed
    row image with ``_change_type`` in ``insert`` / ``delete`` /
    ``update_preimage`` / ``update_postimage``, plus the commit's
    ``_commit_version`` and stamped ``_operation`` (underscore-prefixed
    like Delta's own CDF meta columns, keeping the feed out of the user
    namespace; a table whose data already uses a reserved meta/scratch
    name raises at plan build instead of silently colliding).

    Per version the feed is a key-joined diff of the REMOVED files (the
    pre-image side) against the ADDED files (the post-image side), both
    read under the log-governed schema:

    - add-only commit (append / initial WRITE): every added row is an
      ``insert`` — no diff, no join;
    - rewrite commit: full-outer join on ``key``; a key only in the
      post side is an ``insert``, only in the pre side a ``delete``,
      in both with a changed image an ``update_preimage`` +
      ``update_postimage`` pair, and in both with an IDENTICAL image an
      unchanged copy the rewrite carried along (UPDATE/DELETE rewrite
      whole touched files) — dropped, it is not a change.

    This is the read-side reconstruction Delta enables with
    ``delta.enableChangeDataFeed`` write-side tracking; here the
    copy-on-write remove/add pairs carry enough structure to rebuild
    the same rows AFTER the fact, because rewrites are file-bounded
    (only touched files move through a commit). Deletion-vector commits
    diff the same way — each side reads under ITS version's DV state
    (one incremental action fold across the range), so a DV DELETE
    feeds exactly the newly-deleted rows. Cost per version is
    O(churned files), never O(table): at 100 TB, reading a day of
    changes off a range-clustered table scans only the files its
    commits actually rewrote, and each per-version diff shuffles only
    those rows on the key. Versions stay independent — Spark unions
    their per-version plans, so a multi-version feed parallelizes
    across commits as well as within them.

    ``key`` must UNIQUELY identify rows within every DIFFED (rewrite)
    commit the way the table's DML used it (the same contract
    :func:`merge_into` places on its ``key``); a duplicated non-NULL key
    on either side of a diffed commit would cross-product through the
    full-outer join into a silently wrong feed, so the read FAILS LOUD
    instead — the guard is FUSED INTO THE RETURNED PLAN: each diff side
    carries a per-key window count (the window's hash partitioning on
    ``key`` is exactly the full-outer join's requirement, so the
    exchange is shared — no extra scan, no extra shuffle), and an
    ``assert_true`` filter over the joined rows raises on first
    evaluation of a duplicated key. Building the feed therefore runs NO
    job (the plan stays lazy); the guard fires when the feed is
    EVALUATED — which is exact for any evaluation that touches the
    offending version's rows (a duplicated side is non-empty by
    definition, and the filter sits before the unchanged-copy drop); a
    deliberately partial evaluation (``limit(1)`` satisfied by another
    version) can finish without reaching it, the inherent trade of any
    lazy validation. NULL keys are exempt from the guard
    because NULL never equi-joins: a NULL-key row's pre and post images
    can never pair, so a rewrite that carries one along (even UNCHANGED)
    emits a faithful-but-unpaired ``delete`` + ``insert`` instead of an
    update pair or a drop — net-equivalent to any downstream applier,
    just not minimal (pinned in ``tests/test_txlog.py``).

    A range containing only metadata commits returns an EMPTY feed in
    the end-version schema (Delta's ``table_changes`` contract — pollers
    distinguish "no changes" from a bad call by row count, not by
    catching errors); only a range outside the log raises.

    The range can be given on the TIMESTAMP axis instead (Delta pairs
    every CDF version argument with a timestamp form):
    ``starting_timestamp`` resolves to the FIRST version committed at
    or after it (raising when it lies past the tip — no changes exist
    there) and ``ending_timestamp`` to the LAST version committed at or
    before it, both through :func:`version_at_timestamp`; each axis is
    mutually exclusive with its version twin.

    Reference parity: the reference's downstream consumers
    read per-operation change rows off the wire log
    (``/root/reference/README.md:86-125``); this is the same feed
    recovered from the TABLE's own history, no wire log needed."""
    from pyspark.sql import functions as F

    ts_stamps = (
        commit_timestamps(table_dir)
        if starting_timestamp is not None or ending_timestamp is not None
        else None
    )
    if starting_timestamp is not None:
        if start_version is not None:
            raise ValueError(
                "table_changes: pass start_version= or "
                "starting_timestamp=, not both"
            )
        start_version = version_at_timestamp(
            table_dir, starting_timestamp, mode="at_or_after", stamps=ts_stamps
        )
    if start_version is None:
        raise ValueError(
            "table_changes: a range start is required — start_version= "
            "or starting_timestamp="
        )
    if ending_timestamp is not None:
        if end_version is not None:
            raise ValueError(
                "table_changes: pass end_version= or ending_timestamp=, "
                "not both"
            )
        end_version = version_at_timestamp(
            table_dir, ending_timestamp, stamps=ts_stamps
        )
    tip = latest_version(table_dir)
    end = tip if end_version is None else end_version
    if start_version < 0 or end > tip or start_version > end:
        raise ValueError(
            f"table_changes range [{start_version}, {end}] outside the "
            f"log's committed range [0, {tip}]"
        )
    # one reader, resolved ONCE at the END version's log-governed schema
    # (Delta CDF semantics: the feed is served in the reading snapshot's
    # schema — files written pre-evolution null-fill the new columns), so
    # every per-version frame has identical columns for the final union
    # and the driver-side log fold stays O(range), not O(range × prefix)
    _, _, end_meta, _ = _resolve(table_dir, end)
    declared = (end_meta or {}).get("schema")
    end_mapping = _mapping_of(end_meta)
    reader = (
        spark.read.schema(
            _physical_ddl(declared, end_meta) if end_mapping else declared
        )
        if declared is not None
        else spark.read
    )

    def _cdf_scan(files_, dv_):
        """One side's DV-aware scan, projected to the END version's
        LOGICAL names under column mapping (the same rule as the
        schema: the feed is served in the reading snapshot's shape —
        physical names are frozen, so files from every vintage in the
        range read uniformly)."""
        s = _scan_files_with_dvs(spark, files_, dv_, reader)
        return _project_logical(s, end_meta) if end_mapping else s

    commits: list[dict] = []
    for v in range(start_version, end + 1):
        with open(_commit_path(table_dir, v)) as f:
            commits.append(json.load(f))
    # the feed's meta columns and join-scratch flags live in the Delta-style
    # underscore namespace; a table whose DATA already uses one would
    # silently corrupt classification (withColumn replaces) or duplicate an
    # output name — refuse up front. With a declared schema the column set
    # IS the declaration (no file opened); without one, probe EVERY file
    # the range's commits add or remove (footer-only pyarrow reads,
    # bounded by the range's churn — the same files the feed scans
    # anyway). One tip file is not enough when heterogeneous-schema files
    # entered the log without metadata, and neither is one file per side:
    # a reserved name can hide in any file of a multi-file commit
    reserved = {
        "_change_type", "_commit_version", "_operation",
        "_b_present", "_a_present", "_b_dupn", "_a_dupn",
    }
    if declared is not None:
        from pyspark.sql.types import StructType

        data_columns = set(StructType.fromDDL(declared).fieldNames())
    else:
        import pyarrow.parquet as _pq

        data_columns = set()
        probe_paths = {
            _action_path(a)
            for payload in commits
            for acts in (payload.get("add") or (), payload.get("remove") or ())
            for a in acts
        }
        for p in sorted(probe_paths):
            data_columns.update(_pq.read_schema(p).names)
    clash = reserved & data_columns
    if clash:
        raise ValueError(
            f"table_changes reserves column names {sorted(clash)}; "
            "the table's data already uses them — rename before "
            "reading the feed"
        )
    from pyspark.sql.window import Window

    per_version: list[DataFrame] = []
    # deletion-vector awareness: each side reads under ITS version's DV
    # state (pre = before the commit, post = after), maintained by ONE
    # incremental action fold across the range — a DV commit (same file
    # re-referenced with a bigger vector) therefore feeds exactly the
    # newly-deleted rows as `delete`s, and a rewrite of a DV'd file
    # diffs only its LIVE pre-image rows
    state: dict[str, dict | str] = {
        os.path.abspath(_action_path(a)): a
        for a in (
            _resolve(table_dir, start_version - 1)[0]
            if start_version > 0
            else ()
        )
    }
    for payload in commits:
        v = payload["version"]
        add_actions = payload.get("add") or ()
        adds = [_action_path(a) for a in add_actions]
        removes = [_action_path(a) for a in payload.get("remove") or ()]
        op = payload.get("operation")
        pre_dv = _dv_map(state.values())
        for p in removes:
            state.pop(os.path.abspath(p), None)
        for a in add_actions:
            state[os.path.abspath(_action_path(a))] = a
        post_dv = _dv_map(state.values())
        meta = (
            F.lit(v).alias("_commit_version"),
            F.lit(op).alias("_operation"),
        )
        if not removes:
            if not adds:
                continue  # metadata-only commit: no row changes
            per_version.append(
                _cdf_scan(adds, post_dv).select(
                    "*", F.lit("insert").alias("_change_type"), *meta
                )
            )
            continue
        # side-presence flags, NOT key nullness: a NULL-key row never
        # equi-joins (NULL != NULL), and inferring its side from b.key /
        # a.key would misread its delete as an all-null insert. Each
        # side also carries its per-key window COUNT — the lazy, in-plan
        # duplicate-key guard (see docstring): the window hash-partitions
        # on exactly the join key, so the full-outer join reuses its
        # exchange and the guard costs no extra scan or shuffle.
        dup_w = Window.partitionBy(key)
        pre = (
            _cdf_scan(removes, pre_dv)
            .withColumn("_b_present", F.lit(True))
            .withColumn("_b_dupn", F.count(F.lit(1)).over(dup_w))
            .alias("b")
        )
        post = (
            (
                _cdf_scan(adds, post_dv)
                if adds
                else _cdf_scan(removes, pre_dv).limit(0)
            )
            .withColumn("_a_present", F.lit(True))
            .withColumn("_a_dupn", F.count(F.lit(1)).over(dup_w))
            .alias("a")
        )
        scratch = {"_b_present", "_b_dupn"}
        cols = [f.name for f in pre.schema.fields if f.name not in scratch]
        data_cols = [c for c in cols if c != key]
        img_b = F.struct(*[F.col(f"b.{c}").alias(c) for c in cols])
        img_a = F.struct(*[F.col(f"a.{c}").alias(c) for c in cols])
        differ = functools.reduce(
            lambda x, y: x | y,
            [
                ~F.col(f"b.{c}").eqNullSafe(F.col(f"a.{c}"))
                for c in data_cols
            ],
            F.lit(False),
        )
        entry = lambda t, img: F.struct(  # noqa: E731
            F.lit(t).alias("t"), img.alias("img")
        )
        entries = (
            F.when(
                F.col("_b_present").isNull(),
                F.array(entry("insert", img_a)),
            )
            .when(
                F.col("_a_present").isNull(),
                F.array(entry("delete", img_b)),
            )
            .when(
                differ,
                F.array(
                    entry("update_preimage", img_b),
                    entry("update_postimage", img_a),
                ),
            )
            .otherwise(F.array())  # unchanged copy in a rewritten file
        )
        # the fail-loud duplicate-key guard, fused into the plan: a
        # duplicated non-NULL key on either side raises on FIRST
        # EVALUATION of its joined rows (the filter sits BEFORE the
        # unchanged-copy drop, so even a dup whose change rows would all
        # be dropped still trips it). NULL keys and absent sides are
        # exempt (their bad-flags resolve False through 3-valued AND).
        bad_b = F.col(f"b.{key}").isNotNull() & (F.col("_b_dupn") > 1)
        bad_a = F.col(f"a.{key}").isNotNull() & (F.col("_a_dupn") > 1)
        dup_msg = F.concat(
            F.lit(
                f"table_changes key {key!r} is duplicated within commit "
                f"{v} ("
            ),
            F.when(F.coalesce(bad_b, F.lit(False)), F.lit("pre"))
            .otherwise(F.lit("post")),
            F.lit(" side, e.g. value "),
            F.coalesce(
                F.col(f"b.{key}").cast("string"),
                F.col(f"a.{key}").cast("string"),
            ),
            F.lit(
                "): the per-version diff would cross-product into a "
                "wrong feed — diff on a key that uniquely identifies "
                "rows the way the table's DML did"
            ),
        )
        dup_ok = ~F.coalesce(bad_b | bad_a, F.lit(False))
        joined = pre.join(
            post, F.col(f"b.{key}") == F.col(f"a.{key}"), "full_outer"
        ).where(F.assert_true(dup_ok, dup_msg).isNull())
        per_version.append(
            joined.select(F.explode(entries).alias("e")).select(
                "e.img.*", F.col("e.t").alias("_change_type"), *meta
            )
        )
    if not per_version:
        # metadata-only range: an EMPTY feed in the end-version schema
        # (Delta contract — "no changes" is a row count, not an error)
        files = snapshot_files(table_dir, end) or snapshot_files(table_dir)
        if files:
            base = _cdf_scan([files[0]], {})
        elif declared is not None:
            base = spark.createDataFrame([], declared)
        else:
            raise ValueError(
                f"table_changes range [{start_version}, {end}] of "
                f"{table_dir} has no row changes, and the table has no "
                "data files or declared schema to type an empty feed with"
            )
        return base.limit(0).select(
            "*",
            F.lit("insert").alias("_change_type"),
            F.lit(0).alias("_commit_version"),
            F.lit("WRITE").alias("_operation"),
        )
    return functools.reduce(lambda x, y: x.unionByName(y), per_version)
