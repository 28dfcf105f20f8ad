"""Streaming SOURCE over a transaction-log table — Delta's streaming
source semantics (public behavior: a Delta table used as
``readStream.format("delta")``) rebuilt over :mod:`sources.txlog` as a
Spark 4 Python streaming DataSource.

The design point that makes this different from the file-listing source
(``python_datasource.CdcNdjsonStreamReader``): the LOG provides a total
order, so the stream offset is just the highest consumed log version —
one integer, O(1), instead of a content-addressed file list that grows
with segment count. Everything exactly-once falls out of log
immutability:

- A micro-batch is the set of files ADDED by commits
  ``(start.version .. end.version]``; ``partitions(start, end)`` plans
  one ``InputPartition`` per such file from log metadata alone.
- Replanning a committed range is bit-identical — commits and data
  files are both immutable once published, so checkpoint recovery
  re-reads exactly the same rows (pinned in ``tests/test_txlog.py``).
- The source is APPEND-ONLY by default, like Delta's streaming source:
  a commit carrying ``remove`` actions in the consumed range raises
  instead of silently emitting rewritten rows twice or dropping
  retractions the sink never sees. ``.option("skipChangeCommits",
  "true")`` opts into Delta's documented escape hatch — data-changing
  commits are skipped WHOLE (their adds carry re-images of
  already-emitted rows) and the stream continues over later appends.
- ``.option("readChangeFeed", "true")`` is the third stance (Delta's
  streaming CDF): data-changing commits are FORWARDED as change rows —
  each consumed version feeds its :func:`txlog.table_changes`-shaped
  ``insert`` / ``delete`` / ``update_preimage`` / ``update_postimage``
  rows with ``_commit_version`` / ``_operation`` meta columns, appends
  included (pure inserts). ``.option("startingVersion", N)`` starts a
  FRESH checkpoint at commit ``N`` (both modes);
  ``.option("startingTimestamp", ts)`` is its timestamp twin — the
  first version committed at or after ``ts``
  (:func:`txlog.version_at_timestamp`; a ``ts`` past the tip starts
  AFTER it, waiting for future commits — Delta's streaming behavior),
  mutually exclusive with ``startingVersion``. ``.option("cdfKey",
  col)`` names the diff key (default ``id``), with the same
  fail-loud duplicate-key guard as the batch reader. Deletion-vector
  commits feed exactly their newly-deleted rows — each side of the
  per-commit diff applies ITS version's DV state.
- ``.option("maxFilesPerTrigger", N)`` is admission control (Delta's
  backpressure knob of the same name): ``latestOffset`` stops
  advancing at the version boundary where the cumulative added-file
  count of the pending commits reaches ``N``, so a stream that falls
  behind catches up in bounded micro-batches instead of one huge one.
  ``.option("maxBytesPerTrigger", B)`` is its byte-budget twin (Delta
  pairs the two; ``B`` is an integer or a ``k``/``m``/``g``-suffixed
  string) — the right knob when file SIZES vary: a count cap admits 10
  small files or 10 huge ones alike, a byte cap holds the micro-batch's
  input volume (and so executor memory) steady. Sizes come from each
  add action's own ``size`` field (the log is the source of truth —
  pure KB-JSON walk) with a driver-side ``stat`` fallback for
  size-less legacy actions. Both set = both apply, whichever binds
  first. Offsets stay VERSION-aligned (a single commit larger than a
  cap still feeds whole — the at-least-one-unit progress guarantee).
  BEST-EFFORT like Delta's own knob: the Python DataSource API passes
  no start offset to ``latestOffset``, so the cap engages once the run
  has planned its first micro-batch — the first trigger of a fresh run
  or clean restart is uncapped (a restart that replays an uncommitted
  batch re-binds immediately; Delta likewise ignores the cap under
  Trigger.Once/AvailableNow, where the engine captures the end offset
  before the source sees a batch).

Scale: the reader is the PARTITION-BASED ``DataSourceStreamReader`` —
``partitions(start, end)`` plans one ``InputPartition`` per file added in
the consumed commit range (driver-side, metadata only), and ``read``
executes on EXECUTORS, one pyarrow parquet read per partition. Rows never
flow through the driver (the ``SimpleDataSourceStreamReader`` alternative
routes every row driver-side — measured 55 s at 100× on the same gate
query vs 35 s partitioned, and the residual is the gate's own 3× slice
writes, not the read). The whole micro-batch therefore scales like
any distributed parquet scan, while the offset stays one integer.
In CDF mode an append version still plans one partition per added file;
a data-changing version plans ONE partition carrying its remove/add
sides — the diff needs that commit's churn co-located, and a
copy-on-write/DV commit's churn is delta-sized by construction (the
same O(churned files) unit as the batch ``table_changes``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import IntegerType, StringType, StructType

from change_data_capture_spark.sources import txlog

#: CDF meta columns appended to the table schema in readChangeFeed mode
#: (same names/types the batch ``txlog.table_changes`` emits)
_CDF_META_FIELDS = (
    ("_change_type", StringType()),
    ("_commit_version", IntegerType()),
    ("_operation", StringType()),
)


def _commit_payload(table_dir: str, v: int) -> dict:
    # txlog owns the commit-path format; never re-derive it here
    with open(txlog._commit_path(table_dir, v)) as f:
        return json.load(f)


def _added_files(
    table_dir: str,
    from_v: int,
    to_v: int,
    skip_change_commits: bool = False,
) -> list[str]:
    """Files added by commits ``(from_v .. to_v]``, in commit order.
    Raises on any ``remove`` action in the range — this source is
    append-only (Delta streaming-source contract: data-changing commits
    are an error unless the reader opts into skipping them). With
    ``skip_change_commits`` (Delta's ``skipChangeCommits``) a
    data-changing commit is skipped WHOLE — its adds too, because a
    rewrite's added files carry updated images of rows the stream
    already emitted (forwarding them double-counts; forwarding only
    their changed rows is the CDF reader's job, not this one's)."""
    out: list[str] = []
    for v in range(from_v + 1, to_v + 1):
        c = _commit_payload(table_dir, v)
        # an add action CARRYING a deletion vector is not a pure append
        # either: it re-references a file whose rows the stream already
        # emitted (a RESTORE re-adding a DV'd action is the add-only
        # case) — reading it raw would re-emit rows, reading it DV'd
        # would still double-count the survivors
        dv_adds = any(
            isinstance(a, dict) and a.get("dv") for a in c["add"]
        )
        if c["remove"] or dv_adds:
            if skip_change_commits:
                continue
            raise ValueError(
                f"txlog stream source: commit {v} rewrites data "
                "(remove actions or deletion-vector re-references "
                "present); the streaming source is "
                "append-only — compact/merge on a downstream copy, "
                "restart the stream from the rewritten snapshot, opt "
                "into .option('skipChangeCommits', 'true'), or read "
                "the change rows with .option('readChangeFeed', 'true')"
            )
        out.extend(txlog._action_path(a) for a in c["add"])
    return out


class _AddedFile(InputPartition):
    """One data file added by a consumed commit — the unit of executor
    parallelism for a micro-batch."""

    def __init__(self, path: str):
        self.path = path


class _CdfInsert(InputPartition):
    """CDF mode: one file added by an append commit — feeds pure
    ``insert`` rows (``dv_dir`` set when the action carries a deletion
    vector, e.g. a restored DV action re-entering as an add)."""

    def __init__(self, path: str, version: int, op: str | None, dv_dir: str | None):
        self.path = path
        self.version = version
        self.op = op
        self.dv_dir = dv_dir


class _CdfDiff(InputPartition):
    """CDF mode: one data-changing commit — ``pre``/``post`` are
    ``(path, dv_dir | None)`` pairs (the remove side under the PREVIOUS
    version's DV state, the add side under this version's), diffed on
    ``key`` executor-side."""

    def __init__(
        self,
        version: int,
        op: str | None,
        key: str,
        pre: list[tuple[str, str | None]],
        post: list[tuple[str, str | None]],
    ):
        self.version = version
        self.op = op
        self.key = key
        self.pre = pre
        self.post = post


def _check_not_vacuumed(paths, start_v: int, end_v: int) -> None:
    """Pinned boundary contract: a micro-batch whose commits reference
    data files (or DV sidecars) that :func:`txlog.vacuum` has already
    reclaimed fails AT PLANNING with a guided error, not as an executor
    FileNotFound stack trace — the stream's start (or its lag) is behind
    the table's retention horizon, and the fix is a retained start or a
    longer retention, which the message says. Driver-side, one ``stat``
    per planned file — bounded by the batch's churn, metadata-scale at
    any table size."""
    missing = sorted({p for p in paths if not os.path.exists(p)})
    if missing:
        raise ValueError(
            f"cdc_txlog source: {len(missing)} file(s) referenced by "
            f"commits ({start_v}, {end_v}] no longer exist (vacuumed "
            f"past this stream's position), e.g. {missing[0]} — restart "
            "from a retained version (startingVersion) or raise vacuum "
            "retention_versions"
        )


def _parse_bytes(v) -> int:
    """A byte budget the way Delta spells it: a plain integer, or a
    ``k``/``m``/``g`` suffixed string (``"10g"``). Garbage raises — a
    typo'd cap must never silently become an uncapped stream."""
    s = str(v).strip().lower()
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}.get(s[-1:], 1)
    digits = s[:-1] if mult != 1 else s
    try:
        return int(digits) * mult
    except ValueError:
        raise ValueError(
            f"cdc_txlog source: maxBytesPerTrigger must be an integer "
            f"byte count or a k/m/g-suffixed string, got {v!r}"
        ) from None


def _add_size(action) -> int:
    """Byte size of one add action's data file, for byte-budget
    admission: the action's own ``size`` field when the writer recorded
    it (:func:`txlog.write_files` with stats — Delta's required
    ``add.size``, making the admission walk pure KB-JSON), else one
    driver-side ``stat`` (bare-path legacy actions; same metadata cost
    class as the vacuumed-horizon check). A vacuumed file reads as 0 —
    admission must keep advancing so planning can raise its guided
    error rather than the walk dying on a stat."""
    if isinstance(action, dict) and action.get("size") is not None:
        return int(action["size"])
    p = txlog._action_path(action)
    try:
        return os.path.getsize(p)
    except OSError:
        return 0


def _opt(options: dict, name: str, default=None):
    """Spark SQL option keys are case-insensitive and may arrive
    lowercased through the DataSource API — accept either spelling."""
    return options.get(name.lower(), options.get(name, default))


def _file_uri(path: str) -> str:
    """The ``_metadata.file_path`` URI spark records for a local file —
    the sidecar's ``file`` key. Spark URL-encodes special characters in
    ``_metadata.file_path``; this reconstruction does not, so a table
    path needing encoding would diverge — :func:`_apply_dv` detects that
    (an attached vector with zero positions for its file) and fails loud
    rather than silently re-emitting deleted rows."""
    return "file:" + os.path.abspath(path)


def _read_data_file(path: str, fields) -> "pyarrow.Table":  # noqa: F821
    """One columnar read of a data file projected to the declared
    ``(name, arrow type)`` fields — columns a pre-evolution file lacks
    are null-filled (the log-governed schema rule, arrow-side)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    avail = set(pq.read_schema(path).names)
    present = [n for n, _ in fields if n in avail]
    tbl = pq.read_table(path, columns=present)
    cols = []
    for n, t in fields:
        if n in avail:
            cols.append(tbl.column(n).cast(t))
        else:
            cols.append(pa.nulls(len(tbl), t))
    return pa.table(dict(zip([n for n, _ in fields], cols)))


def _apply_dv(tbl, path: str, dv_dir: str | None):
    """Drop a data file's deletion-vector positions from its arrow
    table — the executor-side twin of the broadcast anti-join in
    :func:`txlog._scan_files_with_dvs` (row index IS arrow row order:
    ``_read_data_file`` reads the whole file in file order)."""
    if not dv_dir:
        return tbl
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    dv = pq.read_table(dv_dir, columns=["file", "pos"])
    pos = dv.filter(pc.equal(dv.column("file"), _file_uri(path)))
    positions = pos.column("pos").to_pylist()
    if not positions:
        # a dv descriptor is only ever attached to a file the sidecar
        # holds >= 1 position for (delete_where routes a file to the DV
        # class only when it has matching rows, and every kept action
        # unions its own prior positions) — zero hits therefore means
        # _file_uri's reconstruction diverged from the URI Spark recorded
        # at DELETE time (e.g. a table path with characters
        # _metadata.file_path URL-encodes). Silently returning the table
        # would RE-EMIT deleted rows into the stream; fail loud instead.
        raise ValueError(
            f"deletion-vector sidecar {dv_dir} holds no positions for "
            f"{_file_uri(path)!r}: the reconstructed file URI does not "
            "match what Spark recorded (URL-encoded table path?) — "
            "refusing to stream rows a deletion vector may have removed"
        )
    mask = np.ones(len(tbl), dtype=bool)
    mask[positions] = False
    return tbl.filter(pa.array(mask))


def _read_side(parts, fields):
    """Concatenate the DV-applied reads of one diff side."""
    import pyarrow as pa

    tables = [_apply_dv(_read_data_file(p, fields), p, dv) for p, dv in parts]
    if not tables:
        return pa.table(
            {n: pa.nulls(0, t) for n, t in fields}
        )
    return pa.concat_tables(tables)


def _guard_keys(tbl, key: str, version: int, side: str) -> None:
    """The batch reader's duplicate-key discipline, arrow-side: a
    duplicated non-NULL key on either side of a diffed commit would
    cross-product into a wrong feed — fail loud. NULL keys are exempt
    (they never join; handled as unpaired delete/insert)."""
    import pyarrow.compute as pc

    k = tbl.column(key).drop_null()
    if len(k) != len(pc.unique(k)):
        raise ValueError(
            f"readChangeFeed: key {key!r} is duplicated within commit "
            f"{version} ({side} side) — the per-version diff would "
            "cross-product into a wrong feed; set .option('cdfKey', ...) "
            "to a column that uniquely identifies rows"
        )


def _with_meta(tbl, fields, change_type: str, version: int, op: str | None):
    """Append the CDF meta columns to a data table."""
    import pyarrow as pa

    n = len(tbl)
    out = {name: tbl.column(name) for name, _ in fields}
    out["_change_type"] = pa.array([change_type] * n, pa.string())
    out["_commit_version"] = pa.array([version] * n, pa.int32())
    out["_operation"] = pa.array([op] * n, pa.string())
    return pa.table(out)


def _eq_null_safe(a, b):
    """Column-wise equality matching Spark's ``eqNullSafe`` binary
    comparison semantics, which the batch ``table_changes`` uses for the
    unchanged-copy drop: NULL <=> NULL is TRUE, NaN <=> NaN is TRUE
    (Spark's comparator, unlike IEEE), nested types compare
    structurally. Arrow's ``pc.equal`` gives IEEE NaN semantics and has
    no nested-type kernel, so floats get an explicit both-NaN term and
    nested columns fall back to a per-row python structural compare
    (bounded by the commit's churn — the unit this partition already
    co-locates)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = a.type if hasattr(a, "type") else a.chunk(0).type
    both_null = pc.and_(pc.is_null(a), pc.is_null(b))
    if pa.types.is_floating(t):
        both_nan = pc.and_kleene(
            pc.coalesce(pc.is_nan(a), pa.scalar(False)),
            pc.coalesce(pc.is_nan(b), pa.scalar(False)),
        )
        return pc.or_(
            pc.or_(both_null, both_nan),
            pc.coalesce(pc.equal(a, b), pa.scalar(False)),
        )
    if pa.types.is_nested(t):
        def deep_eq(x, y):
            if isinstance(x, float) and isinstance(y, float):
                return x == y or (x != x and y != y)  # NaN <=> NaN
            if isinstance(x, dict) and isinstance(y, dict):
                return x.keys() == y.keys() and all(
                    deep_eq(x[k], y[k]) for k in x
                )
            if isinstance(x, (list, tuple)) and isinstance(y, (list, tuple)):
                return len(x) == len(y) and all(
                    deep_eq(i, j) for i, j in zip(x, y)
                )
            return x == y
        return pa.array(
            [deep_eq(x, y) for x, y in zip(a.to_pylist(), b.to_pylist())],
            pa.bool_(),
        )
    return pc.or_(both_null, pc.coalesce(pc.equal(a, b), pa.scalar(False)))


def _diff_commit(part: _CdfDiff, fields):
    """Executor-side per-commit CDF diff — the arrow twin of the batch
    ``txlog.table_changes`` per-version join: full-outer on the key
    (index-only: side presence = index validity, so key nullness never
    classifies and payload columns never ride the hash join), unchanged
    copies carried by whole-file rewrites are dropped by Spark-semantics
    null-safe image equality (:func:`_eq_null_safe` — NaN <=> NaN true,
    nested structural), NULL-key rows bypass the join as unpaired
    delete/insert (arrow join null-match semantics never get a vote)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    key = part.key
    pre = _read_side(part.pre, fields)
    post = _read_side(part.post, fields)
    _guard_keys(pre, key, part.version, "pre")
    _guard_keys(post, key, part.version, "post")
    out = []
    # NULL-key rows: never equi-join — faithful unpaired emission
    null_pre = pre.filter(pc.is_null(pre.column(key)))
    null_post = post.filter(pc.is_null(post.column(key)))
    if len(null_pre):
        out.append(_with_meta(null_pre, fields, "delete", part.version, part.op))
    if len(null_post):
        out.append(_with_meta(null_post, fields, "insert", part.version, part.op))
    pre_nn = pre.filter(pc.is_valid(pre.column(key)))
    post_nn = post.filter(pc.is_valid(post.column(key)))
    # join ONLY (key, row index): acero carries no payload (nested types
    # are not joinable non-key fields, and wide images would be copied
    # through the hash join for nothing); images materialize afterwards
    # with take() from the original side tables
    pre_k = pa.table(
        {key: pre_nn.column(key), "_b_idx": pa.array(range(len(pre_nn)), pa.int64())}
    )
    post_k = pa.table(
        {key: post_nn.column(key), "_a_idx": pa.array(range(len(post_nn)), pa.int64())}
    )
    joined = pre_k.join(post_k, keys=[key], join_type="full outer")
    b_here = pc.is_valid(joined.column("_b_idx"))
    a_here = pc.is_valid(joined.column("_a_idx"))
    data_cols = [n for n, _ in fields if n != key]
    deletes = pre_nn.take(
        joined.filter(pc.and_(b_here, pc.invert(a_here))).column("_b_idx")
    )
    inserts = post_nn.take(
        joined.filter(pc.and_(a_here, pc.invert(b_here))).column("_a_idx")
    )
    matched = joined.filter(pc.and_(b_here, a_here))
    mb = pre_nn.take(matched.column("_b_idx"))
    ma = post_nn.take(matched.column("_a_idx"))
    differ = pa.array([False] * len(matched), pa.bool_())
    for c in data_cols:
        differ = pc.or_(
            differ, pc.invert(_eq_null_safe(mb.column(c), ma.column(c)))
        )
    if len(deletes):
        out.append(_with_meta(deletes, fields, "delete", part.version, part.op))
    if len(inserts):
        out.append(_with_meta(inserts, fields, "insert", part.version, part.op))
    if len(matched) and pc.any(differ).as_py():
        out.append(_with_meta(mb.filter(differ), fields, "update_preimage", part.version, part.op))
        out.append(_with_meta(ma.filter(differ), fields, "update_postimage", part.version, part.op))
    if not out:
        schema = pa.schema(
            [(n, t) for n, t in fields]
            + [("_change_type", pa.string()), ("_commit_version", pa.int32()), ("_operation", pa.string())]
        )
        return pa.table({f.name: pa.nulls(0, f.type) for f in schema})
    return pa.concat_tables(out)


class TxlogStreamReader(DataSourceStreamReader):
    """Offsets are log versions: ``{"version": N}`` means commits
    ``0..N`` are consumed. Planning (``latestOffset``/``partitions``) is
    driver-side metadata; ``read`` runs on executors, one file per
    partition (one commit per partition for CDF diffs). See the module
    docstring for the contract."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.table_dir = _required_path(options)
        # column mapping: a table whose columns were RENAMED or DROPPED
        # reads through a logical→physical projection the streaming
        # reader does not perform (its per-file arrow reads are keyed by
        # the declared names) — refuse up front, Delta's own restriction
        # ("streaming reads from a table with column mapping changes are
        # unsupported"). An identity mapping (enabled, nothing renamed
        # yet) is harmless and allowed.
        meta = txlog.table_metadata(self.table_dir) or {}
        mapping = meta.get("column_mapping") or {}
        if any(l != p for l, p in mapping.items()) or meta.get(
            "dropped_physical"
        ):
            raise ValueError(
                "cdc_txlog source: streaming over a column-mapped table "
                "whose columns were renamed or dropped is unsupported "
                "(Delta's own streaming restriction) — consume a "
                "snapshot read instead, or restart the pipeline on a "
                "rewritten copy"
            )
        self.skip_change_commits = (
            str(_opt(options, "skipChangeCommits", "false")).lower() == "true"
        )
        self.read_change_feed = (
            str(_opt(options, "readChangeFeed", "false")).lower() == "true"
        )
        if self.read_change_feed and self.skip_change_commits:
            raise ValueError(
                "cdc_txlog source: readChangeFeed and skipChangeCommits "
                "are mutually exclusive — the CDF reader FORWARDS change "
                "commits, skipChangeCommits drops them"
            )
        self.cdf_key = _opt(options, "cdfKey", "id")
        sv = _opt(options, "startingVersion")
        st = _opt(options, "startingTimestamp")
        if sv is not None and st is not None:
            raise ValueError(
                "cdc_txlog source: startingVersion and startingTimestamp "
                "are mutually exclusive — two spellings of the same start"
            )
        if st is not None:
            # Delta's startingTimestamp: first version committed at or
            # after the timestamp. Parse FIRST (a garbage option must
            # raise, not silently start at the tip), then resolve; a
            # timestamp past the tip starts AFTER it — a stream waits
            # for future commits instead of refusing (Delta's streaming
            # behavior, unlike the batch reader's raise).
            ts = txlog._ts_seconds(st)
            stamps = txlog.commit_timestamps(self.table_dir)
            if stamps and ts <= stamps[-1]:
                self.starting_version = txlog.version_at_timestamp(
                    self.table_dir, ts, mode="at_or_after", stamps=stamps
                )
            else:
                self.starting_version = len(stamps)
        else:
            self.starting_version = int(sv) if sv is not None else 0
        # pinned boundary contract (both modes): startingVersion may be
        # any committed version, or tip+1 (a future-only stream — the
        # same stance as a past-tip startingTimestamp); anything beyond
        # is a typo'd version, refused at construction like Delta's
        # "provided version is greater than the latest" error.
        tip = txlog.latest_version(self.table_dir)
        if self.starting_version > tip + 1:
            raise ValueError(
                f"cdc_txlog source: startingVersion "
                f"{self.starting_version} is past the log tip ({tip}); "
                f"use a committed version, or {tip + 1} to stream only "
                "future commits"
            )
        mft = _opt(options, "maxFilesPerTrigger")
        self.max_files = int(mft) if mft is not None else 0
        if mft is not None and self.max_files < 1:
            raise ValueError(
                f"cdc_txlog source: maxFilesPerTrigger must be >= 1, got {mft}"
            )
        mbt = _opt(options, "maxBytesPerTrigger")
        self.max_bytes = _parse_bytes(mbt) if mbt is not None else 0
        if mbt is not None and self.max_bytes < 1:
            raise ValueError(
                f"cdc_txlog source: maxBytesPerTrigger must be >= 1 byte, "
                f"got {mbt}"
            )
        # highest version THIS RUN knows is consumed — the admission-
        # control base. None until initialOffset/partitions/commit binds
        # it; the engine asks for latestOffset BEFORE any of those on a
        # fresh run or clean restart, so that first trigger is uncapped
        # (documented best-effort — the module docstring has the full
        # contract).
        self._consumed: int | None = None

    def initialOffset(self) -> dict:
        self._consumed = self.starting_version - 1
        return {"version": self._consumed}

    def latestOffset(self) -> dict:
        tip = txlog.latest_version(self.table_dir)
        capped = self.max_files > 0 or self.max_bytes > 0
        if not capped or self._consumed is None or tip <= self._consumed:
            return {"version": tip}
        # advance version by version until the cumulative added-file
        # count OR byte volume would exceed its cap (both set = both
        # apply, whichever binds first — Delta's combined-knob rule);
        # always include >= 1 version so the stream makes progress past
        # any single oversized commit
        v, count, size = self._consumed, 0, 0
        while v < tip:
            adds = _commit_payload(self.table_dir, v + 1).get("add") or ()
            n = len(adds)
            sz = sum(_add_size(a) for a in adds) if self.max_bytes else 0
            if (count or size) and (
                (self.max_files and count + n > self.max_files)
                or (self.max_bytes and size + sz > self.max_bytes)
            ):
                break
            count += n
            size += sz
            v += 1
        return {"version": v}

    def partitions(self, start: dict, end: dict):
        start_v, end_v = int(start["version"]), int(end["version"])
        # bind the admission-control base to the batch being planned:
        # the next latestOffset caps relative to this batch's end
        self._consumed = end_v
        if not self.read_change_feed:
            files = _added_files(
                self.table_dir, start_v, end_v, self.skip_change_commits
            )
            _check_not_vacuumed(files, start_v, end_v)
            return [_AddedFile(p) for p in files]
        # CDF planning: per-version dv-state fold from the batch start
        state: dict[str, dict | str] = (
            {
                os.path.abspath(txlog._action_path(a)): a
                for a in txlog._resolve(self.table_dir, start_v)[0]
            }
            if start_v >= 0
            else {}
        )

        def dv_of(p: str, actions: dict) -> str | None:
            a = actions.get(os.path.abspath(p))
            dv = a.get("dv") if isinstance(a, dict) else None
            return dv["path"] if dv else None

        parts: list[InputPartition] = []
        for v in range(start_v + 1, end_v + 1):
            c = _commit_payload(self.table_dir, v)
            adds = [txlog._action_path(a) for a in c.get("add") or ()]
            removes = list(c.get("remove") or ())
            op = c.get("operation")
            pre = [(p, dv_of(p, state)) for p in removes]
            for p in removes:
                state.pop(os.path.abspath(p), None)
            for a in c.get("add") or ():
                state[os.path.abspath(txlog._action_path(a))] = a
            if not removes:
                parts.extend(
                    _CdfInsert(p, v, op, dv_of(p, state)) for p in adds
                )
                continue
            post = [(p, dv_of(p, state)) for p in adds]
            parts.append(_CdfDiff(v, op, self.cdf_key, pre, post))
        refs: list[str] = []
        for part in parts:
            if isinstance(part, _CdfInsert):
                refs.append(part.path)
                if part.dv_dir:
                    refs.append(part.dv_dir)
            else:
                for p, dv in part.pre + part.post:
                    refs.append(p)
                    if dv:
                        refs.append(dv)
        _check_not_vacuumed(refs, start_v, end_v)
        return parts

    def _data_fields(self):
        """Declared (name, arrow type) pairs of the DATA columns (CDF
        meta columns excluded — the reader appends them itself)."""
        from pyspark.sql.pandas.types import to_arrow_schema

        meta = {n for n, _ in _CDF_META_FIELDS}
        arrow = to_arrow_schema(self.schema_)
        return [(f.name, f.type) for f in arrow if f.name not in meta]

    def read(self, partition):
        # executor-side: one columnar parquet read per added file, handed
        # to Spark as Arrow RecordBatches — the DataSource API accepts
        # them directly, so the read stays columnar end to end (the
        # earlier to_pylist + zip form materialized every row as Python
        # tuples: ~3× the memory and per-row conversion cost for nothing)
        import pyarrow.parquet as pq

        if isinstance(partition, _CdfDiff):
            yield from _diff_commit(partition, self._data_fields()).to_batches()
            return
        if isinstance(partition, _CdfInsert):
            fields = self._data_fields()
            tbl = _apply_dv(
                _read_data_file(partition.path, fields),
                partition.path,
                partition.dv_dir,
            )
            yield from _with_meta(
                tbl, fields, "insert", partition.version, partition.op
            ).to_batches()
            return
        names = self.schema_.fieldNames()
        tbl = pq.read_table(partition.path, columns=names)
        yield from tbl.to_batches()

    def commit(self, end: dict) -> None:
        # offsets are derived from the immutable log; nothing to release,
        # but the committed end re-binds the admission-control base
        self._consumed = int(end["version"])


class TxlogStreamDataSource(DataSource):
    """``readStream.format("cdc_txlog").option("path", table_dir)`` —
    register with ``spark.dataSource.register(TxlogStreamDataSource)``.
    Batch reads of the same table go through :func:`txlog.read_version`
    (plain distributed parquet scan); this class is the streaming tail.

    SELF-DESCRIBING like the Delta source it models: ``schema()``
    resolves from the table's committed ``metaData`` action (the log
    governs, same rule as :func:`txlog.read_version`), falling back to a
    committed file's parquet footer — so ``.load()`` works without an
    explicit ``.schema()`` call; a caller-supplied schema still
    overrides (Spark only calls ``schema()`` when none was given). In
    ``readChangeFeed`` mode the resolved schema gains the CDF meta
    columns (``_change_type``, ``_commit_version``, ``_operation``) —
    and refuses a table whose data already uses one of those reserved
    names, the batch reader's collision rule."""

    @classmethod
    def name(cls) -> str:
        return "cdc_txlog"

    def schema(self):
        # NOTE: this runs in a session-less Python worker — DDL strings
        # must stay strings (StructType.fromDDL needs an active session)
        table_dir = _required_path(self.options)
        meta = txlog.table_metadata(table_dir) or {}
        declared = meta.get("schema")
        cdf = str(_opt(self.options, "readChangeFeed", "false")).lower() == "true"
        reserved = {n for n, _ in _CDF_META_FIELDS}
        if declared is not None:
            if not cdf:
                return declared  # DDL string, accepted by the DataSource API
            clash = reserved & set(_ddl_top_level_fields(declared))
            if clash:
                raise ValueError(
                    f"readChangeFeed reserves column names {sorted(clash)}; "
                    "the table's data already uses them — rename before "
                    "streaming the feed"
                )
            return (
                f"{declared}, _change_type STRING, "
                "_commit_version INT, _operation STRING"
            )
        files = txlog.snapshot_files(table_dir)
        if not files:
            raise ValueError(
                f"cdc_txlog source: table {table_dir} has no committed "
                "metadata and no data files to infer a schema from; pass "
                ".schema(...) explicitly or commit table metadata"
            )
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        base = from_arrow_schema(pq.read_schema(files[0]))
        if not cdf:
            return base
        clash = reserved & set(base.fieldNames())
        if clash:
            raise ValueError(
                f"readChangeFeed reserves column names {sorted(clash)}; "
                "the table's data already uses them — rename before "
                "streaming the feed"
            )
        out = StructType(list(base.fields))
        for n, t in _CDF_META_FIELDS:
            out = out.add(n, t)
        return out

    def streamReader(self, schema: StructType):
        return TxlogStreamReader(schema, self.options)


def _ddl_top_level_fields(ddl: str) -> list[str]:
    """Top-level field NAMES of a ``name TYPE, ...`` DDL string, parsed
    without a Spark session (nesting in ``<>``/``()`` tracked so struct
    element commas don't split fields)."""
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(ddl + ","):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            part = ddl[start:i].strip()
            if part:
                fields.append(part.split()[0].strip("`"))
            start = i + 1
    return fields


def _required_path(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError(
            "cdc_txlog source: the 'path' option (table directory) is "
            "required — readStream.format('cdc_txlog').option('path', dir)"
        )
    return path
