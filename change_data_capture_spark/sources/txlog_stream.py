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

Scale: the reader is the PARTITION-BASED ``DataSourceStreamReader`` —
``partitions(start, end)`` plans one ``InputPartition`` per file added in
the consumed commit range (driver-side, metadata only), and ``read``
executes on EXECUTORS, one pyarrow parquet read per partition. Rows never
flow through the driver (the ``SimpleDataSourceStreamReader`` alternative
routes every row driver-side — measured 55 s at 100× on the same gate
query vs 35 s partitioned, and the residual is the gate's own 3× slice
writes, not the read). The whole micro-batch therefore scales like
any distributed parquet scan, while the offset stays one integer.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from change_data_capture_spark.sources import txlog


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
        with open(os.path.join(table_dir, "_txlog", f"{v:020d}.json")) as f:
            c = json.load(f)
        if c["remove"]:
            if skip_change_commits:
                continue
            raise ValueError(
                f"txlog stream source: commit {v} rewrites data "
                "(remove actions present); the streaming source is "
                "append-only — compact/merge on a downstream copy, "
                "restart the stream from the rewritten snapshot, or opt "
                "into .option('skipChangeCommits', 'true')"
            )
        out.extend(txlog._action_path(a) for a in c["add"])
    return out


class _AddedFile(InputPartition):
    """One data file added by a consumed commit — the unit of executor
    parallelism for a micro-batch."""

    def __init__(self, path: str):
        self.path = path


class TxlogStreamReader(DataSourceStreamReader):
    """Offsets are log versions: ``{"version": N}`` means commits
    ``0..N`` are consumed. Planning (``latestOffset``/``partitions``) is
    driver-side metadata; ``read`` runs on executors, one file per
    partition. See the module docstring for the contract."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.table_dir = _required_path(options)
        # Spark SQL option keys are case-insensitive and may arrive
        # lowercased through the DataSource API — accept either spelling
        raw = options.get("skipchangecommits",
                          options.get("skipChangeCommits", "false"))
        self.skip_change_commits = str(raw).lower() == "true"

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        return {"version": txlog.latest_version(self.table_dir)}

    def partitions(self, start: dict, end: dict):
        files = _added_files(
            self.table_dir,
            int(start["version"]),
            int(end["version"]),
            self.skip_change_commits,
        )
        return [_AddedFile(p) for p in files]

    def read(self, partition: _AddedFile):
        # executor-side: one columnar parquet read per added file, handed
        # to Spark as Arrow RecordBatches — the DataSource API accepts
        # them directly, so the read stays columnar end to end (the
        # earlier to_pylist + zip form materialized every row as Python
        # tuples: ~3× the memory and per-row conversion cost for nothing)
        import pyarrow.parquet as pq

        names = self.schema_.fieldNames()
        tbl = pq.read_table(partition.path, columns=names)
        yield from tbl.to_batches()

    def commit(self, end: dict) -> None:
        # offsets are derived from the immutable log; nothing to release
        pass


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
    overrides (Spark only calls ``schema()`` when none was given)."""

    @classmethod
    def name(cls) -> str:
        return "cdc_txlog"

    def schema(self):
        table_dir = _required_path(self.options)
        meta = txlog.table_metadata(table_dir) or {}
        declared = meta.get("schema")
        if declared is not None:
            return declared  # DDL string, accepted by the DataSource API
        files = txlog.snapshot_files(table_dir)
        if files:
            import pyarrow.parquet as pq

            from pyspark.sql.pandas.types import from_arrow_schema

            return from_arrow_schema(pq.read_schema(files[0]))
        raise ValueError(
            f"cdc_txlog source: table {table_dir} has no committed "
            "metadata and no data files to infer a schema from; pass "
            ".schema(...) explicitly or commit table metadata"
        )

    def streamReader(self, schema: StructType):
        return TxlogStreamReader(schema, self.options)


def _required_path(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError(
            "cdc_txlog source: the 'path' option (table directory) is "
            "required — readStream.format('cdc_txlog').option('path', dir)"
        )
    return path
