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

- ``read(start)`` folds commits ``(start.version .. tip]`` and returns
  the rows of the files those commits ADDED; the new offset is the tip.
- ``readBetweenOffsets(start, end)`` replays commits
  ``(start.version .. end.version]`` — commits and data files are both
  immutable once published, so checkpoint recovery re-reads exactly the
  same rows (pinned in ``tests/test_txlog.py``).
- The source is APPEND-ONLY, like Delta's streaming source without
  ``skipChangeCommits``: a commit carrying ``remove`` actions in the
  consumed range raises instead of silently emitting rewritten rows
  twice or dropping retractions the sink never sees.

Scale: this is a ``SimpleDataSourceStreamReader`` (rows flow through the
driver), which Spark positions for control-plane/low-volume sources; the
shape to scale it is the partition-based ``DataSourceStreamReader`` with
one ``InputPartition`` per added file — the offset logic (log versions)
is IDENTICAL, only ``read`` moves executor-side. The queries gated on
this source use micro-batch-sized commits, where the simple reader is
the honest fit.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from change_data_capture_spark.sources import txlog


def _added_files(table_dir: str, from_v: int, to_v: int) -> list[str]:
    """Files added by commits ``(from_v .. to_v]``, in commit order.
    Raises on any ``remove`` action in the range — this source is
    append-only (Delta streaming-source contract: data-changing commits
    are an error unless the reader opts into skipping them)."""
    out: list[str] = []
    for v in range(from_v + 1, to_v + 1):
        with open(os.path.join(table_dir, "_txlog", f"{v:020d}.json")) as f:
            c = json.load(f)
        if c["remove"]:
            raise ValueError(
                f"txlog stream source: commit {v} rewrites data "
                "(remove actions present); the streaming source is "
                "append-only — compact/merge on a downstream copy, or "
                "restart the stream from the rewritten snapshot"
            )
        out.extend(txlog._action_path(a) for a in c["add"])
    return out


class TxlogStreamReader(SimpleDataSourceStreamReader):
    """Offsets are log versions: ``{"version": N}`` means commits
    ``0..N`` are consumed. See the module docstring for the contract."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.table_dir = options.get("path")

    def initialOffset(self) -> dict:
        return {"version": -1}

    def _rows(self, files: list[str]) -> list:
        # materialized list, not a generator: Spark's simple-stream cache
        # copy.copy()s the returned iterator for prefetch replay, and
        # only list iterators support that
        import pyarrow.parquet as pq

        names = self.schema_.fieldNames()
        rows: list = []
        for path in files:
            tbl = pq.read_table(path, columns=names)
            cols = [tbl.column(n).to_pylist() for n in names]
            rows.extend(zip(*cols))
        return rows

    def read(self, start: dict):
        tip = txlog.latest_version(self.table_dir)
        start_v = int(start["version"])
        if tip <= start_v:
            return iter([]), start  # list iterator: the cache can copy it
        files = _added_files(self.table_dir, start_v, tip)
        return iter(self._rows(files)), {"version": tip}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _added_files(
            self.table_dir, int(start["version"]), int(end["version"])
        )
        return iter(self._rows(files))


class TxlogStreamDataSource(DataSource):
    """``readStream.format("cdc_txlog").option("path", table_dir)`` —
    register with ``spark.dataSource.register(TxlogStreamDataSource)``.
    Batch reads of the same table go through :func:`txlog.read_version`
    (plain distributed parquet scan); this class is the streaming tail."""

    @classmethod
    def name(cls) -> str:
        return "cdc_txlog"

    def simpleStreamReader(self, schema: StructType):
        return TxlogStreamReader(schema, self.options)
