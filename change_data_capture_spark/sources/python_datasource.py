"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) for the
reference's NDJSON envelope wire format — engine *extensibility* surface:
a user-defined source that plugs into ``spark.read.format(...)`` with real
partition planning, exactly like a JVM DataSource V2.

The reference's log objects are JSONL files under a topic prefix
(``/root/reference/connectors/s3-sink.json:10-14``); this source lists them,
plans ONE InputPartition PER FILE (the same split granularity the built-in
text source uses — at 100 TB each task reads one rotated log object), and
parses lines with the stdlib. It exists to prove the extension point and to
serve formats Spark has no reader for; for plain NDJSON the built-in
``spark.read.json`` (see ``ndjson.py``) remains the production path — JVM
parsing beats per-row Python. Registration:

    spark.dataSource.register(CdcNdjsonDataSource)
    spark.read.format("cdc_ndjson").option("path", dir).load()
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from change_data_capture_spark.schemas import PRODUCTS_ENVELOPE


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CdcNdjsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options

    def partitions(self):
        root = self.options.get("path")
        files = sorted(glob.glob(os.path.join(root, "**", "*.json"), recursive=True))
        # one rotated log object per task — the natural split for an
        # append-only segment log (files are small and immutable)
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        yield from _parse_file(partition.path, self.schema)


def _parse_file(path: str, schema: StructType):
    """NDJSON file -> typed row tuples (shared by batch + stream readers)."""
    field_names = [f.name for f in schema.fields]
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                # PERMISSIVE twin: poison lines yield an all-null row,
                # matching the built-in reader's configured behavior
                yield tuple(None for _ in field_names)
                continue
            yield tuple(_to_row(rec.get(n), schema[n].dataType) for n in field_names)


def _to_row(value, dtype):
    """Recursively shape parsed JSON into Spark's expected tuple rows,
    coercing leaves to the Python types the converter requires (JSON gives
    float/int/str; DecimalType fields must arrive as decimal.Decimal)."""
    import decimal

    from pyspark.sql.types import DecimalType, DoubleType, FloatType, LongType

    if value is None:
        return None
    if isinstance(dtype, StructType):
        return tuple(_to_row(value.get(f.name), f.dataType) for f in dtype.fields)
    if isinstance(dtype, DecimalType):
        return decimal.Decimal(str(value))
    if isinstance(dtype, (DoubleType, FloatType)):
        return float(value)
    if isinstance(dtype, LongType):
        return int(value)
    return value


class CdcNdjsonDataSource(DataSource):
    """``format("cdc_ndjson")`` — typed envelope NDJSON via the Python
    DataSource API (cited: pyspark.sql.datasource docs, public API)."""

    @classmethod
    def name(cls) -> str:
        return "cdc_ndjson"

    def schema(self) -> StructType:
        return PRODUCTS_ENVELOPE

    def reader(self, schema: StructType) -> DataSourceReader:
        return CdcNdjsonReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return CdcNdjsonWriter(schema, self.options, overwrite)

    def simpleStreamReader(self, schema: StructType):
        return CdcNdjsonStreamReader(schema, self.options)


class _WroteFile(WriterCommitMessage):
    """Commit message: the temp file a task produced (picklable)."""

    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class CdcNdjsonWriter(DataSourceWriter):
    """Write side of the envelope source — a real two-phase commit:

    each task streams its partition to a TEMP file (``.inprogress``) and
    returns the path as its commit message; only the driver's ``commit``
    renames every temp file into place (rename is atomic per POSIX/object
    stores with atomic rename), so readers never observe a torn write and
    a failed/speculative task's output is simply never renamed — the same
    rename-on-commit protocol the repo's compaction swap uses
    (``operators/maintenance.py``). ``abort`` deletes the orphans."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.schema = schema
        self.options = options
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        root = self.options.get("path")
        os.makedirs(root, exist_ok=True)
        tmp = os.path.join(root, f".part-{uuid.uuid4().hex}.json.inprogress")
        names = [f.name for f in self.schema.fields]
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                rec = {k: _from_row(v) for k, v in zip(names, row)}
                fh.write(json.dumps(rec, separators=(",", ":")) + "\n")
                n += 1
        return _WroteFile(tmp, n)

    def commit(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                d, base = os.path.split(m.tmp_path[: -len(".inprogress")])
                # strip the hidden-file dot: pre-commit temp files are
                # invisible to the reader's glob BY CONSTRUCTION; the
                # rename both publishes and un-hides atomically
                os.rename(m.tmp_path, os.path.join(d, base.lstrip(".")))

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


def _from_row(value):
    """JSON-encode a Spark row leaf (Row -> dict, Decimal -> str)."""
    import decimal

    from pyspark.sql import Row

    if isinstance(value, Row):
        return {k: _from_row(v) for k, v in value.asDict().items()}
    if isinstance(value, decimal.Decimal):
        return str(value)
    return value


class CdcNdjsonStreamReader(SimpleDataSourceStreamReader):
    """STREAMING side of the envelope source (Spark 4 Python streaming
    DataSource): offsets are the count of log files consumed, in sorted
    name order — the rotated-segment-log model (files are immutable once
    written, new segments only append to the listing). ``read`` advances
    the offset over newly arrived files; ``readBetweenOffsets`` replays a
    committed range DETERMINISTICALLY after restart (same sorted listing →
    same rows), which is what makes checkpoint recovery exactly-once."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.root = options.get("path")

    def _files(self):
        # (mtime, name) order, NOT bare name order: index offsets are only
        # exactly-once if the consumed listing stays a stable PREFIX as
        # files arrive, and appended segments guarantee that through mtime
        # (a fresh uuid-named file can lexicographically sort BEFORE
        # already-consumed files — found by the checkpoint-restart test,
        # which duplicated batch 0 and silently dropped the new segment).
        return [
            p
            for _, _, p in sorted(
                (os.path.getmtime(p), os.path.basename(p), p)
                for p in glob.glob(
                    os.path.join(self.root, "**", "*.json"), recursive=True
                )
            )
        ]

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        files = self._files()
        lo = start["idx"]
        rows = []
        for p in files[lo:]:
            rows.extend(_parse_file(p, self.schema_))
        return iter(rows), {"idx": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()[start["idx"] : end["idx"]]
        rows = []
        for p in files:
            rows.extend(_parse_file(p, self.schema_))
        return iter(rows)
