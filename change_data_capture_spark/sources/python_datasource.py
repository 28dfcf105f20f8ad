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
    float/int/str; DecimalType fields must arrive as decimal.Decimal).
    Inverse of ``_from_row``: ISO-8601 strings back to date/datetime,
    base64 back to bytes — every type the writer can emit round-trips."""
    import base64
    import datetime
    import decimal

    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        DateType,
        DecimalType,
        DoubleType,
        FloatType,
        LongType,
        MapType,
        TimestampType,
    )

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
    if isinstance(dtype, TimestampType):
        return datetime.datetime.fromisoformat(value)
    if isinstance(dtype, DateType):
        return datetime.date.fromisoformat(value)
    if isinstance(dtype, BinaryType):
        return bytearray(base64.b64decode(value))
    if isinstance(dtype, ArrayType):
        return [_to_row(v, dtype.elementType) for v in value]
    if isinstance(dtype, MapType):
        # JSON object keys arrive as strings — coerce them through the
        # declared keyType too (int/long/double keys must round-trip, not
        # just values)
        return {
            _to_row(k, dtype.keyType): _to_row(v, dtype.valueType)
            for k, v in value.items()
        }
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
        if self.overwrite:
            # truncate-on-overwrite happens at COMMIT time, not write time:
            # a failed overwrite job must leave the old segments readable.
            # New temp files end in .inprogress so the glob can't hit them.
            # NOTE: deleting segments invalidates any IN-FLIGHT stream
            # checkpoint over this path — a recovering stream whose offsets
            # reference the removed names fails loudly in
            # CdcNdjsonStreamReader.readBetweenOffsets, by design.
            root = self.options.get("path")
            for old in glob.glob(
                os.path.join(root, "**", "*.json"), recursive=True
            ):
                os.remove(old)
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                d, base = os.path.split(m.tmp_path[: -len(".inprogress")])
                dst = os.path.join(d, base.lstrip("."))
                # strip the hidden-file dot: pre-commit temp files are
                # invisible to the reader's glob BY CONSTRUCTION; the
                # rename both publishes and un-hides atomically
                os.rename(m.tmp_path, dst)
                # stamp publish time (rename preserves the temp file's WRITE
                # mtime) so mtimes reflect when segments became visible —
                # for operators and debugging only; the stream reader is
                # content-addressed and never depends on listing/mtime order
                os.utime(dst)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


def _from_row(value):
    """JSON-encode a Spark row leaf: Row -> dict, Decimal -> str,
    date/timestamp -> ISO-8601 string, bytes -> base64 string; recurses
    through arrays and maps so nested Rows/Decimals survive too."""
    import base64
    import datetime
    import decimal

    from pyspark.sql import Row

    if isinstance(value, Row):
        return {k: _from_row(v) for k, v in value.asDict().items()}
    if isinstance(value, decimal.Decimal):
        return str(value)
    if isinstance(value, datetime.datetime):
        return value.isoformat(sep=" ")
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, (bytes, bytearray)):
        return base64.b64encode(bytes(value)).decode("ascii")
    if isinstance(value, (list, tuple)):
        return [_from_row(v) for v in value]
    if isinstance(value, dict):
        return {k: _from_row(v) for k, v in value.items()}
    return value


class CdcNdjsonStreamReader(SimpleDataSourceStreamReader):
    """STREAMING side of the envelope source (Spark 4 Python streaming
    DataSource): offsets are CONTENT-ADDRESSED — each offset carries the
    sorted list of segment file names consumed so far (names are unique:
    the writer uuid-names every segment; segments are immutable once
    published). ``read`` advances over exactly the files not yet in the
    offset; ``readBetweenOffsets`` replays exactly ``end - start`` by set
    difference, which makes checkpoint recovery exactly-once REGARDLESS of
    listing order. Earlier revisions used a bare index into an
    (mtime, name)-sorted listing; that assumed the consumed listing stays a
    stable prefix, which rename-on-commit broke (rename preserves the temp
    file's earlier write mtime, so a segment committed mid-stream could
    sort BEFORE already-consumed files, shifting every index). Offset size
    grows with segment count — at log-rotation granularity that is bounded
    (thousands of names per topic), the standard trade for content
    addressing; Spark's own file stream source keeps a seen-file log the
    same way."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.root = options.get("path")

    def _files(self) -> dict[str, str]:
        """{basename: fullpath} for every published segment (basenames are
        uuid-unique by the writer's construction)."""
        return {
            os.path.basename(p): p
            for p in glob.glob(
                os.path.join(self.root, "**", "*.json"), recursive=True
            )
        }

    def initialOffset(self) -> dict:
        return {"files": []}

    @staticmethod
    def _consumed(offset: dict) -> set[str]:
        # legacy {"idx": n} offsets (pre-content-addressing checkpoints)
        # carry no file identity, so they cannot be mapped safely; refuse
        # loudly rather than replay or skip.
        if "files" not in offset:
            raise ValueError(
                f"unsupported cdc_ndjson offset {offset!r}: restart the "
                "query with a fresh checkpoint (offsets are now "
                "content-addressed file lists)"
            )
        return set(offset["files"])

    def read(self, start: dict):
        files = self._files()
        done = self._consumed(start)
        fresh = sorted(name for name in files if name not in done)
        rows = []
        for name in fresh:
            rows.extend(_parse_file(files[name], self.schema_))
        return iter(rows), {"files": sorted(done | set(fresh))}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        todo = sorted(self._consumed(end) - self._consumed(start))
        missing = [name for name in todo if name not in files]
        if missing:
            # segments are immutable once published, so a checkpointed name
            # can only vanish if an overwrite commit truncated the log
            raise ValueError(
                "cdc_ndjson replay: segment(s) referenced by the stream "
                f"checkpoint were deleted (overwrite commit ran?): {missing}; "
                "restart the query with a fresh checkpoint"
            )
        rows = []
        for name in todo:
            rows.extend(_parse_file(files[name], self.schema_))
        return iter(rows)
