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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
        field_names = [f.name for f in self.schema.fields]
        with open(partition.path, encoding="utf-8") as fh:
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
                yield tuple(_to_row(rec.get(n), self.schema[n].dataType) for n in field_names)


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
