"""The bucketed SCD2 state must only rewrite partitions containing batch
keys — the file-skipping property that makes incremental maintenance
incremental."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql.types import (
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from change_data_capture_spark.streaming.scd2_stream import Scd2State, apply_batch

_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("description", StringType()),
        StructField("price", DecimalType(10, 2)),
        StructField("lsn", LongType()),
        StructField("ts_ms", LongType()),
    ]
)


def _events(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_untouched_buckets_not_rewritten(spark):
    ws = tempfile.mkdtemp(prefix="scd2_bucket_")
    state = Scd2State(spark, ws)

    base = 1_700_000_000_000
    batch1 = _events(
        spark,
        [(i, f"n{i}", "d", None, i * 10 + 1, base + i * 1000) for i in range(200)],
    )
    apply_batch(state, batch1)

    def mtimes():
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(f"{ws}/bucket=*/[!_.]*.parquet")
        }

    before = mtimes()
    # second batch: a single key -> exactly one bucket may change
    batch2 = _events(spark, [(5, "n5b", "d", None, 52, base + 999_000)])
    apply_batch(state, batch2)
    after = mtimes()

    changed_buckets = {
        p.split("bucket=")[1].split("/")[0]
        for p in set(before) ^ set(after)
        | {p for p in before if p in after and before[p] != after[p]}
    }
    assert len(changed_buckets) <= 1, f"rewrote buckets: {sorted(changed_buckets)}"

    # and the merge itself is correct: key 5 now has two intervals chained
    rows = sorted(
        (r.lsn, r.row_valid_expiration_timestamp)
        for r in state.read().where("id = 5").collect()
    )
    assert len(rows) == 2
    assert rows[0][1] is not None
