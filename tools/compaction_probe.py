#!/usr/bin/env python
"""100×-scale probe for ``maintenance.compact_bucketed``: build the
streaming-dedup band store from the decorrelated 100× corpus, fragment it
with appended delta batches, time the per-batch candidate join BEFORE and
AFTER compaction, and verify the join result is identical and its plan
keeps zero store-side Exchange.

The claim under test (BENCH.md r9): compaction is a per-bucket LOCAL
rewrite (zero Exchange), and the post-compaction per-batch join is
unchanged-or-better — the bin-pack only removes per-file open/footer
overhead, never the layout. Run manually:

    python tools/compaction_probe.py --data-dir /tmp/sf100x_dec
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/sf100x_dec")
    ap.add_argument("--appends", type=int, default=4,
                    help="delta batches appended before compaction")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from pyspark.sql import functions as F

    from change_data_capture_spark.operators.dedup_queries import (
        _DELTA_MOD,
        corpus,
        doc_shingles,
        minhash_band_rel,
        minhash_signature_rel,
    )
    from change_data_capture_spark.operators.maintenance import (
        compact_bucketed,
        write_bucketed,
    )
    from change_data_capture_spark.plans import plan_stats
    from change_data_capture_spark.session import get_spark
    from change_data_capture_spark.streaming.streaming_queries import (
        _BAND_STORE_BUCKETS,
        _banded_store_join,
    )

    spark = get_spark("compaction-probe", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    c = corpus(spark, args.data_dir)
    is_delta = F.col("doc_id") % _DELTA_MOD == 0
    bands = minhash_band_rel(minhash_signature_rel(doc_shingles(c.where(~is_delta))))

    import tempfile

    ws = tempfile.mkdtemp(prefix="cdc_cprobe_")
    tbl, path = "cprobe_band_store", f"{ws}/band_store"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    t0 = time.perf_counter()
    write_bucketed(bands, tbl, ["band", "sig"], _BAND_STORE_BUCKETS, path)
    print(f"base store build: {time.perf_counter() - t0:.1f}s", flush=True)

    # fragment: append the delta corpus's bands N times with shifted ids
    # (same volume shape as N micro-batches)
    delta_bands = minhash_band_rel(
        minhash_signature_rel(doc_shingles(c.where(is_delta)))
    )
    for i in range(args.appends):
        write_bucketed(
            delta_bands.withColumn(
                "doc_id", F.col("doc_id") + F.lit((i + 1) * 1_000_000_000)
            ),
            tbl, ["band", "sig"], _BAND_STORE_BUCKETS, path, mode="append",
        )
    nfiles = sum(1 for _r, _d, fs in os.walk(path)
                 for f in fs if f.endswith(".parquet"))
    print(f"fragmented store: {nfiles} files", flush=True)

    batch = delta_bands.withColumn(
        "doc_id", F.col("doc_id") + F.lit(9_000_000_000)
    ).persist()
    batch.count()

    def drain() -> tuple[float, int]:
        spark.catalog.refreshTable(tbl)
        j = _banded_store_join(batch, spark.table(tbl), ["band", "sig"])
        t0 = time.perf_counter()
        n = j.count()
        return time.perf_counter() - t0, n

    pre = [drain() for _ in range(2)]
    print(f"pre-compaction join:  {[f'{t:.1f}s' for t, _ in pre]} "
          f"rows={pre[0][1]}", flush=True)

    t0 = time.perf_counter()
    out_files = compact_bucketed(spark, tbl, ["band", "sig"],
                                 _BAND_STORE_BUCKETS, path)
    print(f"compaction: {time.perf_counter() - t0:.1f}s → {out_files} files",
          flush=True)

    post = [drain() for _ in range(2)]
    print(f"post-compaction join: {[f'{t:.1f}s' for t, _ in post]} "
          f"rows={post[0][1]}", flush=True)
    assert pre[0][1] == post[0][1], "compaction changed the join result"

    s = plan_stats(_banded_store_join(batch, spark.table(tbl), ["band", "sig"]))
    # the batch side here carries its own derivation exchanges (shingles →
    # signatures → bands), so total exchange count is not the pin — the
    # store side must scan in bucket layout (the side-specific
    # zero-Exchange property is pinned by the synthetic-batch pytest,
    # tests/test_plans.py::test_banded_store_join_has_no_store_side_exchange)
    assert "Bucketed: true" in s.text and "ShuffledHashJoin" in s.text, s.text
    print("plan: bucketed store scan + ShuffledHashJoin — OK", flush=True)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


if __name__ == "__main__":
    main()
