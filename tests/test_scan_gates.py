"""Scan-format round-trip gates (sources/scan_gates.py): local twins of the
four driver gate queries plus the plan pins the gates promise — the ORC
predicate must reach the scan, and the round-trips must be lossless."""

from __future__ import annotations

import __spark_entry__ as entrymod
from change_data_capture_spark.plans import plan_stats


def test_csv_roundtrip_lossless(spark, sf_dir):
    from change_data_capture_spark.sources.tables import load_table

    got = {
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in entrymod.queries()["scan_csv_roundtrip"](spark, sf_dir).collect()
    }
    want = {
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    assert got == want


def test_json_auto_scan_infers_and_restores(spark, sf_dir):
    from change_data_capture_spark.sources.tables import load_table

    df = entrymod.queries()["scan_json_auto_roundtrip"](spark, sf_dir)
    # the gate promises the inferred-then-cast schema matches the fixture's
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["int", "string"]
    got = {(r.r_regionkey, r.r_name) for r in df.collect()}
    want = {
        (r.r_regionkey, r.r_name)
        for r in load_table(spark, sf_dir, "region").collect()
    }
    assert got == want


def test_text_roundtrip_line_fidelity(spark, sf_dir):
    from change_data_capture_spark.sources.tables import load_table

    got = sorted(
        r.value for r in entrymod.queries()["scan_text_roundtrip"](spark, sf_dir).collect()
    )
    want = sorted(
        r.n_name for r in load_table(spark, sf_dir, "nation").collect()
    )
    assert got == want


def test_orc_gate_filter_reaches_scan(spark, sf_dir):
    """The o_orderstatus predicate must push into the ORC scan (the format's
    core scale contract — same as parquet's PushedFilters pin)."""
    s = plan_stats(entrymod.queries()["scan_orc_roundtrip"](spark, sf_dir))
    assert any("o_orderstatus" in p for p in s.pushed_filters), s.pushed_filters
    assert s.shuffle_exchanges == 1, "one agg exchange only"


def test_dynamic_overwrite_preserves_untouched_partition_files(spark, sf_dir):
    """The dynamic-overwrite gate's physical claim: a partition NOT in the
    incoming data keeps its exact files (same paths, same sizes) — a full
    rewrite or static overwrite would replace or delete them."""
    import glob
    import os

    from change_data_capture_spark.sources.scan_gates import (
        _gate_dir,
        sink_dynamic_partition_overwrite,
    )

    out = _gate_dir(sf_dir, "dynpart")

    def files(prio):
        return sorted(
            (os.path.basename(p), os.path.getsize(p))
            for p in glob.glob(f"{out}/o_orderpriority={prio}/*.parquet")
        )

    # first run lays everything down and applies the backfill
    sink_dynamic_partition_overwrite(spark, sf_dir).count()
    before_other = files("5-LOW")
    before_target = files("1-URGENT")
    assert before_other and before_target
    # second run rewrites the full layout then backfills again: compare the
    # state ACROSS the dynamic-overwrite step by re-running only that step
    from change_data_capture_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    upd = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
    )
    (
        upd.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority")
        .parquet(out)
    )
    assert files("5-LOW") == before_other, "untouched partition was rewritten"
    assert files("1-URGENT") != before_target, "target partition must change"
