"""Spark 4 VariantType over the semi-structured props column — the modern
open-ended-JSON path (vs the pinned-schema envelope): parse once to a binary
variant, extract typed fields lazily."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_variant_parse_and_extract(spark, sf_dir):
    from change_data_capture_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").limit(200)
    v = e.select(
        "event_id",
        F.parse_json("props").alias("vp"),
        F.get_json_object("props", "$.k").cast("int").alias("k_ref"),
    ).select(
        "event_id",
        F.try_variant_get(F.col("vp"), "$.k", "int").alias("k_variant"),
        "k_ref",
    )
    rows = v.collect()
    assert rows and all(r.k_variant == r.k_ref for r in rows)
