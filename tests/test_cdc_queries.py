"""Flagship SCD2 + CDC query tests: oracle parity and invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.oracle import compare

CDC_QUERIES = ["scd2_products", "scd2_schema_evolution", "scd2_products_sql", "scd2_products_b64price", "cdc_change_log", "cdc_dedup_op_counts", "dim_current_products", "scd2_point_in_time_join", "snapshot_diff_cdc", "scd3_products"]


@pytest.mark.parametrize("name", CDC_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    compare(name, spark, sf_dir, entrymod.queries(), entrymod.oracle_sql())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "id", "name", "description", "price",
        "row_valid_start_timestamp", "row_valid_expiration_timestamp",
    ]


def test_scd2_interval_invariants(spark, sf_dir):
    """Property: per id, validity intervals partition time — starts strictly
    increase, each expiration equals the next start, and exactly one open
    (sentinel) interval exists per id (SURVEY.md §5 item 4)."""
    df = entrymod.queries()["scd2_products"](spark, sf_dir)

    bad_order = df.where(
        F.col("row_valid_expiration_timestamp") <= F.col("row_valid_start_timestamp")
    ).count()
    assert bad_order == 0

    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("row_valid_start_timestamp")
    chained = df.select(
        "id",
        "row_valid_start_timestamp",
        "row_valid_expiration_timestamp",
        F.lead("row_valid_start_timestamp").over(w).alias("next_start"),
    )
    broken_chain = chained.where(
        F.col("next_start").isNotNull()
        & (F.col("row_valid_expiration_timestamp") != F.col("next_start"))
    ).count()
    assert broken_chain == 0

    open_rows = df.where(
        F.col("row_valid_expiration_timestamp") == F.lit("2260-01-01").cast("timestamp")
    )
    per_id = open_rows.groupBy("id").count().where("count != 1").count()
    assert per_id == 0


def test_debezium_decimal_codec(spark):
    """decode_debezium_decimal recovers the reference's sample wire value
    ("DOQ=" scale 2 -> 33.00, README.md:214), round-trips the encoder, and
    handles negative two's-complement values."""
    import base64

    from pyspark.sql import functions as F

    from change_data_capture_spark.functions.envelope import (
        decode_debezium_decimal,
        encode_debezium_decimal,
    )

    ref = spark.createDataFrame([("DOQ=",)], "b string")
    assert ref.select(
        decode_debezium_decimal(F.col("b"), 2).alias("p")
    ).collect()[0].p == __import__("decimal").Decimal("33.00")

    vals = [("0.00",), ("0.01",), ("33.00",), ("12345.67",), ("999999.99",),
            ("123456789012345.67",)]
    d = spark.createDataFrame(vals, "v string").select(
        F.col("v").cast("decimal(18,2)").alias("v")
    )
    rt = d.select(
        "v",
        decode_debezium_decimal(
            encode_debezium_decimal(F.col("v"), 2), 2
        ).alias("back"),
    )
    assert rt.where(F.col("v") != F.col("back")).count() == 0
    # the reference sample must be reproduced byte-for-byte by the encoder
    enc = spark.createDataFrame([("33.00",)], "v string").select(
        encode_debezium_decimal(F.col("v").cast("decimal(10,2)"), 2).alias("b")
    )
    assert enc.collect()[0].b == "DOQ="

    neg = spark.createDataFrame(
        [(base64.b64encode((-128).to_bytes(1, "big", signed=True)).decode(),),
         (base64.b64encode((-1234567).to_bytes(3, "big", signed=True)).decode(),)],
        "b string",
    )
    got = [r.p for r in neg.select(
        decode_debezium_decimal(F.col("b"), 2).alias("p")
    ).collect()]
    import decimal as _d
    assert got == [_d.Decimal("-1.28"), _d.Decimal("-12345.67")]


def test_schema_evolution_wire_lines_are_genuinely_mixed_version(spark, sf_dir):
    """The evolution gate's claim is wire-level: pre-evolution JSON lines
    must LACK the ``category`` key entirely (not carry category:null) and
    post-evolution after-images must carry it — and the SCD2 output must
    show both NULL-category intervals (old history) and populated ones."""
    import json

    from change_data_capture_spark.sources.cdc_generator import (
        product_change_events,
    )

    env = product_change_events(spark, sf_dir)
    v = F.col("value")
    post = v["source"]["lsn"] % 10 >= 2
    cat = F.concat(F.lit("cat-"), (v["after"]["id"] % 5).cast("string"))
    after2 = F.when(
        v["after"].isNotNull(),
        F.struct(
            v["after"]["id"].alias("id"),
            v["after"]["name"].alias("name"),
            v["after"]["description"].alias("description"),
            v["after"]["price"].alias("price"),
            F.when(post, cat).alias("category"),
        ),
    )
    value2 = F.struct(
        v["before"].alias("before"),
        after2.alias("after"),
        v["source"].alias("source"),
        v["op"].alias("op"),
        v["ts_ms"].alias("ts_ms"),
    )
    lines = [
        r.line
        for r in env.select(
            F.to_json(F.struct(value2.alias("value"))).alias("line")
        ).collect()
    ]
    pre = [
        json.loads(s) for s in lines
        if (json.loads(s)["value"].get("source") or {}).get("lsn") is not None
        and json.loads(s)["value"]["source"]["lsn"] % 10 < 2
        and json.loads(s)["value"].get("after") is not None
    ]
    post_l = [
        json.loads(s) for s in lines
        if (json.loads(s)["value"].get("source") or {}).get("lsn") is not None
        and json.loads(s)["value"]["source"]["lsn"] % 10 >= 2
        and json.loads(s)["value"].get("after") is not None
    ]
    assert pre and post_l
    assert all("category" not in e["value"]["after"] for e in pre)
    assert all("category" in e["value"]["after"] for e in post_l)

    out = entrymod.queries()["scd2_schema_evolution"](spark, sf_dir).collect()
    cats = {r.category for r in out}
    assert None in cats and any(c is not None for c in cats)


def test_json_walk_normalized_types_and_nesting():
    """The introspection walker must label every JSON type correctly on a
    hostile document (bools before numbers — bool is an int subclass —
    explicit nulls, arrays not recursed into) and build dotted paths
    through nested objects."""
    from change_data_capture_spark.operators.cdc_queries import _walk_json_value

    out: list = []
    _walk_json_value(
        "$",
        {
            "b": True,
            "i": 3,
            "f": 1.5,
            "s": "x",
            "z": None,
            "arr": [{"hidden": 1}],
            "o": {"inner": "y"},
        },
        out,
        emit_root=False,
    )
    got = dict(out)
    assert got == {
        "$.b": "boolean",
        "$.i": "number",
        "$.f": "number",
        "$.s": "string",
        "$.z": "null",
        "$.arr": "array",
        "$.o": "object",
        "$.o.inner": "string",
    }
    assert "$.arr.hidden" not in got  # array elements are not walked
