"""Oracle parity for the event-stream (batch-twin) queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.oracle import compare

EVENTS = [
    "events_tumbling_hourly",
    "events_hopping_windows",
    "events_sessionization",
    "asof_join_last_order",
    "asof_join_next_order",
    "events_markov_transitions",
    "events_ohlc_bars",
    "events_time_weighted_avg",
    "events_top_paths",
    "ab_test_welch",
    "events_time_to_convert",
    "range_join_ship_window",
    "json_map_funcs",
    "map_transform_funcs",
    "array_vector_funcs",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "timeseries_gapfill_locf",
    "events_variant_props",
]


@pytest.mark.parametrize("name", EVENTS)
def test_oracle_parity(spark, sf_dir, name):
    compare(name, spark, sf_dir, entrymod.queries(), entrymod.oracle_sql())


def test_asof_next_order_tolerance_invariants(spark, sf_dir):
    """Matches exist, every match is a real purchase of the same user inside
    [view ts, view ts + 1 hour], and it is the NEAREST one (no earlier
    qualifying purchase exists)."""
    from change_data_capture_spark.sources.tables import load_table

    df = entrymod.queries()["asof_join_next_order"](spark, sf_dir)
    matched = df.where(F.col("next_purchase_id").isNotNull())
    assert matched.count() > 0
    e = load_table(spark, sf_dir, "events")
    buys = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("next_purchase_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    j = matched.join(buys, "next_purchase_id")
    bad = j.where(
        (F.col("b_user") != F.col("user_id"))
        | (F.col("b_ts") < F.col("ts"))
        | (F.col("b_ts") > F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    ).count()
    assert bad == 0


def test_markov_rows_are_distributions(spark, sf_dir):
    """Outgoing probabilities of every prev_type sum to 1 (up to fp dust)."""
    df = entrymod.queries()["events_markov_transitions"](spark, sf_dir)
    sums = (
        df.groupBy("prev_type").agg(F.sum("prob").alias("p")).collect()
    )
    assert sums and all(abs(r.p - 1.0) < 1e-9 for r in sums)


def test_ohlc_bar_invariants(spark, sf_dir):
    """low <= open,close <= high in every bar; n_events >= 1."""
    df = entrymod.queries()["events_ohlc_bars"](spark, sf_dir)
    bad = df.where(
        (F.col("low") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("close") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("n_events") < 1)
    ).count()
    assert bad == 0
    assert df.count() > 0


def test_twap_within_day_value_range(spark, sf_dir):
    """A time-weighted average cannot leave the day's [min, max] value range."""
    from change_data_capture_spark.sources.tables import load_table

    df = entrymod.queries()["events_time_weighted_avg"](spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    rng = (
        e.groupBy(
            "user_id", F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    )
    bad = (
        df.join(rng, ["user_id", "day"])
        .where((F.col("twap") < F.col("vmin") - 1e-9) | (F.col("twap") > F.col("vmax") + 1e-9))
        .count()
    )
    assert bad == 0
