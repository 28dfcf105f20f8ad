"""Oracle parity for the event-stream (batch-twin) queries."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare

EVENTS = [
    "events_tumbling_hourly",
    "events_hopping_windows",
    "events_sessionization",
    "asof_join_last_order",
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
