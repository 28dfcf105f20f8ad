"""Oracle parity + properties for the advanced coverage queries."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare

ADVANCED = [
    "scd2_users",
    "cube_returnflag_status",
    "pivot_daily_event_types",
    "stats_aggregates",
    "string_agg_nations",
    "setops_all_variants",
    "join_full_outer",
    "window_range_frame",
    "window_distribution_funcs",
    "grouping_sets_customer",
    "stats_corr_regr",
    "lateral_topn_per_nation",
    "posexplode_embedding_dims",
    "count_distinct_exact",
    "unpivot_segment_balances",
    "percentiles_exact",
    "salted_join_supplier_revenue",
    "count_distinct_approx",
    "calendar_spine_monthly",
    "histogram_price_buckets",
    "orders_mom_growth",
    "window_rolling_median",
    "percentiles_approx_sketch",
]


@pytest.mark.parametrize("name", ADVANCED)
def test_oracle_parity(spark, sf_dir, name):
    compare(name, spark, sf_dir, entrymod.queries(), entrymod.oracle_sql())


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """HLL estimate must sit within 3×rsd of exact — the query itself emits
    the per-group boolean (that is its oracle contract); all must hold."""
    rows = entrymod.queries()["count_distinct_approx"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_within_tol, f"{r.l_returnflag}: HLL outside 3×rsd"
        assert r.exact_parts > 0
