"""Executable plan-quality assertions: the physical shapes this engine
promises (COVERAGE.md / operator docstrings) must actually be chosen by
Catalyst — a lost broadcast or un-pushed filter is a test failure, not a
cluster incident."""

from __future__ import annotations

import __spark_entry__ as entrymod
from change_data_capture_spark.plans import plan_stats


def _stats(spark, sf_dir, name):
    return plan_stats(entrymod.queries()[name](spark, sf_dir))


def test_scd2_is_single_shuffle(spark, sf_dir):
    s = _stats(spark, sf_dir, "scd2_products")
    assert s.shuffle_exchanges == 1, s.text
    assert s.parquet_scans == 1, "generator must scan part exactly once"
    assert not s.has_cartesian and not s.has_bnlj


def test_q1_filter_reaches_scan(spark, sf_dir):
    s = _stats(spark, sf_dir, "q1_pricing_summary")
    assert any("l_shipdate" in p for p in s.pushed_filters), s.pushed_filters
    assert s.shuffle_exchanges == 1  # the single agg exchange


def test_q5_broadcasts_dimensions(spark, sf_dir):
    s = _stats(spark, sf_dir, "q5_region_revenue")
    assert s.broadcast_exchanges >= 3, "region/nation/supplier must broadcast"
    assert not s.has_cartesian
    assert any("r_name" in p for p in s.pushed_filters)


def test_topk_uses_group_limit(spark, sf_dir):
    s = _stats(spark, sf_dir, "topk_orders_per_customer")
    assert s.has_window_group_limit, "rank filter must push into window sort"


def test_q3_uses_take_ordered(spark, sf_dir):
    s = _stats(spark, sf_dir, "q3_shipping_priority")
    assert s.has_take_ordered, "ORDER BY + LIMIT must compile to top-k, not full sort"


def test_range_join_avoids_nested_loop(spark, sf_dir):
    s = _stats(spark, sf_dir, "range_join_ship_window")
    assert not s.has_bnlj and not s.has_cartesian, (
        "bucketed range join must be an equi join"
    )


def test_similarity_broadcasts_queries(spark, sf_dir):
    s = _stats(spark, sf_dir, "similarity_topk_cosine")
    assert s.broadcast_exchanges >= 1, "query vectors must broadcast"
    assert s.has_window_group_limit
