"""Oracle parity for the relational operator closure."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare

RELATIONAL = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q14_promo_revenue",
    "q18_large_orders",
    "q7_nation_volume",
    "join_left_semi",
    "correlated_above_avg_orders",
    "q4_late_shipments",
    "q12_priority_shipmode",
    "q19_disjunctive_join",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "q2_min_cost_per_part",
    "churned_customers",
    "join_left_anti",
    "topk_orders_per_customer",
    "rollup_nation_segment",
    "setops_nation_coverage",
    "window_running_total",
    "window_lead_lag_rank",
    "scalar_string_funcs",
    "scalar_datetime_funcs",
    "scalar_math_funcs",
    "predicates_conditionals",
    # round-2 TPC-H widening (operators/tpch_queries.py)
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_parts_suppliers",
    "q17_small_quantity_revenue",
    "q20_potential_promotion",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_oracle_parity(spark, sf_dir, name):
    compare(name, spark, sf_dir, entrymod.queries(), entrymod.oracle_sql())
