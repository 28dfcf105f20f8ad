"""Property test for the distributed rank primitive + empty-input totality
for the orders-tier session additions."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-(10**8), max_value=10**8), min_size=1, max_size=80
    )
)
def test_ranks_long_form_equals_global_row_number(spark, vals):
    """The bucketed two-phase rank must equal a plain global row_number
    over (value, key) for ANY integer metric distribution — including
    all-equal values (single bucket) and adversarial ranges."""
    from change_data_capture_spark.operators.analytics_queries import (
        _ranks_long_form,
    )

    base = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k bigint, m bigint"
    )
    got = {
        r.k: r.rank
        for r in _ranks_long_form(base, ["m"], "k").collect()
    }
    expect = {
        k: i + 1
        for i, (m, k) in enumerate(sorted((v, i) for i, v in enumerate(vals)))
    }
    assert got == expect


_ORDERS_TIER = [
    "customer_rfm_scores",
    "cohort_ltv_matrix",
    "nation_balance_percentiles",
    "nation_revenue_share",
    "basket_affinity_lift",
    "orders_seasonality_decomposition",
    "skew_key_diagnostics",
    "late_arriving_dim_inferred",
]


@pytest.fixture(scope="module")
def empty_tpch_dir(tmp_path_factory, spark):
    """Zero-row twins of every TPC-H-ish fixture table (schema from the
    real sf0.001 files)."""
    d = str(tmp_path_factory.mktemp("empty_tpch"))
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


@pytest.mark.parametrize("name", _ORDERS_TIER)
def test_orders_tier_total_on_empty_input(spark, empty_tpch_dir, name):
    """A zero-row fact table (routine at scale: an empty partition, a new
    tenant) must yield a well-defined result, never a crash."""
    out = entrymod.queries()[name](spark, empty_tpch_dir)
    assert out.count() == 0 or name == "skew_key_diagnostics"
    # skew diagnostics on empty input: one row of NULL/zero stats is fine,
    # zero rows is fine — it only must not error (agg over empty yields one
    # row with count 0)


_R5_DEDUP_TIER = [
    "simhash_hamming_neardup",
    "dedup_containment_dfcap",
    "dedup_containment_recall_sweep",
    "corpus_split_neardup_safe",
    # r6: the streaming drain pre-seeds its pair log with a zero-row
    # schema-carrying file, so a drain in which no batch emits a pair
    # read-backs as a typed empty frame instead of a parquet
    # schema-inference error (ADVICE r5)
    "streaming_dedup_minhash_incremental",
    "streaming_dedup_simhash_incremental",
]


@pytest.mark.parametrize("name", _R5_DEDUP_TIER)
def test_r5_dedup_tier_total_on_empty_corpus(spark, empty_tpch_dir, name):
    """A zero-row documents table must yield a well-formed empty result —
    no division crash, no empty-aggregate error, no degenerate stacked rows
    (the recall sweep's n_true_pairs>0 guard is exactly this contract)."""
    df = entrymod.queries()[name](spark, empty_tpch_dir)
    assert df.count() == 0
    assert len(df.schema.fields) >= 2
