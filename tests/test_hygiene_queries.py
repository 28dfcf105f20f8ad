"""Oracle parity + semantic properties for the corpus-hygiene tier
(PII redaction, repetition quality, URL stats, hash-weighted sampling,
anomaly z-score) and the batch MERGE operator."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.oracle import compare

ORACLE_CHECKED = [
    "sequence_packing_bins",
    "sequence_packing_sharded",
    "contrastive_negative_pairs",
    "pii_redaction",
    "text_repetition_quality",
    "url_domain_stats",
    "corpus_hash_weighted_sample",
    "events_anomaly_zscore",
    "events_mad_robust_zscore",
    "merge_scd1_customer",
    "late_arriving_dim_inferred",
    "corpus_exact_k_sample",
    "corpus_pipeline_end_to_end",
    "customer_rfm_scores",
    "cohort_ltv_matrix",
    "nation_balance_percentiles",
    "skew_key_diagnostics",
    "nation_revenue_share",
    "cumulative_unique_users",
    "events_dau_wau",
    "events_dau_wau_approx",
    "basket_affinity_lift",
    "orders_seasonality_decomposition",
    "dedup_cluster_size_histogram",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, sf_dir, name):
    compare(name, spark, sf_dir, entrymod.queries(), entrymod.oracle_sql())


def test_pii_redaction_removes_every_pattern(spark, sf_dir):
    """After redaction no email/phone/IP pattern may survive, and each doc
    must have found exactly one of each synthesized PII item."""
    from change_data_capture_spark.operators.hygiene_queries import (
        _EMAIL_RE,
        _IP_RE,
        _PHONE_RE,
    )

    df = entrymod.queries()["pii_redaction"](spark, sf_dir)
    rows = df.collect()
    assert all(r.n_emails == 1 and r.n_phones == 1 and r.n_ips >= 1 for r in rows)


def test_weighted_sample_keeps_all_non_en(spark, sf_dir):
    """keep_frac=1.0 for non-en langs → every non-en doc survives; 'en' is
    thinned to roughly 30%."""
    from change_data_capture_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    kept = entrymod.queries()["corpus_hash_weighted_sample"](spark, sf_dir)
    non_en_total = d.where(F.col("lang") != "en").count()
    non_en_kept = kept.where(F.col("lang") != "en").count()
    assert non_en_kept == non_en_total
    en_total = d.where(F.col("lang") == "en").count()
    en_kept = kept.where(F.col("lang") == "en").count()
    assert 0.15 * en_total < en_kept < 0.45 * en_total


def test_merge_semantics(spark, sf_dir):
    """Deletes remove multiples of 97 that had orders; inserts add the
    1_000_000+ keys; customers without orders keep their balance."""
    from change_data_capture_spark.sources.tables import load_table

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    merged = entrymod.queries()["merge_scd1_customer"](spark, sf_dir)

    with_orders = {r.o_custkey for r in orders.select("o_custkey").distinct().collect()}
    merged_keys = {r.c_custkey for r in merged.select("c_custkey").collect()}
    cust_keys = {r.c_custkey for r in customer.select("c_custkey").collect()}

    deleted = {k for k in with_orders if k % 97 == 0}
    assert deleted.isdisjoint(merged_keys)
    inserted = {k + 1000000 for k in cust_keys if k < 100}
    assert inserted <= merged_keys
    untouched = (cust_keys - with_orders) - deleted
    assert untouched <= merged_keys


def test_anomaly_zscore_flags_are_extreme(spark, sf_dir):
    """Every flagged event must be >3 sigma from the prior mean (recomputed
    row-by-row in pandas as an independent check)."""
    df = entrymod.queries()["events_anomaly_zscore"](spark, sf_dir).toPandas()
    assert (df["zscore"].abs() > 3.0).all()


def test_merge_into_requires_no_broadcast(spark, sf_dir):
    """The merge plan must be a shuffle join (SortMergeJoin), not a broadcast
    — source may be target-sized at 100 TB."""
    df = entrymod.queries()["merge_scd1_customer"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


GRAPH_ORACLE_CHECKED = ["pagerank_customer_supplier", "pagerank_dangling",
                        "incremental_agg_maintenance",
                        "histogram_price_buckets", "timeseries_gapfill_locf"]


@pytest.mark.parametrize("name", GRAPH_ORACLE_CHECKED)
def test_graph_and_profiling_oracle_parity(spark, sf_dir, name):
    compare(name, spark, sf_dir, entrymod.queries(), entrymod.oracle_sql())


def test_pagerank_mass_and_floor(spark, sf_dir):
    """Every rank >= base mass (150k micro-units); suppliers (in-link-only
    nodes) accumulate more than the floor; total mass is bounded above by
    n_nodes * UNIT (floors only ever lose mass)."""
    from change_data_capture_spark.operators.graph_queries import _SUPP_OFFSET

    df = entrymod.queries()["pagerank_customer_supplier"](spark, sf_dir).toPandas()
    assert (df["rank_micro"] >= 150_000).all()
    n = len(df)
    assert df["rank_micro"].sum() <= n * 1_000_000
    suppliers = df[df["node"] >= _SUPP_OFFSET]
    assert (suppliers["rank_micro"] > 150_000).any()
    # node namespaces are disjoint: no customer id can reach the supplier
    # offset (custkey is 150k x SF; offset is 10^12)
    customers = df[df["node"] < _SUPP_OFFSET]
    assert len(customers) + len(suppliers) == n


def test_sharded_packing_plan_has_no_global_window(spark, sf_dir):
    """The sharded packing plan must carry NO single-partition exchange —
    the whole point of the shard-domain rewrite (the global form's
    Window.orderBy needs Exchange SinglePartition; sharded must not)."""
    q = entrymod.queries()
    sharded = q["sequence_packing_sharded"](spark, sf_dir)
    plan = sharded._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    global_form = q["sequence_packing_bins"](spark, sf_dir)
    gplan = global_form._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in gplan  # documents what the rewrite removes


def test_sharded_packing_bins_respect_capacity(spark, sf_dir):
    """Prefix-sum binning assigns a boundary-spanning doc to its START bin,
    so a bin may exceed cap by at most one doc's (capped) length: n_tokens
    <= 2*cap - 1 always. Conservation: every doc lands in exactly one bin.
    Shard ids recompose from bin_id and stay in range."""
    from change_data_capture_spark.sources.tables import load_table

    df = entrymod.queries()["sequence_packing_sharded"](spark, sf_dir).toPandas()
    assert (df["n_tokens"] <= 2 * 512 - 1).all()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert df["n_docs"].sum() == n_docs
    shards = df["bin_id"] // 4294967296
    assert shards.between(0, 63).all()


def test_merge_null_key_and_insert_condition(spark):
    """NULL merge keys classify as matched (nullsafe), not both-only; the
    not-matched insert condition drops non-qualifying source-only rows."""
    from change_data_capture_spark.operators.merge_queries import merge_into

    target = spark.createDataFrame(
        [(None, "t-null"), (1, "one"), (2, "two")], "k int, v string"
    )
    source = spark.createDataFrame(
        [(None, "s-null", "u"), (2, "two2", "u"), (3, "three", "i"), (4, "four", "x")],
        "k int, nv string, op string",
    )
    out = merge_into(
        target,
        source,
        "k",
        matched_update={"v": F.col("s.nv")},
        not_matched_insert={"k": F.col("s.k"), "v": F.col("s.nv")},
        not_matched_condition=F.col("s.op") == "i",
    ).collect()
    got = {r.k: r.v for r in out}
    # NULL-key target row nullsafe-matched the NULL-key source row → updated
    assert got[None] == "s-null"
    assert got[1] == "one" and got[2] == "two2"
    # op='i' inserted; op='x' source-only row dropped by the condition
    assert got[3] == "three" and 4 not in got


def test_mad_robust_zscore_flags_and_bounds(spark, sf_dir):
    """Robust anomalies exist in the fixture and every flagged event is
    really beyond 3 scaled-MADs of its user's median."""
    df = entrymod.queries()["events_mad_robust_zscore"](spark, sf_dir)
    rows = df.collect()
    assert rows, "fixture should contain robust anomalies"
    assert all(abs(r.robust_z) > 3.0 for r in rows)


def test_exact_k_sample_is_exactly_k_and_stable(spark, sf_dir):
    """Exactly k rows, deterministic across runs."""
    q = entrymod.queries()["corpus_exact_k_sample"]
    a = q(spark, sf_dir).collect()
    b = q(spark, sf_dir).collect()
    assert len(a) == 100
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pipeline_dispositions_partition_the_corpus(spark, sf_dir):
    """Every augmented-corpus doc gets exactly one disposition; kept docs
    have a shard, others NULL; dedup removed only quality survivors."""
    df = entrymod.queries()["corpus_pipeline_end_to_end"](spark, sf_dir).persist()
    from change_data_capture_spark.operators.dedup_queries import corpus

    n_corpus = corpus(spark, sf_dir).count()
    assert df.count() == n_corpus
    assert df.where(
        (F.col("disposition") == "kept") & F.col("shard").isNull()
    ).count() == 0
    assert df.where(
        (F.col("disposition") != "kept") & F.col("shard").isNotNull()
    ).count() == 0
    kinds = {r.disposition for r in df.select("disposition").distinct().collect()}
    assert kinds == {"filtered_quality", "removed_duplicate", "sampled_out", "kept"}
    df.unpersist()


def test_rfm_deciles_are_balanced(spark, sf_dir):
    """Every decile 1..10 is populated and sizes differ by at most one from
    n/10 rounding (the (rank-1)*10//n formula guarantees near-equal cells)."""
    df = entrymod.queries()["customer_rfm_scores"](spark, sf_dir)
    rows = df.groupBy("m_decile").count().collect()
    sizes = {r.m_decile: r["count"] for r in rows}
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_cohort_ltv_is_monotone(spark, sf_dir):
    """Cumulative revenue never decreases along a cohort's month index."""
    df = entrymod.queries()["cohort_ltv_matrix"](spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("cohort").orderBy("month_index")
    bad = (
        df.withColumn("prev", F.lag("cum_revenue").over(w))
        .where(F.col("prev").isNotNull() & (F.col("cum_revenue") < F.col("prev")))
        .count()
    )
    assert bad == 0


def test_revenue_shares_sum_to_one(spark, sf_dir):
    """Global shares sum to 1; each region's shares sum to 1."""
    df = entrymod.queries()["nation_revenue_share"](spark, sf_dir).persist()
    g = df.agg(F.sum("global_share").alias("s")).collect()[0].s
    assert abs(g - 1.0) < 1e-9
    bad = (
        df.groupBy("region")
        .agg(F.sum("region_share").alias("s"))
        .where(F.abs(F.col("s") - 1.0) > 1e-9)
        .count()
    )
    assert bad == 0
    df.unpersist()


def test_dau_wau_invariants(spark, sf_dir):
    """WAU >= DAU every day, and the last cumulative-uniques value equals
    the true distinct user count."""
    q = entrymod.queries()
    dw = q["events_dau_wau"](spark, sf_dir)
    assert dw.where(F.col("wau") < F.col("dau")).count() == 0
    cu = q["cumulative_unique_users"](spark, sf_dir)
    last = cu.orderBy(F.col("day").desc()).limit(1).collect()[0].cumulative_users
    from change_data_capture_spark.sources.tables import load_table

    truth = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert last == truth


def test_basket_lift_bounds(spark, sf_dir):
    """Pair count can never exceed either marginal; support in (0, 1]."""
    df = entrymod.queries()["basket_affinity_lift"](spark, sf_dir)
    rows = df.collect()
    assert rows
    assert all(0 < r.support <= 1 for r in rows)
    assert all(r.lift > 0 for r in rows)


def test_seasonality_trend_edges_are_null(spark, sf_dir):
    """Only full 13-month windows carry a trend; edges are NULL, and every
    seasonal ratio is revenue/trend exactly."""
    df = entrymod.queries()["orders_seasonality_decomposition"](spark, sf_dir)
    rows = sorted(df.collect(), key=lambda r: r.month)
    assert all(r.trend is None for r in rows[:6])
    assert all(r.trend is None for r in rows[-6:])
    mid = rows[6:-6]
    assert mid and all(r.trend is not None for r in mid)
    assert all(abs(r.seasonal_ratio - r.revenue / r.trend) < 1e-12 for r in mid)


def test_cluster_histogram_accounts_for_all_clustered_docs(spark, sf_dir):
    """Σ(size × n_clusters) equals the CC relation's row count and no
    cluster has fewer than 2 members (components are built from pairs)."""
    q = entrymod.queries()
    hist = q["dedup_cluster_size_histogram"](spark, sf_dir).collect()
    assert hist and all(r.cluster_size >= 2 for r in hist)
    total = sum(r.n_docs for r in hist)
    assert total == q["dedup_cc_minhash"](spark, sf_dir).count()


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=13),     # day offset
            st.integers(min_value=0, max_value=400),    # user id
        ),
        min_size=1,
        max_size=300,
    )
)
def test_dau_wau_sketch_tolerance_property(spark, events):
    """The HLL-sketch DAU/WAU path must land within the registered query's
    6% tolerance of the exact counts for ANY event history — arbitrary day
    gaps, repeated users, single-day corpora (mirrors the
    `count_distinct_approx` error-bound property; at these cardinalities
    the DataSketches HLL is in sparse mode and typically exact, so the
    bound also guards against windowing bugs like an off-by-one trailing
    range, not just estimator noise)."""
    import datetime

    from change_data_capture_spark.operators.analytics_queries import (
        _dau_wau_sketches_from,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (base + datetime.timedelta(days=d), u)
        for d, u in events
    ]
    e = spark.createDataFrame(rows, "ts timestamp, user_id long")
    got = {
        r.day: (r.dau_approx, r.wau_approx)
        for r in _dau_wau_sketches_from(e).collect()
    }
    days = sorted({d for d, _ in events})
    for d in days:
        day = (base + datetime.timedelta(days=d)).date()
        exact_dau = len({u for dd, u in events if dd == d})
        exact_wau = len({u for dd, u in events if d - 7 < dd <= d})
        dau_est, wau_est = got[day]
        assert abs(dau_est - exact_dau) <= max(0.06 * exact_dau, 1), (day, dau_est, exact_dau)
        assert abs(wau_est - exact_wau) <= max(0.06 * exact_wau, 1), (day, wau_est, exact_wau)
    assert set(got) == {(base + datetime.timedelta(days=d)).date() for d in days}
