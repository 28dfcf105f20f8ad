"""Oracle parity + plan-shape pins for the round-3 analytics widening
(interval union, bucketed Pareto prefix sum, BPE pair counting, exact
mean-pooling, domain token budgets, quality-based cluster reps)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from change_data_capture_spark.plans import plan_stats
from tests.oracle import compare

NEW_QUERIES = [
    "interval_union_coverage",
    "orders_pareto_abc",
    "bpe_pair_counts",
    "embedding_mean_pool",
    "domain_token_budget",
    "cluster_rep_best_quality",
    "attribution_last_touch",
    "triangle_count_neardup",
    "heavy_hitters_cms",
    "bloom_novelty_probe",
    "embedding_dim_stats",
    "ewma_monthly_revenue",
    "null_semantics_audit",
    "corpus_decontamination_bloom",
    "corpus_decontamination_bloom_sharded",
    "corpus_decontamination_sharding_sweep",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    compare(name, spark, sf_dir, entrymod.queries(), entrymod.oracle_sql())


def _stats(spark, sf_dir, name):
    return plan_stats(entrymod.queries()[name](spark, sf_dir))


def test_interval_union_single_fact_shuffle(spark, sf_dir):
    """Both windows and both aggregates must reuse the one suppkey
    exchange; the orders join must stay an equi join."""
    s = _stats(spark, sf_dir, "interval_union_coverage")
    assert not s.has_cartesian and not s.has_bnlj
    assert "windowspecdefinition(suppkey" in s.text, s.text
    # one suppkey exchange (+ at most one for the orders join side)
    assert s.shuffle_exchanges <= 2, s.text


def test_pareto_has_no_global_customer_window(spark, sf_dir):
    """The cumulative sum must run under partitionBy(bucket) — a
    windowspec that leads with the revenue ordering (no partition
    column) is the single-partition global window regressing back."""
    s = _stats(spark, sf_dir, "orders_pareto_abc")
    assert "hashpartitioning(bucket" in s.text, s.text
    assert "windowspecdefinition(revenue" not in s.text, (
        "global revenue-ordered window found (single-partition sort)"
    )


def test_bpe_pairs_single_agg_exchange_topk(spark, sf_dir):
    """Pair counting must partial-aggregate map-side (one exchange on the
    pair vocabulary) and take the top-50 via TakeOrderedAndProject, not a
    global sort."""
    s = _stats(spark, sf_dir, "bpe_pair_counts")
    assert s.shuffle_exchanges == 1, s.text
    assert s.has_take_ordered, s.text


def test_mean_pool_single_exchange(spark, sf_dir):
    s = _stats(spark, sf_dir, "embedding_mean_pool")
    assert s.shuffle_exchanges == 1, s.text
    assert s.parquet_scans == 1


def test_token_budget_window_partitioned_by_source(spark, sf_dir):
    s = _stats(spark, sf_dir, "domain_token_budget")
    assert "windowspecdefinition(source" in s.text, s.text
    assert s.shuffle_exchanges == 1, s.text


def test_attribution_single_user_shuffle(spark, sf_dir):
    """Last-touch carry must be one window over one user_id exchange — no
    purchases×touches self-join."""
    s = _stats(spark, sf_dir, "attribution_last_touch")
    assert s.shuffle_exchanges == 1, s.text
    assert s.parquet_scans == 1
    assert "windowspecdefinition(user_id" in s.text, s.text


def test_triangles_stay_equi_joins(spark, sf_dir):
    """Oriented-edge triangle closure must be equi joins (middle-vertex +
    semi close) — never a cartesian/BNLJ pair enumeration."""
    s = _stats(spark, sf_dir, "triangle_count_neardup")
    assert not s.has_cartesian and not s.has_bnlj, s.text


def test_cms_probe_broadcasts_sketch(spark, sf_dir):
    """The probe side must broadcast the constant-size sketch; heavy
    hitters come from TakeOrderedAndProject, not a global sort."""
    s = _stats(spark, sf_dir, "heavy_hitters_cms")
    assert s.broadcast_exchanges >= 1, s.text
    assert s.has_take_ordered, s.text


def test_bloom_bits_broadcast(spark, sf_dir):
    """The Bloom set-bit table (bounded by m=2^18 rows) must broadcast —
    shuffling the reference side is the exact-join plan this fast path
    exists to avoid. Pins the lazy plan builder: the registered gate
    returns a materialized cache (whose formatted explain duplicates
    operators across AQE initial/final renderings)."""
    from change_data_capture_spark.operators.analytics_queries import (
        _bloom_probe_plan,
    )

    result, grams = _bloom_probe_plan(spark, sf_dir)
    try:
        s = plan_stats(result)
        assert s.broadcast_exchanges >= 1, s.text
        assert not s.has_cartesian and not s.has_bnlj
    finally:
        grams.unpersist()


def test_bloom_novelty_prod_path_has_no_shuffle_join(spark, sf_dir):
    """The PRODUCTION novelty gate must carry the property the audit twin
    cannot: NO JOIN ANYWHERE — the Bloom filter is a 4096-long bitset
    literal probed with pure bit arithmetic inside one projection. ANY
    join operator here means either the exact ref-side join (O(corpus)
    shuffle per tick) or the set-bit-table probe join (k× row explosion +
    per-gram re-agg, the form measured 11.7× superlinear at 300×) leaked
    back into the fast path. The only exchanges left are the gram dedup
    and the per-doc agg the result needs anyway."""
    from change_data_capture_spark.operators.analytics_queries import (
        _bloom_novelty_plan,
    )

    result, grams = _bloom_novelty_plan(spark, sf_dir)
    try:
        s = plan_stats(result)
        assert "Join" not in s.text, s.text
        # gram dedup (shown inside the persisted relation's plan) + per-doc
        # agg; the cached-plan rendering can surface the dedup exchange twice
        assert s.shuffle_exchanges <= 3, s.text
        assert not s.has_cartesian and not s.has_bnlj
    finally:
        grams.unpersist()


def test_bloom_second_mk_point_matches_oracle(spark, sf_dir):
    """(m, k) are real parameters, not baked-in constants: at a second
    point (m = 2^12, k = 5 — small enough that false positives actually
    fire) the Spark result must still match the DuckDB oracle built from
    the same (m, k)."""
    from change_data_capture_spark.operators.analytics_queries import (
        _bloom_novelty_plan,
        _bloom_prod_oracle,
    )
    from tests.oracle import compare_frames, duck_connection

    result, grams = _bloom_novelty_plan(spark, sf_dir, m=4096, k=5)
    try:
        got = result.toPandas()
    finally:
        grams.unpersist()
    con = duck_connection(sf_dir)
    want = con.sql(_bloom_prod_oracle(m=4096, k=5)).df()
    con.close()
    compare_frames("ngram_novelty_bloom[m=4096,k=5]", got, want)
    # an undersized filter must actually saturate toward flagging
    # (otherwise this point proves nothing about the parameterization)
    assert got["n_flagged"].sum() > 0


def test_bloom_broadcast_transport_matches_literal(spark, sf_dir):
    """Past the literal ceiling the bitset ships as a one-row broadcast
    relation — same bits, same result. Pin: the broadcast transport's
    output equals the literal transport's at the same (m, k), and its
    plan carries exactly the one broadcast of the bitmap row."""
    from change_data_capture_spark.operators.analytics_queries import (
        _bloom_novelty_plan,
    )

    lit_res, lit_grams = _bloom_novelty_plan(spark, sf_dir, m=65536, k=2)
    try:
        lit_rows = {
            r["doc_id"]: (r["n_grams"], r["n_flagged"]) for r in lit_res.collect()
        }
    finally:
        lit_grams.unpersist()
    bc_res, bc_grams = _bloom_novelty_plan(
        spark, sf_dir, m=65536, k=2, bitmap_transport="broadcast"
    )
    try:
        s = plan_stats(bc_res)
        assert s.broadcast_exchanges >= 1, s.text
        bc_rows = {
            r["doc_id"]: (r["n_grams"], r["n_flagged"]) for r in bc_res.collect()
        }
    finally:
        bc_grams.unpersist()
    assert lit_rows == bc_rows


def test_bloom_prod_matches_audit_flags(spark, sf_dir):
    """The production gate's per-doc (n_grams, n_flagged, bloom_novelty)
    must equal the audit twin's — same filter, same probes, minus the
    exact columns."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    prod = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"], round(r["bloom_novelty"], 9))
        for r in qs["ngram_novelty_bloom"](spark, sf_dir).collect()
    }
    audit = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"], round(r["bloom_novelty"], 9))
        for r in qs["bloom_novelty_probe"](spark, sf_dir).collect()
    }
    assert prod == audit


def test_decontam_bloom_prod_path_has_no_shuffle_join(spark, sf_dir):
    """The Bloom decontamination gate carries the same production
    property as the novelty gate: NO JOIN ANYWHERE — the eval-side
    bitset rides the plan as a literal, the train side streams through
    one k-probe projection. A join here means the exact-join form (full
    train-gram shuffle per run) leaked back into the fast path."""
    from change_data_capture_spark.operators.analytics_queries import (
        _decontam_bloom_plan,
    )

    # measure the FRESH plan: the registered gate caches its result, and a
    # matching cached subtree from an earlier test re-renders with extra
    # exchanges
    spark.catalog.clearCache()
    result, grams = _decontam_bloom_plan(spark, sf_dir)
    try:
        s = plan_stats(result)
        assert "Join" not in s.text, s.text
        assert s.shuffle_exchanges <= 3, s.text
        assert not s.has_cartesian and not s.has_bnlj
    finally:
        grams.unpersist()


def test_decontam_bloom_second_mk_point_matches_oracle(spark, sf_dir):
    """(m, k) are real parameters on the decontamination gate too: at an
    undersized point (m = 2^12, k = 5) false positives actually fire and
    the Spark result must still match the oracle built at the same
    (m, k)."""
    from change_data_capture_spark.operators.analytics_queries import (
        _decontam_bloom_oracle,
        _decontam_bloom_plan,
    )
    from tests.oracle import compare_frames, duck_connection

    result, grams = _decontam_bloom_plan(spark, sf_dir, m=4096, k=5)
    try:
        got = result.toPandas()
    finally:
        grams.unpersist()
    con = duck_connection(sf_dir)
    want = con.sql(_decontam_bloom_oracle(m=4096, k=5)).df()
    con.close()
    compare_frames("corpus_decontamination_bloom[m=4096,k=5]", got, want)
    # the undersized filter must actually over-flag (saturation direction)
    assert got["contaminated"].sum() > 0


def test_bloom_param_validation_raises_at_the_boundary(spark, sf_dir):
    """Bad (m, k, transport) must fail with a clear ValueError at plan
    build, not an opaque error deep inside expression construction."""
    from change_data_capture_spark.operators.analytics_queries import (
        _bloom_novelty_plan,
        _decontam_bloom_plan,
    )

    for bad_kwargs, msg in [
        (dict(m=100), "multiple of 64"),
        (dict(m=0), "multiple of 64"),
        (dict(k=0), "positive hash count"),
        (dict(k=-1), "positive hash count"),
        (dict(bitmap_transport="carrier-pigeon"), "unknown bitmap_transport"),
        (dict(hash_family="sha0"), "unknown hash_family"),
    ]:
        with pytest.raises(ValueError, match=msg):
            _bloom_novelty_plan(spark, sf_dir, **bad_kwargs)
        with pytest.raises(ValueError, match=msg):
            _decontam_bloom_plan(spark, sf_dir, **bad_kwargs)


def test_bloom_xxhash64_family_no_false_negatives(spark, sf_dir):
    """The production hash family (xxhash64 — JVM intrinsic, not
    DuckDB-reproducible, hence no oracle) must keep the two properties
    that define a Bloom filter regardless of family: identical per-doc
    gram counts (the family touches only positions, never the gram
    relation) and NO false negatives against the exact overlap."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.operators.analytics_queries import (
        _decontam_bloom_plan,
        _decontam_grams,
    )

    res, grams = _decontam_bloom_plan(spark, sf_dir, hash_family="xxhash64")
    try:
        bloom = {
            r["doc_id"]: (r["n_grams"], r["n_flagged"], r["contaminated"])
            for r in res.collect()
        }
    finally:
        grams.unpersist()
    res_md5, grams_md5 = _decontam_bloom_plan(spark, sf_dir)
    try:
        md5_n = {r["doc_id"]: r["n_grams"] for r in res_md5.collect()}
    finally:
        grams_md5.unpersist()
    assert {d: v[0] for d, v in bloom.items()} == md5_n
    g = _decontam_grams(spark, sf_dir)
    try:
        ev = g.where(~F.col("is_train")).select("gh").distinct()
        exact = (
            g.where("is_train")
            .join(ev, "gh")
            .groupBy("doc_id")
            .agg(F.countDistinct("gh").alias("n"))
        )
        exact_counts = {r["doc_id"]: r["n"] for r in exact.collect()}
    finally:
        g.unpersist()
    assert exact_counts
    for doc, n in exact_counts.items():
        n_grams, n_flagged, contaminated = bloom[doc]
        assert contaminated == 1 and n_flagged >= n, doc


def test_decontam_bloom_never_misses_exact_contamination(spark, sf_dir):
    """Bloom decontamination's error is one-sided — the property that
    makes it SAFE to run alone in a removal pipeline: every train
    document with REAL eval overlap must be flagged (no false
    negatives), and per doc the Bloom gram-flag count dominates the
    exact shared-gram count."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.operators.analytics_queries import (
        _decontam_grams,
    )

    grams = _decontam_grams(spark, sf_dir)
    try:
        ev = grams.where(~F.col("is_train")).select("gh").distinct()
        exact = (
            grams.where("is_train")
            .join(ev, "gh")
            .groupBy("doc_id")
            .agg(F.countDistinct("gh").alias("n_exact"))
        )
        exact_counts = {r["doc_id"]: r["n_exact"] for r in exact.collect()}
    finally:
        grams.unpersist()
    assert exact_counts, "fixture must contain real train/eval overlap"
    bloom = {
        r["doc_id"]: (r["n_flagged"], r["contaminated"])
        for r in entrymod.queries()["corpus_decontamination_bloom"](
            spark, sf_dir
        ).collect()
    }
    for doc, n_exact in exact_counts.items():
        n_flagged, contaminated = bloom[doc]
        assert contaminated == 1, doc
        assert n_flagged >= n_exact, doc


def test_cluster_rep_uses_group_limit(spark, sf_dir):
    """The per-component rank-1 pick must push into the window sort."""
    s = _stats(spark, sf_dir, "cluster_rep_best_quality")
    assert s.has_window_group_limit, s.text
    assert not s.has_cartesian and not s.has_bnlj


def test_decontam_bloom_sharded_routes_via_one_broadcast_join(spark, sf_dir):
    """The sharded transport's plan shape IS the claim: train grams route
    to their shard's bitset through exactly one broadcast equi-join on
    the shard id — no sort-merge join (which would shuffle the train
    gram relation), no cartesian/nested-loop fallback (which would probe
    every shard instead of the matching one)."""
    from change_data_capture_spark.operators.analytics_queries import (
        _decontam_bloom_sharded_plan,
    )

    spark.catalog.clearCache()
    result, grams = _decontam_bloom_sharded_plan(spark, sf_dir)
    try:
        s = plan_stats(result)
        assert "BroadcastHashJoin" in s.text, s.text
        assert "SortMergeJoin" not in s.text, s.text
        assert not s.has_cartesian and not s.has_bnlj
        assert s.broadcast_exchanges == 1, s.text
        assert s.shuffle_exchanges <= 3, s.text
    finally:
        grams.unpersist()


def test_decontam_bloom_sharded_never_misses_exact_contamination(
    spark, sf_dir
):
    """Sharding must not change the filter's one-sided error: every train
    document with real eval overlap stays flagged (a cross-shard routing
    bug would turn misrouted probes into false NEGATIVES — the one
    failure mode a decontamination filter must never have), and the
    per-doc flag count still dominates the exact shared-gram count."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.operators.analytics_queries import (
        _decontam_grams,
    )

    grams = _decontam_grams(spark, sf_dir)
    try:
        ev = grams.where(~F.col("is_train")).select("gh").distinct()
        exact = (
            grams.where("is_train")
            .join(ev, "gh")
            .groupBy("doc_id")
            .agg(F.countDistinct("gh").alias("n_exact"))
        )
        exact_counts = {r["doc_id"]: r["n_exact"] for r in exact.collect()}
    finally:
        grams.unpersist()
    assert exact_counts, "fixture must contain real train/eval overlap"
    sharded = {
        r["doc_id"]: (r["n_flagged"], r["contaminated"])
        for r in entrymod.queries()["corpus_decontamination_bloom_sharded"](
            spark, sf_dir
        ).collect()
    }
    for doc, n_exact in exact_counts.items():
        n_flagged, contaminated = sharded[doc]
        assert contaminated == 1, doc
        assert n_flagged >= n_exact, doc


def test_decontam_bloom_sharded_second_point_matches_oracle(spark, sf_dir):
    """(m, k, shards) are real parameters: at an undersized (m = 2^12,
    k = 5) point with 8 shards the per-shard false positives actually
    fire, and the Spark result must still match the oracle built at the
    identical parameters — including the shard-local collision pattern."""
    from change_data_capture_spark.operators.analytics_queries import (
        _decontam_bloom_sharded_oracle,
        _decontam_bloom_sharded_plan,
    )
    from tests.oracle import compare_frames, duck_connection

    result, grams = _decontam_bloom_sharded_plan(
        spark, sf_dir, shards=8, m=4096, k=5
    )
    try:
        got = result.toPandas()
    finally:
        grams.unpersist()
    con = duck_connection(sf_dir)
    want = con.sql(
        _decontam_bloom_sharded_oracle(m=4096, k=5, shards=8)
    ).df()
    con.close()
    compare_frames(
        "corpus_decontamination_bloom_sharded[m=4096,k=5,s=8]", got, want
    )
    assert got["contaminated"].sum() > 0


def test_decontam_bloom_sharded_validates_shard_count(spark, sf_dir):
    """A non-power-of-two shard count cannot range-shard a binary hash
    space evenly — it must fail loudly at plan build."""
    from change_data_capture_spark.operators.analytics_queries import (
        _decontam_bloom_sharded_plan,
    )

    for bad in (0, 3, -4):
        with pytest.raises(ValueError, match="power of two"):
            _decontam_bloom_sharded_plan(spark, sf_dir, shards=bad)


def test_sharding_sweep_monotone_and_anchored(spark, sf_dir):
    """Structural guarantees of the shard-count sweep: (1) recall is
    1.0 everywhere (Bloom has no false negatives: n_false_pos >= 0 with
    n_flagged >= n_exact); (2) flags are NON-INCREASING as shards grow —
    probe positions are shard-independent, so a finer shard's set bits
    are a SUBSET of its coarser parent's and a k-hit at 2s implies one
    at s; (3) the shards=1 row is bit-identical to the UNSHARDED filter
    at the same (m, k) — routing through one shard is the identity."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.operators.analytics_queries import (
        corpus_decontamination_sharding_sweep,
    )

    rows = {
        r["shards"]: r
        for r in corpus_decontamination_sharding_sweep(spark, sf_dir).collect()
    }
    assert sorted(rows) == [1, 2, 4, 8, 16]
    for s, r in rows.items():
        assert r["n_false_pos"] >= 0, s
        assert r["n_flagged"] == r["n_exact"] + r["n_false_pos"]
        assert r["n_probes"] == rows[1]["n_probes"]  # same probe volume
    for s in (1, 2, 4, 8):
        assert rows[2 * s]["n_flagged"] <= rows[s]["n_flagged"]
    # anchor: shards=1 == the unsharded production filter's totals
    unsharded = (
        entrymod.queries()["corpus_decontamination_bloom"](spark, sf_dir)
        .agg(
            F.sum("n_grams").alias("p"),
            F.sum("n_flagged").alias("f"),
            F.sum("contaminated").alias("d"),
        )
        .collect()[0]
    )
    assert (rows[1]["n_probes"], rows[1]["n_flagged"], rows[1]["n_docs_flagged"]) == (
        unsharded["p"], unsharded["f"], unsharded["d"],
    )
