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


def test_q19_disjunction_pushes_to_both_scans(spark, sf_dir):
    """The OR-of-conjuncts must reach BOTH parquet scans as derived
    single-side filters (brand/size on part, quantity on lineitem), and the
    common p_partkey key must keep the join an equi broadcast join."""
    s = _stats(spark, sf_dir, "q19_disjunctive_join")
    assert s.broadcast_exchanges >= 1, "part must broadcast"
    assert not s.has_cartesian and not s.has_bnlj
    assert any("l_quantity" in p for p in s.pushed_filters), s.pushed_filters
    assert any("p_brand" in p for p in s.pushed_filters), s.pushed_filters


def test_q21_stays_equi_join(spark, sf_dir):
    """The only-late-supplier rewrite must not degrade to cartesian/BNLJ,
    and the orderstatus filter must reach the orders scan."""
    s = _stats(spark, sf_dir, "q21_waiting_supplier")
    assert not s.has_cartesian and not s.has_bnlj
    assert any("o_orderstatus" in p for p in s.pushed_filters), s.pushed_filters


def test_q2_correlated_min_is_single_shuffle(spark, sf_dir):
    """Window-MIN rewrite of the correlated subquery: one shuffle on the
    correlation key, one scan — not the agg+self-join's two of each."""
    s = _stats(spark, sf_dir, "q2_min_cost_per_part")
    assert s.shuffle_exchanges == 1, s.text
    assert s.parquet_scans == 1


def test_grouping_sets_single_pass(spark, sf_dir):
    """GROUPING SETS must expand in one scan + one aggregate exchange, not
    one scan per grouping set."""
    s = _stats(spark, sf_dir, "grouping_sets_customer")
    assert s.shuffle_exchanges == 1, s.text
    assert s.parquet_scans == 1


def test_lateral_decorrelates_to_group_limit(spark, sf_dir):
    """The correlated LATERAL + LIMIT must decorrelate to a WindowGroupLimit
    plan (no per-row re-execution, no nested loop)."""
    s = _stats(spark, sf_dir, "lateral_topn_per_nation")
    assert s.has_window_group_limit, s.text
    assert not s.has_cartesian and not s.has_bnlj
    assert s.shuffle_exchanges == 1, s.text


def test_neardup_uses_banded_equi_join(spark, sf_dir):
    """Candidate generation must be the banded LSH equi-join — a
    BroadcastNestedLoopJoin/CartesianProduct here is the O(n²) all-pairs
    plan regressing back in."""
    s = _stats(spark, sf_dir, "embedding_cosine_neardup")
    assert not s.has_bnlj and not s.has_cartesian, s.text


def test_q6_predicates_reach_scan(spark, sf_dir):
    """Q6 is the canonical pushdown probe: shipdate+discount+quantity must
    all appear in PushedFilters; the whole query is one agg exchange."""
    s = _stats(spark, sf_dir, "q6_forecast_revenue")
    joined = " ".join(s.pushed_filters)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in joined, (col, s.pushed_filters)
    assert s.shuffle_exchanges == 1, s.text


def test_q10_uses_take_ordered(spark, sf_dir):
    s = _stats(spark, sf_dir, "q10_returned_items")
    assert s.has_take_ordered, "ORDER BY + LIMIT 20 must compile to top-k"


def test_q17_correlated_avg_is_single_window_shuffle(spark, sf_dir):
    """The per-part avg must ride a window over one l_partkey exchange —
    not the naive agg + re-join (two exchanges on the fact)."""
    s = _stats(spark, sf_dir, "q17_small_quantity_revenue")
    # one window exchange + the final singleton agg exchange
    assert s.shuffle_exchanges <= 2, s.text
    assert not s.has_bnlj and not s.has_cartesian


def test_decontamination_is_hash_equi_join(spark, sf_dir):
    """The 13-gram overlap must join on the 60-bit gram hash (equi,
    partitionable) — never a nested loop; and the tokenizer must not
    block column pruning (only doc_id + text reach the scan)."""
    s = _stats(spark, sf_dir, "corpus_decontamination")
    assert not s.has_bnlj and not s.has_cartesian, s.text


def test_dq_audit_single_scan_per_agg_table(spark, sf_dir):
    """Each per-table check family must collapse into ONE conditional
    aggregation (no per-check scans): lineitem appears twice (agg + RI
    anti join), orders three times (agg + both anti-join sides), docs and
    events once each, customer once — 8 scans total, not 14."""
    s = _stats(spark, sf_dir, "dq_audit")
    assert s.parquet_scans <= 8, s.text
    assert not s.has_bnlj and not s.has_cartesian


def test_semantic_dedup_keeps_banded_edges(spark, sf_dir):
    """The keep-list composes the banded near-dup join + label propagation;
    the final universe join must stay equi. (The CC fixpoint runs eagerly
    inside the builder, so the returned plan is the final join.)"""
    s = _stats(spark, sf_dir, "semantic_dedup_keeplist")
    assert not s.has_bnlj and not s.has_cartesian, s.text


def test_pii_redaction_is_pure_projection(spark, sf_dir):
    """The redaction pass must stay a zero-shuffle codegen'd scan —
    the only shape that survives a 100 TB corpus."""
    s = _stats(spark, sf_dir, "pii_redaction")
    assert s.shuffle_exchanges == 0, s.text
    assert s.parquet_scans == 1


def test_weighted_sample_is_pure_filter(spark, sf_dir):
    s = _stats(spark, sf_dir, "corpus_hash_weighted_sample")
    assert s.shuffle_exchanges == 0, s.text


def test_anomaly_zscore_single_shuffle(spark, sf_dir):
    """One partition-by-user exchange; the cumulative frame must not
    introduce extra exchanges."""
    s = _stats(spark, sf_dir, "events_anomaly_zscore")
    assert s.shuffle_exchanges == 1, s.text


def test_merge_is_shuffle_join_no_bnlj(spark, sf_dir):
    """MERGE must be a key-partitioned join with no broadcast/nested-loop
    assumption — source can be target-sized."""
    s = _stats(spark, sf_dir, "merge_scd1_customer")
    assert not s.has_bnlj and not s.has_cartesian, s.text


def test_kmeans_assignment_broadcasts_centroids(spark, sf_dir):
    """Each assignment round must broadcast the (k x d)-row centroid
    relation — a shuffle join on dim would move the corpus k x d times."""
    s = _stats(spark, sf_dir, "kmeans_fixed_point")
    assert s.broadcast_exchanges >= 1, s.text
    assert not s.has_cartesian and not s.has_bnlj


def test_sequence_packing_single_global_window(spark, sf_dir):
    """Packing is one global-window cumsum + one agg — no joins."""
    s = _stats(spark, sf_dir, "sequence_packing_bins")
    assert not s.has_cartesian and not s.has_bnlj
    assert s.parquet_scans == 1


def test_substring_spans_is_hash_only(spark, sf_dir):
    """Substring-span dedup must stay hash-agg + semi join on 8-byte window
    hashes — no nested loop, no cartesian, and no raw-string shuffle key."""
    s = _stats(spark, sf_dir, "dedup_substring_spans")
    assert not s.has_bnlj and not s.has_cartesian, s.text


def test_containment_is_inverted_index_join(spark, sf_dir):
    """Containment pairs come from the shingle equi-join — never all-pairs."""
    s = _stats(spark, sf_dir, "dedup_containment_pairs")
    assert not s.has_bnlj and not s.has_cartesian, s.text


def test_charclass_profile_is_pure_projection(spark, sf_dir):
    """The char-class profile is a single codegen projection: zero shuffles."""
    s = _stats(spark, sf_dir, "text_charclass_profile")
    assert s.shuffle_exchanges == 0, s.text
    assert s.parquet_scans == 1


def test_mad_zscore_no_global_window(spark, sf_dir):
    """Both median phases partition by user_id — a global (unpartitioned)
    window would be a single-task sort at scale."""
    s = _stats(spark, sf_dir, "events_mad_robust_zscore")
    assert "windowspecdefinition(user_id" in s.text or "PARTITION BY" not in s.text
    assert not s.has_bnlj and not s.has_cartesian


def test_asof_next_order_single_pattern(spark, sf_dir):
    """Forward as-of must stay the union-and-carry shape: no nested loop,
    no cartesian — one user_id-keyed window pass."""
    s = _stats(spark, sf_dir, "asof_join_next_order")
    assert not s.has_bnlj and not s.has_cartesian, s.text


def test_incremental_minhash_no_bnlj(spark, sf_dir):
    """Delta-vs-corpus candidates come from the (band,sig) equi join."""
    s = _stats(spark, sf_dir, "dedup_minhash_incremental")
    assert not s.has_bnlj and not s.has_cartesian, s.text


def test_random_projection_is_pure_projection(spark, sf_dir):
    """The JL matrix is plan constants: one scan, zero shuffles."""
    s = _stats(spark, sf_dir, "embedding_random_projection")
    assert s.shuffle_exchanges == 0, s.text
    assert s.parquet_scans == 1


def test_ohlc_single_shuffle(spark, sf_dir):
    """Both row_number windows and the final agg share one (user, hour)
    hash partitioning — the whole candle query is a single exchange."""
    s = _stats(spark, sf_dir, "events_ohlc_bars")
    assert s.shuffle_exchanges == 1, s.text


def test_rfm_ranks_are_bucket_partitioned(spark, sf_dir):
    """All rank windows partition by (mname, bucket) — no global ntile; the
    only BNLJ rows are 1-row broadcast enrichments (max date, n)."""
    s = _stats(spark, sf_dir, "customer_rfm_scores")
    assert s.text.count("windowspecdefinition(mname") >= 2, "bucketed rank windows missing"
    assert not s.has_cartesian
    # 9 fresh / 11 when a prior test's cached base changes exchange reuse —
    # the pin is "bucketed windows, no global ntile", not the exact count
    assert s.shuffle_exchanges <= 12, s.shuffle_exchanges


def test_cohort_ltv_windows_over_aggregate(spark, sf_dir):
    """The cumulative window runs over the cohort×month aggregate, not raw
    orders — no nested loop, bounded window input."""
    s = _stats(spark, sf_dir, "cohort_ltv_matrix")
    assert not s.has_bnlj and not s.has_cartesian


def test_dau_wau_broadcasts_day_spine(spark, sf_dir):
    """The 7-day range join streams the big distinct-pairs side against a
    broadcast day spine — the only nested-loop rows are spine-sized."""
    s = _stats(spark, sf_dir, "events_dau_wau")
    assert s.broadcast_exchanges >= 1, s.text
    assert not s.has_cartesian


def test_basket_pairs_join_on_order_key(spark, sf_dir):
    """Pair generation is the ok-equi self-join (Σ basket², linear in
    orders) — no brand×brand nested loop."""
    s = _stats(spark, sf_dir, "basket_affinity_lift")
    assert not s.has_cartesian
    assert s.has_take_ordered, "top-k must compile to TakeOrderedAndProject"


def test_streaming_verify_fetch_is_broadcast_single_scan(spark, sf_dir, tmp_path):
    """The streaming incremental-dedup per-batch verify must fetch shingle
    sets through a BROADCAST of the exploded candidate edges against a
    SINGLE scan of the signature store: the store's array payloads are
    scanned, never shuffled, and the only shuffle is the candidate-sized
    per-pair groupBy. A regression to the r5 shape (two shuffle joins of
    the full store's arrays onto the candidates) re-creates the
    store-sized array-carry whose dfcap twin spilled 34 GB at 100x."""
    from change_data_capture_spark.plans import plan_stats
    from change_data_capture_spark.streaming.streaming_queries import (
        _verify_candidate_pairs,
    )

    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(i, [f"s{i}", f"s{i+1}", "common"], 3) for i in range(50)],
        "doc_id bigint, sh_set array<string>, n int",
    ).write.parquet(store)
    cand = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a bigint, doc_b bigint"
    )
    s = plan_stats(_verify_candidate_pairs(spark.read.parquet(store), cand))
    assert s.broadcast_exchanges >= 1, s.text
    # plan_stats.parquet_scans counts every "(n) Scan" including the
    # LocalRelation/ExistingRDD scan of the fixture cand — count the
    # parquet store scan specifically
    import re

    assert len(re.findall(r"^\(\d+\) Scan parquet", s.text, re.M)) == 1, (
        "store must be scanned exactly once"
    )
    assert s.shuffle_exchanges == 1, "only the per-pair groupBy may shuffle"
    assert "array_intersect" in s.text
    assert not s.has_bnlj and not s.has_cartesian


def test_banded_store_join_has_no_store_side_exchange(spark, tmp_path):
    """The streaming dedup stores are persisted PRE-BUCKETED on their
    band join keys, so the per-micro-batch candidate join must read the
    store in bucket layout with ZERO store-side Exchange and ZERO Sort:
    the only shuffle in the join is the delta-sized batch side, and the
    hash table builds there (ShuffledHashJoin, not SortMergeJoin). A
    regression to the pre-r8 shape — recomputing + shuffling the whole
    store's band relation every batch — is O(store) network per
    delta-sized tick, the structural scale-killer the r6/r7 verdicts
    flagged. Also pins that APPENDED bucket files keep the layout (the
    store grows per batch in production)."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.operators.maintenance import write_bucketed
    from change_data_capture_spark.streaming.streaming_queries import (
        _BAND_STORE_BUCKETS,
        _banded_store_join,
    )

    def bands(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).cast("int").alias("band"),
            (F.col("id") % 13).alias("bv"),
            F.col("id").alias("simhash"),
        )

    tbl, path = "t_band_store_pin", str(tmp_path / "band_store")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_bucketed(bands(0, 200), tbl, ["band", "bv"], _BAND_STORE_BUCKETS, path)
    # batch append keeps the bucket layout (multiple files per bucket)
    write_bucketed(
        bands(200, 260), tbl, ["band", "bv"], _BAND_STORE_BUCKETS, path,
        mode="append",
    )
    j = _banded_store_join(bands(260, 300), spark.table(tbl), ["band", "bv"])
    s = plan_stats(j)
    assert s.shuffle_exchanges == 1, s.text  # batch side ONLY
    assert "ShuffledHashJoin" in s.text and "SortMergeJoin" not in s.text
    assert "Bucketed: true" in s.text, "store must scan in bucket layout"
    # correctness across the appended files: every key collision pairs up
    expected_pairs = bands(260, 300).alias("a").join(
        bands(0, 300).alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bv") == F.col("b.bv"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    ).count()
    assert j.count() == expected_pairs

    # OPTIMIZE-style bin-pack: appends left multiple files per bucket;
    # compaction must merge to ONE file per non-empty bucket (proving the
    # rewrite never redistributed rows across buckets), keep the catalog
    # bucket layout, and leave the join plan byte-identical in shape
    import os
    from collections import Counter

    from change_data_capture_spark.operators.maintenance import compact_bucketed

    def bucket_file_counts():
        return Counter(
            f.rsplit("_", 1)[-1].split(".")[0]
            for _r, _d, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )

    assert max(bucket_file_counts().values()) > 1, "append must pre-fragment"
    rows_before = sorted(spark.table(tbl).collect())
    n = compact_bucketed(spark, tbl, ["band", "bv"], _BAND_STORE_BUCKETS, path)
    counts = bucket_file_counts()
    assert set(counts.values()) == {1} and sum(counts.values()) == n
    assert sorted(spark.table(tbl).collect()) == rows_before
    j2 = _banded_store_join(bands(260, 300), spark.table(tbl), ["band", "bv"])
    s2 = plan_stats(j2)
    assert s2.shuffle_exchanges == 1, s2.text  # still batch side ONLY
    assert "ShuffledHashJoin" in s2.text and "SortMergeJoin" not in s2.text
    assert "Bucketed: true" in s2.text, "compacted store must keep the layout"
    assert j2.count() == expected_pairs
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_containment_dfcap_prunes_index_and_verifies_on_sets(spark, sf_dir):
    """The df-cap containment plan's two load-bearing shapes: (a) the
    candidate index is built from the DF-FILTERED shingle relation — a
    left-semi join against the df∈[2,CAP] keys must survive in the plan
    (a regression re-joining the full shingle table brings back the
    O(Σ df²) hot-shingle blow-up); (b) verification scores collected
    shingle-set arrays via array_intersect — one row per candidate pair —
    instead of re-joining the per-shingle relation (measured 8 s vs 5 s
    at sf0.1, and the gap widens with corpus size)."""
    s = _stats(spark, sf_dir, "dedup_containment_dfcap")
    assert "LeftSemi" in s.text, "df filter must prune the candidate index"
    assert "array_intersect" in s.text, "verify must score collected sets"
    assert not s.has_bnlj and not s.has_cartesian, s.text


def test_simhash_pairing_verifies_inline_no_sig_joins(spark, sf_dir):
    """The SimHash pairing (batch form; the streaming form shares the
    shape) must verify with an INLINE popcount on signatures carried
    through the band rows — filtered BEFORE the pair distinct. The plan
    therefore holds exactly the band self-join plus the distinct; a
    regression to doc-level signature fetch joins (or to the streaming
    form's old broadcast-edge fetch, which ballooned to a 75M-row
    broadcast on a dense 100x corpus) adds shuffles beyond this pin."""
    from change_data_capture_spark.operators.dedup_queries import (
        simhash_hamming_neardup,
    )
    from change_data_capture_spark.plans import plan_stats

    s = plan_stats(simhash_hamming_neardup(spark, sf_dir))
    # 2 exchanges feed the band self-join + 1 for the pair distinct;
    # the removed signature joins would add two more
    assert s.shuffle_exchanges <= 3, s.text
    assert "bit_count" in s.text, "verify must be the inline popcount"
    assert not s.has_bnlj and not s.has_cartesian


def test_dv_read_is_one_broadcast_anti_join_clean_path_unchanged(spark, tmp_path):
    """Deletion-vector reads have exactly the plan they claim: (1) a
    snapshot WITHOUT vectors scans plain — zero joins, zero exchanges,
    the byte-identical pre-DV plan; (2) after a DV DELETE the same read
    adds ONE BroadcastExchange (the sidecar relation) feeding a
    BroadcastHashJoin LeftAnti on (_metadata.file_path, row_index) — no
    shuffle exchange, no BNLJ/cartesian, because the DV side is bounded
    by deleted rows, never the table."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.plans import plan_stats
    from change_data_capture_spark.sources import txlog

    t = str(tmp_path / "t")
    df = (
        spark.range(200)
        .select(F.col("id"), (F.col("id") * 1.0).alias("price"))
        .repartitionByRange(4, "id")
    )
    txlog.commit(
        t, add=txlog.write_files(df, t, stats_cols=["id"]), expected_version=0
    )
    clean = plan_stats(txlog.read_version(spark, t))
    assert clean.shuffle_exchanges == 0 and clean.broadcast_exchanges == 0
    assert "Join" not in clean.text
    txlog.delete_where(spark, t, "id IN (3, 5)", dv_fraction_threshold=0.5)
    dv = plan_stats(txlog.read_version(spark, t))
    assert dv.shuffle_exchanges == 0, dv.text
    assert dv.broadcast_exchanges == 1, dv.text
    assert "BroadcastHashJoin" in dv.text and "LeftAnti" in dv.text, dv.text
    assert not dv.has_bnlj and not dv.has_cartesian


def test_column_mapped_read_is_zero_shuffle_projection(spark, tmp_path):
    """Column mapping's read cost is ONE codegen projection: the scan
    plans under the frozen physical schema and a zero-shuffle Project
    renames to the snapshot's logical names — no join, no exchange, no
    extra scan, which is why a RENAME on a 100 TB table changes nothing
    about its read plan but the output names."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.plans import plan_stats
    from change_data_capture_spark.sources import txlog

    t = str(tmp_path / "t")
    txlog.commit(
        t, add=[], expected_version=0,
        metadata={"schema": "id BIGINT, name STRING"},
    )
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    txlog.commit(t, add=txlog.validated_write(df, t), expected_version=1)
    before = plan_stats(txlog.read_version(spark, t))
    txlog.rename_column(t, "name", "title")
    after = plan_stats(txlog.read_version(spark, t))
    assert after.shuffle_exchanges == 0 and after.broadcast_exchanges == 0
    assert "Join" not in after.text
    assert after.parquet_scans == before.parquet_scans == 1
    # the physical scan still reads the frozen on-disk name; only the
    # projection's output carries the logical one
    assert "name" in after.text and "title" in after.text
