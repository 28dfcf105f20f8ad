#!/usr/bin/env python
"""10× scale smoke: replicate the sf0.1 fixtures to ~sf1 (6M lineitem rows)
with shifted keys, then run the heavy headline queries. Purpose: catch plans
that only work at toy scale (pair blow-ups, driver collects, quadratic
per-row expressions) before a real cluster does. Not part of CI — run
manually: ``python tools/scale_smoke.py``.

Key shifting keeps referential integrity: all foreign keys of replica *i*
are offset by i × 10_000_000, so joins fan out exactly as at sf0.1 — data
volume scales 10× while join selectivity stays constant (what a bigger
TPC-H sf does).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from change_data_capture_spark.session import get_spark  # noqa: E402
from change_data_capture_spark.sources.tables import load_table  # noqa: E402

COPIES = 10
SHIFT = 10_000_000

#: key columns to shift per table (dimension keys stay shared — nation and
#: region are genuinely low-cardinality at any scale)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}

QUERIES = [
    "scd2_products",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "topk_orders_per_customer",
    "q12_priority_shipmode",
    "q19_disjunctive_join",
    "q21_waiting_supplier",
    "q2_min_cost_per_part",
    "dedup_connected_components",
    "window_running_total",
    "events_sessionization",
    "asof_join_last_order",
    "range_join_ship_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_topk_cosine",
    "text_quality_stats",
    # round-4/5 additions with recorded 100× points (BENCH.md)
    "dedup_containment_dfcap",
    "events_dau_wau_approx",
    "multimodal_video_nal_index",
    "simhash_hamming_neardup",
    "streaming_dedup_minhash_incremental",
    "corpus_split_neardup_safe",
    "scd2_schema_evolution",
    "multimodal_audio_energy_windows",
    # round-6/8 additions with recorded 100× points (BENCH.md)
    "streaming_dedup_simhash_incremental",
    "txlog_merge_upsert",
    "txlog_delete_where",
    "txlog_vacuum_retention",
    "txlog_schema_evolution_read",
    "streaming_scd2_txlog",
    # round-9 additions
    "txlog_update_where",
    "ngram_novelty_bloom",
    "streaming_anomaly_zscore_ttl",
    # round-10 additions
    "txlog_history",
    "streaming_dedup_compact_midstream",
    "corpus_decontamination_bloom",
    # round-12 additions
    "txlog_delete_dv",
    "streaming_txlog_cdf_feed",
    "streaming_txlog_rate_limit",
    "corpus_decontamination_sharding_sweep",
]


def replicate(spark, src: str, out: str, copies: int, decorrelate: bool = False) -> None:
    """Replicate with shifted keys. With ``decorrelate``, replica content is
    made DISTINCT across copies: document tokens get a per-replica prefix
    (every 5-gram differs → replicas are not near-dups of each other) and
    embedding dims get a deterministic per-replica sign flip (cosine between
    replicas decorrelates; norms and within-replica geometry preserved).
    Default (identical content) turns every doc into a ``copies``-clique —
    an ADVERSARIAL construction whose pair/triangle work is quadratic/cubic
    in copies by construction; decorrelate measures a realistic corpus at
    ``copies``× volume with the base corpus's duplicate density."""
    for t, keys in KEYED.items():
        base = load_table(spark, src, t)
        if keys:
            replicas = []
            for i in range(copies):
                r = base
                for k in keys:
                    r = r.withColumn(k, F.col(k) + F.lit(i * SHIFT))
                if decorrelate and i > 0 and t == "documents":
                    r = r.withColumn(
                        "text", F.regexp_replace("text", r"(\S+)", f"r{i}$1")
                    )
                if decorrelate and i > 0 and t == "embeddings":
                    r = r.withColumn(
                        "embedding",
                        F.expr(
                            f"transform(embedding, (x, idx) -> x * "
                            f"CAST(pmod(hash({i}, idx), 2) * 2 - 1 AS FLOAT))"
                        ),
                    )
                replicas.append(r)
            big = replicas[0]
            for r in replicas[1:]:
                big = big.unionAll(r)
        else:
            big = base
        big.write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=COPIES)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: full smoke list)")
    ap.add_argument("--data-dir", default=None,
                    help="reuse an existing replicated dir (skips replication)")
    ap.add_argument("--runs", type=int, default=1,
                    help="timed runs per query (reports min)")
    ap.add_argument("--decorrelate", action="store_true",
                    help="make replica content distinct (realistic dup "
                         "density) instead of copies-sized cliques")
    ap.add_argument("--isolate", action="store_true",
                    help="run each query in a FRESH subprocess/JVM. At "
                         "≥300× a single shared 48g heap accumulates GC "
                         "pressure across queries and runs (measured: the "
                         "same q3 plan 17.9 s and 70.3 s back-to-back), so "
                         "min-of-N within one JVM stops isolating the plan "
                         "cost; a fresh heap per query does — at the price "
                         "of paying JVM+codegen warm-up once per query. "
                         "Requires --data-dir (the subprocesses share it).")
    args = ap.parse_args()

    if args.isolate:
        import re
        import subprocess
        import sys as _sys

        assert args.data_dir, "--isolate needs --data-dir (shared fixtures)"
        names = args.queries.split(",") if args.queries else QUERIES
        total = 0.0
        failed: list[str] = []
        for name in names:
            child = [_sys.executable, os.path.abspath(__file__),
                     "--data-dir", args.data_dir, "--copies", str(args.copies),
                     "--runs", str(args.runs), "--queries", name]
            if args.decorrelate:
                # harmless when --data-dir skips replication, but keeps the
                # child's invocation label identical to the parent's so a
                # child that DOES replicate (dir missing) builds the same data
                child.append("--decorrelate")
            proc = subprocess.run(child, capture_output=True, text=True)
            m = re.search(rf"^  {re.escape(name)}: ([0-9.]+)s$",
                          proc.stdout, flags=re.M)
            if not m:
                print(f"  {name}: FAILED\n{proc.stdout}\n{proc.stderr[-2000:]}")
                failed.append(name)
                continue
            dt = float(m.group(1))
            total += dt
            print(f"  {name}: {dt:.2f}s (isolated)", flush=True)
        suffix = f" — EXCLUDES {len(failed)} FAILED: {failed}" if failed else ""
        print(f"TOTAL ({args.copies}x sf0.1, isolated): {total:.1f}s{suffix}")
        if failed:
            _sys.exit(1)
        return

    # A 100×-data local test needs a realistic memory budget: the box has
    # 128 GiB and a real 32-executor slice would too. 8g (the unit-test
    # default) starves execution memory and reports false scale failures.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark("scale-smoke", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"
    if args.data_dir:
        out = args.data_dir
        if not os.path.exists(f"{out}/lineitem.parquet"):
            print(f"replicating {src} x{args.copies} -> {out}", flush=True)
            replicate(spark, src, out, args.copies, args.decorrelate)
    else:
        out = tempfile.mkdtemp(prefix=f"sf{args.copies}x_")
        print(f"replicating {src} x{args.copies} -> {out}", flush=True)
        replicate(spark, src, out, args.copies, args.decorrelate)
    print("data ready; running queries", flush=True)

    import __spark_entry__ as entry

    names = args.queries.split(",") if args.queries else QUERIES
    total = 0.0
    for name in names:
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            entry.queries()[name](spark, out).write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
            # between-runs cache clear: gates that return a materialized
            # (persisted) result would otherwise serve run 2 from run 1's
            # cache and min-of-N reports a replay, not the engine (same
            # fix + measurement as bench.py)
            spark.catalog.clearCache()
        dt = min(times)
        total += dt
        print(f"  {name}: {dt:.2f}s", flush=True)
    print(f"TOTAL ({args.copies}x sf0.1): {total:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
