"""A/B/C measurement harness (round 6 evidence, frozen) for the streaming incremental-dedup verify shape.

A = r5 shipped: full-store sa/sb join (store-sized array shuffle per batch)
B = broadcast-semi prune via collected candidate ids
C = exploded-edge broadcast join + per-pair groupBy (single store scan)

Interleaved x3 in one session so host drift hits all variants equally.
"""
import os
import sys
import tempfile
import time as _time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from change_data_capture_spark.session import get_spark
from change_data_capture_spark.operators.dedup_queries import (
    _DELTA_MOD,
    JACCARD_THRESHOLD,
    corpus,
    doc_shingles,
    minhash_band_rel,
    minhash_signature_rel,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("prune-ab", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()


def run(variant: str) -> tuple[float, int]:
    ws = tempfile.mkdtemp(prefix=f"ab_{variant}_")
    store = f"{ws}/sig_store"
    pairs_dir = f"{ws}/pairs"
    c = corpus(spark, SF_DIR)
    is_delta = F.col("doc_id") % _DELTA_MOD == 0

    def _with_sets(docs: DataFrame) -> DataFrame:
        sh = doc_shingles(docs)
        return minhash_signature_rel(sh).join(
            sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("sh_set")),
            "doc_id",
        )

    tb0 = _time.perf_counter()
    _with_sets(c.where(~is_delta)).write.mode("overwrite").parquet(store)
    print(f"  bootstrap(store build): {_time.perf_counter()-tb0:.2f}s", flush=True)

    delta = c.where(is_delta).select("doc_id", "text")
    slices = f"{ws}/slices"
    os.makedirs(slices)
    now = _time.time()
    for i in (0, 1):
        half = delta.where(((F.col("doc_id") / _DELTA_MOD).cast("long") % 2) == i)
        hdir = f"{ws}/h{i}"
        half.coalesce(1).write.mode("overwrite").parquet(hdir)
        part = [f for f in os.listdir(hdir) if f.endswith(".parquet")][0]
        dst = f"{slices}/slice_{i}.parquet"
        os.rename(f"{hdir}/{part}", dst)
        os.utime(dst, (now + i, now + i))

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        tp0 = _time.perf_counter()
        batch_store = _with_sets(batch_df).persist()
        union_store = spark.read.parquet(store).unionByName(batch_store)
        a = minhash_band_rel(batch_store).alias("a")
        b = minhash_band_rel(union_store).alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            )
            .distinct()
        )
        if variant == "A":
            sa = union_store.select(
                F.col("doc_id").alias("doc_a"),
                F.col("sh_set").alias("set_a"),
                F.col("n").alias("na"),
            )
            sb = union_store.select(
                F.col("doc_id").alias("doc_b"),
                F.col("sh_set").alias("set_b"),
                F.col("n").alias("nb"),
            )
            n_common = F.size(F.array_intersect("set_a", "set_b"))
            jac = n_common.cast("double") / (F.col("na") + F.col("nb") - n_common)
            out = (
                cand.join(sa, "doc_a")
                .join(sb, "doc_b")
                .select("doc_a", "doc_b", jac.alias("jaccard"))
                .where(F.col("jaccard") >= JACCARD_THRESHOLD)
            )
        elif variant == "B":
            cand = cand.persist()
            cand_ids = (
                cand.select(F.col("doc_a").alias("doc_id"))
                .unionAll(cand.select(F.col("doc_b").alias("doc_id")))
                .distinct()
            )
            pruned = union_store.join(F.broadcast(cand_ids), "doc_id", "left_semi")
            sa = pruned.select(
                F.col("doc_id").alias("doc_a"),
                F.col("sh_set").alias("set_a"),
                F.col("n").alias("na"),
            )
            sb = pruned.select(
                F.col("doc_id").alias("doc_b"),
                F.col("sh_set").alias("set_b"),
                F.col("n").alias("nb"),
            )
            n_common = F.size(F.array_intersect("set_a", "set_b"))
            jac = n_common.cast("double") / (F.col("na") + F.col("nb") - n_common)
            out = (
                cand.join(sa, "doc_a")
                .join(sb, "doc_b")
                .select("doc_a", "doc_b", jac.alias("jaccard"))
                .where(F.col("jaccard") >= JACCARD_THRESHOLD)
            )
        else:  # C
            edge = cand.select(
                "doc_a",
                "doc_b",
                F.explode(F.array("doc_a", "doc_b")).alias("doc_id"),
            )
            fetched = union_store.select("doc_id", "sh_set", "n").join(
                F.broadcast(edge), "doc_id"
            )
            per_pair = fetched.groupBy("doc_a", "doc_b").agg(
                F.collect_list("sh_set").alias("sets"),
                F.sum("n").alias("n_sum"),
            )
            n_common = F.size(
                F.array_intersect(F.col("sets")[0], F.col("sets")[1])
            )
            jac = n_common.cast("double") / (F.col("n_sum") - n_common)
            out = per_pair.select(
                "doc_a", "doc_b", jac.alias("jaccard")
            ).where(F.col("jaccard") >= JACCARD_THRESHOLD)
        out.write.mode("append").parquet(pairs_dir)
        batch_store.write.mode("append").parquet(store)
        if variant == "B":
            cand.unpersist()
        batch_store.unpersist()
        print(f"  batch {batch_id}: {_time.perf_counter()-tp0:.2f}s", flush=True)

    t0 = _time.perf_counter()
    q = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(slices)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", f"{ws}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = _time.perf_counter() - t0
    n = spark.read.parquet(pairs_dir).count()
    spark.catalog.clearCache()
    return dt, n


variants = sys.argv[2].split(",") if len(sys.argv) > 2 else ["A", "B", "C"]
rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
for rnd in range(rounds):
    for v in variants:
        dt, n = run(v)
        print(f"round{rnd} variant {v}: drain {dt:.2f}s rows={n}", flush=True)
