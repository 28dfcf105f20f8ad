"""Round-3 analytics widening: interval union (gaps-and-islands over
real intervals), scalable Pareto/ABC classification (two-phase bucketed
prefix sum — no global window), distributed BPE pair counting (the first
merge step of tokenizer training), exact embedding mean-pooling,
per-domain token-budget capping, and quality-based duplicate-cluster
representative selection.

Reference parity: the reference (josephmachado/change_data_capture,
README.md:86-125) stops at SCD2/CDC SQL; these are the capability-closure
operators a training-data pipeline layered on the same tables needs
(SURVEY.md §2.B, LLM-data tier). All pure built-in expressions — zero
Python UDFs; every float aggregation routes through exact DECIMAL
arithmetic so the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from change_data_capture_spark.functions.text import tokens
from change_data_capture_spark.operators.common import materialize_and_release
from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Interval union (gaps-and-islands over real intervals, not point events)
# ---------------------------------------------------------------------------

_INTERVAL_UNION_ORACLE = """
WITH iv AS (
    SELECT l.l_suppkey AS suppkey,
           epoch_ms(o.o_orderdate) AS s,
           epoch_ms(l.l_shipdate) AS e,
           l.l_orderkey, l.l_linenumber
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
flagged AS (
    SELECT suppkey, s, e,
           CASE WHEN s > MAX(e) OVER (PARTITION BY suppkey
                    ORDER BY s, e, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR ROW_NUMBER() OVER (PARTITION BY suppkey
                    ORDER BY s, e, l_orderkey, l_linenumber) = 1
                THEN 1 ELSE 0 END AS new_island,
           l_orderkey, l_linenumber
    FROM iv
),
islands AS (
    SELECT suppkey, s, e,
           SUM(new_island) OVER (PARTITION BY suppkey
               ORDER BY s, e, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
    FROM flagged
),
merged AS (
    SELECT suppkey, island_id,
           MIN(s) AS island_start, MAX(e) AS island_end,
           COUNT(*) AS n_intervals
    FROM islands GROUP BY 1, 2
)
SELECT suppkey,
       COUNT(*) AS n_islands,
       CAST(SUM(n_intervals) AS BIGINT) AS n_intervals,
       CAST(SUM(island_end - island_start) AS BIGINT) AS covered_ms,
       MAX(island_end - island_start) AS longest_island_ms
FROM merged GROUP BY suppkey
"""


@query("interval_union_coverage", oracle=_INTERVAL_UNION_ORACLE)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per supplier: each lineitem spans a fulfillment
    window [o_orderdate, l_shipdate]; overlapping windows merge into
    maximal busy ISLANDS (classic gaps-and-islands generalized from point
    events to real intervals — an island break needs the next start to
    clear the running MAX of all previous ends, not just the previous
    row's end).

    Scale shape: one shuffle on suppkey; the flag, cumulative island id,
    and both aggregates all reuse that partitioning (single Exchange in
    the plan). The running max / cumsum windows are per-supplier, never
    global. The orders join broadcasts at fixture scale and
    shuffle-joins on o_orderkey at 100 TB — either way the window
    partitioning is untouched. Ordering includes (l_orderkey,
    l_linenumber) so tied timestamps sort identically in both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    iv = l.join(o, l.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("suppkey"),
        F.unix_millis("o_orderdate").alias("s"),
        F.unix_millis("l_shipdate").alias("e"),
        "l_orderkey",
        "l_linenumber",
    )
    order_cols = ["s", "e", "l_orderkey", "l_linenumber"]
    w = Window.partitionBy("suppkey").orderBy(*order_cols)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    prev_max_end = F.max("e").over(w_prev)
    new_island = (
        prev_max_end.isNull() | (F.col("s") > prev_max_end)
    ).cast("int")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = iv.select(
        "suppkey",
        "s",
        "e",
        F.sum(new_island).over(w_cum).alias("island_id"),
    )
    merged = islands.groupBy("suppkey", "island_id").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
    span = F.col("island_end") - F.col("island_start")
    return merged.groupBy("suppkey").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_intervals").alias("n_intervals"),
        F.sum(span).alias("covered_ms"),
        F.max(span).alias("longest_island_ms"),
    )


# ---------------------------------------------------------------------------
# Pareto / ABC classification — two-phase bucketed prefix sum (no global
# window)
# ---------------------------------------------------------------------------

_ABC_BUCKETS = 64

_PARETO_ORACLE = """
WITH rev AS (
    SELECT o_custkey AS custkey,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
    FROM orders GROUP BY 1
),
tot AS (SELECT SUM(revenue) AS total FROM rev),
cum AS (
    SELECT custkey, revenue,
           SUM(revenue) OVER (ORDER BY revenue DESC, custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
    FROM rev
)
SELECT c.custkey,
       CAST(c.revenue AS DOUBLE) AS revenue,
       CAST(c.cum_rev AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_share,
       CASE WHEN 2 * c.cum_rev <= t.total THEN 'A'
            WHEN 5 * c.cum_rev <= 4 * t.total THEN 'B'
            ELSE 'C' END AS abc_class
FROM cum c CROSS JOIN tot t
"""


@query("orders_pareto_abc", oracle=_PARETO_ORACLE)
def orders_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC customer classification: rank customers by revenue,
    cumulative revenue share, class A = first 50% of revenue, B = next
    30%, C = tail — without the single-partition global window the naive
    form needs.

    Two-phase DISTRIBUTED prefix sum: (1) revenue values hash into
    {n} ORDERED value-range buckets (monotone in revenue, so bucket
    order = global order); each bucket computes its local cumulative sum
    under ``partitionBy(bucket)`` in parallel; (2) per-bucket totals — a
    constant-size ({n}-row) aggregate — get exclusive running offsets,
    and ``global_cum = bucket_offset + local_cum``. The only ordered
    window over an unbounded row count in the naive plan becomes a
    window over {n} rows, scale-free at any corpus size. Class
    boundaries compare in exact DECIMAL (2·cum ≤ total, 5·cum ≤
    4·total), so the 50/80 cut points are tie-exact across engines.

    The DuckDB oracle runs the naive global window — identical output,
    which is the point: the bucketed plan is a pure physical rewrite."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue")
    )
    stats = rev.agg(
        F.min("revenue").alias("lo"),
        F.max("revenue").alias("hi"),
        F.sum("revenue").alias("total"),
    )
    # value-range bucket id, DESCENDING in revenue (bucket 0 = richest);
    # computed in double — purely internal, only monotonicity matters.
    b = rev.join(F.broadcast(stats)).select(
        "custkey",
        "revenue",
        "total",
        F.least(
            F.lit(_ABC_BUCKETS - 1),
            F.floor(
                (F.col("hi") - F.col("revenue")).cast("double")
                / ((F.col("hi") - F.col("lo")).cast("double") / _ABC_BUCKETS + 1e-9)
            ).cast("int"),
        ).alias("bucket"),
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy(F.col("revenue").desc(), "custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("local_cum", F.sum("revenue").over(w_local))
    offsets = (
        local.groupBy("bucket")
        .agg(F.sum("revenue").alias("bucket_total"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("bucket_total").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("decimal(18,2)"),
            ),
        )
        .select("bucket", "offset")
    )
    cum = local.join(F.broadcast(offsets), "bucket").withColumn(
        "cum_rev", (F.col("offset") + F.col("local_cum")).cast("decimal(28,2)")
    )
    return cum.select(
        "custkey",
        F.col("revenue").cast("double").alias("revenue"),
        (F.col("cum_rev").cast("double") / F.col("total").cast("double")).alias(
            "cum_share"
        ),
        F.when(2 * F.col("cum_rev") <= F.col("total"), "A")
        .when(5 * F.col("cum_rev") <= 4 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )


orders_pareto_abc.__doc__ = orders_pareto_abc.__doc__.format(n=_ABC_BUCKETS)


# ---------------------------------------------------------------------------
# Distributed BPE pair counting (tokenizer-training inner loop, step 1)
# ---------------------------------------------------------------------------

_BPE_TOP = 50

_BPE_PAIRS_ORACLE = f"""
WITH words AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
    FROM documents
),
pairs AS (
    SELECT substring(w, CAST(i.i AS INTEGER), 2) AS pair
    FROM words, unnest(range(1, length(w))) AS i(i)
    WHERE length(w) >= 2
)
SELECT pair, count(*) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT {_BPE_TOP}
"""


@query("bpe_pair_counts", oracle=_BPE_PAIRS_ORACLE)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner loop of BPE tokenizer training, distributed: count every
    adjacent symbol pair across the corpus and return the top-{k} merge
    candidates (count desc, pair asc — fully ordered so LIMIT is
    deterministic). One iteration = the argmax pair; training loops this
    with a merge table, which at 100 TB is exactly this job re-run with
    the pair vocabulary re-broadcast each round.

    Scale shape: explode(words) → per-word adjacent pairs via a
    ``transform(sequence(...))`` lambda (JVM codegen, no Python), then
    ONE hash aggregate — partial map-side combine collapses the pair
    stream to vocabulary size (|Σ|² ≈ a few thousand) before the single
    shuffle, and TakeOrderedAndProject handles the top-{k} without a
    global sort."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("w")).where(
        F.length("w") >= 2
    )
    # substring with a dynamic start needs the expr form (F.substring takes
    # only int positions)
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(_BPE_TOP)
    )


# ---------------------------------------------------------------------------
# Embedding mean-pooling (exact, per label)
# ---------------------------------------------------------------------------

_MEANPOOL_ORACLE = """
WITH flat AS (
    SELECT label,
           CAST(i.i AS INTEGER) - 1 AS dim,
           CAST(CAST(embedding[CAST(i.i AS INTEGER)] AS VARCHAR)
                AS DECIMAL(38,18)) AS v
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS i(i)
)
SELECT label, dim,
       CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mean_val,
       COUNT(*) AS n_vecs
FROM flat GROUP BY label, dim
"""


@query("embedding_mean_pool", oracle=_MEANPOOL_ORACLE)
def embedding_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label element-wise mean embedding (centroid pooling — the
    reduction behind class prototypes, cluster centroids, and
    chunk-to-document embedding pooling), long-form (label, dim).

    Float sums are order-dependent, so the sum routes through
    DECIMAL(38,18) via the float32's SHORTEST STRING form: both engines
    print a float with the Ryu shortest-roundtrip algorithm (≤ 9
    significant digits, identical value), the string parses into decimal
    exactly (fixture magnitudes need ≤ 14 fractional digits < 18), and
    decimal addition is associative — the Spark partial-agg tree and
    DuckDB's sequential fold produce the identical sum, making the mean
    bit-exact cross-engine. (A direct double→decimal cast is NOT
    portable: Spark rounds the shortest double repr, DuckDB converts the
    exact binary expansion — they differ in the low digits.) One shuffle on (label, dim) with
    map-side partial aggregation; posexplode is JVM-side codegen."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "label",
        "dim",
        F.col("val").cast("string").cast("decimal(38,18)").alias("v"),
    )
    n = F.count(F.lit(1))
    # decimal→double must ALSO go through the string form: Spark's decimal
    # cast is correctly rounded, DuckDB's int128→double→/10^scale double-
    # rounds (±1 ulp); both parse a decimal string correctly rounded.
    return flat.groupBy("label", "dim").agg(
        (F.sum("v").cast("string").cast("double") / n).alias("mean_val"),
        n.alias("n_vecs"),
    )


# ---------------------------------------------------------------------------
# Per-domain token-budget capping (data-mix curation)
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 20_000

_TOKEN_BUDGET_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source, n_chars,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
    FROM documents
),
ranked AS (
    SELECT doc_id, source, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_before
    FROM toks
)
SELECT doc_id, source, n_tokens,
       CAST(COALESCE(cum_before, 0) AS BIGINT) AS cum_before
FROM ranked
WHERE COALESCE(cum_before, 0) < {_BUDGET_TOKENS}
"""


@query("domain_token_budget", oracle=_TOKEN_BUDGET_ORACLE)
def domain_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token-budget capping: within each source domain, keep
    documents in quality order (n_chars desc — longest-first as the cheap
    quality proxy; doc_id tiebreak) until the domain's token budget
    ({b:,} tokens) is exhausted — the "cap overrepresented domains"
    step of a data-mix recipe. A doc is kept iff the EXCLUSIVE prefix
    sum of tokens before it is still under budget, so every domain gets
    at least one doc and never an arbitrary mid-doc cut.

    Scale shape: one shuffle on source; the ordered window is
    per-domain. Domains are a vocabulary (20 in the fixture, maybe
    thousands at 100 TB) — if a single domain is corpus-sized, the same
    hash-shard trick as ``sequence_packing_sharded`` subdivides it with
    a per-shard budget."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = toks.select(
        "doc_id",
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before"),
    )
    return ranked.where(F.col("cum_before") < _BUDGET_TOKENS)


domain_token_budget.__doc__ = domain_token_budget.__doc__.format(b=_BUDGET_TOKENS)


# ---------------------------------------------------------------------------
# Duplicate-cluster representative by quality (keep-best, not keep-min-id)
# ---------------------------------------------------------------------------


def _cc_minhash_oracle_body() -> str:
    from change_data_capture_spark.operators.dedup_queries import (
        _CC_MINHASH_ORACLE,
    )

    # reuse the recursive-CTE component oracle verbatim as a subquery
    return _CC_MINHASH_ORACLE.strip().removeprefix("WITH RECURSIVE")


_CLUSTER_REP_ORACLE = f"""
WITH RECURSIVE {_cc_minhash_oracle_body().rsplit("SELECT c.doc_id", 1)[0].rstrip().rstrip(",")},
comp_sized AS (
    SELECT c.doc_id, c.component_id, s.n_members
    FROM comp c
    JOIN (SELECT component_id, count(*) AS n_members FROM comp GROUP BY 1) s
      USING (component_id)
)
SELECT component_id, n_members,
       doc_id AS rep_doc_id,
       n_chars AS rep_n_chars
FROM (
    SELECT cs.component_id, cs.n_members, cs.doc_id, d.n_chars,
           ROW_NUMBER() OVER (PARTITION BY cs.component_id
               ORDER BY d.n_chars DESC, cs.doc_id) AS rn
    FROM comp_sized cs JOIN documents d USING (doc_id)
)
WHERE rn = 1
"""


@query("cluster_rep_best_quality", oracle=_CLUSTER_REP_ORACLE)
def cluster_rep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection for near-duplicate clusters: run
    connected components over the MinHash-LSH verified pair graph (the
    100 TB clustering path, see ``dedup_cc_minhash``), then keep the
    HIGHEST-QUALITY member per cluster (n_chars desc, doc_id tiebreak)
    instead of the arbitrary min-id — what production dedup actually
    ships, since the canonical copy should be the best copy.

    Scale shape: clustering inherits the banded-LSH O(collisions) edge
    path; the representative pick is one per-component
    WindowGroupLimit (rank-1 pushdown, no full sort materialization)
    over components joined to the documents dimension."""
    from change_data_capture_spark.operators.dedup_queries import dedup_cc_minhash

    comp = dedup_cc_minhash(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = comp.join(d, "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "component_id",
            "n_members",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").alias("rep_n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Marketing attribution: last-touch within a lookback window
# ---------------------------------------------------------------------------

_ATTR_LOOKBACK_MS = 7 * 24 * 3600 * 1000

_ATTRIBUTION_ORACLE = f"""
WITH stream AS (
    SELECT user_id, event_id, event_type, epoch_ms(ts) AS t,
           CASE WHEN event_type IN ('click', 'view') THEN event_type END
               AS touch_type,
           CASE WHEN event_type IN ('click', 'view') THEN epoch_ms(ts) END
               AS touch_t
    FROM events
),
carried AS (
    SELECT user_id, event_id, event_type, t,
           LAST_VALUE(touch_type IGNORE NULLS) OVER w AS last_touch_type,
           LAST_VALUE(touch_t IGNORE NULLS) OVER w AS last_touch_t
    FROM stream
    WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id AS purchase_event_id, t AS purchase_ms,
       CASE WHEN last_touch_t IS NOT NULL
                 AND t - last_touch_t <= {_ATTR_LOOKBACK_MS}
            THEN last_touch_type ELSE 'direct' END AS channel,
       CASE WHEN last_touch_t IS NOT NULL
                 AND t - last_touch_t <= {_ATTR_LOOKBACK_MS}
            THEN t - last_touch_t END AS touch_age_ms
FROM carried
WHERE event_type = 'purchase'
"""


@query("attribution_last_touch", oracle=_ATTRIBUTION_ORACLE)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent click/view STRICTLY BEFORE it (exclusive frame — a
    purchase can't attribute to a same-row touch) and within a 7-day
    lookback; otherwise 'direct'. The classic funnel-credit query.

    Scale shape: single shuffle on user_id; the carried last-touch is one
    ``last(..., ignoreNulls)`` over the per-user frame — no self-join of
    purchases against touches (the naive form shuffles the event stream
    twice and explodes on high-activity users). Because only the LAST
    touch can win, carrying one value is semantically complete: if it is
    outside the lookback, every earlier touch is too."""
    e = load_table(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("click", "view")
    stream = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis("ts").alias("t"),
        F.when(is_touch, F.col("event_type")).alias("touch_type"),
        F.when(is_touch, F.unix_millis("ts")).alias("touch_t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = stream.select(
        "user_id",
        "event_id",
        "event_type",
        "t",
        F.last("touch_type", ignorenulls=True).over(w).alias("last_touch_type"),
        F.last("touch_t", ignorenulls=True).over(w).alias("last_touch_t"),
    )
    in_window = F.col("last_touch_t").isNotNull() & (
        F.col("t") - F.col("last_touch_t") <= _ATTR_LOOKBACK_MS
    )
    return carried.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("t").alias("purchase_ms"),
        F.when(in_window, F.col("last_touch_type"))
        .otherwise("direct")
        .alias("channel"),
        F.when(in_window, F.col("t") - F.col("last_touch_t")).alias(
            "touch_age_ms"
        ),
    )


# ---------------------------------------------------------------------------
# Triangle counting over the near-dup graph (oriented-edge join)
# ---------------------------------------------------------------------------


def _minhash_pairs_prefix() -> str:
    from change_data_capture_spark.operators.dedup_queries import (
        _CC_MINHASH_ORACLE,
    )

    body = _CC_MINHASH_ORACLE.strip().removeprefix("WITH RECURSIVE")
    return body.split(",\nedges AS")[0].rstrip().rstrip(",")


_TRIANGLES_ORACLE = f"""
WITH {_minhash_pairs_prefix()},
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs)
SELECT e1.a AS doc_a, e1.b AS doc_b, e2.b AS doc_c
FROM e e1
JOIN e e2 ON e2.a = e1.b
WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.a = e1.a AND e3.b = e2.b)
"""


@query("triangle_count_neardup", oracle=_TRIANGLES_ORACLE)
def triangle_count_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the MinHash-LSH verified near-dup graph —
    the structural density signal behind cluster-quality audits (a clique
    of k exact copies contributes C(k,3) triangles; a chain contributes
    none, flagging borderline transitive merges before CC glues them).

    Scale shape: the ORIENTED-edge algorithm — every edge stored once as
    (a < b), paths e1(a,b)·e2(b,c) built by ONE equi join on the shared
    middle vertex, closed by a LEFT SEMI join on (a,c); each triangle
    a<b<c counted exactly once, no symmetric-edge blow-up, no cartesian.
    The edge list is persisted once (three consumers). Production hardens
    skew by orienting edges by DEGREE instead of id (caps the join
    fan-out of hub vertices at O(m^1.5) paths); id-orientation keeps the
    oracle exactly mirrorable and is identical output."""
    from change_data_capture_spark.operators.dedup_queries import dedup_minhash_lsh

    e = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).persist()
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    paths = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
        F.col("e1.a").alias("doc_a"),
        F.col("e1.b").alias("doc_b"),
        F.col("e2.b").alias("doc_c"),
    )
    closing = e.select(
        F.col("a").alias("doc_a"), F.col("b").alias("doc_c")
    )
    return paths.join(closing, ["doc_a", "doc_c"], "left_semi")


# ---------------------------------------------------------------------------
# Count-Min Sketch heavy hitters (exactly mirrorable sketch)
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 1024
_CMS_TOP = 30

_CMS_HASH_DUCK = (
    "CAST(('0x' || substr(md5('cms' || CAST({row} AS VARCHAR) || '|' || {tok}),"
    " 1, 15)) AS BIGINT) % " + str(_CMS_W)
)

_CMS_ORACLE = f"""
WITH toks AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents
),
exact AS (SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok),
top AS (SELECT tok, exact_n FROM exact ORDER BY exact_n DESC, tok LIMIT {_CMS_TOP}),
cells AS (
    SELECT s.s AS row_id,
           {_CMS_HASH_DUCK.format(row="s.s", tok="t.tok")} AS col_id,
           count(*) AS counter
    FROM toks t, unnest(range(0, {_CMS_D})) AS s(s)
    GROUP BY 1, 2
),
probes AS (
    SELECT p.tok, p.exact_n, s.s AS row_id,
           {_CMS_HASH_DUCK.format(row="s.s", tok="p.tok")} AS col_id
    FROM top p, unnest(range(0, {_CMS_D})) AS s(s)
)
SELECT p.tok, p.exact_n,
       CAST(MIN(c.counter) AS BIGINT) AS cms_estimate,
       CAST(MIN(c.counter) - p.exact_n AS BIGINT) AS overcount
FROM probes p JOIN cells c ON c.row_id = p.row_id AND c.col_id = p.col_id
GROUP BY p.tok, p.exact_n
"""


def _cms_cell(row: F.Column, tok: F.Column) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cms"), row.cast("string"), F.lit("|"), tok)),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W
    )


@query("heavy_hitters_cms", oracle=_CMS_ORACLE)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch heavy hitters: a {d}×{w} CMS over the corpus token
    stream, probed for the top-{k} exact tokens — estimate = min over the
    {d} hash rows, always ≥ the true count (one-sided error ≤ εN). The
    seeded-md5 hash family makes the sketch EXACTLY mirrorable in the
    oracle, so even the approximate path is hash-checked, and the
    ``overcount`` column is the measured sketch error, not a bound.

    Scale shape — why CMS is the 100 TB form of frequency tracking: the
    sketch is one aggregate whose output is a CONSTANT {d}·{w} = {dw}
    cells regardless of corpus size (map-side partial aggregation
    collapses each partition to ≤ {dw} rows before the single shuffle),
    and sketches MERGE by cell-wise addition — per-shard sketches sum
    into the global one, the same partial-agg tree Spark already runs.
    The probe side broadcasts the {dw}-row sketch. The exact top-{k}
    here doubles as the oracle of record; at 100 TB you'd keep only the
    sketch and a candidate set."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
    seeds = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("row_id")
    cells = (
        toks.select("tok", seeds)
        .select("row_id", _cms_cell(F.col("row_id"), F.col("tok")).alias("col_id"))
        .groupBy("row_id", "col_id")
        .agg(F.count(F.lit(1)).alias("counter"))
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "tok")
        .limit(_CMS_TOP)
    )
    probes = top.select(
        "tok", "exact_n", seeds
    ).withColumn("col_id", _cms_cell(F.col("row_id"), F.col("tok")))
    est = (
        probes.join(F.broadcast(cells), ["row_id", "col_id"])
        .groupBy("tok", "exact_n")
        .agg(F.min("counter").alias("cms_estimate"))
    )
    return est.select(
        "tok",
        "exact_n",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_n")).alias("overcount"),
    )


heavy_hitters_cms.__doc__ = heavy_hitters_cms.__doc__.format(
    d=_CMS_D, w=_CMS_W, k=_CMS_TOP, dw=_CMS_D * _CMS_W
)


# ---------------------------------------------------------------------------
# Bloom-filter novelty probe — the broadcast fast path ngram_novelty_score
# documents, implemented (with measured false positives)
# ---------------------------------------------------------------------------

_BLOOM_K = 3
_BLOOM_M = 262_144  # 2^18 bits — gate-scale default; sizing note on the gate
# Above ~2^27 bits the packed bitset stops being a sane plan literal (a
# 16 MB array constant serialized into the plan and shipped with every task)
# and must travel as a broadcast relation instead — _bloom_novelty_plan
# switches transport automatically at this ceiling.
_BLOOM_LITERAL_MAX_BITS = 1 << 27


def _novelty_gram_prefix() -> str:
    from change_data_capture_spark.operators.text_queries import _NOVELTY_ORACLE

    body = _NOVELTY_ORACLE.strip().removeprefix("WITH")
    return body.split("SELECT c.doc_id", 1)[0].rstrip().rstrip(",")


def _bloom_hash_duck(j: str, gh: str, m: int = _BLOOM_M) -> str:
    """DuckDB rendering of :func:`_bloom_pos` — same seeded md5, same
    15-hex-digit truncation, same modulus, so the filter (and its
    deterministic false positives) reproduce bit-for-bit in the oracle."""
    return (
        f"CAST(('0x' || substr(md5('bloom' || CAST({j} AS VARCHAR) || '|' || "
        f"CAST({gh} AS VARCHAR)), 1, 15)) AS BIGINT) % {m}"
    )

_BLOOM_ORACLE = f"""
WITH {_novelty_gram_prefix()},
seeds AS (SELECT unnest(range(0, {_BLOOM_K})) AS j),
bits AS (
    SELECT DISTINCT {_bloom_hash_duck("s.j", "r.gh")} AS pos
    FROM ref r, seeds s
),
probe AS (
    SELECT c.doc_id, c.gh, s.j,
           {_bloom_hash_duck("s.j", "c.gh")} AS pos
    FROM cand c, seeds s
),
hits AS (
    SELECT p.doc_id, p.gh, count(b.pos) AS k_hits
    FROM probe p LEFT JOIN bits b ON b.pos = p.pos
    GROUP BY p.doc_id, p.gh
),
exact AS (
    SELECT c.doc_id, c.gh, (r.gh IS NOT NULL) AS seen
    FROM cand c LEFT JOIN ref r ON r.gh = c.gh
)
SELECT h.doc_id,
       count(*) AS n_grams,
       CAST(SUM(CASE WHEN h.k_hits = {_BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flagged,
       CAST(SUM(CASE WHEN e.seen THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
       CAST(SUM(CASE WHEN h.k_hits = {_BLOOM_K} AND NOT e.seen
                THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       1.0 - CAST(SUM(CASE WHEN h.k_hits = {_BLOOM_K} THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS bloom_novelty
FROM hits h JOIN exact e ON e.doc_id = h.doc_id AND e.gh = h.gh
GROUP BY h.doc_id
"""


def _bloom_pos(
    j: F.Column, gh: F.Column, m: int = _BLOOM_M, hash_family: str = "md5"
) -> F.Column:
    """Bloom position of gram-hash ``gh`` under seed ``j``. Two hash
    families, same filter semantics:

    - ``"md5"`` (default): string-concat + md5 + 15-hex-digit truncation —
      chosen ONLY because DuckDB reproduces it bit-for-bit, which is what
      lets the driver oracle hash-match the filter INCLUDING its false
      positives. Cost: ~3 allocations + a cryptographic hash per probe.
    - ``"xxhash64"``: Spark's codegen'd 64-bit xxHash over (j, gh)
      directly — the PRODUCTION family (one JVM intrinsic per probe, no
      string materialization; measured 1.25–1.5× faster END-TO-END at
      100× — 16.9→13.7 s decontamination, 15.4→10.0 s novelty — the rest
      of the gate is the gram build, BENCH.md r10). Not
      DuckDB-reproducible, so the registered gates keep md5; correctness
      of the family is pinned structurally instead
      (``test_bloom_xxhash64_family_no_false_negatives``)."""
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64(j, gh), F.lit(m)).cast("long")
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bloom"),
                        j.cast("string"),
                        F.lit("|"),
                        gh.cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % m
    )


@query("bloom_novelty_probe", oracle=_BLOOM_ORACLE)
def bloom_novelty_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The broadcast-Bloom fast path that ``ngram_novelty_score``'s
    docstring promises: the reference corpus's distinct 5-gram hashes
    compress into a {k}-hash Bloom filter over 2^18 positions (stored as
    the distinct set-bit table, broadcast to every executor), candidate
    grams probe it with NO SHUFFLE OF THE REFERENCE SIDE, and — because
    the seeded-md5 family is engine-portable — the oracle reproduces the
    filter bit-for-bit, so even the false positives are deterministic
    and ``n_false_pos`` is a measured column (exact membership is
    computed alongside for the comparison).

    Scale shape: the Bloom side is bounded by m = 2^18 rows no matter
    how large the reference corpus grows (the exact-join form's ref side
    grows with the corpus); the probe is a broadcast hash join per hash
    row. At 100 TB the bits table would be a real bitset aggregated with
    bit-OR partials; the positions-table form keeps identical semantics
    and lets the oracle check it."""
    result, grams = _bloom_probe_plan(spark, sf_dir)
    return materialize_and_release(result, grams)


def _novelty_grams(spark: SparkSession, sf_dir: str):
    """The shared gram relation of the novelty gates, PERSISTED (every
    gate reads it from ≥2 sides; the recompute of the tokenize + explode
    + hash + dedup subtree measured 2× end-to-end at 300×). Callers own
    the handle and must ``unpersist()`` once their result is
    materialized."""
    from change_data_capture_spark.functions.text import (
        seeded_hash,
        shingles_from_tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    ref_srcs = ("src0", "src1", "src2", "src3")
    base = d.select(
        "doc_id",
        F.col("source").isin(*ref_srcs).alias("is_ref"),
        tokens(F.col("text")).alias("toks"),
    ).where(F.size("toks") >= 5)
    return (
        base.select(
            "doc_id",
            "is_ref",
            F.explode(shingles_from_tokens(F.col("toks"), k=5)).alias("gram"),
        )
        .select(
            "doc_id",
            "is_ref",
            seeded_hash(F.col("gram"), seed="novelty").alias("gh"),
        )
        .dropDuplicates(["doc_id", "gh"])
        .persist()
    )


def _bloom_probe_plan(spark: SparkSession, sf_dir: str):
    """Lazy plan + persisted gram handle of :func:`bloom_novelty_probe`
    (split out so plan pins inspect the real compute plan; the gate
    wrapper returns a cached result whose formatted explain duplicates
    operators across AQE initial/final renderings)."""
    grams = _novelty_grams(spark, sf_dir)
    ref = grams.where("is_ref").select("gh").distinct()
    cand = grams.where(~F.col("is_ref")).select("doc_id", "gh")
    seeds = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("j")
    bits = (
        ref.select("gh", seeds)
        .select(_bloom_pos(F.col("j"), F.col("gh")).alias("pos"))
        .distinct()
    )
    probe = cand.select("doc_id", "gh", seeds).withColumn(
        "pos", _bloom_pos(F.col("j"), F.col("gh"))
    )
    hits = (
        probe.join(F.broadcast(bits.withColumnRenamed("pos", "bpos")),
                   F.col("pos") == F.col("bpos"), "left")
        .groupBy("doc_id", "gh")
        .agg(F.count("bpos").alias("k_hits"))
    )
    exact = cand.join(
        ref.withColumnRenamed("gh", "ref_gh"),
        F.col("gh") == F.col("ref_gh"),
        "left",
    ).select("doc_id", "gh", F.col("ref_gh").isNotNull().alias("seen"))
    flag = (F.col("k_hits") == _BLOOM_K).cast("int")
    seen = F.col("seen").cast("int")
    result = (
        hits.join(exact, ["doc_id", "gh"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(flag).alias("n_flagged"),
            F.sum(seen).alias("n_seen"),
            F.sum(flag * (1 - seen)).alias("n_false_pos"),
            (1.0 - F.sum(flag).cast("double") / F.count(F.lit(1))).alias(
                "bloom_novelty"
            ),
        )
    )
    return result, grams


bloom_novelty_probe.__doc__ = bloom_novelty_probe.__doc__.format(k=_BLOOM_K)


def _bloom_prod_oracle(m: int = _BLOOM_M, k: int = _BLOOM_K) -> str:
    """DuckDB oracle for :func:`ngram_novelty_bloom` at ANY (m, k) — the
    seeded-md5 family is engine-portable, so the pytest that pins a second
    (m, k) point reuses this builder."""
    return f"""
WITH {_novelty_gram_prefix()},
seeds AS (SELECT unnest(range(0, {k})) AS j),
bits AS (
    SELECT DISTINCT {_bloom_hash_duck("s.j", "r.gh", m)} AS pos
    FROM ref r, seeds s
),
probe AS (
    SELECT c.doc_id, c.gh, s.j,
           {_bloom_hash_duck("s.j", "c.gh", m)} AS pos
    FROM cand c, seeds s
),
hits AS (
    SELECT p.doc_id, p.gh, count(b.pos) AS k_hits
    FROM probe p LEFT JOIN bits b ON b.pos = p.pos
    GROUP BY p.doc_id, p.gh
)
SELECT doc_id,
       count(*) AS n_grams,
       CAST(SUM(CASE WHEN k_hits = {k} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flagged,
       1.0 - CAST(SUM(CASE WHEN k_hits = {k} THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS bloom_novelty
FROM hits
GROUP BY doc_id
"""


_BLOOM_PROD_ORACLE = _bloom_prod_oracle()


@query("ngram_novelty_bloom", oracle=_BLOOM_PROD_ORACLE)
def ngram_novelty_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION path of n-gram novelty scoring — the Bloom filter
    as an ACTUAL BITSET (m = 2^18 bits = a 4096-long array literal, 32 KB
    shipped inside the plan), probed with pure bit arithmetic: NO JOIN
    ANYWHERE, exact or otherwise (pinned in
    ``tests/test_analytics_queries.py::
    test_bloom_novelty_prod_path_has_no_shuffle_join``).
    ``bloom_novelty_probe`` is the audit twin (it computes the exact join
    alongside to measure false positives). The seeded-md5 Bloom family is
    engine-portable, so the oracle reproduces the filter bit-for-bit and
    the (deterministic) false positives hash-match too — an approximation
    gate with an exact oracle, same contract as ``count_distinct_approx``.

    This replaced a set-bit-TABLE broadcast-join form after the 300×
    smoke: exploding k probe rows per gram and re-aggregating
    ``groupBy(doc_id, gh)`` shuffles k× the gram relation and builds a
    per-gram hash table that spills to sort-based agg once groups pass
    memory (27.8 s at 100× → 324.6 s at 300×, 11.7× for 3× data). The
    bitset form keeps the k probes INSIDE one projection (no row
    explosion, no per-gram agg): the only shuffles left are the gram
    dedup and the per-DOC agg the result needs anyway.

    Scale: the ref side folds to <= m distinct positions regardless of
    corpus size, collected once at plan build (bounded by m, not the
    corpus; a deployment rebuilds it incrementally per ingest batch with
    bit-OR partials); cand-side cost is O(candidate grams) with k md5s +
    k bitset lookups per gram, all whole-stage codegen.

    SIZING — the gate-scale default (m = 2^18 bits, k = 3) is sized for
    this corpus, NOT for production: a Bloom filter holding n distinct
    reference grams at false-positive rate p needs
    ``m ~= n * ln(1/p) / ln(2)^2`` bits and ``k = (m/n) * ln 2`` hashes
    (a 100 TB reference corpus has ~1e12 distinct 5-grams -> ~1.2 TB of
    filter at p = 1e-3, which no single filter ships whole; production
    shards the filter by gram-hash range and probes the matching shard).
    Past ``_BLOOM_LITERAL_MAX_BITS`` (2^27 bits = a 16 MB constant) the
    packed bitset stops being a sane plan literal and
    :func:`_bloom_novelty_plan` automatically ships it as a one-row
    broadcast relation instead (one BroadcastNestedLoopJoin against a
    single build row = a broadcast variable in DataFrame clothing); below
    it the literal keeps the plan join-free. Saturation is the honest
    failure mode of an undersized m: FPR -> 1 and measured novelty -> 0.
    Both (m, k) and the transport are parameters; a second (m, k) point
    and the broadcast transport are oracle-pinned in
    ``tests/test_analytics_queries.py``."""
    result, grams = _bloom_novelty_plan(spark, sf_dir)
    return materialize_and_release(result, grams)


def _validate_bloom_params(
    m: int, k: int, bitmap_transport: str, hash_family: str = "md5"
) -> bool:
    """Shared (m, k, transport, hash family) validation of the Bloom
    production gates; returns whether the bitset ships as a plan literal."""
    if m % 64 != 0 or m <= 0:
        raise ValueError(f"Bloom m must be a positive multiple of 64, got {m}")
    if k <= 0:
        raise ValueError(f"Bloom k must be a positive hash count, got {k}")
    if bitmap_transport not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown bitmap_transport {bitmap_transport!r}")
    if hash_family not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    return bitmap_transport == "literal" or (
        bitmap_transport == "auto" and m <= _BLOOM_LITERAL_MAX_BITS
    )


def _fold_bitset(ref, m: int, k: int, hash_family: str = "md5") -> list:
    """Fold a one-column (``gh``) reference relation into the packed m-bit
    Bloom bitset: k positions per gram, distinct-folded to <= m rows,
    collected once (bounded by m, never by the corpus), packed into m/64
    SIGNED 64-bit words (the LongType array element type)."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    pos_rows = (
        ref.select("gh", seeds)
        .select(_bloom_pos(F.col("j"), F.col("gh"), m, hash_family).alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * (m // 64)
    for r in pos_rows:
        p = r["pos"]
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def _bloom_probe_flag(spark: SparkSession, cand, packed: list, m: int, k: int,
                      use_literal: bool, hash_family: str = "md5"):
    """Attach the k-probe Bloom membership test to ``cand`` (which must
    carry a ``gh`` column); returns ``(probed_df, flag_col)`` where the
    flag is 1 iff all k probed bits are set.

    The k probes stay INSIDE one projection: element_at is 1-based;
    testing the bit via shiftright+AND keeps everything in signed-long
    arithmetic (the DataFrame-API shiftright only takes a literal bit
    count, so the variable-distance shift is a SQL expression over staged
    columns). With ``use_literal`` the bitset rides the plan as an array
    literal (join-free); otherwise it ships as a one-row broadcast
    relation — the same bits, once per executor instead of once per task
    binary — for filters past the literal ceiling."""
    if use_literal:
        probed = cand
        bitmap = F.lit(packed)
    else:
        bm = spark.createDataFrame([(packed,)], "_bm array<bigint>")
        probed = cand.join(F.broadcast(bm))
        bitmap = F.col("_bm")
    return _attach_bloom_probes(probed, bitmap, m, k, hash_family)


def _attach_bloom_probes(probed, bitmap, m: int, k: int,
                         hash_family: str = "md5"):
    """The probe loop shared by every Bloom transport (plan literal,
    one-row broadcast, sharded broadcast relation): attach the k
    position/word columns against ``bitmap`` (any array<bigint>-typed
    column or literal) and return ``(probed_df, flag_col)``."""
    hit_exprs = []
    for j in range(k):
        pos = _bloom_pos(F.lit(j), F.col("gh"), m, hash_family)
        probed = probed.withColumn(f"_p{j}", pos).withColumn(
            f"_w{j}",
            F.element_at(bitmap, F.shiftright(F.col(f"_p{j}"), 6).cast("int") + 1),
        )
        hit_exprs.append(
            F.expr(f"(shiftright(_w{j}, CAST(_p{j} % 64 AS INT)) & 1) = 1")
        )
    flag = functools.reduce(lambda a, b: a & b, hit_exprs).cast("int")
    return probed, flag


def _bloom_novelty_plan(
    spark: SparkSession,
    sf_dir: str,
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
    bitmap_transport: str = "auto",
    hash_family: str = "md5",
):
    """Build the production Bloom-novelty plan at any ``(m, k)``; returns
    ``(result_df, grams_handle)``. ``bitmap_transport`` is ``"literal"``
    (packed bitset as an array literal inside the plan — join-free),
    ``"broadcast"`` (one-row broadcast relation carrying the array — for
    filters past the literal ceiling), or ``"auto"`` (literal up to
    ``_BLOOM_LITERAL_MAX_BITS``, broadcast above)."""
    use_literal = _validate_bloom_params(m, k, bitmap_transport, hash_family)
    grams = _novelty_grams(spark, sf_dir)
    ref = grams.where("is_ref").select("gh").distinct()
    cand = grams.where(~F.col("is_ref")).select("doc_id", "gh")
    packed = _fold_bitset(ref, m, k, hash_family)
    probed, flag = _bloom_probe_flag(spark, cand, packed, m, k, use_literal,
                                     hash_family)
    result = (
        probed.select("doc_id", flag.alias("flag"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("flag").alias("n_flagged"),
            (1.0 - F.sum("flag").cast("double") / F.count(F.lit(1))).alias(
                "bloom_novelty"
            ),
        )
    )
    return result, grams


# ---------------------------------------------------------------------------
# Eval-set decontamination, Bloom production path — the corpus-hygiene twin
# of ngram_novelty_bloom (ties the Bloom bitset into the decontamination
# family end-to-end)
# ---------------------------------------------------------------------------


def _decontam_bloom_oracle(m: int = _BLOOM_M, k: int = _BLOOM_K) -> str:
    """DuckDB oracle for :func:`corpus_decontamination_bloom` at any
    (m, k) — same engine-portable seeded-md5 Bloom family, same
    deterministic false positives, over the decontamination gram relation
    (13-gram, ``decontam`` seed, 90/10 ``split`` buckets). The gram CTE
    chain is the NAMED constant shared with the exact-join oracle and the
    sharded oracle, so all three stay bit-identical by construction."""
    from change_data_capture_spark.operators.text_queries import (
        _DECONTAM_GRAMS_CTE,
    )

    return f"""
WITH {_DECONTAM_GRAMS_CTE},
ev AS (SELECT DISTINCT gh FROM grams WHERE bucket >= 90),
train AS (SELECT doc_id, gh FROM grams WHERE bucket < 90),
seeds AS (SELECT unnest(range(0, {k})) AS j),
bits AS (
    SELECT DISTINCT {_bloom_hash_duck("s.j", "e.gh", m)} AS pos
    FROM ev e, seeds s
),
probe AS (
    SELECT t.doc_id, t.gh, s.j,
           {_bloom_hash_duck("s.j", "t.gh", m)} AS pos
    FROM train t, seeds s
),
hits AS (
    SELECT p.doc_id, p.gh, count(b.pos) AS k_hits
    FROM probe p LEFT JOIN bits b ON b.pos = p.pos
    GROUP BY p.doc_id, p.gh
)
SELECT doc_id,
       count(*) AS n_grams,
       CAST(SUM(CASE WHEN k_hits = {k} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flagged,
       CAST(max(CASE WHEN k_hits = {k} THEN 1 ELSE 0 END) AS INT)
           AS contaminated
FROM hits
GROUP BY doc_id
"""


def _decontam_grams(spark: SparkSession, sf_dir: str):
    """The decontamination gram relation, PERSISTED: the Bloom plan reads
    it from both sides (eval-side bitset fold + train-side probe).
    Construction comes verbatim from the exact gate's shared builder
    (``text_queries._decontam_gram_rel`` — deferred import; bit-identical
    grams are what make the exact join and the Bloom path audit each
    other). Callers own the handle and must ``unpersist()`` once their
    result is materialized."""
    from change_data_capture_spark.operators.text_queries import (
        _decontam_gram_rel,
    )

    return _decontam_gram_rel(spark, sf_dir).persist()


def _decontam_bloom_plan(
    spark: SparkSession,
    sf_dir: str,
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
    bitmap_transport: str = "auto",
    hash_family: str = "md5",
):
    """Build the Bloom decontamination plan at any ``(m, k)``; returns
    ``(result_df, grams_handle)``. Same transport contract as
    :func:`_bloom_novelty_plan`, with the DIRECTION REVERSED: the bitset
    folds the EVAL side (the small, fixed benchmark suite) and the probe
    streams the TRAIN side (the 100 TB corpus) — see the gate docstring."""
    use_literal = _validate_bloom_params(m, k, bitmap_transport, hash_family)
    grams = _decontam_grams(spark, sf_dir)
    ev = grams.where(~F.col("is_train")).select("gh").distinct()
    train = grams.where("is_train").select("doc_id", "gh")
    packed = _fold_bitset(ev, m, k, hash_family)
    probed, flag = _bloom_probe_flag(spark, train, packed, m, k, use_literal,
                                     hash_family)
    result = (
        probed.select("doc_id", flag.alias("flag"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("flag").alias("n_flagged"),
            F.max("flag").alias("contaminated"),
        )
    )
    return result, grams


_DECONTAM_BLOOM_ORACLE = _decontam_bloom_oracle()


@query("corpus_decontamination_bloom", oracle=_DECONTAM_BLOOM_ORACLE)
def corpus_decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination on the Bloom PRODUCTION path: flag every
    TRAIN document whose 13-gram set intersects the EVAL set, with the
    eval grams folded into an m-bit Bloom bitset and every train gram
    probed by k md5 hashes inside one codegen projection — NO JOIN
    anywhere (pinned in ``tests/test_analytics_queries.py::
    test_decontam_bloom_prod_path_has_no_shuffle_join``).
    ``corpus_decontamination`` is the exact-join audit twin on the
    identical gram relation (same 13-token shingles, same ``decontam``
    seed, same seeded 90/10 split), so the two cross-check.

    Direction is the production insight: decontamination at 100 TB means
    a HUGE train corpus against a SMALL, fixed eval suite, so the filter
    folds the eval side (bounded by the benchmark suite, not the corpus —
    1e6 distinct eval grams at 10 bits/gram is a ~1.25 MB literal; a
    1e8-gram suite crosses ``_BLOOM_LITERAL_MAX_BITS`` and ships as the
    broadcast relation automatically) while the train side streams through
    one stage: scan → gram explode → dedup → k-probe projection → per-doc
    agg. The exact-join form shuffles the full train gram relation by gh
    every run; this form never moves train grams across the network at
    all beyond the per-doc agg the result needs anyway.

    Error direction makes Bloom SAFE here, unlike novelty scoring: a
    false positive over-flags a clean train document (a tiny, tunable
    training-data loss at the chosen FPR); contamination can never be
    missed (no false negatives). Removal pipelines therefore run the
    filter alone; the exact twin exists to measure the realized FPR.
    Deterministic false positives reproduce bit-for-bit in the oracle —
    an approximation gate with an exact oracle, same contract as
    ``ngram_novelty_bloom``. Sizing formula and transport ceiling are
    documented on :func:`ngram_novelty_bloom`; both (m, k) points and the
    flag parity with the exact twin are pytest-pinned."""
    result, grams = _decontam_bloom_plan(spark, sf_dir)
    return materialize_and_release(result, grams)


# ---------------------------------------------------------------------------
# Sharded Bloom decontamination — the gram-hash-range sharding the
# ngram_novelty_bloom sizing note describes, exercised end to end
# ---------------------------------------------------------------------------

# gram hashes are 60-bit values (15 md5 hex digits); range sharding takes
# the TOP bits so each shard owns a contiguous gh range — shift derives
# from the shard count in ONE formula shared by plan and oracle
_DECONTAM_SHARDS = 4


def _decontam_bloom_sharded_oracle(m: int, k: int, shards: int) -> str:
    """DuckDB oracle for the SHARDED Bloom decontamination: same seeded
    md5 family, but each shard folds its own m-bit bitset from only its
    gh-range's eval grams, and every train gram probes only its own
    shard's bits — so the (deterministic) false-positive pattern differs
    from the unsharded filter and the oracle must shard identically.
    The shard shift derives from ``shards`` HERE, the same formula the
    plan uses — callers can't hand it a stale shift that silently shards
    differently from the Spark side."""
    from change_data_capture_spark.operators.text_queries import (
        _DECONTAM_GRAMS_CTE,
    )

    shift = 60 - (shards.bit_length() - 1)
    return f"""
WITH {_DECONTAM_GRAMS_CTE},
ev AS (SELECT DISTINCT gh FROM grams WHERE bucket >= 90),
train AS (SELECT doc_id, gh FROM grams WHERE bucket < 90),
seeds AS (SELECT unnest(range(0, {k})) AS j),
bits AS (
    SELECT DISTINCT e.gh >> {shift} AS shard,
           {_bloom_hash_duck("s.j", "e.gh", m)} AS pos
    FROM ev e, seeds s
),
probe AS (
    SELECT t.doc_id, t.gh, s.j, t.gh >> {shift} AS shard,
           {_bloom_hash_duck("s.j", "t.gh", m)} AS pos
    FROM train t, seeds s
),
hits AS (
    SELECT p.doc_id, p.gh, count(b.pos) AS k_hits
    FROM probe p LEFT JOIN bits b ON b.shard = p.shard AND b.pos = p.pos
    GROUP BY p.doc_id, p.gh
)
SELECT doc_id,
       count(*) AS n_grams,
       CAST(SUM(CASE WHEN k_hits = {k} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flagged,
       CAST(max(CASE WHEN k_hits = {k} THEN 1 ELSE 0 END) AS INT)
           AS contaminated
FROM hits
GROUP BY doc_id
"""


def _decontam_bloom_sharded_plan(
    spark: SparkSession,
    sf_dir: str,
    shards: int = _DECONTAM_SHARDS,
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
    hash_family: str = "md5",
    grams: DataFrame | None = None,
):
    """Build the sharded Bloom decontamination plan; returns
    ``(result_df, grams_handle)``. The filter is ``shards`` independent
    m-bit bitsets, one per contiguous gram-hash range (top bits of the
    60-bit gh), shipped as a ``shards``-row broadcast relation
    ``(shard, _bm)``; train grams route to their shard with one equi-join
    and probe ONLY that shard's bits. ``grams`` lets a caller share ONE
    persisted gram relation across several plans (the sharding sweep
    builds five) instead of five separate persists of identical data."""
    if shards <= 0 or shards & (shards - 1):
        raise ValueError(f"shards must be a positive power of two, got {shards}")
    _validate_bloom_params(m, k, "broadcast", hash_family)
    shift = 60 - (shards.bit_length() - 1)
    if grams is None:
        grams = _decontam_grams(spark, sf_dir)
    ev = grams.where(~F.col("is_train")).select("gh").distinct()
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    pos_rows = (
        ev.select("gh", seeds)
        .select(
            F.shiftright("gh", shift).alias("shard"),
            _bloom_pos(F.col("j"), F.col("gh"), m, hash_family).alias("pos"),
        )
        .distinct()
        .collect()  # bounded by shards * m, never by the corpus
    )
    words = {s: [0] * (m // 64) for s in range(shards)}
    for r in pos_rows:
        p = r["pos"]
        words[r["shard"]][p >> 6] |= 1 << (p & 63)
    bm_rows = [
        (s, [w - (1 << 64) if w >= (1 << 63) else w for w in ws])
        for s, ws in sorted(words.items())
    ]
    bm = spark.createDataFrame(bm_rows, "shard bigint, _bm array<bigint>")
    train = grams.where("is_train").select(
        F.shiftright("gh", shift).alias("shard"), "doc_id", "gh"
    )
    probed = train.join(F.broadcast(bm), "shard")
    probed, flag = _attach_bloom_probes(
        probed, F.col("_bm"), m, k, hash_family
    )
    result = (
        probed.select("doc_id", flag.alias("flag"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("flag").alias("n_flagged"),
            F.max("flag").alias("contaminated"),
        )
    )
    return result, grams


_DECONTAM_BLOOM_SHARDED_ORACLE = _decontam_bloom_sharded_oracle(
    _BLOOM_M, _BLOOM_K, _DECONTAM_SHARDS
)


@query(
    "corpus_decontamination_bloom_sharded",
    oracle=_DECONTAM_BLOOM_SHARDED_ORACLE,
)
def corpus_decontamination_bloom_sharded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Eval-set decontamination with the Bloom filter SHARDED BY
    GRAM-HASH RANGE — the true 100 TB transport the
    :func:`ngram_novelty_bloom` sizing note describes. One monolithic
    filter for a 1e8-gram eval suite crosses the plan-literal ceiling
    and even the single-relation broadcast eventually stops scaling (a
    1.2 TB filter at 1e12 grams ships to no executor whole); the
    deployment answer is range-sharding: split the 60-bit gram-hash
    space into contiguous ranges, fold an independent m-bit bitset per
    range, and route every probe to ITS shard only. Here that is
    literal: a {shards}-row broadcast relation ``(shard, bitmap)``, one
    equi-join on the shard id (BroadcastHashJoin — each task hashes
    into the {shards}-row table and touches only the bitsets its grams
    need), then the same k-probe projection as the unsharded gate
    against the joined shard's bits. No train gram crosses the network
    before the per-doc agg the result needs anyway; pinned join-shape
    in ``tests/test_analytics_queries.py``.

    Statistically each shard holds ~1/{shards} of the eval grams in the
    same m bits, so per-shard load factor (and FPR) drops — sharding
    buys transport AND precision; at fleet scale shard count tracks the
    suite size (keep each shard under the broadcast budget) and probes
    still cost k hashes + k bit tests per gram, whole-stage codegen.
    The false-positive pattern differs from the unsharded filter (bit
    collisions only happen within a shard), and the oracle reproduces
    it bit-for-bit — same exact-oracle contract as the other Bloom
    gates; no-false-negative parity with the exact twin is pytest-
    pinned."""
    result, grams = _decontam_bloom_sharded_plan(spark, sf_dir)
    return materialize_and_release(result, grams)


corpus_decontamination_bloom_sharded.__doc__ = (
    corpus_decontamination_bloom_sharded.__doc__.replace(
        "{shards}", str(_DECONTAM_SHARDS)
    )
)


_SWEEP_SHARD_COUNTS = (1, 2, 4, 8, 16)


def _decontam_sharding_sweep_oracle(m: int, k: int, shard_counts) -> str:
    """DuckDB oracle for the shard-count sweep: ONE branch per shard
    count, each the corpus-level aggregation of the per-doc sharded
    oracle (:func:`_decontam_bloom_sharded_oracle` — identical seeded
    bit arithmetic), cross-joined with the shared EXACT baseline so
    every row carries recall/FPR inputs. ``fpr`` is one bigint-to-double
    division on both engines (bit-identical per the verify notes)."""
    from change_data_capture_spark.operators.text_queries import (
        _DECONTAM_GRAMS_CTE,
    )

    exact_cte = f"""
WITH {_DECONTAM_GRAMS_CTE},
exact AS (
    SELECT CAST(count(*) AS BIGINT) AS n_exact
    FROM (SELECT doc_id, gh FROM grams WHERE bucket < 90) t
    WHERE t.gh IN (SELECT DISTINCT gh FROM grams WHERE bucket >= 90)
)
"""
    branches = []
    for s in shard_counts:
        branches.append(f"""
SELECT {s} AS shards,
       CAST(SUM(n_grams) AS BIGINT) AS n_probes,
       (SELECT n_exact FROM exact) AS n_exact,
       CAST(SUM(n_flagged) AS BIGINT) AS n_flagged,
       CAST(SUM(contaminated) AS BIGINT) AS n_docs_flagged,
       CAST(SUM(n_flagged) AS BIGINT) - (SELECT n_exact FROM exact)
           AS n_false_pos,
       CASE WHEN CAST(SUM(n_grams) AS BIGINT)
                     - (SELECT n_exact FROM exact) = 0
            THEN NULL
            ELSE CAST(CAST(SUM(n_flagged) AS BIGINT)
                     - (SELECT n_exact FROM exact) AS DOUBLE)
               / CAST(CAST(SUM(n_grams) AS BIGINT)
                     - (SELECT n_exact FROM exact) AS DOUBLE)
       END AS fpr
FROM ({_decontam_bloom_sharded_oracle(m, k, s)})
""")
    return exact_cte + "\nUNION ALL\n".join(branches)


_DECONTAM_SWEEP_ORACLE = _decontam_sharding_sweep_oracle(
    _BLOOM_M, _BLOOM_K, _SWEEP_SHARD_COUNTS
)


@query("corpus_decontamination_sharding_sweep", oracle=_DECONTAM_SWEEP_ORACLE)
def corpus_decontamination_sharding_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FPR/recall SWEEP of the sharded Bloom decontamination transport
    across shard counts {counts} at fixed (m, k) — the measurement that
    justifies picking a shard count at fleet scale, extending the r10
    (m, k) sweep to the r11 sharded form. One persisted gram relation
    feeds all five plans (the ``grams=`` share — five persists of the
    same corpus would be waste); each plan is the production sharded
    path verbatim: shards-row broadcast relation, one equi-join route,
    k-probe codegen projection. Per shard count the gate reports the
    probe volume, the EXACT contamination baseline, the Bloom-flagged
    count, doc-level flags, and the realized false-positive count/rate.

    What the numbers mean at 100 TB: recall is ALWAYS 1.0 (a Bloom
    filter has no false negatives — flagged ⊇ exact, pytest-pinned per
    shard count), so the sweep is really an FPR-vs-transport curve:
    the same m bits hold ~1/shards of the eval grams per shard, so the
    per-shard load factor drops and the deterministic false-positive
    count falls (or holds) as shards grow — while per-shard bitmaps
    shrink below the broadcast budget. shards=1 is the anchor: it must
    (and does, pytest-pinned) equal the unsharded filter bit-for-bit,
    because routing through one shard is the identity. The oracle
    reproduces every branch's bit pattern exactly — the sweep is
    hash-matched, not report-style.

    Scale: ONE bitset fold and ONE probe pass cover all five shard
    counts (r13 optimization; the r12 form ran five independent
    fold+probe plans). Probe positions are shard-independent — the same
    ``(j, gh)`` md5 probes every branch — so the fold collects the
    distinct ``(gh >> 56, pos)`` pairs ONCE at the finest (16-shard)
    granularity and every coarser shard count's bitsets are a
    driver-side projection of that set (bounded by 16×m, never the
    corpus). The probe side then joins the 16-row broadcast relation
    carrying all five bitmap columns, computes the k md5 positions once
    per gram, and derives the five flags from the same staged positions
    — the per-gram hash cost (the dominant probe term) is paid once,
    not five times. Each flag is bit-identical to the standalone
    sharded plan's (same bitmap bytes, same probe expressions —
    ``shards=1`` ≡ the unsharded filter stays pinned), so the oracle
    and the output are unchanged."""
    tot_df, grams, n_exact = _sweep_probe_plan(spark, sf_dir)
    tot = tot_df.collect()[0]
    grams.unpersist()
    rows = []
    for s in _SWEEP_SHARD_COUNTS:
        n_probes = int(tot["n_probes"])
        n_flagged = int(tot[f"nf_{s}"])
        # degenerate corpus (every train probe an exact hit): the FPR has
        # no denominator — emit NULL, mirrored by the oracle's CASE guard,
        # instead of a driver-side ZeroDivisionError
        denom = n_probes - int(n_exact)
        rows.append(
            (
                s,
                n_probes,
                int(n_exact),
                n_flagged,
                int(tot[f"ct_{s}"]),
                n_flagged - int(n_exact),
                float(n_flagged - n_exact) / float(denom) if denom else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "shards INT, n_probes BIGINT, n_exact BIGINT, n_flagged BIGINT, "
        "n_docs_flagged BIGINT, n_false_pos BIGINT, fpr DOUBLE",
    )


def _sweep_probe_plan(spark: SparkSession, sf_dir: str):
    """The sweep's single fold + single probe+aggregate plan; returns
    ``(one-row total df carrying all shard counts' sums, grams handle,
    n_exact)``. Split out so plan dumps can inspect the real compute
    plan (the gate's returned DataFrame is a driver-built 5-row local
    relation either way)."""
    import functools as _functools

    grams = _decontam_grams(spark, sf_dir)
    m, k = _BLOOM_M, _BLOOM_K
    ev = grams.where(~F.col("is_train")).select("gh").distinct()
    train = grams.where("is_train")
    # the shared EXACT baseline: train gram instances whose gh appears in
    # the eval suite (one broadcast semi join over the cached relation)
    n_exact = train.join(F.broadcast(ev), "gh", "left_semi").count()

    max_shards = max(_SWEEP_SHARD_COUNTS)
    fine_shift = 60 - (max_shards.bit_length() - 1)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    # ONE fold: distinct (finest shard, pos); every branch's bitset is a
    # pure projection of this set (shard_s(gh) = (gh >> 56) >> down_s)
    pos_rows = (
        ev.select("gh", seeds)
        .select(
            F.shiftright("gh", fine_shift).alias("t"),
            _bloom_pos(F.col("j"), F.col("gh"), m).alias("pos"),
        )
        .distinct()
        .collect()
    )
    down = {
        s: (max_shards.bit_length() - 1) - (s.bit_length() - 1)
        for s in _SWEEP_SHARD_COUNTS
    }
    words = {
        s: {sh: [0] * (m // 64) for sh in range(s)}
        for s in _SWEEP_SHARD_COUNTS
    }
    for r in pos_rows:
        t, p = r["t"], r["pos"]
        for s in _SWEEP_SHARD_COUNTS:
            words[s][t >> down[s]][p >> 6] |= 1 << (p & 63)

    def _signed(ws: list[int]) -> list[int]:
        return [w - (1 << 64) if w >= (1 << 63) else w for w in ws]

    bm_rows = [
        tuple(
            [t]
            + [_signed(words[s][t >> down[s]]) for s in _SWEEP_SHARD_COUNTS]
        )
        for t in range(max_shards)
    ]
    bm_ddl = "t bigint, " + ", ".join(
        f"_bm_{s} array<bigint>" for s in _SWEEP_SHARD_COUNTS
    )
    bm = spark.createDataFrame(bm_rows, bm_ddl)

    probed = (
        train.select(
            F.shiftright("gh", fine_shift).alias("t"), "doc_id", "gh"
        )
        .join(F.broadcast(bm), "t")
    )
    # k probe positions staged ONCE, shared by all five flags
    for j in range(k):
        probed = probed.withColumn(f"_p{j}", _bloom_pos(F.lit(j), F.col("gh"), m))
    flags = {}
    for s in _SWEEP_SHARD_COUNTS:
        hit_exprs = []
        for j in range(k):
            probed = probed.withColumn(
                f"_w{s}_{j}",
                F.element_at(
                    F.col(f"_bm_{s}"),
                    F.shiftright(F.col(f"_p{j}"), 6).cast("int") + 1,
                ),
            )
            hit_exprs.append(
                F.expr(f"(shiftright(_w{s}_{j}, CAST(_p{j} % 64 AS INT)) & 1) = 1")
            )
        flags[s] = _functools.reduce(lambda a, b: a & b, hit_exprs).cast("int")
    per_doc_aggs = [F.count(F.lit(1)).alias("n_grams")]
    for s in _SWEEP_SHARD_COUNTS:
        per_doc_aggs.append(F.sum(flags[s]).alias(f"nf_{s}"))
        per_doc_aggs.append(F.max(flags[s]).alias(f"ct_{s}"))
    total_aggs = [F.sum("n_grams").alias("n_probes")]
    for s in _SWEEP_SHARD_COUNTS:
        total_aggs.append(F.sum(f"nf_{s}").alias(f"nf_{s}"))
        total_aggs.append(F.sum(f"ct_{s}").alias(f"ct_{s}"))
    tot_df = probed.groupBy("doc_id").agg(*per_doc_aggs).agg(*total_aggs)
    return tot_df, grams, n_exact


corpus_decontamination_sharding_sweep.__doc__ = (
    corpus_decontamination_sharding_sweep.__doc__.replace(
        "{counts}", str(_SWEEP_SHARD_COUNTS)
    )
)


# ---------------------------------------------------------------------------
# EWMA (exponential smoothing) — a sequential recurrence as a bounded
# per-series array fold
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.25  # exactly representable in binary

_EWMA_ORACLE = """
WITH monthly AS (
    SELECT n.n_name,
           date_trunc('month', o.o_orderdate) AS m,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS rev
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2
),
series AS (
    SELECT n_name,
           list(rev ORDER BY m) AS xs,
           count(*) AS n_months,
           CAST(CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               AS total_revenue
    FROM monthly GROUP BY n_name
)
SELECT n_name,
       CAST(n_months AS BIGINT) AS n_months,
       total_revenue,
       list_reduce(xs, (acc, x) -> acc * 0.75 + x * 0.25) AS ewma_final
FROM series
"""


@query("ewma_monthly_revenue", oracle=_EWMA_ORACLE)
def ewma_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of monthly revenue per nation
    (α = 0.25, y₁ = x₁, yₜ = 0.75·yₜ₋₁ + 0.25·xₜ) — the inherently
    SEQUENTIAL recurrence no window frame expresses, done the scalable
    way: collect each series into a sorted bounded array (months per
    nation — dozens, not data-sized) and fold it with ``F.aggregate``.
    Parallelism is across series; per-series state is O(series length),
    the same shape every per-key recurrence (Holt-Winters, Kalman-lite,
    session scoring) takes on Spark.

    Determinism: monthly revenues route decimal→string→double (the
    portable cast), the fold order is the month order (unique months →
    total order), and both engines fold left over the identical doubles
    — bit-exact ``ewma_final``. DuckDB's ``list_reduce`` seeds with the
    first element; Spark mirrors with init = xs[1] folded over
    ``slice(xs, 2, n-1)``."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("string")
            .cast("double")
            .alias("rev")
        )
    )
    series = monthly.groupBy("n_name").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("m", "rev"))), lambda s: s.rev
        ).alias("xs"),
        F.count(F.lit(1)).alias("n_months"),
        F.sum(F.col("rev").cast("decimal(18,2)"))
        .cast("string")
        .cast("double")
        .alias("total_revenue"),
    )
    xs = F.col("xs")
    ewma = F.aggregate(
        F.slice(xs, F.lit(2), F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        lambda acc, x: acc * F.lit(1 - _EWMA_ALPHA) + x * F.lit(_EWMA_ALPHA),
    )
    return series.select(
        "n_name",
        "n_months",
        "total_revenue",
        ewma.alias("ewma_final"),
    )


# ---------------------------------------------------------------------------
# Embedding per-dimension feature profile (mean/std/min/max, fixed-point)
# ---------------------------------------------------------------------------

_DIMSTATS_ORACLE = """
WITH flat AS (
    SELECT CAST(i.i AS INTEGER) - 1 AS dim,
           CAST(CAST(embedding[CAST(i.i AS INTEGER)] AS VARCHAR)
                AS DECIMAL(20,9)) AS v9,
           CAST(embedding[CAST(i.i AS INTEGER)] AS DOUBLE) AS vd
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS i(i)
),
scaled AS (
    SELECT dim, vd,
           CAST(v9 * 1000000000 AS BIGINT) AS vi
    FROM flat
),
agg AS (
    SELECT dim,
           COUNT(*) AS n,
           CAST(SUM(vi) AS BIGINT) AS s1,
           SUM(CAST(vi AS DECIMAL(38,0)) * CAST(vi AS DECIMAL(38,0))) AS s2,
           MIN(vd) AS min_val,
           MAX(vd) AS max_val
    FROM scaled GROUP BY dim
)
SELECT dim, n, min_val, max_val,
       CAST(s1 AS DOUBLE) / n / 1e9 AS mean_val,
       sqrt(CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / n / 1e18
            - (CAST(s1 AS DOUBLE) / n / 1e9) * (CAST(s1 AS DOUBLE) / n / 1e9))
           AS std_val
FROM agg
"""


@query("embedding_dim_stats", oracle=_DIMSTATS_ORACLE)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension feature profile of the embedding corpus — the
    mean/std/min/max table a feature-standardization (z-score) or
    monitoring step consumes.

    Determinism: values quantize to FIXED-POINT nano units (string-parse
    into DECIMAL(20,9) — tie-free for binary floats — then ×10⁹ to
    BIGINT), so Σx is a bigint sum and Σx² an exact DECIMAL(38,0) sum:
    both associative, so Spark's partial-agg tree equals DuckDB's fold
    bit-for-bit; the final mean/variance arithmetic is the identical
    double expression on both sides. min/max need no quantization
    (order-free). One shuffle on dim with map-side partials; posexplode
    is codegen."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(F.posexplode("embedding").alias("dim", "val")).select(
        "dim",
        (F.col("val").cast("string").cast("decimal(20,9)") * 1_000_000_000)
        .cast("bigint")
        .alias("vi"),
        F.col("val").cast("double").alias("vd"),
    )
    n = F.count(F.lit(1))
    s1 = F.sum("vi").cast("bigint")
    s2 = F.sum(
        F.col("vi").cast("decimal(38,0)") * F.col("vi").cast("decimal(38,0)")
    )
    agg = flat.groupBy("dim").agg(
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
        F.min("vd").alias("min_val"),
        F.max("vd").alias("max_val"),
    )
    mean = F.col("s1").cast("double") / F.col("n") / 1e9
    return agg.select(
        "dim",
        "n",
        "min_val",
        "max_val",
        mean.alias("mean_val"),
        F.sqrt(
            F.col("s2").cast("string").cast("double") / F.col("n") / 1e18
            - mean * mean
        ).alias("std_val"),
    )


# ---------------------------------------------------------------------------
# NULL-semantics audit (null grouping, null-safe equality, COUNT variants)
# ---------------------------------------------------------------------------

_NULL_SEMANTICS_ORACLE = """
WITH c AS (
    SELECT c_custkey,
           NULLIF(c_mktsegment, 'BUILDING') AS seg,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
    FROM customer
)
SELECT COALESCE(seg, '<NULL>') AS segment,
       COUNT(*) AS n_rows,
       COUNT(seg) AS n_nonnull_seg,
       COUNT(bal) AS n_nonnull_bal,
       CAST(SUM(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_bal,
       CAST(SUM(CASE WHEN seg IS NOT DISTINCT FROM NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_nsafe_null,
       CAST(COALESCE(SUM(CAST(bal AS DECIMAL(18,2))), 0) AS DOUBLE)
           AS total_bal,
       CAST(MIN(bal) AS DOUBLE) AS min_bal,
       CAST(MAX(bal) AS DOUBLE) AS max_bal
FROM c
GROUP BY seg
"""


@query("null_semantics_audit", oracle=_NULL_SEMANTICS_ORACLE)
def null_semantics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics conformance in one aggregate: NULLs form their own
    GROUP BY group, ``COUNT(col)`` skips them while ``COUNT(*)`` doesn't,
    null-safe equality (`<=>` / IS NOT DISTINCT FROM) treats NULL=NULL as
    true, aggregates ignore NULL inputs (MIN/MAX/SUM), and a group whose
    SUM input is all-NULL coalesces to 0 — each a classic cross-engine
    divergence trap, here pinned byte-identical against DuckDB. One
    hash-agg exchange."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    bal_dec = F.col("bal").cast("decimal(18,2)")
    return c.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("seg").alias("n_nonnull_seg"),
        F.count("bal").alias("n_nonnull_bal"),
        F.sum(F.col("bal").isNull().cast("int")).cast("long").alias("n_null_bal"),
        F.sum(F.col("seg").eqNullSafe(F.lit(None)).cast("int"))
        .cast("long")
        .alias("n_nsafe_null"),
        F.coalesce(F.sum(bal_dec), F.lit(0).cast("decimal(18,2)"))
        .cast("double")
        .alias("total_bal"),
        F.min("bal").cast("double").alias("min_bal"),
        F.max("bal").cast("double").alias("max_bal"),
    ).select(
        F.coalesce(F.col("seg"), F.lit("<NULL>")).alias("segment"),
        "n_rows",
        "n_nonnull_seg",
        "n_nonnull_bal",
        "n_null_bal",
        "n_nsafe_null",
        "total_bal",
        "min_bal",
        "max_bal",
    )


# ---------------------------------------------------------------------------
# cohort LTV matrix: cumulative revenue by acquisition cohort x month index
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH firsts AS (
    SELECT o_custkey,
           min(date_trunc('month', o_orderdate)) AS cohort_month
    FROM orders GROUP BY o_custkey
),
monthly AS (
    SELECT f.cohort_month,
           CAST(datediff('month', f.cohort_month,
                         date_trunc('month', o.o_orderdate)) AS BIGINT)
               AS month_index,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    GROUP BY 1, 2
),
sizes AS (SELECT cohort_month, count(*) AS cohort_customers FROM firsts GROUP BY 1)
SELECT strftime(m.cohort_month, '%Y-%m') AS cohort,
       m.month_index,
       s.cohort_customers,
       CAST(CAST(SUM(m.rev_cents) OVER (PARTITION BY m.cohort_month
                                        ORDER BY m.month_index) AS BIGINT)
            AS DOUBLE) / 100 AS cum_revenue,
       CAST(CAST(SUM(m.rev_cents) OVER (PARTITION BY m.cohort_month
                                        ORDER BY m.month_index) AS BIGINT)
            AS DOUBLE) / 100 / s.cohort_customers AS cum_ltv_per_customer
FROM monthly m JOIN sizes s USING (cohort_month)
"""


@query("cohort_ltv_matrix", oracle=_LTV_ORACLE)
def cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV matrix — the subscription-analytics staple: customers
    grouped by acquisition month (first order), revenue accumulated along
    each cohort's month index, normalized per cohort customer. Read the
    diagonal for "how fast do newer cohorts monetize vs older ones".

    The cumulative window runs over the (cohort × month-index) AGGREGATE —
    a bounded few-hundred-row relation at any fact volume — never over raw
    orders; the heavy work is one custkey agg (first order) + one grouped
    revenue sum, both plain shuffles. Integer cents everywhere."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    monthly = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort_month",
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")), F.col("cohort_month")
            )
            .cast("long")
            .alias("month_index"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    sizes = firsts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_customers")
    )
    w = Window.partitionBy("cohort_month").orderBy("month_index")
    return (
        monthly.join(sizes, "cohort_month")
        .select(
            F.date_format("cohort_month", "yyyy-MM").alias("cohort"),
            "month_index",
            "cohort_customers",
            (F.sum("rev_cents").over(w).cast("double") / 100).alias("cum_revenue"),
            (
                F.sum("rev_cents").over(w).cast("double")
                / 100
                / F.col("cohort_customers")
            ).alias("cum_ltv_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# RFM customer scoring with DISTRIBUTED exact deciles
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH per AS (
    SELECT o_custkey AS c_custkey,
           max(o_orderdate) AS last_o,
           count(*) AS frequency,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon
    FROM orders GROUP BY 1
),
mx AS (SELECT max(o_orderdate) AS m FROM orders),
base AS (
    SELECT p.c_custkey,
           CAST(datediff('day', p.last_o, mx.m) AS BIGINT) AS recency_days,
           p.frequency, p.mon
    FROM per p CROSS JOIN mx
),
ranked AS (
    SELECT *,
           row_number() OVER (ORDER BY recency_days, c_custkey) AS rr,
           row_number() OVER (ORDER BY frequency, c_custkey) AS rf,
           row_number() OVER (ORDER BY mon, c_custkey) AS rm,
           count(*) OVER () AS n
    FROM base
)
SELECT c_custkey, recency_days, frequency,
       CAST(mon AS DOUBLE) / 100 AS monetary,
       (rr - 1) * 10 // n + 1 AS r_decile,
       (rf - 1) * 10 // n + 1 AS f_decile,
       (rm - 1) * 10 // n + 1 AS m_decile,
       CAST((rr - 1) * 10 // n + 1 AS VARCHAR) || '-' ||
       CAST((rf - 1) * 10 // n + 1 AS VARCHAR) || '-' ||
       CAST((rm - 1) * 10 // n + 1 AS VARCHAR) AS rfm_segment
FROM ranked
"""

_RANK_BUCKETS = 1024


def _ranks_long_form(base: DataFrame, metrics: list, key: str) -> DataFrame:
    """EXACT global rank per metric (ties broken by ``key``) WITHOUT a
    global window, for ALL metrics in ONE pipeline: metrics go long-form
    (stack), values bucket into 1024 ranges from a per-metric broadcast
    min/max, ranks come from (metric, bucket)-partitioned windows plus each
    bucket's cumulative offset from a tiny (metrics × 1024)-row side
    relation. The same two-phase prefix shape as ``orders_pareto_abc``,
    factored as a reusable rank primitive. Returns (key, mname, rank)."""
    stack_expr = ", ".join(f"'{m}', {m}" for m in metrics)
    long = base.selectExpr(
        key, f"stack({len(metrics)}, {stack_expr}) AS (mname, val)"
    )
    stats = long.groupBy("mname").agg(
        F.min("val").alias("__mn"), F.max("val").alias("__mx")
    )
    b = long.join(F.broadcast(stats), "mname").withColumn(
        "__bkt",
        F.when(
            F.col("__mx") > F.col("__mn"),
            ((F.col("val") - F.col("__mn")) * _RANK_BUCKETS)
            / (F.col("__mx") - F.col("__mn") + 1),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    counts = b.groupBy("mname", "__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = (
        Window.partitionBy("mname")
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "mname",
        "__bkt",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("mname", "__bkt").orderBy("val", key)
    return b.join(F.broadcast(offsets), ["mname", "__bkt"]).select(
        key, "mname", (F.col("__off") + F.row_number().over(w_in)).alias("rank")
    )


@query("customer_rfm_scores", oracle=_RFM_ORACLE)
def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring — recency / frequency / monetary deciles, the
    retail segmentation workhorse. Deciles are EXACT global ranks computed
    with the distributed two-phase prefix machinery (``_ranks_long_form``:
    all three metrics stacked long-form through ONE bucket-rank pipeline) — NOT a
    global ntile window, so the ranking scales to any customer count; the
    oracle states the same decile with a plain global ``row_number`` (the
    formula ``(rank-1)*10 // n + 1`` is shared, integer-exact, and unlike
    engine ``ntile`` has no remainder-distribution ambiguity)."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_o"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("mon"),
    )
    mx = o.agg(F.max("o_orderdate").alias("m"))
    base = per.crossJoin(F.broadcast(mx)).select(
        "c_custkey",
        F.datediff("m", "last_o").cast("long").alias("recency_days"),
        "frequency",
        "mon",
    ).persist()
    n_row = base.agg(F.count(F.lit(1)).alias("n"))
    ranks = _ranks_long_form(base, ["recency_days", "frequency", "mon"], "c_custkey")
    wide = ranks.groupBy("c_custkey").agg(
        F.max(F.when(F.col("mname") == "recency_days", F.col("rank"))).alias("rr"),
        F.max(F.when(F.col("mname") == "frequency", F.col("rank"))).alias("rf"),
        F.max(F.when(F.col("mname") == "mon", F.col("rank"))).alias("rm"),
    )
    j = base.join(wide, "c_custkey").crossJoin(F.broadcast(n_row))

    def _dec(rank: str):
        return F.expr(f"(({rank} - 1) * 10) div n") + 1

    return j.select(
        "c_custkey",
        "recency_days",
        "frequency",
        (F.col("mon").cast("double") / 100).alias("monetary"),
        _dec("rr").alias("r_decile"),
        _dec("rf").alias("f_decile"),
        _dec("rm").alias("m_decile"),
        F.concat_ws(
            "-",
            _dec("rr").cast("string"),
            _dec("rf").cast("string"),
            _dec("rm").cast("string"),
        ).alias("rfm_segment"),
    )


# ---------------------------------------------------------------------------
# per-group exact interpolated percentiles, partitioned-window form
# ---------------------------------------------------------------------------

_GRP_PCTL_ORACLE = """
WITH cents AS (
    SELECT c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS v, c_custkey
    FROM customer
),
r AS (
    SELECT c_nationkey, v,
           row_number() OVER (PARTITION BY c_nationkey ORDER BY v, c_custkey) AS rn,
           count(*) OVER (PARTITION BY c_nationkey) AS n
    FROM cents
),
q AS (
    SELECT c_nationkey, n,
        CAST(SUM(CASE WHEN rn = CAST(floor((n-1) * CAST(0.25 AS DOUBLE)) AS BIGINT) + 1 THEN v END) AS BIGINT) AS lo25,
        CAST(SUM(CASE WHEN rn = least(CAST(floor((n-1) * CAST(0.25 AS DOUBLE)) AS BIGINT) + 2, n) THEN v END) AS BIGINT) AS hi25,
        CAST(SUM(CASE WHEN rn = CAST(floor((n-1) * CAST(0.50 AS DOUBLE)) AS BIGINT) + 1 THEN v END) AS BIGINT) AS lo50,
        CAST(SUM(CASE WHEN rn = least(CAST(floor((n-1) * CAST(0.50 AS DOUBLE)) AS BIGINT) + 2, n) THEN v END) AS BIGINT) AS hi50,
        CAST(SUM(CASE WHEN rn = CAST(floor((n-1) * CAST(0.95 AS DOUBLE)) AS BIGINT) + 1 THEN v END) AS BIGINT) AS lo95,
        CAST(SUM(CASE WHEN rn = least(CAST(floor((n-1) * CAST(0.95 AS DOUBLE)) AS BIGINT) + 2, n) THEN v END) AS BIGINT) AS hi95
    FROM r GROUP BY c_nationkey, n
)
SELECT c_nationkey, n AS n_customers,
    (lo25 + (hi25 - lo25) * ((n-1) * CAST(0.25 AS DOUBLE) - floor((n-1) * CAST(0.25 AS DOUBLE)))) / 100 AS bal_p25,
    (lo50 + (hi50 - lo50) * ((n-1) * CAST(0.50 AS DOUBLE) - floor((n-1) * CAST(0.50 AS DOUBLE)))) / 100 AS bal_p50,
    (lo95 + (hi95 - lo95) * ((n-1) * CAST(0.95 AS DOUBLE) - floor((n-1) * CAST(0.95 AS DOUBLE)))) / 100 AS bal_p95
FROM q
"""


@query("nation_balance_percentiles", oracle=_GRP_PCTL_ORACLE)
def nation_balance_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation exact interpolated percentiles of customer balance — in
    the DISTRIBUTED partitioned-window form: one ranking window per group
    key, dual positions per quantile, the shared ``lo + (hi-lo)*frac``
    formula. Unlike the builtin ``percentile`` aggregate (which buffers
    every group's values in executor memory and interpolates with an
    engine-specific formula), this shape streams each partition once and is
    bit-identical cross-engine — the form that survives a billion rows per
    group."""
    c = load_table(spark, sf_dir, "customer")
    cents = c.select(
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("v"),
        "c_custkey",
    )
    wr = Window.partitionBy("c_nationkey").orderBy("v", "c_custkey")
    wn = Window.partitionBy("c_nationkey")
    r = cents.select(
        "c_nationkey",
        "v",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def _pick(qv: float, which: str):
        pos = (F.col("n") - 1) * qv
        lo = F.floor(pos).cast("long") + 1
        at = lo if which == "lo" else F.least(lo + 1, F.col("n"))
        return F.sum(F.when(F.col("rn") == at, F.col("v")))

    agg = r.groupBy("c_nationkey", "n").agg(
        _pick(0.25, "lo").alias("lo25"), _pick(0.25, "hi").alias("hi25"),
        _pick(0.50, "lo").alias("lo50"), _pick(0.50, "hi").alias("hi50"),
        _pick(0.95, "lo").alias("lo95"), _pick(0.95, "hi").alias("hi95"),
    )

    def _interp(qv: float, lo: str, hi: str):
        pos = (F.col("n") - 1) * qv
        frac = pos - F.floor(pos)
        return (F.col(lo) + (F.col(hi) - F.col(lo)) * frac) / 100

    return agg.select(
        "c_nationkey",
        F.col("n").alias("n_customers"),
        _interp(0.25, "lo25", "hi25").alias("bal_p25"),
        _interp(0.50, "lo50", "hi50").alias("bal_p50"),
        _interp(0.95, "lo95", "hi95").alias("bal_p95"),
    )


# ---------------------------------------------------------------------------
# ratio-to-report: nation revenue share within region
# ---------------------------------------------------------------------------

_SHARE_ORACLE = """
WITH rev AS (
    SELECT n.n_name AS nation, r.r_name AS region,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY 1, 2
)
SELECT region, nation,
       CAST(rev_cents AS DOUBLE) / 100 AS revenue,
       CAST(rev_cents AS DOUBLE)
           / CAST(SUM(rev_cents) OVER (PARTITION BY region) AS BIGINT)
           AS region_share,
       CAST(rev_cents AS DOUBLE)
           / CAST(SUM(rev_cents) OVER () AS BIGINT) AS global_share
FROM rev
"""


@query("nation_revenue_share", oracle=_SHARE_ORACLE)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report — every nation's revenue as a share of its region
    and of the world: the classic percent-of-total report. The share
    windows run over the 25-row nation AGGREGATE (the fact table is
    reduced first), so the "global window" is a constant-size relation —
    the legitimate use of an unpartitioned window. Exact integer cents;
    each share is one int÷int double division."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        (F.col("rev_cents").cast("double") / 100).alias("revenue"),
        (
            F.col("rev_cents").cast("double") / F.sum("rev_cents").over(w_region)
        ).alias("region_share"),
        (
            F.col("rev_cents").cast("double") / F.sum("rev_cents").over(w_all)
        ).alias("global_share"),
    )


# ---------------------------------------------------------------------------
# cumulative unique users curve (first-seen trick — exact, no sliding state)
# ---------------------------------------------------------------------------

_CUMULATIVE_UNIQUES_ORACLE = """
WITH firsts AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
),
per_day AS (
    SELECT first_day AS day, count(*) AS new_users FROM firsts GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cumulative_users
FROM per_day
"""


@query("cumulative_unique_users", oracle=_CUMULATIVE_UNIQUES_ORACLE)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-uniques growth curve via the FIRST-SEEN trick: a user
    contributes to exactly one day (their first), so the running count of
    distinct users ever seen is a plain cumsum over per-day first-seen
    counts — no expanding-window COUNT DISTINCT (which would be quadratic
    state at any scale). One user agg + a window over the day-level
    aggregate."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


# ---------------------------------------------------------------------------
# DAU / trailing-7-day WAU
# ---------------------------------------------------------------------------

_DAU_WAU_ORACLE = """
WITH pairs AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM pairs)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       (SELECT count(*) FROM pairs p WHERE p.day = d.day) AS dau,
       (SELECT count(DISTINCT p.user_id) FROM pairs p
         WHERE p.day > d.day - INTERVAL 7 DAY AND p.day <= d.day) AS wau
FROM days d
"""


@query("events_dau_wau", oracle=_DAU_WAU_ORACLE)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day WAU per day — the product-health pair. Exact
    distinct-in-window cannot ride a running aggregate (distinctness is not
    decomposable), so WAU joins the DISTINCT (user, day) relation to the
    day spine on the 7-day range and re-distincts — O(active-pairs × 7)
    work on an already-reduced relation, the exact form; at planetary scale
    the documented approximation is per-day HLL sketches union-merged over
    the trailing window (``count_distinct_approx`` shows the sketch
    machinery)."""
    e = load_table(spark, sf_dir, "events")
    pairs = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct().persist()
    days = pairs.select("day").distinct()
    dau = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    d = days.alias("d")
    p = pairs.alias("p")
    wau = (
        d.join(
            p,
            (F.col("p.day") > F.date_sub(F.col("d.day"), 7))
            & (F.col("p.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("p.user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "wau")
    )


_DAU_WAU_APPROX_ORACLE = """
WITH pairs AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM pairs)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       (SELECT count(*) FROM pairs p WHERE p.day = d.day) AS dau,
       (SELECT count(DISTINCT p.user_id) FROM pairs p
         WHERE p.day > d.day - INTERVAL 7 DAY AND p.day <= d.day) AS wau,
       TRUE AS dau_within_tol,
       TRUE AS wau_within_tol
FROM days d
"""


def _dau_wau_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure sketch pipeline (no exact twin): one pass builds a per-day
    HLL sketch of user ids; DAU is each day's estimate and WAU estimates
    the UNION of the trailing 7 days' sketches — the planetary-scale form,
    because the shuffled state is days × ~2.5 KB sketches instead of the
    distinct (user, day) relation, and the trailing-window work is a
    constant 7 register-maxes per day."""
    return _dau_wau_sketches_from(load_table(spark, sf_dir, "events"))


def _dau_wau_sketches_from(e: DataFrame) -> DataFrame:
    """Sketch pipeline over any (ts, user_id) event relation — split from
    the fixture loader so the hypothesis property can drive it with
    arbitrary synthetic histories (tests/test_hygiene_queries.py)."""
    per_day = (
        e.select(F.col("ts").cast("date").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .persist()
    )
    d = per_day.select("day").alias("d")
    s = per_day.alias("s")
    wau = (
        d.join(
            s,
            (F.col("s.day") > F.date_sub(F.col("d.day"), 7))
            & (F.col("s.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s.sk")).alias("wau_approx"))
    )
    dau = per_day.select(
        "day", F.hll_sketch_estimate("sk").alias("dau_approx")
    )
    return dau.join(wau, "day")


@query("events_dau_wau_approx", oracle=_DAU_WAU_APPROX_ORACLE)
def events_dau_wau_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU via per-day HyperLogLog sketches union-merged over the
    trailing window (DataSketches ``hll_sketch_agg`` / ``hll_union_agg``)
    — the documented approximate path of ``events_dau_wau``, now measured
    instead of promised. Sketch union is commutative register-max, so the
    estimates are deterministic under any partitioning.

    The raw estimates are engine-specific, so (count_distinct_approx's
    contract) the oracle hash-matches the EXACT counts and a boolean
    asserting each estimate landed within tolerance; the pytest property
    additionally bounds the error. The exact twin here exists only for the
    audit — the production pipeline runs ``_dau_wau_sketches`` alone, whose
    100× cost is the one-pass sketch build (see BENCH.md)."""
    approx = _dau_wau_sketches(spark, sf_dir)
    exact = events_dau_wau(spark, sf_dir)
    tol = 0.06
    return (
        exact.join(
            approx,
            exact["day"] == F.date_format(approx["day"], "yyyy-MM-dd"),
        )
        .select(
            exact["day"].alias("day"),
            "dau",
            "wau",
            (F.abs(F.col("dau_approx") - F.col("dau")) <= tol * F.col("dau"))
            .alias("dau_within_tol"),
            (F.abs(F.col("wau_approx") - F.col("wau")) <= tol * F.col("wau"))
            .alias("wau_within_tol"),
        )
    )


# ---------------------------------------------------------------------------
# market-basket affinity: part-brand co-occurrence lift
# ---------------------------------------------------------------------------

_BASKET_TOP = 40

_BASKET_ORACLE = f"""
WITH items AS (
    SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n_orders AS (SELECT count(DISTINCT ok) AS n FROM items),
singles AS (SELECT brand, count(*) AS c FROM items GROUP BY brand),
pairs AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS c_ab
    FROM items a JOIN items b ON a.ok = b.ok AND a.brand < b.brand
    GROUP BY 1, 2
)
SELECT p.brand_a, p.brand_b, p.c_ab,
       CAST(p.c_ab AS DOUBLE) / n.n AS support,
       CAST(p.c_ab AS DOUBLE) * n.n / (sa.c * CAST(sb.c AS DOUBLE)) AS lift
FROM pairs p
JOIN singles sa ON sa.brand = p.brand_a
JOIN singles sb ON sb.brand = p.brand_b
CROSS JOIN n_orders n
ORDER BY c_ab DESC, brand_a, brand_b
LIMIT {_BASKET_TOP}
"""


@query("basket_affinity_lift", oracle=_BASKET_ORACLE)
def basket_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis: which part brands are ordered TOGETHER more
    than chance — support and lift per co-occurring brand pair, the
    association-rule primitive behind recommendations.

    Scale shape: the self-join is on the ORDER key of the distinct
    (order, brand) relation, so pair generation is Σ basket² — linear in
    orders for bounded baskets (TPC-H ~7 lines), never catalog × catalog;
    brand marginals and the order count are tiny broadcast sides. Exact
    integer counts; lift is a fixed double sequence."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    items = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
        .persist()
    )
    n_orders = items.select("ok").distinct().agg(F.count(F.lit(1)).alias("n"))
    singles = items.groupBy("brand").agg(F.count(F.lit(1)).alias("c"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    sa = singles.select(F.col("brand").alias("brand_a"), F.col("c").alias("ca"))
    sb = singles.select(F.col("brand").alias("brand_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            (F.col("c_ab").cast("double") / F.col("n")).alias("support"),
            (
                F.col("c_ab").cast("double")
                * F.col("n")
                / (F.col("ca") * F.col("cb").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.col("c_ab").desc(), "brand_a", "brand_b")
        .limit(_BASKET_TOP)
    )


# ---------------------------------------------------------------------------
# classical seasonality decomposition of monthly revenue
# ---------------------------------------------------------------------------

_SEASONALITY_ORACLE = """
WITH monthly AS (
    SELECT date_trunc('month', o_orderdate) AS month,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM orders GROUP BY 1
),
r AS (
    SELECT month, rev_cents,
           row_number() OVER (ORDER BY month) AS rn,
           count(*) OVER () AS n
    FROM monthly
),
trended AS (
    SELECT month, rev_cents, rn, n,
           CASE WHEN rn > 6 AND rn <= n - 6 THEN
               CAST(CAST(SUM(rev_cents) OVER (ORDER BY rn
                    ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS BIGINT)
                    AS DOUBLE) / 13
           END AS trend_cents
    FROM r
)
SELECT strftime(month, '%Y-%m') AS month,
       CAST(rev_cents AS DOUBLE) / 100 AS revenue,
       trend_cents / 100 AS trend,
       CAST(rev_cents AS DOUBLE) / trend_cents AS seasonal_ratio
FROM trended
"""


@query("orders_seasonality_decomposition", oracle=_SEASONALITY_ORACLE)
def orders_seasonality_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonality decomposition of monthly revenue: a centered
    13-month moving average as the trend (full windows only — edges carry
    NULL rather than a biased partial mean) and the revenue-to-trend ratio
    as the seasonal index. The multiplicative-decomposition first step of
    any demand forecast.

    The windows run over the MONTH-level aggregate (a few dozen rows at
    any fact volume — the same bounded-aggregate-layer pattern as
    ``cohort_ltv_matrix``); integer-cents sums keep the moving average one
    exact division."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents")
    )
    w_all = Window.partitionBy()
    w_ord = Window.orderBy("month")
    r = monthly.select(
        "month",
        "rev_cents",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    w_ma = Window.orderBy("rn").rowsBetween(-6, 6)
    trend = F.when(
        (F.col("rn") > 6) & (F.col("rn") <= F.col("n") - 6),
        F.sum("rev_cents").over(w_ma).cast("double") / 13,
    )
    return r.select(
        F.date_format("month", "yyyy-MM").alias("month"),
        (F.col("rev_cents").cast("double") / 100).alias("revenue"),
        (trend / 100).alias("trend"),
        (F.col("rev_cents").cast("double") / trend).alias("seasonal_ratio"),
    )


# ---------------------------------------------------------------------------
# dup-cluster size histogram: observability of the dedup tier's output
# ---------------------------------------------------------------------------

_CLUSTER_HIST_ORACLE = f"""
WITH RECURSIVE {_cc_minhash_oracle_body().rsplit("SELECT c.doc_id", 1)[0].rstrip().rstrip(",")},
csizes AS (SELECT component_id, count(*) AS cluster_size FROM comp GROUP BY 1)
SELECT cluster_size,
       count(*) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM csizes GROUP BY cluster_size
"""


@query("dedup_cluster_size_histogram", oracle=_CLUSTER_HIST_ORACLE)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-cluster size distribution over the MinHash-LSH connected
    components — the observability readout every dedup run needs before
    anyone trusts it: a healthy crawl shows a long tail of pairs/triples;
    a fat head of giant clusters means boilerplate or a broken shingle
    normalizer is gluing the corpus together (and predicts how much the
    keep-one policy will delete).

    Two tiny aggs over the component relation the CC pass already
    produces; cluster count × size cross-checks total clustered docs."""
    from change_data_capture_spark.operators.dedup_queries import (
        dedup_cc_minhash,
    )

    comp = dedup_cc_minhash(spark, sf_dir)
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).alias("n_docs"),
    )
