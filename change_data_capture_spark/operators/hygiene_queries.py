"""Corpus-hygiene operators for a training-data pipeline (SURVEY.md §2.B
LLM-data tier): PII redaction, repetition-based quality signals (Gopher-style),
URL/domain extraction, deterministic hash-weighted sampling, and streaming-ish
anomaly flagging over events.

The fixture corpus carries no real PII/URLs, so the PII and URL queries
synthesize those fields DETERMINISTICALLY from fixture columns — identically
in the Spark plan and the DuckDB oracle — and the operator under test is the
extraction/redaction expression itself. All hot paths are built-in JVM
expressions (regexp_*, parse_url, arrays): a 100 TB corpus scan stays one
codegen'd projection; the only shuffles are the grouped aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from change_data_capture_spark.functions.text import seeded_hash, tokens
from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# PII redaction (email / phone / IPv4 scrub before training)
# ---------------------------------------------------------------------------

# Patterns kept to the syntax subset shared by Java regex (Spark) and RE2
# (DuckDB): character classes, +, {m,n}, alternation — no backrefs/lookarounds.
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "555-[0-9]{4}"
_IP_RE = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

_PII_ORACLE = f"""
WITH raw AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.org or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS t
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INTEGER) AS n_phones,
       CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS INTEGER) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
               '{_IP_RE}', '<IP>', 'g')) AS redacted_md5
FROM raw
"""


@query("pii_redaction", oracle=_PII_ORACLE)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub — the redaction pass an LLM training corpus runs before
    tokenization: detect + replace emails, phone numbers, and private IPv4
    addresses with typed placeholder tokens, and count what was removed
    (the removal counts feed the pipeline's DQ dashboard).

    The fixture text has no PII, so a deterministic PII suffix is appended
    from ``doc_id`` (same expression in the oracle); the graded behavior is
    the three-pattern redaction chain. Zero shuffles — one codegen'd
    projection of ``regexp_replace``/``regexp_count`` per document, which is
    exactly the shape that survives a 100 TB scan."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.org or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    base = d.select("doc_id", raw.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    return base.select(
        "doc_id",
        F.regexp_count("t", F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("t", F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_count("t", F.lit(_IP_RE)).cast("int").alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# Repetition-based quality signals (Gopher rules §A1.1, public paper)
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
    FROM documents
),
base AS (
    SELECT doc_id, ts,
           len(ts) AS n_tokens,
           len(list_distinct(ts)) AS n_unique,
           len(list_filter(range(1, len(ts)), i -> ts[i] = ts[i + 1]))
               AS n_adjacent_repeats
    FROM toks
),
grams AS (
    SELECT doc_id, g[1] || ' ' || g[2] AS bigram
    FROM (SELECT doc_id,
                 unnest(list_zip(ts[1:len(ts) - 1], ts[2:len(ts)])) AS g
          FROM toks)
),
gram_counts AS (
    SELECT doc_id, bigram, count(*) AS n
    FROM grams GROUP BY 1, 2
),
top_gram AS (
    SELECT doc_id, max(n) AS top_bigram_n, CAST(sum(n) AS BIGINT) AS n_bigrams
    FROM gram_counts GROUP BY 1
)
SELECT b.doc_id,
       b.n_tokens,
       CAST(1.0 - CAST(b.n_unique AS DOUBLE) / b.n_tokens AS DOUBLE)
           AS dup_token_frac,
       CAST(b.n_adjacent_repeats AS BIGINT) AS n_adjacent_repeats,
       t.top_bigram_n,
       t.n_bigrams,
       CAST(t.top_bigram_n AS DOUBLE) / t.n_bigrams AS top_bigram_frac,
       (CAST(t.top_bigram_n AS DOUBLE) / t.n_bigrams > 0.05
        OR 1.0 - CAST(b.n_unique AS DOUBLE) / b.n_tokens > 0.9)
           AS repetition_flag
FROM base b JOIN top_gram t USING (doc_id)
"""


@query("text_repetition_quality", oracle=_REPETITION_ORACLE)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filters in the style of the Gopher rules
    (Rae et al. 2021, §A1.1 — public paper): duplicate-token fraction,
    adjacent-repeat count, and the fraction of all bigrams taken by the
    single most frequent bigram, plus the combined reject flag.

    Physical shape: per-doc signals (dup fraction, adjacent repeats) are
    pure array expressions — zero shuffles; the top-bigram fraction explodes
    bigrams and aggregates twice on ``doc_id`` (both shuffles key on doc_id,
    so AQE coalesces them into one exchange reused by the join). Linear in
    corpus size; no self-joins."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", tokens(F.col("text")).alias("ts")).select(
        "doc_id",
        "ts",
        F.size("ts").alias("n_tokens"),
        F.size(F.array_distinct("ts")).alias("n_unique"),
        # zip-with-tail (same shape as the bigram explode below) rather than
        # F.sequence(1, n-1): for a 1-token doc sequence(1,0) is the
        # DESCENDING [1,0] and element_at(ts, 0) throws — slice with a
        # greatest(n-1,0) length is empty instead, matching the oracle's
        # empty range(1,1).
        F.size(
            F.filter(
                F.zip_with(
                    F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                    F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                    lambda a, b: a == b,
                ),
                lambda x: x,
            )
        ).alias("n_adjacent_repeats"),
    )
    grams = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    top = (
        grams.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_bigram_n"), F.sum("n").alias("n_bigrams"))
    )
    dup_frac = 1.0 - F.col("n_unique").cast("double") / F.col("n_tokens")
    top_frac = F.col("top_bigram_n").cast("double") / F.col("n_bigrams")
    return (
        base.select("doc_id", "n_tokens", "n_unique", "n_adjacent_repeats")
        .join(top, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            dup_frac.alias("dup_token_frac"),
            F.col("n_adjacent_repeats").cast("long").alias("n_adjacent_repeats"),
            "top_bigram_n",
            "n_bigrams",
            top_frac.alias("top_bigram_frac"),
            ((top_frac > 0.05) | (dup_frac > 0.9)).alias("repetition_flag"),
        )
    )


# ---------------------------------------------------------------------------
# URL / domain extraction + per-domain corpus stats
# ---------------------------------------------------------------------------

_URL_ORACLE = """
WITH urls AS (
    SELECT doc_id, lang, n_chars,
           'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
    FROM documents
),
parsed AS (
    SELECT doc_id, lang, n_chars, url,
           regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
                          '([^.]+\\.[^.]+)$', 1) AS domain
    FROM urls
)
SELECT domain, host,
       count(*) AS n_docs,
       count(DISTINCT path) AS n_paths,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN lang_param = lang THEN 1 ELSE 0 END) AS BIGINT)
           AS n_param_consistent
FROM parsed
GROUP BY domain, host
"""


@query("url_domain_stats", oracle=_URL_ORACLE)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing + per-registered-domain corpus composition — the
    CommonCrawl-style bookkeeping step (domain blocklists, per-domain
    quality priors) of a web-scale training pipeline.

    The Spark side uses the built-in ``parse_url`` (HOST/PATH/QUERY
    extraction stays JVM-side); the oracle reproduces each part with RE2
    regexes. URLs are synthesized deterministically from fixture columns
    (the corpus carries none) — the graded behavior is the parse +
    domain-rollup. One shuffle (the domain aggregate)."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    parsed = d.select(
        "doc_id",
        "lang",
        "n_chars",
        host.alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
    )
    return parsed.groupBy("domain", "host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("path").alias("n_paths"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(F.col("lang_param") == F.col("lang"), 1).otherwise(0)).alias(
            "n_param_consistent"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic hash-weighted sampling (fully oracle-checkable)
# ---------------------------------------------------------------------------

_WEIGHTED_SAMPLE_ORACLE = """
WITH weighted AS (
    SELECT doc_id, lang, source,
           CASE WHEN lang = 'en' THEN 0.30 ELSE 1.00 END AS keep_frac,
           CAST(('0x' || substr(md5('wsample|' || CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 1000000 AS draw
    FROM documents
)
SELECT doc_id, lang, source
FROM weighted
WHERE draw < CAST(keep_frac * 1000000 AS BIGINT)
"""


@query("corpus_hash_weighted_sample", oracle=_WEIGHTED_SAMPLE_ORACLE)
def corpus_hash_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus down-sampling with a SEEDED CONTENT HASH instead of an
    RNG: keep ``hash(doc_id) % 1e6 < frac * 1e6``. Same training-mix intent
    as ``corpus_stratified_sample`` (30% of 'en', all low-resource langs) but
    engine-portable and rerun/append/repartition-stable — so unlike the
    Bernoulli ``sampleBy`` form (rows-only gate), the EXACT kept set is
    oracle-verified. This is the sampling shape to prefer at 100 TB: no RNG
    state, no global count, pure projection + filter, trivially pushed to the
    scan."""
    d = load_table(spark, sf_dir, "documents")
    keep_frac = F.when(F.col("lang") == "en", F.lit(0.30)).otherwise(F.lit(1.00))
    draw = seeded_hash(F.col("doc_id").cast("string"), seed="wsample") % 1000000
    return d.where(draw < (keep_frac * 1000000).cast("long")).select(
        "doc_id", "lang", "source"
    )


# ---------------------------------------------------------------------------
# Expanding-window anomaly flagging over the event stream
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH cents AS (
    SELECT event_id, user_id, ts, event_type,
           CAST(round(value * 100) AS BIGINT) AS v
    FROM events
),
stats AS (
    SELECT event_id, user_id, ts, event_type, v,
           count(*)  OVER w AS n_prior,
           sum(v)    OVER w AS s1,
           sum(v * v) OVER w AS s2
    FROM cents
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
scored AS (
    SELECT event_id, user_id, ts, event_type, v,
           n_prior,
           CAST(s1 AS DOUBLE) / n_prior AS mean_v,
           (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_prior)
               / (n_prior - 1) AS var_v
    FROM stats
    WHERE n_prior >= 20
)
SELECT event_id, user_id, ts, event_type,
       CAST(v AS DOUBLE) / 100 AS value,
       mean_v / 100 AS mean_prior,
       (CAST(v AS DOUBLE) - mean_v) / sqrt(var_v) AS zscore
FROM scored
WHERE var_v > 0 AND abs(CAST(v AS DOUBLE) - mean_v) / sqrt(var_v) > 3.0
"""


@query("events_anomaly_zscore", oracle=_ZSCORE_ORACLE)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user expanding-window z-score anomaly detection: flag an event
    whose value is >3σ from that user's PRIOR history (≥20 prior events) —
    the batch twin of a streaming monitor.

    Cross-engine exactness: the mean/variance come from integer partial
    sums over cents (count / Σv / Σv² as BIGINT — exact in any order), then
    a fixed sequence of IEEE double ops; floating-point window accumulation
    is never used, so the oracle matches bit-for-bit. One shuffle
    (partition by user_id); the frame is cumulative, so Spark evaluates it
    in a single streaming pass per partition — no O(n²) re-aggregation."""
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stats = cents.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "v",
        F.count(F.lit(1)).over(w).alias("n_prior"),
        F.sum("v").over(w).alias("s1"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("s2"),
    ).where(F.col("n_prior") >= 20)
    mean_v = F.col("s1").cast("double") / F.col("n_prior")
    var_v = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n_prior")
    ) / (F.col("n_prior") - 1)
    scored = stats.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "v",
        mean_v.alias("mean_v"),
        var_v.alias("var_v"),
    )
    z = (F.col("v").cast("double") - F.col("mean_v")) / F.sqrt("var_v")
    return scored.where((F.col("var_v") > 0) & (F.abs(z) > 3.0)).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        (F.col("v").cast("double") / 100).alias("value"),
        (F.col("mean_v") / 100).alias("mean_prior"),
        z.alias("zscore"),
    )


# ---------------------------------------------------------------------------
# Sequence packing: bin documents into fixed-capacity training sequences
# ---------------------------------------------------------------------------

_PACK_CAP = 512

_PACKING_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           least(len(regexp_split_to_array(trim(text), '\\s+')), {_PACK_CAP})
               AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, n_tokens,
           CAST((SUM(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens) // {_PACK_CAP} AS BIGINT) AS bin_id
    FROM toks
)
SELECT bin_id,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM packed
GROUP BY bin_id
"""


@query("sequence_packing_bins", oracle=_PACKING_ORACLE)
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the step that concatenates documents into
    fixed-capacity training sequences (cap {cap} tokens; oversized docs
    truncate to one full sequence). Deterministic SEQUENTIAL packing: docs
    in stable doc_id order, bin = exclusive-prefix-sum // cap — one
    window cumsum, no greedy bin search, reproducible across engines and
    reruns (greedy best-fit packs ~1% tighter but is inherently
    order-sensitive and unparallelizable). The global ORDER BY window is
    the one non-partitioned operator in the repo: at 100 TB you run it
    per-shard (hash bucket = packing domain) exactly like the train/eval
    split; the fixture-sized global form keeps the oracle simple."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.least(F.size(tokens(F.col("text"))), F.lit(_PACK_CAP)).alias("n_tokens"),
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    packed = toks.select(
        "doc_id",
        "n_tokens",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_CAP)
        .cast("long")
        .alias("bin_id"),
    )
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_PACK_SHARDS = 64

_PACKING_SHARDED_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % {_PACK_SHARDS} AS shard,
           least(len(regexp_split_to_array(trim(text), '\\s+')), {_PACK_CAP})
               AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, shard, n_tokens,
           (SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - n_tokens) // {_PACK_CAP} AS local_bin
    FROM toks
)
SELECT CAST(shard * 4294967296 + local_bin AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM packed
GROUP BY 1
"""


@query("sequence_packing_sharded", oracle=_PACKING_SHARDED_ORACLE)
def sequence_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``sequence_packing_bins``: packing domains are
    64 HASH SHARDS (seeded md5 of doc_id — the same engine-portable
    family the train/eval split uses), each shard packs independently with
    the identical exclusive-prefix-sum rule, and the global bin id is
    ``shard * 2^32 + local_bin`` (collision-free as long as a shard holds
    < 2^32 bins ≈ 2 quadrillion tokens).

    This replaces the global form's single ORDER BY window — the one
    non-partitioned operator the round-2 audit flagged — with a
    ``partitionBy(shard)`` window: every executor sorts only its shard,
    the cumsum never crosses shard boundaries, and the plan carries no
    single-partition exchange (pinned in ``tests/test_plans.py``). Cost:
    each shard independently wastes at most one partial bin (≤ cap-1
    tokens), i.e. ≤ shards × (cap-1) ≈ 32k tokens of padding overhead
    across the whole corpus — noise at any realistic scale. The global
    variant stays registered as the fixture-scale oracle twin."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (seeded_hash(F.col("doc_id").cast("string"), seed="pack") % _PACK_SHARDS).alias(
            "shard"
        ),
        F.least(F.size(tokens(F.col("text"))), F.lit(_PACK_CAP)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = toks.select(
        "doc_id",
        "n_tokens",
        (
            F.col("shard").cast("long") * F.lit(4294967296).cast("long")
            + ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_CAP).cast("long")
        ).alias("bin_id"),
    )
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Contrastive negative sampling (deterministic, hash-derived)
# ---------------------------------------------------------------------------

_NEG_K = 3

_NEG_SAMPLING_ORACLE = f"""
WITH n AS (SELECT count(*) AS n_docs, max(doc_id) AS max_id FROM documents),
anchors AS (
    SELECT d.doc_id, d.lang, n.n_docs
    FROM documents d CROSS JOIN n
),
pairs AS (
    SELECT a.doc_id AS anchor_id,
           CAST(j.j AS INTEGER) AS neg_rank,
           (a.doc_id + 1 +
            CAST(('0x' || substr(md5('neg|' || CAST(a.doc_id AS VARCHAR) || '|'
                                  || CAST(j.j AS VARCHAR)), 1, 15)) AS BIGINT)
              % (a.n_docs - 1)) % a.n_docs AS negative_id
    FROM anchors a, unnest(range(0, {_NEG_K})) AS j(j)
)
SELECT p.anchor_id, p.neg_rank, p.negative_id,
       a.lang AS anchor_lang, b.lang AS negative_lang,
       (a.lang = b.lang) AS same_lang
FROM pairs p
JOIN documents a ON a.doc_id = p.anchor_id
JOIN documents b ON b.doc_id = p.negative_id
"""


@query("contrastive_negative_pairs", oracle=_NEG_SAMPLING_ORACLE)
def contrastive_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sampling for contrastive training: each anchor document gets
    k={k} negatives drawn by a SEEDED HASH over (anchor, rank), mapped into
    the id space with a +1 offset mod n so a doc never samples itself —
    deterministic, rerun-stable, and joinable (the exact pair set is
    oracle-verified, unlike RNG sampling). Requires the fixture's dense
    0..n-1 doc_id space; production keys through a dense row-number
    rename first. Shape: one 1-row count broadcast, a {k}-way index
    explode, and two id-keyed joins to attach payload columns — all
    hash-partitionable."""
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
    )
    anchors = d.select("doc_id", "lang").join(F.broadcast(n))
    h = seeded_hash(
        F.concat(
            F.col("doc_id").cast("string"), F.lit("|"), F.col("j").cast("string")
        ),
        seed="neg",
    )
    pairs = anchors.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("j"),
        "n_docs",
    ).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("j").cast("int").alias("neg_rank"),
        (
            (F.col("doc_id") + 1 + h % (F.col("n_docs") - 1)) % F.col("n_docs")
        ).alias("negative_id"),
    )
    a = d.select(F.col("doc_id").alias("anchor_id"), F.col("lang").alias("anchor_lang"))
    b = d.select(
        F.col("doc_id").alias("negative_id"), F.col("lang").alias("negative_lang")
    )
    return (
        pairs.join(a, "anchor_id")
        .join(b, "negative_id")
        .select(
            "anchor_id",
            "neg_rank",
            "negative_id",
            "anchor_lang",
            "negative_lang",
            (F.col("anchor_lang") == F.col("negative_lang")).alias("same_lang"),
        )
    )


# ---------------------------------------------------------------------------
# Robust (median/MAD) anomaly flagging — the outlier-resistant twin of the
# z-score monitor above
# ---------------------------------------------------------------------------

_MAD_K = 1.4826  # consistency constant: MAD × 1.4826 ≈ σ under normality
_MAD_Z = 3.0

_MAD_ORACLE = f"""
WITH cents AS (
    SELECT event_id, user_id, ts, event_type,
           CAST(round(value * 100) AS BIGINT) AS v
    FROM events
),
r1 AS (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY v, event_id) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM cents
),
med AS (
    SELECT user_id,
           CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) / count(*) AS med
    FROM r1
    WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
       OR rn = CAST(floor((n + 2) / 2.0) AS BIGINT)
    GROUP BY user_id
),
dev AS (
    SELECT c.event_id, c.user_id, abs(CAST(c.v AS DOUBLE) - m.med) AS d
    FROM cents c JOIN med m USING (user_id)
),
r2 AS (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY d, event_id) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM dev
),
mad AS (
    SELECT user_id, SUM(d) / count(*) AS mad
    FROM r2
    WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
       OR rn = CAST(floor((n + 2) / 2.0) AS BIGINT)
    GROUP BY user_id
)
SELECT c.event_id, c.user_id, c.ts, c.event_type,
       CAST(c.v AS DOUBLE) / 100 AS value,
       m.med / 100 AS median_value,
       (CAST(c.v AS DOUBLE) - m.med) / ({_MAD_K} * d.mad) AS robust_z
FROM cents c
JOIN med m USING (user_id)
JOIN mad d USING (user_id)
WHERE d.mad > 0
  AND abs((CAST(c.v AS DOUBLE) - m.med) / ({_MAD_K} * d.mad)) > {_MAD_Z}
"""


@query("events_mad_robust_zscore", oracle=_MAD_ORACLE)
def events_mad_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly flagging via median/MAD instead of mean/σ:
    an event is anomalous when it sits more than 3 scaled-MADs from the
    user's median — unlike ``events_anomaly_zscore``, the baseline itself
    is immune to the outliers it hunts (one huge value inflates σ and masks
    later anomalies; it moves the median by at most one rank).

    Exact cross-engine medians WITHOUT any sort-the-whole-array step: the
    median is read off the one or two middle ``row_number`` positions per
    user (dual-position trick), so each phase is a user_id window + a tiny
    grouped avg — the same single hash partitioning reused across both
    median phases and the final join, no global sort, no per-group arrays.
    All arithmetic is integer cents → a fixed IEEE double sequence, so the
    DuckDB oracle matches bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    ).persist()

    def _group_median(df: DataFrame, val: str) -> DataFrame:
        """(user_id, med) — avg of the one/two middle values of ``val``."""
        w = Window.partitionBy("user_id").orderBy(val, "event_id")
        wc = Window.partitionBy("user_id")
        r = df.select(
            "user_id",
            F.col(val).alias("x"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        lo = F.floor((F.col("n") + 1) / 2.0).cast("long")
        hi = F.floor((F.col("n") + 2) / 2.0).cast("long")
        return (
            r.where((F.col("rn") == lo) | (F.col("rn") == hi))
            .groupBy("user_id")
            .agg(
                (F.sum("x").cast("double") / F.count(F.lit(1))).alias("med")
            )
        )

    med = _group_median(cents, "v")
    dev = cents.join(med, "user_id").select(
        "user_id",
        "event_id",
        F.abs(F.col("v").cast("double") - F.col("med")).alias("d"),
    )
    mad = _group_median(dev, "d").withColumnRenamed("med", "mad")

    rz = (F.col("v").cast("double") - F.col("med")) / (F.lit(_MAD_K) * F.col("mad"))
    return (
        cents.join(med, "user_id")
        .join(mad, "user_id")
        .where((F.col("mad") > 0) & (F.abs(rz) > _MAD_Z))
        .select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            (F.col("v").cast("double") / 100).alias("value"),
            (F.col("med") / 100).alias("median_value"),
            rz.alias("robust_z"),
        )
    )


# ---------------------------------------------------------------------------
# exactly-k uniform sample via order statistics of a content hash
# ---------------------------------------------------------------------------

_K_SAMPLE = 100

_EXACT_K_ORACLE = f"""
SELECT doc_id, lang, source,
       CAST(('0x' || substr(md5('ksample|' || CAST(doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) AS draw
FROM documents
ORDER BY draw, doc_id
LIMIT {_K_SAMPLE}
"""


@query("corpus_exact_k_sample", oracle=_EXACT_K_ORACLE)
def corpus_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-k uniform sampling via order statistics of a seeded content
    hash: the k smallest hash draws are a uniform k-subset, deterministic
    and append/repartition-stable — what Bernoulli `sample()` (k only in
    expectation) and `ORDER BY rand()` (irreproducible) both fail to give.

    Compiles to TakeOrderedAndProject: each partition keeps its local
    top-k, the driver merges k-sized heaps — no global sort at any scale.
    The reservoir-sampling use case, distributed."""
    d = load_table(spark, sf_dir, "documents")
    draw = seeded_hash(F.col("doc_id").cast("string"), "ksample")
    return (
        d.select("doc_id", "lang", "source", draw.alias("draw"))
        .orderBy("draw", "doc_id")
        .limit(_K_SAMPLE)
    )


# ---------------------------------------------------------------------------
# end-to-end corpus pipeline disposition: filter -> dedup -> sample -> shard
# ---------------------------------------------------------------------------

_PIPELINE_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 200000, text || ' qq zz' FROM documents WHERE doc_id % 7 = 0
),
staged AS (
    SELECT doc_id, text,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
               AS n_alpha,
           length(text) AS n_chars,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
           CAST(('0x' || substr(md5('psample|' || CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS draw
    FROM corpus
),
flagged AS (
    SELECT *,
           (n_tokens >= 30 AND n_alpha * 2 >= n_chars) AS quality_ok
    FROM staged
),
canon AS (
    SELECT fp, min(doc_id) AS canonical_doc_id
    FROM flagged WHERE quality_ok GROUP BY fp
)
SELECT f.doc_id,
       CASE
         WHEN NOT f.quality_ok THEN 'filtered_quality'
         WHEN f.doc_id <> c.canonical_doc_id THEN 'removed_duplicate'
         WHEN f.draw % 100 >= 80 THEN 'sampled_out'
         ELSE 'kept'
       END AS disposition,
       CASE
         WHEN f.quality_ok AND f.doc_id = c.canonical_doc_id
              AND f.draw % 100 < 80
         THEN f.draw % 8
       END AS shard
FROM flagged f LEFT JOIN canon c USING (fp)
"""


@query("corpus_pipeline_end_to_end", oracle=_PIPELINE_ORACLE)
def corpus_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-data pipeline as one composed query — every doc
    gets a final disposition: quality-filtered out (length + alpha-ratio
    gates), removed as a non-canonical exact duplicate, hash-sampled out
    (80% keep), or KEPT with its training shard. This is the end-to-end
    shape a real corpus build runs nightly; each stage is an operator the
    repo gates individually (charclass/quality → exact dedup → weighted
    sample → seeded shard), composed here to prove they pipeline without
    materialization barriers.

    One projection computes all stage signals, one fingerprint agg
    canonicalizes (only quality survivors compete — the stage order
    matters and is mirrored in the oracle), one key-local join assigns
    dispositions: two shuffles total at any corpus size. Runs on the
    augmented corpus so the dedup stage has real work."""
    from change_data_capture_spark.operators.dedup_queries import corpus

    c = corpus(spark, sf_dir)
    from change_data_capture_spark.functions.text import (
        fingerprint,
        tokens,
    )

    n_chars = F.length("text")
    n_alpha = n_chars - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
    staged = c.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        n_alpha.alias("n_alpha"),
        n_chars.alias("n_chars"),
        fingerprint(F.col("text")).alias("fp"),
        seeded_hash(F.col("doc_id").cast("string"), "psample").alias("draw"),
    )
    flagged = staged.select(
        "doc_id",
        "fp",
        "draw",
        (
            (F.col("n_tokens") >= 30) & (F.col("n_alpha") * 2 >= F.col("n_chars"))
        ).alias("quality_ok"),
    )
    canon = (
        flagged.where("quality_ok")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("canonical_doc_id"))
    )
    j = flagged.join(canon, "fp", "left")
    kept = (
        F.col("quality_ok")
        & (F.col("doc_id") == F.col("canonical_doc_id"))
        & (F.col("draw") % 100 < 80)
    )
    return j.select(
        "doc_id",
        F.when(~F.col("quality_ok"), F.lit("filtered_quality"))
        .when(F.col("doc_id") != F.col("canonical_doc_id"), F.lit("removed_duplicate"))
        .when(F.col("draw") % 100 >= 80, F.lit("sampled_out"))
        .otherwise(F.lit("kept"))
        .alias("disposition"),
        F.when(kept, F.col("draw") % 8).alias("shard"),
    )
