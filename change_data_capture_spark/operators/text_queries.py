"""Text-analysis queries over ``documents`` (LLM-data tier, SURVEY.md §2.B):
quality stats, BPE-ish token counting, language-ID heuristic, fingerprinting.
All built-in expressions — a 100 TB corpus scan stays a single codegen'd
projection (+ one shuffle where grouped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from change_data_capture_spark.functions.text import (
    STOPWORDS,
    fingerprint,
    normalize,
    seeded_hash,
    shingles_from_tokens,
    tokens,
)
from change_data_capture_spark.operators.common import materialize_and_release
from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.tables import load_table

_SW_SQL = "('" + "','".join(STOPWORDS) + "')"

# BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation —
# the shape GPT-style tokenizers use as the pre-split (public pattern).
_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


_TEXT_STATS_ORACLE = f"""
WITH t AS (
    SELECT doc_id, lang, n_chars,
           regexp_split_to_array(trim(text), '\\s+') AS toks,
           length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace
    FROM documents
)
SELECT doc_id, lang,
       n_chars,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_unique_tokens,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio,
       CAST(n_nonspace AS DOUBLE) / len(toks) AS avg_token_len,
       len(list_filter(toks, x -> x IN {_SW_SQL})) AS n_stopwords,
       CAST(len(list_filter(toks, x -> x IN {_SW_SQL})) AS DOUBLE) / len(toks)
           AS stopword_ratio
FROM t
"""


@query("text_quality_stats", oracle=_TEXT_STATS_ORACLE)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: token counts, type-token ratio, average
    token length, stopword ratio — the standard cheap filters of an LLM data
    pipeline. Zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    n_nonspace = F.length(F.regexp_replace("text", r"\s+", ""))
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique_tokens"),
        (n_uniq.cast("double") / n_tok).alias("type_token_ratio"),
        (n_nonspace.cast("double") / n_tok).alias("avg_token_len"),
        sw.alias("n_stopwords"),
        (sw.cast("double") / n_tok).alias("stopword_ratio"),
    )


_TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_pretokens,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_llm_tokens
FROM documents
"""


@query("token_counting", oracle=_TOKEN_COUNT_ORACLE)
def token_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish pre-tokenizer regex,
    and the chars/4 LLM heuristic."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_BPE_RE)).alias("n_bpe_pretokens"),
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
        F.ceil(F.length("text") / 4.0).alias("approx_llm_tokens"),
    )


_LANG_ID_ORACLE = f"""
WITH scored AS (
    SELECT doc_id, lang,
           CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x IN {_SW_SQL})) AS DOUBLE)
             / len(regexp_split_to_array(trim(text), '\\s+')) AS sw_ratio
    FROM documents
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN sw_ratio >= 0.05 THEN 'en' ELSE 'unk' END AS predicted_lang,
       (CASE WHEN sw_ratio >= 0.05 THEN 'en' ELSE 'unk' END) = lang AS agrees
FROM scored
"""


@query("lang_id_heuristic", oracle=_LANG_ID_ORACLE)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID heuristic (n-gram/stopword profiling is the
    standard cheap lang-ID). The fixture text is synthetic word soup, so the
    point is the deterministic operator, not model accuracy."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sw_ratio = (
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
        / F.size(toks)
    )
    pred = F.when(sw_ratio >= 0.05, "en").otherwise("unk")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("agrees"),
    )


_FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
       substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 8)
           AS fingerprint_prefix
FROM documents
"""


@query("doc_fingerprint", oracle=_FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-md5 document fingerprint — the join key for exact dedup
    and incremental re-crawl diffing."""
    d = load_table(spark, sf_dir, "documents")
    fp = fingerprint(F.col("text"))
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fingerprint_prefix"),
    )


_CHUNK_SIZE = 50
_CHUNK_STRIDE = 40  # 10-token overlap

_CHUNKING_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
    FROM documents
),
chunks AS (
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_id,
           t[(i * {_CHUNK_STRIDE} + 1):(i * {_CHUNK_STRIDE} + {_CHUNK_SIZE})] AS chunk
    FROM toks,
         UNNEST(range(0, CAST(ceil(greatest(len(t) - {_CHUNK_SIZE - _CHUNK_STRIDE}, 1)
                                   / {_CHUNK_STRIDE}.0) AS BIGINT))) AS r(i)
)
SELECT doc_id, chunk_id,
       len(chunk) AS n_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_md5
FROM chunks
"""


@query("document_chunking", oracle=_CHUNKING_ORACLE)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (50-token chunks, 10-token overlap)
    — the step that turns documents into training sequences. Pure
    array-lambda flatMap: tokens materialize once per doc, chunk windows
    explode from a computed index range; zero shuffles, linear in corpus
    size. Chunk identity is (doc_id, chunk_id) with an md5 over the joined
    tokens, so the oracle checks the exact chunk contents."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("t"))
    n_chunks = F.ceil(
        F.greatest(F.size("t") - (_CHUNK_SIZE - _CHUNK_STRIDE), F.lit(1))
        / F.lit(float(_CHUNK_STRIDE))
    ).cast("int")
    chunked = toks.select(
        "doc_id",
        "t",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id", "_i"),
    ).select(
        "doc_id",
        "chunk_id",
        F.slice(
            F.col("t"), F.col("chunk_id") * _CHUNK_STRIDE + 1, _CHUNK_SIZE
        ).alias("chunk"),
    )
    return chunked.select(
        "doc_id",
        "chunk_id",
        F.size("chunk").alias("n_tokens"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
    )


#: per-stratum keep percentage (integer so the keep rule is exact in both
#: engines: rnk * 100 <= pct * n_stratum — no float fraction ever multiplies
#: a count)
_STRAT_PCT_EN = 30

#: draw-range buckets for the two-phase per-stratum rank: seeded_hash is a
#: uniform 60-bit integer, so draw >> 50 yields 1024 balanced buckets with
#: NO min/max pass — bucket boundaries are monotone in draw by construction
_STRAT_BUCKET_SHIFT = 50

_STRAT_ORACLE = f"""
WITH drawn AS (
    SELECT doc_id, lang, source,
           CAST(('0x' || substr(md5('ssample|' || CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS draw
    FROM documents
),
ranked AS (
    SELECT doc_id, lang, source,
           row_number() OVER (PARTITION BY lang ORDER BY draw, doc_id) AS rnk,
           count(*) OVER (PARTITION BY lang) AS n_stratum
    FROM drawn
)
SELECT doc_id, lang, source
FROM ranked
WHERE rnk * 100 <= (CASE WHEN lang = 'en' THEN {_STRAT_PCT_EN} ELSE 100 END)
                   * n_stratum
"""


@query("corpus_stratified_sample", oracle=_STRAT_ORACLE)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-FRACTION stratified corpus sampling — the down-sampling step of
    a training-data mix: keep 100% of low-resource langs and exactly
    floor(30% · n) of 'en', chosen as the stratum's lowest seeded-hash
    draws (a uniform fixed-size subset, deterministic and
    append/repartition-stable — what Bernoulli ``sampleBy`` only gives in
    expectation; this query was rows-only until round 6, when the
    hash-order-statistics form made the exact kept set cross-engine).

    The per-stratum rank does NOT use a ``partitionBy(lang)`` window — at
    100 TB the 'en' stratum is most of the corpus and a single-reducer
    stratum sort is a skew bomb. Instead the two-phase bucket rank
    (``analytics_queries._ranks_long_form``'s shape, specialized): the
    60-bit draw's top 10 bits split every stratum into 1024
    uniform-by-construction range buckets, tiny per-(lang, bucket) counts
    give each bucket's global offset via a broadcast prefix sum, and
    row_number runs per (lang, bucket) — the widest window partition is
    stratum/1024. The keep rule is integer-exact on both engines:
    ``rnk * 100 <= pct * n_stratum`` (no float · count)."""
    d = load_table(spark, sf_dir, "documents")
    draw = seeded_hash(F.col("doc_id").cast("string"), "ssample")
    b = d.select(
        "doc_id", "lang", "source", draw.alias("draw")
    ).withColumn("bkt", F.shiftright("draw", _STRAT_BUCKET_SHIFT))
    counts = b.groupBy("lang", "bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("lang")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "lang",
        "bkt",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
        F.sum("cnt").over(Window.partitionBy("lang")).alias("n_stratum"),
    )
    w_in = Window.partitionBy("lang", "bkt").orderBy("draw", "doc_id")
    ranked = b.join(F.broadcast(offsets), ["lang", "bkt"]).select(
        "doc_id",
        "lang",
        "source",
        "n_stratum",
        (F.col("off") + F.row_number().over(w_in)).alias("rnk"),
    )
    pct = F.when(F.col("lang") == "en", F.lit(_STRAT_PCT_EN)).otherwise(F.lit(100))
    return ranked.where(
        F.col("rnk") * 100 <= pct * F.col("n_stratum")
    ).select("doc_id", "lang", "source")


_LANG_ROLLUP_ORACLE = """
SELECT lang, source,
       count(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM documents
GROUP BY lang, source
"""


@query("corpus_lang_source_profile", oracle=_LANG_ROLLUP_ORACLE)
def corpus_lang_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition profile by (lang, source) — the bookkeeping agg
    every training-data pipeline runs before sampling."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# deterministic train/eval split (hash partitioning of the corpus)
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = """
WITH hashed AS (
    SELECT doc_id, lang,
           CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
    FROM documents
)
SELECT lang,
       CASE WHEN bucket < 90 THEN 'train' ELSE 'eval' END AS split,
       COUNT(*) AS n_docs,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM hashed
GROUP BY 1, 2
"""


@query("corpus_train_eval_split", oracle=_SPLIT_ORACLE)
def corpus_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/10 train/eval assignment by a SEEDED CONTENT HASH of the stable
    document key — the split every training pipeline needs to be (a)
    deterministic across reruns and engines (no rand()), (b) stable under
    re-partitioning and appends (a new doc never moves an old one), and
    (c) joinable (any table keyed by doc_id derives the same split). The
    md5-based hash family is the same one MinHash/SimHash use, so the
    oracle reproduces the buckets exactly."""
    d = load_table(spark, sf_dir, "documents")
    bucket = seeded_hash(F.col("doc_id").cast("string"), seed="split") % 100
    return (
        d.select(
            "lang",
            F.when(bucket < 90, "train").otherwise("eval").alias("split"),
            "doc_id",
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms (linear-idf variant — exact cross-engine arithmetic)
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
    FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, score
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) <= 3
"""


@query("text_tfidf_top_terms", oracle=_TFIDF_ORACLE)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic terms per document by tf × (N/df).

    The classic ln-idf is deliberately replaced with the linear inverse
    frequency N/df: libm transcendentals are NOT bit-identical across
    engines (measured: Spark/DuckDB ln() differ in the last ulp on ~8% of
    inputs), while integer products and one IEEE division are — so this
    variant is hash-checkable and preserves the ranking intent (monotone in
    tf and in 1/df). Physical shape: one explode + (doc,term) count, a
    term-keyed df aggregate joined back, a 1-row N broadcast, per-doc top-k
    via WindowGroupLimit."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .select(
            "doc_id", "term", "tf", "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


# ---------------------------------------------------------------------------
# bigram language-model counts
# ---------------------------------------------------------------------------

_BIGRAM_ORACLE = """
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
    FROM documents
),
grams AS (
    SELECT unnest(list_zip(ts[1:len(ts) - 1], ts[2:len(ts)])) AS g
    FROM toks
)
SELECT g[1] AS w1, g[2] AS w2, count(*) AS n
FROM grams
GROUP BY 1, 2
HAVING count(*) >= 5
"""


@query("text_bigram_counts", oracle=_BIGRAM_ORACLE)
def text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts (the n-gram-LM / fuzzy-dedup building block):
    adjacent token pairs via a zip of the token array with its own tail —
    one explode, no self-join — then a plain count with a support floor.
    The token array is materialized as a column BEFORE the zip (HOF lambdas
    don't CSE; an inline split would re-tokenize per element)."""
    d = load_table(spark, sf_dir, "documents")
    with_toks = d.select("doc_id", tokens(F.col("text")).alias("ts"))
    grams = with_toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("g")
    ).select("g.w1", "g.w2")
    return (
        grams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 5)
    )


# ---------------------------------------------------------------------------
# Eval-set decontamination (13-gram train/eval overlap)
# ---------------------------------------------------------------------------

# The toks → pos → grams CTE chain building the decontamination gram
# relation (13-token shingles, 'decontam'-seeded 60-bit hashes, seeded
# 90/10 split buckets). A NAMED block, not a finished query: both the
# exact-join oracle below and analytics_queries' Bloom-path oracle
# compose from it, so the two oracles stay bit-identical by
# construction instead of by string surgery on each other's SQL.
_DECONTAM_GRAMS_CTE = """toks AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket,
           regexp_split_to_array(trim(text), '\\s+') AS w
    FROM documents
),
pos AS (
    SELECT doc_id, bucket, w,
           unnest(generate_series(1, len(w) - 12)) AS i
    FROM toks
    WHERE len(w) >= 13
),
grams AS (
    SELECT DISTINCT doc_id, bucket,
           CAST(('0x' || substr(md5('decontam|' || array_to_string(w[i:i+12], ' ')), 1, 15)) AS BIGINT) AS gh
    FROM pos
)"""

_DECONTAM_ORACLE = f"""
WITH {_DECONTAM_GRAMS_CTE},
train AS (SELECT DISTINCT gh, doc_id AS train_doc FROM grams WHERE bucket < 90),
ev    AS (SELECT DISTINCT gh, doc_id FROM grams WHERE bucket >= 90)
SELECT ev.doc_id,
       count(DISTINCT gh) AS n_shared_grams,
       count(DISTINCT train_doc) AS n_train_docs
FROM ev JOIN train USING (gh)
GROUP BY ev.doc_id
"""


def _decontam_gram_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination gram relation — 13-token shingles reduced to
    60-bit ``decontam``-seeded hashes, deduped per doc, with the seeded
    90/10 train/eval split — UNPERSISTED (callers decide caching). This is
    the SINGLE construction behind both the exact-join gate
    (``corpus_decontamination``) and the Bloom production gate
    (``corpus_decontamination_bloom``): their audit-each-other property
    requires the two gram relations to be bit-identical, so the build
    must not be duplicated."""
    d = load_table(spark, sf_dir, "documents")
    bucket = seeded_hash(F.col("doc_id").cast("string"), seed="split") % 100
    base = d.select(
        "doc_id",
        (bucket < 90).alias("is_train"),
        tokens(F.col("text")).alias("toks"),
    ).where(F.size("toks") >= 13)
    return (
        base.select(
            "doc_id",
            "is_train",
            F.explode(shingles_from_tokens(F.col("toks"), k=13)).alias("gram"),
        )
        .select(
            "doc_id",
            "is_train",
            seeded_hash(F.col("gram"), seed="decontam").alias("gh"),
        )
        .dropDuplicates(["doc_id", "gh"])
    )


@query("corpus_decontamination", oracle=_DECONTAM_ORACLE)
def corpus_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag every EVAL document that shares a
    13-token n-gram with any TRAIN document — the standard benchmark-leakage
    check run before an LLM training corpus ships. Reuses the seeded-hash
    90/10 split of ``corpus_train_eval_split`` so the two operators compose.

    Scale shape (the part that matters at 100 TB): grams are reduced to a
    60-bit seeded hash BEFORE the shuffle, so the overlap join moves two
    longs per gram instead of ~90 bytes of text; per-doc gram sets are
    deduped pre-join (one hash-agg) so the join's output cardinality is the
    true overlap-pair count, not raw positional occurrences. The join keys
    on the gram hash — perfectly partitionable; hot grams (boilerplate) are
    the one skew source and would be frequency-capped in production (drop
    grams present in >0.1% of docs) — not applied here to keep the oracle
    the exact textbook definition.

    The gram relation (:func:`_decontam_gram_rel`, shared verbatim with
    the Bloom production gate so the two audit each other) is PERSISTED
    here because both join sides derive from it — unpersisted, the
    tokenize + explode + hash + dedup subtree runs twice, the identical
    double-recompute the r9 round measured at 2× end-to-end on the
    novelty gates; the cache is released once the result is
    materialized."""
    grams = _decontam_gram_rel(spark, sf_dir).persist()
    train = grams.where("is_train").select("gh", F.col("doc_id").alias("train_doc"))
    ev = grams.where(~F.col("is_train")).select("gh", "doc_id")
    result = (
        ev.join(train, "gh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gh").alias("n_shared_grams"),
            F.countDistinct("train_doc").alias("n_train_docs"),
        )
    )
    return materialize_and_release(result, grams)


# ---------------------------------------------------------------------------
# n-gram novelty scoring: how much of a candidate document is NOT already
# covered by a trusted reference corpus — the inverse of decontamination,
# used to prioritize genuinely new data when growing a training corpus
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = """
WITH toks AS (
    SELECT doc_id, source,
           regexp_split_to_array(trim(text), '\\s+') AS w
    FROM documents
),
pos AS (
    SELECT doc_id, source, w,
           unnest(generate_series(1, len(w) - 4)) AS i
    FROM toks
    WHERE len(w) >= 5
),
grams AS (
    SELECT DISTINCT doc_id, source,
           CAST(('0x' || substr(md5('novelty|' || array_to_string(w[i:i+4], ' ')), 1, 15)) AS BIGINT) AS gh
    FROM pos
),
ref AS (
    SELECT DISTINCT gh FROM grams
    WHERE source IN ('src0', 'src1', 'src2', 'src3')
),
cand AS (
    SELECT doc_id, gh FROM grams
    WHERE source NOT IN ('src0', 'src1', 'src2', 'src3')
)
SELECT c.doc_id,
       count(*) AS n_grams,
       count(r.gh) AS n_seen,
       1.0 - CAST(count(r.gh) AS DOUBLE) / count(*) AS novelty
FROM cand c LEFT JOIN ref r USING (gh)
GROUP BY c.doc_id
"""


@query("ngram_novelty_score", oracle=_NOVELTY_ORACLE)
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty against a reference corpus: the fraction of a
    candidate document's distinct 5-gram hashes absent from the reference
    partition (sources src0–src3 stand in for "already-ingested corpus").
    High-novelty documents are the ones worth adding to a training set;
    near-zero novelty means the document is already covered.

    Same 100 TB shape as ``corpus_decontamination``: grams shrink to 60-bit
    seeded hashes before any shuffle, per-doc gram sets dedup in one
    hash-agg, and the membership probe is a LEFT join keyed on the gram
    hash — O(grams), perfectly partitionable. In production the reference
    side would additionally be a broadcast Bloom/HLL sketch when it fits,
    dropping the shuffle entirely; the exact join is kept here because the
    oracle must be exact."""
    result, grams = _novelty_score_plan(spark, sf_dir)
    return materialize_and_release(result, grams)


def _novelty_score_plan(spark: SparkSession, sf_dir: str):
    """The lazy plan of :func:`ngram_novelty_score` plus the persisted gram
    relation handle — split out so plan pins can inspect the REAL compute
    plan (the gate wrapper returns a cached result whose formatted explain
    duplicates operators across AQE initial/final renderings).

    The PERSISTED gram relation comes from the single shared builder
    (``analytics_queries._novelty_grams`` — deferred import, the two
    modules import each other's pieces lazily): the Bloom gates' audit
    twins must see a bit-identical gram relation, so the construction is
    not duplicated here."""
    from change_data_capture_spark.operators.analytics_queries import (
        _novelty_grams,
    )

    grams = _novelty_grams(spark, sf_dir)
    ref = grams.where("is_ref").select(F.col("gh").alias("ref_gh")).distinct()
    cand = grams.where(~F.col("is_ref")).select("doc_id", "gh")
    seen = F.count("ref_gh")
    result = (
        cand.join(ref, cand["gh"] == ref["ref_gh"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            seen.alias("n_seen"),
            (1.0 - seen.cast("double") / F.count(F.lit(1))).alias("novelty"),
        )
    )
    return result, grams


# ---------------------------------------------------------------------------
# corpus domain mixing: downsample each source to an equal token budget —
# the Pile/Dolma-style mixture-weighting step of corpus assembly
# ---------------------------------------------------------------------------

_MIXING_ORACLE = """
WITH tok AS (
    SELECT doc_id, source,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
    FROM documents
),
src AS (SELECT source, sum(n_tokens) AS src_tokens FROM tok GROUP BY source),
tot AS (SELECT sum(src_tokens) AS total FROM src),
rates AS (
    SELECT s.source,
           least(1.0, (t.total * 0.8 / 20.0) / s.src_tokens) AS rate
    FROM src s, tot t
)
SELECT k.doc_id, k.source, k.n_tokens, r.rate
FROM tok k JOIN rates r USING (source)
WHERE CAST(('0x' || substr(md5('mix|' || CAST(k.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
      < CAST(floor(r.rate * 10000) AS BIGINT)
"""


@query("corpus_domain_mixing", oracle=_MIXING_ORACLE)
def corpus_domain_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source mixture weighting: give every source an equal share of
    an 80%-of-corpus token budget and hash-downsample over-represented
    sources to their share (rate = min(1, budget/actual)). This is the
    mixture-reweighting step every large corpus assembly runs (equal-share
    here; any target vector plugs into the same shape).

    Scale shape: one tiny per-source agg (|sources| rows) broadcast back
    onto the corpus scan, then a stateless seeded-hash keep decision per
    document — a single wide scan + broadcast join, no corpus shuffle.
    Determinism: rates are exact-integer divisions evaluated identically in
    both engines; membership is an integer comparison on a portable md5
    hash, so the sample is reproducible anywhere."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    src = tok.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    tot = src.agg(F.sum("src_tokens").alias("total"))
    rates = src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            (F.col("total") * 0.8 / 20.0) / F.col("src_tokens"),
        ).alias("rate"),
    )
    keep = (
        seeded_hash(F.col("doc_id").cast("string"), seed="mix") % 10000
        < F.floor(F.col("rate") * 10000).cast("long")
    )
    return (
        tok.join(F.broadcast(rates), "source")
        .where(keep)
        .select("doc_id", "source", "n_tokens", "rate")
    )


# ---------------------------------------------------------------------------
# seeded corpus shuffle: deterministic global training order, sharded —
# the "shuffle the corpus before training" step, expressed scale-first
# ---------------------------------------------------------------------------

_SHUFFLE_ORACLE = """
WITH h AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh
    FROM documents
)
SELECT doc_id,
       hh % 8 AS shard,
       row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS pos_in_shard
FROM h
"""


@query("corpus_seeded_shuffle", oracle=_SHUFFLE_ORACLE)
def corpus_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the corpus into 8 training shards:
    shard = seeded-hash mod 8, position within shard = rank by (hash,
    doc_id). Training-data loaders consume (shard, pos_in_shard) as the
    reproducible read order — the same order from any engine, any run.

    Scale shape: the rank windows are PARTITIONED by shard (the parallel
    unit — 8 here, thousands at 100 TB), so there is no global sort and no
    single-partition window; each shard sorts independently after one hash
    shuffle. This is exactly how a 100 TB corpus is shuffled in practice:
    more shards = more parallelism, order within a shard is all a data
    loader needs."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        seeded_hash(F.col("doc_id").cast("string"), seed="shuffle").alias("hh"),
    )
    w = Window.partitionBy(F.col("hh") % 8).orderBy("hh", "doc_id")
    return h.select(
        "doc_id",
        (F.col("hh") % 8).alias("shard"),
        F.row_number().over(w).alias("pos_in_shard"),
    )


# ---------------------------------------------------------------------------
# character-class / script profile
# ---------------------------------------------------------------------------

_CHARCLASS_ORACLE = """
WITH t AS (
    SELECT doc_id,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
           length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
           length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
           length(text) - length(regexp_replace(text, '[ \\t\\n\\r]', '', 'g')) AS n_space,
           length(text) - length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) AS n_nonascii
    FROM documents
)
SELECT doc_id, n_chars, n_alpha, n_upper, n_digit, n_space, n_nonascii,
       n_chars - n_alpha - n_digit - n_space - n_nonascii AS n_other_ascii,
       CAST(n_alpha AS DOUBLE) / NULLIF(n_chars, 0) AS alpha_ratio,
       CAST(n_upper AS DOUBLE) / NULLIF(n_alpha, 0) AS upper_ratio,
       CAST(n_nonascii AS DOUBLE) / NULLIF(n_chars, 0) AS nonascii_ratio
FROM t
"""


@query("text_charclass_profile", oracle=_CHARCLASS_ORACLE)
def text_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-class profile: alphabetic / uppercase / digit
    / whitespace / non-ASCII counts and the derived ratios — the cheap
    script-and-noise filter that runs before any tokenizer (high digit or
    non-ASCII ratios flag tables, code dumps, and mis-decoded bytes; the
    uppercase ratio flags shouting/boilerplate).

    Scale shape: one codegen'd projection, zero shuffles — ``length`` minus
    ``regexp_replace`` length stays JVM-side (both engines count Unicode
    code points, so the oracle matches exactly); ratios are single int÷int
    divisions (bit-identical IEEE doubles), NULL on empty denominators."""
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")

    def _cnt(pat: str) -> F.Column:
        return n_chars - F.length(F.regexp_replace("text", pat, ""))

    n_alpha = _cnt("[A-Za-z]")
    n_upper = _cnt("[A-Z]")
    n_digit = _cnt("[0-9]")
    n_space = _cnt("[ \\t\\n\\r]")
    n_nonascii = _cnt("[^\\x00-\\x7F]")

    def _ratio(num: F.Column, den: F.Column) -> F.Column:
        return F.when(den > 0, num.cast("double") / den)

    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_alpha.alias("n_alpha"),
        n_upper.alias("n_upper"),
        n_digit.alias("n_digit"),
        n_space.alias("n_space"),
        n_nonascii.alias("n_nonascii"),
        (n_chars - n_alpha - n_digit - n_space - n_nonascii).alias("n_other_ascii"),
        _ratio(n_alpha, n_chars).alias("alpha_ratio"),
        _ratio(n_upper, n_alpha).alias("upper_ratio"),
        _ratio(n_nonascii, n_chars).alias("nonascii_ratio"),
    )


# ---------------------------------------------------------------------------
# corpus-frequency commonness score (rare-token noise detector)
# ---------------------------------------------------------------------------

_COMMONNESS_ORACLE = """
WITH tok AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
    FROM documents
),
vocab AS (SELECT token, count(*) AS freq FROM tok GROUP BY token)
SELECT t.doc_id,
       count(*) AS n_tokens,
       CAST(CAST(SUM(v.freq) AS BIGINT) AS DOUBLE) / count(*) AS avg_token_freq,
       min(v.freq) AS min_token_freq
FROM tok t JOIN vocab v USING (token)
GROUP BY t.doc_id
"""


@query("text_commonness_score", oracle=_COMMONNESS_ORACLE)
def text_commonness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency commonness scoring: each document's tokens are
    scored by how often they occur in the WHOLE corpus; the per-doc mean
    and minimum flag OCR garbage, mojibake, and synthetic noise (documents
    whose tokens the corpus has never seen) without any external language
    model — the exact-arithmetic stand-in for LM-perplexity filtering
    (log-prob scoring is engine-libm-dependent; token frequencies are
    integers).

    Two hash shuffles: one vocabulary count (token-keyed, map-side
    combined), one doc re-aggregation; the vocab→token join is key-local.
    At 100 TB the vocabulary relation is Heaps-law sublinear in the corpus
    and the hot top-K of it could broadcast — documented, not needed at
    fixture scale."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    return (
        tok.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("freq").cast("double") / F.count(F.lit(1))).alias(
                "avg_token_freq"
            ),
            F.min("freq").alias("min_token_freq"),
        )
    )


# ---------------------------------------------------------------------------
# signed feature hashing (the hashing trick)
# ---------------------------------------------------------------------------

_FH_DIMS = 16

_FH_HASH = "CAST(('0x' || substr(md5('fh|' || token), 1, 15)) AS BIGINT)"

_FEATURE_HASH_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
    FROM documents
),
hashed AS (
    SELECT doc_id,
           {_FH_HASH} % {_FH_DIMS} AS bucket,
           CASE WHEN ({_FH_HASH} >> 4) & 1 = 1 THEN 1 ELSE -1 END AS sgn
    FROM tok
)
SELECT doc_id,
       {", ".join(f"coalesce(CAST(SUM(CASE WHEN bucket = {j} THEN sgn END) AS BIGINT), 0) AS f{j}" for j in range(16))}
FROM hashed
GROUP BY doc_id
"""


@query("text_feature_hashing", oracle=_FEATURE_HASH_ORACLE)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed feature hashing (Weinberger et al. 2009 — the "hashing
    trick"): every token folds into one of 16 buckets with a ±1 sign, so a
    document becomes a fixed-width integer vector with NO vocabulary table
    at all — the unsupervised featurization that scales to any corpus
    because its only state is the hash function.

    One explode + one conditional-sum agg (single shuffle on doc_id,
    map-side combined). The seeded-md5 bucket/sign bits are the portable
    hash family, so the oracle reproduces every vector exactly."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    h = seeded_hash(F.col("token"), "fh")
    hashed = tok.select(
        "doc_id",
        (h % _FH_DIMS).alias("bucket"),
        F.when(h.bitwiseAND(F.lit(16)) != 0, F.lit(1)).otherwise(F.lit(-1)).alias("sgn"),
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("bucket") == j, F.col("sgn"))), F.lit(0)
            ).alias(f"f{j}")
            for j in range(_FH_DIMS)
        ]
    )


# ---------------------------------------------------------------------------
# temperature-based source mixture weights (alpha = 0.5)
# ---------------------------------------------------------------------------

_TEMPERATURE_ORACLE = """
WITH per_source AS (
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
               AS n_tokens
    FROM documents GROUP BY source
),
denom AS (
    SELECT list_reduce(
               list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY source),
               (a, b) -> a + b) AS z,
           CAST(SUM(n_docs) AS BIGINT) AS total_docs
    FROM per_source
)
SELECT p.source, p.n_docs, p.n_tokens,
       sqrt(CAST(p.n_tokens AS DOUBLE)) / d.z AS weight,
       sqrt(CAST(p.n_tokens AS DOUBLE)) / d.z * d.total_docs AS expected_docs
FROM per_source p CROSS JOIN denom d
"""


@query("corpus_temperature_weights", oracle=_TEMPERATURE_ORACLE)
def corpus_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture weighting (the multilingual-sampling rule,
    α = 0.5): a source's training share is proportional to its token count
    raised to α — up-weighting small sources without letting any giant
    source dominate. α = 0.5 is implemented as ``sqrt``, which unlike
    ``pow`` is IEEE-correctly-rounded in every libm, so the weights are
    bit-identical cross-engine.

    One source-level agg (tiny), then the normalizer folds the per-source
    √tokens IN SOURCE-NAME ORDER (both engines fold the same sequence —
    unordered SUM over doubles would not be reproducible), and a 1-row
    broadcast joins it back."""
    d = load_table(spark, sf_dir, "documents")
    per_source = (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
        )
        .persist()
    )
    denom = per_source.agg(
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("source"), F.col("n_tokens").alias("t"))
                    )
                ),
                lambda s: F.sqrt(s["t"].cast("double")),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("z"),
        F.sum("n_docs").alias("total_docs"),
    )
    w = F.sqrt(F.col("n_tokens").cast("double")) / F.col("z")
    return per_source.crossJoin(F.broadcast(denom)).select(
        "source",
        "n_docs",
        "n_tokens",
        w.alias("weight"),
        (w * F.col("total_docs")).alias("expected_docs"),
    )
