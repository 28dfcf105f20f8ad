"""Deduplication family (LLM-data tier, SURVEY.md §2.B): exact, n-gram
Jaccard, MinHash+LSH, SimHash.

The fixture ``documents`` table has no duplicate texts, so each query builds
a deterministic *augmented corpus* first — the originals plus exact replicas
(doc_id+100000, every 10th doc) and near-duplicate mutations (doc_id+200000,
every 7th doc, two junk tokens appended) — the same construction in Spark and
in the oracle SQL. This gives every dedup operator known-positive dup groups
to find.

Scale design: everything is explode→shuffle-on-key relational algebra — the
shapes that survive 100 TB. Exact dedup is a hash groupBy on a fingerprint;
Jaccard is an inverted-index self-join on shingles (band-limited for MinHash,
so candidate generation is O(collisions), not O(n²)); signatures are k
independent min-aggregations over one exploded shingle relation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from change_data_capture_spark.functions.text import (
    fingerprint,
    seeded_hash,
    shingles,
)
from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.tables import load_table

#: shared augmented-corpus CTE (DuckDB side)
CORPUS_SQL = """
corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 200000, text || ' qq zz' FROM documents WHERE doc_id % 7 = 0
)
"""

#: portable seeded 60-bit hash (DuckDB side); seed is a literal int
_H_SQL = "CAST(('0x' || substr(md5('{seed}|' || {col}), 1, 15)) AS BIGINT)"

N_PERMS = 8          # MinHash permutations
N_BANDS = 4          # LSH bands (2 rows per band)
JACCARD_THRESHOLD = 0.6


def corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of CORPUS_SQL."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq zz")).alias("text"),
    )
    return d.unionAll(exact).unionAll(near)


def doc_shingles(c: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) relation — distinct word-k-gram inverted index.

    Two deliberate physical choices (both measured, see text.py docstring):
    tokens are materialized into a column before shingling (lambda-inlined
    split() re-tokenizes per element access), and set semantics come from a
    post-explode ``distinct`` (hash partial-agg, linear) instead of per-row
    ``array_distinct`` (quadratic per doc)."""
    from change_data_capture_spark.functions.text import shingles_from_tokens, tokens

    return (
        c.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("toks"), k)).alias("shingle"),
        )
        .distinct()
    )


_SHINGLES_SQL = """
doc_shingles AS (
    SELECT doc_id, unnest(list_distinct(
        list_transform(range(1, len(regexp_split_to_array(trim(text), '\\s+')) - 1),
            i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                 regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                 regexp_split_to_array(trim(text), '\\s+')[i+2]))) AS shingle
    FROM corpus
)
"""


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

_EXACT_ORACLE = f"""
WITH {CORPUS_SQL}
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
       count(*) AS n_copies,
       min(doc_id) AS canonical_doc_id
FROM corpus
GROUP BY 1
HAVING count(*) > 1
"""


@query("dedup_exact", oracle=_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content fingerprint, keep min doc_id as
    canonical, report dup groups. One hash-agg shuffle on the fingerprint —
    the cheapest and first dedup pass of any pipeline."""
    c = corpus(spark, sf_dir)
    return (
        c.groupBy(fingerprint(F.col("text")).alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .where(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dedup (exact, inverted-index join)
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = f"""
WITH {CORPUS_SQL},
{_SHINGLES_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM doc_shingles a JOIN doc_shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= {JACCARD_THRESHOLD}
"""


@query("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs by 3-gram Jaccard ≥ 0.6 via the inverted-index
    self-join (pairs sharing zero shingles are never materialized). At
    web scale the shingle join is the bottleneck — MinHash+LSH below is the
    sublinear variant; this exact form is the ground truth."""
    # three consumers (sizes + both join sides) — persist, as in minhash
    sh = doc_shingles(corpus(spark, sf_dir)).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup (banded candidates, then exact verify)
# ---------------------------------------------------------------------------

def _minhash_sig_sql() -> str:
    mins = ",\n           ".join(
        f"min({_H_SQL.format(seed=i, col='shingle')}) AS h{i}" for i in range(N_PERMS)
    )
    # the per-doc shingle count rides along in the same aggregation — one
    # grouped pass produces signatures AND set sizes
    return (
        f"signatures AS (\n    SELECT doc_id, {mins},\n           count(*) AS n"
        f"\n    FROM doc_shingles GROUP BY doc_id\n)"
    )


def _bands_sql() -> str:
    rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat(h{2*b}, '_', h{2*b+1}) AS sig FROM signatures"
        for b in range(N_BANDS)
    )
    return f"bands AS ({rows})"


_MINHASH_ORACLE = f"""
WITH {CORPUS_SQL},
{_SHINGLES_SQL},
{_minhash_sig_sql()},
{_bands_sql()},
candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, n FROM signatures),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM candidates c
    JOIN doc_shingles sa ON sa.doc_id = c.doc_a
    JOIN doc_shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) >= {JACCARD_THRESHOLD}
"""


@query("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (8 perms) + LSH (4 bands × 2 rows) near-dedup.

    Candidate pairs come from banded signature collisions — the sublinear
    scale path (shuffle keyed on (band, sig); no all-pairs comparison) —
    then candidates are verified with exact Jaccard. The seeded-md5 hash
    family makes signatures identical in the oracle, so even this
    "approximate" operator is exactly checkable.
    """
    # the shingle relation feeds four branches (signatures, sizes, and both
    # sides of the verification join); without persist Spark would re-derive
    # it — re-tokenize + re-md5 — once per branch. Same reasoning as the
    # reference's twice-used CTE (SURVEY.md §4: explicit cache choice).
    sh = doc_shingles(corpus(spark, sf_dir)).persist()
    # one grouped pass yields the signature vector AND the set size
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(seeded_hash(F.col("shingle"), i)).alias(f"h{i}")
            for i in range(N_PERMS)
        ],
        F.count(F.lit(1)).alias("n"),
    ).persist()  # consumed by 4 band branches + sizes
    bands = reduce(
        DataFrame.unionAll,
        [
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("_", f"h{2*b}", f"h{2*b+1}").alias("sig"),
            )
            for b in range(N_BANDS)
        ],
    )
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = sig.select("doc_id", "n")
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# SimHash signatures (16-bit, token-set based)
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 16


def _simhash_cte(n_bits: int = _SIMHASH_BITS) -> str:
    """`doc_tokens` + `sigs` CTE bodies (shared by the signature gate and
    the Hamming-ball near-dup gate, which uses a wider signature)."""
    h = _H_SQL.format(seed=0, col="token")
    bits = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (({h}) >> {j}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(n_bits)
    )
    return f"""
doc_tokens AS (
    SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS token
    FROM corpus
),
sigs AS (
    SELECT doc_id, {bits} AS simhash
    FROM doc_tokens
    GROUP BY doc_id
)"""


def _simhash_sql() -> str:
    return f"""
WITH {CORPUS_SQL},
{_simhash_cte()}
SELECT doc_id, simhash FROM sigs
"""


def _simhash_signatures_df(c: DataFrame, n_bits: int = _SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — shared by the signature gate (16-bit) and the
    Hamming-ball near-dup gate (``_HAM_BITS`` = 60-bit)."""
    toks = c.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("token"),
    )
    h = seeded_hash(F.col("token"), 0)
    sim = reduce(
        lambda acc, j: acc
        + F.when(
            F.sum(
                F.when(F.shiftright(h, j).bitwiseAND(1) == 1, 1).otherwise(-1)
            )
            > 0,
            F.lit(1 << j),
        ).otherwise(0),
        range(1, n_bits),
        F.when(
            F.sum(F.when(h.bitwiseAND(1) == 1, 1).otherwise(-1)) > 0, F.lit(1)
        ).otherwise(0),
    )
    return toks.groupBy("doc_id").agg(sim.alias("simhash"))


@query("simhash_signatures", oracle=_simhash_sql())
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over the distinct-token set: per bit, majority vote of
    ±1 weighted by the token hash's bit value. One explode + one grouped
    aggregation (16 conditional sums) — near-dup docs land at small Hamming
    distance. Pairing by Hamming ≤ d is ``simhash_hamming_neardup``;
    the oracle checks the signatures themselves bit-for-bit."""
    return _simhash_signatures_df(corpus(spark, sf_dir))


_HAM_BITS = 60  # wider than the 16-bit signature gate: at 16 bits random
#                 vocabulary correlation alone puts ~10% of all doc pairs
#                 within Hamming 3 (measured 68k pairs on the 1.2k-doc
#                 smoke fixture). 60 (not 64) fits the seeded 60-bit hash
#                 and keeps every value inside a SIGNED 64-bit int on both
#                 engines.
_HAM_BLOCKS = 6          # 6 blocks × 10 bits
_HAM_MAX = 3             # pigeonhole: ≤3 flips leave ≥3 blocks clean
_HAM_BLOCK_W = _HAM_BITS // _HAM_BLOCKS
#: Manku/Jain/Sarma block-COMBINATION tables: one join key per 3-subset of
#: blocks (C(6,3) = 20 keys of 30 bits). A single-band split (4 × 12-bit
#: values) has only 4096 buckets per band, so random bucket collisions grow
#: as n²/4096 — the first 100× smoke of that design generated ~270M
#: candidate pairs from bucket noise alone. 30-bit combination keys put the
#: random-collision rate at n²/2³⁰ per table while keeping the d ≤ 3
#: guarantee exact.
_HAM_COMBOS: tuple[tuple[int, int, int], ...] = tuple(
    (a, b, c)
    for a in range(_HAM_BLOCKS)
    for b in range(a + 1, _HAM_BLOCKS)
    for c in range(b + 1, _HAM_BLOCKS)
)


def _ham_key_sql(combo: tuple[int, int, int]) -> str:
    mask = (1 << _HAM_BLOCK_W) - 1
    parts = [
        f"(((simhash >> {blk * _HAM_BLOCK_W}) & {mask}) << {i * _HAM_BLOCK_W})"
        for i, blk in enumerate(combo)
    ]
    return " + ".join(parts)


def simhash_band_rel(sigs: DataFrame, carry_sig: bool = False) -> DataFrame:
    """(doc_id, band, bv) block-combination keys of a (doc_id, simhash)
    relation — one 30-bit key per C(6,3) 3-block subset (see
    ``_HAM_COMBOS``). Shared by the batch pairing gate and the streaming
    incremental gate (``streaming/streaming_queries.py``); one explode,
    fully codegen'd.

    ``carry_sig=True`` keeps the 8-byte ``simhash`` column on every band
    row so the pairing join can verify ``bit_count(a XOR b)`` INLINE and
    filter BEFORE the pair distinct — 8 bytes/row of extra shuffle buys
    the removal of two doc-level signature joins (or, in the streaming
    form, a candidate-sized broadcast that ballooned to 75M rows on a
    dense corpus at 100×)."""
    mask = (1 << _HAM_BLOCK_W) - 1

    def _key(combo):
        parts = None
        for i, blk in enumerate(combo):
            p = F.shiftleft(
                F.shiftright("simhash", blk * _HAM_BLOCK_W).bitwiseAND(F.lit(mask)),
                i * _HAM_BLOCK_W,
            )
            parts = p if parts is None else parts + p
        return parts

    keep = ["doc_id", "simhash"] if carry_sig else ["doc_id"]
    return sigs.select(
        *keep,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), _key(c).alias("bv"))
                    for i, c in enumerate(_HAM_COMBOS)
                ]
            )
        ).alias("bb"),
    ).select(*keep, F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))


#: full-recompute SimHash pairing restricted to pairs that involve a delta
#: doc (doc_id % _DELTA_MOD == 0) — the shared oracle of the STREAMING
#: incremental SimHash gate, mirroring _MINHASH_INCR_ORACLE's contract:
#: banding and popcount are deterministic, so the incremental drain must
#: equal this slice bit-for-bit.
_SIMHASH_INCR_ORACLE_TEMPLATE = """
WITH {corpus_sql},
{simhash_cte},
bands AS (
{band_union}
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
FROM cand c
JOIN sigs sa ON sa.doc_id = c.doc_a
JOIN sigs sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {ham_max}
  AND (c.doc_a % {delta_mod} = 0 OR c.doc_b % {delta_mod} = 0)
"""


_SIMHASH_NEARDUP_ORACLE = f"""
WITH {CORPUS_SQL},
{_simhash_cte(_HAM_BITS)},
bands AS (
{" UNION ALL ".join(f"    SELECT doc_id, {i} AS band, {_ham_key_sql(c)} AS bv FROM sigs"
                    for i, c in enumerate(_HAM_COMBOS))}
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
FROM cand c
JOIN sigs sa ON sa.doc_id = c.doc_a
JOIN sigs sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {_HAM_MAX}
"""


@query("simhash_hamming_neardup", oracle=_SIMHASH_NEARDUP_ORACLE)
def simhash_hamming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRING at scale — the Manku/Jain/Sarma (WWW 2007)
    web-crawl dedup shape with BLOCK-COMBINATION tables: the 60-bit
    signature splits into 6 blocks of 10 bits, and each C(6,3) = 20
    3-block subset concatenates into one 30-bit join key. By pigeonhole,
    two signatures within Hamming distance ``_HAM_MAX = 3`` flip at most 3
    blocks, so some 3-subset is clean on both and they collide in that
    table — unlike MinHash banding, which trades recall probabilistically,
    this candidate generation is EXACT for the distance threshold: recall
    1.0 by construction, no sweep needed. Verification is one integer op
    per candidate (``bit_count(a XOR b)``), the cheapest verify of any
    dedup family here.

    Why combination keys and not a plain 4-band split: 12-bit band values
    give 4096 buckets, so random bucket collisions grow as n²/4096 — the
    first 100× smoke of that design produced ~270M noise candidates. The
    30-bit combination keys drop that rate to n²/2³⁰ per table (see
    ``_HAM_COMBOS``). The residual hazard is identical-signature clusters
    (true mass duplicates), whose pairs are the OUTPUT, not overhead. The
    whole query is two hash aggs + one bucket equi-join + a codegen
    popcount — no arrays, no verify-side re-scan of the corpus."""
    # persisted: the self-join would otherwise recompute the signature
    # subtree (tokenize + hash over the corpus) on both aliases
    sigs = _simhash_signatures_df(corpus(spark, sf_dir), _HAM_BITS).persist()
    bands = simhash_band_rel(sigs, carry_sig=True)
    x, y = bands.alias("x"), bands.alias("y")
    # signatures ride the band rows (8 bytes each), so the verify is an
    # inline popcount filtered BEFORE the pair distinct — no doc-level
    # signature joins, and only true near-dup pairs reach the shuffle
    ham = F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash")))
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .where(ham <= _HAM_MAX)
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# connected-components dup clustering (iterative min-label propagation)
# ---------------------------------------------------------------------------

_CC_ORACLE = f"""
WITH RECURSIVE {CORPUS_SQL},
{_SHINGLES_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM doc_shingles a JOIN doc_shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= {JACCARD_THRESHOLD}
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
walk(node, label) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
),
comp AS (SELECT node AS doc_id, min(label) AS component_id FROM walk GROUP BY node)
SELECT c.doc_id, c.component_id, s.n_members
FROM comp c
JOIN (SELECT component_id, count(*) AS n_members FROM comp GROUP BY 1) s
  USING (component_id)
"""


def _connected_components(pairs: DataFrame) -> DataFrame:
    """Min-label propagation over an undirected (doc_a, doc_b) pair graph.

    Iterative: each round joins the symmetric edge list to current labels
    and takes the per-node minimum (two shuffles per round), converging in
    O(diameter) rounds — near-dup clusters are shallow (replicas of one
    source document), so this beats the O(log n) large-star/small-star
    alternation that pays its constant factor only on adversarial
    long-chain graphs. localCheckpoint truncates the iterative lineage so
    round N's plan doesn't re-derive rounds 1..N-1; on a real cluster this
    is reliable-checkpoint-to-object-store instead. The convergence probe
    is a count action per round — inherent to any fixpoint algorithm.
    """
    # materialize the symmetric edge list ONCE, via a single-pass explode —
    # a unionAll of two selects over the lazy pair pipeline evaluates the
    # whole shingle->Jaccard derivation twice, and skipping materialization
    # re-derives it every iteration (measured at sf~1, where the 10x replica
    # corpus is clique-dense — 840k edges: 215 s unmaterialized, 86 s with
    # union-then-checkpoint, 54 s this way; pair generation is ~all of it)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                    F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(50):  # backstop; converges in O(diameter) rounds
        prop = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        # the previous label rides the SAME aggregate under an is_old tag
        # (each node carries exactly one tagged copy, so max-over-tagged
        # recovers it) — convergence detection is then a filter over the
        # checkpointed result instead of a per-round label-compare join
        merged = (
            labels.select("node", "label", F.lit(True).alias("is_old"))
            .unionAll(prop.select("node", "label", F.lit(False).alias("is_old")))
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.max(F.when(F.col("is_old"), F.col("label"))).alias("old_label"),
            )
            .localCheckpoint()
        )
        changed = (
            merged.where(F.col("label") != F.col("old_label")).limit(1).count()
        )
        labels = merged.select("node", "label")
        if changed == 0:
            break
    comp = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )
    sizes = comp.groupBy("component_id").agg(F.count(F.lit(1)).alias("n_members"))
    return comp.join(sizes, "component_id").select(
        "doc_id", "component_id", "n_members"
    )


@query("dedup_connected_components", oracle=_CC_ORACLE)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the exact
    n-gram-Jaccard near-dup pair graph, so every document gets a canonical
    component_id (the minimum doc_id in its cluster) — the step that turns
    pairwise near-dup evidence into keep/drop decisions in a training-data
    pipeline. Exact edge generation is quadratic on clique-dense corpora;
    ``dedup_cc_minhash`` below is the identical clustering riding the
    banded-LSH candidate path, which is the form to run at 100 TB."""
    return _connected_components(
        dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    )


#: shared CTE chain: banded LSH candidates → exact-Jaccard verify →
#: symmetric edges → recursive min-label walk → `comp(doc_id, component_id)`
#: (used by the cluster gate and the near-dup-safe split gate)
_LSH_CC_CTE = f"""
candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, n FROM signatures),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM candidates c
    JOIN doc_shingles sa ON sa.doc_id = c.doc_a
    JOIN doc_shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
),
pairs AS (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common)
          >= {JACCARD_THRESHOLD}
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
walk(node, label) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
),
comp AS (SELECT node AS doc_id, min(label) AS component_id FROM walk GROUP BY node)"""

_CC_MINHASH_ORACLE = f"""
WITH RECURSIVE {CORPUS_SQL},
{_SHINGLES_SQL},
{_minhash_sig_sql()},
{_bands_sql()},
{_LSH_CC_CTE}
SELECT c.doc_id, c.component_id, s.n_members
FROM comp c
JOIN (SELECT component_id, count(*) AS n_members FROM comp GROUP BY 1) s
  USING (component_id)
"""


@query("dedup_cc_minhash", oracle=_CC_MINHASH_ORACLE)
def dedup_cc_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH verified pair graph — the
    100 TB form of duplicate clustering: edge generation is the banded
    signature join (O(collisions), one shuffle on (band, sig)), not the
    exact inverted-index self-join that degenerates quadratically on
    clique-dense corpora. Candidates are still exact-Jaccard-verified
    before clustering, so precision is 1; recall is the LSH band recall
    (seeded hash family → the oracle reproduces the identical candidate
    set, making even this approximate path hash-checkable)."""
    return _connected_components(
        dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    )


_SPLIT_SAFE_HASH = _H_SQL.format(
    seed="split", col="CAST(COALESCE(cp.component_id, c0.doc_id) AS VARCHAR)"
)

_SPLIT_SAFE_ORACLE = f"""
WITH RECURSIVE {CORPUS_SQL},
{_SHINGLES_SQL},
{_minhash_sig_sql()},
{_bands_sql()},
{_LSH_CC_CTE}
SELECT c0.doc_id,
       COALESCE(cp.component_id, c0.doc_id) AS cluster_rep,
       CASE WHEN ({_SPLIT_SAFE_HASH}) % 100 < 90 THEN 'train' ELSE 'eval' END
           AS split
FROM corpus c0
LEFT JOIN comp cp USING (doc_id)
"""


@query("corpus_split_neardup_safe", oracle=_SPLIT_SAFE_ORACLE)
def corpus_split_neardup_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUP-SAFE train/eval split — the leakage-free upgrade of
    ``corpus_train_eval_split``: the plain per-doc content-hash split can
    put a document in train and its near-duplicate in eval, silently
    inflating eval scores. Here the split hashes each document's duplicate
    CLUSTER representative (connected components over the MinHash-LSH
    verified pair graph; singletons are their own representative), so a
    whole near-dup cluster lands on ONE side — cross-split leakage is zero
    BY CONSTRUCTION for every pair the LSH graph finds, not audited after
    the fact (the pytest pins exactly that invariant). Same seeded-md5
    family and 90/100 bucket rule as the plain split, so singleton docs
    receive the identical assignment — only clustered docs move.

    Scale shape: inherits `dedup_cc_minhash`'s banded-edge + iterative-CC
    cost (33.8 s at the 100× smoke) plus one broadcast-sized left join of
    the label relation onto the corpus; the split expression itself is a
    codegen projection."""
    comp = _connected_components(
        dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    ).select("doc_id", "component_id")
    rep = F.coalesce(F.col("component_id"), F.col("doc_id"))
    bucket = seeded_hash(rep.cast("string"), seed="split") % 100
    return (
        corpus(spark, sf_dir)
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            rep.alias("cluster_rep"),
            F.when(bucket < 90, "train").otherwise("eval").alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# Entity resolution: blocked fuzzy match (catalog dedup)
# ---------------------------------------------------------------------------

_ER_ORACLE = """
WITH names AS (
    SELECT p_name,
           min(p_partkey) AS canonical_id,
           count(*) AS n_members
    FROM part GROUP BY p_name
),
keyed AS (
    SELECT p_name, canonical_id, n_members,
           regexp_extract(p_name, '([a-z]+)$', 1) AS block
    FROM names
)
SELECT a.block,
       a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist,
       a.n_members AS n_a, b.n_members AS n_b
FROM keyed a
JOIN keyed b ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
"""


@query("entity_resolution_blocked", oracle=_ER_ORACLE)
def entity_resolution_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over the part catalog: distinct names reduce to
    one canonical row each (min key + member count), candidate pairs come
    from an equi-join on a BLOCKING KEY (the head noun), and survivors are
    verified with Levenshtein distance ≤ 4 — fuzzy dedup in the classic
    blocked-ER shape.

    Scale shape: the blocking join is the whole trick — candidates are
    O(Σ block²) on *distinct names* (vocabulary-sized), never O(n²) on the
    catalog; the edit-distance UDF-free verify (`F.levenshtein`, JVM
    codegen) runs only on blocked pairs. The same skeleton takes MinHash
    bands or phonetic keys as the blocking function for messier name
    spaces."""
    p = load_table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(
        F.min("p_partkey").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_members"),
    )
    keyed = names.select(
        "p_name",
        "n_members",
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("block"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(dist <= 4)
        .select(
            F.col("a.block").alias("block"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("edit_dist"),
            F.col("a.n_members").alias("n_a"),
            F.col("b.n_members").alias("n_b"),
        )
    )


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (token-window form of Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better")
# ---------------------------------------------------------------------------

W_SUB = 8  # window width in tokens (the paper's 50-char spans, token form)

_SUBSTR_ORACLE = f"""
WITH {CORPUS_SQL},
toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM corpus
),
wins AS (
    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - {W_SUB - 2}),
        i -> {" || ' ' || ".join(f"t[i+{j}]" for j in range(W_SUB)).replace("t[i+0]", "t[i]")}
    ))) AS win
    FROM toks WHERE len(t) >= {W_SUB}
),
hashed AS (SELECT doc_id, {_H_SQL.format(seed=77, col='win')} AS wh FROM wins),
dup AS (SELECT wh FROM hashed GROUP BY wh HAVING count(*) >= 2),
perdoc AS (SELECT doc_id, count(*) AS n_windows FROM hashed GROUP BY doc_id),
dupdoc AS (
    SELECT h.doc_id, count(*) AS n_dup_windows
    FROM hashed h JOIN dup d USING (wh) GROUP BY h.doc_id
)
SELECT p.doc_id, p.n_windows,
       coalesce(dd.n_dup_windows, 0) AS n_dup_windows,
       CAST(coalesce(dd.n_dup_windows, 0) AS DOUBLE) / p.n_windows AS dup_fraction
FROM perdoc p LEFT JOIN dupdoc dd USING (doc_id)
"""


@query("dedup_substring_spans", oracle=_SUBSTR_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring detection (token-window form of suffix
    dedup, Lee et al. 2022): every distinct 8-token window per document, a
    window is *duplicated* when it occurs in ≥2 documents, and each doc
    reports its duplicated-window fraction — the per-doc signal used to
    trim boilerplate/templated spans before training.

    Scale shape: windows are reduced to a portable 60-bit seeded hash
    BEFORE the shuffle (8-byte keys instead of ~50-char strings — the same
    md5 family as MinHash, so the oracle reproduces them bit-for-bit), then
    everything is hash-agg + one semi join on the hash: O(total windows),
    never O(n²). At 100 TB the dup-window relation is the only wide state
    and it shrinks with ``HAVING count >= 2``."""
    from change_data_capture_spark.functions.text import shingles_from_tokens, tokens

    c = corpus(spark, sf_dir)
    hashed = (
        c.select("doc_id", tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") >= W_SUB)
        .select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("toks"), W_SUB)).alias("win"),
        )
        .select("doc_id", seeded_hash(F.col("win"), 77).alias("wh"))
        .distinct()
        .persist()
    )
    dup = (
        hashed.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("wh")
    )
    per_doc = hashed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_windows"))
    dup_per_doc = (
        hashed.join(dup, "wh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    return per_doc.join(dup_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        (
            F.coalesce("n_dup_windows", F.lit(0)).cast("double") / F.col("n_windows")
        ).alias("dup_fraction"),
    )


# ---------------------------------------------------------------------------
# asymmetric containment pairs (overlap coefficient)
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.9

_CONTAIN_ORACLE = f"""
WITH {CORPUS_SQL},
{_SHINGLES_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM doc_shingles a JOIN doc_shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT CASE WHEN sa.n < sb.n OR (sa.n = sb.n) THEN i.doc_a ELSE i.doc_b END AS doc_inner,
       CASE WHEN sa.n < sb.n OR (sa.n = sb.n) THEN i.doc_b ELSE i.doc_a END AS doc_outer,
       CAST(i.n_common AS DOUBLE) / least(sa.n, sb.n) AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / least(sa.n, sb.n) >= {CONTAINMENT_THRESHOLD}
"""


@query("dedup_containment_pairs", oracle=_CONTAIN_ORACLE)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT (overlap
    coefficient |A∩B| / min(|A|,|B|) — the containment of the smaller doc
    in the larger): catches a short document embedded inside a longer one,
    which symmetric Jaccard misses entirely (a 50-token doc fully contained
    in a 500-token doc has Jaccard ≈ 0.1 but containment 1.0). The fixture's
    append-mutated near-dups score exactly 1.0 here.

    Same inverted-index join shape as ``dedup_ngram_jaccard`` — candidates
    are O(shingle collisions), so this is the EXACT/ground-truth form whose
    cost grows with Σ df² over hot shingles; it exists at fixture scale to
    audit the scale path. (MinHash banding does NOT compose in front of it:
    MinHash estimates Jaccard, which under-recalls exactly the asymmetric
    small⊂big pairs containment exists for.) The 100 TB form is
    ``dedup_containment_dfcap`` — identical semantics behind a shingle
    document-frequency cap — and ``dedup_containment_recall_sweep``
    measures what that cap costs in recall against this oracle."""
    sh = doc_shingles(corpus(spark, sf_dir)).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    contain = F.col("n_common").cast("double") / F.least(F.col("sa.n"), F.col("sb.n"))
    small_first = F.col("sa.n") <= F.col("sb.n")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where(contain >= CONTAINMENT_THRESHOLD)
        .select(
            F.when(small_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_inner"),
            F.when(small_first, F.col("doc_b")).otherwise(F.col("doc_a")).alias("doc_outer"),
            contain.alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# containment at scale: document-frequency-capped candidate generation
# ---------------------------------------------------------------------------

#: shingles seen in more than this many documents are dropped from the
#: CANDIDATE index (they stop discriminating — boilerplate, stop-phrases);
#: verification still uses the full shingle sets, so scores stay exact.
DF_CAP = 16

_CONTAIN_DFCAP_ORACLE = f"""
WITH {CORPUS_SQL},
{_SHINGLES_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
df AS (SELECT shingle, count(*) AS df FROM doc_shingles GROUP BY shingle),
rare AS (
    SELECT s.doc_id, s.shingle FROM doc_shingles s
    JOIN df ON df.shingle = s.shingle
    WHERE df.df BETWEEN 2 AND {DF_CAP}
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM rare a JOIN rare b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM cand c
    JOIN doc_shingles sa ON sa.doc_id = c.doc_a
    JOIN doc_shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
)
SELECT CASE WHEN sa.n <= sb.n THEN i.doc_a ELSE i.doc_b END AS doc_inner,
       CASE WHEN sa.n <= sb.n THEN i.doc_b ELSE i.doc_a END AS doc_outer,
       CAST(i.n_common AS DOUBLE) / least(sa.n, sb.n) AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / least(sa.n, sb.n) >= {CONTAINMENT_THRESHOLD}
"""


@query("dedup_containment_dfcap", oracle=_CONTAIN_DFCAP_ORACLE)
def dedup_containment_dfcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment pairs, 100 TB form: the candidate index keeps only
    DISCRIMINATIVE shingles — document frequency in [2, DF_CAP] — before
    the self-join, then verifies candidates EXACTLY against the full
    shingle sets. df=1 shingles can't produce a pair; df>DF_CAP shingles
    are boilerplate whose join fan-out is the whole O(Σ df²) blow-up of
    the exact form (standard prefix/df-filter from the set-similarity-join
    literature, e.g. PPJoin).

    Cost shape, three bounded phases (PPJoin-family candidate-filter-verify):

    1. CANDIDATE GEN is bounded by DF_CAP · |rare index| (each df-filtered
       index row joins ≤ DF_CAP-1 others) — linear in corpus size at fixed
       cap, vs the uncapped form's quadratic blow-up in hot shingles.
    2. COUNT-FILTER PRUNE (exact, the positional-filter idea): the pair
       shuffle aggregates ``n_common_rare`` for free (count instead of
       distinct — same exchange), and shared-hot shingles are bounded by
       ``min(hot_a, hot_b)``, so ``n_common ≤ n_common_rare + min(na−nra,
       nb−nrb)``. Pairs whose bound can't reach the threshold are dropped
       carrying only int payloads — measured 1,178,624 → 1,683 pairs
       (99.86%) at sf0.1, and the prune can never drop a true pair.
    3. SET-ARRAY VERIFY on the survivors only: ``array_intersect`` over
       collected shingle sets — one row per surviving pair. (Verifying by
       re-joining the shingle relation fans out to |cand|×|doc shingles|
       rows — measured 8 s at sf0.1; carrying set arrays for ALL candidates
       instead shuffles |cand|×|set payload| — measured 34 GB of spill at
       the 100× smoke before the prune existed. The prune is what makes
       either verify shape affordable: array payloads ride only the ~0.1%
       surviving relation.)

    Scores are exact — the cap can only MISS pairs whose every shared
    shingle is hot; ``dedup_containment_recall_sweep`` measures exactly
    that miss rate. Measured operating point (BENCH.md round-5 table): at
    DF_CAP=16 recall is 1.0000 at BOTH sf0.1 (1,682/1,682 true pairs) and
    decorrelated 100× (169,221/169,221); the curve knees at cap 8 (0.90)."""
    sh = doc_shingles(corpus(spark, sf_dir)).persist()
    df_rel = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rare = (
        sh.join(
            df_rel.where(F.col("df").between(2, DF_CAP)).select("shingle"),
            "shingle",
            "left_semi",
        )
    )
    # per-doc stats: total shingles n, rare shingles nr (int payloads only;
    # docs absent from `rare` can't form candidates, so inner joins are
    # safe). Joined onto the AGGREGATED pair relation, not carried through
    # the rare self-join: the stats relation is doc-count-sized, so AQE
    # turns both joins into broadcasts streaming over the pairs — while
    # carrying the stats as extra self-join columns recomputes the widened
    # rare⋈stats subtree on both aliases (measured 142 s vs 77 s at the
    # decorrelated 100× smoke).
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    n_rare = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nr"))
    stats = sizes.join(n_rare, "doc_id")
    ra, rb = rare.alias("ra"), rare.alias("rb")
    pairs = (
        ra.join(
            rb,
            (F.col("ra.shingle") == F.col("rb.shingle"))
            & (F.col("ra.doc_id") < F.col("rb.doc_id")),
        )
        .groupBy(
            F.col("ra.doc_id").alias("doc_a"), F.col("rb.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common_rare"))
    )
    sa_stats = stats.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), F.col("nr").alias("nra")
    )
    sb_stats = stats.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), F.col("nr").alias("nrb")
    )
    bound = F.col("n_common_rare") + F.least(
        F.col("na") - F.col("nra"), F.col("nb") - F.col("nrb")
    )
    survivors = (
        pairs.join(sa_stats, "doc_a")
        .join(sb_stats, "doc_b")
        .where(bound.cast("double") / F.least("na", "nb") >= CONTAINMENT_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    doc_sets = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("sh_set"))
    scored = (
        survivors.join(
            doc_sets.select(
                F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a")
            ),
            "doc_a",
        )
        .join(
            doc_sets.select(
                F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("set_a", "set_b")).alias("n_common"),
            F.size("set_a").alias("na"),
            F.size("set_b").alias("nb"),
        )
    )
    contain = F.col("n_common").cast("double") / F.least("na", "nb")
    small_first = F.col("na") <= F.col("nb")
    return (
        scored.where(contain >= CONTAINMENT_THRESHOLD)
        .select(
            F.when(small_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_inner"),
            F.when(small_first, F.col("doc_b")).otherwise(F.col("doc_a")).alias("doc_outer"),
            contain.alias("containment"),
        )
    )


_DFCAP_SWEEP = (2, 4, 8, 16, 32, 64)

_CONTAIN_RECALL_ORACLE = f"""
WITH {CORPUS_SQL},
{_SHINGLES_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
df AS (SELECT shingle, count(*) AS df FROM doc_shingles GROUP BY shingle),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_common, min(df.df) AS min_df
    FROM doc_shingles a
    JOIN doc_shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    JOIN df ON df.shingle = a.shingle
    GROUP BY 1, 2
),
true_pairs AS (
    SELECT i.min_df
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / least(sa.n, sb.n)
          >= {CONTAINMENT_THRESHOLD}
)
SELECT k.df_cap,
       CAST(count(*) AS BIGINT) AS n_true_pairs,
       CAST(SUM(CASE WHEN p.min_df <= k.df_cap THEN 1 ELSE 0 END) AS BIGINT)
           AS n_caught,
       CAST(SUM(CASE WHEN p.min_df <= k.df_cap THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS recall
FROM (SELECT unnest(ARRAY[{", ".join(str(k) for k in _DFCAP_SWEEP)}]) AS df_cap) k
CROSS JOIN true_pairs p
GROUP BY k.df_cap
"""


@query("dedup_containment_recall_sweep", oracle=_CONTAIN_RECALL_ORACLE)
def dedup_containment_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall curve for the df-cap containment prefilter: a true
    containment pair survives a cap K iff SOME shared shingle has df ≤ K
    (equivalently min shared df ≤ K — the pair then collides in the capped
    index and exact verification recovers it). One ground-truth pass
    computes each true pair's min shared df; one conditional agg scores
    every K — the same audit `dedup_threshold_sweep` gives MinHash banding,
    so a pipeline owner picks DF_CAP from a measured curve, not a guess.

    Ground truth is the exact inverted-index join (fixture-scale only, by
    design); the sweep itself adds one broadcast-sized df join to it."""
    sh = doc_shingles(corpus(spark, sf_dir)).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    df_rel = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, ["shingle"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .join(df_rel, "shingle")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"), F.min("df").alias("min_df"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    contain = F.col("n_common").cast("double") / F.least("na", "nb")
    true_pairs = (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .where(contain >= CONTAINMENT_THRESHOLD)
        .select("min_df")
    )
    aggs = [F.count(F.lit(1)).alias("n_true")]
    for idx, k in enumerate(_DFCAP_SWEEP):
        aggs.append(
            F.sum(F.when(F.col("min_df") <= k, 1).otherwise(0)).alias(f"caught_{idx}")
        )
    onerow = true_pairs.agg(*aggs)
    stack_args = ", ".join(
        f"{k}L, n_true, caught_{i}" for i, k in enumerate(_DFCAP_SWEEP)
    )
    swept = onerow.selectExpr(
        f"stack({len(_DFCAP_SWEEP)}, {stack_args}) AS (df_cap, n_true_pairs, n_caught)"
    )
    return (
        swept
        # degenerate-corpus guard: with zero true pairs the oracle's CROSS
        # JOIN yields no rows, so drop the stacked rows too (recall would
        # be 0/0) — both engines agree on empty input
        .where(F.col("n_true_pairs") > 0)
        .select(
            F.col("df_cap").cast("int").alias("df_cap"),
            "n_true_pairs",
            "n_caught",
            (F.col("n_caught").cast("double") / F.col("n_true_pairs")).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# incremental MinHash-LSH maintenance: dedup a delta batch against the corpus
# ---------------------------------------------------------------------------

_DELTA_MOD = 3  # docs with doc_id % 3 == 0 form the "newly arrived" batch

_SIMHASH_INCR_ORACLE = _SIMHASH_INCR_ORACLE_TEMPLATE.format(
    corpus_sql=CORPUS_SQL,
    simhash_cte=_simhash_cte(_HAM_BITS),
    band_union=" UNION ALL ".join(
        f"    SELECT doc_id, {i} AS band, {_ham_key_sql(c)} AS bv FROM sigs"
        for i, c in enumerate(_HAM_COMBOS)
    ),
    ham_max=_HAM_MAX,
    delta_mod=_DELTA_MOD,
)

_MINHASH_INCR_ORACLE = f"""
WITH {CORPUS_SQL},
{_SHINGLES_SQL},
{_minhash_sig_sql()},
{_bands_sql()},
candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, n FROM signatures),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM candidates c
    JOIN doc_shingles sa ON sa.doc_id = c.doc_a
    JOIN doc_shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) >= {JACCARD_THRESHOLD}
  AND (i.doc_a % {_DELTA_MOD} = 0 OR i.doc_b % {_DELTA_MOD} = 0)
"""


def minhash_signature_rel(sh: DataFrame, with_sets: bool = False) -> DataFrame:
    """(doc_id, h0..h{N_PERMS-1}, n) MinHash signature relation from a
    (doc_id, shingle) set relation — the schema of the persisted signature
    store (shared by the batch and streaming incremental-dedup gates).
    ``with_sets`` appends ``collect_list('shingle') AS sh_set`` in the SAME
    grouped pass — the streaming store's verify-side set fetch column
    (one aggregation, no second groupBy + join; element order is
    nondeterministic, which every consumer's symmetric set math absorbs).
    Defined HERE so the store schema has one source of truth — a change to
    N_PERMS or seeded_hash can never diverge batch from streaming."""
    aggs = [
        F.min(seeded_hash(F.col("shingle"), i)).alias(f"h{i}")
        for i in range(N_PERMS)
    ] + [F.count(F.lit(1)).alias("n")]
    if with_sets:
        aggs.append(F.collect_list("shingle").alias("sh_set"))
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_band_rel(sig: DataFrame) -> DataFrame:
    """(doc_id, band, sig) LSH banding of a signature relation (2 rows per
    band)."""
    return reduce(
        DataFrame.unionAll,
        [
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("_", f"h{2*b}", f"h{2*b+1}").alias("sig"),
            )
            for b in range(N_BANDS)
        ],
    )


@query("dedup_minhash_incremental", oracle=_MINHASH_INCR_ORACLE)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MinHash-LSH dedup: a newly-arrived delta batch
    (``doc_id % 3 == 0`` stands in for today's crawl) is near-dup-checked
    against the full corpus WITHOUT recomputing the corpus — the operational
    shape of dedup at 100 TB, where signatures live in a persisted store and
    each ingest only pays for its own batch.

    What is delta-sized here: shingling + signature computation runs on the
    delta only; the base corpus contributes its (pre-existing) signature
    relation — in production a parquet/Delta signature table, here derived
    once and persisted to model the store. Candidate generation is
    delta_bands ⋈ all_bands on (band, sig) — O(delta collisions), never
    corpus × corpus. Exact-Jaccard verification then touches ONLY matched
    base docs (the join itself is the semi-filter). The oracle is the full
    LSH recompute restricted to pairs involving a delta doc — banding is
    deterministic (seeded md5), so incremental and full answers must agree
    bit-for-bit."""
    c = corpus(spark, sf_dir)
    is_delta = F.col("doc_id") % _DELTA_MOD == 0
    sh_all = doc_shingles(c).persist()
    _signatures, _bands = minhash_signature_rel, minhash_band_rel

    # the "signature store": base signatures exist already (persisted);
    # the delta's signatures are the only new signature computation
    sig_all = _signatures(sh_all).persist()
    delta_bands = _bands(sig_all.where(is_delta)).alias("a")
    all_bands = _bands(sig_all).alias("b")

    # delta × corpus band collision (a delta doc may pair with base OR with
    # another delta doc; canonicalize to doc_a < doc_b and dedup collisions)
    candidates = (
        delta_bands.join(
            all_bands,
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
    sizes = sig_all.select("doc_id", "n")
    sa = sh_all.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh_all.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# LSH candidate-recall sweep: measured quality of the banding scheme
# ---------------------------------------------------------------------------

_SWEEP_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)

_SWEEP_ORACLE = f"""
WITH {CORPUS_SQL},
{_SHINGLES_SQL},
{_minhash_sig_sql()},
{_bands_sql()},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, n FROM signatures),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM doc_shingles a JOIN doc_shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS j,
           (c.doc_a IS NOT NULL) AS in_lsh
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    LEFT JOIN cand c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
)
SELECT t.threshold,
       CAST(SUM(CASE WHEN p.j >= t.threshold THEN 1 ELSE 0 END) AS BIGINT)
           AS n_true_pairs,
       CAST(SUM(CASE WHEN p.j >= t.threshold AND p.in_lsh THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lsh_caught,
       CAST(SUM(CASE WHEN p.j >= t.threshold AND p.in_lsh THEN 1 ELSE 0 END) AS DOUBLE)
           / NULLIF(SUM(CASE WHEN p.j >= t.threshold THEN 1 ELSE 0 END), 0)
           AS recall
FROM (SELECT unnest(ARRAY[{", ".join(str(t) for t in _SWEEP_THRESHOLDS)}]) AS threshold) t
CROSS JOIN pairs p
GROUP BY t.threshold
"""


@query("dedup_threshold_sweep", oracle=_SWEEP_ORACLE)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH quality curve: candidate-generation recall of the
    4-band × 2-row MinHash scheme against ground-truth Jaccard, swept over
    five thresholds — the evaluation a pipeline owner runs before trusting a
    banding configuration at corpus scale (the S-curve says recall should
    climb toward 1 as the threshold rises; the sweep MEASURES it on real
    data instead of trusting the formula).

    The exact-pair relation is the inverted-index join (the ground truth
    that exists at fixture scale precisely to audit the scale path); the
    LSH set is the banded candidate relation. One LEFT join flags
    membership, one conditional agg scores every threshold in a single
    pass — thresholds are plan constants, not data."""
    sh = doc_shingles(corpus(spark, sf_dir)).persist()
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(seeded_hash(F.col("shingle"), i)).alias(f"h{i}")
            for i in range(N_PERMS)
        ],
        F.count(F.lit(1)).alias("n"),
    ).persist()
    bands = reduce(
        DataFrame.unionAll,
        [
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("_", f"h{2*b}", f"h{2*b+1}").alias("sig"),
            )
            for b in range(N_BANDS)
        ],
    )
    ba, bb = bands.alias("ba"), bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.sig") == F.col("bb.sig"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
        .distinct()
        .withColumn("in_lsh", F.lit(True))
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, ["shingle"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sig.select("doc_id", "n")
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    pairs = (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .join(cand, ["doc_a", "doc_b"], "left")
        .select(
            jac.alias("j"), F.coalesce("in_lsh", F.lit(False)).alias("in_lsh")
        )
    )
    # ONE aggregation pass scores every threshold (conditional sums), then a
    # stack() unpivots the 1×2k row — the pair relation is scanned once.
    aggs = []
    for idx, t in enumerate(_SWEEP_THRESHOLDS):
        aggs.append(
            F.sum(F.when(F.col("j") >= t, 1).otherwise(0)).alias(f"true_{idx}")
        )
        aggs.append(
            F.sum(
                F.when(
                    F.col("j") >= t, F.when(F.col("in_lsh"), 1).otherwise(0)
                ).otherwise(0)
            ).alias(f"caught_{idx}")
        )
    onerow = pairs.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({t} AS DOUBLE), true_{i}, caught_{i}"
        for i, t in enumerate(_SWEEP_THRESHOLDS)
    )
    swept = onerow.selectExpr(
        f"stack({len(_SWEEP_THRESHOLDS)}, {stack_args}) AS "
        "(threshold, n_true_pairs, n_lsh_caught)"
    )
    return swept.select(
        "threshold",
        "n_true_pairs",
        "n_lsh_caught",
        (
            F.col("n_lsh_caught").cast("double")
            / F.nullif(F.col("n_true_pairs"), F.lit(0))
        ).alias("recall"),
    )
