"""Text-analysis expression library (LLM-data tier, SURVEY.md §2.B).

All pure built-in expressions (JVM codegen; no Python UDFs): tokenization,
normalization, fingerprinting, shingling, and the seeded hash family used by
MinHash/SimHash.

The hash family is engine-portable by construction: ``h_seed(s) = the first
60 bits of md5(seed || '|' || s)`` — md5 is identical everywhere, so the
DuckDB oracle can reproduce signatures bit-for-bit (DuckDB:
``CAST('0x' || substr(md5(...),1,15) AS BIGINT)``, Spark:
``conv(substr(md5(...),1,15),16,10)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny stopword list shared with the oracle SQL (fixture vocabulary)
STOPWORDS = ("the", "a", "of", "to", "and")


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def normalize(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text."""
    return F.md5(normalize(text))


def seeded_hash(col: Column, seed: int) -> Column:
    """60-bit integer hash with an explicit seed (portable across engines)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}|"), col)), 1, 15), 16, 10).cast(
        "long"
    )


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-token shingles (word k-grams joined by single spaces), WITH
    duplicates — callers needing set semantics dedup after exploding
    (hash-based, linear) rather than via ``array_distinct`` (quadratic in
    shingles-per-doc).

    IMPORTANT: pass a *materialized column reference* (select the token
    array into a column first), not the ``split(...)`` expression itself —
    expressions referenced inside higher-order-function lambdas are not
    common-subexpression-eliminated, so an inline split would re-tokenize
    the document once per element access (measured ~6× slowdown)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Convenience form over raw text — fine for single-pass use; hot paths
    should pre-materialize tokens and use ``shingles_from_tokens``."""
    return shingles_from_tokens(tokens(text), k)
