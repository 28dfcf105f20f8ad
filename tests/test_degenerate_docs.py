"""Degenerate-input robustness for the documents-tier queries.

ADVICE round 2 found a latent crash class: expressions like
``sequence(1, size-1)`` explode on single-token documents because Spark
evaluates ``sequence(1, 0)`` as the DESCENDING [1, 0] and array indexing
is 1-based. The fixture's minimum document length (10 tokens) hides that
whole class. This suite re-runs every documents-only query over an
adversarial corpus — empty text, whitespace-only, single token, single
char, unicode, exact duplicates of degenerates — and asserts BOTH no
runtime error AND DuckDB-oracle parity on the same corpus, so the two
engines agree even at the edges.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

import duckdb

import __spark_entry__ as entrymod
import tests.oracle as oracle_mod


def _compare_docs_only(name, spark, sf_dir, queries, oracles):
    """tests.oracle.compare, but the DuckDB side registers only the
    documents view (the full fixture tables don't exist here)."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    sdf = queries[name](spark, sf_dir)
    got = sdf.toPandas()
    want = con.sql(oracles[name]).df()
    con.close()
    assert got.shape[0] == want.shape[0], (
        f"{name}: row count {got.shape[0]} != oracle {want.shape[0]}"
    )
    assert sorted(got.columns) == sorted(want.columns)
    g, w = oracle_mod._normalize(got), oracle_mod._normalize(want)
    for col in g.columns:
        gc, wc = g[col], w[col]
        if gc.dtype.kind == "f" or wc.dtype.kind == "f":
            import numpy as np
            import pandas as pd_

            ga = gc.astype(float).to_numpy()
            wa = wc.astype(float).to_numpy()
            both_nan = pd_.isna(ga) & pd_.isna(wa)
            assert (both_nan | (ga == wa)).all(), (name, col)
        else:
            gs = gc.astype("string").fillna("<NULL>")
            ws = wc.astype("string").fillna("<NULL>")
            assert (gs == ws).all(), (
                f"{name}.{col}: {gs[gs != ws].head(3).tolist()} != "
                f"{ws[gs != ws].head(3).tolist()}"
            )

#: every registered query whose only input is the documents table and whose
#: semantics are total (no assumption the corpus is non-degenerate)
DOC_QUERIES = [
    "text_quality_stats",
    "token_counting",
    "lang_id_heuristic",
    "doc_fingerprint",
    "corpus_lang_source_profile",
    "text_repetition_quality",
    "text_bigram_counts",
    "document_chunking",
    "dedup_exact",
    "bpe_pair_counts",
    "heavy_hitters_cms",
    "domain_token_budget",
    "pii_redaction",
    "corpus_train_eval_split",
    "corpus_hash_weighted_sample",
    "sequence_packing_bins",
    "sequence_packing_sharded",
    "corpus_domain_mixing",
    "corpus_seeded_shuffle",
    # round-3 session-2 additions with total semantics (the shingle-pair
    # family — containment/threshold-sweep/incremental-minhash — shares its
    # siblings' documented k-gram minimum-length precondition and is
    # excluded like them)
    "text_charclass_profile",
    "text_commonness_score",
    "text_feature_hashing",
    "corpus_temperature_weights",
    "dedup_substring_spans",
    "corpus_exact_k_sample",
    "corpus_pipeline_end_to_end",
]

_DEGENERATES = [
    # (doc_id, text, lang, source)
    (0, "", "en", "src0"),
    (1, "   ", "en", "src0"),
    (2, "\t\n  \n", "en", "src1"),
    (3, "x", "en", "src1"),
    (4, "the", "en", "src2"),
    (5, "a a a a a", "en", "src2"),
    (6, "naïve café über schön", "de", "src3"),
    (7, "x", "en", "src3"),          # exact dup of doc 3
    (8, "the the", "en", "src4"),
    (9, "word " * 5, "en", "src4"),  # trailing space
    (10, ".", "unk", "src5"),
    (11, "a-b a-b a-b", "en", "src5"),
]


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_sf")
    rows = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": lang,
                "source": src,
                "n_chars": len(t),
            }
            for (i, t, lang, src) in _DEGENERATES
        ]
    )
    rows.to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_degenerate_corpus_parity(spark, degenerate_dir, name):
    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    if name in oracles:
        # full cross-engine agreement on the adversarial corpus
        _compare_docs_only(name, spark, degenerate_dir, queries, oracles)
    else:
        # rows-only queries: must at least evaluate without error
        queries[name](spark, degenerate_dir).collect()


@pytest.fixture(scope="module")
def empty_docs_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("empty_docs_sf")
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(schema.empty_table(), os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_empty_corpus_is_total(spark, empty_docs_dir, name):
    """Zero-row input (a routine empty partition at scale) must evaluate
    to a well-defined (usually empty) result, never error."""
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = queries[name](spark, empty_docs_dir)
    rows = got.count()
    if name in oracles:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{empty_docs_dir}/documents.parquet')"
        )
        want = con.sql(oracles[name]).df()
        con.close()
        assert rows == want.shape[0], (name, rows, want.shape[0])
