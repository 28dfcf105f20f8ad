"""Degenerate-input robustness for the embeddings-tier queries.

Production embedding dumps contain shapes the fixture never produces:
ZERO vectors (failed encodes, padding) whose norm divides to NaN in
cosine math and whose max-abs quantization scale is 0; near-zero
vectors; exact duplicate vectors; single-label classes. Every query
must evaluate without error and agree with its DuckDB oracle (or, for
rows-only ANN queries, at least evaluate) on this corpus."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
import tests.oracle as oracle_mod

EMB_QUERIES = [
    "similarity_topk_cosine",
    "embedding_cosine_neardup",
    "embedding_quantize_int8",
    "embedding_mean_pool",
    "embedding_dim_stats",
    "kmeans_fixed_point",
    "semantic_dedup_keeplist",
    "similarity_lsh_buckets",
    "similarity_ivf_topk",
    "posexplode_embedding_dims",
    "embedding_random_projection",  # zero vector exercises the -0.0 guard
]

_DIM = 64


def _vectors():
    rng = np.random.RandomState(11)
    rows = []

    def add(vid, vec, label):
        rows.append(
            dict(vec_id=vid, embedding=np.asarray(vec, dtype=np.float32), label=label)
        )

    base = rng.standard_normal((8, _DIM)) * 0.05
    for i in range(8):
        add(i, base[i], i % 3)
    add(8, np.zeros(_DIM), 0)              # exact zero vector
    add(9, np.full(_DIM, 1e-30), 1)        # denormal-tiny norm
    add(10, base[0], 2)                    # exact duplicate of vec 0
    add(11, -base[1], 0)                   # antipodal pair
    add(12, np.full(_DIM, 0.25), 9)        # single-member label
    return rows


@pytest.fixture(scope="module")
def degenerate_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_emb_sf")
    pdf = pd.DataFrame(_vectors())
    pdf["embedding"] = pdf["embedding"].map(lambda a: a.tolist())
    pdf["label"] = pdf["label"].astype("int32")
    pdf.to_parquet(os.path.join(d, "embeddings.parquet"))
    return str(d)


# Engine-judgment booleans whose threshold encodes a PRODUCTION-corpus
# property (IVF recall@10 >= 0.5 needs enough vectors per inverted list);
# on this 13-vector pathological corpus the floor is genuinely unmeetable
# (probing 4 of 8 lists over 12 candidates), so parity here checks the
# exact-side columns and skips the judgment — which stays asserted on the
# real fixture by test_ivf_recall_vs_exact AND the sf0.01 driver gate.
_CORPUS_DEPENDENT_JUDGMENTS = {"similarity_ivf_topk": {"avg_recall_ok"}}


def _compare_emb_only(name, spark, sf_dir):
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = queries[name](spark, sf_dir).toPandas()
    if name not in oracles:
        return
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = con.sql(oracles[name]).df()
    con.close()
    assert got.shape[0] == want.shape[0], (
        f"{name}: rows {got.shape[0]} != {want.shape[0]}"
    )
    assert sorted(got.columns) == sorted(want.columns)
    skip = _CORPUS_DEPENDENT_JUDGMENTS.get(name, set())
    got = got.drop(columns=list(skip))
    want = want.drop(columns=list(skip))
    g, w = oracle_mod._normalize(got), oracle_mod._normalize(want)
    for col in g.columns:
        gc, wc = g[col], w[col]
        if gc.dtype.kind == "f" or wc.dtype.kind == "f":
            ga = gc.astype(float).to_numpy()
            wa = wc.astype(float).to_numpy()
            both_nan = pd.isna(ga) & pd.isna(wa)
            assert (both_nan | (ga == wa)).all(), (name, col)
        else:
            gs = gc.astype("string").fillna("<NULL>")
            ws = wc.astype("string").fillna("<NULL>")
            assert (gs == ws).all(), (
                f"{name}.{col}: {gs[gs != ws].head(3).tolist()} != "
                f"{ws[gs != ws].head(3).tolist()}"
            )


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_degenerate_embeddings_parity(spark, degenerate_emb_dir, name):
    _compare_emb_only(name, spark, degenerate_emb_dir)
