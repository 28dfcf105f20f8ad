"""Spark 4 Python UDTF extension-API coverage.

Companion to the custom Python DataSource test: the engine's document
chunker re-expressed as a table function (``pyspark.sql.functions.udtf``)
must produce EXACTLY the rows of the declarative `document_chunking`
query (same 50-token / 40-stride rule). The declarative array-slice form
stays the production path — JVM codegen beats a Python table function —
but the UDTF proves the extension surface works end-to-end (registration,
SQL ``LATERAL``, Arrow row transfer) for operators Spark genuinely can't
express.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf

import __spark_entry__ as entrymod

CHUNK_SIZE = 50
CHUNK_STRIDE = 40


@udtf(returnType="chunk_id: int, n_tokens: int, chunk_md5: string")
class ChunkDoc:
    """Overlapping fixed-size chunking — identical rule to the declarative
    `document_chunking` operator (text_queries.py)."""

    def eval(self, text: str):
        toks = text.strip().split() if text is not None else []
        n = len(toks)
        import math

        n_chunks = math.ceil(max(n - (CHUNK_SIZE - CHUNK_STRIDE), 1) / CHUNK_STRIDE)
        for i in range(int(n_chunks)):
            chunk = toks[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_SIZE]
            yield (
                i,
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )


def test_udtf_chunker_matches_declarative_operator(spark, sf_dir):
    spark.udtf.register("chunk_doc", ChunkDoc)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("docs_udtf_src")
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk_md5
        FROM docs_udtf_src d, LATERAL chunk_doc(d.text) c
        """
    ).collect()
    want = entrymod.queries()["document_chunking"](spark, sf_dir).collect()
    key = lambda r: (r.doc_id, r.chunk_id)  # noqa: E731
    got_m = {key(r): (r.n_tokens, r.chunk_md5) for r in got}
    want_m = {key(r): (r.n_tokens, r.chunk_md5) for r in want}
    assert got_m == want_m
    assert len(got) == len(want)
