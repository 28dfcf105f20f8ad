"""Multimodal column plumbing (LLM-data tier, SURVEY.md §2.B).

Design: media travels as an opaque ``binary`` payload column plus a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (one Python worker call per ~10k-row batch — never per-row
UDFs). Partitioning, schema, and batch shape are real and tested; the *actual*
image/audio decode is stubbed (`decode_image_real`) because codec libraries
are not available in this environment — swap the stub for PIL/ffmpeg and
nothing else changes.

The fixture has no binary media, so the ``multimodal_features`` query
manufactures payloads by UTF-8-encoding document text — giving the whole
binary pipeline a deterministic, oracle-checkable workload.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from change_data_capture_spark.queries import query
from change_data_capture_spark.sources.tables import load_table

#: output schema of the feature extractor (keep in lockstep with _extract)
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, first_byte int, payload_md5 string, media_type string"
)


def decode_image_real(payload: bytes) -> "object":
    """Real media decode — NOT IMPLEMENTED in this environment (no codec
    libraries baked in). Production swaps this for PIL.Image.open /
    torchaudio.load / pyav frame sampling; everything around it (schema,
    batching, partitioning) is already exercised by the fake decoder."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use extract_features' "
        "deterministic fake decode for plumbing tests"
    )


def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder: byte-level features of the payload.

    Arrow hands whole column batches; everything below is vectorized pandas
    (no per-row Python loop except the cheap md5 map).
    """
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "media_type": pdf["media_type"],
            }
        )


def extract_features(df: DataFrame) -> DataFrame:
    """Run the batched feature extractor over (doc_id, payload, media_type)."""
    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


_MULTIMODAL_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CASE WHEN octet_length(encode(text)) = 0 THEN -1
            ELSE CAST('0x' || substr(hex(encode(text)), 1, 2) AS INTEGER)
       END AS first_byte,
       md5(text) AS payload_md5,
       'fake/text' AS media_type
FROM documents
"""


@query("multimodal_features", oracle=_MULTIMODAL_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: encode text → binary payload +
    media-type metadata, then Arrow-batched mapInPandas feature extraction
    (byte count, first byte, md5). The oracle recomputes the same features
    from the text directly — proving the bytes survived the binary round
    trip unchanged."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("fake/text").alias("media_type"),
    )
    return extract_features(media)
