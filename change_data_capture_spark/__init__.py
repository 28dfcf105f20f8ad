"""change_data_capture_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of josephmachado/change_data_capture.

The reference (/root/reference) composes Debezium + Kafka + Kafka-Connect S3 +
DuckDB to demonstrate a CDC pipeline and SCD2 analytics. This package provides
those capabilities natively on Spark:

- ``sources``   — typed readers for parquet fixtures, NDJSON change logs, and a
                  deterministic Debezium-envelope CDC event generator
                  (reference: datagen/gen_user_payment_data.py).
- ``functions`` — envelope decoding, text analysis, vector math; everything is
                  built-in ``pyspark.sql.functions`` (JVM, codegen'd) — no
                  row-at-a-time Python UDFs in any hot path.
- ``operators`` — SCD2 reconstruction (reference: README.md:86-125), change-log
                  exploration, dedup family (exact/minhash/simhash/jaccard),
                  similarity search, as-of/range joins, per-group top-k.
- ``streaming`` — Structured Streaming ingestion with exactly-once partitioned
                  sinks and incremental (foreachBatch) SCD2 maintenance —
                  the Spark upgrade of the reference's Kafka-Connect S3 sink
                  (connectors/s3-sink.json).

Scale stance: every operator is expressed declaratively (DataFrame/SQL) so
Catalyst + AQE choose physical plans; small dimensions are broadcast; windows
and aggregations share partitioning where possible; skew and shuffle sizing are
handled by AQE (enabled in ``session.py``).
"""

__version__ = "0.1.0"

from change_data_capture_spark.session import get_spark, ensure_runtime_confs

__all__ = ["get_spark", "ensure_runtime_confs", "__version__"]
