"""Import every query-defining module so registrations land in
``queries.QUERIES`` / ``queries.ORACLES``."""

from __future__ import annotations

import importlib

_QUERY_MODULES = (
    "change_data_capture_spark.operators.cdc_queries",
    "change_data_capture_spark.operators.relational_queries",
    "change_data_capture_spark.operators.tpch_queries",
    "change_data_capture_spark.operators.events_queries",
    "change_data_capture_spark.operators.advanced_queries",
    "change_data_capture_spark.operators.text_queries",
    "change_data_capture_spark.operators.dedup_queries",
    "change_data_capture_spark.operators.similarity_queries",
    "change_data_capture_spark.operators.multimodal",
    "change_data_capture_spark.operators.dq_queries",
    "change_data_capture_spark.operators.hygiene_queries",
    "change_data_capture_spark.operators.merge_queries",
    "change_data_capture_spark.operators.graph_queries",
    "change_data_capture_spark.operators.analytics_queries",
    "change_data_capture_spark.operators.maintenance",
    "change_data_capture_spark.operators.txlog_queries",
    "change_data_capture_spark.operators.skew",
    "change_data_capture_spark.streaming.streaming_queries",
    "change_data_capture_spark.sources.scan_gates",
)


def load_all_queries() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
