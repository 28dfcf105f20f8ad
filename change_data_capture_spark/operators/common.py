"""Small helpers shared across operator gate wrappers (kept dependency-free
so both ``analytics_queries`` and ``text_queries`` can import it at module
level without creating an import cycle between them)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_and_release(result: DataFrame, handle: DataFrame) -> DataFrame:
    """Materialize a gate's (small, per-doc/per-key) ``result`` while the
    upstream ``handle`` relation is still cached, then release that cache
    DETERMINISTICALLY — a driver session runs 100+ gates back to back and
    leaked caches accumulate into eviction churn for every later query.

    The returned DataFrame stays persisted (the caller hands it to the
    driver, which collects and discards it); that retained cache is
    result-sized — thousands of aggregate rows — not corpus-sized, which
    is the asymmetry that makes this trade correct: the corpus-scale
    ``handle`` cache is the one that must not outlive the gate."""
    out = result.persist()
    out.count()
    handle.unpersist()
    return out
