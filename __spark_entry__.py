"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`vector_search_spark.registry` — the engine's query
inventory (Spark impl + DuckDB oracle per SURVEY.md §2 operator) lives
there so tests / bench / driver all exercise the same code.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_search_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's full MCP query path (exact KNN
    over-fetch → rerank → min-score + date filters → limit → projection)
    at sf0.001."""
    return registry.QUERIES["search_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
