"""Driver-contract query registry: Spark impl + DuckDB oracle per operator.

Every operator claimed done in SURVEY.md §2 gets a ``QUERIES[name]``
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, an
``ORACLES[name]`` ANSI-SQL string DuckDB runs over the same parquet views.
Column names/aliases match on both sides (the driver hash-compares after
sorting columns by name).  Float-valued outputs are rounded to 4 dp on both
sides so double math hashes identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.vector import dot_product

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame query, with optional oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Q1 — KNN top-k by dot product (reference `query.py:53-55`, k=20).
# Query vector = embeddings row vec_id=0, so both engines derive it from the
# same data.  Exact scored scan; plan is TakeOrderedAndProject (no shuffle).
# ---------------------------------------------------------------------------
@register(
    "knn_topk",
    oracle="""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           round(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS score
    FROM embeddings e CROSS JOIN q
    ORDER BY list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, e.vec_id
    LIMIT 20
    """,
)
def q_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__qvec"))
    scored = emb.crossJoin(F.broadcast(q)).withColumn(
        "raw_score", dot_product("embedding", "__qvec")
    )
    return (
        scored.orderBy(F.desc("raw_score"), F.asc("vec_id"))
        .limit(20)
        .select("vec_id", "label", F.round("raw_score", 4).alias("score"))
    )
