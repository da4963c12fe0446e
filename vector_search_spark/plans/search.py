"""End-to-end retrieve→rerank→filter→project search plan.

This is the reference's whole query path as ONE lazy DataFrame chain
(SURVEY.md §3): encode(query) → KNN top-k by dot product (`query.py:53-55`)
→ cross-encoder rerank (`query.py:57-61`) → sort desc (`query.py:63-66`) →
min-score / date-range post-filters (`mcp_server.py:152-171`) → limit
(`mcp_server.py:175-177`) → MCP projection (`mcp_server.py:192-204`).

The over-fetch (k=50 then post-filter to ``limit``, `mcp_server.py:122-125`)
is kept *semantically*: rerank scores only exist for the k retrieved rows,
so filters apply after rerank exactly as the reference streams them.
Catalyst still pushes the pure-payload predicates below the rerank
projection when legal.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..encoders import hash_rerank_score
from ..functions.scalar import round4
from ..operators.filters import date_range_filter, min_score_filter
from ..operators.knn import knn_topk


def search(
    chunks: DataFrame,
    query_vec: Sequence[float],
    query_text: str,
    k: int = 50,
    min_score: float = 0.0,
    from_date: str | dt.date | None = None,
    to_date: str | dt.date | None = None,
    limit: int = 10,
    id_col: str = "chunk_id",
    vec_col: str = "embedding",
    text_col: str = "text",
    payload_cols: Sequence[str] = ("title", "date", "category", "url"),
    rerank_fn: Callable[[Column, Column], Column] = hash_rerank_score,
) -> DataFrame:
    """MCP `search_newsletter` semantics over a chunks-with-vectors table.

    Returns (id_col, payload..., text, score) with score = rerank logit
    rounded to 4 dp, sorted desc, at most ``limit`` rows.
    """
    candidates = knn_topk(
        chunks,
        query_vec,
        k=k,
        vec_col=vec_col,
        id_col=id_col,
        payload_cols=[*payload_cols, text_col],
    ).withColumnRenamed("score", "knn_score")

    reranked = candidates.withColumn(
        "rerank_score", rerank_fn(F.lit(query_text), F.col(text_col))
    )
    filtered = min_score_filter(reranked, "rerank_score", min_score)
    filtered = date_range_filter(filtered, "date", from_date, to_date)
    top = filtered.orderBy(F.desc("rerank_score"), F.asc(id_col)).limit(limit)
    return top.select(
        id_col,
        *payload_cols,
        text_col,
        round4("rerank_score").alias("score"),
    )
