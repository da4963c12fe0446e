"""Registry entries: lexical BM25 + hybrid (dense ⊕ lexical) search.

The reference is dense-vector-only; a user switching engines gets the
standard production companions here: BM25 keyword ranking over the same
corpus and reciprocal-rank-fusion hybrid search combining the BM25 list
with the dense KNN list (doc_id ≡ vec_id, same identity `search_pipeline`
uses).  Both oracles are full DuckDB twins — the BM25 fold is ordered on
both sides so double addition cannot drift (memory/cross-engine-
determinism.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.scalar import round4
from .functions.vector import dot_product
from .operators.bm25 import bm25_topk, rrf_fuse
from .registry import register
from .sources.tables import load_table as __load

_BM25_QUERY = "spark join stream"
_K1 = 1.2
_B = 0.75

# DuckDB twin of operators/bm25.bm25_scored for the fixed query above.
# Shapes mirror the Spark plan stage-for-stage: postings filtered to query
# terms before aggregation; avgdl = one int division; ordered list fold.
_BM25_SCORED_SQL = f"""
    toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
      FROM documents WHERE trim(text) != ''),
    qterms AS (SELECT unnest(['join', 'spark', 'stream']) AS tok),
    qtoks AS (SELECT doc_id, tok FROM toks JOIN qterms USING (tok)),
    tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM qtoks GROUP BY 1, 2),
    df AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS df FROM qtoks GROUP BY 1),
    dl AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
             END::BIGINT AS dl
      FROM documents),
    stats AS (SELECT sum(dl)*1.0/count(*) AS avgdl, count(*)::BIGINT AS n_docs FROM dl),
    contrib AS (
      SELECT tf.doc_id, tf.tok,
             ln(1.0 + (stats.n_docs - df.df + 0.5)/(df.df + 0.5))
               * (tf.tf * {_K1 + 1.0})
               / (tf.tf + {_K1}*(1.0 - {_B} + {_B}*dl.dl/stats.avgdl)) AS c
      FROM tf JOIN df USING (tok) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
    bm25 AS (
      SELECT doc_id,
             list_reduce(list_prepend(0.0, list(c ORDER BY tok)),
                         (acc, x) -> acc + x) AS raw_score
      FROM contrib GROUP BY doc_id)
"""


@register(
    "bm25_topk",
    oracle=f"""
    WITH {_BM25_SCORED_SQL}
    SELECT doc_id, floor((raw_score)*10000 + 0.5)/10000.0 AS score,
           rank::INTEGER AS rank
    FROM (SELECT doc_id, raw_score,
                 row_number() OVER (ORDER BY raw_score DESC, doc_id) AS rank
          FROM bm25)
    WHERE rank <= 20
    """,
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 BM25 (k1=1.2, b=0.75, Lucene idf) for a 3-term query.

    Scale shape: postings are filtered to the query terms before the tf/df
    shuffles (exchange is O(matching docs)); the final top-k is a window
    row_number over the scored set — bounded output, tie-broken by id."""
    docs = __load(spark, sf_dir, "documents")
    out = bm25_topk(docs, _BM25_QUERY, k=20, k1=_K1, b=_B)
    return out.select("doc_id", round4("raw_score").alias("score"), "rank")


@register(
    "hybrid_rrf_search",
    oracle=f"""
    WITH {_BM25_SCORED_SQL},
    lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY raw_score DESC, doc_id) AS rank
      FROM bm25 QUALIFY rank <= 50),
    qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    dense AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (
               ORDER BY list_dot_product(e.embedding::DOUBLE[], qv.embedding::DOUBLE[]) DESC,
                        vec_id) AS rank
      FROM embeddings e CROSS JOIN qv QUALIFY rank <= 50),
    fused AS (
      SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id,
             coalesce(lex.rank, -1) AS lex_rank,
             coalesce(dense.rank, -1) AS dense_rank,
             coalesce(1.0/(60 + lex.rank), 0.0)
               + coalesce(1.0/(60 + dense.rank), 0.0) AS raw_rrf
      FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id)
    SELECT doc_id, lex_rank::INTEGER AS lex_rank, dense_rank::INTEGER AS dense_rank,
           floor((raw_rrf)*10000 + 0.5)/10000.0 AS rrf_score,
           row_number() OVER (ORDER BY raw_rrf DESC, doc_id)::INTEGER AS rank
    FROM fused
    QUALIFY rank <= 20
    """,
)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 top-50 ⊕ dense-KNN top-50 fused with RRF
    (k=60), final top-20.

    The dense leg is the same exact-KNN plan as `knn_topk` (vectors never
    shuffled; TakeOrderedAndProject); the lexical leg is `bm25_topk`; the
    fusion joins two 50-row lists — broadcast, O(1) regardless of corpus
    size.  Ranks are −1-sentinel NULL-free ints."""
    from pyspark.sql import Window

    docs = __load(spark, sf_dir, "documents")
    emb = __load(spark, sf_dir, "embeddings")

    lex = bm25_topk(docs, _BM25_QUERY, k=50, k1=_K1, b=_B).select("doc_id", "rank")

    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__qvec"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        dot_product("embedding", "__qvec").alias("raw_score"),
    )
    # limit-then-rank: TakeOrderedAndProject bounds the dense leg before
    # any window touches it (a pre-limit global window would single-task
    # the whole embedding scan)
    wd = Window.orderBy(F.desc("raw_score"), F.asc("doc_id"))
    dense = (
        scored.orderBy(F.desc("raw_score"), F.asc("doc_id"))
        .limit(50)
        .withColumn("rank", F.row_number().over(wd))
        .select("doc_id", "rank")
    )

    fused = rrf_fuse(lex, dense, id_col="doc_id", k=60)
    wf = Window.orderBy(F.desc("raw_rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= 20)
        .select(
            "doc_id",
            F.col("rank_a").alias("lex_rank"),
            F.col("rank_b").alias("dense_rank"),
            round4("raw_rrf").alias("rrf_score"),
            "rank",
        )
    )
