"""The SQL front-end: engine operators expressed directly in spark.sql
must equal the DataFrame API results."""

from __future__ import annotations

from conftest import SF_TEST
from vector_search_spark import registry
from vector_search_spark.sql import register_sql_surface


def test_sql_knn_equals_dataframe_knn(spark):
    register_sql_surface(spark, SF_TEST)
    # NB: Spark rejects SQL UDFs inside Sort — score in a subquery, order by
    # the materialized column
    got = spark.sql("""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT e.vec_id, e.label,
                 vss_dot(CAST(e.embedding AS ARRAY<DOUBLE>),
                         CAST(q.embedding AS ARRAY<DOUBLE>)) AS raw
          FROM embeddings e CROSS JOIN q)
        SELECT vec_id, label, vss_round4(raw) AS score
        FROM scored ORDER BY raw DESC, vec_id LIMIT 20
    """).collect()
    want = registry.QUERIES["knn_topk"](spark, SF_TEST).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_sql_rerank_scalars(spark):
    register_sql_surface(spark, SF_TEST)
    rows = spark.sql("""
        WITH rr AS (SELECT doc_id, vss_rerank('what is spark', text) AS r FROM documents)
        SELECT doc_id, vss_round4(r) AS rerank_score,
               vss_round4(vss_sigmoid(r)) AS probability,
               vss_relevance(r) AS relevance
        FROM rr ORDER BY r DESC, doc_id LIMIT 20
    """).collect()
    want = registry.QUERIES["rerank_scores"](spark, SF_TEST).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in want]


def test_sql_dedup_fingerprint(spark):
    register_sql_surface(spark, SF_TEST)
    got = spark.sql(
        "SELECT vss_fingerprint(text) AS f, min(doc_id) AS keeper_id, "
        "count(*) AS dup_count FROM documents GROUP BY 1"
    ).count()
    want = registry.QUERIES["dedup_exact"](spark, SF_TEST).count()
    assert got == want


def test_sql_token_count(spark):
    register_sql_surface(spark, SF_TEST)
    bad = spark.sql("""
        SELECT count(*) AS n FROM documents d
        JOIN (SELECT doc_id, vss_token_count(text) AS tc FROM documents) t
          ON d.doc_id = t.doc_id
        WHERE t.tc <= 0
    """).first()["n"]
    assert bad == 0
