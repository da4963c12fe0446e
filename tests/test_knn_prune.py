"""The per-partition pre-top-k fallback must be EXACT vs the plain path,
including on score ties (heap tie-break order must match the window's)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_TEST
from vector_search_spark.operators.knn import similarity_join


def test_prune_per_partition_exact(spark):
    emb = spark.read.parquet(f"{SF_TEST}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plain = sorted(tuple(r) for r in similarity_join(emb, queries, k=10).collect())
    pruned = sorted(
        tuple(r)
        for r in similarity_join(emb, queries, k=10, prune_per_partition=True).collect()
    )
    assert plain == pruned


def test_prune_exact_on_ties(spark):
    # duplicate vectors -> guaranteed score ties around the k boundary
    base = spark.read.parquet(f"{SF_TEST}/embeddings.parquet").limit(30)
    dup = base.withColumn("vec_id", F.col("vec_id") + 10000)
    emb = base.unionByName(dup).repartition(6)
    queries = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plain = sorted(tuple(r) for r in similarity_join(emb, queries, k=7).collect())
    pruned = sorted(
        tuple(r)
        for r in similarity_join(emb, queries, k=7, prune_per_partition=True).collect()
    )
    assert plain == pruned
