"""Registry entries for genuinely non-SQL-expressible operators (no
DuckDB oracle — the driver records rows-only checks): multimodal decode
plumbing and approximate (IVF) vector search.  Both are deterministic, so
row counts and values are stable across runs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.scalar import round4
from .operators.ann import ivf_topk
from .operators.multimodal import attach_binary_payload, decode_image_features
from .registry import register
from .sources.tables import load_table as __load


@register("multimodal_features")
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct → mapInPandas decode/feature stub
    (deterministic fake decoder; real codecs absent in this container)."""
    docs = __load(spark, sf_dir, "documents")
    feats = decode_image_features(attach_binary_payload(docs))
    return feats.select(
        "doc_id",
        "mime",
        "n_bytes",
        "width",
        "height",
        F.transform("features", lambda x: round4(x)).alias("features"),
    ).orderBy("doc_id")


@register("ann_ivf_topk")
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 for 20 queries (deterministic centroids + Lloyd
    refinement; approximate ⇒ no SQL oracle, recall pinned in pytest)."""
    emb = __load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=8, replicas=2)
    return out.select("query_id", "vec_id", round4("score").alias("score"), "rank")
