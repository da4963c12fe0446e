"""Ingestion pipeline (reference SURVEY.md §3.4) as ONE lazy DataFrame chain:

read markdown → chunk (T7) → enrich title/url (T8) → embed (E1) → write the
partitioned parquet index table (S5/S7).

The reference materializes every stage to disk and re-reads it
(`embeddings_assets.py:46-51`, `encode_assets.py:20`, `store_assets.py:23`);
here the only materialization is the final index write.  At 100 TB the
write is partitioned by issue year so date-ranged queries prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..encoders import HashEncoder
from ..operators.chunker import parse_newsletter_chunks, py_strip
from ..sources.files import read_markdown_dir


def enrich_title_url(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Reference T8 (`embeddings_assets.py:53-62`): title from a leading
    '# ' line (fallback 'Unknown'); url rebuilt as
    https://jamesclear.com/3-2-1/{month-name}-{day}-{year} with a
    NON-zero-padded day (`%-d`)."""
    first_line = F.substring_index(F.col(content_col), "\n", 1)
    title = F.when(
        first_line.startswith("# "),
        py_strip(F.replace(first_line, F.lit("# "), F.lit(""))),
    ).otherwise(F.lit("Unknown"))
    d = F.to_date(F.col("date"))
    url = F.concat(
        F.lit("https://jamesclear.com/3-2-1/"),
        F.lower(F.date_format(d, "MMMM")),
        F.lit("-"),
        F.dayofmonth(d).cast("string"),
        F.lit("-"),
        F.year(d).cast("string"),
    )
    return docs.withColumn("title", title).withColumn("url", url)


def build_chunks(docs: DataFrame) -> DataFrame:
    """documents (path, date, content) → enriched chunk table with
    deterministic content-hash chunk ids (reference uses uuid4,
    `store_assets.py:66` — hashes keep tests reproducible)."""
    enriched = enrich_title_url(docs)
    chunks = parse_newsletter_chunks(enriched, content_col="content", date_col="date")
    return chunks.withColumn(
        "chunk_id",
        F.substring(
            F.md5(F.concat_ws("|", "date", "category", F.col("index").cast("string"), "text")),
            1,
            16,
        ),
    )


def build_index(
    docs: DataFrame,
    encoder: HashEncoder | None = None,
) -> DataFrame:
    """Full ingest: chunks + unit-norm embedding column (E1).

    The encoder UDF is Arrow-batched, stateless and embarrassingly
    parallel; swap ``HashEncoder`` for ``SentenceTransformerEncoder`` in
    production (same seam, SURVEY.md §2.3 E1).
    """
    encoder = encoder or HashEncoder(dim=64)
    chunks = build_chunks(docs)
    return chunks.withColumn("embedding", encoder.udf()(F.col("text")))


def write_index(index: DataFrame, path: str, partition_by: str = "year") -> None:
    """S5/S7: the vector-store sink is a partitioned parquet table;
    'recreate collection' ≡ mode('overwrite') (`store_assets.py:38-77`)."""
    (
        index.withColumn("year", F.year(F.to_date("date")))
        .repartition(partition_by)
        .write.mode("overwrite")
        .partitionBy(partition_by)
        .parquet(path)
    )


def update_index(
    spark: SparkSession, index_path: str, new_docs: DataFrame
) -> int:
    """Incremental index maintenance (reference S2 'skip existing'):
    chunk+embed ``new_docs`` and append only chunks whose content-hash id
    isn't already in the index.  Returns the number of appended rows."""
    import os

    new_index = build_index(new_docs).withColumn("year", F.year(F.to_date("date")))
    if os.path.exists(index_path):
        existing = spark.read.parquet(index_path).select("chunk_id")
        new_index = new_index.join(existing, "chunk_id", "left_anti")
    new_index = new_index.cache()
    n = new_index.count()
    if n:
        new_index.write.mode("append").partitionBy("year").parquet(index_path)
    return n


def ingest_markdown_dir(
    spark: SparkSession, md_dir: str, out_path: str | None = None
) -> DataFrame:
    """End-to-end: markdown directory → chunk+vector index DataFrame
    (optionally written as the partitioned index table)."""
    docs = read_markdown_dir(spark, md_dir)
    index = build_index(docs)
    if out_path:
        write_index(index, out_path)
    return index
