"""Document-file sources (reference S3/T3: directory scan + filename parse).

``binaryFile``/``wholetext`` readers keep ingestion distributed: one task
per file split, metadata (path → date) extracted with native expressions,
no driver-side directory walking (`pipeline/markdown_assets.py:16-27` walks
os.walk on one machine; here the DataSource lists in parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_markdown_dir(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of ``YYYY-MM-DD.md`` files → (path, date, content).

    ``date`` is the ISO string from the filename (the reference stores the
    date as a string, `pipeline/embeddings_assets.py:32-42`).
    """
    raw = (
        spark.read.format("text")
        .option("wholetext", True)
        .option("pathGlobFilter", "*.md")
        .option("recursiveFileLookup", True)
        .load(path)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("content"),
        )
    )
    return raw.withColumn(
        "date", F.regexp_extract(F.col("path"), r"(\d{4}-\d{2}-\d{2})\.md$", 1)
    )


def read_html_dir(spark: SparkSession, path: str) -> DataFrame:
    """Reference S3: recursive scan for HTML documents as binary rows."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.html")
        .option("recursiveFileLookup", True)
        .load(path)
        .select(
            F.col("path"),
            F.col("length"),
            F.col("content").cast("binary").alias("content"),
        )
    )


def url_table_from_sitemap_urls(spark: SparkSession, urls: list[str]) -> DataFrame:
    """Reference S1/T1 (`pipeline/download_assets.py:26-58`): URL list →
    (url, date) with non-matching URLs dropped.

    The regex mirrors the reference's `3-2-1/{month-name}-{d}-{yyyy}` slug;
    parsing is pure Catalyst (`try_to_date`: ANSI mode makes plain
    to_date throw on non-matching slugs instead of yielding null).
    Network fetch stays out of the engine — callers pass fixture URLs.
    """
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    slug = F.regexp_extract(F.col("url"), r"3-2-1/([a-z]+-\d{1,2}-\d{4})/?$", 1)
    return (
        df.withColumn("slug", slug)
        .filter(F.col("slug") != "")
        .withColumn("date", F.try_to_date(F.col("slug"), "MMMM-d-yyyy"))
        .filter(F.col("date").isNotNull())
        .select("url", "date")
        .orderBy("date")
    )
