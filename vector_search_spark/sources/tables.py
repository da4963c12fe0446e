"""Parquet table sources (reference: S6, `pipeline/encode_assets.py:20`).

The driver's fixture tables live at ``{sf_dir}/{name}.parquet``.  Reads are
plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown, column
pruning and partition pruning — at 100 TB these tables would be
directory-partitioned (e.g. ``orders`` by month) and the same code holds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; column pruning/pushdown stays available.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's reader rejects
    by default — read it as a long (runtime-settable legacy conf, so this
    works in any caller's session) and expose BOTH ``ts_ns`` (exact long
    nanos, for ordering/bucketing: a 1.7e18 nanos value is NOT exactly
    representable as a double) and ``ts`` (micros-precision TIMESTAMP for
    human-facing use and streaming watermarks).
    """
    # date/timestamp expressions must agree with the (UTC) oracle even when
    # the caller's session didn't set a timezone (runtime-settable conf)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return raw.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns DIV 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
