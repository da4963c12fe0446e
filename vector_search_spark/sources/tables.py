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


def events_ts_is_nanos(sf_dir: str) -> bool:
    """True when the events fixture stores ``ts`` as parquet TIMESTAMP(NANOS)
    (read by Spark as long nanos under the legacy conf); False for the
    TIMESTAMP(MICROS) variant.  Probes the parquet footer only — cheap, no
    Spark job — so both the batch and streaming loaders can adapt to either
    fixture generation without a schema-inference pass.
    """
    import glob

    import pyarrow.parquet as pq

    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        # Spark-written table: probe any one part file's footer (all parts
        # share the write schema) — e.g. the scaled fixtures under .scale/.
        # Recursive so hive-partitioned layouts (part files under key=value
        # subdirectories) probe correctly instead of handing the directory
        # itself to pq.read_schema, whose error names no table.
        parts = sorted(glob.glob(f"{path}/**/*.parquet", recursive=True))
        if not parts:
            raise FileNotFoundError(
                f"events table at {path} is a directory with no *.parquet "
                "part files (found only markers like _SUCCESS?)"
            )
        path = parts[0]
    return str(pq.read_schema(path).field("ts").type) == "timestamp[ns]"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; column pruning/pushdown stays available.

    ``events.ts`` has shipped as both TIMESTAMP(NANOS) parquet (which
    Spark's reader rejects by default — read as long under the legacy
    conf) and TIMESTAMP(MICROS).  Either way expose BOTH ``ts_ns`` (exact
    long nanos, for ordering/bucketing: a 1.7e18 nanos value is NOT exactly
    representable as a double) and ``ts`` (micros-precision TIMESTAMP for
    human-facing use and streaming watermarks).
    """
    # date/timestamp expressions must agree with the (UTC) oracle even when
    # the caller's session didn't set a timezone (runtime-settable conf)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        if events_ts_is_nanos(sf_dir):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            return raw.withColumnRenamed("ts", "ts_ns").withColumn(
                "ts", F.timestamp_micros(F.expr("ts_ns DIV 1000"))
            )
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # micros fixture arrives as TIMESTAMP_NTZ (UTC wall clock); pin to
        # session-UTC TIMESTAMP so downstream window/date math matches the
        # oracle, and derive the exact long nanos the operators key on
        return raw.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
            "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000).cast("long")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
