"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM data pipelines actually exchange (web-crawl dumps, annotation exports,
eval sets).  Spark's native json reader/writer IS line-delimited, so both
directions stay fully distributed: one task per file split on read, one
file per partition on write.

Scale rules encoded here:
- **Always pass an explicit schema on read.**  Schema inference is a full
  extra scan of the data (and samples types non-deterministically at
  100 TB); `read_jsonl` requires a schema for exactly that reason.
- **Malformed lines are data, not crashes.**  Crawl dumps contain broken
  records; PERMISSIVE mode routes them to a corrupt-record column so the
  pipeline can count/quarantine them (an honest QC signal) instead of
  failing the job or silently dropping rows (DROPMALFORMED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, coalesce: int | None = None) -> None:
    """Write a DataFrame as JSONL (one object per line, one file per
    partition).  ``coalesce`` caps output files for small exports; leave
    None at scale so the write stays as parallel as the plan."""
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str, keep_corrupt: bool = True
) -> DataFrame:
    """Schema-on-read JSONL scan.  ``schema`` is a DDL string for the good
    rows; when ``keep_corrupt`` the unparseable lines surface in
    ``_corrupt_record`` (NULL for good rows) instead of disappearing."""
    full = f"{schema}, {CORRUPT_COL} string" if keep_corrupt else schema
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def corrupt_record_stats(df: DataFrame) -> DataFrame:
    """QC aggregate over a `read_jsonl` frame: good vs corrupt line counts
    (the first number a crawl-ingest report prints).

    ``n_corrupt`` counts lines that failed JSON parsing outright (corrupt
    column set AND no field parsed) — field-level type mismatches are a
    different QC signal, not line corruption.  The conjunction also keeps
    the plan legal: the JSON source refuses queries whose referenced
    columns are ONLY the internal corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and a row must be fully parsed to
    know it is corrupt anyway, so referencing the data columns is free."""
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    all_null = None
    for c in data_cols:
        expr = F.col(c).isNull()
        all_null = expr if all_null is None else (all_null & expr)
    return df.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            (F.col(CORRUPT_COL).isNotNull() & all_null).cast("long")
        ).alias("n_corrupt"),
    )


def corrupt_row_stats(df: DataFrame) -> DataFrame:
    """Row-level variant for delimited sources, where a malformed row
    usually still parses SOME fields (wrong arity / one bad type): counts
    every corrupt-flagged row, partial or not.  The `length(...) >= 0`
    guard is a tautology that keeps a data column referenced in the plan
    (same QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction as above) without
    changing the count — a plain `* 0` term gets constant-folded away and
    re-triggers the restriction."""
    data0 = next(c for c in df.columns if c != CORRUPT_COL)
    always = F.length(F.coalesce(F.col(data0).cast("string"), F.lit(""))) >= 0
    return df.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.when(always, F.col(CORRUPT_COL).isNotNull().cast("long")).otherwise(
                F.lit(0)
            )
        ).alias("n_corrupt"),
    )
