"""Delimited (CSV/TSV) source/sink — the other interchange format that
arrives from annotation vendors and spreadsheet exports.  Same contract as
`sources.jsonl`: explicit schema on read (inference = an extra full scan),
PERMISSIVE corrupt-record quarantine instead of crashes or silent drops,
fully distributed in both directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .jsonl import CORRUPT_COL


def write_delimited(
    df: DataFrame, path: str, sep: str = ",", coalesce: int | None = None
) -> None:
    """Write header-ful delimited files, one per partition; values are
    quoted/escaped by the writer so free text (commas, quotes, newlines)
    round-trips."""
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").option("header", True).option("sep", sep).csv(path)


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    keep_corrupt: bool = True,
) -> DataFrame:
    """Schema-on-read delimited scan; unparseable lines (wrong arity,
    type-mismatched fields) surface in ``_corrupt_record`` when
    ``keep_corrupt``.  multiLine stays off — on means one file = one
    record-splittable unit and kills scan parallelism; quoted embedded
    newlines are rare enough to quarantine instead."""
    full = f"{schema}, {CORRUPT_COL} string" if keep_corrupt else schema
    return (
        spark.read.schema(full)
        .option("header", True)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
