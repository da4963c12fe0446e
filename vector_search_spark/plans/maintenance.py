"""Index/table maintenance: compaction and clustered rewrites.

Long-running ingestion (incremental appends, streaming foreachBatch
upserts) accretes small files; at 100 TB the scan cost is dominated by
file-open/footer overhead and lost row-group statistics, not bytes.  The
two remedies a lakehouse scheduler runs nightly:

- **compact**: rewrite a table to ~target file counts (bin-packing by
  size is the engine's job — `coalesce` avoids a shuffle entirely when
  only merging).
- **clustered rewrite**: additionally sort within files on the dominant
  filter column so parquet row-group min/max statistics actually prune
  (a cheap, local ZORDER stand-in for the single-column case).

Both write to a NEW path and leave the source untouched: atomic swap is
the caller's (catalog's) move, the same temp-then-rename discipline the
reference uses for single files (`pipeline/utils.py:65-71`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession, src: str, dst: str, target_files: int
) -> None:
    """Rewrite ``src`` parquet into ``dst`` with ~``target_files`` files.

    ``coalesce`` (not ``repartition``) — merging small files needs no
    shuffle, just fewer output tasks; rows never move between executors
    beyond task packing."""
    spark.read.parquet(src).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(dst)


def clustered_rewrite(
    df: DataFrame, dst: str, cluster_col: str, num_files: int | None = None
) -> None:
    """Rewrite with rows range-clustered on ``cluster_col``: repartition by
    range (contiguous value ranges per file) then sort within partitions,
    so every row group's min/max stats are tight and scans with a
    ``cluster_col`` predicate skip whole files.

    ``num_files`` is the TOTAL number of output partitions/files (it is
    repartitionByRange's numPartitions).  Default: keep the input's
    parallelism (one range-file per existing partition) — never collapse a
    large table into a single writer task."""
    if num_files is None:
        num_files = max(1, df.rdd.getNumPartitions())
    (
        df.repartitionByRange(num_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(dst)
    )
