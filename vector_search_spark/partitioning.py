"""Partitioning helpers.

``fan_out`` fixes the "coarse scan starves a narrow stage" problem: a small
parquet file (or a single huge row group) arrives as 1-2 input partitions,
so an expensive narrow transform downstream — interpreted higher-order
functions, Arrow-batched ``mapInPandas`` — runs on one core no matter how
many the cluster has.  One cheap hash exchange before the expensive stage
buys full parallelism.

At 100 TB the scan already yields thousands of splits and this is a no-op;
the guard keeps the exchange out of plans that don't need it (AQE cannot
help here — it only re-plans *shuffle* boundaries, not narrow stages over
coarse scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, *cols: str, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: cluster parallelism)
    partitions iff its input looks narrower than that — hash-partitioned by
    ``cols`` when given (deterministic placement), round-robin otherwise.

    The guard reads ``inputFiles()`` (analyzed-plan file metadata — does NOT
    force physical planning or RDD DAG construction the way
    ``rdd.getNumPartitions()`` does) and only falls back to the RDD count
    for non-file inputs.  At scale (files ≥ parallelism) this is a pure
    no-op; when it fires on a small input it does shuffle every selected
    column (including wide text/vector columns) — acceptable exactly
    because it fires only when the input is tiny.  Mid-scale inputs with
    few-but-splittable files may repartition unnecessarily; that one extra
    exchange is the documented cost of keeping plan construction cheap.
    """
    n = target or df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files:
        if len(files) >= n:
            return df
    elif df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *cols) if cols else df.repartition(n)
