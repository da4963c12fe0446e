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
    partitions iff it currently has fewer — hash-partitioned by ``cols``
    when given (deterministic placement), round-robin otherwise."""
    n = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *cols) if cols else df.repartition(n)
