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
from pyspark.sql import functions as F


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


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side, replicate the other.

    A hash join on a hot key puts every row of that key in ONE task; AQE's
    skew-join split handles sort-merge joins, but replicated-salting is the
    general fix (and the only one for aggregation-feeding joins where a
    single key exceeds one executor).  Here:

    - the skewed side gets a deterministic per-row salt in [0, buckets)
      (md5 of the whole row's key + a row discriminator is unnecessary —
      any distribution works for correctness; we hash the key with
      ``spark_partition_id`` mixed in so rows of one hot key spread),
    - the other side is exploded ``buckets``× (its rows are assumed
      moderate; for two huge skewed sides, salt a bucketed range join),
    - the join key becomes (key, salt), so the hot key's rows land in
      ``buckets`` independent tasks.

    Result is row-identical to ``skewed.join(other, key, how)``.
    """
    salt = F.pmod(
        F.crc32(F.concat_ws(":", F.col(key).cast("string"), F.spark_partition_id())),
        F.lit(buckets),
    ).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(b) for b in range(buckets)]))
    )
    return left.join(right, [key, "__salt"], how).drop("__salt")
