"""Bucketed range (interval) join — "points in intervals" without the
O(|P|·|I|)-per-key explosion a naive BETWEEN theta-join produces.

Not in the reference (north-star addition, like asof/dedup): the
attribution-window / interval-containment shape every event pipeline needs.

Spark has no native interval join (a plain ``ON p.ts BETWEEN i.start AND
i.end`` plans as a broadcast-nested-loop or cartesian per key).  The
scalable formulation:

1. Pick a bucket width ~ the typical interval length.
2. Each POINT lands in exactly one (key, bucket).
3. Each INTERVAL is replicated to every bucket it overlaps
   (``sequence(floor(start/w), floor(end/w))`` — bounded by
   interval_length/width + 1 copies).
4. Equi-join on (key, bucket) — a plain hash shuffle — then the exact
   BETWEEN filter.  Each qualifying (point, interval) pair appears EXACTLY
   once because the point's bucket is unique; no dedup needed.

Scale: shuffle volume = |P| + |I|·(mean_len/width + 1) narrow rows; skew
follows the (key, bucket) distribution, so long-lived hot keys spread
across their time buckets instead of collapsing into one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start: str,
    end: str,
    bucket_width: int,
) -> DataFrame:
    """Join each point row to every interval row (same ``key``) with
    ``start <= point_ts <= end`` (inner; compose a join-back against the
    interval table for left-outer semantics).  Output: point columns +
    interval columns, ``key`` deduped.  Timestamps must be non-negative
    integers (epoch micros here) so floor-division bucketing is exact.
    """
    p = points.withColumn("__bk", F.floor(F.col(point_ts) / bucket_width).cast("long"))
    i = intervals.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bucket_width).cast("long"),
                F.floor(F.col(end) / bucket_width).cast("long"),
            )
        ),
    )
    cond = (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end))
    return p.join(i, [key, "__bk"], "inner").filter(cond).drop("__bk")
