"""As-of (backward) join — the point-in-time lookup every feature /
training-data pipeline needs (attach the most recent right-side state to
each left event) and which Spark has no native operator for.

Not in the reference (north-star addition like the dedup family).

Spark-first formulation: a **union + running last_value window**, NOT a
range join —

1. Tag left rows 1 and right rows 0, union on an aligned schema.
2. One window per key, ordered by (ts, tag):
   ``last(payload, ignorenulls=True) over rows unbounded preceding..current``
   carries the latest right payload forward; right-before-left on ts ties
   makes the match INCLUSIVE (right.ts <= left.ts), matching DuckDB
   ``ASOF JOIN ... ON l.ts >= r.ts``.
3. Keep only left rows.

Scale: one hash exchange on the key + a per-partition sort — the same cost
as a sort-merge join, with running state O(1) per row.  A naive range join
(l.ts >= r.ts) explodes to O(|L|·|R|) per key before aggregation; this
never materializes more than |L|+|R| rows.  Hot keys are a window-skew
concern (AQE splits shuffle joins, not windows) — salt the key with a
coarse ts bucket if one key dominates.

The right side must be unique per (key, ts) — pre-dedup it (deterministic
row_number) or the carried payload is sort-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_payloads: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right.ts <= left.ts`` for the same ``key`` (NULL payloads when no such
    row).  Output = left columns + ``{prefix}{payload}`` columns.
    """
    r_types = dict(right.dtypes)
    l_cols = left.columns

    l2 = left.withColumn("__tag", F.lit(1))
    for c in right_payloads:
        l2 = l2.withColumn(f"__r_{c}", F.lit(None).cast(r_types[c]))

    r2 = right.select(
        F.col(key),
        F.col(ts),
        *[F.col(c).alias(f"__r_{c}") for c in right_payloads],
    ).withColumn("__tag", F.lit(0))
    l_types = dict(left.dtypes)
    for c in l_cols:
        if c not in (key, ts):
            r2 = r2.withColumn(c, F.lit(None).cast(l_types[c]))

    cols = [key, ts, "__tag", *[c for c in l_cols if c not in (key, ts)],
            *[f"__r_{c}" for c in right_payloads]]
    u = l2.select(*cols).unionByName(r2.select(*cols))

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *[F.col(c) for c in [key, ts, "__tag", *[c for c in l_cols if c not in (key, ts)]]],
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in right_payloads
        ],
    )
    return carried.filter(F.col("__tag") == 1).drop("__tag")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_payloads: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the right row with the SMALLEST
    ``right.ts >= left.ts`` for the same ``key`` (the forward complement
    of :func:`asof_join_backward` — "next event at or after": next
    purchase after a click, next deploy after a commit).

    Implemented by time reversal: negate both timestamp columns, run the
    backward merge, un-negate.  Inherits the backward operator's scale
    shape (one key exchange, no range explosion) and its tie discipline —
    pre-dedup the right side to one row per (key, ts) for a deterministic
    winner, exactly as with the backward form."""
    l2 = left.withColumn(ts, -F.col(ts))
    r2 = right.withColumn(ts, -F.col(ts))
    out = asof_join_backward(
        l2, r2, key=key, ts=ts, right_payloads=right_payloads, prefix=prefix
    )
    return out.withColumn(ts, -F.col(ts))
