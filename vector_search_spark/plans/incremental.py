"""Incremental view maintenance: keep a materialized aggregate current by
folding in only the new partition, never rescanning history.

At 100 TB the nightly job cannot re-aggregate the full fact table; the
standard contract is: maintain aggregates whose merge is associative +
commutative (counts, integer-cent sums, min/max, sketch registers — the
same algebraic condition the engine's partial-aggregation and sketch
mergeability already rely on), so

    agg(full) == merge(agg(old), agg(delta))

holds exactly.  ``merge_rollup`` implements the merge as a union +
re-aggregate on the group keys — Catalyst partial-aggregates each side, so
the exchange is O(groups), and the old side is the (small) materialized
rollup, not the raw history.

``upsert_parquet`` is the SCD1 companion: key-level last-writer-wins merge
of an updates batch into a snapshot, as a left-anti + union rewrite to a
NEW path (same temp-then-swap discipline as plans/maintenance.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_type_rollup(events: DataFrame) -> DataFrame:
    """The maintained view: (day, event_type) → n_events, value_cents.
    All measures are merge-safe (count + integer-cent sum)."""
    from ..operators.relational import cents

    return (
        events.groupBy(
            F.expr("ts_ns DIV 86400000000000").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("value_cents"),
        )
    )


def merge_rollup(existing: DataFrame, delta_rollup: DataFrame) -> DataFrame:
    """Fold a delta rollup into the materialized rollup: union + one
    partial-agg'd groupBy over O(groups) rows — history is never rescanned."""
    return (
        existing.unionByName(delta_rollup)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


def upsert_parquet(
    snapshot: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """SCD1 last-writer-wins merge: rows of ``snapshot`` whose key appears
    in ``updates`` are replaced.  Anti-join keeps survivors (shuffle on the
    key both sides — co-bucketed tables make it exchange-free), then a
    union appends the updates; write the result to a NEW path and swap."""
    survivors = snapshot.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    return survivors.unionByName(updates)


def apply_cdc(
    snapshot: DataFrame, changes: DataFrame, key_cols: list[str], op_col: str = "op"
) -> DataFrame:
    """Apply a CDC batch (op ∈ {'I','U','D'}, last-writer-wins within the
    batch by ``__seq`` if present) to a snapshot: deletes drop the key,
    inserts/updates replace it.  Same anti-join + union economics as
    ``upsert_parquet`` — one key-exchange each side, history untouched.

    If the batch can contain multiple ops per key, pass a monotonically
    increasing ``__seq`` column; the latest op wins (deterministic
    row_number, never dropDuplicates)."""
    from pyspark.sql import Window

    if "__seq" in changes.columns:
        w = Window.partitionBy(*key_cols).orderBy(F.desc("__seq"))
        changes = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    touched = changes.select(*key_cols).distinct()
    survivors = snapshot.join(touched, key_cols, "left_anti")
    upserts = changes.filter(F.col(op_col) != "D").drop(op_col, "__seq")
    return survivors.unionByName(upserts, allowMissingColumns=True)
