"""Incremental view maintenance: merging per-slice rollups must equal the
full re-aggregate bit-for-bit (merge-safe measures), and the SCD1 upsert
must be key-exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_TEST
from vector_search_spark.plans.incremental import (
    daily_type_rollup,
    merge_rollup,
    upsert_parquet,
)
from vector_search_spark.sources.tables import load_table


def _key(rows):
    return {(r["day"], r["event_type"]): (r["n_events"], r["value_cents"]) for r in rows}


def test_merged_slices_equal_full_rollup(spark):
    ev = load_table(spark, SF_TEST, "events")
    full = _key(daily_type_rollup(ev).collect())

    # three arbitrary ingest slices by event_id residue (any partition works)
    slices = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    acc = daily_type_rollup(slices[0])
    for s in slices[1:]:
        acc = merge_rollup(acc, daily_type_rollup(s))
    got = _key(acc.collect())
    assert len(full) > 0 and got == full


def test_merge_is_order_insensitive(spark):
    ev = load_table(spark, SF_TEST, "events")
    a = daily_type_rollup(ev.filter(F.col("event_id") % 2 == 0))
    b = daily_type_rollup(ev.filter(F.col("event_id") % 2 == 1))
    ab = _key(merge_rollup(a, b).collect())
    ba = _key(merge_rollup(b, a).collect())
    assert ab == ba


def test_upsert_last_writer_wins(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, k string, v long"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 99), (4, "d", 40)], "id long, k string, v long"
    )
    got = {r["id"]: (r["k"], r["v"]) for r in upsert_parquet(snap, updates, ["id"]).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 99), 3: ("c", 30), 4: ("d", 40)}


def test_apply_cdc_insert_update_delete(spark):
    from vector_search_spark.plans.incremental import apply_cdc

    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, k string, v long"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 99, "U", 1),
            (3, None, 0, "D", 1),
            (4, "d", 40, "I", 1),
            (4, "d2", 41, "U", 2),  # same-batch later op wins
        ],
        "id long, k string, v long, op string, __seq long",
    )
    got = {r["id"]: (r["k"], r["v"]) for r in apply_cdc(snap, changes, ["id"]).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 99), 4: ("d2", 41)}


def test_schema_evolution_merge_read(spark, tmp_path):
    """Appending a batch with an added column must stay readable: the union
    of schemas comes back under mergeSchema with NULL backfill — the
    lakehouse schema-evolution contract for long-lived tables."""
    p = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], "id long, k string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9)], "id long, k string, extra long"
    ).write.mode("append").parquet(p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "k", "extra"}
    got = {r["id"]: (r["k"], r["extra"]) for r in df.collect()}
    assert got == {1: ("a", None), 2: ("b", 9)}
