"""Unit semantics for the bucketed interval join: inclusive bounds,
intervals spanning many buckets, per-key isolation, exactly-once pairing —
and the plan stays an equi-join (never a nested-loop theta join)."""

from __future__ import annotations

from vector_search_spark.operators.rangejoin import interval_join


def test_interval_join_semantics(spark):
    points = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 21, "c"), (2, 15, "d")],
        "k long, t long, tag string",
    )
    intervals = spark.createDataFrame(
        [(1, 10, 20, "i1"), (1, 0, 100, "i2"), (2, 16, 30, "i3")],
        "k long, s long, e long, iname string",
    )
    out = interval_join(points, intervals, key="k", point_ts="t",
                        start="s", end="e", bucket_width=7)
    pairs = sorted((r["tag"], r["iname"]) for r in out.collect())
    assert pairs == [
        ("a", "i1"),  # t=10 == start: inclusive
        ("a", "i2"),
        ("b", "i1"),  # t=20 == end: inclusive
        ("b", "i2"),
        ("c", "i2"),  # t=21 just outside i1
        # d (k=2, t=15) not in i3 (starts 16); never crosses keys
    ]


def test_interval_join_exactly_once_across_buckets(spark):
    # interval spans many buckets; each qualifying point matches ONCE
    points = spark.createDataFrame([(1, 55, "p")], "k long, t long, tag string")
    intervals = spark.createDataFrame([(1, 0, 1000, "wide")], "k long, s long, e long, iname string")
    out = interval_join(points, intervals, key="k", point_ts="t",
                        start="s", end="e", bucket_width=10)
    assert out.count() == 1


def test_interval_join_plan_is_equijoin(spark):
    points = spark.createDataFrame([(1, 5, "p")], "k long, t long, tag string")
    intervals = spark.createDataFrame([(1, 0, 9, "i")], "k long, s long, e long, iname string")
    out = interval_join(points, intervals, key="k", point_ts="t",
                        start="s", end="e", bucket_width=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
