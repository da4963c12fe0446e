"""Unit semantics for the as-of backward join: inclusive ties, no-match
NULLs, per-key isolation — plus a plan check that the merge is one window
over a union (no range join / no cartesian)."""

from __future__ import annotations

from vector_search_spark.operators.asof import asof_join_backward


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_semantics(spark):
    left = _df(
        spark,
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d"), (3, 10, "e")],
        "k long, t long, tag string",
    )
    right = _df(
        spark,
        [(1, 10, 100), (1, 15, 150), (2, 11, 200)],
        "k long, t long, v long",
    )
    out = asof_join_backward(left, right, key="k", ts="t", right_payloads=["v"])
    got = {(r["k"], r["t"]): r["asof_v"] for r in out.collect()}
    assert got == {
        (1, 10): 100,  # tie at t=10 matches (inclusive)
        (1, 20): 150,  # latest right <= 20
        (1, 5): None,  # nothing at or before 5
        (2, 10): None,  # right exists only later (t=11)
        (3, 10): None,  # key absent on the right
    }
    # left columns survive untouched
    assert {r["tag"] for r in out.collect()} == {"a", "b", "c", "d", "e"}


def test_asof_plan_no_range_join(spark):
    left = _df(spark, [(1, 10, "a")], "k long, t long, tag string")
    right = _df(spark, [(1, 9, 1)], "k long, t long, v long")
    out = asof_join_backward(left, right, key="k", ts="t", right_payloads=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
