"""Property-based operator tests (hypothesis): the as-of join, bucketed
interval join, and sketch operators must match brute-force Python oracles
on arbitrary generated inputs — not just the fixture corpus.  Each example
builds tiny DataFrames (Spark's fixed per-job overhead dominates, so
example counts stay small but adversarial: duplicate timestamps, empty
sides, single-key pileups, boundary-equal intervals).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vector_search_spark.operators.asof import asof_join_backward
from vector_search_spark.operators.rangejoin import interval_join

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_key = st.integers(min_value=0, max_value=2)  # few keys → collisions
_ts = st.integers(min_value=0, max_value=50)  # duplicate ts likely


@_settings
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_key, _ts, st.integers(0, 99)), min_size=0, max_size=12),
)
def test_asof_backward_matches_bruteforce(spark, left, right):
    # de-dup right on (key, ts): backward as-of needs a deterministic
    # winner per timestamp; keep the max payload (mirrors operator's
    # last-write-wins ordering on the union sort)
    rbest: dict = {}
    for k, t, v in right:
        rbest[(k, t)] = max(v, rbest.get((k, t), -1))
    right_rows = [(k, t, v) for (k, t), v in rbest.items()]
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, ts long"
    )
    rdf = spark.createDataFrame(right_rows or [(0, -1, 0)], "k long, ts long, v long")
    if not right_rows:
        rdf = rdf.filter("ts >= 0")  # empty right side
    out = {
        r.lid: r.asof_v
        for r in asof_join_backward(ldf, rdf, key="k", ts="ts", right_payloads=["v"]).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt), v in rbest.items() if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert out[i] == want, f"lid={i} key={k} ts={t}: {out[i]} != {want}"


@_settings
@given(
    points=st.lists(st.tuples(_key, _ts), min_size=1, max_size=10),
    ivals=st.lists(st.tuples(_key, _ts, st.integers(0, 30)), min_size=0, max_size=8),
    bucket=st.sampled_from([1, 7, 64]),
)
def test_interval_join_matches_bruteforce(spark, points, ivals, bucket):
    pdf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(points)], "pid long, k long, pts long"
    )
    rows = [(j, k, s, s + d) for j, (k, s, d) in enumerate(ivals)]
    idf = spark.createDataFrame(rows or [(0, 0, 1, 0)], "iid long, k long, s long, e long")
    if not rows:
        idf = idf.filter("e >= s")  # empty interval side
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            pdf, idf, key="k", point_ts="pts", start="s", end="e", bucket_width=bucket
        ).collect()
    }
    want = {
        (i, j)
        for i, (pk, pt) in enumerate(points)
        for j, (ik, s, e) in ((j, (k, s, e)) for j, k, s, e in rows)
        if pk == ik and s <= pt <= e
    }
    assert got == want


@_settings
@given(values=st.lists(st.integers(0, 40), min_size=1, max_size=120))
def test_cms_never_undercounts_any_key(spark, values):
    from vector_search_spark.operators.sketches import cms_counters, cms_estimate

    df = spark.createDataFrame([(v,) for v in values], "v long")
    counters = cms_counters(df, "v")
    est = {
        r.v: r.cms_est
        for r in cms_estimate(counters, df.distinct(), "v").collect()
    }
    from collections import Counter

    exact = Counter(values)
    for v, c in exact.items():
        assert est[v] >= c, f"undercount for {v}: {est[v]} < {c}"
        assert est[v] <= len(values)  # can never exceed total increments


def test_hll_error_within_bound_on_powers_of_two(spark):
    """HLL relative error across two decades of cardinality: the 512-
    register sketch promises ~4.6% standard error; assert a generous 4σ."""
    from vector_search_spark.operators.sketches import hll_distinct

    for n in (100, 1000, 10000):
        df = spark.range(n).selectExpr("'g' AS g", "id AS v")
        est = hll_distinct(df, "g", "v").collect()[0].hll_raw
        rel = abs(est - n) / n
        assert rel < 4 * 1.04 / math.sqrt(512), f"n={n}: rel err {rel:.3f}"


@_settings
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=10),
    right=st.lists(st.tuples(_key, _ts, st.integers(0, 99)), min_size=0, max_size=10),
)
def test_asof_forward_matches_bruteforce(spark, left, right):
    from vector_search_spark.operators.asof import asof_join_forward

    rbest: dict = {}
    for k, t, v in right:
        rbest[(k, t)] = max(v, rbest.get((k, t), -1))
    right_rows = [(k, t, v) for (k, t), v in rbest.items()]
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, ts long"
    )
    rdf = spark.createDataFrame(right_rows or [(0, -1, 0)], "k long, ts long, v long")
    if not right_rows:
        rdf = rdf.filter("ts >= 0")
    out = {
        r.lid: r.asof_v
        for r in asof_join_forward(
            ldf, rdf, key="k", ts="ts", right_payloads=["v"]
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt), v in rbest.items() if rk == k and rt >= t]
        want = min(cands)[1] if cands else None
        assert out[i] == want, f"lid={i} key={k} ts={t}: {out[i]} != {want}"
