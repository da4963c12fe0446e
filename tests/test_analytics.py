"""Invariant tests for the analytics registry (oracle parity is covered by
test_registry's parametrized sweep; these pin semantic properties)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_hll_error_bound(spark):
    """HLL with m=512 has ~4.6% std error; assert a generous 15% envelope
    against the exact distinct count (deterministic: same data, same hash)."""
    from vector_search_spark.registry import QUERIES

    rows = QUERIES["hll_distinct_users"](spark, SF).collect()
    assert rows, "no event types"
    for r in rows:
        assert r.exact_distinct > 0
        rel = abs(r.hll_est - r.exact_distinct) / r.exact_distinct
        assert rel < 0.15, f"{r.event_type}: est {r.hll_est} vs {r.exact_distinct}"


def test_hll_shuffle_is_register_bounded(spark):
    """The register table is at most groups × 512 rows — the property that
    makes the sketch O(1)-shuffle at 100 TB."""
    from vector_search_spark.operators.sketches import HLL_M, hll_registers
    from vector_search_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select("event_type", "user_id")
    regs = hll_registers(ev, "event_type", "user_id")
    n_types = ev.select("event_type").distinct().count()
    assert regs.count() <= n_types * HLL_M


def test_funnel_stage_monotonicity(spark):
    from vector_search_spark.registry import QUERIES

    row = QUERIES["event_funnel"](spark, SF).collect()[0]
    assert (
        row.n_sessions >= row.n_view >= row.n_view_click >= row.n_full_funnel >= 0
    )
    assert 0.0 <= row.click_through <= 1.0
    assert 0.0 <= row.purchase_through <= 1.0


def test_cohort_ltv_marginals(spark):
    """Cohort matrix marginals must reproduce the plain totals: every order
    lands in exactly one (cohort, month) cell, and no order precedes its
    customer's cohort month."""
    from vector_search_spark.registry import QUERIES
    from vector_search_spark.sources.tables import load_table

    cells = QUERIES["cohort_ltv"](spark, SF).collect()
    n_orders = load_table(spark, SF, "orders").count()
    assert sum(c.n_orders for c in cells) == n_orders
    assert all(c.order_month >= c.cohort_month for c in cells)


def test_transitions_are_n_minus_groups(spark):
    """lag drops exactly one row per customer: Σ transitions = orders − customers."""
    from vector_search_spark.registry import QUERIES
    from vector_search_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    rows = QUERIES["order_status_transitions"](spark, SF).collect()
    orders = load_table(spark, SF, "orders")
    n = orders.count()
    k = orders.select("o_custkey").distinct().count()
    assert sum(r.n_transitions for r in rows) == n - k


def test_centroid_outliers_shape(spark):
    """Top-3 per label, distances non-negative and non-increasing per label."""
    from vector_search_spark.registry import QUERIES

    rows = QUERIES["label_centroid_outliers"](spark, SF).collect()
    by_label: dict[int, list[float]] = {}
    for r in rows:
        assert r.dist2 >= 0.0
        by_label.setdefault(r.label, []).append(r.dist2)
    for label, ds in by_label.items():
        assert 1 <= len(ds) <= 3
        assert ds == sorted(ds, reverse=True), f"label {label} not ranked"


def test_maxsim_upper_bound(spark):
    """MaxSim over unit-norm-ish vectors: each of the 4 query terms
    contributes at most max|q||v| ≈ its own self-dot; the label containing
    the query vectors must score at least the sum of self-similarities of
    its own members that are queries (self-match is always available)."""
    from vector_search_spark.registry import QUERIES
    from vector_search_spark.sources.tables import load_table
    import pyspark.sql.functions as F
    from vector_search_spark.functions.vector import dot_product

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 4).select(
        "label", "vec_id", dot_product("embedding", "embedding").alias("selfdot")
    )
    rows = {r.label: r.maxsim for r in QUERIES["maxsim_multivector"](spark, SF).collect()}
    for r in q.collect():
        # the label that owns query vector r gets at least r's self-dot from
        # that query term (floor-rounded), so maxsim >= selfdot - 4*1e-4
        assert rows[r.label] >= r.selfdot - 4e-4


def test_cms_overcount_nonnegative_and_bounded_counters(spark):
    """CMS never undercounts (est >= exact for every probed key), and the
    counter table the estimate joins against is bounded by depth x width
    rows — the whole reason the sketch scales."""
    from vector_search_spark.operators.sketches import (
        CMS_DEPTH, CMS_WIDTH, cms_counters,
    )
    from vector_search_spark.registry import QUERIES
    from vector_search_spark.sources.tables import load_table

    rows = QUERIES["cms_heavy_hitters"](spark, SF).collect()
    assert rows, "heavy hitters query returned nothing"
    for r in rows:
        assert r.overcount >= 0
        assert r.cms_est >= r.exact_cnt
    ev = load_table(spark, SF, "events").select("user_id")
    assert cms_counters(ev, "user_id").count() <= CMS_DEPTH * CMS_WIDTH


def test_retention_matrix_invariants(spark):
    """Week-0 retention is exactly 1.0 (a cohort is active the week it is
    born, by definition of first-seen), every fraction is in (0, 1], and
    n_active never exceeds cohort_size."""
    from vector_search_spark.registry import QUERIES

    rows = QUERIES["user_retention_cohorts"](spark, SF).collect()
    assert rows
    seen_zero = set()
    for r in rows:
        assert 0 < r.retention_frac <= 1.0
        assert r.n_active <= r.cohort_size
        assert r.week_offset >= 0
        if r.week_offset == 0:
            assert r.n_active == r.cohort_size
            seen_zero.add(r.cohort_week)
    # every cohort appears at offset 0
    assert seen_zero == {r.cohort_week for r in rows}


def test_hdr_quantile_sketch_bounds(spark):
    """The HDR bucket estimate is a lower bound on the true order
    statistic, within the 2^-4 relative-error guarantee of 5 kept
    significant bits (bucket width = lb * 2^-4) (plus the sub-cent floor for tiny values)."""
    from vector_search_spark.registry import QUERIES

    rows = QUERIES["value_quantile_sketch"](spark, SF).collect()
    assert len(rows) >= 9  # >= 3 types x 3 quantiles
    for r in rows:
        assert r.sketch_value <= r.exact_value
        assert r.exact_value < r.sketch_value * (1 + 2 ** -4) + 0.01, (
            f"{r.event_type} {r.quantile}: {r.sketch_value} vs {r.exact_value}"
        )


def test_sketches_are_mergeable(spark):
    """sketch(A ∪ B) must equal merge(sketch(A), sketch(B)) — the property
    that lets sketches serve as partial-aggregate / streaming / rollup
    state.  HLL merges by register max, CMS by counter sum, HDR by bucket
    count sum; all three must be EXACTLY the union sketch, not
    approximately."""
    import pyspark.sql.functions as F
    from vector_search_spark.operators.sketches import (
        cms_counters, hdr_quantile_sketch, hll_registers,
    )
    from vector_search_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select(
        "event_type", "user_id",
        F.floor(F.col("value").cast("double") * 100.0 + F.lit(0.5))
        .cast("long").alias("c"),
    )
    a, b = ev.filter("event_id IS NULL OR TRUE").filter("user_id % 2 = 0"), ev.filter("user_id % 2 = 1")

    # HLL: merge = per-(group, bucket) max of registers
    whole = {(r.event_type, r.bucket): r.m_reg
             for r in hll_registers(ev, "event_type", "user_id").collect()}
    ra = hll_registers(a, "event_type", "user_id").collect()
    rb = hll_registers(b, "event_type", "user_id").collect()
    merged: dict = {}
    for r in [*ra, *rb]:
        k = (r.event_type, r.bucket)
        merged[k] = max(r.m_reg, merged.get(k, 0))
    assert merged == whole

    # CMS: merge = per-(j, bucket) sum of counters
    wholec = {(r.j, r.bucket): r.cnt for r in cms_counters(ev, "user_id").collect()}
    mergedc: dict = {}
    for r in [*cms_counters(a, "user_id").collect(), *cms_counters(b, "user_id").collect()]:
        mergedc[(r.j, r.bucket)] = mergedc.get((r.j, r.bucket), 0) + r.cnt
    assert mergedc == wholec

    # HDR: merging bucket counts then extracting quantiles == whole-input
    # extraction (counts are additive; extraction is a pure fold of counts)
    whole_q = {(r.event_type, r.p): r.est_cents
               for r in hdr_quantile_sketch(ev, "event_type", "c", ps=[50, 95]).collect()}
    union_q = {(r.event_type, r.p): r.est_cents
               for r in hdr_quantile_sketch(a.unionAll(b), "event_type", "c", ps=[50, 95]).collect()}
    assert whole_q == union_q
