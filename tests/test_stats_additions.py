"""Gates for the round-6 additions beyond Holt–Winters: HLL register-merge
rollup, leave-one-day-out jackknife SE, and empirical-Bayes rate
shrinkage — each with a pure-Python exact rebuild beside the DuckDB
oracle the registry suite already enforces."""

from __future__ import annotations

import math

import duckdb
import pytest
from conftest import SF_TEST, compare_with_oracle

from vector_search_spark import registry


def _4dp(v: float) -> float:
    return math.floor(v * 10000 + 0.5) / 10000.0


@pytest.mark.parametrize(
    "name", ["hll_rollup_users", "jackknife_aov_se", "eb_shrunk_hour_rates"]
)
def test_new_queries_match_oracle(spark, name):
    compare_with_oracle(
        registry.QUERIES[name](spark, SF_TEST), registry.ORACLES[name], SF_TEST
    )


def test_hll_rollup_merge_is_union(spark):
    """The merged 'ALL' registers must equal the registers of the union
    stream — i.e. the ALL estimate must EXACTLY equal what
    hll_distinct would report on the ungrouped corpus."""
    from pyspark.sql import functions as F

    from vector_search_spark.operators.sketches import hll_distinct
    from vector_search_spark.sources.tables import load_table

    rows = {
        r["event_type"]: r
        for r in registry.QUERIES["hll_rollup_users"](spark, SF_TEST).collect()
    }
    ev = (
        load_table(spark, SF_TEST, "events")
        .select(F.lit("ALL").alias("g"), "user_id")
    )
    direct = hll_distinct(ev, "g", "user_id").collect()[0]["hll_raw"]
    assert rows["ALL"]["hll_est"] == _4dp(direct)
    # sketch quality: within 5% of exact on every row (p=9 -> ~4.6% rse)
    for r in rows.values():
        assert abs(r["hll_est"] - r["exact_distinct"]) <= 0.05 * r["exact_distinct"]


def test_jackknife_python_rebuild(spark):
    days = duckdb.sql(
        f"""
        SELECT CAST(ts AS DATE) AS d,
               sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS x,
               count(*) AS n
        FROM '{SF_TEST}/events.parquet'
        WHERE event_type = 'purchase' GROUP BY 1
        """
    ).fetchall()
    xs = [int(r[1]) for r in days]
    ns = [int(r[2]) for r in days]
    X, N, D = sum(xs), sum(ns), len(xs)
    th = [
        ((X - x) * 1_000_000_000) // (N - n) if (N - n) else 0
        for x, n in zip(xs, ns)
    ]
    S = sum(th)
    var_scaled = sum((D * t - S) ** 2 for t in th)
    se = math.sqrt((D - 1) / D * (var_scaled / (D**3 * 1e18))) / 100.0
    row = registry.QUERIES["jackknife_aov_se"](spark, SF_TEST).collect()[0]
    assert row["n_days"] == D and row["n_orders"] == N
    assert row["aov"] == _4dp((X / N) / 100.0)
    assert row["jackknife_se"] == _4dp(se)
    # sanity: the day-clustered SE of a stable AOV is small but non-zero
    assert 0 < row["jackknife_se"] < row["aov"]


def test_eb_shrinkage_python_rebuild(spark):
    cells = duckdb.sql(
        f"""
        SELECT hour(ts) AS h, count(*) AS n,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
        FROM '{SF_TEST}/events.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    pn = [(int(h), int(n), int(x), (int(x) * 1_000_000_000) // int(n)) for h, n, x in cells]
    G = len(pn)
    S = sum(p for _, _, _, p in pn)
    var_scaled = sum((G * p - S) ** 2 for _, _, _, p in pn)
    pbar = S / (G * 1e9)
    varp = var_scaled / (G**3 * 1e18)
    ab = pbar * (1 - pbar) / varp - 1.0 if varp > 0 and 0 < pbar < 1 else 0.0
    ab = max(ab, 0.0)
    rows = {r["hour"]: r for r in registry.QUERIES["eb_shrunk_hour_rates"](spark, SF_TEST).collect()}
    assert set(rows) == {h for h, _, _, _ in pn}
    for h, n, x, _ in pn:
        r = rows[h]
        assert r["shrunk_rate"] == _4dp((x + pbar * ab) / (n + ab))
        assert r["shrink_weight"] == _4dp(ab / (n + ab))
        # shrinkage moves every raw rate TOWARD the pooled mean
        raw, shrunk = x / n, (x + pbar * ab) / (n + ab)
        assert abs(shrunk - pbar) <= abs(raw - pbar) + 1e-12


@pytest.mark.parametrize(
    "name",
    ["negative_sampling_table", "jl_projection_distortion", "wilson_lcb_hour_ranking"],
)
def test_round6b_queries_match_oracle(spark, name):
    compare_with_oracle(
        registry.QUERIES[name](spark, SF_TEST), registry.ORACLES[name], SF_TEST
    )


def test_negative_sampling_python_rebuild(spark):
    """Weights must equal floor(1e6·sqrt(sqrt(c³))) of the exact token
    counts; CDF ranges must tile [0, Σw) without gaps in (count DESC,
    token) order; probabilities must sum to ~1."""
    counts = dict(
        duckdb.sql(
            f"""
            SELECT tok, count(*) FROM (
              SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
              FROM '{SF_TEST}/documents.parquet' WHERE trim(text) != '') GROUP BY 1
            """
        ).fetchall()
    )
    rows = registry.QUERIES["negative_sampling_table"](spark, SF_TEST).collect()
    assert rows, "empty sampling table"
    cursor = 0
    for r in rows:  # already ordered by (cnt DESC, tok)
        c = counts[r["tok"]]
        assert r["cnt"] == c
        w = math.floor(math.sqrt(math.sqrt(float(c) * float(c) * float(c))) * 1e6 + 0.5)
        assert r["w_micro"] == w
        assert r["cum_lo"] == cursor and r["cum_hi"] == cursor + w
        cursor += w
    assert abs(sum(r["prob"] for r in rows) - 1.0) < 1e-2
    # the 3/4 power damps the head: max weight share < max count share
    tot_c, tot_w = sum(r["cnt"] for r in rows), sum(r["w_micro"] for r in rows)
    assert rows[0]["w_micro"] / tot_w < rows[0]["cnt"] / tot_c


def test_jl_distortion_concentrates(spark):
    row = registry.QUERIES["jl_projection_distortion"](spark, SF_TEST).collect()[0]
    assert row["n_pairs"] == 1225
    # JL mean ratio is an unbiased estimator of 1
    assert 0.9 <= row["mean_ratio"] <= 1.1
    assert row["min_ratio"] <= row["mean_ratio"] <= row["max_ratio"]
    assert row["min_ratio"] > 0.0


def test_wilson_lcb_properties(spark):
    rows = registry.QUERIES["wilson_lcb_hour_ranking"](spark, SF_TEST).collect()
    assert len(rows) == 24
    assert [r["rank"] for r in rows] == list(range(1, 25))
    lcbs = [r["wilson_lcb"] for r in rows]
    assert lcbs == sorted(lcbs, reverse=True)
    for r in rows:
        # the lower bound is strictly below the raw rate for 0 < x < n
        if 0 < r["x"] < r["n"]:
            assert r["wilson_lcb"] < r["raw_rate"]
        # python rebuild of the shared-text bound
        p, n, z = r["x"] / r["n"], r["n"], 1.96
        lcb = (p + z*z/(2*n) - z*math.sqrt((p*(1-p) + z*z/(4*n))/n)) / (1 + z*z/n)
        assert r["wilson_lcb"] == math.floor(math.floor(lcb*1e9 + 0.5)/1e9*10000 + 0.5)/10000.0


def test_negative_sampling_draws_gates(spark):
    compare_with_oracle(
        registry.QUERIES["negative_sampling_draws"](spark, SF_TEST),
        registry.ORACLES["negative_sampling_draws"],
        SF_TEST,
    )
    rows = registry.QUERIES["negative_sampling_draws"](spark, SF_TEST).collect()
    # the CDF tiles [0, total): every draw lands exactly once
    assert sum(r["n_drawn"] for r in rows) == 10_000
    # draw counts concentrate: every token within 6 sigma of expectation
    for r in rows:
        sd = math.sqrt(max(r["expected_n"], 1.0))
        assert abs(r["n_drawn"] - r["expected_n"]) <= 6 * sd, tuple(r)


@pytest.mark.parametrize("name", ["lsh_blocking_quality", "mutual_knn_pairs"])
def test_dedup_eval_queries_match_oracle(spark, name):
    compare_with_oracle(
        registry.QUERIES[name](spark, SF_TEST), registry.ORACLES[name], SF_TEST
    )


def test_lsh_blocking_quality_properties(spark):
    r = registry.QUERIES["lsh_blocking_quality"](spark, SF_TEST).collect()[0]
    assert r["n_all_pairs"] == r["n_docs"] * (r["n_docs"] - 1) // 2
    assert 0 <= r["n_caught"] <= min(r["n_true"], r["n_candidates"])
    assert 0.0 <= r["pair_completeness"] <= 1.0
    # blocking must actually block: >99% of the pair square pruned
    assert r["reduction_ratio"] > 0.99
    # the fixture's exact-dup pairs are jaccard-1: the bands MUST catch them
    assert r["pair_completeness"] == 1.0


def test_mutual_knn_is_symmetric_subset(spark):
    rows = registry.QUERIES["mutual_knn_pairs"](spark, SF_TEST).collect()
    assert rows, "mutual pairs exist on the fixture"
    for r in rows:
        assert r["id_1"] < r["id_2"]
        assert 1 <= r["rank_12"] <= 5 and 1 <= r["rank_21"] <= 5
