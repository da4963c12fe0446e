"""Gates for the Holt–Winters dow seasonal-state query: pure-Python
integer rebuild (bit identity with the Spark/DuckDB statistic) and the
Fraction-exact distance to the TRUE seasonal recurrence the dyadic
weighted sum closes over."""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest
from conftest import SF_TEST, compare_with_oracle

from vector_search_spark import registry

NAME = "holt_winters_dow_forecast"
HW_MAX_E = 40


def _daily(sf_dir: str):
    rows = duckdb.sql(
        f"""
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS cents
        FROM '{sf_dir}/events.parquet'
        WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    d0 = rows[0][0]
    return d0, [((r[0] - d0).days, int(r[1]), r[0].weekday()) for r in rows]


def _python_rebuild(sf_dir: str):
    """Exact-integer recomputation of every emitted statistic."""
    d0, series = _daily(sf_dir)
    # python weekday(): Monday=0; house keys are Sunday=0 -> shift
    series = [(t, y, (wd + 1) % 7) for t, y, wd in series]
    n = len(series)
    st = sum(t for t, _, _ in series)
    sy = sum(y for _, y, _ in series)
    stt = sum(t * t for t, _, _ in series)
    sty = sum(t * y for t, y, _ in series)
    den = n * stt - st * st or 1
    num_b = n * sty - st * sy
    num_a = sy * stt - st * sty

    def fit_micro(t: int) -> int:
        return ((num_a + num_b * t) * 1_000_000) // den

    resid = [(t, y * 1_000_000 - fit_micro(t), dow) for t, y, dow in series]
    by_dow: dict[int, list[int]] = {}
    for t, r, dow in sorted(resid):
        by_dow.setdefault(dow, []).append(r)
    seas = {}
    for dow, rs in by_dow.items():
        n_d = len(rs)
        s = 0
        for j, r in enumerate(rs):
            e = n_d - 1 if j == 0 else n_d - j
            if e <= HW_MAX_E:
                # floor division == the engines' mod-adjusted term
                s += r // (1 << e)
        seas[dow] = (n_d, s)
    tmax = series[-1][0]
    # next day's Sunday-0 dow
    import datetime

    nxt_dow = ((d0 + datetime.timedelta(days=tmax + 1)).weekday() + 1) % 7
    slope_micro = (num_b * 1_000_000) // den
    forecast_micro = fit_micro(tmax + 1) + seas.get(nxt_dow, (0, 0))[1]
    return seas, slope_micro, nxt_dow, forecast_micro, by_dow, den, num_a, num_b


def _4dp(micro: int) -> float:
    import math

    return math.floor(((micro / 1_000_000.0) / 100.0) * 10000 + 0.5) / 10000.0


def test_holt_winters_matches_oracle(spark):
    df = registry.QUERIES[NAME](spark, SF_TEST)
    compare_with_oracle(df, registry.ORACLES[NAME], SF_TEST)


def test_holt_winters_python_rebuild(spark):
    seas, slope_micro, nxt_dow, forecast_micro, _, _, _, _ = _python_rebuild(SF_TEST)
    rows = {r["dow"]: r for r in registry.QUERIES[NAME](spark, SF_TEST).collect()}
    assert set(rows) == set(seas)
    for dow, (n_d, s_micro) in seas.items():
        r = rows[dow]
        assert r["n_obs"] == n_d
        assert r["seasonal_state"] == pytest.approx(_4dp(s_micro), abs=0)
        assert r["trend_slope_per_day"] == pytest.approx(_4dp(slope_micro), abs=0)
        assert r["next_day_dow"] == nxt_dow
        assert r["next_day_forecast"] == pytest.approx(_4dp(forecast_micro), abs=0)


def test_holt_winters_seasonal_recurrence_distance():
    """The dyadic weighted sum IS the γ=1/2 seasonal recurrence
    s ← γ·resid + (1−γ)·s (init s = first resid) run over each weekday's
    residual subseries: the Fraction-exact recurrence fixed point must sit
    within (#terms) micro-units (per-term floor) + 2^-40·max|resid|
    (truncation) of the integer statistic."""
    seas, _, _, _, by_dow, den, num_a, num_b = _python_rebuild(SF_TEST)
    for dow, rs in by_dow.items():
        s = Fraction(rs[0])
        for r in rs[1:]:
            s = Fraction(1, 2) * r + Fraction(1, 2) * s
        exact = float(s)
        got = seas[dow][1]
        bound = len(rs) + 2 ** -HW_MAX_E * max(abs(r) for r in rs) + 1
        assert abs(got - exact) <= bound, (dow, got, exact, bound)


def test_holt_winters_runs_at_smoke_sf(spark):
    rows = registry.QUERIES[NAME](spark, "/root/testdata/sf0.001").collect()
    # every emitted row carries the same shared forecast columns
    assert len({(r["next_day_dow"], r["next_day_forecast"]) for r in rows}) <= 1


def test_streaming_day_cells_reproduce_hw_and_jackknife(spark):
    """The drained streaming day cells (cents + order counts) must
    reproduce BOTH the Holt–Winters seasonal states and the jackknife
    AOV standard error bit-for-bit — the whole daily forecasting /
    uncertainty family runs continuously off one streaming state."""
    import datetime
    import math

    from vector_search_spark.streaming.events import (
        stream_events_from_parquet,
        streaming_daily_revenue_cells,
    )

    out = streaming_daily_revenue_cells(stream_events_from_parquet(spark, SF_TEST))
    q = (
        out.writeStream.format("memory")
        .queryName("hw_day_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = sorted(
        (r.day, int(r.cents), int(r.n_orders))
        for r in spark.sql("SELECT day, cents, n_orders FROM hw_day_cells").collect()
    )

    # --- Holt–Winters seasonal states from the drained series ---
    d0 = drained[0][0]
    series = [((d - d0).days, c, (d.weekday() + 1) % 7) for d, c, _ in drained]
    n = len(series)
    st = sum(t for t, _, _ in series)
    sy = sum(y for _, y, _ in series)
    stt = sum(t * t for t, _, _ in series)
    sty = sum(t * y for t, y, _ in series)
    den = n * stt - st * st or 1
    num_b = n * sty - st * sy
    num_a = sy * stt - st * sty
    by_dow: dict[int, list[int]] = {}
    for t, y, dow in series:
        r = y * 1_000_000 - ((num_a + num_b * t) * 1_000_000) // den
        by_dow.setdefault(dow, []).append(r)
    rows = {r["dow"]: r for r in registry.QUERIES[NAME](spark, SF_TEST).collect()}
    for dow, rs in by_dow.items():
        n_d = len(rs)
        s = 0
        for j, r in enumerate(rs):
            e = n_d - 1 if j == 0 else n_d - j
            if e <= HW_MAX_E:
                s += r // (1 << e)
        assert rows[dow]["seasonal_state"] == _4dp(s)

    # --- jackknife AOV SE from the same drained cells ---
    xs = [c for _, c, _ in drained]
    ns = [o for _, _, o in drained]
    X, N, D = sum(xs), sum(ns), len(xs)
    th = [
        ((X - x) * 1_000_000_000) // (N - o) if (N - o) else 0
        for x, o in zip(xs, ns)
    ]
    S = sum(th)
    var_scaled = sum((D * t - S) ** 2 for t in th)
    se = math.sqrt((D - 1) / D * (var_scaled / (D**3 * 1e18))) / 100.0
    jk = registry.QUERIES["jackknife_aov_se"](spark, SF_TEST).collect()[0]
    assert jk["jackknife_se"] == math.floor(se * 10000 + 0.5) / 10000.0
    assert jk["aov"] == math.floor(((X / N) / 100.0) * 10000 + 0.5) / 10000.0
