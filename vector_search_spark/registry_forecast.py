"""Registry entries: seasonal-state smoothing (the Holt–Winters gap).

`ses_revenue_forecast` (level) and `brown_trend_forecast` (level+trend)
closed the smoothing family except for SEASONAL state — the one
time-series gap VERDICT r4/r5 left open.  The fully-coupled additive
Holt–Winters recurrences (level ℓ, trend b, seasonal s with period 7)
are inherently sequential: ℓ_t needs s_{t−7} which needs ℓ_{t−7} — no
bounded-depth DAG computes them without a T-step unroll, and a T-step
unroll is exactly the anti-pattern the dyadic-SES algebra exists to
avoid.  What ships here is the standard DECOUPLED estimator of the same
three states (the classical two-stage seasonal decomposition used to
initialize HW itself, e.g. Hyndman & Athanasopoulos FPP §3.4 / §8.3):

1. level+trend pinned to the exact OLS line over the day index
   (closed-form integer sufficient statistics — the `ols_daily_trend`
   machinery);
2. per-day-of-week SEASONAL STATE via dyadic (γ = 1/2) exponential
   smoothing over that weekday's OLS residual subseries — i.e. the
   true Holt–Winters seasonal recurrence s_dow ← γ·resid + (1−γ)·s_dow
   run to its closed weighted-sum form per dow (`ses_revenue_forecast`'s
   algebra applied 7 times, the "bounded unroll over the 7 dow states"
   HANDOFF sketched);
3. forecast(T+1) = OLS fit at T+1 + seasonal state of T+1's weekday.

The docstring honesty matters: this is Holt–Winters' seasonal SMOOTHING
with the level/trend coupling replaced by the global fit — the variant
that exists as a distributed query.  The coupled recurrences stay out of
scope by design, recorded in HANDOFF.

Exactness discipline (house rules): integer cents; OLS numerators /
denominator as DECIMAL(38,0)/HUGEINT; residuals micro-quantized through
an ENGINE-EXACT wide floor division (a − mod(a, d) is divisible by d, so
DuckDB's flooring `//` and Spark's truncating `DIV` agree on it — both
sides stay in integer arithmetic, never the float-divide shortcut);
per-term floor(resid_micro / 2^e) with the shared `_fdiv` text (residuals
go negative); terms with e > 40 defined out of the statistic exactly as
SES does.  Every emitted float is one division + 4 dp floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register
from .registry_round5 import _fdiv
from .sources.tables import load_table as __load

HW_MAX_E = 40  # same truncation as SES/Brown: weight < 2^-40 is defined out


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return __load(spark, sf_dir, name)


def _wfdiv_spark(a: str, b: str) -> str:
    """Exact floor division for wide (DECIMAL(38,0)) operands, Spark text.

    ``a − pmod(a, b)`` is divisible by ``b`` (b > 0), so Spark's
    truncating decimal ``DIV`` returns the exact floor quotient — no
    double-precision round-trip (the `_fdiv` float-divide trick is only
    exact below 2^53; OLS-scaled numerators exceed that)."""
    return f"CAST((({a}) - pmod(({a}), ({b}))) DIV ({b}) AS BIGINT)"


def _wfdiv_duck(a: str, b: str) -> str:
    """The DuckDB twin: HUGEINT `//` floors, and on the mod-adjusted
    (divisible) numerator floor == truncate == the exact quotient —
    value-identical to `_wfdiv_spark` by construction."""
    return f"((({a}) - (((({a}) % ({b})) + ({b})) % ({b}))) // ({b}))::BIGINT"


# e(j): SES exponent for the j-th (0-based, time-ordered) observation of a
# dow subseries with n_d observations — boundary term j=0 carries s0 = x0.
_HW_E = "(CASE WHEN j = 0 THEN n_d - 1 ELSE n_d - j END)"
_HW_TERM = (
    f"CASE WHEN {_HW_E} <= {HW_MAX_E} THEN "
    + _fdiv("r_micro", f"CAST(power(2.0, {_HW_E}) AS BIGINT)")
    + " ELSE 0 END"
)
_HW_4DP = "floor(((CAST({v} AS DOUBLE)/1000000.0)/100.0)*10000 + 0.5)/10000.0"


@register(
    "holt_winters_dow_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(floor(value*100 + 0.5)::BIGINT)::BIGINT AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    idx AS (
      SELECT day, cents,
             (day - (SELECT min(day) FROM daily))::BIGINT AS t,
             CAST(dayofweek(day) AS BIGINT) % 7 AS dow
      FROM daily),
    st AS (
      SELECT count(*)::HUGEINT AS n, sum(t)::HUGEINT AS s_t,
             sum(cents)::HUGEINT AS s_y,
             sum(t::HUGEINT * t)::HUGEINT AS s_tt,
             sum(t::HUGEINT * cents)::HUGEINT AS s_ty,
             max(t)::BIGINT AS tmax, min(day) AS d0
      FROM idx),
    fit AS (
      SELECT CASE WHEN n*s_tt - s_t*s_t = 0 THEN 1::HUGEINT
                  ELSE n*s_tt - s_t*s_t END AS den,
             (n*s_ty - s_t*s_y)::HUGEINT AS num_b,
             (s_y*s_tt - s_t*s_ty)::HUGEINT AS num_a,
             tmax, d0
      FROM st),
    resid AS (
      SELECT i.dow, i.t,
             (i.cents::HUGEINT * 1000000
              - {_wfdiv_duck('(f.num_a + f.num_b * i.t) * 1000000', 'f.den')}
             )::BIGINT AS r_micro
      FROM idx i CROSS JOIN fit f),
    ranked AS (
      SELECT dow, r_micro,
             (row_number() OVER (PARTITION BY dow ORDER BY t) - 1)::BIGINT AS j,
             (count(*) OVER (PARTITION BY dow))::BIGINT AS n_d
      FROM resid),
    seas AS (
      SELECT dow, count(*)::BIGINT AS n_obs,
             sum({_HW_TERM})::BIGINT AS s_micro
      FROM ranked GROUP BY dow),
    nxt AS (
      SELECT CAST(dayofweek(f.d0 + CAST(f.tmax + 1 AS INTEGER)) AS BIGINT) % 7
               AS next_day_dow,
             {_wfdiv_duck('(f.num_a + f.num_b * (f.tmax + 1)) * 1000000',
                          'f.den')} AS fit_star_micro,
             {_wfdiv_duck('f.num_b * 1000000', 'f.den')} AS slope_micro
      FROM fit f),
    fc AS (
      SELECT n.next_day_dow, n.slope_micro,
             (n.fit_star_micro + COALESCE(s.s_micro, 0))::BIGINT
               AS forecast_micro
      FROM nxt n LEFT JOIN seas s ON s.dow = n.next_day_dow)
    SELECT s.dow, s.n_obs,
           {_HW_4DP.format(v='s.s_micro')} AS seasonal_state,
           {_HW_4DP.format(v='f.slope_micro')} AS trend_slope_per_day,
           f.next_day_dow,
           {_HW_4DP.format(v='f.forecast_micro')} AS next_day_forecast
    FROM seas s CROSS JOIN fc f
    ORDER BY s.dow
    """,
)
def q_holt_winters_dow_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters-style additive SEASONAL state over daily purchase
    revenue (period 7, Sunday-0 dow keys): exact OLS level+trend, dyadic
    (γ = 1/2) exponential smoothing of each weekday's detrended residual
    subseries as that weekday's seasonal state, and the one-step forecast
    fit(T+1) + s(dow(T+1)).  Emits one row per observed weekday with the
    shared trend/forecast columns on each row (the `dow_chi_square`
    emission shape).  See the module docstring for why the COUPLED HW
    recurrences are out of scope and what this decoupled estimator is.

    Exactness: the OLS fit never leaves integers — fit_micro(t) =
    floor((num_a + num_b·t)·10⁶ / den) via an engine-exact wide floor
    division (mod-adjust then divide: DuckDB `//` floors, Spark `DIV`
    truncates, and on the divisible numerator they coincide — the
    float-divide `_fdiv` trick would lose bits past 2^53 here); residual
    micro-cents are exact BIGINTs; per-term floors reuse `_fdiv` (terms
    go negative); e > {HW_MAX_E} terms are defined out (weight < 2^−40).
    The pure-Python gate rebuilds every integer and pins the distance to
    the true Fraction-exact seasonal recurrence.

    Bounds disclosed: micro-cents must fit BIGINT ⇒ max daily revenue
    < ~$9.2e10; the OLS cross-products stay inside DECIMAL(38,0)/HUGEINT
    to ~3e4 days × ~1e13 cents/day.

    Scale: one partial-agg'd corpus scan to the checkpointed day table;
    everything downstream (stats fold, residual join, 7-partition window,
    7-row seasonal aggregate, 1-row forecast) is day-table-sized.  Same
    rebuild-after-every-load cost as SES/Brown — the scan.
    """
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
        # the day table fans out to the min-day probe, the OLS stats fold
        # and the residual join — checkpoint it (house rule) so the
        # events scan runs exactly once
        .localCheckpoint(eager=True)
    )
    d0 = daily.agg(F.min("day").alias("d0"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        "cents",
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("t"),
        ((F.dayofweek(F.col("day")).cast("long") - 1) % 7).alias("dow"),
        "d0",
    )
    st = idx.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("t").cast("decimal(38,0)").alias("s_t"),
        F.sum("cents").cast("decimal(38,0)").alias("s_y"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t")).cast("decimal(38,0)").alias("s_tt"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * cents"))
        .cast("decimal(38,0)")
        .alias("s_ty"),
        F.max("t").cast("long").alias("tmax"),
        F.min("d0").alias("d0"),
    )
    fit = st.select(
        F.expr(
            "CASE WHEN n*s_tt - s_t*s_t = 0 THEN CAST(1 AS DECIMAL(38,0))"
            " ELSE CAST(n*s_tt - s_t*s_t AS DECIMAL(38,0)) END"
        ).alias("den"),
        F.expr("CAST(n*s_ty - s_t*s_y AS DECIMAL(38,0))").alias("num_b"),
        F.expr("CAST(s_y*s_tt - s_t*s_ty AS DECIMAL(38,0))").alias("num_a"),
        "tmax",
        "d0",
    )
    resid = idx.crossJoin(F.broadcast(fit)).select(
        "dow",
        "t",
        F.expr(
            "CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 - "
            + _wfdiv_spark("(num_a + num_b * t) * 1000000", "den")
            + " AS BIGINT)"
        ).alias("r_micro"),
    )
    wdow = Window.partitionBy("dow").orderBy("t")
    ranked = resid.select(
        "dow",
        "r_micro",
        (F.row_number().over(wdow) - 1).cast("long").alias("j"),
        F.count(F.lit(1)).over(Window.partitionBy("dow")).cast("long").alias("n_d"),
    )
    seas = ranked.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.expr(_HW_TERM)).cast("long").alias("s_micro"),
    )
    nxt = fit.select(
        F.expr(
            "(CAST(dayofweek(date_add(d0, CAST(tmax + 1 AS INT))) AS BIGINT) - 1) % 7"
        ).alias("next_day_dow"),
        F.expr(
            _wfdiv_spark("(num_a + num_b * (tmax + 1)) * 1000000", "den")
        ).alias("fit_star_micro"),
        F.expr(_wfdiv_spark("num_b * 1000000", "den")).alias("slope_micro"),
    )
    fc = (
        nxt.join(
            F.broadcast(
                seas.select(
                    F.col("dow").alias("next_day_dow"),
                    F.col("s_micro").alias("s_star"),
                )
            ),
            "next_day_dow",
            "left",
        )
        .select(
            "next_day_dow",
            "slope_micro",
            F.expr("CAST(fit_star_micro + COALESCE(s_star, 0) AS BIGINT)").alias(
                "forecast_micro"
            ),
        )
    )
    return (
        seas.crossJoin(F.broadcast(fc))
        .select(
            "dow",
            "n_obs",
            F.expr(
                f"CAST({_HW_4DP.format(v='s_micro')} AS DOUBLE)"
            ).alias("seasonal_state"),
            F.expr(
                f"CAST({_HW_4DP.format(v='slope_micro')} AS DOUBLE)"
            ).alias("trend_slope_per_day"),
            F.col("next_day_dow").cast("long").alias("next_day_dow"),
            F.expr(
                f"CAST({_HW_4DP.format(v='forecast_micro')} AS DOUBLE)"
            ).alias("next_day_forecast"),
        )
        .orderBy("dow")
    )
