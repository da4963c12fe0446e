"""Round-5 registry additions: graph communities + monotone-trend audit.

New families on top of the round-4 surface (HANDOFF round-5 candidates:
community structure on the dup graph; more nonparametric monitoring):

- ``dup_label_propagation`` — synchronous label-propagation communities
  over the verified near-duplicate graph (4 deterministic rounds,
  majority label, lowest-label ties).
- ``dup_eigencentrality``   — eigenvector centrality by integer power
  iteration with uniform integer renormalization (6 rounds).
- ``mann_kendall_daily``    — Mann–Kendall monotone-trend test (with tie
  correction) on daily purchase revenue, beside ``theil_sen_daily_trend``
  and ``runs_test_daily`` on the same series.
- ``gbdt_residual_stumps``  — two boosting rounds of least-squares
  decision stumps on lineitem price (the GBDT training step, histogram
  algorithm), integer residuals throughout.

House invariants throughout: integer-only iteration state, shared SQL
expression text for every emitted float, ``round4`` on emitted floats,
``::BIGINT`` on DuckDB integer aggregates, NULL-free outputs, id
tie-breaks.  The reference (p1va/3-2-1-vector-search) has no graph or
monitoring surface (SURVEY.md §2.6); these extend the north-star
training-data-pipeline families (dup-graph remediation: registry_dedup's
pagerank/k-core/triangles; drift monitoring: registry_ml's KS/CUSUM/runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register
from .registry_dedup import (
    NUM_HASHES,
    _SQL_BAND_KEYS,
    _SQL_CAND,
    _SQL_SHINGLES,
    _SQL_SIG,
    _SQL_VERIFIED_BLOCK,
    _shared_verified_pairs,
)
from .sources.tables import load_table as __load


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return __load(spark, sf_dir, name)


# Shared oracle prefix: the verified near-dup graph as symmetric edges.
_SQL_DUP_EDGES = f"""
    WITH {_SQL_SHINGLES},
    {_SQL_SIG},
    banded AS (SELECT doc_id, {_SQL_BAND_KEYS} FROM sig),
    cand AS ({_SQL_CAND}),
    {_SQL_VERIFIED_BLOCK},
    edges AS (SELECT id_1 AS a, id_2 AS b FROM verified
              UNION SELECT id_2, id_1 FROM verified)
"""


# ---------------------------------------------------------------------------
# Label-propagation communities over the dup graph.
# ---------------------------------------------------------------------------
LPA_ROUNDS = 4


def _lpa_round_sql(prev: str, cur: str) -> str:
    """One synchronous LPA round as an unrolled CTE: node b adopts the most
    frequent label among its neighbors' round-(i-1) labels; ties break to
    the smallest label.  Integer-only, so the Spark twin is bit-exact."""
    return f"""
    {cur} AS (
      SELECT b AS doc_id, label FROM (
        SELECT e.b, p.label, count(*) AS c,
               row_number() OVER (PARTITION BY e.b
                                  ORDER BY count(*) DESC, p.label) AS rn
        FROM edges e JOIN {prev} p ON e.a = p.doc_id
        GROUP BY e.b, p.label)
      WHERE rn = 1)"""


@register(
    "dup_label_propagation",
    oracle=_SQL_DUP_EDGES
    + ",\n    l0 AS (SELECT DISTINCT a AS doc_id, a AS label FROM edges),"
    + ",".join(_lpa_round_sql(f"l{i}", f"l{i + 1}") for i in range(LPA_ROUNDS))
    + f"""
    SELECT doc_id, label::BIGINT AS community,
           (count(*) OVER (PARTITION BY label))::BIGINT AS community_size
    FROM l{LPA_ROUNDS} ORDER BY doc_id
    """,
)
def q_dup_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the verified near-duplicate graph by
    synchronous label propagation (4 fixed rounds): every node adopts the
    majority label among its neighbors, ties to the smallest label.
    Communities are the template families connected-components can't
    separate — a bridge edge merges two cliques into one component, but
    majority voting keeps each clique on its own label, so remediation
    (pick-one-per-template) acts on the right granularity.

    Determinism: labels are doc_ids (integers); each round is a count +
    (count DESC, label ASC) argmax — no floats, no data-dependent
    iteration count, so any partitioning and the unrolled-CTE DuckDB twin
    produce identical labels.  Standard async LPA is nondeterministic by
    construction (visit order decides); the synchronous fixed-round form
    is the one a distributed engine can honestly promise.

    Scale: each round is ONE join of the O(near-dup) edge list against
    the label table plus a partial-agg'd (b, label) count — the
    `dup_graph_pagerank` economics; eager localCheckpoint per round keeps
    the plan constant-size.  Rounds are O(graph diameter) to stabilize;
    dup graphs are shallow (templates are star/clique-like), so a fixed
    small round count is the production setting.
    """
    pairs = _shared_verified_pairs(spark, sf_dir)
    edges = (
        pairs.select(F.col("id_1").alias("a"), F.col("id_2").alias("b"))
        .unionAll(pairs.select(F.col("id_2").alias("a"), F.col("id_1").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("a").alias("doc_id")).distinct().withColumn(
        "label", F.col("doc_id").cast("long")
    )
    w = Window.partitionBy("b").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(LPA_ROUNDS):
        cnt = (
            edges.join(labels, edges.a == labels.doc_id)
            .groupBy("b", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("b").alias("doc_id"), "label")
            .localCheckpoint(eager=True)
        )
    w_sz = Window.partitionBy("label")
    return labels.select(
        "doc_id",
        F.col("label").cast("long").alias("community"),
        F.count(F.lit(1)).over(w_sz).cast("long").alias("community_size"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Eigenvector centrality by integer power iteration.
# ---------------------------------------------------------------------------
EIGEN_ROUNDS = 6
EIGEN_SCALE = 1_000_000


def _eigen_oracle() -> str:
    ctes = ["x0 AS (SELECT DISTINCT a AS doc_id, 1000000::BIGINT AS x FROM edges)"]
    for i in range(EIGEN_ROUNDS):
        ctes.append(
            f"""s{i} AS MATERIALIZED (
      SELECT e.b AS doc_id, sum(p.x)::BIGINT AS s
      FROM edges e JOIN x{i} p ON e.a = p.doc_id GROUP BY e.b)"""
        )
        ctes.append(
            f"""x{i + 1} AS MATERIALIZED (
      SELECT s.doc_id,
             (s.s // (1 + ((SELECT sum(s) FROM s{i})
                           // ((SELECT count(*) FROM x0) * {EIGEN_SCALE}))))::BIGINT
               AS x
      FROM s{i} s)"""
        )
    return (
        _SQL_DUP_EDGES
        + ",\n    "
        + ",\n    ".join(ctes)
        + f"""
    SELECT doc_id, x AS centrality_micro FROM x{EIGEN_ROUNDS} ORDER BY doc_id
    """
    )


@register("dup_eigencentrality", oracle=_eigen_oracle())
def q_dup_eigencentrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality of the verified near-duplicate graph — x ∝
    A·x by 6 power-iteration rounds.  Where PageRank's degree division
    flattens hubs, eigencentrality concentrates mass inside the densest
    clique: the top-centrality docs ARE the dominant boilerplate template,
    found without thresholding degree.

    Exactness: iteration state is integer micro-units.  Renormalization
    divides every score by the SAME integer d = 1 + Σs // (N·1e6) — a
    uniform scalar, so relative order (the centrality semantics) is
    unaffected while values stay in BIGINT range at any graph size; since
    both the neighbor sums and d are exact integers, any cluster size,
    any partitioning, and the unrolled-CTE DuckDB twin agree bit-for-bit
    (a float-normalized power iteration would drift by reduction order).

    Scale: per round one join + partial-agg'd shuffle over O(near-dup)
    edges, plus a 1-row global sum broadcast back — the
    `dup_graph_pagerank` economics; eager localCheckpoint per round keeps
    plan and codegen constant-size.  Neighbor sums fit BIGINT up to
    ~1e12-node graphs (score ≤ N·1e6); beyond that the accumulator moves
    to DECIMAL(38,0) per the house second-moment rule.
    """
    pairs = _shared_verified_pairs(spark, sf_dir)
    edges = (
        pairs.select(F.col("id_1").alias("a"), F.col("id_2").alias("b"))
        .unionAll(pairs.select(F.col("id_2").alias("a"), F.col("id_1").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("a").alias("doc_id")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    x = nodes.withColumn("x", F.lit(EIGEN_SCALE).cast("long"))
    for _ in range(EIGEN_ROUNDS):
        s = (
            edges.join(x, edges.a == x.doc_id)
            .groupBy("b")
            .agg(F.sum("x").cast("long").alias("s"))
        )
        d = (
            s.agg(F.sum("s").cast("long").alias("tot"))
            .crossJoin(F.broadcast(nn))
            .select(
                (
                    F.lit(1)
                    + F.expr(f"tot DIV (n_nodes * {EIGEN_SCALE})")
                ).cast("long").alias("d")
            )
        )
        x = (
            s.crossJoin(F.broadcast(d))
            .select(F.col("b").alias("doc_id"), F.expr("s DIV d").cast("long").alias("x"))
            .localCheckpoint(eager=True)
        )
    return x.select("doc_id", F.col("x").alias("centrality_micro")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Mann–Kendall monotone-trend test on daily purchase revenue.
# ---------------------------------------------------------------------------
# Shared float expression text (identical in both engines, computed from the
# exact integers n [days], s [MK statistic], tsum [Σ t(t-1)(2t+5) over tie
# groups]): tie-corrected variance, continuity-corrected z, and tau-a.
_MK_VAR = (
    "((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)"
    " * (2.0 * CAST(n AS DOUBLE) + 5.0) - CAST(tsum AS DOUBLE)) / 18.0)"
)
_MK_Z = (
    f"(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt({_MK_VAR})"
    f" WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt({_MK_VAR})"
    f" ELSE 0.0 END)"
)
_MK_TAU = (
    "(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0))"
)
_MK_TREND = (
    f"(CASE WHEN {_MK_Z} > 1.959964 THEN 'increasing'"
    f" WHEN {_MK_Z} < -1.959964 THEN 'decreasing'"
    f" ELSE 'no_trend' END)"
)


@register(
    "mann_kendall_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(floor(value*100 + 0.5)::BIGINT)::BIGINT AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    sp AS (
      SELECT sum(CASE WHEN b.cents > a.cents THEN 1
                      WHEN b.cents < a.cents THEN -1 ELSE 0 END)::BIGINT AS s
      FROM daily a JOIN daily b ON b.day > a.day),
    ties AS (
      SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)::BIGINT AS tsum
      FROM (SELECT count(*)::BIGINT AS t FROM daily GROUP BY cents)
      WHERE t > 1),
    nd AS (SELECT count(*)::BIGINT AS n FROM daily)
    SELECT n AS n_days, s AS s_stat,
           floor(({_MK_TAU})*10000 + 0.5)/10000.0 AS tau,
           floor(({_MK_Z})*10000 + 0.5)/10000.0 AS z,
           {_MK_TREND} AS trend
    FROM sp CROSS JOIN ties CROSS JOIN nd
    """,
)
def q_mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotone-trend test on daily purchase revenue: S =
    Σ_{{i<j}} sign(c_j − c_i), tie-corrected variance, continuity-corrected
    z, and Kendall's tau-a — the nonparametric "is revenue drifting"
    monitor beside `theil_sen_daily_trend` (which estimates the slope MK
    only tests) and `runs_test_daily` (randomness, not monotonicity).

    Exactness: S and the tie term Σt(t−1)(2t+5) are exact integers from
    the cents-quantized day table; variance/z/tau are ONE shared DOUBLE
    expression text over those integers (identical operand order ⇒
    IEEE-identical in both engines), floor-quantized to 4 dp on emit.

    Scale: the O(days²) sign join runs on the AGGREGATE day table (one
    row per day — decades fit in ~10⁴ rows), not on events; everything
    upstream is one partial-agg'd groupBy(day) over the purchase slice.
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
    )
    a = daily.select(F.col("day").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("day").alias("db"), F.col("cents").alias("cb"))
    sp = (
        a.crossJoin(b)
        .filter(F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    ties = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tsum")
        )
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        sp.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("n").alias("n_days"),
            F.col("s").alias("s_stat"),
            F.expr(
                f"CAST(floor(({_MK_TAU})*10000 + 0.5)/10000.0 AS DOUBLE)"
            ).alias("tau"),
            F.expr(
                f"CAST(floor(({_MK_Z})*10000 + 0.5)/10000.0 AS DOUBLE)"
            ).alias("z"),
            F.expr(_MK_TREND).alias("trend"),
        )
    )


# ---------------------------------------------------------------------------
# Gradient-boosted residual stumps (two least-squares boosting rounds).
# ---------------------------------------------------------------------------
GBDT_ROUNDS = 2
_GB_Y = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"


def _fdiv(a: str, b: str) -> str:
    """Floor division as shared SQL text, exact on negatives in BOTH
    engines: Spark's ``DIV`` truncates toward zero while DuckDB's ``//``
    floors, so neither operator is portable once residual sums go
    negative.  ``a - pmod(a, b)`` is divisible by ``b`` exactly, and both
    engines' ``%`` is C-style truncated remainder, so the text below is
    engine-independent (the double divide is exact: the quotient is an
    integer < 2^53)."""
    return (
        f"CAST((({a}) - (((({a}) % ({b})) + ({b})) % ({b}))) / ({b}) AS BIGINT)"
    )


# Variance-explained ratio of a split, from exact integer sufficient
# statistics (cum_n/cum_s of the left side; n_tot/s_tot/ssq_tot of the
# round's residuals).  ONE shared DOUBLE expression text -> IEEE-identical
# in both engines; [0, 1] so the nano-quantized argmax fits BIGINT.
_GB_R2 = (
    "(CASE WHEN CAST(ssq_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)"
    "           <= CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) THEN 0.0"
    " ELSE (CAST(cum_s AS DOUBLE) * CAST(cum_s AS DOUBLE) / CAST(cum_n AS DOUBLE)"
    "       + CAST(s_tot - cum_s AS DOUBLE) * CAST(s_tot - cum_s AS DOUBLE)"
    "         / CAST(n_tot - cum_n AS DOUBLE)"
    "       - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))"
    "      / (CAST(ssq_tot AS DOUBLE)"
    "         - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))"
    " END)"
)


def _gb_features() -> list[tuple[str, str]]:
    from .registry_ml import _STUMP_FEATURES

    return _STUMP_FEATURES


def _gb_assign_case(feats: list[str]) -> str:
    """Residual update: subtract the chosen stump's leaf delta, picking the
    split feature dynamically from the best-row scalars (bf, bv, vl, vr)."""
    picks = " ".join(
        f"WHEN bf = '{name}' THEN {name}" for name in feats[:-1]
    )
    return (
        f"CASE WHEN (CASE {picks} ELSE {feats[-1]} END) <= bv THEN vl ELSE vr END"
    )


def _gb_round_sql(rtab: str, t: int) -> str:
    """CTEs for boosting round t over residual table ``rtab`` (cols:
    feature columns + r): histogram cells, cumulative split stats, the
    nano-quantized global argmax, and the next residual table."""
    feats = _gb_features()
    branches = "\n        UNION ALL ".join(
        f"SELECT '{name}' AS feature, {name} AS val, r FROM {rtab}"
        for name, _ in feats
    )
    assign = _gb_assign_case([n for n, _ in feats])
    return f"""
    b{t} AS MATERIALIZED ({branches}),
    cells{t} AS (
      SELECT feature, val, count(*)::BIGINT AS cnt, sum(r)::BIGINT AS s,
             sum(r*r)::HUGEINT AS sq
      FROM b{t} GROUP BY 1, 2),
    cum{t} AS (
      SELECT feature, val,
             (sum(cnt) OVER w)::BIGINT AS cum_n,
             (sum(s) OVER w)::BIGINT AS cum_s,
             (sum(cnt) OVER f)::BIGINT AS n_tot,
             (sum(s) OVER f)::BIGINT AS s_tot,
             (sum(sq) OVER f)::HUGEINT AS ssq_tot
      FROM cells{t}
      WINDOW w AS (PARTITION BY feature ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             f AS (PARTITION BY feature)),
    best{t} AS MATERIALIZED (
      SELECT feature AS bf, val AS bv, cum_n AS nl,
             (n_tot - cum_n)::BIGINT AS nr,
             {_fdiv("cum_s", "cum_n")} AS vl,
             {_fdiv("(s_tot - cum_s)", "(n_tot - cum_n)")} AS vr,
             floor(({_GB_R2})*1000000000 + 0.5)::BIGINT AS r2_nano
      FROM cum{t} WHERE cum_n < n_tot
      ORDER BY r2_nano DESC, feature, val LIMIT 1),
    r{t + 1} AS MATERIALIZED (
      SELECT {", ".join(n for n, _ in feats)},
             (r - ({assign}))::BIGINT AS r
      FROM {rtab} CROSS JOIN best{t})"""


def _gbdt_oracle() -> str:
    feats = _gb_features()
    cols = ", ".join(f"{expr} AS {name}" for name, expr in feats)
    rounds = "".join("," + _gb_round_sql(f"r{t}", t) for t in range(1, GBDT_ROUNDS + 1))
    round_rows = "\n    UNION ALL ".join(
        f"SELECT {t}::BIGINT AS round, bf AS feature, bv AS threshold,"
        f" nl AS n_left, nr AS n_right, vl AS delta_left_cents,"
        f" vr AS delta_right_cents,"
        f" floor((r2_nano/1000000000.0)*10000 + 0.5)/10000.0 AS split_r2"
        f" FROM best{t}"
        for t in range(1, GBDT_ROUNDS + 1)
    )
    return f"""
    WITH base AS MATERIALIZED (
      SELECT {cols}, {_GB_Y} AS y FROM lineitem),
    m0 AS (SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS sy FROM base),
    f0 AS (SELECT n, {_fdiv("sy", "n")} AS f0 FROM m0),
    r1 AS MATERIALIZED (
      SELECT {", ".join(n for n, _ in feats)}, (y - f0)::BIGINT AS r
      FROM base CROSS JOIN f0){rounds}
    SELECT 0::BIGINT AS round, '__mean__' AS feature, -1::BIGINT AS threshold,
           n AS n_left, 0::BIGINT AS n_right, f0 AS delta_left_cents,
           f0 AS delta_right_cents, 0.0 AS split_r2
    FROM f0
    UNION ALL {round_rows}
    ORDER BY round
    """


@register("gbdt_residual_stumps", oracle=_gbdt_oracle())
def q_gbdt_residual_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of least-squares gradient boosting with decision-stump
    base learners on lineitem price — the actual GBDT training step
    (fit a stump to the current residuals, subtract its leaf predictions,
    repeat), run as a declarative plan.  Round 0 is the global-mean base
    score; each round emits the chosen split, its leaf deltas (cents),
    and the variance-explained ratio of the split.

    Exactness: the target is cents; the base score and every leaf value
    are floor-divided integers, so residuals stay exact integers through
    all rounds.  Split search needs only per-(feature, value) residual
    sufficient statistics (count, Σr as BIGINT, Σr² as DECIMAL — the
    house second-moment headroom rule); the variance-explained ratio is
    ONE shared DOUBLE expression over those integers, ranked by its
    nano-quantized value with (feature, val) tie-break, so the argmax
    never compares floats.  Leaf means use a shared pmod floor-division
    text because Spark DIV truncates while DuckDB // floors — they
    diverge on the negative residual sums boosting produces.

    Scale: LightGBM's histogram algorithm, relationally: each round is
    ONE scan exploding rows to (feature, value) pairs, a partial-agg'd
    groupBy over Σ|domain| ≈ 160 cells, windows on the cells, and a
    TakeOrderedAndProject(1) argmax broadcast back for the residual
    update.  State is constant-size regardless of corpus size; rounds
    add scans, not shuffles of data rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    feats = _gb_features()
    fnames = [n for n, _ in feats]
    base = li.selectExpr(
        *[f"{expr} AS {name}" for name, expr in feats], f"{_GB_Y} AS y"
    )
    m0 = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    f0 = m0.selectExpr("n", f"{_fdiv('sy', 'n')} AS f0")
    cur = base.crossJoin(F.broadcast(f0)).selectExpr(
        *fnames, "CAST(y - f0 AS BIGINT) AS r"
    )
    out = f0.selectExpr(
        "CAST(0 AS BIGINT) AS round",
        "'__mean__' AS feature",
        "CAST(-1 AS BIGINT) AS threshold",
        "n AS n_left",
        "CAST(0 AS BIGINT) AS n_right",
        "f0 AS delta_left_cents",
        "f0 AS delta_right_cents",
        "CAST(0.0 AS DOUBLE) AS split_r2",
    )
    assign = _gb_assign_case(fnames)
    w_cum = (
        Window.partitionBy("feature")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("feature")
    for t in range(1, GBDT_ROUNDS + 1):
        cells = (
            cur.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(name).alias("feature"),
                                F.col(name).alias("val"),
                            )
                            for name in fnames
                        ]
                    )
                ).alias("fv"),
                "r",
            )
            .select("fv.feature", "fv.val", "r")
            .groupBy("feature", "val")
            .agg(
                F.count(F.lit(1)).cast("long").alias("cnt"),
                F.sum("r").cast("long").alias("s"),
                F.sum((F.col("r") * F.col("r")).cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .alias("sq"),
            )
        )
        cum = cells.select(
            "feature",
            "val",
            F.sum("cnt").over(w_cum).cast("long").alias("cum_n"),
            F.sum("s").over(w_cum).cast("long").alias("cum_s"),
            F.sum("cnt").over(w_tot).cast("long").alias("n_tot"),
            F.sum("s").over(w_tot).cast("long").alias("s_tot"),
            F.sum("sq").over(w_tot).cast("decimal(38,0)").alias("ssq_tot"),
        )
        best = (
            cum.filter(F.col("cum_n") < F.col("n_tot"))
            .selectExpr(
                "feature AS bf",
                "val AS bv",
                "cum_n AS nl",
                "CAST(n_tot - cum_n AS BIGINT) AS nr",
                f"{_fdiv('cum_s', 'cum_n')} AS vl",
                f"{_fdiv('(s_tot - cum_s)', '(n_tot - cum_n)')} AS vr",
                f"CAST(floor(({_GB_R2})*1000000000 + 0.5) AS BIGINT) AS r2_nano",
            )
            .orderBy(F.desc("r2_nano"), F.asc("bf"), F.asc("bv"))
            .limit(1)
        )
        out = out.unionAll(
            best.selectExpr(
                f"CAST({t} AS BIGINT) AS round",
                "bf AS feature",
                "bv AS threshold",
                "nl AS n_left",
                "nr AS n_right",
                "vl AS delta_left_cents",
                "vr AS delta_right_cents",
                "CAST(floor((r2_nano/1000000000.0)*10000 + 0.5)/10000.0 AS DOUBLE)"
                " AS split_r2",
            )
        )
        cur = cur.crossJoin(F.broadcast(best)).selectExpr(
            *fnames, f"CAST(r - ({assign}) AS BIGINT) AS r"
        )
    return out.orderBy("round")
