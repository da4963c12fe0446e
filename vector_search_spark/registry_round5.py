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
