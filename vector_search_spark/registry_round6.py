"""Round-6 registry additions: graph analytics, time-series diagnostics,
in-engine logistic regression, and retrieval-quality operators.

New families on top of the round-5 surface (HANDOFF round-6 candidates:
deeper dup-graph analytics; in-engine supervised model fits; retrieval
eval/diversification):

- ``dup_bfs_hops``             — multi-source BFS hop distances to the
  nearest canonical keeper (6 unrolled min-plus rounds).
- ``dup_community_modularity`` — Newman modularity of the components vs
  label-propagation partitions, side by side (exact integer numerators).
- ``acf_daily_revenue``        — sample autocorrelation of daily purchase
  revenue at lags 1..7 (n-scaled integer deviations, exact folds).
- ``textrank_keywords``        — TextRank keyword extraction: weighted
  PageRank over the token adjacency graph (df-prefiltered vocabulary).
- ``logistic_regression_gd``   — full-batch gradient-descent logistic
  regression trained in-engine (8 unrolled rounds, micro-integer weights).
- ``knn_loo_eval``             — leave-one-out 5-NN label-prediction
  accuracy over a deterministic embedding sample.
- ``mmr_diversify_topk``       — maximal-marginal-relevance re-ranking of
  the exact top-20 KNN candidates (5 unrolled greedy picks).
- ``rocchio_prf_search``       — Rocchio pseudo-relevance-feedback query
  expansion (micro-quantized centroid blend, exact re-scan).
- ``kaplan_meier_conversion``  — Kaplan–Meier signup→purchase survival
  with right censoring (micro-nat log folds over exact risk sets).
- ``conformal_price_interval`` — split-conformal interval around a
  group-mean model (exact order-statistic q̂, held-out coverage ≈ 0.9).
- ``decision_tree_depth2``     — level-wise histogram-grown Gini tree
  (two scans, (node, feature, bin) histograms, nano-quantized argmax).
- ``graph_double_sweep_diameter`` — per-component diameter lower bound
  (two fixed-round multi-component BFS sweeps, frontier-as-a-column).
- ``trimmed_mean_value``       — exact 10% two-sided trimmed mean via the
  value-histogram route (no per-row ranks, tie-exact trim boundaries).
- ``uplift_by_segment``        — user-level md5 A/A uplift with pooled
  two-proportion z per activity segment (null read expected and asserted).
- ``seasonal_decomposition_dow`` — additive day-of-week decomposition of
  daily revenue with the variance reduction the seasonal term explains.
- ``k_anonymity_audit``        — QI-group size audit (groups below k,
  rows exposed, minima) per event type — the dp_noisy_counts trigger.
- ``markov_expected_steps``    — truncated hitting time to 'purchase'
  (48 floor-quantized Neumann rounds on the 25-cell count frame).
- ``dup_personalized_pagerank`` — random-walk-with-restart affinity to a
  seed document (guilt-by-association template expansion).
- ``bagging_split_stability``  — 16 Poisson-bootstrap replicas of the
  stump argmax in ONE scan; the vote table is the stability diagnostic.
- ``conformal_group_coverage`` — Mondrian group-conditional conformal
  vs the marginal interval, coverage side by side per group.
- ``ab_sprt_monitor``          — Wald SPRT daily A/B monitor with
  ±ln19 boundaries; accepts H0 early on the A/A arms (asserted).
- ``logrank_test_conversion``  — log-rank comparison of the two md5
  arms' survival curves (hypergeometric O−E terms; null read asserted).
- ``isotonic_hour_calibration`` — exact PAVA via the minimax formula on
  the hour aggregate (floor-monotone identity proven in the gate).
- ``decision_tree_depth3``     — the level-wise machinery composed one
  level deeper (one scan per level, ≤ 4 × cells shuffled).
- ``ab_group_sequential``      — weekly interims, OBF-shaped 1.96·√(K/k)
  and Haybittle–Peto boundaries; never fires on the A/A arms (asserted).
- ``ses_revenue_forecast``     — dyadic α=1/2 exponential smoothing as
  ONE weighted sum (2^−e weights; ≤2^−40 truncation defined in).
- ``winsorized_mean_value``    — clamping twin of the trimmed mean on
  the same checkpointed value histogram (exact order-statistic bounds).
- ``ab_cuped_adjustment``      — CUPED θ = cov/var from HUGEINT moments,
  ρ² variance-reduction readout (honest ≈ 0 on this corpus).
- ``brown_trend_forecast``     — Brown's double smoothing as ONE weighted
  sum (weight of day t in s″ is (T−t+1)·2^−(T−t+2); level/trend/forecast
  are integer combinations of two exact sums).
- ``mannwhitney_value_test``   — Wilcoxon rank-sum via exact average
  ranks off the merged value histogram (doubled ranks stay integers,
  tie-corrected z; A/A null asserted).
- ``ab_welch_ttest``           — Welch's unequal-variance t with the
  Welch–Satterthwaite df, from six exact accumulators in one fold.
- ``ab_power_sample_size``     — two-proportion power planner (n per arm
  and duration for 1/2/5 pp lifts at the corpus's own base rate).
- ``brown_forsythe_variance_test`` — median-Levene equality of variances
  entirely on the value histogram (integer |c−med| deviations; exact
  order-statistic medians; ANOVA F from six HUGEINT folds).
- ``cramer_von_mises_test``    — the integrating ECDF-gap test beside
  KS (exact integer gaps per cell, micro-quantized contributions).

House invariants throughout: integer-only iteration state, shared SQL
expression text for every emitted float, ``round4`` on emitted floats,
``::BIGINT`` on DuckDB integer aggregates, DECIMAL(38,0)/HUGEINT for
wide products, portable floor division (``_fdiv``) wherever an operand
can go negative, NULL-free outputs, id tie-breaks.  The reference
(p1va/3-2-1-vector-search) has no graph/ML/diversification surface
(SURVEY.md §2.6); these extend the north-star training-data-pipeline
families (dup-graph remediation, in-engine model fits beside
registry_ml's OLS/NB/k-means, retrieval eval beside ann_srp_recall_eval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register
from .registry_dedup import _shared_verified_pairs
from .registry_round5 import _SQL_DUP_EDGES, _fdiv, _lpa_round_sql, LPA_ROUNDS
from .registry_round5 import q_dup_label_propagation
from .sources.tables import load_table as __load


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return __load(spark, sf_dir, name)


def _sym_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric directed edge list of the verified near-dup graph —
    the artifact every dup-graph query starts from (session-shared
    upstream via `_shared_verified_pairs`)."""
    pairs = _shared_verified_pairs(spark, sf_dir)
    return (
        pairs.select(F.col("id_1").alias("a"), F.col("id_2").alias("b"))
        .unionAll(pairs.select(F.col("id_2").alias("a"), F.col("id_1").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )


# ---------------------------------------------------------------------------
# Multi-source BFS hop distances on the dup graph.
# ---------------------------------------------------------------------------
BFS_ROUNDS = 6


@register(
    "dup_bfs_hops",
    oracle=_SQL_DUP_EDGES
    + """,
    d0 AS (SELECT b::BIGINT AS doc_id, 0::BIGINT AS dist
           FROM edges GROUP BY b HAVING b < min(a))"""
    + "".join(
        f""",
    d{i + 1} AS MATERIALIZED (
      SELECT doc_id, min(dist)::BIGINT AS dist FROM (
        SELECT doc_id, dist FROM d{i}
        UNION ALL
        SELECT e.b AS doc_id, p.dist + 1 AS dist
        FROM edges e JOIN d{i} p ON e.a = p.doc_id) u
      GROUP BY doc_id)"""
        for i in range(BFS_ROUNDS)
    )
    + f"""
    SELECT doc_id, dist FROM d{BFS_ROUNDS} ORDER BY doc_id
    """,
)
def q_dup_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source breadth-first hop distances on the verified
    near-duplicate graph: for every document, how many near-dup links
    separate it from the nearest "canonical keeper" — the local-minimum
    nodes (doc_id smaller than every neighbor's), which are exactly the
    anchors pick-one-per-template remediation keeps.  Hop distance is
    the provenance-radius signal: documents ≤2 hops from a keeper are
    usually the same template family even when LSH never paired them
    directly.  Every component contains at least one local minimum (its
    global minimum), so all nodes are reached.

    Determinism: 6 fixed min-plus rounds (frontier ∪ relaxed-neighbors,
    then min per node) over integer distances — no floats, no
    data-dependent iteration count, so any partitioning and the
    unrolled-CTE DuckDB twin produce identical distances.  Nodes farther
    than 6 hops from every seed would simply not appear — honest output
    for a fixed-round traversal (dup components are shallow).

    Scale: each round is ONE join of the O(near-dup) edge list against
    the current distance table plus a partial-agg'd min — the
    `dup_graph_pagerank` economics; eager localCheckpoint per round
    keeps the plan constant-size.  Multi-source BFS costs the same as
    single-source here (the frontier is a column, not a task), which is
    why distance-to-nearest-seed is the form a 1000-executor Pregel job
    actually runs.
    """
    edges = _sym_edges(spark, sf_dir)
    seed = (
        edges.groupBy("b")
        .agg(F.min("a").alias("min_nbr"))
        .filter(F.col("b") < F.col("min_nbr"))
        .select(F.col("b").cast("long").alias("doc_id"), F.lit(0).cast("long").alias("dist"))
    )
    dist = seed.localCheckpoint(eager=True)
    for _ in range(BFS_ROUNDS):
        relaxed = edges.join(dist, edges.a == dist.doc_id).select(
            F.col("b").alias("doc_id"), (F.col("dist") + 1).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("doc_id")
            .agg(F.min("dist").cast("long").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist.orderBy("doc_id")


# ---------------------------------------------------------------------------
# Newman modularity of the label-propagation communities.
# ---------------------------------------------------------------------------
_MOD_CONTRIB = "CAST(num_c AS DOUBLE) / (CAST(tm AS DOUBLE) * CAST(tm AS DOUBLE))"
_MOD_TOTAL = "CAST(num_tot AS DOUBLE) / (CAST(tm AS DOUBLE) * CAST(tm AS DOUBLE))"


_SQL_MOD_TAIL = f"""
    tm AS (SELECT count(*)::BIGINT AS tm FROM edges),
    deg AS (SELECT a AS doc_id, count(*)::BIGINT AS deg FROM edges GROUP BY a),
    lab AS (SELECT scheme, doc_id, community FROM lab_cc
            UNION ALL SELECT scheme, doc_id, community FROM lab_lpa),
    comm AS (
      SELECT l.scheme, l.community, count(*)::BIGINT AS size,
             sum(d.deg)::BIGINT AS degree_sum
      FROM lab l JOIN deg d ON l.doc_id = d.doc_id
      GROUP BY l.scheme, l.community),
    intra AS (
      SELECT la.scheme, la.community, count(*)::BIGINT AS intra2
      FROM edges e
      JOIN lab la ON e.a = la.doc_id
      JOIN lab lb ON e.b = lb.doc_id AND la.scheme = lb.scheme
      WHERE la.community = lb.community
      GROUP BY la.scheme, la.community),
    nums AS (
      SELECT c.scheme, c.community, c.size, c.degree_sum,
             coalesce(i.intra2, 0)::BIGINT AS intra2,
             (coalesce(i.intra2, 0)::HUGEINT * tm.tm
              - c.degree_sum::HUGEINT * c.degree_sum) AS num_c,
             tm.tm AS tm
      FROM comm c
      LEFT JOIN intra i ON c.scheme = i.scheme AND c.community = i.community
      CROSS JOIN tm),
    tot AS (SELECT scheme, sum(num_c)::HUGEINT AS num_tot
            FROM nums GROUP BY scheme)
    SELECT n.scheme, n.community::BIGINT AS community, n.size, n.degree_sum,
           {_fdiv("n.intra2", "2")} AS intra_edges,
           floor(({_MOD_CONTRIB})*10000 + 0.5)/10000.0 AS contribution,
           floor(({_MOD_TOTAL})*10000 + 0.5)/10000.0 AS modularity
    FROM nums n JOIN tot t ON n.scheme = t.scheme
    ORDER BY n.scheme, n.community
    """


@register(
    "dup_community_modularity",
    oracle=_SQL_DUP_EDGES.replace("WITH ", "WITH RECURSIVE ", 1).replace(
        "edges AS (SELECT", "edges AS MATERIALIZED (SELECT"
    )
    + """,
    nodes AS MATERIALIZED (SELECT DISTINCT a AS doc_id FROM edges),
    reach(doc_id, root) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.doc_id),
    lab_cc AS (SELECT 'components' AS scheme, doc_id,
                      min(root)::BIGINT AS community
               FROM reach GROUP BY doc_id),
    l0 AS (SELECT DISTINCT a AS doc_id, a AS label FROM edges),"""
    + ",".join(_lpa_round_sql(f"l{i}", f"l{i + 1}") for i in range(LPA_ROUNDS))
    + f""",
    lab_lpa AS (SELECT 'label_prop' AS scheme, doc_id, label::BIGINT AS community
                FROM l{LPA_ROUNDS}),"""
    + _SQL_MOD_TAIL,
)
def q_dup_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q = Σ_c (intra_c/m − (d_c/2m)²) of TWO
    partitions of the verified near-duplicate graph, side by side: the
    connected components (what `dedup_clusters` remediates on) and the
    synchronous label-propagation communities (`dup_label_propagation`).
    Emitted per community (size, degree mass, intra edges, contribution)
    with each partition's global Q on its rows — the "is this partition
    better than random" gate.  The comparison is the point: on
    pair-heavy dup graphs synchronous LPA oscillates (a two-node
    component swaps labels every round and lands fragmented), so its Q
    collapses toward 0 while the components partition scores near the
    1 − Σ(d_c/2m)² ceiling — exactly the diagnosis that tells
    remediation which label set to trust.

    Exactness: with tm = 2m directed edges, Q = Σ_c num_c/tm² where
    num_c = intra2_c·tm − d_c² is an exact HUGEINT/DECIMAL integer fold
    (intra2 = directed intra-community edge count); ONE shared float
    division per emitted value, floor-quantized to 4 dp.  intra2 is even
    by symmetry, so intra_edges = intra2/2 is exact.

    Scale: labels come from the iterative pointer-jump components /
    fixed-round LPA already in the engine; modularity itself is one
    edge-table join against the (broadcastable) label table plus two
    partial-agg'd groupBys per partition — O(edges), no squares, no
    iteration.
    """
    from .operators.dedup import connected_components

    edges = _sym_edges(spark, sf_dir)
    pairs = _shared_verified_pairs(spark, sf_dir)
    cc = connected_components(pairs.select("id_1", "id_2")).select(
        F.lit("components").alias("scheme"),
        F.col("node").alias("doc_id"),
        F.col("label").cast("long").alias("community"),
    )
    lpa = q_dup_label_propagation(spark, sf_dir).select(
        F.lit("label_prop").alias("scheme"),
        "doc_id",
        F.col("community").cast("long").alias("community"),
    )
    lab = cc.unionByName(lpa).localCheckpoint(eager=True)
    tm = edges.agg(F.count(F.lit(1)).cast("long").alias("tm"))
    deg = edges.groupBy(F.col("a").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    comm = (
        lab.join(deg, "doc_id")
        .groupBy("scheme", "community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("size"),
            F.sum("deg").cast("long").alias("degree_sum"),
        )
    )
    la = lab.select(
        F.col("doc_id").alias("a"), F.col("scheme").alias("pa"), F.col("community").alias("ca")
    )
    lb = lab.select(
        F.col("doc_id").alias("b"), F.col("scheme").alias("pb"), F.col("community").alias("cb")
    )
    intra = (
        edges.join(la, "a")
        .join(lb, "b")
        .filter((F.col("pa") == F.col("pb")) & (F.col("ca") == F.col("cb")))
        .groupBy(F.col("pa").alias("scheme"), F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("intra2"))
    )
    nums = (
        comm.join(intra, ["scheme", "community"], "left")
        .withColumn("intra2", F.coalesce(F.col("intra2"), F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(tm))
        .withColumn(
            "num_c",
            (
                F.col("intra2").cast("decimal(38,0)") * F.col("tm")
                - F.col("degree_sum").cast("decimal(38,0)") * F.col("degree_sum")
            ).cast("decimal(38,0)"),
        )
    )
    tot = nums.groupBy("scheme").agg(
        F.sum("num_c").cast("decimal(38,0)").alias("num_tot")
    )
    return (
        nums.join(F.broadcast(tot), "scheme")
        .select(
            "scheme",
            F.col("community").cast("long").alias("community"),
            "size",
            "degree_sum",
            F.expr(_fdiv("intra2", "2")).alias("intra_edges"),
            F.expr(f"CAST(floor(({_MOD_CONTRIB})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
                "contribution"
            ),
            F.expr(f"CAST(floor(({_MOD_TOTAL})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
                "modularity"
            ),
        )
        .orderBy("scheme", "community")
    )


# ---------------------------------------------------------------------------
# Sample autocorrelation of daily purchase revenue, lags 1..7.
# ---------------------------------------------------------------------------
ACF_MAX_LAG = 7
_ACF = "CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"


@register(
    "acf_daily_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(floor(value*100 + 0.5)::BIGINT)::BIGINT AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    idx AS (
      SELECT (day - (SELECT min(day) FROM daily))::BIGINT AS i, cents
      FROM daily),
    nst AS (
      SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS s FROM idx),
    dev AS (
      SELECT i, (nst.n * cents - nst.s)::BIGINT AS d FROM idx CROSS JOIN nst),
    den AS (
      SELECT sum(d::HUGEINT * d)::HUGEINT AS den FROM dev),
    lags AS (SELECT unnest(range(1, {ACF_MAX_LAG + 1}))::BIGINT AS lag),
    num AS (
      SELECT l.lag, count(*)::BIGINT AS n_pairs,
             sum(a.d::HUGEINT * b.d)::HUGEINT AS num
      FROM lags l
      JOIN dev a ON TRUE
      JOIN dev b ON b.i = a.i - l.lag
      GROUP BY l.lag)
    SELECT lag, n_pairs,
           floor(({_ACF})*10000 + 0.5)/10000.0 AS acf
    FROM num CROSS JOIN den
    ORDER BY lag
    """,
)
def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation function of daily purchase revenue at lags
    1..7: r_k = Σ_t (y_t−ȳ)(y_{t−k}−ȳ) / Σ_t (y_t−ȳ)² on the calendar-day
    index — the weekly-seasonality detector beside `dow_chi_square`
    (which tests counts, not revenue) and the model-selection input for
    `seasonal_naive_backtest` (a spike at lag 7 justifies the seasonal
    naive).  Missing calendar days simply contribute no pair at the lags
    they'd anchor (standard irregular-series convention, identical in
    both engines).

    Exactness: deviations are n-scaled integers d_t = n·y_t − S (cents),
    so numerator and denominator are exact HUGEINT/DECIMAL folds of
    integer products; ONE shared float division per lag, floor-quantized
    to 4 dp.  DECIMAL(38,0) holds n²·y²·n ≈ 10³·10²² at a decade of
    100 TB-scale daily cents with room to spare.

    Scale: the lag joins run on the AGGREGATE day table (one row per
    day — decades fit in ~10⁴ rows, broadcastable), never on events;
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
    # the day aggregate fans out to min-day, totals, the deviation table,
    # the denominator and 7 lag joins — checkpoint the tiny frames so the
    # corpus scan runs ONCE (plan_audit measured 24 lineage replays)
    daily = daily.localCheckpoint(eager=True)
    mind = daily.agg(F.min("day").alias("min_day"))
    idx = daily.crossJoin(F.broadcast(mind)).select(
        F.datediff(F.col("day"), F.col("min_day")).cast("long").alias("i"),
        "cents",
    )
    nst = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    dev = idx.crossJoin(F.broadcast(nst)).select(
        "i", (F.col("n") * F.col("cents") - F.col("s")).cast("long").alias("d")
    ).localCheckpoint(eager=True)
    den = dev.agg(
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d"))
        .cast("decimal(38,0)")
        .alias("den")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("long").alias("lag"))
    a = dev.select(F.col("i").alias("ia"), F.col("d").alias("da"))
    b = dev.select(F.col("i").alias("ib"), F.col("d").alias("db"))
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("ib") == F.col("ia") - F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("da").cast("decimal(38,0)") * F.col("db"))
            .cast("decimal(38,0)")
            .alias("num"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            F.expr(f"CAST(floor(({_ACF})*10000 + 0.5)/10000.0 AS DOUBLE)").alias("acf"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# TextRank keyword extraction: weighted PageRank over token adjacency.
# ---------------------------------------------------------------------------
TEXTRANK_ROUNDS = 4
TEXTRANK_MIN_DF = 5
TEXTRANK_TOPK = 20


def _textrank_round_sql(prev: str, cur: str) -> str:
    """One weighted-PageRank round as an unrolled CTE: per-edge integer
    contribution (w·r)//W_u (nonnegative, so `//`/`DIV` agree), damped
    integer update — the `dup_graph_pagerank` arithmetic on the weighted
    token graph."""
    return f"""
    {cur} AS MATERIALIZED (
      SELECT e.v AS tok,
             (150000 + (85 * sum((e.w * p.r) // e.wu)) // 100)::BIGINT AS r
      FROM wedges e JOIN {prev} p ON e.u = p.tok
      GROUP BY e.v)"""


@register(
    "textrank_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok,
             generate_subscripts(regexp_split_to_array(trim(lower(text)), '\\s+'), 1) AS ord
      FROM documents WHERE trim(text) != ''),
    dfq AS (
      SELECT tok FROM (SELECT DISTINCT doc_id, tok FROM toks)
      GROUP BY tok HAVING count(*) >= {TEXTRANK_MIN_DF}),
    adj AS (
      SELECT a.tok AS u, b.tok AS v
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
      WHERE a.tok != b.tok
        AND a.tok IN (SELECT tok FROM dfq) AND b.tok IN (SELECT tok FROM dfq)),
    sym AS (SELECT u, v FROM adj UNION ALL SELECT v, u FROM adj),
    edges AS (SELECT u, v, count(*)::BIGINT AS w FROM sym GROUP BY u, v),
    strength AS (SELECT u, sum(w)::BIGINT AS wu FROM edges GROUP BY u),
    wedges AS MATERIALIZED (
      SELECT e.u, e.v, e.w, s.wu FROM edges e JOIN strength s ON e.u = s.u),
    r0 AS (SELECT u AS tok, 1000000::BIGINT AS r FROM strength),"""
    + ",".join(
        _textrank_round_sql(f"r{i}", f"r{i + 1}") for i in range(TEXTRANK_ROUNDS)
    )
    + f"""
    SELECT rk.tok, rk.r AS rank_micro, s.wu AS strength
    FROM r{TEXTRANK_ROUNDS} rk JOIN strength s ON rk.tok = s.u
    ORDER BY rk.r DESC, rk.tok LIMIT {TEXTRANK_TOPK}
    """,
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    PageRank over the token adjacency graph — nodes are corpus tokens,
    edges connect tokens adjacent in running text (window 2, both
    directions), edge weight = corpus adjacency count; the top-20 ranks
    are the corpus keywords.  This is the graph-centrality counterpart
    of `tfidf_top_terms` (frequency-based) — TextRank promotes tokens
    that glue many contexts together even when raw counts are modest.

    Determinism: the `dup_graph_pagerank` integer arithmetic on a
    weighted graph — per-edge contribution (w·r)//W_u is a nonnegative
    integer (truncating and flooring division agree), damped update
    150000 + (85·Σ)//100, 4 fixed rounds; ranks are exact integers under
    any partitioning, mirrored by the unrolled-CTE oracle.

    Scale: adjacency is a linear per-document array `transform` (no
    self-join — O(tokens) pairs), cut to the df ≥ 5 vocabulary BEFORE
    edge grouping, so the graph is bounded by the frequent-bigram type
    count (Zipf keeps it tiny vs the corpus); each rank round is ONE
    join of the edge list against the rank table plus a partial-agg'd
    sum, eager-localCheckpointed to keep the plan constant-size.
    """
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    )
    dfq = (
        toks.select("doc_id", F.explode("t").alias("tok"))
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= TEXTRANK_MIN_DF)
        .select("tok")
        # tiny vocab set, consumed by BOTH endpoint prefilters — checkpoint
        # so its doc-scan lineage isn't replayed per join
        .localCheckpoint(eager=True)
    )
    adj = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS u, t[i] AS v))")
            ).alias("p")
        )
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .join(F.broadcast(dfq.withColumnRenamed("tok", "u")), "u")
        .join(F.broadcast(dfq.withColumnRenamed("tok", "v")), "v")
        .select("u", "v")
    )
    sym = adj.unionAll(adj.select(F.col("v").alias("u"), F.col("u").alias("v")))
    edges = sym.groupBy("u", "v").agg(F.count(F.lit(1)).cast("long").alias("w"))
    strength = edges.groupBy("u").agg(
        F.sum("w").cast("long").alias("wu")
    ).localCheckpoint(eager=True)  # feeds wedges, the rank init AND the output join
    wedges = edges.join(strength, "u").localCheckpoint(eager=True)
    ranks = strength.select(F.col("u").alias("tok")).withColumn(
        "r", F.lit(1000000).cast("long")
    )
    for _ in range(TEXTRANK_ROUNDS):
        ranks = (
            wedges.join(ranks, wedges.u == ranks.tok)
            .select(F.col("v"), F.expr("(w * r) DIV wu").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("v").alias("tok"),
                (F.lit(150000) + F.expr("(85 * s) DIV 100")).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.join(F.broadcast(strength), ranks.tok == strength.u)
        .select("tok", F.col("r").alias("rank_micro"), F.col("wu").alias("strength"))
        .orderBy(F.desc("rank_micro"), F.asc("tok"))
        .limit(TEXTRANK_TOPK)
    )


# ---------------------------------------------------------------------------
# In-engine logistic regression by full-batch gradient descent.
# ---------------------------------------------------------------------------
LOGREG_ROUNDS = 8
# Shared DOUBLE texts (identical operand order in both engines).  The
# integer margin numerator m = 69·w0 + 3·w1·(2h−23) + 23·w2·(dw−3) clears
# the feature denominators (23 and 3, LCD 69), so the sign test and every
# float expression start from exact integers.
_LR_M = "(69*w0 + 3*w1*h2 + 23*w2*d3)"
_LR_P = f"(1.0/(1.0 + exp(0.0 - (CAST({_LR_M} AS DOUBLE)/69000000.0))))"
_LR_Q = f"CAST(floor({_LR_P}*1000000.0 + 0.5) AS BIGINT)"
_LR_LL = (
    f"CAST(floor((CASE WHEN y = 1 THEN 0.0 - ln({_LR_P}) "
    f"ELSE 0.0 - ln(1.0 - {_LR_P}) END)*1000000.0 + 0.5) AS BIGINT)"
)


def _logreg_round_sql(prev: str, cur: str) -> str:
    """One full-batch GD round as an unrolled CTE: per-row quantized
    residual e = q − y·1e6 (micro), three integer gradient sums, portable
    floor-division weight update with learning rate 2."""
    return f"""
    g_{cur} AS MATERIALIZED (
      SELECT sum(e)::HUGEINT AS g0,
             sum(e * h2)::HUGEINT AS g1,
             sum(e * d3)::HUGEINT AS g2,
             count(*)::BIGINT AS n,
             any_value(w0) AS w0, any_value(w1) AS w1, any_value(w2) AS w2
      FROM (SELECT base.*, w.w0, w.w1, w.w2,
                   ({_LR_Q} - y*1000000) AS e
            FROM base CROSS JOIN {prev} w)),
    {cur} AS MATERIALIZED (
      SELECT (w0 - {_fdiv("2*g0", "n")})::BIGINT AS w0,
             (w1 - {_fdiv("2*g1", "23*n")})::BIGINT AS w1,
             (w2 - {_fdiv("2*g2", "3*n")})::BIGINT AS w2
      FROM g_{cur})"""


@register(
    "logistic_regression_gd",
    oracle="""
    WITH base AS MATERIALIZED (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             (2*hour(ts)::BIGINT - 23) AS h2,
             ((CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) % 7) - 3) AS d3
      FROM events),
    w_0 AS (SELECT 0::BIGINT AS w0, 0::BIGINT AS w1, 0::BIGINT AS w2),"""
    + ",".join(
        _logreg_round_sql(f"w_{i}", f"w_{i + 1}") for i in range(LOGREG_ROUNDS)
    )
    + f"""
    SELECT w.w0 AS w0_micro, w.w1 AS w1_micro, w.w2 AS w2_micro,
           count(*)::BIGINT AS n,
           sum(y)::BIGINT AS n_pos,
           floor((sum(CASE WHEN ({_LR_M} >= 0) = (y = 1) THEN 1 ELSE 0 END) * 1.0
                  / count(*)) * 10000 + 0.5)/10000.0 AS accuracy,
           floor(((sum({_LR_LL}) * CAST(1.0 AS DOUBLE) / 1000000.0) / count(*)) * 10000 + 0.5)/10000.0
             AS avg_logloss
    FROM base CROSS JOIN w_{LOGREG_ROUNDS} w
    GROUP BY w.w0, w.w1, w.w2
    """,
)
def q_logistic_regression_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression trained INSIDE the engine: P(purchase) from
    hour-of-day and day-of-week by full-batch gradient descent — 8
    unrolled rounds, each ONE partial-agg'd scan producing the three
    gradient sums against broadcast weight scalars (the
    sufficient-statistics shape every distributed GD/L-BFGS fit has).
    Emits the fitted micro-weights plus training accuracy and mean
    log-loss.  On this uniform synthetic corpus the signal is the base
    rate — the intercept converges toward logit(P(purchase)) ≈ −1.4 and
    the slopes stay near zero, which is itself the honest finding (the
    calibration-over-discrimination regime `calibration_bins` measures).

    Exactness: features are exact integer numerators over the LCD 69
    (x1 = (2h−23)/23, x2 = (dw−3)/3, Sunday-0 day keys as in
    `dow_chi_square`); the margin numerator is integer, the sigmoid is
    ONE shared DOUBLE text whose per-row output is quantized to micro
    BEFORE summing, gradient sums are HUGEINT/DECIMAL folds, and the
    weight update is portable floor division (residuals go negative) —
    so the weight trajectory is bit-identical under any partitioning and
    in the unrolled-CTE oracle.  Accuracy's decision p ≥ 1/2 is the
    INTEGER sign test m ≥ 0 — no float compare.

    Scale: 8 scans × (map-side partial agg to 3 sums + a 1-row weight
    update) — no shuffle wider than the 1-row aggregate; the events scan
    is the whole cost, exactly like `ols_price_model`'s normal-equation
    pass.  1-row eager localCheckpoints are the codegen barriers between
    rounds (HANDOFF: >64 KB generated methods fall back to interpreted).
    """
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).cast("long").alias("y"),
        (2 * F.hour("ts").cast("long") - 23).alias("h2"),
        (((F.dayofweek(F.col("ts").cast("date")).cast("long") - 1) % 7) - 3).alias("d3"),
    )
    w = spark.range(1).select(
        F.lit(0).cast("long").alias("w0"),
        F.lit(0).cast("long").alias("w1"),
        F.lit(0).cast("long").alias("w2"),
    )
    for _ in range(LOGREG_ROUNDS):
        g = (
            base.crossJoin(F.broadcast(w))
            .withColumn("e", F.expr(f"{_LR_Q} - y*1000000"))
            .agg(
                F.sum(F.col("e").cast("decimal(38,0)")).cast("decimal(38,0)").alias("g0"),
                F.sum((F.col("e") * F.col("h2")).cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .alias("g1"),
                F.sum((F.col("e") * F.col("d3")).cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .alias("g2"),
                F.count(F.lit(1)).cast("long").alias("n"),
                F.first("w0").alias("w0"),
                F.first("w1").alias("w1"),
                F.first("w2").alias("w2"),
            )
        )
        w = g.select(
            F.expr(f"CAST(w0 - {_fdiv('2*g0', 'n')} AS BIGINT)").alias("w0"),
            F.expr(f"CAST(w1 - {_fdiv('2*g1', '23*n')} AS BIGINT)").alias("w1"),
            F.expr(f"CAST(w2 - {_fdiv('2*g2', '3*n')} AS BIGINT)").alias("w2"),
        ).localCheckpoint(eager=True)
    return (
        base.crossJoin(F.broadcast(w))
        .groupBy("w0", "w1", "w2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.expr(
                f"CAST(floor((sum(CASE WHEN ({_LR_M} >= 0) = (y = 1) THEN 1 ELSE 0 END) * 1.0"
                f" / count(*)) * 10000 + 0.5)/10000.0 AS DOUBLE)"
            ).alias("accuracy"),
            F.expr(
                f"CAST(floor(((sum({_LR_LL}) * CAST(1.0 AS DOUBLE) / 1000000.0) / count(*)) * 10000 + 0.5)"
                f"/10000.0 AS DOUBLE)"
            ).alias("avg_logloss"),
        )
        .select(
            F.col("w0").alias("w0_micro"),
            F.col("w1").alias("w1_micro"),
            F.col("w2").alias("w2_micro"),
            "n",
            "n_pos",
            "accuracy",
            "avg_logloss",
        )
    )


# ---------------------------------------------------------------------------
# Leave-one-out k-NN label-prediction eval on an md5 sample.
# ---------------------------------------------------------------------------
LOO_K = 5
LOO_MOD = 4  # keep vec_ids with md5 bucket == 0 → ~25% eval slice


@register(
    "knn_loo_eval",
    oracle=f"""
    WITH samp AS MATERIALIZED (
      SELECT vec_id, label, embedding FROM embeddings
      WHERE ('0x' || substr(md5('looeval' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
            % {LOO_MOD} = 0),
    nn AS (
      SELECT q.vec_id AS q_id, q.label AS true_label, c.label AS nbr_label,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id) AS rn
      FROM samp q JOIN samp c ON q.vec_id != c.vec_id),
    votes AS (
      SELECT q_id, true_label, nbr_label, count(*) AS v,
             row_number() OVER (PARTITION BY q_id ORDER BY count(*) DESC, nbr_label) AS vr
      FROM nn WHERE rn <= {LOO_K}
      GROUP BY q_id, true_label, nbr_label),
    pred AS (
      SELECT q_id, true_label, nbr_label AS pred_label FROM votes WHERE vr = 1)
    SELECT true_label::BIGINT AS label,
           count(*)::BIGINT AS n_vecs,
           sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)::BIGINT AS n_correct,
           floor((sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) * 1.0
                  / count(*)) * 10000 + 0.5)/10000.0 AS accuracy
    FROM pred GROUP BY true_label ORDER BY label
    """,
)
def q_knn_loo_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN label prediction over a deterministic md5
    sample of the embedding table: each sampled vector is classified by
    the majority label of its 5 nearest neighbors (dot ≡ cosine on unit
    vectors), and per-label accuracy is emitted — the
    embedding-quality eval a retrieval pipeline runs before trusting
    its vectors (labels that don't self-classify have no geometric
    cluster for ANN to find; compare `label_centroid_outliers`, which
    flags individual vectors, and `ann_srp_recall_eval`, which scores
    the index rather than the embedding).

    Determinism: the eval slice is an md5 bucket (no RNG); neighbor
    rank ties break by vec_id, majority-vote ties by smallest label;
    the dot product is the same sequential DOUBLE fold the KNN operators
    use, so both engines rank identically.

    Scale: LOO eval is quadratic BY DESIGN and therefore runs on the
    bounded md5 sample (the standard eval protocol — you never LOO the
    corpus); within the slice it is one self-join with the query side
    broadcast and a size-5 WindowGroupLimit, vectors never shuffled.
    Full-corpus neighbor search belongs to the SRP/IVF candidate paths.
    """
    from .functions.vector import dot_product

    emb = _t(spark, sf_dir, "embeddings")
    samp = emb.filter(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("looeval"), F.col("vec_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % LOO_MOD
        )
        == 0
    ).localCheckpoint(eager=True)
    q = samp.select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("q_emb"),
    )
    pairs = samp.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id",
        "true_label",
        F.col("label").alias("nbr_label"),
        "vec_id",
        dot_product("q_emb", "embedding").alias("s"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("s"), F.asc("vec_id"))
    nn = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= LOO_K)
    wv = Window.partitionBy("q_id").orderBy(F.desc("v"), F.asc("nbr_label"))
    pred = (
        nn.groupBy("q_id", "true_label", "nbr_label")
        .agg(F.count(F.lit(1)).alias("v"))
        .withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
    )
    return (
        pred.groupBy(F.col("true_label").cast("long").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum(F.when(F.col("nbr_label") == F.col("true_label"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
            F.expr(
                "CAST(floor((sum(CASE WHEN nbr_label = true_label THEN 1 ELSE 0 END) * 1.0"
                " / count(*)) * 10000 + 0.5)/10000.0 AS DOUBLE)"
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Maximal-marginal-relevance re-ranking of the exact top-20 candidates.
# ---------------------------------------------------------------------------
MMR_CAND = 20
MMR_PICKS = 5
# objective in micro units: (7·rel − 3·maxsim) / 10, i.e. λ = 0.7
_MMR_OBJ = _fdiv("7*rel - 3*ms", "10")


def _mmr_round_sql(t: int) -> str:
    prev = f"sel{t - 1}"
    return f"""
    pick{t} AS MATERIALIZED (
      SELECT {t}::BIGINT AS pick, r.vec_id, {_MMR_OBJ} AS mmr_micro
      FROM (
        SELECT c.vec_id, c.rel,
               coalesce((SELECT max(s.sim) FROM sims s
                         JOIN {prev} p ON s.b = p.vec_id
                         WHERE s.a = c.vec_id), 0) AS ms
        FROM cand c
        WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})) r
      ORDER BY {_MMR_OBJ} DESC, r.vec_id LIMIT 1),
    sel{t} AS MATERIALIZED (
      SELECT pick, vec_id, mmr_micro FROM {prev}
      UNION ALL SELECT pick, vec_id, mmr_micro FROM pick{t})"""


@register(
    "mmr_diversify_topk",
    oracle=f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    cand AS MATERIALIZED (
      SELECT e.vec_id, e.label,
             CAST(floor(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
                        * 1000000 + 0.5) AS BIGINT) AS rel,
             e.embedding
      FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0
      ORDER BY list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
               e.vec_id
      LIMIT {MMR_CAND}),
    sims AS MATERIALIZED (
      SELECT a.vec_id AS a, b.vec_id AS b,
             CAST(floor(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                        * 1000000 + 0.5) AS BIGINT) AS sim
      FROM cand a JOIN cand b ON a.vec_id != b.vec_id),
    sel0 AS (SELECT CAST(NULL AS BIGINT) AS pick, CAST(NULL AS BIGINT) AS vec_id,
                    CAST(NULL AS BIGINT) AS mmr_micro WHERE FALSE),"""
    + ",".join(_mmr_round_sql(t) for t in range(1, MMR_PICKS + 1))
    + f"""
    SELECT s.pick, s.vec_id, c.label, s.mmr_micro
    FROM sel{MMR_PICKS} s JOIN cand c ON s.vec_id = c.vec_id
    ORDER BY s.pick
    """,
)
def q_mmr_diversify_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversification (Carbonell & Goldstein
    1998) of the exact top-20 KNN candidates for query vector 0: 5
    greedy picks maximizing λ·relevance − (1−λ)·max-similarity-to-
    already-picked (λ = 0.7) — the re-ranker that stops a result page
    being five near-copies of the same document, sitting beside
    `hybrid_rrf_search` (fusion) and the rerank stage (pointwise
    scoring) in the search surface.

    Determinism: relevance and pairwise similarities are quantized to
    micro ints ONCE (floor(dot·1e6 + 0.5)); the greedy objective
    (7·rel − 3·maxsim)/10 is portable floor division (similarities can
    be negative); argmax ties break by vec_id; 5 fixed unrolled rounds.
    The first pick's maxsim is 0 over the empty set, so one uniform
    formula covers every round in both engines.

    Scale: the candidate set is the output of the exact KNN top-k
    (TakeOrderedAndProject, vectors never shuffled); MMR itself touches
    only k=20 rows and a 20×19 similarity table — constant-size work
    re-planned per round on 1-row frames, which is why MMR is always a
    post-top-k stage and never a corpus operator.
    """
    from .functions.vector import dot_product

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cand = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("raw", dot_product("embedding", "q_emb"))
        .orderBy(F.desc("raw"), F.asc("vec_id"))
        .limit(MMR_CAND)
        .select(
            "vec_id",
            "label",
            F.expr("CAST(floor(raw * 1000000 + 0.5) AS BIGINT)").alias("rel"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )
    a = cand.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = cand.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    sims = (
        a.crossJoin(b)
        .filter(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.expr(
                "CAST(floor(aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
                " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) * 1000000 + 0.5) AS BIGINT)"
            ).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    sel = spark.createDataFrame([], "pick long, vec_id long, mmr_micro long")
    for t in range(1, MMR_PICKS + 1):
        ms = (
            sims.join(sel.select(F.col("vec_id").alias("b")), "b")
            .groupBy("a")
            .agg(F.max("sim").alias("ms"))
        )
        pick = (
            cand.join(sel.select("vec_id"), "vec_id", "left_anti")
            .join(ms, cand.vec_id == ms.a, "left")
            .withColumn("ms", F.coalesce(F.col("ms"), F.lit(0)).cast("long"))
            .withColumn("mmr_micro", F.expr(_MMR_OBJ))
            .orderBy(F.desc("mmr_micro"), F.asc("vec_id"))
            .limit(1)
            .select(
                F.lit(t).cast("long").alias("pick"),
                F.col("vec_id").cast("long").alias("vec_id"),
                "mmr_micro",
            )
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    return (
        sel.join(cand.select("vec_id", "label"), "vec_id")
        .select("pick", "vec_id", "label", "mmr_micro")
        .orderBy("pick")
    )


# ---------------------------------------------------------------------------
# Rocchio pseudo-relevance-feedback query expansion.
# ---------------------------------------------------------------------------
PRF_FB = 10  # feedback depth
PRF_TOPK = 10


@register(
    "rocchio_prf_search",
    oracle=f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    sc AS MATERIALIZED (
      SELECT e.vec_id, e.embedding,
             list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS s
      FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0),
    fb AS MATERIALIZED (
      SELECT embedding FROM sc ORDER BY s DESC, vec_id LIMIT {PRF_FB}),
    ex AS (
      SELECT dim, sum(CAST(floor(v * 1000000 + 0.5) AS BIGINT))::BIGINT AS csum
      FROM (SELECT unnest(embedding::DOUBLE[]) AS v,
                   generate_subscripts(embedding::DOUBLE[], 1) AS dim
            FROM fb) u
      GROUP BY dim),
    q0e AS (
      SELECT generate_subscripts(embedding::DOUBLE[], 1) AS dim,
             CAST(floor(unnest(embedding::DOUBLE[]) * 1000000 + 0.5) AS BIGINT) AS q0m
      FROM q),
    qp AS (
      SELECT q0e.dim, (q0m + {_fdiv("csum", str(2 * PRF_FB))}) AS qpv
      FROM q0e JOIN ex ON q0e.dim = ex.dim),
    qparr AS (SELECT list(CAST(qpv AS DOUBLE) ORDER BY dim) AS qpl FROM qp)
    SELECT e.vec_id, e.label,
           floor((list_dot_product(e.embedding::DOUBLE[], qparr.qpl) / 1000000.0)
                 * 10000 + 0.5)/10000.0 AS score
    FROM embeddings e CROSS JOIN qparr WHERE e.vec_id != 0
    ORDER BY list_dot_product(e.embedding::DOUBLE[], qparr.qpl) DESC, e.vec_id
    LIMIT {PRF_TOPK}
    """,
)
def q_rocchio_prf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback for query vector 0: take the
    exact top-10 by dot product, blend their centroid into the query
    (q' = q + β·centroid, β = 0.5), and re-run the exact scan with the
    expanded query — the classical one-round PRF loop that pulls the
    query toward the neighborhood consensus (Rocchio 1971; the
    dense-vector analogue of RM3).  Emits the new top-10.

    Determinism: feedback-document elements are quantized to micro ints
    BEFORE the per-dimension sum (the house float-fold rule, so the
    centroid is addition-order-free); the blend q0_micro + csum/(2·10)
    is portable floor division (elements go negative); the rescan folds
    CAST(micro AS DOUBLE) against each vector with the same sequential
    dot both engines use.

    Scale: PRF costs one extra 64-row aggregate (posexplode of 10
    feedback vectors), a 1-row array rebuild broadcast back into the
    scan, and a second exact TakeOrderedAndProject pass — i.e. exactly
    2× the KNN scan with no new shuffle, which is why PRF survives at
    corpus scale while feedback methods needing per-document state
    don't.
    """
    from .functions.vector import dot_product

    emb = _t(spark, sf_dir, "embeddings")
    docs = emb.filter(F.col("vec_id") != 0)
    # the 1-row query vector feeds both the feedback scan and the q0
    # explode — checkpoint it so only the two genuine PRF corpus passes
    # remain (plan audit showed embeddings x4)
    q = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("q_emb"))
        .localCheckpoint(eager=True)
    )
    fb = (
        docs.crossJoin(F.broadcast(q))
        .withColumn("s", dot_product("embedding", "q_emb"))
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(PRF_FB)
        .select("embedding")
    )
    ex = (
        fb.select(F.posexplode("embedding").alias("dim0", "v"))
        .groupBy((F.col("dim0") + 1).alias("dim"))
        .agg(
            F.sum(F.expr("CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"))
            .cast("long")
            .alias("csum")
        )
    )
    q0e = q.select(F.posexplode("q_emb").alias("dim0", "v")).select(
        (F.col("dim0") + 1).alias("dim"),
        F.expr("CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").alias("q0m"),
    )
    qp = q0e.join(ex, "dim").select(
        "dim", F.expr(f"q0m + {_fdiv('csum', str(2 * PRF_FB))}").alias("qpv")
    )
    qparr = qp.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, qpv))), x -> CAST(x.qpv AS DOUBLE))"
        ).alias("qpl")
    )
    rescored = (
        docs.crossJoin(F.broadcast(qparr))
        .withColumn("raw", dot_product("embedding", "qpl"))
    )
    return (
        rescored.orderBy(F.desc("raw"), F.asc("vec_id"))
        .limit(PRF_TOPK)
        .select(
            "vec_id",
            "label",
            F.expr("CAST(floor((raw / 1000000.0) * 10000 + 0.5)/10000.0 AS DOUBLE)").alias(
                "score"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier conversion survival (signup → first purchase, censored).
# ---------------------------------------------------------------------------
_KM_LNFAC = (
    "CAST(floor(ln(CAST(n_risk - n_events AS DOUBLE) / CAST(n_risk AS DOUBLE))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)
_KM_SURV = "exp(CAST(cum_ln AS DOUBLE) / 1000000.0)"


@register(
    "kaplan_meier_conversion",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type FROM events),
    horizon AS (SELECT max(us)::BIGINT AS h FROM e),
    t0 AS (
      SELECT user_id, min(CASE WHEN event_type = 'signup' THEN us END)::BIGINT AS s_us
      FROM e GROUP BY user_id HAVING s_us IS NOT NULL),
    conv AS (
      SELECT t0.user_id, t0.s_us,
             min(CASE WHEN e.event_type = 'purchase' AND e.us > t0.s_us
                      THEN e.us END)::BIGINT AS p_us
      FROM t0 JOIN e ON e.user_id = t0.user_id
      GROUP BY t0.user_id, t0.s_us),
    dur AS (
      SELECT user_id,
             CASE WHEN p_us IS NOT NULL THEN (p_us - s_us) // 86400000000
                  ELSE ((SELECT h FROM horizon) - s_us) // 86400000000
             END AS d,
             CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM conv),
    days AS (
      SELECT d, sum(ev)::BIGINT AS n_events,
             sum(1 - ev)::BIGINT AS n_censored
      FROM dur GROUP BY d),
    risk AS (
      SELECT d, n_events, n_censored,
             sum(n_events + n_censored)
               OVER (ORDER BY d DESC ROWS UNBOUNDED PRECEDING)::BIGINT AS n_risk
      FROM days),
    evd AS (
      SELECT d, n_risk, n_events, n_censored,
             {_KM_LNFAC} AS lnfac
      FROM risk WHERE n_events > 0 AND n_risk > n_events),
    surv AS (
      SELECT d, n_risk, n_events, n_censored,
             sum(lnfac) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_ln
      FROM evd)
    SELECT d::BIGINT AS duration_days, n_risk, n_events, n_censored,
           floor(({_KM_SURV})*10000 + 0.5)/10000.0 AS survival
    FROM surv ORDER BY duration_days
    """,
)
def q_kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for signup→first-purchase conversion
    with right censoring: per user, duration = days from first signup to
    first strictly-later purchase, censored at the data horizon when no
    purchase follows; S(d) = Π_{{event days ≤ d}} (1 − d_i/n_i) over
    risk sets that shrink by both events and censorings — THE estimator
    for "how long until users convert" that naive latency averages get
    wrong by silently dropping the users who never did (compare
    `conversion_latency_percentiles`, which conditions on conversion).

    Exactness: durations and risk-set counts are exact integers; each
    event day contributes ONE shared ln((n−d)/n) quantized to micro-nats
    BEFORE the cumulative sum (an ordered prefix sum over the day-level
    aggregate — deterministic under any partitioning); survival is
    exp(cum/1e6) floor-quantized on emit.  Days with n_events = 0 add no
    factor (censoring-only days shape n_risk, not S), matching the
    estimator's definition.

    Scale: everything upstream is two partial-agg'd groupBys over events
    (per-user firsts, then per-day counts); the windows run on the
    AGGREGATE day table (one row per duration day — decades ≈ 10⁴ rows),
    so the unpartitioned prefix sums cost nothing at any corpus size.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts)").alias("us"),
        "event_type",
    )
    horizon = ev.agg(F.max("us").cast("long").alias("h"))
    t0 = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("us")))
            .cast("long")
            .alias("s_us")
        )
        .filter(F.col("s_us").isNotNull())
    )
    conv = (
        t0.join(ev, "user_id")
        .groupBy("user_id", "s_us")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("us") > F.col("s_us")),
                    F.col("us"),
                )
            )
            .cast("long")
            .alias("p_us")
        )
    )
    dur = conv.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("p_us").isNotNull(),
            F.expr("(p_us - s_us) DIV 86400000000"),
        )
        .otherwise(F.expr("(h - s_us) DIV 86400000000"))
        .alias("d"),
        F.when(F.col("p_us").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    days = dur.groupBy("d").agg(
        F.sum("ev").cast("long").alias("n_events"),
        F.sum(1 - F.col("ev")).cast("long").alias("n_censored"),
    )
    w_risk = Window.orderBy(F.desc("d")).rowsBetween(Window.unboundedPreceding, 0)
    risk = days.withColumn(
        "n_risk",
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_risk).cast("long"),
    )
    evd = risk.filter((F.col("n_events") > 0) & (F.col("n_risk") > F.col("n_events"))).withColumn(
        "lnfac", F.expr(_KM_LNFAC)
    )
    w_surv = Window.orderBy(F.asc("d")).rowsBetween(Window.unboundedPreceding, 0)
    surv = evd.withColumn("cum_ln", F.sum("lnfac").over(w_surv).cast("long"))
    return surv.select(
        F.col("d").cast("long").alias("duration_days"),
        "n_risk",
        "n_events",
        "n_censored",
        F.expr(f"CAST(floor(({_KM_SURV})*10000 + 0.5)/10000.0 AS DOUBLE)").alias("survival"),
    ).orderBy("duration_days")


# ---------------------------------------------------------------------------
# Split-conformal prediction interval for a group-mean price model.
# ---------------------------------------------------------------------------
CONF_ALPHA_NUM = 9  # nominal coverage 9/10
_CONF_Y = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_CONF_BUCKET = (
    "('0x' || substr(md5('conf' || CAST(l_orderkey AS VARCHAR) || '-' "
    "|| CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT % 5"
)


@register(
    "conformal_price_interval",
    oracle=f"""
    WITH li AS MATERIALIZED (
      SELECT l_returnflag AS rf, l_linestatus AS ls, {_CONF_Y} AS y,
             {_CONF_BUCKET} AS bucket
      FROM lineitem),
    model AS (
      SELECT rf, ls, {_fdiv("sum(y)", "count(*)")} AS mu
      FROM li WHERE bucket <= 2 GROUP BY rf, ls),
    cal AS (
      SELECT abs(li.y - m.mu)::BIGINT AS r
      FROM li JOIN model m ON li.rf = m.rf AND li.ls = m.ls
      WHERE li.bucket = 3),
    ncal AS (SELECT count(*)::BIGINT AS n_cal FROM cal),
    rk AS (SELECT r, row_number() OVER (ORDER BY r) AS rn FROM cal),
    qhat AS (
      SELECT min(r)::BIGINT AS q FROM rk CROSS JOIN ncal
      WHERE rn >= (({CONF_ALPHA_NUM} * (n_cal + 1)) + 9) // 10),
    test AS (
      SELECT abs(li.y - m.mu)::BIGINT AS r
      FROM li JOIN model m ON li.rf = m.rf AND li.ls = m.ls
      WHERE li.bucket = 4),
    ntr AS (SELECT count(*)::BIGINT AS n_train FROM li WHERE bucket <= 2)
    SELECT ntr.n_train, ncal.n_cal,
           count(*)::BIGINT AS n_test,
           qhat.q AS q_hat_cents,
           CAST(0.9 AS DOUBLE) AS nominal,
           floor((sum(CASE WHEN test.r <= qhat.q THEN 1 ELSE 0 END) * 1.0
                  / count(*)) * 10000 + 0.5)/10000.0 AS coverage
    FROM test CROSS JOIN qhat CROSS JOIN ncal CROSS JOIN ntr
    GROUP BY ntr.n_train, ncal.n_cal, qhat.q
    """,
)
def q_conformal_price_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval around a group-mean price
    model: fit per-(returnflag, linestatus) mean prices on an md5 60%
    train split, take q̂ = the ⌈0.9·(n+1)⌉-th smallest absolute residual
    on a disjoint calibration split, and report empirical coverage of
    μ ± q̂ on the held-out test split — the distribution-free interval
    whose ≥90% marginal coverage holds for ANY model, which is why
    conformal calibration is the production way to ship uncertainty
    from an engine that can't retrain per query.  Coverage landing near
    0.9 on the test split is the estimator working as guaranteed.

    Exactness: cents targets and md5 buckets are integers; the model is
    portable floor-division means; q̂ is an exact order statistic
    (min r with rank ≥ ⌈0.9(n+1)⌉, the ceiling done in integers as
    (9(n+1)+9)//10); coverage is one integer count with a single float
    division on emit.

    Scale: the fit is one groupBy over the train slice (6 groups); the
    quantile is a rank selection on the calibration slice (range-
    partitioned sort at cluster scale — the same global-order machinery
    the percentile queries use); coverage is one broadcast-joined scan
    of the test slice.  No step touches more than one pass over each
    split.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        F.expr(_CONF_Y).alias("y"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("conf"),
                            F.col("l_orderkey").cast("string"),
                            F.lit("-"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 5
        ).alias("bucket"),
    )
    # checkpoint the tiny per-group model and the calibration residuals:
    # both fan out to multiple consumers and would lineage-replay the
    # lineitem scan per use (plan_audit measured 18 scans before)
    model = (
        li.filter(F.col("bucket") <= 2)
        .groupBy("rf", "ls")
        .agg(F.expr(_fdiv("sum(y)", "count(*)")).alias("mu"))
        .localCheckpoint(eager=True)
    )
    joined = li.join(F.broadcast(model), ["rf", "ls"])
    cal = joined.filter(F.col("bucket") == 3).select(
        F.abs(F.col("y") - F.col("mu")).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    ncal = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    w = Window.orderBy("r")
    qhat = (
        cal.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(ncal))
        .filter(F.col("rn") >= F.expr(f"(({CONF_ALPHA_NUM} * (n_cal + 1)) + 9) DIV 10"))
        .agg(F.min("r").cast("long").alias("q"))
    )
    ntr = li.filter(F.col("bucket") <= 2).agg(
        F.count(F.lit(1)).cast("long").alias("n_train")
    )
    test = joined.filter(F.col("bucket") == 4).select(
        F.abs(F.col("y") - F.col("mu")).cast("long").alias("r")
    )
    return (
        test.crossJoin(F.broadcast(qhat))
        .crossJoin(F.broadcast(ncal))
        .crossJoin(F.broadcast(ntr))
        .groupBy("n_train", "n_cal", "q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.expr(
                "CAST(floor((sum(CASE WHEN r <= q THEN 1 ELSE 0 END) * 1.0"
                " / count(*)) * 10000 + 0.5)/10000.0 AS DOUBLE)"
            ).alias("coverage"),
        )
        .select(
            "n_train",
            "n_cal",
            "n_test",
            F.col("q").alias("q_hat_cents"),
            F.lit(0.9).cast("double").alias("nominal"),
            "coverage",
        )
    )


# ---------------------------------------------------------------------------
# Depth-2 decision tree (level-wise histogram growth) on the returns label.
# ---------------------------------------------------------------------------
def _tree_oracle() -> str:
    from .registry_ml import _STUMP_FEATURES, _STUMP_LABEL, _gini_gain

    val_branches = "\n      UNION ALL ".join(
        f"SELECT '{name}' AS feature, {expr} AS val, {_STUMP_LABEL} AS pos"
        f" FROM lineitem"
        for name, expr in _STUMP_FEATURES
    )
    tagged_branches = "\n      UNION ALL ".join(
        f"SELECT node, '{name}' AS feature, {expr} AS val, pos FROM tag_li"
        for name, expr in _STUMP_FEATURES
    )
    chosen_val = (
        "CASE r.feature "
        + " ".join(f"WHEN '{name}' THEN {expr}" for name, expr in _STUMP_FEATURES)
        + " END"
    )
    gain = _gini_gain("cum_n", "cum_pos", "n_tot", "pos_tot")
    return f"""
    WITH base AS MATERIALIZED ({val_branches}),
    agg0 AS (
      SELECT feature, val, count(*)::BIGINT AS cnt, sum(pos)::BIGINT AS pos
      FROM base GROUP BY 1, 2),
    cum0 AS (
      SELECT feature, val, (sum(cnt) OVER w)::BIGINT AS cum_n,
             (sum(pos) OVER w)::BIGINT AS cum_pos,
             (sum(cnt) OVER (PARTITION BY feature))::BIGINT AS n_tot,
             (sum(pos) OVER (PARTITION BY feature))::BIGINT AS pos_tot
      FROM agg0
      WINDOW w AS (PARTITION BY feature ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    root AS MATERIALIZED (
      SELECT feature, val, cum_n, cum_pos, n_tot, pos_tot,
             floor(({gain})*1000000000 + 0.5)::BIGINT AS gain_nano
      FROM cum0 WHERE cum_n < n_tot
      ORDER BY floor(({gain})*1000000000 + 0.5) DESC, feature, val LIMIT 1),
    tag_li AS MATERIALIZED (
      SELECT lineitem.*, {_STUMP_LABEL} AS pos,
             CASE WHEN ({chosen_val}) <= r.val
                  THEN 'left' ELSE 'right' END AS node
      FROM lineitem CROSS JOIN root r),
    tagged AS MATERIALIZED ({tagged_branches}),
    agg1 AS (
      SELECT node, feature, val, count(*)::BIGINT AS cnt, sum(pos)::BIGINT AS pos
      FROM tagged GROUP BY 1, 2, 3),
    cum1 AS (
      SELECT node, feature, val, (sum(cnt) OVER w)::BIGINT AS cum_n,
             (sum(pos) OVER w)::BIGINT AS cum_pos,
             (sum(cnt) OVER (PARTITION BY node, feature))::BIGINT AS n_tot,
             (sum(pos) OVER (PARTITION BY node, feature))::BIGINT AS pos_tot
      FROM agg1
      WINDOW w AS (PARTITION BY node, feature ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    childbest AS (
      SELECT node, feature, val, cum_n, cum_pos, n_tot, pos_tot, gain_nano
      FROM (
        SELECT *, floor(({gain})*1000000000 + 0.5)::BIGINT AS gain_nano,
               row_number() OVER (PARTITION BY node
                                  ORDER BY floor(({gain})*1000000000 + 0.5) DESC,
                                           feature, val) AS rn
        FROM cum1 WHERE cum_n < n_tot)
      WHERE rn = 1),
    allnodes AS (
      SELECT 'root' AS node, feature, val, cum_n, cum_pos, n_tot, pos_tot, gain_nano
      FROM root
      UNION ALL
      SELECT node, feature, val, cum_n, cum_pos, n_tot, pos_tot, gain_nano
      FROM childbest)
    SELECT node, feature, val AS threshold,
           floor((gain_nano / 1000000000.0)*10000 + 0.5)/10000.0 AS gain,
           n_tot AS n_node, pos_tot AS pos_node,
           cum_n AS n_left, cum_pos AS pos_left,
           (n_tot - cum_n)::BIGINT AS n_right,
           (pos_tot - cum_pos)::BIGINT AS pos_right
    FROM allnodes ORDER BY node
    """


@register("decision_tree_depth2", oracle=_tree_oracle())
def q_decision_tree_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 decision tree on the lineitem returns label, grown
    level-wise with the histogram algorithm: the root split is the exact
    Gini-gain argmax over all (feature, threshold) cells (the
    `decision_stump_returns` search, globalized); rows are then tagged
    left/right by ONE broadcast scalar, and each child runs the same
    histogram search on its slice — i.e. exactly how XGBoost/LightGBM
    grow a level, with the (node, feature, bin) histogram as the only
    shuffled state.  Emits root + both children with thresholds, gains
    and branch class counts.

    Determinism: histogram counts are exact integers; the Gini gain is
    ONE shared DOUBLE text (fixed operand order) nano-quantized before
    every argmax; argmax ties break (feature, val); the left/right tag
    compares the chosen feature's INTEGER value to the integer
    threshold.  Child nodes whose slice cannot split (single distinct
    value) would simply emit no row.

    Scale: two scans — one per tree level, NOT one per candidate split:
    each level is a partial-agg'd (node, feature, bin) histogram
    (bounded by Σ|feature domains| × nodes, ~320 cells here) plus a
    1-row TakeOrderedAndProject argmax broadcast back.  This is the
    reason histogram-based trees train on 100 TB: the shuffle carries
    histograms, never rows.
    """
    from .registry_ml import _STUMP_FEATURES, _STUMP_LABEL, _gini_gain

    li = _t(spark, sf_dir, "lineitem")
    fv = F.explode(
        F.array(
            *[
                F.struct(F.lit(name).alias("feature"), F.expr(expr).alias("val"))
                for name, expr in _STUMP_FEATURES
            ]
        )
    ).alias("fv")
    base = li.select(fv, F.expr(_STUMP_LABEL).alias("pos")).select(
        "fv.feature", "fv.val", "pos"
    )
    gain = _gini_gain("cum_n", "cum_pos", "n_tot", "pos_tot")

    def _best(df: DataFrame, keys: list[str]) -> DataFrame:
        agg = df.groupBy(*keys, "feature", "val").agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("pos").cast("long").alias("pos"),
        )
        w = (
            Window.partitionBy(*keys, "feature")
            .orderBy("val")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wt = Window.partitionBy(*keys, "feature")
        cum = agg.select(
            *keys,
            "feature",
            "val",
            F.sum("cnt").over(w).cast("long").alias("cum_n"),
            F.sum("pos").over(w).cast("long").alias("cum_pos"),
            F.sum("cnt").over(wt).cast("long").alias("n_tot"),
            F.sum("pos").over(wt).cast("long").alias("pos_tot"),
        ).filter(F.col("cum_n") < F.col("n_tot"))
        scored = cum.withColumn(
            "gain_nano", F.expr(f"CAST(floor(({gain})*1000000000 + 0.5) AS BIGINT)")
        )
        if keys:
            wr = Window.partitionBy(*keys).orderBy(
                F.desc("gain_nano"), F.asc("feature"), F.asc("val")
            )
            return scored.withColumn("rn", F.row_number().over(wr)).filter(
                F.col("rn") == 1
            ).drop("rn")
        return scored.orderBy(F.desc("gain_nano"), F.asc("feature"), F.asc("val")).limit(1)

    root = _best(base, []).localCheckpoint(eager=True)
    chosen_val = (
        "CASE r_feature "
        + " ".join(f"WHEN '{name}' THEN {expr}" for name, expr in _STUMP_FEATURES)
        + " END"
    )
    tagged = (
        li.crossJoin(
            F.broadcast(
                root.select(
                    F.col("feature").alias("r_feature"), F.col("val").alias("r_val")
                )
            )
        )
        .withColumn(
            "node",
            F.when(F.expr(chosen_val) <= F.col("r_val"), F.lit("left")).otherwise(
                F.lit("right")
            ),
        )
        .select("node", fv, F.expr(_STUMP_LABEL).alias("pos"))
        .select("node", "fv.feature", "fv.val", "pos")
    )
    childbest = _best(tagged, ["node"])
    allnodes = root.withColumn("node", F.lit("root")).select(
        "node", "feature", "val", "cum_n", "cum_pos", "n_tot", "pos_tot", "gain_nano"
    ).unionByName(
        childbest.select(
            "node", "feature", "val", "cum_n", "cum_pos", "n_tot", "pos_tot", "gain_nano"
        )
    )
    return allnodes.select(
        "node",
        "feature",
        F.col("val").alias("threshold"),
        F.expr(
            "CAST(floor((gain_nano / 1000000000.0)*10000 + 0.5)/10000.0 AS DOUBLE)"
        ).alias("gain"),
        F.col("n_tot").alias("n_node"),
        F.col("pos_tot").alias("pos_node"),
        F.col("cum_n").alias("n_left"),
        F.col("cum_pos").alias("pos_left"),
        (F.col("n_tot") - F.col("cum_n")).cast("long").alias("n_right"),
        (F.col("pos_tot") - F.col("cum_pos")).cast("long").alias("pos_right"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# Depth-3 decision tree: the level-wise histogram machinery, composed.
# ---------------------------------------------------------------------------
def _tree3_oracle() -> str:
    from .registry_ml import _STUMP_FEATURES, _STUMP_LABEL, _gini_gain

    val_branches = "\n      UNION ALL ".join(
        f"SELECT '{name}' AS feature, {expr} AS val, {_STUMP_LABEL} AS pos"
        f" FROM lineitem"
        for name, expr in _STUMP_FEATURES
    )
    tag1_branches = "\n      UNION ALL ".join(
        f"SELECT node, '{name}' AS feature, {expr} AS val, pos FROM tag1"
        for name, expr in _STUMP_FEATURES
    )
    tag2_branches = "\n      UNION ALL ".join(
        f"SELECT node2 AS node, '{name}' AS feature, {expr} AS val, pos FROM tag2"
        for name, expr in _STUMP_FEATURES
    )
    chosen_root = (
        "CASE r.feature "
        + " ".join(f"WHEN '{name}' THEN {expr}" for name, expr in _STUMP_FEATURES)
        + " END"
    )
    chosen_child = (
        "CASE cb.feature "
        + " ".join(f"WHEN '{name}' THEN {expr}" for name, expr in _STUMP_FEATURES)
        + " END"
    )
    gain = _gini_gain("cum_n", "cum_pos", "n_tot", "pos_tot")

    def best_over(src: str, out: str, keyed: bool) -> str:
        part = "PARTITION BY node, feature" if keyed else "PARTITION BY feature"
        npart = "PARTITION BY node" if keyed else ""
        node_sel = "node, " if keyed else "'root' AS node, "
        if keyed:
            return f"""{out} AS MATERIALIZED (
      SELECT node, feature, val, cum_n, cum_pos, n_tot, pos_tot, gain_nano
      FROM (
        SELECT *, floor(({gain})*1000000000 + 0.5)::BIGINT AS gain_nano,
               row_number() OVER ({npart}
                                  ORDER BY floor(({gain})*1000000000 + 0.5) DESC,
                                           feature, val) AS rn
        FROM (
          SELECT {node_sel}feature, val,
                 (sum(cnt) OVER w)::BIGINT AS cum_n,
                 (sum(pos) OVER w)::BIGINT AS cum_pos,
                 (sum(cnt) OVER ({part}))::BIGINT AS n_tot,
                 (sum(pos) OVER ({part}))::BIGINT AS pos_tot
          FROM {src}
          WINDOW w AS ({part} ORDER BY val
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) c
        WHERE cum_n < n_tot) x
      WHERE rn = 1)"""
        return f"""{out} AS MATERIALIZED (
      SELECT feature, val, cum_n, cum_pos, n_tot, pos_tot,
             floor(({gain})*1000000000 + 0.5)::BIGINT AS gain_nano
      FROM (
          SELECT feature, val,
                 (sum(cnt) OVER w)::BIGINT AS cum_n,
                 (sum(pos) OVER w)::BIGINT AS cum_pos,
                 (sum(cnt) OVER ({part}))::BIGINT AS n_tot,
                 (sum(pos) OVER ({part}))::BIGINT AS pos_tot
          FROM {src}
          WINDOW w AS ({part} ORDER BY val
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) c
      WHERE cum_n < n_tot
      ORDER BY gain_nano DESC, feature, val LIMIT 1)"""

    return f"""
    WITH base AS MATERIALIZED ({val_branches}),
    agg0 AS (
      SELECT feature, val, count(*)::BIGINT AS cnt, sum(pos)::BIGINT AS pos
      FROM base GROUP BY 1, 2),
    {best_over("agg0", "root", False)},
    tag1 AS MATERIALIZED (
      SELECT lineitem.*, {_STUMP_LABEL} AS pos,
             CASE WHEN ({chosen_root}) <= r.val
                  THEN 'left' ELSE 'right' END AS node
      FROM lineitem CROSS JOIN root r),
    t1 AS MATERIALIZED ({tag1_branches}),
    agg1 AS (
      SELECT node, feature, val, count(*)::BIGINT AS cnt, sum(pos)::BIGINT AS pos
      FROM t1 GROUP BY 1, 2, 3),
    {best_over("agg1", "lvl1", True)},
    tag2 AS MATERIALIZED (
      SELECT tag1.*,
             tag1.node || '.' ||
             CASE WHEN ({chosen_child}) <= cb.val
                  THEN 'left' ELSE 'right' END AS node2
      FROM tag1 JOIN lvl1 cb ON tag1.node = cb.node),
    t2 AS MATERIALIZED ({tag2_branches}),
    agg2 AS (
      SELECT node, feature, val, count(*)::BIGINT AS cnt, sum(pos)::BIGINT AS pos
      FROM t2 GROUP BY 1, 2, 3),
    {best_over("agg2", "lvl2", True)},
    allnodes AS (
      SELECT 'root' AS node, feature, val, cum_n, cum_pos, n_tot, pos_tot, gain_nano
      FROM root
      UNION ALL
      SELECT node, feature, val, cum_n, cum_pos, n_tot, pos_tot, gain_nano FROM lvl1
      UNION ALL
      SELECT node, feature, val, cum_n, cum_pos, n_tot, pos_tot, gain_nano FROM lvl2)
    SELECT node, feature, val AS threshold,
           floor((gain_nano / 1000000000.0)*10000 + 0.5)/10000.0 AS gain,
           n_tot AS n_node, pos_tot AS pos_node,
           cum_n AS n_left, cum_pos AS pos_left,
           (n_tot - cum_n)::BIGINT AS n_right,
           (pos_tot - cum_pos)::BIGINT AS pos_right
    FROM allnodes ORDER BY node
    """


@register("decision_tree_depth3", oracle=_tree3_oracle())
def q_decision_tree_depth3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-3 decision tree on the lineitem returns label — the
    `decision_tree_depth2` level-wise histogram machinery COMPOSED one
    level deeper, which is the claim that separates "a depth-2 demo"
    from "trees train at scale": each added level costs exactly one more
    scan + one more (node, feature, bin) histogram, never a per-node or
    per-candidate pass.  Emits root + 2 children + up to 4 grandchildren
    (nodes whose slice cannot split emit no row) with thresholds, gains
    and branch class counts; on this label-independent synthetic corpus
    the gains stay near zero at every depth — the honest no-signal read
    the stump/bagging family already established.

    Determinism: identical to depth-2 — exact integer histograms, the
    shared nano-quantized Gini text for every argmax, (feature, val)
    tie-breaks, integer threshold routing; level-2 node names are path
    strings ('left.right' = root-left then child-right).

    Scale: three scans — ONE PER LEVEL, the histogram-tree invariant.
    Each level's shuffle carries (node, feature, bin) cells (≤ nodes ×
    Σ|feature domains| ≈ 4 × 140 at depth 3), each split argmax is a
    broadcast-joined ≤ 4-row frame, and rows are re-tagged by comparing
    one integer column against a broadcast threshold — no row ever
    carries more than its tag.  Depth d ⇒ d scans and ≤ 2^d × cells
    shuffled; this is exactly why histogram GBDTs train on 100 TB.
    """
    from .registry_ml import _STUMP_FEATURES, _STUMP_LABEL, _gini_gain

    li = _t(spark, sf_dir, "lineitem")
    fv = F.explode(
        F.array(
            *[
                F.struct(F.lit(name).alias("feature"), F.expr(expr).alias("val"))
                for name, expr in _STUMP_FEATURES
            ]
        )
    ).alias("fv")
    gain = _gini_gain("cum_n", "cum_pos", "n_tot", "pos_tot")

    def _best(df: DataFrame, keyed: bool) -> DataFrame:
        keys = ["node"] if keyed else []
        agg = df.groupBy(*keys, "feature", "val").agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("pos").cast("long").alias("pos"),
        )
        w = (
            Window.partitionBy(*keys, "feature")
            .orderBy("val")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wt = Window.partitionBy(*keys, "feature")
        cum = agg.select(
            *keys,
            "feature",
            "val",
            F.sum("cnt").over(w).cast("long").alias("cum_n"),
            F.sum("pos").over(w).cast("long").alias("cum_pos"),
            F.sum("cnt").over(wt).cast("long").alias("n_tot"),
            F.sum("pos").over(wt).cast("long").alias("pos_tot"),
        ).filter(F.col("cum_n") < F.col("n_tot"))
        scored = cum.withColumn(
            "gain_nano", F.expr(f"CAST(floor(({gain})*1000000000 + 0.5) AS BIGINT)")
        )
        if keyed:
            wr = Window.partitionBy("node").orderBy(
                F.desc("gain_nano"), F.asc("feature"), F.asc("val")
            )
            return (
                scored.withColumn("rn", F.row_number().over(wr))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
        return scored.orderBy(
            F.desc("gain_nano"), F.asc("feature"), F.asc("val")
        ).limit(1)

    base = li.select(fv, F.expr(_STUMP_LABEL).alias("pos")).select(
        "fv.feature", "fv.val", "pos"
    )
    root = _best(base, False).localCheckpoint(eager=True)
    chosen_root = (
        "CASE r_feature "
        + " ".join(f"WHEN '{name}' THEN {expr}" for name, expr in _STUMP_FEATURES)
        + " END"
    )
    tag1 = (
        li.crossJoin(
            F.broadcast(
                root.select(
                    F.col("feature").alias("r_feature"), F.col("val").alias("r_val")
                )
            )
        )
        .withColumn(
            "node",
            F.when(F.expr(chosen_root) <= F.col("r_val"), F.lit("left")).otherwise(
                F.lit("right")
            ),
        )
        .drop("r_feature", "r_val")
    )
    lvl1 = _best(
        tag1.select("node", fv, F.expr(_STUMP_LABEL).alias("pos")).select(
            "node", "fv.feature", "fv.val", "pos"
        ),
        True,
    ).localCheckpoint(eager=True)
    chosen_child = (
        "CASE c_feature "
        + " ".join(f"WHEN '{name}' THEN {expr}" for name, expr in _STUMP_FEATURES)
        + " END"
    )
    tag2 = (
        tag1.join(
            F.broadcast(
                lvl1.select(
                    "node",
                    F.col("feature").alias("c_feature"),
                    F.col("val").alias("c_val"),
                )
            ),
            "node",
        )
        .withColumn(
            "node2",
            F.concat(
                F.col("node"),
                F.lit("."),
                F.when(F.expr(chosen_child) <= F.col("c_val"), F.lit("left")).otherwise(
                    F.lit("right")
                ),
            ),
        )
        .drop("c_feature", "c_val")
    )
    lvl2 = _best(
        tag2.select(
            F.col("node2").alias("node"), fv, F.expr(_STUMP_LABEL).alias("pos")
        ).select("node", "fv.feature", "fv.val", "pos"),
        True,
    )
    cols = ["node", "feature", "val", "cum_n", "cum_pos", "n_tot", "pos_tot", "gain_nano"]
    allnodes = (
        root.withColumn("node", F.lit("root"))
        .select(*cols)
        .unionByName(lvl1.select(*cols))
        .unionByName(lvl2.select(*cols))
    )
    return allnodes.select(
        "node",
        "feature",
        F.col("val").alias("threshold"),
        F.expr(
            "CAST(floor((gain_nano / 1000000000.0)*10000 + 0.5)/10000.0 AS DOUBLE)"
        ).alias("gain"),
        F.col("n_tot").alias("n_node"),
        F.col("pos_tot").alias("pos_node"),
        F.col("cum_n").alias("n_left"),
        F.col("cum_pos").alias("pos_left"),
        (F.col("n_tot") - F.col("cum_n")).cast("long").alias("n_right"),
        (F.col("pos_tot") - F.col("cum_pos")).cast("long").alias("pos_right"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# Double-sweep diameter lower bound per dup-graph component.
# ---------------------------------------------------------------------------
DIAM_ROUNDS = 6


def _sweep_sql(tag: str, start: str, rounds: int) -> str:
    """Unrolled per-component BFS: state (comp, doc_id, dist), each round
    relaxes over the edge list and keeps the min per (comp, node)."""
    ctes = []
    prev = start
    for i in range(rounds):
        cur = f"{tag}{i + 1}"
        ctes.append(
            f"""{cur} AS MATERIALIZED (
      SELECT comp, doc_id, min(dist)::BIGINT AS dist FROM (
        SELECT comp, doc_id, dist FROM {prev}
        UNION ALL
        SELECT p.comp, e.b AS doc_id, p.dist + 1 AS dist
        FROM edges e JOIN {prev} p ON e.a = p.doc_id) u
      GROUP BY comp, doc_id)"""
        )
        prev = cur
    return ",\n    ".join(ctes)


@register(
    "graph_double_sweep_diameter",
    oracle=_SQL_DUP_EDGES.replace("WITH ", "WITH RECURSIVE ", 1).replace(
        "edges AS (SELECT", "edges AS MATERIALIZED (SELECT"
    )
    + f""",
    nodes AS MATERIALIZED (SELECT DISTINCT a AS doc_id FROM edges),
    reach(doc_id, root) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.doc_id),
    cc AS MATERIALIZED (SELECT doc_id, min(root)::BIGINT AS comp
                        FROM reach GROUP BY doc_id),
    s0 AS (SELECT comp, comp AS doc_id, 0::BIGINT AS dist FROM cc GROUP BY comp),
    {_sweep_sql("s", "s0", DIAM_ROUNDS)},
    far AS MATERIALIZED (
      SELECT comp, doc_id AS ecc_node, dist AS ecc FROM (
        SELECT comp, doc_id, dist,
               row_number() OVER (PARTITION BY comp
                                  ORDER BY dist DESC, doc_id) AS rn
        FROM s{DIAM_ROUNDS}) x WHERE rn = 1),
    t0 AS (SELECT comp, ecc_node AS doc_id, 0::BIGINT AS dist FROM far),
    {_sweep_sql("t", "t0", DIAM_ROUNDS)},
    sz AS (SELECT comp, count(*)::BIGINT AS n_nodes FROM cc GROUP BY comp)
    SELECT f.comp AS component, sz.n_nodes, f.ecc_node,
           max(t.dist)::BIGINT AS diameter_lb
    FROM t{DIAM_ROUNDS} t
    JOIN far f ON t.comp = f.comp
    JOIN sz ON sz.comp = f.comp
    GROUP BY f.comp, sz.n_nodes, f.ecc_node
    ORDER BY component
    """,
)
def q_graph_double_sweep_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component diameter lower bound of the verified near-duplicate
    graph by the double-sweep heuristic: BFS from each component's root
    (its min doc_id), take the farthest node (the eccentric witness,
    ties to the smallest id), BFS again from it — the second sweep's
    max distance is the classic tight diameter lower bound (exact on
    trees, which near-dup template families usually are).  Diameter
    tells remediation how stringy a component is: diameter 1–2 means a
    genuine template clique; a long chain means transitive LSH gluing
    that cluster-keep-best should NOT collapse to one keeper.

    Determinism: both sweeps are fixed-round integer min-plus relaxations
    keyed by (component, node); the witness argmax ties to the smallest
    doc_id; everything is exact integers, mirrored by the unrolled-CTE
    oracle.

    Scale: the state is (comp, node, dist) — ALL components sweep
    simultaneously in the same joins (frontier-as-a-column, the Pregel
    form), so the cost is 2×6 edge-list joins with partial-agg'd mins
    regardless of component count; eager localCheckpoint per round keeps
    the plan constant-size.
    """
    from .operators.dedup import connected_components

    edges = _sym_edges(spark, sf_dir)
    pairs = _shared_verified_pairs(spark, sf_dir)
    cc = connected_components(pairs.select("id_1", "id_2")).select(
        F.col("node").alias("doc_id"), F.col("label").cast("long").alias("comp")
    ).localCheckpoint(eager=True)

    def _sweep(start: DataFrame) -> DataFrame:
        dist = start.localCheckpoint(eager=True)
        for _ in range(DIAM_ROUNDS):
            relaxed = edges.join(dist, edges.a == dist.doc_id).select(
                "comp", F.col("b").alias("doc_id"), (F.col("dist") + 1).alias("dist")
            )
            dist = (
                dist.unionByName(relaxed)
                .groupBy("comp", "doc_id")
                .agg(F.min("dist").cast("long").alias("dist"))
                .localCheckpoint(eager=True)
            )
        return dist

    s0 = cc.select("comp").distinct().select(
        "comp", F.col("comp").alias("doc_id"), F.lit(0).cast("long").alias("dist")
    )
    sweep1 = _sweep(s0)
    w = Window.partitionBy("comp").orderBy(F.desc("dist"), F.asc("doc_id"))
    far = (
        sweep1.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("comp", F.col("doc_id").alias("ecc_node"))
        .localCheckpoint(eager=True)
    )
    t0 = far.select("comp", F.col("ecc_node").alias("doc_id"), F.lit(0).cast("long").alias("dist"))
    sweep2 = _sweep(t0)
    sz = cc.groupBy("comp").agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return (
        sweep2.groupBy("comp")
        .agg(F.max("dist").cast("long").alias("diameter_lb"))
        .join(far, "comp")
        .join(sz, "comp")
        .select(
            F.col("comp").alias("component"), "n_nodes", "ecc_node", "diameter_lb"
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Exact two-sided trimmed mean per event type (histogram route).
# ---------------------------------------------------------------------------
TRIM_DIV = 10  # trim floor(n/TRIM_DIV) from each side (10 => 10% two-sided)
_TRIM_MEAN = "(CAST(s_kept AS DOUBLE) / CAST(c_kept AS DOUBLE)) / 100.0"
_RAW_MEAN = "(CAST(s_all AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0"


@register(
    "trimmed_mean_value",
    oracle=f"""
    WITH cents AS (
      SELECT event_type, floor(value*100 + 0.5)::BIGINT AS c FROM events),
    hist AS (
      SELECT event_type, c, count(*)::BIGINT AS cnt
      FROM cents GROUP BY 1, 2),
    cum AS (
      SELECT event_type, c, cnt,
             (sum(cnt) OVER (PARTITION BY event_type ORDER BY c
                             ROWS UNBOUNDED PRECEDING))::BIGINT AS cum,
             (sum(cnt) OVER (PARTITION BY event_type))::BIGINT AS n
      FROM hist),
    kept AS (
      SELECT event_type, n, (n // {TRIM_DIV})::BIGINT AS k,
             greatest(0, least(cum, n - (n // {TRIM_DIV}))
                         - greatest(cum - cnt + 1, (n // {TRIM_DIV}) + 1) + 1) AS kc,
             c
      FROM cum),
    agg AS (
      SELECT event_type, n, k,
             sum(kc)::BIGINT AS c_kept, sum(kc::HUGEINT * c) AS s_kept
      FROM kept GROUP BY 1, 2, 3),
    raw AS (
      SELECT event_type, sum(c)::BIGINT AS s_all FROM cents GROUP BY 1)
    SELECT a.event_type, a.n, a.k AS n_trimmed_each_side,
           floor(({_TRIM_MEAN})*10000 + 0.5)/10000.0 AS trimmed_mean,
           floor(({_RAW_MEAN})*10000 + 0.5)/10000.0 AS raw_mean
    FROM agg a JOIN raw r ON a.event_type = r.event_type
    ORDER BY a.event_type
    """,
)
def q_trimmed_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10% two-sided trimmed mean of event value per event type —
    the outlier-robust center the raw mean isn't (one fat-finger
    purchase at 10⁶ moves the mean, not the trimmed mean), beside
    `robust_mad_outliers` (which flags rows) and
    `event_value_percentiles` (which reports quantiles, not a center).
    Emitted beside the raw mean so the gap itself is the tail-mass
    diagnostic.

    Exactness: ranks never materialize per row — the per-type cents
    HISTOGRAM (value, count) carries cumulative ranks, and each value
    contributes kc = overlap(|its rank interval ∩ [k+1, n−k]|) rows to
    the kept sum, which handles ties straddling the trim boundary
    exactly; k = n//10 in integers; the kept-sum accumulates kc·c in
    DECIMAL(38,0)/HUGEINT (kc can approach n, so the product would wrap
    BIGINT on large corpora) with ONE shared float division per emitted
    mean.

    Scale: this is the histogram trick again — the shuffle carries
    (type, cents-value) cells (bounded by the value domain, not the row
    count), the windows run per type over those AGGREGATE cells, and no
    per-row global sort ever happens.  A naive row_number() approach
    would single-task each type's full slice at 100 TB; this shape
    cannot.
    """
    ev = _t(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c")
    )
    # checkpoint the (type, value) histogram: it fans out to the kept sum
    # AND the raw mean — one corpus scan, not two
    hist = cents.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).localCheckpoint(eager=True)
    w = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "c",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum"),
        F.sum("cnt").over(wt).cast("long").alias("n"),
    )
    kept = cum.select(
        "event_type",
        "n",
        F.expr(f"n DIV {TRIM_DIV}").cast("long").alias("k"),
        F.expr(
            f"greatest(0, least(cum, n - (n DIV {TRIM_DIV}))"
            f" - greatest(cum - cnt + 1, (n DIV {TRIM_DIV}) + 1) + 1)"
        ).alias("kc"),
        "c",
    )
    agg = kept.groupBy("event_type", "n", "k").agg(
        F.sum("kc").cast("long").alias("c_kept"),
        F.sum(F.col("kc").cast("decimal(38,0)") * F.col("c")).alias("s_kept"),
    )
    # raw sum from the SAME histogram cells: sum(c) over rows == sum(cnt*c)
    # over cells, an exact integer identity
    raw = hist.groupBy("event_type").agg(
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("c")).alias("s_all")
    )
    return (
        agg.join(raw, "event_type")
        .select(
            "event_type",
            "n",
            F.col("k").alias("n_trimmed_each_side"),
            F.expr(f"CAST(floor(({_TRIM_MEAN})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
                "trimmed_mean"
            ),
            F.expr(f"CAST(floor(({_RAW_MEAN})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
                "raw_mean"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Two-model uplift by activity segment (md5 treatment assignment).
# ---------------------------------------------------------------------------
_UPLIFT = "(CAST(conv_t AS DOUBLE)/CAST(n_t AS DOUBLE) - CAST(conv_c AS DOUBLE)/CAST(n_c AS DOUBLE))"
_UPLIFT_P = "((CAST(conv_t AS DOUBLE) + CAST(conv_c AS DOUBLE)) / (CAST(n_t AS DOUBLE) + CAST(n_c AS DOUBLE)))"
_UPLIFT_Z = (
    f"({_UPLIFT} / sqrt({_UPLIFT_P} * (1.0 - {_UPLIFT_P})"
    f" * (1.0/CAST(n_t AS DOUBLE) + 1.0/CAST(n_c AS DOUBLE))))"
)


@register(
    "uplift_by_segment",
    oracle=f"""
    WITH usr AS (
      SELECT user_id, count(*)::BIGINT AS n_ev,
             CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY user_id),
    seg AS (
      SELECT user_id, conv,
             CASE WHEN n_ev < 62 THEN 'low'
                  WHEN n_ev < 72 THEN 'mid' ELSE 'high' END AS segment,
             ('0x' || substr(md5('uplift' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm
      FROM usr),
    cells AS (
      SELECT segment,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_t,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_c,
             sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)::BIGINT AS conv_t,
             sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)::BIGINT AS conv_c
      FROM seg GROUP BY segment)
    SELECT segment, n_t, n_c, conv_t, conv_c,
           floor(({_UPLIFT})*10000 + 0.5)/10000.0 AS uplift,
           floor(({_UPLIFT_Z})*10000 + 0.5)/10000.0 AS z
    FROM cells ORDER BY segment
    """,
)
def q_uplift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-model uplift analysis by user-activity segment: users are
    md5-assigned to treatment/control at the USER level (the unit of
    randomization a real experiment uses — event-level splits leak the
    same user into both arms), conversion = a heavy-purchaser flag
    (≥14 purchases, the corpus median — every synthetic user purchases
    at least once, so "any purchase" would be degenerate), and each
    activity segment reports Δ = p_t − p_c with its pooled two-proportion
    z — the heterogeneous-treatment-effect readout that decides who a
    feature actually helps.  On this synthetic corpus the md5 arms are
    exchangeable, so uplift ≈ 0 with |z| < 2 in every segment — the
    correct A/A-test reading, which is exactly what this audit is for
    (a significant segment under a null assignment means the analysis,
    not the feature, is broken).

    Exactness: cells are four integer counts per segment; uplift and z
    are ONE shared DOUBLE text each (pooled variance, fixed operand
    order), floor-quantized on emit.

    Scale: one partial-agg'd groupBy(user) then a 3-row segment
    aggregate — the scan is the whole cost.
    """
    ev = _t(spark, sf_dir, "events")
    usr = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 14, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("conv"),
    )
    seg = usr.select(
        "conv",
        F.when(F.col("n_ev") < 62, "low")
        .when(F.col("n_ev") < 72, "mid")
        .otherwise("high")
        .alias("segment"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("uplift"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
    )
    cells = seg.groupBy("segment").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_t"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_c"),
    )
    return cells.select(
        "segment",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.expr(f"CAST(floor(({_UPLIFT})*10000 + 0.5)/10000.0 AS DOUBLE)").alias("uplift"),
        F.expr(f"CAST(floor(({_UPLIFT_Z})*10000 + 0.5)/10000.0 AS DOUBLE)").alias("z"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Additive day-of-week seasonal decomposition of daily revenue.
# ---------------------------------------------------------------------------
_SEAS_RED = "(1.0 - CAST(var_r AS DOUBLE) / CAST(var_t AS DOUBLE))"
_SEAS_MEAN = "(CAST(seas AS DOUBLE) / 100.0)"


@register(
    "seasonal_decomposition_dow",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(floor(value*100 + 0.5)::BIGINT)::BIGINT AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    keyed AS (
      SELECT day, cents,
             CAST(dayofweek(day) AS BIGINT) % 7 AS dow
      FROM daily),
    seas AS (
      SELECT dow, count(*)::BIGINT AS n_days, sum(cents)::BIGINT AS s,
             {_fdiv("sum(cents)", "count(*)")} AS seas
      FROM keyed GROUP BY dow),
    resid AS (
      SELECT k.day, k.dow, k.cents, (k.cents - s.seas)::BIGINT AS r
      FROM keyed k JOIN seas s ON k.dow = s.dow),
    tot AS (
      SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS sy,
             sum(r)::BIGINT AS sr FROM resid),
    var_ AS (
      SELECT sum((tot.n * cents - tot.sy)::HUGEINT
                 * (tot.n * cents - tot.sy))::HUGEINT AS var_t,
             sum((tot.n * r - tot.sr)::HUGEINT
                 * (tot.n * r - tot.sr))::HUGEINT AS var_r
      FROM resid CROSS JOIN tot)
    SELECT s.dow, s.n_days,
           floor(({_SEAS_MEAN})*10000 + 0.5)/10000.0 AS seasonal_mean,
           floor(({_SEAS_RED})*10000 + 0.5)/10000.0 AS variance_reduction
    FROM seas s CROSS JOIN var_
    ORDER BY s.dow
    """,
)
def q_seasonal_decomposition_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive day-of-week seasonal decomposition of daily purchase
    revenue: the seasonal component is each weekday's mean (Sunday-0
    keys as everywhere), the residual is the day's revenue minus its
    weekday mean, and the headline number is the variance reduction the
    seasonal term explains — the quantitative answer to "should the
    forecast be seasonal" that `acf_daily_revenue` (lag-7 spike) and
    `dow_chi_square` (count uniformity) only hint at, and the direct
    justification for `seasonal_naive_backtest`'s model choice.

    Exactness: weekday means are portable floor-division integers
    (cents); residuals are exact integers; both variances are n-scaled
    integer deviation folds (the ACF machinery) in HUGEINT/DECIMAL;
    exactly one shared float division per emitted value.

    Scale: one groupBy(day) over the purchase slice, a 7-row seasonal
    aggregate broadcast back over the day table, and one more fold over
    the ≈10⁴-row day aggregate.  The scan is the whole cost.
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
    # the day table fans out to the seasonal means, the residual join and
    # (via resid) the two variance folds — checkpoint it or each consumer
    # replays the events scan (plan audit showed x5); downstream frames
    # recompute from this ~10^4-row aggregate, never the corpus
    keyed = daily.select(
        "cents",
        ((F.dayofweek(F.col("day")).cast("long") - 1) % 7).alias("dow"),
    ).localCheckpoint(eager=True)
    seas = keyed.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr(_fdiv("sum(cents)", "count(*)")).alias("seas"),
    )
    resid = keyed.join(F.broadcast(seas), "dow").select(
        "dow", "cents", (F.col("cents") - F.col("seas")).cast("long").alias("r")
    )
    tot = resid.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sy"),
        F.sum("r").cast("long").alias("sr"),
    )
    var_ = (
        resid.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("n") * F.col("cents") - F.col("sy")).cast("decimal(38,0)")
                * (F.col("n") * F.col("cents") - F.col("sy"))
            )
            .cast("decimal(38,0)")
            .alias("var_t"),
            F.sum(
                (F.col("n") * F.col("r") - F.col("sr")).cast("decimal(38,0)")
                * (F.col("n") * F.col("r") - F.col("sr"))
            )
            .cast("decimal(38,0)")
            .alias("var_r"),
        )
    )
    return (
        seas.crossJoin(F.broadcast(var_))
        .select(
            "dow",
            "n_days",
            F.expr(f"CAST(floor(({_SEAS_MEAN})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
                "seasonal_mean"
            ),
            F.expr(f"CAST(floor(({_SEAS_RED})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
                "variance_reduction"
            ),
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over event quasi-identifiers.
# ---------------------------------------------------------------------------
KANON_K = 10


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH qi AS (
      SELECT event_type,
             (hour(ts)::BIGINT // 6) AS hour_band,
             CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) % 7 AS dow
      FROM events),
    grp AS (
      SELECT event_type, hour_band, dow, count(*)::BIGINT AS sz
      FROM qi GROUP BY 1, 2, 3)
    SELECT event_type,
           count(*)::BIGINT AS n_groups,
           sum(CASE WHEN sz < {KANON_K} THEN 1 ELSE 0 END)::BIGINT AS n_below_k,
           coalesce(sum(CASE WHEN sz < {KANON_K} THEN sz END), 0)::BIGINT
             AS rows_below_k,
           min(sz)::BIGINT AS min_group_size
    FROM grp GROUP BY event_type ORDER BY event_type
    """,
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the events table over the quasi-identifier
    tuple (event_type, 6-hour band, day-of-week): per event type, how
    many QI groups exist, how many fall below k = 10, how many ROWS sit
    in those under-k groups (the re-identification exposure), and the
    smallest group — the release-gate a privacy review runs before any
    event-level extract ships (a group of size 1 is a fingerprint; the
    `dp_noisy_counts` operator is the remediation for the cells this
    audit flags).

    Exactness: pure integer counting — group sizes, threshold counts,
    minima; the Sunday-0 day key and 6-hour banding match
    `dow_chi_square`'s normalization in both engines.

    Scale: one partial-agg'd groupBy over the QI tuple (bounded by the
    QI domain, 5×4×7 = 140 cells here) then a per-type fold — nothing
    but the scan, which is the defining property of a QI audit you can
    afford to run on every extract.
    """
    ev = _t(spark, sf_dir, "events")
    qi = ev.select(
        "event_type",
        F.expr("CAST(hour(ts) AS BIGINT) DIV 6").alias("hour_band"),
        ((F.dayofweek(F.col("ts").cast("date")).cast("long") - 1) % 7).alias("dow"),
    )
    grp = qi.groupBy("event_type", "hour_band", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return (
        grp.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("sz") < KANON_K, 1).otherwise(0))
            .cast("long")
            .alias("n_below_k"),
            F.coalesce(F.sum(F.when(F.col("sz") < KANON_K, F.col("sz"))), F.lit(0))
            .cast("long")
            .alias("rows_below_k"),
            F.min("sz").cast("long").alias("min_group_size"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Expected steps to purchase (truncated Markov hitting time).
# ---------------------------------------------------------------------------
HIT_ROUNDS = 48
_HIT_SCALE = 1_000_000


def _hit_nonabs() -> list[int]:
    from .registry_ml import _MK_TYPES

    return [i for i, t in enumerate(_MK_TYPES) if t != "purchase"]


def _hit_step_exprs() -> list[tuple[str, str]]:
    """One truncated hitting-time round as generated text (same in both
    engines): e_i' = 1 step + Σ_{j non-absorbing} (c_ij/r_i)·e_j, in
    micro-steps, floor(+0.5)-quantized per state per round."""
    nonabs = _hit_nonabs()
    out = []
    for i in nonabs:
        mv = " + ".join(
            f"(CAST(c{i}_{j} AS DOUBLE) * CAST(e{j} AS DOUBLE))" for j in nonabs
        )
        out.append(
            (
                f"ne{i}",
                f"CAST({_HIT_SCALE} + floor(({mv}) / CAST(r{i} AS DOUBLE) + 0.5)"
                f" AS BIGINT)",
            )
        )
    return out


def _hit_oracle() -> str:
    from .registry_ml import _MK_K, _MK_TYPES

    nonabs = _hit_nonabs()
    pidx = _MK_TYPES.index("purchase")
    cnt = ", ".join(
        f"sum(CASE WHEN prev = '{a}' AND event_type = '{b}' THEN 1 ELSE 0 END)::BIGINT"
        f" AS c{i}_{j}"
        for i, a in enumerate(_MK_TYPES)
        for j, b in enumerate(_MK_TYPES)
    )
    rows = ", ".join(
        "(" + " + ".join(f"c{i}_{j}" for j in range(_MK_K)) + f") AS r{i}"
        for i in range(_MK_K)
    )
    init = ", ".join(f"0::BIGINT AS e{i}" for i in nonabs)
    keep = ", ".join(
        [f"c{i}_{j}" for i in range(_MK_K) for j in range(_MK_K)]
        + [f"r{i}" for i in range(_MK_K)]
    )
    ctes = [
        """pairs AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev,
             event_type
      FROM events)""",
        f"c AS MATERIALIZED (SELECT {cnt} FROM pairs WHERE prev IS NOT NULL)",
        f"it0 AS (SELECT *, {init} FROM (SELECT *, {rows} FROM c))",
    ]
    prev = "it0"
    for t in range(HIT_ROUNDS):
        layer = ", ".join(f"{sql} AS e{name[2:]}" for name, sql in _hit_step_exprs())
        ctes.append(f"it{t + 1} AS MATERIALIZED (SELECT {keep}, {layer} FROM {prev})")
        prev = f"it{t + 1}"
    sel = "\n      UNION ALL ".join(
        f"SELECT '{_MK_TYPES[i]}' AS event_type, "
        f"floor((CAST(e{i} AS DOUBLE) / {_HIT_SCALE}.0)*10000 + 0.5)/10000.0"
        f" AS expected_steps, "
        f"floor((CAST(c{i}_{pidx} AS DOUBLE) / CAST(r{i} AS DOUBLE))*10000 + 0.5)"
        f"/10000.0 AS direct_purchase_prob, "
        f"r{i}::BIGINT AS out_transitions FROM {prev}"
        for i in nonabs
    )
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block}
    {sel}
    ORDER BY event_type
    """


@register("markov_expected_steps", oracle=_hit_oracle())
def q_markov_expected_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected number of steps to reach 'purchase' from each other
    event state in the first-order user-journey chain — the hitting-time
    companion to `markov_stationary_events` (long-run occupancy),
    `markov_attribution` (absorption probability), and
    `markov_entropy_rate` (predictability): it answers "how FAR is each
    state from conversion", the journey-length metric funnel design
    optimizes.  Computed as the truncated Neumann recursion
    e ← 1 + Q·e over the 48-step horizon (Q = the chain restricted to
    non-purchase states; mass that transitions to purchase leaves the
    recursion, which is what makes it a hitting time).  With every
    state leaking ≈1/5 to purchase per step, the truncation error at 48
    rounds is ≈0.8⁴⁸ ≈ 2·10⁻⁵ of a step — below the emitted 4 dp.

    Exactness: transition counts are exact integers from per-user lag
    pairs; each round is generated ONCE as SQL text (fixed operand
    order) and floor(+0.5)-quantized to integer micro-steps per state
    BEFORE the next round, so the trajectory is bit-identical in both
    engines and under any partitioning.

    Scale: the `markov_stationary_events` economics — ONE partial-agg'd
    scan collapses the corpus to a 25-cell count frame; all 48 rounds
    are 1-row arithmetic (checkpoint barriers every 4 rounds keep
    generated methods under the 64 KB codegen limit).
    """
    from .registry_ml import _MK_K, _MK_TYPES

    nonabs = _hit_nonabs()
    pidx = _MK_TYPES.index("purchase")
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev"), "event_type"
    ).filter(F.col("prev").isNotNull())
    cnt_aggs = [
        F.sum(
            F.when((F.col("prev") == a) & (F.col("event_type") == b), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias(f"c{i}_{j}")
        for i, a in enumerate(_MK_TYPES)
        for j, b in enumerate(_MK_TYPES)
    ]
    it = pairs.agg(*cnt_aggs)
    for i in range(_MK_K):
        it = it.withColumn(
            f"r{i}", F.expr(" + ".join(f"c{i}_{j}" for j in range(_MK_K)))
        )
    for i in nonabs:
        it = it.withColumn(f"e{i}", F.lit(0).cast("long"))
    for t in range(HIT_ROUNDS):
        for name, sql in _hit_step_exprs():
            it = it.withColumn(name, F.expr(sql))
        for i in nonabs:
            it = it.withColumn(f"e{i}", F.col(f"ne{i}"))
        it = it.drop(*[f"ne{i}" for i in nonabs])
        if (t + 1) % 4 == 0:
            it = it.localCheckpoint(eager=True)
    rows = it.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(_MK_TYPES[i]).alias("event_type"),
                        F.expr(
                            f"CAST(floor((CAST(e{i} AS DOUBLE) / {_HIT_SCALE}.0)"
                            f"*10000 + 0.5)/10000.0 AS DOUBLE)"
                        ).alias("expected_steps"),
                        F.expr(
                            f"CAST(floor((CAST(c{i}_{pidx} AS DOUBLE) / CAST(r{i} AS DOUBLE))"
                            f"*10000 + 0.5)/10000.0 AS DOUBLE)"
                        ).alias("direct_purchase_prob"),
                        F.col(f"r{i}").cast("long").alias("out_transitions"),
                    )
                    for i in nonabs
                ]
            )
        ).alias("s")
    ).select("s.*")
    return rows.orderBy("event_type")


# ---------------------------------------------------------------------------
# Personalized PageRank (restart to a seed document).
# ---------------------------------------------------------------------------
PPR_ITER = 5


def _ppr_round_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS MATERIALIZED (
      SELECT n.doc_id,
             ((CASE WHEN n.doc_id = (SELECT s FROM seed)
                    THEN 150000 * (SELECT n FROM nn) ELSE 0 END)
              + (85 * coalesce(s.m, 0)) // 100)::BIGINT AS r
      FROM nodes n LEFT JOIN (
        SELECT e.b AS doc_id, sum(p.r // d.deg)::BIGINT AS m
        FROM edges e JOIN {prev} p ON e.a = p.doc_id
        JOIN deg d ON e.a = d.doc_id
        GROUP BY e.b) s ON n.doc_id = s.doc_id)"""


@register(
    "dup_personalized_pagerank",
    oracle=_SQL_DUP_EDGES.replace("edges AS (SELECT", "edges AS MATERIALIZED (SELECT")
    + """,
    nodes AS MATERIALIZED (SELECT DISTINCT a AS doc_id FROM edges),
    deg AS MATERIALIZED (SELECT a AS doc_id, count(*)::BIGINT AS deg
                         FROM edges GROUP BY a),
    seed AS (SELECT min(doc_id)::BIGINT AS s FROM nodes),
    nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
    p0 AS (SELECT doc_id, 1000000::BIGINT AS r FROM nodes),"""
    + ",".join(_ppr_round_sql(f"p{i}", f"p{i + 1}") for i in range(PPR_ITER))
    + f"""
    SELECT doc_id, r AS ppr_micro FROM p{PPR_ITER} ORDER BY doc_id
    """,
)
def q_dup_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank on the verified near-duplicate graph with
    ALL restart mass directed at a seed document (the graph's smallest
    doc_id, standing in for "a doc a reviewer just flagged"): after 5
    damped rounds, a node's score is its random-walk affinity to the
    seed — the guilt-by-association expansion that finds the rest of a
    bad template family even beyond direct LSH pairs, where the uniform
    `dup_graph_pagerank` only measures global centrality.  Mass in
    components the seed can't reach decays toward 0 geometrically
    (0.85⁵ of the uniform start) — the separation IS the signal.

    Determinism: the `dup_graph_pagerank` integer arithmetic with the
    teleport term concentrated on the seed (150000·n micro-units, the
    same total restart mass the uniform variant spreads); per-edge
    contributions r//deg are nonnegative integer divisions; 5 fixed
    rounds; left join + coalesce keeps in-edge-less nodes exact.

    Scale: one edge-join + partial-agg'd sum per round against the
    broadcastable rank table, eager-localCheckpointed — identical
    economics to the uniform variant; the seed and node-count scalars
    are 1-row broadcasts.
    """
    edges = _sym_edges(spark, sf_dir)
    nodes = edges.select(F.col("a").alias("doc_id")).distinct().localCheckpoint(eager=True)
    deg = edges.groupBy(F.col("a").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    seed = nodes.agg(F.min("doc_id").cast("long").alias("s"))
    nn = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    src = edges.join(deg.withColumnRenamed("doc_id", "a"), "a").localCheckpoint(eager=True)
    ranks = nodes.withColumn("r", F.lit(1000000).cast("long"))
    for _ in range(PPR_ITER):
        m = (
            src.join(ranks, src.a == ranks.doc_id)
            .select(F.col("b"), F.expr("r DIV deg").alias("c"))
            .groupBy("b")
            .agg(F.sum("c").cast("long").alias("m"))
        )
        ranks = (
            nodes.join(m, nodes.doc_id == m.b, "left")
            .crossJoin(F.broadcast(seed))
            .crossJoin(F.broadcast(nn))
            .select(
                "doc_id",
                (
                    F.when(F.col("doc_id") == F.col("s"), 150000 * F.col("n")).otherwise(0)
                    + F.expr("(85 * coalesce(m, 0)) DIV 100")
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("doc_id", F.col("r").alias("ppr_micro")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Bagged stump split stability (Poisson bootstrap of the histogram argmax).
# ---------------------------------------------------------------------------
BAG_B = 16


def _bag_oracle() -> str:
    from .registry_ml import _STUMP_FEATURES, _STUMP_LABEL, _gini_gain, _pois_w

    h_cols = ", ".join(
        f"md5('bagg{g}:' || rowsig) AS h{g}" for g in range(BAG_B // 4)
    )
    hsel = (
        "CASE (b // 4) "
        + " ".join(f"WHEN {g} THEN h{g}" for g in range(BAG_B // 4))
        + " END"
    )
    u = f"(('0x' || substr({hsel}, (b % 4) * 8 + 1, 8))::BIGINT)"
    val_branches = "\n      UNION ALL ".join(
        f"SELECT rowsig, {', '.join(f'h{g}' for g in range(BAG_B // 4))}, "
        f"'{name}' AS feature, {expr} AS val, {_STUMP_LABEL} AS pos FROM sig"
        for name, expr in _STUMP_FEATURES
    )
    gain = _gini_gain("cum_n", "cum_pos", "n_tot", "pos_tot")
    return f"""
    WITH sig AS MATERIALIZED (
      SELECT *, CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
                || '-' || CAST(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
                               AS VARCHAR) AS rowsig0,
             {h_cols.replace("rowsig", "rowsig0")}
      FROM lineitem),
    fv AS MATERIALIZED ({val_branches.replace("rowsig, ", "rowsig0 AS rowsig, ")}),
    rep AS (
      SELECT f.feature, f.val, f.pos, b.b,
             {_pois_w(u.replace('(b ', '(b.b ').replace('(b %', '(b.b %'))} AS w
      FROM fv f CROSS JOIN (SELECT unnest(range(0, {BAG_B}))::BIGINT AS b) b),
    agg AS (
      SELECT b, feature, val, sum(w)::BIGINT AS cnt,
             sum(w * pos)::BIGINT AS pos
      FROM rep GROUP BY 1, 2, 3),
    cum AS (
      SELECT b, feature, val,
             (sum(cnt) OVER w)::BIGINT AS cum_n,
             (sum(pos) OVER w)::BIGINT AS cum_pos,
             (sum(cnt) OVER (PARTITION BY b, feature))::BIGINT AS n_tot,
             (sum(pos) OVER (PARTITION BY b, feature))::BIGINT AS pos_tot
      FROM agg
      WINDOW w AS (PARTITION BY b, feature ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    winners AS (
      SELECT b, feature, val FROM (
        SELECT *, floor(({gain})*1000000000 + 0.5)::BIGINT AS gain_nano,
               row_number() OVER (PARTITION BY b
                                  ORDER BY floor(({gain})*1000000000 + 0.5) DESC,
                                           feature, val) AS rn
        FROM cum WHERE cum_n < n_tot AND n_tot > 0) x
      WHERE rn = 1)
    SELECT feature, val AS threshold, count(*)::BIGINT AS wins,
           {BAG_B}::BIGINT AS n_replicas
    FROM winners GROUP BY feature, val
    ORDER BY wins DESC, feature, threshold
    """


@register("bagging_split_stability", oracle=_bag_oracle())
def q_bagging_split_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap stability of the decision-stump split: 16 deterministic
    Poisson(1) bootstrap replicas (the `bootstrap_value_ci` md5 ladder)
    each rerun the exact histogram Gini argmax, and the output is the
    distribution of winning (feature, threshold) pairs across replicas —
    the model-stability diagnostic that separates a real split from a
    coin flip (`decision_tree_depth2`'s near-zero gains on this uniform
    corpus predict a scattered vote, and that scatter is the honest
    finding).  This is bagging's vote table, computed without training
    16 models row-by-row.

    Exactness: replica weights are integer Poisson ladder values from
    md5 uniforms (4 lanes per digest); weighted histogram counts are
    exact integer sums; the gain is the shared nano-quantized text with
    (feature, val) tie-breaks per replica.

    Scale: the scan collapses straight onto the JOINT feature-value key
    ((q, d, t, label) packed into one long — ≤ 50·64·64·2 cells), with
    all 16 replica weights computed ONCE per data row as plain columns:
    no row ever fans out before the collapse, so the map side does
    B = 16 Poisson evaluations per row (not B × |features| — an earlier
    explode-first shape paid 5× that and it was the whole cold cost),
    and the shuffle carries ≤ ~10⁴ wide cells.  Per-feature marginals,
    the stack() unpivot to (replica, feature, bin), and all 16 argmax
    windows run on that constant-size aggregate.  This is why bagged
    tree ensembles train on 100 TB: replication happens in the
    sufficient statistics, not the data.
    """
    from .registry_ml import _STUMP_FEATURES, _STUMP_LABEL, _gini_gain, _pois_w

    li = _t(spark, sf_dir, "lineitem")
    sig = li.withColumn(
        "rowsig",
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
            F.lit("-"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").cast("string"),
        ),
    )
    for g in range(BAG_B // 4):
        sig = sig.withColumn(
            f"h{g}", F.md5(F.concat(F.lit(f"bagg{g}:"), F.col("rowsig")))
        )

    def _w_expr(b: int) -> str:
        # replica b reads 32-bit lane b%4 of digest h{b//4}; constant
        # offsets let codegen skip the digest/lane dispatch CASEs.
        u = f"(CAST(conv(substr(h{b // 4}, {(b % 4) * 8 + 1}, 8), 16, 10) AS BIGINT))"
        return _pois_w(u)

    fexprs = [e for _, e in _STUMP_FEATURES]
    # radix-64 packing is safe: discount_pct <= 10, tax_pct <= 8 by schema.
    joint = (
        sig.select(
            F.expr(
                f"((({fexprs[0]}) * 64 + ({fexprs[1]})) * 64 + ({fexprs[2]}))"
                f" * 2 + ({_STUMP_LABEL})"
            ).alias("jk"),
            *[F.expr(_w_expr(b)).cast("long").alias(f"w{b}") for b in range(BAG_B)],
        )
        .groupBy("jk")
        .agg(*[F.sum(f"w{b}").cast("long").alias(f"c{b}") for b in range(BAG_B)])
    )
    decoded = joint.select(
        F.expr("jk DIV (64*64*2)").alias("v0"),
        F.expr("(jk DIV (64*2)) % 64").alias("v1"),
        F.expr("(jk DIV 2) % 64").alias("v2"),
        F.expr("jk % 2").alias("pos"),
        *[f"c{b}" for b in range(BAG_B)],
    )
    fv = decoded.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        F.col(f"v{i}").cast("long").alias("val"),
                    )
                    for i, (name, _) in enumerate(_STUMP_FEATURES)
                ]
            )
        ).alias("p"),
        "pos",
        *[f"c{b}" for b in range(BAG_B)],
    ).select("p.feature", "p.val", "pos", *[f"c{b}" for b in range(BAG_B)])
    stack_args = ", ".join(f"{b}L, c{b}" for b in range(BAG_B))
    long_cells = fv.select(
        "feature", "val", "pos", F.expr(f"stack({BAG_B}, {stack_args}) AS (b, w)")
    )
    agg = long_cells.groupBy("b", "feature", "val").agg(
        F.sum("w").cast("long").alias("cnt"),
        F.sum(F.col("w") * F.col("pos")).cast("long").alias("pos"),
    )
    wcum = (
        Window.partitionBy("b", "feature")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("b", "feature")
    gain = _gini_gain("cum_n", "cum_pos", "n_tot", "pos_tot")
    cum = agg.select(
        "b",
        "feature",
        "val",
        F.sum("cnt").over(wcum).cast("long").alias("cum_n"),
        F.sum("pos").over(wcum).cast("long").alias("cum_pos"),
        F.sum("cnt").over(wtot).cast("long").alias("n_tot"),
        F.sum("pos").over(wtot).cast("long").alias("pos_tot"),
    ).filter((F.col("cum_n") < F.col("n_tot")) & (F.col("n_tot") > 0))
    wr = Window.partitionBy("b").orderBy(
        F.desc("gain_nano"), F.asc("feature"), F.asc("val")
    )
    winners = (
        cum.withColumn(
            "gain_nano", F.expr(f"CAST(floor(({gain})*1000000000 + 0.5) AS BIGINT)")
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
    )
    return (
        winners.groupBy("feature", F.col("val").alias("threshold"))
        .agg(F.count(F.lit(1)).cast("long").alias("wins"))
        .withColumn("n_replicas", F.lit(BAG_B).cast("long"))
        .orderBy(F.desc("wins"), "feature", "threshold")
    )


# ---------------------------------------------------------------------------
# Mondrian (group-conditional) conformal coverage.
# ---------------------------------------------------------------------------
@register(
    "conformal_group_coverage",
    oracle=f"""
    WITH li AS MATERIALIZED (
      SELECT l_returnflag AS rf, l_linestatus AS ls, {_CONF_Y} AS y,
             {_CONF_BUCKET} AS bucket
      FROM lineitem),
    model AS (
      SELECT rf, ls, {_fdiv("sum(y)", "count(*)")} AS mu
      FROM li WHERE bucket <= 2 GROUP BY rf, ls),
    cal AS MATERIALIZED (
      SELECT li.rf, li.ls, abs(li.y - m.mu)::BIGINT AS r
      FROM li JOIN model m ON li.rf = m.rf AND li.ls = m.ls
      WHERE li.bucket = 3),
    ncal_g AS (SELECT rf, ls, count(*)::BIGINT AS n_cal FROM cal GROUP BY rf, ls),
    rk_g AS (
      SELECT rf, ls, r,
             row_number() OVER (PARTITION BY rf, ls ORDER BY r) AS rn
      FROM cal),
    qg AS (
      SELECT k.rf, k.ls, k.n_cal, min(r)::BIGINT AS q_group
      FROM rk_g j JOIN ncal_g k ON j.rf = k.rf AND j.ls = k.ls
      WHERE j.rn >= ((9 * (k.n_cal + 1)) + 9) // 10
      GROUP BY k.rf, k.ls, k.n_cal),
    ncal AS (SELECT count(*)::BIGINT AS n FROM cal),
    rk AS (SELECT r, row_number() OVER (ORDER BY r) AS rn FROM cal),
    qglob AS (
      SELECT min(r)::BIGINT AS q FROM rk CROSS JOIN ncal
      WHERE rn >= ((9 * (n + 1)) + 9) // 10),
    test AS (
      SELECT li.rf, li.ls, abs(li.y - m.mu)::BIGINT AS r
      FROM li JOIN model m ON li.rf = m.rf AND li.ls = m.ls
      WHERE li.bucket = 4)
    SELECT t.rf || '/' || t.ls AS grp, qg.n_cal, qg.q_group AS q_hat_group,
           qglob.q AS q_hat_global,
           count(*)::BIGINT AS n_test,
           floor((sum(CASE WHEN t.r <= qg.q_group THEN 1 ELSE 0 END) * 1.0
                  / count(*)) * 10000 + 0.5)/10000.0 AS coverage_group,
           floor((sum(CASE WHEN t.r <= qglob.q THEN 1 ELSE 0 END) * 1.0
                  / count(*)) * 10000 + 0.5)/10000.0 AS coverage_global
    FROM test t
    JOIN qg ON t.rf = qg.rf AND t.ls = qg.ls
    CROSS JOIN qglob
    GROUP BY t.rf, t.ls, qg.n_cal, qg.q_group, qglob.q
    ORDER BY grp
    """,
)
def q_conformal_group_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian (group-conditional) conformal calibration, contrasted
    with the marginal interval: per (returnflag, linestatus) group, fit
    the group's own q̂ = ⌈0.9(n_g+1)⌉-th calibration residual and report
    held-out coverage under BOTH the group q̂ and the global q̂ from
    `conformal_price_interval`.  Split conformal only guarantees
    MARGINAL coverage — a heteroscedastic group can sit at 80% while the
    average reads 90%; Mondrian buys per-group validity at the price of
    smaller calibration sets.  The side-by-side coverage columns make
    that trade measurable, per group, in one query.

    Exactness: same md5 splits and floor-division model as the marginal
    query; each group's q̂ is an exact order statistic (integer ceiling
    rank); coverage is integer counting with one float division on emit.

    Scale: per-group ranks partition the calibration slice by group
    (range-partitioned sort within each — groups are the Mondrian
    taxonomy, bounded); everything else is the broadcast-joined
    one-pass shape of the marginal query.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        F.expr(_CONF_Y).alias("y"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("conf"),
                            F.col("l_orderkey").cast("string"),
                            F.lit("-"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 5
        ).alias("bucket"),
    )
    model = (
        li.filter(F.col("bucket") <= 2)
        .groupBy("rf", "ls")
        .agg(F.expr(_fdiv("sum(y)", "count(*)")).alias("mu"))
    )
    joined = li.join(F.broadcast(model), ["rf", "ls"])
    cal = joined.filter(F.col("bucket") == 3).select(
        "rf", "ls", F.abs(F.col("y") - F.col("mu")).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    ncal_g = cal.groupBy("rf", "ls").agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    wg = Window.partitionBy("rf", "ls").orderBy("r")
    qg = (
        cal.withColumn("rn", F.row_number().over(wg))
        .join(F.broadcast(ncal_g), ["rf", "ls"])
        .filter(F.col("rn") >= F.expr("((9 * (n_cal + 1)) + 9) DIV 10"))
        .groupBy("rf", "ls", "n_cal")
        .agg(F.min("r").cast("long").alias("q_group"))
    )
    ncal = cal.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy("r")
    qglob = (
        cal.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(ncal))
        .filter(F.col("rn") >= F.expr("((9 * (n + 1)) + 9) DIV 10"))
        .agg(F.min("r").cast("long").alias("q"))
    )
    test = joined.filter(F.col("bucket") == 4).select(
        "rf", "ls", F.abs(F.col("y") - F.col("mu")).cast("long").alias("r")
    )
    return (
        test.join(F.broadcast(qg), ["rf", "ls"])
        .crossJoin(F.broadcast(qglob))
        .groupBy("rf", "ls", "n_cal", "q_group", "q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.expr(
                "CAST(floor((sum(CASE WHEN r <= q_group THEN 1 ELSE 0 END) * 1.0"
                " / count(*)) * 10000 + 0.5)/10000.0 AS DOUBLE)"
            ).alias("coverage_group"),
            F.expr(
                "CAST(floor((sum(CASE WHEN r <= q THEN 1 ELSE 0 END) * 1.0"
                " / count(*)) * 10000 + 0.5)/10000.0 AS DOUBLE)"
            ).alias("coverage_global"),
        )
        .select(
            F.concat(F.col("rf"), F.lit("/"), F.col("ls")).alias("grp"),
            "n_cal",
            F.col("q_group").alias("q_hat_group"),
            F.col("q").alias("q_hat_global"),
            "n_test",
            "coverage_group",
            "coverage_global",
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# SPRT sequential A/B monitor on daily conversion (A/A arms).
# ---------------------------------------------------------------------------
SPRT_THRESH_MICRO = 2_944_439  # ln(0.95/0.05) in micro-nats (alpha = beta = 0.05)
# p0 guarded away from 0 (greatest(cx,1)) and p1 clamped below 1 so the two
# ln() terms never see a non-positive argument — a control rate of exactly 0
# or >= 0.95 would otherwise turn the LLR into NaN/Inf with no warning.  On
# any corpus where 0 < p0 < 0.95 - eps (every real one) the clamps are
# no-ops, so the shared expression text stays bit-identical across engines.
_SPRT_P0 = "(CAST(greatest(cx, 1) AS DOUBLE) / CAST(cn AS DOUBLE))"
_SPRT_P1 = f"least({_SPRT_P0} + 0.05, 0.999999)"
_SPRT_LLR = (
    f"CAST(floor((CAST(x AS DOUBLE) * ln({_SPRT_P1} / {_SPRT_P0})"
    f" + CAST(n - x AS DOUBLE) * ln((1.0 - {_SPRT_P1}) / (1.0 - {_SPRT_P0})))"
    f" * 1000000.0 + 0.5) AS BIGINT)"
)


@register(
    "ab_sprt_monitor",
    oracle=f"""
    WITH ud AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
             ('0x' || substr(md5('sprt' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    ctl AS (
      SELECT count(*)::BIGINT AS cn, sum(conv)::BIGINT AS cx
      FROM ud WHERE arm = 0),
    trt AS (
      SELECT day, count(*)::BIGINT AS n, sum(conv)::BIGINT AS x
      FROM ud WHERE arm = 1 GROUP BY day),
    idx AS (
      SELECT (day - (SELECT min(day) FROM trt))::BIGINT AS day_idx, n, x
      FROM trt),
    llr AS (
      SELECT day_idx, n, x, {_SPRT_LLR} AS l
      FROM idx CROSS JOIN ctl),
    cum AS (
      SELECT day_idx, n, x,
             (sum(l) OVER (ORDER BY day_idx ROWS UNBOUNDED PRECEDING))::BIGINT
               AS cum_l
      FROM llr),
    crossing AS (
      SELECT coalesce(min(day_idx), (SELECT max(day_idx) FROM cum))::BIGINT AS cd
      FROM cum WHERE cum_l >= {SPRT_THRESH_MICRO} OR cum_l <= -{SPRT_THRESH_MICRO})
    SELECT day_idx, n AS n_trials, x AS successes,
           floor((CAST(cum_l AS DOUBLE) / 1000000.0)*10000 + 0.5)/10000.0 AS cum_llr,
           CASE WHEN cum_l >= {SPRT_THRESH_MICRO} THEN 'accept_h1'
                WHEN cum_l <= -{SPRT_THRESH_MICRO} THEN 'accept_h0'
                ELSE 'continue' END AS state
    FROM cum CROSS JOIN crossing
    WHERE day_idx <= cd
    ORDER BY day_idx
    """,
)
def q_ab_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test run as a daily A/B
    monitor: treatment user-days stream in day by day, and the running
    log-likelihood ratio of H1 (conversion lifted +5 pp over the control
    rate) vs H0 (equal to control) is compared to the ±ln(0.95/0.05)
    boundaries (α = β = 0.05) — the early-stopping discipline that
    replaces the invalid "peek at the z-test every day" habit
    (`ab_test_zscore` is the fixed-horizon companion; this is the
    anytime-valid one).  Emitted day-by-day UP TO the first boundary
    crossing, with the decision state on each row.  On these md5 A/A
    arms the LLR drifts down and accepts H0 — the monitor correctly
    refusing to call a lift that isn't there, in finitely many days.

    Exactness: control rate p0 is an exact integer ratio, guarded >0 and
    p1 clamped <1 so the ln arguments are always positive (no-op clamps
    on any corpus with 0 < p0 < 0.95); the two ln
    terms are ONE shared DOUBLE text; each day's LLR increment is
    quantized to micro-nats BEFORE the cumulative sum (an ordered
    prefix sum over the ~10⁴-row day aggregate); the boundary compare
    and crossing-day argmin are pure integers.

    Scale: one partial-agg'd groupBy(user, day) collapse, a 1-row
    control aggregate broadcast into the per-day treatment table, and
    windows over the day AGGREGATE — the scan is the whole cost, which
    is what lets the monitor rerun after every daily load.
    """
    ev = _t(spark, sf_dir, "events")
    ud = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv")
    ).withColumn(
        "arm",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("sprt"), F.col("user_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 2,
    )
    ctl = ud.filter(F.col("arm") == 0).agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.sum("conv").cast("long").alias("cx"),
    )
    trt = (
        ud.filter(F.col("arm") == 1)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("conv").cast("long").alias("x"),
        )
    )
    mind = trt.agg(F.min("day").alias("min_day"))
    idx = trt.crossJoin(F.broadcast(mind)).select(
        F.datediff(F.col("day"), F.col("min_day")).cast("long").alias("day_idx"),
        "n",
        "x",
    )
    llr = idx.crossJoin(F.broadcast(ctl)).withColumn("l", F.expr(_SPRT_LLR))
    wc = Window.orderBy("day_idx").rowsBetween(Window.unboundedPreceding, 0)
    cum = llr.withColumn("cum_l", F.sum("l").over(wc).cast("long")).localCheckpoint(
        eager=True
    )
    crossed = cum.filter(
        (F.col("cum_l") >= SPRT_THRESH_MICRO) | (F.col("cum_l") <= -SPRT_THRESH_MICRO)
    ).agg(F.min("day_idx").alias("mcd"))
    maxd = cum.agg(F.max("day_idx").alias("mxd"))
    crossing = crossed.crossJoin(F.broadcast(maxd)).select(
        F.coalesce(F.col("mcd"), F.col("mxd")).cast("long").alias("cd")
    )
    return (
        cum.crossJoin(F.broadcast(crossing))
        .filter(F.col("day_idx") <= F.col("cd"))
        .select(
            "day_idx",
            F.col("n").alias("n_trials"),
            F.col("x").alias("successes"),
            F.expr(
                "CAST(floor((CAST(cum_l AS DOUBLE) / 1000000.0)*10000 + 0.5)"
                "/10000.0 AS DOUBLE)"
            ).alias("cum_llr"),
            F.when(F.col("cum_l") >= SPRT_THRESH_MICRO, "accept_h1")
            .when(F.col("cum_l") <= -SPRT_THRESH_MICRO, "accept_h0")
            .otherwise("continue")
            .alias("state"),
        )
        .orderBy("day_idx")
    )


# ---------------------------------------------------------------------------
# Exact winsorized mean per event type — the trimmed mean's clamping twin.
# ---------------------------------------------------------------------------
_WINS_MEAN = (
    "(CAST(s_kept + k * lo + k * hi AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0"
)


@register(
    "winsorized_mean_value",
    oracle=f"""
    WITH cents AS (
      SELECT event_type, floor(value*100 + 0.5)::BIGINT AS c FROM events),
    hist AS (
      SELECT event_type, c, count(*)::BIGINT AS cnt
      FROM cents GROUP BY 1, 2),
    cum AS (
      SELECT event_type, c, cnt,
             (sum(cnt) OVER (PARTITION BY event_type ORDER BY c
                             ROWS UNBOUNDED PRECEDING))::BIGINT AS cum,
             (sum(cnt) OVER (PARTITION BY event_type))::BIGINT AS n
      FROM hist),
    kept AS (
      SELECT event_type, n, (n // {TRIM_DIV})::BIGINT AS k,
             greatest(0, least(cum, n - (n // {TRIM_DIV}))
                         - greatest(cum - cnt + 1, (n // {TRIM_DIV}) + 1) + 1) AS kc,
             c, cum
      FROM cum),
    agg AS (
      SELECT event_type, n, k,
             sum(kc::HUGEINT * c) AS s_kept
      FROM kept GROUP BY 1, 2, 3),
    bounds AS (
      SELECT event_type,
             min(CASE WHEN cum >= k + 1 THEN c END)::BIGINT AS lo,
             min(CASE WHEN cum >= n - k THEN c END)::BIGINT AS hi
      FROM kept GROUP BY event_type),
    raw AS (
      SELECT event_type, sum(c)::BIGINT AS s_all FROM cents GROUP BY 1)
    SELECT a.event_type, a.n, a.k AS n_clamped_each_side,
           floor((CAST(b.lo AS DOUBLE)/100.0)*10000 + 0.5)/10000.0 AS lo_clamp,
           floor((CAST(b.hi AS DOUBLE)/100.0)*10000 + 0.5)/10000.0 AS hi_clamp,
           floor(({_WINS_MEAN})*10000 + 0.5)/10000.0 AS winsorized_mean,
           floor(({_RAW_MEAN})*10000 + 0.5)/10000.0 AS raw_mean
    FROM agg a
    JOIN bounds b ON a.event_type = b.event_type
    JOIN raw r ON a.event_type = r.event_type
    ORDER BY a.event_type
    """,
)
def q_winsorized_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10% two-sided WINSORIZED mean of event value per type — the
    robust center that CLAMPS the k outermost values to the trim
    boundaries instead of dropping them (`trimmed_mean_value`'s
    companion; winsorizing keeps n constant, which is what downstream
    variance estimates usually want).  Emitted beside the raw mean and
    both clamp values, so the clamp width itself reads as the tail-mass
    diagnostic.

    Exactness: the same (type, cents) histogram carries cumulative
    ranks; the kept interior sum reuses the tie-exact overlap counts;
    the two clamp bounds are exact order statistics (smallest value
    whose cumulative count reaches rank k+1 / n−k) read off the SAME
    cumulative column — no second pass, no per-row ranks; the clamped
    tails contribute exactly k·lo + k·hi.  All folds integer/HUGEINT.

    Scale: identical to the trimmed mean — the shuffle carries
    (type, cents-value) cells bounded by the value domain, windows run
    per type over aggregate cells, and no per-row global sort exists.
    """
    ev = _t(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c")
    )
    # checkpoint the (type, value) histogram: it fans out to the interior
    # sum, the clamp bounds AND the raw mean — one corpus scan, not three
    hist = cents.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).localCheckpoint(eager=True)
    w = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "c",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum"),
        F.sum("cnt").over(wt).cast("long").alias("n"),
    )
    kept = cum.select(
        "event_type",
        "n",
        F.expr(f"n DIV {TRIM_DIV}").cast("long").alias("k"),
        F.expr(
            f"greatest(0, least(cum, n - (n DIV {TRIM_DIV}))"
            f" - greatest(cum - cnt + 1, (n DIV {TRIM_DIV}) + 1) + 1)"
        ).alias("kc"),
        "c",
        "cum",
    )
    agg = kept.groupBy("event_type", "n", "k").agg(
        F.sum(F.col("kc").cast("decimal(38,0)") * F.col("c")).alias("s_kept"),
    )
    bounds = kept.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= F.col("k") + 1, F.col("c")))
        .cast("long")
        .alias("lo"),
        F.min(F.when(F.col("cum") >= F.col("n") - F.col("k"), F.col("c")))
        .cast("long")
        .alias("hi"),
    )
    # raw sum from the SAME histogram cells: sum(c) over rows == sum(cnt*c)
    # over cells, an exact integer identity
    raw = hist.groupBy("event_type").agg(
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("c")).alias("s_all")
    )
    return (
        agg.join(bounds, "event_type")
        .join(raw, "event_type")
        .select(
            "event_type",
            "n",
            F.col("k").alias("n_clamped_each_side"),
            F.expr(
                "CAST(floor((CAST(lo AS DOUBLE)/100.0)*10000 + 0.5)/10000.0"
                " AS DOUBLE)"
            ).alias("lo_clamp"),
            F.expr(
                "CAST(floor((CAST(hi AS DOUBLE)/100.0)*10000 + 0.5)/10000.0"
                " AS DOUBLE)"
            ).alias("hi_clamp"),
            F.expr(f"CAST(floor(({_WINS_MEAN})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
                "winsorized_mean"
            ),
            F.expr(f"CAST(floor(({_RAW_MEAN})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
                "raw_mean"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Simple exponential smoothing of daily revenue — closed-form dyadic SES.
# ---------------------------------------------------------------------------
SES_MAX_E = 40  # drop terms with weight < 2^-40 (sub-micro of any signal)


@register(
    "ses_revenue_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(floor(value*100 + 0.5)::BIGINT)::BIGINT AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    idx AS (
      SELECT (day - (SELECT min(day) FROM daily))::BIGINT AS t, cents
      FROM daily),
    tm AS (SELECT max(t)::BIGINT AS tmax FROM idx),
    terms AS (
      SELECT CASE WHEN t = 0 THEN tm.tmax ELSE tm.tmax - t + 1 END AS e, cents
      FROM idx CROSS JOIN tm),
    kept AS (
      SELECT ((cents::HUGEINT * 1000000)
              // CAST(power(2.0, e) AS BIGINT))::BIGINT AS term
      FROM terms WHERE e <= {SES_MAX_E}),
    s AS (SELECT sum(term)::BIGINT AS s_micro,
                 count(*)::BIGINT AS lags_used FROM kept),
    lastd AS (
      SELECT i.cents AS last_cents FROM idx i CROSS JOIN tm
      WHERE i.t = tm.tmax)
    SELECT (tm.tmax + 1)::BIGINT AS n_days_span, s.lags_used,
           floor((CAST(l.last_cents AS DOUBLE)/100.0)*10000 + 0.5)/10000.0
             AS last_day_revenue,
           floor(((CAST(s.s_micro AS DOUBLE)/1000000.0)/100.0)*10000 + 0.5)
             /10000.0 AS ses_forecast
    FROM tm CROSS JOIN s CROSS JOIN lastd l
    """,
)
def q_ses_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing (α = 1/2) of daily purchase revenue,
    emitted as the one-step-ahead forecast beside the last observed day —
    the classic short-memory baseline between `seasonal_naive_backtest`
    (pure seasonality) and `exp_decay_daily_value` (decayed totals, not a
    level estimate).  The round-6 attempt at smoothing stalled on the
    recurrence's 150-round unroll; the fix is algebra, not iteration:
    s_T = Σ_{{t≥1}} α(1−α)^{{T−t}}·x_t + (1−α)^T·x_0, and with DYADIC
    α = 1/2 every weight is exactly 2^−e, so one weighted sum over the
    day aggregate computes the whole recurrence.

    Exactness: each day's term is floor(cents·10⁶ / 2^e) — per-element
    integer quantization BEFORE the fold, divisor exact via power(2.0,e)
    (doubles represent 2^e exactly to e=1023, cast to BIGINT exact to
    e=62); the product is widened to DECIMAL(38,0)/HUGEINT.  Terms with
    e > {SES_MAX_E} are DEFINED out of the sum (weight < 2^−40 — below a
    micro-unit of any bounded signal), making the truncated statistic
    itself deterministic and engine-identical; the pure-Python gate
    checks both the integer identity and the ≤ 2^−40 distance to the
    true recurrence fixed point.

    Scale: one partial-agg'd scan to the ≤ |days| day aggregate, a 1-row
    broadcast of T, a bounded ≤ {SES_MAX_E + 1}-term fold — re-runnable
    after every daily load for the cost of the scan, at any corpus size.
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
        # the day aggregate fans out to five consumers (d0, T, terms, last
        # day); checkpointing the ≤|days|-row collapse keeps the corpus
        # scan at exactly ONE instead of lineage-replaying it per consumer
        .localCheckpoint(eager=True)
    )
    d0 = daily.agg(F.min("day").alias("d0"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("t"), "cents"
    )
    tm = idx.agg(F.max("t").cast("long").alias("tmax"))
    terms = idx.crossJoin(F.broadcast(tm)).select(
        F.when(F.col("t") == 0, F.col("tmax"))
        .otherwise(F.col("tmax") - F.col("t") + 1)
        .alias("e"),
        "cents",
        "tmax",
    )
    kept = terms.filter(F.col("e") <= SES_MAX_E).select(
        F.expr(
            "CAST((CAST(cents AS DECIMAL(38,0)) * 1000000)"
            " DIV CAST(power(2.0, e) AS BIGINT) AS BIGINT)"
        ).alias("term")
    )
    s = kept.agg(
        F.sum("term").cast("long").alias("s_micro"),
        F.count(F.lit(1)).cast("long").alias("lags_used"),
    )
    lastd = (
        idx.crossJoin(F.broadcast(tm))
        .filter(F.col("t") == F.col("tmax"))
        .select(F.col("cents").alias("last_cents"))
    )
    return (
        tm.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(lastd))
        .select(
            (F.col("tmax") + 1).cast("long").alias("n_days_span"),
            "lags_used",
            F.expr(
                "CAST(floor((CAST(last_cents AS DOUBLE)/100.0)*10000 + 0.5)"
                "/10000.0 AS DOUBLE)"
            ).alias("last_day_revenue"),
            F.expr(
                "CAST(floor(((CAST(s_micro AS DOUBLE)/1000000.0)/100.0)*10000"
                " + 0.5)/10000.0 AS DOUBLE)"
            ).alias("ses_forecast"),
        )
    )


# ---------------------------------------------------------------------------
# Brown's double exponential smoothing — the SES algebra composed to trend.
# ---------------------------------------------------------------------------
@register(
    "brown_trend_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(floor(value*100 + 0.5)::BIGINT)::BIGINT AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    idx AS (
      SELECT (day - (SELECT min(day) FROM daily))::BIGINT AS t, cents
      FROM daily),
    tm AS (SELECT max(t)::BIGINT AS tmax FROM idx),
    terms AS (
      SELECT cents,
             CASE WHEN t = 0 THEN tm.tmax ELSE tm.tmax - t + 1 END AS e1,
             CASE WHEN t = 0 THEN tm.tmax + 1 ELSE tm.tmax - t + 2 END AS e2,
             CASE WHEN t = 0 THEN tm.tmax + 2 ELSE tm.tmax - t + 1 END AS m2
      FROM idx CROSS JOIN tm),
    kept AS (
      SELECT
        CASE WHEN e1 <= {SES_MAX_E}
             THEN ((cents::HUGEINT * 1000000)
                   // CAST(power(2.0, e1) AS BIGINT))::BIGINT
             ELSE 0 END AS t1,
        CASE WHEN e2 <= {SES_MAX_E}
             THEN ((cents::HUGEINT * 1000000 * m2)
                   // CAST(power(2.0, e2) AS BIGINT))::BIGINT
             ELSE 0 END AS t2
      FROM terms),
    s AS (SELECT sum(t1)::BIGINT AS s1, sum(t2)::BIGINT AS s2 FROM kept)
    SELECT (tm.tmax + 1)::BIGINT AS n_days_span,
           floor(((CAST(2*s.s1 - s.s2 AS DOUBLE)/1000000.0)/100.0)*10000 + 0.5)
             /10000.0 AS level,
           floor(((CAST(s.s1 - s.s2 AS DOUBLE)/1000000.0)/100.0)*10000 + 0.5)
             /10000.0 AS trend_per_day,
           floor(((CAST(3*s.s1 - 2*s.s2 AS DOUBLE)/1000000.0)/100.0)*10000 + 0.5)
             /10000.0 AS forecast_next_day
    FROM tm CROSS JOIN s
    """,
)
def q_brown_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing (α = 1/2) of daily revenue —
    the linear-TREND forecaster `ses_revenue_forecast`'s level-only model
    can't express, and the composition proof for the dyadic-SES algebra:
    smoothing the smoothed series stays ONE weighted sum, because the
    weight of day t in s″_T has the closed form (T−t+1)·2^−(T−t+2)
    (an INTEGER times a dyadic), with boundary weights 2^−T for s′ and
    (T+2)·2^−(T+1) for s″ carrying the s₀ = x₀ convention.  Emits
    Brown's level a = 2s′−s″, per-day trend b = s′−s″ (α/(1−α) = 1 at
    α = ½) and the one-step forecast a + b = 3s′−2s″.

    Exactness: each term is floor(cents·10⁶·m / 2^e) — the integer
    multiplier m applied BEFORE the single floor division, the divisor
    exact via power(2.0, e); both sums are exact BIGINTs and the three
    emitted statistics are integer combinations of them, floated once at
    emission.  Terms with e > {SES_MAX_E} are defined out (weight
    < (T+2)·2^−40 — sub-micro); the Python gate pins the integer
    identity AND the distance to the true double recurrences.

    Scale: identical to SES — the checkpointed day aggregate, a 1-row T
    broadcast, a bounded fold.  Rebuilding BOTH smoothers after every
    daily load costs the same single scan SES costs.
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
        .localCheckpoint(eager=True)
    )
    d0 = daily.agg(F.min("day").alias("d0"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("t"), "cents"
    )
    tm = idx.agg(F.max("t").cast("long").alias("tmax"))
    terms = idx.crossJoin(F.broadcast(tm)).select(
        "cents",
        F.when(F.col("t") == 0, F.col("tmax"))
        .otherwise(F.col("tmax") - F.col("t") + 1)
        .alias("e1"),
        F.when(F.col("t") == 0, F.col("tmax") + 1)
        .otherwise(F.col("tmax") - F.col("t") + 2)
        .alias("e2"),
        F.when(F.col("t") == 0, F.col("tmax") + 2)
        .otherwise(F.col("tmax") - F.col("t") + 1)
        .alias("m2"),
    )
    kept = terms.select(
        F.expr(
            f"CASE WHEN e1 <= {SES_MAX_E} THEN"
            " CAST((CAST(cents AS DECIMAL(38,0)) * 1000000)"
            " DIV CAST(power(2.0, e1) AS BIGINT) AS BIGINT) ELSE 0 END"
        ).alias("t1"),
        F.expr(
            f"CASE WHEN e2 <= {SES_MAX_E} THEN"
            " CAST((CAST(cents AS DECIMAL(38,0)) * 1000000 * m2)"
            " DIV CAST(power(2.0, e2) AS BIGINT) AS BIGINT) ELSE 0 END"
        ).alias("t2"),
    )
    s = kept.agg(
        F.sum("t1").cast("long").alias("s1"),
        F.sum("t2").cast("long").alias("s2"),
    )
    return tm.crossJoin(F.broadcast(s)).select(
        (F.col("tmax") + 1).cast("long").alias("n_days_span"),
        F.expr(
            "CAST(floor(((CAST(2*s1 - s2 AS DOUBLE)/1000000.0)/100.0)*10000"
            " + 0.5)/10000.0 AS DOUBLE)"
        ).alias("level"),
        F.expr(
            "CAST(floor(((CAST(s1 - s2 AS DOUBLE)/1000000.0)/100.0)*10000"
            " + 0.5)/10000.0 AS DOUBLE)"
        ).alias("trend_per_day"),
        F.expr(
            "CAST(floor(((CAST(3*s1 - 2*s2 AS DOUBLE)/1000000.0)/100.0)*10000"
            " + 0.5)/10000.0 AS DOUBLE)"
        ).alias("forecast_next_day"),
    )


# ---------------------------------------------------------------------------
# Group-sequential A/B monitor: weekly interims, OBF-shaped + Peto bounds.
# ---------------------------------------------------------------------------
# Cumulative two-proportion z at interim k, from the exact BIGINT counts —
# the ab_test_zscore formula with per-week cumulative operands; ONE shared
# DOUBLE text (operand order fixed) on both engines.
# Every float literal is CAST(... AS DOUBLE): Spark parses a bare 1.0 as
# DECIMAL and its decimal-division scale rules diverge from DuckDB's double
# path in the last ulps — enough to flip a 1e-4 quantization boundary.
_GS_D1 = "CAST(1.0 AS DOUBLE)"
_GS_Z = (
    f"((cx1 * {_GS_D1} / cn1) - (cx0 * {_GS_D1} / cn0)) / "
    f"sqrt(((cx1 + cx0) * {_GS_D1} / (cn1 + cn0)) "
    f"* ({_GS_D1} - (cx1 + cx0) * {_GS_D1} / (cn1 + cn0)) "
    f"* (({_GS_D1} / cn1) + ({_GS_D1} / cn0)))"
)
# O'Brien-Fleming-SHAPED boundary calibrated to the final analysis:
# z_crit(k) = 1.96 * sqrt(K / k).  This is the textbook final-calibrated
# approximation of the OBF test (constant boundary on the B-value scale);
# the exact OBF constant for overall alpha = 0.05 differs from 1.96 by a
# few percent and needs multivariate-normal integration, which neither
# engine can do exactly — the SHAPE (near-unspendable early, ~nominal at
# the end) is the industry behavior this monitor demonstrates.
_GS_OBF = "(CAST(1.96 AS DOUBLE) * sqrt(CAST(kk AS DOUBLE) / CAST(k AS DOUBLE)))"
# Haybittle-Peto: |z| >= 3 at every interim, 1.96 at the final analysis —
# exact by construction (its simplicity is the point of the rule).
_GS_PETO = "(CASE WHEN k = kk THEN CAST(1.96 AS DOUBLE) ELSE CAST(3.0 AS DOUBLE) END)"
_GS_ZT = f"CAST(floor(abs({_GS_Z}) * 10000 + 0.5) AS BIGINT)"


@register(
    "ab_group_sequential",
    oracle=f"""
    WITH ud AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
             ('0x' || substr(md5('sprt' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    mind AS (SELECT min(day) AS d0 FROM ud),
    wk AS (
      SELECT ((day - (SELECT d0 FROM mind)) // 7)::BIGINT AS w, arm,
             count(*)::BIGINT AS n, sum(conv)::BIGINT AS x
      FROM ud GROUP BY 1, 2),
    spine AS (SELECT DISTINCT w FROM wk),
    wide AS (
      SELECT s.w,
             coalesce(t.n, 0)::BIGINT AS n1, coalesce(t.x, 0)::BIGINT AS x1,
             coalesce(c.n, 0)::BIGINT AS n0, coalesce(c.x, 0)::BIGINT AS x0
      FROM spine s
      LEFT JOIN wk t ON t.w = s.w AND t.arm = 1
      LEFT JOIN wk c ON c.w = s.w AND c.arm = 0),
    cum AS (
      SELECT w,
             row_number() OVER (ORDER BY w) AS k,
             (sum(n1) OVER o)::BIGINT AS cn1, (sum(x1) OVER o)::BIGINT AS cx1,
             (sum(n0) OVER o)::BIGINT AS cn0, (sum(x0) OVER o)::BIGINT AS cx0
      FROM wide
      WINDOW o AS (ORDER BY w ROWS UNBOUNDED PRECEDING)),
    kk_t AS (SELECT count(*)::BIGINT AS kk FROM spine),
    scored AS (
      SELECT w, k, cn1, cx1, cn0, cx0, kk,
             CASE WHEN cn1 = 0 OR cn0 = 0 OR (cx1 + cx0) = 0
                       OR (cx1 + cx0) = (cn1 + cn0) THEN 0
                  ELSE {_GS_ZT} END AS z_t,
             CAST(floor(({_GS_OBF}) * 10000 + 0.5) AS BIGINT) AS obf_t,
             CAST(floor(({_GS_PETO}) * 10000 + 0.5) AS BIGINT) AS peto_t,
             CASE WHEN cn1 = 0 OR cn0 = 0 OR (cx1 + cx0) = 0
                       OR (cx1 + cx0) = (cn1 + cn0) THEN 0.0
                  ELSE floor(({_GS_Z}) * 10000 + 0.5) / 10000.0 END AS z
      FROM cum CROSS JOIN kk_t)
    SELECT w AS week_idx, k::BIGINT AS analysis_k, kk AS n_analyses,
           cn1, cx1, cn0, cx0, z,
           (obf_t / 10000.0) AS obf_bound,
           (peto_t / 10000.0) AS peto_bound,
           CASE WHEN z_t >= obf_t THEN 'stop' ELSE 'continue' END AS obf_state,
           CASE WHEN z_t >= peto_t THEN 'stop' ELSE 'continue' END AS peto_state
    FROM scored ORDER BY week_idx
    """,
)
def q_ab_group_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/B monitor: the fixed-horizon industry companion
    to `ab_sprt_monitor`, on the SAME md5 'sprt' user-day arms so the two
    early-stopping disciplines read side by side.  Treatment/control
    user-days accumulate week by week; at each of the K weekly interim
    analyses the cumulative two-proportion z is compared against (a) the
    O'Brien-Fleming-SHAPED boundary 1.96·√(K/k) — nearly unspendable
    early, ~nominal at the final look — and (b) the Haybittle-Peto rule
    (3.0 at every interim, 1.96 at the end).  On these A/A arms neither
    rule stops at any interim: the honest null read, asserted in the
    rebuild gate.

    Exactness: weekly counts and cumulative operands are exact BIGINTs
    from one ordered prefix sum over the ≤ ~25-row week aggregate; the z
    and both boundaries are single shared DOUBLE texts quantized to
    1e-4 BEFORE the integer stop compare, so the stop/continue states
    are integer decisions identical across engines; degenerate interims
    (empty arm, pooled 0% or 100%) emit the 0.0 sentinel exactly as
    `ab_test_zscore` does.

    Scale: one partial-agg'd groupBy(user, day) collapse (the corpus
    scan is the whole cost), a (week, arm) re-aggregate of that, and
    every remaining step — spine, prefix sums, boundaries, states — runs
    on the constant-size week table with a 1-row K broadcast.  Weekly
    re-reads after each incremental load re-run one scan, which is what
    a monitor costs at 100 TB.
    """
    ev = _t(spark, sf_dir, "events")
    ud = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .withColumn(
            "arm",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("sprt"), F.col("user_id").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2,
        )
    )
    # collapse once more to (day, arm) cells and checkpoint: the tiny
    # aggregate fans out to the min-day scalar AND the week rollup, and
    # without the checkpoint each consumer would lineage-replay the
    # corpus scan
    da = (
        ud.groupBy("day", "arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dn"),
            F.sum("conv").cast("long").alias("dx"),
        )
        .localCheckpoint(eager=True)
    )
    mind = da.agg(F.min("day").alias("d0"))
    wk = (
        da.crossJoin(F.broadcast(mind))
        .groupBy(
            (F.datediff(F.col("day"), F.col("d0")).cast("long") / 7)
            .cast("long")
            .alias("w"),
            "arm",
        )
        .agg(
            F.sum("dn").cast("long").alias("n"),
            F.sum("dx").cast("long").alias("x"),
        )
    )
    spine = wk.select("w").distinct()
    t_side = wk.filter(F.col("arm") == 1).select(
        F.col("w").alias("tw"), F.col("n").alias("tn"), F.col("x").alias("tx")
    )
    c_side = wk.filter(F.col("arm") == 0).select(
        F.col("w").alias("cw"), F.col("n").alias("cn"), F.col("x").alias("cx")
    )
    wide = (
        spine.join(t_side, spine.w == t_side.tw, "left")
        .join(c_side, spine.w == c_side.cw, "left")
        .select(
            "w",
            F.coalesce("tn", F.lit(0)).cast("long").alias("n1"),
            F.coalesce("tx", F.lit(0)).cast("long").alias("x1"),
            F.coalesce("cn", F.lit(0)).cast("long").alias("n0"),
            F.coalesce("cx", F.lit(0)).cast("long").alias("x0"),
        )
    )
    o = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, 0)
    cum = wide.select(
        "w",
        F.row_number().over(Window.orderBy("w")).cast("long").alias("k"),
        F.sum("n1").over(o).cast("long").alias("cn1"),
        F.sum("x1").over(o).cast("long").alias("cx1"),
        F.sum("n0").over(o).cast("long").alias("cn0"),
        F.sum("x0").over(o).cast("long").alias("cx0"),
    )
    kk_t = spine.agg(F.count(F.lit(1)).cast("long").alias("kk"))
    degenerate = (
        (F.col("cn1") == 0)
        | (F.col("cn0") == 0)
        | ((F.col("cx1") + F.col("cx0")) == 0)
        | ((F.col("cx1") + F.col("cx0")) == (F.col("cn1") + F.col("cn0")))
    )
    scored = (
        cum.crossJoin(F.broadcast(kk_t))
        .withColumn(
            "z_t",
            F.when(degenerate, F.lit(0)).otherwise(F.expr(_GS_ZT)).cast("long"),
        )
        .withColumn(
            "obf_t", F.expr(f"CAST(floor(({_GS_OBF}) * 10000 + 0.5) AS BIGINT)")
        )
        .withColumn(
            "peto_t", F.expr(f"CAST(floor(({_GS_PETO}) * 10000 + 0.5) AS BIGINT)")
        )
        .withColumn(
            "z",
            F.when(degenerate, F.lit(0.0)).otherwise(
                F.expr(f"floor(({_GS_Z}) * 10000 + 0.5) / 10000.0")
            ).cast("double"),
        )
    )
    return scored.select(
        F.col("w").alias("week_idx"),
        F.col("k").alias("analysis_k"),
        F.col("kk").alias("n_analyses"),
        "cn1",
        "cx1",
        "cn0",
        "cx0",
        "z",
        (F.col("obf_t") / 10000.0).cast("double").alias("obf_bound"),
        (F.col("peto_t") / 10000.0).cast("double").alias("peto_bound"),
        F.when(F.col("z_t") >= F.col("obf_t"), "stop")
        .otherwise("continue")
        .alias("obf_state"),
        F.when(F.col("z_t") >= F.col("peto_t"), "stop")
        .otherwise("continue")
        .alias("peto_state"),
    ).orderBy("week_idx")


# ---------------------------------------------------------------------------
# A/B sample-size / duration planner (two-proportion power closed form).
# ---------------------------------------------------------------------------
# z_{alpha/2} at 5% two-sided and z_beta at 80% power, pinned to 6 dp —
# the planner's published constants, not data.
_PW_ZSUM2 = "((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE)) * (CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE)))"
_PW_P = "(CAST(x AS DOUBLE) / CAST(nn AS DOUBLE))"
_PW_P2 = f"({_PW_P} + CAST(d AS DOUBLE) / 100.0)"
_PW_N = (
    f"ceil({_PW_ZSUM2} * ({_PW_P} * (CAST(1.0 AS DOUBLE) - {_PW_P})"
    f" + {_PW_P2} * (CAST(1.0 AS DOUBLE) - {_PW_P2}))"
    f" / ((CAST(d AS DOUBLE) / 100.0) * (CAST(d AS DOUBLE) / 100.0)))"
)


@register(
    "ab_power_sample_size",
    oracle=f"""
    WITH ud AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    s AS (
      SELECT count(*)::BIGINT AS nn, sum(conv)::BIGINT AS x,
             (max(day) - min(day) + 1)::BIGINT AS n_days
      FROM ud),
    d AS (SELECT unnest([1, 2, 5])::BIGINT AS d)
    SELECT d.d AS delta_pp,
           floor(({_PW_P})*10000 + 0.5)/10000.0 AS p_base,
           CAST({_PW_N} AS BIGINT) AS n_per_arm,
           CAST(ceil(CAST({_PW_N} AS DOUBLE) * 2.0 * CAST(n_days AS DOUBLE)
                     / CAST(nn AS DOUBLE)) AS BIGINT) AS est_days
    FROM s CROSS JOIN d
    ORDER BY delta_pp
    """,
)
def q_ab_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment planner: the two-proportion sample-size closed form
    n/arm = (z_{{α/2}}+z_β)²·(p(1−p)+p′(1−p′))/δ² at 5% two-sided α and
    80% power, evaluated at the corpus's own user-day conversion base
    rate for detectable lifts of 1/2/5 pp — plus the duration estimate
    (arms fill at half the observed user-day volume per day).  This is
    the question asked BEFORE `ab_test_zscore`/`ab_sprt_monitor`/
    `ab_group_sequential` run: how long must the experiment be.

    Exactness: the base rate is an exact integer ratio; z constants are
    pinned 6-dp literals CAST AS DOUBLE; each δ's n is one shared DOUBLE
    text ceil'd to an integer — engine-identical by construction.

    Scale: one partial-agg'd groupBy(user, day) collapse to a 1-row
    stats frame, crossed with a 3-row literal δ table.
    """
    ev = _t(spark, sf_dir, "events")
    ud = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        )
    )
    s = ud.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("conv").cast("long").alias("x"),
        (F.datediff(F.max("day"), F.min("day")) + 1).cast("long").alias("n_days"),
    )
    d = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(5))).alias("d0")
    ).select(F.col("d0").cast("long").alias("d"))
    return (
        s.crossJoin(F.broadcast(d))
        .select(
            F.col("d").alias("delta_pp"),
            F.expr(
                f"CAST(floor(({_PW_P})*10000 + 0.5)/10000.0 AS DOUBLE)"
            ).alias("p_base"),
            F.expr(f"CAST({_PW_N} AS BIGINT)").alias("n_per_arm"),
            F.expr(
                f"CAST(ceil(CAST({_PW_N} AS DOUBLE) * 2.0 * CAST(n_days AS DOUBLE)"
                " / CAST(nn AS DOUBLE)) AS BIGINT)"
            ).alias("est_days"),
        )
        .orderBy("delta_pp")
    )


# ---------------------------------------------------------------------------
# Mann–Whitney U on purchase values (exact histogram ranks, tie-corrected).
# ---------------------------------------------------------------------------
# All operands exact integers: 2R(c) = 2·cum_before + t(c) + 1 (doubled
# average rank kills the half), 2U₁ = Σ t₁(c)·2R(c) − n₁(n₁+1); the
# tie-corrected normal variance enters once as a shared DOUBLE text.
_MW_VAR = (
    "((CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 12.0)"
    " * (CAST(n1 + n0 + 1 AS DOUBLE)"
    " - CAST(tie3 AS DOUBLE)"
    " / (CAST(n1 + n0 AS DOUBLE) * CAST(n1 + n0 - 1 AS DOUBLE))))"
)
_MW_Z = (
    f"(CAST(u2 - n1 * n0 AS DOUBLE) / (2.0 * sqrt({_MW_VAR})))"
)


@register(
    "mannwhitney_value_test",
    oracle=f"""
    WITH pv AS (
      SELECT floor(value*100 + 0.5)::BIGINT AS c,
             ('0x' || substr(md5('mwu' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm
      FROM events WHERE event_type = 'purchase'),
    hist AS (
      SELECT c,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS t1,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS t0
      FROM pv GROUP BY c),
    cum AS (
      SELECT c, t1, t0, (t1 + t0) AS t,
             (sum(t1 + t0) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
               - (t1 + t0))::BIGINT AS cum_before
      FROM hist),
    s AS (
      SELECT sum(t1)::BIGINT AS n1, sum(t0)::BIGINT AS n0,
             sum(t1::HUGEINT * (2*cum_before + t + 1)) AS w2,
             sum(t::HUGEINT * t * t - t)::HUGEINT AS tie3
      FROM cum)
    SELECT n1, n0,
           floor((CAST(w2 - n1 * (n1 + 1) AS DOUBLE) / 2.0)*10000 + 0.5)/10000.0
             AS u1,
           floor(({_MW_Z.replace("u2", "(w2 - n1 * (n1 + 1))")})*10000 + 0.5)
             /10000.0 AS z
    FROM s
    """,
)
def q_mannwhitney_value_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) comparing purchase values
    between two md5 event-level arms — the nonparametric two-sample test
    that needs only RANKS, which is exactly what the (value, count)
    histogram carries: the tie-group average rank of value c is
    cum_before(c) + (t(c)+1)/2, so doubled ranks stay integers, the
    rank-sum is one HUGEINT fold over histogram cells, and the classic
    tie-corrected normal approximation enters as a single shared DOUBLE
    text.  On the A/A split z must read ≈ 0 (gate-pinned); beside
    `ks_two_sample` (distribution shape) and `ab_test_zscore`
    (proportions), this completes the standard two-sample toolkit.

    Scale: the shuffle carries (value-cents) histogram cells — bounded
    by the value domain, not the row count; the rank prefix sum runs
    over those aggregate cells; no per-row rank ever materializes.  A
    naive rank() over raw rows would single-task the corpus; this shape
    cannot.
    """
    ev = _t(spark, sf_dir, "events")
    pv = ev.filter(F.col("event_type") == "purchase").select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mwu"), F.col("event_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
    )
    hist = pv.groupBy("c").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("t1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("t0"),
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "c",
        "t1",
        "t0",
        (F.col("t1") + F.col("t0")).alias("t"),
        (
            F.sum(F.col("t1") + F.col("t0")).over(w) - (F.col("t1") + F.col("t0"))
        )
        .cast("long")
        .alias("cum_before"),
    )
    s = cum.agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum("t0").cast("long").alias("n0"),
        F.sum(
            F.col("t1").cast("decimal(38,0)")
            * (2 * F.col("cum_before") + F.col("t") + 1)
        ).alias("w2"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie3"),
    )
    return s.select(
        "n1",
        "n0",
        F.expr(
            "CAST(floor((CAST(w2 - n1 * (n1 + 1) AS DOUBLE) / 2.0)*10000 + 0.5)"
            "/10000.0 AS DOUBLE)"
        ).alias("u1"),
        F.expr(
            f"CAST(floor(({_MW_Z.replace('u2', '(w2 - n1 * (n1 + 1))')})*10000"
            " + 0.5)/10000.0 AS DOUBLE)"
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# Cramér–von Mises two-sample test (ECDF-gap integral off the histogram).
# ---------------------------------------------------------------------------
# Per-cell contribution t·(d/(n1·n0))² micro-quantized BEFORE the fold;
# d = n0·cum1 − n1·cum0 is an exact integer per cell (the scaled ECDF gap).
_CVM_CELL = (
    "CAST(floor(CAST(t AS DOUBLE)"
    " * (CAST(d AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)))"
    " * (CAST(d AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)
_CVM_T = (
    "((CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)"
    " / (CAST(n1 + n0 AS DOUBLE) * CAST(n1 + n0 AS DOUBLE)))"
    " * (CAST(sum_micro AS DOUBLE) / 1000000.0))"
)


@register(
    "cramer_von_mises_test",
    oracle=f"""
    WITH pv AS (
      SELECT floor(value*100 + 0.5)::BIGINT AS c,
             ('0x' || substr(md5('cvm' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm
      FROM events WHERE event_type = 'purchase'),
    hist AS (
      SELECT c,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS t1,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS t0
      FROM pv GROUP BY c),
    cum AS (
      SELECT c, (t1 + t0)::BIGINT AS t,
             (sum(t1) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING))::BIGINT AS cum1,
             (sum(t0) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING))::BIGINT AS cum0
      FROM hist),
    tot AS (
      SELECT sum(t1)::BIGINT AS n1, sum(t0)::BIGINT AS n0 FROM hist),
    cells AS (
      SELECT t, (n0::HUGEINT * cum1 - n1::HUGEINT * cum0)::BIGINT AS d, n1, n0
      FROM cum CROSS JOIN tot),
    s AS (
      SELECT any_value(n1)::BIGINT AS n1, any_value(n0)::BIGINT AS n0,
             sum({_CVM_CELL})::BIGINT AS sum_micro
      FROM cells)
    SELECT n1, n0,
           floor(({_CVM_T})*10000 + 0.5)/10000.0 AS t_stat
    FROM s
    """,
)
def q_cramer_von_mises_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises test on purchase values between two
    md5 event-level arms — the INTEGRATING complement to `ks_two_sample`
    (KS reads the maximum ECDF gap, CvM the squared gap summed over every
    observation, so it sees broad small departures KS misses).  Like the
    whole two-sample family here it runs entirely on the (value-cents)
    histogram: the scaled ECDF gap at each cell is the exact integer
    d = n0·cum1 − n1·cum0 (a HUGEINT product at 100 TB counts), each
    cell's t·(d/(n1·n0))² enters micro-quantized BEFORE the fold, and
    T = n1·n0/N² · Σ.  On the A/A split T must sit far below the 1%
    critical value 0.743 (gate-pinned).

    Scale: one partial-agg'd scan to value-domain-bounded cells; ordered
    prefix sums over the aggregate; a 1-row totals broadcast.  No
    per-row rank or sort — the same reason the trimmed mean and the
    Mann–Whitney ranks scale.
    """
    ev = _t(spark, sf_dir, "events")
    pv = ev.filter(F.col("event_type") == "purchase").select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cvm"), F.col("event_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
    )
    hist = pv.groupBy("c").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("t1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("t0"),
    ).localCheckpoint(eager=True)
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "c",
        (F.col("t1") + F.col("t0")).cast("long").alias("t"),
        F.sum("t1").over(w).cast("long").alias("cum1"),
        F.sum("t0").over(w).cast("long").alias("cum0"),
    )
    tot = hist.agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum("t0").cast("long").alias("n0"),
    )
    cells = cum.crossJoin(F.broadcast(tot)).select(
        "t",
        (
            F.col("n0").cast("decimal(38,0)") * F.col("cum1")
            - F.col("n1").cast("decimal(38,0)") * F.col("cum0")
        )
        .cast("long")
        .alias("d"),
        "n1",
        "n0",
    )
    s = cells.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n0").cast("long").alias("n0"),
        F.sum(F.expr(_CVM_CELL)).cast("long").alias("sum_micro"),
    )
    return s.select(
        "n1",
        "n0",
        F.expr(f"CAST(floor(({_CVM_T})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
            "t_stat"
        ),
    )


# ---------------------------------------------------------------------------
# Welch's t-test on purchase values (unequal variances, exact moments).
# ---------------------------------------------------------------------------
_WT_V = "((CAST({n} AS DOUBLE) * CAST({ss} AS DOUBLE) - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE)) / (CAST({n} AS DOUBLE) * CAST({n} - 1 AS DOUBLE)))"
_WT_V1 = _WT_V.format(n="n1", ss="ss1", s="s1")
_WT_V0 = _WT_V.format(n="n0", ss="ss0", s="s0")
_WT_SE2 = f"(({_WT_V1}) / CAST(n1 AS DOUBLE) + ({_WT_V0}) / CAST(n0 AS DOUBLE))"
_WT_T = (
    f"(((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    f" - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))) / sqrt({_WT_SE2}))"
)
_WT_DF = (
    f"(({_WT_SE2}) * ({_WT_SE2})"
    f" / ((({_WT_V1}) / CAST(n1 AS DOUBLE)) * (({_WT_V1}) / CAST(n1 AS DOUBLE))"
    f" / CAST(n1 - 1 AS DOUBLE)"
    f" + (({_WT_V0}) / CAST(n0 AS DOUBLE)) * (({_WT_V0}) / CAST(n0 AS DOUBLE))"
    f" / CAST(n0 - 1 AS DOUBLE)))"
)


@register(
    "ab_welch_ttest",
    oracle=f"""
    WITH pv AS (
      SELECT floor(value*100 + 0.5)::BIGINT AS c,
             ('0x' || substr(md5('welch' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm
      FROM events WHERE event_type = 'purchase'),
    s AS (
      SELECT sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN arm = 1 THEN c ELSE 0 END)::BIGINT AS s1,
             sum(CASE WHEN arm = 1 THEN c::HUGEINT * c ELSE 0 END) AS ss1,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
             sum(CASE WHEN arm = 0 THEN c ELSE 0 END)::BIGINT AS s0,
             sum(CASE WHEN arm = 0 THEN c::HUGEINT * c ELSE 0 END) AS ss0
      FROM pv)
    SELECT n1, n0,
           floor((((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                   - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))) / 100.0)
                 *10000 + 0.5)/10000.0 AS mean_diff,
           floor(({_WT_T})*10000 + 0.5)/10000.0 AS t_stat,
           floor(({_WT_DF})*10000 + 0.5)/10000.0 AS welch_df
    FROM s
    """,
)
def q_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on purchase values between two md5
    event-level arms, with the Welch–Satterthwaite effective degrees of
    freedom — the default two-sample mean test every experimentation
    platform reports (Student's equal-variance form is a special case;
    Welch is the safe one).  On the A/A split t must read ≈ 0
    (gate-pinned) and df lands near n−2, the homoskedastic limit.

    Exactness: ONE global fold of six exact accumulators (n, Σc, Σc² per
    arm — Σc² in HUGEINT/DECIMAL(38,0)); means, variances, t and df are
    a single shared DOUBLE text each, quantized once at emission.

    Scale: one partial-agg'd corpus scan to a 1-row frame; nothing else.
    """
    ev = _t(spark, sf_dir, "events")
    pv = ev.filter(F.col("event_type") == "purchase").select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("welch"), F.col("event_id").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
    )
    s = pv.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(
            F.when(
                F.col("arm") == 1, F.col("c").cast("decimal(38,0)") * F.col("c")
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("ss1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("c")).otherwise(0))
        .cast("long")
        .alias("s0"),
        F.sum(
            F.when(
                F.col("arm") == 0, F.col("c").cast("decimal(38,0)") * F.col("c")
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("ss0"),
    )
    return s.select(
        "n1",
        "n0",
        F.expr(
            "CAST(floor((((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
            " - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))) / 100.0)"
            "*10000 + 0.5)/10000.0 AS DOUBLE)"
        ).alias("mean_diff"),
        F.expr(f"CAST(floor(({_WT_T})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
            "t_stat"
        ),
        F.expr(f"CAST(floor(({_WT_DF})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
            "welch_df"
        ),
    )


# ---------------------------------------------------------------------------
# Brown–Forsythe (median-Levene) equality-of-variances test, histogram-exact.
# ---------------------------------------------------------------------------
_BF_M1 = "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
_BF_M0 = "(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
_BF_M = "(CAST(s1 + s0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))"
_BF_SSB = (
    f"(CAST(n1 AS DOUBLE) * ({_BF_M1} - {_BF_M}) * ({_BF_M1} - {_BF_M})"
    f" + CAST(n0 AS DOUBLE) * ({_BF_M0} - {_BF_M}) * ({_BF_M0} - {_BF_M}))"
)
_BF_SSW = (
    f"((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * {_BF_M1})"
    f" + (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * {_BF_M0}))"
)
_BF_F = f"((CAST(n1 + n0 - 2 AS DOUBLE) * {_BF_SSB}) / {_BF_SSW})"


@register(
    "brown_forsythe_variance_test",
    oracle=f"""
    WITH pv AS (
      SELECT floor(value*100 + 0.5)::BIGINT AS c,
             ('0x' || substr(md5('bf' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm
      FROM events WHERE event_type = 'purchase'),
    hist AS (
      SELECT arm, c, count(*)::BIGINT AS cnt FROM pv GROUP BY arm, c),
    cum AS (
      SELECT arm, c, cnt,
             (sum(cnt) OVER (PARTITION BY arm ORDER BY c
                             ROWS UNBOUNDED PRECEDING))::BIGINT AS cum,
             (sum(cnt) OVER (PARTITION BY arm))::BIGINT AS n
      FROM hist),
    med AS (
      SELECT arm, min(CASE WHEN cum >= (n + 1) // 2 THEN c END)::BIGINT AS med
      FROM cum GROUP BY arm),
    dev AS (
      SELECT h.arm, h.cnt, abs(h.c - m.med)::BIGINT AS z
      FROM hist h JOIN med m ON h.arm = m.arm),
    s AS (
      SELECT sum(CASE WHEN arm = 1 THEN cnt ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN arm = 1 THEN cnt::HUGEINT * z ELSE 0 END) AS s1,
             sum(CASE WHEN arm = 1 THEN cnt::HUGEINT * z * z ELSE 0 END) AS ss1,
             sum(CASE WHEN arm = 0 THEN cnt ELSE 0 END)::BIGINT AS n0,
             sum(CASE WHEN arm = 0 THEN cnt::HUGEINT * z ELSE 0 END) AS s0,
             sum(CASE WHEN arm = 0 THEN cnt::HUGEINT * z * z ELSE 0 END) AS ss0
      FROM dev),
    mw AS (
      SELECT max(CASE WHEN arm = 1 THEN med END)::BIGINT AS med1,
             max(CASE WHEN arm = 0 THEN med END)::BIGINT AS med0
      FROM med)
    SELECT s.n1, s.n0,
           floor((CAST(mw.med1 AS DOUBLE)/100.0)*10000 + 0.5)/10000.0 AS median_1,
           floor((CAST(mw.med0 AS DOUBLE)/100.0)*10000 + 0.5)/10000.0 AS median_0,
           floor(({_BF_F})*10000 + 0.5)/10000.0 AS f_stat
    FROM s CROSS JOIN mw
    """,
)
def q_brown_forsythe_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (Levene with medians) for equality of purchase
    -value VARIANCES between two md5 event-level arms — the
    dispersion-change companion to the mean tests (`ab_welch_ttest`) and
    shape tests (`ks_two_sample`, `mannwhitney_value_test`): an A/B
    change can leave the mean alone and widen the spread, and this is
    the robust standard test for exactly that.  On the A/A split F must
    read ≈ 0-ish (gate-pinned below the 1% critical region).

    Exactness: everything is histogram arithmetic — per-arm LOWER
    medians are exact order statistics (rank ⌈n/2⌉) off the cumulative
    column; the absolute deviations z = |c − med| are INTEGERS weighted
    by cell counts; the one-way ANOVA F over z folds six exact
    HUGEINT/DECIMAL(38,0) accumulators and enters float once as a shared
    text.  No per-row rank, deviation, or sort ever materializes.

    Scale: the shuffle carries (arm, value-cents) cells bounded by the
    value domain; the median scan and the deviation re-aggregation run
    over those AGGREGATE cells with a 2-row broadcast of the medians.
    """
    ev = _t(spark, sf_dir, "events")
    pv = ev.filter(F.col("event_type") == "purchase").select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("bf"), F.col("event_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
    )
    hist = pv.groupBy("arm", "c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).localCheckpoint(eager=True)
    w = (
        Window.partitionBy("arm")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("arm")
    cum = hist.select(
        "arm",
        "c",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum"),
        F.sum("cnt").over(wt).cast("long").alias("n"),
    )
    med = cum.groupBy("arm").agg(
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("c")))
        .cast("long")
        .alias("med")
    )
    dev = hist.join(F.broadcast(med), "arm").select(
        "arm", "cnt", F.abs(F.col("c") - F.col("med")).cast("long").alias("z")
    )
    s = dev.agg(
        F.sum(F.when(F.col("arm") == 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(
            F.when(
                F.col("arm") == 1, F.col("cnt").cast("decimal(38,0)") * F.col("z")
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("s1"),
        F.sum(
            F.when(
                F.col("arm") == 1,
                F.col("cnt").cast("decimal(38,0)") * F.col("z") * F.col("z"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("ss1"),
        F.sum(F.when(F.col("arm") == 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(
            F.when(
                F.col("arm") == 0, F.col("cnt").cast("decimal(38,0)") * F.col("z")
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("s0"),
        F.sum(
            F.when(
                F.col("arm") == 0,
                F.col("cnt").cast("decimal(38,0)") * F.col("z") * F.col("z"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("ss0"),
    )
    mw = med.agg(
        F.max(F.when(F.col("arm") == 1, F.col("med"))).cast("long").alias("med1"),
        F.max(F.when(F.col("arm") == 0, F.col("med"))).cast("long").alias("med0"),
    )
    return s.crossJoin(F.broadcast(mw)).select(
        "n1",
        "n0",
        F.expr(
            "CAST(floor((CAST(med1 AS DOUBLE)/100.0)*10000 + 0.5)/10000.0"
            " AS DOUBLE)"
        ).alias("median_1"),
        F.expr(
            "CAST(floor((CAST(med0 AS DOUBLE)/100.0)*10000 + 0.5)/10000.0"
            " AS DOUBLE)"
        ).alias("median_0"),
        F.expr(f"CAST(floor(({_BF_F})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
            "f_stat"
        ),
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction on md5 A/A arms (pre-period covariate adjust).
# ---------------------------------------------------------------------------
CUPED_PRE_DAYS = 14
# All operands are exact integer sufficient statistics (cents sums and
# HUGEINT/DECIMAL(38,0) products); the n-scalings cancel inside the ratios
# so theta and rho^2 are single shared DOUBLE texts.
_CUPED_THETA = (
    "(CAST(nn * sxy - sx * sy AS DOUBLE) / CAST(nn * sxx - sx * sx AS DOUBLE))"
)
_CUPED_RHO2 = (
    "((CAST(nn * sxy - sx * sy AS DOUBLE) * CAST(nn * sxy - sx * sy AS DOUBLE))"
    " / (CAST(nn * sxx - sx * sx AS DOUBLE) * CAST(nn * syy - sy * sy AS DOUBLE)))"
)
_CUPED_ADJ = (
    "((CAST(a_sy AS DOUBLE) / CAST(a_n AS DOUBLE))"
    " - ({theta}) * ((CAST(a_sx AS DOUBLE) / CAST(a_n AS DOUBLE))"
    " - (CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE)))) / 100.0"
)


@register(
    "ab_cuped_adjustment",
    oracle=f"""
    WITH mind AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
    ud AS (
      SELECT user_id,
             ('0x' || substr(md5('cuped' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm,
             sum(CASE WHEN event_type = 'purchase'
                       AND CAST(ts AS DATE) < (SELECT d0 FROM mind)
                           + {CUPED_PRE_DAYS}
                      THEN floor(value*100 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS x,
             sum(CASE WHEN event_type = 'purchase'
                       AND CAST(ts AS DATE) >= (SELECT d0 FROM mind)
                           + {CUPED_PRE_DAYS}
                      THEN floor(value*100 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS y
      FROM events GROUP BY user_id),
    pool AS (
      SELECT count(*)::BIGINT AS nn,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x::HUGEINT * y) AS sxy,
             sum(x::HUGEINT * x) AS sxx,
             sum(y::HUGEINT * y) AS syy
      FROM ud),
    arms AS (
      SELECT arm, count(*)::BIGINT AS a_n,
             sum(x)::BIGINT AS a_sx, sum(y)::BIGINT AS a_sy
      FROM ud GROUP BY arm),
    adj AS (
      SELECT a.arm, a.a_n,
             {_CUPED_ADJ.format(theta=_CUPED_THETA)} AS adj_mean,
             (CAST(a.a_sy AS DOUBLE) / CAST(a.a_n AS DOUBLE)) / 100.0 AS raw_mean
      FROM arms a CROSS JOIN pool),
    wide AS (
      SELECT max(CASE WHEN arm = 1 THEN adj_mean END)
               - max(CASE WHEN arm = 0 THEN adj_mean END) AS diff_cuped,
             max(CASE WHEN arm = 1 THEN raw_mean END)
               - max(CASE WHEN arm = 0 THEN raw_mean END) AS diff_raw,
             max(CASE WHEN arm = 1 THEN a_n END)::BIGINT AS n_treat,
             max(CASE WHEN arm = 0 THEN a_n END)::BIGINT AS n_ctl
      FROM adj)
    SELECT w.n_treat, w.n_ctl,
           floor(({_CUPED_THETA})*10000 + 0.5)/10000.0 AS theta,
           floor(({_CUPED_RHO2})*10000 + 0.5)/10000.0 AS rho2,
           floor(w.diff_raw*10000 + 0.5)/10000.0 AS diff_raw,
           floor(w.diff_cuped*10000 + 0.5)/10000.0 AS diff_cuped
    FROM wide w CROSS JOIN pool
    """,
)
def q_ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data): adjust
    each arm's post-period revenue mean by θ·(pre-period mean deviation),
    where θ = cov(pre, post)/var(pre) over all users — the
    industry-standard variance-reduction step run before every A/B
    readout, beside `ab_test_zscore` (unadjusted) and `uplift_by_segment`
    (stratified).  Emits θ, the achieved variance-reduction factor
    ρ² = corr(pre, post)² (CUPED removes exactly that fraction of metric
    variance), and the raw vs CUPED-adjusted treatment−control
    difference on the md5 A/A arms.  On this synthetic corpus per-user
    revenue has almost no stable heterogeneity, so ρ² reads near 0 and
    the adjustment moves the (pure-noise) A/A difference without
    shrinking it — the honest read: CUPED's value is exactly the ρ² it
    reports, and the gate pins the algebra, not a variance win the
    corpus cannot produce.

    Exactness: per-user pre/post cents are exact integer sums split at
    min(day)+{CUPED_PRE_DAYS}; the pooled sufficient statistics (n, Σx,
    Σy, Σxy, Σx², Σy²) are HUGEINT/DECIMAL(38,0) folds; θ, ρ² and both
    arm adjustments are shared DOUBLE texts whose n-scalings cancel
    algebraically, quantized once at emission.

    Scale: one partial-agg'd groupBy(user) collapse (the scan), a 1-row
    pooled-stats broadcast, a 2-row per-arm aggregate — CUPED at 100 TB
    is the cost of one scan, which is why every experimentation platform
    runs it by default.
    """
    ev = _t(spark, sf_dir, "events")
    mind = ev.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    ud = (
        ev.crossJoin(F.broadcast(mind))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (
                        F.col("ts").cast("date")
                        < F.date_add(F.col("d0"), CUPED_PRE_DAYS)
                    ),
                    cents,
                ).otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (
                        F.col("ts").cast("date")
                        >= F.date_add(F.col("d0"), CUPED_PRE_DAYS)
                    ),
                    cents,
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
        .withColumn(
            "arm",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("cuped"), F.col("user_id").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2,
        )
    )
    # ONE scan: the per-arm aggregate carries the product sums too, and
    # the pooled sufficient statistics fold from the 2 arm rows (all six
    # stats are additive) instead of re-scanning the per-user frame
    arms_full = ud.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("a_n"),
        F.sum("x").cast("long").alias("a_sx"),
        F.sum("y").cast("long").alias("a_sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("a_sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("a_sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("a_syy"),
    ).localCheckpoint(eager=True)
    pool = arms_full.agg(
        F.sum("a_n").cast("long").alias("nn"),
        F.sum("a_sx").cast("long").alias("sx"),
        F.sum("a_sy").cast("long").alias("sy"),
        F.sum("a_sxy").cast("decimal(38,0)").alias("sxy"),
        F.sum("a_sxx").cast("decimal(38,0)").alias("sxx"),
        F.sum("a_syy").cast("decimal(38,0)").alias("syy"),
    )
    arms = arms_full.select("arm", "a_n", "a_sx", "a_sy")
    adj = arms.crossJoin(F.broadcast(pool)).select(
        "arm",
        "a_n",
        F.expr(_CUPED_ADJ.format(theta=_CUPED_THETA)).alias("adj_mean"),
        (
            (F.col("a_sy").cast("double") / F.col("a_n").cast("double")) / 100.0
        ).alias("raw_mean"),
    )
    wide = adj.agg(
        (
            F.max(F.when(F.col("arm") == 1, F.col("adj_mean")))
            - F.max(F.when(F.col("arm") == 0, F.col("adj_mean")))
        ).alias("diff_cuped"),
        (
            F.max(F.when(F.col("arm") == 1, F.col("raw_mean")))
            - F.max(F.when(F.col("arm") == 0, F.col("raw_mean")))
        ).alias("diff_raw"),
        F.max(F.when(F.col("arm") == 1, F.col("a_n"))).cast("long").alias("n_treat"),
        F.max(F.when(F.col("arm") == 0, F.col("a_n"))).cast("long").alias("n_ctl"),
    )
    return wide.crossJoin(F.broadcast(pool)).select(
        "n_treat",
        "n_ctl",
        F.expr(f"CAST(floor(({_CUPED_THETA})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
            "theta"
        ),
        F.expr(f"CAST(floor(({_CUPED_RHO2})*10000 + 0.5)/10000.0 AS DOUBLE)").alias(
            "rho2"
        ),
        F.expr(
            "CAST(floor(diff_raw*10000 + 0.5)/10000.0 AS DOUBLE)"
        ).alias("diff_raw"),
        F.expr(
            "CAST(floor(diff_cuped*10000 + 0.5)/10000.0 AS DOUBLE)"
        ).alias("diff_cuped"),
    )


# ---------------------------------------------------------------------------
# Log-rank test: conversion survival compared between two md5 arms.
# ---------------------------------------------------------------------------
_LR_E1 = "CAST(floor((CAST(dd AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(nn AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
_LR_V = (
    "CAST(floor((CAST(dd AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(nn AS DOUBLE))"
    " * (1.0 - CAST(n1 AS DOUBLE) / CAST(nn AS DOUBLE))"
    " * (CASE WHEN nn > 1 THEN CAST(nn - dd AS DOUBLE) / CAST(nn - 1 AS DOUBLE)"
    " ELSE 0.0 END)) * 1000000.0 + 0.5) AS BIGINT)"
)
_LR_Z = "(CAST(o1 * 1000000 - e1_micro AS DOUBLE) / 1000000.0) / sqrt(CAST(v_micro AS DOUBLE) / 1000000.0)"


@register(
    "logrank_test_conversion",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type FROM events),
    horizon AS (SELECT max(us)::BIGINT AS h FROM e),
    t0 AS (
      SELECT user_id, min(CASE WHEN event_type = 'signup' THEN us END)::BIGINT AS s_us
      FROM e GROUP BY user_id HAVING s_us IS NOT NULL),
    conv AS (
      SELECT t0.user_id, t0.s_us,
             min(CASE WHEN e.event_type = 'purchase' AND e.us > t0.s_us
                      THEN e.us END)::BIGINT AS p_us
      FROM t0 JOIN e ON e.user_id = t0.user_id
      GROUP BY t0.user_id, t0.s_us),
    dur AS (
      SELECT user_id,
             ('0x' || substr(md5('logrank' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm,
             CASE WHEN p_us IS NOT NULL THEN (p_us - s_us) // 86400000000
                  ELSE ((SELECT h FROM horizon) - s_us) // 86400000000
             END AS d,
             CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM conv),
    days AS (
      SELECT d,
             sum(CASE WHEN arm = 0 THEN ev ELSE 0 END)::BIGINT AS d1,
             sum(CASE WHEN arm = 1 THEN ev ELSE 0 END)::BIGINT AS d2,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS t1,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS t2
      FROM dur GROUP BY d),
    risk AS (
      SELECT d, d1, d2,
             (sum(t1) OVER (ORDER BY d DESC ROWS UNBOUNDED PRECEDING))::BIGINT AS n1,
             (sum(t2) OVER (ORDER BY d DESC ROWS UNBOUNDED PRECEDING))::BIGINT AS n2
      FROM days),
    terms AS (
      SELECT d, d1, d2, n1, n2, (n1 + n2) AS nn, (d1 + d2) AS dd,
             {_LR_E1} AS e1_t, {_LR_V} AS v_t
      FROM risk WHERE (d1 + d2) > 0),
    tot AS (
      SELECT sum(d1)::BIGINT AS o1, sum(d2)::BIGINT AS o2,
             sum(e1_t)::BIGINT AS e1_micro, sum(v_t)::BIGINT AS v_micro,
             count(*)::BIGINT AS n_event_days
      FROM terms)
    SELECT o1, o2, n_event_days,
           floor((CAST(e1_micro AS DOUBLE) / 1000000.0)*10000 + 0.5)/10000.0 AS e1,
           floor(({_LR_Z})*10000 + 0.5)/10000.0 AS z
    FROM tot
    """,
)
def q_logrank_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing the signup→purchase survival curves of two
    md5 user arms: at each event day the observed arm-0 events are
    compared with their hypergeometric expectation under "curves are
    equal", and z = (O₁−E₁)/√V aggregates the per-day terms — THE
    standard test for "does treatment change time-to-conversion", the
    inferential companion to `kaplan_meier_conversion`'s estimate
    (means of censored durations are biased; the log-rank isn't).  On
    these exchangeable A/A arms z sits inside ±2 — the null read this
    audit exists to certify.

    Exactness: durations, risk sets and event counts are exact integers
    (the KM machinery, per arm); each event day's expectation and
    variance terms are ONE shared DOUBLE text quantized to micro BEFORE
    the sums; z is a single shared expression over the integer totals.

    Scale: two partial-agg'd groupBys (per-user firsts, per-day arm
    counts) and reverse prefix sums on the day AGGREGATE — identical
    economics to the KM query it tests.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts)").alias("us"), "event_type"
    )
    horizon = ev.agg(F.max("us").cast("long").alias("h"))
    t0 = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("us")))
            .cast("long")
            .alias("s_us")
        )
        .filter(F.col("s_us").isNotNull())
    )
    conv = (
        t0.join(ev, "user_id")
        .groupBy("user_id", "s_us")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("us") > F.col("s_us")),
                    F.col("us"),
                )
            )
            .cast("long")
            .alias("p_us")
        )
    )
    dur = conv.crossJoin(F.broadcast(horizon)).select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("logrank"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
        F.when(F.col("p_us").isNotNull(), F.expr("(p_us - s_us) DIV 86400000000"))
        .otherwise(F.expr("(h - s_us) DIV 86400000000"))
        .alias("d"),
        F.when(F.col("p_us").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    days = dur.groupBy("d").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("ev")).otherwise(0)).cast("long").alias("d1"),
        F.sum(F.when(F.col("arm") == 1, F.col("ev")).otherwise(0)).cast("long").alias("d2"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("t1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("t2"),
    )
    w_risk = Window.orderBy(F.desc("d")).rowsBetween(Window.unboundedPreceding, 0)
    risk = days.select(
        "d",
        "d1",
        "d2",
        F.sum("t1").over(w_risk).cast("long").alias("n1"),
        F.sum("t2").over(w_risk).cast("long").alias("n2"),
    )
    terms = (
        risk.withColumn("nn", F.col("n1") + F.col("n2"))
        .withColumn("dd", F.col("d1") + F.col("d2"))
        .filter(F.col("dd") > 0)
        .withColumn("e1_t", F.expr(_LR_E1))
        .withColumn("v_t", F.expr(_LR_V))
    )
    tot = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("d2").cast("long").alias("o2"),
        F.sum("e1_t").cast("long").alias("e1_micro"),
        F.sum("v_t").cast("long").alias("v_micro"),
        F.count(F.lit(1)).cast("long").alias("n_event_days"),
    )
    return tot.select(
        "o1",
        "o2",
        "n_event_days",
        F.expr(
            "CAST(floor((CAST(e1_micro AS DOUBLE) / 1000000.0)*10000 + 0.5)/10000.0"
            " AS DOUBLE)"
        ).alias("e1"),
        F.expr(f"CAST(floor(({_LR_Z})*10000 + 0.5)/10000.0 AS DOUBLE)").alias("z"),
    )


# ---------------------------------------------------------------------------
# Isotonic calibration of P(purchase) vs hour (exact minimax formula).
# ---------------------------------------------------------------------------
@register(
    "isotonic_hour_calibration",
    oracle="""
    WITH cells AS (
      SELECT hour(ts)::BIGINT AS h, count(*)::BIGINT AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS x
      FROM events GROUP BY 1),
    pre AS (
      SELECT h, n, x,
             (sum(n) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING))::BIGINT AS pn,
             (sum(x) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING))::BIGINT AS px
      FROM cells),
    iv AS (
      SELECT a.h AS a, b.h AS b,
             ((b.px - a.px + a.x)::HUGEINT * 1000000000
              // (b.pn - a.pn + a.n))::BIGINT AS m_nano
      FROM pre a JOIN pre b ON a.h <= b.h),
    inner_min AS (
      SELECT c.h, iv.a, min(iv.m_nano)::BIGINT AS mn
      FROM cells c JOIN iv ON iv.a <= c.h AND iv.b >= c.h
      GROUP BY c.h, iv.a),
    iso AS (
      SELECT h, max(mn)::BIGINT AS iso_nano FROM inner_min GROUP BY h)
    SELECT c.h AS hour, c.n, c.x,
           floor((CAST(c.x AS DOUBLE) / CAST(c.n AS DOUBLE))*10000 + 0.5)/10000.0
             AS raw_rate,
           floor((CAST(i.iso_nano AS DOUBLE) / 1000000000.0)*10000 + 0.5)/10000.0
             AS iso_rate
    FROM cells c JOIN iso i ON c.h = i.h
    ORDER BY hour
    """,
)
def q_isotonic_hour_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone nondecreasing) calibration of the purchase
    rate as a function of hour-of-day, solved EXACTLY by the minimax
    characterization of the PAVA solution: iso(h) = max_{a≤h} min_{b≥h}
    weighted-mean(rate over hours a..b).  Isotonic fits are the
    standard score-calibration step (beside `calibration_bins`, which
    only measures miscalibration) and the usual monotone-constraint
    smoother for dose-response curves; on this uniform corpus the fit
    collapses toward a flat staircase — the honest no-signal read.

    Exactness: interval means never materialize as floats — each of the
    ≤ 24·25/2 intervals carries floor(10⁹·X/N) as an INTEGER, and
    because floor is monotone, max-of-min over quantized means equals
    the quantized max-of-min: iso_nano(h) = floor(10⁹·iso_true(h))
    EXACTLY (the pure-Python Fraction PAVA gate checks this identity).
    The 10⁹-scaled numerator is widened to DECIMAL(38,0)/HUGEINT before
    the multiply — cumulative purchase counts past ~9.2e9 would wrap a
    BIGINT product silently in Spark while DuckDB errors, breaking
    engine parity exactly where 100 TB corpora live.
    No iteration, no data-dependent pooling order — the minimax form is
    what makes PAVA, an inherently sequential algorithm, a closed-form
    distributed query.

    Scale: the corpus collapses to 24 hour cells in one partial-agg'd
    scan; prefix sums, the 300-interval self-join and both minimax
    folds all run on that constant-size aggregate.
    """
    ev = _t(spark, sf_dir, "events")
    # the 24-row hour table fans out to the prefix sums (both self-join
    # sides), the minimax grid and the final join — checkpoint it or each
    # consumer replays the events scan (plan audit showed x4)
    cells = (
        ev.groupBy(F.hour("ts").cast("long").alias("h"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("x"),
        )
        .localCheckpoint(eager=True)
    )
    wp = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    pre = cells.select(
        "h",
        "n",
        "x",
        F.sum("n").over(wp).cast("long").alias("pn"),
        F.sum("x").over(wp).cast("long").alias("px"),
    )
    a = pre.select(
        F.col("h").alias("a"), F.col("n").alias("an"), F.col("x").alias("ax"),
        F.col("pn").alias("apn"), F.col("px").alias("apx"),
    )
    b = pre.select(
        F.col("h").alias("b"), F.col("pn").alias("bpn"), F.col("px").alias("bpx")
    )
    iv = (
        a.join(b, F.col("a") <= F.col("b"))
        .select(
            "a",
            "b",
            F.expr(
                "CAST((CAST(bpx - apx + ax AS DECIMAL(38,0)) * 1000000000)"
                " DIV (bpn - apn + an) AS BIGINT)"
            ).alias("m_nano"),
        )
    )
    inner_min = (
        cells.select(F.col("h"))
        .join(iv, (F.col("a") <= F.col("h")) & (F.col("b") >= F.col("h")))
        .groupBy("h", "a")
        .agg(F.min("m_nano").cast("long").alias("mn"))
    )
    iso = inner_min.groupBy("h").agg(F.max("mn").cast("long").alias("iso_nano"))
    return (
        cells.join(iso, "h")
        .select(
            F.col("h").alias("hour"),
            "n",
            "x",
            F.expr(
                "CAST(floor((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))*10000 + 0.5)"
                "/10000.0 AS DOUBLE)"
            ).alias("raw_rate"),
            F.expr(
                "CAST(floor((CAST(iso_nano AS DOUBLE) / 1000000000.0)*10000 + 0.5)"
                "/10000.0 AS DOUBLE)"
            ).alias("iso_rate"),
        )
        .orderBy("hour")
    )
