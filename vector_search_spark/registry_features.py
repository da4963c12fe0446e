"""Feature-engineering / interval-analytics operators: the preprocessing
steps an ML training pipeline runs between raw tables and model fits, each
a declarative Spark plan with a bit-exact DuckDB oracle.

- ``session_overlap_pairs``   — interval×interval overlap join between user
                                sessions (grid-bucketed equi-join — the
                                missing sibling of the point-in-interval
                                `operators/rangejoin.py`).
- ``feature_mutual_information`` — MI(feature; label) per candidate
                                feature, the standard filter-method feature
                                selector, in exact micro-nat integers.
- ``target_encoding_oof``     — out-of-fold target (mean) encoding with
                                md5 folds: the leakage-protected
                                categorical encoder.

House invariants as everywhere: md5-derived folds, integer-cents sums,
micro-nat ln quantization per INTEGER input, one round4 per emitted float,
id-column tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.scalar import round4
from .registry import register
from .sources.tables import load_table as __load


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return __load(spark, sf_dir, name)


_GAP_US = 600_000_000        # 10-minute session gap (the house rule)
_GRID_US = 3_600_000_000     # 1-hour overlap-join bucket


@register(
    "session_overlap_pairs",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS ts_us FROM events),
    l AS (
      SELECT user_id, ts_us,
             CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w > {_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
    s AS (
      SELECT user_id, ts_us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess
      FROM l),
    sess AS (
      SELECT user_id, sess::BIGINT AS sess_idx,
             min(ts_us)::BIGINT AS s_us, max(ts_us)::BIGINT AS e_us
      FROM s GROUP BY 1, 2),
    pairs AS (
      SELECT a.user_id AS user_a, a.sess_idx AS sess_a,
             b.user_id AS user_b, b.sess_idx AS sess_b,
             (least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us))::BIGINT
               AS overlap_us
      FROM sess a JOIN sess b
        ON a.user_id < b.user_id
       AND a.s_us < b.e_us AND b.s_us < a.e_us),
    top AS (
      SELECT *, row_number() OVER (ORDER BY overlap_us DESC, user_a, sess_a,
                                            user_b, sess_b) AS rank_id
      FROM pairs WHERE overlap_us > 0)
    SELECT rank_id::BIGINT AS rank_id, user_a, sess_a, user_b, sess_b,
           overlap_us
    FROM top WHERE rank_id <= 20 ORDER BY rank_id
    """,
)
def q_session_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join: the 20 most-overlapping pairs of
    concurrent sessions from DIFFERENT users — who was active together
    (co-browsing detection, load attribution, contention analysis).  The
    sibling of the point-in-interval range join: both ends are intervals.

    Plan: sessions from the house 10-minute gaps-and-islands rule, then
    each session explodes to the 1-hour grid cells it touches and pairs
    form by EQUI-join on the cell (+ user_a < user_b to orient), distinct
    to undo multi-cell double-counting, exact strict-overlap predicate
    last — never a cartesian, never an inequality-only join.  Grid cells
    bound pair generation to co-active sessions; cell size tunes fan-out
    vs selectivity exactly like `operators/rangejoin.py`.

    The DuckDB oracle uses its native inequality join (IEJoin) on the raw
    overlap predicate — a completely different join strategy, so agreement
    checks the bucketing is lossless.  Exactness: all integer microseconds;
    top-20 tie-breaks on the id quadruple.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns DIV 1000").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    brk = ev.withColumn(
        "brk",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > _GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = (
        brk.withColumn(
            "sess",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", F.col("sess").cast("long").alias("sess_idx"))
        .agg(
            F.min("ts_us").cast("long").alias("s_us"),
            F.max("ts_us").cast("long").alias("e_us"),
        )
    )
    cells = sess.withColumn(
        "cell",
        F.explode(
            F.sequence(
                (F.col("s_us") / _GRID_US).cast("long"),
                (F.col("e_us") / _GRID_US).cast("long"),
            )
        ),
    )
    a = cells.select(
        F.col("user_id").alias("user_a"),
        F.col("sess_idx").alias("sess_a"),
        F.col("s_us").alias("sa"),
        F.col("e_us").alias("ea"),
        "cell",
    )
    b = cells.select(
        F.col("user_id").alias("user_b"),
        F.col("sess_idx").alias("sess_b"),
        F.col("s_us").alias("sb"),
        F.col("e_us").alias("eb"),
        "cell",
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("user_a") < F.col("user_b"))
        .filter((F.col("sa") < F.col("eb")) & (F.col("sb") < F.col("ea")))
        .select("user_a", "sess_a", "user_b", "sess_b", "sa", "ea", "sb", "eb")
        .distinct()
        .withColumn(
            "overlap_us",
            (
                F.least(F.col("ea"), F.col("eb"))
                - F.greatest(F.col("sa"), F.col("sb"))
            ).cast("long"),
        )
        .filter(F.col("overlap_us") > 0)
    )
    top20 = pairs.orderBy(
        F.desc("overlap_us"), "user_a", "sess_a", "user_b", "sess_b"
    ).limit(20)
    return (
        top20.withColumn(
            "rank_id",
            F.row_number().over(
                Window.orderBy(
                    F.desc("overlap_us"), "user_a", "sess_a", "user_b", "sess_b"
                )
            ),
        )
        .select(
            F.col("rank_id").cast("long").alias("rank_id"),
            "user_a",
            "sess_a",
            "user_b",
            "sess_b",
            "overlap_us",
        )
        .orderBy("rank_id")
    )


_MI_FEATURES = [
    ("quantity", "CAST(floor(l_quantity + 0.5) AS BIGINT)"),
    ("discount_pct", "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"),
    ("tax_pct", "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)"),
]


def _mi_oracle() -> str:
    branches = "\n      UNION ALL ".join(
        f"SELECT '{name}' AS feature, {expr} AS val, l_returnflag AS label"
        f" FROM lineitem"
        for name, expr in _MI_FEATURES
    )
    return f"""
    WITH base AS ({branches}),
    cells AS (
      SELECT feature, val, label, count(*)::BIGINT AS c
      FROM base GROUP BY 1, 2, 3),
    vm AS (SELECT feature, val, sum(c)::BIGINT AS cv FROM cells GROUP BY 1, 2),
    lm AS (SELECT feature, label, sum(c)::BIGINT AS cl FROM cells GROUP BY 1, 2),
    nn AS (SELECT feature, sum(c)::BIGINT AS n FROM cells GROUP BY 1),
    terms AS (
      SELECT cells.feature,
             cells.c * (floor(ln(cells.c)*1000000 + 0.5)::BIGINT
                        + floor(ln(nn.n)*1000000 + 0.5)::BIGINT
                        - floor(ln(vm.cv)*1000000 + 0.5)::BIGINT
                        - floor(ln(lm.cl)*1000000 + 0.5)::BIGINT) AS t,
             nn.n
      FROM cells
      JOIN vm ON vm.feature = cells.feature AND vm.val = cells.val
      JOIN lm ON lm.feature = cells.feature AND lm.label = cells.label
      JOIN nn ON nn.feature = cells.feature)
    SELECT feature,
           (SELECT count(*) FROM vm v WHERE v.feature = terms.feature)::BIGINT
             AS n_vals,
           floor(((CAST(sum(t)::HUGEINT AS DOUBLE) / 1000000.0)
                  / CAST(any_value(n) AS DOUBLE)) * 10000 + 0.5)
             / 10000.0 AS mi_nats
    FROM terms GROUP BY feature ORDER BY feature
    """


@register("feature_mutual_information", oracle=_mi_oracle())
def q_feature_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(feature; label) for each candidate feature
    against the 3-class return flag — the classic filter-method feature
    selector (rank features before training touches them).

    Exactness: MI decomposes as Σ c·(ln c + ln N − ln cv − ln cl)/N with
    every log taken of an INTEGER count and micro-nat-quantized ONCE
    (`unigram_logprob`'s recipe), so the Σ is an exact BIGINT inner
    product and the only float is the final scale.

    Scale: one exploded scan folds to (feature, value, label) cells
    (≤ Σ|domain|·|classes| ≈ 500 rows) with map-side combine; marginals
    and the fold run on the cell table.  Same histogram-sufficiency
    argument as `decision_stump_returns` — MI needs counts, never rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"), F.expr(expr).alias("val")
                    )
                    for name, expr in _MI_FEATURES
                ]
            )
        ).alias("fv"),
        F.col("l_returnflag").alias("label"),
    ).select("fv.feature", "fv.val", "label")
    cells = base.groupBy("feature", "val", "label").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    vm = cells.groupBy("feature", "val").agg(F.sum("c").cast("long").alias("cv"))
    lm = cells.groupBy("feature", "label").agg(F.sum("c").cast("long").alias("cl"))
    nn = cells.groupBy("feature").agg(F.sum("c").cast("long").alias("n"))
    nv = vm.groupBy("feature").agg(F.count(F.lit(1)).cast("long").alias("n_vals"))

    def micro(col):
        return F.floor(F.log(col.cast("double")) * 1000000 + 0.5).cast("long")

    terms = (
        cells.join(vm, ["feature", "val"])
        .join(lm, ["feature", "label"])
        .join(F.broadcast(nn), "feature")
        .select(
            "feature",
            (
                F.col("c")
                * (
                    micro(F.col("c"))
                    + micro(F.col("n"))
                    - micro(F.col("cv"))
                    - micro(F.col("cl"))
                )
            ).alias("t"),
            "n",
        )
    )
    return (
        terms.groupBy("feature")
        .agg(
            # c·ln-term products pass int64 near 1e11 rows — wide accumulator
            F.sum(F.col("t").cast("decimal(38,0)")).cast("decimal(38,0)").alias("st"),
            F.first("n").alias("n"),
        )
        .join(F.broadcast(nv), "feature")
        .select(
            "feature",
            "n_vals",
            round4(
                (F.col("st").cast("double") / 1000000.0) / F.col("n").cast("double")
            ).alias("mi_nats"),
        )
        .orderBy("feature")
    )


@register(
    "target_encoding_oof",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS category,
             ('0x' || substr(md5('fold' || CAST(o_orderkey AS VARCHAR)), 1, 8))
               ::BIGINT % 5 AS fold,
             floor(o_totalprice*100 + 0.5)::BIGINT AS cents
      FROM orders),
    cf AS (
      SELECT category, fold, count(*)::BIGINT AS n_cf, sum(cents)::BIGINT AS s_cf
      FROM base GROUP BY 1, 2),
    c AS (
      SELECT category, sum(n_cf)::BIGINT AS n_c, sum(s_cf)::BIGINT AS s_c
      FROM cf GROUP BY 1)
    SELECT cf.category, cf.fold, cf.n_cf AS n_in_fold,
           floor((((c.s_c - cf.s_cf) / 100.0) / (c.n_c - cf.n_cf)) * 10000 + 0.5)
             / 10000.0 AS encoded_value
    FROM cf JOIN c ON c.category = cf.category
    ORDER BY cf.category, cf.fold
    """,
)
def q_target_encoding_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding of order priority against order value:
    for each (category, md5-fold), the mean target over all OTHER folds —
    the leakage-protected categorical encoder (a row is never encoded with
    statistics that include itself).

    Exactness: the OOF mean is the exact integer rational
    ``(s_c − s_cf)/(n_c − n_cf)`` — complement sums by subtraction, no
    second pass — floated once.  Folds are the house md5 bucketing.

    Scale: ONE partial-agg'd scan to |categories|×5 cells; category totals
    come from re-aggregating the cells, so the encoder costs one shuffle
    of cell rows regardless of corpus size.  The emitted table IS the
    join-able encoder artifact (broadcast it onto the training set).
    """
    od = _t(spark, sf_dir, "orders")
    base = od.select(
        F.col("o_orderpriority").alias("category"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("fold"), F.col("o_orderkey").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 5
        ).alias("fold"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    cf = base.groupBy("category", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_cf"),
        F.sum("cents").cast("long").alias("s_cf"),
    )
    c = cf.groupBy("category").agg(
        F.sum("n_cf").cast("long").alias("n_c"),
        F.sum("s_cf").cast("long").alias("s_c"),
    )
    return (
        cf.join(F.broadcast(c), "category")
        .select(
            "category",
            "fold",
            F.col("n_cf").alias("n_in_fold"),
            round4(
                ((F.col("s_c") - F.col("s_cf")).cast("double") / 100.0)
                / (F.col("n_c") - F.col("n_cf")).cast("double")
            ).alias("encoded_value"),
        )
        .orderBy("category", "fold")
    )
