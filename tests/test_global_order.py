"""global_order_stats / ntile_from_rank: the distributed replacements for
partition-less windows (single-partition sort bottleneck) must agree with
the single-node reference exactly."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_search_spark.partitioning import global_order_stats, ntile_from_rank


def test_rank_and_prior_match_global_window(spark):
    df = spark.createDataFrame(
        [(i * 7 % 101, i, (i * 13) % 50) for i in range(101)],
        "k long, id long, v long",
    ).repartition(9)
    got = {
        r["id"]: (r["__rank"], r["__prior"])
        for r in global_order_stats(df, ["k", "id"], sum_col="v", num_ranges=7).collect()
    }
    w = Window.orderBy("k", "id")
    ref = {
        r["id"]: (r["rr"], r["pp"])
        for r in df.withColumn("rr", F.row_number().over(w))
        .withColumn(
            "pp",
            F.coalesce(
                F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
            ),
        )
        .collect()
    }
    assert got == ref


def test_ntile_formula_matches_spark_ntile(spark):
    # N=101, tiles=10 → first bucket gets the extra row; exercise the
    # uneven split and the small-N edge
    for n_rows, tiles in [(101, 10), (7, 10), (40, 4)]:
        df = spark.createDataFrame([(i,) for i in range(n_rows)], "id long")
        ref = {
            r["id"]: r["t"]
            for r in df.withColumn(
                "t", F.ntile(tiles).over(Window.orderBy("id"))
            ).collect()
        }
        n = df.agg(F.count(F.lit(1)).alias("__n"))
        got = {
            r["id"]: r["t"]
            for r in global_order_stats(df, ["id"], num_ranges=5)
            .crossJoin(F.broadcast(n))
            .withColumn("t", ntile_from_rank(F.col("__rank"), F.col("__n"), tiles))
            .collect()
        }
        assert got == ref, (n_rows, tiles)


def test_global_order_stats_hypothesis(spark):
    """Property: for arbitrary (key, value) multisets, distributed rank +
    exclusive prefix sum equal the sorted-Python reference."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(-50, 50), st.integers(0, 100)),
            min_size=1,
            max_size=60,
        )
    )
    def check(pairs):
        rows = [(i, k, v) for i, (k, v) in enumerate(pairs)]
        df = spark.createDataFrame(rows, "id long, k long, v long").repartition(5)
        got = {
            r["id"]: (r["__rank"], r["__prior"])
            for r in global_order_stats(df, ["k", "id"], sum_col="v", num_ranges=4).collect()
        }
        ref = {}
        run = 0
        for rank, (i, k, v) in enumerate(
            sorted(rows, key=lambda t: (t[1], t[0])), start=1
        ):
            ref[i] = (rank, run)
            run += v
        assert got == ref

    check()


def test_multi_sum_fusion_equals_chained_single_passes(spark):
    """Round 12: sum_col=[a, b] (one fused prefix pass) must equal two
    chained single-column passes — ks_two_sample / pr_best_f1 rely on it."""
    df = spark.createDataFrame(
        [(i * 7 % 101, i, (i * 13) % 50, (i * 29) % 17) for i in range(101)],
        "k long, id long, a long, b long",
    ).repartition(9)
    fused = {
        r["id"]: (r["__rank"], r["__prior_a"], r["__prior_b"])
        for r in global_order_stats(
            df, ["k", "id"], sum_col=["a", "b"], num_ranges=7
        ).collect()
    }
    one = global_order_stats(df, ["k", "id"], sum_col="a", num_ranges=7).withColumnRenamed(
        "__prior", "pa"
    ).drop("__rank")
    two = global_order_stats(one, ["k", "id"], sum_col="b", num_ranges=7)
    chained = {
        r["id"]: (r["__rank"], r["pa"], r["__prior"]) for r in two.collect()
    }
    assert fused == chained
