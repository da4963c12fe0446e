"""Bucketed co-located join: the 100 TB strategy for the orders⋈lineitem
shuffle — pre-bucket both tables on the join key so the sort-merge join
reads both sides in place, with NO Exchange in the plan."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark):
    # spark.sql.warehouse.dir is a static conf — tables land in the default
    # ./spark-warehouse (gitignored) and are dropped on teardown.  A crashed
    # prior run leaves orphan locations the fresh in-memory catalog doesn't
    # know about — remove them before creating.
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    for name, df, key in (("b_orders", orders, "o_orderkey"), ("b_lineitem", lineitem, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
        df.write.bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(name)
    yield "b_orders", "b_lineitem"
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o, li = bucketed_tables
    # hint("merge"): at this tiny SF Spark would broadcast the small side;
    # at 100 TB neither side broadcasts and SMJ is what actually runs —
    # the hint makes the plan show the at-scale shape
    joined = (
        spark.table(li)
        .join(spark.table(o).hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the JOIN itself must be exchange-free (the final small aggregation
    # still exchanges on the group key)
    join_part = plan.split("HashAggregate")[-1]  # below the agg: join + scans
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, join_part[:800]
    # and it's the same result as the plain shuffled join
    plain = (
        spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .join(
            spark.read.parquet("/root/testdata/sf0.01/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from vector_search_spark.partitioning import salted_join

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")

    plain = (
        lineitem.join(orders, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(lineitem, orders, "o_orderkey", buckets=4)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
