"""Overflow-headroom gate for the exact-moment accumulators (VERDICT r2
item 4): with cents-scale inputs at 1e10-row magnitudes, Σx² exceeds
BIGINT; the DECIMAL(38,0) path must stay exact where a long accumulator
would wrap or saturate."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_spark.functions.moments import (
    moment_sums,
    pearson_from_moments,
)
from vector_search_spark.functions.scalar import round4

# 40 rows of x ≈ 1e9 cents: Σx² = 40e18 ≈ 4.3× BIGINT max — each element
# product (1e18) still fits a long, so only the ACCUMULATOR is stressed,
# which is exactly the 1e10-row failure mode scaled down.
ROWS = [("g", 10**9 + i, i % 24) for i in range(40)]


def _python_moments():
    n = len(ROWS)
    xs = [x for _, x, _ in ROWS]
    ys = [y for _, _, y in ROWS]
    return {
        "n": n,
        "sx": sum(xs),
        "sy": sum(ys),
        "sxx": sum(x * x for x in xs),
        "syy": sum(y * y for y in ys),
        "sxy": sum(x * y for x, y in zip(xs, ys)),
    }


def test_decimal_moments_exact_past_bigint(spark):
    df = spark.createDataFrame(ROWS, "g string, x long, y long").repartition(7)
    row = moment_sums(df, "g", "x", "y").collect()[0]
    exp = _python_moments()
    assert exp["sxx"] > 2**63 - 1, "fixture no longer stresses the accumulator"
    for k, v in exp.items():
        assert int(row[k]) == v, (k, int(row[k]), v)


def test_pearson_from_wide_moments_matches_python(spark):
    df = spark.createDataFrame(ROWS, "g string, x long, y long").repartition(5)
    got = pearson_from_moments(moment_sums(df, "g", "x", "y"), round4).collect()[0]
    m = _python_moments()
    import math

    vx = m["n"] * m["sxx"] - m["sx"] * m["sx"]
    vy = m["n"] * m["syy"] - m["sy"] * m["sy"]
    num = m["n"] * m["sxy"] - m["sx"] * m["sy"]
    exp = math.floor((num / (math.sqrt(vx) * math.sqrt(vy))) * 10000 + 0.5) / 10000.0
    assert got["pearson_r"] == exp


def test_norm_qc_scaled_sum_headroom(spark):
    """The 1e8-quantized norm sums use the same dsum widening: a long
    accumulator would overflow here, the decimal one is exact."""
    from vector_search_spark.functions.moments import dsum

    df = spark.createDataFrame(
        [(i, 10**18) for i in range(20)], "i long, n2_scaled long"
    ).repartition(3)
    got = df.agg(dsum("n2_scaled").alias("s")).collect()[0]["s"]
    assert int(got) == 20 * 10**18 > 2**63 - 1
