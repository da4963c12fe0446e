"""Exact wide-accumulator moment sums for distributed statistics.

The engine's statistics queries (Pearson correlation, mean-of-quantized
folds) keep every accumulator an exact integer so results are bit-stable
under any partitioning.  BIGINT second moments overflow around 1e9-1e10
rows with cents-scale values (Σx² with x≈1e5 cents crosses 9.2e18 near
1e9 rows) — far below the 100 TB target.  These helpers widen the
accumulators to DECIMAL(38,0) (exact to ~1e38, matching DuckDB's native
HUGEINT sum headroom) while keeping per-element inputs BIGINT; the final
float conversion happens once, after aggregation, exactly as before.

Spark sums DECIMAL(38,0) with exact java.math.BigDecimal arithmetic in
the partial/merge aggregate path; overflow (past 1e38) yields NULL rather
than a silent wrap, which downstream NULL-free contracts would surface
immediately.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC38 = "decimal(38,0)"


def dsum(col: Column | str) -> Column:
    """Sum an integral column in an exact DECIMAL(38,0) accumulator."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC38))


def dsum_prod(a: Column | str, b: Column | str) -> Column:
    """Sum of products a·b with the per-element product ALSO computed in
    decimal, so neither the element product nor the running sum can
    overflow BIGINT (decimal(19,0)² → decimal(38,0) exact)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.sum(ca.cast("decimal(19,0)") * cb.cast("decimal(19,0)"))


def moment_sums(df: DataFrame, group: str, x: str, y: str) -> DataFrame:
    """Per-group exact moment sums (n, Σx, Σy, Σx², Σy², Σxy) with
    DECIMAL(38,0) accumulators — the map-side-combinable core of exact
    distributed correlation/variance at any scale."""
    return df.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum_prod(x, x).alias("sxx"),
        dsum_prod(y, y).alias("syy"),
        dsum_prod(x, y).alias("sxy"),
    )


def pearson_from_moments(m: DataFrame, round4) -> DataFrame:
    """Assemble Pearson r from exact moment sums: the variance/covariance
    combinations stay in decimal (exact), floats enter only in the final
    sqrt/division."""
    nd = F.col("n").cast(DEC38)
    vx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        m.columns[0],
        "n",
        F.when((vx == 0) | (vy == 0), F.lit(0.0))
        .otherwise(
            round4(
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
            )
        )
        .alias("pearson_r"),
    )
