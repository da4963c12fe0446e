"""Deterministic synthesized `partsupp` (VERDICT r2 item 5).

The driver's fixture set has no partsupp table, which blocked the TPC-H
Q2/Q11/Q20 query shapes.  This module derives one deterministically from
`part` × a fixed replica fan-out, with every attribute an md5 fold of the
(partkey, suppkey) pair — so the Spark side and the DuckDB oracle (the
`PARTSUPP_SQL` CTE below, generated from the SAME constants) materialize
bit-identical tables from the same parquet inputs, and the three classic
shapes get full value-level oracles.  If the driver ever ships a real
partsupp, swap `synth_partsupp` for a `load_table` call and keep the
queries.

Layout mirrors TPC-H: ~PS_REPLICAS suppliers per part (md5-spread over the
supplier domain, so ~4% of lineitem's (l_partkey, l_suppkey) pairs hit a
partsupp row — enough for a non-trivial Q20 join), availqty 1..9999,
supplycost 1.00..1000.00 kept in integer cents.

Scale: generation is a narrow projection of `part` exploded ×PS_REPLICAS —
embarrassingly parallel, no scan of anything else; the supplier count is a
1-row broadcast scalar; the only exchange is the partial-agg'd DISTINCT on
(partkey, suppkey), O(|part|·replicas) narrow rows.  At 100 TB one would
materialize it once, bucketed by ps_partkey, next to the real dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PS_REPLICAS = 4
PS_MAX_QTY = 9999
PS_COST_SPAN = 99901  # cents: 100 .. 100000  ->  $1.00 .. $1000.00
PS_COST_MIN = 100


def _h(prefix: str, *cols) -> F.Column:
    """First 8 hex chars of md5('{prefix}:a:b') as a non-negative BIGINT —
    the repo-standard cross-engine hash fold (twin of the '0x'||substr
    DuckDB idiom in PARTSUPP_SQL)."""
    parts = [F.lit(f"{prefix}:")]
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(":"))
        parts.append(F.col(c).cast("string"))
    return F.conv(F.substring(F.md5(F.concat(*parts)), 1, 8), 16, 10).cast("long")


def synth_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """partsupp(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents)."""
    n_supp = supplier.agg(F.count(F.lit(1)).alias("__ns"))
    base = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(n_supp))
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(PS_REPLICAS)])).alias("i"),
            "__ns",
        )
        .select(
            "p_partkey",
            (_h("ps", "p_partkey", "i") % F.col("__ns")).alias("ps_suppkey"),
        )
    )
    return (
        base.select(
            F.col("p_partkey").alias("ps_partkey"),
            "ps_suppkey",
            (_h("psq", "p_partkey", "ps_suppkey") % PS_MAX_QTY + 1).alias("ps_availqty"),
            (_h("psc", "p_partkey", "ps_suppkey") % PS_COST_SPAN + PS_COST_MIN).alias(
                "ps_supplycost_cents"
            ),
        )
        .distinct()
    )


def _sql_h(prefix: str, a: str, b: str) -> str:
    return (
        f"('0x' || substr(md5('{prefix}:' || {a}::VARCHAR || ':' || {b}::VARCHAR), 1, 8))::BIGINT"
    )


# DuckDB CTE body: `WITH {PARTSUPP_SQL}, ...` — byte-for-byte the same
# derivation as synth_partsupp, from the same registered part/supplier views.
PARTSUPP_SQL = f"""ps_base AS (
      SELECT p_partkey,
             {_sql_h("ps", "p_partkey", "r.i")} % (SELECT count(*) FROM supplier)
               AS ps_suppkey
      FROM part CROSS JOIN (VALUES {", ".join(f"({i})" for i in range(PS_REPLICAS))}) AS r(i)),
    partsupp AS (
      SELECT DISTINCT p_partkey AS ps_partkey, ps_suppkey,
             {_sql_h("psq", "p_partkey", "ps_suppkey")} % {PS_MAX_QTY} + 1 AS ps_availqty,
             {_sql_h("psc", "p_partkey", "ps_suppkey")} % {PS_COST_SPAN} + {PS_COST_MIN}
               AS ps_supplycost_cents
      FROM ps_base)"""
