"""Dense-cell probe for the rebuilt `session_overlap_pairs` (VERDICT r10
"what's wrong" #1 done-criterion, stairstep-probe method: a falsifiable
prediction, then the measurement).

The r10 shape's candidate mass was Σ_cell C(pop, 2) — co-active-density
QUADRATIC even when the top-20 answer is decided by a handful of long
sessions.  The r11 rebuild prunes sessions shorter than T (a provable
lower bound on the 20th-best overlap) before the grid explode, so
candidate mass is Σ_cell C(survivors, 2).

Two regimes, two scales each (NX controls corpus size):

- HETEROGENEOUS (the realistic dense-co-activity case): NX*40_000 short
  (30-min) sessions packed into a few hot hours — the r10 skew bomb —
  plus 30 long (6-8 h) sessions whose pairwise overlaps fill the top-20.
  PREDICTION: T lands near the long sessions' overlaps, every short
  session is pruned, survivors and candidate mass are FLAT in NX, and
  runtime grows only with the scan (sessionization) — not density².
  Under the r10 shape candidates would grow 16x per 4x step.

- UNIFORM (the adversarial bound, stated honestly): NX*2_000 identical
  full-overlap sessions in one cell.  No length prune can help (all
  lengths equal T) — but there the TRUE overlapping-pair count IS the
  candidate count (candidates/true = 1): the join does no wasted work,
  which is the output-bound limit any exact engine hits.

Both regimes print measured candidate mass (Σ C(survivors,2), computed
by mirroring the query's own threshold phase in SQL) next to query
runtime.  Fixture events are written once per (regime, NX) under
--out; sessions are event runs at 9-minute steps so the 10-minute house
gap rule keeps them whole.

Usage: python tools/session_dense_probe.py [--out .scale/sessprobe]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
BASE = "/root/testdata/sf0.1"

_H_US = 3_600_000_000
_STEP_US = 540_000_000  # 9 min
_BASE_US = 1_700_000_000_000_000


def _write_fixture(spark, out: str, sessions) -> None:
    """sessions: DataFrame(user_id long, s_us long, e_us long) -> events
    parquet with one event every 9 min (ends included)."""
    import pyspark.sql.functions as F

    # MICROS on disk (not the INT96 default, which pyarrow reports as
    # timestamp[ns] and trips the loader's nanos branch), UTC wall clock.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    os.makedirs(out, exist_ok=True)
    for t in ("region nation customer supplier part orders lineitem "
              "documents embeddings").split():
        lnk = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(lnk):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), lnk)
    ev = sessions.select(
        "user_id",
        F.explode(
            F.array_union(
                F.sequence("s_us", "e_us", F.lit(_STEP_US)),
                F.array("e_us"),
            )
        ).alias("ts_us"),
    ).select(
        "user_id", F.timestamp_micros(F.col("ts_us")).alias("ts")
    )
    ev.write.mode("overwrite").parquet(f"{out}/events.parquet")


def _hetero_sessions(spark, nx: int):
    """NX*40k short sessions in 4 hot hours + 30 long top-20 deciders."""
    import pyspark.sql.functions as F

    n_short = nx * 40_000
    short = spark.range(n_short).select(
        (F.col("id") + 1000).alias("user_id"),
        # 4 hot hours; starts jittered inside the hour by id
        (F.lit(_BASE_US) + (F.col("id") % 4) * 6 * _H_US
         + (F.col("id") * 7919) % _H_US).alias("s_us"),
    ).withColumn("e_us", F.col("s_us") + _H_US // 2)
    long = spark.range(30).select(
        (F.col("id") + 2).alias("user_id"),
        (F.lit(_BASE_US) + 30 * _H_US + F.col("id") * (_H_US // 4)).alias("s_us"),
        (F.lit(_BASE_US) + 30 * _H_US + F.col("id") * (_H_US // 4)
         + 6 * _H_US + (F.col("id") % 3) * _H_US).alias("e_us"),
    )
    return short.unionByName(long)


def _uniform_sessions(spark, nx: int):
    import pyspark.sql.functions as F

    n = nx * 2_000
    return spark.range(n).select(
        (F.col("id") + 1000).alias("user_id"),
        F.lit(_BASE_US).alias("s_us"),
    ).withColumn("e_us", F.col("s_us") + _H_US // 2)


_STATS_SQL = """
WITH e AS (
  SELECT user_id, unix_micros(ts) AS ts_us FROM parquet.`{p}`),
l AS (
  SELECT user_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 600000000
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
s AS (
  SELECT user_id, ts_us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM l),
sess AS (
  SELECT user_id, sess, min(ts_us) AS s_us, max(ts_us) AS e_us
  FROM s GROUP BY 1, 2),
nz AS (SELECT *, e_us - s_us AS len_us FROM sess WHERE e_us > s_us),
top256 AS (SELECT * FROM nz ORDER BY len_us DESC, user_id, sess LIMIT 256),
t20 AS (
  SELECT CASE WHEN count(*) = 20 THEN min(ov) ELSE 0 END AS t_min FROM (
    SELECT least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS ov
    FROM top256 a JOIN top256 b ON a.user_id < b.user_id
    WHERE least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) > 0
    ORDER BY ov DESC LIMIT 20)),
surv AS (SELECT nz.* FROM nz, t20 WHERE len_us >= t_min),
cells AS (
  SELECT explode(sequence(CAST(s_us / 3600000000 AS BIGINT),
                          CAST(e_us / 3600000000 AS BIGINT))) AS cell
  FROM surv)
SELECT (SELECT count(*) FROM sess) AS n_sessions,
       (SELECT count(*) FROM surv) AS survivors,
       (SELECT any_value(t_min) FROM t20) AS t_min,
       (SELECT sum(c * (c - 1) DIV 2)
        FROM (SELECT count(*) AS c FROM cells GROUP BY cell)) AS cand_mass
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, ".scale", "sessprobe"))
    ap.add_argument("--scales", default="1,4")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from vector_search_spark import registry
    from vector_search_spark.session import get_spark

    spark = get_spark("session_dense_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "session_dense_probe", "cases": {}}
    for regime, gen in (("hetero", _hetero_sessions), ("uniform", _uniform_sessions)):
        for nx in [int(x) for x in args.scales.split(",")]:
            tag = f"{regime}_x{nx}"
            d = os.path.join(args.out, tag)
            if not os.path.exists(os.path.join(d, "events.parquet")):
                _write_fixture(spark, d, gen(spark, nx))
            stats = spark.sql(
                _STATS_SQL.format(p=os.path.join(d, "events.parquet"))
            ).first().asDict()
            t0 = time.perf_counter()
            rows = registry.QUERIES["session_overlap_pairs"](spark, d).collect()
            sec = round(time.perf_counter() - t0, 2)
            out["cases"][tag] = {
                **{k: int(v) for k, v in stats.items()},
                "query_sec": sec, "rows": len(rows),
            }
            print(f"# {tag}: {out['cases'][tag]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
