"""Benchmark harness (driver contract): run every registry query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is timed to full materialization (collect).  ``value`` is the
sum of per-query seconds — lower is better.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_search_spark import registry  # noqa: E402
from vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Session-infrastructure warm-up so the first query isn't charged for
    # one-time costs: scan/codegen paths, and the Python worker pool that
    # the Arrow-batched (mapInPandas) operators fork on first use.
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    warm = spark.range(0, 1024, 1, cpus)
    warm.mapInPandas(lambda it: it, schema="id long").count()

    timings: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({len(rows)} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "registry_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
