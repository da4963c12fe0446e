"""Time SELECTED registry queries at any fixture dir — the per-query
companion to bench.py for scale work: bench.py runs the whole registry
(the driver contract); this probes a handful of queries at the 10×/100×
fixtures without paying the full-registry setup.

Usage:
    SPARK_DRIVER_MEMORY=32g python tools/query_scale_probe.py \
        <sf_dir> <tag> <query> [<query> ...]

Prints one JSON line:
    {"metric": "query_scale_probe", "tag", "sf_dir", "queries":
     {name: {"cold_sec", "warm_sec", "rows"}}}

cold = first collect (plan compile + any shared-index build the query
triggers lazily, e.g. the SRP band table); warm = best of two repeat
collects of the SAME DataFrame (steady-state execution, bench.py's
model).  Input tables are page-cache warmed and counted first so cold
isn't charged for the OS read of a 1.5 GB fixture.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from vector_search_spark import registry
    from vector_search_spark.session import get_spark, shuffle_partitions_for

    spark = get_spark("query-scale-probe", cpus=cpus, shuffle_partitions=shuffle_partitions_for(sf_dir, cpus))
    spark.sparkContext.setLogLevel("ERROR")

    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).count()
    warm = spark.range(0, 1024, 1, cpus)
    warm.mapInPandas(lambda it: it, schema="id long").count()

    rec = {
        "metric": "query_scale_probe",
        "tag": tag,
        "sf_dir": sf_dir,
        "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "queries": {},
    }
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        ordered = name in registry.ORDERED_QUERIES
        # Same consumption contract as bench.py: collect() only for
        # ordering-contract queries; JVM-side checksum otherwise so the
        # probe measures the engine, not py4j row decoding.  The frame is
        # built once so reps don't re-pay plan analysis.
        consume = df if ordered else registry.checksum_frame(df)
        samples = []
        n_rows = 0
        for _ in range(3):
            t0 = time.perf_counter()
            rows = consume.collect()
            n_rows = len(rows) if ordered else rows[0]["n"]
            samples.append(round(time.perf_counter() - t0, 3))
        rec["queries"][name] = {
            "cold_sec": samples[0],
            "warm_sec": sorted(samples[1:])[0],
            "rows": n_rows,
        }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
