"""Focused scale probe for the suffix-array family (VERDICT r5 #4).

Usage:
    SPARK_DRIVER_MEMORY=64g python tools/suffix_scale_probe.py <sf_dir> [tag]

Times, in ONE fresh session per scale (run the script once per sf_dir so
JVM/page-cache state never bleeds across scales):

- setup_sec: the `_shared_suffix` build (token explode + prefix-doubling
  rank pyramid) — the memory-hungriest artifact in the repo (the r5 10x
  run OOM'd the 8g default driver here);
- one cold + two warm collects of each suffix-family query.

Prints ONE JSON line; append the records to SCALING_MEASURED.md analysis.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["doc_suffix_lrs", "corpus_suffix_repeats", "corpus_exact_dedup_rewrite"]


def main() -> None:
    sf_dir = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else os.path.basename(sf_dir.rstrip("/"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from vector_search_spark import registry
    from vector_search_spark.registry_suffix import _shared_suffix
    from vector_search_spark.session import get_spark, shuffle_partitions_for

    spark = get_spark("suffix-scale-probe", cpus=cpus, shuffle_partitions=shuffle_partitions_for(sf_dir, cpus))
    spark.sparkContext.setLogLevel("ERROR")
    # page-cache warmup of the one input table, so setup measures compute
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    t0 = time.perf_counter()
    tok, ranks = _shared_suffix(spark, sf_dir)
    setup_sec = round(time.perf_counter() - t0, 3)
    n_tok = tok.count()

    rec = {
        "metric": "suffix_family_scale_probe",
        "tag": tag,
        "sf_dir": sf_dir,
        "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "setup_sec": setup_sec,
        "n_tokens": n_tok,
        "queries": {},
    }
    for name in QUERIES:
        df = registry.QUERIES[name](spark, sf_dir)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows = df.collect()
            samples.append(round(time.perf_counter() - t0, 3))
        rec["queries"][name] = {
            "cold_sec": samples[0],
            "warm_sec": sorted(samples[1:])[0],
            "rows": len(rows),
        }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
