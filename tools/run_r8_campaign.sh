#!/bin/bash
# Round-8 scale campaign: slice-verify the 1000x fixture, then record the
# re-based decade triple (10x / 100x / 1000x) with checksum consumption
# (SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 on ALL scaled runs so the three
# records are consumption-consistent and the decade ratios measure the
# engine, not py4j row decoding; ordered-query contracts stay verified by
# the invariance suite and the sf0.1 driver bench, which uses collect).
# Suffix family excluded at 1000x ONLY (the suffix array is ~4 GB heap
# per M tokens - SCALING_MEASURED.md; its builder is skipped too).
set -x
cd /root/repo

SPARK_DRIVER_MEMORY=48g SPARK_GRAFT_CPUS=32 \
  python tools/scaled_verify.py /root/repo/.scale/sf100 sv_1000x_r8 --replica 777 \
  > scaled_verify_1000x_r8.json 2> .sv1000_r8.errlog

SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf1 SPARK_DRIVER_MEMORY=32g \
  SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 \
  python bench.py > bench_sf1_r8.raw 2> bench_sf1_r8.err \
  && head -1 bench_sf1_r8.raw > bench_sf1_r8.json

SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf10 SPARK_DRIVER_MEMORY=64g \
  SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 \
  python bench.py > bench_sf10_r8.raw 2> bench_sf10_r8.err \
  && head -1 bench_sf10_r8.raw > bench_sf10_r8.json

SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf100 SPARK_DRIVER_MEMORY=96g \
  SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 \
  SPARK_GRAFT_BENCH_SKIP=doc_suffix_lrs,corpus_suffix_repeats,corpus_exact_dedup_rewrite \
  SPARK_GRAFT_BENCH_SKIP_SETUP=_shared_suffix \
  python bench.py > bench_sf100_r8.raw 2> bench_sf100_r8.err \
  && head -1 bench_sf100_r8.raw > bench_sf100_r8.json

echo CAMPAIGN_DONE > /root/repo/.campaign_r8.done
