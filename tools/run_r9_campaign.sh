#!/bin/bash
# Round-9 scale campaign, part 2: finish the 1000x decade (VERDICT r8 #1).
#
# The r8 run died on the box's ~63 GB disk headroom mid-campaign, leaving
# 63/245 queries measured at 1000x.  This script measures the remaining
# queries in TWO DISK-BUDGETED TRANCHES grouped by shared-setup needs, so
# each tranche pays only the index builds its queries actually use:
#
#   tranche A: the 143 queries that need NO shared builders — all setup
#     skipped (setup_sec ~ 0 instead of ~2,474 s).
#   tranche B: the 40 builder-dependent queries, building only their 11
#     needed builders (per-builder timings land in setup_builders — the
#     VERDICT #7 setup profile).
#
# Between tranches the Spark JVM exits and SPARK_LOCAL_DIRS is wiped, so
# shuffle/spill space from one tranche can never starve the next.  Queries
# measured at r8 are skipped (their record merges in from
# bench_sf100_r8_partial.json); the suffix family and the exact O(n^2)
# cosine baseline stay excluded by design (SCALING_MEASURED.md).
set -x
cd /root/repo

DONE63=$(python -c "import json; print(','.join(sorted(json.load(open('bench_sf100_r8_partial.json'))['queries'])))")
# tranche partition committed alongside this script (ADVICE r9: the old
# /tmp/tranches.json was machine-local — not reproducible from the repo)
TRA=$(python -c "import json; print(','.join(json.load(open('tools/tranches_r9.json'))['A']))")
TRB=$(python -c "import json; print(','.join(json.load(open('tools/tranches_r9.json'))['B']))")
EXCL=corpus_exact_dedup_rewrite,corpus_suffix_repeats,dedup_embedding_cosine,doc_suffix_lrs
ALLSETUP=_ps,_shared_shingles,_shared_signatures,_shared_simhash_sigs,_shared_lsh_candidates,_shared_verified_pairs,_shared_token_blocks,_shared_ivf_index,_shared_srp_index,_shared_pq_index,_shared_sq_index,_shared_doc_features,_shared_bpe,_shared_bigram_lm,_shared_phrase_index,_shared_ivfpq_coarse,_shared_ivfpq_residual_index,_shared_suffix
BSKIP=_shared_ivf_index,_shared_pq_index,_shared_sq_index,_shared_bpe,_shared_ivfpq_coarse,_shared_ivfpq_residual_index,_shared_suffix

export SPARK_LOCAL_DIRS=/tmp/spark-local-r9
rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"

SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf100 SPARK_DRIVER_MEMORY=96g \
  SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_SKIP=$DONE63,$TRB,$EXCL \
  SPARK_GRAFT_BENCH_SKIP_SETUP=$ALLSETUP \
  python bench.py > bench_sf100_r9_trA.raw 2> bench_sf100_r9_trA.err
echo "tranche A exit $?"
head -1 bench_sf100_r9_trA.raw > bench_sf100_r9_trA.json || true

rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
df -h / | tail -1

SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf100 SPARK_DRIVER_MEMORY=96g \
  SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_SKIP=$DONE63,$TRA,$EXCL \
  SPARK_GRAFT_BENCH_SKIP_SETUP=$BSKIP \
  python bench.py > bench_sf100_r9_trB.raw 2> bench_sf100_r9_trB.err
echo "tranche B exit $?"
head -1 bench_sf100_r9_trB.raw > bench_sf100_r9_trB.json || true

rm -rf "$SPARK_LOCAL_DIRS"
echo CAMPAIGN_R9_DONE > /root/repo/.campaign_r9.done
