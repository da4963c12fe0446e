#!/bin/bash
# Round-10 campaign part 3: final 1000x redo.
#   - group N: basket's big checkpoint now DISK_ONLY (the MEMORY_AND_DISK
#     read path re-unrolled 600M-row partitions as objects and OOM'd the
#     heap twice), plus the gbdt/session casualties of those crashes.
#   - group C: containment's b-side broadcast needs
#     spark.driver.maxResultSize lifted (2.6 GB legal broadcast vs 1 GB
#     default result cap) — fixed in session.py.
set -x
cd /root/repo

GRP_N=basket_affinity_pairs,gbdt_residual_stumps,session_overlap_pairs
GRP_C=containment_bottomk

comp () {
  python - "$1" <<'EOF'
import sys
from vector_search_spark import registry
keep = set(sys.argv[1].split(","))
print(",".join(sorted(set(registry.QUERIES) - keep)))
EOF
}

ALLSETUP=_ps,_shared_shingles,_shared_signatures,_shared_simhash_sigs,_shared_lsh_candidates,_shared_verified_pairs,_shared_token_blocks,_shared_ivf_index,_shared_srp_index,_shared_srpw_index,_shared_pq_index,_shared_sq_index,_shared_doc_features,_shared_bpe,_shared_bigram_lm,_shared_phrase_index,_shared_ivfpq_coarse,_shared_ivfpq_residual_index,_shared_suffix
SETUP_NOT_SHINGLES=${ALLSETUP/_shared_shingles,/}

export SPARK_LOCAL_DIRS=/tmp/spark-local-r10

for GRP in N C; do
  case $GRP in
    N) Q=$GRP_N; SETUP=$ALLSETUP;;
    C) Q=$GRP_C; SETUP=$SETUP_NOT_SHINGLES;;
  esac
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  df -h / | tail -1
  SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf100 SPARK_DRIVER_MEMORY=96g \
    SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_SKIP=$(comp "$Q") \
    SPARK_GRAFT_BENCH_SKIP_SETUP=$SETUP \
    python bench.py > bench_sf100_r10_${GRP}3.raw 2> bench_sf100_r10_${GRP}3.err
  echo "sf100 group $GRP take-3 exit $?"
  grep '"metric"' bench_sf100_r10_${GRP}3.raw | head -1 > bench_sf100_r10_${GRP}3.json || true
done

rm -rf "$SPARK_LOCAL_DIRS"
echo CAMPAIGN_R10C_DONE
