#!/bin/bash
# Round-10 campaign part 2: the 1000x redo after the part-1 findings.
#   - basket_affinity_pairs OOM'd on collect_set object-agg spill (fixed:
#     back to the binary self-join + repartitioned count), taking gbdt +
#     session down with the JVM -> group N rerun.
#   - mutual_knn_pairs ENOSPC'd shipping directed-candidate arrays (fixed:
#     undirected scoring + broadcast vector fetch) -> group S rerun.
#   - containment_bottomk ENOSPC'd on the pairs-x-array reshuffle (fixed:
#     maybe_broadcast b-side) -> group C rerun.
set -x
cd /root/repo

GRP_N=basket_affinity_pairs,gbdt_residual_stumps,session_overlap_pairs
GRP_S=mutual_knn_pairs
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
SETUP_NOT_SRPW=${ALLSETUP/_shared_srpw_index,/}
SETUP_NOT_SHINGLES=${ALLSETUP/_shared_shingles,/}

export SPARK_LOCAL_DIRS=/tmp/spark-local-r10

for GRP in N S C; do
  case $GRP in
    N) Q=$GRP_N; SETUP=$ALLSETUP;;
    S) Q=$GRP_S; SETUP=$SETUP_NOT_SRPW;;
    C) Q=$GRP_C; SETUP=$SETUP_NOT_SHINGLES;;
  esac
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  df -h / | tail -1
  SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf100 SPARK_DRIVER_MEMORY=96g \
    SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_SKIP=$(comp "$Q") \
    SPARK_GRAFT_BENCH_SKIP_SETUP=$SETUP \
    python bench.py > bench_sf100_r10_${GRP}2.raw 2> bench_sf100_r10_${GRP}2.err
  echo "sf100 group $GRP take-2 exit $?"
  grep '"metric"' bench_sf100_r10_${GRP}2.raw | head -1 > bench_sf100_r10_${GRP}2.json || true
done

rm -rf "$SPARK_LOCAL_DIRS"
echo CAMPAIGN_R10B_DONE
