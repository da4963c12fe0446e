#!/bin/bash
# Round-10 scale campaign: re-measure the queries round 10 changed, at all
# three decades, under the r9 build-inclusive cold semantics — plus the two
# disk-blocked r9 1000x points (VERDICT r9 #4).
#
#   group N (no shared builders): basket_affinity_pairs,
#     gbdt_residual_stumps, session_overlap_pairs
#   group S (_shared_srpw_index): dedup_embedding_srp, mutual_knn_pairs
#   group C (_shared_shingles):  containment_bottomk
#
# 10x/100x run all six in one session (builders are cheap there);
# 1000x runs the three groups in separate JVMs with SPARK_LOCAL_DIRS wiped
# between them (the r9 ENOSPC lesson: ~65 GB headroom is only enough when
# each group starts with clean spill space and pays only its own builders).
set -x
cd /root/repo

TARGETS=basket_affinity_pairs,gbdt_residual_stumps,session_overlap_pairs,dedup_embedding_srp,mutual_knn_pairs,containment_bottomk
GRP_N=basket_affinity_pairs,gbdt_residual_stumps,session_overlap_pairs
GRP_S=dedup_embedding_srp,mutual_knn_pairs
GRP_C=containment_bottomk

comp () {  # complement of $1 over the registry
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
SKIP6=$(comp "$TARGETS")
SETUP6=${ALLSETUP/_shared_srpw_index,/}; SETUP6=${SETUP6/_shared_shingles,/}

for SF in sf1 sf10; do
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  SPARK_GRAFT_SF_DIR=/root/repo/.scale/$SF SPARK_DRIVER_MEMORY=96g \
    SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 \
    SPARK_GRAFT_BENCH_SKIP=$SKIP6 \
    SPARK_GRAFT_BENCH_SKIP_SETUP=$SETUP6 \
    python bench.py > bench_${SF}_r10.raw 2> bench_${SF}_r10.err
  echo "$SF exit $?"
  grep '"metric"' bench_${SF}_r10.raw | head -1 > bench_${SF}_r10.json || true
done

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
    python bench.py > bench_sf100_r10_$GRP.raw 2> bench_sf100_r10_$GRP.err
  echo "sf100 group $GRP exit $?"
  grep '"metric"' bench_sf100_r10_$GRP.raw | head -1 > bench_sf100_r10_$GRP.json || true
done

rm -rf "$SPARK_LOCAL_DIRS"
echo CAMPAIGN_R10_DONE
