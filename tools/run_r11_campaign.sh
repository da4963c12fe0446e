#!/bin/bash
# Round-11 scale campaign — fixtures REBUILT with the signed-permutation
# embedding family (make_scaled_fixture.py r11 default), so:
#
#   1. slice-verify the new sf100 first (the standing correctness gate);
#   2. re-measure at all three decades the queries round 11 changed
#      (session_overlap_pairs rebuild; the shingle_table single-exchange
#      change -> dedup_simhash + dedup_minhash_lsh as family probes) and
#      the embedding-family queries whose collision structure the new
#      fixture changes (dedup_embedding_srp, mutual_knn_pairs);
#   3. REPS=3 at 1000x for the six r10-rebuilt queries (VERDICT r10 #5:
#      first true warm numbers at the third decade — median of 3 puts the
#      compile-carrying first collect at the edge, so warm is warm; REPS=2
#      would average the cold sample in).
#
# Tranche layout follows run_r10_campaign.sh: groups per shared builder,
# SPARK_LOCAL_DIRS wiped between 1000x JVMs.
set -x
cd /root/repo

GRP_N=basket_affinity_pairs,gbdt_residual_stumps,session_overlap_pairs
GRP_S=dedup_embedding_srp,mutual_knn_pairs
GRP_C=containment_bottomk,dedup_simhash,dedup_minhash_lsh
TARGETS=$GRP_N,$GRP_S,$GRP_C

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
# group C builds the whole shingle->signature->candidate chain + simhash
SETUP_C=${ALLSETUP/_shared_shingles,/}
SETUP_C=${SETUP_C/_shared_signatures,/}
SETUP_C=${SETUP_C/_shared_simhash_sigs,/}
SETUP_C=${SETUP_C/_shared_lsh_candidates,/}
SETUP_C=${SETUP_C/_shared_verified_pairs,/}
# 10x/100x single session: srpw + the shingle chain all build
SETUP_SMALL=${SETUP_C/_shared_srpw_index,/}

export SPARK_LOCAL_DIRS=/tmp/spark-local-r11

if [ "${SKIP_SLICE:-0}" != "1" ]; then
  python tools/scaled_verify.py /root/repo/.scale/sf100 r11 --replica 777 \
    > scaled_verify_1000x_r11.json 2> scaled_verify_1000x_r11.err
  echo "slice verify exit $?"
fi

SKIPQ=$(comp "$TARGETS")
for SF in sf1 sf10; do
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  SPARK_GRAFT_SF_DIR=/root/repo/.scale/$SF SPARK_DRIVER_MEMORY=96g \
    SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 \
    SPARK_GRAFT_BENCH_SKIP=$SKIPQ \
    SPARK_GRAFT_BENCH_SKIP_SETUP=$SETUP_SMALL \
    python bench.py > bench_${SF}_r11.raw 2> bench_${SF}_r11.err
  echo "$SF exit $?"
  grep '"metric"' bench_${SF}_r11.raw | head -1 > bench_${SF}_r11.json || true
done

for GRP in N S C; do
  case $GRP in
    N) Q=$GRP_N; SETUP=$ALLSETUP;;
    S) Q=$GRP_S; SETUP=$SETUP_NOT_SRPW;;
    C) Q=$GRP_C; SETUP=$SETUP_C;;
  esac
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  df -h / | tail -1
  SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf100 SPARK_DRIVER_MEMORY=96g \
    SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 SPARK_GRAFT_BENCH_REPS=3 \
    SPARK_GRAFT_BENCH_SKIP=$(comp "$Q") \
    SPARK_GRAFT_BENCH_SKIP_SETUP=$SETUP \
    python bench.py > bench_sf100_r11_$GRP.raw 2> bench_sf100_r11_$GRP.err
  echo "sf100 group $GRP exit $?"
  grep '"metric"' bench_sf100_r11_$GRP.raw | head -1 > bench_sf100_r11_$GRP.json || true
done

rm -rf "$SPARK_LOCAL_DIRS"
echo CAMPAIGN_R11_DONE
