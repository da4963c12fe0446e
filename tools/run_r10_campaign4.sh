#!/bin/bash
# Round-10 campaign part 4: 10x/100x re-measure for the queries whose
# part-1 decade points were taken on interim implementations (basket:
# array variant; mknn: directed scoring; containment: no broadcast), so
# the decade ratios pair the SAME final code at every scale.
set -x
cd /root/repo

TARGETS=basket_affinity_pairs,mutual_knn_pairs,containment_bottomk

comp () {
  python - "$1" <<'EOF'
import sys
from vector_search_spark import registry
keep = set(sys.argv[1].split(","))
print(",".join(sorted(set(registry.QUERIES) - keep)))
EOF
}

ALLSETUP=_ps,_shared_shingles,_shared_signatures,_shared_simhash_sigs,_shared_lsh_candidates,_shared_verified_pairs,_shared_token_blocks,_shared_ivf_index,_shared_srp_index,_shared_srpw_index,_shared_pq_index,_shared_sq_index,_shared_doc_features,_shared_bpe,_shared_bigram_lm,_shared_phrase_index,_shared_ivfpq_coarse,_shared_ivfpq_residual_index,_shared_suffix
SETUP6=${ALLSETUP/_shared_srpw_index,/}; SETUP6=${SETUP6/_shared_shingles,/}

export SPARK_LOCAL_DIRS=/tmp/spark-local-r10
SKIP=$(comp "$TARGETS")

for SF in sf1 sf10; do
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  SPARK_GRAFT_SF_DIR=/root/repo/.scale/$SF SPARK_DRIVER_MEMORY=96g \
    SPARK_GRAFT_BENCH_FORCE_CHECKSUM=1 \
    SPARK_GRAFT_BENCH_SKIP=$SKIP \
    SPARK_GRAFT_BENCH_SKIP_SETUP=$SETUP6 \
    python bench.py > bench_${SF}_r10b.raw 2> bench_${SF}_r10b.err
  echo "$SF part-4 exit $?"
  grep '"metric"' bench_${SF}_r10b.raw | head -1 > bench_${SF}_r10b.json || true
done

rm -rf "$SPARK_LOCAL_DIRS"
echo CAMPAIGN_R10D_DONE
