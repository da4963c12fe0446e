"""Oracle-verify the SRP adaptive band width PAST the old 15-bit cap.

Round-10 context: VERDICT r9 #1 — `_SRPW_MAX_BB = 15` (so 4 bands packed
one BIGINT) froze the adaptive width at n ~ 524k and sent candidate mass
quadratic at the 1000x fixture (55.6x/decade).  The fix band-slices the
signatures (each band packs its own plane block) and raises the cap to 40.

The standard gates can't see the fix: the driver fixtures derive bits
5/7 and the 1000x replica slice re-derives bits from the SLICE's count
(7 again).  This probe builds an embeddings-ONLY mid fixture — 300
key-offset replicas of sf0.1's 2,000 vectors = 600k rows, bit_length(600k)
= 20 -> bits = 16, one past the old cap — and runs BOTH engines' full
pipelines on it: Spark `dedup_embedding_srp` / `mutual_knn_pairs` vs their
DuckDB oracles, compared with driver-comparator semantics.  A pass means
candidates AND ranks are bit-exact in the exact region the old cap
corrupted performance in, with the width derived independently by each
engine from COUNT(*).

Usage:  python tools/srp_uncapped_probe.py [--out /tmp/srp_mid] [--copies 300]
Prints one JSON line {"metric": "srp_uncapped_probe", ...}; exit 1 on any
mismatch.
"""

from __future__ import annotations

import argparse
import importlib.util as _ilu
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tests"))

_spec = _ilu.spec_from_file_location(
    "make_scaled_fixture", os.path.join(_HERE, "make_scaled_fixture.py")
)
_msf = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_msf)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/srp_mid")
    ap.add_argument("--copies", type=int, default=300)
    ap.add_argument("--queries", nargs="*",
                    default=["dedup_embedding_srp", "mutual_knn_pairs"])
    args = ap.parse_args()

    from vector_search_spark import registry
    from vector_search_spark.registry_extensions import _srpw_band_bits
    from vector_search_spark.session import get_spark

    spark = get_spark()
    # the oracle helper registers views for every fixture table; only
    # embeddings is scaled — the rest link to the base (queries under
    # probe read embeddings alone)
    os.makedirs(args.out, exist_ok=True)
    for t in ("region nation customer supplier part orders lineitem "
              "events documents").split():
        lnk = os.path.join(args.out, f"{t}.parquet")
        if not os.path.exists(lnk):
            os.symlink(os.path.join(args.base, f"{t}.parquet"), lnk)
    emb_path = os.path.join(args.out, "embeddings.parquet")
    if not os.path.exists(emb_path):
        base = spark.read.parquet(f"{args.base}/embeddings.parquet")
        from functools import reduce

        parts = [
            _msf.replicate(base, "embeddings", r, copies=args.copies)
            for r in range(args.copies)
        ]
        reduce(lambda a, b: a.unionByName(b), parts).repartition(32).write.mode(
            "overwrite"
        ).parquet(emb_path)
    n = spark.read.parquet(emb_path).count()
    bits = _srpw_band_bits(n)
    assert bits > 15, f"probe must exercise the uncapped region, got bits={bits}"

    from conftest import compare_with_oracle  # driver-comparator semantics

    out: dict = {
        "metric": "srp_uncapped_probe", "n": n, "bits": bits, "queries": {},
    }
    bad = 0
    for name in args.queries:
        t0 = time.time()
        try:
            df = registry.QUERIES[name](spark, args.out)
            compare_with_oracle(df, registry.ORACLES[name], args.out)
            out["queries"][name] = {
                "match": True, "sec": round(time.time() - t0, 1),
            }
            print(f"# {name}: MATCH ({time.time()-t0:.1f}s)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — record and flag
            bad += 1
            out["queries"][name] = {"error": str(e)[:400]}
            print(f"# {name}: FAIL {e}", file=sys.stderr)
    out["n_bad"] = bad
    print(json.dumps(out))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
