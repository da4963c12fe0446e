"""Fourth-decade probe for the TEXT-DEDUP family — 20M documents,
table-reduced (VERDICT r10 next-round #2, second half: extend the
reduced-table probe idea beyond embeddings).

A full 10000x fixture (~150 GB) cannot fit this box, but the text-dedup
queries read ONLY the documents table, so their fourth decade is
probeable with a documents-only fixture: 4,000 affine-cipher replicas of
sf0.1's 5,000 docs = 20M documents / ~1B shingle rows (4x the 1000x
fixture's 5M docs; decade midpoint).  Every other table symlinks to the
sf0.1 base so the registry's loaders resolve.

Times, in one fresh 96 GB session (cold = build + first collect, the
campaign semantics): the shared shingle/signature/candidate/simhash
builders and `dedup_exact`, `dedup_minhash_lsh`, `dedup_simhash`.

Fixture-health check, mirroring ann_decade4_probe's candidate-mass test:
LSH banded candidates on a cipher-replicated corpus should be almost
exactly `copies x candidates(base)` — the per-replica letter bijections
preserve every within-replica shingle relation and destroy cross-replica
overlap, so any excess over the prediction measures planted cross-replica
twins (a fixture artifact), not engine behavior.

Usage: python tools/text_decade4_probe.py [--out .scale/doc20m] [--copies 4000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import importlib.util as _ilu
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
BASE = "/root/testdata/sf0.1"

_spec = _ilu.spec_from_file_location(
    "make_scaled_fixture", os.path.join(_HERE, "make_scaled_fixture.py"))
_msf = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_msf)


def build_fixture(spark, out: str, copies: int, batch: int = 100) -> None:
    """Documents-only replication, written in append batches so the plan
    never unions thousands of children at once."""
    from functools import reduce

    os.makedirs(out, exist_ok=True)
    for t in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        lnk = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(lnk):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), lnk)
    dst = os.path.join(out, "documents.parquet")
    if os.path.exists(dst):
        return
    # cipher-distinctness guard, as in make_scaled_fixture.main()
    letter_maps = {_msf._caesar_cols(r)[1][:52] for r in range(copies)}
    assert len(letter_maps) == copies, "letter ciphers collide"
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    for lo in range(0, copies, batch):
        parts = [_msf.replicate(base, "documents", r, copies=copies)
                 for r in range(lo, min(lo + batch, copies))]
        reduce(lambda a, b: a.unionByName(b), parts).coalesce(8).write.mode(
            "append").parquet(dst + ".tmp")
        print(f"# replicas {lo}..{min(lo + batch, copies) - 1} written",
              file=sys.stderr)
    os.rename(dst + ".tmp", dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, ".scale", "doc20m"))
    ap.add_argument("--copies", type=int, default=4000)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import pyspark.sql.functions as F

    from vector_search_spark import registry
    from vector_search_spark.registry_dedup import (
        _shared_lsh_candidates, _shared_shingles, _shared_signatures,
        _shared_simhash_sigs,
    )
    from vector_search_spark.session import get_spark

    spark = get_spark("text_decade4")
    t0 = time.perf_counter()
    build_fixture(spark, args.out, args.copies)
    n = spark.read.parquet(f"{args.out}/documents.parquet").count()
    out = {"metric": "text_decade4_probe", "n_docs": n,
           "fixture_sec": round(time.perf_counter() - t0, 1),
           "setup_builders": {}, "queries": {}}

    for bname, fn in (
        ("shingles", _shared_shingles),
        ("signatures", _shared_signatures),
        ("lsh_candidates", _shared_lsh_candidates),
        ("simhash_sigs", _shared_simhash_sigs),
    ):
        t0 = time.perf_counter()
        fn(spark, args.out).count()
        out["setup_builders"][bname] = round(time.perf_counter() - t0, 1)
        print(f"# builder {bname}: {out['setup_builders'][bname]}s",
              file=sys.stderr)

    # Fixture-health: candidates should be copies x base candidates.
    t0 = time.perf_counter()
    cand_n = _shared_lsh_candidates(spark, args.out).count()
    base_cand_n = _shared_lsh_candidates(spark, BASE).count()
    pred = args.copies * base_cand_n
    out["candidate_mass"] = {
        "measured": int(cand_n), "predicted": int(pred),
        "excess_pct": round(100.0 * (cand_n - pred) / pred, 1) if pred else None,
        "check_sec": round(time.perf_counter() - t0, 1),
    }
    print(f"# candidate mass: {out['candidate_mass']}", file=sys.stderr)

    for name in ("dedup_exact", "dedup_minhash_lsh", "dedup_simhash"):
        t0 = time.perf_counter()
        try:
            rows = registry.QUERIES[name](spark, args.out).collect()
            out["queries"][name] = {
                "cold_sec": round(time.perf_counter() - t0, 1),
                "rows": len(rows),
            }
        except Exception as e:  # noqa: BLE001
            out["queries"][name] = {"error": str(e)[:300]}
        print(f"# {name}: {out['queries'][name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
