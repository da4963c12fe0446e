"""Demonstrate the SRP adaptive-width STAIR-STEP, not-a-trend claim.

SCALING_MEASURED r10 classifies `dedup_embedding_srp`'s 16.7x at
100x->1000x as integer-width oscillation: collision mass n*2^-bits
cycles through [8, 16) per band as bit_length(n) crosses decades.  The
falsifiable prediction: at n = 2.2M — only 10% MORE data than the 1000x
fixture's 2.0M — bit_length crosses 2^21, bits steps 17 -> 18, mass
halves (15.3 -> 8.4), and the query gets substantially FASTER.  A trend
cannot do that; a stair-step must.

Each point runs in a FRESH Spark session: build the srpw index (setup),
then one cold collect of the full query.  Spark-side timing only (the
DuckDB oracle at these sizes is covered by tools/srp_uncapped_probe.py
at 600k; bit-exactness is not in question here — wall time is).

Usage: python tools/srp_stairstep_probe.py [--skip-build]
Writes one JSON line per point to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
BASE = "/root/testdata/sf0.1"

POINTS = [
    ("srp_step_2000k", 1000),   # the 1000x fixture size: bits 17, mass 15.3
    ("srp_step_2200k", 1100),   # 10% more: bits 18, mass 8.4
]


def build_fixture(out: str, copies: int) -> None:
    """Embeddings-only key-offset replication (make_scaled_fixture's
    transform) + symlinks for the other tables (unused by the query)."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "make_scaled_fixture", os.path.join(_HERE, "make_scaled_fixture.py"))
    msf = _ilu.module_from_spec(spec)
    spec.loader.exec_module(msf)
    sys.path.insert(0, REPO)
    from functools import reduce

    from vector_search_spark.session import get_spark

    spark = get_spark("srp_step_build")
    os.makedirs(out, exist_ok=True)
    for t in ("region nation customer supplier part orders lineitem "
              "events documents").split():
        lnk = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(lnk):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), lnk)
    dst = os.path.join(out, "embeddings.parquet")
    if os.path.exists(dst):
        return
    base = spark.read.parquet(f"{BASE}/embeddings.parquet")
    parts = [msf.replicate(base, "embeddings", r, copies=copies)
             for r in range(copies)]
    reduce(lambda a, b: a.unionByName(b), parts).repartition(64).write.mode(
        "overwrite").parquet(dst)


def time_point(sf_dir: str) -> dict:
    """Run in a clean subprocess: setup (index build) + cold collect."""
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
from vector_search_spark.session import get_spark
from vector_search_spark import registry
from vector_search_spark.registry_extensions import _shared_srpw_index, _srpw_band_bits
spark = get_spark("srp_step")
n = spark.read.parquet({sf_dir!r} + "/embeddings.parquet").count()
t0 = time.perf_counter()
_shared_srpw_index(spark, {sf_dir!r})
setup = time.perf_counter() - t0
t0 = time.perf_counter()
rows = registry.QUERIES["dedup_embedding_srp"](spark, {sf_dir!r}).collect()
cold = time.perf_counter() - t0
bits = _srpw_band_bits(n)
print(json.dumps({{"n": n, "bits": bits, "mass": round(n * 2**-bits, 1),
                  "setup_sec": round(setup, 1), "cold_sec": round(cold, 1),
                  "rows": len(rows)}}))
"""
    env = dict(os.environ, SPARK_DRIVER_MEMORY="96g",
               SPARK_LOCAL_DIRS="/tmp/spark-local-srpstep")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, cwd=REPO)
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(r.stderr[-2000:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()
    out = {"metric": "srp_stairstep_probe", "points": []}
    for name, copies in POINTS:
        d = os.path.join(REPO, ".scale", name)
        if not args.skip_build:
            build_fixture(d, copies)
        pt = time_point(d)
        pt["fixture"] = name
        out["points"].append(pt)
        print(f"# {name}: {pt}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
