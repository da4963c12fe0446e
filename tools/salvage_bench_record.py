"""Reconstruct a (possibly partial) bench record from bench.py's stderr
stream — insurance for exploratory scale runs that outlive their time
budget: the per-query `# name: 0.123s warm-median / 4.567s cold ...`
lines ARE the data; this turns whatever accumulated into the same JSON
shape bench.py writes, marked {"partial": true} when the run was cut.

Usage: python tools/salvage_bench_record.py <stderr_file> <sf> [out.json]
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    err, sf = sys.argv[1], float(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else None
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    skipped: list[str] = []
    setup_sec = None
    pat = re.compile(
        r"# ([a-z0-9_]+): ([0-9.]+)s warm-median / ([0-9.]+)s cold"
    )
    with open(err, errors="replace") as f:
        text = f.read().replace("\r", "\n")
    for ln in text.splitlines():
        m = pat.match(ln.strip())
        if m:
            timings[m.group(1)] = float(m.group(2))
            cold[m.group(1)] = float(m.group(3))
            continue
        m = re.match(r"# ([a-z0-9_]+): SKIPPED", ln.strip())
        if m:
            skipped.append(m.group(1))
        m = re.match(r"# setup .*: ([0-9.]+)s", ln.strip())
        if m:
            setup_sec = float(m.group(1))
    rec = {
        "metric": "registry_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "setup_sec": setup_sec,
        "cold_total_sec": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "sf": sf,
        "partial": True,
        "skipped": sorted(set(skipped)),
        "salvaged_from": err,
        "n_queries": len(timings),
    }
    line = json.dumps(rec)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    print(line[:2000])


def merge(paths: list[str], out: str, sf: float) -> dict:
    """Merge tranche records (dicts with queries/cold_queries) into one;
    later tranches win on name collisions.  setup_sec reports the FIRST
    tranche's (each tranche re-pays it; summing would double-count)."""
    merged = {"queries": {}, "cold_queries": {}, "skipped": set(), "errors": {}}
    setup = None
    tranches = []
    for p in paths:
        with open(p) as f:
            rec = json.loads(f.readline())
        tranches.append({"path": p, "n": len(rec.get("queries", {})),
                         "setup_sec": rec.get("setup_sec")})
        merged["queries"].update(rec.get("queries", {}))
        merged["cold_queries"].update(rec.get("cold_queries", {}))
        merged["errors"].update(rec.get("errors", {}))
        merged["skipped"].update(rec.get("skipped", []))
        if setup is None:
            setup = rec.get("setup_sec")
    merged["skipped"] = sorted(merged["skipped"] - set(merged["queries"]))
    rec = {
        "metric": "registry_queries_total_sec",
        "value": round(sum(merged["queries"].values()), 3),
        "unit": "sec",
        "queries": merged["queries"],
        "setup_sec": setup,
        "cold_total_sec": round(sum(merged["cold_queries"].values()), 3),
        "cold_queries": merged["cold_queries"],
        "sf": sf,
        "merged_tranches": tranches,
        "skipped": merged["skipped"],
        "n_queries": len(merged["queries"]),
    }
    if merged["errors"]:
        rec["errors"] = merged["errors"]
    with open(out, "w") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


if __name__ == "__main__":
    main()
