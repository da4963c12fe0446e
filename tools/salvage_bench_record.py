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


if __name__ == "__main__":
    main()
