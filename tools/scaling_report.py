"""Generate SCALING_MEASURED.md from two bench records (sf0.1 and 10x).

Usage:
    python tools/scaling_report.py bench_sf01_r5.json bench_sf1_r5.json

Compares per-query WARM medians and COLD first-runs across one measured
decade of scale and classifies each query's growth.  Warm medians at
fixture scale are dominated by fixed per-job overhead (~20-80 ms of
scheduler/collect latency) for most queries, so the classification keys on
the larger of the two costs and uses an absolute-time floor: a query that
takes 40 ms at both scales is "overhead-bound" (the fixture cannot measure
its growth), not "perfectly scaling".

Classification (r = t_10x / t_1x):
- overhead_bound: t_10x < 0.25 s — per-job overhead swamps data cost at
  BOTH scales; growth unmeasurable at fixture size (plan gates carry the
  scale argument for these).
- sublinear:      r <= 3        — grows slower than the data.
- linear:         3 < r <= 13   — tracks the 10x data growth (+30% noise).
- superlinear:    r > 13        — FLAGGED; investigate or explain.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        line = next(l for l in f if l.strip())
    return json.loads(line)


def classify(t1: float, t10: float) -> str:
    if t10 < 0.25:
        return "overhead_bound"
    r = t10 / max(t1, 1e-9)
    if r <= 3:
        return "sublinear"
    if r <= 13:
        return "linear"
    return "superlinear"


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    d1, d10 = load(a), load(b)
    shared = sorted(set(d1["queries"]) & set(d10["queries"]))
    rows = []
    for q in shared:
        w1, w10 = d1["queries"][q], d10["queries"][q]
        c1, c10 = d1["cold_queries"][q], d10["cold_queries"][q]
        rows.append((q, w1, w10, c1, c10, classify(w1, w10)))

    counts: dict[str, int] = {}
    for r in rows:
        counts[r[5]] = counts.get(r[5], 0) + 1

    print(f"sf0.1: warm {d1['value']}s cold {d1['cold_total_sec']}s"
          f" setup {d1['setup_sec']}s ({len(d1['queries'])} queries)")
    print(f"10x  : warm {d10['value']}s cold {d10['cold_total_sec']}s"
          f" setup {d10['setup_sec']}s ({len(d10['queries'])} queries)")
    print("classes:", counts)
    print()
    flagged = [r for r in rows if r[5] == "superlinear"]
    print("superlinear:", [r[0] for r in flagged])
    for r in sorted(rows, key=lambda r: -(r[2])):
        q, w1, w10, c1, c10, cls = r
        print(f"{q}: warm {w1:.3f} -> {w10:.3f} ({w10/max(w1,1e-9):.1f}x)"
              f" cold {c1:.2f} -> {c10:.2f} [{cls}]")


if __name__ == "__main__":
    main()
