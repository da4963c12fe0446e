"""Compare two bench records one decade apart and classify per-query growth.

Usage:
    python tools/decade_compare.py <lower_record.json> <upper_record.json>

Same classification thresholds as tools/scaling_report.py (r ≤ 3 sublinear,
3–13 linear for a 10× decade, >13 superlinear, <0.25 s at the upper scale =
overhead-bound), but takes ANY two records (e.g. the r5 10× record vs the
r6 100× record) and tolerates query-set drift between rounds — queries
present in only one record are listed, not compared.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no JSON record in {path}")


def main() -> None:
    # --cold classifies first-collect times instead of warm medians.  With
    # checksum consumption + Spark's cross-collect shuffle-stage skipping
    # (the DAGScheduler reuses map outputs of the SAME DataFrame's RDD DAG,
    # so re-collects only run the final stage), warm medians are
    # last-stage-only and overhead-bound almost everywhere — the decade
    # growth signal lives in the cold pass, which runs every stage.
    args = [a for a in sys.argv[1:] if a != "--cold"]
    key = "cold_queries" if "--cold" in sys.argv else "queries"
    lo, hi = load(args[0]), load(args[1])
    for path, rec in ((args[0], lo), (args[1], hi)):
        if key not in rec:
            raise SystemExit(
                f"record {path} has no '{key}' section "
                f"(pre-round-7 records and salvaged partials lack cold_queries; "
                f"available keys: {sorted(rec)[:12]})"
            )
    if key == "cold_queries":
        # ADVICE r9: cold semantics changed at r9 (2 = build+first-collect,
        # stamped from r10 on; r9 records lack the stamp but carry
        # build_queries — added the same round — so they are inferable;
        # anything older is 1 = collect-only).  A mixed pair silently
        # skews decade ratios — refuse it.
        sem = [
            rec.get("cold_semantics", 2 if "build_queries" in rec else 1)
            for rec in (lo, hi)
        ]
        if sem[0] != sem[1]:
            raise SystemExit(
                f"cold_semantics mismatch: {args[0]}={sem[0]} vs "
                f"{args[1]}={sem[1]} — re-bench one side or compare warm"
            )
    lq, hq = lo[key], hi[key]
    both = sorted(set(lq) & set(hq))
    only_lo = sorted(set(lq) - set(hq))
    only_hi = sorted(set(hq) - set(lq))
    classes: dict[str, list] = {
        "overhead_bound": [], "sublinear": [], "linear": [], "superlinear": []
    }
    for n in both:
        t_lo, t_hi = lq[n], hq[n]
        if t_hi < 0.25:
            classes["overhead_bound"].append(n)
            continue
        r = t_hi / max(t_lo, 1e-9)
        if r <= 3:
            classes["sublinear"].append((n, t_lo, t_hi, round(r, 1)))
        elif r <= 13:
            classes["linear"].append((n, t_lo, t_hi, round(r, 1)))
        else:
            classes["superlinear"].append((n, t_lo, t_hi, round(r, 1)))
    print(f"lower: {args[0]} sf={lo.get('sf')} n={len(lq)} "
          f"warm={lo.get('value')} setup={lo.get('setup_sec')} "
          f"cold={lo.get('cold_total_sec')}")
    print(f"upper: {args[1]} sf={hi.get('sf')} n={len(hq)} "
          f"warm={hi.get('value')} setup={hi.get('setup_sec')} "
          f"cold={hi.get('cold_total_sec')}")
    print(f"compared={len(both)} only_lower={len(only_lo)} only_upper={len(only_hi)}")
    for k in ("overhead_bound", "sublinear", "linear", "superlinear"):
        print(f"\n{k}: {len(classes[k])}")
        if k != "overhead_bound":
            for row in sorted(classes[k], key=lambda t: -t[3]):
                print("  %-40s %8.3f -> %8.3f  (%sx)" % row)
    if hi.get("errors"):
        print("\nupper-record errors:")
        for n, e in hi["errors"].items():
            print(f"  {n}: {e[:120]}")


if __name__ == "__main__":
    main()
