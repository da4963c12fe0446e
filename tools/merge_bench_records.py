"""Overlay per-query entries of a dedicated-session record onto a fuller
base record (the r10/r11 pattern: full-registry decade records keep their
unchanged queries; queries re-measured in dedicated sessions this round
overwrite their entries).  Setup builders present in the overlay replace
the base entry; totals are recomputed from the merged maps.

Usage: python tools/merge_bench_records.py <base.json> <overlay.json> <out.json>
"""

import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no record in {path}")


def main():
    base, over, out = sys.argv[1], sys.argv[2], sys.argv[3]
    b, o = load(base), load(over)
    merged_from = {"base": base, "overlay": over,
                   "overlay_queries": sorted(o["queries"])}
    for key in ("queries", "cold_queries", "build_queries", "setup_builders"):
        if key in o:
            b.setdefault(key, {}).update(o[key])
    b["value"] = round(sum(b["queries"].values()), 3)
    b["cold_total_sec"] = round(sum(b.get("cold_queries", {}).values()), 3)
    b["build_total_sec"] = round(sum(b.get("build_queries", {}).values()), 3)
    b["setup_sec"] = round(sum(b.get("setup_builders", {}).values()), 3)
    # the merged record must not claim reps/semantics beyond its weakest part
    if b.get("reps") != o.get("reps"):
        b["reps_mixed"] = {"base": b.get("reps"), "overlay": o.get("reps")}
    b["merged_from"] = merged_from
    # skipped list no longer reflects the merged content
    b.pop("skipped", None)
    with open(out, "w") as f:
        f.write(json.dumps(b) + "\n")
    print(f"merged {len(merged_from['overlay_queries'])} overlay queries -> {out}")


if __name__ == "__main__":
    main()
