"""Plan auditor: mechanical red-flag scan over every registry query's
physical plan.

Usage:
    python tools/plan_audit.py [sf_dir] [name-substring ...]

For each registry query this prints the formatted-plan red-flag counters
the per-operator reviews check by hand — so the audit that found the SES
10×-scan lineage replay and the bagging post-Generate recompute is a
rerunnable tool, not a one-off.  Flags:

- parquet_scans > 3: a fan-out aggregate is probably lineage-replaying
  its corpus scan per consumer (fix: eager localCheckpoint the small
  aggregate; 0 scans usually means checkpoints own the scan).
- CartesianProduct: only scalar/1-row broadcasts are sanctioned.
- Exchange SinglePartition: a global sort/window collapsed to one task.
- zero WholeStageCodegen markers: the hot path fell off codegen.

Exit code 1 if any query trips a flag, so this can run as a gate.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    subs = sys.argv[2:]
    from vector_search_spark import registry
    from vector_search_spark.session import get_spark

    spark = get_spark("plan-audit", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name in sorted(registry.QUERIES):
        if subs and not any(s in name for s in subs):
            continue
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            p = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD ERROR {str(e)[:120]}")
            bad += 1
            continue
        scans = p.count("Scan parquet")
        inmem = p.count("InMemoryTableScan") + p.count("InMemoryRelation")
        cart = p.count("CartesianProduct")
        single = p.count("Exchange SinglePartition")
        # per-TABLE scan multiplicity: a 7-table join legitimately reads 7
        # different tables once each; the replay smell is the SAME table
        # scanned repeatedly
        import re as _re

        tables = _re.findall(r"Location:.*?/(\w+)\.parquet", p)
        per_table = {}
        for t in tables:
            per_table[t] = per_table.get(t, 0) + 1
        worst = max(per_table.values(), default=0)
        worst_t = max(per_table, key=per_table.get) if per_table else ""
        flags = []
        # persisted session-shared indexes print their full lineage under
        # InMemoryRelation but serve from cache at runtime — only flag
        # scan multiplicity when no cache is involved
        if worst > 3 and inmem == 0:
            flags.append(f"scans={scans} worst={worst_t}x{worst}")
        if cart:
            flags.append(f"cartesian={cart}")
        if single:
            flags.append(f"single_partition={single}")
        if flags:
            bad += 1
            print(f"{name}: FLAG {' '.join(flags)}")
        else:
            print(f"{name}: ok (scans={scans})")
    print(f"# flagged: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
