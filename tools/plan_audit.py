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
- single-partition Sort/Window over an UNREDUCED scan: a global
  sort/window collapsed to one task.  Round-7 lesson: in formatted AQE
  plans the exchange operator and its `Arguments: SinglePartition` are
  on SEPARATE lines, so the old `"Exchange SinglePartition"` substring
  never matched anything — the gate was silently a no-op while the
  conformal pair shipped a one-task sort of the O(corpus) calibration
  slice (measured 15↔148 s spill roulette at 100×).  The structural
  check now parses the plan tree: an Exchange whose Arguments say
  SinglePartition feeding a Sort/Window is a FLAG when a raw
  `Scan parquet` is reachable below it without crossing an
  aggregate/limit (unreduced corpus through one task), and a WARN
  (non-fatal, printed) when the subtree bottoms out in a checkpointed
  `Scan ExistingRDD` whose cardinality the plan can't prove — callers
  must be able to justify those as provably bounded frames (day
  tables, vocab top-K, per-partition totals).
- zero WholeStageCodegen markers: the hot path fell off codegen.

Exit code 1 if any query trips a flag, so this can run as a gate.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_AGG_NODES = (
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "TakeOrderedAndProject", "CollectLimit", "GlobalLimit", "LocalLimit",
)

# Queries PERMITTED a sp_window_over_checkpoint WARN (VERDICT r8 #2: the
# WARN class depends on which AQE plan shape materializes — a checkpointed
# frame AQE already coalesced to one partition needs no SinglePartition
# exchange and prints nothing — so the observed set drifts run to run and
# "justified" was being re-asserted by hand).  This is the closed class:
# every entry is a partition-less window over a CHECKPOINTED aggregate
# whose cardinality is bounded by a fixed domain, with the bound stated.
# name -> (max warns, one-line boundedness justification).  A WARN on any
# query NOT listed here (or above its cap) is a FLAG and exits 1.
SP_WARN_ALLOWLIST: dict[str, tuple[int, str]] = {
    "conformal_group_coverage": (2, "prefix table bounded by conformal grid x group count"),
    "cramer_von_mises_test": (2, "value-cent histogram cells, bounded by the value domain"),
    "isotonic_hour_calibration": (2, "PAVA grid over 24 hour-of-day cells"),
    "runs_test_daily": (2, "lag over the per-day table, O(days)"),
    "synthetic_value_sampler": (2, "CDF over SYNTH_BUCKETS histogram cells"),
    # statically same-class (window over checkpointed bounded aggregate);
    # AQE usually pre-collapses these so no WARN prints, but the shape
    # can flip:
    "ab_group_sequential": (2, "per-look boundary table, O(looks)"),
    "heaps_law_curve": (2, "cumulative over 10 decile cells"),
}


def sp_sort_audit(p: str) -> tuple[int, int]:
    """(flags, warns) for single-partition Sort/Window exchanges.

    Parses the formatted plan: tree section gives structure (parent =
    nearest shallower line), detail section gives per-id Arguments.  An
    Exchange with SinglePartition arguments feeding Sort/Window is
    flagged when a raw parquet scan is reachable in its subtree without
    crossing an aggregate/limit, warned when the subtree bottoms out in
    a checkpointed ExistingRDD of unprovable cardinality.
    """
    import re

    nodes = []  # (idx, depth, name, id)
    for ln in p.splitlines():
        if ln.lstrip().startswith("("):
            continue  # detail section
        m = re.search(r"([A-Za-z][\w .]*?) \((\d+)\)\s*$", ln)
        if m:
            # Depth = column where the node name starts, MINUS the
            # whole-stage-codegen '* ' marker (ADVICE r7): a starred
            # sibling printed after an Exchange at the same tree level
            # would otherwise read 2 columns deeper and be swept into the
            # Exchange's subtree — a raw scan in a sibling join branch
            # falsely attributed to the single-partition exchange.
            depth = m.start(1)
            if ln[max(0, depth - 2):depth] == "* ":
                depth -= 2
            nodes.append((len(nodes), depth, m.group(1).strip(), m.group(2)))
    args: dict[str, str] = {}
    cur = None
    for ln in p.splitlines():
        s = ln.strip()
        m = re.match(r"\((\d+)\) ([A-Za-z][\w .]*)", s)
        if m:
            cur = m.group(1)
        elif cur and s.startswith("Arguments:"):
            args.setdefault(cur, s)
    flags = warns = 0
    for i, (idx, depth, name, nid) in enumerate(nodes):
        if not name.startswith("Exchange"):
            continue
        if "SinglePartition" not in args.get(nid, ""):
            continue
        # parent: nearest preceding node with smaller depth
        parent = next(
            (n for n in reversed(nodes[:i]) if n[1] < depth), None
        )
        # exact node names (ADVICE r7: startswith("Sort") also matched
        # SortMergeJoin/SortAggregate — neither collapses to one task)
        if parent is None or parent[2] not in (
            "Sort", "Window", "WindowInPandas", "WindowGroupLimit"
        ):
            continue
        # subtree: following nodes with greater depth, until depth <= ours
        raw_scan = unknown_rdd = False
        stack_ok_depths: list[int] = []  # depths below an agg/limit node
        for jdx, jdepth, jname, _ in nodes[i + 1:]:
            if jdepth <= depth:
                break
            while stack_ok_depths and jdepth <= stack_ok_depths[-1]:
                stack_ok_depths.pop()
            reduced = bool(stack_ok_depths)
            if any(jname.startswith(a) for a in _AGG_NODES):
                stack_ok_depths.append(jdepth)
            elif not reduced and jname.startswith("Scan parquet"):
                raw_scan = True
            elif not reduced and "ExistingRDD" in jname:
                unknown_rdd = True
        if raw_scan:
            flags += 1
        elif unknown_rdd:
            warns += 1
    return flags, warns


def audit_plan(p: str) -> tuple[list[str], int, int]:
    """(flags, sp_warns, scans) for one formatted plan — the per-query
    rule set, extracted so tests/test_plan_audit_selftest.py can feed it
    deliberately BAD plans and assert it flags (the single-partition gate
    was a silent no-op for four rounds; a gate nobody negative-controls
    is a gate that may not exist)."""
    import re as _re

    scans = p.count("Scan parquet")
    inmem = p.count("InMemoryTableScan") + p.count("InMemoryRelation")
    cart = p.count("CartesianProduct")
    single, sp_warns = sp_sort_audit(p)
    # per-TABLE scan multiplicity: a 7-table join legitimately reads 7
    # different tables once each; the replay smell is the SAME table
    # scanned repeatedly
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
        flags.append(f"single_partition_sort={single}")
    return flags, sp_warns, scans


def warn_gate(name: str, sp_warns: int) -> list[str]:
    """Allowlist enforcement: a sp_window_over_checkpoint WARN on a query
    not in SP_WARN_ALLOWLIST (or above its cap) escalates to a FLAG."""
    if not sp_warns:
        return []
    cap = SP_WARN_ALLOWLIST.get(name, (0, ""))[0]
    if sp_warns > cap:
        return [f"sp_warn_not_allowlisted={sp_warns}>{cap}"]
    return []


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


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
            p = formatted_plan(registry.QUERIES[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD ERROR {str(e)[:120]}")
            bad += 1
            continue
        flags, sp_warns, scans = audit_plan(p)
        flags = flags + warn_gate(name, sp_warns)
        if flags:
            bad += 1
            print(f"{name}: FLAG {' '.join(flags)}")
        elif sp_warns:
            cap, why = SP_WARN_ALLOWLIST[name]
            print(
                f"{name}: ok (scans={scans}) WARN sp_window_over_checkpoint="
                f"{sp_warns} (allowlisted: {why})"
            )
        else:
            print(f"{name}: ok (scans={scans})")
    print(f"# flagged: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
