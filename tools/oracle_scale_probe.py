"""Time every DuckDB oracle against a scaled fixture — the feasibility
side of the scale story.  The Spark engine is the product; the DuckDB
oracle is the CORRECTNESS HARNESS, and HANDOFF-r6 predicted oracle
runtime becomes a binding constant around 1000×.  This probe measures
it instead of guessing: each oracle runs in its own subprocess with a
hard timeout, so a quadratic oracle can't wedge the sweep.

Usage:
    python tools/oracle_scale_probe.py <sf_dir> <tag> [--timeout 120] \
        [--jobs 4] [--only name ...]

Prints one JSON line:
    {"metric": "oracle_scale_probe", "tag", "sf_dir", "timeout_sec",
     "oracles": {name: {"sec": s, "rows": n} | {"error": "..."} |
                 {"timeout": true}}}

Directory-parquet fixtures (the .scale builds) are registered as
'<dir>/<t>.parquet/*.parquet' globs; flat files as-is.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _view_sql(sf_dir: str, t: str) -> str:
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    return f"CREATE VIEW {t} AS SELECT * FROM '{src}'"


def _run_one(sf_dir: str, name: str, sql: str, threads: int, q: "mp.Queue") -> None:
    import duckdb

    con = duckdb.connect()
    if threads:
        con.execute(f"PRAGMA threads={threads}")
    for t in TABLES:
        con.execute(_view_sql(sf_dir, t))
    t0 = time.perf_counter()
    try:
        rows = con.execute(sql).fetchall()
        q.put({"sec": round(time.perf_counter() - t0, 3), "rows": len(rows)})
    except Exception as e:  # noqa: BLE001 - recorded, not raised
        q.put({"error": f"{type(e).__name__}: {e}"[:200]})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("tag")
    ap.add_argument("--timeout", type=float, default=120.0)
    ap.add_argument("--threads", type=int, default=0,
                    help="PRAGMA threads per oracle (0 = DuckDB default)")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from vector_search_spark import registry

    names = args.only or sorted(registry.ORACLES)
    rec = {
        "metric": "oracle_scale_probe",
        "tag": args.tag,
        "sf_dir": args.sf_dir,
        "timeout_sec": args.timeout,
        "threads": args.threads,
        "oracles": {},
    }
    ctx = mp.get_context("fork")
    for name in names:
        sql = registry.ORACLES.get(name)
        if sql is None:
            rec["oracles"][name] = {"error": "no oracle (rows-only query)"}
            continue
        q: mp.Queue = ctx.Queue()
        p = ctx.Process(target=_run_one,
                        args=(args.sf_dir, name, sql, args.threads, q))
        p.start()
        # Drain the queue BEFORE joining (ADVICE r7): a child whose queued
        # result exceeds the pipe buffer blocks in the queue feeder thread
        # and can never exit, so join-then-get_nowait records a FALSE
        # timeout for an oracle that actually finished.
        import queue as _queue

        deadline = time.perf_counter() + args.timeout
        res = None
        while res is None:
            try:
                res = q.get(timeout=min(1.0, max(0.05, deadline - time.perf_counter())))
            except _queue.Empty:
                if time.perf_counter() >= deadline:
                    res = {"timeout": True}
                elif not p.is_alive():
                    # one last non-blocking drain: the child may exit
                    # between a successful put and this liveness check
                    try:
                        res = q.get_nowait()
                    except _queue.Empty:
                        res = {"error": f"died rc={p.exitcode}"}
        if p.is_alive():
            p.terminate()
        p.join()
        rec["oracles"][name] = res
        sys.stderr.write(f"{name}: {rec['oracles'][name]}\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
