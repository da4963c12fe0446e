"""Negative controls for the plan auditor (VERDICT r7 "what's wrong" #2).

Round 7 discovered the auditor's "Exchange SinglePartition" gate had NEVER
fired: formatted plans split the operator and its Arguments across lines,
so the substring match was a silent no-op for four "exit 0" rounds while
the conformal pair shipped a one-task sort of the O(corpus) calibration
slice.  The structural gate is fixed — this suite pins the auditor ITSELF:
feed it deliberately bad plans and assert each FLAGS, feed it known-good
shapes and assert each passes.  A gate without a negative control is a
gate that may not exist.
"""

from __future__ import annotations

import importlib.util as _ilu
import os as _os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_TEST

_spec = _ilu.spec_from_file_location(
    "plan_audit",
    _os.path.join(_os.path.dirname(__file__), "..", "tools", "plan_audit.py"),
)
_pa = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_pa)


def _docs(spark):
    return spark.read.parquet(f"{SF_TEST}/documents.parquet")


# ---------------------------------------------------------------------------
# Bad plans: each must FLAG.
# ---------------------------------------------------------------------------
def test_flags_partitionless_window_over_raw_scan(spark):
    # The conformal-pair bug class: a partition-less Window.orderBy over an
    # unreduced corpus scan — the whole table through ONE task.
    df = _docs(spark).withColumn(
        "rk", F.row_number().over(Window.orderBy("doc_id"))
    )
    flags, _warns, _scans = _pa.audit_plan(_pa.formatted_plan(df))
    assert any("single_partition_sort" in f for f in flags), flags


def test_warns_partitionless_window_over_checkpoint(spark):
    # The WARN path: a partition-less window over a checkpointed
    # ExistingRDD whose cardinality the plan can't prove — non-fatal, but
    # must be SURFACED so a human justifies the frame as bounded.
    ck = _docs(spark).select("doc_id").localCheckpoint(eager=True)
    df = ck.withColumn("rk", F.row_number().over(Window.orderBy("doc_id")))
    flags, warns, _scans = _pa.audit_plan(_pa.formatted_plan(df))
    assert warns >= 1 and not flags, (flags, warns)


def test_flags_true_cartesian(spark):
    a = _docs(spark).select("doc_id")
    b = _docs(spark).select(F.col("doc_id").alias("other_id"))
    # defeat the broadcast planner: both sides unhinted, join with an
    # inequality-only condition -> CartesianProduct/BNLJ
    df = a.join(b, a.doc_id < b.other_id)
    plan = _pa.formatted_plan(df)
    flags, _warns, _scans = _pa.audit_plan(plan)
    # Spark plans this as BroadcastNestedLoopJoin when one side fits the
    # broadcast threshold; force the cartesian by disabling auto-broadcast.
    if not flags:
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            df = a.join(b, a.doc_id < b.other_id)
            flags, _warns, _scans = _pa.audit_plan(_pa.formatted_plan(df))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert any("cartesian" in f for f in flags), flags


def test_flags_fanout_rescan(spark):
    # The SES lineage-replay class: the SAME table scanned once per
    # consumer because a shared aggregate was never checkpointed.
    base = _docs(spark).select("doc_id")
    df = base
    for _ in range(4):
        df = df.unionByName(base)
    flags, _warns, _scans = _pa.audit_plan(_pa.formatted_plan(df))
    assert any("worst=documentsx5" in f for f in flags), flags


# ---------------------------------------------------------------------------
# Good plans: each must pass (no false flags from the depth fix).
# ---------------------------------------------------------------------------
def test_ok_grouped_window(spark):
    w = Window.partitionBy(F.col("doc_id") % 16).orderBy("doc_id")
    df = _docs(spark).withColumn("rk", F.row_number().over(w))
    flags, warns, _scans = _pa.audit_plan(_pa.formatted_plan(df))
    assert not flags and not warns, (flags, warns)


def test_ok_reduced_single_partition_sort(spark):
    # A one-task sort over an AGGREGATE (bounded frame) is legal — the
    # gate must not fire once a HashAggregate reduces the corpus.
    day = (
        _docs(spark)
        .groupBy((F.col("doc_id") % 30).alias("cell"))
        .agg(F.count("*").alias("n"))
    )
    df = day.withColumn("rk", F.row_number().over(Window.orderBy("cell")))
    flags, _warns, _scans = _pa.audit_plan(_pa.formatted_plan(df))
    assert not any("single_partition_sort" in f for f in flags), flags


def test_ok_sortmergejoin_is_not_a_sort_parent(spark):
    # ADVICE r7: parent matching used startswith("Sort"), which also
    # matched SortMergeJoin — a raw scan under an SMJ branch must not be
    # attributed to a single-partition sort.
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = _docs(spark).select("doc_id", "n_chars")
        b = _docs(spark).select(F.col("doc_id").alias("d2"))
        df = a.join(b, a.doc_id == b.d2)
        flags, _warns, _scans = _pa.audit_plan(_pa.formatted_plan(df))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert not any("single_partition_sort" in f for f in flags), flags


def test_starred_sibling_not_swept_into_exchange_subtree(spark):
    # ADVICE r7 depth bug, end-to-end: a bounded single-partition sort in
    # one branch joined (broadcast) against a raw corpus scan in a SIBLING
    # branch.  With the old column-of-name depth, the starred sibling scan
    # printed after the Exchange read 2 columns deeper and was swept into
    # the exchange's subtree -> false FLAG.
    tiny = (
        _docs(spark)
        .groupBy((F.col("doc_id") % 5).alias("cell"))
        .agg(F.count("*").alias("n"))
        .withColumn("rk", F.row_number().over(Window.orderBy("cell")))
    )
    corpus = _docs(spark).select("doc_id", (F.col("doc_id") % 5).alias("cell"))
    df = corpus.join(F.broadcast(tiny), "cell")
    flags, _warns, _scans = _pa.audit_plan(_pa.formatted_plan(df))
    assert not any("single_partition_sort" in f for f in flags), flags


# ---------------------------------------------------------------------------
# Pure-text control: the exact formatted-plan shape that silently defeated
# the old substring gate (operator and Arguments on separate lines).
# ---------------------------------------------------------------------------
SPLIT_LINE_PLAN = """\
== Physical Plan ==
Window (4)
+- * Sort (3)
   +- Exchange (2)
      +- * Scan parquet  (1)


(1) Scan parquet
Output [1]: [doc_id#1L]
Location: InMemoryFileIndex [file:/x/documents.parquet]

(2) Exchange
Input [1]: [doc_id#1L]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]

(3) Sort
Input [1]: [doc_id#1L]

(4) Window
Input [1]: [doc_id#1L]
"""


def test_text_control_split_line_single_partition():
    flags, warns, _scans = _pa.audit_plan(SPLIT_LINE_PLAN)
    assert any("single_partition_sort" in f for f in flags), (flags, warns)


# ---------------------------------------------------------------------------
# WARN allowlist (VERDICT r8 #2): the sp_window_over_checkpoint WARN set
# depends on which AQE plan shape materializes, so "justified" must be an
# explicit pinned contract, not a per-run hand assertion.
# ---------------------------------------------------------------------------


def test_warn_allowlist_queries_exist_in_registry():
    from vector_search_spark import registry

    missing = set(_pa.SP_WARN_ALLOWLIST) - set(registry.QUERIES)
    assert not missing, f"allowlist names not in registry: {missing}"


def test_warn_allowlist_entries_have_justifications():
    for name, (cap, why) in _pa.SP_WARN_ALLOWLIST.items():
        assert cap >= 1 and why.strip(), (name, cap, why)


def test_warn_gate_escalates_unlisted_query():
    assert _pa.warn_gate("some_future_query", 1) == [
        "sp_warn_not_allowlisted=1>0"
    ]


def test_warn_gate_escalates_above_cap():
    name = "runs_test_daily"
    cap = _pa.SP_WARN_ALLOWLIST[name][0]
    assert _pa.warn_gate(name, cap) == []
    assert _pa.warn_gate(name, cap + 1) == [
        f"sp_warn_not_allowlisted={cap + 1}>{cap}"
    ]


def test_warn_gate_silent_when_no_warns():
    assert _pa.warn_gate("anything", 0) == []
