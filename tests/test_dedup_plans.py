"""Plan-shape assertions for the dedup family: the scale contracts
(candidates-via-equijoin, never a cartesian pair space) hold in the
physical plan, not just in docstrings."""

from __future__ import annotations

from conftest import SF_TEST
from vector_search_spark import registry


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_simhash_pairs_no_cartesian(spark):
    df = registry.QUERIES["dedup_simhash"](spark, SF_TEST)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]


def test_embedding_cosine_no_cartesian(spark):
    df = registry.QUERIES["dedup_embedding_cosine"](spark, SF_TEST)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]


def test_ngram_jaccard_registered_no_cartesian(spark):
    df = registry.QUERIES["dedup_ngram_jaccard"](spark, SF_TEST)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
