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


def test_connected_components_chain_and_islands(spark):
    """Min-label propagation reaches across chains (a~b~c~d~e collapses to
    one cluster even though a~e was never a pair) and keeps islands apart."""
    from vector_search_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22)],
        "id_1 long, id_2 long",
    )
    got = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_direction_independent(spark):
    """Edges are undirected: (9,1) still labels the cluster by min id 1."""
    from vector_search_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([(9, 1), (9, 5)], "id_1 long, id_2 long")
    got = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 5: 1, 9: 1}
