"""Plan-quality gates: predicates reach the parquet scan (PushedFilters)
and projection prunes the read schema — the two properties that decide
whether a 100 TB scan reads terabytes or gigabytes."""

from __future__ import annotations

from conftest import SF_TEST
from vector_search_spark import registry


def _formatted(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _scan_block(plan: str, table_hint: str) -> str:
    # the scan node's detail block mentioning the table's column prefix
    blocks = plan.split("\n\n")
    hits = [b for b in blocks if "Scan parquet" in b and table_hint in b]
    assert hits, f"no parquet scan block for {table_hint}: {plan[:800]}"
    return "\n\n".join(hits)


def test_pricing_summary_pushdown_and_pruning(spark):
    df = registry.QUERIES["pricing_summary"](spark, SF_TEST)
    plan = _formatted(spark, df)
    scan = _scan_block(plan, "l_shipdate")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan" in scan
    # 6 needed columns, not the whole lineitem schema
    assert "l_orderkey" not in scan.split("ReadSchema")[1]


def test_order_priority_counts_pushdown(spark):
    df = registry.QUERIES["order_priority_counts"](spark, SF_TEST)
    plan = _formatted(spark, df)
    scan = _scan_block(plan, "o_orderdate")
    assert "GreaterThan" in scan and "LessThan" in scan  # both range bounds pushed
    read = scan.split("ReadSchema")[1]
    assert "o_orderpriority" in read and "o_totalprice" not in read


def test_text_stats_reads_only_needed_columns(spark):
    # text_stats derives from the session-shared doc-features table, which
    # reads the text family's UNION of needed columns (doc_id/text/lang/
    # source) once per session instead of per query.  The parquet n_chars
    # column is recomputed from text, so it must still be pruned from the
    # scan — the one prunable column in the family-union design.
    df = registry.QUERIES["text_stats"](spark, SF_TEST)
    plan = _formatted(spark, df)
    scan = _scan_block(plan, "doc_id")
    read = scan.split("ReadSchema")[1]
    assert "text" in read
    assert "n_chars" not in read


def test_event_funnel_single_data_exchange(spark):
    """Sessionization + all three stage windows + the session group must
    share ONE hashpartitioning(user_id) exchange (plus the final
    single-partition fold) — the property that keeps the funnel a
    one-shuffle query at 100 TB."""
    df = registry.QUERIES["event_funnel"](spark, SF_TEST)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1


def test_outer_join_reuses_agg_partitioning(spark):
    """Both pre-aggregated sides are hash-partitioned on (user_id, day) by
    their groupBys; the FULL OUTER join must not add a third exchange."""
    df = registry.QUERIES["purchase_click_daily_outer"](spark, SF_TEST)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two agg exchanges + the final orderBy range exchange, nothing more
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_maxsim_no_vectors_in_shuffle(spark):
    """The MaxSim shuffle carries (label, qid, score) partial-max rows only
    — embedding arrays must never appear in an Exchange."""
    df = registry.QUERIES["maxsim_multivector"](spark, SF_TEST)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if line.strip().startswith("+- Exchange hashpartitioning"):
            assert "embedding" not in line and "qe" not in line, line


def test_unigram_logprob_prunes_and_broadcasts_total(spark):
    """The LM scan reads only (doc_id, text); the corpus-total row must
    ride in on a broadcast (1-row nested-loop), never a shuffled join."""
    df = registry.QUERIES["unigram_logprob"](spark, SF_TEST)
    plan = _formatted(spark, df)
    scan = _scan_block(plan, "doc_id")
    read = scan.split("ReadSchema")[1]
    assert "text" in read and "lang" not in read and "n_chars" not in read
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total
    assert "CartesianProduct" not in plan


def test_cms_counter_table_is_broadcast(spark):
    """The probe join must broadcast the <= depth x width counter table —
    the property that keeps CMS point-queries shuffle-free at any corpus
    size."""
    df = registry.QUERIES["cms_heavy_hitters"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bottleneck_suppliers_single_wide_exchange(spark):
    """The per-(order, supplier) aggregate and the order-partitioned window
    must share ONE hashpartitioning(l_orderkey) exchange (subset-key
    distribution) — no second data shuffle between agg and window."""
    df = registry.QUERIES["bottleneck_suppliers"](spark, SF_TEST)
    plan = _formatted(spark, df)
    import re

    parts = re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan)
    wide = [m for m in parts if "l_orderkey" in m]
    assert len(wide) == 1, f"expected one orderkey exchange, saw {parts}"
    # and the lineitem-cardinality rows are never re-shuffled on a second key
    assert not any("l_orderkey" in m and "l_suppkey" in m for m in parts)


def test_incremental_dedup_no_cartesian(spark):
    df = registry.QUERIES["incremental_ingest_dedup"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_corpus_entropy_prunes_to_source_and_text(spark):
    df = registry.QUERIES["corpus_entropy"](spark, SF_TEST)
    plan = _formatted(spark, df)
    scan = _scan_block(plan, "source")
    read = scan.split("ReadSchema")[1]
    assert "text" in read and "doc_id" not in read and "n_chars" not in read


def test_token_pair_lift_no_cartesian_on_corpus(spark):
    """The pair self-join must be keyed on doc_id (equi-join); the only
    nested-loop allowed is the 1-row N broadcast."""
    df = registry.QUERIES["token_pair_lift"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    import re

    # formatted explain lists each node twice (tree + detail); count the
    # numbered detail headers
    bnlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(bnlj) <= 1, plan  # only the 1-row N table
    # the corpus pair join itself is a hash join on doc_id
    assert re.findall(r"\(\d+\) BroadcastHashJoin", plan) or "SortMergeJoin" in plan


def test_retention_single_user_exchange_feeds_both_sides(spark):
    """first-seen and activity both derive from one user_id-keyed scan —
    no exchange keyed on anything wider than (user_id) or the final
    (cohort_week[, week_offset]) aggregates."""
    df = registry.QUERIES["user_retention_cohorts"](spark, SF_TEST)
    plan = _formatted(spark, df)
    import re

    keys = re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan)
    for k in keys:
        assert ("user_id" in k) or ("cohort_week" in k), keys


def test_bloom_filter_join_pruning_fires(spark):
    """Runtime bloom-filter join pruning (VERDICT r2 item 7): when a
    selective dimension filter feeds a shuffle join, Spark can inject a
    bloom filter of the small side's join keys into the fact-side scan —
    the last classic scale lever for a 100 TB probe side.  The feature's
    size thresholds (10 MB creation / 10 GB application scan) can never
    trip at fixture scale, so this gate forces them to zero and asserts
    the filter lands in the optimized plan of a Q21-ish orders⋈lineitem
    shape; production-size inputs then clear the real thresholds with the
    same plan shape."""
    from vector_search_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # creationSideThreshold is a MAXIMUM (the build side must be small
        # enough to be worth hashing); applicationSideScanSizeThreshold is
        # a MINIMUM (the probe side must be big enough to be worth
        # pruning).  Fixture scale: raise the max, zero the min.
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    # built-in SQL confs: get() returns the default (possibly None for
    # fallback confs like adaptive.autoBroadcastJoinThreshold)
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load_table(spark, SF_TEST, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        lineitem = load_table(spark, SF_TEST, "lineitem")
        joined = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).groupBy("o_orderpriority").count()
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_excess_stock_pushes_shipdate_to_scan(spark):
    """Q20 shape: the lineitem (fact) scan must carry the shipdate range in
    PushedFilters and read only the 4 needed columns — at 100 TB this is
    the difference between scanning a year and scanning everything."""
    df = registry.QUERIES["excess_stock_suppliers"](spark, SF_TEST)
    plan = _formatted(spark, df)
    scan = _scan_block(plan, "l_shipdate")
    assert "GreaterThanOrEqual(l_shipdate" in scan and "LessThan(l_shipdate" in scan
    read = scan.split("ReadSchema")[1]
    assert "l_quantity" in read and "l_extendedprice" not in read


def test_min_cost_supplier_broadcasts_dims(spark):
    """Q2 shape: the supplier⋈nation⋈region chain and the filtered part
    list are dim-sized — every join against them must be a broadcast, and
    the part scan must carry the type/size predicates."""
    df = registry.QUERIES["min_cost_supplier"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "BroadcastHashJoin" in plan
    scan = _scan_block(plan, "p_type")
    assert "EqualTo(p_type,LARGE)" in scan and "LessThanOrEqual(p_size,15)" in scan


def test_subdoc_block_dedup_no_pair_join(spark):
    """Sub-document dedup must find cross-doc repetition by GROUPING on
    block hashes, never by pairing documents: no join condition on two
    doc-id columns, no cartesian."""
    df = registry.QUERIES["subdoc_block_dedup"](spark, SF_TEST)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "CartesianProduct" not in plan and "doc_id#" in plan
    physical = _formatted(spark, df)
    assert "CartesianProduct" not in physical


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join handling — the runtime lever for hot keys at 100 TB
    (one salted-join alternative the engine also ships statically in
    `partitioning.salted_join`).  Thresholds are forced down so the
    synthetic hot key (~90% of rows on one join key) trips skew detection
    at fixture scale; the adaptive plan must mark the join skew=true and
    read the hot partition as a skewed (split) AQEShuffleRead.  Note: a
    downstream hash-partitioning requirement suppresses the optimization
    (splitting would break the partitioning contract), so the probe
    aggregates globally."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 220_000).select(
            F.when(F.col("id") < 200_000, F.lit(0))
            .otherwise((F.col("id") % 99) + 1)
            .alias("k"),
            F.concat(F.lit("payloadpayloadpayload-"), F.col("id")).alias("pl"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k").agg(F.count(F.lit(1)).alias("n"))
        assert j.collect()[0]["n"] == 220_000  # correctness unchanged
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan and "AQEShuffleRead skewed" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bm25_topk_bounded_before_window(spark):
    """The BM25 top-k must bound the scored set with TakeOrderedAndProject
    BEFORE rank assignment — a pre-limit partition-less window would
    funnel every matched document through one task (no WindowGroupLimit
    exists for an empty partition spec)."""
    df = registry.QUERIES["bm25_topk"](spark, SF_TEST)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_textrank_no_cartesian_and_broadcast_vocab(spark):
    """TextRank's adjacency must come from the linear array transform cut
    by BROADCAST joins against the frequent vocabulary — never a
    cartesian or sort-merge pair square over tokens."""
    df = registry.QUERIES["textrank_keywords"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_logreg_final_pass_is_one_scan_with_broadcast_weights(spark):
    """The logistic-regression metrics pass must be ONE events scan with
    the 1-row weight frame broadcast in — partial-agg'd to a single
    row, no row-level shuffle of events."""
    df = registry.QUERIES["logistic_regression_gd"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the only exchanges are the 1-row aggregate folds, never a
    # hashpartitioning of the events rows themselves
    assert "hashpartitioning(y" not in plan


def test_tree_shuffles_histograms_not_rows(spark):
    """The depth-2 tree's exchanges must carry (node, feature, bin)
    histogram cells (partial_count/partial_sum BEFORE the exchange), so
    the shuffle is domain-sized, not row-sized."""
    df = registry.QUERIES["decision_tree_depth2"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "partial_count" in plan or "partial count" in plan.lower()
    assert "CartesianProduct" not in plan
    # root scalar comes back via broadcast, not a row-shuffle join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_tree_depth3_shuffles_histograms_not_rows(spark):
    """Depth 3 composes the same level-wise invariant: every exchange
    carries (node, feature, bin) histogram cells, level tags come back
    via broadcast, and no level degrades to a cartesian or row-shuffle."""
    df = registry.QUERIES["decision_tree_depth3"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "partial_count" in plan or "partial count" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_trimmed_mean_no_global_sort_of_rows(spark):
    """The trimmed mean must rank via the per-type value HISTOGRAM —
    no per-row global sort/window over the events rows.  The histogram
    is eagerly checkpointed (it fans out to the kept sum and the raw
    mean; one corpus scan), so the visible plan starts from the
    checkpoint RDD: assert the downstream windows run over those
    aggregate cells partitioned by type, nothing ever collapses to a
    single partition, and the corpus is NOT re-scanned post-checkpoint."""
    df = registry.QUERIES["trimmed_mean_value"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "hashpartitioning(event_type" in plan
    assert "Exchange SinglePartition" not in plan
    assert "Scan parquet" not in plan  # everything reads the checkpointed cells


def test_winsorized_mean_same_histogram_route(spark):
    """Winsorized mean shares the trimmed mean's checkpointed-histogram
    route: windows over (type, value) cells, no single-partition
    collapse, no post-checkpoint corpus rescan."""
    df = registry.QUERIES["winsorized_mean_value"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "hashpartitioning(event_type" in plan
    assert "Exchange SinglePartition" not in plan
    assert "Scan parquet" not in plan


def test_kaplan_meier_windows_on_day_aggregate(spark):
    """KM's prefix sums must run AFTER the groupBy(d) collapse — the
    window input is the day aggregate, not the per-user durations."""
    df = registry.QUERIES["kaplan_meier_conversion"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert plan.count("Window") >= 2
    # the per-user and per-day collapses happen in HashAggregates BEFORE
    # any window touches the data
    assert plan.count("HashAggregate") >= 2
