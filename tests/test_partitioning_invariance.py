"""Partitioning invariance: the determinism contract behind every scale
claim in this repo.  A query whose result depends on the number of shuffle
partitions or scan splits would return different answers on a laptop and a
1000-executor cluster; these tests re-run representative queries (the
float-emitting ones, where reduction order could bite) under deliberately
different partitioning regimes and require bit-identical rows.

Why this works without restarting Spark: `spark.sql.shuffle.partitions`
and `spark.sql.files.maxPartitionBytes` are runtime-settable SQL confs —
each run re-plans with different exchange widths and scan splits.
"""

from __future__ import annotations

import pytest

from conftest import SF_TEST, sweep_sample
from vector_search_spark import registry

# Round 6: the sweep covers EVERY registry query (VERDICT r5 #7) —
# derived from the registry so new queries are covered by construction.
# Round 12 (VERDICT r11 #1): the default run is a deterministic 1-in-3
# sample + every recently-rewritten query so the suite fits the driver's
# verify budget; SP_SLOW_TESTS=1 restores the full sweep (see
# conftest.sweep_sample).  The curated list below is kept as
# documentation of which queries were chosen first and why (maximal
# reduction-order exposure: integer-scaled float folds, sketch register
# sums, window frames over floats, min/max-derived bucketing, the LSH
# cascade, distributed global ranks).
QUERIES = sweep_sample(sorted(registry.QUERIES))

_ORIGINAL_CURATED = [
    "unigram_logprob",
    "corpus_entropy",
    "hll_distinct_users",
    "cms_heavy_hitters",
    "daily_count_anomalies",
    "event_value_histogram",
    "dedup_minhash_lsh",
    "pricing_summary",
    "event_value_percentiles",
    "user_retention_cohorts",
    "value_quantile_sketch",
    "value_hour_correlation",
    "token_pair_lift",
    "embedding_norm_qc",
    "dup_graph_pagerank",
    # round-3 float emitters
    "zipf_law_fit",
    "heaps_law_curve",
    "ab_test_zscore",
    "ngram_novelty",
    "dup_graph_triangles",
    "dedup_containment",
    "important_stock",
    "subdoc_block_dedup",
    # distributed global-rank consumers (range-sampling must not leak into results)
    "packing_plan",
    "quality_deciles",
    # round-3b float emitters / order-sensitive additions
    "bigram_lm_logprob",
    "join_key_skew_audit",
    "weighted_sample_topk",
    "dedup_edit_distance",
    "dup_neighbor_jaccard",
    "phrase_search",
    "bpe_top_merges",
    "hard_negative_mining",
    "exp_decay_daily_value",
    "subdoc_dedup_rewrite",
    "customer_rfm_segments",
    "bpe_apply_stats",
    "seasonal_naive_backtest",
    "containment_bottomk",
    "synthetic_value_sampler",
    "quantile_normalize_scores",
    "conversion_latency_percentiles",
    "ann_srp_recall_eval",
    "value_drift_psi",
    # round-4 float emitters / order-sensitive additions
    "ips_policy_value",
    "calibration_bins",
    "annotator_agreement",
    "kmv_distinct_overlap",
    "bloom_fp_audit",
    "skyline_orders",
    "dup_substring_runs",
    "ann_ivfpq_topk",
    "pca_top_component",
    "ols_price_model",
    "decision_stump_returns",
    "markov_stationary_events",
    "doc_suffix_lrs",
    "corpus_suffix_repeats",
    "bootstrap_value_ci",
    "greedy_coverage_select",
    "scorer_auc",
    "pr_best_f1",
    "value_cusum_changepoint",
    "session_overlap_pairs",
    "feature_mutual_information",
    "target_encoding_oof",
    "ks_two_sample",
    "theil_sen_daily_trend",
    "corpus_exact_dedup_rewrite",
    "kmeans_lineitem",
    "markov_attribution",
    "robust_mad_outliers",
    "svd_rank1_affinity",
    "purchase_nearest_click",
    "markov_next_event_accuracy",
    "ab_bootstrap_diff_ci",
    "markov_entropy_rate",
    "dedup_cluster_keep_best",
    "attribution_models_compare",
    "dow_chi_square",
    "benford_first_digit",
    "curation_funnel",
    "revenue_concentration",
    "runs_test_daily",
    # round-5 iterative-graph / shared-text-float additions
    "dup_label_propagation",
    "dup_eigencentrality",
    "mann_kendall_daily",
    "gbdt_residual_stumps",
    "pca_second_component",
    "svd_rank2_affinity",
    "basket_affinity_pairs",
    # round-6 iterative-graph / shared-text-float additions
    "dup_bfs_hops",
    "dup_community_modularity",
    "acf_daily_revenue",
    "textrank_keywords",
    "logistic_regression_gd",
    "knn_loo_eval",
    "mmr_diversify_topk",
    "rocchio_prf_search",
    "kaplan_meier_conversion",
    "conformal_price_interval",
    "decision_tree_depth2",
    "graph_double_sweep_diameter",
    "trimmed_mean_value",
    "uplift_by_segment",
    "seasonal_decomposition_dow",
    "k_anonymity_audit",
    "markov_expected_steps",
    "dup_personalized_pagerank",
    "bagging_split_stability",
    "conformal_group_coverage",
    "ab_sprt_monitor",
    "logrank_test_conversion",
    "isotonic_hour_calibration",
    # round-5 additions
    "decision_tree_depth3",
    "ab_group_sequential",
    "ann_ivfpq_residual_topk",
    "ses_revenue_forecast",
    "winsorized_mean_value",
    "ab_cuped_adjustment",
    "dedup_embedding_srp",  # the wide-band config (now the primary name)
    "brown_trend_forecast",
    "mannwhitney_value_test",
    "ab_welch_ttest",
    "ab_power_sample_size",
    "brown_forsythe_variance_test",
    "embedding_drift_mmd",
    "cramer_von_mises_test",
    # round-6 additions
    "holt_winters_dow_forecast",
]

REGIMES = [
    {"spark.sql.shuffle.partitions": "3", "spark.sql.files.maxPartitionBytes": "64k"},
    {"spark.sql.shuffle.partitions": "29", "spark.sql.files.maxPartitionBytes": "128m"},
]


def _rows(spark, name):
    df = registry.QUERIES[name](spark, SF_TEST)
    # Compare as a sorted multiset: row ORDER is not part of the contract
    # for un-ordered queries (the driver comparator also sorts before
    # hashing) — found when the round-6 full-registry sweep flagged
    # dedup_exact/dedup_ngram_jaccard, whose VALUES are invariant but
    # whose row order follows the shuffle layout.  Cell values must still
    # be bit-identical.
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("name", QUERIES)
def test_result_is_partitioning_invariant(spark, name):
    saved = {
        k: spark.conf.get(k) for r in REGIMES for k in r
    }
    try:
        results = []
        for regime in REGIMES:
            for k, v in regime.items():
                spark.conf.set(k, v)
            results.append(_rows(spark, name))
        assert results[0] == results[1], (
            f"{name} changed under a different partitioning regime — "
            "reduction-order or split-dependent expression in the plan"
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# Curated ORDERED subset (ADVICE r6): _rows sorts before comparing, which
# is right for the unordered majority (the driver comparator also sorts)
# but would hide a row-ORDER regression in queries whose contract ends in
# a global ORDER BY.  These compare collected rows WITHOUT sorting — every
# query here tie-breaks by id, so its output order is fully deterministic
# and must survive any partitioning regime.
# ---------------------------------------------------------------------------
# the ordered contract set is small (a handful of queries) — no sampling
ORDERED_QUERIES = sorted(registry.ORDERED_QUERIES)  # shared with bench.py


@pytest.mark.parametrize("name", ORDERED_QUERIES)
def test_row_order_is_partitioning_invariant(spark, name):
    saved = {k: spark.conf.get(k) for r in REGIMES for k in r}
    try:
        results = []
        for regime in REGIMES:
            for k, v in regime.items():
                spark.conf.set(k, v)
            df = registry.QUERIES[name](spark, SF_TEST)
            results.append([tuple(r) for r in df.collect()])  # NO sort
        assert results[0] == results[1], (
            f"{name} row ORDER changed under a different partitioning "
            "regime — its contract ends in a global ORDER BY, so order "
            "must be deterministic"
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
