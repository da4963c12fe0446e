"""Shared fixtures: a session-scoped SparkSession and a DuckDB oracle
comparator that mirrors the driver's correctness gate (row count + schema +
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vector_search_spark.session import get_spark  # noqa: E402

SF_TEST = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"

# Round 12 (VERDICT r11 #1): the full suite must complete inside the
# driver's verify budget (the r11 run was truncated at ~80% with zero
# failures).  Tests whose measured cost is dominated by DuckDB oracle
# pipelines that are nearly SIZE-INDEPENDENT (the iterative dup-graph
# oracles re-run the whole shingle/LSH/verify/CC pipeline in SQL: 30-50 s
# each at ANY fixture size, so no cheap smoke variant exists) are gated
# behind SP_SLOW_TESTS=1.  They still run in the builder's per-round
# full pass (recorded in OPTIMIZATION_r12.md) and their queries stay
# covered by the fresh-process sf0.01 oracle drive committed in-tree.
SP_SLOW_TESTS = os.environ.get("SP_SLOW_TESTS", "") == "1"


def skip_unless_slow_tests(reason: str) -> None:
    if not SP_SLOW_TESTS:
        pytest.skip(f"SP_SLOW_TESTS=1 to run ({reason})")


# Recently-rewritten queries (rounds 11-12): the per-query sweep gates
# below always include these in their default sample — regressions from
# plan rewrites concentrate here, not in untouched queries.
RECENTLY_TOUCHED = frozenset(
    {
        "ab_bootstrap_diff_ci", "bagging_split_stability",
        "bootstrap_value_ci", "ks_two_sample", "pr_best_f1",
        "knn_loo_eval", "svd_rank1_affinity", "textrank_keywords",
        "doc_suffix_lrs", "corpus_suffix_repeats",
        "corpus_exact_dedup_rewrite", "bpe_top_merges", "bpe_apply_stats",
        "session_overlap_pairs", "markov_stationary_events",
        "markov_entropy_rate", "markov_attribution",
        "markov_expected_steps", "pca_top_component",
        "pca_second_component", "svd_rank2_affinity",
        "multimodal_features", "ann_ivf_probe_sweep",
        "dedup_clusters", "dup_sampling_weights",
    }
)


def sweep_sample(names, always=RECENTLY_TOUCHED):
    """Deterministic 1-in-3 sample for the 250-query sweep gates.

    Round 12 (VERDICT r11 #1): the full suite must complete inside the
    driver's verify budget; the full-registry parameterized sweeps
    (partitioning invariance x2 regimes, oracle-dtype contract) are
    ~17 min of the ~29 min suite while duplicating per-query execution
    the oracle-parity sweep (test_registry — kept FULL) already pays.
    Default: every 3rd query by sorted index PLUS every recently-
    rewritten query; SP_SLOW_TESTS=1 restores the full sweep (run in
    the builder's in-round pass, recorded in OPTIMIZATION_r12.md)."""
    names = list(names)
    if SP_SLOW_TESTS:
        return names
    return [n for i, n in enumerate(names) if i % 3 == 0 or n in always]


def stream_sf(default: str) -> str:
    """Fixture dir for the STREAMING drain-equals-batch twins.

    SPARK_GRAFT_STREAM_SF redirects the whole streaming family to another
    FK-consistent instance — used by the scale campaign to run the twins
    against the 1000x fixture's replica slice (VERDICT r8 missing #4);
    unset, each test keeps its default gate fixture.
    """
    import os

    return os.environ.get("SPARK_GRAFT_STREAM_SF", default)
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written fixtures are DIRECTORIES of part files (the same
        # layout trap the r9 streaming source hit) — glob them for DuckDB
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    # Tag floats so an int64-vs-float64 cross-engine mismatch FAILS here the
    # way it fails the driver's pandas canonicalizer (Python `int == float`
    # would otherwise hide it — the round-1 hash_match trap).
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", round(v, 4))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return v


def compare_with_oracle(spark_df, oracle_sql: str, sf_dir: str):
    """Assert the Spark result and the DuckDB oracle match, order-insensitively,
    with columns aligned by (sorted) name — the driver's comparison model."""
    con = duck_con(sf_dir)
    oracle = con.execute(oracle_sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(s_cols) == sorted(o_cols), f"schema mismatch: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count {len(s_rows)} vs oracle {len(o_rows)}"

    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])

    def _key(row):  # None-safe total ordering (rollup rows contain NULLs)
        return tuple((v is None, str(v)) for v in row)

    s_set = sorted((tuple(_norm_cell(r[i]) for i in s_order) for r in s_rows), key=_key)
    o_set = sorted((tuple(_norm_cell(r[i]) for i in o_order) for r in o_rows), key=_key)
    mismatches = [(a, b) for a, b in zip(s_set, o_set) if a != b]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[:3]}"
