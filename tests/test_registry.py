"""The driver-contract gate, run locally: every registered query that has an
oracle must hash-match DuckDB at sf0.01; every query must run at sf0.001."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE, SF_TEST, compare_with_oracle
from vector_search_spark import registry


def _oracle_cases():
    return sorted(registry.ORACLES.keys())


def _all_cases():
    return sorted(registry.QUERIES.keys())


@pytest.mark.parametrize("name", _all_cases())
def test_query_runs_at_smoke_sf(spark, name):
    df = registry.QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, name):
    df = registry.QUERIES[name](spark, SF_TEST)
    compare_with_oracle(df, registry.ORACLES[name], SF_TEST)


def test_entry_contract(spark):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(mod.oracle_sql().keys()) <= set(mod.queries().keys())
