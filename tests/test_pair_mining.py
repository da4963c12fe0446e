"""token_pair_lift scale contract: the pair-generating self-join must run
over the support-filtered presence table, and the filter must be lossless
(VERDICT r2 item 2 — the df >= 5 apriori pushdown)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_TEST
from vector_search_spark import registry as _registry  # noqa: F401  (break the
# circular import when this file is collected standalone: registry_text's
# module graph assumes the package registry is initialized first)
from vector_search_spark.registry_text import (
    PAIR_MIN_SUPPORT,
    _pair_presence_frequent,
    _pair_presence_raw,
)
from vector_search_spark.sources.tables import load_table


def _presence_tables(spark):
    docs = load_table(spark, SF_TEST, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    pres = _pair_presence_raw(docs)
    dfq = pres.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    pres_f = _pair_presence_frequent(pres, dfq, min_support=PAIR_MIN_SUPPORT)
    return pres, pres_f


def _co_pairs(pres):
    a, b = pres.alias("a"), pres.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= PAIR_MIN_SUPPORT)
    )


def test_support_prefilter_shrinks_presence(spark):
    """Mechanism check on a corpus with a long tail: rare tokens (df < 5)
    leave the presence table, frequent ones stay.  (The sf0.01 fixture's
    synthetic vocabulary is all-frequent, so this uses its own corpus.)"""
    docs = spark.createDataFrame(
        [(i, f"common filler rare{i}",) for i in range(10)],
        "doc_id long, text string",
    )
    pres = _pair_presence_raw(docs)
    dfq = pres.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    pres_f = _pair_presence_frequent(pres, dfq, min_support=PAIR_MIN_SUPPORT)
    kept = {r.tok for r in pres_f.select("tok").distinct().collect()}
    assert kept == {"common", "filler"}
    assert pres_f.count() == 20 < pres.count() == 30


def test_support_prefilter_is_lossless(spark):
    """Pairs mined from the filtered presence == pairs from the raw
    presence, at the co >= MIN_SUPPORT floor (apriori monotonicity)."""
    pres, pres_f = _presence_tables(spark)
    raw = {tuple(r) for r in _co_pairs(pres).collect()}
    filt = {tuple(r) for r in _co_pairs(pres_f).collect()}
    assert raw == filt


def test_pair_join_input_is_filtered_plan(spark):
    """The registered query's physical plan joins the FILTERED presence:
    the df >= 5 predicate must appear upstream of the doc_id self-join."""
    from vector_search_spark import registry

    df = registry.QUERIES["token_pair_lift"](spark, SF_TEST)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "(df" in plan and ">= 5" in plan.replace("  ", " "), plan
