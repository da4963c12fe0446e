"""BM25 + RRF invariants: hand-computed scores on a tiny corpus, rank
contracts, and the fused-list sentinel behavior."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_search_spark.operators.bm25 import bm25_scored, bm25_topk, rrf_fuse

K1, B = 1.2, 0.75


def _py_bm25(corpus: dict[int, str], terms: list[str]) -> dict[int, float]:
    toks = {i: t.lower().split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) * 1.0 / n
    out: dict[int, float] = {}
    for i, tl in toks.items():
        s = 0.0
        for term in sorted(set(terms)):
            tf = tl.count(term)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (K1 + 1.0)) / (tf + K1 * (1 - B + B * len(tl) / avgdl))
        if s:
            out[i] = s
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    corpus = {
        1: "spark join table scan",
        2: "join join join window",
        3: "stream batch stream",
        4: "unrelated words only here",
        5: "spark spark spark spark spark",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    return corpus, df


def test_bm25_matches_hand_computation(corpus_df):
    corpus, df = corpus_df
    expect = _py_bm25(corpus, ["spark", "join", "stream"])
    got = {
        r["doc_id"]: r["raw_score"]
        for r in bm25_scored(df, ["spark", "join", "stream"], k1=K1, b=B).collect()
    }
    assert set(got) == set(expect)
    for i in expect:
        assert got[i] == pytest.approx(expect[i], abs=1e-12)


def test_bm25_topk_rank_contract(corpus_df):
    _, df = corpus_df
    out = bm25_topk(df, "spark join stream", k=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    scores = [r["raw_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # doc 4 has no query term: never appears even with a huge k
    all_out = bm25_topk(df, "spark join stream", k=100).collect()
    assert 4 not in {r["doc_id"] for r in all_out}


def test_rrf_fusion_sentinels_and_scores(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    rows = {r["doc_id"]: r for r in rrf_fuse(a, b, k=60).collect()}
    assert rows[1]["rank_b"] == -1 and rows[3]["rank_a"] == -1
    assert rows[2]["raw_rrf"] == pytest.approx(1 / 62 + 1 / 61)
    assert rows[1]["raw_rrf"] == pytest.approx(1 / 61)
    # doc in both lists outranks single-list docs at comparable ranks
    assert rows[2]["raw_rrf"] > rows[1]["raw_rrf"] > 0


def test_bm25_no_matching_terms_is_empty(corpus_df):
    _, df = corpus_df
    assert bm25_scored(df, ["zzz", "qqq"]).count() == 0


def test_bm25_duplicate_query_terms_do_not_double_count(corpus_df):
    corpus, df = corpus_df
    once = {r["doc_id"]: r["raw_score"] for r in bm25_scored(df, ["spark"]).collect()}
    twice = {
        r["doc_id"]: r["raw_score"]
        for r in bm25_scored(df, ["spark", "spark"]).collect()
    }
    assert once == twice
