"""Unit tests for column functions against pure-Python oracles."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from vector_search_spark.functions.scalar import relevance_label, round4, sigmoid
from vector_search_spark.functions.text import (
    BPE_TOKEN_PATTERN,
    rolling_hash,
    token_count_bpe,
    word_shingles,
)
from vector_search_spark.functions.vector import dot_product, l2_norm, l2_normalize


def test_rolling_hash_matches_python(spark):
    texts = ["hello world", "", "a", "Spark SQL £ ünïcode", "x" * 500]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r["i"]: r["h"] for r in df.select("i", rolling_hash("t").alias("h")).collect()}

    def py_roll(s: str, base=131, mod=1_000_000_007) -> int:
        acc = 0
        for ch in s:
            code = ord(ch) if ord(ch) < 128 else _spark_ascii(ch)
            acc = (acc * base + code) % mod
        return acc

    def _spark_ascii(ch: str) -> int:
        # Spark's ascii() returns the first code point (incl. non-ASCII)
        return ord(ch)

    for i, t in enumerate(texts):
        assert got[i] == py_roll(t), (i, t)


def test_bpe_token_count_matches_python(spark):
    texts = ["Hello, world! 42 times", "", "a+b=c", "  spaced   out  "]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r["i"]: r["n"] for r in df.select("i", token_count_bpe("t").alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == len(re.findall(BPE_TOKEN_PATTERN, t)), t


def test_vector_math(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0], [1.0, 0.0]), (2, [0.0, 0.0], [1.0, 1.0])],
        "i long, a array<double>, b array<double>",
    )
    rows = {r["i"]: r for r in df.select(
        "i",
        dot_product("a", "b").alias("dot"),
        l2_norm("a").alias("norm"),
        l2_normalize("a").alias("unit"),
    ).collect()}
    assert rows[1]["dot"] == 3.0 and rows[1]["norm"] == 5.0
    assert rows[1]["unit"] == [0.6, 0.8]
    assert rows[2]["norm"] == 0.0 and rows[2]["unit"] == [0.0, 0.0]  # zero-safe


def test_scalars(spark):
    df = spark.createDataFrame([(4.0,), (0.0,), (-3.5,)], "x double")
    rows = df.select(
        "x", round4(sigmoid("x")).alias("s"), relevance_label("x").alias("l")
    ).collect()
    got = {r["x"]: (r["s"], r["l"]) for r in rows}
    assert got[4.0] == (0.982, "high")
    assert got[0.0] == (0.5, "medium")
    assert got[-3.5][1] == "low"


def test_word_shingles_short_doc_fallback(spark):
    df = spark.createDataFrame([("a b",), ("one two three four",)], "t string")
    rows = [r[0] for r in df.select(word_shingles("t", 3).alias("s")).collect()]
    assert rows[0] == ["a b"]  # shorter than n -> whole-text shingle
    assert rows[1] == ["one two three", "two three four"]
