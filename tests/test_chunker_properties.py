"""Property-based chunker tests (hypothesis): structural invariants must
hold for arbitrary markdown-ish input — no crashes, well-formed categories,
contiguous 1-based indexes, prefix rules, source-field consistency."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vector_search_spark.operators.chunker import parse_newsletter_chunks

# building blocks that exercise the parser's regex surface
_frag = st.sampled_from(
    [
        "## 3 IDEAS FROM ME\n",
        "## 2 QUOTES FROM OTHERS\n",
        "## 1 QUESTION FOR YOU\n",
        "## 3 Ideas From Me\n",  # case variant — must be dropped
        "I. ",
        "II. ",
        "XIV. ",
        "IV.",  # roman inside prose
        "*Source:* [T](http://x)\n",
        "*Source:* plain text\n",
        "*Source:*\n",
        "[Share this on Twitter](http://t)\n",
        "[link](http://l)",
        "**bold**",
        "---\n",
        "Until next week",
        "some prose with punctuation, and    spaces\n",
        "\n\n",
        "é\xa0ü",  # unicode incl. nbsp
        "# Title\n",
    ]
)
_doc = st.lists(_frag, min_size=0, max_size=25).map("".join)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_chunker_invariants(spark, docs):
    df = spark.createDataFrame(
        [(i, d, "2024-01-01") for i, d in enumerate(docs)],
        "path string, content string, date string",
    )
    rows = parse_newsletter_chunks(df).collect()
    by_sec: dict[tuple, list] = {}
    for r in rows:
        assert r["category"] in ("idea", "quote", "question")
        assert r["index"] >= 1
        assert r["date"] == "2024-01-01"
        if r["category"] == "idea":
            assert r["text"].startswith("Idea from James Clear: ")
            assert r["source"] is None and r["source_name"] is None
        if r["category"] == "question":
            assert r["index"] == 1
        if r["category"] == "quote":
            if r["source"] is not None:
                assert r["source_name"] is not None  # url implies name
            if r["source_name"]:
                # no trailing space: an empty quote body yields exactly
                # "Quote from X:" after the final trim (reference
                # pipeline/utils.py:153,159 — trim_empty_lines strips it)
                assert r["text"].startswith(f"Quote from {r['source_name']}:")
        # blank lines never survive trim_empty_lines
        assert "\n\n" not in r["text"]
        by_sec.setdefault((r["path"], r["sec_pos"], r["category"]), []).append(r["index"])
    # per-section indexes are 1..n contiguous for idea/quote sections
    for (path, sec, cat), idxs in by_sec.items():
        if cat in ("idea", "quote"):
            assert sorted(idxs) == list(range(1, len(idxs) + 1)), (path, sec, cat, idxs)
