"""JSONL source/sink: round-trip fidelity and malformed-line quarantine."""

from __future__ import annotations

import os

from conftest import SF_TEST
from vector_search_spark.sources.jsonl import (
    corrupt_record_stats,
    read_jsonl,
    write_jsonl,
)
from vector_search_spark.sources.tables import load_table

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_jsonl_round_trip(spark, tmp_path):
    docs = load_table(spark, SF_TEST, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, coalesce=2)
    back = read_jsonl(spark, out, DOC_SCHEMA, keep_corrupt=False)
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.select(*docs.columns).collect()))
    assert a == b
    # line-delimited on disk: one JSON object per line, no array wrapper
    part = next(
        os.path.join(out, f) for f in os.listdir(out) if f.startswith("part-")
    )
    with open(part) as fh:
        first = fh.readline().strip()
    assert first.startswith("{") and first.endswith("}")


def test_jsonl_corrupt_lines_are_quarantined_not_dropped(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "a", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "de", "source": "b", "n_chars": 7}\n'
        '{"broken": \n'
    )
    df = read_jsonl(spark, str(p), DOC_SCHEMA)
    stats = corrupt_record_stats(df).collect()[0]
    assert stats.n_lines == 4
    assert stats.n_corrupt == 2
    good = df.filter(df._corrupt_record.isNull())
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
