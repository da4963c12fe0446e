"""CSV/TSV source/sink: round trip with quoting, corrupt-row quarantine."""

from __future__ import annotations

from conftest import SF_TEST
from vector_search_spark.sources.delimited import read_delimited, write_delimited
from vector_search_spark.sources.jsonl import corrupt_row_stats
from vector_search_spark.sources.tables import load_table

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_csv_round_trip_with_quoting(spark, tmp_path):
    docs = load_table(spark, SF_TEST, "documents")
    # inject delimiter/quote hazards into the free-text column first
    hazards = docs.limit(3).selectExpr(
        "doc_id + 100000 AS doc_id",
        "concat(text, ', with \"quotes\", and commas') AS text",
        "lang", "source", "n_chars",
    )
    both = docs.unionAll(hazards)
    out = str(tmp_path / "docs_csv")
    write_delimited(both, out, coalesce=2)
    back = read_delimited(spark, out, DOC_SCHEMA, keep_corrupt=False)
    a = sorted(map(tuple, both.collect()))
    b = sorted(map(tuple, back.select(*both.columns).collect()))
    assert a == b


def test_csv_corrupt_rows_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,ok,en,a,2\n"
        "not-a-number,broken,en,a,xx\n"
        "2,also ok,de,b,7\n"
    )
    df = read_delimited(spark, str(p), DOC_SCHEMA)
    stats = corrupt_row_stats(df).collect()[0]
    assert stats.n_lines == 3
    assert stats.n_corrupt == 1
    good = df.filter(df._corrupt_record.isNull())
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
