"""ORC source/sink: the second columnar format Spark ships natively.

No custom wrapper needed — `spark.read.orc` / `df.write.orc` are the
engine surface; these tests pin the contracts that matter at scale:
lossless round trip (incl. nested struct + array columns), predicate
pushdown reaching the ORC scan, and column pruning in the ReadSchema.
"""

from __future__ import annotations

from conftest import SF_TEST
from vector_search_spark.sources.tables import load_table


def test_orc_round_trip_including_nested(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_TEST, "documents").select(
        "doc_id",
        "text",
        F.struct(F.col("lang"), F.col("source")).alias("meta"),
        F.split(F.col("text"), " ").alias("toks"),
    )
    out = str(tmp_path / "docs_orc")
    docs.write.orc(out)
    back = spark.read.orc(out)
    a = sorted((r["doc_id"], r["text"], tuple(r["meta"]), tuple(r["toks"])) for r in docs.collect())
    b = sorted((r["doc_id"], r["text"], tuple(r["meta"]), tuple(r["toks"])) for r in back.collect())
    assert a == b


def test_orc_pushdown_and_pruning(spark, tmp_path):
    import io
    import contextlib

    from pyspark.sql import functions as F

    out = str(tmp_path / "ev_orc")
    load_table(spark, SF_TEST, "events").write.orc(out)
    df = (
        spark.read.orc(out)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "value")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    scan = plan.split("(1) Scan orc")[1].split("(2)")[0]
    assert "event_type" in scan and "PushedFilters" in scan
    read = scan.split("ReadSchema")[1]
    assert "props" not in read and "event_id" not in read
    assert df.count() > 0
