"""Compaction / clustered rewrite: row fidelity, file counts, clustering."""

from __future__ import annotations

import os

from conftest import SF_TEST
from vector_search_spark.plans.maintenance import clustered_rewrite, compact_parquet
from vector_search_spark.sources.tables import load_table


def _data_files(path: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    ]


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    docs = load_table(spark, SF_TEST, "documents")
    docs.repartition(16).write.parquet(src)
    assert len(_data_files(src)) == 16
    compact_parquet(spark, src, dst, target_files=2)
    assert len(_data_files(dst)) <= 2
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).select(*docs.columns).collect()))
    assert a == b


def test_clustered_rewrite_sorts_within_files_and_ranges_across(spark, tmp_path):
    dst = str(tmp_path / "clustered")
    docs = load_table(spark, SF_TEST, "documents")
    clustered_rewrite(docs.repartition(8), dst, "doc_id", num_files=4)
    files = _data_files(dst)
    assert len(files) == 4
    ranges = []
    for f in files:
        ids = [r.doc_id for r in spark.read.parquet(f).select("doc_id").collect()]
        assert ids == sorted(ids), "rows not sorted within file"
        ranges.append((min(ids), max(ids)))
    # contiguous, non-overlapping ranges across files (range partitioning)
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo, f"overlapping clustered ranges: {ranges}"
    # and the rewrite is lossless
    total = sum(spark.read.parquet(f).count() for f in files)
    assert total == docs.count()
