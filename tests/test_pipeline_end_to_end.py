"""End-to-end pipeline composition: the operators are a LIBRARY, and this
is the integration proof — a training-data preparation pipeline built by
chaining them, exercising source → QC → dedup → packing → maintained sink
as one lazy program with checks at each stage boundary.

JSONL ingest (with quarantine) → quality filter → exact dedup →
near-dup cascade keep → token-window chunking → range-clustered parquet.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_TEST
from vector_search_spark.operators.dedup import drop_exact_dups
from vector_search_spark.plans.maintenance import clustered_rewrite
from vector_search_spark.sources.jsonl import read_jsonl, write_jsonl
from vector_search_spark.sources.tables import load_table

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_training_data_pipeline_composes(spark, tmp_path):
    docs = load_table(spark, SF_TEST, "documents")
    n_docs = docs.count()

    # 1. export + re-ingest through the JSONL interchange boundary
    jsonl_dir = str(tmp_path / "export")
    write_jsonl(docs, jsonl_dir, coalesce=4)
    ingested = read_jsonl(spark, jsonl_dir, DOC_SCHEMA, keep_corrupt=True)
    from vector_search_spark.sources.jsonl import corrupt_row_stats

    qc = corrupt_row_stats(ingested).collect()[0]
    assert (qc.n_lines, qc.n_corrupt) == (n_docs, 0)
    ingested = ingested.drop("_corrupt_record")
    assert ingested.count() == n_docs

    # 2. quality gate: non-empty, bounded length (C4-style hard filters)
    filtered = ingested.filter(
        (F.trim(F.col("text")) != "") & (F.col("n_chars") <= 10000)
    )
    n_filtered = filtered.count()
    assert 0 < n_filtered <= n_docs

    # 3. exact dedup, then the cheap LSH near-dup keep-set restriction
    exact_kept = drop_exact_dups(filtered)
    from vector_search_spark.registry import QUERIES

    keep_ids = QUERIES["dedup_cascade_keep"](spark, SF_TEST).withColumnRenamed(
        "doc_id", "keep_id"
    )
    kept = exact_kept.join(
        keep_ids, exact_kept.doc_id == keep_ids.keep_id, "left_semi"
    )
    n_kept = kept.count()
    assert 0 < n_kept <= n_filtered

    # 4. pack into 128-token windows with 16 overlap (training chunks)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    with_len = kept.select("doc_id", "text", F.size(toks).alias("n_tok"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_tok") - F.lit(1), F.lit(0)),
        F.lit(128 - 16),
    )
    chunks = with_len.select(
        "doc_id", F.explode(starts).alias("start"), "n_tok"
    ).select(
        "doc_id",
        "start",
        F.least(F.col("start") + 128, F.col("n_tok")).alias("end"),
    )
    assert chunks.filter(F.col("end") <= F.col("start")).count() == 0
    # every kept doc produced at least one chunk
    assert chunks.select("doc_id").distinct().count() == n_kept

    # 5. clustered write: the serving/index layout
    out = str(tmp_path / "train_chunks")
    clustered_rewrite(chunks, out, "doc_id", num_files=3)
    back = spark.read.parquet(out)
    assert back.count() == chunks.count()
    # the dominant filter column prunes: per-file doc_id ranges are tight
    import os

    files = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(files) == 3
