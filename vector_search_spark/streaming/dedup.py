"""Streaming incremental dedup: micro-batches of NEW documents probed
against a STATIC indexed corpus — the nightly-crawl dedup loop
(`registry_dedup.incremental_ingest_dedup`) as a Structured Streaming
pipeline.

Design: the corpus's shingle / signature / band tables are build-once
artifacts (exactly the session-shared tables the batch family uses; a
persisted partitionBy(band) parquet at production scale).  Each arriving
micro-batch of new docs is shingled and signed with the SAME operators the
batch path uses, its band keys probe the corpus band table (stream-static
equi-join shape), candidates are est-filtered on signature agreement and
verified with exact Jaccard against the corpus shingles, and each new doc
emits its ingest/skip decision.  Because every decision depends only on
(new doc, corpus) — never on other new docs — the result is independent of
micro-batch boundaries, so stream ≡ batch holds for ANY trigger schedule
(asserted in tests/test_streaming_incremental_dedup.py).

foreachBatch is the deliberate engine choice: the per-batch plan is a
multi-join DAG (banding probe + agreement + shingle intersection) that
append-mode streaming aggregation cannot express, and foreachBatch is the
sanctioned escape hatch that keeps exactly-once semantics per batch while
reusing unmodified batch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round4
from ..operators.dedup import (
    minhash_band_table,
    minhash_signatures,
    shingle_table,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def corpus_index(
    docs: DataFrame,
    num_hashes: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The static corpus artifacts a production index stores: (shingles,
    signatures, band table).  Caller persists them once."""
    sh = shingle_table(docs, shingle_n=shingle_n)
    sig = minhash_signatures(docs, num_hashes=num_hashes, shingle_n=shingle_n, shingled=sh)
    banded = minhash_band_table(sig, num_hashes=num_hashes, bands=bands)
    return sh, sig, banded


def batch_decisions(
    new_docs: DataFrame,
    corpus_sh: DataFrame,
    corpus_sig: DataFrame,
    corpus_banded: DataFrame,
    num_hashes: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
    est_floor: float = 0.5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Ingest/skip decisions for one batch of new docs vs the corpus index.

    Probe shape: new band keys equi-join the corpus band table (narrow
    (band, key) rows — never a corpus self-join), then signature-agreement
    est filter, then exact-Jaccard verify restricted to the surviving
    candidates.  Emission contract matches
    `registry_dedup.incremental_ingest_dedup` (NULL-free sentinels,
    argmax-by-jaccard best match, round4 floor)."""
    new_sh = shingle_table(new_docs, shingle_n=shingle_n)
    new_sig = minhash_signatures(
        new_docs, num_hashes=num_hashes, shingle_n=shingle_n, shingled=new_sh
    )
    new_banded = minhash_band_table(new_sig, num_hashes=num_hashes, bands=bands)

    cand = (
        new_banded.select(F.col("doc_id").alias("new_id"), "band", "key")
        .join(
            corpus_banded.select(F.col("doc_id").alias("old_id"), "band", "key"),
            ["band", "key"],
        )
        .select("new_id", "old_id")
        .distinct()
    )
    s_new = new_sig.select(
        F.col("doc_id").alias("new_id"),
        *[F.col(f"h{h}").alias(f"a{h}") for h in range(num_hashes)],
    )
    s_old = corpus_sig.select(
        F.col("doc_id").alias("old_id"),
        *[F.col(f"h{h}").alias(f"b{h}") for h in range(num_hashes)],
    )
    agree = sum(
        F.when(F.col(f"a{h}") == F.col(f"b{h}"), 1).otherwise(0)
        for h in range(num_hashes)
    )
    est_cand = (
        cand.join(s_new, "new_id")
        .join(s_old, "old_id")
        .withColumn("est", (agree / F.lit(float(num_hashes))).cast("double"))
        .filter(F.col("est") >= est_floor)
        .select("new_id", "old_id")
    )

    sizes_new = new_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n1"))
    sizes_old = corpus_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n2"))
    shared = (
        est_cand.join(
            new_sh.select(F.col("doc_id").alias("new_id"), "shingle"), "new_id"
        )
        .join(
            corpus_sh.select(F.col("doc_id").alias("old_id"), "shingle"),
            ["old_id", "shingle"],
        )
        .groupBy("new_id", "old_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    verified = (
        shared.join(sizes_new.withColumnRenamed("doc_id", "new_id"), "new_id")
        .join(sizes_old.withColumnRenamed("doc_id", "old_id"), "old_id")
        .withColumn(
            "jac",
            (F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared"))).cast(
                "double"
            ),
        )
        .filter(F.col("jac") >= jaccard_threshold)
        .select("new_id", "old_id", "jac")
    )

    from pyspark.sql import Window

    w = Window.partitionBy("new_id").orderBy(F.desc("jac"), F.asc("old_id"))
    best = (
        verified.withColumn("__rn", F.row_number().over(w))
        .groupBy("new_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_matches"),
            F.max(F.when(F.col("__rn") == 1, F.col("old_id"))).alias("best_match_id"),
            F.max("jac").alias("best_jac"),
        )
    )
    newkeys = new_docs.select("doc_id")
    return (
        newkeys.join(best, newkeys.doc_id == best.new_id, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_dup_matches"), F.lit(0)).cast("long").alias("n_dup_matches"),
            F.coalesce(F.col("best_match_id"), F.lit(-1)).cast("long").alias("best_match_id"),
            F.when(F.col("new_id").isNull(), F.lit(-1.0))
            .otherwise(round4("best_jac"))
            .alias("best_jaccard"),
            F.when(F.col("new_id").isNull(), F.lit("ingest"))
            .otherwise(F.lit("skip"))
            .alias("decision"),
        )
    )


def streaming_incremental_dedup(
    spark: SparkSession,
    new_docs_dir: str,
    corpus_sh: DataFrame,
    corpus_sig: DataFrame,
    corpus_banded: DataFrame,
    decisions_dir: str,
    max_files_per_trigger: int = 1,
    **kwargs,
):
    """Drain a directory of new-doc parquet files as micro-batches
    (availableNow + maxFilesPerTrigger), deciding each batch against the
    static corpus index via ``batch_decisions`` and APPENDING each batch's
    decision rows (stamped with ``batch_id``) to the ``decisions_dir``
    parquet sink.  Returns after the stream drains.

    This is the production form: decisions flow executor-side into a sink
    partition of the decision log — nothing is ever collected to the
    driver, so a batch of any size costs the driver one job submission.
    foreachBatch still owns the per-batch multi-join plan (see module
    docstring).  foreachBatch is at-least-once: on failure recovery
    Structured Streaming re-runs the batch with the SAME batch_id, so the
    sink write must be idempotent per batch_id or the decision log grows
    duplicate rows.  The write below partitions by batch_id with dynamic
    partition overwrite — a replayed batch REPLACES its own partition and
    touches no other, which upgrades the end-to-end contract to
    effectively-exactly-once."""
    # Layout guard (ADVICE r6): this sink is hive-partitioned by batch_id.
    # A decisions_dir carrying FLAT parquet files at its root (the pre-r6
    # append layout, batch_id as a data column) would yield a mixed layout
    # that breaks partition discovery on read, and dynamic overwrite would
    # never clean the old rows — fail loudly before the first write, like
    # the events_ts_is_nanos error this mirrors.
    import os as _os

    if _os.path.isdir(decisions_dir):
        flat = [
            f for f in _os.listdir(decisions_dir)
            if f.endswith(".parquet") and _os.path.isfile(_os.path.join(decisions_dir, f))
        ]
        if flat:
            raise ValueError(
                f"decisions_dir {decisions_dir!r} holds {len(flat)} flat parquet "
                "file(s) at its root (old unpartitioned layout); this sink writes "
                "batch_id=N/ hive partitions and mixing the two breaks partition "
                "discovery. Point at a fresh directory or migrate the old log."
            )
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(new_docs_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            batch_decisions(batch_df, corpus_sh, corpus_sig, corpus_banded, **kwargs)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(decisions_dir)
        )

    q = (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .option("checkpointLocation", new_docs_dir + "/_chk")
        .start()
    )
    q.awaitTermination()
