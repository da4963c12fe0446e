"""Streaming sinks: foreachBatch upsert into the parquet index.

``upsert_index_sink`` gives Structured Streaming the reference's
"incremental store" semantics (S2/S7): each micro-batch is appended with
its already-present keys anti-joined away, so replayed batches (at-least-
once delivery) never duplicate rows.  At scale the same shape targets a
transactional table format (Delta/Iceberg MERGE); with plain parquet the
append itself is atomic per file and idempotency comes from the key check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def upsert_index_sink(path: str, key_col: str):
    """Returns a foreachBatch function writing new-key rows to ``path``."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        new = batch.dropDuplicates([key_col])
        if os.path.exists(path):
            existing = spark.read.parquet(path).select(key_col)
            new = new.join(existing, key_col, "left_anti")
        new.write.mode("append").parquet(path)

    return write_batch
