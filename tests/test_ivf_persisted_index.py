"""The IVF "partitionBy(cell) at scale" claim, exercised for real
(VERDICT r7 #6): write the index hive-partitioned by cell, read it back,
and assert (a) the probe query's FileSourceScan actually PRUNES to the
probed cells — PartitionFilters in the plan AND only probed-cell
directories among the input files — and (b) the persisted-index results
are row-identical to the in-session index's.

Same pattern as the S5 ingest pruning probe (tests/test_ingest.py), now
on the ANN surface where pruning is the whole scale story: at 100 TB a
16-cell 4-probe query must read ~1/4 of the index bytes, not all of them.
"""

from __future__ import annotations

import contextlib
import io
import re

from conftest import SF_TEST

from vector_search_spark.operators.ann import (
    ivf_build,
    ivf_query,
    ivf_read_index,
    ivf_write_index,
)

# 2 queries x 2 probes bound the touched cells at 4 of 16 — on the
# isotropic fixture 5x4 probes covered ALL cells and pruning was invisible
N_CENTROIDS = 16
NPROBE = 2
N_QUERIES = 2


def _queries(spark, emb):
    from pyspark.sql import functions as F

    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_persisted_index_prunes_and_matches(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_TEST}/embeddings.parquet")
    cent_mat, indexed = ivf_build(emb, n_centroids=N_CENTROIDS)
    queries = _queries(spark, emb)

    in_session = ivf_query(indexed, cent_mat, queries, k=10, nprobe=NPROBE)
    expect = sorted(tuple(r) for r in in_session.collect())

    path = str(tmp_path / "ivf_index")
    ivf_write_index(indexed, path)
    persisted = ivf_read_index(spark, path)
    result_df = ivf_query(persisted, cent_mat, queries, k=10, nprobe=NPROBE)

    # (b) parity first: persisted index ≡ in-session index, row for row
    got = sorted(tuple(r) for r in result_df.collect())
    assert got == expect and len(got) == N_QUERIES * 10

    # (a) pruning: the scan must carry a PartitionFilters entry on cell...
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        result_df.explain("formatted")
    plan = buf.getvalue()
    scan_chunks = [
        c for c in plan.split("\n\n") if "Scan parquet" in c and "ivf_index" in c
    ]
    assert scan_chunks, plan
    assert any(
        re.search(r"PartitionFilters: \[.*cell", c) for c in scan_chunks
    ), scan_chunks

    # ...and the files actually READ are only the probed cells' directories.
    # inputFiles() ignores pushed filters (it lists the whole FileIndex),
    # so prove it with input_file_name() over the SAME static cell filter
    # ivf_query applies — that reflects the files the executed scan opened.
    import numpy as np
    from pyspark.sql import functions as F

    qrows = queries.collect()
    qmat = np.array([r["query_vec"] for r in qrows], dtype=np.float64)
    cells_used = sorted(
        {int(c) for c in np.argsort(-(qmat @ cent_mat.T), axis=1)[:, :NPROBE].ravel()}
    )
    read_files = {
        r[0]
        for r in persisted.filter(F.col("cell").isin(cells_used))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    read_cells = {int(re.search(r"cell=(\d+)", f).group(1)) for f in read_files}
    all_cells = {
        int(re.search(r"cell=(\d+)", f).group(1)) for f in persisted.inputFiles()
    }
    assert read_cells == set(cells_used), (sorted(read_cells), cells_used)
    # 2 queries x 2 probes touch at most 4 of 16 cells — a strict subset.
    assert read_cells < all_cells, (sorted(read_cells), sorted(all_cells))
