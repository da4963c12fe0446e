"""Approximate nearest neighbor: IVF-bucketed similarity search — the
100 TB scale path for Q1/Q2 (exact brute force stays the correctness
baseline; SURVEY.md §2.4).

IVF (inverted file) layout, all DataFrame ops:
1. **Centroids**: a deterministic hash-sample of the corpus (every
   ``n/n_centroids``-th vector by id hash) — no iterative k-means, so the
   index build is one pass and fully reproducible.
2. **Assign**: every vector → nearest centroid (Arrow-batched numpy argmax
   against the broadcast centroid matrix).  At 100 TB this is the
   partitioning key for the index table: ``write.partitionBy(cell)`` makes
   each query touch only nprobe directories (partition pruning).
3. **Probe**: each query scores the centroids, keeps its top-``nprobe``
   cells, joins the (cell, query) pairs against the assigned index —
   scoring only |corpus| × nprobe / n_centroids rows instead of |corpus|.
4. Exact re-scoring + per-query top-k within the probed cells (same
   narrow-exchange window pattern as operators.knn).

Recall < 1 by construction (a true neighbor may live in an unprobed
cell); tests pin recall@10 ≥ 0.9 vs. the exact oracle at nprobe=4/16.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import dot_product


def ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid pick: the ``n_centroids`` rows with the
    smallest md5(id) — an order-statistics sample (uniform over the corpus
    because the hash is uniform, reproducible because it's a hash).

    ``orderBy().limit()`` compiles to TakeOrderedAndProject (per-partition
    top-k + k-row driver merge) — NOT a global window, which would drag
    the whole corpus into one partition at scale.
    """
    return (
        emb.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        # the global window here numbers only the n_centroids surviving
        # rows (tiny) — not the corpus
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cell"),
            F.col(vec_col).alias("centroid"),
        )
    )


def _assign_cells(
    emb: DataFrame, cent_mat: np.ndarray, id_col: str, vec_col: str, replicas: int = 1
) -> DataFrame:
    """Nearest-centroid assignment; ``replicas > 1`` indexes each vector in
    its top-r cells (IVF replication: r× storage for higher recall —
    valuable when the corpus is weakly clustered)."""

    def assign(batches):
        for pdf in batches:
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            scores = m @ cent_mat.T
            top = np.argsort(-scores, axis=1)[:, :replicas].astype(np.int32)
            ids = np.repeat(pdf[id_col].to_numpy(), replicas)
            yield pd.DataFrame({id_col: ids, "cell": top.ravel()})

    return emb.mapInPandas(assign, schema=f"{id_col} long, cell int")


def kmeans_refine(
    emb: DataFrame,
    cent_mat: np.ndarray,
    id_col: str,
    vec_col: str,
    iterations: int = 5,
) -> np.ndarray:
    """Deterministic Lloyd iterations over the DataFrame (classic Spark
    k-means shape): Arrow-batched argmax assignment, then per-cell mean via
    ``aggregate`` of the vector column (partial-aggregated: the shuffle is
    |cells| × dim, not |corpus|).  Means are re-normalized to the unit
    sphere (spherical k-means — we rank by dot product).  Empty cells keep
    their previous centroid.  No randomness anywhere → reproducible."""
    dim = cent_mat.shape[1]
    for _ in range(iterations):
        assigned = _assign_cells(emb, cent_mat, id_col, vec_col)
        joined = emb.join(assigned, id_col)
        sums = joined.groupBy("cell").agg(
            F.array(*[F.sum(F.element_at(F.col(vec_col), i + 1)) for i in range(dim)]).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        new = cent_mat.copy()
        for r in sums.collect():
            v = np.array(r["s"], dtype=np.float64) / r["n"]
            norm = np.linalg.norm(v)
            if norm > 0:
                new[r["cell"]] = v / norm
        cent_mat = new
    return cent_mat


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    kmeans_iterations: int = 1,
    replicas: int = 2,
) -> DataFrame:
    """Approximate per-query top-k: probe ``nprobe`` of ``n_centroids``
    cells per query, exact scoring inside the probed cells.

    Returns (query_id, id, score, rank) — same contract as
    ``knn.similarity_join`` so callers can swap exact↔ANN.
    """
    cents = ivf_centroids(emb, n_centroids, id_col, vec_col).collect()
    cent_mat = np.array([r["centroid"] for r in cents], dtype=np.float64)
    if kmeans_iterations > 0:
        cent_mat = kmeans_refine(
            emb.select(id_col, vec_col), cent_mat, id_col, vec_col, kmeans_iterations
        )

    assigned = _assign_cells(
        emb.select(id_col, vec_col), cent_mat, id_col, vec_col, replicas=replicas
    )
    indexed = emb.join(assigned, id_col)  # (id, vec, cell) — r rows per id

    # per-query probe list (queries are small: driver-side numpy is fine and
    # keeps the plan free of a second UDF stage)
    qrows = queries.select(query_id_col, query_vec_col).collect()
    qmat = np.array([r[query_vec_col] for r in qrows], dtype=np.float64)
    probe_cells = np.argsort(-(qmat @ cent_mat.T), axis=1)[:, :nprobe]
    probes = [
        (int(r[query_id_col]), list(r[query_vec_col]), int(c))
        for r, cells in zip(qrows, probe_cells)
        for c in cells
    ]
    probes_df = F.broadcast(
        emb.sparkSession.createDataFrame(
            probes, f"query_id long, __qvec array<double>, cell int"
        )
    )

    scored = indexed.join(probes_df, "cell").withColumn(
        "score", dot_product(F.col(vec_col), F.col("__qvec"))
    )
    # replicas can surface the same (query, id) via two probed cells —
    # dedup the narrow pair rows (scores are identical) before ranking
    narrow = scored.select("query_id", F.col(id_col), "score").dropDuplicates(
        ["query_id", id_col]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        narrow.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )
