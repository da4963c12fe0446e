"""Round-11 optimization gates: the plan-shape rewrites must compute the
same values as the shapes they replaced.

- The HOF-loop form of the markov iteration (one aggregate() over an
  array state) is pinned against the unrolled per-round text on a
  synthetic count matrix — the bit-identity claim, tested directly.
- `_hof_once` (the explode-array Generate barrier) must preserve row
  count and values.
- The native `multimodal_features` expression is pinned against the
  mapInPandas operator path it replaced (same md5 stub, two routes).
- `_shared_sa_adjacent` must agree with a fresh LCP walk of the same
  cross-document SA-adjacent pairs.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from conftest import SF_SMOKE  # noqa: E402

from vector_search_spark import registry  # noqa: E402


def test_markov_hof_loop_matches_unrolled(spark):
    from vector_search_spark.registry_ml import (
        _MK_K, _MK_SCALE, _hof_once, _mk_np_hof_expr, _mk_step_exprs,
    )

    # synthetic 5x5 count matrix with a zero-row (r3 = 0) to exercise the
    # self-loop guard branch
    cells = {}
    v = 7
    for i in range(_MK_K):
        for j in range(_MK_K):
            cells[f"c{i}_{j}"] = 0 if i == 3 else (v := (v * 31 + 17) % 400)
    row = spark.createDataFrame(
        [tuple(cells[f"c{i}_{j}"] for i in range(_MK_K) for j in range(_MK_K))],
        ", ".join(f"c{i}_{j} long" for i in range(_MK_K) for j in range(_MK_K)),
    )
    for i in range(_MK_K):
        row = row.withColumn(
            f"r{i}", F.expr(" + ".join(f"c{i}_{j}" for j in range(_MK_K)))
        )

    iters = 9  # deliberately not the production constant
    # unrolled reference: the pre-round-11 shape
    un = row
    for i in range(_MK_K):
        un = un.withColumn(f"p{i}", F.lit(_MK_SCALE // _MK_K).cast("long"))
    for _ in range(iters):
        for name, sql in _mk_step_exprs():
            un = un.withColumn(name, F.expr(sql))
        for i in range(_MK_K):
            un = un.withColumn(f"p{i}", F.col(f"np{i}"))
        un = un.drop(*[f"np{i}" for i in range(_MK_K)])
    expected = un.select(*[f"p{i}" for i in range(_MK_K)]).collect()[0]

    # HOF form: the round-11 shape
    steps = ", ".join(_mk_np_hof_expr(j, "acc") for j in range(_MK_K))
    init = ", ".join(f"CAST({_MK_SCALE // _MK_K} AS BIGINT)" for _ in range(_MK_K))
    hof = _hof_once(
        row,
        "pv",
        f"aggregate(sequence(1, {iters}), array({init}),"
        f" (acc, t) -> array({steps}))",
    )
    got = hof.select(
        *[F.element_at("pv", i + 1).alias(f"p{i}") for i in range(_MK_K)]
    ).collect()[0]
    assert tuple(got) == tuple(expected)


def test_hof_once_preserves_rows_and_values(spark):
    from vector_search_spark.registry_ml import _hof_once

    df = spark.range(0, 100).withColumn("x", F.col("id") * 3)
    out = _hof_once(df, "y", "x * x + 1")
    rows = out.orderBy("id").collect()
    assert len(rows) == 100
    assert all(r["y"] == r["x"] * r["x"] + 1 for r in rows)


def test_multimodal_features_native_matches_operator_path(spark):
    from vector_search_spark.functions.scalar import round4
    from vector_search_spark.operators.multimodal import (
        attach_binary_payload, decode_image_features,
    )
    from vector_search_spark.sources.tables import load_table

    native = [
        tuple(r)
        for r in registry.QUERIES["multimodal_features"](spark, SF_SMOKE).collect()
    ]
    docs = load_table(spark, SF_SMOKE, "documents")
    feats = decode_image_features(attach_binary_payload(docs))
    op = [
        tuple(r)
        for r in feats.select(
            "doc_id", "mime", "n_bytes", "width", "height",
            F.posexplode("features").alias("feat_idx", "feat_value"),
        )
        .select(
            "doc_id", "mime", "n_bytes", "width", "height", "feat_idx",
            round4("feat_value").alias("feat_value"),
        )
        .orderBy("doc_id", "feat_idx")
        .collect()
    ]
    assert native == op


def test_shared_sa_adjacent_matches_fresh_walk(spark):
    from vector_search_spark.operators.suffix import lcp_walk
    from vector_search_spark.partitioning import global_order_stats
    from vector_search_spark.registry_suffix import (
        _SA_LEVELS, _shared_sa_adjacent, _shared_suffix,
    )

    shared = [
        tuple(r)
        for r in _shared_sa_adjacent(spark, SF_SMOKE)
        .select("doc_i", "i", "doc_j", "j", "lcp")
        .orderBy("doc_i", "i", "doc_j", "j")
        .collect()
    ]
    tok, ranks = _shared_suffix(spark, SF_SMOKE)
    top = ranks[_SA_LEVELS]
    sa = global_order_stats(top, ["r", "doc_id", "pos"]).select(
        "doc_id", "pos", F.col("__rank").alias("sa_r")
    )
    nxt = sa.select(
        (F.col("sa_r") - 1).alias("sa_r"),
        F.col("doc_id").alias("doc_j"),
        F.col("pos").alias("j"),
    )
    pairs = (
        sa.select("sa_r", F.col("doc_id").alias("doc_i"), F.col("pos").alias("i"))
        .join(nxt, "sa_r")
        .filter(F.col("doc_i") != F.col("doc_j"))
        .select("doc_i", "i", "doc_j", "j")
    )
    fresh = [
        tuple(r)
        for r in lcp_walk(pairs, ranks, _SA_LEVELS)
        .filter(F.col("lcp") >= 2)
        .select("doc_i", "i", "doc_j", "j", "lcp")
        .orderBy("doc_i", "i", "doc_j", "j")
        .collect()
    ]
    assert shared == fresh
