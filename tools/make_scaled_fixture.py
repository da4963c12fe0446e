"""Build a deterministic N× scaled fixture from an existing testdata dir.

Usage:
    python tools/make_scaled_fixture.py [--base /root/testdata/sf0.1] \
        [--out /root/repo/.scale/sf1] [--copies 10]

The driver ships sf{0.001,0.01,0.1} only; the 100 TB story needs at least
one MEASURED decade of scaling (VERDICT r4 next-round #1).  This tool
derives an sf1-equivalent instance from sf0.1 by key-offset replication —
it never touches /root/testdata and the output lives under the repo's
gitignored .scale/ dir.

Replication design (replica r = 0..copies-1, offset = r * 10_000_000):

- region / nation: dimensions, copied once (FKs from replicated facts
  still resolve).
- customer / supplier / part / orders / lineitem / events: every key and
  foreign key gets the replica offset, so each replica is a disjoint but
  fully joinable copy of the base instance (lineitem->orders->customer
  and lineitem->part/supplier joins hit exactly one replica's rows).
- documents.text: per-replica Caesar substitution over [a-zA-Z].  A char
  bijection preserves every WITHIN-replica relationship exactly (exact-dup
  groups, shingle equality, n-gram Jaccard, token counts) while destroying
  CROSS-replica shingle overlap — naive row duplication would give every
  doc 9 identical twins and near-dup candidate pairs would grow
  quadratically in the replica count, which measures the fixture, not the
  engine.  n_chars is unchanged (bijection).
- embeddings.embedding: per-replica circular shift of the vector.  A
  coordinate permutation preserves norms and all within-replica angles
  exactly; cross-replica cosine similarity collapses to the random-vector
  baseline, for the same reason as the text cipher.
- timestamps are never shifted: a day at sf1 holds copies× the rows of the
  same day at the base sf, which is exactly how a denser corpus scales.

Everything is a pure column expression — one Spark job per table, no
Python row path.
"""

from __future__ import annotations

import argparse
import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

OFFSET = 10_000_000

# (key columns to offset) per table; dimensions are copied once.
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def _caesar_cols(r: int):
    """Per-replica AFFINE cipher x -> a*x + b (mod 26), a coprime to 26:
    312 distinct bijections, so no two replicas share the cipher up to 312
    copies.  (A plain Caesar shift has period 26 — at copies > 26 replica
    pairs 26 apart would carry IDENTICAL text, planting the cross-replica
    duplicates this fixture exists to avoid.)  r = 0 is the identity."""
    lo = string.ascii_lowercase
    up = string.ascii_uppercase
    coprime = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
    a, b = coprime[(r // 26) % 12], r % 26
    perm = [(a * i + b) % 26 for i in range(26)]
    return lo + up, "".join(lo[p] for p in perm) + "".join(up[p] for p in perm)


def replicate(df, table: str, r: int):
    out = df
    for c in KEYED[table]:
        out = out.withColumn(c, (F.col(c) + F.lit(r * OFFSET)).cast(df.schema[c].dataType))
    if table == "documents" and r > 0:
        src, dst = _caesar_cols(r)
        out = out.withColumn("text", F.translate(F.col("text"), src, dst))
    if table == "embeddings" and r > 0:
        # rotation by r mod dim, composed with a global sign flip every
        # full rotation cycle: rotation alone has period dim (64), so at
        # copies > 64 replica pairs 64 apart would carry IDENTICAL vectors;
        # negation is orthogonal (within-replica angles exact) and makes
        # the colliding pairs anti-podal (cosine -1) instead of twins.
        # slice() with r >= dim errors outright (negative length).
        k = f"pmod({r}, size(embedding))"
        rot = (
            f"concat(slice(embedding, {k} + 1, size(embedding) - {k}),"
            f" slice(embedding, 1, {k}))"
        )
        sign = -1.0 if (r // 64) % 2 else 1.0
        out = out.withColumn(
            "embedding",
            F.expr(
                rot if sign > 0 else f"transform({rot}, x -> -x)"
            ),
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"))
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from vector_search_spark.session import get_spark

    spark = get_spark("make-scaled-fixture", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    for t in DIMS:
        df = spark.read.parquet(f"{args.base}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")
        print(f"{t}: copied once ({df.count()} rows)")

    for t in KEYED:
        base = spark.read.parquet(f"{args.base}/{t}.parquet")
        scaled = replicate(base, t, 0)
        for r in range(1, args.copies):
            scaled = scaled.unionByName(replicate(base, t, r))
        scaled.write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")
        n = spark.read.parquet(f"{args.out}/{t}.parquet").count()
        print(f"{t}: {n} rows ({args.copies}x)")


if __name__ == "__main__":
    main()
