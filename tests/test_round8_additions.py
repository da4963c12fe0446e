"""Round-8 additions: the bench checksum-consumption contract, composite
HLL keys, and the cipher-distinctness guard interactions that the r8
campaign rides on."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_spark import registry


def test_checksum_frame_counts_and_is_partitioning_invariant(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.sha1(F.col("id").cast("string")).alias("s")
    )
    r1 = registry.checksum_frame(df.repartition(13)).first()
    r2 = registry.checksum_frame(df.repartition(2)).first()
    assert r1["n"] == 1000 and r2["n"] == 1000
    # bit_xor fold is order-free: same multiset -> same checksum under any
    # partitioning
    assert r1["checksum"] == r2["checksum"]
    assert r1["checksum_sum"] == r2["checksum_sum"]


def test_checksum_frame_multiplicity_sensitive(spark):
    # ADVICE r8: bit_xor cancels even-multiplicity rows — [A,A,X] and
    # [B,B,X] xor to hash(X) with equal n.  The decimal-sum fold must
    # separate them.
    base = spark.range(0, 1).select(F.lit("X").alias("v"))
    aa = spark.range(0, 2).select(F.lit("A").alias("v")).union(base)
    bb = spark.range(0, 2).select(F.lit("B").alias("v")).union(base)
    ra = registry.checksum_frame(aa).first()
    rb = registry.checksum_frame(bb).first()
    assert ra["n"] == rb["n"] == 3
    assert ra["checksum"] == rb["checksum"]  # the documented xor blind spot
    assert ra["checksum_sum"] != rb["checksum_sum"]


def test_checksum_frame_sees_every_column(spark):
    # the count()-only smoke trap: a consumption that lets Catalyst prune
    # the projection would return identical checksums here
    a = spark.range(0, 100).select(F.col("id"), F.lit("x").alias("c"))
    b = spark.range(0, 100).select(F.col("id"), F.lit("y").alias("c"))
    ca = registry.checksum_frame(a).first()["checksum"]
    cb = registry.checksum_frame(b).first()["checksum"]
    assert ca != cb


def test_ordered_queries_exist_in_registry():
    missing = registry.ORDERED_QUERIES - set(registry.QUERIES)
    assert not missing, missing


def test_hll_registers_composite_keys_handle_delimiter_values(spark):
    # ADVICE r7: the old concat_ws('|')/split round-trip corrupted on a
    # delimiter-bearing key; composite grouping must not.
    from vector_search_spark.operators.sketches import hll_estimate, hll_registers

    rows = [("a|b", "x", i) for i in range(50)] + [("a", "b|x", i) for i in range(60)]
    df = spark.createDataFrame(rows, "k1 string, k2 string, v long")
    regs = hll_registers(df, ["k1", "k2"], "v")
    est = hll_estimate(regs, ["k1", "k2"]).collect()
    groups = {(r["k1"], r["k2"]): r["hll_raw"] for r in est}
    assert set(groups) == {("a|b", "x"), ("a", "b|x")}
    # both groups draw values from the same 0..59 universe, so estimates
    # must be near their exact distinct counts (HLL error ~2% at p=11)
    assert abs(groups[("a|b", "x")] - 50) < 5
    assert abs(groups[("a", "b|x")] - 60) < 5
