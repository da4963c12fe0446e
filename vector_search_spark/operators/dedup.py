"""Deduplication operators for LLM training-data pipelines (north-star,
SURVEY.md §2.6 / BASELINE.json).

Not in the reference (single-corpus RAG system); designed here as
first-class 100 TB operators:

- **exact**: content fingerprint (md5 of normalized text) + group-keep-min.
  One shuffle on a 16-byte key; at 100 TB this is the cheap first stage of
  a cascade and prunes before anything expensive runs.
- **MinHash + LSH**: shingle → H md5-derived min-hashes → band buckets →
  bucket self-join for candidates → exact-Jaccard verification on the
  candidates only.  Never materializes the O(n²) pair space; all hashing
  is md5-based Catalyst expressions so the DuckDB oracle reproduces bits.
- **SimHash**: 60-bit signature over shingle features, one groupBy with
  60 partial-aggregable bit sums (map-side combine bounds the shuffle at
  one row per doc), pairs by Hamming distance.
- **n-gram Jaccard**: exact pairwise Jaccard via shingle-equijoin —
  correct but quadratic in shared-shingle frequency; intended as the
  verify stage after LSH at scale (``neardup_cascade``).
- **embedding cosine**: nearest-pair mining over the vector column.

Determinism: every hash is md5-derived (never Spark's murmur ``hash``)
so results are identical across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_fingerprint, word_shingles


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct (normalized) text: fingerprint, keeper id
    (min id), duplicate count.  Single hash-shuffle on the fingerprint."""
    return (
        df.select(F.col(id_col), md5_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def drop_exact_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per fingerprint (deterministic, unlike
    dropDuplicates which keeps an arbitrary row)."""
    keepers = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
MINHASH_PRIME = 4294967311  # smallest prime > 2^32


def _md5_hash64(s: Column, seed: int | Column, hex_chars: int = 8) -> Column:
    """Deterministic md5-derived hash (hex_chars*4 bits) — portable across
    engines.  8 hex chars → 32-bit range; 15 → 60-bit (safe in BIGINT)."""
    seed_c = F.lit(str(seed)) if isinstance(seed, int) else seed
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", seed_c, s)), 1, hex_chars), 16, 10
    ).cast("long")


def shingle_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) rows — the shared input of the whole dedup
    family; compute once and cache when running a cascade.

    The id-hash repartition is UNCONDITIONAL and placed BEFORE the
    shingling expression (round 11, VERDICT r10 #6 — setup-builder
    profile).  Three jobs in one exchange: (a) the interpreted
    higher-order-function shingling chain (split → transform/slice →
    concat_ws, the most expensive narrow stage in the family) spreads
    over all cores even for a single-file scan; (b) the exchange carries
    compact PRE-explode documents (~6× less volume than the exploded
    shingle rows the old `.distinct()` exchange moved at the 1000×
    fixture); (c) HashPartitioning(id) satisfies the clustered
    distribution of BOTH the (id, shingle) distinct and every downstream
    per-doc aggregation (simhash's 60-bit votes, minhash's 16 mins), so
    the whole shingle→signature chain runs exchange-free after this one
    shuffle — the old shape paid a second exchange whose per-partition
    partial aggregates spanned nearly every doc (the r10 1000×
    simhash_sigs 159.6 s profile entry).  Explode preserves the child's
    partitioning, so the guarantee survives the generate."""
    return (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(F.col(id_col))
        .select(F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(id, h0..h{H-1}): H min-hashes over distinct word n-gram shingles.

    One explode + one groupBy with H partial-aggregable ``min`` columns —
    map-side combine collapses each partition to one row per doc before the
    shuffle, so shuffle volume is |docs| × H longs regardless of text size.
    """
    if shingled is None:
        shingled = shingle_table(df, id_col, text_col, shingle_n)
    # One md5 per shingle; the H functions come from the 2-universal family
    # h_i = (h1 + i*h2) mod p  (h1/h2 = two 32-bit halves of the md5).
    md5c = F.md5(F.col("shingle"))
    h1 = F.conv(F.substring(md5c, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5c, 9, 8), 16, 10).cast("long")
    hashed = shingled.select(
        F.col(id_col), h1.alias("__h1"), h2.alias("__h2")
    )
    aggs = [
        F.min((F.col("__h1") + F.lit(h) * F.col("__h2")) % F.lit(MINHASH_PRIME)).alias(f"h{h}")
        for h in range(num_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_band_table(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Long-form band-bucket table ``(id, band, key)`` from a minhash
    signature table: one md5 band key per (doc, band), via a single
    array-of-structs explode (no per-band union).  This is the probe-able
    LSH index artifact — a new batch's band table equi-joins it on
    (band, key) to find candidates against an existing corpus without
    re-pairing the corpus (the incremental/streaming dedup shape)."""
    rows_per_band = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        F.lit(b),
                        *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                    )
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
    min_est_jaccard: float = 0.5,
    shingled: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, scored by signature agreement.

    Signatures are split into ``bands`` bands of ``num_hashes/bands`` rows;
    a pair is a candidate iff some band matches exactly (classic MMDS
    banding).  Estimated Jaccard = fraction of agreeing minhash components.
    Returns (id_1, id_2, est_jaccard) with id_1 < id_2.

    Pass ``signatures`` (a persisted ``minhash_signatures`` output) to share
    the signature build across queries — the registry does this so the LSH
    and cascade entries don't each recompute it.
    """
    assert num_hashes % bands == 0
    if signatures is not None:
        sig = signatures  # caller-persisted
    else:
        sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, shingled).cache()
        sig.count()  # materialize: three downstream branches read it; an
        # unmaterialized cache can be recomputed by parallel branches

    # Long-form banding: one explode + ONE self-join on (band, key) — not a
    # union of per-band joins (4× the stages and scans at scale).
    banded = minhash_band_table(sig, id_col, num_hashes, bands)
    left = banded.select(F.col(id_col).alias("id_1"), "band", "key")
    right = banded.select(F.col(id_col).alias("id_2"), "band", "key")
    cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )

    s1 = sig.select(F.col(id_col).alias("id_1"), *[F.col(f"h{h}").alias(f"a{h}") for h in range(num_hashes)])
    s2 = sig.select(F.col(id_col).alias("id_2"), *[F.col(f"h{h}").alias(f"b{h}") for h in range(num_hashes)])
    agree = sum(
        F.when(F.col(f"a{h}") == F.col(f"b{h}"), 1).otherwise(0) for h in range(num_hashes)
    )
    return (
        cand.join(s1, "id_1")
        .join(s2, "id_2")
        .withColumn("est_jaccard", (agree / F.lit(float(num_hashes))).cast("double"))
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("id_1", "id_2", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (verification stage)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    candidates: DataFrame | None = None,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct word n-gram shingle sets.

    Without ``candidates``: pairs that share ≥1 shingle (shingle equijoin —
    the shuffle key is the shingle, so frequent shingles dominate cost; at
    100 TB pass LSH candidates instead).  With ``candidates`` (id_1, id_2):
    computes exact Jaccard only for those pairs.
    Returns (id_1, id_2, jaccard) with id_1 < id_2, jaccard ≥ threshold.
    """
    sh = (
        shingled.select(F.col(id_col).alias("id"), "shingle")
        if shingled is not None
        else shingle_table(df, id_col, text_col, n).select(F.col(id_col).alias("id"), "shingle")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))

    a = sh.select(F.col("id").alias("id_1"), "shingle")
    b = sh.select(F.col("id").alias("id_2"), "shingle")
    if candidates is not None:
        # cascade shape: start FROM the candidate pairs so the shingle
        # intersection is only computed for |cand| pairs — aggregating the
        # full shared-shingle pair space first would defeat the LSH prune
        shared = (
            candidates.select("id_1", "id_2")
            .join(a, "id_1")
            .join(b, ["id_2", "shingle"])
            .groupBy("id_1", "id_2")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
    else:
        shared = (
            a.join(b, "shingle")
            .filter(F.col("id_1") < F.col("id_2"))
            .groupBy("id_1", "id_2")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
    out = (
        shared.join(sizes.withColumnRenamed("id", "id_1").withColumnRenamed("n_sh", "n1"), "id_1")
        .join(sizes.withColumnRenamed("id", "id_2").withColumnRenamed("n_sh", "n2"), "id_2")
        .withColumn(
            "jaccard",
            (F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared"))).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )
    return out


def neardup_cascade(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
    jaccard_threshold: float = 0.8,
    shingled: DataFrame | None = None,
    signatures: DataFrame | None = None,
    est_floor: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """The scale path: LSH candidates → exact Jaccard verify (never O(n²)).

    ``candidates``: a precomputed ``minhash_lsh_pairs`` output (id_1, id_2,
    est_jaccard) built with ``min_est_jaccard=0.0`` — the registry shares
    one persisted candidate table across the whole LSH family; the
    ``est_floor`` filter is applied here either way.

    ``est_floor`` prefilters candidates by minhash signature agreement
    before the (much costlier) exact-Jaccard verify: a banded false
    positive usually agrees on few components, so a floor well below the
    verify threshold (0.5 vs 0.8 here) cuts verify input several-fold while
    keeping every plausible pair.  The floor is part of the operator's
    declared semantics — the DuckDB oracle applies the identical filter, so
    results stay bit-exact (a true pair with freak-low signature agreement
    is dropped by BOTH engines).
    """
    if shingled is None:
        shingled = shingle_table(df, id_col, text_col, shingle_n).cache()
        shingled.count()  # shared by LSH and the verify stage — compute once
    if candidates is not None:
        cand = candidates.filter(F.col("est_jaccard") >= est_floor)
    else:
        cand = minhash_lsh_pairs(
            df, id_col, text_col, num_hashes, shingle_n, bands,
            min_est_jaccard=est_floor, shingled=shingled, signatures=signatures,
        )
    return ngram_jaccard_pairs(
        df, id_col, text_col, shingle_n, jaccard_threshold,
        candidates=cand, shingled=shingled,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
SIMHASH_BITS = 60  # 15 md5 hex chars; stays positive in a signed 64-bit long


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(id, simhash): 60-bit SimHash over distinct word n-gram shingles.

    Shingle features (not unigrams): unigram sets from a shared vocabulary
    collide badly; shingles carry word order, matching the MinHash unit.
    Per-bit majority vote expressed as 60 partial-aggregable SUMs in one
    groupBy — map-side combine keeps the shuffle at |docs| rows.
    """
    if shingled is None:
        shingled = shingle_table(df, id_col, text_col, shingle_n)
    feats = shingled.withColumn("th", _md5_hash64(F.col("shingle"), 0, hex_chars=15))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = feats.groupBy(id_col).agg(*bit_sums)
    sim = sum(
        F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(SIMHASH_BITS)
    )
    return sums.select(F.col(id_col), sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    shingle_n: int = 3,
    shingled: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming, (id_1 < id_2, hamming).

    Pigeonhole bucketing (never all-pairs): the 60-bit signature is split
    into ``max_hamming + 1`` bit segments; a pair within Hamming ≤
    max_hamming differs in at most max_hamming segments, so at least one
    segment matches EXACTLY.  Candidates come from ONE equi-join on
    (segment_idx, segment_value) — a hash shuffle on narrow keys — then the
    exact Hamming check removes false positives.  Zero false negatives by
    the pigeonhole principle ⇒ output is identical to an all-pairs scan,
    and the DuckDB oracle can stay the straightforward all-pairs SQL.

    At 100 TB the shuffle is |docs| × n_seg rows of (int, long); skew only
    appears if a segment value is shared by a huge near-dup cluster, which
    AQE skew-join handles.
    """
    if signatures is not None:
        sig = signatures  # caller-persisted (registry shares it across queries)
    else:
        # cache + materialize: both join sides reference the signature table.
        sig = simhash(df, id_col, text_col, shingle_n, shingled=shingled).cache()
        sig.count()

    n_seg = max_hamming + 1
    base, extra = divmod(SIMHASH_BITS, n_seg)
    seg_structs, offset = [], 0
    for s in range(n_seg):
        ln = base + (1 if s < extra else 0)
        seg_structs.append(
            F.struct(
                F.lit(s).alias("seg"),
                F.shiftright(F.col("simhash"), offset)
                .bitwiseAND(F.lit((1 << ln) - 1))
                .alias("val"),
            )
        )
        offset += ln

    segd = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*seg_structs)).alias("sv")
    ).select(id_col, "simhash", F.col("sv.seg").alias("seg"), F.col("sv.val").alias("val"))
    a = segd.select(F.col(id_col).alias("id_1"), F.col("simhash").alias("sh1"), "seg", "val")
    b = segd.select(F.col(id_col).alias("id_2"), F.col("simhash").alias("sh2"), "seg", "val")
    return (
        a.join(b, ["seg", "val"])
        .filter(F.col("id_1") < F.col("id_2"))
        .withColumn("hamming", F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_1", "id_2", "hamming")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------
def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top_m: int = 50,
    n_buckets: int | None = None,
) -> DataFrame:
    """Top-m most-similar vector pairs by dot product (unit vectors ⇒ cosine).

    EXACT distributed all-pairs via block-pair sharding — the corpus is
    never collected to the driver and no full matrix is broadcast:

    1. **Blocking**: each vector hashes (md5, deterministic) into one of
       ``n_buckets`` buckets and is replicated to the ``n_buckets`` blocks
       ``(min(u,v), max(u,v))`` it participates in; every ordered pair
       (id_1 < id_2) lands in EXACTLY one block, so per-block top-m union ⊇
       global top-m with no geometric assumptions (unlike IVF-cell
       blocking, which misses boundary pairs on unclustered data).
    2. **Per-block top pairs** via ``groupBy(b1,b2).applyInPandas``: each
       block BLAS-multiplies its two buckets and keeps its local top-(2m)
       ordered pairs — executor memory is bounded by 2·|corpus|/n_buckets
       vectors (scale ``n_buckets`` ∝ corpus size; shuffle volume is
       |corpus| × n_buckets narrow rows).
    3. **Exact rescore** of the candidate pairs with the deterministic
       sequential ``dot_product`` fold, so final values and ordering are
       bit-identical to the DuckDB oracle (BLAS changes summation order;
       the fold decides).
    """
    import numpy as np
    import pandas as pd

    from ..functions.vector import dot_product

    if n_buckets is None:
        # Adaptive blocking (the "scale n_buckets ∝ corpus size" rule above,
        # now enforced instead of advised): target ≤ ~2,000 vectors per
        # bucket so a block's BLAS product tops out near (2·2,000)² doubles
        # ≈ 128 MB per task.  The round-6 100× run OOM-killed a 96 GB JVM
        # here with the old FIXED 8 buckets (two 25k-vector buckets → a
        # 20 GB score matrix per task).  Bucket count does not affect the
        # RESULT — the (min,max)-block pigeonhole covers every pair for any
        # n_buckets — only the per-task working set (invariance-suite
        # covered).  One count() job prices the corpus; it runs once at
        # build time, like an index-build statistic.  NOTE (cost): the
        # count() eagerly scans the input lineage — callers holding an
        # expensive unmaterialized frame should persist/checkpoint it
        # first or pass an explicit n_buckets, else the corpus is scanned
        # twice (once to price buckets, once to score).
        #
        # CAP CEILING (ADVICE r6): the 256-bucket cap re-admits quadratic
        # per-task growth past ~512k vectors (bucket population n/256
        # exceeds the 2,000 target, and replication volume n×n_buckets
        # rows is the competing cost that motivates the cap).  This
        # operator is the EXACT all-pairs reference — O(n²/B) total work
        # by construction — so past ~512k vectors the honest move is the
        # LSH paths (dedup_embedding_srp scales indefinitely); the cap
        # marks where exact-all-pairs stops being the right tool, it
        # doesn't try to hide it.
        n = emb.count()
        n_buckets = min(256, max(8, -(-n // 2000)))
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % n_buckets
    ).cast("int")
    blocks = F.array(
        *[
            F.struct(
                F.least(F.col("__bk"), F.lit(v)).alias("b1"),
                F.greatest(F.col("__bk"), F.lit(v)).alias("b2"),
            )
            for v in range(n_buckets)
        ]
    )
    replicated = (
        emb.select(F.col(id_col), F.col(vec_col), bucket.alias("__bk"))
        .select(id_col, vec_col, "__bk", F.explode(blocks).alias("__blk"))
        .select(
            id_col, vec_col, "__bk",
            F.col("__blk.b1").alias("b1"), F.col("__blk.b2").alias("b2"),
        )
    )
    k_local = 2 * top_m

    def block_pairs(key, pdf):  # (key, pdf) grouped-map form; hints omitted
        # so PySpark infers the eval type from arity, not annotations
        if len(pdf) < 2:
            return pd.DataFrame({"id_1": [], "id_2": []}, dtype=np.int64)
        b1, b2 = key
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        bks = pdf["__bk"].to_numpy(dtype=np.int64)
        m = np.array(list(pdf[vec_col]), dtype=np.float64)
        scores = m @ m.T
        # ordered pairs only; cross-bucket blocks own ONLY their
        # cross-bucket pairs (same-bucket pairs belong to the (u,u) block)
        mask = ids[:, None] < ids[None, :]
        if b1 != b2:
            mask &= bks[:, None] != bks[None, :]
        scores = np.where(mask, scores, -np.inf)
        flat = scores.ravel()
        n_keep = min(k_local, flat.size)
        idx = np.argpartition(flat, -n_keep)[-n_keep:]
        idx = idx[np.isfinite(flat[idx])]
        r, c = np.unravel_index(idx, scores.shape)
        return pd.DataFrame({"id_1": ids[r], "id_2": ids[c]})

    cand = replicated.groupBy("b1", "b2").applyInPandas(
        block_pairs, schema="id_1 long, id_2 long"
    )
    v1 = emb.select(F.col(id_col).alias("id_1"), F.col(vec_col).alias("v1"))
    v2 = emb.select(F.col(id_col).alias("id_2"), F.col(vec_col).alias("v2"))
    return (
        cand.join(v1, "id_1")
        .join(v2, "id_2")
        .withColumn("cosine", dot_product("v1", "v2"))
        .select("id_1", "id_2", "cosine")
        .orderBy(F.desc("cosine"), F.asc("id_1"), F.asc("id_2"))
        .limit(top_m)
    )


def connected_components(
    pairs: DataFrame,
    *,
    id_1: str = "id_1",
    id_2: str = "id_2",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-cluster labels via iterative min-label propagation.

    Pair-wise dedup (LSH verify, SimHash, cosine) emits EDGES; dropping
    "the higher id of each pair" under-deletes when duplicates chain
    (a~b, b~c but not a~c).  The fix is the transitive closure: label
    every node with the minimum doc_id reachable from it, then keep one
    doc per cluster.  Returns ``(node, label)`` — one row per distinct
    endpoint of ``pairs``.

    Each iteration is a neighbor-min step (equi-join + min-aggregate over
    (node, label) longs — never text or vectors) followed by a POINTER
    JUMP (label[v] ← label[label[v]], a self-join on the label table):
    the Shiloach-Vishkin-style doubling that makes convergence
    O(log diameter) instead of O(diameter) — a 1000-link duplication
    chain resolves in ~10 rounds, not 1000.  Convergence is detected by
    the label SUM: labels are min-monotone (never increase), so an
    unchanged sum ⇔ an unchanged labeling — one cheap action per round
    instead of a change-count join.  Deterministic: ``min`` is ordering-
    and partitioning-independent, and the loop exits only at a fixpoint,
    so extra iterations can never change the result.

    Lineage control: the pointer-jump self-join references the round's
    label table TWICE, so without truncation the logical plan DOUBLES
    every round — Catalyst re-analysis goes exponential (measured: 48 s
    by round 4, then driver OOM printing the tree).  ``persist()`` caches
    data but keeps the plan, so each round ends in an eager
    ``localCheckpoint`` instead: the label table is O(pairs) rows of two
    longs, trivially held by executors.  On a real cluster use reliable
    ``checkpoint()`` (same call shape) if executor loss during the loop
    must be survivable; old rounds' checkpoint blocks are dropped by the
    ContextCleaner once unreferenced.
    """
    e = pairs.select(F.col(id_1).alias("a"), F.col(id_2).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iter):
        msgs = sym.join(
            labels.withColumnRenamed("node", "a"), "a"
        ).select(F.col("b").alias("node"), "label")
        l1 = (
            labels.select("node", "label")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: adopt the label's own label (always ≤, since every
        # label is a node id and labels are min-monotone)
        parent = l1.select(
            F.col("node").alias("label"), F.col("label").alias("plabel")
        )
        labels = (
            l1.join(parent, "label")
            .select("node", F.least("label", "plabel").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
