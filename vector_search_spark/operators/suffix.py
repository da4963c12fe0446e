"""Distributed suffix-array construction by prefix doubling, plus the
rank-table LCP walk — the exact-substring primitive behind suffix-array
training-data dedup (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"), built entirely from joins + the engine's
range-partitioned global rank (never a one-task sort).

Why prefix doubling and not "sort the suffixes": materializing suffixes is
O(L²) data (the DuckDB oracle does exactly that — viable only at fixture
scale); doubling keeps O(N) rows per round and runs log2(cap) rounds of
{shifted self-join → global order-preserving rank}, each a plain shuffle —
the textbook PRAM/MapReduce suffix-array construction.

Round compression: level 0 ranks come from a vocabulary join (the rank of
a single token); levels 1–2 never materialize as rank tables at all —
the base table carries the next-8 level-0 ranks as lead() columns, so one
8-column global rank jumps straight to level 3 (prefix 8), and the LCP
walk tests levels ≤2 by direct element-wise lead-column equality.  That
cuts the expensive global-rank rounds from 8 to {vocab, level-3, then one
per doubling 16→32→64→128}.

Rank semantics per level k: ``r_k(doc, pos)`` orders suffixes by their
first ``2^k`` tokens (ties equal), out-of-range as sentinel -1 (< every
real rank) so shorter suffixes sort first — exactly the lexicographic
list order the oracle's native list comparison uses.  Ranks are assigned
GLOBALLY (across docs) by ``global_dense_rank`` (round 12; one
range-partitioned pass with boundary-corrected group-start prefix sums):
order-preserving with ties equal is all doubling needs, and it avoids
both a single-partition dense_rank and the old min-over-group second
window exchange.  Rank VALUES are the group's 1..G dense index; no
consumer may depend on values, only on order/tie structure.

Equality-at-level-k implies a REAL 2^k-token match wherever the walk uses
it: two suffixes of the same document have distinct lengths, so their
sentinel-padded prefixes can only be equal if no pad position is reached
— the padded-tie case needs equal lengths and cannot occur.

Every kept table is eagerly localCheckpoint()ed: all of them are read
again by the LCP walk, and the checkpoint both truncates the iterative
lineage (the house pattern) and makes the level tables a reusable,
session-shareable artifact — the classic space/time profile of doubling
SA builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..partitioning import global_dense_rank, global_order_stats, maybe_broadcast

_BASE_W = 8     # lead-column width of the base table (= 2^_BASE_LEVEL)
_BASE_LEVEL = 3


def suffix_ranks(tok: DataFrame, levels: int) -> dict[int, DataFrame]:
    """Build suffix rank tables from ``tok(doc_id, pos, tok)``.

    Returns ``{"base": DataFrame(doc_id, pos, p0..p7),
    k: DataFrame(doc_id, pos, r) for k = 3..levels}`` where ``r`` orders
    suffixes by their first ``2^k`` tokens and ``p_t`` is the level-0
    (single-token) rank at pos+t, sentinel -1 past the document end.
    ``levels >= 3`` required; after ``2^levels >= max doc length`` the top
    level totally orders each document's suffixes.
    """
    if levels < _BASE_LEVEL:
        raise ValueError("levels must be >= 3 (base table covers 8 tokens)")
    # (Round 12: a dense rank of the full token table was tried in place
    # of the {distinct → rank → join} vocabulary — MEASURED +6% shuffle
    # bytes (range-exchanging every token STRING costs more than the
    # distinct's tiny output plus the join) and no wall win; kept.)
    vocab = global_order_stats(tok.select("tok").distinct(), ["tok"]).select(
        "tok", F.col("__rank").alias("p0")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    base = tok.join(vocab, "tok").select("doc_id", "pos", "p0")
    for t in range(1, _BASE_W):
        base = base.withColumn(
            f"p{t}", F.coalesce(F.lead("p0", t).over(w_doc), F.lit(-1))
        )
    base = base.localCheckpoint()
    # "__n": the shared row count (levels preserve rows) — read by
    # lcp_walk's broadcast gate so query-path walks never pay a count job.
    ranks: dict = {"base": base, "__n": base.count()}

    # Round 12: per level, the old shape paid FIVE full-data exchanges —
    # shifted self-join on (doc_id, pos) (2 exchanges + join),
    # global_order_stats (range + __pid window exchange), then a
    # min-over-group window (a second full window hash exchange).  Two
    # structural fixes, values-invariant by the pyramid's contract (ranks
    # are consumed only for ORDER and TIE structure, never their values —
    # pinned by test_suffix.py's true-SA-order / brute-force gates):
    #
    # 1. `global_dense_rank` computes the tie-equal group rank inside the
    #    SAME range-partitioned pass (group-start flags + boundary fixes
    #    on the tiny per-partition stats table) — the per-group hash
    #    exchange disappears.  Dense 1..G values replace min-row-number
    #    values; both are order-preserving and tie-equal, which is all
    #    prefix doubling needs.
    # 2. The shift is `lead(r, 2^(k-1))` over the per-doc position window
    #    — posexplode guarantees contiguous 0-based positions, so the
    #    lead row IS the suffix at pos+d; the self-join (2 exchanges) is
    #    one doc_id window exchange.
    pcols = [f"p{t}" for t in range(_BASE_W)]
    cur = (
        global_dense_rank(base, pcols, ["doc_id", "pos"])
        .select("doc_id", "pos", F.col("__dense").alias("r"))
        .localCheckpoint()
    )
    ranks[_BASE_LEVEL] = cur

    for k in range(_BASE_LEVEL + 1, levels + 1):
        d = 1 << (k - 1)
        paired = cur.withColumn(
            "r2", F.coalesce(F.lead("r", d).over(w_doc), F.lit(-1))
        )
        cur = (
            global_dense_rank(paired, ["r", "r2"], ["doc_id", "pos"])
            .select("doc_id", "pos", F.col("__dense").alias("r"))
            .localCheckpoint()
        )
        ranks[k] = cur
    return ranks


def lcp_walk(pairs: DataFrame, ranks: dict, levels: int) -> DataFrame:
    """Greedy Karp–Miller–Rosenberg LCP walk over arbitrary suffix pairs.

    ``pairs`` is ``(doc_i, i, doc_j, j)`` — the two suffixes may live in
    DIFFERENT documents (ranks are global).  Descend k = levels-1..0;
    when both walk positions (advanced by the accumulated match) still
    exist and their level-k prefixes are equal, the suffixes match for
    another ``least(2^k, remaining_i, remaining_j)`` tokens.  The
    remaining-length cap matters only cross-document: equal-length
    suffixes from two docs CAN tie through sentinel padding (identical
    full suffixes), where the real match is the remaining length, not
    2^k; within one document suffix lengths always differ, so the cap is
    a no-op there.  Levels ≥3 test rank-table equality (two (doc, pos)
    hash-join lookups each); levels ≤2 test element-wise equality of the
    base table's lead columns — no token data moves at any point.

    Returns ``pairs`` plus an exact ``lcp`` column.
    """
    base = ranks["base"]
    # Round 12: the 2-joins-per-level lookup cascade ran every lookup as a
    # sort-merge join (the checkpointed rank tables carry no size stats,
    # so auto-broadcast never fires) — 16+ full exchanges of the pair
    # table per walk.  The rank tables are (doc_id, pos, r) triples; gate
    # them through the house `maybe_broadcast` so fixture/bench scales run
    # the walk as a narrow broadcast cascade while corpora past the byte
    # gate keep the shuffle join (the correct 100 TB shape).  All levels
    # share one row count (doubling preserves rows), taken once from the
    # eagerly-checkpointed base, cached in `ranks` by `suffix_ranks`.
    n = ranks.get("__n")
    if n is None:
        n = ranks["__n"] = base.count()

    def _mb(df, row_bytes=160):
        return maybe_broadcast(df, max_rows=32_000_000, n_rows=n, row_bytes=row_bytes)

    doc_len = base.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__L"))
    adj = (
        pairs.join(
            _mb(doc_len.select(F.col("doc_id").alias("doc_i"), F.col("__L").alias("__Li"))),
            "doc_i",
        )
        .join(
            _mb(doc_len.select(F.col("doc_id").alias("doc_j"), F.col("__L").alias("__Lj"))),
            "doc_j",
        )
        .withColumn("lcp", F.lit(0).cast("long"))
    )
    for k in range(levels - 1, -1, -1):
        step = 1 << k
        if k >= _BASE_LEVEL:
            rk = ranks[k]
            left = rk.select(
                F.col("doc_id").alias("doc_i"),
                F.col("pos").alias("__ki"),
                F.col("r").alias("__ri"),
            )
            right = rk.select(
                F.col("doc_id").alias("doc_j"),
                F.col("pos").alias("__kj"),
                F.col("r").alias("__rj"),
            )
            match = (
                F.col("__ri").isNotNull()
                & F.col("__rj").isNotNull()
                & (F.col("__ri") == F.col("__rj"))
            )
            drop = ["__ki", "__kj", "__ri", "__rj"]
        else:
            cols = [f"p{t}" for t in range(step)]
            left = base.select(
                F.col("doc_id").alias("doc_i"),
                F.col("pos").alias("__ki"),
                *[F.col(c).alias(f"__i{c}") for c in cols],
            )
            right = base.select(
                F.col("doc_id").alias("doc_j"),
                F.col("pos").alias("__kj"),
                *[F.col(c).alias(f"__j{c}") for c in cols],
            )
            match = F.col("__ip0").isNotNull() & F.col("__jp0").isNotNull()
            for c in cols:
                match = match & (F.col(f"__i{c}") == F.col(f"__j{c}"))
            drop = (
                ["__ki", "__kj"]
                + [f"__i{c}" for c in cols]
                + [f"__j{c}" for c in cols]
            )
        gain = F.least(
            F.lit(step).cast("long"),
            F.col("__Li") - F.col("__ki"),
            F.col("__Lj") - F.col("__kj"),
        )
        rb = 160 if k >= _BASE_LEVEL else 320  # base-level lookups are wider
        adj = (
            adj.withColumn("__ki", F.col("i") + F.col("lcp"))
            .withColumn("__kj", F.col("j") + F.col("lcp"))
            .join(_mb(left, rb), ["doc_i", "__ki"], "left")
            .join(_mb(right, rb), ["doc_j", "__kj"], "left")
            .withColumn(
                "lcp",
                F.col("lcp") + F.when(match, gain).otherwise(F.lit(0)),
            )
            .drop(*drop)
        )
    return adj.drop("__Li", "__Lj")


def adjacent_lcp(ranks: dict, levels: int) -> DataFrame:
    """LCP of WITHIN-document SA-adjacent suffix pairs (max = the doc's
    longest repeated substring).  Adjacency comes from a per-document
    window over the top-level rank; the walk is :func:`lcp_walk`.

    Returns ``(doc_id, i, j, lcp)`` for SA-adjacent suffix starts.
    """
    top = ranks[levels]
    w_sa = Window.partitionBy("doc_id").orderBy("r_sa")
    pairs = (
        top.select("doc_id", F.col("pos").alias("i"), F.col("r").alias("r_sa"))
        .withColumn("j", F.lead("i").over(w_sa))
        .filter(F.col("j").isNotNull())
        .select(
            F.col("doc_id").alias("doc_i"),
            "i",
            F.col("doc_id").alias("doc_j"),
            "j",
        )
    )
    walked = lcp_walk(pairs, ranks, levels)
    return walked.select(F.col("doc_i").alias("doc_id"), "i", "j", "lcp")
