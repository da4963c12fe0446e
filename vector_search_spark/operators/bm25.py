"""BM25 keyword ranking + reciprocal-rank-fusion hybrid search.

The reference engine (SURVEY.md §2.4) ranks purely by dense-vector dot
product; production search over the same corpus almost always pairs that
with lexical BM25 and fuses the two rankings (hybrid search).  Both legs
are pure DataFrame plans:

* BM25 is three scan-bound aggregations (term frequency, document
  frequency, document length) joined back on the *query terms only* — the
  per-term join is filtered to the handful of query tokens before any
  shuffle, so the exchanged data is O(matching docs), never O(corpus
  tokens).  At 100 TB the tf/df/dl tables are the classic inverted-index
  materialization: build once, persist partitioned by term, and the
  per-query plan touches only the posting lists it needs.
* RRF fusion is a full-outer join of two top-N rank lists (bounded: N
  rows each) — trivially broadcastable.

Cross-engine determinism (see memory/cross-engine-determinism.md): the
per-term BM25 contributions are summed via an ORDERED fold (sort by term,
then left-fold) on both engines, because float addition is
order-sensitive; every input to the fold (tf, df, dl ints; avgdl = one
int division; idf = one ln) is bit-identical across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(text: Column | str) -> Column:
    """Whitespace tokens of lower/trimmed text — same tokenizer as the
    text-analysis family (`registry_text`), so tf/df stats are consistent
    across the engine."""
    t = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(t)), r"\s+")


def token_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, tok) posting rows. Blank documents contribute no rows."""
    return (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(id_col, F.explode(tokenize(text_col)).alias("tok"))
    )


def doc_lengths(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, dl) whitespace token counts (0 for blank docs)."""
    t = F.trim(F.col(text_col))
    dl = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(F.lower(t), r"\s+")))
    return docs.select(id_col, dl.cast("long").alias("dl"))


def bm25_scored(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score for `query_terms` (Lucene idf form).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Only documents containing ≥1 query term appear (score > 0 always,
    since the Lucene idf is strictly positive).  The Σ is an ordered fold
    over terms sorted lexicographically — deterministic across engines
    and partitionings.
    """
    terms = sorted(set(query_terms))
    toks = token_table(docs, id_col, text_col)
    # Filter postings to query terms BEFORE any aggregation: the shuffle
    # carries only matching postings, not the whole inverted index.
    qtoks = toks.filter(F.col("tok").isin(terms))
    # `tf` feeds both the df aggregate and the scoring join; `dl` feeds
    # both the corpus stats and the scoring join.  Without lineage cuts
    # each consumer replays the full documents scan (plan audit showed
    # x4).  tf is the query-term posting set (tiny); dl is the narrow
    # (id, dl) table — the materialized length stat a production BM25
    # index persists anyway.
    tf = (
        qtoks.groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    # df derives from tf (one row per (doc, term)) — avoids a second
    # tokenize scan; count of tf rows per term ≡ countDistinct(doc).
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    dl = doc_lengths(docs, id_col, text_col).localCheckpoint(eager=True)
    # Corpus stats: exact integer sums, ONE double division each — the
    # same IEEE op in both engines yields the same double.
    stats = dl.agg(
        (F.sum("dl") * F.lit(1.0) / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = (idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom).alias("c")
    per_term = (
        tf.join(F.broadcast(df_), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(id_col, "tok", contrib)
    )
    # Ordered fold: collect per-doc (tok, c) pairs, sort by tok, left-fold
    # the contributions.  array_sort on structs orders by the first field.
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("tok", "c"))),
        F.lit(0.0),
        lambda acc, x: acc + x["c"],
    )
    return per_term.groupBy(id_col).agg(folded.alias("raw_score"))


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 20,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 results for a free-text query; rank ties break on id.

    Plan: ``orderBy().limit(k)`` FIRST — TakeOrderedAndProject keeps a
    k-row heap per map partition and merges k·partitions rows, never a
    global sort.  Rank is then assigned by a window over the k survivors
    only (a partition-less window BEFORE the limit would funnel every
    scored doc through one task — Spark plans no WindowGroupLimit for an
    empty partition spec)."""
    terms = [t for t in query.lower().strip().split() if t]
    scored = bm25_scored(docs, terms, k1=k1, b=b, id_col=id_col, text_col=text_col)
    from pyspark.sql import Window

    topk = scored.orderBy(F.desc("raw_score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("raw_score"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        id_col, "raw_score", "rank"
    )


def rrf_fuse(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    *,
    id_col: str = "doc_id",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two rank lists (Cormack et al. 2009):
    rrf(d) = Σ_lists 1/(k + rank_d).  Inputs are (id, rank) frames; a doc
    missing from one list contributes 0 for it.  Emitted ranks are
    NULL-free (−1 sentinel for "not in this list") per the repo's
    determinism contract.

    The two inputs are bounded top-N lists, so the outer join is a
    broadcast; fusion adds exactly two doubles in a fixed (a, b) order.
    """
    a = ranks_a.select(id_col, F.col("rank").alias("rank_a"))
    b = ranks_b.select(id_col, F.col("rank").alias("rank_b"))
    fused = a.join(b, id_col, "full_outer").select(
        id_col,
        F.coalesce("rank_a", F.lit(-1)).alias("rank_a"),
        F.coalesce("rank_b", F.lit(-1)).alias("rank_b"),
        (
            F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("rank_b")), F.lit(0.0))
        ).alias("raw_rrf"),
    )
    return fused
