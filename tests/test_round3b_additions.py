"""Plan + semantic gates for the round-3b additions: the scale contracts
each new operator's docstring declares, asserted against the physical plan
or the observable behavior (not just prose)."""

from __future__ import annotations

import re

from conftest import SF_TEST
from vector_search_spark import registry


def _formatted(spark, df) -> str:
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --- dedup_edit_distance ----------------------------------------------------


def test_edit_distance_runs_only_on_candidates(spark):
    """Levenshtein pairs ⊆ est>=0.5 LSH candidates (never a corpus square),
    and the join plan has no cartesian/nested-loop corpus pairing."""
    from vector_search_spark.registry_dedup import _shared_lsh_candidates
    from pyspark.sql import functions as F

    df = registry.QUERIES["dedup_edit_distance"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    cand = (
        _shared_lsh_candidates(spark, SF_TEST)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("id_1", "id_2")
    )
    n_cand = cand.count()
    emitted = df.count()
    assert emitted <= n_cand
    # every emitted pair is a candidate pair
    assert df.select("id_1", "id_2").join(cand, ["id_1", "id_2"], "left_anti").count() == 0


# --- dup_neighbor_jaccard ---------------------------------------------------


def test_neighbor_jaccard_wedges_only(spark):
    """Wedge join keys on the shared neighbor: no cartesian, and every
    emitted pair genuinely shares >= 1 neighbor with sane bounds."""
    df = registry.QUERIES["dup_neighbor_jaccard"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    for r in rows:
        assert 1 <= r["common_neighbors"] <= min(r["degree_1"], r["degree_2"])
        assert 0.0 < r["nbr_jaccard"] <= 1.0


# --- bigram_lm_logprob ------------------------------------------------------


def test_bigram_lm_linear_build_no_cartesian(spark):
    """The bigram build is an array transform (no token self-join); the only
    nested-loop is the 1-row corpus-total broadcast."""
    df = registry.QUERIES["bigram_lm_logprob"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    # the session-shared LM term table renders its cached build plan inside
    # InMemoryRelation — count nested-loop joins only in the live query part
    live = plan.split("InMemoryRelation")[0]
    bnlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", live)
    assert len(bnlj) <= 1, bnlj


def test_bigram_lm_scores_sequence_not_bag(spark):
    """Sequence sensitivity: a doc's bigram score differs from what any
    bag-of-words model could see — verified indirectly: the bigram table
    the query builds preserves adjacency (first doc's bigram count =
    token count - 1)."""
    from pyspark.sql import functions as F
    from vector_search_spark.sources.tables import load_table

    docs = load_table(spark, SF_TEST, "documents").filter(F.trim(F.col("text")) != "")
    first = docs.orderBy("doc_id").limit(1).collect()[0]
    n_tok = len(first["text"].strip().lower().split())
    out = registry.QUERIES["bigram_lm_logprob"](spark, SF_TEST)
    row = out.filter(F.col("doc_id") == first["doc_id"]).collect()[0]
    assert row["n_bigrams"] == n_tok - 1


# --- phrase_search ----------------------------------------------------------


def test_phrase_search_probe_is_broadcast_and_matches_python(spark):
    df = registry.QUERIES["phrase_search"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the 1-row phrase probe
    rows = df.collect()
    assert rows, "top-1 phrase must hit at least one document"
    phrase = rows[0]["phrase"]
    # cross-check counts against a pure-Python scan
    from vector_search_spark.sources.tables import load_table

    docs = {r["doc_id"]: r["text"] for r in load_table(spark, SF_TEST, "documents").collect()}
    for r in rows:
        toks = docs[r["doc_id"]].strip().lower().split()
        hits = [
            i + 1
            for i in range(len(toks) - 2)
            if " ".join(toks[i : i + 3]) == phrase
        ]
        assert r["n_matches"] == len(hits)
        assert r["first_pos"] == hits[0]


# --- weighted_sample_topk ---------------------------------------------------


def test_weighted_sample_no_global_sort(spark):
    """Selection must be TakeOrderedAndProject (per-partition top-k), not a
    full sort of the corpus."""
    df = registry.QUERIES["weighted_sample_topk"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_prefers_heavy_docs(spark):
    """Statistical sanity: with weight = n_chars, the sampled docs' mean
    weight should exceed the corpus mean (A-ES biases toward weight)."""
    from pyspark.sql import functions as F
    from vector_search_spark.sources.tables import load_table

    out = registry.QUERIES["weighted_sample_topk"](spark, SF_TEST)
    sample_mean = out.agg(F.avg("weight")).collect()[0][0]
    corpus_mean = (
        load_table(spark, SF_TEST, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample_mean > corpus_mean


# --- rolling_7d_distinct_users ----------------------------------------------


def test_rolling_distinct_no_theta_join(spark):
    """The day-range expansion must be an explode (linear ×7), never a
    range theta-join of days × pairs."""
    df = registry.QUERIES["rolling_7d_distinct_users"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_rolling_distinct_dominates_daily(spark):
    """users_7d >= the day's own distinct users; both monotone sanity."""
    from pyspark.sql import functions as F
    from vector_search_spark.sources.tables import load_table

    ev = load_table(spark, SF_TEST, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(F.countDistinct("user_id").alias("u1"))
    out = registry.QUERIES["rolling_7d_distinct_users"](spark, SF_TEST)
    joined = out.join(daily, "day").collect()
    for r in joined:
        assert r["users_7d"] >= r["u1"]


# --- join_key_skew_audit ----------------------------------------------------


def test_skew_audit_uses_range_partitioned_rank(spark):
    """The Gini rank comes from global_order_stats — since round 8 the
    helper eagerly checkpoints its range-partitioned frame (ONE evaluation
    of the range exchange feeds both the totals and window branches — the
    spark_partition_id double-evaluation bug the 1000x slice verification
    caught), so the registered plan starts at the checkpoint: assert the
    ExistingRDD base, no single-partition global window, and — the
    property the checkpoint exists to guarantee — bit-identical repeated
    evaluations."""
    from pyspark.sql import functions as F

    from vector_search_spark.partitioning import global_order_stats
    from vector_search_spark.sources.tables import load_table

    kc = (
        load_table(spark, SF_TEST, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rk = global_order_stats(kc, ["cnt", "user_id"])
    plan = _formatted(spark, rk)
    # the range exchange ran once, at checkpoint build: the consumer plan
    # bottoms out in the checkpointed RDD, not a re-runnable scan
    assert "ExistingRDD" in plan
    assert "Exchange SinglePartition" not in plan
    # determinism across repeated builds (each re-samples its own range
    # bounds; the answer must not depend on them)
    r1 = sorted(tuple(r) for r in rk.collect())
    r2 = sorted(
        tuple(r) for r in global_order_stats(kc, ["cnt", "user_id"]).collect()
    )
    assert r1 == r2
    df = registry.QUERIES["join_key_skew_audit"](spark, SF_TEST)
    plan2 = _formatted(spark, df)
    # post-checkpoint: no raw rescan, no single-partition collapse
    assert "Scan parquet" not in plan2
    assert "Exchange SinglePartition" not in plan2
    row = df.collect()[0]
    assert 0.0 <= row["gini"] < 1.0
    assert row["p50_cnt"] <= row["p99_cnt"] <= row["max_cnt"]
    assert 0.0 < row["top1_share"] <= 1.0


# --- order_status_pivot -----------------------------------------------------


def test_pivot_single_aggregate_no_extra_scan(spark):
    """Explicit pivot values → one aggregate over one scan of orders (no
    values-discovery pass): exactly one scan of the orders parquet in the
    plan, and the result is NULL-free."""
    df = registry.QUERIES["order_status_pivot"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    pdf = df.toPandas()
    assert not pdf.isnull().any().any()
    # marginal: per-month counts sum to total orders
    from vector_search_spark.sources.tables import load_table

    total = load_table(spark, SF_TEST, "orders").count()
    assert int((pdf.cnt_f + pdf.cnt_o + pdf.cnt_p).sum()) == total


# --- ann_filtered_topk ------------------------------------------------------


def test_filtered_ann_prefilters_and_fills_k(spark):
    """Pre-filtering contract: every hit satisfies the predicate AND every
    query still gets a full k (post-filtering would under-fill)."""
    from pyspark.sql import functions as F
    from vector_search_spark.sources.tables import load_table

    out = registry.QUERIES["ann_filtered_topk"](spark, SF_TEST)
    emb = load_table(spark, SF_TEST, "embeddings").select("vec_id", "label")
    joined = out.join(emb, "vec_id").collect()
    assert all(2 <= r["label"] <= 5 for r in joined)
    per_q = {}
    for r in joined:
        per_q.setdefault(r["query_id"], 0)
        per_q[r["query_id"]] += 1
    assert len(per_q) == 10 and all(v == 10 for v in per_q.values())


# --- hard_negative_mining ---------------------------------------------------


def test_hard_negatives_cross_label_and_no_vector_shuffle(spark):
    from pyspark.sql import functions as F
    from vector_search_spark.sources.tables import load_table

    out = registry.QUERIES["hard_negative_mining"](spark, SF_TEST)
    plan = _formatted(spark, out)
    # vectors must not appear in any exchange
    for seg in plan.split("(")[1:]:
        if seg.startswith("Exchange") or "Exchange h" in seg[:40]:
            assert "embedding" not in seg.split("Input")[0]
    labels = dict(
        (r["vec_id"], r["label"])
        for r in load_table(spark, SF_TEST, "embeddings").select("vec_id", "label").collect()
    )
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert labels[r["neg_id"]] != labels[r["query_id"]]


# --- exp_decay_daily_value --------------------------------------------------


def test_exp_decay_matches_python_fold(spark):
    """Cross-check the decayed sums against a direct Python computation
    from the raw events (independent of both engines' SQL)."""
    from collections import defaultdict

    from pyspark.sql import functions as F
    from vector_search_spark.registry_analytics import DECAY_HORIZON, DECAY_W_MICRO
    from vector_search_spark.sources.tables import load_table

    ev = (
        load_table(spark, SF_TEST, "events")
        .select(F.col("ts").cast("date").alias("day"), "value")
        .collect()
    )
    daily = defaultdict(int)
    for r in ev:
        import math

        daily[r["day"]] += math.floor(r["value"] * 100 + 0.5)
    expected = {}
    for d in daily:
        s = 0
        for off in range(DECAY_HORIZON):
            prev = d - __import__("datetime").timedelta(days=off)
            if prev in daily:
                s += daily[prev] * DECAY_W_MICRO[off]
        expected[d] = s
    out = registry.QUERIES["exp_decay_daily_value"](spark, SF_TEST).collect()
    assert len(out) == len(expected)
    for r in out:
        assert r["decayed_micro_cents"] == expected[r["day"]], r["day"]


# --- bpe_top_merges ---------------------------------------------------------


def test_bpe_merges_match_python_trainer(spark):
    """The engine's merge sequence equals a reference Python BPE trainer
    with the same declared replace() semantics."""
    from collections import Counter

    from vector_search_spark.registry_text import BPE_MERGE_ROUNDS
    from vector_search_spark.sources.tables import load_table

    docs = load_table(spark, SF_TEST, "documents").select("text").collect()
    wc = Counter()
    for r in docs:
        t = r["text"].strip().lower()
        if t:
            wc.update(t.split())
    seqs = {w: " " + " ".join(w) + " " for w in wc}
    expected = []
    for _ in range(BPE_MERGE_ROUNDS):
        pc = Counter()
        for w, s in seqs.items():
            syms = s.split()
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        expected.append((a, b, cnt))
        seqs = {w: s.replace(f" {a} {b} ", f" {a}{b} ") for w, s in seqs.items()}
    out = registry.QUERIES["bpe_top_merges"](spark, SF_TEST).collect()
    got = [(r["left_sym"], r["right_sym"], r["cnt"]) for r in out]
    assert got == expected


def test_bpe_counts_are_type_table_sized(spark):
    """The pair-count aggregate runs over word TYPES (vocab), not corpus
    tokens: merge counts must be reachable from the type table alone —
    checked by the Python trainer above; here assert the plan never
    re-scans documents after the first aggregate (exactly one documents
    scan per round's lineage is collapsed by reuse: the full plan may
    show repeated scans since nothing is persisted, but no cartesian or
    nested-loop pairing may appear)."""
    df = registry.QUERIES["bpe_top_merges"](spark, SF_TEST)
    plan = _formatted(spark, df)
    assert "CartesianProduct" not in plan


# --- zorder_cells -----------------------------------------------------------


def test_zorder_cells_bijective_and_complete(spark):
    from vector_search_spark.sources.tables import load_table

    out = registry.QUERIES["zorder_cells"](spark, SF_TEST)
    rows = out.collect()
    # morton <-> (xb, yb) is a bijection; totals are lossless
    assert len({r["morton"] for r in rows}) == len(rows)
    assert len({(r["xb"], r["yb"]) for r in rows}) == len(rows)
    assert sum(r["n_orders"] for r in rows) == load_table(spark, SF_TEST, "orders").count()
    assert all(0 <= r["morton"] < 256 for r in rows)


# --- media_phash_neardup ----------------------------------------------------


def test_phash_banding_is_pigeonhole_complete(spark):
    """Banded candidates must recover EVERY pair with hamming <= 1 (brute
    force over all hash pairs), and the emitted set equals that set."""
    from vector_search_spark.operators.multimodal import (
        attach_binary_payload,
        decode_image_phash,
    )
    from vector_search_spark.sources.tables import load_table

    docs = load_table(spark, SF_TEST, "documents")
    ph = {
        r["doc_id"]: r["phash"]
        for r in decode_image_phash(attach_binary_payload(docs)).collect()
    }
    ids = sorted(ph)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(ph[a] ^ ph[b]).count("1") <= 1
    }
    out = registry.QUERIES["media_phash_neardup"](spark, SF_TEST)
    got = {(r["id_1"], r["id_2"]) for r in out.collect()}
    assert got == brute
    # Byte-identical payloads MUST surface as a hamming-0 pair.  sf0.01
    # has no byte-identical texts (the 16-bit era's hamming-0 pairs were
    # random hash collisions, gone at 32 bits), so plant one explicitly
    # and push it through the same decode seam.
    dup = spark.createDataFrame(
        [(900001, "planted duplicate payload"), (900002, "planted duplicate payload"),
         (900003, "a different text entirely")],
        "doc_id long, text string",
    )
    dph = {
        r["doc_id"]: r["phash"]
        for r in decode_image_phash(attach_binary_payload(dup)).collect()
    }
    assert dph[900001] == dph[900002]
    assert dph[900001] != dph[900003]


def test_phash_exact_dups_hash_identically(spark):
    """Byte-identical payloads -> identical pHash (the stub's guarantee)."""
    from pyspark.sql import functions as F

    from vector_search_spark.operators.multimodal import (
        attach_binary_payload,
        decode_image_phash,
    )
    from vector_search_spark.sources.tables import load_table

    docs = load_table(spark, SF_TEST, "documents")
    ph = decode_image_phash(attach_binary_payload(docs))
    joined = (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .join(ph, "doc_id")
        .groupBy("fp")
        .agg(F.countDistinct("phash").alias("n"))
    )
    assert joined.filter(F.col("n") > 1).count() == 0


# --- span_corruption_plan ---------------------------------------------------


def test_span_plan_nonoverlapping_within_bounds(spark):
    from collections import defaultdict

    out = registry.QUERIES["span_corruption_plan"](spark, SF_TEST).collect()
    by_doc = defaultdict(list)
    for r in out:
        by_doc[r["doc_id"]].append(r)
    assert by_doc, "plan must cover docs"
    for doc, spans in by_doc.items():
        spans.sort(key=lambda r: r["span_idx"])
        n_tok = spans[0]["n_tok"]
        prev_end = 0
        for r in spans:
            assert r["start_tok"] >= prev_end + 1
            assert r["start_tok"] + r["span_len"] - 1 <= n_tok
            prev_end = r["start_tok"] + r["span_len"] - 1
        # ~15% corruption at the declared density
        masked = sum(r["span_len"] for r in spans)
        assert masked == 3 * (n_tok // 20)


# --- subdoc_dedup_rewrite ---------------------------------------------------


def test_subdoc_rewrite_matches_python_reconstruction(spark):
    """Rebuild semantics cross-checked in pure Python: canonical owner
    keeps the block, others lose it; clean_md5 = md5 of kept text."""
    import hashlib
    from collections import defaultdict

    from vector_search_spark.registry_dedup import BLOCK_TOKENS
    from vector_search_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: r["text"].strip().lower().split()
        for r in load_table(spark, SF_TEST, "documents").collect()
    }
    blocks = {}
    owners = defaultdict(set)
    for d, toks in docs.items():
        bl = [
            (i, " ".join(toks[i * BLOCK_TOKENS : (i + 1) * BLOCK_TOKENS]))
            for i in range((len(toks) + BLOCK_TOKENS - 1) // BLOCK_TOKENS)
        ]
        blocks[d] = bl
        for _, t in bl:
            owners[t].add(d)
    out = registry.QUERIES["subdoc_dedup_rewrite"](spark, SF_TEST).collect()
    assert len(out) == len(docs)
    for r in out:
        d = r["doc_id"]
        kept = [
            t
            for _, t in blocks[d]
            if len(owners[t]) == 1 or min(owners[t]) == d
        ]
        assert r["n_blocks"] == len(blocks[d])
        assert r["kept_blocks"] == len(kept)
        assert r["clean_md5"] == hashlib.md5(" ".join(kept).encode()).hexdigest()
    # the transform must actually drop something (planted dups exist)
    assert any(r["kept_blocks"] < r["n_blocks"] for r in out)


# --- top_event_paths --------------------------------------------------------


def test_event_paths_never_cross_sessions(spark):
    """Paths are built per (user, session): total trigram count equals
    Σ max(0, session_len - 2) over Python-sessionized events."""
    from collections import defaultdict

    from pyspark.sql import functions as F
    from vector_search_spark.sources.tables import load_table

    ev = (
        load_table(spark, SF_TEST, "events")
        .select("user_id", "event_id", F.expr("ts_ns DIV 1000").alias("us"))
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["us"], r["event_id"]))
    total = 0
    for evs in by_user.values():
        evs.sort()
        slen = 0
        prev = None
        for us, _ in evs:
            if prev is not None and us - prev >= 600_000_000:
                total += max(0, slen - 2)
                slen = 0
            slen += 1
            prev = us
        total += max(0, slen - 2)
    out = registry.QUERIES["top_event_paths"](spark, SF_TEST)
    # sum over ALL paths (not just top-10) must equal the trigram count;
    # recompute without the limit via the same pipeline pieces
    from pyspark.sql import Window

    evdf = load_table(spark, SF_TEST, "events").select(
        "user_id", "event_id", F.expr("ts_ns DIV 1000").alias("us"), "event_type"
    )
    wo = Window.partitionBy("user_id").orderBy("us", "event_id")
    sess = evdf.withColumn(
        "new_s",
        F.when((F.col("us") - F.lag("us").over(wo)) >= 600_000_000, 1).otherwise(0),
    ).withColumn("sid", F.sum("new_s").over(wo.rowsBetween(Window.unboundedPreceding, 0)))
    ws = Window.partitionBy("user_id", "sid").orderBy("us", "event_id")
    n_tri = (
        sess.withColumn("l2", F.lead("event_type", 2).over(ws))
        .filter(F.col("l2").isNotNull())
        .count()
    )
    assert n_tri == total
    rows = out.collect()
    assert 0 < len(rows) <= 10
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


# --- customer_rfm_segments --------------------------------------------------


def test_rfm_quintiles_balanced_and_consistent(spark):
    from collections import Counter

    out = registry.QUERIES["customer_rfm_segments"](spark, SF_TEST).collect()
    n = len(out)
    for col in ("r_score", "f_score", "m_score"):
        c = Counter(r[col] for r in out)
        assert set(c) == {1, 2, 3, 4, 5}
        # ntile balance: sizes differ by at most 1
        assert max(c.values()) - min(c.values()) <= 1, (col, c)
    for r in out:
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"
    # monotone consistency: the highest-spend customer scores m=5
    top_m = max(out, key=lambda r: (r["cents"], -r["custkey"]))
    assert top_m["m_score"] == 5
    assert n > 0


# --- synthetic_value_sampler ------------------------------------------------


def test_synthetic_sampler_is_distribution_faithful(spark):
    out = registry.QUERIES["synthetic_value_sampler"](spark, SF_TEST).collect()
    assert sum(r["synth_cnt"] for r in out) == 1000
    # inverse-CDF over uniform draws: total variation distance small
    tv = sum(abs(r["orig_frac"] - r["synth_frac"]) for r in out) / 2
    # E[TV] for 1000 uniform draws over ~20 buckets is ~0.05; 0.1 is a
    # comfortable deterministic bound (the draws are md5-fixed, so this
    # value never varies run to run anyway)
    assert tv < 0.1, tv


def test_quantile_normalization_equalizes_sources(spark):
    """All sources have equal size in the fixture, so after quantile
    normalization every source must carry the IDENTICAL multiset of
    normalized values; and norm_value must be monotone in src_rank."""
    from collections import defaultdict

    out = registry.QUERIES["quantile_normalize_scores"](spark, SF_TEST).collect()
    by_src = defaultdict(list)
    for r in out:
        by_src[r["source"]].append((r["src_rank"], r["norm_value"]))
    multisets = set()
    for src, rows in by_src.items():
        rows.sort()
        ranks = [v for _, v in rows]
        assert ranks == sorted(ranks), f"non-monotone mapping in {src}"
        multisets.add(tuple(sorted(ranks)))
    assert len(multisets) == 1, "sources ended with different distributions"


# --- value_drift_psi --------------------------------------------------------


def test_psi_total_is_sum_of_terms_and_nonnegative(spark):
    out = registry.QUERIES["value_drift_psi"](spark, SF_TEST).collect()
    total = [r for r in out if r["bucket"] == -1][0]
    terms = [r for r in out if r["bucket"] >= 0]
    assert len(terms) == 10
    assert total["term_micro"] == sum(r["term_micro"] for r in terms)
    assert all(r["term_micro"] >= 0 for r in terms)  # (p-q)·ln(p/q) ≥ 0
    assert total["c_ref"] == sum(r["c_ref"] for r in terms)
    assert total["c_cur"] == sum(r["c_cur"] for r in terms)
