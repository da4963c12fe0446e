"""Gates for the distributed suffix-array primitive beyond oracle parity:
a pure-Python brute-force LRS over the whole smoke corpus, a true-SA-order
check of the top rank table, and partitioning invariance of the BUILD
itself (the registry invariance test covers only the cached-artifact query
path)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE, SF_TEST
from vector_search_spark import registry
from vector_search_spark.operators.suffix import suffix_ranks
from vector_search_spark.registry_suffix import _SA_CAP, _SA_LEVELS


def _toks(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        " WHERE trim(text) != ''"
    ).fetchall()
    return {d: t.strip().lower().split()[:_SA_CAP] for d, t in rows}


def _brute_lrs(toks):
    """(lrs_len, start_i, start_j) maximizing length, then smallest pair —
    position-pair tie-break matches the SA-adjacency argmax because the
    adjacent pair achieving the max shares the same maximal run."""
    L = len(toks)
    best_len = 0
    for i in range(L):
        for j in range(i + 1, L):
            l = 0
            while j + l < L and toks[i + l] == toks[j + l]:
                l += 1
            if l > best_len:
                best_len = l
    return best_len


def test_lrs_matches_bruteforce_on_smoke_corpus(spark):
    """Every doc's lrs_len must equal the O(L^3) brute force, and the
    emitted phrase must actually occur at start_pos AND at least one other
    position."""
    toks = _toks(SF_SMOKE)
    got = {
        r.doc_id: r
        for r in registry.QUERIES["doc_suffix_lrs"](spark, SF_SMOKE).collect()
    }
    for doc_id, tk in toks.items():
        want = _brute_lrs(tk)
        if want >= 2:
            r = got[doc_id]
            assert r.lrs_len == want, (doc_id, r.lrs_len, want)
            phrase = tk[r.start_pos : r.start_pos + r.lrs_len]
            assert " ".join(phrase) == r.phrase
            # the phrase repeats somewhere else in the doc
            occ = sum(
                1
                for s in range(len(tk) - want + 1)
                if tk[s : s + want] == phrase
            )
            assert occ >= 2, (doc_id, phrase, occ)
        else:
            assert doc_id not in got


def test_top_rank_table_is_true_suffix_order(spark):
    """ranks[top] sorted within a doc must equal Python's sorted suffix
    starts (lexicographic, shorter-prefix-first) for every smoke doc."""
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", "text")
    )
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, _SA_CAP)
        ).alias("pos", "tok"),
    )
    top = suffix_ranks(tok, _SA_LEVELS)[_SA_LEVELS]
    got = {}
    for row in top.collect():
        got.setdefault(row.doc_id, []).append((row.r, row.pos))
    toks = _toks(SF_SMOKE)
    for doc_id, pairs in got.items():
        sa = [pos for _, pos in sorted(pairs)]
        tk = toks[doc_id]
        want = sorted(range(len(tk)), key=lambda p: tk[p:])
        assert sa == want, doc_id


def test_suffix_build_is_partitioning_invariant(spark):
    """The rank pyramid itself (not just the cached query path) must be
    bit-identical under different shuffle/scan regimes — the global rank
    must not leak range-sampling artifacts into rank values' ORDER.  Rank
    VALUES may differ (they are global row numbers); the per-doc suffix
    ORDER they induce may not."""
    regimes = [
        {"spark.sql.shuffle.partitions": "3",
         "spark.sql.files.maxPartitionBytes": "64k"},
        {"spark.sql.shuffle.partitions": "29",
         "spark.sql.files.maxPartitionBytes": "128m"},
    ]
    saved = {k: spark.conf.get(k) for r in regimes for k in r}
    orders = []
    try:
        for regime in regimes:
            for k, v in regime.items():
                spark.conf.set(k, v)
            docs = (
                spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
                .filter(F.trim(F.col("text")) != "")
                .select("doc_id", "text")
            )
            tok = docs.select(
                "doc_id",
                F.posexplode(
                    F.slice(
                        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, _SA_CAP
                    )
                ).alias("pos", "tok"),
            )
            top = suffix_ranks(tok, _SA_LEVELS)[_SA_LEVELS]
            by_doc = {}
            for row in top.collect():
                by_doc.setdefault(row.doc_id, []).append((row.r, row.pos))
            orders.append(
                {d: [p for _, p in sorted(v)] for d, v in by_doc.items()}
            )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert orders[0] == orders[1]


def test_corpus_repeats_match_bruteforce_max(spark):
    """The #1 cross-document repeat must equal the brute-force maximum
    cross-doc common substring on the smoke corpus, and every emitted
    phrase must occur verbatim at BOTH stated positions."""
    toks = _toks(SF_SMOKE)
    rows = registry.QUERIES["corpus_suffix_repeats"](spark, SF_SMOKE).collect()
    assert [r.rank_id for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        pa = toks[r.doc_a][r.pos_a : r.pos_a + r.match_len]
        pb = toks[r.doc_b][r.pos_b : r.pos_b + r.match_len]
        assert pa == pb
        assert " ".join(pa) == r.phrase
    # brute-force global max over doc pairs (seeded by shared first tokens
    # would be too slow exhaustively at O(n^2 L^2); use suffix sort)
    import itertools

    sufs = sorted(
        (tk[p:], d, p) for d, tk in toks.items() for p in range(len(tk))
    )
    best = 0
    for (sa, da, _), (sb, db, _) in itertools.pairwise(sufs):
        if da == db:
            continue
        l = 0
        for x, y in zip(sa, sb):
            if x != y:
                break
            l += 1
        best = max(best, l)
    assert rows[0].match_len == best


def test_exact_rewrite_matches_python_reconstruction(spark):
    """Pure-Python reconstruction of the adjacent-pair cut rule (suffix
    sort → cross-doc adjacent LCPs ≥ 16 → mark higher-doc spans → rebuild
    texts) must reproduce every (n_before, n_removed, rewritten_md5)."""
    import hashlib
    import itertools

    toks = _toks(SF_SMOKE)
    rows = {
        r.doc_id: r
        for r in registry.QUERIES["corpus_exact_dedup_rewrite"](
            spark, SF_SMOKE
        ).collect()
    }
    sufs = sorted(
        (tk[p:], d, p) for d, tk in toks.items() for p in range(len(tk))
    )
    marked = {}
    for (sa, da, pa), (sb, db, pb) in itertools.pairwise(sufs):
        if da == db:
            continue
        l = 0
        for x, y in zip(sa, sb):
            if x != y:
                break
            l += 1
        if l >= 16:
            cut_doc, cut_pos = (db, pb) if da < db else (da, pa)
            marked.setdefault(cut_doc, set()).update(
                range(cut_pos, cut_pos + l)
            )
    assert set(rows) == set(marked)
    for d, posset in marked.items():
        tk = toks[d]
        remaining = " ".join(t for i, t in enumerate(tk) if i not in posset)
        r = rows[d]
        assert r.n_before == len(tk)
        assert r.n_removed == len(posset)
        assert r.rewritten_md5 == hashlib.md5(remaining.encode()).hexdigest()
