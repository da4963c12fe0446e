"""Round-11 additions.

1. `session_overlap_pairs` density rebuild (VERDICT r10 "what's wrong"
   #1): the length-threshold prune and the emit-once cell rule are both
   result-preserving.  Gates: synthetic corpora that hit every edge the
   sf0.01 oracle can't — the T = 0 path (< 20 valid pairs), a pair whose
   overlap sits EXACTLY at the threshold, and a dense cell of identical
   sessions where the prune is a no-op and the answer is pure id
   tie-breaks.  Each case compares against a brute-force all-pairs
   Python enumeration of the same 10-minute sessionization.

2. Scaled-fixture embedding family (VERDICT r10 "what's missing" #2):
   the md5-seeded signed permutation keeps SAME-BASE-VECTOR replicas
   cosine-independent where the legacy rotation+sign-diagonal family
   made same-rotation-class replicas near-duplicates (q=2 vs q=3 share
   63/64 sign bits → cosine ≈ 0.998 — the decade-4 fixture
   contamination).  Pins: Spark transform == pure-Python application of
   the published (perm, signs); legacy family still reproduces
   bit-identically under --emb-family rotsign.
"""

from __future__ import annotations

import importlib.util as _ilu
import math
import os
from datetime import datetime, timezone

import pytest

from vector_search_spark import registry

_HERE = os.path.dirname(os.path.abspath(__file__))
_spec = _ilu.spec_from_file_location(
    "make_scaled_fixture",
    os.path.join(os.path.dirname(_HERE), "tools", "make_scaled_fixture.py"),
)
_msf = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_msf)

_GAP_US = 600_000_000


def _python_top20(events):
    """Brute-force reference: 10-min gaps-and-islands sessions, ALL
    cross-user overlapping pairs, top-20 by (overlap desc, id quad)."""
    sessions = []
    cur = None
    for uid, ts in sorted(events):
        if cur is None or cur[0] != uid or ts - cur[2] > _GAP_US:
            if cur is not None:
                sessions.append(cur)
            idx = 1 if cur is None or cur[0] != uid else cur[3] + 1
            cur = [uid, ts, ts, idx]
        else:
            cur[2] = ts
    if cur is not None:
        sessions.append(cur)
    pairs = []
    for i, (ua, sa, ea, ia) in enumerate(sessions):
        for ub, sb, eb, ib in sessions[i + 1:]:
            if ua == ub:
                continue
            if ua > ub:
                ua2, ia2, sa2, ea2, ub2, ib2, sb2, eb2 = ub, ib, sb, eb, ua, ia, sa, ea
            else:
                ua2, ia2, sa2, ea2, ub2, ib2, sb2, eb2 = ua, ia, sa, ea, ub, ib, sb, eb
            ov = min(ea2, eb2) - max(sa2, sb2)
            if ov > 0:
                pairs.append((-ov, ua2, ia2, ub2, ib2))
    pairs.sort()
    return [
        (k + 1, ua, ia, ub, ib, -negov)
        for k, (negov, ua, ia, ub, ib) in enumerate(pairs[:20])
    ]


def _write_events(spark, tmp_path, events):
    """events: [(user_id, ts_us)] -> a minimal sf_dir with events.parquet."""
    rows = [
        (int(u), datetime.fromtimestamp(ts / 1e6, tz=timezone.utc).replace(tzinfo=None))
        for u, ts in events
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = str(tmp_path / "sf")
    os.makedirs(out, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def _run_case(spark, tmp_path, events):
    sf = _write_events(spark, tmp_path, events)
    rows = registry.QUERIES["session_overlap_pairs"](spark, sf).collect()
    got = [
        (r.rank_id, r.user_a, r.sess_a, r.user_b, r.sess_b, r.overlap_us)
        for r in sorted(rows, key=lambda r: r.rank_id)
    ]
    assert got == _python_top20(events)


_H = 3_600_000_000  # one hour in us
_BASE = 1_700_000_000_000_000  # epoch us anchor
_STEP = 540_000_000  # 9 min — under the 10-min gap, so a span stays one session


def _session(user, start_us, end_us):
    """Events every 9 minutes so [start, end] forms ONE session under the
    10-minute gap rule (the exact end timestamp is always included)."""
    ts = list(range(start_us, end_us, _STEP)) + [end_us]
    return [(user, t) for t in ts]


def test_session_overlap_t0_path_under_20_pairs(spark, tmp_path):
    """< 20 valid pairs among the longest sessions -> T = 0 -> the prune
    must be a no-op and every overlapping pair must still be found."""
    ev = []
    # 5 users with one 2h session each, all overlapping -> C(5,2)=10 pairs
    for u in range(1, 6):
        ev += _session(u, _BASE + u * 60_000_000, _BASE + 2 * _H + u * 60_000_000)
    # plus two non-overlapping singleton users far away
    ev += [(97, _BASE + 100 * _H), (98, _BASE + 300 * _H)]
    _run_case(spark, tmp_path, ev)


def test_session_overlap_threshold_tie_boundary(spark, tmp_path):
    """21 pairs all with overlap == session length == T exactly (7 users
    with IDENTICAL 20h sessions -> C(7,2)=21 pairs, every overlap equals
    every length): T becomes exactly len, so a strict `len > T` prune
    would drop all seven sessions and return nothing — the >= must keep
    them, and the 21st tied pair must fall to the id tie-break.  Shorter
    sessions elsewhere sit below T and are pruned (python reference
    agrees: their ranks are > 20)."""
    ev = []
    for u in range(1, 8):
        ev += _session(u, _BASE, _BASE + 20 * _H)
    # three users with mutual 1h overlaps far away -> below T, pruned
    for u in (60, 61, 62):
        ev += _session(u, _BASE + 900 * _H, _BASE + 901 * _H)
    _run_case(spark, tmp_path, ev)


def test_session_overlap_dense_identical_sessions(spark, tmp_path):
    """40 identical sessions in one cell: the length prune is a no-op
    (all lengths equal T), every pair ties on overlap, and the answer is
    pure id-quadruple tie-breaking through the emit-once cell rule."""
    ev = []
    for u in range(1, 41):
        ev += _session(u, _BASE, _BASE + _H // 2)
    _run_case(spark, tmp_path, ev)


def test_session_overlap_multicell_emit_once(spark, tmp_path):
    """Sessions spanning MANY grid cells (days long): the emit-once rule
    must produce each pair exactly once (the old distinct is gone — a
    double emission would surface as a duplicated rank row)."""
    ev = []
    for u in range(1, 7):
        # 30h sessions, staggered starts so overlaps differ per pair
        ev += _session(u, _BASE + u * 2 * _H, _BASE + u * 2 * _H + 30 * _H)
    # a pair that touches only at a cell-boundary instant -> overlap 0,
    # must NOT appear
    ev += _session(80, _BASE + 200 * _H, _BASE + 201 * _H)
    ev += _session(81, _BASE + 201 * _H, _BASE + 202 * _H)
    _run_case(spark, tmp_path, ev)


# ---------------------------------------------------------------- fixture


def _cos(a, b):
    num = math.fsum(x * y for x, y in zip(a, b))
    return num / math.sqrt(
        math.fsum(x * x for x in a) * math.fsum(y * y for y in b)
    )


def _one_vec_df(spark):
    base = [float(j + 1) for j in range(64)]
    return base, spark.createDataFrame(
        [(1, base)], "vec_id long, embedding array<double>"
    )


def test_signed_perm_spark_matches_python(spark):
    base, df = _one_vec_df(spark)
    for r in (1, 313, 3999):
        got = _msf.replicate(df, "embeddings", r, copies=4000).collect()[0][1]
        perm, signs = _msf._emb_signed_perm(r, 64)
        want = [signs[j] * base[perm[j]] for j in range(64)]
        assert got == want, f"replica {r} transform mismatch"


def test_signed_perm_kills_rotation_class_correlation(spark):
    """The legacy family's contamination pair: q=2 vs q=3 (replicas 128+c
    and 192+c share the rotation and 63/64 sign bits -> cosine ~ 0.998).
    The signed-perm family must keep the same replica pair at the
    random-vector baseline (|cos| well under the SRP near-dup region)."""
    base, df = _one_vec_df(spark)
    r1, r2 = 128 + 5, 192 + 5

    legacy = [
        _msf.replicate(df, "embeddings", r, copies=300, emb_family="rotsign")
        .collect()[0][1]
        for r in (r1, r2)
    ]
    assert _cos(*legacy) > 0.9  # the planted near-duplicate, demonstrated

    new = [
        _msf.replicate(df, "embeddings", r, copies=300).collect()[0][1]
        for r in (r1, r2)
    ]
    assert abs(_cos(*new)) < 0.5

    # and broadly: across a sweep of same-class pairs the new family stays
    # bounded (md5-deterministic, so this is a pin, not a flake)
    vecs = {
        r: _msf.replicate(df, "embeddings", r, copies=1000).collect()[0][1]
        for r in range(1, 11)
    }
    for r in range(1, 11):
        for r2 in range(r + 1, 11):
            assert abs(_cos(vecs[r], vecs[r2])) < 0.5, (r, r2)


def test_rotsign_legacy_still_pinned(spark):
    """--emb-family rotsign must reproduce the pre-r11 transform bit-for-
    bit (fixtures built in earlier rounds remain rebuildable)."""
    base, df = _one_vec_df(spark)
    got = _msf.replicate(df, "embeddings", 1, copies=10, emb_family="rotsign")
    emb = got.collect()[0][1]
    assert emb == base[1:] + base[:1]  # rotation by 1, q=0 (no signs)
