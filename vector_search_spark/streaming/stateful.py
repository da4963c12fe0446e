"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.6 / brief: "applyInPandasWithState for custom stateful
operators").

``running_user_totals``: per-user running aggregate state (event count,
value cents, last-seen micros) maintained across micro-batches, emitting
the updated totals for every user touched in each batch.  State lives in
the state store (checkpointed, fault-tolerant); a GroupStateTimeout could
evict idle users — kept NoTimeout here so the drained result is exactly
comparable to the batch aggregate in tests.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, value_cents long, last_seen_us long"
STATE_SCHEMA = "n long, cents long, last_us long"


def _update_user(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # cents per row with the engine's deterministic money rule
        cents += int((pdf["value"] * 100.0 + 0.5).astype("int64").sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "value_cents": cents, "last_seen_us": last_us}]
    )


PER_EVENT_SCHEMA = "user_id long, event_id long, ts_us long, cum_value_cents long"
PER_EVENT_STATE = "cum long"


def _update_per_event(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (cum,) = state.get if state.exists else (0,)
    out_rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for eid, ts, v in zip(pdf["event_id"], pdf["ts_us"], pdf["value"]):
            cum += int(v * 100.0 + 0.5)  # same deterministic cents rule
            out_rows.append((key[0], int(eid), int(ts), cum))
    state.update((cum,))
    yield pd.DataFrame(
        out_rows, columns=["user_id", "event_id", "ts_us", "cum_value_cents"]
    )


def per_event_running_value(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``user_running_value`` cumulative column:
    one output row PER EVENT carrying the user's running cents total, state
    = a single long per user.

    Correct cumulative order requires per-user event-time order across
    micro-batches (upstream watermark+sort, or source ordering as in the
    tests); within a batch rows are sorted here.
    """
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id", "event_id", "value", F.expr("ts_ns DIV 1000").alias("ts_us")
    ).groupBy("user_id")
    return keyed.applyInPandasWithState(
        _update_per_event,
        outputStructType=PER_EVENT_SCHEMA,
        stateStructType=PER_EVENT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ASOF_SCHEMA = "user_id long, event_id long, ts_us long, asof_value_cents long"
ASOF_STATE = "r_ts long, r_cents long"


def _update_asof(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    r_ts, r_cents = state.get if state.exists else (-1, -1)
    out_rows = []
    for pdf in pdfs:
        # right-before-left on ts ties (tag 0 < 1) makes the match
        # INCLUSIVE (right.ts <= left.ts) — same order as the batch window
        pdf = pdf.sort_values(["ts_us", "tag", "event_id"])
        for tag, eid, ts, cents in zip(
            pdf["tag"], pdf["event_id"], pdf["ts_us"], pdf["r_cents"]
        ):
            if tag == 0:
                r_ts, r_cents = int(ts), int(cents)
            else:
                out_rows.append((key[0], int(eid), int(ts), r_cents))
    state.update((r_ts, r_cents))
    yield pd.DataFrame(
        out_rows, columns=["user_id", "event_id", "ts_us", "asof_value_cents"]
    )


def streaming_asof_backward(tagged: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.asof.asof_join_backward``: attach to each
    left row the most recent right-side payload with ``right.ts <= left.ts``
    for the same key (sentinel -1 before any right row, matching the repo's
    NULL-free numeric convention).

    Input is the tagged union the batch operator builds internally —
    columns ``(user_id, event_id, ts_us, tag, r_cents)`` with tag 0 = right
    rows (r_cents = payload) and tag 1 = left rows — here arriving as a
    STREAM.  State per key is a single (ts, payload) pair: O(1) memory per
    key regardless of history length, checkpointed and fault-tolerant.

    Correctness across micro-batches requires per-key event-time order
    between batches (upstream watermark+sort, or source ordering as in the
    tests); within a batch rows are sorted here.  At scale this is the
    standard streaming point-in-time enrichment: the state store shards by
    key across executors, no shuffle of history, no replay.
    """
    return tagged.groupBy("user_id").applyInPandasWithState(
        _update_asof,
        outputStructType=ASOF_SCHEMA,
        stateStructType=ASOF_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame (user_id, value, ts_us) → running totals per user.

    Each micro-batch folds its rows into the user's GroupState and emits
    the new totals (Update output mode).
    """
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id", "value", F.expr("ts_ns DIV 1000").alias("ts_us")
    ).groupBy("user_id")
    return keyed.applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_SCHEMA = "event_type string, n_seen long, harm_scaled long, hll_est double"
HLL_STATE = "regs array<long>"


def _update_hll(key, pdfs, state: GroupState):
    """Fold each micro-batch's rows into the key's 512 HLL registers and
    emit the refreshed estimate.  The hash/register/fold math mirrors
    ``operators.sketches`` exactly (same md5 salt, same scaled-integer
    harmonic sum), so the drained stream reproduces the batch estimate."""
    import hashlib
    import math

    from vector_search_spark.operators.sketches import HLL_M, HLL_P

    rest_bits = 60 - HLL_P
    rest_mask = (1 << rest_bits) - 1
    regs = list(state.get[0]) if state.exists else [0] * HLL_M
    for pdf in pdfs:
        for uid in pdf["user_id"]:
            h = int(
                hashlib.md5(f"hll:{int(uid)}".encode()).hexdigest()[:15], 16
            )
            bucket, rest = h >> rest_bits, h & rest_mask
            rho = rest_bits + 1 if rest == 0 else rest_bits + 1 - rest.bit_length()
            if rho > regs[bucket]:
                regs[bucket] = rho
    state.update((regs,))
    scale = 1 << (rest_bits + 1)
    n_seen = sum(1 for m in regs if m > 0)
    harm_scaled = sum(1 << (rest_bits + 1 - m) for m in regs if m > 0)
    total = harm_scaled + (HLL_M - n_seen) * scale
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M
    raw = alpha * float(scale) / float(total)
    v = HLL_M - n_seen
    est = HLL_M * math.log(HLL_M / v) if (raw <= 2.5 * HLL_M and v > 0) else raw
    yield pd.DataFrame(
        [
            {
                "event_type": key[0],
                "n_seen": n_seen,
                "harm_scaled": harm_scaled,
                "hll_est": est,
            }
        ]
    )


def streaming_hll_distinct(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch HLL sketch (``hll_distinct_users``):
    per-event-type distinct-user estimate maintained incrementally.

    State per key is the fixed 512-register array — O(1) memory per group
    forever, the property that makes sketch cardinality THE streaming
    distinct-count at scale (exact distinct state grows with cardinality).
    Update mode: each micro-batch emits the refreshed estimate per touched
    group; the final emission equals the batch sketch over the same rows
    (register merge is idempotent/commutative, so late or reordered rows
    cannot change the drained result).
    """
    keyed = events.select("event_type", "user_id").groupBy("event_type")
    return keyed.applyInPandasWithState(
        _update_hll,
        outputStructType=HLL_SCHEMA,
        stateStructType=HLL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HDRQ_SCHEMA = (
    "event_type string, n long, p50_cents long, p95_cents long, p99_cents long"
)
HDRQ_STATE = "lbs array<long>, cnts array<long>"


def _update_hdrq(key, pdfs, state: GroupState):
    """Fold each micro-batch into the key's HDR bucket counters and emit
    refreshed p50/p95/p99.  Bucket math mirrors
    ``operators.sketches.hdr_bucket_sql`` exactly (top-5-significant-bit
    integer buckets), so the drained stream reproduces the batch sketch."""
    import math

    if state.exists:
        lbs, cnts = state.get
        d = dict(zip(lbs, cnts))
    else:
        d = {}
    for pdf in pdfs:
        for v in pdf["value"]:
            c = int(math.floor(float(v) * 100.0 + 0.5))
            s = max(c.bit_length() - 5, 0)
            lb = (c >> s) << s
            d[lb] = d.get(lb, 0) + 1
    state.update((list(d.keys()), list(d.values())))
    n = sum(d.values())
    ests = {}
    for p in (50, 95, 99):
        r = (n * p + 99) // 100
        cum = 0
        for lb in sorted(d):
            cum += d[lb]
            if cum >= r:
                ests[p] = lb
                break
    yield pd.DataFrame(
        [
            {
                "event_type": key[0],
                "n": n,
                "p50_cents": ests[50],
                "p95_cents": ests[95],
                "p99_cents": ests[99],
            }
        ]
    )


def streaming_hdr_quantiles(events: DataFrame) -> DataFrame:
    """Streaming twin of the HDR quantile sketch (`value_quantile_sketch`'s
    sketch side): per-event-type p50/p95/p99 maintained incrementally.

    State per key is the bucket→count table — at most ~16×64 integer
    entries forever (the mergeability the batch pytest proves is what
    makes the incremental fold exact: counts are additive, extraction is
    a pure fold of counts).  Streaming percentiles with O(1) state is the
    production alternative to exact percentiles' O(n) sort state.
    """
    keyed = events.select("event_type", "value").groupBy("event_type")
    return keyed.applyInPandasWithState(
        _update_hdrq,
        outputStructType=HDRQ_SCHEMA,
        stateStructType=HDRQ_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CMSS_SCHEMA = "event_type string, n long, top_user long, top_est long"
CMSS_STATE = "cnts array<long>"


def _update_cms(key, pdfs, state: GroupState):
    """Fold each micro-batch into the key's depth x width count-min
    counters and emit the current heaviest-seen user's estimate.  Hash
    math mirrors ``operators.sketches._cms_bucket`` exactly (md5
    'cms{j}:' salts), so drained counters equal the batch sketch's."""
    import hashlib

    from vector_search_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH

    cnts = list(state.get[0]) if state.exists else [0] * (CMS_DEPTH * CMS_WIDTH)
    seen = set()
    for pdf in pdfs:
        for uid in pdf["user_id"]:
            uid = int(uid)
            seen.add(uid)
            for j in range(CMS_DEPTH):
                b = int(
                    hashlib.md5(f"cms{j}:{uid}".encode()).hexdigest()[:8], 16
                ) % CMS_WIDTH
                cnts[j * CMS_WIDTH + b] += 1
    state.update((cnts,))

    def est(uid: int) -> int:
        return min(
            cnts[j * CMS_WIDTH
                 + int(hashlib.md5(f"cms{j}:{uid}".encode()).hexdigest()[:8], 16)
                 % CMS_WIDTH]
            for j in range(CMS_DEPTH)
        )

    n = sum(cnts) // CMS_DEPTH
    top_user, top_est = -1, -1
    for uid in sorted(seen):
        e = est(uid)
        if e > top_est:
            top_user, top_est = uid, e
    yield pd.DataFrame(
        [{"event_type": key[0], "n": n, "top_user": top_user, "top_est": top_est}]
    )


def streaming_cms_counts(events: DataFrame) -> DataFrame:
    """Streaming count-min sketch per event type: O(depth x width) integer
    state per key forever, emitting the micro-batch's heaviest user
    estimate.  Completes the streaming sketch family (HLL cardinality,
    HDR quantiles, CMS frequencies) — all three states are fixed-size
    arrays whose merges are commutative, so drained results are
    micro-batching-independent.
    """
    keyed = events.select("event_type", "user_id").groupBy("event_type")
    return keyed.applyInPandasWithState(
        _update_cms,
        outputStructType=CMSS_SCHEMA,
        stateStructType=CMSS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming session funnel: gaps-and-islands sessionization + strict-order
# stage tracking, O(1) state per user.
# ---------------------------------------------------------------------------
FUNNEL_SCHEMA = "user_id long, sid long, v_us long, c_us long, p_us long"
FUNNEL_STATE = "last_us long, sid long, v long, c long, p long"
FUNNEL_GAP_US = 600_000_000


def _update_funnel(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    last_us, sid, v, c, p = state.get if state.exists else (-1, -1, -1, -1, -1)
    snap: dict[int, tuple[int, int, int]] = {}
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for eid, ts, et in zip(pdf["event_id"], pdf["ts_us"], pdf["event_type"]):
            ts = int(ts)
            if last_us < 0 or ts - last_us >= FUNNEL_GAP_US:
                sid += 1
                v = c = p = -1
            last_us = ts
            if et == "view" and v < 0:
                v = ts
            elif et == "click" and v >= 0 and ts > v and c < 0:
                c = ts
            elif et == "purchase" and c >= 0 and ts > c and p < 0:
                p = ts
            snap[sid] = (v, c, p)
    state.update((last_us, sid, v, c, p))
    yield pd.DataFrame(
        [(key[0], s, *vcp) for s, vcp in sorted(snap.items())],
        columns=["user_id", "sid", "v_us", "c_us", "p_us"],
    )


def streaming_session_funnel(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``event_funnel`` sessionized funnel:
    10-minute-gap sessions with strict-order stage times (first view →
    first click strictly after it → first purchase strictly after that),
    maintained as FIVE longs of state per user — O(1) forever, regardless
    of history (the batch query's windows become a single left-fold).

    Emits, per micro-batch, the latest (v_us, c_us, p_us) snapshot of every
    session the batch touched (−1 sentinels until a stage fires); fields
    are monotone (−1 → timestamp, set once), so the final value per
    (user, sid) is the per-column MAX over emissions — the reduction the
    stream≡batch test applies.  Ordering contract identical to the other
    stateful twins: per-user event-time order across micro-batches, rows
    sorted within each batch here.
    """
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id", "event_id", "event_type", F.expr("ts_ns DIV 1000").alias("ts_us")
    ).groupBy("user_id")
    return keyed.applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EXPDECAY_SCHEMA = "grp int, day long, decayed_micro_cents long"
EXPDECAY_STATE = "days array<long>, cents array<long>"


def _update_expdecay(key, pdfs, state: GroupState):
    """Fold each micro-batch's integer cents into the per-day map, then
    re-emit the decayed inner product for EVERY day in state — late or
    reordered events only ever ADD to a day's cents, and the decayed
    value is a linear function of them, so the last emission per day
    after a drain equals the batch fold (commutative, order-free)."""
    import math

    from ..registry_analytics import DECAY_HORIZON, DECAY_W_MICRO

    if state.exists:
        days, cents = state.get
        d = dict(zip(days, cents))
    else:
        d = {}
    for pdf in pdfs:
        for day, v in zip(pdf["day"], pdf["value"]):
            dd = day.toordinal()
            d[dd] = d.get(dd, 0) + int(math.floor(float(v) * 100.0 + 0.5))
    state.update((list(d.keys()), list(d.values())))
    rows = []
    for day in sorted(d):
        s = 0
        for off in range(DECAY_HORIZON):
            prev = day - off
            if prev in d:
                s += d[prev] * DECAY_W_MICRO[off]
        rows.append((key[0], day, s))
    yield pd.DataFrame(rows, columns=["grp", "day", "decayed_micro_cents"])


def streaming_exp_decay(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``exp_decay_daily_value`` feature: the
    λ-decayed daily value maintained incrementally from the same quantized
    integer weights, so the drained stream reproduces the batch result
    EXACTLY (the decayed sum is linear in per-day cents, and cents folds
    are commutative integers — micro-batch order cannot matter).

    State is the (day → cents) map.  The fixture keeps every day (30
    distinct days); at scale the production knob is the stream's
    watermark: days more than `DECAY_HORIZON` behind the watermark are
    frozen (their windows can no longer change), emitted once, and
    evicted — bounding state to O(horizon) per key like every other
    stateful twin here."""
    from pyspark.sql import functions as F

    keyed = events.select(
        F.lit(1).alias("grp"), F.col("ts").cast("date").alias("day"), "value"
    ).groupBy("grp")
    return keyed.applyInPandasWithState(
        _update_expdecay,
        outputStructType=EXPDECAY_SCHEMA,
        stateStructType=EXPDECAY_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PATH_SCHEMA = "user_id long, path string"
PATH_STATE = "last_us long, t1 string, t2 string"


def _update_paths(key, pdfs, state: GroupState):
    """Per-user 3-gram path completion with the batch sessionization rule
    (gap >= 10 min starts a new session and clears the path context).
    State: last event time + last two in-session event types — O(1)."""
    last_us, t1, t2 = state.get if state.exists else (-1, None, None)
    rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for us, et in zip(pdf["ts_us"], pdf["event_type"]):
            us = int(us)
            if last_us >= 0 and us - last_us >= 600_000_000:
                t1, t2 = None, None
            if t1 is not None and t2 is not None:
                rows.append((key[0], f"{t1}>{t2}>{et}"))
            t1, t2 = t2, et
            last_us = us
    state.update((last_us, t1, t2))
    yield pd.DataFrame(rows, columns=["user_id", "path"])


def streaming_path_trigrams(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``top_event_paths`` mining: every
    session-bounded three-step path emitted AS IT COMPLETES, from three
    fields of per-user state (last event time + last two event types) —
    the batch query's two lead() windows become a shift register.

    Drained-stream counts per path equal the batch trigram counts exactly
    (same gap rule, same strict (us, event_id) order); the stream adds
    what batch can't give — paths surface with per-event latency, not
    per-snapshot.  Ordering contract as the other twins: per-user
    event-time order across micro-batches."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id", "event_id", "event_type", F.expr("ts_ns DIV 1000").alias("ts_us")
    ).groupBy("user_id")
    return keyed.applyInPandasWithState(
        _update_paths,
        outputStructType=PATH_SCHEMA,
        stateStructType=PATH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_SCHEMA = "event_type string, sk_n long, theta long"
KMV_STATE = "hashes array<long>"
_KMV_STREAM_K = 128
_KMV_STREAM_H = 16**15


def _update_kmv(key, pdfs, state: GroupState):
    """Merge each micro-batch's 60-bit md5 user hashes into the K smallest
    distinct set — the KMV merge is a set-union + truncation, so state is
    bounded at K longs and ANY merge order yields the same sketch."""
    import hashlib

    (hashes,) = state.get if state.exists else ([],)
    s = set(hashes)
    for pdf in pdfs:
        for uid in pdf["user_id"]:
            h = int(
                hashlib.md5(f"kmv:{int(uid)}".encode()).hexdigest()[:15], 16
            )
            s.add(h)
    merged = sorted(s)[:_KMV_STREAM_K]
    state.update((merged,))
    theta = _KMV_STREAM_H if len(merged) < _KMV_STREAM_K else merged[-1]
    yield pd.DataFrame(
        [(key[0], len(merged), theta)], columns=["event_type", "sk_n", "theta"]
    )


def streaming_kmv_sketch(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch KMV (theta) sketch behind
    ``kmv_distinct_overlap``: per event type, the K=128 smallest distinct
    md5 hash values maintained incrementally.  KMV union is commutative
    and idempotent (set-union then truncate), so the drained stream's
    final sketch is bit-identical to the batch sketch regardless of
    micro-batch boundaries — the mergeability property that makes theta
    sketches the cross-partition (and cross-stream) distinct/overlap
    primitive.  theta is monotone non-increasing across emissions."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_kmv,
        outputStructType=KMV_SCHEMA,
        stateStructType=KMV_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
