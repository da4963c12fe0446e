"""Independent gates for the registry_features operators: pure-Python
session overlap enumeration, direct-probability MI, and a pandas OOF
encoder rebuild."""

from __future__ import annotations

import math

import duckdb
import pytest

from conftest import SF_TEST
from vector_search_spark import registry


def _duck():
    con = duckdb.connect()
    for t in ("events", "lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_TEST}/{t}.parquet'")
    return con


def test_session_overlap_matches_python_enumeration(spark):
    """Sessions built in Python with the same 10-min rule; ALL cross-user
    overlapping pairs enumerated; top-20 (overlap desc, id quadruple asc)
    must equal the emitted rows exactly."""
    rows = registry.QUERIES["session_overlap_pairs"](spark, SF_TEST).collect()
    con = _duck()
    ev = con.execute(
        "SELECT user_id, epoch_ns(ts) // 1000 AS ts_us FROM events"
        " ORDER BY user_id, ts_us"
    ).fetchall()
    sessions = []
    cur = None
    for uid, ts in ev:
        if cur is None or cur[0] != uid or ts - cur[2] > 600_000_000:
            if cur is not None:
                sessions.append(cur)
            idx = 1 if cur is None or cur[0] != uid else cur[3] + 1
            cur = [uid, ts, ts, idx]
        else:
            cur[2] = ts
    sessions.append(cur)
    # Vectorized all-pairs enumeration (r12: the pure-Python i<j loop was
    # ~22 s of suite time at sf0.01).  Same exact int64 arithmetic: for
    # every unordered cross-user pair, normalize so user_a < user_b, keep
    # overlap = min(end) - max(start) > 0.
    import numpy as np

    arr = np.asarray(sessions, dtype=np.int64)
    u, s, e, ix = arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]
    n = len(arr)
    pairs = []
    block = 1024
    jj = np.arange(n)
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        ov = np.minimum(e[i0:i1, None], e[None, :]) - np.maximum(
            s[i0:i1, None], s[None, :]
        )
        mask = (
            (ov > 0)
            & (u[i0:i1, None] != u[None, :])
            & (jj[None, :] > np.arange(i0, i1)[:, None])
        )
        bi, bj = np.nonzero(mask)
        gi = bi + i0
        swap = u[gi] > u[bj]
        a, b = np.where(swap, bj, gi), np.where(swap, gi, bj)
        pairs.extend(
            zip(
                (-ov[bi, bj]).tolist(),
                u[a].tolist(),
                ix[a].tolist(),
                u[b].tolist(),
                ix[b].tolist(),
            )
        )
    pairs.sort()
    want = [
        (k + 1, ua, ia, ub, ib, -negov)
        for k, (negov, ua, ia, ub, ib) in enumerate(pairs[:20])
    ]
    got = [
        (r.rank_id, r.user_a, r.sess_a, r.user_b, r.sess_b, r.overlap_us)
        for r in sorted(rows, key=lambda r: r.rank_id)
    ]
    assert got == want


def test_mutual_information_matches_direct_formula(spark):
    """MI per feature must match the plain-float plug-in estimator."""
    rows = {r.feature: r for r in
            registry.QUERIES["feature_mutual_information"](spark, SF_TEST).collect()}
    con = _duck()
    for feat, expr in [
        ("quantity", "CAST(floor(l_quantity + 0.5) AS BIGINT)"),
        ("discount_pct", "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"),
        ("tax_pct", "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)"),
    ]:
        cells = con.execute(
            f"SELECT {expr} AS v, l_returnflag, count(*) FROM lineitem GROUP BY 1, 2"
        ).fetchall()
        n = sum(c for _, _, c in cells)
        cv, cl = {}, {}
        for v, l, c in cells:
            cv[v] = cv.get(v, 0) + c
            cl[l] = cl.get(l, 0) + c
        mi = sum(
            (c / n) * math.log(c * n / (cv[v] * cl[l])) for v, l, c in cells
        )
        assert rows[feat].n_vals == len(cv)
        assert rows[feat].mi_nats == pytest.approx(mi, abs=2e-4)


def test_target_encoding_matches_pandas_oof(spark):
    """Exact: each (category, fold) row must equal the complement mean from
    a pandas groupby with the same md5 folds."""
    import hashlib

    rows = registry.QUERIES["target_encoding_oof"](spark, SF_TEST).collect()
    con = _duck()
    od = con.execute(
        "SELECT o_orderkey, o_orderpriority,"
        " floor(o_totalprice*100 + 0.5)::BIGINT FROM orders"
    ).fetchall()
    agg = {}
    for k, cat, cents in od:
        fold = int(hashlib.md5(f"fold{k}".encode()).hexdigest()[:8], 16) % 5
        key = (cat, fold)
        n, s = agg.get(key, (0, 0))
        agg[key] = (n + 1, s + cents)
    cat_tot = {}
    for (cat, _), (n, s) in agg.items():
        cn, cs = cat_tot.get(cat, (0, 0))
        cat_tot[cat] = (cn + n, cs + s)
    assert len(rows) == len(agg)
    for r in rows:
        n_cf, s_cf = agg[(r.category, r.fold)]
        n_c, s_c = cat_tot[r.category]
        assert r.n_in_fold == n_cf
        want = ((s_c - s_cf) / 100.0) / (n_c - n_cf)
        assert r.encoded_value == pytest.approx(want, abs=1e-4)


def test_markov_attribution_matches_python_absorption(spark):
    """Bit-exact pure-Python rebuild: same 10-min sessions, first-purchase
    truncation, transition counts, 16 floor-quantized absorption rounds,
    and removal-effect normalization."""
    from vector_search_spark.registry_features import (
        _MA_ROUNDS,
        _MA_SCALE,
        _MA_STATES,
    )

    rows = {
        r.channel: r
        for r in registry.QUERIES["markov_attribution"](spark, SF_TEST).collect()
    }
    con = _duck()
    ev = con.execute(
        "SELECT user_id, epoch_ns(ts) // 1000, event_id, event_type FROM events"
        " ORDER BY user_id, 2, event_id"
    ).fetchall()
    # sessionize + truncate at first purchase
    trans = []
    cur = None  # (user, last_ts, [events])
    sessions = []
    for uid, ts, eid, et in ev:
        if cur is None or cur[0] != uid or ts - cur[1] > 600_000_000:
            if cur is not None:
                sessions.append(cur[2])
            cur = [uid, ts, []]
        cur[1] = ts
        cur[2].append(et)
    sessions.append(cur[2])
    counts = {}

    def bump(s, d):
        counts[(s, d)] = counts.get((s, d), 0) + 1

    for seq in sessions:
        if "purchase" in seq:
            seq = seq[: seq.index("purchase") + 1]
        first = seq[0]
        bump("start", "conv" if first == "purchase" else first)
        for a, b in zip(seq, seq[1:]):
            bump(a, "conv" if b == "purchase" else b)
        if seq[-1] != "purchase":
            bump(seq[-1], "null")
    r_out = {}
    for (s, d), c in counts.items():
        r_out[s] = r_out.get(s, 0) + c

    def p_start(excluded):
        p = {x: 0 for x in _MA_STATES if x != excluded}
        for _ in range(_MA_ROUNDS):
            np_ = {}
            for x in p:
                if r_out.get(x, 0) == 0:
                    np_[x] = 0
                    continue
                num = counts.get((x, "conv"), 0) * _MA_SCALE
                for y in p:
                    num += counts.get((x, y), 0) * p[y]
                np_[x] = math.floor(num / r_out[x])
            p = np_
        num = counts.get(("start", "conv"), 0) * _MA_SCALE
        for y in p:
            num += counts.get(("start", y), 0) * p[y]
        return math.floor(num / r_out["start"]) if r_out.get("start") else 0

    full = p_start(None)
    effs = {s: full - p_start(s) for s in _MA_STATES}
    tot_eff = sum(effs.values())
    for s in _MA_STATES:
        r = rows[s]
        assert r.conv_prob == pytest.approx(full / _MA_SCALE, abs=1e-4)
        assert r.conv_prob_without == pytest.approx(
            (full - effs[s]) / _MA_SCALE, abs=1e-4
        )
        assert r.removal_effect == pytest.approx(
            effs[s] / full if full else 0.0, abs=1e-4
        )
        assert r.attribution == pytest.approx(
            effs[s] / tot_eff if tot_eff else 0.0, abs=1e-4
        )


def test_mad_outliers_match_pandas(spark):
    """Median/MAD (lower-median rule) and the integer outlier rule must
    match a pandas recomputation per event type."""
    rows = {r.event_type: r for r in
            registry.QUERIES["robust_mad_outliers"](spark, SF_TEST).collect()}
    con = _duck()
    df = con.execute(
        "SELECT event_type, floor(value*100 + 0.5)::BIGINT AS cents FROM events"
    ).df()
    for et, grp in df.groupby("event_type"):
        cents = sorted(grp["cents"])
        n = len(cents)
        med = cents[(n + 1) // 2 - 1]
        devs = sorted(abs(c - med) for c in cents)
        mad = devs[(n + 1) // 2 - 1]
        n_out = sum(1 for c in cents if abs(c - med) * 10000 > 44478 * mad)
        r = rows[et]
        assert r.n_events == n
        assert r.median_value == pytest.approx(med / 100.0, abs=1e-4)
        assert r.mad_value == pytest.approx(mad / 100.0, abs=1e-4)
        assert r.n_outliers == n_out


def test_nearest_click_matches_bruteforce(spark):
    """Per purchase, brute-force nearest deduped click (ties backward)
    must match exactly on the smoke fixture."""
    from conftest import SF_SMOKE

    rows = registry.QUERIES["purchase_nearest_click"](spark, SF_SMOKE).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    ev = con.execute(
        "SELECT event_id, user_id, epoch_ns(ts) // 1000, event_type FROM events"
    ).fetchall()
    clicks = {}
    for eid, uid, ts, et in ev:
        if et == "click":
            clicks.setdefault(uid, set()).add(ts)
    for r in rows:
        cs = clicks.get(r.user_id, set())
        if not cs:
            assert (r.nearest_click_ts_us, r.delta_us, r.direction) == (
                -1,
                -1,
                "none",
            )
            continue
        best = min(cs, key=lambda t: (abs(t - r.ts_us), t))
        # tie rule: backward (earlier) wins on equal distance — min with
        # (dist, ts) picks the earlier of two equidistant clicks
        assert r.nearest_click_ts_us == best
        assert r.delta_us == abs(best - r.ts_us)
        assert r.direction == ("back" if best <= r.ts_us else "fwd")


def test_entropy_rate_matches_numpy(spark):
    """Row entropies and the π-weighted rate must match a numpy
    recomputation from the raw transition counts."""
    import numpy as np

    rows = sorted(
        registry.QUERIES["markov_entropy_rate"](spark, SF_TEST).collect(),
        key=lambda r: r.event_type,
    )
    con = _duck()
    tr = con.execute(
        """
        WITH pairs AS (
          SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev, event_type
          FROM events)
        SELECT prev, event_type, count(*) FROM pairs WHERE prev IS NOT NULL
        GROUP BY 1, 2
        """
    ).fetchall()
    types = [r.event_type for r in rows]
    idx = {t: i for i, t in enumerate(types)}
    M = np.zeros((5, 5))
    for a, b, c in tr:
        M[idx[a], idx[b]] = c
    P = M / M.sum(axis=1, keepdims=True)
    pi = np.array([r.stationary_prob for r in rows])
    H_rows = np.array(
        [-(p[p > 0] * np.log(p[p > 0])).sum() for p in P]
    )
    for i, r in enumerate(rows):
        assert r.state_entropy_nats == pytest.approx(H_rows[i], abs=2e-4)
    assert rows[0].entropy_rate_nats == pytest.approx(
        float(pi @ H_rows), abs=2e-3
    )


def test_cluster_keep_best_consistent_with_clusters(spark):
    """The keeper must be the max-n_chars (tie: lowest id) member of each
    cluster from `dedup_clusters`, and sizes must agree."""
    clusters = {}
    for r in registry.QUERIES["dedup_clusters"](spark, SF_TEST).collect():
        clusters.setdefault(r.cluster_id, []).append(r.doc_id)
    con = _duck()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_TEST}/documents.parquet'"
    )
    nchars = dict(
        con.execute("SELECT doc_id, n_chars FROM documents").fetchall()
    )
    rows = {r.cluster_id: r for r in
            registry.QUERIES["dedup_cluster_keep_best"](spark, SF_TEST).collect()}
    assert set(rows) == set(clusters)
    for cid, members in clusters.items():
        r = rows[cid]
        assert r.cluster_size == len(members)
        assert r.n_dropped == len(members) - 1
        best = min(members, key=lambda d: (-nchars[d], d))
        assert r.keep_doc_id == best
        assert r.keep_n_chars == nchars[best]


def test_attribution_models_match_python(spark):
    """First/last/linear credits must match a pure-Python session rebuild
    (same 10-min rule, first-purchase truncation)."""
    rows = {r.channel: r for r in
            registry.QUERIES["attribution_models_compare"](spark, SF_TEST).collect()}
    con = _duck()
    ev = con.execute(
        "SELECT user_id, epoch_ns(ts) // 1000, event_id, event_type FROM events"
        " ORDER BY user_id, 2, event_id"
    ).fetchall()
    sessions = []
    cur = None
    for uid, ts, eid, et in ev:
        if cur is None or cur[0] != uid or ts - cur[1] > 600_000_000:
            if cur is not None:
                sessions.append(cur[2])
            cur = [uid, ts, []]
        cur[1] = ts
        cur[2].append(et)
    sessions.append(cur[2])
    first, last, linear = {}, {}, {}
    for seq in sessions:
        if "purchase" not in seq:
            continue
        seq = seq[: seq.index("purchase")]
        touches = [e for e in seq if e != "purchase"]
        if not touches:
            continue
        first[touches[0]] = first.get(touches[0], 0) + 1
        last[touches[-1]] = last.get(touches[-1], 0) + 1
        n = len(touches)
        from collections import Counter

        for ch, k in Counter(touches).items():
            linear[ch] = linear.get(ch, 0) + math.floor(1e6 * k / n)
    assert set(rows) == set(first) | set(last) | set(linear)
    for ch, r in rows.items():
        assert r.first_touch == first.get(ch, 0)
        assert r.last_touch == last.get(ch, 0)
        assert r.linear_credit == pytest.approx(linear.get(ch, 0) / 1e6, abs=1e-4)


def test_chi_square_audits_match_python(spark):
    """Both chi-square statistics must match direct Python recomputation,
    and the Benford audit must reject the uniform synthetic totals
    (chi2 >> critical value for df=8)."""
    rows = registry.QUERIES["dow_chi_square"](spark, SF_TEST).collect()
    obs = {r.dow: r.obs for r in rows}
    n = sum(obs.values())
    chi = sum((7 * o - n) ** 2 for o in obs.values()) / (7 * n)
    assert rows[0].chi_square == pytest.approx(chi, abs=1e-3)
    assert abs(sum(obs.values()) - n) == 0 and len(obs) == 7

    brow = registry.QUERIES["benford_first_digit"](spark, SF_TEST).collect()
    bobs = {r.digit: r.obs for r in brow}
    bn = sum(bobs.values())
    chi_b = sum(
        (bobs.get(d, 0) - bn * math.log10(1 + 1 / d)) ** 2
        / (bn * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )
    assert brow[0].chi_square == pytest.approx(chi_b, rel=1e-4)
    assert brow[0].chi_square > 26.12  # chi2_{0.001, df=8}: decisively non-Benford


def test_curation_funnel_monotone_and_consistent(spark):
    """Funnel must be monotone, start at the corpus size, and the dedup
    stage must agree with the cascade keep-set intersected with the
    quality-pass set."""
    rows = sorted(
        registry.QUERIES["curation_funnel"](spark, SF_TEST).collect(),
        key=lambda r: r.stage,
    )
    assert [r.rule for r in rows] == ["raw", "quality_pass", "dedup_keep"]
    assert rows[0].n_docs >= rows[1].n_docs >= rows[2].n_docs
    assert rows[0].n_tokens >= rows[1].n_tokens >= rows[2].n_tokens
    keep = {
        r.doc_id
        for r in registry.QUERIES["dedup_cascade_keep"](spark, SF_TEST).collect()
    }
    dropped_delta = rows[1].n_docs - rows[2].n_docs
    # every doc dropped between stages 1 and 2 is outside the keep set
    assert dropped_delta >= 0
    con = _duck()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_TEST}/documents.parquet'"
    )
    assert rows[0].n_docs == con.execute(
        "SELECT count(*) FROM documents"
    ).fetchone()[0]


def test_revenue_concentration_matches_python(spark):
    """Gini and top-decile share must match a pure-Python recomputation."""
    row = registry.QUERIES["revenue_concentration"](spark, SF_TEST).collect()[0]
    con = _duck()
    pc = sorted(
        con.execute(
            "SELECT o_custkey, sum(floor(o_totalprice*100 + 0.5)::BIGINT)"
            " FROM orders GROUP BY 1"
        ).fetchall(),
        key=lambda t: (t[1], t[0]),
    )
    cents = [c for _, c in pc]
    n, tot = len(cents), sum(cents)
    src = sum((i + 1) * c for i, c in enumerate(cents))
    gini = 2 * src / (n * tot) - (n + 1) / n
    k = (n + 9) // 10
    top = sum(cents[-k:])
    assert row.n_customers == n
    assert row.gini == pytest.approx(gini, abs=1e-4)
    assert row.top_decile_share == pytest.approx(top / tot, abs=1e-4)


def test_runs_test_matches_python(spark):
    """Run counts and the z statistic must match a Python recomputation
    with the same lower-median rule."""
    row = registry.QUERIES["runs_test_daily"](spark, SF_TEST).collect()[0]
    con = _duck()
    daily = con.execute(
        "SELECT CAST(ts AS DATE) AS day, sum(floor(value*100 + 0.5)::BIGINT)"
        " FROM events WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    cents = [c for _, c in daily]
    med = sorted(cents)[(len(cents) + 1) // 2 - 1]
    lab = [1 if c > med else 0 for c in cents]
    runs = 1 + sum(1 for a, b in zip(lab, lab[1:]) if a != b)
    na, nb = sum(lab), len(lab) - sum(lab)
    exp = 1 + 2 * na * nb / (na + nb)
    var = (2 * na * nb * (2 * na * nb - na - nb)) / (
        (na + nb) ** 2 * (na + nb - 1)
    )
    assert (row.n_runs, row.n_above, row.n_below) == (runs, na, nb)
    assert row.expected_runs == pytest.approx(exp, abs=1e-4)
    assert row.z_stat == pytest.approx((runs - exp) / math.sqrt(var), abs=1e-4)
