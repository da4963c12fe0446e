"""Semantic gates for the registry_ml model-fit operators — independent
reconstructions the oracle hash can't provide: numpy's lstsq for OLS, a
pandas brute-force split search for the stump, the fixed-point property for
the Markov stationary law, and a bit-exact pure-Python naive Bayes."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from conftest import SF_TEST
from vector_search_spark import registry


def _duck():
    con = duckdb.connect()
    for t in ("lineitem", "events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_TEST}/{t}.parquet'")
    return con


def test_ols_matches_numpy_lstsq(spark):
    """Cramer-solved betas and R² must agree with numpy's least squares on
    the same integer design (well-conditioned 3x3 — tight tolerance)."""
    row = registry.QUERIES["ols_price_model"](spark, SF_TEST).collect()[0]
    con = _duck()
    X = con.execute(
        "SELECT CAST(floor(l_quantity + 0.5) AS BIGINT),"
        " CAST(floor(l_discount * 100 + 0.5) AS BIGINT),"
        " CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) FROM lineitem"
    ).fetchnumpy()
    x1 = X[list(X)[0]].astype(np.float64)
    x2 = X[list(X)[1]].astype(np.float64)
    y = X[list(X)[2]].astype(np.float64)
    A = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert row.n_rows == len(y)
    assert row.beta_intercept == pytest.approx(beta[0], rel=1e-6, abs=1e-3)
    assert row.beta_quantity == pytest.approx(beta[1], rel=1e-6, abs=1e-3)
    assert row.beta_discount_pct == pytest.approx(beta[2], rel=1e-6, abs=1e-3)
    resid = y - A @ beta
    sst = ((y - y.mean()) ** 2).sum()
    r2 = 1.0 - (resid**2).sum() / sst
    assert row.r2 == pytest.approx(r2, abs=1e-4)


def test_stump_matches_bruteforce_split_search(spark):
    """For each feature the emitted (threshold, gain) must equal an exact
    brute-force Gini scan over every candidate split in pandas."""
    rows = {r.feature: r for r in
            registry.QUERIES["decision_stump_returns"](spark, SF_TEST).collect()}
    con = _duck()
    df = con.execute(
        "SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS quantity,"
        " CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS discount_pct,"
        " CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_pct,"
        " CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos FROM lineitem"
    ).df()
    n, p = len(df), int(df["pos"].sum())

    def gini(cnt, pos):
        if cnt == 0:
            return 0.0
        q = pos / cnt
        return 1.0 - q * q - (1.0 - q) * (1.0 - q)

    for feat in ("quantity", "discount_pct", "tax_pct"):
        grp = df.groupby(feat)["pos"].agg(["count", "sum"]).sort_index()
        best = None
        cum_n = cum_p = 0
        parent = gini(n, p)
        for val, row_ in grp.iterrows():
            cum_n += int(row_["count"])
            cum_p += int(row_["sum"])
            if cum_n >= n:
                continue
            gain = parent - (
                cum_n / n * gini(cum_n, cum_p)
                + (n - cum_n) / n * gini(n - cum_n, p - cum_p)
            )
            key = (math.floor(gain * 1e9 + 0.5), -val)
            if best is None or key > best[0]:
                best = (key, val, gain, cum_n, cum_p)
        r = rows[feat]
        assert r.threshold == best[1]
        assert r.gain == pytest.approx(best[2], abs=1e-4)
        assert (r.n_left, r.pos_left) == (best[3], best[4])
        assert (r.n_right, r.pos_right) == (n - best[3], p - best[4])


def test_markov_stationary_is_a_fixed_point(spark):
    """The emitted law must satisfy pi = pi·P within quantization error and
    sum to ~1 (floor quantization loses < 5e-6 mass per round)."""
    rows = sorted(
        registry.QUERIES["markov_stationary_events"](spark, SF_TEST).collect(),
        key=lambda r: r.event_type,
    )
    pi = np.array([r.stationary_prob for r in rows])
    assert pi.sum() == pytest.approx(1.0, abs=1e-3)
    con = _duck()
    C = con.execute(
        """
        WITH pairs AS (
          SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev, event_type
          FROM events)
        SELECT prev, event_type, count(*)::BIGINT AS c
        FROM pairs WHERE prev IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    types = [r.event_type for r in rows]
    idx = {t: i for i, t in enumerate(types)}
    M = np.zeros((5, 5))
    for a, b, c in C:
        M[idx[a], idx[b]] = c
    P = M / M.sum(axis=1, keepdims=True)
    assert np.abs(pi @ P - pi).max() < 1e-3
    # out_transitions must be the exact row sums
    for r in rows:
        assert r.out_transitions == int(M[idx[r.event_type]].sum())


def test_nb_confusion_matches_python_rebuild(spark):
    """Bit-exact: a pure-Python NB with the same md5 split, micro-nat
    quantization, and tie-breaks must reproduce the confusion matrix."""
    import hashlib
    from collections import Counter, defaultdict

    got = {
        (r.true_lang, r.pred_lang): r.n_docs
        for r in registry.QUERIES["nb_lang_classifier"](spark, SF_TEST).collect()
    }
    con = _duck()
    docs = con.execute(
        "SELECT doc_id, lang, text FROM documents WHERE trim(text) != ''"
    ).fetchall()

    def bucket(doc_id):
        h = hashlib.md5(f"nbsplit{doc_id}".encode()).hexdigest()[:8]
        return int(h, 16) % 5

    def toks(text):
        return text.strip().lower().split()

    train = [(l, toks(t)) for d, l, t in docs if bucket(d) != 0]
    test = [(d, l, toks(t)) for d, l, t in docs if bucket(d) == 0]
    cls_tok = defaultdict(Counter)
    d_l = Counter()
    vocab = set()
    for lang, tk in train:
        cls_tok[lang].update(tk)
        d_l[lang] += 1
        vocab.update(tk)
    V = len(vocab)
    d_tot = sum(d_l.values())
    micro = lambda x: math.floor(math.log(x) * 1_000_000 + 0.5)
    lsc = {
        (lang, tok): micro(c + 1)
        for lang, cnt in cls_tok.items()
        for tok, c in cnt.items()
    }
    norm_u = {lang: micro(sum(cnt.values()) + V) for lang, cnt in cls_tok.items()}
    prior_u = {lang: micro(d_l[lang]) - micro(d_tot) for lang in cls_tok}
    conf = Counter()
    for _, true_lang, tk in test:
        m_d = len(tk)
        scores = {}
        for lang in cls_tok:
            s = prior_u[lang] - m_d * norm_u[lang]
            for tok in tk:
                s += lsc.get((lang, tok), 0)
            scores[lang] = s
        pred = min(scores, key=lambda l: (-scores[l], l))
        conf[(true_lang, pred)] += 1
    assert got == dict(conf)


def test_bootstrap_ci_brackets_mean_and_matches_python(spark):
    """CI must bracket the point estimate, and a pure-Python replica
    rebuild (same md5 ladder) must reproduce the replica means exactly."""
    import hashlib

    from vector_search_spark.registry_ml import _BOOT_B, _POIS_T

    rows = registry.QUERIES["bootstrap_value_ci"](spark, SF_TEST).collect()
    con = _duck()
    ev = con.execute(
        "SELECT event_id, event_type, floor(value*100 + 0.5)::BIGINT FROM events"
    ).fetchall()
    by_type = {}
    for eid, et, cents in ev:
        by_type.setdefault(et, []).append((eid, cents))
    for r in rows:
        assert r.ci_lo <= r.ci_hi
        assert r.ci_lo <= r.mean_value <= r.ci_hi  # 32 replicas straddle
        data = by_type[r.event_type]
        assert r.n_events == len(data)
        means = []
        for b in range(_BOOT_B):
            sw = swc = 0
            for eid, cents in data:
                hx = hashlib.md5(f"bootg{b // 4}:{eid}".encode()).hexdigest()
                u = int(hx[(b % 4) * 8 : (b % 4) * 8 + 8], 16)
                w = next((k for k, t in enumerate(_POIS_T) if u < t), 7)
                sw += w
                swc += w * cents
            means.append((swc / 100.0) / sw)
        means.sort()
        assert r.ci_lo == pytest.approx(means[1], abs=1e-4)
        assert r.ci_hi == pytest.approx(means[_BOOT_B - 2], abs=1e-4)


def test_greedy_coverage_matches_python_greedy(spark):
    """Bit-exact vs a pure-Python greedy over the same bigram sets, and
    the gain curve must be non-increasing (submodularity of coverage)."""
    rows = registry.QUERIES["greedy_coverage_select"](spark, SF_TEST).collect()
    con = _duck()
    docs = con.execute(
        "SELECT doc_id, text FROM documents WHERE trim(text) != ''"
    ).fetchall()
    sets = {}
    for d, t in docs:
        tk = t.strip().lower().split()
        sets[d] = {f"{a} {b}" for a, b in zip(tk, tk[1:])}
    covered = set()
    chosen = set()
    want = []
    for _ in range(8):
        best = None
        for d, s in sets.items():
            if d in chosen:
                continue
            g = len(s - covered)
            if g == 0:
                continue
            key = (-g, d)
            if best is None or key < best[0]:
                best = (key, d, g)
        covered |= sets[best[1]]
        chosen.add(best[1])
        want.append((best[1], best[2], len(covered)))
    got = [(r.doc_id, r.gain, r.covered_tokens) for r in sorted(rows, key=lambda r: r.round)]
    assert got == want
    gains = [g for _, g, _ in got]
    assert all(a >= b for a, b in zip(gains, gains[1:]))


def test_auc_matches_numpy_rank_formula(spark):
    """AUC must equal the tie-corrected Mann-Whitney computed with numpy's
    independent average-rank machinery."""
    row = registry.QUERIES["scorer_auc"](spark, SF_TEST).collect()[0]
    con = _duck()
    df = con.execute(
        "SELECT floor(value*100 + 0.5)::BIGINT AS cents,"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos FROM events"
    ).df()
    # average ranks (tie-corrected) in plain numpy
    cents = df["cents"].to_numpy()
    vals, inv, counts = np.unique(cents, return_inverse=True, return_counts=True)
    ends = np.cumsum(counts)
    avg_rank_per_val = ends - (counts - 1) / 2.0
    ranks = avg_rank_per_val[inv]
    p = int(df["pos"].sum())
    n = len(df) - p
    auc = (ranks[df["pos"].to_numpy() == 1].sum() - p * (p + 1) / 2) / (p * n)
    assert (row.n_pos, row.n_neg) == (p, n)
    assert row.auc == pytest.approx(auc, abs=1e-4)


def test_best_f1_matches_pandas_sweep(spark):
    """The emitted operating point must equal an exhaustive pandas sweep
    of every distinct threshold."""
    row = registry.QUERIES["pr_best_f1"](spark, SF_TEST).collect()[0]
    con = _duck()
    df = con.execute(
        "SELECT floor(value*100 + 0.5)::BIGINT AS cents,"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos FROM events"
    ).df()
    p = int(df["pos"].sum())
    best = None
    for t in sorted(df["cents"].unique()):
        pred = df["cents"] >= t
        tp = int(df.loc[pred, "pos"].sum())
        fp = int(pred.sum()) - tp
        fn = p - tp
        f1 = 2 * tp / (2 * tp + fp + fn)
        key = (math.floor(f1 * 1e9 + 0.5), -t)
        if best is None or key > best[0]:
            best = (key, t, tp, fp, fn, f1)
    assert row.threshold_cents == best[1]
    assert (row.tp, row.fp, row.fn) == (best[2], best[3], best[4])
    assert row.f1 == pytest.approx(best[5], abs=1e-4)


def test_cusum_matches_pandas_argmax(spark):
    """Change day, split sizes, and both-side means must equal a pandas
    recomputation of the scaled CUSUM argmax."""
    row = registry.QUERIES["value_cusum_changepoint"](spark, SF_TEST).collect()[0]
    con = _duck()
    df = con.execute(
        "SELECT CAST(ts AS DATE) AS day,"
        " sum(floor(value*100 + 0.5)::BIGINT)::BIGINT AS cents"
        " FROM events WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1"
    ).df()
    nd, T = len(df), int(df["cents"].sum())
    prefix = df["cents"].cumsum()
    dev = nd * prefix - (df.index + 1) * T
    k = dev.abs().idxmax()
    import pandas as pd

    assert pd.Timestamp(row.change_day) == pd.Timestamp(df["day"].iloc[k])
    assert row.days_before == k + 1
    assert row.days_after == nd - (k + 1)
    assert row.mean_before == pytest.approx(
        (prefix.iloc[k] / 100.0) / (k + 1), abs=1e-4
    )
    assert row.mean_after == pytest.approx(
        ((T - prefix.iloc[k]) / 100.0) / (nd - k - 1), abs=1e-4
    )


def test_streaming_stump_histogram_reproduces_batch_split(spark):
    """Drain the streaming histogram and run the SAME split search on its
    final counts: the chosen (threshold, gain, counts) per feature must
    equal the batch `decision_stump_returns` rows — online model training
    whose sufficient statistics are streaming state."""
    from vector_search_spark.streaming.events import (
        stream_lineitem_features_from_parquet,
        streaming_stump_histogram,
    )

    out = streaming_stump_histogram(
        stream_lineitem_features_from_parquet(spark, SF_TEST)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("stump_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    hist = spark.sql(
        "SELECT feature, val, max(cnt) AS cnt, max(pos) AS pos"
        " FROM stump_stream GROUP BY 1, 2"
    ).toPandas()

    batch = {r.feature: r for r in
             registry.QUERIES["decision_stump_returns"](spark, SF_TEST).collect()}

    def gini(cnt, pos):
        if cnt == 0:
            return 0.0
        q_ = pos / cnt
        return 1.0 - q_ * q_ - (1.0 - q_) * (1.0 - q_)

    for feat, grp in hist.groupby("feature"):
        grp = grp.sort_values("val")
        n, p = int(grp["cnt"].sum()), int(grp["pos"].sum())
        parent = gini(n, p)
        best = None
        cum_n = cum_p = 0
        for _, row_ in grp.iterrows():
            cum_n += int(row_["cnt"])
            cum_p += int(row_["pos"])
            if cum_n >= n:
                continue
            gain = parent - (
                cum_n / n * gini(cum_n, cum_p)
                + (n - cum_n) / n * gini(n - cum_n, p - cum_p)
            )
            key = (math.floor(gain * 1e9 + 0.5), -row_["val"])
            if best is None or key > best[0]:
                best = (key, int(row_["val"]), cum_n, cum_p)
        r = batch[feat]
        assert (r.threshold, r.n_left, r.pos_left) == (best[1], best[2], best[3])


def test_ks_matches_numpy_direct(spark):
    """KS statistic and argmax threshold must match a direct two-CDF scan."""
    row = registry.QUERIES["ks_two_sample"](spark, SF_TEST).collect()[0]
    con = _duck()
    a = np.array(
        con.execute(
            "SELECT floor(value*100 + 0.5)::BIGINT FROM events"
            " WHERE event_type = 'purchase'"
        ).fetchall()
    ).ravel()
    b = np.array(
        con.execute(
            "SELECT floor(value*100 + 0.5)::BIGINT FROM events"
            " WHERE event_type = 'click'"
        ).fetchall()
    ).ravel()
    xs = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    f2 = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    d = np.abs(f1 - f2)
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert row.ks_stat == pytest.approx(d.max(), abs=1e-4)
    assert row.at_cents == xs[np.argmax(d)]  # argmax ties: first = smallest


def test_theil_sen_matches_python_median(spark):
    """Robust and OLS slopes must match pure-Python recomputations."""
    row = registry.QUERIES["theil_sen_daily_trend"](spark, SF_TEST).collect()[0]
    con = _duck()
    daily = con.execute(
        "SELECT CAST(ts AS DATE), sum(floor(value*100 + 0.5)::BIGINT)"
        " FROM events WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    cents = [int(c) for _, c in daily]
    nd = len(cents)
    slopes = sorted(
        math.floor((cents[j] - cents[i]) * 1e6 / (j - i))
        for i in range(nd)
        for j in range(i + 1, nd)
    )
    m = len(slopes)
    assert (row.n_days, row.n_pairs) == (nd, m)
    med = slopes[(m + 1) // 2 - 1]
    assert row.ts_slope_per_day == pytest.approx(med / 1e6 / 100.0, abs=1e-4)
    xs = np.arange(1, nd + 1, dtype=np.float64)
    ys = np.array(cents, dtype=np.float64)
    ols = ((nd * (xs * ys).sum() - xs.sum() * ys.sum())
           / (nd * (xs * xs).sum() - xs.sum() ** 2))
    assert row.ols_slope_per_day == pytest.approx(ols / 100.0, abs=1e-3)


def test_kmeans_matches_numpy_lloyd(spark):
    """A numpy Lloyd loop with the same integer rules (argmin ties to the
    lowest id, floor-division centroid updates, 5 rounds, fixed init) must
    reproduce clusters, counts, centroids, and WCSS."""
    from vector_search_spark.registry_ml import _KM_INIT, _KM_K, _KM_ROUNDS

    rows = sorted(
        registry.QUERIES["kmeans_lineitem"](spark, SF_TEST).collect(),
        key=lambda r: r.cluster,
    )
    con = _duck()
    X = np.array(
        con.execute(
            "SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) * 2000,"
            " CAST(floor(l_extendedprice + 0.5) AS BIGINT) FROM lineitem"
        ).fetchall(),
        dtype=np.int64,
    )
    C = np.array(_KM_INIT, dtype=np.int64)

    def assign(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)  # numpy argmin takes FIRST min = lowest id

    for _ in range(_KM_ROUNDS):
        a = assign(C)
        for c in range(_KM_K):
            m = a == c
            if m.sum():
                C[c] = np.floor(X[m].sum(axis=0) / m.sum()).astype(np.int64)
    a = assign(C)
    wcss = sum(
        int(((X[a == c] - C[c]) ** 2).sum()) for c in range(_KM_K)
    )
    for c in range(_KM_K):
        r = rows[c]
        assert (r.cx, r.cy) == (C[c, 0], C[c, 1])
        assert r.n_points == int((a == c).sum())
        assert r.wcss == pytest.approx(wcss / 1e6, abs=1e-3)


def test_streaming_ks_histogram_reproduces_batch_ks(spark):
    """Drained streaming CDF cells must reproduce the batch KS statistic
    exactly via the same integer sup-scan."""
    from vector_search_spark.streaming.events import (
        stream_events_from_parquet,
        streaming_ks_histogram,
    )

    out = streaming_ks_histogram(stream_events_from_parquet(spark, SF_TEST))
    q = (
        out.writeStream.format("memory")
        .queryName("ks_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cells = spark.sql(
        "SELECT cents, max(c1) AS c1, max(c2) AS c2 FROM ks_stream GROUP BY 1"
    ).toPandas().sort_values("cents")
    n1, n2 = int(cells["c1"].sum()), int(cells["c2"].sum())
    cum1 = cells["c1"].cumsum()
    cum2 = cells["c2"].cumsum()
    d_scaled = (n2 * cum1 - n1 * cum2).abs()
    k = int(d_scaled.idxmax())
    batch = registry.QUERIES["ks_two_sample"](spark, SF_TEST).collect()[0]
    assert (batch.n_a, batch.n_b) == (n1, n2)
    assert batch.ks_stat == pytest.approx(
        int(d_scaled.loc[k]) / (n1 * n2), abs=1e-4
    )


def test_streaming_ols_moments_reproduce_batch_fit(spark):
    """Drained streaming moments, pushed through the SAME shared Cramer
    text, must equal the batch `ols_price_model` row exactly."""
    from pyspark.sql import functions as F

    from vector_search_spark.registry_ml import _ols_final_exprs
    from vector_search_spark.streaming.events import (
        stream_lineitem_ols_from_parquet,
        streaming_ols_moments,
    )

    out = streaming_ols_moments(stream_lineitem_ols_from_parquet(spark, SF_TEST))
    q = (
        out.writeStream.format("memory")
        .queryName("ols_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    m = spark.sql("SELECT * FROM ols_stream ORDER BY n_rows DESC LIMIT 1")
    fitted = m.select(
        *[
            F.expr(sql).alias(alias)
            if alias == "n_rows"
            else F.expr(sql).cast("double").alias(alias)
            for alias, sql in _ols_final_exprs()
        ]
    ).collect()[0]
    batch = registry.QUERIES["ols_price_model"](spark, SF_TEST).collect()[0]
    assert tuple(fitted) == tuple(batch)


def test_svd_rank1_matches_numpy(spark):
    """Loading direction must align with numpy's top right singular vector
    of the SAME integer matrix (|cos| > 0.999) and sigma with its top
    singular value (cents → dollars)."""
    rows = sorted(
        registry.QUERIES["svd_rank1_affinity"](spark, SF_TEST).collect(),
        key=lambda r: r.event_type,
    )
    con = _duck()
    cells = con.execute(
        "SELECT user_id, event_type, sum(floor(value*100 + 0.5)::BIGINT)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    types = sorted({t for _, t, _ in cells})
    users = sorted({u for u, _, _ in cells})
    ui = {u: i for i, u in enumerate(users)}
    ti = {t: i for i, t in enumerate(types)}
    M = np.zeros((len(users), len(types)))
    for u, t, c in cells:
        M[ui[u], ti[t]] = c
    _, s, vt = np.linalg.svd(M, full_matrices=False)
    v_top = vt[0]
    got = np.array([r.loading for r in rows])
    cos = abs(got @ v_top) / (np.linalg.norm(got) * np.linalg.norm(v_top))
    assert cos > 0.999, cos
    assert rows[0].sigma_dollars == pytest.approx(s[0] / 100.0, rel=1e-3)


def test_ab_bootstrap_diff_matches_python(spark):
    """Pure-Python replica rebuild (same md5 arm split + Poisson lanes)
    must reproduce the replica difference order statistics."""
    import hashlib

    from vector_search_spark.registry_ml import _BOOT_B, _POIS_T

    row = registry.QUERIES["ab_bootstrap_diff_ci"](spark, SF_TEST).collect()[0]
    con = _duck()
    ev = con.execute(
        "SELECT event_id, user_id, floor(value*100 + 0.5)::BIGINT FROM events"
        " WHERE event_type = 'purchase'"
    ).fetchall()
    arms = {"t": [], "c": []}
    for eid, uid, cents in ev:
        g = "t" if int(
            hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16
        ) % 2 == 0 else "c"
        arms[g].append((eid, cents))
    assert (row.n_t, row.n_c) == (len(arms["t"]), len(arms["c"]))
    diffs = []
    for b in range(_BOOT_B):
        means = {}
        for g, data in arms.items():
            sw = swc = 0
            for eid, cents in data:
                hx = hashlib.md5(f"abboot{b // 4}:{eid}".encode()).hexdigest()
                u = int(hx[(b % 4) * 8 : (b % 4) * 8 + 8], 16)
                w = next((k for k, t in enumerate(_POIS_T) if u < t), 7)
                sw += w
                swc += w * cents
            means[g] = (swc / 100.0) / sw
        diffs.append(means["t"] - means["c"])
    diffs.sort()
    assert row.ci_lo == pytest.approx(diffs[1], abs=1e-4)
    assert row.ci_hi == pytest.approx(diffs[_BOOT_B - 2], abs=1e-4)
    assert row.significant == (1 if (diffs[1] > 0 or diffs[_BOOT_B - 2] < 0) else 0)


def test_next_event_accuracy_matches_pandas(spark):
    """Per-source majority prediction and accuracy must match a pandas
    recomputation of the transition counts."""
    rows = {r.src: r for r in
            registry.QUERIES["markov_next_event_accuracy"](spark, SF_TEST).collect()}
    con = _duck()
    tr = con.execute(
        """
        WITH l AS (
          SELECT event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ns(ts) // 1000, event_id) AS nxt
          FROM events)
        SELECT event_type, nxt, count(*) FROM l WHERE nxt IS NOT NULL
        GROUP BY 1, 2
        """
    ).fetchall()
    by_src = {}
    for s, d, n in tr:
        by_src.setdefault(s, {})[d] = n
    for s, dd in by_src.items():
        pred = min(dd, key=lambda d: (-dd[d], d))
        tot = sum(dd.values())
        r = rows[s]
        assert r.predicted_next == pred
        assert r.n_transitions == tot
        assert r.n_correct == dd[pred]
        assert r.accuracy == pytest.approx(dd[pred] / tot, abs=1e-4)
