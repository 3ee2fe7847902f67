"""Round-11 second-half operators vs pure-Python references.

Same discipline as test_r11_ops.py: each Spark operator is replayed by
a straight-line Python implementation of the documented algorithm on a
small in-memory fixture; integer outputs match exactly and double
outputs match to 1e-12 (the operators are fixed-double-tree by design).
"""

from __future__ import annotations

import math

import pytest


# ---------------------------------------------------------------------------
# wave 15: risk-adjusted returns, VaR/CVaR, CAPM


def _risk_ref(pnl):
    n = len(pnl)
    s = sum(pnl)
    ss = sum(d * d for d in pnl)
    ssd = sum(d * d for d in pnl if d < 0)
    eq = 0
    peak = None
    maxdd = 0
    for d in pnl:
        eq += d
        peak = eq if peak is None else max(peak, eq)
        maxdd = max(maxdd, peak - eq)
    disp = n * ss - s * s
    return {
        "n_periods": n,
        "total_pnl": s,
        "mean_pnl": s / n,
        "sharpe": s / math.sqrt(disp) if disp > 0 else None,
        "sortino": s / math.sqrt(n * ssd) if ssd > 0 else None,
        "max_dd": maxdd,
        "calmar": s / n / maxdd if maxdd > 0 else None,
    }


def test_risk_scorecard_matches_reference(spark):
    from etl_java_spark.operators.timeseries import risk_scorecard

    pnl = [40, -25, 13, -7, 60, -90, 22, 5, -1, 30]
    rows = [("a", t, d) for t, d in enumerate(pnl)]
    df = spark.createDataFrame(rows, "g string, t long, d long")
    got = risk_scorecard(df, "g", "t", "d").collect()[0]
    ref = _risk_ref(pnl)
    assert got["n_periods"] == ref["n_periods"]
    assert got["total_pnl"] == ref["total_pnl"]
    assert got["max_dd"] == ref["max_dd"]
    for k in ("mean_pnl", "sharpe", "sortino", "calmar"):
        assert got[k] == pytest.approx(ref[k], abs=1e-12)


def test_risk_scorecard_degenerate_ratios_null(spark):
    from etl_java_spark.operators.timeseries import risk_scorecard

    # constant series: zero dispersion -> sharpe NULL; all-positive ->
    # sortino NULL; monotone-up equity -> max_dd 0 -> calmar NULL
    rows = [("c", t, 5) for t in range(4)]
    df = spark.createDataFrame(rows, "g string, t long, d long")
    got = risk_scorecard(df, "g", "t", "d").collect()[0]
    assert got["sharpe"] is None
    assert got["sortino"] is None
    assert got["max_dd"] == 0
    assert got["calmar"] is None


def test_var_cvar_exact_k_and_tiebreak(spark):
    from etl_java_spark.operators.timeseries import var_cvar

    # n=6, alpha=1/4 -> k=ceil(6/4)=2; worst two are -50 (t=3) and the
    # FIRST -20 by time (t=1) — the tie at -20 breaks by time
    pnl = [(0, 10), (1, -20), (2, 7), (3, -50), (4, -20), (5, 3)]
    rows = [("a", t, d) for t, d in pnl]
    df = spark.createDataFrame(rows, "g string, t long, d long")
    got = var_cvar(df, "g", "t", "d", alpha_num=1, alpha_den=4).collect()[0]
    assert got["n_periods"] == 6
    assert got["k_tail"] == 2
    assert got["var_c"] == 20  # 2nd-worst pnl is -20 -> VaR 20
    assert got["cvar_c"] == pytest.approx((50 + 20) / 2, abs=1e-12)


def test_var_cvar_rejects_bad_alpha(spark):
    from etl_java_spark.operators.timeseries import var_cvar

    df = spark.createDataFrame([("a", 1, 1)], "g string, t long, d long")
    with pytest.raises(ValueError):
        var_cvar(df, "g", "t", "d", alpha_num=3, alpha_den=2)


def _capm_ref(pairs):
    n = len(pairs)
    sa = sum(a for a, _ in pairs)
    sm = sum(m for _, m in pairs)
    sam = sum(a * m for a, m in pairs)
    smm = sum(m * m for _, m in pairs)
    saa = sum(a * a for a, _ in pairs)
    se = sum(a - m for a, m in pairs)
    sse = sum((a - m) ** 2 for a, m in pairs)
    covn = n * sam - sa * sm
    varmn = n * smm - sm * sm
    varan = n * saa - sa * sa
    den = n * sse - se * se
    beta = covn / varmn
    return {
        "beta": beta,
        "alpha_c": (sa - beta * sm) / n,
        "r2": covn * covn / (varmn * varan),
        "tracking_error_c": math.sqrt(den) / n,
        "information_ratio": se / math.sqrt(den) if den > 0 else None,
    }


def test_capm_scorecard_matches_reference(spark):
    from etl_java_spark.operators.timeseries import capm_scorecard

    pairs = [(12, 10), (-6, -4), (25, 18), (-14, -9), (7, 3), (2, 6)]
    rows = [("a", a, m) for a, m in pairs]
    df = spark.createDataFrame(rows, "g string, a long, m long")
    got = capm_scorecard(df, "g", "a", "m").collect()[0]
    ref = _capm_ref(pairs)
    for k, v in ref.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_capm_scorecard_degenerate_market_null(spark):
    from etl_java_spark.operators.timeseries import capm_scorecard

    # constant market: zero variance -> beta/alpha/r2 NULL
    rows = [("a", 5, 3), ("a", 7, 3), ("a", 2, 3)]
    df = spark.createDataFrame(rows, "g string, a long, m long")
    got = capm_scorecard(df, "g", "a", "m").collect()[0]
    assert got["beta"] is None
    assert got["r2"] is None


# ---------------------------------------------------------------------------
# wave 16: range volatility, Roll spread, Amihud illiquidity


def test_range_volatility_matches_reference(spark):
    from etl_java_spark.operators.timeseries import range_volatility

    bars = [
        (100, 120, 90, 110),
        (110, 130, 105, 125),
        (125, 126, 100, 104),
        (104, 140, 104, 132),
    ]
    rows = [("a", o, h, l, c) for o, h, l, c in bars]
    df = spark.createDataFrame(rows, "g string, o long, h long, l long, c long")
    got = range_volatility(df, "g", "o", "h", "l", "c").collect()[0]
    ln2 = math.log(2.0)
    pts, gts, rts = [], [], []
    for o, h, l, c in bars:
        hl = math.log(h / l)
        co = math.log(c / o)
        hc, ho = math.log(h / c), math.log(h / o)
        lc, lo = math.log(l / c), math.log(l / o)
        pts.append(round(hl * hl, 12))
        gts.append(round(0.5 * hl * hl - (2 * ln2 - 1) * co * co, 12))
        rts.append(round(hc * ho + lc * lo, 12))
    n = len(bars)
    assert got["n_bars"] == n
    assert got["parkinson_var"] == pytest.approx(
        sum(pts) / (4 * ln2 * n), abs=1e-12
    )
    assert got["garman_klass_var"] == pytest.approx(sum(gts) / n, abs=1e-12)
    assert got["rogers_satchell_var"] == pytest.approx(
        sum(rts) / n, abs=1e-12
    )


def test_range_volatility_drops_nonpositive_low(spark):
    from etl_java_spark.operators.timeseries import range_volatility

    rows = [("a", 100, 120, 90, 110), ("a", 100, 120, 0, 110)]
    df = spark.createDataFrame(rows, "g string, o long, h long, l long, c long")
    got = range_volatility(df, "g", "o", "h", "l", "c").collect()[0]
    assert got["n_bars"] == 1


def test_roll_spread_matches_reference(spark):
    from etl_java_spark.operators.timeseries import roll_spread

    # bid-ask bounce around 100: +s/2, -s/2 alternating -> strongly
    # negative autocov of changes
    px = [102, 98, 102, 98, 102, 98, 102]
    rows = [("a", t, p) for t, p in enumerate(px)]
    df = spark.createDataFrame(rows, "g string, t long, p long")
    got = roll_spread(df, "g", "t", "p").collect()[0]
    dps = [px[i] - px[i - 1] for i in range(1, len(px))]
    pairs = [(dps[i - 1], dps[i]) for i in range(1, len(dps))]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    covn = n * sxy - sx * sy
    assert got["n_pairs"] == n
    assert got["autocov"] == pytest.approx(covn / n / n, abs=1e-12)
    assert got["roll_spread_c"] == pytest.approx(
        2 * math.sqrt(-covn) / n, abs=1e-9
    )


def test_roll_spread_positive_autocov_null(spark):
    from etl_java_spark.operators.timeseries import roll_spread

    # monotone trend: changes all +10 -> autocov 0 (constant) -> NULL
    rows = [("a", t, 100 + 10 * t) for t in range(6)]
    df = spark.createDataFrame(rows, "g string, t long, p long")
    got = roll_spread(df, "g", "t", "p").collect()[0]
    assert got["roll_spread_c"] is None


def test_amihud_matches_reference(spark):
    from etl_java_spark.operators.timeseries import amihud_illiquidity

    days = [(0, 100, 5000), (1, 107, 4000), (2, 96, 8000), (3, 99, 2000)]
    rows = [("a", t, p, v) for t, p, v in days]
    df = spark.createDataFrame(rows, "g string, t long, p long, v long")
    got = amihud_illiquidity(df, "g", "t", "p", "v").collect()[0]
    terms = [
        round(abs(days[i][1] - days[i - 1][1]) / days[i][2], 15)
        for i in range(1, len(days))
    ]
    assert got["n_periods"] == 3
    assert got["illiq_1e6"] == pytest.approx(
        1e6 * sum(terms) / 3, abs=1e-9
    )


def test_amihud_drops_zero_volume_rows(spark):
    from etl_java_spark.operators.timeseries import amihud_illiquidity

    rows = [("a", 0, 100, 5000), ("a", 1, 107, 0), ("a", 2, 96, 8000)]
    df = spark.createDataFrame(rows, "g string, t long, p long, v long")
    got = amihud_illiquidity(df, "g", "t", "p", "v").collect()[0]
    # zero-volume day contributes no ratio but still anchors the lag
    assert got["n_periods"] == 1


# ---------------------------------------------------------------------------
# wave 17: meta-analysis (fixed, DL random, Egger)

_META_STUDIES = [  # (y, v): effect + within-study variance
    (0.42, 0.04),
    (0.10, 0.09),
    (0.65, 0.16),
    (-0.12, 0.0625),
    (0.33, 0.0256),
]


def _meta_ref():
    ys = _META_STUDIES
    k = len(ys)
    w = [round(1 / v, 12) for _, v in ys]
    wy = [round((1 / v) * y, 12) for y, v in ys]
    wy2 = [round((1 / v) * y * y, 12) for y, v in ys]
    w2 = [round((1 / v) * (1 / v), 12) for _, v in ys]
    sw, swy, swy2, sw2 = sum(w), sum(wy), sum(wy2), sum(w2)
    q = swy2 - swy * swy / sw
    c = sw - sw2 / sw
    tau2 = max(0.0, (q - (k - 1)) / c)
    ws = [round(1 / (v + tau2), 12) for _, v in ys]
    wsy = [round(y / (v + tau2), 12) for y, v in ys]
    return {
        "k": k,
        "pooled": swy / sw,
        "se_pooled": 1 / math.sqrt(sw),
        "q": q,
        "i2": max(0.0, (q - (k - 1)) / q * 100.0),
        "tau2": tau2,
        "pooled_re": sum(wsy) / sum(ws),
        "se_re": 1 / math.sqrt(sum(ws)),
    }


def test_meta_fixed_effect_matches_reference(spark):
    from etl_java_spark.operators.experiments import meta_fixed_effect

    df = spark.createDataFrame(_META_STUDIES, "y double, v double")
    got = meta_fixed_effect(df, "y", "v").collect()[0]
    ref = _meta_ref()
    assert got["k_studies"] == ref["k"]
    assert got["pooled"] == pytest.approx(ref["pooled"], abs=1e-12)
    assert got["se_pooled"] == pytest.approx(ref["se_pooled"], abs=1e-12)
    assert got["q_stat"] == pytest.approx(ref["q"], abs=1e-12)
    assert got["i2_pct"] == pytest.approx(ref["i2"], abs=1e-10)


def test_meta_random_effects_matches_reference(spark):
    from etl_java_spark.operators.experiments import meta_random_effects

    df = spark.createDataFrame(_META_STUDIES, "y double, v double")
    got = meta_random_effects(df, "y", "v").collect()[0]
    ref = _meta_ref()
    assert got["k_studies"] == ref["k"]
    assert got["tau2"] == pytest.approx(ref["tau2"], abs=1e-12)
    assert got["pooled_re"] == pytest.approx(ref["pooled_re"], abs=1e-12)
    assert got["se_re"] == pytest.approx(ref["se_re"], abs=1e-12)


def test_meta_homogeneous_tau2_zero(spark):
    from etl_java_spark.operators.experiments import meta_random_effects

    # identical effects: Q ~ 0 < k-1 -> tau2 clamps to 0 and the
    # random-effects pooled estimate equals the fixed-effect one
    rows = [(0.3, 0.04), (0.3, 0.09), (0.3, 0.0625)]
    df = spark.createDataFrame(rows, "y double, v double")
    got = meta_random_effects(df, "y", "v").collect()[0]
    assert got["tau2"] == 0.0
    assert got["pooled_re"] == pytest.approx(0.3, abs=1e-9)


def test_egger_matches_reference(spark):
    from etl_java_spark.operators.experiments import egger_test

    df = spark.createDataFrame(_META_STUDIES, "y double, v double")
    got = egger_test(df, "y", "v").collect()[0]
    xs = [round(1 / math.sqrt(v), 12) for _, v in _META_STUDIES]
    zs = [round(y / math.sqrt(v), 12) for y, v in _META_STUDIES]
    xzs = [
        round((1 / math.sqrt(v)) * (y / math.sqrt(v)), 12)
        for y, v in _META_STUDIES
    ]
    xxs = [
        round((1 / math.sqrt(v)) * (1 / math.sqrt(v)), 12)
        for _, v in _META_STUDIES
    ]
    zzs = [
        round((y / math.sqrt(v)) * (y / math.sqrt(v)), 12)
        for y, v in _META_STUDIES
    ]
    n = len(xs)
    sx, sz, sxz, sxx, szz = sum(xs), sum(zs), sum(xzs), sum(xxs), sum(zzs)
    den = n * sxx - sx * sx
    b1 = (n * sxz - sx * sz) / den
    b0 = (sz - b1 * sx) / n
    sse = szz - b0 * sz - b1 * sxz
    se_b0 = math.sqrt(sse / (n - 2) * sxx / den)
    assert got["k_studies"] == n
    assert got["intercept"] == pytest.approx(b0, abs=1e-10)
    assert got["slope"] == pytest.approx(b1, abs=1e-10)
    assert got["se_intercept"] == pytest.approx(se_b0, abs=1e-10)
    assert got["t_intercept"] == pytest.approx(b0 / se_b0, abs=1e-10)


def test_egger_two_studies_se_null(spark):
    from etl_java_spark.operators.experiments import egger_test

    rows = [(0.4, 0.04), (0.1, 0.09)]
    df = spark.createDataFrame(rows, "y double, v double")
    got = egger_test(df, "y", "v").collect()[0]
    assert got["se_intercept"] is None
    assert got["t_intercept"] is None


# ---------------------------------------------------------------------------
# wave 18: Diebold-Mariano, cross-correlation, variance ratio


def test_diebold_mariano_matches_reference(spark):
    from etl_java_spark.operators.timeseries import diebold_mariano

    la = [10, 14, 9, 22, 13, 17, 8, 25]
    lb = [12, 11, 15, 16, 10, 19, 14, 18]
    rows = [("a", t, la[t], lb[t]) for t in range(len(la))]
    df = spark.createDataFrame(rows, "g string, t long, la long, lb long")
    got = diebold_mariano(df, "g", "t", "la", "lb", h_lags=1).collect()[0]
    d = [a - b for a, b in zip(la, lb)]
    n, s = len(d), sum(d)
    u = [n * x - s for x in d]
    g0 = sum(x * x for x in u)
    g1 = sum(u[i] * u[i - 1] for i in range(1, n))
    lrv = g0 + 2 * g1
    mean = s / n
    assert got["n_periods"] == n
    assert got["mean_loss_diff"] == pytest.approx(mean, abs=1e-12)
    assert got["dm_stat"] == pytest.approx(
        mean / math.sqrt(lrv / n**4), abs=1e-10
    )


def test_diebold_mariano_negative_lrv_null(spark):
    from etl_java_spark.operators.timeseries import diebold_mariano

    # perfectly alternating diff: gamma_1 ~ -gamma_0 -> g0+2g1 < 0
    la = [10, 0, 10, 0, 10, 0]
    lb = [0, 10, 0, 10, 0, 10]
    rows = [("a", t, la[t], lb[t]) for t in range(len(la))]
    df = spark.createDataFrame(rows, "g string, t long, la long, lb long")
    got = diebold_mariano(df, "g", "t", "la", "lb", h_lags=1).collect()[0]
    assert got["dm_stat"] is None


def test_cross_correlation_matches_reference(spark):
    from etl_java_spark.operators.timeseries import cross_correlation

    x = [5, 9, 2, 14, 7, 11, 4, 13]
    y = [1, 6, 10, 3, 15, 8, 12, 5]  # unrelated series
    rows = [("a", t, x[t], y[t]) for t in range(len(x))]
    df = spark.createDataFrame(rows, "g string, t long, x long, y long")
    out = {
        r["lag"]: r
        for r in cross_correlation(df, "g", "t", "x", "y", max_lag=2)
        .collect()
    }
    n = len(x)
    sx, sy = sum(x), sum(y)
    ux = [n * v - sx for v in x]
    uy = [n * v - sy for v in y]
    dx = n * sum(v * v for v in x) - sx * sx
    dy = n * sum(v * v for v in y) - sy * sy
    for k in range(3):
        num = sum(ux[t] * uy[t + k] for t in range(n - k))
        assert out[k]["n_overlap"] == n - k
        assert out[k]["ccf"] == pytest.approx(
            num / (n * math.sqrt(dx * dy)), abs=1e-12
        ), k


def test_cross_correlation_lag0_is_pearson(spark):
    from etl_java_spark.operators.timeseries import cross_correlation

    # y = 2x + 3: lag-0 CCF must be exactly 1
    x = [1, 5, 2, 8, 4]
    rows = [("a", t, v, 2 * v + 3) for t, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g string, t long, x long, y long")
    out = cross_correlation(df, "g", "t", "x", "y", max_lag=0).collect()
    assert out[0]["ccf"] == pytest.approx(1.0, abs=1e-12)


def test_variance_ratio_random_walk_near_one(spark):
    from etl_java_spark.operators.timeseries import variance_ratio

    # exact reference replay on a short price path
    px = [100, 103, 101, 106, 104, 109, 113, 110, 116, 115, 121, 118]
    rows = [("a", t, p) for t, p in enumerate(px)]
    df = spark.createDataFrame(rows, "g string, t long, p long")
    got = variance_ratio(df, "g", "t", "p", q=3).collect()[0]
    r = [px[i] - px[i - 1] for i in range(1, len(px))]
    rq = [px[i] - px[i - 3] for i in range(3, len(px))]

    def dpop(v):
        m = len(v)
        return m * sum(x * x for x in v) - sum(v) ** 2, m

    dr, nr = dpop(r)
    dq, nq = dpop(rq)
    vr = dq * nr * nr / (3.0 * dr * nq * nq)
    z = (vr - 1.0) * math.sqrt(3 * 3 * nr / (2.0 * (2 * 3 - 1) * (3 - 1)))
    assert got["n_changes"] == nr
    assert got["q"] == 3
    assert got["vr"] == pytest.approx(vr, abs=1e-12)
    assert got["z_stat"] == pytest.approx(z, abs=1e-10)


def test_variance_ratio_rejects_small_q(spark):
    from etl_java_spark.operators.timeseries import variance_ratio

    df = spark.createDataFrame([("a", 1, 1)], "g string, t long, p long")
    with pytest.raises(ValueError):
        variance_ratio(df, "g", "t", "p", q=1)


# ---------------------------------------------------------------------------
# wave 19: Breslow-Day/Tarone, Bowker symmetry, Kish design effect


def test_breslow_day_matches_reference(spark):
    from etl_java_spark.operators.experiments import breslow_day

    strata = [
        (12, 30, 8, 40),
        (25, 20, 15, 35),
        (9, 45, 10, 50),
    ]
    df = spark.createDataFrame(strata, "a long, b long, c long, d long")
    got = breslow_day(df, "a", "b", "c", "d").collect()[0]

    def r12(x):
        return round(x, 12)

    s_ad = sum(r12(a * d / (a + b + c + d)) for a, b, c, d in strata)
    s_bc = sum(r12(b * c / (a + b + c + d)) for a, b, c, d in strata)
    psi = s_ad / s_bc
    st = sdv = svv = 0.0
    for a, b, c, d in strata:
        n1, n2, m1 = a + b, c + d, a + c
        aa = psi - 1.0
        bb = -((n1 + m1) * psi + (n2 - m1))
        cq = psi * n1 * m1
        disc = math.sqrt(bb * bb - 4 * aa * cq)
        e1 = (-bb - disc) / (2 * aa)
        e2 = (-bb + disc) / (2 * aa)
        lo, hi = max(0.0, m1 - n2), min(n1, m1)
        e = e1 if lo <= e1 <= hi else e2
        v = 1.0 / (
            1.0 / e + 1.0 / (n1 - e) + 1.0 / (m1 - e)
            + 1.0 / (n2 - m1 + e)
        )
        st += r12((a - e) * (a - e) / v)
        sdv += r12(a - e)
        svv += r12(v)
    assert got["k_strata"] == 3
    assert got["psi_mh"] == pytest.approx(psi, abs=1e-10)
    assert got["bd_stat"] == pytest.approx(st, abs=1e-9)
    assert got["tarone_stat"] == pytest.approx(
        st - sdv * sdv / svv, abs=1e-9
    )


def test_breslow_day_homogeneous_small_stat(spark):
    from etl_java_spark.operators.experiments import breslow_day

    # identical 2x2 in every stratum: OR identical -> BD ~ 0
    strata = [(20, 10, 10, 20)] * 4
    df = spark.createDataFrame(strata, "a long, b long, c long, d long")
    got = breslow_day(df, "a", "b", "c", "d").collect()[0]
    assert got["bd_stat"] == pytest.approx(0.0, abs=1e-9)
    assert got["psi_mh"] == pytest.approx(4.0, abs=1e-9)


def test_breslow_day_drops_empty_margin(spark):
    from etl_java_spark.operators.experiments import breslow_day

    strata = [(12, 30, 8, 40), (0, 0, 5, 9)]  # second: empty top row
    df = spark.createDataFrame(strata, "a long, b long, c long, d long")
    got = breslow_day(df, "a", "b", "c", "d").collect()[0]
    assert got["k_strata"] == 1


def test_bowker_matches_reference(spark):
    from etl_java_spark.operators.experiments import bowker_symmetry

    # transitions with asymmetric flow a->b
    obs = (
        [("a", "b")] * 9 + [("b", "a")] * 3
        + [("a", "c")] * 4 + [("c", "a")] * 4
        + [("b", "c")] * 2  # no reverse traffic
        + [("a", "a")] * 5  # diagonal ignored
    )
    df = spark.createDataFrame(obs, "x string, y string")
    got = bowker_symmetry(df, "x", "y").collect()[0]
    ref = (
        round((9 - 3) ** 2 / (9 + 3), 12)
        + round((4 - 4) ** 2 / 8, 12)
        + round((2 - 0) ** 2 / 2, 12)
    )
    assert got["df_pairs"] == 3
    assert got["bowker_stat"] == pytest.approx(ref, abs=1e-12)


def test_kish_design_effect_known_values(spark):
    from etl_java_spark.operators.sampling import kish_design_effect

    # equal weights -> deff exactly 1, ess = n
    rows = [("e", 7)] * 5 + [("u", 1), ("u", 3)]
    df = spark.createDataFrame(rows, "g string, w long")
    out = {r["grp"]: r for r in kish_design_effect(df, "g", "w").collect()}
    assert out["e"]["deff"] == pytest.approx(1.0, abs=1e-15)
    assert out["e"]["ess"] == pytest.approx(5.0, abs=1e-12)
    # unequal: deff = n*sw2/sw^2 = 2*10/16 = 1.25, ess = 16/10 = 1.6
    assert out["u"]["deff"] == pytest.approx(1.25, abs=1e-12)
    assert out["u"]["ess"] == pytest.approx(1.6, abs=1e-12)
    assert out["u"]["cv2"] == pytest.approx(0.25, abs=1e-12)


# ---------------------------------------------------------------------------
# wave 20: Hosmer-Lemeshow, permutation entropy, reciprocity


def test_hosmer_lemeshow_matches_reference(spark):
    from etl_java_spark.operators.evaluation import hosmer_lemeshow

    data = [
        (0.05, 0), (0.08, 0), (0.12, 0), (0.18, 1), (0.25, 0),
        (0.33, 0), (0.41, 1), (0.49, 0), (0.55, 1), (0.62, 1),
        (0.68, 0), (0.74, 1), (0.81, 1), (0.88, 1), (0.95, 1),
    ]
    df = spark.createDataFrame(data, "p double, y long")
    got = hosmer_lemeshow(df, "p", "y", n_bins=5).collect()[0]
    bands = {}
    for p, y in data:
        b = min(int(p * 5), 4)
        n, o, e = bands.get(b, (0, 0, 0.0))
        bands[b] = (n + 1, o + y, e + round(p, 12))
    stat = used = 0
    for n, o, e in bands.values():
        if 0 < e < n:
            stat += round((o - e) ** 2 * n / (e * (n - e)), 12)
            used += 1
    assert got["bands_used"] == used
    assert got["hl_stat"] == pytest.approx(stat, abs=1e-10)


def test_hosmer_lemeshow_perfect_calibration_small(spark):
    from etl_java_spark.operators.evaluation import hosmer_lemeshow

    # each band's outcomes exactly match its probabilities -> HL = 0
    data = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0)] + [
        (0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)
    ]
    df = spark.createDataFrame(data, "p double, y long")
    got = hosmer_lemeshow(df, "p", "y", n_bins=4).collect()[0]
    assert got["hl_stat"] == pytest.approx(0.0, abs=1e-10)


def test_hosmer_lemeshow_rejects_small_bins(spark):
    from etl_java_spark.operators.evaluation import hosmer_lemeshow

    df = spark.createDataFrame([(0.5, 1)], "p double, y long")
    with pytest.raises(ValueError):
        hosmer_lemeshow(df, "p", "y", n_bins=2)


def test_permutation_entropy_constant_vs_noisy(spark):
    from etl_java_spark.operators.timeseries import permutation_entropy

    # strictly increasing: ONE pattern -> entropy 0
    rows = [("up", t, t * 10) for t in range(12)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = permutation_entropy(df, "g", "t", "v").collect()[0]
    assert got["n_patterns"] == 1
    assert got["perm_entropy"] == pytest.approx(0.0, abs=1e-12)


def test_permutation_entropy_matches_reference(spark):
    from etl_java_spark.operators.timeseries import permutation_entropy

    v = [5, 3, 8, 8, 1, 9, 2, 7, 4, 6]
    rows = [("a", t, x) for t, x in enumerate(v)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = permutation_entropy(df, "g", "t", "v").collect()[0]
    pats = {}
    for i in range(len(v) - 2):
        win = v[i : i + 3]
        # stable rank: count of (xj, j) before (xi, i)
        r = []
        for i2, xi in enumerate(win):
            c = sum(
                1
                for j, xj in enumerate(win)
                if j != i2 and (xj < xi or (xj == xi and j < i2))
            )
            r.append(c)
        pid = r[0] * 9 + r[1] * 3 + r[2]
        pats[pid] = pats.get(pid, 0) + 1
    n = sum(pats.values())
    h = sum(round(-(c / n) * math.log(c / n), 12) for c in pats.values())
    assert got["n_windows"] == n
    assert got["n_patterns"] == len(pats)
    assert got["perm_entropy"] == pytest.approx(
        h / math.log(6.0), abs=1e-12
    )


def test_reciprocity_known_graph(spark):
    from etl_java_spark.operators.graph import reciprocity

    # edges: 1->2, 2->1 (mutual), 1->3, 3->4, 4->4 (self-loop,
    # dropped), and a duplicate 1->2 (deduped)
    edges = [(1, 2), (2, 1), (1, 3), (3, 4), (4, 4), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = reciprocity(df, "src", "dst").collect()[0]
    assert got["n_edges"] == 4
    assert got["n_mutual"] == 2
    assert got["n_pairs"] == 3
    assert got["reciprocity"] == pytest.approx(0.5, abs=1e-15)


def test_reciprocity_dag_zero(spark):
    from etl_java_spark.operators.graph import reciprocity

    edges = [(1, 2), (2, 3), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = reciprocity(df, "src", "dst").collect()[0]
    assert got["reciprocity"] == 0.0


# ---------------------------------------------------------------------------
# wave 21: rich club, AR(1) half-life, TOPSIS


def test_rich_club_known_graph(spark):
    from etl_java_spark.operators.graph import rich_club

    # square 1-2-3-4-1 plus hub 5 connected to all: degrees
    # 1..4 -> 3, 5 -> 4; club at k=2 = all five nodes (8 edges);
    # club at k=3 = {5} alone -> phi NULL
    edges = [(1, 2), (2, 3), (3, 4), (4, 1),
             (5, 1), (5, 2), (5, 3), (5, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got2 = rich_club(df, k=2, src="src", dst="dst").collect()[0]
    assert got2["n_club"] == 5
    assert got2["e_club"] == 8
    assert got2["phi"] == pytest.approx(2 * 8 / (5 * 4), abs=1e-15)
    got3 = rich_club(df, k=3, src="src", dst="dst").collect()[0]
    assert got3["n_club"] == 1
    assert got3["phi"] is None


def test_rich_club_hub_clique(spark):
    from etl_java_spark.operators.graph import rich_club

    # two hubs joined to each other and to 3 leaves each -> at k=2
    # the club is the two hubs with their 1 edge: phi = 1
    edges = [(1, 2)] + [(1, x) for x in (3, 4, 5)] + [
        (2, x) for x in (6, 7, 8)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = rich_club(df, k=2, src="src", dst="dst").collect()[0]
    assert got["n_club"] == 2
    assert got["e_club"] == 1
    assert got["phi"] == pytest.approx(1.0, abs=1e-15)


def test_ar1_half_life_matches_reference(spark):
    from etl_java_spark.operators.timeseries import ar1_half_life

    # AR(1)-ish integer path
    y = [100, 80, 70, 62, 58, 55, 52, 51, 50, 50, 49]
    rows = [("a", t, v) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = ar1_half_life(df, "g", "t", "v").collect()[0]
    pairs = [(y[i - 1], y[i]) for i in range(1, len(y))]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(v for _, v in pairs)
    sxy = sum(x * v for x, v in pairs)
    sxx = sum(x * x for x, _ in pairs)
    rho = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert got["n_pairs"] == n
    assert got["rho"] == pytest.approx(rho, abs=1e-12)
    assert got["half_life"] == pytest.approx(
        -math.log(2.0) / math.log(rho), abs=1e-9
    )


def test_ar1_half_life_explosive_null(spark):
    from etl_java_spark.operators.timeseries import ar1_half_life

    # rho > 1 (explosive): half-life NULL, rho still reported
    y = [1, 2, 4, 8, 16, 32]
    rows = [("a", t, v) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = ar1_half_life(df, "g", "t", "v").collect()[0]
    assert got["rho"] > 1
    assert got["half_life"] is None


def test_topsis_matches_reference(spark):
    from etl_java_spark.operators.relational import topsis

    alts = [(1, 80, 10, 5), (2, 60, 30, 2), (3, 90, 20, 9), (4, 40, 40, 1)]
    df = spark.createDataFrame(alts, "alt long, b1 long, b2 long, c1 long")
    got = {
        r["alt"]: r
        for r in topsis(df, "alt", ["b1", "b2"], ["c1"]).collect()
    }
    import math as _m

    cols = {"b1": 1, "b2": 2, "c1": 3}
    ss = {c: _m.sqrt(sum(a[i] ** 2 for a in alts)) for c, i in cols.items()}
    mx = {c: max(a[i] for a in alts) for c, i in cols.items()}
    mn = {c: min(a[i] for a in alts) for c, i in cols.items()}
    for a in alts:
        dp = dn = 0.0
        for c, i in cols.items():
            r = a[i] / ss[c]
            best = (mx[c] if c.startswith("b") else mn[c]) / ss[c]
            worst = (mn[c] if c.startswith("b") else mx[c]) / ss[c]
            dp += (r - best) ** 2
            dn += (r - worst) ** 2
        dp, dn = _m.sqrt(dp), _m.sqrt(dn)
        assert got[a[0]]["d_ideal"] == pytest.approx(dp, abs=1e-12)
        assert got[a[0]]["d_anti"] == pytest.approx(dn, abs=1e-12)
        assert got[a[0]]["closeness"] == pytest.approx(
            dn / (dp + dn), abs=1e-12
        )


def test_topsis_dominant_alternative_wins(spark):
    from etl_java_spark.operators.relational import topsis

    # alt 1 dominates on every criterion -> closeness exactly 1
    alts = [(1, 100, 1), (2, 50, 5), (3, 10, 9)]
    df = spark.createDataFrame(alts, "alt long, b long, c long")
    got = {r["alt"]: r for r in topsis(df, "alt", ["b"], ["c"]).collect()}
    assert got[1]["closeness"] == pytest.approx(1.0, abs=1e-15)
    assert got[3]["closeness"] == pytest.approx(0.0, abs=1e-15)


def test_topsis_rejects_no_criteria(spark):
    from etl_java_spark.operators.relational import topsis

    df = spark.createDataFrame([(1, 2)], "alt long, b long")
    with pytest.raises(ValueError):
        topsis(df, "alt", [], [])


# ---------------------------------------------------------------------------
# wave 22: Brunner-Munzel, Welch ANOVA, empirical-Bernstein bound


def _bm_ref(xs, ys):
    allv = sorted(xs + ys)

    def midrank(v, pool):
        less = sum(1 for p in pool if p < v)
        eq = sum(1 for p in pool if p == v)
        return less + (eq + 1) / 2

    rcx = [midrank(v, allv) for v in xs]
    rcy = [midrank(v, allv) for v in ys]
    rx = [midrank(v, xs) for v in xs]
    ry = [midrank(v, ys) for v in ys]
    n1, n2 = len(xs), len(ys)
    rb1, rb2 = sum(rcx) / n1, sum(rcy) / n2
    s1 = sum(
        (rcx[i] - rx[i] - rb1 + (n1 + 1) / 2) ** 2 for i in range(n1)
    ) / (n1 - 1)
    s2 = sum(
        (rcy[i] - ry[i] - rb2 + (n2 + 1) / 2) ** 2 for i in range(n2)
    ) / (n2 - 1)
    w = (
        n1 * n2 * (rb2 - rb1)
        / ((n1 + n2) * math.sqrt(n1 * s1 + n2 * s2))
    )
    p = (rb2 - (n2 + 1) / 2) / n1
    return p, w


def test_brunner_munzel_matches_reference(spark):
    from etl_java_spark.operators.experiments import brunner_munzel

    xs = [1, 2, 2, 3, 5, 5, 7, 9]
    ys = [2, 4, 4, 6, 6, 8, 9, 9, 10]
    rows = [(v, "a") for v in xs] + [(v, "b") for v in ys]
    df = spark.createDataFrame(rows, "v long, g string")
    got = brunner_munzel(df, "v", "g", "a", "b").collect()[0]
    p, w = _bm_ref(xs, ys)
    assert got["n1"] == len(xs)
    assert got["n2"] == len(ys)
    assert got["p_hat"] == pytest.approx(p, abs=1e-10)
    assert got["w_stat"] == pytest.approx(w, abs=1e-9)


def test_brunner_munzel_symmetric_half(spark):
    from etl_java_spark.operators.experiments import brunner_munzel

    # identical samples: p_hat exactly 0.5, W = 0
    xs = [1, 3, 5, 7]
    rows = [(v, "a") for v in xs] + [(v, "b") for v in xs]
    df = spark.createDataFrame(rows, "v long, g string")
    got = brunner_munzel(df, "v", "g", "a", "b").collect()[0]
    assert got["p_hat"] == pytest.approx(0.5, abs=1e-12)
    assert got["w_stat"] == pytest.approx(0.0, abs=1e-12)


def _welch_ref(groups):
    import math as _m

    per = []
    for vals in groups:
        n = len(vals)
        m = sum(vals) / n
        disp = n * sum(v * v for v in vals) - sum(vals) ** 2
        s2 = disp / (n * (n - 1))
        per.append((n, m, round(n / s2, 12)))
    sw = sum(round(w, 12) for _, _, w in per)
    swm = sum(round(w * m, 12) for _, m, w in per)
    swm2 = sum(round(w * m * m, 12) for _, m, w in per)
    k = len(per)
    sl = sum(
        round((1 - w / sw) ** 2 / (n - 1), 12) for n, _, w in per
    )
    a = (swm2 - swm * swm / sw) / (k - 1)
    b = 1 + (2 * (k - 2) / (k * k - 1)) * sl
    return swm / sw, a / b, (k * k - 1) / (3 * sl)


def test_welch_anova_matches_reference(spark):
    from etl_java_spark.operators.experiments import welch_anova

    groups = [
        [12, 15, 11, 18, 14],
        [22, 25, 19, 30, 27, 24],
        [9, 8, 12, 7],
    ]
    rows = [
        (f"g{i}", v) for i, vals in enumerate(groups) for v in vals
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    got = welch_anova(df, "g", "v").collect()[0]
    gm, f, df2 = _welch_ref(groups)
    assert got["k_groups"] == 3
    assert got["grand_mean"] == pytest.approx(gm, abs=1e-10)
    assert got["f_stat"] == pytest.approx(f, abs=1e-9)
    assert got["df2"] == pytest.approx(df2, abs=1e-6)


def test_welch_anova_drops_degenerate_groups(spark):
    from etl_java_spark.operators.experiments import welch_anova

    rows = (
        [("a", v) for v in (1, 5, 9)]
        + [("b", v) for v in (4, 4, 4)]  # zero variance -> drop
        + [("c", 7)]  # single row -> drop
        + [("d", v) for v in (2, 8, 5)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = welch_anova(df, "g", "v").collect()[0]
    assert got["k_groups"] == 2


def test_empirical_bernstein_bound_matches_reference(spark):
    from etl_java_spark.operators.experiments import (
        empirical_bernstein_bound,
    )

    vals = [3, 7, 4, 9, 2, 8, 5, 6]
    rows = [("a", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = empirical_bernstein_bound(df, "g", "v", 60).collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    var_s = (n * sum(v * v for v in vals) - sum(vals) ** 2) / (
        n * (n - 1)
    )
    rng = max(vals) - min(vals)
    lg = math.log(60.0)
    hw = math.sqrt(2 * var_s * lg / n) + 3 * rng * lg / n
    assert got["n_rows"] == n
    assert got["range_obs"] == rng
    assert got["eb_lower"] == pytest.approx(mean - hw, abs=1e-10)
    assert got["eb_upper"] == pytest.approx(mean + hw, abs=1e-10)


def test_empirical_bernstein_rejects_bad_delta(spark):
    from etl_java_spark.operators.experiments import (
        empirical_bernstein_bound,
    )

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError):
        empirical_bernstein_bound(df, "g", "v", 1)


# ---------------------------------------------------------------------------
# wave 23: DFA, attribute assortativity, weighted quantiles


def test_dfa_alpha_matches_reference(spark):
    from etl_java_spark.operators.timeseries import dfa_alpha

    # deterministic pseudo-series (no RNG in tests): x_t from a
    # fixed integer recurrence
    x, vals = 7, []
    for _ in range(64):
        x = (x * 31 + 17) % 101
        vals.append(x)
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = dfa_alpha(df, "g", "t", "v", scales=(4, 8, 16)).collect()[0]

    n, s = len(vals), sum(vals)
    u, acc = [], 0
    for v in vals:
        acc += n * v - s
        u.append(acc)
    pts = []
    for sc in (4, 8, 16):
        keep = n - n % sc
        fvs = []
        for b in range(keep // sc):
            seg = [(i + 1, u[i]) for i in range(b * sc, (b + 1) * sc)]
            m = len(seg)
            sx = sum(i for i, _ in seg)
            sy = sum(y for _, y in seg)
            sxy = sum(i * y for i, y in seg)
            sxx = sum(i * i for i, _ in seg)
            syy = sum(y * y for _, y in seg)
            dyy = m * syy - sy * sy
            dxy = m * sxy - sx * sy
            dxx = m * sxx - sx * sx
            sse = (dyy - dxy * dxy / dxx) / m
            fvs.append(round(sse / sc, 6))
        lf = math.log(math.sqrt(sum(fvs) / len(fvs))) - math.log(n)
        pts.append((round(math.log(sc), 12), round(lf, 12)))
    k = len(pts)
    slx = sum(round(x_, 12) for x_, _ in pts)
    sly = sum(round(y_, 12) for _, y_ in pts)
    slxy = sum(round(x_ * y_, 12) for x_, y_ in pts)
    slxx = sum(round(x_ * x_, 12) for x_, _ in pts)
    alpha = (k * slxy - slx * sly) / (k * slxx - slx * slx)
    assert got["n_periods"] == n
    assert got["k_scales"] == 3
    assert got["alpha"] == pytest.approx(alpha, abs=1e-6)


def test_dfa_uncorrelated_near_half(spark):
    from etl_java_spark.operators.timeseries import dfa_alpha

    # LCG noise: alpha should land near 0.5 (loose sanity band)
    x, vals = 3, []
    for _ in range(256):
        x = (x * 1103515245 + 12345) % 2147483648
        vals.append(x % 1000)
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = dfa_alpha(df, "g", "t", "v").collect()[0]
    assert 0.3 < got["alpha"] < 0.8


def test_attribute_assortativity_perfect_homophily(spark):
    from etl_java_spark.operators.graph import attribute_assortativity

    edges = [(1, 2), (2, 1), (3, 4), (4, 3)]
    attrs = [(1, "x"), (2, "x"), (3, "y"), (4, "y")]
    e = spark.createDataFrame(edges, "src long, dst long")
    a = spark.createDataFrame(attrs, "node long, attr string")
    got = attribute_assortativity(e, a).collect()[0]
    assert got["m_edges"] == 4
    assert got["c_same"] == 4
    assert got["assortativity"] == pytest.approx(1.0, abs=1e-15)


def test_attribute_assortativity_matches_reference(spark):
    from etl_java_spark.operators.graph import attribute_assortativity

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (2, 4)]
    attrs = [(1, "x"), (2, "x"), (3, "y"), (4, "y")]
    e = spark.createDataFrame(edges, "src long, dst long")
    a = spark.createDataFrame(attrs, "node long, attr string")
    got = attribute_assortativity(e, a).collect()[0]
    lab = dict(attrs)
    m = len(edges)
    c_same = sum(1 for s, d in edges if lab[s] == lab[d])
    ra = {}
    cb = {}
    for s, d in edges:
        ra[lab[s]] = ra.get(lab[s], 0) + 1
        cb[lab[d]] = cb.get(lab[d], 0) + 1
    sab = sum(
        ra.get(k, 0) * cb.get(k, 0) for k in set(ra) | set(cb)
    )
    r = (m * c_same - sab) / (m * m - sab)
    assert got["assortativity"] == pytest.approx(r, abs=1e-12)


def test_weighted_quantiles_known_values(spark):
    from etl_java_spark.operators.dq import weighted_quantiles

    # values 1..4 with weights 1,1,1,7 -> total 10: p25 at cumw>=2.5
    # -> value 3 (cum 1,2,3,10); p50 at >=5 -> 4; p75 at >=7.5 -> 4
    rows = [("a", 1, 1), ("a", 2, 1), ("a", 3, 1), ("a", 4, 7)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = weighted_quantiles(df, "g", "v", "w").collect()[0]
    assert got["w_total"] == 10
    assert got["p25"] == 3
    assert got["p50"] == 4
    assert got["p75"] == 4


def test_weighted_quantiles_equal_weights_match_unweighted(spark):
    from etl_java_spark.operators.dq import weighted_quantiles

    vals = [10, 20, 30, 40, 50, 60, 70, 80]
    rows = [("a", v, 1) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = weighted_quantiles(df, "g", "v", "w").collect()[0]
    # lower-quantile convention: smallest v with cum >= q*n/100
    assert got["p25"] == 20
    assert got["p50"] == 40
    assert got["p75"] == 60


def test_weighted_quantiles_rejects_bad_pct(spark):
    from etl_java_spark.operators.dq import weighted_quantiles

    df = spark.createDataFrame([("a", 1, 1)], "g string, v long, w long")
    with pytest.raises(ValueError):
        weighted_quantiles(df, "g", "v", "w", quantiles_pct=(0, 50))


# ---------------------------------------------------------------------------
# wave 24: Greenwood bands, Wald SPRT replay, Fisher exact


def test_km_greenwood_matches_reference(spark):
    from etl_java_spark.operators.timeseries import km_greenwood_bands

    # durations with events (1) and censorings (0)
    data = [(2, 1), (3, 1), (3, 0), (5, 1), (5, 1), (7, 0), (8, 1)]
    df = spark.createDataFrame(data, "dur long, ev int")
    rows = {
        r["t"]: r for r in km_greenwood_bands(df, "dur", "ev").collect()
    }
    # replay: distinct event times 2,3,5,8
    s, g = 1.0, 0.0
    atrisk = {2: 7, 3: 6, 5: 4, 8: 1}
    dmap = {2: 1, 3: 1, 5: 2, 8: 1}
    for t in (2, 3, 5, 8):
        n, d = atrisk[t], dmap[t]
        s *= 1.0 - d / n
        if n > d:
            g += d / (n * (n - d))
            se = s * math.sqrt(g)
            assert rows[t]["se"] == pytest.approx(se, abs=1e-12), t
            assert rows[t]["ci_lower"] == pytest.approx(
                max(0.0, s - 1.96 * se), abs=1e-12
            )
            assert rows[t]["ci_upper"] == pytest.approx(
                min(1.0, s + 1.96 * se), abs=1e-12
            )
        else:
            # exhausted risk set: variance undefined
            assert rows[t]["se"] is None
        assert rows[t]["survival"] == pytest.approx(s, abs=1e-15), t


def test_sprt_replay_decides_h1_on_high_rate(spark):
    from etl_java_spark.operators.timeseries import sprt_bernoulli_replay

    # 80% successes vs H0 p=0.3 / H1 p=0.4 -> accept H1, and the
    # crossing time matches the straight-line replay
    xs = [1, 1, 0, 1, 1, 1, 0, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1]
    rows = [("a", t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, t long, x int")
    got = sprt_bernoulli_replay(
        df, "g", "t", "x", p0=0.3, p1=0.4, alpha=0.05, beta=0.05
    ).collect()[0]
    l1, l0 = math.log(0.4 / 0.3), math.log(0.6 / 0.7)
    a = math.log(0.95 / 0.05)
    k = m = 0
    t_cross = None
    for x in xs:
        m += 1
        k += x
        if k * l1 + (m - k) * l0 >= a and t_cross is None:
            t_cross = m
    assert got["decision"] == "accept_h1"
    assert got["t_accept_h1"] == t_cross
    assert got["n_at_decision"] == t_cross
    assert got["llr_final"] == pytest.approx(
        k * l1 + (m - k) * l0, abs=1e-12
    )


def test_sprt_replay_continue_on_boundary_sample(spark):
    from etl_java_spark.operators.timeseries import sprt_bernoulli_replay

    # tiny sample that never crosses either boundary
    rows = [("a", 0, 1), ("a", 1, 0), ("a", 2, 1)]
    df = spark.createDataFrame(rows, "g string, t long, x int")
    got = sprt_bernoulli_replay(df, "g", "t", "x").collect()[0]
    assert got["decision"] == "continue"
    assert got["n_at_decision"] is None


def test_sprt_rejects_bad_p(spark):
    from etl_java_spark.operators.timeseries import sprt_bernoulli_replay

    df = spark.createDataFrame([("a", 1, 1)], "g string, t long, x int")
    with pytest.raises(ValueError):
        sprt_bernoulli_replay(df, "g", "t", "x", p0=0.5, p1=0.5)


def test_fisher_exact_matches_combinatorial(spark):
    from math import comb

    from etl_java_spark.operators.experiments import fisher_exact

    tables = [("s1", 8, 2, 1, 5), ("s2", 3, 7, 6, 4), ("s3", 0, 5, 5, 0),
              ("s4", 12, 0, 0, 9)]
    df = spark.createDataFrame(tables, "st string, a long, b long, c long, d long")
    got = {
        r["stratum"]: r
        for r in fisher_exact(df, "st", "a", "b", "c", "d").collect()
    }

    def ref(a, b, c, d):
        r1, m1, n = a + b, a + c, a + b + c + d
        klo, khi = max(0, r1 + m1 - n), min(r1, m1)
        probs = {
            k: comb(r1, k) * comb(n - r1, m1 - k)
            for k in range(klo, khi + 1)
        }
        tot = sum(probs.values())
        pa = probs[a]
        return (
            sum(v for v in probs.values() if v <= pa * (1 + 1e-7)) / tot
        )

    for st, a, b, c, d in tables:
        assert got[st]["p_two"] == pytest.approx(
            ref(a, b, c, d), abs=1e-9
        ), st


def test_fisher_exact_extreme_table_small_p(spark):
    from etl_java_spark.operators.experiments import fisher_exact

    # strongly diagonal table: p should be tiny, OR large
    df = spark.createDataFrame(
        [("s", 20, 1, 2, 18)], "st string, a long, b long, c long, d long"
    )
    got = fisher_exact(df, "st", "a", "b", "c", "d").collect()[0]
    assert got["p_two"] < 1e-6
    assert got["odds_ratio"] == pytest.approx(20 * 18 / (1 * 2), abs=1e-9)


# ---------------------------------------------------------------------------
# wave 25: Chatterjee xi, Page-Hinkley, rank aggregation


def _xi_ref(xy):
    # ties-general Chatterjee xi with rows ordered by (x, y)
    xy = sorted(xy)
    ys = [y for _, y in xy]
    n = len(ys)
    r = [sum(1 for z in ys if z <= y) for y in ys]
    l = [sum(1 for z in ys if z >= y) for y in ys]
    a = sum(abs(r[i + 1] - r[i]) for i in range(n - 1))
    b = sum(li * (n - li) for li in l)
    return 1 - n * a / (2 * b)


def test_chatterjee_xi_functional_dependence(spark):
    from etl_java_spark.operators.evaluation import chatterjee_xi

    # y = (x - 20)^2: smooth, perfectly functional, non-monotone
    xy = [(x, (x - 20) ** 2) for x in range(41)]
    rows = [("a", x, y) for x, y in xy]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = chatterjee_xi(df, "g", "x", "y").collect()[0]
    assert got["xi"] == pytest.approx(_xi_ref(xy), abs=1e-12)
    assert got["xi"] > 0.8  # strong dependence detected


def test_chatterjee_xi_matches_reference_with_ties(spark):
    from etl_java_spark.operators.evaluation import chatterjee_xi

    xy = [(0, 2), (1, 5), (2, 2), (3, 8), (4, 5), (5, 2), (6, 9),
          (7, 5), (8, 8), (9, 2)]
    rows = [("a", x, y) for x, y in xy]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = chatterjee_xi(df, "g", "x", "y").collect()[0]
    assert got["n_rows"] == len(xy)
    assert got["xi"] == pytest.approx(_xi_ref(xy), abs=1e-12)


def test_chatterjee_xi_constant_y_null(spark):
    from etl_java_spark.operators.evaluation import chatterjee_xi

    rows = [("a", x, 7) for x in range(6)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = chatterjee_xi(df, "g", "x", "y").collect()[0]
    assert got["xi"] is None  # l*(n-l) = 0 everywhere


def test_page_hinkley_detects_level_shift(spark):
    from etl_java_spark.operators.timeseries import page_hinkley

    # flat 100 then jump to 200: upward drift must alarm after the jump
    vals = [100] * 10 + [200] * 10
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = page_hinkley(df, "g", "t", "v", delta=0, lam=100).collect()[0]
    # replay: n=20, s=3000; u_t = 20*v - 3000; cum m; ph = m - runmin
    n, s = 20, sum(vals)
    m = mn = 0
    alarm = None
    maxph = 0
    for i, v in enumerate(vals, start=1):
        m += n * v - s
        mn = min(mn, m)
        ph = m - mn
        maxph = max(maxph, ph)
        if alarm is None and ph > n * 100:
            alarm = i
    assert got["alarmed"] is True
    assert got["t_alarm"] == alarm
    assert got["max_ph"] == pytest.approx(maxph / n, abs=1e-9)


def test_page_hinkley_no_alarm_on_flat(spark):
    from etl_java_spark.operators.timeseries import page_hinkley

    rows = [("a", t, 50) for t in range(8)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = page_hinkley(df, "g", "t", "v", lam=1).collect()[0]
    assert got["alarmed"] is False
    assert got["max_ph"] == 0.0


def test_rank_aggregation_known_panel(spark):
    from etl_java_spark.operators.evaluation import rank_aggregation

    # 3 judges over items a,b,c: a usually first
    panel = [
        (1, "a", 1), (1, "b", 2), (1, "c", 3),
        (2, "a", 1), (2, "c", 2), (2, "b", 3),
        (3, "b", 1), (3, "a", 2), (3, "c", 3),
    ]
    df = spark.createDataFrame(panel, "rk long, item string, pos long")
    got = {
        r["item"]: r
        for r in rank_aggregation(df, "rk", "item", "pos").collect()
    }
    # borda: a = (3-1)+(3-1)+(3-2)=5, b = 1+0+2=3, c = 0+1+0=1
    assert got["a"]["borda"] == 5
    assert got["b"]["borda"] == 3
    assert got["c"]["borda"] == 1
    # copeland: a beats b (2/3) and c (3/3) -> +2; b beats c (2/3),
    # loses a -> 0; c loses both -> -2
    assert got["a"]["copeland"] == 2
    assert got["b"]["copeland"] == 0
    assert got["c"]["copeland"] == -2


def test_rank_aggregation_partial_panels(spark):
    from etl_java_spark.operators.evaluation import rank_aggregation

    # second judge ranked only two items: m=2 for its borda terms
    panel = [
        (1, "a", 1), (1, "b", 2), (1, "c", 3),
        (2, "c", 1), (2, "a", 2),
    ]
    df = spark.createDataFrame(panel, "rk long, item string, pos long")
    got = {
        r["item"]: r
        for r in rank_aggregation(df, "rk", "item", "pos").collect()
    }
    assert got["a"]["n_rankings"] == 2
    assert got["a"]["borda"] == (3 - 1) + (2 - 2)
    assert got["c"]["borda"] == (3 - 3) + (2 - 1)


# ---------------------------------------------------------------------------
# wave 26: count-model MoM, SRM, ANOVA effect sizes


def test_count_model_mom_matches_reference(spark):
    from etl_java_spark.operators.experiments import count_model_mom

    vals = [0, 0, 1, 2, 2, 3, 7, 0, 5, 10]
    rows = [("a", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = count_model_mom(df, "g", "v").collect()[0]
    n = len(vals)
    m = sum(vals) / n
    var_s = (n * sum(v * v for v in vals) - sum(vals) ** 2) / (
        n * (n - 1)
    )
    lam = m + var_s / m - 1
    assert got["mean"] == pytest.approx(m, abs=1e-12)
    assert got["var_s"] == pytest.approx(var_s, abs=1e-12)
    assert got["dispersion_index"] == pytest.approx(var_s / m, abs=1e-12)
    assert got["nb_r"] == pytest.approx(m * m / (var_s - m), abs=1e-12)
    assert got["nb_p"] == pytest.approx(m / var_s, abs=1e-12)
    assert got["zip_lambda"] == pytest.approx(lam, abs=1e-12)
    assert got["zip_pi"] == pytest.approx(1 - m / lam, abs=1e-12)
    assert got["zero_frac"] == pytest.approx(0.3, abs=1e-15)
    assert got["poisson_zero_frac"] == pytest.approx(
        math.exp(-m), abs=1e-12
    )


def test_count_model_mom_underdispersed_nulls(spark):
    from etl_java_spark.operators.experiments import count_model_mom

    # variance < mean: NB/ZIP MoM undefined
    rows = [("a", v) for v in (5, 5, 6, 5, 6, 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = count_model_mom(df, "g", "v").collect()[0]
    assert got["nb_r"] is None
    assert got["zip_pi"] is None


def test_srm_test_balanced_and_skewed(spark):
    from etl_java_spark.operators.experiments import srm_test

    rows = [("a",)] * 100 + [("b",)] * 100
    df = spark.createDataFrame(rows, "variant string")
    got = srm_test(df, "variant", {"a": 1, "b": 1}).collect()[0]
    assert got["chi2"] == pytest.approx(0.0, abs=1e-12)

    rows2 = [("a",)] * 150 + [("b",)] * 90 + [("c",)] * 60
    df2 = spark.createDataFrame(rows2, "variant string")
    got2 = srm_test(df2, "variant", {"a": 1, "b": 1, "c": 1}).collect()[0]
    # E = 100 each: chi2 = 50^2/100 + 10^2/100 + 40^2/100 = 42
    assert got2["chi2"] == pytest.approx(42.0, abs=1e-9)
    assert got2["worst_variant"] == "a"
    assert got2["worst_abs_dev"] == pytest.approx(50.0, abs=1e-9)


def test_srm_test_unexpected_variant_raises(spark):
    from etl_java_spark.operators.experiments import srm_test

    df = spark.createDataFrame([("a",), ("rogue",)], "variant string")
    out = srm_test(df, "variant", {"a": 1})
    with pytest.raises(Exception, match="unexpected variant"):
        out.collect()


def test_srm_test_rejects_bad_weights(spark):
    from etl_java_spark.operators.experiments import srm_test

    df = spark.createDataFrame([("a",)], "variant string")
    with pytest.raises(ValueError):
        srm_test(df, "variant", {"a": 0})


def test_anova_effect_sizes_matches_reference(spark):
    from etl_java_spark.operators.experiments import anova_effect_sizes

    groups = {"a": [10, 12, 14], "b": [20, 22, 24, 26], "c": [5, 7]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = anova_effect_sizes(df, "g", "v").collect()[0]
    allv = [v for vs in groups.values() for v in vs]
    n, k = len(allv), len(groups)
    s = sum(allv)
    sst = sum(v * v for v in allv) - s * s / n
    ssb = (
        sum(round(sum(vs) ** 2 / len(vs), 6) for vs in groups.values())
        - s * s / n
    )
    ssw = sst - ssb
    msw = ssw / (n - k)
    assert got["k_groups"] == k
    assert got["n_total"] == n
    assert got["eta2"] == pytest.approx(ssb / sst, abs=1e-10)
    assert got["omega2"] == pytest.approx(
        (ssb - (k - 1) * msw) / (sst + msw), abs=1e-10
    )


def test_anova_effect_sizes_identical_groups_zero(spark):
    from etl_java_spark.operators.experiments import anova_effect_sizes

    rows = [("a", 1), ("a", 3), ("b", 1), ("b", 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = anova_effect_sizes(df, "g", "v").collect()[0]
    assert got["eta2"] == pytest.approx(0.0, abs=1e-12)
    assert got["omega2"] < 0  # omega2 goes slightly negative at SSB=0


# ---------------------------------------------------------------------------
# wave 27: Storey q-values, tail dependence, contingency residuals


def test_storey_qvalues_matches_reference(spark):
    from etl_java_spark.operators.experiments import storey_qvalues

    ps = [0.001, 0.008, 0.039, 0.041, 0.16, 0.31, 0.42, 0.59, 0.71,
          0.86, 0.93, 0.97]
    rows = [(f"t{i:02d}", p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "k string, p double")
    got = {
        r["k"]: r for r in storey_qvalues(df, ["k"], "p").collect()
    }
    m = len(ps)
    pi0 = min(1.0, sum(1 for p in ps if p > 0.5) / (m * 0.5))
    order = sorted(range(m), key=lambda i: (ps[i], f"t{i:02d}"))
    raw = [pi0 * m * ps[i] / (r + 1) for r, i in enumerate(order)]
    qs = raw[:]
    for r in range(m - 2, -1, -1):
        qs[r] = min(qs[r], qs[r + 1])
    qs = [min(1.0, q) for q in qs]
    for r, i in enumerate(order):
        k = f"t{i:02d}"
        assert got[k]["rank"] == r + 1
        assert got[k]["pi0"] == pytest.approx(pi0, abs=1e-12)
        assert got[k]["q_value"] == pytest.approx(qs[r], abs=1e-12), k


def test_storey_qvalues_monotone_and_bounded(spark):
    from etl_java_spark.operators.experiments import storey_qvalues

    ps = [0.9, 0.95, 0.99, 0.85, 0.8]
    rows = [(f"t{i}", p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "k string, p double")
    got = sorted(
        storey_qvalues(df, ["k"], "p").collect(),
        key=lambda r: r["rank"],
    )
    qs = [r["q_value"] for r in got]
    assert all(q <= 1.0 for q in qs)
    assert qs == sorted(qs)  # monotone in rank


def test_storey_rejects_bad_lambda(spark):
    from etl_java_spark.operators.experiments import storey_qvalues

    df = spark.createDataFrame([("a", 0.5)], "k string, p double")
    with pytest.raises(ValueError):
        storey_qvalues(df, ["k"], "p", lam=1.0)


def test_tail_dependence_comonotone_and_independent(spark):
    from etl_java_spark.operators.assoc import tail_dependence

    # comonotone: y = x -> both lambdas = 1
    rows = [(v, v) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = tail_dependence(df, "x", "y", 9, 10).collect()[0]
    assert got["lambda_upper"] == pytest.approx(1.0, abs=1e-15)
    assert got["lambda_lower"] == pytest.approx(1.0, abs=1e-15)
    # checkerboard-independent-ish: y cycles independently of x
    rows2 = [(v, (v * 7) % 100) for v in range(1, 101)]
    df2 = spark.createDataFrame(rows2, "x long, y long")
    got2 = tail_dependence(df2, "x", "y", 9, 10).collect()[0]
    assert got2["lambda_upper"] < 0.5


def test_tail_dependence_thresholds_exact(spark):
    from etl_java_spark.operators.assoc import tail_dependence

    # n=10 values 1..10: hi threshold = smallest v with cum >= 9 -> 9
    # lo threshold = smallest v with cum >= 1 -> 1
    rows = [(v, 11 - v) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = tail_dependence(df, "x", "y", 9, 10).collect()[0]
    assert got["x_hi"] == 9 and got["x_lo"] == 1
    assert got["y_hi"] == 9 and got["y_lo"] == 1
    # antimonotone: top x never pairs with top y
    assert got["lambda_upper"] == 0.0
    assert got["lambda_lower"] == 0.0


def test_contingency_residuals_matches_reference(spark):
    from etl_java_spark.operators.assoc import contingency_residuals

    obs = (
        [("x", "u")] * 30 + [("x", "v")] * 10
        + [("y", "u")] * 15 + [("y", "v")] * 45
    )
    df = spark.createDataFrame(obs, "a string, b string")
    got = {
        (r["a"], r["b"]): r
        for r in contingency_residuals(df, "a", "b").collect()
    }
    n = 100
    ri = {"x": 40, "y": 60}
    cj = {"u": 45, "v": 55}
    o = {("x", "u"): 30, ("x", "v"): 10, ("y", "u"): 15, ("y", "v"): 45}
    for key, ov in o.items():
        e = ri[key[0]] * cj[key[1]] / n
        r = (ov - e) / math.sqrt(
            e * (1 - ri[key[0]] / n) * (1 - cj[key[1]] / n)
        )
        assert got[key]["expected"] == pytest.approx(e, abs=1e-10)
        assert got[key]["adj_residual"] == pytest.approx(r, abs=1e-10)
    # 2x2 symmetry: all four |residuals| equal
    vals = [abs(r["adj_residual"]) for r in got.values()]
    assert max(vals) - min(vals) < 1e-9


# ---------------------------------------------------------------------------
# wave 28: process mining (DFG, trace variants, conformance)

_LOG = [
    # (case, seq, ts_s, act)
    (1, 1, 0, "signup"), (1, 2, 60, "view"), (1, 3, 90, "click"),
    (1, 4, 150, "purchase"),
    (2, 1, 0, "view"), (2, 2, 30, "click"), (2, 3, 45, "view"),
    (2, 4, 100, "error"), (2, 5, 130, "purchase"),
    (3, 1, 0, "signup"), (3, 2, 10, "view"), (3, 3, 40, "click"),
    (3, 4, 80, "purchase"),
]


def _log_df(spark):
    import datetime as dt

    rows = [
        (c, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), i, a)
        for c, i, s, a in _LOG
    ]
    return spark.createDataFrame(
        rows, "case long, ts timestamp, eid long, act string"
    )


def test_directly_follows_graph_counts_and_gaps(spark):
    from etl_java_spark.operators.process import directly_follows_graph

    df = _log_df(spark)
    got = {
        (r["act_from"], r["act_to"]): r
        for r in directly_follows_graph(
            df, ["case"], ["ts", "eid"], "act"
        ).collect()
    }
    # signup->view occurs in cases 1 and 3 with gaps 60 and 10
    e = got[("signup", "view")]
    assert e["n_events"] == 2 and e["n_cases"] == 2
    assert e["mean_gap_s"] == pytest.approx(35.0, abs=1e-9)
    # click->view (rework) only case 2, gap 15
    e2 = got[("click", "view")]
    assert e2["n_events"] == 1 and e2["mean_gap_s"] == pytest.approx(15.0)
    assert ("purchase", "signup") not in got  # never adjacent


def test_trace_variants_census(spark):
    from etl_java_spark.operators.process import trace_variants

    df = _log_df(spark)
    got = {
        r["variant"]: r
        for r in trace_variants(
            df, ["case"], ["ts", "eid"], "act", min_cases=1
        ).collect()
    }
    assert got["signup>view>click>purchase"]["n_cases"] == 2
    assert got["signup>view>click>purchase"]["case_share"] == pytest.approx(
        2 / 3, abs=1e-12
    )
    assert got["view>click>view>error>purchase"]["n_cases"] == 1
    # min_cases filters the tail
    from etl_java_spark.operators.process import trace_variants as tv

    head = tv(df, ["case"], ["ts", "eid"], "act", min_cases=2).collect()
    assert len(head) == 1


def test_conformance_fitness_scorecard(spark):
    from etl_java_spark.operators.process import conformance_fitness

    df = _log_df(spark)
    got = conformance_fitness(
        df, ["case"], ["ts", "eid"], "act",
        expected_order=["signup", "view", "click", "purchase"],
    ).collect()[0]
    # case2 transitions among modeled acts: view->click fwd,
    # click->view bwd, (error skipped both sides), so modeled
    # transitions: cases 1,3 give 3 fwd each; case 2: v->c fwd,
    # c->v bwd = 7 fwd, 1 bwd
    assert got["n_cases"] == 3
    assert got["n_forward"] == 7
    assert got["n_backward"] == 1
    assert got["fitness"] == pytest.approx(7 / 8, abs=1e-12)
    assert got["n_off_model"] == 1
    assert got["perfect_case_share"] == pytest.approx(2 / 3, abs=1e-12)


def test_conformance_rejects_short_model(spark):
    from etl_java_spark.operators.process import conformance_fitness

    df = _log_df(spark)
    with pytest.raises(ValueError):
        conformance_fitness(df, ["case"], ["ts"], "act", ["signup"])


# ---------------------------------------------------------------------------
# wave 29: Bass diffusion, E-values, fractional knapsack


def test_bass_diffusion_recovers_planted_curve(spark):
    from etl_java_spark.operators.timeseries import bass_diffusion

    # simulate exact discrete Bass with M=1000, p=0.03, q=0.4 and
    # integer-rounded adopters
    M, p, q = 1000, 0.03, 0.4
    N = 0
    series = []
    for t in range(30):
        s = round(p * M + (q - p) * N - (q / M) * N * N)
        s = max(s, 0)
        series.append((t, s))
        N += s
    df = spark.createDataFrame(series, "t long, s long")
    got = bass_diffusion(df, "t", "s").collect()[0]
    assert got["market_m"] == pytest.approx(M, rel=0.05)
    assert got["p_innovation"] == pytest.approx(p, rel=0.15)
    assert got["q_imitation"] == pytest.approx(q, rel=0.1)
    assert got["peak_t"] == pytest.approx(
        math.log(q / p) / (p + q), rel=0.2
    )


def test_bass_diffusion_non_bass_nulls(spark):
    from etl_java_spark.operators.timeseries import bass_diffusion

    # accelerating growth (c > 0): no positive root -> NULLs
    series = [(t, 2**t) for t in range(10)]
    df = spark.createDataFrame(series, "t long, s long")
    got = bass_diffusion(df, "t", "s").collect()[0]
    assert got["market_m"] is None
    assert got["peak_t"] is None


def test_evalue_panel_known_values(spark):
    from etl_java_spark.operators.experiments import evalue_panel

    # RR = (30/60)/(15/60) = 2 -> E = 2 + sqrt(2) ~ 3.414
    rows = [("s", 30, 30, 15, 45)]
    df = spark.createDataFrame(rows, "st string, a long, b long, c long, d long")
    got = evalue_panel(df, "st", "a", "b", "c", "d").collect()[0]
    assert got["risk_ratio"] == pytest.approx(2.0, abs=1e-12)
    assert got["e_value"] == pytest.approx(2 + math.sqrt(2), abs=1e-12)
    rr = 2.0
    se = math.sqrt(1 / 30 - 1 / 60 + 1 / 15 - 1 / 60)
    lo = math.exp(math.log(rr) - 1.96 * se)
    assert got["rr_ci_lo"] == pytest.approx(lo, abs=1e-10)
    if lo > 1:
        assert got["e_value_ci"] == pytest.approx(
            lo + math.sqrt(lo * (lo - 1)), abs=1e-10
        )


def test_evalue_protective_rr_mirrors(spark):
    from etl_java_spark.operators.experiments import evalue_panel

    # protective RR = 0.5: E-value must equal that of RR = 2
    rows = [("s", 15, 45, 30, 30)]
    df = spark.createDataFrame(rows, "st string, a long, b long, c long, d long")
    got = evalue_panel(df, "st", "a", "b", "c", "d").collect()[0]
    assert got["risk_ratio"] == pytest.approx(0.5, abs=1e-12)
    assert got["e_value"] == pytest.approx(2 + math.sqrt(2), abs=1e-12)


def test_evalue_ci_crossing_one_reads_one(spark):
    from etl_java_spark.operators.experiments import evalue_panel

    # tiny counts: CI spans 1 -> e_value_ci = 1
    rows = [("s", 3, 7, 2, 8)]
    df = spark.createDataFrame(rows, "st string, a long, b long, c long, d long")
    got = evalue_panel(df, "st", "a", "b", "c", "d").collect()[0]
    assert got["rr_ci_lo"] < 1 < got["rr_ci_hi"]
    assert got["e_value_ci"] == 1.0


def test_fractional_knapsack_greedy_optimal(spark):
    from etl_java_spark.operators.relational import fractional_knapsack

    items = [("a", 60, 10), ("b", 100, 20), ("c", 120, 30)]
    df = spark.createDataFrame(items, "item string, v long, c long")
    got = {
        r["item"]: r
        for r in fractional_knapsack(df, "item", "v", "c", budget=50)
        .collect()
    }
    # ratios: a=6, b=5, c=4 -> take a full, b full, c 20/30
    assert got["a"]["take_frac"] == 1.0
    assert got["b"]["take_frac"] == 1.0
    assert got["c"]["take_frac"] == pytest.approx(20 / 30, abs=1e-12)
    assert got["c"]["value_taken"] == pytest.approx(80.0, abs=1e-9)
    total = sum(r["value_taken"] for r in got.values())
    assert total == pytest.approx(240.0, abs=1e-9)  # the LP optimum


def test_fractional_knapsack_budget_guard_and_drop(spark):
    from etl_java_spark.operators.relational import fractional_knapsack

    df = spark.createDataFrame(
        [("a", 5, 10), ("z", 9, 0)], "item string, v long, c long"
    )
    out = fractional_knapsack(df, "item", "v", "c", budget=5).collect()
    assert [r["item"] for r in out] == ["a"]  # zero-cost row dropped
    assert out[0]["take_frac"] == pytest.approx(0.5, abs=1e-12)
    with pytest.raises(ValueError):
        fractional_knapsack(df, "item", "v", "c", budget=0)


# ---------------------------------------------------------------------------
# wave 30: periodogram, Haar energy, SAX words


def test_periodogram_detects_planted_period(spark):
    from etl_java_spark.operators.timeseries import periodogram_at

    # strong period-8 square-ish wave, zero at period 5
    vals = [100 + (50 if (t % 8) < 4 else -50) for t in range(64)]
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = {
        r["period"]: r["var_frac"]
        for r in periodogram_at(df, "g", "t", "v", periods=(8, 5))
        .collect()
    }
    assert got[8] > 0.7  # fundamental carries most variance
    assert got[5] < 0.05


def test_periodogram_pure_cosine_near_one(spark):
    from etl_java_spark.operators.timeseries import periodogram_at

    vals = [
        round(1000 * math.cos(2 * math.pi * t / 16)) for t in range(64)
    ]
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = periodogram_at(df, "g", "t", "v", periods=(16,)).collect()[0]
    assert got["var_frac"] == pytest.approx(1.0, abs=0.01)


def test_haar_energy_matches_reference(spark):
    from etl_java_spark.operators.timeseries import haar_energy

    vals = [13, 7, 22, 18, 5, 29, 11, 16, 8, 24, 19, 3, 27, 14, 21, 9, 6]
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = {
        r["level"]: r
        for r in haar_energy(df, "g", "t", "v", levels=3).collect()
    }
    cur = vals[:]
    for k in (1, 2, 3):
        pairs = [
            (cur[2 * i], cur[2 * i + 1]) for i in range(len(cur) // 2)
        ]
        e = sum((a - b) ** 2 for a, b in pairs) / 2**k
        assert got[k]["n_pairs"] == len(pairs)
        assert got[k]["energy"] == pytest.approx(e, abs=1e-9), k
        cur = [a + b for a, b in pairs]


def test_haar_energy_flat_series_zero(spark):
    from etl_java_spark.operators.timeseries import haar_energy

    rows = [("a", t, 42) for t in range(16)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    for r in haar_energy(df, "g", "t", "v", levels=3).collect():
        assert r["energy"] == 0.0


def test_sax_words_census(spark):
    from etl_java_spark.operators.timeseries import sax_words

    # alternating high/low: every 4-window is the same word
    vals = [100, 0, 100, 0] * 8
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = sax_words(df, "g", "t", "v", word_len=4, min_count=1).collect()
    assert len(out) == 1
    w = out[0]
    assert w["n_windows"] == 8
    # u alternates +/-, |z| = 1 < 0.6745*sqrt? thr in n-scaled space:
    # symbols must alternate between the upper and lower halves
    assert set(w["word"]) <= {"a", "b", "c", "d"}
    # symbols alternate with the series: positions 0,2 match, 1,3 match
    assert w["word"][0] == w["word"][2]
    assert w["word"][1] == w["word"][3]
    assert w["word"][0] != w["word"][1]


def test_sax_words_partial_window_dropped(spark):
    from etl_java_spark.operators.timeseries import sax_words

    vals = [10, 20, 30, 40, 50, 60]  # 6 rows -> one full 4-window
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = sax_words(df, "g", "t", "v", word_len=4, min_count=1).collect()
    assert sum(r["n_windows"] for r in out) == 1


# ---------------------------------------------------------------------------
# wave 31: KPSS, Pettitt, lognormal fit


def test_kpss_matches_reference(spark):
    from etl_java_spark.operators.timeseries import kpss_level

    x, vals = 11, []
    for _ in range(48):
        x = (x * 31 + 7) % 97
        vals.append(x)
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = kpss_level(df, "g", "t", "v", lags=3).collect()[0]
    n, s = len(vals), sum(vals)
    u = [n * v - s for v in vals]
    st, acc = [], 0
    for uu in u:
        acc += uu
        st.append(acc)
    A = sum(v * v for v in st)
    G = [
        sum(u[i] * u[i - j] for i in range(j, n)) for j in range(0, 4)
    ]
    lrv = G[0] + sum(2 * (1 - j / 4.0) * G[j] for j in (1, 2, 3))
    assert got["kpss_stat"] == pytest.approx(A / (n * lrv), abs=1e-10)


def test_kpss_trending_vs_flat(spark):
    from etl_java_spark.operators.timeseries import kpss_level

    # a strong trend should yield a much larger statistic than noise
    trend = [("t", i, 100 + 10 * i) for i in range(60)]
    x, noise = 17, []
    for i in range(60):
        x = (x * 29 + 13) % 89
        noise.append(("n", i, 100 + x % 20))
    df = spark.createDataFrame(
        trend + noise, "g string, t long, v long"
    )
    got = {
        r["grp"]: r["kpss_stat"]
        for r in kpss_level(df, "g", "t", "v", lags=4).collect()
    }
    assert got["t"] > 5 * got["n"]


def test_pettitt_locates_level_shift(spark):
    from etl_java_spark.operators.timeseries import pettitt_test

    vals = [10] * 15 + [30] * 15
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = pettitt_test(df, "g", "t", "v").collect()[0]
    assert got["change_t"] == 14  # last index of the low regime
    # exact K for a clean two-level shift: max U at the boundary
    n = 30
    # midranks: lows 2R = 16, highs 2R = 46
    ut14 = 15 * 16 - 15 * (n + 1)
    assert got["k_stat"] == abs(ut14)
    assert got["p_approx"] < 0.01


def test_pettitt_flat_series_high_p(spark):
    from etl_java_spark.operators.timeseries import pettitt_test

    rows = [("a", t, 5) for t in range(20)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = pettitt_test(df, "g", "t", "v").collect()[0]
    assert got["k_stat"] == 0
    assert got["p_approx"] == pytest.approx(1.0, abs=1e-12)


def test_lognormal_fit_recovers_planted(spark):
    from etl_java_spark.operators.corpus import lognormal_fit

    # deterministic lognormal-ish sample via exp of a symmetric grid
    vals = [round(math.exp(5 + 0.1 * k)) for k in range(-20, 21)]
    rows = [("a", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = lognormal_fit(df, "g", "v").collect()[0]
    assert got["mu_log"] == pytest.approx(5.0, abs=0.01)
    assert got["sigma_log"] == pytest.approx(
        0.1 * math.sqrt(sum(k * k for k in range(-20, 21)) / 40), abs=0.01
    )
    # exact replay of the MoM readouts (a uniform log grid is NOT a
    # Gaussian-log sample, so fit_ratio is legitimately above 1 —
    # exactly the misfit the diagnostic exists to flag)
    n = len(vals)
    sl = sum(round(math.log(v), 12) for v in vals)
    sl2 = sum(round(math.log(v) ** 2, 12) for v in vals)
    mu = sl / n
    var = (sl2 - sl * sl / n) / (n - 1)
    obs = sum(vals) / n
    assert got["fit_ratio"] == pytest.approx(
        math.exp(mu + var / 2) / obs, abs=1e-9
    )
    assert got["fit_ratio"] > 1.05  # the flagged misfit


def test_lognormal_fit_drops_nonpositive(spark):
    from etl_java_spark.operators.corpus import lognormal_fit

    rows = [("a", 10), ("a", 0), ("a", 100), ("a", -5), ("a", 1000)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = lognormal_fit(df, "g", "v").collect()[0]
    assert got["n_rows"] == 3


# ---------------------------------------------------------------------------
# wave 32: Deming, circular stats, circular-linear correlation


def test_deming_matches_reference_and_tls_symmetry(spark):
    from etl_java_spark.operators.evaluation import deming_regression

    pts = [(10, 12), (20, 19), (30, 33), (40, 38), (50, 54), (60, 58)]
    rows = [("a", x, y) for x, y in pts]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = deming_regression(df, "g", "x", "y", lam=1.0).collect()[0]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    dxx = n * sum(x * x for x, _ in pts) - sx * sx
    dyy = n * sum(y * y for _, y in pts) - sy * sy
    dxy = n * sum(x * y for x, y in pts) - sx * sy
    core = dyy - dxx
    beta = (core + math.sqrt(core * core + 4 * dxy * dxy)) / (2 * dxy)
    assert got["beta"] == pytest.approx(beta, abs=1e-10)
    assert got["alpha"] == pytest.approx((sy - beta * sx) / n, abs=1e-9)
    # TLS symmetry: swapping x/y must invert the slope
    df2 = spark.createDataFrame(
        [("a", y, x) for x, y in pts], "g string, x long, y long"
    )
    got2 = deming_regression(df2, "g", "x", "y", lam=1.0).collect()[0]
    assert got2["beta"] == pytest.approx(1 / beta, abs=1e-9)


def test_deming_perfect_line_exact(spark):
    from etl_java_spark.operators.evaluation import deming_regression

    rows = [("a", x, 3 * x + 7) for x in range(1, 8)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = deming_regression(df, "g", "x", "y").collect()[0]
    assert got["beta"] == pytest.approx(3.0, abs=1e-12)
    assert got["alpha"] == pytest.approx(7.0, abs=1e-9)


def test_circular_stats_concentrated_vs_uniform(spark):
    from etl_java_spark.operators.timeseries import circular_stats

    rows = [("c", 9)] * 30 + [("u", h % 24) for h in range(48)]
    df = spark.createDataFrame(rows, "g string, pos long")
    got = {
        r["grp"]: r for r in circular_stats(df, "g", "pos", 24).collect()
    }
    assert got["c"]["rbar"] == pytest.approx(1.0, abs=1e-9)
    assert got["c"]["mean_pos"] == pytest.approx(9.0, abs=1e-6)
    assert got["c"]["p_approx"] < 1e-9
    assert got["u"]["rbar"] == pytest.approx(0.0, abs=1e-9)
    assert got["u"]["p_approx"] > 0.9


def test_circular_stats_wraparound_mean(spark):
    from etl_java_spark.operators.timeseries import circular_stats

    # hours 23 and 1 -> circular mean at midnight (0), not 12
    rows = [("a", 23), ("a", 1)] * 10
    df = spark.createDataFrame(rows, "g string, pos long")
    got = circular_stats(df, "g", "pos", 24).collect()[0]
    assert got["mean_pos"] == pytest.approx(0.0, abs=1e-6)


def test_circular_linear_corr_planted_cosine(spark):
    from etl_java_spark.operators.timeseries import circular_linear_corr

    # value rides the clock exactly: x = 100*cos(ang) + 200
    rows = []
    for i in range(240):
        h = i % 24
        x = round(100 * math.cos(2 * math.pi * h / 24)) + 200
        rows.append(("a", h, x))
    df = spark.createDataFrame(rows, "g string, pos long, x long")
    got = circular_linear_corr(df, "g", "pos", "x", 24).collect()[0]
    assert got["r2_circ_lin"] == pytest.approx(1.0, abs=0.01)


def test_circular_linear_corr_constant_value_null(spark):
    from etl_java_spark.operators.timeseries import circular_linear_corr

    rows = [("a", h % 24, 5) for h in range(48)]
    df = spark.createDataFrame(rows, "g string, pos long, x long")
    got = circular_linear_corr(df, "g", "pos", "x", 24).collect()[0]
    assert got["r2_circ_lin"] is None


# ---------------------------------------------------------------------------
# wave 33: gamma/tau-c, diagnostic panel, Sidak


def test_gamma_tau_c_matches_bruteforce(spark):
    from etl_java_spark.operators.evaluation import gamma_tau_c

    xy = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3), (3, 2), (3, 3),
          (3, 3), (1, 3), (2, 2)]
    df = spark.createDataFrame(xy, "x long, y long")
    got = gamma_tau_c(df, "x", "y").collect()[0]
    p = q = 0
    n = len(xy)
    for i in range(n):
        for j in range(i + 1, n):
            dx = xy[i][0] - xy[j][0]
            dy = xy[i][1] - xy[j][1]
            if dx * dy > 0:
                p += 1
            elif dx * dy < 0:
                q += 1
    m = min(len({a for a, _ in xy}), len({b for _, b in xy}))
    assert got["concordant"] == p
    assert got["discordant"] == q
    assert got["m_categories"] == m
    assert got["gk_gamma"] == pytest.approx((p - q) / (p + q), abs=1e-12)
    assert got["stuart_tau_c"] == pytest.approx(
        2 * m * (p - q) / (n * n * (m - 1)), abs=1e-12
    )


def test_gamma_perfect_concordance(spark):
    from etl_java_spark.operators.evaluation import gamma_tau_c

    df = spark.createDataFrame(
        [(i, i * 2) for i in range(1, 9)], "x long, y long"
    )
    got = gamma_tau_c(df, "x", "y").collect()[0]
    assert got["gk_gamma"] == pytest.approx(1.0, abs=1e-15)


def test_diagnostic_panel_known_confusion(spark):
    from etl_java_spark.operators.evaluation import diagnostic_panel

    rows = (
        [("g", 1, 1)] * 40 + [("g", 1, 0)] * 10
        + [("g", 0, 1)] * 5 + [("g", 0, 0)] * 45
    )
    df = spark.createDataFrame(rows, "grp string, t int, f int")
    got = diagnostic_panel(df, "grp", "t", "f").collect()[0]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (40, 5, 10, 45)
    assert got["sensitivity"] == pytest.approx(0.8, abs=1e-12)
    assert got["specificity"] == pytest.approx(0.9, abs=1e-12)
    assert got["ppv"] == pytest.approx(40 / 45, abs=1e-12)
    assert got["npv"] == pytest.approx(45 / 55, abs=1e-12)
    assert got["lr_pos"] == pytest.approx(0.8 / 0.1, abs=1e-9)
    assert got["lr_neg"] == pytest.approx(0.2 / 0.9, abs=1e-9)
    assert got["youden_j"] == pytest.approx(0.7, abs=1e-12)


def test_diagnostic_panel_degenerate_nulls(spark):
    from etl_java_spark.operators.evaluation import diagnostic_panel

    rows = [("g", 1, 1)] * 5  # no negatives at all
    df = spark.createDataFrame(rows, "grp string, t int, f int")
    got = diagnostic_panel(df, "grp", "t", "f").collect()[0]
    assert got["specificity"] is None
    assert got["youden_j"] is None


def test_sidak_matches_reference(spark):
    from etl_java_spark.operators.experiments import sidak_correction

    ps = [0.001, 0.012, 0.020, 0.04, 0.3, 0.6]
    rows = [(f"t{i}", p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "k string, p double")
    got = sorted(
        sidak_correction(df, ["k"], "p", alpha=0.05).collect(),
        key=lambda r: r["rank"],
    )
    m = len(ps)
    # replay step-down: rejections run until the first failure
    first_fail = next(
        (
            r
            for r, p in enumerate(sorted(ps), start=1)
            if p > 1 - (1 - 0.05) ** (1.0 / (m - r + 1))
        ),
        None,
    )
    for row in got:
        exp_adj = min(1.0, 1 - (1 - row["p_value"]) ** m)
        assert row["p_sidak"] == pytest.approx(exp_adj, abs=1e-10)
        if first_fail is None:
            assert row["reject"]
        else:
            assert row["reject"] == (row["rank"] < first_fail)


def test_sidak_rejects_bad_alpha(spark):
    from etl_java_spark.operators.experiments import sidak_correction

    df = spark.createDataFrame([("a", 0.5)], "k string, p double")
    with pytest.raises(ValueError):
        sidak_correction(df, ["k"], "p", alpha=1.5)


# ---------------------------------------------------------------------------
# wave 34: actuarial reserving (chain-ladder family)

_TRIANGLE = [
    # (origin, dev, incremental) — classic 3-origin toy triangle
    (1, 0, 100), (1, 1, 50), (1, 2, 25),
    (2, 0, 120), (2, 1, 60),
    (3, 0, 140),
]


def _cl_ref():
    cum = {}
    for i, j, inc in _TRIANGLE:
        prev = cum.get((i, j - 1), 0)
        cum[(i, j)] = prev + inc
    # factors: f0 from origins 1,2; f1 from origin 1
    f0 = (cum[(1, 1)] + cum[(2, 1)]) / (cum[(1, 0)] + cum[(2, 0)])
    f1 = cum[(1, 2)] / cum[(1, 1)]
    return cum, f0, f1


def test_chain_ladder_matches_hand_triangle(spark):
    from etl_java_spark.operators.actuarial import chain_ladder

    df = spark.createDataFrame(_TRIANGLE, "o long, d long, a long")
    got = {r["origin"]: r for r in chain_ladder(df, "o", "d", "a").collect()}
    cum, f0, f1 = _cl_ref()
    assert got[1]["cdf"] == pytest.approx(1.0, abs=1e-15)
    assert got[1]["ultimate"] == pytest.approx(cum[(1, 2)], abs=1e-9)
    assert got[2]["cdf"] == pytest.approx(f1, abs=1e-12)
    assert got[2]["ultimate"] == pytest.approx(
        cum[(2, 1)] * f1, abs=1e-9
    )
    assert got[3]["cdf"] == pytest.approx(f0 * f1, abs=1e-12)
    assert got[3]["ibnr"] == pytest.approx(
        cum[(3, 0)] * f0 * f1 - cum[(3, 0)], abs=1e-9
    )


def test_mack_sigma_matches_hand_triangle(spark):
    from etl_java_spark.operators.actuarial import mack_sigma

    df = spark.createDataFrame(_TRIANGLE, "o long, d long, a long")
    got = {r["j"]: r for r in mack_sigma(df, "o", "d", "a").collect()}
    cum, f0, f1 = _cl_ref()
    assert got[0]["factor"] == pytest.approx(f0, abs=1e-12)
    # sigma2 at dev 0 over two origins
    t = cum[(1, 0)] * (cum[(1, 1)] / cum[(1, 0)] - f0) ** 2 + cum[
        (2, 0)
    ] * (cum[(2, 1)] / cum[(2, 0)] - f0) ** 2
    assert got[0]["sigma2"] == pytest.approx(t / 1, abs=1e-6)
    # dev 1 has a single origin -> NULL volatility
    assert got[1]["sigma2"] is None


def test_bornhuetter_ferguson_blends_prior(spark):
    from etl_java_spark.operators.actuarial import bornhuetter_ferguson

    df = spark.createDataFrame(_TRIANGLE, "o long, d long, a long")
    expo = spark.createDataFrame(
        [(1, 200), (2, 220), (3, 250)], "origin long, exposure long"
    )
    got = {
        r["origin"]: r
        for r in bornhuetter_ferguson(
            df, "o", "d", "a", expo, expected_loss_ratio=0.9
        ).collect()
    }
    cum, f0, f1 = _cl_ref()
    cdf3 = f0 * f1
    bf3 = cum[(3, 0)] + 250 * 0.9 * (1 - 1 / cdf3)
    assert got[3]["bf_ultimate"] == pytest.approx(bf3, abs=1e-9)
    # mature origin: cdf = 1 -> BF ultimate = latest (prior ignored)
    assert got[1]["bf_ultimate"] == pytest.approx(
        cum[(1, 2)], abs=1e-9
    )
    with pytest.raises(ValueError):
        bornhuetter_ferguson(df, "o", "d", "a", expo, 0)


# ---------------------------------------------------------------------------
# wave 35: QC family (Dixon Q, OC curve, tolerance interval)


def test_dixon_q_flags_gap_outlier(spark):
    from etl_java_spark.operators.dq import dixon_q

    vals = [10, 11, 12, 13, 14, 40]  # 40 is a gap outlier
    rows = [("a", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = dixon_q(df, "g", "v").collect()[0]
    assert got["q_high"] == pytest.approx((40 - 14) / 30, abs=1e-12)
    assert got["q_low"] == pytest.approx(1 / 30, abs=1e-12)
    assert got["q_high"] > 0.56  # above the n=6 5% critical value


def test_dixon_q_constant_group_null(spark):
    from etl_java_spark.operators.dq import dixon_q

    df = spark.createDataFrame([("a", 5)] * 4, "g string, v long")
    got = dixon_q(df, "g", "v").collect()[0]
    assert got["q_high"] is None and got["q_low"] is None


def test_oc_curve_matches_binomial_cdf(spark):
    from math import comb

    from etl_java_spark.operators.dq import oc_curve

    # 6 defects in 120 -> p = 0.05; plan (50, 2)
    rows = [("s", 1)] * 6 + [("s", 0)] * 114
    df = spark.createDataFrame(rows, "g string, d int")
    got = oc_curve(df, "g", "d", sample_n=50, accept_c=2).collect()[0]
    p = 6 / 120
    ref = sum(
        comb(50, k) * p**k * (1 - p) ** (50 - k) for k in range(3)
    )
    assert got["p_hat"] == pytest.approx(p, abs=1e-15)
    assert got["p_accept"] == pytest.approx(ref, abs=1e-10)


def test_oc_curve_degenerate_rates(spark):
    from etl_java_spark.operators.dq import oc_curve

    rows = [("clean", 0)] * 10 + [("dirty", 1)] * 10
    df = spark.createDataFrame(rows, "g string, d int")
    got = {r["grp"]: r for r in oc_curve(df, "g", "d").collect()}
    assert got["clean"]["p_accept"] == 1.0
    assert got["dirty"]["p_accept"] == 0.0


def test_tolerance_interval_matches_wilks(spark):
    from math import comb

    from etl_java_spark.operators.dq import tolerance_interval

    vals = list(range(100, 130))  # n = 30 distinct values
    rows = [("a", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = tolerance_interval(
        df, "g", "v", r=2, coverage_pct=90
    ).collect()[0]
    assert got["tol_lo"] == 101  # x_(2)
    assert got["tol_hi"] == 128  # x_(29)
    n, g = 30, 0.9
    ref = sum(
        comb(n, k) * g**k * (1 - g) ** (n - k) for k in range(n - 4 + 1)
    )
    assert got["confidence"] == pytest.approx(ref, abs=1e-10)


def test_tolerance_interval_guards(spark):
    from etl_java_spark.operators.dq import tolerance_interval

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError):
        tolerance_interval(df, "g", "v", r=0)
    with pytest.raises(ValueError):
        tolerance_interval(df, "g", "v", coverage_pct=100)


# ---------------------------------------------------------------------------
# wave 36: IV/Wald, Oaxaca-Blinder, QTE


def test_iv_wald_recovers_planted_late(spark):
    from etl_java_spark.operators.experiments import iv_wald

    # z randomizes; compliance 100% among z=1, 0% among z=0;
    # y = 10 + 5*x deterministic -> LATE exactly 5
    rows = []
    for i in range(200):
        z = i % 2
        x = z
        y = 10 + 5 * x
        rows.append((z, x, y))
    df = spark.createDataFrame(rows, "z int, x long, y long")
    got = iv_wald(df, "z", "x", "y").collect()[0]
    assert got["first_stage_dx"] == pytest.approx(1.0, abs=1e-12)
    assert got["late_wald"] == pytest.approx(5.0, abs=1e-12)
    assert got["first_stage_f"] is None or got["first_stage_f"] > 1e3


def test_iv_wald_partial_compliance(spark):
    from etl_java_spark.operators.experiments import iv_wald

    # 50% compliance among z=1, none among z=0; effect 8 ->
    # dy = 4, dx = 0.5, LATE = 8
    rows = []
    for i in range(400):
        z = i % 2
        x = 1 if (z == 1 and i % 4 == 1) else 0
        y = 100 + 8 * x
        rows.append((z, x, y))
    df = spark.createDataFrame(rows, "z int, x long, y long")
    got = iv_wald(df, "z", "x", "y").collect()[0]
    assert got["first_stage_dx"] == pytest.approx(0.5, abs=1e-12)
    assert got["late_wald"] == pytest.approx(8.0, abs=1e-9)
    assert got["first_stage_f"] > 10


def test_oaxaca_identity_and_components(spark):
    from etl_java_spark.operators.experiments import oaxaca_blinder

    # group A: y = 10 + 3x; group B: y = 5 + 2x with different xbars
    rows_a = [("A", x, 10 + 3 * x) for x in (1, 2, 3, 4, 10)]
    rows_b = [("B", x, 5 + 2 * x) for x in (1, 1, 2, 2, 4)]
    df = spark.createDataFrame(rows_a + rows_b, "g string, x long, y long")
    got = oaxaca_blinder(df, "g", "A", "B", "x", "y").collect()[0]
    xa = sum(x for _, x, _ in rows_a) / 5
    xb = sum(x for _, x, _ in rows_b) / 5
    ya = sum(y for _, _, y in rows_a) / 5
    yb = sum(y for _, _, y in rows_b) / 5
    assert got["gap"] == pytest.approx(ya - yb, abs=1e-9)
    assert got["explained"] == pytest.approx((xa - xb) * 2.0, abs=1e-9)
    assert got["coefficient_effect"] == pytest.approx(
        xa * (3.0 - 2.0), abs=1e-9
    )
    assert got["intercept_effect"] == pytest.approx(5.0, abs=1e-9)
    # the decomposition identity
    assert got["gap"] == pytest.approx(
        got["explained"]
        + got["coefficient_effect"]
        + got["intercept_effect"],
        abs=1e-9,
    )


def test_qte_level_shift_constant_effect(spark):
    from etl_java_spark.operators.experiments import (
        quantile_treatment_effect,
    )

    ctrl = [10, 20, 30, 40, 50, 60, 70, 80]
    rows = [("c", v) for v in ctrl] + [("t", v + 15) for v in ctrl]
    df = spark.createDataFrame(rows, "g string, v long")
    out = quantile_treatment_effect(
        df, "g", "t", "c", "v", quantiles_pct=(25, 50, 75)
    ).collect()
    for r in out:
        assert r["qte"] == 15, r["pct"]


def test_qte_rejects_bad_pct(spark):
    from etl_java_spark.operators.experiments import (
        quantile_treatment_effect,
    )

    df = spark.createDataFrame([("t", 1), ("c", 2)], "g string, v long")
    with pytest.raises(ValueError):
        quantile_treatment_effect(df, "g", "t", "c", "v", (0,))


# ---------------------------------------------------------------------------
# wave 37: skill scores, superlative indexes, Brier skill


def test_forecast_skill_scores_known_confusion(spark):
    from etl_java_spark.operators.evaluation import forecast_skill_scores

    rows = (
        [("g", 1, 1)] * 30 + [("g", 1, 0)] * 10
        + [("g", 0, 1)] * 20 + [("g", 0, 0)] * 40
    )
    df = spark.createDataFrame(rows, "grp string, t int, f int")
    got = forecast_skill_scores(df, "grp", "t", "f").collect()[0]
    a, b, c, d = 30, 20, 10, 40
    n = 100
    hss = 2 * (a * d - b * c) / ((a + c) * (c + d) + (a + b) * (b + d))
    pss = (a * d - b * c) / ((a + c) * (b + d))
    ar = (a + b) * (a + c) / n
    ets = (a - ar) / (a + b + c - ar)
    assert got["heidke_hss"] == pytest.approx(hss, abs=1e-12)
    assert got["peirce_pss"] == pytest.approx(pss, abs=1e-12)
    assert got["gilbert_ets"] == pytest.approx(ets, abs=1e-12)


def test_skill_scores_never_flag_is_zero(spark):
    from etl_java_spark.operators.evaluation import forecast_skill_scores

    # never flags: a = b = 0 -> all three skills exactly 0
    rows = [("g", 1, 0)] * 5 + [("g", 0, 0)] * 95
    df = spark.createDataFrame(rows, "grp string, t int, f int")
    got = forecast_skill_scores(df, "grp", "t", "f").collect()[0]
    assert got["heidke_hss"] == 0.0
    assert got["peirce_pss"] == 0.0
    assert got["gilbert_ets"] == 0.0


def test_tornqvist_walsh_uniform_inflation(spark):
    from etl_java_spark.operators.relational import tornqvist_walsh_index

    # every price doubles, quantities move arbitrarily: both
    # superlative indexes must read exactly 2
    base = [(i, 100 + i, 10 + i) for i in range(1, 9)]
    curr = [(i, 2 * (100 + i), 17 - i) for i in range(1, 9)]
    b = spark.createDataFrame(base, "item long, p long, q long")
    c = spark.createDataFrame(curr, "item long, p long, q long")
    got = tornqvist_walsh_index(b, c, "item", "p", "q").collect()[0]
    assert got["n_items"] == 8
    assert got["tornqvist"] == pytest.approx(2.0, abs=1e-9)
    # walsh terms quantize at the 1e-6 grid -> ~1e-9 relative noise
    assert got["walsh"] == pytest.approx(2.0, abs=1e-8)


def test_tornqvist_matches_reference(spark):
    from etl_java_spark.operators.relational import tornqvist_walsh_index

    base = [(1, 100, 5), (2, 200, 3), (3, 50, 10)]
    curr = [(1, 110, 4), (2, 180, 5), (3, 75, 8)]
    b = spark.createDataFrame(base, "item long, p long, q long")
    c = spark.createDataFrame(curr, "item long, p long, q long")
    got = tornqvist_walsh_index(b, c, "item", "p", "q").collect()[0]
    e0 = sum(p * q for _, p, q in base)
    e1 = sum(p * q for _, p, q in curr)
    lt = 0.0
    wn = wd = 0.0
    for (i, p0, q0), (_, p1, q1) in zip(base, curr):
        s = (p0 * q0 / e0 + p1 * q1 / e1) / 2
        lt += round(s * math.log(p1 / p0), 12)
        wq = math.sqrt(q0 * q1)
        wn += round(p1 * wq, 6)
        wd += round(p0 * wq, 6)
    assert got["tornqvist"] == pytest.approx(math.exp(lt), abs=1e-10)
    assert got["walsh"] == pytest.approx(wn / wd, abs=1e-10)


def test_brier_skill_score_perfect_and_climatology(spark):
    from etl_java_spark.operators.evaluation import brier_skill_score

    # perfect forecaster: BSS = 1
    rows = [("p", 1.0, 1)] * 30 + [("p", 0.0, 0)] * 70
    # climatology forecaster (p = base rate 0.3): BSS = 0
    rows += [("c", 0.3, 1)] * 30 + [("c", 0.3, 0)] * 70
    df = spark.createDataFrame(rows, "grp string, p double, y int")
    got = {r["grp"]: r for r in brier_skill_score(df, "grp", "p", "y").collect()}
    assert got["p"]["brier_skill"] == pytest.approx(1.0, abs=1e-12)
    assert got["c"]["brier_skill"] == pytest.approx(0.0, abs=1e-9)


def test_brier_skill_degenerate_null(spark):
    from etl_java_spark.operators.evaluation import brier_skill_score

    rows = [("g", 0.4, 1)] * 5  # base rate 1 -> clim 0 -> NULL
    df = spark.createDataFrame(rows, "grp string, p double, y int")
    got = brier_skill_score(df, "grp", "p", "y").collect()[0]
    assert got["brier_skill"] is None
