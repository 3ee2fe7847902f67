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
