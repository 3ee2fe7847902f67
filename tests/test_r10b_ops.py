"""Round-10 second-leg operators vs pure-Python references.

Same discipline as test_r10_ops.py: each Spark operator is replayed by
a straight-line Python implementation of the documented algorithm on a
small in-memory fixture; integer outputs match exactly and double
outputs match to 1e-12 (the operators are fixed-double-tree by design).
"""

from __future__ import annotations

import math

import pytest


# ---------------------------------------------------------------------------
# spatial statistics


def _py_moran_geary(cells: dict[tuple[int, int], int]):
    n = len(cells)
    s = sum(cells.values())
    dev = {k: n * v - s for k, v in cells.items()}
    den = sum(d * d for d in dev.values())
    w = 0
    num_m = 0
    num_g = 0
    for (gx, gy), di in dev.items():
        for dx, dy in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            j = (gx + dx, gy + dy)
            if j in dev:
                dj = dev[j]
                w += 1
                num_m += di * dj
                num_g += (di - dj) * (di - dj)
    moran = n * float(num_m) / (w * float(den))
    geary = (n - 1.0) * float(num_g) / (2.0 * w * float(den))
    return n, w, moran, -1.0 / (n - 1.0), geary


def test_spatial_autocorrelation_matches_reference(spark):
    from etl_java_spark.operators.spatial import spatial_autocorrelation

    cells = {
        (0, 0): 10, (0, 1): 12, (0, 2): 11,
        (1, 0): 9, (1, 1) : 13, (1, 2): 40,
        (2, 0): 41, (2, 1): 39, (2, 2): 42,
    }
    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in cells.items()],
        "gx long, gy long, v long",
    )
    row = spatial_autocorrelation(df, "gx", "gy", "v").collect()[0]
    n, w, moran, exp_i, geary = _py_moran_geary(cells)
    assert row["n_cells"] == n and row["w_pairs"] == w
    assert row["moran_i"] == pytest.approx(moran, abs=1e-12)
    assert row["expected_i"] == pytest.approx(exp_i, abs=1e-12)
    assert row["geary_c"] == pytest.approx(geary, abs=1e-12)


def test_spatial_autocorrelation_checkerboard_dispersed(spark):
    """A perfect checkerboard is maximal dispersion: I < E[I], C > 1."""
    from etl_java_spark.operators.spatial import spatial_autocorrelation

    cells = {
        (gx, gy): (100 if (gx + gy) % 2 == 0 else 1)
        for gx in range(4)
        for gy in range(4)
    }
    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in cells.items()],
        "gx long, gy long, v long",
    )
    row = spatial_autocorrelation(df, "gx", "gy", "v").collect()[0]
    assert row["moran_i"] < row["expected_i"] < 0
    assert row["geary_c"] > 1.0


def _py_getis(cells: dict[tuple[int, int], int]):
    n = len(cells)
    s1 = sum(cells.values())
    s2 = sum(v * v for v in cells.values())
    xbar = s1 / n
    sd = math.sqrt(s2 / n - xbar * xbar)
    out = {}
    for (gx, gy), x in cells.items():
        neigh = [
            cells[(gx + dx, gy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (gx + dx, gy + dy) in cells
        ]
        wi = len(neigh)
        loc = sum(neigh)
        z = (loc - xbar * wi) / (
            sd * math.sqrt((n * wi - wi * wi) / (n - 1.0))
        )
        out[(gx, gy)] = (x, wi, loc, z)
    return out


def test_getis_hotspots_matches_reference(spark):
    from etl_java_spark.operators.spatial import getis_hotspots

    cells = {
        (gx, gy): ((gx * 7 + gy * 13) % 17) + (50 if gx == gy == 1 else 0)
        for gx in range(4)
        for gy in range(4)
    }
    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in cells.items()],
        "gx long, gy long, v long",
    )
    got = {
        (r["gx"], r["gy"]): (r["x"], r["w_i"], r["local_sum"], r["z"])
        for r in getis_hotspots(df, "gx", "gy", "v").collect()
    }
    ref = _py_getis(cells)
    assert set(got) == set(ref)
    for k, (x, wi, loc, z) in ref.items():
        gx_, gwi, gloc, gz = got[k]
        assert (gx_, gwi, gloc) == (x, wi, loc)
        assert gz == pytest.approx(z, abs=1e-12)
    # the hottest cell's 3x3 neighborhood contains the planted spike
    hot = max(ref, key=lambda k: ref[k][3])
    assert abs(hot[0] - 1) <= 1 and abs(hot[1] - 1) <= 1


def test_nearest_neighbor_join_matches_reference(spark):
    from etl_java_spark.operators.spatial import nearest_neighbor_join

    pts = [(i, (i * 37) % 100, (i * 61) % 100) for i in range(1, 41)]
    fac = [(j, (j * 53) % 100, (j * 29) % 100) for j in range(1, 8)]
    pdf = spark.createDataFrame(pts, "pid long, px long, py long")
    fdf = spark.createDataFrame(fac, "fid long, fx long, fy long")
    got = {
        r["pid"]: (r["fid"], r["dist2"])
        for r in nearest_neighbor_join(
            pdf, fdf, "pid", "px", "py", "fid", "fx", "fy", cell=25
        ).collect()
    }
    for pid, px, py in pts:
        mcx, mcy = px // 25, py // 25
        cand = [
            (
                (px - fx) * (px - fx) + (py - fy) * (py - fy),
                fid,
            )
            for fid, fx, fy in fac
            if abs(fx // 25 - mcx) <= 1 and abs(fy // 25 - mcy) <= 1
        ]
        if not cand:
            assert pid not in got
            continue
        d2, fid = min(cand)
        assert got[pid] == (fid, d2)


def test_nearest_neighbor_join_tiebreak_smallest_fid(spark):
    from etl_java_spark.operators.spatial import nearest_neighbor_join

    pdf = spark.createDataFrame([(1, 10, 10)], "pid long, px long, py long")
    fdf = spark.createDataFrame(
        [(9, 10, 12), (3, 10, 8), (7, 12, 10)],
        "fid long, fx long, fy long",
    )
    row = nearest_neighbor_join(
        pdf, fdf, "pid", "px", "py", "fid", "fx", "fy", cell=25
    ).collect()[0]
    assert (row["fid"], row["dist2"]) == (3, 4)


# ---------------------------------------------------------------------------
# market-data analytics


def test_ohlc_bars_matches_reference(spark):
    from etl_java_spark.operators.timeseries import ohlc_bars

    trades = [
        # (bar, okey, lnum, price, qty)
        (1, 10, 1, 500, 3), (1, 10, 2, 700, 1), (1, 2, 1, 650, 2),
        (2, 11, 1, 400, 5), (2, 11, 2, 900, 1),
        (3, 12, 1, 800, 4),
    ]
    df = spark.createDataFrame(
        trades, "bar long, okey long, lnum long, p long, q long"
    )
    got = {
        r["bar"]: (
            r["open_c"], r["high_c"], r["low_c"], r["close_c"],
            r["volume_q"], r["n_trades"], r["vwap_c"],
        )
        for r in ohlc_bars(df, "bar", ["okey", "lnum"], "p", "q").collect()
    }
    by_bar: dict[int, list] = {}
    for bar, okey, lnum, p, q in trades:
        by_bar.setdefault(bar, []).append((okey, lnum, p, q))
    for bar, rows in by_bar.items():
        rows.sort()
        o, c = rows[0][2], rows[-1][2]
        hi = max(r[2] for r in rows)
        lo = min(r[2] for r in rows)
        vol = sum(r[3] for r in rows)
        pv = sum(r[2] * r[3] for r in rows)
        exp = (o, hi, lo, c, vol, len(rows), pv / vol)
        assert got[bar][:6] == exp[:6]
        assert got[bar][6] == pytest.approx(exp[6], abs=1e-12)


def test_max_drawdown_matches_reference(spark):
    from etl_java_spark.operators.timeseries import max_drawdown

    flows = [(t, v) for t, v in enumerate(
        [5, 3, -4, -2, 6, -7, -1, 8, 2, -3], start=1
    )]
    df = spark.createDataFrame(flows, "t long, v long")
    row = max_drawdown(df, "t", "v").collect()[0]
    eq = peak = 0
    best = (-1, None, None)  # (dd, trough_t, peak_at_trough)
    curve = []
    for t, v in flows:
        eq += v
        peak = max(peak if curve else eq, eq)
        curve.append(eq)
        dd = peak - eq
        if dd > best[0]:
            best = (dd, t, peak)
    assert row["n_periods"] == len(flows)
    assert row["final_equity_c"] == curve[-1]
    assert row["peak_equity_c"] == max(curve)
    assert row["max_drawdown_c"] == best[0]
    assert row["trough_t"] == best[1]
    assert row["peak_at_trough_c"] == best[2]
    assert row["drawdown_frac"] == pytest.approx(
        best[0] / best[2], abs=1e-12
    )


def test_max_drawdown_trough_is_earliest(spark):
    from etl_java_spark.operators.timeseries import max_drawdown

    # two troughs with the same drawdown (3): t=3 and t=5 -> report t=3
    df = spark.createDataFrame(
        [(1, 5), (2, -3), (3, 0), (4, 3), (5, -3)], "t long, v long"
    )
    row = max_drawdown(df, "t", "v").collect()[0]
    assert row["max_drawdown_c"] == 3
    assert row["trough_t"] == 2  # eq dips to 2 at t=2 and stays: dd=3 first at t=2
    assert row["peak_at_trough_c"] == 5


def test_rolling_band_breaches_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.timeseries import rolling_band_breaches

    vals = [10, 11, 9, 10, 12, 10, 11, 30, 10, 9, 11, 10, 1, 10]
    rows = [(t, v) for t, v in enumerate(vals, start=1)]
    df = spark.createDataFrame(rows, "t long, v long")
    got = {
        r["t"]: (r["v"], r["mid"], r["lower"], r["upper"], r["pct_b"],
                 r["direction"])
        for r in rolling_band_breaches(
            df, "t", "v", window=3, k_sigma=2.0
        ).collect()
    }
    exp = {}
    for i in range(2, len(vals)):
        w = vals[i - 2 : i + 1]
        ws, ss = sum(w), sum(x * x for x in w)
        mid = ws / 3.0
        sd = m.sqrt(3.0 * ss - ws * ws) / 3.0
        lo, hi = mid - 2.0 * sd, mid + 2.0 * sd
        v = float(vals[i])
        if v > hi or v < lo:
            exp[i + 1] = (
                vals[i], mid, lo, hi, (v - lo) / (hi - lo),
                1 if v > hi else -1,
            )
    assert set(got) == set(exp)
    for t, e in exp.items():
        g = got[t]
        assert g[0] == e[0] and g[5] == e[5]
        for a, b in zip(g[1:5], e[1:5]):
            assert a == pytest.approx(b, abs=1e-12)


# ---------------------------------------------------------------------------
# regression / distribution diagnostics


def test_jarque_bera_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.dq import jarque_bera

    vals = {"a": [1, 2, 2, 3, 3, 3, 4, 4, 5, 9],
            "b": [10, 10, 11, 12, 30, 30, 31, 32]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["grp"]: (r["n"], r["skewness"], r["kurtosis_excess"], r["jb"],
                   r["p_value"])
        for r in jarque_bera(df, "g", "v").collect()
    }
    for g, vs in vals.items():
        n = len(vs)
        mean = sum(vs) / n
        m2 = sum(v * v for v in vs) / n - mean * mean
        m3 = (sum(v ** 3 for v in vs) / n - 3 * mean * sum(v * v for v in vs) / n
              + 2 * mean ** 3)
        m4 = (sum(v ** 4 for v in vs) / n - 4 * mean * sum(v ** 3 for v in vs) / n
              + 6 * mean * mean * sum(v * v for v in vs) / n - 3 * mean ** 4)
        sk = m3 / m2 ** 1.5
        ku = m4 / (m2 * m2) - 3.0
        jb = n * (sk * sk / 6.0 + ku * ku / 24.0)
        p = m.exp(-jb / 2.0)
        gn, gsk, gku, gjb, gp = got[g]
        assert gn == n
        assert gsk == pytest.approx(sk, abs=1e-12)
        assert gku == pytest.approx(ku, abs=1e-12)
        assert gjb == pytest.approx(jb, rel=1e-12)
        assert gp == pytest.approx(p, rel=1e-12)


def _py_ols2_sse(rows):
    """SSE of y ~ b0 + b1 x1 + b2 x2 via the normal equations."""
    n = len(rows)
    s1 = sum(r[0] for r in rows); s2 = sum(r[1] for r in rows)
    sy = sum(r[2] for r in rows)
    s11 = sum(r[0] * r[0] for r in rows); s12 = sum(r[0] * r[1] for r in rows)
    s22 = sum(r[1] * r[1] for r in rows)
    s1y = sum(r[0] * r[2] for r in rows); s2y = sum(r[1] * r[2] for r in rows)
    syy = sum(r[2] * r[2] for r in rows)
    det = (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    det0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y))
    det1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2))
    det2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2))
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    return n, syy - b0 * sy - b1 * s1y - b2 * s2y


def test_goldfeld_quandt_matches_reference(spark):
    from etl_java_spark.operators.evaluation import goldfeld_quandt

    # low regime (sp<=2): tight residuals; high (sp>=5): noisy
    data = []
    for i in range(1, 13):
        sp = 1 + (i % 2)
        x1, x2 = sp, i % 4 + 1
        y = 10 + 2 * x1 + 3 * x2 + (i % 3 - 1)  # small noise
        data.append((sp, x1, x2, y))
    for i in range(1, 13):
        sp = 5 + (i % 3)
        x1, x2 = sp, i % 5 + 1
        y = 10 + 2 * x1 + 3 * x2 + 7 * ((i * 3) % 7 - 3)  # big noise
        data.append((sp, x1, x2, y))
    df = spark.createDataFrame(data, "sp long, x1 long, x2 long, y long")
    row = goldfeld_quandt(
        df, "y", "x1", "x2", split_col="sp", low_max=2, high_min=5
    ).collect()[0]
    lo = [(x1, x2, y) for sp, x1, x2, y in data if sp <= 2]
    hi = [(x1, x2, y) for sp, x1, x2, y in data if sp >= 5]
    nl, sse_l = _py_ols2_sse(lo)
    nh, sse_h = _py_ols2_sse(hi)
    assert (row["n_low"], row["n_high"]) == (nl, nh)
    assert row["sse_low"] == pytest.approx(sse_l, rel=1e-9)
    assert row["sse_high"] == pytest.approx(sse_h, rel=1e-9)
    gq = (sse_h / (nh - 3.0)) / (sse_l / (nl - 3.0))
    assert row["gq_ratio"] == pytest.approx(gq, rel=1e-9)
    assert row["gq_ratio"] > 1.0  # planted: high regime noisier


def test_cooks_distance_matches_reference(spark):
    from etl_java_spark.operators.evaluation import cooks_distance

    pts = [(i, i % 5 + 1, 3 * (i % 5 + 1) + (i % 7) - 3 + (20 if i == 13 else 0))
           for i in range(1, 31)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = cooks_distance(df, "id", "x", "y", top_k=5).collect()
    n = len(pts)
    sx = sum(p[1] for p in pts); sy = sum(p[2] for p in pts)
    sxx = sum(p[1] ** 2 for p in pts); sxy = sum(p[1] * p[2] for p in pts)
    syy = sum(p[2] ** 2 for p in pts)
    b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    b0 = (sy - b1 * sx) / n
    s2 = (syy - b0 * sy - b1 * sxy) / (n - 2.0)
    sxx_c = sxx - sx * sx / n
    scored = []
    for i, x, y in pts:
        e = y - b0 - b1 * x
        h = 1.0 / n + (x - sx / n) ** 2 / sxx_c
        cd = e * e * h / (2.0 * s2 * (1 - h) * (1 - h))
        scored.append((cd, i, x, y, e, h))
    scored.sort(key=lambda t: (-t[0], t[1]))
    for r, (cd, i, x, y, e, h) in zip(got, scored[:5]):
        assert r["id"] == i
        assert r["cooks_d"] == pytest.approx(cd, rel=1e-12)
        assert r["resid"] == pytest.approx(e, rel=1e-9)
        assert r["leverage"] == pytest.approx(h, rel=1e-12)
    # the planted outlier (id=13) is the most influential row
    assert got[0]["id"] == 13


# ---------------------------------------------------------------------------
# categorical association + frequency-moment sketch


def test_gk_lambda_matches_reference(spark):
    from etl_java_spark.operators.assoc import gk_lambda

    rows = [("a", "p")] * 8 + [("a", "q")] * 2 + [("b", "q")] * 6 + \
           [("b", "p")] * 1 + [("c", "r")] * 5 + [("c", "p")] * 3
    df = spark.createDataFrame(rows, "x string, y string")
    r = gk_lambda(df, "x", "y").collect()[0]
    from collections import Counter
    cells = Counter(rows)
    n = len(rows)
    xs = {x for x, _ in cells}
    ys = {y for _, y in cells}
    srm = sum(max(cells.get((x, y), 0) for y in ys) for x in xs)
    scm = sum(max(cells.get((x, y), 0) for x in xs) for y in ys)
    mrt = max(sum(c for (x, _), c in cells.items() if x == x0) for x0 in xs)
    mct = max(sum(c for (_, y), c in cells.items() if y == y0) for y0 in ys)
    assert (r["n"], r["sum_rowmax"], r["sum_colmax"]) == (n, srm, scm)
    assert (r["max_row_total"], r["max_col_total"]) == (mrt, mct)
    assert r["lambda_y_given_x"] == pytest.approx(
        (srm - mct) / (n - mct), abs=1e-12
    )
    assert r["lambda_x_given_y"] == pytest.approx(
        (scm - mrt) / (n - mrt), abs=1e-12
    )
    assert r["lambda_sym"] == pytest.approx(
        (srm + scm - mrt - mct) / (2.0 * n - mrt - mct), abs=1e-12
    )


def test_gk_lambda_perfect_and_null_association(spark):
    from etl_java_spark.operators.assoc import gk_lambda

    # X determines Y -> lambda(Y|X) = 1
    det = [("a", "p")] * 5 + [("b", "q")] * 5
    r = gk_lambda(
        spark.createDataFrame(det, "x string, y string"), "x", "y"
    ).collect()[0]
    assert r["lambda_y_given_x"] == pytest.approx(1.0, abs=1e-12)
    # identical conditional distributions -> lambda = 0
    null = [("a", "p")] * 6 + [("a", "q")] * 2 + \
           [("b", "p")] * 3 + [("b", "q")] * 1
    r = gk_lambda(
        spark.createDataFrame(null, "x string, y string"), "x", "y"
    ).collect()[0]
    assert r["lambda_y_given_x"] == pytest.approx(0.0, abs=1e-12)


def test_theils_u_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.assoc import theils_u

    rows = [("a", "p")] * 8 + [("a", "q")] * 2 + [("b", "q")] * 6 + \
           [("b", "p")] * 4 + [("c", "q")] * 5
    df = spark.createDataFrame(rows, "x string, y string")
    r = theils_u(df, "x", "y").collect()[0]
    from collections import Counter
    cxy = Counter(rows)
    cx = Counter(x for x, _ in rows)
    cy = Counter(y for _, y in rows)
    n = len(rows)

    # r12 determinism contract: the ln factor quantizes to the 1e-9
    # decimal grid before the exact c-weighted sum (the q434 lesson)
    from decimal import ROUND_HALF_UP, Decimal

    def qln(c):
        return float(
            Decimal(c)
            * Decimal(m.log(c)).quantize(Decimal("1e-9"), ROUND_HALF_UP)
        )

    hy = m.log(n) - sum(qln(c) for c in cy.values()) / n
    hcond = (
        sum(qln(c) for c in cx.values())
        - sum(qln(c) for c in cxy.values())
    ) / n
    ln2 = m.log(2.0)
    assert r["n"] == n and r["n_cells"] == len(cxy)
    assert r["h_y_bits"] == pytest.approx(hy / ln2, abs=1e-12)
    assert r["h_y_given_x_bits"] == pytest.approx(hcond / ln2, abs=1e-12)
    assert r["theil_u"] == pytest.approx(
        (hy - hcond) / hy, abs=1e-12
    )


def test_theils_u_determined_is_one(spark):
    from etl_java_spark.operators.assoc import theils_u

    det = [("a", "p")] * 5 + [("b", "q")] * 3 + [("c", "r")] * 2
    r = theils_u(
        spark.createDataFrame(det, "x string, y string"), "x", "y"
    ).collect()[0]
    assert r["theil_u"] == pytest.approx(1.0, abs=1e-12)
    assert r["h_y_given_x_bits"] == pytest.approx(0.0, abs=1e-12)


def test_ams_f2_matches_reference(spark):
    import hashlib
    from etl_java_spark.operators.sketch import ams_f2

    keys = [i % 7 + 1 for i in range(50)] + [3] * 30  # skewed
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    r = ams_f2(df, "k", n_estimators=16, seed_base=100).collect()[0]
    from collections import Counter
    c = Counter(keys)
    f2 = sum(v * v for v in c.values())

    def sign(row, k):
        h = int(hashlib.md5(f"{row}:{k}".encode()).hexdigest()[:12], 16)
        return 1 - 2 * (h % 2)

    zz = 0
    for rr in range(100, 116):
        z = sum(sign(rr, k) * v for k, v in c.items())
        zz += z * z
    est = zz / 16.0
    assert r["n_keys"] == len(c)
    assert r["f2_exact"] == f2
    assert r["f2_est"] == pytest.approx(est, rel=1e-12)
    assert r["rel_err"] == pytest.approx((est - f2) / f2, abs=1e-12)


# ---------------------------------------------------------------------------
# competing risks, block jackknife, quality funnel


def test_aalen_johansen_matches_reference(spark):
    from etl_java_spark.operators.timeseries import aalen_johansen

    # (duration, event): 0 censored, 1 cause-1, 2 cause-2
    data = [(2, 1), (2, 2), (3, 0), (4, 1), (4, 1), (5, 2), (6, 0),
            (7, 1), (8, 0), (8, 2)]
    df = spark.createDataFrame(data, "dur long, ev int")
    got = {
        r["t"]: (r["n_risk"], r["d_cause1"], r["d_cause2"],
                 r["n_censored"], r["survival"], r["cif_1"], r["cif_2"])
        for r in aalen_johansen(df, "dur", "ev").collect()
    }
    from collections import Counter
    per = {}
    for t, e in data:
        d1, d2, c = per.get(t, (0, 0, 0))
        per[t] = (d1 + (e == 1), d2 + (e == 2), c + (e == 0))
    times = sorted(per)
    s, c1, c2 = 1.0, 0.0, 0.0
    exp = {}
    for t in times:
        d1, d2, c = per[t]
        n = sum(dd1 + dd2 + cc for tt, (dd1, dd2, cc) in per.items()
                if tt >= t)
        if d1 + d2 > 0:
            c1 = c1 + s * (d1 / n)
            c2 = c2 + s * (d2 / n)
            s = s * (1.0 - (d1 + d2) / n)
            exp[t] = (n, d1, d2, c, s, c1, c2)
    assert set(got) == set(exp)
    for t, e in exp.items():
        g = got[t]
        assert g[:4] == e[:4]
        for a, b in zip(g[4:], e[4:]):
            assert a == pytest.approx(b, abs=1e-12)
    # mass conservation at the last event time
    last = max(exp)
    s, c1, c2 = exp[last][4], exp[last][5], exp[last][6]
    assert s + c1 + c2 == pytest.approx(1.0, abs=1e-12)


def test_jackknife_ratio_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.experiments import jackknife_ratio

    rows = [(g, 10 * g + (g % 3), 2 + (g % 2)) for g in range(1, 9)]
    df = spark.createDataFrame(rows, "g long, y long, x long")
    r = jackknife_ratio(df, "g", "y", "x").collect()[0]
    sy = sum(y for _, y, _ in rows)
    sx = sum(x for _, _, x in rows)
    n = len(rows)
    reps = [(sy - y) / (sx - x) for _, y, x in rows]
    rf = sy / sx
    mean = sum(reps) / n
    rj = n * rf - (n - 1) * mean
    bias = (n - 1) * (mean - rf)
    se = m.sqrt((n - 1) / n * sum((x - mean) ** 2 for x in reps))
    assert r["n_blocks"] == n
    assert r["ratio_full"] == pytest.approx(rf, abs=1e-12)
    assert r["ratio_jack"] == pytest.approx(rj, abs=1e-12)
    assert r["bias_est"] == pytest.approx(bias, abs=1e-12)
    assert r["se_jack"] == pytest.approx(se, abs=1e-12)


def test_quality_rule_funnel_matches_reference(spark):
    from etl_java_spark.operators.corpus import quality_rule_funnel

    docs = [
        # passes everything
        ("the quick brown fox jumps over the lazy dog and it runs to "
         "this big field with many other animals that are very happy",),
        # too short -> dies at rule 1
        ("tiny text here",),
        # no stopwords -> dies at rule 4
        ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "mu nu xi omicron rho sigma tau upsilon phi chi psi omega",),
        # heavy repetition -> dies at rule 6
        ("spam " * 60 + "the of to in is are was for on with",),
    ]
    df = spark.createDataFrame(docs, "text string")
    rows = {r["rule"]: (r["n_in"], r["n_fail"], r["n_out"])
            for r in quality_rule_funnel(df, "text").collect()}
    assert rows["word_count"] == (4, 1, 3)
    assert rows["stopword_floor"][1] == 1  # the no-stopword doc dies here
    assert rows["distinct_fraction"][1] == 1  # the spam doc dies here
    # funnel consistency: n_out of rule k == n_in of rule k+1
    order = ["word_count", "mean_word_len", "symbol_ratio",
             "stopword_floor", "alpha_fraction", "distinct_fraction"]
    for a, b in zip(order, order[1:]):
        assert rows[a][2] == rows[b][0]
    assert rows["distinct_fraction"][2] == 1  # only the good doc survives


# ---------------------------------------------------------------------------
# forecasting


def test_holt_winters_additive_matches_reference(spark):
    from etl_java_spark.operators.timeseries import holt_winters_additive

    m = 3
    vals = [10, 20, 30, 14, 25, 37, 18, 30, 44, 23, 36, 52]
    rows = [(t, v) for t, v in enumerate(vals, start=1)]
    df = spark.createDataFrame(rows, "b long, v long")
    got = {
        r["h"]: (r["level"], r["trend"], r["forecast"])
        for r in holt_winters_additive(
            df, "b", "v", period=m, horizon=m, scale=1
        ).collect()
    }
    mean1 = sum(vals[:m]) / m
    mean2 = sum(vals[m : 2 * m]) / m
    l, b = mean1, (mean2 - mean1) / m
    s = [None] * m
    for t, x in enumerate(vals):
        idx = t % m
        if t < m:
            s[idx] = x - l
        else:
            s_old = s[idx]
            l_new = (x - s_old) * 0.5 + (l + b) * 0.5
            b = (l_new - l) * 0.25 + b * 0.75
            s[idx] = (x - l_new) * 0.5 + s_old * 0.5
            l = l_new
    n = len(vals)
    for h in range(1, m + 1):
        fc = l + h * b + s[(n + h - 1) % m]
        gl, gb, gf = got[h]
        assert gl == pytest.approx(l, abs=1e-12)
        assert gb == pytest.approx(b, abs=1e-12)
        assert gf == pytest.approx(fc, abs=1e-12)
    # seasonal register learned the planted weekly shape: the forecast
    # for the high phase exceeds the low phase
    assert got[3][2] > got[1][2]


def test_croston_matches_reference(spark):
    from etl_java_spark.operators.timeseries import croston_forecast

    # demands at periods 2, 5, 6, 10 in a 12-period window
    rows = [(2, 4), (5, 6), (6, 2), (10, 8), (3, 0), (7, 0), (12, 0)]
    df = spark.createDataFrame(rows, "t long, q long")
    r = croston_forecast(df, "t", "q").collect()[0]
    z, p, last = 4.0, 2.0, 2
    for t, q in [(5, 6), (6, 2), (10, 8)]:
        z = q * 0.5 + z * 0.5
        p = (t - last) * 0.5 + p * 0.5
        last = t
    assert r["n_periods"] == 7 and r["n_demands"] == 4
    assert r["size_ewma"] == pytest.approx(z, abs=1e-12)
    assert r["interval_ewma"] == pytest.approx(p, abs=1e-12)
    assert r["demand_rate"] == pytest.approx(z / p, abs=1e-12)


def test_theta_matches_reference(spark):
    from etl_java_spark.operators.timeseries import theta_forecast

    vals = [12, 15, 13, 18, 20, 19, 24, 26]
    rows = [(t, v) for t, v in enumerate(vals, start=1)]
    df = spark.createDataFrame(rows, "b long, v long")
    got = {
        r["h"]: (r["trend_part"], r["ses_level"], r["forecast"])
        for r in theta_forecast(df, "b", "v", horizon=3).collect()
    }
    n = len(vals)
    st = sum(range(1, n + 1)); sy = sum(vals)
    stt = sum(t * t for t in range(1, n + 1))
    sty = sum(t * v for t, v in rows)
    b1 = (n * sty - st * sy) / (n * stt - st * st)
    a0 = (sy - b1 * st) / n
    d = [2.0 * v - (a0 + b1 * t) for t, v in rows]
    ses = d[0]
    for x in d[1:]:
        ses = x * 0.5 + ses * 0.5
    for h in range(1, 4):
        tp = a0 + b1 * (n + h)
        g = got[h]
        assert g[0] == pytest.approx(tp, abs=1e-12)
        assert g[1] == pytest.approx(ses, abs=1e-12)
        assert g[2] == pytest.approx(0.5 * tp + 0.5 * ses, abs=1e-12)


def test_read_binary_files_roundtrip(spark, tmp_path):
    from etl_java_spark.operators.multimodal import read_binary_files

    p = tmp_path / "media"
    p.mkdir()
    (p / "a.bin").write_bytes(b"\x00\x01\x02payload")
    (p / "b.txt").write_bytes(b"nope")
    rows = read_binary_files(spark, str(p), glob="*.bin").collect()
    assert len(rows) == 1
    assert rows[0]["content"] == b"\x00\x01\x02payload"
    assert rows[0]["path"].endswith("a.bin")
    assert rows[0]["length"] == 10


# ---------------------------------------------------------------------------
# Katz, Kuiper, Ansari-Bradley


def test_katz_centrality_matches_reference(spark):
    from etl_java_spark.operators.graph import katz_centrality

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["katz"]
        for r in katz_centrality(df, iterations=3, alpha=0.1).collect()
    }
    nodes = {n for e in edges for n in e}
    x = {n: 1.0 for n in nodes}
    for _ in range(3):
        s = {n: 0.0 for n in nodes}
        for u, v in edges:
            s[v] += x[u]
        x = {n: 1.0 + 0.1 * s[n] for n in nodes}
    assert set(got) == nodes
    for n in nodes:
        assert got[n] == pytest.approx(x[n], abs=1e-9)
    # node 3 has the most in-walks -> highest katz
    assert max(got, key=got.get) == 3


def test_kuiper_matches_reference(spark):
    from etl_java_spark.operators.experiments import kuiper_test

    a = [1, 2, 2, 3, 5, 8, 9]        # low-shifted
    b = [2, 4, 5, 6, 6, 7, 9, 10]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kuiper_test(df, "g", "v", "a", "b").collect()[0]
    vals = sorted(set(a + b))
    dp = max(
        sum(x <= t for x in a) / len(a) - sum(x <= t for x in b) / len(b)
        for t in vals
    )
    dm = max(
        sum(x <= t for x in b) / len(b) - sum(x <= t for x in a) / len(a)
        for t in vals
    )
    dp, dm = max(dp, 0.0), max(dm, 0.0)
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert r["d_plus"] == pytest.approx(dp, abs=1e-12)
    assert r["d_minus"] == pytest.approx(dm, abs=1e-12)
    assert r["kuiper_v"] == pytest.approx(dp + dm, abs=1e-12)


def test_ansari_bradley_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.experiments import ansari_bradley

    a = [5, 6, 7, 8, 9]              # tight around 7
    b = [1, 3, 7, 11, 13, 7]         # spread around 7
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    r = ansari_bradley(df, "g", "v", "a", "b").collect()[0]
    pooled = sorted(a + b)
    n = len(pooled)
    # midranks with ties
    from collections import Counter
    cnt = Counter(pooled)
    vals = sorted(cnt)
    rank = {}
    c = 0
    for v in vals:
        t = cnt[v]
        rank[v] = c + (t + 1) / 2
        c += t
    score = {v: min(rank[v], n + 1 - rank[v]) for v in vals}
    ab = sum(score[v] for v in a)
    sa = sum(score[v] * cnt[v] for v in vals)
    sasq = sum(score[v] ** 2 * cnt[v] for v in vals)
    m_, n_ = len(a), len(b)
    e = m_ / n * sa
    var = m_ * n_ * (n * sasq - sa * sa) / (n * n * (n - 1))
    z = (ab - e) / m.sqrt(var)
    assert (r["n_a"], r["n_b"]) == (m_, n_)
    assert r["ab_stat"] == pytest.approx(ab, abs=1e-12)
    assert r["z"] == pytest.approx(z, abs=1e-12)
    # tight sample scores high -> positive z (A less dispersed)
    assert r["z"] > 0


# ---------------------------------------------------------------------------
# predictive causality, randomness, structural break


def test_granger_1lag_matches_reference(spark):
    from etl_java_spark.operators.timeseries import granger_1lag

    ys = [10, 12, 11, 15, 14, 18, 17, 21, 20, 24]
    xs = [1, 5, 2, 6, 3, 7, 4, 8, 5, 9]
    rows = [(t, y, x) for t, (y, x) in enumerate(zip(ys, xs), start=1)]
    df = spark.createDataFrame(rows, "t long, y long, x long")
    r = granger_1lag(df, "t", "y", "x").collect()[0]
    trip = [(ys[i], ys[i - 1], xs[i - 1]) for i in range(1, len(ys))]
    n = len(trip)
    s1 = sum(t[1] for t in trip); s2 = sum(t[2] for t in trip)
    sy = sum(t[0] for t in trip)
    s11 = sum(t[1] ** 2 for t in trip); s12 = sum(t[1] * t[2] for t in trip)
    s22 = sum(t[2] ** 2 for t in trip)
    s1y = sum(t[1] * t[0] for t in trip); s2y = sum(t[2] * t[0] for t in trip)
    syy = sum(t[0] ** 2 for t in trip)
    br = (n * s1y - s1 * sy) / (n * s11 - s1 * s1)
    ar = (sy - br * s1) / n
    sse_r = syy - ar * sy - br * s1y
    det = (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    det0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y))
    det1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2))
    det2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2))
    sse_u = (syy - (det0 / det) * sy - (det1 / det) * s1y
             - (det2 / det) * s2y)
    f = (sse_r - sse_u) / (sse_u / (n - 3.0))
    assert r["n_rows"] == n
    assert r["sse_r"] == pytest.approx(sse_r, rel=1e-9)
    assert r["sse_u"] == pytest.approx(sse_u, rel=1e-9)
    assert r["f_stat"] == pytest.approx(f, rel=1e-9)
    # planted: x alternates with next-day y jumps -> x1 helps
    assert r["sse_u"] < r["sse_r"]


def test_turning_points_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.timeseries import turning_points_test

    vals = [3, 7, 4, 4, 9, 2, 5, 5, 8, 1, 6]
    rows = [(t, v) for t, v in enumerate(vals, start=1)]
    df = spark.createDataFrame(rows, "t long, v long")
    r = turning_points_test(df, "t", "v").collect()[0]
    turns = sum(
        1
        for i in range(1, len(vals) - 1)
        if (vals[i] > vals[i - 1] and vals[i] > vals[i + 1])
        or (vals[i] < vals[i - 1] and vals[i] < vals[i + 1])
    )
    n = len(vals)
    e = 2.0 * (n - 2) / 3.0
    z = (turns - e) / m.sqrt((16.0 * n - 29.0) / 90.0)
    assert (r["n_obs"], r["n_turning"]) == (n, turns)
    assert r["expected"] == pytest.approx(e, abs=1e-12)
    assert r["z"] == pytest.approx(z, abs=1e-12)
    # ties (4,4) and (5,5) are NOT extrema — pinned by construction:
    assert turns == 5


def test_chow_matches_reference(spark):
    from etl_java_spark.operators.timeseries import chow_test
    from pyspark.sql import functions as SF

    # regime 1: y = 2x1 + x2; regime 2: y = 5x1 - x2 (+noise)
    data = []
    for i in range(1, 16):
        x1, x2 = i % 4 + 1, (i * 3) % 5 + 1
        data.append((0, x1, x2, 2 * x1 + x2 + (i % 3)))
    for i in range(1, 16):
        x1, x2 = i % 5 + 1, (i * 7) % 4 + 1
        data.append((1, x1, x2, 5 * x1 - x2 + ((i * 2) % 3)))
    df = spark.createDataFrame(data, "reg long, x1 long, x2 long, y long")
    r = chow_test(
        df, "y", "x1", "x2", split_cond=SF.col("reg") == 0, scale=0
    ).collect()[0]

    def sse(rows):
        n = len(rows)
        s1 = sum(r[0] for r in rows); s2 = sum(r[1] for r in rows)
        sy = sum(r[2] for r in rows)
        s11 = sum(r[0] * r[0] for r in rows)
        s12 = sum(r[0] * r[1] for r in rows)
        s22 = sum(r[1] * r[1] for r in rows)
        s1y = sum(r[0] * r[2] for r in rows)
        s2y = sum(r[1] * r[2] for r in rows)
        syy = sum(r[2] * r[2] for r in rows)
        det = (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2))
        det0 = (sy * (s11 * s22 - s12 * s12)
                - s1 * (s1y * s22 - s12 * s2y)
                + s2 * (s1y * s12 - s11 * s2y))
        det1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s2y - s1y * s2))
        det2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
                + sy * (s1 * s12 - s11 * s2))
        return (syy - (det0 / det) * sy - (det1 / det) * s1y
                - (det2 / det) * s2y)

    r1 = [(x1, x2, y) for g, x1, x2, y in data if g == 0]
    r2 = [(x1, x2, y) for g, x1, x2, y in data if g == 1]
    sse_1, sse_2 = sse(r1), sse(r2)
    sse_p = sse([(x1, x2, y) for _, x1, x2, y in data])
    n = len(data)
    f = ((sse_p - sse_1 - sse_2) / 3.0) / ((sse_1 + sse_2) / (n - 6.0))
    assert (r["n_1"], r["n_2"]) == (len(r1), len(r2))
    assert r["sse_pooled"] == pytest.approx(sse_p, rel=1e-9)
    assert r["sse_1"] == pytest.approx(sse_1, rel=1e-9)
    assert r["sse_2"] == pytest.approx(sse_2, rel=1e-9)
    assert r["f_stat"] == pytest.approx(f, rel=1e-9)
    assert r["f_stat"] > 10.0  # planted regime shift is loud


# ---------------------------------------------------------------------------
# momentum oscillators + tail index


def test_rsi_state_matches_reference(spark):
    from etl_java_spark.operators.timeseries import rsi_state

    vals = [100, 104, 101, 107, 103, 110, 108, 115]
    rows = [(t, v) for t, v in enumerate(vals, start=1)]
    df = spark.createDataFrame(rows, "t long, v long")
    r = rsi_state(df, "t", "v", alpha=0.25).collect()[0]
    deltas = [vals[i] - vals[i - 1] for i in range(1, len(vals))]
    ag, al = max(deltas[0], 0), max(-deltas[0], 0)
    for d in deltas[1:]:
        ag = max(d, 0) * 0.25 + ag * 0.75
        al = max(-d, 0) * 0.25 + al * 0.75
    assert r["n_deltas"] == len(deltas)
    assert r["avg_gain"] == pytest.approx(ag, abs=1e-12)
    assert r["avg_loss"] == pytest.approx(al, abs=1e-12)
    assert r["rsi"] == pytest.approx(100.0 * ag / (ag + al), abs=1e-12)
    assert r["rsi"] > 50.0  # uptrending fixture


def test_macd_state_matches_reference(spark):
    from etl_java_spark.operators.timeseries import macd_state

    vals = [10.0, 12, 11, 15, 14, 18, 17, 21, 20, 24, 23, 27]
    rows = [(t, float(v)) for t, v in enumerate(vals, start=1)]
    df = spark.createDataFrame(rows, "t long, v double")
    r = macd_state(df, "t", "v", fast=3, slow=5, signal=2).collect()[0]
    af, asl, ag = 2.0 / 4.0, 2.0 / 6.0, 2.0 / 3.0
    ef = es = vals[0]
    sig = 0.0
    for v in vals[1:]:
        ef = v * af + ef * (1 - af)
        es = v * asl + es * (1 - asl)
        sig = (ef - es) * ag + sig * (1 - ag)
    assert r["n_periods"] == len(vals)
    assert r["ema_fast"] == pytest.approx(ef, abs=1e-12)
    assert r["ema_slow"] == pytest.approx(es, abs=1e-12)
    assert r["macd"] == pytest.approx(ef - es, abs=1e-12)
    assert r["signal_line"] == pytest.approx(sig, abs=1e-12)
    assert r["macd"] > 0  # uptrend: fast above slow


def test_hill_tail_index_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.corpus import hill_tail_index

    # zipf-ish corpus: token w{i} appears ~ 60/i times
    words = []
    for i in range(1, 13):
        words += [f"w{i}"] * (60 // i)
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    k = 5
    r = hill_tail_index(df, "text", k=k).collect()[0]
    from collections import Counter
    cnt = Counter(words)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[: k + 1]
    c_tail = top[k][1]
    s = sum(m.log(c / c_tail) for _, c in top[:k])
    assert r["k"] == k and r["c_tail"] == c_tail
    assert r["hill_alpha"] == pytest.approx(k / s, abs=1e-9)


def test_hill_tail_index_empty_when_vocab_small(spark):
    from etl_java_spark.operators.corpus import hill_tail_index

    df = spark.createDataFrame([("a b c a b a",)], "text string")
    assert hill_tail_index(df, "text", k=5).count() == 0


# ---------------------------------------------------------------------------
# inventory control + demand elasticity


def test_safety_stock_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.timeseries import safety_stock

    rows = [
        ("a", 1, 10), ("a", 1, 5), ("a", 2, 20), ("a", 3, 12),
        ("a", 5, 9),
        ("b", 1, 100), ("b", 2, 100), ("b", 4, 100),
    ]
    df = spark.createDataFrame(rows, "g string, t long, q long")
    got = {
        r["grp"]: (r["n_periods"], r["mu"], r["sigma"],
                   r["safety_stock"], r["reorder_point"])
        for r in safety_stock(df, "g", "t", "q", lead_time=4,
                              z=2.0).collect()
    }
    from collections import defaultdict
    per = defaultdict(lambda: defaultdict(int))
    for g, t, q in rows:
        per[g][t] += q
    for g, days in per.items():
        qs = list(days.values())
        n = len(qs)
        mu = sum(qs) / n
        sig = m.sqrt((n * sum(q * q for q in qs) - sum(qs) ** 2)
                     / (n * (n - 1)))
        saf = 2.0 * sig * m.sqrt(4.0)
        gn, gmu, gsig, gsaf, grop = got[g]
        assert gn == n
        assert gmu == pytest.approx(mu, abs=1e-12)
        assert gsig == pytest.approx(sig, abs=1e-12)
        assert gsaf == pytest.approx(saf, abs=1e-12)
        assert grop == pytest.approx(mu * 4.0 + saf, abs=1e-12)
    # constant demand -> zero safety stock
    assert got["b"][3] == pytest.approx(0.0, abs=1e-12)


def test_log_log_elasticity_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.evaluation import log_log_elasticity

    # plant q = 1000 * p^-2 exactly in logs
    units = []
    for i in range(1, 11):
        p = i  # unit price
        q = round(1000.0 / (p * p) * 100) or 1
        units.append((p * q, q, q))  # (num = p*q, den = q) -> p
    df = spark.createDataFrame(units, "num long, den long, qty long")
    r = log_log_elasticity(df, "num", "den", "qty").collect()[0]
    lps = [m.log(n / d) for n, d, _ in units]
    lqs = [m.log(q) for _, _, q in units]
    n = len(units)
    sx, sy = sum(lps), sum(lqs)
    sxx = sum(x * x for x in lps); sxy = sum(x * y for x, y in zip(lps, lqs))
    syy = sum(y * y for y in lqs)
    b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    b0 = (sy - b1 * sx) / n
    r2 = 1.0 - (syy - b0 * sy - b1 * sxy) / (syy - sy * sy / n)
    assert r["n_units"] == n
    assert r["elasticity"] == pytest.approx(b1, abs=1e-9)
    assert r["beta0"] == pytest.approx(b0, abs=1e-9)
    assert r["r2"] == pytest.approx(r2, abs=1e-9)
    assert -2.1 < r["elasticity"] < -1.9  # planted slope ~ -2


def test_curation_pipeline_matches_reference(spark):
    import hashlib
    import re
    from etl_java_spark.operators.corpus import curation_pipeline

    stops = set("the a an and or of to in is are was for on with as by "
                "at it this that".split())
    good = ("the quick brown fox jumps over the lazy dog and it runs to "
            "this big field with many other animals that are very happy")
    docs = [
        (1, good, "en", "s1"),
        (2, good, "en", "s1"),            # exact dup of 1 -> dropped
        (3, good + " extra tail", "en", "s1"),
        (4, good, "fr", "s1"),            # lang-filtered
        (5, "tiny", "en", "s2"),          # quality-filtered
        (6, good + " six", "en", "s1"),   # source cap 2 kills this
        (7, good + " seven", "en", "s2"),
        (8, good + " eight", "en", "s2"), # token budget kills this
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, "
                                     "lang string, source string")
    rows = {r["stage"]: (r["n_docs"], r["n_tokens"])
            for r in curation_pipeline(
                df, "doc_id", "text", "lang", "source",
                lang="en", source_cap=2, token_budget=70,
            ).collect()}

    def ntok(t):
        return len([x for x in re.split("[^a-z0-9]+", t.strip().lower())
                    if x])

    def passes(t):
        tk = [x for x in re.split("[^a-z0-9]+", t.strip().lower()) if x]
        n = len(tk)
        wc = sum(len(x) for x in tk)
        npu = sum(1 for ch in t if ch in
                  r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")
        return (10 <= n <= 100000 and 3 * n <= wc <= 10 * n
                and 10 * npu <= len(t)
                and 20 * sum(1 for x in tk if x in stops) >= n
                and 10 * sum(1 for x in tk if re.search("[a-z]", x))
                    >= 7 * n
                and 5 * len(set(tk)) >= n)

    surv = [d for d in docs]
    assert rows["raw"] == (8, sum(ntok(t) for _, t, _, _ in surv))
    surv = [d for d in surv if d[2] == "en"]
    assert rows["lang_filter"] == (len(surv),
                                   sum(ntok(t) for _, t, _, _ in surv))
    surv = [d for d in surv if passes(d[1])]
    assert rows["quality_rules"][0] == len(surv)
    seen, ded = set(), []
    for d in sorted(surv):
        k = hashlib.md5(d[1].strip().lower().encode()).hexdigest()
        if k not in seen:
            seen.add(k)
            ded.append(d)
    assert rows["exact_dedup"][0] == len(ded)
    per_src, capped = {}, []
    for d in sorted(ded):
        c = per_src.get(d[3], 0)
        if c < 2:
            per_src[d[3]] = c + 1
            capped.append(d)
    assert rows["source_cap"][0] == len(capped)
    cum, kept = 0, []
    for d in sorted(capped):
        if cum < 70:
            kept.append(d)
        cum += ntok(d[1])
    assert rows["token_budget"] == (len(kept),
                                    sum(ntok(t) for _, t, _, _ in kept))
    # every planted casualty lands in its intended stage
    assert rows["raw"][0] - rows["lang_filter"][0] == 1
    assert rows["lang_filter"][0] - rows["quality_rules"][0] == 1
    assert rows["quality_rules"][0] - rows["exact_dedup"][0] == 1
    assert rows["exact_dedup"][0] - rows["source_cap"][0] == 1
    assert rows["source_cap"][0] - rows["token_budget"][0] == 1


# ---------------------------------------------------------------------------
# multicollinearity, 2-D PCA, ABC triage


def test_collinearity_diagnostics_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.evaluation import (
        collinearity_diagnostics,
    )

    rows = [(i % 5 + 1, 2 * (i % 5 + 1) + i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "x1 long, x2 long")
    r = collinearity_diagnostics(df, "x1", "x2", scale=0).collect()[0]
    n = len(rows)
    s1 = sum(a for a, _ in rows); s2 = sum(b for _, b in rows)
    s11 = sum(a * a for a, _ in rows)
    s12 = sum(a * b for a, b in rows)
    s22 = sum(b * b for _, b in rows)
    rr = (s12 - s1 * s2 / n) / m.sqrt(
        (s11 - s1 * s1 / n) * (s22 - s2 * s2 / n)
    )
    assert r["r12"] == pytest.approx(rr, abs=1e-12)
    assert r["vif"] == pytest.approx(1.0 / (1.0 - rr * rr), rel=1e-12)
    assert r["cond_index"] == pytest.approx(
        m.sqrt((1 + abs(rr)) / (1 - abs(rr))), rel=1e-12
    )
    assert r["vif"] > 10  # planted near-collinear design


def test_pca_2d_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.evaluation import pca_2d

    rows = [(i, 3 * i + (i * 7) % 5) for i in range(1, 25)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = pca_2d(df, "x", "y", scale=0).collect()[0]
    n = len(rows)
    sx = sum(a for a, _ in rows); sy = sum(b for _, b in rows)
    sxx = sum(a * a for a, _ in rows); sxy = sum(a * b for a, b in rows)
    syy = sum(b * b for _, b in rows)
    a = (sxx - sx * sx / n) / (n - 1)
    c = (syy - sy * sy / n) / (n - 1)
    b = (sxy - sx * sy / n) / (n - 1)
    disc = m.sqrt((a - c) ** 2 + 4 * b * b)
    l1, l2 = (a + c + disc) / 2, (a + c - disc) / 2
    assert r["lambda1"] == pytest.approx(l1, rel=1e-12)
    assert r["lambda2"] == pytest.approx(l2, rel=1e-12)
    assert r["explained"] == pytest.approx(l1 / (l1 + l2), rel=1e-12)
    assert r["pc1_slope"] == pytest.approx((l1 - a) / b, rel=1e-12)
    # PC1 slope tracks the planted y ~ 3x structure
    assert 2.5 < r["pc1_slope"] < 3.5
    # eigen identity: trace and determinant preserved
    assert l1 + l2 == pytest.approx(a + c, rel=1e-12)
    assert l1 * l2 == pytest.approx(a * c - b * b, rel=1e-9)


def test_abc_analysis_matches_reference(spark):
    from etl_java_spark.operators.dq import abc_analysis

    vals = {1: 500, 2: 250, 3: 120, 4: 70, 5: 30, 6: 20, 7: 10}
    rows = [(k, v) for k, v in vals.items()]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r["abc_class"]: (r["n_keys"], r["value_sum"],
                            r["value_share"])
           for r in abc_analysis(df, "k", "v").collect()}
    tv = sum(vals.values())  # 1000
    # cum_before: k1=0(A), k2=500(A), k3=750(A: 75<80), k4=870(B),
    # k5=940(B), k6=970(C: 97>=95), k7=990(C)
    assert got["A"] == (3, 870, pytest.approx(0.87, abs=1e-12))
    assert got["B"] == (2, 100, pytest.approx(0.10, abs=1e-12))
    assert got["C"] == (2, 30, pytest.approx(0.03, abs=1e-12))
    assert tv == 1000


# ---------------------------------------------------------------------------
# cohort LTV, control rules, interarrival burstiness


def test_ltv_curve_matches_reference(spark):
    import datetime as dt
    from etl_java_spark.operators.timeseries import ltv_curve

    rows = [
        (1, dt.datetime(2020, 1, 5), 100),
        (1, dt.datetime(2020, 2, 7), 50),
        (2, dt.datetime(2020, 1, 20), 30),
        (3, dt.datetime(2020, 2, 2), 80),
        (3, dt.datetime(2020, 4, 1), 20),
        (1, dt.datetime(2021, 6, 1), 999),  # age 17 > max_age -> cut
    ]
    df = spark.createDataFrame(rows, "e long, t timestamp, v long")
    got = {
        (str(r["cohort"]), r["age"]): (r["n_entities"], r["cum_value_c"],
                                       r["ltv_c"])
        for r in ltv_curve(df, "e", "t", "v", max_age=12).collect()
    }
    # cohort 2020-01: entities {1, 2}; age0 = 130, age1 = +50
    assert got[("2020-01-01", 0)] == (2, 130, pytest.approx(65.0))
    assert got[("2020-01-01", 1)] == (2, 180, pytest.approx(90.0))
    # cohort 2020-02: entity {3}; age0 = 80, age2 = +20
    assert got[("2020-02-01", 0)] == (1, 80, pytest.approx(80.0))
    assert got[("2020-02-01", 2)] == (1, 100, pytest.approx(100.0))
    assert ("2020-01-01", 17) not in got


def test_control_rules_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.timeseries import control_rules

    vals = [10, 10, 10, 10, 11, 11, 11, 11, 11, 11, 11, 11, 10, 9, 40]
    rows = [(t, v) for t, v in enumerate(vals, start=1)]
    df = spark.createDataFrame(rows, "t long, v long")
    got = {r["t"]: (r["rule1"], r["rule2"], r["rule3"], r["rule4"])
           for r in control_rules(df, "t", "v").collect()}
    n = len(vals)
    mean = sum(vals) / n
    var = sum(v * v for v in vals) / n - mean * mean
    sd = m.sqrt(var)
    # replay: sides and k-sigma exceedances
    def beyond(v, k):
        return abs(v - mean) > k * sd
    exp = {}
    for i, v in enumerate(vals):
        t = i + 1
        r1 = beyond(v, 3)
        w3 = vals[max(0, i - 2): i + 1]
        r2 = (sum(1 for x in w3 if beyond(x, 2) and x > mean) >= 2
              or sum(1 for x in w3 if beyond(x, 2) and x < mean) >= 2)
        w5 = vals[max(0, i - 4): i + 1]
        r3 = (sum(1 for x in w5 if beyond(x, 1) and x > mean) >= 4
              or sum(1 for x in w5 if beyond(x, 1) and x < mean) >= 4)
        w8 = vals[max(0, i - 7): i + 1]
        r4 = (len(w8) == 8
              and (all(x > mean for x in w8) or all(x < mean for x in w8)))
        if r1 or r2 or r3 or r4:
            exp[t] = (r1, r2, r3, r4)
    assert got == exp
    assert got[15][0]  # the planted 3-sigma spike fires rule 1


def test_interarrival_burstiness_matches_reference(spark):
    import math as m
    import datetime as dt
    from etl_java_spark.operators.timeseries import (
        interarrival_burstiness,
    )

    base = dt.datetime(2020, 1, 1)
    # entity 1: periodic every 7 days; entity 2: bursty
    rows = [("g", 1, base + dt.timedelta(days=7 * i)) for i in range(6)]
    rows += [("g", 2, base + dt.timedelta(days=d))
             for d in [0, 1, 2, 40, 41, 90]]
    df = spark.createDataFrame(rows, "grp string, e long, t timestamp")
    r = interarrival_burstiness(df, "grp", "e", "t").collect()[0]
    gaps = [7] * 5 + [1, 1, 38, 1, 49]
    n = len(gaps)
    mean = sum(gaps) / n
    sd = m.sqrt(n * sum(g * g for g in gaps) - sum(gaps) ** 2) / n
    cv = sd / mean
    assert r["n_gaps"] == n
    assert r["mean_gap"] == pytest.approx(mean, abs=1e-12)
    assert r["cv"] == pytest.approx(cv, abs=1e-12)
    assert r["burstiness"] == pytest.approx(
        (cv - 1) / (cv + 1), abs=1e-12
    )


# ---------------------------------------------------------------------------
# process capability, uniformity KS, Bartlett


def test_process_capability_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.dq import process_capability

    rows = [("a", v) for v in [48, 50, 52, 49, 51, 50]] + \
           [("b", v) for v in [30, 50, 70, 40, 60, 50]]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["grp"]: (r["mu"], r["sigma"], r["cp"], r["cpk"])
           for r in process_capability(df, "g", "v", lsl=40,
                                       usl=64).collect()}
    for g in ("a", "b"):
        vs = [v for gg, v in rows if gg == g]
        n = len(vs)
        mu = sum(vs) / n
        sig = m.sqrt((n * sum(v * v for v in vs) - sum(vs) ** 2)
                     / (n * (n - 1)))
        cp = (64.0 - 40.0) / (6.0 * sig)
        cpk = min(64.0 - mu, mu - 40.0) / (3.0 * sig)
        gm, gs, gcp, gcpk = got[g]
        assert gm == pytest.approx(mu, abs=1e-12)
        assert gs == pytest.approx(sig, abs=1e-12)
        assert gcp == pytest.approx(cp, abs=1e-12)
        assert gcpk == pytest.approx(cpk, abs=1e-12)
    # tight group is capable, wide one is not
    assert got["a"][2] > 1.0 > got["b"][2]
    # off-center: cpk < cp for group a (mean 50, spec center 52)
    assert got["a"][3] < got["a"][2]


def test_ks_uniform_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.experiments import ks_uniform_test

    vals = [0, 0, 1, 2, 3, 3, 3, 4, 7, 9, 9, 10]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = ks_uniform_test(df, "v", n_terms=8).collect()[0]
    n = len(vals)
    lo, hi = min(vals), max(vals)
    from collections import Counter
    cnt = Counter(vals)
    ca = 0
    d = 0.0
    for val in sorted(cnt):
        c = cnt[val]
        u = (val - lo) / (hi - lo)
        d = max(d, abs((ca + c) / n - u), abs(u - ca / n))
        ca += c
    p = 2.0 * sum(
        (-1) ** (j - 1) * m.exp(-2.0 * j * j * d * d * n)
        for j in range(1, 9)
    )
    p = min(max(p, 0.0), 1.0)
    assert (r["n"], r["v_min"], r["v_max"]) == (n, lo, hi)
    assert r["d_stat"] == pytest.approx(d, abs=1e-12)
    assert r["p_value"] == pytest.approx(p, abs=1e-9)


def test_bartlett_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.experiments import bartlett_test

    groups = {
        "a": [10, 12, 11, 13, 9, 11],
        "b": [10, 20, 5, 25, 1, 30],
        "c": [11, 11, 12, 10, 11, 12],
        "d": [8, 14, 10, 12, 9, 13],
        "e": [10, 11, 12, 11, 10, 12],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    r = bartlett_test(df, "g", "v").collect()[0]
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s2 = {}
    for g, vs in groups.items():
        ni = len(vs)
        s2[g] = (ni * sum(v * v for v in vs) - sum(vs) ** 2) / (
            ni * (ni - 1)
        )
    nk = n - k
    sp2 = sum((len(groups[g]) - 1) * s2[g] for g in groups) / nk
    # r12 determinism contract: both ln sites quantize to the 1e-9
    # grid before their multipliers (the q434 lesson)
    from decimal import ROUND_HALF_UP, Decimal

    g9 = Decimal("1e-9")

    def q(x):
        return float(Decimal(x).quantize(g9, ROUND_HALF_UP))

    ft = sum((len(groups[g]) - 1) * q(m.log(s2[g])) for g in groups)
    fi = sum(1.0 / (len(groups[g]) - 1) for g in groups)
    c = 1.0 + (fi - 1.0 / nk) / (3.0 * (k - 1))
    t = (nk * q(m.log(sp2)) - ft) / c
    assert (r["k_groups"], r["n_total"]) == (k, n)
    assert r["t_stat"] == pytest.approx(t, rel=1e-9)
    # planted: group b has wildly larger variance -> strong rejection
    assert r["t_stat"] > 20 and r["p_value"] < 0.001


def test_bartlett_raises_on_even_group_count(spark):
    from etl_java_spark.operators.experiments import bartlett_test

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1), ("b", 3)], "g string, v long"
    )
    with pytest.raises(ValueError, match="odd group count"):
        bartlett_test(df, "g", "v")


def test_weighted_ols_matches_reference(spark):
    from etl_java_spark.operators.evaluation import weighted_ols

    rows = [(1, 10, 2), (2, 19, 3), (3, 31, 1), (4, 42, 5), (5, 48, 4)]
    df = spark.createDataFrame(rows, "x long, y long, w long")
    r = weighted_ols(df, "x", "y", "w").collect()[0]
    W = sum(w for _, _, w in rows)
    swx = sum(w * x for x, _, w in rows)
    swy = sum(w * y for _, y, w in rows)
    swxx = sum(w * x * x for x, _, w in rows)
    swxy = sum(w * x * y for x, y, w in rows)
    swyy = sum(w * y * y for _, y, w in rows)
    b1 = (W * swxy - swx * swy) / (W * swxx - swx * swx)
    b0 = (swy - b1 * swx) / W
    r2 = 1.0 - (swyy - b0 * swy - b1 * swxy) / (swyy - swy * swy / W)
    assert (r["n_rows"], r["w_total"]) == (5, W)
    assert r["beta1"] == pytest.approx(b1, rel=1e-12)
    assert r["beta0"] == pytest.approx(b0, rel=1e-12)
    assert r["r2w"] == pytest.approx(r2, rel=1e-12)
    assert 9 < r["beta1"] < 11  # planted slope ~ 10


# ---------------------------------------------------------------------------
# hardening guards


def test_operator_guards_raise(spark):
    from etl_java_spark.operators.spatial import nearest_neighbor_join
    from etl_java_spark.operators.sketch import ams_f2
    from etl_java_spark.operators.timeseries import (
        ohlc_bars,
        rolling_band_breaches,
    )

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError, match="positive"):
        nearest_neighbor_join(df, df, "a", "b", "c", "a", "b", "c", cell=0)
    with pytest.raises(ValueError, match="sequence column"):
        ohlc_bars(df, "a", [], "b", "c")
    with pytest.raises(ValueError, match="window"):
        rolling_band_breaches(df, "a", "b", window=1)
    with pytest.raises(ValueError, match="n_estimators"):
        ams_f2(df, "a", n_estimators=0)


def test_holt_winters_short_series_raises_in_plan(spark):
    from etl_java_spark.operators.timeseries import holt_winters_additive

    df = spark.createDataFrame(
        [(t, 10 + t) for t in range(1, 5)], "b long, v long"
    )
    with pytest.raises(Exception, match="2\\*period|needs >= "):
        holt_winters_additive(df, "b", "v", period=3, horizon=2).collect()


def test_gk_lambda_degenerate_axis_is_null(spark):
    from etl_java_spark.operators.assoc import gk_lambda

    # single y category: lambda(Y|X) denominator is 0 -> NULL, no raise
    df = spark.createDataFrame(
        [("a", "p"), ("b", "p"), ("b", "p")], "x string, y string"
    )
    r = gk_lambda(df, "x", "y").collect()[0]
    assert r["lambda_y_given_x"] is None


# ---------------------------------------------------------------------------
# uniformity battery


def test_cvm_uniform_matches_reference(spark):
    from etl_java_spark.operators.experiments import cvm_uniform_test

    vals = [0, 0, 1, 2, 2, 2, 4, 6, 6, 9, 9, 10]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = cvm_uniform_test(df, "v").collect()[0]
    n = len(vals)
    lo, hi = min(vals), max(vals)
    xs = sorted(vals)
    w2 = 1.0 / (12 * n) + sum(
        ((x - lo) / (hi - lo) - (2 * (i + 1) - 1) / (2 * n)) ** 2
        for i, x in enumerate(xs)
    )
    assert (r["n"], r["v_min"], r["v_max"]) == (n, lo, hi)
    assert r["w2_stat"] == pytest.approx(w2, abs=1e-12)


def test_anderson_darling_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.experiments import (
        anderson_darling_uniform,
    )

    vals = [0, 0, 1, 2, 2, 2, 4, 6, 6, 9, 9, 10]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = anderson_darling_uniform(df, "v").collect()[0]
    n = len(vals)
    lo, hi = min(vals), max(vals)
    xs = sorted(vals)
    us = [(x - lo + 0.5) / (hi - lo + 1.0) for x in xs]
    a2 = -n - (1.0 / n) * sum(
        (2 * (i + 1) - 1) * (m.log(us[i]) + m.log(1 - us[n - 1 - i]))
        for i in range(n)
    )
    assert r["a2_stat"] == pytest.approx(a2, abs=1e-9)


def test_chisq_gof_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.experiments import chisq_gof_uniform

    # 3 bands, uneven counts
    bands = [0] * 10 + [1] * 4 + [2] * 7
    df = spark.createDataFrame([(b,) for b in bands], "b long")
    r = chisq_gof_uniform(df, "b", n_bands=3).collect()[0]
    n = len(bands)
    so2 = 100 + 16 + 49
    x2 = 3.0 / n * so2 - n
    # df = 2: p = exp(-x2/2)
    assert (r["n"], r["n_bands"]) == (n, 3)
    assert r["x2_stat"] == pytest.approx(x2, abs=1e-12)
    assert r["p_value"] == pytest.approx(m.exp(-x2 / 2), rel=1e-12)
    with pytest.raises(ValueError, match="odd n_bands"):
        chisq_gof_uniform(df, "b", n_bands=4)


# ---------------------------------------------------------------------------
# Fisher-z CI, overdispersion, price indices


def test_corr_fisher_ci_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.evaluation import corr_fisher_ci

    rows = [(i, 3 * i + (i * 7) % 11) for i in range(1, 31)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = corr_fisher_ci(df, "x", "y", scale=0).collect()[0]
    n = len(rows)
    sx = sum(a for a, _ in rows); sy = sum(b for _, b in rows)
    sxx = sum(a * a for a, _ in rows); sxy = sum(a * b for a, b in rows)
    syy = sum(b * b for _, b in rows)
    rr = (sxy - sx * sy / n) / m.sqrt(
        (sxx - sx * sx / n) * (syy - sy * sy / n)
    )
    z = 0.5 * m.log((1 + rr) / (1 - rr))
    se = 1.0 / m.sqrt(n - 3)
    zc = 1.959963984540054
    lo, hi = m.tanh(z - zc * se), m.tanh(z + zc * se)
    assert r["r"] == pytest.approx(rr, abs=1e-12)
    assert r["z_fisher"] == pytest.approx(z, abs=1e-12)
    assert r["ci_lo"] == pytest.approx(lo, abs=1e-9)
    assert r["ci_hi"] == pytest.approx(hi, abs=1e-9)
    assert r["ci_lo"] < r["r"] < r["ci_hi"]


def test_overdispersion_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.timeseries import overdispersion_test

    # clumpy counts: variance >> mean
    counts = [1, 0, 0, 12, 1, 0, 15, 0, 1, 0, 20, 2]
    rows = [(t, c) for t, c in enumerate(counts, start=1)]
    df = spark.createDataFrame(rows, "t long, c long")
    r = overdispersion_test(df, "t", "c").collect()[0]
    n = len(counts)
    mean = sum(counts) / n
    var = (n * sum(c * c for c in counts) - sum(counts) ** 2) / (
        n * (n - 1)
    )
    d = (n - 1) * var / mean
    z = m.sqrt(2 * d) - m.sqrt(2 * (n - 1) - 1)
    assert r["n_periods"] == n
    assert r["mean_count"] == pytest.approx(mean, abs=1e-12)
    assert r["var_count"] == pytest.approx(var, abs=1e-12)
    assert r["d_stat"] == pytest.approx(d, rel=1e-12)
    assert r["z"] == pytest.approx(z, abs=1e-12)
    assert r["dispersion_index"] > 5  # planted clumpiness


def test_price_index_matches_reference(spark):
    import math as m
    from etl_java_spark.operators.relational import price_index

    # (item, yr, rev, qty): prices roughly double in period 2
    rows = [
        (1, 0, 100, 10), (1, 1, 220, 11),
        (2, 0, 300, 10), (2, 1, 540, 9),
        (3, 0, 50, 5), (3, 1, 120, 6),
        (4, 0, 80, 8),            # unmatched -> excluded
        (5, 1, 90, 9),            # unmatched -> excluded
    ]
    df = spark.createDataFrame(rows, "item long, yr long, rev long, "
                                     "qty long")
    r = price_index(df, "item", "yr", 0, 1, "rev", "qty").collect()[0]
    b = {i: (rev / q, q) for i, y, rev, q in rows if y == 0}
    c = {i: (rev / q, q) for i, y, rev, q in rows if y == 1}
    items = sorted(set(b) & set(c))
    lnum = sum(c[i][0] * b[i][1] for i in items)
    lden = sum(b[i][0] * b[i][1] for i in items)
    pnum = sum(c[i][0] * c[i][1] for i in items)
    pden = sum(b[i][0] * c[i][1] for i in items)
    assert r["n_items"] == 3
    assert r["laspeyres"] == pytest.approx(lnum / lden, rel=1e-12)
    assert r["paasche"] == pytest.approx(pnum / pden, rel=1e-12)
    assert r["fisher"] == pytest.approx(
        m.sqrt(lnum / lden * (pnum / pden)), rel=1e-12
    )
    assert 1.8 < r["fisher"] < 2.4  # planted ~2x inflation
