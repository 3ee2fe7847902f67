"""Round-11 operators and regression pins vs pure-Python references.

Same discipline as test_r10*_ops.py: each Spark operator is replayed by
a straight-line Python implementation of the documented algorithm on a
small in-memory fixture; integer outputs match exactly and double
outputs match to 1e-12 (the operators are fixed-double-tree by design).

The first block pins the round-10 ADVICE fixes: the max_drawdown
non-positive-peak guard, the nearest_neighbor_join exact mode, and the
bartlett_test action-free n_groups path.
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# ADVICE regression pins


def test_max_drawdown_nonpositive_peak_null_frac(spark):
    # all-negative flows: running peak is negative at the trough, so a
    # "fraction of peak" is meaningless -> NULL (mirrors the oracle's
    # CASE WHEN runpeak > 0 guard)
    from etl_java_spark.operators.timeseries import max_drawdown

    df = spark.createDataFrame([(1, -5), (2, -3)], "t long, v long")
    row = max_drawdown(df, "t", "v").collect()[0]
    assert row["max_drawdown_c"] == 3
    assert row["trough_t"] == 2
    assert row["peak_at_trough_c"] == -5
    assert row["drawdown_frac"] is None


def test_max_drawdown_positive_peak_frac_unchanged(spark):
    from etl_java_spark.operators.timeseries import max_drawdown

    df = spark.createDataFrame(
        [(1, 10), (2, -4), (3, 2)], "t long, v long"
    )
    row = max_drawdown(df, "t", "v").collect()[0]
    assert row["max_drawdown_c"] == 4
    assert row["drawdown_frac"] == pytest.approx(4 / 10, abs=1e-15)


def test_nearest_neighbor_join_exact_mode(spark):
    # the approximate failure the exact mode exists for: the true
    # nearest facility A=(25,0) sits just outside p1's 3x3 macro
    # neighborhood (cell=10), while B=(19,19) is inside it but farther
    # (dist2 722 > 625). Default mode returns B (approximate argmin);
    # exact mode refuses to return a beyond-cell match and drops p1.
    from etl_java_spark.operators.spatial import nearest_neighbor_join

    pdf = spark.createDataFrame(
        [(1, 0, 0), (2, 50, 50)], "pid long, px long, py long"
    )
    fdf = spark.createDataFrame(
        [(100, 25, 0), (200, 19, 19), (300, 53, 54)],
        "fid long, fx long, fy long",
    )
    approx = {
        r["pid"]: (r["fid"], r["dist2"])
        for r in nearest_neighbor_join(
            pdf, fdf, "pid", "px", "py", "fid", "fx", "fy", cell=10
        ).collect()
    }
    assert approx[1] == (200, 722)  # in-neighborhood but NOT nearest
    assert approx[2] == (300, 25)

    exact = {
        r["pid"]: (r["fid"], r["dist2"])
        for r in nearest_neighbor_join(
            pdf, fdf, "pid", "px", "py", "fid", "fx", "fy", cell=10,
            exact=True,
        ).collect()
    }
    assert 1 not in exact  # nearest (A, d=25) is beyond cell -> dropped
    assert exact[2] == (300, 25)
    # every returned assignment is the PROVABLE global nearest
    fac = [(100, 25, 0), (200, 19, 19), (300, 53, 54)]
    for pid, px, py in [(2, 50, 50)]:
        true_d2, true_fid = min(
            ((px - fx) ** 2 + (py - fy) ** 2, fid) for fid, fx, fy in fac
        )
        assert exact[pid] == (true_fid, true_d2)


def test_bartlett_all_null_group_not_counted(spark):
    # a group whose values are ALL NULL must not inflate k: with it,
    # k would be 4 (even df -> ValueError); filtered, k=3 and the test
    # runs. Pre-fix the eager count ran before the NULL filter.
    from etl_java_spark.operators.experiments import bartlett_test

    rows = [
        ("a", 1), ("a", 3), ("a", 2),
        ("b", 2), ("b", 5), ("b", 3),
        ("c", 1), ("c", 6), ("c", 4),
        ("d", None), ("d", None),
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    row = bartlett_test(df, "g", "v").collect()[0]
    assert row["k_groups"] == 3
    assert row["n_total"] == 9


def test_bartlett_n_groups_action_free_matches_eager(spark):
    from etl_java_spark.operators.experiments import bartlett_test

    rows = [
        ("a", 1), ("a", 3), ("a", 2),
        ("b", 2), ("b", 5), ("b", 3),
        ("c", 1), ("c", 6), ("c", 4),
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    eager = bartlett_test(df, "g", "v").collect()[0]
    given = bartlett_test(df, "g", "v", n_groups=3).collect()[0]
    assert eager == given


def test_bartlett_n_groups_mismatch_raises_in_plan(spark):
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError
    from etl_java_spark.operators.experiments import bartlett_test

    rows = [("a", 1), ("a", 2), ("b", 3), ("b", 4), ("c", 5), ("c", 6)]
    df = spark.createDataFrame(rows, "g string, v long")
    plan = bartlett_test(df, "g", "v", n_groups=5)  # wrong on purpose
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)):
        plan.collect()


# ---------------------------------------------------------------------------
# wave 1: forecast scorecard, newsvendor, EOQ


def test_forecast_backtest_matches_reference(spark):
    import math

    from etl_java_spark.operators.timeseries import forecast_backtest

    vals = [10, 12, 9, 14, 11, 13, 8, 15, 10, 12]
    rows = [("g", t, v) for t, v in enumerate(vals, start=1)]
    df = spark.createDataFrame(rows, "grp string, t long, v long")
    season = 3
    row = forecast_backtest(df, "grp", "t", "v", season=season).collect()[0]

    evals = [(a, f) for a, f in zip(vals[season:], vals[:-season])]
    errs = [a - f for a, f in evals]
    n = len(errs)
    mae = sum(abs(e) for e in errs) / n
    rmse = math.sqrt(sum(e * e for e in errs) / n)
    mape = sum(abs(a - f) / abs(a) for a, f in evals) / n
    smape = sum(2 * abs(a - f) / (abs(f) + abs(a)) for a, f in evals) / n
    naive = [abs(b - a) for a, b in zip(vals, vals[1:])]
    mase = mae / (sum(naive) / len(naive))
    assert row["n_periods"] == len(vals)
    assert row["n_evals"] == n
    assert row["mae"] == pytest.approx(mae, abs=1e-12)
    assert row["rmse"] == pytest.approx(rmse, abs=1e-12)
    assert row["mape"] == pytest.approx(mape, abs=1e-12)
    assert row["smape"] == pytest.approx(smape, abs=1e-12)
    assert row["mase"] == pytest.approx(mase, abs=1e-12)


def test_forecast_backtest_zero_actual_and_flat_series(spark):
    from etl_java_spark.operators.timeseries import forecast_backtest

    # actual 0 -> mape term contributes 0 by convention; flat series
    # -> naive MAE 0 -> mase NULL
    df = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 5), ("g", 3, 5), ("g", 4, 0)],
        "grp string, t long, v long",
    )
    row = forecast_backtest(df, "grp", "t", "v", season=2).collect()[0]
    assert row["n_evals"] == 2
    # errors: t3: 5-5=0; t4: 0-5=-5 -> mae 2.5
    assert row["mae"] == pytest.approx(2.5, abs=1e-12)
    assert row["mape"] == pytest.approx(0.0, abs=1e-12)  # 0/5 + skip-zero
    # naive diffs: 0,0,5 -> mase = 2.5 / (5/3)
    assert row["mase"] == pytest.approx(1.5, abs=1e-12)


def test_newsvendor_policy_matches_reference(spark):
    from etl_java_spark.operators.timeseries import newsvendor_policy

    demands = [4, 9, 2, 7, 7, 5, 12, 3]
    df = spark.createDataFrame(
        [("g", d) for d in demands], "grp string, d long"
    )
    cu, co = 3, 1
    row = newsvendor_policy(df, "grp", "d", cu=cu, co=co).collect()[0]
    n = len(demands)
    k = -(-n * cu // (cu + co))  # ceil
    q = sorted(demands)[k - 1]
    over = sum(max(q - d, 0) for d in demands)
    under = sum(max(d - q, 0) for d in demands)
    assert row["n_periods"] == n
    assert row["k_rank"] == k
    assert row["q_star"] == q
    assert row["over_units"] == over
    assert row["under_units"] == under
    assert row["exp_cost"] == pytest.approx(
        (co * over + cu * under) / n, abs=1e-12
    )


def test_newsvendor_policy_validates_costs(spark):
    from etl_java_spark.operators.timeseries import newsvendor_policy

    df = spark.createDataFrame([("g", 1)], "grp string, d long")
    with pytest.raises(ValueError, match="positive"):
        newsvendor_policy(df, "grp", "d", cu=0, co=1)


def test_eoq_policy_matches_reference(spark):
    import math

    from etl_java_spark.operators.timeseries import eoq_policy

    df = spark.createDataFrame(
        [("g", 300), ("g", 700)], "grp string, d long"
    )
    row = eoq_policy(df, "grp", "d", order_cost_c=200, holding_cost_c=8)
    r = row.collect()[0]
    d = 1000
    eoq = math.sqrt(2 * d * 200 / 8)
    assert r["demand"] == d
    assert r["eoq_units"] == pytest.approx(eoq, abs=1e-9)
    assert r["n_orders"] == pytest.approx(d / eoq, abs=1e-9)
    assert r["cycle_cost_c"] == pytest.approx(
        math.sqrt(2 * d * 200 * 8), abs=1e-9
    )


# ---------------------------------------------------------------------------
# wave 2: Erlang-C staffing, Little's law, seasonal Mann-Kendall


def test_erlang_c_staffing_matches_reference(spark):
    from etl_java_spark.operators.timeseries import erlang_c_staffing

    counts = [3, 5, 2, 4, 6, 4]  # arrivals per period
    df = spark.createDataFrame(
        [("g", c) for c in counts], "grp string, c long"
    )
    s_time, c_max, tgt = 1.5, 30, 0.2
    row = erlang_c_staffing(
        df, "grp", "c", service_time=s_time, c_max=c_max,
        target_wait_prob=tgt,
    ).collect()[0]
    lam = sum(counts) / len(counts)
    a = lam * s_time
    b = 1.0
    c_star = pw_star = None
    for c in range(1, c_max + 1):
        b = a * b / (c + a * b)
        pw = c * b / (c - a * (1.0 - b)) if a < c else 1.0
        if c_star is None and a < c and pw <= tgt:
            c_star, pw_star = c, pw
    assert row["lam"] == pytest.approx(lam, abs=1e-15)
    assert row["offered_load"] == pytest.approx(a, abs=1e-15)
    assert row["c_star"] == c_star
    assert row["wait_prob"] == pytest.approx(pw_star, abs=1e-12)


def test_erlang_c_unreachable_target_is_null(spark):
    from etl_java_spark.operators.timeseries import erlang_c_staffing

    df = spark.createDataFrame([("g", 100)], "grp string, c long")
    row = erlang_c_staffing(
        df, "grp", "c", service_time=1.0, c_max=5,
        target_wait_prob=0.2,
    ).collect()[0]  # offered load 100 >> 5 agents
    assert row["c_star"] is None
    assert row["wait_prob"] is None


def test_little_law_audit_matches_reference(spark):
    import datetime as dt

    from etl_java_spark.operators.timeseries import little_law_audit

    d = dt.date
    ivals = [
        # (start, end): one fully inside, one straddling the left
        # edge, one straddling the right edge, one outside-before
        (d(2020, 1, 10), d(2020, 1, 19)),
        (d(2019, 12, 25), d(2020, 1, 5)),
        (d(2020, 1, 28), d(2020, 2, 10)),
        (d(2019, 11, 1), d(2019, 11, 30)),
    ]
    df = spark.createDataFrame(
        [("g", s, e) for s, e in ivals], "grp string, s date, e date"
    )
    ws, we = d(2020, 1, 1), d(2020, 1, 31)
    row = little_law_audit(
        df, "grp", "s", "e", "2020-01-01", "2020-01-31"
    ).collect()[0]
    wdays = (we - ws).days + 1
    ov = sum(
        max((min(e, we) - max(s, ws)).days + 1, 0) for s, e in ivals
    )
    arrivals = [(s, e) for s, e in ivals if ws <= s <= we]
    sdur = sum((e - s).days + 1 for s, e in arrivals)
    l_avg = ov / wdays
    lam = len(arrivals) / wdays
    w = sdur / len(arrivals)
    assert row["n_arrivals"] == len(arrivals)
    assert row["window_days"] == wdays
    assert row["l_avg"] == pytest.approx(l_avg, abs=1e-12)
    assert row["lam_per_day"] == pytest.approx(lam, abs=1e-12)
    assert row["w_days"] == pytest.approx(w, abs=1e-12)
    assert row["little_ratio"] == pytest.approx(
        l_avg / (lam * w), abs=1e-12
    )


def test_seasonal_mann_kendall_matches_reference(spark):
    import datetime as dt
    import math

    from etl_java_spark.operators.timeseries import seasonal_mann_kendall

    # 3 months x 4 years, upward trend with a tie in month 2
    series = {
        (1, 2019): 10, (1, 2020): 12, (1, 2021): 15, (1, 2022): 14,
        (2, 2019): 8, (2, 2020): 8, (2, 2021): 11, (2, 2022): 13,
        (3, 2019): 20, (3, 2020): 22, (3, 2021): 21, (3, 2022): 25,
    }
    rows = [
        ("x", dt.date(y, m, 1), v) for (m, y), v in series.items()
    ]
    df = spark.createDataFrame(rows, "pad string, t date, v long")
    row = seasonal_mann_kendall(df, "t", "v").collect()[0]

    s = n_pairs = 0
    vn18 = 0
    for m in (1, 2, 3):
        vals = [series[(m, y)] for y in (2019, 2020, 2021, 2022)]
        n = len(vals)
        for i in range(n):
            for j in range(i + 1, n):
                n_pairs += 1
                s += (vals[j] > vals[i]) - (vals[j] < vals[i])
        ties: dict[int, int] = {}
        for v in vals:
            ties[v] = ties.get(v, 0) + 1
        tcorr = sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
        )
        vn18 += n * (n - 1) * (2 * n + 5) - tcorr
    var = vn18 / 18.0
    z = (s - 1) / math.sqrt(var) if s > 0 else (
        (s + 1) / math.sqrt(var) if s < 0 else 0.0
    )
    assert row["n_seasons"] == 3
    assert row["n_pairs"] == n_pairs
    assert row["s_stat"] == s
    assert row["var_num18"] == vn18
    assert row["z"] == pytest.approx(z, abs=1e-12)


# ---------------------------------------------------------------------------
# wave 3: regression diagnostics


def test_breusch_pagan_matches_reference(spark):
    from etl_java_spark.operators.evaluation import breusch_pagan

    # variance grows with x -> LM should be clearly positive
    pts = [
        (1, 10), (1, 11), (1, 9), (2, 22), (2, 18), (2, 20),
        (3, 35), (3, 24), (3, 31), (4, 50), (4, 30), (4, 40),
    ]
    df = spark.createDataFrame(
        [(x, y) for x, y in pts], "x long, y long"
    )
    row = breusch_pagan(df, "y", "x", resid_scale=6).collect()[0]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    b0 = (sy - b1 * sx) / n
    zm = [round((y - b0 - b1 * x) ** 2 * 1e6) for x, y in pts]
    sz = sum(zm)
    sxz = sum(x * z for (x, _), z in zip(pts, zm))
    szz = sum(z * z for z in zm)
    cov = n * sxz - sx * sz
    vx = n * sxx - sx * sx
    vz = n * szz - sz * sz
    r2 = cov * cov / (vx * vz)
    assert row["n_rows"] == n
    assert row["b0"] == pytest.approx(b0, abs=1e-9)
    assert row["b1"] == pytest.approx(b1, abs=1e-9)
    assert row["r2_aux"] == pytest.approx(r2, rel=1e-9)
    assert row["lm_stat"] == pytest.approx(n * r2, rel=1e-9)
    assert row["lm_stat"] > 1.0  # planted heteroscedasticity registers


def test_arch_lm_matches_reference(spark):
    from etl_java_spark.operators.evaluation import arch_lm_test

    vals = [5, 9, 2, 8, 3, 9, 1, 7, 4, 6]
    df = spark.createDataFrame(
        [(t, v) for t, v in enumerate(vals, 1)], "t long, v long"
    )
    row = arch_lm_test(df, "t", "v").collect()[0]
    n = len(vals)
    s = sum(vals)
    z = [(n * v - s) ** 2 for v in vals]
    pairs = list(zip(z[:-1], z[1:]))
    m = len(pairs)
    szl = sum(a for a, _ in pairs)
    sz = sum(b for _, b in pairs)
    szzl = sum(a * b for a, b in pairs)
    szlzl = sum(a * a for a, _ in pairs)
    szz = sum(b * b for _, b in pairs)
    cov = m * szzl - szl * sz
    r2 = cov * cov / ((m * szlzl - szl * szl) * (m * szz - sz * sz))
    assert row["n_periods"] == n
    assert row["n_pairs"] == m
    assert row["r2_aux"] == pytest.approx(r2, rel=1e-12)
    assert row["lm_stat"] == pytest.approx(m * r2, rel=1e-12)


def test_dagostino_k2_matches_reference(spark):
    import math

    from etl_java_spark.operators.dq import dagostino_k2

    vals = [3, 7, 8, 5, 12, 6, 9, 4, 11, 5, 6, 8, 30, 7, 5, 9, 6, 7,
            10, 4, 8, 6]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, v long"
    )
    row = dagostino_k2(df, "grp", "v").collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    m2 = sum(v * v for v in vals) / n - mean * mean
    m3 = (sum(v ** 3 for v in vals) / n
          - 3 * mean * (sum(v * v for v in vals) / n)
          + 2 * mean ** 3)
    m4 = (sum(v ** 4 for v in vals) / n
          - 4 * mean * (sum(v ** 3 for v in vals) / n)
          + 6 * mean * mean * (sum(v * v for v in vals) / n)
          - 3 * mean ** 4)
    g1 = m3 / m2 ** 1.5
    b2 = m4 / (m2 * m2)
    yy = g1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    beta2 = (3 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
             / ((n - 2) * (n + 5) * (n + 7) * (n + 9)))
    w2 = -1 + math.sqrt(2 * (beta2 - 1))
    delta = 1 / math.sqrt(0.5 * math.log(w2))
    ya = yy / math.sqrt(2 / (w2 - 1))
    z1 = delta * math.log(ya + math.sqrt(ya * ya + 1))
    eb2 = 3 * (n - 1) / (n + 1)
    vb2 = 24 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    xs = (b2 - eb2) / math.sqrt(vb2)
    sb1 = (6 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
           * math.sqrt(6 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))))
    aa = 6 + 8 / sb1 * (2 / sb1 + math.sqrt(1 + 4 / (sb1 * sb1)))
    tt = (1 - 2 / aa) / (1 + xs * math.sqrt(2 / (aa - 4)))
    cbrt = math.copysign(abs(tt) ** (1 / 3), tt)
    z2 = ((1 - 2 / (9 * aa)) - cbrt) / math.sqrt(2 / (9 * aa))
    assert row["n"] == n
    assert row["skewness"] == pytest.approx(g1, abs=1e-10)
    assert row["kurtosis"] == pytest.approx(b2, abs=1e-10)
    assert row["z_skew"] == pytest.approx(z1, abs=1e-9)
    assert row["z_kurt"] == pytest.approx(z2, abs=1e-9)
    assert row["k2_stat"] == pytest.approx(z1 * z1 + z2 * z2, abs=1e-8)
    assert row["p_value"] == pytest.approx(
        math.exp(-0.5 * (z1 * z1 + z2 * z2)), abs=1e-10
    )


# ---------------------------------------------------------------------------
# wave 4: centralities + exact Bayesian A/B


def test_harmonic_centrality_matches_reference(spark):
    from etl_java_spark.operators.graph import harmonic_centrality

    # path graph 1-2-3-4-5 plus a pendant 6 off node 2
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (3,)], "node long")
    got = {
        r["seed"]: (r["n_reached"], r["harmonic"])
        for r in harmonic_centrality(edf, seeds, max_hops=3).collect()
    }
    # seed 1: d(2)=1, d(3)=2, d(6)=2, d(4)=3 -> H = 1 + 1/2 + 1/2 + 1/3
    assert got[1][0] == 4
    assert got[1][1] == pytest.approx(1 + 0.5 + 0.5 + 1 / 3, abs=1e-12)
    # seed 3: d(2)=1, d(4)=1, d(1)=2, d(6)=2, d(5)=2
    assert got[3][0] == 5
    assert got[3][1] == pytest.approx(2 * 1 + 3 * 0.5, abs=1e-12)


def test_eigenvector_centrality_counts_walks(spark):
    from etl_java_spark.operators.graph import eigenvector_centrality

    # star: center 0 with leaves 1..3; x_k alternates between
    # center/leaf walk counts, all exactly countable
    edges = [(0, 1), (0, 2), (0, 3)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    out = {
        r["node"]: (r["raw_score"], r["score"])
        for r in eigenvector_centrality(edf, iterations=2).collect()
    }
    # x1: center 3, leaf 1; x2: center 3 (sum of leaves), leaf 3
    assert out[0][0] == 3.0
    assert all(out[i][0] == 3.0 for i in (1, 2, 3))
    assert out[0][1] == pytest.approx(3 / 12, abs=1e-15)


def test_bayes_ab_beta_matches_lgamma_reference(spark):
    import math

    from etl_java_spark.operators.experiments import bayes_ab_beta

    def ref(a_a, b_a, a_b, b_b):
        lb = lambda x, y: (
            math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)
        )
        return sum(
            math.exp(
                lb(a_a + i, b_a + b_b)
                - math.log(b_b + i)
                - lb(1 + i, b_b)
                - lb(a_a, b_a)
            )
            for i in range(a_b)
        )

    for ca, na, cb, nb in [(1, 2, 2, 3), (7, 20, 11, 18), (0, 5, 5, 5)]:
        rows = (
            [("A", 1)] * ca + [("A", 0)] * (na - ca)
            + [("B", 1)] * cb + [("B", 0)] * (nb - cb)
        )
        df = spark.createDataFrame(rows, "v string, s long")
        r = bayes_ab_beta(df, "v", "s", "A", "B").collect()[0]
        exp = ref(1 + ca, 1 + na - ca, 1 + cb, 1 + nb - cb)
        assert r["prob_b_gt_a"] == pytest.approx(exp, abs=1e-12)
        assert r["n_a"] == na and r["conv_a"] == ca
        assert r["mean_b"] == pytest.approx(
            (1 + cb) / (2 + nb), abs=1e-15
        )


def test_bayes_ab_beta_symmetric_uniform_is_half(spark):
    from etl_java_spark.operators.experiments import bayes_ab_beta

    df = spark.createDataFrame(
        [("A", 0), ("B", 0)], "v string, s long"
    )
    r = bayes_ab_beta(df, "v", "s", "A", "B").collect()[0]
    assert r["prob_b_gt_a"] == pytest.approx(0.5, abs=1e-15)


def test_bayes_ab_beta_max_terms_guard(spark):
    from etl_java_spark.operators.experiments import bayes_ab_beta

    df = spark.createDataFrame(
        [("A", 1), ("A", 0), ("B", 1), ("B", 0)], "v string, s long"
    )
    plan = bayes_ab_beta(df, "v", "s", "A", "B", max_terms=2)
    with pytest.raises(Exception):
        plan.collect()


# ---------------------------------------------------------------------------
# wave 5: mSPRT, generalized ESD, Lilliefors


def test_msprt_always_valid_matches_reference(spark):
    import math

    from etl_java_spark.operators.experiments import (
        ab_assign,
        msprt_always_valid,
    )

    rows = [(k, 1 + (k % 3), 1 if k % 4 == 0 else 0) for k in range(1, 61)]
    df = spark.createDataFrame(rows, "unit long, look int, s int")
    tau = 0.2
    got = {
        r["look"]: r
        for r in msprt_always_valid(df, "unit", "s", "look", tau=tau)
        .collect()
    }
    # replay with the engine's own variant assignment
    vmap = {
        r["unit"]: r["v"]
        for r in df.select(
            "unit", ab_assign("unit").alias("v")
        ).collect()
    }
    agg = {}
    for unit, look, s in rows:
        d = agg.setdefault(look, [0, 0, 0, 0])
        v = vmap[unit]
        d[v] += 1
        d[2 + v] += s
    t2 = tau * tau
    run_min = None
    for look in sorted(agg):
        na = sum(agg[lk][0] for lk in agg if lk <= look)
        nb = sum(agg[lk][1] for lk in agg if lk <= look)
        xa = sum(agg[lk][2] for lk in agg if lk <= look)
        xb = sum(agg[lk][3] for lk in agg if lk <= look)
        delta = xb / nb - xa / na
        pp = (xa + xb) / (na + nb)
        vv = pp * (1 - pp) * (1 / na + 1 / nb)
        lr = math.sqrt(vv / (vv + t2)) * math.exp(
            delta * delta * t2 / (2 * vv * (vv + t2))
        )
        p = min(1.0, 1.0 / lr)
        run_min = p if run_min is None else min(run_min, p)
        r = got[look]
        assert (r["n_a"], r["n_b"], r["x_a"], r["x_b"]) == (na, nb, xa, xb)
        assert r["delta"] == pytest.approx(delta, abs=1e-12)
        assert r["lr"] == pytest.approx(lr, abs=1e-10)
        assert r["p_always_valid"] == pytest.approx(run_min, abs=1e-10)


def test_esd_outliers_unmasks_second_outlier(spark):
    from etl_java_spark.operators.dq import esd_outliers

    # two planted outliers close together: the first inflates s and
    # partially masks the second; round-2 re-fit must still find it
    vals = [10, 11, 9, 10, 12, 10, 11, 9, 10, 11, 80, 78]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals, 1)], "id long, v long"
    )
    rows = {
        r["round"]: r
        for r in esd_outliers(
            df, "id", "v", max_outliers=3, threshold=2.0
        ).collect()
    }
    assert rows[1]["flagged_value"] == 80
    assert rows[2]["flagged_value"] == 78
    assert rows[1]["outlier"] and rows[2]["outlier"]
    # round 3 re-fits on the clean 10-row core; no value stands out
    assert rows[3]["flagged_value"] in (9, 12)

    # replay round 1 g exactly
    import math

    n = len(vals)
    s = sum(vals)
    ss = sum(v * v for v in vals)
    sd = math.sqrt((n * ss - s * s) / (n * (n - 1)))
    g1 = max(abs(v - s / n) for v in vals) / sd
    assert rows[1]["g_stat"] == pytest.approx(g1, abs=1e-10)


def test_esd_outliers_tiebreak_smallest_id(spark):
    from etl_java_spark.operators.dq import esd_outliers

    df = spark.createDataFrame(
        [(5, 0), (2, 100), (9, 100), (1, 50), (3, 50)], "id long, v long"
    )
    r1 = esd_outliers(df, "id", "v", max_outliers=1).collect()[0]
    # 0 deviates most (mean 60); unique -> id 5. Then ties break low.
    assert r1["flagged_id"] == 5


def test_lilliefors_matches_reference(spark):
    import math

    from etl_java_spark.operators.experiments import lilliefors_normal

    vals = [1, 2, 2, 3, 3, 3, 4, 4, 5, 9]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = lilliefors_normal(df, "v").collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    sd = math.sqrt(
        (n * sum(v * v for v in vals) - sum(vals) ** 2) / (n * (n - 1))
    )

    def phi(z):
        # Zelen-Severo replay
        b = [0.319381530, -0.356563782, 1.781477937, -1.821255978,
             1.330274429]
        p_ = 0.2316419
        inv = 0.3989422804014327

        def sf(x):
            t = 1.0 / (1.0 + p_ * x)
            poly = 0.0
            for c in reversed(b):
                poly = poly * t + c
            poly = poly * t
            return inv * math.exp(-0.5 * x * x) * poly

        return 1.0 - sf(z) if z >= 0 else sf(-z)

    from collections import Counter

    cnt = Counter(vals)
    cum = 0
    d = 0.0
    for v in sorted(cnt):
        lo = cum / n
        cum += cnt[v]
        hi = cum / n
        z = (v - mean) / sd
        d = max(d, hi - phi(z), phi(z) - lo)
    assert row["n"] == n
    assert row["mean"] == pytest.approx(mean, abs=1e-12)
    assert row["sd"] == pytest.approx(sd, abs=1e-12)
    assert row["d_stat"] == pytest.approx(d, abs=1e-10)
    assert row["d_crit_05"] == pytest.approx(0.886 / math.sqrt(n), abs=1e-12)


# ---------------------------------------------------------------------------
# wave 6: pinball, inventory replay, Kingman


def test_pinball_loss_matches_reference(spark):
    from etl_java_spark.operators.timeseries import pinball_loss

    rows = [
        ("g", 1, 10, 8), ("g", 2, 7, 9), ("g", 3, 12, 12),
        ("g", 4, 5, None),
    ]
    df = spark.createDataFrame(rows, "grp string, t long, a long, f long")
    got = {
        (r["q_num"], r["q_den"]): r
        for r in pinball_loss(
            df, "grp", "t", "a", "f", quantiles=[(1, 4), (3, 4)]
        ).collect()
    }
    evals = [(10, 8), (7, 9), (12, 12)]
    for qn, qd in [(1, 4), (3, 4)]:
        q = qn / qd
        exp = sum(
            max(q * (a - f), (q - 1) * (a - f)) for a, f in evals
        ) / len(evals)
        r = got[(qn, qd)]
        assert r["n_evals"] == 3
        assert r["pinball"] == pytest.approx(exp, abs=1e-12)


def test_pinball_loss_validates_quantiles(spark):
    from etl_java_spark.operators.timeseries import pinball_loss

    df = spark.createDataFrame([("g", 1, 1, 1)], "grp string, t long, a long, f long")
    with pytest.raises(ValueError, match="quantile"):
        pinball_loss(df, "grp", "t", "a", "f", quantiles=[(5, 4)])


def test_inventory_policy_sim_matches_reference(spark):
    from etl_java_spark.operators.timeseries import inventory_policy_sim

    demands = [4, 9, 2, 15, 1, 7, 20, 3]
    df = spark.createDataFrame(
        [("g", t, d) for t, d in enumerate(demands, 1)],
        "grp string, t long, d long",
    )
    s_r, s_t = 6, 18
    row = inventory_policy_sim(
        df, "grp", "t", "d", s_reorder=s_r, s_target=s_t
    ).collect()[0]
    oh, lost, orders, send = s_t, 0, 0, 0
    for d in demands:
        sold = min(d, oh)
        lost += d - sold
        end = oh - sold
        send += end
        if end < s_r:
            oh = s_t
            orders += 1
        else:
            oh = end
    total = sum(demands)
    assert row["n_periods"] == len(demands)
    assert row["total_demand"] == total
    assert row["lost_units"] == lost
    assert row["n_orders"] == orders
    assert row["fill_rate"] == pytest.approx(
        (total - lost) / total, abs=1e-12
    )
    assert row["avg_end_inventory"] == pytest.approx(
        send / len(demands), abs=1e-12
    )


def test_kingman_wait_matches_reference(spark):
    import math

    from etl_java_spark.operators.timeseries import kingman_wait

    counts = [3, 5, 2, 6, 4]
    durs = [10, 14, 9, 13, 12, 8]
    arr = spark.createDataFrame(
        [("g", c) for c in counts], "grp string, c long"
    )
    svc = spark.createDataFrame(
        [("g", x) for x in durs], "grp string, x long"
    )
    m = 60
    row = kingman_wait(arr, svc, "grp", "c", "x", servers=m).collect()[0]
    np_, sc = len(counts), sum(counts)
    lam = sc / np_
    varc = (np_ * sum(c * c for c in counts) - sc * sc) / (
        np_ * (np_ - 1)
    )
    ca2 = varc / lam
    ns, sx = len(durs), sum(durs)
    es = sx / ns
    vars_ = (ns * sum(x * x for x in durs) - sx * sx) / (ns * (ns - 1))
    cs2 = vars_ / (es * es)
    rho = lam * es / m
    p = math.sqrt(2 * (m + 1)) - 1
    wq = (ca2 + cs2) / 2 * math.exp(p * math.log(rho)) / (
        m * (1 - rho)
    ) * es
    assert rho < 1
    assert row["lam"] == pytest.approx(lam, abs=1e-12)
    assert row["ca2"] == pytest.approx(ca2, abs=1e-12)
    assert row["es"] == pytest.approx(es, abs=1e-12)
    assert row["cs2"] == pytest.approx(cs2, abs=1e-12)
    assert row["rho"] == pytest.approx(rho, abs=1e-12)
    assert row["wq"] == pytest.approx(wq, abs=1e-10)


def test_kingman_wait_unstable_queue_null(spark):
    from etl_java_spark.operators.timeseries import kingman_wait

    arr = spark.createDataFrame(
        [("g", 100), ("g", 90)], "grp string, c long"
    )
    svc = spark.createDataFrame(
        [("g", 10), ("g", 12)], "grp string, x long"
    )
    row = kingman_wait(arr, svc, "grp", "c", "x", servers=2).collect()[0]
    assert row["rho"] > 1
    assert row["wq"] is None and row["wq_over_es"] is None


# ---------------------------------------------------------------------------
# wave 7: k-truss, temporal motifs, span cutting


def test_k_truss_matches_reference(spark):
    from etl_java_spark.operators.graph import k_truss

    # two triangles sharing edge (1,2) + a pendant chain 5-6-7;
    # 3-truss keeps the two triangles, drops the chain
    edges = [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4), (5, 6), (6, 7)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["u"], r["v"]): r["support"]
        for r in k_truss(edf, k=3, rounds=2).collect()
    }
    assert set(got) == {(1, 2), (2, 3), (1, 3), (1, 4), (2, 4)}
    assert got[(1, 2)] == 2  # in both triangles
    assert got[(2, 3)] == 1


def test_k_truss_peels_cascades(spark):
    from etl_java_spark.operators.graph import k_truss

    # triangle 1-2-3 plus edge (3,4) closing NO triangle, and a
    # second triangle 3-4-5 that only exists through (3,4): removing
    # nothing... construct a cascade: square 1-2-3-4 with one
    # diagonal (1,3): triangles (1,2,3), (1,3,4). All edges have
    # support >= 1 -> survive round 1. Now remove edge (2,3) by
    # giving it no triangle? Instead test convergence: with k=4
    # (support >= 2) only the shared diagonal has support 2 in round
    # 1, but its triangles die with the other edges -> empty by
    # round 2.
    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    out = k_truss(edf, k=4, rounds=2).collect()
    assert out == []


def test_temporal_motif_counts_matches_reference(spark):
    import datetime as dt

    from etl_java_spark.operators.graph import temporal_motif_counts

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    sec = dt.timedelta(seconds=1)
    rows = [
        # user 1: a->b->c inside window; c far outside
        (1, t0, "a", 1), (1, t0 + 60 * sec, "b", 2),
        (1, t0 + 120 * sec, "c", 3), (1, t0 + 9000 * sec, "c", 4),
        # user 2: simultaneous pair (tie on ts, id ordering counts
        # exactly one direction)
        (2, t0, "x", 5), (2, t0, "y", 6), (2, t0 + 10 * sec, "z", 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = {
        (r["t1"], r["t2"], r["t3"]): r["n"]
        for r in temporal_motif_counts(
            df, "user_id", "ts", "event_type", max_span_seconds=3600
        ).collect()
    }
    assert got[("a", "b", "c")] == 1
    assert ("a", "b", "c") in got and ("b", "c", "c") not in got
    # user 2: only (x, y, z) — id tiebreak orders the simultaneous pair
    assert got[("x", "y", "z")] == 1
    assert ("y", "x", "z") not in got


def test_cut_spans_merge_clamp_and_stitch(spark):
    from etl_java_spark.operators.corpus import cut_spans

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "hello world"), (3, "untouched")],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [(1, 2, 4), (1, 4, 6), (1, 9, 20), (2, 1, 5), (2, 7, 7),
         (2, -3, 0)],
        "doc_id long, start long, end long",
    )
    got = {
        r["doc_id"]: r for r in cut_spans(docs, spans).collect()
    }
    assert got[1]["kept_text"] == "agh"  # (2,6) merged + (9,10) clamped
    assert got[1]["n_spans"] == 3 and got[1]["n_merged"] == 2
    assert got[2]["kept_text"] == " orld"
    assert got[2]["n_spans"] == 2  # the (-3, 0) span clamps away
    assert got[3]["kept_text"] == "untouched"
    assert got[3]["n_spans"] == 0 and got[3]["n_merged"] == 0
    for r in got.values():
        assert r["kept_len"] == len(r["kept_text"])


def test_cut_spans_adjacent_spans_merge(spark):
    from etl_java_spark.operators.corpus import cut_spans

    docs = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    spans = spark.createDataFrame(
        [(1, 2, 3), (1, 4, 5)], "doc_id long, start long, end long"
    )
    r = cut_spans(docs, spans).collect()[0]
    assert r["n_merged"] == 1  # adjacent [2,3]+[4,5] -> [2,5]
    assert r["kept_text"] == "af"


# ---------------------------------------------------------------------------
# wave 8: raking, Qn scale, two-way ANOVA


def test_raking_weights_hits_both_margins(spark):
    from etl_java_spark.operators.sampling import raking_weights

    cells = spark.createDataFrame(
        [("a", "x", 10), ("a", "y", 30), ("b", "x", 20), ("b", "y", 40)],
        "r string, c string, n long",
    )
    rt = spark.createDataFrame(
        [("a", 50.0), ("b", 50.0)], "r string, target double"
    )
    ct = spark.createDataFrame(
        [("x", 60.0), ("y", 40.0)], "c string, target double"
    )
    out = raking_weights(cells, "r", "c", "n", rt, ct, iterations=25)
    rows = out.collect()
    rsum = {}
    csum = {}
    for r in rows:
        rsum[r["r"]] = rsum.get(r["r"], 0) + r["weighted_n"]
        csum[r["c"]] = csum.get(r["c"], 0) + r["weighted_n"]
    # after enough rounds IPF converges to both margins
    assert rsum["a"] == pytest.approx(50.0, abs=1e-6)
    assert rsum["b"] == pytest.approx(50.0, abs=1e-6)
    assert csum["x"] == pytest.approx(60.0, abs=1e-6)
    assert csum["y"] == pytest.approx(40.0, abs=1e-6)


def test_raking_weights_matches_python_replay(spark):
    from etl_java_spark.operators.sampling import raking_weights

    cells = {("a", "x"): 5, ("a", "y"): 15, ("b", "x"): 25, ("b", "y"): 5}
    cdf = spark.createDataFrame(
        [(r, c, n) for (r, c), n in cells.items()], "r string, c string, n long"
    )
    rt = {"a": 30.0, "b": 20.0}
    ct = {"x": 35.0, "y": 15.0}
    rdf = spark.createDataFrame(list(rt.items()), "r string, target double")
    cdf2 = spark.createDataFrame(list(ct.items()), "c string, target double")
    got = {
        (r["r"], r["c"]): r["weight"]
        for r in raking_weights(
            cdf, "r", "c", "n", rdf, cdf2, iterations=3
        ).collect()
    }
    w = {k: 1.0 for k in cells}
    for _ in range(3):
        for rk in rt:
            tot = sum(w[k] * cells[k] for k in sorted(w) if k[0] == rk)
            for k in w:
                if k[0] == rk:
                    w[k] *= rt[rk] / tot
        for ck in ct:
            tot = sum(w[k] * cells[k] for k in sorted(w) if k[1] == ck)
            for k in w:
                if k[1] == ck:
                    w[k] *= ct[ck] / tot
    for k in cells:
        assert got[k] == pytest.approx(w[k], rel=1e-12)


def test_qn_scale_matches_bruteforce(spark):
    from etl_java_spark.operators.dq import qn_scale

    vals = [3, 7, 7, 1, 12, 5, 9, 7, 2, 15, 4]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = qn_scale(df, "v").collect()[0]
    n = len(vals)
    diffs = sorted(
        abs(vals[i] - vals[j])
        for i in range(n)
        for j in range(i + 1, n)
    )
    h = n // 2 + 1
    k = h * (h - 1) // 2
    assert row["n"] == n
    assert row["h"] == h
    assert row["k_rank"] == k
    assert row["qn_raw"] == diffs[k - 1]
    assert row["qn"] == pytest.approx(2.2219 * diffs[k - 1], abs=1e-12)


def test_two_way_anova_matches_reference(spark):
    from etl_java_spark.operators.dq import two_way_anova

    rows = [
        ("a", "x", 4), ("a", "x", 6), ("a", "y", 8), ("a", "y", 12),
        ("b", "x", 10), ("b", "x", 14), ("b", "y", 20), ("b", "y", 24),
        ("b", "y", 22),
    ]
    df = spark.createDataFrame(rows, "fa string, fb string, v long")
    r = two_way_anova(df, "fa", "fb", "v").collect()[0]
    n = len(rows)
    t = sum(v for _, _, v in rows)
    cf = t * t / n
    import collections

    by_a = collections.defaultdict(list)
    by_b = collections.defaultdict(list)
    by_c = collections.defaultdict(list)
    for a, b, v in rows:
        by_a[a].append(v)
        by_b[b].append(v)
        by_c[(a, b)].append(v)
    qa = sum(sum(g) ** 2 / len(g) for g in by_a.values())
    qb = sum(sum(g) ** 2 / len(g) for g in by_b.values())
    qc = sum(sum(g) ** 2 / len(g) for g in by_c.values())
    ss_tot = sum(v * v for _, _, v in rows) - cf
    ss_a, ss_b, ss_cells = qa - cf, qb - cf, qc - cf
    ss_ab = ss_cells - ss_a - ss_b
    ss_err = ss_tot - ss_cells
    assert r["n"] == n
    assert r["ss_a"] == pytest.approx(ss_a, abs=1e-9)
    assert r["ss_b"] == pytest.approx(ss_b, abs=1e-9)
    assert r["ss_ab"] == pytest.approx(ss_ab, abs=1e-9)
    assert r["ss_err"] == pytest.approx(ss_err, abs=1e-9)
    assert (r["df_a"], r["df_b"], r["df_ab"]) == (1, 1, 1)
    assert r["df_err"] == n - 4
    assert r["f_a"] == pytest.approx(
        (ss_a / 1) / (ss_err / (n - 4)), rel=1e-9
    )


# ---------------------------------------------------------------------------
# wave 9: Luhn audit, RDD, TOST


def test_luhn_card_audit_checksum(spark):
    from etl_java_spark.operators.dq import luhn_card_audit

    docs = [
        (1, "pay 4532015112830366 now"),        # valid
        (2, "ref 4532015112830367"),             # checksum fails
        (3, "short 123456789012 x"),             # too short
        (4, "a 4111111111111111 b 79927398713"), # valid 16d; 11d ignored
        (5, "clean text"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {r["id"]: r for r in luhn_card_audit(df, "id", "text").collect()}
    assert got[1]["n_valid"] == 1
    assert got[1]["first_valid_masked"] == "****0366"
    assert got[2]["n_valid"] == 0 and got[2]["n_invalid"] == 1
    assert 3 not in got and 5 not in got
    assert got[4]["n_candidates"] == 1 and got[4]["n_valid"] == 1
    assert got[4]["first_valid_masked"] == "****1111"


def test_rdd_estimate_recovers_planted_jump(spark):
    from etl_java_spark.operators.experiments import rdd_estimate

    # flat level 1 below 0 (2 + x//100 = 1 for -50..-5, floor div),
    # flat level 12 at/above 0 -> exact jump 11
    rows = []
    for x in range(-50, 51, 5):
        y = 2 + x // 100 if x < 0 else 12 + x // 100
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x long, y long")
    r = rdd_estimate(df, "x", "y", cutoff=0, bandwidth=100).collect()[0]
    assert r["n_left"] == 10 and r["n_right"] == 11
    assert r["effect"] == pytest.approx(11.0, abs=1e-9)


def test_rdd_estimate_matches_moment_replay(spark):
    from etl_java_spark.operators.experiments import rdd_estimate

    rows = [(-8, 3), (-5, 4), (-2, 2), (-1, 5), (1, 9), (3, 11),
            (6, 10), (9, 14)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = rdd_estimate(df, "x", "y", cutoff=0, bandwidth=10).collect()[0]

    def fit(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return (sy - b1 * sx) / n, b1

    b0l, b1l = fit([p for p in rows if p[0] < 0])
    b0r, b1r = fit([p for p in rows if p[0] >= 0])
    assert r["b0_left"] == pytest.approx(b0l, abs=1e-12)
    assert r["b1_right"] == pytest.approx(b1r, abs=1e-12)
    assert r["effect"] == pytest.approx(b0r - b0l, abs=1e-12)


def test_tost_equivalence_matches_reference(spark):
    import math

    from etl_java_spark.operators.experiments import (
        ab_assign,
        tost_equivalence,
    )

    rows = [(k, 1 if k % 5 == 0 else 0) for k in range(1, 201)]
    df = spark.createDataFrame(rows, "unit long, s int")
    m = 0.1
    r = tost_equivalence(df, "unit", "s", margin=m).collect()[0]
    vmap = {
        x["unit"]: x["v"]
        for x in df.select("unit", ab_assign("unit").alias("v")).collect()
    }
    na = sum(1 for u, _ in rows if vmap[u] == 0)
    xa = sum(s for u, s in rows if vmap[u] == 0)
    nb = len(rows) - na
    xb = sum(s for u, s in rows if vmap[u] == 1)
    pa, pb = xa / na, xb / nb
    delta = pb - pa
    se = math.sqrt(pa * (1 - pa) / na + pb * (1 - pb) / nb)

    def sf(x):
        b = [0.319381530, -0.356563782, 1.781477937, -1.821255978,
             1.330274429]
        t = 1.0 / (1.0 + 0.2316419 * x)
        poly = 0.0
        for c in reversed(b):
            poly = poly * t + c
        return 0.3989422804014327 * math.exp(-0.5 * x * x) * poly * t

    def p_of(z):
        return sf(z) if z >= 0 else 1.0 - sf(-z)

    zl, zu = (delta + m) / se, (m - delta) / se
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (na, xa, nb, xb)
    assert r["delta"] == pytest.approx(delta, abs=1e-14)
    assert r["p_equiv"] == pytest.approx(
        max(p_of(zl), p_of(zu)), abs=1e-10
    )


# ---------------------------------------------------------------------------
# wave 10: Lloyd, Sinkhorn, ARI


def test_lloyd_deterministic_matches_reference(spark):
    from etl_java_spark.operators.similarity import lloyd_deterministic

    # 2 obvious clusters in 2-d; ids 1..6, k=2 seeded from ids 1-2
    pts = [
        (1, [0.0, 0.0]), (2, [10.0, 10.0]), (3, [0.5, -0.5]),
        (4, [9.5, 10.5]), (5, [0.2, 0.1]), (6, [10.2, 9.9]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    rows = {
        r["cid"]: r
        for r in lloyd_deterministic(
            df, "vec_id", "embedding", k=2, iterations=2, quant=1000
        ).collect()
    }
    assert rows[1]["n_points"] == 3 and rows[2]["n_points"] == 3

    # python replay
    import itertools

    xq = {i: [round(v * 1000) for v in e] for i, e in pts}
    cent = {1: [float(v) for v in xq[1]], 2: [float(v) for v in xq[2]]}
    for _ in range(2):
        assign = {}
        for i, x in xq.items():
            best = min(
                (sum((a - c) ** 2 for a, c in zip(x, cent[j])), j)
                for j in cent
            )
            assign[i] = best
        newc = {}
        for j in cent:
            members = [xq[i] for i in xq if assign[i][1] == j]
            newc[j] = [
                sum(col) / len(members) for col in zip(*members)
            ]
        cent = newc
    for j in (1, 2):
        members = [i for i in xq if assign[i][1] == j]
        inertia = sum(assign[i][0] for i in members)
        assert rows[j]["n_points"] == len(members)
        assert rows[j]["inertia"] == pytest.approx(inertia, rel=1e-9)
        assert rows[j]["centroid_checksum"] == pytest.approx(
            sum(cent[j]), rel=1e-9
        )


def test_sinkhorn_plan_converges_to_margins(spark):
    from etl_java_spark.operators.sampling import sinkhorn_plan

    cost = spark.createDataFrame(
        [("a", "x", 0.0), ("a", "y", 2.0), ("b", "x", 2.0),
         ("b", "y", 0.0)],
        "r string, c string, cost double",
    )
    rm = spark.createDataFrame(
        [("a", 0.5), ("b", 0.5)], "r string, mass double"
    )
    cm = spark.createDataFrame(
        [("x", 0.5), ("y", 0.5)], "c string, mass double"
    )
    out = sinkhorn_plan(
        cost, "r", "c", "cost", rm, cm, epsilon=0.5, iterations=30
    ).collect()
    rsum = {}
    for r in out:
        rsum[r["r"]] = rsum.get(r["r"], 0) + r["plan_mass"]
    assert rsum["a"] == pytest.approx(0.5, abs=1e-9)
    # cheap transport concentrates on the diagonal
    plan = {(r["r"], r["c"]): r["plan_mass"] for r in out}
    assert plan[("a", "x")] > 4 * plan[("a", "y")]


def test_adjusted_rand_index_known_values(spark):
    from etl_java_spark.operators.evaluation import adjusted_rand_index

    # identical partitions -> ARI 1; crossed halves -> ARI < 0.1
    same = spark.createDataFrame(
        [(i % 3, i % 3) for i in range(30)], "pa long, pb long"
    )
    r1 = adjusted_rand_index(same, "pa", "pb").collect()[0]
    assert r1["ari"] == pytest.approx(1.0, abs=1e-12)

    crossed = spark.createDataFrame(
        [(i % 2, i % 4) for i in range(40)], "pa long, pb long"
    )
    r2 = adjusted_rand_index(crossed, "pa", "pb").collect()[0]
    # replay sklearn-style from the contingency table
    import collections

    cells = collections.Counter((i % 2, i % 4) for i in range(40))
    arow = collections.Counter(i % 2 for i in range(40))
    bcol = collections.Counter(i % 4 for i in range(40))
    comb = lambda x: x * (x - 1) // 2
    sc = sum(comb(v) for v in cells.values())
    sa = sum(comb(v) for v in arow.values())
    sb = sum(comb(v) for v in bcol.values())
    n = 40
    e = sa * sb / comb(n)
    ari = (sc - e) / ((sa + sb) / 2 - e)
    assert r2["ari"] == pytest.approx(ari, abs=1e-12)


# ---------------------------------------------------------------------------
# wave 11: Weibull MRR, Tukey biweight, BY-FDR


def test_weibull_mrr_matches_reference(spark):
    import math

    from etl_java_spark.operators.timeseries import weibull_mrr

    durs = [5, 7, 7, 9, 12, 15, 15, 20, 28, 40]
    df = spark.createDataFrame([(x,) for x in durs], "t long")
    row = weibull_mrr(df, "t").collect()[0]
    n = len(durs)
    pts = []
    for i, t in enumerate(sorted(durs), start=1):
        fi = (i - 0.3) / (n + 0.4)
        pts.append((math.log(t), math.log(-math.log(1 - fi))))
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    b0 = (sy - b1 * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert row["n"] == n
    assert row["shape_k"] == pytest.approx(b1, rel=1e-9)
    assert row["scale_lambda"] == pytest.approx(
        math.exp(-b0 / b1), rel=1e-9
    )
    assert row["r2"] == pytest.approx(r2, rel=1e-9)


def test_weibull_mrr_tie_ranks_are_itemwise(spark):
    from etl_java_spark.operators.timeseries import weibull_mrr

    # 4 identical lifetimes still occupy ranks 1..4 (not one collapsed
    # rank) — n must count items
    df = spark.createDataFrame([(5,), (5,), (5,), (5,)], "t long")
    row = weibull_mrr(df, "t").collect()[0]
    # n counts ITEMS (4), not the single distinct lifetime; the fit
    # itself is degenerate (all x equal) and deterministic-garbage —
    # the per-term quantization makes the zero denominator merely tiny
    assert row["n"] == 4


def test_tukey_biweight_ignores_far_outlier(spark):
    from etl_java_spark.operators.dq import tukey_biweight_location

    vals = [10, 11, 9, 10, 12, 10, 11, 9, 10, 11, 300]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = tukey_biweight_location(df, "v").collect()[0]
    assert row["median"] == 10 and row["mad"] == 1
    assert 9.5 < row["loc"] < 11.0  # 300 fully rejected
    # replay the two IRLS rounds
    med, mad, c = 10, 1, 4.685
    loc = float(med)
    for _ in range(2):
        num = den = 0.0
        for v in sorted(set(vals)):
            cnt = vals.count(v)
            u = (v - loc) / (c * mad)
            w = (1 - u * u) ** 2 if abs(u) < 1 else 0.0
            num += w * v * cnt
            den += w * cnt
        loc = num / den
    # the engine quantizes weighted terms at 1e-6 per round; the exact
    # replay agrees to quantization level
    assert row["loc"] == pytest.approx(loc, abs=1e-4)


def test_by_fdr_stricter_than_bh(spark):
    from etl_java_spark.operators.experiments import bh_fdr

    rows = [(f"t{i:02d}", p) for i, p in enumerate(
        [0.001, 0.004, 0.01, 0.02, 0.04, 0.2, 0.5, 0.8]
    )]
    df = spark.createDataFrame(rows, "k string, p double")
    bh = bh_fdr(df, ["k"], "p", q=0.05)
    by = bh_fdr(df, ["k"], "p", q=0.05, by_correction=True)
    n_bh = sum(1 for r in bh.collect() if r["discovery"])
    n_by = sum(1 for r in by.collect() if r["discovery"])
    assert n_by <= n_bh  # harmonic shrink can only lose discoveries
    hm = sum(1.0 / i for i in range(1, 9))
    r1 = {r["k"]: r for r in by.collect()}
    assert r1["t00"]["bh_threshold"] == pytest.approx(
        1 * 0.05 / 8 / hm, rel=1e-12
    )


# ---------------------------------------------------------------------------
# wave 12: Lepage, Hodges-Lehmann, median CI


def test_lepage_combines_component_z(spark):
    import math

    from etl_java_spark.operators.experiments import (
        ansari_bradley,
        lepage_test,
        mann_whitney_u,
    )

    rows = (
        [("a", v) for v in [10, 12, 11, 13, 12, 11]]
        + [("b", v) for v in [20, 2, 25, 1, 22, 3]]
    )  # same-ish center, very different spread
    df = spark.createDataFrame(rows, "g string, v long")
    lp = lepage_test(df, "g", "v", "a", "b").collect()[0]
    zw = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]["z"]
    zab = ansari_bradley(df, "g", "v", "a", "b").collect()[0]["z"]
    assert lp["z_w"] == pytest.approx(zw, abs=1e-12)
    assert lp["z_ab"] == pytest.approx(zab, abs=1e-12)
    assert lp["l_stat"] == pytest.approx(zw * zw + zab * zab, abs=1e-10)
    assert lp["p_value"] == pytest.approx(
        math.exp(-0.5 * (zw * zw + zab * zab)), abs=1e-10
    )
    # scale-only change: AB drives the signal
    assert abs(zab) > abs(zw)


def test_hodges_lehmann_matches_bruteforce(spark):
    from etl_java_spark.operators.experiments import hodges_lehmann_shift

    a = [3, 5, 7, 7, 9]
    b = [10, 12, 12, 15]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    r = hodges_lehmann_shift(df, "g", "v", "a", "b").collect()[0]
    diffs = sorted(vb - va for va in a for vb in b)
    np_ = len(diffs)
    lo = diffs[(np_ + 1) // 2 - 1]
    hi = diffs[np_ // 2]
    assert r["n_pairs"] == np_
    assert r["hl_lo"] == lo and r["hl_hi"] == hi
    assert r["hl_shift"] == pytest.approx((lo + hi) / 2, abs=1e-12)


def test_median_ci_ranks_and_values(spark):
    import math

    from etl_java_spark.operators.dq import median_ci

    vals = sorted([7, 3, 9, 1, 5, 11, 13, 2, 8, 6, 4, 12, 10, 14, 15])
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = median_ci(df, "v").collect()[0]
    n = len(vals)
    lo_rank = math.floor((n - 1.959963984540054 * math.sqrt(n)) / 2)
    hi_rank = n - lo_rank + 1
    assert r["n"] == n
    assert r["median"] == vals[(n + 1) // 2 - 1]
    assert r["lo_rank"] == lo_rank and r["hi_rank"] == hi_rank
    assert r["ci_lo"] == vals[lo_rank - 1]
    assert r["ci_hi"] == vals[hi_rank - 1]
    assert r["ci_lo"] < r["median"] < r["ci_hi"]


# ---------------------------------------------------------------------------
# wave 13: GPD tail, adstock MMM, Chao1


def test_gpd_pwm_matches_reference(spark):
    from etl_java_spark.operators.timeseries import gpd_pwm

    vals = [410, 415, 415, 430, 450, 480, 520, 600, 405, 440]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = gpd_pwm(df, "v", threshold=400).collect()[0]
    y = sorted(v - 400 for v in vals)
    n = len(y)
    b0 = sum(y) / n
    b1 = sum((i - 1) / (n - 1) * yi for i, yi in enumerate(y, 1)) / n
    xi = 2 - b0 / (b0 - 2 * b1)
    sc = 2 * b0 * b1 / (b0 - 2 * b1)
    assert row["n_exceed"] == n
    assert row["b0"] == pytest.approx(b0, abs=1e-9)
    assert row["b1"] == pytest.approx(b1, abs=1e-6)
    assert row["shape_xi"] == pytest.approx(xi, abs=1e-6)
    assert row["scale"] == pytest.approx(sc, abs=1e-5)


def test_adstock_mmm_matches_reference(spark):
    import math

    from etl_java_spark.operators.timeseries import adstock_mmm

    series = [(1, 10, 120), (2, 0, 100), (3, 20, 180), (4, 5, 140),
              (5, 0, 110), (6, 30, 260)]
    df = spark.createDataFrame(series, "t long, s long, yv long")
    row = adstock_mmm(df, "t", "s", "yv", decay_num=1, decay_den=2)
    r = row.collect()[0]
    a = 0.0
    pts = []
    for _, s_, y_ in series:
        a = s_ + 0.5 * a
        pts.append((math.log(1 + a), y_))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    b0 = (sy - b1 * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert r["n_periods"] == n
    assert r["b0"] == pytest.approx(b0, rel=1e-9)
    assert r["b1"] == pytest.approx(b1, rel=1e-9)
    assert r["r2"] == pytest.approx(r2, rel=1e-9)
    assert r["b1"] > 0  # planted positive spend effect


def test_chao1_richness_matches_reference(spark):
    from etl_java_spark.operators.corpus import chao1_richness

    toks = (["a"] * 5 + ["b"] * 2 + ["c"] + ["d"] + ["e"] * 2
            + ["f"] * 3)
    df = spark.createDataFrame(
        [("g", t) for t in toks], "grp string, tok string"
    )
    r = chao1_richness(df, "grp", "tok").collect()[0]
    # freqs: a5 b2 c1 d1 e2 f3 -> s_obs 6, f1 2, f2 2
    assert (r["s_obs"], r["f1"], r["f2"]) == (6, 2, 2)
    assert r["chao1"] == pytest.approx(6 + 4 / 4, abs=1e-12)
    assert r["coverage"] == pytest.approx(1 - 2 / len(toks), abs=1e-12)


def test_chao1_no_doubletons_bias_corrected(spark):
    from etl_java_spark.operators.corpus import chao1_richness

    toks = ["a", "b", "c", "d", "d", "d"]
    df = spark.createDataFrame(
        [("g", t) for t in toks], "grp string, tok string"
    )
    r = chao1_richness(df, "grp", "tok").collect()[0]
    # f1=3, f2=0 -> chao = 4 + 3*2/2 = 7
    assert r["chao1"] == pytest.approx(7.0, abs=1e-12)


# ---------------------------------------------------------------------------
# wave 14: MRR bridge, shift-share


def test_mrr_bridge_identity_and_categories(spark):
    from etl_java_spark.operators.relational import mrr_bridge

    rows = [
        # customer A: new in p1 at 100, expands to 150, churns in p3
        ("A", 1, 100), ("A", 2, 150),
        # customer B: new in p1, contracts, stays
        ("B", 1, 200), ("B", 2, 120), ("B", 3, 120),
        # customer C: new in p2, gone p3, resurrected p4
        ("C", 2, 80), ("C", 4, 90),
    ]
    df = spark.createDataFrame(rows, "e string, p long, v long")
    out = {r["p"]: r for r in mrr_bridge(df, "e", "p", "v").collect()}
    # p2: starting 300; A +50 expansion; B -80 contraction; C new 80
    assert out[2]["starting"] == 300
    assert out[2]["new_rev"] == 80
    assert out[2]["expansion"] == 50
    assert out[2]["contraction"] == 80
    assert out[2]["churned"] == 0
    assert out[2]["ending"] == 350
    # p3: A churns (150); ending 120
    assert out[3]["churned"] == 150 + 80  # A 150 + C 80 both absent p3
    assert out[3]["ending"] == 120
    # p4: C resurrected 90 (first period was 2)
    assert out[4]["resurrected"] == 90
    assert out[4]["new_rev"] == 0
    # ledger identity everywhere
    for r in out.values():
        assert (
            r["ending"]
            == r["starting"] + r["new_rev"] + r["resurrected"]
            + r["expansion"] - r["contraction"] - r["churned"]
        )
    # p1 (the ledger's first period) is not emitted
    assert 1 not in out


def test_shift_share_components_sum_to_delta(spark):
    from etl_java_spark.operators.relational import shift_share

    d0 = spark.createDataFrame(
        [("r1", "i1", 100), ("r1", "i2", 50), ("r2", "i1", 200),
         ("r2", "i2", 150)],
        "r string, i string, v long",
    )
    d1 = spark.createDataFrame(
        [("r1", "i1", 130), ("r1", "i2", 45), ("r2", "i1", 240),
         ("r2", "i2", 160)],
        "r string, i string, v long",
    )
    out = {r["r"]: r for r in shift_share(d0, d1, "r", "i", "v").collect()}
    t0, t1 = 500, 575
    g = (t1 - t0) / t0
    gi = {"i1": (370 - 300) / 300, "i2": (205 - 200) / 200}
    for r, cells in (("r1", [("i1", 100, 130), ("i2", 50, 45)]),
                     ("r2", [("i1", 200, 240), ("i2", 150, 160)])):
        ns = sum(v0 * g for _, v0, _ in cells)
        im = sum(v0 * (gi[i] - g) for i, v0, _ in cells)
        dv = sum(v1 - v0 for _, v0, v1 in cells)
        row = out[r]
        assert row["national_share"] == pytest.approx(ns, abs=1e-6)
        assert row["industry_mix"] == pytest.approx(im, abs=1e-6)
        assert row["regional_shift"] == pytest.approx(
            dv - ns - im, abs=1e-6
        )
        assert (
            row["national_share"] + row["industry_mix"]
            + row["regional_shift"]
        ) == pytest.approx(dv, abs=1e-6)
