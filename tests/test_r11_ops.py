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
