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
