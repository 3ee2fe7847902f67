"""Round-6d wave: Poisson-bootstrap CI, one-pass correlation matrix,
exact weighted percentiles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_java_spark.operators.dq import weighted_percentiles
from etl_java_spark.operators.evaluation import (
    correlation_matrix,
    poisson_bootstrap_ci,
)


# ---------------------------------------------------------------------------
# poisson_bootstrap_ci


def _vals_df(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], ["id", "v"]
    )


def test_bootstrap_point_estimate_is_plain_mean(spark):
    vals = [10.0, 20.0, 30.0, 40.0]
    r = poisson_bootstrap_ci(_vals_df(spark, vals), "v", "id", b=20).collect()[0]
    assert r["n_rows"] == 4
    assert abs(r["est"] - 25.0) < 1e-12


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    vals = [float(100 + (i * 37) % 50) for i in range(300)]
    df = _vals_df(spark, vals)
    r1 = poisson_bootstrap_ci(df, "v", "id", b=50).collect()[0]
    r2 = poisson_bootstrap_ci(df, "v", "id", b=50).collect()[0]
    assert r1 == r2  # hash-derived, no RNG -> bit-identical reruns
    assert r1["n_resamples"] == 50
    assert r1["ci_lo"] <= r1["est"] <= r1["ci_hi"]
    # CI of a 300-row mean with sd ~14 is a few units wide, not huge
    assert r1["ci_hi"] - r1["ci_lo"] < 10.0
    assert r1["ci_hi"] > r1["ci_lo"]


def test_bootstrap_degenerate_constant_data(spark):
    vals = [7.0] * 50
    r = poisson_bootstrap_ci(_vals_df(spark, vals), "v", "id", b=10).collect()[0]
    # every resample mean of a constant column is that constant
    assert r["est"] == 7.0 and r["ci_lo"] == 7.0 and r["ci_hi"] == 7.0


# ---------------------------------------------------------------------------
# correlation_matrix


def test_corr_matrix_matches_numpy(spark):
    rows = [
        (1.0, 2.0, 9.0), (2.0, 4.1, 7.0), (3.0, 5.9, 8.0), (4.0, 8.2, 3.0),
        (5.0, 9.8, 4.0), (6.0, 12.1, 1.0),
    ]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    out = {
        (r["col_a"], r["col_b"]): r
        for r in correlation_matrix(df, ["a", "b", "c"], scale=2).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    arr = np.array(rows)
    ref = np.corrcoef(arr.T)
    assert abs(out[("a", "b")]["corr"] - ref[0, 1]) < 1e-9
    assert abs(out[("a", "c")]["corr"] - ref[0, 2]) < 1e-9
    assert abs(out[("b", "c")]["corr"] - ref[1, 2]) < 1e-9
    assert all(r["n_rows"] == 6 for r in out.values())


def test_corr_matrix_perfect_linear(spark):
    rows = [(float(i), 2.0 * i + 1, -3.0 * i) for i in range(1, 8)]
    df = spark.createDataFrame(rows, ["x", "y", "z"])
    out = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("y", "z")] == -1.0


# ---------------------------------------------------------------------------
# weighted_percentiles


def _wp_reference(pairs, p):
    """Smallest v with cumulative weight >= p * total (exact rational)."""
    from fractions import Fraction

    total = sum(w for _, w in pairs)
    agg = {}
    for v, w in pairs:
        agg[v] = agg.get(v, 0) + w
    cum = 0
    for v in sorted(agg):
        cum += agg[v]
        if Fraction(cum, total) >= Fraction(p):
            return v
    return None


def test_weighted_percentiles_vs_reference(spark):
    pairs = [(10, 1), (20, 1), (30, 98), (40, 1), (50, 1)]
    df = spark.createDataFrame(
        [("g", v, w) for v, w in pairs], ["g", "v", "wt"]
    )
    r = weighted_percentiles(df, ["g"], "v", "wt", [0.5, 0.9, 0.99]).collect()[0]
    assert r["total_weight"] == 102
    # almost all weight at 30 -> median token is 30
    assert r["p50"] == _wp_reference(pairs, "1/2") == 30
    assert r["p90"] == _wp_reference(pairs, "9/10") == 30
    assert r["p99"] == _wp_reference(pairs, "99/100") == 40


def test_weighted_differs_from_unweighted_under_skew(spark):
    # 9 short docs (tiny weight), 1 huge doc: unweighted median is short,
    # token-weighted median is the huge doc
    pairs = [(100, 1)] * 9 + [(100000, 991)]
    df = spark.createDataFrame(
        [("g", v, w) for v, w in pairs], ["g", "v", "wt"]
    )
    r = weighted_percentiles(df, ["g"], "v", "wt", [0.5]).collect()[0]
    assert r["p50"] == 100000


def test_weighted_percentiles_duplicate_values_merge(spark):
    rows = [("g", 5, 3), ("g", 5, 3), ("g", 6, 4)]
    df = spark.createDataFrame(rows, ["g", "v", "wt"])
    r = weighted_percentiles(df, ["g"], "v", "wt", [0.5, 1.0]).collect()[0]
    # cum(5) = 6 of 10 -> p50 = 5; p100 = max value
    assert r["p50"] == 5
    assert r["p100"] == 6
