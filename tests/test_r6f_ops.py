"""Round-6f wave: A/B power analysis (required sample size),
embedding-space drift monitor, and MATCH_RECOGNIZE-style sequence
pattern counts."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_java_spark.operators.experiments import required_sample_size
from etl_java_spark.operators.similarity import embedding_drift
from etl_java_spark.operators.timeseries import sequence_pattern_counts


# ---------------------------------------------------------------------------
# required_sample_size


def _units(spark, n, x):
    rows = [(i, 1 if i < x else 0) for i in range(n)]
    return spark.createDataFrame(rows, ["uid", "conv"])


def test_power_analysis_matches_closed_form(spark):
    # p1 = 5/20 = 0.25, mde = 0.05 -> textbook two-proportion formula
    r = required_sample_size(_units(spark, 20, 5), "uid", "conv").collect()[0]
    assert r["n_units"] == 20 and r["x_success"] == 5
    assert r["p1"] == 0.25 and r["p2"] == 0.3
    za, zb = 1.959963984540054, 0.8416212335729143
    expect = math.ceil(
        (za + zb) ** 2 * (0.25 * 0.75 + 0.3 * 0.7) / 0.05**2
    )
    assert r["n_per_arm"] == expect


def test_power_analysis_higher_power_needs_more(spark):
    df = _units(spark, 100, 10)
    n80 = required_sample_size(df, "uid", "conv", power=0.8).collect()[0]
    n90 = required_sample_size(df, "uid", "conv", power=0.9).collect()[0]
    assert n90["n_per_arm"] > n80["n_per_arm"]
    # tighter alpha also needs more
    n01 = required_sample_size(df, "uid", "conv", alpha=0.01).collect()[0]
    assert n01["n_per_arm"] > n80["n_per_arm"]


def test_power_analysis_smaller_mde_needs_more(spark):
    df = _units(spark, 50, 20)
    n5 = required_sample_size(df, "uid", "conv", mde=0.05).collect()[0]
    n2 = required_sample_size(df, "uid", "conv", mde=0.02).collect()[0]
    assert n2["n_per_arm"] > n5["n_per_arm"]


def test_power_analysis_rejects_unsupported_grid(spark):
    df = _units(spark, 10, 1)
    with pytest.raises(ValueError):
        required_sample_size(df, "uid", "conv", alpha=0.10)
    with pytest.raises(ValueError):
        required_sample_size(df, "uid", "conv", power=0.95)


# ---------------------------------------------------------------------------
# embedding_drift


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vid", "vec"])


def test_drift_identical_slices_zero(spark):
    # old (even ids) and new (odd ids) have identical centroids
    rows = [(0, [1.0, 2.0]), (2, [3.0, 4.0]), (1, [1.0, 2.0]), (3, [3.0, 4.0])]
    r = embedding_drift(
        _vecs(spark, rows), "vec", "vid", F.col("vid") % 2 == 1
    ).collect()[0]
    assert r["n_old"] == 2 and r["n_new"] == 2
    assert r["cos_sim"] == 1.0
    assert r["l2_dist"] == 0.0
    assert r["max_dim_shift"] == 0.0


def test_drift_known_shift(spark):
    # old centroid (1,0); new centroid (0,1) -> cos 0, l2 sqrt(2), shift 1
    rows = [(0, [1.0, 0.0]), (2, [1.0, 0.0]), (1, [0.0, 1.0])]
    r = embedding_drift(
        _vecs(spark, rows), "vec", "vid", F.col("vid") % 2 == 1
    ).collect()[0]
    assert r["n_old"] == 2 and r["n_new"] == 1
    assert r["cos_sim"] == 0.0
    assert abs(r["l2_dist"] - math.sqrt(2.0)) < 1e-12
    assert r["max_dim_shift"] == 1.0


def test_drift_centroid_mean_and_worst_dim(spark):
    # old centroid mean of (2,0),(4,0) = (3,0); new = (3,4)
    rows = [(0, [2.0, 0.0]), (2, [4.0, 0.0]), (1, [3.0, 4.0])]
    r = embedding_drift(
        _vecs(spark, rows), "vec", "vid", F.col("vid") % 2 == 1
    ).collect()[0]
    # cos((3,0),(3,4)) = 9 / (3*5) = 0.6; l2 = 4; worst dim = 4
    assert abs(r["cos_sim"] - 0.6) < 1e-12
    assert r["l2_dist"] == 4.0
    assert r["max_dim_shift"] == 4.0


# ---------------------------------------------------------------------------
# sequence_pattern_counts


def _events(spark, rows):
    return spark.createDataFrame(rows, ["uid", "ts", "tok"])


def test_sequence_patterns_basic_motifs(spark):
    # u1: v a v p e e e  -> one v..p conversion, one error burst
    rows = [
        ("u1", 1, "v"), ("u1", 2, "a"), ("u1", 3, "v"), ("u1", 4, "p"),
        ("u1", 5, "e"), ("u1", 6, "e"), ("u1", 7, "e"),
        ("u2", 1, "v"), ("u2", 2, "a"),
    ]
    out = {
        r["uid"]: r
        for r in sequence_pattern_counts(
            _events(spark, rows), "uid", ["ts"], "tok",
            {"conv": "v[^p]*p", "burst": "ee+"},
        ).collect()
    }
    assert out["u1"]["n_events"] == 7
    assert out["u1"]["conv"] == 1  # greedy non-overlapping: vavp is one match
    assert out["u1"]["burst"] == 1  # eee is one burst
    assert out["u2"]["conv"] == 0 and out["u2"]["burst"] == 0


def test_sequence_patterns_order_independence_of_input(spark):
    # shuffled input rows -> same fold (order comes from order_cols)
    rows = [("u", t, tok) for t, tok in enumerate("vpvpvp")]
    import random

    shuffled = rows[:]
    random.Random(7).shuffle(shuffled)
    a = sequence_pattern_counts(
        _events(spark, rows), "uid", ["ts"], "tok", {"c": "vp"}
    ).collect()[0]
    b = sequence_pattern_counts(
        _events(spark, shuffled), "uid", ["ts"], "tok", {"c": "vp"}
    ).collect()[0]
    assert a["c"] == b["c"] == 3


def test_sequence_patterns_nonoverlapping_count(spark):
    # "eeee" with pattern ee+ -> ONE greedy match, not two
    rows = [("u", t, "e") for t in range(4)]
    r = sequence_pattern_counts(
        _events(spark, rows), "uid", ["ts"], "tok", {"b": "ee+"}
    ).collect()[0]
    assert r["b"] == 1
    # but e{2} (no greedy tail) counts two
    r2 = sequence_pattern_counts(
        _events(spark, rows), "uid", ["ts"], "tok", {"b": "e{2}"}
    ).collect()[0]
    assert r2["b"] == 2
