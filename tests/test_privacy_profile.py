"""Tests for k_anonymity, suppress_small_groups, profile_strings."""

from __future__ import annotations

from etl_java_spark.operators.dq import (
    k_anonymity,
    profile_strings,
    suppress_small_groups,
)


def test_k_anonymity_hand_case(spark):
    # groups: A x5 (safe at k=3), B x2 (violating), C x1 (violating)
    rows = [("A",)] * 5 + [("B",)] * 2 + [("C",)]
    df = spark.createDataFrame(rows, ["q"])
    r = k_anonymity(df, ["q"], k=3).collect()[0]
    assert (r.n_rows, r.n_groups) == (8, 3)
    assert r.n_violating_groups == 2 and r.n_rows_at_risk == 3
    assert not r.k_anonymous
    kept = suppress_small_groups(df, ["q"], k=3)
    assert kept.count() == 5
    assert {x.q for x in kept.collect()} == {"A"}
    # after suppression the remainder IS k-anonymous
    assert k_anonymity(kept, ["q"], k=3).collect()[0].k_anonymous


def test_k_anonymity_null_quasi_values_group_together(spark):
    rows = [(None,)] * 4 + [("X",)] * 4
    df = spark.createDataFrame(rows, "q string")
    r = k_anonymity(df, ["q"], k=4).collect()[0]
    assert r.k_anonymous and r.n_groups == 2


def test_profile_strings_hand_case(spark):
    rows = [("abc", "x"), ("", "x"), (None, "longer")]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = {r.col_name: r for r in profile_strings(df, ["a", "b"]).collect()}
    assert out["a"].n == 3 and out["a"].n_null == 1
    assert out["a"].n_distinct == 2  # 'abc' and ''
    assert (out["a"].min_len, out["a"].max_len) == (0, 3)
    assert out["a"].n_blank == 1
    assert out["b"].n_null == 0 and out["b"].max_len == 6
