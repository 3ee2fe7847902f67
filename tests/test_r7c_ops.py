"""Round-7 wave-3 operators: Misra-Gries heavy hitters, source
divergence (TV/Hellinger), IPS/SNIPS off-policy replay."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_java_spark.operators.corpus import source_divergence
from etl_java_spark.operators.experiments import ips_policy_value
from etl_java_spark.operators.sketch import misra_gries_summary


# ---------------------------------------------------------------------------
# Misra-Gries


def _mg_check(spark, keys, k, n_partitions=7):
    df = spark.createDataFrame([(x,) for x in keys], "key long").repartition(
        n_partitions
    )
    est = {
        r["key"]: r["est"]
        for r in misra_gries_summary(df, "key", k=k).collect()
    }
    true = {}
    for x in keys:
        true[x] = true.get(x, 0) + 1
    n = len(keys)
    bound = n / (k + 1)
    # (1) one-sided: est never exceeds true
    for key, e in est.items():
        assert e <= true[key], (key, e, true[key])
        assert true[key] - e <= bound + 1e-9, (key, e, true[key], bound)
    # (2) guarantee: every key above n/(k+1) is caught
    for key, t in true.items():
        if t > bound:
            assert key in est, (key, t, bound)
    return est, true, bound


def test_mg_guarantee_on_skewed_stream(spark):
    keys = [1] * 500 + [2] * 300 + [3] * 120 + list(range(100, 400))
    est, true, bound = _mg_check(spark, keys, k=8)
    assert {1, 2, 3} <= set(est)


def test_mg_uniform_stream_bounds_hold(spark):
    keys = [i % 50 for i in range(1000)]
    _mg_check(spark, keys, k=8)


def test_mg_fewer_keys_than_k_is_exact(spark):
    keys = [1] * 10 + [2] * 5 + [3] * 2
    df = spark.createDataFrame([(x,) for x in keys], "key long").repartition(3)
    est = {
        r["key"]: r["est"]
        for r in misra_gries_summary(df, "key", k=16).collect()
    }
    assert est == {1: 10, 2: 5, 3: 2}  # never evicts -> exact counts


# ---------------------------------------------------------------------------
# source divergence


def _py_divergence(docs_a, docs_b):
    import re

    def dist(docs):
        c = {}
        for d in docs:
            for t in re.split(r"[^a-z0-9]+", d.lower().strip()):
                if t:
                    c[t] = c.get(t, 0) + 1
        n = sum(c.values())
        return {t: v / n for t, v in c.items()}
    p, q = dist(docs_a), dist(docs_b)
    ts = set(p) | set(q)
    tv = 0.5 * sum(abs(p.get(t, 0.0) - q.get(t, 0.0)) for t in ts)
    h2 = 0.5 * sum(
        (math.sqrt(p.get(t, 0.0)) - math.sqrt(q.get(t, 0.0))) ** 2 for t in ts
    )
    return len(ts), tv, math.sqrt(h2)


def test_source_divergence_matches_python(spark):
    a = ["the cat sat", "the dog ran fast", "cat and dog"]
    b = ["quantum flux capacitor", "the flux ran", "capacitor cat"]
    rows = [("A", d) for d in a] + [("B", d) for d in b]
    df = spark.createDataFrame(rows, "source string, text string")
    out = source_divergence(df, "text", "source").collect()
    assert len(out) == 1
    r = out[0]
    n_terms, tv, hel = _py_divergence(a, b)
    assert (r["source_a"], r["source_b"]) == ("A", "B")
    assert r["n_terms"] == n_terms
    assert abs(r["tv"] - tv) < 1e-12
    assert abs(r["hellinger"] - hel) < 1e-12


def test_source_divergence_identical_sources_zero(spark):
    docs = ["alpha beta gamma", "beta gamma delta"]
    rows = [("A", d) for d in docs] + [("B", d) for d in docs]
    df = spark.createDataFrame(rows, "source string, text string")
    r = source_divergence(df, "text", "source").collect()[0]
    assert r["tv"] == 0.0 and r["hellinger"] == 0.0


def test_source_divergence_disjoint_vocab_is_one(spark):
    rows = [("A", "aa bb cc"), ("B", "xx yy zz")]
    df = spark.createDataFrame(rows, "source string, text string")
    r = source_divergence(df, "text", "source").collect()[0]
    assert abs(r["tv"] - 1.0) < 1e-12
    assert abs(r["hellinger"] - 1.0) < 1e-12


def test_source_divergence_three_sources_three_pairs(spark):
    rows = [("A", "a b"), ("B", "b c"), ("C", "c d")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = source_divergence(df, "text", "source").collect()
    assert {(r["source_a"], r["source_b"]) for r in out} == {
        ("A", "B"), ("A", "C"), ("B", "C")
    }


# ---------------------------------------------------------------------------
# IPS replay


def test_ips_hand_example(spark):
    # 4 rows, propensity 0.5; target matches action on rows 1 and 3
    rows = [
        (1, 1, 1, 0.5),  # action=1 target=1 y=1 -> w=2, y*w=2
        (0, 1, 1, 0.5),  # mismatch -> w=0
        (1, 1, 0, 0.5),  # match, y=0
        (0, 0, 1, 0.5),  # match, y=1 -> y*w=2
    ]
    df = spark.createDataFrame(rows, "action int, target int, y int, p double")
    r = ips_policy_value(df, "action", "y", "target", "p").collect()[0]
    assert r["n"] == 4 and r["n_matched"] == 3
    assert r["logged_value"] == 3 / 4
    assert r["ips_value"] == (2.0 + 0.0 + 2.0) / 4
    assert abs(r["snips_value"] - (4.0 / 6.0)) < 1e-15


def test_ips_target_equals_logged_recovers_logged_value(spark):
    """When the target policy IS the logged policy (and propensity is
    the true constant 1.0), IPS == SNIPS == logged value."""
    rows = [(i % 2, i % 2, i % 3 == 0, 1.0) for i in range(30)]
    df = spark.createDataFrame(
        [(a, t, int(y), p) for a, t, y, p in rows],
        "action int, target int, y int, p double",
    )
    r = ips_policy_value(df, "action", "y", "target", "p").collect()[0]
    assert r["ips_value"] == r["logged_value"]
    assert abs(r["snips_value"] - r["logged_value"]) < 1e-15


def test_ips_never_matched_snips_null(spark):
    df = spark.createDataFrame(
        [(1, 0, 1, 0.5), (1, 0, 0, 0.5)], "action int, target int, y int, p double"
    )
    r = ips_policy_value(df, "action", "y", "target", "p").collect()[0]
    assert r["ips_value"] == 0.0
    assert r["snips_value"] is None


def test_source_divergence_min_count_floor(spark):
    """The vocabulary floor drops tail terms symmetrically; retained
    probabilities stay exact (totals pre-floor), so identical sources
    still read 0 and the floored TV never exceeds the unfloored."""
    a = ["x x x y", "x z"]
    b = ["x x w w", "x z"]
    rows = [("A", d) for d in a] + [("B", d) for d in b]
    df = spark.createDataFrame(rows, "source string, text string")
    full = source_divergence(df, "text", "source").collect()[0]
    floored = source_divergence(df, "text", "source", min_count=2).collect()[0]
    assert floored["n_terms"] < full["n_terms"]
    assert floored["tv"] <= full["tv"] + 1e-15
    same = spark.createDataFrame(
        [("A", d) for d in a] + [("B", d) for d in a],
        "source string, text string",
    )
    r = source_divergence(same, "text", "source", min_count=2).collect()[0]
    assert r["tv"] == 0.0


def test_source_divergence_floored_out_pair_still_emitted(spark):
    """A pair whose every term falls below the floor keeps its row
    (n_terms = 0, metrics 0.0) — the one-row-per-pair contract."""
    rows = [("A", "aa bb"), ("B", "cc dd")]  # all counts are 1
    df = spark.createDataFrame(rows, "source string, text string")
    out = source_divergence(df, "text", "source", min_count=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_terms"] == 0 and r["tv"] == 0.0 and r["hellinger"] == 0.0
