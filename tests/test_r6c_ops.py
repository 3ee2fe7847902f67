"""Round-6c wave: decision stump (best Gini split), mutual information,
readability counters, reciprocal-rank fusion + L2 top-k, and the
two-proportion z-test — each against a hand computation or a
pure-Python reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_java_spark.functions.text import sentence_count, syllable_count
from etl_java_spark.operators.evaluation import (
    decision_stump,
    mutual_information,
)
from etl_java_spark.operators.experiments import proportion_ztest
from etl_java_spark.operators.retrieval import rrf_fuse
from etl_java_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_l2,
)


# ---------------------------------------------------------------------------
# decision_stump


def test_stump_perfectly_separable(spark):
    # all positives above 5 -> split at 5 is pure
    rows = [(float(s), 1 if s > 5 else 0) for s in range(1, 11)]
    df = spark.createDataFrame(rows, ["s", "y"])
    r = decision_stump(df, "y", "s").collect()[0]
    assert r["threshold"] == 5.0
    assert r["gini_split"] == 0.0
    assert r["n_left"] == 5 and r["pos_left"] == 0
    assert r["n_right"] == 5 and r["pos_right"] == 5
    assert abs(r["gini_root"] - 0.5) < 1e-12
    assert abs(r["gain"] - 0.5) < 1e-12


def _stump_reference(pairs):
    """O(n^2) reference over distinct thresholds (split s <= t)."""
    best = None
    n = len(pairs)
    pos = sum(y for _, y in pairs)
    for t in sorted({s for s, _ in pairs})[:-1]:
        left = [(s, y) for s, y in pairs if s <= t]
        nl, pl = len(left), sum(y for _, y in left)
        nr, pr = n - len(left), pos - pl
        gl = 1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
        gr = 1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
        w = nl / n * gl + nr / n * gr
        if best is None or w < best[0] - 1e-15:
            best = (w, t)
    return best


def test_stump_matches_reference_with_ties(spark):
    pairs = [
        (1.0, 0), (1.0, 1), (2.0, 0), (3.0, 1), (3.0, 1),
        (4.0, 0), (5.0, 1), (5.0, 1), (6.0, 0), (7.0, 1),
    ]
    df = spark.createDataFrame(pairs, ["s", "y"])
    r = decision_stump(df, "y", "s").collect()[0]
    w_ref, t_ref = _stump_reference(pairs)
    assert r["threshold"] == t_ref
    assert abs(r["gini_split"] - w_ref) < 1e-9


# ---------------------------------------------------------------------------
# mutual_information


def test_mi_independent_is_zero(spark):
    rows = [(x, y) for x in ("a", "b") for y in ("u", "v") for _ in range(5)]
    r = mutual_information(
        spark.createDataFrame(rows, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert abs(r["mi"]) < 1e-12
    assert abs(r["h_x"] - math.log(2)) < 1e-9
    assert abs(r["h_y"] - math.log(2)) < 1e-9
    assert abs(r["nmi"]) < 1e-9


def test_mi_deterministic_equals_entropy(spark):
    # y fully determined by x -> MI = H(X) = H(Y), NMI = 1
    rows = [("a", "u")] * 3 + [("b", "v")] * 7
    r = mutual_information(
        spark.createDataFrame(rows, ["x", "y"]), "x", "y"
    ).collect()[0]
    h = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
    assert abs(r["mi"] - h) < 1e-9
    assert abs(r["h_x"] - h) < 1e-9
    assert abs(r["nmi"] - 1.0) < 1e-9


def _mi_reference(rows):
    import collections

    n = len(rows)
    cxy = collections.Counter(rows)
    cx = collections.Counter(x for x, _ in rows)
    cy = collections.Counter(y for _, y in rows)
    return sum(
        c / n * math.log(c * n / (cx[x] * cy[y])) for (x, y), c in cxy.items()
    )


def test_mi_matches_reference_on_skewed_table(spark):
    rows = (
        [("a", "u")] * 6 + [("a", "v")] * 2 + [("b", "u")] * 1
        + [("b", "v")] * 5 + [("c", "u")] * 4
    )
    r = mutual_information(
        spark.createDataFrame(rows, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert abs(r["mi"] - _mi_reference(rows)) < 1e-9
    assert r["n_rows"] == len(rows) and r["n_cells"] == 5


# ---------------------------------------------------------------------------
# readability counters


def test_sentence_and_syllable_counts(spark):
    df = spark.createDataFrame(
        [("Hi there! Two sentences... right?",), ("no terminal punct",), ("",)],
        ["t"],
    )
    out = df.select(
        sentence_count("t").alias("s"), syllable_count("t").alias("y")
    ).collect()
    # "Hi there! Two sentences... right?" -> runs: "!", "...", "?"
    assert out[0]["s"] == 3
    # vowel runs: i, e-e(2: "e", "e"), o(Two), e-e-e(sentences: e, e, e), i(right)
    # hi(1) there(2) two(1) sentences(3) right(1) = 8
    assert out[0]["y"] == 8
    assert out[1]["s"] == 1  # clamped
    assert out[2]["s"] == 1 and out[2]["y"] == 0


# ---------------------------------------------------------------------------
# rrf_fuse + brute_force_topk_l2


def test_l2_topk_orders_by_distance(spark):
    rows = [
        (0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [3.0, 0.0]), (3, [0.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = brute_force_topk_l2(
        df, df.filter(F.col("vec_id") == 0), "embedding", "vec_id", k=3
    ).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(1, 1), (3, 2), (2, 3)]
    assert abs(out[0]["l2_dist"] - 1.0) < 1e-12


def test_rrf_hand_computed(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        ["query_id", "neighbor_id", "rank"],
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], ["query_id", "neighbor_id", "rank"]
    )
    out = {
        r["neighbor_id"]: r
        for r in rrf_fuse(a, b, k=60, top=4).collect()
    }
    # 11: 1/62 + 1/61 ; 10: 1/61 ; 13: 1/62 ; 12: 1/63
    assert abs(out[11]["fused_score"] - (1 / 62 + 1 / 61)) < 1e-12
    assert out[11]["fused_rank"] == 1
    assert abs(out[10]["fused_score"] - 1 / 61) < 1e-12
    assert out[10]["fused_rank"] == 2
    assert out[13]["fused_rank"] == 3  # 1/62 > 1/63
    assert out[12]["fused_rank"] == 4


def test_rrf_agrees_with_cosine_when_rankings_agree(spark):
    # two separable clusters: both metrics rank within-cluster first, so
    # the fused top-1 equals the cosine top-1
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [0.1, 0.9]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qs = df.filter(F.col("vec_id") < 2)
    a = brute_force_topk(df, qs, "embedding", "vec_id", k=3)
    b = brute_force_topk_l2(df, qs, "embedding", "vec_id", k=3)
    fused = rrf_fuse(a, b, top=1).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in fused}
    assert top1 == {0: 1, 1: 0}


# ---------------------------------------------------------------------------
# proportion_ztest


def test_ztest_hand_computed(spark):
    # variant from ab_assign(unit) — build units whose buckets we read
    # back, then check z against the closed formula on those counts
    rows = [(i, 1 if i % 3 == 0 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, ["u", "s"])
    r = proportion_ztest(df, "u", "s").collect()[0]
    from etl_java_spark.operators.experiments import ab_assign

    per = (
        df.select(ab_assign("u").alias("v"), "s")
        .groupBy("v")
        .agg(F.count("*").alias("n"), F.sum("s").alias("x"))
        .collect()
    )
    d = {row["v"]: (row["n"], row["x"]) for row in per}
    na, xa = d[0]
    nb, xb = d[1]
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (na, xa, nb, xb)
    pa, pb = xa / na, xb / nb
    pool = (xa + xb) / (na + nb)
    z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    assert abs(r["z"] - z) < 1e-9


def test_ztest_degenerate_rates_null_z(spark):
    rows = [(i, 1) for i in range(50)]  # everyone converts
    r = proportion_ztest(
        spark.createDataFrame(rows, ["u", "s"]), "u", "s"
    ).collect()[0]
    assert r["z"] is None
    assert r["p_a"] == 1.0 and r["p_b"] == 1.0
