"""Round-6b wave: evaluation metrics (OLS, ROC-AUC, calibration/ECE,
Cohen's kappa, conformal coverage), survival + autocorrelation, the
l-diversity audit, and the simplified silhouette — each checked against
a hand computation or a pure-Python/numpy reference."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_java_spark.operators.dq import l_diversity
from etl_java_spark.operators.evaluation import (
    calibration_report,
    cohens_kappa,
    conformal_coverage,
    ols_regression,
    roc_auc,
)
from etl_java_spark.operators.similarity import simplified_silhouette
from etl_java_spark.operators.timeseries import acf_lags, kaplan_meier


# ---------------------------------------------------------------------------
# ols_regression


def test_ols_exact_plane_recovered(spark):
    # y = 2 + 3*x1 + 0.5*x2 with zero noise -> exact coefficients, r2 = 1
    rows = [
        (float(x1), float(x2), 2.0 + 3.0 * x1 + 0.5 * x2)
        for x1 in range(1, 7)
        for x2 in (0, 4, 10)
    ]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    r = ols_regression(df, "y", "x1", "x2").collect()[0]
    assert r["n_rows"] == 18
    assert abs(r["beta0"] - 2.0) < 1e-9
    assert abs(r["beta1"] - 3.0) < 1e-9
    assert abs(r["beta2"] - 0.5) < 1e-9
    assert abs(r["r2"] - 1.0) < 1e-12


def test_ols_matches_numpy_lstsq(spark):
    rng = [
        (1.0, 2.0, 5.1), (2.0, 1.0, 7.9), (3.0, 4.0, 12.2), (4.0, 2.0, 13.8),
        (5.0, 6.0, 19.1), (6.0, 3.0, 19.9), (7.0, 8.0, 26.2), (8.0, 5.0, 26.8),
    ]
    df = spark.createDataFrame(rng, ["x1", "x2", "y"])
    r = ols_regression(df, "y", "x1", "x2", scale=2).collect()[0]
    X = np.array([[1.0, a, b] for a, b, _ in rng])
    y = np.array([c for _, _, c in rng])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    assert abs(r["beta0"] - beta[0]) < 1e-8
    assert abs(r["beta1"] - beta[1]) < 1e-8
    assert abs(r["beta2"] - beta[2]) < 1e-8
    pred = X @ beta
    r2 = 1.0 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert abs(r["r2"] - r2) < 1e-8


# ---------------------------------------------------------------------------
# roc_auc


def _auc_pairwise(pairs):
    """O(n^2) reference: P(score_pos > score_neg) + 0.5 * P(tie)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_perfect_and_random(spark):
    perfect = [(float(s), 1 if s >= 5 else 0) for s in range(10)]
    df = spark.createDataFrame(perfect, ["s", "y"])
    assert roc_auc(df, "y", "s").collect()[0]["auc"] == 1.0
    # identical score for everyone -> AUC 0.5 by the tie convention
    flat = [(1.0, y) for y in (0, 1, 0, 1, 1)]
    r = roc_auc(spark.createDataFrame(flat, ["s", "y"]), "y", "s").collect()[0]
    assert r["auc"] == 0.5


def test_auc_with_ties_matches_pairwise_reference(spark):
    pairs = [
        (0.1, 0), (0.4, 0), (0.4, 1), (0.35, 0), (0.8, 1),
        (0.8, 0), (0.8, 1), (0.9, 1), (0.2, 0), (0.35, 1),
    ]
    df = spark.createDataFrame(pairs, ["s", "y"])
    r = roc_auc(df, "y", "s").collect()[0]
    assert abs(r["auc"] - _auc_pairwise(pairs)) < 1e-12
    assert r["n_pos"] == 5 and r["n_neg"] == 5


def test_auc_quantize_floors_scores(spark):
    # quantize=1 buckets 0.34/0.36 -> 3, creating a tie
    pairs = [(0.34, 0), (0.36, 1), (0.9, 1)]
    df = spark.createDataFrame(pairs, ["s", "y"])
    exact = roc_auc(df, "y", "s").collect()[0]["auc"]
    q = roc_auc(df, "y", "s", quantize=1).collect()[0]["auc"]
    assert exact == 1.0 and q == 0.75


# ---------------------------------------------------------------------------
# calibration_report


def test_calibration_hand_case(spark):
    # bin 0: scores .0/.05, 1 pos of 2 -> conf .025, acc .5
    # bin 9: scores .95/1.0 (1.0 clamps into bin 9), both pos
    rows = [(0.00, 1), (0.05, 0), (0.95, 1), (1.00, 1)]
    df = spark.createDataFrame(rows, ["s", "y"])
    out = {r["bin"]: r for r in calibration_report(df, "y", "s").collect()}
    assert set(out) == {0, 9}
    assert out[0]["n"] == 2 and out[0]["n_pos"] == 1
    assert abs(out[0]["conf"] - 0.025) < 1e-12
    assert abs(out[0]["acc"] - 0.5) < 1e-12
    assert out[9]["n"] == 2 and out[9]["n_pos"] == 2
    # ece = (|1 - .05| + |2 - 1.95|) / 4
    assert abs(out[0]["ece"] - (0.95 + 0.05) / 4) < 1e-12
    assert out[0]["ece"] == out[9]["ece"]


# ---------------------------------------------------------------------------
# cohens_kappa


def test_kappa_textbook_2x2(spark):
    # classic: 20 both-yes, 15 A-only, 5 B-only, 10 both-no
    rows = (
        [(1, 1)] * 20 + [(1, 0)] * 15 + [(0, 1)] * 5 + [(0, 0)] * 10
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    r = cohens_kappa(df, "a", "b").collect()[0]
    n, na, nb = 50, 35, 25
    po = (20 + 10) / n
    pe = (na * nb + (n - na) * (n - nb)) / (n * n)
    assert abs(r["po"] - po) < 1e-12
    assert abs(r["pe"] - pe) < 1e-12
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-12


def test_kappa_perfect_and_independent(spark):
    perfect = [(1, 1)] * 5 + [(0, 0)] * 5
    r = cohens_kappa(spark.createDataFrame(perfect, ["a", "b"]), "a", "b")
    assert r.collect()[0]["kappa"] == 1.0
    # independent marginals -> kappa ~ 0
    indep = [(a, b) for a in (0, 1) for b in (0, 1)]
    r2 = cohens_kappa(spark.createDataFrame(indep, ["a", "b"]), "a", "b")
    assert abs(r2.collect()[0]["kappa"]) < 1e-12


# ---------------------------------------------------------------------------
# conformal_coverage


def test_conformal_hand_case(spark):
    # cal scores 1..10 (ids 0..9, even -> cal? use explicit flag col)
    rows = [(float(i), 1) for i in range(1, 11)] + [
        (0.5, 0), (5.0, 0), (9.5, 0), (11.0, 0)
    ]
    df = spark.createDataFrame(rows, ["s", "cal"])
    r = conformal_coverage(
        df, "s", F.col("cal") == 1, alpha=0.1
    ).collect()[0]
    # k = min(ceil(11 * 0.9), 10) = 10 -> threshold = 10.0
    assert r["n_cal"] == 10 and r["n_test"] == 4
    assert r["k"] == 10 and r["threshold"] == 10.0
    assert abs(r["coverage"] - 3 / 4) < 1e-12


def test_conformal_threshold_is_order_statistic(spark):
    # alpha=0.5, n_cal=4 -> k = ceil(5 * .5) = 3 -> 3rd smallest
    rows = [(10.0, 1), (30.0, 1), (20.0, 1), (40.0, 1), (25.0, 0)]
    df = spark.createDataFrame(rows, ["s", "cal"])
    r = conformal_coverage(df, "s", F.col("cal") == 1, alpha=0.5).collect()[0]
    assert r["k"] == 3 and r["threshold"] == 30.0 and r["coverage"] == 1.0


# ---------------------------------------------------------------------------
# kaplan_meier


def test_km_textbook_curve(spark):
    # durations: events at t=1 (1 of 5), t=3 (1 of 3); censored at 2, 4; +1 more at t=3 censored
    # rows: (1,e) (2,c) (3,e) (3,c) (4,c)
    rows = [(1, 1), (2, 0), (3, 1), (3, 0), (4, 0)]
    df = spark.createDataFrame(rows, ["dur", "ev"])
    out = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_risk"] == 5 and out[1]["n_event"] == 1
    assert abs(out[1]["survival"] - 4 / 5) < 1e-12
    # at t=3: at risk = 3 (the t=2 censor already removed)
    assert out[3]["n_risk"] == 3 and out[3]["n_censored"] == 1
    assert abs(out[3]["survival"] - (4 / 5) * (2 / 3)) < 1e-12


def test_km_no_censoring_matches_empirical_survival(spark):
    durs = [1, 1, 2, 3, 3, 3, 5]
    df = spark.createDataFrame([(d, 1) for d in durs], ["dur", "ev"])
    out = {r["t"]: r["survival"] for r in kaplan_meier(df, "dur", "ev").collect()}
    n = len(durs)
    for t in sorted(set(durs)):
        surv = sum(1 for d in durs if d > t) / n
        assert abs(out[t] - surv) < 1e-12


# ---------------------------------------------------------------------------
# acf_lags


def test_acf_alternating_series(spark):
    # +1 -1 +1 -1 ... -> lag1 = -1, lag2 = +1
    rows = [(i, 100.0 if i % 2 == 0 else -100.0) for i in range(20)]
    df = spark.createDataFrame(rows, ["i", "v"])
    out = {r["lag"]: r for r in acf_lags(df, "i", "v", max_lag=2).collect()}
    assert abs(out[1]["acf"] + 1.0) < 1e-9
    assert abs(out[2]["acf"] - 1.0) < 1e-9
    assert out[1]["n_pairs"] == 19 and out[2]["n_pairs"] == 18


def test_acf_matches_numpy_pairwise_pearson(spark):
    vals = [3.0, 7.0, 4.0, 9.0, 12.0, 5.0, 8.0, 15.0, 6.0, 11.0]
    df = spark.createDataFrame(list(enumerate(vals)), ["i", "v"])
    out = {r["lag"]: r["acf"] for r in acf_lags(df, "i", "v", max_lag=3).collect()}
    arr = np.array(vals)
    for k in (1, 2, 3):
        ref = np.corrcoef(arr[k:], arr[:-k])[0, 1]
        assert abs(out[k] - ref) < 1e-9


# ---------------------------------------------------------------------------
# l_diversity


def test_l_diversity_flags_homogeneous_group(spark):
    rows = (
        [("g1", "a")] * 4
        + [("g2", "a"), ("g2", "b"), ("g2", "c"), ("g2", "a")]
    )
    df = spark.createDataFrame(rows, ["q", "sv"])
    out = {r["q"]: r for r in l_diversity(df, ["q"], "sv", l=3).collect()}
    assert out["g1"]["violates_l"] and out["g1"]["n_distinct_sensitive"] == 1
    assert out["g1"]["top_value"] == "a" and out["g1"]["top_share"] == 1.0
    assert not out["g2"]["violates_l"]
    # tie-break: counts a=2, b=1, c=1 -> top a with share 0.5
    assert out["g2"]["top_value"] == "a" and abs(out["g2"]["top_share"] - 0.5) < 1e-12


def test_l_diversity_top_value_tiebreak_is_smallest(spark):
    rows = [("g", "b"), ("g", "a")]
    out = l_diversity(
        spark.createDataFrame(rows, ["q", "sv"]), ["q"], "sv", l=2
    ).collect()[0]
    assert out["top_value"] == "a"  # equal counts -> lexicographically first


# ---------------------------------------------------------------------------
# simplified_silhouette


def _sil_reference(points, labels):
    """Pure-python simplified silhouette (centroid-based)."""
    import collections

    by_lab = collections.defaultdict(list)
    for p, l in zip(points, labels):
        by_lab[l].append(p)
    cents = {
        l: [sum(xs) / len(xs) for xs in zip(*ps)] for l, ps in by_lab.items()
    }

    def dist(p, c):
        return math.sqrt(sum((x - m) ** 2 for x, m in zip(p, c)))

    per_lab = collections.defaultdict(list)
    for p, l in zip(points, labels):
        a = dist(p, cents[l])
        b = min(dist(p, c) for ll, c in cents.items() if ll != l)
        s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
        per_lab[l].append(s)
    return {l: sum(v) / len(v) for l, v in per_lab.items()}


def test_silhouette_separable_clusters_near_one(spark):
    pts = [[0.0, 0.1], [0.1, 0.0], [0.0, 0.0], [9.0, 9.1], [9.1, 9.0], [9.0, 9.0]]
    labs = [0, 0, 0, 1, 1, 1]
    rows = [(i, p, l) for i, (p, l) in enumerate(zip(pts, labs))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {
        r["label"]: r for r in
        simplified_silhouette(df, "embedding", "vec_id", "label").collect()
    }
    ref = _sil_reference(pts, labs)
    for l in (0, 1):
        assert abs(out[l]["mean_silhouette"] - ref[l]) < 1e-9
        assert out[l]["mean_silhouette"] > 0.9
        assert out[l]["n_negative"] == 0


def test_silhouette_mixed_point_counted_negative(spark):
    # one label-0 point sits inside cluster 1 -> negative s, flagged
    pts = [[0.0, 0.0], [0.2, 0.0], [9.0, 9.0], [9.0, 9.2], [9.1, 9.1]]
    labs = [0, 0, 1, 1, 0]
    rows = [(i, p, l) for i, (p, l) in enumerate(zip(pts, labs))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {
        r["label"]: r for r in
        simplified_silhouette(df, "embedding", "vec_id", "label").collect()
    }
    ref = _sil_reference(pts, labs)
    assert out[0]["n_negative"] == 1
    for l in (0, 1):
        assert abs(out[l]["mean_silhouette"] - ref[l]) < 1e-9
