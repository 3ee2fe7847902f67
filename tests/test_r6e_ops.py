"""Round-6e wave: t-closeness (exact-integer ordered EMD) and the
Zipf's-law log-log fit."""

from __future__ import annotations

import math

import pytest

from etl_java_spark.operators.corpus import zipf_fit
from etl_java_spark.operators.dq import t_closeness


# ---------------------------------------------------------------------------
# t_closeness


def _emd_reference(group_rows, all_rows, cats):
    """Ordered EMD between the group's and global sensitive shares."""
    m = len(cats)
    n_g, n = len(group_rows), len(all_rows)
    cum, s = 0.0, 0.0
    for c in cats:
        p = sum(1 for r in group_rows if r == c) / n_g
        q = sum(1 for r in all_rows if r == c) / n
        cum += p - q
        s += abs(cum)
    return s / (m - 1)


def test_t_closeness_identical_distribution_zero(spark):
    # both groups have the exact global mix -> EMD 0
    rows = [("g1", s) for s in ("a", "b", "c")] * 2 + [
        ("g2", s) for s in ("a", "b", "c")
    ] * 4
    df = spark.createDataFrame(rows, ["g", "sv"])
    out = {r["g"]: r for r in t_closeness(df, ["g"], "sv", t=0.2).collect()}
    assert out["g1"]["emd"] == 0.0 and not out["g1"]["violates_t"]
    assert out["g2"]["emd"] == 0.0


def test_t_closeness_skewed_group_flagged(spark):
    # global mix is uniform over a/b/c; g2 is all-'a' (homogeneous)
    rows = (
        [("g1", s) for s in ("a", "b", "c")] * 10 + [("g2", "a")] * 30
    )
    df = spark.createDataFrame(rows, ["g", "sv"])
    out = {r["g"]: r for r in t_closeness(df, ["g"], "sv", t=0.2).collect()}
    all_rows = [sv for _, sv in rows]
    g2 = [sv for g, sv in rows if g == "g2"]
    ref = _emd_reference(g2, all_rows, ["a", "b", "c"])
    assert abs(out["g2"]["emd"] - ref) < 1e-9
    assert out["g2"]["violates_t"]
    g1 = [sv for g, sv in rows if g == "g1"]
    assert abs(out["g1"]["emd"] - _emd_reference(g1, all_rows, ["a", "b", "c"])) < 1e-9


def test_t_closeness_ordinal_distance_matters(spark):
    # EMD is ORDINAL: against a ~uniform global mix, a group
    # concentrated on the extreme category 'c' (EMD 1/2) is farther
    # than one concentrated on the middle category 'b' (EMD 1/3) —
    # a frequency-only distance would score them identically.
    rows = (
        [("mid", "b")] * 6
        + [("ext", "c")] * 6
        + [("base", s) for s in ("a", "b", "c")] * 200
    )
    df = spark.createDataFrame(rows, ["g", "sv"])
    out = {r["g"]: r["emd"] for r in t_closeness(df, ["g"], "sv").collect()}
    all_rows = [sv for _, sv in rows]
    for g in ("mid", "ext"):
        grp = [sv for gg, sv in rows if gg == g]
        assert abs(out[g] - _emd_reference(grp, all_rows, ["a", "b", "c"])) < 1e-9
    assert out["ext"] > out["mid"]


# ---------------------------------------------------------------------------
# zipf_fit


def _zipf_docs(spark, freqs):
    """One doc containing each synthetic token repeated per its freq."""
    words = []
    for i, f in enumerate(freqs):
        words.extend([f"tok{i:04d}"] * f)
    return spark.createDataFrame([(" ".join(words),)], ["text"])


def test_zipf_exact_power_law_recovers_slope(spark):
    # freq(r) = round(1000 * r^-1) is near-exactly slope -1 in log-log
    freqs = [max(1, round(1000 / r)) for r in range(1, 51)]
    df = _zipf_docs(spark, freqs)
    r = zipf_fit(df, "text", top_n=50).collect()[0]
    assert r["n_terms"] == 50
    assert r["top_freq"] == 1000
    assert abs(r["slope"] + 1.0) < 0.05
    # intercept ~ ln(1000)
    assert abs(r["intercept"] - math.log(1000)) < 0.1


def test_zipf_flat_distribution_zero_slope(spark):
    freqs = [7] * 30
    r = zipf_fit(_zipf_docs(spark, freqs), "text", top_n=30).collect()[0]
    assert r["slope"] == 0.0  # all y identical -> zero regression slope


def test_zipf_matches_numpy_polyfit(spark):
    import numpy as np

    freqs = [500, 300, 200, 120, 80, 50, 30, 20, 10, 5]
    r = zipf_fit(_zipf_docs(spark, freqs), "text", top_n=10).collect()[0]
    ranks = np.arange(1, 11)
    slope, intercept = np.polyfit(np.log(ranks), np.log(sorted(freqs, reverse=True)), 1)
    assert abs(r["slope"] - slope) < 1e-9
    assert abs(r["intercept"] - intercept) < 1e-9
