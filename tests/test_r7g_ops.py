"""Round-7 wave-7: deterministic negative sampling, DP noisy counts."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_java_spark.operators.dq import dp_noisy_counts
from etl_java_spark.operators.sampling import key_bucket, negative_samples
from etl_java_spark.operators.sketch import misra_gries_summary


def _frames(spark):
    inter = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 12)], "u long, item long"
    )
    items = spark.createDataFrame(
        [(i,) for i in range(10, 30)], "item long"
    )
    return inter, items


def test_negatives_never_sample_positives(spark):
    inter, items = _frames(spark)
    out = negative_samples(inter, items, "u", "item", k=4).collect()
    pos = {(1, 10), (1, 11), (2, 10), (3, 12)}
    assert all((r["user"], r["item"]) not in pos for r in out)


def test_negatives_k_per_user_and_items_exist(spark):
    inter, items = _frames(spark)
    out = negative_samples(inter, items, "u", "item", k=4).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user"], []).append(r["item"])
        assert 10 <= r["item"] < 30
    assert all(len(v) == 4 for v in by_user.values())
    assert set(by_user) == {1, 2, 3}


def test_negatives_deterministic_under_repartition(spark):
    inter, items = _frames(spark)
    a = sorted(
        map(tuple, negative_samples(inter, items, "u", "item", k=4).collect())
    )
    b = sorted(
        map(
            tuple,
            negative_samples(
                inter.repartition(7), items.repartition(3), "u", "item", k=4
            ).collect(),
        )
    )
    assert a == b


def test_negatives_salt_changes_draws(spark):
    inter, items = _frames(spark)
    a = sorted(
        (r["user"], r["item"])
        for r in negative_samples(inter, items, "u", "item", k=4).collect()
    )
    b = sorted(
        (r["user"], r["item"])
        for r in negative_samples(
            inter, items, "u", "item", k=4, salt=99
        ).collect()
    )
    assert a != b


def test_negatives_id_gaps_tolerated(spark):
    inter = spark.createDataFrame([(1, 100)], "u long, item long")
    items = spark.createDataFrame(
        [(i,) for i in range(100, 140, 4)], "item long"  # 75% gaps
    )
    out = negative_samples(inter, items, "u", "item", k=3, oversample=10)
    rows = out.collect()
    assert all(r["item"] % 4 == 0 for r in rows)
    assert len(rows) <= 3


# ---------------------------------------------------------------------------
# DP noisy counts


def _py_laplace(key: int, salt: int, eps: float) -> float:
    p = 1_000_000_007
    h = ((key + salt) % p) * 2654435761 % p * 524287 % p % 1_000_000
    u = (h + 0.5) / 1_000_000.0
    c = u - 0.5
    return -(1.0 / eps) * math.copysign(1.0, c) * math.log(1.0 - 2.0 * abs(c))


def test_dp_noise_matches_python_inverse_cdf(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 1, 2), ("b", 2, 3)], "g string, k long, x long"
    )
    rows = {r["g"]: r for r in
            dp_noisy_counts(df, "g", "k", epsilon=0.5, salt=11).collect()}
    assert rows["a"]["n_true"] == 2 and rows["b"]["n_true"] == 1
    for g, key in [("a", 1), ("b", 2)]:
        want = rows[g]["n_true"] + _py_laplace(key, 11, 0.5)
        assert abs(rows[g]["n_noisy"] - want) < 1e-9, g


def test_dp_noise_scales_with_epsilon(spark):
    df = spark.createDataFrame([("a", 1, 1)], "g string, k long, x long")
    n1 = dp_noisy_counts(df, "g", "k", epsilon=1.0).collect()[0]
    n2 = dp_noisy_counts(df, "g", "k", epsilon=2.0).collect()[0]
    noise1 = n1["n_noisy"] - n1["n_true"]
    noise2 = n2["n_noisy"] - n2["n_true"]
    assert abs(noise1 - 2.0 * noise2) < 1e-12  # b = 1/eps halves


def test_dp_noise_distribution_is_centered(spark):
    """Mean noise over many groups is near 0 and both signs occur —
    the calibration smoke test for the inverse-CDF mapping."""
    df = spark.createDataFrame(
        [(f"g{k}", k, 0) for k in range(500)], "g string, k long, x long"
    )
    rows = dp_noisy_counts(df, "g", "k", epsilon=1.0).collect()
    noises = [r["n_noisy"] - r["n_true"] for r in rows]
    assert min(noises) < 0 < max(noises)
    assert abs(sum(noises) / len(noises)) < 0.3


def test_dp_negative_group_key_still_releases(spark):
    """Signed surrogate keys must not ship NULL counts (review
    finding: the sign-following hash input escaped ln's domain)."""
    df = spark.createDataFrame([("a", -5, 1)], "g string, k long, x long")
    r = dp_noisy_counts(df, "g", "k", epsilon=1.0).collect()[0]
    assert r["n_noisy"] is not None


def test_mg_null_keys_excluded_and_bound_over_nonnull(spark):
    rows = [(None,)] * 40 + [(1,)] * 30 + [(int(i),) for i in range(100, 130)]
    df = spark.createDataFrame(rows, "key long").repartition(5)
    est = {r["key"]: r["est"]
           for r in misra_gries_summary(df, "key", k=8).collect()}
    assert None not in est
    n_nonnull = 60
    assert 1 in est  # 30 > 60/9: guaranteed over the non-null stream
    assert est[1] <= 30 and 30 - est[1] <= n_nonnull / 9 + 1e-9


# ---------------------------------------------------------------------------
# Neyman allocation


def test_neyman_matches_python_and_sums_exactly(spark):
    import math as _m

    from etl_java_spark.operators.experiments import neyman_allocation

    rows = (
        [("tight", 100.0 + (i % 3) * 0.5) for i in range(50)]
        + [("wide", 100.0 + (i % 20) * 25.0) for i in range(50)]
        + [("const", 42.0) for _ in range(30)]
    )
    df = spark.createDataFrame(rows, "s string, v double")
    out = {r["stratum"]: r for r in
           neyman_allocation(df, "s", "v", 200).collect()}
    assert sum(r["alloc"] for r in out.values()) == 200
    # python reference sigmas
    def sigma(vals):
        n = len(vals)
        m = sum(vals) / n
        return _m.sqrt(sum((x - m) ** 2 for x in vals) / n)
    by = {}
    for s, v in rows:
        by.setdefault(s, []).append(v)
    for s, vals in by.items():
        assert abs(out[s]["sigma"] - sigma(vals)) < 1e-9, s
    # zero-variance stratum gets nothing; the volatile one dominates
    assert out["const"]["alloc"] == 0
    assert out["wide"]["alloc"] > out["tight"]["alloc"]
    # weights prop to N*sigma: check the split against the reference
    ws = {s: round(len(v) * sigma(v) * 1e6) for s, v in by.items()}
    tw = sum(ws.values())
    base = {s: (200 * w) // tw for s, w in ws.items()}
    rem = sorted(((200 * ws[s]) % tw, s) for s in ws)
    deficit = 200 - sum(base.values())
    want = dict(base)
    for _, s in sorted(rem, key=lambda t: (-t[0], t[1]))[:deficit]:
        want[s] += 1
    assert {s: out[s]["alloc"] for s in want} == want


# ---------------------------------------------------------------------------
# duplicate transactions


def test_duplicate_transactions_pairs_and_chain(spark):
    import datetime as _dt

    from etl_java_spark.operators.dq import duplicate_transactions

    d = lambda day: _dt.datetime(2024, 1, day)  # noqa: E731
    rows = [
        # chain of three same-amount charges within the window
        ("c1", 100.0, d(1), 1), ("c1", 100.0, d(5), 2), ("c1", 100.0, d(8), 3),
        # same amount but outside the window
        ("c1", 100.0, d(25), 4),
        # different amount: never paired
        ("c1", 999.0, d(2), 5),
        # different customer, same amount/date: never paired
        ("c2", 100.0, d(1), 6),
    ]
    df = spark.createDataFrame(rows, "cust string, amt double, ts timestamp, id long")
    out = duplicate_transactions(
        df, ["cust"], "amt", "ts", "id", window_days=10
    ).collect()
    pairs = sorted((r["id_a"], r["id_b"]) for r in out)
    assert pairs == [(1, 2), (2, 3)]  # chain emits adjacent pairs only
    gaps = {(r["id_a"], r["id_b"]): r["gap_days"] for r in out}
    assert gaps == {(1, 2): 4, (2, 3): 3}


def test_duplicate_transactions_null_keys_excluded(spark):
    import datetime as _dt

    from etl_java_spark.operators.dq import duplicate_transactions

    rows = [
        ("c1", None, _dt.datetime(2024, 1, 1), 1),
        ("c1", None, _dt.datetime(2024, 1, 2), 2),   # NULL amounts: no pair
        (None, 5.0, _dt.datetime(2024, 1, 1), 3),
        (None, 5.0, _dt.datetime(2024, 1, 2), 4),    # NULL key: no pair
    ]
    df = spark.createDataFrame(rows, "cust string, amt double, ts timestamp, id long")
    assert duplicate_transactions(df, ["cust"], "amt", "ts", "id").count() == 0


def test_neyman_weight_overflow_raises(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    from etl_java_spark.operators.experiments import neyman_allocation

    df = spark.createDataFrame(
        [("s", float(i % 2) * 1e9) for i in range(4)], "g string, v double"
    )
    with pytest.raises(Exception) as ei:
        # weight_scale large enough that total * w overflows int64
        neyman_allocation(df, "g", "v", 10**6, weight_scale=10**12).collect()
    # either the in-plan guard (w <= int64/total) or ANSI's own
    # CAST_OVERFLOW on the weight column — both are LOUD, never silent
    msg = str(ei.value)
    assert "weight exceeds" in msg or "OVERFLOW" in msg.upper()


# ---------------------------------------------------------------------------
# Wilson CI + BH-FDR


def test_wilson_matches_python(spark):
    import math as _m

    from etl_java_spark.operators.experiments import wilson_ci

    rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)] * 1 + [("b", 0)] * 9
    df = spark.createDataFrame(rows, "g string, y int")
    out = {r["group"]: r for r in wilson_ci(df, "g", "y").collect()}

    def py_wilson(k, n, z=1.959963984540054):
        p = k / n
        denom = 1 + z * z / n
        c = (p + z * z / (2 * n)) / denom
        h = z * _m.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        return max(c - h, 0.0), min(c + h, 1.0)

    for g, k, n in [("a", 8, 10), ("b", 1, 10)]:
        lo, hi = py_wilson(k, n)
        assert abs(out[g]["ci_lo"] - lo) < 1e-12
        assert abs(out[g]["ci_hi"] - hi) < 1e-12
        assert out[g]["ci_lo"] <= out[g]["rate"] <= out[g]["ci_hi"]


def test_wilson_extreme_rates_nonzero_width(spark):
    """At p-hat = 0 or 1 the Wald interval is width 0; Wilson is not."""
    from etl_java_spark.operators.experiments import wilson_ci

    df = spark.createDataFrame([("g", 1)] * 20, "g string, y int")
    r = wilson_ci(df, "g", "y").collect()[0]
    assert r["rate"] == 1.0
    assert r["ci_lo"] < 1.0 and r["ci_hi"] == 1.0


def test_normal_sf_accuracy():
    import math as _m

    from etl_java_spark.operators.experiments import _INV_SQRT_2PI, _PHI_B, _PHI_P

    def py_sf(x):
        t = 1.0 / (1.0 + _PHI_P * x)
        poly = 0.0
        for b in reversed(_PHI_B):
            poly = poly * t + b
        poly *= t
        return _INV_SQRT_2PI * _m.exp(-0.5 * x * x) * poly

    # vs the exact normal tail via erfc
    for x in [0.0, 0.5, 1.0, 1.645, 1.96, 2.58, 3.5]:
        exact = 0.5 * _m.erfc(x / _m.sqrt(2.0))
        assert abs(py_sf(x) - exact) < 7.5e-8, x


def test_bh_fdr_step_up_rule(spark):
    from etl_java_spark.operators.experiments import bh_fdr

    # classic example: m=5, q=0.25 -> thresholds .05,.10,.15,.20,.25
    rows = [("t1", 0.01), ("t2", 0.04), ("t3", 0.16), ("t4", 0.18), ("t5", 0.9)]
    df = spark.createDataFrame(rows, "k string, p double")
    out = {r["k"]: r for r in bh_fdr(df, ["k"], "p", q=0.25).collect()}
    # largest i with p(i) <= i*q/m is i=4 (0.18 <= 0.20): t1-t4 flagged
    # even though t3 (0.16 > 0.15) fails its OWN threshold — step-up
    assert [out[k]["discovery"] for k in ["t1", "t2", "t3", "t4", "t5"]] == [
        True, True, True, True, False
    ]


def test_bh_fdr_nothing_significant(spark):
    from etl_java_spark.operators.experiments import bh_fdr

    df = spark.createDataFrame(
        [(f"t{i}", 0.5 + i / 100) for i in range(5)], "k string, p double"
    )
    out = bh_fdr(df, ["k"], "p", q=0.05).collect()
    assert all(not r["discovery"] for r in out)


def test_negatives_invariant_to_duplicate_catalog_rows(spark):
    # ADVICE r8: a non-unique item frame must not inflate the catalog
    # cardinality or skew draws — the projection is distinct'd in-plan.
    inter, items = _frames(spark)
    dup_items = items.unionAll(items).unionAll(items.limit(3))
    a = sorted(
        map(tuple, negative_samples(inter, items, "u", "item", k=4).collect())
    )
    b = sorted(
        map(
            tuple,
            negative_samples(inter, dup_items, "u", "item", k=4).collect(),
        )
    )
    assert a == b
