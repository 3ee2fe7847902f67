"""Round-7 wave-4 operators: largest-remainder proration, bijective
pseudonymization, inferred dim members, rolling correlation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_java_spark.operators.timeseries import rolling_corr
from etl_java_spark.operators.transforms import (
    PSEUDONYM_P,
    prorate_integer,
    pseudonymize_key,
)
from etl_java_spark.sinks.writers import inferred_dim_members


# ---------------------------------------------------------------------------
# proration


def _py_prorate(weights, total):
    W = sum(w for _, w in weights)
    if W <= 0:
        return {k: 0 for k, _ in weights}
    base = {k: (total * w) // W for k, w in weights}
    rem = sorted(
        ((total * w) % W, k) for k, w in weights
    )
    deficit = total - sum(base.values())
    out = dict(base)
    for _, k in sorted(rem, key=lambda t: (-t[0], t[1]))[:deficit]:
        out[k] += 1
    return out


def test_prorate_sums_exactly_and_matches_python(spark):
    weights = [("a", 3), ("b", 3), ("c", 1), ("d", 0)]
    df = spark.createDataFrame(
        [("g1", k, w) for k, w in weights], "g string, id string, w long"
    )
    rows = {r["id"]: r["alloc"] for r in
            prorate_integer(df, ["g"], "w", 100, "id").collect()}
    assert sum(rows.values()) == 100
    assert rows == _py_prorate(weights, 100)
    assert rows["d"] == 0  # zero weight gets nothing


def test_prorate_tie_breaks_by_id(spark):
    # equal weights, total not divisible: extras go to lowest ids
    df = spark.createDataFrame(
        [("g", x, 1) for x in ["p", "q", "r"]], "g string, id string, w long"
    )
    rows = {r["id"]: r["alloc"] for r in
            prorate_integer(df, ["g"], "w", 10, "id").collect()}
    assert rows == {"p": 4, "q": 3, "r": 3}


def test_prorate_zero_weight_group_allocates_zero(spark):
    df = spark.createDataFrame(
        [("g", "a", 0), ("g", "b", None)], "g string, id string, w long"
    )
    rows = prorate_integer(df, ["g"], "w", 50, "id").collect()
    assert all(r["alloc"] == 0 for r in rows)


def test_prorate_independent_groups(spark):
    df = spark.createDataFrame(
        [("g1", "a", 1), ("g1", "b", 2), ("g2", "c", 5)],
        "g string, id string, w long",
    )
    out = prorate_integer(df, ["g"], "w", 7, "id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], 0)
        by_g[r["g"]] += r["alloc"]
    assert by_g == {"g1": 7, "g2": 7}


# ---------------------------------------------------------------------------
# pseudonymization


def test_pseudonym_bijective_on_sample(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    out = df.select(pseudonymize_key("k", 7).alias("p"))
    assert out.distinct().count() == 5000
    rng = out.agg(F.min("p"), F.max("p")).collect()[0]
    assert rng[0] >= 0 and rng[1] < PSEUDONYM_P


def test_pseudonym_stable_and_salted(spark):
    df = spark.createDataFrame([(123,)], "k long")
    a = df.select(pseudonymize_key("k", 42).alias("p")).collect()[0]["p"]
    b = df.select(pseudonymize_key("k", 42).alias("p")).collect()[0]["p"]
    c = df.select(pseudonymize_key("k", 43).alias("p")).collect()[0]["p"]
    assert a == b
    assert a != c
    assert a != 123  # actually masked


def test_pseudonym_preserves_fk_join(spark):
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    fact = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    pd_ = dim.select(pseudonymize_key("k").alias("p"), "v")
    pf = fact.select(pseudonymize_key("k").alias("p"))
    assert pf.join(pd_, "p").count() == 3


# ---------------------------------------------------------------------------
# inferred members


def test_inferred_members_placeholders(spark):
    dim = spark.createDataFrame(
        [(1, "alpha", 10), (2, "beta", 20)], "k long, name string, attr long"
    )
    fact = spark.createDataFrame([(1,), (3,), (3,), (4,)], "fk long")
    out = inferred_dim_members(
        dim, fact, "k", "fk", defaults={"name": "Unknown"}
    ).orderBy("k").collect()
    assert [(r["k"], r["name"], r["attr"], r["__inferred"]) for r in out] == [
        (1, "alpha", 10, False),
        (2, "beta", 20, False),
        (3, "Unknown", None, True),
        (4, "Unknown", None, True),
    ]


def test_inferred_members_noop_when_dim_complete(spark):
    dim = spark.createDataFrame([(1, "a")], "k long, name string")
    fact = spark.createDataFrame([(1,), (1,)], "fk long")
    out = inferred_dim_members(dim, fact, "k", "fk").collect()
    assert len(out) == 1 and out[0]["__inferred"] is False


def test_inferred_members_then_merge_backfills(spark, tmp_path):
    """The Kimball loop: placeholder first, real row overwrites later
    via merge_by_pk on the same key."""
    from etl_java_spark.sinks.writers import merge_by_pk

    path = str(tmp_path / "dim")
    dim = spark.createDataFrame([(1, "alpha")], "k long, name string")
    fact = spark.createDataFrame([(1,), (9,)], "fk long")
    inferred = inferred_dim_members(
        dim, fact, "k", "fk", defaults={"name": "Unknown"}
    ).drop("__inferred")
    inferred.write.parquet(path)
    late = spark.createDataFrame([(9, "gamma")], "k long, name string")
    merge_by_pk(spark, late, path, ["k"])
    rows = {r["k"]: r["name"] for r in spark.read.parquet(path).collect()}
    assert rows == {1: "alpha", 9: "gamma"}


# ---------------------------------------------------------------------------
# rolling correlation


def _py_rolling_corr(xs, ys, w=3):
    out = []
    for i in range(len(xs)):
        if i + 1 < w:
            out.append(None)
            continue
        x, y = xs[i - w + 1: i + 1], ys[i - w + 1: i + 1]
        n = float(w)
        sx, sy = sum(x), sum(y)
        sxx = sum(v * v for v in x)
        syy = sum(v * v for v in y)
        sxy = sum(a * b for a, b in zip(x, y))
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            out.append(None)
        else:
            out.append((n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)))
    return out


def test_rolling_corr_matches_python(spark):
    xs = [1.0, 2.0, 3.0, 2.5, 4.0, 5.0]
    ys = [2.0, 2.5, 3.5, 3.0, 5.0, 4.5]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(zip(xs, ys))],
        "t long, x double, y double",
    )
    got = [r["corr"] for r in
           rolling_corr(df, "t", "x", "y", 3).orderBy("t").collect()]
    want = _py_rolling_corr(xs, ys, 3)
    for g, w in zip(got, want):
        if w is None:
            assert g is None
        else:
            assert abs(g - w) < 1e-12


def test_rolling_corr_constant_series_null(spark):
    df = spark.createDataFrame(
        [(i, 5.0, float(i)) for i in range(5)], "t long, x double, y double"
    )
    got = rolling_corr(df, "t", "x", "y", 3).collect()
    assert all(r["corr"] is None for r in got)


def test_rolling_corr_perfect_correlation(spark):
    df = spark.createDataFrame(
        [(i, float(i), 2.0 * i + 1) for i in range(6)],
        "t long, x double, y double",
    )
    got = [r["corr"] for r in
           rolling_corr(df, "t", "x", "y", 4).orderBy("t").collect()]
    assert all(abs(c - 1.0) < 1e-12 for c in got[3:])
