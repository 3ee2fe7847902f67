"""Round-7 wave-5 operators: Pareto frontier (skyline), top-N + OTHER."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from etl_java_spark.operators.relational import (
    pareto_frontier_2d,
    topn_with_other,
)


def _py_frontier(points, min_x=True, max_y=True):
    def dominated(a, b):
        bx = b[1] <= a[1] if min_x else b[1] >= a[1]
        by = b[2] >= a[2] if max_y else b[2] <= a[2]
        strict = (b[1] != a[1]) or (b[2] != a[2])
        return bx and by and strict
    return sorted(
        p[0] for p in points
        if not any(dominated(p, q) for q in points if q[0] != p[0])
    )


def test_pareto_matches_bruteforce(spark):
    pts = [
        (1, 10.0, 5), (2, 12.0, 7), (3, 12.0, 6), (4, 8.0, 3),
        (5, 15.0, 7), (6, 9.0, 5), (7, 20.0, 9), (8, 20.0, 9),
    ]
    df = spark.createDataFrame(pts, "id long, x double, y long")
    got = sorted(
        r["id"]
        for r in pareto_frontier_2d(df, "x", "y", "id").collect()
    )
    assert got == _py_frontier(pts)


def test_pareto_duplicate_points_co_survive(spark):
    pts = [(1, 5.0, 5), (2, 5.0, 5), (3, 6.0, 4)]
    df = spark.createDataFrame(pts, "id long, x double, y long")
    got = sorted(r["id"] for r in pareto_frontier_2d(df, "x", "y", "id").collect())
    assert got == [1, 2]  # twins both survive; (3) dominated


def test_pareto_direction_flags(spark):
    pts = [(1, 1.0, 1), (2, 2.0, 2), (3, 3.0, 3)]
    df = spark.createDataFrame(pts, "id long, x double, y long")
    # maximize x, minimize y: frontier is the anti-diagonal ends
    got = sorted(
        r["id"]
        for r in pareto_frontier_2d(
            df, "x", "y", "id", minimize_x=False, maximize_y=False
        ).collect()
    )
    assert got == [1, 2, 3]  # chain where bigger x always costs bigger y


def test_pareto_single_chain(spark):
    # strictly improving chain: everything on the frontier
    pts = [(i, float(i), 10 - i) for i in range(5)]
    df = spark.createDataFrame(pts, "id long, x double, y long")
    assert pareto_frontier_2d(df, "x", "y", "id").count() == 1
    # min x & max y with inverse relation: only the cheapest+biggest
    # survives... x=0 has y=10 which dominates all (x smaller, y bigger)


def test_topn_other_conserves_total(spark):
    rows = [(f"k{i:02d}", Decimal(i + 1)) for i in range(15) for _ in range(2)]
    df = spark.createDataFrame(rows, "k string, v decimal(10,2)")
    out = topn_with_other(df, "k", F.sum("v"), n=5).collect()
    assert len(out) == 6
    total = sum(Decimal(str(r["measure"])) for r in out)
    assert total == sum(v for _, v in rows)
    assert out[-1]["key"] == "OTHER" and out[-1]["rank"] == 6
    # top-5 are the largest keys
    assert {r["key"] for r in out if r["rank"] <= 5} == {
        "k14", "k13", "k12", "k11", "k10"
    }


def test_topn_other_absent_when_under_n(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    out = topn_with_other(df, "k", F.sum("v"), n=10).collect()
    assert len(out) == 2
    assert all(r["key"] != "OTHER" for r in out)


def test_topn_other_tie_break_by_key(spark):
    df = spark.createDataFrame(
        [("z", 5), ("a", 5), ("m", 5)], "k string, v long"
    )
    out = topn_with_other(df, "k", F.sum("v"), n=2).collect()
    ranks = {r["key"]: r["rank"] for r in out}
    assert ranks == {"a": 1, "m": 2, "OTHER": 3}


def test_pareto_bucketed_matches_unbucketed(spark):
    """The two-phase bucketed running best is result-identical to the
    global-window path on every direction combination."""
    import random

    rnd = random.Random(7)
    pts = [(i, float(rnd.randint(0, 300)), rnd.randint(0, 50))
           for i in range(120)]
    df = spark.createDataFrame(pts, "id long, x double, y long")
    for mx in (True, False):
        for my in (True, False):
            a = sorted(r["id"] for r in pareto_frontier_2d(
                df, "x", "y", "id", minimize_x=mx, maximize_y=my).collect())
            b = sorted(r["id"] for r in pareto_frontier_2d(
                df, "x", "y", "id", minimize_x=mx, maximize_y=my,
                x_bucket=F.floor(F.col("x") / 40)).collect())
            assert a == b, (mx, my)
