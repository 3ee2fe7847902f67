"""Tests for triangle_count, grid_self_join, and the count-min sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.operators.graph import triangle_count
from etl_java_spark.operators.sketch import cms_build, cms_estimate, cms_merge
from etl_java_spark.operators.spatial import grid_self_join


def test_triangle_count_hand_graph(spark):
    # K4 on {1,2,3,4} has 4 triangles; a pendant edge (4,5) adds none.
    # Feed duplicates, both directions, and a self-loop — all ignored.
    edges = [(u, v) for u in range(1, 5) for v in range(1, 5) if u != v]
    edges += [(4, 5), (5, 4), (4, 5), (3, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    r = triangle_count(df).collect()[0]
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (5, 7, 4)


def test_triangle_count_no_triangles(spark):
    # A path graph 1-2-3-4 has wedges but no triangles.
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    assert triangle_count(df).collect()[0].n_triangles == 0


def test_triangle_count_hub_star_plus_rim(spark):
    # A star with a rim edge: hub 0 to 1..6, plus (1,2) -> exactly 1
    # triangle no matter how skewed the hub degree is.
    edges = [(0, i) for i in range(1, 7)] + [(1, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert triangle_count(df).collect()[0].n_triangles == 1


def test_grid_self_join_matches_brute_force(spark, sf_small):
    c = spark.read.parquet(f"{sf_small}/customer.parquet").limit(200)
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (F.col("c_custkey") % 97).cast("double").alias("x"),
        (F.col("c_custkey") % 89).cast("double").alias("y"),
    ).cache()
    r = 3.0
    got = {
        (p.id_a, p.id_b)
        for p in grid_self_join(pts, "id", "x", "y", r).collect()
    }
    a = pts.select(
        F.col("id").alias("ia"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = pts.select(
        F.col("id").alias("ib"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    d2 = (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    want = {
        (p.ia, p.ib)
        for p in a.crossJoin(b)
        .filter((F.col("ia") < F.col("ib")) & (d2 <= r * r))
        .collect()
    }
    assert got == want and len(got) > 0


def test_grid_self_join_no_duplicate_pairs(spark):
    # Points straddling cell borders must not be reported twice.
    rows = [(1, 0.99, 0.0), (2, 1.01, 0.0), (3, 2.0, 2.0)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    out = grid_self_join(df, "id", "x", "y", 1.0).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert sorted(pairs) == [(1, 2)]
    assert len(set(pairs)) == len(pairs)


def test_cms_overestimates_and_merges(spark, sf_small):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    sk = cms_build(li, "l_partkey", width=128, depth=3)
    exact = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count("*").alias("exact")
    )
    est = cms_estimate(sk, exact, "k", width=128, depth=3)
    rows = est.collect()
    n = li.count()
    # CMS never underestimates, and the error is bounded in aggregate
    assert all(r.est >= r.exact for r in rows)
    assert sum(r.est - r.exact for r in rows) <= 3 * n  # loose sanity bound
    # Linearity: sketch(half1) + sketch(half2) == sketch(all), cell-wise
    h1 = cms_build(li.filter(F.col("l_orderkey") % 2 == 0), "l_partkey", 128, 3)
    h2 = cms_build(li.filter(F.col("l_orderkey") % 2 == 1), "l_partkey", 128, 3)
    merged = cms_merge(h1, h2)
    diff = merged.exceptAll(sk).unionAll(sk.exceptAll(merged))
    assert diff.count() == 0
