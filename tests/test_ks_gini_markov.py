"""Tests for ks_statistic, Gini query arithmetic, and cluster-canonical
survivor selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.operators.dq import ks_statistic


def test_ks_identical_samples_zero(spark):
    df = spark.createDataFrame([(float(i % 10),) for i in range(100)], ["x"])
    r = ks_statistic(df, df, "x", F.floor(F.col("v") / 3)).collect()[0]
    assert r.d_num == 0 and r.ks == 0.0


def test_ks_disjoint_samples_one(spark):
    a = spark.createDataFrame([(float(i),) for i in range(50)], ["x"])
    b = spark.createDataFrame([(float(i + 1000),) for i in range(70)], ["x"])
    r = ks_statistic(a, b, "x", F.floor(F.col("v") / 100)).collect()[0]
    assert r.ks == 1.0 and (r.n_a, r.n_b) == (50, 70)


def test_ks_matches_brute_force(spark):
    import itertools

    av = [1.0, 2.0, 2.0, 5.0, 9.0, 9.0, 12.0]
    bv = [2.0, 3.0, 3.0, 8.0, 9.0, 15.0]
    a = spark.createDataFrame([(v,) for v in av], ["x"])
    b = spark.createDataFrame([(v,) for v in bv], ["x"])
    r = ks_statistic(a, b, "x", F.floor(F.col("v") / 4)).collect()[0]
    n, m = len(av), len(bv)
    d = max(
        abs(sum(1 for x in av if x <= t) * m - sum(1 for x in bv if x <= t) * n)
        for t in sorted(set(av + bv))
    )
    assert r.d_num == d
    assert r.ks == d / (n * m)


def test_ks_bucket_granularity_invariant(spark):
    a = spark.createDataFrame([(float(i * 7 % 50),) for i in range(80)], ["x"])
    b = spark.createDataFrame([(float(i * 11 % 60),) for i in range(90)], ["x"])
    r1 = ks_statistic(a, b, "x", F.floor(F.col("v") / 5)).collect()[0]
    r2 = ks_statistic(a, b, "x", F.floor(F.col("v") / 17)).collect()[0]
    assert (r1.d_num, r1.ks) == (r2.d_num, r2.ks)


def test_gini_extremes(spark, sf_small):
    # All-equal incomes -> Gini ~ 0 (exactly (n-1)/n deviation-free
    # formula gives (2*sum(i*x) - (n+1)*n*x) / (n*n*x) = (n-1)/n - ...):
    # for x_i = c: 2*c*n(n+1)/2 - (n+1)*n*c = 0.
    from etl_java_spark.operators.transforms import assign_global_ids

    n = 40
    eq = spark.createDataFrame([(i, 100) for i in range(n)], ["k", "cents"])
    ranked = assign_global_ids(eq, ["cents", "k"], F.floor(F.col("cents") / 50), id_col="i")
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("total"),
        F.sum(F.col("i") * F.col("cents")).alias("weighted"),
    ).collect()[0]
    gini_num = 2 * agg.weighted - (agg.n + 1) * agg.total
    assert gini_num == 0
    # One person owns everything -> Gini = (n-1)/n
    one = spark.createDataFrame(
        [(i, 0) for i in range(n - 1)] + [(n - 1, 1000)], ["k", "cents"]
    )
    ranked = assign_global_ids(one, ["cents", "k"], F.floor(F.col("cents") / 500), id_col="i")
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("total"),
        F.sum(F.col("i") * F.col("cents")).alias("weighted"),
    ).collect()[0]
    gini = (2 * agg.weighted - (agg.n + 1) * agg.total) / (agg.n * agg.total)
    assert abs(gini - (n - 1) / n) < 1e-12


def test_markov_probabilities_rows_sum_to_one(spark, sf_small):
    import sys

    sys.path.insert(0, "/root/repo")
    from etl_java_spark import queries as Q

    out = Q.QUERIES["q188_markov_transitions"](spark, sf_small)
    sums = out.groupBy("prev_type").agg(F.sum("p").alias("s")).collect()
    for r in sums:
        assert abs(r.s - 1.0) < 1e-9
