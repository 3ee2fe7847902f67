"""Tests for welch_t, drift_chisq, shuffle_positions, cms_inner_product."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_java_spark.operators.dq import drift_chisq
from etl_java_spark.operators.experiments import ab_assign, welch_t
from etl_java_spark.operators.sampling import shuffle_positions
from etl_java_spark.operators.sketch import cms_build, cms_inner_product


def test_welch_t_matches_closed_form(spark):
    # Two hand-built groups routed through the real hash assignment:
    # pick unit ids that land in variant 0 / 1 respectively.
    ids0 = []
    ids1 = []
    k = 0
    while len(ids0) < 4 or len(ids1) < 4:
        k += 1
        v = ((k % 1000000007) * 2654435761 % 1000000007 * 524287) % 1000000007 % 10000 % 2
        (ids0 if v == 0 else ids1).append(k)
    a_vals = [10.0, 12.0, 11.0, 13.0]
    b_vals = [20.0, 22.0, 21.0, 23.0]
    rows = [(u, x) for u, x in zip(ids0[:4], a_vals)] + [
        (u, x) for u, x in zip(ids1[:4], b_vals)
    ]
    df = spark.createDataFrame(rows, ["unit", "metric"])
    r = welch_t(df, "unit", "metric", scale=100).collect()[0]
    assert (r.n_a, r.n_b) == (4, 4)
    # closed form in cent units
    av = [x * 100 for x in a_vals]
    bv = [x * 100 for x in b_vals]
    ma, mb = sum(av) / 4, sum(bv) / 4
    va = sum((x - ma) ** 2 for x in av) / 3
    vb = sum((x - mb) ** 2 for x in bv) / 3
    t = (ma - mb) / math.sqrt(va / 4 + vb / 4)
    assert r.mean_a == ma and r.mean_b == mb
    assert abs(r.var_a - va) < 1e-6 and abs(r.var_b - vb) < 1e-6
    assert abs(r.t_welch - t) < 1e-9


def test_ab_assign_balanced(spark):
    ids = spark.range(1, 10001).withColumnRenamed("id", "user_id")
    per = (
        ids.select(ab_assign("user_id").alias("v"))
        .groupBy("v")
        .count()
        .collect()
    )
    counts = {r.v: r["count"] for r in per}
    assert set(counts) == {0, 1}
    total = sum(counts.values())
    assert abs(counts[0] / total - 0.5) < 0.02


def test_drift_chisq_identical_distributions(spark):
    # Same distribution on both sides -> expected == observed -> chisq 0.
    rows = [(i, float(i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = drift_chisq(df, df, F.col("v").cast("long")).collect()
    assert len(out) == 5
    assert all(r.chisq == 0.0 for r in out)
    assert all(r.expected_after == r.n_after for r in out)


def test_drift_chisq_one_sided_bin_surfaces_null(spark):
    before = spark.createDataFrame([(1, 0), (2, 0)], ["id", "b"])
    after = spark.createDataFrame([(3, 0), (4, 1)], ["id", "b"])
    out = {r.bin: r for r in drift_chisq(before, after, F.col("b")).collect()}
    assert out[1].n_before is None and out[1].chisq is None
    assert out[0].n_before == 2 and out[0].n_after == 1


def test_shuffle_positions_permutation_and_stability(spark, sf_small):
    d = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "source"
    )
    n = d.count()
    out = shuffle_positions(d, "doc_id")
    pos = [r.shuffle_pos for r in out.collect()]
    assert sorted(pos) == list(range(1, n + 1))  # a true permutation
    again = shuffle_positions(d.repartition(9), "doc_id")
    a = {(r.doc_id, r.shuffle_pos) for r in out.collect()}
    b = {(r.doc_id, r.shuffle_pos) for r in again.collect()}
    assert a == b
    # and it actually shuffles: positions are not the id order
    ordered = [
        r.shuffle_pos
        for r in out.orderBy("doc_id").select("shuffle_pos").collect()
    ]
    assert ordered != sorted(ordered)


def test_cms_inner_product_overestimates_self_join(spark, sf_small):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    sk = cms_build(li, "l_partkey", width=256, depth=3)
    est = cms_inner_product(sk, sk).collect()[0].est
    exact = (
        li.groupBy("l_partkey")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")).alias("x"))
        .collect()[0]
        .x
    )
    assert est >= exact
    # with 256 buckets over ~2k keys the collision inflation is bounded
    assert est <= 3 * exact
