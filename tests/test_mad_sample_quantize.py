"""Tests for mad_outliers, weighted_sample, quantize_int8."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_java_spark.operators.dq import mad_outliers
from etl_java_spark.operators.sampling import weighted_sample
from etl_java_spark.operators.similarity import quantize_int8


def test_mad_outliers_hand_computed(spark):
    # values 1..9 plus a wild 1000: median 5.5; deviations from it are
    # {0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5} -> MAD = 2.5;
    # |x-med| > 3*MAD = 7.5 flags only the 1000.
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = mad_outliers(df, "g", "v", k=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_rows == 10
    assert r.med2 == 2 * 550  # 5.5 in doubled cents
    assert r.mad4 == 4 * 250  # 2.5 in quadrupled cents
    assert r.n_outliers == 1


def test_mad_outliers_robust_to_single_extreme(spark):
    # The z-score approach (mean/std) would mask the outlier cluster by
    # inflating sigma; MAD must still flag the far point and nothing else.
    rows = [("g", 10.0)] * 50 + [("g", 10.01)] * 49 + [("g", 10.0 + 1e6)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mad_outliers(df, "g", "v", k=3).collect()[0]
    assert r.n_outliers == 1


def test_weighted_sample_extremes_and_determinism(spark, sf_small):
    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    n = d.count()
    all_in = weighted_sample(d, "doc_id", F.lit(1.0)).count()
    none_in = weighted_sample(d, "doc_id", F.lit(0.0)).count()
    assert all_in == n and none_in == 0
    # ~half survives a 0.5 weight, and the draw is partition-invariant
    half = weighted_sample(d, "doc_id", F.lit(0.5))
    half_ids = {r.doc_id for r in half.select("doc_id").collect()}
    assert abs(len(half_ids) / n - 0.5) < 0.1
    again = weighted_sample(d.repartition(7), "doc_id", F.lit(0.5))
    assert {r.doc_id for r in again.select("doc_id").collect()} == half_ids


def test_weighted_sample_rate_tracks_weight(spark, sf_small):
    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    kept = weighted_sample(d, "doc_id", F.lit(0.25)).count()
    assert abs(kept / d.count() - 0.25) < 0.1


def test_quantize_int8_codes_reconstruct(spark):
    rows = [
        (1, [0.0, -1.0, 5.0]),
        (2, [1.0, 0.0, 5.0]),  # dim 2 degenerate (constant)
        (3, [0.5, 1.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, ["id", "vec"]).withColumn(
        "vec", F.col("vec").cast("array<float>")
    )
    out = {r.id: r.codes for r in quantize_int8(df, "id", "vec").collect()}
    # dim0: range [0,1] -> codes floor(x*255): 0, 255, 127
    assert [out[1][0], out[2][0], out[3][0]] == [0, 255, 127]
    # dim1: range [-1,1] -> floor((x+1)*127.5): -1 -> 0, 0 -> 127, 1 -> 255
    assert [out[1][1], out[2][1], out[3][1]] == [0, 127, 255]
    # degenerate dim codes to 0 everywhere
    assert [out[i][2] for i in (1, 2, 3)] == [0, 0, 0]
    # every vector got codes for every dim, all within [0, 255]
    for codes in out.values():
        assert len(codes) == 3 and all(0 <= c <= 255 for c in codes)


def test_quantize_int8_monotone_within_dim(spark, sf_small):
    e = spark.read.parquet(f"{sf_small}/embeddings.parquet").limit(50)
    q = quantize_int8(e, "vec_id", "embedding")
    joined = (
        e.join(q, "vec_id")
        .select(
            F.expr("embedding[0]").cast("double").alias("x"),
            F.expr("codes[0]").alias("c"),
        )
        .collect()
    )
    pairs = sorted((r.x, r.c) for r in joined if not math.isnan(r.x))
    codes_in_x_order = [c for _, c in pairs]
    assert codes_in_x_order == sorted(codes_in_x_order)
