"""Tests for hashed_features and the sketch set-algebra / IVF
persistence queries."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from etl_java_spark.operators.retrieval import hashed_features


def test_hashed_features_mass_conservation(spark):
    docs = [(1, "a b c a"), (2, "d d d"), (3, "")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in hashed_features(df, dim=8).collect()}
    # token mass is conserved: l1 == token count
    assert out[1].l1 == 4 and out[2].l1 == 3
    # nnz bounded by distinct tokens and by dim
    assert out[1].nnz <= 3 and out[2].nnz == 1
    # an empty doc emits no row (no tokens to hash)
    assert 3 not in out
    # sparse vector is bucket-sorted with positive counts
    f1 = out[1].features
    buckets = [s.bucket for s in f1]
    assert buckets == sorted(buckets)
    assert all(0 <= s.bucket < 8 and s.cnt > 0 for s in f1)


def test_hashed_features_same_token_same_bucket(spark):
    # identical tokens in different docs land in the same bucket —
    # hashing is stateless/global, no per-partition dependence
    docs = [(1, "spark"), (2, "spark spark")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r.features for r in hashed_features(df, dim=16).collect()}
    assert out[1][0].bucket == out[2][0].bucket
    assert out[2][0].cnt == 2


def test_sketch_set_algebra_bounds_hold(spark):
    from etl_java_spark import queries as Q

    r = Q.QUERIES["q197_sketch_set_algebra"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.union_ok and r.intersection_ok
    # inclusion-exclusion consistency of the exact companions
    assert r.exact_union == r.exact_a + r.exact_b - r.exact_intersection


def test_ivf_persistence_counts_complete(spark):
    from etl_java_spark import queries as Q

    rows = Q.QUERIES["q198_ivf_index_persistence"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    n_vecs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert sum(r.n_members for r in rows) == n_vecs  # every vector assigned
    assert sum(r.n_queries for r in rows) == 5  # all 5 probes accounted for
    assert all(0 <= r.cell < 8 for r in rows)
