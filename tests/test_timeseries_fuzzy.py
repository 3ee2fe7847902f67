"""Gap-fill resampling (operators/timeseries.py) and fuzzy join
(relational.fuzzy_join) semantics."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from etl_java_spark.operators import relational as R
from etl_java_spark.operators.timeseries import resample_gapfill


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 15), 1.0),
        ("a", dt.datetime(2024, 1, 1, 0, 45), 3.0),  # same bucket as above
        ("a", dt.datetime(2024, 1, 1, 3, 10), 5.0),  # 2-hour gap before
        ("b", dt.datetime(2024, 1, 1, 10, 0), 7.0),  # single observation
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_gapfill_grid_and_forward_fill(series):
    out = resample_gapfill(series, "k", "ts", F.avg("v"), "hour")
    rows = {(r["k"], r["bucket"].hour): r for r in out.collect()}
    # key a: 4 hourly buckets 00..03; key b: 1 bucket
    assert len(rows) == 5
    assert rows[("a", 0)]["observed"] == 2.0  # avg of the two in-bucket rows
    assert rows[("a", 1)]["observed"] is None and rows[("a", 1)]["is_gap"]
    assert rows[("a", 1)]["filled"] == 2.0 and rows[("a", 2)]["filled"] == 2.0
    assert rows[("a", 3)]["filled"] == 5.0 and not rows[("a", 3)]["is_gap"]
    assert rows[("b", 10)]["filled"] == 7.0


def test_gapfill_bucket_guard_raises(series):
    out = resample_gapfill(series, "k", "ts", F.avg("v"), "hour", max_buckets_per_key=2)
    with pytest.raises(Exception, match="spans more than 2 hour buckets"):
        out.collect()


def test_fuzzy_join_complete_vs_brute_force(spark):
    left = spark.createDataFrame(
        [("kitten",), ("saturday",), ("zzz",)], "lname string"
    )
    right = spark.createDataFrame(
        [("sitting",), ("sunday",), ("kitten",), ("mitten",), ("abcdefgh",)],
        "rname string",
    )
    for d in (1, 2, 3):
        got = {
            (r["lname"], r["rname"], r["dist"])
            for r in R.fuzzy_join(left, right, "lname", "rname", max_dist=d).collect()
        }
        brute = {
            (r["lname"], r["rname"], r["dist"])
            for r in left.crossJoin(right)
            .withColumn("dist", F.levenshtein("lname", "rname"))
            .filter(F.col("dist") <= d)
            .collect()
        }
        assert got == brute, f"max_dist={d}"


def test_fuzzy_join_rejects_column_overlap(spark):
    df = spark.createDataFrame([("x",)], "name string")
    with pytest.raises(ValueError, match="disjoint"):
        R.fuzzy_join(df, df, "name", "name")


def test_ewma_last_hand_computed(spark):
    from etl_java_spark.operators.timeseries import ewma_last
    from pyspark.sql import functions as F

    # series 1,2,3 with alpha=0.5: 1 -> 1.5 -> 2.25
    df = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (1, 30, 3.0), (2, 10, 5.0)],
        "k int, t int, v double",
    )
    out = {r.k: (r.n_points, r.ewma_last) for r in
           ewma_last(df, "k", ["t"], "v", alpha=0.5).collect()}
    assert out[1] == (3, 2.25)
    assert out[2] == (1, 5.0)


def test_ewma_order_independence_of_input_partitioning(spark):
    from etl_java_spark.operators.timeseries import ewma_last

    rows = [(1, t, float(t % 7)) for t in range(100)]
    df = spark.createDataFrame(rows, "k int, t int, v double")
    a = ewma_last(df, "k", ["t"], "v").collect()[0].ewma_last
    b = ewma_last(df.repartition(13), "k", ["t"], "v").collect()[0].ewma_last
    assert a == b  # sort_array makes the fold order canonical
