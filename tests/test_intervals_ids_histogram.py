"""Tests for merge_intervals, assign_global_ids, equidepth_histogram."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_java_spark.operators.dq import equidepth_histogram
from etl_java_spark.operators.timeseries import merge_intervals
from etl_java_spark.operators.transforms import assign_global_ids


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def test_merge_intervals_hand_computed(spark):
    rows = [
        # key a: [1,5] [3,7] overlap; [7,9] touches (shared endpoint merges);
        # [11,12] disjoint
        ("a", _d("2020-01-01"), _d("2020-01-05")),
        ("a", _d("2020-01-03"), _d("2020-01-07")),
        ("a", _d("2020-01-07"), _d("2020-01-09")),
        ("a", _d("2020-01-11"), _d("2020-01-12")),
        # key b: containment — [1,10] swallows [2,3]
        ("b", _d("2020-01-01"), _d("2020-01-10")),
        ("b", _d("2020-01-02"), _d("2020-01-03")),
    ]
    df = spark.createDataFrame(rows, ["k", "lo", "hi"])
    out = {
        (r.k, r.lo, r.hi): r.n_merged
        for r in merge_intervals(df, "k", "lo", "hi").collect()
    }
    assert out == {
        ("a", _d("2020-01-01"), _d("2020-01-09")): 3,
        ("a", _d("2020-01-11"), _d("2020-01-12")): 1,
        ("b", _d("2020-01-01"), _d("2020-01-10")): 2,
    }


def test_merge_intervals_containment_does_not_split(spark):
    # A short interval ending BEFORE an earlier long one must not open a
    # new island (the running-max-of-ends, not lag(end), is what makes
    # the sweep correct).
    rows = [
        ("k", 1, 100),
        ("k", 2, 3),
        ("k", 50, 60),
        ("k", 101, 102),
    ]
    df = spark.createDataFrame(rows, ["k", "lo", "hi"])
    got = sorted(
        (r.lo, r.hi, r.n_merged)
        for r in merge_intervals(df, "k", "lo", "hi").collect()
    )
    assert got == [(1, 100, 3), (101, 102, 1)]


def test_assign_global_ids_matches_global_row_number(spark, sf_small):
    o = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    got = assign_global_ids(
        o, ["o_orderkey"], F.floor(F.col("o_orderkey") / 100), id_col="seq_id"
    )
    want = o.withColumn(
        "seq_id", F.row_number().over(Window.orderBy("o_orderkey")).cast("long")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_assign_global_ids_repartition_invariant(spark, sf_small):
    o = spark.read.parquet(f"{sf_small}/orders.parquet").select("o_orderkey")
    a = assign_global_ids(
        o, ["o_orderkey"], F.floor(F.col("o_orderkey") / 64)
    )
    b = assign_global_ids(
        o.repartition(13), ["o_orderkey"], F.floor(F.col("o_orderkey") / 64)
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_assign_global_ids_no_global_window_over_data(spark, sf_small):
    # The only empty-partition-spec window may run over the bucket-counts
    # metadata table, never over the data: the data-side window must carry
    # a partition spec (the bucket column).
    o = spark.read.parquet(f"{sf_small}/orders.parquet").select("o_orderkey")
    out = assign_global_ids(o, ["o_orderkey"], F.floor(F.col("o_orderkey") / 100))
    plan = out._jdf.queryExecution().executedPlan().toString()
    data_windows = [
        ln
        for ln in plan.splitlines()
        if "Window [" in ln and "row_number()" in ln
    ]
    assert data_windows, "expected the partition-local row_number window"
    assert all("partitionbybucket" not in ln for ln in data_windows)
    for ln in data_windows:
        # row_number window spec must include a partition expression
        assert "specifiedwindowframe" in ln.lower() or "windowspecdefinition" in ln.lower()
        assert "__bucket" in ln, f"row_number window not bucket-partitioned: {ln}"


def test_equidepth_bins_are_balanced(spark, sf_small):
    o = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_totalprice", "o_orderkey"
    )
    n = o.count()
    k = 7
    hist = equidepth_histogram(
        o, "o_totalprice", k, ["o_orderkey"], F.floor(F.col("o_totalprice") / 5000)
    ).collect()
    assert len(hist) == k
    sizes = {r.bin: r.n_rows for r in hist}
    assert sum(sizes.values()) == n
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # NTILE puts the larger bins first
    big = [b for b, s in sizes.items() if s == max(sizes.values())]
    assert big == sorted(big) and min(big, default=1) == 1
    # edges are non-decreasing across bins
    ordered = sorted(hist, key=lambda r: r.bin)
    for a, b in zip(ordered, ordered[1:]):
        assert a.hi <= b.lo or abs(a.hi - b.lo) < 1e-9 or a.hi <= b.hi
