"""Property-based tests (hypothesis) for the second round-4 operator
wave: interval merging, global ids, equi-depth bins, KS statistic.

Same convention as test_properties.py: one DataFrame per example,
examples capped small (Spark job startup dominates otherwise).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_java_spark.operators.dq import equidepth_histogram, ks_statistic
from etl_java_spark.operators.timeseries import merge_intervals
from etl_java_spark.operators.transforms import assign_global_ids


def _merge_brute(intervals):
    """Reference merge: sort, sweep, merge on overlap/touch."""
    out = []
    for lo, hi in sorted(intervals):
        if out and lo <= out[-1][1]:
            out[-1][1] = max(out[-1][1], hi)
            out[-1][2] += 1
        else:
            out.append([lo, hi, 1])
    return sorted((lo, hi, n) for lo, hi, n in out)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 20)),
        min_size=1,
        max_size=25,
    )
)
def test_merge_intervals_matches_brute_force(spark, spans):
    intervals = [(lo, lo + w) for lo, w in spans]
    df = spark.createDataFrame(
        [("k", lo, hi) for lo, hi in intervals], ["k", "lo", "hi"]
    )
    got = sorted(
        (r.lo, r.hi, r.n_merged)
        for r in merge_intervals(df, "k", "lo", "hi").collect()
    )
    assert got == _merge_brute(intervals)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=40, unique=True),
    st.integers(1, 200),
)
def test_assign_global_ids_any_bucket_width(spark, keys, width):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    # bucket = floor(k / width) is order-consistent for any width >= 1,
    # including negative keys (floor division rounds toward -inf)
    out = assign_global_ids(df, ["k"], F.floor(F.col("k") / width))
    got = {(r.k, r.seq_id) for r in out.collect()}
    want = {(k, i + 1) for i, k in enumerate(sorted(keys))}
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=3, max_size=60),
    st.integers(2, 7),
)
def test_equidepth_matches_python_ntile(spark, vals, k):
    rows = [(float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["v", "tb"])
    hist = {
        r.bin: r.n_rows
        for r in equidepth_histogram(
            df, "v", k, ["tb"], F.floor(F.col("v") / 50)
        ).collect()
    }
    n = len(vals)
    want: dict[int, int] = {}
    big, r = divmod(n, k)
    for b in range(1, min(k, n) + 1):
        size = big + 1 if b <= r else big
        if size:
            want[b] = size
    assert hist == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=30),
    st.lists(st.integers(0, 60), min_size=1, max_size=30),
)
def test_ks_matches_brute_force_property(spark, av, bv):
    a = spark.createDataFrame([(float(v),) for v in av], ["x"])
    b = spark.createDataFrame([(float(v),) for v in bv], ["x"])
    r = ks_statistic(a, b, "x", F.floor(F.col("v") / 13)).collect()[0]
    n, m = len(av), len(bv)
    d = max(
        abs(
            sum(1 for x in av if x <= t) * m
            - sum(1 for x in bv if x <= t) * n
        )
        for t in sorted(set(av + bv))
    )
    assert (r.n_a, r.n_b, r.d_num) == (n, m, d)
