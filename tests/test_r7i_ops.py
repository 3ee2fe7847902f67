"""Round-7 wave-9: nested document export, calendar date spine."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_java_spark.operators.timeseries import date_spine
from etl_java_spark.operators.transforms import nest_children


def test_nest_children_ordering_and_empty(spark):
    parent = spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string")
    child = spark.createDataFrame(
        [(1, 3, "z"), (1, 1, "x"), (1, 2, "y")], "k long, seq long, v string"
    )
    out = {
        r["k"]: r
        for r in nest_children(
            parent, child, "k", ["seq", "v"], ["seq"]
        ).collect()
    }
    assert [x["v"] for x in out[1]["items"]] == ["x", "y", "z"]  # seq order
    assert out[2]["items"] == []  # childless parent kept, empty array
    assert out[2]["name"] == "b"


def test_nest_children_deterministic_under_repartition(spark):
    parent = spark.createDataFrame([(1,)], "k long")
    child = spark.createDataFrame(
        [(1, i % 4, f"v{i}") for i in range(20)], "k long, seq long, v string"
    )
    a = nest_children(parent, child, "k", ["seq", "v"], ["seq"]).collect()
    b = nest_children(
        parent, child.repartition(7), "k", ["seq", "v"], ["seq"]
    ).collect()
    assert a == b  # sort_array makes tie order (seq, v) total


def test_date_spine_attributes(spark):
    rows = {r["day"]: r for r in date_spine(spark, "2024-01-01", "2024-01-14").collect()}
    assert len(rows) == 14
    mon = rows[dt.date(2024, 1, 1)]   # 2024-01-01 was a Monday
    assert mon["weekday"] == 0 and not mon["is_weekend"]
    sat = rows[dt.date(2024, 1, 6)]
    assert sat["weekday"] == 5 and sat["is_weekend"]
    assert rows[dt.date(2024, 1, 7)]["weekday"] == 6
    assert mon["quarter"] == 1 and mon["month"] == 1 and mon["year"] == 2024


def test_date_spine_busday_seq_increments_on_weekdays_only(spark):
    rows = date_spine(spark, "2024-01-01", "2024-01-14").orderBy("day").collect()
    for prev, cur in zip(rows, rows[1:]):
        step = cur["busday_seq"] - prev["busday_seq"]
        assert step == (0 if cur["is_weekend"] else 1), cur["day"]


def test_nest_children_sort_only_order_col(spark):
    """An order column NOT exported in child_cols must still drive the
    sort (review finding: it was silently dropped)."""
    parent = spark.createDataFrame([(1,)], "k long")
    child = spark.createDataFrame(
        [(1, 1, "z"), (1, 2, "a")], "k long, line long, sku string"
    )
    out = nest_children(parent, child, "k", ["sku"], ["line"]).collect()[0]
    assert [x["sku"] for x in out["items"]] == ["z", "a"]  # line order
    assert list(out["items"][0].asDict()) == ["sku"]  # sort field stripped


def test_date_spine_pre_1970(spark):
    rows = {r["day"]: r for r in
            date_spine(spark, "1969-12-26", "1970-01-02").collect()}
    # 1969-12-26 was a Friday; 1969-12-28 a Sunday
    assert rows[dt.date(1969, 12, 26)]["weekday"] == 4
    assert rows[dt.date(1969, 12, 28)]["weekday"] == 6
    assert rows[dt.date(1969, 12, 28)]["is_weekend"]
    # busday_seq still increments only on weekdays across the epoch
    days = sorted(rows)
    for a, b in zip(days, days[1:]):
        step = rows[b]["busday_seq"] - rows[a]["busday_seq"]
        assert step == (0 if rows[b]["is_weekend"] else 1), b
