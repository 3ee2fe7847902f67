"""Round-7 wave-6: business-day arithmetic, schema-evolving MERGE."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_java_spark.functions.dates import business_days_between
from etl_java_spark.sinks.writers import (
    align_schemas_evolve,
    merge_by_pk_evolve,
)


def _py_busdays(d1: dt.date, d2: dt.date, holidays=()):
    """Independent reference: literal day loop over (d1, d2]."""
    sign = 1
    if d2 < d1:
        d1, d2, sign = d2, d1, -1
    hol = {dt.date.fromisoformat(h) for h in holidays}
    n, d = 0, d1
    while d < d2:
        d += dt.timedelta(days=1)
        if d.weekday() < 5 and d not in hol:
            n += 1
    return sign * n


CASES = [
    ("2024-01-01", "2024-01-08"),   # Mon -> next Mon: 5
    ("2024-01-05", "2024-01-08"),   # Fri -> Mon: 1
    ("2024-01-06", "2024-01-07"),   # Sat -> Sun: 0
    ("2024-01-01", "2024-01-01"),   # empty interval: 0
    ("2024-02-29", "2024-03-04"),   # leap day span
    ("2024-01-08", "2024-01-01"),   # reversed: -5
    ("1994-07-01", "1994-07-06"),   # spans the July 4 holiday
    ("1995-12-22", "1996-01-02"),   # spans Christmas + New Year
]
HOLIDAYS = ["1994-07-04", "1995-12-25", "1996-01-01", "2024-01-01"]


@pytest.mark.parametrize("d1,d2", CASES)
def test_business_days_matches_day_loop(spark, d1, d2):
    df = spark.createDataFrame([(d1, d2)], "a string, b string")
    got = df.select(
        business_days_between(
            F.col("a").cast("date"), F.col("b").cast("date"), HOLIDAYS
        ).alias("bd")
    ).collect()[0]["bd"]
    want = _py_busdays(
        dt.date.fromisoformat(d1), dt.date.fromisoformat(d2), HOLIDAYS
    )
    assert got == want, (d1, d2, got, want)


def test_business_days_exhaustive_window(spark):
    """Every (start, end) pair across six weeks vs the day loop."""
    base = dt.date(2024, 3, 1)
    days = [base + dt.timedelta(days=i) for i in range(0, 42, 3)]
    rows = [(str(a), str(b)) for a in days for b in days]
    df = spark.createDataFrame(rows, "a string, b string")
    got = df.select(
        "a", "b",
        business_days_between(
            F.col("a").cast("date"), F.col("b").cast("date")
        ).alias("bd"),
    ).collect()
    for r in got:
        want = _py_busdays(
            dt.date.fromisoformat(r["a"]), dt.date.fromisoformat(r["b"])
        )
        assert r["bd"] == want, (r["a"], r["b"], r["bd"], want)


def test_weekend_holiday_does_not_subtract(spark):
    # 2024-01-06 is a Saturday: listing it must not change the count
    df = spark.createDataFrame([("2024-01-05", "2024-01-10")], "a string, b string")
    plain = df.select(business_days_between(
        F.col("a").cast("date"), F.col("b").cast("date")).alias("bd")
    ).collect()[0]["bd"]
    with_sat = df.select(business_days_between(
        F.col("a").cast("date"), F.col("b").cast("date"), ["2024-01-06"]
    ).alias("bd")).collect()[0]["bd"]
    assert plain == with_sat


# ---------------------------------------------------------------------------
# schema-evolving merge


def test_align_schemas_evolve_widens_both_sides(spark):
    a = spark.createDataFrame([(1, "x")], "k long, u string")
    b = spark.createDataFrame([(2, 9.5)], "k long, w double")
    wa, wb = align_schemas_evolve(a, b)
    assert wa.columns == wb.columns == ["k", "u", "w"]
    assert dict(wa.dtypes)["w"] == "double"
    assert wa.collect()[0]["w"] is None
    assert wb.collect()[0]["u"] is None


def test_align_schemas_evolve_type_conflict_raises(spark):
    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(2, 5)], "k long, v long")
    with pytest.raises(TypeError, match="type conflict on 'v'"):
        align_schemas_evolve(a, b)


def test_merge_by_pk_evolve_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double"
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(2, 22.0, "new"), (3, 30.0, "new")], "k long, v double, tag string"
    )
    merge_by_pk_evolve(spark, updates, path, ["k"])
    rows = {r["k"]: (r["v"], r["tag"]) for r in spark.read.parquet(path).collect()}
    assert rows == {1: (10.0, None), 2: (22.0, "new"), 3: (30.0, "new")}


def test_merge_by_pk_evolve_cold_start(spark, tmp_path):
    path = str(tmp_path / "t2")
    updates = spark.createDataFrame([(1, "a")], "k long, s string")
    merge_by_pk_evolve(spark, updates, path, ["k"])
    assert spark.read.parquet(path).collect()[0]["s"] == "a"


def test_business_days_pre_1970_floor_mod(spark):
    """Sign-following % would return 7 here; floor-mod returns 5
    (review finding — both engines shared the flaw)."""
    df = spark.createDataFrame([("1969-12-26", "1970-01-02")], "a string, b string")
    got = df.select(business_days_between(
        F.col("a").cast("date"), F.col("b").cast("date")).alias("bd")
    ).collect()[0]["bd"]
    assert got == _py_busdays(dt.date(1969, 12, 26), dt.date(1970, 1, 2))
    assert got == 5


def test_business_days_pre_1970_weekend_holiday(spark):
    """1969-12-27 was a Saturday: listing it must not change the count
    (the sign-following form misclassified pre-1970 weekends)."""
    df = spark.createDataFrame([("1969-12-22", "1969-12-31")], "a string, b string")
    plain = df.select(business_days_between(
        F.col("a").cast("date"), F.col("b").cast("date")).alias("bd")
    ).collect()[0]["bd"]
    with_sat = df.select(business_days_between(
        F.col("a").cast("date"), F.col("b").cast("date"), ["1969-12-27"]
    ).alias("bd")).collect()[0]["bd"]
    assert plain == with_sat == _py_busdays(
        dt.date(1969, 12, 22), dt.date(1969, 12, 31)
    )


def test_business_days_sql_twin_pre_1970():
    import duckdb

    from etl_java_spark.functions.dates import business_days_between_sql

    expr = business_days_between_sql("DATE '1969-12-26'", "DATE '1970-01-02'")
    assert duckdb.sql(f"SELECT {expr} AS bd").fetchone()[0] == 5
