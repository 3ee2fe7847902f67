"""Reference-parity semantics tests (SURVEY.md §2A #6-#12).

Edge semantics from /root/reference/src/etl/ETLProcess.java:
null passthrough (:529-531), string coercion for lower/upper/concat
(:534-541), non-date passthrough for date parts (:548-550), unknown date
part passthrough (:564-565), mapping validation (:328-342).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_java_spark.operators.transforms import (
    apply_transforms,
    project,
    rename_map,
    transform_expr,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "Hello World", datetime.datetime(2020, 3, 15, 7, 30), 12.5),
            (2, None, None, None),
            (3, "MIXED case", datetime.datetime(1999, 12, 31, 23, 59), -1.0),
        ],
        "id int, s string, ts timestamp, v double",
    )


def test_lower_upper_null_passthrough(df):
    out = df.select(
        transform_expr("s", "lower").alias("lo"),
        transform_expr("s", "upper").alias("up"),
    ).collect()
    assert out[0].lo == "hello world"
    assert out[0].up == "HELLO WORLD"
    assert out[1].lo is None and out[1].up is None  # :529-531


def test_lower_coerces_non_string(df):
    # reference: valor.toString().toLowerCase() on any type (:534-535)
    out = df.select(transform_expr("v", "lower").alias("x")).collect()
    assert out[0].x == "12.5"


def test_concat_literal_and_null(df):
    out = df.select(transform_expr("s", "concat", "_sfx").alias("x")).collect()
    assert out[0].x == "Hello World_sfx"
    assert out[1].x is None  # null passthrough, not "null_sfx"


def test_concat_literal_with_colon_not_truncated(df):
    # the reference's "concat:<v>" tag re-split on ":" truncates literals
    # containing ":" (:533, :541) — a bug we explicitly do NOT replicate
    out = df.select(transform_expr("s", "concat", "a:b").alias("x")).collect()
    assert out[0].x == "Hello Worlda:b"


def test_date_parts(df):
    out = df.select(
        transform_expr("ts", "date", "year").alias("y"),
        transform_expr("ts", "date", "month").alias("m"),
        transform_expr("ts", "date", "day").alias("d"),
        transform_expr("ts", "date", "hour").alias("h"),
    ).collect()
    assert (out[0].y, out[0].m, out[0].d, out[0].h) == (2020, 3, 15, 7)
    # month is 1-based (reference adds +1 to Calendar.MONTH at :559)
    assert out[2].m == 12
    assert out[1].y is None  # null passthrough


def test_unknown_date_part_passthrough(df):
    out = df.select(transform_expr("ts", "date", "bogus").alias("x")).collect()
    assert out[0].x == datetime.datetime(2020, 3, 15, 7, 30)  # :564-565


def test_apply_transforms_non_date_passthrough(df):
    # date transform on a non-date column passes through unchanged (:548-550)
    out = apply_transforms(df, [("s", "date", "year")]).collect()
    assert out[0].s == "Hello World"


def test_apply_transforms_single_projection(df):
    out = apply_transforms(df, [("s", "lower"), ("v", "concat", "x")])
    rows = out.collect()
    assert rows[0].s == "hello world"
    assert rows[0].v == "12.5x"
    assert out.columns == df.columns


def test_project_validates(df):
    assert project(df, ["id", "s"]).columns == ["id", "s"]
    with pytest.raises(ValueError, match="unknown columns"):
        project(df, ["nope"])
    with pytest.raises(ValueError):
        project(df, [])


def test_rename_map_semantics(df):
    out = rename_map(df, {"id": "key", "s": "txt"})
    assert out.columns == ["key", "txt"]  # unmapped cols dropped (:183-190)
    with pytest.raises(ValueError, match="source column"):
        rename_map(df, {"nope": "x"})
    with pytest.raises(ValueError, match="destination columns"):
        rename_map(df, {"id": "key"}, dest_columns=["other"])  # :328-332
    with pytest.raises(ValueError, match="primary keys"):
        rename_map(df, {"s": "txt"}, dest_columns=["txt", "pk"], dest_pks=["pk"])  # :336-342
