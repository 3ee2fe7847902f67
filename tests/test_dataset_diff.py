"""dataset_diff: snapshot-to-snapshot diff by key + payload fingerprint."""

from __future__ import annotations

from etl_java_spark.operators.incremental import dataset_diff


def _rows(df):
    return {(r[0], r.status) for r in df.collect()}


def test_added_removed_changed(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, s string, v int"
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 99), (4, "d", 40)], "k int, s string, v int"
    )
    assert _rows(dataset_diff(old, new, ["k"])) == {
        (2, "changed"),
        (3, "removed"),
        (4, "added"),
    }


def test_unchanged_rows_dropped(spark):
    df = spark.createDataFrame([(i, i * 2) for i in range(100)], "k int, v int")
    assert dataset_diff(df, df, ["k"]).count() == 0


def test_null_position_shift_detected(spark):
    # xxhash64 skips nulls; (null, 'x') vs ('x', null) must still differ
    old = spark.createDataFrame([(1, None, "x")], "k int, a string, b string")
    new = spark.createDataFrame([(1, "x", None)], "k int, a string, b string")
    assert _rows(dataset_diff(old, new, ["k"])) == {(1, "changed")}


def test_null_to_value_detected(spark):
    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, "v")], "k int, v string")
    assert _rows(dataset_diff(old, new, ["k"])) == {(1, "changed")}


def test_composite_key(spark):
    old = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], "k1 int, k2 int, v string")
    new = spark.createDataFrame([(1, 1, "a"), (1, 3, "c")], "k1 int, k2 int, v string")
    got = {(r.k1, r.k2, r.status) for r in dataset_diff(old, new, ["k1", "k2"]).collect()}
    assert got == {(1, 2, "removed"), (1, 3, "added")}
