"""Sink semantics tests (SURVEY.md §2A #13-#16)."""

from __future__ import annotations

from etl_java_spark.sinks.writers import (
    insert_if_absent,
    insert_if_absent_dataframes,
    merge_by_pk,
    merge_dataframes,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_dataframes_upsert(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    updates = spark.createDataFrame([(2, "B"), (3, "C")], "id int, v string")
    out = merge_dataframes(existing, updates, ["id"])
    assert _rows(out) == [(1, "a"), (2, "B"), (3, "C")]


def test_merge_idempotent(spark):
    # merge applied twice ≡ once (upsert idempotency, SURVEY §5-6)
    existing = spark.createDataFrame([(1, "a")], "id int, v string")
    updates = spark.createDataFrame([(1, "A"), (2, "B")], "id int, v string")
    once = merge_dataframes(existing, updates, ["id"])
    twice = merge_dataframes(once, updates, ["id"])
    assert _rows(once) == _rows(twice)


def test_merge_by_pk_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    merge_by_pk(spark, base, path, ["id"])
    upd = spark.createDataFrame([(2, "B"), (3, "C")], "id int, v string")
    merge_by_pk(spark, upd, path, ["id"])
    assert _rows(spark.read.parquet(path)) == [(1, "a"), (2, "B"), (3, "C")]


def test_insert_if_absent_all_columns(spark):
    existing = spark.createDataFrame([(1, "a")], "id int, v string")
    new = spark.createDataFrame([(1, "a"), (1, "x"), (2, "b"), (2, "b")], "id int, v string")
    out = insert_if_absent_dataframes(existing, new)
    # (1,'a') already present; (2,'b') deduped within batch (§7 hard-part b)
    assert _rows(out) == [(1, "x"), (2, "b")]


def test_insert_if_absent_path(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    a = spark.createDataFrame([(1, "a")], "id int, v string")
    insert_if_absent(spark, a, path)
    b = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    insert_if_absent(spark, b, path)
    assert _rows(spark.read.parquet(path)) == [(1, "a"), (2, "b")]
