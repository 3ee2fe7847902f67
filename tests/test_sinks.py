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


def _partition_files(path):
    import hashlib
    import os

    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[os.path.relpath(p, path)] = hashlib.md5(
                    open(p, "rb").read()
                ).hexdigest()
    return out


def test_merge_by_pk_partition_pruned(spark, tmp_path):
    """Partitioned MERGE rewrites ONLY touched partitions: untouched
    partitions' files stay byte-identical, results match the unpruned
    semantics, and new partition values are created."""
    path = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, "2024-01", "a"), (2, "2024-01", "b"), (3, "2024-02", "c"), (4, "2024-03", "d")],
        "id int, month string, v string",
    )
    merge_by_pk(spark, base, path, ["id"], partition_by=["month"])
    before = _partition_files(path)
    assert any("month=2024-02" in k for k in before)

    upd = spark.createDataFrame(
        [(2, "2024-01", "B"), (5, "2024-04", "E")], "id int, month string, v string"
    )
    merge_by_pk(spark, upd, path, ["id"], partition_by=["month"])
    after = _partition_files(path)

    untouched_before = {k: v for k, v in before.items() if "month=2024-01" not in k}
    untouched_after = {k: v for k, v in after.items() if "month=2024-01" not in k and "month=2024-04" not in k}
    assert untouched_before == untouched_after  # 2024-02/03 files untouched, byte-identical
    assert any("month=2024-04" in k for k in after)  # new partition created

    got = sorted(tuple(r) for r in spark.read.parquet(path).select("id", "month", "v").collect())
    assert got == [
        (1, "2024-01", "a"), (2, "2024-01", "B"), (3, "2024-02", "c"),
        (4, "2024-03", "d"), (5, "2024-04", "E"),
    ]


def test_merge_by_pk_partitioned_idempotent(spark, tmp_path):
    path = str(tmp_path / "ptbl2")
    base = spark.createDataFrame([(1, "x", "a")], "id int, part string, v string")
    merge_by_pk(spark, base, path, ["id"], partition_by=["part"])
    upd = spark.createDataFrame([(1, "x", "A"), (2, "y", "B")], "id int, part string, v string")
    merge_by_pk(spark, upd, path, ["id"], partition_by=["part"])
    merge_by_pk(spark, upd, path, ["id"], partition_by=["part"])
    got = sorted(tuple(r) for r in spark.read.parquet(path).select("id", "part", "v").collect())
    assert got == [(1, "x", "A"), (2, "y", "B")]


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


def test_stateful_writers_raise_on_unreadable_state(spark, tmp_path):
    # VERDICT r8 #2: a read failure that is NOT a cold start
    # (PATH_NOT_FOUND) must raise, not silently overwrite prior state.
    # Injection: an empty directory fails schema inference with
    # AnalysisException/UNABLE_TO_INFER_SCHEMA — exactly the "transient
    # or corrupt, but the path exists" class.
    import os

    import pytest
    from pyspark.errors import AnalysisException

    from etl_java_spark.sinks.writers import apply_cdc_by_pk, merge_by_pk_evolve

    upd = spark.createDataFrame([(1, "a")], "id int, v string")
    cdc = spark.createDataFrame([(1, "U", 1, "a")], "id int, op string, seq long, v string")
    cases = [
        ("merge", lambda p: merge_by_pk(spark, upd, p, ["id"])),
        ("evolve", lambda p: merge_by_pk_evolve(spark, upd, p, ["id"])),
        ("absent", lambda p: insert_if_absent(spark, upd, p)),
        ("cdc", lambda p: apply_cdc_by_pk(spark, cdc, p, ["id"])),
    ]
    for name, fn in cases:
        bad = str(tmp_path / name)
        os.makedirs(bad)
        with pytest.raises(AnalysisException):
            fn(bad)
        assert os.listdir(bad) == [], f"{name} overwrote unreadable state"


def test_stateful_writers_cold_start_bootstrap(spark, tmp_path):
    # The true cold start (path absent -> PATH_NOT_FOUND) still
    # bootstraps the table instead of raising.
    from etl_java_spark.sinks.writers import apply_cdc_by_pk, read_cdc_state

    cdc = spark.createDataFrame(
        [(1, "U", 1, "a")], "id int, op string, seq long, v string"
    )
    path = str(tmp_path / "cdc_cold")
    apply_cdc_by_pk(spark, cdc, path, ["id"])
    assert _rows(read_cdc_state(spark, path)) == [(1, 1, "a")]
