"""Round-7 wave-8: high-water-mark incremental ingest."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_java_spark.sources.readers import read_incremental


def _ts(d):
    return dt.datetime(2024, 1, d)


def _df(spark, days):
    return spark.createDataFrame(
        [(d, _ts(d)) for d in days], "k long, ts timestamp"
    )


def test_hwm_cold_start_reads_all_and_sets_bookmark(spark, tmp_path):
    bm = str(tmp_path / "bm")
    out = read_incremental(spark, _df(spark, [1, 2, 3]), bm, "ts")
    assert out.count() == 3
    assert spark.read.parquet(bm).collect()[0]["bookmark"] == _ts(3)


def test_hwm_second_load_gets_only_strict_tail(spark, tmp_path):
    bm = str(tmp_path / "bm")
    read_incremental(spark, _df(spark, [1, 2, 3]), bm, "ts")
    out = read_incremental(spark, _df(spark, [1, 2, 3, 4, 5]), bm, "ts")
    assert sorted(r["k"] for r in out.collect()) == [4, 5]
    assert spark.read.parquet(bm).collect()[0]["bookmark"] == _ts(5)


def test_hwm_rerun_with_no_new_rows_is_noop(spark, tmp_path):
    bm = str(tmp_path / "bm")
    read_incremental(spark, _df(spark, [1, 2]), bm, "ts")
    out = read_incremental(spark, _df(spark, [1, 2]), bm, "ts")
    assert out.count() == 0
    # bookmark did NOT regress or vanish
    assert spark.read.parquet(bm).collect()[0]["bookmark"] == _ts(2)


def test_hwm_equal_timestamp_rows_not_repeated(spark, tmp_path):
    """Strictly-above semantics: a row AT the bookmark never repeats."""
    bm = str(tmp_path / "bm")
    read_incremental(spark, _df(spark, [1, 2]), bm, "ts")
    df = spark.createDataFrame(
        [(99, _ts(2)), (3, _ts(3))], "k long, ts timestamp"
    )
    out = read_incremental(spark, df, bm, "ts")
    assert [r["k"] for r in out.collect()] == [3]


def test_hwm_two_phase_advance(spark, tmp_path):
    """advance=False leaves the bookmark untouched until the explicit
    commit — the at-least-once half of the delivery contract."""
    from etl_java_spark.sources.readers import advance_bookmark

    bm = str(tmp_path / "bm")
    read_incremental(spark, _df(spark, [1, 2]), bm, "ts")
    batch = read_incremental(spark, _df(spark, [1, 2, 3]), bm, "ts",
                             advance=False)
    assert [r["k"] for r in batch.collect()] == [3]
    # not advanced: a re-extract re-delivers the same batch
    again = read_incremental(spark, _df(spark, [1, 2, 3]), bm, "ts",
                             advance=False)
    assert [r["k"] for r in again.collect()] == [3]
    advance_bookmark(spark, batch, bm, "ts")
    done = read_incremental(spark, _df(spark, [1, 2, 3]), bm, "ts")
    assert done.count() == 0
