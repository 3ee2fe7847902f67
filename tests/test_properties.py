"""Property-based tests (hypothesis) — SURVEY.md §5-6.

Generated rows go into ONE DataFrame per example set (Spark session
startup per example would be prohibitive); examples are capped small.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_java_spark.operators.transforms import transform_expr
from etl_java_spark.sinks.writers import merge_dataframes

TEXT = st.one_of(st.none(), st.text(min_size=0, max_size=30))


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_lower_upper_match_python(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    out = df.select(
        transform_expr("s", "lower").alias("lo"), transform_expr("s", "upper").alias("up")
    ).collect()
    for v, row in zip(values, out):
        if v is None:
            assert row.lo is None and row.up is None  # null passthrough (:529-531)
        else:
            assert row.lo == v.lower() and row.up == v.upper()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.text(max_size=10).filter(lambda s: "\x00" not in s)),
        min_size=1,
        max_size=30,
    )
)
def test_merge_idempotent_and_complete(spark, rows):
    existing = spark.createDataFrame([(i, "orig") for i in range(10)], "id int, v string")
    updates = spark.createDataFrame(rows, "id int, v string")
    once = merge_dataframes(existing, updates, ["id"])
    twice = merge_dataframes(once, updates, ["id"])
    r_once = sorted(tuple(r) for r in once.collect())
    r_twice = sorted(tuple(r) for r in twice.collect())
    assert r_once == r_twice  # idempotency
    # completeness: every key from either side appears exactly once
    keys = {r[0] for r in r_once}
    assert keys == set(range(10)) | {i for i, _ in rows}
    assert len(r_once) == len(keys)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.datetimes(min_value=datetime.datetime(1900, 1, 1),
                                          max_value=datetime.datetime(2100, 1, 1))),
        min_size=1,
        max_size=15,
    )
)
def test_date_parts_match_python(spark, values):
    values = [v.replace(microsecond=0) if v else None for v in values]
    df = spark.createDataFrame([(v,) for v in values], "ts timestamp")
    out = df.select(
        transform_expr("ts", "date", "year").alias("y"),
        transform_expr("ts", "date", "month").alias("m"),
        transform_expr("ts", "date", "hour").alias("h"),
    ).collect()
    for v, row in zip(values, out):
        if v is None:
            assert row.y is None
        else:
            assert (row.y, row.m, row.h) == (v.year, v.month, v.hour)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),                      # pk
            st.integers(0, 20),                     # ts offset (days)
            st.integers(0, 10_000),                 # seq (uniquified below)
            st.sampled_from(["U", "U", "U", "D"]),  # op, deletes rarer
        ),
        min_size=1,
        max_size=30,
    )
)
def test_cdc_snapshot_scd2_consistency(spark, rows):
    """latest_snapshot is idempotent and agrees with scd2_history's
    current versions; SCD2 intervals tile each PK's timeline."""
    from etl_java_spark.operators import cdc

    base = datetime.datetime(2024, 1, 1)
    uniq = [
        (pk, base + datetime.timedelta(days=d), i, op)
        for i, (pk, d, _s, op) in enumerate(rows)
    ]
    log = spark.createDataFrame(uniq, "pk int, ts timestamp, seq long, op string")
    snap = cdc.latest_snapshot(log, ["pk"], "ts", seq_cols=["seq"], op_col="op")
    # idempotence: compacting a compacted snapshot is a no-op
    again = cdc.latest_snapshot(snap, ["pk"], "ts", seq_cols=["seq"], op_col="op")
    assert sorted(map(tuple, snap.collect())) == sorted(map(tuple, again.collect()))
    # agreement: snapshot rows == SCD2 current versions
    hist = cdc.scd2_history(log, ["pk"], "ts", seq_cols=["seq"], op_col="op")
    current = {(r.pk, r.seq) for r in hist.filter(F.col("is_current")).collect()}
    assert {(r.pk, r.seq) for r in snap.collect()} == current
    # tiling: within a PK, ordered versions chain valid_from -> valid_to
    by_pk = {}
    for r in sorted(hist.collect(), key=lambda r: (r.pk, r.valid_from, r.seq)):
        prev = by_pk.get(r.pk)
        if prev is not None:
            assert prev <= r.valid_from  # no overlap beyond shared boundary
        by_pk[r.pk] = r.valid_to if r.valid_to is not None else r.valid_from
