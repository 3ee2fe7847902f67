"""Relational operator tests: as-of join, range join, top-k, pipeline."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_java_spark.operators.relational import (
    anti_join,
    asof_join,
    range_join,
    semi_join,
    top_k_per_group,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:05"), 100.0), ("A", _ts("2024-01-01 10:00:01"), 99.0),
         ("B", _ts("2024-01-01 10:00:03"), 50.0)],
        "sym string, t timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:00"), 98.5), ("A", _ts("2024-01-01 10:00:04"), 99.5),
         ("B", _ts("2024-01-01 10:00:04"), 51.0)],
        "sym string, qt timestamp, bid double",
    )
    out = asof_join(trades, quotes, on="sym", left_time="t", right_time="qt",
                    right_values=["bid"]).collect()
    got = {(r.sym, r.t.isoformat()): r.bid for r in out}
    assert got[("A", "2024-01-01T10:00:05")] == 99.5
    assert got[("A", "2024-01-01T10:00:01")] == 98.5
    assert got[("B", "2024-01-01T10:00:03")] is None  # quote after trade


def test_asof_join_inclusive_and_forward(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 00:00:10"))], "k int, t timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:10"), "same"), (1, _ts("2024-01-01 00:00:20"), "later")],
        "k int, rt timestamp, tag string",
    )
    back = asof_join(left, right, "k", "t", "rt", ["tag"]).collect()
    assert back[0].tag == "same"  # <= inclusive
    fwd = asof_join(left, right, "k", "t", "rt", ["tag"], direction="forward").collect()
    assert fwd[0].tag == "same"  # >= inclusive picks the nearest


def test_range_join_bucketed_matches_broadcast(spark):
    vals = spark.createDataFrame([(float(i),) for i in range(50)], "x double")
    bands = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("mid", 10.0, 30.0), ("hi", 30.0, 50.0)],
        "band string, lo double, hi double",
    )
    bc = range_join(vals, bands, "x", "lo", "hi").groupBy("band").count()
    bk = range_join(vals, bands, "x", "lo", "hi", bucket_width=7.0).groupBy("band").count()
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, bk.collect()))
    assert dict((r.band, r["count"]) for r in bc.collect()) == {"lo": 10, "mid": 20, "hi": 20}


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(3)], "g string, v int"
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc()], k=2).collect()
    got = sorted((r.g, r.v) for r in out)
    assert got == [("a", 8), ("a", 9), ("b", 1), ("b", 2)]


def test_semi_anti(spark):
    l = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    r = spark.createDataFrame([(2,), (3,), (4,)], "k int")
    assert sorted(x.k for x in semi_join(l, r, "k").collect()) == [2, 3]
    assert [x.k for x in anti_join(l, r, "k").collect()] == [1]


def test_pipeline_end_to_end(spark, tmp_path, sf_small):
    from etl_java_spark.plans.pipeline import MergeSink, ParquetSource, Pipeline

    out_path = str(tmp_path / "dest")
    p = Pipeline(
        source=ParquetSource(f"{sf_small}/customer.parquet"),
        select=["c_custkey", "c_name", "c_mktsegment"],
        rename={"c_custkey": "id", "c_name": "name", "c_mktsegment": "segment"},
        transforms=[("segment", "lower"), ("name", "concat", "!")],
        sink=MergeSink(out_path, pks=["id"]),
    )
    p.run(spark)
    got = spark.read.parquet(out_path)
    n = got.count()
    assert n == spark.read.parquet(f"{sf_small}/customer.parquet").count()
    row = got.filter(F.col("id") == got.select(F.min("id")).first()[0]).first()
    assert row.segment == row.segment.lower()
    assert row.name.endswith("!")
    # idempotent merge: run again, same count
    p.run(spark)
    assert spark.read.parquet(out_path).count() == n


def test_skew_report_ranks_hot_keys(spark):
    from etl_java_spark.operators.relational import skew_report

    rows = [(1,)] * 50 + [(2,)] * 30 + [(3,)] * 15 + [(4,)] * 5
    df = spark.createDataFrame(rows, "k int")
    out = skew_report(df, ["k"], top=3).collect()
    assert [(r.k, r.n_rows) for r in out] == [(1, 50), (2, 30), (3, 15)]
    assert abs(out[0].frac - 0.5) < 1e-12


def test_temporal_join_matches_asof_semantics(spark, sf_small):
    """temporal_join against SCD2 history must equal the as-of join
    against the raw change events — two different plans, one answer."""
    from pyspark.sql import functions as F

    from etl_java_spark.operators import cdc as CDC
    from etl_java_spark.operators.relational import asof_join, temporal_join
    from etl_java_spark.sources.readers import normalize_nanos

    ev = normalize_nanos(spark.read.parquet(f"{sf_small}/events.parquet"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "value", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    hist = CDC.scd2_history(clicks, ["user_id"], "ts", seq_cols=["event_id"])
    dim = hist.select(
        "user_id",
        F.col("event_id").alias("state_event_id"),
        "valid_from",
        "valid_to",
    )
    via_temporal = temporal_join(
        purchases, dim, on="user_id", fact_time="ts"
    ).select("event_id", "state_event_id")
    via_asof = asof_join(
        purchases,
        clicks.select(
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("state_event_id"),
        ),
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        right_values=["state_event_id"],
        right_order=["state_event_id"],
    ).select("event_id", "state_event_id")
    a = {(r.event_id, r.state_event_id) for r in via_temporal.collect()}
    b = {(r.event_id, r.state_event_id) for r in via_asof.collect()}
    assert a == b and a
