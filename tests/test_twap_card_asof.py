"""Tests for time_weighted_avg, mad_flag pass-through, dataset card,
and SCD2 as-of reconstruction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_java_spark.operators.dq import mad_flag
from etl_java_spark.operators.timeseries import time_weighted_avg


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_twap_hand_computed(spark):
    # value 10 held 30s, then 20 held 10s -> twap = (10*30+20*10)/40 = 12.5
    rows = [
        ("u", _ts("2024-01-01 00:00:00"), 1, 10.0),
        ("u", _ts("2024-01-01 00:00:30"), 2, 20.0),
        ("u", _ts("2024-01-01 00:00:40"), 3, 99.0),  # final: no duration
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "seq", "v"])
    out = time_weighted_avg(df, "k", "ts", "v", seq_cols=["seq"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_intervals == 2 and r.total_seconds == 40
    assert r.twap == (1000 * 30 + 2000 * 10) / 40  # cents units


def test_twap_single_observation_emits_nothing(spark):
    df = spark.createDataFrame(
        [("u", _ts("2024-01-01 00:00:00"), 1, 5.0)], ["k", "ts", "seq", "v"]
    )
    assert time_weighted_avg(df, "k", "ts", "v", seq_cols=["seq"]).count() == 0


def test_twap_burst_does_not_overcount(spark):
    # 100 rapid ticks at value 100 within 100s, then one value 0 held
    # for a day: plain AVG ~ 99, TWAP ~ 0.1.
    rows = [
        ("u", _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=i), i, 100.0)
        for i in range(100)
    ] + [
        ("u", _ts("2024-01-01 00:01:40"), 100, 0.0),
        ("u", _ts("2024-01-02 00:01:40"), 101, 0.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "seq", "v"])
    r = time_weighted_avg(df, "k", "ts", "v", seq_cols=["seq"]).collect()[0]
    plain_avg = 100.0 * 100 / 102
    assert r.twap / 100 < 1.0 < plain_avg  # twap back to natural units


def test_mad_flag_preserves_columns(spark):
    rows = [("g", h, float(v)) for h, v in enumerate([5, 5, 6, 7, 500])]
    df = spark.createDataFrame(rows, ["g", "hour", "v"])
    out = mad_flag(df, "g", "v", k=3).collect()
    assert {r.hour for r in out} == {0, 1, 2, 3, 4}
    flagged = [r for r in out if r.is_outlier]
    assert len(flagged) == 1 and flagged[0].hour == 4


def test_dataset_card_shares_sum_to_one(spark, sf_small):
    import sys

    sys.path.insert(0, "/root/repo")
    from etl_java_spark import queries as Q

    rows = Q.QUERIES["q189_dataset_card"](spark, sf_small).collect()
    assert abs(sum(r.corpus_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.top_lang_n <= r.n_docs and r.n_langs >= 1


def test_scd2_asof_matches_latest_before_cut(spark, sf_small):
    import sys

    sys.path.insert(0, "/root/repo")
    from etl_java_spark import queries as Q

    out = Q.QUERIES["q192_scd2_asof"](spark, sf_small)
    # exactly one state per user among users that had any non-deleted
    # change before the cut
    per_user = out.groupBy("user_id").count().collect()
    assert per_user and all(r["count"] == 1 for r in per_user)
