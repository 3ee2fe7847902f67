"""CDC compaction / SCD2 historization semantics (operators/cdc.py)."""

import datetime as dt

import pytest

from etl_java_spark.operators import cdc


def _ts(s):
    return dt.datetime(2024, 1, s)


@pytest.fixture(scope="module")
def changelog(spark):
    rows = [
        # pk A: two upserts then a delete
        ("A", _ts(1), 1, "U", 1.0),
        ("A", _ts(2), 2, "U", 2.0),
        ("A", _ts(3), 3, "D", None),
        # pk B: single live row
        ("B", _ts(1), 4, "U", 10.0),
        # pk C: timestamp tie broken by seq
        ("C", _ts(5), 5, "U", 5.0),
        ("C", _ts(5), 6, "U", 6.0),
    ]
    return spark.createDataFrame(
        rows, "pk string, ts timestamp, seq long, op string, value double"
    )


def test_latest_snapshot_delete_and_tiebreak(changelog):
    snap = cdc.latest_snapshot(
        changelog, ["pk"], "ts", seq_cols=["seq"], op_col="op"
    )
    got = {r["pk"]: (r["seq"], r["value"]) for r in snap.collect()}
    assert got == {"B": (4, 10.0), "C": (6, 6.0)}  # A deleted; C tie -> seq 6


def test_latest_snapshot_keeps_deletes_without_op_col(changelog):
    snap = cdc.latest_snapshot(changelog, ["pk"], "ts", seq_cols=["seq"])
    assert {r["pk"] for r in snap.collect()} == {"A", "B", "C"}


def test_scd2_intervals(changelog):
    hist = cdc.scd2_history(
        changelog, ["pk"], "ts", seq_cols=["seq"], op_col="op"
    ).collect()
    by_pk = {}
    for r in hist:
        by_pk.setdefault(r["pk"], []).append(r)
    a = sorted(by_pk["A"], key=lambda r: r["seq"])
    # delete emits no version but closes the last interval
    assert [r["seq"] for r in a] == [1, 2]
    assert a[0]["valid_to"] == _ts(2) and a[1]["valid_to"] == _ts(3)
    assert not any(r["is_current"] for r in a)
    (b,) = by_pk["B"]
    assert b["valid_to"] is None and b["is_current"]
    c = sorted(by_pk["C"], key=lambda r: r["seq"])
    assert c[0]["valid_to"] == _ts(5) and c[1]["is_current"]


def test_empty_pks_rejected(changelog):
    with pytest.raises(ValueError):
        cdc.latest_snapshot(changelog, [], "ts")
    with pytest.raises(ValueError):
        cdc.scd2_history(changelog, [], "ts")
