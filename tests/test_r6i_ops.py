"""Round-6 wave-i operators: PIT drift, consistent-hash reshard audit,
bitemporal restatement."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_java_spark.operators.cdc import restatement_report
from etl_java_spark.operators.dq import pit_drift
from etl_java_spark.operators.sampling import (
    RING_SIZE,
    reshard_movement,
    ring_nodes,
)


def _cohorts(spark, ref_vals, cur_vals):
    rows = [(v, "ref") for v in ref_vals] + [(v, "cur") for v in cur_vals]
    return spark.createDataFrame(rows, "v long, c string")


def test_pit_drift_identical_distributions_uniform(spark):
    vals = list(range(100))
    df = _cohorts(spark, vals, vals)
    out = {
        r["bin"]: r["n"]
        for r in pit_drift(
            df, "v", "c", "ref", "cur",
            bucket=F.col("v") / F.lit(20), bins=5,
        ).collect()
    }
    assert sum(out.values()) == 100
    assert all(abs(n - 20) <= 1 for n in out.values())  # near-uniform


def test_pit_drift_shift_up_piles_into_top_bin(spark):
    ref = list(range(100))
    cur = [v + 1000 for v in range(50)]  # all above the reference max
    out = pit_drift(
        _cohorts(spark, ref, cur), "v", "c", "ref", "cur",
        bucket=F.col("v") / F.lit(200), bins=5,
    ).collect()
    assert len(out) == 1
    assert out[0]["bin"] == 4 and out[0]["n"] == 50
    assert out[0]["share"] == 1.0


def test_pit_drift_below_reference_min_is_bin_zero(spark):
    out = pit_drift(
        _cohorts(spark, [100, 200, 300], [1]), "v", "c", "ref", "cur",
        bucket=F.col("v") / F.lit(100), bins=4,
    ).collect()
    assert out[0]["bin"] == 0 and out[0]["n"] == 1


def test_ring_nodes_deterministic_and_sorted(spark):
    a = ring_nodes(4, 8)
    assert a == ring_nodes(4, 8)
    assert a == sorted(a)
    assert len(a) == 32 and all(0 <= h < RING_SIZE for h, _ in a)
    assert {s for _, s in a} == {0, 1, 2, 3}


def test_reshard_consistent_beats_modulo(spark):
    keys = spark.createDataFrame([(i,) for i in range(3000)], "k long")
    out = {
        r["scheme"]: r
        for r in reshard_movement(keys, "k", 4, 5, ring_points=8).collect()
    }
    assert out["modulo"]["n_keys"] == out["consistent_ring"]["n_keys"] == 3000
    # modulo reshuffles most keys; the ring moves a small fraction
    assert out["modulo"]["moved_share"] > 0.6
    assert out["consistent_ring"]["moved_share"] < 0.4
    assert (
        out["consistent_ring"]["n_moved"] < out["modulo"]["n_moved"]
    )


def test_restatement_hand_case(spark):
    ev = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 10), dt.datetime(2024, 1, 1, 23), 100),
            (dt.datetime(2024, 1, 1, 12), dt.datetime(2024, 1, 3, 12), 50),
            (dt.datetime(2024, 1, 2, 9), dt.datetime(2024, 1, 2, 9), 70),
        ],
        "ts timestamp, arr timestamp, cents long",
    )
    out = {
        r["bucket"].date(): r
        for r in restatement_report(ev, "ts", "arr", "cents").collect()
    }
    d1 = out[dt.date(2024, 1, 1)]
    assert (d1["initial_cents"], d1["final_cents"]) == (100, 150)
    assert d1["restated_cents"] == 50 and d1["n_late"] == 1
    assert d1["max_lag_seconds"] == 2 * 86400
    d2 = out[dt.date(2024, 1, 2)]
    assert d2["restated_cents"] == 0 and d2["max_lag_seconds"] is None


def test_restatement_boundary_is_exclusive(spark):
    # arrival exactly at the next midnight counts as LATE (< bucket end)
    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 23), dt.datetime(2024, 1, 2, 0), 10)],
        "ts timestamp, arr timestamp, cents long",
    )
    out = restatement_report(ev, "ts", "arr", "cents").collect()[0]
    assert out["initial_cents"] == 0 and out["n_late"] == 1
