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


from etl_java_spark.functions.text import suspicious_char_counts  # noqa: E402
from etl_java_spark.operators.evaluation import (  # noqa: E402
    grouped_ols,
    pair_eval,
)


def test_suspicious_char_counts(spark):
    rows = [
        (1, "clean ascii text"),
        (2, "zero​width‌ here"),
        (3, "bidi ‮ attack ⁦x⁩"),
        (4, "pаssword with Cyrillic а and Greek Ο"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    zw, bidi, homo = suspicious_char_counts(F.col("text"))
    out = {
        r["id"]: r
        for r in df.select(
            "id", zw.alias("zw"), bidi.alias("bidi"), homo.alias("homo")
        ).collect()
    }
    assert (out[1]["zw"], out[1]["bidi"], out[1]["homo"]) == (0, 0, 0)
    assert out[2]["zw"] == 2
    assert out[3]["bidi"] == 3
    assert out[4]["homo"] == 3


def test_pair_eval_canonicalization_and_metrics(spark):
    pred = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 4), (4, 5)], "id_a long, id_b long"
    )  # flipped + duplicate forms of (4,5)
    gold = spark.createDataFrame(
        [(1, 2), (4, 5), (7, 8)], "id_a long, id_b long"
    )
    out = pair_eval(pred, gold).collect()[0]
    assert (out["n_pred"], out["n_gold"], out["tp"]) == (3, 3, 2)
    assert (out["fp"], out["fn"]) == (1, 1)
    assert out["precision"] == out["recall"] == 2.0 / 3.0
    assert out["f1"] == 2.0 * 2 / 6


def test_pair_eval_empty_pred(spark):
    pred = spark.createDataFrame([], "id_a long, id_b long")
    gold = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = pair_eval(pred, gold).collect()[0]
    assert out["tp"] == 0 and out["n_pred"] == 0
    assert out["precision"] is None
    assert out["recall"] == 0.0
    assert out["f1"] is None


def test_grouped_ols_recovers_exact_planes(spark):
    import math

    rows = []
    for g, (b0, b1, b2) in [("a", (1.0, 2.0, 3.0)), ("b", (5.0, -1.0, 0.5))]:
        for x1, x2 in [(0, 0), (1, 0), (0, 1), (1, 1), (2, 1), (1, 3)]:
            rows.append((g, b0 + b1 * x1 + b2 * x2, float(x1), float(x2)))
    df = spark.createDataFrame(rows, "g string, y double, x1 double, x2 double")
    out = {r["g"]: r for r in grouped_ols(df, "g", "y", "x1", "x2").collect()}
    assert math.isclose(out["a"]["beta0"], 1.0, abs_tol=1e-9)
    assert math.isclose(out["a"]["beta1"], 2.0, abs_tol=1e-9)
    assert math.isclose(out["a"]["beta2"], 3.0, abs_tol=1e-9)
    assert math.isclose(out["b"]["beta1"], -1.0, abs_tol=1e-9)
    assert math.isclose(out["a"]["r2"], 1.0, abs_tol=1e-9)


from etl_java_spark.operators.evaluation import metric_drivers  # noqa: E402
from etl_java_spark.operators.graph import bfs_layers  # noqa: E402
from etl_java_spark.operators.timeseries import burn_rate  # noqa: E402


def test_burn_rate_multiwindow_alert(spark):
    # hour 0-4: 1 error / 10 events (under budget); hour 5: 8/10 —
    # fast window burns hot but the 6h slow window still dilutes it
    # (0.87x) -> no alert; hours 6-7 keep erroring -> slow burn climbs
    # 1.33x then 1.8x, crossing the 1.5x threshold -> alert.
    rows = []
    eid = 0
    for h in range(8):
        n_err = {5: 8, 6: 8, 7: 8}.get(h, 1)
        for i in range(10):
            rows.append(
                (eid, dt.datetime(2024, 1, 1, h, i),
                 "error" if i < n_err else "view")
            )
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {
        r["hour"].hour: r
        for r in burn_rate(
            df, "ts", F.col("event_type") == "error",
            slo_error_rate_bp=2500, alert_burn_bp=15000,
        ).collect()
    }
    assert out[0]["alert"] is False
    assert out[0]["burn_fast_bp"] == 4000      # 10% of a 25% budget
    assert out[5]["burn_fast_bp"] == 32000     # 80% rate = 3.2x burn
    assert out[5]["alert"] is False            # slow window at 0.87x
    assert out[5]["burn_slow_bp"] == 8666
    assert out[6]["alert"] is False            # slow window at 1.33x
    assert out[7]["burn_slow_bp"] == 18000
    assert out[7]["alert"] is True             # both windows over 1.5x


def test_bfs_layers_hop_distances(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {r["node"]: r["hops"] for r in
           bfs_layers(edges, seeds, max_hops=2).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}  # d is 3 hops (cut), x/y apart


def test_bfs_layers_min_distance_not_revisited(spark):
    # diamond: a-b, a-c, b-d, c-d -> d at hop 2 exactly once
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    rows = bfs_layers(edges, seeds, max_hops=3).collect()
    assert len(rows) == len({r["node"] for r in rows})  # unique nodes
    out = {r["node"]: r["hops"] for r in rows}
    assert out["d"] == 2 and out["a"] == 0


def test_metric_drivers_shares_and_ranks(spark):
    rows = [
        ("big", "a", 100), ("big", "b", 400),     # +300
        ("down", "a", 500), ("down", "b", 400),   # -100
        ("gone", "a", 50),                        # -50 (absent in b)
        ("new", "b", 50),                         # +50 (absent in a)
    ]
    df = spark.createDataFrame(rows, "seg string, per string, cents long")
    out = {r["seg"]: r for r in
           metric_drivers(df, ["seg"], "per", "cents", "a", "b").collect()}
    assert out["big"]["delta_cents"] == 300
    assert out["gone"]["delta_cents"] == -50 and out["gone"]["cents_b"] == 0
    assert out["new"]["cents_a"] == 0
    assert all(r["total_delta_cents"] == 200 for r in out.values())
    assert out["big"]["delta_share"] == 1.5  # overshoot: others offset
    assert out["big"]["impact_rank"] == 1
    assert out["down"]["impact_rank"] == 2
    # deterministic tie-break between gone(-50) and new(+50): by segment
    assert out["gone"]["impact_rank"] == 3 and out["new"]["impact_rank"] == 4
