"""Edge-semantics insurance for the round-4 second-wave operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_java_spark.operators import cdc as CDC
from etl_java_spark.operators.relational import temporal_join
from etl_java_spark.operators.sampling import weighted_sample
from etl_java_spark.operators.similarity import quantize_int8
from etl_java_spark.operators.spatial import grid_self_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_temporal_join_delete_masks_versions(spark):
    # user 1: state A at t0, DELETED at t2 -> a fact at t1 sees A,
    # a fact at t3 sees nothing (delete closed the interval).
    changes = [
        (1, _ts("2024-01-01 00:00:00"), 1, "A", "U"),
        (1, _ts("2024-01-01 02:00:00"), 2, "gone", "D"),
    ]
    dim_src = spark.createDataFrame(changes, ["user_id", "ts", "seq", "state", "op"])
    hist = CDC.scd2_history(dim_src, ["user_id"], "ts", seq_cols=["seq"], op_col="op")
    dim = hist.select("user_id", "state", "valid_from", "valid_to")
    facts = spark.createDataFrame(
        [
            (10, 1, _ts("2024-01-01 01:00:00")),
            (11, 1, _ts("2024-01-01 03:00:00")),
        ],
        ["fact_id", "user_id", "ts"],
    )
    out = {
        r.fact_id: r.state
        for r in temporal_join(facts, dim, on="user_id", fact_time="ts").collect()
    }
    assert out[10] == "A"
    assert out[11] is None  # state deleted before the fact -> no version


def test_grid_self_join_negative_coordinates(spark):
    rows = [(1, -0.5, -0.5), (2, -1.5, -0.5), (3, 5.0, 5.0)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    pairs = {(r.id_a, r.id_b) for r in grid_self_join(df, "id", "x", "y", 1.5).collect()}
    assert pairs == {(1, 2)}  # floor() cells work below zero


def test_weighted_sample_null_weight_drops_row(spark):
    df = spark.createDataFrame([(1, 0.9), (2, None)], ["id", "w"])
    kept = {r.id for r in weighted_sample(df, "id", F.col("w")).collect()}
    assert 2 not in kept  # NULL weight -> no selection (deterministic)


def test_quantize_int8_single_vector_all_degenerate(spark):
    df = spark.createDataFrame([(1, [3.0, -1.0])], ["id", "vec"]).withColumn(
        "vec", F.col("vec").cast("array<float>")
    )
    out = quantize_int8(df, "id", "vec").collect()
    assert out[0].codes == [0, 0]  # every dim has min == max -> code 0
