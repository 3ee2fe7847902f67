"""Plan gate for partitioned-write pruning + cogroup kernel test."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_partitioned_write_prunes_directories(spark, sf_small):
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    out = tempfile.mkdtemp(prefix="part_gate_")
    (
        o.withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("month")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("month") == "1997-03")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the month predicate must be a PartitionFilter (directory pruning),
    # never a data filter evaluated per row
    assert "PartitionFilters" in plan
    assert "1997-03" in plan.split("PartitionFilters")[1].split("]")[0]
    # and the pruned read returns exactly the unpartitioned month
    want = o.filter(
        F.date_format("o_orderdate", "yyyy-MM") == "1997-03"
    ).count()
    assert back.count() == want > 0


def test_cogroup_balance_empty_sides(spark):
    import pandas as pd

    p = spark.createDataFrame([(1, 100), (1, 50), (3, 10)], ["user_id", "cents"])
    c = spark.createDataFrame([(1, 30), (2, 70)], ["user_id", "cents"])

    def balance(key, pdf_p: pd.DataFrame, pdf_c: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_purchases": [len(pdf_p)],
                "n_clicks": [len(pdf_c)],
                "balance_cents": [
                    int(pdf_p["cents"].sum()) - int(pdf_c["cents"].sum())
                ],
            }
        )

    out = {
        r.user_id: r
        for r in p.groupby("user_id")
        .cogroup(c.groupby("user_id"))
        .applyInPandas(
            balance,
            "user_id long, n_purchases long, n_clicks long, balance_cents long",
        )
        .collect()
    }
    assert out[1].balance_cents == 120 and out[1].n_clicks == 1
    assert out[2].n_purchases == 0 and out[2].balance_cents == -70
    assert out[3].n_clicks == 0 and out[3].balance_cents == 10
