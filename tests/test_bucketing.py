"""Bucketed-join plan guarantee: co-located tables join with NO shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_java_spark.sinks.bucketing import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small, tmp_path_factory):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"), "b_orders", ["okey"], 8, sort_cols=["okey"]
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "okey"), "b_lineitem", ["okey"], 8, sort_cols=["okey"]
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed_tables, sf_small):
    lt, rt = bucketed_tables
    # disable broadcast so the join strategy decision is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt, on=["okey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan[:2000]}"
        # correctness: same count as the plain join
        o = spark.read.parquet(f"{sf_small}/orders.parquet")
        li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
        expected = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_agg_no_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("okey").agg(F.sum("o_totalprice").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "groupBy on the bucket key must not shuffle"
