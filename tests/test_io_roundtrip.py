"""Reader/writer round-trips: CSV, JSON, partitioned parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.sources.readers import list_columns, list_tables, read_csv, read_json, register_views


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a,comma", 1.5), (2, 'b"quote', -2.0), (3, None, 0.0)],
        "id int, s string, v double",
    )
    path = str(tmp_path / "csv")
    df.write.option("header", "true").csv(path)
    back = read_csv(spark, path, schema="id int, s string, v double")
    assert _rows(back) == _rows(df)


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, {"k": "v"}, ["x", "y"]), (2, {"a": "b"}, [])],
        "id int, m map<string,string>, arr array<string>",
    )
    path = str(tmp_path / "json")
    df.write.json(path)
    back = read_json(spark, path, schema="id int, m map<string,string>, arr array<string>")
    assert back.count() == 2
    assert back.filter(F.col("id") == 1).first().m == {"k": "v"}


def test_partitioned_parquet_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(30)], "id int, g string, v double"
    )
    path = str(tmp_path / "part")
    df.write.partitionBy("g").parquet(path)
    back = spark.read.parquet(path).filter(F.col("g") == "g1")
    assert back.count() == 10
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(g" in plan or "g#" in plan  # partition pruning engaged


def test_catalog_helpers(spark, sf_small):
    register_views(spark, sf_small)
    tables = list_tables(spark)
    assert {"customer", "orders", "lineitem"} <= set(tables)
    cols = list_columns(spark, "customer")
    assert cols == ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from etl_java_spark.sources.readers import read_orc

    df = spark.createDataFrame(
        [(i, f"s{i}", float(i) / 2) for i in range(100)], "id int, s string, v double"
    )
    path = str(tmp_path / "orc")
    df.write.option("compression", "zstd").orc(path)
    back = read_orc(spark, path)
    assert _rows(back) == _rows(df)
    filtered = back.filter(F.col("id") < 10)
    assert filtered.count() == 10
    # predicate must reach the ORC scan (same pushdown story as parquet)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters")[1][:80]
