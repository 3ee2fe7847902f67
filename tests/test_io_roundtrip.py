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


def test_json_corrupt_records_quarantined(spark, tmp_path):
    """PERMISSIVE mode lands malformed lines in _corrupt_record instead
    of failing the job — the behavior a 100 TB ingest needs (one bad
    file must not kill a pipeline)."""
    p = tmp_path / "mixed.json"
    p.write_text('{"id": 1, "v": "ok"}\n{broken json\n{"id": 2, "v": "fine"}\n')
    df = read_json(
        spark,
        str(p),
        schema="id int, v string, _corrupt_record string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.id for r in good} == {1, 2}
    assert len(bad) == 1 and "{broken" in bad[0]._corrupt_record


def test_csv_malformed_rows_dropped_in_dropmalformed(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("id,v\n1,a\nnot_an_int,b\n3,c\n")
    df = read_csv(spark, str(p), schema="id int, v string", mode="DROPMALFORMED")
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_parquet_schema_merge(spark, tmp_path):
    """mergeSchema unions evolving file schemas — additive column
    evolution without rewriting history."""
    old = spark.createDataFrame([(1, "a")], "id int, v string")
    new = spark.createDataFrame([(2, "b", 9.5)], "id int, v string, score double")
    old.write.parquet(str(tmp_path / "t"), mode="append")
    new.write.parquet(str(tmp_path / "t"), mode="append")
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert set(merged.columns) == {"id", "v", "score"}
    got = {r.id: r.score for r in merged.collect()}
    assert got == {1: None, 2: 9.5}
