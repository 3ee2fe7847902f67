"""CLI tests (in-process: getOrCreate reuses the test session)."""

from __future__ import annotations

from etl_java_spark.cli import main


def test_cli_pipeline_to_parquet(spark, sf_small, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc = main([
        "--source-parquet", f"{sf_small}/customer.parquet",
        "--select", "c_custkey,c_name,c_mktsegment",
        "--rename", "c_custkey=id",
        "--transform", "c_mktsegment:lower",
        "--transform", "c_name:concat:_v1",
        "--sink-parquet", out,
        "--mode", "merge",
        "--pks", "id",
    ])
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.columns == ["id", "c_name", "c_mktsegment"]
    row = got.first()
    assert row.c_mktsegment == row.c_mktsegment.lower()
    assert row.c_name.endswith("_v1")


def test_cli_sql_passthrough_show(spark, sf_small, capsys):
    rc = main([
        "--source-parquet", f"{sf_small}/orders.parquet",
        "--query", "SELECT o_orderstatus, COUNT(*) AS n FROM src GROUP BY o_orderstatus",
        "--show", "5",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert 1 <= len(out) <= 5


def test_cli_errors(spark, sf_small, capsys):
    assert main(["--show", "5"]) == 2  # no source
    # merge without pks is rejected before any write happens
    assert main([
        "--source-parquet", f"{sf_small}/region.parquet",
        "--sink-parquet", "/tmp/never-written",
        "--mode", "merge",
    ]) == 2
