"""compact: small-file rewrite with byte-targeted output file count."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from etl_java_spark.sinks.compaction import compact, compaction_plan


def _parquet_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]


def test_compact_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compacted")
    spark.range(0, 100_000).withColumn("v", F.col("id") * 2).repartition(
        64
    ).write.parquet(src)
    assert len(_parquet_files(src)) == 64

    plan = compact(spark, src, dst, target_bytes=512 * 1024)
    assert plan.n_files == 64
    assert len(_parquet_files(dst)) == plan.target_files < 64

    # content identity
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_compact_sorted_layout(spark, tmp_path):
    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "sorted")
    spark.range(0, 50_000).withColumn(
        "k", (F.col("id") * 2654435761) % 1000003
    ).repartition(32).write.parquet(src)

    compact(spark, src, dst, target_bytes=256 * 1024, sort_cols=["k"])
    # per-file ranges must be (near-)disjoint: max of file i <= min of file i+1
    files = sorted(_parquet_files(dst))
    spans = []
    for f in files:
        r = spark.read.parquet(f).agg(F.min("k"), F.max("k")).collect()[0]
        spans.append((r[0], r[1]))
    spans.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {spans}"


def test_plan_counts_bytes(spark, tmp_path):
    src = str(tmp_path / "frag3")
    spark.range(0, 10_000).write.parquet(src)
    plan = compaction_plan(spark, src, target_bytes=1)
    assert plan.total_bytes > 0
    assert plan.target_files == plan.total_bytes  # 1-byte target: one per byte
