"""Bucketed table helpers — shuffle-free co-located joins at scale.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
both tables bucketed by the join key (same bucket count) lets Spark plan
a SortMergeJoin with NO Exchange on either side: each task reads matching
bucket files directly. This module wraps the write/read pattern; the
plan-level guarantee is pinned by tests/test_bucketing.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the Sort from later
    merge joins on the same key.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key/count — no shuffle."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
