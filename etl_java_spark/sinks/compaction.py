"""Small-file compaction — the table-maintenance operator every long-
lived 100 TB lake needs.

Streaming sinks, frequent small batch appends, and over-partitioned
writes all degrade a table into thousands of KB-sized files; every
subsequent scan then pays one task + one footer read per file, and the
NameNode/object-store listing cost grows unbounded. Compaction rewrites
the data into ~target-sized files:

- ``compaction_plan`` lists the files (one driver-side filesystem
  listing — metadata, not data) and computes how many output files the
  byte total wants.
- ``compact`` rewrites: ``coalesce(n)`` when no sort is requested (no
  shuffle — each output task concatenates input splits), or
  ``repartitionByRange + sortWithinPartitions`` when a cluster key is
  given (one shuffle, and the output doubles as a range-clustered
  layout, see clustering.py).

The rewrite targets a NEW path — swap-on-success is the caller's move
(atomic rename/metastore pointer flip); compacting in place would lose
data on any mid-write failure.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CompactionPlan:
    n_files: int
    total_bytes: int
    target_files: int


def _list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under ``path`` — via the JVM
    Hadoop FileSystem, so it works for any supported filesystem scheme."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            out.append((st.getPath().toString(), st.getLen()))
    return out


def compaction_plan(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> CompactionPlan:
    files = _list_files(spark, path)
    total = sum(sz for _, sz in files)
    return CompactionPlan(
        n_files=len(files),
        total_bytes=total,
        target_files=max(1, math.ceil(total / target_bytes)),
    )


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] | None = None,
) -> CompactionPlan:
    """Rewrite ``path`` into ``out_path`` with ~target_bytes files.

    Returns the plan that was executed (pre-rewrite file stats)."""
    plan = compaction_plan(spark, path, target_bytes)
    df: DataFrame = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(plan.target_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.coalesce(plan.target_files)
    out.write.mode("error").parquet(out_path)
    return plan
