"""Layout clustering (sinks/clustering.py): Morton key correctness and
the footer-stats property that makes parquet scan pruning effective."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from etl_java_spark.sinks.clustering import (
    minmax_scale,
    write_range_clustered,
    write_zorder_clustered,
    zorder_key,
)


def _py_morton(vals, bits):
    key = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            key |= ((v >> i) & 1) << (i * len(vals) + j)
    return key


def test_zorder_key_matches_reference_morton(spark):
    rows = [(x, y) for x in (0, 1, 5, 200, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=8).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_morton([r.x, r.y], 8), (r.x, r.y)


def test_zorder_key_capacity_guard(spark):
    with pytest.raises(ValueError, match="exceeds"):
        zorder_key([F.lit(1), F.lit(2)], bits=32)


def test_minmax_scale_bounds(spark):
    df = spark.createDataFrame([(v,) for v in [-10.0, 0.0, 50.0, 100.0, 999.0]], "v double")
    got = [r.s for r in df.select(minmax_scale("v", 0.0, 100.0, 8).alias("s")).collect()]
    assert got == [0, 0, 127, 255, 255]  # clamped at both ends


def _file_stats(path, col_idx):
    """(min, max) of a column across each parquet data file."""
    stats = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        pf = pq.ParquetFile(f)
        mins, maxs = [], []
        for rg in range(pf.metadata.num_row_groups):
            s = pf.metadata.row_group(rg).column(col_idx).statistics
            mins.append(s.min)
            maxs.append(s.max)
        if mins:
            stats.append((min(mins), max(maxs)))
    return stats


def test_range_clustered_files_have_disjoint_ranges(spark, sf_small, tmp_path):
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    out = str(tmp_path / "ev_clustered")
    write_range_clustered(ev.select("user_id", "value"), out, ["user_id"], num_files=8)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    stats = _file_stats(out, 0)  # user_id is column 0
    assert len(stats) >= 4
    # tight, non-overlapping per-file ranges = the property pruning needs
    for (lo1, hi1), (lo2, hi2) in zip(sorted(stats), sorted(stats)[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"


def test_zorder_clustered_files_are_hyperrectangles(spark, sf_small, tmp_path):
    ev = spark.read.parquet(f"{sf_small}/events.parquet").select("user_id", "value")
    out = str(tmp_path / "ev_zorder")
    write_zorder_clustered(
        ev, out, [("user_id", 0.0, 150.0), ("value", 0.0, 20.0)], bits=8, num_files=8
    )
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert back.columns == ["user_id", "value"]  # __zkey dropped
    u_stats = _file_stats(out, 0)
    # every file must cover a fraction of the user_id domain, not all of
    # it — the un-clustered layout would give (min, max) ~ (0, 149) per
    # file. Z-boxes are axis-aligned fractions of the 2^8 grid.
    spans = [hi - lo for lo, hi in u_stats]
    full = max(r.user_id for r in back.collect()) - 0
    assert sum(spans) / len(spans) <= 0.6 * full, f"z-order boxes too wide: {u_stats}"
