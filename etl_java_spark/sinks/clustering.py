"""Data-layout clustering for scan pruning — range clustering and
Z-order (Morton) multi-dimensional clustering.

Parquet keeps min/max statistics per file and per row group; a scan
with a pushed-down predicate skips units whose stats exclude the
predicate. Whether that skip actually prunes anything is a LAYOUT
property: if every file spans the whole key range, stats never
exclude. These helpers produce layouts where stats are tight:

- ``write_range_clustered``: repartitionByRange + sortWithinPartitions
  on the cluster key — each file covers a narrow, non-overlapping key
  range. The right layout when queries filter one dominant column.
- ``zorder_key`` + ``write_zorder_clustered``: interleave the bits of
  several scaled dimensions into one Morton key and range-cluster on
  it — each file becomes a small hyper-rectangle, so filters on ANY
  clustered dimension prune (the Delta/Iceberg OPTIMIZE ZORDER layout,
  built from first principles).

Everything is a JVM-side Column expression (shift/and/or unrolled per
bit — whole-stage codegen folds it); the only shuffle is the
repartitionByRange that the write needs anyway. tests/test_clustering.py
pins the layout property by reading parquet footers: per-file min/max
ranges must be disjoint (range) / small fractions of the domain
(Z-order).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_scale(col, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column to the integer grid [0, 2^bits).

    ``lo``/``hi`` are domain bounds supplied by the caller (at scale:
    from one tiny agg or prior knowledge — never a global sort)."""
    c = F.col(col) if isinstance(col, str) else col
    top = (1 << bits) - 1
    scaled = ((c.cast("double") - lo) / (hi - lo) * top).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(top), scaled))


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave of pre-scaled integer columns (each in
    [0, 2^bits)) into one long. Bit i of dimension j lands at position
    i * ndims + j; 64-bit capacity requires bits * ndims <= 63."""
    ndims = len(cols)
    if bits * ndims > 63:
        raise ValueError(f"bits*ndims = {bits * ndims} exceeds a signed long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(cl, i).bitwiseAND(F.lit(1)), i * ndims + j)
            )
    return key


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Range-cluster on ``cluster_cols``: tight per-file min/max stats
    on the leading column -> file- and row-group-level scan pruning."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    dims: Sequence[tuple[str, float, float]],
    bits: int = 16,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Z-order cluster on several dimensions: ``dims`` is a list of
    (column, lo, hi) domain bounds. The Morton key is computed, used
    for range clustering, then dropped — the layout is the product."""
    scaled = [minmax_scale(c, lo, hi, bits) for c, lo, hi in dims]
    keyed = df.withColumn("__zkey", zorder_key(scaled, bits))
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def zone_map_audit(
    df: DataFrame,
    order_cols: Sequence[str],
    bucket: Column,
    stat_col: str,
    pred_lo,
    pred_hi,
    chunk_rows: int = 4096,
    layout: str = "layout",
) -> DataFrame:
    """Quantify data-skipping effectiveness of a LAYOUT before paying
    to rewrite it: lay the table out in ``order_cols`` order, cut it
    into storage chunks of ``chunk_rows`` rows (the row-group stand-in),
    compute each chunk's min/max zone map over ``stat_col``, and count
    how many chunks a [pred_lo, pred_hi] range predicate would scan —
    chunk pruned iff ``max < lo OR min > hi``, exactly parquet's
    row-group stat skip.

    Chunk ids come from the two-phase ``assign_global_ids`` discipline
    (``bucket`` must be an order-consistent prefix of the leading order
    column) — no single-partition sort, so the audit itself runs at the
    scale of the table it is judging. One grouped min/max over chunk
    ids, then arithmetic on the (metadata-sized) chunk table.

    Returns ONE row: (layout, n_rows, n_chunks, n_chunks_scanned,
    rows_scanned, scan_fraction).
    """
    from ..operators.transforms import assign_global_ids

    ids = assign_global_ids(
        df.select(*{*order_cols, stat_col}), list(order_cols), bucket
    )
    chunks = (
        ids.select(
            F.floor((F.col("seq_id") - 1) / chunk_rows).alias("__chunk"),
            F.col(stat_col),
        )
        .groupBy("__chunk")
        .agg(
            F.count("*").alias("__n"),
            F.min(stat_col).alias("__lo"),
            F.max(stat_col).alias("__hi"),
        )
    )
    scanned = (F.col("__hi") >= F.lit(pred_lo)) & (F.col("__lo") <= F.lit(pred_hi))
    return chunks.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(scanned.cast("int")).cast("long").alias("n_chunks_scanned"),
        F.sum(F.when(scanned, F.col("__n")).otherwise(0)).cast("long").alias("rows_scanned"),
    ).select(
        F.lit(layout).alias("layout"),
        "n_rows",
        "n_chunks",
        "n_chunks_scanned",
        "rows_scanned",
        F.round(
            F.col("rows_scanned").cast("double") / F.col("n_rows").cast("double"), 12
        ).alias("scan_fraction"),
    )
