"""Deterministic numeric aggregation helpers.

Summing doubles is order-dependent, so a Spark sum and an oracle engine's
sum of the same column can differ in the last bits — enough to break
value-hash comparison and, worse, to make production runs non-reproducible
across partitionings. The fixtures' money-like columns are 2-decimal
values, so aggregating them as DECIMAL is EXACT and order-independent:
``sum(cast(x as decimal(18,2)))`` gives bit-identical results on any
cluster size. Final results are cast back to double.

This is a correctness property worth keeping at 100 TB: decimal partial
aggregation is still map-side combinable and whole-stage codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col, scale: int = 2, precision: int = 28) -> Column:
    """Order-independent exact sum of a fixed-scale numeric -> double."""
    return F.sum(_c(col).cast(f"decimal({precision},{scale})")).cast("double")


def dsum_expr(expr: Column, scale: int = 6, precision: int = 38) -> Column:
    """Exact sum of an already-decimal expression -> double."""
    return F.sum(expr.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col, scale: int = 2, precision: int = 28) -> Column:
    """Deterministic average: exact decimal sum / count, divided in double."""
    return F.sum(_c(col).cast(f"decimal({precision},{scale})")).cast("double") / F.count(
        _c(col)
    ).cast("double")


def money(col, scale: int = 2) -> Column:
    """Cast a money-like double column to exact decimal for arithmetic."""
    return _c(col).cast(f"decimal(18,{scale})")
