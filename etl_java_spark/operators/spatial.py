"""Grid-bucketed spatial self-join — proximity pairs without a cross
join.

Charter §2B extension (no reference counterpart — RoberWaters/ETL-Java,
src/etl/ETLProcess.java:1-568, has no spatial surface). The shape
matters for any "find nearby entities" workload: store-coverage
analysis, sensor clustering, geo dedup.

Scale design — the same blocking idea as the LSH/SemDeDup family, in
coordinate space: bucket points into radius-sized grid cells, explode
each point into its 3x3 cell neighborhood on ONE side only, and
equi-join on the cell key. Every qualifying pair is produced exactly
once (the probe side stays in its own cell), candidate volume is
(local density x 9) per point instead of N^2, and the join is an
ordinary hash join Catalyst/AQE can plan, skew-handle, and broadcast.

Distances here are squared EUCLIDEAN in coordinate units (pure
+,-,*,<= — bit-identical IEEE arithmetic in any engine, which makes
the operator oracle-checkable). For geographic great-circle semantics
swap the final predicate for haversine and size the cell by the
max latitude-corrected radius — the blocking structure is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_self_join(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """All unordered pairs of rows within Euclidean distance ``radius``
    (inclusive), as (id_a, id_b, dist2) with id_a < id_b; dist2 is the
    squared distance (no sqrt — exact and monotone).
    """
    r = float(radius)
    cx = F.floor(F.col(x_col) / r).cast("long")
    cy = F.floor(F.col(y_col) / r).cast("long")
    cells = df.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
        cx.alias("__cx"),
        cy.alias("__cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = (
        cells.withColumn("__o", F.explode(offsets))
        .select(
            F.col("__id").alias("id_a"),
            F.col("__x").alias("xa"),
            F.col("__y").alias("ya"),
            (F.col("__cx") + F.col("__o.dx")).alias("__cx"),
            (F.col("__cy") + F.col("__o.dy")).alias("__cy"),
        )
    )
    build = cells.select(
        F.col("__id").alias("id_b"),
        F.col("__x").alias("xb"),
        F.col("__y").alias("yb"),
        "__cx",
        "__cy",
    )
    dist2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(build, ["__cx", "__cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist2.alias("dist2"))
        .filter(F.col("dist2") <= F.lit(r * r))
    )
