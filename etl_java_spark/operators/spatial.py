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


def spatial_autocorrelation(
    cells: DataFrame,
    gx_col: str,
    gy_col: str,
    value_col: str,
) -> DataFrame:
    """Global spatial autocorrelation — Moran's I and Geary's C over a
    regular grid of integer-valued cells with rook (4-neighbor) binary
    weights. The one-number "is this map clustered, random, or
    dispersed?" readout behind hot-spot triage: I > E[I] = -1/(n-1)
    means like values cluster, Geary's C < 1 agrees (C weights local
    pairwise differences, so it is the more edge-sensitive twin).

        I = (n / W) * sum_ij w_ij d_i d_j / sum_i d_i^2
        C = (n - 1) * sum_ij w_ij (d_i - d_j)^2 / (2 W sum_i d_i^2)

    with d_i = n*x_i - S (n-scaled deviations, so every numerator and
    denominator term is an exact integer; the n^2 scale cancels in both
    ratios).

    Scale design: the input is the POST-AGGREGATE cell table (grid
    cells are metadata-sized — bounded by the grid, not the data), so
    the neighbor self-join is a tiny equi-join on (gx, gy) after a
    4-way offset explode; everything upstream of this operator is one
    map-side-combinable groupBy. Charter §2B extension (the reference,
    src/etl/ETLProcess.java:1-568, has no spatial surface).

    Determinism: d_i, W, and both quadratic sums are exact integers
    (decimal(38,0) products); the two ratios are fixed double trees a
    SQL oracle replays bitwise.

    Returns one row: (n_cells, w_pairs, moran_i, expected_i, geary_c).
    """
    d38 = "decimal(38,0)"
    c = cells.select(
        F.col(gx_col).cast("long").alias("gx"),
        F.col(gy_col).cast("long").alias("gy"),
        F.col(value_col).cast("long").alias("v"),
    )
    tot = c.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
    )
    dev = c.crossJoin(F.broadcast(tot)).select(
        "gx",
        "gy",
        "n",
        (F.col("n") * F.col("v") - F.col("s")).cast("long").alias("dev"),
    )
    dstats = dev.agg(
        F.max("n").cast("long").alias("n"),
        F.sum((F.col("dev").cast(d38) * F.col("dev")).cast(d38))
        .cast(d38)
        .alias("den"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ((0, 1), (0, -1), (1, 0), (-1, 0))
        ]
    )
    probe = dev.withColumn("__o", F.explode(offsets)).select(
        F.col("dev").alias("dev_i"),
        (F.col("gx") + F.col("__o.dx")).alias("jx"),
        (F.col("gy") + F.col("__o.dy")).alias("jy"),
    )
    build = dev.select(
        F.col("gx").alias("jx"),
        F.col("gy").alias("jy"),
        F.col("dev").alias("dev_j"),
    )
    diff = F.col("dev_i") - F.col("dev_j")
    pstats = probe.join(build, ["jx", "jy"]).agg(
        F.count("*").cast("long").alias("w"),
        F.sum((F.col("dev_i").cast(d38) * F.col("dev_j")).cast(d38))
        .cast(d38)
        .alias("num_m"),
        F.sum((diff.cast(d38) * diff).cast(d38)).cast(d38).alias("num_g"),
    )
    nd = F.col("n").cast("double")
    wd = F.col("w").cast("double")
    dend = F.col("den").cast("double")
    moran = nd * F.col("num_m").cast("double") / (wd * dend)
    geary = (
        (nd - F.lit(1.0))
        * F.col("num_g").cast("double")
        / (F.lit(2.0) * wd * dend)
    )
    return dstats.crossJoin(pstats).select(
        F.col("n").alias("n_cells"),
        F.col("w").alias("w_pairs"),
        moran.alias("moran_i"),
        (F.lit(-1.0) / (nd - F.lit(1.0))).alias("expected_i"),
        geary.alias("geary_c"),
    )


def getis_hotspots(
    cells: DataFrame,
    gx_col: str,
    gy_col: str,
    value_col: str,
) -> DataFrame:
    """Getis-Ord Gi* hot-spot z-scores over a regular grid of
    integer-valued cells with queen (3x3, self-inclusive) binary
    weights — the per-cell companion to :func:`spatial_autocorrelation`
    (global I says "the map clusters"; Gi* says WHERE):

        z_i = (L_i - xbar W_i) / (s sqrt((n W_i - W_i^2) / (n - 1)))

    where L_i sums x over cell i's 3x3 neighborhood (self included),
    W_i is the realized neighborhood size (edge cells see fewer),
    xbar = S1/n, s = sqrt(S2/n - xbar^2).

    Scale design: same post-aggregate cell-table contract as
    spatial_autocorrelation — a 9-way offset explode and one equi-join
    on (gx, gy), both bounded by the grid. L_i, W_i, S1, S2 are exact
    integers; z is a fixed double tree (+,-,*,/ and IEEE-exact sqrt),
    so the oracle replays it bitwise.

    Returns one row per cell: (gx, gy, x, w_i, local_sum, z).
    """
    d38 = "decimal(38,0)"
    c = cells.select(
        F.col(gx_col).cast("long").alias("gx"),
        F.col(gy_col).cast("long").alias("gy"),
        F.col(value_col).cast("long").alias("v"),
    )
    tot = c.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum((F.col("v").cast(d38) * F.col("v")).cast(d38))
        .cast(d38)
        .alias("s2"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = c.withColumn("__o", F.explode(offsets)).select(
        "gx",
        "gy",
        F.col("v").alias("x"),
        (F.col("gx") + F.col("__o.dx")).alias("jx"),
        (F.col("gy") + F.col("__o.dy")).alias("jy"),
    )
    build = c.select(
        F.col("gx").alias("jx"),
        F.col("gy").alias("jy"),
        F.col("v").alias("vj"),
    )
    local = (
        probe.join(build, ["jx", "jy"])
        .groupBy("gx", "gy", "x")
        .agg(
            F.count("*").cast("long").alias("w_i"),
            F.sum("vj").cast("long").alias("local_sum"),
        )
    )
    nd = F.col("n").cast("double")
    xbar = F.col("s1").cast("double") / nd
    s = F.sqrt(F.col("s2").cast("double") / nd - xbar * xbar)
    wid = F.col("w_i").cast("double")
    num = F.col("local_sum").cast("double") - xbar * wid
    den = s * F.sqrt((nd * wid - wid * wid) / (nd - F.lit(1.0)))
    return local.crossJoin(F.broadcast(tot)).select(
        "gx",
        "gy",
        "x",
        "w_i",
        "local_sum",
        (num / den).alias("z"),
    )


def nearest_neighbor_join(
    points: DataFrame,
    facilities: DataFrame,
    pid_col: str,
    px_col: str,
    py_col: str,
    fid_col: str,
    fx_col: str,
    fy_col: str,
    cell: int,
    exact: bool = False,
) -> DataFrame:
    """Nearest-facility assignment: for each point, the closest
    facility by squared Euclidean distance, grid-blocked — the spatial
    argmin join behind store-coverage / catchment analytics (the
    radius sibling is :func:`grid_self_join`).

    Scale design: facilities land in (x // cell, y // cell) macro
    cells; each point probes its 3x3 macro-cell neighborhood via a
    9-way offset explode and an EQUI-join (hash-joinable, AQE-planable
    — never a cross join), then one min(struct) argmin per point.
    Candidate fan-out is (facilities per cell x 9); ``cell`` is the
    knob — size it to the facility density so a neighborhood holds
    O(10) candidates. Points whose whole 3x3 neighborhood is empty of
    facilities are absent from the output (MATCHED-ONLY semantics —
    callers needing total coverage widen ``cell``).

    Exactness contract: with ``exact=False`` the result is an
    APPROXIMATE argmin — it is the true nearest only when that
    facility lies inside the 3x3 neighborhood; a candidate up to
    ~2*sqrt(2)*cell away can win over a true nearest sitting just
    past the neighborhood boundary (~cell+1). ``exact=True`` filters
    candidates to dist2 <= cell^2, which makes every RETURNED
    assignment provably the global nearest (any facility within
    ``cell`` of a point is necessarily inside the 3x3 neighborhood)
    at the cost of dropping points whose nearest facility is farther
    than ``cell``.

    Determinism: squared distances are exact integers; ties break on
    the smallest facility id via lexicographic struct min.

    Returns one row per matched point: (pid, fid, dist2).
    """
    cl = int(cell)
    if cl <= 0:
        raise ValueError("cell must be a positive integer")
    p = points.select(
        F.col(pid_col).alias("pid"),
        F.col(px_col).cast("long").alias("px"),
        F.col(py_col).cast("long").alias("py"),
    )
    f = facilities.select(
        F.col(fid_col).alias("fid"),
        F.col(fx_col).cast("long").alias("fx"),
        F.col(fy_col).cast("long").alias("fy"),
        F.floor(F.col(fx_col).cast("long") / F.lit(cl)).cast("long").alias("mx"),
        F.floor(F.col(fy_col).cast("long") / F.lit(cl)).cast("long").alias("my"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = p.withColumn("__o", F.explode(offsets)).select(
        "pid",
        "px",
        "py",
        (F.floor(F.col("px") / F.lit(cl)).cast("long") + F.col("__o.dx")).alias("mx"),
        (F.floor(F.col("py") / F.lit(cl)).cast("long") + F.col("__o.dy")).alias("my"),
    )
    dist2 = (F.col("px") - F.col("fx")) * (F.col("px") - F.col("fx")) + (
        F.col("py") - F.col("fy")
    ) * (F.col("py") - F.col("fy"))
    cand = probe.join(f, ["mx", "my"]).select(
        "pid", F.struct(dist2.cast("long").alias("d2"), F.col("fid").alias("f")).alias("__c")
    )
    if exact:
        cand = cand.filter(F.col("__c.d2") <= F.lit(cl * cl))
    best = cand.groupBy("pid").agg(F.min("__c").alias("__b"))
    return best.select(
        "pid",
        F.col("__b.f").alias("fid"),
        F.col("__b.d2").alias("dist2"),
    )
