"""Actuarial reserving over run-off triangles (charter §2B).

A run-off triangle is the (origin period, development lag) cumulative
view of anything that keeps arriving after its origin event — insurance
claims classically, but equally returns after sale, refunds after
billing, shipments after order. The reference
(src/etl/ETLProcess.java:1-568) has no analytics surface; these are the
reserving estimators every finance team recomputes by hand in
spreadsheets.

Scale design shared by all three: the triangle itself is TINY (origins
x devs), built by one grouped aggregate from event-grain data; every
estimator is windows + folds over that metadata-sized table, so the
cost is the one scan that builds it (the post-aggregate-window
contract).

Determinism: incremental amounts are exact integers, so cumulative
cells and the per-dev factor numerators/denominators are exact; the
development factors and their products fold LEFT-ASSOCIATIVELY in dev
order over an array_sort'ed factor array (both engines replay the
identical IEEE sequence — the kaplan_meier q253 discipline); callers
ROUND (<= 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _triangle(
    df: DataFrame, origin_col: str, dev_col: str, amount_col: str
) -> DataFrame:
    """Cumulative triangle C(i, j) from incremental (origin, dev,
    amount) rows — one grouped aggregate + one cumsum window over the
    metadata-sized cell table."""
    inc = df.groupBy(
        F.col(origin_col).cast("long").alias("i"),
        F.col(dev_col).cast("long").alias("j"),
    ).agg(F.sum(F.col(amount_col).cast("long")).cast("long").alias("inc"))
    w = Window.partitionBy("i").orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return inc.select(
        "i", "j", F.sum("inc").over(w).cast("long").alias("cum")
    )


def _factors(tri: DataFrame) -> DataFrame:
    """Volume-weighted development factors f_j =
    sum_i C(i, j+1) / sum_i C(i, j) over origins observed at BOTH
    lags — exact integer numerator/denominator per dev."""
    w = Window.partitionBy("i").orderBy("j")
    pairs = tri.select(
        "i",
        "j",
        "cum",
        F.lead("cum").over(w).cast("long").alias("nxt"),
        F.lead("j").over(w).cast("long").alias("nxt_j"),
    ).filter(F.col("nxt").isNotNull() & (F.col("nxt_j") == F.col("j") + 1))
    return pairs.groupBy("j").agg(
        F.count("*").cast("long").alias("n_origins"),
        F.sum("cum").cast("long").alias("den"),
        F.sum("nxt").cast("long").alias("num"),
    ).select(
        "j",
        "n_origins",
        "den",
        "num",
        (F.col("num").cast("double") / F.col("den").cast("double")).alias(
            "f"
        ),
    )


def chain_ladder(
    df: DataFrame,
    origin_col: str,
    dev_col: str,
    amount_col: str,
) -> DataFrame:
    """Chain-ladder reserving: cumulative triangle -> volume-weighted
    development factors -> each origin's ultimate = latest cumulative
    x the LEFT-ASSOCIATIVE product of the remaining factors, and
    IBNR = ultimate - latest. Emits one row per origin:
    (origin, latest_dev, latest_cum, cdf, ultimate, ibnr).
    """
    tri = _triangle(df, origin_col, dev_col, amount_col)
    fac = _factors(tri)
    farr = fac.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("j"), F.col("f")))
        ).alias("__fs")
    )
    latest = tri.groupBy("i").agg(
        F.max(F.struct(F.col("j"), F.col("cum"))).alias("__l")
    )
    jl = F.col("__l.j")
    joined = latest.crossJoin(F.broadcast(farr))
    cdf = F.aggregate(
        F.filter(F.col("__fs"), lambda x: x["j"] >= jl),
        F.lit(1.0),
        lambda acc, x: acc * x["f"],
    )
    return joined.select(
        F.col("i").alias("origin"),
        jl.alias("latest_dev"),
        F.col("__l.cum").alias("latest_cum"),
        cdf.alias("cdf"),
        (F.col("__l.cum").cast("double") * cdf).alias("ultimate"),
        (
            F.col("__l.cum").cast("double") * cdf
            - F.col("__l.cum").cast("double")
        ).alias("ibnr"),
    )


def mack_sigma(
    df: DataFrame,
    origin_col: str,
    dev_col: str,
    amount_col: str,
) -> DataFrame:
    """Mack's per-dev volatility of the chain-ladder factors:
    sigma_j^2 = 1/(n_j - 1) * sum_i C_ij (C_{i,j+1}/C_ij - f_j)^2,
    plus the factor standard error se(f_j) = sqrt(sigma_j^2 /
    sum_i C_ij) — how trustworthy each development factor is (devs
    with n_j < 2 read NULL). One row per dev lag with the factor,
    its sigma^2 and se.

    Determinism: individual link ratios and f_j are exact-integer
    ratios; the weighted squared deviations quantize to
    decimal(38,6) before the per-dev sum.
    """
    dq6 = "decimal(38,6)"
    tri = _triangle(df, origin_col, dev_col, amount_col)
    w = Window.partitionBy("i").orderBy("j")
    pairs = tri.select(
        "i",
        "j",
        "cum",
        F.lead("cum").over(w).cast("long").alias("nxt"),
        F.lead("j").over(w).cast("long").alias("nxt_j"),
    ).filter(F.col("nxt").isNotNull() & (F.col("nxt_j") == F.col("j") + 1))
    fac = pairs.groupBy("j").agg(
        F.count("*").cast("long").alias("n_origins"),
        F.sum("cum").cast("long").alias("den"),
        F.sum("nxt").cast("long").alias("num"),
    ).select(
        "j",
        "n_origins",
        "den",
        (F.col("num").cast("double") / F.col("den").cast("double")).alias(
            "f"
        ),
    )
    jo = pairs.join(fac, "j")
    link = F.col("nxt").cast("double") / F.col("cum").cast("double")
    dev = link - F.col("f")
    terms = jo.select(
        "j",
        "n_origins",
        "den",
        "f",
        F.round(F.col("cum").cast("double") * dev * dev, 6)
        .cast(dq6)
        .alias("t"),
    )
    agg = terms.groupBy("j", "n_origins", "den", "f").agg(
        F.sum("t").cast(dq6).alias("s")
    )
    s2 = F.when(
        F.col("n_origins") >= 2,
        F.col("s").cast("double")
        / (F.col("n_origins").cast("double") - F.lit(1.0)),
    )
    return agg.select(
        "j",
        "n_origins",
        F.col("f").alias("factor"),
        s2.alias("sigma2"),
        F.when(
            s2.isNotNull(), F.sqrt(s2 / F.col("den").cast("double"))
        ).alias("se_factor"),
    )


def bornhuetter_ferguson(
    df: DataFrame,
    origin_col: str,
    dev_col: str,
    amount_col: str,
    exposure: DataFrame,
    expected_loss_ratio: float,
    exposure_origin_col: str = "origin",
    exposure_col: str = "exposure",
) -> DataFrame:
    """Bornhuetter-Ferguson reserving: blend the chain-ladder
    development pattern with a PRIOR expectation — ultimate =
    latest + exposure * ELR * (1 - 1/CDF) — so immature origins
    lean on the prior instead of multiplying a thin diagonal (the
    classic instability of pure chain-ladder on recent periods).
    One row per origin: (origin, latest_cum, cdf, prior_ultimate,
    bf_ultimate, bf_ibnr).
    """
    if expected_loss_ratio <= 0:
        raise ValueError("expected_loss_ratio must be > 0")
    cl = chain_ladder(df, origin_col, dev_col, amount_col)
    exp_ = exposure.select(
        F.col(exposure_origin_col).cast("long").alias("origin"),
        F.col(exposure_col).cast("long").alias("exposure"),
    )
    jo = cl.join(exp_, "origin")
    elr = F.lit(float(expected_loss_ratio))
    prior = F.col("exposure").cast("double") * elr
    bf_ult = F.col("latest_cum").cast("double") + prior * (
        F.lit(1.0) - F.lit(1.0) / F.col("cdf")
    )
    return jo.select(
        "origin",
        "latest_cum",
        "cdf",
        prior.alias("prior_ultimate"),
        bf_ult.alias("bf_ultimate"),
        (bf_ult - F.col("latest_cum").cast("double")).alias("bf_ibnr"),
    )
