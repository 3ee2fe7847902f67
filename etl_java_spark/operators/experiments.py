"""A/B experiment analysis: deterministic variant assignment + Welch's
t statistic from exact streaming moments.

Charter §2B extension (no reference counterpart — RoberWaters/ETL-Java,
src/etl/ETLProcess.java:1-568). Experiment readouts are the analytics
sibling of the split-assignment operator (sampling.assign_split): the
same arithmetic key hash buckets users into variants — reproducible on
any cluster, no seed, no sample() — and the test statistic reduces to
five map-side-combinable aggregates per variant.

Determinism: per-variant sums run in exact integer micro-units
(decimal aggregation — order-independent), and mean/variance/t are
derived in double through ONE fixed expression tree, so every engine
computes the identical IEEE result (+,-,*,/ and sqrt are all
correctly-rounded). No resampling, no approximation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import key_bucket


def ab_assign(key, n_variants: int = 2) -> Column:
    """Deterministic variant id in [0, n_variants) from the unit key."""
    return key_bucket(key, 10000) % n_variants


def welch_t(
    df: DataFrame,
    unit_col: str,
    metric_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample Welch t readout for an A/B split on ``unit_col``.

    The metric is scaled to exact integer micro-units
    (``round(metric * scale)`` as long) so per-variant sum and
    sum-of-squares aggregate exactly (decimal, order-independent);
    means, Welch-Satterthwaite variances, and t then derive in double:

        m = S/n,  v = (SS - S^2/n) / (n - 1),
        t = (m_a - m_b) / sqrt(v_a/n_a + v_b/n_b)

    Returns ONE row: (n_a, n_b, mean_a, mean_b, var_a, var_b, t_welch)
    with means/variances in scaled-unit space (divide by ``scale`` /
    ``scale^2`` for natural units — kept integer-scaled here so the
    row is exactly reproducible).

    Pick ``scale`` so the scaled sum-of-squares stays below 2^53:
    beyond that the exact integer no longer converts to double
    identically everywhere (DuckDB's HUGEINT->DOUBLE cast is not
    correctly rounded past 2^53 — found by the oracle gate), and the
    t statistic stops being bit-reproducible cross-engine.

    Scale: a single grouped aggregation over the metric table (2 groups,
    map-side combined) + a 2-row pivot on the driver-side plan — no
    shuffle of the raw data beyond the one agg.
    """
    d38 = "decimal(38,0)"
    u = F.round(F.col(metric_col) * scale).cast("long")
    per = (
        df.select(ab_assign(unit_col).alias("variant"), u.alias("u"))
        .groupBy("variant")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("u").cast(d38)).alias("s"),
            # cast BEFORE the square: long*long would overflow for
            # micro-units beyond ~3e9; decimal x long cannot
            F.sum((F.col("u").cast(d38) * F.col("u")).cast(d38)).alias("ss"),
        )
    )
    a = per.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"),
        F.col("s").cast("double").alias("sa"),
        F.col("ss").cast("double").alias("ssa"),
    )
    b = per.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"),
        F.col("s").cast("double").alias("sb"),
        F.col("ss").cast("double").alias("ssb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    mean_a = F.col("sa") / na
    mean_b = F.col("sb") / nb
    var_a = (F.col("ssa") - F.col("sa") * F.col("sa") / na) / (na - 1)
    var_b = (F.col("ssb") - F.col("sb") * F.col("sb") / nb) / (nb - 1)
    return (
        a.crossJoin(b)
        .select(
            "n_a",
            "n_b",
            mean_a.alias("mean_a"),
            mean_b.alias("mean_b"),
            var_a.alias("var_a"),
            var_b.alias("var_b"),
            (
                (mean_a - mean_b)
                / F.sqrt(var_a / na + var_b / nb)
            ).alias("t_welch"),
        )
    )


def proportion_ztest(
    df: DataFrame,
    unit_col: str,
    success_col,
) -> DataFrame:
    """Two-proportion z-test for an A/B split on ``unit_col``: the
    conversion-rate readout (``welch_t`` handles continuous metrics;
    this is its binary-outcome sibling, the single most common
    experiment decision statistic).

        z = (p_a - p_b) / sqrt(p * (1 - p) * (1/n_a + 1/n_b))

    with p the pooled rate. Variant comes from the same deterministic
    ``ab_assign`` hash as every experiment operator here (never a
    seeded sample — assignment must be reproducible row-for-row on any
    engine). Counts are exact integers from one 2-group aggregate; z is
    a fixed double expression, so the whole row is bit-reproducible.

    Returns one row: (n_a, n_b, x_a, x_b, p_a, p_b, z).
    """
    success = (
        F.col(success_col) if isinstance(success_col, str) else success_col
    ).cast("int")
    per = (
        df.select(ab_assign(unit_col).alias("__v"), success.alias("__s"))
        .groupBy("__v")
        .agg(F.count("*").alias("__n"), F.sum("__s").cast("long").alias("__x"))
    )
    row = per.agg(
        F.max(F.when(F.col("__v") == 0, F.col("__n"))).cast("long").alias("n_a"),
        F.max(F.when(F.col("__v") == 1, F.col("__n"))).cast("long").alias("n_b"),
        F.max(F.when(F.col("__v") == 0, F.col("__x"))).cast("long").alias("x_a"),
        F.max(F.when(F.col("__v") == 1, F.col("__x"))).cast("long").alias("x_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    xa, xb = F.col("x_a").cast("double"), F.col("x_b").cast("double")
    pa, pb = xa / na, xb / nb
    pool = (xa + xb) / (na + nb)
    z = (pa - pb) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    # degenerate pooled rate (nobody / everybody converts) -> the pooled
    # variance is 0 and z is undefined; NULL, not an ANSI
    # divide-by-zero (the CASE guards the division on both engines)
    z_guarded = F.when(
        (F.col("x_a") + F.col("x_b") > 0)
        & (F.col("x_a") + F.col("x_b") < F.col("n_a") + F.col("n_b")),
        z,
    )
    return row.select(
        "n_a", "n_b", "x_a", "x_b",
        F.round(pa, 12).alias("p_a"),
        F.round(pb, 12).alias("p_b"),
        F.round(z_guarded, 12).alias("z"),
    )
