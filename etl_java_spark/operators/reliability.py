"""Reliability engineering — Crow-AMSAA growth, MTBF/MTTR and
merged-downtime availability, and crossed Gauge R&R.

Three operators an ops/SRE or manufacturing-quality pipeline runs over
event logs and measurement tables:

- ``crow_amsaa``: the NHPP power-law (Duane postulate) reliability-
  growth model. Failure-truncated MLE per group over ordered failure
  instants t_1 < ... < t_n (integer microseconds from a fixed origin):
  beta = n / sum_{i<n} ln(t_n/t_i), lambda = n / T^beta. beta < 1
  means the failure intensity is falling (reliability GROWS).
- ``failure_recovery_stats``: per group, MTBF (mean gap between an
  entity's consecutive failures), MTTR (mean failure -> next-recovery
  gap), and availability from MERGED downtime intervals (overlapping
  repair windows union-ed with the classic islands pass, so wall-clock
  downtime is never double-counted).
- ``gauge_rr``: AIAG crossed Gauge R&R on a BALANCED parts x operators
  x replicates layout — variance components from the two-way ANOVA
  EMS equations (sigma2_repeat = MS_E, sigma2_int = (MS_AB - MS_E)/r,
  sigma2_operator = (MS_B - MS_AB)/(p*r), sigma2_part =
  (MS_A - MS_AB)/(o*r), each clamped at 0), %GRR of total variance,
  and the number of distinct categories ndc = floor(1.41 *
  sqrt(sigma2_part / sigma2_GRR)).

Determinism: timestamps reduce to EXACT integer microseconds
(< 2^53, so the double casts are exact); every mean/ratio is ONE
IEEE division of exact integers. Crow-AMSAA's ln terms — the only
libm calls inside an aggregate here — quantize to ROUND(ln, 9)::
decimal(38,9) BEFORE the order-free sum (the q434 contract); its
lambda readout is a single pow chain on bitwise-identical args,
ROUNDed 6 with >= 8 orders of grid margin. Gauge R&R consumes
``two_way_anova``'s exact-integer-plus-ordered-fold SS values (the
q540 contract) and composes fixed double trees from them.

Scale design (100 TB): crow_amsaa is one groupBy over failures plus a
per-group max join — no windows over raw data. failure_recovery_stats
runs TWO entity-keyed windows (next-recovery lookup, downtime
islands) and one group aggregate — everything is keyed by the entity
column, nothing global except a 1-row span broadcast. gauge_rr
aggregates to cells (p*o rows) immediately; all EMS arithmetic
happens on that metadata-sized table.

Reference: RoberWaters/ETL-Java has no analytics surface
(src/etl/ETLProcess.java is a batch console ETL); Charter §2B
extension (reliability / quality family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["crow_amsaa", "failure_recovery_stats", "gauge_rr"]

_D38 = "decimal(38,0)"
_DQ9 = "decimal(38,9)"
_US_PER_DAY = 86_400_000_000


def crow_amsaa(
    failures: DataFrame,
    group_col: str,
    ts_col: str,
    origin_expr: Column | None = None,
) -> DataFrame:
    """Failure-truncated Crow-AMSAA MLE per group. ``failures`` holds
    one row per failure; ``origin_expr`` (default: the global MIN of
    ``ts_col``, one broadcast row) anchors t = 0. Failures at or
    before the origin are excluded (t must be > 0); groups need
    n >= 2 and at least one t_i < t_n, else NULL estimates."""
    us = F.unix_micros(F.col(ts_col))
    base = failures.select(
        F.col(group_col).alias("grp"), us.alias("us")
    )
    if origin_expr is None:
        org = base.agg(F.min("us").alias("org_us"))
    else:
        org = failures.agg(
            F.min(F.unix_micros(origin_expr)).alias("org_us")
        )
    rel = (
        base.crossJoin(F.broadcast(org))
        .select("grp", (F.col("us") - F.col("org_us")).alias("t"))
        .filter(F.col("t") > 0)
    )
    tn = rel.groupBy("grp").agg(F.max("t").alias("tn"))
    terms = rel.join(tn, "grp").select(
        "grp",
        "tn",
        F.round(
            F.log(F.col("tn").cast("double") / F.col("t").cast("double")),
            9,
        )
        .cast(_DQ9)
        .alias("lt"),
    )
    agg = terms.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_failures"),
        F.sum("lt").cast(_DQ9).alias("sum_ln"),
        F.max("tn").alias("tn"),
    )
    t_days = F.col("tn").cast("double") / F.lit(float(_US_PER_DAY))
    beta = F.when(
        (F.col("n_failures") >= 2) & (F.col("sum_ln") > 0),
        F.col("n_failures").cast("double")
        / F.col("sum_ln").cast("double"),
    )
    return agg.select(
        "grp",
        "n_failures",
        t_days.alias("t_days"),
        F.round(beta, 9).alias("beta"),
        F.round(
            F.col("n_failures").cast("double") / F.pow(t_days, beta), 6
        ).alias("lambda_day"),
        (beta < 1.0).alias("improving"),
    )


def failure_recovery_stats(
    events: DataFrame,
    group_col: Column | str,
    entity_col: str,
    ts_col: str,
    failure_pred: Column,
    recovery_pred: Column,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-group MTBF / MTTR / merged-downtime availability over an
    entity-keyed event log. A failure's repair window runs to the
    entity's NEXT recovery-predicate event strictly after it (NULL if
    none — counted in n_failures but not in MTTR/downtime).
    Availability = 1 - merged_downtime / (entities * global span):
    overlapping repair windows within an entity are union-merged
    first (islands pass), so wall-clock downtime never double-counts.
    MTBF averages an entity's consecutive failure gaps. Event windows
    order by (ts, ``tiebreak_col``) so same-microsecond events rank
    deterministically."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    base = events.select(
        g.alias("grp"),
        F.col(entity_col).alias("ent"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(tiebreak_col).alias("tb"),
        failure_pred.alias("is_f"),
        recovery_pred.alias("is_r"),
    )
    span = base.agg(
        (F.max("us") - F.min("us")).cast("long").alias("span_us")
    )
    w_next = (
        Window.partitionBy("ent")
        .orderBy("us", "tb")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    rec_us = F.min(F.when(F.col("is_r"), F.col("us"))).over(w_next)
    fails = base.withColumn("rec_us", rec_us).filter(F.col("is_f"))
    w_prev = Window.partitionBy("ent").orderBy("us", "tb")
    gap = F.col("us") - F.lag("us").over(w_prev)
    fails = fails.withColumn("gap_us", gap)
    # merged downtime islands over (us, rec_us) intervals per entity
    iv = fails.filter(F.col("rec_us").isNotNull()).select(
        "grp", "ent", "us", "tb", "rec_us"
    )
    w_run = (
        Window.partitionBy("ent")
        .orderBy("us", "tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max("rec_us").over(w_run)
    iv = iv.withColumn(
        "new_island",
        F.when(
            prev_end.isNull() | (F.col("us") > prev_end), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    w_isl = (
        Window.partitionBy("ent")
        .orderBy("us", "tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    iv = iv.withColumn("island", F.sum("new_island").over(w_isl))
    islands = iv.groupBy("grp", "ent", "island").agg(
        (F.max("rec_us") - F.min("us")).cast("long").alias("down_us")
    )
    down = islands.groupBy("grp").agg(
        F.sum("down_us").cast("long").alias("downtime_us")
    )
    ents = base.groupBy("grp").agg(
        F.countDistinct("ent").cast("long").alias("n_entities")
    )
    stats = fails.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_failures"),
        F.count("rec_us").cast("long").alias("n_recovered"),
        F.sum(F.when(F.col("rec_us").isNotNull(),
                     F.col("rec_us") - F.col("us")))
        .cast("long")
        .alias("ttr_sum_us"),
        F.sum("gap_us").cast("long").alias("gap_sum_us"),
        F.count("gap_us").cast("long").alias("n_gaps"),
    )
    out = (
        stats.join(down, "grp", "left")
        .join(ents, "grp")
        .crossJoin(F.broadcast(span))
    )
    dt = F.coalesce(F.col("downtime_us"), F.lit(0).cast("long"))
    return out.select(
        "grp",
        "n_failures",
        "n_recovered",
        F.when(
            F.col("n_gaps") > 0,
            (
                F.col("gap_sum_us").cast("double")
                / F.col("n_gaps").cast("double")
            )
            / F.lit(1_000_000.0),
        ).alias("mtbf_sec"),
        F.when(
            F.col("n_recovered") > 0,
            (
                F.col("ttr_sum_us").cast("double")
                / F.col("n_recovered").cast("double")
            )
            / F.lit(1_000_000.0),
        ).alias("mttr_sec"),
        dt.alias("downtime_us"),
        "n_entities",
        (
            F.lit(1.0)
            - dt.cast("double")
            / (F.col("n_entities").cast(_D38) * F.col("span_us"))
            .cast(_D38)
            .cast("double")
        ).alias("availability"),
    )


def gauge_rr(
    df: DataFrame,
    part_col: str,
    operator_col: str,
    value_col,
) -> DataFrame:
    """Crossed Gauge R&R from the two-way ANOVA EMS equations on a
    BALANCED layout (every part x operator cell has the same replicate
    count r). Emits the variance components, %GRR / %part of total
    variance, and ndc. ``balanced`` is verified from the cell counts;
    when false the EMS algebra does not apply and the component
    columns are NULL."""
    from .dq import two_way_anova

    v = (
        F.col(value_col) if isinstance(value_col, str) else value_col
    ).cast("long")
    cells = (
        df.select(
            F.col(part_col).alias("fa"),
            F.col(operator_col).alias("fb"),
            v.alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("fa", "fb")
        .agg(F.count("*").cast("long").alias("nc"))
        .agg(
            F.min("nc").alias("nc_min"),
            F.max("nc").alias("nc_max"),
        )
    )
    a = two_way_anova(df, part_col, operator_col, value_col)
    one = a.crossJoin(F.broadcast(cells))
    p = (F.col("df_a") + 1).cast("long")
    o = (F.col("df_b") + 1).cast("long")
    balanced = F.col("nc_min") == F.col("nc_max")
    r = F.col("nc_min").cast("long")
    ms_a = F.col("ss_a") / F.col("df_a").cast("double")
    ms_b = F.col("ss_b") / F.col("df_b").cast("double")
    ms_ab = F.col("ss_ab") / F.col("df_ab").cast("double")
    ms_e = F.col("ss_err") / F.col("df_err").cast("double")
    var_rep = ms_e
    var_int = F.greatest(
        F.lit(0.0), (ms_ab - ms_e) / r.cast("double")
    )
    var_op = F.greatest(
        F.lit(0.0), (ms_b - ms_ab) / (p * r).cast("double")
    )
    var_part = F.greatest(
        F.lit(0.0), (ms_a - ms_ab) / (o * r).cast("double")
    )
    var_grr = var_rep + var_op + var_int
    total = var_grr + var_part
    guard = lambda c: F.when(balanced, c)  # noqa: E731
    return one.select(
        F.col("n").alias("n_meas"),
        p.alias("p_parts"),
        o.alias("o_operators"),
        guard(r).alias("r_reps"),
        balanced.alias("balanced"),
        guard(var_rep).alias("var_repeat"),
        guard(var_int).alias("var_interaction"),
        guard(var_op).alias("var_operator"),
        guard(var_part).alias("var_part"),
        guard(var_grr).alias("var_grr"),
        guard(
            F.when(total > 0, F.round(var_grr / total, 9))
        ).alias("pct_grr"),
        guard(
            F.when(total > 0, F.round(var_part / total, 9))
        ).alias("pct_part"),
        guard(
            F.when(
                var_grr > 0,
                F.floor(
                    F.lit(1.41) * F.sqrt(var_part / var_grr)
                ).cast("long"),
            )
        ).alias("ndc"),
    )
