"""Probabilistic record linkage: Fellegi-Sunter match weights.

Charter §2B extension (no reference counterpart — RoberWaters/ETL-Java,
src/etl/ETLProcess.java:1-568; the reference's PK-upsert world assumes
clean keys — this module is what you run when keys are dirty). Pairs
come from the blocking operators that already exist
(relational.sorted_neighborhood_pairs, the LSH families in dedup.py);
this module turns labeled candidate pairs into the classic
Fellegi-Sunter m/u probabilities and per-pattern likelihood ratios.

Determinism: every statistic is a ratio of exact integer counts
evaluated through one fixed double expression — no logs (log-odds are
one ln away but engine-dependent at the last ulp; callers that need
log weights apply their own rounding), no iteration (supervised m/u
from labeled pairs, not EM — the EM fixpoint is not SQL-replayable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fellegi_sunter_weights(
    pairs: DataFrame,
    agreement_cols: list[str],
    label_col: str,
) -> DataFrame:
    """Per-field m/u probabilities and per-agreement-pattern composite
    likelihood ratios from LABELED candidate pairs.

    Input: one row per candidate pair with boolean ``agreement_cols``
    (did the two records agree on name / address / birth-year / ...)
    and a boolean ``label_col`` (ground-truth match). Output: one row
    per observed agreement PATTERN with

        m_k = P(agree on field k | match)
        u_k = P(agree on field k | non-match)
        ratio = product over fields of (m_k/u_k if agree else
                (1-m_k)/(1-u_k))

    — the Fellegi-Sunter composite likelihood ratio under the standard
    conditional-independence assumption; rank patterns by it and cut at
    the review threshold. Patterns, not pairs, are the output: at 100 TB
    the pair table is huge but the pattern table is <= 2^k rows, and
    scoring unlabeled pairs is a broadcast pattern-join.

    Shape: ONE aggregate over the pair table for all m/u counts
    (map-side combinable), a second grouped count by pattern, and the
    ratio assembled as a fixed product expression — exact-count
    divisions only. Returns (pattern string "110..", n_pairs, n_match,
    ratio) with ratio rounded to 9.
    """
    k = len(agreement_cols)
    if not 1 <= k <= 16:
        raise ValueError("agreement_cols must list 1..16 fields")
    lab = F.col(label_col).cast("int")
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.sum(lab).cast("long").alias("nm"),
    ]
    # NULL agreement (the comparison itself was impossible — a missing
    # field) is treated as DISAGREE consistently in BOTH the m/u counts
    # and the pattern string; without the coalesce the NULL would
    # null-propagate the pattern into one opaque bucket while silently
    # dropping the pair from am/au, biasing every field's weights
    agr = {c: F.coalesce(F.col(c).cast("int"), F.lit(0)) for c in agreement_cols}
    for c in agreement_cols:
        a = agr[c]
        aggs.append(F.sum(a * lab).cast("long").alias(f"am_{c}"))
        aggs.append(F.sum(a * (1 - lab)).cast("long").alias(f"au_{c}"))
    tot = pairs.agg(*aggs)

    pattern = F.concat(
        *[agr[c].cast("string") for c in agreement_cols]
    )
    per_pat = pairs.groupBy(pattern.alias("pattern")).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(lab).cast("long").alias("n_match"),
    )
    j = per_pat.crossJoin(F.broadcast(tot))
    nm = F.col("nm").cast("double")
    nu = (F.col("n") - F.col("nm")).cast("double")
    # try_divide throughout: a zero denominator (no labeled matches /
    # non-matches; a field no non-match agrees on, u=0; a field every
    # non-match agrees on, u=1) yields NULL — exactly DuckDB's x/0
    # semantics, so the oracle replays the degenerate cells verbatim
    # instead of Spark's ANSI divide-by-zero raise or an invented inf.
    ratio = F.lit(1.0)
    for i, c in enumerate(agreement_cols):
        m = F.try_divide(F.col(f"am_{c}").cast("double"), nm)
        u = F.try_divide(F.col(f"au_{c}").cast("double"), nu)
        agree = F.substring(F.col("pattern"), i + 1, 1) == "1"
        ratio = ratio * F.when(agree, F.try_divide(m, u)).otherwise(
            F.try_divide(F.lit(1.0) - m, F.lit(1.0) - u)
        )
    return j.select(
        "pattern", "n_pairs", "n_match", F.round(ratio, 9).alias("ratio")
    )
