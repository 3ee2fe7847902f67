"""Calendar arithmetic: business-day counting as pure integer
expressions — engine-agnostic (no dayofweek(), whose week-start and
numbering conventions differ across engines) and whole-stage-codegen
JVM-side.

Charter §2B extension (no reference counterpart — RoberWaters/ETL-Java,
src/etl/ETLProcess.java:1-568). SLA/latency reporting in business days
is the classic warehouse requirement naive DATEDIFF gets wrong every
weekend.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 1970-01-01 (epoch day 0) was a Thursday; shifting epoch days by +3
#: makes the shifted count start on a Monday, so ``s % 7`` is the
#: Monday-0 weekday index and ``s // 7`` counts completed weeks.
_EPOCH_SHIFT = 3


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _weekdays_up_to(date_col) -> Column:
    """Number of weekdays (Mon-Fri) in [1970-01-01, date] inclusive —
    the closed-form prefix count: 5 per completed Monday-started week
    plus min(partial-week position + 1, 5). Pure int64 arithmetic on
    epoch days; identical in any SQL engine."""
    e = F.datediff(_c(date_col), F.lit("1970-01-01").cast("date"))
    s = e + F.lit(_EPOCH_SHIFT)
    return F.lit(5) * (s - s % 7) / 7 + F.least(s % 7 + 1, F.lit(5))


def business_days_between(
    start_col,
    end_col,
    holidays: list[str] | None = None,
) -> Column:
    """Business days in the half-open interval (start, end]: weekdays
    counted by the closed-form prefix difference, minus any listed
    holiday that falls on a weekday inside the interval. ``holidays``
    is a SMALL literal list (company calendar — metadata by nature);
    each contributes one fixed CASE term, keeping the whole expression
    a single codegen stage with no join. Negative when end < start
    (anti-symmetric, like DATEDIFF). Dates only — time-of-day cutoffs
    are the caller's truncation policy.
    """
    d1, d2 = _c(start_col), _c(end_col)
    out = (_weekdays_up_to(d2) - _weekdays_up_to(d1)).cast("long")
    for h in holidays or []:
        hd = F.lit(h).cast("date")
        he = F.datediff(hd, F.lit("1970-01-01").cast("date"))
        is_weekday = (he + _EPOCH_SHIFT) % 7 < 5
        inside = (hd > d1) & (hd <= d2)
        rev = (hd > d2) & (hd <= d1)  # anti-symmetric for reversed spans
        out = out - F.when(is_weekday & inside, F.lit(1)).otherwise(
            F.when(is_weekday & rev, F.lit(-1)).otherwise(F.lit(0))
        )
    return out


def weekdays_up_to_sql(date_expr: str) -> str:
    """DuckDB twin of the weekday prefix count (keep in lockstep)."""
    e = f"date_diff('day', DATE '1970-01-01', {date_expr})"
    s = f"({e} + {_EPOCH_SHIFT})"
    return f"(5 * (({s} - {s} % 7) / 7) + LEAST({s} % 7 + 1, 5))"


def business_days_between_sql(
    start_expr: str, end_expr: str, holidays: list[str] | None = None
) -> str:
    """DuckDB twin of :func:`business_days_between`."""
    base = (
        f"CAST({weekdays_up_to_sql(end_expr)} "
        f"- {weekdays_up_to_sql(start_expr)} AS BIGINT)"
    )
    terms = []
    for h in holidays or []:
        he = f"date_diff('day', DATE '1970-01-01', DATE '{h}')"
        wd = f"(({he} + {_EPOCH_SHIFT}) % 7 < 5)"
        terms.append(
            f"- (CASE WHEN {wd} AND DATE '{h}' > {start_expr} "
            f"AND DATE '{h}' <= {end_expr} THEN 1 "
            f"WHEN {wd} AND DATE '{h}' > {end_expr} "
            f"AND DATE '{h}' <= {start_expr} THEN -1 ELSE 0 END)"
        )
    return "(" + base + " " + " ".join(terms) + ")"
