"""Calendar arithmetic: business-day counting as pure integer
expressions — engine-agnostic (no dayofweek(), whose week-start and
numbering conventions differ across engines) and whole-stage-codegen
JVM-side.

Charter §2B extension (no reference counterpart — RoberWaters/ETL-Java,
src/etl/ETLProcess.java:1-568). SLA/latency reporting in business days
is the classic warehouse requirement naive DATEDIFF gets wrong every
weekend.

All modulo arithmetic here is FLOOR-mod (``((x % 7) + 7) % 7``), not
the engines' sign-following ``%``: epoch days are negative before
1970-01-01, and a sign-following mod would mis-classify every pre-1970
weekday (found by review — the two engines share the flaw, so an
oracle comparison alone cannot catch it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 1970-01-01 (epoch day 0) was a Thursday; shifting epoch days by +3
#: makes the shifted count start on a Monday, so floor-mod 7 is the
#: Monday-0 weekday index and the floor-div counts completed weeks.
_EPOCH_SHIFT = 3


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _shifted_epoch(date_col) -> Column:
    e = F.datediff(_c(date_col), F.lit("1970-01-01").cast("date"))
    return e + F.lit(_EPOCH_SHIFT)


def weekday_monday0(date_col) -> Column:
    """Monday-0 weekday index, valid for ANY date (floor-mod)."""
    s = _shifted_epoch(date_col)
    return ((s % 7) + 7) % 7


def weekdays_up_to(date_col) -> Column:
    """Number of weekdays (Mon-Fri) in [1970-01-01, date] inclusive
    (negative prefix count for pre-1970 dates — differences stay
    correct): 5 per completed Monday-started week plus
    min(partial-week position + 1, 5). Pure int64 arithmetic; the
    floor-div is exact because (s - floormod(s, 7)) is a multiple
    of 7. Public (paired with weekdays_up_to_sql) — date_spine's
    busday_seq shares it."""
    s = _shifted_epoch(date_col)
    m = ((s % 7) + 7) % 7
    return F.lit(5) * (s - m) / 7 + F.least(m + 1, F.lit(5))



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
    are the caller's truncation policy. Valid for any date range,
    pre-1970 included (floor-mod weekday arithmetic).
    """
    d1, d2 = _c(start_col), _c(end_col)
    out = (weekdays_up_to(d2) - weekdays_up_to(d1)).cast("long")
    for h in holidays or []:
        hd = F.lit(h).cast("date")
        is_weekday = weekday_monday0(hd) < 5
        inside = (hd > d1) & (hd <= d2)
        rev = (hd > d2) & (hd <= d1)  # anti-symmetric for reversed spans
        out = out - F.when(is_weekday & inside, F.lit(1)).otherwise(
            F.when(is_weekday & rev, F.lit(-1)).otherwise(F.lit(0))
        )
    return out


def _shifted_epoch_sql(date_expr: str) -> str:
    return f"(date_diff('day', DATE '1970-01-01', {date_expr}) + {_EPOCH_SHIFT})"


def weekdays_up_to_sql(date_expr: str) -> str:
    """DuckDB twin of the weekday prefix count (keep in lockstep)."""
    s = _shifted_epoch_sql(date_expr)
    m = f"((({s}) % 7 + 7) % 7)"
    return f"(5 * ((({s}) - {m}) / 7) + LEAST({m} + 1, 5))"


def business_days_between_sql(
    start_expr: str, end_expr: str, holidays: list[str] | None = None
) -> str:
    """DuckDB twin of :func:`business_days_between` (keep in lockstep)."""
    base = (
        f"CAST({weekdays_up_to_sql(end_expr)} "
        f"- {weekdays_up_to_sql(start_expr)} AS BIGINT)"
    )
    terms = []
    for h in holidays or []:
        s = _shifted_epoch_sql(f"DATE '{h}'")
        wd = f"((({s}) % 7 + 7) % 7 < 5)"
        terms.append(
            f"- (CASE WHEN {wd} AND DATE '{h}' > {start_expr} "
            f"AND DATE '{h}' <= {end_expr} THEN 1 "
            f"WHEN {wd} AND DATE '{h}' > {end_expr} "
            f"AND DATE '{h}' <= {start_expr} THEN -1 ELSE 0 END)"
        )
    return "(" + base + " " + " ".join(terms) + ")"
