"""Incremental aggregate maintenance (partial-aggregate merge).

Charter §2B extension (the reference, src/etl/ETLProcess.java:1-568,
recomputes nothing — it has no aggregates at all). At 100 TB you cannot
re-scan the full table because a day of new data arrived: you keep a
materialized PARTIAL aggregate per group and fold each delta batch into
it. This works for any algebraic aggregate — one whose state is a
fixed-size mergeable summary: count, sum, min, max, and everything
derivable from them at finalize time (avg = sum/count).

The merge is itself a Spark aggregation, so it is shuffle-minimal (one
shuffle on the group keys over base ∪ delta, and the base side is
already one row per group — the shuffle moves O(groups + delta), not
O(table)) and map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregate name -> (state builder, state merger)
_ALGEBRAIC = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _check(spec: dict[str, tuple[str, str | None]]) -> None:
    for out, (op, _src) in spec.items():
        if op not in _ALGEBRAIC:
            raise ValueError(
                f"{out}: {op!r} is not algebraic-mergeable (supported: {sorted(_ALGEBRAIC)})"
            )


def partial_aggs(
    df: DataFrame, keys: list[str], spec: dict[str, tuple[str, str | None]]
) -> DataFrame:
    """Build the partial-aggregate state for one batch.

    ``spec`` maps output column -> (op, source column); ``count`` takes
    no source (pass None). E.g.::

        {"n": ("count", None), "revenue": ("sum", "price"),
         "first_dt": ("min", "dt")}
    """
    _check(spec)
    aggs = [
        _ALGEBRAIC[op][0](src).alias(out) if src is not None else _ALGEBRAIC[op][0](None).alias(out)
        for out, (op, src) in spec.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    parts: list[DataFrame], keys: list[str], spec: dict[str, tuple[str, str | None]]
) -> DataFrame:
    """Fold partial states together: union then merge-aggregate. The
    result equals ``partial_aggs`` over the concatenated inputs — the
    associativity that makes incremental maintenance sound (property-
    tested in tests/test_incremental.py)."""
    _check(spec)
    if not parts:
        raise ValueError("no partials to merge")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merges = [_ALGEBRAIC[op][1](out).alias(out) for out, (op, _src) in spec.items()]
    return u.groupBy(*keys).agg(*merges)


def incremental_join(
    base_left: DataFrame,
    base_right: DataFrame,
    delta_left: DataFrame,
    delta_right: DataFrame,
    on: list[str],
) -> DataFrame:
    """Delta rows for an inner-join materialization under inserts.

    The classic incremental-view-maintenance identity: with inserts
    ΔL / ΔR arriving on top of bases L / R,

        Δ(L ⋈ R) = (ΔL ⋈ R) ∪ (L ⋈ ΔR) ∪ (ΔL ⋈ ΔR)

    Append the returned rows to the stored join — no recompute of
    L ⋈ R. At 100 TB this is the difference between shuffling two full
    fact tables nightly and shuffling O(delta): the base sides enter
    each term as probe-side scans keyed by the join columns (bucketed
    bases join with no exchange at all), and the delta sides are small
    enough that AQE broadcasts them.

    Inserts only (the fixtures' CDC deletes/updates route through
    operators/cdc.py compaction first, which reduces them to inserts of
    current rows).
    """
    new = (
        delta_left.join(base_right, on)
        .unionByName(base_left.join(delta_right, on))
        .unionByName(delta_left.join(delta_right, on))
    )
    return new


def incremental_join_equals_full(
    base_left: DataFrame,
    base_right: DataFrame,
    delta_left: DataFrame,
    delta_right: DataFrame,
    on: list[str],
) -> DataFrame:
    """Materialized view after the delta fold: stored join + delta rows.

    Equals ``(L ∪ ΔL) ⋈ (R ∪ ΔR)`` by the IVM identity — which is what
    the oracle recomputes from scratch (q134)."""
    stored = base_left.join(base_right, on)
    return stored.unionByName(
        incremental_join(base_left, base_right, delta_left, delta_right, on)
    )
