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


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Snapshot-to-snapshot dataset diff by key + content fingerprint:
    one row per changed key, with status 'added' / 'removed' / 'changed'.

    The comparison never ships row contents through the shuffle twice:
    each side is reduced to (key, xxhash64 of every non-key column) and
    the two fingerprint tables are full-outer joined on the key — the
    shuffle moves keys + 8-byte hashes, not payloads. At 100 TB this is
    how you audit what a rebuild changed without diffing bytes: O(keys)
    network, map-side hash computation, one shuffle.

    Unchanged keys are dropped (they are the overwhelming majority in an
    incremental world — emitting them would make the diff O(table)).
    """
    def fp(df: DataFrame) -> DataFrame:
        # xxhash64 SKIPS null inputs (a null contributes nothing to the
        # accumulator), so (null, x) vs (x, null) would collide if the
        # raw columns were hashed together. Pre-hashing each column
        # individually fixes the position ambiguity: a null column still
        # contributes one long (the seed) to the outer hash.
        payload = [c for c in df.columns if c not in key_cols]
        cols = [F.xxhash64(F.col(c)) for c in payload]
        return df.select(*key_cols, F.xxhash64(*cols).alias("__fp"))

    o = fp(old).withColumnRenamed("__fp", "__fp_old")
    n = fp(new).withColumnRenamed("__fp", "__fp_new")
    j = o.join(n, on=key_cols, how="full_outer")
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )
