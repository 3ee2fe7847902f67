"""Change-data-capture compaction and SCD2 historization (charter §2B).

The reference's whole purpose is landing source rows into a destination
with upsert semantics (ETLProcess.java:208-282, per-row UPDATE-then-
INSERT). At warehouse scale the same need appears as a *changelog*: a
stream/batch of (pk, change_ts, op, payload) rows that must be compacted
to the current snapshot (latest-wins upsert + delete) or historized into
SCD2 validity intervals. Both are pure window-function plans:

- one shuffle on the PK, no joins, no driver-side state;
- map-side combine does not apply (row_number needs the full group), but
  the group is one key's change history — bounded and skew-resistant as
  long as a single PK's history fits a task (true by construction for
  real CDC feeds);
- at 100 TB the changelog is typically date-partitioned: the snapshot
  compaction prunes to the partitions since the last checkpoint and
  merges into the base table via sinks.writers.merge_by_pk.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(
    changelog: DataFrame,
    pks: Sequence[str],
    ts_col: str,
    seq_cols: Sequence[str] = (),
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Compact a changelog to the current snapshot: latest row per PK
    wins; a PK whose latest op is ``delete_op`` disappears.

    ``seq_cols`` breaks change-timestamp ties deterministically (e.g. a
    log sequence number) — required for engines to agree when two
    changes share a timestamp.
    """
    if not pks:
        raise ValueError("latest_snapshot requires at least one primary-key column")
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in seq_cols]
    w = Window.partitionBy(*[F.col(p) for p in pks]).orderBy(*order)
    out = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        out = out.filter(F.col(op_col) != delete_op)
    return out


def scd2_history(
    changelog: DataFrame,
    pks: Sequence[str],
    ts_col: str,
    seq_cols: Sequence[str] = (),
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Historize a changelog into SCD2 validity intervals.

    Each change row becomes a version with ``valid_from`` = its change
    timestamp and ``valid_to`` = the next change's timestamp for the same
    PK (NULL while current). Delete rows close the preceding version's
    interval but emit no version themselves, so a deleted PK has no
    current row.
    """
    if not pks:
        raise ValueError("scd2_history requires at least one primary-key column")
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in seq_cols]
    w = Window.partitionBy(*[F.col(p) for p in pks]).orderBy(*order)
    out = changelog.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )
    if op_col is not None:
        out = out.filter(F.col(op_col) != delete_op)
    return out.withColumn("is_current", F.col("valid_to").isNull())


def restatement_report(
    df: DataFrame,
    event_ts_col: str,
    arrival_ts_col: str,
    cents_col,
    grain: str = "day",
) -> DataFrame:
    """Bitemporal restatement audit: for each EVENT-time bucket, compare
    the total as it stood at the bucket's close (only rows that had
    ARRIVED by then) against the final total once late data landed —
    the "why did yesterday's revenue change?" report every warehouse
    with late-arriving facts eventually needs.

    Per event-time bucket:
    - ``initial_cents``: sum of rows whose arrival fell inside the
      bucket itself (visible when the day was first reported);
    - ``final_cents``: sum of all rows for the bucket;
    - ``restated_cents`` = final - initial (the late mass);
    - ``n_late`` and ``max_lag_seconds``: how many rows arrived after
      the bucket closed and how stale the worst one was.

    All exact integers from ONE conditional aggregate over one scan —
    the bitemporal split is a predicate (arrival < bucket end), not a
    join. Scale: one shuffle on the bucket key, map-side combined.
    """
    bucket = F.date_trunc(grain, F.col(event_ts_col))
    bucket_end = bucket + F.expr(f"INTERVAL 1 {grain}")
    on_time = F.col(arrival_ts_col) < bucket_end
    cents = (
        F.col(cents_col) if isinstance(cents_col, str) else cents_col
    ).cast("long")
    lag = F.col(arrival_ts_col).cast("long") - F.col(event_ts_col).cast(
        "long"
    )
    d38 = "decimal(38,0)"
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.when(on_time, cents).otherwise(0).cast(d38))
            .cast("long")
            .alias("initial_cents"),
            F.sum(cents.cast(d38)).cast("long").alias("final_cents"),
            F.sum(F.when(~on_time, 1).otherwise(0))
            .cast("long")
            .alias("n_late"),
            F.max(F.when(~on_time, lag)).alias("max_lag_seconds"),
        )
        .withColumn(
            "restated_cents", F.col("final_cents") - F.col("initial_cents")
        )
    )


def latest_nonnull_merge(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    seq_col: str | None = None,
) -> DataFrame:
    """Recency survivorship merge: one golden row per key where each
    column independently takes its value from the LATEST row in which
    that column was non-null — the standard MDM rule ("newest known
    phone number, newest known address", even if they arrived on
    different updates). ``dedup.cluster_golden_records`` picks by
    column MAX; this picks by column RECENCY.

    One grouped aggregate: per column a ``max_by`` whose ordering key
    is (ts, seq) and is NULL when the column is NULL — max_by ignores
    NULL ordering keys, so absent values never steal the slot.
    Deterministic under ts ties via ``seq_col`` (pass the changelog's
    sequence/id column; defaults to the timestamp only).

    Returns (key, n_versions, last_ts, <value_cols...>).
    """
    order = (
        F.struct(F.col(ts_col), F.col(seq_col))
        if seq_col
        else F.struct(F.col(ts_col))
    )
    aggs = [
        F.count("*").cast("long").alias("n_versions"),
        F.max(F.col(ts_col)).alias("last_ts"),
    ]
    for c in value_cols:
        aggs.append(
            F.max_by(
                F.col(c), F.when(F.col(c).isNotNull(), order)
            ).alias(c)
        )
    return df.groupBy(key_col).agg(*aggs)


def bitemporal_snapshot(
    versions: DataFrame,
    key_cols: list[str] | str,
    valid_from_col: str,
    tx_from_col: str,
    as_of_valid,
    as_of_tx,
) -> DataFrame:
    """Bitemporal as-of query: "what did we BELIEVE as of transaction
    time T about the state VALID at time V?" — the two-clock lookup
    behind restatement-safe reporting (a late correction recorded
    yesterday must not rewrite last month's published report, yet
    today's report must see it). The SCD2 history (:func:`scd2_history`)
    tracks one clock; this adds the second.

    Per key, among versions with tx_from <= T (known by then) and
    valid_from <= V (in effect at V), the winner is the one with the
    LATEST valid_from, ties broken by latest tx_from (the most recent
    correction of the effective version). One filter + one window over
    the key — the same single-shuffle shape as every SCD lookup here,
    and both the filter predicates and the (valid_from, tx_from)
    ordering are exact comparisons, so the snapshot replays in SQL.
    Returns the winning version rows (all original columns).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    vf, tf = F.col(valid_from_col), F.col(tx_from_col)
    w = Window.partitionBy(*keys).orderBy(vf.desc(), tf.desc())
    return (
        versions.filter((tf <= F.lit(as_of_tx)) & (vf <= F.lit(as_of_valid)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
