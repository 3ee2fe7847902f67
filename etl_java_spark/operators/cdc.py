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
