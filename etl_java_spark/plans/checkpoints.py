"""Checkpoint strategy for iterative operators (PageRank, connected
components): cap lineage growth per round WITHOUT giving up fault
tolerance on a real cluster.

``localCheckpoint`` stores blocks on executors only — fast, but an
executor loss mid-iteration kills the job (no lineage left to recompute,
no replication). Fine on local[N]; a reliability bug at 1000 executors.
``df.checkpoint()`` writes to the SparkContext's checkpoint directory
(HDFS/S3 in production), surviving executor loss at the cost of a
write-out per round.

``make_checkpointer`` picks per call site: pass ``checkpoint_dir`` for
the reliable path (the production default on a cluster), leave it None
for the local-mode fast path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def make_checkpointer(
    checkpoint_dir: str | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Return a ``df -> materialized df`` function.

    With ``checkpoint_dir``: sets the context's checkpoint dir (idempotent;
    last setting wins, which is fine — the dir is per-job) and uses
    reliable ``df.checkpoint(eager=True)``. Without: executor-local
    ``df.localCheckpoint(eager=True)``.
    """
    if checkpoint_dir is None:
        return lambda df: df.localCheckpoint(eager=True)

    def _reliable(df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        sc.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=True)

    return _reliable
