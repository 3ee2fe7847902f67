"""Structured Streaming slice over the events table (charter §2B / SURVEY §7-6).

The reference is strictly batch (SURVEY.md §1.1 row "streams: none");
this module provides the streaming operators a modern pipeline needs:
watermarked tumbling/sliding/session windows, streaming dedup, and a
foreachBatch merge sink (streaming MERGE is not native — foreachBatch is
the documented pattern).

All builders take a streaming DataFrame and return a streaming DataFrame,
so they compose. ``read_events_stream`` replays the parquet fixture as a
file-source stream for tests (one file = one micro-batch); in production
the same code runs off Kafka by swapping the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Two fixture vintages exist (see sources/readers.normalize_nanos):
# TIMESTAMP(NANOS) which Spark reads as int64 nanos under the
# nanosAsLong conf, and TIMESTAMP_MICROS (isAdjustedToUTC=false).
# ``read_events_stream`` sniffs the parquet footer and picks the
# matching schema, so a driver-regenerated fixture in either vintage
# streams identically to the batch path.
EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)
EVENTS_SCHEMA_NANOS = EVENTS_SCHEMA.replace("ts TIMESTAMP", "ts BIGINT")


def _ts_stored_as_long(dir_path: str, glob_pat: str) -> bool:
    """Peek at one matching file's footer: True for the NANOS-as-long
    vintage (streams can't apply the batch reader's runtime dispatch, so
    the vintage must be resolved before the schema is declared)."""
    import glob as _glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    matches = sorted(_glob.glob(os.path.join(dir_path, glob_pat)))
    if not matches:
        return False
    probe = matches[0]
    if os.path.isdir(probe):
        # Spark-written "file": a directory of part files (the normal
        # production layout). Footer-peek one part instead.
        parts = sorted(_glob.glob(os.path.join(probe, "*.parquet")))
        if not parts:
            return False
        probe = parts[0]
    field = pq.ParquetFile(probe).schema_arrow.field("ts")
    return pa.types.is_int64(field.type)


def read_events_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int = 1, glob: str = "events.parquet"
) -> DataFrame:
    """File-source stream replaying events parquet from a directory.

    One file per micro-batch; in production swap for Kafka — the
    transformations downstream are identical.
    """
    from ..sources.readers import ensure_fixture_confs

    ensure_fixture_confs(spark)
    nanos = _ts_stored_as_long(dir_path, glob)
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA_NANOS if nanos else EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(dir_path)
    )
    if nanos:
        # integer division, exactly as normalize_nanos does on the batch path
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # MICROS vintage: reading NTZ micros under an explicit TIMESTAMP
    # schema interprets the wall-clock in the UTC-pinned session zone —
    # identical instants to the batch path.
    return raw


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts+sums per event_type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        # decimal-exact sum: order-independent across micro-batch
        # boundaries AND bitwise-equal to the batch/oracle twin
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "15 minutes", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of silence."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, keys: list[str], watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup with bounded state (watermark evicts old keys)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete") -> DataFrame:
    """Drive a finite file-source stream to completion into a memory sink.

    Test/dev helper: processAllAvailable() + stop, then return the batch
    result as a DataFrame.
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.table(name)


def stream_stream_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
    flush_sentinel: bool = False,
) -> DataFrame:
    """Stream-stream join: each left event paired with the right events
    of the same user in the preceding ``within`` interval.

    Both sides carry watermarks + a time-range join condition, so state
    for each side is evicted once the other side's watermark passes —
    the requirement for bounded state in stream-stream joins.

    ``how="leftOuter"`` additionally emits NULL-padded left rows once
    eviction proves no right row can ever match — the attribution-gap
    query ("purchases with no preceding click"). Outer rows only
    materialize when the watermark passes them, and the engine holds an
    extra internal margin past the nominal watermark (measured on the
    drained fixture: the last few hours stay unemitted). For BOUNDED
    drains that must account for every left row, ``flush_sentinel=True``
    unions far-future sentinel rows (non-matching negative user ids,
    ts + 1000 days) into BOTH sides before the watermark operator: the
    sentinels drive the final watermark past every real row plus any
    internal margin, so the drained state equals the batch LEFT JOIN
    exactly. Sentinel rows (negative user ids) APPEAR IN THE OUTPUT and
    must be filtered by the consumer AFTER the sink: a filter added
    here looks harmless, but Catalyst pushes a deterministic
    left-column predicate below the EventTimeWatermark node on the
    left branch — silently deleting the left sentinels before they can
    advance the watermark (measured: the flush quietly stops working
    and the tail rows go missing again). The same punctuation trick
    closes out a day's outer-join state deterministically in
    production; it assumes the sentinels arrive with/after the real
    data (single-batch drains qualify trivially).
    """
    lraw = events.filter(F.col("event_type") == left_type).select(
        F.col("event_id").alias("l_id"),
        F.col("user_id"),
        F.col("ts").alias("l_ts"),
        F.col("value").alias("l_value"),
    )
    rraw = events.filter(F.col("event_type") == right_type).select(
        F.col("event_id").alias("r_id"),
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    if flush_sentinel:
        bump = F.expr("INTERVAL 1000 DAYS")
        lraw = lraw.unionByName(
            lraw.select(
                (-F.col("l_id") - 1).alias("l_id"),
                F.lit(-1).cast("long").alias("user_id"),
                (F.col("l_ts") + bump).alias("l_ts"),
                "l_value",
            )
        )
        rraw = rraw.unionByName(
            rraw.select(
                (-F.col("r_id") - 1).alias("r_id"),
                F.lit(-2).cast("long").alias("r_user_id"),
                (F.col("r_ts") + bump).alias("r_ts"),
                "r_value",
            )
        )
    left = lraw.withWatermark("l_ts", watermark)
    right = rraw.withWatermark("r_ts", watermark)
    out = left.join(
        right,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {within}"))
        & (F.col("r_ts") <= F.col("l_ts")),
        how,
    ).select("l_id", "user_id", "l_ts", "l_value", "r_id", "r_ts", "r_value")
    return out


def foreach_batch_merge(
    spark: SparkSession,
    stream_df: DataFrame,
    path: str,
    pks: list[str],
    checkpoint: str,
    output_mode: str = "append",
):
    """Streaming upsert sink: per micro-batch MERGE into the parquet table.

    foreachBatch is the standard pattern for streaming MERGE (no native
    streaming upsert); with Delta this body becomes deltaTable.merge().
    Idempotence across retries comes from the MERGE being keyed
    (re-applying a batch rewrites the same rows) plus the checkpoint's
    batch tracking — the exactly-once recipe for a streaming table sink.

    ``output_mode="update"`` pairs this with a running streaming
    aggregation (e.g. latest-row-per-key via max_by): each micro-batch
    then carries the RUNNING aggregate for the keys it touched, so the
    merged table converges to the global aggregate regardless of how
    the source was split into batches — the batching-order-robust way
    to maintain a "current state" table from a stream.
    """
    from ..sinks.writers import merge_by_pk

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        merge_by_pk(spark, batch_df, path, pks)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_cdc_apply(
    spark: SparkSession,
    stream_df: DataFrame,
    path: str,
    pks: list[str],
    checkpoint: str,
    op_col: str = "op",
    seq_col: str = "seq",
):
    """Streaming CDC-apply sink: per micro-batch, reconcile an I/U/D
    changelog into the parquet state table (sinks/writers.
    apply_cdc_by_pk) — last-writer-wins by ``seq_col``, soft-delete
    tombstones, late/out-of-order changes absorbed by the seq condition
    rather than regressing state. foreachBatch + checkpointed batch
    tracking + the apply's retry idempotence (an incoming equal seq
    rewrites the same row) is the exactly-once recipe; with Delta the
    body becomes MERGE ... whenMatchedDelete. The final table is
    identical however the source splits into micro-batches — the same
    batching-order robustness contract as foreach_batch_merge's update
    mode, here guaranteed by the per-key seq total order.
    """
    from ..sinks.writers import apply_cdc_by_pk

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        apply_cdc_by_pk(spark, batch_df, path, pks, op_col, seq_col)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
