"""Structured Streaming tests: streaming results must equal batch twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.sources.readers import normalize_nanos
from etl_java_spark.streaming.events import (
    dedup_stream,
    read_events_stream,
    run_to_memory,
    session_counts,
    tumbling_counts,
)


def test_stream_tumbling_equals_batch(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    agg = tumbling_counts(stream, window="1 hour", watermark="10 hours")
    got = run_to_memory(agg, "t_tumbling", output_mode="complete")

    batch = normalize_nanos(spark.read.parquet(f"{sf_small}/events.parquet"))
    expected = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )
    g = {(r.window_start, r.event_type): r.n_events for r in got.collect()}
    e = {(r.window_start, r.event_type): r.n_events for r in expected.collect()}
    assert g == e


def test_stream_dedup(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    deduped = dedup_stream(stream, ["user_id", "event_type"], watermark="100 hours")
    got = run_to_memory(deduped, "t_dedup", output_mode="append")
    batch = normalize_nanos(spark.read.parquet(f"{sf_small}/events.parquet"))
    n_expected = batch.select("user_id", "event_type").distinct().count()
    assert got.count() == n_expected


def test_stream_sessions(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    sessions = session_counts(stream, gap="30 minutes", watermark="100 hours")
    got = run_to_memory(sessions, "t_sessions", output_mode="complete")
    batch_events = normalize_nanos(spark.read.parquet(f"{sf_small}/events.parquet")).count()
    total = got.agg(F.sum("n_events")).first()[0]
    assert total == batch_events
    assert got.filter(F.col("session_end") <= F.col("session_start")).count() == 0


def test_checkpoint_resume_exactly_once(spark, sf_small, tmp_path):
    """Restarting a checkpointed stream must not reprocess committed
    batches: the second start with the same checkpoint is a no-op when
    no new files arrived (exactly-once file-sink semantics)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = read_events_stream(spark, sf_small)
        counted = stream.select("event_id", "user_id", "value")
        return (
            counted.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    n1 = spark.read.parquet(out).count()
    # restart with the same checkpoint — same input files, nothing new
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    n2 = spark.read.parquet(out).count()
    expected = spark.read.parquet(f"{sf_small}/events.parquet").count()
    assert n1 == expected
    assert n2 == n1, "restart reprocessed already-committed input"


def test_foreach_batch_merge(spark, sf_small, tmp_path):
    from etl_java_spark.streaming.events import foreach_batch_merge

    stream = read_events_stream(spark, sf_small)
    latest = stream.select("event_id", "user_id", "event_type", "value")
    path = str(tmp_path / "merged")
    q = foreach_batch_merge(spark, latest, path, pks=["event_id"], checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    batch_n = spark.read.parquet(f"{sf_small}/events.parquet").count()
    assert spark.read.parquet(path).count() == batch_n


def test_update_mode_merge_batch_order_robust(spark, sf_small, tmp_path):
    """q259's pattern: a running latest-per-key aggregation merged in
    update mode must converge to the same state table no matter how the
    source splits into micro-batches (here: 4 files, one per batch)."""
    from etl_java_spark.streaming.events import foreach_batch_merge

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    stream = read_events_stream(spark, src, glob="*.parquet")
    latest = (
        stream.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_type", "value", "ts"), F.struct("ts", "event_id")
            ).alias("s")
        )
        .select("user_id", "s.event_type", "s.value", "s.ts")
    )
    path = str(tmp_path / "state")
    q = foreach_batch_merge(
        spark, latest, path, pks=["user_id"],
        checkpoint=str(tmp_path / "ckpt"), output_mode="update",
    )
    q.awaitTermination()

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    expected = {
        (r["user_id"], r["event_type"], r["value"], r["ts"])
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_type", "value", "ts")
        .collect()
    }
    got = {
        (r["user_id"], r["event_type"], r["value"], r["ts"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == expected


def test_left_outer_join_sentinel_flush_matches_batch(spark, sf_small):
    """Without the flush the tail purchases stay unemitted (engine
    holds an internal margin past the watermark); with it the drained
    state equals the batch LEFT JOIN exactly."""
    from etl_java_spark.streaming.events import stream_stream_join

    ev = read_events_stream(spark, sf_small)
    flushed = run_to_memory(
        stream_stream_join(ev, how="leftOuter", flush_sentinel=True),
        "ssoj_flush", output_mode="append",
    ).filter("user_id >= 0")

    b = spark.read.parquet(f"{sf_small}/events.parquet")
    from etl_java_spark.sources.readers import normalize_nanos

    b = normalize_nanos(b)
    bl = b.filter("event_type = 'purchase'").selectExpr(
        "event_id AS l_id", "user_id", "ts AS l_ts"
    )
    br = b.filter("event_type = 'click'").selectExpr(
        "event_id AS r_id", "user_id AS r_user_id", "ts AS r_ts"
    )
    bj = bl.join(
        br,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("r_ts") <= F.col("l_ts")),
        "left",
    )
    got = {(r["l_id"], r["r_id"]) for r in flushed.select("l_id", "r_id").collect()}
    want = {(r["l_id"], r["r_id"]) for r in bj.select("l_id", "r_id").collect()}
    assert got == want

    # and the unflushed drain is a strict subset missing only tail rows
    ev2 = read_events_stream(spark, sf_small)
    plain = run_to_memory(
        stream_stream_join(ev2, how="leftOuter"), "ssoj_plain", output_mode="append"
    )
    got_plain = {(r["l_id"], r["r_id"]) for r in plain.select("l_id", "r_id").collect()}
    assert got_plain <= got and len(got_plain) < len(got)
