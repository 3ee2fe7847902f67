"""Sequence packing + stream-stream join."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.operators.packing import pack_sequences
from etl_java_spark.sources.readers import normalize_nanos


def test_pack_sequences_invariants(spark, sf_small):
    from etl_java_spark.functions.text import token_count

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", token_count("text").cast("long").alias("n_tok")
    )
    packed = pack_sequences(docs, "doc_id", "n_tok", max_tokens=256, partitions=4)
    rows = packed.collect()
    # every doc appears exactly once
    all_ids = [d for r in rows for d in r.doc_ids]
    assert sorted(all_ids) == sorted(r.doc_id for r in docs.collect())
    # no multi-doc sequence exceeds the budget
    for r in rows:
        if r.n_docs > 1:
            assert r.total_tokens <= 256
    # packing actually packs (way fewer sequences than docs)
    assert len(rows) < len(all_ids) / 2
    # seq ids are unique
    assert len({r.seq_id for r in rows}) == len(rows)


def test_pack_oversized_doc_gets_own_sequence(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 9999), (3, 20)], "doc_id long, n_tok long"
    )
    rows = pack_sequences(docs, "doc_id", "n_tok", max_tokens=100, partitions=1).collect()
    oversized = [r for r in rows if 2 in r.doc_ids]
    assert len(oversized) == 1 and oversized[0].n_docs == 1
    assert oversized[0].total_tokens == 9999


def test_stream_stream_join_equals_batch(spark, sf_small):
    from etl_java_spark.streaming.events import read_events_stream, run_to_memory, stream_stream_join

    stream = read_events_stream(spark, sf_small)
    joined = stream_stream_join(stream, within="1 hour", watermark="100 hours")
    got = run_to_memory(joined, "t_ssj", output_mode="append")

    ev = normalize_nanos(spark.read.parquet(f"{sf_small}/events.parquet"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("l_id"), "user_id", F.col("ts").alias("l_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("r_id"), F.col("user_id").alias("r_user_id"), F.col("ts").alias("r_ts")
    )
    expected = p.join(
        c,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 hour"))
        & (F.col("r_ts") <= F.col("l_ts")),
    ).count()
    assert got.count() == expected
    assert got.count() > 0


def test_pack_next_fit_deterministic_semantics(spark):
    from etl_java_spark.operators.packing import pack_sequences_next_fit

    rows = [
        ("a", 1, 1000), ("a", 2, 1000),  # fill exactly 2000
        ("a", 3, 100),                   # 2000+100 > 2048: new bin
        ("a", 4, 2000),                  # 100+2000 > 2048: new bin
        ("a", 5, 3000),                  # oversized: own (overfull) bin
        ("a", 6, 10),                    # never joins the overfull bin
        ("b", 7, 5),
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tok long")
    out = pack_sequences_next_fit(df, "doc_id", "n_tok", "lang", max_tokens=2048)
    got = {(r.group, r.seq_idx): (r.n_docs, r.total_tokens) for r in out.collect()}
    assert got == {
        ("a", 0): (2, 2000),
        ("a", 1): (1, 100),
        ("a", 2): (1, 2000),
        ("a", 3): (1, 3000),
        ("a", 4): (1, 10),
        ("b", 0): (1, 5),
    }
