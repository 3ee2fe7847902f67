"""Edge-case robustness: empty inputs, nulls, unicode, degenerate docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.functions import text as TX
from etl_java_spark.operators import dedup as DD
from etl_java_spark.operators.relational import asof_join, top_k_per_group
from etl_java_spark.sinks.writers import merge_dataframes


def test_empty_inputs_through_operators(spark):
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert DD.exact_dedup_keep_min(empty_docs, "text", "doc_id").count() == 0
    assert DD.minhash_signature(empty_docs, "text", "doc_id").count() == 0
    assert DD.simhash(empty_docs, "text", "doc_id").count() == 0
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert DD.dedup_clusters(empty_pairs).count() == 0


def test_asof_join_empty_right(spark):
    import datetime

    left = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "k int, t timestamp"
    )
    right = spark.createDataFrame([], "k int, rt timestamp, v double")
    out = asof_join(left, right, "k", "t", "rt", ["v"]).collect()
    assert len(out) == 1 and out[0].v is None


def test_null_join_keys_dropped_not_matched(spark):
    l = spark.createDataFrame([(None, "x"), (1, "y")], "k int, s string")
    r = spark.createDataFrame([(None, "z"), (1, "w")], "k int, v string")
    # SQL semantics: null keys never match
    assert l.join(r, "k").count() == 1


def test_unicode_through_text_functions(spark):
    s = "Héllo wörld 你好 мир 🙂 tail"
    df = spark.createDataFrame([(s,)], "t string")
    toks = df.select(TX.tokens("t").alias("x")).first().x
    assert "héllo" in toks and "你好" in toks and "мир" in toks
    fp = df.select(TX.fingerprint("t").alias("x")).first().x
    assert len(fp) == 32


def test_degenerate_docs(spark):
    rows = [(1, ""), (2, "   "), (3, "x"), (4, None), (5, "a " * 5000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        TX.token_count("text").alias("n"),
        TX.quality_score("text").alias("q"),
        F.size(TX.word_shingles("text", 3)).alias("sh"),
    ).collect()
    got = {r.doc_id: (r.n, r.sh) for r in out}
    assert got[1] == (0, 1)  # empty -> no tokens, single empty shingle
    assert got[3] == (1, 1)
    assert got[4][0] is None or got[4][0] == 0  # null text propagates


def test_merge_empty_updates(spark):
    existing = spark.createDataFrame([(1, "a")], "id int, v string")
    empty = spark.createDataFrame([], "id int, v string")
    assert sorted(tuple(r) for r in merge_dataframes(existing, empty, ["id"]).collect()) == [(1, "a")]


def test_topk_ties_deterministic(spark):
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 2), ("g", 5, 3)], "g string, v int, id int"
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id").asc()], k=2).collect()
    assert sorted(r.id for r in out) == [1, 2]


def test_asof_join_tolerance_nulls_stale_match(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00")], "k int, t string"
    ).selectExpr("k", "cast(t as timestamp) as t")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 7.0)], "k int, rt string, v double"
    ).selectExpr("k", "cast(rt as timestamp) as rt", "v")
    out = {
        r.t.isoformat(): r.v
        for r in asof_join(
            left, right, "k", "t", "rt", ["v"], tolerance_seconds=3600
        ).collect()
    }
    # 10:00 matches the 09:30 click (30 min ago); 12:00's nearest match is
    # 2.5h stale -> nulled, row kept
    assert out == {"2024-01-01T10:00:00": 7.0, "2024-01-01T12:00:00": None}


def test_asof_join_no_tolerance_keeps_stale(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00")], "k int, t string"
    ).selectExpr("k", "cast(t as timestamp) as t")
    right = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00", 3.0)], "k int, rt string, v double"
    ).selectExpr("k", "cast(rt as timestamp) as rt", "v")
    assert asof_join(left, right, "k", "t", "rt", ["v"]).collect()[0].v == 3.0
