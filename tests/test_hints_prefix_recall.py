"""Tests for join-hint plan control, prefix_index, and the LSH recall
eval harness."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.operators.retrieval import prefix_index


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_hints_control_physical_strategy(spark, sf_small):
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    c = spark.read.parquet(f"{sf_small}/customer.parquet")
    cond_m = o.o_custkey == c.c_custkey

    merged = o.join(c.hint("merge"), cond_m)
    assert "SortMergeJoin" in _physical(merged)

    hashed = o.join(c.hint("shuffle_hash"), cond_m)
    assert "ShuffledHashJoin" in _physical(hashed)

    bcast = o.join(F.broadcast(c), cond_m)
    assert "BroadcastHashJoin" in _physical(bcast)

    # all three strategies agree on the data
    n = merged.count()
    assert hashed.count() == n and bcast.count() == n


def test_prefix_index_hand_corpus(spark):
    docs = [
        (1, "apple apple apricot banana"),
        (2, "apple appliance banana banana"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = prefix_index(df, "text", min_len=2, max_len=3, topk=2)
    rows = {(r.prefix, r.rank): (r.token, r.total) for r in out.collect()}
    # "ap" completions: apple x3 wins, then appliance/apricot (1 each,
    # alphabetical tiebreak -> appliance)
    assert rows[("ap", 1)] == ("apple", 3)
    assert rows[("ap", 2)] == ("appliance", 1)
    assert rows[("app", 1)] == ("apple", 3)
    assert rows[("ba", 1)] == ("banana", 3)
    # short tokens don't emit prefixes longer than themselves
    assert all(len(p) <= 3 for p, _ in rows)


def test_prefix_index_respects_topk_cap(spark):
    docs = [(i, f"zz{chr(97 + i)} zz{chr(97 + i)}") for i in range(10)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = prefix_index(df, "text", min_len=2, max_len=2, topk=3)
    per_prefix = out.groupBy("prefix").count().collect()
    assert all(r["count"] <= 3 for r in per_prefix)


def test_lsh_recall_eval_detects_weak_index(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    from etl_java_spark import queries as Q

    r = Q.QUERIES["q195_lsh_recall_eval"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    # the deliberately under-provisioned index (one 24-bit band, no
    # multi-probe) must MISS some true pairs — the harness measures,
    # not asserts
    assert r.n_exact > 0
    assert 0.0 < r.recall < 1.0
    assert r.n_found < r.n_exact
