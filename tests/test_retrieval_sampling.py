"""Retrieval (BM25 / tf-idf / chunking), dataset composition (caps /
splits / mixture), bigram-LM fluency, and event-path mining."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_java_spark.functions.lm import bigram_array, bigram_fluency
from etl_java_spark.operators.retrieval import (
    bm25_rank,
    chunk_chars,
    doc_terms,
    tfidf_top_terms,
)
from etl_java_spark.operators.sampling import (
    assign_split,
    cap_per_group,
    key_bucket,
    source_mixture,
)
from etl_java_spark.operators.timeseries import top_event_paths


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# retrieval


def test_doc_terms_counts(spark):
    d = _docs(spark, [(1, "apple banana Apple"), (2, "cherry")])
    got = {(r.doc_id, r.term): r.tf for r in doc_terms(d).collect()}
    assert got == {(1, "apple"): 2, (1, "banana"): 1, (2, "cherry"): 1}


def test_bm25_prefers_matching_docs(spark):
    d = _docs(
        spark,
        [
            (1, "spark spark spark engine"),
            (2, "spark engine"),
            (3, "completely unrelated words here"),
            (4, "another document about engines"),
        ],
    )
    rows = bm25_rank(d, ["spark"], topk=10).collect()
    ids = [r.doc_id for r in rows]
    assert ids[0] == 1  # highest tf
    assert 3 not in ids and 4 not in ids  # no query term -> no row
    assert all(rows[i].bm25 >= rows[i + 1].bm25 for i in range(len(rows) - 1))


def test_bm25_scores_match_reference_formula(spark):
    # two docs, one term; verify against a hand-computed BM25 value
    d = _docs(spark, [(1, "x x y"), (2, "y z")])
    row = {r.doc_id: r.bm25 for r in bm25_rank(d, ["x"], topk=10).collect()}
    n_docs, df, tf, dl, avgdl = 2.0, 1.0, 2.0, 3.0, 2.5
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    expect = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert abs(row[1] - round(expect, 9)) < 1e-12
    assert set(row) == {1}


def test_tfidf_rank_order_and_k(spark):
    d = _docs(
        spark,
        [
            (1, "common rare rare"),
            (2, "common common other"),
            (3, "common filler words everywhere"),
        ],
    )
    rows = tfidf_top_terms(d, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert all(len(v) <= 2 for v in by_doc.values())
    # doc 1: 'rare' (tf=2) outranks 'common' (tf=1, df=3)
    assert by_doc[1][0].term == "rare" and by_doc[1][0].rank == 1


def test_chunk_chars_overlap_and_coverage(spark):
    text = "abcdefghijklmnopqrstuvwxyz" * 10  # 260 chars
    d = _docs(spark, [(1, text)])
    rows = sorted(chunk_chars(d, size=100, overlap=20).collect(),
                  key=lambda r: r.chunk_id)
    # stride 80; the window starting at 161 reaches char 260, so no
    # fourth window is emitted (starts run while start <= len - overlap)
    assert [r.chunk_start for r in rows] == [1, 81, 161]
    assert [r.chunk_len for r in rows] == [100, 100, 100]
    # consecutive chunks overlap by exactly 20 chars
    assert rows[0].chunk[-20:] == rows[1].chunk[:20]
    # reassembly: stripping the overlap reconstructs the document
    rebuilt = rows[0].chunk + "".join(r.chunk[20:] for r in rows[1:])
    assert rebuilt == text


def test_chunk_chars_short_doc_single_chunk(spark):
    d = _docs(spark, [(1, "tiny")])
    rows = chunk_chars(d, size=100, overlap=20).collect()
    assert len(rows) == 1 and rows[0].chunk == "tiny" and rows[0].chunk_len == 4


# ---------------------------------------------------------------------------
# sampling / composition


def _sourced(spark, n=100, sources=("a", "b")):
    rows = [(i, sources[i % len(sources)]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_cap_per_group_bounds_and_determinism(spark):
    d = _sourced(spark, 100)
    kept = cap_per_group(d, "source", "doc_id", 10)
    counts = {r.source: r.n for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 10, "b": 10}
    # survivors are a pure function of the rows, not the partitioning
    again = cap_per_group(d.repartition(7), "source", "doc_id", 10)
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_assign_split_proportions_and_stability(spark):
    d = _sourced(spark, 2000)
    s = assign_split(d, "doc_id", train=0.8, val=0.1)
    counts = {r.split: r.n for r in
              s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["train"] / 2000 == pytest_approx(0.8, 0.05)
    assert counts["val"] / 2000 == pytest_approx(0.1, 0.05)
    assert counts["test"] / 2000 == pytest_approx(0.1, 0.05)
    # same key always lands in the same split
    one = s.filter(F.col("doc_id") == 42).select("split").first().split
    two = (
        assign_split(d.repartition(13), "doc_id", train=0.8, val=0.1)
        .filter(F.col("doc_id") == 42)
        .select("split")
        .first()
        .split
    )
    assert one == two


def pytest_approx(target, tol):
    class _A:
        def __eq__(self, other):
            return abs(other - target) <= tol

    return _A()


def test_source_mixture_replication(spark):
    d = _sourced(spark, 200, sources=("a", "b"))  # 100 docs each
    mixed = source_mixture(d, {"a": 2.0, "b": 0.5}, "source", "doc_id")
    counts = {r.source: r.n for r in
              mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] == 200  # exactly 2 copies each
    assert 30 <= counts["b"] <= 70  # ~half survive, hash-selected
    # copy ids distinguish replicas
    copies = mixed.filter(F.col("source") == "a").groupBy("doc_id").agg(
        F.collect_set("copy_id").alias("c")
    )
    assert all(sorted(r.c) == [0, 1] for r in copies.collect())


def test_key_bucket_matches_sql_twin(spark):
    from etl_java_spark.operators.sampling import key_bucket_sql

    d = _sourced(spark, 50)
    py = d.select("doc_id", key_bucket("doc_id").alias("b"))
    sql = d.selectExpr("doc_id", key_bucket_sql("doc_id") + " AS b")
    assert py.collect() == sql.collect()


# ---------------------------------------------------------------------------
# bigram LM


def test_bigram_array_basics(spark):
    d = _docs(spark, [(1, "a b c"), (2, "solo"), (3, "")])
    got = {r.doc_id: r.bg for r in
           d.select("doc_id", bigram_array("text").alias("bg")).collect()}
    assert got[1] == ["a b", "b c"]
    assert got[2] is None and got[3] is None  # < 2 tokens -> NULL guard


def test_bigram_fluency_orders_fluent_above_gibberish(spark):
    fluent = "the cat sat on the mat " * 5
    rows = [(i, fluent) for i in range(5)] + [(99, "zq xv jk wp qz vx kj pw")]
    d = _docs(spark, rows)
    got = {r.doc_id: r.fluency for r in bigram_fluency(d).collect()}
    assert got[0] > got[99]  # repeated common bigrams beat unique junk
    # 'the cat' appears 5x (once per copy-doc * 5 docs) -> high prob
    assert got[0] == got[4]  # identical docs score identically


# ---------------------------------------------------------------------------
# event paths


def test_top_event_paths(spark):
    rows = []
    # 3 users do A->B->C, 1 user does B->A, with increasing timestamps
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    eid = 0
    for u, seq in [(1, "ABC"), (2, "ABC"), (3, "ABC"), (4, "BA")]:
        for i, et in enumerate(seq):
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, et))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = top_event_paths(ev, n_events=5, topk=10).collect()
    assert (got[0].path, got[0].n_users) == ("A>B>C", 3)
    assert (got[1].path, got[1].n_users) == ("B>A", 1)


# ---------------------------------------------------------------------------
# edge cases


def test_chunk_chars_rejects_bad_overlap(spark):
    d = _docs(spark, [(1, "abc")])
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_chars(d, size=10, overlap=10)


def test_bm25_no_matching_terms_empty(spark):
    d = _docs(spark, [(1, "alpha beta"), (2, "gamma")])
    assert bm25_rank(d, ["zzz_not_present"], topk=5).count() == 0


def test_source_mixture_zero_weight_drops_source(spark):
    d = _sourced(spark, 100, sources=("a", "b"))
    mixed = source_mixture(d, {"a": 0.0}, "source", "doc_id")
    got = {r.source for r in mixed.select("source").distinct().collect()}
    assert got == {"b"}  # a fully dropped, b defaults to weight 1.0


def test_bigram_fluency_all_short_docs_empty(spark):
    d = _docs(spark, [(1, "one"), (2, ""), (3, "x")])
    assert bigram_fluency(d).count() == 0
