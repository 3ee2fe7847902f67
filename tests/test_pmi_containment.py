"""Tests for pmi_bigrams and ngram_containment_pairs."""

from __future__ import annotations

from etl_java_spark.functions.lm import pmi_bigrams
from etl_java_spark.operators.dedup import ngram_containment_pairs


def test_pmi_ranks_fixed_collocation_above_common_pair(spark):
    # "alpha beta" always co-occur as a unit; "the the" pairs arise from
    # independent frequent tokens. PMI must rank the fixed collocation
    # higher even though both clear the count floor.
    docs = [(i, "alpha beta " + "the " * 10) for i in range(10)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = pmi_bigrams(df, min_count=5, topk=5).collect()
    assert out, "expected collocations"
    top = out[0]
    assert (top.w1, top.w2) == ("alpha", "beta")
    # exact ratio: c12=10, N=120, c1(alpha)=c1(beta)=10 -> 10*120/100=12
    assert top.pmi_ratio == 12.0
    the_the = [r for r in out if (r.w1, r.w2) == ("the", "the")]
    assert the_the and the_the[0].pmi_ratio < top.pmi_ratio


def test_containment_catches_subsumption_jaccard_misses(spark):
    short = "quick brown fox jumps"
    long = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "entirely different words here")],
        ["doc_id", "text"],
    )
    out = ngram_containment_pairs(
        df, "text", "doc_id", shingle_n=1, threshold=0.9
    ).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs  # subsumed fragment found
    r = pairs[(1, 2)]
    assert r.containment_ab == 1.0  # all of doc1 inside doc2
    # Jaccard would have been 4/44 ~ 0.09 — far below any useful cut
    assert r.containment_ba < 0.15
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_containment_hot_shingle_cap_blocks_stopword_bucket(spark):
    # A token present in EVERY doc is dropped by the frequency cap, so
    # it alone cannot form candidate pairs.
    docs = [(i, f"common unique{i}") for i in range(30)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = ngram_containment_pairs(
        df, "text", "doc_id", shingle_n=1, threshold=0.1, max_shingle_freq=10
    ).collect()
    assert out == []
