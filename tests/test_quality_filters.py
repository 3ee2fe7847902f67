"""Gopher/C4-style quality filters + PII scrubbing + cluster dedup + IVF."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.functions import quality as QL
from etl_java_spark.operators import dedup as DD
from etl_java_spark.operators import similarity as SIM


def _one(spark, s, expr):
    return spark.createDataFrame([(s,)], "t string").select(expr.alias("x")).first().x


def test_duplicate_line_ratio(spark):
    assert _one(spark, "a\nb\nc", QL.duplicate_line_ratio("t")) == 0.0
    assert abs(_one(spark, "a\na\nb\na", QL.duplicate_line_ratio("t")) - 0.5) < 1e-9


def test_duplicate_ngram_ratio(spark):
    clean = "one two three four five six seven eight"
    spam = "buy now " * 20
    assert _one(spark, clean, QL.duplicate_ngram_ratio("t", 3)) == 0.0
    assert _one(spark, spam, QL.duplicate_ngram_ratio("t", 3)) > 0.8


def test_max_word_repetition(spark):
    assert abs(_one(spark, "a b c d", QL.max_word_repetition("t")) - 0.25) < 1e-9
    assert abs(_one(spark, "spam spam spam eggs", QL.max_word_repetition("t")) - 0.75) < 1e-9


def test_scrub_pii(spark):
    s = "mail a.b@x.org, ssn 123-45-6789, ip 192.168.0.1, call +1 (555) 123-4567 now"
    out = _one(spark, s, QL.scrub_pii("t"))
    assert "<EMAIL>" in out and "<SSN>" in out and "<IP>" in out and "<PHONE>" in out
    assert "a.b@x.org" not in out and "123-45-6789" not in out


def test_pii_counts(spark):
    s = "a@b.co c@d.io 1.2.3.4"
    row = _one(spark, s, QL.pii_counts("t"))
    assert (row.n_email, row.n_ip, row.n_ssn) == (2, 1, 0)


def test_gopher_flags(spark):
    good = " ".join(f"tok{i}" for i in range(100))
    row = _one(spark, good, QL.gopher_quality_flags("t"))
    assert all([row.len_ok, row.dup_lines_ok, row.dup_ngrams_ok, row.word_rep_ok, row.symbols_ok])
    bad = "spam " * 100
    row2 = _one(spark, bad, QL.gopher_quality_flags("t"))
    assert not row2.word_rep_ok


def test_dedup_clusters_transitive(spark):
    # chain 1-2, 2-3 plus isolated pair 10-11: clusters {1,2,3} and {10,11}
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    got = {(r.id, r.cluster_id) for r in DD.dedup_clusters(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_dedup_keep_cluster_representative(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in [1, 2, 3, 10, 11, 99]], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    kept = DD.dedup_keep_cluster_representative(df, pairs, "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 10, 99]


def test_ivf_recall_on_fixture(spark, sf_small):
    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(e, q, "embedding", "vec_id", k=5).collect()
    approx = SIM.ivf_topk(e, q, "embedding", "vec_id", k=5, n_cells=8, nprobe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_ivf_ml_kmeans_centroids_recall(spark, sf_small):
    """Distributed index build: pyspark.ml KMeans centroids feed the
    same prebuilt-quantizer probe path as hand-supplied centroids."""
    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    cents = SIM.fit_centroids_ml(e, "embedding", n_cells=8, seed=42)
    assert cents.count() == 8
    exact = SIM.brute_force_topk(e, q, "embedding", "vec_id", k=5).collect()
    approx = SIM.ivf_topk(
        e, q, "embedding", "vec_id", k=5, nprobe=4, centroids_df=cents
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"IVF(ml-kmeans) recall too low: {recall}"
