"""Round-6 wave: Benford audit, source overlap matrix, DSIR importance
weights, Holt level+trend smoothing, trigram fluency, Matryoshka
truncation recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_java_spark.functions.lm import trigram_fluency
from etl_java_spark.operators.corpus import dsir_importance, source_overlap
from etl_java_spark.operators.dq import benford_audit
from etl_java_spark.operators.similarity import prefix_dim_recall
from etl_java_spark.operators.timeseries import holt_linear


# ---------------------------------------------------------------------------
# benford_audit


def test_benford_counts_and_chi(spark):
    # 19 -> digit 1; 25 -> 2; 0.4 and 0 and -3 excluded (< 1)
    df = spark.createDataFrame(
        [(19.0,), (25.0,), (12.0,), (0.4,), (0.0,), (-3.0,)], ["v"]
    )
    rows = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n"] == 2 and rows[2]["n"] == 1
    assert abs(rows[1]["obs_share"] - 2 / 3) < 1e-12
    # chi_term = (obs - exp)^2 / exp with the fixed decimal expected share
    exp1 = 0.301029995663981
    assert abs(
        rows[1]["chi_term"] - (2 / 3 - exp1) ** 2 / exp1
    ) < 1e-9


def test_benford_perfect_distribution_near_zero_chi(spark):
    # counts proportional to Benford shares -> tiny chi terms
    shares = [301, 176, 125, 97, 79, 67, 58, 51, 46]
    rows = [
        (float(d) * 10,)
        for d, n in zip(range(1, 10), shares)
        for _ in range(n)
    ]
    out = benford_audit(spark.createDataFrame(rows, ["v"]), "v").collect()
    assert sum(r["chi_term"] for r in out) < 1e-4


# ---------------------------------------------------------------------------
# source_overlap


def _src_docs(spark, rows):
    return spark.createDataFrame(rows, ["source", "text"])


def test_source_overlap_known_jaccard(spark):
    # A and B share exactly the shingles of the common sentence
    common = "the quick brown fox jumps over the lazy dog"
    df = _src_docs(
        spark,
        [
            ("A", common),
            ("A", "alpha beta gamma delta epsilon zeta"),
            ("B", common),
            ("B", "one two three four five six seven"),
        ],
    )
    rows = source_overlap(df, "text", "source", shingle_n=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["group_a"], r["group_b"]) == ("A", "B")
    # common sentence: 9 tokens -> 7 distinct trigram shingles
    assert r["inter"] == 7
    assert r["size_a"] == 7 + 4 and r["size_b"] == 7 + 5
    expected = 7 / (11 + 12 - 7)
    assert abs(r["jaccard"] - expected) < 1e-12


def test_source_overlap_hash_matches_string_path(spark):
    df = _src_docs(
        spark,
        [("A", f"doc {i} common words here and there") for i in range(5)]
        + [("B", f"doc {i} common words here and there") for i in range(3)]
        + [("C", "entirely different vocabulary set")],
    )
    key = lambda r: (r["group_a"], r["group_b"])  # noqa: E731
    hashed = {key(r): r["jaccard"] for r in source_overlap(df).collect()}
    plain = {
        key(r): r["jaccard"]
        for r in source_overlap(df, hash_shingles=False).collect()
    }
    assert hashed == plain


# ---------------------------------------------------------------------------
# dsir_importance


def _imp_docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_dsir_target_like_docs_score_higher(spark):
    df = _imp_docs(
        spark,
        [(i, "tgt", "physics theorem proof lemma") for i in range(5)]
        + [(10 + i, "raw", "buy cheap pills now click") for i in range(5)]
        # raw doc that LOOKS like the target domain
        + [(99, "raw", "physics theorem proof lemma")],
    )
    rows = {
        r["doc_id"]: r
        for r in dsir_importance(df, F.col("source") == "tgt").collect()
    }
    assert rows[99]["is_target"] is False
    # target-like raw doc outranks the spam raw docs
    assert rows[99]["importance"] > rows[10]["importance"]
    assert rows[0]["is_target"] is True
    assert rows[0]["n_tokens"] == 4


def test_dsir_bucketed_matches_exact_when_collision_free(spark):
    df = _imp_docs(
        spark,
        [(i, "tgt", f"alpha beta gamma token{i}") for i in range(4)]
        + [(10 + i, "raw", f"delta epsilon zeta other{i}") for i in range(4)],
    )
    pred = F.col("source") == "tgt"
    exact = {r["doc_id"]: r["importance"] for r in dsir_importance(df, pred).collect()}
    # 2^40 buckets over a ~16-word vocab: collision-free, so scores match
    bucketed = {
        r["doc_id"]: r["importance"]
        for r in dsir_importance(df, pred, num_buckets=1 << 40).collect()
    }
    assert bucketed == exact


# ---------------------------------------------------------------------------
# holt_linear


def test_holt_hand_computed(spark):
    # series 1,2,3 with alpha=.5 beta=.25: init l=1; then (l,b)=(2,1);
    # then l=3*.5+(2+1)*.5=3.0, b=(3-2)*.25+1*.75=1.0 -> forecast(3)=6.0
    df = spark.createDataFrame([("k", 1, 1.0), ("k", 2, 2.0), ("k", 3, 3.0)], ["k", "t", "v"])
    r = holt_linear(df, "k", ["t"], "v", alpha=0.5, beta=0.25, horizon=3).collect()[0]
    assert r["n_points"] == 3
    assert r["level"] == 3.0 and r["trend"] == 1.0 and r["forecast"] == 6.0


def test_holt_tracks_linear_ramp_exactly(spark):
    # on a perfect ramp the recurrences are exact: level=x_t, trend=slope
    df = spark.createDataFrame([("k", t, 10.0 + 2.0 * t) for t in range(1, 20)], ["k", "t", "v"])
    r = holt_linear(df, "k", ["t"], "v", horizon=5).collect()[0]
    assert r["level"] == 10.0 + 2.0 * 19
    assert r["trend"] == 2.0
    assert r["forecast"] == r["level"] + 5 * 2.0


def test_holt_single_point_zero_trend(spark):
    df = spark.createDataFrame([("k", 1, 7.0)], ["k", "t", "v"])
    r = holt_linear(df, "k", ["t"], "v").collect()[0]
    assert r["n_points"] == 1 and r["level"] == 7.0 and r["trend"] == 0.0


# ---------------------------------------------------------------------------
# trigram_fluency


def test_trigram_counts_and_ordering(spark):
    fluent = "the cat sat on the mat " * 5
    df = spark.createDataFrame(
        [(1, fluent), (2, "zx qv jk wp mn bv cx dz"), (3, "ab")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in trigram_fluency(df).collect()}
    # 30 tokens -> 28 trigram instances; doc 3 has < 3 tokens -> no row
    assert rows[1]["n_trigrams"] == 28
    assert 3 not in rows
    assert rows[1]["fluency"] > rows[2]["fluency"]


def test_trigram_custom_weights(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    r = trigram_fluency(df, lambda3=0.8, lambda2=0.1, lambda1=0.1).collect()[0]
    assert r["n_trigrams"] == 3 and 0.0 < r["fluency"] <= 1.0


# ---------------------------------------------------------------------------
# prefix_dim_recall


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_prefix_recall_perfect_when_info_front_loaded(spark):
    # all information in the first 2 dims; tail is zero -> full cosine
    # EQUALS prefix cosine, so truncation preserves the exact ranking
    rows = [(i, [float(i), float(i % 3)] + [0.0] * 6) for i in range(10)]
    df = _vecs(spark, rows)
    out = prefix_dim_recall(df, df.filter(F.col("vec_id") < 2), "embedding", "vec_id", prefix_dims=2, k=3)
    for r in out.collect():
        assert r["recall"] == pytest.approx(1.0)
        assert r["n_overlap"] == 3 and r["k"] == 3 and r["prefix_dims"] == 2


def test_prefix_recall_degrades_when_info_in_tail(spark):
    # discriminative signal lives in the LAST dims: v3 is prefix-identical
    # to the query but points the opposite way in the tail, so it usurps
    # v2's top-2 slot under truncation -> recall drops to 1/2
    rows = [
        (0, [1.0, 0.0, 10.0, 10.0]),    # query
        (1, [1.0, 0.0, 10.0, 10.0]),    # identical: top-1 in both rankings
        (2, [0.9, 0.1, 10.0, 10.0]),    # full top-2; prefix cos 0.994
        (3, [1.0, 0.0, -10.0, -10.0]),  # prefix cos 1.0; full cos negative
    ]
    df = _vecs(spark, rows)
    res = prefix_dim_recall(
        df, df.filter(F.col("vec_id") == 0), "embedding", "vec_id", prefix_dims=2, k=2
    ).collect()[0]
    assert res["n_overlap"] == 1
    assert res["recall"] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# sq_ann_recall


def test_sq_recall_lossless_on_coarse_vectors(spark):
    from etl_java_spark.operators.similarity import sq_ann_recall

    # two groups of EXACT duplicate vectors: copies decode identically,
    # so both rankings put the query's 5 twins first -> recall must be 1
    rows = [(i, [5.0, 1.0]) for i in range(6)] + [(10 + i, [-5.0, 3.0]) for i in range(4)]
    df = _vecs(spark, rows)
    out = sq_ann_recall(df, df.filter(F.col("vec_id") == 0), "embedding", "vec_id", k=4)
    for r in out.collect():
        assert r["recall"] == pytest.approx(1.0) and r["n_overlap"] == 4


def test_sq_recall_degenerate_dim_no_nan(spark):
    from etl_java_spark.operators.similarity import sq_ann_recall

    # dim 1 constant (mx == mn) -> decodes to mn, no division by zero
    rows = [(i, [float(i), 5.0]) for i in range(6)]
    df = _vecs(spark, rows)
    out = sq_ann_recall(df, df.filter(F.col("vec_id") == 0), "embedding", "vec_id", k=3).collect()
    assert len(out) == 1 and 0.0 <= out[0]["recall"] <= 1.0


# ---------------------------------------------------------------------------
# ngram_diversity


def test_ngram_diversity_hand_counts(spark):
    from etl_java_spark.operators.corpus import ngram_diversity

    df = _src_docs(
        spark,
        [
            ("A", "a b c a b c"),          # 6 tokens, 3 distinct; 4 trigrams, 3 distinct
            ("B", "p q r s"),              # 4 tokens, 4 distinct; 2 trigrams, 2 distinct
        ],
    )
    rows = {r["source"]: r for r in ngram_diversity(df).collect()}
    a = rows["A"]
    assert a["n_tokens"] == 6 and a["distinct_tokens"] == 3
    assert a["n_ngrams"] == 4 and a["distinct_ngrams"] == 3
    assert a["diversity_1"] == pytest.approx(0.5)
    b = rows["B"]
    assert b["n_ngrams"] == 2 and b["distinct_ngrams"] == 2
    assert b["diversity_n"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# dedup_cluster_profile


def test_cluster_profile_partitions_corpus(spark):
    from etl_java_spark.operators.corpus import dedup_cluster_profile

    docs = spark.createDataFrame(
        [
            (1, "one two three"),
            (2, "one two three four"),
            (3, "one two three four five"),
            (4, "totally unrelated text"),
        ],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    rows = {r["cluster_size"]: r for r in dedup_cluster_profile(docs, pairs).collect()}
    assert set(rows) == {1, 3}
    assert rows[3]["n_clusters"] == 1 and rows[3]["n_docs"] == 3
    # representative is min id (1); lost = tokens of docs 2 (4) + 3 (5)
    assert rows[3]["tokens_lost"] == 9
    assert rows[1]["n_clusters"] == 1 and rows[1]["tokens_lost"] == 0


# ---------------------------------------------------------------------------
# knn_label_eval / nearest_centroid_confusion


def test_knn_label_eval_separable_clusters(spark):
    from etl_java_spark.operators.similarity import knn_label_eval

    # two tight clusters in orthogonal directions -> 100% leave-one-out
    rows = [(i, [10.0 + i * 0.01, 0.0], 0) for i in range(6)] + [
        (10 + i, [0.0, 10.0 + i * 0.01], 1) for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["label"]: r for r in knn_label_eval(df, "embedding", "vec_id", "label", k=3).collect()}
    assert out[0]["accuracy"] == pytest.approx(1.0)
    assert out[1]["accuracy"] == pytest.approx(1.0)
    assert out[0]["n_queries"] == 6 and out[0]["n_correct"] == 6


def test_centroid_confusion_diagonal_for_separable(spark):
    from etl_java_spark.operators.similarity import nearest_centroid_confusion

    rows = [(i, [10.0, float(i % 2)], 0) for i in range(5)] + [
        (10 + i, [float(i % 2), 10.0], 1) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    cells = {
        (r["true_label"], r["pred_label"]): r["n"]
        for r in nearest_centroid_confusion(df, "embedding", "vec_id", "label").collect()
    }
    assert cells == {(0, 0): 5, (1, 1): 5}


# ---------------------------------------------------------------------------
# vocab coverage / power-iteration PCA


def test_vocab_coverage_is_monotone_and_bounded(spark):
    from etl_java_spark.queries import QUERIES

    rows = sorted(
        QUERIES["q262_vocab_coverage"](spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["vocab_size"],
    )
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs)                      # monotone in cutoff
    assert all(0.0 < c <= 1.0 for c in covs)
    assert rows[0]["covered"] <= rows[0]["total_tokens"]


def test_gram_power_pca_matches_numpy(spark):
    import numpy as np

    from etl_java_spark.operators.similarity import gram_power_pca

    rng_rows = [
        (i, [float(3 * (i % 5) + 1), float(i % 5), float((i * 2) % 3)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rng_rows, ["vec_id", "embedding"])
    out = sorted(
        gram_power_pca(df, "embedding", "vec_id", iterations=30).collect(),
        key=lambda r: r["pos"],
    )
    X = np.array([v for _, v in rng_rows])
    C = X.T @ X
    wvals, wvecs = np.linalg.eigh(C)
    top = wvecs[:, -1]
    got = np.array([r["component"] for r in out])
    # eigenvector defined up to sign
    assert min(np.abs(got - top).max(), np.abs(got + top).max()) < 1e-9
    assert abs(out[0]["eigenvalue"] - wvals[-1]) < 1e-6
    assert 0.0 < out[0]["explained_share"] <= 1.0


def test_gram_power_pca_axis_aligned(spark):
    from etl_java_spark.operators.similarity import gram_power_pca

    # all variance on dim 1 -> principal component = e_1, share = 1
    df = spark.createDataFrame(
        [(i, [0.0, float(i + 1), 0.0]) for i in range(10)], ["vec_id", "embedding"]
    )
    out = {r["pos"]: r for r in gram_power_pca(df, "embedding", "vec_id").collect()}
    assert abs(abs(out[1]["component"]) - 1.0) < 1e-12
    assert abs(out[0]["component"]) < 1e-12 and abs(out[2]["component"]) < 1e-12
    assert abs(out[1]["explained_share"] - 1.0) < 1e-12
