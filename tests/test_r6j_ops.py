"""Round-6 wave-j operators: CUPED, gains table, fallback join,
consensus reconciliation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_java_spark.operators.dq import consensus_reconcile
from etl_java_spark.operators.evaluation import gains_table
from etl_java_spark.operators.experiments import ab_assign, cuped
from etl_java_spark.operators.relational import fallback_join


def test_cuped_perfect_covariate_kills_variance(spark):
    # y = x exactly -> theta = 1, var_reduction = corr^2 = 1, and the
    # adjusted means collapse to the grand mean of y.
    rows = [(u, 10 * u, 10 * u) for u in range(1, 41)]
    df = spark.createDataFrame(rows, "u long, pre long, post long")
    out = cuped(df, "u", "pre", "post").collect()[0]
    assert math.isclose(out["theta"], 1.0, rel_tol=1e-12)
    assert math.isclose(out["var_reduction"], 1.0, rel_tol=1e-12)
    assert math.isclose(out["adj_mean_a"], out["adj_mean_b"], rel_tol=1e-9)


def test_cuped_uncorrelated_covariate_is_noop(spark):
    # constant covariate -> theta undefined via varx=0? use a covariate
    # orthogonal to y instead: x alternates independent of y.
    rows = []
    for u in range(1, 41):
        rows.append((u, 100 if u % 2 == 0 else 200, 50))
    df = spark.createDataFrame(rows, "u long, pre long, post long")
    out = cuped(df, "u", "pre", "post").collect()[0]
    # y constant -> cov = 0 -> theta 0 -> adjusted means = raw means;
    # var_reduction is NULL (0/0 guarded), never an ANSI error
    assert out["theta"] == 0.0
    assert out["adj_mean_a"] == out["mean_a"]
    assert out["adj_diff"] == out["diff"] == 0.0
    assert out["var_reduction"] is None


def test_cuped_arms_come_from_ab_assign(spark):
    units = list(range(1, 21))
    gmap = {
        r["u"]: r["g"]
        for r in spark.createDataFrame([(u,) for u in units], "u long")
        .select("u", ab_assign("u").alias("g"))
        .collect()
    }
    rows = [(u, 0, 100 if gmap[u] == 1 else 50) for u in units]
    df = spark.createDataFrame(rows, "u long, pre long, post long")
    out = cuped(df, "u", "pre", "post").collect()[0]
    assert out["n_a"] == sum(1 for g in gmap.values() if g == 0)
    assert out["mean_b"] == 100.0 and out["mean_a"] == 50.0


def test_gains_table_separable_scores(spark):
    # top 20 scores are all positive, bottom 80 negative -> the first
    # two deciles capture everything at lift 5.
    rows = [(i, 1000 - i, 1 if i <= 20 else 0) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, score long, y int")
    out = {r["bucket"]: r for r in
           gains_table(df, "score", "y", "id").collect()}
    assert out[1]["positives"] == 10 and out[2]["positives"] == 10
    assert out[2]["cum_positives"] == 20
    assert out[2]["capture_rate"] == 1.0
    assert out[1]["lift"] == (10 / 10) / (20 / 100)  # = 5x
    assert out[10]["positives"] == 0


def test_fallback_join_levels(spark):
    fact = spark.createDataFrame(
        [(1, "AMERICA", "BRAZIL"), (2, "AMERICA", "PERU"),
         (3, "EUROPE", "FRANCE")],
        "id long, r_name string, n_name string",
    )
    dim = spark.createDataFrame(
        [("AMERICA", "BRAZIL", 500), ("AMERICA", None, 200),
         (None, None, 100)],
        "r_name string, n_name string, rate int",
    )
    out = {
        r["id"]: r
        for r in fallback_join(
            fact, dim, [["r_name", "n_name"], ["r_name"], []], ["rate"]
        ).collect()
    }
    assert (out[1]["rate"], out[1]["matched_level"]) == (500, 0)
    assert (out[2]["rate"], out[2]["matched_level"]) == (200, 1)
    assert (out[3]["rate"], out[3]["matched_level"]) == (100, 2)


def test_consensus_majority_and_conflicts(spark):
    a = spark.createDataFrame(
        [(1, "alice", 10), (2, "bob", 20), (3, "eve", 30)],
        "k long, name string, bal long",
    )
    b = spark.createDataFrame(
        [(1, "alice", 10), (2, "bob_x", 20), (3, "eve_p", 30)],
        "k long, name string, bal long",
    )
    c = spark.createDataFrame(
        [(1, "alice", 99), (3, "eve_q", 30)],  # key 2 missing; bal drift
        "k long, name string, bal long",
    )
    out = {
        r["k"]: r
        for r in consensus_reconcile(
            [("A", a), ("B", b), ("C", c)], "k", ["name", "bal"]
        ).collect()
    }
    # key 1: name unanimous; bal 10,10,99 -> majority 10
    assert out[1]["name_consensus"] == "alice"
    assert out[1]["bal_consensus"] == 10 and out[1]["n_conflicts"] == 0
    # key 2: only 2 sources, name split 1-1 -> conflict; bal agrees 2/3
    assert out[2]["name_consensus"] is None
    assert out[2]["bal_consensus"] == 20
    assert out[2]["n_conflicts"] == 1
    assert out[2]["missing_from"] == "C"
    # key 3: three distinct names -> conflict
    assert out[3]["name_consensus"] is None and out[3]["bal_consensus"] == 30


def test_consensus_majority_is_over_voting_sources(spark):
    """Majority is computed over the key's VOTING (present, non-null)
    sources, not the configured source count — and a zero-voter column
    is missing, not a conflict."""
    a = spark.createDataFrame([(1, "solo", None)], "k long, name string, bal long")
    b = spark.createDataFrame(
        [(2, "x", 5), (3, None, 7)], "k long, name string, bal long"
    )
    c = spark.createDataFrame(
        [(2, "y", 5), (3, None, 7)], "k long, name string, bal long"
    )
    out = {
        r["k"]: r
        for r in consensus_reconcile(
            [("A", a), ("B", b), ("C", c)], "k", ["name", "bal"]
        ).collect()
    }
    # key 1: present only in A -> its lone vote IS the consensus; the
    # all-null bal column has zero voters -> NULL but NOT a conflict
    assert out[1]["name_consensus"] == "solo"
    assert out[1]["bal_consensus"] is None
    assert out[1]["n_conflicts"] == 0
    assert out[1]["missing_from"] == "B,C"
    # key 2: name split 1-1 among the 2 voters -> conflict; bal agrees
    assert out[2]["name_consensus"] is None and out[2]["n_conflicts"] == 1
    assert out[2]["bal_consensus"] == 5
    # key 3: name has zero voters (both NULL) -> missing, not disputed
    assert out[3]["name_consensus"] is None and out[3]["n_conflicts"] == 0
    assert out[3]["bal_consensus"] == 7


def test_fallback_join_null_value_at_matched_level(spark):
    """A dim row whose value is legitimately NULL at the matched level
    still registers the match: the sentinel marker (not the value)
    decides matched_level, and the NULL is served rather than silently
    falling back to a coarser level."""
    fact = spark.createDataFrame(
        [(1, "AMERICA", "BRAZIL"), (2, "AMERICA", "PERU")],
        "id long, r_name string, n_name string",
    )
    dim = spark.createDataFrame(
        [("AMERICA", "BRAZIL", None), ("AMERICA", None, 200), (None, None, 100)],
        "r_name string, n_name string, rate int",
    )
    out = {
        r["id"]: r
        for r in fallback_join(
            fact, dim, [["r_name", "n_name"], ["r_name"], []], ["rate"]
        ).collect()
    }
    assert out[1]["matched_level"] == 0 and out[1]["rate"] is None
    assert out[2]["matched_level"] == 1 and out[2]["rate"] == 200


def test_fallback_join_duplicate_dim_rejected(spark):
    import pytest

    fact = spark.createDataFrame([(1, "A")], "id long, r_name string")
    dim = spark.createDataFrame(
        [("A", 1), ("A", 2)], "r_name string, rate int"
    )
    with pytest.raises(Exception, match="one row per key combination"):
        fallback_join(fact, dim, [["r_name"]], ["rate"]).collect()


import datetime as dt  # noqa: E402

from etl_java_spark.operators.sketch import bloom_build, bloom_probe  # noqa: E402
from etl_java_spark.operators.timeseries import (  # noqa: E402
    lag_features,
    window_funnel,
)


def _funnel_events(spark):
    base = dt.datetime(2024, 1, 1, 12)

    def s(m):
        return base + dt.timedelta(minutes=m)

    return spark.createDataFrame(
        [
            (1, s(0), "signup"), (1, s(10), "click"), (1, s(20), "purchase"),
            (2, s(0), "signup"), (2, s(90), "click"),   # click misses 1h
            (3, s(0), "signup"), (3, s(5), "purchase"),  # step 2 skipped
            (4, s(0), "click"),                          # never signed up
            (5, s(0), "signup"), (5, s(30), "click"),
            (5, s(70), "purchase"),                      # purchase too late
        ],
        "u long, ts timestamp, t string",
    )


def test_window_funnel_levels(spark):
    out = {
        r["u"]: r["level"]
        for r in window_funnel(
            _funnel_events(spark), "u", "ts", "t",
            ["signup", "click", "purchase"], 3600,
        ).collect()
    }
    assert out == {1: 3, 2: 1, 3: 1, 5: 2}
    # user 4 (no anchor step) is absent entirely
    assert 4 not in out


def test_window_funnel_skipped_step_cuts_chain(spark):
    # user 3 purchases within the window but never clicked -> level 1,
    # NOT 2 — the prefix must be consecutive
    out = {
        r["u"]: r["level"]
        for r in window_funnel(
            _funnel_events(spark), "u", "ts", "t",
            ["signup", "click", "purchase"], 3600,
        ).collect()
    }
    assert out[3] == 1


def test_bloom_rejects_non_integer_keys(spark):
    """String keys would cast to NULL positions and silently corrupt
    the filter — both build and probe must reject them loudly."""
    import pytest

    strs = spark.createDataFrame([("a",), ("b",)], "k string")
    ints = spark.createDataFrame([(1,), (2,)], "k long")
    with pytest.raises(TypeError, match="integer type"):
        bloom_build(strs, "k")
    bloom = bloom_build(ints, "k")
    with pytest.raises(TypeError, match="integer type"):
        bloom_probe(strs, bloom, "k")


def test_bloom_no_false_negatives_and_merge(spark):
    keys = spark.createDataFrame([(i,) for i in range(500)], "k long")
    bloom = bloom_build(keys, "k", m_bits=8192, k_hashes=2)
    probed = bloom_probe(keys, bloom, "k", m_bits=8192, k_hashes=2)
    assert probed.filter(~F.col("bloom_member")).count() == 0  # no FN

    # mergeability: union of two half-filters == filter of the union
    lo = bloom_build(keys.filter(F.col("k") < 250), "k", 8192, 2)
    hi = bloom_build(keys.filter(F.col("k") >= 250), "k", 8192, 2)
    merged = (
        lo.unionByName(hi)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    a = {(r["word_idx"], r["word"]) for r in bloom.collect()}
    b = {(r["word_idx"], r["word"]) for r in merged.collect()}
    assert a == b


def test_bloom_fp_rate_bounded(spark):
    keys = spark.createDataFrame([(i,) for i in range(500)], "k long")
    bloom = bloom_build(keys, "k", m_bits=8192, k_hashes=2)
    outsiders = spark.createDataFrame(
        [(i,) for i in range(10_000, 11_000)], "k long"
    )
    fp = bloom_probe(outsiders, bloom, "k", 8192, 2).filter(
        F.col("bloom_member")
    ).count()
    # k=2, m/n = 16.4 -> expected fp ~ (1-e^-2n k/m)^k ~ 1.3%; allow slack
    assert fp < 60


def test_lag_features_warmup_and_values(spark):
    rows = [("k", i, (i + 1) * 10) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, x int, y long")
    out = {
        r["x"]: r
        for r in lag_features(
            df, "k", "x", "y", lags=[1, 7], rolling_windows=[3]
        ).collect()
    }
    assert out[0]["lag_1"] is None and out[0]["lag_7"] is None
    assert out[5]["lag_1"] == 50
    assert out[8]["lag_7"] == 20
    assert out[0]["rmean_3"] == 10.0          # warm-up: mean of 1 row
    assert out[2]["rmean_3"] == 20.0          # (10+20+30)/3
    assert out[9]["rmean_3"] == 90.0          # (80+90+100)/3


from etl_java_spark.functions.lm import bigram_cross_fluency  # noqa: E402
from etl_java_spark.operators.cdc import latest_nonnull_merge  # noqa: E402
from etl_java_spark.operators.dq import quantile_map  # noqa: E402
from etl_java_spark.operators.retrieval import rbo_overlap  # noqa: E402


def test_quantile_map_exact_order_statistics(spark):
    # ref = {10,20,30,40}, cur = {1,2,3,4} -> each cur value maps to
    # the same-rank ref value
    rows = [(v, "ref") for v in (10, 20, 30, 40)] + [
        (v, "cur") for v in (1, 2, 3, 4)
    ]
    df = spark.createDataFrame(rows, "v long, c string")
    out = {
        r["value"]: r["mapped"]
        for r in quantile_map(df, "v", "c", "ref", "cur").collect()
    }
    assert out == {1: 10, 2: 20, 3: 30, 4: 40}


def test_quantile_map_uneven_sizes(spark):
    # 2 cur values over 4 ref values: ranks 1,2 of 2 -> ceil(1*4/2)=2nd
    # and ceil(2*4/2)=4th smallest ref values
    rows = [(v, "ref") for v in (10, 20, 30, 40)] + [
        (5, "cur"), (6, "cur"),
    ]
    out = {
        r["value"]: r["mapped"]
        for r in quantile_map(
            spark.createDataFrame(rows, "v long, c string"), "v", "c",
            "ref", "cur",
        ).collect()
    }
    assert out == {5: 20, 6: 40}


def test_latest_nonnull_merge_per_column_recency(spark):
    rows = [
        (1, 10, "old@x", None),
        (1, 20, None, "555"),       # later row knows phone, not email
        (1, 30, "new@x", None),     # latest email
        (2, 5, None, None),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, email string, phone string")
    out = {
        r["k"]: r
        for r in latest_nonnull_merge(df, "k", "ts", ["email", "phone"]).collect()
    }
    assert out[1]["email"] == "new@x"
    assert out[1]["phone"] == "555"     # survives despite later rows
    assert out[1]["n_versions"] == 3 and out[1]["last_ts"] == 30
    assert out[2]["email"] is None and out[2]["phone"] is None


def test_cross_fluency_oov_and_domain_gap(spark):
    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zork blorp quux")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in bigram_cross_fluency(train, score).collect()
    }
    assert out[10]["oov_bigrams"] == 0
    assert out[11]["oov_bigrams"] == 2      # both bigrams unseen
    assert out[10]["fluency"] > out[11]["fluency"]  # in-domain reads better


def test_rbo_identical_and_disjoint(spark):
    a = spark.createDataFrame(
        [("q", i, i) for i in range(1, 11)], "q string, item long, r int"
    )
    out = rbo_overlap(a, a, "q", "item", "r", k=10).collect()[0]
    assert out["rbo"] == 1.0  # identical rankings
    b = spark.createDataFrame(
        [("q", 100 + i, i) for i in range(1, 11)], "q string, item long, r int"
    )
    # disjoint lists: the query still appears, scored 0.0 (dropping it
    # would overstate average agreement across queries)
    dis = rbo_overlap(a, b, "q", "item", "r", k=10).collect()
    assert len(dis) == 1 and dis[0]["rbo"] == 0.0


def test_rbo_top_weighted(spark):
    # agreeing at the TOP scores higher than agreeing at the bottom
    base = [("q", i, i) for i in range(1, 11)]
    a = spark.createDataFrame(base, "q string, item long, r int")
    top_agree = spark.createDataFrame(
        [("q", 1, 1)] + [("q", 100 + i, i) for i in range(2, 11)],
        "q string, item long, r int",
    )
    bot_agree = spark.createDataFrame(
        [("q", 100 + i, i) for i in range(1, 10)] + [("q", 10, 10)],
        "q string, item long, r int",
    )
    top = rbo_overlap(a, top_agree, "q", "item", "r", 10).collect()[0]["rbo"]
    bot = rbo_overlap(a, bot_agree, "q", "item", "r", 10).collect()[0]["rbo"]
    assert top > bot > 0


from etl_java_spark.operators.dedup import weighted_jaccard_verify  # noqa: E402
from etl_java_spark.operators.dq import embedding_dim_stats  # noqa: E402
from etl_java_spark.operators.retrieval import beyond_accuracy  # noqa: E402


def test_beyond_accuracy_clone_lists_score_zero_diversity(spark):
    # both queries recommend the same 2 identical vectors -> ILD 0,
    # coverage 2/4
    topk = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q2", 1, 1), ("q2", 2, 2)],
        "query_id string, neighbor_id long, rank int",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0]), (4, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    cat = vecs.agg(F.count("*").alias("catalog_n"))
    out = beyond_accuracy(topk, vecs, cat).collect()[0]
    assert out["n_queries"] == 2
    assert out["coverage_at_k"] == 0.5
    assert out["ild_mean"] == 0.0


def test_beyond_accuracy_orthogonal_lists_are_diverse(spark):
    topk = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 3, 2)],
        "query_id string, neighbor_id long, rank int",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cat = vecs.agg(F.count("*").alias("catalog_n"))
    out = beyond_accuracy(topk, vecs, cat).collect()[0]
    assert out["ild_mean"] == 1.0  # orthogonal -> cosine 0 -> distance 1
    assert out["coverage_at_k"] == 1.0


def test_embedding_dim_stats_finds_dead_and_outlier_dims(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(200):
        # dim0 constant (dead), dim1 unit noise, dim2 has one wild point
        d2 = 1000.0 if i == 0 else rng.uniform(-1, 1)
        rows.append((i, [5.0, rng.uniform(-1, 1), d2]))
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    out = {r["pos"]: r for r in embedding_dim_stats(df, "embedding").collect()}
    assert out[0]["std"] == 0.0 and out[0]["n_outliers"] == 0  # dead dim
    assert out[1]["n_outliers"] == 0
    assert out[2]["n_outliers"] == 1  # the planted spike


def test_weighted_jaccard_rare_overlap_beats_boilerplate(spark):
    # shared boilerplate shingles are common across the corpus (low
    # idf); the rare-content pair must out-score the template pair on
    # weighted jaccard even when plain jaccard is similar.
    boiler = "terms of service apply to all users"
    docs = [
        (1, boiler + " alpha beta gamma"),
        (2, boiler + " delta epsilon zeta"),
        (3, "unique quantum flux capacitor theory alpha"),
        (4, "unique quantum flux capacitor theory beta"),
    ] + [(100 + i, boiler + f" filler{i} pad{i} row{i}") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in weighted_jaccard_verify(df, pairs, "text", "doc_id").collect()
    }
    tmpl, rare = out[(1, 2)], out[(3, 4)]
    assert rare["weighted_jaccard"] > tmpl["weighted_jaccard"]
    # and the weighting moved the needle MORE than plain jaccard did
    assert (rare["weighted_jaccard"] - tmpl["weighted_jaccard"]) > (
        rare["jaccard"] - tmpl["jaccard"]
    )
