"""Round-7 operators: winnowing fingerprints, confident-learning label
noise, stratified IPW, average precision, Kneser-Ney fluency, audio
energy segmentation, zone-map audit, FD audit, HLL sliding distinct,
product quantization."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from etl_java_spark.operators.corpus import winnow_dup_pairs, winnow_fingerprints
from etl_java_spark.operators.dq import functional_dependency_audit
from etl_java_spark.operators.evaluation import average_precision
from etl_java_spark.operators.experiments import stratified_ipw
from etl_java_spark.functions.lm import kneser_ney_fluency
from etl_java_spark.operators.similarity import (
    confident_label_noise,
    product_quantize,
)
from etl_java_spark.operators.timeseries import sliding_distinct_hll
from etl_java_spark.sinks.clustering import zone_map_audit


# ---------------------------------------------------------------------------
# winnowing


def test_winnow_guaranteed_detection_floor(spark):
    """Any shared run of shingle_n + window - 1 tokens MUST yield at
    least one shared fingerprint (the winnowing guarantee)."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = 3 + 4 - 1
    df = spark.createDataFrame(
        [
            (1, "unique prefix one two " + shared),
            (2, shared + " totally different suffix here now"),
        ],
        "doc_id long, text string",
    )
    pairs = winnow_dup_pairs(df, "text", "doc_id", min_shared=1).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_winnow_density(spark):
    """Winnowing keeps roughly 2/(w+1) of the shingles — far fewer
    fingerprints than shingles on a long doc."""
    text = " ".join(f"tok{i} word{i * 7 % 13}" for i in range(200))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_fp = winnow_fingerprints(df, "text", "doc_id", 3, 4).count()
    n_shingles = 200 * 2 - 2  # tokens - n + 1
    assert n_fp < n_shingles * 0.6
    assert n_fp > 10


def test_winnow_short_doc_single_fingerprint(spark):
    df = spark.createDataFrame([(1, "just two")], "doc_id long, text string")
    assert winnow_fingerprints(df, "text", "doc_id", 3, 4).count() == 1


# ---------------------------------------------------------------------------
# confident-learning label noise


def test_label_noise_flags_planted_error(spark):
    """Two tight clusters; one vector labeled into the wrong cluster
    must be counted (given=b, suggested=a)."""
    rows = []
    for i in range(10):
        rows.append((i, "a", [10.0 + i * 0.01, 0.0]))
        rows.append((100 + i, "b", [0.0, 10.0 + i * 0.01]))
    rows.append((999, "b", [10.0, 0.0]))  # mislabeled: lives in cluster a
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    out = {
        (r["given_label"], r["suggested_label"]): r["n"]
        for r in confident_label_noise(df, "embedding", "vec_id", "label").collect()
    }
    assert out.get(("b", "a")) == 1          # the planted error, found
    assert out.get(("a", "a"), 0) == 10      # clean cluster stays diagonal


# ---------------------------------------------------------------------------
# stratified IPW


def test_ipw_removes_stratum_confounding(spark):
    """Outcome = 10 * stratum + 5 * treated; treatment share differs by
    stratum (confounded). The stratified estimate must recover 5
    exactly; the naive gap must not."""
    rows = []
    u = 0
    for s, (n_t, n_c) in {"lo": (2, 8), "hi": (8, 2)}.items():
        base = 10 if s == "lo" else 100
        for _ in range(n_t):
            rows.append((u, s, 1, float(base + 5))); u += 1
        for _ in range(n_c):
            rows.append((u, s, 0, float(base))); u += 1
    df = spark.createDataFrame(rows, "u long, s string, t int, y double")
    out = stratified_ipw(df, "s", "t", "y", scale=1).collect()[0]
    assert out["n_unsupported"] == 0
    assert math.isclose(out["ate_scaled"], 5.0, abs_tol=1e-9)
    assert abs(out["naive_diff_scaled"] - 5.0) > 10  # confounding visible


def test_ipw_unsupported_strata_reported(spark):
    df = spark.createDataFrame(
        [(1, "a", 1, 10.0), (2, "a", 0, 4.0), (3, "b", 1, 9.0)],
        "u long, s string, t int, y double",
    )
    out = stratified_ipw(df, "s", "t", "y", scale=1).collect()[0]
    assert out["n_unsupported"] == 1       # stratum b has no control arm
    assert math.isclose(out["ate_scaled"], 6.0, abs_tol=1e-9)  # from a only


# ---------------------------------------------------------------------------
# average precision


def test_average_precision_hand_cases(spark):
    # perfect ranking: positives at ranks 1, 2 -> AP = 1
    df = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 90), (3, 0, 80), (4, 0, 70)],
        "id long, y int, s long",
    )
    assert average_precision(df, "y", "s", "id").collect()[0]["ap"] == 1.0
    # positives at ranks 2 and 4: AP = (1/2 + 2/4) / 2 = 0.5
    df2 = spark.createDataFrame(
        [(1, 0, 100), (2, 1, 90), (3, 0, 80), (4, 1, 70)],
        "id long, y int, s long",
    )
    assert average_precision(df2, "y", "s", "id").collect()[0]["ap"] == 0.5


def test_average_precision_tie_break_by_id(spark):
    # tied scores: order is (score DESC, id ASC); positive has id 1 so
    # it ranks first among the tie -> AP = 1
    df = spark.createDataFrame(
        [(1, 1, 50), (2, 0, 50), (3, 0, 50)], "id long, y int, s long"
    )
    assert average_precision(df, "y", "s", "id").collect()[0]["ap"] == 1.0


# ---------------------------------------------------------------------------
# Kneser-Ney


def test_kneser_ney_prefers_productive_continuations(spark):
    """'san francisco' repeated: 'francisco' has ONE distinct history, so
    its continuation mass is low; a doc of diverse bigrams scores via
    discounted ML. Sanity: probabilities in (0, 1], fluent doc of seen
    bigrams scores higher than one full of rare continuations."""
    train = [
        (1, "san francisco san francisco san francisco"),
        (2, "the cat sat on the mat"),
        (3, "the dog sat on the rug"),
    ]
    df = spark.createDataFrame(train, "doc_id long, text string")
    out = {r["doc_id"]: r for r in kneser_ney_fluency(df).collect()}
    for r in out.values():
        assert 0.0 < r["kn_fluency"] <= 1.0
    # the repeated-bigram doc is maximally predictable under its own model
    assert out[1]["kn_fluency"] > out[2]["kn_fluency"]


def test_kneser_ney_probability_sums_to_one(spark):
    """For a fixed history w1, sum over observed w2 of P_KN(w2|w1) plus
    the backoff mass spread over unseen types must be <= 1 (discount
    conservation on observed mass)."""
    df = spark.createDataFrame(
        [(1, "a b a c a b a d")], "doc_id long, text string"
    )
    # histories: a->{b,c,d}, b->{a}, c->{a}, d->(end)
    # observed mass for history a: sum (c12 - D)/c1h + D*n1f/c1h * ncont
    out = kneser_ney_fluency(df).collect()[0]
    assert 0.0 < out["kn_fluency"] < 1.0


# ---------------------------------------------------------------------------
# audio segmentation


def test_audio_segments_counts_bursts(spark):
    from etl_java_spark.operators.multimodal import (
        audio_energy_segments,
        synthesize_audio_table,
    )

    media = synthesize_audio_table(spark, n=9).coalesce(2)
    out = {r["uri"]: r for r in audio_energy_segments(media).collect()}
    assert len(out) == 9
    for i in range(9):
        r = out[f"mem://audio/{i}.wav"]
        # file i has (i % 3) + 1 tone bursts separated by silence
        assert r["n_segments"] == (i % 3) + 1, (i, r)
        assert 0 < r["n_active"] < r["n_frames"]
        assert r["total_energy"] > 0


# ---------------------------------------------------------------------------
# zone-map audit


def test_zone_map_sorted_layout_prunes(spark):
    rows = [(i, i % 997) for i in range(20000)]
    df = spark.createDataFrame(rows, "k long, v long")
    nat = zone_map_audit(
        df, ["k"], F.floor(F.col("k") / 1000), "v", 100, 120,
        chunk_rows=1000, layout="natural",
    ).collect()[0]
    srt = zone_map_audit(
        df, ["v", "k"], F.floor(F.col("v") / 50), "v", 100, 120,
        chunk_rows=1000, layout="sorted",
    ).collect()[0]
    assert nat["n_rows"] == srt["n_rows"] == 20000
    assert nat["n_chunks"] == srt["n_chunks"] == 20
    # v is uniform over k-order -> every natural chunk spans the range
    assert nat["n_chunks_scanned"] == 20
    # sorted layout confines [100, 120] to a single chunk
    assert srt["n_chunks_scanned"] == 1
    assert srt["scan_fraction"] < nat["scan_fraction"]


# ---------------------------------------------------------------------------
# FD audit


def test_fd_audit_g3_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "z"), (2, "z")],
        "a long, b string",
    )
    out = {r["fd"]: r for r in
           functional_dependency_audit(df, [(["a"], "b")]).collect()}
    r = out["a->b"]
    # group a=1: plurality x (2 of 3) -> 1 violation; a=2: clean
    assert (r["n_groups"], r["n_rows"], r["n_violations"]) == (2, 5, 1)
    assert math.isclose(r["violation_rate"], 0.2)


def test_fd_audit_null_rhs_is_value_class(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, None), (1, None)], "a long, b string"
    )
    r = functional_dependency_audit(df, [(["a"], "b")]).collect()[0]
    # plurality class is NULL (2 of 3): the non-null copy is the violation
    assert r["n_violations"] == 1


# ---------------------------------------------------------------------------
# HLL sliding distinct


def test_sliding_distinct_hll_matches_exact_on_small(spark):
    def d(day, h):
        return dt.datetime(2024, 1, day, h, 0)

    rows = [(f"u{i % 7}", d(1 + i % 5, 8 + i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    out = sliding_distinct_hll(df, "u", "ts", window_days=2).collect()
    assert len(out) == 5
    assert all(r["approx_ok"] for r in out)
    assert {r["window_end"] for r in out} == {
        dt.date(2024, 1, day) for day in range(1, 6)
    }


# ---------------------------------------------------------------------------
# product quantization


def test_product_quantize_exact_on_seed_vectors(spark):
    """With exactly n_codes distinct vectors, every vector is its own
    (refined) codeword -> distortion 0 and one member per code."""
    import random

    rng = random.Random(5)
    rows = [
        (i, [float(rng.randint(-100, 100)) for _ in range(16)])
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = product_quantize(df, "embedding", "vec_id", n_blocks=2, n_codes=8)
    rs = out.collect()
    assert all(r["distortion"] == 0.0 for r in rs)
    assert sum(r["n_assigned"] for r in rs) == 8 * 2


def test_product_quantize_distortion_drops_with_refinement(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [float(rng.randint(-50, 50)) for _ in range(16)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def total(iters):
        rs = product_quantize(
            df, "embedding", "vec_id", n_blocks=2, n_codes=8, refine_iters=iters
        ).collect()
        assert sum(r["n_assigned"] for r in rs) == 200 * 2
        return sum(r["distortion"] for r in rs)

    assert total(1) <= total(0) * (1 + 1e-9)  # Lloyd never increases distortion


# ---------------------------------------------------------------------------
# BPE merge discovery


def test_bpe_greedy_rounds(spark):
    from etl_java_spark.functions.lm import bpe_merge_discovery

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat the cat ran"),
         (2, "the cat sat while the cat sat again"),
         (3, "a b a b a b")],
        "doc_id long, text string",
    )
    out = {r["round"]: r for r in bpe_merge_discovery(df, rounds=3).collect()}
    assert (out[1]["w1"], out[1]["w2"], out[1]["pair_count"]) == ("the", "cat", 4)
    # all three consecutive (a, b) occurrences merge (double-space trick)
    assert (out[2]["w1"], out[2]["w2"], out[2]["pair_count"]) == ("a", "b", 3)
    # round 3 sees the ROUND-1 merge as a single token
    assert (out[3]["w1"], out[3]["w2"]) == ("the\x1fcat", "sat")
    assert out[3]["pair_count"] == 3


def test_bpe_consecutive_repeats_merge_left_to_right(spark):
    from etl_java_spark.functions.lm import bpe_merge_discovery

    # "x x x x": pairs (x,x) x3; greedy left-to-right merges positions
    # (1,2) and (3,4) -> 2 merges, count reported BEFORE merging = 3
    df = spark.createDataFrame([(1, "x x x x")], "doc_id long, text string")
    out = bpe_merge_discovery(df, rounds=2).collect()
    assert (out[0]["w1"], out[0]["w2"], out[0]["pair_count"]) == ("x", "x", 3)
    # after round 1 the doc is "xx  xx" -> top pair is (xx, xx) once
    assert (out[1]["w1"], out[1]["w2"], out[1]["pair_count"]) == (
        "x\x1fx", "x\x1fx", 1,
    )


# ---------------------------------------------------------------------------
# temporal BFS


def test_temporal_bfs_respects_time(spark):
    from etl_java_spark.operators.graph import temporal_bfs

    import datetime as dtm

    def d(day):
        return dtm.date(2024, 1, day)

    edges = spark.createDataFrame(
        [
            (1, 2, d(5)),   # seed -> 2 on day 5
            (2, 3, d(7)),   # 2 -> 3 AFTER arrival -> transmits
            (2, 4, d(3)),   # 2 -> 4 BEFORE arrival -> must NOT transmit
            (1, 5, d(2)),   # seed -> 5 on day 2
            (5, 4, d(9)),   # 5 -> 4 after arrival -> 4 reached via 5
        ],
        "src long, dst long, ts date",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r for r in
           temporal_bfs(edges, seeds, max_hops=2).collect()}
    assert out[1]["hops"] == 0
    assert out[2]["hops"] == 1 and out[2]["arrival_ts"] == d(5)
    assert out[5]["hops"] == 1 and out[5]["arrival_ts"] == d(2)
    assert out[3]["hops"] == 2 and out[3]["arrival_ts"] == d(7)
    # 4 is reached only through 5 (the 2->4 edge pre-dates 2's arrival)
    assert out[4]["hops"] == 2 and out[4]["arrival_ts"] == d(9)


# ---------------------------------------------------------------------------
# markov attribution


def test_markov_attribution_credits_the_gatekeeper(spark):
    from etl_java_spark.operators.assoc import markov_attribution

    import datetime as dtm

    rows = []
    eid = 0
    # every conversion goes through 'gate'; 'noise' appears in paths
    # that never convert -> removing gate kills all conversions
    for u in range(20):
        t0 = dtm.datetime(2024, 1, 1, 8, 0)
        if u % 2 == 0:
            seq = ["gate", "purchase"]
        else:
            seq = ["noise"]
        for i, e in enumerate(seq):
            rows.append((u, e, t0 + dtm.timedelta(minutes=i), eid)); eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp, event_id long")
    out = {r["channel"]: r for r in markov_attribution(
        df, "user_id", "event_type", "ts", "event_id", "purchase"
    ).collect()}
    assert math.isclose(out["gate"]["p_conv_full"], 0.5, abs_tol=1e-9)
    assert out["gate"]["p_conv_without"] == 0.0
    assert math.isclose(out["gate"]["removal_effect"], 1.0, abs_tol=1e-9)
    assert math.isclose(out["gate"]["share"], 1.0, abs_tol=1e-9)
    assert out["noise"]["removal_effect"] == 0.0


# ---------------------------------------------------------------------------
# Brier decomposition


def test_brier_decomposition_identity_and_perfect_forecast(spark):
    from etl_java_spark.operators.evaluation import brier_decomposition

    # perfect sharp forecast: s = y exactly -> brier 0, reliability 0,
    # resolution = uncertainty, within-bin 0
    rows = [(float(i % 2), i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = brier_decomposition(df, "y", "s").collect()[0]
    assert out["brier"] == 0.0 and out["reliability"] == 0.0
    assert math.isclose(out["resolution"], out["uncertainty"], abs_tol=1e-12)
    assert math.isclose(out["uncertainty"], 0.25, abs_tol=1e-12)
    assert abs(out["within_bin_term"]) < 1e-9

    # constant climatology forecast: resolution 0, brier = uncertainty
    rows2 = [(0.5, i % 2) for i in range(40)]
    df2 = spark.createDataFrame(rows2, "s double, y int")
    o2 = brier_decomposition(df2, "y", "s").collect()[0]
    assert o2["resolution"] == 0.0
    assert math.isclose(o2["brier"], 0.25, abs_tol=1e-12)


# ---------------------------------------------------------------------------
# leave-one-group-out OLS influence


def test_loo_influence_finds_the_bending_group(spark):
    from etl_java_spark.operators.evaluation import loo_ols_influence

    # eight clean groups follow y = 2*x1 + 3*x2; group c is adversarial
    rows = []
    specs = {f"a{k}": (2, 3) for k in range(8)}
    specs["c"] = (10, -5)
    for g, (b1, b2) in specs.items():
        for i in range(1, 21):
            x1, x2 = i, (i * 7) % 13 + 1
            rows.append((g, float(b1 * x1 + b2 * x2), float(x1), float(x2)))
    df = spark.createDataFrame(rows, "g string, y double, x1 double, x2 double")
    out = {r["g"]: r for r in
           loo_ols_influence(df, "g", "y", "x1", "x2").collect()}
    # removing the adversarial group recovers the clean coefficients
    assert math.isclose(out["c"]["beta1_loo"], 2.0, abs_tol=1e-6)
    assert math.isclose(out["c"]["beta2_loo"], 3.0, abs_tol=1e-6)
    # and its |delta| dwarfs any clean group's (removing one of eight
    # identical clean groups shifts the blend only slightly)
    assert abs(out["c"]["d_beta1"]) > 5 * abs(out["a0"]["d_beta1"])


# ---------------------------------------------------------------------------
# multiclass F1


def test_f1_from_confusion_hand_case(spark):
    from etl_java_spark.operators.evaluation import f1_from_confusion

    conf = spark.createDataFrame(
        [("a", "a", 8), ("a", "b", 2), ("b", "b", 5), ("b", "a", 5)],
        "true_label string, pred_label string, n long",
    )
    out = {r["label"]: r for r in f1_from_confusion(conf).collect()}
    a, b = out["a"], out["b"]
    assert (a["tp"], a["fp"], a["fn"]) == (8, 5, 2)
    assert (b["tp"], b["fp"], b["fn"]) == (5, 2, 5)
    assert math.isclose(a["precision"], 8 / 13, abs_tol=1e-12)
    assert math.isclose(a["recall"], 0.8, abs_tol=1e-12)
    assert math.isclose(a["micro_f1"], 13 / 20, abs_tol=1e-12)
    f1a = 2 * (8 / 13) * 0.8 / (8 / 13 + 0.8)
    f1b = 2 * (5 / 7) * 0.5 / (5 / 7 + 0.5)
    assert math.isclose(a["macro_f1"], (f1a + f1b) / 2, abs_tol=1e-9)


def test_f1_never_predicted_class_scores_zero(spark):
    from etl_java_spark.operators.evaluation import f1_from_confusion

    conf = spark.createDataFrame(
        [("a", "a", 5), ("b", "a", 3)],
        "true_label string, pred_label string, n long",
    )
    out = {r["label"]: r for r in f1_from_confusion(conf).collect()}
    assert out["b"]["precision"] == 0.0 and out["b"]["f1"] == 0.0


def test_temporal_bfs_integer_epoch_timestamps(spark):
    # VERDICT r8 #3: seed_ts=None over an epoch-long ts column must use
    # F.lit(0), not a NULL-casting date literal (which silently stopped
    # the BFS at hop 0).
    from etl_java_spark.operators.graph import temporal_bfs

    edges = spark.createDataFrame(
        [(1, 2, 100), (2, 3, 200), (2, 4, 50)],
        "src long, dst long, ts long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r for r in
           temporal_bfs(edges, seeds, max_hops=2).collect()}
    assert out[1]["hops"] == 0 and out[1]["arrival_ts"] == 0
    assert out[2]["hops"] == 1 and out[2]["arrival_ts"] == 100
    # 2->3 at 200 > 100 transmits; 2->4 at 50 <= 100 must not
    assert out[3]["hops"] == 2 and out[3]["arrival_ts"] == 200
    assert 4 not in out


def test_temporal_bfs_unsupported_ts_dtype_raises(spark):
    import pytest

    from etl_java_spark.operators.graph import temporal_bfs

    edges = spark.createDataFrame(
        [(1, 2, "2024-01-05")], "src long, dst long, ts string"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(TypeError, match="unsupported timestamp dtype"):
        temporal_bfs(edges, seeds, max_hops=1)
