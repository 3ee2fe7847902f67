"""Round-12 operator references: the streaming near-dup guard.

Pure-Python replays of the order-free rejection policy plus the
batching-order-robustness contract (the drained state must be
identical for ANY split of the stream into micro-batches, including
arrival orders that force retroactive rejection).
"""

from __future__ import annotations

import re
import shutil
import tempfile

import pytest


def _shingles(text: str, n: int = 3) -> frozenset:
    tk = [t for t in re.split(r"[^a-z0-9]+", text.strip().lower()) if t]
    if len(tk) < n:
        return frozenset([" ".join(tk)])
    return frozenset(
        " ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)
    )


def _jac(a: frozenset, b: frozenset) -> float:
    u = len(a | b)
    return len(a & b) / max(u, 1)


def _reference_state(docs: dict[int, str], threshold: float = 0.5):
    """The order-free policy: rejected iff a lower-id doc has
    J >= threshold; best match = highest J, then smallest id."""
    sh = {i: _shingles(t) for i, t in docs.items()}
    out = {}
    for i in sorted(docs):
        matches = [
            (j, _jac(sh[i], sh[j]))
            for j in sorted(docs)
            if j < i and _jac(sh[i], sh[j]) >= threshold
        ]
        if matches:
            best = max(matches, key=lambda m: (m[1], -m[0]))
            out[i] = (False, len(matches), best[0], best[1])
        else:
            out[i] = (True, 0, None, None)
    return out


def _run_guard(spark, slices, threshold: float = 0.5):
    """Write each slice as one parquet file, drain the guard over a
    maxFilesPerTrigger=1 stream, return {doc_id: state tuple}."""
    from etl_java_spark.streaming.neardup import (
        foreach_batch_neardup_guard,
        read_neardup_state,
    )

    workdir = tempfile.mkdtemp(prefix="t_neardup_")
    try:
        indir = f"{workdir}/in"
        for sl in slices:
            df = spark.createDataFrame(sl, "doc_id long, text string")
            df.coalesce(1).write.mode("append").parquet(indir)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
        )
        q = foreach_batch_neardup_guard(
            spark, stream, workdir, threshold=threshold
        )
        q.awaitTermination()
        rows = read_neardup_state(spark, workdir).collect()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return {
        r["doc_id"]: (
            r["accepted"],
            r["n_dup_matches"],
            r["best_match_id"],
            r["best_jaccard"],
        )
        for r in rows
    }


DOCS = {
    1: "the quick brown fox jumps over the lazy dog near the river",
    2: "the quick brown fox jumps over the lazy dog near the riverbank",
    3: "completely different text about spark streaming state stores",
    4: "the quick brown fox jumps over the lazy dog near the river today",
    5: "another unrelated document mentioning parquet and band indexes",
}


def test_neardup_guard_matches_reference(spark):
    got = _run_guard(
        spark, [[(i, t) for i, t in sorted(DOCS.items())]]
    )
    want = _reference_state(DOCS)
    assert set(got) == set(want)
    for i in want:
        wa, wn, wm, wj = want[i]
        ga, gn, gm, gj = got[i]
        assert (ga, gn, gm) == (wa, wn, wm), i
        if wj is None:
            assert gj is None
        else:
            assert gj == pytest.approx(wj, rel=1e-12)
    # the fixture plants a real near-dup chain: 1 accepted, 2 and 4
    # rejected against it
    assert want[1][0] is True
    assert want[2][0] is False and want[4][0] is False


def test_neardup_guard_batch_split_invariant(spark):
    items = [(i, t) for i, t in sorted(DOCS.items())]
    one = _run_guard(spark, [items])
    per_doc = _run_guard(spark, [[x] for x in items])
    reversed_batches = _run_guard(
        spark, [[items[4], items[3]], [items[2]], [items[1], items[0]]]
    )
    assert one == per_doc == reversed_batches


def test_neardup_guard_retro_rejects_across_batches(spark):
    # the HIGHER-id twin arrives FIRST and is accepted (nothing seen
    # yet); when the lower-id original lands in a later batch the twin
    # must flip to rejected in the drained state
    twin_first = _run_guard(
        spark,
        [[(2, DOCS[2])], [(3, DOCS[3])], [(1, DOCS[1]), (4, DOCS[4])]],
    )
    assert twin_first[2][0] is False and twin_first[2][2] == 1
    assert twin_first[1][0] is True
    # and the final state equals the all-at-once run over the same docs
    assert twin_first == _run_guard(
        spark, [[(i, DOCS[i]) for i in (1, 2, 3, 4)]]
    )


# ---------------------------------------------------------------------------
# market-basket family (operators/mba.py) vs hand-computed references


_BASKETS = [
    (1, "A"), (1, "B"), (1, "C"),
    (2, "A"), (2, "B"),
    (3, "A"), (3, "C"),
    (4, "B"), (4, "C"),
    (5, "A"), (5, "D"),  # D occurs once -> pruned at min_item_n=2
]


def test_association_rules_hand_counts(spark):
    from etl_java_spark.operators.mba import association_rules

    tx = spark.createDataFrame(_BASKETS, "basket long, item string")
    rows = {
        (r["item_a"], r["item_b"]): r
    for r in association_rules(
        tx, "basket", "item", min_item_n=2, min_pair_n=2
    ).collect()}
    assert set(rows) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = rows[("A", "B")]
    assert ab["pair_n"] == 2 and ab["a_n"] == 4 and ab["b_n"] == 3
    assert ab["n_baskets"] == 5
    assert ab["support"] == 2 / 5
    assert ab["conf_ab"] == 2 / 4
    assert ab["conf_ba"] == 2 / 3
    assert ab["lift"] == (2 * 5) / (4 * 3)


def test_association_rules_min_pair_prune(spark):
    from etl_java_spark.operators.mba import association_rules

    tx = spark.createDataFrame(_BASKETS, "basket long, item string")
    out = association_rules(
        tx, "basket", "item", min_item_n=2, min_pair_n=3
    ).collect()
    assert out == []  # every surviving pair co-occurs exactly twice


def test_item_cosine_neighbors_rank_and_ties(spark):
    from etl_java_spark.operators.mba import item_cosine_neighbors

    tx = spark.createDataFrame(_BASKETS, "basket long, item string")
    out = item_cosine_neighbors(
        tx, "basket", "item", k=5, min_item_n=2, min_pair_n=2
    ).collect()
    got = {(r["item"], r["rank"]): (r["neighbor"], r["cosine"]) for r in out}
    # A: cos(A,B) == cos(A,C) == 2/sqrt(12), equal pair_n -> tie breaks
    # on neighbor asc (B before C)
    assert got[("A", 1)][0] == "B" and got[("A", 2)][0] == "C"
    assert got[("A", 1)][1] == 2 / (12 ** 0.5)
    # B: cos(B,C) = 2/3 beats cos(B,A) = 2/sqrt(12)
    assert got[("B", 1)] == ("C", 2 / 3)
    assert got[("B", 2)][0] == "A"
    # D was pruned: no rows for it in either direction
    assert not any(r["item"] == "D" or r["neighbor"] == "D" for r in out)


def test_slope_one_hand_example(spark):
    from etl_java_spark.operators.mba import slope_one_predict

    ratings = spark.createDataFrame(
        [
            (1, "I", 5), (1, "J", 3),
            (2, "I", 3), (2, "J", 1), (2, "K", 2),
            (3, "I", 4), (3, "K", 2),
            (4, "L", 7),  # only item -> no co-rated pair, NULL pred
        ],
        "u long, it string, r long",
    )
    out = {
        (r["user"], r["item"]): r
    for r in slope_one_predict(ratings, "u", "it", "r").collect()}
    # dev(I->J): users 1,2 -> diffsum=-4, n=2; pred(1,J) from I:
    # (-4 + 2*5)/2 = 3.0 (the data is exactly slope-one-consistent)
    assert out[(1, "J")]["pred"] == 3.0
    assert out[(1, "I")]["pred"] == 5.0
    # pred(2,K): from I (-3 + 2*3) + from J (1 + 1*1) = 5 over den 3
    assert out[(2, "K")]["pred"] == 5 / 3
    assert out[(2, "K")]["n_weight"] == 3
    # pred(3,I): from K: diffsum(K->I)=3 + 2*2 = 7 over 2
    assert out[(3, "I")]["pred"] == 3.5
    # isolated item: nothing to predict from
    assert out[(4, "L")]["pred"] is None
    assert out[(4, "L")]["n_weight"] == 0


# ---------------------------------------------------------------------------
# reliability family (operators/reliability.py) vs hand-computed references


def _ts(sec):
    from datetime import datetime, timezone

    return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)


def test_crow_amsaa_hand_mle(spark):
    import math

    from etl_java_spark.operators.reliability import crow_amsaa

    day = 86400
    rows = [("g", _ts(0)), ("g", _ts(day)), ("g", _ts(2 * day)),
            ("g", _ts(4 * day))]
    df = spark.createDataFrame(rows, "grp string, ts timestamp")
    out = crow_amsaa(df, "grp", "ts").collect()[0]
    # origin failure excluded (t=0); t = 1d, 2d, 4d; tn = 4d
    assert out["n_failures"] == 3
    assert out["t_days"] == 4.0
    beta = 3.0 / (round(math.log(4.0), 9) + round(math.log(2.0), 9))
    assert out["beta"] == pytest.approx(beta, abs=1e-9)
    assert out["lambda_day"] == pytest.approx(3.0 / 4.0 ** beta, abs=1e-6)
    assert out["improving"] is False  # beta ~ 1.44 > 1: wear-out


def test_crow_amsaa_single_failure_null(spark):
    from etl_java_spark.operators.reliability import crow_amsaa

    df = spark.createDataFrame(
        [("g", _ts(0)), ("g", _ts(100))], "grp string, ts timestamp"
    )
    out = crow_amsaa(df, "grp", "ts").collect()[0]
    # only ONE positive-t failure and sum_ln = 0 -> no estimate
    assert out["n_failures"] == 1
    assert out["beta"] is None and out["lambda_day"] is None


def test_failure_recovery_stats_hand(spark):
    from pyspark.sql import functions as F

    from etl_java_spark.operators.reliability import (
        failure_recovery_stats,
    )

    rows = [
        (1, 10, _ts(0), "view"),
        (2, 10, _ts(10), "error"),
        (3, 10, _ts(20), "error"),
        (4, 10, _ts(30), "view"),
        (5, 10, _ts(50), "error"),  # never recovered
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, et string"
    )
    out = failure_recovery_stats(
        df, F.lit(0), "user_id", "ts",
        F.col("et") == "error", F.col("et") == "view",
    ).collect()[0]
    assert out["n_failures"] == 3 and out["n_recovered"] == 2
    assert out["mtbf_sec"] == 20.0  # gaps 10s, 30s
    assert out["mttr_sec"] == 15.0  # 20s and 10s to the t=30 recovery
    # (10,30) and (20,30) merge into ONE 20s island — not 30s
    assert out["downtime_us"] == 20_000_000
    assert out["availability"] == 1.0 - 20 / 50


def test_gauge_rr_hand_components(spark):
    from etl_java_spark.operators.reliability import gauge_rr

    rows = [
        ("P1", "O1", 10), ("P1", "O1", 12),
        ("P1", "O2", 11), ("P1", "O2", 13),
        ("P2", "O1", 20), ("P2", "O1", 22),
        ("P2", "O2", 21), ("P2", "O2", 23),
    ]
    df = spark.createDataFrame(rows, "part string, op string, v long")
    out = gauge_rr(df, "part", "op", "v").collect()[0]
    assert out["balanced"] is True
    assert (out["p_parts"], out["o_operators"], out["r_reps"]) == (2, 2, 2)
    # SS: part 200, op 2, inter 0, err 8 -> MS 200/2/0/2
    assert out["var_repeat"] == 2.0
    assert out["var_interaction"] == 0.0
    assert out["var_operator"] == 0.5
    assert out["var_part"] == 50.0
    assert out["var_grr"] == 2.5
    assert out["pct_grr"] == pytest.approx(2.5 / 52.5, abs=1e-9)
    assert out["ndc"] == 6  # floor(1.41 * sqrt(50/2.5))


def test_gauge_rr_unbalanced_nulls(spark):
    from etl_java_spark.operators.reliability import gauge_rr

    rows = [
        ("P1", "O1", 10), ("P1", "O1", 12), ("P1", "O2", 11),
        ("P2", "O1", 20), ("P2", "O2", 21),
    ]
    df = spark.createDataFrame(rows, "part string, op string, v long")
    out = gauge_rr(df, "part", "op", "v").collect()[0]
    assert out["balanced"] is False
    assert out["var_part"] is None and out["pct_grr"] is None


# ---------------------------------------------------------------------------
# cluster validity / naive Bayes / sequential pairs (wave C)


def test_cluster_validity_hand_two_clusters(spark):
    from etl_java_spark.operators.evaluation import cluster_validity

    rows = [("A", 0, 0), ("A", 2, 0), ("B", 10, 0), ("B", 12, 0)]
    df = spark.createDataFrame(rows, "lab string, x0 long, x1 long")
    out = cluster_validity(df, "lab", ["x0", "x1"]).collect()[0]
    assert (out["k"], out["n"]) == (2, 4)
    assert out["ss_within"] == 4.0  # 1+1 per cluster, both dims
    assert out["ss_between"] == 100.0  # 2*25 + 2*25
    assert out["calinski_harabasz"] == 50.0  # (100/1)/(4/2)
    assert out["davies_bouldin"] == pytest.approx(0.2, abs=1e-9)


def test_naive_bayes_hand_confusion(spark):
    from etl_java_spark.operators.evaluation import naive_bayes_confusion

    rows = [(1, "X", "a"), (2, "X", "a"), (3, "Y", "b"), (4, "Y", "a")]
    df = spark.createDataFrame(rows, "rid long, cls string, f string")
    out = {
        (r["actual"], r["predicted"]): r["n_rows"]
    for r in naive_bayes_confusion(df, "rid", "cls", ["f"]).collect()}
    # P(a|X)=3/4 beats P(a|Y)=2/4 -> 'a' rows predict X (row 4
    # misclassified); P(b|X)=1/4 loses to P(b|Y)=2/4 -> row 3 correct
    assert out == {("X", "X"): 2, ("Y", "X"): 1, ("Y", "Y"): 1}


def test_naive_bayes_tie_breaks_to_smaller_class(spark):
    from etl_java_spark.operators.evaluation import naive_bayes_confusion

    rows = [(1, "X", "a"), (2, "Y", "a")]
    df = spark.createDataFrame(rows, "rid long, cls string, f string")
    out = {
        (r["actual"], r["predicted"]): r["n_rows"]
    for r in naive_bayes_confusion(df, "rid", "cls", ["f"]).collect()}
    # identical scores for X and Y -> both rows predict X
    assert out == {("X", "X"): 1, ("Y", "X"): 1}


def test_sequential_pair_counts_hand(spark):
    from etl_java_spark.operators.process import sequential_pair_counts

    rows = [
        (1, 10, _ts(1), "a"), (2, 10, _ts(2), "b"),
        (3, 10, _ts(3), "a"), (4, 10, _ts(4), "b"),
        (5, 20, _ts(1), "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, et string"
    )
    out = {
        (r["ante"], r["post"]): (r["n_pairs"], r["n_entities"])
    for r in sequential_pair_counts(
        df, "user_id", "ts", "event_id", "et", ["a", "b"]
    ).collect()}
    assert out[("a", "b")] == (3, 1)  # a1<b1, a1<b2, a2<b2
    assert out[("a", "a")] == (1, 1)
    assert out[("b", "a")] == (1, 1)
    assert out[("b", "b")] == (1, 1)  # user 20's lone b pairs with none


def test_sequential_pair_counts_tiebreak_order(spark):
    from etl_java_spark.operators.process import sequential_pair_counts

    # same timestamp: event_id breaks the tie, so a (id 1) precedes
    # b (id 2) but NOT vice versa
    rows = [(1, 10, _ts(5), "a"), (2, 10, _ts(5), "b")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, et string"
    )
    out = {
        (r["ante"], r["post"]): r["n_pairs"]
    for r in sequential_pair_counts(
        df, "user_id", "ts", "event_id", "et", ["a", "b"]
    ).collect()}
    assert out[("a", "b")] == 1 and out[("b", "a")] == 0


# ---------------------------------------------------------------------------
# robust econometric inference (wave D)


def test_panel_fixed_effects_exact_within_slope(spark):
    from etl_java_spark.operators.experiments import panel_fixed_effects

    rows = [
        (1, 0, 10), (1, 1, 12), (1, 2, 14),   # slope 2 within e1
        (2, 0, 100), (2, 1, 102),             # slope 2 within e2
    ]
    df = spark.createDataFrame(rows, "ent long, x long, y long")
    out = panel_fixed_effects(df, "ent", "x", "y").collect()[0]
    assert (out["n_obs"], out["n_entities"]) == (5, 2)
    assert out["sxx_within"] == 2.5
    assert out["sxy_within"] == 5.0
    assert out["syy_within"] == 10.0
    assert out["beta_within"] == 2.0
    assert out["r2_within"] == 1.0


def test_newey_west_hand_kernel(spark):
    import math

    from etl_java_spark.operators.timeseries import newey_west_lrv

    df = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 4)], "o long, y long"
    )
    out = newey_west_lrv(df, "o", "y", max_lag=5).collect()[0]
    # v = 4y-10 = [-6,-2,2,6]; g0=80 g1=20 g2=-24 g3=-36 g4=g5=0
    # kern = 6*80 + 10*20 + 8*(-24) + 6*(-36) = 272
    assert out["n"] == 4
    assert out["gamma0"] == pytest.approx(80 / 64, abs=1e-6)
    lrv = 272 / (64 * 6)
    assert out["lrv"] == pytest.approx(lrv, abs=1e-6)
    assert out["se_mean_hac"] == pytest.approx(
        math.sqrt(lrv / 4), abs=1e-9
    )
    assert out["se_mean_iid"] == pytest.approx(
        math.sqrt((80 / 64) * (4 / 3) / 4), abs=1e-9
    )


def test_runs_test_alternating_rejects(spark):
    import math

    from etl_java_spark.operators.experiments import runs_test

    ys = [5, 1, 6, 2, 7, 3, 8, 4]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "o long, v long"
    )
    out = runs_test(df, "o", "v").collect()[0]
    # lower median of 1..8 is 4 (excluded): survivors 5,1,6,2,7,3,8
    # alternate perfectly -> 7 runs of 7 values
    assert (out["n_used"], out["n_above"], out["n_below"]) == (7, 4, 3)
    assert out["n_runs"] == 7
    mu = 24 / 7 + 1
    var = (24 * 17) / (49 * 6)
    assert out["z_runs"] == pytest.approx(
        (7 - mu) / math.sqrt(var), abs=1e-9
    )
    assert out["reject_5pct"] is True


def test_runs_test_single_block_too_few_runs(spark):
    from etl_java_spark.operators.experiments import runs_test

    # monotone series: all lows first, all highs after -> 2 runs
    ys = [1, 2, 3, 10, 11, 12]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "o long, v long"
    )
    out = runs_test(df, "o", "v").collect()[0]
    # lower median 3 excluded -> 1,2 below; 10,11,12 above; 2 runs
    assert out["n_runs"] == 2
    assert out["z_runs"] < 0  # too few runs = trending


# ---------------------------------------------------------------------------
# weighted SSSP / ABC-XYZ / event study (wave E)


def test_weighted_sssp_relaxes_through_cheaper_path(spark):
    from etl_java_spark.operators.graph import weighted_sssp

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("a", "c", 5)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    out = weighted_sssp(edges, seeds, rounds=3).collect()[0]
    # direct a-c (5) loses to a-b-c (2)
    assert out["n_reached"] == 2
    assert out["total_dist"] == 3  # b=1, c=2
    assert out["max_dist"] == 2
    assert out["closeness"] == pytest.approx(2 / 3, abs=1e-9)


def test_weighted_sssp_hop_bound(spark):
    from etl_java_spark.operators.graph import weighted_sssp

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    out = weighted_sssp(edges, seeds, rounds=2).collect()[0]
    # d needs 3 relaxations; at rounds=2 only b and c are priced
    assert out["n_reached"] == 2 and out["max_dist"] == 2


def test_abc_xyz_hand_grid(spark):
    from etl_java_spark.operators.relational import abc_xyz_analysis

    rows = [
        (1, 1, 40, 2), (1, 2, 40, 2),   # A by revenue, cv=0 -> X
        (2, 1, 10, 1), (2, 2, 5, 3),    # B, cv=0.5 boundary -> X
        (3, 1, 3, 1), (3, 2, 2, 5),     # C, cv=2/3 -> Y
    ]
    df = spark.createDataFrame(rows, "item long, p long, rev long, q long")
    out = {
        (r["abc_class"], r["xyz_class"]): (r["n_items"], r["revenue"])
    for r in abc_xyz_analysis(df, "item", "p", "rev", "q").collect()}
    assert out == {
        ("A", "X"): (1, 80), ("B", "X"): (1, 15), ("C", "Y"): (1, 5)
    }


def test_event_study_zero_filled_grid(spark):
    from pyspark.sql import functions as F

    from etl_java_spark.operators.experiments import event_study_panel

    day = 86400
    rows = [
        (1, 10, _ts(5 * day), "view"),
        (2, 10, _ts(7 * day), "purchase"),
        (3, 10, _ts(8 * day), "view"),
        (4, 10, _ts(8 * day), "click"),
        (5, 20, _ts(6 * day), "view"),  # no purchase: excluded
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, et string"
    )
    out = {
        r["rel_day"]: (r["n_entities"], r["n_events"])
    for r in event_study_panel(
        df, "user_id", "ts", F.col("et") == "purchase", window_days=3
    ).collect()}
    assert len(out) == 7  # the full -3..3 grid, zero-filled
    assert all(v[0] == 1 for v in out.values())
    assert out[-2] == (1, 1)
    assert out[0] == (1, 1)   # the anchor itself
    assert out[1] == (1, 2)
    assert out[-3] == (1, 0) and out[3] == (1, 0)


# ---------------------------------------------------------------------------
# Kendall's W / two-sample KS / concentration (wave F)


def test_kendalls_w_perfect_reversed_and_ties(spark):
    from etl_java_spark.operators.evaluation import kendalls_w

    agree = spark.createDataFrame(
        [("j1", "A", 10), ("j1", "B", 20), ("j1", "C", 30),
         ("j2", "A", 5), ("j2", "B", 6), ("j2", "C", 7)],
        "j string, i string, v long",
    )
    out = kendalls_w(agree, "j", "i", "v").collect()[0]
    assert (out["n_items"], out["m_judges"]) == (3, 2)
    assert out["s4"] == 32 and out["tie_correction"] == 0
    assert out["kendall_w"] == 1.0
    assert out["chi2_approx"] == 4.0
    # full reversal by judge 2 -> zero concordance
    rev = spark.createDataFrame(
        [("j1", "A", 10), ("j1", "B", 20), ("j1", "C", 30),
         ("j2", "A", 7), ("j2", "B", 6), ("j2", "C", 5)],
        "j string, i string, v long",
    )
    assert kendalls_w(rev, "j", "i", "v").collect()[0]["kendall_w"] == 0.0
    # a tie inside judge 1 contributes t^3 - t = 6 to the correction
    tied = spark.createDataFrame(
        [("j1", "A", 10), ("j1", "B", 10), ("j1", "C", 30),
         ("j2", "A", 5), ("j2", "B", 6), ("j2", "C", 7)],
        "j string, i string, v long",
    )
    assert kendalls_w(tied, "j", "i", "v").collect()[0][
        "tie_correction"
    ] == 6


def test_ks_two_sample_disjoint_and_identical(spark):
    from pyspark.sql import functions as F

    from etl_java_spark.operators.experiments import ks_two_sample

    rows = [(True, 1), (True, 2), (True, 3),
            (False, 4), (False, 5), (False, 6)]
    df = spark.createDataFrame(rows, "g boolean, v long")
    out = ks_two_sample(df, F.col("g"), "v").collect()[0]
    assert (out["n1"], out["n2"]) == (3, 3)
    assert out["d_scaled"] == 9 and out["d_stat"] == 1.0
    # n=3: the asymptotic threshold 1.358*sqrt(6/9) ~ 1.109 exceeds
    # even D=1 — tiny samples can never reject (document, don't fudge)
    assert out["reject_5pct"] is False
    big = spark.createDataFrame(
        [(True, i) for i in range(20)]
        + [(False, 100 + i) for i in range(20)],
        "g boolean, v long",
    )
    outb = ks_two_sample(big, F.col("g"), "v").collect()[0]
    assert outb["d_stat"] == 1.0 and outb["reject_5pct"] is True
    same = spark.createDataFrame(
        [(g, v) for g in (True, False) for v in (1, 2, 3)],
        "g boolean, v long",
    )
    out2 = ks_two_sample(same, F.col("g"), "v").collect()[0]
    assert out2["d_scaled"] == 0 and out2["reject_5pct"] is False


def test_concentration_panel_hand(spark):
    from etl_java_spark.operators.relational import concentration_panel

    df = spark.createDataFrame(
        [(1, 50), (2, 30), (3, 15), (4, 5)], "f long, rev long"
    )
    out = concentration_panel(df, "f", "rev", top_k=4).collect()[0]
    assert out["n_firms"] == 4 and out["total_revenue"] == 100
    assert out["hhi"] == pytest.approx(0.365, abs=1e-9)
    assert out["cr_top"] == 1.0
    assert out["top1_share"] == 0.5
    assert out["effective_firms"] == pytest.approx(1 / 0.365, abs=1e-6)
