"""Round-6 wave-h operators: sorted-neighborhood blocking, clamped
running balance, WOE/IV, longest streak, linear multi-touch
attribution."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from etl_java_spark.operators.assoc import linear_attribution
from etl_java_spark.operators.evaluation import woe_iv
from etl_java_spark.operators.relational import sorted_neighborhood_pairs
from etl_java_spark.operators.timeseries import (
    longest_streak,
    running_balance_clamped,
)


def test_sorted_neighborhood_window_and_blocks(spark):
    # keys sort as a1 < a2 < a3 < a4 within block A; window 3 pairs
    # ranks (1,2),(1,3),(2,3),(2,4),(3,4) — never (1,4); block B is
    # isolated.
    rows = [
        (1, "a1", "A"), (2, "a2", "A"), (3, "a3", "A"), (4, "a4", "A"),
        (9, "a1", "B"),
    ]
    df = spark.createDataFrame(rows, "id long, k string, blk string")
    pairs = {
        (r["id_a"], r["id_b"]): r["rank_distance"]
        for r in sorted_neighborhood_pairs(
            df, "id", "k", window=3, block_col="blk"
        ).collect()
    }
    assert pairs == {
        (1, 2): 1, (1, 3): 2, (2, 3): 1, (2, 4): 2, (3, 4): 1,
    }


def test_sorted_neighborhood_bucket_boundary(spark):
    # ranks 3 and 4 land in different width-3 buckets (1 and 1? rank
    # 3 -> bucket 1, rank 4 -> bucket 1); ranks 2 and 4 span buckets 0
    # and 1 — the explode-into-previous-bucket trick must still emit
    # the (2,4) pair.
    rows = [(i, f"x{i}") for i in range(1, 8)]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, "id", "k", window=3).collect()
    }
    expect = {
        (a, b) for a in range(1, 8) for b in range(1, 8)
        if b > a and b - a < 3
    }
    assert got == expect


def test_running_balance_clamp_and_shortfall(spark):
    rows = [("k", 1, 5), ("k", 2, -10), ("k", 3, 3), ("k", 4, -1)]
    df = spark.createDataFrame(rows, "k string, seq int, delta long")
    out = running_balance_clamped(df, "k", ["seq"], "delta").collect()[0]
    # 5 -> clamp at 0 (shortfall 5) -> 3 -> 2
    assert out["n_events"] == 4
    assert out["final_balance"] == 2
    assert out["n_clamped"] == 1
    assert out["shortfall"] == 5


def test_running_balance_input_order_independence(spark):
    import random

    rows = [("k", i, d) for i, d in enumerate([3, -5, 4, -1, -10, 20])]
    shuffled = rows[:]
    random.Random(3).shuffle(shuffled)
    a = running_balance_clamped(
        spark.createDataFrame(rows, "k string, seq int, delta long"),
        "k", ["seq"], "delta",
    ).collect()[0]
    b = running_balance_clamped(
        spark.createDataFrame(shuffled, "k string, seq int, delta long"),
        "k", ["seq"], "delta",
    ).collect()[0]
    assert (a["final_balance"], a["n_clamped"], a["shortfall"]) == (
        b["final_balance"], b["n_clamped"], b["shortfall"],
    )


def test_woe_iv_hand_case(spark):
    rows = [("A", 1)] * 3 + [("A", 0)] + [("B", 1)] + [("B", 0)] * 3
    df = spark.createDataFrame(rows, "cat string, y int")
    out = {r["category"]: r for r in woe_iv(df, "cat", "y").collect()}
    # smoothed: pA = 3.5/5, qA = 1.5/5 -> woe = ln(7/3); B mirrors
    woe = math.log(3.5 / 1.5)
    assert out["A"]["woe"] == round(woe, 12)
    assert out["B"]["woe"] == round(-woe, 12)
    term = round((3.5 / 5 - 1.5 / 5) * woe, 12)
    assert out["A"]["iv_term"] == term
    assert out["A"]["iv_total"] == round(2 * term, 12)


def test_longest_streak_islands_and_tiebreak(spark):
    def d(day):
        return dt.datetime(2024, 1, day, 12, 0)

    rows = [("u", d(x)) for x in [1, 2, 3, 5, 6, 10, 10]]  # dup same day
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    out = longest_streak(df, "u", "ts").collect()[0]
    assert out["n_active_days"] == 6
    assert out["n_streaks"] == 3
    assert out["longest_streak"] == 3
    assert out["longest_streak_start"] == dt.date(2024, 1, 1)

    tie = spark.createDataFrame(
        [("u", d(x)) for x in [3, 4, 8, 9]], "u string, ts timestamp"
    )
    out2 = longest_streak(tie, "u", "ts").collect()[0]
    assert out2["longest_streak"] == 2
    assert out2["longest_streak_start"] == dt.date(2024, 1, 3)  # earliest


def test_linear_attribution_conserves_microcents(spark):
    base = dt.datetime(2024, 1, 1, 12, 0)

    def s(sec):
        return base + dt.timedelta(seconds=sec)

    purchases = spark.createDataFrame(
        [(100, 1, s(0), 100), (200, 1, s(5000), 99)],
        "event_id long, user_id long, ts timestamp, cents long",
    )
    touches = spark.createDataFrame(
        [
            (1, s(-100), "a"), (1, s(-50), "b"), (1, s(-10), "a"),
            (1, s(4990), "c"),          # only touch for purchase 200
            (1, s(10), "d"),            # AFTER purchase 100, ignored
            (2, s(-5), "e"),            # other user, ignored
        ],
        "user_id long, touch_ts timestamp, channel string",
    )
    out = {
        r["channel"]: r
        for r in linear_attribution(purchases, touches).collect()
    }
    # purchase 100: 1,000,000 microcents over 3 touches -> 333,333 each,
    # remainder 1 to the earliest (channel a at -100s)
    assert out["a"]["attributed_microcents"] == 333334 + 333333
    assert out["b"]["attributed_microcents"] == 333333
    assert out["c"]["attributed_microcents"] == 990000
    assert "d" not in out and "e" not in out
    total = sum(r["attributed_microcents"] for r in out.values())
    assert total == 100 * 10000 + 99 * 10000  # exact conservation


from etl_java_spark.operators.evaluation import pvm_bridge  # noqa: E402
from etl_java_spark.operators.sampling import (  # noqa: E402
    budget_select,
    interleave_order,
)
from etl_java_spark.operators.timeseries import sliding_distinct  # noqa: E402


def test_budget_select_prefix_semantics(spark):
    rows = [
        ("s", 1, 3, 30), ("s", 2, 3, 20), ("s", 3, 3, 10),  # q desc by qual
        ("t", 9, 100, 99),  # oversized head blocks its whole group
        ("t", 8, 1, 1),
    ]
    df = spark.createDataFrame(rows, "src string, id long, cost long, qual long")
    out = budget_select(df, "src", "id", "cost", "qual", 7)
    got = {(r["src"], r["id"]): r["cum_cost"] for r in out.collect()}
    assert got == {("s", 1): 3, ("s", 2): 6}  # third would hit 9 > 7
    # oversized first row ends group t immediately (prefix contract)
    assert not any(k[0] == "t" for k in got)


def test_interleave_round_robin_positions(spark):
    rows = [(i, i % 2) for i in range(1, 9)]  # 4 rows per bucket
    df = spark.createDataFrame(rows, "id long, bucket int")
    out = interleave_order(df, "id", "bucket", 2).collect()
    pos = sorted(r["position"] for r in out)
    assert pos == list(range(8))  # dense + unique for equal buckets
    by_pos = {r["position"]: r["bucket"] for r in out}
    assert all(by_pos[p] == p % 2 for p in range(8))  # buckets alternate


def test_sliding_distinct_hand_case(spark):
    def d(day):
        return dt.datetime(2024, 1, day, 8, 0)

    rows = [("u1", d(1)), ("u2", d(1)), ("u2", d(3)), ("u2", d(3))]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    out = {
        r["window_end"]: r["n_distinct"]
        for r in sliding_distinct(df, "u", "ts", window_days=2).collect()
    }
    assert out == {
        dt.date(2024, 1, 1): 2,  # [Dec 31, Jan 1] -> u1, u2
        dt.date(2024, 1, 2): 2,  # [Jan 1, Jan 2] -> u1, u2
        dt.date(2024, 1, 3): 1,  # [Jan 2, Jan 3] -> u2
    }


def test_sliding_distinct_gap_days_read_zero(spark):
    """An activity gap longer than the window must produce n_distinct=0
    rows, not missing rows — averaging the column assumes a full grid."""

    def d(day):
        return dt.datetime(2024, 1, day, 8, 0)

    df = spark.createDataFrame(
        [("u1", d(1)), ("u1", d(5))], "u string, ts timestamp"
    )
    out = {
        r["window_end"]: r["n_distinct"]
        for r in sliding_distinct(df, "u", "ts", window_days=2).collect()
    }
    assert out == {
        dt.date(2024, 1, 1): 1,
        dt.date(2024, 1, 2): 1,
        dt.date(2024, 1, 3): 0,  # [Jan 2, Jan 3]: quiet, still a row
        dt.date(2024, 1, 4): 0,
        dt.date(2024, 1, 5): 1,
    }


def test_pvm_bridge_exact_identity(spark):
    rows = [
        ("X", "a", 10, 100), ("X", "b", 12, 110),
        ("Y", "a", 5, 200),                      # disappears in b
        ("Z", "b", 4, 50),                       # appears in b
    ]
    df = spark.createDataFrame(rows, "k string, per string, q long, pc long")
    out = {r["k"]: r for r in
           pvm_bridge(df, "k", "per", "q", "pc", "a", "b").collect()}
    x = out["X"]
    assert (x["rev_a_cents"], x["rev_b_cents"]) == (1000, 1320)
    assert x["volume_effect_micro"] == 2 * 1_000_000
    assert x["price_effect_micro"] == 10 * 100_000
    assert x["cross_effect_micro"] == 2 * 100_000
    for r in out.values():  # the identity holds on EVERY row
        assert (
            r["volume_effect_micro"]
            + r["price_effect_micro"]
            + r["cross_effect_micro"]
            == r["delta_cents"] * 10000
        )
    assert out["Y"]["delta_cents"] == -1000
    assert out["Z"]["delta_cents"] == 200
