"""Association mining: co-occurrence lift over (basket, item) facts.

Charter §2B extension (no reference counterpart — RoberWaters/ETL-Java,
src/etl/ETLProcess.java:1-568, has no analytics surface). Market-basket
item-item affinity is the classic warehouse-adjacent analytics job: the
same shape powers "bought together" recommendations, co-view graphs, and
feature co-occurrence stats for training-data analysis.

Scale stance: the only quadratic step is the within-basket pair
generation, which is bounded by ``max_items_per_basket`` (top-N by item
id, deterministic) — pairs are O(baskets x cap^2) no matter how skewed
the basket-size distribution is. Counts are map-side-combinable
aggregates; the lift division is one IEEE double op over exact integer
counts, so results are bit-reproducible on any partitioning and
replayable by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def copurchase_lift(
    facts: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 5,
    max_items_per_basket: int | None = 64,
) -> DataFrame:
    """Item-item co-occurrence with lift: for each unordered item pair
    appearing in >= ``min_support`` common baskets,
    lift = n_ab * N / (n_a * n_b) where N = #baskets. lift > 1 means
    the pair co-occurs more than independence predicts.

    Returns (item_a, item_b, n_ab, n_a, n_b, lift) with item_a < item_b.
    """
    it = facts.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    if max_items_per_basket is not None:
        w = Window.partitionBy("__b").orderBy("__i")
        it = (
            it.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_items_per_basket)
            .drop("__rn")
        )
    # Four consumers (basket count, item counts, both pair-join sides):
    # materialize the deduped/capped fact once instead of re-shuffling it
    # per consumer.
    it = it.localCheckpoint(eager=False)
    n_baskets = it.agg(F.countDistinct("__b").alias("__nb"))
    item_counts = it.groupBy("__i").agg(F.count("*").alias("__ni"))
    a, b = it.alias("a"), it.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__b") == F.col("b.__b")) & (F.col("a.__i") < F.col("b.__i")),
        )
        .groupBy(F.col("a.__i").alias("item_a"), F.col("b.__i").alias("item_b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    ca = item_counts.select(F.col("__i").alias("item_a"), F.col("__ni").alias("n_a"))
    cb = item_counts.select(F.col("__i").alias("item_b"), F.col("__ni").alias("n_b"))
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a", "item_b", "n_ab", "n_a", "n_b",
            (
                (F.col("n_ab") * F.col("__nb")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


def linear_attribution(
    purchases: DataFrame,
    touches: DataFrame,
    purchase_id: str = "event_id",
    user_col: str = "user_id",
    purchase_ts: str = "ts",
    touch_ts: str = "touch_ts",
    cents_col: str = "cents",
    channel_col: str = "channel",
    window_seconds: int = 3600,
) -> DataFrame:
    """Linear multi-touch attribution: every touch (click/impression)
    in the lookback window before a purchase shares the revenue
    credit EQUALLY — the fairness-first alternative to last-touch
    (q199), which hands everything to whoever got lucky last.

    Credit is conserved EXACTLY in integer micro-cents: each of the k
    touches gets floor(cents * 10000 / k); the division remainder goes
    to the EARLIEST touch (deterministic tie-break by touch time then
    channel), so per-purchase credits always sum to cents * 10000 —
    no float credit, no drift, engine-bitwise.

    Returns per-channel rows: (channel, n_touches,
    attributed_microcents).

    Scale: one equi-join on the user key with a time-range residual
    (the as-of join family's shape), one per-purchase window for the
    touch count/rank, one channel aggregate. Touch fan-out is bounded
    by the lookback window.
    """
    p = purchases.select(
        F.col(user_col).alias("__u"),
        F.col(purchase_ts).cast("long").alias("__pt"),
        F.col(cents_col).alias("__c"),
        F.col(purchase_id).alias("__pid"),
    )
    t = touches.select(
        F.col(user_col).alias("__u"),
        F.col(touch_ts).cast("long").alias("__tt"),
        F.col(channel_col).alias("channel"),
    )
    joined = p.join(t, on="__u").filter(
        (F.col("__tt") < F.col("__pt"))
        & (F.col("__tt") >= F.col("__pt") - window_seconds)
    )
    w = Window.partitionBy("__pid")
    w_rank = w.orderBy("__tt", "channel")
    ranked = joined.withColumn("__k", F.count("*").over(w)).withColumn(
        "__rn", F.row_number().over(w_rank)
    )
    micro = F.col("__c").cast("long") * 10000
    # exact integer floor-division: (micro - micro % k) is divisible by
    # k, so the double division is exact (quotient < 2^53) — no float
    # floor ties to worry about on any engine
    rem = micro % F.col("__k")
    base = ((micro - rem) / F.col("__k")).cast("long")
    credit = base + F.when(F.col("__rn") == 1, rem).otherwise(0)
    return (
        ranked.select("channel", credit.alias("__credit"))
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum(F.col("__credit").cast("decimal(38,0)"))
            .cast("long")
            .alias("attributed_microcents"),
        )
    )
