"""Process mining over event logs (charter §2B).

The events fixture is an append-only activity stream; process mining
reads it as CASES (entity journeys) and asks what actually happens:
which activity follows which (directly-follows graph), which complete
journeys recur (trace variants), and how well reality conforms to the
intended process (conformance fitness). The reference
(src/etl/ETLProcess.java:1-568) has no analytics surface; these are
the log-to-model operators every event-sourced warehouse ends up
needing.

Scale design shared by all three: ONE window per case (PARTITION BY
the case key, ORDER BY the caller's total-order columns — the
post-aggregate-window contract: cases are entity-grain, bounded), then
map-side-combinable groupBys. Nothing is trace-length-quadratic; the
only fan-in is the per-case collect in trace_variants, bounded by the
trace length (cap upstream with sessionized cases).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _case_key(case_cols: Sequence[str]):
    return [F.col(c) for c in case_cols]


def directly_follows_graph(
    df: DataFrame,
    case_cols: Sequence[str],
    order_cols: Sequence[str],
    act_col: str,
) -> DataFrame:
    """Directly-follows graph of an event log: for every activity
    pair (a -> b) that occurs ADJACENTLY inside a case, the edge
    frequency, the number of distinct cases exhibiting it, and the
    mean gap in seconds — the footprint every discovery algorithm
    (alpha miner, heuristic miner) starts from.

    Determinism: adjacency comes from one lag window over the
    caller's total order; gaps are exact integer seconds summed in
    decimal; mean_gap_s is the one double (exact ratio); callers
    ROUND (<= 6).
    """
    d38 = "decimal(38,0)"
    keys = _case_key(case_cols)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    ts_us = F.unix_micros(F.col(order_cols[0]).cast("timestamp"))
    seq = df.select(
        *keys,
        F.col(act_col).alias("act_to"),
        F.lag(F.col(act_col)).over(w).alias("act_from"),
        (ts_us - F.lag(ts_us).over(w)).cast("long").alias("gap_us"),
    ).filter(F.col("act_from").isNotNull())
    return (
        seq.groupBy("act_from", "act_to")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct(*keys).cast("long").alias("n_cases"),
            F.sum(F.col("gap_us").cast(d38)).cast(d38).alias("__gs"),
        )
        .select(
            "act_from",
            "act_to",
            "n_events",
            "n_cases",
            (
                F.col("__gs").cast("double")
                / F.col("n_events").cast("double")
                / F.lit(1000000.0)
            ).alias("mean_gap_s"),
        )
    )


def trace_variants(
    df: DataFrame,
    case_cols: Sequence[str],
    order_cols: Sequence[str],
    act_col: str,
    min_cases: int = 1,
) -> DataFrame:
    """Trace-variant census: each case's ordered activity sequence
    collapses to a '>'-joined variant string; emit each variant's
    case count and corpus share, keeping variants with at least
    ``min_cases`` cases (the output-volume knob — a long-tail log
    has nearly one variant per case; the head is what a process
    analyst reads).

    Determinism: the per-case sequence orders by the caller's total
    order inside ONE collect_list window (array_sort on a
    (order..., act) struct pins ties); shares are exact integer
    ratios; callers ROUND (<= 9).
    """
    if min_cases < 1:
        raise ValueError("min_cases must be >= 1")
    keys = _case_key(case_cols)
    ordered = df.groupBy(*keys).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            *[F.col(c) for c in order_cols],
                            F.col(act_col).alias("__a"),
                        )
                    )
                ),
                lambda s: s["__a"],
            ),
            ">",
        ).alias("variant"),
        F.count("*").cast("long").alias("trace_len"),
    )
    tot = ordered.agg(F.count("*").cast("long").alias("n_total"))
    agg = (
        ordered.groupBy("variant")
        .agg(
            F.count("*").cast("long").alias("n_cases"),
            F.max("trace_len").cast("long").alias("max_len"),
        )
        .filter(F.col("n_cases") >= min_cases)
        .crossJoin(F.broadcast(tot))
    )
    return agg.select(
        "variant",
        "n_cases",
        "max_len",
        (
            F.col("n_cases").cast("double") / F.col("n_total").cast("double")
        ).alias("case_share"),
    )


def conformance_fitness(
    df: DataFrame,
    case_cols: Sequence[str],
    order_cols: Sequence[str],
    act_col: str,
    expected_order: Sequence[str],
) -> DataFrame:
    """Order-conformance fitness against a linear reference process:
    ``expected_order`` ranks the modeled activities; every adjacent
    in-case transition between two MODELED activities counts forward
    (rank does not decrease) or backward (a rework/skip-back);
    transitions touching an unmodeled activity are ignored
    (documented). Emits the corpus fitness
    forward / (forward + backward) (exact integer ratio), the
    perfectly-forward case share, and the off-model event fraction —
    the one-row conformance scorecard.
    """
    if len(expected_order) < 2:
        raise ValueError("expected_order needs >= 2 activities")
    keys = _case_key(case_cols)
    rank_map = F.create_map(
        *[
            x
            for i, a in enumerate(expected_order)
            for x in (F.lit(a), F.lit(i))
        ]
    )
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    ranked = df.select(
        *keys,
        *[F.col(c) for c in order_cols],
        rank_map[F.col(act_col)].alias("r"),
    )
    seq = ranked.select(
        *keys,
        "r",
        F.lag("r").over(w).alias("rp"),
    )
    flags = seq.select(
        *keys,
        F.when(F.col("r").isNull(), 1).otherwise(0).alias("offmodel"),
        F.when(
            F.col("r").isNotNull() & F.col("rp").isNotNull(),
            F.when(F.col("r") >= F.col("rp"), 1).otherwise(0),
        ).alias("fwd"),
        F.when(
            F.col("r").isNotNull() & F.col("rp").isNotNull(),
            F.when(F.col("r") < F.col("rp"), 1).otherwise(0),
        ).alias("bwd"),
    )
    per_case = flags.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("offmodel").cast("long").alias("n_off"),
        F.sum(F.coalesce(F.col("fwd"), F.lit(0))).cast("long").alias("f"),
        F.sum(F.coalesce(F.col("bwd"), F.lit(0))).cast("long").alias("b"),
    )
    agg = per_case.agg(
        F.count("*").cast("long").alias("n_cases"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("n_off").cast("long").alias("n_off_model"),
        F.sum("f").cast("long").alias("n_forward"),
        F.sum("b").cast("long").alias("n_backward"),
        F.sum(F.when(F.col("b") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_perfect"),
    )
    tt = (F.col("n_forward") + F.col("n_backward")).cast("double")
    return agg.select(
        "n_cases",
        "n_events",
        "n_off_model",
        "n_forward",
        "n_backward",
        F.when(
            tt > 0, F.col("n_forward").cast("double") / tt
        ).alias("fitness"),
        (
            F.col("n_perfect").cast("double")
            / F.col("n_cases").cast("double")
        ).alias("perfect_case_share"),
        (
            F.col("n_off_model").cast("double")
            / F.col("n_events").cast("double")
        ).alias("off_model_share"),
    )


def sequential_pair_counts(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    tiebreak_col: str,
    type_col: str,
    types: list,
) -> DataFrame:
    """Gapped sequential-pattern counts: for every ordered type pair
    (ante, post), the number of event pairs where an ``ante`` event
    STRICTLY precedes a ``post`` event for the same entity — ANY gap
    allowed (the skip-gram upgrade of q188's adjacent-only Markov
    transitions and q597's directly-follows graph), plus the number
    of entities exhibiting the pattern at least once.

    Determinism: pure integer counting; the entity event order is
    (ts, tiebreak) — total, so same-timestamp events rank
    deterministically.

    Scale: ONE window pass per entity (all ``types`` running counts
    share the same window spec, so Spark evaluates them in a single
    WindowExec), then one per-entity aggregate and one k^2-column
    global fold melted to rows — never a per-entity self-join, never
    quadratic in events. Cost knob: len(types)^2 aggregate columns
    (pass the vocabulary you care about).
    """
    k_types = [str(t) for t in types]
    base = df.select(
        F.col(entity_col).alias("ent"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(tiebreak_col).alias("tb"),
        F.col(type_col).cast("string").alias("t"),
    ).filter(F.col("t").isin(k_types))
    w = (
        Window.partitionBy("ent")
        .orderBy("us", "tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for i, a in enumerate(k_types):
        base = base.withColumn(
            f"c{i}",
            F.coalesce(
                F.sum(F.when(F.col("t") == a, F.lit(1)).otherwise(F.lit(0)))
                .over(w),
                F.lit(0),
            ).cast("long"),
        )
    per_ent = base.groupBy("ent").agg(
        *[
            F.sum(
                F.when(F.col("t") == b, F.col(f"c{i}")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(f"p_{i}_{j}")
            for i, _a in enumerate(k_types)
            for j, b in enumerate(k_types)
        ]
    )
    glob = per_ent.agg(
        *(
            [
                F.sum(f"p_{i}_{j}").cast("long").alias(f"n_{i}_{j}")
                for i in range(len(k_types))
                for j in range(len(k_types))
            ]
            + [
                F.sum((F.col(f"p_{i}_{j}") > 0).cast("int"))
                .cast("long")
                .alias(f"e_{i}_{j}")
                for i in range(len(k_types))
                for j in range(len(k_types))
            ]
        )
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(a).alias("ante"),
                F.lit(b).alias("post"),
                F.col(f"n_{i}_{j}").alias("n_pairs"),
                F.col(f"e_{i}_{j}").alias("n_entities"),
            )
            for i, a in enumerate(k_types)
            for j, b in enumerate(k_types)
        ]
    )
    return (
        glob.select(F.explode(cells).alias("c"))
        .select("c.ante", "c.post", "c.n_pairs", "c.n_entities")
    )
