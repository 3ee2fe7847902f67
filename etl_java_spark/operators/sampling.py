"""Deterministic sampling, per-group caps, split assignment, and source
mixing for training-data curation.

Charter §2B extensions (no reference counterpart — RoberWaters/ETL-Java,
src/etl/ETLProcess.java:1-568, has no sampling surface). These are the
dataset-composition primitives of an LLM pipeline: cap over-represented
domains, carve reproducible train/val/test splits, and re-weight sources
to a target mixture.

Design rule shared with q80_deterministic_sample: NEVER seed-based
``df.sample``/``sampleBy`` — those draw per-partition, so the selection
changes whenever the partitioning does. Every selection here is a pure
arithmetic function of the row key (two multiplicative rounds mod a
prime; intermediates < 2^63 by construction), identical on any cluster
size and on any engine — which is also what makes it oracle-checkable.

Scale stance: caps are one window per group key (single shuffle, same
key as any downstream per-group work); split assignment and mixture
expansion are map-only (zero shuffle); mixture output size is
sum(weights x source sizes) rows by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def key_bucket(key, buckets: int = 10000) -> Column:
    """Deterministic pseudo-uniform bucket in [0, buckets) from a
    NON-NEGATIVE int key (ids, surrogate keys). Negative keys are
    REJECTED by contract rather than silently mis-bucketed: ``%`` in
    both Spark and DuckDB truncates toward zero, so a negative key
    would yield a negative bucket that compares below every split
    threshold. Callers with signed keys must pre-map them (e.g.
    ``abs()`` or an offset) on BOTH engines identically.

    The key is reduced mod p BEFORE the multiplicative round so every
    intermediate stays below 2^63 for ANY int64 key (p-1 ~ 1e9 times
    2654435761 ~ 2.7e18 < 2^63; found the hard way — the 10x scale-up's
    offset ids overflowed the unreduced form under ANSI mode).

    Same arithmetic as the SQL form
    ``((k % 1000000007) * 2654435761 % 1000000007 * 524287) % 1000000007
    % buckets`` so DuckDB reproduces the selection bit-for-bit.
    """
    k = (F.col(key) if isinstance(key, str) else key).cast("long")
    h = (
        (k % 1000000007) * F.lit(2654435761).cast("long")
    ) % 1000000007 * 524287 % 1000000007
    return h % buckets


def key_bucket_sql(key: str, buckets: int = 10000) -> str:
    """The DuckDB-side twin of :func:`key_bucket` (keep in lockstep)."""
    return (
        f"(({key} % 1000000007) * 2654435761 % 1000000007 * 524287) "
        f"% 1000000007 % {buckets}"
    )


def key_draw(key, m: int) -> Column:
    """Quadratic-mixed deterministic draw in [0, m) — key_bucket plus
    the (h^2 + h) mod p round that breaks its AFFINE stride: raw
    key_bucket maps consecutive keys to an arithmetic progression, so
    draws indexed by a counter (permutation flips, per-slot samples)
    come out correlated; the quadratic round decorrelates them while
    staying exact int64 (h < p ~ 1e9+7 so h^2 + h < 2^63) and
    SQL-replayable (the negative_samples discipline, factored out)."""
    h = key_bucket(key, 1_000_000_007)
    return (h * h + h) % 1_000_000_007 % m


def key_draw_sql(key: str, m: int) -> str:
    """The DuckDB-side twin of :func:`key_draw` (keep in lockstep)."""
    h = key_bucket_sql(key, 1_000_000_007)
    return f"((({h}) * (({h}) + 1)) % 1000000007 % {m})"


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by deterministic hash
    order (hash asc, key asc tiebreak) — the domain-cap step of corpus
    curation (bound any one domain's share regardless of its raw size).

    One shuffle (window on group_col). The hash order makes the survivors
    a uniform sample of the group rather than "first by storage order",
    and keeps the selection stable under repartitioning.
    """
    w = Window.partitionBy(group_col).orderBy(
        key_bucket(key_col).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def assign_split(
    df: DataFrame,
    key_col: str,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Add a reproducible ``split`` column (train/val/test) keyed on the
    row id — a pure map (zero shuffle), stable across engines, runs, and
    partitionings. test gets the remaining 1 - train - val mass.
    """
    b = key_bucket(key_col, 10000)
    # round(), not int(): 0.7 * 10000 is 6999.999... in binary floating
    # point and truncation would shift the boundary by one bucket vs the
    # oracle's decimal arithmetic
    t_hi = int(round(train * 10000))
    v_hi = t_hi + int(round(val * 10000))
    return df.withColumn(
        "split",
        F.when(b < t_hi, "train").when(b < v_hi, "val").otherwise("test"),
    )


def source_mixture(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_weight: float = 1.0,
) -> DataFrame:
    """Re-weight sources to a target mixture by row replication: weight
    2.5 -> every row twice plus a deterministic half of rows a third
    time; weight 0.25 -> a deterministic quarter of rows once.

    This is epoch-style data mixing (integer part = full epochs over the
    source, fractional part = a hash-selected subset) — the standard way
    to hit target mixture proportions for LLM training without a global
    shuffle. Replication is ``explode(sequence(...))``: map-only, output
    size = sum over sources of weight x rows, no shuffle, no skew (copies
    of a row stay in its input partition; a downstream global shuffle for
    training order is a separate, deliberate step).

    Emits the input columns plus ``copy_id`` (0-based replica index, so
    downstream dedup-aware consumers can distinguish replicas).
    """
    w_expr: Column = F.lit(float(default_weight))
    for src, w in weights.items():
        w_expr = F.when(F.col(source_col) == src, float(w)).otherwise(w_expr)
    whole = F.floor(w_expr).cast("int")
    # round to the nearest bucket before the int cast (same reason as
    # assign_split: 0.7 - floor -> 6999.999... must not truncate to 6999)
    frac_scaled = F.round((w_expr - F.floor(w_expr)) * 10000).cast("int")
    n_copies = whole + (key_bucket(key_col) < frac_scaled).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
) -> DataFrame:
    """Deterministic per-row Bernoulli sampling with a ROW-DEPENDENT
    inclusion probability (quality-weighted corpus downsampling: keep
    high-quality documents with probability ~1, boilerplate with
    probability ~0.1).

    ``weight`` is any Column in [0, 1] (clamped). A row survives iff
    ``key_bucket(key) < floor(weight * 10000)`` — the same arithmetic
    key hash as assign_split, so the draw is a pure map (zero shuffle),
    reproducible on any partitioning/cluster, and replayable by any SQL
    engine. Probabilities are quantized to 1e-4 by ``floor`` (floor,
    not round: exact and identical in every engine; a weight below
    1e-4 never selects). A NULL weight DROPS the row — made explicit
    because Spark's greatest/least silently IGNORE nulls, which would
    otherwise clamp an unknown weight to certainty 1.0.
    """
    clamped = F.greatest(F.lit(0.0), F.least(F.lit(1.0), weight))
    p = F.floor(
        F.when(weight.isNull(), F.lit(0.0)).otherwise(clamped) * 10000
    ).cast("int")
    return df.filter(key_bucket(key_col) < p)


def shuffle_positions(
    df: DataFrame,
    key_col: str,
    id_col: str = "shuffle_pos",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    1-based position in hash-of-key order — the "shuffle the corpus
    before training" step, made reproducible (same order on any
    cluster, any partitioning, any run) and scalable (positions come
    from transforms.assign_global_ids' bucketed two-phase numbering:
    no single-partition window, no driver-side sort).

    Order is (key_bucket(key, 1e6), key): the hash scatters runs of
    adjacent source rows apart, the key breaks hash ties totally.
    """
    from .transforms import assign_global_ids

    h = key_bucket(key_col, 1_000_000)
    out = df.withColumn("__h", h)
    out = assign_global_ids(
        out,
        ["__h", key_col],
        F.floor(F.col("__h") / 10000),
        id_col=id_col,
    )
    return out.drop("__h")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling (`sampleBy` without the RNG):
    keep a row iff its key hash-bucket falls under the stratum's
    fraction. Reproducible on any cluster/partitioning — the same
    (key, stratum) row is kept everywhere, so downstream joins against
    the sample are stable across runs and engines.

    A pure map (zero shuffle): the CASE over strata compiles into the
    scan's codegen stage. Fractions are scaled to 1/10000 granularity
    with round() (0.7 * 10000 is 6999.999... in binary; truncation
    would shift the boundary vs a decimal-arithmetic oracle).
    """
    b = key_bucket(key_col, 10000)
    thresh = F.lit(int(round(default_fraction * 10000)))
    expr = None
    for stratum, frac in sorted(fractions.items()):
        t = F.lit(int(round(frac * 10000)))
        expr = (
            F.when(F.col(strata_col) == stratum, t)
            if expr is None
            else expr.when(F.col(strata_col) == stratum, t)
        )
    thresh_col = expr.otherwise(thresh) if expr is not None else thresh
    return df.filter(b < thresh_col)


def mixture_weights_temperature(
    df: DataFrame, source_col: str, alpha_sqrt: bool = True
) -> DataFrame:
    """Temperature-scaled mixture weights per source: w_s ~ n_s^alpha
    with alpha = 0.5 (the multilingual/multi-source up-sampling rule —
    damping head sources, boosting tails). share_s = w_s / sum(w).

    Determinism: sqrt is IEEE correctly-rounded (bit-identical on every
    engine), but SUMMING the resulting doubles is order-sensitive — so
    each w_s is rounded to a DECIMAL(18,6) first, the total is an exact
    decimal sum, and the final share is a single double division.
    One count shuffle + a 1-row broadcast total.
    """
    per = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    w = F.round(F.sqrt(F.col("n_docs").cast("double")), 6).cast("decimal(18,6)")
    per = per.withColumn("w", w)
    tot = per.agg(F.sum("w").alias("__tot"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            F.col("w").cast("double").alias("weight"),
            (F.col("w").cast("double") / F.col("__tot").cast("double")).alias("share"),
        )
    )


def budget_select(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cost_col: str,
    quality_col: str,
    budget: int,
) -> DataFrame:
    """Budget-constrained greedy selection per group: walk each group's
    rows best-quality-first and keep rows while the RUNNING cost stays
    within ``budget`` — the token-budget sibling of ``cap_per_group``
    (which caps row COUNTS). This is how a training mixture actually
    fills its per-source quota: "the best documents from this source up
    to N tokens", not "the first k documents".

    Semantics: a row is kept iff the cumulative cost up to and
    INCLUDING it is <= budget — strict prefix-sum inclusion, so an
    oversized row ends its group's selection (everything ranked after
    it is out too). That is deliberately NOT first-fit bin packing
    (``packing.py`` owns that): the prefix contract is O(1) per row,
    deterministic, and exactly replayable by a SQL window oracle.
    Ordering is (quality DESC, key ASC) — stable under ties.

    Returns the kept rows plus (rank_in_group, cum_cost).

    Scale: one shuffle on the group key; the running sum is a window on
    the same partitioning. Costs are exact integers.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(quality_col).desc(), F.col(key_col).asc()
    )
    ranked = df.withColumn("rank_in_group", F.row_number().over(w)).withColumn(
        "cum_cost",
        F.sum(F.col(cost_col).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return ranked.filter(F.col("cum_cost") <= budget)


def interleave_order(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    n_buckets: int,
) -> DataFrame:
    """Deterministic curriculum interleave: assign every row a GLOBAL
    training position such that the ``n_buckets`` difficulty/quality
    buckets alternate round-robin (bucket 0's first row, bucket 1's
    first row, ..., bucket 0's second row, ...) — a shuffled-feeling
    curriculum without any RNG and without a global sort.

    position = rank_within_bucket * n_buckets + bucket. Within-bucket
    rank orders by the arithmetic key hash (uniform, reproducible),
    key tiebreak. Positions are unique when every bucket id is in
    [0, n_buckets); gaps appear where buckets differ in size — callers
    that need dense ids can rank once more downstream.

    Scale: ONE shuffle (window per bucket — at most ``n_buckets``
    partitions carry rank state); no global ordering pass is ever
    taken. The position column is a pure expression over
    (bucket, within-bucket rank).
    """
    w = Window.partitionBy(bucket_col).orderBy(
        key_bucket(key_col).asc(), F.col(key_col).asc()
    )
    rk = F.row_number().over(w) - 1
    return df.withColumn(
        "position",
        (rk.cast("long") * n_buckets + F.col(bucket_col).cast("long")),
    )


RING_SIZE = 1 << 31


def ring_nodes(n_shards: int, ring_points: int = 64) -> list[tuple[int, int]]:
    """Virtual-node positions for the consistent-hash ring: the same
    arithmetic hash over (shard, replica) — deterministic and
    engine-reproducible, so an oracle can inline the identical node
    table as a VALUES literal. Returns (position, shard) sorted."""
    rows = []
    for s in range(n_shards):
        for r in range(ring_points):
            h = (
                (s * 1_000_003 + r * 7_919 + 1) % 1_000_000_007
                * 2_654_435_761
            ) % 1_000_000_007 % RING_SIZE
            rows.append((h, s))
    rows.sort()
    return rows


def reshard_movement(
    df: DataFrame,
    key_col: str,
    shards_before: int,
    shards_after: int,
    ring_points: int = 64,
) -> DataFrame:
    """Consistent-hashing reshard audit: how many keys MOVE when the
    shard count changes? Modulo sharding (``hash % n``) moves almost
    everything on resize — (n-1)/n of keys — while a consistent hash
    ring moves only ~1/(n+1): the difference between a cache-warm
    rolling resize and a full re-replication storm.

    Both schemes are computed deterministically from the arithmetic
    key hash (no RNG): modulo is ``key_bucket % n``; the ring places
    ``ring_points`` virtual nodes per shard at hash-derived positions
    and assigns each key to the first node clockwise (implemented as a
    pure expression: the key's position is matched against the
    BROADCAST sorted node table with one array pass — the node table
    is metadata-sized, shards x ring_points).

    Returns one row per scheme: (scheme, n_keys, n_moved, moved_share).

    Scale: two map-only assignment passes over the keys + one
    aggregate; the ring is built driver-free from a range DataFrame
    and folded into an array literal via one broadcast row.
    """
    def assign_expr(key_pos, nodes):
        # first node at or after the key position (wrap to nodes[0])
        arr = F.array(*[F.lit(h) for h, _ in nodes])
        shards = F.array(*[F.lit(s) for _, s in nodes])
        idx = F.aggregate(
            F.zip_with(arr, F.sequence(F.lit(0), F.lit(len(nodes) - 1)),
                       lambda h, i: F.when(h >= key_pos, i).otherwise(F.lit(None))),
            F.lit(None).cast("int"),
            lambda acc, x: F.coalesce(acc, x),
        )
        return F.element_at(shards, F.coalesce(idx, F.lit(0)) + 1)

    pos = (
        key_bucket(F.col("__k"), 1_000_000_007) * 524_287
    ) % 1_000_000_007 % RING_SIZE
    keys = df.select(F.col(key_col).alias("__k")).distinct().withColumn(
        "__pos", pos
    )
    mod_moved = keys.select(
        (
            (key_bucket(F.col("__k")) % shards_before)
            != (key_bucket(F.col("__k")) % shards_after)
        ).alias("__mv")
    )
    ring_moved = keys.select(
        (
            assign_expr(F.col("__pos"), ring_nodes(shards_before, ring_points))
            != assign_expr(F.col("__pos"), ring_nodes(shards_after, ring_points))
        ).alias("__mv")
    )

    def summarize(moved, scheme):
        return moved.agg(
            F.lit(scheme).alias("scheme"),
            F.count("*").cast("long").alias("n_keys"),
            F.sum(F.when(F.col("__mv"), 1).otherwise(0))
            .cast("long")
            .alias("n_moved"),
        ).select(
            "scheme", "n_keys", "n_moved",
            (F.col("n_moved").cast("double") / F.col("n_keys").cast("double"))
            .alias("moved_share"),
        )

    return summarize(mod_moved, "modulo").unionByName(
        summarize(ring_moved, "consistent_ring")
    )


def negative_samples(
    interactions: DataFrame,
    items: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 5,
    oversample: int = 3,
    salt: int = 0,
) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training:
    for each user, ``k`` items they did NOT interact with, drawn
    pseudo-uniformly by the replayable arithmetic hash (key_bucket's
    family) — the (user, positive, negative) triple generator behind
    BPR / contrastive recommenders, with no RNG state to desync
    distributed retries.

    Shape: number the catalog 1..N with the two-phase gap-free index
    (transforms.assign_global_ids — per-bucket local windows, the only
    GLOBAL ordering is over the metadata-sized bucket table, so no
    whole-catalog single-partition window); explode ``oversample * k``
    candidate slots per user; map slot -> index by hashing (user,
    slot) mod N (gap-free, so EVERY draw lands — a raw key-range draw
    would miss almost always on a sparse id space); join the indexed
    catalog, ANTI-join the user's positives, keep the first ``k``
    survivors in slot order. All joins are key-hash shuffles; the
    per-user window orders <= oversample*k rows. Heavy users
    (positives > ~(1 - 1/oversample) of the catalog) may yield fewer
    than k negatives, reported as-is.

    Returns (user, item, slot) with slot the 1-based draw order.
    """
    from .transforms import assign_global_ids

    u = F.col(user_col).cast("long")
    users = interactions.select(u.alias("user")).distinct()
    slots = users.select(
        "user",
        F.explode(
            F.sequence(F.lit(1), F.lit(int(k * oversample)))
        ).alias("slot"),
    )
    ik = F.col(item_col).cast("long")
    # distinct first: a non-unique catalog would inflate the index
    # cardinality and skew draw uniformity toward duplicated items
    items_d = items.select(ik.alias("item")).distinct()
    idx = assign_global_ids(
        items_d,
        ["item"],
        F.floor(F.col("item") / F.lit(100000)),
        id_col="cand_idx",
    )
    # catalog cardinality as a broadcast 1-row aggregate (no eager
    # driver-side count job)
    n_tab = items_d.agg(F.count("*").cast("long").alias("__n_items"))
    # key_bucket alone is AFFINE mod p, so consecutive slots would map
    # to a fixed arithmetic stride of indexes (measured: one user's
    # draws all 5 apart) — a quadratic round breaks the stride while
    # staying exact int64 (h < p ~ 1e9+7, so h*h + h < 2^63) and
    # SQL-replayable.
    h = key_bucket(
        (F.col("user") * 1000003 + F.col("slot") + F.lit(salt)),
        1_000_000_007,
    )
    mixed = (h * h + h) % 1_000_000_007 % F.col("__n_items")
    cand = slots.crossJoin(F.broadcast(n_tab)).select(
        "user", "slot", (mixed + 1).alias("cand_idx")
    )
    pos = interactions.select(
        u.alias("user"), F.col(item_col).cast("long").alias("item")
    ).distinct()
    neg = (
        cand.join(idx, "cand_idx")
        .join(pos, ["user", "item"], "left_anti")
        # duplicate slot->item draws: keep the EARLIEST slot (a grouped
        # min, not dropDuplicates — whose survivor is partition-order-
        # dependent and would break replay determinism)
        .groupBy("user", "item")
        .agg(F.min("slot").alias("slot"))
    )
    w = Window.partitionBy("user").orderBy(F.col("slot").asc())
    return (
        neg.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("user", "item", F.col("slot").cast("long"))
    )


def rebalance_classes(
    df: DataFrame,
    label_col,
    id_col,
    salt: int = 0,
) -> DataFrame:
    """Deterministic class rebalancing by replication: every label is
    oversampled to EXACTLY the majority class's count — each row
    repeats floor(T/n_c) times and the ``T mod n_c`` extra slots go to
    the rows with the smallest (key_draw, id) — a hash order, so
    retries, engines, and partitionings pick the identical extras (no
    sample(), no RNG; the training-set equivalent of the gap-free
    two-phase id discipline).

    Shape: one per-label count (broadcast back), one explode by the
    per-row repeat factor (bounded by T/n_c — the imbalance ratio IS
    the blow-up, as in any oversampling), one per-label window for the
    extra-slot ranks. Returns the input columns plus ``__rep`` (1-based
    copy index per source row). Empty input returns empty.

    Rows with a NULL label are EXCLUDED (explicitly, up front): an
    unlabeled row belongs to no class, so it has no target count to
    replicate toward — filter or impute labels upstream if those rows
    must survive. (Without the explicit filter they would silently
    vanish in the per-label count join — same result, invisible
    contract.)
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    k = (F.col(id_col) if isinstance(id_col, str) else id_col).cast("long")
    base = df.filter(lab.isNotNull()).withColumn("__lab", lab).withColumn(
        "__k", k
    )
    counts = base.groupBy("__lab").agg(F.count("*").cast("long").alias("__n"))
    target = counts.agg(F.max("__n").alias("__t"))
    ranked = base.join(F.broadcast(counts), "__lab").crossJoin(
        F.broadcast(target)
    )
    w = Window.partitionBy("__lab").orderBy(
        key_draw(F.col("__k") + F.lit(salt), 1_000_000_007).asc(),
        F.col("__k").asc(),
    )
    ranked = ranked.withColumn("__rk", F.row_number().over(w))
    rep = (
        (F.col("__t") - F.col("__t") % F.col("__n")) / F.col("__n")
    ).cast("long") + (
        F.col("__rk") <= F.col("__t") % F.col("__n")
    ).cast("long")
    out_cols = [c for c in df.columns]
    return (
        ranked.withColumn("__reps", rep)
        .select(
            *out_cols,
            F.explode(F.sequence(F.lit(1), F.col("__reps"))).alias("__rep"),
        )
    )


def raking_weights(
    df: DataFrame,
    row_col: str,
    col_col: str,
    count_col: str,
    row_targets: DataFrame,
    col_targets: DataFrame,
    iterations: int = 5,
) -> DataFrame:
    """Iterative proportional fitting (survey raking): calibrate
    per-cell weights so the weighted (row, column) table matches BOTH
    sets of marginal targets — the standard post-stratification
    weighting when only the margins of the population are known
    (census nation totals x segment totals, never the joint).

        repeat T times:
          w *= row_target / current_row_sum   (all cells in the row)
          w *= col_target / current_col_sum   (all cells in the col)

    The cell table is an aggregate (post-aggregate contract:
    dimensions x dimensions), so each half-step is one bounded
    partitioned window + one broadcast target join; T is FIXED
    (budgeted-rounds contract — IPF converges geometrically, 5
    rounds is survey practice). Determinism: the per-row/col sums
    quantize each w*n term to decimal(38,12) before summing, so the
    margin sums are order-independent on both engines.

    ``row_targets`` = (row_col, target) and ``col_targets`` =
    (col_col, target). Returns the calibrated cell table:
    (row, col, n, weight, weighted_n).
    """
    t = int(iterations)
    if t < 1:
        raise ValueError("iterations must be >= 1")
    cells = (
        df.select(
            F.col(row_col).alias("r"),
            F.col(col_col).alias("c"),
            F.col(count_col).cast("long").alias("n"),
        )
        .groupBy("r", "c")
        .agg(F.sum("n").cast("long").alias("n"))
        .withColumn("w", F.lit(1.0))
    )
    rt = F.broadcast(
        row_targets.select(
            F.col(row_col).alias("r"),
            F.col(row_targets.columns[-1]).cast("double").alias("rt"),
        )
    )
    ct = F.broadcast(
        col_targets.select(
            F.col(col_col).alias("c"),
            F.col(col_targets.columns[-1]).cast("double").alias("ctg"),
        )
    )
    wr = Window.partitionBy("r")
    wc = Window.partitionBy("c")
    wn = lambda: (F.col("w") * F.col("n").cast("double")).cast(
        "decimal(38,12)"
    )
    for _ in range(t):
        cells = (
            cells.join(rt, "r")
            .withColumn(
                "w",
                F.col("w")
                * (
                    F.col("rt")
                    / F.sum(wn()).over(wr).cast("double")
                ),
            )
            .drop("rt")
        )
        cells = (
            cells.join(ct, "c")
            .withColumn(
                "w",
                F.col("w")
                * (
                    F.col("ctg")
                    / F.sum(wn()).over(wc).cast("double")
                ),
            )
            .drop("ctg")
        )
    return cells.select(
        F.col("r").alias(row_col),
        F.col("c").alias(col_col),
        "n",
        F.col("w").alias("weight"),
        (F.col("w") * F.col("n").cast("double")).alias("weighted_n"),
    )


def sinkhorn_plan(
    cost: DataFrame,
    row_col: str,
    col_col: str,
    cost_col: str,
    row_mass: DataFrame,
    col_mass: DataFrame,
    epsilon: float = 1.0,
    iterations: int = 5,
) -> DataFrame:
    """Entropy-regularized optimal transport (Sinkhorn-Knopp): given
    a bounded cost matrix and two mass vectors, compute the transport
    plan P = diag(u) K diag(v) with K = exp(-cost/eps) — the
    soft-assignment matcher behind distribution-shift correction and
    source-to-target mixture alignment (the exp-kernel sibling of
    :func:`raking_weights`: raking matches COUNTS, Sinkhorn matches
    mass at minimal transport cost).

    The scalings alternate FIXED rounds (budgeted-rounds contract):
        u = r / (K v)        v = c / (K^T u)
    Each half-step is one partitioned window sum over the
    dimensions x dimensions cell table (post-aggregate contract)
    with per-term decimal(38,12) quantization for order independence
    (kernel values are <= 1, far inside the quantization-safety
    bound). exp only — callers round per the log contract.

    ``row_mass`` = (row_col, mass), ``col_mass`` = (col_col, mass).
    Returns the plan: (row, col, cost, kernel, plan_mass).
    """
    t = int(iterations)
    if t < 1:
        raise ValueError("iterations must be >= 1")
    eps = float(epsilon)
    if eps <= 0:
        raise ValueError("epsilon must be positive")
    cells = cost.select(
        F.col(row_col).alias("r"),
        F.col(col_col).alias("c"),
        F.col(cost_col).cast("double").alias("cost"),
    ).withColumn("kern", F.exp(-F.col("cost") / F.lit(eps)))
    rm = F.broadcast(
        row_mass.select(
            F.col(row_col).alias("r"),
            F.col(row_mass.columns[-1]).cast("double").alias("rmass"),
        )
    )
    cm = F.broadcast(
        col_mass.select(
            F.col(col_col).alias("c"),
            F.col(col_mass.columns[-1]).cast("double").alias("cmass"),
        )
    )
    state = cells.join(rm, "r").join(cm, "c").select(
        "r", "c", "cost", "kern", "rmass", "cmass",
        F.lit(1.0).alias("u"), F.lit(1.0).alias("v"),
    )
    wr = Window.partitionBy("r")
    wc = Window.partitionBy("c")
    q = lambda e: e.cast("decimal(38,12)")
    for _ in range(t):
        kv = F.sum(q(F.col("kern") * F.col("v"))).over(wr).cast("double")
        state = state.withColumn("u", F.col("rmass") / kv)
        ku = F.sum(q(F.col("kern") * F.col("u"))).over(wc).cast("double")
        state = state.withColumn("v", F.col("cmass") / ku)
    return state.select(
        F.col("r").alias(row_col),
        F.col("c").alias(col_col),
        "cost",
        F.col("kern").alias("kernel"),
        (F.col("u") * F.col("kern") * F.col("v")).alias("plan_mass"),
    )


def kish_design_effect(
    df: DataFrame,
    group_col: str,
    weight_col: str,
) -> DataFrame:
    """Kish design effect of unequal weighting per group:
    deff = n * sum(w^2) / sum(w)^2, effective sample size
    ESS = sum(w)^2 / sum(w^2), and the relative weight-variance
    cv2 = deff - 1 — how much precision a weighted sample loses vs
    an equal-weight one (deff 1.5 means 1000 respondents carry the
    information of ~667). The readout every survey-weighted metric
    (raking q538, IPW) should report beside its estimate. Charter
    §2B extension.

    Determinism: integer weights sum exactly (sum(w) long,
    sum(w^2) decimal(38,0)); deff/ess are fixed double trees over
    the exact moments; callers ROUND (<= 9). Scale: ONE map-side-
    combinable grouped aggregate. Non-positive weights are dropped
    (weight domain).
    """
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(weight_col).cast("long").alias("w"),
    ).filter(F.col("w") > 0)
    agg = base.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("w").cast("long").alias("sw"),
        F.sum(F.col("w").cast(d38) * F.col("w")).cast(d38).alias("sw2"),
    )
    nd = F.col("n_rows").cast("double")
    swd = F.col("sw").cast("double")
    sw2d = F.col("sw2").cast("double")
    deff = nd * sw2d / (swd * swd)
    return agg.select(
        "grp",
        "n_rows",
        F.col("sw").alias("sum_w"),
        deff.alias("deff"),
        (swd * swd / sw2d).alias("ess"),
        (deff - F.lit(1.0)).alias("cv2"),
    )
