"""Count-min sketch over a key column — mergeable heavy-hitter counts.

Charter §2B extension (no reference counterpart — RoberWaters/ETL-Java,
src/etl/ETLProcess.java:1-568). Complements the HLL distinct-count
sketches (q135) with the FREQUENCY sketch of the mergeable-summary
family: a (depth x width) counter table whose cells are plain sums, so
per-partition/per-day sketches union by cell-wise addition and the raw
stream is never re-scanned — the correct 100 TB shape for "top items
this quarter" over append-only logs.

Estimates: est(k) = min over rows i of table[i][h_i(k)], an
OVERESTIMATE bounded by eps*N with probability 1-delta for
width = e/eps, depth = ln(1/delta).

Determinism: the row hashes are md5 prefixes of "<row>:<key>" reduced
mod width — fixed-seed, engine-independent arithmetic, so a SQL oracle
replays the whole sketch (build, merge, and estimates) bit-for-bit.
The md5-per-row cost is one JVM digest per (row, input row) — fine for
the sketch-build pass, which is otherwise one shuffle of
depth x width <= a few thousand cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cms_bucket(key: Column | str, row: int, width: int) -> Column:
    """Deterministic bucket of ``key`` for sketch row ``row``: the first
    48 bits of md5('<row>:<key>'), mod width. Keep in lockstep with
    :func:`cms_bucket_sql`. NULL keys all hash to one pseudo-key
    bucket (concat_ws skips nulls) — filter them out first if nulls
    should not be counted as a value."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(row)), k.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    return h % width


def cms_bucket_sql(key: str, row: int, width: int) -> str:
    """DuckDB twin of :func:`cms_bucket`."""
    return (
        f"CAST('0x' || SUBSTRING(md5('{row}:' || CAST({key} AS VARCHAR)), 1, 12) "
        f"AS BIGINT) % {width}"
    )


def cms_build(
    df: DataFrame, key_col: str, width: int = 256, depth: int = 3
) -> DataFrame:
    """Build the sketch: one explode (depth cells per input row) + one
    grouped count -> (row, bucket, cnt), at most depth x width rows.
    Map-side combine collapses the shuffle to the cell count."""
    from .dedup import _spread

    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), cms_bucket(key_col, i, width).alias("bucket")
            )
            for i in range(depth)
        ]
    )
    # _spread (r12): depth md5 digests per input row, all map-side
    # before the cell shuffle — spread few-split inputs across the
    # cluster (no-op at real scale where the stream has many splits);
    # project to the key first so the spread shuffle moves only it
    base = df.select(key_col) if isinstance(key_col, str) else df
    return (
        _spread(base)
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches by cell-wise addition (CMS linearity)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Point-estimate each key in ``keys``: join the (broadcastable)
    sketch ``depth`` times on the key's per-row buckets and take the
    min cell — adds column ``est``."""
    out = keys
    for i in range(depth):
        s = sketch.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"__b{i}"), F.col("cnt").alias(f"__c{i}")
        )
        # LEFT join: a key hashing into a never-touched cell means the
        # sketch saw zero occurrences — est 0, not a dropped row (dense
        # fixtures occupy every cell, but sparse/per-period sketches may
        # not)
        out = out.withColumn(f"__b{i}", cms_bucket(key_col, i, width)).join(
            F.broadcast(s), f"__b{i}", "left"
        )
    est = F.least(
        *[F.coalesce(F.col(f"__c{i}"), F.lit(0)) for i in range(depth)]
    )
    drop = [c for i in range(depth) for c in (f"__b{i}", f"__c{i}")]
    return out.withColumn("est", est).drop(*drop)


def cms_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join-size estimation from two sketches: the CMS inner product
    min over rows i of SUM_b a[i][b] * b[i][b] OVERESTIMATES
    SUM_k fa(k) * fb(k) — exactly the row count of an equi-join on k.
    Query planners use this to pick join order/strategy WITHOUT
    touching the raw tables: both sketches are depth x width cells,
    mergeable, and shippable to the driver. Returns one row (est)."""
    bb = b.select(
        F.col("row"), F.col("bucket"), F.col("cnt").alias("cnt_b")
    )
    return (
        a.join(bb, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("dot"))
        .agg(F.min("dot").alias("est"))
    )


# ---------------------------------------------------------------------------
# Mergeable digit-histogram quantile sketch


def digit_histogram(df: DataFrame, value_col: str) -> DataFrame:
    """Mergeable quantile sketch over POSITIVE integers: bucket by
    (decimal digit count, first digit) — log10-spaced buckets with 9
    sub-buckets per decade, ~100 cells for the full int64 range.

    The sketch IS a grouped count, so it is map-side combinable,
    re-aggregatable (merging two sketches = summing cells — see
    test_r5b), and engine-reproducible: the bucket key is pure string
    arithmetic (LENGTH / first char of the decimal rendering), no
    floating-point log anywhere. The price of exactness-free bucketing
    is resolution: a quantile is located to its (digits, first_digit)
    cell, i.e. within a factor of ~1.11-2x — the right tool for "which
    decade is p99 in" monitoring at 100 TB, not cent-exact accounting
    (q66 does exact percentiles when the full sort is affordable).

    The positive-integer contract is ENFORCED: values <= 0 raise at
    plan-execution time (ANSI-style) rather than silently producing
    degenerate cells (0 would land in bucket (1, 0); negatives would
    yield a NULL first_digit — both would skew digit_quantiles'
    cumulative order without any error). Callers with signed data must
    pre-map it (abs/offset) explicitly.
    """
    v = F.col(value_col)
    s = (
        F.when(v <= 0, F.raise_error(
            F.concat(
                F.lit(f"digit_histogram: {value_col} must be > 0, got "),
                v.cast("string"),
            )
        ).cast("string"))
        .otherwise(v.cast("string"))
    )
    return df.groupBy(
        F.length(s).alias("digits"),
        F.substring(s, 1, 1).cast("long").alias("first_digit"),
    ).agg(F.count("*").alias("n"))


def digit_quantiles(hist: DataFrame, qs: list[float]) -> DataFrame:
    """Locate quantiles in a digit-histogram sketch: for each q, the
    first bucket whose cumulative count reaches ceil(q * N). Returns
    (q, n_total, est_lo, est_hi) — the bucket's value bounds, exact
    integers built by string concatenation (first_digit followed by
    zeros), so both engines agree bit-for-bit.

    The histogram is ~100 rows, so the single-partition cumulative
    window and the tiny non-equi join cost nothing regardless of the
    data volume the sketch summarizes.
    """
    spark = hist.sparkSession
    w = Window.orderBy("digits", "first_digit").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hc = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "bkey", F.col("digits") * 10 + F.col("first_digit")
    )
    tot = hist.agg(F.sum("n").alias("n_total"))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    picked = (
        qdf.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(hc),
            F.col("cum") >= F.ceil(F.col("q") * F.col("n_total")),
        )
        .groupBy("q", "n_total")
        .agg(F.min("bkey").alias("bkey"))
    )
    # floor-div, NOT cast(x/10): double->int casts truncate in Spark but
    # round-half-even in DuckDB, and bkey ending in 5 sits exactly on .5
    digits = F.floor(F.col("bkey") / 10).cast("long")
    fd = F.col("bkey") % 10
    zeros = F.repeat(F.lit("0"), (digits - 1).cast("int"))
    return picked.select(
        "q",
        "n_total",
        F.concat(fd.cast("string"), zeros).cast("bigint").alias("est_lo"),
        F.concat((fd + 1).cast("string"), zeros).cast("bigint").alias("est_hi"),
    )


# ---------------------------------------------------------------------------
# Bloom filter: the membership sketch completing the mergeable-sketch
# triad (HLL = cardinality, CMS = frequency, Bloom = membership).
# Deterministic double hashing over the arithmetic key hash; bits pack
# into 32-bit words inside BIGINTs, so every operation is plain integer
# arithmetic any SQL engine replays exactly (no engine-private hash).

_BLOOM_P = 1_000_000_007


_BLOOM_KEY_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _require_int_key(df: DataFrame, key_col: str, fn: str) -> None:
    """NON-NEGATIVE-integer key contract (mirrors key_bucket's): a
    string or other non-numeric key would cast to NULL positions (or
    raise under ANSI) and silently corrupt the filter — reject loudly
    at plan-build time instead. Callers with string keys hash them
    first (e.g. xxhash64 + abs/offset on both engines identically)."""
    dt = dict(df.dtypes).get(key_col)
    if dt not in _BLOOM_KEY_TYPES:
        raise TypeError(
            f"{fn}: key column {key_col!r} must be an integer type "
            f"(got {dt}); hash/encode non-integer keys first"
        )


def _bloom_pos(key: Column, i: int, m_bits: int) -> Column:
    k = key.cast("long")
    h1 = ((k % _BLOOM_P) * 2_654_435_761) % _BLOOM_P
    h2 = ((k % _BLOOM_P) * 524_287 + 11) % _BLOOM_P
    return (h1 + F.lit(i) * h2) % _BLOOM_P % m_bits


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 2,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a (word_idx, word)
    relation: each key sets ``k_hashes`` bit positions; bits OR into
    32-bit words (kept low in a BIGINT so shifts never touch the sign
    bit on any engine). Mergeable by construction — union two filters'
    word tables and bit_or again.

    Scale: explode x k_hashes on the key column only, then ONE
    aggregate onto at most m_bits/32 words — the filter is
    metadata-sized regardless of input rows.

    Key contract: NON-NEGATIVE integer keys (enforced at plan-build
    time for the type half; negatives, as in key_bucket, must be
    pre-mapped by the caller on both engines identically).
    """
    _require_int_key(df, key_col, "bloom_build")
    keys = df.select(F.col(key_col).alias("__k"))
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("__k"), i, m_bits)
                      for i in range(k_hashes)])
        ).alias("__pos")
    )
    return (
        pos.select(
            (F.col("__pos") / 32).cast("long").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 32 AS INT))"
            ).alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("word"))
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 2,
) -> DataFrame:
    """Probe a ``bloom_build`` filter: a key is a (possible) member iff
    ALL its bit positions are set. Adds ``bloom_member`` to the probe
    rows. The word table broadcasts (metadata-sized); the probe side
    never shuffles. Same NON-NEGATIVE-integer key contract as
    :func:`bloom_build` (enforced for type, documented for sign).
    """
    _require_int_key(probes, key_col, "bloom_probe")
    out = probes
    for i in range(k_hashes):
        p = _bloom_pos(F.col(key_col), i, m_bits)
        w = bloom.select(
            F.col("word_idx").alias(f"__wi{i}"),
            F.col("word").alias(f"__w{i}"),
        )
        out = (
            out.withColumn(f"__p{i}", p)
            .withColumn(f"__wi{i}", (F.col(f"__p{i}") / 32).cast("long"))
            .withColumn(
                f"__b{i}",
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 32 AS INT))"
                ),
            )
            .join(F.broadcast(w), on=f"__wi{i}", how="left")
        )
    member = None
    for i in range(k_hashes):
        hit = F.col(f"__w{i}").isNotNull() & (
            F.col(f"__w{i}").bitwiseAND(F.col(f"__b{i}")) != 0
        )
        member = hit if member is None else (member & hit)
    drop = [
        c
        for i in range(k_hashes)
        for c in (f"__p{i}", f"__wi{i}", f"__w{i}", f"__b{i}")
    ]
    out = out.withColumn("bloom_member", member)
    return out.drop(*drop)


def misra_gries_summary(
    df: DataFrame,
    key_col: str,
    k: int = 16,
) -> DataFrame:
    """Misra-Gries heavy-hitter summary — the third mergeable frequency
    sketch alongside CMS (over-estimates, random) and Bloom
    (membership): k counters per partition, DETERMINISTIC one-sided
    bounds with no hash functions at all:

        est(key) <= true(key) <= est(key) + n/(k+1)

    so any key with true frequency > n/(k+1) is GUARANTEED present in
    the summary — the contract a "top sellers" / hot-key / skew-probe
    readout can be audited against, which a sampled top-k cannot.

    Distributed shape: each partition runs the batched MG reduction in
    bounded memory (a k-entry dict inside an Arrow-batched mapInPandas
    generator — state carries across batches within the partition),
    emitting <= k (key, est) rows; the global summary is one metadata-
    sized SUM per key (<= k * n_partitions rows). Summing per-partition
    underestimates keeps est <= true, and the per-partition decrements
    total <= n_p/(k+1), so the global error bound is the sum = n/(k+1).
    Per-partition estimates depend on the partitioning — only the
    BOUNDS are deterministic, which is what callers must consume (the
    q60/q135 sketch-family oracle pattern).

    NULL keys are EXCLUDED up front (filtered Spark-side, so ``n`` in
    the bound is the non-null row count and the guarantee holds over
    non-null keys exactly) — callers tracking a NULL-heavy column
    coalesce to a sentinel first. The pre-filter also keeps Arrow
    batches null-free, so pandas preserves int64 keys instead of
    widening to float64 (which would corrupt keys above 2^53).

    Returns (key, est) — the merged summary, NOT truncated to k, so
    the caller applies its own threshold against the bound.
    """
    import pandas as pd

    df = df.filter(F.col(key_col).isNotNull())
    key_t = dict(df.dtypes)[key_col]

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                # subtract the (k+1)-th largest from everyone, drop <= 0
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: v - sub for key, v in counters.items() if v > sub
                }
        yield pd.DataFrame(
            {key_col: list(counters.keys()), "est": list(counters.values())}
        )

    per_part = df.select(key_col).mapInPandas(
        mg, schema=f"{key_col} {key_t}, est long"
    )
    return per_part.groupBy(key_col).agg(
        F.sum("est").cast("long").alias("est")
    )


def ams_f2(
    df: DataFrame,
    key_col: str,
    n_estimators: int = 16,
    seed_base: int = 100,
) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) tug-of-war sketch of the second
    frequency moment F2 = SUM_k c_k^2 — the join-size / self-join-size
    estimator the CMS family can't give (CMS answers point queries;
    F2 is the whole-distribution skew number that predicts shuffle-join
    blow-up, cf. q182's join-size estimate from exact counts):

        Z_r = SUM_k s_r(k) * c_k   with s_r(k) in {-1, +1}
        F2_hat = mean_r(Z_r^2)     (unbiased; var drops as 1/R)

    Signs come from :func:`cms_bucket` (md5, width 2) so both engines
    draw the IDENTICAL pseudo-random signs — the estimate itself is
    oracle-checkable, not just the exact value. In production the R
    sign-sums stream in one pass over raw rows (no count table); here
    they fold over the grouped counts so the exact F2 shares the scan.

    Scale: one grouped count (map-side combinable), an R-way explode
    over the COUNT table, and an R-row aggregate. Everything is exact
    integers until the final mean/relative-error ratios.

    Returns one row: (n_keys, f2_exact, f2_est, rel_err).
    """
    if n_estimators < 1:
        raise ValueError("n_estimators must be >= 1")
    d38 = "decimal(38,0)"
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count("*").cast("long").alias("c")
    )
    exact = counts.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum((F.col("c").cast(d38) * F.col("c")).cast(d38))
        .cast(d38)
        .alias("f2x"),
    )
    rs = F.array(*[F.lit(int(seed_base) + r) for r in range(n_estimators)])
    signed = counts.withColumn("r", F.explode(rs)).select(
        "r",
        (
            (F.lit(1) - F.lit(2) * _ams_sign_bucket(F.col("k"), F.col("r")))
            * F.col("c")
        )
        .cast("long")
        .alias("sc"),
    )
    z = signed.groupBy("r").agg(F.sum("sc").cast("long").alias("z"))
    est = z.agg(
        F.sum((F.col("z").cast(d38) * F.col("z")).cast(d38))
        .cast(d38)
        .alias("zz")
    )
    one = exact.crossJoin(est)
    f2d = F.col("f2x").cast("double")
    estd = F.col("zz").cast("double") / F.lit(float(n_estimators))
    return one.select(
        "n_keys",
        F.col("f2x").cast("long").alias("f2_exact"),
        estd.alias("f2_est"),
        ((estd - f2d) / f2d).alias("rel_err"),
    )


def _ams_sign_bucket(key: Column, row: Column) -> Column:
    """cms_bucket with a COLUMN row id (the explode-side variant):
    first 48 bits of md5('<row>:<key>') mod 2. Keep in lockstep with
    cms_bucket / cms_bucket_sql."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", row.cast("string"), key.cast("string"))
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    return h % 2
