"""Reference-parity scalar transforms + column mapping.

Parity with ``/root/reference/src/etl/ETLProcess.java``:

- #6 projection / column-subset selection (``:92-125``): ``project``
  validates names against ``df.columns`` (the reference silently drops
  invalid names and errors when none remain, ``:120-122`` — we keep the
  error, but reject invalid names loudly; silent drops hide bugs at scale).
- #7 column mapping / rename (``:313-345``): unmapped source columns are
  DROPPED (``:183-190``); mapping to a nonexistent destination column is
  rejected (``:328-332``); every destination PK must be covered
  (``:336-342``).
- #8-#12 scalar transforms (``:528-567``): lower / upper / date-part /
  concat-literal with null passthrough (``:529-531``). The reference
  coerces ANY value to string for lower/upper/concat (``:534-541``) — we
  replicate the coercion with an explicit ``cast("string")``. The
  reference's ``"concat:"+v`` re-split-on-":" truncation bug (``:533,
  :541``) is NOT replicated: transforms here are structured tuples, not
  tagged strings (divergence documented per SURVEY.md §7).
- Date-part extraction (``:547-567``): month is 1-based (the reference
  adds +1 to java.util.Calendar's 0-based month at ``:559``; Spark's
  ``F.month`` is already 1-based). Non-date input passes through
  unchanged (``:548-550``): replicated via try_cast-like guard.

All transforms compile to Column expressions -> whole-stage codegen,
no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DATE_PARTS = {
    # Spanish part names are the reference's vocabulary (ETLProcess.java:553-563)
    "year": F.year,
    "month": F.month,  # already 1-based in Spark (reference +1 at :559)
    "day": F.dayofmonth,
    "hour": F.hour,
    "año": F.year,
    "mes": F.month,
    "día": F.dayofmonth,
    "dia": F.dayofmonth,
    "hora": F.hour,
}

_DATEY = (T.DateType, T.TimestampType, T.TimestampNTZType)


def project(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """Reference #6: column-subset selection with validation."""
    cols = [c.strip() for c in columns]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}; available: {df.columns}")
    if not cols:
        raise ValueError("no valid columns selected")  # parity with :120-122
    return df.select(*cols)


def rename_map(
    df: DataFrame,
    mapping: Mapping[str, str],
    dest_columns: Iterable[str] | None = None,
    dest_pks: Iterable[str] | None = None,
) -> DataFrame:
    """Reference #7: source->dest column map; unmapped source cols dropped.

    ``dest_columns``/``dest_pks`` reproduce the reference's sink-side
    validation: mapping to a nonexistent destination column is rejected
    (:328-332) and every destination PK must be the target of a mapping
    (:336-342).
    """
    for src in mapping:
        if src not in df.columns:
            raise ValueError(f"source column {src!r} not in {df.columns}")
    if dest_columns is not None:
        dest_set = set(dest_columns)
        bad = [d for d in mapping.values() if d not in dest_set]
        if bad:
            raise ValueError(f"destination columns do not exist: {bad}")
    if dest_pks is not None:
        uncovered = set(dest_pks) - set(mapping.values())
        if uncovered:
            raise ValueError(f"destination primary keys not mapped: {sorted(uncovered)}")
    return df.select([F.col(s).alias(d) for s, d in mapping.items()])


def transform_expr(col: Column | str, op: str, arg: str | None = None) -> Column:
    """Compile one (op, arg) transform to a Column expression.

    Null inputs pass through (Spark functions are null-propagating,
    matching ETLProcess.java:529-531). lower/upper/concat coerce any
    type via cast("string") (matching the reference's .toString()
    at :534-541).
    """
    c = F.col(col) if isinstance(col, str) else col
    if op in ("none", None):
        return c
    if op == "lower":
        return F.lower(c.cast("string"))
    if op == "upper":
        return F.upper(c.cast("string"))
    if op == "concat":
        # Reference concatenates a literal suffix (:540-541). Its null
        # passthrough (:529-531) means null input stays null, so guard:
        # F.concat propagates null already.
        return F.concat(c.cast("string"), F.lit("" if arg is None else str(arg)))
    if op == "date":
        part = (arg or "").lower()
        if part not in DATE_PARTS:
            return c  # unknown part passes through (:564-565)
        return DATE_PARTS[part](c)
    raise ValueError(f"unknown transform op: {op!r}")


def apply_transforms(
    df: DataFrame, specs: Iterable[tuple[str, str] | tuple[str, str, str]]
) -> DataFrame:
    """Apply (column, op[, arg]) transform specs in one projection.

    Replaces the reference's interactive per-column menu (:347-386) with a
    declarative list; all specs compile into a single select -> one
    codegen stage, no per-row Python.
    """
    spec_map: dict[str, Column] = {}
    for spec in specs:
        col, op, *rest = spec
        arg = rest[0] if rest else None
        if col not in df.columns:
            raise ValueError(f"transform on unknown column {col!r}")
        new = transform_expr(col, op, arg)
        if op == "date" and arg and (arg or "").lower() in DATE_PARTS:
            # Non-date passthrough (:548-550): if the column isn't a
            # date/timestamp, the reference returns it unchanged.
            dtype = df.schema[col].dataType
            if not isinstance(dtype, _DATEY):
                new = F.col(col)
        spec_map[col] = new.alias(col)
    return df.select(
        *[spec_map.get(c, F.col(c)) for c in df.columns]
    )


def assign_global_ids(
    df: DataFrame,
    order_cols: Iterable[str],
    bucket: Column,
    id_col: str = "seq_id",
) -> DataFrame:
    """Assign 1-based sequential ids in total (``order_cols``) order
    WITHOUT a single-partition global window — the scalable form of
    ``ROW_NUMBER() OVER (ORDER BY ...)`` / RDD ``zipWithIndex``.

    ``bucket`` must be a coarse, order-consistent prefix of the leading
    order column (every key in bucket b sorts before every key in
    bucket b+1 — e.g. ``F.floor(F.col("k") / 1000)`` for an integer
    key, ``F.date_trunc("month", ts)`` for a timestamp). Then:

    1. per-bucket row counts — one map-side-combinable aggregation
       whose result is metadata-sized (one row per bucket);
    2. cumulative offsets over the buckets — a window over that
       metadata-sized table (the ONLY global ordering ever performed,
       on #buckets rows, not #data rows);
    3. broadcast the offsets back and number rows with
       ``row_number() over (partition by bucket order by order_cols)``
       + offset — each bucket's window is partition-local.

    Deterministic and rerun-safe: unlike ``repartitionByRange`` (whose
    boundaries come from sampling) the bucket expression is a pure
    function of the row, so a stage retry or a second job over the
    same data reproduces identical ids. Bucket granularity is the skew
    knob: aim for ~10^5-10^6 rows per bucket at scale.

    Contract: order columns (and therefore the bucket) must be
    non-null — engines disagree on NULL sort placement (Spark NULLS
    FIRST vs DuckDB NULLS LAST), so a nullable order key would make
    the ids engine-dependent. Filter or coalesce first. The order must
    also be TOTAL (no ties): row_number over tied rows is
    partition-order dependent, so append a unique key as the last
    order column (every caller in queries.py does).
    """
    order = list(order_cols)
    b = df.withColumn("__bucket", bucket)
    counts = b.groupBy("__bucket").agg(F.count("*").alias("__n"))
    wb = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__n").over(wb), F.lit(0))
    ).drop("__n")
    w = Window.partitionBy("__bucket").orderBy(*order)
    return (
        b.join(F.broadcast(offsets), "__bucket")
        .withColumn(id_col, (F.col("__offset") + F.row_number().over(w)).cast("long"))
        .drop("__bucket", "__offset")
    )


def prorate_integer(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    total: int,
    id_col: str,
) -> DataFrame:
    """Largest-remainder (Hamilton) integer allocation: split an
    integer ``total`` across each group's rows proportionally to
    ``weight_col`` so the per-row allocations are INTEGERS that sum to
    EXACTLY ``total`` per group — the budget-spread / seat-apportion /
    cost-allocation transform where naive round(total * w/W) silently
    over- or under-allocates and reconciliation fails by pennies.

        base_i  = floor(total * w_i / W)
        rem_i   = (total * w_i) mod W
        deficit = total - SUM(base_i)  ( = SUM(rem_i) / W, an integer)

    the ``deficit`` rows with the largest remainders get +1, ties
    broken by ``id_col`` ascending — fully deterministic, pure 64-bit
    integer arithmetic, SQL-replayable. Overflow contract: total * w_i
    must fit int64 (guard your units; at warehouse scale allocate in
    cents-of-thousands, not atoms).

    A group whose weight sum W is 0 (or with NULL weights only)
    allocates 0 to every row — documented degenerate case, no division
    error. One window per group (rows-per-group-bounded, the
    cost-allocation contract: groups are orgs/regions, not events).

    Returns the input plus ``alloc`` (long).
    """
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    gw = Window.partitionBy(*group_cols)
    tot_w = F.sum(w).over(gw)
    prod = F.lit(total) * w
    # exact integer floor-div for any int64: (a - a%b) is an exact
    # multiple of b, and decimal/decimal division of exact multiples
    # has no rounding (a bare double division would drift past 2^53)
    exact_div = (
        (prod - prod % tot_w).cast("decimal(38,0)")
        / tot_w.cast("decimal(38,0)")
    ).cast("long")
    base = F.when(tot_w > 0, exact_div).otherwise(F.lit(0))
    rem = F.when(tot_w > 0, prod % tot_w).otherwise(F.lit(0))
    staged = df.withColumn("__base", base).withColumn("__rem", rem)
    deficit = F.lit(total) - F.sum("__base").over(gw)
    rk = F.row_number().over(
        Window.partitionBy(*group_cols).orderBy(
            F.col("__rem").desc(), F.col(id_col).asc()
        )
    )
    out = staged.withColumn("__deficit", deficit).withColumn("__rk", rk)
    # all-zero-weight group: deficit equals total but nothing to give —
    # keep alloc 0 (the documented degenerate case; NULL weights count 0)
    zero_grp = tot_w <= 0
    alloc = F.when(zero_grp, F.lit(0)).otherwise(
        F.col("__base")
        + F.when(F.col("__rk") <= F.col("__deficit"), F.lit(1)).otherwise(
            F.lit(0)
        )
    )
    return out.withColumn("alloc", alloc.cast("long")).drop(
        "__base", "__rem", "__deficit", "__rk"
    )


#: Modulus of the bijective pseudonym permutation (prime).
PSEUDONYM_P = 1_000_000_007


def pseudonymize_key(key, salt: int = 0) -> Column:
    """Format-preserving, referentially-consistent pseudonymization of
    a non-negative int64 key: a BIJECTIVE permutation of [0, p)
    (p = 1e9+7 prime; the multipliers are coprime with p), so distinct
    keys NEVER collide and every foreign-key join still lands — the
    GDPR-pipeline masking transform where a truncating hash would
    silently merge customers. Same arithmetic family as
    sampling.key_bucket, replayable in any SQL engine:

        pseudo = ((key + salt) % p) * 2654435761 % p * 524287 % p

    NOT cryptographic: it hides casual identity (ids no longer sort by
    signup order, no format leak), but an adversary with the formula
    inverts it — for hostile-party releases swap in keyed FPE; the
    relational plumbing (bijectivity, FK consistency) is what this
    operator contracts. Keys must already be < p (ids, surrogate
    keys); larger keys alias by the initial mod and lose bijectivity.
    """
    k = (F.col(key) if isinstance(key, str) else key).cast("long")
    return (
        ((k + F.lit(salt)) % PSEUDONYM_P)
        * F.lit(2654435761).cast("long")
        % PSEUDONYM_P
        * 524287
        % PSEUDONYM_P
    )


def pseudonymize_key_sql(key: str, salt: int = 0) -> str:
    """DuckDB twin of :func:`pseudonymize_key` (keep in lockstep)."""
    return (
        f"((({key} + {salt}) % 1000000007) * 2654435761 % 1000000007 "
        f"* 524287) % 1000000007"
    )


def nest_children(
    parent: DataFrame,
    children: DataFrame,
    key: str,
    child_cols: list[str],
    order_cols: list[str],
    nested_name: str = "items",
) -> DataFrame:
    """Assemble a parent-child pair into ONE nested row per parent —
    ``parent.* + array<struct<child_cols>>`` — the denormalized export
    shape document stores, feature stores, and JSONL training corpora
    want (a flat join exports N copies of every parent attribute and
    loses the grouping).

    The child array is sorted by ``order_cols`` (sort_array over a
    struct whose FIRST fields are the order columns — ALL of them,
    including ones not exported in ``child_cols``; sort-only fields
    are stripped after the sort, so the requested order always
    applies), making the assembly deterministic under any partitioning
    — an unordered collect_list is partition-order-dependent and would
    break replay/diff-based testing. Parents with no children get an
    empty array (left join), not a dropped row.

    One child shuffle on the key + one broadcast-eligible parent join.
    At export scale the array is bounded by the parent's fan-out (an
    order's lineitems), never by table size.
    """
    struct_cols = list(order_cols) + [
        c for c in child_cols if c not in order_cols
    ]
    sorted_arr = F.sort_array(F.collect_list(F.struct(*struct_cols)))
    keep = [c for c in struct_cols if c in child_cols]
    if keep != struct_cols:
        # strip sort-only fields, preserving the sorted order
        sorted_arr = F.transform(
            sorted_arr, lambda s: F.struct(*[s[c].alias(c) for c in keep])
        )
    assembled = children.groupBy(F.col(key)).agg(
        sorted_arr.alias(nested_name)
    )
    empty = F.array().cast(
        dict(assembled.dtypes)[nested_name]
    )
    return parent.join(assembled, key, "left").withColumn(
        nested_name, F.coalesce(F.col(nested_name), empty)
    )
