"""Sinks with the reference's load semantics, Spark-first.

Reference parity (``/root/reference/src/etl/ETLProcess.java``):

- #13/#15 upsert-by-PK (``:388-427`` live UPDATE-then-INSERT; ``:429-526``
  dead MERGE builders confirm MERGE semantics were intended)
  -> ``merge_by_pk``: dataframe-level MERGE. When delta-spark is
  detected on the classpath the call routes through a native Delta
  ``MERGE INTO``; otherwise (this container ships no Delta jar) the
  same semantics run as join + union + atomic rewrite (left-anti
  existing vs updates ∪ new) — the standard emulation (pyspark_guide
  "CDC / SCD2"). The physical plan is one shuffle on the PK, broadcast
  when the update side is small.
- #14 insert-if-absent on ALL columns (``:444-466``)
  -> ``insert_if_absent``: left-anti join on every column + append. The
  incoming batch is deduplicated first — the reference's behavior was
  order-dependent within a run (SURVEY.md §7 hard-part b); we define it
  deterministically.
- #16 batched transactional load (``:208-282``, MAX_BATCH_SIZE=1000 at
  ``:210``) -> JDBC writer ``batchsize`` option honors the same default;
  atomicity comes from Spark's all-or-nothing job commit protocol rather
  than manual commit/rollback.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REFERENCE_BATCH_SIZE = 1000  # ETLProcess.java:210


def _read_state_or_cold_start(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame | None:
    """Read a writer's persisted state table; ``None`` ONLY on a true
    cold start (PATH_NOT_FOUND error class). Any other read failure —
    transient IO, permissions, corruption — re-raises: the caller is
    about to ``mode("overwrite")`` the path, and misreading such an
    error as cold start would silently destroy all prior state
    (tombstones, merged history). Mirrors ``read_incremental``'s
    bookmark discipline (sources/readers.py), comparing the error
    CLASS, not message text."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.format(fmt).load(path)
    except AnalysisException as ex:
        getter = getattr(ex, "getCondition", None) or getattr(
            ex, "getErrorClass", None
        )
        if (getter() if getter else None) != "PATH_NOT_FOUND":
            raise
        return None


def append(df: DataFrame, path: str, fmt: str = "parquet", partition_by: Sequence[str] | None = None) -> None:
    w = df.write.mode("append").format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def overwrite(df: DataFrame, path: str, fmt: str = "parquet", partition_by: Sequence[str] | None = None) -> None:
    w = df.write.mode("overwrite").format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def merge_dataframes(
    existing: DataFrame, updates: DataFrame, pks: Sequence[str]
) -> DataFrame:
    """MERGE semantics as a pure DataFrame op (reference #13/#15).

    WHEN MATCHED -> take the update row; WHEN NOT MATCHED -> insert.
    Updates are deduplicated per PK first (last-wins is undefined in the
    reference's row loop; we take an arbitrary-but-deterministic row via
    dropDuplicates) so the anti-join is well-defined.

    Scale: one shuffle on the PK columns for the anti-join; when
    ``updates`` is small relative to ``existing`` Spark broadcasts it
    (AQE decides). No collect, no per-row work.
    """
    pks = list(pks)
    updates = updates.dropDuplicates(pks)
    kept = existing.join(updates.select(*pks), on=pks, how="left_anti")
    return kept.unionByName(updates.select(*existing.columns))


#: Above this many touched partitions the pruned MERGE falls back to a
#: full rewrite: the IN-filter expression and the per-partition file
#: churn stop paying for themselves once most of the table is touched.
MAX_PRUNED_PARTITIONS = 10_000


def _touched_partition_filter(updates: DataFrame, partition_by: Sequence[str]):
    """(filter Column, n_partitions) selecting the partitions present in
    ``updates``. Returns (None, n) past MAX_PRUNED_PARTITIONS.

    The distinct partition tuples are collected driver-side — bounded by
    the update batch's partition spread, the same contract as Delta's
    ``replaceWhere``; this is metadata-sized, not data-sized.
    """
    vals = updates.select(*partition_by).distinct().limit(MAX_PRUNED_PARTITIONS + 1).collect()
    if len(vals) > MAX_PRUNED_PARTITIONS:
        return None, len(vals)
    cond = None
    for row in vals:
        term = None
        for c in partition_by:
            v = row[c]
            t = F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
            term = t if term is None else term & t
        cond = term if cond is None else cond | term
    return cond, len(vals)


def _delta_merge_target(spark: SparkSession, path: str, fmt: str):
    """DeltaTable handle for ``path`` when the native MERGE backend is
    usable, else None (→ caller falls back to the parquet emulation).

    Usable means: delta-spark is importable AND its SQL extensions are
    live on this session's classpath AND (``path`` already holds a Delta
    table, or the caller asked for ``fmt="delta"``). Detection only —
    never forces a format change on an existing parquet table.
    """
    if fmt not in ("delta", "parquet"):
        return None
    try:
        from delta.tables import DeltaTable
    except ImportError:
        if fmt == "delta":
            raise RuntimeError(
                "merge_by_pk(fmt='delta') requires the delta-spark package "
                "and Delta jars on the classpath (configure the session via "
                "delta.configure_spark_with_delta_pip); falling back to "
                "parquet would silently change the table format"
            )
        return None
    try:
        if DeltaTable.isDeltaTable(spark, path):
            return DeltaTable.forPath(spark, path)
    except Exception:
        # jar mismatch / extensions not configured — the import alone
        # doesn't prove the JVM side works
        if fmt == "delta":
            raise
        return None
    if fmt == "delta":
        return "create"  # caller creates the table with the first batch
    return None


def merge_by_pk(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    pks: Sequence[str],
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Upsert ``updates`` into the table stored at ``path`` keyed on pks.

    Emulated Delta MERGE. With ``partition_by`` (a hive-partitioned sink
    table), the merge is PARTITION-PRUNED: only partitions containing
    updated rows are read (static literal pruning at the parquet scan)
    and only those are rewritten (dynamic partition overwrite) — cost is
    O(touched partitions), not O(table), which is the difference between
    a usable and an unusable upsert at 100 TB. Untouched partitions'
    files are not rewritten (byte-identical; see test_sinks).

    Constraint (shared with every partition-pruned MERGE, incl. Delta's
    replaceWhere): an update must not move a PK across partitions — the
    stale row in the old partition would survive. Partition columns
    should be PK-derived or immutable per PK.

    Without ``partition_by`` this is a full read-modify-atomic-rewrite.
    When delta-spark is on the classpath (detected, never assumed) and
    the target is — or is asked to be (``fmt="delta"``) — a Delta table,
    the same call routes through a native ``MERGE INTO`` instead:
    file-level conflict detection, no manual localCheckpoint, and
    Delta's own data-skipping replaces the literal partition filter.
    The API is stable either way; SURVEY §1.2's "Delta preferred"
    mapping is closed by this backend selection.
    """
    pks = list(pks)
    _check_idents(*pks)
    dt = _delta_merge_target(spark, path, fmt)
    if dt == "create":
        w = updates.dropDuplicates(pks).write.format("delta").mode("overwrite")
        if partition_by:
            w = w.partitionBy(*list(partition_by))
        w.save(path)
        return
    if dt is not None:
        # null-safe PK equality mirrors merge_dataframes' join-on-pks
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in pks)
        (
            dt.alias("t")
            .merge(updates.dropDuplicates(pks).alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    existing = _read_state_or_cold_start(spark, path, fmt)
    if existing is None:
        w = updates.dropDuplicates(pks).write.format(fmt).mode("overwrite")
        if partition_by:
            w = w.partitionBy(*list(partition_by))
        w.save(path)
        return

    if partition_by:
        cond, _n = _touched_partition_filter(updates, partition_by)
        if cond is not None:
            merged = merge_dataframes(existing.filter(cond), updates, pks)
            merged_local = merged.localCheckpoint(eager=True)
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                merged_local.write.format(fmt).mode("overwrite").partitionBy(
                    *list(partition_by)
                ).save(path)
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            spark.catalog.refreshByPath(path)
            return
        # fall through: touched-partition list too large to prune

    merged = merge_dataframes(existing, updates, pks)
    # Materialize before overwriting the files we are reading from.
    merged_local = merged.localCheckpoint(eager=True)
    w = merged_local.write.format(fmt).mode("overwrite")
    if partition_by:
        w = w.partitionBy(*list(partition_by))
    w.save(path)
    # Drop stale file listings from the shared FileStatusCache so later
    # reads of this path don't reference the overwritten part files.
    spark.catalog.refreshByPath(path)


def insert_if_absent_dataframes(existing: DataFrame, new: DataFrame) -> DataFrame:
    """Rows of ``new`` not already present in ``existing`` (all-column key).

    Reference #14 (ETLProcess.java:444-466): IF NOT EXISTS(all mapped
    cols) INSERT. Incoming batch deduped first for determinism.
    """
    cols = existing.columns
    return (
        new.select(*cols)
        .dropDuplicates()
        .join(existing, on=cols, how="left_anti")
    )


def insert_if_absent(
    spark: SparkSession, new: DataFrame, path: str, fmt: str = "parquet"
) -> None:
    existing = _read_state_or_cold_start(spark, path, fmt)
    if existing is None:
        new.dropDuplicates().write.format(fmt).mode("overwrite").save(path)
        return
    to_add = insert_if_absent_dataframes(existing, new).localCheckpoint(eager=True)
    to_add.write.format(fmt).mode("append").save(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = REFERENCE_BATCH_SIZE,
    **options,
) -> None:
    """JDBC sink; batchsize default honors the reference's 1000 (:210).

    For upsert against a JDBC destination the scalable pattern is
    stage-to-temp-table + server-side MERGE (SURVEY.md §2A row 13); this
    function is the staging write.
    """
    w = df.write.format("jdbc").option("url", url).option("dbtable", table).option(
        "batchsize", str(batchsize)
    )
    for k, v in options.items():
        w = w.option(k, v)
    w.mode(mode).save()


_IDENT = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_idents(*names: str) -> None:
    """The reference string-concatenates identifiers into SQL (SQL-
    injectable by design, ETLProcess.java:124, :388-427). We synthesize
    SQL only for the server-side MERGE and validate every identifier."""
    for n in names:
        if not _IDENT.match(n):
            raise ValueError(f"invalid SQL identifier: {n!r}")


def jdbc_upsert(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    pks: Sequence[str],
    driver: str | None = None,
    batchsize: int = REFERENCE_BATCH_SIZE,
    staging_table: str | None = None,
    user: str | None = None,
    password: str | None = None,
    staging_column_types: str | None = None,
) -> None:
    """Reference #13 against a real JDBC destination: stage + server-side
    MERGE (SURVEY.md §2A row 13's scalable pattern).

    The reference upserts row-by-row with UPDATE-then-INSERT
    (ETLProcess.java:388-427); per-row round trips do not scale. Here
    the frame lands in a staging table via the batched JDBC writer
    (batchsize honors the reference's 1000), then ONE server-side
    ``MERGE INTO`` applies it atomically — the database's optimizer does
    the matching.

    ``staging_column_types`` is passed to the staging write as
    ``createTableColumnTypes``. Needed on Derby: its dialect maps
    StringType to CLOB, and Derby's MERGE hits XSDA8/UTFDataFormat
    corruption reading multi-page CLOB staging columns (observed at
    ~25 rows) — declare string columns as ``"col VARCHAR(n)"`` instead.
    """
    pks = list(pks)
    if not pks:
        raise ValueError("jdbc_upsert requires at least one primary key")
    stage = staging_table or f"{table}_stage"
    cols = df.columns
    _check_idents(table, stage, *cols, *pks)
    missing = [k for k in pks if k not in cols]
    if missing:
        raise ValueError(f"primary keys not in frame: {missing}")  # :336-342 parity

    df = df.dropDuplicates(pks)
    creds = {}
    if user is not None:
        creds["user"] = user
    if password is not None:
        creds["password"] = password
    write_jdbc(df, url, stage, mode="overwrite", batchsize=batchsize,
               **({"driver": driver} if driver else {}),
               **({"createTableColumnTypes": staging_column_types}
                  if staging_column_types else {}),
               **creds)

    # Spark's JDBC writer creates the staging table with QUOTED (case-
    # sensitive) column names; the destination keeps its owner's naming,
    # so staging references are quoted and destination references are not.
    on = " AND ".join(f't.{k} = s."{k}"' for k in pks)
    non_pk = [c for c in cols if c not in pks]
    set_clause = ", ".join(f't.{c} = s."{c}"' for c in non_pk)
    insert_cols = ", ".join(cols)
    insert_vals = ", ".join(f's."{c}"' for c in cols)
    matched = f"WHEN MATCHED THEN UPDATE SET {set_clause} " if non_pk else ""
    sql = (
        f"MERGE INTO {table} t USING {stage} s ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )
    conn = _jdbc_connect(spark, url, user, password, driver)
    try:
        stmt = conn.createStatement()
        stmt.executeUpdate(sql)
        stmt.close()
    finally:
        conn.close()


def _jdbc_connect(spark, url, user=None, password=None, driver=None):
    """DriverManager connection honoring the same credentials/driver the
    staging write used — the reference registers the driver class and
    passes user/password explicitly (ETLProcess.java:66-75)."""
    if driver:
        spark._jvm.java.lang.Class.forName(driver)
    dm = spark._jvm.java.sql.DriverManager
    if user is not None:
        return dm.getConnection(url, user, password or "")
    return dm.getConnection(url)


def jdbc_execute(
    spark: SparkSession,
    url: str,
    sql: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
) -> None:
    """Run one DDL/DML statement on a JDBC destination (tests/setup)."""
    conn = _jdbc_connect(spark, url, user, password, driver)
    try:
        stmt = conn.createStatement()
        stmt.execute(sql)
        stmt.close()
    finally:
        conn.close()


def checked_columns(existing_cols: Iterable[str], incoming: DataFrame) -> None:
    missing = [c for c in existing_cols if c not in incoming.columns]
    if missing:
        raise ValueError(f"incoming frame missing destination columns: {missing}")


def apply_cdc_dataframes(
    state: DataFrame | None,
    changes: DataFrame,
    pks: Sequence[str],
    op_col: str = "op",
    seq_col: str = "seq",
    deleted_col: str = "__deleted",
) -> DataFrame:
    """Merge a CDC change batch (I/U/D ops) into a state table with
    SEQUENCE-CONDITIONED last-writer-wins and SOFT-DELETE tombstones —
    the Debezium-style apply step that a plain upsert (merge_by_pk)
    gets wrong twice over: a delete must remove the row, and an
    out-of-order change (older ``seq`` arriving in a later batch) must
    NOT regress the stored row or resurrect a deleted key.

    Batch reduction first: the latest change per PK within ``changes``
    (max_by over ``seq_col`` — ids, log offsets, commit timestamps).
    Then a full-outer reconcile against ``state``: the side with the
    HIGHER seq wins (incoming wins ties, making a retried batch
    idempotent); a winning op of 'D'/'d'/'delete' marks the tombstone
    flag rather than dropping the row, so the tombstone keeps absorbing
    late stale updates. Readers filter ``NOT __deleted`` (see
    read_cdc_state); tombstone GC past the late-data horizon is a
    retention sweep, not this operator's job.

    ``state`` None/empty means cold start. State schema = changes minus
    ``op_col`` plus the boolean tombstone column. One key-hash shuffle
    per batch; batching-order-robust by the seq condition (property-
    tested under shuffled splits in tests/test_r7b_streaming.py).
    """
    pks = list(pks)
    data_cols = [
        c for c in changes.columns if c != op_col and c not in pks
    ]
    is_del = F.upper(F.col(op_col)).isin("D", "DELETE")
    latest = (
        changes.groupBy(*pks)
        .agg(
            F.max_by(
                F.struct(*data_cols, is_del.alias(deleted_col)),
                F.col(seq_col),
            ).alias("__s")
        )
        .select(*pks, "__s.*")
    )
    if state is None:
        return latest
    new_side = F.struct(*data_cols, F.col(deleted_col))
    incoming = latest.select(
        *pks, new_side.alias("__new")
    )
    stored = state.select(
        *[F.col(k).alias(f"__k_{k}") for k in pks],
        F.struct(*data_cols, F.col(deleted_col)).alias("__old"),
    )
    cond = None
    for k in pks:
        t = F.col(k).eqNullSafe(F.col(f"__k_{k}"))
        cond = t if cond is None else cond & t
    joined = incoming.join(stored, cond, "full_outer")
    winner = (
        F.when(F.col("__new").isNull(), F.col("__old"))
        .when(F.col("__old").isNull(), F.col("__new"))
        .when(
            F.col(f"__new.{seq_col}") >= F.col(f"__old.{seq_col}"),
            F.col("__new"),
        )
        .otherwise(F.col("__old"))
    )
    keys = [
        F.coalesce(F.col(k), F.col(f"__k_{k}")).alias(k) for k in pks
    ]
    return joined.select(*keys, winner.alias("__w")).select(*pks, "__w.*")


def apply_cdc_by_pk(
    spark: SparkSession,
    changes: DataFrame,
    path: str,
    pks: Sequence[str],
    op_col: str = "op",
    seq_col: str = "seq",
    fmt: str = "parquet",
) -> None:
    """Apply a CDC batch to the table at ``path`` (apply_cdc_dataframes
    + read-modify-atomic-rewrite, merge_by_pk's storage discipline).
    At warehouse scale the same reconcile runs partition-pruned or as a
    native Delta MERGE with whenMatchedDelete — this keeps the parquet
    emulation exact."""
    pks = list(pks)
    _check_idents(*pks)
    state = _read_state_or_cold_start(spark, path, fmt)
    merged = apply_cdc_dataframes(state, changes, pks, op_col, seq_col)
    merged_local = merged.localCheckpoint(eager=True)
    merged_local.write.format(fmt).mode("overwrite").save(path)
    spark.catalog.refreshByPath(path)


def read_cdc_state(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Live rows of a CDC state table: tombstones filtered, flag dropped."""
    df = spark.read.format(fmt).load(path)
    return df.filter(~F.col("__deleted")).drop("__deleted")


def inferred_dim_members(
    dim: DataFrame,
    fact: DataFrame,
    dim_key: str,
    fact_key: str,
    defaults: Mapping[str, object] | None = None,
) -> DataFrame:
    """Late-arriving-dimension handling (Kimball "inferred members"):
    fact rows sometimes reference dimension keys the dim feed hasn't
    delivered yet (out-of-order sources, cross-system lag). Dropping
    them loses facts; failing the load blocks the warehouse. The
    standard fix is to INSERT a placeholder dim row per unknown key —
    joins land, reports show 'Unknown', and the real attributes
    overwrite the placeholder when the late dim row finally arrives
    (merge_by_pk on the same key does exactly that).

    Returns ``dim`` plus one placeholder row per DISTINCT fact key
    absent from the dim: key column set, every other column NULL
    unless given in ``defaults`` (literal values, e.g. name='Unknown'),
    and an ``__inferred`` boolean marking placeholders (existing rows
    read false) so downstream can audit/backfill them.

    Scale: one distinct on the fact's key column + one anti-join
    against the dim (broadcast — dims are small by definition). The
    fact is never rewritten.
    """
    defaults = dict(defaults or {})
    # NULL foreign keys mean "no parent", not "late parent": a NULL
    # placeholder row could never be joined to or backfilled (NULL
    # never equi-matches), so it would pollute the dim forever.
    missing = (
        fact.select(F.col(fact_key).alias(dim_key))
        .filter(F.col(dim_key).isNotNull())
        .distinct()
        .join(dim.select(dim_key), dim_key, "left_anti")
    )
    cols = []
    for c in dim.columns:
        if c == dim_key:
            cols.append(F.col(dim_key))
        elif c in defaults:
            cols.append(F.lit(defaults[c]).cast(dict(dim.dtypes)[c]).alias(c))
        else:
            cols.append(F.lit(None).cast(dict(dim.dtypes)[c]).alias(c))
    placeholders = missing.select(*cols).withColumn(
        "__inferred", F.lit(True)
    )
    return dim.withColumn("__inferred", F.lit(False)).unionByName(placeholders)


def align_schemas_evolve(
    existing: DataFrame, updates: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Widen both sides to the UNION of their columns (missing columns
    become typed NULLs, types taken from whichever side has the
    column) — the schema-evolution half of an evolving MERGE. Column
    type conflicts raise loudly: silent casts are how a lake corrupts."""
    ex_t, up_t = dict(existing.dtypes), dict(updates.dtypes)
    for c in set(ex_t) & set(up_t):
        if ex_t[c] != up_t[c]:
            raise TypeError(
                f"schema evolution type conflict on {c!r}: "
                f"existing {ex_t[c]} vs updates {up_t[c]}"
            )
    all_cols = list(existing.columns) + [
        c for c in updates.columns if c not in ex_t
    ]
    def widen(df, have):
        return df.select(
            *[
                F.col(c) if c in have
                else F.lit(None).cast((ex_t | up_t)[c]).alias(c)
                for c in all_cols
            ]
        )
    return widen(existing, ex_t), widen(updates, up_t)


def merge_by_pk_evolve(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    pks: Sequence[str],
    fmt: str = "parquet",
) -> None:
    """Schema-EVOLVING upsert: like merge_by_pk, but an update batch
    may carry columns the stored table has never seen (and vice
    versa) — the new columns are appended to the table schema and read
    as NULL on untouched rows, exactly Delta's
    ``mergeSchema``/autoMerge contract, emulated on parquet. Same-name
    type conflicts raise rather than cast silently.

    The evolving half is align_schemas_evolve; storage discipline
    (read-modify-atomic-rewrite + cache refresh) is merge_by_pk's.
    """
    pks = list(pks)
    _check_idents(*pks)
    existing = _read_state_or_cold_start(spark, path, fmt)
    if existing is None:
        updates.dropDuplicates(pks).write.format(fmt).mode(
            "overwrite"
        ).save(path)
        return
    ex_w, up_w = align_schemas_evolve(existing, updates)
    merged = merge_dataframes(ex_w, up_w, pks)
    merged_local = merged.localCheckpoint(eager=True)
    merged_local.write.format(fmt).mode("overwrite").save(path)
    spark.catalog.refreshByPath(path)
