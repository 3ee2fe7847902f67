"""CDC-apply with tombstones (sinks/writers.apply_cdc_dataframes /
apply_cdc_by_pk), hard-negative mining, and the fixed-width connector."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_java_spark.sinks.writers import (
    apply_cdc_by_pk,
    apply_cdc_dataframes,
    read_cdc_state,
)
from etl_java_spark.sources.readers import read_fixed_width, write_fixed_width


CHANGELOG = [
    # (pk, seq, op, v)
    ("A", 1, "U", 1.0),
    ("A", 2, "U", 2.0),
    ("A", 3, "D", None),   # A ends deleted
    ("B", 1, "U", 10.0),
    ("B", 3, "U", 30.0),
    ("C", 1, "U", 5.0),
    ("C", 2, "D", None),
    ("C", 4, "U", 7.0),    # C resurrects after the tombstone
    ("D", 2, "D", None),   # delete-before-any-insert (late create never came)
]
SCHEMA = "pk string, seq long, op string, v double"
# final live state: B -> 30.0 (seq 3), C -> 7.0 (seq 4)
WANT_LIVE = {"B": (3, 30.0), "C": (4, 7.0)}
WANT_TOMBSTONED = {"A", "D"}


def _apply_splits(spark, splits):
    workdir = tempfile.mkdtemp(prefix="cdc_apply_test_")
    try:
        path = f"{workdir}/state"
        for batch in splits:
            if not batch:
                continue
            df = spark.createDataFrame(batch, SCHEMA)
            apply_cdc_by_pk(spark, df, path, pks=["pk"])
        state = spark.read.parquet(path).collect()
        live = read_cdc_state(spark, path).collect()
        return (
            {r["pk"]: (r["seq"], r["v"], r["__deleted"]) for r in state},
            {r["pk"]: (r["seq"], r["v"]) for r in live},
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_cdc_single_batch(spark):
    state, live = _apply_splits(spark, [CHANGELOG])
    assert live == WANT_LIVE
    assert {k for k, (_, _, d) in state.items() if d} == WANT_TOMBSTONED


@pytest.mark.parametrize(
    "cuts",
    [
        [3, 6],          # in-order thirds
        [1, 2, 4, 7],    # uneven
        [8],             # all but one, then one
    ],
)
def test_cdc_batching_order_robust(spark, cuts):
    """Any split of the changelog into sequential batches converges to
    the same state (foreachBatch splits are arbitrary)."""
    splits, prev = [], 0
    for c in cuts + [len(CHANGELOG)]:
        splits.append(CHANGELOG[prev:c])
        prev = c
    _, live = _apply_splits(spark, splits)
    assert live == WANT_LIVE


def test_cdc_out_of_order_batches_do_not_regress(spark):
    """A LATER batch carrying an OLDER seq must not regress the stored
    row or resurrect a tombstoned key — the seq condition, not batch
    arrival order, decides."""
    first = [r for r in CHANGELOG if r[1] >= 3]   # the high-seq tail first
    late = [r for r in CHANGELOG if r[1] < 3]     # stale changes arrive after
    _, live = _apply_splits(spark, [first, late])
    assert live == WANT_LIVE


def test_cdc_retry_idempotent(spark):
    """Re-applying the same batch (foreachBatch retry) is a no-op."""
    _, live = _apply_splits(spark, [CHANGELOG, CHANGELOG])
    assert live == WANT_LIVE


def test_cdc_dataframes_cold_start_reduces_batch(spark):
    df = spark.createDataFrame(CHANGELOG, SCHEMA)
    out = apply_cdc_dataframes(None, df, ["pk"]).collect()
    got = {r["pk"]: (r["seq"], r["__deleted"]) for r in out}
    assert got == {
        "A": (3, True), "B": (3, False), "C": (4, False), "D": (2, True),
    }


# ---------------------------------------------------------------------------
# fixed width


def test_fixed_width_roundtrip_with_truncation_and_nulls(spark):
    df = spark.createDataFrame(
        [
            (1, "ALPHA LONG NAME", 12.5),
            (2, None, None),
            (33, "AB", 7.0),
        ],
        "k long, name string, x double",
    )
    workdir = tempfile.mkdtemp(prefix="fw_test_")
    try:
        path = f"{workdir}/fw"
        write_fixed_width(df, path, [("k", 4), ("name", 6), ("x", 8)])
        back = read_fixed_width(
            spark, path,
            [("k", 4, "long"), ("name", 6, "string"), ("x", 8, "double")],
        ).orderBy("k").collect()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    assert [r["k"] for r in back] == [1, 2, 33]
    assert back[0]["name"] == "ALPHA"  # truncated at 6 incl. trailing space
    assert back[1]["name"] is None and back[1]["x"] is None
    assert back[0]["x"] == 12.5 and back[2]["x"] == 7.0


def test_fixed_width_line_length_constant(spark):
    df = spark.createDataFrame([(1, "a"), (22, "bb")], "k long, s string")
    workdir = tempfile.mkdtemp(prefix="fw_len_")
    try:
        path = f"{workdir}/fw"
        write_fixed_width(df, path, [("k", 5), ("s", 3)])
        lines = [r["value"] for r in spark.read.text(path).collect()]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    assert all(len(ln) == 8 for ln in lines)


# ---------------------------------------------------------------------------
# hard negatives


def test_hard_negatives_excludes_same_label_and_self(spark):
    from etl_java_spark.operators.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [0.9, 0.1], "a"),   # closest to 1 but same label -> excluded
        (3, [0.8, 0.2], "b"),
        (4, [0.0, 1.0], "b"),
        (5, [0.7, 0.3], None),  # null label is a valid distinct label
    ]
    df = spark.createDataFrame(rows, "vec_id long, e array<double>, label string")
    out = hard_negatives(
        df, df.filter(F.col("vec_id") == 1), "e", "vec_id", "label", k=2
    ).collect()
    ids = [r["neighbor_id"] for r in out]
    assert 2 not in ids and 1 not in ids
    assert ids == [3, 5]  # cosine order among different-label rows
    assert all(r["rank"] == i + 1 for i, r in enumerate(out))


def test_inferred_members_null_fk_not_inferred(spark):
    from etl_java_spark.sinks.writers import inferred_dim_members

    dim = spark.createDataFrame([(1, "a")], "k long, name string")
    fact = spark.createDataFrame([(1,), (None,), (7,)], "fk long")
    out = inferred_dim_members(dim, fact, "k", "fk").collect()
    keys = [r["k"] for r in out]
    assert None not in keys and sorted(keys) == [1, 7]
