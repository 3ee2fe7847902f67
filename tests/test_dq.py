"""Declarative data-quality checks (operators/dq.py)."""

import pytest

from pyspark.sql import functions as F

from etl_java_spark.operators import dq


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, 10, 5.0),
        (2, 10, -1.0),   # range violation
        (2, 20, 3.0),    # duplicate id
        (3, None, 2.0),  # null fk
        (4, 99, 150.0),  # orphan fk + range violation
    ]
    return spark.createDataFrame(rows, "id int, cust int, amount double")


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame([(10,), (20,)], "ckey int")


def test_run_checks_counts(dirty, ref):
    out = dq.run_checks(
        dirty,
        [
            dq.check_not_null("cust"),
            dq.check_accepted_range("amount", 0, 100),
            dq.check_unique("id"),
            dq.check_foreign_key("cust", ref, "ckey"),
        ],
    )
    got = {r.check_name: (r.kind, r.n_violations) for r in out.collect()}
    assert got == {
        "cust_not_null": ("not_null", 1),
        "amount_in_range": ("range", 2),
        "id_unique": ("unique", 1),       # 2 rows share id=2 -> 1 extra
        "cust_fk_ckey": ("foreign_key", 1),  # cust=99; NULL not an orphan
    }


def test_clean_data_all_zero(spark, ref):
    clean = spark.createDataFrame([(1, 10, 5.0), (2, 20, 6.0)], "id int, cust int, amount double")
    out = dq.run_checks(
        clean,
        [
            dq.check_not_null("cust"),
            dq.check_unique("id"),
            dq.check_foreign_key("cust", ref, "ckey"),
        ],
    )
    assert all(r.n_violations == 0 for r in out.collect())


def test_violations_rows(dirty, ref):
    bad_range = dq.violations(dirty, dq.check_accepted_range("amount", 0, 100))
    assert sorted(r.id for r in bad_range.collect()) == [2, 4]
    dupes = dq.violations(dirty, dq.check_unique("id"))
    assert sorted(r.cust for r in dupes.collect()) == [10, 20]
    orphans = dq.violations(dirty, dq.check_foreign_key("cust", ref, "ckey"))
    assert [r.id for r in orphans.collect()] == [4]


def test_custom_predicate(dirty):
    chk = dq.check_predicate("amount_gt_cust", F.col("amount") > F.col("cust"))
    out = dq.run_checks(dirty, [chk]).collect()
    assert out[0].check_name == "amount_gt_cust" and out[0].n_violations == 1


def test_empty_suite(dirty):
    out = dq.run_checks(dirty, [])
    assert out.count() == 0
    assert out.columns == ["check_name", "kind", "n_violations"]
