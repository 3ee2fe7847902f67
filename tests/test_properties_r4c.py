"""Property tests (hypothesis) for the late round-4 operators:
temporal join parity under random changelogs, CMS merge linearity
under random splits, k-core peeling invariants."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_java_spark.operators import cdc as CDC
from etl_java_spark.operators.graph import k_core
from etl_java_spark.operators.relational import temporal_join
from etl_java_spark.operators.sketch import cms_build, cms_merge

BASE = dt.datetime(2024, 1, 1)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),  # user
            st.integers(0, 50),  # change offset (hours)
            st.booleans(),  # is delete
        ),
        min_size=1,
        max_size=15,
    ),
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 55)),
        min_size=1,
        max_size=10,
    ),
)
def test_temporal_join_matches_python_reference(spark, changes, facts):
    # unique (user, ts): dedupe by (user, hour)
    seen = {}
    for u, h, d in changes:
        seen[(u, h)] = d
    rows = [
        (u, BASE + dt.timedelta(hours=h), i, "D" if d else "U")
        for i, ((u, h), d) in enumerate(sorted(seen.items()))
    ]
    dim_src = spark.createDataFrame(rows, ["user_id", "ts", "seq", "op"])
    hist = CDC.scd2_history(
        dim_src, ["user_id"], "ts", seq_cols=["seq"], op_col="op"
    )
    dim = hist.select("user_id", "seq", "valid_from", "valid_to")
    fact_rows = [
        (i, u, BASE + dt.timedelta(hours=h, minutes=30))
        for i, (u, h) in enumerate(facts)
    ]
    fdf = spark.createDataFrame(fact_rows, ["fact_id", "user_id", "ts"])
    got = {
        r.fact_id: r.seq
        for r in temporal_join(fdf, dim, on="user_id", fact_time="ts").collect()
    }
    # python reference: latest non-deleted change at or before the fact
    by_user: dict[int, list] = {}
    for i, ((u, h), d) in enumerate(sorted(seen.items())):
        by_user.setdefault(u, []).append((BASE + dt.timedelta(hours=h), i, d))
    for fid, u, t in fact_rows:
        cands = [(ts, i, d) for ts, i, d in by_user.get(u, []) if ts <= t]
        want = None
        if cands:
            ts, i, d = max(cands)
            want = None if d else i
        assert got.get(fid) == want, (fid, u, t, got.get(fid), want)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=60),
    st.integers(0, 2),
)
def test_cms_merge_equals_whole_for_any_split(spark, keys, split_mod):
    df = spark.createDataFrame([(k, i) for i, k in enumerate(keys)], ["k", "i"])
    whole = cms_build(df, "k", width=32, depth=2)
    parts = [
        cms_build(df.filter(F.col("i") % 3 == m), "k", width=32, depth=2)
        for m in range(3)
    ]
    merged = cms_merge(*parts)
    diff = merged.exceptAll(whole).unionAll(whole.exceptAll(merged))
    assert diff.count() == 0


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=40,
    ),
    st.integers(2, 4),
)
def test_k_core_min_degree_invariant(spark, pairs, k):
    edges = [(a, b) for a, b in pairs if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, ["src", "dst"])
    core = k_core(df, k=k, rounds=10).collect()
    # every surviving node has degree >= k measured IN the core
    assert all(r.degree >= k for r in core)
