"""Round-7 wave-2 operators: HITS, partition modularity, degree
assortativity, local clustering coefficient, isotonic (PAV)
calibration, Qini uplift table — each vs a pure-Python reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.operators.evaluation import isotonic_calibration
from etl_java_spark.operators.experiments import qini_table
from etl_java_spark.operators.graph import (
    degree_assortativity,
    hits,
    local_clustering,
    partition_modularity,
)


# ---------------------------------------------------------------------------
# HITS


def _py_hits(edges, iterations=2):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    h = {n: 1.0 for n in nodes}
    a = {}
    for _ in range(iterations):
        a = {n: 0.0 for n in nodes}
        for u, v in edges:
            a[v] += h[u]
        h = {n: 0.0 for n in nodes}
        for u, v in edges:
            h[u] += a[v]
    ht, at = sum(h.values()), sum(a.values())
    return {n: (h[n] / ht, a[n] / at) for n in nodes}


def test_hits_matches_python_reference(spark):
    edges = [("a", "x"), ("a", "y"), ("b", "x"), ("c", "y"), ("c", "z")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df).collect()}
    want = _py_hits(edges)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n][0] - want[n][0]) < 1e-12, n
        assert abs(got[n][1] - want[n][1]) < 1e-12, n


def test_hits_pure_sink_and_source(spark):
    """A pure authority has hub 0.0; a pure hub has auth 0.0; scores
    on each side sum to 1."""
    df = spark.createDataFrame(
        [("h1", "s1"), ("h1", "s2"), ("h2", "s1")], "src string, dst string"
    )
    rows = {r["node"]: r for r in hits(df).collect()}
    assert rows["s1"]["hub"] == 0.0
    assert rows["h1"]["auth"] == 0.0
    assert abs(sum(r["hub"] for r in rows.values()) - 1.0) < 1e-12
    assert abs(sum(r["auth"] for r in rows.values()) - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# modularity


def _py_modularity(und_edges, comm):
    m = len(und_edges)
    deg = {}
    for u, v in und_edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    cs = sorted({comm.get(x, "__unassigned__") for x in deg})
    q = 0.0
    per = {}
    for c in cs:
        e_c = sum(
            1
            for u, v in und_edges
            if comm.get(u, "__unassigned__") == c
            and comm.get(v, "__unassigned__") == c
        )
        d_c = sum(d for x, d in deg.items() if comm.get(x, "__unassigned__") == c)
        contrib = e_c / m - (d_c / (2.0 * m)) ** 2
        per[c] = (e_c, d_c, contrib)
        q += contrib
    return per, q


def test_modularity_matches_python_reference(spark):
    # two near-cliques joined by one bridge
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("x", "y"), ("y", "z"), ("x", "z"),
        ("c", "x"),
    ]
    comm = {"a": "L", "b": "L", "c": "L", "x": "R", "y": "R", "z": "R"}
    df = spark.createDataFrame(edges, "src string, dst string")
    cdf = spark.createDataFrame(list(comm.items()), "node string, community string")
    rows = partition_modularity(df, cdf).collect()
    per, q = _py_modularity(edges, comm)
    assert {r["community"] for r in rows} == set(per)
    for r in rows:
        e_c, d_c, contrib = per[r["community"]]
        assert r["n_within_edges"] == e_c
        assert r["degree_sum"] == d_c
        assert abs(r["contribution"] - contrib) < 1e-12
        assert abs(r["modularity"] - q) < 1e-12
    assert q > 0.3  # the partition really is the community structure


def test_modularity_unassigned_nodes_keep_degree_mass(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    cdf = spark.createDataFrame([("a", "L")], "node string, community string")
    rows = {r["community"]: r for r in partition_modularity(df, cdf).collect()}
    assert "__unassigned__" in rows
    # total degree mass is conserved: sum degree_sum == 2m
    assert sum(r["degree_sum"] for r in rows.values()) == 4


def test_modularity_ignores_direction_and_duplicates(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a")],
        "src string, dst string",
    )
    cdf = spark.createDataFrame([("a", "c1"), ("b", "c1")],
                                "node string, community string")
    rows = partition_modularity(df, cdf).collect()
    assert len(rows) == 1
    assert rows[0]["n_within_edges"] == 1
    # single within-community edge graph: Q = 1/1 - (2/2)^2 = 0
    assert abs(rows[0]["modularity"] - 0.0) < 1e-15


# ---------------------------------------------------------------------------
# assortativity


def _py_assortativity(und_edges):
    deg = {}
    for u, v in und_edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in und_edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    n = len(xs)
    s1 = sum(xs)
    s11 = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    return (n * sxy - s1 * s1) / (n * s11 - s1 * s1)


def test_assortativity_star_is_negative(spark):
    """A star graph is maximally disassortative: r = -1."""
    edges = [("hub", f"leaf{i}") for i in range(5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    row = degree_assortativity(df).collect()[0]
    assert row["n_edges"] == 5
    assert row["n_vertices"] == 6
    assert abs(row["assortativity"] - (-1.0)) < 1e-12


def test_assortativity_matches_python_reference(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"),
        ("d", "e"), ("e", "f"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    row = degree_assortativity(df).collect()[0]
    assert abs(row["assortativity"] - _py_assortativity(edges)) < 1e-12


# ---------------------------------------------------------------------------
# local clustering


def test_local_clustering_triangle_plus_pendant(spark):
    """K3 plus a pendant off one vertex: the two pure-triangle nodes
    have lcc 1.0; the junction has 1 triangle over C(3,2)=3 wedges;
    the pendant (degree 1) has lcc 0.0."""
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    rows = {r["node"]: r for r in local_clustering(df).collect()}
    assert rows["a"]["lcc"] == 1.0 and rows["a"]["triangles"] == 1
    assert rows["b"]["lcc"] == 1.0
    assert abs(rows["c"]["lcc"] - 1.0 / 3.0) < 1e-15
    assert rows["c"]["degree"] == 3
    assert rows["d"]["lcc"] == 0.0 and rows["d"]["triangles"] == 0


def test_local_clustering_triangle_totals_match_global(spark, sf_small):
    """Sum of per-node triangle counts == 3x the global count (each
    triangle has 3 members) on a real graph."""
    from etl_java_spark.operators.graph import triangle_count

    p = spark.read.parquet(f"{sf_small}/part.parquet").select(
        F.col("p_partkey").alias("u"),
        (F.col("p_partkey") % 97).alias("v"),
    )
    per = local_clustering(p, "u", "v")
    total3 = per.agg(F.sum("triangles")).collect()[0][0]
    glob = triangle_count(p, "u", "v").collect()[0]["n_triangles"]
    assert total3 == 3 * glob


# ---------------------------------------------------------------------------
# isotonic calibration


def _py_pav(points):
    """points: list of (score, n, n_pos) sorted by score. Classic
    pool-adjacent-violators — an INDEPENDENT algorithm from the
    operator's minimax construction."""
    blocks = [[s, n, float(p)] for s, n, p in points]  # [score, w, sum_y]
    i = 0
    out = [b[:] for b in blocks]
    merged = True
    while merged:
        merged = False
        i = 0
        while i < len(out) - 1:
            if out[i][2] / out[i][1] > out[i + 1][2] / out[i + 1][1]:
                out[i] = [out[i][0], out[i][1] + out[i + 1][1],
                          out[i][2] + out[i + 1][2]]
                del out[i + 1]
                merged = True
            else:
                i += 1
    fits = []
    for b in out:
        fits += [b[2] / b[1]] * 1
    # expand back to per-input-score fits
    expanded = []
    bi = 0
    consumed = 0
    for s, n, p in points:
        expanded.append(out[bi][2] / out[bi][1])
        consumed += n
        if consumed >= out[bi][1]:
            consumed = 0
            bi += 1
    return expanded


def test_isotonic_matches_pav(spark):
    points = [
        (0.1, 4, 1), (0.2, 3, 2), (0.3, 5, 1), (0.4, 2, 2), (0.5, 6, 3),
        (0.6, 1, 0), (0.7, 4, 4),
    ]
    rows = []
    for s, n, p in points:
        rows += [(s, 1)] * p + [(s, 0)] * (n - p)
    df = spark.createDataFrame(rows, "s double, y int")
    got = isotonic_calibration(df, "s", "y").orderBy("score").collect()
    want = _py_pav(points)
    assert len(got) == len(points)
    for r, w in zip(got, want):
        assert abs(r["isotonic_rate"] - w) < 1e-12, r["score"]
    # monotone non-decreasing
    fits = [r["isotonic_rate"] for r in got]
    assert all(a <= b + 1e-15 for a, b in zip(fits, fits[1:]))
    # weighted mean preserved (PAV invariant)
    tw = sum(n for _, n, _ in points)
    ty = sum(p for _, _, p in points)
    assert abs(sum(r["n"] * r["isotonic_rate"] for r in got) - ty) < 1e-9
    assert sum(r["n"] for r in got) == tw


def test_isotonic_already_monotone_is_identity(spark):
    rows = [(0.1, 0), (0.1, 0), (0.5, 0), (0.5, 1), (0.9, 1), (0.9, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    got = isotonic_calibration(df, "s", "y").orderBy("score").collect()
    for r in got:
        assert abs(r["isotonic_rate"] - r["empirical_rate"]) < 1e-15


# ---------------------------------------------------------------------------
# qini


def test_qini_hand_example(spark):
    # 2 buckets of 2 units each (score desc, id asc):
    #   bucket1: u1(t=1,y=1), u2(t=0,y=0) -> cyt=1 cyc=0 cnt=1 cnc=1 qini=1
    #   bucket2: u3(t=1,y=0), u4(t=0,y=1) -> cyt=1 cyc=1 cnt=2 cnc=2 qini=0
    df = spark.createDataFrame(
        [
            (1, 4.0, 1, 1), (2, 3.0, 0, 0), (3, 2.0, 1, 0), (4, 1.0, 0, 1),
        ],
        "id long, s double, t int, y int",
    )
    rows = qini_table(df, "s", "t", "y", "id", n_buckets=2).orderBy(
        "bucket"
    ).collect()
    assert rows[0]["qini"] == 1.0
    assert rows[1]["qini"] == 0.0
    assert rows[0]["uplift_rate"] == 1.0
    assert rows[1]["n_treat"] == 1 and rows[1]["n_ctrl"] == 1


def test_qini_no_control_prefix_is_null(spark):
    df = spark.createDataFrame(
        [(1, 4.0, 1, 1), (2, 3.0, 1, 0), (3, 2.0, 0, 1), (4, 1.0, 0, 0)],
        "id long, s double, t int, y int",
    )
    rows = qini_table(df, "s", "t", "y", "id", n_buckets=2).orderBy(
        "bucket"
    ).collect()
    assert rows[0]["qini"] is None  # no control units seen yet
    assert rows[1]["qini"] is not None


def test_hits_zero_iterations_raises(spark):
    import pytest

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="iterations"):
        hits(df, iterations=0)
