"""Round-10 second-leg operators vs pure-Python references.

Same discipline as test_r10_ops.py: each Spark operator is replayed by
a straight-line Python implementation of the documented algorithm on a
small in-memory fixture; integer outputs match exactly and double
outputs match to 1e-12 (the operators are fixed-double-tree by design).
"""

from __future__ import annotations

import math

import pytest


# ---------------------------------------------------------------------------
# spatial statistics


def _py_moran_geary(cells: dict[tuple[int, int], int]):
    n = len(cells)
    s = sum(cells.values())
    dev = {k: n * v - s for k, v in cells.items()}
    den = sum(d * d for d in dev.values())
    w = 0
    num_m = 0
    num_g = 0
    for (gx, gy), di in dev.items():
        for dx, dy in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            j = (gx + dx, gy + dy)
            if j in dev:
                dj = dev[j]
                w += 1
                num_m += di * dj
                num_g += (di - dj) * (di - dj)
    moran = n * float(num_m) / (w * float(den))
    geary = (n - 1.0) * float(num_g) / (2.0 * w * float(den))
    return n, w, moran, -1.0 / (n - 1.0), geary


def test_spatial_autocorrelation_matches_reference(spark):
    from etl_java_spark.operators.spatial import spatial_autocorrelation

    cells = {
        (0, 0): 10, (0, 1): 12, (0, 2): 11,
        (1, 0): 9, (1, 1) : 13, (1, 2): 40,
        (2, 0): 41, (2, 1): 39, (2, 2): 42,
    }
    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in cells.items()],
        "gx long, gy long, v long",
    )
    row = spatial_autocorrelation(df, "gx", "gy", "v").collect()[0]
    n, w, moran, exp_i, geary = _py_moran_geary(cells)
    assert row["n_cells"] == n and row["w_pairs"] == w
    assert row["moran_i"] == pytest.approx(moran, abs=1e-12)
    assert row["expected_i"] == pytest.approx(exp_i, abs=1e-12)
    assert row["geary_c"] == pytest.approx(geary, abs=1e-12)


def test_spatial_autocorrelation_checkerboard_dispersed(spark):
    """A perfect checkerboard is maximal dispersion: I < E[I], C > 1."""
    from etl_java_spark.operators.spatial import spatial_autocorrelation

    cells = {
        (gx, gy): (100 if (gx + gy) % 2 == 0 else 1)
        for gx in range(4)
        for gy in range(4)
    }
    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in cells.items()],
        "gx long, gy long, v long",
    )
    row = spatial_autocorrelation(df, "gx", "gy", "v").collect()[0]
    assert row["moran_i"] < row["expected_i"] < 0
    assert row["geary_c"] > 1.0


def _py_getis(cells: dict[tuple[int, int], int]):
    n = len(cells)
    s1 = sum(cells.values())
    s2 = sum(v * v for v in cells.values())
    xbar = s1 / n
    sd = math.sqrt(s2 / n - xbar * xbar)
    out = {}
    for (gx, gy), x in cells.items():
        neigh = [
            cells[(gx + dx, gy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (gx + dx, gy + dy) in cells
        ]
        wi = len(neigh)
        loc = sum(neigh)
        z = (loc - xbar * wi) / (
            sd * math.sqrt((n * wi - wi * wi) / (n - 1.0))
        )
        out[(gx, gy)] = (x, wi, loc, z)
    return out


def test_getis_hotspots_matches_reference(spark):
    from etl_java_spark.operators.spatial import getis_hotspots

    cells = {
        (gx, gy): ((gx * 7 + gy * 13) % 17) + (50 if gx == gy == 1 else 0)
        for gx in range(4)
        for gy in range(4)
    }
    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in cells.items()],
        "gx long, gy long, v long",
    )
    got = {
        (r["gx"], r["gy"]): (r["x"], r["w_i"], r["local_sum"], r["z"])
        for r in getis_hotspots(df, "gx", "gy", "v").collect()
    }
    ref = _py_getis(cells)
    assert set(got) == set(ref)
    for k, (x, wi, loc, z) in ref.items():
        gx_, gwi, gloc, gz = got[k]
        assert (gx_, gwi, gloc) == (x, wi, loc)
        assert gz == pytest.approx(z, abs=1e-12)
    # the hottest cell's 3x3 neighborhood contains the planted spike
    hot = max(ref, key=lambda k: ref[k][3])
    assert abs(hot[0] - 1) <= 1 and abs(hot[1] - 1) <= 1


def test_nearest_neighbor_join_matches_reference(spark):
    from etl_java_spark.operators.spatial import nearest_neighbor_join

    pts = [(i, (i * 37) % 100, (i * 61) % 100) for i in range(1, 41)]
    fac = [(j, (j * 53) % 100, (j * 29) % 100) for j in range(1, 8)]
    pdf = spark.createDataFrame(pts, "pid long, px long, py long")
    fdf = spark.createDataFrame(fac, "fid long, fx long, fy long")
    got = {
        r["pid"]: (r["fid"], r["dist2"])
        for r in nearest_neighbor_join(
            pdf, fdf, "pid", "px", "py", "fid", "fx", "fy", cell=25
        ).collect()
    }
    for pid, px, py in pts:
        mcx, mcy = px // 25, py // 25
        cand = [
            (
                (px - fx) * (px - fx) + (py - fy) * (py - fy),
                fid,
            )
            for fid, fx, fy in fac
            if abs(fx // 25 - mcx) <= 1 and abs(fy // 25 - mcy) <= 1
        ]
        if not cand:
            assert pid not in got
            continue
        d2, fid = min(cand)
        assert got[pid] == (fid, d2)


def test_nearest_neighbor_join_tiebreak_smallest_fid(spark):
    from etl_java_spark.operators.spatial import nearest_neighbor_join

    pdf = spark.createDataFrame([(1, 10, 10)], "pid long, px long, py long")
    fdf = spark.createDataFrame(
        [(9, 10, 12), (3, 10, 8), (7, 12, 10)],
        "fid long, fx long, fy long",
    )
    row = nearest_neighbor_join(
        pdf, fdf, "pid", "px", "py", "fid", "fx", "fy", cell=25
    ).collect()[0]
    assert (row["fid"], row["dist2"]) == (3, 4)
