"""Round-10 operators vs pure-Python references.

Same discipline as test_r9_ops.py: each Spark operator is replayed by
a straight-line Python implementation of the documented algorithm on a
small in-memory fixture, and the outputs must match exactly (the
operators are all-integer by design, so there is no tolerance)."""

from __future__ import annotations

import re

import pytest


def _py_dup_span_intervals(
    docs: dict[int, str],
    shingle_n: int = 3,
    window: int = 4,
    min_tokens: int = 20,
    max_fp_freq: int = 200,
    max_gap: int | None = None,
) -> list[tuple]:
    """Reference replay of corpus.dup_span_intervals."""
    if max_gap is None:
        max_gap = shingle_n + window - 1

    def tokens(t: str) -> list[str]:
        return [x for x in re.split("[^a-z0-9]+", t.strip().lower()) if x]

    def shingles(tk: list[str]) -> list[str]:
        if len(tk) < shingle_n:
            return [" ".join(tk)]
        return [
            " ".join(tk[i : i + shingle_n])
            for i in range(len(tk) - shingle_n + 1)
        ]

    def poly(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) % 2147483647
        return h

    fp_rows: list[tuple[int, int, int]] = []  # (doc, pos, fp)
    for d, text in docs.items():
        hs = [poly(s) for s in shingles(tokens(text))]
        m = len(hs) - window + 1
        if m <= 1:
            ps = {hs.index(min(hs)) + 1}
        else:
            ps = set()
            for i in range(1, m + 1):
                sl = hs[i - 1 : i - 1 + window]
                ps.add(i - 1 + sl.index(min(sl)) + 1)
        for p in sorted(ps):
            fp_rows.append((d, p, hs[p - 1]))

    from collections import Counter, defaultdict

    freq = Counter(fp for _, _, fp in fp_rows)
    kept = [(d, p, fp) for d, p, fp in fp_rows if freq[fp] <= max_fp_freq]
    by_fp: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for d, p, fp in kept:
        by_fp[fp].append((d, p))
    chains: dict[tuple[int, int, int], list[int]] = defaultdict(list)
    for fp, occ in by_fp.items():
        for da, pa in occ:
            for db, pb in occ:
                if da < db:
                    chains[(da, db, pa - pb)].append(pa)
    out = []
    for (da, db, diag), pas in chains.items():
        pas = sorted(set(pas))
        start = prev = pas[0]
        runs = []
        for p in pas[1:]:
            if p - prev > max_gap:
                runs.append((start, prev))
                start = p
            prev = p
        runs.append((start, prev))
        for a0, a1 in runs:
            n = a1 - a0 + shingle_n
            if n >= min_tokens:
                out.append(
                    (da, db, a0, a1 + shingle_n - 1, a0 - diag,
                     a1 - diag + shingle_n - 1, n)
                )
    return sorted(out)


def _fixture_docs() -> dict[int, str]:
    run = " ".join(f"tok{i % 13}x{i}" for i in range(35))
    other = " ".join(f"word{i * 3 % 17}y{i}" for i in range(30))
    return {
        1: "alpha beta " + run + " gamma delta",
        2: "unrelated lead in words here :: " + run,  # shifted diagonal
        3: other,
        4: other + " trailing bits",
        5: "totally disjoint content with nothing shared at all ok",
        6: run,  # exact substring of 1 and 2
    }


def test_dup_span_intervals_matches_reference(spark):
    from etl_java_spark.operators.corpus import dup_span_intervals

    docs = _fixture_docs()
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = sorted(
        tuple(r)
        for r in dup_span_intervals(
            df, "text", "doc_id", min_tokens=20
        ).collect()
    )
    assert got == _py_dup_span_intervals(docs)
    assert got, "fixture must produce at least one interval"


def test_dup_span_intervals_shifted_copy_found(spark):
    """A prefix insertion shifts the diagonal but must not hide the
    run (the content-defined property); disjoint docs yield nothing."""
    from etl_java_spark.operators.corpus import dup_span_intervals

    docs = _fixture_docs()
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    rows = dup_span_intervals(df, "text", "doc_id", min_tokens=20).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert (1, 2) in pairs  # shifted copy
    assert (1, 6) in pairs and (2, 6) in pairs  # exact substring
    assert not any(5 in p for p in pairs)  # disjoint doc never pairs
    r12 = next(r for r in rows if (r["id_a"], r["id_b"]) == (1, 2))
    # diagonal = a_start - b_start is the token shift between the docs
    # (doc 1 leads with 2 tokens, doc 2 with 5 -- "::" tokenizes away)
    assert r12["a_start"] - r12["b_start"] == 2 - 5


def test_dup_span_intervals_min_tokens_filters(spark):
    """Short shared boilerplate (under min_tokens) must not survive."""
    from etl_java_spark.operators.corpus import dup_span_intervals

    short = "the same short banner text here"
    docs = {
        1: short + " then doc one body continues differently alpha",
        2: short + " but doc two diverges immediately beta gamma",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    assert (
        dup_span_intervals(df, "text", "doc_id", min_tokens=20).count() == 0
    )


def _py_friedman(cells: dict[tuple[str, str], int]) -> tuple:
    """Reference replay of experiments.friedman_test (doubled midranks,
    tie-corrected Q)."""
    from collections import defaultdict

    by_blk: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for (blk, trt), v in cells.items():
        by_blk[blk].append((trt, v))
    r2: dict[tuple[str, str], int] = {}
    for blk, rows in by_blk.items():
        for trt, v in rows:
            smaller = sum(1 for _, u in rows if u < v)
            tied = sum(1 for _, u in rows if u == v)
            r2[(blk, trt)] = 2 * smaller + tied + 1
    n = len(by_blk)
    k = len({t for _, t in cells})
    r2j: dict[str, int] = defaultdict(int)
    for (blk, trt), r in r2.items():
        r2j[trt] += r
    a4 = sum(r * r for r in r2.values())
    num = sum((rj - n * (k + 1)) ** 2 for rj in r2j.values())
    q = (k - 1) * num / (a4 - n * k * (k + 1) ** 2)
    return n, k, q


def test_friedman_matches_reference(spark):
    from etl_java_spark.operators.experiments import friedman_test

    cells = {
        (b, t): ((i * 31 + j * 17) % 23) + (5 if t == "t1" else 0)
        for i, b in enumerate(["b1", "b2", "b3", "b4", "b5", "b6"])
        for j, t in enumerate(["t0", "t1", "t2"])
    }
    df = spark.createDataFrame(
        [(b, t, v) for (b, t), v in cells.items()],
        "blk string, trt string, v long",
    )
    out = friedman_test(df, "blk", "trt", "v").collect()[0]
    n, k, q = _py_friedman(cells)
    assert (out["n_blocks"], out["k_treatments"]) == (n, k)
    assert out["q_stat"] == pytest.approx(q, rel=1e-12)
    # k=3 -> df=2: closed form sf = exp(-q/2)
    import math

    assert out["p_value"] == pytest.approx(math.exp(-q / 2), rel=1e-12)


def test_friedman_large_k_null_p(spark):
    """df = k-1 > 16 must yield NULL p (dynamic-series reach), with the
    exact Q still reported."""
    from etl_java_spark.operators.experiments import friedman_test

    rows = [
        (f"b{i}", f"t{j:02d}", (i * 7 + j * 13) % 29)
        for i in range(4)
        for j in range(19)
    ]
    df = spark.createDataFrame(rows, "blk string, trt string, v long")
    out = friedman_test(df, "blk", "trt", "v").collect()[0]
    assert out["k_treatments"] == 19 and out["q_stat"] is not None
    assert out["p_value"] is None


def _py_mmr(codes: dict[int, list[int]], qc: list[int], k=3, pool=8,
            lam_num=7, lam_den=10) -> list[tuple]:
    """Reference replay of similarity.mmr_topk."""
    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    rel = {i: dot(c, qc) for i, c in codes.items()}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:pool]
    sel: list[int] = []
    out = []
    for r in range(1, k + 1):
        best = None
        for i in cand:
            if i in sel:
                continue
            ms = max((dot(codes[i], codes[j]) for j in sel), default=0)
            sc = lam_num * rel[i] - (lam_den - lam_num) * ms
            key = (-sc, i)
            if best is None or key < best[0]:
                best = (key, i, rel[i], ms, sc)
        _, i, rl, ms, sc = best
        sel.append(i)
        out.append((r, i, rl, ms, sc))
    return out


def test_mmr_topk_matches_reference(spark):
    from etl_java_spark.operators.similarity import mmr_topk

    codes = {
        1: [10, 0, 0, 5],
        2: [10, 0, 0, 4],   # near-duplicate of 1 -> penalized
        3: [0, 10, 0, 5],
        4: [0, 0, 10, 5],
        5: [9, 1, 0, 5],
        6: [0, 0, 0, 1],
    }
    qc = [8, 4, 2, 6]
    df = spark.createDataFrame(
        [(i, c) for i, c in codes.items()], "vec_id long, codes array<int>"
    )
    q = spark.createDataFrame([(qc,)], "codes array<int>")
    got = [
        tuple(r)
        for r in mmr_topk(df, q, k=3, pool=8).orderBy("rank").collect()
    ]
    assert got == _py_mmr(codes, qc, k=3, pool=8)
    # diversity: the near-duplicate of pick 1 must NOT be pick 2
    first, second = got[0][1], got[1][1]
    assert first == 1 and second != 2


def test_mmr_topk_lambda_one_is_pure_relevance(spark):
    """lam = lam_den/lam_den disables the penalty: picks = top-k rel."""
    from etl_java_spark.operators.similarity import mmr_topk

    codes = {i: [i, 2 * i, 3] for i in range(1, 7)}
    df = spark.createDataFrame(
        [(i, c) for i, c in codes.items()], "vec_id long, codes array<int>"
    )
    q = spark.createDataFrame([([5, 5, 5],)], "codes array<int>")
    got = [
        r["id"]
        for r in mmr_topk(df, q, k=3, pool=6, lam_num=10, lam_den=10)
        .orderBy("rank").collect()
    ]
    assert got == [6, 5, 4]


def test_dup_token_fraction_full_copy_near_one(spark):
    """A full copy covers ~the whole document (edge slack only); the
    merge must not double-count the overlapping two-pair coverage."""
    from etl_java_spark.operators.corpus import dup_token_fraction

    docs = _fixture_docs()
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    rows = {r["id"]: r for r in dup_token_fraction(
        df, "text", "doc_id", min_tokens=20).collect()}
    # doc 6 is wholly contained in 1 AND 2: one merged island, frac
    # near 1 (boundary slack ~ shingle+window tokens per side on a
    # 35-token doc); doc 3 = exact prefix of doc 4 -> exactly 1.0
    assert rows[6]["n_islands"] == 1
    assert rows[6]["dup_frac"] > 0.8
    assert rows[3]["dup_frac"] == 1.0
    assert rows[6]["dup_tokens"] <= rows[6]["total_tokens"]
    # doc 5 shares nothing: absent
    assert 5 not in rows
    # every fraction is a valid proportion
    assert all(0 < r["dup_frac"] <= 1.0 for r in rows.values())


def test_mood_median_matches_reference(spark):
    from collections import Counter

    from etl_java_spark.operators.experiments import mood_median_test

    data = (
        [("a", v) for v in [1, 2, 2, 3, 9, 10]]
        + [("b", v) for v in [4, 5, 6, 7, 8, 8]]
        + [("c", v) for v in [1, 1, 2, 9, 9, 9]]
    )
    vals = sorted(v for _, v in data)
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]  # lower median
    per = Counter(g for g, _ in data)
    above = Counter(g for g, v in data if v > med)
    a_tot = sum(above.values())
    chi2 = 0.0
    for g in sorted(per):  # group-name fold order
        ng, ag = per[g], above.get(g, 0)
        ea = a_tot * ng / n
        eb = (n - a_tot) * ng / n
        chi2 += (ag - ea) ** 2 / ea + ((ng - ag) - eb) ** 2 / eb
    df = spark.createDataFrame(data, "grp string, v long")
    out = mood_median_test(df, "grp", "v").collect()[0]
    assert out["grand_median"] == med
    assert out["chi2"] == pytest.approx(chi2, rel=1e-12)
    import math

    # k=3 -> df=2 closed form
    assert out["p_value"] == pytest.approx(math.exp(-chi2 / 2), rel=1e-12)


def test_jonckheere_matches_brute_force(spark):
    import math
    from collections import Counter

    from etl_java_spark.operators.experiments import jonckheere_terpstra

    data = (
        [(1, v) for v in [1, 3, 3, 5, 7]]
        + [(2, v) for v in [2, 3, 6, 8, 8, 9]]
        + [(3, v) for v in [5, 8, 9, 9, 12]]
    )
    groups = sorted({g for g, _ in data})
    j2 = 0
    for i, gi in enumerate(groups):
        for gj in groups[i + 1 :]:
            for x in (v for g, v in data if g == gi):
                for y in (v for g, v in data if g == gj):
                    j2 += 2 if x < y else (1 if x == y else 0)
    n = len(data)
    ns = [sum(1 for g, _ in data if g == gg) for gg in groups]
    ts = list(Counter(v for _, v in data).values())
    a = (
        n * (n - 1) * (2 * n + 5)
        - sum(x * (x - 1) * (2 * x + 5) for x in ns)
        - sum(t * (t - 1) * (2 * t + 5) for t in ts)
    )
    b = sum(x * (x - 1) * (x - 2) for x in ns) * sum(
        t * (t - 1) * (t - 2) for t in ts
    )
    c = sum(x * (x - 1) for x in ns) * sum(t * (t - 1) for t in ts)
    var = a / 72.0 + b / (36.0 * n * (n - 1) * (n - 2)) + c / (
        8.0 * n * (n - 1)
    )
    zref = (2 * j2 - (n * n - sum(x * x for x in ns))) / (4.0 * math.sqrt(var))
    df = spark.createDataFrame(data, "grp int, val int")
    out = jonckheere_terpstra(df, "grp", "val").collect()[0]
    assert out["j_stat"] == j2 / 2
    assert out["z"] == pytest.approx(zref, rel=1e-12)
    # monotone upward trend in the fixture -> positive z
    assert out["z"] > 2


def test_jonckheere_null_when_single_group(spark):
    from etl_java_spark.operators.experiments import jonckheere_terpstra

    df = spark.createDataFrame(
        [(1, v) for v in range(10)], "grp int, val int"
    )
    out = jonckheere_terpstra(df, "grp", "val").collect()[0]
    # no ordered pair exists: J2 sum over empty set -> j_stat NULL-ish 0
    assert out["k_groups"] == 1
    assert out["z"] is None or out["z"] != out["z"] or out["z"] == 0


def test_page_trend_matches_reference(spark):
    import math

    from etl_java_spark.operators.experiments import page_trend_test

    # strictly increasing in trt within every block -> maximal L
    cells = [
        (f"b{i}", j, 10 * j + i) for i in range(6) for j in range(1, 5)
    ]
    n, k = 6, 4
    l_max = n * sum(j * j for j in range(1, k + 1))  # perfect agreement
    mean = n * k * (k + 1) ** 2 / 4
    var = n * k * k * (k + 1) ** 2 * (k - 1) / 144
    zref = (l_max - mean) / math.sqrt(var)
    df = spark.createDataFrame(cells, "blk string, trt int, v long")
    out = page_trend_test(df, "blk", "trt", "v").collect()[0]
    assert (out["n_blocks"], out["k_treatments"]) == (n, k)
    assert out["l_stat"] == l_max
    assert out["z"] == pytest.approx(zref, rel=1e-12)
    assert out["p_value"] < 0.001  # strong increasing trend


def test_page_trend_null_center(spark):
    """A flat (all-tied) table lands exactly on the null mean: L =
    n*k*(k+1)^2/4 via midranks, z = 0."""
    from etl_java_spark.operators.experiments import page_trend_test

    cells = [(f"b{i}", j, 5) for i in range(4) for j in range(1, 6)]
    out = page_trend_test(
        spark.createDataFrame(cells, "blk string, trt int, v long"),
        "blk", "trt", "v",
    ).collect()[0]
    assert out["z"] == 0.0
    # Zelen-Severo normal tail is a ~7.5e-8 approximation
    assert out["p_value"] == pytest.approx(0.5, abs=1e-7)


def _py_ljung_box(xs: list[float], h: int) -> tuple:
    n = len(xs)
    m = sum(xs) / n
    den = sum((x - m) ** 2 for x in xs)
    q = 0.0
    for k in range(1, h + 1):
        num = sum((xs[t] - m) * (xs[t - k] - m) for t in range(k, n))
        rho = num / den
        q += rho * rho / (n - k)
    return n * (n + 2) * q


def test_ljung_box_matches_reference(spark):
    import math

    from etl_java_spark.operators.timeseries import ljung_box

    xs = [float((i * 7) % 13 + (i % 4)) for i in range(40)]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t int, v double"
    )
    out = ljung_box(df, "t", "v", max_lag=4).collect()[0]
    qref = _py_ljung_box(xs, 4)
    assert out["q_stat"] == pytest.approx(qref, rel=1e-9)
    # df=4 closed form: exp(-q/2) * (1 + q/2)
    assert out["p_value"] == pytest.approx(
        math.exp(-qref / 2) * (1 + qref / 2), rel=1e-9
    )


def test_ljung_box_odd_lag_rejected(spark):
    from etl_java_spark.operators.timeseries import ljung_box

    df = spark.createDataFrame([(1, 1.0)], "t int, v double")
    with pytest.raises(ValueError, match="even"):
        ljung_box(df, "t", "v", max_lag=5)


def test_cochran_q_matches_reference(spark):
    import math
    from collections import Counter

    from etl_java_spark.operators.experiments import cochran_q

    rows = [
        (f"b{i}", f"t{j}", (i * j + i + j) % 3 == 0)
        for i in range(8)
        for j in range(3)
    ]
    cc, rr, n = Counter(), Counter(), 0
    for b, t, x in rows:
        if x:
            cc[t] += 1
            rr[b] += 1
            n += 1
    k = 3
    qref = (k - 1) * (k * sum(c * c for c in cc.values()) - n * n) / (
        k * n - sum(r * r for r in rr.values())
    )
    df = spark.createDataFrame(rows, "blk string, trt string, x boolean")
    out = cochran_q(df, "blk", "trt", "x").collect()[0]
    assert out["q_stat"] == pytest.approx(qref, rel=1e-12)
    # k=3 -> df=2 closed form
    assert out["p_value"] == pytest.approx(math.exp(-qref / 2), rel=1e-12)


def test_ccf_detects_lead(spark):
    """y_t = x_{t-2} (x LEADS y by 2): the CCF peaks exactly at
    lag -2 with r = 1 on the overlap."""
    from etl_java_spark.operators.timeseries import ccf_lags

    xs = [float((i * 7) % 13) for i in range(30)]
    ys = [0.0, 0.0] + xs[:-2]
    df = spark.createDataFrame(
        [(i, xs[i], ys[i]) for i in range(30)], "t int, x double, y double"
    )
    cc = {r["lag"]: r["ccf"] for r in ccf_lags(df, "t", "x", "y", 3).collect()}
    assert cc[-2] == pytest.approx(1.0, abs=1e-12)
    assert all(v < 0.99 for lag, v in cc.items() if lag != -2)


def test_durbin_watson_matches_reference(spark):
    from etl_java_spark.operators.timeseries import durbin_watson

    data = [(i, 2.0 * i + ((i * 13) % 7 - 3)) for i in range(50)]
    n = 50
    ts = list(range(1, n + 1))
    ys = [v for _, v in data]
    st, stt = sum(ts), sum(t * t for t in ts)
    sy, sty = sum(ys), sum(t * v for t, v in zip(ts, ys))
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    es = [v - b * t - a for t, v in zip(ts, ys)]
    dwref = sum((es[i] - es[i - 1]) ** 2 for i in range(1, n)) / sum(
        e * e for e in es
    )
    df = spark.createDataFrame(data, "t int, v double")
    out = durbin_watson(df, "t", "v").collect()[0]
    assert out["slope"] == pytest.approx(b, abs=1e-9)  # slope rounds to 9
    assert out["dw"] == pytest.approx(dwref, rel=1e-9)
    # the sawtooth around a clean trend is strongly negatively
    # autocorrelated at lag 1 -> DW well below 2 is NOT expected here;
    # it alternates -> DW above 1 at least, sanity band only
    assert 0.0 < out["dw"] < 4.0


def test_mann_kendall_matches_brute_force(spark):
    import math
    from collections import Counter

    from etl_java_spark.operators.timeseries import mann_kendall

    xs = [float(2 * i + ((i * 13) % 7)) for i in range(40)]
    n = 40
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    t = Counter(xs)
    var = (
        n * (n - 1) * (2 * n + 5)
        - sum(c * (c - 1) * (2 * c + 5) for c in t.values())
    ) / 18
    zref = (s - 1) / math.sqrt(var)
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t int, v double"
    )
    out = mann_kendall(df, "t", "v").collect()[0]
    assert out["s_stat"] == s
    assert out["z"] == pytest.approx(zref, rel=1e-12)
    assert out["p_value"] < 1e-6  # strong upward trend


def test_runs_test_matches_reference(spark):
    import math

    from etl_java_spark.operators.timeseries import runs_test

    xs = [float(2 * i + ((i * 13) % 7)) for i in range(40)]
    vals = sorted(xs)
    med = vals[(40 + 1) // 2 - 1]
    b = [1 if x > med else 0 for x in xs if x != med]
    r = 1 + sum(1 for i in range(1, len(b)) if b[i] != b[i - 1])
    n1, n2 = sum(b), len(b) - sum(b)
    nn = n1 + n2
    mu = 1 + 2 * n1 * n2 / nn
    var = 2 * n1 * n2 * (2 * n1 * n2 - nn) / (nn * nn * (nn - 1))
    zref = (r - mu) / math.sqrt(var)
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t int, v double"
    )
    out = runs_test(df, "t", "v").collect()[0]
    assert (out["n_above"], out["n_below"], out["n_runs"]) == (n1, n2, r)
    assert out["z"] == pytest.approx(zref, rel=1e-12)
    # a monotone series has exactly 2 runs -> extreme clustering
    assert r == 2 and out["p_value"] < 1e-6


def test_seasonal_decompose_finds_planted_phase(spark):
    from etl_java_spark.operators.timeseries import seasonal_decompose_ma

    ys = [10.0 * ((i % 7) == 2) + 0.5 * i for i in range(35)]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "t int, v double"
    )
    out = {
        r["phase"]: r["seasonal"]
        for r in seasonal_decompose_ma(df, "t", "v", 7).collect()
    }
    # spike planted on phase 2 (t=i, rn=i+1, phase=(rn-1)%7=i%7)
    assert out[2] == pytest.approx(10.0 * 6 / 7, abs=1e-6)
    assert all(v == pytest.approx(-10.0 / 7, abs=1e-6)
               for p, v in out.items() if p != 2)
    # indices re-center to ~0
    assert sum(out.values()) == pytest.approx(0.0, abs=1e-6)


def test_seasonal_decompose_even_period_rejected(spark):
    from etl_java_spark.operators.timeseries import seasonal_decompose_ma

    df = spark.createDataFrame([(1, 1.0)], "t int, v double")
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose_ma(df, "t", "v", period=6)


def test_pacf_matches_reference(spark):
    from etl_java_spark.operators.timeseries import pacf_lags

    xs = [float((i * 7) % 13 + 3 * ((i * 5) % 4)) for i in range(60)]
    n = len(xs)
    m = sum(xs) / n
    den = sum((x - m) ** 2 for x in xs)
    rho = {}
    for k in range(1, 5):
        rho[k] = sum(
            (xs[t] - m) * (xs[t - k] - m) for t in range(k, n)
        ) / den
    # Durbin-Levinson reference
    phi = {1: {1: rho[1]}}
    for k in range(2, 5):
        num = rho[k] - sum(phi[k - 1][j] * rho[k - j] for j in range(1, k))
        dnm = 1.0 - sum(phi[k - 1][j] * rho[j] for j in range(1, k))
        kk = num / dnm
        phi[k] = {k: kk}
        for j in range(1, k):
            phi[k][j] = phi[k - 1][j] - kk * phi[k - 1][k - j]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t int, v double"
    )
    out = {r["lag"]: r["pacf"] for r in pacf_lags(df, "t", "v", 4).collect()}
    for k in range(1, 5):
        assert out[k] == pytest.approx(phi[k][k], rel=1e-9), k
    # PACF lag 1 equals ACF lag 1 by construction
    assert out[1] == pytest.approx(rho[1], rel=1e-9)


def test_cramers_v_matches_reference_and_bounds(spark):
    from collections import Counter

    from etl_java_spark.operators.experiments import cramers_v

    rows = [(f"a{i % 3}", f"b{(i * 2 + i // 5) % 4}") for i in range(60)]
    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = 0.0
    for a in sorted(ra):
        for b in sorted(cb):
            e = ra[a] * cb[b] / n
            o = cells.get((a, b), 0)
            chi2 += (o - e) ** 2 / e
    import math

    vref = math.sqrt(chi2 / (n * min(len(ra) - 1, len(cb) - 1)))
    df = spark.createDataFrame(rows, "a string, b string")
    out = cramers_v(df, "a", "b").collect()[0]
    assert (out["r_levels"], out["c_levels"]) == (3, 4)
    assert out["chi2"] == pytest.approx(chi2, rel=1e-12)
    assert out["v"] == pytest.approx(vref, rel=1e-12)
    # perfect association -> V = 1
    perfect = spark.createDataFrame(
        [(f"x{i % 3}", f"y{i % 3}") for i in range(30)], "a string, b string"
    )
    assert cramers_v(perfect, "a", "b").collect()[0]["v"] == pytest.approx(
        1.0, rel=1e-12
    )


def test_cohens_d_matches_reference(spark):
    import math

    rows = [("a", 10), ("a", 12), ("a", 14), ("a", 16),
            ("b", 9), ("b", 11), ("b", 10), ("b", 13), ("b", 12)]
    df = spark.createDataFrame(rows, "grp string, v long")
    from etl_java_spark.operators.experiments import cohens_d

    out = cohens_d(df, "grp", "v", "a", "b").collect()[0]
    xa = [v for g, v in rows if g == "a"]
    xb = [v for g, v in rows if g == "b"]
    na, nb = len(xa), len(xb)
    ma, mb = sum(xa) / na, sum(xb) / nb
    ssa = sum(v * v for v in xa) - sum(xa) ** 2 / na
    ssb = sum(v * v for v in xb) - sum(xb) ** 2 / nb
    sp = math.sqrt((ssa + ssb) / (na + nb - 2))
    d = (ma - mb) / sp
    g = d * (1 - 3 / (4 * (na + nb) - 9))
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["mean_a"] == pytest.approx(ma, rel=1e-12)
    assert out["s_pooled"] == pytest.approx(sp, rel=1e-12)
    assert out["d"] == pytest.approx(d, rel=1e-12)
    assert out["g"] == pytest.approx(g, rel=1e-12)


def test_wasserstein_matches_reference_and_properties(spark):
    rows = [("a", 1), ("a", 3), ("a", 3), ("a", 7),
            ("b", 2), ("b", 3), ("b", 9)]
    df = spark.createDataFrame(rows, "grp string, v long")
    from etl_java_spark.operators.experiments import wasserstein_1d

    out = wasserstein_1d(df, "grp", "v", "a", "b").collect()[0]

    def w1(xa, xb):
        vals = sorted(set(xa) | set(xb))
        na, nb = len(xa), len(xb)
        ca = cb = 0
        tot = 0
        for i, v in enumerate(vals[:-1]):
            ca += sum(1 for x in xa if x == v)
            cb += sum(1 for x in xb if x == v)
            tot += abs(ca * nb - cb * na) * (vals[i + 1] - v)
        return tot / (na * nb)

    xa = [v for g, v in rows if g == "a"]
    xb = [v for g, v in rows if g == "b"]
    assert out["n_values"] == 5
    assert out["w1"] == pytest.approx(w1(xa, xb), rel=1e-12)
    # identical distributions -> 0
    same = spark.createDataFrame(
        [("a", 5), ("a", 8), ("b", 5), ("b", 8)], "grp string, v long"
    )
    assert wasserstein_1d(same, "grp", "v", "a", "b").collect()[0][
        "w1"
    ] == 0.0
    # point masses at 2 and 10 -> exactly the gap
    pts = spark.createDataFrame(
        [("a", 2), ("a", 2), ("b", 10)], "grp string, v long"
    )
    assert wasserstein_1d(pts, "grp", "v", "a", "b").collect()[0][
        "w1"
    ] == 8.0


def test_jsd_vs_rest_matches_reference_and_bounds(spark):
    import math

    rows = (
        [("s1", "en")] * 6 + [("s1", "de")] * 2
        + [("s2", "en")] * 3 + [("s2", "de")] * 5
        + [("s3", "fr")] * 4
    )
    df = spark.createDataFrame(rows, "src string, lang string")
    from etl_java_spark.operators.corpus import jsd_vs_rest

    out = {r["part"]: r for r in jsd_vs_rest(df, "src", "lang").collect()}

    def jsd(p_counts, q_counts):
        cats = sorted(set(p_counts) | set(q_counts))
        np_, nq = sum(p_counts.values()), sum(q_counts.values())
        tot = 0.0
        for c in cats:
            p = p_counts.get(c, 0) / np_
            q = q_counts.get(c, 0) / nq
            t = 0.0
            if p > 0:
                t += p * math.log(2 * p / (p + q))
            if q > 0:
                t += q * math.log(2 * q / (p + q))
            tot += 0.5 * t
        return tot

    from collections import Counter

    per = {s: Counter(l for g, l in rows if g == s) for s in ("s1", "s2", "s3")}
    for s in per:
        rest = Counter()
        for o, c in per.items():
            if o != s:
                rest += c
        assert out[s]["jsd"] == pytest.approx(jsd(per[s], rest), rel=1e-12)
    # s3's support (fr) is disjoint from the rest -> saturates at ln 2
    assert out["s3"]["jsd"] == pytest.approx(math.log(2.0), rel=1e-12)
    assert out["s3"]["jsd_norm"] == pytest.approx(1.0, rel=1e-12)
    # an identical-mix partition scores ~0
    bal = spark.createDataFrame(
        [("x", "en"), ("x", "de"), ("y", "en"), ("y", "de")],
        "src string, lang string",
    )
    for r in jsd_vs_rest(bal, "src", "lang").collect():
        assert abs(r["jsd"]) < 1e-15


def test_fleiss_kappa_matches_reference(spark):
    # 6 items x 3 raters over categories x/y/z (+ one ragged item
    # that must be dropped)
    panel = {
        1: ["x", "x", "x"], 2: ["x", "x", "y"], 3: ["y", "y", "z"],
        4: ["z", "z", "z"], 5: ["x", "y", "z"], 6: ["y", "y", "y"],
        7: ["x", "x"],  # ragged -> dropped
    }
    rows = [(i, c) for i, cs in panel.items() for c in cs]
    df = spark.createDataFrame(rows, "i long, c string")
    from etl_java_spark.operators.evaluation import fleiss_kappa

    out = fleiss_kappa(df, "i", "c", n_raters=3).collect()[0]
    kept = {i: cs for i, cs in panel.items() if len(cs) == 3}
    N, n = len(kept), 3
    from collections import Counter

    sa = sum(
        sum(v * v for v in Counter(cs).values()) for cs in kept.values()
    )
    cj = Counter(c for cs in kept.values() for c in cs)
    p_bar = (sa - N * n) / (N * n * (n - 1))
    p_e = sum(v * v for v in cj.values()) / (N * n) ** 2
    kappa = (p_bar - p_e) / (1 - p_e)
    assert out["n_items"] == N and out["n_raters"] == 3
    assert out["n_categories"] == 3
    assert out["p_bar"] == pytest.approx(p_bar, rel=1e-12)
    assert out["p_e"] == pytest.approx(p_e, rel=1e-12)
    assert out["kappa"] == pytest.approx(kappa, rel=1e-12)
    # unanimous panel -> kappa = 1
    uni = spark.createDataFrame(
        [(1, "x")] * 3 + [(2, "y")] * 3, "i long, c string"
    )
    assert fleiss_kappa(uni, "i", "c", 3).collect()[0]["kappa"] == 1.0


def test_krippendorff_alpha_matches_reference(spark):
    # ragged panel: items rated by 2-4 raters; singleton dropped
    panel = {
        1: ["a", "a"], 2: ["a", "b", "a"], 3: ["b", "b", "b", "b"],
        4: ["a", "b"], 5: ["b"],  # singleton -> excluded
    }
    rows = [(i, c) for i, cs in panel.items() for c in cs]
    df = spark.createDataFrame(rows, "i long, c string")
    from etl_java_spark.operators.evaluation import krippendorff_alpha

    out = krippendorff_alpha(df, "i", "c").collect()[0]
    kept = {i: cs for i, cs in panel.items() if len(cs) >= 2}
    from collections import Counter

    n = sum(len(cs) for cs in kept.values())
    s = sum(
        (len(cs) ** 2 - sum(v * v for v in Counter(cs).values()))
        / (len(cs) - 1)
        for cs in kept.values()
    )
    ck = Counter(c for cs in kept.values() for c in cs)
    d_o = s / n
    d_e = (n * n - sum(v * v for v in ck.values())) / (n * (n - 1))
    assert out["n_items"] == len(kept) and out["n_ratings"] == n
    assert out["d_o"] == pytest.approx(d_o, rel=1e-12)
    assert out["d_e"] == pytest.approx(d_e, rel=1e-12)
    assert out["alpha"] == pytest.approx(1 - d_o / d_e, rel=1e-12)
    # perfect agreement -> alpha = 1
    perf = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b")], "i long, c string"
    )
    assert krippendorff_alpha(perf, "i", "c").collect()[0]["alpha"] == 1.0


def test_mcc_matches_binary_closed_form(spark):
    import math

    # binary confusion: tp=50 fn=10 fp=5 tn=35
    conf = spark.createDataFrame(
        [("p", "p", 50), ("p", "n", 10), ("n", "p", 5), ("n", "n", 35)],
        "true_label string, pred_label string, n long",
    )
    from etl_java_spark.operators.evaluation import mcc_from_confusion

    out = mcc_from_confusion(conf).collect()[0]
    tp, fn, fp, tn = 50, 10, 5, 35
    want = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert out["n_rows"] == 100 and out["n_correct"] == 85
    assert out["n_classes"] == 2
    assert out["mcc"] == pytest.approx(want, rel=1e-12)
    # perfect multiclass prediction -> 1; a class never predicted
    # still counts via the full-outer class union
    perf = spark.createDataFrame(
        [("a", "a", 7), ("b", "b", 3), ("c", "c", 1)],
        "true_label string, pred_label string, n long",
    )
    assert mcc_from_confusion(perf).collect()[0]["mcc"] == pytest.approx(
        1.0, rel=1e-12
    )
    skew = spark.createDataFrame(
        [("a", "a", 9), ("b", "a", 1)],
        "true_label string, pred_label string, n long",
    )
    r = mcc_from_confusion(skew).collect()[0]
    assert r["n_classes"] == 2 and r["mcc"] == 0.0


def test_c_index_matches_brute_force(spark):
    # (dur, event, risk): brute-force Harrell over rows
    rows = [(2, 1, 9), (2, 1, 9), (4, 1, 7), (4, 0, 3), (6, 1, 5),
            (8, 0, 5), (8, 1, 2), (9, 0, 8)]
    df = spark.createDataFrame(rows, "t long, e int, r long")
    from etl_java_spark.operators.timeseries import c_index

    out = c_index(df, "t", "e", "r").collect()[0]
    comp = conc = tied = 0
    for ta, ea, ra in rows:
        for tb, eb, rb in rows:
            if ta < tb and ea == 1:
                comp += 1
                if ra > rb:
                    conc += 1
                elif ra == rb:
                    tied += 1
    assert out["n_comparable"] == comp
    assert out["n_concordant"] == conc
    assert out["n_tied_risk"] == tied
    assert out["c_index"] == pytest.approx(
        (2 * conc + tied) / (2 * comp), rel=1e-12
    )
    # a risk score that IS (negated) survival time ranks perfectly
    perf = spark.createDataFrame(
        [(t, 1, 10 - t) for t in range(1, 6)], "t long, e int, r long"
    )
    assert c_index(perf, "t", "e", "r").collect()[0]["c_index"] == 1.0


def test_somers_d_matches_brute_force(spark):
    rows = [(1, 1), (1, 2), (2, 1), (2, 3), (3, 3), (3, 3), (4, 2)]
    df = spark.createDataFrame(rows, "x long, y long")
    from etl_java_spark.operators.evaluation import somers_d

    out = somers_d(df, "x", "y").collect()[0]
    P = Q = tx = ty = 0
    n = len(rows)
    for i in range(n):
        for j in range(n):
            if i < j:
                xa, ya = rows[i]
                xb, yb = rows[j]
                if xa == xb:
                    tx += 1
                if ya == yb:
                    ty += 1
                if xa != xb and ya != yb:
                    if (xa < xb) == (ya < yb):
                        P += 1
                    else:
                        Q += 1
    n0 = n * (n - 1) // 2
    assert out["n_concordant"] == P and out["n_discordant"] == Q
    assert out["gamma"] == pytest.approx((P - Q) / (P + Q), rel=1e-12)
    assert out["d_yx"] == pytest.approx((P - Q) / (n0 - tx), rel=1e-12)
    assert out["d_xy"] == pytest.approx((P - Q) / (n0 - ty), rel=1e-12)
    # binary x: d_yx == 2*AUC - 1 (here x=0/1 groups, y the score)
    bx = [(0, 1), (0, 2), (0, 2), (1, 3), (1, 2), (1, 5)]
    bdf = spark.createDataFrame(bx, "x long, y long")
    r = somers_d(bdf, "x", "y").collect()[0]
    # AUC by brute force (ties count 1/2)
    pos = [y for x, y in bx if x == 1]
    neg = [y for x, y in bx if x == 0]
    auc = sum(
        1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg
    ) / (len(pos) * len(neg))
    assert r["d_yx"] == pytest.approx(2 * auc - 1, rel=1e-12)


def test_cronbach_alpha_matches_reference(spark):
    # 5 subjects x 3 items; a 2-item subject must be dropped
    scores = {
        1: [4, 5, 4], 2: [2, 3, 3], 3: [5, 5, 4], 4: [1, 2, 2],
        5: [3, 3, 4], 6: [9, 9],  # ragged -> dropped
    }
    rows = [
        (s, i + 1, v) for s, vs in scores.items() for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "s long, it long, v long")
    from etl_java_spark.operators.evaluation import cronbach_alpha

    out = cronbach_alpha(df, "s", "it", "v", n_items=3).collect()[0]
    kept = {s: vs for s, vs in scores.items() if len(vs) == 3}
    N, k = len(kept), 3

    def svar(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    ivs = sum(svar([vs[i] for vs in kept.values()]) for i in range(k))
    tv = svar([sum(vs) for vs in kept.values()])
    alpha = k / (k - 1) * (1 - ivs / tv)
    assert out["n_subjects"] == N and out["k_items"] == k
    assert out["item_var_sum"] == pytest.approx(ivs, rel=1e-12)
    assert out["total_var"] == pytest.approx(tv, rel=1e-12)
    assert out["alpha"] == pytest.approx(alpha, rel=1e-12)


def test_brown_forsythe_matches_reference(spark):
    rows = [("a", v) for v in [1, 2, 2, 3, 9]] + [
        ("b", v) for v in [4, 4, 5, 6]
    ] + [("c", v) for v in [1, 5, 9, 13, 17, 21]]
    df = spark.createDataFrame(rows, "g string, v long")
    from etl_java_spark.operators.experiments import brown_forsythe

    out = brown_forsythe(df, "g", "v").collect()[0]

    def lower_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    zs = {
        g: [abs(v - lower_median(vs)) for v in vs]
        for g, vs in groups.items()
    }
    N = sum(len(v) for v in zs.values())
    k = len(zs)
    zbar = sum(sum(v) for v in zs.values()) / N
    num = sum(
        len(v) * (sum(v) / len(v) - zbar) ** 2 for v in zs.values()
    )
    den = sum(
        (x - sum(v) / len(v)) ** 2 for v in zs.values() for x in v
    )
    w = (N - k) / (k - 1) * num / den
    assert out["n_rows"] == N and out["k_groups"] == k
    assert out["w_stat"] == pytest.approx(w, rel=1e-12)
    # identical spreads -> W == 0 exactly
    same = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 11), ("b", 13)], "g string, v long"
    )
    assert brown_forsythe(same, "g", "v").collect()[0]["w_stat"] == 0.0


def test_mcnemar_matches_reference(spark):
    import math

    # 3 concordant(1,1), 2 concordant(0,0), b=5 (1,0), c=2 (0,1)
    rows = (
        [(1, 1)] * 3 + [(0, 0)] * 2 + [(1, 0)] * 5 + [(0, 1)] * 2
    )
    df = spark.createDataFrame(rows, "a int, b int")
    from etl_java_spark.operators.experiments import mcnemar_test

    out = mcnemar_test(df, "a", "b").collect()[0]
    z = (abs(5 - 2) - 1) / math.sqrt(5 + 2)
    assert (out["n_pairs"], out["n_b"], out["n_c"]) == (12, 5, 2)
    assert out["z"] == pytest.approx(z, rel=1e-12)
    # concordant-only shifts never move the statistic
    more = spark.createDataFrame(
        rows + [(1, 1)] * 50, "a int, b int"
    )
    assert mcnemar_test(more, "a", "b").collect()[0]["z"] == out["z"]


def test_icc_oneway_matches_reference(spark):
    # strong subject effect: scores cluster tightly per subject
    scores = {
        1: [10, 11, 10], 2: [20, 19, 21], 3: [30, 31, 29], 4: [40, 40, 41],
        5: [99, 1],  # ragged -> dropped
    }
    rows = [(s, v) for s, vs in scores.items() for v in vs]
    df = spark.createDataFrame(rows, "s long, v long")
    from etl_java_spark.operators.evaluation import icc_oneway

    out = icc_oneway(df, "s", "v", n_items=3).collect()[0]
    kept = {s: vs for s, vs in scores.items() if len(vs) == 3}
    N, k = len(kept), 3
    grand = sum(sum(vs) for vs in kept.values()) / (N * k)
    msb = k * sum(
        (sum(vs) / k - grand) ** 2 for vs in kept.values()
    ) / (N - 1)
    msw = sum(
        (v - sum(vs) / k) ** 2 for vs in kept.values() for v in vs
    ) / (N * (k - 1))
    icc = (msb - msw) / (msb + (k - 1) * msw)
    assert out["n_subjects"] == N and out["k_items"] == k
    assert out["ms_between"] == pytest.approx(msb, rel=1e-12)
    assert out["ms_within"] == pytest.approx(msw, rel=1e-12)
    assert out["icc"] == pytest.approx(icc, rel=1e-12)
    assert out["icc"] > 0.9  # the planted subject effect dominates



def _q9(x):
    """Replay the r12 determinism contract: quantize a libm value to
    the 1e-9 decimal grid (HALF_UP — what Spark's ROUND computes)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("1e-9"), ROUND_HALF_UP))

def test_hurst_rs_matches_reference(spark):
    import math

    # deterministic "seasonal-ish" integer series, long enough for
    # full blocks at w=4 and w=8
    vals = [((i * 37) % 11) * 3 + (i % 5) * 7 + 10 for i in range(40)]
    rows = [(i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "t long, v long")
    from etl_java_spark.operators.timeseries import hurst_rs

    out = {
        r["w"]: r
        for r in hurst_rs(df, "t", "v", window_sizes=(4, 8)).collect()
    }

    def rs_stats(w):
        rss = []
        for b in range(len(vals) // w):
            blk = vals[b * w : (b + 1) * w]
            s, ss = sum(blk), sum(x * x for x in blk)
            if w * ss - s * s <= 0:
                continue
            devs = []
            pre = 0
            for j, x in enumerate(blk, start=1):
                pre += x
                devs.append(w * pre - j * s)
            rss.append((max(devs) - min(devs)) / math.sqrt(w * ss - s * s))
        return rss

    # r12 determinism contract: ln terms quantize to the 1e-9 grid
    # before the OLS moment sums (the q434 lesson)
    from decimal import ROUND_HALF_UP, Decimal

    def q9(x):
        return float(
            Decimal(x).quantize(Decimal("1e-9"), ROUND_HALF_UP)
        )

    pts = []
    for w in (4, 8):
        rss = rs_stats(w)
        avg = sum(rss) / len(rss)
        assert out[w]["n_blocks"] == len(rss)
        assert out[w]["rs_avg"] == pytest.approx(avg, rel=1e-12)
        pts.append((q9(math.log(w)), q9(math.log(avg))))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out[4]["hurst"] == pytest.approx(slope, rel=1e-12)
    assert out[4]["hurst"] == out[8]["hurst"]


def test_textrank_matches_reference(spark):
    docs = [
        ("alpha beta gamma alpha beta",),
        ("gamma delta alpha",),
        ("beta gamma beta gamma",),
        ("xx",),  # short tokens dropped entirely at min_len=4
    ]
    df = spark.createDataFrame(docs, "text string")
    from etl_java_spark.operators.retrieval import textrank_keywords

    out = {
        r["word"]: r["score"]
        for r in textrank_keywords(
            df, "text", iterations=3, top_k=10, min_len=4
        ).collect()
    }

    # reference replay
    import re
    from collections import defaultdict

    edges = set()
    for (t,) in docs:
        tk = [
            x
            for x in re.split("[^a-z0-9]+", t.strip().lower())
            if x and len(x) >= 4
        ]
        for a, b in zip(tk, tk[1:]):
            if a != b:
                edges.add((a, b))
                edges.add((b, a))
    nodes = {n for e in edges for n in e}
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    r = {n: 1.0 for n in nodes}
    for _ in range(3):
        nxt = {}
        for v in nodes:
            acc = sum(
                r[u] / outdeg[u] for (u, w) in edges if w == v
            )
            nxt[v] = 0.15 + 0.85 * acc
        r = nxt
    assert set(out) == nodes  # "xx" never enters the graph
    for w_, sc in r.items():
        assert out[w_] == pytest.approx(sc, rel=1e-9)


def test_kcenter_coreset_matches_reference(spark):
    pts = {
        1: [0.0, 0.0], 2: [0.1, 0.0], 3: [10.0, 0.0], 4: [10.0, 0.2],
        5: [0.0, 9.0], 6: [5.0, 5.0],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in pts.items()], "vec_id long, embedding array<double>"
    )
    from etl_java_spark.operators.similarity import kcenter_coreset

    got = [
        (r["sel_round"], r["id"], r["dist2"])
        for r in kcenter_coreset(df, "embedding", "vec_id", k=4).collect()
    ]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    sel = [min(pts)]  # seed = smallest id
    rows = [(0, sel[0], 0.0)]
    for r in range(1, 4):
        best = None
        for i, v in sorted(pts.items()):
            if i in sel:
                continue
            dd = min(d2(v, pts[s]) for s in sel)
            if best is None or dd > best[1]:
                best = (i, dd)
        sel.append(best[0])
        rows.append((r, best[0], best[1]))
    assert got == rows
    # farthest-first: the coverage-radius sequence never increases
    dists = [d for _, _, d in got[1:]]
    assert dists == sorted(dists, reverse=True)


def test_cliffs_delta_matches_brute_force(spark):
    rows = [("a", v) for v in [3, 5, 5, 9]] + [
        ("b", v) for v in [1, 5, 6, 6, 2]
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    from etl_java_spark.operators.experiments import cliffs_delta

    out = cliffs_delta(df, "grp", "v", "a", "b").collect()[0]
    xa = [v for g, v in rows if g == "a"]
    xb = [v for g, v in rows if g == "b"]
    gt = sum(1 for x in xa for y in xb if x > y)
    lt = sum(1 for x in xa for y in xb if x < y)
    eq = sum(1 for x in xa for y in xb if x == y)
    assert (out["n_gt"], out["n_lt"], out["n_eq"]) == (gt, lt, eq)
    assert out["delta"] == pytest.approx(
        (gt - lt) / (len(xa) * len(xb)), rel=1e-12
    )
    assert out["a_measure"] == pytest.approx(
        (gt + 0.5 * eq) / (len(xa) * len(xb)), rel=1e-12
    )
    # complete dominance -> delta = 1, A = 1
    dom = spark.createDataFrame(
        [("a", 10), ("a", 11), ("b", 1), ("b", 2)], "grp string, v long"
    )
    r = cliffs_delta(dom, "grp", "v", "a", "b").collect()[0]
    assert r["delta"] == 1.0 and r["a_measure"] == 1.0


def test_energy_distance_matches_brute_force(spark):
    rows = [("a", v) for v in [1, 4, 4, 7]] + [
        ("b", v) for v in [2, 2, 9]
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    from etl_java_spark.operators.experiments import energy_distance

    out = energy_distance(df, "grp", "v", "a", "b").collect()[0]
    xa = [v for g, v in rows if g == "a"]
    xb = [v for g, v in rows if g == "b"]

    def mean_abs(xs, ys):
        return sum(abs(x - y) for x in xs for y in ys) / (
            len(xs) * len(ys)
        )

    e_xy, e_xx, e_yy = (
        mean_abs(xa, xb), mean_abs(xa, xa), mean_abs(xb, xb)
    )
    assert out["e_xy"] == pytest.approx(e_xy, rel=1e-12)
    assert out["e_xx"] == pytest.approx(e_xx, rel=1e-12)
    assert out["e_yy"] == pytest.approx(e_yy, rel=1e-12)
    assert out["energy"] == pytest.approx(
        2 * e_xy - e_xx - e_yy, rel=1e-12
    )
    # identical distributions -> exactly 0
    same = spark.createDataFrame(
        [("a", 3), ("a", 8), ("b", 3), ("b", 8)], "grp string, v long"
    )
    assert energy_distance(same, "grp", "v", "a", "b").collect()[0][
        "energy"
    ] == 0.0


def test_quade_matches_reference(spark):
    # 4 blocks x 3 treatments, distinct ranges so weights matter
    cells = {
        ("b1", "t0"): 1, ("b1", "t1"): 5, ("b1", "t2"): 9,
        ("b2", "t0"): 2, ("b2", "t1"): 3, ("b2", "t2"): 4,
        ("b3", "t0"): 7, ("b3", "t1"): 7, ("b3", "t2"): 8,
        ("b4", "t0"): 10, ("b4", "t1"): 2, ("b4", "t2"): 6,
    }
    df = spark.createDataFrame(
        [(b, t, v) for (b, t), v in cells.items()],
        "blk string, trt string, v long",
    )
    from etl_java_spark.operators.experiments import quade_test

    out = quade_test(df, "blk", "trt", "v").collect()[0]

    from collections import defaultdict

    blocks = sorted({b for b, _ in cells})
    trts = sorted({t for _, t in cells})
    n, k = len(blocks), len(trts)

    def midrank(vals, x):
        return sum(1 for u in vals if u < x) + (
            sum(1 for u in vals if u == x) + 1
        ) / 2

    rng = {
        b: max(cells[(b, t)] for t in trts)
        - min(cells[(b, t)] for t in trts)
        for b in blocks
    }
    q = {b: midrank(list(rng.values()), rng[b]) for b in blocks}
    s = defaultdict(float)
    a_sum = 0.0
    for b in blocks:
        vals = [cells[(b, t)] for t in trts]
        for t in trts:
            sij = q[b] * (midrank(vals, cells[(b, t)]) - (k + 1) / 2)
            s[t] += sij
            a_sum += sij * sij
    b_sum = sum(x * x for x in s.values()) / n
    t3 = (n - 1) * b_sum / (a_sum - b_sum)
    assert out["n_blocks"] == n and out["k_treatments"] == k
    assert out["t_stat"] == pytest.approx(t3, rel=1e-12)


def test_vocab_richness_matches_reference(spark):
    docs = [
        ("apple banana apple cherry",),
        ("banana date egg egg fig",),
    ]
    df = spark.createDataFrame(docs, "text string")
    from etl_java_spark.operators.corpus import vocab_richness

    out = vocab_richness(df, "text").collect()[0]
    # counts: apple 2, banana 2, cherry 1, date 1, egg 2, fig 1
    assert out["n_tokens"] == 9 and out["n_distinct"] == 6
    assert (out["f1"], out["f2"]) == (3, 3)
    assert out["chao1"] == pytest.approx(6 + 3 * 2 / (2 * 4), rel=1e-12)
    assert out["p_unseen"] == pytest.approx(3 / 9, rel=1e-12)
    # every token unique -> huge chao1, p_unseen = 1
    uni = spark.createDataFrame([("aa bb cc",)], "text string")
    r = vocab_richness(uni, "text").collect()[0]
    assert r["p_unseen"] == 1.0 and r["chao1"] == pytest.approx(
        3 + 3 * 2 / 2, rel=1e-12
    )


def test_capture_recapture_matches_reference(spark):
    docs = [
        ("s1", "tok1 tok2 tok3 tok4"),
        ("s1", "tok2 tok5"),
        ("s2", "tok2 tok3 tok9"),
        ("s3", "never counted words"),
    ]
    df = spark.createDataFrame(docs, "src string, text string")
    from etl_java_spark.operators.corpus import capture_recapture

    out = capture_recapture(df, "text", "src", "s1", "s2").collect()[0]
    # vocab(s1) = 5, vocab(s2) = 3, overlap = {tok2, tok3} = 2
    assert (out["n_a"], out["n_b"], out["n_overlap"]) == (5, 3, 2)
    assert out["lincoln"] == pytest.approx(5 * 3 / 2, rel=1e-12)
    assert out["chapman"] == pytest.approx(6 * 4 / 3 - 1, rel=1e-12)
    # disjoint vocabularies: lincoln NULL, chapman finite
    dj = spark.createDataFrame(
        [("s1", "aaa bbb"), ("s2", "ccc ddd")], "src string, text string"
    )
    r = capture_recapture(dj, "text", "src", "s1", "s2").collect()[0]
    assert r["lincoln"] is None
    assert r["chapman"] == pytest.approx(3 * 3 / 1 - 1, rel=1e-12)


def test_heaps_fit_matches_reference(spark):
    import math

    docs = [
        (i, " ".join(f"w{(i * 7 + j) % 19}" for j in range(6)))
        for i in range(12)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from etl_java_spark.operators.corpus import heaps_fit

    B = 4
    rows = heaps_fit(df, "doc_id", "text", n_buckets=B).collect()

    # reference replay: id-range buckets, cumulative tokens/vocab
    mn, mx = 0, 11
    from collections import defaultdict

    per_b_tokens = defaultdict(list)
    for i, t in docs:
        b = int(B * (i - mn) / (mx - mn + 1))
        per_b_tokens[b].extend(t.split())
    seen, pts = set(), []
    n_cum = 0
    for b in sorted(per_b_tokens):
        toks = per_b_tokens[b]
        n_cum += len(toks)
        seen |= set(toks)
        pts.append((b, n_cum, len(seen)))
    got = [(r["bucket"], r["n_cum"], r["v_cum"]) for r in rows]
    assert got == pts
    # the r12 determinism contract: each ln term quantizes to the
    # 1e-9 decimal grid (HALF_UP on the double's exact value — what
    # Spark's ROUND+decimal(12,9) cast computes) BEFORE the exact
    # order-free decimal sums; beta/k are one double tree after.
    from decimal import ROUND_HALF_UP, Decimal

    g = Decimal("1e-9")
    xs = [
        Decimal(math.log(n)).quantize(g, ROUND_HALF_UP) for _, n, _ in pts
    ]
    ys = [
        Decimal(math.log(v)).quantize(g, ROUND_HALF_UP) for _, _, v in pts
    ]
    n = float(len(pts))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    sxx = float(sum(x * x for x in xs))
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    k = math.exp((sy - beta * sx) / n)
    assert rows[0]["beta"] == pytest.approx(beta, rel=1e-12)
    assert rows[0]["k_coef"] == pytest.approx(k, rel=1e-12)
    # vocabulary growth is sublinear on a reused vocab: beta < 1
    assert 0 < rows[0]["beta"] < 1


def test_term_burstiness_matches_reference(spark):
    # "bursty" appears 9x in one doc; "flat" once in each of 3 docs
    docs = [
        (1, "bursty " * 9 + "flat pad1 pad2"),
        (2, "flat pad1 pad3 pad4"),
        (3, "flat pad2 pad3 pad5"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from etl_java_spark.operators.corpus import term_burstiness

    out = {
        r["term"]: r
        for r in term_burstiness(
            df, "doc_id", "text", top_k=10, min_df=1
        ).collect()
    }
    D = 3
    # bursty: counts (9,0,0): tf=9, c2=81 -> vmr=(81-27)/9=6
    assert out["bursty"]["df"] == 1 and out["bursty"]["tf"] == 9
    assert out["bursty"]["vmr"] == pytest.approx(
        (81 - 81 / D) / 9, rel=1e-12
    )
    # flat: (1,1,1): vmr = (3 - 3)/3 = 0 (perfectly even)
    assert out["flat"]["vmr"] == 0.0
    assert out["bursty"]["vmr"] > out["flat"]["vmr"]


def test_holm_bonferroni_matches_reference(spark):
    ps = [("h1", 0.001), ("h2", 0.01), ("h3", 0.03), ("h4", 0.04),
          ("h5", 0.9)]
    df = spark.createDataFrame(ps, "h string, p double")
    from etl_java_spark.operators.experiments import holm_bonferroni

    out = {
        r["h"]: r
        for r in holm_bonferroni(df, ["h"], "p", alpha=0.05).collect()
    }
    # m=5: thresholds 0.01, 0.0125, 1/60, 0.025, 0.05
    # h1: 0.001<=0.01 ok; h2: 0.01<=0.0125 ok; h3: 0.03>1/60 FAIL
    # -> reject exactly h1, h2 (step-down stops at first failure,
    #    even though h4 0.04 <= 0.025 is false and h5 fails too)
    assert out["h1"]["reject"] and out["h2"]["reject"]
    assert not out["h3"]["reject"] and not out["h4"]["reject"]
    assert not out["h5"]["reject"]
    assert out["h3"]["holm_rank"] == 3
    assert out["h2"]["holm_threshold"] == pytest.approx(0.05 / 4)
    # everything significant -> all rejected (first_fail NULL path)
    allp = spark.createDataFrame(
        [("a", 0.0001), ("b", 0.0002)], "h string, p double"
    )
    assert all(
        r["reject"]
        for r in holm_bonferroni(allp, ["h"], "p", alpha=0.05).collect()
    )


def test_skew_kurtosis_matches_reference(spark):
    import math

    vals = {"a": [1, 2, 2, 3, 14], "b": [5, 5, 5, 5]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    from etl_java_spark.operators.dq import skew_kurtosis

    out = {r["grp"]: r for r in skew_kurtosis(df, "g", "v").collect()}
    xs = vals["a"]
    n = len(xs)
    mean = sum(xs) / n
    m2 = sum((x - mean) ** 2 for x in xs) / n
    m3 = sum((x - mean) ** 3 for x in xs) / n
    m4 = sum((x - mean) ** 4 for x in xs) / n
    assert out["a"]["mean"] == pytest.approx(mean, rel=1e-12)
    assert out["a"]["m2"] == pytest.approx(m2, rel=1e-12)
    assert out["a"]["skewness"] == pytest.approx(
        m3 / math.sqrt(m2**3), rel=1e-12
    )
    assert out["a"]["kurtosis_excess"] == pytest.approx(
        m4 / m2**2 - 3, rel=1e-12
    )
    assert out["a"]["skewness"] > 0  # planted right tail
    # constant column: m2 = 0 -> NULL shape stats, never a crash
    assert out["b"]["m2"] == 0.0
    assert out["b"]["skewness"] is None


def test_adamic_adar_matches_reference(spark):
    import math

    # path graph 1-2-3 plus hub 9 connected to 1,3,4,5:
    # pair (1,3) has shared neighbors 2 (deg 2) and 9 (deg 4)
    edges = [(1, 2), (2, 3), (9, 1), (9, 3), (9, 4), (9, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    from etl_java_spark.operators.graph import adamic_adar

    rows = {
        (r["node_u"], r["node_v"]): r
        for r in adamic_adar(df, topk=50).collect()
    }
    # r12 determinism contract: the 1/ln(deg) weight quantizes to
    # the 1e-9 grid at construction (the q434 lesson)
    from decimal import ROUND_HALF_UP, Decimal

    def w9(d):
        return float(
            Decimal(1 / math.log(d)).quantize(
                Decimal("1e-9"), ROUND_HALF_UP
            )
        )

    r13 = rows[(1, 3)]
    assert r13["cn"] == 2
    assert r13["aa"] == pytest.approx(w9(2) + w9(4), rel=1e-12)
    # wedge through the hub only: weight 1/ln(4) each
    assert rows[(1, 4)]["aa"] == pytest.approx(w9(4), rel=1e-12)
    # existing edges never appear
    assert (1, 2) not in rows and (2, 3) not in rows
    # rare-neighbor weighting: (1,3) outranks every hub-only pair
    assert r13["aa"] > rows[(1, 4)]["aa"]


def test_optimal_threshold_matches_brute_force(spark):
    rows = [(1, 0)] * 10 + [(2, 0)] * 5 + [(2, 1)] * 2 + [(3, 1)] * 6 + [
        (4, 1)
    ] * 3 + [(4, 0)] * 1
    df = spark.createDataFrame(rows, "s long, y int")
    from etl_java_spark.operators.evaluation import optimal_threshold

    out = optimal_threshold(df, "s", "y", cost_fp=1.0, cost_fn=5.0).collect()[
        0
    ]

    def cost_at(t):
        fp = sum(1 for s, y in rows if y == 0 and s >= t)
        fn = sum(1 for s, y in rows if y == 1 and s < t)
        return fp + 5.0 * fn, fp, fn

    cands = sorted({s for s, _ in rows})
    best = min(
        [(cost_at(t)[0], -t, t) for t in cands]
        + [(5.0 * sum(y for _, y in rows), float("inf"), None)]
    )
    want_cost, _, want_t = best
    assert out["best_threshold"] == want_t
    assert out["cost"] == pytest.approx(want_cost, rel=1e-12)
    _, fp, fn = cost_at(want_t)
    assert (out["fp"], out["fn"]) == (fp, fn)
    # all-negative labels: predicting nothing is free and optimal
    neg = spark.createDataFrame([(1, 0), (5, 0)], "s long, y int")
    r = optimal_threshold(neg, "s", "y").collect()[0]
    assert r["best_threshold"] is None and r["cost"] == 0.0


def test_g_test_matches_reference(spark):
    import math

    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 2
        + [("y", "p")] * 3 + [("y", "q")] * 9
    )
    df = spark.createDataFrame(rows, "a string, b string")
    from etl_java_spark.operators.experiments import g_test

    out = g_test(df, "a", "b").collect()[0]
    from collections import Counter

    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    g = 2 * sum(
        o * math.log(o / (ra[a] * cb[b] / n))
        for (a, b), o in cells.items()
    )
    assert out["n_rows"] == n
    assert out["g_stat"] == pytest.approx(g, rel=1e-12)
    assert out["p_value"] is None  # df=1 (odd) -> statistic only
    # even declared df with matching design: 3x3 -> df=4
    r9 = [
        (a, b)
        for a in "abc"
        for b in "pqr"
        for _ in range((ord(a) + ord(b)) % 5 + 1)
    ]
    d9 = spark.createDataFrame(r9, "a string, b string")
    r = g_test(d9, "a", "b", expected_df=4).collect()[0]
    assert r["p_value"] is not None and 0 <= r["p_value"] <= 1
    # declared df mismatching the observed design NULLs the p
    r = g_test(d9, "a", "b", expected_df=6).collect()[0]
    assert r["p_value"] is None


def test_poisson_two_rate_matches_reference(spark):
    import math

    per = spark.createDataFrame(
        [("h1", 30), ("h2", 18)], "half string, x long"
    )
    from etl_java_spark.operators.experiments import poisson_two_rate

    out = poisson_two_rate(per, "half", "x", "h1", "h2", 10, 10).collect()[
        0
    ]
    X, p0 = 48, 0.5
    z = (30 - X * p0) / math.sqrt(X * p0 * (1 - p0))
    assert (out["x_a"], out["x_b"], out["t_a"], out["t_b"]) == (
        30, 18, 10, 10,
    )
    assert out["z"] == pytest.approx(z, rel=1e-12)
    # unequal exposures shift the null proportion
    out2 = poisson_two_rate(per, "half", "x", "h1", "h2", 30, 10).collect()[
        0
    ]
    p0 = 0.75
    z2 = (30 - X * p0) / math.sqrt(X * p0 * (1 - p0))
    assert out2["z"] == pytest.approx(z2, rel=1e-12)


def test_risk_odds_ratio_matches_reference(spark):
    import math

    rows = [("a", 1)] * 12 + [("a", 0)] * 28 + [("b", 1)] * 5 + [
        ("b", 0)
    ] * 35
    df = spark.createDataFrame(rows, "g string, y int")
    from etl_java_spark.operators.experiments import risk_odds_ratio

    out = risk_odds_ratio(df, "g", "y", "a", "b").collect()[0]
    na, xa, nb, xb = 40, 12, 40, 5
    rr = (xa / na) / (xb / nb)
    se_rr = math.sqrt(1 / xa - 1 / na + 1 / xb - 1 / nb)
    orr = xa * (nb - xb) / (xb * (na - xa))
    se_or = math.sqrt(1 / xa + 1 / (na - xa) + 1 / xb + 1 / (nb - xb))
    zc = 1.959963984540054
    assert out["rr"] == pytest.approx(rr, rel=1e-12)
    assert out["rr_lo"] == pytest.approx(
        math.exp(math.log(rr) - zc * se_rr), rel=1e-12
    )
    assert out["or_"] == pytest.approx(orr, rel=1e-12)
    assert out["or_hi"] == pytest.approx(
        math.exp(math.log(orr) + zc * se_or), rel=1e-12
    )
    # a CI that includes 1 iff the effect is compatible with null:
    # here rr > 1 with a wide but positive CI
    assert out["rr_lo"] < rr < out["rr_hi"]


def test_cmh_matches_reference(spark):
    import math

    # two strata with opposite marginal sizes (Simpson-style setup)
    rows = []
    for st, cells in {
        "s1": {("t", 1): 8, ("t", 0): 2, ("c", 1): 5, ("c", 0): 5},
        "s2": {("t", 1): 3, ("t", 0): 7, ("c", 1): 1, ("c", 0): 9},
    }.items():
        for (g, y), k in cells.items():
            rows += [(st, g, y)] * k
    df = spark.createDataFrame(rows, "st string, g string, y int")
    from etl_java_spark.operators.experiments import cmh_test

    out = cmh_test(df, "st", "g", "y", "t", "c").collect()[0]
    sa = se = sv = s_ad = s_bc = 0.0
    for st in ("s1", "s2"):
        a = sum(1 for s, g, y in rows if s == st and g == "t" and y == 1)
        b = sum(1 for s, g, y in rows if s == st and g == "t" and y == 0)
        c = sum(1 for s, g, y in rows if s == st and g == "c" and y == 1)
        d = sum(1 for s, g, y in rows if s == st and g == "c" and y == 0)
        n = a + b + c + d
        sa += a
        se += (a + b) * (a + c) / n
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        s_ad += a * d / n
        s_bc += b * c / n
    z = (sa - se) / math.sqrt(sv)
    assert out["n_strata"] == 2 and out["sum_a"] == sa
    assert out["sum_e"] == pytest.approx(se, rel=1e-12)
    assert out["z"] == pytest.approx(z, rel=1e-12)
    assert out["or_mh"] == pytest.approx(s_ad / s_bc, rel=1e-12)


def test_covariate_balance_matches_reference(spark):
    import math

    rows = [("t", 10, 100), ("t", 12, 110), ("t", 14, 120),
            ("c", 9, 101), ("c", 11, 99), ("c", 13, 130), ("c", 15, 90)]
    df = spark.createDataFrame(rows, "g string, x1 long, x2 long")
    from etl_java_spark.operators.experiments import covariate_balance

    out = {
        r["covariate"]: r
        for r in covariate_balance(df, "g", "t", "c", ["x1", "x2"]).collect()
    }

    def svar(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    for i, cov in ((1, "x1"), (2, "x2")):
        xt = [r[i] for r in rows if r[0] == "t"]
        xc = [r[i] for r in rows if r[0] == "c"]
        smd = (sum(xt) / len(xt) - sum(xc) / len(xc)) / math.sqrt(
            (svar(xt) + svar(xc)) / 2
        )
        assert out[cov]["smd"] == pytest.approx(smd, rel=1e-12)
        assert out[cov]["n_t"] == 3 and out[cov]["n_c"] == 4
    # identical arms balance exactly to 0
    same = spark.createDataFrame(
        [("t", 5), ("t", 7), ("c", 5), ("c", 7)], "g string, x1 long"
    )
    assert covariate_balance(same, "g", "t", "c", ["x1"]).collect()[0][
        "smd"
    ] == 0.0


def test_paired_t_matches_reference(spark):
    import math

    pairs = [(10, 8), (12, 11), (9, 9), (14, 10), (7, 8)]
    df = spark.createDataFrame(pairs, "a long, b long")
    from etl_java_spark.operators.experiments import paired_t

    out = paired_t(df, "a", "b").collect()[0]
    ds = [a - b for a, b in pairs]
    n = len(ds)
    mean = sum(ds) / n
    var = sum((d - mean) ** 2 for d in ds) / (n - 1)
    t = mean / math.sqrt(var / n)
    assert out["n_pairs"] == n
    assert out["mean_diff"] == pytest.approx(mean, rel=1e-12)
    assert out["t_stat"] == pytest.approx(t, rel=1e-12)
    # NULL-sided pairs are excluded before differencing
    withnull = spark.createDataFrame(
        [(10, 8), (None, 5), (12, None)], "a long, b long"
    )
    r = paired_t(withnull, "a", "b").collect()[0]
    assert r["n_pairs"] == 1
    assert r["t_stat"] is None  # a single pair has no variance


def test_dunn_posthoc_matches_reference(spark):
    import math

    vals = {"a": [1, 2, 2, 5], "b": [3, 3, 4], "c": [6, 7, 7, 8, 9]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    from etl_java_spark.operators.experiments import dunn_posthoc

    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in dunn_posthoc(df, "g", "v").collect()
    }
    pooled = sorted(v for vs in vals.values() for v in vs)
    N = len(pooled)

    def midrank(x):
        return sum(1 for u in pooled if u < x) + (
            sum(1 for u in pooled if u == x) + 1
        ) / 2

    from collections import Counter

    ties = Counter(pooled)
    T = sum(t**3 - t for t in ties.values())
    mb = {g: sum(midrank(v) for v in vs) / len(vs) for g, vs in vals.items()}
    m = 3  # pairs
    for ga, gb in (("a", "b"), ("a", "c"), ("b", "c")):
        var = (N * (N + 1) / 12 - T / (12 * (N - 1))) * (
            1 / len(vals[ga]) + 1 / len(vals[gb])
        )
        z = (mb[ga] - mb[gb]) / math.sqrt(var)
        assert out[(ga, gb)]["z"] == pytest.approx(z, rel=1e-12)
        # bonferroni caps at 1
        assert out[(ga, gb)]["p_bonf"] <= 1.0


def test_stuart_maxwell_matches_reference(spark):
    # planted marginal drift: a leans to 'x', b leans to 'z'
    cells = {("x", "x"): 20, ("x", "y"): 10, ("x", "z"): 14,
             ("y", "x"): 4, ("y", "y"): 12, ("y", "z"): 9,
             ("z", "x"): 2, ("z", "y"): 3, ("z", "z"): 16}
    rows = [(a, b) for (a, b), k in cells.items() for _ in range(k)]
    df = spark.createDataFrame(rows, "a string, b string")
    from etl_java_spark.operators.experiments import stuart_maxwell_3

    out = stuart_maxwell_3(df, "a", "b").collect()[0]
    import math

    n = {}
    for i, ca in enumerate("xyz", 1):
        for j, cb in enumerate("xyz", 1):
            n[(i, j)] = cells.get((ca, cb), 0)
    d = [
        sum(n[(i, j)] for j in (1, 2, 3))
        - sum(n[(j, i)] for j in (1, 2, 3))
        for i in (1, 2, 3)
    ]
    m12 = n[(1, 2)] + n[(2, 1)]
    m13 = n[(1, 3)] + n[(3, 1)]
    m23 = n[(2, 3)] + n[(3, 2)]
    chi2 = (m23 * d[0] ** 2 + m13 * d[1] ** 2 + m12 * d[2] ** 2) / (
        m12 * m13 + m12 * m23 + m13 * m23
    )
    assert out["n_pairs"] == sum(cells.values())
    assert out["chi2"] == pytest.approx(chi2, rel=1e-12)
    assert out["p_value"] == pytest.approx(math.exp(-chi2 / 2), rel=1e-12)
    assert out["p_value"] < 0.01  # the planted drift is detected


def test_weighted_kappa_matches_reference(spark):
    cells = {("1", "1"): 8, ("1", "2"): 3, ("2", "2"): 7, ("2", "3"): 2,
             ("3", "3"): 6, ("3", "1"): 1}
    rows = [(a, b) for (a, b), k in cells.items() for _ in range(k)]
    df = spark.createDataFrame(rows, "a string, b string")
    from etl_java_spark.operators.evaluation import weighted_kappa

    out = weighted_kappa(df, "a", "b", weights="quadratic").collect()[0]
    cats = sorted({c for ab in cells for c in ab})
    ix = {c: i + 1 for i, c in enumerate(cats)}
    n = sum(cells.values())
    swo = sum(
        (ix[a] - ix[b]) ** 2 * k for (a, b), k in cells.items()
    )
    from collections import Counter

    ri = Counter()
    cj = Counter()
    for (a, b), k in cells.items():
        ri[ix[a]] += k
        cj[ix[b]] += k
    swrc = sum(
        (i - j) ** 2 * ri[i] * cj[j] for i in ri for j in cj
    )
    kw = 1 - n * swo / swrc
    assert out["n_pairs"] == n and out["k_levels"] == 3
    assert out["kappa_w"] == pytest.approx(kw, rel=1e-12)
    # perfect agreement -> 1 exactly
    perf = spark.createDataFrame(
        [("1", "1"), ("2", "2"), ("3", "3")] * 3, "a string, b string"
    )
    assert weighted_kappa(perf, "a", "b").collect()[0]["kappa_w"] == 1.0


def test_kendalls_w_matches_reference_and_friedman_identity(spark):
    cells = {
        (b, t): ((i * 31 + j * 17) % 23) + (5 if t == "t1" else 0)
        for i, b in enumerate(["b1", "b2", "b3", "b4", "b5", "b6"])
        for j, t in enumerate(["t0", "t1", "t2"])
    }
    df = spark.createDataFrame(
        [(b, t, v) for (b, t), v in cells.items()],
        "blk string, trt string, v long",
    )
    from etl_java_spark.operators.experiments import (
        friedman_test,
        kendalls_w,
    )

    w = kendalls_w(df, "blk", "trt", "v").collect()[0]
    q = friedman_test(df, "blk", "trt", "v").collect()[0]
    m, k = w["n_blocks"], w["k_treatments"]
    assert (m, k) == (6, 3)
    # hand formula (doubled midranks)
    from collections import defaultdict, Counter

    by_blk = defaultdict(dict)
    for (b, t), v in cells.items():
        by_blk[b][t] = v
    r2j = defaultdict(int)
    t3 = 0
    for b, row in by_blk.items():
        vals = list(row.values())
        for t, v in row.items():
            r2j[t] += (
                2 * sum(1 for u in vals if u < v)
                + sum(1 for u in vals if u == v)
                + 1
            )
        t3 += sum(c**3 - c for c in Counter(vals).values())
    sr2 = sum(r * r for r in r2j.values())
    want = (
        3 * (sr2 - m * m * k * (k + 1) ** 2)
        / (m * m * (k**3 - k) - m * t3)
    )
    assert w["w_coef"] == pytest.approx(want, rel=1e-12)
    assert 0 <= w["w_coef"] <= 1
    # Friedman identity: Q = m (k-1) W (tie-corrected forms agree)
    assert q["q_stat"] == pytest.approx(
        m * (k - 1) * w["w_coef"], rel=1e-12
    )


def test_lins_ccc_matches_reference(spark):
    pairs = [(10, 12), (20, 24), (30, 33), (40, 45), (50, 52)]
    df = spark.createDataFrame(pairs, "x long, y long")
    from etl_java_spark.operators.experiments import lins_ccc

    out = lins_ccc(df, "x", "y").collect()[0]
    n = len(pairs)
    mx = sum(x for x, _ in pairs) / n
    my = sum(y for _, y in pairs) / n
    vx = sum((x - mx) ** 2 for x, _ in pairs) / n
    vy = sum((y - my) ** 2 for _, y in pairs) / n
    cxy = sum((x - mx) * (y - my) for x, y in pairs) / n
    import math

    assert out["pearson_r"] == pytest.approx(
        cxy / math.sqrt(vx * vy), rel=1e-12
    )
    assert out["ccc"] == pytest.approx(
        2 * cxy / (vx + vy + (mx - my) ** 2), rel=1e-12
    )
    # scale-shifted but perfectly correlated: r = 1, CCC < 1
    shift = spark.createDataFrame(
        [(v, 2 * v) for v in (1, 2, 3, 4)], "x long, y long"
    )
    r = lins_ccc(shift, "x", "y").collect()[0]
    assert r["pearson_r"] == pytest.approx(1.0, rel=1e-12)
    assert r["ccc"] < 0.7
    # identity -> CCC = 1
    ident = spark.createDataFrame(
        [(v, v) for v in (1, 5, 9)], "x long, y long"
    )
    assert lins_ccc(ident, "x", "y").collect()[0]["ccc"] == pytest.approx(
        1.0, rel=1e-12
    )


def test_bland_altman_matches_reference(spark):
    import math

    pairs = [(10, 8), (12, 11), (9, 10), (14, 10), (7, 8), (11, 11),
             (30, 10)]  # one wild outlier outside the band
    df = spark.createDataFrame(pairs, "a long, b long")
    from etl_java_spark.operators.experiments import bland_altman

    out = bland_altman(df, "a", "b").collect()[0]
    ds = [a - b for a, b in pairs]
    n = len(ds)
    bias = sum(ds) / n
    sd = math.sqrt(sum((d - bias) ** 2 for d in ds) / (n - 1))
    zc = 1.959963984540054
    assert out["bias"] == pytest.approx(bias, rel=1e-12)
    assert out["sd_diff"] == pytest.approx(sd, rel=1e-12)
    assert out["loa_lo"] == pytest.approx(bias - zc * sd, rel=1e-12)
    within = sum(
        1 for d in ds if bias - zc * sd <= d <= bias + zc * sd
    )
    assert out["pct_within"] == pytest.approx(within / n, rel=1e-12)
    assert out["pct_within"] < 1.0  # the outlier escapes the band


def test_yules_k_matches_reference(spark):
    docs = [("aa bb aa cc aa bb dd",), ("aa ee",)]
    df = spark.createDataFrame(docs, "text string")
    from etl_java_spark.operators.corpus import yules_k

    out = yules_k(df, "text").collect()[0]
    from collections import Counter

    cnt = Counter(w for t, in docs for w in t.split())
    N = sum(cnt.values())
    sc2 = sum(c * c for c in cnt.values())
    assert out["n_tokens"] == N and out["n_distinct"] == len(cnt)
    assert out["yules_k"] == pytest.approx(
        1e4 * (sc2 - N) / (N * N), rel=1e-12
    )
    # all-unique vocabulary -> K = 0 exactly
    uni = spark.createDataFrame([("a1 b2 c3 d4",)], "text string")
    assert yules_k(uni, "text").collect()[0]["yules_k"] == 0.0


def test_conditional_entropy_matches_reference(spark):
    import math

    docs = [("a b a b a c",), ("b a b",), ("zz",)]
    df = spark.createDataFrame(docs, "text string")
    from etl_java_spark.operators.corpus import conditional_entropy

    out = conditional_entropy(df, "text").collect()[0]
    from collections import Counter

    big = Counter()
    for t, in docs:
        tk = t.split()
        big.update(zip(tk, tk[1:]))
    uni = Counter()
    for (x, _), c in big.items():
        uni[x] += c
    n = sum(big.values())
    # mirror the r12-hardened operator: the ln factor quantizes to the
    # 1e-9 grid BEFORE the c* multiply and the order-free sum
    q9 = lambda v: round(v, 9)  # noqa: E731
    h = (
        sum(c * q9(math.log(c)) for c in uni.values())
        - sum(c * q9(math.log(c)) for c in big.values())
    ) / (n * math.log(2))
    assert out["n_bigrams"] == n
    assert out["n_contexts"] == len(uni)
    assert out["h_cond_bits"] == pytest.approx(h, rel=1e-12)
    # fully deterministic chain -> 0 bits
    det = spark.createDataFrame([("x y x y x y",)], "text string")
    assert conditional_entropy(det, "text").collect()[0][
        "h_cond_bits"
    ] == pytest.approx(0.0, abs=1e-15)


def test_gwets_ac1_matches_reference_and_prevalence(spark):
    cells = {("p", "p"): 90, ("p", "n"): 4, ("n", "p"): 3, ("n", "n"): 3}
    rows = [(a, b) for (a, b), k in cells.items() for _ in range(k)]
    df = spark.createDataFrame(rows, "a string, b string")
    from etl_java_spark.operators.evaluation import (
        cohens_kappa,
        gwets_ac1,
    )

    out = gwets_ac1(df, "a", "b").collect()[0]
    n = sum(cells.values())
    po = (cells[("p", "p")] + cells[("n", "n")]) / n
    pi_p = (94 + 93) / (2 * n)
    pi_n = (6 + 7) / (2 * n)
    pe = (pi_p * (1 - pi_p) + pi_n * (1 - pi_n)) / (2 - 1)
    assert out["p_o"] == pytest.approx(po, rel=1e-12)
    assert out["p_e"] == pytest.approx(pe, rel=1e-12)
    assert out["ac1"] == pytest.approx((po - pe) / (1 - pe), rel=1e-12)
    # the prevalence paradox: kappa craters on the skewed panel,
    # AC1 stays near the raw agreement
    kap = cohens_kappa(
        df.select(
            (F_col("a") == "p").alias("pa"), (F_col("b") == "p").alias("pb")
        ),
        "pa", "pb",
    ).collect()[0]["kappa"]
    assert out["ac1"] > 0.85 and kap < 0.5


from pyspark.sql.functions import col as F_col  # noqa: E402


def test_markov_stationary_matches_reference(spark):
    # simple 3-state chain, row-normalized by construction
    tp = [("a", "b", 0.5), ("a", "c", 0.5), ("b", "a", 1.0),
          ("c", "c", 0.25), ("c", "a", 0.75)]
    df = spark.createDataFrame(tp, "prev_type string, next_type string, p double")
    from etl_java_spark.operators.assoc import markov_stationary

    out = {
        r["state"]: r["prob"]
        for r in markov_stationary(df, sweeps=3).collect()
    }
    v = {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}
    for _ in range(3):
        nxt = {s: 0.0 for s in v}
        for pv, nx, p in tp:
            nxt[nx] += v[pv] * p
        v = nxt
    for s in v:
        assert out[s] == pytest.approx(v[s], rel=1e-12)
    # probability mass is conserved (closed alphabet)
    assert sum(out.values()) == pytest.approx(1.0, rel=1e-12)


def test_rmst_matches_reference(spark):
    import math

    # durations with events and censoring
    rows = [(2, 1), (2, 1), (4, 0), (6, 1), (9, 0), (12, 1), (15, 0)]
    df = spark.createDataFrame(rows, "dur long, ev int")
    from etl_java_spark.operators.timeseries import kaplan_meier, rmst

    km = sorted(
        (r["t"], r["survival"])
        for r in kaplan_meier(df, "dur", "ev").collect()
    )
    for tau in (5, 10, 100):
        out = rmst(df, "dur", "ev", tau=tau).collect()[0]
        # step-curve area replay
        area = min(km[0][0], tau)  # S=1 before the first event time
        for i, (t, s) in enumerate(km):
            nt = km[i + 1][0] if i + 1 < len(km) else tau
            area += s * max(min(nt, tau) - min(t, tau), 0)
        assert out["tau"] == tau
        assert out["rmst"] == pytest.approx(area, rel=1e-12)
    # no censoring + huge tau -> plain mean lifetime
    pure = spark.createDataFrame(
        [(3, 1), (5, 1), (10, 1)], "dur long, ev int"
    )
    out = rmst(pure, "dur", "ev", tau=1000).collect()[0]
    assert out["rmst"] == pytest.approx((3 + 5 + 10) / 3, rel=1e-12)


def test_topk_stability_matches_reference(spark):
    rows = (
        [(1, "a")] * 5 + [(1, "b")] * 3 + [(1, "c")] * 2 + [(1, "d")]
        + [(2, "a")] * 4 + [(2, "c")] * 3 + [(2, "e")] * 2 + [(2, "f")]
        + [(3, "e")] * 9
    )
    df = spark.createDataFrame(rows, "p long, kk string")
    from etl_java_spark.operators.dq import topk_stability

    out = {
        (r["period"], r["next_period"]): r
        for r in topk_stability(df, "p", "kk", k=3).collect()
    }
    # period 1 top-3: a,b,c; period 2 top-3: a,c,e -> common {a,c}
    r12 = out[(1, 2)]
    assert (r12["n_a"], r12["n_b"], r12["n_common"]) == (3, 3, 2)
    assert r12["jaccard"] == pytest.approx(2 / 4, rel=1e-12)
    assert r12["overlap_coef"] == pytest.approx(2 / 3, rel=1e-12)
    # period 3 has a single key, disjoint from period 2? e is shared
    r23 = out[(2, 3)]
    assert r23["n_b"] == 1 and r23["n_common"] == 1
    assert r23["overlap_coef"] == 1.0


def test_yuen_t_matches_reference(spark):
    import math

    xa = [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]   # heavy tail
    xb = [2, 3, 3, 4, 5, 6, 7, 8, 9, 10]
    rows = [("a", v) for v in xa] + [("b", v) for v in xb]
    df = spark.createDataFrame(rows, "grp string, v long")
    from etl_java_spark.operators.experiments import yuen_t

    out = yuen_t(df, "grp", "v", "a", "b", trim=0.2).collect()[0]

    def yuen_side(xs, trim=0.2):
        xs = sorted(xs)
        n = len(xs)
        g = int(trim * n)
        kept = xs[g: n - g]
        h = len(kept)
        tm = sum(kept) / h
        wins = [xs[g]] * g + kept + [xs[n - g - 1]] * g
        mw = sum(wins) / n
        s2w = sum((x - mw) ** 2 for x in wins) / (n - 1)
        d = (n - 1) * s2w / (h * (h - 1))
        return n, h, tm, d

    na, ha, tma, da = yuen_side(xa)
    nb, hb, tmb, db = yuen_side(xb)
    assert (out["n_a"], out["h_a"], out["n_b"], out["h_b"]) == (
        na, ha, nb, hb,
    )
    assert out["tmean_a"] == pytest.approx(tma, rel=1e-12)
    assert out["tmean_b"] == pytest.approx(tmb, rel=1e-12)
    assert out["t_stat"] == pytest.approx(
        (tma - tmb) / math.sqrt(da + db), rel=1e-12
    )
    # the outlier 100 is trimmed away: |t| stays small
    assert abs(out["t_stat"]) < 2


def test_group_central_means_matches_reference(spark):
    import math

    rows = [("g", v) for v in [1, 2, 4, 8]] + [("z", 0), ("z", 5)]
    df = spark.createDataFrame(rows, "grp string, v long")
    from etl_java_spark.operators.dq import group_central_means

    out = {
        r["grp"]: r for r in group_central_means(df, "grp", "v").collect()
    }
    xs = [1, 2, 4, 8]
    am = sum(xs) / 4
    gm = math.exp(sum(_q9(math.log(x)) for x in xs) / 4)
    hm = 4 / sum(1 / x for x in xs)
    assert out["g"]["mean_arith"] == pytest.approx(am, rel=1e-12)
    assert out["g"]["mean_geo"] == pytest.approx(gm, rel=1e-12)
    assert out["g"]["mean_harm"] == pytest.approx(hm, rel=1e-12)
    assert am >= gm >= hm
    # zero excluded, n reports the kept count
    assert out["z"]["n"] == 1 and out["z"]["mean_geo"] == pytest.approx(
        5.0, rel=1e-8  # ln quantizes to the 1e-9 grid (r12 contract)
    )


def test_mahalanobis_2d_matches_reference(spark):
    import math

    # correlated cloud + one joint outlier that is per-axis ordinary
    pts = [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50), (6, 60),
           (2, 21), (3, 29), (4, 41), (5, 49), (6, 58), (1, 12),
           (6, 10)]  # off the diagonal -> joint outlier
    df = spark.createDataFrame(pts, "x long, y long")
    from etl_java_spark.operators.dq import mahalanobis_2d

    out = mahalanobis_2d(df, "x", "y").collect()[0]
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    vx = sum((x - mx) ** 2 for x, _ in pts) / n
    vy = sum((y - my) ** 2 for _, y in pts) / n
    cxy = sum((x - mx) * (y - my) for x, y in pts) / n
    det = vx * vy - cxy * cxy
    thr = 7.377758908227871
    cnt = sum(
        1
        for x, y in pts
        if ((x - mx) ** 2 * vy - 2 * (x - mx) * (y - my) * cxy
            + (y - my) ** 2 * vx) / det > thr
    )
    assert out["n_rows"] == n and out["n_outliers"] == cnt
    assert cnt >= 1  # the planted joint outlier is caught
    # sanity: the threshold is the exact chi2(2) upper quantile
    assert thr == pytest.approx(-2 * math.log(0.025), rel=1e-12)


def test_partial_correlation_matches_reference(spark):
    # y = x + z exactly: controlling z should strengthen r_xy
    rows = [
        (x, x + z, z)
        for x in range(1, 8)
        for z in (0, 5, 10, 20)
    ]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    from etl_java_spark.operators.evaluation import partial_correlation

    out = partial_correlation(df, "x", "y", "z").collect()[0]
    import math

    n = len(rows)

    def r(i, j):
        mi = sum(r_[i] for r_ in rows) / n
        mj = sum(r_[j] for r_ in rows) / n
        ci = sum((r_[i] - mi) ** 2 for r_ in rows) / n
        cj = sum((r_[j] - mj) ** 2 for r_ in rows) / n
        cij = sum((r_[i] - mi) * (r_[j] - mj) for r_ in rows) / n
        return cij / math.sqrt(ci * cj)

    rxy, rxz, ryz = r(0, 1), r(0, 2), r(1, 2)
    want = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz**2) * (1 - ryz**2)
    )
    assert out["r_xy"] == pytest.approx(rxy, rel=1e-12)
    assert out["r_xy_z"] == pytest.approx(want, rel=1e-12)
    # x and z are independent by construction; partialling out z
    # recovers the deterministic x -> y link
    assert out["r_xy_z"] == pytest.approx(1.0, rel=1e-9)
    assert out["r_xy"] < 0.9


def test_bin_width_rules_matches_reference(spark):
    import math

    vals = [1, 2, 2, 3, 3, 3, 4, 4, 5, 6, 7, 8, 9, 10, 20, 40]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    from etl_java_spark.operators.dq import bin_width_rules

    out = bin_width_rules(df, "v").collect()[0]
    n = len(vals)
    s = sorted(vals)
    q1 = s[math.ceil(0.25 * n) - 1]
    q3 = s[math.ceil(0.75 * n) - 1]
    iqr = q3 - q1
    rng = max(vals) - min(vals)
    fd = math.ceil(rng / (2 * iqr / n ** (1 / 3)))
    sturges = math.ceil(math.log2(n)) + 1
    mean = sum(vals) / n
    m2 = sum((v - mean) ** 2 for v in vals) / n
    m3 = sum((v - mean) ** 3 for v in vals) / n
    g1 = m3 / m2**1.5
    sig = math.sqrt(6 * (n - 2) / ((n + 1) * (n + 3)))
    doane = 1 + math.ceil(math.log2(n) + math.log2(1 + abs(g1) / sig))
    assert (out["n"], out["iqr"]) == (n, iqr)
    assert out["fd_bins"] == fd
    assert out["sturges_bins"] == sturges
    assert out["doane_bins"] == doane


def test_theil_decomposition_matches_reference(spark):
    import math

    vals = {"a": [10, 10, 10], "b": [1, 5, 100, 200]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    from etl_java_spark.operators.dq import theil_decomposition

    out = {r["grp"]: r for r in theil_decomposition(df, "g", "v").collect()}
    allv = [v for vs in vals.values() for v in vs]
    mu = sum(allv) / len(allv)

    def theil(xs):
        # replay the operator identity with the quantized ln factor:
        # T = (SUM x*q9(ln x) - ln(m) SUM x) / (n m)
        m = sum(xs) / len(xs)
        sxl = sum(x * _q9(math.log(x)) for x in xs)
        return (sxl - math.log(m) * sum(xs)) / (len(xs) * m)

    t_total = theil(allv)
    tb = sum(
        sum(vs) / sum(allv) * math.log((sum(vs) / len(vs)) / mu)
        for vs in vals.values()
    )
    for g, vs in vals.items():
        assert out[g]["t_within"] == pytest.approx(theil(vs), rel=1e-12)
        assert out[g]["value_share"] == pytest.approx(
            sum(vs) / sum(allv), rel=1e-12
        )
    assert out["a"]["t_between"] == pytest.approx(tb, rel=1e-12)
    # the exact decomposition identity
    assert out["a"]["t_total"] == pytest.approx(t_total, rel=1e-12)
    # group a is perfectly equal -> within term ~0 at the scale of
    # the 1e-9 ln quantization grid (r12 contract)
    assert out["a"]["t_within"] == pytest.approx(0.0, abs=1e-10)


def test_krippendorff_interval_matches_reference(spark):
    panel = {1: [4, 5], 2: [2, 2, 3], 3: [9, 1], 4: [7]}
    rows = [(i, v) for i, vs in panel.items() for v in vs]
    df = spark.createDataFrame(rows, "i long, v long")
    from etl_java_spark.operators.evaluation import krippendorff_interval

    out = krippendorff_interval(df, "i", "v").collect()[0]
    kept = {i: vs for i, vs in panel.items() if len(vs) >= 2}
    n = sum(len(vs) for vs in kept.values())
    d_o = (
        sum(
            2
            * (len(vs) * sum(v * v for v in vs) - sum(vs) ** 2)
            / (len(vs) - 1)
            for vs in kept.values()
        )
        / n
    )
    allv = [v for vs in kept.values() for v in vs]
    d_e = (
        2
        * (n * sum(v * v for v in allv) - sum(allv) ** 2)
        / (n * (n - 1))
    )
    assert out["n_items"] == len(kept) and out["n_ratings"] == n
    assert out["d_o"] == pytest.approx(d_o, rel=1e-12)
    assert out["d_e"] == pytest.approx(d_e, rel=1e-12)
    assert out["alpha"] == pytest.approx(1 - d_o / d_e, rel=1e-12)
    # identical ratings within each item -> alpha = 1
    perf = spark.createDataFrame(
        [(1, 4), (1, 4), (2, 9), (2, 9)], "i long, v long"
    )
    assert krippendorff_interval(perf, "i", "v").collect()[0][
        "alpha"
    ] == 1.0


def test_hhi_concentration_matches_reference(spark):
    rows = (
        [("m1", "s1")] * 8 + [("m1", "s2")] * 1 + [("m1", "s3")] * 1
        + [("m2", "x")] * 5 + [("m2", "y")] * 5
    )
    df = spark.createDataFrame(rows, "g string, c string")
    from etl_java_spark.operators.dq import hhi_concentration

    out = {r["grp"]: r for r in hhi_concentration(df, "g", "c").collect()}
    # m1: shares .8/.1/.1 -> hhi = .66; m2: .5/.5 -> .5
    assert out["m1"]["hhi"] == pytest.approx(0.66, rel=1e-12)
    assert out["m2"]["hhi"] == pytest.approx(0.5, rel=1e-12)
    assert out["m1"]["eff_categories"] == pytest.approx(
        1 / 0.66, rel=1e-12
    )
    k = 3
    assert out["m1"]["hhi_norm"] == pytest.approx(
        (0.66 - 1 / k) / (1 - 1 / k), rel=1e-12
    )
    # concentrated market reads higher on every axis
    assert out["m1"]["hhi"] > out["m2"]["hhi"]
    # single-category group: hhi = 1, norm undefined
    solo = spark.createDataFrame([("z", "only")] * 4, "g string, c string")
    r = hhi_concentration(solo, "g", "c").collect()[0]
    assert r["hhi"] == 1.0 and r["hhi_norm"] is None


def test_inequality_profile_matches_reference(spark):
    import math

    vals = {"eq": [5, 5, 5, 5], "sk": [1, 1, 2, 16]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    from etl_java_spark.operators.dq import inequality_profile

    out = {r["grp"]: r for r in inequality_profile(df, "g", "v").collect()}
    for g, xs in vals.items():
        n, X = len(xs), sum(xs)
        hoover = sum(abs(x * n - X) for x in xs) / (2 * n * X)
        am = X / n
        gm = math.exp(sum(_q9(math.log(x)) for x in xs) / n)
        hm = n / sum(1 / x for x in xs)
        assert out[g]["hoover"] == pytest.approx(hoover, rel=1e-12)
        assert out[g]["atkinson_1"] == pytest.approx(1 - gm / am, rel=1e-12)
        assert out[g]["atkinson_2"] == pytest.approx(1 - hm / am, rel=1e-12)
    # perfectly equal group scores 0 (atkinson_1 within the 1e-9 ln
    # quantization grid, r12 contract)
    assert out["eq"]["hoover"] == 0.0
    assert out["eq"]["atkinson_1"] == pytest.approx(0.0, abs=1e-9)
    assert out["sk"]["hoover"] > 0.3


def test_quantile_share_ratio_matches_reference(spark):
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    from etl_java_spark.operators.dq import quantile_share_ratio

    out = quantile_share_ratio(df, "v", bottom_q=0.4, top_q=0.1).collect()[
        0
    ]
    s = sorted(vals)
    X = sum(s)
    bsum = sum(s[:4])          # bottom 40% of 10 units
    tsum = sum(s[9:])          # top 10% = 1 unit (the 100)
    assert out["bottom_units"] == 4 and out["top_units"] == 1
    assert out["bottom_share"] == pytest.approx(bsum / X, rel=1e-12)
    assert out["top_share"] == pytest.approx(tsum / X, rel=1e-12)
    assert out["palma"] == pytest.approx(tsum / bsum, rel=1e-12)
    # boundary mass splits exactly: 5 copies of one value, bottom 40%
    # of n=5 -> 2 units of that same value
    ties = spark.createDataFrame([(7,)] * 5, "v long")
    r = quantile_share_ratio(ties, "v").collect()[0]
    assert r["bottom_units"] == 2
    assert r["bottom_share"] == pytest.approx(14 / 35, rel=1e-12)


def test_cohens_h_matches_reference(spark):
    import math

    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 10 + [
        ("b", 0)
    ] * 90
    df = spark.createDataFrame(rows, "g string, y int")
    from etl_java_spark.operators.experiments import cohens_h

    out = cohens_h(df, "g", "y", "a", "b").collect()[0]
    want = 2 * math.asin(math.sqrt(0.3)) - 2 * math.asin(math.sqrt(0.1))
    assert (out["n_a"], out["x_a"], out["n_b"], out["x_b"]) == (
        100, 30, 100, 10,
    )
    assert out["h"] == pytest.approx(want, rel=1e-12)
    # variance stabilization: the same 5pp gap is a LARGER h near 0
    near0 = [("a", 1)] * 6 + [("a", 0)] * 94 + [("b", 1)] * 1 + [
        ("b", 0)
    ] * 99
    near50 = [("a", 1)] * 55 + [("a", 0)] * 45 + [("b", 1)] * 50 + [
        ("b", 0)
    ] * 50
    h0 = cohens_h(
        spark.createDataFrame(near0, "g string, y int"), "g", "y", "a", "b"
    ).collect()[0]["h"]
    h50 = cohens_h(
        spark.createDataFrame(near50, "g string, y int"), "g", "y", "a", "b"
    ).collect()[0]["h"]
    assert h0 > h50


def test_gumbel_block_maxima_matches_reference(spark):
    import math

    vals = [((i * 13) % 29) * 3 + (i % 7) + 10 for i in range(30)]
    rows = [(i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "t long, v long")
    from etl_java_spark.operators.timeseries import gumbel_block_maxima

    out = gumbel_block_maxima(
        df, "t", "v", block_days=7, return_period=52
    ).collect()[0]
    maxima = [
        max(vals[b * 7: (b + 1) * 7]) for b in range(len(vals) // 7)
    ]
    n = len(maxima)
    mean = sum(maxima) / n
    sd = math.sqrt(sum((m - mean) ** 2 for m in maxima) / (n - 1))
    scale = math.sqrt(6) * sd / math.pi
    loc = mean - 0.5772156649015329 * scale
    rl = loc - scale * math.log(-math.log(1.0 - 1.0 / 52.0))
    assert out["n_blocks"] == n
    assert out["max_mean"] == pytest.approx(mean, rel=1e-12)
    assert out["max_sd"] == pytest.approx(sd, rel=1e-12)
    assert out["loc"] == pytest.approx(loc, rel=1e-12)
    assert out["return_level"] == pytest.approx(rl, rel=1e-9)
    # the return level dominates every observed block maximum's loc
    assert out["return_level"] > out["loc"]


def test_seasonal_strength_matches_reference(spark):
    # planted weekday effect on a linear trend: high strength
    rows = [
        (i + 1, 1000 + 3 * i + [0, 50, 0, 0, 0, 0, 0][i % 7])
        for i in range(35)
    ]
    df = spark.createDataFrame(rows, "t long, y long")
    from etl_java_spark.operators.timeseries import seasonal_strength

    out = seasonal_strength(df, "t", "y", period=7).collect()[0]
    # replay: centered MA of width 7, detrended d = 7y - window sum
    ys = [y for _, y in rows]
    det = []
    for i in range(3, len(ys) - 3):
        det.append(((i) % 7, 7 * ys[i] - sum(ys[i - 3: i + 4])))
    from collections import defaultdict

    per = defaultdict(list)
    for ph, d in det:
        per[ph].append(d)
    alld = [d for _, d in det]
    sst = sum(d * d for d in alld) - sum(alld) ** 2 / len(alld)
    ssw = sum(d * d for d in alld) - sum(
        sum(ds) ** 2 / len(ds) for ds in per.values()
    )
    want = max(0.0, 1 - ssw / sst)
    assert out["n_obs"] == len(det)
    assert out["ss_within"] == pytest.approx(ssw, rel=1e-12)
    assert out["ss_total"] == pytest.approx(sst, rel=1e-12)
    assert out["strength"] == pytest.approx(want, rel=1e-12)
    assert out["strength"] > 0.8  # the planted effect dominates
    # pure trend, no seasonality -> strength near 0
    flat = spark.createDataFrame(
        [(i + 1, 100 + 5 * i) for i in range(28)], "t long, y long"
    )
    r = seasonal_strength(flat, "t", "y", period=7).collect()[0]
    assert r["strength"] == pytest.approx(0.0, abs=1e-9)
