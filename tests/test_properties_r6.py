"""Property tests (hypothesis) for round-6 operators: Holt fold vs a
pure-Python reference, Benford counts vs a Counter, diversity ratios vs
Python sets, DSIR importance vs an exact Python replication (including
the decimal-rounded mean), and cosine-recall evals vs a Python
left-to-right float fold."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_java_spark.operators.corpus import dsir_importance, ngram_diversity
from etl_java_spark.operators.dq import benford_audit
from etl_java_spark.operators.similarity import prefix_dim_recall
from etl_java_spark.operators.timeseries import holt_linear

_vals = st.lists(
    st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False, width=64),
    min_size=1,
    max_size=25,
)


def _py_holt(xs, alpha, beta):
    l = b = None
    for v in xs:
        if l is None:
            l = v
        elif b is None:
            l, b = v, v - l
        else:
            l_new = v * alpha + (l + b) * (1.0 - alpha)
            b = (l_new - l) * beta + b * (1.0 - beta)
            l = l_new
    return l, (0.0 if b is None else b)


@settings(max_examples=8, deadline=None)
@given(_vals, st.sampled_from([0.5, 0.25]), st.sampled_from([0.25, 0.125]))
def test_holt_fold_matches_python_bitwise(spark, vals, alpha, beta):
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)], ["k", "t", "v"]
    )
    r = holt_linear(df, "k", ["t"], "v", alpha=alpha, beta=beta, horizon=2).first()
    l, b = _py_holt(vals, alpha, beta)
    assert r["level"] == l and r["trend"] == b  # exact, not approx
    assert r["forecast"] == l + 2.0 * b
    assert r["n_points"] == len(vals)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(-100, 10**6), min_size=1, max_size=60))
def test_benford_counts_match_counter(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], ["v"])
    rows = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    expect = Counter(int(str(v)[0]) for v in vals if v >= 1)
    assert {d: r["n"] for d, r in rows.items()} == dict(expect)
    if expect:
        total = sum(expect.values())
        for d, r in rows.items():
            assert r["obs_share"] == round(expect[d] / total, 12)


_word = st.sampled_from("alpha beta gamma delta eps zeta".split())
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["A", "B"]), _doc), min_size=1, max_size=8))
def test_diversity_matches_python_sets(spark, rows):
    rows = [(s, t) for s, t in rows if t.strip()]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {r["source"]: r for r in ngram_diversity(df, shingle_n=2).collect()}
    by_src: dict[str, list[list[str]]] = {}
    for s, t in rows:
        by_src.setdefault(s, []).append(t.split())
    for s, docs in by_src.items():
        toks = [w for d in docs for w in d]
        grams = [
            " ".join(d[i : i + 2]) if len(d) >= 2 else " ".join(d)
            for d in docs
            for i in range(max(len(d) - 1, 1))
            if d
        ]
        assert got[s]["n_tokens"] == len(toks)
        assert got[s]["distinct_tokens"] == len(set(toks))
        assert got[s]["n_ngrams"] == len(grams)
        assert got[s]["distinct_ngrams"] == len(set(grams))


def _dec15(x: float) -> Decimal:
    return Decimal(x).quantize(Decimal("1e-15"), rounding=ROUND_HALF_UP)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.booleans(), _doc), min_size=2, max_size=8).filter(
        lambda rows: any(t for _, t in rows)
        and any(b for b, t in rows if t)
        and any(not b for b, t in rows if t)
    )
)
def test_dsir_matches_python_replication(spark, rows):
    rows = [(i, b, t) for i, (b, t) in enumerate(rows) if t.strip()]
    df = spark.createDataFrame(rows, ["doc_id", "tgt", "text"])
    got = {
        r["doc_id"]: r
        for r in dsir_importance(df, F.col("tgt"), id_col="doc_id").collect()
    }
    ct: Counter = Counter()
    cr: Counter = Counter()
    doc_toks = {}
    for i, b, t in rows:
        toks = t.split()
        doc_toks[i] = (b, toks)
        (ct if b else cr).update(toks)
    vocab = set(ct) | set(cr)
    v, nt, nr = float(len(vocab)), float(sum(ct.values())), float(sum(cr.values()))
    for i, (b, toks) in doc_toks.items():
        acc = Decimal(0)
        for w, n in Counter(toks).items():
            r = ((ct[w] + 1.0) * (nr + v)) / ((cr[w] + 1.0) * (nt + v))
            acc += _dec15(float(n) * r)
        imp = round(float(acc) / float(len(toks)), 12)
        assert got[i]["importance"] == imp
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["is_target"] is b


def _py_cos(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = nb = 0.0
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    if na > 0 and nb > 0:
        return dot / (math.sqrt(na) * math.sqrt(nb))
    return 0.0


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=4,
        max_size=10,
    )
)
def test_prefix_recall_matches_python_ranking(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    k = 2
    res = {
        r["query_id"]: r
        for r in prefix_dim_recall(
            df, df.filter(F.col("vec_id") == 0), "embedding", "vec_id",
            prefix_dims=2, k=k,
        ).collect()
    }

    def topk(dims):
        scored = sorted(
            (-_py_cos(rows[0][1][:dims], v[:dims]), i) for i, v in rows[1:]
        )
        return {i for _, i in scored[:k]}

    expect = len(topk(4) & topk(2))
    assert res[0]["n_overlap"] == expect
    assert res[0]["recall"] == round(expect / k, 12)
