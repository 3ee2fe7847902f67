"""Property tests (hypothesis) for round-7 operators vs pure-Python
references: winnowing fingerprint sets, average precision, Kneser-Ney
probabilities, FD g3 violation counts, and BPE top-pair selection."""

from __future__ import annotations

import math
import re
from collections import Counter

from hypothesis import given, settings, strategies as st

from etl_java_spark.functions.lm import bpe_merge_discovery, kneser_ney_fluency
from etl_java_spark.operators.corpus import (
    WINNOW_HASH_MOD,
    winnow_fingerprints,
)
from etl_java_spark.operators.dq import functional_dependency_audit
from etl_java_spark.operators.evaluation import average_precision

_WORD = st.text(alphabet="abcde", min_size=1, max_size=3)
_DOC = st.lists(_WORD, min_size=0, max_size=30).map(" ".join)


def _py_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower().strip()) if t]


def _py_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % WINNOW_HASH_MOD
    return acc


def _py_winnow(text: str, n: int = 3, w: int = 4) -> set[int]:
    tk = _py_tokens(text)
    if len(tk) < n:
        sh = [" ".join(tk)]
    else:
        sh = [" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)]
    hs = [_py_hash(s) for s in sh]
    m = len(hs) - w + 1
    if m <= 1:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(m)}


@settings(max_examples=12, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=5))
def test_winnow_matches_python_reference(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {}
    for r in winnow_fingerprints(df, "text", "doc_id", 3, 4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    want = {i: _py_winnow(d) for i, d in enumerate(docs)}
    # docs with zero fingerprints (empty text hashes to 0 -> still one)
    want = {i: s for i, s in want.items() if s}
    assert got == {i: s for i, s in want.items()}


def _py_average_precision(rows):
    """rows = [(id, y, s)]; order (s desc, id asc)."""
    ordered = sorted(rows, key=lambda r: (-r[2], r[0]))
    n_pos = sum(r[1] for r in ordered)
    if n_pos == 0:
        return None
    ap, seen = 0.0, 0
    for rank, r in enumerate(ordered, 1):
        if r[1] == 1:
            seen += 1
            ap += seen / rank
    return ap / n_pos


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(0, 50)),
        min_size=1,
        max_size=40,
    ).filter(lambda rs: any(y for y, _ in rs))
)
def test_average_precision_matches_python(spark, rows):
    data = [(i, int(y), s) for i, (y, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, y int, s long")
    got = average_precision(df, "y", "s", "id").collect()[0]["ap"]
    want = _py_average_precision(data)
    assert math.isclose(got, want, rel_tol=1e-9)


def _py_kn(docs):
    """Per-doc mean interpolated-KN bigram probability, D = 3/4."""
    big = Counter()
    doc_bg = {}
    for i, text in docs:
        tk = _py_tokens(text)
        pairs = list(zip(tk, tk[1:]))
        if pairs:
            doc_bg[i] = Counter(pairs)
            big.update(pairs)
    c1h = Counter()
    n1f = Counter()
    n1b = Counter()
    for (w1, w2), c in big.items():
        c1h[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    T = len(big)
    out = {}
    for i, bg in doc_bg.items():
        num, den = 0.0, 0
        for (w1, w2), n in bg.items():
            p = (big[(w1, w2)] - 0.75) / c1h[w1] + 0.75 * n1f[w1] / c1h[w1] * (
                n1b[w2] / T
            )
            num += n * p
            den += n
        out[i] = num / den
    return out


@settings(max_examples=10, deadline=None)
@given(st.lists(_DOC.filter(lambda d: len(_py_tokens(d)) >= 2),
                min_size=1, max_size=4))
def test_kneser_ney_matches_python(spark, docs):
    data = list(enumerate(docs))
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {r["doc_id"]: r["kn_fluency"]
           for r in kneser_ney_fluency(df).collect()}
    want = _py_kn(data)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), (k, got[k], want[k])


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["x", "y", "z", None])),
        min_size=1,
        max_size=40,
    )
)
def test_fd_audit_matches_python_g3(spark, rows):
    df = spark.createDataFrame(rows, "a long, b string")
    r = functional_dependency_audit(df, [(["a"], "b")]).collect()[0]
    per = {}
    for a, b in rows:
        per.setdefault(a, Counter())[b] += 1
    want = sum(sum(c.values()) - max(c.values()) for c in per.values())
    assert r["n_violations"] == want
    assert r["n_rows"] == len(rows)


@settings(max_examples=8, deadline=None)
@given(st.lists(_DOC.filter(lambda d: len(_py_tokens(d)) >= 2),
                min_size=1, max_size=4))
def test_bpe_first_round_top_pair_matches_python(spark, docs):
    data = list(enumerate(docs))
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = bpe_merge_discovery(df, rounds=1).collect()[0]
    pairs = Counter()
    for _, text in data:
        tk = _py_tokens(text)
        pairs.update(zip(tk, tk[1:]))
    want = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (got["w1"], got["w2"]) == want[0]
    assert got["pair_count"] == want[1]
