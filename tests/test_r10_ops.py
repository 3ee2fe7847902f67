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
