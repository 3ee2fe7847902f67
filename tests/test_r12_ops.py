"""Round-12 operator references: the streaming near-dup guard.

Pure-Python replays of the order-free rejection policy plus the
batching-order-robustness contract (the drained state must be
identical for ANY split of the stream into micro-batches, including
arrival orders that force retroactive rejection).
"""

from __future__ import annotations

import re
import shutil
import tempfile

import pytest


def _shingles(text: str, n: int = 3) -> frozenset:
    tk = [t for t in re.split(r"[^a-z0-9]+", text.strip().lower()) if t]
    if len(tk) < n:
        return frozenset([" ".join(tk)])
    return frozenset(
        " ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)
    )


def _jac(a: frozenset, b: frozenset) -> float:
    u = len(a | b)
    return len(a & b) / max(u, 1)


def _reference_state(docs: dict[int, str], threshold: float = 0.5):
    """The order-free policy: rejected iff a lower-id doc has
    J >= threshold; best match = highest J, then smallest id."""
    sh = {i: _shingles(t) for i, t in docs.items()}
    out = {}
    for i in sorted(docs):
        matches = [
            (j, _jac(sh[i], sh[j]))
            for j in sorted(docs)
            if j < i and _jac(sh[i], sh[j]) >= threshold
        ]
        if matches:
            best = max(matches, key=lambda m: (m[1], -m[0]))
            out[i] = (False, len(matches), best[0], best[1])
        else:
            out[i] = (True, 0, None, None)
    return out


def _run_guard(spark, slices, threshold: float = 0.5):
    """Write each slice as one parquet file, drain the guard over a
    maxFilesPerTrigger=1 stream, return {doc_id: state tuple}."""
    from etl_java_spark.streaming.neardup import (
        foreach_batch_neardup_guard,
        read_neardup_state,
    )

    workdir = tempfile.mkdtemp(prefix="t_neardup_")
    try:
        indir = f"{workdir}/in"
        for sl in slices:
            df = spark.createDataFrame(sl, "doc_id long, text string")
            df.coalesce(1).write.mode("append").parquet(indir)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
        )
        q = foreach_batch_neardup_guard(
            spark, stream, workdir, threshold=threshold
        )
        q.awaitTermination()
        rows = read_neardup_state(spark, workdir).collect()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return {
        r["doc_id"]: (
            r["accepted"],
            r["n_dup_matches"],
            r["best_match_id"],
            r["best_jaccard"],
        )
        for r in rows
    }


DOCS = {
    1: "the quick brown fox jumps over the lazy dog near the river",
    2: "the quick brown fox jumps over the lazy dog near the riverbank",
    3: "completely different text about spark streaming state stores",
    4: "the quick brown fox jumps over the lazy dog near the river today",
    5: "another unrelated document mentioning parquet and band indexes",
}


def test_neardup_guard_matches_reference(spark):
    got = _run_guard(
        spark, [[(i, t) for i, t in sorted(DOCS.items())]]
    )
    want = _reference_state(DOCS)
    assert set(got) == set(want)
    for i in want:
        wa, wn, wm, wj = want[i]
        ga, gn, gm, gj = got[i]
        assert (ga, gn, gm) == (wa, wn, wm), i
        if wj is None:
            assert gj is None
        else:
            assert gj == pytest.approx(wj, rel=1e-12)
    # the fixture plants a real near-dup chain: 1 accepted, 2 and 4
    # rejected against it
    assert want[1][0] is True
    assert want[2][0] is False and want[4][0] is False


def test_neardup_guard_batch_split_invariant(spark):
    items = [(i, t) for i, t in sorted(DOCS.items())]
    one = _run_guard(spark, [items])
    per_doc = _run_guard(spark, [[x] for x in items])
    reversed_batches = _run_guard(
        spark, [[items[4], items[3]], [items[2]], [items[1], items[0]]]
    )
    assert one == per_doc == reversed_batches


def test_neardup_guard_retro_rejects_across_batches(spark):
    # the HIGHER-id twin arrives FIRST and is accepted (nothing seen
    # yet); when the lower-id original lands in a later batch the twin
    # must flip to rejected in the drained state
    twin_first = _run_guard(
        spark,
        [[(2, DOCS[2])], [(3, DOCS[3])], [(1, DOCS[1]), (4, DOCS[4])]],
    )
    assert twin_first[2][0] is False and twin_first[2][2] == 1
    assert twin_first[1][0] is True
    # and the final state equals the all-at-once run over the same docs
    assert twin_first == _run_guard(
        spark, [[(i, DOCS[i]) for i in (1, 2, 3, 4)]]
    )
