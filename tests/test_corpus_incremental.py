"""Tests for operators/corpus.py (decontamination, line dedup, SemDeDup)
and operators/incremental.py (partial-aggregate maintenance)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_java_spark.operators import corpus as C
from etl_java_spark.operators import incremental as INC


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# decontamination


def test_contamination_hits_counts_distinct_shared_shingles(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words appear here only"),
            (3, "quick brown fox again quick brown fox again"),
        ],
    )
    bench = _docs(spark, [(100, "a quick brown fox jumps high")])
    hits = {r["doc_id"]: r["n_hits"] for r in C.contamination_hits(corpus, bench).collect()}
    # bench 3-grams: {a quick brown, quick brown fox, brown fox jumps}
    assert hits[1] == 2  # quick brown fox, brown fox jumps
    assert hits[3] == 1  # quick brown fox (distinct — repeats don't double count)
    assert 2 not in hits  # clean docs emit no row


def test_decontaminate_drops_flagged_docs(spark):
    corpus = _docs(
        spark,
        [(1, "shared contamination trigram here"), (2, "totally clean document text")],
    )
    bench = _docs(spark, [(9, "the shared contamination trigram")])
    kept = [r["doc_id"] for r in C.decontaminate(corpus, bench).collect()]
    assert kept == [2]


def test_decontaminate_short_doc_whole_text_shingle(spark):
    # docs shorter than n collapse to one whole-text shingle (word_shingles
    # semantics) — identical short docs still match
    corpus = _docs(spark, [(1, "two words"), (2, "other pair")])
    bench = _docs(spark, [(9, "two words")])
    kept = [r["doc_id"] for r in C.decontaminate(corpus, bench).collect()]
    assert kept == [2]


# ---------------------------------------------------------------------------
# line dedup


def test_line_dedup_removes_boilerplate_keeps_order(spark):
    boiler = "subscribe to our newsletter"
    df = _docs(
        spark,
        [
            (1, f"alpha unique line\n{boiler}\nbeta unique line"),
            (2, f"{boiler}\ngamma unique line"),
            (3, "delta unique line"),
        ],
    )
    out = {r["doc_id"]: r for r in C.line_dedup(df, min_dup_docs=2).collect()}
    assert out[1]["text"] == "alpha unique line\nbeta unique line"
    assert out[1]["n_kept_lines"] == 2 and out[1]["n_dropped_lines"] == 1
    assert out[2]["text"] == "gamma unique line"
    assert out[3]["text"] == "delta unique line"
    assert out[3]["n_dropped_lines"] == 0


def test_line_dedup_trim_normalized_matching(spark):
    # lines differing only by surrounding whitespace are the same line,
    # but the KEPT text preserves each doc's original spelling
    df = _docs(spark, [(1, "  dup line  \nkeep a"), (2, "dup line\nkeep b")])
    out = {r["doc_id"]: r["text"] for r in C.line_dedup(df, min_dup_docs=2).collect()}
    assert out == {1: "keep a", 2: "keep b"}


def test_line_dedup_empty_lines_survive(spark):
    df = _docs(spark, [(1, "a\n\nb"), (2, "c\n\nd")])
    out = {r["doc_id"]: r["text"] for r in C.line_dedup(df, min_dup_docs=2).collect()}
    # the blank middle line appears in both docs but is structure, not
    # boilerplate — it must survive
    assert out == {1: "a\n\nb", 2: "c\n\nd"}


def test_line_dedup_fully_boilerplate_doc_becomes_empty(spark):
    df = _docs(spark, [(1, "same"), (2, "same"), (3, "same")])
    out = C.line_dedup(df, min_dup_docs=2).collect()
    assert all(r["text"] == "" and r["n_kept_lines"] == 0 for r in out)
    assert {r["doc_id"] for r in out} == {1, 2, 3}


# ---------------------------------------------------------------------------
# semantic dedup


@pytest.fixture(scope="module")
def emb(spark):
    # two tight clusters around orthogonal axes + one planted near-dup pair
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.98, 0.02, 0.0]),   # near-dup of 2
        (4, [0.0, 0.0, 1.0, 0.0]),     # singleton
        (5, [-1.0, 0.0, 0.0, 0.0]),    # opposite of 0 — same cell? no: nearest centroid differs
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cents(spark):
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0, 0.0])]
    return spark.createDataFrame(rows, "cell long, embedding array<double>")


def test_semantic_dup_pairs_finds_planted_pairs(spark, emb):
    pairs = C.semantic_dup_pairs(emb, "embedding", "vec_id", _cents(spark), threshold=0.95)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(0, 1), (2, 3)}


def test_semantic_dedup_keeps_min_id(spark, emb):
    kept = sorted(
        r["vec_id"]
        for r in C.semantic_dedup(emb, "embedding", "vec_id", _cents(spark), 0.95).collect()
    )
    assert kept == [0, 2, 4, 5]


def test_semantic_dedup_cross_cell_pairs_never_compared(spark, emb):
    # 0 and 5 are antipodal -> different cells; even threshold -1 keeps both
    pairs = C.semantic_dup_pairs(emb, "embedding", "vec_id", _cents(spark), threshold=-1.0)
    cells = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 5) not in cells


def test_semantic_dup_pairs_default_fitted_quantizer(spark, emb):
    """Omitting centroids_df must route through the production default:
    a distributed pyspark.ml KMeans fit (fit_centroids_ml). The planted
    near-dup pairs cluster tightly, so any reasonable k-means quantizer
    co-locates them and the pairs survive."""
    pairs = C.semantic_dup_pairs(emb, "embedding", "vec_id", threshold=0.95)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(0, 1), (2, 3)}


# ---------------------------------------------------------------------------
# incremental aggregates


SPEC = {
    "n": ("count", None),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def test_merge_partials_equals_full_recompute(spark):
    full = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 3 % 101).alias("v")
    )
    parts = [
        INC.partial_aggs(full.filter(F.col("id") % 3 == i), ["k"], SPEC) for i in range(3)
    ]
    merged = {r["k"]: r for r in INC.merge_partials(parts, ["k"], SPEC).collect()}
    direct = {r["k"]: r for r in INC.partial_aggs(full, ["k"], SPEC).collect()}
    assert merged.keys() == direct.keys()
    for k in direct:
        for c in ("n", "total", "lo", "hi"):
            assert merged[k][c] == direct[k][c], (k, c)


def test_merge_partials_associative(spark):
    df = spark.range(300).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    a = INC.partial_aggs(df.filter(F.col("id") < 100), ["k"], SPEC)
    b = INC.partial_aggs(df.filter((F.col("id") >= 100) & (F.col("id") < 200)), ["k"], SPEC)
    c = INC.partial_aggs(df.filter(F.col("id") >= 200), ["k"], SPEC)
    left = INC.merge_partials([INC.merge_partials([a, b], ["k"], SPEC), c], ["k"], SPEC)
    right = INC.merge_partials([a, INC.merge_partials([b, c], ["k"], SPEC)], ["k"], SPEC)
    assert sorted(map(tuple, left.collect())) == sorted(map(tuple, right.collect()))


def test_non_algebraic_op_rejected(spark):
    df = spark.range(10).select((F.col("id") % 2).alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="not algebraic"):
        INC.partial_aggs(df, ["k"], {"m": ("median", "v")})


def test_incremental_join_equals_full_recompute(spark):
    left = spark.range(200).select(
        (F.col("id") % 20).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(60).select(
        (F.col("id") % 20).alias("k"), (F.col("id") * 10).alias("rv")
    )
    bl, dl = left.filter(F.col("lv") % 3 != 0), left.filter(F.col("lv") % 3 == 0)
    br, dr = right.filter(F.col("rv") % 40 != 0), right.filter(F.col("rv") % 40 == 0)
    got = INC.incremental_join_equals_full(bl, br, dl, dr, ["k"])
    want = left.join(right, ["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_incremental_join_delta_only_rows(spark):
    # the delta term must contain exactly the rows the full join gains
    left = spark.range(50).select((F.col("id") % 5).alias("k"), F.col("id").alias("lv"))
    right = spark.range(20).select((F.col("id") % 5).alias("k"), (F.col("id") + 100).alias("rv"))
    bl, dl = left.filter(F.col("lv") < 40), left.filter(F.col("lv") >= 40)
    br, dr = right.filter(F.col("rv") < 110), right.filter(F.col("rv") >= 110)
    delta = INC.incremental_join(bl, br, dl, dr, ["k"])
    full = left.join(right, ["k"])
    stored = bl.join(br, ["k"])
    gained = full.exceptAll(stored)
    assert sorted(map(tuple, delta.collect())) == sorted(map(tuple, gained.collect()))
