"""Dedup + similarity operator tests (charter §2B)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.operators import dedup as DD
from etl_java_spark.operators import similarity as SIM


def test_exact_dedup_keep_min(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (5, "hello  WORLD "), (3, "other text")],
        "doc_id long, text string",
    )
    out = DD.exact_dedup_keep_min(df, "text", "doc_id").collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [1, 3]  # 5 is a normalized dup of 1


def test_minhash_finds_neardups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base + "with one extra suffix"
    other = "completely different content about spark query engines and shuffles " * 3
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    pairs = DD.minhash_dedup_pairs(df, "text", "doc_id", num_hashes=32, bands=8, threshold=0.3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(p in {(1, 2)} for p in got)


def test_minhash_bucket_cap_bounds_degenerate_buckets(spark):
    """10k identical docs share every band bucket: uncapped, the band
    self-join materializes ~50M pairs per band (the 100 TB straggler
    pattern). With the cap the candidate join must stay empty and finish
    fast; near-dups OUTSIDE the hot bucket must still be found."""
    import time

    boiler = "subscribe to our newsletter terms and conditions apply " * 4
    rows = [(i, boiler) for i in range(10_000)]
    rows += [(20_001, "a genuinely unique document about spark shuffles " * 3),
             (20_002, "a genuinely unique document about spark shuffles " * 3 + "tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    t0 = time.time()
    pairs = DD.minhash_dedup_pairs(
        df, "text", "doc_id", num_hashes=32, bands=8, threshold=0.3, max_bucket_size=100
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    elapsed = time.time() - t0
    assert (20_001, 20_002) in got            # recall outside the hot bucket
    assert all(a >= 20_000 for a, _ in got)   # capped bucket contributes no pairs
    assert elapsed < 60, f"capped run took {elapsed:.0f}s — cap not effective"


def test_minhash_uncapped_still_finds_identical(spark):
    """Sanity: with the cap disabled the identical docs DO pair up (the
    cap, not a bug, is what removes them above)."""
    df = spark.createDataFrame(
        [(i, "same text here repeated for shingles " * 2) for i in range(5)],
        "doc_id long, text string",
    )
    pairs = DD.minhash_dedup_pairs(
        df, "text", "doc_id", num_hashes=32, bands=8, threshold=0.9, max_bucket_size=None
    )
    assert pairs.count() == 10  # all C(5,2) identical pairs


def test_simhash_hamming(spark):
    # enough unique tokens that single-token edits move few bits
    base = " ".join(f"tok{i}" for i in range(80))
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, " ".join(f"other{i}" for i in range(80)))],
        "doc_id long, text string",
    )
    sims = DD.simhash(df, "text", "doc_id")
    pairs = DD.simhash_near_pairs(sims, "doc_id", max_hamming=12).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f"), (3, "x y z w v")],
        "doc_id long, text string",
    )
    out = DD.ngram_jaccard_pairs(df, "text", "doc_id", shingle_n=1, threshold=0.5)
    got = {(r.id_a, r.id_b): round(r.jaccard, 3) for r in out.collect()}
    assert got == {(1, 2): round(4 / 6, 3)}


def test_brute_force_topk_exact(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # antipode of 0
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = SIM.brute_force_topk(df, df.filter(F.col("vec_id") == 0), "embedding", "vec_id", k=3)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in rows] == [1, 2, 3]
    assert rows[0].cos_sim > 0.99
    assert abs(rows[1].cos_sim) < 1e-9
    assert rows[2].cos_sim < -0.99


def test_lsh_topk_recall_on_fixture(spark, sf_small):
    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(e, q, "embedding", "vec_id", k=5).collect()
    approx = SIM.lsh_topk(e, q, "embedding", "vec_id", k=5, num_planes=16, bands=8).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_arithmetic_plane_lsh_recall_and_determinism(spark, sf_small):
    """The q53 path: arithmetic (engine-reproducible) planes. Recall vs
    brute force, plus partition-independence of the band hashes."""
    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    # 2-bit bands (16/8): same operating point as the seeded-plane recall
    # test above — this fixture's true neighbors are low-cosine, so
    # recall is band-width-bound, not plane-arithmetic-bound
    hasher = lambda c: SIM.arithmetic_plane_bands(c, 16, 8)  # noqa: E731
    exact = SIM.brute_force_topk(e, q, "embedding", "vec_id", k=5).collect()
    approx = SIM.lsh_topk(e, q, "embedding", "vec_id", k=5, hasher=hasher).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"arithmetic-plane LSH recall too low: {recall}"

    h1 = e.select("vec_id", SIM.arithmetic_plane_bands("embedding", 16, 4).alias("h"))
    h2 = e.repartition(7).select(
        "vec_id", SIM.arithmetic_plane_bands("embedding", 16, 4).alias("h")
    )
    assert h1.exceptAll(h2).count() == 0  # same buckets under any partitioning


def test_ivf_fixed_centroids_matches_probe_semantics(spark):
    """Prebuilt-quantizer IVF: vectors near centroid A never probe into
    unrelated cells at nprobe=1; self is excluded; ranks deterministic."""
    rows = [(i, [float(i % 2) * 2 - 1, 1.0, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cell"), "embedding"
    )
    out = SIM.ivf_topk(
        df, df.filter(F.col("vec_id") < 2), "embedding", "vec_id",
        k=2, nprobe=1, centroids_df=cents,
    ).collect()
    for r in out:
        # even ids cluster with centroid 0, odd with centroid 1
        assert r.neighbor_id % 2 == r.query_id % 2
        assert r.neighbor_id != r.query_id


def test_embedding_neardup(spark):
    vecs = [
        (0, [0.5, 0.5, 0.1]),
        (1, [0.5001, 0.5, 0.1]),  # near-exact dup of 0
        (2, [-0.5, 0.3, 0.9]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = DD.embedding_near_dup_pairs(df, "embedding", "vec_id", threshold=0.999, num_planes=8)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(0, 1)}


def test_minhash_pairs_ml_recall(spark, sf_small):
    """pyspark.ml MinHashLSH backend finds the injected near-dups that
    the custom pipeline (q50 oracle) defines as ground truth."""
    d = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "text")
    mutated = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail token")).alias("text"),
    )
    corpus = d.unionByName(mutated)
    truth = {
        (r.id_a, r.id_b)
        for r in DD.minhash_dedup_pairs(corpus, "text", "doc_id", threshold=0.5).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in DD.minhash_pairs_ml(corpus, "text", "doc_id", threshold=0.5).collect()
    }
    assert truth, "fixture must contain near-dup pairs"
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, f"ml MinHashLSH recall too low: {recall}"


def test_lsh_topk_ml_recall(spark, sf_small):
    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(e, q, "embedding", "vec_id", k=5).collect()
    approx = SIM.lsh_topk_ml(e, q, "embedding", "vec_id", k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"BRP-LSH recall too low: {recall}"
