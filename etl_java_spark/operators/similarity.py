"""Similarity search over embedding columns (charter §2B).

Two paths:
- ``brute_force_topk``: exact cosine top-k. The query side is broadcast
  (queries are normally few); the corpus is scanned once, partial top-k
  per partition via the row_number window. Recall 1.0; cost O(|Q|*|C|)
  but fully distributed and JVM-side. This is the correctness baseline.
- ``lsh_topk``: random-hyperplane (sign) LSH with banded multi-probe:
  corpus vectors hash into buckets, queries probe matching buckets, exact
  cosine re-ranks candidates. Cost O(|Q| * bucket_size) — the 100 TB
  path. Recall < 1.0, tunable via planes/bands.

An IVF (k-means coarse quantizer) variant is the classic third option;
with pyspark.ml KMeans it is a straightforward extension — the bucket
assignment becomes nearest-centroid instead of sign bits. Deferred.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Result: (query_id, neighbor_id, cos_sim, rank), excluding self-match
    when ids collide. Ties broken by neighbor id for determinism.
    """
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qvec"), F.col("__cvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _sign_bands(vec_col, planes, bands: int):
    """Split sign bits of dot(vec, plane_i) into ``bands`` band-hashes."""
    per_band = len(planes) // bands
    import pyspark.sql.functions as F

    def dot_sign(p):
        return F.when(
            F.aggregate(
                F.zip_with(vec_col, F.array(*[F.lit(v) for v in p]), lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))

    band_hashes = []
    for b in range(bands):
        bits = planes[b * per_band : (b + 1) * per_band]
        acc = F.lit(0).cast("long")
        for p in bits:
            acc = acc * 2 + dot_sign(p)
        band_hashes.append(acc)
    return F.array(*band_hashes)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: banded sign-LSH candidates + exact cosine re-rank.

    A query and corpus vector become candidates when ANY band of sign
    bits matches (multi-probe via banding — same trick as MinHash-LSH).
    Equi-join on (band_idx, band_hash): shuffle-partitionable, no cross
    product. Rank/result schema matches brute_force_topk, so callers can
    swap paths by data size.
    """
    import numpy as np

    query_id_col = query_id_col or id_col
    rng = np.random.RandomState(seed)
    dim = len(corpus.select(vec_col).first()[0])
    planes = rng.randn(num_planes, dim).astype(float).tolist()

    def banded(df, idc, alias):
        return df.select(
            F.col(idc).alias(alias),
            F.col(vec_col).alias(f"__vec_{alias}"),
            F.posexplode(_sign_bands(F.col(vec_col), planes, bands)).alias("band_idx", "band_hash"),
        )

    cb = banded(corpus, id_col, "neighbor_id")
    qb = banded(queries, query_id_col, "query_id")
    cand = (
        cb.join(qb, ["band_idx", "band_hash"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__vec_query_id", "__vec_neighbor_id")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__vec_query_id"), F.col("__vec_neighbor_id")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
