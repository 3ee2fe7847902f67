"""bloom_prune: DataFrame-native bloom filter for runtime fact pruning.

Properties pinned:
- no false negatives: every fact row whose key IS in the dim survives
  (the bloom is a superset filter — correctness of the end-to-end join
  does not depend on sizing);
- real pruning: with a selective dim, the pruned fact is far smaller
  than the input (the whole point at 100 TB);
- exactness after the follow-up join: bloom_prune + exact join equals
  the plain join, row for row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.operators.relational import bloom_prune


def test_bloom_no_false_negatives(spark):
    fact = spark.range(0, 5000).select(F.col("id").alias("k"))
    dim = spark.range(0, 5000, 17).select(F.col("id").alias("d"))
    pruned = bloom_prune(fact, dim, "k", "d")
    surviving = {r.k for r in pruned.collect()}
    expected = set(range(0, 5000, 17))
    assert expected <= surviving, "bloom dropped a true member (false negative)"


def test_bloom_prunes_most_nonmembers(spark):
    fact = spark.range(0, 20000).select(F.col("id").alias("k"))
    dim = spark.range(0, 20000, 100).select(F.col("id").alias("d"))  # 200 keys
    n = bloom_prune(fact, dim, "k", "d").count()
    # 200 members + FP noise; 64 KiB bloom with 200 keys has FP ~0
    assert n < 1000, f"bloom kept {n} of 20000 rows — not pruning"


def test_bloom_plus_join_is_exact(spark, sf_small):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
        "l_partkey", "l_quantity"
    )
    p = (
        spark.read.parquet(f"{sf_small}/part.parquet")
        .filter(F.col("p_size") < 10)
        .select("p_partkey")
    )
    plain = li.join(p, li.l_partkey == p.p_partkey).count()
    pruned = bloom_prune(li, p, "l_partkey", "p_partkey")
    via_bloom = pruned.join(p, pruned.l_partkey == p.p_partkey).count()
    assert plain == via_bloom


def test_bloom_tiny_filter_still_exact(spark):
    # undersized bloom: high FP rate, but join-after still exact
    fact = spark.range(0, 2000).select(F.col("id").alias("k"))
    dim = spark.range(0, 2000, 3).select(F.col("id").alias("d"))
    pruned = bloom_prune(fact, dim, "k", "d", num_bits=256)
    exact = pruned.join(dim, pruned.k == dim.d).count()
    assert exact == len(range(0, 2000, 3))
