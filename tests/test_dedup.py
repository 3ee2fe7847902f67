"""Connected-components cluster resolution (operators/dedup.py:
dedup_clusters) — checkpoint-strategy coverage. The broader dedup
operator tests live in test_dedup_similarity.py."""

from __future__ import annotations


def test_dedup_clusters_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir= switches the per-round materialization to
    reliable df.checkpoint (survives executor loss on a cluster);
    results must be identical to the localCheckpoint default, and
    checkpoint files must appear."""
    import os

    from etl_java_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "id_a long, id_b long"
    )
    local = sorted(dedup_clusters(pairs).collect())
    ckdir = str(tmp_path / "ck")
    reliable = sorted(dedup_clusters(pairs, checkpoint_dir=ckdir).collect())
    assert local == reliable
    assert {r.cluster_id for r in reliable} == {1, 10, 20}
    assert any(os.scandir(ckdir)), "no reliable checkpoint files written"
