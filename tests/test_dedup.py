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


def test_lsh_band_sizing_tracks_threshold():
    """Banding must be sized so the s-curve midpoint sits below the
    verify threshold; hand-picked 8x4 under t=0.5 missed a true
    J=0.727 pair at sf0.001 (midpoint 0.595 > 0.5)."""
    from etl_java_spark.operators.dedup import lsh_band_sizing

    assert lsh_band_sizing(0.8, 32) == (8, 4)    # classic sizing kept
    assert lsh_band_sizing(0.5, 32) == (16, 2)   # looser bands at t=0.5
    for t in (0.3, 0.5, 0.7, 0.8, 0.9):
        bands, rows = lsh_band_sizing(t, 32)
        assert bands * rows == 32
        recall = 1 - (1 - t ** rows) ** bands
        assert recall >= 0.95, (t, bands, rows, recall)
