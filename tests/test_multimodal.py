"""Multimodal column plumbing tests (charter §2B; codec stubbed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_java_spark.operators.multimodal import (
    attach_media_meta,
    decode_real,
    extract_features,
    synthesize_media_table,
)


def test_media_meta_schema(spark):
    media = synthesize_media_table(spark, n=8)
    assert "media" in media.columns
    row = media.select("media").first().media
    assert row.uri.startswith("mem://")
    assert row.n_bytes > 0
    assert row.mime in {"image/jpeg", "image/png", "audio/wav", "video/mp4"}


def test_extract_features_deterministic(spark):
    media = synthesize_media_table(spark, n=16)
    f1 = extract_features(media).orderBy("uri").collect()
    f2 = extract_features(media).orderBy("uri").collect()
    assert len(f1) == 16
    assert all(len(r.feature) == 8 for r in f1)
    assert [r.feature for r in f1] == [r.feature for r in f2]


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"bytes", "image/jpeg")
