"""Multimodal plumbing gates: schema, Arrow batch shape, deterministic
fake decode, dedup, strict-mode stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tapes_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.make_fake_media(spark, n=32, seed=42)


def test_feature_extraction_shape(spark, media):
    feats = mm.extract_features(media, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert r["payload_bytes"] > 0
        assert len(r["payload_sha256"]) == 64


def test_features_deterministic(spark, media):
    a = mm.extract_features(media, fake_decode=True).orderBy("media_id").collect()
    b = mm.extract_features(media, fake_decode=True).orderBy("media_id").collect()
    assert [r["feature"] for r in a] == [r["feature"] for r in b]


def test_strict_mode_raises(spark, media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        mm.extract_features(media, fake_decode=False).collect()
    assert "NotImplementedError" in str(exc.value) or "media codecs" in str(
        exc.value
    )


def test_media_dedup(spark, media):
    d = mm.media_dedup(media)
    total = d.agg(F.sum("n_copies")).collect()[0][0]
    assert total == 32
    # every 8th payload seeded identically -> at least one multi-copy group
    assert d.filter(F.col("n_copies") > 1).count() >= 1


def test_byte_aware_repartition(spark, media):
    small = mm.media_repartition(media, target_partition_bytes=256)
    assert small.rdd.getNumPartitions() > 1
    big = mm.media_repartition(media, target_partition_bytes=1 << 30)
    assert big.rdd.getNumPartitions() == 1
