"""Multimodal plumbing tests: schema contract, Arrow batch shape, deterministic
fake decode, frame sampling fan-out, stub behavior without codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from switchback_test_dag_spark.io import load_table
from switchback_test_dag_spark.multimodal import media as MM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    return MM.synthesize_media(docs, "doc_id", "text")


def test_media_schema_contract(media):
    # names + types must match the contract; nullability is advisory in Spark
    got = [(f.name, f.dataType) for f in media.schema.fields]
    want = [(f.name, f.dataType) for f in MM.MEDIA_SCHEMA.fields]
    assert got == want


def test_decode_features_deterministic(media):
    feats = MM.decode_features(media, dim=8, deterministic_fake=True)
    assert feats.schema == MM.FEATURE_SCHEMA
    rows = feats.orderBy("media_id").collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r["feature"])
    # deterministic: same input → same feature
    rows2 = MM.decode_features(media, dim=8, deterministic_fake=True).orderBy(
        "media_id"
    ).collect()
    assert [r["feature"] for r in rows] == [r["feature"] for r in rows2]
    # n_bytes matches payload length
    by_id = {r["media_id"]: r["n_bytes"] for r in rows}
    for r in media.select("media_id", F.octet_length("payload").alias("n")).collect():
        assert by_id[r["media_id"]] == r["n"]


def test_decode_without_codec_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        MM.decode_features(media, deterministic_fake=False).collect()


def test_sample_frames_fanout(media):
    frames = MM.sample_frames(media, every_n_bytes=64, max_frames=4,
                              deterministic_fake=True)
    assert frames.schema == MM.FRAME_SCHEMA
    per_doc = frames.groupBy("media_id").count().collect()
    assert len(per_doc) == 50
    assert all(1 <= r["count"] <= 4 for r in per_doc)
    # frame bytes reassemble a prefix of the payload
    one = frames.filter(F.col("media_id") == per_doc[0]["media_id"]).orderBy(
        "frame_idx"
    ).collect()
    assert all(len(r["frame_bytes"]) <= 64 for r in one)


def test_repartition_by_bytes(media):
    out = MM.repartition_by_bytes(media, target_partition_bytes=4096)
    assert out.rdd.getNumPartitions() >= 1
    assert out.count() == media.count()
