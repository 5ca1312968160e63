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


# --------------------------------------------------------------------------- #
# real WAV codec path
# --------------------------------------------------------------------------- #


def test_wav_roundtrip_and_stdlib_interop(tmp_path):
    """Our encoder must produce files the stdlib wave module reads, and our
    chunk-walking decoder must read files the stdlib wave module writes."""
    import io
    import wave

    import numpy as np

    from switchback_test_dag_spark.multimodal.wav import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int16)

    # ours -> stdlib
    blob = encode_wav_pcm16(samples, 8000)
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert np.array_equal(
            np.frombuffer(w.readframes(w.getnframes()), dtype="<i2"), samples
        )

    # stdlib -> ours
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(samples.tobytes())
    rate, channels, decoded = decode_wav_pcm16(buf.getvalue())
    assert (rate, channels) == (44100, 1)
    assert np.array_equal(decoded, samples)


def test_wav_decoder_walks_extra_chunks_and_rejects_garbage():
    import struct

    import numpy as np
    import pytest as _pytest

    from switchback_test_dag_spark.multimodal.wav import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = np.array([1, -2, 3], dtype=np.int16)
    blob = encode_wav_pcm16(samples, 16000)
    # splice an odd-sized LIST chunk between 'WAVE' and 'fmt ' — a conformant
    # reader must skip it (with pad byte) and still find fmt/data
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    spliced = blob[:12] + extra + blob[12:]
    rate, _, decoded = decode_wav_pcm16(spliced)
    assert rate == 16000
    assert np.array_equal(decoded, samples)

    with _pytest.raises(ValueError):
        decode_wav_pcm16(b"not a wav at all....")
    # 8-bit PCM is not our contract
    bad = bytearray(blob)
    bad[34] = 8  # bits-per-sample field
    with _pytest.raises(ValueError):
        decode_wav_pcm16(bytes(bad))


def test_wav_spark_pipeline_decodes_real_bytes(spark):
    """End-to-end on the cluster path: synthesize real WAV payloads, decode
    via mapInPandas, check one row against a hand-computed value."""
    import numpy as np

    from switchback_test_dag_spark.multimodal.media import (
        decode_wav_features,
        synthesize_wav_audio,
    )

    df = spark.range(3, 6).withColumnRenamed("id", "doc_id")
    media = synthesize_wav_audio(df, "doc_id", n_samples=16, sample_rate=8000)
    rows = {r["media_id"]: r for r in decode_wav_features(media).collect()}
    assert set(rows) == {3, 4, 5}
    i = np.arange(16, dtype=np.int64)
    for mid in (3, 4, 5):
        s = (mid * 31 + i * 17) % 65536 - 32768
        assert rows[mid]["sample_rate"] == 8000
        assert rows[mid]["n_samples"] == 16
        assert rows[mid]["sum_sq"] == int(np.dot(s, s))
        assert rows[mid]["peak"] == int(np.abs(s).max())
