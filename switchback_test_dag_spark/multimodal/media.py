"""Multimodal column plumbing: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas iterators via
``mapInPandas``.

The Spark-side architecture here is the real deliverable — schema contract,
partition-size control, Arrow batch shape, UDF iterator signature. The actual
codec calls (PIL/libav/ffmpeg) are STUBBED: this container has no media
libraries, so decode functions raise ``NotImplementedError`` unless
``deterministic_fake=True``, which derives pixel/sample features from
``xxhash``-style arithmetic on the payload bytes — enough to test the plumbing
end-to-end with stable values.

Scale notes:
- payloads ride in parquet binary columns; never ``collect()`` them;
- ``mapInPandas`` streams Arrow record batches — peak executor memory is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` × mean payload
  size, so callers repartition by byte budget (``repartition_by_bytes``) before
  heavy decode stages;
- per-item outputs (frames, patches) are exploded AFTER the decode so the
  expensive pass stays one-row-in / few-rows-out inside a single task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Contract schema for a media table: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped table from any text source (fixture stand-in
    for real scraped payloads): payload = utf-8 bytes, metadata derived."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.pmod(F.xxhash64(text_col), F.lit(1920)).cast("int").alias("width"),
        F.pmod(F.xxhash64(text_col, F.lit(1)), F.lit(1080)).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector: sha256-seeded
    per-dimension values in [0, 1)."""
    out = []
    h = payload or b""
    for i in range(dim):
        d = hashlib.sha256(h + i.to_bytes(4, "little")).digest()
        out.append(int.from_bytes(d[:8], "little") / 2**64)
    return out


def decode_features(
    media: DataFrame, dim: int = 16, deterministic_fake: bool = False
) -> DataFrame:
    """Decode payloads → fixed-dim feature vectors via ``mapInPandas``.

    With real codecs this is: decode image → resize → model/handcrafted
    features. Here the codec is stubbed (see module docstring); the Arrow
    batch iteration, schema contract and partition behavior are real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "pass deterministic_fake=True to exercise the plumbing"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "feature": payloads.map(lambda b: _fake_feature(b or b"", dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Frame sampling: one row per sampled frame per video. The fake slices the
    payload every ``every_n_bytes``; a real implementation seeks keyframes.
    Few-rows-out per input keeps the explode inside the decode task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media codecs unavailable; pass deterministic_fake=True"
                )
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def repartition_by_bytes(
    media: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Right-size partitions for a decode stage by payload byte volume (row
    counts are meaningless when payloads span 1 KB–100 MB). One cheap agg
    estimates total bytes; the repartition keys on media_id for uniformity."""
    total = media.agg(
        F.sum(F.octet_length("payload")).alias("b")
    ).collect()[0]["b"] or 0
    n = max(1, int(total / target_partition_bytes))
    return media.repartition(n, "media_id")
