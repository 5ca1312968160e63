"""Multimodal column plumbing: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas iterators via
``mapInPandas``.

The Spark-side architecture here is the real deliverable — schema contract,
partition-size control, Arrow batch shape, UDF iterator signature. Five
codec paths are REAL, pure-Python, and parse actual bytes with no fake flag:
AUDIO via ``wav.py`` (RIFF PCM16 chunk-walking codec), IMAGE via ``bmp.py``
(24/32-bit BI_RGB DIB codec — see ``decode_bmp_features``), ``png.py``
(chunk-walking stdlib-zlib PNG codec with all five scanline filters — see
``decode_png_features``), and ``jpeg.py`` (baseline sequential JFIF:
optimal-Huffman entropy codec, DCT, quantization — see
``decode_jpeg_features``; being lossy, its contract is coefficient-bit-exact
roundtrip plus byte-exact reference reconstruction, pytest-gated), and VIDEO
via ``avi.py`` (RIFF uncompressed-DIB AVI: real container walking, real
per-frame decode, real frame sampling — ``decode_avi_features`` /
``sample_avi_frames``). Only H.26x-class motion-compensated video remains
STUBBED: that genuinely needs codec libraries this container lacks, so the
generic decode raises ``NotImplementedError`` unless
``deterministic_fake=True``, which derives pixel features from
``xxhash``-style arithmetic on the payload bytes.

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


# --------------------------------------------------------------------------- #
# real video path (pure-Python uncompressed-DIB AVI codec — see avi.py)
# --------------------------------------------------------------------------- #

VIDEO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("fps", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("sum_px", LongType(), False),
        StructField("frame0_wsum", LongType(), False),
    ]
)


def synthesize_avi_videos(
    df: DataFrame, id_col: str, n_frames: int = 6, width: int = 8, height: int = 6
) -> DataFrame:
    """MEDIA_SCHEMA video rows with REAL AVI payloads: per id, ``n_frames``
    deterministic RGB frames (frame ``j`` uses the BMP test pattern seeded by
    ``id·1009 + j`` — closed-form for tests) through the uncompressed-DIB
    writer (``avi.py``)."""
    from switchback_test_dag_spark.multimodal.avi import encode_avi_dib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                frames = np.stack(
                    [
                        _bmp_pixels(int(mid) * 1009 + j, width, height)
                        for j in range(n_frames)
                    ]
                )
                payloads.append(encode_avi_dib(frames, fps=10))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "payload": payloads,
                    "mime": "video/x-msvideo",
                    "width": pd.array([width] * len(pdf), dtype="Int32"),
                    "height": pd.array([height] * len(pdf), dtype="Int32"),
                    "duration_ms": n_frames * 1000 // 10,
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_avi_features(media: DataFrame) -> DataFrame:
    """Parse REAL AVI bytes → integer-exact video features: frame count, fps,
    geometry, total pixel sum across all frames, and the first frame's
    position-weighted checksum (row/channel/stride bug detector, as in
    :func:`decode_bmp_features`). The working video codec path — no
    ``deterministic_fake``."""
    from switchback_test_dag_spark.multimodal.avi import decode_avi_dib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            fpss, nfs, ws, hs, sums, w0 = [], [], [], [], [], []
            for payload in pdf["payload"]:
                fps, frames = decode_avi_dib(bytes(payload))
                n, h, w, _ = frames.shape
                f0 = frames[0].astype(np.int64)
                weights = np.arange(1, h * w * 3 + 1, dtype=np.int64).reshape(
                    h, w, 3
                )
                fpss.append(fps)
                nfs.append(n)
                ws.append(w)
                hs.append(h)
                sums.append(int(frames.astype(np.int64).sum()))
                w0.append(int((f0 * weights).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fps": fpss,
                    "n_frames": nfs,
                    "width": ws,
                    "height": hs,
                    "sum_px": sums,
                    "frame0_wsum": w0,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=VIDEO_FEATURE_SCHEMA
    )


def sample_avi_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling over AVI payloads (superseding the fake slicer in
    :func:`sample_frames` for this container): decode, keep every ``every_n``-th
    frame, emit FRAME_SCHEMA rows whose ``frame_bytes`` are the raw RGB of the
    sampled frame. One-row-in / few-rows-out inside the decode task — the
    explode happens after the expensive pass, per the module contract."""
    from switchback_test_dag_spark.multimodal.avi import decode_avi_dib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _fps, frames = decode_avi_dib(bytes(payload))
                for j in range(0, len(frames), every_n):
                    ids.append(mid)
                    idxs.append(j)
                    blobs.append(frames[j].tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": blobs}
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


# --------------------------------------------------------------------------- #
# real audio path (pure-Python WAV codec — see wav.py)
# --------------------------------------------------------------------------- #

AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_samples", LongType(), False),
        StructField("sum_sq", LongType(), False),
        StructField("peak", IntegerType(), False),
    ]
)


def synthesize_wav_audio(
    df: DataFrame, id_col: str, n_samples: int = 256, sample_rate: int = 8000
) -> DataFrame:
    """MEDIA_SCHEMA audio rows with REAL WAV payloads: a deterministic int16
    waveform per id (``((id*31 + i*17) % 65536) - 32768``) encoded through the
    RIFF PCM16 writer. Deterministic by construction, so downstream decodes
    are oracle-checkable against the closed-form generator."""
    from switchback_test_dag_spark.multimodal.wav import encode_wav_pcm16

    duration_ms = n_samples * 1000 // sample_rate

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            payloads = [
                encode_wav_pcm16(
                    ((mid * 31 + i * 17) % 65536 - 32768).astype("<i2"),
                    sample_rate,
                )
                for mid in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "audio",
                    "payload": payloads,
                    "mime": "audio/wav",
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                    "duration_ms": duration_ms,
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


# --------------------------------------------------------------------------- #
# real image path (pure-Python BMP codec — see bmp.py)
# --------------------------------------------------------------------------- #

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
        StructField("wsum", LongType(), False),
    ]
)


def _bmp_pixels(media_id: int, width: int, height: int):
    """Closed-form deterministic test pattern: channel k of pixel (r, c) is
    ``(id*7 + r*5 + c*3 + k*11) % 256`` — cheap for an oracle to replay and
    sensitive to any row-flip / channel-swap / stride decode bug."""
    import numpy as np

    r = np.arange(height, dtype=np.int64)[:, None, None]
    c = np.arange(width, dtype=np.int64)[None, :, None]
    k = np.arange(3, dtype=np.int64)[None, None, :]
    return ((media_id * 7 + r * 5 + c * 3 + k * 11) % 256).astype(np.uint8)


def synthesize_bmp_images(df: DataFrame, id_col: str) -> DataFrame:
    """MEDIA_SCHEMA image rows with REAL BMP payloads: per id, a
    ``(8 + id % 9) × (6 + id % 5)`` RGB test pattern encoded through the
    canonical 24-bit bottom-up writer (``bmp.py``). Varying dimensions make
    the row-stride padding and container-size arithmetic part of the
    contract, not a constant."""
    from switchback_test_dag_spark.multimodal.bmp import encode_bmp24

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            widths = [int(8 + mid % 9) for mid in ids]
            heights = [int(6 + mid % 5) for mid in ids]
            payloads = [
                encode_bmp24(_bmp_pixels(int(mid), w, h))
                for mid, w, h in zip(ids, widths, heights)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/bmp",
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array([None] * len(pdf), dtype="Int64"),
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def synthesize_png_images(df: DataFrame, id_col: str) -> DataFrame:
    """MEDIA_SCHEMA image rows with REAL PNG payloads: per id, a
    ``(5 + id % 11) × (5 + id % 7)`` RGB test pattern through the stdlib-zlib
    PNG writer (``png.py``). Heights are always ≥5, so every payload contains
    all five scanline filter types (the encoder cycles ``row % 5``) and the
    decoder's filter inversion is exercised by every single row of the
    fixture, not just a lucky subset."""
    from switchback_test_dag_spark.multimodal.png import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            widths = [int(5 + mid % 11) for mid in ids]
            heights = [int(5 + mid % 7) for mid in ids]
            payloads = [
                encode_png(_bmp_pixels(int(mid), w, h))
                for mid, w, h in zip(ids, widths, heights)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/png",
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array([None] * len(pdf), dtype="Int64"),
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_png_features(media: DataFrame) -> DataFrame:
    """Parse REAL PNG bytes → the same integer-exact image features as
    :func:`decode_bmp_features` (dimensions, payload size, channel sums,
    position-weighted checksum), via the chunk-walking zlib codec
    (``png.py``). Working entropy-coded image path — no
    ``deterministic_fake``."""
    from switchback_test_dag_spark.multimodal.png import decode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ws, hs, nb, srs, sgs, sbs, wsums = [], [], [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                arr = decode_png(raw).astype(np.int64)
                h, w, _ = arr.shape
                weights = np.arange(1, h * w * 3 + 1, dtype=np.int64).reshape(
                    h, w, 3
                )
                ws.append(w)
                hs.append(h)
                nb.append(len(raw))
                srs.append(int(arr[:, :, 0].sum()))
                sgs.append(int(arr[:, :, 1].sum()))
                sbs.append(int(arr[:, :, 2].sum()))
                wsums.append(int((arr * weights).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    "n_bytes": nb,
                    "sum_r": srs,
                    "sum_g": sgs,
                    "sum_b": sbs,
                    "wsum": wsums,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURE_SCHEMA
    )


def synthesize_jpeg_images(df: DataFrame, id_col: str, quality: int = 90) -> DataFrame:
    """MEDIA_SCHEMA image rows with REAL baseline JPEG payloads: per id, a
    ``(8 + id % 9) × (8 + id % 5)`` RGB test pattern through the optimal-
    Huffman baseline encoder (``jpeg.py``). Dimensions are chosen so most
    images need edge padding to the 8×8 MCU grid (width 8–16, height 8–12),
    making pad-and-crop part of the exercised path."""
    from switchback_test_dag_spark.multimodal.jpeg import encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            widths = [int(8 + mid % 9) for mid in ids]
            heights = [int(8 + mid % 5) for mid in ids]
            payloads = [
                encode_jpeg(_bmp_pixels(int(mid), w, h), quality=quality)[0]
                for mid, w, h in zip(ids, widths, heights)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/jpeg",
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array([None] * len(pdf), dtype="Int64"),
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_jpeg_features(media: DataFrame) -> DataFrame:
    """Parse REAL baseline JPEG bytes → the same image-feature columns as
    :func:`decode_bmp_features`, via the full entropy-decode + dequantize +
    IDCT path (``jpeg.py``). JPEG being lossy, the features describe the
    RECONSTRUCTED pixels — deterministic given the payload, but not the
    closed-form source pattern, so the value contract lives in pytest
    (coefficient-bit-exact roundtrip; byte-exact equality with the encoder's
    reference reconstruction; quality-bounded error vs the source)."""
    from switchback_test_dag_spark.multimodal.jpeg import decode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ws, hs, nb, srs, sgs, sbs, wsums = [], [], [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                arr = decode_jpeg(raw).astype(np.int64)
                h, w, _ = arr.shape
                weights = np.arange(1, h * w * 3 + 1, dtype=np.int64).reshape(
                    h, w, 3
                )
                ws.append(w)
                hs.append(h)
                nb.append(len(raw))
                srs.append(int(arr[:, :, 0].sum()))
                sgs.append(int(arr[:, :, 1].sum()))
                sbs.append(int(arr[:, :, 2].sum()))
                wsums.append(int((arr * weights).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    "n_bytes": nb,
                    "sum_r": srs,
                    "sum_g": sgs,
                    "sum_b": sbs,
                    "wsum": wsums,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURE_SCHEMA
    )


def decode_bmp_features(media: DataFrame) -> DataFrame:
    """Parse REAL BMP bytes → integer-exact image features per payload:
    decoded dimensions, payload size, per-channel pixel sums, and a
    position-weighted checksum ``wsum = Σ v·((r·w + c)·3 + k + 1)`` that
    changes under any row-order, channel-order, or stride mistake. All
    outputs are exact integers, so downstream aggregates are
    order-independent. The working image codec path — no
    ``deterministic_fake``."""
    from switchback_test_dag_spark.multimodal.bmp import decode_bmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ws, hs, nb, srs, sgs, sbs, wsums = [], [], [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                arr = decode_bmp(raw).astype(np.int64)
                h, w, _ = arr.shape
                weights = np.arange(1, h * w * 3 + 1, dtype=np.int64).reshape(
                    h, w, 3
                )
                ws.append(w)
                hs.append(h)
                nb.append(len(raw))
                srs.append(int(arr[:, :, 0].sum()))
                sgs.append(int(arr[:, :, 1].sum()))
                sbs.append(int(arr[:, :, 2].sum()))
                wsums.append(int((arr * weights).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    "n_bytes": nb,
                    "sum_r": srs,
                    "sum_g": sgs,
                    "sum_b": sbs,
                    "wsum": wsums,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURE_SCHEMA
    )


def decode_wav_features(media: DataFrame) -> DataFrame:
    """Parse REAL WAV bytes → integer-exact audio features per payload:
    sample count (from the data chunk), rate (from fmt), energy ``sum_sq``
    and ``peak`` as exact integers so any downstream aggregate is
    order-independent (no float-sum parity hazards). This is the working
    codec path of the multimodal component — no ``deterministic_fake``."""
    from switchback_test_dag_spark.multimodal.wav import decode_wav_pcm16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rates, counts, sums, peaks = [], [], [], []
            for payload in pdf["payload"]:
                rate, _ch, samples = decode_wav_pcm16(bytes(payload))
                s = samples.astype(np.int64)
                rates.append(rate)
                counts.append(len(s))
                sums.append(int(np.dot(s, s)))
                peaks.append(int(np.abs(s).max()) if len(s) else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": rates,
                    "n_samples": counts,
                    "sum_sq": sums,
                    "peak": peaks,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA
    )
